"""Word-break golden tests pinning the REFERENCE's own expected
segmentations (WordBreakTokenizerTest.java:14-77,
WordBreakCJKTokenizerTest.java:13-45) using the reference dictionaries'
relevant-entry subsets at the full-dictionary totals (so every probability
is bit-identical to running against the whole resource file) — see
wordbreak_golden_data.py for provenance.

Not reproduced, deliberately:
- EN test1 expects ["cat", "dog"] for input "thecat" — internally broken
  in the reference (there is no "dog" in the input); actual behavior under
  the reference's own rules is ["cat"] ("the" is a stop word), pinned here.
- CJK test5/test6 ("CN") — they need dict_cn.txt, which the reference does
  not ship in resources (its constructor would throw).
"""

from __future__ import annotations

import pytest

from searchengine_spark.analysis.wordbreak import (
    load_freq_dict,
    wordbreak_cjk_tokenize,
    wordbreak_tokenize,
)
from wordbreak_golden_data import EN_SUBSET, EN_TOTAL, JP_SUBSET, JP_TOTAL

LONG1 = (
    "tosherlockholmessheisalwaysthewomanihaveseldomheardhimmentionherunder"
    "anyothernameinhiseyessheeclipsesandpredominatesthewholeofhersexitwasnot"
    "thathefeltanyemotionakintoloveforireneadlerallemotionsandthatone"
    "particularlywereabhorrenttohiscoldprecisebutadmirablybalancedmindhewasi"
    "takeitthemostperfectreasoningandobservingmachinethattheworldhasseenbut"
    "asaloverhewouldhaveplacedhimselfinafalsepositionheneverspokeofthesofter"
    "passionssavewithagibeandasneertheywereadmirablethingsfortheobserver"
    "excellentfordrawingtheveilfrommenmotivesandactionsbutforthetrained"
    "reasonertoadmitsuchintrusionsintohisowndelicateandfinelyadjusted"
    "temperamentwastointroduceadistractingfactorwhichmightthrowadoubtuponall"
    "hismentalresultsgritinasensitiveinstrumentoracrackinoneofhisownhigh"
    "powerlenseswouldnotbemoredisturbingthanastrongemotioninanaturesuchashis"
    "andyettherewasbutonewomantohimandthatwomanwasthelateireneadlerofdubious"
    "andquestionablememory"
)
LONG1_EXPECTED = (
    "sherlock holmes always woman seldom heard mention name eyes eclipses "
    "predominates whole sex felt emotion akin love irene adler emotions one "
    "particularly abhorrent cold precise admirably balanced mind take "
    "perfect reasoning observing machine world seen lover would placed "
    "false position never spoke softer passions save gibe sneer admirable "
    "things observer excellent drawing veil men motives actions trained "
    "reasoner admit intrusions delicate finely adjusted temperament "
    "introduce distracting factor might throw doubt upon mental results "
    "grit sensitive instrument crack one high power lenses would disturbing "
    "strong emotion nature yet one woman woman late irene adler dubious "
    "questionable memory"
).split()

LONG2 = (
    "ihadseenlittleofholmeslatelymymarriagehaddriftedusawayfromeachothermy"
    "owncompletehappinessandthehomecentredinterestswhichriseuparoundtheman"
    "whofirstfindshimselfmasterofhisownestablishmentweresufficienttoabsorb"
    "allmyattentionwhileholmeswholoathedeveryformofsocietywithhiswholesoul"
    "remainedinourlodgingsinbakerstreetburiedamonghisoldbooksandalternating"
    "fromweektoweekbetweencocaineandambitionthedrowsinessofthedrugandthe"
    "fierceenergyofhisownkeennaturehewasstillaseverdeeplyattractedbythestudy"
    "ofcrimeandoccupiedhisimmensefacultiesandextraordinarypowersof"
    "observationinfollowingoutthosecluesandclearingupthosemysterieswhichhad"
    "beenabandonedashopelessbytheofficialpolicefromtimetotimeiheardsomevague"
    "accountofhisdoingsofhissummonstoodessainthecaseofthemurderofhisclearing"
    "upofthesingulartragedyoftheatkinsonbrothersattrincomaleeandfinallyofthe"
    "missionwhichhehadaccomplishedsodelicatelyandsuccessfullyforthereigning"
    "familyofhollandbeyondthesesignsofhisactivityhoweverwhichimerelyshared"
    "withallthereadersofthedailypressiknewlittleofmyformerfriendandcompanion"
)
LONG2_EXPECTED = (
    "seen little holmes lately marriage drifted us away complete happiness "
    "home centred interests rise around man first finds master "
    "establishment sufficient absorb attention holmes loathed every form "
    "society whole soul remained lodgings baker street buried among old "
    "books alternating week week cocaine ambition drowsiness drug fierce "
    "energy keen nature still ever deeply attracted study crime occupied "
    "immense faculties extraordinary powers observation following clues "
    "clearing mysteries abandoned hopeless official police time time heard "
    "vague account doings summons odessa case murder clearing singular "
    "tragedy atkinson brothers trincomalee finally mission accomplished "
    "delicately successfully reigning family holland beyond signs activity "
    "however merely shared readers daily press knew little former friend "
    "companion"
).split()


def test_en_long1_reference_golden():
    assert wordbreak_tokenize(LONG1, EN_SUBSET, total=EN_TOTAL) == LONG1_EXPECTED


def test_en_long2_reference_golden():
    assert wordbreak_tokenize(LONG2, EN_SUBSET, total=EN_TOTAL) == LONG2_EXPECTED


def test_en_single_word_golden():
    # reference test2
    assert wordbreak_tokenize("something", EN_SUBSET, total=EN_TOTAL) == [
        "something"
    ]


def test_en_thecat_actual_behavior():
    # reference test1's expectation ([cat, dog]) is broken; the correct
    # outcome under its own rules is the+cat with "the" stop-worded away
    assert wordbreak_tokenize("thecat", EN_SUBSET, total=EN_TOTAL) == ["cat"]


def test_en_unbreakable_raises():
    # reference test3
    with pytest.raises(ValueError, match="no possible way"):
        wordbreak_tokenize("sdslasldshkldsaldsald", EN_SUBSET, total=EN_TOTAL)


@pytest.mark.parametrize(
    "text,expected",
    [
        ("今日は学校に行きます", ["今日", "学校", "行き", "ま", "す"]),
        ("今日とても悲しい", ["今日", "とても", "悲し", "い"]),
        (
            "複数の言語を即座に処理することができ",
            ["複数", "言語", "即座", "処理", "する", "こと", "でき"],
        ),
    ],
)
def test_cjk_jp_reference_goldens(text, expected):
    assert wordbreak_cjk_tokenize(text, JP_SUBSET, total=JP_TOTAL) == expected


def test_load_freq_dict_reads_reference_format():
    """The resource file format (word freq, BOM on line 1) parses with
    load_freq_dict — pinned on a verbatim head of the reference file."""
    lines = [
        "﻿the 23135851162",
        "of 13151942776",
        "and 12997637966",
    ]
    assert load_freq_dict(lines) == {
        "the": 23135851162,
        "of": 13151942776,
        "and": 12997637966,
    }
