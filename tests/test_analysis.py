"""Analyzer parity kernel tests — golden vectors ported from the reference
test suite (see FIXTURES.md §4 for the file:line provenance of each vector).
"""

from searchengine_spark.analysis import (
    STOP_WORDS,
    STOP_WORDS_EN,
    STOP_WORDS_JP,
    analyze,
    punctuation_tokenize,
    stem,
)


class TestPunctuationTokenizer:
    # analysis/punctuation/PunctuationTokenizerTest.java:14-21
    def test_golden_happy_today(self):
        assert punctuation_tokenize("I am Happy Today!") == ["happy", "today"]

    def test_only_five_punctuation_marks_split(self):
        # ' - " stay inside tokens (PunctuationTokenizer.java:25)
        assert punctuation_tokenize("don't self-serve \"quoted\"") == [
            "don't",
            "self-serve",
            '"quoted"',
        ]

    def test_all_five_marks(self):
        assert punctuation_tokenize("x,y.z;w?v!u") == ["x", "y", "z", "w", "v", "u"]

    def test_whitespace_kinds(self):
        assert punctuation_tokenize("cat\tdog\nbird\rfish") == [
            "cat",
            "dog",
            "bird",
            "fish",
        ]

    def test_stop_words_removed_post_lowercase(self):
        assert punctuation_tokenize("The THE tHe") == []

    def test_empty_and_pure_punct(self):
        assert punctuation_tokenize("") == []
        assert punctuation_tokenize(",.;?! ") == []

    def test_leading_punct_token(self):
        # Team12PhraseSearchTest.java:83 passes ",California" deliberately
        assert punctuation_tokenize(",California") == ["california"]


class TestStopWords:
    def test_counts_match_reference(self):
        # StopWords.java:15-187: 127 EN + 44 JP
        assert len(STOP_WORDS_EN) == 127
        assert len(STOP_WORDS_JP) == 44
        assert len(STOP_WORDS) == 171

    def test_spot_checks(self):
        for w in ("i", "the", "don", "now", "s", "t", "しかし", "何"):
            assert w in STOP_WORDS
        assert "happy" not in STOP_WORDS


class TestPorterStemmer:
    # analysis/stemmer/PorterStemmerTest.java:21-27
    def test_golden_sentence(self):
        words = "stemming is an important concept in computer science".split()
        expected = "stem is an import concept in comput scienc".split()
        assert [stem(w) for w in words] == expected

    def test_short_words_unchanged(self):
        for w in ("a", "is", "by", "ab", ""):
            assert stem(w) == w

    def test_classic_vectors(self):
        cases = {
            "caresses": "caress",
            "ponies": "poni",
            "ties": "ti",
            "caress": "caress",
            "cats": "cat",
            "feed": "feed",
            "agreed": "agre",
            "plastered": "plaster",
            "motoring": "motor",
            "sing": "sing",
            "conflated": "conflat",
            "troubled": "troubl",
            "sized": "size",
            "hopping": "hop",
            "tanned": "tan",
            "falling": "fall",
            "hissing": "hiss",
            "fizzed": "fizz",
            "failing": "fail",
            "filing": "file",
            "happy": "happi",
            "sky": "sky",
            "relational": "relat",
            "conditional": "condit",
            "rational": "ration",
            "valenci": "valenc",
            "hesitanci": "hesit",
            "digitizer": "digit",
            "conformabli": "conform",
            "radicalli": "radic",
            "differentli": "differ",
            "vileli": "vile",
            "analogousli": "analog",
            "vietnamization": "vietnam",
            "predication": "predic",
            "operator": "oper",
            "feudalism": "feudal",
            "decisiveness": "decis",
            "hopefulness": "hope",
            "callousness": "callous",
            "formaliti": "formal",
            "sensitiviti": "sensit",
            "sensibiliti": "sensibl",
            "triplicate": "triplic",
            "formative": "form",
            "formalize": "formal",
            "electriciti": "electr",
            "electrical": "electr",
            "hopeful": "hope",
            "goodness": "good",
            "revival": "reviv",
            "allowance": "allow",
            "inference": "infer",
            "airliner": "airlin",
            "gyroscopic": "gyroscop",
            "adjustable": "adjust",
            "defensible": "defens",
            "irritant": "irrit",
            "replacement": "replac",
            "adjustment": "adjust",
            "dependent": "depend",
            "adoption": "adopt",
            "homologou": "homolog",
            "communism": "commun",
            "activate": "activ",
            "angulariti": "angular",
            "homologous": "homolog",
            "effective": "effect",
            "bowdlerize": "bowdler",
            "probate": "probat",
            "rate": "rate",
            "cease": "ceas",
            "controll": "control",
            "roll": "roll",
        }
        for w, want in cases.items():
            assert stem(w) == want, f"{w}: got {stem(w)}, want {want}"

    def test_ion_bug2_guard(self):
        # "ion" itself must not crash / change (j >= 0 guard)
        assert stem("ion") == "ion"


class TestComposableAnalyzer:
    def test_chain(self):
        # ComposableAnalyzer.java:21-24 — stem each post-stop-word token
        assert analyze("I am Happy Today!") == ["happi", "todai"]

    def test_ranked_query_example(self):
        assert analyze("stemming is an important concept in computer science.") == [
            "stem",
            "import",
            "concept",
            "comput",
            "scienc",
        ]
