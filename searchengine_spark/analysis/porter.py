"""Porter stemmer — the Lucene variant of Porter's original algorithm.

Behavioral parity target: reference ``analysis/PorterStemmer.java:16-438``
(which is Lucene's ``org.apache.lucene.analysis.en.PorterStemmer``, itself
Porter's original 1980 algorithm with two bug fixes). This is a fresh Python
implementation of that published algorithm, NOT a translation of the Java
file; the variant-specific behaviors we must preserve are:

- words of length <= 2 are returned unchanged (the ``k > k0 + 1`` guard,
  ``PorterStemmer.java:429``);
- step 2 (Porter's 2) maps ``bli -> ble`` (not ``abli -> able``) and includes
  ``logi -> log``;
- the two "Bug" guards: steps 3/5 bail out when the word has shrunk to one
  char (``:243,309``), and the ``-ion`` rule requires a preceding s/t with
  ``j >= 0`` (``:333``);
- golden vector (``analysis/stemmer/PorterStemmerTest.java:21-27``):
  "stemming is an important concept in computer science" stems per-token to
  "stem is an import concept in comput scienc".

NLTK's PorterStemmer does NOT match this variant (different mode/extensions),
hence the from-scratch implementation. Vocabulary is tiny relative to token
count, so ``stem()`` is memoized; the pandas-UDF analyzer maps it over the
unique tokens of each Arrow batch.
"""

from functools import lru_cache

_VOWELS = frozenset("aeiou")


class _Stemmer:
    """One stemming pass. State: char buffer ``b[0..k]``; ``j`` marks the
    candidate stem end while matching suffixes (Porter's notation)."""

    __slots__ = ("b", "k", "j")

    def __init__(self, word: str) -> None:
        self.b = list(word)
        self.k = len(word) - 1
        self.j = 0

    def _cons(self, i: int) -> bool:
        ch = self.b[i]
        if ch in _VOWELS:
            return False
        if ch == "y":
            return True if i == 0 else not self._cons(i - 1)
        return True

    def _m(self) -> int:
        """Number of consonant-vowel sequences ("measure") in b[0..j]."""
        n = 0
        i = 0
        j = self.j
        while True:
            if i > j:
                return n
            if not self._cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if self._cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not self._cons(i):
                    break
                i += 1
            i += 1

    def _vowel_in_stem(self) -> bool:
        return any(not self._cons(i) for i in range(self.j + 1))

    def _doublec(self, j: int) -> bool:
        if j < 1:
            return False
        if self.b[j] != self.b[j - 1]:
            return False
        return self._cons(j)

    def _cvc(self, i: int) -> bool:
        if i < 2 or not self._cons(i) or self._cons(i - 1) or not self._cons(i - 2):
            return False
        return self.b[i] not in ("w", "x", "y")

    def _ends(self, s: str) -> bool:
        l = len(s)
        o = self.k - l + 1
        if o < 0:
            return False
        if self.b[o : self.k + 1] != list(s):
            return False
        self.j = self.k - l
        return True

    def _setto(self, s: str) -> None:
        o = self.j + 1
        self.b[o : o + len(s)] = list(s)
        self.k = self.j + len(s)

    def _r(self, s: str) -> None:
        if self._m() > 0:
            self._setto(s)

    def _step1(self) -> None:
        # plurals and -ed / -ing
        if self.b[self.k] == "s":
            if self._ends("sses"):
                self.k -= 2
            elif self._ends("ies"):
                self._setto("i")
            elif self.b[self.k - 1] != "s":
                self.k -= 1
        if self._ends("eed"):
            if self._m() > 0:
                self.k -= 1
        elif (self._ends("ed") or self._ends("ing")) and self._vowel_in_stem():
            self.k = self.j
            if self._ends("at"):
                self._setto("ate")
            elif self._ends("bl"):
                self._setto("ble")
            elif self._ends("iz"):
                self._setto("ize")
            elif self._doublec(self.k):
                ch = self.b[self.k]
                self.k -= 1
                if ch in ("l", "s", "z"):
                    self.k += 1
            elif self._m() == 1 and self._cvc(self.k):
                self._setto("e")

    def _step2(self) -> None:
        # terminal y -> i when another vowel is in the stem
        if self._ends("y") and self._vowel_in_stem():
            self.b[self.k] = "i"

    _STEP3_RULES = {
        "a": (("ational", "ate"), ("tional", "tion")),
        "c": (("enci", "ence"), ("anci", "ance")),
        "e": (("izer", "ize"),),
        "l": (("bli", "ble"), ("alli", "al"), ("entli", "ent"), ("eli", "e"), ("ousli", "ous")),
        "o": (("ization", "ize"), ("ation", "ate"), ("ator", "ate")),
        "s": (("alism", "al"), ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous")),
        "t": (("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")),
        "g": (("logi", "log"),),
    }

    def _step3(self) -> None:
        # double suffixes -> single (requires m() > 0 before the suffix)
        if self.k == 0:
            return  # Bug 1 guard
        for suffix, repl in self._STEP3_RULES.get(self.b[self.k - 1], ()):
            if self._ends(suffix):
                self._r(repl)
                return

    _STEP4_RULES = {
        "e": (("icate", "ic"), ("ative", ""), ("alize", "al")),
        "i": (("iciti", "ic"),),
        "l": (("ical", "ic"), ("ful", "")),
        "s": (("ness", ""),),
    }

    def _step4(self) -> None:
        for suffix, repl in self._STEP4_RULES.get(self.b[self.k], ()):
            if self._ends(suffix):
                self._r(repl)
                return

    _STEP5_SUFFIXES = {
        "a": ("al",),
        "c": ("ance", "ence"),
        "e": ("er",),
        "i": ("ic",),
        "l": ("able", "ible"),
        "n": ("ant", "ement", "ment", "ent"),
        "s": ("ism",),
        "t": ("ate", "iti"),
        "u": ("ous",),
        "v": ("ive",),
        "z": ("ize",),
    }

    def _step5(self) -> None:
        # drop -ant, -ence, ... when m() > 1
        if self.k == 0:
            return  # Bug 1 guard
        prev = self.b[self.k - 1]
        if prev == "o":
            # -ion only after s/t (j >= 0 is the Bug 2 guard); -ou otherwise
            if not (
                (self._ends("ion") and self.j >= 0 and self.b[self.j] in ("s", "t"))
                or self._ends("ou")
            ):
                return
        else:
            for suffix in self._STEP5_SUFFIXES.get(prev, ()):
                if self._ends(suffix):
                    break
            else:
                return
        if self._m() > 1:
            self.k = self.j

    def _step6(self) -> None:
        # final -e / double-l cleanup
        self.j = self.k
        if self.b[self.k] == "e":
            a = self._m()
            if a > 1 or (a == 1 and not self._cvc(self.k - 1)):
                self.k -= 1
        if self.b[self.k] == "l" and self._doublec(self.k) and self._m() > 1:
            self.k -= 1

    def run(self) -> str:
        if self.k > 1:  # length <= 2 passes through unchanged
            self._step1()
            self._step2()
            self._step3()
            self._step4()
            self._step5()
            self._step6()
        return "".join(self.b[: self.k + 1])


@lru_cache(maxsize=1 << 18)
def stem(word: str) -> str:
    """Stem one (already lowercased) token."""
    if not word:
        return word
    return _Stemmer(word).run()
