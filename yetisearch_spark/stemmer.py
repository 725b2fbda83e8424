"""English Porter(-ish) stemmer — behavioral parity with the reference.

Reimplements the exact step logic of the reference's English stemmer
(reference: src/Stemmer/Languages/EnglishStemmer.php:37-334 and
src/Stemmer/BaseStemmer.php:15-81), including its deliberate deviations
from textbook Porter2 (the ``us``/``is`` guards in step 1a, the
exceptions map, and the "continue scanning suffixes when the measure
gate fails" behavior in steps 2/3).

The PHP implementation operates on *bytes* (``strlen``/``substr``), so
this port runs the algorithm over the UTF-8 byte encoding of the word
and decodes at the end. All suffix constants are ASCII, so multi-byte
characters are never split by suffix replacement.

This module is pure Python with no Spark dependency; the hot path in
the analyzer memoizes ``stem()`` per unique token (vocabulary is tiny
relative to token count).
"""

from __future__ import annotations

_VOWELS = b"aeiouy"
_WXY = b"wxy"

# reference: src/Stemmer/Languages/EnglishStemmer.php:15-35
_EXCEPTIONS = {
    b"skis": b"ski",
    b"skies": b"sky",
    b"dying": b"die",
    b"lying": b"lie",
    b"tying": b"tie",
    b"idly": b"idl",
    b"gently": b"gentl",
    b"ugly": b"ugli",
    b"early": b"earli",
    b"only": b"onli",
    b"singly": b"singl",
    b"sky": b"sky",
    b"news": b"news",
    b"howe": b"howe",
    b"atlas": b"atlas",
    b"cosmos": b"cosmos",
    b"bias": b"bias",
    b"andes": b"andes",
}

# reference: src/Stemmer/Languages/EnglishStemmer.php:169-190 (insertion order matters)
_STEP2_SUFFIXES = (
    (b"ational", b"ate"),
    (b"tional", b"tion"),
    (b"enci", b"ence"),
    (b"anci", b"ance"),
    (b"izer", b"ize"),
    (b"abli", b"able"),
    (b"alli", b"al"),
    (b"entli", b"ent"),
    (b"eli", b"e"),
    (b"ousli", b"ous"),
    (b"ization", b"ize"),
    (b"ation", b"ate"),
    (b"ator", b"ate"),
    (b"alism", b"al"),
    (b"iveness", b"ive"),
    (b"fulness", b"ful"),
    (b"ousness", b"ous"),
    (b"aliti", b"al"),
    (b"iviti", b"ive"),
    (b"biliti", b"ble"),
)

# reference: src/Stemmer/Languages/EnglishStemmer.php:205-213
_STEP3_SUFFIXES = (
    (b"icate", b"ic"),
    (b"ative", b""),
    (b"alize", b"al"),
    (b"iciti", b"ic"),
    (b"ical", b"ic"),
    (b"ful", b""),
    (b"ness", b""),
)

# reference: src/Stemmer/Languages/EnglishStemmer.php:228-230
_STEP4_SUFFIXES = (
    b"al", b"ance", b"ence", b"er", b"ic", b"able", b"ible", b"ant",
    b"ement", b"ment", b"ent", b"ism", b"ate", b"iti", b"ous",
    b"ive", b"ize",
)


def _measure_gt(stem: bytes, minimum: int) -> bool:
    """Porter measure (vowel→consonant transitions) > minimum.

    reference: src/Stemmer/Languages/EnglishStemmer.php:273-288
    """
    measure = 0
    prev_vowel = False
    for ch in stem:
        is_vowel = ch in _VOWELS
        if not is_vowel and prev_vowel:
            measure += 1
            if measure > minimum:
                return True
        prev_vowel = is_vowel
    return measure > minimum


def _contains_vowel(stem: bytes) -> bool:
    return any(ch in _VOWELS for ch in stem)


def _ends_cvc(word: bytes) -> bool:
    """consonant-vowel-consonant ending, final not w/x/y.

    reference: src/Stemmer/Languages/EnglishStemmer.php:321-334
    """
    if len(word) < 3:
        return False
    c1 = word[-3] not in _VOWELS
    v = word[-2] in _VOWELS
    c2 = word[-1] not in _VOWELS
    not_wxy = word[-1] not in _WXY
    return c1 and v and c2 and not_wxy


def _step1a(w: bytes) -> bytes:
    if w.endswith(b"sses"):
        return w[:-4] + b"ss"
    if w.endswith(b"ies"):
        return w[:-3] + b"i"
    if w.endswith(b"ss") or w.endswith(b"us") or w.endswith(b"is"):
        return w
    if w.endswith(b"s"):
        return w[:-1]
    return w


def _step1b(w: bytes) -> bytes:
    if w.endswith(b"eedly") or w.endswith(b"eed"):
        suffix_len = 5 if w.endswith(b"eedly") else 3
        base = w[:-suffix_len]
        if _measure_gt(base, 0):
            if w.endswith(b"eedly"):
                w = w[:-5] + b"ee"
            if w.endswith(b"eed"):
                w = w[:-3] + b"ee"
        return w

    modified = False
    for suffix in (b"edly", b"ed", b"ingly", b"ing"):
        if w.endswith(suffix):
            base = w[: -len(suffix)]
            if _contains_vowel(base):
                w = base
                modified = True
                break

    if modified:
        if w.endswith(b"at"):
            return w + b"e"
        if w.endswith(b"bl"):
            return w + b"e"
        if w.endswith(b"iz"):
            return w + b"e"
        # double consonant (not ll/ss/zz) → drop one
        if (
            len(w) >= 2
            and w[-1] == w[-2]
            and w[-1] not in _VOWELS
            and not w.endswith(b"ll")
            and not w.endswith(b"ss")
            and not w.endswith(b"zz")
        ):
            w = w[:-1]
        elif len(w) <= 3 and _ends_cvc(w):
            w = w + b"e"
    return w


def _step1c(w: bytes) -> bytes:
    if len(w) > 2 and (w.endswith(b"y") or w.endswith(b"Y")):
        if w[-2] not in _VOWELS:
            return w[:-1] + b"i"
    return w


def _step2(w: bytes) -> bytes:
    for suffix, repl in _STEP2_SUFFIXES:
        if w.endswith(suffix):
            base = w[: -len(suffix)]
            if _measure_gt(base, 0):
                return base + repl
            # measure gate failed: keep scanning remaining suffixes (PHP behavior)
    return w


def _step3(w: bytes) -> bytes:
    for suffix, repl in _STEP3_SUFFIXES:
        if w.endswith(suffix):
            base = w[: -len(suffix)]
            if _measure_gt(base, 0):
                return base + repl
    return w


def _step4(w: bytes) -> bytes:
    for suffix in _STEP4_SUFFIXES:
        if w.endswith(suffix):
            base = w[: -len(suffix)]
            if _measure_gt(base, 1):
                w = base
                break
    # 'ion' runs after the loop, on the possibly-updated word (PHP order)
    if w.endswith(b"ion"):
        base = w[:-3]
        if _measure_gt(base, 1) and (base.endswith(b"s") or base.endswith(b"t")):
            w = base
    return w


def _step5(w: bytes) -> bytes:
    if w.endswith(b"e"):
        base = w[:-1]
        if _measure_gt(base, 1) or (_measure_gt(base, 0) and not _ends_cvc(base)):
            w = base
    if w.endswith(b"ll") and _measure_gt(w[:-1], 1):
        w = w[:-1]
    return w


def stem(word: str) -> str:
    """Stem one (already-lowercased-or-not) word; returns the stem."""
    w = word.strip().lower().encode("utf-8")
    if len(w) <= 2:
        return w.decode("utf-8", "ignore")
    exc = _EXCEPTIONS.get(w)
    if exc is not None:
        return exc.decode("utf-8")
    if w.startswith(b"'"):
        w = w[1:]
    w = _step1a(w)
    w = _step1b(w)
    w = _step1c(w)
    w = _step2(w)
    w = _step3(w)
    w = _step4(w)
    w = _step5(w)
    return w.decode("utf-8", "ignore")
