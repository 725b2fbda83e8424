"""Fuzzy string metrics (Z1-Z5) — behavioral parity with the reference's
Utils (reference: src/Utils/Levenshtein.php:17-104,
src/Utils/JaroWinkler.php:32-138, src/Utils/Trigram.php:34-166,
src/Utils/PhoneticMatcher.php:19-150, src/Utils/KeyboardProximity.php:16-157).

These run driver-side over the broadcast vocabulary (the term dictionary
is tiny relative to the corpus), exactly where the reference runs them —
per-query, per-term. Nothing here touches a Spark hot path.
"""

from __future__ import annotations

import math
from functools import lru_cache

# ---------------------------------------------------------------------------
# Z1: Levenshtein
# ---------------------------------------------------------------------------

def levenshtein_distance(s1: str, s2: str) -> int:
    if not s1:
        return len(s2)
    if not s2:
        return len(s1)
    if s1 == s2:
        return 0
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cost = 0 if c1 == c2 else 1
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost))
        prev = cur
    return prev[-1]


def levenshtein_similarity(s1: str, s2: str) -> float:
    max_len = max(len(s1), len(s2))
    if max_len == 0:
        return 0.0  # normalizedDistance returns 0.0 → similarity 1.0; but
        # the reference's maxLen==0 path yields distance 0.0 → similarity 1.0
    return 1.0 - levenshtein_distance(s1, s2) / max_len


def is_within_distance(s1: str, s2: str, max_distance: int) -> bool:
    if abs(len(s1) - len(s2)) > max_distance:
        return False
    return levenshtein_distance(s1, s2) <= max_distance


# ---------------------------------------------------------------------------
# Z2: Jaro-Winkler
# ---------------------------------------------------------------------------

def jaro(s1: str, s2: str) -> float:
    len1, len2 = len(s1), len(s2)
    if len1 == 0 and len2 == 0:
        return 1.0
    if len1 == 0 or len2 == 0:
        return 0.0
    if s1 == s2:
        return 1.0
    window = max(1, max(len1, len2) // 2 - 1)
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i in range(len1):
        lo, hi = max(0, i - window), min(i + window + 1, len2)
        for j in range(lo, hi):
            if m2[j] or s1[i] != s2[j]:
                continue
            m1[i] = m2[j] = True
            matches += 1
            break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if not m1[i]:
            continue
        while not m2[k]:
            k += 1
        if s1[i] != s2[k]:
            transpositions += 1
        k += 1
    return (matches / len1 + matches / len2
            + (matches - transpositions / 2) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_scale: float = 0.1) -> float:
    j = jaro(s1, s2)
    if j < 0.7:  # Winkler bonus gate
        return j
    prefix_len = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a == b:
            prefix_len += 1
        else:
            break
    prefix_scale = min(0.25, max(0.0, prefix_scale))
    return j + prefix_len * prefix_scale * (1.0 - j)


# ---------------------------------------------------------------------------
# Z3: Trigram (padded n-grams, multiset Jaccard; Dice)
# ---------------------------------------------------------------------------

PADDING_CHAR = "_"


def ngrams(s: str, n: int = 3, padding: bool = True) -> list[str]:
    if not s:
        return []
    s = s.lower()
    if padding:
        pad = PADDING_CHAR * (n - 1)
        s = pad + s + pad
    return [s[i:i + n] for i in range(len(s) - n + 1)]


def trigram_similarity(s1: str, s2: str, n: int = 3) -> float:
    if s1 == s2:
        return 1.0
    g1, g2 = ngrams(s1, n), ngrams(s2, n)
    if not g1 or not g2:
        return 0.0
    from collections import Counter
    c1, c2 = Counter(g1), Counter(g2)
    inter = sum(min(c, c2[g]) for g, c in c1.items() if g in c2)
    union = len(g1) + len(g2) - inter
    return inter / union if union > 0 else 0.0


def dice_coefficient(s1: str, s2: str, n: int = 3) -> float:
    if s1 == s2:
        return 1.0
    g1, g2 = set(ngrams(s1, n)), set(ngrams(s2, n))
    if not g1 and not g2:
        return 1.0
    if not g1 or not g2:
        return 0.0
    return 2.0 * len(g1 & g2) / (len(g1) + len(g2))


def find_best_matches(search: str, candidates, threshold: float = 0.3,
                      max_results: int = 10, n: int = 3) -> list[tuple[str, float]]:
    if not ngrams(search, n):
        return []
    matches = [(c, trigram_similarity(search, c, n)) for c in candidates]
    matches = [(c, s) for c, s in matches if s >= threshold]
    matches.sort(key=lambda cs: -cs[1])
    return matches[:max_results]


# ---------------------------------------------------------------------------
# Z4: Metaphone phonetic matching (Philips 1990, the algorithm PHP's
# metaphone() implements) + common-typo map
# ---------------------------------------------------------------------------

_VOWELS = "AEIOU"


def _is_vowel(s: str, i: int) -> bool:
    return 0 <= i < len(s) and s[i] in _VOWELS


@lru_cache(maxsize=65536)
def metaphone(word: str) -> str:
    """Classic Metaphone key (subset of PHP metaphone() behavior for
    ASCII words; non-letters are skipped)."""
    w = "".join(ch for ch in word.upper() if ch.isalpha())
    if not w:
        return ""
    out = []
    i = 0
    n = len(w)

    # initial-letter exceptions
    if w.startswith(("AE", "GN", "KN", "PN", "WR")):
        i = 1
    elif w.startswith("X"):
        out.append("S")
        i = 1
    elif w.startswith("WH"):
        out.append("W")
        i = 2

    while i < n:
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        prev = w[i - 1] if i > 0 else ""
        # skip doubled letters except C
        if c == prev and c != "C":
            i += 1
            continue
        if c in _VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and prev == "M"):
                out.append("B")
        elif c == "C":
            if nxt == "I" and i + 2 < n and w[i + 2] == "A":
                out.append("X")
            elif nxt == "H":
                out.append("X")
                i += 1
            elif nxt in "IEY":
                out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and i + 2 < n and w[i + 2] in "EIY":
                out.append("J")
                i += 2
            else:
                out.append("T")
        elif c == "F":
            out.append("F")
        elif c == "G":
            if nxt == "H":
                if not (i + 2 >= n or _is_vowel(w, i + 2)):
                    pass  # silent GH
                elif i == 0:
                    out.append("K")
                else:
                    out.append("F") if False else out.append("K")
                i += 1
            elif nxt == "N":
                pass  # silent before N
            elif nxt in "IEY":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            if _is_vowel(w, i - 1) and not _is_vowel(w, i + 1):
                pass  # silent
            elif prev in "CSPTG":
                pass
            else:
                out.append("H")
        elif c == "J":
            out.append("J")
        elif c == "K":
            if prev != "C":
                out.append("K")
        elif c == "L":
            out.append("L")
        elif c == "M":
            out.append("M")
        elif c == "N":
            out.append("N")
        elif c == "P":
            if nxt == "H":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "Q":
            out.append("K")
        elif c == "R":
            out.append("R")
        elif c == "S":
            if nxt == "H":
                out.append("X")
                i += 1
            elif nxt == "I" and i + 2 < n and w[i + 2] in "OA":
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt == "H":
                out.append("0")
                i += 1
            elif nxt == "I" and i + 2 < n and w[i + 2] in "OA":
                out.append("X")
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if _is_vowel(w, i + 1):
                out.append("W")
        elif c == "X":
            out.append("KS")
        elif c == "Y":
            if _is_vowel(w, i + 1):
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out)


def _similar_text_ratio(s1: str, s2: str) -> float:
    """PHP similar_text percent/100 (longest-common-substring recursion)."""
    def sim(a: str, b: str) -> int:
        if not a or not b:
            return 0
        best_len = best_i = best_j = 0
        for i in range(len(a)):
            for j in range(len(b)):
                k = 0
                while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                    k += 1
                if k > best_len:
                    best_len, best_i, best_j = k, i, j
        if best_len == 0:
            return 0
        return (best_len + sim(a[:best_i], b[:best_j])
                + sim(a[best_i + best_len:], b[best_j + best_len:]))
    total = len(s1) + len(s2)
    if total == 0:
        return 0.0
    return 2.0 * sim(s1, s2) / total


def phonetic_similarity(w1: str, w2: str) -> float:
    m1, m2 = metaphone(w1), metaphone(w2)
    if m1 == m2:
        return 1.0
    if max(len(m1), len(m2)) == 0:
        return 0.0
    return _similar_text_ratio(m1, m2)


def is_phonetic_typo(original: str, correction: str) -> bool:
    if abs(len(original) - len(correction)) > 2:
        return False
    return phonetic_similarity(original, correction) >= 0.8


# quick common-typo map (reference: src/Utils/PhoneticMatcher.php:115-141)
COMMON_TYPOS = {
    "fone": "phone", "thier": "their", "teh": "the", "adn": "and",
    "taht": "that", "whihc": "which", "waht": "what", "were": "where",
    "wher": "where", "becuase": "because", "becasue": "because",
    "beleive": "believe", "recieve": "receive", "seperate": "separate",
    "definately": "definitely", "neccessary": "necessary",
    "occured": "occurred", "untill": "until", "wich": "which",
    "thru": "through", "tho": "though", "alot": "a lot",
    "cant": "can't", "wont": "won't", "dont": "don't",
}


def quick_phonetic_correction(term: str) -> str | None:
    return COMMON_TYPOS.get(term.lower())


# ---------------------------------------------------------------------------
# Z5: QWERTY keyboard proximity
# ---------------------------------------------------------------------------

_QWERTY = {}
for row, keys in enumerate(["`1234567890-=", "qwertyuiop[]\\",
                            "asdfghjkl;'", "zxcvbnm,./"]):
    for col, ch in enumerate(keys):
        _QWERTY[ch] = (row, col)


def key_distance(k1: str, k2: str) -> float:
    k1, k2 = k1.lower(), k2.lower()
    if k1 not in _QWERTY or k2 not in _QWERTY:
        return 10.0
    (r1, c1), (r2, c2) = _QWERTY[k1], _QWERTY[k2]
    return math.sqrt((c1 - c2) ** 2 + (r1 - r2) ** 2)


def keyboard_string_distance(s1: str, s2: str) -> float:
    if len(s1) != len(s2):
        return 10.0
    if not s1:
        return 10.0
    return sum(key_distance(a, b) for a, b in zip(s1, s2)) / len(s1)


def _is_missing_char(shorter: str, longer: str) -> bool:
    i = j = differences = 0
    while i < len(shorter) and j < len(longer):
        if shorter[i] == longer[j]:
            i += 1
            j += 1
        else:
            differences += 1
            if differences > 1:
                return False
            j += 1
    return differences <= 1


def is_keyboard_typo(original: str, correction: str) -> bool:
    len_diff = abs(len(original) - len(correction))
    if len_diff > 1:
        return False
    if len(original) == len(correction):
        return keyboard_string_distance(original, correction) <= 1.5
    if len(original) < len(correction):
        return _is_missing_char(original, correction)
    return _is_missing_char(correction, original)


def keyboard_proximity_score(original: str, correction: str) -> float:
    if original == correction:
        return 1.0
    if abs(len(original) - len(correction)) > 1:
        return 0.0
    if len(original) == len(correction):
        return max(0.0, 1.0 - keyboard_string_distance(original, correction) / 3.0)
    if is_keyboard_typo(original, correction):
        return 0.8
    return 0.0
