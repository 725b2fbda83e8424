"""French / German / Spanish stemmers — behavioral parity with the
reference (reference: src/Stemmer/Languages/FrenchStemmer.php:17-243,
GermanStemmer.php:13-211, SpanishStemmer.php:14-287).

Like the English port (stemmer.py), these run on UTF-8 *bytes* because
the PHP originals index with strlen/``$word[$i]`` — which means their
accented-vowel lists never match in single-byte position checks (a
2-byte ``à`` can't equal one byte). That quirk is part of the observed
behavior and is preserved: position-level vowel checks test ASCII
vowels only, while suffix comparisons (which use substring equality)
do see multibyte suffixes like ``é`` / ``ç`` / ``ación``.
"""

from __future__ import annotations

_ASCII_VOWELS_FR = b"aeiouy"
_ASCII_VOWELS_DE = b"aeiouy"
_ASCII_VOWELS_ES = b"aeiou"


def _is_vowel(w: bytes, i: int, vowels: bytes) -> bool:
    return 0 <= i < len(w) and w[i] in vowels


def _r1(w: bytes, vowels: bytes, minimum: int = 0) -> int:
    for i in range(len(w) - 1):
        if not _is_vowel(w, i, vowels) and _is_vowel(w, i + 1, vowels):
            return max(minimum, i + 2)
    return len(w)


def _r2(w: bytes, r1: int, vowels: bytes) -> int:
    for i in range(r1, len(w) - 1):
        if not _is_vowel(w, i, vowels) and _is_vowel(w, i + 1, vowels):
            return i + 2
    return len(w)


def _prep(word: str) -> bytes:
    return word.strip().lower().encode("utf-8")


def _out(w: bytes) -> str:
    return w.decode("utf-8", "ignore")


# ---------------------------------------------------------------------------
# French
# ---------------------------------------------------------------------------

_FR_STEP1 = [  # (suffix, region_key) — insertion order matters
    (b"ances", "r2"), (b"iques", "r2"), (b"ismes", "r2"), (b"ables", "r2"),
    (b"istes", "r2"), (b"ance", "r2"), (b"ique", "r2"), (b"isme", "r2"),
    (b"able", "r2"), (b"iste", "r2"), (b"eux", "r2"),
    (b"atrices", "r2"), (b"ateurs", "r2"), (b"ations", "r2"),
    (b"atrice", "r2"), (b"ateur", "r2"), (b"ation", "r2"),
    (b"ments", "rv"), (b"ment", "rv"),
]

_FR_STEP2A = [s.encode() for s in [
    "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai", "iraIent",
    "irais", "irait", "iras", "irent", "irez", "iriez", "irions", "irons",
    "iront", "is", "issaIent", "issais", "issait", "issant", "issante",
    "issantes", "issants", "isse", "issent", "isses", "issez", "issiez",
    "issions", "issons", "it"]]

_FR_STEP2B = [s.encode() for s in [
    "eraIent", "erais", "erait", "eras", "erez", "eriez", "erions",
    "erons", "eront", "erai", "era", "er", "ez", "é", "ée", "ées",
    "és", "èrent", "ant", "ante", "antes", "ants", "ât", "a",
    "ai", "aient", "ais", "ait", "as", "asse", "assent", "asses",
    "assiez", "assions", "e", "es", "s"]]


def _fr_rv(w: bytes) -> int:
    n = len(w)
    v = _ASCII_VOWELS_FR
    if n >= 2 and _is_vowel(w, 0, v) and _is_vowel(w, 1, v):
        for i in range(2, n):
            if not _is_vowel(w, i, v):
                return i + 1
        return n
    found_consonant = False
    for i in range(n):
        if not _is_vowel(w, i, v):
            found_consonant = True
        elif found_consonant:
            return i + 1
    return n


def stem_french(word: str) -> str:
    w = _prep(word)
    if len(w) <= 2:
        return _out(w)
    v = _ASCII_VOWELS_FR
    rv = _fr_rv(w)
    r1 = _r1(w, v)
    r2 = _r2(w, r1, v)

    # step 1
    for suffix, region_key in _FR_STEP1:
        if w.endswith(suffix):
            pos = len(w) - len(suffix)
            region = r2 if region_key == "r2" else rv
            if pos >= region:
                w = w[:-len(suffix)]
                if suffix in (b"ment", b"ments") and w.endswith(b"emm"):
                    w = w[:-3] + b"ent"
                break

    # step 2a / 2b
    done = False
    for suffix in _FR_STEP2A:
        if w.endswith(suffix):
            pos = len(w) - len(suffix)
            if pos >= rv and pos > 0 and not _is_vowel(w, pos - 1, v):
                w = w[:-len(suffix)]
                done = True
                break
    if not done:
        if w.endswith(b"eurs") and len(w) - 4 >= rv:
            w = w[:-4]
        else:
            for suffix in _FR_STEP2B:
                if w.endswith(suffix):
                    pos = len(w) - len(suffix)
                    if pos >= rv:
                        w = w[:-len(suffix)]
                        break

    # step 3
    if w.endswith(b"Y"):
        w = w[:-1] + b"i"
    elif w.endswith("ç".encode()):
        w = w[:-2] + b"c"
    return _out(w)


# ---------------------------------------------------------------------------
# German
# ---------------------------------------------------------------------------

_DE_S_ENDINGS = b"bdfghklmnrt"
_DE_STEP1 = [b"ern", b"em", b"er", b"en", b"es", b"e", b"s"]
_DE_STEP2 = [b"est", b"en", b"st", b"er", b"et"]
_DE_STEP3 = [  # (suffix, region_key, not_after)
    (b"end", "r2", b""), (b"ung", "r2", b""),
    (b"isch", "r2", b"e"), (b"ig", "r2", b"e"), (b"ik", "r2", b"e"),
    (b"lich", "r2", b""), (b"heit", "r2", b""), (b"keit", "r2", b""),
]


def stem_german(word: str) -> str:
    w = _prep(word)
    if len(w) <= 2:
        return _out(w)
    w = w.replace("ß".encode(), b"ss")
    v = _ASCII_VOWELS_DE
    r1 = _r1(w, v, minimum=3)
    r2 = _r2(w, r1, v)

    for suffix in _DE_STEP1:
        if w.endswith(suffix):
            pos = len(w) - len(suffix)
            if suffix == b"s" and pos > 0 and w[pos - 1] in _DE_S_ENDINGS:
                continue
            if pos >= r1:
                w = w[:-len(suffix)]
                break

    for suffix in _DE_STEP2:
        if w.endswith(suffix):
            pos = len(w) - len(suffix)
            if pos >= r1:
                if suffix == b"st" and pos >= 3:
                    preceding = w[pos - 3:pos]
                    if len(preceding) >= 3 and preceding[2] == preceding[1]:
                        continue
                w = w[:-len(suffix)]
                break

    for suffix, region_key, not_after in _DE_STEP3:
        if w.endswith(suffix):
            pos = len(w) - len(suffix)
            if pos >= r2:
                if not_after and pos > 0 and w[pos - 1] in not_after:
                    continue
                w = w[:-len(suffix)]
                if suffix in (b"lich", b"ig") and w.endswith(b"e"):
                    if len(w) - 1 >= r1:
                        w = w[:-1]
                break

    # umlauts → base vowels (2-byte sequences)
    for uml, base in (("ä", b"a"), ("ö", b"o"), ("ü", b"u")):
        w = w.replace(uml.encode(), base)
    return _out(w)


# ---------------------------------------------------------------------------
# Spanish
# ---------------------------------------------------------------------------

_ES_PRONOUNS = [s.encode() for s in [
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo"]]
_ES_VERB_ENDINGS = [s.encode() for s in
                    ["ar", "er", "ir", "ando", "iendo", "ado", "ido"]]
_ES_STEP1 = [  # (suffix, region_key, replacement)
    ("amientos", "r2", b""), ("imientos", "r2", b""),
    ("amiento", "r2", b""), ("imiento", "r2", b""),
    ("anzas", "r2", b""), ("ismos", "r2", b""), ("ables", "r2", b""),
    ("ibles", "r2", b""), ("istas", "r2", b""),
    ("anza", "r2", b""), ("ismo", "r2", b""), ("able", "r2", b""),
    ("ible", "r2", b""), ("ista", "r2", b""),
    ("osos", "r2", b""), ("osas", "r2", b""), ("oso", "r2", b""),
    ("osa", "r2", b""),
    ("aciones", "r2", b""), ("ación", "r2", b""),
    ("logías", "r2", b"log"), ("logía", "r2", b"log"),
    ("uciones", "r2", b"u"), ("ución", "r2", b"u"),
    ("encias", "r2", b"ente"), ("encia", "r2", b"ente"),
    ("amente", "r1", b""),
    ("mente", "r2", b""),
    ("idades", "r2", b""), ("idad", "r2", b""),
    ("ivas", "r2", b""), ("ivos", "r2", b""), ("iva", "r2", b""),
    ("ivo", "r2", b""),
]
_ES_STEP2 = sorted(
    {s.encode() for s in [
        "aríamos", "eríamos", "iríamos", "iéramos", "iésemos",
        "aríais", "eríais", "iríais", "ierais", "ieseis", "asteis", "isteis",
        "ábamos", "aremos", "eremos", "iremos", "áramos", "éramos",
        "ásemos", "arían", "erían", "irían", "ieran", "iesen", "ieron",
        "iendo", "ando", "aban", "aran", "eron", "arán", "erán", "irán",
        "arás", "erás", "irás", "aría", "ería", "iría", "iera", "iese",
        "aste", "iste", "aba", "ada", "ida", "ara", "ase", "ían",
        "ado", "ido", "ar", "er", "ir", "as",
        "ías", "ía", "en", "es", "éis", "emos", "an"]},
    key=len, reverse=True)
_ES_STEP3 = [s.encode() for s in ["os", "a", "o", "á", "í", "ó", "e", "é"]]


def _es_rv(w: bytes) -> int:
    n = len(w)
    v = _ASCII_VOWELS_ES
    if n >= 2 and not _is_vowel(w, 1, v):
        for i in range(2, n):
            if _is_vowel(w, i, v):
                return i + 1
        return n
    if n >= 2 and _is_vowel(w, 0, v) and _is_vowel(w, 1, v):
        for i in range(2, n):
            if not _is_vowel(w, i, v):
                return i + 1
        return n
    return min(3, n)


def stem_spanish(word: str) -> str:
    w = _prep(word)
    if len(w) <= 2:
        return _out(w)
    v = _ASCII_VOWELS_ES
    rv = _es_rv(w)
    r1 = _r1(w, v)
    r2 = _r2(w, r1, v)

    # step 0: attached pronouns
    for pron in _ES_PRONOUNS:
        if w.endswith(pron):
            pos = len(w) - len(pron)
            stem_part = w[:pos]
            if any(stem_part.endswith(e) for e in _ES_VERB_ENDINGS) \
                    and len(stem_part) >= rv:
                w = stem_part
                for acc in ("ár", "ér", "ír"):
                    if w.endswith(acc.encode()):
                        # PHP byte splice quirk: drop 2 bytes, re-append last
                        w = w[:-2] + w[-1:]
                        break
                break

    for suffix_s, region_key, repl in _ES_STEP1:
        suffix = suffix_s.encode()
        if w.endswith(suffix):
            pos = len(w) - len(suffix)
            region = r2 if region_key == "r2" else r1
            if pos >= region:
                w = w[:-len(suffix)] + repl
                break

    for suffix in _ES_STEP2:
        if w.endswith(suffix):
            pos = len(w) - len(suffix)
            if pos >= rv:
                w = w[:-len(suffix)]
                break

    for suffix in _ES_STEP3:
        if w.endswith(suffix):
            pos = len(w) - len(suffix)
            if pos >= rv:
                w = w[:-len(suffix)]
                break

    for acc, base in (("á", b"a"), ("é", b"e"), ("í", b"i"), ("ó", b"o"),
                      ("ú", b"u"), ("ñ", b"n"), ("ü", b"u")):
        w = w.replace(acc.encode(), base)
    return _out(w)


STEMMERS = {
    "french": stem_french, "fr": stem_french,
    "german": stem_german, "de": stem_german,
    "spanish": stem_spanish, "es": stem_spanish,
}
