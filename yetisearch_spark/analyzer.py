"""Text-analysis pipeline: normalize → tokenize → stop-filter → stem → length-filter.

Behavioral parity with the reference analyzer
(reference: src/Analyzers/StandardAnalyzer.php:34-332,
src/Helpers/UTF8Helper.php:41-105), applied **symmetrically** to
documents and queries (canonical decision: SURVEY.md §7.0.1 — the
reference itself is asymmetric, indexing raw unicode61 tokens while
stop-filtering queries; our engine uses one pipeline for both sides and
the rank-identity oracle is fed the same analyzed token stream).

Everything here is vectorized for Spark: ``analyze_udf`` is a pandas
UDF (Arrow-batched) whose inner loop touches each *unique* token once
via a memo dict — no per-row Python in the JVM↔Python boundary beyond
the batch itself.
"""

from __future__ import annotations

import re
from typing import Iterable, List

from .stemmer import stem as _stem_en

MIN_WORD_LENGTH = 2
MAX_WORD_LENGTH = 50

# ---------------------------------------------------------------------------
# Stop words (reference: src/Analyzers/StandardAnalyzer.php:172-253)
# ---------------------------------------------------------------------------

STOP_WORDS_EN = frozenset("""
a about above after again against all am an and any are as at be because
been before being below between both but by can did do does doing down
during each few for from further had has have having he her here hers
herself him himself his how i if in into is it its itself just me more
most my myself no nor not now of off on once only or other our ours
ourselves out over own same she should so some such than that the their
theirs them themselves then there these they this those through to too
under until up very was we were what when where which while who whom why
will with would you your yours yourself yourselves
""".split())

STOP_WORDS_FR = frozenset("""
au aux avec ce ces dans de des du elle en et eux il je la le les leur lui
ma mais me même mes moi mon ne nos notre nous on ou par pas pour qu que
qui sa se ses son sur ta te tes toi ton tu un une vos votre vous sont est
été être
""".split())

STOP_WORDS_DE = frozenset("""
aber als am an auch auf aus bei bin bis bist da dadurch daher darum das
daß dass dein deine dem den der des dessen deshalb die dies dieser dieses
doch dort du durch ein eine einem einen einer eines er es euer eure für
hatte hatten hattest hattet hier hinter ich ihr ihre im in ist ja jede
jedem jeden jeder jedes jener jenes jetzt kann kannst können könnt machen
mein meine mit muß mußt musst müssen müßt nach nachdem nein nicht nun
oder seid sein seine sich sie sind soll sollen sollst sollt sonst soweit
sowie und unser unsere unter vom von vor wann warum was weiter weitere
wenn wer werde werden werdet weshalb wie wieder wieso wir wird wirst wo
woher wohin zu zum zur über
""".split())

STOP_WORDS_ES = frozenset("""
a al algo algunas algunos ante antes como con contra cual cuando de del
desde donde durante e el ella ellas ellos en entre era erais eran eras
eres es esa esas ese eso esos esta estaba estabais estaban estabas estad
estada estadas estado estados estamos estando estar estaremos estará
estarán estarás estaré estaréis estaría estaríais estaríamos estarían
estarías estas este estemos esto estos estoy estuve estuviera estuvierais
estuvieran estuvieras estuvieron estuviese estuvieseis estuviesen
estuvieses estuvimos estuviste estuvisteis estuviéramos estuviésemos
estuvo está estábamos estáis están estás esté estéis estén estés fue
fuera fuerais fueran fueras fueron fuese fueseis fuesen fueses fui fuimos
fuiste fuisteis fuéramos fuésemos ha habida habidas habido habidos
habiendo habremos habrá habrán habrás habré habréis habría habríais
habríamos habrían habrías habéis había habíais habíamos habían habías han
has hasta hay haya hayamos hayan hayas hayáis he hemos hube hubiera
hubierais hubieran hubieras hubieron hubiese hubieseis hubiesen hubieses
hubimos hubiste hubisteis hubiéramos hubiésemos hubo la las le les lo los
me mi mis mucho muchos muy más mí mía mías mío míos nada ni no nos
nosotras nosotros nuestra nuestras nuestro nuestros o os otra otras otro
otros para pero poco por porque que quien quienes qué se sea seamos sean
seas seremos será serán serás seré seréis sería seríais seríamos serían
serías seáis sido siendo sin sobre sois somos son soy su sus suya suyas
suyo suyos sí también tanto te tendremos tendrá tendrán tendrás tendré
tendréis tendría tendríais tendríamos tendrían tendrías tened tenemos
tenga tengamos tengan tengas tengo tengáis tenida tenidas tenido tenidos
teniendo tenéis tenía teníais teníamos tenían tenías ti tiene tienen
tienes todo todos tu tus tuve tuviera tuvierais tuvieran tuvieras
tuvieron tuviese tuvieseis tuviesen tuvieses tuvimos tuviste tuvisteis
tuviéramos tuviésemos tuvo tuya tuyas tuyo tuyos tú un una uno unos
vosotras vosotros vuestra vuestras vuestro vuestros y ya yo él éramos
""".split())

STOP_WORDS = {"english": STOP_WORDS_EN, "en": STOP_WORDS_EN,
              "french": STOP_WORDS_FR, "fr": STOP_WORDS_FR,
              "german": STOP_WORDS_DE, "de": STOP_WORDS_DE,
              "spanish": STOP_WORDS_ES, "es": STOP_WORDS_ES}

# ---------------------------------------------------------------------------
# Normalization (reference: src/Analyzers/StandardAnalyzer.php:116-134,
# src/Helpers/UTF8Helper.php:41-105)
# ---------------------------------------------------------------------------

# Unicode whitespace / control chars → space (UTF8Helper::normalize_whitespace)
_WS_CODEPOINTS = (
    list(range(0x00, 0x21))
    + [0x85, 0xA0, 0x1680, 0x180E]
    + list(range(0x2000, 0x2010))
    + list(range(0x2028, 0x2030))
    + [0x205F, 0x3000, 0xFEFF]
)
_WS_TABLE = {cp: " " for cp in _WS_CODEPOINTS}

# Invisible chars → removed (UTF8Helper::remove_invisible_characters).
# Note: normalize_whitespace already converted most of these to spaces,
# mirroring the reference call order (normalize → remove_invisible).
_INVIS_TABLE = {cp: None for cp in [0x200B, 0x200C, 0x200D, 0xFEFF,
                                    0x200E, 0x200F, 0x202A, 0x202B,
                                    0x202C, 0x202D, 0x202E]}

_SMART_TABLE = {0x201C: '"', 0x201D: '"', 0x2018: "'", 0x2019: "'",
                0x2026: "..."}

# One fused table: every char in the reference's remove_invisible list is
# already mapped to ' ' by its normalize_whitespace list (applied first
# there), so WS∪SMART is behavior-identical to the reference's
# translate→remove→translate sequence — one pass instead of three.
_NORM_TABLE = {**_WS_TABLE, **_SMART_TABLE}

_COLLAPSE_RE = re.compile(r"\s+")


def normalize(text: str) -> str:
    text = text.translate(_NORM_TABLE)
    text = _COLLAPSE_RE.sub(" ", text)
    return text.strip()


# ---------------------------------------------------------------------------
# Tokenization (reference: src/Analyzers/StandardAnalyzer.php:58-85,267-309)
# ---------------------------------------------------------------------------

_HTML_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_HTML_TAG_RE = re.compile(r"<[^>]*>")

# Contractions fused into ONE ordered-alternation regex. Alternation picks
# the first alternative at the leftmost position, matching the reference's
# sequential str_ireplace order (can't before the generic n't).
_CONTRACTION_MAP = {
    "can't": "cannot",
    "won't": "will not",
    "n't": " not",
    "'re": " are",
    "'ve": " have",
    "'ll": " will",
    "'d": " would",
    "'m": " am",
}
_CONTRACTION_RE = re.compile(
    "|".join(re.escape(p) for p in _CONTRACTION_MAP), re.IGNORECASE)

# Word-bounded 's contractions (possessives are NOT expanded); the
# reference's replacement strings are lowercase regardless of input case.
_S_WORDS = ["it", "that", "what", "there", "here", "he", "she",
            "who", "how", "where", "when", "why"]
_S_CONTRACTION_RE = re.compile(
    r"\b(" + "|".join(_S_WORDS) + r")'s\b", re.IGNORECASE)


def _contraction_repl(m: re.Match) -> str:
    return _CONTRACTION_MAP[m.group(0).lower()]


def _s_contraction_repl(m: re.Match) -> str:
    return m.group(1).lower() + " is"


# strip punctuation: keep letters/digits/whitespace/'/- ; \w also matches _,
# so underscores are folded into the same strip pass (PHP uses \p{L}\p{N}).
_PUNCT_RE = re.compile(r"[^\w\s'\-]|_", re.UNICODE)
_SPLIT_RE = re.compile(r"\s+")

# Canonical guard (ours, applied symmetrically): a token must contain at
# least one letter/digit so the space-joined stream round-trips through the
# FTS5 unicode61 oracle tokenizer (separator-only tokens like "--" would
# silently vanish there and skew doc lengths).
_HAS_ALNUM_RE = re.compile(r"[^\W_]", re.UNICODE)


def tokenize(text: str) -> List[str]:
    # guarded passes: the regexes only run when their trigger char exists
    # (profiled: re.sub dominated the analyzer at ~45% of wall)
    if "<" in text:
        text = _HTML_COMMENT_RE.sub(" ", text)
        text = _HTML_TAG_RE.sub(" ", text)
    if "'" in text:
        text = _CONTRACTION_RE.sub(_contraction_repl, text)
        text = _S_CONTRACTION_RE.sub(_s_contraction_repl, text)
    text = _PUNCT_RE.sub(" ", text)
    text = text.lower()
    return [t for t in _SPLIT_RE.split(text) if t]


def remove_stop_words(tokens: Iterable[str], language: str = "english") -> List[str]:
    stop = STOP_WORDS.get(language, STOP_WORDS_EN)
    return [t for t in tokens if t not in stop]


def _valid(token: str) -> bool:
    n = len(token)
    return MIN_WORD_LENGTH <= n <= MAX_WORD_LENGTH and bool(_HAS_ALNUM_RE.search(token))


def _stemmer_for(language: str):
    if language in ("english", "en"):
        return _stem_en
    from .stemmer_intl import STEMMERS
    return STEMMERS.get(language, _stem_en)


def analyze(text: str, language: str = "english",
            _memo: dict | None = None) -> List[str]:
    """Full pipeline → list of index terms (positions = list indices)."""
    if not text:
        return []
    memo = _memo if _memo is not None else {}
    out = []
    stop = STOP_WORDS.get(language, STOP_WORDS_EN)
    stem_fn = _stemmer_for(language)
    # normalize minus the whitespace collapse: \s+ split below absorbs runs,
    # so skipping the collapse is output-identical and saves a regex pass
    text = text.translate(_NORM_TABLE)
    for tok in tokenize(text):
        if tok in stop:
            continue
        ent = memo.get(tok)
        if ent is None:
            stemmed = stem_fn(tok)
            ent = (stemmed, _valid(stemmed))  # validity memoized with stem
            memo[tok] = ent
        if ent[1]:
            out.append(ent[0])
    return out


#: process-level stem/validity memo, shared across Arrow batches AND
#: tasks on a reused Python worker (guide §4.5: heavyweight per-token
#: work — regex stemming — amortizes across the whole executor life).
#: stem() is pure, so reuse is exact; bounded to keep worker RSS sane.
_STEM_MEMO: dict = {}
_STEM_MEMO_MAX = 2_000_000


def analyze_batch(texts: Iterable[str],
                  language: str = "english") -> List[List[str]]:
    """Analyze a batch sharing the process-level stem memo (vocabulary
    ≪ token count; round 7: the memo now persists across batches and
    tasks instead of re-stemming the vocabulary every 10k docs)."""
    memo = _STEM_MEMO.setdefault(language, {})
    out = [analyze(t or "", language, _memo=memo) for t in texts]
    if len(memo) > _STEM_MEMO_MAX:
        memo.clear()
    return out
