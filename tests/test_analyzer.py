"""Analyzer + stemmer parity goldens, lifted from the reference unit tests
(reference: tests/Unit/Analyzers/StandardAnalyzerTest.php:18-150,
tests/Unit/Stemmer/* expectations)."""

import numpy as np
import pytest

from yetisearch_spark.analyzer import analyze, normalize, tokenize
from yetisearch_spark.stemmer import stem


STEM_GOLDENS = {
    # reference: tests/Unit/Analyzers/StandardAnalyzerTest.php:77,104-107
    "analyzer": "analyz",
    "running": "run",
    "runs": "run",
    "computers": "comput",
    "computing": "comput",
    "computed": "comput",
    "euros": "euro",
    "programming": "program",
    "example": "exampl",
    # exceptions map (reference: src/Stemmer/Languages/EnglishStemmer.php:15-35)
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    "news": "news",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
    # step guards (reference: src/Stemmer/Languages/EnglishStemmer.php:94-99)
    "us": "us",
    "is": "is",
    "this": "this",
    # assorted porter behavior
    "caresses": "caress",
    "ponies": "poni",
    "agreed": "agre",
    "plastered": "plaster",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "hopping": "hop",
    "falling": "fall",
    "hissing": "hiss",
    "happy": "happi",
    "relational": "relat",
    "conditional": "condit",
    "valency": "valenc",
    "digitizer": "digit",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "formality": "formal",
    "sensitivity": "sensit",
    "triplicate": "triplic",
    "formative": "form",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv",
    "adjustable": "adjust",
    "irritant": "irrit",
    "replacement": "replac",
    "adoption": "adopt",
    "probate": "probat",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
}


@pytest.mark.parametrize("word,expected", sorted(STEM_GOLDENS.items()))
def test_stem_goldens(word, expected):
    assert stem(word) == expected


def test_analyze_basic():
    tokens = analyze("The quick brown fox jumps over the lazy dog")
    assert "the" not in tokens
    assert "quick" in tokens and "brown" in tokens and "fox" in tokens
    assert "jump" in tokens  # stemmed
    assert "lazi" in tokens  # stemmed


def test_analyze_html():
    tokens = analyze('<p>This is <strong>bold</strong> text with <a href="#">link</a></p>')
    assert tokens == ["bold", "text", "link"]


def test_analyze_contractions():
    tokens = analyze("I'm won't can't shouldn't they're")
    assert tokens == ["cannot"]  # everything else expands to stop words
    assert "it" not in analyze("it's a test")  # it's → it is → stopwords


def test_analyze_numbers():
    tokens = analyze("The price is $99.99 or 100 euros")
    assert tokens == ["price", "99", "99", "100", "euro"]


def test_analyze_special_chars():
    tokens = analyze("email@example.com and C++ programming!")
    assert tokens == ["email", "exampl", "com", "program"]


def test_normalize_smart_quotes_and_invisibles():
    assert normalize("hello​world “quoted” it’s…") == \
        'hello world "quoted" it\'s...'


def test_tokenize_keeps_apostrophe_hyphen():
    assert tokenize("state-of-the-art re-use Grav's") == \
        ["state-of-the-art", "re-use", "grav's"]


def test_valid_token_length_bounds():
    assert analyze("a xy " + "z" * 51) == ["xy"]


def test_separator_only_tokens_dropped():
    # canonical guard: '--' survives the reference pipeline but would not
    # round-trip the FTS5 oracle tokenizer; we drop it symmetrically
    assert analyze("dash -- dash") == ["dash", "dash"]


def test_oracle_tokenizer_roundtrip():
    """Space-joined analyzer output must re-tokenize identically in the
    SQLite FTS5 oracle (term-stream identity between engine and oracle)."""
    import sqlite3

    texts = [
        "The quick brown fox; it's state-of-the-art café résumé!",
        "<b>Running</b> “tests” won't $99.99 naïve über we've",
        "hello -- world don't re-use 2024 v2.3.1 C++",
    ]
    con = sqlite3.connect(":memory:")
    con.execute("CREATE VIRTUAL TABLE t USING fts5(content, "
                "tokenize=\"unicode61 remove_diacritics 0 tokenchars '''-'\")")
    con.execute("CREATE VIRTUAL TABLE tv USING fts5vocab(t, 'instance')")
    for i, text in enumerate(texts):
        tokens = analyze(text)
        con.execute("DELETE FROM t")
        con.execute("INSERT INTO t(rowid, content) VALUES (?, ?)", (1, " ".join(tokens)))
        back = [r[0] for r in con.execute(
            "SELECT term FROM tv WHERE doc = 1 ORDER BY offset")]
        assert back == tokens, f"roundtrip mismatch for {text!r}"


def test_postings_codec_roundtrip():
    from yetisearch_spark.postings import (decode_posting_block,
                                           decode_varints,
                                           encode_posting_block,
                                           encode_varints)

    rng = np.random.default_rng(7)
    for _ in range(5):
        n = int(rng.integers(1, 129))
        v = rng.integers(0, 2 ** 62, n, dtype=np.uint64)
        assert (decode_varints(encode_varints(v)) == v).all()
    edge = np.array([0, 1, 127, 128, 16383, 16384, 2 ** 35, 2 ** 63 - 1,
                     2 ** 64 - 1], dtype=np.uint64)
    assert (decode_varints(encode_varints(edge)) == edge).all()

    ids = np.sort(rng.choice(10 ** 12, 100, replace=False)).astype(np.int64)
    tfs = rng.integers(1, 40, 100).astype(np.int64)
    dls = rng.integers(1, 3000, 100).astype(np.int64)
    poss = [np.sort(rng.choice(3000, int(t), replace=False)).astype(np.int64)
            for t in tfs]
    blk = encode_posting_block(ids, tfs, dls, poss)
    d_ids, d_tfs, d_dls, d_pos = decode_posting_block(blk, with_positions=True)
    assert (d_ids == ids).all() and (d_tfs == tfs).all() and (d_dls == dls).all()
    assert all((a == b).all() for a, b in zip(d_pos, poss))


def test_multilanguage_stemmers():
    """reference: tests/Unit/Analyzers/StandardAnalyzerTest.php:110-121"""
    fr = analyze("Les ordinateurs sont utiles", language="french")
    assert "les" not in fr            # French stop word
    assert "ordinat" in fr            # 'ordinateurs' → 'ordinat'
    de = analyze("Die Computer sind nützlich", language="german")
    assert "die" not in de            # German stop word
    assert "comput" in de             # 'computer' → 'comput'
    es = analyze("Los ordenadores son útiles", language="spanish")
    assert "los" not in es            # Spanish stop word


def test_intl_stemmer_units():
    from yetisearch_spark.stemmer_intl import (stem_french, stem_german,
                                               stem_spanish)
    assert stem_french("ordinateurs") == "ordinat"
    assert stem_french("nationale") == stem_french("nationales")
    assert stem_german("computer") == "comput"
    assert stem_german("nützlich").startswith("nutz")
    assert stem_german("straße") == stem_german("strasse")
    assert stem_spanish("rápidamente") != "rápidamente"  # suffix stripped
    assert stem_spanish("niños") == stem_spanish("niño")
