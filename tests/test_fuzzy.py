"""Fuzzy metric + correction pipeline goldens (reference:
tests/Unit/Utils/*Test.php expectations and the consensus-arbitration
examples documented at src/Search/SearchEngine.php:1764-1842)."""

import pytest

from yetisearch_spark import fuzzy
from yetisearch_spark.correction import Corrector, expand_synonyms


def test_levenshtein():
    assert fuzzy.levenshtein_distance("kitten", "sitting") == 3
    assert fuzzy.levenshtein_distance("", "abc") == 3
    assert fuzzy.levenshtein_distance("abc", "abc") == 0
    assert fuzzy.levenshtein_similarity("abcd", "abce") == 0.75
    assert fuzzy.is_within_distance("cat", "hat", 1)
    assert not fuzzy.is_within_distance("cat", "catastrophe", 2)


def test_jaro_winkler():
    assert fuzzy.jaro("abc", "abc") == 1.0
    assert fuzzy.jaro("abc", "xyz") == 0.0
    # classic textbook pair
    assert abs(fuzzy.jaro("martha", "marhta") - 0.9444444444) < 1e-9
    jw = fuzzy.jaro_winkler("martha", "marhta")
    assert abs(jw - 0.9611111111) < 1e-9
    # below-0.7 gate: no prefix bonus applied
    low = fuzzy.jaro("abcdef", "fedcba")
    assert fuzzy.jaro_winkler("abcdef", "fedcba") == low


def test_trigram():
    assert fuzzy.trigram_similarity("hello", "hello") == 1.0
    assert fuzzy.ngrams("ab", 3) == ["__a", "_ab", "ab_", "b__"]
    s = fuzzy.trigram_similarity("receive", "recieve")
    assert 0.3 < s < 1.0
    assert fuzzy.dice_coefficient("night", "nacht") > 0.0
    matches = fuzzy.find_best_matches("batman", ["batman", "badman", "cat"],
                                      threshold=0.3)
    assert matches[0][0] == "batman" and matches[0][1] == 1.0


def test_metaphone():
    assert fuzzy.metaphone("phone") == fuzzy.metaphone("fone")
    assert fuzzy.metaphone("knight")[0] == "N"
    assert fuzzy.phonetic_similarity("smith", "smyth") == 1.0
    assert fuzzy.quick_phonetic_correction("recieve") == "receive"
    assert fuzzy.quick_phonetic_correction("teh") == "the"
    assert fuzzy.is_phonetic_typo("fone", "phone")


def test_keyboard():
    assert fuzzy.key_distance("a", "s") == 1.0
    assert fuzzy.key_distance("q", "p") == 9.0
    assert fuzzy.is_keyboard_typo("cat", "cst")  # a→s slip
    assert not fuzzy.is_keyboard_typo("cat", "cpt")  # a→p far
    assert fuzzy.keyboard_proximity_score("test", "test") == 1.0
    assert fuzzy.keyboard_proximity_score("tests", "test") == 0.8  # extra char
    assert fuzzy.keyboard_proximity_score("ab", "abcd") == 0.0


VOCAB = {
    "batman": 55, "bat": 24, "man": 80, "mad": 130, "max": 161,
    "madman": 12, "scarface": 35, "scare": 35, "face": 694,
    "superman": 48, "super": 90, "men": 300, "movie": 500,
    "search": 120, "engine": 60, "robocop": 20, "robo": 1, "cop": 40,
    "computer": 77, "compute": 30,
}


@pytest.fixture
def corrector():
    return Corrector(VOCAB)


def test_correction_consensus_cases(corrector):
    # documented arbitration examples (reference SearchEngine.php:1764-1842)
    assert corrector.find_best_correction("batmen") == "batman"
    assert corrector.find_best_correction("madmax") == "mad max"
    assert corrector.find_best_correction("scareface") == "scarface"
    assert corrector.find_best_correction("supermen") == "superman"


def test_correction_existing_term_untouched(corrector):
    assert corrector.find_best_correction("batman") == "batman"
    assert corrector.find_best_correction("cat") == "cat"  # too short


def test_correction_quick_phonetic(corrector):
    assert corrector.find_best_correction("recieve") == "receive"


def test_prefix_match(corrector):
    # 'comput' is a clear prefix of 'computer'/'compute'
    got = corrector.find_best_correction("comput")
    assert got in ("computer", "compute")


def test_merge_tokens(corrector):
    assert corrector.merge_tokens(["robo", "cop"]) == ["robocop"]
    assert corrector.merge_tokens(["mad", "max"]) == ["mad", "max"]  # not indexed merged
    assert corrector.merge_tokens(["batman"]) == ["batman"]


def test_variations(corrector):
    vars_ = corrector.variations("batmen", algorithm="trigram", threshold=0.3)
    assert "batman" in vars_


def test_suggest(corrector):
    s = corrector.suggest(["batmen", "movie"])
    assert s is not None
    assert s["suggestion"] == "batman movie"
    assert 0 < s["confidence"] <= 1
    assert corrector.suggest(["batman", "movie"]) is None


def test_synonyms():
    syn = {"fast": ["quick", "rapid", "speedy", "swift"], "car": ["auto"]}
    out = expand_synonyms(["fast", "car"], syn, max_per_term=3)
    assert out["fast"] == ["quick", "rapid", "speedy"]
    assert out["car"] == ["auto"]
