"""Query-time fuzzy correction / rewrite (Z6-Z10) over the broadcast
vocabulary.

Ports the reference's correction decision tree faithfully
(reference: src/Search/SearchEngine.php:1539-2091):

  quick phonetic map → exists-in-index short-circuit → prefix match →
  quick fuzzy (edit≤1 + trigram≥0.4) vs compound split arbitration →
  5-algorithm consensus (trigram .25 / levenshtein .20 / jaro-winkler
  .25 / phonetic .15 / keyboard .15, ≥2 algorithms, 1.1 agreement
  bonus) × frequency weight (cap 3.0) → validation gates.

The vocabulary is the term_stats table (term → df), capped at
max_indexed_terms by frequency — the same artifact the reference pulls
from fts5vocab (src/Storage/SqliteStorage.php:2420-2458). At query time
it is a driver-side dict; at 10^12-doc scale it is still only the
vocabulary (≪ corpus) and loads once per engine instance.
"""

from __future__ import annotations

import math
from typing import Optional

from . import fuzzy


class Corrector:
    def __init__(self, vocab: dict[str, int], *,
                 correction_threshold: float = 0.6,
                 enable_prefix_matching: bool = True,
                 enable_compound_word_split: bool = True):
        # vocab: term -> frequency (df). Terms from our analyzer are already
        # lowercase, matching the reference's strtolower comparisons.
        self.vocab = vocab
        self.correction_threshold = correction_threshold
        self.enable_prefix_matching = enable_prefix_matching
        self.enable_compound_word_split = enable_compound_word_split

    # -- Z7: the main correction entry --------------------------------------

    def find_best_correction(self, term: str) -> str:
        if len(term) <= 3:
            return term
        quick = fuzzy.quick_phonetic_correction(term)
        if quick is not None:
            return quick

        term_freq = self.vocab.get(term.lower(), 0)
        if term_freq > 0:
            return term  # valid indexed term — never "correct" it

        if self.enable_prefix_matching and len(term) >= 4:
            pm = self._best_prefix_match(term)
            if pm is not None:
                return pm

        qf = self._quick_fuzzy_match(term)
        cs = self._compound_split(term) if self.enable_compound_word_split else None

        if qf is not None and cs is not None:
            fuzzy_term, fuzzy_sim = qf["term"], qf["similarity"]
            fuzzy_freq = self.vocab.get(fuzzy_term.lower(), 0)
            parts = cs.split(" ")
            part_freqs = [self.vocab.get(p, 0) for p in parts]
            min_pf, max_pf = min(part_freqs), max(part_freqs)
            balanced = (min_pf / max_pf) >= 0.15 if max_pf > 0 else False
            high_sim_sub = len(term) == len(fuzzy_term) and fuzzy_sim >= 0.5
            if fuzzy_freq > min_pf:
                return fuzzy_term
            if high_sim_sub and fuzzy_freq > 0:
                return fuzzy_term
            if not balanced and fuzzy_freq > 0:
                return fuzzy_term
            return cs
        if qf is not None:
            return qf["term"]
        if cs is not None:
            return cs

        # consensus scoring over the whole vocabulary
        candidates = []
        tl = term.lower()
        for vterm, freq in self.vocab.items():
            if vterm == tl:
                continue
            if abs(len(term) - len(vterm)) > 2:
                continue
            scores = {
                "trigram": fuzzy.trigram_similarity(term, vterm),
                "levenshtein": 1 - fuzzy.levenshtein_distance(term, vterm)
                / max(len(term), len(vterm)),
                "jaro_winkler": fuzzy.jaro_winkler(term, vterm),
                "phonetic": fuzzy.phonetic_similarity(term, vterm),
                "keyboard": fuzzy.keyboard_proximity_score(term, vterm),
            }
            consensus = self._consensus(scores)
            if consensus <= 0:
                continue
            final = consensus * self._freq_weight(freq, term_freq)
            if consensus >= self.correction_threshold * 0.7:
                candidates.append({"term": vterm, "frequency": freq,
                                   "scores": scores,
                                   "consensus_score": consensus,
                                   "final_score": final})
        candidates.sort(key=lambda c: (-c["consensus_score"], -c["final_score"]))
        for cand in candidates[:10]:
            if self._validate(term, cand, term_freq):
                return cand["term"]
        return term

    # -- sub-strategies -------------------------------------------------------

    def _best_prefix_match(self, term: str) -> Optional[str]:
        tl = term.lower()
        tlen = len(tl)
        if tlen < 4 or tlen > 10:
            return None
        matches = []
        for vterm, freq in self.vocab.items():
            vlen = len(vterm)
            if vlen > tlen and vterm.startswith(tl):
                extra = vlen - tlen
                if extra <= 5:
                    matches.append({"term": vterm, "frequency": freq,
                                    "extra_len": extra})
        if not matches:
            return None

        def score(m):
            return m["frequency"] / (1.0 + m["extra_len"] * 0.5)

        def cmp_key(m):
            return m  # placeholder

        # reference sort: prefer higher freq/extension score; if within 30%,
        # prefer the shorter extension
        import functools

        def compare(a, b):
            sa, sb = score(a), score(b)
            if abs(sa - sb) < max(sa, sb) * 0.3:
                return a["extra_len"] - b["extra_len"]
            return -1 if sa > sb else (1 if sb > sa else 0)

        matches.sort(key=functools.cmp_to_key(compare))
        return matches[0]["term"]

    def _quick_fuzzy_match(self, term: str) -> Optional[dict]:
        tl = term.lower()
        tlen = len(tl)
        best, best_score, best_sim = None, 0.0, 0.0
        for vterm, freq in self.vocab.items():
            if abs(len(vterm) - tlen) > 1:
                continue
            if fuzzy.levenshtein_distance(tl, vterm) > 1:
                continue
            sim = fuzzy.trigram_similarity(tl, vterm)
            if sim >= 0.4:
                s = sim * (1 + math.log(1 + freq) / 10)
                if s > best_score:
                    best, best_score, best_sim = vterm, s, sim
        if best is None:
            return None
        return {"term": best, "similarity": best_sim, "score": best_score}

    def _compound_split(self, term: str) -> Optional[str]:
        tl = term.lower()
        tlen = len(tl)
        if tlen < 6 or tlen > 20:
            return None
        best, best_score = None, 0.0
        for i in range(3, tlen - 2):
            p1, p2 = tl[:i], tl[i:]
            f1, f2 = self.vocab.get(p1, 0), self.vocab.get(p2, 0)
            if f1 < 5 or f2 < 5:
                continue
            s = math.log(f1 + 1) + math.log(f2 + 1)
            if s > best_score:
                best_score, best = s, f"{p1} {p2}"
        return best

    # -- consensus machinery ---------------------------------------------------

    _WEIGHTS = {"trigram": 0.25, "levenshtein": 0.20, "jaro_winkler": 0.25,
                "phonetic": 0.15, "keyboard": 0.15}

    def _consensus(self, scores: dict[str, float]) -> float:
        weighted = total_w = 0.0
        valid = 0
        for algo, s in scores.items():
            if s is None or s <= 0:
                continue
            w = self._WEIGHTS.get(algo)
            if w:
                weighted += s * w
                total_w += w
                valid += 1
        if valid < 2 or total_w <= 0:
            return 0.0
        consensus = weighted / total_w
        if sum(1 for s in scores.values() if s and s >= 0.8) >= 2:
            consensus *= 1.1
        return min(1.0, max(0.0, consensus))

    @staticmethod
    def _freq_weight(candidate_freq: int, original_freq: int) -> float:
        w = 1.0 + math.log(1 + candidate_freq) / 5.0
        if original_freq > 0 and candidate_freq > original_freq * 3:
            w *= 1.5
        return min(w, 3.0)

    def _validate(self, original: str, cand: dict, original_freq: int) -> bool:
        consensus = self._consensus(cand["scores"])
        if consensus < 0.65:
            return False
        if original_freq == 0:
            return cand["final_score"] >= 0.7
        if original_freq < 3:
            return (cand["final_score"] >= 0.8
                    and cand["frequency"] > original_freq * 2)
        return (cand["final_score"] >= 0.9
                and cand["frequency"] > original_freq * 5)

    # -- Z8: adjacent-token merge ---------------------------------------------

    def merge_tokens(self, tokens: list[str]) -> list[str]:
        """'robo cop' → 'robocop' when the merged form is indexed
        (reference: src/Search/SearchEngine.php:1539-1592)."""
        if len(tokens) < 2:
            return list(tokens)
        out = []
        i = 0
        while i < len(tokens):
            if i < len(tokens) - 1:
                merged = tokens[i].lower() + tokens[i + 1].lower()
                if merged in self.vocab:
                    out.append(merged)
                    i += 2
                    continue
            out.append(tokens[i])
            i += 1
        return out

    # -- Z6: fuzzy variation generation (expansion mode) ------------------------

    def variations(self, term: str, *, algorithm: str = "trigram",
                   max_variations: int = 15, threshold: float = 0.5) -> list[str]:
        """Indexed terms similar to `term`, for OR-expansion
        (reference: src/Search/SearchEngine.php:1316-1533 — same
        prefilters: length window, shared first-or-last char)."""
        tl = term.lower()
        tlen = len(tl)
        out = []
        for vterm, freq in self.vocab.items():
            if vterm == tl:
                continue
            if abs(len(vterm) - tlen) > 2:
                continue
            # cheap prefilter: share first or last character
            if vterm[0] != tl[0] and vterm[-1] != tl[-1]:
                continue
            if algorithm == "trigram":
                sim = fuzzy.trigram_similarity(tl, vterm)
            elif algorithm == "jaro_winkler":
                sim = fuzzy.jaro_winkler(tl, vterm)
            elif algorithm == "levenshtein":
                n = 1 if tlen <= 5 else 2
                sim = 1.0 if fuzzy.is_within_distance(tl, vterm, n) else 0.0
            else:
                sim = fuzzy.trigram_similarity(tl, vterm)
            if sim >= threshold:
                out.append((vterm, sim, freq))
        out.sort(key=lambda t: (-t[1], -t[2]))
        return [t[0] for t in out[:max_variations]]

    # -- Z10: "did you mean" ----------------------------------------------------

    def suggest(self, query_tokens: list[str]) -> Optional[dict]:
        """Suggestion with confidence when any token corrects
        (reference: src/Search/SearchEngine.php:2215-2373, simplified to
        the correction backbone + confidence by similarity)."""
        corrected = []
        changed = False
        confidences = []
        for tok in query_tokens:
            c = self.find_best_correction(tok)
            corrected.append(c)
            if c.lower() != tok.lower():
                changed = True
                confidences.append(fuzzy.trigram_similarity(tok, c))
        if not changed:
            return None
        return {"suggestion": " ".join(corrected),
                "confidence": round(sum(confidences) / len(confidences), 3)}


# -- Z9: synonym expansion ------------------------------------------------------

def load_synonyms(source) -> dict:
    """Synonym map from a dict OR a JSON file path (the reference accepts
    both, src/Search/SearchEngine.php:2159-2173)."""
    import json
    import os
    if isinstance(source, str) and os.path.exists(source):
        with open(source) as f:
            decoded = json.load(f)
        return decoded if isinstance(decoded, dict) else {}
    return source if isinstance(source, dict) else {}


def resolve_synonym_map(synonyms, language: str | None = None) -> dict:
    """Per-language sub-maps: {'en': {...}, 'fr': {...}} selects by query
    language; a flat map applies to every language
    (reference: src/Search/SearchEngine.php:2176-2179)."""
    m = load_synonyms(synonyms)
    if language and isinstance(m.get(language), dict):
        return m[language]
    return m


def expand_synonyms(tokens: list[str], synonyms,
                    max_per_term: int = 3, total_cap: int = 10,
                    language: str | None = None,
                    case_sensitive: bool = False) -> dict[str, list[str]]:
    """term → synonym list (capped), mirroring the reference's expansion
    (src/Search/SearchEngine.php:2157-2213): per-language sub-map or flat
    map, optional file source, per-term + total caps. Multi-word synonyms
    are returned as-is; the query compiler turns them into phrases."""
    smap = resolve_synonym_map(synonyms, language)
    out: dict[str, list[str]] = {}
    budget = total_cap
    for tok in tokens:
        key = tok if case_sensitive else tok.lower()
        alts = smap.get(key, [])
        if not isinstance(alts, list):
            continue
        alts = alts[:max_per_term][:max(0, budget)]
        if alts:
            out[tok] = alts
            budget -= len(alts)
        if budget <= 0:
            break
    return out
