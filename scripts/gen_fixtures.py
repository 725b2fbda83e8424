#!/usr/bin/env python
"""Materialize the rank-identity fixture suite (FIXTURES.md §2).

Generates the deterministic transcript corpus, feeds the analyzed token
stream to the SQLite FTS5 oracle, and writes fixtures/queries.json with
~60 cases across every query kind, each carrying the oracle's
expected_top10 (doc_id, score). tests/test_fixture_suite.py replays the
suite against the Spark engine.
"""

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yetisearch_spark.analyzer import analyze, analyze_batch  # noqa: E402
from yetisearch_spark.corpus import generate_transcripts      # noqa: E402
from yetisearch_spark.oracle import Fts5Oracle                # noqa: E402

N_TURNS = 1500
SEED = 42


def fixed_point(t: str) -> bool:
    return analyze(t) == [t]


def main() -> None:
    pdf = generate_transcripts(N_TURNS, seed=SEED)
    pdf = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    token_lists = analyze_batch(pdf["text"].tolist())

    oracle = Fts5Oracle()
    oracle.add_documents(zip(range(len(pdf)), token_lists))

    vocab = sorted(oracle.vocab(), key=lambda r: -r[1])
    fixed = [(t, df) for t, df, _ in vocab if fixed_point(t)]
    head = [t for t, _ in fixed[:10]]
    mid = [t for t, _ in fixed[len(fixed) // 3: len(fixed) // 3 + 10]]
    tail = [t for t, _ in fixed[-10:]]

    pairs = Counter()
    for toks in token_lists[:400]:
        for a, b in zip(toks, toks[1:]):
            if fixed_point(a) and fixed_point(b):
                pairs[(a, b)] += 1
    phrase_pairs = [p for p, _ in pairs.most_common(8)]

    prefixes = [p for p, c in Counter(
        t[:3] for t, _ in fixed if len(t) >= 4).most_common(6)]

    cases = []

    def add(kind, query, match, options=None):
        cases.append({
            "query_id": f"q{len(cases) + 1:03d}",
            "kind": kind,
            "query": query,
            "options": options or {"limit": 10},
            "expected_top10": [
                {"doc_id": d, "score": s}
                for d, s in oracle.top_k(match, k=10)],
        })

    for t in head[:4] + mid[:3] + tail[:3]:
        add("single", f'"{t}"', Fts5Oracle.match_string("single", [t]))
    for a, b in [(head[0], head[1]), (head[0], mid[0]), (mid[0], mid[1]),
                 (head[2], mid[2]), (mid[3], tail[0]),
                 (head[0], head[1])]:
        add("and", f'"{a}" AND "{b}"', Fts5Oracle.match_string("and", [a, b]))
    add("and", f'"{head[0]}" AND "{head[1]}" AND "{mid[0]}"',
        Fts5Oracle.match_string("and", [head[0], head[1], mid[0]]))
    for a, b in [(mid[0], mid[1]), (mid[2], tail[1]), (head[0], tail[2]),
                 (mid[4], mid[5])]:
        add("or", f'"{a}" OR "{b}"', Fts5Oracle.match_string("or", [a, b]))
    add("or", f'"{mid[0]}" OR "{mid[1]}" OR "{tail[3]}"',
        Fts5Oracle.match_string("or", [mid[0], mid[1], tail[3]]))
    for a, b in phrase_pairs[:6]:
        add("phrase", f'"{a} {b}"', Fts5Oracle.match_string("phrase", [a, b]))
    for (a, b), n in [((head[0], head[1]), 10), ((head[0], mid[0]), 10),
                      ((mid[0], mid[1]), 5), ((head[2], head[3]), 3),
                      ((head[0], head[1]), 0), ((head[1], mid[1]), 7)]:
        add("near", f'NEAR("{a}" "{b}", {n})',
            Fts5Oracle.match_string("near", [a, b], near=n), {"limit": 10, "near": n})
    for p in prefixes[:6]:
        add("prefix", f"{p}*", Fts5Oracle.match_string("prefix", [p]))
    # composite fuzzy shape (reference SearchEngine.php:599-614)
    a, b = head[0], mid[0]
    add("composite",
        f'("{a} {b}" OR NEAR("{a}" "{b}", 10) OR "{a}" OR "{b}")',
        f'("{a} {b}" OR NEAR("{a}" "{b}", 10) OR "{a}" OR "{b}")')

    out = {
        "corpus": {"generator": "yetisearch_spark.corpus.generate_transcripts",
                   "n_turns": N_TURNS, "seed": SEED,
                   "order": "conv_id, turn_idx", "doc_id": "dense rank"},
        "oracle": "sqlite3 FTS5, bm25(), unicode61 remove_diacritics 0 "
                  "tokenchars \"'-\", fed the analyzed token stream",
        "cases": cases,
    }
    os.makedirs("fixtures", exist_ok=True)
    with open("fixtures/queries.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote fixtures/queries.json with {len(cases)} cases")


if __name__ == "__main__":
    main()
