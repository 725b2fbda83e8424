"""Deterministic synthetic transcript corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
    (conv_id:string, turn_idx:int32, role:string, text:string,
     tool:string, ts:timestamp)

Generation is seeded numpy (no external data) and exercises every
analyzer branch: Zipf vocabulary, contractions, HTML fragments, smart
quotes, UTF-8 accents, numbers, multi-space runs. The same bytes feed
both the Spark build and the SQLite FTS5 oracle (per-row invariant:
per-turn text equality under stable turn ordering).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_P = np.array([0.40, 0.40, 0.05, 0.15])
TOOLS = np.array(["bash", "search", "browser", "editor", "python"])

# ~600-word base vocabulary: common English + domain words + analyzer-branch
# exercisers. Zipf-ranked draws make head terms genuinely heavy (skew path).
_BASE_WORDS = """
the be to of and a in that have it for not on with he as you do at this but
his by from they we say her she or an will my one all would there their what
so up out if about who get which go me when make can like time just him know
take people into year your good some could them see other than then now look
only come its over think also back after use two how our work first well way
even new want because any these give day most us search query index token
term document turn conversation agent transcript result score rank match
filter build merge partition shuffle spark cluster executor memory disk file
parquet table column row batch stream data value key hash sort join group
count limit offset page cache write read run test check error fail pass fix
bug code line function class method module import return print loop list
dict string number float call start stop open close send receive request
response server client user system message text word language english
model train learn deep neural network vector embed weight layer input output
compute process thread task job stage plan optimize compress encode decode
block segment posting inverted engine analyze stem normalize tokenize
running jumped quickly slowly beautiful organization national international
connection information development government education experience
technology communication understanding relationship environment performance
apple banana coffee mountain river ocean forest city village road bridge
house garden window door table chair light dark color sound music picture
story letter paper book library school student teacher doctor hospital
market store money price order ship plane train station travel journey
morning evening night summer winter spring autumn weather rain snow wind sun
moon star cloud fire water earth stone metal glass wood plastic cotton
received believe achieve separate definitely occurred necessary beginning
""".split()

_ACCENT_WORDS = ["café", "naïve", "résumé", "cliché", "señor", "jalapeño",
                 "über", "fiancée", "crème"]
_CONTRACTION_SNIPPETS = ["it's", "can't", "won't", "they're", "we've",
                         "I'll", "he'd", "I'm", "doesn't", "that's"]
_HTML_SNIPPETS = ["<p>", "</p>", "<strong>bold</strong>", "<em>note</em>",
                  '<a href="http://example.com">link</a>', "<br/>"]
_SMART_SNIPPETS = ["“quoted”", "‘single’",
                   "wait…", " padded "]


def _zipf_ranks(rng: np.random.Generator, n: int, vocab: int, alpha: float = 1.1) -> np.ndarray:
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    probs = ranks ** (-alpha)
    probs /= probs.sum()
    return rng.choice(vocab, size=n, p=probs)


def generate_transcripts(n_turns: int, seed: int = 42) -> pd.DataFrame:
    """Generate ~n_turns transcript rows (exact count returned)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_BASE_WORDS)

    # conversations: lengths ~ LogNormal(2.3, 0.8) clamped [1, 200]
    n_convs = max(1, int(n_turns / 11))
    lens = np.clip(np.round(np.exp(rng.normal(2.3, 0.8, n_convs))), 1, 200).astype(np.int64)
    while lens.sum() < n_turns:
        extra = np.clip(np.round(np.exp(rng.normal(2.3, 0.8, 1024))), 1, 200).astype(np.int64)
        lens = np.concatenate((lens, extra))
        n_convs = lens.size
    # trim to exactly n_turns
    cum = np.cumsum(lens)
    last = int(np.searchsorted(cum, n_turns))
    lens = lens[:last + 1].copy()
    lens[-1] -= int(cum[last] - n_turns)
    if lens[-1] == 0:
        lens = lens[:-1]
    n_convs = lens.size

    conv_ids = np.repeat(np.array([f"conv_{i:08d}" for i in range(n_convs)]), lens)
    turn_idx = np.concatenate([np.arange(l, dtype=np.int32) for l in lens])
    n = conv_ids.size

    roles = rng.choice(ROLES, size=n, p=ROLE_P)
    tool_mask = rng.random(n) < 0.30
    tools = np.where(tool_mask, rng.choice(TOOLS, size=n), None)

    # timestamps: per conversation monotone
    base = np.datetime64("2025-01-01T00:00:00")
    conv_start = rng.integers(0, 180 * 24 * 3600, n_convs)
    deltas = rng.integers(1, 600, n)
    starts = np.repeat(conv_start, lens)
    # cumulative within conversation
    grp_first = np.concatenate(([0], np.cumsum(lens)[:-1]))
    csum = np.cumsum(deltas)
    csum_offsets = np.repeat(csum[grp_first] - deltas[grp_first], lens)
    ts = base + (starts + csum - csum_offsets).astype("timedelta64[s]")

    # text: word counts ~ LogNormal, 3..300 words
    word_counts = np.clip(np.round(np.exp(rng.normal(3.0, 0.7, n))), 3, 300).astype(np.int64)
    total_words = int(word_counts.sum())
    word_idx = _zipf_ranks(rng, total_words, vocab.size)
    words = vocab[word_idx]

    # sprinkle analyzer-branch exercisers (~3% of word slots)
    special_mask = rng.random(total_words) < 0.03
    special_pool = np.array(_ACCENT_WORDS + _CONTRACTION_SNIPPETS
                            + _HTML_SNIPPETS + _SMART_SNIPPETS
                            + ["$99.99", "2024", "v2.3.1", "C++", "re-use",
                               "state-of-the-art", "100", "3.14"])
    words = words.copy()
    words[special_mask] = rng.choice(special_pool, size=int(special_mask.sum()))

    bounds = np.concatenate(([0], np.cumsum(word_counts)))
    texts = [" ".join(words[bounds[i]:bounds[i + 1]]) for i in range(n)]

    return pd.DataFrame({
        "conv_id": conv_ids,
        "turn_idx": turn_idx,
        "role": roles,
        "text": texts,
        "tool": tools,
        "ts": pd.Series(ts),
    })


def _write_part(args) -> int:
    path, part, chunk, seed = args
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = generate_transcripts(chunk, seed=seed + part)
    # keep conv_ids globally unique across files
    pdf["conv_id"] = pdf["conv_id"].str.replace(
        "conv_", f"conv{part:03d}_", regex=False)
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    pq.write_table(table, os.path.join(path, f"part-{part:05d}.parquet"),
                   row_group_size=25_000)
    return len(pdf)


def write_corpus_parquet(path: str, n_turns: int, seed: int = 42,
                         rows_per_file: int = 250_000,
                         workers: int | None = None) -> int:
    """Write the corpus as parquet files (parts generated in parallel)."""
    import multiprocessing as mp
    import os

    os.makedirs(path, exist_ok=True)
    jobs = []
    written = 0
    part = 0
    while written < n_turns:
        chunk = min(rows_per_file, n_turns - written)
        jobs.append((path, part, chunk, seed))
        written += chunk
        part += 1
    workers = workers or min(len(jobs), os.cpu_count() or 4)
    if workers <= 1:
        return sum(_write_part(j) for j in jobs)
    with mp.Pool(workers) as pool:
        return sum(pool.map(_write_part, jobs))
