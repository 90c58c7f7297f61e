"""Benchmark decontamination: flag corpus documents sharing any n-token
gram with a benchmark set.

The pretraining-hygiene pass (Brown et al. 2020 §C analog): a document is
CONTAMINATED iff any of its n-token windows appears in the benchmark's
n-gram set (token-boundary overlap — the standard decontamination
definition, and exactly SQL-expressible, unlike raw substring search).

Scale shape: the benchmark side is tiny by definition (test suites vs a
100 TB corpus), so its distinct n-grams broadcast once via ray.put; each
map task builds every document window with chained vectorized string
concatenation (the top_bigrams construction generalized to n) and probes
the broadcast set with one C-level isin — O(corpus tokens) total work,
independent of blocklist size.  A blocklist too large to broadcast would
slot into the mentions.MentionDetector automaton (same first-token
dispatch) instead.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray
import ray.data as rd

_TOKEN_RUN = re.compile(r"\S+", re.ASCII)


def _windows(toks: pd.Series, n: int):
    """All n-token windows over a Series of token lists, vectorized:
    returns (window strings Series, doc row index per window)."""
    lens = toks.str.len().to_numpy()
    reps = np.maximum(lens - (n - 1), 0)
    if not int(reps.sum()):
        return pd.Series([], dtype="object"), np.array([], dtype=np.int64)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)])
    starts = np.cumsum(np.concatenate([[0], lens[:-1]]))
    idx = np.concatenate([np.arange(s, s + r) for s, r in zip(starts, reps) if r])
    win = pd.Series(flat[idx], dtype="object")
    for j in range(1, n):
        win = win + " " + pd.Series(flat[idx + j], dtype="object")
    rows = np.repeat(np.arange(len(toks)), reps)
    return win, rows


def benchmark_ngrams(bench_docs: rd.Dataset, n: int = 8) -> set[str]:
    """Distinct n-token grams of the (small) benchmark set — driver-side by
    design; the result broadcasts."""
    grams: set[str] = set()
    for row in bench_docs.take_all():
        t = _TOKEN_RUN.findall(row["text"] or "")
        grams.update(" ".join(t[i : i + n]) for i in range(len(t) - n + 1))
    return grams


def contamination_flags(
    docs: rd.Dataset, bench_docs: rd.Dataset, n: int = 8
) -> rd.Dataset:
    """documents(doc_id, text) → (doc_id, contaminated): True iff the doc
    shares any n-token gram with `bench_docs` (benchmark members flag
    themselves — the caller excludes them if desired)."""
    gram_ref = ray.put(frozenset(benchmark_ngrams(bench_docs, n)))
    token_run = _TOKEN_RUN

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        grams = ray.get(gram_ref)
        toks = b["text"].fillna("").str.findall(token_run)
        win, rows = _windows(toks, n)
        hit = np.zeros(len(b), dtype=bool)
        if len(win):
            m = win.isin(grams).to_numpy()
            np.logical_or.at(hit, rows[m], True)
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "contaminated": pd.array(hit, dtype="bool")}
        )

    return docs.map_batches(flag, batch_format="pandas", batch_size=4096)
