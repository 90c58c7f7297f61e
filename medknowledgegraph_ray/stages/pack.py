"""Sequence packing: assign the corpus's token stream to fixed-budget
training chunks.

The export shape an LLM pretraining pipeline needs after filtering/dedup:
concatenate every document's tokens in a deterministic global order
(doc_id) and cut the stream every `budget` tokens; a document that
straddles a cut contributes a row per chunk it touches, with its in-doc
token span.  A downstream loader can then build chunk i from exactly the
(doc_id, tok_start, tok_end) rows with chunk_id = i, in doc_id order —
no full-corpus pass, no driver-side token stream.

Scale shape (the stages/shuffle.py exact-position pattern):
- ONE global sort on doc_id (token counts ride along, one row per doc);
- per-block token totals → a driver pass over O(blocks) summaries
  computes each block's global token offset (never row data);
- a second map pass cumsums locally, adds the block offset, and expands
  each doc into its chunk spans with vectorized numpy repeat.

Everything is integer arithmetic, so the DuckDB oracle (window SUM +
generate_series unnest) matches bit-exactly.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _sort_blocks() -> int:
    from .. import config

    return config.sort_blocks()

_TOKEN_RUN = re.compile(r"\S+", re.ASCII)


def sequence_pack(docs: rd.Dataset, budget: int = 512) -> rd.Dataset:
    """documents(doc_id, text) → (doc_id, chunk_id, tok_start, tok_end):
    one row per (doc, chunk) overlap under greedy stream packing; spans
    are 0-based, end-exclusive, in whitespace tokens."""

    def count_tokens(b: pd.DataFrame) -> pd.DataFrame:
        n = b["text"].fillna("").str.count(_TOKEN_RUN).astype("int64")
        out = pd.DataFrame({"doc_id": b["doc_id"].astype("int64"), "n_tok": n})
        return out[out["n_tok"] > 0]

    s = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(count_tokens, batch_format="pandas", batch_size=None)
        .repartition(_sort_blocks())
        .sort("doc_id")
        .materialize()
    )

    # pass 1: O(blocks) summaries — (first doc_id, block token total)
    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {"first_doc": pd.array([], dtype="int64"),
                 "tok_total": pd.array([], dtype="int64")}
            )
        return pd.DataFrame(
            {
                "first_doc": pd.array([int(b["doc_id"].iloc[0])], dtype="int64"),
                "tok_total": pd.array([int(b["n_tok"].sum())], dtype="int64"),
            }
        )

    summaries = s.map_batches(
        summarize, batch_format="pandas", batch_size=None
    ).to_pandas()
    order = summaries.sort_values("first_doc", kind="mergesort")
    bases = np.concatenate([[0], np.cumsum(order["tok_total"].to_numpy())[:-1]])
    offsets = dict(zip(order["first_doc"].astype(int), bases.astype(int)))
    off_ref = ray.put(offsets)

    # pass 2: local cumsum + block base, then vectorized chunk expansion
    def expand(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.array([], dtype="int64"),
                "chunk_id": pd.array([], dtype="int64"),
                "tok_start": pd.array([], dtype="int64"),
                "tok_end": pd.array([], dtype="int64"),
            }
        )
        if len(b) == 0:
            return empty
        base = ray.get(off_ref)[int(b["doc_id"].iloc[0])]
        n = b["n_tok"].to_numpy()
        start = base + np.cumsum(n) - n  # each doc's global token offset
        c_first = start // budget
        c_last = (start + n - 1) // budget
        reps = (c_last - c_first + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(b)), reps)
        offs = (
            np.concatenate([np.arange(r) for r in reps])
            if len(reps)
            else np.array([], dtype=np.int64)
        )
        chunk = c_first[idx] + offs
        tok_start = np.maximum(0, chunk * budget - start[idx])
        tok_end = np.minimum(n[idx], (chunk + 1) * budget - start[idx])
        return pd.DataFrame(
            {
                "doc_id": pd.array(b["doc_id"].to_numpy()[idx], dtype="int64"),
                "chunk_id": pd.array(chunk, dtype="int64"),
                "tok_start": pd.array(tok_start, dtype="int64"),
                "tok_end": pd.array(tok_end, dtype="int64"),
            }
        )

    return s.map_batches(expand, batch_format="pandas", batch_size=None)
