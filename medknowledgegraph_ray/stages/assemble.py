"""Conversation reconstruction (the reference's abstract-section join,
/root/reference/pymedgraph/dataextraction/parser.py:79-87, re-grafted onto
transcript turns).

A conversation's text is its turns joined with ' ' in stable `turn_idx`
order regardless of shard/block arrival order.  We do NOT global-sort the
whole corpus: `groupby('conv_id')` hash-shuffles each conversation to one
group and the (cheap, bounded) sort by `turn_idx` happens inside the group —
at 10^12-turn scale this is one key-partitioned exchange instead of a global
range sort.  `turn_idx` is unique within a conversation, so the ordering is
total and the per-turn text-equality invariant (input_hint) is exact.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def _assemble_group(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("turn_idx", kind="mergesort")
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "n_turns": pd.array([len(g)], dtype="int64"),
            "text": [" ".join(g["text"].tolist())],
        }
    )


def conversations(turns: rd.Dataset) -> rd.Dataset:
    """turns(conv_id, turn_idx, text, …) → conversations(conv_id, n_turns, text)."""
    return turns.select_columns(["conv_id", "turn_idx", "text"]).groupby("conv_id").map_groups(
        _assemble_group, batch_format="pandas"
    )


def _roundtrip_group(g: pd.DataFrame) -> pd.DataFrame:
    # assemble … then explode straight back to per-turn rows: the output must
    # equal the input rows exactly (per-turn text equality under stable
    # (conv_id, turn_idx) ordering).
    g = g.sort_values("turn_idx", kind="mergesort")
    joined = " ".join(g["text"].tolist())
    lengths = g["text"].str.len().tolist()
    out_texts, pos = [], 0
    for ln in lengths:
        out_texts.append(joined[pos : pos + ln])
        pos += ln + 1  # skip the ' ' separator
    return pd.DataFrame(
        {"conv_id": g["conv_id"].values, "turn_idx": g["turn_idx"].values, "text": out_texts}
    )


def turn_roundtrip(turns: rd.Dataset) -> rd.Dataset:
    """Assembly → explode-back identity. Oracle: SELECT conv_id, turn_idx, text."""
    return turns.select_columns(["conv_id", "turn_idx", "text"]).groupby("conv_id").map_groups(
        _roundtrip_group, batch_format="pandas"
    )
