"""Conversation reconstruction (the reference's abstract-section join,
/root/reference/pymedgraph/dataextraction/parser.py:79-87, re-grafted onto
transcript turns).

A conversation's text is its turns joined with ' ' in stable `turn_idx`
order regardless of shard/block arrival order.  The exchange is the
parallel range sort on `(conv_id, turn_idx)` (the O5 stable-ordering
invariant); assembly is then VECTORIZED per block — a pandas grouped join
over each sorted block — with exact repair of the ≤2 conversations that
may straddle a block edge (after a global sort a conversation's turns are
contiguous, so only each block's first and last conv_id can continue in a
neighboring block; their fragments are re-joined by min turn_idx in a tiny
grouped merge).  `turn_idx` is unique within a conversation, so the
ordering is total and the per-turn text-equality invariant (input_hint) is
exact.  One Python call per CONVERSATION (the old `groupby.map_groups`
shape, ~0.4 ms each — 60 s at 150k conversations) becomes one per BLOCK.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from . import distinct as _dx


def _block_fragments(t: pd.DataFrame) -> pd.DataFrame:
    """One fragment row per conversation present in this (sorted) block."""
    if len(t) == 0:
        return pd.DataFrame(
            {
                "conv_id": pd.array([], dtype="str"),
                "n_turns": pd.array([], dtype="int64"),
                "min_tidx": pd.array([], dtype="int64"),
                "text": pd.array([], dtype="str"),
                "__edge": pd.array([], dtype="bool"),
            }
        )
    g = t.groupby("conv_id", sort=False)
    frag = g.agg(
        n_turns=("turn_idx", "size"),
        min_tidx=("turn_idx", "min"),
        text=("text", " ".join),
    ).reset_index()
    first, last = t["conv_id"].iloc[0], t["conv_id"].iloc[-1]
    frag["n_turns"] = frag["n_turns"].astype("int64")
    frag["min_tidx"] = frag["min_tidx"].astype("int64")
    frag["__edge"] = frag["conv_id"].isin({first, last})
    return frag


def _merge_fragments(g: pd.DataFrame) -> pd.DataFrame:
    g = g.sort_values("min_tidx", kind="mergesort")
    return pd.DataFrame(
        {
            "conv_id": [g["conv_id"].iloc[0]],
            "n_turns": pd.array([int(g["n_turns"].sum())], dtype="int64"),
            "text": [" ".join(g["text"].tolist())],
        }
    )


def _block_fragments_local(t: pd.DataFrame) -> pd.DataFrame:
    """Fragment pass for CONV-LOCAL input: blocks hold whole conversations
    (a conversation can straddle only a block's stream edges), so no global
    sort is needed — each block sorts its own rows by (conv_id, turn_idx).
    Edge conversations are identified from the PRE-sort stream order.
    One guard summary row (stream-first/last conv + interior-conv KMV
    sketch, cf. distinct.check_summaries) rides an edge fragment so a
    violated layout contract is detected instead of silently splitting a
    conversation into duplicate partial rows."""
    if len(t) == 0:
        out = _block_fragments(t)
        out["__gf"] = pd.array([], dtype=object)
        out["__gl"] = pd.array([], dtype=object)
        out["__gkmv"] = pd.array([], dtype=object)
        return out
    first, last = t["conv_id"].iloc[0], t["conv_id"].iloc[-1]
    t = t.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    g = t.groupby("conv_id", sort=False)
    frag = g.agg(
        n_turns=("turn_idx", "size"),
        min_tidx=("turn_idx", "min"),
        text=("text", " ".join),
    ).reset_index()
    frag["n_turns"] = frag["n_turns"].astype("int64")
    frag["min_tidx"] = frag["min_tidx"].astype("int64")
    frag["__edge"] = frag["conv_id"].isin({first, last})
    frag["__gf"] = None
    frag["__gl"] = None
    frag["__gkmv"] = None
    sidx = int(np.flatnonzero(frag["__edge"].to_numpy())[0])
    interior = frag.loc[~frag["__edge"], "conv_id"].tolist()
    frag.iat[sidx, frag.columns.get_loc("__gf")] = str(first)
    frag.iat[sidx, frag.columns.get_loc("__gl")] = str(last)
    frag.iat[sidx, frag.columns.get_loc("__gkmv")] = _dx.guard_sketch(interior)
    return frag


def conversations(turns: rd.Dataset) -> rd.Dataset:
    """turns(conv_id, turn_idx, text, …) → conversations(conv_id, n_turns, text).

    Under the conversation-local shard contract (config.CONV_LOCAL_SHARDS)
    the full-text payload never crosses an exchange: per-block grouped
    assembly + edge-conversation repair, with per-block guard summaries
    checked so a non-clustered layout raises (and falls back) instead of
    silently emitting split conversations.  The fallback is the global
    range sort on (conv_id, turn_idx) — which ships every text byte
    through the shuffle (the price of assuming nothing about layout)."""
    from .. import config

    sel = turns.select_columns(["conv_id", "turn_idx", "text"])
    if config.CONV_LOCAL_SHARDS:
        try:
            return _conversations_local(sel)
        except _dx.ContractError as e:
            import warnings

            warnings.warn(f"{e} — falling back to the global-sort assembly")
    flagged = (
        sel.sort(["conv_id", "turn_idx"])
        .map_batches(_block_fragments, batch_format="pandas", batch_size=None)
        .materialize()  # two consumers (interior + edge repair)
    )
    return _fragment_repair(flagged)


def _conversations_local(sel: rd.Dataset) -> rd.Dataset:
    with _dx._ordered_execution():
        flagged = sel.map_batches(
            _block_fragments_local, batch_format="pandas", batch_size=None
        ).materialize()
        # guard summaries: one row per block, pulled via a cheap filter
        # over the pinned fragments (never the text payload of all edges)
        sdf = (
            flagged.map_batches(
                lambda df: df.loc[
                    df["__gf"].notna(), ["__gf", "__gl", "__gkmv"]
                ],
                batch_format="pandas",
                batch_size=None,
            )
        ).to_pandas()
    _dx.check_summaries(
        sdf["__gf"].tolist(), sdf["__gl"].tolist(), sdf["__gkmv"].tolist(),
        "conv_id", "assemble.conversations",
    )
    return _fragment_repair(flagged)


def _fragment_repair(flagged: rd.Dataset) -> rd.Dataset:
    interior = flagged.filter(expr="__edge == False").map_batches(
        lambda t: t[["conv_id", "n_turns", "text"]], batch_format="pandas"
    )
    # edge fragments are bounded by block count (≤ 2 conversations per
    # block) — merge them driver-side and append as one literal block
    # (cf. distinct._resolve_edge_repair).  At extreme block counts the
    # distributed grouped merge takes over instead of a large driver pull.
    edge_ds = flagged.filter(expr="__edge == True")
    if edge_ds.count() > 100_000:
        edges = edge_ds.groupby("conv_id").map_groups(
            _merge_fragments, batch_format="pandas"
        )
        return interior.union(edges)
    edge_rows = edge_ds.to_pandas()
    if len(edge_rows) == 0:
        return interior
    merged = (
        edge_rows.sort_values(["conv_id", "min_tidx"], kind="mergesort")
        .groupby("conv_id", sort=False)
        .agg(n_turns=("n_turns", "sum"), text=("text", " ".join))
        .reset_index()
    )
    merged["n_turns"] = merged["n_turns"].astype("int64")
    return interior.union(rd.from_pandas(merged[["conv_id", "n_turns", "text"]]))


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
    """Assembly → explode-back identity. Oracle: SELECT conv_id, turn_idx, text.

    Runs per BLOCK (pandas groupby over each block's conversations) rather
    than through a `groupby(conv_id)` exchange: the round trip is an
    identity per fragment, so the result is exact even for a conversation
    split across blocks, and the per-group overhead of a 450k-conversation
    Ray exchange (~0.4 ms each) never happens."""

    def block_fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        outs = [_roundtrip_group(g) for _, g in df.groupby("conv_id", sort=False)]
        return pd.concat(outs, ignore_index=True)

    return turns.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        block_fn, batch_format="pandas", batch_size=None
    )
