"""Abbreviation detection + resolution — the scispaCy
`abbreviation_detector` / `resolve_abbreviations=True` analog
(/root/reference/pymedgraph/dataextraction/entityrecognition.py:25-27).

A conversation can define a local short form — "xelorvan syndrome (xsq3)"
— and then use `xsq3` alone; without resolution those mentions are lost
(the SF is not in the global alias KB).  Semantics (shared verbatim with
the DuckDB oracle):

- a DEFINITION is any fragment matching
  `(?:[a-z]+ ){1,MAX_LF_WORDS}\\([a-z0-9]+\\)` in the lowercased text;
  the long form is the LARGEST suffix of 1..MAX_LF_WORDS (8) words
  preceding the parenthesis whose word initials equal the short form's
  prefix of the same length (Schwartz-Hearst right-to-left initial
  matching, deterministic — handles "severe relapsing acquired chronic
  pulmonary fibrosis (sracpf)" as well as one-word forms; the reference's
  detector is length-unbounded, entityrecognition.py:25-27 — 8 words
  covers every KB alias shape with a bounded SQL ladder);
- a definition is VALID iff the long form IS a KB alias and the short form
  is NOT (if it were, plain detection already finds it);
- a RESOLVED mention is any turn in the defining conversation whose text
  matches `\\b<sf>\\b`; it emits the LONG form as its norm_surface (the
  reference replaces the span text with the long form before linking), so
  downstream linking/selection work unchanged.

Scale shape: definitions are extracted with one vectorized `str.findall`
pass; resolution is exchange-free under the conversation-local shard
contract (block pass + edge repair), and otherwise co-locates each
DEFINING conversation's turns with one parallel (conv_id, turn_idx) sort
followed by the same vectorized block pass — never a per-group Python
reduce.  Only the KB alias set is broadcast (vocabulary-bounded, the
established KB pattern).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from . import distinct as _dx
from .distinct import distinct as _distinct

MAX_LF_WORDS = 8  # ladder cap, shared with the DuckDB oracle CASE ladder

_DEF_FRAG = re.compile(rf"(?:[a-z]+ ){{1,{MAX_LF_WORDS}}}\([a-z0-9]+\)")
_SF = re.compile(r"\(([a-z0-9]+)\)")


def _parse_frag(frag: str) -> tuple[str, str] | None:
    """(sf, lf) for a definition fragment, or None if no suffix matches.

    lf = the largest m-word suffix (m in MAX_LF_WORDS..1) of the words
    preceding the parenthesis whose initials equal sf[:m] — byte-identical
    to the CASE ladder in the DuckDB oracle
    (__ray_entry__._abbrev_defs_subquery)."""
    sf = _SF.search(frag).group(1)
    ws = frag[: frag.index("(")].split()
    for m in range(MAX_LF_WORDS, 0, -1):
        if len(ws) >= m and "".join(w[0] for w in ws[-m:]) == sf[:m]:
            return sf, " ".join(ws[-m:])
    return None


def definitions(turns: rd.Dataset) -> rd.Dataset:
    """Distinct (conv_id, sf, lf) definition pairs found in any turn."""

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        low = batch["text"].fillna("").str.lower()
        frags = low.str.findall(_DEF_FRAG)
        n_per = frags.map(len).to_numpy()
        if n_per.sum() == 0:
            return pd.DataFrame({
                "conv_id": pd.array([], dtype="str"),
                "sf": pd.array([], dtype="str"),
                "lf": pd.array([], dtype="str"),
            })
        conv = np.repeat(batch["conv_id"].to_numpy(), n_per)
        parsed = [_parse_frag(f) for fs in frags for f in fs]
        keep = np.array([p is not None for p in parsed], dtype=bool)
        sf = np.array([p[0] if p else "" for p in parsed], dtype=object)
        lf = np.array([p[1] if p else "" for p in parsed], dtype=object)
        return pd.DataFrame({"conv_id": conv[keep], "sf": sf[keep], "lf": lf[keep]})

    raw = turns.map_batches(extract, batch_format="pandas")
    return _distinct(raw, ["conv_id", "sf", "lf"])


def _resolve_frame(df: pd.DataFrame, alias_label: dict) -> pd.DataFrame:
    """Resolve SF usages within a frame that contains WHOLE conversations:
    extract definitions (vectorized), validate against the KB catalog, and
    emit (conv_id, turn_idx, norm_surface=<lf>, label) rows.  Distinct
    within the frame."""
    empty = pd.DataFrame({
        "conv_id": pd.array([], dtype="str"),
        "turn_idx": pd.array([], dtype="int32"),
        "norm_surface": pd.array([], dtype="str"),
        "label": pd.array([], dtype="str"),
    })
    if len(df) == 0:
        return empty
    low = df["text"].fillna("").str.lower()
    frags = low.str.findall(_DEF_FRAG)
    n_per = frags.map(len).to_numpy()
    if n_per.sum() == 0:
        return empty
    conv_np = df["conv_id"].to_numpy()
    defs: set[tuple[str, str, str]] = set()
    for conv, fs in zip(np.repeat(conv_np, n_per), (f for fs in frags for f in fs)):
        parsed = _parse_frag(fs)
        if parsed is None:
            continue
        sf, lf = parsed
        if lf in alias_label and sf not in alias_label:
            defs.add((conv, sf, lf))
    if not defs:
        return empty
    tidx_np = df["turn_idx"].to_numpy()
    outs = []
    for conv, sf, lf in sorted(defs):
        in_conv = conv_np == conv
        pat = re.compile(r"\b" + re.escape(sf) + r"\b")
        hit = low[in_conv].str.contains(pat, regex=True).to_numpy()
        if hit.any():
            outs.append(pd.DataFrame({
                "conv_id": conv_np[in_conv][hit],
                "turn_idx": tidx_np[in_conv][hit],
                "norm_surface": np.repeat(lf, int(hit.sum())),
                "label": np.repeat(alias_label[lf], int(hit.sum())),
            }))
    if not outs:
        return empty
    out = pd.concat(outs, ignore_index=True)
    return out.drop_duplicates(ignore_index=True)


def resolved_mentions_local(turns: rd.Dataset, vocab: pa.Table) -> rd.Dataset:
    """Exchange-free abbreviation resolution under the conversation-local
    shard contract: a conversation's definitions and usages share a block,
    so resolution is one block pass; the ≤2 edge conversations per block
    (whose fragments may split across adjacent blocks) are gathered once
    and resolved driver-side — the same interior/edge-repair shape as
    distinct.group_local_distinct."""
    alias_label = dict(zip(vocab["alias"].to_pylist(), vocab["sem_label"].to_pylist()))
    vocab_ref = ray.put(alias_label)

    def block_fn(df: pd.DataFrame) -> pa.Table:
        al = ray.get(vocab_ref)
        if len(df) == 0:
            interior = _resolve_frame(df, al)
            edge = df
            first = last = None
            interior_convs: list = []
        else:
            first, last = df["conv_id"].iloc[0], df["conv_id"].iloc[-1]
            is_edge = df["conv_id"].isin({first, last}).to_numpy()
            interior = _resolve_frame(df[~is_edge], al)
            edge = df[is_edge]
            interior_convs = df.loc[~is_edge, "conv_id"].unique().tolist()
        # one output schema: resolved rows carry text=''; edge TURN rows
        # carry their text and empty surface/label for the driver repair
        out = pa.table({
            "conv_id": pa.array(
                list(interior["conv_id"]) + list(edge["conv_id"]), pa.string()),
            "turn_idx": pa.array(
                list(interior["turn_idx"]) + list(edge["turn_idx"]), pa.int32()),
            "norm_surface": pa.array(
                list(interior["norm_surface"]) + [""] * len(edge), pa.string()),
            "label": pa.array(
                list(interior["label"]) + [""] * len(edge), pa.string()),
            "text": pa.array([""] * len(interior) + list(edge["text"].fillna("")), pa.string()),
            "is_edge": pa.array([False] * len(interior) + [True] * len(edge), pa.bool_()),
        })
        # guard summary on the first edge row (cf. distinct.check_summaries):
        # a non-clustered layout would silently separate a conversation's
        # definitions from its usages — detect it instead
        if len(edge):
            arrs = _dx.guard_arrays(
                out.num_rows, len(interior), first, last, interior_convs
            )
        else:
            arrs = [
                pa.nulls(out.num_rows, pa.string()),
                pa.nulls(out.num_rows, pa.string()),
                pa.nulls(out.num_rows, pa.binary()),
            ]
        for name, arr in zip(_dx.GUARD_COLS, arrs):
            out = out.append_column(name, arr)
        return out

    with _dx._ordered_execution():
        flagged = turns.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
            block_fn, batch_format="pandas", batch_size=None
        ).materialize()
        edge_rows = pd.DataFrame(
            flagged.filter(expr="is_edge == True").take_all(),
            columns=["conv_id", "turn_idx", "norm_surface", "label", "text",
                     "is_edge", *_dx.GUARD_COLS],
        )
    sdf = edge_rows[edge_rows["__gf"].notna()]
    _dx.check_summaries(
        sdf["__gf"].tolist(), sdf["__gl"].tolist(), sdf["__gkmv"].tolist(),
        "conv_id", "abbrev.resolved_mentions_local",
    )
    edge_rows = edge_rows.drop(columns=_dx.GUARD_COLS)
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t.drop_columns(["text", "is_edge", *_dx.GUARD_COLS]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    if len(edge_rows) == 0:
        return interior
    repaired = _resolve_frame(
        edge_rows[["conv_id", "turn_idx", "text"]].sort_values(
            ["conv_id", "turn_idx"], kind="mergesort"
        ),
        alias_label,
    )
    edge_tab = pa.table({
        "conv_id": pa.array(repaired["conv_id"], pa.string()),
        "turn_idx": pa.array(repaired["turn_idx"], pa.int32()),
        "norm_surface": pa.array(repaired["norm_surface"], pa.string()),
        "label": pa.array(repaired["label"], pa.string()),
    })
    return interior.union(rd.from_arrow(edge_tab))


def resolved_mentions(turns: rd.Dataset, vocab: pa.Table) -> rd.Dataset:
    """Mentions recovered through abbreviation resolution:
    (conv_id, turn_idx, norm_surface=<long form>, label), distinct.

    `vocab` is the (alias, sem_label) catalog (mentions.alias_catalog()).
    Under the conversation-local shard contract, dispatches to the
    exchange-free `resolved_mentions_local` (guard-checked; a violated
    layout falls back to the conv-keyed exchange path below)."""
    from .. import config

    if config.CONV_LOCAL_SHARDS:
        try:
            return resolved_mentions_local(turns, vocab)
        except _dx.ContractError as e:
            import warnings

            warnings.warn(f"{e} — falling back to the sorted-exchange path")
    alias_label = dict(zip(vocab["alias"].to_pylist(), vocab["sem_label"].to_pylist()))
    vocab_ref = ray.put(alias_label)

    defs = definitions(turns)

    def validate(batch: pd.DataFrame) -> pd.DataFrame:
        al = ray.get(vocab_ref)
        keep = batch["lf"].isin(al.keys()) & ~batch["sf"].isin(al.keys())
        out = batch[keep].copy()
        out["label"] = out["lf"].map(al)
        return out

    valid = defs.map_batches(validate, batch_format="pandas")

    # prune the conv-keyed exchange to DEFINING conversations only (a small
    # corpus fraction): ids-only broadcast semi-join, same pattern as the
    # minhash candidate filter — def conv ids are bytes each, the text
    # payload of def-less conversations never enters the shuffle
    def_ids = sorted({r["conv_id"] for r in _distinct(
        valid.select_columns(["conv_id"]), ["conv_id"]).take_all()})
    if not def_ids:
        return rd.from_arrow(pa.table({
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "norm_surface": pa.array([], pa.string()),
            "label": pa.array([], pa.string()),
        }))
    ids_ref = ray.put(pa.array(def_ids, pa.string()))
    turns = turns.select_columns(["conv_id", "turn_idx", "text"]).map_batches(
        lambda t: t.filter(pa.compute.is_in(t["conv_id"], value_set=ray.get(ids_ref))),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    # co-locate each defining conversation's turns with ONE parallel sort on
    # (conv_id, turn_idx), then resolve interior conversations vectorized
    # per block (`_resolve_frame` re-extracts the definitions from the text,
    # so no def-row tagging is needed) and repair the ≤2 block-edge
    # conversations driver-side — never `groupby(conv_id).map_groups`,
    # whose per-group Python scales with the defining-conv count (see
    # stages/groupagg.py).  A conversation resolves in exactly one frame
    # (interior block or the gathered edge frame) and `_resolve_frame`
    # dedups within the frame, so the output is distinct by construction.
    s = turns.repartition(config.sort_blocks()).sort(["conv_id", "turn_idx"])

    def split(df: pd.DataFrame) -> pd.DataFrame:
        al = ray.get(vocab_ref)
        if len(df) == 0:
            return pd.DataFrame({
                "conv_id": pd.array([], dtype="str"),
                "turn_idx": pd.array([], dtype="int32"),
                "norm_surface": pd.array([], dtype="str"),
                "label": pd.array([], dtype="str"),
                "text": pd.array([], dtype="str"),
                "is_edge": pd.array([], dtype="bool"),
            })
        first, last = df["conv_id"].iloc[0], df["conv_id"].iloc[-1]
        edge_mask = df["conv_id"].isin({first, last}).to_numpy()
        interior = _resolve_frame(df[~edge_mask], al)
        interior = interior.assign(text="", is_edge=False)
        edge = df[edge_mask].assign(norm_surface="", label="", is_edge=True)
        return pd.concat(
            [interior, edge[["conv_id", "turn_idx", "norm_surface", "label",
                             "text", "is_edge"]]],
            ignore_index=True,
        )

    flagged = s.map_batches(split, batch_format="pandas", batch_size=None).materialize()
    out_cols = ["conv_id", "turn_idx", "norm_surface", "label"]
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t[out_cols], batch_format="pandas"
    )
    edge_df = pd.DataFrame(
        flagged.filter(expr="is_edge == True").take_all(),
        columns=out_cols + ["text", "is_edge"],
    )[["conv_id", "turn_idx", "text"]].drop_duplicates(["conv_id", "turn_idx"])
    repaired = _resolve_frame(
        edge_df.sort_values(["conv_id", "turn_idx"], kind="mergesort"), alias_label
    )
    if len(repaired) == 0:
        return interior
    edge_tab = pa.table({
        "conv_id": pa.array(repaired["conv_id"], pa.string()),
        "turn_idx": pa.array(repaired["turn_idx"], pa.int32()),
        "norm_surface": pa.array(repaired["norm_surface"], pa.string()),
        "label": pa.array(repaired["label"], pa.string()),
    })
    return interior.union(rd.from_arrow(edge_tab))
