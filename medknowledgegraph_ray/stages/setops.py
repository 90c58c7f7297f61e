"""Distributed set operations on id columns — anti-join (EXCEPT) first.

The anti-join is the "apply the blocklist" step of a dedup pipeline:
corpus ids MINUS the ids marked for removal.  Ray Data has no join, and a
broadcast NOT-IN set stops being broadcastable when the removal side is a
corpus fraction (transitive dedup at 100 TB drops 10–40% of documents), so
this rides the same single sorted exchange as every other keyed operator
here:

- union left rows (kind 0) and right rows (kind 1), ONE global sort on
  (key, kind);
- per block, a left id is kept iff no right row shares its key — after the
  sort a key's rows are contiguous, so interior keys resolve with one
  vectorized isin/searchsorted;
- rows at a block's first/last key defer; every block containing a flagged
  key flags it too, so the driver sees each deferred key's COMPLETE row
  set and resolves it exactly (O(blocks) keys, bounded by 2 per block).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _sort_blocks() -> int:
    # coalesce before every range sort: shuffle-object count is
    # #map x #reduce blocks (see config.sort_blocks)
    from .. import config

    return config.sort_blocks()


def anti_join_ids(
    left: rd.Dataset, right: rd.Dataset, key: str = "doc_id"
) -> rd.Dataset:
    """ids in `left` (column `key`) that never appear in `right` (same
    column).  Left ids are assumed unique (they are ids); right may hold
    duplicates."""

    def tag(kind: int):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": b[key].astype("int64"),
                    "kind": pd.array(np.full(len(b), kind, dtype=np.int8), dtype="int8"),
                }
            )

        return f

    unioned = (
        left.map_batches(tag(0), batch_format="pandas", batch_size=None)
        .union(right.map_batches(tag(1), batch_format="pandas", batch_size=None))
        .repartition(_sort_blocks())
        .sort(["key", "kind"])
    )

    def resolve(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        if n == 0:
            return pd.DataFrame(
                {
                    "key": pd.array([], dtype="int64"),
                    "kind": pd.array([], dtype="int8"),
                    "is_edge": pd.array([], dtype="bool"),
                }
            )
        k = b["key"].to_numpy()
        kind = b["kind"].to_numpy()
        flagged = (k == k[0]) | (k == k[-1])
        blocked = np.unique(k[(kind == 1) & ~flagged])
        keep = (kind == 0) & ~flagged & ~np.isin(k, blocked)
        out = b[keep | flagged].copy()
        out["is_edge"] = pd.array(flagged[keep | flagged], dtype="bool")
        return out

    flagged = unioned.map_batches(
        resolve, batch_format="pandas", batch_size=None
    ).materialize()
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda b: pd.DataFrame({key: b["key"].astype("int64")}),
        batch_format="pandas",
    )
    deferred = flagged.filter(expr="is_edge == True").take_all()
    if not deferred:
        return interior
    seen_right = {int(r["key"]) for r in deferred if r["kind"] == 1}
    kept = sorted(
        {int(r["key"]) for r in deferred if r["kind"] == 0} - seen_right
    )
    if not kept:
        return interior
    rep = pd.DataFrame({key: pd.array(kept, dtype="int64")})
    return interior.union(rd.from_pandas(rep))


def anti_join_rows(
    left: rd.Dataset, right: rd.Dataset, key: str = "key", id_col: str = "doc_id"
) -> rd.Dataset:
    """Rows of `left` (columns `key`, `id_col`) whose `key` never appears in
    `right` (column `key`) — the payload-carrying anti-join.  Unlike
    anti_join_ids, left keys MAY repeat (several left rows sharing a key all
    survive or all drop together); keys are uint64 (content hashes).  Same
    single sorted exchange + bounded edge deferral as anti_join_ids."""

    def tag_left(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": b[key].astype("uint64"),
                "kind": pd.array(np.zeros(len(b), dtype=np.int8), dtype="int8"),
                id_col: b[id_col].astype("int64"),
            }
        )

    def tag_right(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": b[key].astype("uint64"),
                "kind": pd.array(np.ones(len(b), dtype=np.int8), dtype="int8"),
                id_col: pd.array(np.full(len(b), -1, dtype=np.int64), dtype="int64"),
            }
        )

    unioned = (
        left.map_batches(tag_left, batch_format="pandas", batch_size=None)
        .union(right.map_batches(tag_right, batch_format="pandas", batch_size=None))
        .repartition(_sort_blocks())
        .sort(["key", "kind"])
    )

    def resolve(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        if n == 0:
            return pd.DataFrame(
                {
                    "key": pd.array([], dtype="uint64"),
                    "kind": pd.array([], dtype="int8"),
                    id_col: pd.array([], dtype="int64"),
                    "is_edge": pd.array([], dtype="bool"),
                }
            )
        k = b["key"].to_numpy()
        kind = b["kind"].to_numpy()
        flagged = (k == k[0]) | (k == k[-1])
        blocked = np.unique(k[(kind == 1) & ~flagged])
        keep = (kind == 0) & ~flagged & ~np.isin(k, blocked)
        out = b[keep | flagged].copy()
        out["is_edge"] = pd.array(flagged[keep | flagged], dtype="bool")
        return out

    flagged = unioned.map_batches(
        resolve, batch_format="pandas", batch_size=None
    ).materialize()
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda b: pd.DataFrame({id_col: b[id_col].astype("int64")}),
        batch_format="pandas",
    )
    deferred = flagged.filter(expr="is_edge == True").take_all()
    if not deferred:
        return interior
    seen_right = {int(r["key"]) for r in deferred if r["kind"] == 1}
    kept = sorted(
        int(r[id_col])
        for r in deferred
        if r["kind"] == 0 and int(r["key"]) not in seen_right
    )
    if not kept:
        return interior
    rep = pd.DataFrame({id_col: pd.array(kept, dtype="int64")})
    return interior.union(rd.from_pandas(rep))


def semi_join_ids(
    left: rd.Dataset, right: rd.Dataset, key: str = "doc_id"
) -> rd.Dataset:
    """ids in `left` (column `key`) that DO appear in `right` (same column)
    — the EXISTS / semi-join complement of anti_join_ids, on the identical
    single sorted exchange.  Left ids are assumed unique; right may hold
    duplicates."""

    def tag(kind: int):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": b[key].astype("int64"),
                    "kind": pd.array(np.full(len(b), kind, dtype=np.int8), dtype="int8"),
                }
            )

        return f

    unioned = (
        left.map_batches(tag(0), batch_format="pandas", batch_size=None)
        .union(right.map_batches(tag(1), batch_format="pandas", batch_size=None))
        .repartition(_sort_blocks())
        .sort(["key", "kind"])
    )

    def resolve(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        if n == 0:
            return pd.DataFrame(
                {
                    "key": pd.array([], dtype="int64"),
                    "kind": pd.array([], dtype="int8"),
                    "is_edge": pd.array([], dtype="bool"),
                }
            )
        k = b["key"].to_numpy()
        kind = b["kind"].to_numpy()
        flagged = (k == k[0]) | (k == k[-1])
        matched = np.unique(k[(kind == 1) & ~flagged])
        keep = (kind == 0) & ~flagged & np.isin(k, matched)
        out = b[keep | flagged].copy()
        out["is_edge"] = pd.array(flagged[keep | flagged], dtype="bool")
        return out

    flagged = unioned.map_batches(
        resolve, batch_format="pandas", batch_size=None
    ).materialize()
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda b: pd.DataFrame({key: b["key"].astype("int64")}),
        batch_format="pandas",
    )
    deferred = flagged.filter(expr="is_edge == True").take_all()
    if not deferred:
        return interior
    seen_right = {int(r["key"]) for r in deferred if r["kind"] == 1}
    kept = sorted(
        {int(r["key"]) for r in deferred if r["kind"] == 0} & seen_right
    )
    if not kept:
        return interior
    rep = pd.DataFrame({key: pd.array(kept, dtype="int64")})
    return interior.union(rd.from_pandas(rep))


def anti_join_cols(
    left: rd.Dataset,
    right: rd.Dataset,
    key: str,
    cols: list[str],
    dtypes: dict[str, str],
) -> rd.Dataset:
    """Rows of `left` (int64 `key` plus numeric payload `cols`) whose key
    never appears in `right` (column `key`) — the payload-carrying
    NOT-EXISTS, same single sorted exchange + bounded edge deferral as
    anti_join_ids.  Left keys MAY repeat (all rows of a blocked key drop
    together); `dtypes` (col → pandas dtype string) types the right side's
    filler columns and the empty block so the union stays schema-stable.

    Reference parity: the relational NOT EXISTS shape of TPC-H Q22
    (customers with no recent orders), kept distributed because neither
    side is broadcastable at corpus scale."""

    def tag_left(b: pd.DataFrame) -> pd.DataFrame:
        out = {
            "key": b[key].astype("int64"),
            "kind": pd.array(np.zeros(len(b), dtype=np.int8), dtype="int8"),
        }
        for c in cols:
            out[c] = b[c].astype(dtypes[c])
        return pd.DataFrame(out)

    def tag_right(b: pd.DataFrame) -> pd.DataFrame:
        out = {
            "key": b[key].astype("int64"),
            "kind": pd.array(np.ones(len(b), dtype=np.int8), dtype="int8"),
        }
        for c in cols:
            # string filler for object columns: np.zeros(dtype=object)
            # yields int 0 objects, and one such row reaching a block's
            # Arrow conversion under a string-typed schema raises
            # ArrowTypeError (partition-dependent — surfaced at sf0.01)
            if dtypes[c] == "object":
                out[c] = pd.Series([""] * len(b), dtype="object")
            else:
                out[c] = pd.array(np.zeros(len(b), dtype=dtypes[c]), dtype=dtypes[c])
        return pd.DataFrame(out)

    unioned = (
        left.map_batches(tag_left, batch_format="pandas", batch_size=None)
        .union(right.map_batches(tag_right, batch_format="pandas", batch_size=None))
        .repartition(_sort_blocks())
        .sort(["key", "kind"])
    )

    def resolve(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        if n == 0:
            out = {
                "key": pd.array([], dtype="int64"),
                "kind": pd.array([], dtype="int8"),
            }
            for c in cols:
                out[c] = pd.array([], dtype=dtypes[c])
            out["is_edge"] = pd.array([], dtype="bool")
            return pd.DataFrame(out)
        k = b["key"].to_numpy()
        kind = b["kind"].to_numpy()
        flagged = (k == k[0]) | (k == k[-1])
        blocked = np.unique(k[(kind == 1) & ~flagged])
        keep = (kind == 0) & ~flagged & ~np.isin(k, blocked)
        out = b[keep | flagged].copy()
        out["is_edge"] = pd.array(flagged[keep | flagged], dtype="bool")
        return out

    flagged = unioned.map_batches(
        resolve, batch_format="pandas", batch_size=None
    ).materialize()

    def strip(b: pd.DataFrame) -> pd.DataFrame:
        out = {key: b["key"].astype("int64")}
        for c in cols:
            out[c] = b[c].astype(dtypes[c])
        return pd.DataFrame(out)

    interior = flagged.filter(expr="is_edge == False").map_batches(
        strip, batch_format="pandas"
    )
    deferred = flagged.filter(expr="is_edge == True").take_all()
    if not deferred:
        return interior
    seen_right = {int(r["key"]) for r in deferred if r["kind"] == 1}
    kept = sorted(
        (r for r in deferred if r["kind"] == 0 and int(r["key"]) not in seen_right),
        key=lambda r: int(r["key"]),
    )
    if not kept:
        return interior
    rep = pd.DataFrame(
        {
            key: pd.array([int(r["key"]) for r in kept], dtype="int64"),
            **{c: pd.array([r[c] for r in kept], dtype=dtypes[c]) for c in cols},
        }
    )
    return interior.union(rd.from_pandas(rep))
