"""Distributed selection: exact global order statistics (quantile_disc).

Grouped quantiles (windows.grouped_quantiles) pick order statistics inside
per-key sorted runs; the GLOBAL quantile has no key to ride, so it uses
the block-summary trick from stages/shuffle.py instead:

- ONE global sort on (value, uid) — the uid tiebreak makes every row
  tuple unique, so a block is identified across passes by its first tuple;
- pass 1 collects O(blocks) summaries (first tuple, row count); the
  driver orders them by first tuple (= global block order), prefix-sums
  the counts, and maps each requested rank ceil(q·n)−1 (DuckDB's
  quantile_disc index, the convention windows._quantiles_sorted verified)
  to (owning block, local offset);
- pass 2 broadcasts that O(#quantiles) map; each block emits only the
  elements it owns.  Driver state never exceeds O(blocks + quantiles).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _sort_blocks() -> int:
    from .. import config

    return config.sort_blocks()


def exact_quantiles(
    values: rd.Dataset, col: str, qs: dict[str, float]
) -> pd.DataFrame:
    """One-row DataFrame with column `name` = the exact q-quantile
    (discrete, index ceil(q·n)−1 of the ascending sort) of int64 `col`.

    `values` must carry a unique int64 `uid` column for the sort tiebreak
    (any id column works; it never affects the selected value)."""

    s = values.repartition(_sort_blocks()).sort([col, "uid"]).materialize()

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "first_v": pd.array([], dtype="int64"),
                    "first_u": pd.array([], dtype="int64"),
                    "n": pd.array([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "first_v": pd.array([int(b[col].iloc[0])], dtype="int64"),
                "first_u": pd.array([int(b["uid"].iloc[0])], dtype="int64"),
                "n": pd.array([len(b)], dtype="int64"),
            }
        )

    summ = (
        s.map_batches(summarize, batch_format="pandas", batch_size=None)
        .to_pandas()
        .sort_values(["first_v", "first_u"], kind="mergesort")
        .reset_index(drop=True)
    )
    n_total = int(summ["n"].sum())
    if n_total == 0:
        raise ValueError("exact_quantiles: empty input")
    offsets = np.concatenate([[0], np.cumsum(summ["n"].to_numpy())[:-1]])
    # rank -> (block first tuple) -> local offset
    wanted: dict[tuple[int, int], dict[int, list[str]]] = {}
    for name, q in qs.items():
        rank = math.ceil(n_total * q) - 1 if q > 0 else 0
        rank = min(max(rank, 0), n_total - 1)
        blk = int(np.searchsorted(offsets, rank, side="right") - 1)
        key = (int(summ["first_v"].iloc[blk]), int(summ["first_u"].iloc[blk]))
        wanted.setdefault(key, {}).setdefault(int(rank - offsets[blk]), []).append(name)
    want_ref = ray.put(wanted)

    # Arrow out: a size-0 pandas OBJECT column trips Ray's size estimator
    # (np.vectorize on empty input) and logs an error per block; Arrow
    # empties keep their schema and skip that path (same note: eventagg)
    _empty = pa.table({"name": pa.array([], pa.string()),
                       "value": pa.array([], pa.int64())})

    def extract(b: pd.DataFrame) -> pa.Table:
        if len(b) == 0:
            return _empty
        key = (int(b[col].iloc[0]), int(b["uid"].iloc[0]))
        mine = ray.get(want_ref).get(key)
        if not mine:
            return _empty
        names, vals = [], []
        for off, labels in mine.items():
            v = int(b[col].iloc[off])
            for lb in labels:
                names.append(lb)
                vals.append(v)
        return pa.table({"name": pa.array(names, pa.string()),
                         "value": pa.array(vals, pa.int64())})

    rows = s.map_batches(extract, batch_format="pandas", batch_size=None).to_pandas()
    out = {name: pd.array([int(v)], dtype="int64")
           for name, v in zip(rows["name"], rows["value"])}
    return pd.DataFrame({k: out[k] for k in qs})


def quantile_band_filter(
    ds: rd.Dataset,
    col: str,
    uid_col: str,
    lo_q: float = 0.25,
    hi_q: float = 0.75,
) -> rd.Dataset:
    """Keep rows whose int64 `col` lies within the corpus's exact
    [lo_q, hi_q] discrete-quantile band — the length-outlier trim of a
    training-data pipeline, with EXACT global cut points (two order
    statistics via exact_quantiles' O(blocks) selection; the filter pass
    itself is map-only).  Returns (uid_col, col)."""

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                col: b[col].astype("int64"),
                "uid": b[uid_col].astype("int64"),
            }
        )

    vals = ds.select_columns([uid_col, col]).map_batches(
        project, batch_format="pandas", batch_size=None
    ).materialize()
    q = exact_quantiles(vals, col, {"lo": lo_q, "hi": hi_q})
    lo, hi = int(q["lo"].iloc[0]), int(q["hi"].iloc[0])

    def band(b: pd.DataFrame) -> pd.DataFrame:
        v = b[col].to_numpy()
        out = b[(v >= lo) & (v <= hi)]
        return pd.DataFrame(
            {uid_col: out["uid"].astype("int64"), col: out[col].astype("int64")}
        )

    return vals.map_batches(band, batch_format="pandas")


def winsorize(
    events: rd.Dataset,
    col: str = "value",
    uid_col: str = "event_id",
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> rd.Dataset:
    """Winsorization: clamp `col` (micro-unit-scaled to value_e6) at the
    corpus's exact global p{lo_q}/p{hi_q} discrete quantiles — the
    tail-capping companion to quantile_band_filter (which DROPS outliers;
    winsorize KEEPS the row and saturates the value, the standard
    feature-robustness transform before training).

    Same shape as quantile_band_filter: two exact order statistics via
    exact_quantiles' O(blocks)-driver-state selection, then a map-only
    clamp pass — no extra exchange beyond the selection sort.  Output:
    (event_id, value_e6, w_e6)."""

    def project(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "value_e6": pd.array(
                    np.round(b[col].to_numpy().astype(np.float64) * 1e6).astype(
                        np.int64
                    ),
                    dtype="int64",
                ),
                "uid": b[uid_col].astype("int64"),
            }
        )

    vals = events.select_columns([uid_col, col]).map_batches(
        project, batch_format="pandas", batch_size=None
    ).materialize()
    q = exact_quantiles(vals, "value_e6", {"lo": lo_q, "hi": hi_q})
    lo, hi = int(q["lo"].iloc[0]), int(q["hi"].iloc[0])

    def clamp(b: pd.DataFrame) -> pd.DataFrame:
        v = b["value_e6"].to_numpy()
        return pd.DataFrame(
            {
                "event_id": b["uid"].astype("int64"),
                "value_e6": b["value_e6"].astype("int64"),
                "w_e6": pd.array(np.clip(v, lo, hi), dtype="int64"),
            }
        )

    return vals.map_batches(clamp, batch_format="pandas")
