"""Global row numbering over a total order — distributed zipWithIndex.

ROW_NUMBER() OVER (ORDER BY ...) with no partition is the one window shape
the per-key sorted scaffold (windows._sorted_user_op) cannot host: every row
is in the same "partition", so there is no key to repair by.  Instead it is
two O(blocks)-driver passes over ONE global range sort:

- pass 1: each sorted block reports (its first-row sort tuple, its row
  count) — O(blocks) rows to the driver, never the data;
- driver: blocks ordered by their first tuple give each block its global
  row offset (prefix sum of counts);
- pass 2: each block enumerates locally and adds its broadcast offset.

The sort key must END in a unique tiebreaker column (doc_id, event_id) —
that is what makes each block's first tuple identify the block across the
two passes, and what makes the rank itself deterministic.  At 100 TB this
is a single sort exchange plus two map-only passes; the driver state is
O(blocks), the offsets dict rides `ray.put` once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _sort_blocks() -> int:
    from .. import config

    return config.sort_blocks()


def global_row_number(
    ds: rd.Dataset, sort_cols: list[str], out_col: str = "rn"
) -> rd.Dataset:
    """Append 1-based `out_col` = global row number ordered by `sort_cols`
    (ascending; the LAST sort column must be unique — the tiebreaker)."""
    s = ds.repartition(_sort_blocks()).sort(sort_cols).materialize()

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    **{c: b[c] for c in sort_cols},
                    "n": pd.array([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                **{c: [b[c].iloc[0]] for c in sort_cols},
                "n": pd.array([len(b)], dtype="int64"),
            }
        )

    summaries = s.map_batches(
        summarize, batch_format="pandas", batch_size=None
    ).to_pandas()
    order = summaries.sort_values(sort_cols, kind="mergesort")
    counts = order["n"].to_numpy()
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    # keyed by the block's first-row tuple of the UNIQUE-suffixed sort key
    offsets = {
        tuple(row): int(off)
        for row, off in zip(order[sort_cols].itertuples(index=False), offs)
    }
    off_ref = ray.put(offsets)

    def enumerate_block(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        if len(b) == 0:
            out[out_col] = pd.array([], dtype="int64")
            return out
        key = tuple(b[c].iloc[0] for c in sort_cols)
        base = ray.get(off_ref)[key]
        out[out_col] = pd.array(base + np.arange(1, len(b) + 1), dtype="int64")
        return out

    return s.map_batches(enumerate_block, batch_format="pandas", batch_size=None)
