"""2-D skyline (Pareto frontier) over a distributed table.

"Which rows are not dominated" (minimize x, maximize y — e.g. cheapest
price at every quantity level, fastest run at every accuracy) is the
classic multi-criteria reduction.  The distributed shape:

- per-x reduction: only the MAX y at each x can be on the frontier, so one
  grouped_agg collapses the corpus to distinct-x rows (bounded by the x
  DOMAIN, not the corpus);
- global prefix-max scan over x-ascending order: the global_row_number
  recipe (stages/ranks.py) — ONE range sort, pass 1 sends each sorted
  block's (first x, block max y) to the driver (O(blocks) rows), the
  driver prefix-maxes those into a per-block seed, pass 2 filters each
  block locally against seed ∨ local running max.  A row survives iff its
  y strictly exceeds every y at strictly smaller x — exactly the
  NOT-EXISTS dominance predicate, in two map passes.

Everything is int64; no floats, no ties ambiguity (per-x max is unique).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .groupagg import grouped_agg


def _sort_blocks() -> int:
    from .. import config

    return config.sort_blocks()


def skyline_2d(ds: rd.Dataset, x_col: str, y_col: str) -> rd.Dataset:
    """Pareto frontier minimizing `x_col`, maximizing `y_col` (both int64).
    Returns (x_col, y_col) rows sorted-agnostically: x strictly ascending,
    y strictly ascending (each kept row beats every smaller-x row's y)."""
    g = grouped_agg(
        ds.select_columns([x_col, y_col]), [x_col], [(y_col, "max", y_col)]
    )
    s = g.repartition(_sort_blocks()).sort([x_col]).materialize()

    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {x_col: pd.array([], dtype="int64"),
                 "blockmax": pd.array([], dtype="int64")}
            )
        return pd.DataFrame(
            {
                x_col: pd.array([int(b[x_col].iloc[0])], dtype="int64"),
                "blockmax": pd.array([int(b[y_col].max())], dtype="int64"),
            }
        )

    summ = s.map_batches(summarize, batch_format="pandas", batch_size=None).to_pandas()
    if len(summ) == 0:
        return s.select_columns([x_col, y_col])
    order = summ.sort_values(x_col, kind="mergesort")
    # seed for each block = max y over all PRECEDING blocks (x is unique
    # after the grouped max, so a block's first x identifies it)
    maxes = order["blockmax"].to_numpy()
    seeds = np.concatenate([[np.iinfo(np.int64).min], np.maximum.accumulate(maxes)[:-1]])
    seed_of = {int(x): int(sd) for x, sd in zip(order[x_col], seeds)}
    seed_ref = ray.put(seed_of)

    def frontier(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {x_col: pd.array([], dtype="int64"),
                 y_col: pd.array([], dtype="int64")}
            )
        seed = ray.get(seed_ref)[int(b[x_col].iloc[0])]
        y = b[y_col].to_numpy().astype(np.int64)
        run = np.concatenate([[seed], np.maximum.accumulate(y)[:-1]])
        run = np.maximum(run, seed)
        keep = y > run
        return pd.DataFrame(
            {
                x_col: pd.array(b[x_col].to_numpy()[keep].astype(np.int64), dtype="int64"),
                y_col: pd.array(y[keep], dtype="int64"),
            }
        )

    return s.map_batches(frontier, batch_format="pandas", batch_size=None)
