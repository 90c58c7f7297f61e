"""Training-corpus export: the end-to-end pretraining-data flow.

Composes the document-side operators into the pipeline a real corpus run
executes — quality filter → exact dedup → seeded shuffle → partitioned,
RESUMABLE Parquet shards:

1. ONE fused map pass computes each document's Gopher keep flag
   (textstats.gopher_flags) and its normalized-text md5 dedup key —
   filter and key never require separate corpus passes;
2. exact dedup keeps the min doc_id per key: first-row-per-run on the
   (norm_hash, doc_id) sorted exchange (the windows._sorted_user_op
   scaffold with a string key — no per-group Python, no driver set);
3. shard/position assignment is stages/shuffle.seeded_shard_shuffle —
   a reproducible global permutation with exact per-shard positions;
4. text rides back in via the broadcast-free sorted-merge equi-join
   (stages/join.py), and each shard directory commits ATOMICALLY with a
   manifest row (state/manifest.py) — a restarted export recomputes only
   the shards whose commit is missing.

`corpus_rows` (steps 1–3, no write) is the oracle-checked query surface:
the whole chain is SQL-expressible, so the driver verifies the pipeline
end to end, not just its stages.
"""

from __future__ import annotations

import os

import pandas as pd
import ray.data as rd

from ..sources import readers
from ..stages import textstats
from ..stages.windows import _run_firsts, _sorted_user_op
from ..state.manifest import Manifest, atomic_write_parquet

N_SHARDS = 8
SEED = 20260817


def _kept_keys(sf_dir: str) -> rd.Dataset:
    """(norm_hash, doc_id) for every document passing the Gopher filter —
    one fused vectorized pass (both formulas live in textstats)."""
    docs = readers.read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        text = b["text"].fillna("")
        _, _, _, words_ok, mean_ok, stop_ok = textstats.gopher_flags(text)
        keep = words_ok & mean_ok & stop_ok
        _, h = textstats.norm_text_and_hash(text)
        out = pd.DataFrame(
            {
                "norm_hash": pd.Series(h, dtype="object"),
                "doc_id": b["doc_id"].astype("int64"),
            }
        )
        return out[keep]

    return docs.map_batches(prep, batch_format="pandas", batch_size=None)


def _survivors(sf_dir: str) -> rd.Dataset:
    """doc_ids surviving exact dedup (min doc_id per norm_hash) among the
    Gopher-kept documents."""

    def first_per_hash(df: pd.DataFrame) -> pd.DataFrame:
        new, _ = _run_firsts(df["norm_hash"].to_numpy())
        return df[new][["doc_id"]]

    return _sorted_user_op(
        _kept_keys(sf_dir),
        ["norm_hash", "doc_id"],
        ["norm_hash", "doc_id"],
        [False, False],
        first_per_hash,
        {"doc_id": "int64"},
        key="norm_hash",
    )


def corpus_rows(sf_dir: str, n_shards: int = N_SHARDS, seed: int = SEED) -> rd.Dataset:
    """(doc_id, shard, pos): the filtered, deduplicated, seeded-shuffled
    corpus index — the export minus the write."""
    from ..stages.shuffle import seeded_shard_shuffle

    shuffled = seeded_shard_shuffle(_survivors(sf_dir), seed=seed, n_shards=n_shards)
    return shuffled.map_batches(
        lambda b: b[["doc_id", "shard", "pos"]], batch_format="pandas",
        batch_size=None,
    )


def export_corpus(
    sf_dir: str, out_dir: str, n_shards: int = N_SHARDS, seed: int = SEED
) -> dict:
    """Write the shuffled corpus as `shard=K/` Parquet directories
    (doc_id, pos, text ordered by pos), committing each shard atomically
    with a manifest row.  Resume: shards whose manifest row is `done` and
    whose directory exists are skipped; only missing shards recompute.
    The export knobs (n_shards, seed) are recorded in the manifest —
    resuming with DIFFERENT knobs raises (committed shards would hold a
    different permutation)."""
    man = Manifest(os.path.join(out_dir, "manifest.jsonl"))
    knobs = {"n_shards": n_shards, "seed": seed}
    prior = [e for e in man.entries() if e["stage"] == "knobs"]
    if prior:
        if prior[-1].get("knobs") != knobs:
            raise ValueError(
                f"resume with different knobs ({prior[-1].get('knobs')} → "
                f"{knobs}); delete {out_dir} to re-export"
            )
    else:
        man.record("knobs", "knobs", "done", knobs=knobs)
    done = man.completed("shards")
    missing = [s for s in range(n_shards) if f"shard={s}" not in done]
    summary = {"out_dir": out_dir, "n_shards": n_shards,
               "skipped": n_shards - len(missing), "written": len(missing)}
    if not missing:
        return summary

    from ..stages.join import equi_join

    # prune to the missing shards BEFORE the text join — a resume never
    # exchanges text payloads for shards it already committed.  Arrow
    # filter, not a pandas mask: an empty pandas result block is
    # schema-less, which flips the downstream sort into pandas mode where
    # null-bearing int64 promotes to double (observed; arrow empties keep
    # their schema).
    import pyarrow as pa
    import pyarrow.compute as pc

    missing_set = pa.array(missing, pa.int64())
    index = corpus_rows(sf_dir, n_shards, seed).map_batches(
        lambda t: t.filter(pc.is_in(t["shard"], value_set=missing_set)),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
    )
    docs = readers.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    rows = equi_join(
        index, docs, "doc_id", ["shard", "pos"], ["text"]
    ).materialize()  # inner: non-surviving docs drop; one pass, sliced below
    for s in missing:
        shard_ds = rows.filter(expr=f"shard == {s}").sort("pos").materialize()
        path = os.path.join(out_dir, f"shard={s}")
        atomic_write_parquet(shard_ds, path)
        man.record("shards", f"shard={s}", "done", output_path=path,
                   rows_in=shard_ds.count())
    return summary
