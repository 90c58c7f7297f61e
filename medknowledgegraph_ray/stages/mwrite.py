"""Bucketed Parquet writes from inside a map stage.

`Dataset.write_parquet(partition_cols=[...])` is a terminal op: it ends the
plan (forcing a re-read for any downstream consumer) and its hive-partition
machinery measured +3-6 s over a flat write at sf3.  `bucket_writer`
instead writes each block's per-bucket rows to `<root>/<bucket>/…` directly
from the map task and passes the block through, so the write can FUSE into
a larger streaming execution (detection → write → downstream) — one plan,
no re-read, fully parallel I/O.

File naming makes the committed layout safe to re-read under the
conversation-local shard contract (see stages/distinct.py guard) with NO
reliance on task scheduling or write order: the name is the block-group's
first `order_cols` values (zero-padded), so lexicographic file order within
a bucket dir equals row-stream order whenever the group key ascends with
the input shard sequence (true for the corpus layout: conv ids are
monotone across shard files and reads coalesce whole files).  A conversation
therefore never lands in two non-adjacent files of a bucket.  Names are
deterministic in the block's content, so a retried task overwrites its own
file instead of duplicating rows.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def _name_part(v, width: int = 6) -> str:
    s = str(v)
    return s.zfill(width) if s.isdigit() else s


def bucket_writer(root: str, *, bucket_col: str, order_cols: list[str]):
    """A map_batches fn: writes each batch's rows, grouped by `bucket_col`,
    to `<root>/<bucket>/<first-order-cols>_<nrows>.parquet` (bucket column
    dropped from the file, as a hive write would), then returns the batch
    WITHOUT the bucket column — a passthrough sink.

    Call with `batch_size=None` so a batch is a whole block: blocks hold
    whole conversations (reads coalesce whole shard files), so each output
    file does too.
    """

    def write_block(t: pa.Table) -> pa.Table:
        out = t.drop_columns([bucket_col])
        if t.num_rows == 0:
            return out
        buckets = t[bucket_col]
        for b in pc.unique(buckets.combine_chunks()).to_pylist():
            grp = out.filter(pc.equal(buckets, b))
            d = os.path.join(root, str(b))
            os.makedirs(d, exist_ok=True)
            stem = "_".join(_name_part(grp[c][0].as_py()) for c in order_cols)
            pq.write_table(grp, os.path.join(d, f"{stem}_{grp.num_rows}.parquet"))
        return out

    return write_block
