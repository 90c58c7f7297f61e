"""Dataset sources: transcript shards, KB tables, testdata tables.

Replaces the reference's network fetchers (fetch_ncbi.py / uniprot.py) with
`ray.data.read_parquet` over local shards, always with column pruning
(`columns=[...]`) so only needed columns leave storage.  KB tables are tiny
broadcast sides: they are read ONCE per job with pyarrow (driver side) and
shipped via `ray.put`, never shuffled.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import ray.data as rd

from .. import config, datagen


def read_transcripts(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """Transcript shards for an sf dir as a streaming Dataset.

    Generates the deterministic corpus on first use (idempotent).  Column
    pruning is mandatory in the hot pipelines — e.g. mention detection reads
    only (conv_id, turn_idx, text).
    """
    gen = datagen.ensure_transcripts(sf_dir)
    files = sorted(glob.glob(os.path.join(gen, "*.parquet")))
    return rd.read_parquet(
        files, columns=columns, override_num_blocks=config.read_blocks(len(files))
    )


def transcript_blocks(sf_dir: str) -> int:
    """Block count read_transcripts will produce — the actor-pool sizing
    hint (a pool larger than this spawns actors with no work)."""
    gen = datagen.ensure_transcripts(sf_dir)
    return config.read_blocks(len(glob.glob(os.path.join(gen, "*.parquet"))))


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    """One of the provided testdata tables (documents, embeddings, lineitem…).

    The provided testdata parquet carries pandas footer metadata whose
    nested dict makes `hash(pyarrow.Schema)` raise, which defeats Ray's
    block-schema dedup (a "Failed to hash the schemas" warning per block).
    Strip it at the read boundary by passing an explicit metadata-free
    schema.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    full = pq.read_schema(path).remove_metadata()
    if columns is not None:
        import pyarrow as pa

        schema = pa.schema([full.field(c) for c in columns])
    else:
        schema = full
    return rd.read_parquet(path, columns=columns, schema=schema)


def kb_table(name: str):
    """A KB table as an in-memory pyarrow Table (broadcast side, tiny)."""
    datagen.ensure_kb()
    return pq.read_table(os.path.join(config.kb_dir(), f"{name}.parquet"))


def kb_num_aliases() -> int:
    """Alias-catalog cardinality from Parquet footer metadata only — the
    driver-funnel gate (config.VOCAB_FUNNEL_MAX) needs the count, not the
    data, so don't deserialize the table to decide."""
    datagen.ensure_kb()
    return pq.read_metadata(os.path.join(config.kb_dir(), "aliases.parquet")).num_rows


def transcript_files(sf_dir: str) -> list[str]:
    """Shard file list (the resume/manifest unit)."""
    gen = datagen.ensure_transcripts(sf_dir)
    return sorted(glob.glob(os.path.join(gen, "*.parquet")))


def read_any(path: str, fmt: str | None = None, columns: list[str] | None = None) -> rd.Dataset:
    """Format-dispatched source: Parquet / CSV / JSONL by extension (or an
    explicit `fmt`), so a pipeline written against one ingest format runs
    unchanged against another.  Parquet gets the metadata-strip treatment
    (see read_table); CSV/JSONL are Ray's native readers with column
    pruning applied as a projection immediately after the read (those
    formats are row-oriented — there is no column pushdown to exploit,
    but nothing downstream should see unpruned rows)."""
    fmt = fmt or {
        ".parquet": "parquet", ".csv": "csv",
        ".json": "json", ".jsonl": "json",
    }.get(os.path.splitext(path)[1].lower())
    if fmt == "parquet":
        schema = pq.read_schema(path).remove_metadata()
        if columns is not None:
            import pyarrow as pa

            schema = pa.schema([schema.field(c) for c in columns])
        return rd.read_parquet(path, columns=columns, schema=schema)
    if fmt == "csv":
        ds = rd.read_csv(path)
    elif fmt == "json":
        ds = rd.read_json(path)
    else:
        raise ValueError(f"unsupported source format for {path!r} (fmt={fmt!r})")
    return ds.select_columns(columns) if columns is not None else ds
