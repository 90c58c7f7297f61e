"""The flagship KG-construction pipeline, end to end.

Lifecycle (SURVEY.md §3.4): read transcript shards → conversation-keyed
assembly → actor-pool mention detection → broadcast candidate linking →
deterministic concept selection → KB enrichment broadcast joins → node/edge
materialization with exact dedup → partitioned, manifest-committed Parquet.

Branch sharing: the mention table feeds seven downstream branches (links,
per-conversation entities, selection, and four enrichment levels).  Running
the detector actor pool once per branch would re-scan the input seven times
(and oversubscribe actor pools), so `graph_tables` computes the mention
table ONCE — materialized in the object store on the query path, committed
to Parquet per input shard on the `build_graph` path — and every branch is
a cheap stateless transform over it.  The mention table is orders of
magnitude smaller than the input corpus (distinct per turn × alias), so
pinning it is the correct trade even at scale; the resumable path never
pins, it streams from the committed Parquet.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .. import config
from ..sources import readers
from ..stages import assemble, canonicalize, enrich, graph, intersect, linker, mentions
from ..state.manifest import Manifest, atomic_write_parquet


# ---------------------------------------------------------------------------
# Stage datasets (lazy)
# ---------------------------------------------------------------------------

def transcripts(sf_dir: str, columns=None) -> rd.Dataset:
    return readers.read_transcripts(sf_dir, columns=columns)


def conversations(sf_dir: str) -> rd.Dataset:
    return assemble.conversations(transcripts(sf_dir, ["conv_id", "turn_idx", "text"]))


def turn_roundtrip(sf_dir: str) -> rd.Dataset:
    return assemble.turn_roundtrip(transcripts(sf_dir, ["conv_id", "turn_idx", "text"]))


def mention_rows(sf_dir: str) -> rd.Dataset:
    return mentions.detect_mentions(transcripts(sf_dir, ["conv_id", "turn_idx", "text"]))


def conv_entities(sf_dir: str) -> rd.Dataset:
    return mentions.conv_entities(mention_rows(sf_dir))


def links(sf_dir: str) -> rd.Dataset:
    return linker.link_surfaces(mention_rows(sf_dir))


def entity_counts(sf_dir: str) -> rd.Dataset:
    return canonicalize.entity_counts(conv_entities(sf_dir))


def top_entities(sf_dir: str) -> rd.Dataset:
    return canonicalize.top_entities(entity_counts(sf_dir))


def top_cui_links(sf_dir: str) -> rd.Dataset:
    """Top-4 CUIs (score > 0.85) for each of the top-15 DISEASE surfaces."""
    return canonicalize.top_cuis_per_surface(links(sf_dir), surfaces=top_entities(sf_dir))


def selected_cuis(sf_dir: str) -> rd.Dataset:
    return canonicalize.selected_cuis(top_cui_links(sf_dir))


def genes(sf_dir: str) -> rd.Dataset:
    return enrich.genes_for_cuis(selected_cuis(sf_dir))


def snomed(sf_dir: str) -> rd.Dataset:
    return enrich.snomed_for_cuis(selected_cuis(sf_dir))


def clinical_features(sf_dir: str) -> rd.Dataset:
    return enrich.clinical_features_for_cuis(selected_cuis(sf_dir))


def proteins(sf_dir: str) -> rd.Dataset:
    return enrich.proteins_for_genes(genes(sf_dir))


def go_terms(sf_dir: str) -> rd.Dataset:
    return enrich.go_for_proteins(proteins(sf_dir))


def intersection(sf_dir: str, level: str = "Gene") -> rd.Dataset:
    """Pairwise shared-node counts between top entity surfaces at a graph
    level — the `GET /intersection` analog (neo4jconnector.py:267-316)."""
    return intersect.intersection(intersect.level_nodes(top_cui_links(sf_dir), level))


# ---------------------------------------------------------------------------
# Shared multi-branch builder
# ---------------------------------------------------------------------------

def _edges_from(ds: rd.Dataset, subj_label: str, subj_col: str, obj_label, obj_col: str) -> rd.Dataset:
    return ds.map_batches(
        graph._edges_batch(subj_label, subj_col, obj_label, obj_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _entity_umls_edges(t: pa.Table) -> pa.Table:
    return pa.table(
        {
            "subj": pc.binary_join_element_wise(t["label"], pa.scalar(":"), t["norm_surface"], ""),
            "pred": pa.array([config.PRED] * len(t), pa.string()),
            "obj": pc.binary_join_element_wise(pa.scalar("UMLS:"), t["cui"], ""),
        }
    )


def graph_tables(mention_ds: rd.Dataset) -> dict[str, rd.Dataset]:
    """All downstream tables from a (materialized or Parquet-backed) mention
    table.  Every returned dataset is either tiny (vocabulary-bounded) and
    materialized, or a cheap stateless transform over one."""
    lk = linker.link_surfaces(mention_ds).materialize()      # |vocab| rows
    ce = mentions.conv_entities(mention_ds).materialize()    # ≤ convs × vocab
    top = canonicalize.top_entities(canonicalize.entity_counts(ce))
    top_links = canonicalize.top_cuis_per_surface(lk, surfaces=top)
    sel = canonicalize.selected_cuis(top_links).materialize()  # ≤ 60 rows
    gn = enrich.genes_for_cuis(sel).materialize()
    sn = enrich.snomed_for_cuis(sel)
    cf = enrich.clinical_features_for_cuis(sel)
    pr = enrich.proteins_for_genes(gn).materialize()
    go = enrich.go_for_proteins(pr)
    return {"links": lk, "conv_entities": ce, "selected": sel,
            "genes": gn, "snomed": sn, "clinical_features": cf,
            "proteins": pr, "go": go}


def _edge_union(t: dict[str, rd.Dataset]) -> rd.Dataset:
    parts = [
        _edges_from(t["conv_entities"], "Conversation", "conv_id", "label", "norm_surface"),
        t["links"].map_batches(_entity_umls_edges, batch_format="pyarrow", zero_copy_batch=True),
        _edges_from(t["genes"], "UMLS", "source", "Gene", "gene"),
        _edges_from(t["snomed"], "UMLS", "source", "SnomedConcept", "saui"),
        _edges_from(t["clinical_features"], "UMLS", "source", "ClinicalFeature", "feat_cui"),
        _edges_from(t["proteins"], "Gene", "source", "Protein", "entry"),
        _edges_from(t["go"], "Protein", "source", "GO", "go_id"),
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    return graph.dedup_triples(u)


def _node_union(t: dict[str, rd.Dataset], conv_ids: rd.Dataset) -> rd.Dataset:
    conv_nodes = conv_ids.map_batches(
        lambda b: graph.node_rows(
            b.group_by("conv_id").aggregate([]), "Conversation", "conv_id", "conv_id", None
        ),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    parts = [
        conv_nodes,
        t["conv_entities"].map_batches(
            lambda b: graph.node_rows(b, "label", "norm_surface", "norm_surface", None),
            batch_format="pyarrow", zero_copy_batch=True),
        t["links"].map_batches(
            lambda b: graph.node_rows(b, "UMLS", "cui", "name", "definition"),
            batch_format="pyarrow", zero_copy_batch=True),
        t["genes"].map_batches(
            lambda b: graph.node_rows(b, "Gene", "gene", "gene", None),
            batch_format="pyarrow", zero_copy_batch=True),
        t["snomed"].map_batches(
            lambda b: graph.node_rows(b, "SnomedConcept", "saui", "snomed_text", None),
            batch_format="pyarrow", zero_copy_batch=True),
        t["clinical_features"].map_batches(
            lambda b: graph.node_rows(b, "ClinicalFeature", "feat_cui", "name", "definition"),
            batch_format="pyarrow", zero_copy_batch=True),
        t["proteins"].map_batches(
            lambda b: graph.node_rows(b, "Protein", "entry", "name", None),
            batch_format="pyarrow", zero_copy_batch=True),
        t["go"].map_batches(
            lambda b: graph.node_rows(b, "GO", "go_id", "go_name", None),
            batch_format="pyarrow", zero_copy_batch=True),
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.union(p)
    return graph.dedup_nodes(u)


def edges(sf_dir: str) -> rd.Dataset:
    """The full deduplicated (subj, pred, obj) edge set — the triple surface
    judged against the reference semantics (P/R on the set)."""
    m = mention_rows(sf_dir).materialize()
    return _edge_union(graph_tables(m))


triples = edges  # the edge set IS the emitted triple set


def nodes(sf_dir: str) -> rd.Dataset:
    """Deduplicated node table (canonical_id, node_label, name, definition)."""
    m = mention_rows(sf_dir).materialize()
    return _node_union(graph_tables(m), transcripts(sf_dir, ["conv_id"]))


# ---------------------------------------------------------------------------
# Consuming entry point: resumable build
# ---------------------------------------------------------------------------

def build_graph(sf_dir: str, out_dir: str) -> dict:
    """Run the full pipeline and materialize mentions/nodes/edges Parquet.

    Stage 1 (mentions) runs PER INPUT SHARD with manifest lineage — a
    restarted job skips shards whose output is committed.  Stages 2+ are
    global (selection needs corpus-wide counts), stream from the committed
    mention Parquet, and commit atomically.  Returns summary metrics.
    """
    man = Manifest(os.path.join(out_dir, "manifest.jsonl"))
    shards = readers.transcript_files(sf_dir)

    def _nrows(path: str) -> int:
        # parquet footer metadata — no data read, no Ray job
        import pyarrow.parquet as pq

        files = [path] if path.endswith(".parquet") else sorted(glob.glob(os.path.join(path, "*.parquet")))
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    done = man.completed("mentions")
    mention_dirs, n_turns = [], 0
    pending = []
    for shard_path in shards:
        part = os.path.basename(shard_path).replace(".parquet", "")
        if part in done:
            mention_dirs.append(done[part]["output_path"])
            n_turns += done[part].get("rows_in", 0)
        else:
            pending.append((part, shard_path))

    if pending:
        # ONE pipelined execution over every pending shard (per-shard
        # sequential runs would pay actor-pool startup per shard); per-shard
        # output partitions are preserved via a hive-partitioned write on the
        # carried `shard` provenance column, so resume granularity is intact.
        ds = rd.read_parquet(
            [p for _, p in pending],
            columns=["conv_id", "turn_idx", "text"],
            include_paths=True,
        ).map_batches(
            lambda t: t.append_column(
                "shard",
                pc.replace_substring_regex(
                    pc.replace_substring_regex(t["path"], r"^.*/", ""), r"\.parquet$", ""
                ),
            ).drop_columns(["path"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        det = mentions.detect_mentions(ds, keep_shard=True)
        tmp = os.path.join(out_dir, "mentions.tmp")
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        det.write_parquet(tmp, partition_cols=["shard"])
        os.makedirs(os.path.join(out_dir, "mentions"), exist_ok=True)
        for part, shard_path in pending:
            src = os.path.join(tmp, f"shard={part}")
            dst = os.path.join(out_dir, "mentions", part)
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.exists(src):
                os.rename(src, dst)
            else:  # shard produced zero mentions
                os.makedirs(dst, exist_ok=True)
            rows_in, rows_out = _nrows(shard_path), _nrows(dst)
            man.record(
                "mentions", part, "done",
                input_shard=shard_path, rows_in=rows_in, rows_out=rows_out, output_path=dst,
            )
            mention_dirs.append(dst)
            n_turns += rows_in
        shutil.rmtree(tmp, ignore_errors=True)

    mention_files = [f for d in mention_dirs for f in sorted(glob.glob(os.path.join(d, "*.parquet")))]
    mention_ds = rd.read_parquet(mention_files)
    t = graph_tables(mention_ds)

    def _commit(stage: str, ds: rd.Dataset) -> int:
        prior = man.completed(stage)
        if stage in prior:
            return prior[stage].get("rows_out", 0)
        out = os.path.join(out_dir, stage)
        atomic_write_parquet(ds, out)
        n = _nrows(out)
        man.record(stage, stage, "done", rows_out=n, output_path=out)
        return n

    n_edges = _commit("edges", _edge_union(t))
    n_nodes = _commit("nodes", _node_union(t, transcripts(sf_dir, ["conv_id"])))
    return {"n_turns": n_turns, "n_edges": n_edges, "n_nodes": n_nodes, "out_dir": out_dir}
