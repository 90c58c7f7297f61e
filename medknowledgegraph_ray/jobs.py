"""Job request parsing, pipeline-DAG validation, and dispatch.

The manager surface of the reference (/root/reference/pymedgraph/manager.py):
`_parse_request` (:131-191) — required-arg check, term lowercasing, per-pipe
defaults — and `_check_pipeline` (:220-240) — reverse-hierarchy predecessor
validation that raises on a gap (running `uniprot` without `medgen` is a
config error, not a silent no-op).  The Flask routes (app.py:46-97) become
the CLI in `medknowledgegraph_ray.cli`; `delete_graph` (neo4jconnector.py:
244-256) becomes deleting the output directory before the run.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass, field
from typing import Any

from . import config

# Stage order (manager.py:18 PIPE_HIERARCHY analog).  `ner` covers mention
# detection + candidate linking (entityrecognition.py); `medgen` the CUI
# selection + gene/SNOMED/clinical-feature enrichment; `uniprot` the
# protein/GO enrichment; `graph` the node/edge materialization.
PIPE_HIERARCHY = ("ner", "medgen", "uniprot", "graph")

# `graph` only needs `ner` (conversation→entity→UMLS edges exist without
# enrichment); enrichment stages chain strictly.
_PREDECESSOR = {"ner": None, "medgen": "ner", "uniprot": "medgen", "graph": "ner"}


class RequestError(ValueError):
    """Bad job request (missing args, unknown keys, dependency gap)."""


@dataclass
class JobRequest:
    sf_dir: str
    out_dir: str
    term: str | None = None          # optional focus term, lowercased (manager.py:191)
    pipelines: dict[str, bool] = field(
        default_factory=lambda: {p: True for p in PIPE_HIERARCHY}
    )
    max_conversations: int | None = None  # max_articles cap analog (fetch_ncbi.py:50-51)
    top_entities: int = config.TOP_ENTITIES
    top_cuis: int = config.TOP_CUIS
    score_min: float = config.SCORE_MIN
    delete_existing: bool = False    # delete_graph analog (neo4jconnector.py:244-256)


def parse_request(req: dict | str) -> JobRequest:
    """dict or JSON string → validated JobRequest (manager.py:131-191)."""
    if isinstance(req, str):
        try:
            req = json.loads(req)
        except json.JSONDecodeError as e:
            raise RequestError(f"request is not valid JSON: {e}") from e
    if not isinstance(req, dict):
        raise RequestError(f"request must be a dict, got {type(req).__name__}")

    for required in ("sf_dir", "out_dir"):
        if required not in req:
            raise RequestError(f"missing required argument {required!r}")

    known = {
        "sf_dir", "out_dir", "term", "pipelines", "max_conversations",
        "top_entities", "top_cuis", "score_min", "delete_existing",
    }
    unknown = set(req) - known
    if unknown:
        raise RequestError(f"unknown request keys: {sorted(unknown)}")

    pipelines = {p: True for p in PIPE_HIERARCHY}
    for name, on in (req.get("pipelines") or {}).items():
        if name not in pipelines:
            raise RequestError(
                f"unknown pipeline {name!r}; valid: {list(PIPE_HIERARCHY)}"
            )
        pipelines[name] = bool(on)

    job = JobRequest(
        sf_dir=req["sf_dir"],
        out_dir=req["out_dir"],
        term=(req.get("term") or None) and str(req["term"]).lower(),
        pipelines=pipelines,
        max_conversations=req.get("max_conversations"),
        top_entities=int(req.get("top_entities", config.TOP_ENTITIES)),
        top_cuis=int(req.get("top_cuis", config.TOP_CUIS)),
        score_min=float(req.get("score_min", config.SCORE_MIN)),
        delete_existing=bool(req.get("delete_existing", False)),
    )
    check_pipelines(job.pipelines)
    return job


def check_pipelines(pipelines: dict[str, bool]) -> None:
    """Predecessor validation (manager.py:220-240): every enabled stage's
    predecessor must be enabled; raises on a gap."""
    for name, on in pipelines.items():
        if not on:
            continue
        pred = _PREDECESSOR[name]
        if pred is not None and not pipelines.get(pred, False):
            raise RequestError(
                f"pipeline {name!r} requires {pred!r} to run (dependency gap)"
            )


def run_job(job: JobRequest) -> dict[str, Any]:
    """Execute the enabled stages; returns summary metrics per stage.

    Ray must already be initialised by the caller (driver/CLI/test) — this
    function never calls ray.init().
    """
    import glob

    import pyarrow.parquet as pq

    from .pipelines import kg
    from .state.manifest import atomic_write_parquet

    if job.delete_existing and os.path.isdir(job.out_dir):
        shutil.rmtree(job.out_dir)
    os.makedirs(job.out_dir, exist_ok=True)

    knobs = dict(
        top_entities=job.top_entities, top_cuis=job.top_cuis, score_min=job.score_min
    )
    summary: dict[str, Any] = {"out_dir": job.out_dir}
    if all(job.pipelines.get(p) for p in PIPE_HIERARCHY):
        # full run: the resumable manifest path
        summary.update(
            kg.build_graph(
                job.sf_dir, job.out_dir,
                term=job.term, max_conversations=job.max_conversations, **knobs,
            )
        )
        return summary

    def _write(name: str, ds) -> None:
        out = os.path.join(job.out_dir, name)
        atomic_write_parquet(ds, out)
        summary[f"n_{name}"] = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(out, "*.parquet"))
        )

    # the detector actor pool runs ONCE: graph_tables consumes the mention
    # dataset a single time (through its materialized conv-entity distinct)
    # and every enabled stage writes from the shared table dict
    scope = kg.conv_scope_ids(job.sf_dir, job.term, job.max_conversations)
    mention_ds = kg.mention_rows(job.sf_dir, scope=scope)
    if job.pipelines["ner"]:
        mention_ds = mention_ds.materialize()  # also written below, avoid a 2nd scan
    t = kg.graph_tables(mention_ds, **knobs)

    if job.pipelines["ner"]:
        _write("mentions", mention_ds)
        _write("links", t["links"])
    if job.pipelines["medgen"]:
        _write("genes", t["genes"])
        _write("snomed", t["snomed"])
        _write("clinical_features", t["clinical_features"])
    if job.pipelines["uniprot"]:
        _write("proteins", t["proteins"])
        _write("go", t["go"])
    if job.pipelines["graph"]:
        conv_ids = kg._scope_conv_ids_ds(job.sf_dir, scope)
        _write("edges", kg._edge_union(
            t, term=job.term, conv_ids=conv_ids if job.term is not None else None))
        _write("nodes", kg._node_union(t, conv_ids, term=job.term))
    return summary
