"""CLI entry point — the `ray job submit` / Flask-route analog.

The reference exposes POST /buildGraph, GET /searchTerms, GET /intersection
(/root/reference/pymedgraph/app.py:46-97); here:

    python -m medknowledgegraph_ray.cli build-graph --request job.json
    python -m medknowledgegraph_ray.cli search-terms --sf-dir DIR
    python -m medknowledgegraph_ray.cli intersection --sf-dir DIR --level Gene

This module OWNS the Ray session (guarded init + shutdown); package code
never initialises Ray.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="medknowledgegraph_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    bg = sub.add_parser("build-graph", help="run the KG pipeline from a JSON request")
    bg.add_argument("--request", required=True, help="path to a JSON job request, or '-' for stdin")

    st = sub.add_parser("search-terms", help="list the graph's entity terms (top surfaces)")
    st.add_argument("--sf-dir", required=True)

    it = sub.add_parser("intersection", help="pairwise shared-node counts between terms")
    it.add_argument("--sf-dir", required=True)
    it.add_argument("--level", default="Gene", choices=["UMLS", "Gene", "Protein", "GO"])

    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        from .pipelines import kg
        from . import jobs

        if args.cmd == "build-graph":
            raw = sys.stdin.read() if args.request == "-" else open(args.request).read()
            job = jobs.parse_request(raw)
            print(json.dumps(jobs.run_job(job)))
        elif args.cmd == "search-terms":
            terms = sorted(r["norm_surface"] for r in kg.top_entities(args.sf_dir).take_all())
            print(json.dumps(terms))
        elif args.cmd == "intersection":
            rows = kg.intersection(args.sf_dir, args.level).to_pandas()
            print(rows.sort_values(["term_a", "term_b"]).to_json(orient="records"))
    finally:
        if owns_session:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
