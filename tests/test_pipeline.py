"""End-to-end pipeline tests at sf0.001: oracle parity, invariants, resume.

The serial oracle is DuckDB executing the reference operator chain in SQL
(SURVEY.md §5.2) over the SAME generated corpus; the Ray pipeline's outputs
must match exactly (set semantics — the reference's own row order is
nondeterministic, entityrecognition.py:44,61)."""

import glob
import shutil

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

import importlib.util
import sys

spec = importlib.util.spec_from_file_location("_ray_entry", "/root/repo/__ray_entry__.py")
_entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_entry)

from medknowledgegraph_ray.pipelines import kg


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _oracle(name: str, sf_dir: str) -> pd.DataFrame:
    sf_name = sf_dir.rstrip("/").split("/")[-1]
    sql = _entry.oracle_sql()[name].replace("/sf0.01/", f"/{sf_name}/")
    con = duckdb.connect()
    try:
        return con.sql(sql).df()
    finally:
        con.close()


@pytest.mark.parametrize(
    "name", ["kg_mentions", "kg_links", "kg_top_cuis", "kg_edges", "kg_nodes",
             "doc_typo_pairs"]
)
def test_oracle_parity(name, sf_dir):
    eng = _entry.queries()[name](sf_dir).to_pandas()
    ora = _oracle(name, sf_dir)
    a, b = _norm(eng), _norm(ora)
    assert a.shape == b.shape, f"{name}: {a.shape} != {b.shape}"
    assert a.equals(b), f"{name}: value mismatch"


def test_graph_tables_streaming_parity(sf_dir):
    """The large-vocab streaming path (no driver funnel) must be
    row-identical to the default funnel path for edges, nodes, and links
    (VERDICT r2 item 4)."""
    from medknowledgegraph_ray import config

    def rows(ds):
        return sorted(map(tuple, ds.to_pandas().astype(str).values.tolist()))

    m = kg.mention_rows(sf_dir)
    t_funnel = kg.graph_tables(m)
    t_stream = kg.graph_tables(m, vocab_size=config.VOCAB_FUNNEL_MAX + 1)
    assert "umls_edges" in t_stream and "umls_edges" not in t_funnel
    assert rows(t_funnel["links"]) == rows(t_stream["links"])
    conv = kg._scope_conv_ids_ds(sf_dir, None)
    assert rows(kg._edge_union(t_funnel)) == rows(kg._edge_union(t_stream))
    assert rows(kg._node_union(t_funnel, conv)) == rows(
        kg._node_union(t_stream, conv)
    )


def test_term_scope_predicate_parity(sf_dir, monkeypatch):
    """Above SCOPE_BROADCAST_MAX matching ids, an uncapped term scope stays
    a distributed predicate (TermScope); the filtered row set must equal
    the broadcast is_in semi-join's, on both the conv-local and the
    sorted fallback paths (VERDICT r2 item 8)."""
    from medknowledgegraph_ray import config

    term = "xelorvan"

    def rows(ds):
        return sorted(map(tuple, ds.to_pandas().astype(str).values.tolist()))

    t = lambda: kg.transcripts(sf_dir, ["conv_id", "turn_idx", "text"])
    scope_list = kg.conv_scope_ids(sf_dir, term, None)
    assert isinstance(scope_list, list) and scope_list
    want = rows(kg.filter_convs(t(), scope_list))

    monkeypatch.setattr(config, "SCOPE_BROADCAST_MAX", 0)
    scope_pred = kg.conv_scope_ids(sf_dir, term, None)
    assert isinstance(scope_pred, kg.TermScope)
    assert rows(kg.filter_convs(t(), scope_pred)) == want
    # the scope-ids dataset (SearchTerm edge seeding) matches the list
    from medknowledgegraph_ray.stages.distinct import distinct as _dd

    ids = sorted(
        r["conv_id"]
        for r in _dd(kg._scope_conv_ids_ds(sf_dir, scope_pred), ["conv_id"]).take_all()
    )
    assert ids == scope_list
    # layout-independent fallback (sort first, then the same block pass)
    monkeypatch.setattr(config, "CONV_LOCAL_SHARDS", False)
    assert rows(kg.filter_convs(t(), kg.TermScope(term))) == want


def test_entity_counts_streaming_large_vocab():
    """A 10^5-surface vocabulary takes the sorted-exchange count path and
    matches the funnel path row-for-row; top_entities' per-block partial
    top-k keeps its driver pull k-bounded."""
    import pyarrow as pa

    from medknowledgegraph_ray.stages import canonicalize

    n = 100_000
    surf = [f"s{i:06d}" for i in range(n)] * 2
    convs = [f"c{j}" for j in (0, 1) for _ in range(n)]
    ds = rd.from_arrow(
        pa.table({
            "conv_id": pa.array(convs, pa.string()),
            "norm_surface": pa.array(surf, pa.string()),
            "label": pa.array(["DISEASE"] * 2 * n, pa.string()),
        })
    ).repartition(8)
    funnel = canonicalize.entity_counts(ds).to_pandas()
    stream = canonicalize.entity_counts(ds, vocab_hint=n).to_pandas()

    def norm(df):
        return df[sorted(df.columns)].sort_values("norm_surface").reset_index(drop=True)

    a, b = norm(funnel), norm(stream)
    assert a.shape == (n, 3) and a.equals(b)
    top = canonicalize.top_entities(
        canonicalize.entity_counts(ds, vocab_hint=n), k=15
    ).to_pandas()
    # all counts tie at 2 → deterministic lexicographic head
    assert top["norm_surface"].tolist() == [f"s{i:06d}" for i in range(15)]


def test_triple_set_precision_recall(sf_dir):
    """P/R of the emitted triple set vs the oracle triple set must be ≥0.95
    (BASELINE.json north_rule); by construction it is exactly 1.0."""
    eng = set(map(tuple, _entry.queries()["kg_edges"](sf_dir).to_pandas().values.tolist()))
    ora = set(map(tuple, _oracle("kg_edges", sf_dir).values.tolist()))
    tp = len(eng & ora)
    precision = tp / len(eng)
    recall = tp / len(ora)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)


def test_per_turn_text_equality(sf_dir):
    got = (
        kg.turn_roundtrip(sf_dir)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    from medknowledgegraph_ray import config as _cfg

    src_files = sorted(glob.glob(_cfg.gen_dir(sf_dir) + "/*.parquet"))
    want = (
        pd.concat([pq.read_table(f, columns=["conv_id", "turn_idx", "text"]).to_pandas() for f in src_files])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_build_graph_resume(tmp_path, sf_dir):
    out = str(tmp_path / "kg")
    r1 = kg.build_graph(sf_dir, out)
    edges1 = sorted(map(tuple, rd.read_parquet(out + "/edges").to_pandas().values.tolist()))

    # rerun: everything committed → skipped, same result
    r2 = kg.build_graph(sf_dir, out)
    assert r2["n_edges"] == r1["n_edges"]

    # lose a mention bucket → only it recomputes; identical triple set
    victim = sorted(glob.glob(out + "/mentions/b*"))[0]
    shutil.rmtree(victim)
    shutil.rmtree(out + "/edges")
    shutil.rmtree(out + "/nodes")
    r3 = kg.build_graph(sf_dir, out)
    edges3 = sorted(map(tuple, rd.read_parquet(out + "/edges").to_pandas().values.tolist()))
    assert edges3 == edges1
    assert r3["n_nodes"] == r1["n_nodes"]


def test_failed_stage_is_recorded_in_manifest(tmp_path, sf_dir, monkeypatch):
    """A failing stage must fail LOUDLY and leave a 'failed' lineage row —
    never the reference's silent swallow (neo4jconnector.py:232-242)."""
    import json

    from medknowledgegraph_ray.pipelines import kg as kgmod

    import pyarrow.parquet as pq_mod

    out = str(tmp_path / "kg_fail")
    calls = {"n": 0}
    real = pq_mod.write_table

    def boom(tab, path, **kw):
        # fail the fused path's driver-side edge/node commit writes
        if "kg_fail" in str(path):
            calls["n"] += 1
            raise RuntimeError("disk gone")
        return real(tab, path, **kw)

    monkeypatch.setattr(pq_mod, "write_table", boom)
    with pytest.raises(RuntimeError, match="disk gone"):
        kgmod.build_graph(sf_dir, out)
    rows = [json.loads(l) for l in open(out + "/manifest.jsonl")]
    failed = [r for r in rows if r["status"] == "failed"]
    assert failed and "disk gone" in failed[0]["error"] and calls["n"] > 0

    # retry with the failure healed: converges to the normal result
    monkeypatch.setattr(pq_mod, "write_table", real)
    res = kgmod.build_graph(sf_dir, out)
    assert res["n_edges"] > 0 and res["n_nodes"] > 0


def test_actor_pool_detector_parity(sf_dir):
    """The actor-pool detector path (the production slot for a
    minutes-to-load NER model — reference manager.py:22-24) must emit
    exactly the task-cache path's rows."""
    from medknowledgegraph_ray.pipelines import kg as kgmod

    task = kgmod.mention_rows(sf_dir).to_pandas()
    actor = kgmod.mention_rows(sf_dir, stateful="actor").to_pandas()
    assert _norm(task).equals(_norm(actor))


def _load_counter():
    import ray

    @ray.remote
    class Counter:
        def __init__(self):
            self.loads = 0
            self.killed = False

        def record_load(self):
            self.loads += 1
            return self.loads

        def loads_so_far(self):
            return self.loads

        def claim_kill(self):
            # exactly-once kill token for the crash test
            if self.killed:
                return False
            self.killed = True
            return True

    return Counter.options(name="detector_rehearsal_counter").remote()


def test_heavy_state_actor_rehearsal(sf_dir):
    """The production heavy-model rehearsal (VERDICT r3 missing #1): a
    detector double with slow, ~100 MB state driven through
    detect_mentions(stateful="actor") —

    - state loads ONCE PER ACTOR (load counter == pool size, not batches),
    - output is row-identical to the task path,
    - one actor dying MID-RUN (os._exit — a hard crash, not an exception)
      is recovered by Ray and the job still completes correctly, proving
      the restart path works now that actor state is rebuilt from the KB
      path instead of an object-store ref (Ray issue 53727)."""
    import ray

    from medknowledgegraph_ray.pipelines import kg as kgmod
    from medknowledgegraph_ray.stages import mentions as m

    counter = _load_counter()

    class HeavyDetector(m.MentionDetector):
        def __init__(self, vocab_ref=None):
            import time as _t

            import numpy as _np

            _t.sleep(1.0)  # the minutes-load analog
            self._ballast = _np.ones(13_000_000, dtype=_np.float64)  # ~100 MB
            super().__init__(vocab_ref)
            c = ray.get_actor("detector_rehearsal_counter")
            ray.get(c.record_load.remote())

        def __call__(self, batch):
            c = ray.get_actor("detector_rehearsal_counter")
            if ray.get(c.claim_kill.remote()):
                import os as _os

                _os._exit(1)  # hard-kill exactly one actor mid-run
            return super().__call__(batch)

    ds = kgmod.transcripts(sf_dir, ["conv_id", "turn_idx", "text"])
    pool = (2, 2)
    out = (
        ds.select_columns(["conv_id", "turn_idx", "text"])
        .repartition(4)
        .map_batches(
            HeavyDetector,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=2048,
            concurrency=pool,
        )
        .to_pandas()
    )
    task = kgmod.mention_rows(sf_dir).to_pandas()
    assert _norm(task).equals(_norm(out))
    loads = ray.get(counter.loads_so_far.remote())
    # one load per actor, plus reloads for the recovered actor — never one
    # per batch (4 blocks × many batches would show immediately)
    assert 2 <= loads <= 4, loads
    ray.kill(counter)


def test_warm_pool_parity_and_crash_recovery(sf_dir):
    """The session-lifetime warm detector pool (mentions.warm_detector_pool
    + detect_mentions(reuse_pool=True)): row-identical to the task path,
    the SAME pool object is reused across executions (zero re-spawn), and
    a hard-killed warm actor is restarted by Ray (max_restarts) with the
    in-flight call replayed (max_task_retries) — the run still completes
    correctly."""
    import ray

    from medknowledgegraph_ray.pipelines import kg as kgmod
    from medknowledgegraph_ray.stages import mentions as m

    task = kgmod.mention_rows(sf_dir).to_pandas()
    warm1 = kgmod.mention_rows(sf_dir, stateful="actor", reuse_pool=True).to_pandas()
    assert _norm(task).equals(_norm(warm1))
    pool_before = m._WARM_POOL["actors"]
    assert pool_before is not None and len(pool_before) >= 1
    # second execution: the pool object must be THE SAME handles (reused)
    warm2 = kgmod.mention_rows(sf_dir, stateful="actor", reuse_pool=True).to_pandas()
    assert m._WARM_POOL["actors"] is pool_before
    assert _norm(task).equals(_norm(warm2))
    # hard-kill one warm actor; Ray restarts it and replays the call
    ray.kill(pool_before[0], no_restart=False)
    warm3 = kgmod.mention_rows(sf_dir, stateful="actor", reuse_pool=True).to_pandas()
    assert _norm(task).equals(_norm(warm3))


def test_entity_pmi_self_consistent_and_symmetric(sf_dir):
    """kg.entity_pmi at sf0.001: canonical pair order, pmi recomputable
    from its own integer columns, marginals consistent with the distinct
    (conv, surface) incidence.  (Oracle exactness is checked at sf0.01 by
    tools/check_oracles.py — the kg SQL views are pinned to that corpus.)"""
    import math

    from medknowledgegraph_ray.pipelines import kg

    df = kg.entity_pmi(sf_dir).to_pandas()
    assert len(df) > 0
    assert (df["ent_a"] < df["ent_b"]).all()
    assert (df["n_xy"] >= 2).all()
    assert df["n_convs"].nunique() == 1
    n = int(df["n_convs"].iloc[0])
    for _, r in df.head(50).iterrows():
        want = int(round(math.log(
            (float(r["n_xy"]) * float(n))
            / (float(r["n_x"]) * float(r["n_y"]))) * 1e6))
        assert int(r["pmi_e6"]) == want
    # marginal spot-check against the incidence derived independently
    ce = kg.conv_entities(sf_dir).to_pandas()[["conv_id", "norm_surface"]]
    ce = ce.drop_duplicates()
    marg = ce.groupby("norm_surface").size()
    top = df.sort_values(["n_xy", "ent_a", "ent_b"],
                         ascending=[False, True, True]).iloc[0]
    assert int(top["n_x"]) == int(marg[top["ent_a"]])
    assert int(top["n_y"]) == int(marg[top["ent_b"]])


def test_entity_components_structure(sf_dir):
    """kg.entity_components at sf0.001: labels are cluster-internal minima
    and agree with a driver-side union-find over the same pmi edge list."""
    from medknowledgegraph_ray.pipelines import kg

    edges = kg.entity_pmi(sf_dir).to_pandas()[["ent_a", "ent_b"]]
    got = kg.entity_components(sf_dir).to_pandas()
    lab = dict(zip(got["entity"], got["component"]))
    # reference union-find on strings
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges.itertuples(index=False):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict = {}
    for e in set(edges["ent_a"]) | set(edges["ent_b"]):
        groups.setdefault(find(e), set()).add(e)
    want = {e: min(g) for g in groups.values() for e in g}
    assert lab == want
