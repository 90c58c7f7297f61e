"""Training-data pipeline operators: unit behavior on crafted tables plus
oracle parity at sf0.001 for the SQL-checkable ones."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

import importlib.util

spec = importlib.util.spec_from_file_location("_ray_entry_dp", "/root/repo/__ray_entry__.py")
_entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_entry)

from medknowledgegraph_ray.stages import ann, dedupe, rangejoin, textstats, windows

SQL_CHECKED = [
    "doc_stats", "doc_lang_id", "doc_quality", "dedup_exact", "dedup_minhash",
    "dedup_ngram", "ann_topk", "mm_metadata", "ev_tumbling", "ev_sliding", "ev_top_events",
    "ev_sessionize", "ev_asof_prev", "ev_range_join", "doc_tokens_bpe", "doc_sample",
    "doc_split", "doc_fingerprints", "dedup_simhash", "dedup_simhash_groups",
    "dedup_components", "doc_tfidf", "doc_shuffle", "ev_running",
    "ev_histogram", "doc_keep", "agg_rollup", "join_customer_orders",
    "ev_global_quantiles",
    "doc_vocab", "ev_user_quantiles", "ev_asof_state", "doc_inverted_index",
    "agg_lineitem", "join_top_customers", "agg_orders_by_status",
    "scan_filter_pushdown", "join_region_counts",
    "doc_gopher", "doc_pack", "ev_rank", "ev_pivot", "ev_user_types",
    "ev_props", "ev_lead", "ev_quantiles_cont", "agg_cube",
    "doc_normalize", "doc_repetition", "doc_bigrams",
    "ev_latest", "join_left_counts", "ev_ntile", "ev_moments", "doc_sample_k",
    "join_revenue_region", "corpus_export", "join_full_users",
    "doc_decontaminate", "doc_logprob", "ev_funnel", "ev_retention",
    "dedup_embedding", "ev_zscore", "doc_stratified", "ev_percentile",
    "doc_pii", "doc_urls", "join_anti_customers", "doc_top_tokens",
    "ev_user_paths", "doc_seg_dedup", "dedup_canonical", "doc_cap_per_lang",
    "dedup_incremental", "doc_iqr_filter", "join_semi_customers", "ev_mode",
    "join_pairs_orders",
    "ev_gaps", "ev_trend", "doc_length_rank", "join_bloom_orders",
    "join_promo_ratio", "ev_window_users", "ev_type_pairs",
    "doc_weighted_sample", "ev_time_window", "agg_grouping_sets",
    "ev_coverage", "dedup_cluster_sizes", "ev_transitions",
    "ev_running_distinct",
    "agg_order_dist", "join_big_orders", "agg_dormant_customers",
    "join_nation_volume", "join_ship_priority", "join_returned_items",
    "doc_pmi", "join_local_supply", "join_market_share",
    "join_disjunctive_rev",
    "join_min_cost_part", "agg_priority_returns", "join_product_profit",
    "join_top_supplier", "join_small_qty_rev", "join_sole_returns",
    "doc_entropy", "doc_epochs",
    "agg_forecast_rev", "agg_line_priority", "agg_part_suppliers",
    "join_heavy_suppliers", "doc_chunk",
    "ev_mad", "ev_winsorize", "emb_dim_stats", "doc_needle_hits",
    "scan_unpivot", "graph_pagerank", "graph_triangles", "doc_dup_spans",
    "doc_bm25", "graph_kcore", "emb_normalize", "doc_bigram_lm",
    "doc_negatives", "scan_skyline", "ev_assoc_rules", "ev_window_dedup",
    "mm_image", "graph_degree_hist", "mm_png",
    "doc_boilerplate", "graph_jaccard", "dedup_simhash_pairs",
    "ev_histogram_eqdepth", "ev_rolling_median", "emb_gram",
    "graph_link_predict", "ev_overlap_pairs",
]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_oracle_parity_sf0001(name, sf_dir):
    res = _entry.queries()[name](sf_dir)
    eng = _norm(res.to_pandas() if hasattr(res, "to_pandas") else res)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    ora = _norm(con.sql(_entry.oracle_sql()[name]).df())
    con.close()
    assert eng.shape == ora.shape, (eng.shape, ora.shape)
    assert list(eng.dtypes) == list(ora.dtypes), (eng.dtypes, ora.dtypes)
    assert eng.equals(ora)


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_exact_dedup_keeps_min_doc_id():
    ds = _docs([(5, "same text"), (2, "same text"), (9, "other")])
    out = dedupe.exact_dedup(ds).to_pandas().set_index("keep_doc_id")
    assert out.loc[2, "n_dups"] == 2 and out.loc[9, "n_dups"] == 1


def test_minhash_finds_exact_dup_and_skips_disjoint():
    a = "alpha beta gamma delta epsilon zeta eta theta " * 5
    b = "one two three four five six seven eight nine ten " * 5
    ds = _docs([(1, a), (2, a), (3, b)])
    out = dedupe.minhash_dedup(ds).to_pandas()
    assert set(map(tuple, out[["doc_a", "doc_b"]].values.tolist())) == {(1, 2)}
    assert out["jaccard"].iloc[0] == 1.0


def test_ngram_jaccard_recall_one_vs_brute_force():
    """The prefix-filter join must find EVERY pair ≥ threshold — including
    mid-range Jaccard (0.5–0.8) pairs where the 16×4 LSH band curve has
    recall well below 1 — and nothing else, matching brute force exactly."""
    import itertools

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    rows = [(i, f"doc {i} " + " ".join(f"tok{i}_{j}" for j in range(30)))
            for i in range(40)]
    rows += [
        (100, base),
        (101, base + " extra one two"),                       # high J
        (102, base + " more words here now five six seven"),  # mid J
        (103, "short"),                                       # no shingles
    ]
    out = dedupe.ngram_jaccard_dedup(_docs(rows), threshold=0.5).to_pandas()
    got = sorted(zip(out["doc_a"], out["doc_b"], out["jaccard"]))
    exp = []
    for (i, a), (j, b) in itertools.combinations(rows, 2):
        sa, sb = dedupe._ngram_set(a), dedupe._ngram_set(b)
        jv = len(sa & sb) / len(sa | sb) if sa and sb else 0.0
        if jv >= 0.5:
            exp.append((min(i, j), max(i, j), round(jv, 6)))
    assert got == sorted(exp) and len(exp) >= 2
    # at least one planted pair sits below LSH-saturation territory
    assert any(j < 0.8 for _, _, j in exp)


def test_embedding_near_dups_exact_vs_allpairs(sf_dir):
    """The multi-band hyperplane LSH + sorted-exchange cosine verify must
    equal brute-force all-pairs cosine at the oracle threshold."""
    import pyarrow.parquet as pq
    from medknowledgegraph_ray.sources import readers

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist())
    m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    norms = np.sqrt((m * m).sum(1))
    sims = (m @ m.T) / np.outer(norms, norms)
    iu = np.triu_indices(len(m), k=1)
    keep = sims[iu] >= 0.4
    exp = sorted(
        (int(a), int(b), float(c))
        for a, b, c in zip(ids[iu[0][keep]], ids[iu[1][keep]], np.round(sims[iu][keep], 6))
    )
    emb = readers.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = dedupe.embedding_near_dups(emb, threshold=0.4, dim=64).to_pandas()
    got = sorted(zip(out["vec_a"], out["vec_b"], out["cosine"]))
    assert got == exp and len(exp) > 0


def test_embedding_verify_paths_row_identical(sf_dir, monkeypatch):
    """Driver-side and distributed sorted-exchange cosine verifies agree."""
    from medknowledgegraph_ray.sources import readers

    emb = lambda: readers.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])  # noqa: E731
    small = _norm(dedupe.embedding_near_dups(emb(), threshold=0.4, dim=64).to_pandas())
    monkeypatch.setattr(dedupe, "SMALL_VERIFY_IDS", -1)  # force distributed
    big = _norm(dedupe.embedding_near_dups(emb(), threshold=0.4, dim=64).to_pandas())
    assert small.equals(big) and len(small) > 0


def test_embedding_near_dups_bucket_skew_guard(monkeypatch):
    """A degenerate bucket (many identical vectors) trips the loud
    MAX_BUCKET guard instead of silently doing all-pairs work — the
    embedding path now rides the same guarded machinery as text LSH."""
    vecs = np.tile(np.arange(1.0, 9.0), (30, 1))  # 30 identical vectors
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(30), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64())),
    }))
    monkeypatch.setattr(dedupe, "MAX_BUCKET", 10)
    with pytest.raises(Exception, match="MAX_BUCKET"):
        dedupe.embedding_near_dups(emb, threshold=0.95, dim=8).materialize()


def test_zscore_matches_numpy_per_user():
    """zscore_events equals the direct numpy sample-z computed per user."""
    rng = np.random.RandomState(5)
    base = 1_700_000_000_000_000
    rows = [(i, int(rng.randint(0, 5)), pd.Timestamp(base + i, unit="us"),
             float(rng.uniform(0, 500))) for i in range(200)]
    rows.append((200, 99, pd.Timestamp(base, unit="us"), 1.0))  # n=1 user
    out = (
        windows.zscore_events(_events(rows).repartition(3))
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    v = np.round(df["value"].to_numpy() * 1000).astype(np.int64)
    exp = np.zeros(len(df))
    for u, g in df.assign(v=v).groupby("user_id"):
        x = g["v"].to_numpy().astype(np.int64)
        n = len(x)
        if n < 2:
            continue
        s1, s2 = int(x.sum()), int((x * x).sum())
        var = (float(s2) - float(s1) * float(s1) / n) / (n - 1)
        if not var > 0:
            continue
        exp[g.index] = np.round((x.astype(np.float64) - float(s1) / n) / np.sqrt(var), 6)
    assert out["z"].to_numpy().tolist() == exp[out["event_id"].to_numpy()].tolist()
    assert (out.loc[out["user_id"] == 99, "z"] == 0.0).all()


def test_stratified_sample_deterministic_and_rate_bounded():
    from medknowledgegraph_ray.stages import shuffle as sh

    df = pd.DataFrame({
        "doc_id": pd.array(range(20000), dtype="int64"),
        "lang": ["en", "fr"] * 10000,
    })
    ds = lambda: rd.from_pandas(df).repartition(4)  # noqa: E731
    a = sh.stratified_sample(ds(), {"en": 0.25}, default=0.9).to_pandas()
    b = sh.stratified_sample(ds(), {"en": 0.25}, default=0.9).to_pandas()
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])  # partition-independent
    en = (a["lang"] == "en").sum() / 10000
    fr = (a["lang"] == "fr").sum() / 10000
    assert abs(en - 0.25) < 0.02 and abs(fr - 0.9) < 0.02


def test_scaffold_edge_repair_paths_row_identical(sf_dir, monkeypatch):
    """Driver-side (size-gated) and distributed groupby edge repairs must
    agree exactly — for the windowed scaffold AND the range join."""
    from medknowledgegraph_ray.sources import readers

    ev = lambda: readers.read_table(sf_dir, "events")  # noqa: E731
    small_rank = _norm(windows.ranked_events(ev()).to_pandas())
    small_rj = _norm(_entry.queries()["ev_range_join"](sf_dir).to_pandas())
    monkeypatch.setattr(windows, "EDGE_REPAIR_DRIVER_MAX", -1)  # force groupby
    big_rank = _norm(windows.ranked_events(ev()).to_pandas())
    big_rj = _norm(_entry.queries()["ev_range_join"](sf_dir).to_pandas())
    assert small_rank.equals(big_rank) and len(small_rank) > 0
    assert small_rj.equals(big_rj) and len(small_rj) > 0


def test_ngram_prefix_order_paths_row_identical(sf_dir):
    """Frequency-ordered prefixes (forced on with hot_df=1: every repeated
    shingle is 'hot') must produce exactly the hash-ordered result — the
    prefix-filter theorem holds under any fixed total order."""
    from medknowledgegraph_ray.sources import readers

    docs = lambda: readers.read_table(sf_dir, "documents", columns=["doc_id", "text"])  # noqa: E731
    plain = _norm(dedupe.ngram_jaccard_dedup(docs(), threshold=0.6, hot_df=None).to_pandas())
    freq = _norm(dedupe.ngram_jaccard_dedup(docs(), threshold=0.6, hot_df=1).to_pandas())
    assert plain.equals(freq) and len(plain) > 0


def test_minhash_verify_paths_row_identical(sf_dir, monkeypatch):
    """The size-gated driver-side verify and the distributed sorted-exchange
    verify must agree exactly on the same candidate set."""
    from medknowledgegraph_ray.sources import readers

    docs = lambda: readers.read_table(sf_dir, "documents", columns=["doc_id", "text"])  # noqa: E731
    small = _norm(dedupe.minhash_dedup(docs()).to_pandas())
    monkeypatch.setattr(dedupe, "SMALL_VERIFY_IDS", -1)  # force distributed
    big = _norm(dedupe.minhash_dedup(docs()).to_pandas())
    assert small.equals(big)


def test_simhash_identical_for_same_token_multiset():
    ds = _docs([(1, "foo bar baz"), (2, "baz foo bar"), (3, "entirely different words")])
    out = dedupe.simhash_signatures(ds).to_pandas().set_index("doc_id")["simhash"]
    assert out[1] == out[2] != out[3]


def test_fingerprint_is_order_sensitive_and_stable():
    ds = _docs([(1, "a b c"), (2, "c b a"), (3, "a b c")])
    out = textstats.fingerprints(ds).to_pandas().set_index("doc_id")["fingerprint"]
    assert out[1] == out[3] != out[2]


def test_ann_bruteforce_matches_numpy():
    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(50, 8))
    emb = rd.from_arrow(
        pa.table({"vec_id": pa.array(range(50), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float64()))})
    )
    q = {"query_id": [0], "matrix": [rng.normal(size=8).tolist()]}
    out = ann.brute_force_topk(emb, q, k=5).to_pandas().sort_values("rank")
    qv = np.asarray(q["matrix"][0])
    sims = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)) @ (qv / np.linalg.norm(qv))
    want = np.argsort(-np.round(sims, 6), kind="stable")[:5]
    assert out["vec_id"].tolist() == want.tolist()


def _events(rows):
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
    )


def test_sessionize_gap_boundary():
    # gap == 1800s stays in-session; gap > 1800s starts a new one
    base = 1_700_000_000_000_000  # epoch us
    ds = _events([
        (1, 7, base, 1.0),
        (2, 7, base + 1800 * 1_000_000, 2.0),          # exactly the gap → same session
        (3, 7, base + 3601 * 1_000_000 + 1800 * 1_000_000, 3.0),  # > gap → new session
    ])
    out = windows.sessionize(ds).to_pandas().sort_values("session_idx")
    assert out["n_events"].tolist() == [2, 1]
    assert out["value_sum_e6"].tolist() == [3_000_000, 3_000_000]


def test_sliding_window_membership():
    # width 3600, slide 900: an event belongs to exactly 4 windows
    ds = _events([(1, 7, 7200 * 1_000_000, 1.0)])
    out = windows.sliding_window(ds).to_pandas().sort_values("window_id")
    assert out["window_id"].tolist() == [5, 6, 7, 8]
    assert out["n_events"].tolist() == [1, 1, 1, 1]


def test_tumbling_window_boundary():
    ds = _events([
        (1, 7, 3600 * 1_000_000 - 1, 1.0),   # last µs of window 0
        (2, 7, 3600 * 1_000_000, 2.0),       # first µs of window 1
    ])
    out = windows.tumbling_window(ds).to_pandas().sort_values("window_id")
    assert out["window_id"].tolist() == [0, 1]
    assert out["n_events"].tolist() == [1, 1]


def test_ivf_topk_shape_determinism_and_recall(sf_dir):
    """IVF ANN: deterministic output, k ranked rows per query, and recall
    vs the exact brute-force baseline consistent with probing nprobe of
    n_clusters partitions."""
    from medknowledgegraph_ray.sources import readers
    from medknowledgegraph_ray.stages import ann

    emb = lambda: readers.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])  # noqa: E731
    q = ann.fixed_queries(64)
    ivf1 = ann.ivf_topk(emb(), q, k=10).to_pandas()
    ivf2 = ann.ivf_topk(emb(), q, k=10).to_pandas()
    norm = lambda df: df.sort_values(["query_id", "rank"]).reset_index(drop=True)  # noqa: E731
    assert norm(ivf1).equals(norm(ivf2))
    exact = ann.brute_force_topk(emb(), q, k=10).to_pandas()
    recalls = []
    for qid in q["query_id"]:
        got = set(ivf1[ivf1["query_id"] == qid]["vec_id"])
        want = set(exact[exact["query_id"] == qid]["vec_id"])
        assert len(got) <= 10
        recalls.append(len(got & want) / len(want))
        sc = ivf1[ivf1["query_id"] == qid].sort_values("rank")["score"].to_numpy()
        assert all(sc[i] >= sc[i + 1] - 1e-9 for i in range(len(sc) - 1))
    assert sum(recalls) / len(recalls) >= 0.3, recalls


def test_ivf_topk_empty_sample_falls_back(sf_dir):
    """sample_pct=0 lets no id through the hash gate; the quantizer must
    train on a head fallback instead of crashing on an empty np.stack."""
    from medknowledgegraph_ray.sources import readers
    from medknowledgegraph_ray.stages import ann

    emb = readers.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = ann.fixed_queries(64)
    out = ann.ivf_topk(emb, q, k=5, sample_pct=0).to_pandas()
    assert len(out) > 0 and set(out.columns) == {"query_id", "vec_id", "score", "rank"}


def _ivals(rows):
    return rd.from_arrow(pa.table({
        "key": pa.array([r[0] for r in rows], pa.int64()),
        "interval_id": pa.array([r[1] for r in rows], pa.int64()),
        "start_us": pa.array([r[2] for r in rows], pa.int64()),
        "end_us": pa.array([r[3] for r in rows], pa.int64()),
    }))


def _pts(rows):
    return rd.from_arrow(pa.table({
        "key": pa.array([r[0] for r in rows], pa.int64()),
        "point_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts_us": pa.array([r[2] for r in rows], pa.int64()),
    }))


def test_interval_join_boundaries():
    # key 1: [10,20] and [30,40]; key 2: no intervals; interval key 3: no points
    ivals = _ivals([(1, 1, 10, 20), (1, 2, 30, 40), (3, 1, 0, 100)])
    pts = _pts([
        (1, 100, 5),    # before all intervals → no match
        (1, 101, 10),   # at start boundary → interval 1
        (1, 102, 20),   # at end boundary → interval 1
        (1, 103, 25),   # in the gap → no match
        (1, 104, 33),   # inside → interval 2
        (1, 105, 41),   # after the last end → no match
        (2, 200, 15),   # key without intervals → no match
    ])
    out = rangejoin.interval_join(pts, ivals).to_pandas()
    got = {(r.point_id, r.interval_id) for r in out.itertuples()}
    assert got == {(101, 1), (102, 1), (104, 2)}
    row = out[out["point_id"] == 104].iloc[0]
    assert (row["start_us"], row["end_us"], row["key"]) == (30, 40, 1)


def test_interval_join_matches_brute_force_many_keys():
    rng = np.random.RandomState(7)
    ival_rows, pt_rows = [], []
    for k in range(40):
        # non-overlapping intervals per key: sorted cut points
        cuts = np.sort(rng.choice(10_000, size=8, replace=False))
        for i in range(0, 8, 2):
            ival_rows.append((k, i // 2 + 1, int(cuts[i]), int(cuts[i + 1])))
        for p in range(25):
            pt_rows.append((k, k * 1000 + p, int(rng.randint(0, 10_500))))
    out = rangejoin.interval_join(
        _pts(pt_rows).repartition(7), _ivals(ival_rows).repartition(3)
    ).to_pandas()
    expect = set()
    for k, pid, ts in pt_rows:
        for ik, iid, s, e in ival_rows:
            if ik == k and s <= ts <= e:
                expect.add((pid, iid, s, e))
    got = {(r.point_id, r.interval_id, r.start_us, r.end_us) for r in out.itertuples()}
    assert got == expect
    assert len(out) == len(out[["point_id"]].drop_duplicates())  # unique match


def test_split_docs_deterministic_and_stratified():
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(2000)), pa.int64()),
        "lang": pa.array(["en" if i % 2 else "de" for i in range(2000)], pa.string()),
    }))
    out = textstats.split_docs(docs).to_pandas()
    # formula parity per row
    b = (np.arange(2000, dtype=np.uint64) * 2654435761) % (1 << 32) % 100
    want = np.where(b < 10, "val", np.where(b < 20, "test", "train"))
    got = out.sort_values("doc_id")["split"].to_numpy()
    assert (got == want).all()
    # each stratum sees every split and roughly the configured fractions
    frac = out.groupby(["lang", "split"]).size().unstack(fill_value=0)
    for lang in ("en", "de"):
        assert frac.loc[lang, "train"] > frac.loc[lang, "val"] > 0
        assert 0.05 < frac.loc[lang, "val"] / 1000 < 0.15


def test_grouped_quantiles_matches_brute_force():
    rng = np.random.RandomState(11)
    rows = []
    eid = 0
    for u in range(30):
        for _ in range(int(rng.randint(1, 60))):
            rows.append((eid, u, 1_700_000_000_000_000 + eid, float(rng.randint(0, 1000)) / 7))
            eid += 1
    out = (
        windows.grouped_quantiles(_events(rows).repartition(5))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    for u in range(30):
        vals = np.sort(np.array(
            [np.int64(round(r[3] * 1e6)) for r in rows if r[1] == u]
        ))
        n = len(vals)
        assert out.loc[u, "n_events"] == n
        assert out.loc[u, "median_value_e6"] == vals[int(np.ceil(n * 0.5)) - 1]
        assert out.loc[u, "p90_value_e6"] == vals[int(np.ceil(n * 0.9)) - 1]


def test_hll_within_error_envelope_and_partition_independent(sf_dir):
    from medknowledgegraph_ray.sources import readers
    from medknowledgegraph_ray.stages import sketch

    docs = lambda n: readers.read_table(  # noqa: E731
        sf_dir, "documents", columns=["doc_id", "text"]
    ).repartition(n)
    exact = int(sketch.distinct_token_count(docs(4))["n_distinct_tokens"].iloc[0])
    est1 = int(sketch.distinct_token_count_hll(docs(4))["n_distinct_tokens_hll"].iloc[0])
    est2 = int(sketch.distinct_token_count_hll(docs(13))["n_distinct_tokens_hll"].iloc[0])
    assert est1 == est2  # deterministic and partition-independent
    m = 1 << 14
    assert abs(est1 - exact) <= max(3 * 1.04 / np.sqrt(m) * exact, 5), (est1, exact)


def test_hll_estimator_linear_counting_range():
    from medknowledgegraph_ray.stages import sketch

    s = sketch.HllTokenSketch(p=10)
    regs = np.zeros(1 << 10, dtype=np.uint8)
    toks = {f"tok{i}" for i in range(500)}
    for t in toks:
        idx, rho = s._slot(t)
        regs[idx] = max(regs[idx], rho)
    est = sketch.hll_estimate(regs)
    assert abs(est - 500) / 500 < 0.1


def test_kmeans_clusters_deterministic_and_nearest(sf_dir):
    from medknowledgegraph_ray.sources import readers
    from medknowledgegraph_ray.stages import ann as _ann

    emb = lambda n: readers.read_table(  # noqa: E731
        sf_dir, "embeddings", columns=["vec_id", "embedding"]
    ).repartition(n)
    a = _norm(_ann.kmeans_clusters(emb(3)).to_pandas())
    b = _norm(_ann.kmeans_clusters(emb(9)).to_pandas())
    assert a.equals(b)  # partition-independent
    assert a["cluster_id"].nunique() > 1
    # every vector sits on its true nearest centroid (self-consistency):
    # recompute centroids from the same deterministic sample and compare
    cents = _ann._train_quantizer(emb(3), 16, 20)
    df = emb(3).to_pandas()
    vecs = _ann._unit(np.stack(df["embedding"].to_numpy()))
    want = np.argmax(vecs @ cents.T, axis=1)
    got = a.set_index("vec_id").loc[df["vec_id"], "cluster_id"].to_numpy()
    assert (got == want).all()


def test_asof_join_latest_state_and_ties():
    states = rd.from_arrow(pa.table({
        "key": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "state_id": pa.array([10, 11, 12, 13, 20], pa.int64()),
        # state_id 12/13 tie at ts 30 → highest id wins deterministically
        "ts_us": pa.array([10, 20, 30, 30, 5], pa.int64()),
    }))
    pts = rd.from_arrow(pa.table({
        "key": pa.array([1, 1, 1, 1, 2, 3], pa.int64()),
        "point_id": pa.array([100, 101, 102, 103, 200, 300], pa.int64()),
        "ts_us": pa.array([5, 10, 25, 35, 99, 50], pa.int64()),
    }))
    out = rangejoin.asof_join(pts, states).to_pandas()
    got = {(r.point_id, r.state_id, r.state_ts_us) for r in out.itertuples()}
    assert got == {
        (101, 10, 10),   # inclusive at equal ts
        (102, 11, 20),   # latest at-or-before
        (103, 13, 30),   # tie resolves to max state_id
        (200, 20, 5),
    }  # point 100 (before any state) and key 3 (no states) drop out


def test_inverted_index_matches_brute_force():
    from medknowledgegraph_ray.stages import invindex

    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(30)]
    rows = [(i, " ".join(rng.choice(vocab, size=12))) for i in range(80)]
    out = (
        invindex.inverted_index(_docs(rows).repartition(6))
        .to_pandas()
        .set_index("tok")
        .sort_index()
    )
    expect: dict[str, list[int]] = {}
    for doc_id, text in rows:
        for tok in set(text.split()):
            expect.setdefault(tok, []).append(doc_id)
    assert set(out.index) == set(expect)
    for tok, ids in expect.items():
        assert out.loc[tok, "postings"] == ",".join(map(str, sorted(ids)))
        assert out.loc[tok, "n_docs"] == len(ids)


@pytest.mark.parametrize("force_distributed", [False, True])
def test_connected_components_chain_triangle_and_merge(force_distributed, monkeypatch):
    from medknowledgegraph_ray.stages import components

    if force_distributed:
        monkeypatch.setattr(components, "SMALL_GRAPH_EDGES", -1)
    # chain 1-2-3-4 (diameter 3 forces >1 propagation round), triangle
    # 20-21-22, and a pair (5, 30) that shares no structure with either
    pairs = pd.DataFrame(
        {
            "doc_a": [2, 3, 4, 11, 20, 21, 22, 30],
            "doc_b": [1, 2, 3, 10, 21, 22, 20, 5],
        }
    )
    for nparts in (1, 4):
        out = (
            components.connected_components(rd.from_pandas(pairs).repartition(nparts))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        expect = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                  20: 20, 21: 20, 22: 20, 5: 5, 30: 5}
        got = dict(zip(out["doc_id"], out["component"]))
        assert got == expect


def test_connected_components_empty_and_long_path(monkeypatch):
    from medknowledgegraph_ray.stages import components

    monkeypatch.setattr(components, "SMALL_GRAPH_EDGES", -1)
    connected_components = components.connected_components

    empty = rd.from_pandas(
        pd.DataFrame({"doc_a": pd.array([], dtype="int64"),
                      "doc_b": pd.array([], dtype="int64")})
    )
    assert connected_components(empty).count() == 0

    # a 40-node path is the adversarial diameter case for hash-min
    n = 40
    path = pd.DataFrame({"doc_a": range(1, n), "doc_b": range(0, n - 1)})
    out = connected_components(rd.from_pandas(path).repartition(5)).to_pandas()
    assert set(out["component"]) == {0}
    assert sorted(out["doc_id"]) == list(range(n))


def test_doc_tfidf_matches_brute_force_across_partitions():
    import math

    from medknowledgegraph_ray.stages import tfidf

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(15)]
    rows = [(i, " ".join(rng.choice(vocab, size=20))) for i in range(60)]
    n = len(rows)
    # brute-force expectation
    tf_maps = {i: {} for i, _ in rows}
    for i, text in rows:
        for t in text.split():
            tf_maps[i][t] = tf_maps[i].get(t, 0) + 1
    df = {}
    for m in tf_maps.values():
        for t in m:
            df[t] = df.get(t, 0) + 1
    expect = {}
    for i, m in tf_maps.items():
        scored = sorted(
            ((int(round(c * math.log(n / df[t]) * 1e6)), t, c) for t, c in m.items()),
            key=lambda x: (-x[0], x[1]),
        )[:5]
        expect[i] = [(t, c, s, r + 1) for r, (s, t, c) in enumerate(scored)]
    # many small blocks force df rows and tf rows of hot tokens to
    # straddle exchange-block edges (the repair path)
    out = tfidf.doc_tfidf(_docs(rows).repartition(8)).to_pandas()
    got = {}
    for doc_id, g in out.groupby("doc_id"):
        g = g.sort_values("rank")
        got[doc_id] = list(zip(g["tok"], g["tf"], g["tfidf_e6"], g["rank"]))
    assert got == expect


def test_seeded_shuffle_positions_exact_and_partition_stable():
    from medknowledgegraph_ray.stages import shuffle

    rows = [(i, f"doc {i}") for i in range(300)]
    outs = []
    for nparts in (1, 7):
        out = (
            shuffle.seeded_shard_shuffle(_docs(rows).repartition(nparts),
                                         seed=42, n_shards=4)
            .to_pandas()
            .sort_values(["shard", "pos"])
            .reset_index(drop=True)
        )
        outs.append(out)
        # per shard: pos is exactly 1..n and ordered by (skey, doc_id)
        for _, g in out.groupby("shard"):
            assert g["pos"].tolist() == list(range(1, len(g) + 1))
            keys = list(zip(g["skey"], g["doc_id"]))
            assert keys == sorted(keys)
        assert set(out["doc_id"]) == set(range(300))
    # the permutation is identical regardless of input partitioning
    assert outs[0].equals(outs[1])


def test_running_aggregates_window_frames():
    # user 7: values 1,2,3,4 → cum 1,3,6,10; roll-3 1,3,6,9
    base = 1_700_000_000_000_000
    ds = _events([
        (1, 7, base + 1_000_000, 1.0),
        (2, 7, base + 2_000_000, 2.0),
        (3, 7, base + 3_000_000, 3.0),
        (4, 7, base + 4_000_000, 4.0),
        (5, 9, base, 10.0),
    ])
    out = (
        windows.running_aggregates(ds.repartition(3))
        .to_pandas()
        .sort_values(["user_id", "event_id"])
    )
    u7 = out[out["user_id"] == 7]
    assert u7["cum_value_e6"].tolist() == [1_000_000, 3_000_000, 6_000_000, 10_000_000]
    assert u7["roll_value_e6"].tolist() == [1_000_000, 3_000_000, 6_000_000, 9_000_000]
    u9 = out[out["user_id"] == 9]
    assert u9["cum_value_e6"].tolist() == [10_000_000]
    assert u9["roll_value_e6"].tolist() == [10_000_000]


def test_tfidf_broadcast_and_exchange_paths_row_identical(monkeypatch):
    from medknowledgegraph_ray.stages import tfidf

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(20)]
    rows = [(i, " ".join(rng.choice(vocab, size=25))) for i in range(80)]
    fast = _norm(tfidf.doc_tfidf(_docs(rows).repartition(5)).to_pandas())
    monkeypatch.setattr(tfidf, "VOCAB_BROADCAST_MAX", -1)  # force exchange path
    slow = _norm(tfidf.doc_tfidf(_docs(rows).repartition(5)).to_pandas())
    assert fast.equals(slow)


def test_anti_join_ids_across_partitions():
    from medknowledgegraph_ray.stages import setops

    left = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.array(range(100), dtype="int64")})
    ).repartition(6)
    # right holds duplicates and ids absent from left
    right = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.array(
            [3, 3, 7, 50, 51, 51, 200, 201], dtype="int64")})
    ).repartition(3)
    out = setops.anti_join_ids(left, right).to_pandas()
    assert sorted(out["doc_id"]) == sorted(set(range(100)) - {3, 7, 50, 51})
    # empty right keeps everything
    empty = rd.from_pandas(pd.DataFrame({"doc_id": pd.array([], dtype="int64")}))
    assert setops.anti_join_ids(left, empty).count() == 100


def test_semi_join_ids_across_partitions():
    from medknowledgegraph_ray.stages import setops

    left = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.array(range(100), dtype="int64")})
    ).repartition(6)
    right = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.array(
            [3, 3, 7, 50, 51, 51, 200, 201], dtype="int64")})
    ).repartition(3)
    out = setops.semi_join_ids(left, right).to_pandas()
    assert sorted(out["doc_id"]) == [3, 7, 50, 51]
    # empty right keeps nothing
    empty = rd.from_pandas(pd.DataFrame({"doc_id": pd.array([], dtype="int64")}))
    assert setops.semi_join_ids(left, empty).count() == 0


def test_anti_join_rows_payload_and_repeated_keys():
    from medknowledgegraph_ray.stages import setops

    rng = np.random.default_rng(31)
    # left keys repeat: rows sharing a key survive or drop together
    lkeys = rng.integers(0, 60, 300).astype(np.uint64)
    left = rd.from_pandas(
        pd.DataFrame(
            {
                "key": pd.array(lkeys, dtype="uint64"),
                "doc_id": pd.array(range(300), dtype="int64"),
            }
        )
    ).repartition(7)
    rkeys = np.array([3, 3, 7, 20, 20, 20, 41, 90, 91], dtype=np.uint64)
    right = rd.from_pandas(
        pd.DataFrame({"key": pd.array(rkeys, dtype="uint64")})
    ).repartition(3)
    out = setops.anti_join_rows(left, right).to_pandas()
    blocked = set(rkeys.tolist())
    exp = sorted(i for i, k in enumerate(lkeys.tolist()) if k not in blocked)
    assert sorted(out["doc_id"]) == exp
    # empty right keeps every left row (duplicates included)
    empty = rd.from_pandas(
        pd.DataFrame(
            {
                "key": pd.array([], dtype="uint64"),
                "doc_id": pd.array([], dtype="int64"),
            }
        )
    )
    assert setops.anti_join_rows(left, empty).count() == 300


def test_incremental_dedup_cross_source():
    from medknowledgegraph_ray.stages import dedupe

    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(8), dtype="int64"),
            "text": [
                "alpha beta",   # 0 new, dup of base doc 4 -> dropped
                "gamma delta",  # 1 new, unique -> kept
                "alpha beta",   # 2 new, dup of base -> dropped
                "zeta eta",     # 3 new, dup WITHIN new only -> kept
                "alpha beta",   # 4 base
                "theta iota",   # 5 base
                "zeta eta",     # 6 new, dup within new -> kept
                "kappa",        # 7 base
            ],
            "source": ["new", "new", "new", "new", "base", "base", "new", "base"],
        }
    )
    out = (
        dedupe.incremental_dedup(rd.from_pandas(docs).repartition(4), "new")
        .to_pandas()
    )
    assert sorted(out["doc_id"]) == [1, 3, 6]


def test_pii_scanner_counts_and_redaction():
    import hashlib

    from medknowledgegraph_ray.stages import pii

    # undecorated inputs: the scanner is a general kernel, not tied to the
    # planted stripes
    rows = [
        (1, "write to a.b+tag@mail-host.co.uk or ops@x.io now"),
        (2, "call +44-555-1234 then +1-202-0007"),
        (3, "hosts 10.0.0.1 and 192.168.254.7 plus v1.2 notes"),
        (4, "nothing sensitive here"),
    ]
    scanned = (
        pii.PiiScanner()(
            pd.DataFrame({"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]})
        )
        .set_index("doc_id")
    )
    assert list(scanned["n_emails"]) == [2, 0, 0, 0]
    assert list(scanned["n_phones"]) == [0, 2, 0, 0]
    assert list(scanned["n_ipv4"]) == [0, 0, 2, 0]
    assert list(scanned["n_pii"]) == [2, 2, 2, 0]
    # a clean doc's redacted hash is the hash of the original text
    assert scanned.loc[4, "redacted_hash"] == hashlib.md5(rows[3][1].encode()).hexdigest()
    # a redacted doc's hash differs and matches the manual replacement
    red = "call <PHONE> then <PHONE>"
    assert scanned.loc[2, "redacted_hash"] == hashlib.md5(red.encode()).hexdigest()


def test_pii_domain_counts_allmiss_batch_keeps_schema():
    from medknowledgegraph_ray.stages import pii

    # doc_ids chosen so NO planted URL fires (odd, not %4 / %6) — the
    # extractor must still emit a typed empty table from every batch
    ds = _docs([(1, "plain"), (5, "words only"), (7, "no links")]).repartition(3)
    out = pii.domain_counts(ds)
    assert out.count() == 0
    assert [f.name for f in out.schema().base_schema] == ["domain", "n"]

    # and with planted stripes the counts are exact
    ds2 = _docs([(0, "a"), (4, "b"), (6, "c"), (12, "d")])
    got = pii.domain_counts(ds2).to_pandas().set_index("domain")["n"].to_dict()
    # %4: ids 0,4,12 → docs.example.org; %6: ids 0,6,12 → cdn{id%10}
    assert got["docs.example.org"] == 3
    assert got["cdn0.mirror-net.io"] == 1
    assert got["cdn6.mirror-net.io"] == 1
    assert got["cdn2.mirror-net.io"] == 1


def test_equi_join_matches_pandas_merge():
    from medknowledgegraph_ray.stages.join import equi_join

    rng = np.random.RandomState(13)
    build_df = pd.DataFrame({
        "k": pd.array(range(0, 60, 2), dtype="int64"),       # even keys only
        "name": [f"n{i}" for i in range(30)],
    })
    probe_df = pd.DataFrame({
        "k": pd.array(rng.randint(0, 60, size=400), dtype="int64"),
        "v": pd.array(range(400), dtype="int64"),
    })
    out = (
        equi_join(
            rd.from_pandas(build_df).repartition(4),
            rd.from_pandas(probe_df).repartition(7),
            "k", ["name"], ["v"],
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    exp = (
        probe_df.merge(build_df, on="k", how="inner")[["k", "name", "v"]]
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert out[["k", "name", "v"]].equals(exp)


def test_equi_join_empty_build_side():
    """An empty build side (e.g. a funnel step with no qualifying events,
    whose pandas-lineage dataset has no schema at all) works with declared
    types — and fails with a DESCRIPTIVE error without them, never a bare
    StopIteration."""
    from medknowledgegraph_ray.stages.join import equi_join

    def empty_build():
        return rd.from_pandas(pd.DataFrame({
            "k": pd.array([], dtype="int64"), "b": pd.array([], dtype="int64"),
        })).map_batches(lambda df: df, batch_format="pandas")  # schema-less

    probe = rd.from_pandas(pd.DataFrame({
        "k": pd.array([1, 2, 3], dtype="int64"),
        "p": pd.array([10, 20, 30], dtype="int64"),
    }))
    t = {"b": pa.int64()}
    assert equi_join(empty_build(), probe, "k", ["b"], ["p"], types=t).count() == 0
    left = equi_join(empty_build(), probe, "k", ["b"], ["p"], how="left", types=t).to_pandas()
    assert sorted(left["p"]) == [10, 20, 30] and left["b"].isna().all()
    with pytest.raises(ValueError, match="types"):
        equi_join(empty_build(), probe, "k", ["b"], ["p"])


def test_funnel_with_empty_step_frontier():
    """A funnel whose later steps never occur (empty t2/t3 frontiers) still
    completes — the ADVICE repro (equi_join on an empty build side)."""
    from medknowledgegraph_ray.stages import eventagg

    base = 1_700_000_000_000_000
    ds = _events([(1, 7, pd.Timestamp(base, unit="us"), 1.0),
                  (2, 8, pd.Timestamp(base + 1, unit="us"), 1.0)])
    ds = ds.map_batches(
        lambda df: df.assign(event_type="signup"), batch_format="pandas"
    )
    out = eventagg.funnel_stages(ds).to_pandas()
    assert sorted(out["user_id"]) == [7, 8] and (out["stage"] == 1).all()


def test_equi_join_duplicate_build_key_fails_loudly():
    """The unique-per-key build contract is checked, not just documented."""
    from medknowledgegraph_ray.stages.join import equi_join

    dup_keys = np.repeat(np.arange(40, dtype=np.int64), 2)  # every key twice
    build = rd.from_pandas(pd.DataFrame({
        "k": pd.array(dup_keys, dtype="int64"),
        "b": pd.array(range(80), dtype="int64"),
    }))
    probe = rd.from_pandas(pd.DataFrame({
        "k": pd.array(np.arange(40, dtype=np.int64), dtype="int64"),
        "p": pd.array(range(40), dtype="int64"),
    }))
    with pytest.raises(Exception, match="duplicate key"):
        equi_join(build.repartition(2), probe.repartition(2), "k", ["b"], ["p"]).materialize()


def test_exact_global_quantiles_matches_numpy_selection():
    from medknowledgegraph_ray.stages.selection import exact_quantiles

    rng = np.random.RandomState(17)
    vals = rng.randint(-1000, 1000, size=5000).astype("int64")
    ds = rd.from_pandas(pd.DataFrame({
        "uid": pd.array(range(len(vals)), dtype="int64"),
        "v": pd.array(vals, dtype="int64"),
    })).repartition(9)
    out = exact_quantiles(ds, "v", {"p50": 0.5, "p90": 0.9, "p01": 0.01})
    sv = np.sort(vals)
    import math
    for name, q in (("p50", 0.5), ("p90", 0.9), ("p01", 0.01)):
        k = max(math.ceil(len(sv) * q) - 1, 0)
        assert int(out[name].iloc[0]) == int(sv[k]), name


def test_ranked_events_ties_and_partitions():
    from medknowledgegraph_ray.stages import windows as _w

    base = 1_700_000_000_000_000
    # user 7: values 5, 5, 3 → row_num 1,2,3; rank 1,1,3; dense 1,1,2
    ds = _events([
        (1, 7, base, 5.0),
        (2, 7, base + 1, 5.0),
        (3, 7, base + 2, 3.0),
        (4, 9, base, 1.0),
    ])
    out = (
        _w.ranked_events(ds.repartition(3))
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    u7 = out[out["user_id"] == 7]
    assert u7["row_num"].tolist() == [1, 2, 3]
    assert u7["rnk"].tolist() == [1, 1, 3]
    assert u7["dense_rnk"].tolist() == [1, 1, 2]
    assert out[out["user_id"] == 9]["row_num"].tolist() == [1]


def test_sequence_pack_spans_partition_independent():
    from medknowledgegraph_ray.stages import pack as _p

    docs = _docs([
        (1, "a b c"),            # 3 tokens, stream [0, 3)
        (2, " ".join(["x"] * 6)),  # 6 tokens, stream [3, 9)
        (3, ""),                  # dropped (0 tokens)
        (4, "y z"),               # 2 tokens, stream [9, 11)
    ])
    out = (
        _p.sequence_pack(docs.repartition(3), budget=4)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    # budget 4 → chunk 0 = tokens [0,4), chunk 1 = [4,8), chunk 2 = [8,11)
    exp = pd.DataFrame(
        {
            "doc_id": pd.array([1, 2, 2, 2, 4], dtype="int64"),
            "chunk_id": pd.array([0, 0, 1, 2, 2], dtype="int64"),
            "tok_start": pd.array([0, 0, 1, 5, 0], dtype="int64"),
            "tok_end": pd.array([3, 1, 5, 6, 2], dtype="int64"),
        }
    )
    assert out.equals(exp)
    # spans tile each doc exactly
    spans = out.groupby("doc_id").apply(
        lambda g: (g["tok_end"] - g["tok_start"]).sum(), include_groups=False
    )
    assert spans.to_dict() == {1: 3, 2: 6, 4: 2}
    # partitioning must not change the packing
    out1 = (
        _p.sequence_pack(docs.repartition(1), budget=4)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert out1.equals(out)


def test_event_pivot_and_type_profile():
    from medknowledgegraph_ray.stages import eventagg as _ea

    base = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([7, 7, 7, 9], pa.int64()),
            "ts": pa.array([base, base + 1, base + 2, base], pa.timestamp("us")),
            "event_type": pa.array(["click", "click", "view", "error"], pa.string()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            "props": pa.array(['{"k": 5}', '{"k": 7}', '{"k": 1}', "{}"], pa.string()),
        }
    )
    ds = rd.from_arrow(tbl).repartition(2)
    piv = _ea.pivot_event_counts(ds).to_pandas().set_index("user_id").sort_index()
    assert piv.loc[7, "n_click"] == 2 and piv.loc[7, "n_view"] == 1
    assert piv.loc[7, "n_total"] == 3 and piv.loc[9, "n_error"] == 1
    prof = _ea.user_type_profile(ds).to_pandas().set_index("user_id").sort_index()
    assert prof.loc[7, "n_events"] == 3 and prof.loc[7, "n_types"] == 2
    assert prof.loc[7, "first_ts_us"] == base and prof.loc[7, "last_ts_us"] == base + 2
    props = _ea.props_field_stats(ds).to_pandas().set_index("event_type")
    assert props.loc["click", "k_sum"] == 12 and props.loc["click", "n"] == 2
    assert props.loc["error", "k_sum"] == 0  # '{}' → no digits → 0


def test_asof_next_mirrors_prev():
    from medknowledgegraph_ray.stages import windows as _w

    base = 1_700_000_000_000_000
    ds = _events([
        (1, 7, base + 1_000_000, 1.0),
        (2, 7, base + 2_000_000, 2.0),
        (3, 7, base + 3_000_000, 3.0),
        (4, 9, base, 10.0),
    ])
    out = (
        _w.asof_next(ds.repartition(3))
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert out[out["user_id"] == 7]["next_value_e6"].tolist() == [
        2_000_000, 3_000_000, 0]
    assert out[out["user_id"] == 9]["next_value_e6"].tolist() == [0]


def test_grouped_quantiles_cont_matches_duckdb_formula():
    from medknowledgegraph_ray.stages import windows as _w

    base = 1_700_000_000_000_000
    rng = np.random.RandomState(11)
    rows = [
        (i, int(u), base + i * 1_000_000, float(v))
        for i, (u, v) in enumerate(zip(rng.randint(0, 5, 200), rng.uniform(0, 100, 200)))
    ]
    out = (
        _w.grouped_quantiles_cont(_events(rows).repartition(7))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    df["value_e6"] = np.round(df["value"].to_numpy() * 1e6).astype("int64")
    for uid, g in df.groupby("user_id"):
        v = np.sort(g["value_e6"].to_numpy()).astype(np.float64)
        n = len(v)
        for q, col in ((0.5, "median_cont"), (0.9, "p90_cont")):
            pos = q * (n - 1)
            lo = int(np.floor(pos))
            hi = min(lo + 1, n - 1)
            f = pos - lo
            exp = v[lo] * (1 - f) + v[hi] * f
            assert out.loc[uid, col] == exp, (uid, col)


def test_top_bigrams_counts_and_order():
    from medknowledgegraph_ray.stages import invindex as _iv

    docs = _docs([
        (1, "a b a b c"),   # bigrams: "a b" x2, "b a", "b c"
        (2, "a b"),         # "a b"
        (3, "solo"),        # none
    ])
    out = _iv.top_bigrams(docs.repartition(3), k=3)
    assert out["bigram"].tolist() == ["a b", "b a", "b c"]
    assert out["n"].tolist() == [3, 1, 1]


def test_left_join_preserves_unmatched_probe_rows():
    from medknowledgegraph_ray.stages.join import equi_join

    build = rd.from_arrow(
        pa.table({"k": pa.array([1, 3], pa.int64()),
                  "b": pa.array(["one", "three"], pa.string())})
    )
    probe = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4, 4], pa.int64()),
                  "p": pa.array([10, 20, 30, 40, 41], pa.int64())})
    )
    out = (
        equi_join(build.repartition(2), probe.repartition(3), "k", ["b"], ["p"],
                  how="left")
        .to_pandas()
        .sort_values(["k", "p"])
        .reset_index(drop=True)
    )
    assert out["k"].tolist() == [1, 2, 3, 4, 4]
    assert out["b"].tolist() == ["one", None, "three", None, None]
    assert out["p"].tolist() == [10, 20, 30, 40, 41]
    # inner drops the unmatched rows
    inner = equi_join(build, probe, "k", ["b"], ["p"]).to_pandas()
    assert sorted(inner["k"].tolist()) == [1, 3]


def test_latest_event_per_user_tiebreak():
    from medknowledgegraph_ray.stages import windows as _w

    base = 1_700_000_000_000_000
    ds = _events([
        (1, 7, base, 1.0),
        (3, 7, base + 5, 3.0),   # latest ts wins
        (2, 7, base + 5, 2.0),   # same ts, smaller id loses
        (9, 8, base, 9.0),
    ])
    out = (
        _w.latest_event_per_user(ds.repartition(3))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [3, 9]
    assert out["value_e6"].tolist() == [3_000_000, 9_000_000]


def test_ntile_bucket_sizes():
    from medknowledgegraph_ray.stages import windows as _w

    base = 1_700_000_000_000_000
    # user 7 has 6 events → NTILE(4) buckets of sizes 2,2,1,1;
    # user 8 has 2 events (< k) → buckets 1 and 2
    rows = [(i, 7, base + i, float(100 - i)) for i in range(6)]
    rows += [(10, 8, base, 5.0), (11, 8, base + 1, 4.0)]
    out = (
        _w.ntile_events(_events(rows).repartition(3))
        .to_pandas()
        .sort_values(["user_id", "value_e6"], ascending=[True, False])
        .reset_index(drop=True)
    )
    assert out[out["user_id"] == 7]["bucket"].tolist() == [1, 1, 2, 2, 3, 4]
    assert out[out["user_id"] == 8]["bucket"].tolist() == [1, 2]


def test_user_moments_and_exact_sample():
    from medknowledgegraph_ray.stages import eventagg as _ea
    from medknowledgegraph_ray.stages import textstats as _ts

    base = 1_700_000_000_000_000
    ds = _events([
        (1, 7, base, 1.5),
        (2, 7, base + 1, 2.5),
        (3, 9, base, 4.0),
    ])
    m = _ea.user_moments(ds.repartition(2)).to_pandas().set_index("user_id")
    assert m.loc[7, "n"] == 2 and m.loc[7, "sum_e3"] == 4000
    assert m.loc[7, "sumsq_e6"] == 1500**2 + 2500**2
    assert m.loc[7, "mean_e3"] == 4000 / 2
    assert m.loc[9, "min_e3"] == m.loc[9, "max_e3"] == 4000

    docs = _docs([(i, f"doc {i}") for i in range(100)])
    s3 = _ts.sample_exact_k(docs.repartition(5), k=10)
    s1 = _ts.sample_exact_k(docs.repartition(1), k=10)
    assert len(s3) == 10 and s3["rank"].tolist() == list(range(1, 11))
    assert s3[["doc_id", "priority"]].equals(s1[["doc_id", "priority"]])


def test_export_corpus_write_and_resume(sf_dir, tmp_path):
    import os

    from medknowledgegraph_ray.pipelines import corpus

    out = str(tmp_path / "corpus")
    first = corpus.export_corpus(sf_dir, out, n_shards=4)
    assert first["written"] == 4 and first["skipped"] == 0
    idx = _norm(corpus.corpus_rows(sf_dir, n_shards=4).to_pandas())
    written = []
    for s in range(4):
        path = os.path.join(out, f"shard={s}")
        df = pd.read_parquet(path)
        assert df["shard"].eq(s).all()
        assert sorted(df["pos"].tolist()) == list(range(1, len(df) + 1))
        assert df["text"].notna().all()
        written.append(df[["doc_id", "shard", "pos"]])
    assert _norm(pd.concat(written, ignore_index=True)).equals(idx)
    # full resume: nothing recomputes
    again = corpus.export_corpus(sf_dir, out, n_shards=4)
    assert again["written"] == 0 and again["skipped"] == 4
    # partial resume: drop one shard, only it is rewritten
    import shutil as _sh

    keep_mtime = os.path.getmtime(os.path.join(out, "shard=0"))
    _sh.rmtree(os.path.join(out, "shard=2"))
    third = corpus.export_corpus(sf_dir, out, n_shards=4)
    assert third["written"] == 1 and third["skipped"] == 3
    assert os.path.getmtime(os.path.join(out, "shard=0")) == keep_mtime
    df2 = pd.read_parquet(os.path.join(out, "shard=2"))
    assert _norm(df2[["doc_id", "shard", "pos"]]).equals(
        _norm(idx[idx["shard"] == 2]))


def test_full_outer_join_both_sides_preserved():
    from medknowledgegraph_ray.stages.join import equi_join

    build = rd.from_arrow(
        pa.table({"k": pa.array([1, 3, 5, 7], pa.int64()),
                  "b": pa.array(["one", "three", "five", "seven"], pa.string())})
    )
    probe = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 3, 9], pa.int64()),
                  "p": pa.array([10, 20, 30, 31, 90], pa.int64())})
    )
    out = (
        equi_join(build.repartition(3), probe.repartition(2), "k", ["b"], ["p"],
                  how="outer")
        .to_pandas()
        .sort_values(["k", "p"])
        .reset_index(drop=True)
    )
    # matched: 1, 3, 3; unmatched probe: 2, 9; unmatched build: 5, 7
    assert out["k"].tolist() == [1, 2, 3, 3, 5, 7, 9]
    assert out["b"].tolist() == ["one", None, "three", "three", "five", "seven", None]
    assert [None if pd.isna(x) else int(x) for x in out["p"]] == [
        10, 20, 30, 31, None, None, 90]
    # single-partition result identical (edge-repair path vs interior path)
    out1 = (
        equi_join(build.repartition(1), probe.repartition(1), "k", ["b"], ["p"],
                  how="outer")
        .to_pandas().sort_values(["k", "p"]).reset_index(drop=True)
    )
    assert out1.equals(out)


def test_contamination_flags_token_boundary_semantics():
    from medknowledgegraph_ray.stages import decontam

    bench = _docs([(1, "alpha beta gamma delta epsilon zeta eta theta iota")])
    corpus = _docs([
        (1, "alpha beta gamma delta epsilon zeta eta theta iota"),  # itself
        (2, "x y alpha beta gamma delta epsilon zeta eta theta z"),  # contains an 8-gram
        (3, "alpha beta gamma delta epsilon zeta eta"),             # only 7 shared tokens
        (4, "completely different words here and everywhere now ok"),
        (5, "xalpha beta gamma delta epsilon zeta eta theta"),      # token boundary: no
    ])
    out = (
        decontam.contamination_flags(corpus.repartition(3), bench)
        .to_pandas().set_index("doc_id")["contaminated"]
    )
    assert out[1] and out[2]
    assert not out[3] and not out[4] and not out[5]


def test_unigram_logprob_paths_row_identical(sf_dir, monkeypatch):
    from medknowledgegraph_ray.stages import tfidf

    docs = lambda: _entry._docs(sf_dir)  # noqa: E731
    small = _norm(tfidf.unigram_logprob(docs()).to_pandas())
    monkeypatch.setattr(tfidf, "VOCAB_BROADCAST_MAX", -1)  # force exchange path
    big = _norm(tfidf.unigram_logprob(docs()).to_pandas())
    assert small.equals(big)
    # scores are negative log-probs scaled to micro-nats
    assert (small["logprob_sum_e6"] < 0).all()
    assert (small["avg_logprob_e6"] < 0).all()


def test_export_corpus_knob_mismatch_raises(sf_dir, tmp_path):
    from medknowledgegraph_ray.pipelines import corpus

    out = str(tmp_path / "corpus_knobs")
    corpus.export_corpus(sf_dir, out, n_shards=2)
    with pytest.raises(ValueError, match="different knobs"):
        corpus.export_corpus(sf_dir, out, n_shards=4)
    with pytest.raises(ValueError, match="different knobs"):
        corpus.export_corpus(sf_dir, out, n_shards=2, seed=1)


def test_funnel_stage_ordering():
    from medknowledgegraph_ray.stages import eventagg as _ea

    base = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "event_id": pa.array(list(range(1, 9)), pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 2, 3, 3, 4], pa.int64()),
            "ts": pa.array(
                [base, base + 1, base + 2,       # u1: full funnel in order
                 base + 5, base + 4,             # u2: click BEFORE signup
                 base, base + 9,                 # u3: signup then purchase (no click)
                 base],                          # u4: signup only
                pa.timestamp("us"),
            ),
            "event_type": pa.array(
                ["signup", "click", "purchase",
                 "signup", "click",
                 "signup", "purchase",
                 "signup"], pa.string()),
            "value": pa.array([1.0] * 8, pa.float64()),
            "props": pa.array(["{}"] * 8, pa.string()),
        }
    )
    out = (
        _ea.funnel_stages(rd.from_arrow(tbl).repartition(3))
        .to_pandas().set_index("user_id").sort_index()
    )
    assert out["stage"].tolist() == [3, 1, 1, 1]
    assert out.loc[1, "t2_us"] == base + 1 and out.loc[1, "t3_us"] == base + 2
    assert out.loc[2, "t2_us"] == 0  # click preceded signup → not counted


def test_daily_retention_counts():
    from medknowledgegraph_ray.stages import eventagg as _ea

    day_us = 86_400_000_000
    # u1 active d0,d1,d3; u2 active d0 only; u3 active d1,d2
    rows = [(1, 1, 0 * day_us + 5, 1.0), (2, 1, 1 * day_us + 5, 1.0),
            (3, 1, 3 * day_us + 5, 1.0), (4, 1, 3 * day_us + 9, 1.0),
            (5, 2, 0 * day_us + 1, 1.0),
            (6, 3, 1 * day_us + 1, 1.0), (7, 3, 2 * day_us + 1, 1.0)]
    out = (
        _ea.daily_retention(_events(rows).repartition(3))
        .to_pandas().set_index("day").sort_index()
    )
    assert out["n_active"].tolist() == [2, 2, 1, 1]   # d0,d1,d2,d3
    assert out["n_retained"].tolist() == [1, 1, 0, 0]  # u1 d0->d1; u3 d1->d2


@pytest.mark.parametrize("how", ["inner", "left", "outer"])
def test_equi_join_modes_match_pandas_randomized(how):
    from medknowledgegraph_ray.stages.join import equi_join

    rng = np.random.RandomState(29)
    for trial in range(3):
        # keys drawn from a small space so both sides have matches,
        # misses, and duplicates (probe side only; build keys unique)
        bkeys = rng.choice(np.arange(trial * 50, trial * 50 + 40), size=25,
                           replace=False).astype("int64")
        build_df = pd.DataFrame({"k": bkeys, "b": bkeys * 10})
        pkeys = rng.choice(np.arange(trial * 50, trial * 50 + 40), size=60,
                           replace=True).astype("int64")
        probe_df = pd.DataFrame({"k": pkeys,
                                 "p": np.arange(60, dtype="int64")})
        got = (
            equi_join(
                rd.from_pandas(build_df).repartition(1 + trial * 3),
                rd.from_pandas(probe_df).repartition(2 + trial * 2),
                "k", ["b"], ["p"], how=how,
            )
            .to_pandas()
        )
        pd_how = {"inner": "inner", "left": "right", "outer": "outer"}[how]
        exp = build_df.merge(probe_df, on="k", how=pd_how)
        # normalize nullables for comparison
        for df in (got, exp):
            df["b"] = df["b"].astype("float64")
            df["p"] = df["p"].astype("float64")
        got_n = _norm(got[["k", "b", "p"]])
        exp_n = _norm(exp[["k", "b", "p"]])
        assert got_n.equals(exp_n), (how, trial, len(got_n), len(exp_n))


@pytest.mark.parametrize("force_groupby", [False, True])
def test_join_many_matches_pandas_randomized(monkeypatch, force_groupby):
    from medknowledgegraph_ray.stages.joinmany import join_many

    if force_groupby:
        monkeypatch.setattr(windows, "EDGE_REPAIR_DRIVER_MAX", -1)
    rng = np.random.RandomState(41)
    for trial in range(3):
        # duplicates on BOTH sides, plus keys unique to each side
        lkeys = rng.choice(np.arange(0, 30), size=70, replace=True).astype("int64")
        rkeys = rng.choice(np.arange(10, 40), size=55, replace=True).astype("int64")
        ldf = pd.DataFrame({"k": lkeys, "a": np.arange(70, dtype="int64")})
        rdf = pd.DataFrame({"k": rkeys, "b": np.arange(55, dtype="int64") * 3})
        got = (
            join_many(
                rd.from_pandas(ldf).repartition(2 + trial * 2),
                rd.from_pandas(rdf).repartition(3 + trial),
                "k", ["a"], ["b"],
            )
            .to_pandas()
        )
        exp = ldf.merge(rdf, on="k", how="inner")
        got_n = _norm(got[["k", "a", "b"]])
        exp_n = _norm(exp[["k", "a", "b"]])
        assert got_n.equals(exp_n), (trial, len(got_n), len(exp_n))


def test_join_many_pair_guard_and_collision():
    from medknowledgegraph_ray.stages import joinmany

    one_key = pd.DataFrame({"k": pd.array([1] * 50, dtype="int64"),
                            "a": pd.array(range(50), dtype="int64")})
    with pytest.raises(ValueError, match="collide"):
        joinmany.join_many(rd.from_pandas(one_key), rd.from_pandas(one_key),
                           "k", ["a"], ["a"])


def test_video_frame_sampling_real_y4m_parse(sf_dir):
    """mm_video is a REAL container parse: sampled-frame features must
    equal an independent byte-level y4m walk, and corrupted bytes raise."""
    from medknowledgegraph_ray.sources import readers
    from medknowledgegraph_ray.stages import multimodal

    docs = readers.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    payloads = multimodal.to_y4m_payloads(docs).to_pandas()
    assert len(payloads) > 0
    assert all(p.startswith(b"YUV4MPEG2 W16 H8 ") for p in payloads["payload"])
    out = (
        multimodal.video_frame_features(multimodal.to_y4m_payloads(docs))
        .to_pandas()
    )
    by_doc = {d: g for d, g in out.groupby("doc_id")}
    for _, row in payloads.head(10).iterrows():
        p = row["payload"]
        # independent walk: header line, then FRAME\n + 16*8*3/2 bytes each
        body = p[p.index(b"\n") + 1:]
        fb = 16 * 8 * 3 // 2
        rec = len(b"FRAME\n") + fb
        assert len(body) % rec == 0
        n = len(body) // rec
        frames = [body[i * rec + 6 : (i + 1) * rec] for i in range(n)]
        g = by_doc[row["doc_id"]].sort_values("frame_idx")
        assert (g["n_frames"] == n).all()
        step = max(1, n // 8)
        assert g["frame_idx"].tolist() == list(range(0, min(n, step * 8), step))
        for _, fr in g.iterrows():
            y = np.frombuffer(frames[fr["frame_idx"]][: 16 * 8], dtype=np.uint8)
            assert fr["mean_luma_e6"] == int(round(float(y.mean()) * 1e6))
    with pytest.raises(Exception, match="FRAME|YUV4MPEG2"):
        multimodal._parse_y4m(b"YUV4MPEG2 W16 H8\nGARBAGE" + b"\x00" * 300)
    with pytest.raises(Exception, match="YUV4MPEG2"):
        multimodal._parse_y4m(b"RIFF not a video")


def test_audio_features_real_wave_decode(sf_dir):
    """mm_audio is a REAL decode: features must equal an independent
    stdlib-wave parse of the same payloads, and corrupted bytes raise."""
    import io
    import wave

    from medknowledgegraph_ray.sources import readers
    from medknowledgegraph_ray.stages import multimodal

    docs = readers.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    payloads = multimodal.to_wav_payloads(docs).to_pandas()
    assert len(payloads) > 0 and all(p[:4] == b"RIFF" for p in payloads["payload"])
    out = (
        multimodal.audio_features(multimodal.to_wav_payloads(docs))
        .to_pandas().set_index("doc_id")
    )
    for _, row in payloads.head(20).iterrows():
        with wave.open(io.BytesIO(row["payload"]), "rb") as w:
            n, rate = w.getnframes(), w.getframerate()
            x = np.frombuffer(w.readframes(n), dtype="<i2").astype(np.float64) / 32768.0
        got = out.loc[row["doc_id"]]
        assert got["n_samples"] == n and got["sample_rate"] == rate
        assert got["duration_ms"] == round(n * 1000 / rate)
        assert got["rms_e6"] == int(round(float(np.sqrt(np.mean(x * x))) * 1e6))
    with pytest.raises(Exception):  # corrupted payload fails loudly
        multimodal.AudioFeatureExtractor()(
            pa.table({"doc_id": pa.array([1], pa.int64()),
                      "payload": pa.array([b"not a wav"], pa.binary())})
        )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (stages/heavyhitters.py)
# ---------------------------------------------------------------------------

def _token_truth(rows, k):
    from collections import Counter

    from medknowledgegraph_ray.functions.text import TOKEN_RE

    cnt = Counter()
    for _, text in rows:
        cnt.update(TOKEN_RE.findall(text.lower()))
    df = pd.DataFrame(sorted(cnt.items()), columns=["token", "n"])
    df["n"] = df["n"].astype("int64")
    return (
        df.sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
        .head(k).reset_index(drop=True)
    )


def test_mg_prune_bounds():
    from collections import Counter

    from medknowledgegraph_ray.stages.heavyhitters import _prune

    cnt = Counter({f"t{i}": i + 1 for i in range(100)})
    pruned, d = _prune(cnt, 10)
    assert len(pruned) <= 10 and d > 0
    for t, c in pruned.items():
        # stored in [true - d, true]: the MG undercount guarantee
        assert cnt[t] - d <= c <= cnt[t]
    # survivors are exactly the entries whose count exceeds the pivot
    assert set(pruned) == {t for t, c in cnt.items() if c > d}


def test_top_tokens_mg_sketch_path_exact(monkeypatch):
    # skewed corpus, ample capacity: the sketch path must certify and
    # match ground truth WITHOUT touching the exact-groupby fallback
    from medknowledgegraph_ray.stages import heavyhitters

    rows = [(i, ("alpha beta " * (20 if i % 7 == 0 else 2))
             + f"rare{i} gamma delta epsilon word{i % 31}")
            for i in range(120)]

    def boom(*a, **kw):  # proves the fallback was not taken
        raise AssertionError("fallback taken")

    monkeypatch.setattr(heavyhitters, "_exact_topk", boom)
    out = heavyhitters.top_tokens_mg(_docs(rows).repartition(5), k=8)
    assert out.equals(_token_truth(rows, 8))


def test_top_tokens_mg_flat_corpus_falls_back_exact():
    # every token unique -> no separation possible at a tiny capacity;
    # the loud fallback must still produce the exact answer
    from medknowledgegraph_ray.stages import heavyhitters

    rows = [(i, f"u{i}a u{i}b u{i}c") for i in range(60)]
    out = heavyhitters.top_tokens_mg(_docs(rows).repartition(4), k=5, cap=8)
    assert out.equals(_token_truth(rows, 5))


# ---- ordered grouped aggregation + segment dedup (stages/orderedagg) ----

def _path_expect(df: pd.DataFrame) -> pd.DataFrame:
    s = df.sort_values(["k", "o"], kind="mergesort")
    g = s.groupby("k", sort=False)["v"]
    out = g.agg(lambda x: "|".join(map(str, x))).rename("seq").reset_index()
    out["n"] = g.size().to_numpy().astype("int64")
    return out[["k", "n", "seq"]]


@pytest.mark.parametrize("force_groupby", [False, True])
def test_ordered_concat_cross_block_runs(monkeypatch, force_groupby):
    from medknowledgegraph_ray.stages import orderedagg

    if force_groupby:
        monkeypatch.setattr(windows, "EDGE_REPAIR_DRIVER_MAX", -1)
    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame(
        {
            # few hot keys so runs straddle many block edges
            "k": rng.integers(0, 7, n).astype("int64"),
            "o": rng.permutation(n).astype("int64"),
            "v": [f"t{i % 13}" for i in range(n)],
        }
    )
    out = (
        orderedagg.ordered_concat(
            rd.from_pandas(df).repartition(9), "k", ["o"], "v", "|"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = _path_expect(df).sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["k", "n", "seq"]], exp)


@pytest.mark.parametrize("force_groupby", [False, True])
def test_keep_first_matches_pandas(monkeypatch, force_groupby):
    from medknowledgegraph_ray.stages import orderedagg

    if force_groupby:
        monkeypatch.setattr(windows, "EDGE_REPAIR_DRIVER_MAX", -1)
    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame(
        {
            "g": [f"s{v}" for v in rng.integers(0, 40, n)],
            "ord": rng.permutation(n).astype("int64"),
            "payload": rng.integers(0, 1000, n).astype("int64"),
        }
    )
    out = (
        orderedagg.keep_first(rd.from_pandas(df).repartition(8), "g", "ord")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["g", "ord"], kind="mergesort")
        .drop_duplicates("g", keep="first")
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[list(exp.columns)], exp)


@pytest.mark.parametrize("force_groupby", [False, True])
def test_keep_first_multi_order_with_counts(monkeypatch, force_groupby):
    from medknowledgegraph_ray.stages import orderedagg

    if force_groupby:
        monkeypatch.setattr(windows, "EDGE_REPAIR_DRIVER_MAX", -1)
    rng = np.random.default_rng(23)
    n = 400
    df = pd.DataFrame(
        {
            "g": [f"s{v}" for v in rng.integers(0, 9, n)],  # hot keys
            "o1": [f"src{v}" for v in rng.integers(0, 3, n)],
            "o2": rng.permutation(n).astype("int64"),
            "payload": rng.integers(0, 1000, n).astype("int64"),
        }
    )
    out = (
        orderedagg.keep_first(
            rd.from_pandas(df).repartition(7), "g", ["o1", "o2"], count_col="cnt"
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["g", "o1", "o2"], kind="mergesort")
        .drop_duplicates("g", keep="first")
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp["cnt"] = (
        df.groupby("g").size().loc[exp["g"]].to_numpy().astype("int64")
    )
    pd.testing.assert_frame_equal(out[list(exp.columns)], exp)


def test_seg_dedup_semantics():
    from medknowledgegraph_ray.stages import orderedagg

    seg_a = " ".join(f"a{i}" for i in range(15))
    seg_b = " ".join(f"b{i}" for i in range(15))
    seg_c = " ".join(f"c{i}" for i in range(15))
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([1, 2, 3], dtype="int64"),
            "text": [
                seg_a + " " + seg_b,  # original
                seg_a + " " + seg_b,  # full duplicate -> vanishes
                seg_b + " " + seg_c,  # partial -> keeps only seg_c
            ],
        }
    )
    out = (
        orderedagg.seg_dedup(rd.from_pandas(docs).repartition(3), seg_words=15)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 3]
    assert out["n_kept"].tolist() == [2, 1]
    assert out.loc[0, "text"] == seg_a + " " + seg_b
    assert out.loc[1, "text"] == seg_c


def test_dup_cluster_sizes_histogram():
    from medknowledgegraph_ray.stages import dedupe

    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(7), dtype="int64"),
            "text": ["a", "a", "a", "b", "b", "c", "d"],
        }
    )
    out = (
        dedupe.dup_cluster_sizes(rd.from_pandas(docs).repartition(4))
        .to_pandas().sort_values("cluster_size").reset_index(drop=True)
    )
    assert out["cluster_size"].tolist() == [1, 2, 3]
    assert out["n_clusters"].tolist() == [2, 1, 1]


def test_activity_coverage_islands():
    from medknowledgegraph_ray.stages import windows

    # halo 100µs; user 1 at ts 0, 50, 300 -> islands [0,150] + [300,400]
    # = 250µs; user 2 single event -> 100µs
    ev = pd.DataFrame(
        {
            "event_id": pd.array([1, 2, 3, 4], dtype="int64"),
            "ts": pd.to_datetime([0, 50, 300, 999], unit="us").astype("datetime64[us]"),
            "user_id": pd.array([1, 1, 1, 2], dtype="int64"),
            "event_type": ["a"] * 4,
            "value": [1.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    out = (
        windows.activity_coverage(rd.from_pandas(ev).repartition(3), halo_sec=0.0001)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    assert out["n_islands"].tolist() == [2, 1]
    assert out["coverage_us"].tolist() == [250, 100]


def test_time_window_sum_randomized_vs_duckdb():
    from medknowledgegraph_ray.stages import windows

    rng = np.random.default_rng(13)
    n = 4000
    # dense ts with many exact collisions to stress peer semantics
    ts_us = rng.integers(0, 2_000, n) * 1_000_000
    ev = pd.DataFrame(
        {
            "event_id": pd.array(np.arange(n), dtype="int64"),
            "ts": pd.to_datetime(ts_us, unit="us").astype("datetime64[us]"),
            "user_id": pd.array(rng.integers(0, 25, n), dtype="int64"),
            "event_type": ["a"] * n,
            "value": rng.integers(0, 1000, n) / 4.0,
            "props": ["{}"] * n,
        }
    )
    out = (
        windows.time_window_sum(rd.from_pandas(ev).repartition(9), window_sec=300)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("ev", ev)
    exp = con.sql(
        "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
        " CAST(round(value * 1000000) AS BIGINT) AS value_e6 FROM ev)"
        " SELECT user_id, event_id, ts_us, value_e6,"
        " CAST(SUM(value_e6) OVER (PARTITION BY user_id ORDER BY ts_us"
        "  RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW) AS BIGINT)"
        "  AS win_sum_e6 FROM e ORDER BY event_id"
    ).df()
    con.close()
    pd.testing.assert_frame_equal(out[list(exp.columns)], exp)


def test_time_window_sum_peers_and_boundaries():
    from medknowledgegraph_ray.stages import windows

    # user 1 at ts (µs): 0, 50, 100, 100, 161 with window 100µs
    # row at 161: frame [61, 161] -> excludes 0 and 50
    # rows at 100 (peers): frame [0, 100] includes BOTH 100s + 50 + 0
    ev = pd.DataFrame(
        {
            "event_id": pd.array([1, 2, 3, 4, 5], dtype="int64"),
            "ts": pd.to_datetime([0, 50, 100, 100, 161], unit="us").astype("datetime64[us]"),
            "user_id": pd.array([1] * 5, dtype="int64"),
            "event_type": ["a"] * 5,
            "value": [1.0, 2.0, 4.0, 8.0, 16.0],
            "props": ["{}"] * 5,
        }
    )
    out = (
        windows.time_window_sum(rd.from_pandas(ev).repartition(3), window_sec=0.0001)
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    # window_sec 0.0001 -> 100µs
    assert out["win_sum_e6"].tolist() == [
        1_000_000,            # [−100, 0]: just itself
        3_000_000,            # [−50, 50]: 1+2
        15_000_000,           # [0, 100]: 1+2+4+8 (peer included)
        15_000_000,           # same frame for the peer
        28_000_000,           # [61, 161]: 4+8+16
    ]


def test_lev_le1_kernel_and_typo_pairs_guard():
    from medknowledgegraph_ray.stages import editdist

    le1 = editdist._lev_le1
    assert le1("receive", "recieve") is False      # transposition = 2 edits
    assert le1("receive", "receive") is True
    assert le1("receive", "rezeive") is True       # substitution
    assert le1("receive", "receives") is True      # insertion
    assert le1("receive", "recive") is True        # deletion
    assert le1("banana", "bananas") is True
    assert le1("abc", "abcde") is False            # distance 2

    # hot-variant bucket must fail loudly — exercise the kernel directly
    # (driver-side, deterministic; the Ray path wraps the same function)
    frame = pd.DataFrame(
        {"variant": ["aa00"] * 30, "tok": [f"aa00{i}" for i in range(30)]}
    )
    import pytest as _pytest
    old = editdist.MAX_BUCKET
    editdist.MAX_BUCKET = 3
    try:
        with _pytest.raises(RuntimeError, match="variant bucket"):
            editdist._expand_variant_pairs(frame)
    finally:
        editdist.MAX_BUCKET = old


def test_typo_pairs_matches_brute_force():
    from medknowledgegraph_ray.stages import editdist

    rng = np.random.default_rng(5)
    base = ["gradient", "gradiant", "gradients", "descent", "descend",
            "descents", "softmax", "sofmax", "logits", "digits", "dights",
            "attention", "atention", "attentions", "pooling", "cooling"]
    texts = [" ".join(rng.choice(base, 6)) for _ in range(40)]
    docs = pd.DataFrame({"text": texts})
    out = editdist.typo_pairs(rd.from_pandas(docs).repartition(7), min_len=6)
    got = {tuple(r) for r in out.to_pandas()[["tok_a", "tok_b"]].values}
    vocab = sorted({t for txt in texts for t in txt.split() if len(t) >= 6})

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    exp = {(a, b) for i, a in enumerate(vocab) for b in vocab[i + 1:]
           if lev(a, b) <= 1}
    assert got == exp


def test_quantile_sketch_within_rank_band():
    from medknowledgegraph_ray.stages import sketch

    rng = np.random.default_rng(3)
    n, comp = 100_000, 512
    vals = rng.lognormal(0.0, 2.0, n)  # heavy-tailed, adversarial for bins
    df = pd.DataFrame({"value": pd.array(vals, dtype="float64")})
    srt = np.sort(vals)
    for parts in (1, 16, 64):
        out = sketch.quantile_sketch(
            rd.from_pandas(df).repartition(parts), "value",
            qs=(0.5, 0.9, 0.99), compactor=comp,
        )
        for q, est in zip(out["q"], out["estimate"]):
            # guaranteed one-sided rank band: ≤ N/compactor off the target
            rank = np.searchsorted(srt, est, side="right")
            tol = n / comp + parts  # + per-block integer-split slack
            assert abs(rank - q * n) <= tol, (parts, q, rank, q * n)


def test_quantile_sketch_hierarchical_path_within_band(monkeypatch):
    from medknowledgegraph_ray.stages import sketch

    rng = np.random.default_rng(17)
    n, comp = 60_000, 256
    vals = rng.normal(0.0, 10.0, n)
    df = pd.DataFrame({"value": pd.array(vals, dtype="float64")})
    srt = np.sort(vals)
    # force the hierarchical re-compaction pass (an extra N/compactor of
    # one-sided error on top of the per-block band)
    monkeypatch.setattr(sketch, "DRIVER_SUMMARY_MAX", 100)
    out = sketch.quantile_sketch(
        rd.from_pandas(df).repartition(32), "value", qs=(0.5, 0.95),
        compactor=comp,
    )
    for q, est in zip(out["q"], out["estimate"]):
        rank = np.searchsorted(srt, est, side="right")
        tol = 2 * n / comp + 64
        assert abs(rank - q * n) <= tol, (q, rank, q * n)


def test_quantile_sketch_empty_and_exact_on_small():
    from medknowledgegraph_ray.stages import sketch

    empty = pd.DataFrame({"value": pd.array([], dtype="float64")})
    out = sketch.quantile_sketch(rd.from_pandas(empty), "value")
    assert out["estimate"].isna().all()
    # compactor >= n: the sketch degenerates to the exact lower quantile
    small = pd.DataFrame({"value": pd.array(np.arange(100.0), dtype="float64")})
    out = sketch.quantile_sketch(
        rd.from_pandas(small).repartition(1), "value", qs=(0.5,), compactor=512
    )
    assert out["estimate"].tolist() == [49.0]


def test_event_type_cooccurrence_partition_invariant():
    from medknowledgegraph_ray.stages import eventagg

    # user 1: {a,b,c} -> ab ac bc; user 2: {a,b} -> ab; user 3: {c} -> none
    types = {1: ["a", "b", "c", "a"], 2: ["b", "a"], 3: ["c", "c"]}
    rows = [(u, t) for u, ts in types.items() for t in ts]
    ev = pd.DataFrame(
        {
            "event_id": pd.array(range(len(rows)), dtype="int64"),
            "ts": pd.to_datetime(range(len(rows)), unit="s").astype("datetime64[us]"),
            "user_id": pd.array([u for u, _ in rows], dtype="int64"),
            "event_type": [t for _, t in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    exp = {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
    for parts in (1, 5):
        out = (
            eventagg.event_type_cooccurrence(rd.from_pandas(ev).repartition(parts))
            .to_pandas()
        )
        got = {(r.type_a, r.type_b): r.n_users for r in out.itertuples()}
        assert got == exp, (parts, got)


def test_weighted_sample_deterministic_and_weight_biased():
    from medknowledgegraph_ray.stages import shuffle as sh

    n = 20_000
    df = pd.DataFrame(
        {
            "doc_id": pd.array(np.arange(n), dtype="int64"),
            # second half 100x heavier
            "n_chars": pd.array(
                np.where(np.arange(n) < n // 2, 1, 100), dtype="int64"
            ),
        }
    )
    outs = [
        sh.weighted_sample_k(rd.from_pandas(df).repartition(p), k=50)
        for p in (1, 8)
    ]
    # partition-invariant and deterministic
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # heavy rows dominate the sample (100:1 weights -> expect ~99% heavy)
    heavy = (outs[0]["doc_id"] >= n // 2).mean()
    assert heavy > 0.8, heavy
    # zero-weight rows can never be sampled
    df0 = df.assign(n_chars=pd.array(np.zeros(n, dtype=np.int64), dtype="int64"))
    assert len(sh.weighted_sample_k(rd.from_pandas(df0), k=50)) == 0


def test_bloom_no_false_negatives_and_bounded_fp():
    from medknowledgegraph_ray.stages import bloom

    rng = np.random.default_rng(7)
    members = rng.choice(10_000_000, size=50_000, replace=False).astype(np.int64)
    bits = bloom.build_bloom(members)
    # every inserted id MUST pass (the join-correctness invariant)
    assert bloom.bloom_contains(bits, members).all()
    # non-members pass only at ~(1-e^{-kn/m})^k ≈ 0.24% for these params
    outsiders = (members.max() + 1 + np.arange(100_000)).astype(np.int64)
    fp = bloom.bloom_contains(bits, outsiders).mean()
    assert fp < 0.01, fp


def test_bloom_prefilter_keeps_exactly_survivors():
    from medknowledgegraph_ray.stages import bloom

    probe = pd.DataFrame(
        {
            "custkey": pd.array(np.arange(2000, dtype=np.int64), dtype="int64"),
            "payload": pd.array(np.arange(2000, dtype=np.int64) * 7, dtype="int64"),
        }
    )
    build = np.arange(0, 2000, 5, dtype=np.int64)  # every 5th key
    out = bloom.bloom_prefilter(
        rd.from_pandas(probe).repartition(4), "custkey", build
    ).to_pandas()
    kept = set(out["custkey"])
    assert set(build) <= kept  # no false negatives, across partitions
    # payload rides through untouched
    assert (out["payload"] == out["custkey"] * 7).all()


def test_global_row_number_partition_invariant():
    from medknowledgegraph_ray.stages import ranks

    rng = np.random.default_rng(11)
    n = 5000
    df = pd.DataFrame(
        {
            "doc_id": pd.array(rng.permutation(n).astype(np.int64), dtype="int64"),
            "n_chars": pd.array(rng.integers(0, 50, n).astype(np.int64), dtype="int64"),
        }
    )
    exp = df.sort_values(["n_chars", "doc_id"], kind="mergesort").reset_index(drop=True)
    exp["rn"] = pd.array(np.arange(1, n + 1), dtype="int64")
    for parts in (1, 7, 64):
        out = (
            ranks.global_row_number(
                rd.from_pandas(df).repartition(parts), ["n_chars", "doc_id"]
            )
            .to_pandas()
            .sort_values("rn")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out[["doc_id", "n_chars", "rn"]],
                                      exp[["doc_id", "n_chars", "rn"]])


def test_gap_stats_single_event_users_and_ties():
    from medknowledgegraph_ray.stages import windows

    # user 1: ts 0,10,10,25 -> gaps 10,0,15; user 2: single event -> no row
    ev = pd.DataFrame(
        {
            "event_id": pd.array([1, 2, 3, 4, 5], dtype="int64"),
            "ts": pd.to_datetime([0, 10, 10, 25, 99], unit="us").astype("datetime64[us]"),
            "user_id": pd.array([1, 1, 1, 1, 2], dtype="int64"),
            "event_type": ["a"] * 5,
            "value": [1.0] * 5,
            "props": ["{}"] * 5,
        }
    )
    out = windows.gap_stats(rd.from_pandas(ev).repartition(3)).to_pandas()
    assert out["user_id"].tolist() == [1]
    assert out["n_gaps"].tolist() == [3]
    assert out["gap_min_us"].tolist() == [0]
    assert out["gap_max_us"].tolist() == [15]
    assert out["gap_sum_us"].tolist() == [25]


def test_anti_join_cols_payload_and_repeated_keys():
    from medknowledgegraph_ray.stages import setops

    rng = np.random.default_rng(47)
    lkeys = rng.integers(0, 60, 300).astype(np.int64)
    left = rd.from_pandas(
        pd.DataFrame(
            {
                "k": pd.array(lkeys, dtype="int64"),
                "a": pd.array(np.arange(300), dtype="int64"),
                "b": pd.array(lkeys * 10, dtype="int64"),
            }
        )
    ).repartition(7)
    rkeys = np.array([3, 3, 7, 20, 20, 41, 90, 91], dtype=np.int64)
    right = rd.from_pandas(
        pd.DataFrame({"k": pd.array(rkeys, dtype="int64")})
    ).repartition(3)
    out = setops.anti_join_cols(
        left, right, key="k", cols=["a", "b"], dtypes={"a": "int64", "b": "int64"}
    ).to_pandas()
    blocked = set(rkeys.tolist())
    exp = sorted(i for i, k in enumerate(lkeys.tolist()) if k not in blocked)
    assert sorted(out["a"]) == exp
    # payloads ride unchanged: b == k * 10 on every surviving row
    assert (out["b"].to_numpy() == out["k"].to_numpy() * 10).all()
    # empty right keeps every left row with payloads intact
    empty = rd.from_pandas(pd.DataFrame({"k": pd.array([], dtype="int64")}))
    kept = setops.anti_join_cols(
        left, empty, key="k", cols=["a", "b"], dtypes={"a": "int64", "b": "int64"}
    )
    assert kept.count() == 300


def test_attach_dim_paths_row_identical(sf_dir):
    """nation_volume's size-gated dim attach: broadcast and sorted-exchange
    join paths must be row-identical (the forced-path parity convention)."""
    from medknowledgegraph_ray.pipelines import analytics

    a = _norm(analytics.nation_volume(sf_dir, force_dim="broadcast").to_pandas())
    b = _norm(analytics.nation_volume(sf_dir, force_dim="join").to_pandas())
    assert a.shape == b.shape and a.equals(b)


def test_semi_filter_paths_row_identical(sf_dir):
    """min_cost_part's dimension-predicate semi-join: the broadcast
    sorted-key-array path and the sorted-merge equi-join path must be
    row-identical (forced-path parity convention)."""
    from medknowledgegraph_ray.pipelines import analytics

    a = _norm(analytics.min_cost_part(sf_dir, force_dim="broadcast").to_pandas())
    b = _norm(analytics.min_cost_part(sf_dir, force_dim="join").to_pandas())
    assert a.shape == b.shape and a.equals(b)


def test_epoch_oversample_copy_counts():
    """floor(w) copies always; the fractional extra copy appears for
    exactly the keyed fraction; epoch indices are 0..copies-1."""
    from medknowledgegraph_ray.stages.shuffle import epoch_oversample

    n = 4000
    docs = rd.from_arrow(
        pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "source": pa.array(["w" if i % 2 else "x" for i in range(n)]),
        })
    )
    out = epoch_oversample(docs, {"w": 2.25, "x": 0.5}, default=1.0).to_pandas()
    per = out.groupby("doc_id").agg(c=("epoch", "size"), mx=("epoch", "max"))
    assert (per["mx"] == per["c"] - 1).all()  # epochs are 0..copies-1
    w = per.join(pd.Series(["w" if i % 2 else "x" for i in range(n)],
                           name="src"))
    wc = w[w["src"] == "w"]["c"]
    xc = per.reindex(range(0, n, 2)).fillna({"c": 0})["c"]
    assert set(wc.unique()) <= {2, 3}
    # fractional picks land near the target rates (keyed, not RNG)
    assert abs((wc == 3).mean() - 0.25) < 0.05
    assert abs(xc.eq(1).sum() / (n / 2) - 0.5) < 0.05


def test_attach_dim_missing_fk_fails_loudly():
    from medknowledgegraph_ray.pipelines.analytics import _attach_dim

    probe = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 99], pa.int64()),
                  "v": pa.array([10, 20, 30], pa.int64())})
    )
    dim = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "d": pa.array([5, 6, 7], pa.int64())})
    )
    with pytest.raises(Exception, match="missing from dim"):
        _attach_dim(probe, dim, "k", ["d"], ["v"], force="broadcast").to_pandas()


def test_grouped_hll_envelope_and_partition_independence(sf_dir):
    """Grouped HLL distinct-users lands inside the standard error envelope
    of the exact per-group count and is partitioning-independent."""
    import duckdb as _duck

    from medknowledgegraph_ray.sources import readers
    from medknowledgegraph_ray.stages import sketch

    ev = readers.read_table(sf_dir, "events", columns=["event_type", "user_id"])
    out = sketch.grouped_distinct_hll(ev, "event_type", "user_id", p=12)
    con = _duck.connect()
    exact = dict(con.execute(
        f"SELECT event_type, COUNT(DISTINCT user_id)"
        f" FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1"
    ).fetchall())
    con.close()
    assert set(out["event_type"]) == set(exact)
    m = 1 << 12
    tol = 3 * 1.04 / (m ** 0.5)  # 3 sigma of the standard HLL error
    for g, a in zip(out["event_type"], out["approx_distinct"]):
        x = exact[g]
        assert abs(int(a) - x) <= max(2, tol * x), (g, int(a), x)
    o2 = sketch.grouped_distinct_hll(ev.repartition(7), "event_type", "user_id", p=12)
    assert out.equals(o2)


def _ev_frame(vals, users=None):
    n = len(vals)
    users = users if users is not None else [1] * n
    return pd.DataFrame(
        {
            "event_id": pd.array(range(1, n + 1), dtype="int64"),
            "ts": pd.to_datetime(range(n), unit="us").astype("datetime64[us]"),
            "user_id": pd.array(users, dtype="int64"),
            "event_type": ["a"] * n,
            "value": [float(v) for v in vals],
            "props": ["{}"] * n,
        }
    )


def test_mad_matches_brute_force_randomized():
    rng = np.random.RandomState(11)
    vals = np.round(rng.normal(10, 4, size=300), 3)
    users = rng.randint(1, 8, size=300)
    out = (
        windows.mad_events(rd.from_pandas(_ev_frame(vals, users)).repartition(7))
        .to_pandas().set_index("user_id").sort_index()
    )
    for u in np.unique(users):
        v = np.sort(np.round(vals[users == u] * 1000).astype(np.int64))
        n = len(v)
        med_x2 = int(v[(n - 1) // 2]) + int(v[n // 2])
        d = np.sort(np.abs(2 * v - med_x2))
        mad_x4 = int(d[(n - 1) // 2]) + int(d[n // 2])
        assert out.loc[u, "n_events"] == n
        assert out.loc[u, "med_x2_e3"] == med_x2
        assert out.loc[u, "mad_x4_e3"] == mad_x4


def test_winsorize_clamps_at_exact_discrete_quantiles():
    from medknowledgegraph_ray.stages import selection

    vals = list(range(1, 101))  # 1..100 -> p05 = 5, p95 = 95 (ceil(q*n)-1)
    out = (
        selection.winsorize(rd.from_pandas(_ev_frame(vals)).repartition(5))
        .to_pandas().set_index("event_id").sort_index()
    )
    w = out["w_e6"].to_numpy()
    assert w.min() == 5_000_000 and w.max() == 95_000_000
    assert (out.loc[50, "w_e6"] == out.loc[50, "value_e6"] == 50_000_000)
    assert int((w == 5_000_000).sum()) == 5 and int((w == 95_000_000).sum()) == 6


def test_dim_stats_matches_numpy_sums():
    rng = np.random.RandomState(3)
    m = rng.normal(size=(40, 5)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table({"embedding": pa.array([list(r) for r in m],
                                        pa.list_(pa.float32()))})
    ).repartition(4)
    out = ann.dim_stats(ds).to_pandas().set_index("dim").sort_index()
    q = np.round(m.astype(np.float64) * 1048576.0).astype(np.int64)
    assert out["n"].tolist() == [40] * 5
    assert out["s1_q"].tolist() == q.sum(axis=0).tolist()
    assert out["s2_q"].tolist() == (q * q).sum(axis=0).tolist()
    s1 = q.sum(axis=0).astype(np.float64)
    assert np.array_equal(out["mean_q"].to_numpy(), np.round(s1 / 40.0, 6))


def test_needle_hits_counts_non_overlapping():
    ds = _docs([
        (1, "ab ab ab"),        # 3 hits of 'ab', non-overlap trivially
        (2, "aaa"),             # 'aa' overlaps: greedy left-to-right -> 1
        (3, "no match here"),
        (4, None),
    ])
    out = textstats.needle_hits(ds, ["ab", "aa"]).to_pandas()
    got = {(r.doc_id, r.needle): r.n_hits for r in out.itertuples()}
    assert got == {(1, "ab"): 3, (2, "aa"): 1}


def test_lineitem_unpivot_shape_and_values(sf_dir):
    from medknowledgegraph_ray.pipelines import analytics

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    out = analytics.lineitem_unpivot(sf_dir).to_pandas()
    assert len(out) == 4 * len(li)
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic table —
    # compare the value multiset for one key pair per measure
    ok, ln = int(li["l_orderkey"].iloc[0]), int(li["l_linenumber"].iloc[0])
    src = li[(li["l_orderkey"] == ok) & (li["l_linenumber"] == ln)]
    one = out[(out["l_orderkey"] == ok) & (out["l_linenumber"] == ln)]
    for measure, col in [("quantity", "l_quantity"), ("tax", "l_tax")]:
        got = sorted(one[one["measure"] == measure]["val_e2"])
        want = sorted(np.round(src[col].to_numpy() * 100).astype(np.int64))
        assert got == list(want)


def _graph_edges(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    return rd.from_arrow(
        pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    )


def test_triangles_known_counts_and_forced_distributed(monkeypatch):
    from medknowledgegraph_ray.stages import graphalgo

    # K4 (4 triangles) plus a pendant edge (adds none)
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 9)]
    want = {"n_nodes": 5, "n_edges": 7, "n_triangles": 4}
    got = graphalgo.triangle_count(_graph_edges(k4)).to_pandas().iloc[0].to_dict()
    assert got == want
    monkeypatch.setattr(graphalgo, "SMALL_GRAPH_EDGES", 0)
    got_d = graphalgo.triangle_count(
        _graph_edges(k4).repartition(3)
    ).to_pandas().iloc[0].to_dict()
    assert got_d == want


def test_triangles_driver_matches_brute_force_random():
    from itertools import combinations

    from medknowledgegraph_ray.stages import graphalgo

    rng = np.random.RandomState(7)
    nodes = list(range(12))
    pairs = [p for p in combinations(nodes, 2) if rng.rand() < 0.35]
    adj = {frozenset(p) for p in pairs}
    brute = sum(
        1
        for t in combinations(nodes, 3)
        if {frozenset((t[0], t[1])), frozenset((t[0], t[2])),
            frozenset((t[1], t[2]))} <= adj
    )
    got = graphalgo.triangle_count(_graph_edges(pairs)).to_pandas().iloc[0]
    assert int(got["n_triangles"]) == brute


def test_pagerank_paths_row_identical_and_mass_conserving(monkeypatch):
    from medknowledgegraph_ray.stages import graphalgo

    # symmetrized star (center 0) + a 3-cycle tail
    und = [(0, 1), (0, 2), (0, 3), (0, 4), (3, 5), (4, 5), (3, 4)]
    ed = pa.table(
        {
            "node": pa.array([p[0] for p in und] + [p[1] for p in und], pa.int64()),
            "dst": pa.array([p[1] for p in und] + [p[0] for p in und], pa.int64()),
        }
    )
    drv = graphalgo.pagerank(rd.from_arrow(ed), iters=4).to_pandas()
    drv = drv.sort_values("node").reset_index(drop=True)
    # mass conservation up to floor losses: sum <= R_TOT, within n*iters ulps
    assert 0 <= graphalgo.R_TOT - drv["rank"].sum() <= 6 * 5 * graphalgo.DAMP_DEN
    assert drv.loc[0, "rank"] == drv["rank"].max()  # hub dominates
    monkeypatch.setattr(graphalgo, "SMALL_GRAPH_EDGES", 0)
    dist = graphalgo.pagerank(rd.from_arrow(ed).repartition(3), iters=4).to_pandas()
    dist = dist.sort_values("node").reset_index(drop=True)
    assert drv.equals(dist)


def test_pagerank_requires_out_edges():
    from medknowledgegraph_ray.stages import graphalgo

    ed = pa.table(
        {"node": pa.array([1], pa.int64()), "dst": pa.array([2], pa.int64())}
    )
    with pytest.raises(ValueError, match="out-edge"):
        graphalgo.pagerank(rd.from_arrow(ed), iters=2)


def test_pagerank_distributed_keeps_source_only_nodes(monkeypatch):
    # A node with out-edges but NO in-edges (valid per the precondition)
    # gets no recv row in an iteration; the distributed path must keep it
    # via the left join + fill_null(0) instead of silently dropping it.
    from medknowledgegraph_ray.stages import graphalgo

    ed = pa.table(
        {"node": pa.array([1, 2, 3], pa.int64()),
         "dst": pa.array([2, 1, 1], pa.int64())}
    )
    drv = graphalgo.pagerank(rd.from_arrow(ed), iters=4).to_pandas()
    drv = drv.sort_values("node").reset_index(drop=True)
    assert set(drv["node"]) == {1, 2, 3}
    monkeypatch.setattr(graphalgo, "SMALL_GRAPH_EDGES", 0)
    dist = graphalgo.pagerank(rd.from_arrow(ed).repartition(2), iters=4).to_pandas()
    dist = dist.sort_values("node").reset_index(drop=True)
    assert drv.equals(dist)


def test_pagerank_distributed_rejects_dangling_nodes(monkeypatch):
    # dst-only node (no out-edge): the driver path raises; the distributed
    # path must raise the same ValueError, not silently compute over a
    # smaller node universe.
    from medknowledgegraph_ray.stages import graphalgo

    monkeypatch.setattr(graphalgo, "SMALL_GRAPH_EDGES", 0)
    ed = pa.table(
        {"node": pa.array([1, 2], pa.int64()),
         "dst": pa.array([2, 3], pa.int64())}
    )
    with pytest.raises(ValueError, match="out-edge"):
        graphalgo.pagerank(rd.from_arrow(ed).repartition(2), iters=2)


def test_triangles_driver_validates_contract_like_distributed():
    from medknowledgegraph_ray.stages import graphalgo

    with pytest.raises(ValueError, match="canonical"):
        graphalgo.triangle_count(_graph_edges([(2, 1)])).to_pandas()
    with pytest.raises(ValueError, match="duplicate"):
        graphalgo.triangle_count(_graph_edges([(1, 2), (1, 2)])).to_pandas()
    with pytest.raises(ValueError, match="31 bits"):
        graphalgo.triangle_count(_graph_edges([(1, 2**31)])).to_pandas()


def test_bm25_degenerate_corpora_return_typed_empty():
    from medknowledgegraph_ray.stages import tfidf

    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    )
    out = tfidf.bm25_scores(empty, ["alpha"])
    assert out.count() == 0 and out.schema().names == ["doc_id", "score_e6"]
    blank = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["", None], pa.string())})
    )
    out2 = tfidf.bm25_scores(blank, ["alpha"])
    assert out2.count() == 0 and out2.schema().names == ["doc_id", "score_e6"]


def test_dup_span_coverage_merges_overlaps_and_skips_short_docs():
    from medknowledgegraph_ray.stages import orderedagg

    span = "a b c d e f g h i j"              # 10 shared tokens
    ds = _docs([
        (1, "x1 x2 " + span + " y1 y2"),       # dup span at pos 3..12
        (2, span + " z1 " + span),             # two islands (gap 11 >= W)
        (3, "unique tokens only here"),        # < W tokens: no windows
        (4, "w1 " + span + " " + span),        # overlapping islands merge
    ])
    out = (
        orderedagg.dup_span_coverage(ds, win_words=10)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert out.loc[3, "dup_tokens"] == 0 and out.loc[3, "n_tokens"] == 4
    assert out.loc[1, "dup_tokens"] == 10
    # doc 2: islands [1,10] and [12,21] -> 20 covered tokens
    assert out.loc[2, "dup_tokens"] == 20 and out.loc[2, "n_tokens"] == 21
    # doc 4: spans [2,11] and [12,21] merge via the overlapping bridge
    # windows (every 10-gram of span+span repeats doc 2's) -> one island
    assert out.loc[4, "dup_tokens"] == 20
    # n_tokens is split(" ")-exact
    assert out.loc[1, "n_tokens"] == 14


def _dup_span_fixture():
    span = "a b c d e f g h i j"
    return _docs([
        (1, "x1 x2 " + span + " y1 y2"),
        (2, span + " z1 " + span),
        (3, "unique tokens only here"),
        (4, "w1 " + span + " " + span),
        (5, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12"),  # unique 10-grams
    ])


def test_dup_span_fp_collisions_killed_by_string_verify(monkeypatch):
    # Force EVERY window onto one fingerprint (0 keep-bits): phase 1 then
    # marks all windows as candidates and only the string re-verify pass
    # separates true duplicates from collisions — output must equal the
    # full-width-fingerprint result exactly.
    from medknowledgegraph_ray.stages import orderedagg

    want = (
        orderedagg.dup_span_coverage(_dup_span_fixture(), win_words=10)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert want.set_index("doc_id").loc[5, "dup_tokens"] == 0
    monkeypatch.setattr(orderedagg, "_FP_KEEP_BITS", 0)
    got = (
        orderedagg.dup_span_coverage(_dup_span_fixture(), win_words=10)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert want.equals(got)


def test_dup_span_distributed_paths_match_driver(monkeypatch):
    # default = driver verify path; force the distributed verify branch
    # (broadcast re-emission), then the distributed+join branch — all three
    # must be row-identical.
    from medknowledgegraph_ray.stages import orderedagg

    want = (
        orderedagg.dup_span_coverage(_dup_span_fixture(), win_words=10)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    monkeypatch.setattr(orderedagg, "DUP_VERIFY_DRIVER_MAX", -1)
    got_bcast = (
        orderedagg.dup_span_coverage(_dup_span_fixture(), win_words=10)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert want.equals(got_bcast)
    monkeypatch.setattr(orderedagg, "DUP_CAND_BROADCAST_MAX", -1)
    got_join = (
        orderedagg.dup_span_coverage(_dup_span_fixture(), win_words=10)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert want.equals(got_join)


def test_dup_span_no_duplicates_short_circuit():
    from medknowledgegraph_ray.stages import orderedagg

    ds = _docs([
        (1, " ".join(f"a{i}" for i in range(15))),
        (2, " ".join(f"b{i}" for i in range(15))),
    ])
    out = (
        orderedagg.dup_span_coverage(ds, win_words=10)
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert (out["dup_tokens"] == 0).all()
    assert out.loc[1, "n_tokens"] == 15 and out.loc[2, "n_tokens"] == 15


def test_bm25_ranking_and_zero_docs():
    import math

    from medknowledgegraph_ray.stages import tfidf

    ds = _docs([
        (1, "join join join filler filler"),   # heavy on the query term
        (2, "join filler filler filler filler"),
        (3, "filler words only here now"),     # no query term -> score 0
    ])
    out = (
        tfidf.bm25_scores(ds, ["join"]).to_pandas()
        .set_index("doc_id")["score_e6"]
    )
    assert out.loc[3] == 0
    assert out.loc[1] > out.loc[2] > 0
    # brute-force the same formula (n=3 docs, tl=15, df=2)
    def bm25(tf, dl, n=3, tl=15, df=2):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
        norm = 1.2 * ((1.0 - 0.75) + (((0.75 * dl) * n) / tl))
        return math.floor(idf * ((tf * 2.2) / (tf + norm)) * 1000000.0)
    assert out.loc[1] == bm25(3, 5) and out.loc[2] == bm25(1, 5)


def _sym_edges(pairs):
    node = [p[0] for p in pairs] + [p[1] for p in pairs]
    dst = [p[1] for p in pairs] + [p[0] for p in pairs]
    return rd.from_arrow(
        pa.table({"node": pa.array(node, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    )


def test_kcore_cascading_peel_and_forced_distributed(monkeypatch):
    from medknowledgegraph_ray.stages import graphalgo

    # K4 core (deg 3 each) + a pendant chain 4-5-6-7: k=2 peels the chain
    # one node per round (7, then 6, then 5) — a 3-round cascade
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
           (4, 5), (5, 6), (6, 7)]
    want = {1: 3, 2: 3, 3: 3, 4: 3}
    got = (
        graphalgo.kcore(_sym_edges(und), k=2).to_pandas()
        .set_index("node")["deg"].to_dict()
    )
    assert got == want
    monkeypatch.setattr(graphalgo, "SMALL_GRAPH_EDGES", 0)
    got_d = (
        graphalgo.kcore(_sym_edges(und).repartition(3), k=2).to_pandas()
        .set_index("node")["deg"].to_dict()
    )
    assert got_d == want
    # k above the max degree empties the graph on both paths
    assert graphalgo.kcore(_sym_edges(und), k=5).count() == 0
    assert graphalgo.kcore(_sym_edges(und).repartition(2), k=5).count() == 0


def test_kcore_oracle_unroll_covers_true_depth(sf_dir):
    # The graph_kcore oracle unrolls a FIXED 16 peel rounds; it is only
    # exact when 16 ≥ the true peel depth of the input graph.  Tie the
    # unroll to the engine's observed depth with a ≥4-round margin so a
    # datagen change that deepens the peel fails HERE, not as a silent
    # oracle-side mismatch in the parity sweep.
    from medknowledgegraph_ray.pipelines import analytics
    from medknowledgegraph_ray.stages import graphalgo

    ed = analytics._part_supplier_edges(sf_dir).to_pandas()
    _, depth = graphalgo._kcore_driver(
        ed["node"].to_numpy().astype(np.int64),
        ed["dst"].to_numpy().astype(np.int64),
        10,
    )
    assert depth + 4 <= 16, (
        f"kcore peel depth {depth} too close to the oracle's 16-round "
        "unroll — raise the unroll in __ray_entry__._kcore_sql"
    )


def test_normalize_vectors_unit_norm_and_zero_guard():
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([1, 2], pa.int64()),
                "embedding": pa.array(
                    [[3.0, 4.0, 0.0], [0.0, 0.0, 0.0]],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    out = ann.normalize_vectors(emb).to_pandas()
    v1 = out[out["vec_id"] == 1].sort_values("dim")["val_e6"].tolist()
    assert v1 == [600000, 800000, 0]          # (3,4,0)/5 in micro-units
    assert (out[out["vec_id"] == 2]["val_e6"] == 0).all()


def test_bigram_lm_broadcast_and_attach_paths_identical(monkeypatch, sf_dir):
    import math

    from medknowledgegraph_ray.stages import tfidf

    ds = _docs([
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "solo"),                      # 1 token: no bigram, no row
    ])
    bc = tfidf.bigram_logprob(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert set(bc["doc_id"]) == {1, 2}
    # hand-check doc 2: bigrams (the,cat) cb=2, (cat,ran) cb=1; ctx counts
    # the->2+? (the cat)x2 + (the mat) => the as context 3 times; cat ctx 2;
    # V = 7 distinct tokens
    v = 7.0
    exp = (
        round(1 * math.log(2 + 1.0) * 1e6)
        + round(1 * math.log(1 + 1.0) * 1e6)
        - round(1 * math.log(3 + v) * 1e6)   # ctx 'the' in doc 2 (tfc=1)
        - round(1 * math.log(2 + v) * 1e6)   # ctx 'cat' in doc 2 (tfc=1)
    )
    got = int(bc.loc[bc["doc_id"] == 2, "logprob_sum_e6"].iloc[0])
    assert got == exp and int(bc.loc[bc["doc_id"] == 2, "n_bigrams"].iloc[0]) == 2
    monkeypatch.setattr(tfidf, "VOCAB_BROADCAST_MAX", 0)
    dist = tfidf.bigram_logprob(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert bc.equals(dist)


def test_negative_samples_no_self_and_deterministic():
    from medknowledgegraph_ray.stages import shuffle as sh

    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([10, 20, 30, 40, 50], pa.int64())})
    )
    a = sh.negative_samples(docs, k=3).to_pandas().sort_values(
        ["doc_id", "j"]).reset_index(drop=True)
    b = sh.negative_samples(docs, k=3).to_pandas().sort_values(
        ["doc_id", "j"]).reset_index(drop=True)
    assert a.equals(b)                       # reproducible
    assert len(a) == 15
    assert (a["neg_id"] != a["doc_id"]).all()  # never a self pair
    assert set(a["neg_id"]).issubset({10, 20, 30, 40, 50})


def test_skyline_matches_brute_force_dominance():
    from medknowledgegraph_ray.stages import skyline

    rng = np.random.RandomState(11)
    x = rng.randint(0, 50, size=300).astype(np.int64)
    y = rng.randint(0, 50, size=300).astype(np.int64)
    ds = rd.from_arrow(
        pa.table({"x": pa.array(x), "y": pa.array(y)})
    ).repartition(5)
    got = (
        skyline.skyline_2d(ds, "x", "y").to_pandas()
        .sort_values("x").reset_index(drop=True)
    )
    # brute force: a point survives iff nothing has x' <= x, y' >= y with
    # one strict — evaluated on distinct per-x maxima
    import pandas as pd_
    pts = pd_.DataFrame({"x": x, "y": y}).groupby("x")["y"].max().reset_index()
    keep = []
    for _, r in pts.iterrows():
        dominated = (
            (pts["x"] <= r["x"]) & (pts["y"] >= r["y"])
            & ((pts["x"] < r["x"]) | (pts["y"] > r["y"]))
        ).any()
        if not dominated:
            keep.append((int(r["x"]), int(r["y"])))
    assert list(map(tuple, got[["x", "y"]].values.tolist())) == sorted(keep)


def test_anti_join_cols_string_payload_with_nonempty_right():
    """Regression: tag_right's np.zeros(dtype=object) filler put int 0
    objects into a string column; whether a mixed block hit an Arrow
    string conversion depended on sort partitioning (crashed at sf0.01,
    not sf0.001). String payloads must survive a non-empty right side."""
    from medknowledgegraph_ray.stages.setops import anti_join_cols

    left = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(list(range(40)), pa.int64()),
                "name": pa.array([f"n{i}" for i in range(40)], pa.string()),
                "v": pa.array([i * 10 for i in range(40)], pa.int64()),
            }
        )
    ).repartition(4)
    right = rd.from_arrow(
        pa.table({"k": pa.array([3, 7, 11, 35], pa.int64())})
    ).repartition(2)
    out = anti_join_cols(
        left, right, key="k", cols=["name", "v"],
        dtypes={"name": "object", "v": "int64"},
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert set(out["k"]) == set(range(40)) - {3, 7, 11, 35}
    assert (out["name"] == out["k"].map(lambda i: f"n{i}")).all()
    assert out["name"].map(type).eq(str).all()


def test_force_dist_env_zeroes_every_two_path_gate():
    """GRAFT_FORCE_DIST=1 must zero ALL two-path size gates (the over-gate
    rehearsal switch: the full sweep then runs the exact distributed
    branches a 100 TB corpus would take) and must leave the loud RAISE
    guards (hot-shingle / bloom-build bounds) untouched — zeroing those
    would reject valid input rather than reroute it.  Checked in a
    subprocess so the env var is seen at import time, as in a real run."""
    import os
    import subprocess
    import sys

    code = (
        "from medknowledgegraph_ray.stages import windows, graphalgo, dedupe,"
        " components, orderedagg, sketch, tfidf\n"
        "from medknowledgegraph_ray.pipelines import analytics\n"
        "gates = [windows.EDGE_REPAIR_DRIVER_MAX, graphalgo.SMALL_GRAPH_EDGES,"
        " dedupe.SMALL_VERIFY_IDS, dedupe.SMALL_VERIFY_PAIRS,"
        " components.SMALL_GRAPH_EDGES, orderedagg.DUP_CAND_BROADCAST_MAX,"
        " orderedagg.DUP_VERIFY_DRIVER_MAX, sketch.DRIVER_SUMMARY_MAX,"
        " tfidf.VOCAB_BROADCAST_MAX, analytics.DIM_BROADCAST_MAX]\n"
        "assert gates == [0] * 10, gates\n"
        "assert dedupe.HOT_BROADCAST_MAX > 0 and analytics.BLOOM_BUILD_MAX > 0\n"
        "assert dedupe.MAX_BUCKET > 0\n"
    )
    env = dict(os.environ, GRAFT_FORCE_DIST="1")
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # and the default (unset) values stay at their documented sizes
    from medknowledgegraph_ray.stages import windows

    assert windows.EDGE_REPAIR_DRIVER_MAX == 500_000


def test_forced_repair_output_is_exchangeable(sf_dir, monkeypatch):
    """Regression: with the distributed edge repair forced, every
    interior∪edge union must stay block-type-UNIFORM — a mixed
    pandas/Arrow union poisons any DOWNSTREAM exchange (repartition /
    sort reduce asserts in DelegatingBlockBuilder).  Chain each repaired
    output through a repartition+sort (the doc_dup_spans composition that
    exposed it) and compare against the driver-repair rows."""
    from medknowledgegraph_ray.sources import readers
    from medknowledgegraph_ray.stages import joinmany, orderedagg

    ev = lambda: readers.read_table(sf_dir, "events")  # noqa: E731
    docs = lambda: readers.read_table(sf_dir, "documents", columns=["doc_id", "text"])  # noqa: E731

    def through_exchange(ds):
        return _norm(ds.repartition(4).sort(ds.columns()[0]).to_pandas())

    makers = {
        "scaffold": lambda: windows.ranked_events(ev()),
        "rangejoin": lambda: _entry.queries()["ev_range_join"](sf_dir),
        "keep_first": lambda: orderedagg.keep_first(
            ev().select_columns(["user_id", "event_id"]),
            "user_id", "event_id", count_col="n"),
        "join_many": lambda: joinmany.join_many(
            ev().select_columns(["user_id", "event_id"]),
            ev().select_columns(["user_id", "event_id"]).limit(500).map_batches(
                lambda t: t.rename_columns(["user_id", "right_id"]),
                batch_format="pyarrow"),
            "user_id", ["event_id"], ["right_id"]),
        "dup_spans": lambda: orderedagg.dup_span_coverage(docs()),
    }
    want = {k: through_exchange(m()) for k, m in makers.items()}
    monkeypatch.setattr(windows, "EDGE_REPAIR_DRIVER_MAX", -1)  # force groupby
    monkeypatch.setattr(orderedagg, "DUP_CAND_BROADCAST_MAX", -1)
    monkeypatch.setattr(orderedagg, "DUP_VERIFY_DRIVER_MAX", -1)
    for k, m in makers.items():
        got = through_exchange(m())
        assert got.equals(want[k]) and len(got) > 0, k


def test_edge_jaccard_known_and_forced_distributed(monkeypatch):
    from medknowledgegraph_ray.stages import graphalgo

    # K4 plus a pendant edge: degrees 1:3 2:3 3:3 4:4 9:1
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 9)]
    # hand-computed (n_common, jaccard_e6 = (2e6 n + d) // (2 d)):
    # K4 edge not touching 4: |∩|=2, |∪|=4 -> 500000
    # K4 edge touching 4:     |∩|=2, |∪|=5 -> 400000
    # pendant (4,9):          |∩|=0        -> 0
    want = {
        (1, 2): (2, 500_000), (1, 3): (2, 500_000), (2, 3): (2, 500_000),
        (1, 4): (2, 400_000), (2, 4): (2, 400_000), (3, 4): (2, 400_000),
        (4, 9): (0, 0),
    }

    def as_map(ds):
        df = ds.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
        return {
            (int(r["a"]), int(r["b"])): (int(r["n_common"]), int(r["jaccard_e6"]))
            for _, r in df.iterrows()
        }

    got = as_map(graphalgo.edge_jaccard(_graph_edges(k4)))
    assert got == want
    monkeypatch.setattr(graphalgo, "SMALL_GRAPH_EDGES", 0)
    got_d = as_map(graphalgo.edge_jaccard(_graph_edges(k4).repartition(3)))
    assert got_d == want


def test_edge_jaccard_paths_match_on_random_graph(monkeypatch):
    from itertools import combinations

    from medknowledgegraph_ray.stages import graphalgo

    rng = np.random.RandomState(11)
    pairs = [p for p in combinations(range(14), 2) if rng.rand() < 0.3]
    want = graphalgo.edge_jaccard(_graph_edges(pairs)).to_pandas()
    want = want.sort_values(["a", "b"]).reset_index(drop=True)
    monkeypatch.setattr(graphalgo, "SMALL_GRAPH_EDGES", 0)
    got = graphalgo.edge_jaccard(_graph_edges(pairs).repartition(4)).to_pandas()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # degrees in the output must equal the true degrees
    deg: dict = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for _, r in want.iterrows():
        assert int(r["deg_a"]) == deg[int(r["a"])]
        assert int(r["deg_b"]) == deg[int(r["b"])]


def test_edge_jaccard_validates_contract_both_paths(monkeypatch):
    from medknowledgegraph_ray.stages import graphalgo

    bad_noncanon = _graph_edges([(2, 1)])
    bad_dup = _graph_edges([(1, 2), (1, 2)])
    with pytest.raises(ValueError, match="canonical"):
        graphalgo.edge_jaccard(bad_noncanon)
    with pytest.raises(ValueError, match="duplicate"):
        graphalgo.edge_jaccard(bad_dup)
    monkeypatch.setattr(graphalgo, "SMALL_GRAPH_EDGES", 0)
    with pytest.raises(Exception, match="canonical"):
        graphalgo.edge_jaccard(bad_noncanon).materialize()
    with pytest.raises(Exception, match="(?s)duplicate|unique"):
        graphalgo.edge_jaccard(bad_dup).materialize()


def test_boilerplate_strip_known_and_forced(monkeypatch):
    from medknowledgegraph_ray.stages import orderedagg, windows

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c d", "a b x y", "c d q"], pa.string()),
    }))
    # seg_words=2, max_df=2: "a b" (x2) and "c d" (x2) are boilerplate and
    # drop from EVERY doc; doc 1 is stripped to nothing and vanishes
    want = {2: (1, "x y"), 3: (1, "q")}

    def as_map(ds):
        df = ds.to_pandas()
        return {int(r["doc_id"]): (int(r["n_kept"]), r["text"])
                for _, r in df.iterrows()}

    got = as_map(orderedagg.boilerplate_strip(docs, seg_words=2, max_df=2))
    assert got == want
    monkeypatch.setattr(windows, "EDGE_REPAIR_DRIVER_MAX", -1)
    got_f = as_map(
        orderedagg.boilerplate_strip(docs.repartition(3), seg_words=2, max_df=2)
    )
    assert got_f == want


def test_link_predict_known_and_forced_distributed(monkeypatch):
    from medknowledgegraph_ray.stages import graphalgo

    # K4 + pendant (4,9): the only non-edge pairs with common neighbors
    # are (1,9), (2,9), (3,9) — each sharing exactly node 4
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 9)]
    want = [(1, 9, 1), (2, 9, 1), (3, 9, 1)]

    def as_rows(df):
        return [tuple(int(v) for v in r)
                for r in df[["a", "b", "n_common"]].itertuples(index=False)]

    got = as_rows(graphalgo.link_predict(_graph_edges(k4), k=5))
    assert got == want
    monkeypatch.setattr(graphalgo, "SMALL_GRAPH_EDGES", 0)
    got_d = as_rows(graphalgo.link_predict(_graph_edges(k4).repartition(3), k=5))
    assert got_d == want
