"""Driver contract for the graft builder (Ray Data target).

`entry()` runs the flagship triple-extraction pipeline at sf0.001.
`queries()` exposes one callable per implemented operator/pipeline from
SURVEY.md §2; `oracle_sql()` gives the DuckDB-equivalent SQL.  The KG
pipeline operates over the deterministic synthetic transcript corpus
(BASELINE.json input_hint) generated under /tmp/graft_kg — both the Ray
callables and the oracle SQL read the SAME generated parquet, so the
side-by-side check is meaningful.  Oracle SQL paths are fixed at sf0.01
(the driver's correctness scale).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from medknowledgegraph_ray import config, datagen
from medknowledgegraph_ray.pipelines import analytics, kg
from medknowledgegraph_ray.sources import readers
from medknowledgegraph_ray.stages import (
    ann,
    components,
    dedupe,
    eventagg,
    heavyhitters,
    multimodal,
    orderedagg,
    pack,
    pii,
    rangejoin,
    ranks,
    sketch,
    textstats,
    windows,
)
from medknowledgegraph_ray.stages import selection as selection_mod
from medknowledgegraph_ray.stages import shuffle as _shuffle

_SF001 = "/root/testdata/sf0.01"
_ANN_DIM = 64  # embeddings table vector length
_ANN_K = 10


def _gen_paths(sf_dir: str = _SF001) -> dict[str, str]:
    return {
        "transcripts": config.gen_dir(sf_dir) + "/*.parquet",
        "aliases": config.kb_dir() + "/aliases.parquet",
        "umls": config.kb_dir() + "/umls_kb.parquet",
        "gene_map": config.kb_dir() + "/gene_map.parquet",
        "protein_map": config.kb_dir() + "/protein_map.parquet",
        "snomed_map": config.kb_dir() + "/snomed_map.parquet",
        "clinical_features": config.kb_dir() + "/clinical_features.parquet",
    }


def _kg_ctes(
    sf_dir: str = _SF001,
    *,
    top_entities: int | None = None,
    top_cuis: int | None = None,
    score_min: float | None = None,
) -> str:
    """Shared WITH-block: the whole reference operator chain in ANSI SQL.

    Mirrors, stage by stage: mention detection (word-boundary regex join),
    per-doc entity dedup (entityrecognition.py:54-64), link dedup (:115),
    score filter + top-15 entities + top-4 CUIs (medgen.py:136-163), KB
    enrichment joins (medgen.py / uniprotpipe.py), GO unnest
    (uniprotpipe.py:124-136).
    """
    p = _gen_paths(sf_dir)
    top_entities = config.TOP_ENTITIES if top_entities is None else top_entities
    top_cuis = config.TOP_CUIS if top_cuis is None else top_cuis
    score_min = config.SCORE_MIN if score_min is None else score_min
    return f"""
WITH g_transcripts AS (SELECT * FROM read_parquet('{p["transcripts"]}')),
g_aliases AS (SELECT * FROM read_parquet('{p["aliases"]}')),
g_umls AS (SELECT * FROM read_parquet('{p["umls"]}')),
g_gene_map AS (SELECT * FROM read_parquet('{p["gene_map"]}')),
g_protein_map AS (SELECT * FROM read_parquet('{p["protein_map"]}')),
g_snomed_map AS (SELECT * FROM read_parquet('{p["snomed_map"]}')),
g_clinfeat AS (SELECT * FROM read_parquet('{p["clinical_features"]}')),
g_vocab AS (SELECT DISTINCT alias, sem_label FROM g_aliases),
g_mentions AS (
  SELECT DISTINCT t.conv_id, t.turn_idx, v.alias AS norm_surface, v.sem_label AS label
  FROM g_transcripts t JOIN g_vocab v
    ON regexp_matches(lower(t.text), '\\b' || v.alias || '\\b')
),
g_conv_entities AS (SELECT DISTINCT conv_id, norm_surface, label FROM g_mentions),
g_links AS (
  SELECT DISTINCT a.alias AS norm_surface, a.cui, a.alias_score AS score,
         k.canonical_name AS name, k.definition, a.sem_label AS label
  FROM g_aliases a JOIN g_umls k USING (cui)
  WHERE a.alias IN (SELECT DISTINCT norm_surface FROM g_mentions)
),
g_counts AS (
  SELECT norm_surface, label, CAST(count(*) AS BIGINT) AS n_convs
  FROM g_conv_entities GROUP BY norm_surface, label
),
g_top15 AS (
  SELECT norm_surface, label, n_convs FROM g_counts WHERE label = 'DISEASE'
  ORDER BY n_convs DESC, norm_surface ASC LIMIT {top_entities}
),
g_top4 AS (
  SELECT norm_surface, cui, score, name, definition, label FROM (
    SELECT l.*, row_number() OVER (
      PARTITION BY l.norm_surface ORDER BY l.score DESC, l.cui ASC) AS rn
    FROM g_links l
    WHERE l.score > {score_min}
      AND l.norm_surface IN (SELECT norm_surface FROM g_top15)
  ) WHERE rn <= {top_cuis}
),
g_sel AS (SELECT DISTINCT cui FROM g_top4),
g_genes AS (
  SELECT s.cui AS source, g.gene FROM g_sel s JOIN g_gene_map g USING (cui)
),
g_snomed AS (
  SELECT s.cui AS source, m.saui, m.snomed_text, m.scui, m.sab
  FROM g_sel s JOIN g_snomed_map m USING (cui)
),
g_cf AS (
  SELECT s.cui AS source, c.feat_cui, c.feat_type, c.name, c.definition
  FROM g_sel s JOIN g_clinfeat c USING (cui)
),
g_proteins AS (
  SELECT dg.gene AS source, p.entry,
         trim(split_part(p.protein_names, '(', 1)) AS name,
         p.protein_names, p.organism, p.function_text,
         'https://www.uniprot.org/uniprot/' || p.entry AS url
  FROM (SELECT DISTINCT gene FROM g_genes) dg
  JOIN g_protein_map p USING (gene)
),
g_go AS (
  SELECT source, regexp_extract(part, '\\[GO:(\\d+)\\]', 1) AS go_id,
         trim(regexp_replace(part, '\\s*\\[GO:\\d+\\]\\s*$', '')) AS go_name,
         array_to_string(list_slice(string_split(
           trim(regexp_replace(part, '\\s*\\[GO:\\d+\\]\\s*$', '')), ' '), 1, 2), ' ') AS go_type
  FROM (
    SELECT p.entry AS source, trim(unnest(string_split(k.go, ';'))) AS part
    FROM g_proteins p JOIN g_protein_map k ON p.entry = k.entry
  ) WHERE regexp_matches(part, '\\[GO:\\d+\\]')
)
"""


def _kg_sql(body: str, sf_dir: str = _SF001, **knobs) -> str:
    return _kg_ctes(sf_dir, **knobs) + body


def _abbrev_defs_subquery() -> str:
    """Distinct (conv_id, sf, lf) abbreviation definitions — the SQL twin of
    stages/abbrev.py:_parse_frag (Schwartz-Hearst right-to-left initials,
    1..MAX_LF_WORDS-word long forms, largest matching suffix wins)."""
    from medknowledgegraph_ray.stages.abbrev import MAX_LF_WORDS

    def lfm(m: int) -> str:
        return f"trim(regexp_extract(frag, '((?:[a-z]+ ){{{m}}})\\(', 1))"

    def inits(m: int) -> str:
        return " || ".join(
            f"substr(split_part({lfm(m)}, ' ', {i}), 1, 1)" for i in range(1, m + 1)
        )

    cases = " ".join(
        f"WHEN {lfm(m)} <> '' AND {inits(m)} = substr(sf, 1, {m}) THEN {lfm(m)}"
        for m in range(MAX_LF_WORDS, 0, -1)
    )
    return (
        "SELECT DISTINCT conv_id, sf, lf FROM ("
        f"SELECT conv_id, sf, CASE {cases} END AS lf "
        "FROM (SELECT conv_id, regexp_extract(frag, '\\(([a-z0-9]+)\\)', 1) AS sf, frag "
        "FROM (SELECT t.conv_id, unnest(regexp_extract_all(lower(t.text), "
        f"'(?:[a-z]+ ){{1,{MAX_LF_WORDS}}}\\([a-z0-9]+\\)')) AS frag FROM g_transcripts t))"
        ") WHERE lf IS NOT NULL"
    )


def entry() -> Any:
    """Flagship pipeline: transcript shards → deduplicated triple set."""
    return kg.edges("/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Data-pipeline operators (documents / embeddings / events tables)
# ---------------------------------------------------------------------------

def _docs(sf_dir: str):
    return readers.read_table(sf_dir, "documents", columns=["doc_id", "text"])


def _doc_stats(sf_dir: str):
    return textstats.doc_stats(_docs(sf_dir))


def _lang_id(sf_dir: str):
    return textstats.lang_id(_docs(sf_dir))


def _quality(sf_dir: str):
    return textstats.quality_score(_docs(sf_dir))


def _fingerprints(sf_dir: str):
    return textstats.fingerprints(_docs(sf_dir))


def _tokens_bpe(sf_dir: str):
    return textstats.token_count_bpe(_docs(sf_dir))


def _doc_sample(sf_dir: str):
    return textstats.sample_docs(_docs(sf_dir)).select_columns(["doc_id"])


def _ev_asof(sf_dir: str):
    return windows.asof_prev(readers.read_table(sf_dir, "events"))


def _doc_split(sf_dir: str):
    docs = readers.read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    return textstats.split_docs(docs)


def _doc_vocab(sf_dir: str):
    return sketch.distinct_token_count(_docs(sf_dir))


def _doc_inverted_index(sf_dir: str):
    from medknowledgegraph_ray.stages import invindex

    return invindex.inverted_index(_docs(sf_dir))


def _doc_tfidf(sf_dir: str):
    # per-doc top-5 TF-IDF terms (stages/tfidf.py): exact per-task TF,
    # grouped-agg DF, union-sorted DF join, sorted head-k with edge repair
    from medknowledgegraph_ray.stages import tfidf

    return tfidf.doc_tfidf(_docs(sf_dir))


def _doc_shuffle(sf_dir: str):
    # seeded deterministic shuffle into training shards with exact 1-based
    # per-shard positions (stages/shuffle.py: one sort + O(blocks) driver
    # summary pass — a distributed zipWithIndex-per-shard)
    from medknowledgegraph_ray.stages import shuffle

    return shuffle.seeded_shard_shuffle(_docs(sf_dir))


def _ev_users_hll(sf_dir: str):
    # grouped HLL: approximate COUNT(DISTINCT user) per event type without
    # shuffling the (type, user) key space (stages/sketch.grouped_distinct_hll;
    # rows-only: approximate by design, pytest pins the error envelope and
    # partition independence)
    return sketch.grouped_distinct_hll(
        readers.read_table(sf_dir, "events", columns=["event_type", "user_id"]),
        "event_type", "user_id",
    )


def _doc_vocab_hll(sf_dir: str):
    # shuffle-free HLL estimate of the same count (rows-only: approximate by
    # design; tests/test_datapipe.py pins it inside the exact count's
    # 3·(1.04/√m) error envelope)
    return sketch.distinct_token_count_hll(_docs(sf_dir))


def _ev_quantiles(sf_dir: str):
    return windows.grouped_quantiles(readers.read_table(sf_dir, "events"))


def _ev_rank(sf_dir: str):
    # ROW_NUMBER / RANK / DENSE_RANK per user (stages/windows.py sorted
    # exchange: vectorized run-length ranks per block + edge-user repair)
    return windows.ranked_events(readers.read_table(sf_dir, "events"))


def _ev_percentile(sf_dir: str):
    # PERCENT_RANK / CUME_DIST per user (explicit run-position ratios —
    # stages/windows.percentile_events)
    return windows.percentile_events(readers.read_table(sf_dir, "events"))


def _ev_zscore(sf_dir: str):
    # per-user z-score feature scaling — integer-exact sums, identical
    # float64 op order as the oracle (stages/windows.zscore_events)
    return windows.zscore_events(readers.read_table(sf_dir, "events"))


# stratum → keep fraction for the stratified-sample entry (language
# rebalancing: downsample the overrepresented 'en', keep the tail)
_STRATA_RATES = {"en": 0.25, "zh": 0.8, "es": 0.8, "de": 0.8}


def _doc_stratified(sf_dir: str):
    from medknowledgegraph_ray.stages import shuffle as _sh

    docs = readers.read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    return _sh.stratified_sample(docs, _STRATA_RATES, default=0.5)


# source → epoch weight for the oversampling entry (data mixing: repeat
# high-value sources fractional epochs, downweight one)
_EPOCH_WEIGHTS = {"src0": 2.5, "src1": 3.0, "src2": 0.4, "src3": 2.0}


def _doc_entropy(sf_dir: str):
    # per-doc token Shannon entropy (quality signal) — pure map, no
    # exchange; entropy_e6 bit-exact via token-ascending accumulation +
    # shared libm ln (stages/textstats.token_entropy)
    return textstats.token_entropy(_docs(sf_dir))


def _doc_epochs(sf_dir: str):
    # fractional-epoch oversampling (the data-mixing expansion): floor(w)
    # copies + keyed fractional extra copy, map-only flat expansion
    # (stages/shuffle.epoch_oversample)
    from medknowledgegraph_ray.stages import shuffle as _sh

    docs = readers.read_table(sf_dir, "documents", columns=["doc_id", "source"])
    return _sh.epoch_oversample(docs, _EPOCH_WEIGHTS, default=1.0)


def _doc_chunk(sf_dir: str):
    # sliding-window token chunking (64-token windows every 48): map-only
    # flat expansion, oracle-exact incl. the re-joined chunk text
    # (stages/textstats.chunk_windows)
    return textstats.chunk_windows(_docs(sf_dir), window=64, stride=48)


# fixed phrase blocklist for the substring-audit entry (all occur in the
# synthetic documents corpus; counting is non-overlapping on both sides)
_NEEDLES = ["table scan", "hash join", "merge sort", "key order",
            "spark window", "batch batch"]


def _doc_needle_hits(sf_dir: str):
    # multi-phrase substring counting (literal blocklist audit): one
    # vectorized C regex scan per needle, zero exchange
    # (stages/textstats.needle_hits)
    return textstats.needle_hits(_docs(sf_dir), _NEEDLES)


def _ev_winsorize(sf_dir: str):
    # tail-capping at the exact global p05/p95 discrete quantiles —
    # exact_quantiles' O(blocks) selection + a map-only clamp
    # (stages/selection.winsorize)
    return selection_mod.winsorize(
        readers.read_table(sf_dir, "events", columns=["event_id", "value"])
    )


def _ev_mad(sf_dir: str):
    # per-user median absolute deviation (robust grouped dispersion),
    # all-integer two-middle sums on ONE ordered-scan exchange
    # (stages/windows.mad_events)
    return windows.mad_events(readers.read_table(sf_dir, "events"))


def _emb_dim_stats(sf_dir: str):
    # per-dimension embedding moments (whitening stats): per-block
    # columnar reduction to dim-keyed int64 partials + one tiny grouped
    # combine (stages/ann.dim_stats)
    return ann.dim_stats(
        readers.read_table(sf_dir, "embeddings", columns=["embedding"])
    )


def _doc_bigram_lm(sf_dir: str):
    # bigram LM score, add-one smoothing: per-term int64 micro-nat
    # rounding splits the two count attaches into independent gated
    # broadcast/sorted exchanges (stages/tfidf.bigram_logprob)
    from medknowledgegraph_ray.stages import tfidf

    return tfidf.bigram_logprob(_docs(sf_dir))


def _graph_degree_hist(sf_dir: str):
    # graph-QA degree distribution: two algebraic grouped counts, second
    # key space bounded by the degree domain
    # (pipelines/analytics.part_supplier_degree_hist)
    return analytics.part_supplier_degree_hist(sf_dir)


def _ev_window_dedup(sf_dir: str):
    # streaming debounce: drop events repeating their (user, type) within
    # 900 s — lag semantics on the ordered scan (stages/windows.windowed_dedup)
    return windows.windowed_dedup(readers.read_table(sf_dir, "events"))


def _ev_assoc_rules(sf_dir: str):
    # directed association rules (support/confidence): pair supports on
    # the cooccurrence exchange, domain-bounded antecedent broadcast,
    # oracle-exact float confidence (stages/eventagg.association_rules)
    return eventagg.association_rules(readers.read_table(sf_dir, "events"))


def _scan_skyline(sf_dir: str):
    # 2-D Pareto frontier (min price, max quantity): grouped per-price max
    # + two-pass global prefix-max scan (stages/skyline.skyline_2d)
    return analytics.price_quantity_skyline(sf_dir)


def _doc_negatives(sf_dir: str):
    # deterministic negative sampling (contrastive pairs): one global-rank
    # exchange + map-only splitmix64 draws + one unique-keyed join
    # (stages/shuffle.negative_samples)
    return _shuffle.negative_samples(
        readers.read_table(sf_dir, "documents", columns=["doc_id"]), k=4
    )


def _negatives_sql(k: int = 4, seed: int = 20260817) -> str:
    """Same draws: splitmix64(doc_id·(k+1)+j XOR smix(seed)) mod N through
    the doc_id rank, self-draws shifted to the cyclically next rank."""
    chain = _shuffle.shuffle_key_sql("d0", seed, id_col="mixid")
    return (
        "WITH r AS (SELECT doc_id,"
        " CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS rn"
        " FROM documents),"
        " nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),"
        " d0 AS (SELECT r.doc_id, r.rn, t.j,"
        f" CAST(r.doc_id * {k + 1} + t.j AS BIGINT) AS mixid"
        f" FROM r CROSS JOIN range(1, {k + 1}) t(j)),"
        f" {chain},"
        " dr AS (SELECT d0.doc_id, d0.rn, d0.j,"
        " CAST(keyed.skey % CAST(nn.n AS UBIGINT) AS BIGINT) + 1 AS r0"
        " FROM d0 JOIN keyed USING (mixid), nn),"
        " dr2 AS (SELECT doc_id, j,"
        " CASE WHEN r0 = rn THEN (r0 % nn.n) + 1 ELSE r0 END AS nr"
        " FROM dr, nn)"
        " SELECT dr2.doc_id, CAST(dr2.j AS BIGINT) AS j,"
        " r2.doc_id AS neg_id FROM dr2 JOIN r r2 ON r2.rn = dr2.nr"
    )


def _emb_normalize(sf_dir: str):
    # L2 unit-normalization to long form: map-only, quantized int64 norm
    # (order-invariant), IEEE-mirrored sqrt/divide (stages/ann.normalize_vectors)
    return ann.normalize_vectors(
        readers.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    )


def _scan_unpivot(sf_dir: str):
    # UNPIVOT/melt of the lineitem measures to long form: map-only flat
    # expansion (pipelines/analytics.lineitem_unpivot)
    return analytics.lineitem_unpivot(sf_dir)


def _graph_pagerank(sf_dir: str):
    # integer-exact PageRank over the part–supplier co-purchase graph:
    # distributed edge distinct + size-gated rank iteration
    # (stages/graphalgo.pagerank; parity with a 10×-unrolled SQL oracle)
    return analytics.part_supplier_pagerank(sf_dir, iters=10)


def _graph_triangles(sf_dir: str):
    # triangle count of the thresholded nation trade graph: distributed
    # pair reduction + degree-oriented wedge counting
    # (stages/graphalgo.triangle_count)
    return analytics.nation_trade_triangles(sf_dir)


def _graph_jaccard(sf_dir: str):
    # per-edge neighborhood Jaccard of the same nation trade graph — the
    # link-prediction feature; jaccard_e6 is pure-int64 round-half-up
    # (stages/graphalgo.edge_jaccard)
    return analytics.nation_trade_jaccard(sf_dir)


def _graph_link_predict(sf_dir: str):
    # common-neighbor link prediction: top-20 NON-edge pairs of the trade
    # graph by shared-neighbor count (stages/graphalgo.link_predict)
    return analytics.nation_trade_link_predict(sf_dir)


def _doc_boilerplate(sf_dir: str):
    # RefinedWeb/CCNet-style boilerplate removal: segments occurring >= 3
    # times corpus-wide drop from EVERY document (vs doc_seg_dedup's
    # keep-first); one string-keyed ordered scan, no frequency table
    # (stages/orderedagg.boilerplate_strip)
    return orderedagg.boilerplate_strip(
        readers.read_table(sf_dir, "documents", columns=["doc_id", "text"]),
        seg_words=15, max_df=3,
    )


def _pagerank_sql(iters: int = 10) -> str:
    """The 10-iteration damped power iteration, unrolled CTE per round —
    identical integer floor-division arithmetic as graphalgo.pagerank."""
    sql = (
        "WITH ed AS (SELECT DISTINCT CAST(l_partkey*2 AS BIGINT) AS src,"
        " CAST(l_suppkey*2+1 AS BIGINT) AS dst FROM lineitem"
        " UNION ALL SELECT DISTINCT CAST(l_suppkey*2+1 AS BIGINT),"
        " CAST(l_partkey*2 AS BIGINT) FROM lineitem),"
        " deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d"
        "  FROM ed GROUP BY 1),"
        " p AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),"
        " r0 AS (SELECT node, CAST(1000000000000 // p.n AS BIGINT) AS rank"
        "  FROM deg, p)"
    )
    for i in range(iters):
        sql += (
            f", r{i + 1} AS (SELECT e.dst AS node,"
            f" CAST((1000000000000 * 15) // (100 * p.n)"
            f" + sum((r.rank * 85) // (100 * d.d)) AS BIGINT) AS rank"
            f" FROM ed e JOIN r{i} r ON r.node = e.src"
            f" JOIN deg d ON d.node = e.src, p GROUP BY e.dst, p.n)"
        )
    return sql + f" SELECT node, rank FROM r{iters}"


_BM25_TERMS = ["join", "vector", "stream", "spark"]


def _doc_bm25(sf_dir: str):
    # Okapi BM25 relevance vs a fixed query term set: one tokenize pass
    # into a bounded-width tf table, O(blocks) stats partials, map-only
    # scoring with libm-exact idf constants (stages/tfidf.bm25_scores)
    from medknowledgegraph_ray.stages import tfidf

    return tfidf.bm25_scores(_docs(sf_dir), _BM25_TERMS)


def _bm25_sql() -> str:
    """Mirrors bm25_scores' exact IEEE parenthesization (k1=1.2, b=0.75);
    every arithmetic input is CAST to DOUBLE so no DECIMAL op sneaks in."""
    nt = len(_BM25_TERMS)
    tf_defs = ", ".join(
        f"len(list_filter(t, x -> x = '{term}')) AS tf{i}"
        for i, term in enumerate(_BM25_TERMS)
    )
    df_defs = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(nt)
    )
    norm = (
        "(1.2 * ((1.0 - 0.75) + (((0.75 * CAST(dl AS DOUBLE))"
        " * CAST(st.n AS DOUBLE)) / CAST(st.tl AS DOUBLE))))"
    )
    terms = " + ".join(
        f"(ln(((CAST(st.n - st.df{i} AS DOUBLE) + 0.5)"
        f" / (CAST(st.df{i} AS DOUBLE) + 0.5)) + 1.0)"
        f" * ((CAST(tf{i} AS DOUBLE) * 2.2)"
        f" / (CAST(tf{i} AS DOUBLE) + {norm})))"
        for i in range(nt)
    )
    return (
        "WITH toks AS (SELECT doc_id, regexp_extract_all("
        " lower(coalesce(text, '')), '[a-z0-9]+') AS t FROM documents),"
        f" tf AS (SELECT doc_id, len(t) AS dl, {tf_defs} FROM toks),"
        " st AS (SELECT CAST(count(*) AS BIGINT) AS n,"
        f" CAST(sum(dl) AS BIGINT) AS tl, {df_defs} FROM tf)"
        " SELECT CAST(tf.doc_id AS BIGINT) AS doc_id,"
        f" CAST(floor(({terms}) * 1000000.0) AS BIGINT) AS score_e6"
        " FROM tf, st"
    )


def _graph_kcore(sf_dir: str):
    # k-core pruning of the part–supplier graph: iterative degree peel to
    # the dense trading core (stages/graphalgo.kcore; size-gated driver/
    # distributed paths, oracle unrolls the same rounds)
    return analytics.part_supplier_kcore(sf_dir, k=10)


def _kcore_sql(k: int = 10, rounds: int = 8) -> str:
    """Unrolled degree peeling — each round drops nodes with deg < k and
    keeps edges whose BOTH endpoints survive; extra rounds past the
    fixpoint are no-ops, so any rounds ≥ the true peel depth is exact."""
    # every CTE is MATERIALIZED: each round references the previous one
    # three times, and un-materialized CTE inlining would re-evaluate the
    # whole chain exponentially (3^rounds)
    sql = (
        "WITH ed0 AS MATERIALIZED (SELECT DISTINCT"
        " CAST(l_partkey*2 AS BIGINT) AS node,"
        " CAST(l_suppkey*2+1 AS BIGINT) AS dst FROM lineitem"
        " UNION ALL SELECT DISTINCT CAST(l_suppkey*2+1 AS BIGINT),"
        " CAST(l_partkey*2 AS BIGINT) FROM lineitem)"
    )
    for i in range(rounds):
        sql += (
            f", d{i} AS MATERIALIZED (SELECT node, count(*) AS deg"
            f" FROM ed{i} GROUP BY node),"
            f" s{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {k}),"
            f" ed{i + 1} AS MATERIALIZED (SELECT e.node, e.dst FROM ed{i} e"
            f" JOIN s{i} x ON x.node = e.node JOIN s{i} y ON y.node = e.dst)"
        )
    return (
        sql + f" SELECT node, CAST(count(*) AS BIGINT) AS deg"
        f" FROM ed{rounds} GROUP BY node"
    )


def _doc_pii(sf_dir: str):
    # PII detect + redact over the planted-PII corpus: real compiled-regex
    # scanner + redaction hash, vectorized per batch (stages/pii.py)
    return pii.scan_pii(_docs(sf_dir))


def _doc_urls(sf_dir: str):
    # corpus URL-domain frequency: vectorized host findall → sorted-
    # exchange grouped count (stages/pii.domain_counts)
    return pii.domain_counts(_docs(sf_dir))


def _doc_top_tokens(sf_dir: str):
    # EXACT corpus top-20 tokens via a Misra-Gries candidate sketch: two
    # map-only passes (O(blocks x capacity) driver volume, never a
    # vocabulary-wide shuffle), separation-checked with a loud exact-
    # groupby fallback (stages/heavyhitters.py)
    return heavyhitters.top_tokens_mg(_docs(sf_dir), k=20)


def _ev_user_paths(sf_dir: str):
    # distributed string_agg(event_type, '>' ORDER BY event_id) per user:
    # one range sort, per-BLOCK vectorized fold, gated edge repair
    # (stages/orderedagg.ordered_concat — the generic form of the KG
    # pipeline's conversation assembly)
    ev = readers.read_table(sf_dir, "events", columns=["user_id", "event_id", "event_type"])
    return orderedagg.ordered_concat(
        ev, "user_id", ["event_id"], "event_type", ">",
        out_col="path", count_col="n_events",
    )


def _doc_seg_dedup(sf_dir: str):
    # CCNet-style segment-level exact dedup: corpus-wide first occurrence
    # per 15-word segment, surviving segments re-assembled in order — two
    # sorted exchanges, no join (stages/orderedagg.seg_dedup)
    return orderedagg.seg_dedup(
        readers.read_table(sf_dir, "documents", columns=["doc_id", "text"]),
        seg_words=15,
    )


def _doc_dup_spans(sf_dir: str):
    # ExactSubstr duplicated-span coverage: overlapping 10-token windows,
    # corpus-repeated windows via one string-keyed ordered scan, per-doc
    # interval-union of the dup spans (stages/orderedagg.dup_span_coverage)
    return orderedagg.dup_span_coverage(
        readers.read_table(sf_dir, "documents", columns=["doc_id", "text"]),
        win_words=10,
    )


def _dedup_canonical(sf_dir: str):
    # exact dedup keeping the full winning row + cluster size in ONE
    # keep_first sorted exchange — "trusted source wins" canonicalization
    # (stages/dedupe.canonical_docs over stages/orderedagg.keep_first)
    return dedupe.canonical_docs(
        readers.read_table(
            sf_dir, "documents", columns=["doc_id", "text", "lang", "source"]
        )
    )


def _doc_cap_per_lang(sf_dir: str):
    # hard per-language corpus cap: at most 50 docs per lang by seeded
    # splitmix64 priority — one keep_first(k) sorted exchange
    # (stages/shuffle.cap_per_stratum over stages/orderedagg.keep_first)
    return _shuffle.cap_per_stratum(
        readers.read_table(sf_dir, "documents", columns=["doc_id", "lang"]),
        k=50,
    )


def _dedup_incremental(sf_dir: str):
    # dedup the "new crawl" (source src0) against the rest of the corpus:
    # surviving src0 doc_ids via a payload-carrying anti-join on 64-bit
    # text hashes (stages/dedupe.incremental_dedup)
    return dedupe.incremental_dedup(
        readers.read_table(
            sf_dir, "documents", columns=["doc_id", "text", "source"]
        ),
        new_source="src0",
    )


def _doc_iqr_filter(sf_dir: str):
    # length-outlier trim with EXACT global cut points: keep docs whose
    # n_chars lies within the corpus [p25, p75] band — two order
    # statistics by distributed selection, then a map-only filter
    # (stages/selection.quantile_band_filter)
    return selection_mod.quantile_band_filter(
        readers.read_table(sf_dir, "documents", columns=["doc_id", "n_chars"]),
        col="n_chars",
        uid_col="doc_id",
    )


def _join_anti_customers(sf_dir: str):
    # relational anti-join as a first-class query: customers with no
    # FINALIZED order, on the sorted-exchange EXCEPT
    # (stages/setops.anti_join_ids — never a broadcast NOT-IN; the removal
    # side is a corpus fraction).  The status filter rides the scan.
    from medknowledgegraph_ray.stages import setops

    cust = readers.read_table(sf_dir, "customer", columns=["c_custkey"])
    finalized = (
        readers.read_table(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
        .filter(expr="o_orderstatus == 'F'")
        .map_batches(
            lambda t: t.select(["o_custkey"]).rename_columns(["c_custkey"]),
            batch_format="pyarrow",
        )
    )
    return setops.anti_join_ids(cust, finalized, key="c_custkey")


def _join_semi_customers(sf_dir: str):
    # relational semi-join (EXISTS): customers with at least one
    # high-value order, on the same sorted exchange as the anti-join
    # (stages/setops.semi_join_ids); the price filter rides the scan
    from medknowledgegraph_ray.stages import setops

    cust = readers.read_table(sf_dir, "customer", columns=["c_custkey"])
    big = (
        readers.read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .filter(expr="o_totalprice > 150000")
        .map_batches(
            lambda t: t.select(["o_custkey"]).rename_columns(["c_custkey"]),
            batch_format="pyarrow",
        )
    )
    return setops.semi_join_ids(cust, big, key="c_custkey")


def _ev_mode(sf_dir: str):
    # grouped MODE (most frequent event_type per user): algebraic grouped
    # count, then one keep_first argmin exchange over the count table
    # (stages/eventagg.mode_event_per_user)
    return eventagg.mode_event_per_user(
        readers.read_table(sf_dir, "events", columns=["user_id", "event_type"])
    )


def _join_pairs_orders(sf_dir: str):
    # many-to-many fact ⋈ fact: every (finalized, open) order pair of the
    # same customer — run-expansion sorted-merge join, duplicates on BOTH
    # sides (stages/joinmany.join_many; equi_join's unique-build contract
    # cannot express this)
    from medknowledgegraph_ray.stages.joinmany import join_many

    orders = readers.read_table(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderstatus"]
    )

    def side(status: str, out: str):
        return orders.filter(expr=f"o_orderstatus == '{status}'").map_batches(
            lambda t, out=out: t.select(["o_custkey", "o_orderkey"]).rename_columns(
                ["custkey", out]
            ),
            batch_format="pyarrow",
        )

    return join_many(
        side("F", "f_orderkey"), side("O", "o_orderkey"),
        "custkey", ["f_orderkey"], ["o_orderkey"],
    )


def _ev_gaps(sf_dir: str):
    # per-user inter-arrival gap stats (count/min/max/sum of consecutive
    # ts deltas) — all-integer exact on the windowed sorted exchange
    # (stages/windows.gap_stats)
    return windows.gap_stats(readers.read_table(sf_dir, "events"))


def _ev_trend(sf_dir: str):
    # per-user Pearson corr(event order, value): int64-exact sums + one
    # fixed float64 expression, identical op order to the oracle
    # (stages/windows.trend_corr)
    return windows.trend_corr(readers.read_table(sf_dir, "events"))


def _doc_length_rank(sf_dir: str):
    # global ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) — distributed
    # zipWithIndex: one sort, O(blocks) driver offsets, map-only enumerate
    # (stages/ranks.global_row_number)
    docs = readers.read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return ranks.global_row_number(docs, ["n_chars", "doc_id"])


def _join_bloom_orders(sf_dir: str):
    # selective-dimension join with a Bloom pre-filter pruning the fact
    # exchange (stages/bloom.py); exact join drops the false positives so
    # the result is bit-identical to the unfiltered join
    return analytics.segment_orders_bloom(sf_dir)


def _join_promo_ratio(sf_dir: str):
    # TPC-H Q14 shape: lineitem ⋈ part, promo revenue share — integer-e4
    # revenue sums, one float64 division (pipelines/analytics.py)
    return analytics.promo_revenue_ratio(sf_dir)


def _ev_running_distinct(sf_dir: str):
    # running COUNT(DISTINCT event_type) per user — first-occurrence flags
    # + segmented cumsum on one ordered scan
    # (stages/eventagg.running_distinct_types)
    return eventagg.running_distinct_types(readers.read_table(sf_dir, "events"))


def _ev_transitions(sf_dir: str):
    # Markov transition counts (consecutive event-type pairs per user):
    # ordered scan -> key-bounded count exchange
    # (stages/eventagg.event_transitions)
    return eventagg.event_transitions(readers.read_table(sf_dir, "events"))


def _dedup_cluster_sizes(sf_dir: str):
    # duplicate-cluster size histogram (corpus-QA report): two algebraic
    # exchanges over the exact-dedup counts (stages/dedupe.dup_cluster_sizes)
    return dedupe.dup_cluster_sizes(_docs(sf_dir))


def _ev_coverage(sf_dir: str):
    # per-user interval-UNION coverage (overlapping activity halos merged
    # by a vectorized sweep line) — stages/windows.activity_coverage
    return windows.activity_coverage(readers.read_table(sf_dir, "events"))


def _ev_time_window(sf_dir: str):
    # time-based RANGE-frame rolling sum (peers included) — all-integer
    # exact, one cumsum + two binary searches per run
    # (stages/windows.time_window_sum)
    return windows.time_window_sum(readers.read_table(sf_dir, "events"))


def _agg_grouping_sets(sf_dir: str):
    # GROUP BY GROUPING SETS ((flag),(status)) — the arbitrary-set member
    # of the rollup/cube family, key-bounded re-aggregation of one corpus
    # pass (pipelines/analytics.lineitem_grouping_sets)
    return analytics.lineitem_grouping_sets(sf_dir)


def _doc_typo_pairs(sf_dir: str):
    # edit-distance-1 similarity join over the transcript vocabulary via
    # FastSS deletion neighborhoods: recall-1 bucketing theorem + exact
    # verify (stages/editdist.py); the oracle is the all-pairs Levenshtein
    from medknowledgegraph_ray.stages import editdist

    return editdist.typo_pairs(readers.read_transcripts(sf_dir, ["text"]))


def _ev_window_users(sf_dir: str):
    # COUNT(DISTINCT user_id) per tumbling hour: two algebraic exchanges,
    # no per-window materialization (stages/eventagg.window_distinct_users)
    return eventagg.window_distinct_users(readers.read_table(sf_dir, "events"))


def _ev_type_pairs(sf_dir: str):
    # market-basket co-occurrence: users-per-unordered-type-pair — distinct
    # exchange -> ordered-scan pair expansion -> pair-count exchange
    # (stages/eventagg.event_type_cooccurrence)
    return eventagg.event_type_cooccurrence(readers.read_table(sf_dir, "events"))


def _doc_weighted_sample(sf_dir: str):
    # deterministic weighted sample-without-replacement (k smallest seeded
    # u/w priorities): per-block partial top-k, O(blocks*k) driver merge
    # (stages/shuffle.weighted_sample_k)
    docs = readers.read_table(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return _shuffle.weighted_sample_k(docs, k=25)


def _ev_pivot(sf_dir: str):
    # pivot / crosstab via one-hot partial aggregation (stages/eventagg.py)
    return eventagg.pivot_event_counts(readers.read_table(sf_dir, "events"))


def _ev_user_types(sf_dir: str):
    # grouped COUNT(DISTINCT) as two algebraic exchanges (stages/eventagg.py)
    return eventagg.user_type_profile(readers.read_table(sf_dir, "events"))


def _ev_props(sf_dir: str):
    # semi-structured extraction: JSON props field → grouped stats
    return eventagg.props_field_stats(readers.read_table(sf_dir, "events"))


def _doc_gopher(sf_dir: str):
    # Gopher-style rule-based quality filter (stages/textstats.py)
    return textstats.gopher_rules(_docs(sf_dir))


def _doc_pack(sf_dir: str):
    # sequence packing into fixed token-budget training chunks
    # (stages/pack.py: exact distributed prefix sum + vectorized expansion)
    return pack.sequence_pack(_docs(sf_dir))


def _ev_lead(sf_dir: str):
    # LEAD window function (asof_prev's mirror, same single-sort shape)
    return windows.asof_next(readers.read_table(sf_dir, "events"))


def _ev_quantiles_cont(sf_dir: str):
    # interpolated per-user quantiles, bit-exact vs DuckDB quantile_cont
    return windows.grouped_quantiles_cont(readers.read_table(sf_dir, "events"))


def _agg_cube(sf_dir: str):
    # GROUP BY CUBE — all four aggregation levels from the key-bounded funnel
    return analytics.lineitem_cube(sf_dir)


def _doc_normalize(sf_dir: str):
    # canonical normalization + md5 dedup key (stages/textstats.py)
    return textstats.normalize_docs(_docs(sf_dir))


def _doc_repetition(sf_dir: str):
    # within-doc repetition (Gopher repetition-rule family)
    return textstats.repetition_stats(_docs(sf_dir))


def _doc_bigrams(sf_dir: str):
    # corpus top-20 bigrams: grouped_agg counts + per-block partial top-k
    from medknowledgegraph_ray.stages import invindex

    return invindex.top_bigrams(_docs(sf_dir))


def _doc_pmi(sf_dir: str):
    # collocation extraction: top bigrams with integer-exact PMI inputs
    # and libm-exact pmi_e6 (stages/invindex.collocations)
    from medknowledgegraph_ray.stages import invindex

    return invindex.collocations(_docs(sf_dir))


def _join_full_users(sf_dir: str):
    # FULL OUTER equi-join: high-value click users vs high-value purchase
    # users — both unmatched sides preserved (stages/join.py how="outer")
    import numpy as _np
    import pandas as _pd

    from medknowledgegraph_ray.stages.groupagg import grouped_agg
    from medknowledgegraph_ray.stages.join import equi_join

    ev = readers.read_table(sf_dir, "events", columns=["user_id", "event_type", "value"])

    def side(etype: str, alias: str):
        def prep(b: _pd.DataFrame) -> _pd.DataFrame:
            m = (b["event_type"] == etype) & (b["value"] > 110.0)
            return _pd.DataFrame(
                {
                    "user_id": b.loc[m, "user_id"].astype("int64"),
                    "one": _pd.array(
                        _np.ones(int(m.sum()), dtype=_np.int64), dtype="int64"
                    ),
                }
            )

        return grouped_agg(
            ev.map_batches(prep, batch_format="pandas", batch_size=None),
            ["user_id"], [("one", "sum", alias)],
        )

    joined = equi_join(
        side("click", "n_hi_clicks"), side("purchase", "n_hi_purchases"),
        "user_id", ["n_hi_clicks"], ["n_hi_purchases"], how="outer",
    )

    def fill(b: _pd.DataFrame) -> _pd.DataFrame:
        return _pd.DataFrame(
            {
                "user_id": b["user_id"].astype("int64"),
                "n_hi_clicks": b["n_hi_clicks"].fillna(0).astype("int64"),
                "n_hi_purchases": b["n_hi_purchases"].fillna(0).astype("int64"),
            }
        )

    return joined.map_batches(fill, batch_format="pandas")


def _ev_funnel(sf_dir: str):
    # ordered conversion funnel signup -> click -> purchase per user
    return eventagg.funnel_stages(readers.read_table(sf_dir, "events"))


def _ev_retention(sf_dir: str):
    # day-over-day cohort retention (stages/eventagg.py)
    return eventagg.daily_retention(readers.read_table(sf_dir, "events"))


def _doc_logprob(sf_dir: str):
    # unigram-LM quality score, int64-exact micro-nats (stages/tfidf.py)
    from medknowledgegraph_ray.stages import tfidf

    return tfidf.unigram_logprob(_docs(sf_dir))


def _doc_decontaminate(sf_dir: str):
    # benchmark decontamination: token-boundary 8-gram overlap against a
    # small benchmark set (docs 1-3), blocklist broadcast once
    from medknowledgegraph_ray.stages import decontam

    docs = readers.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    bench = readers.read_table(
        sf_dir, "documents", columns=["doc_id", "text"]
    ).filter(expr="doc_id <= 3")
    return decontam.contamination_flags(docs, bench)


def _corpus_export(sf_dir: str):
    # the END-TO-END training-corpus pipeline (pipelines/corpus.py):
    # Gopher filter -> exact dedup -> seeded shuffle, oracle-checked as
    # one chain (the write-to-shards variant is corpus.export_corpus)
    from medknowledgegraph_ray.pipelines import corpus

    return corpus.corpus_rows(sf_dir)


def _ev_moments(sf_dir: str):
    # exact integer moment aggregation (streaming stats; variance derives)
    return eventagg.user_moments(readers.read_table(sf_dir, "events"))


def _doc_sample_k(sf_dir: str):
    # exact-size deterministic sample via md5 priorities + partial top-k
    return textstats.sample_exact_k(_docs(sf_dir))


def _ev_ntile(sf_dir: str):
    # NTILE(4) quartile assignment per user (stages/windows.py)
    return windows.ntile_events(readers.read_table(sf_dir, "events"))


def _ev_latest(sf_dir: str):
    # grouped argmax (latest record per key — the compaction/upsert shape)
    return windows.latest_event_per_user(readers.read_table(sf_dir, "events"))


def _join_left_counts(sf_dir: str):
    # LEFT OUTER equi-join: every customer keeps a row, order-less customers
    # take 0 counts (analytics.customer_order_profile, sharing the
    # per-customer fact aggregate with revenue_by_region)
    return analytics.customer_order_profile(sf_dir)


def _join_customer_orders(sf_dir: str):
    # general sorted-merge equi-join (stages/join.py): dimension (customer)
    # x fact (orders) with NEITHER side broadcast — every order row carries
    # its customer's name/segment; money as exact cents
    import pandas as _pd

    from medknowledgegraph_ray.stages.join import equi_join

    cust = readers.read_table(
        sf_dir, "customer", columns=["c_custkey", "c_name", "c_mktsegment"]
    ).map_batches(
        lambda b: b.rename(columns={"c_custkey": "o_custkey"}),
        batch_format="pandas",
    )
    orders = readers.read_table(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def prep(b: _pd.DataFrame) -> _pd.DataFrame:
        import numpy as _np

        return _pd.DataFrame(
            {
                "o_custkey": b["o_custkey"].astype("int64"),
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "total_c": _pd.array(
                    _np.round(b["o_totalprice"].to_numpy() * 100).astype("int64"),
                    dtype="int64",
                ),
            }
        )

    return equi_join(
        cust,
        orders.map_batches(prep, batch_format="pandas"),
        "o_custkey",
        ["c_name", "c_mktsegment"],
        ["o_orderkey", "total_c"],
    )


def _ev_global_quantiles(sf_dir: str):
    # exact GLOBAL order statistics (p50/p90/p99 of value_e6) by distributed
    # selection — stages/selection.py block-summary trick, O(blocks) driver
    import pandas as _pd

    from medknowledgegraph_ray.stages.selection import exact_quantiles

    ev = readers.read_table(sf_dir, "events", columns=["event_id", "value"])

    def prep(b: _pd.DataFrame) -> _pd.DataFrame:
        import numpy as _np

        return _pd.DataFrame(
            {
                "uid": b["event_id"].astype("int64"),
                "value_e6": _pd.array(
                    _np.round(b["value"].to_numpy() * 1e6).astype("int64"),
                    dtype="int64",
                ),
            }
        )

    return exact_quantiles(
        ev.map_batches(prep, batch_format="pandas"),
        "value_e6",
        {"p50_e6": 0.5, "p90_e6": 0.9, "p99_e6": 0.99},
    )


def _ev_quantile_sketch(sf_dir: str):
    # shuffle-free ONE-PASS approximate quantiles (rows-only: the estimate
    # is partitioning-dependent within a ±1/(2·compactor) rank band;
    # tests/test_datapipe.py pins it against the exact distributed
    # selection) — stages/sketch.quantile_sketch
    ev = readers.read_table(sf_dir, "events", columns=["value"])
    return sketch.quantile_sketch(ev, "value", qs=(0.5, 0.9, 0.99))


def _ev_histogram(sf_dir: str):
    # fixed-width value histogram: map-only bucketing + the partial-agg
    # sorted exchange (groupagg.grouped_agg) — one row per bucket crosses
    import pandas as _pd

    from medknowledgegraph_ray.stages.groupagg import grouped_agg

    ev = readers.read_table(sf_dir, "events", columns=["value"])

    def bucketize(b: _pd.DataFrame) -> _pd.DataFrame:
        import numpy as _np

        e6 = _np.round(b["value"].to_numpy() * 1e6).astype("int64")
        return _pd.DataFrame(
            {
                "bucket": _pd.array(_np.floor_divide(e6, 500_000), dtype="int64"),
                "one": _pd.array(_np.ones(len(b), dtype=_np.int64), dtype="int64"),
            }
        )

    return grouped_agg(
        ev.map_batches(bucketize, batch_format="pandas"),
        ["bucket"],
        [("one", "sum", "n_events")],
    )


def _ev_running(sf_dir: str):
    # ROWS-frame window aggregates: per-user cumulative sum + 3-row rolling
    # sum (windows.running_aggregates — sorted-exchange + edge repair)
    return windows.running_aggregates(readers.read_table(sf_dir, "events"))


def _ev_asof_state(sf_dir: str):
    # two-table as-of join: each click gets the user's latest purchase
    # at-or-before it (DuckDB ASOF JOIN semantics, inner)
    import pandas as _pd

    ev = readers.read_table(sf_dir, "events", columns=["user_id", "event_id", "ts", "event_type"])

    def side(b: _pd.DataFrame, etype: str, id_col: str) -> _pd.DataFrame:
        m = b["event_type"] == etype
        return _pd.DataFrame(
            {
                "key": b.loc[m, "user_id"].astype("int64"),
                id_col: b.loc[m, "event_id"].astype("int64"),
                "ts_us": b.loc[m, "ts"].astype("int64"),
            }
        )

    points = ev.map_batches(lambda b: side(b, "click", "point_id"), batch_format="pandas")
    states = ev.map_batches(lambda b: side(b, "purchase", "state_id"), batch_format="pandas")
    out = rangejoin.asof_join(points, states)

    def rename(b: _pd.DataFrame) -> _pd.DataFrame:
        return _pd.DataFrame(
            {
                "user_id": b["key"],
                "event_id": b["point_id"],
                "ts_us": b["ts_us"],
                "state_id": b["state_id"],
                "state_ts_us": b["state_ts_us"],
            }
        )

    return out.map_batches(rename, batch_format="pandas")


def _ev_range_join(sf_dir: str):
    # range join: each event ⋈ the qualifying session interval containing it
    # (sessions with ≥3 events; events in shorter sessions have no match) —
    # the interval-containment join Ray Data lacks, on the sorted-merge shape
    import pandas as _pd

    ev = readers.read_table(sf_dir, "events")
    sessions = windows.sessionize(ev).filter(expr="n_events >= 3")

    def as_intervals(b: _pd.DataFrame) -> _pd.DataFrame:
        return _pd.DataFrame(
            {
                "key": b["user_id"].astype("int64"),
                "interval_id": b["session_idx"].astype("int64"),
                "start_us": b["start_us"].astype("int64"),
                "end_us": b["end_us"].astype("int64"),
            }
        )

    def as_points(b: _pd.DataFrame) -> _pd.DataFrame:
        return _pd.DataFrame(
            {
                "key": b["user_id"].astype("int64"),
                "point_id": b["event_id"].astype("int64"),
                "ts_us": b["ts"].astype("int64"),
            }
        )

    joined = rangejoin.interval_join(
        ev.select_columns(["user_id", "event_id", "ts"]).map_batches(
            as_points, batch_format="pandas"
        ),
        sessions.map_batches(as_intervals, batch_format="pandas"),
    )

    def rename(b: _pd.DataFrame) -> _pd.DataFrame:
        return _pd.DataFrame(
            {
                "user_id": b["key"],
                "event_id": b["point_id"],
                "ts_us": b["ts_us"],
                "session_idx": b["interval_id"],
                "start_us": b["start_us"],
                "end_us": b["end_us"],
            }
        )

    return joined.map_batches(rename, batch_format="pandas")


def _dedup_exact(sf_dir: str):
    return dedupe.exact_dedup(_docs(sf_dir))


def _dedup_minhash(sf_dir: str):
    return dedupe.minhash_dedup(_docs(sf_dir))


def _dedup_ngram(sf_dir: str):
    # recall-1 prefix-filter join — exactly the all-pairs oracle at any
    # threshold (minhash needs its band-curve recall caveat; this doesn't)
    return dedupe.ngram_jaccard_dedup(_docs(sf_dir))


def _dedup_components(sf_dir: str):
    # transitive duplicate clusters: connected components (hash-min label
    # propagation, stages/components.py) over the recall-1 exact-Jaccard
    # pair graph — component = min reachable doc_id
    return components.connected_components(dedupe.ngram_jaccard_dedup(_docs(sf_dir)))


def _doc_keep(sf_dir: str):
    # the canonical corpus after transitive dedup: every doc minus the
    # non-representative members of each near-dup component — a sorted-
    # exchange anti-join (stages/setops.py), never a broadcast NOT-IN
    from medknowledgegraph_ray.stages import setops

    comp = components.connected_components(dedupe.ngram_jaccard_dedup(_docs(sf_dir)))

    def dropped(b):
        return b[b["doc_id"] != b["component"]][["doc_id"]]

    drop_ids = comp.map_batches(dropped, batch_format="pandas")
    return setops.anti_join_ids(
        readers.read_table(sf_dir, "documents", columns=["doc_id"]), drop_ids
    )


def _dedup_simhash(sf_dir: str):
    return dedupe.simhash_signatures(_docs(sf_dir))


def _dedup_embedding(sf_dir: str):
    # threshold 0.4: the testdata embeddings have no pairs above cosine 0.52,
    # so the production default (0.95) would be a trivially-empty check.
    # Oracle-exact: multi-band hyperplane LSH at auto (planes=4, bands=80)
    # has per-pair miss ≲1e-6 at the 0.40 boundary (deterministic for the
    # fixed seed — verified equal to all-pairs at sf0.001/0.01/0.1), and the
    # cosine verify reuses the oracle's own float64 formula term for term.
    emb = readers.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return dedupe.embedding_near_dups(emb, threshold=0.4, dim=_ANN_DIM)


def _ann_topk(sf_dir: str):
    emb = readers.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann.brute_force_topk(emb, ann.fixed_queries(_ANN_DIM), k=_ANN_K)


def _ann_ivf(sf_dir: str):
    # IVF coarse-quantizer ANN (rows-only: approximate by design; the
    # brute-force path is the correctness baseline)
    emb = readers.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann.ivf_topk(emb, ann.fixed_queries(_ANN_DIM), k=_ANN_K)


def _emb_kmeans(sf_dir: str):
    # corpus clustering: iterative training on a bounded sample, map-only
    # assignment (rows-only: the fixpoint is not SQL-expressible; pytest
    # asserts determinism + nearest-centroid self-consistency)
    emb = readers.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann.kmeans_clusters(emb)


def _ann_lsh(sf_dir: str):
    emb = readers.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ann.lsh_topk(emb, ann.fixed_queries(_ANN_DIM), k=_ANN_K)


def _mm_metadata(sf_dir: str):
    return multimodal.media_metadata(_docs(sf_dir)).select_columns(
        ["doc_id", "media_type", "n_bytes", "digest"]
    )


def _mm_decode(sf_dir: str):
    return multimodal.media_metadata(_docs(sf_dir))


def _mm_resize(sf_dir: str):
    return multimodal.resize_images(multimodal.to_binary_payloads(_docs(sf_dir)))


def _mm_frames(sf_dir: str):
    return multimodal.sample_frames(multimodal.to_binary_payloads(_docs(sf_dir)))


def _mm_image(sf_dir: str):
    # REAL dependency-free image decode: synthesized binary PPM payloads
    # through the netpbm parser in the actor-pool decode stage.  The synth
    # derives dims from md5(text), which DuckDB can reproduce — so unlike
    # mm_audio/mm_video this one IS oracle-checked end to end.
    return multimodal.decode_media(
        multimodal.to_ppm_payloads(_docs(sf_dir))
    ).select_columns(["doc_id", "n_bytes", "width", "height", "frames"])


def _mm_png(sf_dir: str):
    # REAL COMPRESSED image decode with zero external dependency: the
    # md5(text)-derived synth pixels are PNG-encoded (stdlib zlib DEFLATE)
    # and decoded back through the actor-pool stage's PNG branch
    # (stages/multimodal.decode_png — CRC-checked, all 5 scanline
    # filters).  n_bytes is compressed size (not SQL-derivable), so the
    # oracle checks the dimension round trip (doc_id, width, height,
    # frames) — still oracle-EXACT, closing the compressed-codec seam the
    # missing PIL left stubbed.
    return multimodal.decode_media(
        multimodal.to_png_payloads(_docs(sf_dir))
    ).select_columns(["doc_id", "width", "height", "frames"])


def _mm_audio(sf_dir: str):
    # REAL stdlib-wave decode of synthesized PCM WAV payloads (rows-only:
    # DuckDB cannot parse WAV; pytest checks vs an independent decode)
    return multimodal.audio_features(multimodal.to_wav_payloads(_docs(sf_dir)))


def _mm_video(sf_dir: str):
    # REAL YUV4MPEG2 container parse + frame sampling over synthesized
    # .y4m payloads (rows-only: DuckDB cannot parse y4m; pytest checks vs
    # an independent parse)
    return multimodal.video_frame_features(
        multimodal.to_y4m_payloads(_docs(sf_dir))
    )


def _doc_embed_ann(sf_dir: str):
    # feature-extract → similarity search, end to end: embed the documents
    # with the hashing trick, then brute-force top-k against fixed queries
    emb = ann.embed_texts(_docs(sf_dir)).map_batches(
        lambda t: t.rename_columns(
            ["vec_id" if c == "doc_id" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    return ann.brute_force_topk(emb, ann.fixed_queries(64), k=_ANN_K)


def _ev_tumbling(sf_dir: str):
    return windows.tumbling_window(readers.read_table(sf_dir, "events"))


def _ev_sliding(sf_dir: str):
    return windows.sliding_window(readers.read_table(sf_dir, "events"))


def _ev_top_events(sf_dir: str):
    return windows.top_events_per_user(readers.read_table(sf_dir, "events"))


def _ev_sessionize(sf_dir: str):
    return windows.sessionize(readers.read_table(sf_dir, "events"))


def _dedup_simhash_groups(sf_dir: str):
    return dedupe.simhash_dup_groups(_docs(sf_dir))


def _emb_gram(sf_dir: str):
    # exact integer Gram matrix (covariance/PCA primitive): one X'X matmul
    # per block into a dim²-bounded grouped agg (stages/ann.embedding_gram)
    from medknowledgegraph_ray.stages import ann as _ann_mod

    return _ann_mod.embedding_gram(
        readers.read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"]),
        dim=64,
    )


def _doc_compression(sf_dir: str):
    # zlib compression-ratio quality signal (Gopher repetitive-content
    # filter); rows-only — no SQL zlib (stages/textstats.compression_ratio)
    return textstats.compression_ratio(
        readers.read_table(sf_dir, "documents", columns=["doc_id", "text"])
    )


def _ev_overlap_pairs(sf_dir: str):
    # interval×interval overlap self-join: concurrent-session user pairs
    # via time-chunk bucketing (recall 1) + guarded bucket pairs + exact
    # interval verify (stages/eventagg.session_overlap_pairs)
    return eventagg.session_overlap_pairs(readers.read_table(sf_dir, "events"))


def _ev_rolling_median(sf_dir: str):
    # per-user rolling lower median (ROWS 6 PRECEDING), the order-statistic
    # window on the ordered-scan scaffold (stages/windows.rolling_median)
    return windows.rolling_median(
        readers.read_table(sf_dir, "events", columns=["user_id", "event_id", "value"]),
        w=7,
    )


def _ev_histogram_eqdepth(sf_dir: str):
    # equi-depth (ntile) histogram: global-rank sort + map-only bucket
    # assignment + k-bounded grouped agg (stages/eventagg.equi_depth_histogram)
    return eventagg.equi_depth_histogram(
        readers.read_table(sf_dir, "events", columns=["user_id", "event_id", "value"]),
        k=8,
    )


def _dedup_simhash_pairs(sf_dir: str):
    # Hamming-near pairs over 64-bit SimHash (Manku et al. web dedup):
    # pigeonhole 4×16-bit banding (recall exactly 1 at hamming ≤ 3) through
    # the guarded _bucket_pairs + _verified_pairs machinery
    # (stages/dedupe.simhash_near_pairs)
    return dedupe.simhash_near_pairs(_docs(sf_dir), max_hamming=3)


_TERM = "xelorvan"  # guaranteed planted disease stem (datagen._DIS_STEMS[0])
_TERM_CAP = 50


def _kg_term_convs(sf_dir: str):
    # term-scoped corpus selection (search_pubmed(term, n) analog,
    # fetch_ncbi.py:37-59): conversations mentioning the term, capped,
    # deterministic conv_id order
    import pyarrow as _pa
    import ray.data as _rd

    ids = kg.conv_scope_ids(sf_dir, _TERM, _TERM_CAP)
    return _rd.from_arrow(_pa.table({"conv_id": _pa.array(ids, _pa.string())}))


def _kg_top_cuis_strict(sf_dir: str):
    # the JobRequest knobs (score_min / top_entities / top_cuis) actually
    # reaching the selection chain — oracle runs the same overridden values
    return kg.top_cui_links(sf_dir, top_entities_k=8, top_cuis_k=2, score_min=0.9)


def _kg_links_fuzzy(sf_dir: str):
    # trigram-Jaccard fuzzy candidate scoring (J2's ANN-lookup analog);
    # rows-only: the fuzzy score surface is not cheaply SQL-expressible
    from medknowledgegraph_ray.pipelines import kg as _kg
    from medknowledgegraph_ray.stages import linker as _linker

    return _linker.link_surfaces(_kg.mention_rows(sf_dir), fuzzy=True)


def _ann_query_values_sql() -> str:
    q = ann.fixed_queries(_ANN_DIM)
    rows = ",".join(
        f"({qid}, [{','.join(repr(v) for v in vec)}]::DOUBLE[])"
        for qid, vec in zip(q["query_id"], q["matrix"])
    )
    return f"(VALUES {rows}) q(query_id, qv)"


def queries() -> dict[str, Callable[[str], Any]]:
    # Generate the corpora the driver will exercise (idempotent, ~1 s).
    datagen.ensure_transcripts("/root/testdata/sf0.001")
    datagen.ensure_transcripts(_SF001)
    return {
        # ---- block 1 (r5 rotation): the driver records the FIRST 50 rows
        # only.  Stale-or-never set at r5 = 23 never-recorded oracle
        # entries + 1 r01 + 39 r02 = 63 > 50, so the lead takes them in
        # staleness order: all 23 never-recorded oracle entries, the r01
        # entry, then 26 of the 39 r02 entries — every kg entry except
        # the gene/protein intersection variants (the SAME intersection
        # operator gets its fresh record via the umls/go variants).  The
        # 13 r02 leftovers sit immediately after the cap (first in line
        # if the driver ever records more) and stay green in pytest
        # sf0.001 parity and the full tools/check_oracles.py sweep, which
        # covers ALL entries regardless of this ordering.
        # -- never driver-recorded (fifth/sixth-session additions) --
        "doc_chunk": _doc_chunk,
        "agg_forecast_rev": analytics.forecast_revenue,
        "agg_line_priority": analytics.line_priority_counts,
        "agg_part_suppliers": analytics.part_supplier_variety,
        "join_heavy_suppliers": analytics.heavy_suppliers,
        "ev_mad": _ev_mad,
        "ev_winsorize": _ev_winsorize,
        "emb_dim_stats": _emb_dim_stats,
        "doc_needle_hits": _doc_needle_hits,
        "scan_unpivot": _scan_unpivot,
        "graph_pagerank": _graph_pagerank,
        "graph_triangles": _graph_triangles,
        "doc_dup_spans": _doc_dup_spans,
        "doc_bm25": _doc_bm25,
        "graph_kcore": _graph_kcore,
        "emb_normalize": _emb_normalize,
        "doc_bigram_lm": _doc_bigram_lm,
        "doc_negatives": _doc_negatives,
        "scan_skyline": _scan_skyline,
        "ev_assoc_rules": _ev_assoc_rules,
        "ev_window_dedup": _ev_window_dedup,
        "mm_image": _mm_image,
        "mm_png": _mm_png,
        "graph_degree_hist": _graph_degree_hist,
        # -- r01-recorded --
        "join_region_counts": analytics.nation_region_counts,
        # -- r02-recorded kg block (26 of 28; see note above) --
        "kg_conversations": kg.conversations,
        "kg_turn_roundtrip": kg.turn_roundtrip,
        "kg_mentions": kg.mention_rows,
        "kg_conv_entities": kg.conv_entities,
        "kg_links": kg.links,
        "kg_edges": kg.edges,
        "kg_nodes": kg.nodes,
        "kg_genes": kg.genes,
        "kg_snomed": kg.snomed,
        "kg_proteins": kg.proteins,
        "kg_go": kg.go_terms,
        "kg_selected_cuis": kg.selected_cuis,
        "kg_intersection_umls": lambda sf: kg.intersection(sf, "UMLS"),
        "kg_abbrev_defs": kg.abbrev_definitions,
        "kg_top_cuis": kg.top_cui_links,
        "kg_top_entities": kg.top_entities,
        "kg_entity_counts": kg.entity_counts,
        "kg_clinical_features": kg.clinical_features,
        "kg_intersection_go": lambda sf: kg.intersection(sf, "GO"),
        "kg_term_convs": _kg_term_convs,
        "kg_top_cuis_strict": _kg_top_cuis_strict,
        "kg_mentions_resolved": kg.mentions_resolved,
        "kg_mentions_user": kg.user_mentions,
        "kg_tool_counts": kg.tool_counts,
        "kg_tool_edges": kg.tool_edges,
        # ---- past the 50-row cap: the 14 r01/r02 leftovers that did not
        # fit the lead (mm_png, a new never-recorded oracle entry, takes
        # the 50th slot; kg_mentions_hourly joins the two intersection
        # variants + the non-kg r02 block here) — first in line if the
        # driver ever records more rows
        "kg_mentions_hourly": kg.hourly_mentions,
        "kg_intersection_gene": lambda sf: kg.intersection(sf, "Gene"),
        "kg_intersection_protein": lambda sf: kg.intersection(sf, "Protein"),
        "doc_quality": _quality,
        "dedup_exact": _dedup_exact,
        "dedup_minhash": _dedup_minhash,
        "ann_topk": _ann_topk,
        "doc_stats": _doc_stats,
        "doc_lang_id": _lang_id,
        "doc_sample": _doc_sample,
        "doc_tokens_bpe": _tokens_bpe,
        "mm_metadata": _mm_metadata,
        "ev_tumbling": _ev_tumbling,
        "ev_sliding": _ev_sliding,
        # ---- recorded green in CORRECTNESS_r04 ----
        "doc_typo_pairs": _doc_typo_pairs,
        "ev_time_window": _ev_time_window,
        "agg_grouping_sets": _agg_grouping_sets,
        "ev_coverage": _ev_coverage,
        "dedup_cluster_sizes": _dedup_cluster_sizes,
        "ev_transitions": _ev_transitions,
        "ev_running_distinct": _ev_running_distinct,
        "ev_window_users": _ev_window_users,
        "ev_type_pairs": _ev_type_pairs,
        "doc_weighted_sample": _doc_weighted_sample,
        "join_promo_ratio": _join_promo_ratio,
        "ev_gaps": _ev_gaps,
        "ev_trend": _ev_trend,
        "doc_length_rank": _doc_length_rank,
        "join_bloom_orders": _join_bloom_orders,
        "dedup_embedding": _dedup_embedding,
        "ev_zscore": _ev_zscore,
        "doc_stratified": _doc_stratified,
        "ev_percentile": _ev_percentile,
        # new this session — need their first driver record
        "doc_pii": _doc_pii,
        "doc_urls": _doc_urls,
        "join_anti_customers": _join_anti_customers,
        "doc_top_tokens": _doc_top_tokens,
        "ev_user_paths": _ev_user_paths,
        "doc_seg_dedup": _doc_seg_dedup,
        "dedup_canonical": _dedup_canonical,
        "doc_cap_per_lang": _doc_cap_per_lang,
        "dedup_incremental": _dedup_incremental,
        "doc_iqr_filter": _doc_iqr_filter,
        "join_semi_customers": _join_semi_customers,
        "ev_mode": _ev_mode,
        "join_pairs_orders": _join_pairs_orders,
        # new this session (TPC-H Q13/Q18/Q22/Q7 shapes) — need their
        # first driver record; four kg enrichment entries (kg_genes/
        # kg_snomed/kg_proteins/kg_go, r02-green) moved to the demoted
        # block to make room under the 50-row cap
        "agg_order_dist": analytics.order_count_distribution,
        "join_big_orders": analytics.large_quantity_orders,
        "agg_dormant_customers": analytics.dormant_rich_customers,
        "join_nation_volume": analytics.nation_volume,
        "join_ship_priority": analytics.shipping_priority,
        "join_returned_items": analytics.returned_item_customers,
        "doc_pmi": _doc_pmi,
        "join_local_supply": analytics.local_supply_volume,
        "join_market_share": analytics.market_share,
        "join_disjunctive_rev": analytics.disjunctive_revenue,
        # fourth-session additions (Q2/Q4/Q9/Q15/Q17/Q21 shapes + token
        # entropy) — never driver-recorded, must be inside the 50-row cap
        "join_min_cost_part": analytics.min_cost_part,
        "agg_priority_returns": analytics.priority_returns,
        "join_product_profit": analytics.product_profit,
        "join_top_supplier": analytics.top_revenue_supplier,
        "join_small_qty_rev": analytics.small_quantity_revenue,
        "join_sole_returns": analytics.sole_return_suppliers,
        "doc_entropy": _doc_entropy,
        "doc_epochs": _doc_epochs,
        # ---- block 2: recorded green in CORRECTNESS_r03 ----
        "doc_vocab": _doc_vocab,
        "doc_inverted_index": _doc_inverted_index,
        "doc_tfidf": _doc_tfidf,
        "doc_shuffle": _doc_shuffle,
        "dedup_ngram": _dedup_ngram,
        "dedup_components": _dedup_components,
        "doc_keep": _doc_keep,
        "doc_fingerprints": _fingerprints,
        "dedup_simhash": _dedup_simhash,
        "dedup_simhash_groups": _dedup_simhash_groups,
        "ev_range_join": _ev_range_join,
        "ev_running": _ev_running,
        "ev_histogram": _ev_histogram,
        "ev_global_quantiles": _ev_global_quantiles,
        "ev_user_quantiles": _ev_quantiles,
        "ev_asof_state": _ev_asof_state,
        "agg_rollup": analytics.lineitem_rollup,
        "join_customer_orders": _join_customer_orders,
        "doc_gopher": _doc_gopher,
        "doc_pack": _doc_pack,
        "doc_normalize": _doc_normalize,
        "doc_repetition": _doc_repetition,
        "doc_bigrams": _doc_bigrams,
        "ev_rank": _ev_rank,
        "ev_pivot": _ev_pivot,
        "ev_user_types": _ev_user_types,
        "ev_props": _ev_props,
        "ev_lead": _ev_lead,
        "ev_quantiles_cont": _ev_quantiles_cont,
        "ev_latest": _ev_latest,
        "ev_ntile": _ev_ntile,
        "ev_moments": _ev_moments,
        "doc_sample_k": _doc_sample_k,
        "agg_cube": _agg_cube,
        "join_left_counts": _join_left_counts,
        "join_revenue_region": analytics.revenue_by_region,
        "corpus_export": _corpus_export,
        "join_full_users": _join_full_users,
        "doc_decontaminate": _doc_decontaminate,
        "doc_logprob": _doc_logprob,
        "ev_funnel": _ev_funnel,
        "ev_retention": _ev_retention,
        "ev_top_events": _ev_top_events,
        "ev_sessionize": _ev_sessionize,
        "ev_asof_prev": _ev_asof,
        "doc_split": _doc_split,
        "agg_lineitem": analytics.lineitem_agg,
        "join_top_customers": analytics.top_customers,
        "agg_orders_by_status": analytics.orders_by_status,
        "scan_filter_pushdown": analytics.filter_pushdown_scan,
        # ---- rows-only entries (no DuckDB oracle by design: approximate
        # recall, stub decode dims) — kept LAST so a driver that caps its
        # CORRECTNESS file never drops an oracle-checked row
        "doc_vocab_hll": _doc_vocab_hll,
        "ev_users_hll": _ev_users_hll,
        "ev_quantile_sketch": _ev_quantile_sketch,
        "emb_kmeans": _emb_kmeans,
        "ann_lsh": _ann_lsh,
        "ann_ivf": _ann_ivf,
        "doc_embed_ann": _doc_embed_ann,
        "kg_links_fuzzy": _kg_links_fuzzy,
        "mm_decode": _mm_decode,
        "mm_resize": _mm_resize,
        "mm_frame_sample": _mm_frames,
        "mm_audio": _mm_audio,
        "mm_video": _mm_video,
        # -- new in round 5 (past the 50-row cap; covered by the full
        #    check_oracles.py sweep and sf0.001 pytest parity) --
        "doc_boilerplate": _doc_boilerplate,
        "graph_jaccard": _graph_jaccard,
        "kg_entity_pmi": kg.entity_pmi,
        "dedup_simhash_pairs": _dedup_simhash_pairs,
        "ev_histogram_eqdepth": _ev_histogram_eqdepth,
        "ev_rolling_median": _ev_rolling_median,
        "emb_gram": _emb_gram,
        "graph_link_predict": _graph_link_predict,
        "ev_overlap_pairs": _ev_overlap_pairs,
        # rows-only BY DESIGN (DuckDB has no zlib); behavior pinned by
        # tests/test_stages.py::test_compression_ratio_*
        "doc_compression": _doc_compression,
        "kg_entity_components": kg.entity_components,
    }


# Shared doc-stats subquery: formulas are the EXACT per-row IEEE ops the Ray
# stage runs (textstats.TextStats) — int64 counts, float64 divisions — so
# equality needs no tolerance.  \w/\s/\b are ASCII-identical between RE2
# (DuckDB) and re.ASCII (ours); documents are pure ASCII (verified).
_DOC_STATS_SQL = """
SELECT doc_id, n_chars_calc, n_tokens, n_punct, n_stop,
       CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) AS stop_ratio,
       CAST(n_punct AS DOUBLE) / greatest(n_chars_calc, 1) AS punct_ratio
FROM (
  SELECT doc_id,
         length(text) AS n_chars_calc,
         length(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS n_tokens,
         length(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         length(regexp_extract_all(lower(text),
           '\\b(the|and|of|to|a|in|is|that|for|on)\\b')) AS n_stop
  FROM documents
)
"""


# SimHash in SQL, bit-for-bit the SimHasher kernel: per-(doc, unique token)
# counts, 64-bit md5 token hash (first 16 hex chars = first 8 bytes big-endian
# = functions.text.stable_token_hash), per-bit majority vote weighted by
# count, bit set iff the vote is strictly positive, and the uint64 signature
# reinterpreted as two's-complement int64 (the Arrow/pandas int64 cast).
_SIMHASH_SIG_SQL = """
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
  FROM documents
),
tc AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
th AS (SELECT doc_id, c, CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS h FROM tc),
votes AS (
  SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN c ELSE -c END) AS v
  FROM th, UNNEST(generate_series(0, 63)) AS u(b)
  GROUP BY 1, 2
),
sig AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << b ELSE CAST(0 AS UBIGINT) END) AS s
  FROM votes GROUP BY 1
),
signed AS (
  SELECT d.doc_id,
         CAST(CASE WHEN coalesce(s.s, 0) >= CAST('9223372036854775808' AS HUGEINT)
              THEN CAST(coalesce(s.s, 0) AS HUGEINT) - CAST('18446744073709551616' AS HUGEINT)
              ELSE CAST(coalesce(s.s, 0) AS HUGEINT) END AS BIGINT) AS simhash
  FROM documents d LEFT JOIN sig s USING (doc_id)
)
"""


# Exact all-pairs word-3-shingle Jaccard at threshold 0.8 — shared by
# dedup_minhash (recall ≈1 on the planted J≥0.98 corpus) and dedup_ngram
# (recall exactly 1 at any threshold, per the prefix-filter theorem).
_PAIRWISE_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM toks, UNNEST(generate_series(1, greatest(length(t) - 2, 0))) AS u(i)
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = inter.doc_a
JOIN sizes sb ON sb.doc_id = inter.doc_b
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8
"""


def oracle_sql() -> dict[str, str]:
    datagen.ensure_transcripts(_SF001)  # the SQL reads these paths
    return {
        "kg_conversations": _kg_sql(
            "SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,"
            " string_agg(text, ' ' ORDER BY turn_idx) AS text"
            " FROM g_transcripts GROUP BY conv_id"
        ),
        "kg_turn_roundtrip": _kg_sql("SELECT conv_id, turn_idx, text FROM g_transcripts"),
        "kg_mentions": _kg_sql("SELECT conv_id, turn_idx, norm_surface, label FROM g_mentions"),
        "kg_conv_entities": _kg_sql("SELECT conv_id, norm_surface, label FROM g_conv_entities"),
        # entity co-mention connected components: the pmi edge list under
        # transitive closure, labeled by the lexicographically smallest
        # member (the engine's rank-ordered int ids preserve string order)
        "kg_entity_components": _kg_sql(
            ", de AS (SELECT DISTINCT conv_id,"
            "   norm_surface AS ent FROM g_conv_entities),"
            " p AS (SELECT a.ent AS ent_a, b.ent AS ent_b"
            "   FROM de a JOIN de b ON a.conv_id = b.conv_id"
            "    AND a.ent < b.ent GROUP BY 1, 2 HAVING count(*) >= 2),"
            " edges AS (SELECT ent_a AS u, ent_b AS v FROM p"
            "  UNION SELECT ent_b, ent_a FROM p),"
            " reach(u, v) AS ("
            "  SELECT u, u FROM edges"
            "  UNION"
            "  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)"
            " SELECT u AS entity, MIN(v) AS component FROM reach GROUP BY u"
        ).replace("\nWITH ", "\nWITH RECURSIVE ", 1),
        # entity co-occurrence PMI edges: distinct (conv, surface) incidence,
        # unordered co-mention pair counts, marginals, and the doc_pmi
        # double-op-order ln — engine arithmetic mirrored verbatim
        "kg_entity_pmi": _kg_sql(
            "SELECT ent_a, ent_b, n_xy, n_x, n_y, n_convs, pmi_e6 FROM ("
            " WITH de AS (SELECT DISTINCT conv_id, norm_surface AS ent"
            "   FROM g_conv_entities),"
            " nt AS (SELECT CAST(count(DISTINCT conv_id) AS BIGINT) AS n"
            "   FROM g_transcripts),"
            " m AS (SELECT ent, CAST(count(*) AS BIGINT) AS n FROM de"
            "   GROUP BY 1),"
            " p AS (SELECT a.ent AS ent_a, b.ent AS ent_b,"
            "   CAST(count(*) AS BIGINT) AS n_xy"
            "   FROM de a JOIN de b ON a.conv_id = b.conv_id"
            "    AND a.ent < b.ent GROUP BY 1, 2)"
            " SELECT p.ent_a, p.ent_b, p.n_xy, ma.n AS n_x, mb.n AS n_y,"
            "  nt.n AS n_convs,"
            "  CAST(round(ln((CAST(p.n_xy AS DOUBLE) * nt.n) /"
            "   (CAST(ma.n AS DOUBLE) * mb.n)) * 1000000) AS BIGINT)"
            "   AS pmi_e6"
            " FROM p JOIN m ma ON ma.ent = p.ent_a"
            " JOIN m mb ON mb.ent = p.ent_b, nt"
            " WHERE p.n_xy >= 2)"
        ),
        "kg_links": _kg_sql("SELECT norm_surface, cui, score, name, definition, label FROM g_links"),
        "kg_entity_counts": _kg_sql("SELECT norm_surface, label, n_convs FROM g_counts"),
        "kg_top_entities": _kg_sql("SELECT norm_surface, label, n_convs FROM g_top15"),
        "kg_top_cuis": _kg_sql(
            "SELECT norm_surface, cui, score, name, definition, label FROM g_top4"
        ),
        "kg_selected_cuis": _kg_sql("SELECT cui FROM g_sel"),
        "kg_term_convs": _kg_sql(
            "SELECT conv_id FROM (SELECT DISTINCT conv_id FROM g_transcripts "
            f"WHERE contains(lower(text), '{_TERM}')) "
            f"ORDER BY conv_id LIMIT {_TERM_CAP}"
        ),
        "kg_top_cuis_strict": _kg_sql(
            "SELECT norm_surface, cui, score, name, definition, label FROM g_top4",
            top_entities=8, top_cuis=2, score_min=0.9,
        ),
        "kg_abbrev_defs": _kg_sql(_abbrev_defs_subquery()),
        "kg_mentions_resolved": _kg_sql(
            "SELECT conv_id, turn_idx, norm_surface, label FROM g_mentions "
            "UNION "
            "SELECT DISTINCT t.conv_id, t.turn_idx, d.lf AS norm_surface, "
            "v.sem_label AS label "
            "FROM g_transcripts t "
            f"JOIN ({_abbrev_defs_subquery()}"
            ") d ON t.conv_id = d.conv_id "
            "JOIN g_vocab v ON v.alias = d.lf "
            "WHERE d.sf NOT IN (SELECT alias FROM g_vocab) "
            "AND regexp_matches(lower(t.text), '\\b' || d.sf || '\\b')"
        ),
        "kg_mentions_user": _kg_sql(
            "SELECT DISTINCT t.conv_id, t.turn_idx, v.alias AS norm_surface, "
            "v.sem_label AS label FROM g_transcripts t JOIN g_vocab v "
            "ON regexp_matches(lower(t.text), '\\b' || v.alias || '\\b') "
            "WHERE t.role = 'user'"
        ),
        "kg_tool_counts": _kg_sql(
            "SELECT tool, CAST(count(*) AS BIGINT) AS n_uses, "
            "CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs "
            "FROM g_transcripts WHERE tool <> '' GROUP BY tool"
        ),
        "kg_tool_edges": _kg_sql(
            "SELECT DISTINCT 'Conversation:' || conv_id AS subj, "
            f"'{config.PRED}' AS pred, 'Tool:' || tool AS obj "
            "FROM g_transcripts WHERE tool <> ''"
        ),
        "kg_mentions_hourly": _kg_sql(
            "SELECT epoch_us(t.ts) // 3600000000 AS hour_bucket, m.label, "
            "CAST(count(*) AS BIGINT) AS n_mentions "
            "FROM g_mentions m JOIN g_transcripts t USING (conv_id, turn_idx) "
            "GROUP BY 1, 2"
        ),
        "kg_genes": _kg_sql("SELECT source, gene FROM g_genes"),
        "kg_snomed": _kg_sql("SELECT source, saui, snomed_text, scui, sab FROM g_snomed"),
        "kg_clinical_features": _kg_sql(
            "SELECT source, feat_cui, feat_type, name, definition FROM g_cf"
        ),
        "kg_proteins": _kg_sql(
            "SELECT source, entry, name, protein_names, organism, function_text, url FROM g_proteins"
        ),
        "kg_go": _kg_sql("SELECT source, go_id, go_name, go_type FROM g_go"),
        "kg_edges": _kg_sql(
            "SELECT 'Conversation:' || conv_id AS subj, 'CONTAINS' AS pred,"
            "       label || ':' || norm_surface AS obj FROM g_conv_entities"
            " UNION SELECT label || ':' || norm_surface, 'CONTAINS', 'UMLS:' || cui FROM g_links"
            " UNION SELECT 'UMLS:' || source, 'CONTAINS', 'Gene:' || gene FROM g_genes"
            " UNION SELECT 'UMLS:' || source, 'CONTAINS', 'SnomedConcept:' || saui FROM g_snomed"
            " UNION SELECT 'UMLS:' || source, 'CONTAINS', 'ClinicalFeature:' || feat_cui FROM g_cf"
            " UNION SELECT 'Gene:' || source, 'CONTAINS', 'Protein:' || entry FROM g_proteins"
            " UNION SELECT 'Protein:' || source, 'CONTAINS', 'GO:' || go_id FROM g_go"
        ),
        "kg_nodes": _kg_sql(
            "SELECT canonical_id, node_label, name, definition FROM ("
            " SELECT *, row_number() OVER (PARTITION BY canonical_id"
            "   ORDER BY node_label, name, definition) AS rn FROM ("
            "  SELECT DISTINCT 'Conversation:' || conv_id AS canonical_id,"
            "         'Conversation' AS node_label, conv_id AS name, '' AS definition"
            "  FROM g_transcripts"
            "  UNION SELECT DISTINCT label || ':' || norm_surface, label, norm_surface, ''"
            "  FROM g_conv_entities"
            "  UNION SELECT DISTINCT 'UMLS:' || cui, 'UMLS', name, definition FROM g_links"
            "  UNION SELECT DISTINCT 'Gene:' || gene, 'Gene', gene, '' FROM g_genes"
            "  UNION SELECT DISTINCT 'SnomedConcept:' || saui, 'SnomedConcept', snomed_text, ''"
            "  FROM g_snomed"
            "  UNION SELECT DISTINCT 'ClinicalFeature:' || feat_cui, 'ClinicalFeature', name,"
            "         definition FROM g_cf"
            "  UNION SELECT DISTINCT 'Protein:' || entry, 'Protein', name, '' FROM g_proteins"
            "  UNION SELECT DISTINCT 'GO:' || go_id, 'GO', go_name, '' FROM g_go"
            " )) WHERE rn = 1"
        ),
        "kg_intersection_umls": _kg_sql(
            ", lvl_u AS (SELECT DISTINCT norm_surface AS term, cui AS node FROM g_top4)"
            " SELECT a.term AS term_a, b.term AS term_b,"
            " CAST(count(*) AS BIGINT) AS n_common"
            " FROM lvl_u a JOIN lvl_u b ON a.node = b.node AND a.term < b.term"
            " GROUP BY 1, 2"
        ),
        "kg_intersection_gene": _kg_sql(
            ", lvl_g AS (SELECT DISTINCT t4.norm_surface AS term, g.gene AS node"
            "   FROM g_top4 t4 JOIN g_gene_map g USING (cui))"
            " SELECT a.term AS term_a, b.term AS term_b,"
            " CAST(count(*) AS BIGINT) AS n_common"
            " FROM lvl_g a JOIN lvl_g b ON a.node = b.node AND a.term < b.term"
            " GROUP BY 1, 2"
        ),
        "kg_intersection_protein": _kg_sql(
            ", lvl_p AS (SELECT DISTINCT t4.norm_surface AS term, p.entry AS node"
            "   FROM g_top4 t4 JOIN g_gene_map g USING (cui)"
            "   JOIN g_protein_map p USING (gene))"
            " SELECT a.term AS term_a, b.term AS term_b,"
            " CAST(count(*) AS BIGINT) AS n_common"
            " FROM lvl_p a JOIN lvl_p b ON a.node = b.node AND a.term < b.term"
            " GROUP BY 1, 2"
        ),
        "kg_intersection_go": _kg_sql(
            ", lvl_go AS (SELECT DISTINCT t4.norm_surface AS term,"
            "    regexp_extract(trim(part), '\\[GO:(\\d+)\\]', 1) AS node"
            "   FROM g_top4 t4 JOIN g_gene_map g USING (cui)"
            "   JOIN g_protein_map p USING (gene),"
            "   UNNEST(string_split(p.go, ';')) AS u(part)"
            "   WHERE regexp_matches(part, '\\[GO:\\d+\\]'))"
            " SELECT a.term AS term_a, b.term AS term_b,"
            " CAST(count(*) AS BIGINT) AS n_common"
            " FROM lvl_go a JOIN lvl_go b ON a.node = b.node AND a.term < b.term"
            " GROUP BY 1, 2"
        ),
        # ---- training-data pipeline oracles (views pre-registered by the
        # driver at sf0.01: documents, embeddings, events, lineitem, …) ----
        "doc_stats": _DOC_STATS_SQL,
        "doc_lang_id": (
            "SELECT doc_id, CASE WHEN n_tokens > 0 AND stop_ratio >= 0.08"
            " THEN 'en' ELSE 'other' END AS lang_pred FROM (" + _DOC_STATS_SQL + ")"
        ),
        "doc_quality": (
            "SELECT doc_id, round("
            " 0.4 * (CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.0 END)"
            " + 0.4 * least(stop_ratio / 0.08, 1.0)"
            " + 0.2 * (1.0 - least(punct_ratio / 0.2, 1.0)), 6) AS quality"
            " FROM (" + _DOC_STATS_SQL + ")"
        ),
        "dedup_exact": (
            "SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,"
            " CAST(count(*) AS BIGINT) AS n_dups FROM documents GROUP BY 1"
        ),
        "doc_tokens_bpe": (
            "SELECT doc_id, length(regexp_extract_all(lower(text),"
            " '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens FROM documents"
        ),
        "doc_sample": (
            "SELECT doc_id FROM documents"
            " WHERE ((CAST(doc_id AS UBIGINT) * 2654435761) % 4294967296) % 100 < 10"
        ),
        "doc_split": (
            "SELECT doc_id, lang,"
            " CASE WHEN b < 10 THEN 'val' WHEN b < 20 THEN 'test'"
            " ELSE 'train' END AS split"
            " FROM (SELECT doc_id, lang,"
            "  ((CAST(doc_id AS UBIGINT) * 2654435761) % 4294967296) % 100 AS b"
            "  FROM documents)"
        ),
        # Rolling polynomial fingerprint (base 1000003 mod 2^61-1) folded in
        # HUGEINT over md5-derived 64-bit token hashes — exactly
        # textstats.Fingerprinter (acc starts at 0 via list_prepend).
        "doc_fingerprints": (
            "SELECT doc_id, CAST(list_reduce("
            " list_prepend(CAST(0 AS HUGEINT),"
            "  list_transform(regexp_extract_all(lower(text), '[a-z0-9]+'),"
            "   t -> CAST(CAST(('0x' || substr(md5(t), 1, 16)) AS UBIGINT) AS HUGEINT))),"
            " (acc, h) -> (acc * 1000003 + h) % 2305843009213693951) AS BIGINT)"
            " AS fingerprint FROM documents"
        ),
        "dedup_simhash": (
            "WITH " + _SIMHASH_SIG_SQL + " SELECT doc_id, simhash FROM signed"
        ),
        # all-pairs Hamming ≤ 3 over the same bit-exact signature CTE —
        # the engine's pigeonhole banding has recall exactly 1, so the
        # brute-force oracle matches identically
        "dedup_simhash_pairs": (
            "WITH " + _SIMHASH_SIG_SQL
            + " SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,"
            " CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)"
            "  AS hamming"
            " FROM signed a JOIN signed b ON a.doc_id < b.doc_id"
            " WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"
        ),
        "dedup_simhash_groups": (
            "WITH " + _SIMHASH_SIG_SQL
            + " SELECT simhash, CAST(count(*) AS BIGINT) AS n_docs,"
            " CAST(min(doc_id) AS BIGINT) AS min_doc"
            " FROM signed GROUP BY 1 HAVING count(*) >= 2"
        ),
        "doc_vocab": (
            "SELECT CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens"
            " FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok"
            "       FROM documents)"
        ),
        "doc_inverted_index": (
            "WITH pairs AS (SELECT DISTINCT doc_id, tok FROM"
            " (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok"
            "  FROM documents))"
            " SELECT tok, CAST(count(*) AS BIGINT) AS n_docs,"
            " string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings"
            " FROM pairs GROUP BY tok"
        ),
        # integer micro-unit scores (the windows.py value_e6 convention);
        # idf via libm ln on both sides, so the e6 grid is bit-identical
        "doc_tfidf": (
            "WITH toks AS (SELECT doc_id,"
            " unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok"
            " FROM documents),"
            " tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf"
            "  FROM toks GROUP BY 1, 2),"
            " df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),"
            " n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),"
            " scored AS (SELECT tf.doc_id, tf.tok, tf.tf,"
            "  CAST(round(tf.tf * ln(n.n / df.df) * 1000000) AS BIGINT) AS tfidf_e6"
            "  FROM tf JOIN df USING (tok) CROSS JOIN n),"
            " ranked AS (SELECT *, CAST(row_number() OVER ("
            "  PARTITION BY doc_id ORDER BY tfidf_e6 DESC, tok) AS BIGINT) AS rank"
            "  FROM scored)"
            " SELECT doc_id, tok, tf, tfidf_e6, rank FROM ranked WHERE rank <= 5"
        ),
        # seeded shard shuffle: same splitmix64 key construction as the
        # engine (stages/shuffle.shuffle_key_sql — bit-exact mod-2^64
        # arithmetic), shard = key mod 8, position = row_number within
        # shard over (skey, doc_id)
        "doc_shuffle": (
            "WITH " + _shuffle.shuffle_key_sql("documents") + ","
            " sharded AS (SELECT doc_id, skey,"
            "  CAST(skey % 8 AS BIGINT) AS shard FROM keyed)"
            " SELECT doc_id, skey, shard,"
            "  CAST(row_number() OVER (PARTITION BY shard"
            "   ORDER BY skey, doc_id) AS BIGINT) AS pos"
            " FROM sharded"
        ),
        "join_customer_orders": (
            "SELECT c.c_custkey AS o_custkey, c.c_name, c.c_mktsegment,"
            " o.o_orderkey,"
            " CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_c"
            " FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey"
        ),
        "ev_global_quantiles": (
            "WITH v AS (SELECT CAST(round(value * 1000000) AS BIGINT) AS value_e6"
            " FROM events)"
            " SELECT CAST(quantile_disc(value_e6, 0.5) AS BIGINT) AS p50_e6,"
            " CAST(quantile_disc(value_e6, 0.9) AS BIGINT) AS p90_e6,"
            " CAST(quantile_disc(value_e6, 0.99) AS BIGINT) AS p99_e6"
            " FROM v"
        ),
        # rolling lower median: quantile_disc(0.5) over the ROWS frame —
        # identical (n-1)//2 lower-element semantics as the engine kernel
        "ev_rolling_median": (
            "WITH v AS (SELECT CAST(user_id AS BIGINT) AS user_id,"
            "  CAST(event_id AS BIGINT) AS event_id,"
            "  CAST(round(value * 1000000) AS BIGINT) AS value_e6"
            "  FROM events)"
            " SELECT user_id, event_id, value_e6,"
            " CAST(quantile_disc(value_e6, 0.5) OVER (PARTITION BY user_id"
            "  ORDER BY event_id ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"
            "  AS BIGINT) AS med_e6"
            " FROM v"
        ),
        # equi-depth histogram: ntile over the SAME (value_e6, event_id)
        # total order the engine's global row number uses
        "ev_histogram_eqdepth": (
            "WITH v AS (SELECT CAST(round(value * 1000000) AS BIGINT)"
            "  AS value_e6, event_id FROM events),"
            " t AS (SELECT value_e6, CAST(ntile(8) OVER"
            "  (ORDER BY value_e6, event_id) AS BIGINT) AS bucket FROM v)"
            " SELECT bucket, CAST(count(*) AS BIGINT) AS n,"
            " min(value_e6) AS min_e6, max(value_e6) AS max_e6"
            " FROM t GROUP BY bucket"
        ),
        "ev_histogram": (
            "WITH b AS (SELECT CAST(floor(CAST(round(value * 1000000) AS BIGINT)"
            "  / 500000.0) AS BIGINT) AS bucket FROM events)"
            " SELECT bucket, CAST(count(*) AS BIGINT) AS n_events"
            " FROM b GROUP BY bucket"
        ),
        # anti-join: corpus minus the non-representative members of each
        # transitive near-dup component (same recursive CTE as
        # dedup_components)
        "doc_keep": (
            "WITH RECURSIVE pairs AS (" + _PAIRWISE_JACCARD_SQL + "),"
            " edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs"
            "  UNION SELECT doc_b, doc_a FROM pairs),"
            " reach(u, v) AS ("
            "  SELECT u, u FROM edges"
            "  UNION"
            "  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),"
            " comp AS (SELECT u AS doc_id, MIN(v) AS component"
            "  FROM reach GROUP BY u)"
            " SELECT doc_id FROM documents WHERE doc_id NOT IN"
            "  (SELECT doc_id FROM comp WHERE doc_id <> component)"
        ),
        "agg_rollup": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,"
            " COALESCE(l_linestatus, 'ALL') AS l_linestatus,"
            " CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,"
            " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
            "  AS sum_base_price_c,"
            " CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)"
            "  AS BIGINT)) AS BIGINT) AS sum_revenue_e4,"
            " CAST(count(*) AS BIGINT) AS n_rows"
            " FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        "ev_running": (
            "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
            "  CAST(round(value * 1000000) AS BIGINT) AS value_e6 FROM events)"
            " SELECT user_id, event_id, ts_us, value_e6,"
            "  CAST(SUM(value_e6) OVER (PARTITION BY user_id ORDER BY ts_us,"
            "   event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_value_e6,"
            "  CAST(SUM(value_e6) OVER (PARTITION BY user_id ORDER BY ts_us,"
            "   event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)"
            "   AS roll_value_e6"
            " FROM e"
        ),
        "ev_rank": (
            "WITH e AS (SELECT user_id, event_id,"
            "  CAST(round(value * 1000000) AS BIGINT) AS value_e6 FROM events)"
            " SELECT user_id, event_id, value_e6,"
            "  ROW_NUMBER() OVER (PARTITION BY user_id"
            "   ORDER BY value_e6 DESC, event_id) AS row_num,"
            "  RANK() OVER (PARTITION BY user_id ORDER BY value_e6 DESC) AS rnk,"
            "  DENSE_RANK() OVER (PARTITION BY user_id ORDER BY value_e6 DESC)"
            "   AS dense_rnk"
            " FROM e"
        ),
        "ev_pivot": (
            "SELECT user_id,"
            " CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,"
            " CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,"
            " CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,"
            " CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,"
            " CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,"
            " CAST(count(*) AS BIGINT) AS n_total"
            " FROM events GROUP BY user_id"
        ),
        "ev_user_types": (
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,"
            " CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,"
            " min(epoch_us(ts)) AS first_ts_us, max(epoch_us(ts)) AS last_ts_us"
            " FROM events GROUP BY user_id"
        ),
        "ev_props": (
            "SELECT event_type, CAST(count(*) AS BIGINT) AS n,"
            " CAST(sum(k) AS BIGINT) AS k_sum, min(k) AS k_min, max(k) AS k_max"
            " FROM (SELECT event_type,"
            "  CAST(coalesce(nullif(regexp_extract(props, '[0-9]+'), ''), '0')"
            "   AS BIGINT) AS k FROM events)"
            " GROUP BY event_type"
        ),
        "doc_gopher": (
            "WITH t AS (SELECT doc_id,"
            "  length(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))"
            "   AS n_tokens,"
            "  length(regexp_extract_all(text, '\\S')) AS n_alpha,"
            "  length(regexp_extract_all(lower(text),"
            "   '\\b(the|and|of|to|a|in|is|that|for|on)\\b')) AS n_stop"
            " FROM documents)"
            " SELECT doc_id, n_tokens, n_alpha,"
            "  CAST(n_alpha AS DOUBLE) / greatest(n_tokens, 1) AS mean_tok_len,"
            "  n_tokens BETWEEN 40 AND 120 AS words_ok,"
            "  CAST(n_alpha AS DOUBLE) / greatest(n_tokens, 1) BETWEEN 3.0 AND 10.0"
            "   AS mean_ok,"
            "  CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) >= 0.05 AS stop_ok,"
            "  (n_tokens BETWEEN 40 AND 120)"
            "   AND (CAST(n_alpha AS DOUBLE) / greatest(n_tokens, 1) BETWEEN 3.0 AND 10.0)"
            "   AND (CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) >= 0.05) AS keep"
            " FROM t"
        ),
        # greedy token-stream packing: cumulative token offsets over doc_id
        # order (window SUM), one output row per (doc, chunk) overlap
        "doc_pack": (
            "WITH t AS (SELECT doc_id,"
            "  length(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))"
            "   AS n FROM documents),"
            " c AS (SELECT doc_id, n,"
            "   CAST(SUM(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n"
            "    AS BIGINT) AS strt"
            "  FROM t WHERE n > 0),"
            " x AS (SELECT doc_id, n, strt,"
            "   unnest(generate_series(strt // 512, (strt + n - 1) // 512))"
            "    AS chunk_id FROM c)"
            " SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,"
            "  CAST(greatest(0, chunk_id * 512 - strt) AS BIGINT) AS tok_start,"
            "  CAST(least(n, (chunk_id + 1) * 512 - strt) AS BIGINT) AS tok_end"
            " FROM x"
        ),
        "ev_lead": (
            "SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
            " CAST(round(value * 1000000) AS BIGINT) AS value_e6,"
            " coalesce(lead(CAST(round(value * 1000000) AS BIGINT)) OVER ("
            "  PARTITION BY user_id ORDER BY epoch_us(ts), event_id), 0)"
            "  AS next_value_e6"
            " FROM events"
        ),
        "ev_latest": (
            "SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
            " CAST(round(value * 1000000) AS BIGINT) AS value_e6"
            " FROM events"
            " QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id"
            "  ORDER BY epoch_us(ts) DESC, event_id DESC) = 1"
        ),
        "ev_retention": (
            "WITH a AS (SELECT DISTINCT user_id,"
            "  epoch_us(ts) // 86400000000 AS day FROM events)"
            " SELECT a.day, CAST(count(*) AS BIGINT) AS n_active,"
            "  CAST(sum((a2.user_id IS NOT NULL)::INT) AS BIGINT) AS n_retained"
            " FROM a LEFT JOIN a a2"
            "  ON a.user_id = a2.user_id AND a2.day = a.day + 1"
            " GROUP BY a.day"
        ),
        "ev_funnel": (
            "WITH s AS (SELECT user_id, min(epoch_us(ts)) AS t1"
            "  FROM events WHERE event_type = 'signup' GROUP BY 1),"
            " c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2"
            "  FROM events e JOIN s ON e.user_id = s.user_id"
            "  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s.t1"
            "  GROUP BY 1),"
            " p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3"
            "  FROM events e JOIN c ON e.user_id = c.user_id"
            "  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2"
            "  GROUP BY 1)"
            " SELECT s.user_id, s.t1 AS t1_us,"
            "  coalesce(c.t2, 0) AS t2_us, coalesce(p.t3, 0) AS t3_us,"
            "  CAST(1 + (c.user_id IS NOT NULL)::INT"
            "   + (p.user_id IS NOT NULL)::INT AS BIGINT) AS stage"
            " FROM s LEFT JOIN c ON s.user_id = c.user_id"
            " LEFT JOIN p ON s.user_id = p.user_id"
        ),
        "doc_logprob": (
            "WITH toks AS (SELECT doc_id,"
            " unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok"
            " FROM documents),"
            " tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf"
            "  FROM toks GROUP BY 1, 2),"
            " v AS (SELECT tok, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1),"
            " nn AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM v),"
            " contrib AS (SELECT tf.doc_id, tf.tf,"
            "  CAST(round(tf.tf * ln(v.cnt / nn.n) * 1000000) AS BIGINT) AS c_e6"
            "  FROM tf JOIN v USING (tok) CROSS JOIN nn)"
            " SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,"
            "  CAST(sum(c_e6) AS BIGINT) AS logprob_sum_e6,"
            "  CAST(sum(c_e6) AS DOUBLE) / sum(tf) AS avg_logprob_e6"
            " FROM contrib GROUP BY doc_id"
        ),
        # token-boundary 8-gram overlap vs the doc_id<=3 benchmark set
        "doc_decontaminate": (
            "WITH toks AS (SELECT doc_id,"
            "  list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS l"
            " FROM documents),"
            " grams AS (SELECT DISTINCT array_to_string(l[i:i+7], ' ') AS g"
            "  FROM toks, UNNEST(generate_series(1, len(l) - 7)) AS t(i)"
            "  WHERE doc_id <= 3),"
            " wins AS (SELECT doc_id, array_to_string(l[i:i+7], ' ') AS g"
            "  FROM toks, UNNEST(generate_series(1, len(l) - 7)) AS t(i)),"
            " hits AS (SELECT DISTINCT w.doc_id FROM wins w"
            "  JOIN grams ON w.g = grams.g)"
            " SELECT t.doc_id, t.doc_id IN (SELECT doc_id FROM hits)"
            "  AS contaminated"
            " FROM toks t"
        ),
        "join_full_users": (
            "WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n"
            "  FROM events WHERE event_type = 'click' AND value > 110.0"
            "  GROUP BY 1),"
            " p AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n"
            "  FROM events WHERE event_type = 'purchase' AND value > 110.0"
            "  GROUP BY 1)"
            " SELECT COALESCE(c.user_id, p.user_id) AS user_id,"
            "  CAST(COALESCE(c.n, 0) AS BIGINT) AS n_hi_clicks,"
            "  CAST(COALESCE(p.n, 0) AS BIGINT) AS n_hi_purchases"
            " FROM c FULL OUTER JOIN p ON c.user_id = p.user_id"
        ),
        # the end-to-end corpus pipeline as ONE oracle: Gopher keep →
        # min-doc-id-per-normalized-md5 dedup → splitmix64 shard/pos assignment
        "corpus_export": (
            "WITH g AS (SELECT doc_id,"
            "  length(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))"
            "   AS n_tokens,"
            "  length(regexp_extract_all(text, '\\S')) AS n_alpha,"
            "  length(regexp_extract_all(lower(text),"
            "   '\\b(the|and|of|to|a|in|is|that|for|on)\\b')) AS n_stop,"
            "  md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h"
            " FROM documents),"
            " kept AS (SELECT doc_id, h FROM g"
            "  WHERE n_tokens BETWEEN 40 AND 120"
            "   AND CAST(n_alpha AS DOUBLE) / greatest(n_tokens, 1)"
            "    BETWEEN 3.0 AND 10.0"
            "   AND CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) >= 0.05),"
            " surv AS (SELECT doc_id FROM kept"
            "  QUALIFY ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) = 1),"
            + _shuffle.shuffle_key_sql("surv") +
            " SELECT doc_id, CAST(skey % 8 AS BIGINT) AS shard,"
            "  CAST(ROW_NUMBER() OVER (PARTITION BY skey % 8"
            "   ORDER BY skey, doc_id) AS BIGINT) AS pos"
            " FROM keyed"
        ),
        "join_revenue_region": (
            "SELECT r.r_name,"
            " CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)"
            "  AS revenue_c,"
            " CAST(count(*) AS BIGINT) AS n_orders"
            " FROM orders o"
            " JOIN customer c ON o.o_custkey = c.c_custkey"
            " JOIN nation n ON c.c_nationkey = n.n_nationkey"
            " JOIN region r ON n.n_regionkey = r.r_regionkey"
            " GROUP BY r.r_name"
        ),
        # TPC-H Q13 shape: order-count distribution including the
        # zero-order bucket (LEFT-join semantics)
        "agg_order_dist": (
            "SELECT CAST(c_count AS BIGINT) AS c_count,"
            " CAST(count(*) AS BIGINT) AS custdist"
            " FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count"
            "   FROM customer c LEFT JOIN orders o"
            "     ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'O'"
            "   GROUP BY c.c_custkey)"
            " GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
        ),
        # TPC-H Q18 shape: GROUP BY + HAVING on the fact table, join-back
        # to orders and customer, top-100 by order value (total order on
        # (price_c DESC, o_orderkey) makes the LIMIT boundary exact)
        "join_big_orders": (
            "WITH hot AS (SELECT l_orderkey,"
            "  CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty"
            " FROM lineitem GROUP BY l_orderkey"
            " HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300)"
            " SELECT c.c_name, CAST(c.c_custkey AS BIGINT) AS c_custkey,"
            "  CAST(o.o_orderkey AS BIGINT) AS o_orderkey,"
            "  epoch_us(o.o_orderdate) AS odate_us,"
            "  CAST(round(o.o_totalprice * 100) AS BIGINT) AS price_c,"
            "  h.sum_qty"
            " FROM hot h"
            " JOIN orders o ON o.o_orderkey = h.l_orderkey"
            " JOIN customer c ON c.c_custkey = o.o_custkey"
            " ORDER BY price_c DESC, o_orderkey LIMIT 100"
        ),
        # TPC-H Q22 shape: the mean comparison is the integer
        # cross-multiplication acctbal_c * n > s — bit-identical to the
        # Ray side (pipelines/analytics.dormant_rich_customers), so no
        # float-average boundary rows
        "agg_dormant_customers": (
            "WITH cb AS (SELECT c_custkey,"
            "  CAST(c_nationkey AS BIGINT) AS c_nationkey,"
            "  CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_c"
            " FROM customer),"
            " t AS (SELECT CAST(sum(acctbal_c) AS BIGINT) AS s,"
            "  CAST(count(*) AS BIGINT) AS n FROM cb WHERE acctbal_c > 0)"
            " SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,"
            "  CAST(sum(acctbal_c) AS BIGINT) AS totacctbal_c"
            " FROM cb, t"
            " WHERE acctbal_c * t.n > t.s"
            "  AND NOT EXISTS (SELECT 1 FROM orders o"
            "   WHERE o.o_custkey = cb.c_custkey"
            "    AND o.o_orderdate >= TIMESTAMP '2000-07-01')"
            " GROUP BY c_nationkey ORDER BY c_nationkey"
        ),
        # TPC-H Q19 shape: OR'd predicate groups spanning both join
        # sides — must evaluate after the join; revenue/count int64-exact
        "join_disjunctive_rev": (
            "SELECT CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)"
            "  * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4,"
            " CAST(count(*) AS BIGINT) AS n_rows"
            " FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey"
            " WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15"
            "   AND l.l_quantity BETWEEN 1 AND 20)"
            "  OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30"
            "   AND l.l_quantity BETWEEN 10 AND 35)"
            "  OR (p.p_brand = 'Brand#5' AND p.p_size BETWEEN 20 AND 50"
            "   AND l.l_quantity BETWEEN 20 AND 50)"
        ),
        # TPC-H Q8 shape: nation 20's share of revenue to AMERICA's
        # customers per year — two int64-exact sums, ONE double division
        # (the join_promo_ratio precedent)
        "join_market_share": (
            "WITH s AS (SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,"
            "  CAST(sum(CASE WHEN s.s_nationkey = 20 THEN"
            "   CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)"
            "   ELSE 0 END) AS BIGINT) AS nation_e4,"
            "  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)"
            "   AS BIGINT)) AS BIGINT) AS total_e4"
            " FROM customer c"
            " JOIN orders o ON o.o_custkey = c.c_custkey"
            " JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
            " JOIN supplier s ON s.s_suppkey = l.l_suppkey"
            " JOIN nation n ON n.n_nationkey = c.c_nationkey"
            " JOIN region r ON r.r_regionkey = n.n_regionkey"
            " WHERE r.r_name = 'AMERICA' GROUP BY 1)"
            " SELECT o_year, nation_e4, total_e4,"
            "  CAST(nation_e4 AS DOUBLE) / total_e4 AS mkt_share"
            " FROM s ORDER BY o_year"
        ),
        # TPC-H Q5 shape: locally supplied revenue (supplier and customer
        # share a nation) per region and order year
        "join_local_supply": (
            "SELECT r.r_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,"
            " CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)"
            "  AS BIGINT)) AS BIGINT) AS revenue_e4"
            " FROM customer c"
            " JOIN orders o ON o.o_custkey = c.c_custkey"
            " JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
            " JOIN supplier s ON s.s_suppkey = l.l_suppkey"
            " JOIN nation n ON n.n_nationkey = c.c_nationkey"
            " JOIN region r ON r.r_regionkey = n.n_regionkey"
            " WHERE s.s_nationkey = c.c_nationkey"
            " GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # TPC-H Q7 shape: nation-pair shipping volume per order year;
        # revenue is the per-row 1e-4-unit integer of agg_lineitem
        "join_nation_volume": (
            "SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,"
            " CAST(year(o.o_orderdate) AS BIGINT) AS l_year,"
            " CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)"
            "  AS BIGINT)) AS BIGINT) AS revenue_e4"
            " FROM lineitem l"
            " JOIN orders o ON o.o_orderkey = l.l_orderkey"
            " JOIN supplier s ON s.s_suppkey = l.l_suppkey"
            " JOIN customer c ON c.c_custkey = o.o_custkey"
            " JOIN nation ns ON ns.n_nationkey = s.s_nationkey"
            " JOIN nation nc ON nc.n_nationkey = c.c_nationkey"
            " WHERE s.s_nationkey <> c.c_nationkey"
            " GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
        ),
        # TPC-H Q3 shape: unshipped high-revenue orders — segment semi-join
        # + two date filters + per-order revenue top-10 (total order on
        # (revenue_e4 DESC, o_orderkey) makes the LIMIT boundary exact)
        "join_ship_priority": (
            "SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,"
            " epoch_us(o.o_orderdate) AS odate_us,"
            " CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)"
            "  AS BIGINT)) AS BIGINT) AS revenue_e4"
            " FROM customer c"
            " JOIN orders o ON o.o_custkey = c.c_custkey"
            " JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
            " WHERE c.c_mktsegment = 'BUILDING'"
            "  AND o.o_orderdate < TIMESTAMP '1998-03-15'"
            "  AND l.l_shipdate > TIMESTAMP '1998-03-15'"
            " GROUP BY 1, 2 ORDER BY revenue_e4 DESC, o_orderkey LIMIT 10"
        ),
        # TPC-H Q10 shape: returned-item revenue per customer for a
        # quarter, top-20 with the customer/nation report columns
        "join_returned_items": (
            "SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name,"
            " CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_c,"
            " n.n_name,"
            " CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)"
            "  AS BIGINT)) AS BIGINT) AS revenue_e4"
            " FROM customer c"
            " JOIN orders o ON o.o_custkey = c.c_custkey"
            " JOIN lineitem l ON l.l_orderkey = o.o_orderkey"
            " JOIN nation n ON n.n_nationkey = c.c_nationkey"
            " WHERE l.l_returnflag = 'R'"
            "  AND o.o_orderdate >= TIMESTAMP '1997-10-01'"
            "  AND o.o_orderdate < TIMESTAMP '1998-01-01'"
            " GROUP BY 1, 2, 3, 4 ORDER BY revenue_e4 DESC, c_custkey LIMIT 20"
        ),
        "join_left_counts": (
            "SELECT c.c_custkey, c.c_name,"
            " CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,"
            " CAST(coalesce(o.total_c, 0) AS BIGINT) AS total_c"
            " FROM customer c LEFT JOIN ("
            "  SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,"
            "   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)"
            "    AS total_c"
            "  FROM orders GROUP BY o_custkey) o"
            " ON c.c_custkey = o.o_custkey"
        ),
        # PII scan/redact: the SQL rebuilds the SAME decorated text the Ray
        # stage plants (stages/pii.decorate_pii), then runs the IDENTICAL
        # regex patterns (shared constants — RE2 and re.ASCII agree on these
        # ASCII classes) and replays the email→phone→ip redaction order.
        "doc_pii": (
            "WITH dt AS (SELECT doc_id,"
            " CASE WHEN doc_id % 5 = 0 THEN 'Contact user' ||"
            "  CAST(doc_id AS VARCHAR) || '@example.com re account. '"
            "  ELSE '' END"
            " || coalesce(text, '')"
            " || CASE WHEN doc_id % 7 = 0 THEN ' Call +1-202-' ||"
            "  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today.'"
            "  ELSE '' END"
            " || CASE WHEN doc_id % 11 = 0 THEN ' Origin host 10.' ||"
            "  CAST((doc_id // 256) % 256 AS VARCHAR) || '.' ||"
            "  CAST(doc_id % 256 AS VARCHAR) || '.7 flagged.' ELSE '' END"
            " AS t FROM documents),"
            " c AS (SELECT doc_id,"
            f" CAST(length(regexp_extract_all(t, '{pii.EMAIL_PAT}')) AS BIGINT)"
            "  AS n_emails,"
            f" CAST(length(regexp_extract_all(t, '{pii.PHONE_PAT}')) AS BIGINT)"
            "  AS n_phones,"
            f" CAST(length(regexp_extract_all(t, '{pii.IPV4_PAT}')) AS BIGINT)"
            "  AS n_ipv4,"
            " md5(regexp_replace(regexp_replace(regexp_replace(t,"
            f"  '{pii.EMAIL_PAT}', '<EMAIL>', 'g'),"
            f"  '{pii.PHONE_PAT}', '<PHONE>', 'g'),"
            f"  '{pii.IPV4_PAT}', '<IP>', 'g')) AS redacted_hash"
            " FROM dt)"
            " SELECT doc_id, n_emails, n_phones, n_ipv4,"
            " n_emails + n_phones + n_ipv4 AS n_pii, redacted_hash FROM c"
        ),
        "doc_urls": (
            "WITH dt AS (SELECT doc_id, coalesce(text, '')"
            " || CASE WHEN doc_id % 4 = 0 THEN"
            "  ' See https://docs.example.org/guide/' ||"
            "  CAST(doc_id AS VARCHAR) || ' for details.' ELSE '' END"
            " || CASE WHEN doc_id % 6 = 0 THEN ' Mirror at http://cdn' ||"
            "  CAST(doc_id % 10 AS VARCHAR) || '.mirror-net.io/pkg?v=' ||"
            "  CAST(doc_id AS VARCHAR) || '.' ELSE '' END"
            " AS t FROM documents),"
            f" d AS (SELECT unnest(regexp_extract_all(t, '{pii.URL_PAT}', 1))"
            "  AS domain FROM dt)"
            " SELECT domain, CAST(count(*) AS BIGINT) AS n"
            " FROM d GROUP BY domain"
        ),
        "join_anti_customers": (
            "SELECT c_custkey FROM customer c"
            " WHERE NOT EXISTS (SELECT 1 FROM orders o"
            "  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')"
        ),
        # exact top-k tokens (the MG sketch only nominates candidates;
        # published counts are exact, so a plain GROUP BY is the oracle)
        "doc_top_tokens": (
            "WITH toks AS (SELECT unnest(regexp_extract_all("
            "  lower(coalesce(text, '')), '[a-z0-9]+')) AS token"
            "  FROM documents)"
            " SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks"
            " GROUP BY token ORDER BY n DESC, token LIMIT 20"
        ),
        "ev_user_paths": (
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,"
            " string_agg(event_type, '>' ORDER BY event_id) AS path"
            " FROM events GROUP BY user_id"
        ),
        "doc_seg_dedup": (
            "WITH t AS (SELECT doc_id, string_split(coalesce(text,''), ' ')"
            "  AS toks FROM documents),"
            " s AS (SELECT doc_id, j // 15 AS seg_idx,"
            "   array_to_string(list_slice(toks, j+1, j+15), ' ') AS seg"
            "  FROM t, unnest(range(0, greatest(len(toks),1), 15)) AS u(j)),"
            " f AS (SELECT doc_id, seg_idx, seg FROM ("
            "   SELECT doc_id, seg_idx, seg,"
            "    ROW_NUMBER() OVER (PARTITION BY seg"
            "     ORDER BY doc_id, seg_idx) AS rn"
            "   FROM s) WHERE rn = 1)"
            " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,"
            "  string_agg(seg, ' ' ORDER BY seg_idx) AS text"
            " FROM f GROUP BY doc_id"
        ),
        # boilerplate removal: same segmentation, but segments with corpus
        # frequency >= 3 drop from EVERY document (vs seg_dedup keep-first)
        "doc_boilerplate": (
            "WITH t AS (SELECT doc_id, string_split(coalesce(text,''), ' ')"
            "  AS toks FROM documents),"
            " s AS (SELECT doc_id, j // 15 AS seg_idx,"
            "   array_to_string(list_slice(toks, j+1, j+15), ' ') AS seg"
            "  FROM t, unnest(range(0, greatest(len(toks),1), 15)) AS u(j)),"
            " c AS (SELECT seg, CAST(count(*) AS BIGINT) AS n FROM s"
            "  GROUP BY seg),"
            " f AS (SELECT s.doc_id, s.seg_idx, s.seg FROM s"
            "  JOIN c USING (seg) WHERE c.n < 3)"
            " SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,"
            "  string_agg(seg, ' ' ORDER BY seg_idx) AS text"
            " FROM f GROUP BY doc_id"
        ),
        "dedup_canonical": (
            "SELECT md5(text) AS text_hash, doc_id AS keep_doc_id, lang,"
            " source,"
            " CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT) AS n_dups"
            " FROM documents"
            " QUALIFY row_number() OVER (PARTITION BY md5(text)"
            "  ORDER BY source, doc_id) = 1"
        ),
        "doc_cap_per_lang": (
            # same splitmix64 priority arithmetic as doc_shuffle
            # (stages/shuffle.shuffle_key_sql), capped per language
            "WITH " + _shuffle.shuffle_key_sql("documents") + ","
            " j AS (SELECT d.lang, d.doc_id, k.skey AS priority,"
            "  CAST(count(*) OVER (PARTITION BY d.lang) AS BIGINT)"
            "   AS n_stratum"
            "  FROM documents d JOIN keyed k USING (doc_id))"
            " SELECT lang, doc_id, priority, n_stratum FROM j"
            " QUALIFY row_number() OVER (PARTITION BY lang"
            "  ORDER BY priority, doc_id) <= 50"
        ),
        "dedup_incremental": (
            # same 64-bit md5 truncation as the engine key (the NOT-IN
            # decision is over the identical hash domain on both sides)
            "WITH h AS (SELECT doc_id, source,"
            "  CAST(('0x' || substr(md5(text), 1, 16)) AS UBIGINT) AS key"
            "  FROM documents)"
            " SELECT doc_id FROM h WHERE source = 'src0' AND key NOT IN"
            "  (SELECT key FROM h WHERE source <> 'src0')"
        ),
        "doc_iqr_filter": (
            "WITH q AS (SELECT quantile_disc(n_chars, 0.25) AS lo,"
            "  quantile_disc(n_chars, 0.75) AS hi FROM documents)"
            " SELECT doc_id, n_chars FROM documents, q"
            " WHERE n_chars BETWEEN lo AND hi"
        ),
        "join_semi_customers": (
            "SELECT c_custkey FROM customer c WHERE EXISTS"
            " (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey"
            "  AND o.o_totalprice > 150000)"
        ),
        "ev_mode": (
            "SELECT user_id, event_type, n FROM"
            " (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n"
            "  FROM events GROUP BY user_id, event_type)"
            " QUALIFY row_number() OVER (PARTITION BY user_id"
            "  ORDER BY n DESC, event_type) = 1"
        ),
        "join_pairs_orders": (
            "SELECT f.o_custkey AS custkey, f.o_orderkey AS f_orderkey,"
            " o.o_orderkey AS o_orderkey"
            " FROM orders f JOIN orders o ON f.o_custkey = o.o_custkey"
            " WHERE f.o_orderstatus = 'F' AND o.o_orderstatus = 'O'"
        ),
        # interval union by islands: a start can never open an island at a
        # ts tie (the peer's end ≥ its start), so the window order is
        # value-invariant; all µs integers
        "ev_coverage": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS s,"
            "  epoch_us(ts) + 300000000 AS e FROM events),"
            " o AS (SELECT user_id, s, e, max(e) OVER (PARTITION BY user_id"
            "  ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)"
            "  AS prev_max FROM e),"
            " f AS (SELECT user_id, s, e, CASE WHEN prev_max IS NULL"
            "  OR s > prev_max THEN 1 ELSE 0 END AS ni FROM o),"
            " g AS (SELECT user_id, s, e, sum(ni) OVER (PARTITION BY user_id"
            "  ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS island FROM f),"
            " i AS (SELECT user_id, island, max(e) - min(s) AS cov"
            "  FROM g GROUP BY 1, 2)"
            " SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,"
            " CAST(sum(cov) AS BIGINT) AS coverage_us FROM i GROUP BY 1"
        ),
        # RANGE frame: peers of the current ts are included regardless of
        # tie order, so the tie-broken sort is value-invariant
        "ev_time_window": (
            "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
            "  CAST(round(value * 1000000) AS BIGINT) AS value_e6 FROM events)"
            " SELECT user_id, event_id, ts_us, value_e6,"
            "  CAST(SUM(value_e6) OVER (PARTITION BY user_id ORDER BY ts_us"
            "   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT)"
            "   AS win_sum_e6"
            " FROM e"
        ),
        # COUNT(DISTINCT) OVER is unsupported in SQL windows; equivalent:
        # first-occurrence flag per (user, type), then a running sum
        "ev_running_distinct": (
            "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
            "  event_type FROM events),"
            " f AS (SELECT user_id, event_id, ts_us,"
            "  CASE WHEN row_number() OVER (PARTITION BY user_id, event_type"
            "   ORDER BY ts_us, event_id) = 1 THEN 1 ELSE 0 END AS fst FROM e)"
            " SELECT user_id, event_id, ts_us,"
            " CAST(sum(fst) OVER (PARTITION BY user_id ORDER BY ts_us, event_id"
            "  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_types_seen"
            " FROM f"
        ),
        "ev_transitions": (
            "WITH e AS (SELECT user_id, event_type, lead(event_type) OVER"
            " (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS nxt"
            " FROM events)"
            " SELECT event_type AS type_from, nxt AS type_to,"
            " CAST(count(*) AS BIGINT) AS n"
            " FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2"
        ),
        "dedup_cluster_sizes": (
            "WITH c AS (SELECT md5(text) AS k, count(*) AS n"
            " FROM documents GROUP BY 1)"
            " SELECT CAST(n AS BIGINT) AS cluster_size,"
            " CAST(count(*) AS BIGINT) AS n_clusters FROM c GROUP BY 1"
        ),
        "agg_grouping_sets": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,"
            " COALESCE(l_linestatus, 'ALL') AS l_linestatus,"
            " CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,"
            " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
            "  AS sum_base_price_c,"
            " CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)"
            "  AS BIGINT)) AS BIGINT) AS sum_revenue_e4,"
            " CAST(count(*) AS BIGINT) AS n_rows"
            " FROM lineitem"
            " GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"
        ),
        # all-pairs Levenshtein over the length-filtered vocabulary — the
        # exact oracle for the FastSS deletion-neighborhood join (recall 1
        # by the shared-variant theorem, precision from the verify pass)
        "doc_typo_pairs": (
            "WITH t0 AS (SELECT DISTINCT"
            "  unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok"
            f"  FROM read_parquet('{_gen_paths()['transcripts']}')),"
            " t AS (SELECT tok FROM t0 WHERE length(tok) >= 6)"
            " SELECT a.tok AS tok_a, b.tok AS tok_b FROM t a JOIN t b"
            " ON a.tok < b.tok AND abs(length(a.tok) - length(b.tok)) <= 1"
            " AND levenshtein(a.tok, b.tok) <= 1"
        ),
        "ev_window_users": (
            "SELECT epoch_us(ts) // 3600000000 AS window_id,"
            " CAST(count(DISTINCT user_id) AS BIGINT) AS n_users"
            " FROM events GROUP BY 1"
        ),
        "ev_type_pairs": (
            "WITH d AS (SELECT DISTINCT user_id, event_type FROM events)"
            " SELECT a.event_type AS type_a, b.event_type AS type_b,"
            " CAST(count(*) AS BIGINT) AS n_users"
            " FROM d a JOIN d b ON a.user_id = b.user_id"
            "  AND a.event_type < b.event_type GROUP BY 1, 2"
        ),
        # weighted sample: priority = one float64 division of bit-identical
        # inputs (seeded splitmix64 key / integer weight) — both engines
        # order identical doubles, ties break by doc_id
        "doc_weighted_sample": (
            "WITH " + _shuffle.shuffle_key_sql("documents") + ","
            " w AS (SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars,"
            "  CAST(k.skey AS DOUBLE) / CAST(d.n_chars AS DOUBLE) AS pri"
            "  FROM documents d JOIN keyed k USING (doc_id)"
            "  WHERE d.n_chars > 0)"
            " SELECT doc_id, n_chars FROM w"
            " QUALIFY row_number() OVER (ORDER BY pri, doc_id) <= 25"
        ),
        # inter-arrival gaps: int64 µs deltas → all aggregates exact; ties
        # in ts contribute 0-gaps in any tie order, so no tiebreaker needed
        "ev_gaps": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),"
            " l AS (SELECT user_id, ts_us - lag(ts_us) OVER"
            "  (PARTITION BY user_id ORDER BY ts_us) AS gap FROM e)"
            " SELECT user_id, CAST(count(gap) AS BIGINT) AS n_gaps,"
            " CAST(min(gap) AS BIGINT) AS gap_min_us,"
            " CAST(max(gap) AS BIGINT) AS gap_max_us,"
            " CAST(sum(gap) AS BIGINT) AS gap_sum_us"
            " FROM l GROUP BY 1 HAVING count(gap) > 0"
        ),
        # per-user corr(event order, value): six integer-exact sums, then
        # the SAME float64 expression the Ray kernel evaluates — the CASE
        # guard repeats the denominator so both sides branch identically
        "ev_trend": (
            "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
            "  CAST(round(value * 1000) AS BIGINT) AS v FROM events),"
            " r AS (SELECT user_id, v, CAST(row_number() OVER"
            "  (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS rn"
            "  FROM e),"
            " s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,"
            "  CAST(sum(rn) AS BIGINT) AS sr, CAST(sum(rn * rn) AS BIGINT) AS srr,"
            "  CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS svv,"
            "  CAST(sum(rn * v) AS BIGINT) AS srv FROM r GROUP BY 1)"
            " SELECT user_id, n, CASE WHEN n < 2 OR NOT"
            "  (sqrt(CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)"
            "    - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))"
            "   * sqrt(CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)"
            "    - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) > 0) THEN 0.0"
            " ELSE round_even((CAST(n AS DOUBLE) * CAST(srv AS DOUBLE)"
            "    - CAST(sr AS DOUBLE) * CAST(sv AS DOUBLE))"
            "  / (sqrt(CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)"
            "    - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))"
            "   * sqrt(CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)"
            "    - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))), 6)"
            " END AS trend_corr FROM s"
        ),
        "doc_length_rank": (
            "SELECT doc_id, n_chars, CAST(row_number() OVER"
            " (ORDER BY n_chars, doc_id) AS BIGINT) AS rn FROM documents"
        ),
        # the Bloom pre-filter is invisible to results (no false negatives;
        # false positives die in the exact join) — the oracle is the plain
        # selective-dimension join
        "join_bloom_orders": (
            "SELECT o.o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,"
            " CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))"
            "  AS BIGINT) AS total_cents"
            " FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
            " WHERE c.c_mktsegment = 'BUILDING' GROUP BY 1"
        ),
        # Q14 shape: revenue at integer e-4 dollar scale on both sides,
        # ratio is one float64 division in the identical op order
        "join_promo_ratio": (
            "WITH l AS (SELECT l_partkey,"
            "  CAST(round(l_extendedprice * 100) AS BIGINT)"
            "   * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_e4"
            "  FROM lineitem),"
            " j AS (SELECT rev_e4, CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END"
            "   AS promo FROM l JOIN part p ON l.l_partkey = p.p_partkey),"
            " s AS (SELECT CAST(sum(rev_e4 * promo) AS BIGINT) AS promo_rev_e4,"
            "  CAST(sum(rev_e4) AS BIGINT) AS total_rev_e4 FROM j)"
            " SELECT promo_rev_e4, total_rev_e4,"
            " round_even(CAST(promo_rev_e4 AS DOUBLE)"
            "  / CAST(total_rev_e4 AS DOUBLE), 6) AS promo_ratio FROM s"
        ),
        "ev_moments": (
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n,"
            " CAST(sum(v_e3) AS BIGINT) AS sum_e3,"
            " CAST(sum(v_e3 * v_e3) AS BIGINT) AS sumsq_e6,"
            " min(v_e3) AS min_e3, max(v_e3) AS max_e3,"
            " CAST(sum(v_e3) AS DOUBLE) / count(*) AS mean_e3"
            " FROM (SELECT user_id, CAST(round(value * 1000) AS BIGINT) AS v_e3"
            "       FROM events)"
            " GROUP BY user_id"
        ),
        "doc_sample_k": (
            "SELECT doc_id, CAST(('0x' || substr(md5('77:' || CAST(doc_id AS"
            " VARCHAR)), 1, 16)) AS UBIGINT) AS priority,"
            " ROW_NUMBER() OVER (ORDER BY CAST(('0x' || substr(md5('77:' ||"
            " CAST(doc_id AS VARCHAR)), 1, 16)) AS UBIGINT)) AS rank"
            " FROM documents"
            " ORDER BY priority LIMIT 25"
        ),
        "ev_ntile": (
            "WITH e AS (SELECT user_id, event_id,"
            "  CAST(round(value * 1000000) AS BIGINT) AS value_e6 FROM events)"
            " SELECT user_id, event_id, value_e6,"
            "  NTILE(4) OVER (PARTITION BY user_id"
            "   ORDER BY value_e6 DESC, event_id) AS bucket"
            " FROM e"
        ),
        "ev_quantiles_cont": (
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,"
            " quantile_cont(value_e6, 0.5) AS median_cont,"
            " quantile_cont(value_e6, 0.9) AS p90_cont"
            " FROM (SELECT user_id, CAST(round(value * 1000000) AS BIGINT) AS value_e6"
            "       FROM events)"
            " GROUP BY 1"
        ),
        "agg_cube": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,"
            " COALESCE(l_linestatus, 'ALL') AS l_linestatus,"
            " CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,"
            " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
            "  AS sum_base_price_c,"
            " CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)"
            "  AS BIGINT)) AS BIGINT) AS sum_revenue_e4,"
            " CAST(count(*) AS BIGINT) AS n_rows"
            " FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)"
        ),
        "doc_normalize": (
            "SELECT doc_id,"
            " trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text,"
            " md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_hash"
            " FROM documents"
        ),
        "doc_repetition": (
            "WITH t AS (SELECT doc_id,"
            "  list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
            "   AS l FROM documents)"
            " SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,"
            "  CAST(len(list_distinct(l)) AS BIGINT) AS n_distinct,"
            "  1.0 - CAST(len(list_distinct(l)) AS DOUBLE) / greatest(len(l), 1)"
            "   AS dup_ratio"
            " FROM t"
        ),
        # collocations: the ln argument is formed with the SAME double
        # multiply/divide chain as the engine (CAST-to-double products,
        # one division), and DuckDB ln() is the same libm call as Python
        # math.log — so pmi_e6 is bit-exact (the doc_tfidf idf precedent)
        "doc_pmi": (
            "WITH toks AS (SELECT doc_id,"
            "  list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
            "   AS l FROM documents),"
            " uni AS (SELECT unnest(l) AS tok FROM toks),"
            " ucnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM uni GROUP BY 1),"
            " tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),"
            " pairs AS (SELECT l[i] AS x, l[i + 1] AS y"
            "  FROM toks, UNNEST(generate_series(1, len(l) - 1)) AS t(i)),"
            " bcnt AS (SELECT x || ' ' || y AS bigram, any_value(x) AS x,"
            "  any_value(y) AS y, CAST(count(*) AS BIGINT) AS n_xy"
            "  FROM pairs GROUP BY 1),"
            " top AS (SELECT * FROM bcnt WHERE n_xy >= 5"
            "  ORDER BY n_xy DESC, bigram LIMIT 50)"
            " SELECT top.bigram, top.n_xy, ux.n AS n_x, uy.n AS n_y,"
            "  tot.n AS n_tokens,"
            "  CAST(round(ln((CAST(top.n_xy AS DOUBLE) * tot.n) /"
            "   (CAST(ux.n AS DOUBLE) * uy.n)) * 1000000) AS BIGINT) AS pmi_e6"
            " FROM top"
            " JOIN ucnt ux ON ux.tok = top.x"
            " JOIN ucnt uy ON uy.tok = top.y, tot"
            " ORDER BY n_xy DESC, bigram"
        ),
        # Q2 shape: argmin supplier per small part (price asc, suppkey asc
        # tiebreak — the keep_first total order)
        "join_min_cost_part": (
            "WITH li AS (SELECT CAST(l_partkey AS BIGINT) AS p_partkey,"
            "  CAST(l_suppkey AS BIGINT) AS s_suppkey,"
            "  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c"
            "  FROM lineitem JOIN part ON p_partkey = l_partkey"
            "  WHERE p_size <= 5),"
            " w AS (SELECT *, row_number() OVER (PARTITION BY p_partkey"
            "  ORDER BY price_c, s_suppkey) AS rn FROM li)"
            " SELECT w.p_partkey, w.price_c, w.s_suppkey, s.s_name, n.n_name"
            " FROM w JOIN supplier s ON s.s_suppkey = w.s_suppkey"
            " JOIN nation n ON n.n_nationkey = s.s_nationkey"
            " WHERE rn = 1 ORDER BY w.p_partkey"
        ),
        # Q4 shape: EXISTS semi-join from the fact side, priority rollup
        "agg_priority_returns": (
            "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders"
            " FROM orders"
            " WHERE o_orderdate >= TIMESTAMP '1996-01-01'"
            " AND o_orderdate < TIMESTAMP '1996-04-01'"
            " AND EXISTS (SELECT 1 FROM lineitem"
            "  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')"
            " GROUP BY 1 ORDER BY 1"
        ),
        # Q9 shape: profit by supplier nation × order year; amount_e4 =
        # rev_e4 − qty·retail_c·60 per row, all integer
        "join_product_profit": (
            "SELECT n.n_name AS nation,"
            " CAST(year(o.o_orderdate) AS BIGINT) AS o_year,"
            " CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)"
            "   * 10000) AS BIGINT)"
            "  - CAST(round(l.l_quantity) AS BIGINT)"
            "   * CAST(round(p.p_retailprice * 100) AS BIGINT) * 60)"
            "  AS BIGINT) AS amount_e4"
            " FROM lineitem l"
            " JOIN part p ON p.p_partkey = l.l_partkey"
            " JOIN supplier s ON s.s_suppkey = l.l_suppkey"
            " JOIN orders o ON o.o_orderkey = l.l_orderkey"
            " JOIN nation n ON n.n_nationkey = s.s_nationkey"
            " WHERE p.p_name LIKE '%widget%'"
            " GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        # Q15 shape: quarterly revenue per supplier → global max, all ties
        "join_top_supplier": (
            "WITH rev AS (SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,"
            "  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)"
            "   * 10000) AS BIGINT)) AS BIGINT) AS revenue_e4"
            "  FROM lineitem"
            "  WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
            "  AND l_shipdate < TIMESTAMP '1996-04-01'"
            "  GROUP BY 1)"
            " SELECT r.s_suppkey, r.revenue_e4, s.s_name"
            " FROM rev r JOIN supplier s ON s.s_suppkey = r.s_suppkey"
            " WHERE r.revenue_e4 = (SELECT max(revenue_e4) FROM rev)"
            " ORDER BY r.s_suppkey"
        ),
        # Q17 shape: the threshold compare is the integer
        # cross-multiplication 5·qty·n_li < sum_qty; one mirrored float64
        # division for the yearly average
        "join_small_qty_rev": (
            "WITH li AS (SELECT CAST(l_partkey AS BIGINT) AS pkey,"
            "  CAST(round(l_quantity) AS BIGINT) AS qty,"
            "  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c"
            "  FROM lineitem JOIN part ON p_partkey = l_partkey"
            "  WHERE p_brand = 'Brand#13'),"
            " st AS (SELECT pkey, CAST(sum(qty) AS BIGINT) AS sum_qty,"
            "  CAST(count(*) AS BIGINT) AS n_li FROM li GROUP BY 1),"
            " f AS (SELECT li.price_c FROM li JOIN st USING (pkey)"
            "  WHERE 5 * li.qty * st.n_li < st.sum_qty),"
            " t AS (SELECT CAST(COALESCE(sum(price_c), 0) AS BIGINT)"
            "  AS total_price_c FROM f)"
            " SELECT total_price_c,"
            " CAST(total_price_c AS DOUBLE) / 700.0 AS avg_yearly FROM t"
        ),
        # Q21 shape (return flag standing in for lateness): sole-returner
        # suppliers in multi-supplier finalized orders
        "join_sole_returns": (
            "WITH pairs AS (SELECT CAST(l_orderkey AS BIGINT) AS okey,"
            "  CAST(l_suppkey AS BIGINT) AS skey,"
            "  CAST(max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)"
            "   AS BIGINT) AS has_r"
            "  FROM lineitem GROUP BY 1, 2),"
            " po AS (SELECT okey, CAST(count(*) AS BIGINT) AS n_supp,"
            "  CAST(sum(has_r) AS BIGINT) AS n_bad FROM pairs GROUP BY 1),"
            " fo AS (SELECT CAST(o_orderkey AS BIGINT) AS okey FROM orders"
            "  WHERE o_orderstatus = 'F'),"
            " culprit AS (SELECT p.skey FROM pairs p"
            "  JOIN po USING (okey) JOIN fo USING (okey)"
            "  WHERE p.has_r = 1 AND po.n_bad = 1 AND po.n_supp >= 2),"
            " cnt AS (SELECT skey AS s_suppkey,"
            "  CAST(count(*) AS BIGINT) AS numwait FROM culprit GROUP BY 1)"
            " SELECT c.s_suppkey, s.s_name, c.numwait"
            " FROM cnt c JOIN supplier s ON s.s_suppkey = c.s_suppkey"
            " ORDER BY c.numwait DESC, c.s_suppkey LIMIT 25"
        ),
        # per-doc token entropy: c·ln(c) terms summed in token-ascending
        # order (list_sum over an ORDER BY tok list mirrors the engine's
        # sequential accumulation), shared libm ln, round_even at 1e-6
        "doc_entropy": (
            "WITH toks AS (SELECT doc_id,"
            "  list_filter(string_split_regex(lower(text), '\\s+'),"
            "   x -> x <> '') AS l FROM documents),"
            " uni AS (SELECT doc_id, unnest(l) AS tok FROM toks),"
            " cnt AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c"
            "  FROM uni GROUP BY 1, 2),"
            " s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,"
            "  CAST(count(*) AS BIGINT) AS n_distinct,"
            "  list_sum(list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))"
            "   ORDER BY tok)) AS sclnc"
            "  FROM cnt GROUP BY doc_id)"
            " SELECT d.doc_id, COALESCE(s.n, 0) AS n_tokens,"
            " COALESCE(s.n_distinct, 0) AS n_distinct,"
            " CASE WHEN s.n IS NULL THEN 0 ELSE"
            "  CAST(round_even((ln(CAST(s.n AS DOUBLE))"
            "   - s.sclnc / CAST(s.n AS DOUBLE)) * 1000000, 0) AS BIGINT)"
            " END AS entropy_e6"
            " FROM documents d LEFT JOIN s USING (doc_id) ORDER BY d.doc_id"
        ),
        # fractional-epoch oversampling: the same splitmix64 key arithmetic
        # as doc_shuffle (seed 20260818), floor(w) copies + keyed extra
        "doc_epochs": (
            "WITH " + _shuffle.shuffle_key_sql("documents", seed=20260818) + ","
            " c AS (SELECT d.doc_id, d.source,"
            "  CASE d.source"
            + "".join(
                f" WHEN '{s}' THEN {int(w // 1)}"
                for s, w in _EPOCH_WEIGHTS.items()
            )
            + " ELSE 1 END"
            " + CASE WHEN k.skey % 1000000 < CASE d.source"
            + "".join(
                f" WHEN '{s}' THEN {int(round((w - int(w // 1)) * 1e6))}"
                for s, w in _EPOCH_WEIGHTS.items()
            )
            + " ELSE 0 END THEN 1 ELSE 0 END AS copies"
            "  FROM documents d JOIN keyed k USING (doc_id))"
            " SELECT doc_id, source, CAST(t.epoch AS BIGINT) AS epoch"
            " FROM c, UNNEST(generate_series(0, CAST(copies AS BIGINT) - 1))"
            "  AS t(epoch)"
            " WHERE copies > 0 ORDER BY doc_id, epoch"
        ),
        # sliding-window chunking: same \s+ split as the engine's ASCII
        # \S+ runs, 1-based inclusive list slice == Python [s:e), integer
        # // for the chunk index
        "doc_chunk": (
            "WITH toks AS (SELECT doc_id,"
            "  list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
            "  AS l FROM documents),"
            " w AS (SELECT doc_id, l, len(l) AS n FROM toks WHERE len(l) > 0),"
            " ch AS (SELECT doc_id, l, n, CAST(t.s AS BIGINT) AS tok_start"
            "  FROM w, UNNEST(generate_series(0, CAST(n - 1 AS BIGINT), 48))"
            "  AS t(s))"
            " SELECT doc_id, tok_start // 48 AS chunk_id, tok_start,"
            " CAST(least(tok_start + 64, n) AS BIGINT) AS tok_end,"
            " array_to_string(l[tok_start + 1 : least(tok_start + 64, n)], ' ')"
            "  AS chunk_text"
            " FROM ch ORDER BY doc_id, chunk_id"
        ),
        # Q6 shape: scan + global rollup, all predicates on integer-scaled
        # values (disc_e2 band, qty cap), revenue = price_c × disc_e2
        "agg_forecast_rev": (
            "WITH f AS (SELECT"
            "  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c,"
            "  CAST(round(l_discount * 100) AS BIGINT) AS disc_e2,"
            "  CAST(round(l_quantity) AS BIGINT) AS qty"
            "  FROM lineitem"
            "  WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
            "  AND l_shipdate < TIMESTAMP '1997-01-01')"
            " SELECT CAST(sum(price_c * disc_e2) AS BIGINT) AS revenue_e4,"
            " CAST(count(*) AS BIGINT) AS n_lines"
            " FROM f WHERE disc_e2 BETWEEN 5 AND 7 AND qty < 24"
        ),
        # Q12 shape (l_returnflag stands in for the missing l_shipmode):
        # urgent/high order lines vs the rest, per flag, ship-year window
        "agg_line_priority": (
            "SELECT l_returnflag,"
            " CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
            "  THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,"
            " CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')"
            "  THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count"
            " FROM lineitem JOIN orders ON o_orderkey = l_orderkey"
            " WHERE l_shipdate >= TIMESTAMP '1996-01-01'"
            " AND l_shipdate < TIMESTAMP '1997-01-01'"
            " GROUP BY 1 ORDER BY 1"
        ),
        # Q16 shape: distinct suppliers per (brand, size), NOT-IN exclusion
        # of negative-balance suppliers (complaint-comment analog)
        "agg_part_suppliers": (
            "WITH tr AS (SELECT DISTINCT p_brand,"
            "  CAST(p_size AS BIGINT) AS p_size,"
            "  CAST(l_suppkey AS BIGINT) AS s_suppkey"
            "  FROM lineitem JOIN part ON p_partkey = l_partkey"
            "  WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'"
            "  AND p_size <= 10),"
            " ex AS (SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey"
            "  FROM supplier WHERE s_acctbal < 0)"
            " SELECT p_brand, p_size, CAST(count(*) AS BIGINT) AS supplier_cnt"
            " FROM tr WHERE s_suppkey NOT IN (SELECT s_suppkey FROM ex)"
            " GROUP BY 1, 2 ORDER BY supplier_cnt DESC, p_brand, p_size"
        ),
        # Q20 shape: part-predicate → per-supplier qty sum → threshold →
        # supplier/nation attach
        "join_heavy_suppliers": (
            "WITH li AS (SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,"
            "  CAST(round(l_quantity) AS BIGINT) AS qty"
            "  FROM lineitem JOIN part ON p_partkey = l_partkey"
            "  WHERE p_name LIKE '%widget%'"
            "  AND l_shipdate >= TIMESTAMP '1996-01-01'"
            "  AND l_shipdate < TIMESTAMP '1997-01-01'),"
            " s AS (SELECT s_suppkey, CAST(sum(qty) AS BIGINT) AS sum_qty"
            "  FROM li GROUP BY 1 HAVING sum(qty) > 300)"
            " SELECT s.s_suppkey, su.s_name, n.n_name, s.sum_qty"
            " FROM s JOIN supplier su ON su.s_suppkey = s.s_suppkey"
            " JOIN nation n ON n.n_nationkey = su.s_nationkey"
            " ORDER BY s.s_suppkey"
        ),
        "doc_bigrams": (
            "WITH toks AS (SELECT doc_id,"
            "  list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
            "   AS l FROM documents),"
            " pairs AS (SELECT l[i] || ' ' || l[i + 1] AS bigram"
            "  FROM toks, UNNEST(generate_series(1, len(l) - 1)) AS t(i))"
            " SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM pairs"
            " GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20"
        ),
        "ev_user_quantiles": (
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,"
            " quantile_disc(value_e6, 0.5) AS median_value_e6,"
            " quantile_disc(value_e6, 0.9) AS p90_value_e6"
            " FROM (SELECT user_id, CAST(round(value * 1000000) AS BIGINT) AS value_e6"
            "       FROM events)"
            " GROUP BY 1"
        ),
        # two-table as-of: ties on (user, ts) in the state side are deduped
        # to max(event_id) — the same winner the engine's deterministic
        # (key, ts, side, interval_id) sort tie-break picks
        "ev_asof_state": (
            "WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us"
            "           FROM events WHERE event_type = 'click'),"
            " r AS (SELECT user_id, max(event_id) AS state_id, epoch_us(ts) AS ts_us"
            "       FROM events WHERE event_type = 'purchase' GROUP BY user_id, epoch_us(ts))"
            " SELECT l.user_id, l.event_id, l.ts_us, r.state_id, r.ts_us AS state_ts_us"
            " FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.ts_us"
        ),
        "ev_asof_prev": (
            "SELECT user_id, event_id, epoch_us(ts) AS ts_us,"
            " CAST(round(value * 1000000) AS BIGINT) AS value_e6,"
            " coalesce(lag(CAST(round(value * 1000000) AS BIGINT)) OVER ("
            "  PARTITION BY user_id ORDER BY epoch_us(ts), event_id), 0)"
            "  AS prev_value_e6"
            " FROM events"
        ),
        # exact pairwise shingle-Jaccard — valid as the LSH oracle because all
        # testdata near-dup pairs sit at J≥0.98 where 16×4-band LSH recall is
        # 1 − (1 − 0.98^4)^16 ≈ 1 − 1e-18.  For dedup_ngram (prefix-filter
        # join) the same SQL is the oracle UNCONDITIONALLY: recall 1 by the
        # prefix-filter theorem (stages/dedupe.PrefixEmitter).
        "dedup_ngram": _PAIRWISE_JACCARD_SQL,
        "dedup_minhash": _PAIRWISE_JACCARD_SQL,
        # transitive closure of the same exact pair graph: component = min
        # reachable doc id (DuckDB recursive CTE; the Ray side converges the
        # identical fixpoint by hash-min label propagation)
        "dedup_components": (
            "WITH RECURSIVE pairs AS (" + _PAIRWISE_JACCARD_SQL + "),"
            " edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs"
            "  UNION SELECT doc_b, doc_a FROM pairs),"
            " reach(u, v) AS ("
            "  SELECT u, u FROM edges"
            "  UNION"
            "  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)"
            " SELECT u AS doc_id, MIN(v) AS component FROM reach GROUP BY u"
        ),
        # exact all-pairs cosine ≥ 0.4 — valid as the multi-band hyperplane
        # LSH oracle because per-pair miss at the 0.40 boundary is ≲1e-6
        # (deterministic, fixed seed; dedupe._emb_lsh_params); the Ray-side
        # verify computes cosine with THIS formula's float64 op order, so
        # round-6 values agree bit-exactly.
        "dedup_embedding": (
            "WITH p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,"
            " list_dot_product(CAST(a.embedding AS DOUBLE[]),"
            "                  CAST(b.embedding AS DOUBLE[])) /"
            " (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),"
            "                        CAST(a.embedding AS DOUBLE[]))) *"
            "  sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),"
            "                        CAST(b.embedding AS DOUBLE[])))) AS c"
            " FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)"
            " SELECT vec_a, vec_b, round(c, 6) AS cosine FROM p WHERE c >= 0.4"
        ),
        # per-user z-score: n/Σv/Σv² are integer-exact at milli scale, and
        # the mean/variance/σ/z expression below is the EXACT float64 op
        # order the Ray kernel runs (windows.zscore_events) — no tolerance
        "ev_zscore": (
            "WITH e AS (SELECT user_id, event_id,"
            " CAST(round(value * 1000) AS BIGINT) AS value_e3 FROM events),"
            " s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,"
            "  CAST(sum(value_e3) AS BIGINT) AS s1,"
            "  CAST(sum(value_e3 * value_e3) AS BIGINT) AS s2"
            "  FROM e GROUP BY 1)"
            " SELECT e.user_id, e.event_id, e.value_e3,"
            " CASE WHEN s.n < 2 OR NOT ((CAST(s.s2 AS DOUBLE)"
            "   - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE) / s.n)"
            "   / (s.n - 1) > 0) THEN 0.0"
            " ELSE round_even((CAST(e.value_e3 AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.n)"
            "  / sqrt((CAST(s.s2 AS DOUBLE)"
            "   - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE) / s.n)"
            "   / (s.n - 1)), 6) END AS z"
            " FROM e JOIN s USING (user_id)"
        ),
        # PERCENT_RANK / CUME_DIST as explicit run-position ratios with the
        # Ray kernel's exact float64 op order (windows.percentile_events)
        "ev_percentile": (
            "WITH e AS (SELECT user_id, event_id,"
            " CAST(round(value * 1000000) AS BIGINT) AS value_e6 FROM events),"
            " r AS (SELECT user_id, event_id, value_e6,"
            "  CAST(rank() OVER (PARTITION BY user_id ORDER BY value_e6) AS BIGINT) AS rnk,"
            "  CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n,"
            "  CAST(count(*) OVER (PARTITION BY user_id ORDER BY value_e6)"
            "   AS BIGINT) AS cd"
            "  FROM e)"
            " SELECT user_id, event_id, value_e6,"
            # round_even = banker's, matching np.round on the structurally
            # reachable exact midpoints (e.g. cd/n with n a power of two)
            " CASE WHEN n = 1 THEN 0.0"
            "  ELSE round_even(CAST(rnk - 1 AS DOUBLE) / (n - 1), 6) END AS pct_rank,"
            " round_even(CAST(cd AS DOUBLE) / n, 6) AS cume"
            " FROM r"
        ),
        # stratified sample: the same splitmix64 key arithmetic as
        # doc_shuffle (stages/shuffle.shuffle_key_sql), thresholded per
        # stratum — deterministic, partition-independent, oracle-exact
        "doc_stratified": (
            "WITH " + _shuffle.shuffle_key_sql("documents") + ""
            " SELECT d.doc_id, d.lang FROM documents d"
            " JOIN keyed k USING (doc_id)"
            " WHERE k.skey % 1000000 < CASE d.lang"
            + "".join(
                f" WHEN '{s}' THEN {round(r * 1e6)}"
                for s, r in _STRATA_RATES.items()
            )
            + " ELSE 500000 END"
        ),
        "ann_topk": (
            "WITH q AS (SELECT CAST(query_id AS BIGINT) AS query_id, qv FROM "
            + _ann_query_values_sql()
            + "), scored AS ("
            " SELECT q.query_id, e.vec_id,"
            "  round(list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[])) /"
            "   (sqrt(list_dot_product(q.qv, q.qv)) *"
            "    sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),"
            "         CAST(e.embedding AS DOUBLE[])))), 6) AS score"
            " FROM embeddings e CROSS JOIN q)"
            " SELECT query_id, vec_id, score, rank FROM ("
            "  SELECT *, CAST(row_number() OVER (PARTITION BY query_id"
            "   ORDER BY score DESC, vec_id ASC) AS BIGINT) AS rank FROM scored)"
            f" WHERE rank <= {_ANN_K}"
        ),
        "mm_metadata": (
            "SELECT doc_id,"
            " CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'"
            " ELSE 'video' END AS media_type,"
            " strlen(text) AS n_bytes, md5(text) AS digest FROM documents"
        ),
        "ev_tumbling": (
            "SELECT user_id, epoch_us(ts) // 3600000000 AS window_id,"
            " CAST(count(*) AS BIGINT) AS n_events,"
            " CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS value_sum_e6"
            " FROM events GROUP BY 1, 2"
        ),
        "ev_sliding": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS t,"
            " CAST(round(value * 1000000) AS BIGINT) AS value_e6 FROM events)"
            " SELECT user_id, w AS window_id, CAST(count(*) AS BIGINT) AS n_events,"
            " CAST(sum(value_e6) AS BIGINT) AS value_sum_e6"
            " FROM e, UNNEST(generate_series((t - 3600000000) // 900000000 + 1,"
            " t // 900000000)) AS u(w)"
            " GROUP BY 1, 2"
        ),
        "ev_top_events": (
            "SELECT user_id, event_id, value_e6, rank FROM ("
            " SELECT user_id, event_id,"
            "  CAST(round(value * 1000000) AS BIGINT) AS value_e6,"
            "  CAST(row_number() OVER (PARTITION BY user_id"
            "   ORDER BY CAST(round(value * 1000000) AS BIGINT) DESC, event_id ASC)"
            "   AS BIGINT) AS rank"
            " FROM events) WHERE rank <= 3"
        ),
        "ev_sessionize": """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 1000000) AS BIGINT) AS value_e6
  FROM events
),
lagged AS (
  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                  OR ts_us - lag(ts_us) OVER w > 1800000000
             THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM lagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts_us) AS start_us, max(ts_us) AS end_us,
       CAST(sum(value_e6) AS BIGINT) AS value_sum_e6
FROM sess GROUP BY 1, 2
""",
        # interval×interval overlap self-join over the SAME session
        # derivation: user pairs with time-overlapping sessions (closed
        # intervals), counted per pair
        "ev_overlap_pairs": """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us
  FROM events
),
lagged AS (
  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
                  OR ts_us - lag(ts_us) OVER w > 1800000000
             THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM lagged
),
s AS (
  SELECT user_id, session_idx, min(ts_us) AS start_us, max(ts_us) AS end_us
  FROM sess GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT a.user_id AS user_a, b.user_id AS user_b,
       CAST(count(*) AS BIGINT) AS n_overlaps
FROM s a JOIN s b ON a.user_id < b.user_id
  AND a.start_us <= b.end_us AND b.start_us <= a.end_us
GROUP BY 1, 2
""",
        # Interval-containment join (stages/rangejoin.py): event ⋈ the
        # qualifying (≥3-event) session whose [start, end] contains its ts.
        "ev_range_join": """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
lagged AS (
  SELECT user_id, event_id, ts_us,
         CASE WHEN lag(ts_us) OVER w IS NULL
               OR ts_us - lag(ts_us) OVER w > 1800000000
         THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM lagged
),
sessions AS (
  SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         min(ts_us) AS start_us, max(ts_us) AS end_us
  FROM sess GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT e.user_id, e.event_id, e.ts_us,
       s.session_idx, s.start_us, s.end_us
FROM e JOIN sessions s
  ON e.user_id = s.user_id AND e.ts_us BETWEEN s.start_us AND s.end_us
""",
        "agg_lineitem": (
            "SELECT l_returnflag, l_linestatus,"
            " CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,"
            " CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)"
            "  AS sum_base_price_c,"
            " CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))"
            "  AS BIGINT) AS sum_revenue_e4,"
            " CAST(count(*) AS BIGINT) AS n_rows"
            " FROM lineitem GROUP BY 1, 2"
        ),
        "join_top_customers": (
            "WITH r AS (SELECT o_custkey,"
            " CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_c"
            " FROM orders GROUP BY 1)"
            " SELECT r.o_custkey, c.c_name, c.c_nationkey, r.revenue_c"
            " FROM r JOIN customer c ON c.c_custkey = r.o_custkey"
            " ORDER BY revenue_c DESC, o_custkey ASC LIMIT 10"
        ),
        "agg_orders_by_status": (
            "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,"
            " CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,"
            " min(epoch_us(o_orderdate)) AS first_us,"
            " max(epoch_us(o_orderdate)) AS last_us"
            " FROM orders GROUP BY 1"
        ),
        "scan_filter_pushdown": (
            "SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_c"
            " FROM orders WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0"
        ),
        "join_region_counts": (
            "SELECT r_name, CAST(count(*) AS BIGINT) AS n_customers"
            " FROM customer JOIN nation ON c_nationkey = n_nationkey"
            " JOIN region ON n_regionkey = r_regionkey GROUP BY 1"
        ),
        # per-user MAD: two two-middle order-statistic sums, all-integer
        # (med_x2 = twice the median, mad_x4 = twice the MAD of doubled
        # deviations — no float enters on either side)
        "ev_mad": (
            "WITH e AS (SELECT user_id, CAST(round(value * 1000) AS BIGINT) AS v"
            "  FROM events),"
            " l AS (SELECT CAST(user_id AS BIGINT) AS user_id,"
            "  CAST(count(*) AS BIGINT) AS n_events, list_sort(list(v)) AS lv"
            "  FROM e GROUP BY 1),"
            " m AS (SELECT user_id, n_events, lv,"
            "  lv[CAST((n_events - 1) // 2 + 1 AS INT)]"
            "   + lv[CAST(n_events // 2 + 1 AS INT)] AS med_x2_e3 FROM l),"
            " d AS (SELECT user_id, n_events, med_x2_e3,"
            "  list_sort(list_transform(lv, x -> abs(2 * x - med_x2_e3))) AS ld"
            "  FROM m)"
            " SELECT user_id, n_events, med_x2_e3,"
            " ld[CAST((n_events - 1) // 2 + 1 AS INT)]"
            "  + ld[CAST(n_events // 2 + 1 AS INT)] AS mad_x4_e3 FROM d"
        ),
        # winsorize: clamp at the exact global discrete p05/p95 —
        # quantile_disc is the same ceil(q·n)−1 order statistic
        # selection.exact_quantiles picks (the ev_global_quantiles pairing)
        "ev_winsorize": (
            "WITH v AS (SELECT CAST(event_id AS BIGINT) AS event_id,"
            "  CAST(round(value * 1000000) AS BIGINT) AS value_e6 FROM events),"
            " q AS (SELECT CAST(quantile_disc(value_e6, 0.05) AS BIGINT) AS lo,"
            "  CAST(quantile_disc(value_e6, 0.95) AS BIGINT) AS hi FROM v)"
            " SELECT v.event_id, v.value_e6,"
            " least(greatest(v.value_e6, q.lo), q.hi) AS w_e6 FROM v, q"
        ),
        # per-dimension embedding moments: quantize at 2^20 (exact in
        # float64), integer sums, then the mirrored float64 mean/variance
        # exact integer Gram matrix: the same round_even power-of-2
        # quantization as emb_dim_stats; HUGEINT-exact sum cast at the end
        "emb_gram": (
            "WITH x AS (SELECT e.vec_id, t.i AS dim,"
            "  CAST(round_even(CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE)"
            "   * 1024, 0) AS BIGINT) AS q"
            "  FROM embeddings e CROSS JOIN range(1, 65) t(i))"
            " SELECT a.dim AS i, b.dim AS j,"
            "  CAST(sum(a.q * b.q) AS BIGINT) AS gram_q"
            " FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim <= b.dim"
            " GROUP BY 1, 2"
        ),
        "emb_dim_stats": (
            "WITH x AS (SELECT t.i AS dim,"
            "  CAST(round_even(CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE)"
            "   * 1048576, 0) AS BIGINT) AS q"
            "  FROM embeddings e CROSS JOIN range(1, 65) t(i)),"
            " s AS (SELECT dim, CAST(count(*) AS BIGINT) AS n,"
            "  CAST(sum(q) AS BIGINT) AS s1_q, CAST(sum(q * q) AS BIGINT) AS s2_q"
            "  FROM x GROUP BY 1)"
            " SELECT dim, n, s1_q, s2_q,"
            " round_even(CAST(s1_q AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_q,"
            " CAST(round_even((CAST(s2_q AS DOUBLE) - CAST(s1_q AS DOUBLE)"
            "   * CAST(s1_q AS DOUBLE) / CAST(n AS DOUBLE))"
            "   / CAST(n - 1 AS DOUBLE), 0) AS BIGINT) AS var_q"
            " FROM s"
        ),
        # substring blocklist audit: non-overlapping greedy counts via the
        # replace-length identity, one UNION ALL branch per needle
        "doc_needle_hits": (
            "WITH h AS ("
            + " UNION ALL ".join(
                f"SELECT doc_id, '{nd}' AS needle,"
                f" CAST((len(text) - len(replace(text, '{nd}', '')))"
                f" // {len(nd)} AS BIGINT) AS n_hits FROM documents"
                for nd in _NEEDLES
            )
            + ") SELECT CAST(doc_id AS BIGINT) AS doc_id, needle, n_hits"
            " FROM h WHERE n_hits > 0"
        ),
        "scan_unpivot": (
            "SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,"
            " CAST(l_linenumber AS BIGINT) AS l_linenumber, m.measure,"
            " CASE m.measure"
            "  WHEN 'quantity' THEN CAST(round(l_quantity * 100) AS BIGINT)"
            "  WHEN 'extendedprice' THEN CAST(round(l_extendedprice * 100) AS BIGINT)"
            "  WHEN 'discount' THEN CAST(round(l_discount * 100) AS BIGINT)"
            "  ELSE CAST(round(l_tax * 100) AS BIGINT) END AS val_e2"
            " FROM lineitem, (VALUES ('quantity'), ('extendedprice'),"
            "  ('discount'), ('tax')) AS m(measure)"
        ),
        # PageRank over the part–supplier graph: the SAME integer
        # floor-division power iteration, unrolled one CTE per round
        "graph_pagerank": _pagerank_sql(10),
        # nation trade triangles: Q7-style pair revenue, integer
        # cross-multiplied relative threshold (rev > 0.8× mean), canonical
        # a<b edges, one three-way self-join counts each triangle once
        "graph_triangles": (
            "WITH j AS (SELECT least(s.s_nationkey, c.c_nationkey) AS a,"
            "  greatest(s.s_nationkey, c.c_nationkey) AS b,"
            "  CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)"
            "   AS BIGINT) AS rev"
            "  FROM lineitem l"
            "  JOIN orders o ON o.o_orderkey = l.l_orderkey"
            "  JOIN supplier s ON s.s_suppkey = l.l_suppkey"
            "  JOIN customer c ON c.c_custkey = o.o_custkey"
            "  WHERE s.s_nationkey <> c.c_nationkey),"
            " pr AS (SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,"
            "  CAST(sum(rev) AS BIGINT) AS r FROM j GROUP BY 1, 2),"
            " tot AS (SELECT CAST(sum(r) AS BIGINT) AS t,"
            "  CAST(count(*) AS BIGINT) AS np FROM pr),"
            " ed AS (SELECT a, b FROM pr, tot WHERE 10 * r * np > 8 * t),"
            " nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM"
            "  (SELECT a AS x FROM ed UNION SELECT b FROM ed)),"
            " tri AS (SELECT CAST(count(*) AS BIGINT) AS c"
            "  FROM ed e1 JOIN ed e2 ON e2.a = e1.a AND e2.b > e1.b"
            "  JOIN ed e3 ON e3.a = e1.b AND e3.b = e2.b)"
            " SELECT (SELECT c FROM nn) AS n_nodes,"
            " (SELECT CAST(count(*) AS BIGINT) FROM ed) AS n_edges,"
            " (SELECT c FROM tri) AS n_triangles"
        ),
        # top-20 non-edge pairs by common-neighbor count over the same
        # thresholded trade graph (Liben-Nowell & Kleinberg completion)
        "graph_link_predict": (
            "WITH j AS (SELECT least(s.s_nationkey, c.c_nationkey) AS a,"
            "  greatest(s.s_nationkey, c.c_nationkey) AS b,"
            "  CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)"
            "   AS BIGINT) AS rev"
            "  FROM lineitem l"
            "  JOIN orders o ON o.o_orderkey = l.l_orderkey"
            "  JOIN supplier s ON s.s_suppkey = l.l_suppkey"
            "  JOIN customer c ON c.c_custkey = o.o_custkey"
            "  WHERE s.s_nationkey <> c.c_nationkey),"
            " pr AS (SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,"
            "  CAST(sum(rev) AS BIGINT) AS r FROM j GROUP BY 1, 2),"
            " tot AS (SELECT CAST(sum(r) AS BIGINT) AS t,"
            "  CAST(count(*) AS BIGINT) AS np FROM pr),"
            " ed AS (SELECT a, b FROM pr, tot WHERE 10 * r * np > 8 * t),"
            " adj AS (SELECT a AS src, b AS dst FROM ed"
            "  UNION ALL SELECT b, a FROM ed),"
            " w AS (SELECT x.dst AS a, y.dst AS b,"
            "  CAST(count(*) AS BIGINT) AS n_common"
            "  FROM adj x JOIN adj y ON x.src = y.src AND x.dst < y.dst"
            "  GROUP BY 1, 2),"
            " nw AS (SELECT w.a, w.b, w.n_common FROM w"
            "  LEFT JOIN ed ON ed.a = w.a AND ed.b = w.b"
            "  WHERE ed.a IS NULL)"
            " SELECT a, b, n_common FROM nw"
            " ORDER BY n_common DESC, a, b LIMIT 20"
        ),
        # per-edge neighborhood Jaccard over the same thresholded trade
        # graph; jaccard_e6 is the engine's pure-int64 round-half-up
        # (2e6·n + d) // (2d) verbatim — no float division on either side
        "graph_jaccard": (
            "WITH j AS (SELECT least(s.s_nationkey, c.c_nationkey) AS a,"
            "  greatest(s.s_nationkey, c.c_nationkey) AS b,"
            "  CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)"
            "   AS BIGINT) AS rev"
            "  FROM lineitem l"
            "  JOIN orders o ON o.o_orderkey = l.l_orderkey"
            "  JOIN supplier s ON s.s_suppkey = l.l_suppkey"
            "  JOIN customer c ON c.c_custkey = o.o_custkey"
            "  WHERE s.s_nationkey <> c.c_nationkey),"
            " pr AS (SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,"
            "  CAST(sum(rev) AS BIGINT) AS r FROM j GROUP BY 1, 2),"
            " tot AS (SELECT CAST(sum(r) AS BIGINT) AS t,"
            "  CAST(count(*) AS BIGINT) AS np FROM pr),"
            " ed AS (SELECT a, b FROM pr, tot WHERE 10 * r * np > 8 * t),"
            " adj AS (SELECT a AS src, b AS dst FROM ed"
            "  UNION ALL SELECT b, a FROM ed),"
            " deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d"
            "  FROM adj GROUP BY 1),"
            " com AS (SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS c"
            "  FROM ed e JOIN adj x ON x.src = e.a"
            "  JOIN adj y ON y.src = e.b AND y.dst = x.dst"
            "  GROUP BY e.a, e.b)"
            " SELECT e.a, e.b, da.d AS deg_a, db.d AS deg_b,"
            "  CAST(coalesce(c.c, 0) AS BIGINT) AS n_common,"
            "  CAST((2000000 * coalesce(c.c, 0)"
            "    + da.d + db.d - coalesce(c.c, 0))"
            "   // (2 * (da.d + db.d - coalesce(c.c, 0))) AS BIGINT)"
            "   AS jaccard_e6"
            " FROM ed e JOIN deg da ON da.node = e.a"
            " JOIN deg db ON db.node = e.b"
            " LEFT JOIN com c ON c.a = e.a AND c.b = e.b"
        ),
        # ExactSubstr dup-span coverage: same overlapping 10-token windows,
        # count(*) OVER win ≥ 2 marks corpus-repeated windows, and the
        # equal-length interval union is the islands trick (break when the
        # start gap ≥ W; island covers last − first + W tokens)
        "doc_dup_spans": (
            "WITH toks AS (SELECT doc_id,"
            "  string_split(coalesce(text, ''), ' ') AS t FROM documents),"
            " idx AS (SELECT doc_id, t,"
            "  unnest(range(1, len(t) - 10 + 2)) AS pos FROM toks),"
            " w AS (SELECT doc_id, pos,"
            "  array_to_string(t[pos:pos+9], ' ') AS win FROM idx),"
            " c AS (SELECT doc_id, pos,"
            "  count(*) OVER (PARTITION BY win) AS cnt FROM w),"
            " dw AS (SELECT doc_id, pos FROM c WHERE cnt >= 2),"
            " br AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos) OVER"
            "  (PARTITION BY doc_id ORDER BY pos) < 10 THEN 0 ELSE 1 END"
            "  AS brk FROM dw),"
            " g AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id"
            "  ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp FROM br),"
            " u AS (SELECT doc_id, max(pos) - min(pos) + 10 AS covered"
            "  FROM g GROUP BY doc_id, grp),"
            " cv AS (SELECT doc_id, CAST(sum(covered) AS BIGINT)"
            "  AS dup_tokens FROM u GROUP BY doc_id)"
            " SELECT CAST(d.doc_id AS BIGINT) AS doc_id,"
            " CAST(len(string_split(coalesce(d.text, ''), ' ')) AS BIGINT)"
            "  AS n_tokens,"
            " coalesce(cv.dup_tokens, 0) AS dup_tokens"
            " FROM documents d LEFT JOIN cv USING (doc_id)"
        ),
        # Okapi BM25 vs the fixed query — generated SQL mirrors the
        # engine's IEEE op order term by term (see _bm25_sql)
        "doc_bm25": _bm25_sql(),
        # k-core: the same peel, unrolled; rounds ≥ true depth is exact.
        # 16 rounds: the engine-observed peel depth on this graph is 0-1
        # (test_kcore_oracle_unroll_covers_true_depth asserts depth+4 ≤ 16
        # so data drift fails loudly on the test, not the parity sweep)
        "graph_kcore": _kcore_sql(10, 16),
        # L2 normalization: quantize at 2^20 (exact), exact int64 squared
        # norm per vector, then the mirrored sqrt/divide/round_even
        "emb_normalize": (
            "WITH x AS (SELECT e.vec_id, t.i AS dim,"
            "  CAST(round_even(CAST(e.embedding[CAST(t.i AS INT)] AS DOUBLE)"
            "   * 1048576, 0) AS BIGINT) AS q"
            "  FROM embeddings e CROSS JOIN range(1, 65) t(i)),"
            " n AS (SELECT vec_id, CAST(sum(q * q) AS BIGINT) AS ss"
            "  FROM x GROUP BY 1)"
            " SELECT CAST(x.vec_id AS BIGINT) AS vec_id, x.dim AS dim,"
            " CASE WHEN n.ss = 0 THEN CAST(0 AS BIGINT)"
            "  ELSE CAST(round_even((CAST(x.q AS DOUBLE)"
            "   / sqrt(CAST(n.ss AS DOUBLE))) * 1000000.0, 0) AS BIGINT)"
            "  END AS val_e6"
            " FROM x JOIN n USING (vec_id)"
        ),
        # bigram LM: the engine's split rounding mirrored — the positive
        # ln(cb+1) term per (doc,bigram), the negative ln(cu+V) term per
        # (doc,context), both rounded to micro-nats BEFORE the doc sum
        "doc_bigram_lm": (
            "WITH toks AS (SELECT doc_id, regexp_extract_all("
            "  lower(coalesce(text, '')), '[a-z0-9]+') AS t FROM documents),"
            " bg0 AS (SELECT doc_id, t,"
            "  unnest(range(1, len(t))) AS i FROM toks),"
            " bg AS (SELECT doc_id, t[CAST(i AS INT)] AS prev,"
            "  t[CAST(i AS INT) + 1] AS nxt FROM bg0),"
            " dgb AS (SELECT doc_id, prev, nxt,"
            "  CAST(count(*) AS BIGINT) AS tf FROM bg GROUP BY 1, 2, 3),"
            " cbt AS (SELECT prev, nxt, CAST(sum(tf) AS BIGINT) AS cb"
            "  FROM dgb GROUP BY 1, 2),"
            " dctx AS (SELECT doc_id, prev, CAST(sum(tf) AS BIGINT) AS tfc"
            "  FROM dgb GROUP BY 1, 2),"
            " cut AS (SELECT prev, CAST(sum(tfc) AS BIGINT) AS cu"
            "  FROM dctx GROUP BY 1),"
            " v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vs"
            "  FROM (SELECT unnest(t) AS tok FROM toks)),"
            " a AS (SELECT d.doc_id, d.tf AS n,"
            "  CAST(round((CAST(d.tf AS DOUBLE)"
            "   * ln(CAST(c.cb AS DOUBLE) + 1.0)) * 1000000.0) AS BIGINT)"
            "   AS c_e6"
            "  FROM dgb d JOIN cbt c ON c.prev = d.prev AND c.nxt = d.nxt),"
            " b AS (SELECT d.doc_id, CAST(0 AS BIGINT) AS n,"
            "  -CAST(round((CAST(d.tfc AS DOUBLE)"
            "   * ln(CAST(u.cu AS DOUBLE) + CAST(v.vs AS DOUBLE)))"
            "   * 1000000.0) AS BIGINT) AS c_e6"
            "  FROM dctx d JOIN cut u ON u.prev = d.prev, v)"
            " SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,"
            " CAST(sum(c_e6) AS BIGINT) AS logprob_sum_e6"
            " FROM (SELECT * FROM a UNION ALL SELECT * FROM b)"
            " GROUP BY doc_id"
        ),
        # negative sampling: bit-exact splitmix64 draw chain through the
        # doc_id rank (see _negatives_sql)
        "doc_negatives": _negatives_sql(4),
        # skyline: per-price max quantity, then the strict prefix-max
        # dominance filter (same reduction the engine runs)
        "scan_skyline": (
            "WITH src AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT)"
            "  AS price_e2, CAST(l_quantity AS BIGINT) AS qty FROM lineitem),"
            " g AS (SELECT price_e2, max(qty) AS qty FROM src GROUP BY 1),"
            " m AS (SELECT price_e2, qty, max(qty) OVER (ORDER BY price_e2"
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM g)"
            " SELECT price_e2, CAST(qty AS BIGINT) AS qty FROM m"
            " WHERE pm IS NULL OR qty > pm"
        ),
        # association rules: confidence = one float64 division of
        # bit-identical integer supports on both engines
        "ev_assoc_rules": (
            "WITH d AS (SELECT DISTINCT user_id, event_type FROM events),"
            " s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n"
            "  FROM d GROUP BY 1),"
            " p AS (SELECT a.event_type AS ta, b.event_type AS tb,"
            "  CAST(count(*) AS BIGINT) AS nb FROM d a JOIN d b"
            "  ON a.user_id = b.user_id AND a.event_type < b.event_type"
            "  GROUP BY 1, 2),"
            " r AS (SELECT p.ta AS ante, p.tb AS cons, p.nb AS n_both,"
            "   sa.n AS n_ante FROM p JOIN s sa ON sa.event_type = p.ta"
            "  UNION ALL SELECT p.tb, p.ta, p.nb, sb.n"
            "   FROM p JOIN s sb ON sb.event_type = p.tb)"
            " SELECT ante, cons, n_both, n_ante,"
            " CAST(n_both AS DOUBLE) / CAST(n_ante AS DOUBLE) AS conf"
            " FROM r WHERE n_both >= 5"
        ),
        # windowed debounce: plain lag window, ties broken by event_id
        "ev_window_dedup": (
            "WITH e AS (SELECT user_id, event_type,"
            "  CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id FROM events),"
            " l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id,"
            "  event_type ORDER BY ts_us, event_id) AS p FROM e)"
            " SELECT CAST(user_id AS BIGINT) AS user_id,"
            " CAST(event_id AS BIGINT) AS event_id, ts_us, event_type"
            " FROM l WHERE p IS NULL OR ts_us - p >= CAST(900 AS BIGINT) * 1000000"
        ),
        # netpbm image round trip: the synth derives (w, h) from the first
        # 4 md5(text) bytes — reproduced here via hex→int arithmetic — and
        # n_bytes is the exact header+raster length the encoder writes
        "mm_image": (
            "WITH h AS (SELECT doc_id, md5(coalesce(text, '')) AS hx"
            "  FROM documents WHERE doc_id % 3 = 0),"
            " v AS (SELECT doc_id, list_aggregate(list_transform(range(1, 9),"
            "  i -> (strpos('0123456789abcdef', substr(hx, CAST(i AS INT), 1))"
            "   - 1) * (CAST(1 AS BIGINT) << CAST(4 * (8 - i) AS INT))),"
            "  'sum') AS d FROM h),"
            " dims AS (SELECT doc_id, CAST(8 + d % 24 AS BIGINT) AS width,"
            "  CAST(8 + (d // 256) % 24 AS BIGINT) AS height FROM v)"
            " SELECT doc_id,"
            " CAST(2 + length(' ' || width || ' ' || height || ' 255')"
            "  + 1 + 3 * width * height AS BIGINT) AS n_bytes,"
            " width, height, CAST(1 AS BIGINT) AS frames FROM dims"
        ),
        # PNG round trip: same md5-derived dims; n_bytes (DEFLATE size)
        # is not SQL-derivable, so the oracle checks dims only
        "mm_png": (
            "WITH h AS (SELECT doc_id, md5(coalesce(text, '')) AS hx"
            "  FROM documents WHERE doc_id % 3 = 0),"
            " v AS (SELECT doc_id, list_aggregate(list_transform(range(1, 9),"
            "  i -> (strpos('0123456789abcdef', substr(hx, CAST(i AS INT), 1))"
            "   - 1) * (CAST(1 AS BIGINT) << CAST(4 * (8 - i) AS INT))),"
            "  'sum') AS d FROM h)"
            " SELECT doc_id, CAST(8 + d % 24 AS BIGINT) AS width,"
            "  CAST(8 + (d // 256) % 24 AS BIGINT) AS height,"
            "  CAST(1 AS BIGINT) AS frames FROM v"
        ),
        # degree distribution: same symmetrized distinct pairing, two
        # grouped counts
        "graph_degree_hist": (
            "WITH ed AS (SELECT DISTINCT CAST(l_partkey*2 AS BIGINT) AS node,"
            " CAST(l_suppkey*2+1 AS BIGINT) AS dst FROM lineitem"
            " UNION ALL SELECT DISTINCT CAST(l_suppkey*2+1 AS BIGINT),"
            " CAST(l_partkey*2 AS BIGINT) FROM lineitem),"
            " d AS (SELECT node, CAST(count(*) AS BIGINT) AS deg"
            "  FROM ed GROUP BY node)"
            " SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes"
            " FROM d GROUP BY deg"
        ),
        # no oracle entries (rows-only checks by design):
        #   ann_lsh, ann_ivf (LSH/IVF recall < 1 by construction)
        #   kg_links_fuzzy   (trigram-Jaccard score surface)
        #   mm_decode/resize/frame_sample (synthetic dims from hex-parsed md5)
        #   doc_embed_ann    (hashing-trick embedding feature space)
    }
