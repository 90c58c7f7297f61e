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

from .. import config, schemas
from ..sources import readers
from ..stages import assemble, canonicalize, enrich, graph, intersect, linker, mentions, mwrite, turnmeta
from ..state.manifest import Manifest, atomic_write_parquet


# ---------------------------------------------------------------------------
# Stage datasets (lazy)
# ---------------------------------------------------------------------------

def transcripts(sf_dir: str, columns=None) -> rd.Dataset:
    return readers.read_transcripts(sf_dir, columns=columns)


# ---------------------------------------------------------------------------
# Term / cap scoping (search_pubmed(term, n_articles) analog,
# /root/reference/pymedgraph/input/fetch_ncbi.py:37-59: documents matching
# the term, capped at max_articles, in a deterministic order)
# ---------------------------------------------------------------------------

class TermScope:
    """An uncapped term scope too large to broadcast as an id list: carries
    the lowercased term so consumers evaluate the per-conversation
    predicate distributed (stages/scope.py) — no driver-side id set."""

    def __init__(self, term_low: str):
        self.term = term_low

    def __repr__(self) -> str:  # aids manifest/debug output
        return f"TermScope({self.term!r})"


def conv_scope_ids(
    sf_dir: str, term: str | None = None, max_conversations: int | None = None
) -> list[str] | TermScope | None:
    """conv_ids in scope, or None when the whole corpus is in scope, or a
    TermScope predicate marker when the uncapped matching-id set exceeds
    config.SCOPE_BROADCAST_MAX.

    Term scoping = conversations where any turn's lowercased text contains
    the term (the reference's per-term corpus).  The cap keeps the first N
    conv_ids ascending — our deterministic stand-in for PubMed's relevance
    order (fetch_ncbi.py:53).  The id list is a broadcast-semi-join small
    side: capped runs are ≤ N ids by construction; a hot term UNCAPPED can
    match an unbounded conversation count, so above the threshold the scope
    stays a predicate instead of a driver-materialized list.
    """
    if not term and max_conversations is None:
        return None
    cols = ["conv_id", "text"] if term else ["conv_id"]
    ds = transcripts(sf_dir, cols)
    if term:
        t_low = str(term).lower()

        def match(t: pa.Table) -> pa.Table:
            keep = pc.match_substring(pc.utf8_lower(t["text"]), t_low)
            return t.filter(keep).select(["conv_id"])

        ds = ds.map_batches(match, batch_format="pyarrow", zero_copy_batch=True)
    ids_ds = _conv_distinct(ds)
    if max_conversations is not None:
        n = int(max_conversations)

        def head_sorted(df):
            return df.sort_values("conv_id", kind="mergesort").head(n)

        # per-block partial head-n (same total order as the final pick) →
        # single-block final: the funnel carries O(n × blocks), never the
        # full conversation cardinality
        ids_ds = (
            ids_ds.map_batches(head_sorted, batch_format="pandas", batch_size=None)
            .repartition(1)
            .map_batches(head_sorted, batch_format="pandas", batch_size=None)
        )
    elif term:
        # uncapped term scope: gate the driver pull on the matching-id
        # cardinality (the count is a scalar; ids stay distributed)
        if ids_ds.count() > config.SCOPE_BROADCAST_MAX:
            return TermScope(str(term).lower())
    return sorted(r["conv_id"] for r in ids_ds.take_all())


def _conv_distinct(ds: rd.Dataset, *, pin: bool = True) -> rd.Dataset:
    """Distinct conv_id — exchange-free under the conv-local contract,
    guard-checked with automatic fallback to the sorted-exchange distinct
    (distinct.ContractError can never produce a silent wrong answer)."""
    from ..stages.distinct import ContractError, distinct as _dd, group_local_distinct as _gld

    if config.CONV_LOCAL_SHARDS:
        try:
            return _gld(ds, ["conv_id"], "conv_id", pin=pin)
        except ContractError as e:
            import warnings

            warnings.warn(f"{e} — falling back to the sorted-exchange distinct")
    return _dd(ds, ["conv_id"])


def filter_convs(ds: rd.Dataset, keep_ids: list[str] | TermScope) -> rd.Dataset:
    """Broadcast semi-join: keep rows whose conv_id is in the scope set
    (shipped once via ray.put, read zero-copy per task).  A TermScope
    dispatches to the distributed predicate filter instead — no id set."""
    import ray

    if isinstance(keep_ids, TermScope):
        from ..stages import scope as _scope

        return _scope.filter_convs_by_term(ds, keep_ids.term)
    ref = ray.put(pa.array(sorted(keep_ids), pa.string()))

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["conv_id"], value_set=ray.get(ref)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def conversations(sf_dir: str) -> rd.Dataset:
    return assemble.conversations(transcripts(sf_dir, ["conv_id", "turn_idx", "text"]))


def turn_roundtrip(sf_dir: str) -> rd.Dataset:
    return assemble.turn_roundtrip(transcripts(sf_dir, ["conv_id", "turn_idx", "text"]))


def mention_rows(
    sf_dir: str, *, scope: list[str] | None = None, stateful: str = "task",
    reuse_pool: bool = False,
) -> rd.Dataset:
    ds = transcripts(sf_dir, ["conv_id", "turn_idx", "text"])
    if scope is not None:
        ds = filter_convs(ds, scope)
    return mentions.detect_mentions(
        ds, stateful=stateful, input_blocks=readers.transcript_blocks(sf_dir),
        reuse_pool=reuse_pool,
    )


def user_mentions(sf_dir: str, role: str = "user") -> rd.Dataset:
    """Role-scoped mention detection (role column, previously unused)."""
    return turnmeta.role_mentions(
        transcripts(sf_dir, ["conv_id", "turn_idx", "role", "text"]), role=role
    )


def tool_counts(sf_dir: str) -> rd.Dataset:
    return turnmeta.tool_counts(transcripts(sf_dir, ["conv_id", "tool"]))


def tool_edges(sf_dir: str) -> rd.Dataset:
    return turnmeta.tool_edges(transcripts(sf_dir, ["conv_id", "tool"]))


def hourly_mentions(sf_dir: str) -> rd.Dataset:
    return turnmeta.hourly_mention_counts(
        transcripts(sf_dir, ["conv_id", "turn_idx", "text", "ts"])
    )


def abbrev_definitions(sf_dir: str) -> rd.Dataset:
    """Conversation-local 'long form (SF)' definition pairs."""
    from ..stages import abbrev

    return abbrev.definitions(transcripts(sf_dir, ["conv_id", "text"]))


def mentions_resolved(sf_dir: str) -> rd.Dataset:
    """Mention table with abbreviation resolution: base detection plus
    short-form usages resolved to their long form (entityrecognition.py:
    25-27 `resolve_abbreviations=True`)."""
    from ..stages import abbrev
    from ..stages.distinct import distinct as _dd

    t = transcripts(sf_dir, ["conv_id", "turn_idx", "text"])
    res = abbrev.resolved_mentions(t, mentions.alias_catalog())
    out = _dd(
        mention_rows(sf_dir).union(res),
        ["conv_id", "turn_idx", "norm_surface", "label"],
    )

    # Ray's aggregate reduce (the distinct edge-repair path) promotes int32
    # keys to int64; restore the transcript turn_idx type
    def _fix(tb: pa.Table) -> pa.Table:
        i = tb.schema.get_field_index("turn_idx")
        return tb.set_column(i, "turn_idx", pc.cast(tb["turn_idx"], pa.int32()))

    return out.map_batches(_fix, batch_format="pyarrow", zero_copy_batch=True)


def conv_entities(sf_dir: str) -> rd.Dataset:
    return mentions.conv_entities(mention_rows(sf_dir))


def links(sf_dir: str) -> rd.Dataset:
    return linker.link_surfaces(mention_rows(sf_dir))


def entity_counts(sf_dir: str) -> rd.Dataset:
    return canonicalize.entity_counts(conv_entities(sf_dir))


def entity_pmi(sf_dir: str, min_count: int = 2) -> rd.Dataset:
    """Entity co-occurrence PMI edges — corpus-statistical edge weighting
    for the knowledge graph: for every unordered pair of entity surfaces
    co-mentioned in ≥ min_count conversations, (ent_a, ent_b, n_xy, n_x,
    n_y, n_convs, pmi_e6) with pmi_e6 = round(ln((n_xy·N)/(n_x·n_y))·1e6).
    The reference's CONTAINS edges are unweighted (neo4jconnector.py:
    165-193); PMI is the standard association strength a downstream graph
    consumer ranks them by (doc_pmi's Church & Hanks measure lifted from
    token bigrams to the entity-conversation incidence).

    Scale shape: one distinct exchange over (conv_id, surface), a per-
    conversation pair expansion on the ordered scan (pairs per conv are
    C(e,2) with e bounded by entities-per-conversation, never corpus
    size), one pair-count exchange bounded by the entity-vocabulary², and
    a driver-side marginal attach (entity vocabulary is KB-bounded — the
    canonicalize funnel convention).  N is the exchange-free conv-local
    distinct count.  ln is one libm call per pair, op order mirrored in
    the oracle (the doc_pmi precedent), so pmi_e6 is oracle-exact."""
    import math

    import numpy as np
    import pandas as pd

    from ..stages import distinct as _dx
    from ..stages.groupagg import grouped_agg
    from ..stages.windows import _sorted_user_op

    ce = conv_entities(sf_dir)

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": b["conv_id"],
                "ent": b["norm_surface"],
                "one": pd.array(np.ones(len(b), dtype=np.int64), dtype="int64"),
            }
        )

    de = grouped_agg(
        ce.map_batches(keyed, batch_format="pandas", batch_size=None),
        ["conv_id", "ent"], [("one", "count", "c")],
    ).select_columns(["conv_id", "ent"]).materialize()

    # marginals: conversations per entity — entity-vocabulary bounded
    marg = grouped_agg(
        de.map_batches(
            lambda b: pd.DataFrame(
                {"ent": b["ent"],
                 "one": pd.array(np.ones(len(b), dtype=np.int64), dtype="int64")}
            ),
            batch_format="pandas", batch_size=None,
        ),
        ["ent"], [("one", "sum", "n")],
    ).to_pandas()
    n_of = dict(zip(marg["ent"], marg["n"].astype("int64")))
    n_convs = _dx.group_local_distinct(
        transcripts(sf_dir, ["conv_id"]), ["conv_id"], "conv_id"
    ).count()

    def pair_kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"ent_a": pd.array([], dtype="object"),
                 "ent_b": pd.array([], dtype="object")}
            )
        cid = df["conv_id"].to_numpy()
        ent = df["ent"].to_numpy()
        n = len(df)
        new = np.ones(n, dtype=bool)
        new[1:] = cid[1:] != cid[:-1]
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        a_parts, b_parts = [], []
        for c in np.unique(counts):
            if c < 2:
                continue
            runs = starts[counts == c]
            ii, jj = np.triu_indices(int(c), k=1)
            a_parts.append(ent[(runs[:, None] + ii[None, :]).ravel()])
            b_parts.append(ent[(runs[:, None] + jj[None, :]).ravel()])
        if not a_parts:
            return pd.DataFrame(
                {"ent_a": pd.array([], dtype="object"),
                 "ent_b": pd.array([], dtype="object")}
            )
        return pd.DataFrame(
            {"ent_a": np.concatenate(a_parts), "ent_b": np.concatenate(b_parts)}
        )

    pairs = _sorted_user_op(
        de, ["conv_id", "ent"], ["conv_id", "ent"], [False, False],
        pair_kernel, {"ent_a": "object", "ent_b": "object"}, key="conv_id",
    )
    counts = grouped_agg(
        pairs.map_batches(
            lambda b: pd.DataFrame(
                {"ent_a": b["ent_a"], "ent_b": b["ent_b"],
                 "one": pd.array(np.ones(len(b), dtype=np.int64), dtype="int64")}
            ),
            batch_format="pandas", batch_size=None,
        ),
        ["ent_a", "ent_b"], [("one", "sum", "n_xy")],
    ).filter(expr=f"n_xy >= {int(min_count)}")

    def score(b: pd.DataFrame) -> pa.Table:
        n_xy = b["n_xy"].to_numpy().astype(np.int64)
        n_x = np.array([n_of[e] for e in b["ent_a"]], dtype=np.int64)
        n_y = np.array([n_of[e] for e in b["ent_b"]], dtype=np.int64)
        pmi = [
            int(round(math.log((float(a) * float(n_convs))
                               / (float(x) * float(y))) * 1e6))
            for a, x, y in zip(n_xy.tolist(), n_x.tolist(), n_y.tolist())
        ]
        return pa.table(
            {
                "ent_a": pa.array(b["ent_a"], pa.string()),
                "ent_b": pa.array(b["ent_b"], pa.string()),
                "n_xy": pa.array(n_xy),
                "n_x": pa.array(n_x),
                "n_y": pa.array(n_y),
                "n_convs": pa.array(np.full(len(b), n_convs, dtype=np.int64)),
                "pmi_e6": pa.array(np.array(pmi, dtype=np.int64)),
            }
        )

    return counts.map_batches(score, batch_format="pandas", batch_size=None)


def top_entities(sf_dir: str, *, k: int = config.TOP_ENTITIES) -> rd.Dataset:
    return canonicalize.top_entities(entity_counts(sf_dir), k=k)


def entity_components(sf_dir: str, min_count: int = 2) -> rd.Dataset:
    """Connected components of the entity co-mention graph — the topic /
    concept-cluster view of the knowledge graph: entities joined by
    ≥ min_count shared conversations (the entity_pmi edge list) collapse
    into clusters labeled by their lexicographically smallest member.
    Returns (entity, component), one row per entity in any qualifying
    pair.

    Scale shape: the pmi pair chain provides the edge list; surfaces map
    to dense int ids through the global-rank sort over the (vocabulary-
    bounded) distinct-surface set — rank order preserves lexicographic
    order, so the int components' MIN-id labels translate back to MIN
    surfaces verbatim — and the labeling is components.py's hash-min
    pointer jumping (O(log d) rounds, size-gated driver path)."""
    import numpy as np
    import pandas as pd
    import ray

    from ..stages import components as comp
    from ..stages.ranks import global_row_number

    edges = entity_pmi(sf_dir, min_count=min_count).select_columns(
        ["ent_a", "ent_b"]
    ).materialize()

    from ..stages.groupagg import grouped_agg

    distinct_ents = grouped_agg(
        edges.map_batches(
            lambda b: pd.DataFrame({
                "ent": pd.concat([b["ent_a"], b["ent_b"]], ignore_index=True),
                "one": pd.array(
                    np.ones(2 * len(b), dtype=np.int64), dtype="int64"),
            }),
            batch_format="pandas", batch_size=None,
        ),
        ["ent"], [("one", "sum", "n")],
    ).select_columns(["ent"])
    ranked = global_row_number(distinct_ents, ["ent"], out_col="eid").to_pandas()
    id_of = dict(zip(ranked["ent"], ranked["eid"].astype("int64")))
    ent_of = {int(v): k for k, v in id_of.items()}
    id_ref = ray.put(id_of)

    def to_ids(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(id_ref)
        return pd.DataFrame({
            "doc_a": pd.array([m[e] for e in b["ent_a"]], dtype="int64"),
            "doc_b": pd.array([m[e] for e in b["ent_b"]], dtype="int64"),
        })

    labeled = comp.connected_components(
        edges.map_batches(to_ids, batch_format="pandas", batch_size=None)
    )
    ent_ref = ray.put(ent_of)

    def back(b: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ent_ref)
        return pd.DataFrame({
            "entity": pd.Series([m[int(i)] for i in b["doc_id"]], dtype="object"),
            "component": pd.Series(
                [m[int(c)] for c in b["component"]], dtype="object"),
        })

    return labeled.map_batches(back, batch_format="pandas", batch_size=None)


def top_cui_links(
    sf_dir: str,
    *,
    top_entities_k: int = config.TOP_ENTITIES,
    top_cuis_k: int = config.TOP_CUIS,
    score_min: float = config.SCORE_MIN,
) -> rd.Dataset:
    """Top-k CUIs (score > score_min) for each of the top-n DISEASE surfaces
    (defaults mirror medgen.py:136-163: 15 surfaces × 4 CUIs, > 0.85)."""
    return canonicalize.top_cuis_per_surface(
        links(sf_dir), score_min=score_min, k=top_cuis_k,
        surfaces=top_entities(sf_dir, k=top_entities_k),
    )


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


def _graph_tables_streaming(
    mention_ds: rd.Dataset,
    *,
    top_entities: int,
    top_cuis: int,
    score_min: float,
    vocab_size: int,
) -> dict[str, rd.Dataset]:
    """graph_tables for a LARGE alias vocabulary (> config.VOCAB_FUNNEL_MAX,
    the production 10^6-10^7-alias UMLS case): the vocabulary-scale tables
    (entity counts, links, entity/UMLS node and edge families) stay
    DISTRIBUTED on the sorted-exchange paths; only the k-bounded selection
    chain (top-k surfaces → top CUIs → KB enrichment, ≤ top_entities ×
    top_cuis rows) is pulled driver-side.  Row-identical to the funnel path
    (tests/test_pipeline.py::test_graph_tables_streaming_parity)."""
    ce = mentions.conv_entities(mention_ds)
    counts = canonicalize.entity_counts(ce, vocab_hint=vocab_size)  # Dataset
    links_ds = linker.link_surfaces(mention_ds)                     # Dataset
    # per-block partial top-k makes this pull ≤ k rows regardless of vocab
    top = canonicalize.top_entities(counts, k=top_entities).to_pandas()
    lk_df = linker.link_table(top["norm_surface"].tolist()).to_pandas()
    cand = lk_df[lk_df["score"] > score_min]
    top_links = (
        cand.sort_values(["score", "cui"], ascending=[False, True], kind="mergesort")
        .groupby("norm_surface", sort=False)
        .head(top_cuis)
    )
    sel = sorted(set(top_links["cui"]))

    gn = enrich.genes_table(sel)
    sn = enrich.snomed_table(sel)
    cf = enrich.clinical_features_table(sel)
    pr = enrich.proteins_table(gn["gene"].to_pylist())
    go = enrich.go_table(pr["entry"].to_pylist())

    # vocab-scale families stay distributed: counts is distinct
    # (norm_surface, label) by construction → entity nodes need no dedup;
    # links is distinct per (surface, cui) → entity→UMLS edges need no
    # dedup; UMLS nodes dedup on cui via the sorted exchange (many
    # surfaces → one cui)
    entity_nodes = counts.map_batches(
        lambda b: graph.node_rows(b, "label", "norm_surface", "norm_surface", None),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    umls_edges = links_ds.map_batches(
        _entity_umls_edges, batch_format="pyarrow", zero_copy_batch=True
    )
    umls_nodes = graph.dedup_nodes(
        links_ds.map_batches(
            lambda b: graph.node_rows(b, "UMLS", "cui", "name", "definition"),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    )
    # KB-bounded families (driven by the ≤ k×k CUI selection) stay literal
    kb_edge_tab = pa.concat_tables(
        [
            graph._edges_batch("UMLS", "source", "Gene", "gene")(gn),
            graph._edges_batch("UMLS", "source", "SnomedConcept", "saui")(sn),
            graph._edges_batch("UMLS", "source", "ClinicalFeature", "feat_cui")(cf),
            graph._edges_batch("Gene", "source", "Protein", "entry")(pr),
            graph._edges_batch("Protein", "source", "GO", "go_id")(go),
        ]
    ).group_by(["subj", "pred", "obj"]).aggregate([])
    kb_node_tab = graph.dedup_nodes_table(
        pa.concat_tables(
            [
                graph.node_rows(gn, "Gene", "gene", "gene", None),
                graph.node_rows(sn, "SnomedConcept", "saui", "snomed_text", None),
                graph.node_rows(cf, "ClinicalFeature", "feat_cui", "name", "definition"),
                graph.node_rows(pr, "Protein", "entry", "name", None),
                graph.node_rows(go, "GO", "go_id", "go_name", None),
            ]
        )
    )
    wrap = rd.from_arrow
    return {
        "links": links_ds,
        "entity_nodes": entity_nodes,
        "umls_edges": umls_edges,
        "umls_nodes": umls_nodes,
        "kb_edges": wrap(kb_edge_tab),
        "kb_nodes": wrap(kb_node_tab),
        "conv_entities": ce,
        "selected": wrap(pa.table({"cui": pa.array(sel, pa.string())})),
        "genes": wrap(gn),
        "snomed": wrap(sn),
        "clinical_features": wrap(cf),
        "proteins": wrap(pr),
        "go": wrap(go),
    }


def graph_tables(
    mention_ds: rd.Dataset,
    *,
    top_entities: int = config.TOP_ENTITIES,
    top_cuis: int = config.TOP_CUIS,
    score_min: float = config.SCORE_MIN,
    vocab_size: int | None = None,
) -> dict[str, rd.Dataset]:
    """All downstream tables from a (materialized or Parquet-backed) mention
    table.

    Only the corpus-scale work runs as Ray jobs: the per-conversation
    entity distinct (`ce`), its count aggregate, and the distinct-surface
    shuffle.  Everything downstream of those is vocabulary/KB-bounded
    (≤ a few hundred rows regardless of corpus size), so the selection and
    enrichment chain runs DRIVER-SIDE on the pulled tiny tables — the
    driver is where a broadcast join's small side lives anyway, and each
    avoided mini-job removes fixed scheduling latency that would otherwise
    cap scaling efficiency.  The driver-side ops share their emit/ordering
    logic with the streaming variants (enrich.*_table / linker.link_table),
    so both paths are row-identical.

    Above config.VOCAB_FUNNEL_MAX aliases (production UMLS scale) the
    vocabulary-bounded assumption breaks — the funnel would pull GBs to the
    driver — so dispatch to the streaming variant instead."""
    from ..sources import readers as _readers

    n_vocab = _readers.kb_num_aliases() if vocab_size is None else vocab_size
    if n_vocab > config.VOCAB_FUNNEL_MAX:
        return _graph_tables_streaming(
            mention_ds, top_entities=top_entities, top_cuis=top_cuis,
            score_min=score_min, vocab_size=n_vocab,
        )
    # ce's flagged intermediate is pinned ONCE inside the distinct (it has
    # two real consumers: the counts aggregate and the edge sink); the
    # post-repair tail is a literal-union filter, so no second full copy is
    # materialized.  At 100 TB the flagged pin is the one candidate for a
    # Parquet spill fallback rather than a design change (Ray's object
    # store already spills it to disk under pressure — tests/test_spill.py).
    ce = mentions.conv_entities(mention_ds)                  # ≤ convs × vocab
    counts = canonicalize.entity_counts(ce).to_pandas()      # vocab-bounded
    lit = _funnel_tables(
        counts, top_entities=top_entities, top_cuis=top_cuis, score_min=score_min
    )
    out = {k: rd.from_arrow(v) for k, v in lit.items()}
    out["conv_entities"] = ce
    return out


def _funnel_tables(
    counts, *, top_entities: int, top_cuis: int, score_min: float
) -> dict[str, pa.Table]:
    """The driver-side selection/enrichment funnel over a vocabulary-bounded
    counts DataFrame (norm_surface, label, n_convs) — shared by graph_tables
    and the fused build path.  Returns literal Arrow tables."""
    lk_tab = linker.link_table(counts["norm_surface"].unique().tolist())
    lk_df = lk_tab.to_pandas()
    top = counts[counts["label"] == "DISEASE"].sort_values(
        ["n_convs", "norm_surface"], ascending=[False, True], kind="mergesort"
    ).head(top_entities)

    cand = lk_df[
        (lk_df["score"] > score_min)
        & lk_df["norm_surface"].isin(set(top["norm_surface"]))
    ]
    top_links = (
        cand.sort_values(["score", "cui"], ascending=[False, True], kind="mergesort")
        .groupby("norm_surface", sort=False)
        .head(top_cuis)
    )
    sel = sorted(set(top_links["cui"]))

    gn = enrich.genes_table(sel)
    sn = enrich.snomed_table(sel)
    cf = enrich.clinical_features_table(sel)
    pr = enrich.proteins_table(gn["gene"].to_pylist())
    go = enrich.go_table(pr["entry"].to_pylist())

    # entity node family derived from the vocabulary-bounded counts table
    # (distinct (norm_surface, label) by construction) — saves the node sink
    # a dedup exchange over the corpus-scale conv-entity table
    entity_nodes_tab = pa.table(
        {
            "canonical_id": pa.array(
                (counts["label"] + ":" + counts["norm_surface"]).tolist(), pa.string()
            ),
            "node_label": pa.array(counts["label"].tolist(), pa.string()),
            "name": pa.array(counts["norm_surface"].tolist(), pa.string()),
            "definition": pa.array([""] * len(counts), pa.string()),
        }
    )

    # KB-bounded edge and node families folded into SINGLE literal tables,
    # deduplicated driver-side (dedup_triples/dedup_nodes semantics) — the
    # sink plans then carry one literal block instead of a 6-way union plus
    # a repartition/dedup subplan each
    kb_edge_tab = pa.concat_tables(
        [
            _entity_umls_edges(lk_tab),
            graph._edges_batch("UMLS", "source", "Gene", "gene")(gn),
            graph._edges_batch("UMLS", "source", "SnomedConcept", "saui")(sn),
            graph._edges_batch("UMLS", "source", "ClinicalFeature", "feat_cui")(cf),
            graph._edges_batch("Gene", "source", "Protein", "entry")(pr),
            graph._edges_batch("Protein", "source", "GO", "go_id")(go),
        ]
    )
    kb_edge_tab = kb_edge_tab.group_by(["subj", "pred", "obj"]).aggregate([])
    kb_node_tab = graph.dedup_nodes_table(
        pa.concat_tables(
            [
                graph.node_rows(lk_tab, "UMLS", "cui", "name", "definition"),
                graph.node_rows(gn, "Gene", "gene", "gene", None),
                graph.node_rows(sn, "SnomedConcept", "saui", "snomed_text", None),
                graph.node_rows(cf, "ClinicalFeature", "feat_cui", "name", "definition"),
                graph.node_rows(pr, "Protein", "entry", "name", None),
                graph.node_rows(go, "GO", "go_id", "go_name", None),
            ]
        )
    )

    return {
        "links": lk_tab,
        "entity_nodes": entity_nodes_tab,
        "kb_edges": kb_edge_tab,
        "kb_nodes": kb_node_tab,
        "selected": pa.table({"cui": pa.array(sel, pa.string())}),
        "genes": gn,
        "snomed": sn,
        "clinical_features": cf,
        "proteins": pr,
        "go": go,
    }


def _edge_union(
    t: dict[str, rd.Dataset],
    *,
    term: str | None = None,
    conv_ids: rd.Dataset | None = None,
) -> rd.Dataset:
    """Union of the seven edge families.

    The corpus-scale family (Conversation→entity) is derived 1:1 from the
    already-deduplicated conv_entities table and its subjects live in their
    own `Conversation:` namespace — re-shuffling it through a global triple
    dedup would move millions of rows to prove what is true by
    construction.  Only the vocabulary/KB-bounded families go through
    dedup_triples (guards e.g. duplicate (surface, cui) rows under fuzzy
    linking); their namespaces are mutually disjoint from the conversation
    family, so the final union is globally distinct."""
    ce_edges = _edges_from(t["conv_entities"], "Conversation", "conv_id", "label", "norm_surface")
    if "kb_edges" in t:
        # pre-deduplicated literal table from graph_tables — one block
        small_deduped = t["kb_edges"]
        if "umls_edges" in t:
            # streaming (large-vocab) mode: the entity→UMLS family is
            # vocab-scale and distinct by construction (links is distinct
            # per surface) — union it distributed, namespaces disjoint
            small_deduped = t["umls_edges"].union(small_deduped)
    else:
        small_parts = [
            t["links"].map_batches(_entity_umls_edges, batch_format="pyarrow", zero_copy_batch=True),
            _edges_from(t["genes"], "UMLS", "source", "Gene", "gene"),
            _edges_from(t["snomed"], "UMLS", "source", "SnomedConcept", "saui"),
            _edges_from(t["clinical_features"], "UMLS", "source", "ClinicalFeature", "feat_cui"),
            _edges_from(t["proteins"], "Gene", "source", "Protein", "entry"),
            _edges_from(t["go"], "Protein", "source", "GO", "go_id"),
        ]
        small = small_parts[0]
        for p in small_parts[1:]:
            small = small.union(p)
        small_deduped = graph.dedup_triples(small, blocks=1)
    out = ce_edges.union(small_deduped)
    if term is not None and conv_ids is not None:
        # SearchTerm root seeding (neo4jconnector.py:244-256): one edge per
        # in-scope conversation, derived from the already-distinct conv set
        from ..stages.distinct import distinct as _dd

        def term_edges(tb: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "subj": pa.array([f"SearchTerm:{term}"] * len(tb), pa.string()),
                    "pred": pa.array([config.PRED] * len(tb), pa.string()),
                    "obj": pc.binary_join_element_wise(
                        pa.scalar("Conversation:"), tb["conv_id"], ""
                    ),
                }
            )

        out = out.union(
            _dd(conv_ids, ["conv_id"]).map_batches(
                term_edges, batch_format="pyarrow", zero_copy_batch=True
            )
        )
    return out.map_batches(
        graph.schema_gate(schemas.TRIPLES), batch_format="pyarrow", zero_copy_batch=True
    )


def _node_union(
    t: dict[str, rd.Dataset], conv_ids: rd.Dataset, *, term: str | None = None
) -> rd.Dataset:
    """Union of the node families, deduped PER FAMILY.

    Canonical ids are namespaced by label (`<label>:<id>`), so families
    never collide and each family's dedup exchange can be sized to that
    family: the conversation family is corpus-scale (full shuffle width),
    the entity family is vocabulary-bounded after the per-block partial,
    and everything KB-derived fits one reduce partition."""
    # conversation nodes: name/definition are the id itself, so this family
    # needs only a distinct over conv_id — exchange-free under the
    # conversation-local shard contract (guard-checked, auto-fallback),
    # sort-based otherwise.  pin=True: the flagged conv-id table is tiny
    # (one row per conversation), and pinning halves the transcript scans —
    # the edge gather and the sink otherwise EACH re-run the read + block
    # pass (two full passes over the corpus's conv_id column).
    conv_distinct = _conv_distinct(conv_ids, pin=True)
    conv_nodes = conv_distinct.map_batches(
        lambda b: graph.node_rows(b, "Conversation", "conv_id", "conv_id", None),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    if "entity_nodes" in t:
        # vocabulary-bounded family precomputed from the counts table —
        # distinct by construction, no exchange needed
        entity_nodes = t["entity_nodes"]
    else:
        entity_nodes = graph.dedup_nodes(
            t["conv_entities"].map_batches(
                lambda b: graph.node_rows(b, "label", "norm_surface", "norm_surface", None),
                batch_format="pyarrow", zero_copy_batch=True),
        )
    if "kb_nodes" in t:
        kb_nodes = t["kb_nodes"]  # pre-deduplicated literal table
        if "umls_nodes" in t:
            # streaming (large-vocab) mode: UMLS node family deduped on the
            # sorted exchange (vocab-scale), unioned distributed
            kb_nodes = t["umls_nodes"].union(kb_nodes)
    else:
        small_parts = [
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
        small = small_parts[0]
        for p in small_parts[1:]:
            small = small.union(p)
        kb_nodes = graph.dedup_nodes(small, blocks=1)
    out = conv_nodes.union(entity_nodes).union(kb_nodes)
    if term is not None:
        out = out.union(
            rd.from_arrow(
                pa.table(
                    {
                        "canonical_id": pa.array([f"SearchTerm:{term}"], pa.string()),
                        "node_label": pa.array(["SearchTerm"], pa.string()),
                        "name": pa.array([term], pa.string()),
                        "definition": pa.array([""], pa.string()),
                    }
                )
            )
        )
    return out.map_batches(
        graph.schema_gate(schemas.NODES), batch_format="pyarrow", zero_copy_batch=True
    )


def _scope_conv_ids_ds(sf_dir: str, scope: list[str] | TermScope | None) -> rd.Dataset:
    if scope is None:
        return transcripts(sf_dir, ["conv_id"])
    if isinstance(scope, TermScope):
        # matching conv ids as a DATASET (consumers run their own distinct)
        t_low = scope.term

        def match(t: pa.Table) -> pa.Table:
            keep = pc.match_substring(pc.utf8_lower(t["text"]), t_low)
            return t.filter(keep).select(["conv_id"])

        return transcripts(sf_dir, ["conv_id", "text"]).map_batches(
            match, batch_format="pyarrow", zero_copy_batch=True
        )
    return rd.from_arrow(pa.table({"conv_id": pa.array(scope, pa.string())}))


def edges(
    sf_dir: str,
    *,
    term: str | None = None,
    max_conversations: int | None = None,
    top_entities: int = config.TOP_ENTITIES,
    top_cuis: int = config.TOP_CUIS,
    score_min: float = config.SCORE_MIN,
) -> rd.Dataset:
    """The full deduplicated (subj, pred, obj) edge set — the triple surface
    judged against the reference semantics (P/R on the set)."""
    scope = conv_scope_ids(sf_dir, term, max_conversations)
    t = graph_tables(
        mention_rows(sf_dir, scope=scope),
        top_entities=top_entities, top_cuis=top_cuis, score_min=score_min,
    )
    return _edge_union(
        t, term=term,
        conv_ids=_scope_conv_ids_ds(sf_dir, scope) if term is not None else None,
    )


triples = edges  # the edge set IS the emitted triple set


def nodes(
    sf_dir: str,
    *,
    term: str | None = None,
    max_conversations: int | None = None,
    top_entities: int = config.TOP_ENTITIES,
    top_cuis: int = config.TOP_CUIS,
    score_min: float = config.SCORE_MIN,
) -> rd.Dataset:
    """Deduplicated node table (canonical_id, node_label, name, definition)."""
    scope = conv_scope_ids(sf_dir, term, max_conversations)
    t = graph_tables(
        mention_rows(sf_dir, scope=scope),
        top_entities=top_entities, top_cuis=top_cuis, score_min=score_min,
    )
    return _node_union(t, _scope_conv_ids_ds(sf_dir, scope), term=term)


# ---------------------------------------------------------------------------
# Fused stage-2 summary: ONE streaming pass over the mention stream emits
# everything the small-vocab build needs — the Conversation→entity edge
# family goes STRAIGHT to Parquet from the map tasks (never pinned through
# the object store; at 100 TB the conv-entity table is TB-scale), and the
# only materialized output is vocabulary-bounded: per-block partial entity
# counts, the ≤ 2-convs-per-block edge rows, and the contract-guard
# summaries.  Semantics are identical to conv_entities → entity_counts →
# _edges_from (same per-conv distinct, same guard, same repair).
# ---------------------------------------------------------------------------

_SUMMARY_SCHEMA = pa.schema(
    [
        ("__kind", pa.string()),       # "edge" | "partial" | "guard"
        ("norm_surface", pa.string()),
        ("label", pa.string()),
        ("conv_id", pa.string()),      # edge rows only
        ("n_convs", pa.int64()),       # partial rows only
        ("__gf", pa.string()),         # guard row only (see stages/distinct.py)
        ("__gl", pa.string()),
        ("__gkmv", pa.binary()),
    ]
)


def _fused_summary_pass(edge_dir: str | None):
    """map_batches fn (batch_size=None) over mention blocks.

    Per block: per-conv distinct (surface, conv, label); interior convs'
    Conversation→entity triples are written to `edge_dir` (skipped when
    None, e.g. edges already committed); emits edge-conv ce rows + partial
    counts over interior convs + one guard summary row."""
    import pyarrow.parquet as pq

    from ..stages import distinct as _dx
    from ..stages.groupagg import rename_after_groupby

    def _cat(*parts: pa.Array) -> pa.Array:
        return pa.concat_arrays(
            [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts]
        )

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SUMMARY_SCHEMA.empty_table()
        keys = ["norm_surface", "conv_id", "label"]
        g = t.select(keys).group_by(keys).aggregate([])
        first = t["conv_id"][0]
        last = t["conv_id"][t.num_rows - 1]
        edge_mask = pc.or_(pc.equal(g["conv_id"], first), pc.equal(g["conv_id"], last))
        interior = g.filter(pc.invert(edge_mask))
        edge = g.filter(edge_mask)
        if edge_dir is not None and interior.num_rows:
            triples = pa.table(
                {
                    "subj": pc.binary_join_element_wise(
                        pa.scalar("Conversation:"), interior["conv_id"], ""
                    ),
                    "pred": pa.array([config.PRED] * interior.num_rows, pa.string()),
                    "obj": pc.binary_join_element_wise(
                        interior["label"], pa.scalar(":"), interior["norm_surface"], ""
                    ),
                }
            )
            os.makedirs(edge_dir, exist_ok=True)
            # deterministic in the block's content: a retried task overwrites
            # its own file; (first, last, n) is unique across disjoint blocks
            stem = (
                f"{interior['conv_id'][0].as_py()}_"
                f"{interior['conv_id'][interior.num_rows - 1].as_py()}_{interior.num_rows}"
            )
            pq.write_table(triples, os.path.join(edge_dir, f"{stem}.parquet"))
        partial = interior.group_by(["norm_surface", "label"]).aggregate([("conv_id", "count")])
        partial = rename_after_groupby(
            partial, ["norm_surface", "label"], ["conv_id"], ["count"], ["n_convs"]
        )
        uniq = pc.unique(t["conv_id"].combine_chunks())
        interior_convs = uniq.filter(
            pc.and_(pc.not_equal(uniq, first), pc.not_equal(uniq, last))
        ).to_pylist()
        n_e, n_p = edge.num_rows, partial.num_rows
        return pa.table(
            {
                "__kind": pa.array(["edge"] * n_e + ["partial"] * n_p + ["guard"], pa.string()),
                "norm_surface": _cat(edge["norm_surface"], partial["norm_surface"], pa.nulls(1, pa.string())),
                "label": _cat(edge["label"], partial["label"], pa.nulls(1, pa.string())),
                "conv_id": _cat(edge["conv_id"], pa.nulls(n_p + 1, pa.string())),
                "n_convs": _cat(pa.nulls(n_e, pa.int64()), pc.cast(partial["n_convs"].combine_chunks(), pa.int64()), pa.nulls(1, pa.int64())),
                "__gf": _cat(pa.nulls(n_e + n_p, pa.string()), pa.array([str(first)], pa.string())),
                "__gl": _cat(pa.nulls(n_e + n_p, pa.string()), pa.array([str(last)], pa.string())),
                "__gkmv": _cat(pa.nulls(n_e + n_p, pa.binary()), pa.array([_dx.guard_sketch(interior_convs)], pa.binary())),
            },
            schema=_SUMMARY_SCHEMA,
        )

    return fn


def _fused_graph_summary(mention_ds: rd.Dataset, edge_dir: str | None):
    """Run the fused pass; returns (counts_df, repaired_edge_triples).

    Raises stages.distinct.ContractError when the conv-local contract is
    violated — the caller falls back to the layout-independent path (the
    edge files written by the failed attempt must be discarded: interior
    dedup is only exact under the contract)."""
    from ..stages import distinct as _dx
    from ..stages.groupagg import rename_after_groupby

    fused = mention_ds.map_batches(
        _fused_summary_pass(edge_dir),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=None,
    )
    with _dx._ordered_execution():  # guard rows must arrive in stream order
        rows = fused.take_all()
    tab = pa.Table.from_pylist(rows, schema=_SUMMARY_SCHEMA)
    guard = tab.filter(pc.equal(tab["__kind"], "guard"))
    _dx.check_summaries(
        guard["__gf"].to_pylist(),
        guard["__gl"].to_pylist(),
        guard["__gkmv"].to_pylist(),
        "conv_id",
        "build_graph fused summary",
    )
    edge = (
        tab.filter(pc.equal(tab["__kind"], "edge"))
        .select(["norm_surface", "conv_id", "label"])
        .group_by(["norm_surface", "conv_id", "label"])
        .aggregate([])
    )
    edge_counts = edge.group_by(["norm_surface", "label"]).aggregate([("conv_id", "count")])
    edge_counts = rename_after_groupby(
        edge_counts, ["norm_surface", "label"], ["conv_id"], ["count"], ["n_convs"]
    )
    partial = tab.filter(pc.equal(tab["__kind"], "partial")).select(
        ["norm_surface", "label", "n_convs"]
    )
    combined = (
        pa.concat_tables([partial, edge_counts])
        .group_by(["norm_surface", "label"])
        .aggregate([("n_convs", "sum")])
    )
    counts_df = rename_after_groupby(
        combined, ["norm_surface", "label"], ["n_convs"], ["sum"], ["n_convs"]
    ).to_pandas()
    repaired = pa.table(
        {
            "subj": pc.binary_join_element_wise(pa.scalar("Conversation:"), edge["conv_id"], ""),
            "pred": pa.array([config.PRED] * edge.num_rows, pa.string()),
            "obj": pc.binary_join_element_wise(edge["label"], pa.scalar(":"), edge["norm_surface"], ""),
        }
    )
    return counts_df, repaired


# ---------------------------------------------------------------------------
# Consuming entry point: resumable build
# ---------------------------------------------------------------------------

def build_graph(
    sf_dir: str,
    out_dir: str,
    *,
    term: str | None = None,
    max_conversations: int | None = None,
    top_entities: int = config.TOP_ENTITIES,
    top_cuis: int = config.TOP_CUIS,
    score_min: float = config.SCORE_MIN,
) -> dict:
    """Run the full pipeline and materialize mentions/nodes/edges Parquet.

    Stage 1 (mentions) runs PER INPUT SHARD with manifest lineage — a
    restarted job skips shards whose output is committed.  Stages 2+ are
    global (selection needs corpus-wide counts), stream from the committed
    mention Parquet, and commit atomically.  Returns summary metrics.

    Knobs (JobRequest analogs of manager.py:131-191 / fetch_ncbi.py:50-51):
    term scopes the corpus, max_conversations caps it, the top/score knobs
    parameterize concept selection.  Knobs are recorded in the manifest;
    resuming with DIFFERENT knobs raises (committed partitions would mix
    semantics) — delete the output dir to rebuild.
    """
    import time

    _trace = os.environ.get("GRAFT_TIMING") == "1"
    _t0 = time.perf_counter()

    def _mark(stage: str) -> None:
        if _trace:
            print(f"[timing] {stage}: {time.perf_counter() - _t0:.2f}s", flush=True)

    man = Manifest(os.path.join(out_dir, "manifest.jsonl"))
    knobs = {
        "term": term, "max_conversations": max_conversations,
        "top_entities": top_entities, "top_cuis": top_cuis, "score_min": score_min,
    }
    prior_scope = [e for e in man.entries() if e["stage"] == "knobs"]
    if prior_scope:
        if prior_scope[-1].get("knobs") != knobs:
            raise ValueError(
                f"resume with different knobs ({prior_scope[-1].get('knobs')} → "
                f"{knobs}); delete {out_dir} to rebuild"
            )
    else:
        man.record("knobs", "knobs", "done", knobs=knobs)
    scope = conv_scope_ids(sf_dir, term, max_conversations)
    _mark("scope")
    shards = readers.transcript_files(sf_dir)

    def _nrows(path: str) -> int:
        # parquet footer metadata — no data read, no Ray job
        import pyarrow.parquet as pq

        files = [path] if path.endswith(".parquet") else sorted(glob.glob(os.path.join(path, "*.parquet")))
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    # Resume granularity: BUCKETS of input shards (≤ MENTION_BUCKETS), not
    # individual shards.  At 10^5+ shards a per-shard hive write means that
    # many tiny partitions — filesystem metadata and block bloat that every
    # downstream read and shuffle pays for.  A bucket (stable hash of the
    # shard name) is the atomic resume unit: lose one bucket, recompute only
    # its member shards.
    import zlib

    n_buckets = min(config.MENTION_BUCKETS, max(1, len(shards)))

    def bucket_of(shard_path: str) -> str:
        name = os.path.basename(shard_path).replace(".parquet", "")
        return f"b{zlib.crc32(name.encode()) % n_buckets:04d}"

    buckets: dict[str, list[str]] = {}
    for shard_path in shards:
        buckets.setdefault(bucket_of(shard_path), []).append(shard_path)

    done = man.completed("mentions")
    mention_dirs, n_turns = [], 0
    pending: list[tuple[str, list[str]]] = []
    for part in sorted(buckets):
        if part in done:
            mention_dirs.append(done[part]["output_path"])
            n_turns += done[part].get("rows_in", 0)
        else:
            pending.append((part, buckets[part]))

    import shutil

    tmp = os.path.join(out_dir, "mentions.tmp")
    det_stream = None
    if pending:
        # ONE pipelined execution over every pending bucket (per-bucket
        # sequential runs would pay actor-pool startup per bucket); bucket
        # output partitions are written DIRECTLY from the detection tasks
        # (stages/mwrite.bucket_writer) — parallel per-block Parquet
        # appends, no hive-partition machinery (measured +3-6 s at sf3) —
        # so resume granularity is intact.
        pat_buckets = {os.path.basename(p): b for b, paths in pending for p in paths}
        pending_files = [p for _, paths in pending for p in paths]
        ds = rd.read_parquet(
            pending_files,
            columns=["conv_id", "turn_idx", "text"],
            include_paths=True,
            # one task per shard file (~1,800 at sf3) costs seconds of
            # serial dispatch; the per-row path column keeps the bucket
            # mapping exact across coalesced blocks
            override_num_blocks=config.read_blocks(len(pending_files)),
        ).map_batches(
            lambda t: t.append_column(
                "shard",
                pa.array(
                    [pat_buckets[os.path.basename(p)] for p in t["path"].to_pylist()],
                    pa.string(),
                ),
            ).drop_columns(["path"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        if scope is not None:
            ds = filter_convs(ds, scope)
        det = mentions.detect_mentions(ds, keep_shard=True)
        shutil.rmtree(tmp, ignore_errors=True)
        det_stream = det.map_batches(
            mwrite.bucket_writer(tmp, bucket_col="shard", order_cols=["conv_id", "turn_idx"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=None,
        )

    def _commit_mentions() -> None:
        """Rename written bucket dirs into place + record lineage.  Callable
        only after the detection execution has run (writes are complete)."""
        nonlocal n_turns
        os.makedirs(os.path.join(out_dir, "mentions"), exist_ok=True)
        from concurrent.futures import ThreadPoolExecutor as _TPE

        with _TPE(max_workers=16) as _ex:  # footer-only reads, I/O bound
            nrows_in = dict(
                zip(
                    (p for _, paths in pending for p in paths),
                    _ex.map(_nrows, (p for _, paths in pending for p in paths)),
                )
            )
        for part, shard_paths in pending:
            src = os.path.join(tmp, part)
            dst = os.path.join(out_dir, "mentions", part)
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.exists(src):
                os.rename(src, dst)
            else:  # bucket produced zero mentions
                os.makedirs(dst, exist_ok=True)
            rows_in, rows_out = sum(nrows_in[p] for p in shard_paths), _nrows(dst)
            man.record(
                "mentions", part, "done",
                input_shards=shard_paths, rows_in=rows_in, rows_out=rows_out, output_path=dst,
            )
            mention_dirs.append(dst)
            n_turns += rows_in
        shutil.rmtree(tmp, ignore_errors=True)
        _mark("mention_commit")

    n_vocab = readers.kb_num_aliases()
    if pending and n_vocab > config.VOCAB_FUNNEL_MAX:
        # large-vocab mode re-scans the mention table (links + ce are both
        # corpus-scale consumers) — commit it to Parquet FIRST and stream
        # the committed files into each consumer, as a 100-TB run should
        det_stream.count()  # streams detection + bucket writes (no pin)
        _mark("mention_write")
        _commit_mentions()
        det_stream = None

    def _mention_union() -> rd.Dataset:
        committed_files = [
            f for d in mention_dirs for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
        ]
        parts = []
        if committed_files:
            parts.append(
                rd.read_parquet(
                    committed_files, override_num_blocks=config.read_blocks(len(committed_files))
                )
            )
        if det_stream is not None:
            # small-vocab mode: detection, the bucket write, and the stage-2
            # block pass FUSE into one streaming execution (no mention
            # re-read, no extra plan launch).  Committed buckets (resume)
            # union in as a Parquet read; bucket conv sets are disjoint, so
            # conv-local contiguity holds across the union.
            parts.append(det_stream)
        return parts[0] if len(parts) == 1 else parts[0].union(parts[1])

    def _commit(stage: str, ds: rd.Dataset) -> int:
        prior = man.completed(stage)
        if stage in prior:
            return prior[stage].get("rows_out", 0)
        out = os.path.join(out_dir, stage)
        try:
            atomic_write_parquet(ds, out)
        except BaseException as e:
            # fail LOUDLY and leave a lineage record — the reference's
            # silent `query() → None` swallow (neo4jconnector.py:232-242)
            # is deliberately not reproduced
            man.record(stage, stage, "failed", error=repr(e)[:500])
            raise
        n = _nrows(out)
        man.record(stage, stage, "done", rows_out=n, output_path=out)
        return n

    from concurrent.futures import ThreadPoolExecutor

    mention_ds = _mention_union()

    if term is None and n_vocab <= config.VOCAB_FUNNEL_MAX:
        # FUSED stage 2: one corpus-scale pass (detection → mention bucket
        # write → per-conv distinct → conv-edge Parquet + count partials),
        # then a driver-side funnel and two small commits.  The conv-id
        # distinct for the node sink (an independent transcript scan) runs
        # CONCURRENTLY with the fused pass.
        from ..stages.distinct import ContractError

        edges_prior = man.completed("edges")
        nodes_prior = man.completed("nodes")
        edge_tmp = os.path.join(out_dir, "edges.tmp.fused")
        shutil.rmtree(edge_tmp, ignore_errors=True)
        node_tmp = os.path.join(out_dir, "nodes.tmp.fused")

        def _conv_nodes_write() -> str:
            # the WHOLE conversation-node sink (distinct → node rows →
            # schema gate → Parquet) runs concurrently with the fused pass;
            # the funnel's literal nodes append driver-side afterwards, so
            # no post-funnel Ray plan launch remains on the critical path
            shutil.rmtree(node_tmp, ignore_errors=True)
            conv_nodes = (
                _conv_distinct(_scope_conv_ids_ds(sf_dir, scope), pin=False)
                .map_batches(
                    lambda b: graph.node_rows(b, "Conversation", "conv_id", "conv_id", None),
                    batch_format="pyarrow", zero_copy_batch=True,
                )
                .map_batches(
                    graph.schema_gate(schemas.NODES), batch_format="pyarrow",
                    zero_copy_batch=True,
                )
            )
            conv_nodes.write_parquet(node_tmp)
            return node_tmp

        counts_df = repaired_tab = None
        with ThreadPoolExecutor(max_workers=1) as ex0:
            f_conv = (
                ex0.submit(_conv_nodes_write)
                if "nodes" not in nodes_prior
                else None
            )
            try:
                counts_df, repaired_tab = _fused_graph_summary(
                    mention_ds, None if "edges" in edges_prior else edge_tmp
                )
            except ContractError as e:
                import warnings

                warnings.warn(
                    f"{e} — rebuilding stage 2 from committed mentions on the "
                    "layout-independent path"
                )
                shutil.rmtree(edge_tmp, ignore_errors=True)
            if pending and det_stream is not None:
                # the fused plan ran (even on ContractError, which is a
                # driver-side verdict) — bucket files are on disk
                _commit_mentions()
                det_stream = None
            if counts_df is not None:
                lit = _funnel_tables(
                    counts_df, top_entities=top_entities, top_cuis=top_cuis, score_min=score_min
                )
                _mark("graph_tables")
                if "edges" in edges_prior:
                    n_edges = edges_prior["edges"].get("rows_out", 0)
                else:
                    import pyarrow.parquet as pq

                    out_edges = os.path.join(out_dir, "edges")
                    try:
                        small = pa.concat_tables(
                            [repaired_tab, lit["kb_edges"]]
                        ).cast(schemas.TRIPLES)
                        os.makedirs(edge_tmp, exist_ok=True)
                        pq.write_table(small, os.path.join(edge_tmp, "kb_and_bridge.parquet"))
                        shutil.rmtree(out_edges, ignore_errors=True)
                        os.rename(edge_tmp, out_edges)
                        n_edges = _nrows(out_edges)
                    except BaseException as e:
                        man.record("edges", "edges", "failed", error=repr(e)[:500])
                        raise
                    man.record("edges", "edges", "done", rows_out=n_edges, output_path=out_edges)
                if "nodes" in nodes_prior:
                    n_nodes = nodes_prior["nodes"].get("rows_out", 0)
                else:
                    import pyarrow.parquet as pq

                    try:
                        tmp_nodes = f_conv.result()  # conv nodes already on disk
                        lit_nodes = graph.schema_gate(schemas.NODES)(
                            pa.concat_tables([lit["entity_nodes"], lit["kb_nodes"]])
                        )
                        pq.write_table(
                            lit_nodes, os.path.join(tmp_nodes, "literal_nodes.parquet")
                        )
                        out_nodes = os.path.join(out_dir, "nodes")
                        shutil.rmtree(out_nodes, ignore_errors=True)
                        os.rename(tmp_nodes, out_nodes)
                        n_nodes = _nrows(out_nodes)
                    except BaseException as e:
                        man.record("nodes", "nodes", "failed", error=repr(e)[:500])
                        raise
                    man.record("nodes", "nodes", "done", rows_out=n_nodes, output_path=out_nodes)
                _mark("edges_nodes_commit")
                return {
                    "n_turns": n_turns, "n_edges": n_edges, "n_nodes": n_nodes, "out_dir": out_dir
                }
        # ContractError fallback: mentions are committed; stage 2 re-runs
        # from the committed Parquet below (its internal guards dispatch to
        # the sorted-exchange paths on the same violation).  The concurrent
        # conv-node write (if any) is discarded — the general path rebuilds
        # the node sink with its own commit.
        if f_conv is not None:
            try:
                f_conv.result()
            except BaseException:
                pass
            shutil.rmtree(node_tmp, ignore_errors=True)
        mention_ds = _mention_union()

    t = graph_tables(
        mention_ds, top_entities=top_entities, top_cuis=top_cuis, score_min=score_min,
        vocab_size=n_vocab,
    )
    _mark("graph_tables")
    if pending and det_stream is not None:
        # ce's pin inside graph_tables executed the fused plan — the bucket
        # files are on disk; commit them before the sinks run
        _commit_mentions()

    # the two sinks share the materialized mention-derived inputs and write
    # to distinct directories — run their Ray executions CONCURRENTLY so
    # launch latency and the per-plan serial phases overlap (the streaming
    # executor interleaves both job's tasks on the same CPU pool)
    edge_ds = _edge_union(
        t, term=term,
        conv_ids=_scope_conv_ids_ds(sf_dir, scope) if term is not None else None,
    )
    node_ds = _node_union(t, _scope_conv_ids_ds(sf_dir, scope), term=term)
    with ThreadPoolExecutor(max_workers=2) as ex:
        f_edges = ex.submit(_commit, "edges", edge_ds)
        f_nodes = ex.submit(_commit, "nodes", node_ds)
        n_edges = f_edges.result()
        n_nodes = f_nodes.result()
    _mark("edges_nodes_commit")
    return {"n_turns": n_turns, "n_edges": n_edges, "n_nodes": n_nodes, "out_dir": out_dir}
