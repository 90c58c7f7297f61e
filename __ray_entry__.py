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
from medknowledgegraph_ray.pipelines import kg

_SF001 = "/root/testdata/sf0.01"


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


def _kg_ctes(sf_dir: str = _SF001) -> str:
    """Shared WITH-block: the whole reference operator chain in ANSI SQL.

    Mirrors, stage by stage: mention detection (word-boundary regex join),
    per-doc entity dedup (entityrecognition.py:54-64), link dedup (:115),
    score filter + top-15 entities + top-4 CUIs (medgen.py:136-163), KB
    enrichment joins (medgen.py / uniprotpipe.py), GO unnest
    (uniprotpipe.py:124-136).
    """
    p = _gen_paths(sf_dir)
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
  ORDER BY n_convs DESC, norm_surface ASC LIMIT {config.TOP_ENTITIES}
),
g_top4 AS (
  SELECT norm_surface, cui, score, name, definition, label FROM (
    SELECT l.*, row_number() OVER (
      PARTITION BY l.norm_surface ORDER BY l.score DESC, l.cui ASC) AS rn
    FROM g_links l
    WHERE l.score > {config.SCORE_MIN}
      AND l.norm_surface IN (SELECT norm_surface FROM g_top15)
  ) WHERE rn <= {config.TOP_CUIS}
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


def _kg_sql(body: str, sf_dir: str = _SF001) -> str:
    return _kg_ctes(sf_dir) + body


def entry() -> Any:
    """Flagship pipeline: transcript shards → deduplicated triple set."""
    return kg.edges("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    # Generate the corpora the driver will exercise (idempotent, ~1 s).
    datagen.ensure_transcripts("/root/testdata/sf0.001")
    datagen.ensure_transcripts(_SF001)
    return {
        "kg_conversations": kg.conversations,
        "kg_turn_roundtrip": kg.turn_roundtrip,
        "kg_mentions": kg.mention_rows,
        "kg_conv_entities": kg.conv_entities,
        "kg_links": kg.links,
        "kg_entity_counts": kg.entity_counts,
        "kg_top_entities": kg.top_entities,
        "kg_top_cuis": kg.top_cui_links,
        "kg_selected_cuis": kg.selected_cuis,
        "kg_genes": kg.genes,
        "kg_snomed": kg.snomed,
        "kg_clinical_features": kg.clinical_features,
        "kg_proteins": kg.proteins,
        "kg_go": kg.go_terms,
        "kg_edges": kg.edges,
        "kg_nodes": kg.nodes,
    }


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
        "kg_links": _kg_sql("SELECT norm_surface, cui, score, name, definition, label FROM g_links"),
        "kg_entity_counts": _kg_sql("SELECT norm_surface, label, n_convs FROM g_counts"),
        "kg_top_entities": _kg_sql("SELECT norm_surface, label, n_convs FROM g_top15"),
        "kg_top_cuis": _kg_sql(
            "SELECT norm_surface, cui, score, name, definition, label FROM g_top4"
        ),
        "kg_selected_cuis": _kg_sql("SELECT cui FROM g_sel"),
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
    }
