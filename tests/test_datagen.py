"""Corpus generation: determinism, schema, vocabulary hygiene."""

import glob
import os

import pyarrow.parquet as pq

from medknowledgegraph_ray import config, datagen, schemas
from medknowledgegraph_ray.datagen import _FILLER, _kb_tables


def test_transcript_schema_and_shards(sf_dir):
    gen = datagen.ensure_transcripts(sf_dir)
    files = sorted(glob.glob(os.path.join(gen, "*.parquet")))
    assert files, "no shards generated"
    t = pq.read_table(files[0])
    assert t.schema.equals(schemas.TRANSCRIPTS)
    # turn_idx dense + unique within conversation
    df = t.to_pandas()
    for _, g in df.groupby("conv_id"):
        assert sorted(g["turn_idx"]) == list(range(len(g)))


def test_generation_is_deterministic(tmp_path, monkeypatch, sf_dir):
    gen1 = datagen.ensure_transcripts(sf_dir)
    first = sorted(glob.glob(os.path.join(gen1, "*.parquet")))[0]
    t1 = pq.read_table(first)
    monkeypatch.setattr(config, "GEN_ROOT", str(tmp_path))
    gen2 = datagen.ensure_transcripts(sf_dir)
    assert gen2 != gen1
    t2 = pq.read_table(sorted(glob.glob(os.path.join(gen2, "*.parquet")))[0])
    assert t1.equals(t2)


def test_alias_tokens_disjoint_from_filler():
    # Accidental mention matches are impossible: no alias token appears in
    # the filler vocabulary (word-boundary matching then implies a mention
    # exists iff the generator planted it).
    kb = _kb_tables()
    alias_tokens = set()
    for alias in kb["aliases"]["alias"].to_pylist():
        alias_tokens.update(tok for tok in alias.split() if not tok.isdigit())
    overlap = alias_tokens & set(_FILLER)
    assert not overlap, f"alias tokens collide with filler vocabulary: {overlap}"


def test_kb_has_skew_ambiguity_and_ties():
    kb = _kb_tables()
    aliases = kb["aliases"].to_pandas()
    # ambiguous surfaces exist (one alias → >TOP_CUIS candidate CUIs)
    per_surface = aliases.groupby("alias")["cui"].nunique()
    assert (per_surface > config.TOP_CUIS).any()
    # the planted score tie exists
    tie = aliases[aliases["alias"] == "tiebreak term"]
    assert (tie["alias_score"] == 0.91).sum() == 2


def test_kbprep_xml_roundtrip():
    """M6 parse path: KB tables → MedGen-style XML dump → parsed back to
    IDENTICAL tables (the offline KB-prep step runtime joins rely on)."""
    import pytest

    from medknowledgegraph_ray import datagen
    from medknowledgegraph_ray.sources import kbprep

    kb = datagen._kb_tables()
    xml = kbprep.emit_medgen_xml(kb["gene_map"], kb["snomed_map"], kb["clinical_features"])
    parsed = kbprep.parse_medgen_xml(xml)
    for name in ("gene_map", "snomed_map", "clinical_features"):
        want = kb[name].sort_by([(c, "ascending") for c in kb[name].column_names])
        got = parsed[name].sort_by([(c, "ascending") for c in parsed[name].column_names])
        assert got.equals(want), name
    with pytest.raises(kbprep.KBParseError, match="root tag"):
        kbprep.parse_medgen_xml("<WrongRoot></WrongRoot>")
    with pytest.raises(kbprep.KBParseError, match="ConceptId"):
        kbprep.parse_medgen_xml("<MedGenSet><DocumentSummary/></MedGenSet>")
