"""Request parsing + pipeline-DAG validation (manager.py:131-191,220-240
semantics, mirrored from the reference's tests/unittests/test_manager.py)."""

import json

import pytest

from medknowledgegraph_ray import jobs


def _base(**over):
    req = {"sf_dir": "/root/testdata/sf0.001", "out_dir": "/tmp/kg_jobs_test"}
    req.update(over)
    return req


def test_parse_defaults():
    job = jobs.parse_request(_base())
    assert job.pipelines == {p: True for p in jobs.PIPE_HIERARCHY}
    assert job.top_entities == 15 and job.top_cuis == 4 and job.score_min == 0.85
    assert job.term is None and not job.delete_existing


def test_parse_json_string_and_term_lowercased():
    job = jobs.parse_request(json.dumps(_base(term="Nocturnal Enuresis")))
    assert job.term == "nocturnal enuresis"


def test_missing_required_arg_raises():
    with pytest.raises(jobs.RequestError, match="missing required"):
        jobs.parse_request({"sf_dir": "x"})


def test_unknown_key_raises():
    with pytest.raises(jobs.RequestError, match="unknown request keys"):
        jobs.parse_request(_base(nonsense=1))


def test_unknown_pipeline_raises():
    with pytest.raises(jobs.RequestError, match="unknown pipeline"):
        jobs.parse_request(_base(pipelines={"neo4j": True}))


def test_dependency_gap_raises():
    # uniprot without medgen: the reverse-hierarchy gap the reference rejects
    with pytest.raises(jobs.RequestError, match="dependency gap"):
        jobs.parse_request(_base(pipelines={"medgen": False}))


def test_graph_without_enrichment_is_valid():
    job = jobs.parse_request(
        _base(pipelines={"medgen": False, "uniprot": False})
    )
    assert job.pipelines["graph"] and not job.pipelines["medgen"]


def test_bad_json_raises():
    with pytest.raises(jobs.RequestError, match="not valid JSON"):
        jobs.parse_request("{nope")


def test_run_job_partial_ner_only(tmp_path, sf_dir):
    job = jobs.parse_request(
        {
            "sf_dir": sf_dir,
            "out_dir": str(tmp_path / "ner_only"),
            "pipelines": {"medgen": False, "uniprot": False, "graph": False},
        }
    )
    out = jobs.run_job(job)
    assert out["n_mentions"] > 0 and out["n_links"] > 0
    assert "n_edges" not in out


def test_score_min_and_topk_knobs_change_selection(sf_dir):
    """A stricter score_min / smaller top-k must shrink the selected-CUI
    chain (the knobs actually reach graph_tables, not config constants)."""
    from medknowledgegraph_ray.pipelines import kg

    m = kg.mention_rows(sf_dir).materialize()
    base = kg.graph_tables(m)
    strict = kg.graph_tables(m, top_entities=5, top_cuis=1, score_min=0.95)
    n_base = base["selected"].count()
    n_strict = strict["selected"].count()
    assert 0 < n_strict < n_base
    assert n_strict <= 5  # ≤ top_entities(5) surfaces × top_cuis(1)


def test_max_conversations_cap(sf_dir):
    from medknowledgegraph_ray.pipelines import kg

    ids = kg.conv_scope_ids(sf_dir, None, 7)
    assert len(ids) == 7 and ids == sorted(ids)
    all_ids = kg.conv_scope_ids(sf_dir, None, 10**9)
    assert ids == all_ids[:7]


def test_term_scoping_seeds_searchterm(sf_dir):
    from medknowledgegraph_ray.pipelines import kg

    term = "xelorvan"
    scope = kg.conv_scope_ids(sf_dir, term, 20)
    assert 0 < len(scope) <= 20
    edges = kg.edges(sf_dir, term=term, max_conversations=20).take_all()
    nodes = kg.nodes(sf_dir, term=term, max_conversations=20).take_all()
    st_edges = [e for e in edges if e["subj"] == f"SearchTerm:{term}"]
    assert {e["obj"] for e in st_edges} == {f"Conversation:{c}" for c in scope}
    conv_subj = {e["subj"].split(":", 1)[1] for e in edges if e["subj"].startswith("Conversation:")}
    assert conv_subj <= set(scope)  # every mention edge comes from in-scope convs
    assert any(n["canonical_id"] == f"SearchTerm:{term}" for n in nodes)
    conv_nodes = {n["canonical_id"].split(":", 1)[1] for n in nodes
                  if n["node_label"] == "Conversation"}
    assert conv_nodes == set(scope)


def test_build_graph_knob_mismatch_on_resume_raises(tmp_path, sf_dir):
    from medknowledgegraph_ray.pipelines import kg

    out = str(tmp_path / "knobbed")
    kg.build_graph(sf_dir, out, top_cuis=2)
    with pytest.raises(ValueError, match="different knobs"):
        kg.build_graph(sf_dir, out, top_cuis=3)
