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
