"""TableSpec validation — ports the reference's NodeTable tests
(/root/reference/tests/unittests/test_nodetable.py:7-121 semantics)."""

import pyarrow as pa
import pytest

from medknowledgegraph_ray.schemas import TableSpec, TableSpecError


@pytest.fixture
def gene_spec():
    return TableSpec("genes", "Gene", "gene", "source")


def _gene_table(**over):
    cols = {
        "source": ["C0031485", "C0268465"],
        "node_label": ["Gene", "Gene"],
        "gene": ["PAH", "QDPR"],
    }
    cols.update(over)
    return pa.table(cols)


def test_valid_table_passes(gene_spec):
    gene_spec.validate(_gene_table())


def test_missing_column_raises(gene_spec):
    t = _gene_table().drop_columns(["gene"])
    with pytest.raises(TableSpecError, match="missing required columns"):
        gene_spec.validate(t)


def test_wrong_label_raises(gene_spec):
    with pytest.raises(TableSpecError, match="node_label outside"):
        gene_spec.validate(_gene_table(node_label=["Gene", "Protein"]))


def test_illegal_column_name_raises():
    spec = TableSpec("bad", "Gene", "gene", "source", ("ill-egal",))
    t = _gene_table(**{"ill-egal": ["x", "y"]})
    with pytest.raises(TableSpecError, match="illegal column names"):
        spec.validate(t)


def test_incomplete_meta_raises():
    with pytest.raises(TableSpecError):
        TableSpec("", "Gene", "gene", "source")
    with pytest.raises(TableSpecError):
        TableSpec("genes", "", "gene", "source")


def test_multi_label_spec_accepts_both():
    spec = TableSpec("entities", ("DISEASE", "CHEMICAL"), "norm_surface", "source")
    t = pa.table(
        {
            "source": ["c1", "c2"],
            "node_label": ["DISEASE", "CHEMICAL"],
            "norm_surface": ["a", "b"],
        }
    )
    spec.validate(t)


def test_read_any_csv_jsonl_parquet_roundtrip(sf_dir, tmp_path):
    import json as _json

    import pandas as pd

    from medknowledgegraph_ray.sources import readers

    src = readers.read_table(sf_dir, "events", columns=["event_id", "user_id", "value"])
    df = src.to_pandas().sort_values("event_id").reset_index(drop=True).head(500)
    csv_p = str(tmp_path / "ev.csv")
    jsonl_p = str(tmp_path / "ev.jsonl")
    df.to_csv(csv_p, index=False)
    with open(jsonl_p, "w") as f:
        for r in df.to_dict("records"):
            f.write(_json.dumps(r) + "\n")
    for path in (csv_p, jsonl_p):
        got = (
            readers.read_any(path, columns=["event_id", "user_id", "value"])
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        )
        got = got.astype({"event_id": "int64", "user_id": "int64", "value": "float64"})
        assert got.equals(df), path
    pq_got = (
        readers.read_any(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "value"])
        .to_pandas().sort_values("event_id").reset_index(drop=True).head(500)
    )
    assert pq_got.equals(df)
