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
