"""Exactness tests for the sort-based distributed distinct (block-edge
repair) and the salted grouped top-k — the two custom exchange shapes."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from medknowledgegraph_ray.stages import distinct, skew


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("nblocks", [1, 3, 7])
def test_distinct_matches_pandas(seed, nblocks):
    rng = np.random.RandomState(seed)
    n = 5000
    df = pd.DataFrame(
        {
            # few distinct values → many duplicates, guaranteed block-edge
            # collisions at every block split
            "a": rng.choice([f"k{i}" for i in range(40)], n),
            "b": rng.randint(0, 5, n).astype(str),
        }
    )
    ds = rd.from_pandas(df).repartition(nblocks)
    got = (
        distinct.distinct(ds, ["a", "b"])
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = (
        df.drop_duplicates()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_distinct_single_key_and_empty():
    df = pd.DataFrame({"a": ["x", "x", "y"]})
    got = sorted(distinct.distinct(rd.from_pandas(df), ["a"]).to_pandas()["a"])
    assert got == ["x", "y"]
    empty = rd.from_pandas(pd.DataFrame({"a": pd.array([], dtype="str")}))
    assert distinct.distinct(empty, ["a"]).count() == 0


def test_salted_topk_equals_unsalted():
    rng = np.random.RandomState(7)
    n = 2000
    df = pd.DataFrame(
        {
            "query_id": rng.randint(0, 3, n).astype("int64"),
            "vec_id": np.arange(n, dtype="int64"),
            "score": rng.rand(n).round(6),
        }
    )
    k = 5

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["score", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)

    got = (
        skew.salted_grouped_topk(rd.from_pandas(df).repartition(5), "query_id", "vec_id", pick)
        .to_pandas()
        .sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        df.groupby("query_id", group_keys=False)[df.columns.tolist()]
        .apply(pick)
        .sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    assert got.equals(want)


from hypothesis import given, settings, strategies as st
from medknowledgegraph_ray.stages import groupagg


@settings(max_examples=15, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from("abcde"), st.integers(0, 3), st.integers(-100, 100)),
        min_size=0, max_size=300,
    ),
    nblocks=st.integers(1, 5),
)
def test_grouped_agg_matches_pandas_property(rows, nblocks):
    df = pd.DataFrame(rows, columns=["k1", "k2", "v"])
    if df.empty:
        return
    ds = rd.from_pandas(df).repartition(nblocks)
    got = (
        groupagg.grouped_agg(
            ds, ["k1", "k2"],
            [("v", "sum", "v_sum"), ("v", "min", "v_min"), ("v", "count", "n")],
        )
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["k1", "k2"])
        .agg(v_sum=("v", "sum"), v_min=("v", "min"), n=("v", "count"))
        .reset_index()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    got = got[["k1", "k2", "v_sum", "v_min", "n"]].astype({"v_sum": "int64", "v_min": "int64", "n": "int64"})
    want = want.astype({"v_sum": "int64", "v_min": "int64", "n": "int64"})
    assert got.equals(want), (got, want)
