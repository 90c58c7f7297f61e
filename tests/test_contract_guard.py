"""Conv-local shard contract guard: a non-clustered layout must fail LOUDLY
(distinct.ContractError) — never silently inflate per-group distincts — and
the dispatching operators must fall back to the layout-independent path and
still produce exact results (VERDICT r2 item #1)."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from medknowledgegraph_ray import config
from medknowledgegraph_ray.stages import abbrev, assemble, distinct, mentions


def _write_shards(tmp_path, frames):
    paths = []
    for i, df in enumerate(frames):
        p = os.path.join(tmp_path, f"shard_{i:03d}.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), p)
        paths.append(p)
    # one block per shard file: within-block non-contiguity is harmless
    # (per-block Arrow group_by dedups regardless), the guard's job is
    # exactly the CROSS-block splits
    return rd.read_parquet(paths, override_num_blocks=len(paths))


def _turns(conv, idxs, text="alpha"):
    return pd.DataFrame(
        {
            "conv_id": [conv] * len(idxs),
            "turn_idx": pd.array(idxs, dtype="int32"),
            "text": [f"{text} {conv} t{i}" for i in idxs],
        }
    )


def test_boundary_violation_raises(tmp_path):
    # conv A's rows recur in TWO non-adjacent stream positions (split files)
    ds = _write_shards(
        str(tmp_path),
        [
            pd.concat([_turns("A", [0, 1]), _turns("B", [0, 1])]),
            pd.concat([_turns("A", [2, 3]), _turns("B", [2, 3])]),
        ],
    )
    with pytest.raises(distinct.ContractError):
        distinct.group_local_distinct(ds, ["conv_id"], "conv_id")


def test_interior_violation_caught_by_sketch(tmp_path):
    # conv X sits strictly INTERIOR to two different blocks — invisible to
    # the first/last boundary check, caught by the interior KMV sketch
    ds = _write_shards(
        str(tmp_path),
        [
            pd.concat([_turns("A", [0]), _turns("X", [0]), _turns("B", [0])]),
            pd.concat([_turns("C", [0]), _turns("X", [1]), _turns("D", [0])]),
        ],
    )
    with pytest.raises(distinct.ContractError):
        distinct.group_local_distinct(ds, ["conv_id"], "conv_id")


def test_interior_boundary_collision_caught(tmp_path):
    # conv X interior to block 0 AND the boundary of block 1
    ds = _write_shards(
        str(tmp_path),
        [
            pd.concat([_turns("A", [0]), _turns("X", [0]), _turns("B", [0])]),
            pd.concat([_turns("X", [1]), _turns("C", [0])]),
        ],
    )
    with pytest.raises(distinct.ContractError):
        distinct.group_local_distinct(ds, ["conv_id"], "conv_id")


def test_legit_bridge_passes(tmp_path):
    # conv B straddles ADJACENT files — allowed by the contract, repaired
    ds = _write_shards(
        str(tmp_path),
        [
            pd.concat([_turns("A", [0, 1]), _turns("B", [0, 1])]),
            pd.concat([_turns("B", [2, 3]), _turns("C", [0, 1])]),
        ],
    )
    out = distinct.group_local_distinct(ds, ["conv_id"], "conv_id")
    assert sorted(r["conv_id"] for r in out.take_all()) == ["A", "B", "C"]


def test_conv_entities_falls_back_and_is_exact(tmp_path):
    # dispatcher path: shuffled mention layout → warning + exact fallback
    ds = _write_shards(
        str(tmp_path),
        [
            pd.DataFrame(
                {"conv_id": ["A", "B"], "norm_surface": ["s1", "s1"], "label": ["L", "L"]}
            ),
            pd.DataFrame(
                {"conv_id": ["A", "B"], "norm_surface": ["s1", "s2"], "label": ["L", "L"]}
            ),
        ],
    )
    assert config.CONV_LOCAL_SHARDS  # test exercises the guarded default
    with pytest.warns(UserWarning, match="contract violated"):
        out = mentions.conv_entities(ds).take_all()
    got = sorted((r["conv_id"], r["norm_surface"]) for r in out)
    assert got == [("A", "s1"), ("B", "s1"), ("B", "s2")]


def test_conversations_falls_back_and_is_exact(tmp_path):
    ds = _write_shards(
        str(tmp_path),
        [
            pd.concat([_turns("A", [0, 1]), _turns("B", [0, 1])]),
            pd.concat([_turns("A", [2]), _turns("B", [2])]),
        ],
    )
    with pytest.warns(UserWarning, match="contract violated"):
        rows = {r["conv_id"]: r for r in assemble.conversations(ds).take_all()}
    assert rows["A"]["n_turns"] == 3
    assert rows["A"]["text"].split(" t")[0].startswith("alpha A")
    # stable (conv_id, turn_idx) join order survives the fallback
    assert rows["A"]["text"] == " ".join(f"alpha A t{i}" for i in range(3))
    assert rows["B"]["n_turns"] == 3


def test_resolved_mentions_falls_back(tmp_path):
    vocab = pa.table(
        {"alias": ["xelorvan syndrome"], "sem_label": ["DISEASE"]}
    )
    # definition in one file, usage of the SF in a NON-adjacent fragment of
    # the same conversation: the conv-local pass alone would miss/split it
    d1 = pd.DataFrame(
        {
            "conv_id": ["A", "B"],
            "turn_idx": pd.array([0, 0], dtype="int32"),
            "text": ["we saw xelorvan syndrome (xs) today", "filler b"],
        }
    )
    d2 = pd.DataFrame(
        {
            "conv_id": ["A", "B"],
            "turn_idx": pd.array([1, 1], dtype="int32"),
            "text": ["the xs progressed", "more filler"],
        }
    )
    ds = _write_shards(str(tmp_path), [d1, d2])
    with pytest.warns(UserWarning, match="contract violated"):
        rows = abbrev.resolved_mentions(ds, vocab).take_all()
    got = sorted((r["conv_id"], r["turn_idx"], r["norm_surface"]) for r in rows)
    assert got == [
        ("A", 0, "xelorvan syndrome"),
        ("A", 1, "xelorvan syndrome"),
    ]


def test_clustered_corpus_passes_guard(sf_dir):
    # the real datagen layout satisfies the contract: no warning, no raise
    import warnings

    from medknowledgegraph_ray.pipelines import kg

    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        n = kg.conv_entities(sf_dir).count()
    assert n > 0


def test_conv_local_off_parity(sf_dir, monkeypatch):
    """GRAFT_CONV_LOCAL=0 end-to-end: the sorted-exchange fallbacks must be
    row-identical to the conv-local paths on the clustered corpus."""
    from medknowledgegraph_ray.pipelines import kg

    def rowset(ds):
        return sorted(tuple(sorted(r.items())) for r in ds.take_all())

    on = {
        "ce": rowset(kg.conv_entities(sf_dir)),
        "conv": rowset(kg.conversations(sf_dir)),
        "res": rowset(kg.mentions_resolved(sf_dir)),
        "counts": rowset(kg.entity_counts(sf_dir)),
    }
    monkeypatch.setattr(config, "CONV_LOCAL_SHARDS", False)
    off = {
        "ce": rowset(kg.conv_entities(sf_dir)),
        "conv": rowset(kg.conversations(sf_dir)),
        "res": rowset(kg.mentions_resolved(sf_dir)),
        "counts": rowset(kg.entity_counts(sf_dir)),
    }
    assert on == off
