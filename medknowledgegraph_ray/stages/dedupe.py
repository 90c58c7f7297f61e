"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference's dedup is exact-only (drop_duplicates / Cypher MERGE,
SURVEY.md §2.7); these add the near-dup machinery a 100 TB training-data
pipeline needs.  Shapes:

- exact: content-hash per batch (vectorized md5, shared with DuckDB's
  md5()), then keep min(doc_id) per hash — a hash-partitioned groupby.
- MinHash+LSH: shingle → k minhashes → band buckets → groupby bucket →
  candidate pairs → verified Jaccard.  All hashes md5-derived →
  process-independent determinism.
- SimHash: 64-bit token-hash majority vote; near-dups = identical simhash
  (bucket groupby), Hamming-checked.
- n-gram Jaccard: exact pairwise verify inside LSH buckets only (never
  all-pairs across the corpus).
- embedding cosine: unit-normalize → coarse LSH bucket (random-hyperplane
  signs, seeded) → within-bucket pairwise cosine ≥ threshold.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .. import config

_WORD = re.compile(r"[a-z0-9]+")


def _md5_u64(data: bytes) -> int:
    return int.from_bytes(hashlib.md5(data).digest()[:8], "big")


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(docs: rd.Dataset) -> rd.Dataset:
    """One surviving doc_id per distinct text: (text_hash, keep=min(doc_id)).

    Oracle SQL: SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
    count(*) AS n_dups FROM documents GROUP BY 1.
    """

    def hash_batch(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "text_hash": [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].fillna("")],
                "doc_id": batch["doc_id"].astype("int64"),
            }
        )

    hashed = docs.map_batches(hash_batch, batch_format="pandas")

    # sorted-exchange grouped aggregation: at corpus scale the group count
    # equals the distinct-document count, where Ray's per-group aggregate
    # reduce melts (see stages/groupagg.py)
    from .groupagg import grouped_agg

    return grouped_agg(
        hashed,
        ["text_hash"],
        [("doc_id", "min", "keep_doc_id"), ("doc_id", "count", "n_dups")],
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """k-permutation MinHash over word w-shingles; emits one row per band:
    (band_id, band_hash, doc_id) — ready for the LSH bucket groupby."""

    def __init__(self, num_hashes: int = 64, shingle_w: int = 3, bands: int = 16):
        assert num_hashes % bands == 0
        self.k = num_hashes
        self.w = shingle_w
        self.bands = bands
        self.rows_per_band = num_hashes // bands
        rng = np.random.RandomState(7)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_hashes, dtype=np.uint64) | 1
        self.b = rng.randint(0, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)

    def signature(self, text: str) -> np.ndarray | None:
        toks = _WORD.findall(text.lower())
        if len(toks) < self.w:
            return None
        shingles = {" ".join(toks[i : i + self.w]) for i in range(len(toks) - self.w + 1)}
        base = np.fromiter(
            (_md5_u64(s.encode()) for s in shingles), dtype=np.uint64, count=len(shingles)
        )
        # vectorized k permutations over the shingle set
        vals = (np.outer(self.a, base) + self.b[:, None]) & np.uint64((1 << 61) - 1)
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        band_ids, band_hashes, doc_ids = [], [], []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            sig = self.signature(text)
            if sig is None:
                continue
            for band in range(self.bands):
                chunk = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                band_ids.append(band)
                band_hashes.append(_md5_u64(chunk.tobytes()))
                doc_ids.append(doc_id)
        return pd.DataFrame(
            {
                "band_id": pd.array(band_ids, dtype="int32"),
                "band_hash": pd.array(np.array(band_hashes, dtype=np.uint64).astype(np.int64)),
                "doc_id": pd.array(doc_ids, dtype="int64"),
            }
        )


# Degenerate-bucket guard: a bucket shared by B docs emits B(B-1)/2 pairs —
# a boilerplate-text bucket at corpus scale is O(n²) skew on one reducer.
# Buckets past the cap fail LOUDLY (no silent truncation, SURVEY §7.4): the
# operator's contract is that such text should be exact-deduped or
# stopworded upstream first.
MAX_BUCKET = 10_000


def _pairs_from_buckets(g: pd.DataFrame) -> pd.DataFrame:
    ids = sorted(set(g["doc_id"]))
    if len(ids) > MAX_BUCKET:
        raise ValueError(
            f"LSH bucket with {len(ids)} docs exceeds MAX_BUCKET={MAX_BUCKET}; "
            "run exact dedup / boilerplate stripping before MinHash"
        )
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pd.DataFrame({"doc_a": pd.array(a, dtype="int64"), "doc_b": pd.array(b, dtype="int64")})


def minhash_candidates(docs: rd.Dataset, **kw) -> rd.Dataset:
    """LSH candidate pairs: docs sharing any band bucket (distinct pairs).

    Bucket grouping uses the sorted-runs shape (stages/distinct.py): after
    sorting by (band_id, band_hash), each bucket is a contiguous run; pairs
    for runs strictly inside a block are emitted vectorized, and only the
    first/last run of each block (which may continue in a neighbor block)
    goes through a per-group pass — `groupby(bucket).map_groups` would cost
    one Python call per (doc × band) bucket, ~80k at 5k docs."""
    bands = docs.map_batches(MinHasher, fn_constructor_kwargs=kw, batch_format="pandas",
                             batch_size=2048, concurrency=config.pool_size())
    s = bands.sort(["band_id", "band_hash", "doc_id"])

    def runs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_a": pd.array([], dtype="int64"),
                "doc_b": pd.array([], dtype="int64"),
                "band_id": pd.array([], dtype="int32"),
                "band_hash": pd.array([], dtype="int64"),
                "is_edge": pd.array([], dtype="bool"),
            }
        )
        n = len(df)
        if n == 0:
            return empty
        b = df["band_id"].to_numpy()
        h = df["band_hash"].to_numpy()
        d = df["doc_id"].to_numpy()
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = (b[1:] != b[:-1]) | (h[1:] != h[:-1])
        run_id = np.cumsum(new_run) - 1
        n_runs = run_id[-1] + 1
        out_a, out_b = [], []
        edge_rows = []
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], n)
        for r, (st, en) in enumerate(zip(starts, ends)):
            if r == 0 or r == n_runs - 1:  # may continue in a neighbor block
                edge_rows.append((st, en))
                continue
            if en - st < 2:
                continue
            ids = np.unique(d[st:en])
            if len(ids) > MAX_BUCKET:
                raise ValueError(
                    f"LSH bucket with {len(ids)} docs exceeds MAX_BUCKET={MAX_BUCKET}"
                )
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
        frames = []
        if out_a:
            frames.append(
                pd.DataFrame(
                    {
                        "doc_a": np.concatenate(out_a).astype("int64"),
                        "doc_b": np.concatenate(out_b).astype("int64"),
                        "band_id": pd.array([0] * len(np.concatenate(out_a)), dtype="int32"),
                        "band_hash": pd.array([0] * len(np.concatenate(out_a)), dtype="int64"),
                        "is_edge": pd.array([False] * len(np.concatenate(out_a)), dtype="bool"),
                    }
                )
            )
        for st, en in edge_rows:
            frames.append(
                pd.DataFrame(
                    {
                        "doc_a": d[st:en].astype("int64"),
                        "doc_b": pd.array([-1] * (en - st), dtype="int64"),
                        "band_id": b[st:en].astype("int32"),
                        "band_hash": h[st:en].astype("int64"),
                        "is_edge": pd.array([True] * (en - st), dtype="bool"),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True) if frames else empty

    flagged = s.map_batches(runs, batch_format="pandas").materialize()
    interior = flagged.filter(expr="is_edge == False").map_batches(
        lambda t: t[["doc_a", "doc_b"]], batch_format="pandas"
    )
    edge_pairs = (
        flagged.filter(expr="is_edge == True")
        .map_batches(lambda t: t.rename(columns={"doc_a": "doc_id"})[
            ["band_id", "band_hash", "doc_id"]], batch_format="pandas")
        .groupby(["band_id", "band_hash"])
        .map_groups(_pairs_from_buckets, batch_format="pandas")
    )
    # distinct pairs (a doc pair can collide in several bands) — vectorized
    from .distinct import distinct as _distinct

    return _distinct(interior.union(edge_pairs), ["doc_a", "doc_b"])


def _ngram_set(text: str, w: int = 3) -> set:
    toks = _WORD.findall(text.lower())
    return {" ".join(toks[i : i + w]) for i in range(max(0, len(toks) - w + 1))}


def minhash_dedup(docs: rd.Dataset, threshold: float = 0.8, **kw) -> rd.Dataset:
    """Verified near-dup pairs: candidates whose exact shingle Jaccard ≥
    threshold.

    Scale shape: the candidate PAIR set is small by LSH construction, so
    only docs that appear in some candidate pair are ever materialized —
    the corpus-wide text scan stays distributed (a broadcast semi-join
    filter inside map_batches), never `take_all` on the full input."""
    cands = minhash_candidates(docs, **kw).to_pandas()  # small by construction
    pair_list = list(zip(cands.get("doc_a", []), cands.get("doc_b", [])))
    if not pair_list:
        return rd.from_arrow(
            pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    cand_ids = sorted({d for p in pair_list for d in p})

    # distributed semi-join: stream the corpus, keep candidate docs only,
    # reduce each to its (hashed) shingle set — tiny result, safe to gather
    id_arr = pa.array(cand_ids, pa.int64())

    def shingle_rows(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["doc_id"].isin(cand_ids)
        sub = batch[keep]
        sets = [
            sorted({_md5_u64(s.encode()) for s in _ngram_set(t or "")})
            for t in sub["text"]
        ]
        return pd.DataFrame({"doc_id": sub["doc_id"].astype("int64"), "shingles": sets})

    gathered = {
        r["doc_id"]: set(r["shingles"])
        for r in docs.map_batches(shingle_rows, batch_format="pandas").take_all()
    }
    out = []
    for a, b in pair_list:
        sa, sb = gathered.get(a, set()), gathered.get(b, set())
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out.append((int(a), int(b), round(j, 6)))
    return rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([r[0] for r in out], pa.int64()),
                "doc_b": pa.array([r[1] for r in out], pa.int64()),
                "jaccard": pa.array([r[2] for r in out], pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over tokens (md5 token hashes, majority vote)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for text in batch["text"].fillna(""):
            toks = _WORD.findall(text.lower())
            if not toks:
                out.append(0)
                continue
            acc = np.zeros(64, dtype=np.int64)
            for tok in toks:
                h = _md5_u64(tok.encode())
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            sh = 0
            for i in range(64):
                if acc[i] > 0:
                    sh |= 1 << i
            out.append(np.int64(np.uint64(sh).astype(np.int64)))
        return pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"),
                             "simhash": pd.array(out, dtype="int64")})


def simhash_signatures(docs: rd.Dataset) -> rd.Dataset:
    return docs.map_batches(SimHasher, batch_format="pandas", batch_size=2048,
                            concurrency=config.pool_size())


def simhash_dup_groups(docs: rd.Dataset) -> rd.Dataset:
    """Exact-signature duplicate groups (Hamming-0 buckets): signatures with
    ≥2 docs.  At scale a banding scheme over 16-bit chunks extends this to
    Hamming ≤ 3; the bucket aggregation shape is identical.

    Pure algebraic aggregation (count + min per signature, filter ≥2) on
    the sorted exchange — group cardinality here is the distinct-signature
    count, i.e. corpus-scale, where per-group reducers melt."""
    from .groupagg import grouped_agg

    counted = grouped_agg(
        simhash_signatures(docs),
        ["simhash"],
        [("doc_id", "count", "n_docs"), ("doc_id", "min", "min_doc")],
    )
    return counted.filter(expr="n_docs >= 2")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

class HyperplaneBucketer:
    """Seeded random-hyperplane sign bucket for embeddings (LSH coarse pass)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 11):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(dim, n_planes))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch["embedding"].to_numpy())
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        signs = (unit @ self.planes) >= 0
        bucket = signs @ (1 << np.arange(signs.shape[1]))
        return pd.DataFrame({
            "vec_id": batch["vec_id"].astype("int64"),
            "bucket": pd.array(bucket, dtype="int64"),
            "embedding": list(unit.astype(np.float64)),
        })


def embedding_near_dups(embeddings: rd.Dataset, threshold: float = 0.95, dim: int | None = None) -> rd.Dataset:
    """Pairs with cosine ≥ threshold, found within hyperplane buckets.

    The coarse bucket groupby bounds pairwise work to within-bucket; recall
    can be raised with multiple rotations (repeat with different seeds)."""
    if dim is None:
        first = embeddings.take(1)[0]
        dim = len(first["embedding"])
    bucketed = embeddings.map_batches(
        HyperplaneBucketer, fn_constructor_kwargs={"dim": dim},
        batch_format="pandas", batch_size=4096, concurrency=config.pool_size(),
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"vec_a": pd.array([], dtype="int64"),
                                 "vec_b": pd.array([], dtype="int64"),
                                 "cosine": pd.array([], dtype="float64")})
        ids = g["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack(g["embedding"].to_numpy())[order]
        sims = m @ m.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame({
            "vec_a": pd.array(ids[ia[keep]], dtype="int64"),
            "vec_b": pd.array(ids[ib[keep]], dtype="int64"),
            "cosine": np.round(sims[ia, ib][keep], 6),
        })

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pandas")
