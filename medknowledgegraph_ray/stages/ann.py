"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
`ray.put` and every batch does one numpy matmul against it; a per-batch
partial top-k is emitted so the final exact merge sees only
O(k × blocks × queries) rows, never the corpus.  Scale path: the same
matmul within LSH hyperplane buckets (HyperplaneBucketer below) —
queries probe only their own bucket(s).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from .. import config


def _merged_topk(partials: rd.Dataset, pick, pick_and_rank) -> rd.Dataset:
    """Exact salted two-phase top-k merge, schema-safe for EMPTY partials:
    an all-empty merge loses its Ray schema entirely (no blocks survive),
    so the typed empty top-k table is returned instead — the result is
    query-scale small (≤ k × queries rows), so pinning it is free."""
    import pyarrow as pa

    from .skew import salted_grouped_topk

    out = salted_grouped_topk(
        partials, "query_id", "vec_id", pick, final=pick_and_rank
    ).materialize()
    # count, not schema(): Ray's to_pandas() on a 0-row dataset returns a
    # COLUMN-LESS frame even when the dataset still reports a schema
    if out.count() == 0:
        return rd.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int64()),
        }))
    return out


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceScorer:
    """Per-batch cosine scores + local top-k against a broadcast query matrix.

    The instance ships with each task holding only the ObjectRef; the query
    matrix itself is resolved lazily from plasma (zero-copy, once per
    worker) so a large matrix is broadcast, never serialized per task."""

    def __init__(self, queries_ref, k: int):
        self._queries_ref = queries_ref
        self.k = k
        self.query_ids = None
        self.qm = None

    def _ensure(self):
        if self.qm is None:
            q = self._queries_ref
            if isinstance(q, ray.ObjectRef):
                q = ray.get(q)
            self.query_ids = np.asarray(q["query_id"], dtype=np.int64)
            self.qm = _unit(np.asarray(q["matrix"], dtype=np.float64))  # (nq, dim)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        self._ensure()
        vec_ids = batch["vec_id"].to_numpy().astype(np.int64)
        m = _unit(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = self.qm @ m.T  # (nq, batch)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            # the partial must be a restriction of the SAME total order the
            # final merge uses — (score rounded to 6 desc, vec_id asc) — or a
            # sub-1e-6 near-tie at a block's k-boundary makes the result
            # partition-dependent
            r = np.round(sims[qi], 6)
            idx = np.lexsort((vec_ids, -r))[:k]
            out_q.append(np.full(k, self.query_ids[qi]))
            out_v.append(vec_ids[idx])
            out_s.append(sims[qi][idx])
        return pd.DataFrame(
            {
                "query_id": pd.array(np.concatenate(out_q), dtype="int64"),
                "vec_id": pd.array(np.concatenate(out_v), dtype="int64"),
                "score": np.concatenate(out_s),
            }
        )


def brute_force_topk(
    embeddings: rd.Dataset, queries: dict, k: int = 10
) -> rd.Dataset:
    """Exact global top-k per query: per-batch partial top-k, then one tiny
    final merge.  `queries` = {"query_id": [...], "matrix": [[...], ...]}.

    Ties broken (score desc, vec_id asc); scores rounded to 6 so the result
    is float-stable against the DuckDB list_cosine_similarity oracle."""
    qref = ray.put(queries)
    partials = embeddings.map_batches(
        BruteForceScorer(queries_ref=qref, k=k),
        batch_format="pandas",
        batch_size=4096,
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score"] = g["score"].round(6)
        return g.sort_values(
            ["score", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)

    def pick_and_rank(g: pd.DataFrame) -> pd.DataFrame:
        g = pick(g)
        g["rank"] = pd.array(range(1, len(g) + 1), dtype="int64")
        return g

    # salted two-phase merge: at corpus scale the per-query partial set is
    # k × #blocks rows — one reducer per query melts without the salt
    return _merged_topk(partials, pick, pick_and_rank)


class HyperplaneBucketer:
    """Seeded random-hyperplane sign bucket for embeddings (single-band
    coarse LSH — each vector lands in exactly one of 2^n_planes buckets).
    The near-dup join uses the multi-band dedupe.HyperplaneBander instead;
    this single-bucket shape fits query routing (lsh_topk), where a vector
    must live in one routable partition."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 11):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(dim, n_planes))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(batch["embedding"].to_numpy())
        unit = _unit(vecs)
        signs = (unit @ self.planes) >= 0
        bucket = signs @ (1 << np.arange(signs.shape[1]))
        return pd.DataFrame({
            "vec_id": batch["vec_id"].astype("int64"),
            "bucket": pd.array(bucket, dtype="int64"),
            "embedding": list(unit.astype(np.float64)),
        })


def lsh_topk(embeddings: rd.Dataset, queries: dict, k: int = 10, n_planes: int = 4) -> rd.Dataset:
    """Approximate top-k: corpus and queries hashed by the same seeded
    hyperplanes; each query scores only its bucket.  Recall < 1 by design —
    rows-only checked; the brute-force path is the correctness baseline.

    STREAMING shape (no `groupby(bucket).map_groups` — a whole bucket is
    corpus/2^n_planes rows, an unbounded single-group materialization at
    100 TB): each batch computes its vectors' buckets, scores only the
    rows whose bucket holds a query (a broadcast-tiny bucket→queries map)
    against just those queries, and emits a per-batch partial top-k; the
    exact salted two-phase merge then reduces O(k × blocks × queries)
    rows — the brute-force shape, restricted to bucket-matched pairs, so
    results are identical to the whole-bucket formulation."""
    qm = _unit(np.asarray(queries["matrix"], dtype=np.float64))
    dim = qm.shape[1]
    bucketer = HyperplaneBucketer(dim, n_planes=n_planes)
    q_buckets = ((qm @ bucketer.planes) >= 0) @ (1 << np.arange(n_planes))
    by_bucket: dict[int, np.ndarray] = {}
    for qi, b in enumerate(q_buckets):
        by_bucket.setdefault(int(b), []).append(qi)
    by_bucket = {b: np.asarray(qis, dtype=np.int64) for b, qis in by_bucket.items()}
    query_ids = np.asarray(queries["query_id"], dtype=np.int64)
    planes = bucketer.planes
    pow2 = 1 << np.arange(n_planes)

    def score_batch(batch: pd.DataFrame) -> "pa.Table":
        # ARROW output: a batch whose buckets hold no query emits a TYPED
        # empty table (an all-empty pandas lineage loses its schema through
        # Ray entirely, crashing the downstream grouped merge)
        import pyarrow as pa

        ids = batch["vec_id"].to_numpy().astype(np.int64)
        m = _unit(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        buckets = ((m @ planes) >= 0) @ pow2
        out_q, out_v, out_s = [], [], []
        for b in np.unique(buckets):
            qis = by_bucket.get(int(b))
            if qis is None:
                continue
            mask = buckets == b
            sub_ids = ids[mask]
            sims = qm[qis] @ m[mask].T  # (len(qis), rows-in-bucket)
            kk = min(k, sims.shape[1])
            for row, qi in enumerate(qis):
                r = np.round(sims[row], 6)
                idx = np.lexsort((sub_ids, -r))[:kk]
                out_q.append(np.full(kk, query_ids[qi]))
                out_v.append(sub_ids[idx])
                out_s.append(sims[row][idx])
        if not out_q:
            return pa.table({
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
            })
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "score": pa.array(np.concatenate(out_s), pa.float64()),
        })

    partials = embeddings.map_batches(score_batch, batch_format="pandas", batch_size=4096)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score"] = g["score"].round(6)
        return g.sort_values(
            ["score", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(k)

    def pick_and_rank(g: pd.DataFrame) -> pd.DataFrame:
        g = pick(g)
        g["rank"] = pd.array(range(1, len(g) + 1), dtype="int64")
        return g

    return _merged_topk(partials, pick, pick_and_rank)


class HashingEmbedder:
    """Feature-extract stage: text → deterministic dense vector via the
    hashing trick (token md5 → bucket, ±1 sign bit, L2-normalized).  A real
    model swaps in here (load in __init__, batch-infer in __call__) — this
    implementation is itself real and process-independent, so doc→embedding
    →ANN pipelines run end-to-end without a model download."""

    def __init__(self, dim: int = 64):
        import re

        self.dim = dim
        self.token_re = re.compile(r"[a-z0-9]+")
        self._cache: dict[str, tuple[int, int]] = {}

    def _slot(self, tok: str) -> tuple[int, int]:
        s = self._cache.get(tok)
        if s is None:
            import hashlib

            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            s = (h % self.dim, 1 if (h >> 63) & 1 else -1)
            self._cache[tok] = s
        return s

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vecs = []
        for text in batch["text"].fillna(""):
            v = np.zeros(self.dim, dtype=np.float64)
            for tok in self.token_re.findall(text.lower()):
                slot, sign = self._slot(tok)
                v[slot] += sign
            n = np.linalg.norm(v)
            vecs.append((v / n if n else v).tolist())
        return pd.DataFrame({"doc_id": batch["doc_id"].astype("int64"), "embedding": vecs})


def embed_texts(docs: rd.Dataset, dim: int = 64) -> rd.Dataset:
    return docs.map_batches(
        HashingEmbedder(dim=dim), batch_format="pandas", batch_size=2048,
    )


def _kmeans_fit(sample: np.ndarray, n_clusters: int, iters: int = 3, seed: int = 13) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means on a driver-side sample (unit
    vectors, cosine ≙ dot).  Seeded init, fixed iteration count — stable
    across processes."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cents = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n:
                    cents[c] = v / n
    return cents


def _train_quantizer(embeddings: rd.Dataset, n_clusters: int, sample_pct: int) -> np.ndarray:
    """Seeded k-means centroids from a driver-side deterministic hash sample
    (Knuth multiplicative on vec_id — partition-independent).  Bounded by
    sample_pct × corpus — at 100 TB use a fixed-size reservoir instead (the
    quantizer needs ~100× n_clusters points, not a corpus fraction)."""

    def sample_batch(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy().astype(np.uint64)
        keep = ((ids * np.uint64(2654435761)) % np.uint64(1 << 32)) % np.uint64(100) < sample_pct
        return df[keep]

    sample_rows = sorted(
        embeddings.map_batches(sample_batch, batch_format="pandas").take_all(),
        key=lambda r: r["vec_id"],  # block arrival order is not deterministic
    )
    if not sample_rows:
        # tiny corpus / unlucky id distribution: no id passed the hash gate —
        # train on the first rows instead of crashing (quantizer just needs
        # SOME points; recall is approximate by design either way)
        sample_rows = embeddings.limit(max(8 * n_clusters, 64)).take_all()
    sample = _unit(np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in sample_rows]))
    return _kmeans_fit(sample, n_clusters)


def kmeans_clusters(
    embeddings: rd.Dataset, n_clusters: int = 16, sample_pct: int = 20
) -> rd.Dataset:
    """Corpus clustering (topic/bucket assignment): seeded Lloyd's k-means
    trained on a deterministic driver-side sample, then ONE vectorized
    assignment pass over the stream — the iterative algorithm runs on the
    bounded sample, the corpus-scale work is map-only (no shuffle).

    Output: vec_id, cluster_id, sim (cosine to the centroid, rounded to 6
    decimals).  Deterministic across runs and partitionings (seeded init,
    fixed iterations, hash sample); rows-only checked — tests assert
    determinism and that every vector lands on its true nearest centroid."""
    cents = _train_quantizer(embeddings, n_clusters, sample_pct)

    class Assigner:
        def __init__(self, cents: np.ndarray):
            self.cents = cents

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vecs = _unit(np.stack(batch["embedding"].to_numpy()))
            sims = vecs @ self.cents.T
            assign = np.argmax(sims, axis=1)
            return pd.DataFrame(
                {
                    "vec_id": batch["vec_id"].astype("int64"),
                    "cluster_id": pd.array(assign, dtype="int64"),
                    "sim": np.round(sims[np.arange(len(assign)), assign], 6),
                }
            )

    return embeddings.map_batches(Assigner(cents), batch_format="pandas", batch_size=4096)


def ivf_topk(
    embeddings: rd.Dataset,
    queries: dict,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    sample_pct: int = 20,
) -> rd.Dataset:
    """IVF approximate top-k — the scale path beyond brute force.

    1. TRAIN: a deterministic hash sample of the corpus (Knuth multiplicative
       on vec_id — partition-independent) is pulled to the driver and
       clustered with seeded k-means (the coarse quantizer).
    2. ASSIGN: one map_batches pass tags every vector with its nearest
       centroid (vectorized matmul; centroids broadcast via the instance).
    3. PROBE: each query scores ONLY vectors whose centroid is among its
       `nprobe` nearest — a per-batch mask + partial top-k, merged exactly
       like brute_force_topk.  Scored work drops by ~n_clusters/nprobe;
       recall < 1 by design (rows-only checked; brute force is the
       correctness baseline)."""
    qm = _unit(np.asarray(queries["matrix"], dtype=np.float64))
    query_ids = np.asarray(queries["query_id"], dtype=np.int64)

    cents = _train_quantizer(embeddings, n_clusters, sample_pct)

    probe = np.argsort(-(qm @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)

    class IVFScorer:
        def __init__(self, cents, probe, qm, query_ids, k):
            self.cents, self.probe, self.qm, self.query_ids, self.k = cents, probe, qm, query_ids, k

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            vec_ids = batch["vec_id"].to_numpy().astype(np.int64)
            m = _unit(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
            assign = np.argmax(m @ self.cents.T, axis=1)
            out_q, out_v, out_s = [], [], []
            for qi in range(len(self.qm)):
                mask = np.isin(assign, self.probe[qi])
                if not mask.any():
                    continue
                sims = self.qm[qi] @ m[mask].T
                ids = vec_ids[mask]
                kk = min(self.k, len(ids))
                idx = np.lexsort((ids, -np.round(sims, 6)))[:kk]
                out_q.append(np.full(kk, self.query_ids[qi]))
                out_v.append(ids[idx])
                out_s.append(sims[idx])
            if not out_q:
                return pd.DataFrame({"query_id": pd.array([], dtype="int64"),
                                     "vec_id": pd.array([], dtype="int64"),
                                     "score": pd.array([], dtype="float64")})
            return pd.DataFrame({
                "query_id": pd.array(np.concatenate(out_q), dtype="int64"),
                "vec_id": pd.array(np.concatenate(out_v), dtype="int64"),
                "score": np.concatenate(out_s),
            })

    partials = embeddings.map_batches(
        IVFScorer(cents, probe, qm, query_ids, k), batch_format="pandas", batch_size=4096,
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["score"] = g["score"].round(6)
        return g.sort_values(["score", "vec_id"], ascending=[False, True],
                             kind="mergesort").head(k)

    def pick_and_rank(g: pd.DataFrame) -> pd.DataFrame:
        g = pick(g)
        g["rank"] = pd.array(range(1, len(g) + 1), dtype="int64")
        return g

    return _merged_topk(partials, pick, pick_and_rank)


def fixed_queries(dim: int, n: int = 3, seed: int = 5) -> dict:
    """Deterministic query matrix for benchmarks/oracles."""
    rng = np.random.RandomState(seed)
    return {
        "query_id": list(range(n)),
        "matrix": rng.normal(size=(n, dim)).round(4).tolist(),
    }


def dim_stats(embeddings: rd.Dataset) -> rd.Dataset:
    """Per-dimension corpus moments of the embedding column — the feature
    normalization / whitening statistics pass (mean/variance per dim feeds
    standardization before clustering or ANN indexing).

    Columnar vector reduction: each batch stacks its list<float32> column
    into one (rows × dim) float64 matrix, quantizes at 2^20 (multiplying
    by a power of two is EXACT in float64, so the only rounding is the
    final half-even — bit-identical to DuckDB round_even), and emits ONE
    partial row per dimension (dim, n, Σq, Σq²) via two axis-0 integer
    sums.  The exchange that follows is over #blocks × dim tiny rows —
    grouped_agg's partial/combine never sees the vectors themselves, so at
    100 TB the all-to-all moves kilobytes per block.  Sums are exact
    int64 (|q| ≲ 2^21 ⇒ q² ≲ 2^42 ⇒ ~2^21 rows/batch headroom per
    partial; the combine adds pre-reduced per-block sums)."""
    from .groupagg import grouped_agg

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "dim": pd.array([], dtype="int64"),
                    "n": pd.array([], dtype="int64"),
                    "s1_q": pd.array([], dtype="int64"),
                    "s2_q": pd.array([], dtype="int64"),
                }
            )
        m = np.stack([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        q = np.round(m * 1048576.0).astype(np.int64)
        return pd.DataFrame(
            {
                "dim": pd.array(np.arange(1, q.shape[1] + 1), dtype="int64"),
                "n": pd.array(np.full(q.shape[1], q.shape[0]), dtype="int64"),
                "s1_q": pd.array(q.sum(axis=0), dtype="int64"),
                "s2_q": pd.array((q * q).sum(axis=0), dtype="int64"),
            }
        )

    partials = embeddings.select_columns(["embedding"]).map_batches(
        partial, batch_format="pandas", batch_size=None
    )
    agg = grouped_agg(
        partials,
        ["dim"],
        [("n", "sum", "n"), ("s1_q", "sum", "s1_q"), ("s2_q", "sum", "s2_q")],
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy().astype(np.float64)
        s1 = b["s1_q"].to_numpy().astype(np.float64)
        s2 = b["s2_q"].to_numpy().astype(np.float64)
        # mirrored float64 op order with the oracle: s1/n, then the
        # two-pass sample variance (s2 − s1·s1/n)/(n−1), rounded half-even
        mean_q = np.round(s1 / n, 6)
        var_q = np.round((s2 - s1 * s1 / n) / (n - 1), 0)
        out = b[["dim", "n", "s1_q", "s2_q"]].copy()
        out["mean_q"] = mean_q
        out["var_q"] = pd.array(var_q.astype(np.int64), dtype="int64")
        return out

    return agg.map_batches(finish, batch_format="pandas")


def normalize_vectors(embeddings: rd.Dataset) -> rd.Dataset:
    """L2 unit-normalization of the embedding column in long form
    (vec_id, dim, val_e6) — the prep pass cosine ANN / clustering assumes
    (after it, cosine IS the dot product).

    Map-only and order-invariant: components quantize at 2^20 (a
    power-of-two scale is EXACT in float64, so the only rounding is the
    half-even quantize — the dim_stats convention), each row's squared
    norm is an exact int64 sum, and val_e6 = round_even(q/√ss · 1e6) where
    sqrt is IEEE-correctly-rounded and the division/multiply mirror the
    SQL oracle's parenthesization bit for bit.  No summation-order
    dependence ever reaches a float.  Zero vectors emit all-zero
    components (CASE-mirrored in the oracle)."""

    def norm(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "vec_id": pd.array([], dtype="int64"),
                    "dim": pd.array([], dtype="int64"),
                    "val_e6": pd.array([], dtype="int64"),
                }
            )
        m = np.stack([np.asarray(v, dtype=np.float64) for v in b["embedding"]])
        q = np.round(m * 1048576.0).astype(np.int64)
        ss = (q * q).sum(axis=1)
        d = q.shape[1]
        nrm = np.sqrt(ss.astype(np.float64))
        with np.errstate(divide="ignore", invalid="ignore"):
            val = np.round((q / nrm[:, None]) * 1000000.0)
        val = np.where(ss[:, None] == 0, 0.0, val).astype(np.int64)
        return pd.DataFrame(
            {
                "vec_id": pd.array(
                    np.repeat(b["vec_id"].to_numpy().astype(np.int64), d),
                    dtype="int64",
                ),
                "dim": pd.array(
                    np.tile(np.arange(1, d + 1, dtype=np.int64), len(b)),
                    dtype="int64",
                ),
                "val_e6": pd.array(val.ravel(), dtype="int64"),
            }
        )

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        norm, batch_format="pandas", batch_size=None
    )


def embedding_gram(embeddings: rd.Dataset, dim: int = 64) -> rd.Dataset:
    """Exact integer Gram matrix of the corpus embedding matrix — the
    covariance/PCA-whitening primitive: for every dimension pair i ≤ j
    (1-based), gram_e6 = Σ_rows v_e3[i]·v_e3[j] over components quantized
    to e-3 fixed point.  One (dim·(dim+1)/2)-row result regardless of
    corpus size.

    Scale shape: ONE streaming pass — each block contributes a dim×dim
    int64 partial (a single X'X matmul per batch, never per row), emitted
    as upper-triangle rows into the algebraic grouped_agg exchange whose
    key space is the dim² DOMAIN.  The e-3 quantization keeps every
    partial AND the global sum exact int64 (|q| ≤ ~2¹⁰ ⇒ row products
    ≤ ~2²⁰ ⇒ a 10¹²-row corpus sums to ≈ 1e18 < 2⁶³ — the user_moments
    bound argument)."""
    from .groupagg import grouped_agg

    iu = np.triu_indices(dim)
    ii = (iu[0] + 1).astype(np.int64)
    jj = (iu[1] + 1).astype(np.int64)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({
                "i": pd.array([], dtype="int64"),
                "j": pd.array([], dtype="int64"),
                "gram_q": pd.array([], dtype="int64"),
            })
        x = np.stack(
            [np.asarray(v, dtype=np.float64) for v in b["embedding"]]
        )
        if x.shape[1] != dim:
            raise ValueError(
                f"embedding_gram: expected dim {dim}, got {x.shape[1]}"
            )
        q = np.round(x * 1024).astype(np.int64)
        g = q.T @ q  # int64 matmul, dim² × block_rows
        return pd.DataFrame({
            "i": pd.array(ii, dtype="int64"),
            "j": pd.array(jj, dtype="int64"),
            "gram_q": pd.array(g[iu], dtype="int64"),
        })

    rows = embeddings.select_columns(["embedding"]).map_batches(
        partial, batch_format="pandas", batch_size=None
    )
    return grouped_agg(rows, ["i", "j"], [("gram_q", "sum", "gram_q")])
