"""TF-IDF scoring with per-document top-k terms.

The lexical-weighting staple of a training-data / retrieval pipeline
(keyword extraction, quality filtering, BM25 precursors).  Scale shape:

- TF is exact per map task (a document is one row — its term counts never
  cross a batch), emitting (doc_id, tok, tf) with one row per distinct
  doc-term;
- DF is a grouped count over those rows — groupagg.grouped_agg, the
  per-block-partial sorted exchange (never per-group Python);
- the DF→TF join is the union-sorted attach (one global sort on `tok`;
  a tok's single DF row is co-resident with its TF rows in every block
  except at the ≤2 flagged block-edge keys, repaired driver-side against
  a broadcast-filtered DF subset);
- per-doc top-k is the windows.top_events_per_user shape: global sort on
  (doc_id, score desc, tok), vectorized head-k over interior runs,
  per-group repair only for block-edge docs.

Scores are integer micro-units (round(tf·ln(N/df)·1e6), the windows.py
value_e6 convention) so engine/oracle comparison is exact; idf uses
math.log per DISTINCT df value — libm, bit-identical to DuckDB's ln().
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _sort_blocks() -> int:
    from .. import config

    return config.sort_blocks()

from ..functions import text as textfn
from .groupagg import grouped_agg
from .. import config

# kind 0 = df row (a=df), kind 1 = tf row (a=doc_id, b=tf)
_JOIN_COLS = ["tok", "kind", "a", "b"]


def _tf_rows(docs: rd.Dataset) -> rd.Dataset:
    def tf(batch: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        ids: list[int] = []
        tfs: list[int] = []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            counts: dict[str, int] = {}
            for t in textfn.TOKEN_RE.findall(text.lower()):
                counts[t] = counts.get(t, 0) + 1
            toks.extend(counts.keys())
            ids.extend([int(doc_id)] * len(counts))
            tfs.extend(counts.values())
        return pd.DataFrame(
            {
                "tok": pd.Series(toks, dtype="object"),
                "doc_id": pd.array(ids, dtype="int64"),
                "tf": pd.array(tfs, dtype="int64"),
            }
        )

    return docs.map_batches(tf, batch_format="pandas", batch_size=None)


def _attach_df(tf_rows: rd.Dataset, df_rows: rd.Dataset) -> rd.Dataset:
    """Join each (doc_id, tok, tf) row with its tok's document frequency via
    one sorted exchange; returns (doc_id, tok, tf, df)."""

    def as_tf(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "tok": b["tok"],
                "kind": pd.array(np.ones(len(b), dtype=np.int8), dtype="int8"),
                "a": b["doc_id"].astype("int64"),
                "b": b["tf"].astype("int64"),
            }
        )

    def as_df(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "tok": b["tok"],
                "kind": pd.array(np.zeros(len(b), dtype=np.int8), dtype="int8"),
                "a": b["df"].astype("int64"),
                "b": pd.array(np.zeros(len(b), dtype=np.int64), dtype="int64"),
            }
        )

    unioned = (
        tf_rows.map_batches(as_tf, batch_format="pandas", batch_size=None)
        .union(df_rows.map_batches(as_df, batch_format="pandas", batch_size=None))
        .repartition(_sort_blocks())
        .sort(["tok", "kind"])
    )

    out_cols = {
        "doc_id": "int64",
        "tok": "object",
        "tf": "int64",
        "df": "int64",
        "is_edge": "bool",
    }

    def attach(b: pd.DataFrame) -> pd.DataFrame:
        n = len(b)
        if n == 0:
            return pd.DataFrame({c: pd.array([], dtype=d) for c, d in out_cols.items()})
        toks = b["tok"].to_numpy()
        kind = b["kind"].to_numpy()
        flagged = (toks == toks[0]) | (toks == toks[-1])
        is_df = (kind == 0) & ~flagged
        df_toks = toks[is_df]
        df_vals = b["a"].to_numpy()[is_df]
        is_tf = (kind == 1) & ~flagged
        tf_toks = toks[is_tf]
        pos = np.searchsorted(df_toks, tf_toks) if len(df_toks) else np.array([], dtype=np.int64)
        if len(tf_toks) and (
            len(df_toks) == 0
            or not np.all(
                (pos < len(df_toks))
                & (df_toks[np.minimum(pos, len(df_toks) - 1)] == tf_toks)
            )
        ):
            raise AssertionError("tfidf attach: interior tok missing its df row")
        interior = pd.DataFrame(
            {
                "doc_id": pd.array(b["a"].to_numpy()[is_tf], dtype="int64"),
                "tok": pd.Series(tf_toks, dtype="object"),
                "tf": pd.array(b["b"].to_numpy()[is_tf], dtype="int64"),
                "df": pd.array(
                    df_vals[pos] if len(tf_toks) else np.array([], dtype=np.int64),
                    dtype="int64",
                ),
                "is_edge": pd.array(np.zeros(int(is_tf.sum()), dtype=bool), dtype="bool"),
            }
        )
        defer = flagged & (kind == 1)
        if not defer.any():
            return interior
        deferred = pd.DataFrame(
            {
                "doc_id": pd.array(b["a"].to_numpy()[defer], dtype="int64"),
                "tok": pd.Series(toks[defer], dtype="object"),
                "tf": pd.array(b["b"].to_numpy()[defer], dtype="int64"),
                "df": pd.array(np.zeros(int(defer.sum()), dtype=np.int64), dtype="int64"),
                "is_edge": pd.array(np.ones(int(defer.sum()), dtype=bool), dtype="bool"),
            }
        )
        return pd.concat([interior, deferred], ignore_index=True)

    flagged = unioned.map_batches(attach, batch_format="pandas", batch_size=None).materialize()
    interior = flagged.filter(expr="is_edge == False").drop_columns(["is_edge"])
    deferred = flagged.filter(expr="is_edge == True").drop_columns(["is_edge"])
    # repair: only the ≤2 block-edge toks' DISTINCT NAMES and their DF rows
    # reach the driver; the deferred tf rows themselves bind distributed via
    # the broadcast lookup (a stopword tok spanning many blocks would
    # otherwise funnel O(corpus) rows through the driver)
    need: set[str] = set()
    for batch in deferred.map_batches(
        lambda b: pd.DataFrame({"tok": pd.Series(b["tok"].unique(), dtype="object")}),
        batch_format="pandas", batch_size=None,
    ).iter_batches(batch_format="pandas"):
        need.update(batch["tok"])
    if not need:
        return interior
    need_ref = ray.put(frozenset(need))

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        wanted = ray.get(need_ref)
        return b[b["tok"].isin(wanted)]

    df_map: dict[str, int] = {}
    for batch in df_rows.map_batches(
        pick, batch_format="pandas", batch_size=None
    ).iter_batches(batch_format="pandas"):
        df_map.update(zip(batch["tok"], batch["df"].astype(int)))
    lut_ref = ray.put(df_map)

    def bind(b: pd.DataFrame) -> pd.DataFrame:
        lut = ray.get(lut_ref)
        out = b[["doc_id", "tok", "tf"]].copy()
        out["df"] = pd.array([lut[t] for t in b["tok"]], dtype="int64")
        return out

    rep = deferred.map_batches(bind, batch_format="pandas", batch_size=None)
    return interior.union(rep)


# vocab sizes up to this broadcast as one DF dict per worker (a 2M-entry
# str->int dict is ~200 MB — the same gate scale as the canonicalize and
# linker funnels); beyond it the sorted-exchange join path runs
VOCAB_BROADCAST_MAX = config.gate(2_000_000)


def _tfidf_broadcast(
    docs: rd.Dataset, df_rows: rd.Dataset, n_docs: int, k: int
) -> rd.Dataset:
    """Exchange-free scoring + top-k: DF as a broadcast dict and a second
    tokenization pass over the documents themselves — a document is ONE
    input row, so the per-doc top-k is batch-local by definition (no
    contiguity assumption that dynamic block splitting could break)."""
    df_ref = ray.put(
        {
            tok: int(df)
            for b in df_rows.iter_batches(batch_format="pandas")
            for tok, df in zip(b["tok"], b["df"])
        }
    )

    class ScoreTopK:
        def __init__(self):
            self.df = ray.get(df_ref)
            self.idf: dict[int, float] = {}

        def _idf(self, d: int) -> float:
            v = self.idf.get(d)
            if v is None:
                v = self.idf[d] = math.log(n_docs / d)
            return v

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            dfm = self.df
            ids: list[int] = []
            toks: list[str] = []
            tfs: list[int] = []
            e6s: list[int] = []
            ranks: list[int] = []
            for doc_id, text in zip(b["doc_id"], b["text"].fillna("")):
                counts: dict[str, int] = {}
                for t in textfn.TOKEN_RE.findall(text.lower()):
                    counts[t] = counts.get(t, 0) + 1
                top = sorted(
                    (
                        (-int(round(c * self._idf(dfm[t]) * 1e6)), t, c)
                        for t, c in counts.items()
                    )
                )[:k]
                for r, (neg_e6, t, c) in enumerate(top, 1):
                    ids.append(int(doc_id))
                    toks.append(t)
                    tfs.append(c)
                    e6s.append(-neg_e6)
                    ranks.append(r)
            return pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "tok": pd.Series(toks, dtype="object"),
                    "tf": pd.array(tfs, dtype="int64"),
                    "tfidf_e6": pd.array(e6s, dtype="int64"),
                    "rank": pd.array(ranks, dtype="int64"),
                }
            )

    # instance (driver-built, trivial state) per the actor-vs-instance
    # note in the package __init__
    return docs.map_batches(ScoreTopK(), batch_format="pandas")


def doc_tfidf(docs: rd.Dataset, k: int = 5) -> rd.Dataset:
    """documents(doc_id, text) → the k highest-TF-IDF terms per document:
    (doc_id, tok, tf, tfidf_e6, rank), ranked by score desc then tok asc.

    tfidf_e6 = round(tf · ln(N/df) · 1e6) in int64 micro-units; N = total
    document count, df = documents containing the term.

    Two row-identical paths, vocab-gated: a broadcastable vocabulary skips
    BOTH remaining exchanges — DF ships once per worker via ray.put and,
    because TF rows are doc-contiguous by construction (a document never
    crosses a map batch), the per-doc top-k is batch-local with no sort.
    A larger-than-broadcast vocabulary takes the sorted-exchange DF join +
    sorted head-k path.
    """
    n_docs = docs.count()
    tf_rows = _tf_rows(docs).materialize()
    df_rows = grouped_agg(tf_rows, ["tok"], [("doc_id", "count", "df")]).materialize()
    if df_rows.count() <= VOCAB_BROADCAST_MAX:
        return _tfidf_broadcast(docs, df_rows, n_docs, k)
    joined = _attach_df(tf_rows, df_rows)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        df_arr = b["df"].to_numpy()
        # math.log per DISTINCT df value: libm, matching DuckDB ln() exactly
        idf = {int(d): math.log(n_docs / int(d)) for d in np.unique(df_arr)}
        vals = np.array([idf[int(d)] for d in df_arr]) * b["tf"].to_numpy()
        out = b[["doc_id", "tok", "tf"]].copy()
        out["tfidf_e6"] = pd.array(
            np.round(vals * 1e6).astype(np.int64), dtype="int64"
        )
        return out

    scored = joined.map_batches(score, batch_format="pandas", batch_size=None).sort(
        ["doc_id", "tfidf_e6", "tok"], descending=[False, True, False]
    )

    cols = ["doc_id", "tok", "tf", "tfidf_e6", "rank"]
    # Arrow blocks end-to-end from here: a pandas-block groupby exchange
    # re-enters Arrow via pa.Table.from_pandas inside its reduce, whose
    # b'pandas' metadata makes pa.Schema unhashable and logs a schema-dedup
    # warning per reduce task (the invindex precedent)
    _flag_schema = pa.schema(
        [("doc_id", pa.int64()), ("tok", pa.string()), ("tf", pa.int64()),
         ("tfidf_e6", pa.int64()), ("rank", pa.int64()),
         ("is_edge", pa.bool_())]
    )

    def _flag_table(df: pd.DataFrame, is_edge) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
                "tok": pa.array(df["tok"], pa.string()),
                "tf": pa.array(df["tf"].to_numpy(), pa.int64()),
                "tfidf_e6": pa.array(df["tfidf_e6"].to_numpy(), pa.int64()),
                "rank": pa.array(df["rank"].to_numpy(), pa.int64()),
                "is_edge": pa.array(is_edge, pa.bool_()),
            }
        )

    def headk(df: pd.DataFrame) -> pa.Table:
        n = len(df)
        if n == 0:
            return _flag_schema.empty_table()
        d = df["doc_id"].to_numpy()
        flagged = (d == d[0]) | (d == d[-1])
        inner = df[~flagged]
        di = inner["doc_id"].to_numpy()
        ni = len(inner)
        new_doc = np.ones(ni, dtype=bool)
        new_doc[1:] = di[1:] != di[:-1]
        first_pos = np.where(new_doc, np.arange(ni), 0)
        np.maximum.accumulate(first_pos, out=first_pos)
        rank = np.arange(ni) - first_pos + 1
        interior = inner[rank <= k].copy()
        interior["rank"] = pd.array(rank[rank <= k], dtype="int64")
        edge = df[flagged].copy()
        edge["rank"] = pd.array([0] * len(edge), dtype="int64")
        both = pd.concat([interior[cols], edge[cols]], ignore_index=True)
        return _flag_table(
            both, [False] * len(interior) + [True] * len(edge)
        )

    flagged = scored.map_batches(headk, batch_format="pandas", batch_size=None).materialize()
    interior = flagged.filter(expr="is_edge == False").select_columns(cols)

    def edge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tfidf_e6", "tok"], ascending=[False, True],
                          kind="mergesort").head(k)
        g = g.copy()
        g["rank"] = pd.array(range(1, len(g) + 1), dtype="int64")
        return g[cols]

    from .windows import EDGE_REPAIR_DRIVER_MAX

    edge_src = flagged.filter(expr="is_edge == True").materialize()
    if edge_src.count() <= EDGE_REPAIR_DRIVER_MAX:
        # size-gated driver-side repair — saves the groupby exchange
        # (windows._sorted_user_op pattern); above the gate the
        # distributed groupby stands, row-identical
        edf = edge_src.to_pandas()
        outs = [edge_topk(g) for _, g in edf.groupby("doc_id", sort=False)] if len(edf) else []
        if not outs:
            return interior
        rep = pd.concat(outs, ignore_index=True)
        return interior.union(
            rd.from_arrow(_flag_table(rep, [False] * len(rep)).drop_columns(["is_edge"]))
        )
    def edge_topk_arrow(g: pd.DataFrame) -> pa.Table:
        t = edge_topk(g)
        return _flag_table(t, [False] * len(t)).drop_columns(["is_edge"])

    edges = edge_src.groupby("doc_id").map_groups(
        edge_topk_arrow, batch_format="pandas"
    )
    return interior.union(edges)


def unigram_logprob(docs: rd.Dataset) -> rd.Dataset:
    """Per-document unigram language-model score — the model-based quality
    signal (a KenLM stand-in with an exactly-checkable model): each token
    contributes round(tf · ln(cnt/N) · 1e6) in int64 micro-nats (cnt =
    corpus frequency, N = corpus token count), so per-doc sums are exact
    integers regardless of summation order; ln is one libm call per
    DISTINCT corpus count, bit-identical to DuckDB's ln (the doc_tfidf
    precedent).  Output: doc_id, n_tokens, logprob_sum_e6,
    avg_logprob_e6 (the same float64 division on both sides).

    Vocab-gated like doc_tfidf: a broadcastable vocabulary ships once as a
    dict; a larger one takes the generic sorted-exchange attach
    (_attach_df with the corpus count in the df slot)."""
    tf_rows = _tf_rows(docs).materialize()
    vocab = grouped_agg(tf_rows, ["tok"], [("tf", "sum", "cnt")]).materialize()
    n_total = float(sum(
        b["cnt"].sum() for b in vocab.iter_batches(batch_format="pandas")
    ))

    def score_batch(b: pd.DataFrame, cnt_col: str) -> pd.DataFrame:
        cnts = b[cnt_col].to_numpy()
        logs = {int(c): math.log(int(c) / n_total) for c in np.unique(cnts)}
        lp = np.array([logs[int(c)] for c in cnts])
        c_e6 = np.round(b["tf"].to_numpy() * lp * 1e6).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "tf": b["tf"].astype("int64"),
                "c_e6": pd.array(c_e6, dtype="int64"),
            }
        )

    if vocab.count() <= VOCAB_BROADCAST_MAX:
        lut_ref = ray.put(
            {t: int(c) for b in vocab.iter_batches(batch_format="pandas")
             for t, c in zip(b["tok"], b["cnt"])}
        )

        def attach_bc(b: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(lut_ref)
            b = b.assign(cnt=pd.array([lut[t] for t in b["tok"]], dtype="int64"))
            return score_batch(b, "cnt")

        contrib = tf_rows.map_batches(attach_bc, batch_format="pandas",
                                      batch_size=None)
    else:
        as_df = vocab.map_batches(
            lambda b: pd.DataFrame({"tok": b["tok"],
                                    "df": b["cnt"].astype("int64")}),
            batch_format="pandas", batch_size=None,
        )
        contrib = _attach_df(tf_rows, as_df).map_batches(
            lambda b: score_batch(b, "df"), batch_format="pandas",
            batch_size=None,
        )

    agg = grouped_agg(
        contrib, ["doc_id"],
        [("tf", "sum", "n_tokens"), ("c_e6", "sum", "logprob_sum_e6")],
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["avg_logprob_e6"] = b["logprob_sum_e6"].to_numpy() / b["n_tokens"].to_numpy()
        return b

    return agg.map_batches(finish, batch_format="pandas")


def bm25_scores(
    docs: rd.Dataset, terms: list[str], k1: float = 1.2, b: float = 0.75
) -> rd.Dataset:
    """BM25 relevance of EVERY document against a fixed query term set —
    the Okapi ranking function (Robertson/Spärck Jones), i.e. the retrieval
    scorer a RAG/quality pipeline runs after doc_tfidf's keyword pass:

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl·N/TL))
        idf(t)   = ln((N − df + 0.5) / (df + 0.5) + 1)     (Lucene form)

    Tokenizes ONCE into a per-doc (dl, tf_t…) table of |terms|+2 int64
    columns; corpus stats (N, total token count, per-term df) come from one
    O(blocks)-row partial-sum pass over that table, so the driver never
    sees a vocabulary — terms are a user-bounded constant.  Scoring is a
    map with the idf constants closed over: ln via math.log (the same libm
    call DuckDB's ln() makes) and all per-doc arithmetic in IEEE float64
    with the exact parenthesization the SQL oracle mirrors, so score_e6
    (floored micro-units — floor, not round: DuckDB rounds half-away,
    numpy half-even) is bit-exact.  Output: (doc_id, score_e6)."""
    from ..functions import text as textfn

    nt = len(terms)
    tf_cols = [f"tf{i}" for i in range(nt)]

    def tf_rows(batch: pd.DataFrame) -> pd.DataFrame:
        dls: list[int] = []
        tfs: list[list[int]] = [[] for _ in range(nt)]
        for text in batch["text"].fillna(""):
            toks = textfn.TOKEN_RE.findall(text.lower())
            dls.append(len(toks))
            cnt: dict[str, int] = {}
            for t in toks:
                cnt[t] = cnt.get(t, 0) + 1
            for i, term in enumerate(terms):
                tfs[i].append(cnt.get(term, 0))
        out = {
            "doc_id": pd.array(batch["doc_id"], dtype="int64"),
            "dl": pd.array(dls, dtype="int64"),
        }
        for c, v in zip(tf_cols, tfs):
            out[c] = pd.array(v, dtype="int64")
        return pd.DataFrame(out)

    tf_tab = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(tf_rows, batch_format="pandas", batch_size=None)
        .materialize()
    )

    def partial(t: pa.Table) -> pa.Table:
        cols = {
            "n": pa.array([t.num_rows], pa.int64()),
            "tl": pa.array([int(np.sum(t["dl"].to_numpy(zero_copy_only=False)))], pa.int64()),
        }
        for c in tf_cols:
            v = t[c].to_numpy(zero_copy_only=False)
            cols["df_" + c] = pa.array([int(np.count_nonzero(v > 0))], pa.int64())
        return pa.table(cols)

    st = (
        tf_tab.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sum()
    )
    # degenerate corpora: an empty docs input emits no partial rows (no
    # 'n' key), an all-empty-text corpus gives tl=0 (inf/NaN norm) — both
    # return the typed empty table, matching pagerank/triangle_count.
    n = int(st.get("n", 0))
    tl = int(st.get("tl", 0))
    if n == 0 or tl == 0:
        return rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "score_e6": pa.array([], pa.int64())})
        )
    idf = [
        math.log((n - int(st["df_" + c]) + 0.5) / (int(st["df_" + c]) + 0.5) + 1.0)
        for c in tf_cols
    ]

    def score(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False)
        norm = k1 * ((1.0 - b) + (((b * dl) * n) / tl))
        s = np.zeros(t.num_rows, dtype=np.float64)
        for i, c in enumerate(tf_cols):
            tf = t[c].to_numpy(zero_copy_only=False)
            s = s + (idf[i] * ((tf * (k1 + 1.0)) / (tf + norm)))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "score_e6": pa.array(
                    np.floor(s * 1000000.0).astype(np.int64)
                ),
            }
        )

    return tf_tab.map_batches(score, batch_format="pyarrow", batch_size=None)


def bigram_logprob(docs: rd.Dataset) -> rd.Dataset:
    """Per-document bigram language-model score with add-one smoothing —
    the KenLM-style fluency signal one order above unigram_logprob:

        ln P(doc) = Σ_positions ln (c(w₋₁ w) + 1) / (c_ctx(w₋₁) + V)

    (c = corpus bigram count, c_ctx = occurrences of w₋₁ as a bigram
    FIRST, V = corpus vocabulary size).  The log splits per position into
    ln(c+1) − ln(c_ctx+V), and the engine DEFINES the doc score with the
    rounding applied per term — c_e6 = round(tf·ln(cb+1)·1e6) −
    round(tf_ctx·ln(cu+V)·1e6) summed as exact int64 micro-nats — so the
    two count attaches are INDEPENDENT exchanges (no row ever needs both
    counts) and each rides the gated broadcast / sorted-exchange
    _attach_df machinery.  ln is one libm call per DISTINCT count (the
    unigram precedent, bit-identical to DuckDB's ln).  Output: doc_id,
    n_bigrams, logprob_sum_e6.  Docs with < 2 tokens emit no row (they
    have no bigram), mirroring the SQL GROUP BY."""
    from ..functions import text as textfn

    def bg_rows(batch: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        prevs: list[str] = []
        nxts: list[str] = []
        tfs: list[int] = []
        for doc_id, text in zip(batch["doc_id"], batch["text"].fillna("")):
            toks = textfn.TOKEN_RE.findall(text.lower())
            counts: dict[tuple[str, str], int] = {}
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
            for (a, b), c in counts.items():
                ids.append(int(doc_id))
                prevs.append(a)
                nxts.append(b)
                tfs.append(c)
        return pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "prev": pd.Series(prevs, dtype="object"),
                "nxt": pd.Series(nxts, dtype="object"),
                "tf": pd.array(tfs, dtype="int64"),
            }
        )

    dgb = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(bg_rows, batch_format="pandas", batch_size=None)
        .materialize()
    )
    cb = grouped_agg(dgb, ["prev", "nxt"], [("tf", "sum", "cb")]).materialize()
    dctx = grouped_agg(dgb, ["doc_id", "prev"], [("tf", "sum", "tfc")]).materialize()
    cu = grouped_agg(dctx, ["prev"], [("tfc", "sum", "cu")]).materialize()
    vocab = grouped_agg(_tf_rows(docs), ["tok"], [("tf", "sum", "cnt")])
    v_size = float(vocab.count())

    def score(tf: np.ndarray, cnt: np.ndarray, shift: float) -> np.ndarray:
        logs = {int(c): math.log(int(c) + shift) for c in np.unique(cnt)}
        lp = np.array([logs[int(c)] for c in cnt]) if len(cnt) else np.array([])
        return np.round((tf * lp) * 1e6).astype(np.int64)

    # ---- bigram term: attach cb to each (doc, bigram) row
    if cb.count() <= VOCAB_BROADCAST_MAX:
        cb_ref = ray.put(
            {(p, x): int(c) for b in cb.iter_batches(batch_format="pandas")
             for p, x, c in zip(b["prev"], b["nxt"], b["cb"])}
        )

        def a_rows(b: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(cb_ref)
            cnt = np.array([lut[(p, x)] for p, x in zip(b["prev"], b["nxt"])],
                           dtype=np.int64)
            return pd.DataFrame(
                {
                    "doc_id": b["doc_id"].astype("int64"),
                    "n": b["tf"].astype("int64"),
                    "c_e6": pd.array(
                        score(b["tf"].to_numpy(), cnt, 1.0), dtype="int64"
                    ),
                }
            )

        a = dgb.map_batches(a_rows, batch_format="pandas", batch_size=None)
    else:
        as_big = dgb.map_batches(
            lambda b: pd.DataFrame(
                {"tok": b["prev"] + " " + b["nxt"],
                 "doc_id": b["doc_id"].astype("int64"),
                 "tf": b["tf"].astype("int64")}
            ),
            batch_format="pandas", batch_size=None,
        )
        cb_df = cb.map_batches(
            lambda b: pd.DataFrame(
                {"tok": b["prev"] + " " + b["nxt"], "df": b["cb"].astype("int64")}
            ),
            batch_format="pandas", batch_size=None,
        )
        a = _attach_df(as_big, cb_df).map_batches(
            lambda b: pd.DataFrame(
                {
                    "doc_id": b["doc_id"].astype("int64"),
                    "n": b["tf"].astype("int64"),
                    "c_e6": pd.array(
                        score(b["tf"].to_numpy(), b["df"].to_numpy(), 1.0),
                        dtype="int64",
                    ),
                }
            ),
            batch_format="pandas", batch_size=None,
        )

    # ---- context term: attach cu to each (doc, prev) row, negated
    if cu.count() <= VOCAB_BROADCAST_MAX:
        cu_ref = ray.put(
            {p: int(c) for b in cu.iter_batches(batch_format="pandas")
             for p, c in zip(b["prev"], b["cu"])}
        )

        def b_rows(b: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(cu_ref)
            cnt = np.array([lut[p] for p in b["prev"]], dtype=np.int64)
            return pd.DataFrame(
                {
                    "doc_id": b["doc_id"].astype("int64"),
                    "n": pd.array(np.zeros(len(b), dtype=np.int64), dtype="int64"),
                    "c_e6": pd.array(
                        -score(b["tfc"].to_numpy(), cnt, v_size), dtype="int64"
                    ),
                }
            )

        bterm = dctx.map_batches(b_rows, batch_format="pandas", batch_size=None)
    else:
        as_ctx = dctx.map_batches(
            lambda b: pd.DataFrame(
                {"tok": b["prev"], "doc_id": b["doc_id"].astype("int64"),
                 "tf": b["tfc"].astype("int64")}
            ),
            batch_format="pandas", batch_size=None,
        )
        cu_df = cu.map_batches(
            lambda b: pd.DataFrame({"tok": b["prev"], "df": b["cu"].astype("int64")}),
            batch_format="pandas", batch_size=None,
        )
        bterm = _attach_df(as_ctx, cu_df).map_batches(
            lambda b: pd.DataFrame(
                {
                    "doc_id": b["doc_id"].astype("int64"),
                    "n": pd.array(np.zeros(len(b), dtype=np.int64), dtype="int64"),
                    "c_e6": pd.array(
                        -score(b["tf"].to_numpy(), b["df"].to_numpy(), v_size),
                        dtype="int64",
                    ),
                }
            ),
            batch_format="pandas", batch_size=None,
        )

    return grouped_agg(
        a.union(bterm), ["doc_id"],
        [("n", "sum", "n_bigrams"), ("c_e6", "sum", "logprob_sum_e6")],
    )
