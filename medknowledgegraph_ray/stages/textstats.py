"""Text analysis operators for a large-scale training-data pipeline:
language ID, quality scoring, token counting, document fingerprinting.

These go beyond the reference (which has no corpus-hygiene stage) and run
over the testdata `documents` table.  Every kernel is deterministic and —
where SQL-expressible — shares its exact formula with the DuckDB oracle in
__ray_entry__ (same stopword list, same regexes, same rounding).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .. import config

from ..functions import text as textfn

_TOKEN_RUN = re.compile(r"\S+", re.ASCII)  # ASCII → RE2/DuckDB-identical classes
_PUNCT = re.compile(r"[^\w\s]", re.ASCII)


class TextStats:
    """Per-document token/char/punct/stopword statistics.

    Regexes are compiled once (driver-built instance, shipped per task —
    state is microseconds to build, so no actor pool); per-batch work is
    vectorized pandas str ops.  Output columns (shared with the oracle SQL):
      n_chars_calc  — length in characters
      n_tokens      — whitespace tokens
      n_punct       — punctuation characters
      n_stop        — EN stopword occurrences (word-boundary)
      stop_ratio    — n_stop / n_tokens (0 when empty), rounded to 6
      punct_ratio   — n_punct / n_chars (0 when empty), rounded to 6
    """

    def __init__(self):
        self.token_run = _TOKEN_RUN
        self.punct = _PUNCT
        self.stop = textfn.EN_STOP_RE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n_chars = text.str.len().astype("int64")
        # counting \S+ runs == number of whitespace tokens, fully vectorized
        # (no per-row Python list from str.split)
        n_tokens = text.str.count(self.token_run).astype("int64")
        n_punct = text.str.count(self.punct).astype("int64")
        n_stop = text.str.lower().str.count(self.stop).astype("int64")
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_chars_calc": n_chars,
                "n_tokens": n_tokens,
                "n_punct": n_punct,
                "n_stop": n_stop,
                # plain float64 divisions (no rounding): the oracle runs the
                # IDENTICAL IEEE-754 ops, so equality is exact
                "stop_ratio": n_stop / np.maximum(n_tokens, 1),
                "punct_ratio": n_punct / np.maximum(n_chars, 1),
            }
        )
        return out


def doc_stats(docs: rd.Dataset) -> rd.Dataset:
    # compiled-regex state builds in microseconds: ship an instance per
    # task instead of spawning an actor pool (multi-second startup)
    return docs.map_batches(TextStats(), batch_format="pandas", batch_size=4096)


def lang_id(docs: rd.Dataset) -> rd.Dataset:
    """Heuristic n-gram language ID: 'en' iff the EN-stopword rate clears a
    threshold — deterministic, SQL-checkable (same formula in the oracle)."""
    stats = doc_stats(docs)

    def decide(batch: pd.DataFrame) -> pd.DataFrame:
        is_en = (batch["n_tokens"] > 0) & (batch["stop_ratio"] >= 0.08)
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": np.where(is_en, "en", "other")})

    return stats.map_batches(decide, batch_format="pandas")


def quality_score(docs: rd.Dataset) -> rd.Dataset:
    """Composite quality score in [0,1]: length band + stopword presence −
    punctuation excess.  score = round(0.4*len_ok + 0.4*min(stop_ratio/0.08,1)
    + 0.2*(1 − min(punct_ratio/0.2, 1)), 6)."""
    stats = doc_stats(docs)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        len_ok = ((batch["n_tokens"] >= 10) & (batch["n_tokens"] <= 10000)).astype("float64")
        stop_c = np.minimum(batch["stop_ratio"] / 0.08, 1.0)
        punct_c = 1.0 - np.minimum(batch["punct_ratio"] / 0.2, 1.0)
        q = (0.4 * len_ok + 0.4 * stop_c + 0.2 * punct_c).round(6)
        return pd.DataFrame({"doc_id": batch["doc_id"], "quality": q})

    return stats.map_batches(score, batch_format="pandas")


_NONSPACE = re.compile(r"\S", re.ASCII)


def gopher_flags(text: pd.Series):
    """The Gopher rule inputs + flags for a text Series, vectorized — the
    single home of the rule formulas (gopher_rules and the corpus-export
    pipeline both call this, and the DuckDB oracles mirror it verbatim).
    Returns (n_tok, n_alpha, mean_len, words_ok, mean_ok, stop_ok)."""
    n_tok = text.str.count(_TOKEN_RUN).astype("int64").to_numpy()
    n_alpha = text.str.count(_NONSPACE).astype("int64").to_numpy()
    n_stop = text.str.lower().str.count(textfn.EN_STOP_RE).astype("int64").to_numpy()
    mean_len = n_alpha / np.maximum(n_tok, 1)
    stop_ratio = n_stop / np.maximum(n_tok, 1)
    words_ok = (n_tok >= 40) & (n_tok <= 120)
    mean_ok = (mean_len >= 3.0) & (mean_len <= 10.0)
    stop_ok = stop_ratio >= 0.05
    return n_tok, n_alpha, mean_len, words_ok, mean_ok, stop_ok


def gopher_rules(docs: rd.Dataset) -> rd.Dataset:
    """Gopher-style rule-based quality FILTER (Rae et al. 2021 §A1.1
    analog, deterministic subset): per doc the rule inputs plus a keep
    flag —
      words_ok  : 40 ≤ n_tokens ≤ 120
      mean_ok   : 3 ≤ mean token length ≤ 10  (non-space chars / tokens)
      stop_ok   : stopword ratio ≥ 0.05
      keep      : all three
    Unlike quality_score (a composite score), this is the boolean
    rule-filter shape a pretraining corpus pass applies.  Map-only,
    vectorized, every formula shared verbatim with the DuckDB oracle."""

    def rules(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n_tok, n_alpha, mean_len, words_ok, mean_ok, stop_ok = gopher_flags(text)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pd.array(n_tok, dtype="int64"),
                "n_alpha": pd.array(n_alpha, dtype="int64"),
                "mean_tok_len": mean_len,
                "words_ok": pd.array(words_ok, dtype="bool"),
                "mean_ok": pd.array(mean_ok, dtype="bool"),
                "stop_ok": pd.array(stop_ok, dtype="bool"),
                "keep": pd.array(words_ok & mean_ok & stop_ok, dtype="bool"),
            }
        )

    return docs.map_batches(rules, batch_format="pandas", batch_size=4096)


_WS_RUN = re.compile(r"\s+", re.ASCII)


def norm_text_and_hash(text: pd.Series) -> tuple[pd.Series, list[str]]:
    """THE exact-dedup key definition (lower → collapse \\s+ → strip →
    md5 hex), in one place — normalize_docs and the corpus-export pipeline
    both call this, and the doc_normalize / corpus_export oracles mirror
    it verbatim."""
    import hashlib

    norm = text.fillna("").str.lower().str.replace(_WS_RUN, " ", regex=True).str.strip()
    return norm, [hashlib.md5(t.encode()).hexdigest() for t in norm]


def normalize_docs(docs: rd.Dataset) -> rd.Dataset:
    """Canonical text normalization ahead of dedup: lowercase, collapse
    whitespace runs to single spaces, strip ends; plus the md5 of the
    normalized text (the exact-dedup key).  Map-only, vectorized pandas
    str kernels; md5 via hashlib per row (C speed), identical to DuckDB's
    md5()."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        norm, h = norm_text_and_hash(batch["text"])
        return pd.DataFrame(
            {"doc_id": batch["doc_id"], "norm_text": norm, "norm_hash": h}
        )

    return docs.map_batches(fn, batch_format="pandas", batch_size=4096)


def repetition_stats(docs: rd.Dataset) -> rd.Dataset:
    """Within-document repetition (the Gopher repetition rule family):
    distinct-token fraction and a dup_ratio = 1 − distinct/total.  Token
    lists explode to one row per token, then a C-level groupby(doc)
    nunique — no per-row Python loop."""
    token_run = _TOKEN_RUN

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("").str.lower()
        toks = text.str.findall(token_run)
        n_tok = toks.str.len().astype("int64")
        ex = pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy().repeat(n_tok.to_numpy()),
             "tok": np.concatenate([np.asarray(t, dtype=object) for t in toks])
             if int(n_tok.sum()) else np.array([], dtype=object)}
        )
        nuni = ex.groupby("doc_id", sort=False)["tok"].nunique()
        n_dist = (
            pd.Series(batch["doc_id"]).map(nuni).fillna(0).astype("int64")
        )
        dup_ratio = 1.0 - n_dist.to_numpy() / np.maximum(n_tok.to_numpy(), 1)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": n_tok,
                "n_distinct": n_dist,
                "dup_ratio": dup_ratio,
            }
        )

    return docs.map_batches(fn, batch_format="pandas", batch_size=4096)


_BPE_RE = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9\s]", re.ASCII)


def token_count_bpe(docs: rd.Dataset) -> rd.Dataset:
    """BPE-pre-tokenizer-style token count: alpha runs, digit runs, and
    single punctuation marks over the lowercased text (leftmost-first
    alternation — identical in Python re and RE2, so SQL-checkable)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["text"].fillna("").str.lower().str.count(_BPE_RE).astype("int64")
        return pd.DataFrame({"doc_id": batch["doc_id"], "n_bpe_tokens": n})

    return docs.map_batches(fn, batch_format="pandas")


def sample_docs(docs: rd.Dataset, pct: int = 10) -> rd.Dataset:
    """Deterministic hash sample (Knuth multiplicative): keep doc iff
    (doc_id × 2654435761) mod 2³² mod 100 < pct.  Stateless and
    partition-independent — the scale-safe alternative to random_shuffle
    sampling; identical arithmetic in the SQL oracle."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("uint64")
        keep = ((ids * 2654435761) % (1 << 32)) % 100 < pct
        return t.filter(pa.array(keep))

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sample_exact_k(docs: rd.Dataset, k: int = 25, seed: int = 77) -> pd.DataFrame:
    """Deterministic EXACT-size uniform sample: the k documents with the
    smallest md5-derived priorities — unlike sample_docs (a pct filter with
    binomial size), this returns exactly k rows, reproducibly, independent
    of partitioning (priority ties are impossible under md5).  Scale shape:
    per-block partial k-smallest, then a driver merge over O(blocks·k)
    survivors — the partial-top-k pushdown, never a corpus sort."""
    import hashlib

    from .skew import partial_topk_pandas

    def prio(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy()
        pr = np.array(
            [
                int.from_bytes(hashlib.md5(f"{seed}:{d}".encode()).digest()[:8], "big")
                for d in ids
            ],
            dtype=np.uint64,
        )
        return pd.DataFrame(
            {"doc_id": pd.array(ids, dtype="int64"),
             "priority": pd.array(pr, dtype="uint64")}
        )

    def pick(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values("priority", kind="mergesort").head(k)

    annotated = docs.select_columns(["doc_id"]).map_batches(
        prio, batch_format="pandas", batch_size=None
    )
    out = partial_topk_pandas(annotated, pick)
    out["rank"] = pd.array(range(1, len(out) + 1), dtype="int64")
    return out


def split_docs(docs: rd.Dataset, val_pct: int = 10, test_pct: int = 10) -> rd.Dataset:
    """Deterministic train/val/test assignment — the training-corpus split
    as a stateless map, not a `random_shuffle`: bucket = Knuth hash of
    doc_id mod 100 (identical arithmetic to sample_docs / the SQL oracle),
    val = bucket < val_pct, test = next test_pct buckets, train = rest.
    The hash is independent of every stratum column (lang/source), so each
    stratum receives the same expected fractions, and the assignment is
    reproducible across runs, partitionings and cluster sizes — resumable
    downstream stages can rely on a doc's split never changing."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("uint64")
        b = ((ids * 2654435761) % (1 << 32)) % 100
        split = np.where(b < val_pct, "val", np.where(b < val_pct + test_pct, "test", "train"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class Fingerprinter:
    """64-bit rolling document fingerprint over normalized tokens.

    Deterministic polynomial rolling hash (base 1000003, mod 2^61-1) over
    md5-derived token hashes — stable across processes (no PYTHONHASHSEED
    dependence).  Oracle-checked: the same fold runs in DuckDB as a HUGEINT
    list_reduce over md5-hex-derived token hashes (__ray_entry__)."""

    MOD = (1 << 61) - 1
    BASE = 1000003

    def __init__(self):
        self.token_re = textfn.TOKEN_RE
        self._cache: dict[str, int] = {}

    def _tok_hash(self, tok: str) -> int:
        h = self._cache.get(tok)
        if h is None:
            h = textfn.stable_token_hash(tok)
            self._cache[tok] = h
        return h

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps = []
        for text in batch["text"].fillna(""):
            acc = 0
            for tok in self.token_re.findall(text.lower()):
                acc = (acc * self.BASE + self._tok_hash(tok)) % self.MOD
            fps.append(acc)
        return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": pd.array(fps, dtype="int64")})


def fingerprints(docs: rd.Dataset) -> rd.Dataset:
    return docs.map_batches(Fingerprinter(), batch_format="pandas", batch_size=4096)


def token_entropy(docs: rd.Dataset) -> rd.Dataset:
    """Per-document token Shannon entropy (nats) — the vocabulary-diversity
    quality signal (low entropy ⇒ repetitive/boilerplate text, cf. the
    repetition_stats Gopher rule family).

    H = ln(n) − (Σ_t c_t·ln(c_t)) / n over whitespace tokens of the
    lowercased text.  Pure map — each document's entropy depends only on
    its own row, so the stage has NO exchange at any corpus size.
    Oracle-exactness: c_t·ln(c_t) terms are accumulated in token-ascending
    order with plain sequential float64 adds, `math.log` is the same libm
    call as DuckDB `ln()`, and the result is rounded half-even to 1e-6
    (the doc_pmi / doc_tfidf idf precedent), so the engine and the SQL
    perform bit-identical double arithmetic."""
    import math
    import re

    token_run = re.compile(r"\S+", re.ASCII)

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        n_tok = np.zeros(len(batch), dtype=np.int64)
        n_distinct = np.zeros(len(batch), dtype=np.int64)
        ent_e6 = np.zeros(len(batch), dtype=np.int64)
        for i, text in enumerate(batch["text"].fillna("")):
            toks = token_run.findall(text.lower())
            n = len(toks)
            n_tok[i] = n
            if n == 0:
                continue
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            n_distinct[i] = len(counts)
            s = 0.0
            for t in sorted(counts):  # deterministic accumulation order
                c = counts[t]
                s += float(c) * math.log(float(c))
            h = math.log(float(n)) - s / float(n)
            # round half-even at 1e-6, matching DuckDB round_even
            ent_e6[i] = int(np.rint(h * 1e6))
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_tokens": pd.array(n_tok, dtype="int64"),
                "n_distinct": pd.array(n_distinct, dtype="int64"),
                "entropy_e6": pd.array(ent_e6, dtype="int64"),
            }
        )

    return docs.map_batches(fn, batch_format="pandas", batch_size=4096)


def chunk_windows(docs: rd.Dataset, window: int = 64, stride: int = 48) -> rd.Dataset:
    """Per-document sliding-window token chunking — the context-window
    preparation step of a training/RAG pipeline: each document's
    whitespace tokens are re-emitted as overlapping windows of `window`
    tokens every `stride` tokens (chunk k covers tokens
    [k·stride, min(k·stride + window, n))), with the window's text
    re-joined on single spaces.

    Map-only flat expansion — each document chunks independently, so the
    stage has NO exchange at any corpus size and the output is
    (n/stride)-linear in the corpus.  The identical token split
    (ASCII \\S+ runs) and slice arithmetic are SQL-expressible, so every
    row is oracle-exact including the chunk text."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        cids: list[int] = []
        starts: list[int] = []
        ends: list[int] = []
        texts: list[str] = []
        for doc_id, text in zip(batch["doc_id"].to_numpy(),
                                batch["text"].fillna("")):
            toks = _TOKEN_RUN.findall(text)
            n = len(toks)
            for k, s in enumerate(range(0, n, stride)):
                e = min(s + window, n)
                ids.append(int(doc_id))
                cids.append(k)
                starts.append(s)
                ends.append(e)
                texts.append(" ".join(toks[s:e]))
        return pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "chunk_id": pd.array(cids, dtype="int64"),
                "tok_start": pd.array(starts, dtype="int64"),
                "tok_end": pd.array(ends, dtype="int64"),
                "chunk_text": pd.Series(texts, dtype="object"),
            }
        )

    return docs.map_batches(fn, batch_format="pandas", batch_size=1024)


def needle_hits(docs: rd.Dataset, needles: list[str]) -> rd.Dataset:
    """Multi-phrase substring counting over the corpus — the literal
    blocklist / contamination-audit primitive (count every occurrence of a
    fixed phrase list in every document; cf. decontam.contamination_flags,
    which matches token n-grams instead of raw substrings).

    Pure map, zero exchange at any corpus size: each batch runs ONE
    vectorized C-level scan per needle (pandas str.count over a
    literal-escaped compiled regex).  Counting is non-overlapping greedy
    left-to-right, which is exactly DuckDB's
    (len(text) − len(replace(text, needle, ''))) / len(needle), so every
    row is oracle-exact.  Output: (doc_id, needle, n_hits) for hits ≥ 1."""
    pats = [(nd, re.compile(re.escape(nd))) for nd in needles]

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        text = batch["text"].fillna("")
        out_id: list[np.ndarray] = []
        out_nd: list[str] = []
        out_n: list[np.ndarray] = []
        for nd, pat in pats:
            cnt = text.str.count(pat).to_numpy().astype(np.int64)
            hit = cnt > 0
            k = int(hit.sum())
            if k == 0:
                continue
            out_id.append(ids[hit])
            out_nd.extend([nd] * k)
            out_n.append(cnt[hit])
        if not out_id:
            return pd.DataFrame(
                {
                    "doc_id": pd.array([], dtype="int64"),
                    "needle": pd.Series([], dtype="object"),
                    "n_hits": pd.array([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "doc_id": pd.array(np.concatenate(out_id), dtype="int64"),
                "needle": pd.Series(out_nd, dtype="object"),
                "n_hits": pd.array(np.concatenate(out_n), dtype="int64"),
            }
        )

    return docs.map_batches(fn, batch_format="pandas", batch_size=4096)


def compression_ratio(docs: rd.Dataset, level: int = 6) -> rd.Dataset:
    """Per-document zlib compression ratio — the Gopher/RefinedWeb
    repetitive-content signal (Rae et al. 2021 quality filters):
    machine-generated or boilerplate-heavy text compresses far below
    natural prose, so pipelines drop documents under a ratio floor.
    Returns (doc_id, raw_bytes, comp_bytes, ratio_e6) with
    ratio_e6 = round-half-up(1e6 · comp/raw) in pure int64; empty
    documents get ratio_e6 = 1e6 (incompressible convention).

    No SQL oracle BY DESIGN (DuckDB has no zlib): the operator is
    deterministic for a fixed (level, zlib build) and pytest pins its
    behavior — exact self-consistency, repetition ⇒ low ratio, unique
    prose ⇒ high ratio, and the empty/byte-count contracts.  The per-doc
    loop calls C zlib once per document (the payload-bounded pattern the
    multimodal actors use); compute scales with corpus bytes, no
    exchange at all."""
    import zlib

    def score(b: pd.DataFrame) -> pa.Table:
        texts = b["text"].fillna("")
        raw = np.array([len(t.encode("utf-8")) for t in texts], dtype=np.int64)
        comp = np.array(
            [len(zlib.compress(t.encode("utf-8"), level)) for t in texts],
            dtype=np.int64,
        )
        denom = np.maximum(raw, 1)
        ratio = (2_000_000 * comp + denom) // (2 * denom)
        ratio = np.where(raw == 0, 1_000_000, ratio)
        return pa.table(
            {
                "doc_id": pa.array(b["doc_id"].to_numpy().astype(np.int64)),
                "raw_bytes": pa.array(raw),
                "comp_bytes": pa.array(comp),
                "ratio_e6": pa.array(ratio.astype(np.int64)),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pandas", batch_size=None
    )
