"""Edit-distance-1 similarity join (FastSS deletion neighborhoods).

Typo-tolerant vocabulary joins ("recieve" ≈ "receive") are the string
analog of the MinHash/SimHash near-dup family: an exact all-pairs
Levenshtein is O(|V|²·len) and un-shardable, but every pair at Levenshtein
distance ≤ 1 SHARES A 1-DELETION VARIANT — a substitution pair meets at the
variant with the differing position deleted, an insertion/deletion pair
meets at the shorter token itself (Bocek et al., "Fast Similarity Search in
Large Dictionaries", 2007).  So the join becomes the engine's standard
bucket shape:

  distinct tokens → flat-map (variant, token) rows (len+1 variants each)
  → ONE sorted exchange on variant → per-run pair expansion (vectorized by
  run size, loud MAX_BUCKET hot-variant guard) → pair distinct → exact
  ≤1-edit verification.

Recall is 1 by the theorem; precision comes from the verify pass (a shared
variant only bounds the distance by 2 — e.g. transposed interiors
"abcd"/"acbd" share "abd" but are distance 2).  The verify loop is per
CANDIDATE PAIR (vocabulary-bounded, never corpus-bounded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

# a variant bucket of c tokens emits C(c,2) candidates; hot variants (short
# tokens' neighborhoods collapse) must fail loudly, like dedupe.MAX_BUCKET
MAX_BUCKET = 2_000


def _lev_le1(a: str, b: str) -> bool:
    """Exact Levenshtein(a,b) ≤ 1 in O(len) — the verify kernel."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la < lb:
        a, b, la, lb = b, a, lb, la
    if la != lb + 1:
        return False
    i = 0
    while i < lb and a[i] == b[i]:
        i += 1
    return a[i + 1:] == b[i:]


def _variants(tok: str) -> list[str]:
    """The token plus its 1-deletion neighborhood (deduplicated: repeated
    characters yield repeated variants)."""
    return list({tok, *(tok[:i] + tok[i + 1:] for i in range(len(tok)))})


def _expand_variant_pairs(df: pd.DataFrame) -> pd.DataFrame:
    """Per-run candidate pair expansion over a (variant, tok)-sorted frame
    — the bucket kernel, with the loud hot-variant guard."""
    empty = pd.DataFrame(
        {"tok_a": pd.array([], dtype="object"),
         "tok_b": pd.array([], dtype="object")}
    )
    if len(df) == 0:
        return empty
    v = df["variant"].to_numpy()
    t = df["tok"].to_numpy()
    n = len(df)
    new = np.ones(n, dtype=bool)
    new[1:] = v[1:] != v[:-1]
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, n))
    big = counts.max(initial=0)
    if big > MAX_BUCKET:
        raise RuntimeError(
            f"typo_pairs: variant bucket of {big} tokens > {MAX_BUCKET} "
            f"(hot deletion variant) — raise min_len or shard the bucket"
        )
    a_parts, b_parts = [], []
    for c in np.unique(counts):
        if c < 2:
            continue
        runs = starts[counts == c]
        ii, jj = np.triu_indices(int(c), k=1)
        a_parts.append(t[(runs[:, None] + ii[None, :]).ravel()])
        b_parts.append(t[(runs[:, None] + jj[None, :]).ravel()])
    if not a_parts:
        return empty
    return pd.DataFrame(
        {"tok_a": np.concatenate(a_parts), "tok_b": np.concatenate(b_parts)}
    )


def typo_pairs(docs: rd.Dataset, text_col: str = "text", min_len: int = 6) -> rd.Dataset:
    """All unordered token pairs (tok_a < tok_b) of the corpus vocabulary
    (tokens of length ≥ `min_len`) within Levenshtein distance 1."""
    from ..functions import text as textfn
    from .distinct import distinct
    from .windows import _sorted_user_op

    def toks(b: pd.DataFrame) -> pd.DataFrame:
        out: set[str] = set()
        for text in b[text_col].fillna(""):
            out.update(
                t for t in textfn.TOKEN_RE.findall(text.lower()) if len(t) >= min_len
            )
        return pd.DataFrame({"tok": sorted(out)})

    vocab = distinct(
        docs.map_batches(toks, batch_format="pandas", batch_size=None), ["tok"]
    )

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        vs, ts = [], []
        for tok in b["tok"]:
            for v in _variants(tok):
                vs.append(v)
                ts.append(tok)
        return pd.DataFrame({"variant": vs, "tok": ts})

    rows = vocab.map_batches(expand, batch_format="pandas", batch_size=None)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        return _expand_variant_pairs(df)

    cand = _sorted_user_op(
        rows, ["variant", "tok"], ["variant", "tok"], [False, False],
        kernel, {"tok_a": "object", "tok_b": "object"}, key="variant",
    )

    def verify(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return b
        keep = np.fromiter(
            (_lev_le1(a, bb) for a, bb in zip(b["tok_a"], b["tok_b"])),
            dtype=bool, count=len(b),
        )
        return b[keep]

    return distinct(cand, ["tok_a", "tok_b"]).map_batches(
        verify, batch_format="pandas", batch_size=None
    )
