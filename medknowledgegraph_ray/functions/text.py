"""Vectorized scalar text kernels (SURVEY.md §2.8 catalog).

The reference's scalar functions (.lower/.title/' '.join/split/fillna,
/root/reference/pymedgraph SURVEY §2.8) become pyarrow.compute kernels or
compiled-regex pandas ops here; everything operates on whole Arrow columns.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = re.compile(r"[a-z0-9]+")
GO_ID_RE = re.compile(r"\[GO:(\d+)\]")

# Stopword list shared verbatim with the lang-id / quality oracle SQL.
EN_STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "that", "for", "on")
# re.ASCII so \b/\w match RE2 (DuckDB) semantics exactly
EN_STOP_RE = re.compile(r"\b(" + "|".join(EN_STOPWORDS) + r")\b", re.ASCII)


def lower(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Surface-form normalization (entityrecognition.py:73,114)."""
    return pc.utf8_lower(col)


def fill_empty(table: pa.Table) -> pa.Table:
    """Null → '' for all string columns (basepipe.py:47 fillna semantics)."""
    cols = []
    for name in table.column_names:
        col = table[name]
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            col = pc.fill_null(col, "")
        cols.append(col)
    return pa.table(dict(zip(table.column_names, cols)))


def shorten_protein_name(col: pa.ChunkedArray | pa.Array):
    """`name.split('(')[0].strip()` (uniprotpipe.py:77) as an Arrow kernel."""
    first = pc.list_element(pc.split_pattern(col, "("), 0)
    return pc.utf8_trim_whitespace(first)


def build_url(prefix: str, col: pa.ChunkedArray | pa.Array):
    """String concat URL build (uniprotpipe.py:81)."""
    return pc.binary_join_element_wise(pa.scalar(prefix), col, "")


def parse_go_field(go: str) -> list[tuple[str, str]]:
    """Parse one ';'-joined GO string into [(go_id, go_name)].

    Mirrors the peel at uniprotpipe.py:124-136: split on ';', extract the
    trailing '[GO:nnnnnnn]', the name is the prefix stripped.
    """
    out = []
    if not go:
        return out
    for part in go.split(";"):
        part = part.strip()
        m = GO_ID_RE.search(part)
        if not m:
            continue
        out.append((m.group(1), part[: m.start()].strip()))
    return out


def md5_hex(values) -> np.ndarray:
    """Row-wise md5 hex digests (shared hash with the DuckDB oracle's md5())."""
    return np.array([hashlib.md5(v.encode("utf-8")).hexdigest() for v in values], dtype=object)


def stable_token_hash(tok: str) -> int:
    """64-bit deterministic token hash (md5-based; process-independent)."""
    return int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
