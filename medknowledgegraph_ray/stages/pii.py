"""PII detection / redaction and URL-domain extraction — corpus-hygiene
operators a training-data pipeline runs before anything else ships.

The synthetic `documents` table is clean word-soup, so the pipeline first
DECORATES it with deterministic planted PII / URLs derived from doc_id
(`decorate_pii` / `decorate_urls` — the same expressions the DuckDB oracle
builds, so the scanner runs over identical bytes).  The scanners themselves
are real general-pattern regex kernels (compiled once per driver-built
instance, vectorized pandas str ops per batch) — swap the decoration for a
real corpus and nothing else changes.

Regexes are ASCII-classed so Python `re` and DuckDB's RE2 agree exactly —
the same contract the stopword kernels use (functions/text.py).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# General scanner patterns (not tied to the planted shapes): any RFC-ish
# email, any +c-nnn-nnnn phone, any dotted-quad.  Shared verbatim with the
# oracle SQL in __ray_entry__ (RE2 and re.ASCII agree on these classes).
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PAT = r"\+\d{1,2}-\d{3}-\d{4}"
IPV4_PAT = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
URL_PAT = r"https?://([A-Za-z0-9.-]+)"

EMAIL_RE = re.compile(EMAIL_PAT, re.ASCII)
PHONE_RE = re.compile(PHONE_PAT, re.ASCII)
IPV4_RE = re.compile(IPV4_PAT, re.ASCII)
URL_RE = re.compile(URL_PAT, re.ASCII)


def decorate_pii(docs: rd.Dataset) -> rd.Dataset:
    """Plant deterministic PII strides into the text (emails on the %5
    stripe, phones on %7, IPv4s on %11) — doc_id-derived, so the oracle
    rebuilds the identical decorated text in SQL."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        text = batch["text"].fillna("").to_numpy()
        out = []
        for d, t in zip(ids, text):
            pre = f"Contact user{d}@example.com re account. " if d % 5 == 0 else ""
            ph = f" Call +1-202-{d % 10000:04d} today." if d % 7 == 0 else ""
            ip = (
                f" Origin host 10.{(d // 256) % 256}.{d % 256}.7 flagged."
                if d % 11 == 0
                else ""
            )
            out.append(pre + t + ph + ip)
        return pd.DataFrame({"doc_id": batch["doc_id"], "text": out})

    return docs.map_batches(fn, batch_format="pandas", batch_size=4096)


class PiiScanner:
    """Detect + redact in one pass: per-doc match counts for each PII class
    and the md5 of the redacted text (emails → <EMAIL>, phones → <PHONE>,
    IPv4s → <IP>, applied in that order — the oracle replays the same
    order).  Compiled-regex state is microseconds to build: driver-built
    instance shipped per task, no actor pool (the repo-wide rule)."""

    def __init__(self):
        self.email, self.phone, self.ipv4 = EMAIL_RE, PHONE_RE, IPV4_RE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        n_em = text.str.count(self.email).astype("int64")
        n_ph = text.str.count(self.phone).astype("int64")
        n_ip = text.str.count(self.ipv4).astype("int64")
        red = (
            text.str.replace(self.email, "<EMAIL>", regex=True)
            .str.replace(self.phone, "<PHONE>", regex=True)
            .str.replace(self.ipv4, "<IP>", regex=True)
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_emails": n_em,
                "n_phones": n_ph,
                "n_ipv4": n_ip,
                "n_pii": n_em + n_ph + n_ip,
                "redacted_hash": [hashlib.md5(t.encode()).hexdigest() for t in red],
            }
        )


def scan_pii(docs: rd.Dataset) -> rd.Dataset:
    """documents → planted PII → real scan/redact.  Output: (doc_id,
    n_emails, n_phones, n_ipv4, n_pii, redacted_hash)."""
    return decorate_pii(docs).map_batches(
        PiiScanner(), batch_format="pandas", batch_size=4096
    )


def decorate_urls(docs: rd.Dataset) -> rd.Dataset:
    """Plant deterministic URLs (the %4 stripe gets a docs.example.org
    link, the %6 stripe a cdnN.mirror-net.io link; %12 gets both)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch["doc_id"].to_numpy()
        text = batch["text"].fillna("").to_numpy()
        out = []
        for d, t in zip(ids, text):
            a = f" See https://docs.example.org/guide/{d} for details." if d % 4 == 0 else ""
            b = f" Mirror at http://cdn{d % 10}.mirror-net.io/pkg?v={d}." if d % 6 == 0 else ""
            out.append(t + a + b)
        return pd.DataFrame({"doc_id": batch["doc_id"], "text": out})

    return docs.map_batches(fn, batch_format="pandas", batch_size=4096)


def domain_counts(docs: rd.Dataset) -> rd.Dataset:
    """Corpus URL-domain frequency: extract every https?:// host from every
    doc, count per domain.  Extraction is a per-batch vectorized findall;
    the count rides the sorted-exchange grouped_agg (exact at corpus-scale
    domain cardinality — millions of hosts — where a driver Counter or a
    Ray groupby().aggregate() would melt)."""
    from .groupagg import grouped_agg

    url_re = URL_RE

    def extract(batch: pd.DataFrame) -> pa.Table:
        hits = batch["text"].fillna("").str.findall(url_re)
        doms = [d for lst in hits for d in lst]
        # Arrow output with declared types: an all-miss batch must keep its
        # schema (empty pandas object columns degrade to Arrow null)
        return pa.table(
            {
                "domain": pa.array(doms, pa.string()),
                "n": pa.array(np.ones(len(doms), dtype=np.int64), pa.int64()),
            }
        )

    per_doc = decorate_urls(docs).map_batches(
        extract, batch_format="pandas", batch_size=4096
    )
    return grouped_agg(
        per_doc,
        ["domain"],
        [("n", "sum", "n")],
        types={"domain": pa.string(), "n": pa.int64()},
    )
