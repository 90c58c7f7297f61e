"""KB enrichment: the MedGen / UniProt analogs as broadcast hash-joins.

The reference fetches genes / SNOMED concepts / clinical features per
selected CUI from MedGen (/root/reference/pymedgraph/dataextraction/
medgen.py:70-134) and proteins + gene ontologies per gene from UniProt
(uniprotpipe.py:24-63).  Our KB is local Parquet; every join here is a
BROADCAST join — the KB side is tiny and shipped once via the task closure,
the big side streams through `map_batches` — never a shuffle join.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import ray.data as rd

from ..functions import text as textfn
from ..sources import readers

UNIPROT_URL = "https://www.uniprot.org/uniprot/"


def _group_rows(table: pa.Table, key: str) -> dict[str, list[dict]]:
    idx: dict[str, list[dict]] = defaultdict(list)
    for row in table.to_pylist():
        idx[row[key]].append(row)
    return dict(idx)


def _broadcast_expand(ds: rd.Dataset, key_col: str, index: dict, emit) -> rd.Dataset:
    """Stream `ds`, expanding each row by its KB matches (flat_map shape,
    but vectorized per batch)."""

    def fn(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = None
        for key in batch[key_col].to_pylist():
            for row in index.get(key, ()):
                rec = emit(key, row)
                if cols is None:
                    cols = {k: [] for k in rec}
                for k, v in rec.items():
                    cols[k].append(v)
        if cols is None:
            # emit an empty table with the right schema via a probe record
            probe = emit("", {})
            cols = {k: [] for k in probe}
        return pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Driver-side variants: the KB side AND the key side are both tiny
# (vocabulary/KB-bounded regardless of corpus size), so the expansion is a
# local pyarrow op — no Ray job launch per enrichment level.  The streaming
# `*_for_cuis` / `*_for_genes` datasets below share the same emit logic, so
# both paths produce identical rows.
# ---------------------------------------------------------------------------

def _expand_local(keys: list[str], index: dict, emit) -> "pa.Table":
    cols: dict[str, list] = None
    for key in keys:
        for row in index.get(key, ()):
            rec = emit(key, row)
            if cols is None:
                cols = {k: [] for k in rec}
            for k, v in rec.items():
                cols[k].append(v)
    if cols is None:
        cols = {k: [] for k in emit("", {})}
    return pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})


def _emit_gene(cui, r):
    return {"source": cui, "gene": r.get("gene", "")}


def _emit_snomed(cui, r):
    return {
        "source": cui,
        "saui": r.get("saui", ""),
        "snomed_text": r.get("snomed_text", ""),
        "scui": r.get("scui", ""),
        "sab": r.get("sab", ""),
    }


def _emit_clinfeat(cui, r):
    return {
        "source": cui,
        "feat_cui": r.get("feat_cui", ""),
        "feat_type": r.get("feat_type", ""),
        "name": r.get("name", ""),
        "definition": r.get("definition", ""),
    }


def _emit_protein(gene, r):
    pname = r.get("protein_names", "")
    return {
        "source": gene,
        "entry": r.get("entry", ""),
        "name": pname.split("(")[0].strip(),
        "protein_names": pname,
        "organism": r.get("organism", ""),
        "function_text": r.get("function_text", ""),
        "url": (UNIPROT_URL + r["entry"]) if r.get("entry") else "",
    }


def genes_table(cuis: list[str]) -> pa.Table:
    return _expand_local(cuis, _group_rows(readers.kb_table("gene_map"), "cui"), _emit_gene)


def snomed_table(cuis: list[str]) -> pa.Table:
    return _expand_local(cuis, _group_rows(readers.kb_table("snomed_map"), "cui"), _emit_snomed)


def clinical_features_table(cuis: list[str]) -> pa.Table:
    return _expand_local(
        cuis, _group_rows(readers.kb_table("clinical_features"), "cui"), _emit_clinfeat
    )


def proteins_table(genes: list[str]) -> pa.Table:
    distinct_genes = sorted(set(genes))
    return _expand_local(
        distinct_genes, _group_rows(readers.kb_table("protein_map"), "gene"), _emit_protein
    )


def go_table(entries: list[str]) -> pa.Table:
    prot_kb = readers.kb_table("protein_map")
    go_by_entry = {r["entry"]: r["go"] for r in prot_kb.select(["entry", "go"]).to_pylist()}
    src, gid, gname, gtype = [], [], [], []
    for entry in entries:
        for go_id, name in textfn.parse_go_field(go_by_entry.get(entry, "")):
            src.append(entry)
            gid.append(go_id)
            gname.append(name)
            gtype.append(" ".join(name.split()[:2]))
    return pa.table(
        {
            "source": pa.array(src, pa.string()),
            "go_id": pa.array(gid, pa.string()),
            "go_name": pa.array(gname, pa.string()),
            "go_type": pa.array(gtype, pa.string()),
        }
    )


def genes_for_cuis(cuis: rd.Dataset) -> rd.Dataset:
    """cuis → (source=cui, gene); MedGen gene rows (medgen.py:98-108,165-178)."""
    idx = _group_rows(readers.kb_table("gene_map"), "cui")
    return _broadcast_expand(cuis, "cui", idx, _emit_gene)


def snomed_for_cuis(cuis: rd.Dataset) -> rd.Dataset:
    """cuis → SNOMED rows (medgen.py:109-120,180-194)."""
    idx = _group_rows(readers.kb_table("snomed_map"), "cui")
    return _broadcast_expand(cuis, "cui", idx, _emit_snomed)


def clinical_features_for_cuis(cuis: rd.Dataset) -> rd.Dataset:
    """cuis → clinical-feature rows (medgen.py:121-132,196-212)."""
    idx = _group_rows(readers.kb_table("clinical_features"), "cui")
    return _broadcast_expand(cuis, "cui", idx, _emit_clinfeat)


def proteins_for_genes(genes: rd.Dataset) -> rd.Dataset:
    """genes → protein rows with shortened name + URL (uniprotpipe.py:65-99).

    `name` = protein_names.split('(')[0].strip() (uniprotpipe.py:77);
    `url` = UNIPROT_URL + entry (uniprotpipe.py:81).

    DISTINCT genes first: a gene reachable from several CUIs must yield one
    protein row set, as the reference's single OR-joined UniProt query does
    (uniprot.py:72-79).  The gene list is tiny → coalesce and dedup locally.
    """
    idx = _group_rows(readers.kb_table("protein_map"), "gene")
    distinct_genes = genes.select_columns(["gene"]).repartition(1).map_batches(
        lambda t: t.group_by("gene").aggregate([]), batch_format="pyarrow"
    )
    return _broadcast_expand(distinct_genes, "gene", idx, _emit_protein)


def go_for_proteins(proteins: rd.Dataset) -> rd.Dataset:
    """proteins → GO rows via the ';'-joined 'Name [GO:nnnnnnn]' unnest
    (uniprotpipe.py:101-146)."""
    prot_kb = readers.kb_table("protein_map")
    go_by_entry = {r["entry"]: r["go"] for r in prot_kb.select(["entry", "go"]).to_pylist()}

    def fn(batch: pa.Table) -> pa.Table:
        src, gid, gname, gtype = [], [], [], []
        for entry in batch["entry"].to_pylist():
            for go_id, name in textfn.parse_go_field(go_by_entry.get(entry, "")):
                # go_type is the leading words of the name in our KB encoding
                src.append(entry)
                gid.append(go_id)
                gname.append(name)
                gtype.append(" ".join(name.split()[:2]))
        return pa.table(
            {
                "source": pa.array(src, pa.string()),
                "go_id": pa.array(gid, pa.string()),
                "go_name": pa.array(gname, pa.string()),
                "go_type": pa.array(gtype, pa.string()),
            }
        )

    return proteins.select_columns(["entry"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
