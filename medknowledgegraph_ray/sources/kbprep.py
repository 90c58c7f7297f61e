"""KB-prep: parse a MedGen-style XML dump into the broadcast KB tables.

The reference parses Entrez MedGen XML summaries into per-CUI dicts of
genes / SNOMED concepts / clinical features
(/root/reference/pymedgraph/dataextraction/parser.py:4-45: root-tag
validation, then per-DocumentSummary field extraction) and a one-time
download script extracts the gene-CUI list
(/root/reference/pymedgraph/utils.py:4-39).  This module is the offline
analog: one parse of a raw XML dump → the `gene_map` / `snomed_map` /
`clinical_features` Parquet tables every runtime join broadcasts.

Runtime never touches XML — S3/S4/M6 become a hash join against these
tables (SURVEY.md §2.2 M6) — so the parse is a driver-side batch step, not
a Ray stage.  Root-tag mismatch raises loudly (parser.py:16 semantics).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

from .. import schemas

ROOT_TAG = "MedGenSet"


class KBParseError(ValueError):
    """Malformed KB dump (wrong root tag / missing required fields)."""


def parse_medgen_xml(path_or_text: str) -> dict[str, pa.Table]:
    """Parse a MedGen-style XML dump → {'gene_map', 'snomed_map',
    'clinical_features'} Arrow tables (schemas.GENE_MAP etc.).

    Accepts a filesystem path or a raw XML string.
    """
    if path_or_text.lstrip().startswith("<"):
        root = ET.fromstring(path_or_text)
    else:
        root = ET.parse(path_or_text).getroot()
    if root.tag != ROOT_TAG:
        raise KBParseError(f"expected root tag {ROOT_TAG!r}, got {root.tag!r}")

    genes: list[tuple[str, str]] = []
    snomed: list[tuple[str, str, str, str, str]] = []
    clinfeat: list[tuple[str, str, str, str, str]] = []
    for summary in root.findall("DocumentSummary"):
        cui_el = summary.find("ConceptId")
        if cui_el is None or not (cui_el.text or "").strip():
            raise KBParseError("DocumentSummary without ConceptId")
        cui = cui_el.text.strip()
        for g in summary.findall("Genes/Gene"):
            if g.text:
                genes.append((cui, g.text.strip()))
        for c in summary.findall("SNOMED/Concept"):
            snomed.append(
                (
                    cui,
                    c.get("saui", ""),
                    (c.text or "").strip(),
                    c.get("scui", ""),
                    c.get("sab", ""),
                )
            )
        for f in summary.findall("ClinicalFeatures/Feature"):
            clinfeat.append(
                (
                    cui,
                    f.get("cui", ""),
                    f.get("type", ""),
                    f.get("name", ""),
                    (f.text or "").strip(),
                )
            )

    def tab(rows, schema):
        return pa.table(
            {k: [r[i] for r in rows] for i, k in enumerate(schema.names)}, schema=schema
        )

    return {
        "gene_map": tab(genes, schemas.GENE_MAP),
        "snomed_map": tab(snomed, schemas.SNOMED_MAP),
        "clinical_features": tab(clinfeat, schemas.CLINICAL_FEATURES),
    }


def emit_medgen_xml(
    gene_map: pa.Table, snomed_map: pa.Table, clinical_features: pa.Table
) -> str:
    """Render the KB tables as a MedGen-style XML dump (the raw-format side
    of the round trip; datagen uses this to fabricate the 'download')."""
    by_cui: dict[str, dict] = {}

    def bucket(cui):
        return by_cui.setdefault(cui, {"genes": [], "snomed": [], "feat": []})

    for r in gene_map.to_pylist():
        bucket(r["cui"])["genes"].append(r["gene"])
    for r in snomed_map.to_pylist():
        bucket(r["cui"])["snomed"].append(r)
    for r in clinical_features.to_pylist():
        bucket(r["cui"])["feat"].append(r)

    root = ET.Element(ROOT_TAG)
    for i, cui in enumerate(sorted(by_cui)):
        d = by_cui[cui]
        s = ET.SubElement(root, "DocumentSummary", uid=str(100000 + i))
        ET.SubElement(s, "ConceptId").text = cui
        if d["genes"]:
            g_el = ET.SubElement(s, "Genes")
            for g in d["genes"]:
                ET.SubElement(g_el, "Gene").text = g
        if d["snomed"]:
            sn_el = ET.SubElement(s, "SNOMED")
            for r in d["snomed"]:
                c = ET.SubElement(
                    sn_el, "Concept", saui=r["saui"], scui=r["scui"], sab=r["sab"]
                )
                c.text = r["snomed_text"]
        if d["feat"]:
            f_el = ET.SubElement(s, "ClinicalFeatures")
            for r in d["feat"]:
                f = ET.SubElement(
                    f_el, "Feature", cui=r["feat_cui"], type=r["feat_type"], name=r["name"]
                )
                f.text = r["definition"]
    return ET.tostring(root, encoding="unicode")
