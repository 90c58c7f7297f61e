"""Arrow schemas for every logical table, plus the TableSpec validator.

TableSpec ports the reference's NodeTable meta/validator contract
(/root/reference/pymedgraph/dataextraction/basepipe.py:13-117) from pandas to
pyarrow: every node table row is `| source | node_label | <id_attribute> |
attr_1 … attr_X |`, the meta dict must be complete, column names must not
contain spaces or '-', and node_label values must match the declared labels.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

US = pa.timestamp("us")

TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", US),
    ]
)

# KB tables (broadcast side). `aliases` is flattened (one row per alias) so
# the DuckDB oracle can join it; alias_score plays the linker kb_score role
# (entityrecognition.py:59-61 candidate scores).
UMLS_KB = pa.schema(
    [
        ("cui", pa.string()),
        ("canonical_name", pa.string()),
        ("definition", pa.string()),
        ("sem_label", pa.string()),  # DISEASE | CHEMICAL (bc5cdr label set)
    ]
)
ALIASES = pa.schema(
    [
        ("alias", pa.string()),       # lowercase surface form
        ("cui", pa.string()),
        ("alias_score", pa.float64()),
        ("sem_label", pa.string()),
    ]
)
GENE_MAP = pa.schema([("cui", pa.string()), ("gene", pa.string())])
PROTEIN_MAP = pa.schema(
    [
        ("gene", pa.string()),
        ("entry", pa.string()),
        ("protein_names", pa.string()),  # with parentheses → split('(')[0]
        ("organism", pa.string()),
        ("function_text", pa.string()),
        ("go", pa.string()),  # ';'-joined 'Name [GO:0000000]' strings
    ]
)
SNOMED_MAP = pa.schema(
    [
        ("cui", pa.string()),
        ("saui", pa.string()),
        ("snomed_text", pa.string()),
        ("scui", pa.string()),
        ("sab", pa.string()),
    ]
)
CLINICAL_FEATURES = pa.schema(
    [
        ("cui", pa.string()),
        ("feat_cui", pa.string()),
        ("feat_type", pa.string()),
        ("name", pa.string()),
        ("definition", pa.string()),
    ]
)

MENTIONS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("surface", pa.string()),
        ("norm_surface", pa.string()),
        ("label", pa.string()),
    ]
)
LINKS = pa.schema(
    [
        ("norm_surface", pa.string()),
        ("cui", pa.string()),
        ("score", pa.float64()),
        ("name", pa.string()),
        ("definition", pa.string()),
        ("label", pa.string()),
    ]
)
TRIPLES = pa.schema([("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string())])
NODES = pa.schema(
    [
        ("canonical_id", pa.string()),
        ("node_label", pa.string()),
        ("name", pa.string()),
        ("definition", pa.string()),
    ]
)


class TableSpecError(ValueError):
    pass


@dataclass
class TableSpec:
    """Declared-and-validated node-table schema (basepipe.py:53-117 contract)."""

    table_name: str
    node_label: str | tuple[str, ...]
    id_attribute: str
    source_column: str
    attribute_cols: tuple[str, ...] = field(default_factory=tuple)

    def __post_init__(self) -> None:
        for f_name, v in (
            ("table_name", self.table_name),
            ("id_attribute", self.id_attribute),
            ("source_column", self.source_column),
        ):
            if not v or not isinstance(v, str):
                raise TableSpecError(f"TableSpec.{f_name} must be a non-empty string")
        labels = (self.node_label,) if isinstance(self.node_label, str) else tuple(self.node_label)
        if not labels or any(not l for l in labels):
            raise TableSpecError("TableSpec.node_label must be a non-empty label or tuple")
        self._labels = labels

    @property
    def labels(self) -> tuple[str, ...]:
        return self._labels

    def required_columns(self) -> tuple[str, ...]:
        return (self.source_column, "node_label", self.id_attribute, *self.attribute_cols)

    def validate(self, table: pa.Table) -> pa.Table:
        """Validate an Arrow table against this spec; returns the table.

        Mirrors NodeTable._check_df (basepipe.py:86-117): required columns
        present, no spaces / '-' in column names, node_label values within
        the declared label set.  Raises TableSpecError on violation.
        """
        names = set(table.column_names)
        missing = [c for c in self.required_columns() if c not in names]
        if missing:
            raise TableSpecError(f"{self.table_name}: missing required columns {missing}")
        bad = [c for c in table.column_names if (" " in c) or ("-" in c)]
        if bad:
            raise TableSpecError(f"{self.table_name}: illegal column names {bad} (no spaces or '-')")
        if table.num_rows:
            ok = pc.is_in(table["node_label"], value_set=pa.array(self._labels, pa.string()))
            n_bad = pc.sum(pc.invert(pc.fill_null(ok, False))).as_py() or 0
            if n_bad:
                raise TableSpecError(
                    f"{self.table_name}: {n_bad} rows with node_label outside {self._labels}"
                )
        return table


# The engine's logical catalog (SURVEY.md §1.4 re-grafted onto transcripts).
SPECS = {
    "conversations": TableSpec("conversations", "Conversation", "conv_id", "source"),
    "entities": TableSpec("entities", ("DISEASE", "CHEMICAL"), "norm_surface", "source"),
    "umls": TableSpec("umls", "UMLS", "cui", "source", ("score", "name", "definition")),
    "genes": TableSpec("genes", "Gene", "gene", "source"),
    "snomed": TableSpec("snomed", "SnomedConcept", "saui", "source", ("snomed_text", "scui", "sab")),
    "clinical_features": TableSpec(
        "clinical_features", "ClinicalFeature", "feat_cui", "source", ("feat_type", "name", "definition")
    ),
    "proteins": TableSpec(
        "proteins", "Protein", "entry", "source",
        ("name", "protein_names", "organism", "function_text", "url"),
    ),
    "go": TableSpec("go", "GO", "go_id", "source", ("go_name", "go_type")),
}
