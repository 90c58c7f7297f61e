"""Candidate entity linking: surface form → CUI candidates with scores.

The reference's UMLS linker is a broadcast ANN lookup — a char-3gram TF-IDF
index over UMLS aliases held in process memory, queried per entity surface
(/root/reference/pymedgraph/dataextraction/entityrecognition.py:25-27,59-61;
CUI → name/definition at :110-112).  Here the small side (the alias KB) is a
`ray.put` broadcast; linking runs inside `map_batches` with a dict lookup
(exact-alias path, SQL-checkable) plus a deterministic char-3gram Jaccard
scorer (fuzzy path for unseen surfaces, rows-only checked).

Link rows are DISTINCT per (norm_surface, cui) keep-max-score, mirroring the
reference's global link-set dedup (entityrecognition.py:44,61,115).  Name and
definition are functionally dependent on the CUI, so keep-any == keep-first
(SURVEY.md §7.4).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..sources import readers
from . import distinct as _distinct


def link_catalog() -> pa.Table:
    """aliases ⨝ umls_kb → (alias, cui, score, name, definition, label)."""
    aliases = readers.kb_table("aliases")
    kb = readers.kb_table("umls_kb").select(["cui", "canonical_name", "definition"])
    joined = aliases.join(kb, keys="cui", join_type="inner")
    return pa.table(
        {
            "alias": joined["alias"],
            "cui": joined["cui"],
            "score": joined["alias_score"],
            "name": joined["canonical_name"],
            "definition": joined["definition"],
            "label": joined["sem_label"],
        }
    ).sort_by([("alias", "ascending"), ("cui", "ascending")])


def _trigrams(s: str) -> set:
    s = f"  {s} "
    return {s[i : i + 3] for i in range(len(s) - 2)}


class SurfaceLinker:
    """Actor-pool stage: distinct surfaces → candidate link rows.

    State built once per actor: an exact alias → [(cui, score, name, def,
    label)] dict and a trigram inverted index for the fuzzy path.  The
    actor path passes ``catalog_ref=None`` so each actor rebuilds from the
    KB tables on (shared) storage — restart-safe under Ray issue 53727
    (object-store constructor args break actor restart if the ref is
    lost); a ``Table``/``ObjectRef`` is still accepted for driver use.
    """

    def __init__(self, catalog_ref=None, fuzzy: bool = False, fuzzy_min: float = 0.5):
        if catalog_ref is None:
            catalog: pa.Table = link_catalog()  # re-readable: restart-safe
        else:
            catalog = (
                ray.get(catalog_ref) if isinstance(catalog_ref, ray.ObjectRef) else catalog_ref
            )
        self.exact: dict[str, list] = defaultdict(list)
        rows = catalog.to_pylist()
        for r in rows:
            self.exact[r["alias"]].append(
                (r["cui"], r["score"], r["name"], r["definition"], r["label"])
            )
        self.fuzzy = fuzzy
        self.fuzzy_min = fuzzy_min
        if fuzzy:
            # TRIGRAM INVERTED INDEX: gram → int32 array of alias ids.
            # An unseen surface probes only its own grams' postings —
            # per-query cost is O(Σ posting lengths), independent of the
            # total alias count (the 10^6–10^7-row UMLS property), where a
            # linear scan over alias gram-sets melts.
            self.aliases = list(self.exact)
            sizes = np.empty(len(self.aliases), dtype=np.int64)
            postings: dict[str, list[int]] = defaultdict(list)
            for i, alias in enumerate(self.aliases):
                gs = _trigrams(alias)
                sizes[i] = len(gs)
                for g in gs:
                    postings[g].append(i)
            self.alias_gram_n = sizes
            self.gram_index = {
                g: np.asarray(ids, dtype=np.int32) for g, ids in postings.items()
            }

    def _fuzzy_candidates(self, surface: str) -> list:
        grams = _trigrams(surface)
        posts = [p for p in map(self.gram_index.get, grams) if p is not None]
        if not posts:
            return []
        # posting intersection count per alias == |query grams ∩ alias grams|
        # (each posting lists an alias once per distinct gram)
        ids, inter = np.unique(np.concatenate(posts), return_counts=True)
        jac = inter / (len(grams) + self.alias_gram_n[ids] - inter)
        keep = jac >= self.fuzzy_min
        best: list = []
        for i, j in zip(ids[keep], jac[keep]):
            for cui, score, name, definition, label in self.exact[self.aliases[i]]:
                best.append((cui, round(score * float(j), 4), name, definition, label))
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in ("norm_surface", "cui", "score", "name", "definition", "label")}
        for surface in batch["norm_surface"].to_pylist():
            cands = self.exact.get(surface)
            if cands is None and self.fuzzy:
                cands = self._fuzzy_candidates(surface)
            for cui, score, name, definition, label in cands or ():
                out["norm_surface"].append(surface)
                out["cui"].append(cui)
                out["score"].append(score)
                out["name"].append(name)
                out["definition"].append(definition)
                out["label"].append(label)
        return pa.table(
            {
                "norm_surface": pa.array(out["norm_surface"], pa.string()),
                "cui": pa.array(out["cui"], pa.string()),
                "score": pa.array(out["score"], pa.float64()),
                "name": pa.array(out["name"], pa.string()),
                "definition": pa.array(out["definition"], pa.string()),
                "label": pa.array(out["label"], pa.string()),
            }
        )


def link_table(surfaces: list[str], *, fuzzy: bool = False) -> pa.Table:
    """Driver-side linking of an (already vocabulary-bounded) surface list —
    same SurfaceLinker state and emit as the streaming path, no Ray job."""
    lk = SurfaceLinker(link_catalog(), fuzzy=fuzzy)
    return lk(pa.table({"norm_surface": pa.array(sorted(set(surfaces)), pa.string())}))


def distinct_surfaces(mentions: rd.Dataset) -> rd.Dataset:
    """Global distinct (norm_surface) — vocabulary-bounded, tiny after the
    per-block partial distinct, so the final exchange is negligible."""
    return _distinct.distinct(mentions, ["norm_surface"])


class _FuzzySurfaceLinker(SurfaceLinker):
    """Zero-arg ctor variant for the actor pool: any fn_constructor_kwargs
    dict (even all-defaults) is an object-store constructor arg and trips
    Ray's issue-53727 restart-hazard banner, so the fuzzy flag is baked
    into the class instead of shipped as a kwarg."""

    def __init__(self):
        super().__init__(None, fuzzy=True)


def link_surfaces(mentions: rd.Dataset, *, fuzzy: bool = False) -> rd.Dataset:
    """mentions → links(norm_surface, cui, score, name, definition, label)."""
    return distinct_surfaces(mentions).map_batches(
        _FuzzySurfaceLinker if fuzzy else SurfaceLinker,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 2),
    )
