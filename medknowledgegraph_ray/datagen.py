"""Deterministic synthetic corpus + knowledge-base generation.

BASELINE.json's `input_hint` table (conv_id, turn_idx, role, text, tool, ts)
does not ship with the testdata, so we synthesize it — seeded, pure-pyarrow,
no network, no Ray — at a scale matched to each testdata sf directory.  Both
the Ray pipeline (queries()) and the DuckDB oracle (oracle_sql()) read the
SAME generated parquet, so the driver's side-by-side correctness check is
meaningful.

Design points
- Entity mentions are planted from a closed alias vocabulary whose tokens are
  fake-latin words, disjoint from the English filler vocabulary, so a mention
  occurs in a turn iff the generator planted it (word-boundary regex matching
  is exact for both engine and oracle).
- Concept frequency is a Zipf mixture with one hot concept appearing in ~30%
  of entity slots (FIXTURES.md §6.4 hot-key skew).
- Some surfaces are ambiguous (shared by several CUIs with distinct scores)
  to exercise the reference's top-4-candidates-per-surface selection
  (/root/reference/pymedgraph/dataextraction/medgen.py:156-161).
- Alias scores play the linker kb_score role; some fall below the 0.85
  threshold to exercise the score filter (medgen.py:149,158).
- Writes are atomic (tmp dir + rename) and sharded (conversations are
  assigned to shards by index) so multi-shard read / resume paths are real.
"""

from __future__ import annotations

import datetime as _dt
import os
import random
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from . import config, schemas

# ---------------------------------------------------------------------------
# Vocabulary construction (all deterministic; module import has no side
# effects beyond building small in-memory lists).
# ---------------------------------------------------------------------------

# Fake-latin stems for entity names — token-disjoint from FILLER below.
_DIS_STEMS = [
    "xelorvan", "miratrex", "quolazine", "vebastril", "norquilex", "tarvolin",
    "zepharid", "colvantis", "brenoxil", "dulvaquin", "fermitral", "galphexin",
    "hyrodalin", "jexovarin", "kelmitran", "lorvexide", "morquilan", "nubraxol",
    "olvestran", "pexidral", "ruvalexin", "sorbitran", "tulvexar", "uvrandil",
    "velquorin", "wexolvan", "yarvindal", "zulqharin", "axelmorin", "bovratex",
]
_DIS_SUFFIX = ["syndrome", "pathia", "itis", "osis", "disorder"]
_CHEM_STEMS = [
    "altravone", "bezquitol", "cindrafil", "dorvexal", "epraziline", "fovantrix",
    "gritalvan", "hexprodol", "ilvomarin", "jantrexol", "kovalzine", "lumantrel",
    "mextarvin", "novraquil", "opexitran",
]
# English filler words for sentence templates (entity tokens never collide).
_FILLER = (
    "the patient reported that symptoms worsened after treatment and follow up "
    "visits showed stable vital signs with no adverse reaction noted during "
    "examination while the care team discussed options for therapy adjustment "
    "and scheduled further tests to confirm the working diagnosis before "
    "deciding on a revised plan of care"
).split()
_TOOLS = ["search", "chart_lookup", "dose_calc", "triage", ""]
_ROLES = ["user", "assistant", "tool"]


def _build_kb(rng: random.Random):
    """Build concept/alias/gene/protein/snomed/clinical-feature rows."""
    concepts = []  # (cui, canonical_name, definition, sem_label)
    aliases = []   # (alias, cui, alias_score, sem_label)

    def add_concept(i: int, name: str, label: str):
        cui = f"C{i:07d}"
        definition = (
            f"a synthetic {label.lower()} concept named {name} used for "
            f"deterministic testing" if rng.random() < 0.8 else ""
        )
        concepts.append((cui, name, definition, label))
        # canonical alias always scores highest
        aliases.append((name, cui, 1.0, label))
        # abbreviation alias (initial letters of tokens + index suffix)
        toks = name.split()
        if len(toks) > 1 and rng.random() < 0.7:
            abbr = "".join(t[0] for t in toks) + str(i % 97)
            aliases.append((abbr, cui, round(rng.uniform(0.70, 0.98), 2), label))
        # variant alias
        if rng.random() < 0.8:
            variant = f"{toks[0]} variant {i % 23}"
            aliases.append((variant, cui, round(rng.uniform(0.70, 0.98), 2), label))
        # 3..6-word all-alphabetic long-form aliases so abbreviation
        # planting covers the full 1..MAX_LF_WORDS Schwartz-Hearst span
        # (entityrecognition.py:25-27 is length-unbounded).
        # Index-deterministic (no rng draws) so every pre-existing KB row
        # and rng-derived value is unchanged.
        if label == "DISEASE" and len(toks) > 1:
            if i % 3 == 0:
                aliases.append(
                    (f"chronic {name}", cui, round(0.70 + (i % 25) * 0.01, 2), label)
                )
            if i % 4 == 1:
                aliases.append(
                    (f"acquired chronic {name}", cui,
                     round(0.70 + (i % 23) * 0.01, 2), label)
                )
            if i % 5 == 2:
                aliases.append(
                    (f"relapsing acquired chronic {name}", cui,
                     round(0.70 + (i % 21) * 0.01, 2), label)
                )
            if i % 6 == 3:
                aliases.append(
                    (f"severe relapsing acquired chronic {name}", cui,
                     round(0.70 + (i % 19) * 0.01, 2), label)
                )
        return cui

    cuis_disease, cuis_chem = [], []
    idx = 1
    for stem in _DIS_STEMS:
        suffix = _DIS_SUFFIX[idx % len(_DIS_SUFFIX)]
        cuis_disease.append(add_concept(idx, f"{stem} {suffix}", "DISEASE"))
        idx += 1
    for stem in _CHEM_STEMS:
        cuis_chem.append(add_concept(idx, stem, "CHEMICAL"))
        idx += 1

    # Ambiguous surfaces: one surface → several CUIs with distinct scores
    # (exercises per-surface top-k candidate selection, medgen.py:156-161).
    for k in range(10):
        surf = f"ambig term {k}"
        pool = cuis_disease if k % 2 == 0 else cuis_chem
        label = "DISEASE" if k % 2 == 0 else "CHEMICAL"
        n_cands = 3 + (k % 4)  # 3..6 candidates, some > TOP_CUIS
        chosen = rng.sample(pool, n_cands)
        scores = sorted({round(rng.uniform(0.80, 0.99), 2) for _ in range(12)}, reverse=True)
        for j, cui in enumerate(chosen):
            aliases.append((surf, cui, scores[j % len(scores)], label))

    # Deterministic tie cases for top-k ordering (FIXTURES.md §6.3): two
    # candidates with IDENTICAL scores → tiebreak (score desc, cui asc).
    tie_pool = rng.sample(cuis_disease, 4)
    aliases.append(("tiebreak term", tie_pool[0], 0.91, "DISEASE"))
    aliases.append(("tiebreak term", tie_pool[1], 0.91, "DISEASE"))
    aliases.append(("tiebreak term", tie_pool[2], 0.88, "DISEASE"))
    aliases.append(("tiebreak term", tie_pool[3], 0.95, "DISEASE"))

    # gene map: most disease CUIs get 1-3 genes (mirrors MedGen gene lists,
    # medgen.py:98-108); gene names are uppercase fake symbols.
    genes = []
    gene_names = []
    for i, cui in enumerate(cuis_disease):
        if rng.random() < 0.85:
            for g in range(1 + i % 3):
                gname = f"GX{i:02d}{chr(65 + g)}"
                genes.append((cui, gname))
                gene_names.append(gname)

    # protein map (UniProt analog, uniprotpipe.py:65-99): per gene 1-2 entries
    # with parenthesised protein names and ';'-joined GO strings.
    proteins = []
    go_types = ["biological process", "molecular function", "cellular component"]
    for i, g in enumerate(gene_names):
        for p in range(1 + (i % 2)):
            entry = f"P{i:03d}{p}X"
            pname = (
                f"{g.lower()} reductase {p} (EC 1.{i % 9}.{p + 1}.{i % 7}) "
                f"({g}-R{p})"
            )
            gos = "; ".join(
                f"{go_types[(i + j) % 3]} term {i}{j} [GO:{(1000000 + i * 13 + j):07d}]"
                for j in range(1 + (i + p) % 3)
            )
            proteins.append(
                (g, entry, pname, "Homo sapiens (Human)",
                 f"catalyzes synthetic reaction {i}", gos)
            )

    # snomed + clinical features per disease CUI (medgen.py:180-212 analogs).
    snomed, clinfeat = [], []
    for i, cui in enumerate(cuis_disease):
        if i % 3 != 2:
            for s in range(1 + i % 2):
                snomed.append(
                    (cui, f"S{i:04d}{s}", f"snomed concept {i} {s}",
                     f"SC{i:05d}", "SNOMEDCT_US")
                )
        if i % 4 != 3:
            clinfeat.append(
                (cui, f"C{9000000 + i:07d}", "Finding",
                 f"clinical feature {i}", f"feature definition {i}")
            )

    return concepts, aliases, genes, proteins, snomed, clinfeat


def _kb_tables():
    rng = random.Random(config.DEFAULT_SEED)
    concepts, aliases, genes, proteins, snomed, clinfeat = _build_kb(rng)
    # Alias list must be unique on (alias, cui): keep max score.
    best: dict[tuple[str, str], tuple[float, str]] = {}
    for alias, cui, score, label in aliases:
        key = (alias, cui)
        if key not in best or score > best[key][0]:
            best[key] = (score, label)
    alias_rows = sorted((a, c, s, l) for (a, c), (s, l) in best.items())
    tables = {
        "umls_kb": pa.table(
            {k: [r[i] for r in concepts] for i, k in enumerate(schemas.UMLS_KB.names)},
            schema=schemas.UMLS_KB,
        ),
        "aliases": pa.table(
            {k: [r[i] for r in alias_rows] for i, k in enumerate(schemas.ALIASES.names)},
            schema=schemas.ALIASES,
        ),
        "gene_map": pa.table(
            {k: [r[i] for r in genes] for i, k in enumerate(schemas.GENE_MAP.names)},
            schema=schemas.GENE_MAP,
        ),
        "protein_map": pa.table(
            {k: [r[i] for r in proteins] for i, k in enumerate(schemas.PROTEIN_MAP.names)},
            schema=schemas.PROTEIN_MAP,
        ),
        "snomed_map": pa.table(
            {k: [r[i] for r in snomed] for i, k in enumerate(schemas.SNOMED_MAP.names)},
            schema=schemas.SNOMED_MAP,
        ),
        "clinical_features": pa.table(
            {k: [r[i] for r in clinfeat] for i, k in enumerate(schemas.CLINICAL_FEATURES.names)},
            schema=schemas.CLINICAL_FEATURES,
        ),
    }
    return tables


# ---------------------------------------------------------------------------
# Transcript generation
# ---------------------------------------------------------------------------

_CASING = ["lower", "title", "upper_first"]


def _cased(surface: str, rng: random.Random) -> str:
    c = rng.choice(_CASING)
    if c == "title":
        return surface.title()
    if c == "upper_first":
        return surface[0].upper() + surface[1:]
    return surface


def _sentence(rng: random.Random, surfaces: list[str], weights: list[float]) -> str:
    words = [rng.choice(_FILLER) for _ in range(rng.randint(4, 10))]
    if rng.random() < 0.6:  # plant 1-2 entity mentions
        n = 1 if rng.random() < 0.8 else 2
        for _ in range(n):
            surf = rng.choices(surfaces, weights=weights, k=1)[0]
            pos = rng.randint(0, len(words))
            words.insert(pos, _cased(surf, rng))
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."


_SHARD_SIZE = 2000  # convs per shard file (~34k turns, ~6 MB): the
# realistic many-MB-file layout.  250-conv shards made sf3 an 1,800-file
# read whose serial driver-side footer prefetch alone cost ~3.5 s — a
# parallelism-independent term that capped scaling efficiency.  Content is
# a pure function of (seed, conv index); sharding only sets file boundaries.


def _gen_context(seed: int) -> tuple[list[str], list[str], list[float]]:
    """(disease_names, surfaces, weights) — the deterministic per-seed
    vocabulary every shard draws from (shipped once to parallel workers)."""
    kb = _kb_tables()
    alias_tab = kb["aliases"]
    # 1-7-word all-alphabetic aliases for conversation-local abbreviation
    # planting ("long form (SF)" definitions — entityrecognition.py:25-27
    # analog); covers single-word chemicals, two-word disease names, and
    # the 3..6-word "chronic ..." through "severe relapsing acquired
    # chronic ..." long forms
    disease_names = sorted(
        a
        for a in set(alias_tab["alias"].to_pylist())
        if a.replace(" ", "").isalpha() and 1 <= len(a.split()) <= 7
    )
    # distinct surfaces, weighted: hot surface ~30% of slots, rest Zipf.
    surfaces = sorted(set(alias_tab["alias"].to_pylist()))
    rng0 = random.Random(seed ^ 0xA5A5)
    hot = surfaces[rng0.randrange(len(surfaces))]
    weights = []
    others = [s for s in surfaces if s != hot]
    zipf = [1.0 / (r + 1) ** 1.1 for r in range(len(others))]
    ztot = sum(zipf)
    for s in surfaces:
        weights.append(0.30 if s == hot else 0.70 * zipf[others.index(s)] / ztot)
    return disease_names, surfaces, weights


def _shard_table(shard: int, n_convs: int, seed: int, disease_names, surfaces, weights):
    """One shard's pa.Table — a pure function of (seed, shard) given the
    per-seed vocabulary, so shards generate in parallel with byte-identical
    rows to the serial loop."""
    base_ts = _dt.datetime(2026, 1, 1)
    conv_ids, turn_idxs, roles, texts, tools, tss = [], [], [], [], [], []
    lo = shard * _SHARD_SIZE
    hi = min(n_convs, lo + _SHARD_SIZE)
    if True:
        for ci in range(lo, hi):
            rng = random.Random((seed << 20) ^ ci)  # per-conversation stream
            conv_id = f"conv~{ci:06d}"
            n_turns = rng.randint(120, 200) if rng.random() < 0.02 else rng.randint(4, 24)
            # conversation-local abbreviation: defined once as "LF (SF)",
            # then used by its short form in later turns.  The 'q' infix
            # keeps SFs disjoint from the KB's global abbreviation aliases
            # (initials + digits) and from the filler vocabulary.
            abbrev = None
            if rng.random() < 0.15:
                lf = disease_names[rng.randrange(len(disease_names))]
                sf = "".join(t[0] for t in lf.split()) + "q" + str(ci % 10)
                abbrev = (lf, sf)
            for ti in range(n_turns):
                role = _ROLES[ti % 3] if rng.random() < 0.9 else rng.choice(_ROLES)
                tool = rng.choice(_TOOLS[:-1]) if role == "tool" else ""
                text = " ".join(
                    _sentence(rng, surfaces, weights) for _ in range(rng.randint(1, 3))
                )
                if abbrev is not None:
                    if ti == 0:
                        text = f"Initial review notes {abbrev[0]} ({abbrev[1]}) in history. " + text
                    elif rng.random() < 0.25:
                        text = text + f" Continue monitoring {abbrev[1]} closely."
                conv_ids.append(conv_id)
                turn_idxs.append(ti)
                roles.append(role)
                texts.append(text)
                tools.append(tool)
                tss.append(base_ts + _dt.timedelta(seconds=ci * 300 + ti * 7))
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, schemas.US),
        },
        schema=schemas.TRANSCRIPTS,
    )


def _transcript_batches(sf: str, n_convs: int, seed: int):
    """Yield (shard_idx, pyarrow.Table) per shard of conversations."""
    disease_names, surfaces, weights = _gen_context(seed)
    n_shards = (n_convs + _SHARD_SIZE - 1) // _SHARD_SIZE
    for shard in range(n_shards):
        yield shard, _shard_table(shard, n_convs, seed, disease_names, surfaces, weights)


# ---------------------------------------------------------------------------
# Idempotent, atomic materialization
# ---------------------------------------------------------------------------


def _atomic_build(target: str, build_fn) -> str:
    """Build into target.tmp.<pid> then rename; skip if _SUCCESS exists."""
    marker = os.path.join(target, "_SUCCESS")
    if os.path.exists(marker):
        return target
    tmp = f"{target}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    build_fn(tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok\n")
    shutil.rmtree(target, ignore_errors=True)
    try:
        os.rename(tmp, target)
    except OSError:
        # concurrent generator won the race; ours is equivalent (deterministic)
        shutil.rmtree(tmp, ignore_errors=True)
    return target


def ensure_kb() -> str:
    """Generate KB parquet tables once; returns the kb dir."""
    def build(tmp: str):
        for name, tab in _kb_tables().items():
            pq.write_table(tab, os.path.join(tmp, f"{name}.parquet"))
    return _atomic_build(config.kb_dir(), build)


def ensure_transcripts(sf_dir: str, seed: int = config.DEFAULT_SEED) -> str:
    """Generate transcript shards for a testdata sf dir; returns the dir.

    Deterministic for a given (sf, seed); idempotent and atomic, so the
    engine, the oracle, tests and bench can all call it freely.  Shards
    are pure functions of (seed, shard), so when a Ray session is live and
    the corpus is large, generation fans out as one task per shard —
    ROW-IDENTICAL to the serial loop (tested) — turning the ~60-minute
    single-core sf10 build into a minutes job; small corpora and
    Ray-less callers keep the serial path.
    """
    sf = config.sf_name(sf_dir)
    n_convs = config.SF_CONVS[sf]
    target = config.gen_dir(sf_dir)
    n_shards = (n_convs + _SHARD_SIZE - 1) // _SHARD_SIZE

    def build_serial(tmp: str):
        for shard, tab in _transcript_batches(sf, n_convs, seed):
            pq.write_table(tab, os.path.join(tmp, f"part-{shard:05d}.parquet"))

    def build_parallel(tmp: str):
        import io

        import ray

        ctx_ref = ray.put(_gen_context(seed))

        @ray.remote(num_cpus=1)
        def gen_shard(shard: int) -> bytes:
            # tasks return ENCODED PARQUET BYTES and only the driver touches
            # the filesystem: on a multi-node cluster the tmp dir exists
            # only on the driver, so a task-side write would land on the
            # wrong machine (or crash) — generation/encoding is the CPU
            # cost and parallelizes; the driver's sequential writes are
            # pure I/O appends
            disease_names, surfaces, weights = ray.get(ctx_ref)
            tab = _shard_table(shard, n_convs, seed, disease_names, surfaces, weights)
            buf = io.BytesIO()
            pq.write_table(tab, buf)
            return buf.getvalue()

        refs = [gen_shard.remote(i) for i in range(n_shards)]
        for shard, ref in enumerate(refs):
            with open(os.path.join(tmp, f"part-{shard:05d}.parquet"), "wb") as f:
                f.write(ray.get(ref))

    def build(tmp: str):
        import ray

        if n_shards >= 8 and ray.is_initialized():
            build_parallel(tmp)
        else:
            build_serial(tmp)

    _atomic_build(target, build)
    ensure_kb()
    return target
