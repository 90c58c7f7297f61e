"""medknowledgegraph_ray — a from-scratch, Ray-Data-native knowledge-graph
construction engine with the capabilities of
`medical-knowledge-graph/medknowledgegraph` (reference, read-only at
/root/reference), re-realized as a streaming dataflow over Parquet tables of
multi-turn conversation transcripts (conv_id, turn_idx, role, text, tool, ts).

Nothing in this package calls ray.init()/ray.shutdown(); sessions are owned
by bench.py / the test fixture / the external driver.
"""

__version__ = "0.1.0"

# Concurrent Dataset executions (e.g. the parallel edge/node sink commits)
# race inside Ray's per-call `from fsspec.implementations.http import
# HTTPFileSystem` probe (ray/data/datasource/path_util.py:_is_http_filesystem):
# the import FAILS here (no aiohttp), is retried on every path resolution,
# and two threads failing the same import concurrently can surface as an
# uncaught `ImportError: cannot import name ...` instead of the caught
# ModuleNotFoundError.  Pre-seed a stub module so the probe import succeeds
# deterministically; the stub class matches no real filesystem, so the
# isinstance check correctly returns False.
try:  # pragma: no cover - environment-dependent
    from fsspec.implementations.http import HTTPFileSystem as _HTTPFileSystem  # noqa: F401
except ModuleNotFoundError as _e:
    # Scope the workaround to the exact known failure (missing aiohttp) so a
    # genuinely broken fsspec install still raises normally elsewhere.
    if _e.name not in ("aiohttp", "fsspec.implementations.http"):
        raise
    import sys as _sys
    import types as _types

    class _NoHTTPFileSystem:
        """Sentinel stub: matches no real filesystem; http:// paths that
        reach an isinstance check resolve as non-HTTP rather than racing a
        repeated failing import."""

    _mod = _types.ModuleType("fsspec.implementations.http")
    _mod.__doc__ = (
        "STUB installed by medknowledgegraph_ray.__init__ because aiohttp is "
        "absent: Ray Data's per-path HTTPFileSystem import probe races under "
        "concurrent Dataset executions when the import fails repeatedly. "
        "Install aiohttp to get the real module."
    )
    _mod.HTTPFileSystem = _NoHTTPFileSystem
    _sys.modules["fsspec.implementations.http"] = _mod

# NOTE on shuffle strategy: Ray 2.49's HASH_SHUFFLE strategy was measured
# 3–100× SLOWER than the default sort-based pull shuffle on this engine's
# keyed exchanges (conv-entity distinct 17 s → 54 s, count aggregate
# 0.3 s → 65 s at sf1/32 CPUs), so the engine keeps the default sort
# shuffle and bounds its cost by two-phase partial aggregation + bounded
# reduce partition counts instead (stages/distinct.py, config.sort_blocks).
