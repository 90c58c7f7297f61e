"""medknowledgegraph_ray — a from-scratch, Ray-Data-native knowledge-graph
construction engine with the capabilities of
`medical-knowledge-graph/medknowledgegraph` (reference, read-only at
/root/reference), re-realized as a streaming dataflow over Parquet tables of
multi-turn conversation transcripts (conv_id, turn_idx, role, text, tool, ts).

Nothing in this package calls ray.init()/ray.shutdown(); sessions are owned
by bench.py / the test fixture / the external driver.
"""

__version__ = "0.1.0"

# NOTE on shuffle strategy: Ray 2.49's HASH_SHUFFLE strategy was measured
# 3–100× SLOWER than the default sort-based pull shuffle on this engine's
# keyed exchanges (conv-entity distinct 17 s → 54 s, count aggregate
# 0.3 s → 65 s at sf1/32 CPUs), so the engine keeps the default sort
# shuffle and bounds its cost by two-phase partial aggregation + bounded
# reduce partition counts instead (stages/distinct.py, config.shuffle_blocks).
