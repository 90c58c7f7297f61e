"""medknowledgegraph_ray — a from-scratch, Ray-Data-native knowledge-graph
construction engine with the capabilities of
`medical-knowledge-graph/medknowledgegraph` (reference, read-only at
/root/reference), re-realized as a streaming dataflow over Parquet tables of
multi-turn conversation transcripts (conv_id, turn_idx, role, text, tool, ts).

Nothing in this package calls ray.init()/ray.shutdown(); sessions are owned
by bench.py / the test fixture / the external driver.
"""

__version__ = "0.1.0"
