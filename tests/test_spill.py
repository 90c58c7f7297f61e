"""Memory-pressure behavior: the pinned materializations (ce, the distinct
flagged intermediates) must degrade to Ray's disk spill, not OOM, when the
object store is far smaller than the working set.

VERDICT r01 watch item: `sort → map_batches → materialize()` pins must not
assume store headroom.  Verified at sf3 manually (300 MB store, identical
counts); this test keeps the property at sf0.01 in CI time.  Runs in a
subprocess because the store cap must be set at ray.init.
"""

import subprocess
import sys

_SCRIPT = r"""
import sys; sys.path.insert(0, "/root/repo")
import shutil, ray, logging
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR", object_store_memory=80 * 1024 * 1024)
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)
from medknowledgegraph_ray.pipelines import kg
shutil.rmtree("/tmp/kg_spill_test", ignore_errors=True)
r = kg.build_graph("/root/testdata/sf0.01", "/tmp/kg_spill_test")
print("RESULT", r["n_edges"], r["n_nodes"])
ray.shutdown()
"""


def test_build_completes_with_tiny_object_store():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT], capture_output=True, text=True, timeout=420
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")][0]
    _, n_edges, n_nodes = line.split()
    # counts must match the uncapped build exactly (seeded corpus v5)
    assert (int(n_edges), int(n_nodes)) == (28165, 1748)
