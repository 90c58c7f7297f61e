"""Checkpoint manifest: per-partition lineage + metrics, resume-safe writes.

The reference's only idempotency is Cypher MERGE (re-running a request
converges, /root/reference/pymedgraph/graph/neo4jconnector.py:140-143); it
has no checkpoint/resume.  At 100 TB a failed job must NOT redo finished
partitions, so every stage write here is:

  1. computed into `<out>.tmp.<pid>` (deterministic content),
  2. atomically renamed to `<out>`,
  3. recorded as a JSONL manifest row with lineage
     (stage, partition, input shard, rows out, output path, status).

On restart the driver skips partitions whose manifest row is `done` AND
whose output directory still exists.  Failures are recorded loudly — the
reference's silent `query() → None` swallow (neo4jconnector.py:232-242) is
deliberately not reproduced.
"""

from __future__ import annotations

import json
import os
import shutil


class Manifest:
    def __init__(self, path: str):
        import threading

        self.path = path
        self._entries: list[dict] = []
        self._lock = threading.Lock()  # commits may run from worker threads
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        self._entries.append(json.loads(line))

    def record(self, stage: str, partition: str, status: str, **info) -> None:
        entry = {"stage": stage, "partition": partition, "status": status, **info}
        with self._lock:
            self._entries.append(entry)
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            with open(self.path, "a") as f:
                f.write(json.dumps(entry, sort_keys=True) + "\n")

    def completed(self, stage: str) -> dict[str, dict]:
        """partition → latest `done` entry whose output still exists."""
        done: dict[str, dict] = {}
        for e in self._entries:
            if e["stage"] != stage:
                continue
            if e["status"] == "done" and os.path.exists(e.get("output_path", "")):
                done[e["partition"]] = e
            elif e["partition"] in done and e["status"] != "done":
                del done[e["partition"]]
        return done

    def entries(self) -> list[dict]:
        return list(self._entries)


def atomic_write_parquet(ds, out_dir: str) -> str:
    """write_parquet into a tmp dir, then atomic rename to out_dir.

    Ray task retries can leave duplicate part files on partial failure; the
    rename commit makes the partition all-or-nothing (D4/MERGE analog).
    """
    tmp = f"{out_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.dirname(out_dir) or ".", exist_ok=True)
    ds.write_parquet(tmp)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return out_dir
