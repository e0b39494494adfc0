"""Checkpoint manifest: per-partition lineage + metrics, exact resume.

North-rule requirement (BASELINE.json): every output partition records
lineage (input shard ids, model/vocab hashes, row counts) and metrics in
a manifest enabling exact resume of unfinished partitions. The
reference's closest analogue is its feature cache
(`/root/reference/src/openue/data/utils.py:223-302` — recompute
avoidance keyed by (mode, tokenizer, task)); ours is a durable,
append-only JSONL commit log plus atomic partition directories:

    out_dir/
      triples/shard=K/...parquet     (renamed into place only when done)
      _manifest/commits.jsonl        (one record per committed partition)

Exactly-once under retries: a partition is written to a temp directory
and atomically renamed; the manifest record is appended AFTER the
rename. A crash between rename and append re-runs that partition into a
fresh temp dir and the rename replaces it idempotently.
"""

from __future__ import annotations

import json
import os
import shutil
import time


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.dir = os.path.join(out_dir, "_manifest")
        os.makedirs(self.dir, exist_ok=True)
        self.path = os.path.join(self.dir, "commits.jsonl")

    def committed(self, phase: str) -> dict[str, dict]:
        out: dict[str, dict] = {}
        if not os.path.exists(self.path):
            return out
        with open(self.path) as f:
            for line in f:
                if not line.strip():
                    continue
                rec = json.loads(line)
                if rec.get("phase") == phase:
                    out[rec["partition"]] = rec
        return out

    def commit(self, phase: str, partition: str, **fields) -> dict:
        rec = {
            "phase": phase,
            "partition": partition,
            "ts": time.time(),
            **fields,
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec


def atomic_replace_dir(tmp: str, final: str) -> None:
    """Move ``tmp`` into place at ``final`` (replacing any partial
    previous attempt)."""
    if os.path.exists(final):
        shutil.rmtree(final)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    os.rename(tmp, final)
