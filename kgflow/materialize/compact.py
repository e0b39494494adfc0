"""Partition compaction for hive-partitioned Parquet sinks — the
storage-maintenance pass a long-running ingest needs: repeated
incremental writes (resume retries, snapshot deltas, small per-shard
flushes) leave each partition as many small files, and small files
tax every later read (per-file open + footer parse + row-group
scheduling). Compaction rewrites each partition's files into
``ceil(rows / target_rows_per_file)`` files, verifying row counts
before an ATOMIC directory swap, and records per-partition lineage in
the run manifest (phase="compact") so a killed compaction resumes by
skipping committed partitions.

Scale shape: ONE Ray task per partition (raw ``@ray.remote`` by
design — rewrite-in-place with an atomic swap per directory is
filesystem work the Dataset API doesn't express); partitions compact
in parallel and independently, so a 100 TB table compacts as N
bounded tasks with no shuffle and no cross-partition traffic. Row
counts are verified BEFORE the swap — a mismatch aborts that
partition loudly and leaves the original directory untouched.
"""

from __future__ import annotations

import glob
import math
import os

import ray

from kgflow.materialize.manifest import Manifest, atomic_replace_dir


@ray.remote
def _compact_one(part_dir: str, target_rows_per_file: int) -> dict:
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
    rows_before = sum(pq.read_metadata(f).num_rows for f in files)
    n_out = max(1, math.ceil(rows_before / target_rows_per_file))
    if len(files) <= n_out:
        return {
            "partition": os.path.basename(part_dir),
            "files_before": len(files),
            "files_after": len(files),
            "n_rows": int(rows_before),
            "action": "skipped",
        }
    table = pq.read_table(part_dir)
    if table.num_rows != rows_before:
        raise RuntimeError(
            f"compact: {part_dir} read {table.num_rows} rows but file "
            f"footers claim {rows_before} — aborting before any write"
        )
    tmp = part_dir + ".compact_tmp"
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    os.makedirs(tmp)
    per = math.ceil(table.num_rows / n_out)
    written = 0
    for i in range(n_out):
        chunk = table.slice(i * per, per)
        if chunk.num_rows == 0:
            continue
        pq.write_table(chunk, os.path.join(tmp, f"compacted_{i:05d}.parquet"))
        written += chunk.num_rows
    if written != rows_before:
        import shutil

        shutil.rmtree(tmp)
        raise RuntimeError(
            f"compact: {part_dir} rewrote {written} rows != "
            f"{rows_before} — original left untouched"
        )
    atomic_replace_dir(tmp, part_dir)
    return {
        "partition": os.path.basename(part_dir),
        "files_before": len(files),
        "files_after": n_out,
        "n_rows": int(rows_before),
        "action": "compacted",
    }


def compact_partitions(
    table_dir: str,
    target_rows_per_file: int = 1_000_000,
    partition_glob: str = "*=*",
    manifest_dir: str | None = None,
) -> list[dict]:
    """Compact every hive partition under ``table_dir``; returns one
    record per partition (partition, files_before, files_after,
    n_rows, action). Partitions already committed in the manifest's
    "compact" phase are skipped (resume); results commit as they
    land."""
    parts = sorted(
        p
        for p in glob.glob(os.path.join(table_dir, partition_glob))
        if os.path.isdir(p)
    )
    man = Manifest(manifest_dir or table_dir)
    done = man.committed("compact")
    out: list[dict] = []
    pending = []
    for p in parts:
        name = os.path.basename(p)
        if name in done:
            rec = dict(done[name])
            rec["action"] = "resumed"
            out.append(
                {
                    k: rec[k]
                    for k in (
                        "partition",
                        "files_before",
                        "files_after",
                        "n_rows",
                        "action",
                    )
                    if k in rec
                }
            )
            continue
        pending.append(_compact_one.remote(p, target_rows_per_file))
    for ref in pending:
        rec = ray.get(ref)
        fields = {k: v for k, v in rec.items() if k != "partition"}
        man.commit("compact", rec["partition"], **fields)
        out.append(rec)
    return sorted(out, key=lambda r: r["partition"])
