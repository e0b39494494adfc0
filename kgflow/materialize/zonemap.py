"""Per-partition min/max zone-map sidecars for hive-partitioned
Parquet — RANGE pruning on a clustered column, the sibling of the
Bloom point-lookup index (`kgflow.materialize.bloomindex`). Where the
Bloom sidecar answers "which partitions might contain key X", the zone
map answers "which partitions can overlap [lo, hi]" — the Parquet
row-group-statistics / Iceberg-manifest / Delta-file-stats shape kept
as explicit sidecars so the layout works on any store. Pruning power
comes from LAYOUT: a table sorted (or compacted) by the zoned column
has disjoint per-partition ranges and a range probe reads O(selectivity)
partitions; an unclustered column degrades gracefully to reading
everything, never to a wrong answer (the exact predicate is re-applied
inside the read).

Scale shape: build = ONE Ray task per partition (column-pruned read of
the zoned column only); each sidecar is a 2-int64 npy regardless of
partition size. Lookup reads only sidecars; the pruned read applies
the exact [lo, hi] filter vectorized inside ``map_batches``.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import ray


def _index_dir(table_dir: str, col: str) -> str:
    return os.path.join(table_dir, "_zonemap", col)


@ray.remote
def _build_one(part_dir: str, col: str, out_path: str) -> dict:
    import pyarrow.parquet as pq

    t = pq.read_table(part_dir, columns=[col])
    vals = t.column(col).to_numpy(zero_copy_only=False)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    if len(vals):
        zone = np.array(
            [np.min(vals), np.max(vals)], dtype=np.int64
        )
    else:
        # empty partition: an impossible range that overlaps nothing —
        # [max, min] fails `zone[0] <= hi and zone[1] >= lo` for every
        # probe (unlike [1, 0], which matches any probe spanning 0..1)
        zone = np.array(
            [np.iinfo(np.int64).max, np.iinfo(np.int64).min],
            dtype=np.int64,
        )
    tmp = out_path + ".tmp"
    np.save(tmp + ".npy", zone)
    os.replace(tmp + ".npy", out_path)
    return {
        "partition": os.path.basename(part_dir),
        "n_rows": int(len(vals)),
        "lo": int(zone[0]),
        "hi": int(zone[1]),
    }


def build_zonemap_index(
    table_dir: str,
    col: str,
    partition_glob: str = "*=*",
) -> list[dict]:
    """Build one (min, max) sidecar per partition over int column
    ``col``; returns per-partition (partition, n_rows, lo, hi).
    Sidecars land under ``<table>/_zonemap/<col>/<partition>.npy``
    via atomic rename (idempotent re-runs, crash-safe)."""
    parts = sorted(
        p
        for p in glob.glob(os.path.join(table_dir, partition_glob))
        if os.path.isdir(p) and not os.path.basename(p).startswith("_")
    )
    if not parts:
        raise FileNotFoundError(
            f"build_zonemap_index: no partitions under {table_dir}"
        )
    idx = _index_dir(table_dir, col)
    # clear stale sidecars for partitions that no longer exist, so a
    # lookup never routes a probe to a dropped partition
    live = {os.path.basename(p) + ".npy" for p in parts}
    for sc in glob.glob(os.path.join(idx, "*.npy")):
        if os.path.basename(sc) not in live:
            os.remove(sc)
    refs = [
        _build_one.remote(
            p, col, os.path.join(idx, os.path.basename(p) + ".npy")
        )
        for p in parts
    ]
    out = [ray.get(r) for r in refs]
    return sorted(out, key=lambda r: r["partition"])


def zonemap_lookup(
    table_dir: str, col: str, lo: int, hi: int
) -> list[str]:
    """Partitions whose [min, max] zone overlaps [lo, hi] — a superset
    of the partitions holding matching rows. Reads only sidecars."""
    idx = _index_dir(table_dir, col)
    sidecars = sorted(glob.glob(os.path.join(idx, "*.npy")))
    if not sidecars:
        raise FileNotFoundError(
            f"zonemap_lookup: no index at {idx} — run "
            "build_zonemap_index first"
        )
    out = []
    for sc in sidecars:
        zone = np.load(sc)
        if zone[0] <= hi and zone[1] >= lo:
            out.append(os.path.basename(sc)[: -len(".npy")])
    return out


def read_range_pruned(
    table_dir: str,
    col: str,
    lo: int,
    hi: int,
    columns: list[str] | None = None,
) -> "object":
    """Zone-map-pruned range read: consult the sidecars, read ONLY the
    overlapping partitions (column-pruned), and apply the exact
    [lo, hi] filter inside `map_batches` — overlap false positives
    cost an extra partition read, never a wrong row. Returns a
    ray.data.Dataset; an empty overlap set returns an empty Dataset
    without touching storage."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    parts = zonemap_lookup(table_dir, col, lo, hi)
    cols = columns if columns is None else list({*columns, col})
    files = sorted(
        f
        for p in parts
        for f in glob.glob(os.path.join(table_dir, p, "*.parquet"))
    )
    if not files:
        # no overlapping partitions (or all overlapping ones are
        # file-less) — return an empty Dataset without touching storage
        return rd.from_arrow(pa.table({col: pa.array([], pa.int64())}))
    ds = rd.read_parquet(files, columns=cols)

    def exact(batch: "pa.Table") -> "pa.Table":
        c = batch.column(col)
        mask = pc.and_(
            pc.greater_equal(c, pa.scalar(lo)),
            pc.less_equal(c, pa.scalar(hi)),
        )
        return batch.filter(mask)

    return ds.map_batches(exact, batch_format="pyarrow")
