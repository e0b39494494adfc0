"""Per-partition Bloom sidecar index for hive-partitioned Parquet —
point-lookup pruning on a NON-partition column. The edge sink
partitions by subject hash, so subject probes already hit one
directory; an OBJECT probe ("which partitions assert anything about
entity X as object?") would otherwise read every partition. A small
Bloom filter per partition over the probed column turns that into
"read only the partitions whose filter says maybe" — the classic
file-skipping index (Parquet bloom filters / Iceberg puffin shape),
kept as explicit sidecars so the layout works on any store.

Scale shape: build = ONE Ray task per partition (column-pruned read
of the key column only, vectorized uint64 mixing — no Python per
row); sidecars are numpy bit arrays under ``<table>/_bloom/<col>/``,
each ``n_bits/8`` bytes regardless of partition size. Lookup reads
the sidecars (index-bounded, never the data) and returns the maybe
set per key; false positives only ever cost an extra partition read,
never a wrong answer (membership is re-checked by the actual read).

Hashing: k probe positions from the splitmix64-finalized key via the
(h1 + i·h2) double-hash scheme — deterministic across runs/engines.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import ray


def _mix(v: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer over uint64 keys (vectorized)."""
    x = v.astype(np.uint64) + np.uint64(salt)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _positions(keys: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(len(keys), k) probe positions."""
    h1 = _mix(keys, 0x9E3779B97F4A7C15)
    h2 = _mix(keys, 0xC2B2AE3D27D4EB4F) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(n_bits)).astype(
        np.int64
    )


def _index_dir(table_dir: str, key_col: str) -> str:
    return os.path.join(table_dir, "_bloom", key_col)


@ray.remote
def _build_one(
    part_dir: str, key_col: str, n_bits: int, k: int, out_path: str
) -> dict:
    import pyarrow.parquet as pq

    t = pq.read_table(part_dir, columns=[key_col])
    keys = t.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
    bits = np.zeros(n_bits, dtype=bool)
    if len(keys):
        pos = _positions(keys.view(np.uint64), n_bits, k)
        bits[pos.ravel()] = True
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    np.save(tmp + ".npy", np.packbits(bits))
    os.replace(tmp + ".npy", out_path)
    return {
        "partition": os.path.basename(part_dir),
        "n_keys": int(len(keys)),
        "fill": float(bits.mean()),
    }


def build_bloom_index(
    table_dir: str,
    key_col: str,
    n_bits: int = 1 << 17,
    k: int = 4,
    partition_glob: str = "*=*",
) -> list[dict]:
    """Build one Bloom sidecar per partition over ``key_col``; returns
    per-partition (partition, n_keys, fill). Sidecars land under
    ``<table>/_bloom/<key_col>/<partition>.npy`` via atomic rename."""
    if n_bits % 8:
        raise ValueError("build_bloom_index: n_bits must be a multiple of 8")
    parts = sorted(
        p
        for p in glob.glob(os.path.join(table_dir, partition_glob))
        if os.path.isdir(p) and not os.path.basename(p).startswith("_")
    )
    idx = _index_dir(table_dir, key_col)
    refs = [
        _build_one.remote(
            p,
            key_col,
            n_bits,
            k,
            os.path.join(idx, os.path.basename(p) + ".npy"),
        )
        for p in parts
    ]
    out = [ray.get(r) for r in refs]
    return sorted(out, key=lambda r: r["partition"])


def bloom_lookup(
    table_dir: str,
    key_col: str,
    keys: list[int],
    n_bits: int = 1 << 17,
    k: int = 4,
) -> dict[int, list[str]]:
    """For each key, the partitions whose filter says MAYBE (superset
    of the true locations). Reads only the sidecars."""
    idx = _index_dir(table_dir, key_col)
    sidecars = sorted(glob.glob(os.path.join(idx, "*.npy")))
    if not sidecars:
        raise FileNotFoundError(
            f"bloom_lookup: no index at {idx} — run build_bloom_index first"
        )
    ks = np.asarray(list(keys), dtype=np.int64)
    pos = _positions(ks.view(np.uint64), n_bits, k)
    out: dict[int, list[str]] = {int(x): [] for x in ks}
    for sc in sidecars:
        bits = np.unpackbits(np.load(sc)).astype(bool)
        if len(bits) != n_bits:
            raise ValueError(
                f"bloom_lookup: sidecar {sc} has {len(bits)} bits, "
                f"expected {n_bits} — rebuild with matching n_bits"
            )
        hit = bits[pos].all(axis=1)
        part = os.path.basename(sc)[: -len(".npy")]
        for x in ks[hit]:
            out[int(x)].append(part)
    return out


def read_pruned(
    table_dir: str,
    key_col: str,
    keys: list[int],
    n_bits: int = 1 << 17,
    k: int = 4,
    columns: list[str] | None = None,
) -> "object":
    """Bloom-pruned point read: consult the sidecars, read ONLY the
    maybe-partitions (column-pruned), and apply the exact key filter
    inside `map_batches` — false positives cost an extra partition
    read and are then filtered out, so the result is exact. Returns a
    ray.data.Dataset; an empty maybe-set returns an empty Dataset
    without touching storage."""
    import pyarrow.compute as pc
    import ray.data as rd

    maybe = bloom_lookup(table_dir, key_col, keys, n_bits=n_bits, k=k)
    parts = sorted({p for ps in maybe.values() for p in ps})
    if not parts:
        import pyarrow as pa

        return rd.from_arrow(pa.table({key_col: pa.array([], pa.int64())}))
    want = set(int(x) for x in keys)
    cols = columns if columns is None else list({*columns, key_col})
    files = sorted(
        f
        for p in parts
        for f in glob.glob(os.path.join(table_dir, p, "*.parquet"))
    )
    ds = rd.read_parquet(files, columns=cols)

    def exact(batch):
        import pyarrow as pa

        mask = pc.is_in(
            batch.column(key_col),
            value_set=pa.array(sorted(want), pa.int64()),
        )
        return batch.filter(mask)

    return ds.map_batches(exact, batch_format="pyarrow")
