"""Parquet reading helpers.

``read_parquet_clean`` strips schema-level metadata (the ``pandas``
key pyarrow embeds when a frame was written from pandas) by passing an
explicit metadata-free schema to ``ray.data.read_parquet``. Dict-valued
metadata makes Ray's schema-dedup cache log "Failed to hash the
schemas (for deduplication): unhashable type: 'dict'" from inside every
read task — a benign optimization miss, but per-task log noise that
cannot be filtered from the driver. The metadata carries no information
the engine uses (column names/types are in the schema proper).
"""

from __future__ import annotations

import glob
import os

import ray.data as rd


def read_parquet_clean(path: str, columns: list[str] | None = None, **kwargs):
    import pyarrow.parquet as pq

    f = path
    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if parts:
            f = parts[0]
    try:
        schema = pq.read_schema(f).remove_metadata()
    except Exception:
        return rd.read_parquet(path, columns=columns, **kwargs)
    if columns is not None:
        # with a projection, Ray expects the PROJECTED schema
        import pyarrow as pa

        schema = pa.schema([schema.field(c) for c in columns])
        return rd.read_parquet(path, columns=columns, schema=schema, **kwargs)
    return rd.read_parquet(path, schema=schema, **kwargs)


def read_parquet_evolved(path: str, columns: list[str] | None = None):
    """Schema-evolution read over a directory of Parquet shards whose
    schemas DRIFTED over time (columns added/removed, ints widened) —
    the long-lived-corpus reality `ray.data.read_parquet` rejects
    ("schemas are incompatible"). Aligns every shard to the UNION
    schema by name: missing columns surface as typed nulls, integer
    and float widths widen to the widest seen (int32+int64 → int64,
    float+double → double), identical names with irreconcilable types
    fail LOUDLY naming the column and both types.

    Scale shape: schema discovery reads FOOTERS only (driver-side,
    file-count bounded — the same cost class as listing); the data
    pass is one ordinary parallel read per shard-group with a
    zero-copy-where-possible cast inside ``map_batches``. Shards are
    grouped by physical schema so each group is one clean
    ``read_parquet`` (Ray never sees mixed schemas)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = (
        sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        if os.path.isdir(path)
        else [path]
    )
    if not files:
        raise FileNotFoundError(f"read_parquet_evolved: no parquet under {path}")

    def _widen(a: pa.DataType, b: pa.DataType) -> pa.DataType:
        if a.equals(b):
            return a
        ints = {pa.int8(): 8, pa.int16(): 16, pa.int32(): 32, pa.int64(): 64}
        if a in ints and b in ints:
            return a if ints[a] >= ints[b] else b
        floats = {pa.float32(): 32, pa.float64(): 64}
        if a in floats and b in floats:
            return pa.float64()
        if (a in ints and b in floats) or (a in floats and b in ints):
            return pa.float64()
        raise TypeError(
            f"read_parquet_evolved: irreconcilable types {a} vs {b}"
        )

    union: dict[str, pa.DataType] = {}
    order: list[str] = []
    groups: dict[tuple, list[str]] = {}
    for f in files:
        s = pq.read_schema(f).remove_metadata()
        key = tuple((n, str(s.field(n).type)) for n in s.names)
        groups.setdefault(key, []).append(f)
        for n in s.names:
            t = s.field(n).type
            if n in union:
                try:
                    union[n] = _widen(union[n], t)
                except TypeError as e:
                    raise TypeError(f"{e} (column {n!r})") from None
            else:
                union[n] = t
                order.append(n)
    if columns is not None:
        missing = [c for c in columns if c not in union]
        if missing:
            raise KeyError(
                f"read_parquet_evolved: columns {missing} in no shard"
            )
        order = [c for c in order if c in columns]
    target = pa.schema([(n, union[n]) for n in order])

    def align(batch: pa.Table) -> pa.Table:
        cols = []
        for fld in target:
            if fld.name in batch.column_names:
                cols.append(batch.column(fld.name).cast(fld.type))
            else:
                cols.append(pa.nulls(batch.num_rows, fld.type))
        return pa.table(dict(zip(target.names, cols)), schema=target)

    def _cheapest_column(fs: list[str]) -> str | None:
        # smallest total compressed size per footer metadata — the
        # minimum-I/O way to learn row counts when NONE of the
        # requested columns exist in this shard group (align() then
        # synthesizes all-null columns; the read column is dropped)
        sizes: dict[str, int] = {}
        for f in fs:
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                rgm = md.row_group(rg)
                for ci in range(rgm.num_columns):
                    c = rgm.column(ci)
                    name = c.path_in_schema.split(".")[0]
                    sizes[name] = (
                        sizes.get(name, 0) + c.total_compressed_size
                    )
        return min(sizes, key=sizes.get) if sizes else None

    parts = []
    for key, fs in sorted(groups.items()):
        have = [n for n, _ in key if columns is None or n in columns]
        if not have:
            cheap = _cheapest_column(fs)
            ds = rd.read_parquet(
                fs, columns=[cheap] if cheap is not None else None
            )
        else:
            ds = rd.read_parquet(fs, columns=have)
        parts.append(ds.map_batches(align, batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
