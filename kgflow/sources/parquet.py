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
