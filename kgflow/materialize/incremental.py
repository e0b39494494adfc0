"""Incremental aggregate maintenance — the materialized-view pattern
for append-only corpora: a persisted (key → count) state that each run
advances by aggregating ONLY the shards it has not seen, then merging
with the prior state in one keyed reduce. At 100 TB the daily delta is
~1% of the corpus; recomputing the aggregate from scratch every day is
the single biggest avoidable cost in a crawl pipeline.

Versioned-state layout (the `_manifest` lineage idea applied to
aggregate state):

    <state_dir>/v{k}/part-*.parquet   -- the counts at version k
    <state_dir>/CURRENT               -- JSON {version, processed:[...]}

Crash safety: a new version directory is fully written BEFORE the
CURRENT pointer swaps via atomic rename; a crash mid-run leaves the
old CURRENT intact and the orphan v{k+1} dir is overwritten by the
next attempt (same idempotent shape as
`kgflow.materialize.compact`). Re-running with no new shards is a
no-op that returns the existing state.
"""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd


def _read_current(state_dir: str) -> dict:
    cur = os.path.join(state_dir, "CURRENT")
    if not os.path.exists(cur):
        return {"version": 0, "processed": []}
    with open(cur) as f:
        return json.load(f)


def incremental_counts(
    state_dir: str,
    shard_paths: list[str],
    key_cols: list[str],
) -> "object":
    """Advance the per-key count state by the UNSEEN shards in
    ``shard_paths`` and return the new state as a ray.data.Dataset
    (key_cols + ``n``). Shards are identified by absolute path; the
    processed list lives in CURRENT, so re-offering old shards is
    free (no read). The merge is ONE keyed reduce over
    state ∪ delta-partials — the state never round-trips through the
    driver."""
    import ray.data as rd

    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    os.makedirs(state_dir, exist_ok=True)
    cur = _read_current(state_dir)
    done = set(cur["processed"])
    new = [os.path.abspath(s) for s in shard_paths]
    new = [s for s in new if s not in done]
    state_path = os.path.join(state_dir, f"v{cur['version']}")

    if not new:
        if cur["version"] == 0:
            raise ValueError(
                "incremental_counts: empty state and no new shards"
            )
        return read_parquet_clean(state_path)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or key_cols[0] not in df.columns:
            out = pd.DataFrame({c: pd.Series([], dtype=object) for c in key_cols})
            out["n"] = pd.Series([], dtype="int64")
            return out
        g = df.groupby(key_cols, as_index=False, sort=False).size()
        return g.rename(columns={"size": "n"})

    delta = rd.read_parquet(new, columns=key_cols).map_batches(
        partial, batch_format="pandas"
    )
    if cur["version"] > 0:
        delta = read_parquet_clean(state_path).union(delta)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_cols, as_index=False, sort=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    merged = bucketed_group_reduce(
        delta, key_cols=key_cols, reduce_fn=merge
    )

    next_v = cur["version"] + 1
    out_dir = os.path.join(state_dir, f"v{next_v}")
    shutil.rmtree(out_dir, ignore_errors=True)  # orphan from a crash
    merged.write_parquet(out_dir)
    tmp = os.path.join(state_dir, "CURRENT.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"version": next_v, "processed": sorted(done | set(new))}, f
        )
    os.replace(tmp, os.path.join(state_dir, "CURRENT"))
    return read_parquet_clean(out_dir)
