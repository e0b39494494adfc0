"""Edge/node materialization: exact dedup, bucket sort, partitioned write.

North-rule sink (SURVEY.md §2.8, §7 step 8): the reference does NOT
dedup its cross-product triples (`/root/reference/src/openue/models/
model.py:382-384` can emit duplicates); the KG sink requires sorted,
deduplicated edge/node tables partitioned by subject hash.

Shuffle plan:
- exact dedup = ONE hash shuffle ``groupby(subj_id, rel_id, obj_id)``
  emitting (edge, weight=#occurrences, sample provenance);
- ``subj_bucket = subj_id % num_buckets`` is the single partitioning key
  reused for the sort and the sink layout (pick ONE key, reuse it);
- sort happens WITHIN buckets (``groupby(subj_bucket).map_groups(sort)``)
  — a per-partition sort, not a global one, so there is no extra
  all-to-all range-partition pass; the bucket directory layout makes the
  global order recoverable (bucket id, then sorted within).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def add_bucket(num_buckets: int):
    from kgflow.linking.minhash import mix64_np

    def _add(batch: pa.Table) -> pa.Table:
        # mix before modulo: raw hash low bits are not uniform
        b = (
            mix64_np(batch.column("subj_id").to_numpy().astype(np.uint64))
            % np.uint64(num_buckets)
        ).astype(np.int32)
        return batch.append_column("subj_bucket", pa.array(b))

    return _add


def dedup_edges(canon: "rd.Dataset", num_buckets: int = 16) -> "rd.Dataset":
    """canonicalized triples → deduplicated weighted edges.

    Output: subj_id, rel_id, obj_id, subj_canonical, rel, obj_canonical,
    weight, sample_url, subj_bucket — sorted within each subj_bucket.
    """
    cols = canon.select_columns(
        ["subj_id", "rel_id", "obj_id", "subj_canonical", "rel", "obj_canonical", "url"]
    )

    # per-batch partial dedup (combiner) shrinks the shuffle input
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(
                ["subj_id", "rel_id", "obj_id", "subj_canonical", "rel", "obj_canonical"],
                as_index=False,
            )
            .agg(weight=("url", "size"), sample_url=("url", "min"))
        )
        return g

    partials = cols.map_batches(partial, batch_format="pandas")

    # ONE bucketed shuffle does dedup + weight-sum + in-bucket sort and
    # yields the sink partition key. The bucket is keyed on subj_id ONLY
    # (not the full edge key) so the bucket IS the subject-hash sink
    # partition; the in-bucket reduction is a vectorized pandas groupby
    # (the per-group Python of map_groups over |edges| groups, and Ray's
    # native sort-based aggregate, both measured ~40x slower — see
    # kgflow/ops/shuffle.py).
    from kgflow.ops.shuffle import bucketed_group_reduce

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["subj_id", "rel_id", "obj_id"], as_index=False).agg(
            subj_canonical=("subj_canonical", "first"),
            rel=("rel", "first"),
            obj_canonical=("obj_canonical", "first"),
            weight=("weight", "sum"),
            sample_url=("sample_url", "min"),
        )
        return out.sort_values(["subj_id", "rel_id", "obj_id"], kind="mergesort")

    return bucketed_group_reduce(
        partials,
        key_cols=["subj_id"],
        reduce_fn=finalize,
        num_buckets=num_buckets,
        keep_bucket=True,
        bucket_col="subj_bucket",
    )


def nodes_table(emap_ds: "rd.Dataset") -> "rd.Dataset":
    """entity_map → nodes(entity_id, canonical, aliases list, n_mentions).

    One bucketed shuffle on entity_id; the in-bucket reduction is a
    single pandas groupby (C hash aggregation) rather than a Ray
    map_groups task per entity (round-1 fix — see the measured 40x note
    in kgflow/ops/shuffle.py)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def reduce_nodes(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("entity_id", as_index=False).agg(
            canonical=("canonical", "first"),
            aliases=("mention", lambda s: sorted(set(s))),
            n_mentions=("n", "sum"),
        )
        out["entity_id"] = out["entity_id"].astype(np.int64)
        out["n_mentions"] = out["n_mentions"].astype(np.int64)
        return out

    return bucketed_group_reduce(
        emap_ds, key_cols=["entity_id"], reduce_fn=reduce_nodes
    )


def edges_delta(
    old: "rd.Dataset",
    new: "rd.Dataset",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Incremental-build diff between two canonical edge sets (the
    re-crawl primitive: what changed in the KG between snapshot N-1
    and N): per edge key (subj_id, rel_id, obj_id) emit
    (change ∈ {'added', 'removed', 'reweighted'}, old_weight,
    new_weight) — unchanged edges are dropped, so the output is
    delta-bounded, not KG-bounded.

    PRECONDITION: both inputs must already be key-UNIQUE (one row per
    edge key — i.e. `dedup_edges` output); joining partial rows would
    multiply them. The per-block groupby below is a slimming
    projection, not a global reduce.

    Scale shape: both sides slim to (edge key, weight) BEFORE the
    ONE full-outer key-keyed join (names/urls never ride the diff);
    missing-side weights are 0 via the join's nullable-Int64 path.
    Downstream, a partitioned sink only rewrites the subj_buckets the
    delta touches."""
    from kgflow.ops.joins import hash_join

    KEY = ["subj_id", "rel_id", "obj_id"]

    def slim(df: pd.DataFrame, col: str) -> pd.DataFrame:
        g = df.groupby(KEY, as_index=False)["weight"].sum()
        return g.rename(columns={"weight": col}).astype({col: "int64"})

    o = old.select_columns([*KEY, "weight"]).map_batches(
        lambda d: slim(d, "old_weight"), batch_format="pandas"
    )
    n = new.select_columns([*KEY, "weight"]).map_batches(
        lambda d: slim(d, "new_weight"), batch_format="pandas"
    )
    j = hash_join(o, n, on=KEY, how="full", num_buckets=num_buckets)

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        ow = df["old_weight"].fillna(0).to_numpy(dtype=np.int64)
        nw = df["new_weight"].fillna(0).to_numpy(dtype=np.int64)
        change = np.where(
            ow == 0, "added", np.where(nw == 0, "removed", "reweighted")
        )
        out = pd.DataFrame(
            {
                "subj_id": df["subj_id"].to_numpy(dtype=np.int64),
                "rel_id": df["rel_id"].to_numpy(dtype=np.int64),
                "obj_id": df["obj_id"].to_numpy(dtype=np.int64),
                "change": change,
                "old_weight": ow,
                "new_weight": nw,
            }
        )
        return out.loc[ow != nw]

    return j.map_batches(classify, batch_format="pandas")
