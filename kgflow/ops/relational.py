"""Generic relational operators (engine-generality demos over the
driver's TPC-H-ish tables): grouped aggregation with combiner,
broadcast hash join, top-k, tumbling-window aggregation.

These exist to exercise and validate the engine's wide-operation
machinery against DuckDB oracles; the KG pipeline reuses the same
patterns (partial+final agg ≙ A2 metric, broadcast join ≙
CanonicalizeStage).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum


def pricing_summary(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q1-style pricing summary over lineitem (column-pruned read,
    built-in distributed aggregate = partial+final under the hood)."""
    from kgflow.sources.parquet import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def add_rev(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rev = pc.multiply(
            batch.column("l_extendedprice"), pc.subtract(1.0, batch.column("l_discount"))
        )
        return batch.append_column("revenue", rev)

    ds = ds.map_batches(add_rev, batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("revenue", alias_name="sum_revenue"),
        Mean("l_discount", alias_name="avg_disc"),
        Count(alias_name="n"),
    )
    return out


def top_customers(sf_dir: str, k: int = 10) -> "rd.Dataset":
    """Top-k customers by total order value: broadcast hash join
    (customer side is small → ray.put once, dict lookup per batch) +
    combiner-reduced groupby + global top-k."""
    cust = pd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
    )
    ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))
    from kgflow.sources.parquet import read_parquet_clean

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", as_index=False).agg(
            total=("o_totalprice", "sum"), n_orders=("o_totalprice", "size")
        )
        return g

    partials = orders.map_batches(partial, batch_format="pandas")

    # |customers| distinct keys → bucketed reduce (native sort-based
    # aggregate pays the measured high-cardinality penalty, see
    # kgflow/ops/shuffle.py), and the reduce emits only its bucket's
    # top-k, so the final global sort runs over ≤ num_buckets×k rows
    # instead of |customers|.
    from kgflow.ops.shuffle import bucketed_group_reduce

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("o_custkey", as_index=False).agg(
            total_spent=("total", "sum"), n_orders=("n_orders", "sum")
        )
        # same tie order as the oracle: total DESC, then custkey ASC
        return agg.sort_values(
            ["total_spent", "o_custkey"], ascending=[False, True], kind="mergesort"
        ).head(k)

    agg = bucketed_group_reduce(
        partials, key_cols=["o_custkey"], reduce_fn=bucket_topk
    )

    class AttachName:
        def __init__(self):
            self.names = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df["c_name"] = [self.names.get(c) for c in df["o_custkey"]]
            return df

    named = agg.map_batches(AttachName, batch_format="pandas", concurrency=(1, 2))
    top = named.sort("total_spent", descending=True).limit(k)
    return top.map_batches(
        lambda df: df[["o_custkey", "c_name", "total_spent", "n_orders"]].astype(
            {"n_orders": np.int64}
        ),
        batch_format="pandas",
    )


def events_hourly(sf_dir: str) -> "rd.Dataset":
    """Tumbling 1-hour window per event_type over the events stream
    table: window key computed vectorized per batch (floor to hour),
    then one grouped aggregate — the batch-engine form of a streaming
    tumbling window (SURVEY.md §2.10: the reference has no windows;
    this is the engine's generic windowed-aggregate operator).

    ``value`` is summed in exact fixed-point (int64 of round(value*1e4))
    so the sum is associative — float summation-order drift between
    engines flipped floor(x*1e4) boundaries on 4-decimal-quantized
    inputs (round-1 oracle hash mismatch). One divide at the end."""
    from kgflow.sources.parquet import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts", "value"]
    )

    def add_window(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = pc.floor_temporal(batch.column("ts"), unit="hour")
        v_fp = pc.cast(
            pc.round(pc.multiply(batch.column("value"), 10000.0)), pa.int64()
        )
        return batch.append_column("window_start", w).append_column("value_fp", v_fp)

    ds = ds.map_batches(add_window, batch_format="pyarrow")
    agg = ds.groupby(["event_type", "window_start"]).aggregate(
        Count(alias_name="n"), Sum("value_fp", alias_name="sum_value_fp")
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = df["sum_value_fp"].to_numpy(dtype=np.int64) / 1e4
        df["n"] = df["n"].astype(np.int64)
        return df[["event_type", "window_start", "n", "sum_value"]]

    return agg.map_batches(finish, batch_format="pandas")


def supplier_nation_rollup(sf_dir: str) -> "rd.Dataset":
    """Two-level broadcast-join rollup: supplier → nation → region,
    account balance totals per region (both dimension sides broadcast)."""
    nation = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    region = pd.read_parquet(os.path.join(sf_dir, "region.parquet"))
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    ref = ray.put((n2r, r2name))
    from kgflow.sources.parquet import read_parquet_clean

    supp = read_parquet_clean(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_nationkey", "s_acctbal"]
    )

    class Attach:
        def __init__(self):
            self.n2r, self.r2name = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df["r_name"] = [self.r2name[self.n2r[n]] for n in df["s_nationkey"]]
            return df[["r_name", "s_acctbal"]]

    return (
        supp.map_batches(Attach, batch_format="pandas", concurrency=(1, 2))
        .groupby("r_name")
        .aggregate(Sum("s_acctbal", alias_name="total_acctbal"), Count(alias_name="n_suppliers"))
    )
