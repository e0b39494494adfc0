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


def _events_hourly_agg(sf_dir: str) -> "rd.Dataset":
    """Shared tumbling 1-hour pre-aggregate: (event_type, window_start,
    n, sum_value_fp) with the value sum in exact fixed-point int64 —
    reused by both the tumbling query and the sliding window on top."""
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
    return ds.groupby(["event_type", "window_start"]).aggregate(
        Count(alias_name="n"), Sum("value_fp", alias_name="sum_value_fp")
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
    agg = _events_hourly_agg(sf_dir)

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


def supplier_region_rollup_levels(sf_dir: str) -> "rd.Dataset":
    """ROLLUP demo: supplier account balances summed at (region,
    nation), (region) and grand-total levels
    (`kgflow.ops.reshape.rollup_sum` — one data pass, subtotals
    re-aggregate the aggregate). Balances quantized to fixed-point
    cents BEFORE the rollup so every subtotal is an order-independent
    integer sum; divided once at the end."""
    from kgflow.ops.reshape import rollup_sum
    from kgflow.sources.parquet import read_parquet_clean

    nation = pd.read_parquet(os.path.join(sf_dir, "nation.parquet"))
    region = pd.read_parquet(os.path.join(sf_dir, "region.parquet"))
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    n2name = dict(zip(nation["n_nationkey"], nation["n_name"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    ref = ray.put((n2r, n2name, r2name))

    supp = read_parquet_clean(
        os.path.join(sf_dir, "supplier.parquet"), columns=["s_nationkey", "s_acctbal"]
    )

    class Attach:
        def __init__(self):
            self.n2r, self.n2name, self.r2name = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            nk = df["s_nationkey"]
            return pd.DataFrame(
                {
                    "r_name": [self.r2name[self.n2r[n]] for n in nk],
                    "n_name": [self.n2name[n] for n in nk],
                    "bal_fp": np.round(
                        df["s_acctbal"].to_numpy(dtype=np.float64) * 100
                    ).astype(np.int64),
                }
            )

    tagged = supp.map_batches(Attach, batch_format="pandas", concurrency=(1, 2))
    rolled = rollup_sum(tagged, level_cols=["r_name", "n_name"], sum_cols=["bal_fp"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["total_acctbal"] = df["bal_fp"].to_numpy(dtype=np.int64) / 100.0
        df["n"] = df["n"].astype(np.int64)
        return df[["r_name", "n_name", "total_acctbal", "n"]]

    return rolled.map_batches(finish, batch_format="pandas")


def events_sliding(sf_dir: str, preceding_hours: int = 2) -> "rd.Dataset":
    """Sliding (moving) window over the hourly rollup: per event_type
    and hour, event count and exact value sum over the trailing
    ``preceding_hours``-hours-plus-current-hour window — the classic
    "window over a tumbling pre-aggregate" streaming pattern. The raw
    events are touched once (in the rollup); the slide itself runs over
    |types| × |hours| rows, bucketed by type."""
    from kgflow.ops.window import sliding_time_sum

    hourly = _events_hourly_agg(sf_dir)
    slid = sliding_time_sum(
        hourly,
        key_cols=["event_type"],
        ts_col="window_start",
        sum_cols=["n", "sum_value_fp"],
        preceding_s=preceding_hours * 3600,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n"] = df["n"].astype(np.int64)
        df["w_n"] = df["w_n"].astype(np.int64)
        df["w_sum_value"] = df["w_sum_value_fp"].to_numpy(dtype=np.int64) / 1e4
        return df[["event_type", "window_start", "n", "w_n", "w_sum_value"]]

    return slid.map_batches(finish, batch_format="pandas")


def events_daily_active_users(sf_dir: str) -> "rd.Dataset":
    """Exact distinct-user counts per (event_type, day): the engine's
    grouped COUNT(DISTINCT) — per-batch pair dedup combiner, a shuffle
    bucketed on (group, user) so hot groups' distinct sets parallelize,
    then a tiny partial-count sum (`kgflow.ops.shuffle.grouped_distinct_count`)."""
    from kgflow.ops.shuffle import grouped_distinct_count
    from kgflow.sources.parquet import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts", "user_id"]
    )

    def add_day(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "day", pc.floor_temporal(batch.column("ts"), unit="day")
        ).drop_columns(["ts"])

    ds = ds.map_batches(add_day, batch_format="pyarrow")
    return grouped_distinct_count(
        ds, group_cols=["event_type", "day"], value_col="user_id", out_col="n_users"
    )


#: the events fixture's closed event-type vocabulary — pivots take the
#: value list explicitly (discovery over 10^12 rows is a wasted pass).
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_type_pivot(sf_dir: str) -> "rd.Dataset":
    """Pivot demo: per-day event counts widened to one column per event
    type (`kgflow.ops.reshape.pivot_agg` — long combiner partials, ONE
    group-bucketed exchange, vectorized in-bucket widening). Counts are
    integer-exact, so the result is hash-exact vs the conditional-
    aggregation oracle."""
    from kgflow.ops.reshape import pivot_agg
    from kgflow.sources.parquet import read_parquet_clean

    ds = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def add_day(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "day", pc.floor_temporal(batch.column("ts"), unit="day")
        ).drop_columns(["ts"])

    ds = ds.map_batches(add_day, batch_format="pyarrow")
    return pivot_agg(
        ds, group_cols=["day"], pivot_col="event_type", values=EVENT_TYPES
    )


def events_value_quantiles_by_type(sf_dir: str) -> "rd.Dataset":
    """Per-group exact quantiles demo: quantile_disc of the quantized
    value column PER event_type (`kgflow.ops.profile.grouped_quantiles`
    — fully distributed, no driver histogram pull)."""
    from kgflow.ops.profile import grouped_quantiles
    from kgflow.sources.parquet import read_parquet_clean

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )
    return grouped_quantiles(ev, group_cols=["event_type"], col="value")


def customers_without_big_orders(sf_dir: str, min_total: float = 400_000.0) -> "rd.Dataset":
    """Anti-join demo: customers with NO order above ``min_total``.
    The orders side is filtered and key-projected at the read, reduced
    to distinct custkeys by the semi/anti machinery, and the join
    auto-selects broadcast vs bucketed shuffle
    (`kgflow.ops.joins.anti_join`)."""
    from kgflow.ops.joins import anti_join
    from kgflow.sources.parquet import read_parquet_clean

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal"],
    )
    big = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )

    def keys(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        f = batch.filter(pc.greater(batch.column("o_totalprice"), min_total))
        return pa.table({"c_custkey": f.column("o_custkey")})

    big_keys = big.map_batches(keys, batch_format="pyarrow")
    return anti_join(cust, big_keys, on="c_custkey")


def customer_order_profile(sf_dir: str) -> "rd.Dataset":
    """LEFT-join demo: EVERY customer with order count and largest
    order (0 / 0.0 for customers that never ordered). Orders are
    pre-aggregated to one row per custkey (per-batch combiner + one
    bucketed reduce) BEFORE the join, so the left join's right side is
    dimension-sized and `kgflow.ops.joins.hash_join(how="left")`
    auto-selects broadcast; count and max are order-independent, so the
    result is hash-exact with no floor-scaling."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    )
    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False).agg(
            n_orders=("o_totalprice", "size"), max_order=("o_totalprice", "max")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_custkey", as_index=False).agg(
            n_orders=("n_orders", "sum"), max_order=("max_order", "max")
        )
        return out.rename(columns={"o_custkey": "c_custkey"})

    # custkey-bounded aggregate: materialize so the join's broadcast
    # decision count is metadata and the blocks are reused (not a second
    # execution of the orders scan + reduce)
    agg = bucketed_group_reduce(
        orders.map_batches(partial, batch_format="pandas"),
        key_cols=["o_custkey"],
        reduce_fn=final,
    ).materialize()
    joined = hash_join(cust, agg, on="c_custkey", how="left")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["n_orders"] = df["n_orders"].fillna(0).astype(np.int64)
        df["max_order"] = df["max_order"].astype("float64").fillna(0.0)
        return df[["c_custkey", "c_name", "n_orders", "max_order"]]

    return joined.map_batches(finish, batch_format="pandas")


def orders_top_per_priority(sf_dir: str, k: int = 3) -> "rd.Dataset":
    """Grouped top-k demo: the k highest-value orders per order
    priority (`kgflow.ops.shuffle.grouped_topk` — per-block combiner,
    one group-bucketed shuffle of ≤ blocks×groups×k rows). Tie order
    (price DESC, orderkey ASC) is total, so output is deterministic and
    hash-exact — prices pass through unmodified."""
    from kgflow.ops.shuffle import grouped_topk
    from kgflow.sources.parquet import read_parquet_clean

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_orderkey", "o_totalprice"],
    )
    return grouped_topk(
        orders,
        group_cols=["o_orderpriority"],
        sort_cols=["o_totalprice", "o_orderkey"],
        ascending=[False, True],
        k=k,
    )


def q3_shipping(
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> "rd.Dataset":
    """TPC-H Q3-style shipping priority: top-k open orders of one market
    segment by outstanding revenue. Exercises the full join ladder:

    - customer is reduced to a broadcast custkey SET (semi-join filter
      pushed into the orders scan — never a shuffle for a dim filter);
    - orders⋈lineitem is the fact-fact equi-join on orderkey via
      `kgflow.ops.joins.hash_join` (auto broadcast-vs-shuffle);
    - revenue sums in exact fixed-point int64; the grouped top-k uses
      the bucketed reduce emitting only per-bucket top-k rows.
    """
    import numpy as _np

    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    cut = np.datetime64(cutoff, "us")

    cust = pd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    seg_keys = ray.put(
        np.sort(cust.loc[cust["c_mktsegment"] == segment, "c_custkey"].to_numpy())
    )

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    )

    class FilterOrders:
        def __init__(self):
            self.keys = ray.get(seg_keys)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = (df["o_orderdate"].to_numpy() < cut) & _np.isin(
                df["o_custkey"].to_numpy(), self.keys, assume_unique=False
            )
            return df.loc[m, ["o_orderkey", "o_orderdate", "o_orderpriority"]]

    orders_f = orders.map_batches(
        FilterOrders, batch_format="pandas", concurrency=(1, 4)
    )

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def line_rev(df: pd.DataFrame) -> pd.DataFrame:
        m = df["l_shipdate"].to_numpy() > cut
        d = df.loc[m]
        rev_fp = np.round(
            d["l_extendedprice"].to_numpy() * (1.0 - d["l_discount"].to_numpy()) * 1e4
        ).astype(np.int64)
        return pd.DataFrame({"o_orderkey": d["l_orderkey"].to_numpy(), "rev_fp": rev_fp})

    line_f = line.map_batches(line_rev, batch_format="pandas")

    joined = hash_join(line_f, orders_f, on="o_orderkey")

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(
            ["o_orderkey", "o_orderdate", "o_orderpriority"], as_index=False, sort=False
        )["rev_fp"].sum()
        return agg.sort_values(
            ["rev_fp", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(k)

    top = bucketed_group_reduce(joined, key_cols=["o_orderkey"], reduce_fn=bucket_topk)
    top = top.sort(["rev_fp", "o_orderkey"], descending=[True, False]).limit(k)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["revenue"] = df["rev_fp"].to_numpy(dtype=np.int64) / 1e4
        return df[["o_orderkey", "revenue", "o_orderdate", "o_orderpriority"]]

    return top.map_batches(finish, batch_format="pandas")


def customer_year_activity_full(
    sf_dir: str, y1: int = 1995, y2: int = 1996
) -> "rd.Dataset":
    """FULL-outer-join demo: per-customer order counts in ``y1`` vs
    ``y2``. Customers active in only one of the years exercise BOTH
    null-extension directions non-vacuously (TPC-H-shaped data has no
    orphan custkeys, so a full join of raw tables would degenerate to a
    left join). Both sides are custkey-bounded aggregates (per-batch
    combiner + one bucketed reduce each); `hash_join(how="full")` is
    shuffle-only by construction — unmatched-right emission needs global
    matched-key knowledge no broadcast block can have. Counts COALESCE
    to 0 on both the engine and SQL side, keeping every column int64
    and hash-exact."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"],
    )

    def year_count(year: int, out_col: str) -> "rd.Dataset":
        lo, hi = pd.Timestamp(f"{year}-01-01"), pd.Timestamp(f"{year + 1}-01-01")

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            d = df[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)]
            g = d.groupby("o_custkey", as_index=False).size()
            return g.rename(columns={"size": out_col})

        def final(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("o_custkey", as_index=False)[out_col].sum()
            out[out_col] = out[out_col].astype(np.int64)
            return out

        # custkey-bounded aggregate: materialize so the join's schema
        # probe and side-tagging reuse the blocks instead of re-running
        # the orders scan + reduce (measured 24.8 s → ~5 s at sf0.1)
        return bucketed_group_reduce(
            orders.map_batches(partial, batch_format="pandas"),
            key_cols=["o_custkey"],
            reduce_fn=final,
        ).materialize()

    joined = hash_join(
        year_count(y1, "n_y1"), year_count(y2, "n_y2"), on="o_custkey", how="full"
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": df["o_custkey"].astype(np.int64),
                "n_y1": df["n_y1"].fillna(0).astype(np.int64),
                "n_y2": df["n_y2"].fillna(0).astype(np.int64),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def events_type_dow_cube(sf_dir: str) -> "rd.Dataset":
    """CUBE demo: event count + exact fixed-point value sum grouped by
    CUBE(event_type, ISO day-of-week) — all four grouping sets from ONE
    events pass (`kgflow.ops.reshape.cube_sum`). The day-of-week rides
    as a VARCHAR so the rolled-up typed-NULL convention matches the
    group column's SQL type exactly."""
    from kgflow.ops.reshape import cube_sum
    from kgflow.sources.parquet import read_parquet_clean

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "ts", "value"],
    )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                # isodow semantics (Mon=1..Sun=7) shared with the oracle
                "dow": (df["ts"].dt.dayofweek + 1).astype(str),
                "value_fp": np.round(
                    df["value"].to_numpy(dtype=np.float64) * 1e4
                ).astype(np.int64),
            }
        )

    # the group domain is |event types| × 7 — a handful of reduce
    # buckets; the default cluster-scaled count would be pure fixed cost
    cubed = cube_sum(
        ev.map_batches(tag, batch_format="pandas"),
        level_cols=["event_type", "dow"],
        sum_cols=["value_fp"],
        num_buckets=16,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["sum_value"] = df["value_fp"].to_numpy(dtype=np.int64) / 1e4
        df["n"] = df["n"].astype(np.int64)
        return df[["event_type", "dow", "sum_value", "n"]]

    return cubed.map_batches(finish, batch_format="pandas")


def q5_region_volume(
    sf_dir: str, region: str = "ASIA", year: int = 1996
) -> "rd.Dataset":
    """TPC-H Q5-style local-supplier volume: revenue per nation of one
    region, for orders of one year, counting only lineitems whose
    SUPPLIER sits in the customer's own nation (the Q5 twist that makes
    this a six-table join). → (n_name, revenue).

    Join ladder, sized by table role (the 100-TB shape):

    - region/nation are driver-tiny (5/25 rows) — read locally, the
      region's nation set broadcasts inside the customer filter;
    - customer → (c_custkey, c_nationkey) pre-filtered to the region's
      nations BEFORE any join (dim filter pushed ahead of the ladder);
    - orders is year-filtered at the scan, then joined to the filtered
      customer via `hash_join` (auto-broadcast: the filtered customer
      side is dim-bounded);
    - lineitem reduces per batch to (l_orderkey, l_suppkey, rev_fp
      int64 fixed-point) — the only fact-fact exchange is the orderkey
      join against the year's orders;
    - supplier → (s_suppkey, s_nationkey) broadcast-joins on suppkey,
      the c_nationkey == s_nationkey twist filters in the same batch;
    - final revenue is a per-batch combiner + one nation-keyed reduce
      (25-row exchange), names attached from the driver-side table.
    """
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    reg = pd.read_parquet(
        os.path.join(sf_dir, "region.parquet"), columns=["r_regionkey", "r_name"]
    )
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    nat = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    nat = nat.loc[nat["n_regionkey"] == rkey, ["n_nationkey", "n_name"]]
    nat_keys = ray.put(np.sort(nat["n_nationkey"].to_numpy(dtype=np.int64)))

    class FilterCustomers:
        def __init__(self):
            self.keys = ray.get(nat_keys)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.isin(df["c_nationkey"].to_numpy(), self.keys)
            return df.loc[m, ["c_custkey", "c_nationkey"]]

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(FilterCustomers, batch_format="pandas", concurrency=(1, 4))

    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")

    def year_orders(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"].to_numpy()
        out = df.loc[(d >= lo) & (d < hi), ["o_orderkey", "o_custkey"]]
        return out.rename(columns={"o_custkey": "c_custkey"})

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(year_orders, batch_format="pandas")

    # orders ⋈ region-filtered customer (right side dim-bounded)
    oc = hash_join(orders, cust, on="c_custkey", right_small=True).map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"}),
        batch_format="pandas",
    )

    def line_rev(df: pd.DataFrame) -> pd.DataFrame:
        rev_fp = np.round(
            df["l_extendedprice"].to_numpy(dtype=np.float64)
            * (1.0 - df["l_discount"].to_numpy(dtype=np.float64))
            * 1e4
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].astype(np.int64),
                "l_suppkey": df["l_suppkey"].astype(np.int64),
                "rev_fp": rev_fp,
            }
        )

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_rev, batch_format="pandas")

    # the one fact-fact exchange: lineitem ⋈ (year orders + cust nation).
    # materialize the computed key-bounded side so the join's decision
    # probe doesn't re-execute its pipeline (measured lesson, round 3)
    ol = hash_join(line, oc.materialize(), on="l_orderkey", right_small=False)

    supp = ray.put(
        pd.read_parquet(
            os.path.join(sf_dir, "supplier.parquet"),
            columns=["s_suppkey", "s_nationkey"],
        )
    )

    class LocalSupplierRev:
        """Broadcast supplier join + the c_nation == s_nation twist +
        per-batch revenue combiner, all in one pass."""

        def __init__(self):
            s = ray.get(supp)
            self.by_supp = dict(
                zip(s["s_suppkey"].to_numpy(), s["s_nationkey"].to_numpy())
            )

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            s_nat = df["l_suppkey"].map(self.by_supp).to_numpy(dtype=np.int64)
            m = s_nat == df["c_nationkey"].to_numpy()
            d = df.loc[m]
            out = (
                pd.DataFrame(
                    {
                        "n_nationkey": d["c_nationkey"].to_numpy(dtype=np.int64),
                        "rev_fp": d["rev_fp"].to_numpy(dtype=np.int64),
                    }
                )
                .groupby("n_nationkey", as_index=False)["rev_fp"]
                .sum()
            )
            return out

    partials = ol.map_batches(
        LocalSupplierRev, batch_format="pandas", concurrency=(1, 4)
    )
    name_ref = ray.put(dict(zip(nat["n_nationkey"], nat["n_name"])))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("n_nationkey", as_index=False)["rev_fp"].sum()
        names = ray.get(name_ref)
        return pd.DataFrame(
            {
                "n_name": out["n_nationkey"].map(names),
                "revenue": out["rev_fp"].to_numpy(dtype=np.int64) / 1e4,
            }
        )

    return bucketed_group_reduce(
        partials, key_cols=["n_nationkey"], reduce_fn=finish, num_buckets=4
    )


def ordered_collect(
    ds: "rd.Dataset",
    group_col: str,
    order_cols: list[str],
    val_col: str,
    sep: str = ">",
    max_items: int = 50,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group ORDERED collect:
    (group, n_events, path = first ``max_items`` ``val_col`` values in
    ``order_cols`` order joined by ``sep``) — string_agg(v ORDER BY …)
    semantics with a deterministic truncation so a hot group's output
    row stays bounded.

    Ordered concat is NOT a semigroup over unsorted runs, so unlike the
    count/top-k reduces there is no pre-shrink combiner: each group's
    (order, value) pairs must co-locate once. The exchange therefore
    carries (group, order_cols, val) rows — the op's irreducible cost —
    through ONE group-keyed `bucketed_group_reduce`; inside a bucket
    the sort + head(max_items) + join run as whole-bucket vectorized
    kernels (one sort, one groupby-cumcount mask, one str.agg). A
    pathologically hot group is bounded by the bucket's
    ``max_bucket_rows`` guard upstream if configured.
    """

    cols = [group_col, *order_cols, val_col]

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, *order_cols], kind="mergesort")
        grp = g.groupby(group_col, sort=False)
        n = grp.size().rename("n_events")
        head = g.loc[grp.cumcount() < max_items]
        path = head.groupby(group_col, sort=False)[val_col].agg(sep.join)
        out = pd.concat([n, path.rename("path")], axis=1).reset_index()
        out["n_events"] = out["n_events"].astype("int64")
        return out

    from kgflow.ops.shuffle import bucketed_group_reduce

    return bucketed_group_reduce(
        ds.select_columns(cols),
        key_cols=[group_col],
        reduce_fn=reduce_fn,
        num_buckets=num_buckets,
    )


def q4_order_priority(
    sf_dir: str,
    date_lo: str = "1997-01-01",
    date_hi: str = "1998-01-01",
) -> "rd.Dataset":
    """TPC-H Q4-style order-priority check: orders placed in a date
    window with at least one RETURNED lineitem, counted per priority
    (the schema's stand-in for Q4's late-delivery EXISTS — same plan
    shape: a fact-fact SEMI join where the right side contributes keys
    only, then a tiny grouped count).

    Scale shape: lineitem reduces to its DISTINCT returned orderkeys
    per block BEFORE `semi_join`'s keyset exchange (`joins.py`
    broadcast-vs-shuffle auto-decision); the count is a combiner +
    priority-bounded reduce. Neither fact table is ever materialized.
    """
    from kgflow.ops.joins import semi_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def in_window(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"].to_numpy()
        return df.loc[(d >= lo) & (d < hi), ["o_orderkey", "o_orderpriority"]]

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag"],
    )

    def returned_keys(df: pd.DataFrame) -> pd.DataFrame:
        d = df.loc[df["l_returnflag"] == "R", ["l_orderkey"]]
        return d.drop_duplicates().rename(columns={"l_orderkey": "o_orderkey"})

    hit = semi_join(
        orders.map_batches(in_window, batch_format="pandas"),
        line.map_batches(returned_keys, batch_format="pandas"),
        on="o_orderkey",
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("o_orderpriority", as_index=False, sort=False).size()
        return out.rename(columns={"size": "n_orders"})

    def total(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("o_orderpriority", as_index=False)["n_orders"].sum()

    return bucketed_group_reduce(
        hit.map_batches(partial, batch_format="pandas"),
        key_cols=["o_orderpriority"],
        reduce_fn=total,
    )


def q10_returned_revenue(sf_dir: str, k: int = 20) -> "rd.Dataset":
    """TPC-H Q10-style returned-item report: the top-k customers by
    revenue lost to returns, with name, account balance and nation —
    the four-table join ladder (lineitem ⋈ orders ⋈ customer ⋈ nation)
    every billing pipeline runs.

    Scale shape: revenue quantizes to fixed-point int64 AT THE SCAN
    and pre-aggregates per orderkey inside each block, so the
    fact-fact `hash_join` with orders ships one row per (block,
    orderkey); the second aggregation keys on custkey BEFORE joining
    the customer dimension (auto broadcast); nation is a driver-free
    broadcast map. The final top-k is the per-bucket-superset reduce +
    a k-row sort."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce, global_topk
    from kgflow.sources.parquet import read_parquet_clean

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["l_returnflag"] == "R"]
        rev = np.round(
            d["l_extendedprice"].to_numpy() * (1.0 - d["l_discount"].to_numpy()) * 1e4
        ).astype(np.int64)
        t = pd.DataFrame({"o_orderkey": d["l_orderkey"].to_numpy(), "rev_fp": rev})
        return t.groupby("o_orderkey", as_index=False, sort=False)["rev_fp"].sum()

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    )
    joined = hash_join(
        line.map_batches(line_partial, batch_format="pandas"), orders,
        on="o_orderkey",
    )

    def cust_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.rename(columns={"o_custkey": "c_custkey"})
            .groupby("c_custkey", as_index=False, sort=False)["rev_fp"]
            .sum()
        )

    per_cust = bucketed_group_reduce(
        joined.map_batches(cust_partial, batch_format="pandas"),
        key_cols=["c_custkey"],
        reduce_fn=lambda g: g.groupby("c_custkey", as_index=False)["rev_fp"].sum(),
    )

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    enriched = hash_join(per_cust, cust, on="c_custkey")

    nation = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    nref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    class AddNation:
        def __init__(self):
            self.names = ray.get(nref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["n_name"] = df["c_nationkey"].map(self.names)
            df["revenue"] = df["rev_fp"].to_numpy(dtype=np.int64) / 1e4
            return df[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]]

    out = enriched.map_batches(AddNation, batch_format="pandas", concurrency=(1, 4))
    return global_topk(
        out, sort_cols=["revenue", "c_custkey"], ascending=[False, True], k=k
    )


def q6_forecast_revenue(
    sf_dir: str,
    date_lo: str = "1997-01-01",
    date_hi: str = "1998-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 25.0,
) -> "rd.Dataset":
    """TPC-H Q6-style forecasting-revenue-change: one filtered scan,
    one global sum — the canonical predicate-pushdown microbenchmark.
    Revenue quantizes to fixed-point int64 per ROW before summation
    (float Σ order drift would flip low bits vs any other engine), so
    each block contributes a single 2-scalar partial and the exchange
    is one row per block."""
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["l_shipdate"].to_numpy()
        disc = df["l_discount"].to_numpy()
        m = (
            (d >= lo)
            & (d < hi)
            # no epsilon: both engines compare the same parquet doubles
            # to the same literals, so BETWEEN semantics match exactly
            & (disc >= disc_lo)
            & (disc <= disc_hi)
            & (df["l_quantity"].to_numpy() < max_qty)
        )
        sel = df.loc[m]
        fp = np.round(
            sel["l_extendedprice"].to_numpy() * sel["l_discount"].to_numpy() * 1e4
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "_g": np.array([0], dtype=np.int64),
                "rev_fp": np.array([fp.sum()], dtype=np.int64),
                "n_items": np.array([int(m.sum())], dtype=np.int64),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "revenue": [g["rev_fp"].to_numpy(dtype=np.int64).sum() / 1e4],
                "n_items": [int(g["n_items"].sum())],
            }
        )

    return bucketed_group_reduce(
        line.map_batches(partial, batch_format="pandas"),
        key_cols=["_g"],
        reduce_fn=finish,
        num_buckets=1,
    )


def weekly_trend(
    sf_dir: str,
    anchor: str = "2024-01-01",
) -> "rd.Dataset":
    """Week-over-week volume trend per event type: weekly counts, the
    previous week's count, and their ratio — the first derivative every
    metrics dashboard draws. Weeks are 7-day buckets anchored at
    ``anchor`` (explicit arithmetic on both sides, so no engine's
    locale-dependent week-start can disagree).

    Output: (event_type, week_start, n, prev_n, ratio), weeks with no
    predecessor omitted; ratio is one exact int÷int double division.

    Scale shape: a per-block (type, week) count combiner → ONE
    week-keyed partial sum (weeks-bounded rows) → one type-keyed lag
    exchange over the tiny weekly table."""
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    t0 = np.datetime64(anchor, "us")
    week_us = 7 * 86_400_000_000

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        wk = (us - t0.astype(np.int64)) // week_us
        t = pd.DataFrame({"event_type": df["event_type"], "wk": wk})
        out = t.groupby(["event_type", "wk"], sort=False, as_index=False).size()
        return out.rename(columns={"size": "n"})

    def sum_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "wk"], as_index=False)["n"].sum()

    weekly = bucketed_group_reduce(
        ev.map_batches(partial, batch_format="pandas"),
        key_cols=["event_type", "wk"],
        reduce_fn=sum_counts,
    )

    def lag_ratio(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "wk"], kind="mergesort")
        prev_n = g.groupby("event_type", sort=False)["n"].shift(1)
        prev_wk = g.groupby("event_type", sort=False)["wk"].shift(1)
        # only an IMMEDIATELY preceding week counts as a predecessor
        m = prev_n.notna() & (g["wk"] - prev_wk == 1)
        out = g[m].copy()
        pn = prev_n[m].to_numpy(dtype=np.int64)
        out["prev_n"] = pn
        out["ratio"] = out["n"].to_numpy(dtype=np.int64) / pn
        out["week_start"] = (
            t0.astype(np.int64) + out["wk"].to_numpy(dtype=np.int64) * week_us
        ).astype("datetime64[us]")
        return out[["event_type", "week_start", "n", "prev_n", "ratio"]]

    return bucketed_group_reduce(
        weekly, key_cols=["event_type"], reduce_fn=lag_ratio
    )


def brand_revenue(sf_dir: str) -> "rd.Dataset":
    """Per-brand sales rollup (TPC-H Q14-flavor): lineitem ⋈ part on
    partkey, revenue / quantity / line counts per brand — the standard
    fact-to-dimension enrichment rollup.

    Scale shape: lineitem pre-aggregates per PARTKEY inside each block
    (fixed-point int64 revenue and quantity), so the `hash_join` with
    the part dimension ships one row per (block, partkey) — the
    dimension side auto-broadcasts when small; the final exchange is
    brand-bounded."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_quantity"],
    )

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = np.round(
            df["l_extendedprice"].to_numpy() * (1.0 - df["l_discount"].to_numpy())
            * 1e4
        ).astype(np.int64)
        qty = np.round(df["l_quantity"].to_numpy() * 100).astype(np.int64)
        t = pd.DataFrame(
            {
                "p_partkey": df["l_partkey"].to_numpy(),
                "rev_fp": rev,
                "qty_fp": qty,
                "n_items": np.ones(len(df), dtype=np.int64),
            }
        )
        return t.groupby("p_partkey", as_index=False, sort=False).sum()

    part = read_parquet_clean(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
    )
    joined = hash_join(
        line.map_batches(line_partial, batch_format="pandas"), part,
        on="p_partkey",
    )

    def brand_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("p_brand", as_index=False, sort=False)[
            ["rev_fp", "qty_fp", "n_items"]
        ].sum()

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("p_brand", as_index=False)[
            ["rev_fp", "qty_fp", "n_items"]
        ].sum()
        return pd.DataFrame(
            {
                "p_brand": agg["p_brand"],
                "revenue": agg["rev_fp"].to_numpy(dtype=np.int64) / 1e4,
                "sum_qty": agg["qty_fp"].to_numpy(dtype=np.int64) / 100.0,
                "n_items": agg["n_items"].to_numpy(dtype=np.int64),
            }
        )

    return bucketed_group_reduce(
        joined.map_batches(brand_partial, batch_format="pandas"),
        key_cols=["p_brand"],
        reduce_fn=finish,
    )


def revenue_concentration(sf_dir: str, q: float = 0.875) -> "rd.Dataset":
    """Revenue-concentration probe: the ``q``-quantile cut of per-
    customer order totals and the share of ALL revenue held by
    customers at or above it — the whale-dependence number (Gini's
    blunt cousin) every marketplace tracks.

    Output: one row (cut_value, n_top, n_customers, top_share);
    top_share is a single int÷int double division, everything upstream
    exact fixed-point. ``q`` must be a binary-exact fraction (the
    `column_quantiles` rule).

    Scale shape: per-customer totals via combiner + custkey-keyed
    reduce (key-bounded, materialized — consumed by the quantile pass
    AND the share pass); the cut comes from `grouped_quantiles`'
    spread-bucketed exact histogram (never a driver sort); the share
    pass broadcasts the 1-row cut and folds per-block 4-scalar
    partials."""
    from kgflow.ops.profile import grouped_quantiles
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    )

    def cust_partial(df: pd.DataFrame) -> pd.DataFrame:
        fp = np.round(df["o_totalprice"].to_numpy() * 1e4).astype(np.int64)
        t = pd.DataFrame({"o_custkey": df["o_custkey"].to_numpy(), "fp": fp})
        return t.groupby("o_custkey", as_index=False, sort=False).sum()

    totals = bucketed_group_reduce(
        orders.map_batches(cust_partial, batch_format="pandas"),
        key_cols=["o_custkey"],
        reduce_fn=lambda g: g.groupby("o_custkey", as_index=False)["fp"].sum(),
    ).materialize()  # consumed twice: quantile pass + share pass

    qt = grouped_quantiles(
        totals.map_batches(
            lambda d: d.assign(_g=np.int64(0)), batch_format="pandas"
        ),
        ["_g"],
        "fp",
        qs=(q,),
        scale=1,
    ).to_pandas()
    cut_fp = int(qt["v"].iloc[0])
    cut_ref = ray.put(cut_fp)

    class SharePartial:
        def __init__(self):
            self.cut = ray.get(cut_ref)

        def __call__(self, d: pd.DataFrame) -> pd.DataFrame:
            fp = d["fp"].to_numpy(dtype=np.int64)
            top = fp >= self.cut
            return pd.DataFrame(
                {
                    "_g": np.array([0], dtype=np.int64),
                    "sum_all": np.array([fp.sum()], dtype=np.int64),
                    "sum_top": np.array([fp[top].sum()], dtype=np.int64),
                    "n_top": np.array([int(top.sum())], dtype=np.int64),
                    "n_customers": np.array([len(fp)], dtype=np.int64),
                }
            )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        sa = int(g["sum_all"].sum())
        st = int(g["sum_top"].sum())
        return pd.DataFrame(
            {
                "cut_value": [cut_fp / 1e4],
                "n_top": [int(g["n_top"].sum())],
                "n_customers": [int(g["n_customers"].sum())],
                "top_share": [st / sa],
            }
        )

    partials = totals.map_batches(
        SharePartial, batch_format="pandas", concurrency=(1, 4)
    )
    return bucketed_group_reduce(
        partials, key_cols=["_g"], reduce_fn=finish, num_buckets=1
    )


def q13_customer_distribution(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q13-style customer order-count distribution: how many
    customers placed exactly N orders, INCLUDING the zero-order bucket
    — the canonical left-outer + double-groupby plan shape.

    Scale shape: orders shrinks to per-custkey counts with a per-block
    combiner before ONE custkey-keyed reduce; the customer side ships
    keys only into the left `hash_join` (zero-order customers survive
    as nulls → count 0); the final histogram is a counts-bounded
    exchange (distinct order-counts ≪ customers). The count table is
    materialized because the join's decision count would otherwise
    re-execute its pipeline."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    )

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("o_custkey", as_index=False, sort=False).size()
        return out.rename(
            columns={"o_custkey": "c_custkey", "size": "c_count"}
        )

    per_cust = bucketed_group_reduce(
        orders.map_batches(count_partial, batch_format="pandas"),
        key_cols=["c_custkey"],
        reduce_fn=lambda g: g.groupby("c_custkey", as_index=False)[
            "c_count"
        ].sum(),
    ).materialize()

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    joined = hash_join(cust, per_cust, on="c_custkey", how="left")

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c_count"]
        n = (
            c.fillna(0).astype(np.int64)
            if c.isna().any()
            else c.astype(np.int64)
        )
        out = (
            pd.DataFrame({"c_count": n})
            .groupby("c_count", as_index=False, sort=False)
            .size()
        )
        return out.rename(columns={"size": "custdist"})

    return bucketed_group_reduce(
        joined.map_batches(hist_partial, batch_format="pandas"),
        key_cols=["c_count"],
        reduce_fn=lambda g: g.groupby("c_count", as_index=False)[
            "custdist"
        ].sum(),
    )


def q14_promo_share(
    sf_dir: str,
    date_lo: str = "1997-09-01",
    date_hi: str = "1997-10-01",
) -> "rd.Dataset":
    """TPC-H Q14-style promotion-revenue share: the percentage of one
    month's revenue that came from PROMO-type parts — a fact⋈dim join
    feeding a conditional global ratio.

    Scale shape: lineitem filters to the window and pre-aggregates
    revenue per partkey inside each block (fixed-point int64 at the
    scan), so the part join ships one row per (block, partkey); the
    part dimension rides `hash_join`'s auto broadcast-vs-shuffle
    decision; the final exchange is one 2-scalar row per block and the
    share is ONE int-over-int double division, bit-reproducible in
    SQL."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def line_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["l_shipdate"].to_numpy()
        sel = df.loc[(d >= lo) & (d < hi)]
        fp = np.round(
            sel["l_extendedprice"].to_numpy()
            * (1.0 - sel["l_discount"].to_numpy())
            * 1e4
        ).astype(np.int64)
        t = pd.DataFrame(
            {"p_partkey": sel["l_partkey"].to_numpy(), "rev_fp": fp}
        )
        return t.groupby("p_partkey", as_index=False, sort=False)[
            "rev_fp"
        ].sum()

    part = read_parquet_clean(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    joined = hash_join(
        line.map_batches(line_partial, batch_format="pandas"),
        part,
        on="p_partkey",
        right_small=True,  # dimension table
    )

    def share_partial(df: pd.DataFrame) -> pd.DataFrame:
        fp = df["rev_fp"].to_numpy(dtype=np.int64)
        promo = df["p_type"].to_numpy() == "PROMO"
        return pd.DataFrame(
            {
                "_g": np.array([0], dtype=np.int64),
                "promo_fp": np.array([fp[promo].sum()], dtype=np.int64),
                "total_fp": np.array([fp.sum()], dtype=np.int64),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        pf = int(g["promo_fp"].sum())
        tf = int(g["total_fp"].sum())
        return pd.DataFrame(
            {
                "promo_revenue": [pf / 1e4],
                "total_revenue": [tf / 1e4],
                "promo_share_pct": [100.0 * pf / tf],
            }
        )

    return bucketed_group_reduce(
        joined.map_batches(share_partial, batch_format="pandas"),
        key_cols=["_g"],
        reduce_fn=finish,
        num_buckets=1,
    )


def q15_top_supplier(
    sf_dir: str,
    date_lo: str = "1997-01-01",
    date_hi: str = "1997-07-01",
) -> "rd.Dataset":
    """TPC-H Q15-style top supplier: the supplier(s) whose revenue in a
    window equals the global maximum — the "view + scalar-subquery max"
    plan, with exact tie semantics (fixed-point revenue makes the
    argmax deterministic across engines).

    Scale shape: per-suppkey fixed-point revenue via combiner + ONE
    supplier-keyed reduce, materialized once (consumed by the max pass
    AND the filter pass); the max arrives as a 1-row `global_topk`
    (blocks×1 rows on its exchange) and broadcasts as a scalar; the
    supplier dimension joins via auto broadcast."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce, global_topk
    from kgflow.sources.parquet import read_parquet_clean

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )

    def supp_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["l_shipdate"].to_numpy()
        sel = df.loc[(d >= lo) & (d < hi)]
        fp = np.round(
            sel["l_extendedprice"].to_numpy()
            * (1.0 - sel["l_discount"].to_numpy())
            * 1e4
        ).astype(np.int64)
        t = pd.DataFrame(
            {"s_suppkey": sel["l_suppkey"].to_numpy(), "rev_fp": fp}
        )
        return t.groupby("s_suppkey", as_index=False, sort=False)[
            "rev_fp"
        ].sum()

    per_supp = bucketed_group_reduce(
        line.map_batches(supp_partial, batch_format="pandas"),
        key_cols=["s_suppkey"],
        reduce_fn=lambda g: g.groupby("s_suppkey", as_index=False)[
            "rev_fp"
        ].sum(),
    ).materialize()  # consumed twice: max pass + filter pass

    top = global_topk(
        per_supp, sort_cols=["rev_fp"], ascending=[False], k=1
    ).to_pandas()  # exactly 1 row — bounded driver pull
    max_fp = int(top["rev_fp"].iloc[0])
    max_ref = ray.put(max_fp)

    class KeepMax:
        def __init__(self):
            self.max_fp = ray.get(max_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df[df["rev_fp"].to_numpy(dtype=np.int64) == self.max_fp]

    winners = per_supp.map_batches(
        KeepMax, batch_format="pandas", concurrency=(1, 4)
    )
    supp = read_parquet_clean(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
    )
    out = hash_join(winners, supp, on="s_suppkey", right_small=True)
    return out.map_batches(
        lambda d: pd.DataFrame(
            {
                "s_suppkey": d["s_suppkey"].astype(np.int64),
                "s_name": d["s_name"],
                "total_revenue": d["rev_fp"].to_numpy(dtype=np.int64) / 1e4,
            }
        ),
        batch_format="pandas",
    )


def q18_big_orders(sf_dir: str, min_qty: float = 300.0) -> "rd.Dataset":
    """TPC-H Q18-style large-volume customers: orders whose total
    lineitem quantity exceeds ``min_qty``, with customer name and order
    details — the HAVING-on-a-fact-aggregate + join-back plan.

    Scale shape: per-orderkey quantity sums (fixed-point ×100 int64,
    combiner + ONE orderkey reduce) filter to a tiny qualifying set
    (HAVING prunes everything), which then rides `hash_join`'s
    broadcast side against orders; the customer dimension joins the
    (still tiny) result the same way. Neither fact table is ever
    shuffled whole."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    cut_fp = int(round(min_qty * 100))

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    )

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        fp = np.round(df["l_quantity"].to_numpy() * 100).astype(np.int64)
        t = pd.DataFrame(
            {"o_orderkey": df["l_orderkey"].to_numpy(), "qty_fp": fp}
        )
        return t.groupby("o_orderkey", as_index=False, sort=False)[
            "qty_fp"
        ].sum()

    big = bucketed_group_reduce(
        line.map_batches(qty_partial, batch_format="pandas"),
        key_cols=["o_orderkey"],
        reduce_fn=lambda g: g.groupby("o_orderkey", as_index=False)[
            "qty_fp"
        ].sum(),
    ).map_batches(
        lambda d: d[d["qty_fp"].to_numpy(dtype=np.int64) > cut_fp],
        batch_format="pandas",
    ).materialize()  # HAVING-pruned: tiny; reused by the join decision

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    od = hash_join(orders, big, on="o_orderkey", right_small=True)

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_name"],
    )
    out = hash_join(
        od.map_batches(
            lambda d: d.rename(columns={"o_custkey": "c_custkey"}),
            batch_format="pandas",
        ),
        cust,
        on="c_custkey",
        right_small=True,
    )
    return out.map_batches(
        lambda d: pd.DataFrame(
            {
                "c_name": d["c_name"],
                "c_custkey": d["c_custkey"].astype(np.int64),
                "o_orderkey": d["o_orderkey"].astype(np.int64),
                "o_orderdate": d["o_orderdate"],
                "o_totalprice": d["o_totalprice"],
                "sum_qty": d["qty_fp"].to_numpy(dtype=np.int64) / 100.0,
            }
        ),
        batch_format="pandas",
    )


def q17_small_quantity_revenue(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q17-style small-quantity-order revenue: the average yearly
    revenue lost if orders below 20% of a part's average quantity were
    not taken — the correlated-scalar-subquery plan (per-part avg
    compared against every lineitem of that part).

    Scale shape: per-partkey (count, Σqty) via combiner + ONE part-
    keyed reduce (part-bounded, materialized); lineitem joins the stats
    through `hash_join`'s auto broadcast-vs-shuffle decision; the
    threshold compare is integer-exact (qty_fp·5·n < Σqty_fp avoids
    the float 0.2·avg both engines would round differently); the final
    exchange is one 2-scalar row per block."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        qfp = np.round(df["l_quantity"].to_numpy() * 100).astype(np.int64)
        t = pd.DataFrame({"l_partkey": df["l_partkey"].to_numpy(), "q": qfp})
        g = t.groupby("l_partkey", as_index=False, sort=False).agg(
            n=("q", "size"), sum_qfp=("q", "sum")
        )
        return g

    stats = bucketed_group_reduce(
        line.map_batches(stats_partial, batch_format="pandas"),
        key_cols=["l_partkey"],
        reduce_fn=lambda g: g.groupby("l_partkey", as_index=False).agg(
            n=("n", "sum"), sum_qfp=("sum_qfp", "sum")
        ),
    ).materialize()  # part-bounded; reused by the join decision

    joined = hash_join(line, stats, on="l_partkey")

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        qfp = np.round(df["l_quantity"].to_numpy() * 100).astype(np.int64)
        n = df["n"].to_numpy(dtype=np.int64)
        s = df["sum_qfp"].to_numpy(dtype=np.int64)
        m = qfp * 5 * n < s
        pfp = np.round(
            df.loc[m, "l_extendedprice"].to_numpy() * 1e4
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "_g": np.array([0], dtype=np.int64),
                "price_fp": np.array([pfp.sum()], dtype=np.int64),
                "n_items": np.array([int(m.sum())], dtype=np.int64),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        pf = int(g["price_fp"].sum())
        return pd.DataFrame(
            {
                "avg_yearly": [pf / 1e4 / 7.0],
                "n_items": [int(g["n_items"].sum())],
            }
        )

    return bucketed_group_reduce(
        joined.map_batches(rev_partial, batch_format="pandas"),
        key_cols=["_g"],
        reduce_fn=finish,
        num_buckets=1,
    )


def q22_dormant_balance(
    sf_dir: str, recent: str = "2000-01-01"
) -> "rd.Dataset":
    """TPC-H Q22-style global-sales-opportunity: customers with an
    above-average positive account balance and NO order since
    ``recent``, grouped per nation — the scalar-subquery + anti-join
    plan (Q22's phone-prefix grouping adapted to this schema's nation
    dimension).

    Scale shape: the positive-balance mean arrives as ONE 2-scalar
    global partial (never a driver table pull) and the above-average
    test is integer-exact (bal_fp·n > Σbal_fp); recent orders shrink
    to DISTINCT custkeys inside `anti_join` before any exchange; the
    nation rollup is a nations-bounded reduce over a broadcast name
    map."""
    from kgflow.ops.joins import anti_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    cut = np.datetime64(recent, "us")

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_acctbal", "c_nationkey"],
    )

    def bal_partial(df: pd.DataFrame) -> pd.DataFrame:
        fp = np.round(df["c_acctbal"].to_numpy() * 100).astype(np.int64)
        pos = fp > 0
        return pd.DataFrame(
            {
                "_g": np.array([0], dtype=np.int64),
                "n_pos": np.array([int(pos.sum())], dtype=np.int64),
                "sum_fp": np.array([fp[pos].sum()], dtype=np.int64),
            }
        )

    agg = bucketed_group_reduce(
        cust.map_batches(bal_partial, batch_format="pandas"),
        key_cols=["_g"],
        reduce_fn=lambda g: pd.DataFrame(
            {
                "n_pos": [int(g["n_pos"].sum())],
                "sum_fp": [int(g["sum_fp"].sum())],
            }
        ),
        num_buckets=1,
    ).to_pandas()  # exactly 1 row
    n_pos, sum_fp = int(agg["n_pos"].iloc[0]), int(agg["sum_fp"].iloc[0])
    ref = ray.put((n_pos, sum_fp))

    class AboveAvg:
        def __init__(self):
            self.n, self.s = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            fp = np.round(df["c_acctbal"].to_numpy() * 100).astype(np.int64)
            # bal > avg  ⇔  bal_fp · n_pos > Σbal_fp  (ints: exact)
            return df[fp * self.n > self.s]

    rich = cust.map_batches(AboveAvg, batch_format="pandas", concurrency=(1, 4))

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"],
    )

    def recent_keys(df: pd.DataFrame) -> pd.DataFrame:
        d = df.loc[
            df["o_orderdate"].to_numpy() >= cut, ["o_custkey"]
        ].drop_duplicates()
        return d.rename(columns={"o_custkey": "c_custkey"})

    dormant = anti_join(
        rich,
        orders.map_batches(recent_keys, batch_format="pandas"),
        on="c_custkey",
    )

    nation = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    nref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))

    class NationPartial:
        def __init__(self):
            self.names = ray.get(nref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            fp = np.round(df["c_acctbal"].to_numpy() * 100).astype(np.int64)
            t = pd.DataFrame(
                {"n_name": df["c_nationkey"].map(self.names), "fp": fp}
            )
            return t.groupby("n_name", as_index=False, sort=False).agg(
                numcust=("fp", "size"), bal_fp=("fp", "sum")
            )

    partial = dormant.map_batches(
        NationPartial, batch_format="pandas", concurrency=(1, 4)
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("n_name", as_index=False).agg(
            numcust=("numcust", "sum"), bal_fp=("bal_fp", "sum")
        )
        out["totacctbal"] = out.pop("bal_fp").to_numpy(dtype=np.int64) / 100.0
        return out

    return bucketed_group_reduce(
        partial, key_cols=["n_name"], reduce_fn=finish
    )


def dense_hourly_counts(sf_dir: str) -> "rd.Dataset":
    """Gap-filled hourly counts per event type: every hour between a
    type's first and last event appears, zero-filled — the resample
    step every time-series model needs before it can difference or
    window (missing hours silently skew any rolling statistic).

    Scale shape: per-(type, hour) counts via combiner + ONE bucketed
    reduce (hours×types-bounded — calendar-bounded, not data-bounded);
    per-type [min,max] bounds are a types-bounded reduce; the dense
    grid EXPANDS from the bounds table (rows = span hours, generated
    distributed, never on the driver); counts left-join onto the grid
    co-bucketed on (type, hour). No stage touches raw events twice."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    hour_us = 3_600_000_000

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        h = (us // hour_us) * hour_us
        t = pd.DataFrame({"event_type": df["event_type"], "hour_us": h})
        out = t.groupby(
            ["event_type", "hour_us"], as_index=False, sort=False
        ).size()
        return out.rename(columns={"size": "n"})

    counts = bucketed_group_reduce(
        ev.map_batches(count_partial, batch_format="pandas"),
        key_cols=["event_type", "hour_us"],
        reduce_fn=lambda g: g.groupby(
            ["event_type", "hour_us"], as_index=False
        )["n"].sum(),
    ).materialize()  # reused: bounds pass + grid join

    bounds = bucketed_group_reduce(
        counts.map_batches(
            lambda d: d.groupby("event_type", as_index=False).agg(
                lo=("hour_us", "min"), hi=("hour_us", "max")
            ),
            batch_format="pandas",
        ),
        key_cols=["event_type"],
        reduce_fn=lambda g: g.groupby("event_type", as_index=False).agg(
            lo=("lo", "min"), hi=("hi", "max")
        ),
    )

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for et, lo, hi in zip(df["event_type"], df["lo"], df["hi"]):
            hours = np.arange(int(lo), int(hi) + 1, hour_us, dtype=np.int64)
            outs.append(pd.DataFrame({"event_type": et, "hour_us": hours}))
        if not outs:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype=object),
                    "hour_us": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    grid = bounds.map_batches(expand, batch_format="pandas")
    joined = hash_join(grid, counts, on=["event_type", "hour_us"], how="left")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"]
        n = n.fillna(0).astype(np.int64) if n.isna().any() else n.astype(np.int64)
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "hour": df["hour_us"]
                .to_numpy(dtype=np.int64)
                .astype("datetime64[us]"),
                "n": n.to_numpy(),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def nation_revenue_share(sf_dir: str) -> "rd.Dataset":
    """Percent-of-total rollup: each nation's order revenue and its
    share of the nation's REGION total — the window-share pattern
    (revenue / SUM(revenue) OVER (PARTITION BY region)) expressed as a
    bounded two-level reduce.

    Scale shape: orders pre-aggregates per custkey (combiner + ONE
    reduce), the customer dimension joins via auto broadcast, nation/
    region name maps broadcast via ``ray.put``; the nations-bounded
    final reduce computes region totals AND the share in one pass —
    one exact int÷int division per nation, bit-reproducible in SQL."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    )

    def cust_partial(df: pd.DataFrame) -> pd.DataFrame:
        fp = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        t = pd.DataFrame({"c_custkey": df["o_custkey"].to_numpy(), "fp": fp})
        return t.groupby("c_custkey", as_index=False, sort=False)["fp"].sum()

    per_cust = bucketed_group_reduce(
        orders.map_batches(cust_partial, batch_format="pandas"),
        key_cols=["c_custkey"],
        reduce_fn=lambda g: g.groupby("c_custkey", as_index=False)["fp"].sum(),
    )

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    joined = hash_join(per_cust, cust, on="c_custkey", right_small=True)

    nation = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    region = pd.read_parquet(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    )
    nmap = dict(zip(nation["n_nationkey"], nation["n_name"]))
    rmap = dict(
        zip(
            nation["n_nationkey"],
            nation["n_regionkey"].map(
                dict(zip(region["r_regionkey"], region["r_name"]))
            ),
        )
    )
    ref = ray.put((nmap, rmap))

    class NationPartial:
        def __init__(self):
            self.nmap, self.rmap = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            t = pd.DataFrame(
                {
                    "r_name": df["c_nationkey"].map(self.rmap),
                    "n_name": df["c_nationkey"].map(self.nmap),
                    "fp": df["fp"].to_numpy(dtype=np.int64),
                }
            )
            return t.groupby(
                ["r_name", "n_name"], as_index=False, sort=False
            )["fp"].sum()

    partials = joined.map_batches(
        NationPartial, batch_format="pandas", concurrency=(1, 4)
    )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["r_name", "n_name"], as_index=False)["fp"].sum()
        tot = out.groupby("r_name")["fp"].transform("sum")
        fp = out["fp"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "r_name": out["r_name"],
                "n_name": out["n_name"],
                "revenue": fp / 100.0,
                "region_share": fp / tot.to_numpy(dtype=np.int64),
            }
        )

    return bucketed_group_reduce(
        partials, key_cols=["r_name", "n_name"], reduce_fn=finish,
        num_buckets=1,  # nations-bounded; share needs region totals whole
    )


def orders_gini_coefficient(sf_dir: str) -> "rd.Dataset":
    """Exact Gini coefficient of per-customer order revenue — the
    inequality statistic behind every "top-x% of customers" claim,
    computed from the closed form over globally RANKED totals:
    G = (2·Σ rᵢxᵢ − (n+1)·Σx) / (n·Σx), revenue in exact cents.

    Scale shape: per-custkey cents totals (combiner + ONE reduce) feed
    `shuffle.global_row_number` (the two-pass range-decomposition
    rank — customers-bounded input, never raw orders); the Gini moment
    Σ r·x reduces as one 3-scalar partial per block, and the final
    expression is exact integer arithmetic (Python ints — no 64-bit
    overflow at any n) with ONE closing division, mirrored in SQL via
    HUGEINT."""
    from kgflow.ops.shuffle import bucketed_group_reduce, global_row_number
    from kgflow.sources.parquet import read_parquet_clean

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
    )

    def cust_partial(df: pd.DataFrame) -> pd.DataFrame:
        fp = np.round(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        t = pd.DataFrame({"c_custkey": df["o_custkey"].to_numpy(), "fp": fp})
        return t.groupby("c_custkey", as_index=False, sort=False)["fp"].sum()

    per_cust = bucketed_group_reduce(
        orders.map_batches(cust_partial, batch_format="pandas"),
        key_cols=["c_custkey"],
        reduce_fn=lambda g: g.groupby("c_custkey", as_index=False)["fp"].sum(),
    )

    ranked = global_row_number(
        per_cust, sort_cols=["fp", "c_custkey"], out_col="rn"
    )

    def moment_partial(df: pd.DataFrame) -> pd.DataFrame:
        fp = df["fp"].to_numpy(dtype=np.int64)
        rn = df["rn"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "_g": np.array([0], dtype=np.int64),
                "srx": np.array([(rn * fp).sum()], dtype=np.int64),
                "sx": np.array([fp.sum()], dtype=np.int64),
                "n": np.array([len(fp)], dtype=np.int64),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        srx = int(g["srx"].sum())
        sx = int(g["sx"].sum())
        n = int(g["n"].sum())
        num = 2 * srx - (n + 1) * sx  # exact python ints
        den = n * sx
        return pd.DataFrame(
            {"gini": [num / den], "n_customers": [n]}
        )

    return bucketed_group_reduce(
        ranked.map_batches(moment_partial, batch_format="pandas"),
        key_cols=["_g"],
        reduce_fn=finish,
        num_buckets=1,
    )


def q7_nation_volume(
    sf_dir: str,
    nation_a: str = "NATION_3",
    nation_b: str = "NATION_8",
    year_lo: int = 1995,
    year_hi: int = 1997,
) -> "rd.Dataset":
    """TPC-H Q7-style volume shipping: lineitem revenue flowing between
    two nations (supplier nation ≠ customer nation, both directions),
    per shipment year → (supp_nation, cust_nation, l_year, revenue).

    100-TB shape: nation/supplier are dim-bounded and ride as broadcast
    maps; customer pre-filters to the two nations BEFORE its join;
    the ONLY fact-fact exchange is lineitem ⋈ orders on orderkey —
    lineitem shrinks per batch to (orderkey, supp_nation, year, rev_fp
    int64 fixed-point) with off-pair suppliers dropped at the scan, so
    the exchange carries 4 ints/row. Final reduce is ≤ 2×2×|years| rows.
    Mirrors TPC-H Q7 (the reference engine has no relational surface;
    query family cited at SURVEY.md §2.7).
    """
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    nat = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    key_of = dict(zip(nat["n_name"], nat["n_nationkey"].astype(int)))
    ka, kb = key_of[nation_a], key_of[nation_b]
    names = {ka: nation_a, kb: nation_b}

    supp = pd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    supp = supp[supp["s_nationkey"].isin([ka, kb])]
    supp_ref = ray.put(
        dict(zip(supp["s_suppkey"].to_numpy(), supp["s_nationkey"].to_numpy()))
    )

    def pair_customers(df: pd.DataFrame) -> pd.DataFrame:
        m = df["c_nationkey"].isin([ka, kb]).to_numpy()
        out = df.loc[m, ["c_custkey", "c_nationkey"]]
        return out.rename(columns={"c_nationkey": "cust_nat"})

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(pair_customers, batch_format="pandas")

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    ).map_batches(
        lambda df: df.rename(columns={"o_custkey": "c_custkey"}),
        batch_format="pandas",
    )
    oc = hash_join(orders, cust, on="c_custkey", right_small=True).map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"})[
            ["l_orderkey", "cust_nat"]
        ],
        batch_format="pandas",
    )

    lo = np.datetime64(f"{year_lo}-01-01", "us")
    hi = np.datetime64(f"{year_hi}-01-01", "us")

    class LineShrink:
        """Per-batch: shipdate window + broadcast supplier-nation map;
        off-pair suppliers drop HERE so the orderkey exchange only
        carries the two nations' rows."""

        def __init__(self):
            self.by_supp = ray.get(supp_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            d = df["l_shipdate"].to_numpy()
            s_nat = df["l_suppkey"].map(self.by_supp)
            m = (d >= lo) & (d < hi) & s_nat.notna().to_numpy()
            d2 = df.loc[m]
            rev_fp = np.round(
                d2["l_extendedprice"].to_numpy(dtype=np.float64)
                * (1.0 - d2["l_discount"].to_numpy(dtype=np.float64))
                * 1e4
            ).astype(np.int64)
            return pd.DataFrame(
                {
                    "l_orderkey": d2["l_orderkey"].astype(np.int64),
                    "supp_nat": s_nat[m].astype(np.int64),
                    "l_year": d2["l_shipdate"].dt.year.astype(np.int64),
                    "rev_fp": rev_fp,
                }
            )

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_orderkey",
            "l_suppkey",
            "l_shipdate",
            "l_extendedprice",
            "l_discount",
        ],
    ).map_batches(LineShrink, batch_format="pandas", concurrency=(1, 4))

    ol = hash_join(line, oc.materialize(), on="l_orderkey", right_small=False)

    def volume_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df["supp_nat"].to_numpy() != df["cust_nat"].to_numpy()
        d = df.loc[m]
        return (
            d.groupby(["supp_nat", "cust_nat", "l_year"], as_index=False)[
                "rev_fp"
            ].sum()
        )

    name_ref = ray.put(names)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["supp_nat", "cust_nat", "l_year"], as_index=False)[
            "rev_fp"
        ].sum()
        nm = ray.get(name_ref)
        return pd.DataFrame(
            {
                "supp_nation": out["supp_nat"].map(nm),
                "cust_nation": out["cust_nat"].map(nm),
                "l_year": out["l_year"].astype(np.int64),
                "revenue": out["rev_fp"].to_numpy(dtype=np.int64) / 1e4,
            }
        )

    return bucketed_group_reduce(
        ol.map_batches(volume_partial, batch_format="pandas"),
        key_cols=["supp_nat", "cust_nat", "l_year"],
        reduce_fn=finish,
        num_buckets=2,
    )


def q19_disjunctive_revenue(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q19-style disjunctive-predicate revenue: sum of discounted
    revenue for lineitems matching ANY of three (brand, size-range,
    quantity-range) conjunction groups → 1 row (revenue).

    100-TB shape: NO shuffle at all — part is dim-bounded and rides as
    a broadcast (partkey → brand, size) map, each lineitem batch
    evaluates the OR-of-ANDs vectorized and emits one partial-sum row,
    and the final reduce folds ≤ #blocks rows. Revenue accumulates in
    int64 fixed-point so engine == SQL bit-exactly.
    """
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    groups = [
        ("Brand#3", 1, 15, 1.0, 15.0),
        ("Brand#12", 1, 25, 10.0, 30.0),
        ("Brand#21", 1, 35, 20.0, 45.0),
    ]
    part = pd.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_size"],
    )
    part_ref = ray.put(
        {
            "brand": dict(zip(part["p_partkey"].to_numpy(), part["p_brand"])),
            "size": dict(
                zip(part["p_partkey"].to_numpy(), part["p_size"].astype(int))
            ),
        }
    )

    class DisjunctiveRev:
        def __init__(self):
            p = ray.get(part_ref)
            self.brand, self.size = p["brand"], p["size"]

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            pk = df["l_partkey"]
            brand = pk.map(self.brand).to_numpy()
            size = pk.map(self.size).to_numpy(dtype=np.int64)
            qty = df["l_quantity"].to_numpy(dtype=np.float64)
            m = np.zeros(len(df), dtype=bool)
            for b, s_lo, s_hi, q_lo, q_hi in groups:
                m |= (
                    (brand == b)
                    & (size >= s_lo)
                    & (size <= s_hi)
                    & (qty >= q_lo)
                    & (qty <= q_hi)
                )
            d = df.loc[m]
            rev_fp = np.round(
                d["l_extendedprice"].to_numpy(dtype=np.float64)
                * (1.0 - d["l_discount"].to_numpy(dtype=np.float64))
                * 1e4
            ).astype(np.int64)
            return pd.DataFrame(
                {"_g": np.zeros(1, dtype=np.int64),
                 "rev_fp": np.array([rev_fp.sum()], dtype=np.int64)}
            )

    partials = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(DisjunctiveRev, batch_format="pandas", concurrency=(1, 4))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"revenue": [int(g["rev_fp"].sum()) / 1e4]})

    return bucketed_group_reduce(
        partials, key_cols=["_g"], reduce_fn=finish, num_buckets=1
    )


def q16_supplier_counts(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q16-style supplier counting (adapted: the part-supplier
    relation is DISTINCT (l_partkey, l_suppkey) from lineitem — this
    corpus has no partsupp table): per (p_brand, p_type, p_size), how
    many DISTINCT suppliers ship the group's parts, excluding suppliers
    under review (s_acctbal < 0, the complaints-exclusion analogue)
    → (p_brand, p_type, p_size, supplier_cnt).

    100-TB shape: the exclusion set and the part-attribute map are
    dim-bounded broadcasts applied per batch; the distinct count runs
    through `grouped_distinct_count`'s (group, value)-bucketed exchange
    so a hot (brand,type,size) group's suppliers spread across buckets
    instead of landing on one reducer.
    """
    from kgflow.ops.shuffle import grouped_distinct_count
    from kgflow.sources.parquet import read_parquet_clean

    supp = pd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_acctbal"],
    )
    excluded = ray.put(
        np.sort(
            supp.loc[supp["s_acctbal"] < 0, "s_suppkey"].to_numpy(
                dtype=np.int64
            )
        )
    )
    part = pd.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    )
    part_ref = ray.put(
        {
            "brand": dict(zip(part["p_partkey"].to_numpy(), part["p_brand"])),
            "type": dict(zip(part["p_partkey"].to_numpy(), part["p_type"])),
            "size": dict(
                zip(part["p_partkey"].to_numpy(), part["p_size"].astype(int))
            ),
        }
    )

    class AttachPart:
        def __init__(self):
            self.excl = ray.get(excluded)
            p = ray.get(part_ref)
            self.brand, self.type, self.size = p["brand"], p["type"], p["size"]

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            keep = ~np.isin(df["l_suppkey"].to_numpy(), self.excl)
            d = df.loc[keep, ["l_partkey", "l_suppkey"]].drop_duplicates()
            pk = d["l_partkey"]
            return pd.DataFrame(
                {
                    "p_brand": pk.map(self.brand),
                    "p_type": pk.map(self.type),
                    "p_size": pk.map(self.size).astype(np.int64),
                    "l_suppkey": d["l_suppkey"].astype(np.int64),
                }
            )

    pairs = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey"],
    ).map_batches(AttachPart, batch_format="pandas", concurrency=(1, 4))

    return grouped_distinct_count(
        pairs,
        group_cols=["p_brand", "p_type", "p_size"],
        value_col="l_suppkey",
        out_col="supplier_cnt",
    )


def q8_market_share(
    sf_dir: str,
    region: str = "ASIA",
    nation: str = "NATION_3",
    p_type: str = "PROMO",
    year_lo: int = 1995,
    year_hi: int = 1998,
) -> "rd.Dataset":
    """TPC-H Q8-style national market share: among order lines for
    parts of ``p_type`` sold to customers in ``region`` during the
    order-date window, the share of revenue supplied by ``nation``,
    per order year → (o_year, mkt_share).

    100-TB shape: part (type filter → sorted partkey array), supplier
    (suppkey → is-target-nation bitmap) and the region's nation keys
    are all dim-bounded broadcasts; orders pre-filters to the window
    and to region customers (customer joins broadcast, key-bounded
    after the region filter) so the ONLY fact-fact exchange is
    lineitem ⋈ orders on orderkey carrying 3 ints/row. Revenue sums
    stay int64 fixed-point (1e-4) through every exchange; the single
    closing division per year is the only float op.
    Mirrors TPC-H Q8 (query family cited at SURVEY.md §2.7).
    """
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    nat = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = pd.read_parquet(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    )
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    region_nations = set(
        nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"].astype(int)
    )
    target_key = int(nat.loc[nat["n_name"] == nation, "n_nationkey"].iloc[0])

    part = pd.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
    )
    promo_ref = ray.put(
        np.sort(
            part.loc[part["p_type"] == p_type, "p_partkey"].to_numpy(
                dtype=np.int64
            )
        )
    )
    supp = pd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    target_supp_ref = ray.put(
        np.sort(
            supp.loc[
                supp["s_nationkey"].astype(int) == target_key, "s_suppkey"
            ].to_numpy(dtype=np.int64)
        )
    )

    def region_customers(df: pd.DataFrame) -> pd.DataFrame:
        m = df["c_nationkey"].astype(int).isin(region_nations).to_numpy()
        return df.loc[m, ["c_custkey"]]

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(region_customers, batch_format="pandas")

    lo = np.datetime64(f"{year_lo}-01-01", "us")
    hi = np.datetime64(f"{year_hi}-01-01", "us")

    def order_window(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"].to_numpy()
        m = (d >= lo) & (d < hi)
        d2 = df.loc[m]
        return pd.DataFrame(
            {
                "o_orderkey": d2["o_orderkey"].astype(np.int64),
                "c_custkey": d2["o_custkey"].astype(np.int64),
                "o_year": d2["o_orderdate"].dt.year.astype(np.int64),
            }
        )

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(order_window, batch_format="pandas")

    oc = hash_join(orders, cust, on="c_custkey", right_small=True).map_batches(
        lambda df: df.rename(columns={"o_orderkey": "l_orderkey"})[
            ["l_orderkey", "o_year"]
        ],
        batch_format="pandas",
    )

    class LineShrink:
        """Broadcast promo-part filter + target-supplier flag: the
        orderkey exchange carries (orderkey, rev_fp, is_target)."""

        def __init__(self):
            self.promo = ray.get(promo_ref)
            self.target = ray.get(target_supp_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            keep = np.isin(df["l_partkey"].to_numpy(dtype=np.int64), self.promo)
            d = df.loc[keep]
            rev_fp = np.round(
                d["l_extendedprice"].to_numpy(dtype=np.float64)
                * (1.0 - d["l_discount"].to_numpy(dtype=np.float64))
                * 1e4
            ).astype(np.int64)
            is_t = np.isin(
                d["l_suppkey"].to_numpy(dtype=np.int64), self.target
            )
            return pd.DataFrame(
                {
                    "l_orderkey": d["l_orderkey"].astype(np.int64),
                    "rev_fp": rev_fp,
                    "tgt_fp": np.where(is_t, rev_fp, 0),
                }
            )

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(LineShrink, batch_format="pandas", concurrency=(1, 4))

    ol = hash_join(line, oc.materialize(), on="l_orderkey", right_small=False)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_year", as_index=False)[["rev_fp", "tgt_fp"]].sum()

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_year", as_index=False)[["rev_fp", "tgt_fp"]].sum()
        return pd.DataFrame(
            {
                "o_year": out["o_year"].astype(np.int64),
                "mkt_share": out["tgt_fp"].to_numpy(dtype=np.int64)
                / out["rev_fp"].to_numpy(dtype=np.int64),
            }
        )

    return bucketed_group_reduce(
        ol.map_batches(partial, batch_format="pandas"),
        key_cols=["o_year"],
        reduce_fn=finish,
        num_buckets=2,
    )


def q12_late_priority(
    sf_dir: str, late_days: int = 365
) -> "rd.Dataset":
    """TPC-H Q12-style priority-vs-lateness counts (adapted: this
    corpus has no l_shipmode/l_commitdate/l_receiptdate, so the ship
    bucket is lateness — a line is 'late' when it shipped more than
    ``late_days`` days after the order date): per bucket, how many
    lines belong to URGENT/HIGH orders vs the rest
    → (ship_bucket, high_line_count, low_line_count).

    100-TB shape: orders shrinks per batch to (orderkey, orderdate-ns
    int64, is-high bit); lineitem to (orderkey, shipdate-ns int64);
    the ONLY exchange is the orderkey fact-fact join (3 ints/row),
    lateness is one vectorized int64 subtract after the join, and the
    final reduce is 2×2 counts. Mirrors TPC-H Q12 (query family cited
    at SURVEY.md §2.7).
    """
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    def order_shrink(df: pd.DataFrame) -> pd.DataFrame:
        pri = df["o_orderpriority"].to_numpy()
        return pd.DataFrame(
            {
                "l_orderkey": df["o_orderkey"].astype(np.int64),
                "o_date_ns": df["o_orderdate"]
                .to_numpy()
                .astype("datetime64[ns]")
                .astype(np.int64),
                "is_high": np.isin(pri, ["1-URGENT", "2-HIGH"]).astype(
                    np.int64
                ),
            }
        )

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(order_shrink, batch_format="pandas")

    def line_shrink(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].astype(np.int64),
                "s_date_ns": df["l_shipdate"]
                .to_numpy()
                .astype("datetime64[ns]")
                .astype(np.int64),
            }
        )

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    ).map_batches(line_shrink, batch_format="pandas")

    ol = hash_join(line, orders.materialize(), on="l_orderkey",
                   right_small=False)
    cut = np.int64(late_days) * np.int64(86_400_000_000_000)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        late = (
            df["s_date_ns"].to_numpy(dtype=np.int64)
            - df["o_date_ns"].to_numpy(dtype=np.int64)
        ) > cut
        high = df["is_high"].to_numpy(dtype=np.int64)
        d = pd.DataFrame(
            {
                "ship_bucket": np.where(late, "late", "ontime"),
                "high": high,
                "low": 1 - high,
            }
        )
        return d.groupby("ship_bucket", as_index=False)[["high", "low"]].sum()

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("ship_bucket", as_index=False)[["high", "low"]].sum()
        return pd.DataFrame(
            {
                "ship_bucket": out["ship_bucket"],
                "high_line_count": out["high"].astype(np.int64),
                "low_line_count": out["low"].astype(np.int64),
            }
        )

    return bucketed_group_reduce(
        ol.map_batches(partial, batch_format="pandas"),
        key_cols=["ship_bucket"],
        reduce_fn=finish,
        num_buckets=2,
    )


def q21_slowest_supplier(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q21-style 'suppliers who kept orders waiting' (adapted:
    no commit/receipt dates in this corpus, so the waiting criterion
    is being the UNIQUE slowest shipper): over orders with >= 2
    distinct suppliers, a supplier qualifies for an order when its
    latest line-ship date is strictly later than every other
    supplier's; count qualifying orders per supplier
    → (s_name, numwait).

    100-TB shape: per-batch combiner pre-reduces lineitem to
    (orderkey, suppkey) -> max shipdate (3 ints/row), then ONE
    orderkey-bucketed exchange; the in-bucket kernel is vectorized
    groupby max/count/argmax — an order's rows land in one bucket but
    are supplier-bounded, not line-bounded. The per-supplier count
    table is dim-bounded, so the name attach is a broadcast map and
    the final reduce is tiny. Mirrors TPC-H Q21 (query family cited
    at SURVEY.md §2.7).
    """
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    supp = pd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name"],
    )
    name_ref = ray.put(dict(zip(supp["s_suppkey"].astype(int), supp["s_name"])))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].astype(np.int64),
                "l_suppkey": df["l_suppkey"].astype(np.int64),
                "ship_ns": df["l_shipdate"]
                .to_numpy()
                .astype("datetime64[ns]")
                .astype(np.int64),
            }
        )
        return d.groupby(["l_orderkey", "l_suppkey"], as_index=False)[
            "ship_ns"
        ].max()

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(partial, batch_format="pandas")

    def slowest(g: pd.DataFrame) -> pd.DataFrame:
        sm = g.groupby(["l_orderkey", "l_suppkey"], as_index=False)[
            "ship_ns"
        ].max()
        per = sm.groupby("l_orderkey")["ship_ns"]
        omax = per.transform("max").to_numpy()
        nsupp = per.transform("size").to_numpy()
        at_max = sm["ship_ns"].to_numpy() == omax
        # orders where exactly one supplier attains the max
        nmax = (
            sm.loc[at_max].groupby("l_orderkey")["l_suppkey"].transform("size")
        )
        win = sm.loc[at_max].loc[
            (nmax.to_numpy() == 1) & (nsupp[at_max] >= 2)
        ]
        out = win.groupby("l_suppkey", as_index=False).size()
        return out.rename(columns={"size": "numwait"})

    counts = bucketed_group_reduce(
        line,
        key_cols=["l_orderkey"],
        reduce_fn=slowest,
        num_buckets=16,
    )

    class Finish:
        def __init__(self):
            self.names = ray.get(name_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("l_suppkey", as_index=False)["numwait"].sum()
            return pd.DataFrame(
                {
                    "s_name": out["l_suppkey"].map(self.names),
                    "numwait": out["numwait"].astype(np.int64),
                }
            )

    return bucketed_group_reduce(
        counts,
        key_cols=["l_suppkey"],
        reduce_fn=lambda df: df.groupby("l_suppkey", as_index=False)[
            "numwait"
        ].sum(),
        num_buckets=1,
    ).map_batches(Finish, batch_format="pandas", concurrency=(1, 1))


def q2_min_cost_supplier(sf_dir: str, region: str = "EUROPE") -> "rd.Dataset":
    """TPC-H Q2-style groupwise-min supplier selection (adapted: no
    partsupp table in this corpus, so a (part, supplier) pair's
    "supply cost" is the MINIMUM observed line price over lineitem):
    for every part supplied by a ``region`` supplier, the cheapest
    such supplier (ties broken by smallest suppkey) →
    (p_partkey, cost, s_name, n_name, s_acctbal).

    100-TB shape: the region's supplier keys and the name/nation/
    acctbal attach maps are dim-bounded broadcasts; lineitem shrinks
    per-batch to (partkey, suppkey) -> min cost_fp combiner rows, so
    the ONE exchange is partkey-bucketed 3-int rows and the in-bucket
    argmin is a vectorized sort_values/first. Costs ride as int64
    cents (exact); the closing /100 is the only float op. Mirrors
    TPC-H Q2's correlated-min subquery (SURVEY.md §2.7).
    """
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    nat = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name", "n_regionkey"],
    )
    reg = pd.read_parquet(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    )
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    nat_keys = nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"].astype(int)
    supp = pd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    )
    supp = supp.loc[supp["s_nationkey"].astype(int).isin(set(nat_keys))]
    region_supp_ref = ray.put(
        np.sort(supp["s_suppkey"].to_numpy(dtype=np.int64))
    )
    nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    attach_ref = ray.put(
        {
            int(r.s_suppkey): (r.s_name, nname[int(r.s_nationkey)], r.s_acctbal)
            for r in supp.itertuples()
        }
    )

    class PairMin:
        """Broadcast region-supplier filter + per-batch pair-min combiner."""

        def __init__(self):
            self.keep = ray.get(region_supp_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.isin(df["l_suppkey"].to_numpy(dtype=np.int64), self.keep)
            d = df.loc[m]
            out = pd.DataFrame(
                {
                    "l_partkey": d["l_partkey"].astype(np.int64),
                    "l_suppkey": d["l_suppkey"].astype(np.int64),
                    "cost_fp": np.round(
                        d["l_extendedprice"].to_numpy(dtype=np.float64) * 100
                    ).astype(np.int64),
                }
            )
            return out.groupby(
                ["l_partkey", "l_suppkey"], as_index=False
            )["cost_fp"].min()

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    ).map_batches(PairMin, batch_format="pandas", concurrency=(1, 4))

    def argmin(g: pd.DataFrame) -> pd.DataFrame:
        pm = g.groupby(["l_partkey", "l_suppkey"], as_index=False)[
            "cost_fp"
        ].min()
        pm = pm.sort_values(["l_partkey", "cost_fp", "l_suppkey"])
        return pm.groupby("l_partkey", as_index=False).first()

    best = bucketed_group_reduce(
        line, key_cols=["l_partkey"], reduce_fn=argmin, num_buckets=16
    )

    class Attach:
        def __init__(self):
            self.at = ray.get(attach_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rows = [self.at[int(k)] for k in df["l_suppkey"]]
            return pd.DataFrame(
                {
                    "p_partkey": df["l_partkey"].astype(np.int64),
                    "cost": df["cost_fp"].astype(np.float64) / 100.0,
                    "s_name": [r[0] for r in rows],
                    "n_name": [r[1] for r in rows],
                    "s_acctbal": [r[2] for r in rows],
                }
            )

    return best.map_batches(Attach, batch_format="pandas", concurrency=(1, 2))


def q9_product_profit(sf_dir: str, name_substr: str = "widget") -> "rd.Dataset":
    """TPC-H Q9-style product-type profit by supplier nation and order
    year (adapted: no partsupp supplycost in this corpus, so unit cost
    is the part's p_retailprice): profit = Σ ext·(1−disc) −
    retail·qty over lineitems of parts whose name contains
    ``name_substr`` → (n_name, o_year, sum_profit).

    100-TB shape: partkey -> retail_fp and suppkey -> nationkey are
    dim-bounded broadcast maps applied in ONE lineitem pass that also
    drops non-matching parts, so the ONLY fact-fact exchange is
    lineitem ⋈ orders on orderkey carrying 3 ints/row; the final
    (nation, year) reduce is dim-bounded. Profit rides every exchange
    as int64 1e-4 fixed point (quantity is integral in this corpus;
    validated per batch); ONE closing division. Mirrors TPC-H Q9
    (SURVEY.md §2.7).
    """
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    part = pd.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_name", "p_retailprice"],
    )
    part = part.loc[part["p_name"].str.contains(name_substr, regex=False)]
    retail_ref = ray.put(
        dict(
            zip(
                part["p_partkey"].astype(int),
                np.round(
                    part["p_retailprice"].to_numpy(dtype=np.float64) * 1e4
                ).astype(np.int64),
            )
        )
    )
    supp = pd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    snat_ref = ray.put(
        dict(zip(supp["s_suppkey"].astype(int), supp["s_nationkey"].astype(int)))
    )
    nat = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    class Shrink:
        def __init__(self):
            self.retail = ray.get(retail_ref)
            self.snat = ray.get(snat_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rfp = df["l_partkey"].map(self.retail)
            d = df.loc[rfp.notna()]
            rfp = rfp.loc[rfp.notna()].to_numpy(dtype=np.int64)
            qty = d["l_quantity"].to_numpy(dtype=np.float64)
            assert np.all(qty == np.round(qty)), "non-integral quantity"
            rev_fp = np.round(
                d["l_extendedprice"].to_numpy(dtype=np.float64)
                * (1.0 - d["l_discount"].to_numpy(dtype=np.float64))
                * 1e4
            ).astype(np.int64)
            profit = rev_fp - rfp * qty.astype(np.int64)
            return pd.DataFrame(
                {
                    "l_orderkey": d["l_orderkey"].astype(np.int64),
                    "nkey": d["l_suppkey"].map(self.snat).astype(np.int64),
                    "profit_fp": profit,
                }
            )

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
            "l_extendedprice", "l_discount",
        ],
    ).map_batches(Shrink, batch_format="pandas", concurrency=(1, 4))

    def oyear(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": df["o_orderkey"].astype(np.int64),
                "o_year": df["o_orderdate"].dt.year.astype(np.int64),
            }
        )

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate"],
    ).map_batches(oyear, batch_format="pandas")

    ol = hash_join(line, orders.materialize(), on="l_orderkey")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["nkey", "o_year"], as_index=False)["profit_fp"].sum()

    agg = bucketed_group_reduce(
        ol.map_batches(fold, batch_format="pandas"),
        key_cols=["nkey", "o_year"],
        reduce_fn=fold,
        num_buckets=1,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_name": df["nkey"].map(nname),
                "o_year": df["o_year"].astype(np.int64),
                "sum_profit": df["profit_fp"].astype(np.float64) / 1e4,
            }
        )

    return agg.map_batches(finish, batch_format="pandas", concurrency=1)


def q11_important_parts(sf_dir: str, region: str = "EUROPE") -> "rd.Dataset":
    """TPC-H Q11-style "important stock" (adapted: no partsupp, so a
    part's value is Σ l_extendedprice over lines shipped by ``region``
    suppliers; the importance bar is 110% of the MEAN part value,
    scale-free where TPC-H's 0.0001/SF constant is not) →
    (p_partkey, value) for parts with N·10·value > 11·total.

    100-TB shape: region suppliers broadcast; per-batch partkey
    partial sums (int64 cents) → ONE partkey-bucketed exchange; the
    global (total, count) is a two-int driver scalar from per-bucket
    partials, and the threshold compare is pure integer math pushed
    back as a broadcast filter — no second pass over lineitem.
    Mirrors TPC-H Q11's HAVING-scalar-subquery shape (SURVEY.md §2.7).
    """
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    nat = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey"],
    )
    reg = pd.read_parquet(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    )
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    nk = set(nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"].astype(int))
    supp = pd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_nationkey"],
    )
    keep_ref = ray.put(
        np.sort(
            supp.loc[
                supp["s_nationkey"].astype(int).isin(nk), "s_suppkey"
            ].to_numpy(dtype=np.int64)
        )
    )

    class Partial:
        def __init__(self):
            self.keep = ray.get(keep_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            m = np.isin(df["l_suppkey"].to_numpy(dtype=np.int64), self.keep)
            d = df.loc[m]
            out = pd.DataFrame(
                {
                    "l_partkey": d["l_partkey"].astype(np.int64),
                    "val_fp": np.round(
                        d["l_extendedprice"].to_numpy(dtype=np.float64) * 100
                    ).astype(np.int64),
                }
            )
            return out.groupby("l_partkey", as_index=False)["val_fp"].sum()

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    ).map_batches(Partial, batch_format="pandas", concurrency=(1, 4))

    vals = bucketed_group_reduce(
        line,
        key_cols=["l_partkey"],
        reduce_fn=lambda g: g.groupby("l_partkey", as_index=False)[
            "val_fp"
        ].sum(),
        num_buckets=16,
    ).materialize()  # consumed twice: scalar total + threshold filter

    # two-int global scalar via a distributed fold (no driver row pull)
    tot = vals.map_batches(
        lambda d: pd.DataFrame(
            {"t": [d["val_fp"].sum()], "n": [np.int64(len(d))]}
        ),
        batch_format="pandas",
    ).to_pandas()
    total, nparts = int(tot["t"].sum()), int(tot["n"].sum())

    def thresh(df: pd.DataFrame) -> pd.DataFrame:
        keep = 10 * nparts * df["val_fp"].to_numpy(dtype=object) > 11 * total
        d = df.loc[np.asarray(keep, dtype=bool)]
        return pd.DataFrame(
            {
                "p_partkey": d["l_partkey"].astype(np.int64),
                "value": d["val_fp"].astype(np.float64) / 100.0,
            }
        )

    return vals.map_batches(thresh, batch_format="pandas")


def q20_excess_share_suppliers(
    sf_dir: str, name_substr: str = "widget", year: int = 1996
) -> "rd.Dataset":
    """TPC-H Q20-style "suppliers with excess share" (adapted: no
    partsupp availqty, so the criterion is a supplier holding a STRICT
    MAJORITY of some matching part's shipped quantity in ``year``):
    distinct suppliers with 2·sq > tq for some part whose name
    contains ``name_substr`` → (s_name, n_name).

    100-TB shape: matching partkeys broadcast (name-filtered dim);
    per-batch (part, supp) quantity partials (int64 1e-2 fixed point)
    → ONE partkey-bucketed exchange whose in-bucket kernel computes
    part totals via transform('sum') and emits qualifying suppkeys;
    the distinct + name attach is dim-bounded. Integer threshold
    math mirrors exactly in SQL. Mirrors TPC-H Q20's nested
    correlated-aggregate shape (SURVEY.md §2.7).
    """
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    part = pd.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"]
    )
    keys_ref = ray.put(
        np.sort(
            part.loc[
                part["p_name"].str.contains(name_substr, regex=False),
                "p_partkey",
            ].to_numpy(dtype=np.int64)
        )
    )
    supp = pd.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_suppkey", "s_name", "s_nationkey"],
    )
    nat = pd.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    )
    nname = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    attach_ref = ray.put(
        {
            int(r.s_suppkey): (r.s_name, nname[int(r.s_nationkey)])
            for r in supp.itertuples()
        }
    )
    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{year + 1}-01-01", "us")

    class Partial:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            d0 = df["l_shipdate"].to_numpy()
            m = (
                (d0 >= lo)
                & (d0 < hi)
                & np.isin(df["l_partkey"].to_numpy(dtype=np.int64), self.keys)
            )
            d = df.loc[m]
            out = pd.DataFrame(
                {
                    "l_partkey": d["l_partkey"].astype(np.int64),
                    "l_suppkey": d["l_suppkey"].astype(np.int64),
                    "sq": np.round(
                        d["l_quantity"].to_numpy(dtype=np.float64) * 100
                    ).astype(np.int64),
                }
            )
            return out.groupby(
                ["l_partkey", "l_suppkey"], as_index=False
            )["sq"].sum()

    line = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    ).map_batches(Partial, batch_format="pandas", concurrency=(1, 4))

    def majority(g: pd.DataFrame) -> pd.DataFrame:
        pq_ = g.groupby(["l_partkey", "l_suppkey"], as_index=False)["sq"].sum()
        tq = pq_.groupby("l_partkey")["sq"].transform("sum").to_numpy()
        win = pq_.loc[2 * pq_["sq"].to_numpy() > tq, ["l_suppkey"]]
        return win.drop_duplicates()

    hits = bucketed_group_reduce(
        line, key_cols=["l_partkey"], reduce_fn=majority, num_buckets=16
    )

    class Finish:
        def __init__(self):
            self.at = ray.get(attach_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            d = df.drop_duplicates("l_suppkey")
            rows = [self.at[int(k)] for k in d["l_suppkey"]]
            return pd.DataFrame(
                {
                    "s_name": [r[0] for r in rows],
                    "n_name": [r[1] for r in rows],
                }
            )

    return bucketed_group_reduce(
        hits,
        key_cols=["l_suppkey"],
        reduce_fn=lambda g: g.drop_duplicates("l_suppkey"),
        num_buckets=1,
    ).map_batches(Finish, batch_format="pandas", concurrency=(1, 1))


def customer_rfm(
    sf_dir: str, tiles: int = 5, driver_limit: int = 2_000_000
) -> "rd.Dataset":
    """RFM segmentation — the classic customer-analytics composition:
    per customer (from orders alone) recency = last order day,
    frequency = order count, monetary = total spend (int64 cents),
    each bucketed into ``tiles`` NTILE groups over the TOTAL order
    (value DESC, custkey ASC) → (c_custkey, r_tile, f_tile, m_tile).

    100-TB shape: the per-customer aggregate is a per-batch combiner
    + ONE custkey-bucketed reduce (customer-bounded, materialized for
    its four consumers); each dimension's global rank comes from
    `global_row_number`'s two-pass range decomposition (sort DESC via
    a negated column — NO single-bucket global sort), the NTILE split
    is the standard front-loaded integer formula from (rank, N), and
    the three rank tables join back custkey-co-bucketed. N is block
    metadata after the materialize.

    Customer tables at or below ``driver_limit`` rows rank all three
    dimensions driver-resident (the CC/k_core precedent: three
    distributed rank passes are ~12 sort barriers against three numpy
    lexsorts over a 4-int-per-row frame); identical ordering and tile
    formula, ``driver_limit=0`` forces the distributed passes."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce, global_row_number
    from kgflow.sources.parquet import read_parquet_clean

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "c_custkey": df["o_custkey"].astype(np.int64),
                "day": df["o_orderdate"]
                .to_numpy()
                .astype("datetime64[D]")
                .astype(np.int64),
                "n": np.ones(len(df), dtype=np.int64),
                "m_fp": np.round(
                    df["o_totalprice"].to_numpy(dtype=np.float64) * 100
                ).astype(np.int64),
            }
        )
        return d.groupby("c_custkey", as_index=False).agg(
            last_day=("day", "max"), n=("n", "sum"), m_fp=("m_fp", "sum")
        )

    agg = bucketed_group_reduce(
        read_parquet_clean(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_orderdate", "o_totalprice"],
        ).map_batches(partial, batch_format="pandas"),
        key_cols=["c_custkey"],
        reduce_fn=lambda g: g.groupby("c_custkey", as_index=False).agg(
            last_day=("last_day", "max"), n=("n", "sum"), m_fp=("m_fp", "sum")
        ),
    ).materialize()
    n_cust = agg.count()  # block metadata post-materialize

    def tile_of(rn: np.ndarray) -> np.ndarray:
        q, r = n_cust // tiles, n_cust % tiles
        cut = r * (q + 1)
        return (
            np.where(
                rn <= cut,
                (rn - 1) // max(q + 1, 1),
                r + (rn - 1 - cut) // max(q, 1),
            ).astype(np.int64)
            + 1
        )

    if driver_limit > 0 and n_cust <= driver_limit:
        adf = agg.to_pandas()
        keys = adf["c_custkey"].to_numpy(dtype=np.int64)

        def driver_tiles(val_col: str) -> np.ndarray:
            # rank = position under (value DESC, custkey ASC) — the
            # same total order ranked_tiles feeds global_row_number
            order = np.lexsort((keys, -adf[val_col].to_numpy(dtype=np.int64)))
            rn = np.empty(n_cust, dtype=np.int64)
            rn[order] = np.arange(1, n_cust + 1)
            return tile_of(rn)

        return rd.from_pandas(
            pd.DataFrame(
                {
                    "c_custkey": keys,
                    "r_tile": driver_tiles("last_day"),
                    "f_tile": driver_tiles("n"),
                    "m_tile": driver_tiles("m_fp"),
                }
            )
        )

    def ranked_tiles(val_col: str, out_col: str) -> "rd.Dataset":
        neg = agg.map_batches(
            lambda d, v=val_col: pd.DataFrame(
                {"c_custkey": d["c_custkey"], "_neg": -d[v].to_numpy()}
            ),
            batch_format="pandas",
        )
        rn = global_row_number(
            neg, sort_cols=["_neg", "c_custkey"], out_col="rn"
        )

        def finish(d: pd.DataFrame, _o=out_col) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "c_custkey": d["c_custkey"].astype(np.int64),
                    _o: tile_of(d["rn"].to_numpy(dtype=np.int64)),
                }
            )

        return rn.map_batches(finish, batch_format="pandas").materialize()

    r_t = ranked_tiles("last_day", "r_tile")
    f_t = ranked_tiles("n", "f_tile")
    m_t = ranked_tiles("m_fp", "m_tile")

    out = hash_join(
        hash_join(r_t, f_t, on="c_custkey").materialize(),
        m_t,
        on="c_custkey",
    )
    return out.map_batches(
        lambda d: d[["c_custkey", "r_tile", "f_tile", "m_tile"]].astype(
            {"r_tile": "int64", "f_tile": "int64", "m_tile": "int64"}
        ),
        batch_format="pandas",
    )


def orders_benford_digits(sf_dir: str) -> "rd.Dataset":
    """Benford's-law first-significant-digit audit of order totals —
    (o_orderpriority, digit, n): the classic fraud / synthetic-data
    screen (counts of leading digits 1–9 of floor(o_totalprice·100),
    compared by the caller against log10(1+1/d)).

    Quantize-first (cents as int64, both engines floor the SAME
    double·100 product) so the leading digit is integer-exact; the
    digit is peeled with ≤ ⌈log10(max)⌉ vectorized floor-divides, no
    string formatting and no per-row Python. One (priority, digit)
    count combiner per block rides a single tiny exchange."""
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderpriority", "o_totalprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            df["o_totalprice"].to_numpy(dtype=np.float64) * 100
        ).astype(np.int64)
        lead = np.abs(cents)
        # peel to the first significant digit: ≤ 19 vectorized passes
        while (lead >= 10).any():
            big = lead >= 10
            lead[big] //= 10
        t = pd.DataFrame(
            {"o_orderpriority": df["o_orderpriority"].to_numpy(), "digit": lead}
        )
        out = t.groupby(
            ["o_orderpriority", "digit"], as_index=False, sort=False
        ).size()
        return out.rename(columns={"size": "n"})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["o_orderpriority", "digit"], as_index=False, sort=False)[
            "n"
        ].sum()

    partials = orders.map_batches(partial, batch_format="pandas")
    return bucketed_group_reduce(
        partials, key_cols=["o_orderpriority", "digit"], reduce_fn=finish
    )


def events_daily_autocorr(sf_dir: str) -> "rd.Dataset":
    """Lag-1 autocorrelation moments of the daily event count per type
    — the time-series health check (is activity momentum-driven or
    memoryless?): per event_type, exact bivariate moments of
    (count(day), count(day+1)) over consecutive PRESENT day pairs.

    Composition of shipped primitives: one (type, day) count reduce
    shrinks 10^12 events to ~types×days rows; the lag pairing is a
    self hash-join of that tiny table on (type, day−1); the moment row
    is `grouped_power_sums`' bivariate sibling `grouped_corr_moments`
    (quantize-first int64 — counts are already exact ints). Output
    (event_type, n, sx, sy, sxx, syy, sxy) is hash-exact; r = the one
    driver-side division the caller applies."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.profile import grouped_corr_moments
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def day_counts(df: pd.DataFrame) -> pd.DataFrame:
        # keep timestamp (not date32) so the lag-1 shift below stays
        # vectorized Timedelta arithmetic
        t = pd.DataFrame(
            {"event_type": df["event_type"], "day": df["ts"].dt.floor("D")}
        )
        out = t.groupby(["event_type", "day"], as_index=False, sort=False).size()
        return out.rename(columns={"size": "c"})

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "day"], as_index=False, sort=False)["c"].sum()

    # materialize: the (type, day) table is V-bounded and consumed
    # TWICE (both join sides) — without this, each side AND the join's
    # broadcast-size probe re-execute the full count reduce over the
    # corpus (measured 17.7 s → ~3 s at sf0.01)
    counts = bucketed_group_reduce(
        ev.map_batches(day_counts, batch_format="pandas"),
        key_cols=["event_type", "day"],
        reduce_fn=finish,
    ).materialize()

    def shift_back(df: pd.DataFrame) -> pd.DataFrame:
        # tomorrow's count keyed at today: join gives (c_t, c_{t+1})
        out = df.copy()
        out["day"] = out["day"] - pd.Timedelta(days=1)
        return out.rename(columns={"c": "c_next"})

    paired = hash_join(
        counts,
        counts.map_batches(shift_back, batch_format="pandas"),
        on=["event_type", "day"],
        how="inner",
    )
    return grouped_corr_moments(
        paired, key="event_type", x_col="c", y_col="c_next", x_scale=1, y_scale=1
    )


def events_daily_cusum(sf_dir: str) -> "rd.Dataset":
    """CUSUM change-point detection over the daily event count per
    type — the streaming-monitoring classic (Page 1954): per type,
    S_t = max(0, S_{t−1} + c_t − k) over present days in order, with
    k = the exact nearest-rank median daily count. Emits
    (event_type, k, s_max, day_max, n_days): a large s_max flags a
    sustained upward shift; day_max is the FIRST day attaining it.

    Integer-exact end to end: counts and the median are int64, and the
    recursion is vectorized via the prefix identity
    S_t = P_t − min(0, min_{j≤t} P_j) with P = cumsum(c − k) — one
    cumsum + one minimum.accumulate, no sequential Python. Scale
    shape: the corpus collapses to a (type, day) count table (ONE
    count exchange, V-bounded); the scan runs per type inside one
    type-bucketed reduce whose state is days-bounded."""
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def day_counts(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"event_type": df["event_type"], "day": df["ts"].dt.floor("D")}
        )
        out = t.groupby(["event_type", "day"], as_index=False, sort=False).size()
        return out.rename(columns={"size": "c"})

    def sum_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["event_type", "day"], as_index=False, sort=False)["c"].sum()

    counts = bucketed_group_reduce(
        ev.map_batches(day_counts, batch_format="pandas"),
        key_cols=["event_type", "day"],
        reduce_fn=sum_counts,
    )

    def cusum(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, grp in g.groupby("event_type", sort=False):
            grp = grp.sort_values("day", kind="mergesort")
            c = grp["c"].to_numpy(dtype=np.int64)
            n = len(c)
            k = int(np.sort(c)[int(np.ceil(0.5 * n)) - 1])  # nearest-rank
            p = np.cumsum(c - k)
            runmin = np.minimum(np.minimum.accumulate(p), 0)
            s = p - runmin
            i = int(np.argmax(s))  # first max (argmax ties → lowest index)
            rows.append(
                {
                    "event_type": et,
                    "k": k,
                    "s_max": int(s[i]),
                    "day_max": grp["day"].iloc[i],
                    "n_days": n,
                }
            )
        return pd.DataFrame(
            rows, columns=["event_type", "k", "s_max", "day_max", "n_days"]
        )

    return bucketed_group_reduce(counts, key_cols=["event_type"], reduce_fn=cusum)


def events_daily_streaks(sf_dir: str) -> "rd.Dataset":
    """Longest consecutive-active-day streak per user — the
    gaps-and-islands classic: distinct active days, islands keyed by
    day − rank(day) (constant within a consecutive run), longest run
    per user. Emits (user_id, n_active_days, max_streak).

    Scale shape: a per-block (user, day) dedup combiner shrinks the
    corpus before ONE user-bucketed exchange (same skeleton as the
    distinct-count ops); the island scan is vectorized int day-number
    arithmetic over each bucket — no per-row Python, state bounded by
    the bucket's (user, day) rows."""
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )

    def user_days(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({"user_id": df["user_id"], "day": df["ts"].dt.floor("D")})
        return t.drop_duplicates()

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort"
        )
        uid = g["user_id"].to_numpy(dtype=np.int64)
        dayn = (g["day"].to_numpy().astype("datetime64[D]")).astype(np.int64)
        new_seg = np.empty(len(g), dtype=bool)
        if not len(g):
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "n_active_days": pd.Series([], dtype="int64"),
                    "max_streak": pd.Series([], dtype="int64"),
                }
            )
        new_seg[0] = True
        # a new island starts at a user change OR a >1-day jump
        new_seg[1:] = (uid[1:] != uid[:-1]) | (dayn[1:] != dayn[:-1] + 1)
        island = np.cumsum(new_seg)
        lens = np.bincount(island)[1:]  # length of each island
        island_user = uid[new_seg]
        t = pd.DataFrame({"user_id": island_user, "len": lens})
        out = t.groupby("user_id", as_index=False).agg(max_streak=("len", "max"))
        days = (
            g.groupby("user_id", as_index=False)
            .size()
            .rename(columns={"size": "n_active_days"})
        )
        return days.merge(out, on="user_id")

    return bucketed_group_reduce(
        ev.map_batches(user_days, batch_format="pandas"),
        key_cols=["user_id"],
        reduce_fn=streaks,
    )


def skyline(
    ds: "rd.Dataset",
    min_col: str,
    max_col: str,
    max_candidates: int = 200_000,
) -> "rd.Dataset":
    """2-D Pareto frontier (skyline): rows not dominated by any other —
    a dominates b iff a.min_col ≤ b.min_col, a.max_col ≥ b.max_col and
    at least one is strict; exact duplicates on both axes all survive.

    Scale shape: the skyline operator is DISTRIBUTIVE —
    skyline(S) = skyline(∪ skyline(block)) — so pass 1 computes each
    block's local frontier with a vectorized sort+cummax (no Python
    per row, no shuffle), and only the surviving candidates (typically
    O(√n) of a block, never more than the block) move to the single
    merge task for the identical kernel. A loud guard caps the
    candidate set: a frontier wider than ``max_candidates`` means the
    two axes are anti-correlated over the whole corpus and the result
    itself would be data-sized — fail with the count instead of
    silently building a giant block."""

    def local_skyline(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or min_col not in df.columns:
            return df.head(0)
        # within equal min_col keep only the max_col maxima (ties all
        # survive: equal pairs dominate nothing)
        gmax = df.groupby(min_col)[max_col].transform("max")
        df = df[df[max_col] == gmax]
        # across ascending min_col, survive iff max_col strictly
        # exceeds every smaller-min row's value
        ux = (
            df.drop_duplicates(min_col)[[min_col, max_col]]
            .sort_values(min_col, kind="mergesort")
            .reset_index(drop=True)
        )
        prior = ux[max_col].cummax().shift(1)
        keep_keys = ux.loc[
            prior.isna() | (ux[max_col] > prior), min_col
        ]
        return df[df[min_col].isin(set(keep_keys))].reset_index(
            drop=True
        )

    # materialize: the candidate set is consumed twice (guard count +
    # merge) and is frontier-sized, not data-sized; without this the
    # full local-skyline pass re-executes for the merge
    cand = ds.map_batches(
        local_skyline, batch_format="pandas"
    ).materialize()
    n = cand.count()
    if n > max_candidates:
        raise ValueError(
            f"skyline: {n} frontier candidates exceed max_candidates="
            f"{max_candidates}; the axes are anti-correlated and the "
            "skyline itself is data-sized"
        )
    return cand.repartition(1).map_batches(
        local_skyline, batch_format="pandas", batch_size=None
    )


def cdc_apply(
    base: "rd.Dataset",
    changes: "rd.Dataset",
    key: str,
    seq_col: str,
    op_col: str,
    val_col: str,
) -> "rd.Dataset":
    """MERGE / CDC apply: fold a change stream (insert/update/delete)
    onto a base snapshot, latest-sequence-wins — the lakehouse upsert
    primitive (Iceberg/Delta MERGE INTO shape) as one keyed exchange.

    Contract: change ``seq_col`` values are ≥ 0 and unique per key
    (e.g. a log offset); ``op_col`` is 'U' (upsert — also covers
    inserts of keys absent from base) or 'D' (delete). Base rows enter
    the fold as seq = −1 upserts, so a key with no changes passes
    through and any change outranks the base row.

    Scale shape: base and changes stay block-streamed; both sides are
    projected to (key, seq, op, val) rows BEFORE the union, and ONE
    hash-bucketed reduce per key picks the max-seq row with a
    vectorized sort + group-tail — no driver materialization, no
    second exchange. Deletes drop inside the reduce."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def tag_base(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or key not in df.columns:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype="int64"),
                    "_seq": pd.Series([], dtype="int64"),
                    "_op": pd.Series([], dtype=object),
                    val_col: pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                key: df[key].astype("int64"),
                "_seq": np.full(len(df), -1, dtype=np.int64),
                "_op": np.full(len(df), "U", dtype=object),
                val_col: df[val_col],
            }
        )

    def tag_changes(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or key not in df.columns:
            return tag_base(df)
        if (df[seq_col] < 0).any():
            raise ValueError("cdc_apply: change seq values must be >= 0")
        return pd.DataFrame(
            {
                key: df[key].astype("int64"),
                "_seq": df[seq_col].astype("int64"),
                "_op": df[op_col].astype(object),
                val_col: df[val_col],
            }
        )

    tagged = base.map_batches(tag_base, batch_format="pandas").union(
        changes.map_batches(tag_changes, batch_format="pandas")
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        last = (
            g.sort_values([key, "_seq"], kind="mergesort")
            .groupby(key, as_index=False, sort=False)
            .tail(1)
        )
        out = last[last["_op"] != "D"]
        return out[[key, val_col]].reset_index(drop=True)

    return bucketed_group_reduce(tagged, key_cols=[key], reduce_fn=fold)


def events_trend_ols(sf_dir: str) -> "rd.Dataset":
    """Per-type OLS trend of the DENSE zero-filled daily count series —
    the "is this event type growing?" health metric as exact integer
    moments: with x = 0..n−1 (day index over the type's [min, max] day
    span, absent days counting 0, the `holt_smooth` grid) and
    y = count(day), emits (event_type, n_days, num, den) where
    slope = num/den = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²). Both sides of
    the one driver-side division are int64-exact, so the row is
    hash-checkable against a recursive-free SQL grid oracle.

    Scale shape: ONE (type, day) count exchange collapses the corpus
    to a V-bounded table; the zero-fill + moment pass runs per type
    inside one type-bucketed reduce whose state is days-bounded (the
    `events_daily_cusum` layout)."""
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def day_counts(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {"event_type": df["event_type"], "day": df["ts"].dt.floor("D")}
        )
        out = t.groupby(["event_type", "day"], as_index=False, sort=False).size()
        return out.rename(columns={"size": "c"})

    def ols(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["event_type", "day"], as_index=False, sort=False)[
            "c"
        ].sum()
        rows = []
        for et, grp in g.groupby("event_type", sort=False):
            grp = grp.sort_values("day", kind="mergesort")
            days = grp["day"].to_numpy()
            n = int((days[-1] - days[0]) / np.timedelta64(1, "D")) + 1
            y = np.zeros(n, dtype=np.int64)
            idx = (
                (days - days[0]) / np.timedelta64(1, "D")
            ).astype(np.int64)
            y[idx] = grp["c"].to_numpy(dtype=np.int64)
            x = np.arange(n, dtype=np.int64)
            sx, sy = int(x.sum()), int(y.sum())
            sxy, sxx = int((x * y).sum()), int((x * x).sum())
            rows.append(
                (et, n, n * sxy - sx * sy, n * sxx - sx * sx)
            )
        return pd.DataFrame(
            rows, columns=["event_type", "n_days", "num", "den"]
        ).astype(
            {"n_days": "int64", "num": "int64", "den": "int64"}
        )

    return bucketed_group_reduce(
        ev.map_batches(day_counts, batch_format="pandas"),
        key_cols=["event_type"],
        reduce_fn=ols,
    )


def events_heatmap(sf_dir: str) -> "rd.Dataset":
    """Hour-of-day × day-of-week activity heatmap per event type — the
    ops-dashboard staple as ONE count exchange over pre-aggregated
    (type, dow, hour, n) partials. Time arithmetic is engine-neutral
    integer epoch math (no locale-dependent dayofweek: dow 0 = Monday
    via the 1970-01-01-was-Thursday offset, hour = UTC), so the counts
    are hash-exact against any SQL engine doing the same division."""
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # normalize to ns regardless of the parquet unit (us vs ns)
        s = df["ts"].astype("datetime64[ns]").astype("int64")
        day = s // 86_400_000_000_000
        out = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "dow": ((day + 3) % 7).astype(np.int64),
                "hour": ((s // 3_600_000_000_000) % 24).astype(np.int64),
            }
        )
        g = out.groupby(
            ["event_type", "dow", "hour"], as_index=False, sort=False
        ).size()
        return g.rename(columns={"size": "n"})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(
            ["event_type", "dow", "hour"], as_index=False, sort=False
        )["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    return bucketed_group_reduce(
        ev.map_batches(partial, batch_format="pandas"),
        key_cols=["event_type", "dow", "hour"],
        reduce_fn=final,
    )


def lineitem_seq_audit(sf_dir: str) -> "rd.Dataset":
    """Intra-order line-number density audit — the referential-
    integrity check "is l_linenumber a gap-free 1..k sequence with no
    duplicates per order?" as per-order facts:
    (l_orderkey, n_lines, n_distinct, min_ln, max_ln, dense). Density
    requires ALL of n == n_distinct, min == 1, max == n (count == max
    alone is fooled by a duplicate masking a gap).

    Scale shape: per-block partials pre-aggregate to
    (order, line_no, cnt) — lines-per-order-bounded — then ONE
    order-keyed reduce folds duplicates across blocks and derives the
    four aggregates vectorized."""
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    li = read_parquet_clean(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(
            ["l_orderkey", "l_linenumber"], as_index=False, sort=False
        ).size()
        return g.rename(columns={"size": "cnt"})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        pairs = g.groupby(
            ["l_orderkey", "l_linenumber"], as_index=False, sort=False
        )["cnt"].sum()
        out = pairs.groupby("l_orderkey", as_index=False).agg(
            n_lines=("cnt", "sum"),
            n_distinct=("l_linenumber", "size"),
            min_ln=("l_linenumber", "min"),
            max_ln=("l_linenumber", "max"),
        )
        for c in ["n_lines", "n_distinct", "min_ln", "max_ln"]:
            out[c] = out[c].astype("int64")
        out["dense"] = (
            (out["n_lines"] == out["n_distinct"])
            & (out["min_ln"] == 1)
            & (out["max_ln"] == out["n_lines"])
        )
        return out

    return bucketed_group_reduce(
        li.map_batches(partial, batch_format="pandas"),
        key_cols=["l_orderkey"],
        reduce_fn=final,
    )


def customer_kanon(sf_dir: str, k: int = 5) -> "rd.Dataset":
    """k-anonymity / l-diversity audit over the customer table — the
    data-governance gate before sharing: per quasi-identifier group
    (c_mktsegment, c_nationkey) the group size n, the l-diversity of a
    coarse sensitive attribute (account-balance band,
    floor(c_acctbal/1000) — fixed bands, no global quantile pass), and
    k_ok = n ≥ k. Groups with k_ok = false are the suppression
    candidates; low l_div flags homogeneity attacks k alone misses.

    Scale shape: per-block (segment, nation, band, cnt) partials —
    bands-bounded — then ONE group-keyed reduce; never a row-level
    shuffle."""
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    cust = read_parquet_clean(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_mktsegment", "c_nationkey", "c_acctbal"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame(
            {
                "c_mktsegment": df["c_mktsegment"],
                "c_nationkey": df["c_nationkey"].astype("int64"),
                "band": np.floor(
                    df["c_acctbal"].to_numpy(np.float64) / 1000.0
                ).astype(np.int64),
            }
        )
        g = t.groupby(
            ["c_mktsegment", "c_nationkey", "band"],
            as_index=False,
            sort=False,
        ).size()
        return g.rename(columns={"size": "cnt"})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        bands = g.groupby(
            ["c_mktsegment", "c_nationkey", "band"],
            as_index=False,
            sort=False,
        )["cnt"].sum()
        out = bands.groupby(
            ["c_mktsegment", "c_nationkey"], as_index=False
        ).agg(n=("cnt", "sum"), l_div=("band", "size"))
        out["n"] = out["n"].astype("int64")
        out["l_div"] = out["l_div"].astype("int64")
        out["k_ok"] = out["n"] >= k
        return out

    return bucketed_group_reduce(
        cust.map_batches(partial, batch_format="pandas"),
        key_cols=["c_mktsegment", "c_nationkey"],
        reduce_fn=final,
    )


def events_window_topk(sf_dir: str, days: int = 7, k: int = 3) -> "rd.Dataset":
    """Trailing-window top-k: for every (event_type, day) with
    activity, the ``k`` most active users by TRAILING-``days`` event
    count (ties: count desc, then user_id asc) — the leaderboard /
    hot-key-monitor composite (windowed aggregate + per-group top-k).

    Scale shape: the corpus collapses to (type, user, day) counts in
    ONE exchange; the trailing sum is the SHIFT-JOIN identity — each
    count row re-keys to the ``days`` target days it contributes to
    (vectorized replicate, ×days rows of 32-byte partials, never
    event-level), summed in a second keyed reduce; a semi-filter
    keeps only the type's present days and a vectorized in-bucket
    sort+head ranks. Day arithmetic is integer epoch-µs (engine-
    neutral)."""
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id", "ts"],
    )

    def day_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = (
            df["ts"].astype("datetime64[ns]").astype("int64")
            // 86_400_000_000_000
        )
        t = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "user_id": df["user_id"].astype("int64"),
                "day": d.astype("int64"),
            }
        )
        g = t.groupby(
            ["event_type", "user_id", "day"], as_index=False, sort=False
        ).size()
        return g.rename(columns={"size": "c"})

    def fold_counts(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(
            ["event_type", "user_id", "day"], as_index=False, sort=False
        )["c"].sum()
        out["c"] = out["c"].astype("int64")
        return out

    counts = bucketed_group_reduce(
        ev.map_batches(day_counts, batch_format="pandas"),
        key_cols=["event_type", "user_id", "day"],
        reduce_fn=fold_counts,
    ).materialize()  # consumed twice: shift-join source + present-day set

    def shift(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        reps = []
        for off in range(days):
            d = df.copy()
            d["day"] = d["day"] + off
            reps.append(d)
        return pd.concat(reps, ignore_index=True)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        # trailing sums per (type, day, user)
        t = g.groupby(
            ["event_type", "day", "user_id"], as_index=False, sort=False
        )["c"].sum()
        t = t.rename(columns={"c": "n"})
        t["n"] = t["n"].astype("int64")
        t = t.sort_values(
            ["event_type", "day", "n", "user_id"],
            ascending=[True, True, False, True],
            kind="mergesort",
        )
        out = t.groupby(
            ["event_type", "day"], as_index=False, sort=False
        ).head(k)
        return out.reset_index(drop=True)

    trailing = bucketed_group_reduce(
        counts.map_batches(shift, batch_format="pandas"),
        key_cols=["event_type", "day"],
        reduce_fn=rank,
    )

    # keep only days where the type actually had events (the shift
    # fabricates up to days-1 trailing-only days past each active one)
    present = counts.map_batches(
        lambda df: df[["event_type", "day"]].drop_duplicates(),
        batch_format="pandas",
    )
    from kgflow.ops.joins import semi_join

    return semi_join(trailing, present, on=["event_type", "day"])


def events_wau(sf_dir: str, days: int = 7) -> "rd.Dataset":
    """Weekly-active-users: per (event_type, day-with-activity) the
    TRAILING-``days`` distinct user count — the engagement metric every
    dashboard carries, and the windowed-DISTINCT shape (a sum over a
    window double-counts a user active on two days; distinctness must
    survive the window).

    Scale shape: ONE exchange collapses events to distinct
    (type, user, day) presence rows; the shift-join replicates each
    presence to its ``days`` target days; the reduce de-duplicates
    (user, target-day) pairs vectorized and counts — presence rows ×
    days of 24-byte partials, never event rows."""
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id", "ts"],
    )

    def presence(df: pd.DataFrame) -> pd.DataFrame:
        d = (
            df["ts"].astype("datetime64[ns]").astype("int64")
            // 86_400_000_000_000
        )
        t = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "user_id": df["user_id"].astype("int64"),
                "day": d.astype("int64"),
            }
        )
        return t.drop_duplicates()

    def fold_presence(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates().reset_index(drop=True)

    pres = bucketed_group_reduce(
        ev.map_batches(presence, batch_format="pandas"),
        key_cols=["event_type", "user_id", "day"],
        reduce_fn=fold_presence,
    ).materialize()  # shift source + present-day set

    def shift(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        reps = []
        for off in range(days):
            d = df.copy()
            d["day"] = d["day"] + off
            reps.append(d)
        return pd.concat(reps, ignore_index=True)

    def count_distinct(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop_duplicates()
        out = t.groupby(
            ["event_type", "day"], as_index=False, sort=False
        )["user_id"].nunique()
        out = out.rename(columns={"user_id": "wau"})
        out["wau"] = out["wau"].astype("int64")
        return out

    trailing = bucketed_group_reduce(
        pres.map_batches(shift, batch_format="pandas"),
        key_cols=["event_type", "day"],
        reduce_fn=count_distinct,
    )
    present = pres.map_batches(
        lambda df: df[["event_type", "day"]].drop_duplicates(),
        batch_format="pandas",
    )
    from kgflow.ops.joins import semi_join

    return semi_join(trailing, present, on=["event_type", "day"])


def events_churn(sf_dir: str, days: int = 7) -> "rd.Dataset":
    """Churn: per (event_type, active day d) the count of users active
    in the PRIOR window [d−2·days+1, d−days] but absent from the
    current window [d−days+1, d] — the retention complement of
    `events_wau`, and the windowed ANTI-semi shape (membership in one
    window minus membership in another).

    Scale shape: the same presence-row collapse as events_wau, ONE
    shift-join that tags each presence row with which window(s) it
    feeds (current / prior — ≤ 2·days replicas of 32-byte rows), and a
    per-(type, day) reduce that takes the set difference vectorized
    via an indicator pivot (max per user per window, prior & !current)."""
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id", "ts"],
    )

    def presence(df: pd.DataFrame) -> pd.DataFrame:
        d = (
            df["ts"].astype("datetime64[ns]").astype("int64")
            // 86_400_000_000_000
        )
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "user_id": df["user_id"].astype("int64"),
                "day": d.astype("int64"),
            }
        ).drop_duplicates()

    pres = bucketed_group_reduce(
        ev.map_batches(presence, batch_format="pandas"),
        key_cols=["event_type", "user_id", "day"],
        reduce_fn=lambda g: g.drop_duplicates().reset_index(drop=True),
    ).materialize()

    def shift(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(win=pd.Series([], dtype="int64"))
        reps = []
        # current window: offsets 0..days-1 → win 0
        # prior window: offsets days..2*days-1 → win 1
        for off in range(2 * days):
            d = df.copy()
            d["day"] = d["day"] + off
            d["win"] = np.int64(0 if off < days else 1)
            reps.append(d)
        return pd.concat(reps, ignore_index=True)

    def churn(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop_duplicates(
            ["event_type", "day", "user_id", "win"]
        )
        f = t.assign(one=1).pivot_table(
            index=["event_type", "day", "user_id"],
            columns="win",
            values="one",
            aggfunc="max",
            fill_value=0,
        )
        cur = f[0] if 0 in f.columns else 0
        pri = f[1] if 1 in f.columns else 0
        lost = ((pri == 1) & (cur == 0)).groupby(
            level=["event_type", "day"]
        ).sum()
        out = lost.reset_index()
        out.columns = ["event_type", "day", "churned"]
        out["churned"] = out["churned"].astype("int64")
        return out

    trailing = bucketed_group_reduce(
        pres.map_batches(shift, batch_format="pandas"),
        key_cols=["event_type", "day"],
        reduce_fn=churn,
    )
    present = pres.map_batches(
        lambda df: df[["event_type", "day"]].drop_duplicates(),
        batch_format="pandas",
    )
    from kgflow.ops.joins import semi_join

    return semi_join(trailing, present, on=["event_type", "day"])


def orders_benford_gof(sf_dir: str) -> "rd.Dataset":
    """Benford first-significant-digit audit over order totals — the
    fraud / synthetic-data smell test: (digit 1-9, n, n_expected_fp)
    where n_expected_fp = floor(N·log10(1+1/d)·10⁶) is the Benford
    expectation in fixed-point (the single float log10 is over
    CONSTANTS, identical on every engine). First digits come from the
    INTEGER fixed-point value's decimal string (float-to-string
    formatting differs across engines; int-to-string does not). ONE
    9-row count exchange."""
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    orders = read_parquet_clean(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_totalprice"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100
        ).astype(np.int64)
        v = v[v > 0]
        d = pd.Series(v).astype(str).str[0].astype(np.int64)
        g = pd.DataFrame({"digit": d}).groupby(
            "digit", as_index=False, sort=False
        ).size()
        return g.rename(columns={"size": "n"})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("digit", as_index=False, sort=False)["n"].sum()
        total = int(out["n"].sum())
        import math

        out["n"] = out["n"].astype("int64")
        out["n_expected_fp"] = [
            int(math.floor(total * math.log10(1 + 1 / int(d)) * 10**6))
            for d in out["digit"]
        ]
        out["n_expected_fp"] = out["n_expected_fp"].astype("int64")
        return out

    # single tiny key domain (1-9): one bucket is correct and cheapest
    return bucketed_group_reduce(
        orders.map_batches(partial, batch_format="pandas"),
        key_cols=["digit"],
        reduce_fn=final,
        num_buckets=1,
    )


def events_stickiness(sf_dir: str, days: int = 7) -> "rd.Dataset":
    """Stickiness inputs per (event_type, active day): same-day
    distinct users (dau) and trailing-``days`` distinct users (wau) as
    one exact int64 row — DAU/WAU is THE engagement ratio, and
    emitting the exact numerator/denominator pair (not the float
    ratio) keeps the row hash-checkable, the `events_trend_ols`
    num/den convention.

    Scale shape: one presence-row collapse; dau is a direct
    (type, day) count of it; wau rides the shift-join; one broadcast-
    friendly equi-join stitches the pair."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.sources.parquet import read_parquet_clean

    ev = read_parquet_clean(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "user_id", "ts"],
    )

    def presence(df: pd.DataFrame) -> pd.DataFrame:
        d = (
            df["ts"].astype("datetime64[ns]").astype("int64")
            // 86_400_000_000_000
        )
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "user_id": df["user_id"].astype("int64"),
                "day": d.astype("int64"),
            }
        ).drop_duplicates()

    pres = bucketed_group_reduce(
        ev.map_batches(presence, batch_format="pandas"),
        key_cols=["event_type", "user_id", "day"],
        reduce_fn=lambda g: g.drop_duplicates().reset_index(drop=True),
    ).materialize()

    def dau_count(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates().groupby(
            ["event_type", "day"], as_index=False, sort=False
        )["user_id"].nunique()
        out = out.rename(columns={"user_id": "dau"})
        out["dau"] = out["dau"].astype("int64")
        return out

    dau = bucketed_group_reduce(
        pres, key_cols=["event_type", "day"], reduce_fn=dau_count
    )

    def shift(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        reps = []
        for off in range(days):
            d = df.copy()
            d["day"] = d["day"] + off
            reps.append(d)
        return pd.concat(reps, ignore_index=True)

    def wau_count(g: pd.DataFrame) -> pd.DataFrame:
        t = g.drop_duplicates()
        out = t.groupby(
            ["event_type", "day"], as_index=False, sort=False
        )["user_id"].nunique()
        out = out.rename(columns={"user_id": "wau"})
        out["wau"] = out["wau"].astype("int64")
        return out

    wau = bucketed_group_reduce(
        pres.map_batches(shift, batch_format="pandas"),
        key_cols=["event_type", "day"],
        reduce_fn=wau_count,
    )
    # inner join on the dau side keeps exactly the active days
    return hash_join(dau, wau, on=["event_type", "day"], how="inner")
