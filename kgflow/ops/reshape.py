"""Reshape operators: wide conditional aggregation (pivot) and its
inverse (melt/unpivot).

The reference (OpenUE) has no relational reshape; these are
engine-generality operators in the `kgflow.ops.relational` family,
built on the same combiner + bucketed-reduce skeleton
(`kgflow.ops.shuffle.bucketed_group_reduce`).

Scale notes
-----------
- ``pivot_agg`` takes the pivot VALUES explicitly (the scale-correct
  form — Spark's pivot docs recommend the same): discovering column
  names from 10^12 rows costs a full extra distinct pass. When
  ``values=None`` a distributed DISTINCT discovers them (documented
  extra exchange; fails fast above ``max_discovered`` — wide schemas
  with unbounded column counts are a modeling bug, not a pivot).
- The per-batch combiner aggregates to LONG partial rows
  (group, pivot, x) — at most |groups-per-block| × |values| rows leave
  any block — and ONE group-bucketed exchange finishes; widening is a
  vectorized in-bucket ``pivot_table``.
- ``melt`` is stateless per-batch (zero exchanges).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from kgflow.ops.shuffle import bucketed_group_reduce


def pivot_agg(
    ds: "rd.Dataset",
    group_cols: list[str],
    pivot_col: str,
    values: list[str] | None = None,
    value_col: str | None = None,
    agg: str = "count",
    prefix: str = "n_",
    num_buckets: int | None = None,
    max_discovered: int = 10_000,
) -> "rd.Dataset":
    """One output row per ``group_cols`` key with a ``{prefix}{value}``
    column per pivot value (``agg`` of ``value_col``, or row count when
    ``agg="count"``; absent (group, value) combinations are 0).
    Pivot values outside ``values`` are dropped (SQL conditional-
    aggregation semantics)."""
    if agg not in ("count", "sum"):
        raise ValueError(f"agg must be 'count' or 'sum', got {agg!r}")
    if agg == "sum" and value_col is None:
        raise ValueError("agg='sum' requires value_col")
    gcols = list(group_cols)

    if values is None:
        from kgflow.ops.joins import distinct_rows

        # materialize so the guard count is free metadata and the pull
        # reuses blocks — and so an over-wide pivot fails BEFORE any
        # driver materialization of the distinct set
        vals = distinct_rows(ds, [pivot_col], num_buckets=num_buckets).materialize()
        n_vals = vals.count()
        if n_vals > max_discovered:
            raise ValueError(
                f"pivot_col {pivot_col!r} has {n_vals} distinct values"
                f" (> max_discovered={max_discovered}); pass values= explicitly"
            )
        vals_df = vals.to_pandas()
        values = sorted(map(str, vals_df[pivot_col]))
    values = list(values)
    out_cols = [f"{prefix}{v}" for v in values]

    read_cols = gcols + [pivot_col] + ([value_col] if value_col else [])

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[pivot_col].astype(str).isin(values)]
        if agg == "count":
            out = (
                df.groupby(gcols + [pivot_col], as_index=False, sort=False)
                .size()
                .rename(columns={"size": "x"})
            )
        else:
            out = (
                df.groupby(gcols + [pivot_col], as_index=False, sort=False)[value_col]
                .sum()
                .rename(columns={value_col: "x"})
            )
        return out

    partials = ds.select_columns(read_cols).map_batches(
        combiner, batch_format="pandas"
    )

    def widen(g: pd.DataFrame) -> pd.DataFrame:
        wide = pd.pivot_table(
            g,
            index=gcols,
            columns=pivot_col,
            values="x",
            aggfunc="sum",
            fill_value=0,
        )
        wide.columns = [f"{prefix}{c}" for c in wide.columns]
        wide = wide.reindex(columns=out_cols, fill_value=0).reset_index()
        for c in out_cols:
            wide[c] = wide[c].astype(np.int64 if agg == "count" else np.float64)
        return wide

    return bucketed_group_reduce(
        partials, key_cols=gcols, reduce_fn=widen, num_buckets=num_buckets
    )


def rollup_sum(
    ds: "rd.Dataset",
    level_cols: list[str],
    sum_cols: list[str],
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """``GROUP BY ROLLUP(level_cols)`` semantics: integer sums + row
    count at every prefix of ``level_cols`` down to the grand total,
    rolled-up columns emitted as typed NULLs (SQL convention).

    Scale shape: the DATA is touched once — a per-batch combiner plus
    one bucketed exchange produce the finest-level aggregate; every
    coarser level re-aggregates the PREVIOUS level's output (each is
    strictly smaller, the grand total is one row), so subtotals cost
    |finest aggregate| rows of exchange, never a second data pass.
    ``sum_cols`` must be integer-exact (pre-quantize floats to
    fixed-point at the call site) so subtotal sums are
    order-independent."""
    lv = list(level_cols)

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(lv, as_index=False, sort=False)[sum_cols].sum()
        g["n"] = df.groupby(lv, sort=False).size().to_numpy()
        return g

    def re_agg(cols: list[str]):
        def f(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby(cols, as_index=False, sort=False)[
                sum_cols + ["n"]
            ].sum()
            for c in sum_cols + ["n"]:
                out[c] = out[c].astype(np.int64)
            return out

        return f

    # every level is MATERIALIZED (object store; aggregate-sized, bounded
    # by the level's key domain): each level feeds BOTH the union output
    # and the next-coarser re-aggregation, and without pinning the blocks
    # the finest chain re-executes once per consumer (measured 19 s → 4 s
    # at sf0.1 on the supplier rollup).
    levels = []
    cur = bucketed_group_reduce(
        ds.select_columns(lv + sum_cols).map_batches(combiner, batch_format="pandas"),
        key_cols=lv,
        reduce_fn=re_agg(lv),
        num_buckets=num_buckets,
    ).materialize()
    levels.append(cur)
    for k in range(len(lv) - 1, 0, -1):
        # a coarser level has ≤ previous-level-count distinct keys, and
        # the previous count is FREE metadata on a materialized dataset —
        # so cap the reduce parallelism by it (64 sort partitions over a
        # 25-row subtotal level is pure fixed cost)
        nb = min(num_buckets or 2**30, max(int(cur.count()), 1))
        cur = bucketed_group_reduce(
            cur.map_batches(
                lambda df, _c=lv[:k]: df[_c + sum_cols + ["n"]],
                batch_format="pandas",
            ),
            key_cols=lv[:k],
            reduce_fn=re_agg(lv[:k]),
            num_buckets=nb,
        ).materialize()
        levels.append(cur)

    def grand(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame([{c: int(df[c].sum()) for c in sum_cols + ["n"]}])
        return out

    # grand total: a single-group reduce over the coarsest level (tiny)
    coarsest = levels[-1].map_batches(
        lambda df: df[sum_cols + ["n"]].assign(__g=np.int8(0)),
        batch_format="pandas",
    )
    total = bucketed_group_reduce(
        coarsest,
        key_cols=["__g"],
        reduce_fn=lambda g: grand(g),
        num_buckets=1,
    )
    levels.append(total)

    # align every level to the full column set with object-typed NULLs
    # for rolled-up group columns (block-schema uniformity for union)
    all_cols = lv + sum_cols + ["n"]

    def align(df: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for c in all_cols:
            if c in lv:
                # group columns ride as object on EVERY level so all
                # union blocks share one pandas schema (NULL subtotals)
                out[c] = (
                    df[c].astype("object")
                    if c in df.columns
                    else pd.Series([None] * len(df), index=df.index, dtype="object")
                )
            else:
                out[c] = df[c]
        return pd.DataFrame(out)

    aligned = [l.map_batches(align, batch_format="pandas") for l in levels]
    out = aligned[0]
    for a in aligned[1:]:
        out = out.union(a)
    return out


def cube_sum(
    ds: "rd.Dataset",
    level_cols: list[str],
    sum_cols: list[str],
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """``GROUP BY CUBE(level_cols)`` semantics: integer sums + row count
    for EVERY subset of ``level_cols`` (2^k grouping sets), absent group
    columns emitted as typed NULLs.

    Same scale shape as `rollup_sum`: the DATA is touched once (combiner
    + one bucketed exchange build the finest all-columns aggregate,
    materialized); every other grouping set re-aggregates THAT, so the
    2^k − 1 extra sets each cost |finest aggregate| exchange rows —
    bounded by the key domain, never a second corpus pass. Practical for
    the SQL-typical k ≤ 3 (the set count is exponential in k by
    definition). ``sum_cols`` must be integer-exact (pre-quantize floats
    at the call site)."""
    from itertools import combinations

    lv = list(level_cols)

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(lv, as_index=False, sort=False)[sum_cols].sum()
        g["n"] = df.groupby(lv, sort=False).size().to_numpy()
        return g

    def re_agg(cols: list[str]):
        def f(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby(cols, as_index=False, sort=False)[
                sum_cols + ["n"]
            ].sum()
            for c in sum_cols + ["n"]:
                out[c] = out[c].astype(np.int64)
            return out

        return f

    finest = bucketed_group_reduce(
        ds.select_columns(lv + sum_cols).map_batches(combiner, batch_format="pandas"),
        key_cols=lv,
        reduce_fn=re_agg(lv),
        num_buckets=num_buckets,
    ).materialize()
    # unlike rollup's level chain, every coarser set re-aggregates the
    # SAME finest dataset, so only that one needs pinning; its count is
    # free metadata and caps each re-aggregation's reduce parallelism
    n_finest = max(int(finest.count()), 1)

    levels: list["rd.Dataset"] = [finest]
    for k in range(len(lv) - 1, 0, -1):
        for cols_t in combinations(lv, k):
            cols = list(cols_t)
            levels.append(
                bucketed_group_reduce(
                    finest.map_batches(
                        lambda df, _c=cols: df[_c + sum_cols + ["n"]],
                        batch_format="pandas",
                    ),
                    key_cols=cols,
                    reduce_fn=re_agg(cols),
                    num_buckets=min(num_buckets or 2**30, n_finest),
                )
            )

    def grand(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{c: int(df[c].sum()) for c in sum_cols + ["n"]}])

    levels.append(
        bucketed_group_reduce(
            finest.map_batches(
                lambda df: df[sum_cols + ["n"]].assign(__g=np.int8(0)),
                batch_format="pandas",
            ),
            key_cols=["__g"],
            reduce_fn=lambda g: grand(g),
            num_buckets=1,
        )
    )

    all_cols = lv + sum_cols + ["n"]

    def align(df: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for c in all_cols:
            if c in lv:
                out[c] = (
                    df[c].astype("object")
                    if c in df.columns
                    else pd.Series([None] * len(df), index=df.index, dtype="object")
                )
            else:
                out[c] = df[c]
        return pd.DataFrame(out)

    out = levels[0].map_batches(align, batch_format="pandas")
    for lvl in levels[1:]:
        out = out.union(lvl.map_batches(align, batch_format="pandas"))
    return out


def melt(
    ds: "rd.Dataset",
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> "rd.Dataset":
    """Unpivot ``value_cols`` into (``var_name``, ``value_name``) long
    rows — embarrassingly parallel per batch, zero exchanges."""

    def _melt(df: pd.DataFrame) -> pd.DataFrame:
        return pd.melt(
            df,
            id_vars=id_cols,
            value_vars=value_cols,
            var_name=var_name,
            value_name=value_name,
        )

    return ds.map_batches(_melt, batch_format="pandas")


def grouping_sets_sum(
    ds: "rd.Dataset",
    sets: list[list[str]],
    sum_cols: list[str],
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """``GROUP BY GROUPING SETS(sets)`` semantics — the generic form
    of which `rollup_sum` (prefixes) and `cube_sum` (power set) are
    the special cases: integer sums + row count at EXACTLY the listed
    grouping sets (the empty set = grand total), unused group columns
    emitted as typed NULLs.

    Scale shape (the rollup/cube discipline): the DATA is touched
    once — a per-batch combiner + one bucketed exchange produce the
    FINEST grain (the ordered union of all set columns); every listed
    set re-aggregates that aggregate (each strictly smaller than the
    data), so extra sets cost |finest| exchange rows, never another
    data pass. ``sum_cols`` must be integer-exact (pre-quantize floats
    at the call site). Duplicate sets are rejected loudly."""
    all_group: list[str] = []
    for s in sets:
        for c in s:
            if c not in all_group:
                all_group.append(c)
    canon = [tuple(sorted(s)) for s in sets]
    if len(set(canon)) != len(canon):
        raise ValueError("grouping_sets_sum: duplicate grouping sets")
    if not sets:
        raise ValueError("grouping_sets_sum: sets must be non-empty")

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(all_group, as_index=False, sort=False)[sum_cols].sum()
        g["n"] = df.groupby(all_group, sort=False).size().to_numpy()
        return g

    def re_agg(cols: list[str]):
        def f(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby(cols, as_index=False, sort=False)[
                sum_cols + ["n"]
            ].sum()
            for c in sum_cols + ["n"]:
                out[c] = out[c].astype(np.int64)
            return out

        return f

    finest = bucketed_group_reduce(
        ds.select_columns(all_group + sum_cols).map_batches(
            combiner, batch_format="pandas"
        ),
        key_cols=all_group,
        reduce_fn=re_agg(all_group),
        num_buckets=num_buckets,
    ).materialize()  # aggregate-sized; feeds every listed set

    n_finest = max(int(finest.count()), 1)
    outs = []
    for s in sets:
        cols = list(s)
        if tuple(sorted(cols)) == tuple(sorted(all_group)):
            outs.append(finest)
            continue
        if not cols:

            def grand(g: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame(
                    [{c: int(g[c].sum()) for c in sum_cols + ["n"]}]
                )

            outs.append(
                bucketed_group_reduce(
                    finest.map_batches(
                        lambda df: df[sum_cols + ["n"]].assign(
                            __g=np.int8(0)
                        ),
                        batch_format="pandas",
                    ),
                    key_cols=["__g"],
                    reduce_fn=lambda g: grand(g),
                    num_buckets=1,
                )
            )
            continue
        nb = min(num_buckets or 2**30, n_finest)
        outs.append(
            bucketed_group_reduce(
                finest.map_batches(
                    lambda df, _c=cols: df[_c + sum_cols + ["n"]],
                    batch_format="pandas",
                ),
                key_cols=cols,
                reduce_fn=re_agg(cols),
                num_buckets=nb,
            )
        )

    all_cols = all_group + sum_cols + ["n"]

    def align(df: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for c in all_cols:
            if c in all_group:
                out[c] = (
                    df[c].astype("object")
                    if c in df.columns
                    else pd.Series(
                        [None] * len(df), index=df.index, dtype="object"
                    )
                )
            else:
                out[c] = df[c]
        return pd.DataFrame(out)

    aligned = [o.map_batches(align, batch_format="pandas") for o in outs]
    out = aligned[0]
    for a in aligned[1:]:
        out = out.union(a)
    return out
