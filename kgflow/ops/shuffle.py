"""Bucketed group-reduce: the engine's core wide-operation pattern.

Ray Data's ``groupby(keys).aggregate/map_groups`` is sort-based and pays
a large per-group cost — measured on this container: 300k rows with
~300k distinct string-keyed groups took ~60 s on 32 CPUs with the native
aggregate and ~52 s with map_groups, while the SAME reduction as
"hash-bucket → groupby(bucket) [64 groups] → vectorized pandas groupby
inside the bucket" took **1.5 s**. High-cardinality groupbys therefore
go through this helper:

1. (optional, done by callers) per-batch combiner shrinks shuffle input;
2. every row gets ``bucket = hash(key columns) % num_buckets`` —
   deterministic (``pd.util.hash_pandas_object``, fixed key), uniform
   (splitmix-style avalanche already inside), co-locating all rows of a
   key in one bucket;
3. ONE shuffle with ``num_buckets`` groups;
4. the real per-key reduction runs VECTORIZED inside each bucket
   (pandas groupby — C hash aggregation), not per group in Python.

Skew: a hot KEY still lands in one bucket, but the in-bucket cost is a
vectorized aggregation over its rows, not a Python call per key; for hot
keys with huge row counts, callers pre-reduce with a combiner and/or a
rotating salt (see ``kgflow.linking.link.mention_counts``).

``num_buckets`` should be ≥ cluster parallelism; buckets are the unit of
reduce-side parallelism.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import ray.data as rd


def add_hash_bucket(
    df: pd.DataFrame, key_cols: list[str], num_buckets: int, col: str = "bucket"
) -> pd.DataFrame:
    h = np.zeros(len(df), dtype=np.uint64)
    for c in key_cols:
        h = h * np.uint64(1099511628211) + pd.util.hash_pandas_object(
            df[c], index=False
        ).to_numpy(dtype=np.uint64)
    # finalize: raw low bits of a multiply-accumulate are not uniform
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return df.assign(**{col: (h % np.uint64(num_buckets)).astype(np.int32)})


def default_num_buckets() -> int:
    """Reduce-side parallelism default: 2× the cluster CPU count,
    floored at 16. Buckets are the unit of reduce parallelism, so they
    must scale with the cluster; but each extra bucket is an extra sort
    partition + reduce task, and on small sessions that orchestration
    is pure fixed cost (measured: a vocabulary-sized reduce takes 0.5 s
    at 8 buckets vs 0.84 s at 64 on an 8-CPU session — the data is
    trivial either way, the delta is task/partition overhead)."""
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n = 8
    return max(16, 2 * n)


def bucketed_group_reduce(
    ds: "rd.Dataset",
    key_cols: list[str],
    reduce_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int | None = None,
    keep_bucket: bool = False,
    bucket_col: str = "bucket",
    max_bucket_rows: int | None = None,
) -> "rd.Dataset":
    """Hash-partition ``ds`` on ``key_cols`` into ``num_buckets`` buckets
    and apply ``reduce_fn`` (a vectorized whole-bucket pandas reduction;
    it must itself group by ``key_cols``) inside each bucket.

    Implementation note: this is a range shuffle with EXPLICIT integer
    boundaries (one sort partition per bucket value) rather than
    ``groupby(bucket).map_groups``.  map_groups sorts with SAMPLED
    boundaries and one partition per input block, so any run with more
    blocks than occupied buckets is guaranteed empty partitions — and
    Ray's sort-merge emits those as schema-less empty pandas blocks
    (``merge_sorted_blocks`` → ``PandasBlockBuilder._empty_table()``),
    which caused the round-1 "RefBundle with a different schema"
    warnings and an order-dependent schema-test flake.  With explicit
    boundaries every partition maps to exactly one bucket value, so a
    partition is empty only if its bucket is genuinely unoccupied
    (possible only when distinct keys < num_buckets — tiny inputs).
    Reduce-side parallelism is therefore exactly ``num_buckets``,
    independent of input block count, which is also the right unit at
    cluster scale.

    Correctness of the whole-block reduce: each sort range covers one
    bucket value and Ray's sort-reduce merges each range into a single
    block, so a bucket never spans batches; the in-batch loop below
    still groups by ``bucket_col`` defensively in case the executor
    bundles several ranges into one task.

    ``max_bucket_rows`` (skew guard): when set, a bucket whose row count
    exceeds the cap fails LOUDLY, naming the hottest keys it contains.
    The check runs AFTER the exchange assembles the bucket (bucket sizes
    aren't knowable pre-shuffle), so it guards the reduce's working set
    and output amplification — if the raw bucket rows alone exceed
    worker memory, the exchange itself is the failure point. For
    partial-aggregatable reductions, use :func:`salted_group_reduce` to
    spread a hot key instead of capping it.
    """

    if num_buckets is None:
        num_buckets = default_num_buckets()

    def _bucket(df: pd.DataFrame) -> pd.DataFrame:
        return add_hash_bucket(df, key_cols, num_buckets, bucket_col)

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for b, g in df.groupby(bucket_col, sort=False):
            if max_bucket_rows is not None and len(g) > max_bucket_rows:
                hot = (
                    g.groupby(key_cols, sort=False)
                    .size()
                    .nlargest(3)
                    .to_dict()
                )
                raise ValueError(
                    f"bucketed_group_reduce: bucket {b} has {len(g)} rows "
                    f"(> max_bucket_rows={max_bucket_rows}); hottest keys: "
                    f"{hot}. Pre-aggregate with a combiner, salt the key "
                    f"(salted_group_reduce), or raise the cap."
                )
            out = reduce_fn(g.drop(columns=[bucket_col]))
            if keep_bucket:
                out[bucket_col] = b
            outs.append(out)
        if not outs:
            # typed-empty input (zero-row slice): produce the reduce
            # output schema by running reduce_fn on the empty frame.
            out = reduce_fn(df.drop(columns=[bucket_col]))
            if keep_bucket:
                out[bucket_col] = pd.Series([], dtype=df[bucket_col].dtype)
            return out
        return outs[0] if len(outs) == 1 else pd.concat(outs, ignore_index=True)

    return (
        ds.map_batches(_bucket, batch_format="pandas")
        .sort(bucket_col, boundaries=list(range(1, num_buckets)))
        .map_batches(_reduce, batch_format="pandas", batch_size=None)
    )


def salted_group_reduce(
    ds: "rd.Dataset",
    key_cols: list[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    final_fn: Callable[[pd.DataFrame], pd.DataFrame],
    salt: int = 16,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Two-round reduce for PARTIAL-AGGREGATABLE reductions under key
    skew: a Zipf-head key's rows spread across ``salt`` sub-buckets in
    round 1 (keyed on key_cols + a deterministic row-hash salt), where
    ``partial_fn`` shrinks them to one partial row per (key, salt);
    round 2 merges the ≤ ``salt`` partials per key with ``final_fn``.

    Requires the reduction to decompose as final(∪ partial(Sᵢ)) =
    reduce(∪ Sᵢ) — true for sums/counts/min/max/top-k/distinct-style
    aggregates. The salt is row-hash PLUS within-batch position: a hot
    key of EXACT-duplicate rows (the canonical count-aggregation skew)
    would all hash to one salt, so the positional rotation spreads it;
    no RNG state, and the salt never affects output values (the final
    merge is salt-independent), only placement.

    Round-1 exchange carries the full input (same as the unsalted
    reduce); what changes is that no single reduce task ever holds more
    than ~1/salt of a hot key's rows. Round-2 exchange carries
    ≤ salt × |keys| partial rows.
    """
    if salt < 2:
        raise ValueError("salt must be >= 2 (use bucketed_group_reduce for 1)")
    SALT_COL = "__salt"

    def _add_salt(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(df, index=False).to_numpy(dtype=np.uint64)
        h = h + np.arange(len(df), dtype=np.uint64)  # spread exact-dup rows
        return df.assign(**{SALT_COL: (h % np.uint64(salt)).astype(np.int32)})

    def _partial(g: pd.DataFrame) -> pd.DataFrame:
        return partial_fn(g.drop(columns=[SALT_COL]))

    partials = bucketed_group_reduce(
        ds.map_batches(_add_salt, batch_format="pandas"),
        key_cols=key_cols + [SALT_COL],
        reduce_fn=_partial,
        num_buckets=num_buckets,
    )
    return bucketed_group_reduce(
        partials, key_cols=key_cols, reduce_fn=final_fn, num_buckets=num_buckets
    )


def grouped_topk(
    ds: "rd.Dataset",
    group_cols: list[str],
    sort_cols: list[str],
    ascending: list[bool],
    k: int,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group top-k ROWS by ``sort_cols`` order (row_number() OVER
    (PARTITION BY group ORDER BY ...) <= k semantics; make the order
    total — include a unique tiebreak column — for deterministic
    output).

    Top-k is a semigroup: topk(A ∪ B) = topk(topk(A) ∪ topk(B)), so a
    per-batch combiner first shrinks every block to its local per-group
    top-k (one vectorized whole-block sort + groupby().head — no
    per-group Python), and the single group-bucketed shuffle then
    carries at most |blocks| × |groups-per-block| × k rows instead of
    the full table; the per-bucket reduce applies the same kernel."""

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(sort_cols, ascending=ascending, kind="mergesort")
            .groupby(group_cols, sort=False)
            .head(k)
        )

    combined = ds.map_batches(local_topk, batch_format="pandas")
    return bucketed_group_reduce(
        combined, key_cols=group_cols, reduce_fn=local_topk, num_buckets=num_buckets
    )


def global_topk(
    ds: "rd.Dataset",
    sort_cols: list[str],
    ascending: list[bool],
    k: int,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """GLOBAL top-k rows by ``sort_cols`` (ORDER BY … LIMIT k). Same
    semigroup combiner as `grouped_topk` with a constant key: every
    block shrinks to its local top-k BEFORE the exchange, so the single
    reduce bucket sees ≤ blocks×k rows — never a full-table sort."""

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(sort_cols, ascending=ascending, kind="mergesort").head(k)
        return out.assign(_g=np.int64(0))

    combined = ds.map_batches(local_topk, batch_format="pandas")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(sort_cols, ascending=ascending, kind="mergesort")
            .head(k)
            .drop(columns=["_g"])
        )

    return bucketed_group_reduce(
        combined, key_cols=["_g"], reduce_fn=reduce_fn, num_buckets=num_buckets
    )


def grouped_distinct_count(
    ds: "rd.Dataset",
    group_cols: list[str],
    value_col: str,
    out_col: str = "n_distinct",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Exact ``COUNT(DISTINCT value_col) GROUP BY group_cols``, never
    materializing a group's value set on one worker:

    1. per-batch combiner drops duplicate (group, value) pairs locally;
    2. ONE shuffle bucketed on (group, value) — a hot group's distinct
       values SPREAD across buckets, so the dedup+count of a skewed
       group parallelizes instead of landing on one reducer;
    3. each bucket emits per-group PARTIAL distinct counts (disjoint by
       construction: a (group, value) pair lives in exactly one bucket);
    4. a second, tiny shuffle (≤ num_buckets × |groups| rows) sums the
       partials per group.
    """
    pair_cols = group_cols + [value_col]
    pairs = ds.map_batches(
        lambda df: df[pair_cols].drop_duplicates(), batch_format="pandas"
    )

    def partial_counts(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates()
        out = d.groupby(group_cols, as_index=False, sort=False).size()
        return out.rename(columns={"size": out_col})

    partials = bucketed_group_reduce(
        pairs, key_cols=pair_cols, reduce_fn=partial_counts, num_buckets=num_buckets
    )

    def sum_partials(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(group_cols, as_index=False, sort=False)[out_col].sum()
        out[out_col] = out[out_col].astype(np.int64)
        return out

    return bucketed_group_reduce(
        partials, key_cols=group_cols, reduce_fn=sum_partials, num_buckets=num_buckets
    )


def pareto_front(
    ds: "rd.Dataset",
    x_col: str,
    y_col: str,
    maximize_x: bool = True,
    minimize_y: bool = True,
    max_front: int = 1_000_000,
) -> "rd.Dataset":
    """2-D Pareto frontier (skyline): rows not dominated by any other
    row — A dominates B when A is ≥ as good on both axes and strictly
    better on at least one. The multi-objective cousin of
    `global_topk`: "best tradeoffs", not "best k".

    Scale shape: skyline(∪ skylines) = global skyline, so each block
    shrinks to its LOCAL frontier (vectorized sort + running-extreme
    scan, then an exact candidate² refine over the already-tiny
    candidate set) before ONE single-bucket reduce runs the same exact
    refine over ≤ blocks×front candidates. A frontier bigger than
    ``max_front`` per block fails loudly (anti-correlated axes can
    degenerate to O(n) fronts — that output is a transform, not a
    selection, and needs a different plan)."""

    sx = -1.0 if maximize_x else 1.0
    sy = 1.0 if minimize_y else -1.0

    def _front(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        def axis(col: str, sign: float) -> np.ndarray:
            a = df[col].to_numpy()
            if np.issubdtype(a.dtype, np.datetime64):
                a = a.astype("datetime64[us]").astype(np.int64)
            # ints/datetimes stay int64 (exact); floats stay float64
            return (np.int64(int(sign)) * a) if np.issubdtype(
                a.dtype, np.integer
            ) else sign * a

        # normalized axes: minimize both u and v
        u = axis(x_col, sx)
        v = axis(y_col, sy)
        order = np.lexsort((v, u))  # u asc, ties v asc
        vv = v[order]
        run_min = np.minimum.accumulate(vv)
        # candidates: weakly undominated in the scan (ties kept)
        cand = vv <= run_min
        idx = order[cand]
        if len(idx) > max_front:
            raise ValueError(
                f"pareto_front: {len(idx)} frontier candidates in one "
                f"block (> max_front={max_front}); the axes are too "
                "anti-correlated for a selection-style skyline"
            )
        # exact O(k²) refine on the candidate set (vectorized)
        cu, cv = u[idx], v[idx]
        dom = (
            (cu[:, None] <= cu[None, :])
            & (cv[:, None] <= cv[None, :])
            & ((cu[:, None] < cu[None, :]) | (cv[:, None] < cv[None, :]))
        ).any(axis=0)
        return df.iloc[idx[~dom]]

    local = ds.map_batches(
        lambda d: _front(d).assign(_g=np.int64(0)), batch_format="pandas"
    )
    return bucketed_group_reduce(
        local,
        key_cols=["_g"],
        reduce_fn=lambda g: _front(g).drop(columns=["_g"]),
        num_buckets=1,
    )


def global_row_number(
    ds: "rd.Dataset",
    sort_cols: list[str],
    out_col: str = "row_num",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Distributed ROW_NUMBER() OVER (ORDER BY ``sort_cols``): every
    row gets its exact 1-based global rank — the primitive behind
    exact Gini/Lorenz curves, percentile joins and stable pagination.
    ``sort_cols`` must form a TOTAL order (include a unique tiebreak)
    and the first column must be numeric/datetime.

    Scale shape — same two-pass range decomposition as
    `kgflow.ops.window.interval_concurrency_daily`: equal-width value
    buckets on the first sort column (one 2-scalar min/max pre-pass;
    equal values always co-bucket, so cross-bucket order is exact
    regardless of tiebreak columns); pass A pulls per-bucket COUNTS
    (bucket-bounded) whose exclusive prefix is each bucket's rank
    offset; pass B lexsorts within the bucket and adds the offset.
    A heavily skewed first column concentrates rows in one value
    bucket (documented; pre-scale or pick a spreading column).

    The tagged input materializes once (consumed by the count pass AND
    the rank pass) — rank inputs should be pre-aggregated tables
    (per-key totals), not raw facts."""
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def _first_as_int_or_float(df: pd.DataFrame) -> np.ndarray:
        a = df[sort_cols[0]].to_numpy()
        if np.issubdtype(a.dtype, np.datetime64):
            a = a.astype("datetime64[us]").astype(np.int64)
        return a

    def minmax_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "_g": pd.Series([], dtype="int64"),
                    "lo": pd.Series([], dtype="float64"),
                    "hi": pd.Series([], dtype="float64"),
                }
            )
        a = _first_as_int_or_float(df).astype(np.float64)
        return pd.DataFrame(
            {"_g": [np.int64(0)], "lo": [a.min()], "hi": [a.max()]}
        )

    mm = bucketed_group_reduce(
        ds.map_batches(minmax_partial, batch_format="pandas"),
        key_cols=["_g"],
        reduce_fn=lambda g: pd.DataFrame(
            {"lo": [float(g["lo"].min())], "hi": [float(g["hi"].max())]}
        ),
        num_buckets=1,
    ).to_pandas()
    lo, hi = float(mm["lo"].iloc[0]), float(mm["hi"].iloc[0])
    span = max(hi - lo, 1e-300)

    def add_vb(df: pd.DataFrame) -> pd.DataFrame:
        a = _first_as_int_or_float(df).astype(np.float64)
        vb = np.clip(
            ((a - lo) / span * num_buckets).astype(np.int64),
            0,
            num_buckets - 1,
        )
        return df.assign(_vb=vb)

    tagged = ds.map_batches(add_vb, batch_format="pandas").materialize()
    # consumed twice: count pass + rank pass

    counts = bucketed_group_reduce(
        tagged.map_batches(
            lambda d: d.groupby("_vb", as_index=False).size().rename(
                columns={"size": "n"}
            ),
            batch_format="pandas",
        ),
        key_cols=["_vb"],
        reduce_fn=lambda g: g.groupby("_vb", as_index=False)["n"].sum(),
    ).to_pandas()  # ≤ num_buckets rows
    counts = counts.sort_values("_vb")
    offs = dict(
        zip(
            counts["_vb"].to_numpy(dtype=np.int64),
            np.concatenate(
                [[0], np.cumsum(counts["n"].to_numpy(dtype=np.int64))[:-1]]
            ),
        )
    )
    import ray

    offs_ref = ray.put(offs)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        offsets = ray.get(offs_ref)
        outs = []
        for vb, gg in g.groupby("_vb", sort=False):
            gg = gg.sort_values(sort_cols, kind="mergesort")
            gg = gg.assign(
                **{
                    out_col: np.arange(1, len(gg) + 1, dtype=np.int64)
                    + offsets[int(vb)]
                }
            )
            outs.append(gg.drop(columns=["_vb"]))
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_reduce(
        tagged, key_cols=["_vb"], reduce_fn=rank, num_buckets=num_buckets
    )


def grouped_topk_ties(
    ds: "rd.Dataset",
    group_cols: list[str],
    sort_col: str,
    k: int,
    ascending: bool = False,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group top-k WITH ties — SQL ``RANK() OVER (PARTITION BY g
    ORDER BY v) <= k`` semantics: every row whose rank ≤ k survives,
    so boundary ties are kept in full (row multiplicity preserved),
    unlike `grouped_topk`'s exact-k ROW_NUMBER cut. Output = input
    rows + a ``rank`` column.

    Semigroup combiner soundness: a row with GLOBAL rank ≤ k has
    local rank ≤ k in its block (dropping rows only lowers ranks), so
    the per-block rank-≤-k filter is a superset of the answer; and
    every strictly-greater row of a surviving rank-≤-k row itself has
    smaller global rank, hence also survives — so the in-bucket rank
    recomputation is exact, and rows with true rank > k can never
    sneak under k (≥ k strictly-greater survivors outrank them)."""

    def local_rank(df: pd.DataFrame) -> pd.DataFrame:
        return _rank_filter(df, group_cols, sort_col, k, ascending)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out = _rank_filter(g, group_cols, sort_col, k, ascending)
        return out

    filtered = ds.map_batches(
        lambda d: local_rank(d).drop(columns=["rank"]),
        batch_format="pandas",
    )
    return bucketed_group_reduce(
        filtered,
        key_cols=group_cols,
        reduce_fn=reduce_fn,
        num_buckets=num_buckets,
    )


def _rank_filter(
    df: pd.DataFrame,
    group_cols: list[str],
    sort_col: str,
    k: int,
    ascending: bool,
) -> pd.DataFrame:
    if not len(df):
        return df.assign(rank=pd.Series([], dtype="int64"))
    d = df.sort_values(
        group_cols + [sort_col],
        ascending=[True] * len(group_cols) + [ascending],
        kind="mergesort",
    )
    grp = d.groupby(group_cols, sort=False)
    rn = grp.cumcount().to_numpy(np.int64) + 1
    # RANK = row_number of the FIRST peer: propagate rn at value-change
    v = d[sort_col].to_numpy()
    gkey = grp.ngroup().to_numpy(np.int64)
    new = np.ones(len(d), dtype=bool)
    new[1:] = (v[1:] != v[:-1]) | (gkey[1:] != gkey[:-1])
    rank = rn[np.maximum.accumulate(np.where(new, np.arange(len(d)), 0))]
    d = d.assign(rank=rank.astype(np.int64))
    return d.loc[d["rank"] <= k]


def global_running_sum(
    ds: "rd.Dataset",
    sort_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Distributed RUNNING SUM over a TOTAL order —
    SUM(value) OVER (ORDER BY sort_cols ROWS UNBOUNDED PRECEDING),
    the primitive behind Pareto/ABC classification, Lorenz curves and
    cumulative-share cutoffs. Same two-pass range decomposition as
    `global_row_number`: pass A pulls per-value-bucket SUMS (bucket-
    bounded) whose exclusive prefix is each bucket's offset; pass B
    sorts within the bucket and adds offset + in-bucket cumsum.
    ``sort_cols`` must form a total order with a numeric/datetime
    first column; ``value_col`` must be int64 (the running sum is
    exact; a cumulative total beyond int64 needs upstream rescaling —
    fail-fast overflow is numpy's, not silent float drift)."""
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def _first(df: pd.DataFrame) -> np.ndarray:
        a = df[sort_cols[0]].to_numpy()
        if np.issubdtype(a.dtype, np.datetime64):
            a = a.astype("datetime64[us]").astype(np.int64)
        return a

    mm = bucketed_group_reduce(
        ds.map_batches(
            lambda d: pd.DataFrame(
                {"_g": [np.int64(0)], "lo": [float(_first(d).min())],
                 "hi": [float(_first(d).max())]}
            )
            if len(d)
            else pd.DataFrame(
                {"_g": pd.Series([], dtype="int64"),
                 "lo": pd.Series([], dtype="float64"),
                 "hi": pd.Series([], dtype="float64")}
            ),
            batch_format="pandas",
        ),
        key_cols=["_g"],
        reduce_fn=lambda g: pd.DataFrame(
            {"lo": [float(g["lo"].min())], "hi": [float(g["hi"].max())]}
        ),
        num_buckets=1,
    ).to_pandas()
    lo, hi = float(mm["lo"].iloc[0]), float(mm["hi"].iloc[0])
    span = max(hi - lo, 1e-300)

    def add_vb(df: pd.DataFrame) -> pd.DataFrame:
        a = _first(df).astype(np.float64)
        vb = np.clip(
            ((a - lo) / span * num_buckets).astype(np.int64),
            0,
            num_buckets - 1,
        )
        return df.assign(_vb=vb)

    tagged = ds.map_batches(add_vb, batch_format="pandas").materialize()

    sums = bucketed_group_reduce(
        tagged.map_batches(
            lambda d: d.groupby("_vb", as_index=False)[value_col]
            .sum()
            .rename(columns={value_col: "s"}),
            batch_format="pandas",
        ),
        key_cols=["_vb"],
        reduce_fn=lambda g: g.groupby("_vb", as_index=False)["s"].sum(),
    ).to_pandas()  # ≤ num_buckets rows
    sums = sums.sort_values("_vb")
    offs = dict(
        zip(
            sums["_vb"].to_numpy(dtype=np.int64),
            np.concatenate(
                [[0], np.cumsum(sums["s"].to_numpy(dtype=np.int64))[:-1]]
            ),
        )
    )
    import ray

    offs_ref = ray.put(offs)

    def run(g: pd.DataFrame) -> pd.DataFrame:
        offsets = ray.get(offs_ref)
        outs = []
        for vb, gg in g.groupby("_vb", sort=False):
            gg = gg.sort_values(sort_cols, kind="mergesort")
            cs = np.cumsum(gg[value_col].to_numpy(dtype=np.int64))
            gg = gg.assign(**{out_col: cs + offsets[int(vb)]})
            outs.append(gg.drop(columns=["_vb"]))
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_reduce(
        tagged, key_cols=["_vb"], reduce_fn=run, num_buckets=num_buckets
    )


def zorder_keys(
    ds: "rd.Dataset",
    cols: list[str],
    bits: int = 16,
    out_col: str = "zval",
) -> "rd.Dataset":
    """Append a Z-order (Morton) clustering key interleaving the low
    ``bits`` bits of each int column in ``cols`` — the multi-column
    data-layout primitive: sorting / range-partitioning a table by
    zval before a partitioned write gives every listed column
    locality, so min/max row-group stats prune reads on ANY of them
    (the Delta/Iceberg OPTIMIZE ZORDER technique).

    Exchange-FREE and fully vectorized (one shift/or pass per bit per
    column); inputs must be non-negative and < 2^bits — out-of-range
    values fail LOUDLY (silent truncation would break the locality
    guarantee, and callers should quantize/clamp explicitly).
    len(cols) * bits must fit an int64 (≤ 63)."""
    if not cols:
        raise ValueError("zorder_keys: cols must be non-empty")
    if len(cols) * bits > 63:
        raise ValueError(
            f"zorder_keys: {len(cols)} cols x {bits} bits > 63 — "
            "reduce bits"
        )

    k = len(cols)

    def add_z(df: pd.DataFrame) -> pd.DataFrame:
        z = np.zeros(len(df), dtype=np.int64)
        for ci, c in enumerate(cols):
            v = df[c].to_numpy(dtype=np.int64)
            if len(v) and (v.min() < 0 or v.max() >= (1 << bits)):
                bad = v[(v < 0) | (v >= (1 << bits))][0]
                raise ValueError(
                    f"zorder_keys: column {c!r} value {int(bad)} outside "
                    f"[0, 2^{bits}) — quantize or clamp first"
                )
            for b in range(bits):
                z |= ((v >> b) & 1) << (b * k + ci)
        out = df.copy()
        out[out_col] = z
        return out

    return ds.map_batches(add_z, batch_format="pandas")
