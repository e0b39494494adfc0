"""Data-profiling operators: exact quantized quantiles and per-column
statistics — the corpus-QA pass a training-data pipeline runs before
(and after) every transform.

Both reduce to the engine's combiner + bucketed-reduce skeleton: every
block shrinks to its distinct values / running extrema BEFORE the
exchange, so the shuffle carries value-domain-bounded rows, never data
rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def column_quantiles(
    ds: "rd.Dataset",
    col: str = "value",
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.875),
    scale: int = 100,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """EXACT discrete quantiles of ``round(col * scale) / scale`` —
    matches SQL ``quantile_disc`` (nearest-rank: the value at index
    ceil(q·N) − 1 of the sorted multiset; verified empirically against
    DuckDB). Returns a small DataFrame (q, v).

    Scale shape: per-block combiner (np.unique + counts on the
    quantized int64) → ONE value-keyed bucketed sum — the exchange
    carries (v_fp, n) pairs bounded by the value DOMAIN × scale, not by
    row count. The final histogram pull is driver-side but
    domain-bounded (e.g. prices quantized to cents: ≤ a few hundred
    thousand rows at any corpus size); quantile extraction is a cumsum
    + searchsorted over that histogram.

    ``qs`` should be binary-exact fractions (0.25, 0.5, 0.875, …) so
    ceil(q·N) cannot straddle a float rounding difference between
    engines."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        v = np.round(df[col].to_numpy(dtype=np.float64) * scale).astype(np.int64)
        uv, cnt = np.unique(v, return_counts=True)
        return pd.DataFrame({"v_fp": uv, "n": cnt.astype(np.int64)})

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("v_fp", as_index=False)["n"].sum()
        return agg

    hist = (
        bucketed_group_reduce(
            ds.select_columns([col]).map_batches(combiner, batch_format="pandas"),
            key_cols=["v_fp"],
            reduce_fn=reduce_fn,
            num_buckets=num_buckets,
        )
        .to_pandas()  # domain-bounded histogram, see docstring
        .sort_values("v_fp")
    )
    counts = hist["n"].to_numpy(dtype=np.int64)
    values = hist["v_fp"].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    N = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        rank = max(int(np.ceil(q * N)), 1) if N else 0
        idx = int(np.searchsorted(cum, rank, "left")) if N else 0
        out_q.append(q)
        out_v.append(values[idx] / scale if N else float("nan"))
    return pd.DataFrame({"q": pd.Series(out_q, dtype="float64"), "v": out_v})


def column_histogram(
    ds: "rd.Dataset",
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Fixed-width histogram of ``col`` over [lo, hi): (bin, n) with
    bin = floor((v − lo) / width), values clamped into the edge bins
    (SQL width_bucket-1 with explicit clamping so both engines bin
    identically at the boundaries). Per-block combiner = one bincount;
    the exchange carries ≤ blocks × n_bins rows."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    width = (hi - lo) / n_bins

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        b = np.clip(np.floor((v - lo) / width).astype(np.int64), 0, n_bins - 1)
        cnt = np.bincount(b, minlength=n_bins)
        nz = np.nonzero(cnt)[0]
        return pd.DataFrame({"bin": nz.astype(np.int64), "n": cnt[nz].astype(np.int64)})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("bin", as_index=False)["n"].sum()
        out["n"] = out["n"].astype(np.int64)
        return out

    return bucketed_group_reduce(
        ds.select_columns([col]).map_batches(combiner, batch_format="pandas"),
        key_cols=["bin"],
        reduce_fn=merge,
        num_buckets=min(num_buckets or n_bins, n_bins),
    )


def grouped_quantiles(
    ds: "rd.Dataset",
    group_cols: list[str],
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.875),
    scale: int = 100,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """EXACT per-group discrete quantiles of ``round(col*scale)/scale``
    (``quantile_disc ... GROUP BY`` semantics, same nearest-rank rule as
    `column_quantiles`). Fully distributed — no driver pull:

    1. per-block combiner collapses rows to (group, v_fp, n) counts;
    2. exchange A bucketed on (group, v_fp) merges partial counts — a
       hot group's histogram build SPREADS across buckets;
    3. exchange B bucketed on group assembles each group's (tiny,
       domain-bounded) histogram in one bucket, where extraction runs
       vectorized across all groups (cumsum + first-hit per group, one
       pass per quantile — no per-group Python).

    ``qs`` must be binary-exact fractions (see `column_quantiles`)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    gcols = list(group_cols)

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        v = np.round(df[col].to_numpy(dtype=np.float64) * scale).astype(np.int64)
        out = (
            df[gcols]
            .assign(v_fp=v)
            .groupby(gcols + ["v_fp"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return out

    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(gcols + ["v_fp"], as_index=False, sort=False)["n"].sum()

    hist = bucketed_group_reduce(
        ds.select_columns(gcols + [col]).map_batches(combiner, batch_format="pandas"),
        key_cols=gcols + ["v_fp"],
        reduce_fn=merge_counts,
        num_buckets=num_buckets,
    )

    def extract(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {c: pd.Series([], dtype=g[c].dtype) for c in gcols}
                | {"q": pd.Series([], dtype="float64"), "v": pd.Series([], dtype="float64")}
            )
        g = g.sort_values(gcols + ["v_fp"], kind="mergesort")
        grp = g.groupby(gcols, sort=False)
        cum = grp["n"].cumsum().to_numpy(dtype=np.int64)
        N = grp["n"].transform("sum").to_numpy(dtype=np.int64)
        outs = []
        for q in qs:
            rank = np.maximum(np.ceil(q * N).astype(np.int64), 1)
            hit = g.loc[cum >= rank, gcols + ["v_fp"]]
            first = hit.groupby(gcols, as_index=False, sort=False).first()
            first["q"] = float(q)
            first["v"] = first.pop("v_fp").to_numpy(dtype=np.float64) / scale
            outs.append(first)
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_reduce(
        hist, key_cols=gcols, reduce_fn=extract, num_buckets=num_buckets
    )


def profile_columns(
    ds: "rd.Dataset",
    cols: list[str],
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-column profile over NUMERIC columns: (column, n_rows,
    n_null, n_distinct, vmin, vmax). Extrema/counts combine per block
    into one row per column (a |cols|-row shuffle); exact distinct
    counts dedup per block first, then count distinct survivors behind
    one (column, value)-keyed exchange."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def stat_partials(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            v = df[c].to_numpy(dtype=np.float64)
            null = np.isnan(v)
            nv = v[~null]
            rows.append(
                {
                    "column": c,
                    "n_rows": len(v),
                    "n_null": int(null.sum()),
                    "vmin": float(nv.min()) if len(nv) else np.inf,
                    "vmax": float(nv.max()) if len(nv) else -np.inf,
                }
            )
        return pd.DataFrame(rows)

    def stat_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("column", as_index=False).agg(
            n_rows=("n_rows", "sum"),
            n_null=("n_null", "sum"),
            vmin=("vmin", "min"),
            vmax=("vmax", "max"),
        )

    stats = bucketed_group_reduce(
        ds.select_columns(cols).map_batches(stat_partials, batch_format="pandas"),
        key_cols=["column"],
        reduce_fn=stat_reduce,
        num_buckets=min(num_buckets or len(cols), len(cols)),
    )

    def distinct_partials(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in cols:
            v = df[c].to_numpy(dtype=np.float64)
            uv = np.unique(v[~np.isnan(v)])
            frames.append(pd.DataFrame({"column": c, "v": uv}))
        return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {"column": pd.Series([], dtype="object"), "v": pd.Series([], dtype="float64")}
        )

    def distinct_reduce(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["column", "v"])
        return (
            d.groupby("column", as_index=False)
            .size()
            .rename(columns={"size": "n_distinct_part"})
        )

    distinct = bucketed_group_reduce(
        ds.select_columns(cols).map_batches(distinct_partials, batch_format="pandas"),
        key_cols=["column", "v"],
        reduce_fn=distinct_reduce,
        num_buckets=num_buckets,
    )

    def final_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby("column", as_index=False)["n_distinct_part"]
            .sum()
            .rename(columns={"n_distinct_part": "n_distinct"})
        )

    distinct = bucketed_group_reduce(
        distinct,
        key_cols=["column"],
        reduce_fn=final_distinct,
        num_buckets=min(num_buckets or len(cols), len(cols)),
    )

    # join the two |cols|-row sides: both tiny — tag + union + merge in
    # one single-bucket reduce keeps it one exchange, same as the big ops
    def attach(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["n_distinct"] < 0].drop(columns=["n_distinct"])
        right = g[g["n_distinct"] >= 0][["column", "n_distinct"]]
        # left merge: an all-null column has no distinct rows at all, but
        # its stats row (n_rows/n_null) must still appear with n_distinct=0
        out = left.merge(right, on="column", how="left")
        out["n_distinct"] = out["n_distinct"].fillna(0)
        return out[
            ["column", "n_rows", "n_null", "n_distinct", "vmin", "vmax"]
        ].astype({"n_rows": np.int64, "n_null": np.int64, "n_distinct": np.int64})

    stats_t = stats.map_batches(
        lambda df: df.assign(n_distinct=np.int64(-1)), batch_format="pandas"
    )
    distinct_t = distinct.map_batches(
        lambda df: pd.DataFrame(
            {
                "column": df["column"],
                "n_rows": np.int64(0),
                "n_null": np.int64(0),
                "vmin": 0.0,
                "vmax": 0.0,
                "n_distinct": df["n_distinct"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    return bucketed_group_reduce(
        stats_t.union(distinct_t),
        key_cols=["column"],
        reduce_fn=attach,
        num_buckets=min(num_buckets or len(cols), len(cols)),
    )


def mad_outliers(
    ds: "rd.Dataset",
    group_cols: list[str],
    col: str,
    k: float = 3.0,
    scale: int = 100,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group robust outlier detection: rows where
    |v − median(v)| > k · MAD(v), with median and MAD both the EXACT
    per-group discrete (nearest-rank) quantile at fixed-point ``scale``
    — the `grouped_quantiles` semantics, so both statistics reproduce
    bit-identically in the SQL oracle (quantile_disc over
    round(x·scale)/scale). The residual comparison runs on raw doubles:
    v − med, k·mad and the > are each single correctly-rounded IEEE
    ops, identical across engines.

    Returns the outlier rows (group_cols…, id column(s) untouched —
    the op passes through every input column).

    Scale shape: two `grouped_quantiles` passes (each fully combiner-
    reduced, group×domain-bounded histograms) + two broadcast-or-shuffle
    `hash_join` attaches; the corpus streams through twice and never
    materializes.
    """
    from kgflow.ops.joins import hash_join

    gcols = list(group_cols)

    med = grouped_quantiles(ds, gcols, col, qs=(0.5,), scale=scale,
                            num_buckets=num_buckets)
    med = med.map_batches(
        lambda d: d.drop(columns=["q"]).rename(columns={"v": "_med"}),
        batch_format="pandas",
    ).materialize()  # group-bounded; reused by both attach joins

    with_med = hash_join(ds, med, on=gcols, num_buckets=num_buckets)

    def add_dev(d: pd.DataFrame) -> pd.DataFrame:
        return d.assign(
            _dev=np.abs(d[col].to_numpy(np.float64) - d["_med"].to_numpy(np.float64))
        )

    dev = with_med.map_batches(add_dev, batch_format="pandas")

    mad = grouped_quantiles(dev, gcols, "_dev", qs=(0.5,), scale=scale,
                            num_buckets=num_buckets)
    mad = mad.map_batches(
        lambda d: d.drop(columns=["q"]).rename(columns={"v": "_mad"}),
        batch_format="pandas",
    ).materialize()

    flagged = hash_join(dev, mad, on=gcols, num_buckets=num_buckets)

    def pick(d: pd.DataFrame) -> pd.DataFrame:
        keep = d["_dev"].to_numpy(np.float64) > k * d["_mad"].to_numpy(np.float64)
        return d.loc[keep].drop(columns=["_med", "_dev", "_mad"])

    return flagged.map_batches(pick, batch_format="pandas")


def _category_count_fns(key: str, cat_col: str):
    """Shared (key, cat, c) combiner + in-bucket total for the grouped
    categorical statistics (`grouped_gini`, `grouped_mode`).
    ``dropna=False`` keeps NULL categories as a real group — SQL
    GROUP BY counts NULLs, and silently dropping them would skew both
    the moments and the argmax against the oracle."""

    def partial(d: pd.DataFrame) -> pd.DataFrame:
        return (
            d.groupby([key, cat_col], sort=False, observed=True, dropna=False)
            .size()
            .rename("c")
            .reset_index()
        )

    def totals(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby([key, cat_col], sort=False, observed=True, dropna=False)[
                "c"
            ]
            .sum()
            .reset_index()
        )

    return partial, totals


def grouped_gini(
    ds: "rd.Dataset",
    key: str,
    cat_col: str,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-key Gini impurity of a categorical column's distribution:
    gini = 1 − Σ_c (n_c/n)² = (n² − Σ n_c²) / n² — the rational-exact
    diversity statistic (the entropy stand-in with no libm log(), so
    the single double division is correctly rounded identically in
    every IEEE engine; same trick as ``simpson_diversity``).

    Output: (key, n_events, gini). Scale shape: each batch shrinks to
    partial (key, cat, c) counts BEFORE the exchange (combiner), then
    ONE key-bucketed reduce sums counts and the int64 moments — the
    shuffle carries category-domain-bounded rows, never event rows.
    NULL categories count as a category (SQL GROUP BY semantics).
    Guard: n > 2³¹ per key would overflow n² — fail loudly.
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    partial, totals = _category_count_fns(key, cat_col)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        tot = totals(g)
        c = tot["c"].to_numpy(dtype=np.int64)
        agg = tot.assign(sq=c * c).groupby(key, as_index=False).agg(
            n=("c", "sum"), sq=("sq", "sum")
        )
        n = agg["n"].to_numpy(dtype=np.int64)
        sq = agg["sq"].to_numpy(dtype=np.int64)
        if len(n) and n.max() > 2**31:
            raise ValueError("grouped_gini: n² exceeds int64 — rescale")
        nn = n * n
        return pd.DataFrame(
            {
                key: agg[key],
                "n_events": n,
                "gini": (nn - sq).astype(np.float64) / nn.astype(np.float64),
            }
        )

    partials = ds.select_columns([key, cat_col]).map_batches(
        partial, batch_format="pandas"
    )
    return bucketed_group_reduce(
        partials, key_cols=[key], reduce_fn=finish, num_buckets=num_buckets
    )


def grouped_mode(
    ds: "rd.Dataset",
    key: str,
    cat_col: str,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-key mode of a categorical column with a DETERMINISTIC
    tie-break (highest count, then lexicographically smallest value) —
    the grouped argmax every engine needs but few make reproducible.

    Output: (key, mode, mode_count). Same combiner + one-exchange
    shape as ``grouped_gini`` (shared `_category_count_fns`): batches
    shrink to partial (key, cat, c) counts, the bucketed reduce sums
    them and takes the per-key argmax via a sort + drop_duplicates
    (C kernels, no Python per group). NULL categories participate
    (counted like SQL GROUP BY; on a count tie they sort after real
    values in BOTH engines — pandas na_position='last' ≙ DuckDB
    NULLS LAST for ASC).
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    partial, totals = _category_count_fns(key, cat_col)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        tot = totals(g)
        best = tot.sort_values(
            [key, "c", cat_col], ascending=[True, False, True], kind="mergesort"
        ).drop_duplicates(key)
        return pd.DataFrame(
            {
                key: best[key].to_numpy(),
                "mode": best[cat_col].to_numpy(),
                "mode_count": best["c"].to_numpy(dtype=np.int64),
            }
        )

    partials = ds.select_columns([key, cat_col]).map_batches(
        partial, batch_format="pandas"
    )
    return bucketed_group_reduce(
        partials, key_cols=[key], reduce_fn=finish, num_buckets=num_buckets
    )


def grouped_corr_moments(
    ds: "rd.Dataset",
    key: str,
    x_col: str,
    y_col: str,
    x_scale: int = 100,
    y_scale: int = 1,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-key exact bivariate moments — the distributed heart of
    Pearson correlation / covariance / OLS slope: quantize x and y
    FIRST (floor(v·scale), so every downstream sum is int64 with no
    float accumulation-order drift — the ``embedding_gram`` trick,
    `kgflow/ops/ann.py:378`), then ship per-batch partial
    (n, Σx, Σy, Σx², Σy², Σxy) rows and sum them in ONE key-bucketed
    reduce.

    Output: (key, n, sx, sy, sxx, syy, sxy) — all BIGINT, so the row
    is hash-exact across engines; corr/cov/slope are single driver-side
    divisions the caller applies (kept out of the exchanged schema so
    the oracle never compares a libm sqrt). NULL x or y rows are
    dropped pair-wise (SQL corr semantics).

    Scale shape: the exchange carries ≤ blocks × |keys| rows of 7
    scalars — constant per key per block, independent of row count.
    Overflow bound: |Σx²| ≤ n·(max|x|·x_scale)²; with 2-decimal
    values ≤ 1e4 quantized to ≤ 1e6, int64 holds n ≤ 9e6 rows per
    BATCH partial and 9e18 total — fail-loud asserted per batch."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]

    def partial(d: pd.DataFrame) -> pd.DataFrame:
        d = d[[key, x_col, y_col]].dropna()
        x = np.floor(d[x_col].to_numpy(dtype=np.float64) * x_scale).astype(
            np.int64
        )
        y = np.floor(d[y_col].to_numpy(dtype=np.float64) * y_scale).astype(
            np.int64
        )
        if len(x):
            # Python ints: the guard product itself would wrap in int64
            mx = int(max(np.abs(x).max(), np.abs(y).max()))
            if mx * mx * len(x) >= 2**63:
                raise ValueError(
                    "grouped_corr_moments: batch moment would overflow int64 "
                    f"(max |quantized| = {mx}, n = {len(x)}); lower the scale"
                )
        t = pd.DataFrame(
            {
                key: d[key].to_numpy(),
                "n": np.ones(len(x), dtype=np.int64),
                "sx": x,
                "sy": y,
                "sxx": x * x,
                "syy": y * y,
                "sxy": x * y,
            }
        )
        return t.groupby(key, as_index=False, sort=False).sum()

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key, as_index=False, sort=False)[cols].sum()

    partials = ds.select_columns([key, x_col, y_col]).map_batches(
        partial, batch_format="pandas"
    )
    return bucketed_group_reduce(
        partials, key_cols=[key], reduce_fn=finish, num_buckets=num_buckets
    )


def grouped_entropy(
    ds: "rd.Dataset",
    group_cols: list[str],
    cat_col: str,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Shannon entropy (nats) of the ``cat_col`` distribution per
    group — the information-theoretic sibling of `grouped_gini`:
    behavioral diversity scoring (does this user do one thing or
    many), class-balance profiling, split-quality audits.

    Scale shape: a (group, category) count combiner shrinks each block
    before ONE group-keyed exchange; the in-bucket pass is vectorized
    (groupby-transform sums, one log over the counts column). Floats
    appear ONLY in the final entropy expression — counts stay exact
    int64 through every exchange — so engine-vs-SQL differences are
    bounded by libm ulps (≪ the 1e-6 comparator tolerance), not by
    summation order."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    keys = list(group_cols)

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(keys + [cat_col], as_index=False, sort=False).size()
        return out.rename(columns={"size": "c"})

    def entropy(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(keys + [cat_col], as_index=False)["c"].sum()
        n = s.groupby(keys)["c"].transform("sum").to_numpy(dtype=np.int64)
        c = s["c"].to_numpy(dtype=np.int64)
        # per-row term c·ln(c); per-group H = ln(n) − Σ c·ln(c) / n
        term = c * np.log(c)
        t = s[keys].copy()
        t["n"] = n
        t["term"] = term
        agg = t.groupby(keys, as_index=False).agg(
            n_rows=("n", "first"), s_term=("term", "sum")
        )
        agg["entropy"] = (
            np.log(agg["n_rows"].to_numpy(dtype=np.float64))
            - agg["s_term"].to_numpy() / agg["n_rows"].to_numpy()
        )
        return agg.drop(columns=["s_term"])

    return bucketed_group_reduce(
        ds.map_batches(count_partial, batch_format="pandas"),
        key_cols=keys,
        reduce_fn=entropy,
        num_buckets=num_buckets,
    )


def grouped_mad(
    ds: "rd.Dataset",
    key: str,
    value_col: str = "value",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-key exact median and median-absolute-deviation →
    (key, med, mad). MAD is DOUBLY holistic (a median of deviations
    from a median), so no combiner exists — the exchange ships the raw
    (key, value) pairs ONCE hash-partitioned on the key (the same
    single-exchange layout as `moving_median`); both medians are
    in-bucket numpy partitions. Even-count groups interpolate (a+b)/2
    in double exactly like SQL median()/quantile_cont(0.5); NULLs drop
    pair-wise (SQL aggregate semantics).

    The robust-statistics companion to `grouped_corr_moments`: z-score
    outlier screens built on mean/std are themselves skewed by the
    outliers; med/MAD is the standard robust alternative (Hampel).
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=[value_col])
        med = g.groupby(key, sort=False)[value_col].transform("median")
        dev = (g[value_col] - med).abs()
        out = pd.DataFrame(
            {
                key: g[key],
                "_med": med,
                "_dev": dev,
            }
        )
        r = out.groupby(key, as_index=False, sort=False).agg(
            med=("_med", "first"), mad=("_dev", "median")
        )
        return r

    return bucketed_group_reduce(
        ds.select_columns([key, value_col]),
        key_cols=[key],
        reduce_fn=reduce_fn,
        num_buckets=num_buckets,
    )


def chi2_independence(
    ds: "rd.Dataset",
    row_col: str,
    col_col: str,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Pearson chi-square test of independence over two categorical
    columns → ONE row (n, n_rows_cat, n_cols_cat, dof, chi2). The
    distributed part is the contingency-table count (per-batch
    combiner → ONE (row,col)-keyed int64 exchange, category-bounded
    output); the chi-square fold then runs over that bounded table in
    a single bucket with cells visited in sorted (row, col) order so
    the float accumulation order is deterministic. Counts stay int64
    into the fold; expected counts and the statistic are the only
    float ops.
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[[row_col, col_col]].dropna().copy()
        t["_cnt"] = np.int64(1)
        return t.groupby([row_col, col_col], as_index=False, sort=False)[
            "_cnt"
        ].sum()

    counts = bucketed_group_reduce(
        ds.select_columns([row_col, col_col]).map_batches(
            partial, batch_format="pandas"
        ),
        key_cols=[row_col, col_col],
        reduce_fn=lambda g: g.groupby(
            [row_col, col_col], as_index=False, sort=False
        )["_cnt"].sum(),
        num_buckets=num_buckets,
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.groupby([row_col, col_col], as_index=False, sort=False)["_cnt"]
            .sum()
            .sort_values([row_col, col_col], kind="mergesort")
        )
        n = int(g["_cnt"].sum())
        rt = g.groupby(row_col, sort=True)["_cnt"].sum()
        ct = g.groupby(col_col, sort=True)["_cnt"].sum()
        o = g["_cnt"].to_numpy(dtype=np.int64)
        e = (
            rt.reindex(g[row_col]).to_numpy(dtype=np.float64)
            * ct.reindex(g[col_col]).to_numpy(dtype=np.float64)
            / np.float64(n)
        )
        # zero-count cells contribute (0-e)^2/e for MISSING pairs too:
        # add the expected mass of absent (row, col) combinations,
        # which equals n - sum(e over present cells)
        chi2 = float(((o - e) ** 2 / e).sum()) + (n - float(e.sum()))
        return pd.DataFrame(
            {
                "n": [np.int64(n)],
                "n_row_cats": [np.int64(len(rt))],
                "n_col_cats": [np.int64(len(ct))],
                "dof": [np.int64((len(rt) - 1) * (len(ct) - 1))],
                "chi2": [chi2],
            }
        )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_k"] = np.int64(0)
        return df

    return bucketed_group_reduce(
        counts.map_batches(tag, batch_format="pandas"),
        key_cols=["_k"],
        reduce_fn=fold,
        num_buckets=1,
    )


def json_int_field_stats(
    ds: "rd.Dataset",
    group_col: str,
    json_col: str,
    field: str,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Grouped stats over an integer field inside a JSON-string
    column — the semi-structured sidecar pattern (event props,
    crawl metadata): per ``group_col``, (n, sum_<field>, max_<field>).

    Scale shape: extraction is ONE vectorized regex pass
    (pandas .str.extract, C kernel — no per-row json.loads) feeding a
    per-batch (group, n, sum, max) combiner; the exchange is
    group-bounded 4-column rows. The regex targets ``"field":
    <int>`` — documents the (deliberate) restriction to scalar
    integer fields; nested/quoted values need a real JSON stage."""
    import re as _re

    from kgflow.ops.shuffle import bucketed_group_reduce

    pat = '"' + _re.escape(field) + r'"\s*:\s*(-?\d+)'
    sum_c, max_c = f"sum_{field}", f"max_{field}"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df[json_col].str.extract(pat, expand=False).astype("int64")
        g = pd.DataFrame({group_col: df[group_col], "_v": v}).groupby(
            group_col, as_index=False
        )["_v"]
        out = g.agg(["size", "sum", "max"]).reset_index(drop=True)
        out.columns = [group_col, "n", sum_c, max_c]
        return out.astype({"n": "int64", sum_c: "int64", max_c: "int64"})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(group_col, as_index=False).agg(
            n=("n", "sum"), s=(sum_c, "sum"), m=(max_c, "max")
        )
        out.columns = [group_col, "n", sum_c, max_c]
        return out.astype({"n": "int64", sum_c: "int64", max_c: "int64"})

    return bucketed_group_reduce(
        ds.select_columns([group_col, json_col]).map_batches(
            partial, batch_format="pandas"
        ),
        key_cols=[group_col],
        reduce_fn=final,
        num_buckets=num_buckets,
    )


def grouped_iqr_outliers(
    ds: "rd.Dataset",
    group_col: str,
    col: str,
    fence: int = 3,
    scale: int = 10_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group Tukey-fence outlier count: rows whose fixed-point
    value falls outside [Q1 − fence·IQR, Q3 + fence·IQR], with Q1/Q3
    the exact discrete per-group quartiles (`grouped_quantiles`
    semantics ≡ SQL quantile_disc). Output
    (group, q1, q3, n_out) — q1/q3 reported so the fences themselves
    are oracle-checked, not just the count.

    Scale shape: the quartiles come from the fully distributed
    histogram pipeline; only the group-bounded (group, q1, q3) table
    is pulled and broadcast (integer fences — no float compare), then
    ONE streaming counted pass over the facts. Two passes total,
    nothing driver-side but the tiny fence table."""
    import ray

    from kgflow.ops.shuffle import bucketed_group_reduce

    qt = grouped_quantiles(
        ds, [group_col], col, qs=(0.25, 0.75), scale=scale,
        num_buckets=num_buckets,
    ).to_pandas()  # group-bounded pull
    piv = qt.pivot_table(index=group_col, columns="q", values="v")
    fences = {
        g: (
            int(np.round(r[0.25] * scale)),
            int(np.round(r[0.75] * scale)),
        )
        for g, r in piv.iterrows()
    }
    f_ref = ray.put(fences)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        fs = ray.get(f_ref)
        v = np.round(df[col].to_numpy(dtype=np.float64) * scale).astype(
            np.int64
        )
        d = df[[group_col]].assign(_v=v)
        outs = []
        for g, gg in d.groupby(group_col, sort=False):
            q1, q3 = fs[g]
            iqr = q3 - q1
            vv = gg["_v"].to_numpy()
            n_out = int(
                ((vv < q1 - fence * iqr) | (vv > q3 + fence * iqr)).sum()
            )
            outs.append((g, n_out))
        return pd.DataFrame(
            {
                group_col: [o[0] for o in outs],
                "n_out": np.array([o[1] for o in outs], dtype=np.int64),
            }
        )

    counts = bucketed_group_reduce(
        ds.select_columns([group_col, col]).map_batches(
            partial, batch_format="pandas"
        ),
        key_cols=[group_col],
        reduce_fn=lambda g: g.groupby(group_col, as_index=False)["n_out"]
        .sum()
        .astype({"n_out": "int64"}),
        num_buckets=num_buckets,
    )

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        fs = ray.get(f_ref)
        q1 = np.array([fs[g][0] for g in df[group_col]], dtype=np.float64)
        q3 = np.array([fs[g][1] for g in df[group_col]], dtype=np.float64)
        return pd.DataFrame(
            {
                group_col: df[group_col],
                "q1": q1 / scale,
                "q3": q3 / scale,
                "n_out": df["n_out"].astype(np.int64),
            }
        )

    return counts.map_batches(attach, batch_format="pandas")


def grouped_weighted_median(
    ds: "rd.Dataset",
    group_col: str,
    val_col: str,
    weight_col: str,
    scale: int = 10_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group WEIGHTED lower median — the robust aggregation
    primitive behind importance-weighted corpus statistics: the
    smallest fixed-point value v with cumulative weight ≥ half the
    group's total weight (2·cw ≥ tw in exact integers; weights must
    be non-negative int64). Output (group, wmedian).

    Scale shape mirrors `grouped_quantiles`: a per-block combiner
    collapses rows to (group, v_fp, Σweight) partials; exchange A
    bucketed on (group, v_fp) merges them (a hot group's histogram
    SPREADS); exchange B assembles each group's domain-bounded
    weighted histogram where the cumsum + first-hit extraction runs
    vectorized across all groups."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def combiner(df: pd.DataFrame) -> pd.DataFrame:
        v = np.round(df[val_col].to_numpy(dtype=np.float64) * scale).astype(
            np.int64
        )
        w = df[weight_col].to_numpy(dtype=np.int64)
        if len(w) and w.min() < 0:
            raise ValueError("weights must be non-negative")
        return (
            pd.DataFrame({group_col: df[group_col], "v_fp": v, "wt": w})
            .groupby([group_col, "v_fp"], as_index=False, sort=False)["wt"]
            .sum()
        )

    hist = bucketed_group_reduce(
        ds.select_columns([group_col, val_col, weight_col]).map_batches(
            combiner, batch_format="pandas"
        ),
        key_cols=[group_col, "v_fp"],
        reduce_fn=lambda g: g.groupby(
            [group_col, "v_fp"], as_index=False, sort=False
        )["wt"].sum(),
        num_buckets=num_buckets,
    )

    def extract(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    group_col: pd.Series([], dtype=g[group_col].dtype),
                    "wmedian": pd.Series([], dtype="float64"),
                }
            )
        g = g.groupby([group_col, "v_fp"], as_index=False)["wt"].sum()
        g = g.sort_values([group_col, "v_fp"], kind="mergesort")
        grp = g.groupby(group_col, sort=False)
        cw = grp["wt"].cumsum().to_numpy(dtype=np.int64)
        tw = grp["wt"].transform("sum").to_numpy(dtype=np.int64)
        hit = g.loc[2 * cw >= tw, [group_col, "v_fp"]]
        first = hit.groupby(group_col, as_index=False, sort=False).first()
        return pd.DataFrame(
            {
                group_col: first[group_col],
                "wmedian": first["v_fp"].to_numpy(dtype=np.float64) / scale,
            }
        )

    return bucketed_group_reduce(
        hist, key_cols=[group_col], reduce_fn=extract, num_buckets=num_buckets
    )


def seasonal_sigma_outliers(
    events: "rd.Dataset",
    key_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    scale: int = 100,
    k_sigma: int = 3,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Seasonal-baseline anomaly detection: flag events whose value
    deviates more than ``k_sigma`` population standard deviations from
    their (key, hour-of-day) cell's mean — the telemetry monitoring
    rule with the diurnal cycle factored out, so a value normal at the
    daily peak isn't flagged just for occurring at 3 am.

    INTEGER-EXACT decision rule at fixed-point ``scale``: with
    x = floor(value·scale) and the cell's BIGINT moments (n, Σx, Σx²),
    the test |x − μ| > k·σ is evaluated as
    (n·x − Σx)² > k²·(n·Σx² − (Σx)²) — no float μ/σ ever computed, so
    the flag set is hash-reproducible (the `events_corr` quantize-first
    trick applied to the DECISION, not just the moments). The hot path
    is vectorized float64 with a relative guard band; only rows inside
    the band re-check in exact arbitrary-precision ints, so overflow
    at any n is impossible and the boundary is still exact. Cells with
    n < 2 never flag (σ undefined). Output: (id, keys, hr, x) for
    flagged events.

    Scale shape: moments pre-shrink per block to one row per (key, hr)
    cell before ONE cell-keyed exchange; the tiny cell table broadcasts
    via ``ray.put`` and the flagging pass is exchange-free."""
    import ray

    from kgflow.ops.shuffle import bucketed_group_reduce

    keys = list(key_cols)

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df[value_col].notna()].copy()
        df["hr"] = df[ts_col].dt.hour.astype("int64")
        df["x"] = np.floor(
            df[value_col].to_numpy(dtype=np.float64) * scale
        ).astype("int64")
        return df[[id_col, *keys, "hr", "x"]]

    # consumed twice (moments + flagging): materialize so the read+prep
    # doesn't re-execute (the triangle_count lesson)
    qev = events.map_batches(prep, batch_format="pandas").materialize()

    def mom_partial(d: pd.DataFrame) -> pd.DataFrame:
        x = d["x"].to_numpy(dtype=np.int64)
        g = d.assign(_n=1, _sx=x, _sxx=x * x).groupby(
            [*keys, "hr"], as_index=False
        ).agg(n=("_n", "sum"), sx=("_sx", "sum"), sxx=("_sxx", "sum"))
        return g

    def mom_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby([*keys, "hr"], as_index=False).agg(
            n=("n", "sum"), sx=("sx", "sum"), sxx=("sxx", "sum")
        )
        for c in ("n", "sx", "sxx"):
            out[c] = out[c].astype("int64")
        return out

    cells = bucketed_group_reduce(
        qev.map_batches(mom_partial, batch_format="pandas"),
        key_cols=[*keys, "hr"],
        reduce_fn=mom_sum,
        num_buckets=num_buckets,
    )
    ref = ray.put(cells.to_pandas())

    k2 = int(k_sigma) * int(k_sigma)

    class Flag:
        def __init__(self):
            self.cells = ray.get(ref)

        def __call__(self, d: pd.DataFrame) -> pd.DataFrame:
            m = d.merge(self.cells, on=[*keys, "hr"], how="inner")
            m = m[m["n"] >= 2]
            if not len(m):
                return m[[id_col, *keys, "hr", "x"]]
            nf = m["n"].to_numpy(dtype=np.float64)
            xf = m["x"].to_numpy(dtype=np.float64)
            sxf = m["sx"].to_numpy(dtype=np.float64)
            sxxf = m["sxx"].to_numpy(dtype=np.float64)
            lhs = (nf * xf - sxf) ** 2
            rhs = k2 * (nf * sxxf - sxf * sxf)
            band = 1e-9 * (np.abs(lhs) + np.abs(rhs) + 1.0)
            out = lhs > rhs + band
            near = np.abs(lhs - rhs) <= band
            for i in np.flatnonzero(near):  # rare: exact int recheck
                n, x, sx, sxx = (
                    int(m["n"].iat[i]),
                    int(m["x"].iat[i]),
                    int(m["sx"].iat[i]),
                    int(m["sxx"].iat[i]),
                )
                out[i] = (n * x - sx) ** 2 > k2 * (n * sxx - sx * sx)
            return m.loc[out, [id_col, *keys, "hr", "x"]]

    return qev.map_batches(Flag, batch_format="pandas", concurrency=(1, 4))


def grouped_power_sums(
    ds: "rd.Dataset",
    key: str,
    col: str,
    scale: int = 100,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-key EXACT power sums (n, s1, s2, s3, s4) of q = floor(v·scale)
    — the distributed core of skewness / kurtosis (and any method-of-
    moments fit): g1 and g2 are driver-side closed forms over this one
    hash-exact row, so the oracle never compares a libm pow/sqrt.

    Arbitrary precision without per-row Python: q is asserted < 2^17,
    so q³ ≤ 2^51 is elementwise-exact in int64 but q⁴ ≤ 2^68 is NOT —
    q⁴ is carried as three int64 lanes via the split q² = a·2^17 + b
    (q⁴ = a²·2^34 + 2ab·2^17 + b²; each lane ≤ 2^34 per element), and
    q³ as two lanes (>>26 / &mask) so batch sums never overflow. The
    bucketed reduce re-sums lanes per group with PYTHON ints (object
    dtype over the tiny partial table — G×B rows, never data rows),
    so totals are exact at ANY corpus size; s1..s4 ship as decimal
    strings (SQL side: HUGEINT → VARCHAR).

    Scale shape: one (key, 9×int64) combiner row per group per block
    rides the single key-bucketed exchange — constant per key per
    block, independent of row count.
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    LANE3_SHIFT, LANE4_SHIFT = 26, 17
    M3, M4 = (1 << LANE3_SHIFT) - 1, (1 << LANE4_SHIFT) - 1

    def partial(d: pd.DataFrame) -> pd.DataFrame:
        d = d[[key, col]].dropna()
        q = np.floor(d[col].to_numpy(dtype=np.float64) * scale).astype(np.int64)
        if len(q):
            mx = int(np.abs(q).max())
            if mx >= 1 << 17:
                raise ValueError(
                    f"grouped_power_sums: |floor({col}*{scale})| = {mx} ≥ 2^17; "
                    "lower the scale (q⁴ lane split assumes 17-bit q)"
                )
        q2 = q * q  # ≤ 2^34
        q3 = q2 * q  # |·| ≤ 2^51, elementwise exact
        a, b = q2 >> LANE4_SHIFT, q2 & M4  # q2 = a·2^17 + b, both < 2^17
        t = pd.DataFrame(
            {
                key: d[key].to_numpy(),
                "n": np.ones(len(q), dtype=np.int64),
                "s1": q,
                "s2": q2,
                "h3": q3 >> LANE3_SHIFT,  # |·| ≤ 2^25
                "l3": q3 & M3,  # < 2^26
                "paa": a * a,  # ≤ 2^34
                "pab": a * b,  # < 2^34
                "pbb": b * b,  # < 2^34
            }
        )
        return t.groupby(key, as_index=False, sort=False).sum()

    lane_cols = ["n", "s1", "s2", "h3", "l3", "paa", "pab", "pbb"]

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        # Python-int lane sums: exact at any N (the partial table per
        # bucket is small — groups × blocks rows, never data rows).
        agg = g.groupby(key, sort=False)[lane_cols].agg(
            lambda s: sum(int(x) for x in s)
        )
        out = pd.DataFrame({key: agg.index.to_numpy()})
        out["n"] = np.asarray([int(v) for v in agg["n"]], dtype=np.int64)
        out["s1"] = [str(int(v)) for v in agg["s1"]]
        out["s2"] = [str(int(v)) for v in agg["s2"]]
        out["s3"] = [
            str((int(h) << LANE3_SHIFT) + int(l))
            for h, l in zip(agg["h3"], agg["l3"])
        ]
        out["s4"] = [
            str((int(aa) << 34) + (int(ab) << (LANE4_SHIFT + 1)) + int(bb))
            for aa, ab, bb in zip(agg["paa"], agg["pab"], agg["pbb"])
        ]
        return out

    partials = ds.select_columns([key, col]).map_batches(
        partial, batch_format="pandas"
    )
    return bucketed_group_reduce(
        partials, key_cols=[key], reduce_fn=finish, num_buckets=num_buckets
    )


def skewkurt_from_power_sums(df: pd.DataFrame, scale: int = 100) -> pd.DataFrame:
    """Driver-side closed form over a `grouped_power_sums` result:
    population skewness g1 = m3/m2^1.5 and excess kurtosis g2 = m4/m2²−3
    from the exact integer power sums (m_k = central moments; the only
    floats are these final divisions). Input stays tiny (one row per
    group)."""
    out = df.copy()
    n = out["n"].to_numpy(dtype=np.float64)
    s = scale
    s1 = np.array([int(v) for v in out["s1"]], dtype=np.float64) / s
    s2 = np.array([int(v) for v in out["s2"]], dtype=np.float64) / s**2
    s3 = np.array([int(v) for v in out["s3"]], dtype=np.float64) / s**3
    s4 = np.array([int(v) for v in out["s4"]], dtype=np.float64) / s**4
    mu = s1 / n
    m2 = s2 / n - mu**2
    m3 = s3 / n - 3 * mu * s2 / n + 2 * mu**3
    m4 = s4 / n - 4 * mu * s3 / n + 6 * mu**2 * s2 / n - 3 * mu**4
    with np.errstate(divide="ignore", invalid="ignore"):
        out["skewness"] = m3 / np.power(m2, 1.5)
        out["kurtosis_excess"] = m4 / (m2 * m2) - 3.0
    return out


def moment_matrix(
    ds: "rd.Dataset",
    cols: list[str],
    scales: dict[str, int] | None = None,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """EXACT all-pairs bivariate moments over numeric columns in ONE
    data pass — the correlation/covariance MATRIX primitive (feature
    screening, redundancy detection, drift audits): for every pair
    i ≤ j emits (col_a, col_b, n, sx, sy, sxy) with
    q_c = floor(v_c·scale_c); Pearson r / cov are driver-side closed
    forms (variances come from the diagonal a = b rows).

    Exactness at any N: each quantized column is asserted < 2^24, so
    elementwise products ≤ 2^48 are int64-exact; per-batch sums run in
    2^14-row chunks (chunk sum ≤ 2^62) and accumulate into Python ints
    so nothing ever wraps; sums ship as decimal strings (SQL mirrors
    with HUGEINT → VARCHAR). Rows are dropped pairwise-NULL per pair,
    matching SQL's WHERE a IS NOT NULL AND b IS NOT NULL.

    Scale shape: the exchange carries ~|pairs| string rows per block —
    constant in row count; p columns cost p(p+1)/2 vectorized
    multiply-sums inside the single read pass, never p passes."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    if scales is None:
        scales = {}
    CHUNK = 1 << 14

    def partial(d: pd.DataFrame) -> pd.DataFrame:
        qs = {}
        for c in cols:
            v = d[c].to_numpy(dtype=np.float64)
            q = np.floor(v * scales.get(c, 1))
            qs[c] = q  # float carrying exact ints; NaN marks null
            finite = q[np.isfinite(q)]
            if len(finite) and np.abs(finite).max() >= 1 << 24:
                raise ValueError(
                    f"moment_matrix: |floor({c}*scale)| >= 2^24; lower the scale"
                )
        rows = []
        for i, ca in enumerate(cols):
            for cb in cols[i:]:
                ok = np.isfinite(qs[ca]) & np.isfinite(qs[cb])
                a = qs[ca][ok].astype(np.int64)
                b = qs[cb][ok].astype(np.int64)
                sx = sy = sxy = 0
                for lo in range(0, len(a), CHUNK):
                    aa, bb = a[lo : lo + CHUNK], b[lo : lo + CHUNK]
                    sx += int(aa.sum())
                    sy += int(bb.sum())
                    sxy += int((aa * bb).sum())
                rows.append(
                    {
                        "col_a": ca,
                        "col_b": cb,
                        "n": len(a),
                        "sx": str(sx),
                        "sy": str(sy),
                        "sxy": str(sxy),
                    }
                )
        return pd.DataFrame(rows)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (ca, cb), grp in g.groupby(["col_a", "col_b"], sort=False):
            out.append(
                {
                    "col_a": ca,
                    "col_b": cb,
                    "n": np.int64(grp["n"].sum()),
                    "sx": str(sum(int(v) for v in grp["sx"])),
                    "sy": str(sum(int(v) for v in grp["sy"])),
                    "sxy": str(sum(int(v) for v in grp["sxy"])),
                }
            )
        return pd.DataFrame(out, columns=["col_a", "col_b", "n", "sx", "sy", "sxy"])

    partials = ds.select_columns(cols).map_batches(partial, batch_format="pandas")
    return bucketed_group_reduce(
        partials, key_cols=["col_a", "col_b"], reduce_fn=finish, num_buckets=num_buckets
    )


def binary_auc_exact(
    ds: "rd.Dataset",
    label_col: str,
    score_col: str,
    max_distinct_scores: int = 1_000_000,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """EXACT ROC-AUC of an integer score against a binary label — the
    distributed model-evaluation primitive (ranking quality of a
    filter/classifier signal over the whole corpus, no sampling): via
    the Mann-Whitney identity AUC = U / (n_pos·n_neg) with
    U = #(pos, neg) pairs scored pos > neg, ties counting ½. Returns
    ONE row (n_pos, n_neg, u2) where u2 = 2U stays integer under ties
    and ships as a decimal string (u2 ~ n_pos·n_neg can exceed int64
    at corpus scale); auc = u2 / (2·n_pos·n_neg) is the caller's one
    float op (`auc_from_u2`).

    Scale shape: a per-block (score, n_pos, n_neg) count combiner →
    ONE score-keyed reduce; the exchange and the final pull are
    SCORE-DOMAIN-bounded (guarded by ``max_distinct_scores`` via a
    distributed count BEFORE the pull — the pivot-guard rule), never
    row-bounded; the cumulative pair count runs over the tiny sorted
    histogram with Python-int exactness."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def partial(d: pd.DataFrame) -> pd.DataFrame:
        y = d[label_col].to_numpy()
        s = d[score_col].to_numpy(dtype=np.int64)
        t = pd.DataFrame(
            {
                "s": s,
                "np_": (y != 0).astype(np.int64),
                "nn_": (y == 0).astype(np.int64),
            }
        )
        return t.groupby("s", as_index=False, sort=False).sum()

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("s", as_index=False, sort=False)[["np_", "nn_"]].sum()

    hist_ds = bucketed_group_reduce(
        ds.select_columns([label_col, score_col]).map_batches(
            partial, batch_format="pandas"
        ),
        key_cols=["s"],
        reduce_fn=finish,
        num_buckets=num_buckets,
    )
    n_distinct = hist_ds.count()
    if n_distinct > max_distinct_scores:
        raise ValueError(
            f"binary_auc_exact: {n_distinct} distinct scores exceed the pull "
            f"guard ({max_distinct_scores}); quantize the score coarser"
        )
    h = hist_ds.to_pandas().sort_values("s", kind="mergesort")
    npos = int(h["np_"].sum())
    nneg = int(h["nn_"].sum())
    u2 = 0
    cumneg = 0
    for np_s, nn_s in zip(h["np_"], h["nn_"]):  # score-domain-bounded loop
        u2 += 2 * int(np_s) * cumneg + int(np_s) * int(nn_s)
        cumneg += int(nn_s)
    return pd.DataFrame(
        {"n_pos": [np.int64(npos)], "n_neg": [np.int64(nneg)], "u2": [str(u2)]}
    )


def auc_from_u2(df: pd.DataFrame) -> float:
    """The one float op over a `binary_auc_exact` row."""
    r = df.iloc[0]
    return int(r["u2"]) / (2.0 * int(r["n_pos"]) * int(r["n_neg"]))


def ks_two_sample_exact(
    ds: "rd.Dataset",
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    max_distinct_values: int = 1_000_000,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic between two
    groups' integer-value distributions — the drift detector a corpus
    pipeline runs between snapshots/sources (did the length/quality/
    score distribution move?): D = max_v |F̂_a(v) − F̂_b(v)|, carried
    cross-multiplied so it stays integer —
    d_num = max_v |n_b·cum_a(v) − n_a·cum_b(v)|, D = d_num/(n_a·n_b).
    Returns ONE row (n_a, n_b, d_num) with d_num as a decimal string
    (it reaches n_a·n_b ≫ int64 at corpus scale); the division is the
    caller's one float op.

    Scale shape: a per-block (value, c_a, c_b) count combiner → ONE
    value-keyed reduce; exchange and pull are value-DOMAIN-bounded
    (guarded before the pull); the cumulative max runs over the tiny
    sorted histogram in Python ints."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def partial(d: pd.DataFrame) -> pd.DataFrame:
        d = d[d[group_col].isin([group_a, group_b])]
        v = d[value_col].to_numpy(dtype=np.int64)
        is_a = (d[group_col] == group_a).to_numpy()
        t = pd.DataFrame(
            {
                "v": v,
                "ca": is_a.astype(np.int64),
                "cb": (~is_a).astype(np.int64),
            }
        )
        return t.groupby("v", as_index=False, sort=False).sum()

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("v", as_index=False, sort=False)[["ca", "cb"]].sum()

    hist_ds = bucketed_group_reduce(
        ds.select_columns([group_col, value_col]).map_batches(
            partial, batch_format="pandas"
        ),
        key_cols=["v"],
        reduce_fn=finish,
        num_buckets=num_buckets,
    )
    n_distinct = hist_ds.count()
    if n_distinct > max_distinct_values:
        raise ValueError(
            f"ks_two_sample_exact: {n_distinct} distinct values exceed the "
            f"pull guard ({max_distinct_values}); quantize coarser"
        )
    h = hist_ds.to_pandas().sort_values("v", kind="mergesort")
    na = int(h["ca"].sum())
    nb = int(h["cb"].sum())
    cuma = cumb = 0
    d_num = 0
    for ca, cb in zip(h["ca"], h["cb"]):  # value-domain-bounded loop
        cuma += int(ca)
        cumb += int(cb)
        d_num = max(d_num, abs(nb * cuma - na * cumb))
    return pd.DataFrame(
        {"n_a": [np.int64(na)], "n_b": [np.int64(nb)], "d_num": [str(d_num)]}
    )


def isotonic_calibrate(
    ds: "rd.Dataset",
    label_col: str,
    score_col: str,
    max_distinct_scores: int = 1_000_000,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Isotonic (PAV) calibration of a binary label against an integer
    score — the monotone-probability map an ML pipeline fits on top of
    a ranking signal (pool-adjacent-violators, Ayer et al. 1955):
    returns per distinct score (s, cal_num, cal_den) where
    cal_num/cal_den is the pooled P(y=1 | block) of the score's PAV
    block. EXACT rational arithmetic throughout — violator detection
    compares num_a·den_b vs num_b·den_a in Python ints, no float ever
    enters the fit; the caller's calibrated probability is the one
    division.

    Scale shape: identical to `binary_auc_exact` — a (score, n_pos,
    n_total) count combiner, ONE score-keyed reduce, a guarded
    score-DOMAIN-bounded pull, then the PAV stack scan (linear in
    distinct scores) driver-side."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def partial(d: pd.DataFrame) -> pd.DataFrame:
        y = d[label_col].to_numpy()
        s = d[score_col].to_numpy(dtype=np.int64)
        t = pd.DataFrame(
            {"s": s, "np_": (y != 0).astype(np.int64), "nt_": np.int64(1)}
        )
        return t.groupby("s", as_index=False, sort=False).sum()

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("s", as_index=False, sort=False)[["np_", "nt_"]].sum()

    hist_ds = bucketed_group_reduce(
        ds.select_columns([label_col, score_col]).map_batches(
            partial, batch_format="pandas"
        ),
        key_cols=["s"],
        reduce_fn=finish,
        num_buckets=num_buckets,
    )
    n_distinct = hist_ds.count()
    if n_distinct > max_distinct_scores:
        raise ValueError(
            f"isotonic_calibrate: {n_distinct} distinct scores exceed the "
            f"pull guard ({max_distinct_scores}); quantize the score coarser"
        )
    h = hist_ds.to_pandas().sort_values("s", kind="mergesort")
    # PAV stack: blocks of (num, den, count_of_scores); merge while the
    # top block's rate exceeds the incoming one (cross-multiplied)
    blocks: list[list[int]] = []
    for np_s, nt_s in zip(h["np_"], h["nt_"]):
        blocks.append([int(np_s), int(nt_s), 1])
        while len(blocks) > 1 and (
            blocks[-2][0] * blocks[-1][1] > blocks[-1][0] * blocks[-2][1]
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
            blocks[-1][2] += b[2]
        # (scan is amortized linear: each score joins a block once)
    cal_num = np.empty(len(h), dtype=np.int64)
    cal_den = np.empty(len(h), dtype=np.int64)
    i = 0
    for num, den, cnt in blocks:
        cal_num[i : i + cnt] = num
        cal_den[i : i + cnt] = den
        i += cnt
    out = h[["s"]].reset_index(drop=True)
    out["cal_num"] = cal_num
    out["cal_den"] = cal_den
    return out


def clustering_metrics(
    labeled: "rd.Dataset",
    pred_col: str = "pred",
    gold_col: str = "gold",
    scale: int = 1_000_000_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Extrinsic clustering-agreement metrics between two labelings of
    the same items — B-cubed precision/recall (Bagga & Baldwin 1998,
    the coreference/entity-linking standard) and exact pairwise
    TP/FP/FN counts (Rand-style). Input: one row per item with its
    predicted and gold label. Output: ONE row
    (n_items, b3_p_fp, b3_r_fp, pair_tp, pair_fp, pair_fn) — the
    pairwise counts are exact int64; the B-cubed sums are per-item
    floor-scaled integers (Σ_i (n_cg·scale)//n_c etc.), so the whole
    row is hash-stable. B3 precision = b3_p_fp / (n_items·scale).

    Scale shape: everything reduces through the (pred, gold)
    contingency CELLS — per-batch count partials, ONE cell-keyed
    exchange, then cell-table (≤ distinct-label-pairs rows) marginals
    and a single-bucket final fold. Items never ride a second
    shuffle; no per-item state."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby([pred_col, gold_col], as_index=False)
            .size()
            .rename(columns={"size": "n_cg"})
        )

    cells = bucketed_group_reduce(
        labeled.select_columns([pred_col, gold_col]).map_batches(
            cell_partial, batch_format="pandas"
        ),
        key_cols=[pred_col, gold_col],
        reduce_fn=lambda g: g.groupby(
            [pred_col, gold_col], as_index=False
        )["n_cg"].sum(),
        num_buckets=num_buckets,
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "n_items": pd.Series([], dtype=np.int64),
                    "b3_p_fp": pd.Series([], dtype=np.int64),
                    "b3_r_fp": pd.Series([], dtype=np.int64),
                    "pair_tp": pd.Series([], dtype=np.int64),
                    "pair_fp": pd.Series([], dtype=np.int64),
                    "pair_fn": pd.Series([], dtype=np.int64),
                }
            )
        n_cg = g["n_cg"].to_numpy(dtype=np.int64)
        n_c = g.groupby(pred_col)["n_cg"].transform("sum").to_numpy(
            dtype=np.int64
        )
        n_g = g.groupby(gold_col)["n_cg"].transform("sum").to_numpy(
            dtype=np.int64
        )
        n = int(n_cg.sum())
        b3_p = int((n_cg * ((n_cg * scale) // n_c)).sum())
        b3_r = int((n_cg * ((n_cg * scale) // n_g)).sum())
        tp = int((n_cg * (n_cg - 1) // 2).sum())
        # pairs sharing a pred cluster / a gold cluster (count each
        # cluster marginal once, not per cell)
        cm = g.groupby(pred_col, as_index=False)["n_cg"].sum()["n_cg"].to_numpy(dtype=np.int64)
        gm = g.groupby(gold_col, as_index=False)["n_cg"].sum()["n_cg"].to_numpy(dtype=np.int64)
        same_pred = int((cm * (cm - 1) // 2).sum())
        same_gold = int((gm * (gm - 1) // 2).sum())
        return pd.DataFrame(
            {
                "n_items": pd.Series([n], dtype=np.int64),
                "b3_p_fp": pd.Series([b3_p], dtype=np.int64),
                "b3_r_fp": pd.Series([b3_r], dtype=np.int64),
                "pair_tp": pd.Series([tp], dtype=np.int64),
                "pair_fp": pd.Series([same_pred - tp], dtype=np.int64),
                "pair_fn": pd.Series([same_gold - tp], dtype=np.int64),
            }
        )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_one=np.int64(0))

    return bucketed_group_reduce(
        cells.map_batches(tag, batch_format="pandas"),
        key_cols=["_one"],
        reduce_fn=lambda g: fold(g.drop(columns=["_one"])),
        num_buckets=1,
    )
