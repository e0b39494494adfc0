"""Event-time windowed operators over keyed streams: gap-based
sessionization and as-of (most-recent-at-or-before) joins.

Both need each key's full event history co-located and time-ordered, so
they ride ONE bucketed shuffle on the partition key
(`kgflow.ops.shuffle.bucketed_group_reduce`) and run vectorized inside
the bucket — boundary detection, session numbering and the as-of merge
are numpy/pandas column ops, never a Python loop over events. The
tumbling-window cousin (`kgflow.ops.relational.events_hourly`) needs no
ordering and stays a plain grouped aggregate.

Skew: a hot key's whole history lands in one bucket (inherent — both
semantics are order-dependent within the key), but the in-bucket cost
is O(rows log rows) vectorized sort + linear scans, not per-event
Python. At 100 TB the bucket count scales with the cluster
(`default_num_buckets`) and a single key's history is bounded by the
key's own traffic, not the corpus.

Determinism: all orderings use (key, ts, event_id) so equal timestamps
cannot reorder between runs or engines; value sums use the same exact
fixed-point int64 trick as `events_hourly` (float sum order drift would
flip low bits between engine and oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

_US = 1_000_000


def _ts_us(s: pd.Series) -> np.ndarray:
    """Timestamps → int64 microseconds (driver parquet is us-precision,
    so the cast is exact; ns inputs truncate identically on both legs
    of any comparison)."""
    return s.to_numpy().astype("datetime64[us]").astype(np.int64)


def sessionize(
    events: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_s: int = 1800,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Gap-based sessionization: a new session starts when the time
    since the key's previous event exceeds ``gap_s`` (strictly).
    Returns one row per session:
    (key, session_seq, session_start, session_end, duration_s,
    n_events, sum_value) with ``session_seq`` numbering each key's
    sessions 1..n in time order.

    The classic streaming-session-window semantics expressed as a batch
    operator: hash-partition by key, per-bucket vectorized
    sort → boundary flags → per-key cumsum → grouped aggregate."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    gap_us = int(gap_s) * _US

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        n = len(g)
        ti = _ts_us(g[ts_col])
        u = g[key].to_numpy()
        boundary = np.ones(n, dtype=bool)
        if n > 1:
            boundary[1:] = (u[1:] != u[:-1]) | ((ti[1:] - ti[:-1]) > gap_us)
        g = g.assign(
            _b=boundary.astype(np.int64),
            _vfp=np.round(g[value_col].to_numpy(dtype=np.float64) * 1e4).astype(
                np.int64
            ),
        )
        g["session_seq"] = g.groupby(key, sort=False)["_b"].cumsum()
        out = (
            g.groupby([key, "session_seq"], sort=False)
            .agg(
                session_start=(ts_col, "min"),
                session_end=(ts_col, "max"),
                n_events=(id_col, "size"),
                _sum_fp=("_vfp", "sum"),
            )
            .reset_index()
        )
        # boundary-crossing semantics (truncate each endpoint to the
        # second, then diff) — matches SQL date_diff('second', a, b),
        # NOT floor(microsecond delta / 1e6)
        out["duration_s"] = (
            _ts_us(out["session_end"]) // _US - _ts_us(out["session_start"]) // _US
        )
        out["sum_value"] = out["_sum_fp"].to_numpy(dtype=np.int64) / 1e4
        out["n_events"] = out["n_events"].astype(np.int64)
        out["session_seq"] = out["session_seq"].astype(np.int64)
        return out[
            [
                key,
                "session_seq",
                "session_start",
                "session_end",
                "duration_s",
                "n_events",
                "sum_value",
            ]
        ]

    cols = [key, ts_col, id_col, value_col]
    return bucketed_group_reduce(
        events.select_columns(cols),
        key_cols=[key],
        reduce_fn=reduce_fn,
        num_buckets=num_buckets,
    )


def asof_join(
    left: "rd.Dataset",
    right: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """As-of join: for every left event, the single most recent right
    event of the SAME key with ``right.ts <= left.ts`` (inclusive);
    ties on right ts break to the larger right ``id_col``. Inner
    semantics — left events with no prior right event are dropped
    (keeps the output NULL-free for cross-engine hashing). Returns
    (event_id, key, ts, prior_event_id, prior_ts, lag_s).

    One bucketed shuffle co-partitions both sides by key (sides are
    tagged and unioned so the exchange happens once); in the bucket the
    join is the textbook vectorized merge: sort by
    (key, ts, side, id) with right-before-left at equal ts, group-wise
    forward-fill of the right payload, then keep left rows. No
    searchsorted per left row, no Python per-event work."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key: df[key].astype(np.int64),
                ts_col: df[ts_col],
                id_col: df[id_col].astype(np.int64),
                "_side": np.ones(len(df), dtype=np.int8),
                # nullable Int64 (not float64): ids above 2^53 would lose
                # precision riding a float column through the exchange
                "_r_id": pd.Series([pd.NA] * len(df), dtype="Int64"),
                "_r_ts": pd.Series(
                    [pd.NaT] * len(df), dtype=df[ts_col].dtype
                ),
            }
        )

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key: df[key].astype(np.int64),
                ts_col: df[ts_col],
                id_col: df[id_col].astype(np.int64),
                "_side": np.zeros(len(df), dtype=np.int8),
                "_r_id": df[id_col].astype("Int64"),
                "_r_ts": df[ts_col],
            }
        )

    both = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas")
    )

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        # right (_side=0) sorts before left at equal ts → inclusive <=;
        # rights at equal ts sort by id asc → ffill keeps the max id
        g = g.sort_values([key, ts_col, "_side", id_col], kind="mergesort")
        g[["_r_id", "_r_ts"]] = g.groupby(key, sort=False)[["_r_id", "_r_ts"]].ffill()
        out = g[(g["_side"] == 1) & g["_r_id"].notna()]
        # second-truncated diff, matching SQL date_diff('second', ...)
        lag = _ts_us(out[ts_col]) // _US - _ts_us(out["_r_ts"]) // _US
        return pd.DataFrame(
            {
                "event_id": out[id_col].to_numpy(dtype=np.int64),
                key: out[key].to_numpy(dtype=np.int64),
                ts_col: out[ts_col].to_numpy(),
                "prior_event_id": out["_r_id"].to_numpy(dtype=np.int64),
                "prior_ts": out["_r_ts"].to_numpy(),
                "lag_s": lag,
            }
        )

    return bucketed_group_reduce(
        both, key_cols=[key], reduce_fn=reduce_fn, num_buckets=num_buckets
    )


def range_join(
    points: "rd.Dataset",
    intervals: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    start_col: str = "session_start",
    end_col: str = "session_end",
    interval_id_col: str = "session_seq",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Inner range join: every (point, interval) pair with the same key
    and ``start <= ts <= end`` (both inclusive). Intervals MAY overlap —
    a point matches each covering interval. Returns
    (id_col, key, ts_col, interval_id_col).

    Same one-exchange layout as :func:`asof_join` (sides tagged and
    unioned, bucketed on the key); in the bucket, points are sorted by
    ts per key and each key's intervals locate their point range with
    two searchsorted calls, emitting matches via the repeat/arange
    segment trick. The loop is per KEY (an interval-owner granularity
    the shuffle already created), never per point or per interval —
    inner work is all numpy."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def tag_points(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key: df[key].astype(np.int64),
                "_t0": _ts_us(df[ts_col]),
                "_t1": np.zeros(len(df), dtype=np.int64),
                "_id": df[id_col].astype(np.int64),
                "_side": np.ones(len(df), dtype=np.int8),
            }
        )

    def tag_intervals(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key: df[key].astype(np.int64),
                "_t0": _ts_us(df[start_col]),
                "_t1": _ts_us(df[end_col]),
                "_id": df[interval_id_col].astype(np.int64),
                "_side": np.zeros(len(df), dtype=np.int8),
            }
        )

    both = points.map_batches(tag_points, batch_format="pandas").union(
        intervals.map_batches(tag_intervals, batch_format="pandas")
    )

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        out_id, out_key, out_ts, out_iv = [], [], [], []
        pts = g[g["_side"] == 1]
        ivs = g[g["_side"] == 0]
        if len(pts) and len(ivs):
            pts = pts.sort_values([key, "_t0"], kind="mergesort")
            pk = pts[key].to_numpy()
            pt = pts["_t0"].to_numpy()
            pid = pts["_id"].to_numpy()
            for k_val, iv in ivs.groupby(key, sort=False):
                ks = np.searchsorted(pk, k_val, "left")
                ke = np.searchsorted(pk, k_val, "right")
                if ks == ke:
                    continue
                seg = pt[ks:ke]
                lo = np.searchsorted(seg, iv["_t0"].to_numpy(), "left")
                hi = np.searchsorted(seg, iv["_t1"].to_numpy(), "right")
                cnt = np.maximum(hi - lo, 0)
                tot = int(cnt.sum())
                if tot == 0:
                    continue
                # point index per match: arange reset per interval + lo
                cum = np.concatenate(([0], np.cumsum(cnt)))
                p_idx = (
                    np.arange(tot) - np.repeat(cum[:-1], cnt) + np.repeat(lo, cnt) + ks
                )
                out_id.append(pid[p_idx])
                out_key.append(np.full(tot, k_val, dtype=np.int64))
                out_ts.append(pt[p_idx])
                out_iv.append(np.repeat(iv["_id"].to_numpy(), cnt))
        if not out_id:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    key: pd.Series([], dtype="int64"),
                    ts_col: pd.Series([], dtype="datetime64[us]"),
                    interval_id_col: pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                id_col: np.concatenate(out_id),
                key: np.concatenate(out_key),
                ts_col: np.concatenate(out_ts).astype("datetime64[us]"),
                interval_id_col: np.concatenate(out_iv),
            }
        )

    return bucketed_group_reduce(
        both, key_cols=[key], reduce_fn=reduce_fn, num_buckets=num_buckets
    )


def sliding_time_sum(
    ds: "rd.Dataset",
    key_cols: list[str],
    ts_col: str,
    sum_cols: list[str],
    preceding_s: int,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Sliding event-time window sums with RANGE semantics: for every
    input row, each ``sum_cols`` value is summed over the key's rows
    whose timestamp lies in ``[t - preceding_s, t]`` (the SQL
    ``RANGE BETWEEN INTERVAL preceding_s PRECEDING AND CURRENT ROW``),
    emitted as ``w_<col>``. Input is typically a tumbling pre-aggregate
    (e.g. `kgflow.ops.relational.events_hourly`'s hourly rows), so the
    wide work happened BEFORE this operator and the window never re-reads
    raw events — the streaming-engine "window over a rollup" pattern.

    One bucketed shuffle on the key; inside a bucket, keys are contiguous
    segments after one vectorized sort, and each segment resolves all its
    windows with two ``np.searchsorted`` calls over prefix sums — a
    Python loop over KEYS in the bucket (cheap: segments shrink with
    ``num_buckets``), never over rows. Sum columns must be int64
    (exact fixed-point by convention, see module docstring).
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    prec_us = int(preceding_s) * _US

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_cols + [ts_col], kind="mergesort").reset_index(drop=True)
        ti = _ts_us(g[ts_col])
        sums = {c: g[c].to_numpy(dtype=np.int64) for c in sum_cols}
        w = {c: np.empty(len(g), dtype=np.int64) for c in sum_cols}
        if len(g):
            # contiguous key segments after the sort
            kf = pd.MultiIndex.from_frame(g[key_cols]) if len(key_cols) > 1 else None
            kv = kf.to_numpy() if kf is not None else g[key_cols[0]].to_numpy()
            seg_start = np.flatnonzero(
                np.concatenate(([True], kv[1:] != kv[:-1]))
            )
            seg_bounds = np.append(seg_start, len(g))
            for s, e in zip(seg_bounds[:-1], seg_bounds[1:]):
                seg_t = ti[s:e]
                lo = np.searchsorted(seg_t, seg_t - prec_us, "left")
                for c in sum_cols:
                    ps = np.concatenate(([0], np.cumsum(sums[c][s:e])))
                    w[c][s:e] = ps[np.arange(1, e - s + 1)] - ps[lo]
        for c in sum_cols:
            g[f"w_{c}"] = w[c]
        return g

    return bucketed_group_reduce(
        ds, key_cols=key_cols, reduce_fn=reduce_fn, num_buckets=num_buckets
    )


def keyed_window(
    events: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-key ordered window functions in ONE exchange: row_number
    (1..n per key in (ts, id) order), lag seconds since the key's
    previous event (NULL→-1 for the first, kept integer so the column
    stays hash-exact), and the running value sum (exact fixed-point
    int64 accumulation, divided once — cumulative float sums would
    drift between engines).

    Same shape as `sessionize`: hash-partition on the key, in-bucket
    vectorized sort + groupby shift/cumcount/cumsum (all pandas C
    kernels). Returns (key, id, ts, row_number, lag_s, run_value)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        grp = g.groupby(key, sort=False)
        rn = (grp.cumcount() + 1).to_numpy(dtype=np.int64)
        # date_diff('second', …) boundary-crossing semantics: truncate
        # each endpoint to seconds BEFORE subtracting (same convention
        # as sessionize's duration_s)
        ti = _ts_us(g[ts_col])
        prev = grp[ts_col].shift(1)
        lag_s = np.where(
            prev.isna().to_numpy(),
            np.int64(-1),
            ti // _US - _ts_us(prev.fillna(g[ts_col])) // _US,
        ).astype(np.int64)
        v_fp = np.round(g[value_col].to_numpy(dtype=np.float64) * 1e4).astype(
            np.int64
        )
        run = (
            pd.Series(v_fp, index=g.index).groupby(g[key], sort=False).cumsum()
        ).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                key: g[key].to_numpy(),
                id_col: g[id_col].to_numpy(),
                ts_col: g[ts_col].to_numpy(),
                "row_number": rn,
                "lag_s": lag_s,
                "run_value": run / 1e4,
            }
        )

    cols = [key, ts_col, id_col, value_col]
    return bucketed_group_reduce(
        events.select_columns(cols),
        key_cols=[key],
        reduce_fn=reduce_fn,
        num_buckets=num_buckets,
    )


def ranked_window(
    events: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Rank-family window functions per key, ONE exchange (the
    complement of `keyed_window`'s offset family):

    - ``val_rank`` / ``val_dense_rank``: RANK() / DENSE_RANK() over the
      key partition ordered by fixed-point value DESC — ties share a
      rank, so the output is deterministic without a tie-break column;
    - ``lead_s``: seconds until the key's NEXT event in (ts, id) order
      (-1 for the last; date_diff boundary-crossing semantics — truncate
      both endpoints to seconds before subtracting);
    - ``mov3_value``: SUM(value) OVER (... ROWS BETWEEN 2 PRECEDING AND
      CURRENT ROW) — computed as the difference of two exact int64
      fixed-point cumsums, divided once at emit.

    Same scale shape as `keyed_window`: hash-partition on the key, all
    in-bucket work is pandas/numpy C kernels (sort, grouped rank, shift,
    cumsum)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        grp = g.groupby(key, sort=False)
        vfp = pd.Series(
            np.round(g[value_col].to_numpy(dtype=np.float64) * 1e4).astype(
                np.int64
            ),
            index=g.index,
        )
        by_key = vfp.groupby(g[key], sort=False)
        rnk = by_key.rank(method="min", ascending=False).to_numpy(np.int64)
        drnk = by_key.rank(method="dense", ascending=False).to_numpy(np.int64)
        ti = _ts_us(g[ts_col])
        nxt = grp[ts_col].shift(-1)
        lead_s = np.where(
            nxt.isna().to_numpy(),
            np.int64(-1),
            _ts_us(nxt.fillna(g[ts_col])) // _US - ti // _US,
        ).astype(np.int64)
        run = by_key.cumsum().to_numpy(np.int64)
        # cumsum shifted 3 within the key = sum through row i-3, so the
        # difference is exactly rows i-2..i (2 PRECEDING .. CURRENT ROW)
        prev3 = (
            pd.Series(run, index=g.index)
            .groupby(g[key], sort=False)
            .shift(3)
            .fillna(0)
            .to_numpy(np.int64)
        )
        return pd.DataFrame(
            {
                key: g[key].to_numpy(),
                id_col: g[id_col].to_numpy(),
                ts_col: g[ts_col].to_numpy(),
                "val_rank": rnk,
                "val_dense_rank": drnk,
                "lead_s": lead_s,
                "mov3_value": (run - prev3) / 1e4,
            }
        )

    cols = [key, ts_col, id_col, value_col]
    return bucketed_group_reduce(
        events.select_columns(cols),
        key_cols=[key],
        reduce_fn=reduce_fn,
        num_buckets=num_buckets,
    )


def distribution_window(
    events: "rd.Dataset",
    key: str = "user_id",
    id_col: str = "event_id",
    value_col: str = "value",
    tiles: int = 4,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Distribution-family window functions per key, ONE exchange (the
    third member of the `keyed_window` / `ranked_window` family):
    NTILE(tiles), PERCENT_RANK() and CUME_DIST() over
    (PARTITION BY key ORDER BY value DESC, id) →
    (key, id, tile, pct_rank, cume_dist).

    The ordering includes ``id_col`` so it is TOTAL: no peers means
    rank == row_number, so pct_rank = (rn−1)/(n−1) and cume_dist = rn/n
    are single IEEE divisions of exact integers — bit-identical to any
    SQL engine evaluating the same window. The sort compares RAW float
    values (comparison is exact; no fixed-point rounding that could
    reorder near-ties differently from SQL). NTILE uses the standard
    front-loaded split: the first n % tiles groups get ⌈n/tiles⌉ rows.

    Same scale shape as the siblings: hash-partition on the key, all
    in-bucket work vectorized (sort, transform-size, cumcount, integer
    arithmetic)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [key, value_col, id_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        grp = g.groupby(key, sort=False)
        n = grp[id_col].transform("size").to_numpy(np.int64)
        rn = grp.cumcount().to_numpy(np.int64) + 1
        pct_rank = np.where(n > 1, (rn - 1) / np.maximum(n - 1, 1), 0.0)
        cume_dist = rn / n
        q, r = n // tiles, n % tiles
        cut = r * (q + 1)
        tile = (
            np.where(
                rn <= cut,
                (rn - 1) // np.maximum(q + 1, 1),
                r + (rn - 1 - cut) // np.maximum(q, 1),
            ).astype(np.int64)
            + 1
        )
        return pd.DataFrame(
            {
                key: g[key].to_numpy(),
                id_col: g[id_col].to_numpy(),
                "tile": tile,
                "pct_rank": pct_rank,
                "cume_dist": cume_dist,
            }
        )

    return bucketed_group_reduce(
        events.select_columns([key, id_col, value_col]),
        key_cols=[key],
        reduce_fn=reduce_fn,
        num_buckets=num_buckets,
    )


def boundary_window(
    events: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """FIRST_VALUE / LAST_VALUE per key over the (ts, id) total order —
    (key, first_event_id, last_event_id, first_value, last_value,
    n_events). The values are picked raw (no arithmetic), so the output
    hashes exactly against SQL arg_min/arg_max on the same struct key.

    Combiner shape: first/last is a semigroup, so each block reduces to
    ≤ one row per key BEFORE the exchange — the shuffle carries
    blocks × keys-per-block rows, never the event stream."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def fl(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        grp = g.groupby(key, sort=False)
        first = grp.first().reset_index()
        last = grp.last().reset_index()
        n = grp.size().to_numpy(np.int64)
        return pd.DataFrame(
            {
                key: first[key].to_numpy(),
                ts_col + "_first": first[ts_col].to_numpy(),
                id_col + "_first": first[id_col].to_numpy(dtype=np.int64),
                value_col + "_first": first[value_col].to_numpy(),
                ts_col + "_last": last[ts_col].to_numpy(),
                id_col + "_last": last[id_col].to_numpy(dtype=np.int64),
                value_col + "_last": last[value_col].to_numpy(),
                "n_events": n,
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return fl(df)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # partials carry (first*, last*) halves; re-pick across partials
        firsts = g[
            [key, ts_col + "_first", id_col + "_first", value_col + "_first"]
        ].rename(
            columns={
                ts_col + "_first": ts_col,
                id_col + "_first": id_col,
                value_col + "_first": value_col,
            }
        )
        lasts = g[
            [key, ts_col + "_last", id_col + "_last", value_col + "_last"]
        ].rename(
            columns={
                ts_col + "_last": ts_col,
                id_col + "_last": id_col,
                value_col + "_last": value_col,
            }
        )
        fs = firsts.sort_values([key, ts_col, id_col], kind="mergesort")
        ls = lasts.sort_values([key, ts_col, id_col], kind="mergesort")
        f1 = fs.groupby(key, sort=False).first().reset_index()
        l1 = ls.groupby(key, sort=False).last().reset_index()
        # sort=True: f1/l1 are key-ascending (mergesort on [key, ...]),
        # so the count series must be key-ascending too, not
        # first-appearance order
        n = g.groupby(key)["n_events"].sum().to_numpy(np.int64)
        return pd.DataFrame(
            {
                key: f1[key].to_numpy(),
                "first_event_id": f1[id_col].to_numpy(dtype=np.int64),
                "last_event_id": l1[id_col].to_numpy(dtype=np.int64),
                "first_value": f1[value_col].to_numpy(),
                "last_value": l1[value_col].to_numpy(),
                "n_events": n,
            }
        )

    cols = [key, ts_col, id_col, value_col]
    partials = events.select_columns(cols).map_batches(
        combine, batch_format="pandas"
    )
    return bucketed_group_reduce(
        partials, key_cols=[key], reduce_fn=merge, num_buckets=num_buckets
    )


def merge_intervals(
    intervals: "rd.Dataset",
    key: str = "user_id",
    start_col: str = "s",
    end_col: str = "e",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Coalesce overlapping/touching [start, end] intervals per key
    (SQL's gaps-and-islands): ONE bucketed exchange on the key, then a
    vectorized in-bucket island scan — sort by (start, end), a new
    island begins where start exceeds the running max of all PREVIOUS
    ends in the key (grouped shifted cummax, a pandas C kernel over
    exact int64 microseconds), island ids are the flag cumsum, and one
    grouped aggregate emits (key, interval_start, interval_end,
    n_merged).

    Touching intervals (start == previous max end) MERGE — the island
    test is strict ``>``, mirrored by the oracle. Timestamps and counts
    are integer-exact, so the output is hash-checkable with no float
    scaling."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, start_col, end_col], kind="mergesort")
        s = _ts_us(g[start_col])
        e = _ts_us(g[end_col])
        keys = g[key].to_numpy()
        by_key = pd.Series(e, index=g.index).groupby(g[key], sort=False)
        prev_max_e = by_key.cummax().shift(1)
        first_of_key = np.empty(len(g), dtype=bool)
        if len(g):
            first_of_key[0] = True
        first_of_key[1:] = keys[1:] != keys[:-1]
        # shift(1) crosses key boundaries; the first row of each key is
        # an island start unconditionally, so mask it rather than trust
        # the leaked value
        island_start = first_of_key | (
            s > prev_max_e.fillna(np.iinfo(np.int64).min).to_numpy(np.int64)
        )
        out = pd.DataFrame(
            {
                key: keys,
                "__island": np.cumsum(island_start),
                start_col: g[start_col].to_numpy(),
                end_col: g[end_col].to_numpy(),
            }
        )
        agg = out.groupby([key, "__island"], as_index=False, sort=False).agg(
            interval_start=(start_col, "min"),
            interval_end=(end_col, "max"),
            n_merged=(start_col, "size"),
        )
        agg["n_merged"] = agg["n_merged"].astype(np.int64)
        return agg[[key, "interval_start", "interval_end", "n_merged"]]

    return bucketed_group_reduce(
        intervals.select_columns([key, start_col, end_col]),
        key_cols=[key],
        reduce_fn=reduce_fn,
        num_buckets=num_buckets,
    )


def funnel_counts(
    events: "rd.Dataset",
    steps: list[str],
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int | None = None,
) -> "pd.DataFrame":
    """Sequential conversion funnel: how many users performed
    steps[0], then steps[1] STRICTLY AFTER their first steps[0], then
    steps[2] strictly after that first qualifying steps[1], … (the
    classic min-timestamp-chaining funnel). Returns the tiny
    (step_no, step, n_users) summary frame — one row per step.

    Scale shape: each stage is (vectorized type filter) → attach the
    previous stage's first-qualifying timestamp via `hash_join`
    (user-bounded right side, auto broadcast-vs-shuffle) → strict-after
    filter → per-user MIN through ONE user-keyed bucketed reduce with
    a per-block min combiner. The stage frontier (user, t) is
    user-bounded and materialized so the next join's size probe and the
    count reuse its blocks; the raw event stream is never materialized.
    Ties on ts break by event id, so "strictly after" is a total-order
    comparison on (ts, id) — deterministic under equal timestamps.
    """
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce

    def first_per_user(ds: "rd.Dataset") -> "rd.Dataset":
        def combiner(d: pd.DataFrame) -> pd.DataFrame:
            return (
                d.sort_values([user_col, ts_col, id_col], kind="mergesort")
                .groupby(user_col, as_index=False, sort=False)
                .first()
            )

        return bucketed_group_reduce(
            ds.map_batches(combiner, batch_format="pandas"),
            key_cols=[user_col],
            reduce_fn=combiner,
            num_buckets=num_buckets,
        )

    import pyarrow as pa
    import pyarrow.compute as pc_

    def type_filter(step: str):
        def f(batch: "pa.Table") -> "pa.Table":
            out = batch.filter(pc_.equal(batch.column(type_col), step))
            return out.select([user_col, ts_col, id_col])

        return f

    rows = []
    cur = None  # (user_col, _t, _i): first qualifying event of the prior step
    for step_no, step in enumerate(steps, start=1):
        ev = events.select_columns(
            [user_col, ts_col, id_col, type_col]
        ).map_batches(type_filter(step), batch_format="pyarrow")
        if cur is not None:
            ev = hash_join(ev, cur, on=user_col, num_buckets=num_buckets)

            def after(d: pd.DataFrame) -> pd.DataFrame:
                ts = d[ts_col]
                keep = (ts > d["_t"]) | ((ts == d["_t"]) & (d[id_col] > d["_i"]))
                return d.loc[keep, [user_col, ts_col, id_col]]

            ev = ev.map_batches(after, batch_format="pandas")
        cur = first_per_user(ev).map_batches(
            lambda d: d.rename(columns={ts_col: "_t", id_col: "_i"}),
            batch_format="pandas",
        ).materialize()  # user-bounded frontier, reused by join + count
        rows.append(
            {"step_no": np.int64(step_no), "step": step, "n_users": np.int64(cur.count())}
        )
    return pd.DataFrame(rows)


def cohort_retention(
    events: "rd.Dataset",
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Weekly cohort retention: users are cohorted by the Monday-start
    week of their FIRST event; the output counts, for every
    (cohort_week, week_no) cell, how many of that cohort's users were
    active week_no weeks after their cohort week — the standard
    retention triangle.

    Scale shape: (user, week) activity pairs are deduped with a
    per-block drop_duplicates combiner before ONE user-week-keyed
    exchange; the per-user MIN cohort week rides a second user-keyed
    reduce (user-bounded output, materialized for the join probe); the
    cohort attach is `hash_join` auto broadcast-vs-shuffle; the final
    (cohort_week, week_no) count is combiner-reduced. Week arithmetic
    is integer-exact (truncated timestamps differ by whole days; //7),
    so the oracle comparison has no float in it.
    """
    import pyarrow as pa
    import pyarrow.compute as pc_

    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce

    def add_week(batch: "pa.Table") -> "pa.Table":
        w = pc_.floor_temporal(batch.column(ts_col), unit="week")
        return pa.table({user_col: batch.column(user_col), "week": w})

    weekly = events.select_columns([user_col, ts_col]).map_batches(
        add_week, batch_format="pyarrow"
    )

    def dedup(d: pd.DataFrame) -> pd.DataFrame:
        return d.drop_duplicates([user_col, "week"])

    act = bucketed_group_reduce(
        weekly.map_batches(dedup, batch_format="pandas"),
        key_cols=[user_col, "week"],
        reduce_fn=dedup,
        num_buckets=num_buckets,
    )

    def min_week_partial(d: pd.DataFrame) -> pd.DataFrame:
        out = d.groupby(user_col, as_index=False)["week"].min()
        return out.rename(columns={"week": "cohort_week"})

    def min_week_final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(user_col, as_index=False)["cohort_week"].min()

    cohort = bucketed_group_reduce(
        act.map_batches(min_week_partial, batch_format="pandas"),
        key_cols=[user_col],
        reduce_fn=min_week_final,
        num_buckets=num_buckets,
    ).materialize()  # user-bounded; reused by the join's size probe

    joined = hash_join(act, cohort, on=user_col, num_buckets=num_buckets)

    def cell_partial(d: pd.DataFrame) -> pd.DataFrame:
        wn = ((d["week"] - d["cohort_week"]).dt.days // 7).astype("int64")
        out = (
            d.assign(week_no=wn)
            .groupby(["cohort_week", "week_no"], as_index=False)
            .size()
            .rename(columns={"size": "n_users"})
        )
        out["n_users"] = out["n_users"].astype("int64")
        return out

    def cell_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["cohort_week", "week_no"], as_index=False)["n_users"].sum()
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return bucketed_group_reduce(
        joined.map_batches(cell_partial, batch_format="pandas"),
        key_cols=["cohort_week", "week_no"],
        reduce_fn=cell_sum,
        num_buckets=num_buckets,
    )


def path_ngrams(
    events: "rd.Dataset",
    n: int = 3,
    k: int = 25,
    group_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    val_col: str = "event_type",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Sequence mining: the top-``k`` most frequent length-``n``
    CONSECUTIVE event subsequences across all per-key ordered event
    streams (the "common user journey" query). Output columns
    g0..g{n-1} (the gram) + count ``cnt``, (cnt DESC, gram ASC) order.

    Scale shape: like `ordered_collect`, the per-key ordered stream
    must co-locate once (order-dependence admits no pre-shrink
    combiner), so the raw (key, order, val) rows ride ONE key-bucketed
    exchange; inside a bucket ONE whole-bucket sort + shifted-array
    masks emit every gram vectorized (key boundaries masked out — no
    per-key Python), pre-counted per bucket before the (gram)-keyed
    count reduce; the final global top-k is the `global_topk`
    semigroup.
    """
    from kgflow.ops.shuffle import bucketed_group_reduce, global_topk

    gcols = [f"g{i}" for i in range(n)]

    def grams(d: pd.DataFrame) -> pd.DataFrame:
        if len(d) < n:
            return pd.DataFrame(
                {c: pd.Series([], dtype=object) for c in gcols}
                | {"cnt": pd.Series([], dtype="int64")}
            )
        d = d.sort_values([group_col, *order_cols], kind="mergesort")
        u = d[group_col].to_numpy()
        v = d[val_col].to_numpy()
        m = len(d) - (n - 1)
        same = np.ones(m, dtype=bool)
        for i in range(1, n):
            same &= u[:m] == u[i : i + m]
        cols = {f"g{i}": v[i : i + m][same] for i in range(n)}
        out = (
            pd.DataFrame(cols)
            .groupby(gcols, as_index=False, sort=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        out["cnt"] = out["cnt"].astype("int64")
        return out

    per_key = bucketed_group_reduce(
        events.select_columns([group_col, *order_cols, val_col]),
        key_cols=[group_col],
        reduce_fn=grams,
        num_buckets=num_buckets,
    )

    def cnt_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(gcols, as_index=False)["cnt"].sum()
        out["cnt"] = out["cnt"].astype("int64")
        return out

    counts = bucketed_group_reduce(
        per_key, key_cols=gcols, reduce_fn=cnt_sum, num_buckets=num_buckets
    )
    return global_topk(
        counts,
        sort_cols=["cnt", *gcols],
        ascending=[False] + [True] * n,
        k=k,
        num_buckets=num_buckets,
    )


def gap_quantiles(
    events: "rd.Dataset",
    partition_cols: tuple[str, ...] = ("user_id", "event_type"),
    group_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Inter-arrival-time quantiles: per ``partition_cols`` stream
    (default: each user's events of one type, ordered by (ts, id)),
    the gap in whole seconds to the previous event, then EXACT
    nearest-rank quantiles of those gaps per ``group_col`` — the
    cadence profile behind rate-limit tuning and bot detection.

    Gaps use the date_diff('second') convention (truncate both
    endpoints to seconds before subtracting — same as `sessionize`),
    so they are exact int64 and the quantiles reproduce bit-identically
    in SQL. Scale shape: ONE partition-keyed exchange computes deltas
    (in-bucket mergesort + groupby shift, C kernels), then the
    combiner-reduced `grouped_quantiles` histogram machinery at
    scale=1 (integer domain)."""
    from kgflow.ops.profile import grouped_quantiles
    from kgflow.ops.shuffle import bucketed_group_reduce

    pcols = list(partition_cols)

    def deltas(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    group_col: pd.Series([], dtype="object"),
                    "gap_s": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(pcols + [ts_col, id_col], kind="mergesort")
        sec = pd.Series(_ts_us(g[ts_col]) // 1_000_000, index=g.index)
        prev = sec.groupby([g[c] for c in pcols], sort=False).shift(1)
        mask = prev.notna().to_numpy()
        gap = (sec.to_numpy()[mask] - prev.to_numpy()[mask]).astype(np.int64)
        return pd.DataFrame(
            {group_col: g[group_col].to_numpy()[mask], "gap_s": gap}
        )

    cols = list(dict.fromkeys(pcols + [group_col, ts_col, id_col]))
    d = bucketed_group_reduce(
        events.select_columns(cols),
        key_cols=pcols,
        reduce_fn=deltas,
        num_buckets=num_buckets,
    )
    return grouped_quantiles(d, [group_col], "gap_s", qs=qs, scale=1,
                             num_buckets=num_buckets)


def transition_counts(
    events: "rd.Dataset",
    partition_col: str = "user_id",
    cat_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """First-order Markov transition counts: per ``partition_col``
    stream ordered by (ts, id), count every adjacent (from_cat, to_cat)
    pair — the empirical transition matrix behind next-event
    prediction, journey analysis and sequence anomaly scoring (the
    event-stream cousin of ``text.bigram_successors``).

    Output: (from_cat, to_cat, n). Scale shape: ONE partition-keyed
    exchange computes adjacencies (in-bucket mergesort + groupby shift,
    C kernels) and COMBINES them to distinct-pair partials before
    leaving the task, then a category²-bounded pair-keyed sum — no
    exchange ever carries event rows twice."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "from_cat": pd.Series([], dtype="object"),
                    "to_cat": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values([partition_col, ts_col, id_col], kind="mergesort")
        cat = g[cat_col].to_numpy(dtype=object)
        part = g[partition_col].to_numpy()
        same = part[:-1] == part[1:]
        t = pd.DataFrame({"from_cat": cat[:-1][same], "to_cat": cat[1:][same]})
        out = t.groupby(["from_cat", "to_cat"], sort=False, as_index=False).size()
        return out.rename(columns={"size": "n"})

    def sum_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["from_cat", "to_cat"], as_index=False)["n"].sum()

    cols = list(dict.fromkeys([partition_col, cat_col, ts_col, id_col]))
    partials = bucketed_group_reduce(
        events.select_columns(cols),
        key_cols=[partition_col],
        reduce_fn=pairs,
        num_buckets=num_buckets,
    )
    return bucketed_group_reduce(
        partials,
        key_cols=["from_cat", "to_cat"],
        reduce_fn=sum_counts,
        num_buckets=num_buckets,
    )


def window_dedup(
    events: "rd.Dataset",
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    id_col: str = "event_id",
    window: str = "day",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """At-least-once log dedup: keep the FIRST event (by (ts, id)) per
    (key, tumbling window) — the standard idempotency repair for
    double-fired telemetry/webhook streams before any downstream count
    trusts the data.

    Output: (key…, win, event_id, ts) of the winners. Scale shape:
    first-per-key is a semigroup min, so each block shrinks to its
    local winners BEFORE the single (key, win)-bucketed exchange; the
    reduce keeps one row per group. Window truncation matches SQL
    date_trunc exactly (microsecond floor arithmetic)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    keys = list(key_cols)
    unit_us = {"hour": 3_600_000_000, "day": 86_400_000_000}[window]
    gcols = keys + ["win"]

    def winners(d: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            return d.assign(win=pd.Series([], dtype="datetime64[us]"))[
                gcols + [id_col, ts_col]
            ]
        win = (_ts_us(d[ts_col]) // unit_us * unit_us).astype(
            "datetime64[us]"
        )
        d = d.assign(win=win)
        d = d.sort_values(gcols + [ts_col, id_col], kind="mergesort")
        return d.drop_duplicates(gcols)[gcols + [id_col, ts_col]]

    combined = events.select_columns(
        list(dict.fromkeys(keys + [ts_col, id_col]))
    ).map_batches(winners, batch_format="pandas")
    return bucketed_group_reduce(
        combined, key_cols=gcols, reduce_fn=winners, num_buckets=num_buckets
    )


def rolling_window_distinct(
    events: "rd.Dataset",
    day_col: str = "ts",
    user_col: str = "user_id",
    window_days: int = 7,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Rolling N-day distinct users (WAU/MAU-style): for every day
    present in the data, the count of distinct users active in the
    window [day − N + 1, day]. Distinct-over-a-sliding-window does NOT
    decompose into daily sums, so the engine expands each distinct
    (day, user) pair into its ≤ N member windows and reuses the exact
    `grouped_distinct_count` machinery — the expansion is bounded by
    N × |distinct user-days|, never N × |events|.

    Scale shape: per-block distinct (day, user) combiner → one
    (day, user)-keyed dedup exchange → ×N window explode (filtered to
    days that exist, broadcast as a calendar-bounded set) →
    `grouped_distinct_count`'s spread-bucketed exact count."""
    from kgflow.ops.shuffle import bucketed_group_reduce, grouped_distinct_count

    def day_pairs(d: pd.DataFrame) -> pd.DataFrame:
        day = (_ts_us(d[day_col]) // 86_400_000_000 * 86_400_000_000).astype(
            "datetime64[us]"
        )
        return pd.DataFrame({"d": day, user_col: d[user_col]}).drop_duplicates()

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    pairs = bucketed_group_reduce(
        events.select_columns([day_col, user_col]).map_batches(
            day_pairs, batch_format="pandas"
        ),
        key_cols=["d", user_col],
        reduce_fn=dd,
        num_buckets=num_buckets,
    ).materialize()  # consumed twice: day-set probe + window explode

    # the distinct-day set is calendar-bounded (≤ N_days rows) — the
    # documented domain-bounded driver pull (pivot-guard convention)
    days = np.sort(
        pairs.select_columns(["d"])
        .map_batches(lambda d: d.drop_duplicates(), batch_format="pandas")
        .to_pandas()["d"]
        .unique()
    )
    days_ref = ray.put(set(pd.to_datetime(days)))

    class Explode:
        def __init__(self):
            self.days = ray.get(days_ref)

        def __call__(self, d: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for i in range(window_days):
                # Timedelta arithmetic upcasts to ns — pin back to us
                # so the output dtype matches the SQL timestamp grain
                w = (d["d"] + pd.Timedelta(days=i)).astype("datetime64[us]")
                keep = w.isin(self.days)
                outs.append(
                    pd.DataFrame(
                        {
                            "win_day": w[keep],
                            user_col: d.loc[keep, user_col],
                        }
                    )
                )
            return pd.concat(outs, ignore_index=True)

    exploded = pairs.map_batches(Explode, batch_format="pandas", concurrency=(1, 4))
    return grouped_distinct_count(
        exploded, ["win_day"], user_col, out_col="n_users",
        num_buckets=num_buckets,
    )


def new_users_daily(
    events: "rd.Dataset",
    ts_col: str = "ts",
    user_col: str = "user_id",
    group_cols: list[str] | None = None,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Growth accounting: per day, the count of FIRST-SEEN users and
    the running cumulative distinct-user total — the new-vs-returning
    split every growth dashboard opens with. Cumulative distinct
    decomposes exactly through first-touch attribution: each user
    contributes once, on their min-day.

    With ``group_cols`` the same machinery yields per-group ADOPTION
    curves (first day each user used each feature / product / type),
    cumulated within the group.

    Scale shape: min-day per (group, user) is a semigroup min
    (per-block combiner → ONE keyed reduce); new-user counts are
    (group × day)-bounded; the running sum assembles per group in
    calendar-bounded buckets (days, not users)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    gcols = list(group_cols or [])
    ucols = gcols + [user_col]

    def first_partial(d: pd.DataFrame) -> pd.DataFrame:
        day = (_ts_us(d[ts_col]) // 86_400_000_000 * 86_400_000_000).astype(
            "datetime64[us]"
        )
        t = d[ucols].assign(d=day)
        return t.groupby(ucols, as_index=False, sort=False).min()

    first = bucketed_group_reduce(
        events.select_columns([ts_col] + ucols).map_batches(
            first_partial, batch_format="pandas"
        ),
        key_cols=ucols,
        reduce_fn=lambda g: g.groupby(ucols, as_index=False).min(),
        num_buckets=num_buckets,
    )

    dcols = gcols + ["d"]

    def day_partial(d: pd.DataFrame) -> pd.DataFrame:
        out = d.groupby(dcols, as_index=False, sort=False).size()
        return out.rename(columns={"size": "n_new"})

    counts = bucketed_group_reduce(
        first.map_batches(day_partial, batch_format="pandas"),
        key_cols=dcols,
        reduce_fn=lambda g: g.groupby(dcols, as_index=False)["n_new"].sum(),
        num_buckets=num_buckets,
    )

    def cum(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(gcols + ["d"], kind="mergesort")
        n = g["n_new"].to_numpy(dtype=np.int64)
        if gcols:
            cs = g.groupby(gcols, sort=False)["n_new"].cumsum().to_numpy(
                dtype=np.int64
            )
        else:
            cs = n.cumsum()
        out = g[gcols].copy()
        out["day"] = g["d"].to_numpy()
        out["n_new"] = n
        out["cum_users"] = cs
        return out

    if gcols:
        return bucketed_group_reduce(
            counts, key_cols=gcols, reduce_fn=cum, num_buckets=num_buckets
        )

    def tag0(d: pd.DataFrame) -> pd.DataFrame:
        return d.assign(_g=np.int64(0))

    return bucketed_group_reduce(
        counts.map_batches(tag0, batch_format="pandas"),
        key_cols=["_g"],
        reduce_fn=cum,
        num_buckets=1,
    )


def interval_concurrency_daily(
    ds: "rd.Dataset",
    start_col: str = "ts",
    duration_min: int = 30,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-day MAX concurrency of fixed-duration intervals — the
    sweep-line / distributed-prefix-sum operator (how many sessions are
    live at once; capacity planning's first question). Each row opens
    an interval [start, start+duration); concurrency at a boundary is
    the running sum of +1/−1 deltas in (t, delta) order.

    Scale shape — an ordered prefix sum is NOT a groupby, so it gets
    the classic two-pass range decomposition:

    1. boundaries (2 rows/input, 16 B each) get a TIME-RANGE bucket
       (equal-width over the global [min,max] from one 2-scalar
       pre-pass — equal timestamps always co-bucket);
    2. pass A: per-bucket Σdelta (bucket-count-bounded) pulls to the
       driver, whose exclusive prefix gives each bucket its entry
       offset;
    3. pass B: ONE bucketed exchange; inside each bucket a vectorized
       (t, delta) mergesort + cumsum + offset yields exact global
       concurrency, reduced to per-day max partials in place;
    4. a final days-bounded max reduce.

    Determinism: ends (−1) order before starts (+1) at equal t, and
    within an equal (t, delta) run the prefix multiset is permutation-
    invariant, so the per-day max is engine-independent — the SQL
    window `SUM(delta) OVER (ORDER BY t, delta)` reproduces it
    bit-exactly."""
    from kgflow.ops.shuffle import bucketed_group_reduce, default_num_buckets

    if num_buckets is None:
        num_buckets = default_num_buckets()
    dur_us = duration_min * 60 * _US
    day_us = 86_400 * _US

    def boundaries(df: pd.DataFrame) -> pd.DataFrame:
        t0 = _ts_us(df[start_col])
        return pd.DataFrame(
            {
                "t": np.concatenate([t0, t0 + dur_us]),
                "delta": np.concatenate(
                    [
                        np.ones(len(t0), dtype=np.int64),
                        -np.ones(len(t0), dtype=np.int64),
                    ]
                ),
            }
        )

    b = ds.map_batches(boundaries, batch_format="pandas").materialize()
    # consumed three times: min/max pre-pass, pass A, pass B

    def minmax_partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["t"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "_g": np.array([0], dtype=np.int64),
                "lo": np.array([t.min() if len(t) else 2**62], dtype=np.int64),
                "hi": np.array([t.max() if len(t) else -(2**62)], dtype=np.int64),
            }
        )

    mm = bucketed_group_reduce(
        b.map_batches(minmax_partial, batch_format="pandas"),
        key_cols=["_g"],
        reduce_fn=lambda g: pd.DataFrame(
            {"lo": [int(g["lo"].min())], "hi": [int(g["hi"].max())]}
        ),
        num_buckets=1,
    ).to_pandas()  # exactly 1 row
    lo, hi = int(mm["lo"].iloc[0]), int(mm["hi"].iloc[0])
    span = max(hi - lo + 1, 1)

    def add_tb(df: pd.DataFrame) -> pd.DataFrame:
        t = df["t"].to_numpy(dtype=np.int64)
        tb = ((t - lo) * num_buckets // span).astype(np.int64)
        return df.assign(_tb=tb)

    tagged = b.map_batches(add_tb, batch_format="pandas")

    # pass A: per-time-bucket delta sums → exclusive prefix offsets
    def sums_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("_tb", as_index=False)["delta"].sum()

    sums = bucketed_group_reduce(
        tagged.map_batches(sums_partial, batch_format="pandas"),
        key_cols=["_tb"],
        reduce_fn=lambda g: g.groupby("_tb", as_index=False)["delta"].sum(),
    ).to_pandas()  # ≤ num_buckets rows — bounded driver pull
    sums = sums.sort_values("_tb")
    offs = dict(
        zip(
            sums["_tb"].to_numpy(dtype=np.int64),
            np.concatenate(
                [[0], np.cumsum(sums["delta"].to_numpy(dtype=np.int64))[:-1]]
            ),
        )
    )
    offs_ref = ray.put(offs)

    # pass B: in-bucket exact prefix + per-day max partials
    def prefix_max(g: pd.DataFrame) -> pd.DataFrame:
        offsets = ray.get(offs_ref)
        outs = []
        for tb, gg in g.groupby("_tb", sort=False):
            gg = gg.sort_values(["t", "delta"], kind="mergesort")
            conc = (
                gg["delta"].to_numpy(dtype=np.int64).cumsum()
                + offsets[int(tb)]
            )
            day = (gg["t"].to_numpy(dtype=np.int64) // day_us) * day_us
            p = pd.DataFrame({"day": day, "conc": conc})
            outs.append(
                p.groupby("day", as_index=False)["conc"].max()
            )
        return pd.concat(outs, ignore_index=True)

    partials = bucketed_group_reduce(
        tagged,
        key_cols=["_tb"],
        reduce_fn=prefix_max,
        num_buckets=num_buckets,
    )

    def day_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("day", as_index=False)["conc"].max()
        return pd.DataFrame(
            {
                "day": out["day"].to_numpy(dtype=np.int64).astype(
                    "datetime64[us]"
                ),
                "max_concurrent": out["conc"].to_numpy(dtype=np.int64),
            }
        )

    return bucketed_group_reduce(
        partials, key_cols=["day"], reduce_fn=day_final
    )


def moving_median(
    events: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window: int = 5,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-key exact moving median of the trailing ``window`` rows in
    (ts, id) order → (key, id, med). A holistic window function: unlike
    sum/avg it has no combiner form, so the exchange ships the raw
    (key, id, ts, value) rows ONCE hash-partitioned on the key and the
    in-bucket kernel is pandas' rolling-median C implementation
    (skiplist-backed, O(n log w) per key) — same one-exchange layout as
    `keyed_window`. Even-width frames interpolate (a+b)/2 in double,
    matching SQL median()/quantile_cont(0.5) window semantics
    bit-for-bit; NULL values are skipped (min_periods=1) exactly as a
    SQL frame median ignores NULLs.
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        med = (
            g.groupby(key, sort=False)[value_col]
            .rolling(window, min_periods=1)
            .median()
            .droplevel(0)
        )
        return pd.DataFrame(
            {
                key: g[key].to_numpy(),
                id_col: g[id_col].to_numpy(),
                "med": med.reindex(g.index).to_numpy(dtype=np.float64),
            }
        )

    return bucketed_group_reduce(
        events.select_columns([key, ts_col, id_col, value_col]),
        key_cols=[key],
        reduce_fn=reduce_fn,
        num_buckets=num_buckets,
    )


def grouped_first_last(
    events: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-key FIRST and LAST row attributes in (ts, id) order →
    (key, first_type, first_value, last_type, last_value). first/last
    IS a semigroup (min/max over the (ts, id) total order), so unlike
    `moving_median` this ships a combiner: each block contributes at
    most its per-key head and tail rows to the ONE keyed exchange —
    ≤ 2 rows/key/block regardless of row count. The in-bucket finish
    repeats the same head/tail pick over the surviving candidates.
    Deterministic because (ts, id) is a total order; restated in SQL
    as two row_number() windows (the DuckDB arg_min-struct limitation
    workaround pinned in FIXTURES.md).
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    cols = [key, ts_col, id_col, type_col, value_col]

    def heads_tails(df: pd.DataFrame) -> pd.DataFrame:
        d = df[cols].sort_values([key, ts_col, id_col], kind="mergesort")
        g = d.groupby(key, sort=False)
        return (
            pd.concat([g.head(1), g.tail(1)])
            .drop_duplicates([key, ts_col, id_col])
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values([key, ts_col, id_col], kind="mergesort")
        gr = d.groupby(key, sort=False)
        f, l = gr.head(1), gr.tail(1)
        return pd.DataFrame(
            {
                key: f[key].to_numpy(),
                "first_type": f[type_col].to_numpy(),
                "first_value": f[value_col].to_numpy(dtype=np.float64),
                "last_type": l[type_col].to_numpy(),
                "last_value": l[value_col].to_numpy(dtype=np.float64),
            }
        )

    return bucketed_group_reduce(
        events.select_columns(cols).map_batches(
            heads_tails, batch_format="pandas"
        ),
        key_cols=[key],
        reduce_fn=finish,
        num_buckets=num_buckets,
    )


def range_window_sum(
    ds: "rd.Dataset",
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    hours: int = 24,
    scale: int = 10_000,
    out_col: str = "range_sum",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """RANGE-frame windowed sum — SUM(value) OVER (PARTITION BY key
    ORDER BY ts RANGE BETWEEN INTERVAL ``hours`` HOURS PRECEDING AND
    CURRENT ROW) — the value-based frame the ROWS-based moving family
    (`keyed_window`, `moving_median`) can't express: the frame holds
    however many rows fall in the time span, and SQL's peer semantics
    (ALL rows with the current row's exact timestamp are in-frame,
    even later-positioned ones) are matched exactly.

    Returns (``id_col``, ``out_col``). Exact: values quantize to int64
    fixed point before the cumulative sum, so the in-bucket prefix-
    difference s = cs[hi] − cs[lo] is integer arithmetic and the ONE
    closing division reproduces SQL bit-for-bit. Scale shape: ONE
    key-bucketed exchange of (key, ts, id, fp) rows; per key the
    kernel is a mergesort + int64 cumsum + two vectorized
    searchsorted calls — no per-row Python, no quadratic window
    re-scan."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    delta = np.timedelta64(hours, "h")

    def shrink(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: df[key_col],
                "_ts": df[ts_col].to_numpy().astype("datetime64[us]"),
                "_id": df[id_col].astype(np.int64),
                "_fp": np.round(
                    df[value_col].to_numpy(dtype=np.float64) * scale
                ).astype(np.int64),
            }
        )

    def window(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, gg in g.groupby(key_col, sort=False):
            gg = gg.sort_values(["_ts", "_id"], kind="mergesort")
            ts = gg["_ts"].to_numpy()
            fp = gg["_fp"].to_numpy()
            cs = np.concatenate(([0], np.cumsum(fp)))
            hi = np.searchsorted(ts, ts, side="right")  # includes peers
            lo = np.searchsorted(ts, ts - delta, side="left")
            outs.append(
                pd.DataFrame(
                    {id_col: gg["_id"].to_numpy(), "_s": cs[hi] - cs[lo]}
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "_s": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    summed = bucketed_group_reduce(
        ds.select_columns([key_col, ts_col, value_col, id_col]).map_batches(
            shrink, batch_format="pandas"
        ),
        key_cols=[key_col],
        reduce_fn=window,
        num_buckets=num_buckets,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                id_col: df[id_col].astype(np.int64),
                out_col: df["_s"].astype(np.float64) / scale,
            }
        )

    return summed.map_batches(finish, batch_format="pandas")


def time_weighted_avg(
    ds: "rd.Dataset",
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    scale: int = 10_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-key time-weighted average — the telemetry/sensor integral:
    each value holds until the NEXT event, so
    twa = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first), computed on
    fixed-point values and microsecond gaps. Keys with a single event
    (or zero span) are dropped, matching the SQL lead()-based replay.

    Exactness: the numerator Σ v_fp·Δµs overflows int64 on
    year-long spans (4.9e6 × 3.2e13 ≈ 1.6e20), so per-key sums
    accumulate in arbitrary-precision Python ints via an object
    ndarray (the q11 cross-multiply pattern); the TWO closing casts +
    divisions mirror the SQL HUGEINT→DOUBLE order exactly. Scale
    shape: ONE key-bucketed exchange of (key, ts, id, v_fp) rows;
    per-key work is one mergesort + vectorized diffs."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def shrink(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: df[key_col],
                "_ts": df[ts_col].to_numpy().astype("datetime64[us]"),
                "_id": df[id_col].astype(np.int64),
                "_fp": np.round(
                    df[value_col].to_numpy(dtype=np.float64) * scale
                ).astype(np.int64),
            }
        )

    def twa(g: pd.DataFrame) -> pd.DataFrame:
        keys, vals = [], []
        for key, gg in g.groupby(key_col, sort=False):
            if len(gg) < 2:
                continue
            gg = gg.sort_values(["_ts", "_id"], kind="mergesort")
            t = gg["_ts"].to_numpy().astype(np.int64)
            v = gg["_fp"].to_numpy()
            dt = np.diff(t)
            den = int(dt.sum())
            if den <= 0:
                continue
            num = int((v[:-1].astype(object) * dt.astype(object)).sum())
            keys.append(key)
            vals.append(float(num) / float(den) / scale)
        return pd.DataFrame(
            {
                key_col: pd.Series(keys, dtype=g[key_col].dtype),
                "twa": pd.Series(vals, dtype="float64"),
            }
        )

    return bucketed_group_reduce(
        ds.select_columns([key_col, ts_col, value_col, id_col]).map_batches(
            shrink, batch_format="pandas"
        ),
        key_cols=[key_col],
        reduce_fn=twa,
        num_buckets=num_buckets,
    )


def running_distinct(
    ds: "rd.Dataset",
    key_col: str,
    value_col: str,
    ts_col: str,
    id_col: str,
    out_col: str = "n_distinct",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-key RUNNING DISTINCT COUNT — at every event, how many
    distinct ``value_col`` values the key has produced so far
    (inclusive; (ts, id) total order). SQL lacks COUNT(DISTINCT) OVER;
    the oracle replays it as a first-occurrence flag (row_number = 1
    per (key, value)) under a cumulative sum, and the engine computes
    exactly that: ONE key-bucketed exchange, in-bucket mergesort +
    vectorized duplicated() mask + per-key cumsum. Returns
    (``id_col``, ``out_col``)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def shrink(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: df[key_col],
                "_v": df[value_col],
                "_ts": df[ts_col].to_numpy().astype("datetime64[us]"),
                "_id": df[id_col].astype(np.int64),
            }
        )

    def run(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    out_col: pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values([key_col, "_ts", "_id"], kind="mergesort")
        first = (~g.duplicated([key_col, "_v"])).to_numpy(np.int64)
        nd = (
            pd.Series(first)
            .groupby(g[key_col].to_numpy(), sort=False)
            .cumsum()
            .to_numpy(np.int64)
        )
        return pd.DataFrame({id_col: g["_id"].to_numpy(), out_col: nd})

    return bucketed_group_reduce(
        ds.select_columns([key_col, value_col, ts_col, id_col]).map_batches(
            shrink, batch_format="pandas"
        ),
        key_cols=[key_col],
        reduce_fn=run,
        num_buckets=num_buckets,
    )


def transition_gap_stats(
    ds: "rd.Dataset",
    key_col: str,
    state_col: str,
    ts_col: str,
    id_col: str,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Semi-Markov transition statistics: for every ordered state pair
    (from_state, to_state) across consecutive events of the same key,
    the transition count AND the total dwell gap in microseconds —
    the time-aware extension of the Markov transition-count operator
    (expected dwell per transition = sum_gap_us / n at the edge).

    Scale shape: ONE key-bucketed exchange; in-bucket per-key
    mergesort + vectorized shift builds consecutive pairs, combined
    to (from, to, n, sum_gap_us) partials per bucket; the final
    reduce is state²-bounded."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def shrink(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: df[key_col],
                "_s": df[state_col],
                "_ts": df[ts_col].to_numpy().astype("datetime64[us]"),
                "_id": df[id_col].astype(np.int64),
            }
        )

    EMPTY = pd.DataFrame(
        {
            "from_state": pd.Series([], dtype="object"),
            "to_state": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64"),
            "sum_gap_us": pd.Series([], dtype="int64"),
        }
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return EMPTY.copy()
        g = g.sort_values([key_col, "_ts", "_id"], kind="mergesort")
        k = g[key_col].to_numpy()
        s = g["_s"].to_numpy()
        t = g["_ts"].to_numpy().astype(np.int64)
        same = k[1:] == k[:-1]
        d = pd.DataFrame(
            {
                "from_state": s[:-1][same],
                "to_state": s[1:][same],
                "gap": (t[1:] - t[:-1])[same],
            }
        )
        out = d.groupby(["from_state", "to_state"], as_index=False).agg(
            n=("gap", "size"), sum_gap_us=("gap", "sum")
        )
        return out.astype({"n": "int64", "sum_gap_us": "int64"})

    per_key = bucketed_group_reduce(
        ds.select_columns([key_col, state_col, ts_col, id_col]).map_batches(
            shrink, batch_format="pandas"
        ),
        key_cols=[key_col],
        reduce_fn=pairs,
        num_buckets=num_buckets,
    )

    return bucketed_group_reduce(
        per_key,
        key_cols=["from_state", "to_state"],
        reduce_fn=lambda g: g.groupby(
            ["from_state", "to_state"], as_index=False
        )[["n", "sum_gap_us"]].sum(),
        num_buckets=num_buckets,
    )


def transition_entropy(
    events: "rd.Dataset",
    partition_col: str = "user_id",
    cat_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-category successor entropy: for each ``from_cat``, the
    Shannon entropy (nats) of its next-event distribution — the
    sequence-predictability signal (0 = deterministic next step, ln(k)
    = uniform over k successors) that flags bot-like deterministic
    streams and ranks categories by journey branching.

    Composes :func:`transition_counts` (ONE partition-keyed exchange,
    category²-bounded output) with a category-bounded per-from_cat
    reduce of ln(n) − Σ c·ln(c)/n over final counts. Output:
    (from_cat, n_transitions, next_entropy)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    counts = transition_counts(
        events,
        partition_col=partition_col,
        cat_col=cat_col,
        ts_col=ts_col,
        id_col=id_col,
        num_buckets=num_buckets,
    )

    def ent(g: pd.DataFrame) -> pd.DataFrame:
        # g holds FINAL (from_cat, to_cat, n) rows for whole from_cats
        s = g.groupby("from_cat", sort=False)["n"]
        tot = s.transform("sum").to_numpy(dtype=np.float64)
        c = g["n"].to_numpy(dtype=np.float64)
        term = c * np.log(c) / tot
        out = (
            g.assign(_t=term, _n=g["n"])
            .groupby("from_cat", as_index=False)
            .agg(n_transitions=("_n", "sum"), _ts=("_t", "sum"))
        )
        out["next_entropy"] = np.log(
            out["n_transitions"].to_numpy(dtype=np.float64)
        ) - out["_ts"].to_numpy()
        out["n_transitions"] = out["n_transitions"].astype("int64")
        return out[["from_cat", "n_transitions", "next_entropy"]]

    return bucketed_group_reduce(
        counts, key_cols=["from_cat"], reduce_fn=ent, num_buckets=num_buckets
    )


def survival_counts(
    ev: "rd.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    censor_window_days: int = 7,
    max_lifetime_days: int = 100_000,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Kaplan-Meier input table over entity lifetimes — the survival/
    churn-analysis primitive: lifetime t = whole 86400-second buckets
    between an entity's first and last event; an entity whose last
    event falls within ``censor_window_days`` of the corpus's global
    max timestamp is CENSORED (still alive at observation end), not
    churned. Returns (t, n_event, n_censored, n_at_risk) — the KM
    estimator Ŝ = Π (1 − n_event/n_at_risk) is the caller's float
    product over this exact-integer table.

    Integer-exact across engines: all time arithmetic runs in int64
    MICROSECONDS (never epoch-seconds doubles — 1e-6 is not binary, a
    float path can flip a floor at bucket boundaries).

    Scale shape: per-batch (key, min, max) combiners → ONE key-bucketed
    reduce; the per-entity table is entity-bounded and MATERIALIZED
    (the documented V-bounded exception — it is consumed twice: a
    distributed max for the censor horizon, then the lifetime
    histogram); the final pull is lifetime-DOMAIN-bounded (guarded
    like the AUC histogram), with the reversed at-risk cumsum over
    that tiny table."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def span_partial(d: pd.DataFrame) -> pd.DataFrame:
        t = pd.DataFrame({key_col: d[key_col], "us": _ts_us(d[ts_col])})
        g = t.groupby(key_col, as_index=False, sort=False).agg(
            f=("us", "min"), l=("us", "max")
        )
        return g

    def span_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key_col, as_index=False, sort=False).agg(
            f=("f", "min"), l=("l", "max")
        )

    users = bucketed_group_reduce(
        ev.select_columns([key_col, ts_col]).map_batches(
            span_partial, batch_format="pandas"
        ),
        key_cols=[key_col],
        reduce_fn=span_reduce,
        num_buckets=num_buckets,
    ).materialize()  # entity-bounded; consumed twice (max + histogram)
    gmax = int(users.max("l"))
    DAY_US = 86_400_000_000
    win_us = censor_window_days * DAY_US

    def lifetimes(d: pd.DataFrame) -> pd.DataFrame:
        f = d["f"].to_numpy(dtype=np.int64)
        l = d["l"].to_numpy(dtype=np.int64)
        t = (l - f) // DAY_US
        censored = ((gmax - l) < win_us).astype(np.int64)
        out = pd.DataFrame(
            {"t": t, "n_event": 1 - censored, "n_censored": censored}
        )
        return out.groupby("t", as_index=False, sort=False).sum()

    def hist_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("t", as_index=False, sort=False)[
            ["n_event", "n_censored"]
        ].sum()

    hist_ds = bucketed_group_reduce(
        users.map_batches(lifetimes, batch_format="pandas"),
        key_cols=["t"],
        reduce_fn=hist_reduce,
        num_buckets=num_buckets,
    )
    n_distinct = hist_ds.count()
    if n_distinct > max_lifetime_days:
        raise ValueError(
            f"survival_counts: {n_distinct} distinct lifetimes exceed the "
            f"pull guard ({max_lifetime_days})"
        )
    h = hist_ds.to_pandas().sort_values("t", kind="mergesort").reset_index(drop=True)
    total = (h["n_event"] + h["n_censored"]).to_numpy(dtype=np.int64)
    # at risk at time t = entities with lifetime >= t (reversed cumsum)
    h["n_at_risk"] = total[::-1].cumsum()[::-1]
    return h[["t", "n_event", "n_censored", "n_at_risk"]]


def decayed_moving_avg(
    events: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    window: int = 8,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-key exponentially-DECAYED trailing average — the telemetry
    smoother that weights the last ``window`` rows by powers of two
    (most recent row weight 2^(m-1), oldest weight 1, m = rows in
    frame): for every row, num = Σ_{j=0}^{m-1} vfp[i-j]·2^(m-1-j) and
    den = 2^m − 1 over int64 fixed-point values (round(value·1e4)).
    Emitting the EXACT integer numerator/denominator instead of a
    float quotient keeps the result hash-identical to a SQL replay
    (8 lag() terms with integer shifts) — consumers divide.
    → (key, id, num, den).

    Scale shape: the `keyed_window` layout — raw rows ship ONCE
    hash-partitioned on the key; the in-bucket kernel is ``window``
    shifted adds (no per-row Python, no scan recurrence — the
    power-of-two weights make the decayed sum window-bounded and
    therefore vectorizable, where a true infinite-memory EWMA would
    force a sequential scan)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    if not 1 <= window <= 32:
        raise ValueError("decayed_moving_avg: window must be in [1, 32]")

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        vfp = np.round(
            g[value_col].to_numpy(dtype=np.float64) * 1e4
        ).astype(np.int64)
        rn = g.groupby(key, sort=False).cumcount().to_numpy() + 1
        m = np.minimum(rn, window)
        num = np.zeros(len(g), dtype=np.int64)
        kcol = g[key].to_numpy()
        for j in range(window):
            # lag-j value within the key (0 outside the key's frame)
            lag = np.zeros(len(g), dtype=np.int64)
            if j < len(g):
                lag[j:] = vfp[: len(g) - j]
                same = np.zeros(len(g), dtype=bool)
                same[j:] = kcol[j:] == kcol[: len(g) - j]
                lag[~same] = 0
            in_frame = j < m
            num += np.where(in_frame, lag << np.maximum(m - 1 - j, 0), 0)
        den = (np.int64(1) << m) - 1
        return pd.DataFrame(
            {
                key: kcol,
                id_col: g[id_col].to_numpy(dtype=np.int64),
                "num": num,
                "den": den.astype(np.int64),
            }
        )

    return bucketed_group_reduce(
        events.select_columns([key, ts_col, id_col, value_col]),
        key_cols=[key],
        reduce_fn=reduce_fn,
        num_buckets=num_buckets,
    )


def interval_overlap_pairs(
    intervals: "rd.Dataset",
    id_col: str = "id",
    start_col: str = "s",
    end_col: str = "e",
    bucket_width: int = 3_600 * _US,
    max_span_buckets: int = 64,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """All overlapping pairs of half-open int64 intervals [s, e):
    (id_a, id_b, ov) with id_a < id_b and ov = min(e) − max(s) > 0 —
    the interval-interval self-join (range join) Ray Data lacks
    natively; KG/curation uses: co-occurring crawl fetch windows,
    session collision detection, temporal fact overlap.

    Scale shape: time-bucket decomposition — each interval replicates
    to the ⌈span/bucket_width⌉ buckets it touches (capped LOUDLY at
    ``max_span_buckets``; pick the width near the typical span so
    replication stays O(1)), ONE bucket-keyed exchange co-locates
    co-bucketed intervals, and the in-bucket kernel is fully
    vectorized: sort by (s, id), then for each interval the
    later-starting partners are one CONTIGUOUS run ending at
    searchsorted(s, e_a) — enumeration is np.repeat/arange, cost
    output-bounded, never all-pairs. Exactly-once across replicas by
    the canonical rule: a pair is emitted only in the bucket holding
    the LATER start (the earlier interval provably replicates there).

    Density caveat (documented, not silent): output is inherently
    quadratic in per-bucket overlap density; the exchange carries only
    (id, s, e) rows — payload columns should be joined back after.
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    if bucket_width <= 0:
        raise ValueError("interval_overlap_pairs: bucket_width must be > 0")

    W = int(bucket_width)

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(dtype=np.int64)
        s = df[start_col].to_numpy(dtype=np.int64)
        e = df[end_col].to_numpy(dtype=np.int64)
        if len(s) and (e <= s).any():
            bad = int(ids[(e <= s).argmax()])
            raise ValueError(
                f"interval_overlap_pairs: empty/negative interval (e <= s)"
                f" at id={bad}"
            )
        b0 = np.floor_divide(s, W)
        b1 = np.floor_divide(e - 1, W)
        spans = b1 - b0 + 1
        if len(spans) and spans.max() > max_span_buckets:
            bad = int(ids[spans.argmax()])
            raise ValueError(
                "interval_overlap_pairs: interval id="
                f"{bad} spans {int(spans.max())} buckets >"
                f" max_span_buckets={max_span_buckets}; raise bucket_width"
            )
        n = spans.sum()
        reps = np.repeat(np.arange(len(s)), spans)
        offs = np.concatenate([[0], np.cumsum(spans)])[:-1]
        tb = np.repeat(b0, spans) + (np.arange(n) - np.repeat(offs, spans))
        return pd.DataFrame(
            {
                "tb": tb,
                "id": ids[reps],
                "s": s[reps],
                "e": e[reps],
            }
        )

    EMPTY = pd.DataFrame(
        {
            "id_a": pd.Series([], dtype="int64"),
            "id_b": pd.Series([], dtype="int64"),
            "ov": pd.Series([], dtype="int64"),
        }
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "tb" not in g.columns:
            return EMPTY.copy()
        out = []
        for tb, grp in g.groupby("tb", sort=False):
            grp = grp.sort_values(["s", "id"], kind="mergesort")
            s = grp["s"].to_numpy(dtype=np.int64)
            e = grp["e"].to_numpy(dtype=np.int64)
            ids = grp["id"].to_numpy(dtype=np.int64)
            n = len(s)
            if n < 2:
                continue
            hi = np.searchsorted(s, e, side="left")
            pos = np.arange(n, dtype=np.int64)
            cnt = np.maximum(hi - pos - 1, 0)
            total = int(cnt.sum())
            if not total:
                continue
            a_idx = np.repeat(pos, cnt)
            offs = np.concatenate([[0], np.cumsum(cnt)])[:-1]
            b_idx = (
                np.arange(total, dtype=np.int64)
                - np.repeat(offs, cnt)
                + np.repeat(pos + 1, cnt)
            )
            # exactly-once: only pairs whose LATER start homes here
            home = np.floor_divide(s[b_idx], W) == int(tb)
            a_idx, b_idx = a_idx[home], b_idx[home]
            if not len(a_idx):
                continue
            ov = np.minimum(e[a_idx], e[b_idx]) - s[b_idx]
            ia, ib = ids[a_idx], ids[b_idx]
            out.append(
                pd.DataFrame(
                    {
                        "id_a": np.minimum(ia, ib),
                        "id_b": np.maximum(ia, ib),
                        "ov": ov,
                    }
                )
            )
        return pd.concat(out, ignore_index=True) if out else EMPTY.copy()

    return bucketed_group_reduce(
        intervals.select_columns([id_col, start_col, end_col]).map_batches(
            replicate, batch_format="pandas"
        ),
        key_cols=["tb"],
        reduce_fn=pairs_in_bucket,
        num_buckets=num_buckets,
    )


def linear_attribution(
    events: "rd.Dataset",
    convert_type: str = "purchase",
    lookback_s: int = 86400,
    scale: int = 1_000_000,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Linear multi-touch attribution: every conversion event (rows with
    ``type_col == convert_type``) splits a fixed credit of ``scale``
    EQUALLY over the same key's touch events (all other types) that fall
    strictly inside ``(c.ts - lookback_s, c.ts)``; per-touch credit is
    the integer ``scale // n`` (floor), so the output is pure int64 and
    hash-exact vs a SQL window/join oracle. Returns one row per touched
    event type: (event_type, n_touches, credit).

    Scale shape: ONE key-bucketed exchange; inside the bucket the
    window counts come from a single lexsort + per-type cumulative-sum
    pass over touches plus two PROBE rows per conversion (at c.ts and
    c.ts - lookback), not a per-conversion scan — O(rows log rows)
    regardless of window width. The per-bucket output is |types| rows,
    re-summed by one constant-size type-keyed exchange."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    lookback_us = int(lookback_s) * _US
    EMPTY = pd.DataFrame(
        {
            type_col: pd.Series([], dtype=object),
            "n_touches": pd.Series([], dtype=np.int64),
            "credit": pd.Series([], dtype=np.int64),
        }
    )

    def bucket_partial(g: pd.DataFrame) -> pd.DataFrame:
        is_conv = g[type_col].to_numpy() == convert_type
        conv = g[is_conv]
        touch = g[~is_conv]
        n_c, n_t = len(conv), len(touch)
        if n_c == 0 or n_t == 0:
            return EMPTY.copy()
        types, tcode = np.unique(
            touch[type_col].to_numpy(dtype=object), return_inverse=True
        )
        tu = touch[key].to_numpy()
        tt = _ts_us(touch[ts_col])
        cu = conv[key].to_numpy()
        ct = _ts_us(conv[ts_col])
        # merged order: probes at the hi bound (kind 0) sort BEFORE
        # equal-ts touches (strict ts < c.ts), probes at the lo bound
        # (kind 2) AFTER them (strict ts > c.ts - lookback)
        users = np.concatenate([tu, cu, cu])
        tss = np.concatenate([tt, ct, ct - lookback_us])
        kinds = np.concatenate(
            [
                np.ones(n_t, dtype=np.int8),
                np.zeros(n_c, dtype=np.int8),
                np.full(n_c, 2, dtype=np.int8),
            ]
        )
        order = np.lexsort((kinds, tss, users))
        pos = np.empty(len(order), dtype=np.int64)
        pos[order] = np.arange(len(order))
        oh = np.zeros((len(order), len(types)), dtype=np.int64)
        tcode_sorted = np.concatenate(
            [tcode, np.full(2 * n_c, -1, dtype=tcode.dtype)]
        )[order]
        touch_rows = np.nonzero(kinds[order] == 1)[0]
        oh[touch_rows, tcode_sorted[touch_rows]] = 1
        cum = np.cumsum(oh, axis=0)
        hi = cum[pos[n_t : n_t + n_c]]  # (n_c, T) touches with ts < c.ts
        lo = cum[pos[n_t + n_c :]]  # touches with ts <= c.ts - lookback
        w = hi - lo  # per-conversion per-type window counts
        n_i = w.sum(axis=1)
        live = n_i > 0
        if not live.any():
            return EMPTY.copy()
        credit_i = (scale // n_i[live]).astype(np.int64)
        out = pd.DataFrame(
            {
                type_col: types,
                "n_touches": w[live].sum(axis=0).astype(np.int64),
                "credit": (credit_i[:, None] * w[live]).sum(axis=0).astype(
                    np.int64
                ),
            }
        )
        return out[out["n_touches"] > 0].reset_index(drop=True)

    partials = bucketed_group_reduce(
        events.select_columns([key, ts_col, type_col]),
        key_cols=[key],
        reduce_fn=bucket_partial,
        num_buckets=num_buckets,
    )

    def final_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(type_col, as_index=False)[["n_touches", "credit"]].sum()
        return out.astype({"n_touches": "int64", "credit": "int64"})

    return bucketed_group_reduce(
        partials, key_cols=[type_col], reduce_fn=final_sum, num_buckets=8
    )


def scd2_intervals(
    events: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    attr_col: str = "event_type",
    end_sentinel: str = "2999-12-31 00:00:00",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Type-2 slowly-changing-dimension history: collapse each key's
    time-ordered attribute stream into change RUNS and emit one validity
    interval per run — (key, version, attr, valid_from, valid_to) with
    ``version`` numbering the key's runs 1..k, ``valid_from`` the run's
    first event time, and ``valid_to`` the next run's ``valid_from``
    (the conventional far-future sentinel for the current run, keeping
    the output hash-stable — no NULL timestamps). The warehouse
    dimension-history op, run as ONE key-bucketed exchange with
    vectorized boundary detection (same kernel family as sessionize:
    sort → shift-compare → per-key cumsum → first-of-run gather)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    sentinel = pd.Timestamp(end_sentinel)

    def reduce_fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        n = len(g)
        if n == 0:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=g[key].dtype),
                    "version": pd.Series([], dtype=np.int64),
                    attr_col: pd.Series([], dtype=object),
                    "valid_from": pd.Series([], dtype="datetime64[us]"),
                    "valid_to": pd.Series([], dtype="datetime64[us]"),
                }
            )
        u = g[key].to_numpy()
        a = g[attr_col].to_numpy()
        brk = np.ones(n, dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | (a[1:] != a[:-1])
        ver = (
            g.assign(_b=brk.astype(np.int64))
            .groupby(key, sort=False)["_b"]
            .cumsum()
            .to_numpy()
        )
        vf = g[ts_col].to_numpy().astype("datetime64[us]")
        runs = pd.DataFrame(
            {
                key: u[brk],
                "version": ver[brk].astype(np.int64),
                attr_col: a[brk],
                "valid_from": vf[brk],
            }
        )
        nxt = runs["valid_from"].shift(-1)
        same = runs[key].shift(-1).to_numpy() == runs[key].to_numpy()
        runs["valid_to"] = (
            nxt.where(pd.Series(same, index=runs.index), sentinel)
            .astype("datetime64[us]")
        )
        return runs

    return bucketed_group_reduce(
        events.select_columns([key, ts_col, id_col, attr_col]),
        key_cols=[key],
        reduce_fn=reduce_fn,
        num_buckets=num_buckets,
    )


def snaive_backtest(
    events: "rd.Dataset",
    key: str = "event_type",
    ts_col: str = "ts",
    season_days: int = 7,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Seasonal-naive forecast backtest: per key, forecast each day's
    event count with the count ``season_days`` earlier and score the
    absolute error over every day whose seasonal ancestor exists
    (days with zero events simply have no row — both sides of the
    comparison must agree on that grid). Output per key:
    (key, n_days, sum_abs_err, sum_actual) — pure int64, the
    standard forecast-sanity gate for pipeline drift.

    Scale shape: per-batch (key, day) count partials, ONE
    key-day-bucketed exchange builds exact daily counts, then the
    lag join and the error fold both run in a key-bucketed reduce —
    day-grain rows only, never events."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                key: df[key],
                "day": df[ts_col]
                .to_numpy()
                .astype("datetime64[D]")
                .astype("datetime64[us]"),
            }
        )
        return (
            d.groupby([key, "day"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    daily = bucketed_group_reduce(
        events.select_columns([key, ts_col]).map_batches(
            day_partial, batch_format="pandas"
        ),
        key_cols=[key, "day"],
        reduce_fn=lambda g: g.groupby([key, "day"], as_index=False)[
            "n"
        ].sum(),
        num_buckets=num_buckets,
    )

    lag = np.timedelta64(season_days, "D").astype("timedelta64[us]")

    def score(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=object),
                    "n_days": pd.Series([], dtype=np.int64),
                    "sum_abs_err": pd.Series([], dtype=np.int64),
                    "sum_actual": pd.Series([], dtype=np.int64),
                }
            )
        prior = g.assign(day=g["day"] + lag).rename(columns={"n": "fc"})
        m = g.merge(prior, on=[key, "day"], how="inner")
        m["err"] = (
            m["n"].to_numpy(dtype=np.int64)
            - m["fc"].to_numpy(dtype=np.int64)
        )
        out = m.groupby(key, as_index=False).agg(
            n_days=("day", "size"),
            sum_abs_err=("err", lambda s: int(np.abs(s.to_numpy()).sum())),
            sum_actual=("n", "sum"),
        )
        return out.astype(
            {"n_days": "int64", "sum_abs_err": "int64", "sum_actual": "int64"}
        )

    return bucketed_group_reduce(
        daily, key_cols=[key], reduce_fn=score, num_buckets=8
    )


def _trunc_div2(x: np.ndarray) -> np.ndarray:
    """Integer division by 2 TRUNCATING toward zero (SQL `//`
    semantics; numpy's ``//`` floors, which differs on negatives —
    trend terms go negative on any decreasing series)."""
    return np.where(x >= 0, x // 2, -((-x) // 2))


def holt_smooth(
    events: "rd.Dataset",
    key: str = "event_type",
    ts_col: str = "ts",
    scale: int = 1000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Holt double-exponential smoothing (level + trend, α = β = 1/2)
    over each key's DENSE daily count series (zero-filled between the
    key's first and last day), with the state kept in scaled int64 and
    every halving a truncating integer division — the recurrence

        l_t = (v_t·scale + l_{t-1} + b_{t-1}) div 2
        b_t = ((l_t − l_{t-1}) + b_{t-1}) div 2,  l_1 = v_1·scale, b_1 = 0

    is therefore replayed bit-exactly by a recursive-CTE SQL oracle
    (the graph-closure oracle pattern applied to a time-series
    recurrence). Output: (key, day, level_fp, trend_fp) — the full
    smoothed series, pure int64.

    Scale shape: per-batch (key, day) count partials, one key-day
    exchange to exact daily counts, then the recurrence runs in a
    key-bucketed reduce as ONE loop over the day range vectorized
    ACROSS keys (day-grain bounded — the same documented exception as
    the redirect-walk ops; never a per-event loop)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                key: df[key],
                "day": df[ts_col]
                .to_numpy()
                .astype("datetime64[D]")
                .astype("datetime64[us]"),
            }
        )
        return (
            d.groupby([key, "day"], as_index=False)
            .size()
            .rename(columns={"size": "v"})
        )

    daily = bucketed_group_reduce(
        events.select_columns([key, ts_col]).map_batches(
            day_partial, batch_format="pandas"
        ),
        key_cols=[key, "day"],
        reduce_fn=lambda g: g.groupby([key, "day"], as_index=False)[
            "v"
        ].sum(),
        num_buckets=num_buckets,
    )

    DAY = np.timedelta64(1, "D").astype("timedelta64[us]").astype(np.int64)

    def smooth(g: pd.DataFrame) -> pd.DataFrame:
        EMPTY = pd.DataFrame(
            {
                key: pd.Series([], dtype=object),
                "day": pd.Series([], dtype="datetime64[us]"),
                "level_fp": pd.Series([], dtype=np.int64),
                "trend_fp": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return EMPTY
        keys, kcode = np.unique(g[key].to_numpy(dtype=object), return_inverse=True)
        K = len(keys)
        di = g["day"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d0 = np.full(K, np.iinfo(np.int64).max)
        d1 = np.full(K, np.iinfo(np.int64).min)
        np.minimum.at(d0, kcode, di)
        np.maximum.at(d1, kcode, di)
        T = int(((d1 - d0) // DAY).max()) + 1
        # dense [T, K] count matrix; rows beyond a key's range masked
        V = np.zeros((T, K), dtype=np.int64)
        V[(di - d0[kcode]) // DAY, kcode] = g["v"].to_numpy(dtype=np.int64)
        n_t = (d1 - d0) // DAY + 1  # per-key series length
        l = V[0] * scale
        b = np.zeros(K, dtype=np.int64)
        out_l = np.empty((T, K), dtype=np.int64)
        out_b = np.empty((T, K), dtype=np.int64)
        out_l[0], out_b[0] = l, b
        for t in range(1, T):  # day-grain bounded loop, vector across keys
            live = t < n_t
            l_new = _trunc_div2(V[t] * scale + l + b)
            b_new = _trunc_div2((l_new - l) + b)
            l = np.where(live, l_new, l)
            b = np.where(live, b_new, b)
            out_l[t], out_b[t] = l, b
        rows_t, rows_k = np.nonzero(np.arange(T)[:, None] < n_t[None, :])
        return pd.DataFrame(
            {
                key: keys[rows_k],
                "day": (d0[rows_k] + rows_t * DAY).astype("datetime64[us]"),
                "level_fp": out_l[rows_t, rows_k],
                "trend_fp": out_b[rows_t, rows_k],
            }
        )

    return bucketed_group_reduce(
        daily, key_cols=[key], reduce_fn=smooth, num_buckets=8
    )


def markov_backtest(
    events: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """First-order Markov next-event backtest: adjacent (from, to)
    pairs over each key's (ts, id)-ordered stream split by successor-id
    parity — EVEN successors train a transition-count model, ODD
    successors are scored against its per-from argmax prediction
    (ties broken by target type ascending, so the model is total and
    deterministic). Output per from-type present in BOTH splits:
    (from_type, predicted, n_test, n_correct) — pure int64/string, the
    sequence-model sanity gate for pipeline drift.

    Scale shape: ONE key-bucketed exchange builds adjacency; each
    bucket emits category²-bounded (from, to, split) COUNT partials,
    so the second exchange (keyed from_type, where the argmax and the
    scoring both happen) carries type-pair rows, never events."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def adj_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, ts_col, id_col], kind="mergesort")
        n = len(g)
        if n < 2:
            return pd.DataFrame(
                {
                    "f": pd.Series([], dtype=object),
                    "t": pd.Series([], dtype=object),
                    "split": pd.Series([], dtype=np.int8),
                    "c": pd.Series([], dtype=np.int64),
                }
            )
        u = g[key].to_numpy()
        a = g[type_col].to_numpy(dtype=object)
        ids = g[id_col].to_numpy(dtype=np.int64)
        same = u[1:] == u[:-1]
        d = pd.DataFrame(
            {
                "f": a[:-1][same],
                "t": a[1:][same],
                "split": (ids[1:][same] % 2).astype(np.int8),
            }
        )
        out = d.groupby(["f", "t", "split"], as_index=False).size()
        return out.rename(columns={"size": "c"}).astype({"c": "int64"})

    partials = bucketed_group_reduce(
        events.select_columns([key, ts_col, id_col, type_col]),
        key_cols=[key],
        reduce_fn=adj_partial,
        num_buckets=num_buckets,
    )

    def score(g: pd.DataFrame) -> pd.DataFrame:
        EMPTY = pd.DataFrame(
            {
                "from_type": pd.Series([], dtype=object),
                "predicted": pd.Series([], dtype=object),
                "n_test": pd.Series([], dtype=np.int64),
                "n_correct": pd.Series([], dtype=np.int64),
            }
        )
        if len(g) == 0:
            return EMPTY
        g = g.groupby(["f", "t", "split"], as_index=False)["c"].sum()
        train = g[g["split"] == 0]
        test = g[g["split"] == 1]
        if not len(train) or not len(test):
            return EMPTY
        pred = (
            train.sort_values(
                ["f", "c", "t"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            .groupby("f", as_index=False)
            .head(1)[["f", "t"]]
            .rename(columns={"t": "predicted"})
        )
        m = test.merge(pred, on="f", how="inner")
        m["correct"] = np.where(
            m["t"].to_numpy(dtype=object) == m["predicted"].to_numpy(dtype=object),
            m["c"].to_numpy(dtype=np.int64),
            0,
        )
        out = m.groupby(["f", "predicted"], as_index=False).agg(
            n_test=("c", "sum"), n_correct=("correct", "sum")
        )
        out = out.rename(columns={"f": "from_type"})
        return out.astype({"n_test": "int64", "n_correct": "int64"})[
            ["from_type", "predicted", "n_test", "n_correct"]
        ]

    return bucketed_group_reduce(
        partials, key_cols=["f"], reduce_fn=score, num_buckets=4
    )


def late_arrivals(
    events: "rd.Dataset",
    key: str = "user_id",
    ts_col: str = "ts",
    arrival_col: str = "event_id",
    watermark_s: int = 3600,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Streaming late-data audit: replay each key's stream in ARRIVAL
    order (``arrival_col`` — the ingest sequence) and flag an event
    LATE when its event time falls behind the running watermark
    max(prior event times) − ``watermark_s`` (strictly) — exactly the
    accounting a watermarked streaming window would do, run as a batch
    op to size the late-data tail before choosing a watermark. Output
    per key: (key, n_events, n_late, max_lateness_s) — int64.

    Scale shape: ONE key-bucketed exchange; the watermark is a
    per-key vectorized cumulative max over the arrival-sorted bucket
    (no per-event loop)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    wm_us = int(watermark_s) * _US

    def audit(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype=np.int64),
                    "n_events": pd.Series([], dtype=np.int64),
                    "n_late": pd.Series([], dtype=np.int64),
                    "max_lateness_s": pd.Series([], dtype=np.int64),
                }
            )
        g = g.sort_values([key, arrival_col], kind="mergesort")
        ti = _ts_us(g[ts_col])
        # per-key running max of PRIOR event times: cummax shifted by
        # one inside each key segment
        cm = (
            pd.Series(ti)
            .groupby(g[key].to_numpy(), sort=False)
            .cummax()
            .to_numpy()
        )
        u = g[key].to_numpy()
        prior = np.empty(len(g), dtype=np.int64)
        prior[0] = np.iinfo(np.int64).min
        prior[1:] = np.where(
            u[1:] == u[:-1], cm[:-1], np.iinfo(np.int64).min
        )
        has_prior = prior != np.iinfo(np.int64).min
        late = has_prior & (ti < prior - wm_us)
        lateness = np.where(late, (prior - wm_us - ti), 0)
        out = pd.DataFrame(
            {
                key: u,
                "_late": late.astype(np.int64),
                "_lat": lateness.astype(np.int64),
            }
        ).groupby(key, as_index=False).agg(
            n_events=("_late", "size"),
            n_late=("_late", "sum"),
            max_lateness_us=("_lat", "max"),
        )
        out["max_lateness_s"] = (
            out.pop("max_lateness_us").to_numpy(dtype=np.int64) // _US
        )
        return out.astype(
            {"n_events": "int64", "n_late": "int64", "max_lateness_s": "int64"}
        )

    return bucketed_group_reduce(
        events.select_columns([key, ts_col, arrival_col]),
        key_cols=[key],
        reduce_fn=audit,
        num_buckets=num_buckets,
    )
