"""Windowed-operator tests: gap sessionization and as-of join on
crafted inputs covering the boundary semantics (strict gap, inclusive
as-of, deterministic tie-breaks)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _ts(*secs):
    return pd.to_datetime([f"2024-01-01 00:00:{s:02d}" for s in secs]).astype(
        "datetime64[us]"
    )


def test_sessionize_gap_boundary_and_numbering():
    from kgflow.ops.window import sessionize

    # user 1: gaps of exactly 10 s (kept: not > gap) and 11 s (split)
    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:00:10",  # gap == 10 → same session
                    "2024-01-01 00:00:21",  # gap == 11 → new session
                    "2024-01-01 00:05:00",
                ]
            ).astype("datetime64[us]"),
            "event_id": [1, 2, 3, 4],
            "value": [1.5, 2.25, 4.0, 8.0],
        }
    )
    out = (
        sessionize(rd.from_pandas(ev), gap_s=10, num_buckets=4)
        .to_pandas()
        .sort_values(["user_id", "session_seq"])
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["session_seq"].tolist() == [1, 2, 1]
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["duration_s"].tolist() == [10, 0, 0]
    assert out["sum_value"].tolist() == [3.75, 4.0, 8.0]


def test_asof_join_inclusive_and_tiebreak():
    from kgflow.ops.window import asof_join

    left = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "ts": _ts(5, 20, 7),
            "event_id": [100, 101, 102],
        }
    )
    # two rights at the SAME ts=5 for user 1 (tie → larger event_id),
    # one later right the first left must not see; user 2 has no right
    # at or before ts=7 → dropped (inner semantics)
    right = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": _ts(5, 5, 10, 9),
            "event_id": [7, 9, 8, 11],
        }
    )
    out = (
        asof_join(rd.from_pandas(left), rd.from_pandas(right), num_buckets=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [100, 101]
    # left@5 matches right@5 (inclusive), picking id 9 over 7;
    # left@20 picks the latest right@10
    assert out["prior_event_id"].tolist() == [9, 8]
    assert out["lag_s"].tolist() == [0, 10]


def test_window_ops_match_duckdb_at_sf0001():
    """End-to-end parity with the driver oracle SQL on real test data —
    the same check the driver gate runs at sf0.01."""
    import duckdb

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    qs, osql = e.queries(), e.oracle_sql()
    for name in ["events_sessions", "events_asof"]:
        df = qs[name](sf).to_pandas()
        o = con.sql(osql[name]).df()
        cols = sorted(df.columns)
        assert cols == sorted(o.columns)
        df = df[cols].sort_values(cols).reset_index(drop=True)
        o = o[cols].sort_values(cols).reset_index(drop=True)
        assert len(df) == len(o)
        for c in cols:
            assert np.array_equal(df[c].to_numpy(), o[c].to_numpy()), (name, c)


def test_range_join_overlapping_intervals_and_key_isolation():
    from kgflow.ops.window import range_join

    pts = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": _ts(5, 10, 15, 10),
            "event_id": [100, 101, 102, 103],
        }
    )
    # overlapping intervals for user 1: [0,10] and [10,20] both cover
    # ts=10; user 2's interval must not see user 1's points
    ivs = pd.DataFrame(
        {
            "user_id": [1, 1, 2],
            "session_start": _ts(0, 10, 0),
            "session_end": _ts(10, 20, 5),
            "session_seq": [1, 2, 1],
        }
    )
    out = (
        range_join(rd.from_pandas(pts), rd.from_pandas(ivs), num_buckets=4)
        .to_pandas()
        .sort_values(["event_id", "session_seq"])
        .reset_index(drop=True)
    )
    got = list(zip(out["event_id"], out["session_seq"]))
    # 100@5 -> iv1; 101@10 -> BOTH (inclusive ends); 102@15 -> iv2;
    # 103 (user 2 @10) -> no interval covers it
    assert got == [(100, 1), (101, 1), (101, 2), (102, 2)]


def test_ranked_window_semantics():
    """Hand-checkable frame: value ties share RANK (with a gap) and
    DENSE_RANK (no gap); lead_s is -1 on each key's last event; mov3 is
    the 3-row trailing sum in (ts, id) order."""
    from kgflow.ops.window import ranked_window

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2],
            "event_id": [10, 11, 12, 13, 20],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:00",
                    "2024-01-01 00:00:30",
                    "2024-01-01 00:02:00",
                    "2024-01-01 00:02:05",
                    "2024-01-01 09:00:00",
                ]
            ).astype("datetime64[us]"),
            "value": [5.0, 2.0, 5.0, 1.0, 3.0],
        }
    )
    out = (
        ranked_window(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    # user 1 values [5, 2, 5, 1] desc-ranked: 5→rank 1 (both), 2→rank 3,
    # 1→rank 4; dense: 5→1, 2→2, 1→3
    assert out["val_rank"].tolist() == [1, 3, 1, 4, 1]
    assert out["val_dense_rank"].tolist() == [1, 2, 1, 3, 1]
    assert out["lead_s"].tolist() == [30, 90, 5, -1, -1]
    assert out["mov3_value"].tolist() == [5.0, 7.0, 12.0, 8.0, 3.0]


def test_merge_intervals_islands():
    """Overlap chains merge transitively; touching endpoints merge
    (strict > test); a containing interval absorbs later short ones;
    keys are isolated."""
    from kgflow.ops.window import merge_intervals

    t = lambda s: pd.Timestamp(s)
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 1, 2],
            "s": [
                t("2024-01-01 00:00"),
                t("2024-01-01 00:05"),  # overlaps first
                t("2024-01-01 00:08"),  # touches merged end → merges
                t("2024-01-01 01:00"),  # gap → new island
                t("2024-01-01 01:01"),  # inside previous (contained)
                t("2024-01-01 00:00"),  # other key
            ],
            "e": [
                t("2024-01-01 00:06"),
                t("2024-01-01 00:08"),
                t("2024-01-01 00:20"),
                t("2024-01-01 02:00"),
                t("2024-01-01 01:02"),
                t("2024-01-01 00:30"),
            ],
        }
    )
    df["s"] = df["s"].astype("datetime64[us]")
    df["e"] = df["e"].astype("datetime64[us]")
    out = (
        merge_intervals(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values(["user_id", "interval_start"])
        .reset_index(drop=True)
    )
    assert len(out) == 3
    assert out["n_merged"].tolist() == [3, 2, 1]
    assert out["interval_end"].astype(str).tolist() == [
        "2024-01-01 00:20:00",
        "2024-01-01 02:00:00",
        "2024-01-01 00:30:00",
    ]


def test_distribution_window_ntile_boundaries():
    from kgflow.ops.window import distribution_window

    # user 1: n=5, tiles=4 -> front-loaded sizes 2,1,1,1
    # user 2: n=2 < tiles -> each row its own tile
    ev = pd.DataFrame(
        {
            "user_id": [1] * 5 + [2] * 2,
            "event_id": [10, 11, 12, 13, 14, 20, 21],
            "value": [5.0, 4.0, 3.0, 2.0, 1.0, 9.0, 9.0],  # user 2 ties
        }
    )
    out = (
        distribution_window(rd.from_pandas(ev), num_buckets=4)
        .to_pandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    u1 = out[out["user_id"] == 1]
    assert u1["tile"].tolist() == [1, 1, 2, 3, 4]
    assert u1["pct_rank"].tolist() == [0.0, 0.25, 0.5, 0.75, 1.0]
    assert u1["cume_dist"].tolist() == [0.2, 0.4, 0.6, 0.8, 1.0]
    u2 = out[out["user_id"] == 2]
    # equal values order by event_id (total order), each its own tile
    assert u2["tile"].tolist() == [1, 2]
    assert u2["pct_rank"].tolist() == [0.0, 1.0]
    assert u2["cume_dist"].tolist() == [0.5, 1.0]
