"""Generic-join tests: broadcast and shuffle paths of semi/anti/inner
joins against pandas-merge ground truth AND Ray's native hash join,
plus grouped distinct-count and the sliding time window."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _tables(seed=0, n=300, keys=60):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, keys, n),
            "v": rng.random(n),
            "name": [f"n{i}" for i in range(n)],
            "ts": pd.Series(
                pd.to_datetime("2024-01-01")
                + pd.to_timedelta(rng.integers(0, 500, n), unit="h")
            ).astype("datetime64[us]"),
        }
    )
    # right covers ~half the key space, with duplicate key rows
    right = pd.DataFrame(
        {
            "k": rng.integers(0, keys // 2, 80),
            "rpay": rng.integers(0, 1000, 80),
        }
    )
    return left, right


def _canon(df, by=("name",)):
    return (
        df[sorted(df.columns)].sort_values(list(by) + sorted(df.columns)).reset_index(drop=True)
    )


@pytest.mark.parametrize("broadcast_threshold", [10**6, 0])
def test_semi_anti_inner_vs_pandas(broadcast_threshold):
    from kgflow.ops.joins import anti_join, hash_join, semi_join

    left, right = _tables()
    lds, rds = rd.from_pandas(left).repartition(5), rd.from_pandas(right).repartition(3)

    semi = semi_join(lds, rds, "k", broadcast_threshold=broadcast_threshold).to_pandas()
    anti = anti_join(lds, rds, "k", broadcast_threshold=broadcast_threshold).to_pandas()
    inner = hash_join(lds, rds, "k", broadcast_threshold=broadcast_threshold).to_pandas()

    exp_semi = left[left["k"].isin(right["k"])]
    exp_anti = left[~left["k"].isin(right["k"])]
    exp_inner = left.merge(right, on="k", how="inner")

    pd.testing.assert_frame_equal(_canon(semi), _canon(exp_semi), check_dtype=False)
    pd.testing.assert_frame_equal(_canon(anti), _canon(exp_anti), check_dtype=False)
    pd.testing.assert_frame_equal(
        _canon(inner, by=("name", "rpay")),
        _canon(exp_inner, by=("name", "rpay")),
        check_dtype=False,
    )
    # semi+anti partition left exactly
    assert len(semi) + len(anti) == len(left)
    # int payloads come back as int64, not a float upcast
    assert inner["rpay"].dtype == np.int64
    assert str(semi["ts"].dtype).startswith("datetime64")


def test_shuffle_join_matches_ray_native_join():
    from kgflow.ops.joins import hash_join

    left, right = _tables(seed=1)
    lds, rds = rd.from_pandas(left).repartition(4), rd.from_pandas(right).repartition(2)
    ours = hash_join(lds, rds, "k", broadcast_threshold=0).to_pandas()
    native = (
        rd.from_pandas(left)
        .join(rd.from_pandas(right), "inner", num_partitions=4, on=("k",))
        .to_pandas()
    )
    pd.testing.assert_frame_equal(
        _canon(ours, by=("name", "rpay")),
        _canon(native, by=("name", "rpay")),
        check_dtype=False,
    )


@pytest.mark.parametrize("broadcast_threshold", [10**6, 0])
def test_left_join_vs_pandas(broadcast_threshold):
    from kgflow.ops.joins import hash_join

    left, right = _tables(seed=2)
    lds, rds = rd.from_pandas(left).repartition(5), rd.from_pandas(right).repartition(3)
    out = hash_join(
        lds, rds, "k", how="left", broadcast_threshold=broadcast_threshold
    ).to_pandas()
    exp = left.merge(right, on="k", how="left")

    assert len(out) == len(exp)
    # unmatched left rows survive with a NULL right payload (not float64 NaN-upcast)
    assert int(out["rpay"].isna().sum()) == int(exp["rpay"].isna().sum()) > 0
    pd.testing.assert_frame_equal(
        _canon(out, by=("name", "rpay")),
        _canon(exp, by=("name", "rpay")),
        check_dtype=False,
    )
    # matched values stay precision-exact integers (nullable Int64, not floats)
    matched = out["rpay"].dropna()
    assert (matched == matched.astype(np.int64)).all()


def test_hash_join_rejects_bad_how():
    from kgflow.ops.joins import hash_join

    left, right = _tables()
    with pytest.raises(ValueError, match="how"):
        hash_join(rd.from_pandas(left), rd.from_pandas(right), "k", how="outer")


def test_grouped_topk_matches_row_number():
    from kgflow.ops.shuffle import grouped_topk

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 9, 400),
            "uid": np.arange(400),
            # duplicate values force the uid tiebreak to matter
            "score": rng.integers(0, 30, 400).astype(np.float64),
        }
    )
    out = (
        grouped_topk(
            rd.from_pandas(df).repartition(6),
            group_cols=["g"],
            sort_cols=["score", "uid"],
            ascending=[False, True],
            k=4,
        )
        .to_pandas()
        .sort_values(["g", "uid"])
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["score", "uid"], ascending=[False, True], kind="mergesort")
        .groupby("g", sort=False)
        .head(4)
        .sort_values(["g", "uid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[exp.columns], exp, check_dtype=False)


def test_hash_join_rejects_payload_collision():
    from kgflow.ops.joins import hash_join

    left, right = _tables()
    right = right.assign(v=1.0)  # collides with left's payload column
    with pytest.raises(ValueError, match="collision"):
        hash_join(rd.from_pandas(left), rd.from_pandas(right), "k")


def test_anti_join_empty_result():
    from kgflow.ops.joins import anti_join

    left, _ = _tables()
    # right covers every key → anti join is empty. NOTE: Ray represents
    # fully-empty pandas results as schema-less blocks (the round-1
    # empty-sort-partition artifact, see kgflow/ops/shuffle.py), so only
    # emptiness is asserted here — the broadcast path keeps columns, the
    # shuffle path may not.
    right = pd.DataFrame({"k": np.arange(left["k"].max() + 1)})
    for bt in (10**6, 0):
        out = anti_join(
            rd.from_pandas(left), rd.from_pandas(right), "k", broadcast_threshold=bt
        )
        assert out.count() == 0


def test_multi_column_key_semi_join():
    from kgflow.ops.joins import semi_join

    left = pd.DataFrame(
        {"a": [1, 1, 2, 2, 3], "b": ["x", "y", "x", "y", "x"], "v": range(5)}
    )
    right = pd.DataFrame({"a": [1, 2], "b": ["y", "x"]})
    for bt in (10**6, 0):
        out = semi_join(
            rd.from_pandas(left), rd.from_pandas(right), ["a", "b"], broadcast_threshold=bt
        ).to_pandas()
        assert sorted(out["v"]) == [1, 2]


def test_grouped_distinct_count_exact():
    from kgflow.ops.shuffle import grouped_distinct_count

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 7, 1000),
            "u": rng.integers(0, 40, 1000),
        }
    )
    out = (
        grouped_distinct_count(
            rd.from_pandas(df).repartition(6), ["g"], "u", out_col="n_users"
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("g")["u"].nunique().rename("n_users").reset_index().astype(
            {"n_users": np.int64}
        )
    )
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_sliding_time_sum_range_semantics():
    from kgflow.ops.window import sliding_time_sum

    # key A: hours 0,1,2,5 (gap!); key B: hour 0 only
    ts = pd.Series(
        pd.to_datetime(
            [
                "2024-01-01 00:00",
                "2024-01-01 01:00",
                "2024-01-01 02:00",
                "2024-01-01 05:00",
                "2024-01-01 00:00",
            ]
        )
    ).astype("datetime64[us]")
    df = pd.DataFrame(
        {"k": ["A", "A", "A", "A", "B"], "t": ts, "x": [1, 10, 100, 1000, 7]}
    )
    out = (
        sliding_time_sum(rd.from_pandas(df), ["k"], "t", ["x"], preceding_s=2 * 3600)
        .to_pandas()
        .sort_values(["k", "t"])
        .reset_index(drop=True)
    )
    # RANGE [t-2h, t]: hour2 sees 1+10+100; hour5 sees only itself (gap)
    assert list(out["w_x"]) == [1, 11, 111, 1000, 7]


@pytest.mark.parametrize("broadcast_threshold", [10**6, 0])
def test_full_join_vs_pandas(broadcast_threshold):
    """Full outer join against pandas ground truth — keys exist on the
    left only, right only, and both (with duplicate right rows), so both
    null-extension directions are exercised; broadcast_threshold is
    irrelevant (full is shuffle-only) but parametrized to prove that."""
    from kgflow.ops.joins import hash_join

    left, right = _tables(seed=7)
    # push part of the right key space out of the left's range so some
    # right rows match NO left row
    right = right.copy()
    right.loc[right.index[:20], "k"] = right.loc[right.index[:20], "k"] + 1000
    lds, rds = rd.from_pandas(left).repartition(5), rd.from_pandas(right).repartition(3)

    out = hash_join(
        lds, rds, "k", how="full", broadcast_threshold=broadcast_threshold
    ).to_pandas()
    exp = left.merge(right, on="k", how="outer")

    assert len(out) == len(exp)
    # both directions non-vacuous
    assert out["rpay"].isna().sum() > 0  # left-only rows
    assert out["name"].isna().sum() > 0  # right-only rows
    pd.testing.assert_frame_equal(
        _canon(out, by=("k", "name", "rpay")),
        _canon(exp, by=("k", "name", "rpay")),
        check_dtype=False,
    )


def test_right_join_is_flipped_left():
    from kgflow.ops.joins import hash_join

    left, right = _tables(seed=9)
    right = right.copy()
    right.loc[right.index[:15], "k"] = right.loc[right.index[:15], "k"] + 500
    lds, rds = rd.from_pandas(left).repartition(4), rd.from_pandas(right).repartition(2)

    out = hash_join(lds, rds, "k", how="right").to_pandas()
    exp = left.merge(right, on="k", how="right")

    assert len(out) == len(exp)
    assert out["name"].isna().sum() > 0  # right-only rows survive
    pd.testing.assert_frame_equal(
        _canon(out, by=("k", "name", "rpay")),
        _canon(exp, by=("k", "name", "rpay")),
        check_dtype=False,
    )


def test_hash_join_hot_key_fails_loudly():
    # one Zipf-head key whose l x r product exceeds the cap must raise the
    # documented error (naming the key), not silently build a giant frame
    from kgflow.ops.joins import hash_join

    left = pd.DataFrame({"k": [7] * 200 + [1, 2], "v": range(202)})
    right = pd.DataFrame({"k": [7] * 200 + [2, 3], "rpay": range(202)})
    with pytest.raises(Exception, match="max_key_rows"):
        hash_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            on="k",
            broadcast_threshold=0,  # force the shuffle path
            max_key_rows=10_000,
        ).to_pandas()
    # under the cap: same inputs complete and match pandas
    out = hash_join(
        rd.from_pandas(left),
        rd.from_pandas(right),
        on="k",
        broadcast_threshold=0,
        max_key_rows=100_000,
    ).to_pandas()
    want = left.merge(right, on="k")
    assert len(out) == len(want) == 200 * 200 + 1


def test_bucketed_group_reduce_bucket_cap():
    from kgflow.ops.shuffle import bucketed_group_reduce

    df = pd.DataFrame({"k": [5] * 1000, "v": np.arange(1000)})
    with pytest.raises(Exception, match="max_bucket_rows"):
        bucketed_group_reduce(
            rd.from_pandas(df),
            key_cols=["k"],
            reduce_fn=lambda g: g.groupby("k", as_index=False)["v"].sum(),
            num_buckets=8,
            max_bucket_rows=100,
        ).to_pandas()


def test_salted_group_reduce_matches_unsalted_on_hot_key():
    from kgflow.ops.shuffle import salted_group_reduce

    rng = np.random.default_rng(3)
    # Zipf-ish: key 0 holds half the rows
    k = np.where(rng.random(4000) < 0.5, 0, rng.integers(1, 50, 4000))
    df = pd.DataFrame({"k": k.astype(np.int64), "v": rng.integers(0, 100, 4000)})

    def partial(g):
        out = g.groupby("k", as_index=False).agg(s=("v", "sum"), n=("v", "size"))
        return out

    def final(g):
        out = g.groupby("k", as_index=False).agg(s=("s", "sum"), n=("n", "sum"))
        return out

    got = (
        salted_group_reduce(
            rd.from_pandas(df), ["k"], partial, final, salt=8, num_buckets=8
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k", as_index=False)
        .agg(s=("v", "sum"), n=("v", "size"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == want["k"].tolist()
    assert got["s"].tolist() == want["s"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


def test_right_join_forwards_skew_guard():
    from kgflow.ops.joins import hash_join

    left = pd.DataFrame({"k": [7] * 150, "v": range(150)})
    right = pd.DataFrame({"k": [7] * 150, "rpay": range(150)})
    with pytest.raises(Exception, match="max_key_rows"):
        hash_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            on="k",
            how="right",
            broadcast_threshold=0,
            max_key_rows=10_000,
        ).to_pandas()


def test_salted_group_reduce_spreads_exact_duplicate_rows():
    from kgflow.ops.shuffle import salted_group_reduce

    # the canonical count-aggregation skew: every row identical — the
    # positional salt must still spread them and the count stay exact
    df = pd.DataFrame({"k": [0] * 5000, "v": [1] * 5000})

    seen_sizes = []

    def partial(g):
        seen_sizes.append(len(g))
        return g.groupby("k", as_index=False).agg(n=("v", "size"))

    def final(g):
        return g.groupby("k", as_index=False).agg(n=("n", "sum"))

    out = salted_group_reduce(
        rd.from_pandas(df), ["k"], partial, final, salt=8, num_buckets=8
    ).to_pandas()
    assert out["n"].tolist() == [5000]
