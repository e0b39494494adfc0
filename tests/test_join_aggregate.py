"""join_aggregate: fused join-then-aggregate with automatic hot-key
salting (round-4 verdict item 5). The planted Zipf-head join makes
`hash_join` raise its product guard; `join_aggregate` completes via
the salted plan and matches the pandas oracle exactly."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _zipf_frames():
    # hot key 7: 600 left rows x 500 right rows = 300k product;
    # cold keys: a few rows each
    rng = np.random.RandomState(0)
    lk = np.concatenate([np.full(600, 7), rng.randint(100, 120, 200)])
    rk = np.concatenate([np.full(500, 7), rng.randint(100, 120, 150)])
    left = pd.DataFrame(
        {
            "k": lk.astype(np.int64),
            "lv": np.arange(len(lk), dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rk.astype(np.int64),
            "rv": np.arange(len(rk), dtype=np.int64) * 10,
        }
    )
    return left, right


def test_hash_join_raises_on_zipf_head():
    from kgflow.ops.joins import hash_join

    left, right = _zipf_frames()
    with pytest.raises(Exception, match="join_aggregate"):
        hash_join(
            rd.from_pandas(left),
            rd.from_pandas(right),
            on="k",
            max_key_rows=100_000,
            right_small=False,
        ).to_pandas()


def test_join_aggregate_salts_the_hot_key():
    from kgflow.ops.joins import join_aggregate

    left, right = _zipf_frames()

    def partial(j: pd.DataFrame) -> pd.DataFrame:
        return j.groupby("k", as_index=False).agg(
            n=("rv", "size"), s=("rv", "sum")
        )

    def final(p: pd.DataFrame) -> pd.DataFrame:
        out = p.groupby("k", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum")
        )
        return out.astype({"n": np.int64, "s": np.int64})

    out = (
        join_aggregate(
            rd.from_pandas(left),
            rd.from_pandas(right),
            on="k",
            partial_fn=partial,
            final_fn=final,
            agg_keys="k",
            hot_product_rows=100_000,  # same bar hash_join raises at
            salt=8,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    oracle = (
        left.merge(right, on="k")
        .groupby("k", as_index=False)
        .agg(n=("rv", "size"), s=("rv", "sum"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"n": np.int64, "s": np.int64}), oracle
    )


def test_join_aggregate_no_hot_keys_still_exact():
    from kgflow.ops.joins import join_aggregate

    left = pd.DataFrame({"k": [1, 1, 2, 3], "lv": [1, 2, 3, 4]})
    right = pd.DataFrame({"k": [1, 2, 2, 9], "rv": [10, 20, 30, 40]})

    def partial(j):
        return j.groupby("k", as_index=False).agg(n=("rv", "size"))

    def final(p):
        return (
            p.groupby("k", as_index=False)
            .agg(n=("n", "sum"))
            .astype({"n": np.int64})
        )

    out = (
        join_aggregate(
            rd.from_pandas(left),
            rd.from_pandas(right),
            on="k",
            partial_fn=partial,
            final_fn=final,
            agg_keys="k",
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    oracle = (
        left.merge(right, on="k")
        .groupby("k", as_index=False)
        .agg(n=("rv", "size"))
        .sort_values("k")
        .reset_index(drop=True)
        .astype({"n": np.int64})
    )
    pd.testing.assert_frame_equal(out.astype({"n": np.int64}), oracle)
