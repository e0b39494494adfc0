"""Profiling-operator tests: nearest-rank quantile semantics and
per-column stats (nulls, exact distinct) on crafted inputs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_column_quantiles_nearest_rank_matches_duckdb():
    import duckdb

    from kgflow.ops.profile import column_quantiles

    rng = np.random.RandomState(11)
    # heavy ties + skew: quantile indexing mistakes show immediately
    vals = np.round(rng.exponential(5.0, size=5000), 2)
    vals[:500] = 1.23
    df = pd.DataFrame({"value": vals})
    out = column_quantiles(rd.from_pandas(df), "value", num_buckets=8)

    con = duckdb.connect()
    con.register("t", df)
    o = con.sql(
        """
        WITH a AS (SELECT quantile_disc(CAST(round(value*100) AS BIGINT),
                                        [0.25, 0.5, 0.75, 0.875]) AS l FROM t)
        SELECT unnest([0.25, 0.5, 0.75, 0.875]) AS q, unnest(l)/100.0 AS v FROM a
        """
    ).df()
    assert np.array_equal(out["q"].to_numpy(), o["q"].to_numpy())
    assert np.array_equal(out["v"].to_numpy(), o["v"].to_numpy())


def test_profile_columns_nulls_and_distinct():
    from kgflow.ops.profile import profile_columns

    df = pd.DataFrame(
        {
            "a": [1.0, 2.0, 2.0, np.nan, 5.0],
            "b": [0.5, 0.5, 0.5, 0.5, 0.5],
        }
    )
    out = (
        profile_columns(rd.from_pandas(df), ["a", "b"])
        .to_pandas()
        .sort_values("column")
        .reset_index(drop=True)
    )
    a, b = out.iloc[0], out.iloc[1]
    assert (a["n_rows"], a["n_null"], a["n_distinct"]) == (5, 1, 3)
    assert (a["vmin"], a["vmax"]) == (1.0, 5.0)
    assert (b["n_rows"], b["n_null"], b["n_distinct"]) == (5, 0, 1)
    assert (b["vmin"], b["vmax"]) == (0.5, 0.5)
