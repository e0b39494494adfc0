"""Reshape (pivot/melt) and per-group quantile tests against pandas
ground truth."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _events(seed=0, n=500):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "g": rng.integers(0, 6, n),
            "t": rng.choice(["a", "b", "c"], n),
            "x": rng.integers(0, 100, n).astype(np.float64),
        }
    )


def test_pivot_count_vs_pandas():
    from kgflow.ops.reshape import pivot_agg

    df = _events()
    out = (
        pivot_agg(
            rd.from_pandas(df).repartition(5),
            group_cols=["g"],
            pivot_col="t",
            values=["a", "b", "c"],
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = (
        pd.crosstab(df["g"], df["t"])
        .reindex(columns=["a", "b", "c"], fill_value=0)
        .rename(columns=lambda c: f"n_{c}")
        .reset_index()
    )
    exp.columns.name = None
    pd.testing.assert_frame_equal(out, exp.astype({f"n_{c}": np.int64 for c in "abc"}))


def test_pivot_sum_discovery_and_missing_combo():
    from kgflow.ops.reshape import pivot_agg

    df = pd.DataFrame(
        {"g": [1, 1, 2], "t": ["a", "b", "a"], "x": [1.5, 2.0, 3.25]}
    )
    # values discovered distributedly; group 2 has no 'b' → 0.0
    out = (
        pivot_agg(
            rd.from_pandas(df).repartition(2),
            group_cols=["g"],
            pivot_col="t",
            values=None,
            value_col="x",
            agg="sum",
            prefix="sum_",
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {"g": [1, 2], "sum_a": [1.5, 3.25], "sum_b": [2.0, 0.0]}
    )
    pd.testing.assert_frame_equal(out, exp)


def test_pivot_melt_roundtrip():
    from kgflow.ops.reshape import melt, pivot_agg

    df = _events(seed=1)
    wide = pivot_agg(
        rd.from_pandas(df).repartition(4),
        group_cols=["g"],
        pivot_col="t",
        values=["a", "b", "c"],
    )
    long = (
        melt(
            wide,
            id_cols=["g"],
            value_cols=["n_a", "n_b", "n_c"],
            var_name="t",
            value_name="n",
        )
        .to_pandas()
        .sort_values(["g", "t"])
        .reset_index(drop=True)
    )
    exp = (
        pd.crosstab(df["g"], df["t"])
        .reindex(columns=["a", "b", "c"], fill_value=0)
        .stack()
        .rename("n")
        .reset_index()
        .assign(t=lambda d: "n_" + d["t"])
        .sort_values(["g", "t"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(long, exp, check_dtype=False)


def test_pivot_rejects_bad_agg():
    from kgflow.ops.reshape import pivot_agg

    with pytest.raises(ValueError, match="agg"):
        pivot_agg(rd.from_pandas(_events()), ["g"], "t", ["a"], agg="mean")
    with pytest.raises(ValueError, match="value_col"):
        pivot_agg(rd.from_pandas(_events()), ["g"], "t", ["a"], agg="sum")


def test_grouped_quantiles_nearest_rank():
    from kgflow.ops.profile import grouped_quantiles

    df = _events(seed=2, n=800)
    qs = (0.25, 0.5, 0.75, 0.875)
    out = (
        grouped_quantiles(
            rd.from_pandas(df).repartition(6), group_cols=["g"], col="x", qs=qs
        )
        .to_pandas()
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )
    rows = []
    for g, sub in df.groupby("g"):
        v = np.sort(np.round(sub["x"].to_numpy() * 100).astype(np.int64))
        for q in qs:
            rank = max(int(np.ceil(q * len(v))), 1)
            rows.append({"g": g, "q": q, "v": v[rank - 1] / 100})
    exp = pd.DataFrame(rows).sort_values(["g", "q"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["g", "q", "v"]], exp, check_dtype=False)


def test_grouped_quantiles_single_row_groups():
    from kgflow.ops.profile import grouped_quantiles

    df = pd.DataFrame({"g": ["x", "y"], "v": [1.25, 9.5]})
    out = (
        grouped_quantiles(rd.from_pandas(df), ["g"], "v", qs=(0.5,))
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert list(out["v"]) == [1.25, 9.5]


def test_rollup_sum_levels_vs_pandas():
    from kgflow.ops.reshape import rollup_sum

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "a": rng.choice(["r1", "r2"], 300),
            "b": rng.choice(["x", "y", "z"], 300),
            "v": rng.integers(0, 100, 300),
        }
    )
    out = rollup_sum(
        rd.from_pandas(df).repartition(4), level_cols=["a", "b"], sum_cols=["v"]
    ).to_pandas()

    fine = df.groupby(["a", "b"], as_index=False).agg(v=("v", "sum"), n=("v", "size"))
    mid = df.groupby(["a"], as_index=False).agg(v=("v", "sum"), n=("v", "size"))
    mid["b"] = None
    grand = pd.DataFrame([{"a": None, "b": None, "v": df["v"].sum(), "n": len(df)}])
    exp = pd.concat([fine, mid, grand], ignore_index=True)[["a", "b", "v", "n"]]

    key = lambda d: sorted(
        (str(r["a"]), str(r["b"]), int(r["v"]), int(r["n"]))
        for _, r in d.iterrows()
    )
    assert key(out) == key(exp)
    # exactly fine + |a| + 1 rows
    assert len(out) == len(fine) + 2 + 1


def test_cube_sum_vs_pandas():
    from kgflow.ops.reshape import cube_sum

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "a": rng.choice(["r1", "r2", "r3"], 400),
            "b": rng.choice(["x", "y"], 400),
            "v": rng.integers(0, 100, 400),
        }
    )
    out = cube_sum(
        rd.from_pandas(df).repartition(4), level_cols=["a", "b"], sum_cols=["v"]
    ).to_pandas()

    sets = [["a", "b"], ["a"], ["b"]]
    parts = []
    for cols in sets:
        g = df.groupby(cols, as_index=False).agg(v=("v", "sum"), n=("v", "size"))
        for c in ["a", "b"]:
            if c not in cols:
                g[c] = None
        parts.append(g[["a", "b", "v", "n"]])
    parts.append(
        pd.DataFrame([{"a": None, "b": None, "v": df["v"].sum(), "n": len(df)}])
    )
    exp = pd.concat(parts, ignore_index=True)

    key = lambda d: sorted(
        (str(r["a"]), str(r["b"]), int(r["v"]), int(r["n"]))
        for _, r in d.iterrows()
    )
    assert len(out) == len(exp)
    assert key(out) == key(exp)
