"""Wave-24..27 operator tests: PMI collocations, TPC-H Q8/Q12/Q21
shapes, degree assortativity, moving median, hapax profile, grouped
first/last — edge cases the auto-parametrized oracle parity can't
reach (partition invariance, ties, windows shorter than the frame,
cross-block groups, empty inputs)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_pmi_counts_and_value():
    from kgflow.ops.text import pmi_collocations

    # bigrams: (a,b)x2 and (b,a)x2 (one crossing into doc 2);
    # unigrams a=3 b=3 => 6 tokens, 4 pairs
    df = pd.DataFrame({"text": ["a b a b", "b a"]})
    out = (
        pmi_collocations(rd.from_pandas(df).repartition(2), min_count=2)
        .to_pandas()
        .set_index(["tok_a", "tok_b"])
    )
    assert out.loc[("a", "b"), "c_ab"] == 2
    assert out.loc[("b", "a"), "c_ab"] == 2
    expected = np.log((2 * 6 * 6) / (4 * 3 * 3))
    assert out.loc[("a", "b"), "pmi"] == pytest.approx(expected, rel=1e-12)
    # min_count filters BOTH below threshold
    empty = pmi_collocations(rd.from_pandas(df), min_count=3).to_pandas()
    assert len(empty) == 0


def test_pmi_does_not_cross_doc_boundary():
    from kgflow.ops.text import pmi_collocations

    # "y x" only arises across the seam of the two docs
    df = pd.DataFrame({"text": ["x y", "x y"]})
    out = pmi_collocations(rd.from_pandas(df), min_count=2).to_pandas()
    pairs = set(zip(out["tok_a"], out["tok_b"]))
    assert pairs == {("x", "y")}


def test_degree_assortativity_star_vs_matching():
    from kgflow.ops.graph import degree_assortativity

    # star: one src to 3 dsts (dx=3, dy=1 each) + duplicate edge rows
    # that must dedup before the moments
    df = pd.DataFrame(
        {"src": [1, 1, 1, 1], "dst": [10, 11, 12, 12]}
    )
    out = degree_assortativity(rd.from_pandas(df).repartition(2)).to_pandas()
    row = out.iloc[0]
    assert row["n"] == 3
    assert row["sx"] == 9 and row["sy"] == 3
    assert row["sxx"] == 27 and row["syy"] == 3 and row["sxy"] == 9


def test_degree_assortativity_matches_numpy_corr():
    from kgflow.ops.graph import degree_assortativity

    rng = np.random.default_rng(7)
    e = pd.DataFrame(
        {"src": rng.integers(0, 20, 300), "dst": rng.integers(0, 15, 300)}
    ).drop_duplicates()
    out = degree_assortativity(rd.from_pandas(e).repartition(4)).to_pandas()
    r = out.iloc[0]
    dx = e.groupby("src")["dst"].size()
    dy = e.groupby("dst")["src"].size()
    x = e["src"].map(dx).to_numpy(dtype=np.float64)
    y = e["dst"].map(dy).to_numpy(dtype=np.float64)
    num = r["n"] * r["sxy"] - r["sx"] * r["sy"]
    den = np.sqrt(
        (r["n"] * r["sxx"] - r["sx"] ** 2) * (r["n"] * r["syy"] - r["sy"] ** 2)
    )
    assert num / den == pytest.approx(np.corrcoef(x, y)[0, 1], rel=1e-12)


def test_moving_median_matches_pandas_and_crosses_blocks():
    from kgflow.ops.window import moving_median

    rng = np.random.default_rng(3)
    n = 200
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 5, n),
            "ts": pd.to_datetime(rng.integers(0, 10_000, n), unit="s"),
            "event_id": np.arange(n, dtype=np.int64),
            "value": rng.normal(size=n).round(2),
        }
    )
    out = (
        moving_median(rd.from_pandas(df).repartition(7), window=5)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"])
    med = (
        ref.groupby("user_id")["value"]
        .rolling(5, min_periods=1)
        .median()
        .droplevel(0)
    )
    ref = ref.assign(med=med).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(out["med"], ref["med"], check_names=False)


def test_moving_median_window_longer_than_group():
    from kgflow.ops.window import moving_median

    df = pd.DataFrame(
        {
            "user_id": [1, 1],
            "ts": pd.to_datetime([1, 2], unit="s"),
            "event_id": [1, 2],
            "value": [1.0, 2.0],
        }
    )
    out = moving_median(rd.from_pandas(df), window=5).to_pandas()
    got = out.set_index("event_id")["med"]
    assert got.loc[1] == 1.0 and got.loc[2] == 1.5  # even frame -> (a+b)/2


def test_hapax_stats_counts():
    from kgflow.ops.text import hapax_stats

    df = pd.DataFrame({"text": ["a a b c", "c d"]})
    out = hapax_stats(rd.from_pandas(df).repartition(2)).to_pandas().iloc[0]
    # a=2, b=1, c=2 (cross-block!), d=1
    assert out["n_tokens"] == 6 and out["n_vocab"] == 4
    assert out["n_hapax"] == 2
    assert out["hapax_ratio"] == pytest.approx(0.5)


def test_first_last_combiner_survives_partitioning():
    from kgflow.ops.window import grouped_first_last

    rng = np.random.default_rng(11)
    n = 150
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 8, n),
            "ts": pd.to_datetime(rng.integers(0, 500, n), unit="s"),
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": rng.choice(["x", "y", "z"], n),
            "value": rng.normal(size=n).round(3),
        }
    )
    for parts in (1, 6):
        out = (
            grouped_first_last(rd.from_pandas(df).repartition(parts))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        ref_rows = []
        for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
            ref_rows.append(
                {
                    "user_id": uid,
                    "first_type": g.iloc[0]["event_type"],
                    "first_value": g.iloc[0]["value"],
                    "last_type": g.iloc[-1]["event_type"],
                    "last_value": g.iloc[-1]["value"],
                }
            )
        ref = pd.DataFrame(ref_rows).sort_values("user_id").reset_index(
            drop=True
        )
        pd.testing.assert_frame_equal(out[ref.columns], ref)


def test_q21_unique_slowest_only():
    from kgflow.ops.relational import q21_slowest_supplier
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        # order 1: supplier 7 strictly slowest of {7, 8} -> counts
        # order 2: tie at the max between {7, 8}        -> excluded
        # order 3: single supplier                       -> excluded
        li = pd.DataFrame(
            {
                "l_orderkey": [1, 1, 1, 2, 2, 3],
                "l_suppkey": [7, 7, 8, 7, 8, 7],
                "l_shipdate": pd.to_datetime(
                    [
                        "2020-01-05",
                        "2020-01-09",
                        "2020-01-02",
                        "2020-02-01",
                        "2020-02-01",
                        "2020-03-01",
                    ]
                ),
            }
        )
        sup = pd.DataFrame(
            {"s_suppkey": [7, 8], "s_name": ["S7", "S8"]}
        )
        li.to_parquet(os.path.join(d, "lineitem.parquet"))
        sup.to_parquet(os.path.join(d, "supplier.parquet"))
        out = q21_slowest_supplier(d).to_pandas()
        assert dict(zip(out["s_name"], out["numwait"])) == {"S7": 1}


def test_grouped_mad_matches_manual():
    from kgflow.ops.profile import grouped_mad

    df = pd.DataFrame(
        {
            "k": ["a"] * 4 + ["b"] * 3,
            "value": [1.0, 2.0, 4.0, 100.0, 5.0, 5.0, 9.0],
        }
    )
    out = (
        grouped_mad(rd.from_pandas(df).repartition(3), key="k")
        .to_pandas()
        .set_index("k")
    )
    # a: med=(2+4)/2=3, |dev|=[2,1,1,97] -> mad=(1+2)/2=1.5
    assert out.loc["a", "med"] == 3.0 and out.loc["a", "mad"] == 1.5
    # b: med=5, |dev|=[0,0,4] -> mad=0
    assert out.loc["b", "med"] == 5.0 and out.loc["b", "mad"] == 0.0


def test_chi2_dense_vs_op_with_absent_cell():
    from kgflow.ops.profile import chi2_independence

    # 2x2 with one absent cell (r2, c2)
    df = pd.DataFrame(
        {
            "r": ["r1"] * 30 + ["r2"] * 20,
            "c": ["c1"] * 10 + ["c2"] * 20 + ["c1"] * 20,
        }
    )
    out = chi2_independence(
        rd.from_pandas(df).repartition(4), row_col="r", col_col="c"
    ).to_pandas().iloc[0]
    # dense manual chi2 including the zero cell
    tab = pd.crosstab(df["r"], df["c"]).to_numpy(dtype=np.float64)
    n = tab.sum()
    e = np.outer(tab.sum(axis=1), tab.sum(axis=0)) / n
    chi2 = ((tab - e) ** 2 / e).sum()
    assert out["n"] == 50 and out["dof"] == 1
    assert out["chi2"] == pytest.approx(chi2, rel=1e-12)


def test_local_clustering_known_graph():
    from kgflow.ops.graph import local_clustering

    # K4 on {0,1,2,3}: every node deg 3, tri 3, lcc 1.0; tail (3,9)
    # makes node 3 deg 4, tri 3, lcc = 2*3/(4*3) = 0.5; node 9 deg 1
    # lcc 0; isolated edge (10,11): deg 1, tri 0, lcc 0.
    import itertools

    e = list(itertools.combinations(range(4), 2)) + [(3, 9), (10, 11)]
    df = pd.DataFrame(e, columns=["u", "v"]).astype("int64")
    out = (
        local_clustering(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .set_index("node")
        .sort_index()
    )
    out_dist = (
        local_clustering(rd.from_pandas(df).repartition(3), driver_limit=0)
        .to_pandas()
        .set_index("node")
        .sort_index()
    )
    pd.testing.assert_frame_equal(out, out_dist)
    assert out.loc[0, "deg"] == 3 and out.loc[0, "tri"] == 3
    assert out.loc[0, "lcc"] == pytest.approx(1.0)
    assert out.loc[3, "deg"] == 4 and out.loc[3, "tri"] == 3
    assert out.loc[3, "lcc"] == pytest.approx(0.5)
    assert out.loc[9, "deg"] == 1 and out.loc[9, "tri"] == 0
    assert out.loc[9, "lcc"] == 0.0
    assert out.loc[10, "tri"] == 0 and out.loc[11, "lcc"] == 0.0
    assert len(out) == 7
