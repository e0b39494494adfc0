"""Wave-7 operator tests: global top-k combiner, ordered collect
truncation, MAD outliers on planted anomalies, collocation/BM25 edge
semantics (the full-corpus parity vs DuckDB is in test_entry.py via
oracle_sql auto-parametrization)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_global_topk_matches_sorted_head_across_blocks():
    from kgflow.ops.shuffle import global_topk

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {"x": rng.randint(0, 50, size=2000), "id": np.arange(2000, dtype=np.int64)}
    )
    ds = rd.from_pandas(df).repartition(13)  # force multi-block combiner path
    out = (
        global_topk(ds, sort_cols=["x", "id"], ascending=[False, True], k=25)
        .to_pandas()
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["x", "id"], ascending=[False, True])
        .head(25)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.sort_values(["x", "id"], ascending=[False, True]).reset_index(drop=True),
        exp,
    )


def test_ordered_collect_orders_and_truncates():
    from kgflow.ops.relational import ordered_collect

    # group 1: 5 items shuffled across blocks; group 2: exceeds max_items
    rows = []
    for i in range(5):
        rows.append({"g": 1, "o": 5 - i, "id": i, "v": f"a{5 - i}"})
    for i in range(8):
        rows.append({"g": 2, "o": i, "id": i, "v": f"b{i}"})
    df = pd.DataFrame(rows).sample(frac=1.0, random_state=3).reset_index(drop=True)
    ds = rd.from_pandas(df).repartition(4)
    out = (
        ordered_collect(ds, "g", ["o", "id"], "v", sep=">", max_items=3)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert out.loc[0, "n_events"] == 5
    assert out.loc[0, "path"] == "a1>a2>a3"  # sorted by o, truncated at 3
    assert out.loc[1, "n_events"] == 8
    assert out.loc[1, "path"] == "b0>b1>b2"


def test_mad_outliers_flags_planted_anomalies_only():
    from kgflow.ops.profile import mad_outliers

    rng = np.random.RandomState(5)
    base = np.round(rng.normal(50.0, 2.0, size=1000), 2)
    df = pd.DataFrame(
        {
            "event_id": np.arange(1004, dtype=np.int64),
            "event_type": ["a"] * 1000 + ["a"] * 2 + ["b"] * 2,
            "value": np.concatenate([base, [500.0, -400.0], [1.0, 1.0]]),
        }
    )
    ds = rd.from_pandas(df).repartition(6)
    out = mad_outliers(ds, ["event_type"], "value", k=3.0).to_pandas()
    flagged = set(out["event_id"].tolist())
    assert {1000, 1001} <= flagged  # the planted a-group anomalies
    # group b is constant → median = value, MAD = 0, 0 > 0 is false
    assert not any(e in flagged for e in (1002, 1003))
    # 3·MAD ≈ 2.02σ for a normal → ~4.6% two-sided tail of the 1000
    # a-group rows flags; allow that plus slack, reject gross blowups
    assert len(flagged) <= 2 + 80


def test_collocations_min_count_and_rational_ratio():
    from kgflow.ops.text import collocations

    # "x y" appears 6×, "y z" 2× (below min_count); vocabulary tiny so
    # the exact ratio is checkable by hand
    texts = ["x y"] * 6 + ["y z"] * 2
    df = pd.DataFrame({"doc_id": np.arange(8, dtype=np.int64), "text": texts})
    out = (
        collocations(rd.from_pandas(df).repartition(3), min_count=5, k=10)
        .to_pandas()
        .reset_index(drop=True)
    )
    assert len(out) == 1
    r = out.iloc[0]
    # N = 16 tokens; c_xy=6, c_x=6, c_y=8 → ratio = 6*16/(6*8) = 2.0
    assert (r["a"], r["b"], r["c_ab"]) == ("x", "y", 6)
    assert r["ratio"] == 2.0


def test_bm25_zero_hit_docs_dropped_and_df_term_ranks_higher():
    from kgflow.ops.text import bm25_topk

    # doc 0 mentions the rare term, doc 1 the common one, doc 2 neither
    df = pd.DataFrame(
        {
            "doc_id": np.array([0, 1, 2], dtype=np.int64),
            "text": [
                "rare filler filler filler",
                "common filler filler filler",
                "filler filler filler filler",
            ],
        }
    )
    # 'common' also appears in a fourth doc → higher df → lower idf
    df = pd.concat(
        [df, pd.DataFrame({"doc_id": [3], "text": ["common pad pad pad"]})],
        ignore_index=True,
    )
    out = bm25_topk(
        rd.from_pandas(df).repartition(2), ("rare", "common"), k=10
    ).to_pandas()
    assert set(out["doc_id"]) == {0, 1, 3}  # doc 2 has score 0 → dropped
    top = out.sort_values(["score", "doc_id"], ascending=[False, True]).iloc[0]
    assert top["doc_id"] == 0  # rare term outranks common at equal tf/dl


def test_funnel_requires_strict_order():
    from kgflow.ops.window import funnel_counts

    # user 1: A then B (converts); user 2: B then A (step 2 NOT reached
    # by the pre-A B, but a later B is absent → stops at step 1);
    # user 3: A only; user 4: A and B at the SAME ts — event_id breaks
    # the tie (B's id is higher → counts)
    t = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    df = pd.DataFrame(
        [
            (1, t, 1, "A"), (1, t + h, 2, "B"),
            (2, t, 3, "B"), (2, t + h, 4, "A"),
            (3, t, 5, "A"),
            (4, t, 6, "A"), (4, t, 7, "B"),
        ],
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    out = funnel_counts(rd.from_pandas(df).repartition(3), ["A", "B"])
    got = dict(zip(out["step"], out["n_users"]))
    assert got == {"A": 4, "B": 2}  # users 1 and 4 convert


def test_cohort_retention_triangle():
    from kgflow.ops.window import cohort_retention

    # user 1 first active week 0, active weeks 0 and 2;
    # user 2 first active week 1, active week 1 only (two events,
    # deduped to one (user, week) pair)
    w0 = pd.Timestamp("2024-01-01")  # a Monday
    wk = pd.Timedelta(days=7)
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2],
            "ts": [w0 + pd.Timedelta(days=2), w0 + 2 * wk, w0 + wk, w0 + wk + pd.Timedelta(hours=5)],
        }
    )
    out = (
        cohort_retention(rd.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values(["cohort_week", "week_no"])
        .reset_index(drop=True)
    )
    rows = {(r.cohort_week, int(r.week_no)): int(r.n_users) for r in out.itertuples()}
    assert rows == {(w0, 0): 1, (w0, 2): 1, (w0 + wk, 0): 1}


def test_triangle_count_known_graph():
    from kgflow.ops.graph import triangle_count

    # K4 on {0,1,2,3} (4 triangles) + dangling edge (3,9) + isolated
    # edge (10,11): total 4
    import itertools

    e = list(itertools.combinations(range(4), 2)) + [(3, 9), (10, 11)]
    df = pd.DataFrame(e, columns=["u", "v"]).astype("int64")
    out = triangle_count(rd.from_pandas(df).repartition(3))
    out_dist = triangle_count(
        rd.from_pandas(df).repartition(3), driver_limit=0
    )
    assert out_dist.equals(out)
    assert out.iloc[0]["n_triangles"] == 4


def test_cooccurrence_edges_and_hot_cell_guard():
    from kgflow.ops.graph import cooccurrence_edges

    df = pd.DataFrame(
        {
            "who": [1, 2, 3, 1, 2, 1],
            "cell": ["a", "a", "a", "b", "b", "c"],
        }
    )
    out = (
        cooccurrence_edges(rd.from_pandas(df).repartition(2), "who", ["cell"])
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    # cell a: (1,2),(1,3),(2,3); cell b adds nothing new beyond (1,2)
    assert [tuple(r) for r in out.to_numpy()] == [(1, 2), (1, 3), (2, 3)]

    with pytest.raises(Exception, match="max_cell"):
        cooccurrence_edges(
            rd.from_pandas(df), "who", ["cell"], max_cell=2
        ).materialize()


def test_path_ngrams_respects_user_boundaries():
    from kgflow.ops.window import path_ngrams

    # user 1: A B C A B C → (A,B,C)×2, (B,C,A)×1, (C,A,B)×1
    # user 2: C A B → (C,A,B)×1 — and NO cross-user gram bridges
    t = pd.Timestamp("2024-01-01")
    s = pd.Timedelta(seconds=1)
    rows = []
    for i, e in enumerate("ABCABC"):
        rows.append((1, t + i * s, i, e))
    for i, e in enumerate("CAB"):
        rows.append((2, t + i * s, 10 + i, e))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id", "event_type"])
    out = (
        path_ngrams(rd.from_pandas(df).repartition(3), n=3, k=10)
        .to_pandas()
        .sort_values(["cnt", "g0", "g1", "g2"], ascending=[False, True, True, True])
        .reset_index(drop=True)
    )
    got = {(r.g0, r.g1, r.g2): int(r.cnt) for r in out.itertuples()}
    assert got == {
        ("A", "B", "C"): 2,
        ("B", "C", "A"): 1,
        ("C", "A", "B"): 2,
    }


def test_simpson_diversity_hand_values():
    from kgflow.ops.text import simpson_diversity

    df = pd.DataFrame(
        {
            "doc_id": np.array([0, 1, 2], dtype=np.int64),
            "text": ["a a a a", "a b c d", ""],
        }
    )
    out = (
        simpson_diversity(rd.from_pandas(df).repartition(2))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[0, "simpson"] == 1.0  # one token repeated: 16/16
    assert out.loc[1, "simpson"] == 0.25  # uniform over 4: 4/16
    assert 2 not in out.index  # zero-token doc absent (matches SQL)
