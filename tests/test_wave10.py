"""Wave-10/11 operator tests: bigram LM argmax, grouped bivariate
moments, weighted bottom-k sampling, degree histogram, Dice pairs,
Markov transitions, market-basket support, table checksum — edge cases
the auto-parametrized oracle parity can't reach (guards, invariances,
empty inputs)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_bigram_successors_crosses_no_doc_boundary():
    from kgflow.ops.text import bigram_successors

    # "x y" would only arise across the doc seam — must NOT count
    df = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["a b a b x", "y a b"]}
    )
    out = bigram_successors(rd.from_pandas(df).repartition(2)).to_pandas()
    out = out.set_index("token")
    assert out.loc["a", "next_token"] == "b"
    assert out.loc["a", "pair_n"] == 3
    assert "x" not in out.index  # doc-final token has no successor
    # tie between successors resolves lexicographically-first
    assert out.loc["b", "next_token"] == "a"


def test_bigram_successors_tie_breaks_lexicographic():
    from kgflow.ops.text import bigram_successors

    df = pd.DataFrame({"doc_id": [1], "text": ["t z t a t z t a"]})
    out = bigram_successors(rd.from_pandas(df)).to_pandas().set_index("token")
    # "t a" and "t z" both occur twice -> 'a' wins
    assert out.loc["t", "next_token"] == "a"


def test_grouped_corr_moments_match_numpy():
    from kgflow.ops.profile import grouped_corr_moments

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "k": np.repeat(["a", "b"], 500),
            "x": rng.uniform(0, 100, 1000).round(2),
            "y": rng.randint(0, 50, 1000).astype(float),
        }
    )
    out = (
        grouped_corr_moments(
            rd.from_pandas(df).repartition(7), "k", "x", "y", x_scale=100
        )
        .to_pandas()
        .set_index("k")
    )
    for grp, sub in df.groupby("k"):
        xq = np.floor(sub["x"].to_numpy() * 100).astype(np.int64)
        yq = np.floor(sub["y"].to_numpy()).astype(np.int64)
        assert out.loc[grp, "n"] == len(sub)
        assert out.loc[grp, "sxy"] == int((xq * yq).sum())
        assert out.loc[grp, "sxx"] == int((xq * xq).sum())


def test_grouped_corr_moments_overflow_guard():
    from kgflow.ops.profile import grouped_corr_moments

    df = pd.DataFrame({"k": ["a"], "x": [4.0e9], "y": [1.0]})
    with pytest.raises(Exception, match="overflow"):
        grouped_corr_moments(
            rd.from_pandas(df), "k", "x", "y", x_scale=100
        ).materialize()


def test_weighted_bottomk_partitioning_invariant_and_biased():
    from kgflow.ops.sketch import _fnv1a_decimal, weighted_bottomk

    n = 4000
    ids = np.arange(n, dtype=np.int64)
    w = np.where(ids % 2 == 0, 1000, 1).astype(np.int64)
    df = pd.DataFrame({"doc_id": ids, "w": w})
    outs = []
    for parts in (1, 9):
        out = weighted_bottomk(
            rd.from_pandas(df).repartition(parts), "doc_id", "w", k=200
        ).to_pandas()
        outs.append(out.sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # heavy ids (w=1000) must dominate the sample
    heavy = (outs[0]["doc_id"] % 2 == 0).mean()
    assert heavy > 0.9
    # exact replay: priority = fnv // w, k smallest
    pri = _fnv1a_decimal(ids) // w.astype(np.uint64)
    expect = ids[np.lexsort((ids, pri))[:200]]
    assert sorted(outs[0]["doc_id"]) == sorted(expect.tolist())


def test_weighted_bottomk_rejects_zero_weight():
    from kgflow.ops.sketch import weighted_bottomk

    df = pd.DataFrame({"doc_id": [1, 2], "w": [0, 5]})
    with pytest.raises(Exception, match="weights >= 1"):
        weighted_bottomk(rd.from_pandas(df), "doc_id", "w", k=2).materialize()


def test_degree_histogram_path_graph():
    from kgflow.ops.graph import degree_histogram

    # path 1-2-3-4: degrees 1,2,2,1 -> {1: 2, 2: 2}
    edges = pd.DataFrame({"u": [1, 2, 3], "v": [2, 3, 4]})
    out = (
        degree_histogram(rd.from_pandas(edges).repartition(2))
        .to_pandas()
        .set_index("degree")["n_nodes"]
    )
    assert out.to_dict() == {1: 2, 2: 2}


def test_dice_pairs_vs_direct():
    from kgflow.ops.dedup import jaccard_pairs

    a = "the quick brown fox jumps over the lazy dog again"
    b = "the quick brown fox jumps over the lazy dog tonight"
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [a, b, "zz yy xx ww vv uu tt ss"]})
    out = jaccard_pairs(
        rd.from_pandas(df), k=3, threshold=0.5, measure="dice"
    ).to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {(1, 2)}

    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    inter = len(sh(a) & sh(b))
    dice = 2 * inter / (len(sh(a)) + len(sh(b)))
    assert out["sim"].iloc[0] == pytest.approx(dice)


def test_transition_counts_orders_by_ts_then_id():
    from kgflow.ops.window import transition_counts

    ts = pd.to_datetime([0, 0, 10, 20], unit="s")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "event_type": ["b", "a", "c", "a"],
            "ts": ts,
            "event_id": [2, 1, 3, 4],  # tie at t=0 broken by id: a then b
        }
    )
    out = transition_counts(rd.from_pandas(df).repartition(2)).to_pandas()
    got = {(r.from_cat, r.to_cat): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "c"): 1}


def test_item_pair_support_counts():
    from kgflow.ops.graph import item_pair_support

    df = pd.DataFrame(
        {
            "basket": [1, 1, 1, 2, 2, 3, 3, 3],
            "item": ["x", "y", "y", "x", "y", "x", "z", "y"],
        }
    )
    out = item_pair_support(
        rd.from_pandas(df).repartition(3), "basket", "item"
    ).to_pandas()
    row = out.set_index(["item_a", "item_b"]).loc[("x", "y")]
    assert row["n_ab"] == 3 and row["n_a"] == 3 and row["n_b"] == 3
    assert row["n_baskets"] == 3
    row2 = out.set_index(["item_a", "item_b"]).loc[("x", "z")]
    assert row2["n_ab"] == 1 and row2["n_b"] == 1


def test_item_pair_support_hot_basket_guard():
    from kgflow.ops.graph import item_pair_support

    df = pd.DataFrame(
        {"basket": [1] * 30, "item": [f"i{j}" for j in range(30)]}
    )
    with pytest.raises(Exception, match="max_basket"):
        item_pair_support(
            rd.from_pandas(df), "basket", "item", max_basket=10
        ).materialize()


def test_table_checksum_order_and_partition_invariant():
    from kgflow.ops.checks import table_checksum

    df = pd.DataFrame(
        {"doc_id": np.arange(100, dtype=np.int64), "n": np.arange(100) * 7}
    )
    shuffled = df.sample(frac=1.0, random_state=5).reset_index(drop=True)
    a = table_checksum(rd.from_pandas(df).repartition(1), ["doc_id", "n"]).to_pandas()
    b = table_checksum(
        rd.from_pandas(shuffled).repartition(8), ["doc_id", "n"]
    ).to_pandas()
    assert a["checksum"].iloc[0] == b["checksum"].iloc[0]
    assert a["n_rows"].iloc[0] == b["n_rows"].iloc[0] == 100
    # any single-row change must flip the fingerprint
    df2 = df.copy()
    df2.loc[50, "n"] = 351
    c = table_checksum(rd.from_pandas(df2), ["doc_id", "n"]).to_pandas()
    assert c["checksum"].iloc[0] != a["checksum"].iloc[0]


def test_weighted_bottomk_grouped_quota():
    from kgflow.ops.sketch import _fnv1a_decimal, weighted_bottomk

    n = 1000
    ids = np.arange(n, dtype=np.int64)
    df = pd.DataFrame(
        {
            "g": np.where(ids % 3 == 0, "a", "b"),
            "doc_id": ids,
            "w": (ids % 9 + 1).astype(np.int64),
        }
    )
    out = weighted_bottomk(
        rd.from_pandas(df).repartition(5), "doc_id", "w", k=10,
        group_cols=["g"],
    ).to_pandas()
    assert out.groupby("g").size().to_dict() == {"a": 10, "b": 10}
    # exact replay per group
    pri = _fnv1a_decimal(ids) // df["w"].to_numpy(dtype=np.uint64)
    for g, sub in df.assign(pri=pri).groupby("g"):
        expect = sub.sort_values(["pri", "doc_id"]).head(10)["doc_id"]
        assert sorted(out.loc[out["g"] == g, "doc_id"]) == sorted(expect)


def test_regex_extract_spans_long_format():
    from kgflow.ops.text import regex_extract_spans

    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["mail a@b.c and d@e.f", "no matches here"],
        }
    )
    out = regex_extract_spans(
        rd.from_pandas(df), patterns={"email": r"[\w.]+@[\w.]+"}
    ).to_pandas()
    assert sorted(out["match"]) == ["a@b.c", "d@e.f"]
    assert set(out["doc_id"]) == {1}


def test_k_core_triangle_with_tail():
    from kgflow.ops.graph import k_core

    # triangle 1-2-3 plus tail 3-4-5: the 2-core is exactly the triangle
    edges = pd.DataFrame({"u": [1, 1, 2, 3, 4], "v": [2, 3, 3, 4, 5]})
    out = k_core(rd.from_pandas(edges).repartition(2), k=2).to_pandas()
    assert sorted(out["node"]) == [1, 2, 3]
    assert set(out["core_deg"] if "core_deg" in out else out["deg"]) == {2}


def test_k_core_empties_below_k():
    from kgflow.ops.graph import k_core

    # a path has no 2-core at all
    edges = pd.DataFrame({"u": [1, 2, 3], "v": [2, 3, 4]})
    out = k_core(rd.from_pandas(edges), k=2).to_pandas()
    assert len(out) == 0


def test_k_core_deep_peel_chain():
    from kgflow.ops.graph import k_core

    # clique K4 with a long pendant chain: peeling eats the chain one
    # round at a time; the 2-core is the clique
    chain = [(10 + i, 11 + i) for i in range(6)]
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    edges = pd.DataFrame(k4 + [(4, 10)] + chain, columns=["u", "v"])
    out = k_core(rd.from_pandas(edges).repartition(3), k=2).to_pandas()
    assert sorted(out["node"]) == [1, 2, 3, 4]


def test_csv_roundtrip_checksum_matches_parquet():
    from kgflow.ops.checks import table_checksum

    df = pd.DataFrame(
        {"doc_id": np.arange(50, dtype=np.int64), "n_chars": np.arange(50) + 1}
    )
    import shutil

    out = "/tmp/kgflow_test_csv_rt"
    shutil.rmtree(out, ignore_errors=True)
    rd.from_pandas(df).repartition(4).write_csv(out)
    back = rd.read_csv(out)
    a = table_checksum(rd.from_pandas(df), ["doc_id", "n_chars"]).to_pandas()
    b = table_checksum(back, ["doc_id", "n_chars"]).to_pandas()
    assert a["checksum"].iloc[0] == b["checksum"].iloc[0]


def test_pareto_front_duplicates_and_ties():
    from kgflow.ops.shuffle import pareto_front

    # maximize x, minimize y. (5,1) dominates everything except its
    # duplicate; equal pairs are mutually non-dominated and both kept.
    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5],
            "x": [5.0, 5.0, 4.0, 5.0, 3.0],
            "y": [1, 1, 1, 2, 0],
        }
    )
    out = pareto_front(
        rd.from_pandas(df).repartition(3), "x", "y"
    ).to_pandas()
    # (5,1)x2 survive; (4,1) dominated by (5,1); (5,2) dominated by
    # (5,1); (3,0) survives (strictly better y)
    assert sorted(out["id"]) == [1, 2, 5]


def test_interval_concurrency_exact_vs_bruteforce():
    from kgflow.ops.window import interval_concurrency_daily

    rng = np.random.RandomState(7)
    n = 400
    base = np.datetime64("2024-01-01", "us").astype(np.int64)
    ts = base + rng.randint(0, 3 * 86_400_000_000, size=n)
    df = pd.DataFrame({"ts": ts.astype("datetime64[us]")})

    out = (
        interval_concurrency_daily(
            rd.from_pandas(df).repartition(5), duration_min=30, num_buckets=7
        )
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )

    # brute force: sweep all boundaries in (t, delta) order
    dur = 30 * 60 * 1_000_000
    t = np.concatenate([ts, ts + dur])
    d = np.concatenate([np.ones(n, np.int64), -np.ones(n, np.int64)])
    order = np.lexsort((d, t))
    conc = d[order].cumsum()
    day = (t[order] // 86_400_000_000) * 86_400_000_000
    ref = (
        pd.DataFrame({"day": day.astype("datetime64[us]"), "c": conc})
        .groupby("day", as_index=False)["c"]
        .max()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert list(out["day"]) == list(ref["day"])
    assert list(out["max_concurrent"]) == list(ref["c"])


def test_snapshot_diff_classifies_all_kinds():
    from kgflow.ops.checks import snapshot_diff

    old = pd.DataFrame(
        {"k": np.array([1, 2, 3, 4], dtype=np.int64),
         "v": np.array([10, 20, 30, 40], dtype=np.int64)}
    )
    new = pd.DataFrame(
        {"k": np.array([2, 3, 4, 5], dtype=np.int64),
         "v": np.array([20, 31, 40, 50], dtype=np.int64)}
    )
    out = (
        snapshot_diff(
            rd.from_pandas(old).repartition(2),
            rd.from_pandas(new).repartition(3),
            key_col="k",
            cols=["v"],
        )
        .to_pandas()
        .sort_values("k")
    )
    got = dict(zip(out["k"], out["change"]))
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_global_row_number_matches_lexsort():
    from kgflow.ops.shuffle import global_row_number

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "v": rng.randint(0, 50, size=300).astype(np.int64),
            "id": np.arange(300, dtype=np.int64),
        }
    )
    out = (
        global_row_number(
            rd.from_pandas(df).repartition(5),
            sort_cols=["v", "id"],
            num_buckets=7,
        )
        .to_pandas()
        .sort_values("row_num")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["v", "id"]).reset_index(drop=True)
    assert list(out["id"]) == list(ref["id"])
    assert list(out["row_num"]) == list(range(1, 301))


def test_hits_matches_dense_reference():
    from kgflow.ops.graph import hits

    rng = np.random.RandomState(11)
    n = 12
    src, dst = [], []
    for u in range(n):
        for v in rng.choice(n, size=3, replace=False):
            if u != v:
                src.append(u)
                dst.append(int(v))
    edges = pd.DataFrame(
        {"src": np.array(src, dtype=np.int64),
         "dst": np.array(dst, dtype=np.int64)}
    )

    out = (
        hits(rd.from_pandas(edges).repartition(3), iters=10)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )

    # dense reference mirroring the engine's update order exactly
    A = np.zeros((n, n))
    for u, v in zip(src, dst):
        A[u, v] += 1.0
    h = np.full(n, 1.0 / n)
    for _ in range(10):
        a = A.T @ h
        a /= a.sum()
        h = A @ a
        h /= h.sum()
    assert np.allclose(out["authority"].to_numpy(), a, atol=1e-9)
    assert np.allclose(out["hub"].to_numpy(), h, atol=1e-9)


def test_bfs_hops_chain_and_min_hop():
    from kgflow.ops.graph import bfs_hops

    # chain 0-1-2-...-9 plus a shortcut 0-5: min-hop must win
    src = list(range(9)) + [0]
    dst = list(range(1, 10)) + [5]
    edges = rd.from_pandas(
        pd.DataFrame(
            {"src": np.array(src, dtype=np.int64),
             "dst": np.array(dst, dtype=np.int64)}
        )
    ).repartition(3)

    out = (
        bfs_hops(edges, seeds=[0], max_hops=3)
        .to_pandas()
        .set_index("node")["hop"]
        .to_dict()
    )
    # shortcut: 5 is at hop 1, so 6 is at 2, 7 at 3; 4 is at hop 3
    # via the chain side; 8, 9 are beyond max_hops
    assert out == {0: 0, 1: 1, 5: 1, 2: 2, 4: 2, 6: 2, 3: 3, 7: 3}
