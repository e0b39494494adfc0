"""Wave-29..36 operator tests: TPC-H Q2/Q11 edge semantics,
sorted-neighborhood blocking (ghost-overlap pairing across rank
buckets — the sf fixtures fit one bucket so parity never exercises
it), weighted SSSP round semantics, the source-quality gate's exact
integer bar, k-means tie-breaks under float32 storage, weighted
projection + basket guards, RANGE-window peer semantics, asymmetric
Jaccard lookup exclusions, and community-stats degree accounting."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _snm_brute(texts, key_chars=24, window=5):
    keys = [
        (" ".join(t.lower().split()) if False else None) for t in texts
    ]  # placeholder to keep regex semantics below
    import re

    rows = []
    for i, t in enumerate(texts):
        key = re.sub(r"\s+", " ", t.lower())[:key_chars]
        rows.append((key, i))
    rows.sort()
    out = set()
    for p in range(len(rows)):
        for q in range(p + 1, min(p + window + 1, len(rows))):
            out.add((rows[p][1], rows[q][1], q - p))
    return out


def test_sorted_neighborhood_crosses_rank_buckets():
    from kgflow.ops.dedup import sorted_neighborhood_pairs

    # 40 docs, rank_bucket=8 << 40: pairs MUST form across bucket
    # boundaries via the ghost overlap, exactly once each
    texts = [f"{chr(97 + i % 26)}{i:03d} body text {i}" for i in range(40)]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(40, dtype=np.int64), "text": texts})
    ).repartition(4)
    out = sorted_neighborhood_pairs(
        docs, key_chars=24, window=5, rank_bucket=8
    ).to_pandas()
    got = {
        (int(a), int(b), int(g))
        for a, b, g in zip(out["doc_a"], out["doc_b"], out["gap"])
    }
    assert got == _snm_brute(texts)
    # n*w - w(w+1)/2 candidates, no duplicates
    assert len(out) == 40 * 5 - 15
    assert not out.duplicated(["doc_a", "doc_b"]).any()


def test_sorted_neighborhood_duplicate_keys_tiebreak():
    from kgflow.ops.dedup import sorted_neighborhood_pairs

    # identical keys: order falls to doc_id; doc_a must be the
    # smaller-ranked (here smaller id) side
    docs = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": np.array([7, 3, 5], dtype=np.int64), "text": ["same"] * 3}
        )
    )
    out = (
        sorted_neighborhood_pairs(docs, window=2, rank_bucket=4)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert list(map(tuple, out[["doc_a", "doc_b"]].to_numpy())) == [
        (3, 5),
        (3, 7),
        (5, 7),
    ]


def test_sssp_weighted_chain_and_hop_bound():
    from kgflow.ops.graph import sssp_weighted

    # chain 0-1-2-3-4 with weights 5,1,1,1 plus a heavy shortcut 0-4
    e = rd.from_pandas(
        pd.DataFrame(
            {
                "src": np.array([0, 1, 2, 3, 0], dtype=np.int64),
                "dst": np.array([1, 2, 3, 4, 4], dtype=np.int64),
                "w": np.array([5, 1, 1, 1, 9], dtype=np.int64),
            }
        )
    )
    got = (
        sssp_weighted(e, seeds=[0], max_hops=4)
        .to_pandas()
        .set_index("node")["dist"]
        .to_dict()
    )
    assert got == {0: 0, 1: 5, 2: 6, 3: 7, 4: 8}
    # hop bound 1: only direct neighbors, shortcut wins for node 4
    got1 = (
        sssp_weighted(e, seeds=[0], max_hops=1)
        .to_pandas()
        .set_index("node")["dist"]
        .to_dict()
    )
    assert got1 == {0: 0, 1: 5, 4: 9}
    # hop bound 2 (undirected): 4 best via shortcut; 3 reachable
    # backwards THROUGH the shortcut (9+1) but not yet via the chain
    got2 = (
        sssp_weighted(e, seeds=[0], max_hops=2)
        .to_pandas()
        .set_index("node")["dist"]
        .to_dict()
    )
    assert got2 == {0: 0, 1: 5, 2: 6, 3: 10, 4: 9}


def test_sssp_rejects_nonpositive_weights():
    from kgflow.ops.graph import sssp_weighted

    e = rd.from_pandas(
        pd.DataFrame({"src": [0], "dst": [1], "w": [0]})
    )
    with pytest.raises(Exception):
        sssp_weighted(e, seeds=[0], max_hops=2).to_pandas()


def test_source_gate_exact_integer_bar():
    from kgflow.ops.clean import source_quality_gate

    # source a: 2 docs x 3 tokens; source b: 2 docs x 1 token.
    # global mean = 2; a passes (3 >= 2), b fails (1 < 2). A source
    # EXACTLY at the mean passes (>=): source c: 1 doc x 2 tokens.
    df = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "source": ["a", "a", "b", "b", "c"],
            "text": ["x y z", "p q r", "w", "v", "m n"],
        }
    )
    out = source_quality_gate(rd.from_pandas(df).repartition(3)).to_pandas()
    assert set(out["source"]) == {"a", "c"}
    assert len(out) == 3


def test_q11_threshold_exact_at_boundary():
    # the 110%-of-mean bar is strict (>): a corpus where every part
    # has the identical value passes NOTHING
    import os
    import tempfile

    from kgflow.ops.relational import q11_important_parts

    with tempfile.TemporaryDirectory() as d:
        pd.DataFrame(
            {"r_regionkey": [0], "r_name": ["EUROPE"]}
        ).to_parquet(os.path.join(d, "region.parquet"))
        pd.DataFrame(
            {"n_nationkey": [0], "n_regionkey": [0], "n_name": ["X"]}
        ).to_parquet(os.path.join(d, "nation.parquet"))
        pd.DataFrame(
            {"s_suppkey": [1, 2], "s_nationkey": [0, 0]}
        ).to_parquet(os.path.join(d, "supplier.parquet"))
        pd.DataFrame(
            {
                "l_partkey": np.array([10, 11, 12], dtype=np.int64),
                "l_suppkey": np.array([1, 2, 1], dtype=np.int64),
                "l_extendedprice": [100.0, 100.0, 100.0],
            }
        ).to_parquet(os.path.join(d, "lineitem.parquet"))
        out = q11_important_parts(d).to_pandas()
        assert len(out) == 0


def test_kmeans_assign_tiebreak_and_exactness():
    from kgflow.ops.ann import kmeans_assign

    # vec 2 sits exactly between seeds 0 and 1 -> tie breaks to the
    # SMALLER centroid id; quantized distances are exact integers
    emb = rd.from_pandas(
        pd.DataFrame(
            {
                "vec_id": np.array([0, 1, 2, 3], dtype=np.int64),
                "embedding": [
                    [0.0, 0.0],
                    [1.0, 0.0],
                    [0.5, 0.0],
                    [0.9, 0.1],
                ],
            }
        )
    )
    out = (
        kmeans_assign(emb, k=2, scale=10)
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    assert out.loc[2, "centroid"] == 0  # tie -> smaller cid
    assert out.loc[2, "d2"] == 25  # (5-0)^2 in scale-10 space
    assert out.loc[3, "centroid"] == 1
    # float32 storage: 0.9 -> 0.8999.. floors to 8 (not 9); this is
    # the shared engine/oracle semantics, not error
    assert out.loc[3, "d2"] == 4 + 1  # (8-10)^2 + (1-0)^2


def test_weighted_projection_counts_and_guard():
    from kgflow.ops.graph import weighted_projection

    df = pd.DataFrame(
        {
            "e": np.array([1, 2, 3, 1, 2, 1, 2], dtype=np.int64),
            "cell": ["a", "a", "a", "b", "b", "c", "c"],
        }
    )
    out = (
        weighted_projection(rd.from_pandas(df).repartition(3), "e", ["cell"])
        .to_pandas()
        .set_index(["u", "v"])["shared"]
        .to_dict()
    )
    assert out == {(1, 2): 3, (1, 3): 1, (2, 3): 1}
    with pytest.raises(Exception, match="max_cell"):
        weighted_projection(
            rd.from_pandas(df), "e", ["cell"], max_cell=2
        ).to_pandas()


def test_weighted_projection_dedups_within_cell():
    from kgflow.ops.graph import weighted_projection

    # duplicate (entity, cell) rows must count once per DISTINCT cell
    df = pd.DataFrame(
        {"e": [1, 1, 2, 2], "cell": ["a", "a", "a", "a"]}
    )
    out = weighted_projection(
        rd.from_pandas(df).repartition(2), "e", ["cell"]
    ).to_pandas()
    assert len(out) == 1 and int(out["shared"].iloc[0]) == 1


def test_json_int_field_stats_negative_and_groups():
    from kgflow.ops.profile import json_int_field_stats

    df = pd.DataFrame(
        {
            "g": ["a", "a", "b"],
            "j": ['{"k": 87, "z": 1}', '{"k": -3}', '{ "k" :  5 }'],
        }
    )
    out = (
        json_int_field_stats(
            rd.from_pandas(df).repartition(2), "g", "j", "k"
        )
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    assert out.loc["a"].tolist() == [2, 84, 87]
    assert out.loc["b"].tolist() == [1, 5, 5]


def test_range_window_sum_peer_semantics():
    from kgflow.ops.window import range_window_sum

    # SQL RANGE ... CURRENT ROW includes ALL peer rows (equal ts),
    # even later-positioned ones — rows 2 and 3 share a timestamp
    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 12:00",
         "2024-01-02 06:00", "2024-01-02 06:00", "2024-01-03 12:00"]
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "user_id": np.ones(5, dtype=np.int64),
            "ts": ts,
            "value": [1.0, 2.0, 4.0, 8.0, 16.0],
        }
    )
    out = (
        range_window_sum(
            rd.from_pandas(df).repartition(2),
            key_col="user_id", ts_col="ts", value_col="value",
            id_col="event_id", hours=24,
        )
        .to_pandas()
        .set_index("event_id")["range_sum"]
        .to_dict()
    )
    # id0: 1; id1: 1+2; id2 AND id3: 2+4+8 (peers, 00:00 outside 24h);
    # id4: 16 (06:00 next day is > 24h before 12:00? no — 30h, outside)
    assert out == {0: 1.0, 1: 3.0, 2: 14.0, 3: 14.0, 4: 16.0}


def test_item_triple_support_counts_and_guard():
    from kgflow.ops.graph import item_triple_support

    df = pd.DataFrame(
        {
            "basket": [1, 1, 1, 1, 2, 2, 2, 3, 3],
            "item": ["a", "b", "c", "d", "a", "b", "c", "a", "b"],
        }
    )
    out = (
        item_triple_support(rd.from_pandas(df).repartition(3), "basket", "item")
        .to_pandas()
        .set_index(["item_a", "item_b", "item_c"])["support"]
        .to_dict()
    )
    assert out == {
        ("a", "b", "c"): 2,
        ("a", "b", "d"): 1,
        ("a", "c", "d"): 1,
        ("b", "c", "d"): 1,
    }
    with pytest.raises(Exception, match="max_basket"):
        item_triple_support(
            rd.from_pandas(df), "basket", "item", max_basket=3
        ).to_pandas()


def test_basket_missing_items_complement():
    from kgflow.ops.graph import basket_missing_items

    # universe {a,b,c}; basket (1,x)={a,b} -> missing c;
    # basket (2,x)={c} -> missing a,b; full basket emits nothing
    df = pd.DataFrame(
        {
            "u": np.array([1, 1, 2, 3, 3, 3], dtype=np.int64),
            "d": ["x"] * 6,
            "item": ["a", "b", "c", "a", "b", "c"],
        }
    )
    out = basket_missing_items(
        rd.from_pandas(df).repartition(3), ["u", "d"], "item"
    ).to_pandas()
    got = {(int(r.u), r.d, r.item) for r in out.itertuples()}
    assert got == {(1, "x", "c"), (2, "x", "a"), (2, "x", "b")}


def test_grouped_iqr_outliers_exact_fences():
    from kgflow.ops.profile import grouped_iqr_outliers

    # group g: values 1..8 plus one far outlier 100.
    # n=9 -> quantile_disc ranks: q1 = ceil(.25*9)=3rd value (3),
    # q3 = ceil(.75*9)=7th value (7); IQR=4, 3x fences [-9, 19]
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 100.0]
    df = pd.DataFrame({"g": ["g"] * 9, "v": vals})
    out = grouped_iqr_outliers(
        rd.from_pandas(df).repartition(3), "g", "v", fence=3
    ).to_pandas()
    assert len(out) == 1
    assert out["q1"].iloc[0] == 3.0 and out["q3"].iloc[0] == 7.0
    assert int(out["n_out"].iloc[0]) == 1


def test_jaccard_lookup_asymmetric_and_prune():
    from kgflow.ops.dedup import jaccard_lookup

    corpus = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.array([1, 2, 3], dtype=np.int64),
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over a sleepy cat",
                    "completely different words entirely here now",
                ],
            }
        )
    ).repartition(2)
    queries = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.array([100], dtype=np.int64),
                "text": ["the quick brown fox jumps over the lazy dog"],
            }
        )
    )
    out = jaccard_lookup(corpus, queries, threshold=0.3).to_pandas()
    got = dict(zip(out["match_id"], out["sim"]))
    assert set(out["query_id"]) == {100}
    assert got.get(1) == 1.0  # identical text -> jaccard exactly 1
    assert 2 in got and got[2] < 1.0  # partial overlap above 0.3
    assert 3 not in got  # disjoint shingles pruned/filtered


def test_jaccard_lookup_no_query_query_pairs():
    from kgflow.ops.dedup import jaccard_lookup

    # two identical queries must NOT pair with each other, only with
    # the corpus
    docs = pd.DataFrame(
        {"doc_id": np.array([1], dtype=np.int64), "text": ["a b c d e f"]}
    )
    qs = pd.DataFrame(
        {
            "doc_id": np.array([10, 11], dtype=np.int64),
            "text": ["a b c d e f", "a b c d e f"],
        }
    )
    out = jaccard_lookup(
        rd.from_pandas(docs), rd.from_pandas(qs), threshold=0.5
    ).to_pandas()
    assert set(out["match_id"]) == {1}
    assert set(out["query_id"]) == {10, 11}


def test_community_stats_hand_graph():
    from kgflow.ops.graph import community_stats

    # triangle {1,2,3} + edge {10,11} + one cross edge 3-10:
    # comp A = {1,2,3}, comp B = {10,11} under labels below
    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "u": np.array([1, 1, 2, 10, 3], dtype=np.int64),
                "v": np.array([2, 3, 3, 11, 10], dtype=np.int64),
            }
        )
    ).repartition(2)
    labels = rd.from_pandas(
        pd.DataFrame(
            {
                "node": np.array([1, 2, 3, 10, 11], dtype=np.int64),
                "comp": np.array([1, 1, 1, 10, 10], dtype=np.int64),
            }
        )
    )
    out = (
        community_stats(edges, labels)
        .to_pandas()
        .set_index("community")
        .sort_index()
    )
    # comp 1: 3 nodes, 3 internal edges, degree 2+2+3=7 (cross edge
    # adds 1 to node 3's side); comp 10: 2 nodes, 1 internal,
    # degree 2+1 from 10-11 both ends + cross at node 10 = 3
    assert out.loc[1, ["n_nodes", "internal_edges", "total_degree"]].tolist() == [3, 3, 7]
    assert out.loc[10, ["n_nodes", "internal_edges", "total_degree"]].tolist() == [2, 1, 3]
    # global identity: sum degree = 2m
    assert int(out["total_degree"].sum()) == 2 * 5


def test_grouped_weighted_median_exact_rule():
    from kgflow.ops.profile import grouped_weighted_median

    # g: values 1,2,3 with weights 1,1,4 -> tw=6, cum at v=2 is 2
    # (2*2 < 6), at v=3 is 6 -> wmedian 3. h: equal weights ->
    # lower median of {1,2} is 1 (2*1 >= 2... no: tw=2, cw(1)=1,
    # 2*1 >= 2 -> v=1)
    df = pd.DataFrame(
        {
            "g": ["g", "g", "g", "h", "h"],
            "v": [1.0, 2.0, 3.0, 1.0, 2.0],
            "wt": np.array([1, 1, 4, 1, 1], dtype=np.int64),
        }
    )
    out = (
        grouped_weighted_median(
            rd.from_pandas(df).repartition(2), "g", "v", "wt"
        )
        .to_pandas()
        .set_index("g")["wmedian"]
        .to_dict()
    )
    assert out == {"g": 3.0, "h": 1.0}
    with pytest.raises(Exception, match="non-negative"):
        grouped_weighted_median(
            rd.from_pandas(
                pd.DataFrame({"g": ["x"], "v": [1.0], "wt": [-1]})
            ),
            "g", "v", "wt",
        ).to_pandas()


def test_grouped_topk_ties_boundary_and_multiplicity():
    from kgflow.ops.shuffle import grouped_topk_ties

    # g: values 9,8,8,8,7 -> rank<=2 keeps 9 and ALL three 8s;
    # duplicate ROWS of the same value each survive
    df = pd.DataFrame(
        {
            "g": ["g"] * 5 + ["h"] * 2,
            "v": np.array([9, 8, 8, 8, 7, 1, 1], dtype=np.int64),
        }
    )
    out = grouped_topk_ties(
        rd.from_pandas(df).repartition(3), ["g"], "v", k=2
    ).to_pandas()
    gg = out[out["g"] == "g"]
    assert sorted(gg["v"]) == [8, 8, 8, 9]
    assert sorted(gg["rank"]) == [1, 2, 2, 2]
    hh = out[out["g"] == "h"]
    # both tied rows rank 1
    assert sorted(hh["v"]) == [1, 1] and set(hh["rank"]) == {1}


def test_time_weighted_avg_holds_until_next():
    from kgflow.ops.window import time_weighted_avg

    # user 1: v=10 for 3s then v=20 for 1s -> twa = (10*3+20*1)/4 = 12.5
    # (last value never weighs in); user 2 single event -> dropped
    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:03",
         "2024-01-01 00:00:04", "2024-01-01 00:00:00"]
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
            "ts": ts,
            "value": [10.0, 20.0, 99.0, 5.0],
        }
    )
    out = (
        time_weighted_avg(
            rd.from_pandas(df).repartition(2),
            key_col="user_id", ts_col="ts", value_col="value",
            id_col="event_id",
        )
        .to_pandas()
        .set_index("user_id")["twa"]
        .to_dict()
    )
    assert out == {1: 12.5}


def test_bloom_semi_join_exact_despite_fp():
    from kgflow.ops.joins import bloom_semi_join

    # a TINY bloom (64 bits) over 20 keys guarantees false positives;
    # the exact verify must still yield exactly the true matches
    left = rd.from_pandas(
        pd.DataFrame({"k": np.arange(200, dtype=np.int64), "p": np.arange(200)})
    ).repartition(3)
    right = rd.from_pandas(
        pd.DataFrame({"k": np.arange(0, 200, 10, dtype=np.int64)})
    )
    out = bloom_semi_join(left, right, on="k", n_bits=64).to_pandas()
    assert sorted(out["k"]) == list(range(0, 200, 10))


def test_global_running_sum_matches_serial():
    from kgflow.ops.shuffle import global_running_sum

    rng_vals = np.array([5, 1, 9, 3, 7, 2, 8, 4, 6, 10], dtype=np.int64)
    df = pd.DataFrame(
        {"k": np.arange(10, dtype=np.int64), "v": rng_vals}
    )
    out = (
        global_running_sum(
            rd.from_pandas(df).repartition(4),
            sort_cols=["v", "k"],
            value_col="v",
            out_col="rs",
        )
        .to_pandas()
        .sort_values("rs")
    )
    ordered = df.sort_values(["v", "k"])
    assert list(out["v"]) == list(ordered["v"])
    assert list(out["rs"]) == list(np.cumsum(ordered["v"].to_numpy()))
