"""Wave-50.. operator tests: exact distributed higher moments
(grouped_power_sums → skewness/kurtosis, arbitrary-precision lane
splits), Benford first-digit audit, and lag-1 daily autocorrelation
moments.

The SQL-oracle parity for the three registered queries
(events_skewkurt / orders_benford / events_autocorr) runs in
test_entry.py's auto-parametrized sweep; these tests pin the pieces
the oracle can't see — float closed forms, overflow lanes, negative
values, and pairing semantics."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_power_sums_match_numpy_and_precision():
    rng = np.random.default_rng(7)
    # include negatives and values near the 2^17/scale quantization edge
    vals = np.round(rng.normal(0, 300, size=5_000), 2)
    keys = rng.choice(["a", "b", "c"], size=vals.size)
    ds = rd.from_pandas(pd.DataFrame({"k": keys, "v": vals})).repartition(8)

    from kgflow.ops.profile import grouped_power_sums

    out = grouped_power_sums(ds, key="k", col="v", scale=100).to_pandas()
    assert sorted(out["k"]) == ["a", "b", "c"]
    q = np.floor(vals * 100).astype(object)  # Python ints: exact reference
    for _, row in out.iterrows():
        m = keys == row["k"]
        qs = [int(x) for x in q[m]]
        assert row["n"] == len(qs)
        assert int(row["s1"]) == sum(qs)
        assert int(row["s2"]) == sum(x * x for x in qs)
        assert int(row["s3"]) == sum(x**3 for x in qs)
        assert int(row["s4"]) == sum(x**4 for x in qs)


def test_power_sums_scale_guard():
    ds = rd.from_pandas(pd.DataFrame({"k": ["a"], "v": [2_000_000.0]}))
    from kgflow.ops.profile import grouped_power_sums

    with pytest.raises(Exception, match="2\\^17|lower the scale"):
        grouped_power_sums(ds, key="k", col="v", scale=100).to_pandas()


def test_skewkurt_closed_form():
    rng = np.random.default_rng(11)
    vals = np.round(np.abs(rng.lognormal(3, 1, size=4_000)), 2)  # skewed
    ds = rd.from_pandas(
        pd.DataFrame({"k": ["g"] * vals.size, "v": vals})
    ).repartition(4)

    from kgflow.ops.profile import grouped_power_sums, skewkurt_from_power_sums

    out = skewkurt_from_power_sums(
        grouped_power_sums(ds, key="k", col="v", scale=100).to_pandas()
    )
    qv = np.floor(vals * 100) / 100  # the quantized population the op sees
    mu = qv.mean()
    m2, m3, m4 = ((qv - mu) ** 2).mean(), ((qv - mu) ** 3).mean(), (
        (qv - mu) ** 4
    ).mean()
    assert out["skewness"].iloc[0] == pytest.approx(m3 / m2**1.5, rel=1e-9)
    assert out["kurtosis_excess"].iloc[0] == pytest.approx(
        m4 / m2**2 - 3.0, rel=1e-9
    )
    assert out["skewness"].iloc[0] > 1.0  # lognormal is right-skewed


def test_benford_digit_peel(tmp_path):
    # synthetic orders hitting every magnitude incl. single digits
    prices = [1.00, 9.99, 10.01, 99.99, 123.45, 4_567.89, 98_765.43, 2.50]
    df = pd.DataFrame(
        {"o_orderpriority": ["P"] * len(prices), "o_totalprice": prices}
    )
    df.to_parquet(tmp_path / "orders.parquet")

    from kgflow.ops.relational import orders_benford_digits

    out = orders_benford_digits(str(tmp_path)).to_pandas()
    got = dict(zip(out["digit"], out["n"]))
    # leading digits of cents: 100→1, 999→9, 1001→1, 9999→9, 12345→1,
    # 456789→4, 9876543→9, 250→2
    assert got == {1: 3, 9: 3, 4: 1, 2: 1}


def test_daily_autocorr_pairing(tmp_path):
    # type "x": days 1,2,3 present with counts 1,2,3 → pairs (1,2),(2,3)
    # type "y": days 1 and 3 only (gap) → no consecutive pair
    ts = (
        [pd.Timestamp("2024-01-01 05:00")] * 1
        + [pd.Timestamp("2024-01-02 05:00")] * 2
        + [pd.Timestamp("2024-01-03 05:00")] * 3
        + [pd.Timestamp("2024-01-01 05:00"), pd.Timestamp("2024-01-03 05:00")]
    )
    types = ["x"] * 6 + ["y"] * 2
    pd.DataFrame({"event_type": types, "ts": ts}).to_parquet(
        tmp_path / "events.parquet"
    )

    from kgflow.ops.relational import events_daily_autocorr

    out = events_daily_autocorr(str(tmp_path)).to_pandas()
    assert list(out["event_type"]) == ["x"]
    row = out.iloc[0]
    # pairs (x,y) = (1,2),(2,3)
    assert (row["n"], row["sx"], row["sy"]) == (2, 3, 5)
    assert (row["sxx"], row["syy"], row["sxy"]) == (5, 13, 8)


def test_symdelete_pairs_recall_complete_cases():
    # adversarial for weaker blockings: "zpple" (first-char typo —
    # prefix blocking is blind), "azcze" (shares ZERO bigrams with
    # "abcde" at dist 2 — q-gram count filters are blind), "applesx"
    # (dist 2 via two inserts), "orange" (dist > 2 from everything)
    toks = ["apple", "zpple", "abcde", "azcze", "applesx", "orange"]
    ds = rd.from_pandas(pd.DataFrame({"token": toks})).repartition(3)

    from kgflow.ops.dedup import symdelete_pairs

    out = symdelete_pairs(ds).to_pandas()
    got = {(r.tok_a, r.tok_b): r.dist for r in out.itertuples()}
    assert got[("apple", "zpple")] == 1
    assert got[("abcde", "azcze")] == 2
    assert got[("apple", "applesx")] == 2
    assert all(a < b for (a, b) in got)  # canonical order, no dupes
    assert not any("orange" in p for p in got)


def test_symdelete_pairs_levenshtein_not_damerau():
    # transposition = 2 edits under plain Levenshtein
    ds = rd.from_pandas(pd.DataFrame({"token": ["abcdef", "abcdfe"]}))
    from kgflow.ops.dedup import symdelete_pairs

    out = symdelete_pairs(ds).to_pandas()
    assert len(out) == 1 and out["dist"].iloc[0] == 2


def test_symdelete_pairs_exhaustive_vs_brute():
    # random small-alphabet soup → verify against brute-force DP
    rng = np.random.default_rng(3)
    toks = sorted(
        {
            "".join(rng.choice(list("abc"), size=rng.integers(4, 8)))
            for _ in range(60)
        }
    )
    ds = rd.from_pandas(pd.DataFrame({"token": toks})).repartition(4)
    from kgflow.ops.dedup import _lev_capped, symdelete_pairs

    out = symdelete_pairs(ds).to_pandas()
    got = {(r.tok_a, r.tok_b): r.dist for r in out.itertuples()}

    def enc(t):
        return np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)

    want = {}
    for i, a in enumerate(toks):
        for b in toks[i + 1 :]:
            d = _lev_capped(enc(a), enc(b), 2)
            if d <= 2:
                want[(a, b)] = d
    assert got == want


def test_cusum_prefix_identity(tmp_path):
    # counts by day: 2,2,2,10,10,2 → median k=2, d=0,0,0,8,8,0
    # naive recursion: S=0,0,0,8,16,16 → s_max=16 at day 5
    days = [1, 1, 2, 2, 3, 3] + [4] * 10 + [5] * 10 + [6, 6]
    ts = [pd.Timestamp(f"2024-02-0{d} 12:00") for d in days]
    pd.DataFrame({"event_type": ["t"] * len(ts), "ts": ts}).to_parquet(
        tmp_path / "events.parquet"
    )
    from kgflow.ops.relational import events_daily_cusum

    out = events_daily_cusum(str(tmp_path)).to_pandas()
    row = out.iloc[0]
    assert (row["k"], row["s_max"], row["n_days"]) == (2, 16, 6)
    assert row["day_max"] == pd.Timestamp("2024-02-05")


def test_streak_islands(tmp_path):
    # user 1: days 1,2,3 then 7,8 → max streak 3, 5 active days
    # user 2: day 1 only (two events same day dedupe) → streak 1
    rows = []
    for d in [1, 2, 3, 7, 8]:
        rows.append((1, pd.Timestamp(f"2024-03-0{d} 01:00")))
    rows.append((2, pd.Timestamp("2024-03-01 05:00")))
    rows.append((2, pd.Timestamp("2024-03-01 09:00")))
    pd.DataFrame(rows, columns=["user_id", "ts"]).to_parquet(
        tmp_path / "events.parquet"
    )
    from kgflow.ops.relational import events_daily_streaks

    out = events_daily_streaks(str(tmp_path)).to_pandas().set_index("user_id")
    assert out.loc[1, "max_streak"] == 3 and out.loc[1, "n_active_days"] == 5
    assert out.loc[2, "max_streak"] == 1 and out.loc[2, "n_active_days"] == 1


def test_moment_matrix_exact_and_pairwise_null():
    rng = np.random.default_rng(5)
    n = 3_000
    df = pd.DataFrame(
        {
            "a": np.round(rng.uniform(0, 160_000, n), 2),  # near the 2^24 edge
            "b": np.round(rng.normal(0, 40, n), 2),
        }
    )
    df.loc[::7, "b"] = np.nan  # pairwise-null drops
    ds = rd.from_pandas(df).repartition(6)
    from kgflow.ops.profile import moment_matrix

    out = (
        moment_matrix(ds, cols=["a", "b"], scales={"a": 100, "b": 100})
        .to_pandas()
        .set_index(["col_a", "col_b"])
    )
    qa = np.floor(df["a"].to_numpy() * 100)
    qb = np.floor(df["b"].to_numpy() * 100)
    ok = np.isfinite(qb)
    # diagonal (a,a): all rows; off-diagonal (a,b): pairwise complete
    assert out.loc[("a", "a"), "n"] == n
    assert int(out.loc[("a", "a"), "sxy"]) == sum(
        int(x) * int(x) for x in qa
    )
    assert out.loc[("a", "b"), "n"] == int(ok.sum())
    assert int(out.loc[("a", "b"), "sx"]) == sum(int(x) for x in qa[ok])
    assert int(out.loc[("a", "b"), "sxy"]) == sum(
        int(x) * int(y) for x, y in zip(qa[ok], qb[ok])
    )


def test_moment_matrix_scale_guard():
    ds = rd.from_pandas(pd.DataFrame({"a": [200_000.0]}))
    from kgflow.ops.profile import moment_matrix

    with pytest.raises(Exception, match="2\\^24|lower the scale"):
        moment_matrix(ds, cols=["a"], scales={"a": 100}).to_pandas()


def test_fd_violations_semantics():
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2, 3, 3, 3],
            "v": ["x", "x", "y", "z", "z", "a", "b", "c"],
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    from kgflow.ops.checks import fd_violations

    out = fd_violations(ds, det_col="k", dep_col="v").to_pandas()
    got = dict(zip(out["k"], out["n_dep"]))
    assert got == {1: 2, 3: 3}  # key 2 is FD-clean and absent


def test_loo_target_encode_semantics():
    # category "a": q values 100, 200, 300 → LOO for 100 is (500, 2)
    # category "b": single row → te_den 0 (caller decides the prior)
    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5],
            "cat": ["a", "a", "a", "b", "a"],
            "y": [1.0, 2.0, 3.0, 9.0, None],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    from kgflow.ops.encode import loo_target_encode

    out = (
        loo_target_encode(ds, id_col="id", cat_col="cat", y_col="y")
        .to_pandas()
        .set_index("id")
    )
    assert 5 not in out.index  # NULL target excluded
    assert (out.loc[1, "te_num"], out.loc[1, "te_den"]) == (500, 2)
    assert (out.loc[2, "te_num"], out.loc[2, "te_den"]) == (400, 2)
    assert (out.loc[4, "te_num"], out.loc[4, "te_den"]) == (0, 0)


def test_loo_target_encode_category_guard():
    df = pd.DataFrame({"id": range(10), "cat": [str(i) for i in range(10)], "y": 1.0})
    from kgflow.ops.encode import loo_target_encode

    with pytest.raises(Exception, match="categories exceed"):
        loo_target_encode(
            rd.from_pandas(df), id_col="id", cat_col="cat", y_col="y",
            max_categories=5,
        ).to_pandas()


def test_hash_bucket_encode_deterministic_and_crossed():
    df = pd.DataFrame(
        {"id": [1, 2, 3, 4], "a": ["x", "x", "y", "y"], "b": [0, 1, 0, 0]}
    )
    ds = rd.from_pandas(df).repartition(2)
    from kgflow.ops.encode import hash_bucket_encode
    from kgflow.ops.sketch import _fnv1a_strings

    out = (
        hash_bucket_encode(ds, id_col="id", cat_cols=["a", "b"], n_buckets=8)
        .to_pandas()
        .set_index("id")["bucket"]
    )
    # same crossed key → same bucket; matches the direct fold
    for i, key in [(1, "x|0"), (2, "x|1"), (3, "y|0"), (4, "y|0")]:
        # int() BEFORE the modulo: np.uint64 % python-int promotes to
        # float64 and silently corrupts 64-bit hashes
        assert out.loc[i] == int(_fnv1a_strings(np.array([key]))[0]) % 8
    assert out.loc[3] == out.loc[4]


def test_quantize_embeddings_semantics():
    # dim 1 spans [0, 2] → codes 0 / 127 / 255; dim 2 constant → 0
    vecs = [[0.0, 5.0], [1.0, 5.0], [2.0, 5.0]]
    df = pd.DataFrame({"vec_id": [10, 11, 12], "embedding": vecs})
    ds = rd.from_pandas(df).repartition(2)
    from kgflow.ops.ann import quantize_embeddings

    out = (
        quantize_embeddings(ds)
        .to_pandas()
        .set_index(["vec_id", "dim"])["code"]
        .to_dict()
    )
    assert out[(10, 1)] == 0 and out[(12, 1)] == 255
    assert out[(11, 1)] == 127  # floor(0.5 * 255)
    assert all(out[(v, 2)] == 0 for v in (10, 11, 12))  # constant dim
    # max value always codes to exactly n_levels-1, min to 0
    assert min(out.values()) >= 0 and max(out.values()) <= 255


def test_pq_encode_properties():
    rng = np.random.default_rng(9)
    vecs = rng.normal(0, 1, (200, 16)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(200), "embedding": list(vecs)})
    from kgflow.ops.ann import pq_encode

    a = (
        pq_encode(rd.from_pandas(df).repartition(5), n_subspaces=4, n_codes=8)
        .to_pandas()
        .sort_values(["vec_id", "subspace"])
        .reset_index(drop=True)
    )
    # determinism across partitionings
    b = (
        pq_encode(rd.from_pandas(df).repartition(2), n_subspaces=4, n_codes=8)
        .to_pandas()
        .sort_values(["vec_id", "subspace"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 200 * 4
    assert a["code"].between(0, 7).all()
    # nearest-centroid property: re-derive codebooks and brute-check rows
    from kgflow.ops.ann import _kmeans_l2

    sample = df.sort_values("vec_id")
    M = np.asarray(list(sample["embedding"]), dtype=np.float32)
    for s in range(4):
        book = _kmeans_l2(M[:, s * 4 : (s + 1) * 4], 8, seed=42 + s)
        sub = vecs[:, s * 4 : (s + 1) * 4]
        want = np.argmin(
            ((sub[:, None, :] - book[None, :, :]) ** 2).sum(axis=2), axis=1
        )
        got = a[a["subspace"] == s + 1].sort_values("vec_id")["code"].to_numpy()
        assert (got == want).all()
    # compression quality: PQ reconstruction beats the 1-centroid baseline
    books = np.stack(
        [_kmeans_l2(M[:, s * 4 : (s + 1) * 4], 8, seed=42 + s) for s in range(4)]
    )
    codes = a["code"].to_numpy().reshape(200, 4)
    recon = np.concatenate(
        [books[s][codes[:, s]] for s in range(4)], axis=1
    )
    mse_pq = ((vecs - recon) ** 2).mean()
    mse_mean = ((vecs - vecs.mean(axis=0)) ** 2).mean()
    assert mse_pq < 0.5 * mse_mean


def test_pq_adc_recall_on_clustered_data():
    # 4 well-separated clusters: ADC must recover same-cluster
    # neighbors with high recall vs the exact L2 scan
    rng = np.random.default_rng(21)
    centers = rng.normal(0, 10, (4, 16)).astype(np.float32)
    vecs = np.concatenate(
        [c + rng.normal(0, 0.5, (50, 16)).astype(np.float32) for c in centers]
    )
    ids = np.arange(200)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    qids = [0, 50, 100, 150]
    qm = vecs[qids]
    from kgflow.ops.ann import pq_adc_topk

    got = (
        pq_adc_topk(
            rd.from_pandas(df).repartition(4),
            qids,
            qm,
            k=5,
            n_subspaces=4,
            n_codes=16,
        )
        .to_pandas()
        .groupby("query_id")["neighbor_id"]
        .apply(set)
    )
    # PQ collapses near-identical points to the same codes, so exact
    # within-cluster RANKS are not recoverable — the honest ADC
    # property is coarse-neighborhood correctness: every retrieved
    # neighbor must come from the query's own cluster (50 ids apiece)
    for qi in qids:
        assert len(got[qi]) == 5
        cluster = set(range((qi // 50) * 50, (qi // 50) * 50 + 50))
        assert got[qi] <= cluster, (qi, got[qi] - cluster)


def test_binary_auc_exact_vs_brute():
    rng = np.random.default_rng(17)
    y = (rng.random(2_000) < 0.3).astype(np.int64)
    s = (rng.normal(0, 10, 2_000) + 8 * y).astype(np.int64)  # informative
    ds = rd.from_pandas(pd.DataFrame({"y": y, "s": s})).repartition(6)
    from kgflow.ops.profile import auc_from_u2, binary_auc_exact

    out = binary_auc_exact(ds, label_col="y", score_col="s")
    # brute-force pair count with half-ties
    pos, neg = s[y == 1], s[y == 0]
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    assert int(out["u2"].iloc[0]) == 2 * int(gt) + int(eq)
    assert out["n_pos"].iloc[0] == len(pos) and out["n_neg"].iloc[0] == len(neg)
    auc = auc_from_u2(out)
    assert 0.6 < auc < 1.0  # informative score ranks positives higher


def test_binary_auc_distinct_guard():
    df = pd.DataFrame({"y": [0, 1] * 50, "s": np.arange(100)})
    from kgflow.ops.profile import binary_auc_exact

    with pytest.raises(Exception, match="distinct scores exceed"):
        binary_auc_exact(
            rd.from_pandas(df), label_col="y", score_col="s",
            max_distinct_scores=10,
        )


def test_survival_counts_km_semantics(tmp_path):
    # corpus horizon = day 30. users:
    #  u1: day 1..3  → lifetime 2, churned (gap to horizon ≥ 7d)
    #  u2: day 1..28 → lifetime 27, CENSORED (within 7d of horizon)
    #  u3: day 5..5  → lifetime 0, churned
    #  u4: day 30    → lifetime 0, censored (defines the horizon)
    rows = [
        (1, "2024-01-01"), (1, "2024-01-03"),
        (2, "2024-01-01"), (2, "2024-01-28"),
        (3, "2024-01-05"),
        (4, "2024-01-30"),
    ]
    df = pd.DataFrame(
        [(u, pd.Timestamp(d + " 12:00")) for u, d in rows],
        columns=["user_id", "ts"],
    )
    df.to_parquet(tmp_path / "events.parquet")
    from kgflow.ops.window import survival_counts
    from kgflow.sources.parquet import read_parquet_clean

    ev = read_parquet_clean(str(tmp_path / "events.parquet"))
    out = survival_counts(ev).set_index("t")
    assert (out.loc[0, "n_event"], out.loc[0, "n_censored"]) == (1, 1)
    assert (out.loc[2, "n_event"], out.loc[2, "n_censored"]) == (1, 0)
    assert (out.loc[27, "n_event"], out.loc[27, "n_censored"]) == (0, 1)
    # at-risk: everyone at t=0, two at t>=2, one at t>=27
    assert list(out["n_at_risk"]) == [4, 2, 1]


def test_ks_two_sample_vs_brute():
    rng = np.random.default_rng(23)
    a = rng.normal(0, 10, 800).astype(np.int64)
    b = (rng.normal(3, 12, 600)).astype(np.int64)  # shifted + wider
    df = pd.DataFrame(
        {
            "g": ["a"] * len(a) + ["b"] * len(b) + ["zzz"] * 50,
            "v": np.concatenate([a, b, np.zeros(50, dtype=np.int64)]),
        }
    )
    ds = rd.from_pandas(df).repartition(5)
    from kgflow.ops.profile import ks_two_sample_exact

    out = ks_two_sample_exact(ds, "g", "v", "a", "b")  # "zzz" ignored
    assert out["n_a"].iloc[0] == 800 and out["n_b"].iloc[0] == 600
    # brute force sup over the merged support
    support = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), support, side="right")
    fb = np.searchsorted(np.sort(b), support, side="right")
    want = int(np.abs(600 * fa - 800 * fb).max())
    assert int(out["d_num"].iloc[0]) == want
    assert want / (800 * 600) > 0.05  # shifted distributions do differ


def _bpe_reference(word_counts, k):
    """Serial Sennrich BPE over a word-frequency dict."""
    words = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(1, k + 1):
        pairs = {}
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + word_counts[w]
        if not pairs:
            break
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_bpe_merges_vs_reference():
    texts = [
        "banana banana bandana",
        "banana band banner",
        "an anna and andante",
    ]
    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": texts})
    ds = rd.from_pandas(docs).repartition(3)
    from kgflow.ops.text import bpe_merges

    got = bpe_merges(ds, n_merges=6)  # vocab-bounded -> driver rounds
    got_dist = bpe_merges(ds, n_merges=6, driver_limit=0)  # forced shuffles
    counts = {}
    for t in texts:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    want = _bpe_reference(counts, 6)
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    assert [tuple(r) for r in got_dist.itertuples(index=False)] == want
    # the corpus is banana-heavy: the first merge must be ('a','n')
    assert want[0][1:3] == ("a", "n")


def test_winnow_coverage_and_subset(tmp_path):
    # winnowing guarantee: every stretch of `winnow` consecutive window
    # hashes contributes its minimum → selected set covers the stream
    rng = np.random.default_rng(29)
    words = ["w%d" % i for i in rng.integers(0, 40, 120)]
    text = " ".join(words)
    pd.DataFrame({"doc_id": [1], "text": [text]}).to_parquet(
        tmp_path / "documents.parquet"
    )
    from kgflow.ops.text import hash_token, winnow_fingerprints
    from kgflow.sources.parquet import read_parquet_clean

    docs = read_parquet_clean(str(tmp_path / "documents.parquet"))
    got = set(winnow_fingerprints(docs, window=16, winnow=8).to_pandas()["fp"])
    # serial reference
    B = np.uint64(1099511628211)
    hs = np.array([hash_token(w) for w in words], dtype=np.uint64)
    with np.errstate(over="ignore"):
        ws = np.zeros(len(hs) - 15, dtype=np.uint64)
        for w in range(16):
            ws = ws * B + hs[w : w + len(ws)]
    mins = {
        int(ws[j : j + 8].min()) & 0x7FFFFFFFFFFFFFFF
        for j in range(len(ws) - 7)
    }
    assert got == mins
    # coverage: every 8-stretch has a selected fingerprint
    for j in range(len(ws) - 7):
        assert (int(ws[j : j + 8].min()) & 0x7FFFFFFFFFFFFFFF) in got


def test_winnow_pairs_finds_planted_near_dup(tmp_path):
    rng = np.random.default_rng(31)
    base = " ".join("w%d" % i for i in rng.integers(0, 50, 100))
    shuffled = " ".join("w%d" % i for i in rng.integers(0, 50, 100))
    # doc 2 = doc 1 with a small middle edit → many shared local
    # fingerprints; doc 3 unrelated
    words = base.split()
    words[50] = "zzz"
    pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": [base, " ".join(words), shuffled]}
    ).to_parquet(tmp_path / "documents.parquet")
    from kgflow.ops.text import winnow_pairs
    from kgflow.sources.parquet import read_parquet_clean

    docs = read_parquet_clean(str(tmp_path / "documents.parquet"))
    out = winnow_pairs(docs, min_shared=2).to_pandas()
    got = {(r.doc_a, r.doc_b): r.n_shared for r in out.itertuples()}
    assert (1, 2) in got and got[(1, 2)] >= 2  # edited copy detected
    assert (1, 3) not in got and (2, 3) not in got  # unrelated not paired


def test_isotonic_pav_vs_fraction_reference():
    from fractions import Fraction

    rng = np.random.default_rng(37)
    s = rng.integers(0, 30, 1_500)
    # increasing-but-noisy label probability in s
    y = (rng.random(1_500) < (s / 40 + 0.1)).astype(np.int64)
    ds = rd.from_pandas(pd.DataFrame({"y": y, "s": s})).repartition(5)
    from kgflow.ops.profile import isotonic_calibrate

    out = isotonic_calibrate(ds, label_col="y", score_col="s")
    # reference PAV with exact fractions
    import collections

    npos = collections.Counter()
    ntot = collections.Counter()
    for yi, si in zip(y, s):
        npos[si] += int(yi)
        ntot[si] += 1
    scores = sorted(ntot)
    blocks = []
    for sc in scores:
        blocks.append([npos[sc], ntot[sc], [sc]])
        while len(blocks) > 1 and Fraction(
            blocks[-2][0], blocks[-2][1]
        ) > Fraction(blocks[-1][0], blocks[-1][1]):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
            blocks[-1][2] += b[2]
    want = {}
    for num, den, scs in blocks:
        for sc in scs:
            want[sc] = Fraction(num, den)
    got = {
        r.s: Fraction(int(r.cal_num), int(r.cal_den)) for r in out.itertuples()
    }
    assert got == want
    # monotone non-decreasing calibrated probabilities
    vals = [got[sc] for sc in scores]
    assert all(a <= b for a, b in zip(vals, vals[1:]))
