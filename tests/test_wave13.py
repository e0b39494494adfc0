"""Wave-47.. operator tests: bigram-LM perplexity scoring (brute-force
log-prob parity, broadcast-vs-join path parity, short-doc drop
semantics) and multi-pattern blocklist matching (non-overlapping count
semantics, no-hit absence, empty-pattern guard)."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _lm_brute(texts):
    """MLE bigram LM over the corpus; per-doc (n_bigrams, logprob_sum)."""
    import collections
    import re

    pair = collections.Counter()
    ctx = collections.Counter()
    toks = [re.findall(r"\w+", t.lower()) for t in texts]
    for ws in toks:
        for a, b in zip(ws, ws[1:]):
            pair[(a, b)] += 1
            ctx[a] += 1
    out = {}
    for i, ws in enumerate(toks):
        bgs = list(zip(ws, ws[1:]))
        if not bgs:
            continue
        s = sum(math.log(pair[ab] / ctx[ab[0]]) for ab in bgs)
        out[i] = (len(bgs), s)
    return out


def test_bigram_perplexity_matches_brute_force_both_paths():
    from kgflow.ops.text import bigram_perplexity

    texts = [
        "the cat sat on the mat",
        "the cat ran",
        "a dog sat on a log",
        "single",  # 1 token -> no bigrams -> must drop
        "the the the",  # repeated-token bigrams
        "",
    ]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    ).repartition(3)
    want = _lm_brute(texts)

    for kw in ({}, {"broadcast_limit": 0}):  # broadcast path, join path
        out = bigram_perplexity(docs, **kw).to_pandas()
        got = {
            int(r.doc_id): (int(r.n_bigrams), float(r.logprob_sum))
            for r in out.itertuples()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0]
            assert got[k][1] == pytest.approx(want[k][1], abs=1e-9)


def test_bigram_perplexity_self_scored_corpus_is_finite():
    # every scored bigram exists in the LM (trained on the same corpus),
    # so no -inf / nan can appear even for hapax bigrams
    from kgflow.ops.text import bigram_perplexity

    texts = [f"unique{i} word{i} tail{i}" for i in range(20)]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64), "text": texts})
    ).repartition(4)
    out = bigram_perplexity(docs).to_pandas()
    assert len(out) == 20
    assert np.isfinite(out["logprob_sum"]).all()
    # each doc's bigrams are unique to it -> P(b|a)=1 -> logprob_sum == 0
    assert np.allclose(out["logprob_sum"], 0.0)


def test_multi_match_counts_and_absence():
    from kgflow.ops.text import multi_match

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": np.array([1, 2, 3], dtype=np.int64),
                "text": ["spark merge spark", "no hits here", "merge"],
            }
        )
    ).repartition(2)
    out = multi_match(docs, ["spark", "merge", "zzz"]).to_pandas()
    got = {
        (int(r.doc_id), r.pattern): int(r.n_hits) for r in out.itertuples()
    }
    assert got == {(1, "spark"): 2, (1, "merge"): 1, (3, "merge"): 1}


def test_multi_match_nonoverlapping_scan():
    # 'aba' in 'ababa': left-to-right non-overlapping -> 1 (not 2);
    # matches both SQL replace() and Arrow count_substring semantics
    from kgflow.ops.text import multi_match

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.array([1], dtype=np.int64), "text": ["ababa"]})
    )
    out = multi_match(docs, ["aba"]).to_pandas()
    assert out["n_hits"].tolist() == [1]


def test_multi_match_empty_patterns_raises():
    from kgflow.ops.text import multi_match

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.array([1], dtype=np.int64), "text": ["x"]})
    )
    with pytest.raises(ValueError):
        multi_match(docs, [])


def _entropy_brute(s: str) -> float:
    import collections

    c = collections.Counter(s.encode("utf-8"))
    n = len(s.encode("utf-8"))
    return math.log(n) - sum(v * math.log(v) for v in c.values()) / n


def test_char_entropy_matches_brute_force():
    from kgflow.ops.text import char_entropy

    texts = ["aaaa", "abab", "abcd", "", "the quick brown fox"]
    docs = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
    ).repartition(2)
    out = char_entropy(docs).to_pandas()
    got = {int(r.doc_id): (int(r.n_bytes), float(r.entropy)) for r in out.itertuples()}
    # empty doc (id 3) drops
    assert set(got) == {0, 1, 2, 4}
    assert got[0] == (4, pytest.approx(0.0))  # single-char run -> 0
    assert got[1] == (4, pytest.approx(math.log(2)))
    assert got[2] == (4, pytest.approx(math.log(4)))
    assert got[4] == (19, pytest.approx(_entropy_brute(texts[4]), abs=1e-12))


def test_char_entropy_multibyte_is_byte_level():
    # documented byte-level semantics: a 2-byte UTF-8 char contributes
    # its two bytes to the histogram and n_bytes
    from kgflow.ops.text import char_entropy

    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.array([1], dtype=np.int64), "text": ["éé"]})
    )
    out = char_entropy(docs).to_pandas()
    assert int(out["n_bytes"].iloc[0]) == 4
    assert float(out["entropy"].iloc[0]) == pytest.approx(math.log(2))


def _hot_mask_brute(texts, n=3, min_df=2):
    import collections
    import re

    toks = [re.findall(r"\w+", t.lower()) for t in texts]
    df = collections.Counter()
    for ws in toks:
        grams = {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
        df.update(grams)
    hot = {g for g, c in df.items() if c >= min_df}
    out = {}
    for i, ws in enumerate(toks):
        cov = set()
        for j in range(len(ws) - n + 1):
            if " ".join(ws[j : j + n]) in hot:
                cov.update(range(j, j + n))
        if cov:
            out[i] = len(cov)
    return out


def test_hot_ngram_mask_matches_brute_force():
    from kgflow.ops.dedup import hot_ngram_mask

    texts = [
        "alpha beta gamma delta",       # shares 'alpha beta gamma' with doc 1
        "alpha beta gamma epsilon",
        "zeta eta theta iota",          # unique -> absent from output
        "alpha beta gamma",             # exactly one hot trigram
        "x alpha beta gamma alpha beta gamma y",  # overlapping covers union
    ]
    docs = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
        )
    ).repartition(3)
    want = _hot_mask_brute(texts, n=3, min_df=2)
    out = hot_ngram_mask(docs, n=3, min_df=2).to_pandas()
    got = {int(r.doc_id): int(r.n_masked) for r in out.itertuples()}
    assert got == want
    assert 2 not in got  # no-hot doc absent (inner semantics)
    assert got[4] == 6  # both occurrences' covers union to 6 positions


def test_hot_ngram_mask_bigrams_and_guard():
    from kgflow.ops.dedup import hot_ngram_mask

    texts = ["a b c", "a b d", "e f g"]
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(3, dtype=np.int64), "text": texts})
    )
    out = hot_ngram_mask(docs, n=2, min_df=2).to_pandas()
    got = {int(r.doc_id): int(r.n_masked) for r in out.itertuples()}
    assert got == {0: 2, 1: 2}  # 'a b' hot; covers positions {1,2}
    with pytest.raises(ValueError):
        hot_ngram_mask(docs, n=1)


def test_adamic_adar_brute_force_and_cap():
    from kgflow.ops.graph import adamic_adar_scores

    # hubs: 10->(1,2,3), 11->(1,2), 12->(2,), 13->(1,2,3,4)
    edges = pd.DataFrame(
        {
            "z": np.array(
                [10, 10, 10, 11, 11, 12, 13, 13, 13, 13, 10], dtype=np.int64
            ),  # trailing duplicate edge (10,1) must dedup
            "x": np.array([1, 2, 3, 1, 2, 2, 1, 2, 3, 4, 1], dtype=np.int64),
        }
    )
    ds = rd.from_pandas(edges).repartition(3)
    out = adamic_adar_scores(ds, hub_col="z", leaf_col="x").to_pandas()
    got = {
        (int(r.u), int(r.v)): (int(r.cn), float(r.aa)) for r in out.itertuples()
    }
    w3, w2, w4 = 1 / math.log(3), 1 / math.log(2), 1 / math.log(4)
    want = {
        (1, 2): (3, w3 + w2 + w4),
        (1, 3): (2, w3 + w4),
        (2, 3): (2, w3 + w4),
        (1, 4): (1, w4),
        (2, 4): (1, w4),
        (3, 4): (1, w4),
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-12)
    with pytest.raises(Exception, match="max_degree"):
        adamic_adar_scores(ds, hub_col="z", leaf_col="x", max_degree=3).to_pandas()


def test_transition_entropy_deterministic_and_uniform():
    from kgflow.ops.window import transition_entropy

    # user 1: a->b, b->a, a->b  (a always ->b; b always ->a)
    # user 2: c->a, a->c        (a: b,b,c successors overall)
    rows = [
        (1, "a", 1, 1),
        (1, "b", 2, 2),
        (1, "a", 3, 3),
        (1, "b", 4, 4),
        (2, "c", 1, 5),
        (2, "a", 2, 6),
        (2, "c", 3, 7),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "t", "event_id"])
    df["ts"] = pd.to_datetime(df["t"], unit="s")
    ds = rd.from_pandas(
        df[["user_id", "event_type", "ts", "event_id"]]
    ).repartition(2)
    out = transition_entropy(ds).to_pandas()
    got = {
        r.from_cat: (int(r.n_transitions), float(r.next_entropy))
        for r in out.itertuples()
    }
    # a: successors b,b,c -> H = ln3 - (2ln2)/3 ; b: a (H=0); c: a (H=0)
    assert got["b"] == (1, pytest.approx(0.0))
    assert got["c"] == (1, pytest.approx(0.0))
    assert got["a"] == (
        3,
        pytest.approx(math.log(3) - 2 * math.log(2) / 3, abs=1e-12),
    )


def test_seasonal_sigma_outliers_exact_boundary():
    from kgflow.ops.profile import seasonal_sigma_outliers

    # masking property of the population z-score: in a cell of n
    # points, max |z| = sqrt(n-1), so with n=5 even an extreme spike
    # cannot reach 3 sigma — the rule must flag NOTHING
    ts5 = pd.to_datetime(np.arange(5) * 60, unit="s")
    df = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "event_type": ["a"] * 5,
            "ts": ts5,
            "value": [0.0, 0.0, 0.0, 0.06, 100.0],
        }
    )
    out = seasonal_sigma_outliers(rd.from_pandas(df).repartition(2)).to_pandas()
    assert len(out) == 0
    # n=13 (sqrt(12) > 3): 12 zeros + one spike -> exactly the spike
    # flags. Exact ints: n=13, sx=1300, sxx=1_690_000;
    # spike lhs = (13*1300 - 1300)^2 = 15600^2 = 243_360_000
    # rhs = 9*(13*1_690_000 - 1300^2) = 9*20_280_000 = 182_520_000 < lhs;
    # zeros lhs = 1300^2 = 1_690_000 << rhs (not flagged)
    df2 = pd.DataFrame(
        {
            "event_id": np.arange(13, dtype=np.int64),
            "event_type": ["a"] * 13,
            "ts": pd.to_datetime(np.arange(13) * 60, unit="s"),
            "value": [0.0] * 12 + [13.0],
        }
    )
    out2 = seasonal_sigma_outliers(rd.from_pandas(df2).repartition(2)).to_pandas()
    assert out2["event_id"].tolist() == [12]
    assert int(out2["x"].iloc[0]) == 1300


def test_seasonal_sigma_outliers_n1_cell_never_flags():
    from kgflow.ops.profile import seasonal_sigma_outliers

    df = pd.DataFrame(
        {
            "event_id": np.array([1], dtype=np.int64),
            "event_type": ["solo"],
            "ts": pd.to_datetime([0], unit="s"),
            "value": [42.0],
        }
    )
    out = seasonal_sigma_outliers(rd.from_pandas(df)).to_pandas()
    assert len(out) == 0
