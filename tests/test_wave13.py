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
