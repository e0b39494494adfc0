"""Wave-61..64 operator tests: DSIR hashed-unigram importance
scores, ExactSubstr-style duplicated-span counts, first-occurrence
novelty counts, the Gopher quality-rule bundle, the composed
curation pipeline, and the RFM driver-rank parity.

The SQL-oracle parity for the four registered queries (doc_dsir_score
/ doc_dupspan / doc_novelty / doc_gopher_rules) runs in test_entry.py's
auto-parametrized sweep; these tests pin the semantics the oracle
can't see — planted duplicates, the within-doc-only repeat rule, the
short-doc drop, owner-keeps-all novelty, and the exact numpy closed
form of the DSIR weight."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _docs(rows):
    return rd.from_pandas(pd.DataFrame(rows)).repartition(4)


def test_dupspan_planted_duplicates_and_short_doc_drop():
    from kgflow.ops.dedup import dupspan_counts

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        {"doc_id": 1, "text": shared + " one two three"},
        {"doc_id": 2, "text": "x y " + shared},
        {"doc_id": 3, "text": "totally different words here make no grams shared kappa"},  # 9 tokens -> 2 grams
        {"doc_id": 4, "text": "too short"},  # < 8 tokens -> drops
    ]
    out = (
        dupspan_counts(_docs(rows), window=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2, 3]
    # doc 1: 11 tokens -> 4 grams, exactly one (the shared 8-gram at
    # position 0) also occurs in doc 2
    assert out.loc[1, "n_grams"] == 4 and out.loc[1, "n_dup"] == 1
    assert out.loc[2, "n_grams"] == 3 and out.loc[2, "n_dup"] == 1
    assert out.loc[3, "n_grams"] == 2 and out.loc[3, "n_dup"] == 0


def test_dupspan_within_doc_repeat_is_not_duplicated():
    from kgflow.ops.dedup import dupspan_counts

    # the 8-gram "a b c d e f g h" occurs TWICE in doc 1 but in no
    # other doc -> df(fp)=1 -> neither instance counts as duplicated
    rows = [
        {"doc_id": 1, "text": "a b c d e f g h a b c d e f g h"},
        {"doc_id": 2, "text": "p q r s t u v w x y z zz"},
    ]
    out = (
        dupspan_counts(_docs(rows), window=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_grams"] == 9
    assert out.loc[1, "n_dup"] == 0
    assert out.loc[2, "n_dup"] == 0


def test_dupspan_full_duplicate_docs_are_fully_covered():
    from kgflow.ops.dedup import dupspan_counts

    text = "one two three four five six seven eight nine ten eleven"
    rows = [{"doc_id": i, "text": text} for i in (10, 11)]
    out = dupspan_counts(_docs(rows), window=8).to_pandas()
    assert (out["n_dup"] == out["n_grams"]).all()
    assert (out["n_grams"] == 4).all()  # 11 tokens -> 4 positions


def test_dsir_matches_numpy_reference_exactly():
    from kgflow.ops.sketch import _fnv1a_strings
    from kgflow.ops.text import dsir_scores

    rng = np.random.default_rng(3)
    vocab = np.array([f"w{i}" for i in range(40)])
    rows = []
    for i in range(60):
        src = "tgt" if i % 3 == 0 else f"other{i % 2}"
        toks = rng.choice(vocab, size=rng.integers(5, 30))
        rows.append({"doc_id": i, "text": " ".join(toks), "source": src})
    out = (
        dsir_scores(_docs(rows), target_source="tgt", n_buckets=64)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )

    B = 64
    # % np.uint64: a bare python-int modulus silently promotes the
    # uint64 hash to float64 and corrupts the bucket
    bucket = {
        w: int(_fnv1a_strings(np.array([w]))[0] % np.uint64(B)) for w in vocab
    }
    t = np.zeros(B)
    p = np.zeros(B)
    for r in rows:
        for w in r["text"].split():
            p[bucket[w]] += 1
            if r["source"] == "tgt":
                t[bucket[w]] += 1
    const = np.log(t.sum() + B) - np.log(p.sum() + B)
    for r in rows:
        toks = r["text"].split()
        want = sum(
            np.log(t[bucket[w]] + 1) - np.log(p[bucket[w]] + 1) for w in toks
        ) - len(toks) * const
        assert out.loc[r["doc_id"], "n_tokens"] == len(toks)
        assert abs(out.loc[r["doc_id"], "dsir_score"] - want) < 1e-9


def test_dsir_target_token_scores_higher():
    from kgflow.ops.text import dsir_scores

    # "quux"-heavy docs only exist in the target slice -> a pool doc
    # made of "quux" must outscore one made of the uniform filler
    rows = (
        [{"doc_id": i, "text": "quux " * 10, "source": "tgt"} for i in range(5)]
        + [{"doc_id": 10 + i, "text": "filler common words", "source": "oth"} for i in range(5)]
        + [
            {"doc_id": 100, "text": "quux quux quux quux", "source": "oth"},
            {"doc_id": 101, "text": "filler common words filler", "source": "oth"},
        ]
    )
    out = (
        dsir_scores(_docs(rows), target_source="tgt", n_buckets=256)
        .to_pandas()
        .set_index("doc_id")
    )
    assert (
        out.loc[100, "dsir_score"] / out.loc[100, "n_tokens"]
        > out.loc[101, "dsir_score"] / out.loc[101, "n_tokens"]
    )


def test_dsir_tokenless_doc_drops():
    from kgflow.ops.text import dsir_scores

    rows = [
        {"doc_id": 1, "text": "some words here", "source": "a"},
        {"doc_id": 2, "text": "...", "source": "a"},
    ]
    out = dsir_scores(_docs(rows), target_source="a", n_buckets=32).to_pandas()
    assert sorted(out["doc_id"]) == [1]


def test_novelty_owner_keeps_all_later_docs_lose():
    from kgflow.ops.dedup import novelty_counts

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        {"doc_id": 1, "text": shared},                   # owner: 1 gram, novel
        {"doc_id": 2, "text": "x y " + shared},          # 3 grams, shared one not novel
        {"doc_id": 3, "text": shared + " " + shared},
    ]
    # doc 3 = 16 tokens -> 9 grams: position 0 and 8 are `shared` (owned
    # by doc 1); the 7 straddling grams are doc-3-only -> doc 3 OWNS them
    out = (
        novelty_counts(_docs(rows), window=8)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1, "n_grams"] == 1 and out.loc[1, "n_novel"] == 1
    assert out.loc[2, "n_grams"] == 3 and out.loc[2, "n_novel"] == 2
    assert out.loc[3, "n_grams"] == 9 and out.loc[3, "n_novel"] == 7


def test_novelty_internal_repeats_of_owner_count_novel():
    from kgflow.ops.dedup import novelty_counts

    rows = [{"doc_id": 5, "text": "a b c d e f g h a b c d e f g h"}]
    out = novelty_counts(_docs(rows), window=8).to_pandas()
    assert out.loc[0, "n_grams"] == 9
    assert out.loc[0, "n_novel"] == 9  # sole owner: everything is first-seen


def test_gopher_rules_edges():
    from kgflow.ops.clean import gopher_rules

    filler = " ".join(["the of and words here fine okay good"] * 8)  # 64 words
    rows = [
        {"doc_id": 1, "text": filler},  # passes everything
        {"doc_id": 2, "text": "short doc the of"},  # fails wordcount
        {"doc_id": 3, "text": filler + " " + " ".join(["7"] * 20)},  # 84 words, 20 digits -> fails numeric (20*5 >= 84)
        {"doc_id": 4, "text": " ".join(["ab"] * 60) + " the of"},  # mean len < 3 -> fails meanlen
        {"doc_id": 5, "text": "\n".join([filler, "trailing line..."])},  # 1/2 lines ellipsis -> fails (10 >= 6)
    ]
    out = (
        gopher_rules(_docs(rows), min_stopwords=2)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[1].drop("n_words").tolist() == [1, 1, 1, 1, 1, 1]
    assert out.loc[2, "r_wordcount"] == 0 and out.loc[2, "pass_all"] == 0
    assert out.loc[3, "r_numeric"] == 0 and out.loc[3, "r_wordcount"] == 1
    assert out.loc[4, "r_meanlen"] == 0
    assert out.loc[5, "r_ellipsis"] == 0


def test_gopher_stopword_threshold():
    from kgflow.ops.clean import gopher_rules

    text = " ".join(["the words keep coming along nicely again today"] * 8)
    rows = [{"doc_id": 1, "text": text}]  # only "the" from the list
    strict = gopher_rules(_docs(rows), min_stopwords=2).to_pandas()
    loose = gopher_rules(_docs(rows), min_stopwords=1).to_pandas()
    assert strict.loc[0, "r_stopwords"] == 0
    assert loose.loc[0, "r_stopwords"] == 1


def test_curation_each_filter_bites():
    from kgflow.pipelines.curate import curate_docs

    good = " ".join(["the of and words flow nicely here again"] * 8)  # 64 w
    dup_half = " ".join(["alpha beta gamma delta epsilon zeta eta theta"] * 8)
    rows = [
        {"doc_id": 1, "text": good + " uniquely original closing words", "source": "tgt"},
        {"doc_id": 2, "text": "the of short", "source": "oth"},  # wordcount fail
        # 64 words but every gram duplicated across docs 3 and 4 -> dup cap
        {"doc_id": 3, "text": dup_half, "source": "oth"},
        {"doc_id": 4, "text": dup_half, "source": "oth"},
    ]
    out = curate_docs(
        _docs(rows), target_source="tgt", min_stopwords=2, max_dup_pct=25
    ).to_pandas()
    assert sorted(out["doc_id"]) == [1]
    assert set(out.columns) == {"doc_id", "n_words", "n_grams", "n_dup", "dsir_score"}


def test_customer_rfm_driver_matches_distributed():
    from kgflow.ops.relational import customer_rfm

    sf = "/root/testdata/sf0.001"
    fast = customer_rfm(sf).to_pandas().sort_values("c_custkey").reset_index(drop=True)
    slow = (
        customer_rfm(sf, driver_limit=0)
        .to_pandas()
        .sort_values("c_custkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, slow)


def test_mix_weights_upweight_low_resource():
    from kgflow.ops.text import source_mix_weights

    rows = (
        [{"doc_id": i, "text": "word " * 100, "source": "big"} for i in range(10)]
        + [{"doc_id": 100, "text": "word " * 10, "source": "small"}]
    )
    out = (
        source_mix_weights(_docs(rows), alpha=0.3)
        .to_pandas()
        .set_index("source")
    )
    assert out.loc["big", "n_tokens"] == 1000
    assert out.loc["small", "n_tokens"] == 10
    w = out["weight"]
    assert abs(w.sum() - 1.0) < 1e-12
    # alpha=0.3 compresses the 100x token gap to 100^0.3 ~ 3.98x
    ratio = w.loc["big"] / w.loc["small"]
    assert abs(ratio - 100 ** 0.3) < 1e-9


def test_zipf_alpha_recovers_planted_exponent():
    from kgflow.ops.text import zipf_alpha

    # plant an exact Zipf(alpha=2) frequency table: token i appears
    # floor(C / (i+1)^2)... use direct counts so the estimate is clean
    rows = []
    doc_id = 0
    words = []
    for i in range(60):
        f = max(int(12000 / (i + 1) ** 2), 1)
        words.extend([f"tok{i:03d}"] * f)
    # chunk into docs
    for j in range(0, len(words), 500):
        rows.append({"doc_id": doc_id, "text": " ".join(words[j : j + 500])})
        doc_id += 1
    out = zipf_alpha(_docs(rows), k=20)
    # Hill on an exact 1/r^2 rank-frequency curve: f_i/f_{k+1} =
    # ((k+1)/i)^2 -> alpha_hat = 1 + k / (2 * sum ln((k+1)/i))
    import math

    expect = 1.0 + 20 / (2.0 * sum(math.log(21 / i) for i in range(1, 21)))
    got = out["alpha"].iloc[0]
    # floors distort small counts; the estimator must land near 2-ish
    assert abs(got - expect) < 0.2, (got, expect)


def test_apportion_budget_exact_and_fair():
    from kgflow.ops.text import apportion_budget

    rows = (
        [{"doc_id": i, "text": "w " * 997, "source": "a"} for i in range(3)]
        + [{"doc_id": 10, "text": "w " * 500, "source": "b"}]
        + [{"doc_id": 11, "text": "w " * 3, "source": "c"}]
    )
    out = (
        apportion_budget(_docs(rows), budget=100)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    assert out["quota"].sum() == 100  # Hamilton invariant: exact budget
    # proportionality: every quota within 1 of its exact share
    total = out["n_tokens"].sum()
    for s in out.index:
        exact = out.loc[s, "n_tokens"] * 100 / total
        assert abs(out.loc[s, "quota"] - exact) < 1.0
    # the 3-token source must still be representable (floor 0 or 1)
    assert out.loc["c", "quota"] in (0, 1)


def test_apportion_budget_rejects_bad_budget():
    from kgflow.ops.text import apportion_budget

    with pytest.raises(ValueError, match="budget"):
        apportion_budget(_docs([{"doc_id": 1, "text": "x", "source": "a"}]), budget=0)
