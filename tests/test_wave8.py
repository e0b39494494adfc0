"""Wave-8 operator tests: containment vs Jaccard asymmetry, Flesch
syllable/sentence edge semantics, grouped Gini moments, grouped-mode
tie-break determinism (full-corpus parity vs DuckDB is in
test_entry.py via oracle_sql auto-parametrization)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_containment_finds_quote_jaccard_misses():
    from kgflow.ops.dedup import containment_pairs, jaccard_pairs

    big = " ".join(f"w{i}" for i in range(200))
    quote = " ".join(f"w{i}" for i in range(40)) + " zz1 zz2 zz3 zz4 zz5"
    other = " ".join(f"x{i}" for i in range(100))
    docs = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": [big, quote, other]}
        )
    ).repartition(3)

    cont = containment_pairs(docs, threshold=0.8).to_pandas()
    assert len(cont) == 1
    assert (cont.loc[0, "doc_a"], cont.loc[0, "doc_b"]) == (1, 2)
    # 38 of the quote's 43 shingles are the big doc's prefix shingles
    assert cont.loc[0, "sim"] == pytest.approx(38 / 43)

    jac = jaccard_pairs(docs, threshold=0.5).to_pandas()
    assert len(jac) == 0  # Jaccard of the quote pair is 38/203 ≈ 0.19


def test_containment_identical_docs_score_one():
    from kgflow.ops.dedup import containment_pairs

    t = "alpha beta gamma delta epsilon zeta"
    docs = rd.from_pandas(
        pd.DataFrame({"doc_id": [10, 11], "text": [t, t]})
    )
    out = containment_pairs(docs, threshold=0.8).to_pandas()
    assert len(out) == 1 and out.loc[0, "sim"] == 1.0


def test_flesch_counts_and_score():
    from kgflow.ops.text import flesch_scores

    docs = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                # doc 1: 4 words, 2 sentences, syllables 2+1+3+1 = 7
                # ("table" -> a,e = 2; "js" zero-vowel run floors to 1;
                #  "elephant" -> e,e,a = 3; "by" -> y = 1)
                "text": ["table js. elephant by!", "zz zz zz"],
            }
        )
    ).repartition(2)
    out = (
        flesch_scores(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.loc[0, ["n_words", "n_sentences", "n_syllables"]].tolist() == [4, 2, 7]
    assert out.loc[0, "flesch"] == pytest.approx(
        206.835 - 1.015 * (4 / 2) - 84.6 * (7 / 4)
    )
    # doc 2: no punctuation -> sentence floor 1; zero-vowel words -> 1 each
    assert out.loc[1, ["n_words", "n_sentences", "n_syllables"]].tolist() == [3, 1, 3]


def test_grouped_gini_exact_rational():
    from kgflow.ops.profile import grouped_gini

    # user 1: counts {a: 3, b: 1} -> gini = (16 - 10)/16 = 0.375
    # user 2: uniform single type -> gini 0
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2, 2],
            "event_type": ["a", "a", "a", "b", "c", "c"],
        }
    )
    ds = rd.from_pandas(df).repartition(3)  # partial counts must combine
    out = (
        grouped_gini(ds, "user_id", "event_type")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert out["n_events"].tolist() == [4, 2]
    assert out["gini"].tolist() == [0.375, 0.0]


def test_grouped_mode_tie_breaks_lexicographically():
    from kgflow.ops.profile import grouped_mode

    df = pd.DataFrame(
        {
            "g": ["x"] * 4 + ["y"] * 3,
            "v": ["b", "a", "a", "b", "q", "p", "q"],
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    out = grouped_mode(ds, "g", "v").to_pandas().sort_values("g").reset_index(drop=True)
    # x: a and b both count 2 -> lexicographic min "a" wins
    assert out["mode"].tolist() == ["a", "q"]
    assert out["mode_count"].tolist() == [2, 2]


def test_lev_capped_matches_reference():
    from kgflow.ops.dedup import _lev_capped

    def ref(a, b):
        la, lb = len(a), len(b)
        d = [[0] * (lb + 1) for _ in range(la + 1)]
        for i in range(la + 1):
            d[i][0] = i
        for j in range(lb + 1):
            d[0][j] = j
        for i in range(1, la + 1):
            for j in range(1, lb + 1):
                d[i][j] = min(
                    d[i - 1][j] + 1,
                    d[i][j - 1] + 1,
                    d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
                )
        return d[la][lb]

    def cp(s):
        return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)

    cases = [
        ("kitten", "sitting"),
        ("abc", "abc"),
        ("", "abc"),
        ("abcd", "dcba"),
        ("the quick brown fox", "the quick brown fax"),
        ("aaaa", "aa"),
    ]
    for a, b in cases:
        true = ref(a, b)
        for k in (0, 1, 2, 3, 10):
            got = _lev_capped(cp(a), cp(b), k)
            assert got == (true if true <= k else k + 1), (a, b, k)


def test_edit_distance_pairs_prefix_blocking_and_cap():
    from kgflow.ops.dedup import edit_distance_pairs

    base = "shared prefix here and then some tail words"
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                base,
                base[:-1] + "z",          # dist 1, same prefix
                "different opening " + base,   # far prefix
                base[:16] + " totally other words beyond the block",  # same
                # prefix but large distance -> pruned by the DP cap
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(3)
    out = (
        edit_distance_pairs(ds, prefix_len=16, max_dist=3)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    assert out[["doc_a", "doc_b", "dist"]].values.tolist() == [[1, 2, 1]]


def test_winsorize_clips_to_group_band():
    from kgflow.ops.clean import winsorize

    # group a: values 1..8 -> 1/8-quantile (nearest-rank) = 1, 7/8 = 7
    df = pd.DataFrame(
        {
            "event_id": np.arange(8, dtype=np.int64),
            "g": ["a"] * 8,
            "value": np.arange(1.0, 9.0),
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    out = (
        winsorize(ds, ["g"], "value")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["value_w"].tolist() == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 7.0]


def test_grouped_mode_and_gini_count_null_categories():
    from kgflow.ops.profile import grouped_gini, grouped_mode

    # NULL category has the strictly-highest count in group x: SQL
    # GROUP BY counts it, so the engine must too
    df = pd.DataFrame(
        {
            "g": ["x"] * 5,
            "v": [None, None, None, "a", "a"],
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    mode = grouped_mode(ds, "g", "v").to_pandas()
    assert mode.loc[0, "mode_count"] == 3 and pd.isna(mode.loc[0, "mode"])
    gini = grouped_gini(ds, "g", "v").to_pandas()
    # counts {NULL: 3, a: 2} -> (25 - 13)/25
    assert gini.loc[0, "n_events"] == 5
    assert gini.loc[0, "gini"] == pytest.approx((25 - 13) / 25)
