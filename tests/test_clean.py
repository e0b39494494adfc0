"""Cleaning-op unit tests: PII redaction fires and counts, repetition
fraction on crafted docs, contamination screen with known overlap."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_redact_pii_fires_and_counts():
    from kgflow.ops.clean import redact_pii

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "mail bob@corp.io and alice@x.org now",
                "server at 192.168.0.1 port 80",
                "nothing sensitive here",
            ],
        }
    )
    out = redact_pii(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert list(out["text"]) == [
        "mail <EMAIL> and <EMAIL> now",
        "server at <IP> port 80",
        "nothing sensitive here",
    ]
    assert list(out["n_redactions"]) == [2, 1, 0]


def test_repetition_stats_values():
    from kgflow.ops.clean import repetition_stats

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b a b a b",  # bigrams: ab ba ab ba ab -> 5 total 2 distinct
                "all words distinct here",
                "one",  # <2 words -> 0
            ],
        }
    )
    out = (
        repetition_stats(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "dup_bigram_frac"] == np.floor((1 - 2 / 5) * 1e4) / 1e4
    assert out.loc[1, "dup_bigram_frac"] == 0.0
    assert out.loc[2, "dup_bigram_frac"] == 0.0


def test_contamination_screen_overlap_and_short_docs():
    from kgflow.ops.clean import contamination_screen

    bench = ["the quick brown fox jumps over the lazy dog tonight"]
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                # shares the 8-gram "quick brown fox jumps over the lazy dog"
                "she saw the quick brown fox jumps over the lazy dog yesterday",
                "completely unrelated words that never appeared in any benchmark suite",
                "quick brown fox",  # <8 words -> never flagged
                # shares "the quick brown fox jumps over the lazy"
                "the quick brown fox jumps over the lazy cat tonight",
                # longest shared run is 7 words -> clean at n=8
                "a quick brown fox jumps over the lazy cat sometimes maybe",
            ],
        }
    )
    out = (
        contamination_screen(rd.from_pandas(df).repartition(2), bench, n=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["contaminated"]) == [1, 0, 0, 1, 0]


def test_normalize_text_nfc_and_whitespace():
    from kgflow.ops.clean import normalize_text

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "Café  menu",        # NFD → NFC composes to é
                " \t hello\n\nworld \t ",  # runs collapse, ends trim
                "already clean",
            ],
        }
    )
    out = (
        normalize_text(rd.from_pandas(df).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == ["Café menu", "hello world", "already clean"]
    # n_chars counts code points of the NORMALIZED text (é is 1)
    assert out["n_chars"].tolist() == [9, 11, 13]


def test_strip_hot_spans_crafted():
    import ray.data as rd

    from kgflow.ops.clean import strip_hot_spans

    boiler = "a1 a2 a3 a4 a5 a6 a7 a8"  # exactly one 8-gram
    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [f"unique{i} words here {boiler} tail{i}" for i in range(5)]
            + ["no boilerplate in this one at all"],
        }
    )
    out = (
        strip_hot_spans(rd.from_pandas(docs), k=8, max_df=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # hot grams: every 8-window not touching unique{i}/tail{i} repeats
    # across the 5 docs ("words here a1..a6", "here a1..a7", "a1..a8"),
    # covering positions 1..10 — only the per-doc unique tokens survive
    for i in range(5):
        assert out.loc[i, "clean_text"] == f"unique{i} tail{i}"
        assert out.loc[i, "n_removed"] == 10
    assert out.loc[5, "clean_text"] == "no boilerplate in this one at all"
    assert out.loc[5, "n_removed"] == 0


def test_strip_hot_spans_hot_limit_guard():
    import pytest as _pytest
    import ray.data as rd

    from kgflow.ops.clean import strip_hot_spans

    docs = pd.DataFrame(
        {"doc_id": range(10), "text": ["w1 w2 w3 w4 w5 w6 w7 w8"] * 10}
    )
    with _pytest.raises(ValueError, match="hot_limit"):
        strip_hot_spans(rd.from_pandas(docs), k=8, max_df=2, hot_limit=0).to_pandas()
