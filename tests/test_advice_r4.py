"""Round-4 regression tests for the advisor's edge-case findings:
empty-batch hash_split, jaccard_pairs id-range guard, asof_join id
precision above 2^53, all-null columns in profile_columns, and empty
rule dicts in rule_violation_counts."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_hash_split_survives_empty_blocks():
    from kgflow.ops.text import hash_split

    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["aa", "bb", "cc"]})
    # a filter that drops everything produces empty downstream blocks —
    # the untyped np.array([]) used to raise UFuncTypeError there
    ds = rd.from_pandas(docs).filter(lambda r: False)
    out = hash_split(ds).to_pandas()
    assert len(out) == 0
    # before the dtype fix this raised UFuncTypeError inside map_batches


def test_jaccard_pairs_rejects_out_of_range_ids():
    from kgflow.ops.dedup import jaccard_pairs

    docs = pd.DataFrame(
        {
            "doc_id": [1 << 32, 1, 2],
            "text": ["a b c d", "a b c d", "a b c e"],
        }
    )
    with pytest.raises(Exception, match="doc_id"):
        jaccard_pairs(rd.from_pandas(docs), threshold=0.1).to_pandas()


def test_asof_join_preserves_ids_above_2_53():
    from kgflow.ops.window import asof_join

    big = (1 << 60) + 12345  # would round under float64
    ts = pd.to_datetime(["2024-01-01 00:00:05", "2024-01-01 00:00:20"]).astype(
        "datetime64[us]"
    )
    left = pd.DataFrame({"user_id": [1], "ts": ts[1:], "event_id": [100]})
    right = pd.DataFrame({"user_id": [1], "ts": ts[:1], "event_id": [big]})
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right), num_buckets=2
    ).to_pandas()
    assert out["prior_event_id"].tolist() == [big]


def test_profile_columns_keeps_all_null_column():
    from kgflow.ops.profile import profile_columns

    df = pd.DataFrame(
        {"a": [1.0, 2.0, 3.0], "b": [np.nan, np.nan, np.nan]}
    )
    out = (
        profile_columns(rd.from_pandas(df), ["a", "b"])
        .to_pandas()
        .set_index("column")
    )
    assert set(out.index) == {"a", "b"}
    assert out.loc["b", "n_rows"] == 3
    assert out.loc["b", "n_null"] == 3
    assert out.loc["b", "n_distinct"] == 0
    assert out.loc["a", "n_distinct"] == 3


def test_rule_violation_counts_rejects_empty_rules():
    from kgflow.ops.checks import rule_violation_counts

    ds = rd.from_pandas(pd.DataFrame({"x": [1, 2]}))
    with pytest.raises(ValueError, match="non-empty"):
        rule_violation_counts(ds, {})
