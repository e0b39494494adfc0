"""Wave-9 operator tests: inter-arrival gap quantiles, bottom-k sample
quantile sketch (partitioning invariance + sampling error bound)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_gap_quantiles_simple_stream():
    from kgflow.ops.window import gap_quantiles

    # one user, one type, events every 10s except one 100s gap
    ts = pd.to_datetime(
        [0, 10, 20, 120, 130], unit="s", utc=False
    ).tz_localize(None)
    df = pd.DataFrame(
        {
            "user_id": [1] * 5,
            "event_type": ["a"] * 5,
            "ts": ts,
            "event_id": np.arange(5, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(3)
    out = (
        gap_quantiles(ds, qs=(0.5,))
        .to_pandas()
        .reset_index(drop=True)
    )
    # gaps: 10, 10, 100, 10 -> median (rank ceil(0.5*4)=2) = 10
    assert out["v"].tolist() == [10.0]


def test_fnv1a_decimal_known_vector():
    from kgflow.ops.sketch import _fnv1a_decimal

    # FNV-1a of "42" computed by the straightforward scalar fold
    h = np.uint64(14695981039346656037)
    for ch in "42":
        h = np.uint64((int(h) ^ ord(ch)) * 1099511628211 % 2**64)
    assert _fnv1a_decimal(np.array([42], dtype=np.int64))[0] == h


def test_bottomk_sketch_partitioning_invariant():
    from kgflow.ops.sketch import bottomk_sample_quantiles

    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "event_id": np.arange(5000, dtype=np.int64),
            "value": rng.normal(50, 10, size=5000),
        }
    )
    outs = []
    for parts in (2, 17):
        ds = rd.from_pandas(df).repartition(parts)
        outs.append(
            bottomk_sample_quantiles(ds, "event_id", "value", k=256)
            .to_pandas()
            .sort_values("q")
            .reset_index(drop=True)
        )
    # min-semilattice: same output regardless of block layout
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_bottomk_sketch_rank_error_bound():
    from kgflow.ops.sketch import bottomk_sample_quantiles

    rng = np.random.RandomState(5)
    n = 20000
    vals = rng.exponential(scale=100.0, size=n)  # heavy-tailed
    df = pd.DataFrame(
        {"event_id": np.arange(n, dtype=np.int64), "value": vals}
    )
    ds = rd.from_pandas(df).repartition(8)
    out = (
        bottomk_sample_quantiles(ds, "event_id", "value", k=1024)
        .to_pandas()
        .sort_values("q")
        .reset_index(drop=True)
    )
    srt = np.sort(vals)
    for q, v in zip(out["q"], out["v"]):
        true_rank = np.searchsorted(srt, v) / n
        # sampling bound ~ 1.04/sqrt(k) ≈ 3.3%; allow 4 sigma-ish
        assert abs(true_rank - q) < 0.08, (q, true_rank)


def test_pack_sequences_greedy_and_oversized():
    from kgflow.ops.text import pack_sequences

    # shard 0: tokens [5, 5, 5] with budget 10 -> bins [0, 0, 1]
    # one oversized doc (15 tokens > budget) -> its own bin
    texts = {
        0: "a b c d e",
        1: "a b c d e",
        2: "a b c d e",
        3: " ".join(["w"] * 15),
        4: "a b",
    }
    df = pd.DataFrame(
        {"doc_id": list(texts), "text": [texts[i] for i in texts]}
    )
    ds = rd.from_pandas(df).repartition(3)
    out = (
        pack_sequences(ds, budget=10, shard_size=100)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["bin"].tolist() == [0, 0, 1, 2, 3]
    assert out["n_tokens"].tolist() == [5, 5, 5, 15, 2]


def test_pack_sequences_shard_local_parallel():
    from kgflow.ops.text import pack_sequences

    # two shards pack independently: bins restart at 0 per shard
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 100, 101],
            "text": ["x y z"] * 4,
        }
    )
    ds = rd.from_pandas(df).repartition(2)
    out = (
        pack_sequences(ds, budget=5, shard_size=100)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["shard"].tolist() == [0, 0, 1, 1]
    assert out["bin"].tolist() == [0, 1, 0, 1]


def test_label_centroids_exact_small():
    import pyarrow as pa

    from kgflow.ops.ann import label_centroids

    tbl = pa.table(
        {
            "label": pa.array([0, 0, 1], pa.int32()),
            "embedding": pa.array(
                [[1.0, 2.0], [3.0, 4.0], [10.0, -2.5]],
                pa.list_(pa.float32()),
            ),
        }
    )
    ds = rd.from_arrow(tbl).repartition(2)
    out = (
        label_centroids(ds)
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    assert out["n_vecs"].tolist() == [2, 2, 1, 1]
    assert out["centroid"].tolist() == [2.0, 3.0, 10.0, -2.5]
