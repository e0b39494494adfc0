"""Sketch tests: HLL distinct estimates within theoretical error bounds
vs exact counts; CMS heavy hitters recover the true top-k on skewed
data with never-underestimating counts; both partitioning-independent."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_hll_global_within_bounds():
    from kgflow.ops.sketch import hll_distinct

    rng = np.random.default_rng(0)
    true_n = 20_000
    df = pd.DataFrame({"u": rng.choice(true_n, 60_000)})
    exact = df["u"].nunique()
    out = hll_distinct(rd.from_pandas(df).repartition(8), "u", p=12)
    est = int(out["n_distinct_approx"].iloc[0])
    # sigma ~ 1.04/sqrt(4096) ~ 1.6%; allow 4 sigma
    assert abs(est - exact) / exact < 0.065


def test_hll_grouped_and_partition_independent():
    from kgflow.ops.sketch import hll_distinct

    rng = np.random.default_rng(1)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 30_000),
            "u": rng.choice(5_000, 30_000),
        }
    )
    out4 = hll_distinct(rd.from_pandas(df).repartition(4), "u", group_cols=["g"])
    out9 = hll_distinct(rd.from_pandas(df).repartition(9), "u", group_cols=["g"])
    # deterministic hash + max-merge => identical regardless of blocks
    pd.testing.assert_frame_equal(out4, out9)
    exact = df.groupby("g")["u"].nunique()
    for _, r in out4.iterrows():
        assert abs(r["n_distinct_approx"] - exact[r["g"]]) / exact[r["g"]] < 0.065


def test_heavy_hitters_zipf_topk():
    from kgflow.ops.sketch import heavy_hitters

    rng = np.random.default_rng(2)
    # zipf-ish: value i appears ~ 40000/i times
    vals = np.concatenate([np.full(40_000 // i, f"v{i:03d}") for i in range(1, 200)])
    rng.shuffle(vals)
    df = pd.DataFrame({"v": vals})
    out = heavy_hitters(rd.from_pandas(df).repartition(7), "v", k=5)
    exact = df["v"].value_counts()
    assert list(out["value"]) == list(exact.head(5).index)
    # CMS point queries never underestimate
    for _, r in out.iterrows():
        assert r["n_approx"] >= exact[r["value"]]
        # and with this width/depth on 200 keys, they are near-exact
        assert r["n_approx"] <= exact[r["value"]] * 1.02


def test_heavy_hitters_partition_independent():
    from kgflow.ops.sketch import heavy_hitters

    rng = np.random.default_rng(3)
    vals = rng.choice([f"k{i}" for i in range(50)], 10_000, p=None)
    df = pd.DataFrame({"v": vals})
    a = heavy_hitters(rd.from_pandas(df).repartition(3), "v", k=10)
    b = heavy_hitters(rd.from_pandas(df).repartition(11), "v", k=10)
    pd.testing.assert_frame_equal(a, b)


def test_bloom_incremental_filter():
    from kgflow.ops.sketch import bloom_build, bloom_filter_new

    old = pd.DataFrame({"t": [f"doc-{i}" for i in range(500)]})
    new = pd.DataFrame({"t": [f"doc-{i}" for i in range(400, 900)]})
    words = bloom_build(rd.from_pandas(old).repartition(4), "t", n_bits=1 << 20)
    out = (
        bloom_filter_new(rd.from_pandas(new).repartition(3), "t", words)
        .to_pandas()["t"]
        .tolist()
    )
    # hard guarantee: nothing old survives
    assert not (set(out) & set(old["t"]))
    # at this load factor there are no false positives: exactly the new half
    assert sorted(out) == sorted(f"doc-{i}" for i in range(500, 900))


def test_embedding_pca_recovers_low_rank():
    import pyarrow as pa

    from kgflow.ops.ann import embedding_pca

    rng = np.random.default_rng(11)
    # rank-3 structure in 16 dims + small noise
    Z = rng.normal(size=(600, 3)) * np.array([5.0, 3.0, 1.5])
    W = np.linalg.qr(rng.normal(size=(16, 3)))[0].T
    X = Z @ W + rng.normal(scale=0.01, size=(600, 16))
    t = pa.table(
        {
            "vec_id": pa.array(range(600), pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in X],
                pa.list_(pa.float32()),
            ),
        }
    )
    out = (
        embedding_pca(rd.from_arrow(t).repartition(5), k=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    P = out[["pc0", "pc1", "pc2"]].to_numpy()
    # top-3 components capture essentially all variance
    total_var = ((X - X.mean(axis=0)) ** 2).sum()
    assert P.var(axis=0).sum() * len(X) / total_var > 0.99
    # matches local PCA on the same float32-quantized data up to sign pin
    Xq = np.asarray(
        [np.asarray(r, dtype=np.float32) for r in t.column("embedding").to_pylist()]
    ).astype(np.float64)
    cov = np.cov(Xq, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :3]
    flip = np.sign(comps[np.argmax(np.abs(comps), axis=0), np.arange(3)])
    comps = comps * np.where(flip == 0, 1.0, flip)
    exp = (Xq - Xq.mean(axis=0)) @ comps
    assert np.allclose(P, exp, atol=1e-6)
