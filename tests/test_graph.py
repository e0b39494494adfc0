"""PageRank vs a dense NumPy power iteration with identical damping,
iteration count, and dangling-mass redistribution."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _dense_pagerank(edges, d=0.85, iters=10):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    V = len(nodes)
    out = np.zeros(V)
    for u, _ in edges:
        out[idx[u]] += 1
    r = np.full(V, 1.0 / V)
    for _ in range(iters):
        dm = r[out == 0].sum()
        contrib = np.zeros(V)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / out[idx[u]]
        r = (1 - d) / V + d * (contrib + dm / V)
    return dict(zip(nodes, r))


def test_pagerank_matches_dense_power_iteration():
    from kgflow.ops.graph import pagerank

    # hub, chain, cycle, a dangling node (5 has no out-edges), and a
    # parallel edge (1→2 twice) so multi-edges count per row
    edges = [
        (1, 2), (1, 2), (1, 3), (2, 3), (3, 4), (4, 1), (3, 5), (2, 5),
        (6, 1), (6, 5),
    ]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    got = (
        pagerank(rd.from_pandas(df).repartition(3), iters=10)
        .to_pandas()
        .set_index("node")["rank"]
        .to_dict()
    )
    want = _dense_pagerank(edges, iters=10)
    assert set(got) == set(want)
    for n, r in want.items():
        assert abs(got[n] - r) < 1e-9, (n, got[n], r)
    # ranks stay a probability distribution under dangling correction
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_prefers_indegree_sink():
    from kgflow.ops.graph import pagerank

    # star into node 0: it must outrank every leaf
    edges = [(i, 0) for i in range(1, 8)]
    df = pd.DataFrame(edges, columns=["src", "dst"])
    got = (
        pagerank(rd.from_pandas(df).repartition(2), iters=5)
        .to_pandas()
        .set_index("node")["rank"]
        .to_dict()
    )
    assert got[0] == max(got.values())
    assert all(abs(got[i] - got[1]) < 1e-12 for i in range(2, 8))


def test_weighted_pagerank_matches_dense():
    from kgflow.ops.graph import pagerank

    edges = [
        (1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0), (3, 4, 4.0),
        (4, 2, 1.0), (5, 3, 2.5),
    ]
    df = pd.DataFrame(edges, columns=["src", "dst", "weight"])
    got = (
        pagerank(rd.from_pandas(df).repartition(2), weight_col="weight", iters=8)
        .to_pandas()
        .set_index("node")["rank"]
        .to_dict()
    )

    nodes = sorted({u for u, _, _ in edges} | {v for _, v, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    V, d = len(nodes), 0.85
    outw = np.zeros(V)
    for u, _, w in edges:
        outw[idx[u]] += w
    r = np.full(V, 1.0 / V)
    for _ in range(8):
        dm = r[outw == 0].sum()
        contrib = np.zeros(V)
        for u, v, w in edges:
            contrib[idx[v]] += r[idx[u]] * w / outw[idx[u]]
        r = (1 - d) / V + d * (contrib + dm / V)
    want = dict(zip(nodes, r))

    assert set(got) == set(want)
    for n in want:
        assert abs(got[n] - want[n]) < 1e-9
    assert abs(sum(got.values()) - 1.0) < 1e-9
