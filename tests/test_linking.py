"""Entity-linking tests: normalization, minhash/LSH blocking, connected
components, and the full mention→entity map against gold clusters
(SURVEY.md §5.2 test #6 + FIXTURES.md §5)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from kgflow.fixtures import corpus
from kgflow.fixtures.pages import ensure_pages
from kgflow.linking.cc import connected_components
from kgflow.linking.link import (
    candidate_pairs,
    canonical_triples,
    entity_map,
    normalize_mention,
)
from kgflow.linking.minhash import MinHasher, jaccard
from kgflow.pipelines.kg import triples_ds


def test_normalize():
    assert normalize_mention("alice - fox") == "alice fox"
    assert normalize_mention("Alice FOX") == "alice fox"
    assert normalize_mention("  osaka  ") == "osaka"


def test_jaccard_aliases_high_cross_entities_low():
    for ent in corpus.PER[:5] + corpus.LOC[:5] + corpus.ORG[:5]:
        typo = ent + ent[-1]
        assert jaccard(ent, typo) >= 0.5, (ent, typo, jaccard(ent, typo))
    # distinct entities stay apart
    pools = corpus.PER + corpus.LOC + corpus.ORG
    for i in range(len(pools)):
        for j in range(i + 1, len(pools)):
            assert jaccard(pools[i], pools[j]) < 0.5, (pools[i], pools[j])


def test_minhash_identical_strings_cobucket():
    h = MinHasher()
    a = h.band_hashes("alice fox", 16, 4)
    b = h.band_hashes("alice fox", 16, 4)
    assert (a == b).all()


def test_connected_components_smoke(ray_session):
    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "src": ["a", "b", "c", "x", "q"],
                "dst": ["b", "c", "a", "y", "q"],
            }
        )
    )
    got = {
        r["node"]: r["comp"]
        for r in connected_components(edges, driver_limit=0).take_all()
    }
    assert got["a"] == got["b"] == got["c"] == "a"
    assert got["x"] == got["y"] == "x"
    assert got["q"] == "q"


def test_connected_components_long_chain(ray_session):
    # diameter-5 path graph forces several propagation rounds
    nodes = list("fedcba")
    edges = rd.from_pandas(
        pd.DataFrame({"src": nodes[:-1], "dst": nodes[1:]})
    )
    got = {
        r["node"]: r["comp"]
        for r in connected_components(edges, driver_limit=0).take_all()
    }
    assert all(got[n] == "a" for n in nodes), got


def test_cc_star_matches_minlabel(ray_session):
    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "src": ["a", "b", "c", "x", "q"],
                "dst": ["b", "c", "a", "y", "q"],
            }
        )
    )
    want = {
        r["node"]: r["comp"]
        for r in connected_components(edges, driver_limit=0).take_all()
    }
    got = {
        r["node"]: r["comp"]
        for r in connected_components(
            edges, algorithm="star", driver_limit=0
        ).take_all()
    }
    assert got == want


def test_cc_star_long_chain_log_rounds(ray_session):
    # 64-node path: min-label propagation needs ~63 rounds (rounds =
    # eccentricity of the min node); star contraction must converge in
    # O(log n) — the very reason it exists (VERDICT r2 item 4).
    n = 64
    nodes = [f"n{i:02d}" for i in range(n)]
    edges = rd.from_pandas(pd.DataFrame({"src": nodes[:-1], "dst": nodes[1:]}))
    stats = {}
    got = {
        r["node"]: r["comp"]
        for r in connected_components(
            edges, algorithm="star", stats=stats, driver_limit=0
        ).take_all()
    }
    assert all(got[x] == "n00" for x in nodes), got
    assert len(got) == n
    # log2(64) = 6; each round is one large-star + one small-star pass.
    # Allow slack for the +1 fixpoint-confirmation round.
    assert stats["rounds"] <= 10, stats


def test_cc_int64_nodes_both_algorithms(ray_session):
    # CC is dtype-generic: int64 node ids must survive every round with
    # no object upcast — and the star path must still be log-round
    def chain_edges(n):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "src": np.arange(n - 1, dtype=np.int64) + 100,
                    "dst": np.arange(1, n, dtype=np.int64) + 100,
                }
            )
        )

    # minlabel needs rounds = chain length, so keep its chain short
    got_ml = {
        r["node"]: r["comp"]
        for r in connected_components(chain_edges(12), driver_limit=0).take_all()
    }
    assert all(isinstance(k, (int, np.integer)) for k in got_ml)
    assert all(got_ml[i] == 100 for i in range(100, 112))
    # star must handle the 64-chain in O(log n) rounds with int64 nodes
    stats = {}
    got_star = {
        r["node"]: r["comp"]
        for r in connected_components(
            chain_edges(64), algorithm="star", stats=stats, driver_limit=0
        ).take_all()
    }
    assert all(got_star[i] == 100 for i in range(100, 164))
    assert stats["rounds"] <= 10, stats


def test_cc_star_singletons_and_dups(ray_session):
    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "src": ["s", "a", "a", "b"],
                "dst": ["s", "b", "b", "a"],
            }
        )
    )
    got = {
        r["node"]: r["comp"]
        for r in connected_components(
            edges, algorithm="star", driver_limit=0
        ).take_all()
    }
    assert got == {"s": "s", "a": "a", "b": "a"}


def test_candidate_pairs_find_typos(ray_session):
    norms = [m for m in corpus.PER[:8]] + [m + m[-1] for m in corpus.PER[:8]]
    ds = rd.from_pandas(pd.DataFrame({"norm": norms}))
    pairs = candidate_pairs(ds).take_all()
    found = {tuple(sorted((p["src"], p["dst"]))) for p in pairs}
    for m in corpus.PER[:8]:
        assert tuple(sorted((m, m + m[-1]))) in found, m


@pytest.fixture(scope="module")
def fixture_dir(ray_session):
    return ensure_pages(400)


def test_distributed_equals_driver_path(fixture_dir):
    """The groupby-shuffle LSH + iterated-groupby CC path must assign the
    same clusters as the driver-side union-find path."""
    import ray.data as rd

    triples = triples_ds(fixture_dir).limit(300).materialize()
    a = entity_map(triples, mode="driver").to_pandas()
    b = entity_map(triples, mode="distributed").to_pandas()
    ga = a.sort_values("mention").reset_index(drop=True)
    gb = b.sort_values("mention").reset_index(drop=True)
    assert list(ga["mention"]) == list(gb["mention"])
    # same partition of mentions into clusters and same canonical forms
    assert list(ga["canonical"]) == list(gb["canonical"])
    assert list(ga["entity_id"]) == list(gb["entity_id"])


def test_distributed_path_at_50k_mentions(ray_session):
    """Scale guard for the distributed linking path: ≥50k distinct
    mentions must link via mode="distributed" within a fixed time budget
    and agree exactly with the driver-side union-find path. Catches
    regressions to per-group Python joins (the round-1 scale-killer)."""
    import time

    import numpy as np

    rng = np.random.default_rng(7)
    n = 26_000  # 2 mentions per row -> 52k distinct surfaces

    def rand_mentions(count: int) -> list:
        # realistic vocabulary: two random 8-letter words per mention, so
        # unrelated mentions share few shingles and LSH buckets stay small
        arr = rng.integers(0, 26, size=(count, 2, 8))
        return [
            "".join(chr(97 + c) for c in row[0])
            + " "
            + "".join(chr(97 + c) for c in row[1])
            for row in arr
        ]

    base = rand_mentions(n)
    # ~10% typo aliases of another mention (linkable pairs)
    subs = list(base)
    for i in range(0, n, 10):
        subs[i] = base[(i + 1) % n] + base[(i + 1) % n][-1]
    objs = rand_mentions(n)
    triples = rd.from_pandas(
        pd.DataFrame({"subj": subs, "obj": objs})
    ).repartition(16).materialize()

    t0 = time.monotonic()
    dist = entity_map(triples, mode="distributed").to_pandas()
    dist_s = time.monotonic() - t0
    drv = entity_map(triples, mode="driver").to_pandas()

    assert len(dist) >= 50_000
    a = drv.sort_values("mention").reset_index(drop=True)
    b = dist.sort_values("mention").reset_index(drop=True)
    assert list(a["mention"]) == list(b["mention"])
    assert list(a["canonical"]) == list(b["canonical"])
    assert list(a["entity_id"]) == list(b["entity_id"])
    # generous bound on the 4-CPU test session; the per-group map_groups
    # version of this path took minutes at this size
    assert dist_s < 180, f"distributed linking took {dist_s:.1f}s"


def test_entity_map_matches_gold_clusters(fixture_dir):
    triples = triples_ds(fixture_dir).materialize()
    emap = entity_map(triples).to_pandas()
    gold = pq.read_table(fixture_dir + "/gold_clusters.parquet").to_pandas()
    # gold: raw surface → canonical entity; our map keys are extracted
    # (detokenized) surfaces — compare on normalized forms
    gold_by_norm = {
        normalize_mention(m): e for m, e in zip(gold["mention"], gold["entity"])
    }
    ours = {row["norm"]: row["entity_id"] for _, row in emap.iterrows()}
    # completeness: every observed mention got an entity id
    assert emap["entity_id"].notna().all()
    # same gold entity -> same entity_id (recall over observed aliases)
    from collections import defaultdict

    ids_per_entity = defaultdict(set)
    entities_per_id = defaultdict(set)
    for norm, eid in ours.items():
        ent = gold_by_norm.get(norm)
        if ent is None:
            continue
        ids_per_entity[ent].add(eid)
        entities_per_id[eid].add(ent)
    assert ids_per_entity, "no observed mentions matched gold"
    bad_recall = {e: ids for e, ids in ids_per_entity.items() if len(ids) > 1}
    assert not bad_recall, bad_recall
    bad_precision = {i: es for i, es in entities_per_id.items() if len(es) > 1}
    assert not bad_precision, bad_precision


def test_canonical_triples_columns(fixture_dir):
    triples = triples_ds(fixture_dir).materialize()
    canon, emap = canonical_triples(triples)
    row = canon.take(1)[0]
    for c in ("subj_id", "subj_canonical", "obj_id", "obj_canonical"):
        assert c in row
    # canonical forms are normalized gold entities
    assert row["subj_canonical"] == normalize_mention(row["subj_canonical"])


def test_shuffle_join_canonicalize_matches_broadcast(fixture_dir):
    """Round-3 scale fix: applying the entity map via the bucketed
    co-partitioned shuffle join (the path that works when the map
    exceeds the broadcast threshold) must emit exactly the broadcast
    join's rows — including identity clusters for unseen mentions."""
    import pandas as pd

    from kgflow.linking.link import canonicalize_triples_with_map, entity_map

    triples = triples_ds(fixture_dir).limit(500).materialize()
    # drop some mentions from the map so the unseen-mention identity
    # path is exercised on BOTH join strategies
    emap = entity_map(triples).materialize()
    emap_small = emap.filter(lambda r: r["mention"][:1] not in ("a", "b")).materialize()

    def norm(ds):
        df = ds.to_pandas()
        cols = ["url", "sent_id", "rel_id", "subj", "obj",
                "subj_id", "subj_canonical", "obj_id", "obj_canonical"]
        df = df[cols]
        df["subj_id"] = df["subj_id"].astype("int64")
        df["obj_id"] = df["obj_id"].astype("int64")
        return df.sort_values(cols[:5]).reset_index(drop=True)

    bro = norm(canonicalize_triples_with_map(triples, emap_small, join="broadcast"))
    shu = norm(canonicalize_triples_with_map(triples, emap_small, join="shuffle"))
    assert len(bro) == len(shu) == 500
    pd.testing.assert_frame_equal(bro, shu)
    # auto mode with a forced-low threshold takes the shuffle path and
    # still matches
    auto = norm(
        canonicalize_triples_with_map(triples, emap_small, broadcast_limit=1)
    )
    pd.testing.assert_frame_equal(bro, auto)


def test_cc_driver_fast_path_matches_distributed(ray_session):
    # the default driver_limit routes small edge sets through the
    # Shiloach-Vishkin driver kernel; it must be byte-identical to the
    # distributed rounds for str AND int64 nodes, singletons included
    rng = np.random.default_rng(17)
    src = rng.integers(0, 200, size=500).astype(np.int64)
    dst = rng.integers(0, 200, size=500).astype(np.int64)
    edges_i = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    stats = {}
    fast = {
        r["node"]: r["comp"]
        for r in connected_components(edges_i, stats=stats).take_all()
    }
    assert stats["algorithm"] == "driver"
    slow = {
        r["node"]: r["comp"]
        for r in connected_components(edges_i, driver_limit=0).take_all()
    }
    assert fast == slow

    edges_s = rd.from_pandas(
        pd.DataFrame(
            {"src": ["a", "b", "c", "x", "q"], "dst": ["b", "c", "a", "y", "q"]}
        )
    )
    fast_s = {
        r["node"]: r["comp"] for r in connected_components(edges_s).take_all()
    }
    assert fast_s == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "q": "q"}


def test_cc_driver_fast_path_long_chain(ray_session):
    # a 1000-node path: SV converges in O(log n) vectorized rounds
    n = 1000
    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "src": np.arange(n - 1, dtype=np.int64),
                "dst": np.arange(1, n, dtype=np.int64),
            }
        )
    )
    stats = {}
    got = {
        r["node"]: r["comp"]
        for r in connected_components(edges, stats=stats).take_all()
    }
    assert all(got[i] == 0 for i in range(n))
    assert stats["algorithm"] == "driver" and stats["rounds"] <= 15, stats
