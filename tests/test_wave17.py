"""Wave-68 session additions: SemDeDup (Abbas et al. 2023),
synchronous label propagation, CCNet line dedup, neighbor-Jaccard
link scores, KG edge evidence / functional-constraint / snapshot
delta, perceptual near-dup across image/audio/video, RAG chunking,
k-anonymity audit, crawl link graph. Oracled queries get their exact
gate from the driver sweep; these tests pin what the oracles cannot
see — non-identical near-dups, chain/keep-rule semantics, loud caps
and guards, forced distributed paths, planted-input exactness."""

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from kgflow.ops.dedup import semdedup


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def _emb(rows):
    return rd.from_pandas(
        pd.DataFrame(
            {
                "vec_id": pd.Series([r[0] for r in rows], dtype="int64"),
                "embedding": [np.asarray(r[1], dtype=np.float32) for r in rows],
            }
        )
    )


def test_semdedup_drops_near_identical_keeps_lowest_id():
    # two tight groups along orthogonal axes + one far-off singleton;
    # k=2 so the E-step splits the space, near-dups are NOT byte-equal
    a = [0.9, 0.01, 0.0, 0.0]
    a2 = [0.89, 0.012, 0.001, 0.0]  # cos(a, a2) ~ 0.99997
    b = [0.0, 0.0, 0.9, 0.02]
    b2 = [0.001, 0.0, 0.91, 0.021]
    far = [-0.9, 0.0, 0.0, 0.3]
    out = (
        semdedup(_emb([(1, a), (2, b), (3, a2), (4, b2), (5, far)]), k=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    kept = dict(zip(out["vec_id"], out["kept"]))
    assert kept[1] == 1 and kept[3] == 0  # 3 is a near-dup of 1
    assert kept[2] == 1 and kept[4] == 0  # 4 is a near-dup of 2
    assert kept[5] == 1


def _ang(deg):
    t = np.deg2rad(deg)
    return [float(np.cos(t)) * 0.9, float(np.sin(t)) * 0.9, 0.0, 0.0]


def test_semdedup_chain_descending_ids_propagates():
    # angles 0/13/26 deg, threshold 19/20 = cos ~18.2deg: ids along
    # the chain — 2 drops (witness 1 at 13deg), 3 drops too (direct
    # witness 2 at 13deg, even though 2 itself was dropped)
    out = (
        semdedup(_emb([(1, _ang(0)), (2, _ang(13)), (3, _ang(26))]), k=1)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert out["kept"].tolist() == [1, 0, 0]


def test_semdedup_chain_ascending_id_breaks_propagation():
    # same geometry, but the middle vector has the LARGEST id: the
    # 26deg vector's only candidate witnesses are smaller ids = {1},
    # and cos(26deg) < 19/20 — so it survives; only id 3 drops
    out = (
        semdedup(_emb([(1, _ang(0)), (2, _ang(26)), (3, _ang(13))]), k=1)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert out["kept"].tolist() == [1, 1, 0]


def test_semdedup_cluster_cap_fails_loudly():
    rows = [(i, [0.5, 0.0]) for i in range(10)]
    with pytest.raises(Exception, match="max_cluster"):
        semdedup(_emb(rows), k=1, max_cluster=5).materialize()


def test_semdedup_overflow_guard():
    # huge magnitudes at the default sim_scale overflow int64 loudly
    rows = [(1, [3000.0] * 64), (2, [2999.0] * 64)]
    with pytest.raises(Exception, match="overflow"):
        semdedup(_emb(rows), k=1).materialize()


def test_semdedup_all_rows_present_once():
    rng = np.random.RandomState(0)
    rows = [(i, rng.randn(8) * 0.3) for i in range(60)]
    out = semdedup(_emb(rows), k=4).to_pandas()
    assert sorted(out["vec_id"]) == list(range(60))
    assert set(out["kept"]).issubset({0, 1})
    # random gaussians at cos >= 0.95: nothing should drop
    assert out["kept"].sum() == 60


def _edges(rows):
    return rd.from_pandas(
        pd.DataFrame(
            {
                "u": pd.Series([r[0] for r in rows], dtype="int64"),
                "v": pd.Series([r[1] for r in rows], dtype="int64"),
            }
        )
    )


def _lpa_ref(rows, rounds):
    # brute-force synchronous LPA: neighbor-label mode, tie -> min
    import collections

    adj = collections.defaultdict(list)
    for u, v in rows:
        adj[u].append(v)
        adj[v].append(u)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n in adj:
            cnt = collections.Counter(lab[m] for m in adj[n])
            top = max(cnt.values())  # tie -> smallest label
            new[n] = min(l for l, c in cnt.items() if c == top)
        lab = new
    return lab


def _check_lpa(rows, rounds, **kw):
    from kgflow.ops.graph import label_propagation

    out = (
        label_propagation(_edges(rows), rounds=rounds, **kw)
        .to_pandas()
        .sort_values("node")
    )
    got = dict(zip(out["node"], out["community"]))
    assert got == _lpa_ref(rows, rounds)


def test_lpa_barbell_two_communities():
    # two triangles joined by one bridge edge
    rows = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    _check_lpa(rows, 5)


def test_lpa_lone_edge_oscillates_deterministically():
    from kgflow.ops.graph import label_propagation

    # a single edge swaps labels every round: odd rounds -> swapped
    out = (
        label_propagation(_edges([(1, 2)]), rounds=5)
        .to_pandas()
        .sort_values("node")
    )
    assert out["community"].tolist() == [2, 1]
    out = (
        label_propagation(_edges([(1, 2)]), rounds=4)
        .to_pandas()
        .sort_values("node")
    )
    assert out["community"].tolist() == [1, 2]


def test_lpa_distributed_path_matches_driver():
    rng = np.random.RandomState(7)
    rows = list(
        {
            (int(a), int(b))
            for a, b in rng.randint(0, 40, size=(120, 2))
            if a < b
        }
    )
    _check_lpa(rows, 5, driver_limit=0)  # force the distributed rounds
    _check_lpa(rows, 3)


def _docs_ds(texts):
    return rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": pd.Series(range(len(texts)), dtype="int64"),
                "text": texts,
            }
        )
    )


LINE_CASES = [
    "the shared boilerplate footer line\nunique body one here",
    "the shared boilerplate footer line\nunique body two here",
    "the shared boilerplate footer line",  # all lines drop -> ""
    "short\nunique body three here\nshort",  # short lines immune
    "repeated inside one doc only\nrepeated inside one doc only",
]

LINE_EXPECT = {
    # doc_id: (text_clean, n_lines, n_dropped)
    0: ("unique body one here", 2, 1),
    1: ("unique body two here", 2, 1),
    2: ("", 1, 1),
    3: ("short\nunique body three here\nshort", 3, 0),
    4: ("", 2, 2),  # within-doc repeats count as occurrences
}


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_line_dedup_semantics(strategy):
    from kgflow.ops.clean import line_dedup

    out = (
        line_dedup(_docs_ds(LINE_CASES), min_chars=10, strategy=strategy)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = {
        int(r.doc_id): (r.text_clean, int(r.n_lines), int(r.n_dropped))
        for r in out.itertuples()
    }
    assert got == LINE_EXPECT


def test_line_dedup_broadcast_overflow_raises():
    from kgflow.ops.clean import line_dedup

    with pytest.raises(Exception, match="broadcast_limit"):
        line_dedup(
            _docs_ds(LINE_CASES),
            min_chars=10,
            strategy="broadcast",
            broadcast_limit=0,
        ).materialize()


def test_jaccard_link_scores_exact():
    from kgflow.ops.graph import jaccard_link_scores

    # hubs: 10 -> {1,2,3}, 20 -> {1,2}, 30 -> {2,4}, 40 -> {5} (deg-1
    # hub supports no pair); duplicate edge rows must not inflate cn
    rows = [
        (10, 1), (10, 2), (10, 3), (10, 2),
        (20, 1), (20, 2),
        (30, 2), (30, 4),
        (40, 5),
    ]
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "hub": pd.Series([r[0] for r in rows], dtype="int64"),
                "leaf": pd.Series([r[1] for r in rows], dtype="int64"),
            }
        )
    )
    out = (
        jaccard_link_scores(ds, hub_col="hub", leaf_col="leaf")
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    got = {
        (int(r.u), int(r.v)): (int(r.cn), int(r.deg_u), int(r.deg_v), r.jac)
        for r in out.itertuples()
    }
    # N(1)={10,20}, N(2)={10,20,30}, N(3)={10}, N(4)={30}, N(5)={40}
    assert got == {
        (1, 2): (2, 2, 3, 2 / 3),
        (1, 3): (1, 2, 1, 1 / 2),
        (2, 3): (1, 3, 1, 1 / 3),
        (2, 4): (1, 3, 1, 1 / 3),
    }


def test_jaccard_hot_hub_fails_loudly():
    from kgflow.ops.graph import jaccard_link_scores

    rows = [(1, i) for i in range(20)]
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "hub": pd.Series([r[0] for r in rows], dtype="int64"),
                "leaf": pd.Series([r[1] for r in rows], dtype="int64"),
            }
        )
    )
    with pytest.raises(Exception, match="max_degree"):
        jaccard_link_scores(
            ds, hub_col="hub", leaf_col="leaf", max_degree=5
        ).materialize()


def test_edge_evidence_domains_and_timestamps():
    from kgflow.ops.web import edge_evidence

    canon = rd.from_pandas(
        pd.DataFrame(
            {
                "subj_id": pd.Series([1, 1, 1, 2], dtype="int64"),
                "rel_id": pd.Series([7, 7, 7, 8], dtype="int64"),
                "obj_id": pd.Series([3, 3, 3, 4], dtype="int64"),
                "subj_canonical": ["alice"] * 3 + ["bob"],
                "rel": ["works_for"] * 3 + ["born_in"],
                "obj_canonical": ["acme"] * 3 + ["osaka"],
                "url": [
                    "https://a.example/p1",
                    "https://a.example/p2",  # same domain, 2nd capture
                    "https://b.example/p9",  # independent domain
                    "https://a.example/p1",
                ],
            }
        )
    )
    pages = rd.from_pandas(
        pd.DataFrame(
            {
                "url": [
                    "https://a.example/p1",
                    "https://a.example/p2",
                    "https://b.example/p9",
                ],
                "warc_ts": pd.to_datetime(
                    ["2026-01-01", "2026-03-01", "2026-02-01"]
                ).astype("datetime64[us]"),
            }
        )
    )
    out = (
        edge_evidence(canon, pages)
        .to_pandas()
        .sort_values("subj_id")
        .reset_index(drop=True)
    )
    t = lambda s: int(pd.Timestamp(s).value // 1000)  # ns -> us
    assert out.loc[0, ["weight", "n_domains"]].tolist() == [3, 2]
    assert int(out.loc[0, "first_ts"]) == t("2026-01-01")
    assert int(out.loc[0, "last_ts"]) == t("2026-03-01")
    assert out.loc[1, ["weight", "n_domains"]].tolist() == [1, 1]
    assert out.loc[1, "subj_canonical"] == "bob"


def test_functional_violations_planted():
    from kgflow.ops.web import functional_violations

    canon = rd.from_pandas(
        pd.DataFrame(
            {
                "subj_canonical": [
                    "alice", "alice", "alice",   # 2 distinct birthplaces
                    "bob", "bob",                # same object twice: fine
                    "carol",                     # one object: fine
                    "acme", "acme",              # non-functional rel
                ],
                "rel": [
                    "born_in", "born_in", "born_in",
                    "born_in", "born_in",
                    "capital_of",
                    "founded_by", "founded_by",
                ],
                "obj_canonical": [
                    "osaka", "kyoto", "osaka",
                    "lima", "lima",
                    "peru",
                    "dan", "eve",
                ],
            }
        )
    )
    out = (
        functional_violations(canon, ["born_in", "capital_of"])
        .to_pandas()
        .sort_values(["rel", "subj"])
        .reset_index(drop=True)
    )
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["rel"], r["subj"], int(r["n_objects"])) == (
        "born_in", "alice", 2,
    )
    assert r["objects_sample"] == "kyoto|osaka"


def test_functional_violations_empty_rels_raises():
    from kgflow.ops.web import functional_violations

    with pytest.raises(ValueError, match="empty"):
        functional_violations(rd.from_items([]), [])


def test_edges_delta_classification():
    from kgflow.materialize.edges import edges_delta

    def edges(rows):
        return rd.from_pandas(
            pd.DataFrame(
                rows,
                columns=["subj_id", "rel_id", "obj_id", "weight"],
            ).astype("int64")
        )

    old = edges([(1, 1, 2, 5), (3, 1, 4, 2), (5, 2, 6, 1)])
    new = edges([(1, 1, 2, 5), (3, 1, 4, 7), (7, 2, 8, 3)])
    out = (
        edges_delta(old, new)
        .to_pandas()
        .sort_values(["subj_id"])
        .reset_index(drop=True)
    )
    got = {
        (int(r.subj_id), int(r.rel_id), int(r.obj_id)): (
            r.change, int(r.old_weight), int(r.new_weight)
        )
        for r in out.itertuples()
    }
    # (1,1,2) unchanged -> absent; (3,1,4) reweighted; (5,2,6) removed;
    # (7,2,8) added
    assert got == {
        (3, 1, 4): ("reweighted", 2, 7),
        (5, 2, 6): ("removed", 1, 0),
        (7, 2, 8): ("added", 0, 3),
    }


def test_decayed_moving_avg_exact_weights():
    from kgflow.ops.window import decayed_moving_avg

    ev = rd.from_pandas(
        pd.DataFrame(
            {
                "user_id": pd.Series([1, 1, 1, 2], dtype="int64"),
                "event_id": pd.Series([10, 11, 12, 20], dtype="int64"),
                "ts": pd.to_datetime(
                    ["2026-01-01", "2026-01-02", "2026-01-03", "2026-01-01"]
                ),
                "value": [1.0, 2.0, 4.0, 9.0],
            }
        )
    )
    out = (
        decayed_moving_avg(ev, window=3)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = {
        int(r.event_id): (int(r.num), int(r.den)) for r in out.itertuples()
    }
    # fixed-point 1e4: v = 10000, 20000, 40000; weights double toward
    # the most recent row; den = 2^m - 1
    assert got == {
        10: (10000, 1),                         # m=1: 1*v0
        11: (2 * 20000 + 10000, 3),             # m=2: 2*v1 + v0
        12: (4 * 40000 + 2 * 20000 + 10000, 7), # m=3
        20: (90000, 1),                         # other key untouched
    }


def test_ahash_perturbation_small_hamming():
    from kgflow.ops.multimodal import ahash64

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 17, 3)).astype(np.uint8)
    tweaked = img.copy()
    tweaked[0, 0, 0] ^= 1
    other = rng.randint(0, 256, (24, 17, 3)).astype(np.uint8)
    h0, h1, h2 = ahash64(img), ahash64(tweaked), ahash64(other)
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h0, h1) <= 3
    assert ham(h0, h2) > 10  # random images are far apart
    assert 0 <= h0 < 1 << 63  # rides int64 columns
    with pytest.raises(ValueError, match="8x8"):
        ahash64(np.zeros((4, 12, 3), dtype=np.uint8))


def test_image_phash_pairs_recovers_planted():
    from kgflow.ops.multimodal import (
        MEDIA_SCHEMA,
        encode_bmp,
        image_phash_pairs,
    )
    import pyarrow as pa

    rng = np.random.RandomState(11)
    rows = {k: [] for k in MEDIA_SCHEMA.names}

    def add(mid, img):
        rows["media_id"].append(mid)
        rows["kind"].append("image")
        rows["codec"].append("bmp")
        rows["payload"].append(encode_bmp(img))
        rows["width"].append(img.shape[1])
        rows["height"].append(img.shape[0])
        rows["sample_rate"].append(0)
        rows["n_frames"].append(0)

    a = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    b = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    a2 = a.copy()
    a2[3, 3, 1] ^= 1
    add(1, a)
    add(2, b)
    add(3, a2)
    media = rd.from_arrow(pa.table(rows, schema=MEDIA_SCHEMA))
    out = image_phash_pairs(media, max_hamming=3).to_pandas()
    got = {(int(r.doc_a), int(r.doc_b)) for r in out.itertuples()}
    assert got == {(1, 3)}


def _media_rows(entries):
    from kgflow.ops.multimodal import MEDIA_SCHEMA
    import pyarrow as pa

    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for e in entries:
        for k in MEDIA_SCHEMA.names:
            rows[k].append(e[k])
    return rd.from_arrow(pa.table(rows, schema=MEDIA_SCHEMA))


def test_audio_fp_pairs_separated_tones():
    from kgflow.ops.multimodal import audio_fp_pairs, encode_wav

    sr = 16000
    t = np.arange(4096)

    def tone(freq):
        return encode_wav(
            (np.sin(2 * np.pi * freq * t / sr) * 12000).astype(np.int16), sr
        )

    def clip(mid, payload):
        return {
            "media_id": mid, "kind": "audio", "codec": "wav",
            "payload": payload, "width": 0, "height": 0,
            "sample_rate": sr, "n_frames": 0,
        }

    # 500 Hz vs 3 kHz vs 7 kHz: distinct spectral bands; one perturbed
    # copy of the 500 Hz clip (sample 0 nudged a quantum)
    from kgflow.ops.multimodal import decode_wav

    p500 = tone(500)
    w, _ = decode_wav(p500)
    s = (w * 32768.0).astype(np.int16).copy()
    s[0] ^= 1
    near = encode_wav(s, sr)
    media = _media_rows(
        [clip(1, p500), clip(2, tone(3000)), clip(3, tone(7000)), clip(4, near)]
    )
    out = audio_fp_pairs(media, max_hamming=3).to_pandas()
    got = {(int(r.doc_a), int(r.doc_b)) for r in out.itertuples()}
    assert got == {(1, 4)}


def test_video_hash_pairs_middle_frame():
    from kgflow.ops.multimodal import encode_kgv1, video_hash_pairs

    rng = np.random.RandomState(5)
    a = rng.randint(0, 256, (5, 12, 12, 3)).astype(np.uint8)
    b = rng.randint(0, 256, (5, 12, 12, 3)).astype(np.uint8)
    a_tail = a.copy()
    a_tail[4] ^= 255  # different LAST frame: middle frame untouched

    def clip(mid, frames):
        return {
            "media_id": mid, "kind": "video", "codec": "kgv1",
            "payload": encode_kgv1(frames), "width": 12, "height": 12,
            "sample_rate": 0, "n_frames": len(frames),
        }

    media = _media_rows([clip(1, a), clip(2, b), clip(3, a_tail)])
    out = video_hash_pairs(media, max_hamming=3).to_pandas()
    got = {(int(r.doc_a), int(r.doc_b)) for r in out.itertuples()}
    assert got == {(1, 3)}


def test_chunk_documents_overlap_and_tail():
    from kgflow.ops.text import chunk_documents

    # 10 tokens, size=4, stride=3 -> starts 0,3,6,9
    text = " ".join(f"w{i}" for i in range(10))
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([7], dtype="int64"),
                      "text": [text]})
    )
    out = (
        chunk_documents(ds, size=4, stride=3)
        .to_pandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    assert out["chunk_id"].tolist() == [0, 1, 2, 3]
    assert out["chunk_text"].tolist() == [
        "w0 w1 w2 w3",
        "w3 w4 w5 w6",
        "w6 w7 w8 w9",
        "w9",
    ]
    assert out["n_tokens"].tolist() == [4, 4, 4, 1]
    # empty doc contributes no chunks
    ds2 = rd.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([1], dtype="int64"),
                      "text": ["   "]})
    )
    assert chunk_documents(ds2).count() == 0


def test_k_anonymity_violations():
    from kgflow.ops.checks import k_anonymity_violations

    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "zip": ["111", "111", "111", "222", "222", "222"],
                "age": ["30", "30", "30", "40", "40", "40"],
                "uid": pd.Series([1, 2, 3, 7, 7, 8], dtype="int64"),
            }
        )
    )
    out = k_anonymity_violations(
        ds, quasi_cols=["zip", "age"], id_col="uid", k=3
    ).to_pandas()
    # (111,30) has 3 distinct uids -> safe; (222,40) has 2 -> violation
    assert len(out) == 1
    assert out.iloc[0]["zip"] == "222" and int(out.iloc[0]["n_subjects"]) == 2
    with pytest.raises(ValueError, match=">= 2"):
        k_anonymity_violations(ds, ["zip"], "uid", k=1)


def test_extract_links_and_domain_graph():
    from kgflow.ops.web import domain_link_graph, extract_links

    pages = rd.from_pandas(
        pd.DataFrame(
            {
                "url": [
                    "https://a.example/p1",
                    "https://a.example/p2",
                    "https://b.example/x",
                ],
                "html": [
                    b'<p>hi</p><a href="https://b.example/y">to b</a>'
                    b'<a href="https://a.example/p2">self</a>',
                    b"<p>no links here</p>",
                    b'<a class="z" href="https://a.example/p1">back</a>',
                ],
            }
        )
    )
    links = (
        extract_links(pages)
        .to_pandas()
        .sort_values(["src_url", "href"])
        .reset_index(drop=True)
    )
    assert links["href"].tolist() == [
        "https://a.example/p2",
        "https://b.example/y",
        "https://a.example/p1",
    ]
    assert links["anchor"].tolist() == ["self", "to b", "back"]
    g = domain_link_graph(pages).to_pandas()
    got = {
        (r.src_domain, r.dst_domain): int(r.n_links) for r in g.itertuples()
    }
    assert got == {
        ("a.example", "b.example"): 1,
        ("a.example", "a.example"): 1,  # self-loop kept
        ("b.example", "a.example"): 1,
    }


class TestStronglyConnectedComponents:
    """Planted-graph semantics for `graph.strongly_connected_components`
    — both the driver Kosaraju fast path and the FORCED distributed
    coloring path (driver_limit=0), which the gate-scale query never
    exercises on its own."""

    def _run(self, edf, **kw):
        from kgflow.ops.graph import strongly_connected_components

        return (
            strongly_connected_components(rd.from_pandas(edf), **kw)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )

    def test_planted_cycles_both_paths(self):
        # cycle {1,2,3}, cycle {10,11}, DAG bridge 3->10, tail 3->20,
        # separate pair 30->31 (no back edge => two singletons)
        edf = pd.DataFrame(
            {
                "src": [1, 2, 3, 10, 11, 3, 3, 30],
                "dst": [2, 3, 1, 11, 10, 10, 20, 31],
            }
        )
        exp = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 30: 30, 31: 31}
        for dl in (10**6, 0):
            out = self._run(edf, driver_limit=dl)
            assert dict(zip(out["node"], out["scc_id"])) == exp
            assert out["scc_id"].dtype == np.int64

    def test_id_decreasing_chain_peels_one_per_round(self):
        # worst case for coloring: 5->4->3->2->1 needs 5 peel rounds,
        # all singleton SCCs
        edf = pd.DataFrame({"src": [5, 4, 3, 2], "dst": [4, 3, 2, 1]})
        out = self._run(edf, driver_limit=0, max_peel_rounds=5)
        assert sorted(out["scc_id"].tolist()) == [1, 2, 3, 4, 5]

    def test_peel_cap_raises_loudly(self):
        from kgflow.ops.graph import strongly_connected_components

        edf = pd.DataFrame({"src": [5, 4, 3, 2], "dst": [4, 3, 2, 1]})
        with pytest.raises(RuntimeError, match="max_peel_rounds"):
            strongly_connected_components(
                rd.from_pandas(edf), driver_limit=0, max_peel_rounds=2
            )

    def test_random_functional_graph_distributed_matches_kosaraju(self):
        rng = np.random.default_rng(7)
        v = 200
        edf = pd.DataFrame(
            {
                "src": np.arange(v, dtype=np.int64),
                "dst": rng.integers(0, v, v).astype(np.int64),
            }
        )
        a = self._run(edf, driver_limit=10**6)
        b = self._run(edf, driver_limit=0)
        pd.testing.assert_frame_equal(a, b)
        # a functional graph's non-singleton SCCs are exactly its cycles
        assert a["scc_id"].nunique() > 1

    def test_empty_and_self_loop(self):
        out = self._run(pd.DataFrame({"src": [7], "dst": [7]}))
        assert out["node"].tolist() == [7] and out["scc_id"].tolist() == [7]
        from kgflow.ops.graph import strongly_connected_components

        e = rd.from_pandas(
            pd.DataFrame(
                {
                    "src": pd.Series([], dtype="int64"),
                    "dst": pd.Series([], dtype="int64"),
                }
            )
        )
        assert strongly_connected_components(e).count() == 0


class TestInverseRelationAudit:
    """Planted semantics for `web.inverse_relation_audit` — the
    kg_inverse_relations query is rows-only (stub-model triples), so
    these pin the exact counts/scores."""

    def _run(self, tri, **kw):
        from kgflow.ops.web import inverse_relation_audit

        return (
            inverse_relation_audit(rd.from_pandas(tri), **kw)
            .to_pandas()
            .sort_values(["rel_a", "rel_b"])
            .reset_index(drop=True)
        )

    def _tri(self):
        return pd.DataFrame(
            {
                "subj_canonical": [
                    "a", "b", "c", "x", "y", "p", "q", "m", "m2", "a",
                ],
                "rel": [
                    "cap_of", "has_cap", "cap_of", "borders", "borders",
                    "born_in", "born_in", "cap_of", "has_cap", "cap_of",
                ],
                "obj_canonical": [
                    "b", "a", "d", "y", "x", "q", "r", "m2", "m", "b",
                ],
            }
        )

    def test_inverse_and_symmetric_scores(self):
        out = self._run(self._tri())
        got = {
            (r.rel_a, r.rel_b): (
                int(r.n_a), int(r.n_b), int(r.n_pairs), float(r.score)
            )
            for r in out.itertuples()
        }
        # cap_of: pairs (a,b),(c,d),(m,m2) [dup triple deduped] n=3;
        # has_cap: (b,a),(m2,m) n=2; overlap {a,b},{m,m2} -> 2 -> 1.0
        # borders: symmetric on {x,y}: n=2 directed, 1 pair, 2*1/2=1.0
        assert got == {
            ("borders", "borders"): (2, 2, 1, 1.0),
            ("cap_of", "has_cap"): (3, 2, 2, 1.0),
        }

    def test_min_support_and_double_direction_dedup(self):
        out = self._run(self._tri(), min_support=2)
        assert len(out) == 1 and out.iloc[0]["rel_a"] == "cap_of"
        # r1 and r2 both asserted in BOTH directions on one entity
        # pair: still one entity-pair instance, not two
        tri = pd.DataFrame(
            {
                "subj_canonical": ["a", "b", "a", "b"],
                "rel": ["r1", "r1", "r2", "r2"],
                "obj_canonical": ["b", "a", "b", "a"],
            }
        )
        out = self._run(tri)
        row = out.loc[
            (out["rel_a"] == "r1") & (out["rel_b"] == "r2")
        ].iloc[0]
        assert int(row["n_pairs"]) == 1 and float(row["score"]) == 0.5

    def test_self_loops_excluded_and_validation(self):
        tri = pd.DataFrame(
            {
                "subj_canonical": ["a"],
                "rel": ["r"],
                "obj_canonical": ["a"],
            }
        )
        from kgflow.ops.web import inverse_relation_audit

        assert inverse_relation_audit(rd.from_pandas(tri)).count() == 0

        with pytest.raises(ValueError, match="min_support"):
            inverse_relation_audit(rd.from_pandas(tri), min_support=0)


class TestReachPairs:
    """Bounded transitive closure (`graph.reach_pairs`) — the oracled
    graph_reach query gates gate-scale; these pin chain/cycle/min-hop
    semantics and the early stop on planted graphs."""

    def _run(self, edges, **kw):
        from kgflow.ops.graph import reach_pairs

        df = reach_pairs(rd.from_pandas(edges), **kw).to_pandas()
        return sorted(map(tuple, df[["src", "dst", "hops"]].values.tolist()))

    def test_chain_min_hops_and_cycle_self_pairs(self):
        e = pd.DataFrame(
            {"src": [1, 2, 3, 10, 11], "dst": [2, 3, 4, 11, 10]}
        )
        assert self._run(e, max_hops=3) == [
            (1, 2, 1), (1, 3, 2), (1, 4, 3),
            (2, 3, 1), (2, 4, 2), (3, 4, 1),
            (10, 10, 2), (10, 11, 1), (11, 10, 1), (11, 11, 2),
        ]

    def test_shortcut_keeps_min_hop_and_early_stop(self):
        # 1->2->3 plus direct 1->3: (1,3) must report hops=1, and the
        # closure is complete after round 2 so max_hops=5 stops early
        e = pd.DataFrame({"src": [1, 2, 1], "dst": [2, 3, 3]})
        assert self._run(e, max_hops=5) == [
            (1, 2, 1), (1, 3, 1), (2, 3, 1),
        ]

    def test_validation(self):
        from kgflow.ops.graph import reach_pairs

        with pytest.raises(ValueError, match="max_hops"):
            reach_pairs(
                rd.from_pandas(pd.DataFrame({"src": [1], "dst": [2]})),
                max_hops=0,
            )


class TestTopoLayers:
    """DAG longest-path layering (`graph.topo_layers`) — the oracled
    graph_layers query gates gate-scale; these pin the diamond
    longest-path (not shortest) semantics and BOTH cycle-detection
    paths (source-reachable growth, source-less cycle), on BOTH the
    driver Kahn fast path and the forced distributed rounds."""

    def _run(self, edges, **kw):
        from kgflow.ops.graph import topo_layers

        df = topo_layers(rd.from_pandas(edges), **kw).to_pandas()
        return sorted(map(tuple, df[["node", "layer"]].values.tolist()))

    @pytest.mark.parametrize("lim", [100_000, 0])
    def test_diamond_takes_longest_path(self, lim):
        # 1->2->3->4 and 1->4: layer(4) = 3 (longest), not 1
        e = pd.DataFrame({"src": [1, 2, 3, 1], "dst": [2, 3, 4, 4]})
        assert self._run(e, driver_limit=lim) == [
            (1, 0), (2, 1), (3, 2), (4, 3),
        ]

    @pytest.mark.parametrize("lim", [100_000, 0])
    def test_multiple_sources(self, lim):
        e = pd.DataFrame({"src": [1, 5, 2], "dst": [2, 2, 3]})
        assert self._run(e, driver_limit=lim) == [
            (1, 0), (2, 1), (3, 2), (5, 0),
        ]

    def test_driver_matches_distributed_on_random_dag(self):
        rng = np.random.RandomState(23)
        a = rng.randint(0, 30, 120)
        b = rng.randint(0, 30, 120)
        m = a < b  # src < dst guarantees acyclicity
        e = pd.DataFrame({"src": a[m], "dst": b[m]})
        assert self._run(e) == self._run(e, driver_limit=0)

    @pytest.mark.parametrize("lim", [100_000, 0])
    def test_cycle_reachable_from_source_raises(self, lim):
        from kgflow.ops.graph import topo_layers

        e = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 2]})
        with pytest.raises(ValueError, match="cycle"):
            topo_layers(rd.from_pandas(e), driver_limit=lim)

    @pytest.mark.parametrize("lim", [100_000, 0])
    def test_sourceless_cycle_raises(self, lim):
        from kgflow.ops.graph import topo_layers

        e = pd.DataFrame({"src": [1, 2], "dst": [2, 1]})
        with pytest.raises(ValueError, match="cycle"):
            topo_layers(rd.from_pandas(e), driver_limit=lim)


class TestIntervalOverlapPairs:
    """Range join (`window.interval_overlap_pairs`) — the oracled
    events_overlap query gates gate-scale; these pin the exactly-once
    replica rule against brute force and the loud caps."""

    def _brute(self, df):
        s = df["s"].to_numpy()
        e = df["e"].to_numpy()
        ids = df["id"].to_numpy()
        out = set()
        for i in range(len(df)):
            for j in range(i + 1, len(df)):
                if s[i] < e[j] and s[j] < e[i]:
                    out.add(
                        (
                            int(min(ids[i], ids[j])),
                            int(max(ids[i], ids[j])),
                            int(min(e[i], e[j]) - max(s[i], s[j])),
                        )
                    )
        return out

    def test_random_matches_brute_force_across_widths(self):
        from kgflow.ops.window import interval_overlap_pairs

        rng = np.random.RandomState(11)
        n = 200
        s = rng.randint(0, 50_000, n).astype(np.int64)
        df = pd.DataFrame(
            {
                "id": np.arange(n, dtype=np.int64),
                "s": s,
                "e": s + rng.randint(1, 4_000, n),
            }
        )
        exp = self._brute(df)
        for w in (500, 4_096, 10**9):  # narrow / typical / one-bucket
            got = interval_overlap_pairs(
                rd.from_pandas(df), bucket_width=w, max_span_buckets=4096
            ).to_pandas()
            assert (
                set(map(tuple, got[["id_a", "id_b", "ov"]].values.tolist()))
                == exp
            ), f"width {w}"

    def test_touching_intervals_do_not_pair(self):
        from kgflow.ops.window import interval_overlap_pairs

        df = pd.DataFrame(
            {"id": [1, 2], "s": [0, 10], "e": [10, 20]}
        )
        assert (
            interval_overlap_pairs(rd.from_pandas(df), bucket_width=7).count()
            == 0
        )

    def test_loud_caps(self):
        from kgflow.ops.window import interval_overlap_pairs

        wide = rd.from_pandas(
            pd.DataFrame({"id": [1], "s": [0], "e": [1000]})
        )
        with pytest.raises(Exception, match="max_span_buckets"):
            interval_overlap_pairs(
                wide, bucket_width=10, max_span_buckets=4
            ).materialize()
        empty_iv = rd.from_pandas(
            pd.DataFrame({"id": [7], "s": [5], "e": [5]})
        )
        with pytest.raises(Exception, match="e <= s"):
            interval_overlap_pairs(empty_iv, bucket_width=10).materialize()
        with pytest.raises(ValueError, match="bucket_width"):
            interval_overlap_pairs(empty_iv, bucket_width=0)


class TestRelationCardinality:
    """AMIE functionality profile (`web.relation_cardinality_stats`) —
    kg_relation_cardinality is rows-only, so planted inputs pin the
    exact counts and the distinct-triple semantics."""

    def test_planted_counts(self):
        from kgflow.ops.web import relation_cardinality_stats

        tri = pd.DataFrame(
            {
                # born_in: functional (each subj once), 3 triples;
                # likes: subj a twice (fun < 1), duplicate row deduped
                "subj_canonical": ["a", "b", "c", "a", "a", "a"],
                "rel": ["born_in"] * 3 + ["likes"] * 3,
                "obj_canonical": ["x", "x", "y", "p", "q", "q"],
            }
        )
        out = (
            relation_cardinality_stats(rd.from_pandas(tri))
            .to_pandas()
            .sort_values("rel")
            .reset_index(drop=True)
        )
        got = {
            r.rel: (
                int(r.n_triples),
                int(r.n_subj),
                int(r.n_obj),
                float(r.fun),
                float(r.inv_fun),
            )
            for r in out.itertuples()
        }
        assert got == {
            "born_in": (3, 3, 2, 1.0, 2 / 3),
            "likes": (2, 1, 2, 0.5, 1.0),
        }

    def test_empty_input_typed(self):
        from kgflow.ops.web import relation_cardinality_stats

        tri = pd.DataFrame(
            {
                "subj_canonical": pd.Series([], dtype="object"),
                "rel": pd.Series([], dtype="object"),
                "obj_canonical": pd.Series([], dtype="object"),
            }
        )
        out = relation_cardinality_stats(rd.from_pandas(tri))
        assert out.count() == 0


class TestMinimumSpanningForest:
    """Borůvka MSF (`graph.minimum_spanning_forest`) — graph_msf is
    rows-only, so the gate is exact parity with a driver Kruskal under
    the same (w, src, dst) total order, across random graphs."""

    @staticmethod
    def _kruskal(rows):
        best = {}
        for a, b, w in rows:
            if a == b:
                continue
            k = (min(a, b), max(a, b))
            if k not in best or w < best[k]:
                best[k] = w
        es = sorted((w, a, b) for (a, b), w in best.items())
        par: dict = {}

        def find(x):
            par.setdefault(x, x)
            while par[x] != x:
                par[x] = par[par[x]]
                x = par[x]
            return x

        out = set()
        for w, a, b in es:
            ra, rb = find(a), find(b)
            if ra != rb:
                par[max(ra, rb)] = min(ra, rb)
                out.add((a, b, w))
        return out

    def test_random_graphs_match_kruskal(self):
        from kgflow.ops.graph import minimum_spanning_forest

        rng = np.random.RandomState(17)
        for _ in range(3):
            n = rng.randint(10, 50)
            m = rng.randint(5, 180)
            a = rng.randint(0, n, m)
            b = rng.randint(0, n, m)
            w = rng.randint(1, 25, m)
            got = (
                minimum_spanning_forest(
                    rd.from_pandas(pd.DataFrame({"src": a, "dst": b, "w": w}))
                )
                .to_pandas()
            )
            got = set(map(tuple, got[["src", "dst", "w"]].values.tolist()))
            exp = self._kruskal(
                list(zip(a.tolist(), b.tolist(), w.tolist()))
            )
            assert got == exp

    def test_disconnected_forest_and_orientation(self):
        from kgflow.ops.graph import minimum_spanning_forest

        # two components; one edge given in reversed orientation with a
        # cheaper parallel copy that must win
        df = pd.DataFrame(
            {
                "src": [2, 1, 1, 10],
                "dst": [1, 2, 3, 11],
                "w": [5, 3, 4, 7],
            }
        )
        got = (
            minimum_spanning_forest(rd.from_pandas(df))
            .to_pandas()
            .values.tolist()
        )
        assert sorted(map(tuple, got)) == [(1, 2, 3), (1, 3, 4), (10, 11, 7)]

    def test_self_loops_only_empty(self):
        from kgflow.ops.graph import minimum_spanning_forest

        df = pd.DataFrame({"src": [4], "dst": [4], "w": [1]})
        assert minimum_spanning_forest(rd.from_pandas(df)).count() == 0


class TestResolvePointerChains:
    """Pointer-doubling chain resolution (`graph.resolve_pointer_chains`)
    — the oracled events_redirects query gates gate-scale; these pin
    chain composition, the log-round doubling (long chain within few
    rounds), and both loud failure paths."""

    def _run(self, m, **kw):
        from kgflow.ops.graph import resolve_pointer_chains

        df = resolve_pointer_chains(rd.from_pandas(m), **kw).to_pandas()
        return sorted(
            map(tuple, df[["src", "final", "chain_len"]].values.tolist())
        )

    @pytest.mark.parametrize("lim", [100_000, 0])
    def test_chains_resolve_with_exact_lengths(self, lim):
        m = pd.DataFrame(
            {"src": [8, 4, 2, 6, 100, 50], "dst": [4, 2, 1, 3, 50, 25]}
        )
        assert self._run(m, driver_limit=lim) == [
            (2, 1, 1), (4, 1, 2), (6, 3, 1),
            (8, 1, 3), (50, 25, 1), (100, 25, 2),
        ]

    def test_driver_matches_distributed_on_random_forest(self):
        rng = np.random.RandomState(41)
        srcs = np.arange(1, 300, dtype=np.int64)
        dsts = srcs - 1 - rng.randint(0, 3, len(srcs))  # always smaller
        dsts = np.maximum(dsts, 0)
        m = pd.DataFrame({"src": srcs, "dst": dsts})
        assert self._run(m) == self._run(m, driver_limit=0, max_rounds=12)

    def test_long_chain_needs_only_log_rounds(self):
        # chain of 1000 hops: 2^10 = 1024 >= 1000, so 10 doubling
        # rounds + 1 confirm round suffice — max_rounds=12 must pass
        n = 1000
        m = pd.DataFrame(
            {"src": np.arange(1, n + 1), "dst": np.arange(0, n)}
        )
        out = self._run(m, max_rounds=12)
        assert len(out) == n
        assert (n, 0, n) in out and (1, 0, 1) in out

    @pytest.mark.parametrize("lim", [100_000, 0])
    def test_cycle_raises(self, lim):
        from kgflow.ops.graph import resolve_pointer_chains

        m = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 1]})
        with pytest.raises(ValueError, match="cycle"):
            resolve_pointer_chains(
                rd.from_pandas(m), max_rounds=6, driver_limit=lim
            )

    @pytest.mark.parametrize("lim", [100_000, 0])
    def test_non_functional_raises(self, lim):
        from kgflow.ops.graph import resolve_pointer_chains

        m = pd.DataFrame({"src": [1, 1], "dst": [2, 3]})
        with pytest.raises(Exception, match="not functional"):
            resolve_pointer_chains(
                rd.from_pandas(m), driver_limit=lim
            ).materialize()

    @pytest.mark.parametrize("lim", [100_000, 0])
    def test_identical_duplicate_rows_fold(self, lim):
        # the same (src, dst) row twice is NOT a functionality
        # violation — it folds to one chain row on both paths
        m = pd.DataFrame({"src": [4, 4, 2], "dst": [2, 2, 1]})
        assert self._run(m, driver_limit=lim) == [(2, 1, 1), (4, 1, 2)]


class TestBfsSsspDriverParity:
    """The gate-scale queries now take the driver fast paths added to
    `bfs_hops` / `sssp_weighted`; these pin driver == distributed on
    random graphs (the same evidence contract as topo/chains/SCC)."""

    def test_bfs_driver_matches_distributed(self):
        from kgflow.ops.graph import bfs_hops

        rng = np.random.RandomState(29)
        e = rd.from_pandas(
            pd.DataFrame(
                {
                    "src": rng.randint(0, 60, 250),
                    "dst": rng.randint(0, 60, 250),
                }
            )
        )
        fast = bfs_hops(e, seeds=[0], max_hops=4).to_pandas()
        slow = bfs_hops(
            e, seeds=[0], max_hops=4, driver_limit=0
        ).to_pandas()
        key = lambda df: sorted(  # noqa: E731
            map(tuple, df[["node", "hop"]].values.tolist())
        )
        assert key(fast) == key(slow)

    def test_sssp_driver_matches_distributed(self):
        from kgflow.ops.graph import sssp_weighted

        rng = np.random.RandomState(31)
        e = rd.from_pandas(
            pd.DataFrame(
                {
                    "src": rng.randint(0, 50, 220),
                    "dst": rng.randint(0, 50, 220),
                    "w": rng.randint(1, 9, 220),
                }
            )
        )
        fast = sssp_weighted(e, seeds=[1], max_hops=4).to_pandas()
        slow = sssp_weighted(
            e, seeds=[1], max_hops=4, driver_limit=0
        ).to_pandas()
        key = lambda df: sorted(  # noqa: E731
            map(tuple, df[["node", "dist"]].values.tolist())
        )
        assert key(fast) == key(slow)

    def test_sssp_driver_rejects_nonpositive_weights(self):
        from kgflow.ops.graph import sssp_weighted

        e = rd.from_pandas(
            pd.DataFrame({"src": [1], "dst": [2], "w": [0]})
        )
        with pytest.raises(Exception, match="positive"):
            sssp_weighted(e, seeds=[1]).materialize()


class TestTemporalReach:
    """Earliest-arrival temporal reachability (`graph.temporal_reach`)
    — the oracled graph_temporal_reach query gates gate-scale; these
    pin the time-respecting constraint, the parallel-edge-time trap (a
    LATER parallel edge can be the only usable one — min-folding
    parallel edges is wrong), and driver == distributed parity."""

    def _run(self, m, **kw):
        from kgflow.ops.graph import temporal_reach

        df = temporal_reach(rd.from_pandas(m), **kw).to_pandas()
        return sorted(map(tuple, df[["src", "dst", "arr"]].values.tolist()))

    @pytest.mark.parametrize("lim", [100_000, 0])
    def test_time_respecting_and_min_arrival(self, lim):
        # 1->2@5 then 2->3@7 is valid (7>=5) -> (1,3,7); 2->3@3 is too
        # early to follow 1->2@5; the direct 1->3@9 loses to arr=7
        m = pd.DataFrame(
            {"src": [1, 2, 2, 1], "dst": [2, 3, 3, 3], "t": [5, 7, 3, 9]}
        )
        assert self._run(m, max_hops=3, driver_limit=lim) == [
            (1, 2, 5), (1, 3, 7), (2, 3, 3),
        ]

    @pytest.mark.parametrize("lim", [100_000, 0])
    def test_later_parallel_edge_is_the_usable_one(self, lim):
        # 2->3 has times {3, 25}: after arriving at 2 at t=5, only the
        # t=25 copy departs late enough — min-folding would miss (1,3)
        m = pd.DataFrame(
            {"src": [1, 2, 2], "dst": [2, 3, 3], "t": [5, 3, 25]}
        )
        assert self._run(m, max_hops=2, driver_limit=lim) == [
            (1, 2, 5), (1, 3, 25), (2, 3, 3),
        ]

    @pytest.mark.parametrize("lim", [100_000, 0])
    def test_hop_bound_and_single_hop_fold(self, lim):
        chain = pd.DataFrame(
            {"src": [1, 2, 3], "dst": [2, 3, 4], "t": [1, 2, 3]}
        )
        out2 = self._run(chain, max_hops=2, driver_limit=lim)
        assert (1, 4, 3) not in out2 and (1, 3, 2) in out2
        dup = pd.DataFrame({"src": [1, 1], "dst": [2, 2], "t": [9, 4]})
        assert self._run(dup, max_hops=1, driver_limit=lim) == [(1, 2, 4)]

    def test_driver_matches_distributed_on_random_graphs(self):
        rng = np.random.RandomState(47)
        m = pd.DataFrame(
            {
                "src": rng.randint(0, 12, 90),
                "dst": rng.randint(0, 12, 90),
                "t": rng.randint(0, 30, 90),
            }
        )
        assert self._run(m, max_hops=3) == self._run(
            m, max_hops=3, driver_limit=0
        )

    def test_validation(self):
        from kgflow.ops.graph import temporal_reach

        with pytest.raises(ValueError, match="max_hops"):
            temporal_reach(
                rd.from_pandas(
                    pd.DataFrame({"src": [1], "dst": [2], "t": [1]})
                ),
                max_hops=0,
            )


class TestDeterministicWalks:
    """Walk-corpus generation (`graph.deterministic_walks`) — the
    oracled graph_walks query pins engine == SQL at gate scale; these
    pin sink stops, bit-level determinism, and driver == distributed
    parity on random graphs."""

    def _run(self, df, **kw):
        from kgflow.ops.graph import deterministic_walks

        out = deterministic_walks(rd.from_pandas(df), **kw).to_pandas()
        return sorted(
            map(tuple, out[["walk_id", "step", "node"]].values.tolist())
        )

    def test_sink_stops_walk(self):
        df = pd.DataFrame({"src": [1], "dst": [2]})
        assert self._run(df, steps=3) == [(1, 0, 1), (1, 1, 2), (2, 0, 2)]

    def test_single_neighbor_walks_are_forced(self):
        # cycle 1->2->1: every step has exactly one choice
        df = pd.DataFrame({"src": [1, 2], "dst": [2, 1]})
        assert self._run(df, steps=2) == [
            (1, 0, 1), (1, 1, 2), (1, 2, 1),
            (2, 0, 2), (2, 1, 1), (2, 2, 2),
        ]

    def test_driver_matches_distributed_and_reruns(self):
        rng = np.random.RandomState(59)
        df = pd.DataFrame(
            {"src": rng.randint(0, 14, 80), "dst": rng.randint(0, 14, 80)}
        )
        a = self._run(df, steps=4)
        b = self._run(df, steps=4, driver_limit=0)
        c = self._run(df, steps=4)  # rerun: bit-identical
        assert a == b == c
        # one start row per node, walks never exceed steps
        starts = [r for r in a if r[1] == 0]
        assert len(starts) == len({r[0] for r in a})
        assert max(r[1] for r in a) <= 4

    def test_validation(self):
        from kgflow.ops.graph import deterministic_walks

        with pytest.raises(ValueError, match="steps"):
            deterministic_walks(
                rd.from_pandas(pd.DataFrame({"src": [1], "dst": [2]})),
                steps=0,
            )


class TestBetweennessCentrality:
    """Brandes betweenness (`graph.betweenness_centrality`) —
    graph_betweenness is rows-only (float), so the gates here are an
    INDEPENDENT pair-enumeration brute force (not Brandes) plus
    driver == distributed parity."""

    @staticmethod
    def _brute(rows):
        # enumerate all shortest paths per ordered (s, t) pair by BFS
        # DAG counting — structurally different from Brandes
        import collections

        adj = collections.defaultdict(set)
        for a, b in rows:
            adj[a].add(b)
            adj[b].add(a)
        nodes = sorted(adj)
        bc = {n: 0.0 for n in nodes}
        for s_ in nodes:
            for t_ in nodes:
                if s_ == t_:
                    continue
                # BFS from s_: dist + path counts + predecessors
                dist = {s_: 0}
                sigma = {s_: 1}
                preds = collections.defaultdict(list)
                q = [s_]
                while q:
                    nq = []
                    for v in q:
                        for w in adj[v]:
                            if w not in dist:
                                dist[w] = dist[v] + 1
                                nq.append(w)
                            if dist[w] == dist[v] + 1:
                                sigma[w] = sigma.get(w, 0) + sigma[v]
                                preds[w].append(v)
                    q = nq
                if t_ not in dist:
                    continue
                # count per-node path-through counts by backward walk
                thr = collections.defaultdict(float)
                stack = [(t_, 1.0)]
                frac = {t_: 1.0}
                order = sorted(
                    dist, key=lambda x: -dist[x]
                )
                for w in order:
                    if w not in frac:
                        continue
                    for p in preds[w]:
                        share = frac[w] * sigma[p] / sigma[w]
                        frac[p] = frac.get(p, 0.0) + share
                for v, fr in frac.items():
                    if v not in (s_, t_):
                        bc[v] += fr
        return bc

    def _run(self, rows, **kw):
        from kgflow.ops.graph import betweenness_centrality

        df = pd.DataFrame(
            {"src": [r[0] for r in rows], "dst": [r[1] for r in rows]}
        )
        out = betweenness_centrality(rd.from_pandas(df), **kw).to_pandas()
        return dict(zip(out["node"].astype(int), out["bc"].astype(float)))

    def test_path_and_star_match_pair_enumeration(self):
        for rows in (
            [(1, 2), (2, 3), (3, 4)],                    # path
            [(0, 1), (0, 2), (0, 3), (0, 4)],            # star
            [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)],    # tri + tail
        ):
            exp = self._brute(rows)
            got = self._run(rows)
            assert set(got) == set(exp)
            for k in exp:
                assert abs(got[k] - exp[k]) < 1e-9, (rows, k)

    def test_driver_matches_distributed_random(self):
        rng = np.random.RandomState(67)
        rows = [
            (int(a), int(b))
            for a, b in rng.randint(0, 12, size=(60, 2))
            if a != b
        ]
        fast = self._run(rows)
        slow = self._run(rows, driver_limit=0)
        assert set(fast) == set(slow)
        for k in fast:
            assert abs(fast[k] - slow[k]) < 1e-9 * (1 + abs(fast[k]))

    def test_seed_subset(self):
        # only seed 1: path 1-2-3 — δ credits node 2 once (pair (1,3))
        got = self._run([(1, 2), (2, 3)], seeds=[1])
        assert got == {1: 0.0, 2: 1.0, 3: 0.0}


class TestClosenessCentrality:
    """Closeness (`graph.closeness_centrality`) — graph_closeness is
    oracled at gate scale; these pin exact path-graph values and
    driver == distributed parity (incl. the integer sums)."""

    def _run(self, rows, **kw):
        from kgflow.ops.graph import closeness_centrality

        df = pd.DataFrame(
            {"src": [r[0] for r in rows], "dst": [r[1] for r in rows]}
        )
        out = closeness_centrality(rd.from_pandas(df), **kw).to_pandas()
        return {
            int(r[0]): (int(r[1]), int(r[2]), round(float(r[3]), 12))
            for r in out[
                ["node", "n_reached", "total_dist", "closeness"]
            ].values.tolist()
        }

    def test_path_graph_exact(self):
        got = self._run([(1, 2), (2, 3)])
        assert got == {
            1: (2, 3, round(2 / 3, 12)),
            2: (2, 2, 1.0),
            3: (2, 3, round(2 / 3, 12)),
        }

    @pytest.mark.parametrize("lim", [100_000, 0])
    def test_disconnected_components(self, lim):
        got = self._run([(1, 2), (10, 11)], driver_limit=lim)
        assert got == {
            1: (1, 1, 1.0),
            2: (1, 1, 1.0),
            10: (1, 1, 1.0),
            11: (1, 1, 1.0),
        }

    def test_driver_matches_distributed_random(self):
        rng = np.random.RandomState(73)
        rows = [
            (int(a), int(b))
            for a, b in rng.randint(0, 13, size=(70, 2))
            if a != b
        ]
        assert self._run(rows) == self._run(rows, driver_limit=0)


class TestBpeEncode:
    """BPE apply (`text.bpe_encode`) — doc_bpe_encode is rows-only, so
    a hand-computed corpus pins the exact encoding and an invariant
    test pins reconstruction."""

    def _corpus(self):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([0, 1, 2], dtype="int64"),
                    "text": [
                        "low low low lower",
                        "lowest newer",
                        "new new newer wider",
                    ],
                }
            )
        )

    def test_hand_computed_encoding(self):
        from kgflow.ops.text import bpe_encode, bpe_merges

        docs = self._corpus()
        merges = bpe_merges(docs, n_merges=4)
        # merge sequence: l+o, lo+w, e+r, e+w (count desc, pair asc)
        assert [tuple(r) for r in merges.values.tolist()] == [
            (1, "l", "o", 5), (2, "lo", "w", 5),
            (3, "e", "r", 4), (4, "e", "w", 4),
        ]
        enc = bpe_encode(docs, merges).to_pandas()
        got = sorted(map(tuple, enc.values.tolist()))
        assert got == [
            (0, "er", 1), (0, "low", 4),
            (1, "e", 1), (1, "er", 1), (1, "ew", 1), (1, "low", 1),
            (1, "n", 1), (1, "s", 1), (1, "t", 1),
            (2, "d", 1), (2, "er", 2), (2, "ew", 3), (2, "i", 1),
            (2, "n", 3), (2, "w", 1),
        ]

    def test_reconstruction_invariant_random_merge_count(self):
        import re

        from kgflow.ops.text import bpe_encode, bpe_merges

        docs = self._corpus()
        for k in (1, 7):
            merges = bpe_merges(docs, n_merges=k)
            enc = bpe_encode(docs, merges).to_pandas()
            texts = {
                0: "low low low lower",
                1: "lowest newer",
                2: "new new newer wider",
            }
            for d_, t_ in texts.items():
                sub = enc[enc.doc_id == d_]
                chars = int(
                    sum(len(s) * c for s, c in zip(sub.subword, sub.cnt))
                )
                want = sum(len(w) for w in re.findall(r"\w+", t_.lower()))
                assert chars == want

    def test_empty_and_no_merges(self):
        from kgflow.ops.text import bpe_encode

        docs = rd.from_pandas(
            pd.DataFrame(
                {"doc_id": pd.Series([5], dtype="int64"), "text": ["ab"]}
            )
        )
        none = pd.DataFrame(
            {"rank": [], "left": [], "right": [], "pair_count": []}
        )
        out = bpe_encode(docs, none).to_pandas()
        # no merges: every char is its own subword
        assert sorted(map(tuple, out.values.tolist())) == [
            (5, "a", 1), (5, "b", 1),
        ]


class TestAliasAmbiguity:
    """Linking-quality profile (`web.alias_ambiguity_stats`) —
    kg_alias_ambiguity is rows-only; planted entity maps pin the
    exact ambiguity/mention counts."""

    def test_planted_counts(self):
        from kgflow.ops.web import alias_ambiguity_stats

        emap = pd.DataFrame(
            {
                # "paris" links to TWO entities (city 1, person 9);
                # "osaka"/"osakaa" both to entity 2
                "mention": ["Paris", "paris", "Osaka", "osakaa", "Paris"],
                "norm": ["paris", "paris", "osaka", "osakaa", "paris"],
                "entity_id": [1, 9, 2, 2, 1],
                "canonical": ["paris", "paris", "osaka", "osaka", "paris"],
                "n": [3, 2, 5, 1, 4],
            }
        )
        out = (
            alias_ambiguity_stats(rd.from_pandas(emap))
            .to_pandas()
            .sort_values("norm")
            .reset_index(drop=True)
        )
        got = {
            r.norm: (int(r.n_entities), int(r.n_mentions), int(r.ambiguous))
            for r in out.itertuples()
        }
        assert got == {
            "paris": (2, 9, 1),
            "osaka": (1, 5, 0),
            "osakaa": (1, 1, 0),
        }

    def test_empty(self):
        from kgflow.ops.web import alias_ambiguity_stats

        emap = pd.DataFrame(
            {
                "norm": pd.Series([], dtype="object"),
                "entity_id": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
            }
        )
        assert alias_ambiguity_stats(rd.from_pandas(emap)).count() == 0


class TestEccentricity:
    """Eccentricity (`graph.eccentricity_stats`) — graph_eccentricity
    is oracled at gate scale; these pin path-graph values, isolated
    self-loop behavior, and driver == distributed parity."""

    def _run(self, rows, **kw):
        from kgflow.ops.graph import eccentricity_stats

        df = pd.DataFrame(
            {"src": [r[0] for r in rows], "dst": [r[1] for r in rows]}
        )
        out = eccentricity_stats(rd.from_pandas(df), **kw).to_pandas()
        return dict(zip(out["node"].astype(int), out["ecc"].astype(int)))

    @pytest.mark.parametrize("lim", [100_000, 0])
    def test_path_graph(self, lim):
        assert self._run([(1, 2), (2, 3), (3, 4)], driver_limit=lim) == {
            1: 3, 2: 2, 3: 2, 4: 3,
        }

    def test_driver_matches_distributed_random(self):
        rng = np.random.RandomState(83)
        rows = [
            (int(a), int(b))
            for a, b in rng.randint(0, 13, size=(70, 2))
            if a != b
        ]
        assert self._run(rows) == self._run(rows, driver_limit=0)


class TestZorderKeys:
    """Morton keys (`shuffle.zorder_keys`) — events_zorder pins
    bit-exactness vs SQL at gate scale; these pin the interleave
    pattern, locality property, and loud guards."""

    def _run(self, df, **kw):
        from kgflow.ops.shuffle import zorder_keys

        return zorder_keys(rd.from_pandas(df), **kw).to_pandas()

    def test_interleave_pattern(self):
        # x=0b11, y=0b01 at 2 bits: z = x0<<0 | y0<<1 | x1<<2 | y1<<3
        df = pd.DataFrame({"x": [3], "y": [1]})
        out = self._run(df, cols=["x", "y"], bits=2)
        assert int(out["zval"].iloc[0]) == (1 << 0) + (1 << 1) + (1 << 2)

    def test_locality_monotone_on_single_col(self):
        # with the other column fixed, zval is monotone in the varying
        # column — the property range partitioning relies on
        df = pd.DataFrame({"x": list(range(16)), "y": [5] * 16})
        out = self._run(df, cols=["x", "y"], bits=4)
        z = out.sort_values("x")["zval"].to_numpy()
        assert (np.diff(z) > 0).all()

    def test_guards(self):
        from kgflow.ops.shuffle import zorder_keys

        df = rd.from_pandas(pd.DataFrame({"x": [4], "y": [0]}))
        with pytest.raises(Exception, match="outside"):
            zorder_keys(df, cols=["x", "y"], bits=2).materialize()
        with pytest.raises(ValueError, match="non-empty"):
            zorder_keys(df, cols=[])
        with pytest.raises(ValueError, match="63"):
            zorder_keys(df, cols=["x", "y"], bits=32)


class TestCompactPartitions:
    """Storage maintenance (`materialize.compact.compact_partitions`)
    — small-file compaction with verified-then-atomic swaps and
    manifest resume."""

    def _make_table(self, tmp_path, files_per_part=5, rows_per_file=20):
        import pyarrow as pa
        import pyarrow.parquet as pq

        root = str(tmp_path / "edges")
        rid = 0
        for part in range(2):
            d = os.path.join(root, f"subj_bucket={part}")
            os.makedirs(d)
            for f in range(files_per_part):
                t = pa.table(
                    {
                        "subj_id": pa.array(
                            range(rid, rid + rows_per_file), pa.int64()
                        ),
                        "w": pa.array(
                            [part] * rows_per_file, pa.int64()
                        ),
                    }
                )
                pq.write_table(t, os.path.join(d, f"part_{f}.parquet"))
                rid += rows_per_file
        return root

    def test_compacts_verifies_and_resumes(self, tmp_path):
        import pyarrow.parquet as pq

        from kgflow.materialize.compact import compact_partitions

        root = self._make_table(tmp_path)
        before = pq.read_table(root)
        recs = compact_partitions(root, target_rows_per_file=1000)
        assert [r["action"] for r in recs] == ["compacted", "compacted"]
        assert all(r["files_before"] == 5 and r["files_after"] == 1 for r in recs)
        after = pq.read_table(root)
        # byte-identical contents (order within partition preserved)
        assert before.sort_by("subj_id").equals(after.sort_by("subj_id"))
        # second run: manifest resume, no rewrites
        recs2 = compact_partitions(root, target_rows_per_file=1000)
        assert [r["action"] for r in recs2] == ["resumed", "resumed"]

    def test_already_compact_skipped(self, tmp_path):
        from kgflow.materialize.compact import compact_partitions

        root = self._make_table(tmp_path, files_per_part=1)
        recs = compact_partitions(root, target_rows_per_file=1000)
        assert [r["action"] for r in recs] == ["skipped", "skipped"]

    def test_target_splits_into_multiple_files(self, tmp_path):
        from kgflow.materialize.compact import compact_partitions

        root = self._make_table(tmp_path, files_per_part=6, rows_per_file=10)
        recs = compact_partitions(root, target_rows_per_file=25)
        # 60 rows / 25 -> 3 files per partition
        assert all(
            r["files_after"] == 3 and r["action"] == "compacted"
            for r in recs
        )


class TestBloomIndex:
    """Partition Bloom sidecars (`materialize.bloomindex`) — no false
    negatives ever, sane false-positive pruning, loud mismatches."""

    def _table(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        root = str(tmp_path / "edges")
        # partition p holds obj ids in [1000*p, 1000*p + 50)
        for p in range(3):
            d = os.path.join(root, f"subj_bucket={p}")
            os.makedirs(d)
            t = pa.table(
                {"obj_id": pa.array(range(1000 * p, 1000 * p + 50), pa.int64())}
            )
            pq.write_table(t, os.path.join(d, "part.parquet"))
        return root

    def test_no_false_negatives_and_pruning(self, tmp_path):
        from kgflow.materialize.bloomindex import (
            bloom_lookup,
            build_bloom_index,
        )

        root = self._table(tmp_path)
        recs = build_bloom_index(root, "obj_id", n_bits=1 << 14)
        assert [r["n_keys"] for r in recs] == [50, 50, 50]
        # every present key MUST list its true partition
        got = bloom_lookup(
            root, "obj_id", [0, 1000, 2000, 2049], n_bits=1 << 14
        )
        assert "subj_bucket=0" in got[0]
        assert "subj_bucket=1" in got[1000]
        assert "subj_bucket=2" in got[2000] and "subj_bucket=2" in got[2049]
        # absent keys: with 50 keys in 16384 bits, fp ~ 0 — all empty
        miss = bloom_lookup(
            root, "obj_id", list(range(500, 540)), n_bits=1 << 14
        )
        assert sum(len(v) for v in miss.values()) <= 2  # fp budget

    def test_loud_guards(self, tmp_path):
        from kgflow.materialize.bloomindex import (
            bloom_lookup,
            build_bloom_index,
        )

        root = self._table(tmp_path)
        with pytest.raises(FileNotFoundError, match="no index"):
            bloom_lookup(root, "obj_id", [1])
        with pytest.raises(ValueError, match="multiple of 8"):
            build_bloom_index(root, "obj_id", n_bits=9)
        build_bloom_index(root, "obj_id", n_bits=1 << 14)
        with pytest.raises(ValueError, match="rebuild"):
            bloom_lookup(root, "obj_id", [1], n_bits=1 << 15)


def test_bloom_read_pruned(tmp_path):
    """End-to-end point read through the Bloom index: exact results,
    empty maybe-set short-circuits."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kgflow.materialize.bloomindex import build_bloom_index, read_pruned

    root = str(tmp_path / "edges")
    for p in range(3):
        d = os.path.join(root, f"subj_bucket={p}")
        os.makedirs(d)
        t = pa.table(
            {
                "obj_id": pa.array(range(1000 * p, 1000 * p + 50), pa.int64()),
                "w": pa.array([p] * 50, pa.int64()),
            }
        )
        pq.write_table(t, os.path.join(d, "part.parquet"))
    build_bloom_index(root, "obj_id", n_bits=1 << 14)
    out = read_pruned(
        root, "obj_id", [5, 1005, 2049], n_bits=1 << 14
    ).to_pandas()
    assert sorted(out["obj_id"].tolist()) == [5, 1005, 2049]
    assert sorted(out["w"].tolist()) == [0, 1, 2]
    empty = read_pruned(root, "obj_id", [999_999], n_bits=1 << 14)
    assert empty.count() == 0


class TestGroupingSets:
    """GROUPING SETS (`reshape.grouping_sets_sum`) — events_groupsets
    is oracled at gate scale; these pin exact subtotal values, that
    only LISTED sets appear, and the loud duplicate guard."""

    def _ds(self):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "a": ["x", "x", "y", "y"],
                    "b": ["1", "2", "1", "1"],
                    "v": pd.Series([10, 20, 30, 40], dtype="int64"),
                }
            )
        )

    def test_listed_sets_only_with_exact_values(self):
        from kgflow.ops.reshape import grouping_sets_sum

        out = (
            grouping_sets_sum(self._ds(), sets=[["a"], []], sum_cols=["v"])
            .to_pandas()
        )
        # column b never appears in any listed set -> not in the output
        assert "b" not in out.columns
        rows = {
            r["a"]: (int(r["v"]), int(r["n"])) for _, r in out.iterrows()
        }
        assert rows == {
            "x": (30, 2),
            "y": (70, 2),
            None: (100, 4),
        }

    def test_finest_set_included(self):
        from kgflow.ops.reshape import grouping_sets_sum

        out = grouping_sets_sum(
            self._ds(), sets=[["a", "b"], ["b"]], sum_cols=["v"]
        ).to_pandas()
        rows = {
            (r["a"], r["b"]): (int(r["v"]), int(r["n"]))
            for _, r in out.iterrows()
        }
        assert rows == {
            ("x", "1"): (10, 1),
            ("x", "2"): (20, 1),
            ("y", "1"): (70, 2),
            (None, "1"): (80, 3),
            (None, "2"): (20, 1),
        }

    def test_guards(self):
        from kgflow.ops.reshape import grouping_sets_sum

        with pytest.raises(ValueError, match="duplicate"):
            grouping_sets_sum(
                self._ds(), sets=[["a", "b"], ["b", "a"]], sum_cols=["v"]
            )
        with pytest.raises(ValueError, match="non-empty"):
            grouping_sets_sum(self._ds(), sets=[], sum_cols=["v"])


class TestEntityCards:
    """Per-entity serving cards (`web.entity_cards`) —
    kg_entity_cards is rows-only; planted inputs pin exact
    degree/relation/alias numbers and the tie-break."""

    def test_planted_cards(self):
        from kgflow.ops.web import entity_cards

        nodes = rd.from_pandas(
            pd.DataFrame(
                {
                    "entity_id": pd.Series([1, 2, 3], dtype="int64"),
                    "canonical": ["paris", "france", "berlin"],
                    "aliases": [["paris", "pariss"], ["france"], ["berlin"]],
                    "n_mentions": pd.Series([10, 5, 2], dtype="int64"),
                }
            )
        )
        edges = rd.from_pandas(
            pd.DataFrame(
                {
                    "subj_canonical": ["paris", "paris", "berlin"],
                    "rel": ["capital_of", "located_in", "capital_of"],
                    "obj_canonical": ["france", "france", "nowhere"],
                    "weight": pd.Series([4, 1, 2], dtype="int64"),
                }
            )
        )
        out = entity_cards(nodes, edges).to_pandas()
        got = {
            r.canonical: (
                int(r.n_mentions),
                int(r.n_aliases),
                int(r.out_degree),
                int(r.in_degree),
                int(r.n_rels_out),
                r.top_rel_out,
            )
            for r in out.itertuples()
        }
        # endpoint "nowhere" has no node row -> no card
        assert got == {
            "paris": (10, 2, 5, 0, 2, "capital_of"),
            "france": (5, 1, 0, 5, 0, None),
            "berlin": (2, 1, 2, 0, 1, "capital_of"),
        }

    def test_top_rel_tie_breaks_ascending(self):
        from kgflow.ops.web import entity_cards

        nodes = rd.from_pandas(
            pd.DataFrame(
                {
                    "entity_id": pd.Series([1], dtype="int64"),
                    "canonical": ["a"],
                    "aliases": [["a"]],
                    "n_mentions": pd.Series([1], dtype="int64"),
                }
            )
        )
        edges = rd.from_pandas(
            pd.DataFrame(
                {
                    "subj_canonical": ["a", "a"],
                    "rel": ["zz", "aa"],
                    "obj_canonical": ["b", "c"],
                    "weight": pd.Series([3, 3], dtype="int64"),
                }
            )
        )
        out = entity_cards(nodes, edges).to_pandas()
        assert out.iloc[0]["top_rel_out"] == "aa"


class TestCrossMinhashPairs:
    """Bipartite near-dup join (`dedup.cross_minhash_pairs`) — the
    oracled doc_cross_dups query gates gate-scale; these pin
    cross-side-only enumeration, exact Jaccard values, and the loud
    id-collision guard. Input is ONE side-tagged dataset (the ray
    shared-lineage union hazard is documented in the op)."""

    def _ds(self, rows):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
                    "text": [r[1] for r in rows],
                    "side": pd.Series(
                        [r[2] for r in rows], dtype="int8"
                    ),
                }
            )
        )

    BASE = "the quick brown fox jumps over the lazy dog again and again today"

    def test_cross_only_pairs_with_exact_sim(self):
        from kgflow.ops.dedup import cross_minhash_pairs

        # A twins 1,2 (identical) must NOT pair; (1,101) must
        ds = self._ds(
            [
                (1, self.BASE, 0),
                (2, self.BASE, 0),
                (101, self.BASE + " extra bits", 1),
                (102, "unrelated b side text nothing shared at all here", 1),
            ]
        )
        out = cross_minhash_pairs(ds, threshold=0.5).to_pandas()
        got = sorted(map(tuple, out[["doc_a", "doc_b"]].values.tolist()))
        assert got == [(1, 101), (2, 101)]
        # exact trigram Jaccard: 11 shared trigrams of 13 total (the
        # 2 new cross-boundary trigrams from " extra bits")
        assert abs(float(out["sim"].iloc[0]) - 11 / 13) < 1e-12

    def test_id_collision_raises(self):
        from kgflow.ops.dedup import cross_minhash_pairs

        ds = self._ds([(1, self.BASE, 0), (1, self.BASE, 1)])
        with pytest.raises(Exception, match="disjoint"):
            cross_minhash_pairs(ds).materialize()
