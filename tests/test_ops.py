"""Unit tests for the training-data ops library over the driver tables
and crafted inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_exact_dedup_crafted():
    from kgflow.ops.text import exact_dedup

    import hashlib

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["a", "b", "a", "a"]}
    )
    # text layout (round-1 surface, key = full text)
    out = exact_dedup(rd.from_pandas(df), output="text").to_pandas().sort_values("text")
    assert list(out["text"]) == ["a", "b"]
    assert list(out["first_doc_id"]) == [1, 2]
    assert list(out["n"]) == [3, 1]
    # fingerprint layout (scale default: shuffle ships md5, not text)
    fp = exact_dedup(rd.from_pandas(df)).to_pandas().sort_values("first_doc_id")
    assert list(fp["fp"]) == [
        hashlib.md5(b"a").hexdigest(),
        hashlib.md5(b"b").hexdigest(),
    ]
    assert list(fp["first_doc_id"]) == [1, 2]
    assert list(fp["n"]) == [3, 1]


def test_token_counts_matches_regex():
    import re

    from kgflow.ops.text import token_counts

    docs = rd.read_parquet(f"{SF}/documents.parquet")
    out = token_counts(docs).to_pandas().set_index("doc_id")["n_tokens"]
    raw = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for did, text in zip(raw["doc_id"].head(50), raw["text"].head(50)):
        assert out[did] == len(re.findall(r"\w+", text))


def test_langid_heuristic():
    from kgflow.ops.text import LangIdStage

    s = LangIdStage()
    assert s.detect("the cat and the dog went to the park") == "en"
    assert s.detect("der hund ist nicht mit der katze") == "de"
    assert s.detect("le chat est dans la maison pour la nuit") == "fr"
    assert s.detect("el perro y la casa es para una familia") == "es"
    assert s.detect("你好 世界") == "zh"
    assert s.detect("12345 !!!") == "und"


def test_minhash_pairs_find_planted_neardups():
    from kgflow.ops.dedup import minhash_pairs, word_jaccard

    base = (
        "spark table join merge window batch stream filter sort hash value "
        "key row column scan group agg small big fast slow data query line"
    )
    near = base.replace("slow", "rapid")  # one word of ~24 changed
    far = "completely different words entirely unrelated content here now"
    df = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": [base, near, far]}
    )
    assert word_jaccard(base, near) >= 0.5
    out = minhash_pairs(rd.from_pandas(df)).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_pairs_planted():
    from kgflow.ops.dedup import simhash_pairs

    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok3 ", "tok3x ")
    far = " ".join(f"other{i}" for i in range(60))
    df = pd.DataFrame({"doc_id": [0, 1, 2], "text": [base, near, far]})
    out = simhash_pairs(rd.from_pandas(df)).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_ann_bruteforce_matches_numpy():
    from kgflow.ops.ann import brute_force_topk

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    M = np.asarray(list(emb["embedding"]), dtype=np.float32)
    ids = emb["vec_id"].to_numpy()
    U = M / np.linalg.norm(M, axis=1, keepdims=True)
    qids = ids[:5].tolist()
    out = (
        brute_force_topk(rd.read_parquet(f"{SF}/embeddings.parquet"), qids, M[:5], k=3)
        .to_pandas()
    )
    for qi, qid in enumerate(qids):
        sims = U @ U[qi]
        order = [ids[j] for j in np.argsort(-sims) if ids[j] != qid][:3]
        got = out[out["query_id"] == qid].sort_values("cos", ascending=False)
        assert list(got["neighbor_id"]) == order


def test_ann_lsh_recall():
    from kgflow.ops.ann import brute_force_topk, lsh_topk

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    M = np.asarray(list(emb["embedding"]), dtype=np.float32)
    qids = emb["vec_id"].to_numpy()[:5].tolist()
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    exact = brute_force_topk(ds, qids, M[:5], k=5).to_pandas()
    approx = lsh_topk(ds, qids, M[:5], k=5).to_pandas()
    # approximate: recall over all queries >= 0.5 (it's an ANN)
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    assert len(e & a) / len(e) >= 0.5


def test_ann_ivf_exact_when_probing_everything_and_recall_when_not():
    from kgflow.ops.ann import brute_force_topk, ivf_topk

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    M = np.asarray(list(emb["embedding"]), dtype=np.float32)
    qids = emb["vec_id"].to_numpy()[:5].tolist()
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    exact = brute_force_topk(ds, qids, M[:5], k=5).to_pandas()
    e = set(zip(exact["query_id"], exact["neighbor_id"]))

    # nprobe == n_centroids probes every partition → exact brute force
    full = ivf_topk(ds, qids, M[:5], k=5, n_centroids=8, nprobe=8).to_pandas()
    f = set(zip(full["query_id"], full["neighbor_id"]))
    assert f == e

    # small nprobe: approximate with useful recall
    approx = ivf_topk(ds, qids, M[:5], k=5, n_centroids=8, nprobe=3).to_pandas()
    a = set(zip(approx["query_id"], approx["neighbor_id"]))
    assert len(e & a) / len(e) >= 0.5


def test_ann_ivf_stored_layout_prunes_and_matches_inflight(tmp_path):
    """The stored IVF layout reads <= nprobe*|Q| partition dirs and its
    results match the in-flight probe filter exactly (same centroids)."""
    import os

    from kgflow.ops.ann import (
        _probed_partitions,
        ivf_build_index,
        ivf_topk,
        ivf_topk_stored,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    M = np.asarray(list(emb["embedding"]), dtype=np.float32)
    qids = emb["vec_id"].to_numpy()[:5].tolist()
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")

    idx = str(tmp_path / "ivf_index")
    C = ivf_build_index(ds, idx, n_centroids=8, seed=42)

    # layout: one hive dir per non-empty centroid + the sidecar
    dirs = [d for d in os.listdir(idx) if d.startswith("centroid=")]
    assert len(dirs) > 1 and os.path.exists(f"{idx}/_centroids.parquet")
    # index is lossless: every vector is in exactly one partition
    assert rd.read_parquet(idx).count() == len(emb)

    probed = _probed_partitions(C, M[:5], nprobe=2)
    assert len(probed) <= 2 * len(qids)
    assert len(probed) < len(dirs)  # genuinely pruned at this nprobe

    stored = ivf_topk_stored(idx, qids, M[:5], k=5, nprobe=2).to_pandas()
    inflight = ivf_topk(ds, qids, M[:5], k=5, n_centroids=8, nprobe=2).to_pandas()
    key = ["query_id", "neighbor_id"]
    s = stored.sort_values(key).reset_index(drop=True)
    f = inflight.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(s, f)


def test_embedding_neardup_self_consistent():
    from kgflow.ops.dedup import embedding_neardup_pairs

    emb = pd.read_parquet(f"{SF}/embeddings.parquet").head(50).copy()
    dup = emb.head(3).copy()
    dup["vec_id"] = dup["vec_id"] + 10_000  # planted exact duplicates
    both = pd.concat([emb, dup], ignore_index=True)
    out = embedding_neardup_pairs(rd.from_pandas(both), threshold=0.999).to_pandas()
    pairs = set(zip(out["vec_a"], out["vec_b"]))
    for vid in dup["vec_id"] - 10_000:
        assert (vid, vid + 10_000) in pairs


def test_multimodal_plumbing():
    from kgflow.ops.multimodal import (
        audio_features,
        image_features,
        synth_media_table,
    )

    from kgflow.ops.multimodal import video_frame_features

    media = rd.from_arrow(synth_media_table(60))
    imgs = image_features(media).to_pandas()
    auds = audio_features(media).to_pandas()
    vids = video_frame_features(media, every_k=4).to_pandas()
    assert len(imgs) == 20 and len(auds) == 20  # 60 rows cycle 3 kinds
    assert all(len(f) == 16 for f in imgs["feature"])
    assert (imgs["mean_intensity"] >= 0).all() and (imgs["mean_intensity"] <= 1).all()
    assert (auds["n_samples"] > 0).all()
    # video: ≥1 sampled frame per video row, frame_idx stride respected
    assert vids["media_id"].nunique() == 20
    assert (vids["frame_idx"] % 4 == 0).all()
    assert all(len(f) == 16 for f in vids["feature"])
    # real codecs are explicitly stubbed
    from kgflow.ops.multimodal import DecodeImageStage, SampleFramesStage

    with pytest.raises(NotImplementedError):
        DecodeImageStage()._decode(b"x", "jpeg", 1, 1)
    with pytest.raises(NotImplementedError):
        SampleFramesStage()._decode_frames(b"x", "h264", 1, 1, 1)


def test_rolling_fingerprint_deterministic():
    from kgflow.ops.text import rolling_fingerprint

    docs = rd.read_parquet(f"{SF}/documents.parquet").limit(20)
    a = rolling_fingerprint(docs).to_pandas().sort_values("doc_id")
    b = rolling_fingerprint(docs).to_pandas().sort_values("doc_id")
    assert list(a["rfp"]) == list(b["rfp"])
    assert (a["rfp"] != 0).any()


def test_neardup_clusters_planted():
    from kgflow.ops.dedup import neardup_clusters

    base = (
        "spark table join merge window batch stream filter sort hash value "
        "key row column scan group agg small big fast slow data query line"
    )
    df = pd.DataFrame(
        {
            "doc_id": [5, 9, 2, 7],
            "text": [base, base.replace("slow", "rapid"), "other words entirely here", base],
        }
    )
    out = neardup_clusters(rd.from_pandas(df)).to_pandas()
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    assert cl[5] == cl[9] == cl[7] == 5  # numeric-min representative
    assert cl[2] == 2


def test_embed_matrix_zero_copy_decode():
    """The Arrow flatten/reshape decode must equal the to_pylist path,
    including sliced tables (non-zero list offsets) and float64 input."""
    from kgflow.ops.ann import embed_matrix

    rng = np.random.RandomState(0)
    M = rng.randn(7, 16).astype(np.float32)
    t = pa.table({"embedding": pa.array([r.tolist() for r in M], pa.list_(pa.float32()))})
    assert np.allclose(embed_matrix(t), M)
    assert np.allclose(embed_matrix(t.slice(2, 3)), M[2:5])
    t64 = pa.table({"embedding": pa.array([r.tolist() for r in M], pa.list_(pa.float64()))})
    assert np.allclose(embed_matrix(t64), M)
    assert embed_matrix(t.slice(0, 0)).shape == (0, 0)


def test_jaccard_pairs_exact_vs_bruteforce():
    """Prefix-filter join must equal brute-force all-pairs Jaccard —
    exactness is the operator's whole claim vs minhash LSH. Includes a
    hot shingle shared by every doc (demotion path) and docs near the
    threshold on both sides."""
    from kgflow.ops.dedup import jaccard_pairs, word_jaccard

    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(120)]
    texts = []
    for i in range(30):
        toks = ["common hot shingle"] + [
            vocab[j] for j in rng.choice(120, size=25, replace=False)
        ]
        texts.append(" ".join(toks))
    # planted near-dups at varying similarity
    texts.append(texts[0])                                  # exact dup of 0
    texts.append(texts[1].replace("w", "x", 3))             # perturbed 1
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})

    expect = set()
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            if word_jaccard(texts[a], texts[b]) >= 0.5:
                expect.add((a, b))

    out = jaccard_pairs(rd.from_pandas(df), threshold=0.5).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert got == expect
    assert (0, 30) in got  # the planted exact dup was recovered
    for _, r in out.iterrows():
        assert abs(r["sim"] - word_jaccard(texts[int(r["doc_a"])], texts[int(r["doc_b"])])) < 1e-12


def test_vocab_topk_counts_and_tieorder():
    from kgflow.ops.dedup import _WORD
    from kgflow.ops.text import vocab_topk

    rng = np.random.RandomState(3)
    vocab = [f"tok{i:03d}" for i in range(400)]
    texts = [
        " ".join(vocab[j] for j in rng.zipf(1.3, size=40) % 400) for _ in range(200)
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    from collections import Counter

    c = Counter(w for t in texts for w in _WORD.findall(t.lower()))
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]

    out = vocab_topk(rd.from_pandas(df), k=50, num_buckets=8).to_pandas()
    got = list(zip(out["token"], out["n"]))
    assert got == expect


def test_hash_split_deterministic_and_leakproof():
    from kgflow.ops.text import hash_split

    df = pd.DataFrame(
        {"doc_id": range(300), "text": [f"document number {i} body" for i in range(150)] * 2}
    )
    out = hash_split(rd.from_pandas(df)).to_pandas()
    assert set(out["split"].unique()) <= {"train", "val", "test"}
    # identical text ⇒ identical split (leak-proof), regardless of doc_id
    m = out.merge(df, on="doc_id")
    per_text = m.groupby("text")["split"].nunique()
    assert (per_text == 1).all()
    # deterministic across runs
    out2 = hash_split(rd.from_pandas(df)).to_pandas()
    assert (
        out.sort_values("doc_id")["split"].to_numpy()
        == out2.sort_values("doc_id")["split"].to_numpy()
    ).all()


def test_grouped_sample_deterministic_and_balanced():
    from kgflow.ops.text import grouped_sample

    df = pd.DataFrame(
        {
            "doc_id": range(1000),
            "lang": ["en"] * 700 + ["de"] * 250 + ["fr"] * 50,
        }
    )
    out = grouped_sample(rd.from_pandas(df), n_per_group=30, num_buckets=8).to_pandas()
    sizes = out.groupby("lang")["doc_id"].count().to_dict()
    assert sizes == {"en": 30, "de": 30, "fr": 30}
    assert set(out["rank"]) == set(range(1, 31))
    out2 = grouped_sample(rd.from_pandas(df), n_per_group=30, num_buckets=4).to_pandas()
    key = lambda d: sorted(map(tuple, d[["lang", "doc_id", "rank"]].to_numpy()))
    assert key(out) == key(out2)  # partitioning-independent


def test_top_terms_and_tfidf_vs_local():
    from kgflow.ops.text import tfidf_terms, top_terms

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "apple apple banana common common common",
                "banana cherry cherry common common",
                "apple cherry durian durian common",
                "common common common elderberry",
            ],
        }
    )
    # local ground truth
    rows = []
    for _, r in docs.iterrows():
        toks = r["text"].split()
        for t in set(toks):
            rows.append({"doc_id": r["doc_id"], "token": t, "tf": toks.count(t)})
    tf = pd.DataFrame(rows)
    dfreq = tf.groupby("token").size().rename("df").reset_index()
    j = tf.merge(dfreq, on="token")

    out = (
        top_terms(rd.from_pandas(docs).repartition(3), k=2)
        .to_pandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    exp = (
        j.sort_values(["tf", "df", "token"], ascending=[False, True, True], kind="mergesort")
        .groupby("doc_id", sort=False)
        .head(2)
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[exp.columns], exp, check_dtype=False)

    # float TF-IDF variant vs the same formula locally
    j2 = j.assign(tfidf=j["tf"] * np.log(len(docs) / j["df"]))
    out2 = (
        tfidf_terms(rd.from_pandas(docs).repartition(3), n_docs=len(docs), k=2)
        .to_pandas()
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    exp2 = (
        j2.sort_values(["tfidf", "token"], ascending=[False, True], kind="mergesort")
        .groupby("doc_id", sort=False)
        .head(2)
        .sort_values(["doc_id", "token"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out2[exp2.columns], exp2, check_dtype=False)
    assert np.allclose(out2["tfidf"], exp2["tfidf"])


def test_corpus_freq_score_hand_case():
    """cf: a=2, b=2, c=1 → doc1 (a a b): n=3, freq_sum=2+2+2=6;
    doc2 (b c): n=2, freq_sum=2+1=3; a token-less doc drops."""
    from kgflow.ops.text import corpus_freq_score

    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["a a b", "b c", "  ...  "]}
    )
    out = (
        corpus_freq_score(rd.from_pandas(docs).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_tokens"].tolist() == [3, 2]
    assert out["freq_sum"].tolist() == [6, 3]


def test_corpus_freq_score_paths_agree():
    """Broadcast scoring pass == join path (forced with a zero
    broadcast limit) on a corpus with shared and unique tokens."""
    from kgflow.ops.text import corpus_freq_score

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    docs = pd.DataFrame(
        {
            "doc_id": range(30),
            "text": [
                " ".join(rng.choice(vocab, rng.integers(3, 25)))
                for _ in range(30)
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(3)
    fast = corpus_freq_score(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    slow = (
        corpus_freq_score(ds, broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
