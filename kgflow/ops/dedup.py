"""Near-duplicate detection operators over documents: MinHash-LSH,
SimHash, n-gram Jaccard verification, embedding-cosine near-dup.

The shuffle skeleton is shared with mention linking
(`kgflow.linking.link`): signature fan-out → ONE groupby on the bucket
key → in-bucket pairwise verify, with bucket-size caps bounding the
quadratic term. These are the standard web-dedup constructions
(Broder minhash, Charikar simhash / Manku et al. WWW'07 banding).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgflow.linking.minhash import MinHasher, _P
from kgflow.ops.text import hash_token

_WORD = re.compile(r"\w+")


def _word_shingles(text: str, k: int = 3) -> np.ndarray:
    toks = _WORD.findall(text.lower())
    if len(toks) < k:
        toks = toks + ["\x00"] * (k - len(toks))
    out = np.empty(len(toks) - k + 1, dtype=np.uint64)
    for i in range(len(toks) - k + 1):
        h = np.uint64(0)
        for w in toks[i : i + k]:
            h = h * np.uint64(1099511628211) + np.uint64(hash_token(w))
        out[i] = h
    return np.unique(out)


def word_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(_word_shingles(a, k).tolist())
    sb = set(_word_shingles(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_pairs(
    docs: "rd.Dataset",
    num_hashes: int = 64,
    bands: int = 16,
    rows: int = 4,
    threshold: float = 0.5,
    max_bucket: int = 100,
    seed: int = 42,
) -> "rd.Dataset":
    """documents(doc_id, text) → verified near-dup pairs
    (doc_a, doc_b, sim) with word-3-gram Jaccard ≥ threshold."""

    def band_rows(batch: pa.Table) -> pa.Table:
        hasher = MinHasher(num_hashes=num_hashes, seed=seed)
        o_band, o_hash, o_id = [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            x = _word_shingles(t)
            ax = (hasher.a[:, None] * x[None, :]) % _P
            sig = ((ax + hasher.b[:, None]) % _P).min(axis=1)[: bands * rows]
            sig = sig.reshape(bands, rows)
            bh = np.zeros(bands, dtype=np.uint64)
            for r in range(rows):
                bh = (bh * np.uint64(1099511628211) + sig[:, r]) % _P
            for b in range(bands):
                o_band.append(b)
                o_hash.append(int(bh[b]))
                o_id.append(did)
        return pa.table(
            {
                "band_id": pa.array(o_band, pa.int32()),
                "band_hash": pa.array(np.asarray(o_hash, dtype=np.uint64)),
                "doc_id": pa.array(o_id, pa.int64()),
            }
        )

    # texts must be verifiable in-bucket: ship (doc_id → text) via the
    # bucket rows themselves would duplicate text per band; instead carry
    # doc_id only and verify against a broadcast text lookup when the
    # corpus is small, or a second co-partitioned pass at scale. Here we
    # carry text once per band row for simplicity at test scale, noting
    # the scale path in the docstring.
    def band_rows_with_text(batch: pa.Table) -> pa.Table:
        t = band_rows(batch)
        texts = dict(
            zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist())
        )
        col = [texts[d] for d in t.column("doc_id").to_pylist()]
        return t.append_column("text", pa.array(col, pa.string()))

    def coarse_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """Whole coarse-bucket reduction: per LSH bucket inside, emit
        verified pairs. The coarse bucket (hash of the band key, ~64
        groups) keeps the shuffle group count constant; the true LSH
        buckets are resolved with a vectorized pandas groupby inside."""
        a, b, s = [], [], []
        for (_, _), grp in g.groupby(["band_id", "band_hash"], sort=False):
            grp = grp.drop_duplicates("doc_id")
            if len(grp) < 2:
                continue
            grp = grp.sort_values("doc_id").head(max_bucket)
            ids = grp["doc_id"].to_numpy()
            txts = grp["text"].to_numpy()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    sim = word_jaccard(txts[i], txts[j])
                    if sim >= threshold:
                        a.append(int(ids[i]))
                        b.append(int(ids[j]))
                        s.append(sim)
        return pd.DataFrame(
            {
                "doc_a": pd.Series(a, dtype="int64"),
                "doc_b": pd.Series(b, dtype="int64"),
                "sim": pd.Series(s, dtype="float64"),
            }
        )

    from kgflow.ops.shuffle import bucketed_group_reduce

    pairs = bucketed_group_reduce(
        docs.select_columns(["doc_id", "text"]).map_batches(
            band_rows_with_text, batch_format="pyarrow"
        ),
        key_cols=["band_id", "band_hash"],
        reduce_fn=coarse_pairs,
    )
    # bands emit duplicate pairs → one more bucketed dedup
    return bucketed_group_reduce(
        pairs,
        key_cols=["doc_a", "doc_b"],
        reduce_fn=lambda g: g.drop_duplicates(["doc_a", "doc_b"]),
    )


def simhash64(text: str, seed: int = 42) -> int:
    """Charikar 64-bit simhash over word features."""
    toks = _WORD.findall(text.lower())
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for w in toks:
        h = np.uint64(hash_token(w)) ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits == 1, 1, -1)
    v = 0
    for b in range(64):
        if acc[b] > 0:
            v |= 1 << b
    return v


def simhash_table(docs: "rd.Dataset", seed: int = 42) -> "rd.Dataset":
    """doc_id, simhash (int64, sign-masked)."""

    def f(batch: pa.Table) -> pa.Table:
        vals = [
            simhash64(t, seed) & 0x7FFFFFFFFFFFFFFF
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "simhash": pa.array(vals, pa.int64())}
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def simhash_pairs(
    docs: "rd.Dataset", max_hamming: int = 6, bands: int = 4, seed: int = 42
) -> "rd.Dataset":
    """Near-dup pairs by simhash: band the 64-bit hash into ``bands``
    16-bit blocks (Manku et al.: two hashes within hamming distance d
    agree on at least one block if d < bands), groupby block value,
    verify hamming distance in-bucket."""

    def band_rows(batch: pa.Table) -> pa.Table:
        o_band, o_key, o_id, o_sh = [], [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sh = simhash64(t, seed) & 0x7FFFFFFFFFFFFFFF
            for b in range(bands):
                o_band.append(b)
                o_key.append((sh >> (16 * b)) & 0xFFFF)
                o_id.append(did)
                o_sh.append(sh)
        return pa.table(
            {
                "band_id": pa.array(o_band, pa.int32()),
                "band_key": pa.array(o_key, pa.int32()),
                "doc_id": pa.array(o_id, pa.int64()),
                "simhash": pa.array(o_sh, pa.int64()),
            }
        )

    def coarse_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b, d = [], [], []
        for (_, _), grp in g.groupby(["band_id", "band_key"], sort=False):
            grp = grp.drop_duplicates("doc_id")
            if len(grp) < 2:
                continue
            grp = grp.sort_values("doc_id").head(200)
            ids = grp["doc_id"].to_numpy()
            shs = grp["simhash"].to_numpy(dtype=np.uint64)
            for i in range(len(ids)):
                x = shs[i] ^ shs[i + 1 :]
                ham = np.array([bin(int(v)).count("1") for v in x])
                for off in np.flatnonzero(ham <= max_hamming):
                    a.append(int(ids[i]))
                    b.append(int(ids[i + 1 + off]))
                    d.append(int(ham[off]))
        return pd.DataFrame(
            {
                "doc_a": pd.Series(a, dtype="int64"),
                "doc_b": pd.Series(b, dtype="int64"),
                "hamming": pd.Series(d, dtype="int64"),
            }
        )

    from kgflow.ops.shuffle import bucketed_group_reduce

    pairs = bucketed_group_reduce(
        docs.select_columns(["doc_id", "text"]).map_batches(
            band_rows, batch_format="pyarrow"
        ),
        key_cols=["band_id", "band_key"],
        reduce_fn=coarse_pairs,
    )
    return bucketed_group_reduce(
        pairs,
        key_cols=["doc_a", "doc_b"],
        reduce_fn=lambda g: g.drop_duplicates(["doc_a", "doc_b"]),
    )


def neardup_clusters(docs: "rd.Dataset", **minhash_kwargs) -> "rd.Dataset":
    """Near-duplicate document CLUSTERS: minhash/LSH pairs → connected
    components → (doc_id, cluster_id) with cluster_id = min doc_id of
    the component. Docs with no near-dup partner keep their own id.
    Composition demo of the dedup + graph primitives; at corpus scale
    the CC runs the iterated-groupby rounds (kgflow/linking/cc.py)."""
    import pandas as pd_

    from kgflow.linking.cc import connected_components

    pairs = minhash_pairs(docs, **minhash_kwargs)
    # zero-padded string node ids: CC's min-label is lexicographic, so
    # padding makes the representative the numeric-min doc id
    edges = pairs.map_batches(
        lambda df: pd_.DataFrame(
            {
                "src": df["doc_a"].map(lambda x: f"{x:012d}"),
                "dst": df["doc_b"].map(lambda x: f"{x:012d}"),
            }
        ),
        batch_format="pandas",
    )
    selfloops = docs.select_columns(["doc_id"]).map_batches(
        lambda df: pd_.DataFrame(
            {
                "src": df["doc_id"].map(lambda x: f"{x:012d}"),
                "dst": df["doc_id"].map(lambda x: f"{x:012d}"),
            }
        ),
        batch_format="pandas",
    )
    comp = connected_components(edges.union(selfloops))

    def to_ids(df: pd_.DataFrame) -> pd_.DataFrame:
        return pd_.DataFrame(
            {
                "doc_id": df["node"].astype("int64"),
                "cluster_id": df["comp"].astype("int64"),
            }
        )

    return comp.map_batches(to_ids, batch_format="pandas")


def embedding_neardup_pairs(
    emb: "rd.Dataset", threshold: float = 0.98, num_planes: int = 12, seed: int = 42
) -> "rd.Dataset":
    """Embedding-cosine near-dup via random-hyperplane LSH: sign-pattern
    bucket (SimHash for vectors), verify cosine in-bucket.
    emb(vec_id, embedding list<float>) → (vec_a, vec_b, cos)."""

    def bucket(batch: pa.Table) -> pa.Table:
        M = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float32)
        dim = M.shape[1]
        rng = np.random.RandomState(seed)
        planes = rng.randn(dim, num_planes).astype(np.float32)
        signs = (M @ planes) > 0  # [N, P]
        keys = np.zeros(len(M), dtype=np.int64)
        for p in range(num_planes):
            keys |= signs[:, p].astype(np.int64) << p
        return pa.table(
            {
                "bucket": pa.array(keys),
                "vec_id": batch.column("vec_id"),
                "embedding": batch.column("embedding"),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.head(500)
        M = np.asarray(list(g["embedding"]), dtype=np.float32)
        ids = g["vec_id"].to_numpy()
        norm = np.linalg.norm(M, axis=1, keepdims=True)
        norm[norm == 0] = 1
        U = M / norm
        S = U @ U.T
        a, b, c = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if S[i, j] >= threshold:
                    a.append(int(ids[i]))
                    b.append(int(ids[j]))
                    c.append(float(S[i, j]))
        return pd.DataFrame(
            {
                "vec_a": pd.Series(a, dtype="int64"),
                "vec_b": pd.Series(b, dtype="int64"),
                "cos": pd.Series(c, dtype="float64"),
            }
        )

    return (
        emb.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(verify, batch_format="pandas")
    )
