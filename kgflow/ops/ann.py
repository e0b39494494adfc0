"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``) and every batch does ONE numpy matmul against it, emitting
per-batch partial top-k; a final tiny groupby-per-query merge yields the
global top-k. Scale path: LSH-bucketed variant (queries only scan
candidate buckets; recall < 1 traded for bucket-local work).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _unit(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1
    return M / n


def embed_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """[B, dim] float32 matrix from a fixed-dim ``list<float>`` column
    WITHOUT a Python-object round trip: Arrow ``flatten()`` concatenates
    the list values (offset/null-aware), ``to_numpy`` views the buffer,
    one reshape. ~40x cheaper than ``to_pylist()`` per batch on the ANN
    hot path."""
    arr = batch.column(col).combine_chunks()
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float32)
    if hasattr(arr, "flatten"):  # plain list<float> / fixed_size_list
        vals = arr.flatten().to_numpy(zero_copy_only=False)
        return np.ascontiguousarray(vals, dtype=np.float32).reshape(n, -1)
    # Ray ArrowTensorArray extension (from_pandas with ndarray cells):
    # to_numpy() already yields the [B, dim] matrix
    M = np.asarray(arr.to_numpy(zero_copy_only=False))
    if M.dtype == object:  # ragged/object fallback — rare, small batches
        M = np.stack([np.asarray(r) for r in M])
    return np.ascontiguousarray(M, dtype=np.float32)


class BruteForceTopK:
    """Actor-pool stage: holds the broadcast query matrix; per batch one
    [B, dim] × [dim, Q] matmul + per-batch top-k.

    ``metric``: "cosine" scores by cosine similarity over unit-normed
    rows (float32 — the throughput path); "l2" scores by NEGATIVE
    squared euclidean distance over the RAW vectors, computed in
    float64 (‖x‖² − 2x·q expanded form) so rank order is bit-stable vs
    a float64 SQL oracle — the rank-fusion path, where a single flipped
    adjacent pair changes the fused score."""

    def __init__(self, queries_ref, k: int, metric: str = "cosine"):
        q = ray.get(queries_ref)  # (query_ids [Q], matrix [Q, dim])
        self.qids, Qm = q
        self.metric = metric
        if metric == "l2":
            Qm = np.asarray(Qm, dtype=np.float64)
            self.Q = Qm.T  # [dim, Q], raw
            self.qsq = (Qm * Qm).sum(axis=1)  # [Q]
        else:
            self.Q = _unit(np.asarray(Qm, dtype=np.float32)).T  # [dim, Q]
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = embed_matrix(batch)
        ids = np.asarray(batch.column("vec_id").to_numpy(), dtype=np.int64)
        if self.metric == "l2":
            X = np.asarray(M, dtype=np.float64)
            S = 2.0 * (X @ self.Q) - (X * X).sum(axis=1)[:, None] - self.qsq
        else:
            S = _unit(M) @ self.Q  # [B, Q]
        B, Q = S.shape
        k = min(self.k + 1, B)  # +1 to survive self-match removal
        # one argpartition across ALL queries: [k, Q] row indices
        top = np.argpartition(-S, k - 1, axis=0)[:k] if B > k else (
            np.tile(np.arange(B)[:, None], (1, Q))
        )
        rows = top.T.ravel()  # query-major
        cols = np.repeat(np.arange(Q), top.shape[0])
        return pa.table(
            {
                "query_id": pa.array(
                    np.repeat(np.asarray(self.qids, np.int64), top.shape[0])
                ),
                "neighbor_id": pa.array(ids[rows]),
                "cos": pa.array(S[rows, cols].astype(np.float64)),
            }
        )


def brute_force_topk(
    emb: "rd.Dataset",
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 5,
    exclude_self: bool = True,
    metric: str = "cosine",
) -> "rd.Dataset":
    """Global top-k neighbors per query. Output:
    (query_id, neighbor_id, cos) — exactly k rows per query; ``cos`` is
    the score (cosine similarity, or negative squared L2 for
    metric="l2" — higher is always closer)."""
    ref = ray.put((list(query_ids), np.asarray(query_matrix, dtype=np.float32)))
    partial = emb.select_columns(["vec_id", "embedding"]).map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k, "metric": metric},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    # tiny merge: the partial stream is (#batches × Q × k) rows; one
    # bucketed shuffle on query_id with a vectorized in-bucket sort+head
    # (same tie order as heapq.nlargest on (cos, neighbor_id): cos desc,
    # then neighbor_id desc)
    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            g = g[g["neighbor_id"] != g["query_id"]]
        g = g.sort_values(
            ["query_id", "cos", "neighbor_id"],
            ascending=[True, False, False],
            kind="mergesort",
        )
        out = g.groupby("query_id", as_index=False, sort=False).head(k)
        return out[["query_id", "neighbor_id", "cos"]].reset_index(drop=True)

    from kgflow.ops.shuffle import bucketed_group_reduce

    # few buckets on purpose: the merge input is tiny and with Q query
    # keys the chance every bucket is occupied (no schema-less empty
    # partitions from Ray's sort-merge) is ~1-2^-(Q-1) at 2 buckets
    return bucketed_group_reduce(
        partial,
        key_cols=["query_id"],
        reduce_fn=merge_bucket,
        num_buckets=2 if len(query_ids) <= 16 else 8,
    )


def lsh_topk(
    emb: "rd.Dataset",
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 5,
    num_planes: int = 6,
    num_tables: int = 8,
    seed: int = 42,
    exclude_self: bool = True,
) -> "rd.Dataset":
    """LSH-bucketed ANN: random-hyperplane signatures over ``num_tables``
    independent tables; a vector is scored only for queries sharing a
    bucket in some table. Recall < 1 by construction (approximate); at
    scale the matmul shrinks from |corpus| to |union of matching
    buckets| per query."""
    Qm = _unit(np.asarray(query_matrix, dtype=np.float32))
    dim = Qm.shape[1]
    rng = np.random.RandomState(seed)
    planes = [rng.randn(dim, num_planes).astype(np.float32) for _ in range(num_tables)]

    def qkeys(M):
        keys = []
        for t in range(num_tables):
            s = (M @ planes[t]) > 0
            key = np.zeros(len(M), dtype=np.int64)
            for p in range(num_planes):
                key |= s[:, p].astype(np.int64) << p
            keys.append(key + (t << 32))
        return keys  # list of [N] arrays

    q_buckets = set()
    for arr in qkeys(Qm):
        q_buckets.update(int(x) for x in arr)
    qref = ray.put((list(query_ids), Qm, q_buckets))

    class Filter:
        def __init__(self):
            self.qids, self.Q, buckets = ray.get(qref)
            # sorted array once per actor → vectorized membership below
            self.bucket_arr = np.sort(np.fromiter(buckets, dtype=np.int64))

        def __call__(self, batch: pa.Table) -> pa.Table:
            M = embed_matrix(batch)
            if len(M) == 0:
                return pa.table(
                    {"vec_id": pa.array([], pa.int64()),
                     "embedding": pa.array([], pa.list_(pa.float32()))}
                )
            keep = np.zeros(len(M), dtype=bool)
            for arr in qkeys(_unit(M)):
                keep |= np.isin(arr, self.bucket_arr)
            return batch.filter(pa.array(keep))

    filtered = emb.select_columns(["vec_id", "embedding"]).map_batches(
        Filter, batch_format="pyarrow", concurrency=(1, 4)
    )
    return brute_force_topk(
        filtered, query_ids, query_matrix, k=k, exclude_self=exclude_self
    )


def _kmeans_unit(X: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means over unit vectors (numpy; the
    coarse quantizer for IVF). Returns [n_centroids, dim] unit rows."""
    rng = np.random.RandomState(seed)
    X = _unit(np.asarray(X, dtype=np.float32))
    idx = rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)
    C = X[idx].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
        C = _unit(C)
    return C


def _train_centroids(
    emb: "rd.Dataset", n_centroids: int, sample_size: int, seed: int
) -> np.ndarray:
    """Shared coarse-quantizer training for the in-flight and stored IVF
    paths. k-means seeding depends on sample ROW ORDER and Ray's
    streaming executor does not preserve block order across runs
    (``preserve_order`` defaults off), so the bounded sample is sorted
    by ``vec_id`` driver-side — byte-identical centroids for the same
    (input rows, params) regardless of block arrival order."""
    sample = (
        emb.select_columns(["vec_id", "embedding"])
        .limit(sample_size)
        .to_pandas()
        .sort_values("vec_id", kind="mergesort")
    )
    return _kmeans_unit(
        np.asarray(list(sample["embedding"]), dtype=np.float32),
        n_centroids,
        seed=seed,
    )


def _probed_partitions(
    C: np.ndarray, query_matrix: np.ndarray, nprobe: int
) -> set[int]:
    """Union over queries of each query's ``nprobe`` closest centroids —
    the partitions a query run must touch (|probed| <= nprobe * |Q|)."""
    Qm = _unit(np.asarray(query_matrix, dtype=np.float32))
    probe_sim = Qm @ C.T  # [Q, C]
    nprobe = min(nprobe, C.shape[0])
    probed: set[int] = set()
    for qi in range(len(Qm)):
        top = np.argpartition(-probe_sim[qi], nprobe - 1)[:nprobe]
        probed.update(int(c) for c in top)
    return probed


def ivf_topk(
    emb: "rd.Dataset",
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_size: int = 2000,
    seed: int = 42,
    exclude_self: bool = True,
) -> "rd.Dataset":
    """IVF ANN: spherical-k-means coarse quantizer (trained once on a
    bounded sample, broadcast), per-batch centroid assignment (one
    [B, dim] x [dim, C] matmul), and a probe filter that keeps only
    vectors whose centroid is among some query's ``nprobe`` closest
    centroids; the survivors go through the brute-force partial-top-k +
    tiny merge. ``nprobe == n_centroids`` degrades to exact brute force
    (property-tested); smaller ``nprobe`` trades recall for scan size.
    At corpus scale prefer :func:`ivf_build_index` +
    :func:`ivf_topk_stored` — the same pruning realized at the STORAGE
    layer (read only the probed partitions) instead of a full scan with
    an in-flight filter."""
    C = _train_centroids(emb, n_centroids, sample_size, seed)
    probed = _probed_partitions(C, query_matrix, nprobe)
    ref = ray.put((C, probed))

    class ProbeFilter:
        def __init__(self):
            self.C, self.probed = ray.get(ref)
            self.mask = np.zeros(len(self.C), dtype=bool)
            self.mask[list(self.probed)] = True

        def __call__(self, batch: pa.Table) -> pa.Table:
            M = embed_matrix(batch)
            if len(M) == 0:
                return batch
            assign = np.argmax(_unit(M) @ self.C.T, axis=1)
            return batch.filter(pa.array(self.mask[assign]))

    filtered = emb.select_columns(["vec_id", "embedding"]).map_batches(
        ProbeFilter, batch_format="pyarrow", concurrency=(1, 4)
    )
    return brute_force_topk(
        filtered, query_ids, query_matrix, k=k, exclude_self=exclude_self
    )


def ivf_build_index(
    emb: "rd.Dataset",
    index_dir: str,
    n_centroids: int = 16,
    sample_size: int = 2000,
    seed: int = 42,
) -> np.ndarray:
    """Materialize the IVF-Flat layout: every vector is assigned its
    closest centroid (one [B, dim] x [dim, C] matmul per batch) and the
    corpus is written hive-partitioned on that id
    (``index_dir/centroid=<c>/``), so the centroid id IS the storage
    partition key. The tiny [C, dim] centroid matrix is saved as a
    sidecar parquet; a query run loads only the sidecar plus the probed
    partition directories. Build is a one-time, embarrassingly parallel
    write — no shuffle (hive partitioning splits each task's output by
    key locally). Returns the centroid matrix."""
    import pyarrow.parquet as pq

    C = _train_centroids(emb, n_centroids, sample_size, seed)
    ref = ray.put(C)

    class Assign:
        def __init__(self):
            self.C = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            M = embed_matrix(batch)
            if len(M) == 0:
                assign = np.array([], dtype=np.int32)
            else:
                assign = np.argmax(_unit(M) @ self.C.T, axis=1).astype(np.int32)
            return batch.append_column("centroid", pa.array(assign, pa.int32()))

    (
        emb.select_columns(["vec_id", "embedding"])
        .map_batches(Assign, batch_format="pyarrow", concurrency=(1, 4))
        .write_parquet(index_dir, partition_cols=["centroid"])
    )
    pq.write_table(
        pa.table(
            {
                "centroid": pa.array(range(len(C)), pa.int32()),
                "vector": pa.array([row.tolist() for row in C], pa.list_(pa.float32())),
            }
        ),
        f"{index_dir}/_centroids.parquet",
    )
    return C


def ivf_topk_stored(
    index_dir: str,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    exclude_self: bool = True,
) -> "rd.Dataset":
    """Serve IVF top-k from the stored layout: load the [C, dim]
    centroid sidecar (driver-side, tiny), compute the probed partition
    set (<= nprobe * |Q| directories), and ``read_parquet`` ONLY those
    directories — the rest of the corpus never leaves storage. The
    survivors go through the same broadcast-matmul partial-top-k + tiny
    bucketed merge as the brute-force baseline, so with identical
    centroids this matches :func:`ivf_topk` exactly (tested)."""
    import os

    import pyarrow.parquet as pq

    side = pq.read_table(f"{index_dir}/_centroids.parquet")
    order = np.argsort(side.column("centroid").to_numpy())
    C = _unit(
        np.asarray(
            [side.column("vector")[int(i)].as_py() for i in order], dtype=np.float32
        )
    )
    probed = _probed_partitions(C, query_matrix, nprobe)
    # Ray's read_parquet expands a single directory but not directories
    # inside a path list — list the partition files explicitly.
    paths = [
        os.path.join(p, f)
        for c in sorted(probed)
        if os.path.isdir(p := os.path.join(index_dir, f"centroid={c}"))
        for f in sorted(os.listdir(p))
        if f.endswith(".parquet")
    ]
    pruned = rd.read_parquet(paths, columns=["vec_id", "embedding"])
    return brute_force_topk(
        pruned, query_ids, query_matrix, k=k, exclude_self=exclude_self
    )


def embedding_gram(
    emb: "rd.Dataset",
    col: str = "embedding",
    scale: float = 1e4,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Exact fixed-point second-moment (Gram) matrix of an embedding
    column: (i, j, sxx) for i ≤ j with sxx = Σ_rows ⌊x_i·scale⌋·⌊x_j·scale⌋
    — the distributed heart of :func:`embedding_pca` (whose driver-side
    eigendecomposition is not SQL-expressible), made integer-exact so a
    SQL oracle hashes identically: quantize FIRST, then all sums are
    int64 arithmetic with no float accumulation-order drift.

    Scale shape: one pass, per-block dim×dim int64 partials (constant in
    the row count) → one tiny (i, j)-keyed sum reduce (dim² rows total).
    int64 bound: |x|·scale ≤ 1e4-ish ⇒ row products ≤ 1e8; overflow
    needs > 9e10 rows per partial — raise ``scale`` awareness / switch
    partials to object/hugeint before that."""
    import pandas as pd

    from kgflow.ops.shuffle import bucketed_group_reduce

    def partials(batch: pa.Table) -> pd.DataFrame:
        M = embed_matrix(batch, col).astype(np.float64)
        Q = np.floor(M * scale).astype(np.int64)
        G = Q.T @ Q  # [d, d] int64
        d = G.shape[0]
        iu, ju = np.triu_indices(d)
        return pd.DataFrame(
            {
                "i": iu.astype(np.int64) + 1,  # 1-based, matches SQL unnest
                "j": ju.astype(np.int64) + 1,
                "sxx": G[iu, ju],
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["i", "j"], as_index=False)["sxx"].sum()
        out["sxx"] = out["sxx"].astype(np.int64)
        return out

    return bucketed_group_reduce(
        emb.select_columns([col]).map_batches(partials, batch_format="pyarrow"),
        key_cols=["i", "j"],
        reduce_fn=merge,
        num_buckets=num_buckets,
    )


def embedding_pca(
    emb: "rd.Dataset",
    k: int = 8,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> "rd.Dataset":
    """Distributed PCA over an embedding column: per-batch moment
    partials (n, Σx, XᵀX — each dim- or dim²-bounded, CONSTANT in the
    row count) fold on the driver into the covariance, whose
    eigendecomposition (dim×dim — trivial) yields the top-``k``
    components; the projection then streams with the components
    broadcast once. Two passes over the data, zero shuffles.

    Sign convention: each component is flipped so its
    largest-|coordinate| entry is positive (eigenvector sign is
    arbitrary — this pins it for run-to-run determinism).
    Returns (id_col, pc0..pc{k-1})."""
    import pandas as pd

    def moments(batch: pa.Table) -> pd.DataFrame:
        M = embed_matrix(batch, col).astype(np.float64)
        return pd.DataFrame(
            {
                "n": [M.shape[0]],
                "s": [M.sum(axis=0).tobytes()],
                "xtx": [(M.T @ M).tobytes()],
                "d": [M.shape[1]],
            }
        )

    parts = emb.select_columns([col]).map_batches(
        moments, batch_format="pyarrow"
    ).to_pandas()  # one tiny row per block — constant per block
    d = int(parts["d"].iloc[0])
    n = int(parts["n"].sum())
    s = np.zeros(d)
    xtx = np.zeros((d, d))
    for _, r in parts.iterrows():
        s += np.frombuffer(r["s"], dtype=np.float64)
        xtx += np.frombuffer(r["xtx"], dtype=np.float64).reshape(d, d)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending
    comps = v[:, ::-1][:, :k]  # top-k by eigenvalue
    flip = np.sign(comps[np.argmax(np.abs(comps), axis=0), np.arange(k)])
    flip[flip == 0] = 1.0
    comps = comps * flip
    ref = ray.put((mean, comps))

    class Project:
        def __init__(self):
            self.mean, self.comps = ray.get(ref)

        def __call__(self, batch: pa.Table) -> "pd.DataFrame":
            M = embed_matrix(batch, col).astype(np.float64)
            P = (M - self.mean) @ self.comps
            out = {id_col: batch.column(id_col).to_numpy()}
            for j in range(P.shape[1]):
                out[f"pc{j}"] = P[:, j]
            return pd.DataFrame(out)

    return emb.select_columns([id_col, col]).map_batches(
        Project, batch_format="pyarrow", concurrency=(1, 4)
    )


def label_centroids(
    emb: "rd.Dataset",
    label_col: str = "label",
    col: str = "embedding",
    scale: int = 10_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-label embedding centroids (class prototypes; one exact
    k-means assignment-step reduction): mean vector per label over a
    ``list<float>`` column. Values are quantized floor(x·scale) to
    int64 FIRST (the `embed_gram` trick), so the distributed sums are
    exact integers and the single double division s/(n·scale) rounds
    identically in every IEEE engine — hash-exact, unlike a float
    mean whose partial-sum order varies.

    Output: (label, dim, n_vecs, centroid), dim 1-based (matches SQL
    generate_subscripts). Scale shape: per-block [labels × D] integer
    moment matrix via argsort + np.add.reduceat (no per-row Python),
    ONE label-keyed exchange of labels×D tiny rows."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def partial(batch: pa.Table) -> pd.DataFrame:
        X = embed_matrix(batch, col).astype(np.float64)
        if not len(X):
            return pd.DataFrame(
                {
                    "label": pd.Series([], dtype="int64"),
                    "dim": pd.Series([], dtype="int64"),
                    "s": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        xq = np.floor(X * scale).astype(np.int64)
        lab = batch.column(label_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        order = np.argsort(lab, kind="stable")
        lab_s, xq_s = lab[order], xq[order]
        starts = np.flatnonzero(
            np.concatenate(([True], lab_s[1:] != lab_s[:-1]))
        )
        sums = np.add.reduceat(xq_s, starts, axis=0)
        counts = np.diff(np.append(starts, len(lab_s)))
        L, D = sums.shape
        return pd.DataFrame(
            {
                "label": np.repeat(lab_s[starts], D),
                "dim": np.tile(np.arange(1, D + 1, dtype=np.int64), L),
                "s": sums.ravel(),
                "n": np.repeat(counts, D).astype(np.int64),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["label", "dim"], as_index=False, sort=False)[
            ["s", "n"]
        ].sum()
        s = agg["s"].to_numpy(dtype=np.int64)
        n = agg["n"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "label": agg["label"].to_numpy(dtype=np.int64),
                "dim": agg["dim"].to_numpy(dtype=np.int64),
                "n_vecs": n,
                "centroid": s.astype(np.float64)
                / (n * scale).astype(np.float64),
            }
        )

    partials = emb.select_columns([label_col, col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return bucketed_group_reduce(
        partials, key_cols=["label", "dim"], reduce_fn=finish,
        num_buckets=num_buckets,
    )


def seed_centroid_matrix(
    emb: "rd.Dataset",
    k: int,
    scale: int,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
    """Deterministic seed centroids: the ``k`` smallest-id vectors,
    quantized to int64 (floor(x·scale)). The seed-id fetch is a
    k-bounded min-k semigroup combiner (every block shrinks to its
    local k before ONE 1-bucket reduce) + a broadcast-filter pull of
    exactly k rows — nothing V-sized leaves the workers. Returns
    (cids sorted asc, Cq [k, D] int64, ‖Cq‖² [k] int64); shared by
    :func:`kmeans_assign` and :func:`kgflow.ops.dedup.semdedup`."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def local_mink(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(k, id_col)[[id_col]].assign(_g=np.int64(0))

    seed_ids = (
        bucketed_group_reduce(
            emb.select_columns([id_col]).map_batches(
                local_mink, batch_format="pandas"
            ),
            key_cols=["_g"],
            reduce_fn=lambda g: g.nsmallest(k, id_col),
            num_buckets=1,
        )
        .to_pandas()[id_col]
        .to_numpy(dtype=np.int64)
    )
    sid_set = set(int(x) for x in seed_ids)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        m = np.isin(ids, np.array(sorted(sid_set), dtype=np.int64))
        return batch.filter(pa.array(m))

    seeds = emb.map_batches(pick, batch_format="pyarrow").to_pandas()
    seeds = seeds.sort_values(id_col)
    C = np.stack([np.asarray(v, dtype=np.float64) for v in seeds[col]])
    Cq = np.floor(C * scale).astype(np.int64)
    cids = seeds[id_col].to_numpy(dtype=np.int64)
    return cids, Cq, (Cq * Cq).sum(axis=1)


def kmeans_assign(
    emb: "rd.Dataset",
    k: int = 8,
    scale: int = 10_000,
    col: str = "embedding",
    id_col: str = "vec_id",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """One EXACT k-means assignment step (E-step) with deterministic
    seeds: centroids are the ``k`` smallest-id vectors, every vector's
    squared L2 distance to each centroid is computed in QUANTIZED
    int64 space (floor(x·scale), the `label_centroids`/`embed_gram`
    trick) so d² = Σ(xq−cq)² is exact integer arithmetic and the
    argmin is hash-identical in every engine — no float partial-sum
    noise. Returns (vec_id, centroid, d2); ties break to the smaller
    centroid id (np.argmin first-occurrence over id-sorted centroids
    ≡ SQL ORDER BY d2, cid).

    Scale shape: the seed fetch is a k-bounded min-k semigroup
    combiner (every block shrinks to its local k before ONE 1-bucket
    reduce) + a broadcast-filter pull of exactly k rows; assignment is
    a single streaming pass — per batch one int64 [B,D]×[D,k] matmul
    against the broadcast centroid matrix (expanded ‖x‖²+‖c‖²−2xc
    form), no exchange at all. int64 is safe while
    D·(2·scale·‖x‖∞)² < 2⁶³ — e.g. D=1024, scale=1e4, ‖x‖∞=10 →
    4·10¹³ per dim, 4·10¹⁶ summed."""
    import ray

    cids, Cq, c2 = seed_centroid_matrix(emb, k, scale, col=col, id_col=id_col)
    cref = ray.put((cids, Cq, c2))

    class Assign:
        def __init__(self):
            self.cids, self.Cq, self.c2 = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            X = embed_matrix(batch, col).astype(np.float64)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
                np.int64
            )
            if not len(X):
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "centroid": pa.array([], pa.int64()),
                        "d2": pa.array([], pa.int64()),
                    }
                )
            Xq = np.floor(X * scale).astype(np.int64)
            d2 = (
                (Xq * Xq).sum(axis=1)[:, None]
                + self.c2[None, :]
                - 2 * (Xq @ self.Cq.T)
            )
            j = np.argmin(d2, axis=1)  # first min = smallest cid
            return pa.table(
                {
                    "vec_id": pa.array(ids),
                    "centroid": pa.array(self.cids[j]),
                    "d2": pa.array(d2[np.arange(len(j)), j]),
                }
            )

    return emb.select_columns([id_col, col]).map_batches(
        Assign, batch_format="pyarrow", concurrency=(1, 4)
    )


def quantize_embeddings(
    emb: "rd.Dataset",
    id_col: str = "vec_id",
    col: str = "embedding",
    n_levels: int = 256,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-dimension scalar quantization of an embedding column into
    ``n_levels`` integer codes — the vector-compression pass a
    100-TB ANN store runs before indexing (4× smaller than float32 at
    256 levels; IVF/PQ pipelines start exactly here):
    code = floor((v − min_d) / (max_d − min_d) · (L−1)), computed per
    dimension against the GLOBAL per-dim min/max. Emits
    (vec_id, dim, code) with 1-based dim (SQL unnest convention).

    Deterministic across engines: min/max are pure selections over the
    stored float32 values (no arithmetic), and the code expression is
    evaluated in float64 on BOTH sides (engine: astype(float64); SQL:
    CAST AS DOUBLE) so IEEE gives bit-identical results — no epsilon
    comparisons. A constant dimension (max == min) codes to 0.

    Scale shape: pass 1 ships one (dim, min, max) row per block
    (constant in row count) → tiny dim-keyed reduce → broadcast via
    ``ray.put``; pass 2 is map-only vectorized [B, d] arithmetic."""
    import pandas as pd
    import ray

    from kgflow.ops.shuffle import bucketed_group_reduce

    def mm_partial(batch: pa.Table) -> pd.DataFrame:
        M = embed_matrix(batch, col)
        if M.shape[0] == 0:
            return pd.DataFrame(
                {
                    "dim": pd.Series([], dtype="int64"),
                    "mn": pd.Series([], dtype="float32"),
                    "mx": pd.Series([], dtype="float32"),
                }
            )
        return pd.DataFrame(
            {
                "dim": np.arange(1, M.shape[1] + 1, dtype=np.int64),
                "mn": M.min(axis=0),
                "mx": M.max(axis=0),
            }
        )

    def mm_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("dim", as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max")
        )

    stats = bucketed_group_reduce(
        emb.select_columns([col]).map_batches(mm_partial, batch_format="pyarrow"),
        key_cols=["dim"],
        reduce_fn=mm_reduce,
        num_buckets=num_buckets,
    ).to_pandas()  # dim-bounded pull (64 rows), never data rows
    stats = stats.sort_values("dim")
    mn = stats["mn"].to_numpy(dtype=np.float64)
    mx = stats["mx"].to_numpy(dtype=np.float64)
    ref = ray.put((mn, mx))

    def codes(batch: pa.Table) -> pd.DataFrame:
        lo, hi = ray.get(ref)
        M = embed_matrix(batch, col).astype(np.float64)
        ids = batch.column(id_col).to_numpy()
        if M.shape[0] == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "dim": pd.Series([], dtype="int64"),
                    "code": pd.Series([], dtype="int64"),
                }
            )
        span = hi - lo
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.floor((M - lo) / span * (n_levels - 1))
        c = np.where(span > 0, c, 0.0).astype(np.int64)
        n, d = M.shape
        return pd.DataFrame(
            {
                id_col: np.repeat(ids, d),
                "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), n),
                "code": c.reshape(-1),
            }
        )

    return emb.select_columns([id_col, col]).map_batches(
        codes, batch_format="pyarrow"
    )


def _kmeans_l2(X: np.ndarray, k: int, seed: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd k-means under L2 (PQ codebooks are Euclidean,
    unlike the spherical coarse quantizer): seeded init over the
    caller-sorted sample, fixed iteration count, empty clusters
    re-seeded to the farthest point — byte-identical codebooks for the
    same (rows, params) regardless of block arrival order."""
    rng = np.random.RandomState(seed)
    X = np.asarray(X, dtype=np.float32)
    k = min(k, len(X))
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
            else:  # deterministic re-seed: farthest point from its centroid
                C[j] = X[int(np.argmax(d2.min(axis=1)))]
    return C


def pq_encode(
    emb: "rd.Dataset",
    id_col: str = "vec_id",
    col: str = "embedding",
    n_subspaces: int = 8,
    n_codes: int = 16,
    sample_size: int = 2000,
    seed: int = 42,
) -> "rd.Dataset":
    """Product quantization (Jégou et al., TPAMI 2011) — the
    high-compression vector codec behind billion-scale ANN: split each
    vector into ``n_subspaces`` contiguous sub-vectors, train an L2
    k-means codebook of ``n_codes`` centroids per subspace on a
    bounded sample, and encode every vector as one code per subspace
    (64-dim float32 → 8 bytes at 8×16). Emits (vec_id, subspace,
    code), 1-based subspace.

    Deterministic: the training sample is pulled bounded and sorted by
    id (the `_train_centroids` rule — Ray block order is not stable),
    k-means is seeded with a fixed iteration count, so codes are
    byte-identical across runs and partitionings (property-tested).
    Approximate by design → rows-only gate, like the pruned IVF paths.

    Scale shape: training is sample-bounded driver work; codebooks
    broadcast once via ``ray.put`` ([S, K, d/S] floats); encoding is
    map-only — per batch ONE [B, d/S] × [d/S, K] matmul per subspace
    via the ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖² expansion (argmin over
    2x·c − ‖c‖², no [B, K, d] broadcast), no shuffle anywhere."""
    import pandas as pd

    sample = (
        emb.select_columns([id_col, col])
        .limit(sample_size)
        .to_pandas()
        .sort_values(id_col, kind="mergesort")
    )
    M = np.asarray(list(sample[col]), dtype=np.float32)
    d = M.shape[1]
    if d % n_subspaces:
        raise ValueError(f"pq_encode: dim {d} not divisible by {n_subspaces}")
    sub = d // n_subspaces
    books = np.stack(
        [
            _kmeans_l2(M[:, s * sub : (s + 1) * sub], n_codes, seed=seed + s)
            for s in range(n_subspaces)
        ]
    )  # [S, K, sub]
    ref = ray.put(books)

    class Encode:
        def __init__(self):
            self.books = ray.get(ref)
            # precompute per-subspace ||c||^2: [S, K]
            self.c2 = (self.books**2).sum(axis=2)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            X = embed_matrix(batch, col)
            ids = batch.column(id_col).to_numpy()
            n = X.shape[0]
            if n == 0:
                return pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype="int64"),
                        "subspace": pd.Series([], dtype="int64"),
                        "code": pd.Series([], dtype="int64"),
                    }
                )
            S, K, subd = self.books.shape
            codes = np.empty((n, S), dtype=np.int64)
            for s in range(S):
                Xs = X[:, s * subd : (s + 1) * subd]
                score = 2.0 * (Xs @ self.books[s].T) - self.c2[s]  # [B, K]
                codes[:, s] = np.argmax(score, axis=1)
            return pd.DataFrame(
                {
                    id_col: np.repeat(ids, S),
                    "subspace": np.tile(np.arange(1, S + 1, dtype=np.int64), n),
                    "code": codes.reshape(-1),
                }
            )

    return emb.select_columns([id_col, col]).map_batches(
        Encode, batch_format="pyarrow", concurrency=(1, 4)
    )


def pq_adc_topk(
    emb: "rd.Dataset",
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 5,
    n_subspaces: int = 8,
    n_codes: int = 16,
    sample_size: int = 2000,
    seed: int = 42,
    exclude_self: bool = True,
) -> "rd.Dataset":
    """PQ search via asymmetric distance computation (ADC, Jégou et
    al. 2011 §IV): queries stay float32, the database is scanned as PQ
    CODES, and each query's distance to a vector is a sum of S
    table lookups — d²(q, x) ≈ Σ_s LUT_q[s, code_s(x)] with
    LUT_q[s, j] = ‖q_s − c_sj‖² precomputed ONCE per query. At corpus
    scale this is the memory shape that matters: the scan touches
    8 bytes/vector instead of 256, and the per-batch work is a gather
    + sum, not a matmul. Output (query_id, neighbor_id, adc) with adc
    = the approximated squared L2 distance (smaller = closer); exactly
    k rows per query, ties broken (adc ASC, neighbor_id ASC).

    Approximate by design → rows-only gate; recall@k against the exact
    scan is pytest-pinned on the clustered fixture. Same codebook
    determinism as :func:`pq_encode` (sorted bounded sample, seeded
    fixed-iteration k-means); the merge reuses the partial-top-k +
    query-bucketed pattern of :func:`brute_force_topk`."""
    import pandas as pd

    from kgflow.ops.shuffle import bucketed_group_reduce

    sample = (
        emb.select_columns(["vec_id", "embedding"])
        .limit(sample_size)
        .to_pandas()
        .sort_values("vec_id", kind="mergesort")
    )
    M = np.asarray(list(sample["embedding"]), dtype=np.float32)
    d = M.shape[1]
    sub = d // n_subspaces
    books = np.stack(
        [
            _kmeans_l2(M[:, s * sub : (s + 1) * sub], n_codes, seed=seed + s)
            for s in range(n_subspaces)
        ]
    )  # [S, K, sub]
    Qm = np.asarray(query_matrix, dtype=np.float32)
    # LUT[q, s, j] = ||q_s - c_sj||^2
    S, K = books.shape[0], books.shape[1]
    lut = np.empty((len(Qm), S, K), dtype=np.float32)
    for s in range(S):
        qs = Qm[:, s * sub : (s + 1) * sub]  # [Q, sub]
        diff = qs[:, None, :] - books[s][None, :, :]  # [Q, K, sub]
        lut[:, s, :] = (diff**2).sum(axis=2)
    ref = ray.put((books, lut, list(query_ids)))

    class AdcTopK:
        def __init__(self):
            self.books, self.lut, self.qids = ray.get(ref)
            self.c2 = (self.books**2).sum(axis=2)  # [S, K]

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            X = embed_matrix(batch)
            ids = batch.column("vec_id").to_numpy()
            n = X.shape[0]
            if n == 0:
                return pd.DataFrame(
                    {
                        "query_id": pd.Series([], dtype="int64"),
                        "neighbor_id": pd.Series([], dtype="int64"),
                        "adc": pd.Series([], dtype="float64"),
                    }
                )
            S, K, subd = self.books.shape
            codes = np.empty((n, S), dtype=np.int64)
            for s in range(S):
                Xs = X[:, s * subd : (s + 1) * subd]
                codes[:, s] = np.argmax(
                    2.0 * (Xs @ self.books[s].T) - self.c2[s], axis=1
                )
            # gather-sum: [Q, n] ADC distances from S lookups
            Q = len(self.qids)
            dist = np.zeros((Q, n), dtype=np.float32)
            for s in range(S):
                dist += self.lut[:, s, codes[:, s]]
            kk = min(k + 1, n)  # +1 headroom for self-exclusion downstream
            part = np.argpartition(dist, kk - 1, axis=1)[:, :kk]
            rows = []
            for qi in range(Q):
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": np.int64(self.qids[qi]),
                            "neighbor_id": ids[part[qi]],
                            "adc": dist[qi, part[qi]].astype(np.float64),
                        }
                    )
                )
            return pd.concat(rows, ignore_index=True)

    partial = emb.select_columns(["vec_id", "embedding"]).map_batches(
        AdcTopK, batch_format="pyarrow", concurrency=(1, 4)
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            g = g[g["neighbor_id"] != g["query_id"]]
        g = g.sort_values(
            ["query_id", "adc", "neighbor_id"],
            ascending=[True, True, True],
            kind="mergesort",
        )
        out = g.groupby("query_id", as_index=False, sort=False).head(k)
        return out[["query_id", "neighbor_id", "adc"]].reset_index(drop=True)

    return bucketed_group_reduce(
        partial,
        key_cols=["query_id"],
        reduce_fn=merge_bucket,
        num_buckets=2 if len(query_ids) <= 16 else 8,
    )


class DualMetricTopK:
    """Actor-pool stage: ONE corpus pass scoring every batch against
    the broadcast query matrix under BOTH metrics — cosine (leg 0,
    float32 unit-norm matmul) and negative squared L2 (leg 1, float64
    expanded form, rank-stable vs a float64 SQL oracle) — emitting
    per-batch per-leg partial top-k as side-tagged rows
    (query_id, neighbor_id, score, leg). One pass instead of two, and
    the single tagged output feeds ONE exchange — deliberately NOT two
    datasets unioned downstream (the documented ray-2.49 shared-lineage
    union hazard: duplicated blocks + float-upcast exchange keys,
    `kgflow/ops/dedup.py:cross_minhash_pairs`)."""

    def __init__(self, queries_ref, k: int):
        self.qids, Qm = ray.get(queries_ref)
        Q32 = np.asarray(Qm, dtype=np.float32)
        self.Qcos = _unit(Q32).T  # [dim, Q]
        Q64 = np.asarray(Qm, dtype=np.float64)
        self.Ql2 = Q64.T
        self.qsq = (Q64 * Q64).sum(axis=1)  # [Q]
        self.k = k

    def _leg(self, S: np.ndarray, ids: np.ndarray, leg: int) -> pd.DataFrame:
        B, Q = S.shape
        k = min(self.k + 1, B)  # +1 to survive self-match removal
        top = np.argpartition(-S, k - 1, axis=0)[:k] if B > k else (
            np.tile(np.arange(B)[:, None], (1, Q))
        )
        rows = top.T.ravel()
        cols = np.repeat(np.arange(Q), top.shape[0])
        return pd.DataFrame(
            {
                "query_id": np.repeat(
                    np.asarray(self.qids, np.int64), top.shape[0]
                ),
                "neighbor_id": ids[rows],
                "score": S[rows, cols].astype(np.float64),
                "leg": np.full(len(rows), leg, dtype=np.int8),
            }
        )

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        M = embed_matrix(batch)
        ids = np.asarray(batch.column("vec_id").to_numpy(), dtype=np.int64)
        if len(ids) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=np.int64),
                    "neighbor_id": pd.Series([], dtype=np.int64),
                    "score": pd.Series([], dtype=np.float64),
                    "leg": pd.Series([], dtype=np.int8),
                }
            )
        Sc = _unit(M) @ self.Qcos
        X = np.asarray(M, dtype=np.float64)
        Sl = 2.0 * (X @ self.Ql2) - (X * X).sum(axis=1)[:, None] - self.qsq
        return pd.concat(
            [self._leg(Sc, ids, 0), self._leg(Sl, ids, 1)],
            ignore_index=True,
        )


def rrf_topk(
    emb: "rd.Dataset",
    query_ids: list[int],
    query_matrix: np.ndarray,
    k_each: int = 20,
    k_rrf: int = 60,
    top_k: int = 5,
    scale: int = 1_000_000,
    exclude_self: bool = True,
) -> "rd.Dataset":
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of a cosine
    retriever and an L2 retriever over the same embedding corpus: each
    leg contributes its global top ``k_each`` per query ranked by
    (closer-first, neighbor_id asc); a neighbor's fused score is
    Σ_legs scale // (k_rrf + rank_leg) — floor division, so the output
    is pure int64 and hash-exact vs SQL. Output:
    (query_id, neighbor_id, rrf, rank) — top_k per query by
    (rrf desc, neighbor_id asc).

    Scale shape: ONE corpus pass computes both metrics (DualMetricTopK
    actor pool holding the broadcast query matrix), per-batch partials
    shrink each leg to ≤ k_each+1 rows per query before the ONE tiny
    query-keyed exchange where per-leg global ranks and the fusion both
    happen in-bucket."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    ref = ray.put((list(query_ids), np.asarray(query_matrix, dtype=np.float32)))
    partial = emb.select_columns(["vec_id", "embedding"]).map_batches(
        DualMetricTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k_each},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def fuse(g: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            g = g[g["neighbor_id"] != g["query_id"]]
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype=np.int64),
                    "neighbor_id": pd.Series([], dtype=np.int64),
                    "rrf": pd.Series([], dtype=np.int64),
                    "rank": pd.Series([], dtype=np.int64),
                }
            )
        # both legs score closer-higher: one (-score, neighbor) sort
        # gives every leg's closest-first rank with the SQL tie rule
        g = g.assign(_n=-g["score"].to_numpy()).sort_values(
            ["query_id", "leg", "_n", "neighbor_id"], kind="mergesort"
        )
        # per-batch partials may repeat a (query, leg, neighbor): keep
        # the best occurrence before ranking
        g = g.drop_duplicates(["query_id", "leg", "neighbor_id"])
        r = (g.groupby(["query_id", "leg"], sort=False).cumcount() + 1).to_numpy()
        g = g[r <= k_each].assign(
            term=(scale // (k_rrf + r[r <= k_each])).astype(np.int64)
        )
        f = g.groupby(["query_id", "neighbor_id"], as_index=False)["term"].sum()
        f = f.rename(columns={"term": "rrf"}).astype(
            {"rrf": "int64", "query_id": "int64", "neighbor_id": "int64"}
        )
        f = f.sort_values(
            ["query_id", "rrf", "neighbor_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        f["rank"] = (f.groupby("query_id", sort=False).cumcount() + 1).astype(
            np.int64
        )
        return f[f["rank"] <= top_k].reset_index(drop=True)

    return bucketed_group_reduce(
        partial, key_cols=["query_id"], reduce_fn=fuse, num_buckets=2
    )


def random_projection(
    emb: "rd.Dataset",
    k: int = 16,
    quant: int = 10_000,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> "rd.Dataset":
    """Sparse sign random projection (Achlioptas 2003 / JL transform):
    project each embedding onto ``k`` ±1 directions whose signs derive
    from FNV-1a over the (input-dim, output-dim) index pair — no RNG
    state, so the projection matrix is replayable bit-for-bit by a SQL
    oracle (the hash-derived-parameter pattern shared with simhash).
    Inputs quantize FIRST (floor ×``quant`` int64 — the embed_centroids
    idiom), so every projected value is an exact integer sum. Output:
    (id, rp_dim 1-based, y) — int64; distances in the projected space
    approximate scaled L2 within JL bounds.

    Embarrassingly parallel: the sign matrix is built once per actor
    (dim×k, tiny); one [B, dim] × [dim, k] integer matmul per batch;
    NO exchange."""
    from kgflow.ops.sketch import _fnv1a_strings

    class Project:
        def __init__(self):
            self.S = None  # built lazily at first batch (needs dim)
            self.k = k

        def _signs(self, dim: int) -> np.ndarray:
            keys = np.array(
                [
                    f"{i}|{j}"
                    for i in range(1, dim + 1)
                    for j in range(1, self.k + 1)
                ],
                dtype=str,
            )
            h = _fnv1a_strings(keys).reshape(dim, self.k)
            return np.where((h & np.uint64(1)) == 1, 1, -1).astype(np.int64)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            M = embed_matrix(batch, col=col)
            ids = np.asarray(
                batch.column(id_col).to_numpy(), dtype=np.int64
            )
            if len(ids) == 0 or M.shape[1] == 0:
                return pd.DataFrame(
                    {
                        id_col: pd.Series([], dtype=np.int64),
                        "rp_dim": pd.Series([], dtype=np.int64),
                        "y": pd.Series([], dtype=np.int64),
                    }
                )
            if self.S is None:
                self.S = self._signs(M.shape[1])
            Xq = np.floor(
                np.asarray(M, dtype=np.float64) * quant
            ).astype(np.int64)
            Y = Xq @ self.S  # exact int64
            B = len(ids)
            return pd.DataFrame(
                {
                    id_col: np.repeat(ids, self.k),
                    "rp_dim": np.tile(
                        np.arange(1, self.k + 1, dtype=np.int64), B
                    ),
                    "y": Y.reshape(-1),
                }
            )

    return emb.select_columns([id_col, col]).map_batches(
        Project, batch_format="pyarrow", concurrency=(1, 4)
    )


def lsh_topk_hashed(
    emb: "rd.Dataset",
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 5,
    num_planes: int = 8,
    num_tables: int = 2,
    quant: int = 10000,
    exclude_self: bool = True,
) -> "rd.Dataset":
    """Sign-hyperplane LSH ANN whose CANDIDATE GENERATION is
    integer-exact and therefore replayable bit-for-bit by a SQL engine
    (the `doc_simhash_pairs` exact-in-SQL strategy applied to ANN):
    hyperplane directions are ±1 vectors derived from FNV-1a over the
    composed key "dim|plane|table" (all 1-based — the
    `random_projection` sign trick), embeddings quantize as
    floor(float64(x)·quant) int64, and a signature bit is the sign of
    an exact integer dot product — no float matmul anywhere before the
    candidate set is fixed. Sign-LSH is norm-invariant, so skipping
    normalization changes nothing semantically. A vector is a candidate
    if ANY of its per-table signatures collides with ANY query's bucket
    (union semantics, like `lsh_topk`); candidates are then reranked by
    exact cosine via `brute_force_topk`. Recall < 1 by construction,
    but engine and oracle agree exactly because they run the SAME
    candidate rule."""
    from kgflow.ops.sketch import _fnv1a_strings

    Qm = np.asarray(query_matrix, dtype=np.float32)
    dim = Qm.shape[1]
    keys = np.array(
        [
            f"{i}|{p}|{t}"
            for i in range(1, dim + 1)
            for t in range(1, num_tables + 1)
            for p in range(1, num_planes + 1)
        ],
        dtype=str,
    )
    h = _fnv1a_strings(keys).reshape(dim, num_tables * num_planes)
    S = np.where((h & np.uint64(1)) == 1, 1, -1).astype(np.int64)

    def signatures(M: np.ndarray) -> np.ndarray:
        """[n, dim] float → [n, num_tables] int64 bucket ids
        (table index in the high bits so buckets never collide
        across tables)."""
        Xq = np.floor(np.asarray(M, dtype=np.float64) * quant).astype(
            np.int64
        )
        bits = (Xq @ S) > 0  # exact integer sign
        out = np.zeros((len(M), num_tables), dtype=np.int64)
        for t in range(num_tables):
            key = np.zeros(len(M), dtype=np.int64)
            for p in range(num_planes):
                key |= bits[:, t * num_planes + p].astype(np.int64) << p
            out[:, t] = key + ((t + 1) << 32)
        return out

    q_buckets = np.unique(signatures(Qm).reshape(-1))
    bref = ray.put(q_buckets)

    class Filter:
        def __init__(self):
            self.buckets = ray.get(bref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            M = embed_matrix(batch)
            if len(M) == 0:
                return batch
            sig = signatures(M)
            keep = np.zeros(len(M), dtype=bool)
            for t in range(sig.shape[1]):
                keep |= np.isin(sig[:, t], self.buckets)
            return batch.filter(pa.array(keep))

    filtered = emb.select_columns(["vec_id", "embedding"]).map_batches(
        Filter, batch_format="pyarrow", concurrency=(1, 4)
    )
    return brute_force_topk(
        filtered, query_ids, Qm, k=k, exclude_self=exclude_self
    )


def power_iteration_scatter(
    emb: "rd.Dataset",
    iters: int = 400,
    quant: int = 100,
    col: str = "embedding",
) -> "rd.Dataset":
    """Dominant eigenvector of the QUANTIZED uncentered scatter matrix
    XᵀX by exact-integer power iteration — the SQL-checkable corner of
    the PCA family (`embedding_pca` itself is float-eigh and stays
    rows-only; this pins the same heavy distributed pass — the moment
    partials — under a hash-exact gate, the `ann_ivf_exact` pattern).

    Every step is integer arithmetic a recursive-CTE SQL oracle
    replays bit-for-bit: x quantizes as floor(float64(x)·quant);
    A = Σ_vec xq xqᵀ accumulates in int64 via CONSTANT-size per-block
    partials (dim² ints, independent of rows — the `embedding_pca`
    moment layout); v₀ = 1⃗; each iteration computes w = A·v in int64
    then rescales by an ARITHMETIC right shift of
    4·max(digits₁₀(max|w|) − 6, 0) bits (numpy ``>>`` and SQL ``>>``
    are both floor shifts; the digit count is exact on both sides,
    unlike float log2). Magnitudes stay ≲10⁷ so w ≤ 64·|A|·10⁷ fits
    int64 for corpora up to ~10⁹ rows at quant=100. Convergence to the
    true eigenvector is a property TEST, not a correctness condition —
    the contract is "this exact recurrence", which both engine and
    oracle run (the default 400 iterations covers eigengaps down to
    ~1.01; each step is a 64-element list op in the CTE, so the oracle
    stays cheap). Returns (i, v) — 1-based dim index, final iterate."""
    import pandas as pd

    def scatter(batch: pa.Table) -> pd.DataFrame:
        M = embed_matrix(batch, col)
        if len(M) == 0:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=object),
                    "d": pd.Series([], dtype=np.int64),
                }
            )
        Xq = np.floor(np.asarray(M, dtype=np.float64) * quant).astype(
            np.int64
        )
        A = Xq.T @ Xq
        return pd.DataFrame(
            {"a": [A.tobytes()], "d": [A.shape[0]]}
        )

    parts = (
        emb.select_columns([col])
        .map_batches(scatter, batch_format="pyarrow")
        .to_pandas()
    )  # one constant-size row per block
    if not len(parts):
        raise ValueError("power_iteration_scatter: empty input dataset")
    d = int(parts["d"].iloc[0])
    A = np.zeros((d, d), dtype=np.int64)
    for buf in parts["a"]:
        A += np.frombuffer(buf, dtype=np.int64).reshape(d, d)

    a_max = int(np.abs(A).max())
    v = np.ones(d, dtype=np.int64)
    for _ in range(iters):
        # int64 wraps silently in numpy — fail loudly before it can
        if a_max and int(np.abs(v).max()) > (2**62) // (a_max * d):
            raise OverflowError(
                "power_iteration_scatter: |A|·|v|·d would exceed int64 "
                f"(a_max={a_max}, d={d}); lower `quant`"
            )
        w = A @ v
        m = int(np.abs(w).max())
        s = 4 * max(len(str(m)) - 6, 0)
        v = w >> s

    return rd.from_pandas(
        pd.DataFrame(
            {"i": np.arange(1, d + 1, dtype=np.int64), "v": v}
        )
    )


def int8_topk(
    emb: "rd.Dataset",
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 5,
    quant: int = 100,
    exclude_self: bool = True,
) -> "rd.Dataset":
    """Quantized maximum-inner-product top-k: embeddings and queries
    quantize to int8-range integers (floor(float64(x)·quant)) and the
    score is the EXACT integer dot product — the int8-dot-product ANN
    deployment shape (4× memory + SIMD-int dots vs float32), with the
    bonus that ranking, ties and the score column itself are
    bit-reproducible on any engine: the SQL oracle checks scores
    verbatim, with none of the last-ulp float-cosine risk the cosine
    oracles carry. Tie order: score DESC, neighbor_id DESC.

    Scale shape: per-batch integer matmul + per-batch top-k, then the
    standard tiny query-bucketed merge — (#batches × Q × k) rows, no
    full-corpus exchange."""
    import pandas as pd

    from kgflow.ops.shuffle import bucketed_group_reduce

    Qq = np.floor(
        np.asarray(query_matrix, dtype=np.float64) * quant
    ).astype(np.int64)
    ref = ray.put((list(query_ids), Qq))

    class Partial:
        def __init__(self):
            self.qids, self.Q = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pd.DataFrame:
            M = embed_matrix(batch)
            ids = np.asarray(
                batch.column("vec_id").to_numpy(), dtype=np.int64
            )
            if len(ids) == 0:
                return pd.DataFrame(
                    {
                        "query_id": pd.Series([], dtype=np.int64),
                        "neighbor_id": pd.Series([], dtype=np.int64),
                        "score": pd.Series([], dtype=np.int64),
                    }
                )
            Xq = np.floor(
                np.asarray(M, dtype=np.float64) * quant
            ).astype(np.int64)
            S = Xq @ self.Q.T  # [n, Q] exact int64
            kk = min(k + (1 if exclude_self else 0), len(ids))
            # per-query partial top-k via argpartition, ties resolved
            # in the merge (the partial only needs a superset)
            rows_q, rows_n, rows_s = [], [], []
            for j, qid in enumerate(self.qids):
                col = S[:, j]
                idx = np.argpartition(-col, kk - 1)[:kk]
                # keep every row tied with the kk-th score so the
                # partial is a true superset under the tie rule
                # (score DESC, neighbor_id DESC) — argpartition alone
                # drops tied candidates arbitrarily
                idx = np.nonzero(col >= col[idx].min())[0]
                rows_q.append(np.full(len(idx), qid, dtype=np.int64))
                rows_n.append(ids[idx])
                rows_s.append(col[idx])
            return pd.DataFrame(
                {
                    "query_id": np.concatenate(rows_q),
                    "neighbor_id": np.concatenate(rows_n),
                    "score": np.concatenate(rows_s),
                }
            )

    partial = emb.select_columns(["vec_id", "embedding"]).map_batches(
        Partial, batch_format="pyarrow", concurrency=(1, 4)
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            g = g[g["neighbor_id"] != g["query_id"]]
        g = g.sort_values(
            ["query_id", "score", "neighbor_id"],
            ascending=[True, False, False],
            kind="mergesort",
        )
        out = g.groupby("query_id", as_index=False, sort=False).head(k)
        return out.reset_index(drop=True)

    return bucketed_group_reduce(
        partial,
        key_cols=["query_id"],
        reduce_fn=merge,
        num_buckets=2 if len(query_ids) <= 16 else 8,
    )
