"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``) and every batch does ONE numpy matmul against it, emitting
per-batch partial top-k; a final tiny groupby-per-query merge yields the
global top-k. Scale path: LSH-bucketed variant (queries only scan
candidate buckets; recall < 1 traded for bucket-local work).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _unit(M: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1
    return M / n


class BruteForceTopK:
    """Actor-pool stage: holds the broadcast query matrix; per batch one
    [B, dim] × [dim, Q] matmul + per-batch top-k."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref)  # (query_ids [Q], matrix [Q, dim])
        self.qids, Qm = q
        self.Q = _unit(np.asarray(Qm, dtype=np.float32)).T  # [dim, Q]
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        M = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float32)
        ids = batch.column("vec_id").to_numpy()
        S = _unit(M) @ self.Q  # [B, Q]
        k = min(self.k + 1, len(ids))  # +1 to survive self-match removal
        o_q, o_n, o_s = [], [], []
        for qi, qid in enumerate(self.qids):
            col = S[:, qi]
            top = np.argpartition(-col, k - 1)[:k] if len(col) > k else np.arange(len(col))
            for t in top:
                o_q.append(int(qid))
                o_n.append(int(ids[t]))
                o_s.append(float(col[t]))
        return pa.table(
            {
                "query_id": pa.array(o_q, pa.int64()),
                "neighbor_id": pa.array(o_n, pa.int64()),
                "cos": pa.array(o_s, pa.float64()),
            }
        )


def brute_force_topk(
    emb: "rd.Dataset",
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 5,
    exclude_self: bool = True,
) -> "rd.Dataset":
    """Global top-k cosine neighbors per query. Output:
    (query_id, neighbor_id, cos) — exactly k rows per query."""
    ref = ray.put((list(query_ids), np.asarray(query_matrix, dtype=np.float32)))
    partial = emb.select_columns(["vec_id", "embedding"]).map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": ref, "k": k},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        qid = int(g["query_id"].iloc[0])
        rows = list(zip(g["cos"], g["neighbor_id"]))
        if exclude_self:
            rows = [r for r in rows if int(r[1]) != qid]
        top = heapq.nlargest(k, rows)
        return pd.DataFrame(
            {
                "query_id": [qid] * len(top),
                "neighbor_id": [int(n) for _, n in top],
                "cos": [float(c) for c, _ in top],
            }
        )

    return partial.groupby("query_id").map_groups(merge, batch_format="pandas")


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
            self.qids, self.Q, self.buckets = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            M = np.asarray(batch.column("embedding").to_pylist(), dtype=np.float32)
            if len(M) == 0:
                return pa.table(
                    {"vec_id": pa.array([], pa.int64()),
                     "embedding": pa.array([], pa.list_(pa.float32()))}
                )
            keep = np.zeros(len(M), dtype=bool)
            for arr in qkeys(_unit(M)):
                keep |= np.fromiter(
                    (int(x) in self.buckets for x in arr), dtype=bool, count=len(arr)
                )
            return batch.filter(pa.array(keep))

    filtered = emb.select_columns(["vec_id", "embedding"]).map_batches(
        Filter, batch_format="pyarrow", concurrency=(1, 4)
    )
    return brute_force_topk(
        filtered, query_ids, query_matrix, k=k, exclude_self=exclude_self
    )
