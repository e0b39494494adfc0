"""Connected components on Ray Data: min-label propagation (default)
and log-round alternating star contraction.

North-rule canonicalization stage (no reference counterpart — OpenUE
emits raw surface triples only). Two algorithms behind one signature:

- ``minlabel`` (default): every node starts labeled with itself; each
  round every node sends its current label to its neighbors and takes
  the min of what it hears. Rounds = eccentricity of each component's
  min node — right for the alias clusters this engine links (diameter
  ≤ 3, tested), wrong for web-scale near-dup chains.
- ``star``: alternating large-star / small-star contraction (Kiveris
  et al., "Connected Components in MapReduce and Beyond", MapR'14 —
  public algorithm, reimplemented from the paper's description): each
  round rewires every node's strictly-larger neighbors (large-star),
  then its ≤ neighbors (small-star), onto the neighborhood minimum.
  Converges in O(log n) rounds on ANY topology — the scale path for
  long chains (a 64-node path converges in ~5 rounds vs 63).

Implementation notes (both measured, see kgflow/ops/shuffle.py):
- every round is bucketed shuffles on the node key with in-bucket
  VECTORIZED pandas kernels (merge / transform-min). Per-node
  ``map_groups`` was ~40× slower and made CC the pipeline hang point;
- convergence is detected with a cheap global aggregate (an
  order-independent hash-sum signature of the state) — no driver-side
  materialization of the node or edge set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from kgflow.ops.shuffle import bucketed_group_reduce


#: edge-count ceiling for the driver-resident fast path (the
#: `kgflow.ops.graph.NODE_BROADCAST_LIMIT` precedent, applied to E):
#: below it, log-ROUND beats nothing — every distributed round is a
#: full sort barrier (~1s of orchestration at any size), while a
#: vectorized Shiloach-Vishkin pass over 2M in-memory edges is
#: milliseconds. Above it, the shuffling algorithms take over.
EDGE_DRIVER_LIMIT = 2_000_000


def connected_components(
    edges: "rd.Dataset",
    max_rounds: int = 30,
    num_buckets: int = 32,
    algorithm: str = "minlabel",
    stats: dict | None = None,
    driver_limit: int = EDGE_DRIVER_LIMIT,
) -> "rd.Dataset":
    """edges(src, dst) → (node, comp); node type is GENERIC — str or
    int64 both work end-to-end (every kernel is dtype-preserving; no
    object upcast, no string formatting), and int64 nodes shuffle ~2-3×
    fewer bytes per round, so id-keyed callers should pass ints raw.

    Every node that appears in an edge gets a component; pass self-edges
    (m, m) for singleton nodes. Undirectedness is handled here (edges
    are mirrored once). ``algorithm``: "minlabel" (rounds = diameter)
    or "star" (rounds = O(log n)); identical output. ``stats`` (if
    given) receives {"rounds": N, "algorithm": ...}.

    Edge sets at or below ``driver_limit`` rows take a driver-resident
    vectorized Shiloach-Vishkin fast path (min-hooking + pointer
    jumping — the k_core/pagerank small-graph precedent; O(log V)
    numpy rounds, no shuffle barriers, identical min-label output);
    pass ``driver_limit=0`` to force the distributed rounds. The probe
    materializes the edge set once — both distributed algorithms
    materialize their (mirrored) edge state anyway, so the distributed
    path pays at most one extra E-bounded block set, never a driver
    pull."""
    if driver_limit > 0:
        edges = edges.materialize()
        if edges.count() <= driver_limit:
            return _cc_driver(edges, stats)
    if algorithm == "star":
        return _cc_star(edges, max_rounds, num_buckets, stats)
    if algorithm != "minlabel":
        raise ValueError(f"unknown CC algorithm: {algorithm!r}")

    def _mirror(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": pd.concat([df["src"], df["dst"]], ignore_index=True),
                "dst": pd.concat([df["dst"], df["src"]], ignore_index=True),
            }
        )

    und = edges.map_batches(_mirror, batch_format="pandas").materialize()

    # round 0: label := min(self, neighbors)
    def _init_reduce(g: pd.DataFrame) -> pd.DataFrame:
        both = pd.DataFrame(
            {
                "node": pd.concat([g["src"], g["src"]], ignore_index=True),
                "comp": pd.concat([g["src"], g["dst"]], ignore_index=True),
            }
        )
        return both.groupby("node", as_index=False).agg(comp=("comp", "min"))

    lab = bucketed_group_reduce(
        und, key_cols=["src"], reduce_fn=_init_reduce, num_buckets=num_buckets
    ).materialize()

    def _propagate(g: pd.DataFrame) -> pd.DataFrame:
        """One bucket = a node-subset's label rows + its outgoing edges
        (co-partitioned on the node key). Vectorized: merge labels onto
        edges, emit (dst, label) messages plus (node, label)."""
        labels = g[g["is_label"] == 1][["node", "comp"]]
        e = g[g["is_label"] == 0][["node", "dst"]]
        msgs = e.merge(labels, on="node", how="inner")
        return pd.DataFrame(
            {
                "node": pd.concat([labels["node"], msgs["dst"]], ignore_index=True),
                "comp": pd.concat([labels["comp"], msgs["comp"]], ignore_index=True),
            }
        )

    def _min_reduce(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False).agg(comp=("comp", "min"))

    # placeholder columns carry a same-typed dummy value (never read for
    # that side) instead of None: None would force object dtype and break
    # int64 node ids — CC is generic over str AND int64 nodes
    edge_rows = und.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["src"], "dst": df["dst"], "comp": df["src"], "is_label": 0}
        ),
        batch_format="pandas",
    ).materialize()

    prev_sig = None
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        lab_rows = lab.map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"],
                    "dst": df["node"],
                    "comp": df["comp"],
                    "is_label": 1,
                }
            ),
            batch_format="pandas",
        )
        msgs = bucketed_group_reduce(
            edge_rows.union(lab_rows),
            key_cols=["node"],
            reduce_fn=_propagate,
            num_buckets=num_buckets,
        )
        lab = bucketed_group_reduce(
            msgs, key_cols=["node"], reduce_fn=_min_reduce, num_buckets=num_buckets
        ).materialize()
        # labels only decrease; identical hash-sum ⇒ fixpoint
        sig = lab.map_batches(
            lambda df: pd.DataFrame(
                {"h": [int(pd.util.hash_pandas_object(df["comp"]).sum() % (1 << 61))]}
            ),
            batch_format="pandas",
        ).sum("h")
        if sig == prev_sig:
            break
        prev_sig = sig
    if stats is not None:
        stats.update(rounds=rounds, algorithm="minlabel")
    return lab


def _pair_sig(ds: "rd.Dataset") -> int:
    """Order-independent signature of an edge set: sum of row hashes.
    Used only for fixpoint detection (max_rounds still bounds the
    loop, so a collision can at worst cost extra rounds... it cannot —
    a collision could only stop one round early; astronomically
    unlikely at 64 bits and acceptable for an idempotent contraction)."""
    return ds.map_batches(
        lambda df: pd.DataFrame(
            {
                "h": [
                    int(
                        pd.util.hash_pandas_object(
                            df[["src", "dst"]], index=False
                        ).sum()
                        % (1 << 61)
                    )
                ]
            }
        ),
        batch_format="pandas",
    ).sum("h")


def _cc_star(
    edges: "rd.Dataset",
    max_rounds: int = 30,
    num_buckets: int = 32,
    stats: dict | None = None,
) -> "rd.Dataset":
    """Alternating large-star / small-star contraction — O(log n)
    rounds on any topology.

    Per round, with m(v) = min(Γ(v) ∪ {v}) over the MIRRORED adjacency:
    - large-star: for every node v, emit (u, m(v)) for neighbors u > v;
    - small-star: emit (u, m(v)) for neighbors u ≤ v, plus (v, m(v)).
    Both keep every emitted edge inside v's component, and their union
    preserves connectivity (every original edge (v,u), u>v, is re-routed
    through m(v) by large-star from v's group). At the joint fixpoint
    the graph is a forest of stars rooted at each component's min node;
    labels then read off as min over the direct neighborhood.
    """

    def _mirror(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": pd.concat([df["src"], df["dst"]], ignore_index=True),
                "dst": pd.concat([df["dst"], df["src"]], ignore_index=True),
            }
        )

    def _star_reduce(large: bool):
        def _reduce(g: pd.DataFrame) -> pd.DataFrame:
            # m = min(neighbors ∪ self), vectorized per node; native dtype
            # (no object upcast) so int64 nodes stay int64 on every round
            gm = g.groupby("src")["dst"].transform("min")
            m = np.minimum(gm.to_numpy(), g["src"].to_numpy())
            if large:
                keep = (g["dst"] > g["src"]).to_numpy()
                out = pd.DataFrame({"src": g["dst"].to_numpy()[keep], "dst": m[keep]})
            else:
                keep = (g["dst"] <= g["src"]).to_numpy()
                nodes = ~g.duplicated("src").to_numpy()
                out = pd.DataFrame(
                    {
                        "src": np.concatenate(
                            [g["dst"].to_numpy()[keep], g["src"].to_numpy()[nodes]]
                        ),
                        "dst": np.concatenate([m[keep], m[nodes]]),
                    }
                )
            out = out[out["src"] != out["dst"]]
            # keep singletons alive as self-loops of the bucket's roots
            roots = pd.DataFrame({"src": np.unique(m), "dst": np.unique(m)})
            return pd.concat([out, roots], ignore_index=True).drop_duplicates()

        return _reduce

    cur = edges.materialize()
    prev_sig = None
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        for large in (True, False):
            cur = bucketed_group_reduce(
                cur.map_batches(_mirror, batch_format="pandas"),
                key_cols=["src"],
                reduce_fn=_star_reduce(large),
                num_buckets=num_buckets,
            ).materialize()
        sig = _pair_sig(cur)
        if sig == prev_sig:
            break
        prev_sig = sig
    if stats is not None:
        stats.update(rounds=rounds, algorithm="star")

    # converged star forest → labels: comp(v) = min(Γ(v) ∪ {v})
    def _labels(g: pd.DataFrame) -> pd.DataFrame:
        both = pd.DataFrame(
            {
                "node": pd.concat([g["src"], g["src"]], ignore_index=True),
                "comp": pd.concat([g["src"], g["dst"]], ignore_index=True),
            }
        )
        return both.groupby("node", as_index=False).agg(comp=("comp", "min"))

    return bucketed_group_reduce(
        cur.map_batches(_mirror, batch_format="pandas"),
        key_cols=["src"],
        reduce_fn=_labels,
        num_buckets=num_buckets,
    )


def _cc_driver(edges: "rd.Dataset", stats: dict | None) -> "rd.Dataset":
    """Driver-resident CC for E-bounded edge sets: vectorized
    Shiloach-Vishkin (min-hooking + full pointer jumping per round —
    the classic PRAM algorithm, O(log V) numpy rounds). Nodes map
    through np.unique, so code order == value order and the converged
    root of every tree is the component's MINIMUM node — byte-identical
    output to the distributed min-label/star rounds for str and int64
    nodes alike."""
    df = edges.to_pandas()
    if not len(df):
        if stats is not None:
            stats.update({"rounds": 0, "algorithm": "driver"})
        return rd.from_pandas(pd.DataFrame({"node": df["src"], "comp": df["src"]}))
    both = np.concatenate([df["src"].to_numpy(), df["dst"].to_numpy()])
    uniq, codes = np.unique(both, return_inverse=True)
    src_c, dst_c = codes[: len(df)], codes[len(df) :]
    parent = np.arange(len(uniq), dtype=np.int64)
    rounds = 0
    while True:
        rounds += 1
        pu, pv = parent[src_c], parent[dst_c]
        lo = np.minimum(pu, pv)
        before = parent.copy()
        # hook both endpoints' current roots onto the edge minimum
        np.minimum.at(parent, pu, lo)
        np.minimum.at(parent, pv, lo)
        # full pointer jumping: collapse every tree to a star
        while True:
            nxt = parent[parent]
            if np.array_equal(nxt, parent):
                break
            parent = nxt
        if np.array_equal(parent, before):
            break
    if stats is not None:
        stats.update({"rounds": rounds, "algorithm": "driver"})
    return rd.from_pandas(pd.DataFrame({"node": uniq, "comp": uniq[parent]}))
