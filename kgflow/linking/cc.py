"""Connected components by iterated min-label propagation on Ray Data.

North-rule canonicalization stage (no reference counterpart — OpenUE
emits raw surface triples only). Classic map-reduce CC (cf. PAPERS.md:
"connected components in map-reduce in logarithmic rounds"): every node
starts labeled with itself; each round every node sends its current
label to its neighbors and takes the min of what it hears; stop when no
label changes. Rounds = graph diameter (alias clusters here have
diameter ≤ 3); for web-scale graphs swap the propagation body for
hash-to-min / large-star-small-star — the shuffle skeleton is identical.

Implementation notes (both measured, see kgflow/ops/shuffle.py):
- every round is TWO bucketed shuffles on the node key — propagate
  (in-bucket vectorized pandas merge of labels onto co-partitioned
  edges) and reduce (in-bucket groupby-min). Per-node ``map_groups``
  was ~40× slower and made CC the pipeline's hang point;
- convergence is detected with a cheap global aggregate: labels only
  ever decrease, so an unchanged label hash-sum ⇒ fixpoint — no
  driver-side materialization of the node set.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from kgflow.ops.shuffle import bucketed_group_reduce


def connected_components(
    edges: "rd.Dataset", max_rounds: int = 30, num_buckets: int = 32
) -> "rd.Dataset":
    """edges(src: str, dst: str) → (node: str, comp: str).

    Every node that appears in an edge gets a component; pass self-edges
    (m, m) for singleton nodes. Undirectedness is handled here (edges
    are mirrored once).
    """

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

    edge_rows = und.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["src"], "dst": df["dst"], "comp": None, "is_label": 0}
        ),
        batch_format="pandas",
    ).materialize()

    prev_sig = None
    for _ in range(max_rounds):
        lab_rows = lab.map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": df["node"],
                    "dst": [None] * len(df),
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
    return lab
