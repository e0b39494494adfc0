"""Connected components by iterated min-label propagation on Ray Data.

North-rule canonicalization stage (no reference counterpart — OpenUE
emits raw surface triples only). Classic map-reduce CC (cf. PAPERS.md:
"connected components in map-reduce in logarithmic rounds"): every node
starts labeled with itself; each round every node sends its current
label to its neighbors and takes the min of what it hears; stop when no
label changes. Rounds = graph diameter (alias clusters here have
diameter ≤ 3); for web-scale graphs swap the propagation body for
hash-to-min / large-star-small-star — the shuffle skeleton (union +
groupby per round) is identical.

Each round costs two hash shuffles on the node key. Convergence is
detected with a cheap global aggregate (labels only ever decrease, so an
unchanged label-sum ⇒ fixpoint) — no driver-side materialization of the
node set.
"""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def _propagate(g: pd.DataFrame) -> pd.DataFrame:
    """Group = one node's label row(s) + its outgoing edges.
    Emits (node=dst, comp=my_label) messages plus (node=me, comp=my_label)."""
    lab = g.loc[g["dst"].isna(), "comp"]
    if len(lab) == 0:  # dangling dst with no label row yet: keep edges' targets
        my = None
    else:
        my = lab.min()
    out_nodes, out_comp = [], []
    me = g["node"].iloc[0]
    if my is not None:
        out_nodes.append(me)
        out_comp.append(my)
        for d in g["dst"].dropna():
            out_nodes.append(d)
            out_comp.append(my)
    return pd.DataFrame({"node": out_nodes, "comp": out_comp})


def _min_comp(g: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({"node": [g["node"].iloc[0]], "comp": [g["comp"].min()]})


def connected_components(
    edges: "rd.Dataset", max_rounds: int = 30
) -> "rd.Dataset":
    """edges(src: str, dst: str) → (node: str, comp: str).

    Every node that appears as src gets a component; pass self-edges
    (m, m) for singleton nodes. Undirectedness is handled here (edges are
    mirrored once).
    """

    def _mirror(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": pd.concat([df["src"], df["dst"]], ignore_index=True),
                "dst": pd.concat([df["dst"], df["src"]], ignore_index=True),
            }
        )

    und = edges.map_batches(_mirror, batch_format="pandas")
    # labels := min(self, neighbors) as round 0 (self included explicitly)
    lab = (
        und.map_batches(
            lambda df: pd.DataFrame(
                {
                    "node": pd.concat([df["src"], df["src"]], ignore_index=True),
                    "comp": pd.concat([df["src"], df["dst"]], ignore_index=True),
                }
            ),
            batch_format="pandas",
        )
        .groupby("node")
        .map_groups(_min_comp, batch_format="pandas")
        .materialize()
    )
    edge_rows = und.map_batches(
        lambda df: pd.DataFrame({"node": df["src"], "dst": df["dst"]}),
        batch_format="pandas",
    ).materialize()

    prev_sig = None
    for _ in range(max_rounds):
        lab_rows = lab.map_batches(
            lambda df: pd.DataFrame(
                {"node": df["node"], "dst": [None] * len(df), "comp": df["comp"]}
            ),
            batch_format="pandas",
        )
        msgs = (
            edge_rows.map_batches(
                lambda df: df.assign(comp=[None] * len(df)), batch_format="pandas"
            )
            .union(lab_rows)
            .groupby("node")
            .map_groups(_propagate, batch_format="pandas")
        )
        lab = (
            msgs.groupby("node").map_groups(_min_comp, batch_format="pandas").materialize()
        )
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
