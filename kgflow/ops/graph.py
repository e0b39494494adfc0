"""Iterative graph algorithms over (src, dst) edge datasets: PageRank.

The reference has no graph analytics (OpenUE stops at triple
extraction); this gives the constructed KG a first-class ranking
operator in the same family as `kgflow.linking.cc` (connected
components) — and it exercises the engine's iterative-computation
shape: a driver loop over FULLY distributed per-iteration passes.

Scale shape (per iteration, E = edges, V = nodes):
- the node-state table (node, outdeg, rank) is V-bounded and
  MATERIALIZED each iteration — iterative algorithms are the documented
  exception to "never materialize mid-pipeline": without pinning, Ray's
  lazy graph would re-execute the whole iteration chain once per
  consumer, turning O(iters) into O(iters²);
- the edge pass is ONE co-partitioned join of edges against the
  V-bounded weight table (`kgflow.ops.joins.hash_join` auto-selects
  broadcast while V fits, bucketed shuffle beyond) plus ONE
  dst-keyed bucketed sum-reduce — O(E) exchange, the PageRank floor;
- dangling mass (rank parked on nodes with no out-edges) folds to a
  scalar via a distributed filtered sum and redistributes uniformly,
  the standard Brin–Page correction, so ranks stay a probability
  distribution (asserted in tests).

Ranks are float64 and partial-sum order varies run to run, so outputs
carry ~1e-15 relative noise — callers that need cross-engine hashing
should quantize; the tests gate on tolerance vs a dense NumPy power
iteration instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from kgflow.ops.joins import hash_join
from kgflow.ops.shuffle import bucketed_group_reduce

#: node tables at or under this row count broadcast; larger co-partition.
NODE_BROADCAST_LIMIT = 2_000_000


def pagerank(
    edges: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    iters: int = 10,
    num_buckets: int | None = None,
    seeds: list | None = None,
) -> "rd.Dataset":
    """PageRank over a directed edge list. Returns (node, rank) with
    ranks summing to 1. With ``weight_col`` the walk follows edges in
    proportion to weight (evidence-weighted KG ranking); without it
    every edge row counts 1, so parallel rows add up either way.

    rank'(v) = (1-d)·p(v) + d * (Σ_{u→v} rank(u)·w(u→v)/outw(u) + dangling·p(v))

    ``seeds`` switches the teleport vector p from uniform (1/V,
    classic PageRank) to uniform over the seed set (PERSONALIZED
    PageRank — entity relatedness around a query set; Haveliwala
    2002): restarts and dangling mass land only on seeds. Seeds
    absent from the node universe are ignored (p normalizes over the
    present ones); the seed list is caller-bounded small and ships in
    the task closure."""
    keep = [src_col, dst_col] + ([weight_col] if weight_col else [])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df[src_col],
                "dst": df[dst_col],
                "ew": df[weight_col].astype("float64")
                if weight_col
                else np.ones(len(df)),
            }
        )

    e = edges.select_columns(keep).map_batches(
        prep, batch_format="pandas"
    ).materialize()

    # node universe = distinct(src) ∪ distinct(dst) with per-src
    # out-weight (out-degree when unweighted): combiner + one reduce
    def degree_partial(df: pd.DataFrame) -> pd.DataFrame:
        out_d = df.groupby("src", as_index=False)["ew"].sum()
        out_d.columns = ["node", "outw"]
        in_d = pd.DataFrame({"node": df["dst"].unique(), "outw": 0.0})
        return pd.concat([out_d, in_d], ignore_index=True)

    def degree_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["outw"].sum()
        out["outw"] = out["outw"].astype("float64")
        return out

    nodes = bucketed_group_reduce(
        e.map_batches(degree_partial, batch_format="pandas"),
        key_cols=["node"],
        reduce_fn=degree_final,
        num_buckets=num_buckets,
    ).materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda df: pd.DataFrame({"node": [], "rank": []}),
            batch_format="pandas",
        )
    small = n_nodes <= NODE_BROADCAST_LIMIT

    r0 = 1.0 / n_nodes
    seed_set = set(seeds) if seeds is not None else None
    if seed_set is not None and not small:
        # distributed path: count seeds present in the node universe
        n_seed = nodes.map_batches(
            lambda df: pd.DataFrame(
                {"s": [int(df["node"].isin(seed_set).sum())]}
            ),
            batch_format="pandas",
        ).sum("s")
        if not n_seed:
            raise ValueError("pagerank: no seed is present in the graph")
        p_seed = 1.0 / n_seed

    if small:
        # V-bounded driver-resident rank vector (the same documented
        # iterative-state exception as `bfs_hops`/`sssp_weighted`):
        # below NODE_BROADCAST_LIMIT the per-iteration Dataset joins +
        # materializes cost more Ray orchestration than the whole
        # numeric update — keep ONLY the E-bounded contribution pass
        # distributed (one broadcast-lookup map + one dst-keyed
        # reduce + one V-bounded pull per iteration). Measured: the
        # kg_pagerank driver query dropped ~25 s → ~13 s at sf0.01.
        import ray

        nd = nodes.to_pandas().sort_values("node")  # V-bounded pull
        node_ids = nd["node"].to_numpy()
        outw_v = nd["outw"].to_numpy(dtype=np.float64)
        if seed_set is not None:
            mask = np.isin(node_ids, list(seed_set))
            if not mask.any():
                raise ValueError(
                    "pagerank: no seed is present in the graph"
                )
            p_vec = mask.astype(np.float64) / mask.sum()
        else:
            p_vec = np.full(len(node_ids), r0, dtype=np.float64)
        rank = p_vec.copy()

        for _ in range(iters):
            dangling = float(rank[outw_v == 0.0].sum())
            w = np.where(outw_v > 0.0, rank / np.where(outw_v > 0.0, outw_v, 1.0), 0.0)
            w_ref = ray.put((node_ids, w))

            def contrib_partial(df: pd.DataFrame, _w=w_ref) -> pd.DataFrame:
                ids, wv = ray.get(_w)
                idx = np.searchsorted(ids, df["src"].to_numpy())
                c = df["ew"].to_numpy() * wv[idx]
                g = df.assign(c=c).groupby("dst", as_index=False)["c"].sum()
                g.columns = ["node", "contrib"]
                return g

            contrib = bucketed_group_reduce(
                e.map_batches(contrib_partial, batch_format="pandas"),
                key_cols=["node"],
                reduce_fn=lambda g: g.groupby("node", as_index=False)[
                    "contrib"
                ].sum(),
                num_buckets=num_buckets,
            ).to_pandas()  # V-bounded pull (iterative state)

            if seed_set is None:
                # keep the classic path's exact float expression (the
                # pinned dense-reference tests compare these values)
                base = (
                    (1.0 - damping) / n_nodes
                    + damping * dangling / n_nodes
                )
                rank = np.full(len(node_ids), base, dtype=np.float64)
            else:
                rank = ((1.0 - damping) + damping * dangling) * p_vec
            idx = np.searchsorted(node_ids, contrib["node"].to_numpy())
            rank[idx] += damping * contrib["contrib"].to_numpy(
                dtype=np.float64
            )

        return rd.from_pandas(
            pd.DataFrame({"node": node_ids, "rank": rank})
        )

    if seed_set is None:
        state = nodes.map_batches(
            lambda df: df.assign(rank=r0), batch_format="pandas"
        ).materialize()
    else:
        state = nodes.map_batches(
            lambda df: df.assign(
                rank=df["node"].isin(seed_set).to_numpy(dtype=np.float64)
                * p_seed
            ),
            batch_format="pandas",
        ).materialize()

    for _ in range(iters):
        # rank parked on dangling nodes, redistributed uniformly
        dangling = (
            state.map_batches(
                lambda df: pd.DataFrame(
                    {"s": [df.loc[df["outw"] == 0.0, "rank"].sum()]}
                ),
                batch_format="pandas",
            ).sum("s")
            or 0.0
        )

        def to_weight(df: pd.DataFrame) -> pd.DataFrame:
            d = df[df["outw"] > 0.0]
            return pd.DataFrame(
                {
                    "src": d["node"],
                    "w": d["rank"].to_numpy() / d["outw"].to_numpy(),
                }
            )

        weights = state.map_batches(to_weight, batch_format="pandas").materialize()
        contrib_rows = hash_join(e, weights, on="src", right_small=small)

        def contrib_partial(df: pd.DataFrame) -> pd.DataFrame:
            c = df["ew"].to_numpy() * df["w"].to_numpy()
            g = df.assign(c=c).groupby("dst", as_index=False)["c"].sum()
            g.columns = ["node", "contrib"]
            return g

        contrib = bucketed_group_reduce(
            contrib_rows.map_batches(contrib_partial, batch_format="pandas"),
            key_cols=["node"],
            reduce_fn=lambda g: g.groupby("node", as_index=False)["contrib"].sum(),
            num_buckets=num_buckets,
        ).materialize()

        base = (1.0 - damping) / n_nodes + damping * dangling / n_nodes

        def update(df: pd.DataFrame) -> pd.DataFrame:
            c = df["contrib"].astype("float64").fillna(0.0).to_numpy()
            if seed_set is None:
                b = base
            else:
                b = (
                    (1.0 - damping) + damping * dangling
                ) * df["node"].isin(seed_set).to_numpy(dtype=np.float64) * p_seed
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "outw": df["outw"].astype("float64"),
                    "rank": b + damping * c,
                }
            )

        state = (
            hash_join(
                nodes, contrib, on="node", how="left", right_small=small
            )
            .map_batches(update, batch_format="pandas")
            .materialize()
        )

    return state.map_batches(
        lambda df: df[["node", "rank"]], batch_format="pandas"
    )


def cooccurrence_edges(
    ds: "rd.Dataset",
    entity_col: str,
    cell_cols: list[str],
    max_cell: int = 10_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Entity co-occurrence graph: an undirected edge (u, v), u < v,
    for every pair of entities that share at least one cell (the
    distinct ``cell_cols`` tuple) — the standard interaction-graph
    builder (users co-active in the same hour, terms sharing a
    document, …).

    Scale shape: (entity, cell) pairs are deduped with a per-block
    combiner before ONE cell-keyed exchange; pair generation runs as a
    whole-bucket pandas self-merge (C kernel, no per-cell Python) and
    is quadratic in the CELL size only — a cell over ``max_cell``
    entities fails LOUDLY naming the cell (the LSH bucket-cap rule:
    a hot cell means the cell definition is too coarse, and silently
    emitting its n² pairs would OOM a worker at scale); the resulting
    (u, v) candidates dedup through one pair-keyed exchange.
    """

    cols = [entity_col, *cell_cols]

    def dedup(d: pd.DataFrame) -> pd.DataFrame:
        return d.drop_duplicates(cols)

    cells = bucketed_group_reduce(
        ds.select_columns(cols).map_batches(dedup, batch_format="pandas"),
        key_cols=cell_cols,
        reduce_fn=dedup,
        num_buckets=num_buckets,
    )

    def pairs(d: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            return pd.DataFrame(
                {
                    "u": pd.Series([], dtype=d[entity_col].dtype),
                    "v": pd.Series([], dtype=d[entity_col].dtype),
                }
            )
        sizes = d.groupby(cell_cols, sort=False)[entity_col].transform("size")
        if int(sizes.max()) > max_cell:
            hot = d.loc[sizes.idxmax(), cell_cols].to_dict()
            raise ValueError(
                f"cooccurrence_edges: cell {hot} has {int(sizes.max())} entities "
                f"(max_cell={max_cell}); refine cell_cols or raise the cap"
            )
        m = d.merge(d, on=cell_cols, suffixes=("_a", "_b"))
        ca, cb = f"{entity_col}_a", f"{entity_col}_b"
        m = m.loc[m[ca] < m[cb], [ca, cb]].rename(columns={ca: "u", cb: "v"})
        return m.drop_duplicates()

    candidates = cells.map_batches(pairs, batch_format="pandas")
    # a pair found in many cells must still appear once
    def pair_dedup(d: pd.DataFrame) -> pd.DataFrame:
        return d.drop_duplicates(["u", "v"])

    return bucketed_group_reduce(
        candidates.map_batches(pair_dedup, batch_format="pandas"),
        key_cols=["u", "v"],
        reduce_fn=pair_dedup,
        num_buckets=num_buckets,
    )


#: edge-row ceiling for the driver-resident triangle fast path: the
#: wedge set is O(E^1.5) (arboricity bound), so 100k edges caps the
#: in-memory wedge frame at ~3e7 rows. Above it, the distributed
#: wedge join takes over.
TRI_DRIVER_LIMIT = 100_000


def _tri_driver(edf: pd.DataFrame):
    """Driver-resident degree-oriented wedge count over a bounded
    (u, v) u<v distinct edge frame — identical orientation, wedge and
    closing-probe semantics to the distributed path, minus its ~8
    sort barriers. Returns (closed wedge frame [ctr, u, v], deg
    Series indexed by node)."""
    x = pd.concat([edf["u"], edf["v"]], ignore_index=True)
    deg = x.value_counts()
    du = deg.reindex(edf["u"]).to_numpy()
    dv = deg.reindex(edf["v"]).to_numpy()
    ua, va = edf["u"].to_numpy(), edf["v"].to_numpy()
    u_first = (du < dv) | ((du == dv) & (ua < va))
    d = pd.DataFrame(
        {"src": np.where(u_first, ua, va), "dst": np.where(u_first, va, ua)}
    )
    m = d.merge(d, on="src", suffixes=("_a", "_b"))
    m = m.loc[m["dst_a"] < m["dst_b"]]
    closed = m.merge(
        edf.rename(columns={"u": "dst_a", "v": "dst_b"}),
        on=["dst_a", "dst_b"],
    ).rename(columns={"src": "ctr", "dst_a": "u", "dst_b": "v"})
    return closed, deg


def triangle_count(
    edges: "rd.Dataset",
    num_buckets: int | None = None,
    driver_limit: int = TRI_DRIVER_LIMIT,
) -> "pd.DataFrame":
    """EXACT global triangle count over an undirected (u, v) edge set
    (u < v, distinct) — the classic degree-oriented wedge-join
    algorithm (each triangle counted once).

    Scale shape: degrees come from a per-block endpoint-count combiner
    + one vertex-keyed reduce (V-bounded, materialized for the two
    attach joins); every edge is then ORIENTED from its lower-
    (degree, id) endpoint to the higher, which bounds any vertex's
    out-degree by O(√E) on any graph — so the wedge set (out-neighbor
    pairs per source, generated by a whole-bucket self-merge) is
    O(E^1.5) worst-case instead of Σ deg², the standard arboricity
    argument; wedges then probe the original edge set through ONE
    co-partitioned (u, v)-keyed join, and matched rows fold to a
    per-block count → scalar sum. Returns a one-row (n_triangles)
    frame. Edge sets ≤ ``driver_limit`` rows run the same wedge count
    driver-resident (`_tri_driver`; the CC/k_core precedent — the
    O(E^1.5) wedge bound caps its memory); ``driver_limit=0`` forces
    the distributed path.
    """

    # The edge set is consumed THREE times (degree pass, degree-attach
    # join input, closing-edge probe); without a materialize each
    # consumer re-executes the whole upstream DAG (e.g. the
    # cooccurrence_edges exchanges) from scratch — measured 3× the
    # build cost at sf0.01 and ruinous against a 100-TB upstream.
    # E-bounded: the wedge-join algorithm requires the edge list to
    # fit the cluster anyway.
    edges = edges.select_columns(["u", "v"]).materialize()
    if driver_limit > 0 and edges.count() <= driver_limit:
        closed, _ = _tri_driver(edges.to_pandas())
        return pd.DataFrame([{"n_triangles": np.int64(len(closed))}])

    def deg_partial(d: pd.DataFrame) -> pd.DataFrame:
        x = pd.concat([d["u"], d["v"]], ignore_index=True)
        vc = x.value_counts()
        return pd.DataFrame({"x": vc.index, "deg": vc.to_numpy(dtype="int64")})

    def deg_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("x", as_index=False)["deg"].sum()
        out["deg"] = out["deg"].astype("int64")
        return out

    deg = bucketed_group_reduce(
        edges.map_batches(deg_partial, batch_format="pandas"),
        key_cols=["x"],
        reduce_fn=deg_final,
        num_buckets=num_buckets,
    ).materialize()  # V-bounded; reused by both attach joins

    du = deg.map_batches(
        lambda d: d.rename(columns={"x": "u", "deg": "_du"}), batch_format="pandas"
    )
    dv = deg.map_batches(
        lambda d: d.rename(columns={"x": "v", "deg": "_dv"}), batch_format="pandas"
    )
    with_deg = hash_join(
        hash_join(edges, du, on="u", num_buckets=num_buckets),
        dv,
        on="v",
        num_buckets=num_buckets,
    )

    def orient(d: pd.DataFrame) -> pd.DataFrame:
        # direct from lower (deg, id) to higher — total order, no ties
        u_first = (d["_du"] < d["_dv"]) | ((d["_du"] == d["_dv"]) & (d["u"] < d["v"]))
        src = d["u"].where(u_first, d["v"])
        dst = d["v"].where(u_first, d["u"])
        return pd.DataFrame({"src": src, "dst": dst})

    directed = with_deg.map_batches(orient, batch_format="pandas")

    def wedges(d: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            return pd.DataFrame(
                {
                    "u": pd.Series([], dtype=d["dst"].dtype),
                    "v": pd.Series([], dtype=d["dst"].dtype),
                }
            )
        m = d.merge(d, on="src", suffixes=("_a", "_b"))
        m = m.loc[m["dst_a"] < m["dst_b"], ["dst_a", "dst_b"]]
        return m.rename(columns={"dst_a": "u", "dst_b": "v"})

    wedge_ds = bucketed_group_reduce(
        directed, key_cols=["src"], reduce_fn=wedges, num_buckets=num_buckets
    )

    closed = hash_join(
        wedge_ds,
        edges.map_batches(lambda d: d.assign(_e=np.int64(1)), batch_format="pandas"),
        on=["u", "v"],
        num_buckets=num_buckets,
    )
    n = int(closed.count())
    return pd.DataFrame([{"n_triangles": np.int64(n)}])


def degree_histogram(
    edges: "rd.Dataset",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Degree distribution of an undirected (u, v) edge set: per-node
    degree via one node-keyed count, then the histogram (degree,
    n_nodes) — the first sanity plot of ANY graph build (power-law
    head, disconnected dust, an accidental clique from a bad blocking
    key all show up here before an expensive CC/PageRank pass).

    Scale shape: symmetrize + per-batch partial node counts (C
    kernels) shrink each block to its distinct endpoints before
    exchange 1 (node-keyed partial-count sum — a hub's rows spread
    across blocks but its bucket only ever sees count rows); exchange
    2 buckets on DEGREE and is output-bounded (≤ distinct degrees
    rows). Assumes edges are deduped with u < v (what
    `cooccurrence_edges` and the KG edge sink emit)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def endpoints(d: pd.DataFrame) -> pd.DataFrame:
        nodes = np.concatenate(
            [d["u"].to_numpy(dtype=np.int64), d["v"].to_numpy(dtype=np.int64)]
        )
        uniq, c = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": uniq, "c": c.astype(np.int64)})

    def sum_counts(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("node", as_index=False)["c"].sum()
        # emit bucket-local histogram partials: (degree, partial n)
        vc = agg["c"].value_counts()
        return pd.DataFrame(
            {
                "degree": vc.index.to_numpy(dtype=np.int64),
                "n_nodes": vc.to_numpy(dtype=np.int64),
            }
        )

    def sum_hist(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("degree", as_index=False)["n_nodes"].sum()

    per_node = bucketed_group_reduce(
        edges.select_columns(["u", "v"]).map_batches(
            endpoints, batch_format="pandas"
        ),
        key_cols=["node"],
        reduce_fn=sum_counts,
        num_buckets=num_buckets,
    )
    return bucketed_group_reduce(
        per_node, key_cols=["degree"], reduce_fn=sum_hist, num_buckets=num_buckets
    )


def item_pair_support(
    ds: "rd.Dataset",
    basket_col: str,
    item_col: str,
    max_basket: int = 10_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Market-basket pair support — the counting core of association
    rules (Agrawal–Srikant Apriori at k=2): for every unordered item
    pair, how many baskets contain BOTH, plus each item's basket count
    and the total basket count, so confidence(a→b) = n_ab/n_a and
    lift = n_ab·n_baskets/(n_a·n_b) are driver-side divisions over one
    hash-exact row.

    Output: (item_a, item_b, n_a, n_b, n_ab, n_baskets), item_a < item_b.

    Scale shape: (basket, item) pairs dedup through a per-block
    combiner, then ONE basket-keyed exchange emits a TAGGED UNION of
    partials — pair counts ('p', quadratic in the BASKET size only,
    guarded by ``max_basket`` exactly like `cooccurrence_edges`), item
    basket-counts ('i') and basket counts ('b'); baskets never span
    buckets, so every partial is disjoint. Exchange 2 sums partials per
    (kind, key) — item²-bounded rows — and a final single-bucket
    assembly joins the three kinds. No exchange ever carries basket
    contents twice, and nothing is pulled to the driver."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    cols = [basket_col, item_col]

    def dedup(d: pd.DataFrame) -> pd.DataFrame:
        return d.drop_duplicates(cols)

    EMPTY = pd.DataFrame(
        {
            "kind": pd.Series([], dtype="object"),
            "ka": pd.Series([], dtype="object"),
            "kb": pd.Series([], dtype="object"),
            "n": pd.Series([], dtype="int64"),
        }
    )

    def partials(d: pd.DataFrame) -> pd.DataFrame:
        d = d.drop_duplicates(cols)
        if not len(d):
            return EMPTY.copy()
        sizes = d.groupby(basket_col, sort=False)[item_col].transform("size")
        if int(sizes.max()) > max_basket:
            hot = d.loc[sizes.idxmax(), basket_col]
            raise ValueError(
                f"item_pair_support: basket {hot!r} has {int(sizes.max())} "
                f"items (max_basket={max_basket}); refine the basket key"
            )
        m = d.merge(d, on=basket_col, suffixes=("_a", "_b"))
        ca, cb = f"{item_col}_a", f"{item_col}_b"
        m = m.loc[m[ca] < m[cb], [ca, cb]]
        pair = m.groupby([ca, cb], sort=False, as_index=False).size()
        item = d.groupby(item_col, sort=False, as_index=False).size()
        out = pd.concat(
            [
                pd.DataFrame(
                    {
                        "kind": "p",
                        "ka": pair[ca].astype(object),
                        "kb": pair[cb].astype(object),
                        "n": pair["size"].to_numpy(dtype=np.int64),
                    }
                ),
                pd.DataFrame(
                    {
                        "kind": "i",
                        "ka": item[item_col].astype(object),
                        "kb": "",
                        "n": item["size"].to_numpy(dtype=np.int64),
                    }
                ),
                pd.DataFrame(
                    {
                        "kind": "b",
                        "ka": "",
                        "kb": "",
                        "n": np.array(
                            [d[basket_col].nunique()], dtype=np.int64
                        ),
                    }
                ),
            ],
            ignore_index=True,
        )
        return out

    def sum_partials(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["kind", "ka", "kb"], as_index=False)["n"].sum()

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["kind"] == "p"]
        i = g[g["kind"] == "i"].set_index("ka")["n"]
        nb = int(g.loc[g["kind"] == "b", "n"].sum())
        return pd.DataFrame(
            {
                "item_a": p["ka"].to_numpy(),
                "item_b": p["kb"].to_numpy(),
                "n_a": i.reindex(p["ka"]).to_numpy(dtype=np.int64),
                "n_b": i.reindex(p["kb"]).to_numpy(dtype=np.int64),
                "n_ab": p["n"].to_numpy(dtype=np.int64),
                "n_baskets": np.full(len(p), nb, dtype=np.int64),
            }
        )

    bi = ds.select_columns(cols).map_batches(dedup, batch_format="pandas")
    tagged = bucketed_group_reduce(
        bi, key_cols=[basket_col], reduce_fn=partials, num_buckets=num_buckets
    )
    summed = bucketed_group_reduce(
        tagged,
        key_cols=["kind", "ka", "kb"],
        reduce_fn=sum_partials,
        num_buckets=num_buckets,
    )

    def tag0(d: pd.DataFrame) -> pd.DataFrame:
        return d.assign(_g=np.int64(0))

    return bucketed_group_reduce(
        summed.map_batches(tag0, batch_format="pandas"),
        key_cols=["_g"],
        reduce_fn=assemble,
        num_buckets=1,
    )


def k_core(
    edges: "rd.Dataset",
    k: int = 2,
    max_rounds: int = 64,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """k-core decomposition by iterative peeling: repeatedly drop
    nodes with degree < k (and their edges) until a fixpoint — the
    standard dense-subgraph / spam-farm / nucleus extractor that runs
    BEFORE expensive community detection to shed the low-degree fringe.

    Returns the surviving nodes with their in-core degree
    (node, core_deg). Like `kgflow.linking.cc`, this is an inherently
    iterative algorithm (documented exception to no-mid-pipeline
    materialization): per round ONE degree exchange + one broadcast-or-
    shuffle semi-join of the E-bounded edge set against the surviving
    V-bounded node set; round count is peel-depth-bounded with a loud
    ``max_rounds`` stop. Each round's edge set materializes (consumed
    by the next round AND the convergence count)."""
    from kgflow.ops.joins import semi_join
    from kgflow.ops.shuffle import bucketed_group_reduce

    def deg_partial(d: pd.DataFrame) -> pd.DataFrame:
        x = np.concatenate(
            [d["u"].to_numpy(dtype=np.int64), d["v"].to_numpy(dtype=np.int64)]
        )
        uniq, c = np.unique(x, return_counts=True)
        return pd.DataFrame({"node": uniq, "deg": c.astype(np.int64)})

    def deg_final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False)["deg"].sum()

    cur = edges.select_columns(["u", "v"]).materialize()
    n_edges = cur.count()

    # small-V fast path (the pagerank/bfs driver-resident-state
    # precedent): per round ONE broadcast endpoint filter + ONE degree
    # reduce + a V-bounded pull, instead of two semi-joins with their
    # distinct-reduce and decision-count probes (~8 stages → ~3).
    deg0 = bucketed_group_reduce(
        cur.map_batches(deg_partial, batch_format="pandas"),
        key_cols=["node"],
        reduce_fn=deg_final,
        num_buckets=num_buckets,
    ).to_pandas()  # V-bounded pull
    if len(deg0) <= NODE_BROADCAST_LIMIT:
        import ray

        ddf = deg0
        for _ in range(max_rounds):
            if n_edges == 0 or not len(ddf):
                cur = cur.limit(0) if n_edges else cur
                n_edges = 0
                break
            surv = np.sort(
                ddf.loc[ddf["deg"] >= k, "node"].to_numpy(dtype=np.int64)
            )
            if len(surv) == len(ddf):
                break  # fixpoint: everyone clears k
            if not len(surv):
                cur, n_edges = cur.limit(0), 0
                ddf = ddf.iloc[0:0]  # fully peeled — empty core
                break
            s_ref = ray.put(surv)

            def keep_edges(d: pd.DataFrame, _s=s_ref) -> pd.DataFrame:
                s = ray.get(_s)
                u = d["u"].to_numpy(dtype=np.int64)
                v = d["v"].to_numpy(dtype=np.int64)
                m = np.isin(u, s) & np.isin(v, s)
                return d.loc[m]

            cur = cur.map_batches(
                keep_edges, batch_format="pandas"
            ).materialize()
            n_edges = cur.count()
            ddf = bucketed_group_reduce(
                cur.map_batches(deg_partial, batch_format="pandas"),
                key_cols=["node"],
                reduce_fn=deg_final,
                num_buckets=num_buckets,
            ).to_pandas()
        else:
            raise RuntimeError(
                f"k_core: no fixpoint after {max_rounds} rounds (peel "
                "depth exceeds the cap); raise max_rounds"
            )
        out = pd.DataFrame(
            {
                "node": ddf["node"].to_numpy(dtype=np.int64),
                "core_deg": ddf["deg"].to_numpy(dtype=np.int64),
            }
        )
        return rd.from_pandas(out)

    for _ in range(max_rounds):
        if n_edges == 0:
            break
        deg = bucketed_group_reduce(
            cur.map_batches(deg_partial, batch_format="pandas"),
            key_cols=["node"],
            reduce_fn=deg_final,
            num_buckets=num_buckets,
        )
        keep = deg.map_batches(
            lambda d: d.loc[d["deg"] >= k, ["node"]], batch_format="pandas"
        ).materialize()  # V-bounded; probed twice (u-side and v-side)
        if keep.count() == 0:  # graph fully peeled — empty k-core
            cur, n_edges = cur.limit(0), 0
            break
        ku = keep.map_batches(
            lambda d: d.rename(columns={"node": "u"}), batch_format="pandas"
        )
        kv = keep.map_batches(
            lambda d: d.rename(columns={"node": "v"}), batch_format="pandas"
        )
        nxt = semi_join(
            semi_join(cur, ku, on="u", num_buckets=num_buckets),
            kv,
            on="v",
            num_buckets=num_buckets,
        ).materialize()
        n_next = nxt.count()
        if n_next == n_edges:
            cur = nxt
            break
        cur, n_edges = nxt, n_next
    else:
        raise RuntimeError(
            f"k_core: no fixpoint after {max_rounds} rounds (peel depth "
            "exceeds the cap); raise max_rounds"
        )

    out = bucketed_group_reduce(
        cur.map_batches(deg_partial, batch_format="pandas"),
        key_cols=["node"],
        reduce_fn=deg_final,
        num_buckets=num_buckets,
    )
    return out.map_batches(
        lambda d: d.rename(columns={"deg": "core_deg"}), batch_format="pandas"
    )


def hits(
    edges: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 10,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """HITS (Kleinberg): hub and authority scores over a directed edge
    list — the bipartite-reinforcement ranking that separates "links
    to good pages" from "is a good page" (PageRank's one score can't).
    Returns (node, hub, authority), each vector L1-normalized.

    a'(v) = Σ_{u→v} h(u);  h'(u) = Σ_{u→v} a'(v);  normalize each.

    Scale shape mirrors `pagerank`: per iteration TWO E-bounded
    score-push exchanges (edges join the V-bounded score table via a
    broadcast map when it fits, else co-bucketed) and one 1-row norm
    reduce; scores materialize per round (documented iterative
    exception). Norms use float64 — HITS is spectral (power iteration
    on AᵀA), so there is no integer-exact form; parity is pinned by
    unit tests against a dense NumPy reference, not a SQL oracle."""
    import ray

    from kgflow.ops.shuffle import bucketed_group_reduce

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": df[src_col], "dst": df[dst_col]})

    e = edges.select_columns([src_col, dst_col]).map_batches(
        prep, batch_format="pandas"
    ).materialize()  # E-bounded; reused every round

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        n = np.unique(
            np.concatenate([df["src"].to_numpy(), df["dst"].to_numpy()])
        )
        return pd.DataFrame({"node": n})

    nodes = bucketed_group_reduce(
        e.map_batches(node_partial, batch_format="pandas"),
        key_cols=["node"],
        reduce_fn=lambda g: g.drop_duplicates(),
        num_buckets=num_buckets,
    ).materialize()
    n_nodes = nodes.count()

    # V-bounded score tables ride as broadcast dicts (node → score);
    # at |V| beyond broadcast scale the same loop co-buckets instead
    # (the pagerank weight-join fallback) — documented assumption.
    def _sum_scores(push_col: str, out_name: str, score_ref, uniform: float):
        def push(df: pd.DataFrame) -> pd.DataFrame:
            if score_ref is None:
                s = np.full(len(df), uniform)
            else:
                sc = ray.get(score_ref)
                s = df[push_col].map(sc).fillna(0.0).to_numpy()
            t = pd.DataFrame(
                {
                    "node": df["dst" if push_col == "src" else "src"],
                    out_name: s,
                }
            )
            return t.groupby("node", as_index=False, sort=False)[
                out_name
            ].sum()

        return bucketed_group_reduce(
            e.map_batches(push, batch_format="pandas"),
            key_cols=["node"],
            reduce_fn=lambda g: g.groupby("node", as_index=False)[
                out_name
            ].sum(),
            num_buckets=num_buckets,
        )

    auth_ref = None
    hub_ref = None
    for _ in range(iters):
        # authorities from hubs
        a = _sum_scores("src", "authority", hub_ref, 1.0 / n_nodes)
        adf = a.to_pandas()  # V-bounded pull (documented iterative state)
        adf["authority"] /= adf["authority"].sum()
        auth_ref = ray.put(dict(zip(adf["node"], adf["authority"])))
        # hubs from authorities
        h = _sum_scores("dst", "hub", auth_ref, 0.0)
        hdf = h.to_pandas()
        hdf["hub"] /= hdf["hub"].sum()
        hub_ref = ray.put(dict(zip(hdf["node"], hdf["hub"])))

    amap_ref, hmap_ref = auth_ref, hub_ref

    class Attach:
        def __init__(self):
            self.a = ray.get(amap_ref)
            self.h = ray.get(hmap_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "hub": df["node"].map(self.h).fillna(0.0),
                    "authority": df["node"].map(self.a).fillna(0.0),
                }
            )

    return nodes.map_batches(Attach, batch_format="pandas", concurrency=(1, 4))


def _bfs_driver(
    edf: pd.DataFrame, seeds: list[int], max_hops: int, undirected: bool
) -> pd.DataFrame:
    """Driver-resident BFS over the pulled edge frame — identical
    level-by-level semantics to the distributed rounds."""
    s = edf["src"].to_numpy(dtype=np.int64)
    d = edf["dst"].to_numpy(dtype=np.int64)
    if undirected:
        s, d = np.concatenate([s, d]), np.concatenate([d, s])
    visited: dict[int, int] = {int(x): 0 for x in seeds}
    frontier = np.array(sorted(visited), dtype=np.int64)
    for hop in range(1, max_hops + 1):
        m = np.isin(s, frontier)
        cand = np.unique(d[m])
        cand = cand[
            ~np.isin(cand, np.fromiter(visited, dtype=np.int64, count=len(visited)))
        ]
        if not len(cand):
            break
        for n in cand:
            visited[int(n)] = hop
        frontier = np.sort(cand)
    return pd.DataFrame(
        {
            "node": np.fromiter(visited.keys(), dtype=np.int64),
            "hop": np.fromiter(visited.values(), dtype=np.int64),
        }
    )


def bfs_hops(
    edges: "rd.Dataset",
    seeds: list[int],
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 4,
    undirected: bool = True,
    num_buckets: int | None = None,
    driver_limit: int = TRI_DRIVER_LIMIT,
) -> "rd.Dataset":
    """Distributed BFS minimum-hop distance from a seed set: returns
    (node, hop) for every node reachable within ``max_hops``.

    Per round ONE E-bounded frontier-expansion pass over the (reused,
    materialized) edge set — each batch keeps edges whose source sits
    in the broadcast frontier, drops already-visited destinations
    against a broadcast visited array, and emits per-batch-unique
    candidate nodes; a node-bucketed distinct reduce dedups across
    batches so the exchange carries ≤ |new frontier| rows per bucket.
    The frontier/visited tables are V-bounded driver state — the same
    documented iterative exception as `pagerank`/`hits`; rounds stop
    at max_hops or an empty frontier, so worst case is
    max_hops·O(E) work, never O(V·E).

    SQL-oracle-able (unlike pagerank): min-hop BFS ≡ a recursive CTE
    with a hop bound, so the driver gate checks it exactly.

    Edge sets ≤ ``driver_limit`` rows run driver-resident
    (`_bfs_driver`, the `_tri_driver` precedent) — identical output;
    ``driver_limit=0`` forces the distributed rounds (parity-tested).
    """
    import ray

    from kgflow.ops.shuffle import bucketed_group_reduce

    if driver_limit > 0 and edges.count() <= driver_limit:
        edf = edges.select_columns([src_col, dst_col]).to_pandas()
        edf = edf.rename(columns={src_col: "src", dst_col: "dst"})
        return rd.from_pandas(
            _bfs_driver(edf, seeds, max_hops, undirected)
        )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        s = df[src_col].to_numpy(dtype=np.int64)
        d = df[dst_col].to_numpy(dtype=np.int64)
        if undirected:
            return pd.DataFrame(
                {"src": np.concatenate([s, d]), "dst": np.concatenate([d, s])}
            )
        return pd.DataFrame({"src": s, "dst": d})

    e = (
        edges.select_columns([src_col, dst_col])
        .map_batches(prep, batch_format="pandas")
        .materialize()
    )

    visited: dict[int, int] = {int(s): 0 for s in seeds}
    frontier = np.array(sorted(visited), dtype=np.int64)

    for hop in range(1, max_hops + 1):
        f_ref = ray.put(frontier)
        v_ref = ray.put(np.array(sorted(visited), dtype=np.int64))

        def expand(df: pd.DataFrame, _f=f_ref, _v=v_ref) -> pd.DataFrame:
            f = ray.get(_f)
            v = ray.get(_v)
            m = np.isin(df["src"].to_numpy(), f)
            cand = np.unique(df.loc[m, "dst"].to_numpy())
            cand = cand[~np.isin(cand, v)]
            return pd.DataFrame({"node": cand})

        nxt = bucketed_group_reduce(
            e.map_batches(expand, batch_format="pandas"),
            key_cols=["node"],
            reduce_fn=lambda g: g.drop_duplicates(),
            num_buckets=num_buckets,
        )
        ndf = nxt.to_pandas()  # new-frontier-bounded pull (iterative state)
        if ndf.empty:
            break
        new_nodes = ndf["node"].to_numpy(dtype=np.int64)
        for n in new_nodes:
            visited[int(n)] = hop
        frontier = np.sort(new_nodes)

    out = pd.DataFrame(
        {
            "node": np.fromiter(visited.keys(), dtype=np.int64),
            "hop": np.fromiter(visited.values(), dtype=np.int64),
        }
    )
    import ray.data as rd_mod

    return rd_mod.from_pandas(out)


def degree_assortativity(
    edges: "rd.Dataset", num_buckets: int | None = None
) -> "rd.Dataset":
    """Exact degree-assortativity moments of a directed edge list:
    ONE row (n, sx, sy, sxx, syy, sxy) where, per DISTINCT edge,
    x = out-degree of src and y = in-degree of dst (Newman 2002
    degree correlation; the Pearson coefficient is a single
    driver-side division over this hash-exact BIGINT row, kept out of
    the exchanged schema like `profile.grouped_corr_moments`).

    Scale shape: the edge list dedups through `distinct_rows` (per-
    block combiner + one bucketed exchange) and is materialized ONCE
    (three consumers: two degree reduces + the attach join — lazy
    re-execution would triple the scan). Each degree table is
    node-bounded; `hash_join` auto-broadcasts while V fits and falls
    back to the bucketed shuffle beyond. The moment fold ships ONE
    6-int row per block. Degrees are ints, so no quantization step is
    needed; the int64 overflow guard mirrors grouped_corr_moments.
    """
    from kgflow.ops.joins import distinct_rows, hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce

    e = distinct_rows(edges, ["src", "dst"], num_buckets=num_buckets)
    e = e.materialize()

    def count_by(col: str, out: str):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            t = df[[col]].copy()
            t[out] = np.int64(1)
            return t.groupby(col, as_index=False, sort=False)[out].sum()

        def finish(g: pd.DataFrame) -> pd.DataFrame:
            r = g.groupby(col, as_index=False, sort=False)[out].sum()
            r[out] = r[out].astype(np.int64)
            return r

        return bucketed_group_reduce(
            e.map_batches(partial, batch_format="pandas"),
            key_cols=[col],
            reduce_fn=finish,
            num_buckets=num_buckets,
        )

    j = hash_join(
        hash_join(e, count_by("src", "dx"), on="src", right_small=True),
        count_by("dst", "dy"),
        on="dst",
        right_small=True,
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["dx"].to_numpy(dtype=np.int64)
        y = df["dy"].to_numpy(dtype=np.int64)
        if len(x):
            mx = int(max(x.max(), y.max()))
            if mx * mx * len(x) >= 2**63:
                raise ValueError(
                    "degree_assortativity: batch moment would overflow "
                    f"int64 (max degree = {mx}, n = {len(x)})"
                )
        return pd.DataFrame(
            {
                "_k": np.zeros(1, dtype=np.int64),
                "n": [np.int64(len(x))],
                "sx": [x.sum()],
                "sy": [y.sum()],
                "sxx": [(x * x).sum()],
                "syy": [(y * y).sum()],
                "sxy": [(x * y).sum()],
            }
        )

    cols = ["n", "sx", "sy", "sxx", "syy", "sxy"]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g[cols].sum().astype(np.int64).to_frame().T
        return out

    return bucketed_group_reduce(
        j.map_batches(moments, batch_format="pandas"),
        key_cols=["_k"],
        reduce_fn=fold,
        num_buckets=1,
    )


def local_clustering(
    edges: "rd.Dataset",
    num_buckets: int | None = None,
    driver_limit: int = TRI_DRIVER_LIMIT,
) -> "rd.Dataset":
    """Per-node EXACT triangle count and local clustering coefficient
    over an undirected (u, v) edge set (u < v, distinct) →
    (node, deg, tri, lcc) with lcc = 2·tri / (deg·(deg−1)) (Watts &
    Strogatz 1998), 0 for deg < 2.

    Same degree-oriented wedge join as `triangle_count` (wedge set
    O(E^1.5) by the arboricity bound, ONE co-partitioned closing-edge
    probe), except each wedge KEEPS its center: a closed wedge is a
    triangle found exactly once, and credits all three corners via a
    3-row melt + per-batch count combiner → ONE node-keyed int64
    exchange (V-bounded). The deg table is reused from the orientation
    pass; tri attaches back with a left join so zero-triangle nodes
    keep their degree row. The single closing division is the only
    float op (2.0·tri first, then divide — mirrored in SQL). Edge sets
    ≤ ``driver_limit`` rows run driver-resident (`_tri_driver`);
    ``driver_limit=0`` forces the distributed path.
    """
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce

    edges = edges.select_columns(["u", "v"]).materialize()
    if driver_limit > 0 and edges.count() <= driver_limit:
        closed, deg = _tri_driver(edges.to_pandas())
        credit = pd.concat(
            [closed["ctr"], closed["u"], closed["v"]], ignore_index=True
        ).value_counts()
        dg = deg.sort_index()
        t = credit.reindex(dg.index).fillna(0).to_numpy(dtype=np.int64)
        dgv = dg.to_numpy(dtype=np.int64)
        den = np.maximum(dgv * (dgv - 1), 1)
        lcc = np.where(dgv >= 2, (2.0 * t) / den, 0.0)
        return rd.from_pandas(
            pd.DataFrame(
                {"node": dg.index.to_numpy(), "deg": dgv, "tri": t, "lcc": lcc}
            )
        )

    def deg_partial(d: pd.DataFrame) -> pd.DataFrame:
        x = pd.concat([d["u"], d["v"]], ignore_index=True)
        vc = x.value_counts()
        return pd.DataFrame({"x": vc.index, "deg": vc.to_numpy(dtype="int64")})

    def deg_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("x", as_index=False)["deg"].sum()
        out["deg"] = out["deg"].astype("int64")
        return out

    deg = bucketed_group_reduce(
        edges.map_batches(deg_partial, batch_format="pandas"),
        key_cols=["x"],
        reduce_fn=deg_final,
        num_buckets=num_buckets,
    ).materialize()  # V-bounded; two attach joins + the final left join

    du = deg.map_batches(
        lambda d: d.rename(columns={"x": "u", "deg": "_du"}),
        batch_format="pandas",
    )
    dv = deg.map_batches(
        lambda d: d.rename(columns={"x": "v", "deg": "_dv"}),
        batch_format="pandas",
    )
    with_deg = hash_join(
        hash_join(edges, du, on="u", num_buckets=num_buckets),
        dv,
        on="v",
        num_buckets=num_buckets,
    )

    def orient(d: pd.DataFrame) -> pd.DataFrame:
        u_first = (d["_du"] < d["_dv"]) | (
            (d["_du"] == d["_dv"]) & (d["u"] < d["v"])
        )
        src = d["u"].where(u_first, d["v"])
        dst = d["v"].where(u_first, d["u"])
        return pd.DataFrame({"src": src, "dst": dst})

    directed = with_deg.map_batches(orient, batch_format="pandas")

    def wedges(d: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            return pd.DataFrame(
                {
                    "ctr": pd.Series([], dtype=d["src"].dtype),
                    "u": pd.Series([], dtype=d["dst"].dtype),
                    "v": pd.Series([], dtype=d["dst"].dtype),
                }
            )
        m = d.merge(d, on="src", suffixes=("_a", "_b"))
        m = m.loc[m["dst_a"] < m["dst_b"], ["src", "dst_a", "dst_b"]]
        return m.rename(columns={"src": "ctr", "dst_a": "u", "dst_b": "v"})

    wedge_ds = bucketed_group_reduce(
        directed, key_cols=["src"], reduce_fn=wedges, num_buckets=num_buckets
    ).materialize()
    # ^ O(E^1.5)-bounded (already crosses an exchange of that size);
    # without it the closing join's schema probe re-executes the whole
    # degree-attach + wedge exchange before the join runs it again.

    closed = hash_join(
        wedge_ds,
        edges.map_batches(
            lambda d: d.assign(_e=np.int64(1)), batch_format="pandas"
        ),
        on=["u", "v"],
        num_buckets=num_buckets,
    )

    def credit(d: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat([d["ctr"], d["u"], d["v"]], ignore_index=True)
        vc = nodes.value_counts()
        return pd.DataFrame(
            {"x": vc.index, "tri": vc.to_numpy(dtype="int64")}
        )

    tri = bucketed_group_reduce(
        closed.map_batches(credit, batch_format="pandas"),
        key_cols=["x"],
        reduce_fn=lambda g: g.groupby("x", as_index=False)["tri"].sum(),
        num_buckets=num_buckets,
    ).materialize()
    # ^ V-bounded, but its upstream is the whole wedge+closing DAG:
    # without the materialize, the final join's schema probe AND
    # broadcast-decision count AND the winning path each re-execute
    # that DAG from scratch (measured 27.3 s → ~14 s at sf0.01).

    out = hash_join(deg, tri, on="x", how="left", num_buckets=num_buckets)

    def finish(d: pd.DataFrame) -> pd.DataFrame:
        dg = d["deg"].to_numpy(dtype=np.int64)
        t = d["tri"].fillna(0).to_numpy(dtype=np.int64)
        den = np.maximum(dg * (dg - 1), 1)  # avoid 0-div warning; masked
        lcc = np.where(dg >= 2, (2.0 * t) / den, 0.0)
        return pd.DataFrame(
            {"node": d["x"].to_numpy(), "deg": dg, "tri": t, "lcc": lcc}
        )

    return out.map_batches(finish, batch_format="pandas")


def _sssp_driver(
    edf: pd.DataFrame, seeds: list[int], max_hops: int, undirected: bool
) -> pd.DataFrame:
    """Driver-resident bounded Bellman-Ford (max_hops full relaxation
    rounds, np.minimum.at) — by the standard BF invariant, identical
    to the distributed frontier rounds: min weight over ≤k-hop paths."""
    s = edf["src"].to_numpy(dtype=np.int64)
    d = edf["dst"].to_numpy(dtype=np.int64)
    w = edf["w"].to_numpy(dtype=np.int64)
    if len(w) and w.min() <= 0:
        raise ValueError("sssp_weighted requires positive weights")
    if undirected:
        s, d = np.concatenate([s, d]), np.concatenate([d, s])
        w = np.concatenate([w, w])
    nodes = np.unique(np.concatenate([s, d, np.asarray(seeds, np.int64)]))
    INF = np.iinfo(np.int64).max // 4
    dist = np.full(len(nodes), INF, dtype=np.int64)
    dist[np.searchsorted(nodes, np.asarray(sorted(seeds), np.int64))] = 0
    si = np.searchsorted(nodes, s)
    di = np.searchsorted(nodes, d)
    for _ in range(max_hops):
        cand = dist[si]
        ok = cand < INF
        offer = np.where(ok, cand + w, INF)
        new = dist.copy()
        np.minimum.at(new, di, offer)
        if (new == dist).all():
            break
        dist = new
    m = dist < INF
    return pd.DataFrame({"node": nodes[m], "dist": dist[m]})


def sssp_weighted(
    edges: "rd.Dataset",
    seeds: list[int],
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    max_hops: int = 4,
    undirected: bool = True,
    num_buckets: int | None = None,
    driver_limit: int = TRI_DRIVER_LIMIT,
) -> "rd.Dataset":
    """Distributed single-source(-set) shortest path with positive
    integer weights: returns (node, dist) = the exact minimum path
    weight over paths of ≤ ``max_hops`` edges from the seed set —
    Bellman-Ford rounds with the frontier optimization (only nodes
    whose distance improved last round re-expand; a stale node's
    offers were already made when it last improved, so per-round
    semantics "min over ≤r-hop paths" are preserved exactly).

    Scale shape: per round ONE E-bounded relaxation pass over the
    (reused, materialized) edge set — each batch looks up broadcast
    (frontier_nodes, frontier_dists) via np.searchsorted, emits
    per-batch-min (node, candidate_dist) rows, and a node-bucketed
    min-reduce collapses candidates; the driver pulls only the
    candidate-improvement table per round (V-bounded iterative state,
    the same documented exception as `pagerank`/`bfs_hops`). Integer
    distances make the result hash-exact in SQL: a recursive CTE with
    a hop bound and UNION dedup replays it (see the driver oracle).

    Edge sets ≤ ``driver_limit`` rows run driver-resident bounded
    Bellman-Ford (`_sssp_driver`) — identical output;
    ``driver_limit=0`` forces the distributed rounds (parity-tested).
    """
    import ray

    from kgflow.ops.shuffle import bucketed_group_reduce

    if driver_limit > 0 and edges.count() <= driver_limit:
        edf = edges.select_columns(
            [src_col, dst_col, weight_col]
        ).to_pandas()
        edf = edf.rename(
            columns={src_col: "src", dst_col: "dst", weight_col: "w"}
        )
        return rd.from_pandas(
            _sssp_driver(edf, seeds, max_hops, undirected)
        )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        s = df[src_col].to_numpy(dtype=np.int64)
        d = df[dst_col].to_numpy(dtype=np.int64)
        w = df[weight_col].to_numpy(dtype=np.int64)
        if (len(w)) and w.min() <= 0:
            raise ValueError("sssp_weighted requires positive weights")
        if undirected:
            return pd.DataFrame(
                {
                    "src": np.concatenate([s, d]),
                    "dst": np.concatenate([d, s]),
                    "w": np.concatenate([w, w]),
                }
            )
        return pd.DataFrame({"src": s, "dst": d, "w": w})

    e = (
        edges.select_columns([src_col, dst_col, weight_col])
        .map_batches(prep, batch_format="pandas")
        .materialize()
    )

    dist: dict[int, int] = {int(s): 0 for s in seeds}
    f_nodes = np.array(sorted(dist), dtype=np.int64)
    f_dists = np.array([dist[int(n)] for n in f_nodes], dtype=np.int64)

    for _hop in range(max_hops):
        f_ref = ray.put((f_nodes, f_dists))

        def relax(df: pd.DataFrame, _f=f_ref) -> pd.DataFrame:
            fn, fd = ray.get(_f)
            s = df["src"].to_numpy(dtype=np.int64)
            idx = np.searchsorted(fn, s)
            idx_c = np.minimum(idx, len(fn) - 1) if len(fn) else idx
            m = (idx < len(fn)) & (fn[idx_c] == s) if len(fn) else np.zeros(
                len(s), dtype=bool
            )
            d = df.loc[m]
            cand = fd[idx[m]] + d["w"].to_numpy(dtype=np.int64)
            out = pd.DataFrame(
                {"node": d["dst"].to_numpy(dtype=np.int64), "dist": cand}
            )
            return out.groupby("node", as_index=False)["dist"].min()

        nxt = bucketed_group_reduce(
            e.map_batches(relax, batch_format="pandas"),
            key_cols=["node"],
            reduce_fn=lambda g: g.groupby("node", as_index=False)["dist"].min(),
            num_buckets=num_buckets,
        )
        ndf = nxt.to_pandas()  # candidate-bounded pull (iterative state)
        improved_n, improved_d = [], []
        for n, dd in zip(
            ndf["node"].to_numpy(dtype=np.int64),
            ndf["dist"].to_numpy(dtype=np.int64),
        ):
            cur = dist.get(int(n))
            if cur is None or dd < cur:
                dist[int(n)] = int(dd)
                improved_n.append(int(n))
                improved_d.append(int(dd))
        if not improved_n:
            break
        order = np.argsort(np.array(improved_n, dtype=np.int64))
        f_nodes = np.array(improved_n, dtype=np.int64)[order]
        f_dists = np.array(improved_d, dtype=np.int64)[order]

    out = pd.DataFrame(
        {
            "node": np.fromiter(dist.keys(), dtype=np.int64),
            "dist": np.fromiter(dist.values(), dtype=np.int64),
        }
    )
    import ray.data as rd_mod

    return rd_mod.from_pandas(out)


def weighted_projection(
    ds: "rd.Dataset",
    entity_col: str,
    cell_cols: list[str],
    max_cell: int = 10_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Weighted one-mode projection of a bipartite entity↔cell graph:
    (u, v, shared) for every entity pair co-occurring in ≥1 cell,
    weighted by the number of DISTINCT shared cells — the classic
    affiliation-network projection (suppliers weighted by co-supplied
    parts, users by shared sessions). `cooccurrence_edges` is the
    unweighted (dedup) variant; this keeps the count.

    Scale shape: identical to `cooccurrence_edges` — per-block
    (entity, cell) dedup combiner, ONE cell-keyed exchange with the
    loud ``max_cell`` quadratic-cell guard, whole-bucket self-merge
    pair generation — except pairs then flow through a pair-keyed
    COUNT reduce (each (pair, cell) contributes exactly once because
    the cell exchange dedups first, so the count IS the distinct
    shared-cell count)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    cols = [entity_col, *cell_cols]

    def dedup(d: pd.DataFrame) -> pd.DataFrame:
        return d.drop_duplicates(cols)

    cells = bucketed_group_reduce(
        ds.select_columns(cols).map_batches(dedup, batch_format="pandas"),
        key_cols=cell_cols,
        reduce_fn=dedup,
        num_buckets=num_buckets,
    )

    def pairs(d: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            # empty frame keeps the ENTITY dtype (string entities must
            # not union int64-typed empty blocks)
            return pd.DataFrame(
                {
                    "u": pd.Series([], dtype=d[entity_col].dtype),
                    "v": pd.Series([], dtype=d[entity_col].dtype),
                    "shared": pd.Series([], dtype="int64"),
                }
            )
        sizes = d.groupby(cell_cols, sort=False)[entity_col].transform("size")
        if int(sizes.max()) > max_cell:
            hot = (
                d.groupby(cell_cols, sort=False)
                .size()
                .nlargest(1)
                .index.tolist()
            )
            raise ValueError(
                f"weighted_projection: cell {hot[0]!r} exceeds "
                f"max_cell={max_cell} entities; a quadratic hot cell "
                "means the cell definition is too coarse"
            )
        m = d.merge(d, on=cell_cols, suffixes=("_a", "_b"))
        ea, eb = f"{entity_col}_a", f"{entity_col}_b"
        m = m.loc[m[ea] < m[eb], [ea, eb]]
        out = m.groupby([ea, eb], as_index=False).size()
        out.columns = ["u", "v", "shared"]
        out["shared"] = out["shared"].astype("int64")
        return out

    per_cell = bucketed_group_reduce(
        cells, key_cols=cell_cols, reduce_fn=pairs, num_buckets=num_buckets
    )

    return bucketed_group_reduce(
        per_cell,
        key_cols=["u", "v"],
        reduce_fn=lambda g: g.groupby(["u", "v"], as_index=False)["shared"]
        .sum()
        .astype({"shared": "int64"}),
        num_buckets=num_buckets,
    )


def item_triple_support(
    ds: "rd.Dataset",
    basket_col: str,
    item_col: str,
    max_basket: int = 10_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Apriori level-3 counting: for every unordered item TRIPLE, how
    many baskets contain all three — the candidate-support pass behind
    3-itemset association rules (`item_pair_support` is the k=2
    sibling). Output (item_a, item_b, item_c, support),
    item_a < item_b < item_c.

    Scale shape: (basket, item) pairs dedup through a per-block
    combiner, ONE basket-keyed exchange; per basket the triple set is
    a guarded double self-merge (cubic in the BASKET size only —
    ``max_basket`` fails loudly, the `cooccurrence_edges` rule), and
    per-bucket triple counts combine before ONE item³-bounded count
    reduce."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    cols = [basket_col, item_col]

    def dedup(d: pd.DataFrame) -> pd.DataFrame:
        return d.drop_duplicates(cols)

    EMPTY = pd.DataFrame(
        {
            "item_a": pd.Series([], dtype="object"),
            "item_b": pd.Series([], dtype="object"),
            "item_c": pd.Series([], dtype="object"),
            "support": pd.Series([], dtype="int64"),
        }
    )

    def triples(d: pd.DataFrame) -> pd.DataFrame:
        d = d.drop_duplicates(cols)
        if not len(d):
            return EMPTY.copy()
        sizes = d.groupby(basket_col, sort=False)[item_col].transform("size")
        if int(sizes.max()) > max_basket:
            hot = d.loc[sizes.idxmax(), basket_col]
            raise ValueError(
                f"item_triple_support: basket {hot!r} has "
                f"{int(sizes.max())} items (max_basket={max_basket}); "
                "refine the basket key"
            )
        m = d.merge(d, on=basket_col, suffixes=("_a", "_b"))
        ca, cb = f"{item_col}_a", f"{item_col}_b"
        m = m.loc[m[ca] < m[cb]]
        m = m.merge(
            d.rename(columns={item_col: "_c"}), on=basket_col
        )
        m = m.loc[m[cb] < m["_c"], [ca, cb, "_c"]]
        t = m.groupby([ca, cb, "_c"], sort=False, as_index=False).size()
        return pd.DataFrame(
            {
                "item_a": t[ca].astype(object),
                "item_b": t[cb].astype(object),
                "item_c": t["_c"].astype(object),
                "support": t["size"].to_numpy(dtype=np.int64),
            }
        )

    per_basket = bucketed_group_reduce(
        ds.select_columns(cols).map_batches(dedup, batch_format="pandas"),
        key_cols=[basket_col],
        reduce_fn=triples,
        num_buckets=num_buckets,
    )

    return bucketed_group_reduce(
        per_basket,
        key_cols=["item_a", "item_b", "item_c"],
        reduce_fn=lambda g: g.groupby(
            ["item_a", "item_b", "item_c"], as_index=False
        )["support"].sum(),
        num_buckets=num_buckets,
    )


def basket_missing_items(
    ds: "rd.Dataset",
    basket_cols: list[str],
    item_col: str,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Negative sampling for implicit-feedback training: for every
    basket (the distinct ``basket_cols`` tuple), emit each item from
    the global item universe the basket does NOT contain — the exact
    complement set, the candidate negatives a recommender/KG trainer
    pairs with the positives. Deterministic (no sampling noise), so
    it oracles as (baskets × items) ANTI JOIN positives.

    Scale shape: the item universe is a domain-bounded distinct pull
    broadcast via ``ray.put`` (item vocabularies are tiny next to the
    fact table); (basket, item) positives dedup through a per-block
    combiner then ONE basket-keyed exchange whose reduce emits the
    per-basket complement with a vectorized isin mask — output volume
    is baskets × |items| worst case, the same bound as the anti-join
    it replaces."""
    import ray

    from kgflow.ops.joins import distinct_rows
    from kgflow.ops.shuffle import bucketed_group_reduce

    items = (
        distinct_rows(ds, [item_col], num_buckets=num_buckets)
        .to_pandas()[item_col]
        .sort_values()
        .to_numpy()
    )
    items_ref = ray.put(items)

    cols = [*basket_cols, item_col]

    def dedup(d: pd.DataFrame) -> pd.DataFrame:
        return d.drop_duplicates(cols)

    def complement(g: pd.DataFrame) -> pd.DataFrame:
        univ = ray.get(items_ref)
        g = g.drop_duplicates(cols)
        outs = []
        for key, gg in g.groupby(basket_cols, sort=False):
            absent = univ[~np.isin(univ, gg[item_col].to_numpy())]
            if not len(absent):
                continue
            kv = key if isinstance(key, tuple) else (key,)
            out = pd.DataFrame({item_col: absent})
            for c, v in zip(basket_cols, kv):
                out[c] = v
            outs.append(out[cols])
        if not outs:
            return pd.DataFrame(
                {c: pd.Series([], dtype=g[c].dtype) for c in cols}
            )
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_reduce(
        ds.select_columns(cols).map_batches(dedup, batch_format="pandas"),
        key_cols=list(basket_cols),
        reduce_fn=complement,
        num_buckets=num_buckets,
    )


def community_stats(
    edges: "rd.Dataset",
    labels: "rd.Dataset",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-community modularity components over an undirected (u, v)
    edge set and a (node, comp) label table: (community, n_nodes,
    internal_edges, total_degree) — the exact-integer ingredients of
    Newman modularity Q = Σ_c (e_c/m − (d_c/2m)²), emitted unreduced
    so the score stays rational and hash-exact (the grouped-moments
    convention: ship integers, divide at the edge).

    Scale shape: the label map is V-bounded broadcast state (sorted
    arrays + searchsorted, the `bfs_hops` idiom); ONE streaming pass
    over edges emits per-batch (community, internal, degree) partials
    (an edge contributes 1 internal iff both endpoints share a
    community, and 1 degree to EACH endpoint's community), combined
    through a community-bounded reduce; node counts fold from the
    label table through the same exchange."""
    import ray

    from kgflow.ops.shuffle import bucketed_group_reduce

    lab = labels.to_pandas()  # V-bounded pull (same bound as CC itself)
    order = np.argsort(lab["node"].to_numpy())
    nodes_arr = lab["node"].to_numpy()[order]
    comp_arr = lab["comp"].to_numpy()[order]
    ref = ray.put((nodes_arr, comp_arr))

    def edge_partial(df: pd.DataFrame) -> pd.DataFrame:
        ns, cs = ray.get(ref)
        cu = cs[np.searchsorted(ns, df["u"].to_numpy())]
        cv = cs[np.searchsorted(ns, df["v"].to_numpy())]
        internal = (cu == cv).astype(np.int64)
        d = pd.DataFrame(
            {
                "community": np.concatenate([cu, cv]),
                "internal_edges": np.concatenate(
                    [internal, np.zeros(len(cv), dtype=np.int64)]
                ),
                "total_degree": np.ones(2 * len(cu), dtype=np.int64),
                "n_nodes": np.zeros(2 * len(cu), dtype=np.int64),
            }
        )
        return d.groupby("community", as_index=False).sum()

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "community": df["comp"],
                "internal_edges": np.zeros(len(df), dtype=np.int64),
                "total_degree": np.zeros(len(df), dtype=np.int64),
                "n_nodes": np.ones(len(df), dtype=np.int64),
            }
        )
        return d.groupby("community", as_index=False).sum()

    parts = edges.select_columns(["u", "v"]).map_batches(
        edge_partial, batch_format="pandas"
    ).union(labels.map_batches(node_partial, batch_format="pandas"))

    return bucketed_group_reduce(
        parts,
        key_cols=["community"],
        reduce_fn=lambda g: g.groupby("community", as_index=False).sum(),
        num_buckets=num_buckets,
    )


def adamic_adar_scores(
    ds: "rd.Dataset",
    hub_col: str,
    leaf_col: str,
    max_degree: int = 10_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Link-prediction scores over a bipartite edge set: for every leaf
    pair (u < v) sharing ≥ 1 hub, the common-neighbor count ``cn`` and
    the Adamic–Adar score ``aa`` = Σ over shared hubs z of
    1/ln(deg(z)) — the classic "weight rare shared neighbors higher"
    similarity (Adamic & Adar 2003) behind friend/product suggestion
    and KG missing-edge ranking. A hub with degree 1 supports no pair
    and is skipped; a shared hub always has deg ≥ 2, so ln(deg) > 0.

    Scale shape: the `cooccurrence_edges` skeleton with per-wedge
    weights — distinct (hub, leaf) edges dedup through ONE hub-keyed
    exchange whose reduce also owns the hub's EXACT degree (the whole
    neighbor set is group-local); pair fan-out is a whole-bucket
    self-merge quadratic in hub degree only, with a LOUD ``max_degree``
    failure naming the hot hub (its n² wedges would OOM a worker —
    salting cannot fix an irreducibly hot hub, the graph needs a cap or
    the hub a filter); pair partials combine per block before ONE
    pair-keyed sum."""

    def dedup(d: pd.DataFrame) -> pd.DataFrame:
        return d.drop_duplicates([hub_col, leaf_col])

    hubs = bucketed_group_reduce(
        ds.select_columns([hub_col, leaf_col]).map_batches(
            dedup, batch_format="pandas"
        ),
        key_cols=[hub_col],
        reduce_fn=dedup,
        num_buckets=num_buckets,
    )

    def wedges(d: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "u": pd.Series([], dtype="int64"),
                "v": pd.Series([], dtype="int64"),
                "cn": pd.Series([], dtype="int64"),
                "aa": pd.Series([], dtype="float64"),
            }
        )
        if not len(d):
            return empty
        deg = d.groupby(hub_col, sort=False)[leaf_col].transform("size")
        if int(deg.max()) > max_degree:
            hot = d.loc[deg.idxmax(), hub_col]
            raise ValueError(
                f"adamic_adar_scores: hub {hot!r} has degree {int(deg.max())} "
                f"(max_degree={max_degree}); filter the graph or raise the cap"
            )
        d = d.assign(_w=1.0 / np.log(deg.to_numpy(dtype=np.float64)))
        d = d[deg.to_numpy() >= 2]
        if not len(d):
            return empty
        m = d.merge(
            d[[hub_col, leaf_col]].rename(columns={leaf_col: "_b"}), on=hub_col
        )
        m = m[m[leaf_col] < m["_b"]]
        out = (
            m.rename(columns={leaf_col: "u", "_b": "v"})
            .groupby(["u", "v"], as_index=False)
            .agg(cn=("_w", "size"), aa=("_w", "sum"))
        )
        out["cn"] = out["cn"].astype("int64")
        return out

    def pair_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["u", "v"], as_index=False).agg(
            cn=("cn", "sum"), aa=("aa", "sum")
        )
        out["cn"] = out["cn"].astype("int64")
        return out

    return bucketed_group_reduce(
        hubs.map_batches(wedges, batch_format="pandas"),
        key_cols=["u", "v"],
        reduce_fn=pair_sum,
        num_buckets=num_buckets,
    )


def _lpa_round(
    s: np.ndarray, d: np.ndarray, nodes: np.ndarray, labels: np.ndarray
) -> np.ndarray:
    """One synchronous LPA round over directed half-edge arrays
    (s receives d's label): counts per (node, neighbor label) via one
    lexsort-free np.unique pass, winner = (count desc, label asc).
    ``nodes`` must be sorted; returns the new label array."""
    si = np.searchsorted(nodes, s)
    nl = labels[np.searchsorted(nodes, d)]
    pairs = np.stack([si, nl], axis=1)
    uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
    # per node: max count, tie -> smallest label. Sort by
    # (node asc, count desc, label asc) and take the first row.
    order = np.lexsort((uniq[:, 1], -cnt, uniq[:, 0]))
    uo = uniq[order]
    first = np.ones(len(uo), dtype=bool)
    first[1:] = uo[1:, 0] != uo[:-1, 0]
    new = labels.copy()
    new[uo[first, 0]] = uo[first, 1]
    return new


def label_propagation(
    edges: "rd.Dataset",
    rounds: int = 5,
    u_col: str = "u",
    v_col: str = "v",
    num_buckets: int | None = None,
    driver_limit: int = TRI_DRIVER_LIMIT,
) -> "rd.Dataset":
    """``rounds`` rounds of SYNCHRONOUS label propagation (Raghavan,
    Albert & Kumara 2007, deterministic variant): every node starts
    labeled with its own id; each round every node simultaneously
    adopts the most frequent label among its NEIGHBORS (its own label
    does not vote), ties to the smallest label. A FIXED round count —
    not convergence detection — keeps the op deterministic under the
    oscillations synchronous LPA is known for (a lone edge swaps
    labels forever) and lets a recursive-CTE oracle replay it exactly,
    round for round. Returns (node, community) after ``rounds``
    rounds, community = the surviving label (a node id).

    Scale shape: label state is V-bounded driver state (the documented
    pagerank/bfs/k_core iterative exception); per round ONE E-bounded
    pass over the (materialized, reused) edge set — each batch looks
    its endpoints' labels up in the broadcast (nodes, labels) arrays
    and emits per-batch (node, label, count) partials — followed by
    ONE node-bucketed reduce and a V-bounded pull. Edge sets ≤
    ``driver_limit`` rows run the identical rounds driver-resident
    (the `_tri_driver` precedent); ``driver_limit=0`` forces the
    distributed path."""
    import ray

    from kgflow.ops.shuffle import bucketed_group_reduce

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        u = df[u_col].to_numpy(dtype=np.int64)
        v = df[v_col].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"s": np.concatenate([u, v]), "d": np.concatenate([v, u])}
        )

    e = (
        edges.select_columns([u_col, v_col])
        .map_batches(prep, batch_format="pandas")
        .materialize()
    )

    if driver_limit > 0 and e.count() <= 2 * driver_limit:
        edf = e.to_pandas()
        s = edf["s"].to_numpy(dtype=np.int64)
        d = edf["d"].to_numpy(dtype=np.int64)
        nodes = np.unique(s)
        labels = nodes.copy()
        for _ in range(rounds):
            labels = _lpa_round(s, d, nodes, labels)
        return rd.from_pandas(
            pd.DataFrame({"node": nodes, "community": labels})
        )

    # distributed rounds: per-block (node, label) count partials
    # against the broadcast label map, one node-keyed reduce per round
    nodes = (
        bucketed_group_reduce(
            e.map_batches(
                lambda df: pd.DataFrame({"node": np.unique(df["s"])}),
                batch_format="pandas",
            ),
            key_cols=["node"],
            reduce_fn=lambda g: g.drop_duplicates(),
            num_buckets=num_buckets,
        )
        .to_pandas()["node"]
        .to_numpy(dtype=np.int64)
    )
    nodes = np.sort(nodes)
    labels = nodes.copy()

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["node", "lab"], as_index=False)["c"].sum()
        g = g.sort_values(
            ["node", "c", "lab"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        return g.drop_duplicates("node")[["node", "lab"]]

    for _ in range(rounds):
        lref = ray.put((nodes, labels))

        def emit(df: pd.DataFrame, _l=lref) -> pd.DataFrame:
            nds, lbs = ray.get(_l)
            sarr = df["s"].to_numpy(dtype=np.int64)
            darr = df["d"].to_numpy(dtype=np.int64)
            t = pd.DataFrame(
                {"node": sarr, "lab": lbs[np.searchsorted(nds, darr)]}
            )
            return t.groupby(["node", "lab"], as_index=False).size().rename(
                columns={"size": "c"}
            )

        ndf = bucketed_group_reduce(
            e.map_batches(emit, batch_format="pandas"),
            key_cols=["node"],
            reduce_fn=pick,
            num_buckets=num_buckets,
        ).to_pandas()  # V-bounded pull (iterative state)
        ndf = ndf.sort_values("node")
        new = labels.copy()
        new[np.searchsorted(nodes, ndf["node"].to_numpy(dtype=np.int64))] = (
            ndf["lab"].to_numpy(dtype=np.int64)
        )
        labels = new
    return rd.from_pandas(pd.DataFrame({"node": nodes, "community": labels}))


def jaccard_link_scores(
    ds: "rd.Dataset",
    hub_col: str,
    leaf_col: str,
    max_degree: int = 10_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Neighbor-set Jaccard link prediction over a bipartite edge set
    (Liben-Nowell & Kleinberg 2003's baseline): for every leaf pair
    (u < v) sharing ≥ 1 hub, jac = |N(u) ∩ N(v)| / |N(u) ∪ N(v)| where
    N(x) is x's distinct hub set. Returns
    (u, v, cn, deg_u, deg_v, jac) — cn and the degrees are exact int64
    so the ratio is one deterministic IEEE division on both engine and
    oracle.

    Scale shape: the `adamic_adar_scores` skeleton — distinct edges
    dedup through ONE hub-keyed exchange, wedge fan-out is quadratic in
    hub degree only with the same LOUD ``max_degree`` failure, pair
    partials combine per block before ONE pair-keyed sum; leaf degrees
    come from ONE leaf-keyed distinct-count reduce (V-bounded output)
    and attach via two auto-broadcast-or-shuffle `hash_join`s."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce

    def dedup(d: pd.DataFrame) -> pd.DataFrame:
        return d.drop_duplicates([hub_col, leaf_col])

    hubs = bucketed_group_reduce(
        ds.select_columns([hub_col, leaf_col]).map_batches(
            dedup, batch_format="pandas"
        ),
        key_cols=[hub_col],
        reduce_fn=dedup,
        num_buckets=num_buckets,
    ).materialize()  # globally distinct edges: feeds wedges AND degrees
    # (the per-block dedup above is only a combiner — leaf degrees must
    # count DISTINCT edges, so they read this post-exchange stream)

    def wedges(d: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in ("u", "v", "cn")}
            )
        deg = d.groupby(hub_col, sort=False)[leaf_col].transform("size")
        if int(deg.max()) > max_degree:
            hot = d.loc[deg.idxmax(), hub_col]
            raise ValueError(
                f"jaccard_link_scores: hub {hot!r} has degree "
                f"{int(deg.max())} (max_degree={max_degree}); filter the "
                f"graph or raise the cap"
            )
        d = d[deg.to_numpy() >= 2]
        m = d.merge(
            d[[hub_col, leaf_col]].rename(columns={leaf_col: "_b"}),
            on=hub_col,
        )
        m = m[m[leaf_col] < m["_b"]]
        out = (
            m.rename(columns={leaf_col: "u", "_b": "v"})
            .groupby(["u", "v"], as_index=False)
            .size()
            .rename(columns={"size": "cn"})
        )
        out["cn"] = out["cn"].astype("int64")
        return out

    pairs = bucketed_group_reduce(
        hubs.map_batches(wedges, batch_format="pandas"),
        key_cols=["u", "v"],
        reduce_fn=lambda g: g.groupby(["u", "v"], as_index=False)["cn"]
        .sum()
        .astype({"cn": "int64"}),
        num_buckets=num_buckets,
    )

    def leaf_deg_partial(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby(leaf_col, as_index=False)[hub_col].size()
        return g.rename(columns={leaf_col: "leaf", "size": "deg"}).astype(
            {"deg": "int64"}
        )

    deg = bucketed_group_reduce(
        hubs.map_batches(leaf_deg_partial, batch_format="pandas"),
        key_cols=["leaf"],
        reduce_fn=lambda g: g.groupby("leaf", as_index=False)["deg"]
        .sum()
        .astype({"deg": "int64"}),
        num_buckets=num_buckets,
    )

    du = deg.map_batches(
        lambda d: d.rename(columns={"leaf": "u", "deg": "deg_u"}),
        batch_format="pandas",
    )
    dv = deg.map_batches(
        lambda d: d.rename(columns={"leaf": "v", "deg": "deg_v"}),
        batch_format="pandas",
    )
    out = hash_join(hash_join(pairs, du, on="u"), dv, on="v")

    def finish(d: pd.DataFrame) -> pd.DataFrame:
        cn = d["cn"].to_numpy(dtype=np.int64)
        a = d["deg_u"].to_numpy(dtype=np.int64)
        b = d["deg_v"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "u": d["u"].to_numpy(dtype=np.int64),
                "v": d["v"].to_numpy(dtype=np.int64),
                "cn": cn,
                "deg_u": a,
                "deg_v": b,
                "jac": cn / (a + b - cn),
            }
        )

    return out.map_batches(finish, batch_format="pandas")


def _scc_driver(edf: pd.DataFrame) -> pd.DataFrame:
    """Driver-resident Kosaraju SCC over a bounded (src, dst) edge
    frame — same output contract as the distributed coloring path
    (scc_id = smallest member id) via a different exact algorithm
    (two iterative DFS sweeps, O(V+E), no round caps needed)."""
    src = edf["src"].to_numpy(dtype=np.int64)
    dst = edf["dst"].to_numpy(dtype=np.int64)
    nodes = np.unique(np.concatenate([src, dst]))
    n = len(nodes)
    if n == 0:
        return pd.DataFrame(
            {
                "node": pd.Series([], dtype="int64"),
                "scc_id": pd.Series([], dtype="int64"),
            }
        )
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    fwd: list[list[int]] = [[] for _ in range(n)]
    rev: list[list[int]] = [[] for _ in range(n)]
    for a, b in zip(si.tolist(), di.tolist()):
        fwd[a].append(b)
        rev[b].append(a)

    # pass 1: DFS finish order on the forward graph (iterative stack)
    seen = np.zeros(n, dtype=bool)
    order: list[int] = []
    for root in range(n):
        if seen[root]:
            continue
        seen[root] = True
        stack: list[list[int]] = [[root, 0]]
        while stack:
            u, i = stack[-1]
            if i < len(fwd[u]):
                stack[-1][1] = i + 1
                v = fwd[u][i]
                if not seen[v]:
                    seen[v] = True
                    stack.append([v, 0])
            else:
                order.append(u)
                stack.pop()

    # pass 2: reverse-graph DFS in reverse finish order
    comp = np.full(n, -1, dtype=np.int64)
    for u in reversed(order):
        if comp[u] != -1:
            continue
        comp[u] = u
        st = [u]
        while st:
            x = st.pop()
            for y in rev[x]:
                if comp[y] == -1:
                    comp[y] = u
                    st.append(y)

    out = pd.DataFrame({"node": nodes, "g": comp})
    out["scc_id"] = out.groupby("g")["node"].transform("min")
    return out[["node", "scc_id"]].astype("int64")


def strongly_connected_components(
    edges: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int | None = None,
    driver_limit: int = TRI_DRIVER_LIMIT,
    max_peel_rounds: int = 64,
    max_prop_rounds: int = 512,
) -> "rd.Dataset":
    """EXACT strongly connected components over a DIRECTED edge list:
    returns (node, scc_id) where scc_id is the smallest member id of
    the node's SCC — the directed counterpart of `linking.cc` (the KG
    use: cycle detection in is-a/part-of taxonomies, mutual-link
    cores in the crawl domain graph; every SCC of size > 1 is a
    cycle the reference's triple post-processing would never find).

    Distributed path = the classic max-id COLORING algorithm (Orzan's
    forward-max / backward-collect scheme, the standard Pregel-style
    SCC): per peel round (1) propagate the max node id forward along
    active edges to fixpoint — each iteration is ONE E-bounded pass
    (broadcast color array, per-batch dst-max combiner) + one
    node-keyed max reduce + a ≤V-row driver pull; (2) each color
    class has exactly one root (the class max, color[r]==r); collect
    the root's SCC by backward BFS within its color class (same
    E-bounded pass shape); (3) label members scc_id = min member id
    and deactivate. The overall-max active node is always a root, so
    every round peels ≥1 SCC. The color/active arrays are V-bounded
    driver state — the same documented iterative-state exception as
    `pagerank`/`bfs_hops`.

    Loud caps, not silent ones: an adversarial id-decreasing DAG
    chain needs O(chain) peel rounds — past ``max_peel_rounds`` /
    ``max_prop_rounds`` this raises with the unresolved count rather
    than degrading. Edge sets ≤ ``driver_limit`` rows run
    driver-resident Kosaraju instead (`_scc_driver`, the
    `_tri_driver`/CC precedent); ``driver_limit=0`` forces the
    distributed path (tests pin driver == distributed).
    """
    import ray

    from kgflow.ops.shuffle import bucketed_group_reduce

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df[src_col].to_numpy(dtype=np.int64),
                "dst": df[dst_col].to_numpy(dtype=np.int64),
            }
        )

    e = (
        edges.select_columns([src_col, dst_col])
        .map_batches(prep, batch_format="pandas")
        .materialize()  # E-bounded; re-read every propagation pass
    )

    empty = pd.DataFrame(
        {
            "node": pd.Series([], dtype="int64"),
            "scc_id": pd.Series([], dtype="int64"),
        }
    )
    if e.count() == 0:
        return rd.from_pandas(empty)

    if driver_limit > 0 and e.count() <= driver_limit:
        return rd.from_pandas(_scc_driver(e.to_pandas()))

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.unique(
                    np.concatenate(
                        [df["src"].to_numpy(), df["dst"].to_numpy()]
                    )
                )
            }
        )

    nd = bucketed_group_reduce(
        e.map_batches(node_partial, batch_format="pandas"),
        key_cols=["node"],
        reduce_fn=lambda g: g.drop_duplicates(),
        num_buckets=num_buckets,
    ).to_pandas()  # V-bounded pull (iterative state, pagerank precedent)
    node_ids = np.sort(nd["node"].to_numpy(dtype=np.int64))
    n_nodes = len(node_ids)

    scc = np.full(n_nodes, -1, dtype=np.int64)
    active = np.ones(n_nodes, dtype=bool)

    for _peel in range(max_peel_rounds):
        if not active.any():
            break
        color = node_ids.copy()

        # (1) forward max-id propagation to fixpoint
        for _it in range(max_prop_rounds):
            ref = ray.put((node_ids, color, active))

            def push(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
                ids, col, act = ray.get(_r)
                s = df["src"].to_numpy(dtype=np.int64)
                d = df["dst"].to_numpy(dtype=np.int64)
                a = np.searchsorted(ids, s)
                b = np.searchsorted(ids, d)
                m = act[a] & act[b] & (col[a] > col[b])
                if not m.any():
                    return pd.DataFrame(
                        {
                            "node": pd.Series([], dtype="int64"),
                            "c": pd.Series([], dtype="int64"),
                        }
                    )
                g = pd.DataFrame({"node": d[m], "c": col[a[m]]})
                return g.groupby("node", as_index=False)["c"].max()

            upd = bucketed_group_reduce(
                e.map_batches(push, batch_format="pandas"),
                key_cols=["node"],
                reduce_fn=lambda g: g.groupby("node", as_index=False)[
                    "c"
                ].max(),
                num_buckets=num_buckets,
            ).to_pandas()  # ≤V rows (iterative state)
            if upd.empty:
                break
            at = np.searchsorted(node_ids, upd["node"].to_numpy(np.int64))
            newc = upd["c"].to_numpy(np.int64)
            better = newc > color[at]
            if not better.any():
                break
            color[at[better]] = newc[better]
        else:
            raise RuntimeError(
                "strongly_connected_components: forward propagation "
                f"exceeded max_prop_rounds={max_prop_rounds}"
            )

        # (2) backward collect within each color class from its root
        member = active & (color == node_ids)
        frontier = node_ids[member]
        while frontier.size:
            ref = ray.put((node_ids, color, active, member, frontier))

            def back(df: pd.DataFrame, _r=ref) -> pd.DataFrame:
                ids, col, act, mem, fr = ray.get(_r)
                s = df["src"].to_numpy(dtype=np.int64)
                d = df["dst"].to_numpy(dtype=np.int64)
                a = np.searchsorted(ids, s)
                b = np.searchsorted(ids, d)
                m = (
                    act[a]
                    & act[b]
                    & (col[a] == col[b])
                    & np.isin(d, fr)
                    & ~mem[a]
                )
                return pd.DataFrame({"node": np.unique(s[m])})

            nxt = bucketed_group_reduce(
                e.map_batches(back, batch_format="pandas"),
                key_cols=["node"],
                reduce_fn=lambda g: g.drop_duplicates(),
                num_buckets=num_buckets,
            ).to_pandas()  # ≤|new frontier| rows
            if nxt.empty:
                break
            ni = np.searchsorted(
                node_ids, np.sort(nxt["node"].to_numpy(np.int64))
            )
            ni = ni[~member[ni]]
            if ni.size == 0:
                break
            member[ni] = True
            frontier = node_ids[ni]

        # (3) label scc_id = min member id per color class; deactivate
        midx = np.flatnonzero(member)
        lab = pd.DataFrame(
            {"root": color[midx], "node": node_ids[midx]}
        )
        lab["scc_id"] = lab.groupby("root")["node"].transform("min")
        scc[midx] = lab["scc_id"].to_numpy(dtype=np.int64)
        active[midx] = False
    else:
        if active.any():
            raise RuntimeError(
                "strongly_connected_components: exceeded "
                f"max_peel_rounds={max_peel_rounds} with "
                f"{int(active.sum())} nodes unresolved"
            )

    return rd.from_pandas(pd.DataFrame({"node": node_ids, "scc_id": scc}))


def reach_pairs(
    edges: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 3,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Bounded transitive closure of a directed edge list: every
    (src, dst, hops) with hops = the MINIMUM path length ≤ ``max_hops``
    from src to dst. The KG-construction use is taxonomy / is-a
    closure (materialize "x is transitively part_of y" up to a depth)
    and bounded-cycle detection — a self pair (a, a, h) certifies a
    directed cycle of length h through a.

    Scale shape: unlike `bfs_hops`/`sssp_weighted` (V-bounded driver
    state), the pair set itself can be V² ≫ driver memory, so ALL
    state stays in datasets. Per round TWO bucketed exchanges:
    (1) frontier ⋈ edges keyed on the middle node (tagged union —
    frontier pairs keyed by their dst, edges by their src; an in-bucket
    merge emits the h+1 candidates), (2) candidates anti-joined
    against the accumulated closure keyed (src, dst) so only truly new
    pairs survive (this re-ships the known closure each round: total
    exchange cost O(max_hops · |closure|), the semijoin floor for a
    level-synchronous closure). New pairs are materialized per round
    (iterative-state exception, see module docstring) and the loop
    stops early when a round adds nothing.

    Min-hop semantics are exact because rounds are BFS layers: a pair
    first produced in round h and anti-joined against all pairs of
    hops < h gets hops = h = its shortest path length. SQL-replayable
    as a recursive CTE with a hop bound + GROUP BY MIN(hops).
    """
    if max_hops < 1:
        raise ValueError("reach_pairs: max_hops must be >= 1")

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df[src_col].to_numpy(dtype=np.int64),
                "dst": df[dst_col].to_numpy(dtype=np.int64),
            }
        ).drop_duplicates()

    def _dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates()

    e = bucketed_group_reduce(
        edges.select_columns([src_col, dst_col]).map_batches(
            prep, batch_format="pandas"
        ),
        key_cols=["src", "dst"],
        reduce_fn=_dedup,
        num_buckets=num_buckets,
    ).materialize()  # distinct-edge-bounded; re-read every round

    def base_tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["hops"] = np.int64(1)
        return out

    parts = [e.map_batches(base_tag, batch_format="pandas").materialize()]
    frontier = parts[0]

    for hop in range(2, max_hops + 1):

        def f_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "src" not in df.columns:
                return pd.DataFrame(
                    {
                        "mid": pd.Series([], dtype="int64"),
                        "val": pd.Series([], dtype="int64"),
                        "kind": pd.Series([], dtype="int8"),
                    }
                )
            return pd.DataFrame(
                {
                    "mid": df["dst"].to_numpy(dtype=np.int64),
                    "val": df["src"].to_numpy(dtype=np.int64),
                    "kind": np.zeros(len(df), dtype=np.int8),
                }
            )

        def e_tag(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "mid": df["src"].to_numpy(dtype=np.int64),
                    "val": df["dst"].to_numpy(dtype=np.int64),
                    "kind": np.ones(len(df), dtype=np.int8),
                }
            )

        def expand(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "kind" not in g.columns:
                return pd.DataFrame(
                    {
                        "src": pd.Series([], dtype="int64"),
                        "dst": pd.Series([], dtype="int64"),
                    }
                )
            f = g.loc[g["kind"] == 0, ["mid", "val"]].rename(
                columns={"val": "src"}
            )
            t = g.loc[g["kind"] == 1, ["mid", "val"]].rename(
                columns={"val": "dst"}
            )
            m = f.merge(t, on="mid")
            return m[["src", "dst"]].drop_duplicates()

        cands = bucketed_group_reduce(
            frontier.map_batches(f_tag, batch_format="pandas").union(
                e.map_batches(e_tag, batch_format="pandas")
            ),
            key_cols=["mid"],
            reduce_fn=expand,
            num_buckets=num_buckets,
        )

        def known_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "src" not in df.columns:
                return pd.DataFrame(
                    {
                        "src": pd.Series([], dtype="int64"),
                        "dst": pd.Series([], dtype="int64"),
                        "kind": pd.Series([], dtype="int8"),
                    }
                )
            return pd.DataFrame(
                {
                    "src": df["src"].to_numpy(dtype=np.int64),
                    "dst": df["dst"].to_numpy(dtype=np.int64),
                    "kind": np.zeros(len(df), dtype=np.int8),
                }
            )

        def cand_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "src" not in df.columns:
                return pd.DataFrame(
                    {
                        "src": pd.Series([], dtype="int64"),
                        "dst": pd.Series([], dtype="int64"),
                        "kind": pd.Series([], dtype="int8"),
                    }
                )
            return pd.DataFrame(
                {
                    "src": df["src"].to_numpy(dtype=np.int64),
                    "dst": df["dst"].to_numpy(dtype=np.int64),
                    "kind": np.ones(len(df), dtype=np.int8),
                }
            )

        known = parts[0]
        for p in parts[1:]:
            known = known.union(p)

        def anti(g: pd.DataFrame, _h=hop) -> pd.DataFrame:
            empty = pd.DataFrame(
                {
                    "src": pd.Series([], dtype="int64"),
                    "dst": pd.Series([], dtype="int64"),
                    "hops": pd.Series([], dtype="int64"),
                }
            )
            if not len(g) or "kind" not in g.columns:
                return empty
            k = g.loc[g["kind"] == 0, ["src", "dst"]].drop_duplicates()
            c = g.loc[g["kind"] == 1, ["src", "dst"]].drop_duplicates()
            if not len(c):
                return empty
            m = c.merge(k, on=["src", "dst"], how="left", indicator=True)
            new = m.loc[m["_merge"] == "left_only", ["src", "dst"]]
            if not len(new):
                return empty
            new = new.copy()
            new["hops"] = np.int64(_h)
            return new

        new_pairs = bucketed_group_reduce(
            known.map_batches(known_tag, batch_format="pandas").union(
                cands.map_batches(cand_tag, batch_format="pandas")
            ),
            key_cols=["src", "dst"],
            reduce_fn=anti,
            num_buckets=num_buckets,
        ).materialize()  # new-pair-bounded; next round's frontier

        if new_pairs.count() == 0:
            break
        parts.append(new_pairs)
        frontier = new_pairs

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _topo_driver(edf: pd.DataFrame) -> pd.DataFrame:
    """Driver-resident longest-path layering via Kahn's algorithm —
    identical output contract to the distributed rounds, including
    both cycle errors (any unprocessed node means a cycle)."""
    e = edf[["src", "dst"]].drop_duplicates()
    nodes = np.unique(
        np.concatenate(
            [e["src"].to_numpy(np.int64), e["dst"].to_numpy(np.int64)]
        )
    )
    idx = {int(n): i for i, n in enumerate(nodes)}
    indeg = np.zeros(len(nodes), dtype=np.int64)
    adj: list[list[int]] = [[] for _ in nodes]
    for s, d in zip(
        e["src"].to_numpy(np.int64), e["dst"].to_numpy(np.int64)
    ):
        adj[idx[int(s)]].append(idx[int(d)])
        indeg[idx[int(d)]] += 1
    layer = np.zeros(len(nodes), dtype=np.int64)
    stack = [i for i in range(len(nodes)) if indeg[i] == 0]
    if not stack and len(nodes):
        raise ValueError(
            "topo_layers: cycle detected — no source node "
            f"(all {len(nodes)} nodes have an incoming edge)"
        )
    done = 0
    while stack:
        u = stack.pop()
        done += 1
        for v in adj[u]:
            if layer[u] + 1 > layer[v]:
                layer[v] = layer[u] + 1
            indeg[v] -= 1
            if indeg[v] == 0:
                stack.append(v)
    if done < len(nodes):
        raise ValueError(
            "topo_layers: cycle detected — "
            f"{len(nodes) - done} nodes unreachable from any source"
        )
    return pd.DataFrame({"node": nodes, "layer": layer})


def topo_layers(
    edges: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int | None = None,
    max_rounds: int | None = None,
    driver_limit: int = TRI_DRIVER_LIMIT,
) -> "rd.Dataset":
    """Topological layering of a DAG: (node, layer) where layer is the
    LONGEST path length from any source (a node with no incoming
    edge) — the hierarchy-level assignment for an is-a taxonomy, and a
    schedule depth for dependency graphs. Raises ``ValueError`` on a
    cycle: either the max-relaxation fails to converge within V rounds
    (a cycle reachable from a source inflates layers forever) or the
    fixpoint leaves nodes uncovered (a cycle no source can reach).

    Scale shape: longest-path max-relaxation with the frontier
    optimization (only nodes whose layer grew last round re-offer) —
    per round ONE E-bounded pass over the (reused, materialized) edge
    set with a broadcast (nodes, layers) frontier + one node-bucketed
    max-reduce; the driver holds the V-bounded layer table (the same
    documented iterative exception as `pagerank`/`bfs_hops`). Rounds =
    longest path length ≤ V; total O(L·E) — the level-synchronous
    price vs a sequential O(E) topological sort, paid for never
    holding the edge set in one process. Integer layers are hash-exact
    in SQL: a recursive CTE from the source set with GROUP BY
    MAX(len) replays it.

    Edge sets ≤ ``driver_limit`` rows run driver-resident Kahn
    (`_topo_driver`, the `_tri_driver`/`_scc_driver` precedent) —
    identical output including both cycle errors; ``driver_limit=0``
    forces the distributed rounds (tests pin driver == distributed).
    """
    import ray

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df[src_col].to_numpy(dtype=np.int64),
                "dst": df[dst_col].to_numpy(dtype=np.int64),
            }
        ).drop_duplicates()

    if driver_limit > 0 and edges.count() <= driver_limit:
        edf = edges.select_columns([src_col, dst_col]).to_pandas()
        edf = edf.rename(columns={src_col: "src", dst_col: "dst"})
        return rd.from_pandas(_topo_driver(edf))

    e = (
        edges.select_columns([src_col, dst_col])
        .map_batches(prep, batch_format="pandas")
        .materialize()
    )

    # ONE exchange computes the V-bounded (node, has_incoming) table
    def node_tag(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.concatenate(
                    [
                        df["src"].to_numpy(dtype=np.int64),
                        df["dst"].to_numpy(dtype=np.int64),
                    ]
                ),
                "inc": np.concatenate(
                    [
                        np.zeros(len(df), dtype=np.int8),
                        np.ones(len(df), dtype=np.int8),
                    ]
                ),
            }
        ).groupby("node", as_index=False)["inc"].max()

    def node_red(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "node" not in g.columns:
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype="int64"),
                    "inc": pd.Series([], dtype="int8"),
                }
            )
        return g.groupby("node", as_index=False)["inc"].max()

    ndf = bucketed_group_reduce(
        e.map_batches(node_tag, batch_format="pandas"),
        key_cols=["node"],
        reduce_fn=node_red,
        num_buckets=num_buckets,
    ).to_pandas()  # V-bounded pull (iterative driver state)

    empty_out = pd.DataFrame(
        {
            "node": pd.Series([], dtype="int64"),
            "layer": pd.Series([], dtype="int64"),
        }
    )
    if "node" not in ndf.columns or not len(ndf):
        return rd.from_pandas(empty_out)

    n_nodes = len(ndf)
    sources = ndf.loc[ndf["inc"] == 0, "node"].to_numpy(dtype=np.int64)
    if not len(sources):
        raise ValueError(
            "topo_layers: cycle detected — no source node "
            f"(all {n_nodes} nodes have an incoming edge)"
        )

    layer: dict[int, int] = {int(n): 0 for n in sources}
    f_nodes = np.sort(sources)
    f_layers = np.zeros(len(f_nodes), dtype=np.int64)
    rounds_cap = max_rounds if max_rounds is not None else n_nodes + 1

    converged = False
    for _r in range(rounds_cap):
        f_ref = ray.put((f_nodes, f_layers))

        def relax(df: pd.DataFrame, _f=f_ref) -> pd.DataFrame:
            fn, fl = ray.get(_f)
            s = df["src"].to_numpy(dtype=np.int64)
            idx = np.searchsorted(fn, s)
            idx_c = np.minimum(idx, len(fn) - 1) if len(fn) else idx
            m = (
                (idx < len(fn)) & (fn[idx_c] == s)
                if len(fn)
                else np.zeros(len(s), dtype=bool)
            )
            d = df.loc[m]
            cand = fl[idx[m]] + 1
            out = pd.DataFrame(
                {"node": d["dst"].to_numpy(dtype=np.int64), "layer": cand}
            )
            return out.groupby("node", as_index=False)["layer"].max()

        def max_red(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "node" not in g.columns:
                return pd.DataFrame(
                    {
                        "node": pd.Series([], dtype="int64"),
                        "layer": pd.Series([], dtype="int64"),
                    }
                )
            return g.groupby("node", as_index=False)["layer"].max()

        cand_df = bucketed_group_reduce(
            e.map_batches(relax, batch_format="pandas"),
            key_cols=["node"],
            reduce_fn=max_red,
            num_buckets=num_buckets,
        ).to_pandas()  # candidate-bounded pull (iterative driver state)

        improved_n: list[int] = []
        improved_l: list[int] = []
        if len(cand_df) and "node" in cand_df.columns:
            for n, lv in zip(
                cand_df["node"].to_numpy(dtype=np.int64),
                cand_df["layer"].to_numpy(dtype=np.int64),
            ):
                if int(lv) > layer.get(int(n), -1):
                    layer[int(n)] = int(lv)
                    improved_n.append(int(n))
                    improved_l.append(int(lv))
        if not improved_n:
            converged = True
            break
        order = np.argsort(np.array(improved_n, dtype=np.int64))
        f_nodes = np.array(improved_n, dtype=np.int64)[order]
        f_layers = np.array(improved_l, dtype=np.int64)[order]

    if not converged:
        raise ValueError(
            "topo_layers: cycle detected — layering still growing after "
            f"{rounds_cap} rounds (longest acyclic path is < V)"
        )
    if len(layer) < n_nodes:
        raise ValueError(
            "topo_layers: cycle detected — "
            f"{n_nodes - len(layer)} nodes unreachable from any source"
        )

    return rd.from_pandas(
        pd.DataFrame(
            {
                "node": np.fromiter(layer.keys(), dtype=np.int64),
                "layer": np.fromiter(layer.values(), dtype=np.int64),
            }
        )
    )


def minimum_spanning_forest(
    edges: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
    num_buckets: int | None = None,
    max_rounds: int = 64,
) -> "rd.Dataset":
    """Borůvka minimum spanning forest of an undirected weighted edge
    list: the (src, dst, w) edges of the MSF (one tree per connected
    component). Ties break on the full lexicographic key (w, src, dst)
    so the result is deterministic; with distinct weights it is THE
    unique MSF. KG/curation uses: single-link clustering backbone over
    similarity edges, redundancy-minimal entity-graph skeletons.

    Scale shape: classic log-round Borůvka — per round ONE E-bounded
    pass relabels edge endpoints through the broadcast component map
    and emits per-batch per-component minimum outgoing edges, then a
    component-bucketed min-reduce leaves ≤ C candidate rows (C =
    current component count, halving every round). The driver holds
    the V-bounded node→component array and a C-bounded union-find over
    the chosen edges (the documented iterative exception, see module
    docstring). Rounds ≤ log₂ V because every component merges at
    least pairwise each round; ``max_rounds`` is a loud backstop.
    """
    import ray

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src_col].to_numpy(dtype=np.int64)
        b = df[dst_col].to_numpy(dtype=np.int64)
        out = pd.DataFrame(
            {
                # undirected: canonical orientation src < dst
                "src": np.minimum(a, b),
                "dst": np.maximum(a, b),
                "w": df[weight_col].to_numpy(dtype=np.int64),
            }
        )
        out = out.loc[out["src"] != out["dst"]]
        # per-batch combiner: parallel edges keep the lexicographic min
        return out.sort_values(["src", "dst", "w"]).drop_duplicates(
            ["src", "dst"]
        )

    e = (
        edges.select_columns([src_col, dst_col, weight_col])
        .map_batches(prep, batch_format="pandas")
        .materialize()
    )

    # V-bounded node table (one distinct exchange)
    def node_part(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": np.unique(
                    np.concatenate(
                        [
                            df["src"].to_numpy(dtype=np.int64),
                            df["dst"].to_numpy(dtype=np.int64),
                        ]
                    )
                )
            }
        )

    def node_red(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "node" not in g.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64")})
        return g.drop_duplicates()

    ndf = bucketed_group_reduce(
        e.map_batches(node_part, batch_format="pandas"),
        key_cols=["node"],
        reduce_fn=node_red,
        num_buckets=num_buckets,
    ).to_pandas()  # V-bounded pull (iterative driver state)

    empty_out = pd.DataFrame(
        {
            "src": pd.Series([], dtype="int64"),
            "dst": pd.Series([], dtype="int64"),
            "w": pd.Series([], dtype="int64"),
        }
    )
    if "node" not in ndf.columns or not len(ndf):
        return rd.from_pandas(empty_out)

    nodes = np.sort(ndf["node"].to_numpy(dtype=np.int64))
    comp = nodes.copy()  # comp[i] = component label of nodes[i]

    def _find(parent: dict, x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest: list[tuple[int, int, int]] = []
    for _r in range(max_rounds):
        c_ref = ray.put((nodes, comp))

        def min_out(df: pd.DataFrame, _c=c_ref) -> pd.DataFrame:
            nn, cc = ray.get(_c)
            s = df["src"].to_numpy(dtype=np.int64)
            d = df["dst"].to_numpy(dtype=np.int64)
            cs = cc[np.searchsorted(nn, s)]
            cd = cc[np.searchsorted(nn, d)]
            m = cs != cd
            if not m.any():
                return pd.DataFrame(
                    {
                        "c": pd.Series([], dtype="int64"),
                        "w": pd.Series([], dtype="int64"),
                        "src": pd.Series([], dtype="int64"),
                        "dst": pd.Series([], dtype="int64"),
                    }
                )
            sub = pd.DataFrame(
                {
                    # each endpoint's component bids for the edge
                    "c": np.concatenate([cs[m], cd[m]]),
                    "w": np.tile(df.loc[m, "w"].to_numpy(dtype=np.int64), 2),
                    "src": np.tile(s[m], 2),
                    "dst": np.tile(d[m], 2),
                }
            )
            return (
                sub.sort_values(["c", "w", "src", "dst"])
                .drop_duplicates("c")
            )

        def min_red(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "c" not in g.columns:
                return pd.DataFrame(
                    {
                        "c": pd.Series([], dtype="int64"),
                        "w": pd.Series([], dtype="int64"),
                        "src": pd.Series([], dtype="int64"),
                        "dst": pd.Series([], dtype="int64"),
                    }
                )
            return (
                g.sort_values(["c", "w", "src", "dst"])
                .drop_duplicates("c")
            )

        chosen = bucketed_group_reduce(
            e.map_batches(min_out, batch_format="pandas"),
            key_cols=["c"],
            reduce_fn=min_red,
            num_buckets=num_buckets,
        ).to_pandas()  # C-bounded pull (halves every round)

        if "c" not in chosen.columns or not len(chosen):
            break

        # C-bounded union-find over current component labels
        parent = {int(c): int(c) for c in np.unique(comp)}
        merged = False
        for w, s_, d_ in (
            chosen[["w", "src", "dst"]]
            .sort_values(["w", "src", "dst"])
            .itertuples(index=False)
        ):
            cs = _find(parent, int(comp[np.searchsorted(nodes, int(s_))]))
            cd = _find(parent, int(comp[np.searchsorted(nodes, int(d_))]))
            if cs == cd:
                continue  # the other endpoint already chose this edge
            parent[max(cs, cd)] = min(cs, cd)
            forest.append((int(s_), int(d_), int(w)))
            merged = True
        if not merged:
            break
        comp = np.array(
            [_find(parent, int(c)) for c in comp], dtype=np.int64
        )
    else:
        raise RuntimeError(
            f"minimum_spanning_forest: not converged in {max_rounds} rounds"
        )

    if not forest:
        return rd.from_pandas(empty_out)
    out = pd.DataFrame(forest, columns=["src", "dst", "w"]).sort_values(
        ["w", "src", "dst"]
    )
    return rd.from_pandas(out.reset_index(drop=True))


def _chains_driver(mdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-resident chain resolution with path memoization —
    identical output contract to the doubling rounds, including the
    non-functional and cycle errors."""
    mdf = mdf.drop_duplicates()  # identical repeat rows are harmless
    dup = mdf["src"].duplicated()
    if dup.any():
        raise ValueError(
            "resolve_pointer_chains: mapping is not functional — "
            f"src={int(mdf.loc[dup, 'src'].iloc[0])} has multiple "
            "destinations"
        )
    nxt = dict(
        zip(mdf["src"].astype(np.int64), mdf["dst"].astype(np.int64))
    )
    final: dict[int, tuple[int, int]] = {}
    for start in nxt:
        path = []
        cur = start
        seen = set()
        while cur in nxt and cur not in final:
            if cur in seen:
                raise ValueError(
                    "resolve_pointer_chains: cycle detected — src="
                    f"{cur} never reaches a terminal"
                )
            seen.add(cur)
            path.append(cur)
            cur = int(nxt[cur])
        end, extra = final.get(cur, (cur, 0))
        for i, p in enumerate(reversed(path)):
            final[p] = (end, extra + i + 1)
    out = pd.DataFrame(
        {
            "src": np.fromiter(final.keys(), dtype=np.int64),
            "final": np.fromiter(
                (v[0] for v in final.values()), dtype=np.int64
            ),
            "chain_len": np.fromiter(
                (v[1] for v in final.values()), dtype=np.int64
            ),
        }
    )
    return out


def resolve_pointer_chains(
    mapping: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 40,
    num_buckets: int | None = None,
    driver_limit: int = TRI_DRIVER_LIMIT,
) -> "rd.Dataset":
    """Resolve a FUNCTIONAL mapping (each src exactly one dst) to its
    terminal: (src, final, chain_len) where final is the first node
    with no outgoing mapping and chain_len the number of hops. The
    crawl/KG uses: HTTP redirect chains to the final URL, alias→alias
    →canonical entity chains, symlink-style id forwarding.

    Scale shape: pointer DOUBLING, not step-following — the pointer
    table P(src → cur, len) self-joins each round (tagged union keyed
    on the left copy's cur vs the right copy's src, ONE bucketed
    exchange), so every unresolved pointer composes with the pointer
    at its target and surviving chain length doubles: rounds =
    ⌈log₂ longest-chain⌉, each O(|mapping|) exchange, all state
    dataset-resident (materialized per round, the iterative-state
    exception). A cycle never resolves — after ``max_rounds`` (2^40
    hops) unresolved rows raise LOUDLY with a sample src.

    Functionality is validated in-bucket (duplicate src fails loudly).
    SQL-replayable as a recursive CTE following single steps.

    Mappings ≤ ``driver_limit`` rows run driver-resident with path
    memoization (`_chains_driver`) — identical output including both
    errors; ``driver_limit=0`` forces the doubling rounds (tests pin
    driver == distributed).
    """
    import ray  # noqa: F401  (parity with sibling iterative ops)

    if driver_limit > 0 and mapping.count() <= driver_limit:
        mdf = mapping.select_columns([src_col, dst_col]).to_pandas()
        mdf = mdf.rename(columns={src_col: "src", dst_col: "dst"})
        return rd.from_pandas(_chains_driver(mdf))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch combiner: identical repeat rows are harmless (the
        # in-bucket functional check sees post-exchange distinct rows)
        d = (
            df[[src_col, dst_col]]
            .drop_duplicates()
            .reset_index(drop=True)
        )
        return pd.DataFrame(
            {
                "src": d[src_col].to_numpy(dtype=np.int64),
                "cur": d[dst_col].to_numpy(dtype=np.int64),
                "len": np.ones(len(d), dtype=np.int64),
                "done": np.zeros(len(d), dtype=np.int8),
            }
        )

    ptr = (
        mapping.select_columns([src_col, dst_col])
        .map_batches(prep, batch_format="pandas")
        .materialize()
    )

    EMPTY = pd.DataFrame(
        {
            "src": pd.Series([], dtype="int64"),
            "cur": pd.Series([], dtype="int64"),
            "len": pd.Series([], dtype="int64"),
            "done": pd.Series([], dtype="int8"),
        }
    )

    for _r in range(max_rounds):
        def l_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "cur" not in df.columns:
                out = EMPTY.copy()
                out["key"] = pd.Series([], dtype="int64")
                out["side"] = pd.Series([], dtype="int8")
                return out
            out = df.copy()
            out["key"] = out["cur"].where(out["done"] == 0, out["src"])
            out["side"] = np.zeros(len(out), dtype=np.int8)
            return out

        def r_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "cur" not in df.columns:
                out = EMPTY.copy()
                out["key"] = pd.Series([], dtype="int64")
                out["side"] = pd.Series([], dtype="int8")
                return out
            out = df.copy()
            out["key"] = out["src"]
            out["side"] = np.ones(len(out), dtype=np.int8)
            return out

        def jump(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "side" not in g.columns:
                return EMPTY.copy()
            left = g.loc[
                g["side"] == 0, ["key", "src", "cur", "len", "done"]
            ].drop_duplicates()  # cross-batch identical rows fold here
            right = (
                g.loc[g["side"] == 1, ["key", "cur", "len"]]
                .rename(columns={"cur": "r_cur", "len": "r_len"})
                .drop_duplicates()
            )
            if right["key"].duplicated().any():
                dup = int(right.loc[right["key"].duplicated(), "key"].iloc[0])
                raise ValueError(
                    "resolve_pointer_chains: mapping is not functional — "
                    f"src={dup} has multiple destinations"
                )
            m = left.merge(right, on="key", how="left")
            live = (m["done"] == 0) & m["r_cur"].notna()
            # unresolved pointer whose target also points: compose
            cur = m["cur"].to_numpy(dtype=np.int64)
            ln = m["len"].to_numpy(dtype=np.int64)
            done = m["done"].to_numpy(dtype=np.int8)
            lv = live.to_numpy()
            cur[lv] = m.loc[live, "r_cur"].to_numpy(dtype=np.int64)
            ln[lv] = ln[lv] + m.loc[live, "r_len"].to_numpy(dtype=np.int64)
            # unresolved pointer whose target is terminal: done
            done[((m["done"] == 0) & ~m["r_cur"].notna()).to_numpy()] = 1
            return pd.DataFrame(
                {"src": m["src"], "cur": cur, "len": ln, "done": done}
            )

        new_ptr = bucketed_group_reduce(
            ptr.map_batches(l_tag, batch_format="pandas").union(
                ptr.map_batches(r_tag, batch_format="pandas")
            ),
            key_cols=["key"],
            reduce_fn=jump,
            num_buckets=num_buckets,
        ).materialize()  # |mapping|-bounded iterative state

        ptr = new_ptr
        n = ptr.count()
        n_live = n - int(ptr.sum(on="done") or 0) if n else 0
        if n_live == 0:
            break
    else:
        sample = ptr.map_batches(
            lambda df: df.loc[df["done"] == 0, ["src"]].head(1),
            batch_format="pandas",
        ).take(1)
        raise ValueError(
            "resolve_pointer_chains: cycle detected — src="
            f"{sample[0]['src']} unresolved after {max_rounds} doubling "
            "rounds"
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "src" not in df.columns:
            return pd.DataFrame(
                {
                    "src": pd.Series([], dtype="int64"),
                    "final": pd.Series([], dtype="int64"),
                    "chain_len": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "src": df["src"].astype(np.int64),
                "final": df["cur"].astype(np.int64),
                "chain_len": df["len"].astype(np.int64),
            }
        )

    return ptr.map_batches(finish, batch_format="pandas")


def _temporal_driver(
    edf: pd.DataFrame, max_hops: int
) -> pd.DataFrame:
    """Driver-resident earliest-arrival rounds — identical Bellman-Ford
    semantics to the distributed path."""
    e = edf[["src", "dst", "t"]].drop_duplicates()
    best: dict[tuple[int, int], int] = {}
    for a, b, t in zip(
        e["src"].to_numpy(np.int64),
        e["dst"].to_numpy(np.int64),
        e["t"].to_numpy(np.int64),
    ):
        k = (int(a), int(b))
        if k not in best or t < best[k]:
            best[k] = int(t)
    frontier = dict(best)
    es = e.sort_values(["src", "t"])
    by_src: dict[int, list[tuple[int, int]]] = {}
    for a, b, t in zip(
        es["src"].to_numpy(np.int64),
        es["dst"].to_numpy(np.int64),
        es["t"].to_numpy(np.int64),
    ):
        by_src.setdefault(int(a), []).append((int(b), int(t)))
    for _ in range(1, max_hops):
        nxt: dict[tuple[int, int], int] = {}
        for (a, mid), arr in frontier.items():
            for b, t in by_src.get(mid, ()):
                if t >= arr:
                    k = (a, b)
                    if k not in best or t < best[k]:
                        if k not in nxt or t < nxt[k]:
                            nxt[k] = t
        if not nxt:
            break
        best.update(nxt)
        frontier = nxt
    if not best:
        return pd.DataFrame(
            {
                "src": pd.Series([], dtype="int64"),
                "dst": pd.Series([], dtype="int64"),
                "arr": pd.Series([], dtype="int64"),
            }
        )
    ks = np.array(list(best.keys()), dtype=np.int64)
    return pd.DataFrame(
        {
            "src": ks[:, 0],
            "dst": ks[:, 1],
            "arr": np.fromiter(best.values(), dtype=np.int64),
        }
    )


def temporal_reach(
    edges: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    ts_col: str = "t",
    max_hops: int = 3,
    num_buckets: int | None = None,
    driver_limit: int = TRI_DRIVER_LIMIT,
) -> "rd.Dataset":
    """Earliest-arrival TEMPORAL reachability: (src, dst, arr) where
    arr is the minimum arrival time over time-respecting paths of ≤
    ``max_hops`` edges (each edge departs no earlier than the previous
    edge's time — the provenance/influence-chain semantics: "a fact
    asserted at t can only propagate through later captures"). Unlike
    `reach_pairs`, pairs can IMPROVE across rounds (a longer path may
    arrive earlier), so rounds merge by MIN rather than anti-join.

    Scale shape (mirrors `reach_pairs`): all pair state stays
    dataset-resident; per round ONE mid-keyed expansion exchange
    (frontier pairs keyed by their endpoint, edges by src; in-bucket
    merge applies the t ≥ arr constraint vectorized) + ONE
    (src, dst)-keyed min-merge that emits the improved pairs as the
    next frontier. Keeping only the minimum arrival per pair is safe:
    any continuation legal from a later arrival is legal from an
    earlier one (domination). Edge sets ≤ ``driver_limit`` run
    driver-resident; ``driver_limit=0`` forces the rounds.
    SQL-replayable as a hop-bounded recursive CTE with the time
    constraint in the join and GROUP BY MIN(arr).
    """
    if max_hops < 1:
        raise ValueError("temporal_reach: max_hops must be >= 1")

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "src": df[src_col].to_numpy(dtype=np.int64),
                "dst": df[dst_col].to_numpy(dtype=np.int64),
                "t": df[ts_col].to_numpy(dtype=np.int64),
            }
        )
        # ALL distinct times per pair must survive — a later parallel
        # edge can be the only one departing after a path's arrival
        # (min-folding parallel edges here would be WRONG); only exact
        # (src, dst, t) duplicates fold
        return out.drop_duplicates()

    if driver_limit > 0 and edges.count() <= driver_limit:
        edf = edges.select_columns([src_col, dst_col, ts_col]).to_pandas()
        edf = edf.rename(
            columns={src_col: "src", dst_col: "dst", ts_col: "t"}
        )
        return rd.from_pandas(_temporal_driver(edf, max_hops))

    e = (
        edges.select_columns([src_col, dst_col, ts_col])
        .map_batches(prep, batch_format="pandas")
        .materialize()
    )

    def base_tag(df: pd.DataFrame) -> pd.DataFrame:
        # per-batch min per pair; cross-batch duplicates fold at the
        # first (src, dst)-keyed min-merge, and a dominated frontier
        # row only re-offers continuations the smaller arr also makes
        out = pd.DataFrame(
            {
                "src": df["src"],
                "dst": df["dst"],
                "arr": df["t"].astype(np.int64),
            }
        )
        return out.groupby(["src", "dst"], as_index=False)["arr"].min()

    known = e.map_batches(base_tag, batch_format="pandas")
    if max_hops == 1:
        # no merge round will fold cross-batch duplicates — do it here
        def base_fold(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "src" not in g.columns:
                return pd.DataFrame(
                    {
                        "src": pd.Series([], dtype="int64"),
                        "dst": pd.Series([], dtype="int64"),
                        "arr": pd.Series([], dtype="int64"),
                    }
                )
            return g.groupby(["src", "dst"], as_index=False)["arr"].min()

        return bucketed_group_reduce(
            known, key_cols=["src", "dst"], reduce_fn=base_fold,
            num_buckets=num_buckets,
        )
    frontier = known
    EMPTY_PAIRS = pd.DataFrame(
        {
            "src": pd.Series([], dtype="int64"),
            "dst": pd.Series([], dtype="int64"),
            "arr": pd.Series([], dtype="int64"),
        }
    )

    for _hop in range(1, max_hops):

        def f_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "src" not in df.columns:
                return pd.DataFrame(
                    {
                        "mid": pd.Series([], dtype="int64"),
                        "a": pd.Series([], dtype="int64"),
                        "v": pd.Series([], dtype="int64"),
                        "kind": pd.Series([], dtype="int8"),
                    }
                )
            return pd.DataFrame(
                {
                    "mid": df["dst"].to_numpy(dtype=np.int64),
                    "a": df["src"].to_numpy(dtype=np.int64),
                    "v": df["arr"].to_numpy(dtype=np.int64),
                    "kind": np.zeros(len(df), dtype=np.int8),
                }
            )

        def e_tag(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "mid": df["src"].to_numpy(dtype=np.int64),
                    "a": df["dst"].to_numpy(dtype=np.int64),
                    "v": df["t"].to_numpy(dtype=np.int64),
                    "kind": np.ones(len(df), dtype=np.int8),
                }
            )

        def expand(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "kind" not in g.columns:
                return EMPTY_PAIRS.copy()
            f = g.loc[g["kind"] == 0, ["mid", "a", "v"]].rename(
                columns={"a": "src", "v": "arr"}
            )
            t_ = g.loc[g["kind"] == 1, ["mid", "a", "v"]].rename(
                columns={"a": "dst", "v": "t"}
            )
            m = f.merge(t_, on="mid")
            m = m.loc[m["t"] >= m["arr"]]
            if not len(m):
                return EMPTY_PAIRS.copy()
            out = m[["src", "dst", "t"]].rename(columns={"t": "arr"})
            return out.groupby(["src", "dst"], as_index=False)["arr"].min()

        cands = bucketed_group_reduce(
            frontier.map_batches(f_tag, batch_format="pandas").union(
                e.map_batches(e_tag, batch_format="pandas")
            ),
            key_cols=["mid"],
            reduce_fn=expand,
            num_buckets=num_buckets,
        )

        def k_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "src" not in df.columns:
                out = EMPTY_PAIRS.copy()
                out["kind"] = pd.Series([], dtype="int8")
                return out
            out = df[["src", "dst", "arr"]].copy()
            out["kind"] = np.zeros(len(out), dtype=np.int8)
            return out

        def c_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "src" not in df.columns:
                out = EMPTY_PAIRS.copy()
                out["kind"] = pd.Series([], dtype="int8")
                return out
            out = df[["src", "dst", "arr"]].copy()
            out["kind"] = np.ones(len(out), dtype=np.int8)
            return out

        def merge_min(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "kind" not in g.columns:
                out = EMPTY_PAIRS.copy()
                out["new"] = pd.Series([], dtype="int8")
                return out
            k = (
                g.loc[g["kind"] == 0]
                .groupby(["src", "dst"], as_index=False)["arr"]
                .min()
                .rename(columns={"arr": "k_arr"})
            )
            c = (
                g.loc[g["kind"] == 1]
                .groupby(["src", "dst"], as_index=False)["arr"]
                .min()
                .rename(columns={"arr": "c_arr"})
            )
            # nullable Int64 BEFORE the outer merge — letting pandas
            # upcast the missing side to float64 would corrupt µs
            # timestamps (> 2^53) and overflow an int64 sentinel
            k["k_arr"] = k["k_arr"].astype("Int64")
            c["c_arr"] = c["c_arr"].astype("Int64")
            m = k.merge(c, on=["src", "dst"], how="outer")
            INF = np.iinfo(np.int64).max
            ka = m["k_arr"].fillna(INF).to_numpy(dtype=np.int64)
            ca = m["c_arr"].fillna(INF).to_numpy(dtype=np.int64)
            arr = np.minimum(ka, ca)
            improved = ca < ka
            return pd.DataFrame(
                {
                    "src": m["src"].astype(np.int64),
                    "dst": m["dst"].astype(np.int64),
                    "arr": arr,
                    "new": improved.astype(np.int8),
                }
            )

        merged = bucketed_group_reduce(
            known.map_batches(k_tag, batch_format="pandas").union(
                cands.map_batches(c_tag, batch_format="pandas")
            ),
            key_cols=["src", "dst"],
            reduce_fn=merge_min,
            num_buckets=num_buckets,
        ).materialize()  # closure-bounded iterative state

        def strip(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "src" not in df.columns:
                return EMPTY_PAIRS.copy()
            return df[["src", "dst", "arr"]]

        def only_new(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "new" not in df.columns:
                return EMPTY_PAIRS.copy()
            return df.loc[df["new"] == 1, ["src", "dst", "arr"]]

        frontier = merged.map_batches(
            only_new, batch_format="pandas"
        ).materialize()
        known = merged.map_batches(strip, batch_format="pandas")
        if frontier.count() == 0:
            break

    return known


#: LCG-style mixing constants for the deterministic walk step pick —
#: shared VERBATIM with the SQL oracle (HUGEINT modular arithmetic)
WALK_A = 6364136223846793005
WALK_B = 1442695040888963407
WALK_C = 1234567


def _walk_hash(walk_ids: np.ndarray, step: int) -> np.ndarray:
    """uint64-wrapping mix of (walk_id, step) — numpy's modular
    uint64 arithmetic equals the oracle's % 2^64 HUGEINT form."""
    return (
        walk_ids.astype(np.uint64) * np.uint64(WALK_A)
        + np.uint64(step) * np.uint64(WALK_B)
        + np.uint64(WALK_C)
    )


def _walks_driver(edf: pd.DataFrame, steps: int) -> pd.DataFrame:
    adj: dict[int, np.ndarray] = {
        int(s): np.sort(g["dst"].unique()).astype(np.int64)
        for s, g in edf.groupby("src")
    }
    nodes = np.unique(
        np.concatenate(
            [edf["src"].to_numpy(np.int64), edf["dst"].to_numpy(np.int64)]
        )
    )
    rows = [(int(n), 0, int(n)) for n in nodes]
    cur = {int(n): int(n) for n in nodes}
    for step in range(1, steps + 1):
        nxt: dict[int, int] = {}
        if not cur:
            break
        wids = np.fromiter(cur.keys(), dtype=np.int64, count=len(cur))
        h = _walk_hash(wids, step)
        for wid, hv in zip(wids, h):
            node = cur[int(wid)]
            nbrs = adj.get(node)
            if nbrs is None:
                continue  # sink: the walk stops
            nx = int(nbrs[int(hv % np.uint64(len(nbrs)))])
            rows.append((int(wid), step, nx))
            nxt[int(wid)] = nx
        cur = nxt
    return pd.DataFrame(rows, columns=["walk_id", "step", "node"]).astype(
        {"walk_id": "int64", "step": "int64", "node": "int64"}
    )


def deterministic_walks(
    edges: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    steps: int = 4,
    num_buckets: int | None = None,
    driver_limit: int = TRI_DRIVER_LIMIT,
) -> "rd.Dataset":
    """Deterministic random-walk corpus over a directed graph — the
    DeepWalk/node2vec training-data prep (one walk per node, ``steps``
    hops): (walk_id, step, node) with walk_id = the start node. The
    "random" neighbor pick is a seeded LCG mix of (walk_id, step)
    modulo the out-degree over the dst-sorted neighbor ranks, so the
    corpus is run-to-run identical AND SQL-replayable (recursive CTE
    joining on rank = hash % degree; constants shared verbatim). Walks
    stop at sinks (no out-edges).

    Scale shape: the ranked adjacency (src, dst, rnk, deg) builds with
    ONE src-keyed exchange and is reused every step; each step is ONE
    node-keyed tagged exchange co-locating walk positions with the
    adjacency bucket (in-bucket: vectorized hash, deg lookup, rank
    merge — no per-walk Python); walk state is dataset-resident and
    V-bounded per step. Edge sets ≤ ``driver_limit`` rows run
    driver-resident; ``driver_limit=0`` forces the rounds.
    """
    if steps < 1:
        raise ValueError("deterministic_walks: steps must be >= 1")

    if driver_limit > 0 and edges.count() <= driver_limit:
        edf = edges.select_columns([src_col, dst_col]).to_pandas()
        edf = edf.rename(columns={src_col: "src", dst_col: "dst"})
        return rd.from_pandas(_walks_driver(edf.drop_duplicates(), steps))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": df[src_col].to_numpy(dtype=np.int64),
                "dst": df[dst_col].to_numpy(dtype=np.int64),
            }
        ).drop_duplicates()

    def rank_adj(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "src" not in g.columns:
            return pd.DataFrame(
                {
                    "src": pd.Series([], dtype="int64"),
                    "dst": pd.Series([], dtype="int64"),
                    "rnk": pd.Series([], dtype="int64"),
                    "deg": pd.Series([], dtype="int64"),
                }
            )
        d = g.drop_duplicates().sort_values(["src", "dst"])
        d["rnk"] = d.groupby("src").cumcount().astype(np.int64)
        d["deg"] = d.groupby("src")["dst"].transform("size").astype(np.int64)
        return d

    adj = bucketed_group_reduce(
        edges.select_columns([src_col, dst_col]).map_batches(
            prep, batch_format="pandas"
        ),
        key_cols=["src"],
        reduce_fn=rank_adj,
        num_buckets=num_buckets,
    ).materialize()  # E-bounded; reused every step

    # start one walk per node (V-bounded distinct exchange)
    def node_part(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["src", "dst"] if "src" in df.columns else []
        if not cols or not len(df):
            return pd.DataFrame({"node": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {
                "node": np.unique(
                    np.concatenate(
                        [
                            df["src"].to_numpy(np.int64),
                            df["dst"].to_numpy(np.int64),
                        ]
                    )
                )
            }
        )

    def node_red(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "node" not in g.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64")})
        return g.drop_duplicates()

    starts = bucketed_group_reduce(
        adj.map_batches(node_part, batch_format="pandas"),
        key_cols=["node"],
        reduce_fn=node_red,
        num_buckets=num_buckets,
    )

    def start_rows(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "node" not in df.columns:
            return pd.DataFrame(
                {
                    "walk_id": pd.Series([], dtype="int64"),
                    "step": pd.Series([], dtype="int64"),
                    "node": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "walk_id": df["node"].astype(np.int64),
                "step": np.zeros(len(df), dtype=np.int64),
                "node": df["node"].astype(np.int64),
            }
        )

    parts = [
        starts.map_batches(start_rows, batch_format="pandas").materialize()
    ]
    cur = parts[0]

    EMPTY_W = pd.DataFrame(
        {
            "walk_id": pd.Series([], dtype="int64"),
            "step": pd.Series([], dtype="int64"),
            "node": pd.Series([], dtype="int64"),
        }
    )

    for step in range(1, steps + 1):

        def w_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "walk_id" not in df.columns:
                return pd.DataFrame(
                    {
                        "key": pd.Series([], dtype="int64"),
                        "walk_id": pd.Series([], dtype="int64"),
                        "dst": pd.Series([], dtype="int64"),
                        "rnk": pd.Series([], dtype="int64"),
                        "deg": pd.Series([], dtype="int64"),
                        "kind": pd.Series([], dtype="int8"),
                    }
                )
            return pd.DataFrame(
                {
                    "key": df["node"].astype(np.int64),
                    "walk_id": df["walk_id"].astype(np.int64),
                    "dst": np.zeros(len(df), dtype=np.int64),
                    "rnk": np.zeros(len(df), dtype=np.int64),
                    "deg": np.zeros(len(df), dtype=np.int64),
                    "kind": np.zeros(len(df), dtype=np.int8),
                }
            )

        def a_tag(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["src"].astype(np.int64),
                    "walk_id": np.zeros(len(df), dtype=np.int64),
                    "dst": df["dst"].astype(np.int64),
                    "rnk": df["rnk"].astype(np.int64),
                    "deg": df["deg"].astype(np.int64),
                    "kind": np.ones(len(df), dtype=np.int8),
                }
            )

        def advance(g: pd.DataFrame, _s=step) -> pd.DataFrame:
            if not len(g) or "kind" not in g.columns:
                return EMPTY_W.copy()
            w = g.loc[g["kind"] == 0, ["key", "walk_id"]]
            a = g.loc[g["kind"] == 1, ["key", "dst", "rnk", "deg"]]
            if not len(w) or not len(a):
                return EMPTY_W.copy()
            degs = a[["key", "deg"]].drop_duplicates()
            m = w.merge(degs, on="key")  # sinks drop out here
            if not len(m):
                return EMPTY_W.copy()
            h = _walk_hash(m["walk_id"].to_numpy(np.int64), _s)
            m["rnk"] = (
                h % m["deg"].to_numpy(np.int64).astype(np.uint64)
            ).astype(np.int64)
            out = m.merge(a[["key", "rnk", "dst"]], on=["key", "rnk"])
            return pd.DataFrame(
                {
                    "walk_id": out["walk_id"].astype(np.int64),
                    "step": np.full(len(out), _s, dtype=np.int64),
                    "node": out["dst"].astype(np.int64),
                }
            )

        nxt = bucketed_group_reduce(
            cur.map_batches(w_tag, batch_format="pandas").union(
                adj.map_batches(a_tag, batch_format="pandas")
            ),
            key_cols=["key"],
            reduce_fn=advance,
            num_buckets=num_buckets,
        ).materialize()  # V-bounded walk state per step

        if nxt.count() == 0:
            break
        parts.append(nxt)
        cur = nxt

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def _brandes_driver(
    edf: pd.DataFrame, seeds: list[int] | None, undirected: bool
) -> pd.DataFrame:
    """Driver-resident Brandes (2001) — identical conventions to the
    distributed path: unweighted shortest paths, directed δ sums (no
    /2 for undirected inputs), endpoints excluded."""
    s = edf["src"].to_numpy(np.int64)
    d = edf["dst"].to_numpy(np.int64)
    if undirected:
        s, d = np.concatenate([s, d]), np.concatenate([d, s])
    ee = pd.DataFrame({"s": s, "d": d}).drop_duplicates()
    adj: dict[int, list[int]] = {}
    for a, b in zip(ee["s"].to_numpy(np.int64), ee["d"].to_numpy(np.int64)):
        adj.setdefault(int(a), []).append(int(b))
    nodes = np.unique(np.concatenate([s, d])) if len(s) else np.array([], np.int64)
    bc: dict[int, float] = {int(n): 0.0 for n in nodes}
    seed_list = [int(x) for x in (seeds if seeds is not None else nodes)]
    for src in seed_list:
        if src not in bc:
            continue
        dist = {src: 0}
        sigma = {src: 1.0}
        order = [src]
        qi = 0
        while qi < len(order):
            v = order[qi]
            qi += 1
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for x in adj.get(w, ()):
                if dist.get(x) == dist[w] + 1:
                    delta[w] += sigma[w] / sigma[x] * (1.0 + delta[x])
            if w != src:
                bc[w] += delta[w]
    return pd.DataFrame(
        {
            "node": np.fromiter(bc.keys(), dtype=np.int64),
            "bc": np.fromiter(bc.values(), dtype=np.float64),
        }
    )


def betweenness_centrality(
    edges: "rd.Dataset",
    seeds: list[int] | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    undirected: bool = True,
    num_buckets: int | None = None,
    driver_limit: int = TRI_DRIVER_LIMIT,
    max_levels: int = 64,
) -> "rd.Dataset":
    """Betweenness centrality (Brandes 2001): (node, bc) where bc(v) =
    Σ_{s≠v≠t} σ_st(v)/σ_st over the seed set s (all nodes = exact;
    a sample = the standard unbiased estimator scaled by the caller).
    Directed δ-sum convention (an undirected input counts each
    ordered pair once per direction — callers wanting the classic
    undirected value halve it); endpoints excluded. The KG use:
    broker/bridge entities whose removal disconnects communities.

    Scale shape (distributed path): ALL seeds advance level-
    synchronously together — state rows are (seed, node, σ) so the
    exchange volume is O(V·|seeds|) not per-seed jobs. Forward: per
    BFS level ONE mid-keyed expansion exchange (frontier × adjacency,
    in-bucket σ partial sums) + ONE (seed, node)-keyed exchange that
    simultaneously sums σ across buckets AND anti-joins the visited
    set (the `reach_pairs` pattern — levels are materialized,
    dataset-resident). Backward: per level ONE w-keyed exchange
    emitting (1+δ_w)/σ_w credits along reversed edges + ONE
    (seed, v)-keyed exchange joining σ_v and summing credits; δ rows
    accumulate and a final node-keyed sum yields bc. Floats appear
    ONLY in δ (σ is exact float-int); result is deterministic per
    topology but carries IEEE sum-order noise — rows-only, gated by
    driver == distributed + brute parity. Edge sets ≤ ``driver_limit``
    run driver-resident Brandes; ``driver_limit=0`` forces the rounds.
    """

    if driver_limit > 0 and edges.count() <= driver_limit:
        edf = edges.select_columns([src_col, dst_col]).to_pandas()
        edf = edf.rename(columns={src_col: "src", dst_col: "dst"})
        return rd.from_pandas(_brandes_driver(edf, seeds, undirected))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src_col].to_numpy(dtype=np.int64)
        b = df[dst_col].to_numpy(dtype=np.int64)
        if undirected:
            a, b = np.concatenate([a, b]), np.concatenate([b, a])
        return pd.DataFrame({"src": a, "dst": b}).drop_duplicates()

    e = (
        edges.select_columns([src_col, dst_col])
        .map_batches(prep, batch_format="pandas")
        .materialize()
    )

    # seed rows: (seed, node=seed, sigma=1) — all nodes when seeds=None
    def node_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "src" not in df.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {
                "node": np.unique(
                    np.concatenate(
                        [
                            df["src"].to_numpy(np.int64),
                            df["dst"].to_numpy(np.int64),
                        ]
                    )
                )
            }
        )

    def node_red(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "node" not in g.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64")})
        return g.drop_duplicates()

    all_nodes = bucketed_group_reduce(
        e.map_batches(node_part, batch_format="pandas"),
        key_cols=["node"],
        reduce_fn=node_red,
        num_buckets=num_buckets,
    ).materialize()

    if seeds is not None:
        import ray

        seed_ref = ray.put(np.asarray(sorted(set(map(int, seeds))), np.int64))

        def mk_seed(df: pd.DataFrame, _s=seed_ref) -> pd.DataFrame:
            import ray as _r

            want = _r.get(_s)
            n = df["node"].to_numpy(np.int64)
            n = n[np.isin(n, want)]
            return pd.DataFrame(
                {
                    "seed": n,
                    "node": n,
                    "sigma": np.ones(len(n), dtype=np.float64),
                }
            )
    else:

        def mk_seed(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "node" not in df.columns:
                return pd.DataFrame(
                    {
                        "seed": pd.Series([], dtype="int64"),
                        "node": pd.Series([], dtype="int64"),
                        "sigma": pd.Series([], dtype="float64"),
                    }
                )
            n = df["node"].to_numpy(np.int64)
            return pd.DataFrame(
                {
                    "seed": n,
                    "node": n,
                    "sigma": np.ones(len(n), dtype=np.float64),
                }
            )

    levels = [
        all_nodes.map_batches(mk_seed, batch_format="pandas").materialize()
    ]

    EMPTY_ST = pd.DataFrame(
        {
            "seed": pd.Series([], dtype="int64"),
            "node": pd.Series([], dtype="int64"),
            "sigma": pd.Series([], dtype="float64"),
        }
    )

    # ---- forward BFS levels ----
    for _lvl in range(1, max_levels + 1):
        frontier = levels[-1]

        def f_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "seed" not in df.columns:
                out = EMPTY_ST.copy()
                out["key"] = pd.Series([], dtype="int64")
                out["kind"] = pd.Series([], dtype="int8")
                return out
            return pd.DataFrame(
                {
                    "key": df["node"].astype(np.int64),
                    "seed": df["seed"].astype(np.int64),
                    "node": df["node"].astype(np.int64),
                    "sigma": df["sigma"].astype(np.float64),
                    "kind": np.zeros(len(df), dtype=np.int8),
                }
            )

        def e_tag(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["src"].astype(np.int64),
                    "seed": np.zeros(len(df), dtype=np.int64),
                    "node": df["dst"].astype(np.int64),
                    "sigma": np.zeros(len(df), dtype=np.float64),
                    "kind": np.ones(len(df), dtype=np.int8),
                }
            )

        def expand(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "kind" not in g.columns:
                return EMPTY_ST.copy()
            f = g.loc[g["kind"] == 0, ["key", "seed", "sigma"]]
            t_ = g.loc[g["kind"] == 1, ["key", "node"]]
            if not len(f) or not len(t_):
                return EMPTY_ST.copy()
            m = f.merge(t_, on="key")
            return m.groupby(["seed", "node"], as_index=False)[
                "sigma"
            ].sum()

        cand = bucketed_group_reduce(
            frontier.map_batches(f_tag, batch_format="pandas").union(
                e.map_batches(e_tag, batch_format="pandas")
            ),
            key_cols=["key"],
            reduce_fn=expand,
            num_buckets=num_buckets,
        )

        # sum σ partials per (seed, node) AND drop already-visited
        def v_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "seed" not in df.columns:
                out = EMPTY_ST.copy()
                out["kind"] = pd.Series([], dtype="int8")
                return out
            out = df[["seed", "node", "sigma"]].copy()
            out["kind"] = np.zeros(len(out), dtype=np.int8)
            return out

        def c_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "seed" not in df.columns:
                out = EMPTY_ST.copy()
                out["kind"] = pd.Series([], dtype="int8")
                return out
            out = df[["seed", "node", "sigma"]].copy()
            out["kind"] = np.ones(len(out), dtype=np.int8)
            return out

        def fold_new(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "kind" not in g.columns:
                return EMPTY_ST.copy()
            seen = g.loc[g["kind"] == 0, ["seed", "node"]].drop_duplicates()
            c = g.loc[g["kind"] == 1]
            if not len(c):
                return EMPTY_ST.copy()
            cs = c.groupby(["seed", "node"], as_index=False)["sigma"].sum()
            m = cs.merge(seen, on=["seed", "node"], how="left", indicator=True)
            return m.loc[
                m["_merge"] == "left_only", ["seed", "node", "sigma"]
            ]

        visited = levels[0]
        for p in levels[1:]:
            visited = visited.union(p)

        nxt = bucketed_group_reduce(
            visited.map_batches(v_tag, batch_format="pandas").union(
                cand.map_batches(c_tag, batch_format="pandas")
            ),
            key_cols=["seed", "node"],
            reduce_fn=fold_new,
            num_buckets=num_buckets,
        ).materialize()

        if nxt.count() == 0:
            break
        levels.append(nxt)
    else:
        raise RuntimeError(
            f"betweenness_centrality: BFS exceeded max_levels={max_levels}"
        )

    # ---- backward accumulation ----
    # delta state per level, deepest first (deepest δ = 0)
    def zero_delta(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "seed" not in df.columns:
            out = EMPTY_ST.copy()
            out["delta"] = pd.Series([], dtype="float64")
            return out
        out = df[["seed", "node", "sigma"]].copy()
        out["delta"] = np.zeros(len(out), dtype=np.float64)
        return out

    delta_levels: list = [None] * len(levels)
    delta_levels[-1] = levels[-1].map_batches(
        zero_delta, batch_format="pandas"
    ).materialize()

    for d_ in range(len(levels) - 2, -1, -1):
        below = delta_levels[d_ + 1]

        def w_tag(df: pd.DataFrame) -> pd.DataFrame:
            # credit each (seed, w): (1 + δ_w) / σ_w, keyed by w
            if not len(df) or "seed" not in df.columns:
                return pd.DataFrame(
                    {
                        "key": pd.Series([], dtype="int64"),
                        "seed": pd.Series([], dtype="int64"),
                        "node": pd.Series([], dtype="int64"),
                        "val": pd.Series([], dtype="float64"),
                        "kind": pd.Series([], dtype="int8"),
                    }
                )
            return pd.DataFrame(
                {
                    "key": df["node"].astype(np.int64),
                    "seed": df["seed"].astype(np.int64),
                    "node": df["node"].astype(np.int64),
                    "val": (1.0 + df["delta"].astype(np.float64))
                    / df["sigma"].astype(np.float64),
                    "kind": np.zeros(len(df), dtype=np.int8),
                }
            )

        def r_tag(df: pd.DataFrame) -> pd.DataFrame:
            # reversed edges keyed by dst: contribution flows dst -> src
            return pd.DataFrame(
                {
                    "key": df["dst"].astype(np.int64),
                    "seed": np.zeros(len(df), dtype=np.int64),
                    "node": df["src"].astype(np.int64),
                    "val": np.zeros(len(df), dtype=np.float64),
                    "kind": np.ones(len(df), dtype=np.int8),
                }
            )

        def credit(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "kind" not in g.columns:
                return EMPTY_ST.rename(columns={"sigma": "cred"}).copy()
            w = g.loc[g["kind"] == 0, ["key", "seed", "val"]]
            r = g.loc[g["kind"] == 1, ["key", "node"]]
            if not len(w) or not len(r):
                return EMPTY_ST.rename(columns={"sigma": "cred"}).copy()
            m = w.merge(r, on="key")
            out = m.groupby(["seed", "node"], as_index=False)["val"].sum()
            return out.rename(columns={"val": "cred"})

        creds = bucketed_group_reduce(
            below.map_batches(w_tag, batch_format="pandas").union(
                e.map_batches(r_tag, batch_format="pandas")
            ),
            key_cols=["key"],
            reduce_fn=credit,
            num_buckets=num_buckets,
        )

        def s_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "seed" not in df.columns:
                out = EMPTY_ST.copy()
                out["kind"] = pd.Series([], dtype="int8")
                return out
            out = df[["seed", "node", "sigma"]].copy()
            out["kind"] = np.zeros(len(out), dtype=np.int8)
            return out

        def cr_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "seed" not in df.columns:
                out = EMPTY_ST.copy()
                out["kind"] = pd.Series([], dtype="int8")
                return out
            out = pd.DataFrame(
                {
                    "seed": df["seed"].astype(np.int64),
                    "node": df["node"].astype(np.int64),
                    "sigma": df["cred"].astype(np.float64),
                }
            )
            out["kind"] = np.ones(len(out), dtype=np.int8)
            return out

        def join_delta(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "kind" not in g.columns:
                out = EMPTY_ST.copy()
                out["delta"] = pd.Series([], dtype="float64")
                return out
            st = g.loc[g["kind"] == 0, ["seed", "node", "sigma"]]
            cr = (
                g.loc[g["kind"] == 1, ["seed", "node", "sigma"]]
                .groupby(["seed", "node"], as_index=False)
                .sum()
                .rename(columns={"sigma": "cred"})
            )
            if not len(st):
                out = EMPTY_ST.copy()
                out["delta"] = pd.Series([], dtype="float64")
                return out
            m = st.merge(cr, on=["seed", "node"], how="left")
            m["delta"] = m["sigma"].astype(np.float64) * m["cred"].fillna(
                0.0
            ).astype(np.float64)
            return m[["seed", "node", "sigma", "delta"]]

        delta_levels[d_] = bucketed_group_reduce(
            levels[d_].map_batches(s_tag, batch_format="pandas").union(
                creds.map_batches(cr_tag, batch_format="pandas")
            ),
            key_cols=["seed", "node"],
            reduce_fn=join_delta,
            num_buckets=num_buckets,
        ).materialize()

    # ---- bc = Σ δ over seeds, excluding endpoints (node == seed) ----
    acc = delta_levels[0]
    for p in delta_levels[1:]:
        acc = acc.union(p)

    def d_rows(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "seed" not in df.columns:
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype="int64"),
                    "bc": pd.Series([], dtype="float64"),
                }
            )
        d = df.loc[df["node"] != df["seed"]]
        out = pd.DataFrame(
            {
                "node": d["node"].astype(np.int64),
                "bc": d["delta"].astype(np.float64),
            }
        )
        return out.groupby("node", as_index=False)["bc"].sum()

    def bc_red(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "node" not in g.columns:
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype="int64"),
                    "bc": pd.Series([], dtype="float64"),
                }
            )
        return g.groupby("node", as_index=False)["bc"].sum()

    bc = bucketed_group_reduce(
        acc.map_batches(d_rows, batch_format="pandas"),
        key_cols=["node"],
        reduce_fn=bc_red,
        num_buckets=num_buckets,
    )

    # nodes with zero betweenness must still appear
    def n_tag(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "node" not in df.columns:
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype="int64"),
                    "bc": pd.Series([], dtype="float64"),
                }
            )
        return pd.DataFrame(
            {
                "node": df["node"].astype(np.int64),
                "bc": np.zeros(len(df), dtype=np.float64),
            }
        )

    def final_red(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "node" not in g.columns:
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype="int64"),
                    "bc": pd.Series([], dtype="float64"),
                }
            )
        return g.groupby("node", as_index=False)["bc"].sum()

    return bucketed_group_reduce(
        bc.union(all_nodes.map_batches(n_tag, batch_format="pandas")),
        key_cols=["node"],
        reduce_fn=final_red,
        num_buckets=num_buckets,
    )


def _closeness_driver(edf: pd.DataFrame, undirected: bool) -> pd.DataFrame:
    s = edf["src"].to_numpy(np.int64)
    d = edf["dst"].to_numpy(np.int64)
    if undirected:
        s, d = np.concatenate([s, d]), np.concatenate([d, s])
    adj: dict[int, list[int]] = {}
    for a, b in zip(s, d):
        adj.setdefault(int(a), []).append(int(b))
    nodes = np.unique(np.concatenate([s, d])) if len(s) else np.array([], np.int64)
    rows = []
    for src in nodes:
        dist = {int(src): 0}
        q = [int(src)]
        while q:
            nq = []
            for v in q:
                for w in adj.get(v, ()):
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        nq.append(w)
            q = nq
        tot = sum(dist.values())
        n_r = len(dist) - 1
        rows.append(
            (
                int(src),
                n_r,
                tot,
                (float(n_r) / tot) if tot else 0.0,
            )
        )
    return pd.DataFrame(
        rows, columns=["node", "n_reached", "total_dist", "closeness"]
    ).astype(
        {
            "node": "int64",
            "n_reached": "int64",
            "total_dist": "int64",
            "closeness": "float64",
        }
    )


def closeness_centrality(
    edges: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    undirected: bool = True,
    num_buckets: int | None = None,
    driver_limit: int = TRI_DRIVER_LIMIT,
    max_levels: int = 256,
) -> "rd.Dataset":
    """Closeness centrality: per node (node, n_reached, total_dist,
    closeness = n_reached / total_dist) over unweighted min-hop
    distances to every reachable other node (0.0 for isolated-out
    nodes). Integer n_reached/total_dist make the result hash-exact;
    the one IEEE division is identical in SQL — so unlike
    pagerank/HITS this centrality IS oracle-able (V-bounded recursive
    CTE + GROUP BY).

    Scale shape: ALL seeds advance level-synchronously as (seed, node)
    rows (the `betweenness_centrality` forward machinery): per BFS
    level ONE mid-keyed expansion exchange + ONE (seed, node)-keyed
    distinct/anti-join exchange against the dataset-resident visited
    levels; per level a constant-size (seed, count, level·count)
    partial feeds a final seed-keyed sum. Rounds = graph diameter.
    Edge sets ≤ ``driver_limit`` rows run driver-resident BFS;
    ``driver_limit=0`` forces the rounds.
    """
    if driver_limit > 0 and edges.count() <= driver_limit:
        edf = edges.select_columns([src_col, dst_col]).to_pandas()
        edf = edf.rename(columns={src_col: "src", dst_col: "dst"})
        return rd.from_pandas(_closeness_driver(edf, undirected))

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src_col].to_numpy(dtype=np.int64)
        b = df[dst_col].to_numpy(dtype=np.int64)
        if undirected:
            a, b = np.concatenate([a, b]), np.concatenate([b, a])
        return pd.DataFrame({"src": a, "dst": b}).drop_duplicates()

    e = (
        edges.select_columns([src_col, dst_col])
        .map_batches(prep, batch_format="pandas")
        .materialize()
    )

    def node_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "src" not in df.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {
                "node": np.unique(
                    np.concatenate(
                        [
                            df["src"].to_numpy(np.int64),
                            df["dst"].to_numpy(np.int64),
                        ]
                    )
                )
            }
        )

    def node_red(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "node" not in g.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64")})
        return g.drop_duplicates()

    all_nodes = bucketed_group_reduce(
        e.map_batches(node_part, batch_format="pandas"),
        key_cols=["node"],
        reduce_fn=node_red,
        num_buckets=num_buckets,
    ).materialize()

    def mk_seed(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "node" not in df.columns:
            return pd.DataFrame(
                {
                    "seed": pd.Series([], dtype="int64"),
                    "node": pd.Series([], dtype="int64"),
                }
            )
        n = df["node"].to_numpy(np.int64)
        return pd.DataFrame({"seed": n, "node": n})

    levels = [
        all_nodes.map_batches(mk_seed, batch_format="pandas").materialize()
    ]
    EMPTY_SN = pd.DataFrame(
        {
            "seed": pd.Series([], dtype="int64"),
            "node": pd.Series([], dtype="int64"),
        }
    )
    partials: list = []  # (seed, n, sum_d) per level

    for lvl in range(1, max_levels + 1):
        frontier = levels[-1]

        def f_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "seed" not in df.columns:
                return pd.DataFrame(
                    {
                        "key": pd.Series([], dtype="int64"),
                        "seed": pd.Series([], dtype="int64"),
                        "node": pd.Series([], dtype="int64"),
                        "kind": pd.Series([], dtype="int8"),
                    }
                )
            return pd.DataFrame(
                {
                    "key": df["node"].astype(np.int64),
                    "seed": df["seed"].astype(np.int64),
                    "node": df["node"].astype(np.int64),
                    "kind": np.zeros(len(df), dtype=np.int8),
                }
            )

        def e_tag(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["src"].astype(np.int64),
                    "seed": np.zeros(len(df), dtype=np.int64),
                    "node": df["dst"].astype(np.int64),
                    "kind": np.ones(len(df), dtype=np.int8),
                }
            )

        def expand(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "kind" not in g.columns:
                return EMPTY_SN.copy()
            f = g.loc[g["kind"] == 0, ["key", "seed"]]
            t_ = g.loc[g["kind"] == 1, ["key", "node"]]
            if not len(f) or not len(t_):
                return EMPTY_SN.copy()
            return (
                f.merge(t_, on="key")[["seed", "node"]].drop_duplicates()
            )

        cand = bucketed_group_reduce(
            frontier.map_batches(f_tag, batch_format="pandas").union(
                e.map_batches(e_tag, batch_format="pandas")
            ),
            key_cols=["key"],
            reduce_fn=expand,
            num_buckets=num_buckets,
        )

        def v_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "seed" not in df.columns:
                out = EMPTY_SN.copy()
                out["kind"] = pd.Series([], dtype="int8")
                return out
            out = df[["seed", "node"]].copy()
            out["kind"] = np.zeros(len(out), dtype=np.int8)
            return out

        def c_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "seed" not in df.columns:
                out = EMPTY_SN.copy()
                out["kind"] = pd.Series([], dtype="int8")
                return out
            out = df[["seed", "node"]].copy()
            out["kind"] = np.ones(len(out), dtype=np.int8)
            return out

        def fold_new(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "kind" not in g.columns:
                return EMPTY_SN.copy()
            seen = g.loc[g["kind"] == 0, ["seed", "node"]].drop_duplicates()
            c = g.loc[g["kind"] == 1, ["seed", "node"]].drop_duplicates()
            if not len(c):
                return EMPTY_SN.copy()
            m = c.merge(seen, on=["seed", "node"], how="left", indicator=True)
            return m.loc[m["_merge"] == "left_only", ["seed", "node"]]

        visited = levels[0]
        for p in levels[1:]:
            visited = visited.union(p)

        nxt = bucketed_group_reduce(
            visited.map_batches(v_tag, batch_format="pandas").union(
                cand.map_batches(c_tag, batch_format="pandas")
            ),
            key_cols=["seed", "node"],
            reduce_fn=fold_new,
            num_buckets=num_buckets,
        ).materialize()

        if nxt.count() == 0:
            break
        levels.append(nxt)

        def lvl_part(df: pd.DataFrame, _l=lvl) -> pd.DataFrame:
            if not len(df) or "seed" not in df.columns:
                return pd.DataFrame(
                    {
                        "seed": pd.Series([], dtype="int64"),
                        "n": pd.Series([], dtype="int64"),
                        "sum_d": pd.Series([], dtype="int64"),
                    }
                )
            g = df.groupby("seed", as_index=False).size()
            return pd.DataFrame(
                {
                    "seed": g["seed"].astype(np.int64),
                    "n": g["size"].astype(np.int64),
                    "sum_d": (g["size"] * _l).astype(np.int64),
                }
            )

        partials.append(
            nxt.map_batches(lvl_part, batch_format="pandas")
        )
    else:
        raise RuntimeError(
            f"closeness_centrality: BFS exceeded max_levels={max_levels}"
        )

    def zero_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "node" not in df.columns:
            return pd.DataFrame(
                {
                    "seed": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                    "sum_d": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "seed": df["node"].astype(np.int64),
                "n": np.zeros(len(df), dtype=np.int64),
                "sum_d": np.zeros(len(df), dtype=np.int64),
            }
        )

    acc = all_nodes.map_batches(zero_part, batch_format="pandas")
    for p in partials:
        acc = acc.union(p)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "seed" not in g.columns:
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype="int64"),
                    "n_reached": pd.Series([], dtype="int64"),
                    "total_dist": pd.Series([], dtype="int64"),
                    "closeness": pd.Series([], dtype="float64"),
                }
            )
        s = g.groupby("seed", as_index=False)[["n", "sum_d"]].sum()
        tot = s["sum_d"].to_numpy(np.int64)
        n_r = s["n"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "node": s["seed"].astype(np.int64),
                "n_reached": n_r,
                "total_dist": tot,
                "closeness": np.where(
                    tot > 0, n_r / np.maximum(tot, 1), 0.0
                ),
            }
        )

    return bucketed_group_reduce(
        acc,
        key_cols=["seed"],
        reduce_fn=final,
        num_buckets=num_buckets,
    )


def eccentricity_stats(
    edges: "rd.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    undirected: bool = True,
    num_buckets: int | None = None,
    driver_limit: int = TRI_DRIVER_LIMIT,
    max_levels: int = 256,
) -> "rd.Dataset":
    """Eccentricity per node (node, ecc) = the maximum min-hop
    distance to any reachable node (0 for isolated nodes); max(ecc)
    over the output is the graph diameter, min is the radius — the
    crawl-depth / hub-placement diagnostic. Integer, hash-exact:
    oracle-able by the same V-bounded recursive-CTE closure as
    closeness with MAX instead of SUM.

    Scale shape: the `closeness_centrality` forward machinery — ALL
    seeds advance level-synchronously as (seed, node) rows, two
    exchanges per BFS level; ecc(seed) is simply the LAST level at
    which the seed gained a node, so the per-level partial is a
    (seed, level) max. Edge sets ≤ ``driver_limit`` rows run
    driver-resident BFS; ``driver_limit=0`` forces the rounds.
    """
    if driver_limit > 0 and edges.count() <= driver_limit:
        edf = edges.select_columns([src_col, dst_col]).to_pandas()
        edf = edf.rename(columns={src_col: "src", dst_col: "dst"})
        s = edf["src"].to_numpy(np.int64)
        d = edf["dst"].to_numpy(np.int64)
        if undirected:
            s, d = np.concatenate([s, d]), np.concatenate([d, s])
        adj: dict[int, list[int]] = {}
        for a, b in zip(s, d):
            adj.setdefault(int(a), []).append(int(b))
        nodes = (
            np.unique(np.concatenate([s, d]))
            if len(s)
            else np.array([], np.int64)
        )
        rows = []
        for src_ in nodes:
            dist = {int(src_): 0}
            q = [int(src_)]
            ecc = 0
            while q:
                nq = []
                for v in q:
                    for w in adj.get(v, ()):
                        if w not in dist:
                            dist[w] = dist[v] + 1
                            ecc = dist[w]
                            nq.append(w)
                q = nq
            rows.append((int(src_), ecc))
        return rd.from_pandas(
            pd.DataFrame(rows, columns=["node", "ecc"]).astype(
                {"node": "int64", "ecc": "int64"}
            )
        )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        a = df[src_col].to_numpy(dtype=np.int64)
        b = df[dst_col].to_numpy(dtype=np.int64)
        if undirected:
            a, b = np.concatenate([a, b]), np.concatenate([b, a])
        return pd.DataFrame({"src": a, "dst": b}).drop_duplicates()

    e = (
        edges.select_columns([src_col, dst_col])
        .map_batches(prep, batch_format="pandas")
        .materialize()
    )

    def node_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "src" not in df.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            {
                "node": np.unique(
                    np.concatenate(
                        [
                            df["src"].to_numpy(np.int64),
                            df["dst"].to_numpy(np.int64),
                        ]
                    )
                )
            }
        )

    def node_red(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "node" not in g.columns:
            return pd.DataFrame({"node": pd.Series([], dtype="int64")})
        return g.drop_duplicates()

    all_nodes = bucketed_group_reduce(
        e.map_batches(node_part, batch_format="pandas"),
        key_cols=["node"],
        reduce_fn=node_red,
        num_buckets=num_buckets,
    ).materialize()

    def mk_seed(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "node" not in df.columns:
            return pd.DataFrame(
                {
                    "seed": pd.Series([], dtype="int64"),
                    "node": pd.Series([], dtype="int64"),
                }
            )
        n = df["node"].to_numpy(np.int64)
        return pd.DataFrame({"seed": n, "node": n})

    levels = [
        all_nodes.map_batches(mk_seed, batch_format="pandas").materialize()
    ]
    EMPTY_SN = pd.DataFrame(
        {
            "seed": pd.Series([], dtype="int64"),
            "node": pd.Series([], dtype="int64"),
        }
    )
    ecc_partials: list = []

    for lvl in range(1, max_levels + 1):
        frontier = levels[-1]

        def f_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "seed" not in df.columns:
                return pd.DataFrame(
                    {
                        "key": pd.Series([], dtype="int64"),
                        "seed": pd.Series([], dtype="int64"),
                        "node": pd.Series([], dtype="int64"),
                        "kind": pd.Series([], dtype="int8"),
                    }
                )
            return pd.DataFrame(
                {
                    "key": df["node"].astype(np.int64),
                    "seed": df["seed"].astype(np.int64),
                    "node": df["node"].astype(np.int64),
                    "kind": np.zeros(len(df), dtype=np.int8),
                }
            )

        def e_tag(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": df["src"].astype(np.int64),
                    "seed": np.zeros(len(df), dtype=np.int64),
                    "node": df["dst"].astype(np.int64),
                    "kind": np.ones(len(df), dtype=np.int8),
                }
            )

        def expand(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "kind" not in g.columns:
                return EMPTY_SN.copy()
            f = g.loc[g["kind"] == 0, ["key", "seed"]]
            t_ = g.loc[g["kind"] == 1, ["key", "node"]]
            if not len(f) or not len(t_):
                return EMPTY_SN.copy()
            return f.merge(t_, on="key")[["seed", "node"]].drop_duplicates()

        cand = bucketed_group_reduce(
            frontier.map_batches(f_tag, batch_format="pandas").union(
                e.map_batches(e_tag, batch_format="pandas")
            ),
            key_cols=["key"],
            reduce_fn=expand,
            num_buckets=num_buckets,
        )

        def v_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "seed" not in df.columns:
                out = EMPTY_SN.copy()
                out["kind"] = pd.Series([], dtype="int8")
                return out
            out = df[["seed", "node"]].copy()
            out["kind"] = np.zeros(len(out), dtype=np.int8)
            return out

        def c_tag(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "seed" not in df.columns:
                out = EMPTY_SN.copy()
                out["kind"] = pd.Series([], dtype="int8")
                return out
            out = df[["seed", "node"]].copy()
            out["kind"] = np.ones(len(out), dtype=np.int8)
            return out

        def fold_new(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g) or "kind" not in g.columns:
                return EMPTY_SN.copy()
            seen = g.loc[g["kind"] == 0, ["seed", "node"]].drop_duplicates()
            c = g.loc[g["kind"] == 1, ["seed", "node"]].drop_duplicates()
            if not len(c):
                return EMPTY_SN.copy()
            m = c.merge(seen, on=["seed", "node"], how="left", indicator=True)
            return m.loc[m["_merge"] == "left_only", ["seed", "node"]]

        visited = levels[0]
        for p in levels[1:]:
            visited = visited.union(p)

        nxt = bucketed_group_reduce(
            visited.map_batches(v_tag, batch_format="pandas").union(
                cand.map_batches(c_tag, batch_format="pandas")
            ),
            key_cols=["seed", "node"],
            reduce_fn=fold_new,
            num_buckets=num_buckets,
        ).materialize()

        if nxt.count() == 0:
            break
        levels.append(nxt)

        def lvl_ecc(df: pd.DataFrame, _l=lvl) -> pd.DataFrame:
            if not len(df) or "seed" not in df.columns:
                return pd.DataFrame(
                    {
                        "seed": pd.Series([], dtype="int64"),
                        "ecc": pd.Series([], dtype="int64"),
                    }
                )
            s = df[["seed"]].drop_duplicates()
            return pd.DataFrame(
                {
                    "seed": s["seed"].astype(np.int64),
                    "ecc": np.full(len(s), _l, dtype=np.int64),
                }
            )

        ecc_partials.append(nxt.map_batches(lvl_ecc, batch_format="pandas"))
    else:
        raise RuntimeError(
            f"eccentricity_stats: BFS exceeded max_levels={max_levels}"
        )

    def zero_ecc(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "node" not in df.columns:
            return pd.DataFrame(
                {
                    "seed": pd.Series([], dtype="int64"),
                    "ecc": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "seed": df["node"].astype(np.int64),
                "ecc": np.zeros(len(df), dtype=np.int64),
            }
        )

    acc = all_nodes.map_batches(zero_ecc, batch_format="pandas")
    for p in ecc_partials:
        acc = acc.union(p)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "seed" not in g.columns:
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype="int64"),
                    "ecc": pd.Series([], dtype="int64"),
                }
            )
        s = g.groupby("seed", as_index=False)["ecc"].max()
        return pd.DataFrame(
            {
                "node": s["seed"].astype(np.int64),
                "ecc": s["ecc"].astype(np.int64),
            }
        )

    return bucketed_group_reduce(
        acc, key_cols=["seed"], reduce_fn=final, num_buckets=num_buckets
    )
