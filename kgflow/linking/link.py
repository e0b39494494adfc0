"""Entity linking: mention extraction → LSH blocking → verified pairs →
connected components → canonical entity map.

North-rule stages (the reference emits raw surface triples only,
`/root/reference/src/openue/lit_models/transformer.py:217-226`; linking
and canonicalization have no OpenUE counterpart).

Shuffle/skew design (SURVEY.md §2.5, §4.2):

1. **Mention counts** — per-batch partial aggregation (one row per
   distinct mention per batch — the combiner) and then a SALTED
   two-phase groupby: ``groupby((mention, salt)).sum`` → ``groupby(
   mention).sum``. The fixture's hot entity (~25% of PER slots) makes
   one mention carry a large share of rows; the salt splits its partial
   rows across reducers so no single reducer sees the hot key's full
   weight.
2. **LSH blocking** — signatures/bands are computed over DISTINCT
   normalized mentions (the hot mention contributes ONE row, not one per
   occurrence), then a single ``groupby(band_id, band_hash)`` shuffle
   yields candidate buckets; pairs are Jaccard-verified inside the
   bucket. Bucket size is capped (sorted, first ``max_bucket``) so an
   adversarial band cannot go quadratic.
3. **Connected components** — iterated min-label groupby rounds
   (`kgflow.linking.cc`).
4. **Canonicalization** — cluster representative = highest total count
   (ties: lexicographically smallest); ``entity_id`` = FNV-64 of the
   canonical form. The final surface→entity map is small (vocabulary-
   bounded, not corpus-bounded) and is broadcast via ``ray.put`` for the
   map-side join onto the edge stream — hot keys never shuffle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from kgflow.linking.cc import connected_components
from kgflow.linking.minhash import MinHasher, fnv64, jaccard

_NORM_RE = re.compile(r"[^0-9a-z]+")


def normalize_mention(m: str) -> str:
    """Surface → normalized form: lowercase, strip punctuation, collapse
    whitespace ("alice - fox" → "alice fox")."""
    return " ".join(_NORM_RE.split(m.lower())).strip()


def mention_partials(
    triples: "rd.Dataset", salt_buckets: int = 16, with_norm: bool = False
) -> "rd.Dataset":
    """Per-batch combiner: (mention, partial n, rotating salt) — one row
    per distinct mention per batch. The corpus-scale pass of mention
    counting; everything downstream of it is batch-count-sized.

    ``with_norm`` also emits the normalized form per distinct mention —
    computed here, after the combiner, so normalization runs once per
    DISTINCT mention per batch instead of once per row (and it saves a
    whole map_batches operator on the entity_map path)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        # Arrow value_counts over the chunked subj+obj concat: zero-copy
        # C kernel instead of to_pylist + pandas object hashing (round-4:
        # the old layout was the single biggest linking-phase cost, ~2.3 s
        # of the 32-cpu 300k-page job's ~6 s post-extract tail)
        import pyarrow.compute as pc

        chunks = batch.column("subj").chunks + batch.column("obj").chunks
        if not chunks:  # zero-chunk empty block: chunked_array([]) raises
            chunks = [pa.array([], pa.string())]
        # drop_null mirrors the pandas value_counts the kernel replaced
        # (Arrow's value_counts counts null as a value)
        both = pc.drop_null(pa.chunked_array(chunks))
        vc = pc.value_counts(both)
        mentions = vc.field("values").to_pylist()
        out = pd.DataFrame(
            {
                "mention": pd.Series(mentions, dtype="object"),
                "n": vc.field("counts").to_numpy(zero_copy_only=False),
            }
        )
        if with_norm:
            out["norm"] = [normalize_mention(m) for m in mentions]
        # batch-varying nonce so the SAME mention draws different salts
        # in different batches (value_counts rank alone would pin the
        # hot mention to rank 0 → salt 0 in every batch)
        nonce = fnv64(mentions[0]) + len(both) if mentions else 0
        out["salt"] = (np.arange(len(out), dtype=np.int64) + nonce) % salt_buckets
        return out

    return triples.map_batches(partial, batch_format="pyarrow")


def mention_counts(
    triples: "rd.Dataset", salt_buckets: int = 16, num_buckets: int = 64
) -> "rd.Dataset":
    """triples → (mention, n): combiner + SALTED two-phase reduce.

    The fixture's hot entity appears in ~25% of triples — a bare
    ``groupby(mention)`` would funnel every row of that key through one
    reducer. Three-layer mitigation (north-rule skew handling):
    1. per-batch combiner: one (mention, partial n) row per distinct
       mention per batch — corpus-sized input becomes batch-count-sized;
    2. rotating salt on the partial rows: a hot mention's partials split
       across ``salt_buckets`` phase-1 reduce keys, so no single phase-1
       reduction sees all of them;
    3. both phases run as bucketed group-reduces (vectorized in-bucket
       pandas aggregation; see kgflow/ops/shuffle.py) — phase 2's input
       is ≤ salt_buckets rows per mention.
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    partials = mention_partials(triples, salt_buckets)
    phase1 = bucketed_group_reduce(
        partials,
        key_cols=["mention", "salt"],
        reduce_fn=lambda g: g.groupby(["mention", "salt"], as_index=False).agg(
            n=("n", "sum")
        ),
        num_buckets=num_buckets,
    )
    return bucketed_group_reduce(
        phase1,
        key_cols=["mention"],
        reduce_fn=lambda g: g.groupby("mention", as_index=False).agg(n=("n", "sum")),
        num_buckets=num_buckets,
    )


def candidate_pairs(
    norm_mentions: "rd.Dataset",
    num_hashes: int = 64,
    bands: int = 16,
    rows: int = 4,
    threshold: float = 0.5,
    max_bucket: int = 200,
    seed: int = 42,
) -> "rd.Dataset":
    """Distinct normalized mentions (column ``norm``) → verified
    near-duplicate pairs (src, dst), Jaccard ≥ threshold."""

    def band_rows(batch: pa.Table) -> pa.Table:
        hasher = MinHasher(num_hashes=num_hashes, seed=seed)
        o_band, o_hash, o_m = [], [], []
        for m in batch.column("norm").to_pylist():
            bh = hasher.band_hashes(m, bands, rows)
            for b in range(bands):
                o_band.append(b)
                o_hash.append(int(bh[b]))
                o_m.append(m)
        return pa.table(
            {
                "band_id": pa.array(o_band, pa.int32()),
                "band_hash": pa.array(np.asarray(o_hash, dtype=np.uint64)),
                "norm": pa.array(o_m, pa.string()),
            }
        )

    def coarse_pairs(g: pd.DataFrame) -> pd.DataFrame:
        from kgflow.linking.minhash import char_shingles

        # shingle sets computed ONCE per distinct mention per bucket —
        # the verify loop is O(pairs) set intersections, not O(pairs)
        # re-shinglings
        cache: dict[str, set] = {}

        def sh(m: str) -> set:
            v = cache.get(m)
            if v is None:
                v = set(char_shingles(m).tolist())
                cache[m] = v
            return v

        src, dst = [], []
        for (_, _), grp in g.groupby(["band_id", "band_hash"], sort=False):
            ms = sorted(set(grp["norm"]))[:max_bucket]
            for i in range(len(ms)):
                sa = sh(ms[i])
                for j in range(i + 1, len(ms)):
                    sb = sh(ms[j])
                    inter = len(sa & sb)
                    if inter and inter / (len(sa) + len(sb) - inter) >= threshold:
                        src.append(ms[i])
                        dst.append(ms[j])
        return pd.DataFrame(
            {"src": pd.Series(src, dtype="object"), "dst": pd.Series(dst, dtype="object")}
        )

    from kgflow.ops.shuffle import bucketed_group_reduce

    banded = norm_mentions.map_batches(band_rows, batch_format="pyarrow")
    pairs = bucketed_group_reduce(
        banded, key_cols=["band_id", "band_hash"], reduce_fn=coarse_pairs
    )
    # bands produce duplicate pairs → bucketed dedup
    return bucketed_group_reduce(
        pairs,
        key_cols=["src", "dst"],
        reduce_fn=lambda g: g.drop_duplicates(["src", "dst"]),
    )


def _driver_link(norm_counts: pd.DataFrame, seed: int = 42,
                 bands: int = 16, rows: int = 4, threshold: float = 0.5) -> pd.DataFrame:
    """Small-side linking: LSH banding + Jaccard verify + union-find on
    the driver, over the DISTINCT normalized-mention table.

    Same algorithm as the distributed path (candidate_pairs +
    connected_components) but executed locally — correct whenever the
    distinct-mention table fits on the driver (it is vocabulary-bounded:
    entity surfaces, not corpus rows). Returns (norm, canonical,
    entity_id)."""
    norms = norm_counts["norm"].tolist()
    counts = dict(zip(norm_counts["norm"], norm_counts["n"]))
    hasher = MinHasher(seed=seed)
    buckets: dict[tuple[int, int], list[str]] = {}
    for m in norms:
        bh = hasher.band_hashes(m, bands, rows)
        for b in range(bands):
            buckets.setdefault((b, int(bh[b])), []).append(m)
    parent = {m: m for m in norms}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    from kgflow.linking.minhash import char_shingles

    sh_cache: dict[str, set] = {}

    def sh(m: str) -> set:
        v = sh_cache.get(m)
        if v is None:
            v = set(char_shingles(m).tolist())
            sh_cache[m] = v
        return v

    seen: set[tuple[str, str]] = set()
    for ms in buckets.values():
        if len(ms) < 2:
            continue
        ms = sorted(set(ms))[:200]
        for i in range(len(ms)):
            sa = sh(ms[i])
            for j in range(i + 1, len(ms)):
                key = (ms[i], ms[j])
                if key in seen:
                    continue
                seen.add(key)
                sb = sh(ms[j])
                inter = len(sa & sb)
                if inter and inter / (len(sa) + len(sb) - inter) >= threshold:
                    union(ms[i], ms[j])
    clusters: dict[str, list[str]] = {}
    for m in norms:
        clusters.setdefault(find(m), []).append(m)
    out_norm, out_canon, out_eid = [], [], []
    for members in clusters.values():
        canonical = sorted(members, key=lambda m: (-counts.get(m, 0), m))[0]
        eid = int(np.uint64(fnv64(canonical)) >> np.uint64(1))
        for m in members:
            out_norm.append(m)
            out_canon.append(canonical)
            out_eid.append(eid)
    return pd.DataFrame(
        {"norm": out_norm, "canonical": out_canon, "entity_id": out_eid}
    )


def entity_map(
    triples: "rd.Dataset",
    seed: int = 42,
    mode: str = "auto",
    driver_side_limit: int = 200_000,
) -> "rd.Dataset":
    """triples → (mention, norm, entity_id, canonical, n).

    One row per observed surface mention; ``entity_id`` is shared by all
    aliases of one linked entity.

    ``mode``: "driver" reduces the combiner partials to the
    vocabulary-bounded (mention, norm, n) table with ONE distributed
    bucketed shuffle and finishes linking locally over that table;
    "distributed" additionally runs the groupby-shuffle LSH blocking and
    iterated-groupby connected components; "auto" picks driver-side
    while the distinct-mention count is under ``driver_side_limit``.

    Scale note (round-1 fix): the auto/driver decision and the driver
    pull both happen AFTER the distributed surface-count reduce, so the
    driver only ever sees the vocabulary-bounded reduced table — never
    the raw combiner partials, whose row count grows with
    (#batches × distinct-mentions-per-batch), i.e. with corpus size.
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    def add_norm(batch: pa.Table) -> pa.Table:
        norms = [normalize_mention(m) for m in batch.column("mention").to_pylist()]
        return batch.append_column("norm", pa.array(norms, pa.string()))

    surface_counts = None
    if mode != "distributed":
        # distributed reduce of the combiner partials → one row per
        # distinct surface mention (norm is a pure function of mention,
        # so "first" is exact). This is the only corpus-scale shuffle on
        # the driver path; its output is vocabulary-bounded. norm is
        # computed inside the combiner (per distinct mention per batch)
        # — no separate map operator.
        partials = mention_partials(triples, with_norm=True)
        surface_counts = bucketed_group_reduce(
            partials.select_columns(["mention", "norm", "n"]),
            key_cols=["mention"],
            reduce_fn=lambda g: g.groupby("mention", as_index=False).agg(
                norm=("norm", "first"), n=("n", "sum")
            ),
        ).materialize()
        if mode == "auto":
            # distributed distinct count — no rows touch the driver yet
            mode = (
                "driver"
                if surface_counts.count() <= driver_side_limit
                else "distributed"
            )

    if mode == "driver":
        # small-side path: linking runs in local pandas over the
        # vocabulary-bounded table — every extra Ray job on a
        # vocabulary-sized table costs seconds of scheduling for no
        # parallelism gain
        sdf = surface_counts.to_pandas()
        norm_counts_df = sdf.groupby("norm", as_index=False).agg(n=("n", "sum"))
        canon_df = _driver_link(norm_counts_df, seed=seed)
        out = sdf.merge(canon_df, on="norm", how="left")
        out = pd.DataFrame(
            {
                "mention": out["mention"],
                "norm": out["norm"],
                "entity_id": out["entity_id"].astype(np.int64),
                "canonical": out["canonical"],
                "n": out["n"].astype(np.int64),
            }
        )
        return rd.from_pandas(out)

    # distributed path: full salted mention-count reduce, then LSH
    # blocking + iterated-groupby connected components. All joins below
    # are bucketed shuffle joins with VECTORIZED in-bucket pandas merges
    # (round-1 fix: the previous per-group map_groups joins paid the
    # measured ~40x per-group overhead this module's own docstring warns
    # about).
    if surface_counts is None:
        # explicit distributed mode skipped the auto-path reduce above;
        # use the salted two-phase count (hot-key safe at corpus scale)
        surface_counts = (
            mention_counts(triples)
            .map_batches(add_norm, batch_format="pyarrow")
            .materialize()
        )
    surface = surface_counts
    norm_counts = bucketed_group_reduce(
        surface.select_columns(["norm", "n"]),
        key_cols=["norm"],
        reduce_fn=lambda g: g.groupby("norm", as_index=False).agg(n=("n", "sum")),
    ).materialize()

    pairs = candidate_pairs(norm_counts.select_columns(["norm"]), seed=seed)
    # NOTE: union requires uniform block types (mixing pandas- and
    # arrow-backed datasets breaks the groupby sort sampler) — the
    # linking subgraph standardizes on pandas blocks around unions.
    selfloops = norm_counts.map_batches(
        lambda df: pd.DataFrame({"src": df["norm"], "dst": df["norm"]}),
        batch_format="pandas",
    )
    comp = connected_components(pairs.union(selfloops))  # (node=norm, comp)

    # (node, comp) ⨝ (node=norm, n): one bucketed shuffle on node,
    # vectorized merge per bucket
    nc = norm_counts.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["norm"], "comp": [None] * len(df), "n": df["n"]}
        ),
        batch_format="pandas",
    )
    cc_rows = comp.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"], "comp": df["comp"], "n": [None] * len(df)}
        ),
        batch_format="pandas",
    )

    def attach_counts_bucket(g: pd.DataFrame) -> pd.DataFrame:
        counts = g[g["comp"].isna()][["node", "n"]]
        comps = g[g["n"].isna()][["node", "comp"]]
        out = comps.merge(counts, on="node", how="left")
        out["n"] = out["n"].fillna(0).astype(np.int64)
        return out[["node", "comp", "n"]]

    merged = bucketed_group_reduce(
        nc.union(cc_rows), key_cols=["node"], reduce_fn=attach_counts_bucket
    )

    # canonical per component: highest count, ties lexicographic —
    # one bucketed shuffle on comp; in-bucket: stable sort + groupby
    # first + merge back (no per-component Python)
    def pick_canonical_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["comp", "n", "node"], ascending=[True, False, True], kind="mergesort"
        )
        firsts = (
            g.groupby("comp", as_index=False)
            .first()[["comp", "node"]]
            .rename(columns={"node": "canonical"})
        )
        firsts["entity_id"] = firsts["canonical"].map(
            lambda c: np.int64(np.uint64(fnv64(c)) >> np.uint64(1))
        )
        out = g.merge(firsts, on="comp")
        return pd.DataFrame(
            {
                "norm": out["node"],
                "canonical": out["canonical"],
                "entity_id": out["entity_id"].astype(np.int64),
            }
        )

    canon = bucketed_group_reduce(
        merged, key_cols=["comp"], reduce_fn=pick_canonical_bucket
    )

    # surface (mention, norm, n) ⨝ canon (norm, canonical, entity_id):
    # one bucketed shuffle on norm, vectorized in-bucket merge
    s_rows = surface.map_batches(
        lambda df: pd.DataFrame(
            {
                "norm": df["norm"],
                "mention": df["mention"],
                "n": df["n"],
                "canonical": [None] * len(df),
                "entity_id": [None] * len(df),
            }
        ),
        batch_format="pandas",
    )
    c_rows = canon.map_batches(
        lambda df: pd.DataFrame(
            {
                "norm": df["norm"],
                "mention": [None] * len(df),
                "n": [None] * len(df),
                "canonical": df["canonical"],
                "entity_id": df["entity_id"],
            }
        ),
        batch_format="pandas",
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        mrows = g[g["mention"].notna()][["norm", "mention", "n"]]
        crows = g[g["canonical"].notna()][["norm", "canonical", "entity_id"]]
        out = mrows.merge(crows, on="norm", how="inner")
        return pd.DataFrame(
            {
                "mention": out["mention"],
                "norm": out["norm"],
                "entity_id": out["entity_id"].astype(np.int64),
                "canonical": out["canonical"],
                "n": out["n"].astype(np.int64),
            }
        )

    return bucketed_group_reduce(
        s_rows.union(c_rows), key_cols=["norm"], reduce_fn=join_bucket
    )


# per-worker-process cache for the broadcast entity map: the dict is
# built once per process (keyed by the ObjectRef), so the task-based
# broadcast join below pays neither actor-spawn nor a per-task rebuild
_EMAP_DICT_CACHE: dict = {}


def _emap_dict(emap_ref) -> dict:
    key = emap_ref.hex()
    d = _EMAP_DICT_CACHE.get(key)
    if d is None:
        emap: pd.DataFrame = ray.get(emap_ref)
        d = {
            m: (int(e), c)
            for m, e, c in zip(emap["mention"], emap["entity_id"], emap["canonical"])
        }
        _EMAP_DICT_CACHE.clear()  # one live map per worker is plenty
        _EMAP_DICT_CACHE[key] = d
    return d


class CanonicalizeStage:
    """Map-side broadcast join: surface mention → (entity_id, canonical).

    The entity map is ``ray.put`` once on the driver; every worker reads
    it from the object store (zero-copy for workers on the same node at
    scale, one fetch per node on a cluster) — a hot mention costs
    nothing extra, unlike a shuffle join. Round-3: runs as plain TASKS
    via ``make_canonicalize_fn`` on the flagship path (the per-process
    dict cache replaces per-actor state, saving the actor-pool spawn on
    every job); this class form is kept for callers that want an
    explicit pool.
    """

    def __init__(self, emap_ref):
        self.by_mention = _emap_dict(emap_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _canonicalize_batch(batch, self.by_mention)


def _identity_entity(mention: str) -> tuple[int, str]:
    """Unseen mention → identity cluster (hash of normalized form)."""
    norm = normalize_mention(mention)
    return (int(np.uint64(fnv64(norm)) >> np.uint64(1)), norm)


def _canonicalize_batch(batch: pa.Table, by_mention: dict) -> pa.Table:
    """Vectorized map-side join: factorize each mention column (C code),
    look up only the DISTINCT mentions in the broadcast dict, then
    gather. Lookup count drops from 2×rows to ~vocab per batch — at
    corpus scale a batch holds thousands of repeats of each hot
    mention."""
    cols: list[tuple[str, "pa.Array"]] = []
    for col, id_name, canon_name in (
        ("subj", "subj_id", "subj_canonical"),
        ("obj", "obj_id", "obj_canonical"),
    ):
        codes, uniques = pd.factorize(
            batch.column(col).to_pandas(), use_na_sentinel=False
        )
        u_ids = np.empty(len(uniques), dtype=np.int64)
        u_canon = np.empty(len(uniques), dtype=object)
        for i, m in enumerate(uniques):
            e = by_mention.get(m)
            if e is None:
                e = _identity_entity(m)
            u_ids[i] = e[0]
            u_canon[i] = e[1]
        cols.append((id_name, pa.array(u_ids[codes], pa.int64())))
        cols.append((canon_name, pa.array(u_canon[codes], pa.string())))
    for name, arr in cols:
        batch = batch.append_column(name, arr)
    return batch


def make_canonicalize_fn(emap_ref):
    """Task-form broadcast join (flagship path): each task fetches the
    broadcast map from the local object store and reuses the
    per-process dict cache — no actor pool to spawn, same output as
    ``CanonicalizeStage``."""

    def canonicalize_batch(batch: pa.Table) -> pa.Table:
        return _canonicalize_batch(batch, _emap_dict(emap_ref))

    return canonicalize_batch


def _apply_emap_shuffle(
    triples: "rd.Dataset",
    emap_ds: "rd.Dataset",
    col: str,
    id_col: str,
    canon_col: str,
    num_buckets: int = 64,
) -> "rd.Dataset":
    """Bucketed co-partitioned shuffle join: attach (entity_id,
    canonical) for the mention column ``col``.

    The scale fallback for when the entity map exceeds the broadcast
    threshold (billions of distinct mentions at 10^12 documents): both
    sides hash-partition on the mention key, the in-bucket merge is one
    vectorized pandas left-join, and unseen mentions fall back to the
    same identity-cluster hash as the broadcast path. The triple stream
    ships through the exchange once per mention column (twice total) —
    the cost the broadcast path avoids, which is why broadcast remains
    the default below the threshold.
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    import pyarrow.types as pat

    def _num_kind(typ):
        # schema types are pyarrow DataTypes for arrow blocks, numpy
        # dtypes for pandas blocks (the second mention pass sees the
        # first pass's pandas output)
        if isinstance(typ, pa.DataType):
            if pat.is_integer(typ) or pat.is_floating(typ):
                return np.dtype(typ.to_pandas_dtype())
            return None
        k = getattr(typ, "kind", None)
        return typ if k in ("i", "u", "f") else None

    schema = triples.schema()
    t_cols = schema.names
    # numeric payload columns ride the mixed-side exchange as object
    # (the map-side rows carry None there) and get their dtype back in
    # the in-bucket reduce
    restore_dtypes = {
        name: kind
        for name, typ in zip(schema.names, schema.types)
        if (kind := _num_kind(typ))
    }

    def t_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        for c in restore_dtypes:
            out[c] = out[c].astype(object)
        for c in out.columns:
            # ragged list columns arrive as Ray TensorArray extension
            # columns; the mixed-side sort-merge cannot concat those
            # with the map side's object Nones, and Ray re-promotes
            # object-of-ndarray cells back to TensorArray during sort
            # normalization — so ship plain Python lists (never
            # promoted). Per-cell tolist is acceptable here: this is
            # the above-broadcast-threshold fallback and the cells are
            # short token-id lists.
            if pd.api.types.is_extension_array_dtype(out[c].dtype) or (
                len(out) and isinstance(out[c].iloc[0], np.ndarray)
            ):
                out[c] = pd.Series(
                    [
                        v.tolist() if isinstance(v, np.ndarray) else v
                        for v in out[c]
                    ],
                    index=out.index,
                    dtype=object,
                )
        out["__mkey"] = out[col]
        out["__eid"] = pd.Series([None] * len(out), dtype="object")
        out["__canon"] = pd.Series([None] * len(out), dtype="object")
        out["__is_map"] = np.int8(0)
        return out

    def m_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({c: pd.Series([None] * len(df), dtype="object") for c in t_cols})
        out["__mkey"] = df["mention"].to_numpy()
        out["__eid"] = df["entity_id"].astype(object).to_numpy()
        out["__canon"] = df["canonical"].to_numpy()
        out["__is_map"] = np.int8(1)
        return out

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        maps = g[g["__is_map"] == 1][["__mkey", "__eid", "__canon"]]
        rows = g[g["__is_map"] == 0].drop(columns=["__eid", "__canon", "__is_map"])
        out = rows.merge(maps, on="__mkey", how="left")
        miss = out["__eid"].isna()
        if miss.any():
            # identity clusters for unseen mentions, computed once per
            # distinct missing surface
            uniq = {m: _identity_entity(m) for m in out.loc[miss, "__mkey"].unique()}
            out.loc[miss, "__eid"] = out.loc[miss, "__mkey"].map(
                lambda m: uniq[m][0]
            )
            out.loc[miss, "__canon"] = out.loc[miss, "__mkey"].map(
                lambda m: uniq[m][1]
            )
        out[id_col] = out["__eid"].astype(np.int64)
        out[canon_col] = out["__canon"].astype(object)
        out = out.drop(columns=["__mkey", "__eid", "__canon"])
        for c, t in restore_dtypes.items():
            out[c] = out[c].astype(t)
        return out

    sides = triples.map_batches(t_rows, batch_format="pandas").union(
        emap_ds.map_batches(m_rows, batch_format="pandas")
    )
    return bucketed_group_reduce(
        sides, key_cols=["__mkey"], reduce_fn=join_bucket, num_buckets=num_buckets
    )


def canonicalize_triples_with_map(
    triples: "rd.Dataset",
    emap_ds: "rd.Dataset",
    broadcast_limit: int = 1_000_000,
    join: str = "auto",
) -> "rd.Dataset":
    """Apply an entity map to the triple stream, auto-selecting the
    join strategy (round-3 scale fix: the broadcast join is no longer
    the ONLY path).

    - ``broadcast`` (and ``auto`` under ``broadcast_limit`` distinct
      surface mentions): ``ray.put`` the map once, task-form map-side
      join — hot mentions never shuffle.
    - ``shuffle`` (and ``auto`` above the limit): two bucketed
      co-partitioned shuffle joins on the mention key (subj then obj),
      no driver materialization of the map anywhere — the path that
      still works when the distinct-mention map is corpus-scale.
    Both paths emit identical rows (parity-tested with a forced-low
    threshold).
    """
    if join == "auto":
        join = "broadcast" if emap_ds.count() <= broadcast_limit else "shuffle"
    if join == "broadcast":
        emap_ref = ray.put(emap_ds.to_pandas())
        return triples.map_batches(
            make_canonicalize_fn(emap_ref), batch_format="pyarrow"
        )
    out = _apply_emap_shuffle(
        triples, emap_ds, "subj", "subj_id", "subj_canonical"
    )
    return _apply_emap_shuffle(
        out, emap_ds, "obj", "obj_id", "obj_canonical"
    )


def canonical_triples(
    triples: "rd.Dataset",
    seed: int = 42,
    mode: str = "auto",
    broadcast_limit: int = 1_000_000,
    join: str = "auto",
) -> tuple["rd.Dataset", "rd.Dataset"]:
    """triples → (canonicalized triple stream, entity_map dataset)."""
    emap_ds = entity_map(triples, seed=seed, mode=mode)
    out = canonicalize_triples_with_map(
        triples, emap_ds, broadcast_limit=broadcast_limit, join=join
    )
    return out, emap_ds
