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
from kgflow.ops.ann import embed_matrix
from kgflow.ops.text import hash_token

_WORD = re.compile(r"\w+")


_SHINGLE_B = np.uint64(1099511628211)


def _word_shingles(text: str, k: int = 3, _cache: dict | None = None) -> np.ndarray:
    """64-bit fingerprints of word k-grams. Token hashes are memoized
    (``_cache``, shareable across calls) and the k-gram combine runs as
    k vectorized passes over the token-hash array — identical wrapping
    uint64 arithmetic to the old per-gram scalar loop, minus the scalar
    overflow warnings and the Python-level inner loop."""
    toks = _WORD.findall(text.lower())
    if len(toks) < k:
        toks = toks + ["\x00"] * (k - len(toks))
    if _cache is None:
        _cache = {}
    hs = np.fromiter(
        (_cache.setdefault(w, hash_token(w)) for w in toks),
        dtype=np.uint64,
        count=len(toks),
    )
    n = len(toks) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    for j in range(k):
        h = h * _SHINGLE_B + hs[j : j + n]
    return np.unique(h)


def word_jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(_word_shingles(a, k).tolist())
    sb = set(_word_shingles(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _segment_pair_indices(
    new_seg: np.ndarray, cap: int, op: str
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Vectorized all-unordered-pairs within each segment of a sorted
    array. ``new_seg[i]`` marks segment starts. Segments longer than
    ``cap`` are trimmed to their first ``cap`` rows (logged) — trimming
    drops only segment TAILS, so the start flags stay valid without
    recomputing keys. Returns (i_idx, j_idx, keep_rows): row-index
    pairs (i < j within the segment) into the (possibly trimmed)
    arrays, plus the row mask to apply first (None if nothing trimmed).

    Replaces per-group pandas loops: measured ~0.45 ms of groupby
    iteration overhead per group vs O(rows + pairs) offset arithmetic
    for the whole batch."""
    n = len(new_seg)
    starts = np.flatnonzero(new_seg)
    lengths = np.diff(np.append(starts, n))
    within = np.arange(n) - np.repeat(starts, lengths)
    keep_rows = None
    if len(lengths) and int(lengths.max()) > cap:
        n_cap = int((lengths > cap).sum())
        print(f"{op}: capping {n_cap} groups longer than {cap} rows")
        keep_rows = within < cap
        new_seg = new_seg[keep_rows]
        n = len(new_seg)
        starts = np.flatnonzero(new_seg)
        lengths = np.diff(np.append(starts, n))
        within = np.arange(n) - np.repeat(starts, lengths)
    j_idx = np.repeat(np.arange(n), within)
    cum = np.concatenate(([0], np.cumsum(within)))
    i_idx = np.arange(cum[-1]) - np.repeat(cum[:-1], within) + np.repeat(
        np.repeat(starts, lengths), within
    )
    return i_idx, j_idx, keep_rows


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
        tok_cache: dict = {}
        o_band, o_hash, o_id = [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            x = _word_shingles(t, _cache=tok_cache)
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

    # SCALE PATH (round-1 fix): document text NEVER rides the band
    # shuffle. Phase 1 shuffles (band_id, band_hash, doc_id) only —
    # ~20 bytes/row × bands, vs the old text-per-band-row layout that
    # amplified corpus text 16x through the exchange. Phase 2 joins the
    # text back in two co-partitioned bucketed shuffles: texts ship
    # exactly once through the doc_id-keyed exchange, and only the
    # candidate-pair-bounded rows carry text into the verify.
    def coarse_candidates(g: pd.DataFrame) -> pd.DataFrame:
        """Per LSH bucket: emit UNVERIFIED candidate pairs (capped) —
        one segment-offset pass over the sorted bucket, no per-group
        pandas loop."""
        if len(g) == 0:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["band_id", "band_hash", "doc_id"], kind="mergesort")
        bi = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        new_seg = np.empty(len(g), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = (bi[1:] != bi[:-1]) | (bh[1:] != bh[:-1])
        i_idx, j_idx, keep_rows = _segment_pair_indices(
            new_seg, max_bucket, "minhash_pairs"
        )
        if keep_rows is not None:
            ids = ids[keep_rows]
        return pd.DataFrame({"doc_a": ids[i_idx], "doc_b": ids[j_idx]})

    from kgflow.ops.shuffle import bucketed_group_reduce

    cands = bucketed_group_reduce(
        docs.select_columns(["doc_id", "text"]).map_batches(
            band_rows, batch_format="pyarrow"
        ),
        key_cols=["band_id", "band_hash"],
        reduce_fn=coarse_candidates,
    )
    # bands emit duplicate candidate pairs; no dedicated dedup shuffle —
    # the verify stage drop_duplicates both sides, and duplicates only
    # inflate the (candidate-bounded, tiny) intermediate rows ≤ bands×

    return exact_jaccard_verify(cands, docs, threshold=threshold)


def exact_jaccard_verify(
    cands: "rd.Dataset", docs: "rd.Dataset", threshold: float, k: int = 3
) -> "rd.Dataset":
    """(doc_a, doc_b) candidate pairs → verified (doc_a, doc_b, sim)
    with EXACT word-k-gram Jaccard ≥ threshold.

    Shared verify tail of every text near-dup operator (minhash LSH,
    prefix-filter): document text never rides the candidate-generation
    shuffle — phase A joins text onto each pair side through ONE
    doc_id-keyed bucketed exchange (texts ship exactly once), phase B
    brings the two sides together pair-keyed and computes shingle-set
    Jaccard with per-bucket doc/token memoization. Candidate-pair
    duplicates from the generation stage are dropped here."""
    # phase A: one doc_id-keyed shuffle attaches text to each pair side
    pair_sides = cands.map_batches(
        lambda df: pd.DataFrame(
            {
                "key": np.concatenate([df["doc_a"], df["doc_b"]]).astype(np.int64),
                "doc_a": np.concatenate([df["doc_a"], df["doc_a"]]).astype(np.int64),
                "doc_b": np.concatenate([df["doc_b"], df["doc_b"]]).astype(np.int64),
                "text": pd.Series([None] * (2 * len(df)), dtype="object"),
            }
        ),
        batch_format="pandas",
    )
    text_rows = docs.select_columns(["doc_id", "text"]).map_batches(
        lambda df: pd.DataFrame(
            {
                "key": df["doc_id"].astype(np.int64),
                "doc_a": pd.Series([-1] * len(df), dtype="int64"),
                "doc_b": pd.Series([-1] * len(df), dtype="int64"),
                "text": df["text"].astype(object),
            }
        ),
        batch_format="pandas",
    )

    def attach_text(g: pd.DataFrame) -> pd.DataFrame:
        texts = g[g["doc_a"] < 0][["key", "text"]].rename(columns={"text": "t"})
        sides = g[g["doc_a"] >= 0][["key", "doc_a", "doc_b"]]
        out = sides.merge(texts, on="key", how="inner")
        return pd.DataFrame(
            {
                "doc_a": out["doc_a"].astype(np.int64),
                "doc_b": out["doc_b"].astype(np.int64),
                "is_a": (out["key"] == out["doc_a"]).astype(np.int8),
                "t": out["t"].astype(object),
            }
        )

    from kgflow.ops.shuffle import bucketed_group_reduce

    sided = bucketed_group_reduce(
        pair_sides.union(text_rows), key_cols=["key"], reduce_fn=attach_text
    )

    EMPTY_VERIFIED = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "sim": pd.Series([], dtype="float64"),
        }
    )

    # phase B: pair-keyed shuffle brings the two sides together. The
    # verify shingles each unique doc ONCE (the only per-doc Python —
    # inherent to tokenization), then counts every pair's |A∩B| in one
    # vectorized lexsort + adjacent-duplicate pass: per-doc shingle
    # arrays are sorted unique, so within a (pair, value) run a value
    # appears at most twice and the duplicate count IS the overlap.
    # Replaces the per-pair Python set-intersection loop (the last
    # per-pair Python in the dedup family). Memory: the concatenated
    # shingle arrays repeat a doc once per pair, but the exchange
    # already ships text once per pair side (phase A), so the verify's
    # working set stays proportional to the bucket frame it was handed.
    def verify(g: pd.DataFrame) -> pd.DataFrame:
        a_rows = g[g["is_a"] == 1].drop_duplicates(["doc_a", "doc_b"])
        b_rows = g[g["is_a"] == 0].drop_duplicates(["doc_a", "doc_b"])
        m = a_rows.merge(
            b_rows, on=["doc_a", "doc_b"], suffixes=("_a", "_b"), how="inner"
        )
        if not len(m):
            return EMPTY_VERIFIED.copy()
        tok_cache: dict = {}
        shingles: dict[int, np.ndarray] = {}
        for side, tcol in (("doc_a", "t_a"), ("doc_b", "t_b")):
            for did, t in zip(m[side], m[tcol]):
                did = int(did)
                if did not in shingles:
                    shingles[did] = _word_shingles(t, k, _cache=tok_cache)
        da = m["doc_a"].to_numpy(dtype=np.int64)
        db = m["doc_b"].to_numpy(dtype=np.int64)
        arrs_a = [shingles[d] for d in da]
        arrs_b = [shingles[d] for d in db]
        sa = np.fromiter((len(x) for x in arrs_a), dtype=np.int64, count=len(m))
        sb = np.fromiter((len(x) for x in arrs_b), dtype=np.int64, count=len(m))
        pids = np.concatenate(
            [np.repeat(np.arange(len(m)), sa), np.repeat(np.arange(len(m)), sb)]
        )
        vals = np.concatenate(arrs_a + arrs_b)
        order = np.lexsort((vals, pids))
        pv, vv = pids[order], vals[order]
        dup = (pv[1:] == pv[:-1]) & (vv[1:] == vv[:-1])
        o = np.bincount(pv[1:][dup], minlength=len(m))
        union = sa + sb - o
        sim = np.where(union > 0, o / np.maximum(union, 1), 1.0)
        hit = sim >= threshold
        return pd.DataFrame(
            {
                "doc_a": da[hit],
                "doc_b": db[hit],
                "sim": sim[hit],
            }
        )

    return bucketed_group_reduce(
        sided, key_cols=["doc_a", "doc_b"], reduce_fn=verify
    )


def jaccard_pairs(
    docs: "rd.Dataset",
    k: int = 3,
    threshold: float = 0.5,
    max_df: int = 2000,
    num_buckets: int | None = None,
    measure: str = "jaccard",
) -> "rd.Dataset":
    """EXACT n-gram Jaccard self-join as a count-join (inverted-index
    sparse inner product): documents(doc_id, text) → ALL pairs
    (doc_a, doc_b, sim) with word-k-gram Jaccard ≥ threshold. Unlike
    ``minhash_pairs`` there is no LSH recall gap — and unlike a
    prefix-filter + text-verify layout, NOTHING heavier than 16-byte
    count rows ever rides a shuffle:

    1. postings: one (shingle, doc_id, set_size) row per distinct
       shingle per doc — the only pass over text;
    2. shingle-keyed bucketed reduce: per shingle, every qualifying doc
       pair (vectorized triu + length filter t·|A| ≤ |B| ≤ |A|/t)
       contributes a partial-count row, COMBINED per bucket
       (groupby-size) before leaving the task;
    3. pair-keyed bucketed reduce: o = Σ partials = |A∩B| exactly, so
       sim = o / (|A| + |B| − o) and the threshold filter are pure
       integer/double arithmetic — no text, no per-pair set ops.

    An earlier prefix-filter implementation (AllPairs/PPJoin-style)
    generated fewer candidates but verified them by shipping document
    text pair-wise — ~100× text amplification on a 500k-candidate
    corpus and a measured 106 s at sf0.1 vs ~seconds for this layout.
    Candidate-volume cost here is Σ_shingle df² partial rows, combined
    in-bucket; ``max_df`` caps a pathological posting list (hot
    stop-grams at corpus scale) with a logged drop — the only
    approximation: pairs whose overlap evidence includes a capped
    shingle can undercount o. Driver-scale data never hits the cap, so
    the DuckDB all-pairs oracle matches exactly.

    Pair keys are packed (doc_a << 32 | doc_b) for single-array
    np.unique combining — doc ids must be non-negative and < 2^32
    (relabel upstream for wider id spaces).

    ``measure="containment"`` reuses the identical exchange layout but
    scores o / min(|A|, |B|) — the asymmetric overlap coefficient that
    flags a small document quoted/embedded inside a larger one, which
    Jaccard structurally misses (a 50-shingle doc fully contained in a
    5000-shingle doc has Jaccard ≈ 0.01 but containment 1.0). The
    Jaccard length-ratio prune is UNSOUND for containment (any size
    pair can reach containment 1), so that mode keeps every
    within-shingle pair and leans on ``max_df`` alone.

    ``measure="dice"`` scores 2o / (|A| + |B|) (Sørensen–Dice, the
    IR-standard monotone transform of Jaccard: d = 2j/(1+j)) with its
    own sound length prune — dice ≥ t requires
    min(|A|,|B|)·(2−t) ≥ t·max(|A|,|B|) since o ≤ min(|A|,|B|)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    if measure not in ("jaccard", "containment", "dice"):
        raise ValueError(
            f"measure must be jaccard|containment|dice, got {measure!r}"
        )

    def postings(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        o_sh, o_id, o_sz = [], [], []
        for did, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            s = _word_shingles(t, k, _cache=cache)
            o_sh.append(s)
            o_id.append(np.full(len(s), did, dtype=np.int64))
            o_sz.append(np.full(len(s), len(s), dtype=np.int32))
        if not o_sh:
            return pa.table(
                {
                    "shingle": pa.array([], pa.uint64()),
                    "doc_id": pa.array([], pa.int64()),
                    "set_size": pa.array([], pa.int32()),
                }
            )
        return pa.table(
            {
                "shingle": pa.array(np.concatenate(o_sh)),
                "doc_id": pa.array(np.concatenate(o_id)),
                "set_size": pa.array(np.concatenate(o_sz)),
            }
        )

    EMPTY_PARTIALS = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "size_a": pd.Series([], dtype="int32"),
            "size_b": pd.Series([], dtype="int32"),
            "c": pd.Series([], dtype="int64"),
        }
    )

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        """All within-shingle doc pairs, fully vectorized: segment
        offsets replace the per-shingle pandas group loop (measured
        8.4 s single-threaded over sf0.1's 18.6k posting lists as a
        groupby loop vs ~0.2 s as offset arithmetic), and the in-bucket
        combine packs (doc_a, doc_b) into one uint64 key for a single
        np.unique instead of a 4-column groupby."""
        g = g.sort_values(["shingle", "doc_id"], kind="mergesort")
        n = len(g)
        if n == 0:
            return EMPTY_PARTIALS.copy()
        sh = g["shingle"].to_numpy()
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        sz = g["set_size"].to_numpy(dtype=np.int64)
        # Pair keys pack into (a << 32) | b — out-of-range ids would
        # silently collide and corrupt counts, so fail loudly instead.
        if len(ids) and (ids.min() < 0 or ids.max() >= 1 << 32):
            raise ValueError(
                "jaccard_pairs requires 0 <= doc_id < 2**32 "
                f"(got range [{ids.min()}, {ids.max()}]); relabel ids upstream"
            )
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = sh[1:] != sh[:-1]
        i_idx, j_idx, keep_rows = _segment_pair_indices(
            new_seg, max_df, "jaccard_pairs"
        )
        if keep_rows is not None:
            ids, sz = ids[keep_rows], sz[keep_rows]
        da, db = ids[i_idx], ids[j_idx]  # doc_id-sorted ⇒ da < db
        sa, sb = sz[i_idx], sz[j_idx]
        if measure == "jaccard":
            keep = (sb >= threshold * sa) & (sa >= threshold * sb)
            da, db, sa, sb = da[keep], db[keep], sa[keep], sb[keep]
        elif measure == "dice":
            keep = (sb * (2.0 - threshold) >= threshold * sa) & (
                sa * (2.0 - threshold) >= threshold * sb
            )
            da, db, sa, sb = da[keep], db[keep], sa[keep], sb[keep]
        key = (da.astype(np.uint64) << np.uint64(32)) | db.astype(np.uint64)
        uk, first, counts = np.unique(key, return_index=True, return_counts=True)
        return pd.DataFrame(
            {
                "doc_a": da[first],
                "doc_b": db[first],
                "size_a": sa[first].astype(np.int32),
                "size_b": sb[first].astype(np.int32),
                "c": counts.astype(np.int64),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        da = g["doc_a"].to_numpy(dtype=np.int64)
        db = g["doc_b"].to_numpy(dtype=np.int64)
        key = (da.astype(np.uint64) << np.uint64(32)) | db.astype(np.uint64)
        uk, first, inv = np.unique(key, return_index=True, return_inverse=True)
        o = np.bincount(inv, weights=g["c"].to_numpy(dtype=np.float64)).astype(
            np.int64
        )
        sa = g["size_a"].to_numpy(dtype=np.int64)[first]
        sb = g["size_b"].to_numpy(dtype=np.int64)[first]
        if measure == "jaccard":
            denom = np.maximum(sa + sb - o, 1)
        elif measure == "dice":
            o = 2 * o
            denom = np.maximum(sa + sb, 1)
        else:  # containment: overlap coefficient o / min(|A|, |B|)
            denom = np.maximum(np.minimum(sa, sb), 1)
        sim = o / denom
        hit = sim >= threshold
        return pd.DataFrame(
            {
                "doc_a": da[first][hit],
                "doc_b": db[first][hit],
                "sim": sim[hit],
            }
        )

    partials = bucketed_group_reduce(
        docs.select_columns(["doc_id", "text"]).map_batches(
            postings, batch_format="pyarrow"
        ),
        key_cols=["shingle"],
        reduce_fn=pair_partials,
        num_buckets=num_buckets,
    )
    return bucketed_group_reduce(
        partials,
        key_cols=["doc_a", "doc_b"],
        reduce_fn=finish,
        num_buckets=num_buckets,
    )


def containment_pairs(
    docs: "rd.Dataset",
    k: int = 3,
    threshold: float = 0.8,
    max_df: int = 2000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """EXACT n-gram containment self-join: (doc_a, doc_b, sim) with
    overlap coefficient |A∩B| / min(|A|, |B|) ≥ threshold — the
    quote/inclusion detector for web corpora (a page embedding another
    page's paragraphs scores ~1.0 here while Jaccard stays near 0).
    Same ids-only count-join exchange as ``jaccard_pairs``; see its
    docstring for the layout and the ``max_df`` cap semantics."""
    return jaccard_pairs(
        docs,
        k=k,
        threshold=threshold,
        max_df=max_df,
        num_buckets=num_buckets,
        measure="containment",
    )


def _lev_capped(a: np.ndarray, b: np.ndarray, k: int) -> int:
    """Levenshtein distance over code-point arrays (uint32 — matches
    SQL character semantics, not bytes), capped at ``k + 1`` (anything
    above k returns k+1). Row-vectorized DP: substitutions/deletions
    are plain array minima; the left-to-right insertion scan uses the
    skew trick ins[j] = j + min_{i≤j}(cur[i] − i), turning the serial
    recurrence into one np.minimum.accumulate — no per-cell Python.
    Early-exits when a whole row exceeds k (band abandonment)."""
    if abs(len(a) - len(b)) > k:
        return k + 1
    if len(a) > len(b):
        a, b = b, a
    B = b
    lb = len(B)
    idx = np.arange(lb + 1, dtype=np.int64)
    prev = idx.copy()
    full = np.empty(lb + 1, dtype=np.int64)
    for i, ch in enumerate(a, start=1):
        full[0] = i
        np.minimum(prev[:-1] + (B != ch), prev[1:] + 1, out=full[1:])
        adj = full - idx
        np.minimum.accumulate(adj, out=adj)
        full = adj + idx
        if full.min() > k:
            return k + 1
        prev, full = full, prev
    return int(prev[lb]) if prev[lb] <= k else k + 1


def edit_distance_pairs(
    docs: "rd.Dataset",
    prefix_len: int = 16,
    max_dist: int = 3,
    max_bucket: int = 200,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Prefix-blocked edit-distance near-dup self-join: all pairs
    (doc_a, doc_b, dist) whose texts share an IDENTICAL ``prefix_len``-
    char prefix and have Levenshtein distance ≤ ``max_dist`` — the
    typo/OCR-variant detector (token-set measures like Jaccard are
    blind to single-character edits inside words).

    The prefix-equality clause is part of the PREDICATE, so blocking on
    the prefix is recall-COMPLETE by definition (unlike LSH there is no
    probabilistic miss). Scale shape: one (prefix, doc_id, text) pass,
    ONE prefix-keyed bucketed exchange, then within each prefix group a
    |len(a)−len(b)| ≤ max_dist prune before the capped row-vectorized
    DP (`_lev_capped` — numpy rows, no per-cell Python). A hot prefix
    (shared boilerplate opening at corpus scale) is trimmed to
    ``max_bucket`` docs with a logged drop, bounding the quadratic
    term exactly like ``minhash_pairs`` buckets."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def keyed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return pa.table(
            {
                "prefix": pc_.utf8_slice_codeunits(
                    batch.column("text"), 0, prefix_len
                ),
                "doc_id": batch.column("doc_id"),
                "text": batch.column("text"),
            }
        )

    EMPTY = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "dist": pd.Series([], dtype="int64"),
        }
    )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return EMPTY.copy()
        g = g.sort_values(["prefix", "doc_id"], kind="mergesort")
        pfx = g["prefix"].to_numpy()
        new_seg = np.empty(len(g), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = pfx[1:] != pfx[:-1]
        i_idx, j_idx, keep_rows = _segment_pair_indices(
            new_seg, max_bucket, "edit_distance_pairs"
        )
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        texts = g["text"].to_numpy()
        if keep_rows is not None:
            ids, texts = ids[keep_rows], texts[keep_rows]
        if not len(i_idx):
            return EMPTY.copy()
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        close = np.abs(lens[i_idx] - lens[j_idx]) <= max_dist
        i_idx, j_idx = i_idx[close], j_idx[close]
        out_a, out_b, out_d = [], [], []
        enc: dict[int, np.ndarray] = {}

        def cp(i: int) -> np.ndarray:
            arr = enc.get(i)
            if arr is None:
                arr = enc[i] = np.frombuffer(
                    texts[i].encode("utf-32-le"), dtype=np.uint32
                )
            return arr

        for i, j in zip(i_idx, j_idx):
            d = _lev_capped(cp(i), cp(j), max_dist)
            if d <= max_dist:
                out_a.append(ids[i])
                out_b.append(ids[j])
                out_d.append(d)
        return pd.DataFrame(
            {
                "doc_a": np.array(out_a, dtype=np.int64),
                "doc_b": np.array(out_b, dtype=np.int64),
                "dist": np.array(out_d, dtype=np.int64),
            }
        )

    keyed_ds = docs.select_columns(["doc_id", "text"]).map_batches(
        keyed, batch_format="pyarrow"
    )
    return bucketed_group_reduce(
        keyed_ds, key_cols=["prefix"], reduce_fn=verify, num_buckets=num_buckets
    )


_SHIFTS64 = np.arange(64, dtype=np.uint64)


def simhash64(text: str, seed: int = 42, _cache: dict | None = None) -> int:
    """Charikar 64-bit simhash over word features.

    Vectorized (round-1 fix): ONE [T, 64] bit-matrix reduction per
    document instead of a per-token Python loop doing a 64-wide numpy op
    each (measured ≥5x on fixture docs; same outputs — the accumulator
    ``sum(±1) = 2·popcount_column − T`` identity is exact). ``_cache``
    (optional, shared across calls) memoizes token hashes, which repeat
    heavily within a batch."""
    toks = _WORD.findall(text.lower())
    if not toks:
        return 0
    if _cache is None:
        _cache = {}
    seed_mask = np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF)
    hs = np.fromiter(
        (_cache.setdefault(w, hash_token(w)) for w in toks),
        dtype=np.uint64,
        count=len(toks),
    )
    hs ^= seed_mask
    ones = ((hs[:, None] >> _SHIFTS64[None, :]) & np.uint64(1)).sum(axis=0)
    acc = 2 * ones.astype(np.int64) - len(hs)
    return int(
        np.bitwise_or.reduce(
            np.where(acc > 0, np.uint64(1) << _SHIFTS64, np.uint64(0))
        )
    )


def simhash_table(docs: "rd.Dataset", seed: int = 42) -> "rd.Dataset":
    """doc_id, simhash (int64, sign-masked)."""

    def f(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        vals = [
            simhash64(t, seed, _cache=cache) & 0x7FFFFFFFFFFFFFFF
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "simhash": pa.array(vals, pa.int64())}
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def hamming_band_pairs(
    hashes: "rd.Dataset",
    max_hamming: int = 6,
    bands: int = 4,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    bucket_cap: int = 200,
) -> "rd.Dataset":
    """Near-dup pairs over a precomputed 63-bit hash column (simhash,
    image pHash, …): band the hash into ``bands`` 16-bit blocks
    (Manku et al.: two hashes within hamming distance d agree on at
    least one block if d < bands), groupby block value, verify hamming
    distance in-bucket with a vectorized xor+popcount. The band
    fan-out is pure int shifts — fully vectorized. Returns
    (doc_a, doc_b, hamming) deduped across bands."""

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        sh = batch.column(hash_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        n = len(ids)
        o_band = np.repeat(np.arange(bands, dtype=np.int32), n)
        tiled = np.tile(sh, bands)
        o_key = (
            (tiled >> (16 * o_band.astype(np.int64))) & 0xFFFF
        ).astype(np.int32)
        return pa.table(
            {
                "band_id": pa.array(o_band),
                "band_key": pa.array(o_key),
                "doc_id": pa.array(np.tile(ids, bands)),
                "simhash": pa.array(tiled),
            }
        )

    def coarse_pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b, d = [], [], []
        for (_, _), grp in g.groupby(["band_id", "band_key"], sort=False):
            grp = grp.drop_duplicates("doc_id")
            if len(grp) < 2:
                continue
            if len(grp) > bucket_cap:
                # no silent caps: surface the drop in task logs
                print(
                    f"hamming_band_pairs: capping band bucket of "
                    f"{len(grp)} ids to {bucket_cap} "
                    f"({len(grp) - bucket_cap} dropped)"
                )
            grp = grp.sort_values("doc_id").head(bucket_cap)
            ids = grp["doc_id"].to_numpy()
            shs = grp["simhash"].to_numpy(dtype=np.uint64)
            # vectorized hamming over all in-bucket pairs: xor the triu
            # pair array once, popcount via byte-view unpackbits — no
            # per-pair Python (numpy<2 has no bitwise_count; the
            # uint8-view unpackbits sum is the vectorized equivalent)
            iu, ju = np.triu_indices(len(ids), k=1)
            x = shs[iu] ^ shs[ju]
            ham = (
                np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
                .sum(axis=1)
                .astype(np.int64)
            )
            hit = ham <= max_hamming
            a.extend(int(v) for v in ids[iu[hit]])
            b.extend(int(v) for v in ids[ju[hit]])
            d.extend(int(v) for v in ham[hit])
        return pd.DataFrame(
            {
                "doc_a": pd.Series(a, dtype="int64"),
                "doc_b": pd.Series(b, dtype="int64"),
                "hamming": pd.Series(d, dtype="int64"),
            }
        )

    from kgflow.ops.shuffle import bucketed_group_reduce

    pairs = bucketed_group_reduce(
        hashes.select_columns([id_col, hash_col]).map_batches(
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


def simhash_pairs(
    docs: "rd.Dataset", max_hamming: int = 6, bands: int = 4, seed: int = 42
) -> "rd.Dataset":
    """Near-dup pairs by simhash: compute the 63-bit simhash per doc
    (per-batch token-hash memoization), then delegate banding +
    in-bucket hamming verify to :func:`hamming_band_pairs` (shared
    with the image-pHash path)."""

    def hash_rows(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        sh = [
            simhash64(t, seed, _cache=cache) & 0x7FFFFFFFFFFFFFFF
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array(sh, pa.int64()),
            }
        )

    return hamming_band_pairs(
        docs.select_columns(["doc_id", "text"]).map_batches(
            hash_rows, batch_format="pyarrow"
        ),
        max_hamming=max_hamming,
        bands=bands,
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
    # int64 nodes ride the CC rounds raw (connected_components is
    # dtype-generic): numeric min IS the representative, and int64
    # shuffles ~2-3× fewer bytes per round than padded strings
    edges = pairs.map_batches(
        lambda df: pd_.DataFrame(
            {
                "src": df["doc_a"].astype("int64"),
                "dst": df["doc_b"].astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    selfloops = docs.select_columns(["doc_id"]).map_batches(
        lambda df: pd_.DataFrame(
            {
                "src": df["doc_id"].astype("int64"),
                "dst": df["doc_id"].astype("int64"),
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
    emb: "rd.Dataset",
    threshold: float = 0.98,
    num_planes: int = 12,
    seed: int = 42,
    max_bucket: int = 500,
) -> "rd.Dataset":
    """Embedding-cosine near-dup via random-hyperplane LSH: sign-pattern
    bucket (SimHash for vectors), verify cosine in-bucket.
    emb(vec_id, embedding list<float>) → (vec_a, vec_b, cos)."""

    def bucket(batch: pa.Table) -> pa.Table:
        M = embed_matrix(batch)
        dim = M.shape[1]
        rng = np.random.RandomState(seed)
        planes = rng.randn(dim, num_planes).astype(np.float32)
        signs = (M @ planes) > 0  # [N, P]
        keys = np.zeros(len(M), dtype=np.int64)
        for p in range(num_planes):
            keys |= signs[:, p].astype(np.int64) << p
        return pa.table(
            {
                # "lsh_bucket", not "bucket": the bucketed reduce below
                # claims the "bucket" column name for its shuffle key
                "lsh_bucket": pa.array(keys),
                "vec_id": batch.column("vec_id"),
                "embedding": batch.column("embedding"),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        a, b, c = [], [], []
        for _, grp in g.groupby("lsh_bucket", sort=False):
            if len(grp) > max_bucket:
                # no silent caps: surface what was dropped in task logs
                print(
                    f"embedding_neardup_pairs: capping LSH bucket of "
                    f"{len(grp)} vectors to {max_bucket} "
                    f"({len(grp) - max_bucket} dropped)"
                )
                grp = grp.sort_values("vec_id").head(max_bucket)
            if len(grp) < 2:
                continue
            M = np.asarray(list(grp["embedding"]), dtype=np.float32)
            ids = grp["vec_id"].to_numpy()
            norm = np.linalg.norm(M, axis=1, keepdims=True)
            norm[norm == 0] = 1
            U = M / norm
            S = U @ U.T
            iu, ju = np.triu_indices(len(ids), k=1)
            hit = S[iu, ju] >= threshold
            pa_, pb_ = ids[iu[hit]], ids[ju[hit]]
            a.extend(int(x) for x in np.minimum(pa_, pb_))
            b.extend(int(x) for x in np.maximum(pa_, pb_))
            c.extend(float(x) for x in S[iu[hit], ju[hit]])
        return pd.DataFrame(
            {
                "vec_a": pd.Series(a, dtype="int64"),
                "vec_b": pd.Series(b, dtype="int64"),
                "cos": pd.Series(c, dtype="float64"),
            }
        )

    from kgflow.ops.shuffle import bucketed_group_reduce

    return bucketed_group_reduce(
        emb.map_batches(bucket, batch_format="pyarrow"),
        key_cols=["lsh_bucket"],
        reduce_fn=verify,
    )


def semdedup(
    emb: "rd.Dataset",
    k: int = 8,
    threshold_num: int = 19,
    threshold_den: int = 20,
    assign_scale: int = 10_000,
    sim_scale: int = 1_000,
    id_col: str = "vec_id",
    col: str = "embedding",
    max_cluster: int = 20_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Semantic deduplication à la SemDeDup (Abbas et al., 2023,
    arXiv:2303.09540): cluster the embedding space with one exact
    k-means E-step (deterministic smallest-id seeds, the
    :func:`kgflow.ops.ann.kmeans_assign` trick), then WITHIN each
    cluster drop every vector whose quantized cosine similarity to ANY
    smaller-id vector of the same cluster reaches
    ``threshold_num/threshold_den`` — each drop needs a DIRECT witness
    with a smaller id (kept or itself dropped), so the smallest id of
    a near-dup group always survives (same keep rule as
    ``exact_dedup``; deterministic, unlike the paper's random keep).
    Not a connected-component rule: similarity chains propagate drops
    only when they descend in id order — a~b, b~c, a≁c with ids
    a<c<b keeps both a and c (c's only witness would be b, which has
    a larger id). Returns one row per vector:
    (vec_id, centroid, kept ∈ {0, 1}).

    Everything is integer-exact so an oracle can replay it: the
    similarity test is dot > 0 ∧ den²·dot² ≥ num²·‖a‖²·‖b‖² over
    floor(x·sim_scale) int64 vectors (no sqrt, no float), and a
    per-cluster guard asserts den²·(D·max|xq|²)² < 2⁶² so the int64
    arithmetic cannot overflow silently.

    Scale shape: assignment is exchange-free (broadcast centroid
    matrix, one int64 matmul per batch); ONE embedding-bearing
    exchange keyed by centroid; the quadratic part is confined to a
    cluster and runs as CHUNKED int64 matmuls against the id-sorted
    prefix (memory ≤ chunk·|cluster| i64, no N² allocation); a cluster
    over ``max_cluster`` fails LOUDLY naming its centroid — at corpus
    scale you raise ``k`` (SemDeDup's own regime: k ~ √n keeps
    clusters bounded), never the cap."""
    import ray

    from kgflow.ops.ann import seed_centroid_matrix
    from kgflow.ops.shuffle import bucketed_group_reduce

    cids, Cq, c2 = seed_centroid_matrix(
        emb, k, assign_scale, col=col, id_col=id_col
    )
    cref = ray.put((cids, Cq, c2))
    num2 = threshold_num * threshold_num
    den2 = threshold_den * threshold_den

    def assign_keep(batch: pa.Table) -> pa.Table:
        cids_, Cq_, c2_ = ray.get(cref)
        X = embed_matrix(batch, col).astype(np.float64)
        if not len(X):
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "centroid": pa.array([], pa.int64()),
                    col: pa.array([], pa.list_(pa.float32())),
                }
            )
        Xq = np.floor(X * assign_scale).astype(np.int64)
        d2 = (
            (Xq * Xq).sum(axis=1)[:, None]
            + c2_[None, :]
            - 2 * (Xq @ Cq_.T)
        )
        j = np.argmin(d2, axis=1)  # first min = smallest cid
        return pa.table(
            {
                id_col: batch.column(id_col),
                "centroid": pa.array(cids_[j]),
                col: batch.column(col),
            }
        )

    def one_cluster(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > max_cluster:
            raise ValueError(
                f"semdedup: cluster centroid={int(g['centroid'].iloc[0])} "
                f"has {len(g)} vectors (> max_cluster={max_cluster}); "
                f"raise k so clusters stay bounded"
            )
        g = g.sort_values(id_col, kind="mergesort")
        X = np.asarray(list(g[col]), dtype=np.float64)
        Xq = np.floor(X * sim_scale).astype(np.int64)
        n2 = (Xq * Xq).sum(axis=1)
        dot_max = X.shape[1] * int(np.abs(Xq).max() or 0) ** 2
        if max(num2, den2) * dot_max * dot_max >= 1 << 62:
            raise ValueError(
                f"semdedup: sim_scale={sim_scale} overflows int64 for "
                f"dim={X.shape[1]}, max|xq|={int(np.abs(Xq).max())}; "
                f"lower sim_scale"
            )
        n = len(g)
        dropped = np.zeros(n, dtype=bool)
        chunk = 512
        for s in range(1, n, chunk):
            e = min(s + chunk, n)
            S = Xq[s:e] @ Xq[:e].T  # [e-s, e] int64
            hit = (S > 0) & (den2 * S * S >= num2 * np.outer(n2[s:e], n2[:e]))
            # only columns j strictly below the global row index count
            rows = np.arange(s, e)[:, None]
            hit &= np.arange(e)[None, :] < rows
            dropped[s:e] |= hit.any(axis=1)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(dtype=np.int64),
                "centroid": g["centroid"].to_numpy(dtype=np.int64),
                "kept": (~dropped).astype(np.int64),
            }
        )

    def cluster_dedup(bucket: pd.DataFrame) -> pd.DataFrame:
        # a hash bucket may hold several centroids — dedup each alone
        out_cols = [id_col, "centroid", "kept"]
        if not len(bucket):
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in out_cols}
            )
        outs = [
            one_cluster(g) for _, g in bucket.groupby("centroid", sort=False)
        ]
        return pd.concat(outs, ignore_index=True)

    assigned = emb.select_columns([id_col, col]).map_batches(
        assign_keep, batch_format="pyarrow"
    )
    return bucketed_group_reduce(
        assigned,
        key_cols=["centroid"],
        reduce_fn=cluster_dedup,
        num_buckets=num_buckets,
    )


def sorted_neighborhood_pairs(
    docs: "rd.Dataset",
    key_chars: int = 24,
    window: int = 5,
    rank_bucket: int = 4096,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Sorted-neighborhood blocking (Hernández & Stolfo, SIGMOD 1995):
    sort the corpus by a normalization key (lowercased,
    whitespace-collapsed first ``key_chars`` chars) and emit every
    candidate pair within ``window`` positions of each other →
    (doc_a, doc_b, gap) with doc_a the earlier-ranked doc and
    gap = rank distance ∈ [1, window]. The complementary blocking
    family to hash/LSH blocking: near-duplicates with a shared prefix
    land adjacent regardless of token-set overlap, and candidate
    volume is exactly n·window — linear, no df² term.

    Scale shape: the global sort is `global_row_number`'s two-pass
    range decomposition (numeric first column = the key's first 4
    codepoints packed 15 bits each — a monotone coarsening, exact
    string order restored by the in-bucket ("key_num", key, doc_id)
    lexsort); windowed pairing then buckets rank space into
    ``rank_bucket``-wide contiguous ranges, ghost-replicating the
    first ``window`` rows of each range to its predecessor so every
    pair is formed exactly once (in the bucket where its earlier
    member is native). Per exchange row: 2 ints + the short key —
    text never rides a shuffle. Verification composes downstream
    (feed the pairs to `exact_jaccard_verify`-style scoring);
    this operator is the blocking stage, exact and SQL-oracle-able.
    """
    from kgflow.ops.shuffle import bucketed_group_reduce, global_row_number

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "key": pd.Series([], dtype="object"),
                    "key_num": pd.Series([], dtype="int64"),
                }
            )
        key = (
            df["text"]
            .str.lower()
            .str.replace(r"\s+", " ", regex=True)
            .str.slice(0, key_chars)
        )
        p4 = key.str.slice(0, 4).str.pad(4, side="right", fillchar="\x00")
        cp = (
            np.array(p4.tolist(), dtype="<U4")
            .view(np.uint32)
            .reshape(-1, 4)
            .astype(np.int64)
        )
        cp = np.minimum(cp, 32767)  # monotone clamp keeps 4×15 bits in int64
        key_num = ((cp[:, 0] * 32768 + cp[:, 1]) * 32768 + cp[:, 2]) * 32768 + cp[
            :, 3
        ]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "key": key,
                "key_num": key_num,
            }
        )

    ranked = global_row_number(
        docs.select_columns(["doc_id", "text"]).map_batches(
            keyed, batch_format="pandas"
        ),
        sort_cols=["key_num", "key", "doc_id"],
        out_col="rn",
        num_buckets=num_buckets,
    )

    def spread(df: pd.DataFrame) -> pd.DataFrame:
        rn = df["rn"].to_numpy(dtype=np.int64)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        wb = rn // rank_bucket
        native = pd.DataFrame(
            {"_wb": wb, "rn": rn, "doc_id": ids, "nat": np.ones(len(rn), dtype=np.int8)}
        )
        gm = (rn % rank_bucket < window) & (wb > 0)
        ghost = pd.DataFrame(
            {
                "_wb": wb[gm] - 1,
                "rn": rn[gm],
                "doc_id": ids[gm],
                "nat": np.zeros(int(gm.sum()), dtype=np.int8),
            }
        )
        return pd.concat([native, ghost], ignore_index=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, gg in g.groupby("_wb", sort=False):
            gg = gg.sort_values("rn", kind="mergesort")
            rn = gg["rn"].to_numpy(dtype=np.int64)
            ids = gg["doc_id"].to_numpy(dtype=np.int64)
            nat = gg["nat"].to_numpy(dtype=np.int8).astype(bool)
            for s in range(1, window + 1):
                if len(rn) <= s:
                    break
                gap = rn[s:] - rn[:-s]
                m = (gap <= window) & nat[:-s]
                if m.any():
                    outs.append(
                        pd.DataFrame(
                            {
                                "doc_a": ids[:-s][m],
                                "doc_b": ids[s:][m],
                                "gap": gap[m],
                            }
                        )
                    )
        if not outs:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype="int64"),
                    "doc_b": pd.Series([], dtype="int64"),
                    "gap": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_reduce(
        ranked.map_batches(spread, batch_format="pandas"),
        key_cols=["_wb"],
        reduce_fn=pairs,
        num_buckets=num_buckets,
    )


def jaccard_lookup(
    corpus: "rd.Dataset",
    queries: "rd.Dataset",
    k: int = 3,
    threshold: float = 0.3,
    max_df: int = 2000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """ASYMMETRIC exact Jaccard lookup — the online-dedup shape: for
    every query document, its near-duplicates in the corpus
    (query_id, match_id, sim) with word-k-gram Jaccard ≥ threshold.
    The lexical sibling of ANN top-k retrieval: `jaccard_pairs` is the
    all-pairs self-join, this is query×corpus only, so candidate
    volume is Σ_shingle df_q·df_c — proportional to the QUERY side.

    Scale shape mirrors `jaccard_pairs`: postings carry a side tag
    through ONE shingle-keyed exchange; per shingle the cross product
    (queries × corpus, vectorized grouped-cartesian index arithmetic,
    no per-shingle Python) emits 16-byte partial-count rows combined
    per bucket, and a pair-keyed reduce computes o = |Q∩C| exactly.
    ``max_df`` drops pathological posting lists loudly-logged; the
    symmetric length prune (t·|Q| ≤ |C| ≤ |Q|/t) is sound for
    Jaccard. Ids on BOTH sides must fit the (q << 32) | c packing."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def make_postings(is_q: int):
        def postings(batch: pa.Table) -> pa.Table:
            cache: dict = {}
            o_sh, o_id, o_sz = [], [], []
            for did, t in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("text").to_pylist(),
            ):
                s = _word_shingles(t, k, _cache=cache)
                o_sh.append(s)
                o_id.append(np.full(len(s), did, dtype=np.int64))
                o_sz.append(np.full(len(s), len(s), dtype=np.int32))
            sh = (
                np.concatenate(o_sh)
                if o_sh
                else np.array([], dtype=np.uint64)
            )
            ids = (
                np.concatenate(o_id) if o_id else np.array([], dtype=np.int64)
            )
            sz = (
                np.concatenate(o_sz) if o_sz else np.array([], dtype=np.int32)
            )
            return pa.table(
                {
                    "shingle": pa.array(sh),
                    "doc_id": pa.array(ids),
                    "set_size": pa.array(sz),
                    "is_q": pa.array(
                        np.full(len(ids), is_q, dtype=np.int8)
                    ),
                }
            )

        return postings

    posts = corpus.select_columns(["doc_id", "text"]).map_batches(
        make_postings(0), batch_format="pyarrow"
    ).union(
        queries.select_columns(["doc_id", "text"]).map_batches(
            make_postings(1), batch_format="pyarrow"
        )
    )

    EMPTY_PARTIALS = pd.DataFrame(
        {
            "qid": pd.Series([], dtype="int64"),
            "cid": pd.Series([], dtype="int64"),
            "size_q": pd.Series([], dtype="int64"),
            "size_c": pd.Series([], dtype="int64"),
            "c": pd.Series([], dtype="int64"),
        }
    )

    def cross_partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["shingle", "is_q", "doc_id"], kind="mergesort")
        n = len(g)
        if n == 0:
            return EMPTY_PARTIALS.copy()
        sh = g["shingle"].to_numpy()
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        sz = g["set_size"].to_numpy(dtype=np.int64)
        isq = g["is_q"].to_numpy(dtype=np.int8).astype(bool)
        if ids.min() < 0 or ids.max() >= 1 << 32:
            raise ValueError(
                "jaccard_lookup requires 0 <= doc_id < 2**32 on both sides"
            )
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = sh[1:] != sh[:-1]
        seg_start = np.flatnonzero(new_seg)
        seg_end = np.append(seg_start[1:], n)
        df_total = seg_end - seg_start
        keep = df_total <= max_df
        if not keep.all():
            import logging

            logging.getLogger(__name__).warning(
                "jaccard_lookup: dropping %d posting lists over max_df=%d",
                int((~keep).sum()),
                max_df,
            )
        # per-segment split point between corpus (is_q=0, sorted first)
        # and query rows
        q_counts = np.add.reduceat(isq.astype(np.int64), seg_start)
        c_counts = df_total - q_counts
        qn = np.where(keep, q_counts, 0)
        cn = np.where(keep, c_counts, 0)
        pairs_per = qn * cn
        P = int(pairs_per.sum())
        if P == 0:
            return EMPTY_PARTIALS.copy()
        seg_id = np.repeat(np.arange(len(seg_start)), pairs_per)
        cum_excl = np.concatenate(([0], np.cumsum(pairs_per)[:-1]))
        within = np.arange(P, dtype=np.int64) - cum_excl[seg_id]
        q_off = within // cn[seg_id]
        c_off = within % cn[seg_id]
        # corpus rows lead each segment (is_q sorts 0 before 1)
        c_idx = seg_start[seg_id] + c_off
        q_idx = seg_start[seg_id] + cn[seg_id] + q_off
        qi, ci = ids[q_idx], ids[c_idx]
        sq, sc = sz[q_idx], sz[c_idx]
        # symmetric Jaccard length prune + self-pair exclusion
        m = (
            (qi != ci)
            & (threshold * sq <= sc)
            & (threshold * sc <= sq)
        )
        if not m.any():
            return EMPTY_PARTIALS.copy()
        key = (qi[m] << np.int64(32)) | ci[m]
        uk, counts = np.unique(key, return_counts=True)
        # sizes ride with the first occurrence of each key
        order = np.argsort(key, kind="stable")
        first = np.searchsorted(key[order], uk)
        sel = order[first]
        return pd.DataFrame(
            {
                "qid": uk >> np.int64(32),
                "cid": uk & np.int64(0xFFFFFFFF),
                "size_q": sq[m][sel],
                "size_c": sc[m][sel],
                "c": counts.astype(np.int64),
            }
        )

    partials = bucketed_group_reduce(
        posts,
        key_cols=["shingle"],
        reduce_fn=cross_partials,
        num_buckets=num_buckets,
    )

    def verdict(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["qid", "cid"], as_index=False).agg(
            size_q=("size_q", "first"),
            size_c=("size_c", "first"),
            o=("c", "sum"),
        )
        o = agg["o"].to_numpy(dtype=np.float64)
        union = (
            agg["size_q"].to_numpy(dtype=np.float64)
            + agg["size_c"].to_numpy(dtype=np.float64)
            - o
        )
        sim = np.where(union > 0, o / np.maximum(union, 1), 1.0)
        hit = sim >= threshold
        return pd.DataFrame(
            {
                "query_id": agg["qid"].to_numpy(dtype=np.int64)[hit],
                "match_id": agg["cid"].to_numpy(dtype=np.int64)[hit],
                "sim": sim[hit],
            }
        )

    return bucketed_group_reduce(
        partials,
        key_cols=["qid", "cid"],
        reduce_fn=verdict,
        num_buckets=num_buckets,
    )


def hot_ngram_mask(
    docs: "rd.Dataset",
    n: int = 3,
    min_df: int = 4,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Corpus-duplicate n-gram masking — the Lee et al. ("Deduplicating
    Training Data Makes Language Models Better", ACL'22) sub-document
    dedup signal, at token-n-gram granularity instead of suffix-array
    substrings: an n-gram whose corpus DOCUMENT frequency ≥ ``min_df``
    is "hot" (boilerplate / template text), and every token position
    covered by an occurrence of a hot n-gram is masked. Returns
    (doc_id, n_masked) — the count of distinct masked token positions
    per document (docs with no hot hit drop; inner semantics). The
    masked-token RATIO against `token_counts` is the filter signal;
    callers rebuilding filtered text apply the same position set.

    Scale shape: per-doc (gram, position) rows are built in one
    vectorized tokenize+shift pass (a doc is one input row, so
    positions are exact block-locally); the DF count pre-shrinks to
    per-doc DISTINCT grams before ONE gram-keyed bucketed sum
    (distinct-gram bounded); the hot set (tiny by construction — it's
    the ≥ min_df tail) attaches back via `hash_join`'s auto
    broadcast; the final exchange carries (doc_id, pos) int rows only
    and unions the ±(n−1) cover intervals vectorized per bucket."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce

    if n < 2:
        raise ValueError("n must be >= 2 (unigram masking is vocab_topk)")

    def gram_pos(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "g": pd.Series([], dtype="object"),
                "i": pd.Series([], dtype="int64"),
            }
        )
        toks = df.set_index("doc_id")["text"].str.lower().str.findall(_WORD)
        ex = toks.explode().dropna()
        if not len(ex):
            return empty
        words = ex.to_numpy(dtype=object)
        did = ex.index.to_numpy()
        # n-gram at token position i (1-based) spans [i, i+n-1]; valid
        # where all n tokens share the doc
        valid = np.ones(max(len(words) - (n - 1), 0), dtype=bool)
        for j in range(1, n):
            valid &= did[: len(valid)] == did[j : j + len(valid)]
        if not valid.any():
            return empty
        grams = words[: len(valid)].astype("U")
        for j in range(1, n):
            grams = np.char.add(
                np.char.add(grams, " "), words[j : j + len(valid)].astype("U")
            )
        # position within the doc: running index reset at doc seams
        starts = np.r_[0, np.flatnonzero(did[1:] != did[:-1]) + 1]
        pos_all = np.arange(len(words), dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, len(words)])
        )
        out = pd.DataFrame(
            {
                "doc_id": did[: len(valid)][valid].astype("int64"),
                "g": grams[valid],
                "i": pos_all[: len(valid)][valid] + 1,
            }
        )
        return out

    gp = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(gram_pos, batch_format="pandas")
        .materialize()
    )

    def df_partial(d: pd.DataFrame) -> pd.DataFrame:
        u = d[["doc_id", "g"]].drop_duplicates()
        out = u.groupby("g", as_index=False).size().rename(columns={"size": "dfn"})
        out["dfn"] = out["dfn"].astype("int64")
        return out

    def df_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("g", as_index=False)["dfn"].sum()
        out = out[out["dfn"] >= min_df]
        out["dfn"] = out["dfn"].astype("int64")
        return out

    hot = bucketed_group_reduce(
        gp.map_batches(df_partial, batch_format="pandas"),
        key_cols=["g"],
        reduce_fn=df_sum,
        num_buckets=num_buckets,
    ).materialize()

    hits = hash_join(
        gp, hot.drop_columns(["dfn"]), on="g", num_buckets=num_buckets
    )

    def cover_partial(d: pd.DataFrame) -> pd.DataFrame:
        out = d[["doc_id", "i"]].drop_duplicates()
        return out

    def cover_count(g: pd.DataFrame) -> pd.DataFrame:
        did = np.repeat(g["doc_id"].to_numpy(dtype=np.int64), n)
        pos = (
            g["i"].to_numpy(dtype=np.int64)[:, None]
            + np.arange(n, dtype=np.int64)
        ).ravel()
        u = pd.DataFrame({"doc_id": did, "pos": pos}).drop_duplicates()
        out = u.groupby("doc_id", as_index=False).size().rename(
            columns={"size": "n_masked"}
        )
        out["n_masked"] = out["n_masked"].astype("int64")
        return out

    return bucketed_group_reduce(
        hits.map_batches(cover_partial, batch_format="pandas"),
        key_cols=["doc_id"],
        reduce_fn=cover_count,
        num_buckets=num_buckets,
    )


def symdelete_pairs(
    vocab: "rd.Dataset",
    token_col: str = "token",
    max_dist: int = 2,
    max_bucket: int = 2_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Symmetric-deletion edit-distance self-join over a vocabulary —
    all distinct (tok_a, tok_b, dist) with Levenshtein ≤ ``max_dist``
    (typo/OCR clustering, spell-candidate generation; the SymSpell
    blocking trick made distributed).

    Recall-COMPLETE blocking, unlike prefix blocking (a first-character
    typo never shares a prefix) and unlike q-gram count filters (two
    length-5 tokens at distance 2 can share zero bigrams): if
    lev(a,b) ≤ k then deleting from a the ≤ k alignment positions that
    are substituted-or-deleted and from b the ≤ k positions that are
    substituted-or-inserted leaves the SAME subsequence — so a and b
    share a ≤ k-deletion variant, and joining on variants misses
    nothing.

    Scale shape: variant generation runs on the VOCABULARY (V-bounded,
    never the corpus) with pandas-vectorized double-slice loops —
    ≤ L + L²/2 ≈ 211 vector ops for L = 20, no per-token Python; one
    variant-keyed exchange emits candidate pairs (hot variants capped
    at ``max_bucket`` with a logged drop — short variants of long-tail
    tokens can fan in), then one pair-keyed exchange dedupes (the same
    pair surfaces via many shared variants) and runs the capped
    row-vectorized DP verify (`_lev_capped`) exactly once per distinct
    candidate pair."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[token_col].drop_duplicates()
        s = toks.reset_index(drop=True)
        lens = s.str.len().to_numpy()
        maxlen = int(lens.max()) if len(s) else 0
        outs = [pd.DataFrame({"variant": s, token_col: s})]
        # single deletions: one vectorized two-slice concat per position
        for d in range(maxlen):
            m = s[lens > d]
            if not len(m):
                continue
            outs.append(
                pd.DataFrame(
                    {"variant": m.str[:d] + m.str[d + 1 :], token_col: m}
                )
            )
        if max_dist >= 2:
            # double deletions at original positions d < j: slice around
            # both (j shifts left by one after the first deletion)
            for d in range(maxlen):
                for j in range(d + 1, maxlen):
                    m = s[lens > j]
                    if not len(m):
                        continue
                    outs.append(
                        pd.DataFrame(
                            {
                                "variant": m.str[:d]
                                + m.str[d + 1 : j]
                                + m.str[j + 1 :],
                                token_col: m,
                            }
                        )
                    )
        if max_dist >= 3:
            raise NotImplementedError("symdelete_pairs supports max_dist <= 2")
        out = pd.concat(outs, ignore_index=True)
        return out.drop_duplicates()

    EMPTY = pd.DataFrame(
        {
            "tok_a": pd.Series([], dtype=object),
            "tok_b": pd.Series([], dtype=object),
        }
    )

    def candidate_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return EMPTY.copy()
        g = g.sort_values(["variant", token_col], kind="mergesort")
        v = g["variant"].to_numpy()
        new_seg = np.empty(len(g), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = v[1:] != v[:-1]
        i_idx, j_idx, keep_rows = _segment_pair_indices(
            new_seg, max_bucket, "symdelete_pairs"
        )
        toks = g[token_col].to_numpy()
        if keep_rows is not None:
            toks = toks[keep_rows]
        if not len(i_idx):
            return EMPTY.copy()
        out = pd.DataFrame({"tok_a": toks[i_idx], "tok_b": toks[j_idx]})
        # i<j in variant-sorted order guarantees tok_a <= tok_b lexically;
        # equal tokens (same token via two of ITS OWN variants) are
        # impossible post drop_duplicates, but a==b via distinct source
        # rows is filtered here for safety
        out = out[out["tok_a"] != out["tok_b"]]
        return out.drop_duplicates()

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["tok_a", "tok_b"])
        if not len(g):
            return pd.DataFrame(
                {
                    "tok_a": pd.Series([], dtype=object),
                    "tok_b": pd.Series([], dtype=object),
                    "dist": pd.Series([], dtype="int64"),
                }
            )
        a = g["tok_a"].to_numpy()
        b = g["tok_b"].to_numpy()
        la = np.fromiter((len(t) for t in a), dtype=np.int64, count=len(a))
        lb = np.fromiter((len(t) for t in b), dtype=np.int64, count=len(b))
        close = np.abs(la - lb) <= max_dist
        dists = np.empty(len(a), dtype=np.int64)
        dists.fill(max_dist + 1)
        for i in np.flatnonzero(close):
            dists[i] = _lev_capped(
                np.frombuffer(a[i].encode("utf-32-le"), dtype=np.uint32),
                np.frombuffer(b[i].encode("utf-32-le"), dtype=np.uint32),
                max_dist,
            )
        keep = dists <= max_dist
        return pd.DataFrame(
            {"tok_a": a[keep], "tok_b": b[keep], "dist": dists[keep]}
        )

    var = vocab.map_batches(variants, batch_format="pandas")
    cands = bucketed_group_reduce(
        var, key_cols=["variant"], reduce_fn=candidate_pairs, num_buckets=num_buckets
    )
    return bucketed_group_reduce(
        cands, key_cols=["tok_a", "tok_b"], reduce_fn=verify, num_buckets=num_buckets
    )


def _span_counts(
    docs: "rd.Dataset",
    window: int,
    num_buckets: int | None,
    out_col: str,
    flag,
) -> "rd.Dataset":
    """Shared skeleton for per-document gram-span classification
    (`dupspan_counts` / `novelty_counts`): emit one (fp, doc_id, k)
    row per distinct window-gram fingerprint per doc, ONE fp-keyed
    exchange classifies each (fp, doc) row via ``flag`` (a vectorized
    predicate over the fp-grouped frame), ONE doc-keyed exchange sums
    (doc_id, n_grams, <out_col>).

    Grams travel as 64-bit fingerprints (wrapping FNV-polynomial over
    codepoint-FNV token hashes — exactly the ``doc_rolling_fp`` oracle
    fold, so SQL reproduces every fp bit-for-bit in HUGEINT): the
    exchanges carry 3-int rows only, never text. Fingerprint
    collisions merge distinct grams with probability ~n_grams²/2^65
    (the doc_exact_dedup epistemic grade). Documents shorter than
    ``window`` tokens drop (they have no grams)."""
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.ops.sketch import _fnv1a_strings

    B = np.uint64(1099511628211)
    w = int(window)
    if w < 2:
        raise ValueError("window must be >= 2")

    EMPTY = pd.DataFrame(
        {
            "fp": pd.Series([], dtype="int64"),
            "doc_id": pd.Series([], dtype="int64"),
            "k": pd.Series([], dtype="int64"),
        }
    )

    def gram_partial(df: pd.DataFrame) -> pd.DataFrame:
        tok_lists = [_WORD.findall(t) for t in df["text"]]
        vocab_arr = sorted({t for toks in tok_lists for t in toks})
        if vocab_arr:
            h_vocab = dict(
                zip(vocab_arr, _fnv1a_strings(np.array(vocab_arr, dtype=str)))
            )
        fps_all, ids_all, k_all = [], [], []
        for doc_id, toks in zip(df["doc_id"].to_numpy(dtype=np.int64), tok_lists):
            if len(toks) < w:
                continue
            hs = np.fromiter(
                (h_vocab[t] for t in toks), dtype=np.uint64, count=len(toks)
            )
            with np.errstate(over="ignore"):  # wrapping uint64 by design
                acc = np.zeros(len(hs) - w + 1, dtype=np.uint64)
                for j in range(w):
                    acc = acc * B + hs[j : j + len(acc)]
            uniq, cnt = np.unique(acc, return_counts=True)
            fps_all.append(uniq.view(np.int64))
            ids_all.append(np.full(len(uniq), doc_id, dtype=np.int64))
            k_all.append(cnt.astype(np.int64))
        if not fps_all:
            return EMPTY.copy()
        return pd.DataFrame(
            {
                "fp": np.concatenate(fps_all),
                "doc_id": np.concatenate(ids_all),
                "k": np.concatenate(k_all),
            }
        )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_grams": pd.Series([], dtype="int64"),
                    out_col: pd.Series([], dtype="int64"),
                }
            )
        g = g.groupby(["fp", "doc_id"], as_index=False)["k"].sum()
        k = g["k"].to_numpy(dtype=np.int64)
        part = pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_grams": k,
                out_col: np.where(flag(g), k, 0),
            }
        )
        return part.groupby("doc_id", as_index=False)[["n_grams", out_col]].sum()

    def doc_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("doc_id", as_index=False)[["n_grams", out_col]].sum()
        out["n_grams"] = out["n_grams"].astype("int64")
        out[out_col] = out[out_col].astype("int64")
        return out

    per_fp = bucketed_group_reduce(
        docs.select_columns(["doc_id", "text"]).map_batches(
            gram_partial, batch_format="pandas"
        ),
        key_cols=["fp"],
        reduce_fn=classify,
        num_buckets=num_buckets,
    )
    return bucketed_group_reduce(
        per_fp, key_cols=["doc_id"], reduce_fn=doc_sum, num_buckets=num_buckets
    )


def dupspan_counts(
    docs: "rd.Dataset",
    window: int = 8,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-document duplicated-span counts — the token-window form of
    the ExactSubstr signal from Lee et al. 2022 ("Deduplicating
    Training Data Makes Language Models Better"): a gram position is
    DUPLICATED iff its ``window``-token n-gram also occurs in at least
    one OTHER document. Returns (doc_id, n_grams, n_dup);
    n_dup / n_grams is the cross-document duplication fraction used to
    cut boilerplate-heavy documents. Scale shape: `_span_counts`."""

    def is_dup(g: pd.DataFrame) -> np.ndarray:
        return g.groupby("fp")["doc_id"].transform("size").to_numpy() >= 2

    return _span_counts(docs, window, num_buckets, "n_dup", is_dup)


def novelty_counts(
    docs: "rd.Dataset",
    window: int = 8,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-document FIRST-OCCURRENCE novelty — the incremental-corpus
    view of substring dedup (process docs in doc_id order; a gram
    position is NOVEL iff no lower-id document contains the same
    ``window``-token n-gram): (doc_id, n_grams, n_novel).
    n_novel / n_grams is the marginal-contribution signal for corpus
    growth curves and crawl-snapshot triage (how much genuinely new
    text a document adds over everything already ingested) — the
    within-corpus analogue of the Bloom incremental dedup
    (`kgflow.ops.sketch.bloom_new_docs`), exact instead of
    probabilistic. All instances inside the owning (minimum-id)
    document count as novel, including its own internal repeats.
    Scale shape: `_span_counts` (two 3-int exchanges, no text)."""

    def is_novel(g: pd.DataFrame) -> np.ndarray:
        owner = g.groupby("fp")["doc_id"].transform("min").to_numpy()
        return g["doc_id"].to_numpy() == owner

    return _span_counts(docs, window, num_buckets, "n_novel", is_novel)


def cross_minhash_pairs(
    docs: "rd.Dataset",
    side_col: str = "side",
    num_hashes: int = 64,
    bands: int = 16,
    rows: int = 4,
    threshold: float = 0.5,
    max_bucket: int = 100,
    seed: int = 42,
) -> "rd.Dataset":
    """BIPARTITE near-dup join: pairs (doc_a from side 0, doc_b from
    side 1) with word-3-gram Jaccard ≥ threshold — the incremental-
    ingest shape (new crawl vs existing corpus) where the self-join's
    within-side pairs are noise. Input is ONE dataset
    (doc_id, text, side ∈ {0, 1}) — deliberately NOT two datasets:
    ray 2.49 unions of datasets with shared lineage were observed to
    duplicate blocks and upcast the exchange key to float64 (rows
    landed in wrong buckets; the verify silently returned 0 pairs), so
    the caller tags sides upstream where one map can emit both. Doc
    ids must be unique ACROSS sides (the verify keys text by id);
    a doc id seen on both sides fails loudly in-bucket.

    Scale shape: identical to `minhash_pairs` (ids-only band shuffle,
    capped buckets, text joined back co-partitioned through the shared
    `exact_jaccard_verify` tail) with one change — band rows carry the
    side bit and the in-bucket enumeration keeps ONLY cross-side
    pairs, so candidate volume is |A∩bucket|·|B∩bucket| instead of
    the full n²/2."""

    def band_rows(batch: pa.Table) -> pa.Table:
        hasher = MinHasher(num_hashes=num_hashes, seed=seed)
        tok_cache: dict = {}
        o_band, o_hash, o_id, o_side = [], [], [], []
        for did, t, sdv in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
            batch.column(side_col).to_pylist(),
        ):
            x = _word_shingles(t, _cache=tok_cache)
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
                o_side.append(int(sdv))
        return pa.table(
            {
                "band_id": pa.array(o_band, pa.int32()),
                "band_hash": pa.array(np.asarray(o_hash, dtype=np.uint64)),
                "doc_id": pa.array(o_id, pa.int64()),
                "side": pa.array(np.asarray(o_side, dtype=np.int8)),
            }
        )

    def coarse_cross(g: pd.DataFrame) -> pd.DataFrame:
        EMPTY = pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
            }
        )
        if not len(g) or "band_id" not in g.columns:
            return EMPTY
        g = g.sort_values(
            ["band_id", "band_hash", "doc_id"], kind="mergesort"
        )
        two_sides = g.groupby("doc_id")["side"].nunique()
        if (two_sides > 1).any():
            bad = int(two_sides[two_sides > 1].index[0])
            raise ValueError(
                "cross_minhash_pairs: doc_id "
                f"{bad} appears on BOTH sides — id spaces must be "
                "disjoint"
            )
        bi = g["band_id"].to_numpy()
        bh = g["band_hash"].to_numpy()
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        sd = g["side"].to_numpy(dtype=np.int8)
        new_seg = np.empty(len(g), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = (bi[1:] != bi[:-1]) | (bh[1:] != bh[:-1])
        i_idx, j_idx, keep_rows = _segment_pair_indices(
            new_seg, max_bucket, "cross_minhash_pairs"
        )
        if keep_rows is not None:
            ids = ids[keep_rows]
            sd = sd[keep_rows]
        mixed = sd[i_idx] != sd[j_idx]
        i_idx, j_idx = i_idx[mixed], j_idx[mixed]
        if not len(i_idx):
            return EMPTY
        a_first = sd[i_idx] == 0
        return pd.DataFrame(
            {
                "doc_a": np.where(a_first, ids[i_idx], ids[j_idx]),
                "doc_b": np.where(a_first, ids[j_idx], ids[i_idx]),
            }
        )

    from kgflow.ops.shuffle import bucketed_group_reduce

    cands = bucketed_group_reduce(
        docs.select_columns(["doc_id", "text", side_col]).map_batches(
            band_rows, batch_format="pyarrow"
        ),
        key_cols=["band_id", "band_hash"],
        reduce_fn=coarse_cross,
    )
    return exact_jaccard_verify(
        cands,
        docs.select_columns(["doc_id", "text"]),
        threshold=threshold,
    )
