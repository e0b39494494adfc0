"""Sketch operators: HyperLogLog approximate distinct counts and
count-min-sketch heavy hitters — the bounded-memory primitives a
100 TB pipeline uses where exact answers would shuffle the full key
domain.

Both follow the engine's combiner + tiny-exchange skeleton, with the
crucial sketch property that the EXCHANGE SIZE IS CONSTANT in the data:

- HLL: every block collapses to ≤ 2^p (register, max-rho) pairs; the
  register-keyed reduce maxes them; the final estimate reads 2^p rows
  (4 KiB at p=12) regardless of input size. Standard bias-corrected
  estimator (Flajolet et al. 2007, public formula) with the small-range
  linear-counting correction.
- CMS heavy hitters: every block collapses to its depth×width count
  array plus a local candidate top-m; arrays merge by elementwise sum
  (sketch size is constant), candidates by union; final counts are the
  CMS point queries (overestimates by ≤ εN with prob 1-δ, ε=e/width,
  δ=e^-depth — Cormode & Muthukrishnan 2005, public formula).

Hashing is deterministic (splitmix-finalized FNV over the string form,
same family as `kgflow.ops.shuffle.add_hash_bucket`), so results are
run-to-run and partitioning-independent — required for the driver's
hash-compare and for resume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd

from kgflow.ops.shuffle import bucketed_group_reduce

_FNV_PRIME = np.uint64(1099511628211)
_FNV_OFFSET = np.uint64(14695981039346656037)


def _hash64(s: pd.Series) -> np.ndarray:
    """Deterministic 64-bit hash of the series' string form —
    `pd.util.hash_pandas_object` (stable across processes for a fixed
    key) + splitmix avalanche, matching the engine's bucket hashing."""
    h = pd.util.hash_pandas_object(s.astype(str), index=False).to_numpy(
        dtype=np.uint64
    )
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def _hll_partial(h: np.ndarray, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) per hash: top ``p`` bits pick the register,
    rho = position (1-based) of the leftmost 1-bit in the remaining
    bits. A sentinel bit planted at position p-1 caps rho at 64-p+1, so
    the vectorized leading-zero loop below terminates in ≤ 64-p+1
    numpy passes (expected ~log2(batch) — a float-cast clz would be
    unsafe above 2^53)."""
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    v = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    lz = np.zeros(len(v), dtype=np.int64)
    remaining = np.ones(len(v), dtype=bool)
    while remaining.any():
        remaining &= (v >> np.uint64(63)) == 0
        lz[remaining] += 1
        v = v << np.uint64(1)
    return idx, lz + 1


def hll_registers(
    ds: "rd.Dataset",
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """(group…, register, rho) max-merged HLL registers — the mergeable
    sketch state. Exchange carries ≤ blocks × groups-per-block × 2^p
    rows of 3 ints."""
    gcols = list(group_cols or [])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        idx, rho = _hll_partial(_hash64(df[value_col]), p)
        out = df[gcols].copy() if gcols else pd.DataFrame(index=df.index)
        out["register"] = idx
        out["rho"] = rho
        return out.groupby(gcols + ["register"], as_index=False, sort=False)[
            "rho"
        ].max()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(gcols + ["register"], as_index=False, sort=False)[
            "rho"
        ].max()

    cols = gcols + [value_col]
    return bucketed_group_reduce(
        ds.select_columns(cols).map_batches(partial, batch_format="pandas"),
        key_cols=gcols + ["register"],
        reduce_fn=merge,
        num_buckets=num_buckets,
    )


def _hll_estimate(rho_by_register: np.ndarray, p: int) -> float:
    """Bias-corrected harmonic-mean estimate over dense registers
    (``rho_by_register``: compact (register, rho) pairs; absent
    registers are zero)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.float64)
    regs[rho_by_register[:, 0].astype(np.int64)] = rho_by_register[:, 1]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def hll_distinct(
    ds: "rd.Dataset",
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT value_col) [GROUP BY group_cols] with
    relative error ~1.04/sqrt(2^p) (≈1.6% at p=12). The driver pull is
    |groups| × ≤2^p register rows — constant in the DATA size; the
    estimate itself is a tiny numpy fold per group."""
    gcols = list(group_cols or [])
    regs = hll_registers(
        ds, value_col, group_cols=gcols, p=p, num_buckets=num_buckets
    ).to_pandas()  # ≤ |groups| × 2^p rows, data-size-independent
    if not gcols:
        n = _hll_estimate(regs[["register", "rho"]].to_numpy(), p)
        return pd.DataFrame({"n_distinct_approx": [int(round(n))]})
    rows = []
    for key, g in regs.groupby(gcols, sort=False):
        key = key if isinstance(key, tuple) else (key,)
        n = _hll_estimate(g[["register", "rho"]].to_numpy(), p)
        rows.append(dict(zip(gcols, key)) | {"n_distinct_approx": int(round(n))})
    return pd.DataFrame(rows).sort_values(gcols).reset_index(drop=True)


def bloom_build(
    ds: "rd.Dataset",
    value_col: str,
    n_bits: int = 1 << 22,
    k: int = 4,
    num_buckets: int | None = None,
) -> np.ndarray:
    """Bloom filter over ``value_col`` as a packed uint64 word array —
    the incremental-crawl membership structure (filter today's corpus
    against yesterday's, no join). Per-block SPARSE (word, bits)
    partials OR-merge behind one bucketed exchange; the driver pull is
    ≤ n_bits/64 rows (constant in the data). Double hashing
    h1 + i·h2 gives the k probe positions (Kirsch–Mitzenmacher)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h1 = _hash64(df[value_col])
        h2 = h1 * np.uint64(0x9E3779B97F4A7C15)
        h2 ^= h2 >> np.uint64(29)
        h2 |= np.uint64(1)  # odd stride
        words = np.zeros(n_bits >> 6, dtype=np.uint64)
        for i in range(k):
            idx = ((h1 + np.uint64(i) * h2) % np.uint64(n_bits)).astype(np.int64)
            np.bitwise_or.at(
                words, idx >> 6, np.uint64(1) << (idx & np.int64(63)).astype(np.uint64)
            )
        nz = np.nonzero(words)[0]
        return pd.DataFrame(
            {"word": nz, "bits": words[nz].view(np.int64)}
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("word", as_index=False)["bits"].agg(np.bitwise_or.reduce)

    sparse = bucketed_group_reduce(
        ds.select_columns([value_col]).map_batches(partial, batch_format="pandas"),
        key_cols=["word"],
        reduce_fn=merge,
        num_buckets=num_buckets,
    ).to_pandas()  # ≤ n_bits/64 rows, data-size-independent
    words = np.zeros(n_bits >> 6, dtype=np.uint64)
    words[sparse["word"].to_numpy(dtype=np.int64)] = (
        sparse["bits"].to_numpy(dtype=np.int64).view(np.uint64)
    )
    return words


def bloom_filter_new(
    ds: "rd.Dataset",
    value_col: str,
    bloom_words: np.ndarray,
    n_bits: int | None = None,
    k: int = 4,
    concurrency=(1, 4),
) -> "rd.Dataset":
    """Rows of ``ds`` whose ``value_col`` is DEFINITELY NOT in the
    filter — nothing previously seen survives; a false positive drops a
    genuinely-new row with probability ≈ (k·n/n_bits)^k (size n_bits
    for the expected corpus so this is negligible; the build-side FP
    rate is the documented trade of Bloom-based incremental dedup).
    The word array is broadcast once; membership is fully vectorized."""
    nb = n_bits if n_bits is not None else len(bloom_words) << 6
    ref = ray.put(bloom_words)

    class Filter:
        def __init__(self):
            self.words = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            h1 = _hash64(df[value_col])
            h2 = h1 * np.uint64(0x9E3779B97F4A7C15)
            h2 ^= h2 >> np.uint64(29)
            h2 |= np.uint64(1)
            hit = np.ones(len(df), dtype=bool)
            for i in range(k):
                idx = ((h1 + np.uint64(i) * h2) % np.uint64(nb)).astype(np.int64)
                bit = (
                    self.words[idx >> 6]
                    >> (idx & np.int64(63)).astype(np.uint64)
                ) & np.uint64(1)
                hit &= bit.astype(bool)
            return df[~hit]

    return ds.map_batches(Filter, batch_format="pandas", concurrency=concurrency)


def heavy_hitters(
    ds: "rd.Dataset",
    value_col: str,
    k: int = 10,
    width: int = 2048,
    depth: int = 4,
    candidates_per_block: int = 64,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Approximate top-``k`` most frequent values. Every block emits its
    count-min array (depth×width int64, CONSTANT size) and its local
    top-``candidates_per_block`` values; arrays merge by sum, candidates
    by union; final counts are CMS point queries (min over depth rows —
    overestimate ≤ εN, never under). A true heavy hitter (freq > n/
    candidates_per_block·blocks share) appears in some block's local
    top-m with overwhelming probability; the classic streaming guarantee
    holds when candidates_per_block ≥ k (Charikar et al. / CM-sketch
    heavy-hitter construction).

    Returns (value, n_approx) ordered n DESC, value ASC."""
    seeds = [
        np.uint64((0x9E3779B97F4A7C15 * (d + 1)) & 0xFFFFFFFFFFFFFFFF)
        for d in range(depth)
    ]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[value_col].astype(str).value_counts()
        vals = pd.Series(vc.index)
        cnts = vc.to_numpy(dtype=np.int64)
        h = _hash64(vals)
        rows = []
        for d, seed in enumerate(seeds):
            hd = h * seed
            hd ^= hd >> np.uint64(29)
            slot = (hd % np.uint64(width)).astype(np.int64)
            cell = pd.DataFrame({"slot": slot, "n": cnts}).groupby(
                "slot", as_index=False
            )["n"].sum()
            cell["row"] = d
            rows.append(cell)
        cms = pd.concat(rows, ignore_index=True)
        cms["value"] = ""
        cms["kind"] = np.int8(0)
        cand = pd.DataFrame(
            {
                "row": np.int64(-1),
                "slot": np.int64(-1),
                "n": cnts[:candidates_per_block],
                "value": vals.iloc[:candidates_per_block].to_numpy(),
                "kind": np.int8(1),
            }
        )
        return pd.concat([cms, cand], ignore_index=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        cms = g[g["kind"] == 0]
        out = cms.groupby(["row", "slot"], as_index=False, sort=False)["n"].sum()
        out["value"] = ""
        out["kind"] = np.int8(0)
        cand = g.loc[g["kind"] == 1, ["row", "slot", "n", "value", "kind"]]
        cand = cand.drop_duplicates("value")
        return pd.concat([out, cand], ignore_index=True)

    # the sketch state is constant-size; one bucketed exchange keyed on
    # (kind,row,slot) for cells and (kind,value) for candidates merges it
    tagged = ds.select_columns([value_col]).map_batches(
        partial, batch_format="pandas"
    )
    merged = bucketed_group_reduce(
        tagged,
        key_cols=["kind", "row", "slot", "value"],
        reduce_fn=merge,
        num_buckets=num_buckets,
    ).to_pandas()  # depth×width cells + ≤ blocks×m candidates

    cms = np.zeros((depth, width), dtype=np.int64)
    cells = merged[merged["kind"] == 0]
    cms[cells["row"].to_numpy(), cells["slot"].to_numpy()] = cells["n"].to_numpy()
    cand_vals = pd.Series(sorted(set(merged.loc[merged["kind"] == 1, "value"])))
    if not len(cand_vals):
        return pd.DataFrame({"value": [], "n_approx": []})
    h = _hash64(cand_vals)
    ests = np.full(len(cand_vals), np.iinfo(np.int64).max, dtype=np.int64)
    for d, seed in enumerate(seeds):
        hd = h * seed
        hd ^= hd >> np.uint64(29)
        slot = (hd % np.uint64(width)).astype(np.int64)
        ests = np.minimum(ests, cms[d, slot])
    out = pd.DataFrame({"value": cand_vals, "n_approx": ests})
    return (
        out.sort_values(["n_approx", "value"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


_FNV_SQL_NOTE = """FNV-1a over the id's decimal-string codepoints —
the SAME fold the doc_simhash_pairs oracle replicates in DuckDB
HUGEINT arithmetic, so a SQL oracle can reproduce the sample (and
therefore the whole sketch output) bit-exactly."""


def _fnv1a_decimal(ids: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a (64-bit) over each id's decimal-string ASCII
    codes. Ids group by digit-length so every length-class folds as a
    dense [n, L] codepoint matrix — no per-row Python. Non-negative
    int64 ids only (decimal form is the cross-engine-stable byte
    representation; see _FNV_SQL_NOTE)."""
    if len(ids) and ids.min() < 0:
        raise ValueError("_fnv1a_decimal requires non-negative ids")
    strs = ids.astype(np.int64).astype(str)
    lens = np.char.str_len(strs)
    out = np.empty(len(ids), dtype=np.uint64)
    for L in np.unique(lens):
        m = lens == L
        codes = np.frombuffer(
            strs[m].astype(f"U{L}").tobytes(), dtype=np.uint32
        ).reshape(-1, L)
        h = np.full(int(m.sum()), _FNV_OFFSET, dtype=np.uint64)
        for c in range(L):
            h ^= codes[:, c].astype(np.uint64)
            h *= _FNV_PRIME
        out[m] = h
    return out


def bottomk_sample_quantiles(
    ds: "rd.Dataset",
    id_col: str,
    value_col: str,
    k: int = 1024,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Approximate quantiles from a DETERMINISTIC bottom-k sample
    (Cohen & Kaplan's bottom-k sketch): keep the k rows whose FNV-1a
    id-hash is smallest, estimate quantiles from that uniform sample.
    Rank error is the classical sampling bound O(sqrt(ln(1/δ)/k))·n —
    ~3% of n at k=1024 — against CONSTANT exchange size, where the
    exact `grouped_quantiles` histogram grows with the value DOMAIN
    (unbounded for heavy-tailed doubles at 100 TB).

    Unlike KLL/t-digest, whose compaction coin-flips make the result
    depend on merge order, bottom-k is a pure min-semilattice: the
    bottom-k of a union is the bottom-k of the parts' bottom-ks, so
    the output is partitioning-independent, resumable, and (because
    the hash is the simhash oracle's FNV fold) SQL-oracle-able —
    approximate vs the data, exact vs the algorithm.

    Output: (q, v) rows, v the nearest-rank sample value (a raw input
    double — no arithmetic, hash-exact). Exchange: each block shrinks
    to its local bottom-k, ONE single-bucket reduce sees ≤ blocks×k
    rows of 3 scalars."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(dtype=np.int64)
        h = _fnv1a_decimal(ids)
        n = min(k, len(ids))
        if not n:
            return pd.DataFrame(
                {
                    "_h": pd.Series([], dtype="uint64"),
                    id_col: pd.Series([], dtype="int64"),
                    value_col: pd.Series([], dtype="float64"),
                    "_one": pd.Series([], dtype="int64"),
                }
            )
        idx = np.lexsort((ids, h))[:n]
        return pd.DataFrame(
            {
                "_h": h[idx],
                id_col: ids[idx],
                value_col: df[value_col].to_numpy(dtype=np.float64)[idx],
                "_one": np.zeros(n, dtype=np.int64),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "q": pd.Series([], dtype="float64"),
                    "v": pd.Series([], dtype="float64"),
                }
            )
        order = np.lexsort(
            (g[id_col].to_numpy(dtype=np.int64), g["_h"].to_numpy(dtype=np.uint64))
        )[:k]
        v = np.sort(g[value_col].to_numpy(dtype=np.float64)[order])
        n = len(v)
        ranks = np.maximum(np.ceil(np.asarray(qs) * n).astype(np.int64), 1) - 1
        return pd.DataFrame({"q": np.asarray(qs, dtype=np.float64), "v": v[ranks]})

    partials = ds.select_columns([id_col, value_col]).map_batches(
        partial, batch_format="pandas"
    )
    return bucketed_group_reduce(
        partials, key_cols=["_one"], reduce_fn=finish, num_buckets=num_buckets
    )


def weighted_bottomk(
    ds: "rd.Dataset",
    id_col: str,
    weight_col: str,
    k: int = 256,
    group_cols: list[str] | None = None,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Deterministic weight-biased bottom-k sample: each row gets an
    integer priority FNV1a(id) // weight and the global k lowest
    priorities win — heavier rows draw proportionally smaller
    priorities, so inclusion probability grows with weight (the
    integer-exact cousin of sequential Poisson / priority sampling,
    Duffield-Lund-Thorup; exact order statistics replace the u^(1/w)
    float transform so the sample is bit-reproducible in ANY engine
    that can fold FNV — see _FNV_SQL_NOTE).

    Weights must be >= 1 (guarded). Output: the k (id, weight) winners
    — per GROUP when ``group_cols`` is given (stratified quota
    sampling: k docs per language, per source, …), global otherwise.

    Scale shape: like `bottomk_sample_quantiles` — priority is a pure
    min-semilattice, every block shrinks to its local per-group
    bottom-k before the single ≤ blocks×groups×k-row reduce; nothing
    heavier than the key + two int64 scalars rides the exchange, and
    the result is partitioning-independent and resumable."""
    gcols = list(group_cols or [])

    def per_group_topk(d: pd.DataFrame) -> pd.DataFrame:
        d = d.sort_values(gcols + ["_pri", id_col], kind="mergesort")
        return d.groupby(gcols, sort=False, as_index=False).head(k) if gcols \
            else d.head(k)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(dtype=np.int64)
        w = df[weight_col].to_numpy(dtype=np.int64)
        if len(w) and w.min() < 1:
            raise ValueError("weighted_bottomk requires weights >= 1")
        d = pd.DataFrame(
            {
                "_pri": _fnv1a_decimal(ids) // w.astype(np.uint64),
                id_col: ids,
                weight_col: w,
            }
        )
        for c in gcols:
            d[c] = df[c].to_numpy()
        if not gcols:
            d["_one"] = np.int64(0)
        return per_group_topk(d)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = per_group_topk(g)
        return out[gcols + [id_col, weight_col]].reset_index(drop=True)

    cols = gcols + [id_col, weight_col]
    partials = ds.select_columns(cols).map_batches(partial, batch_format="pandas")
    from kgflow.ops.shuffle import bucketed_group_reduce

    return bucketed_group_reduce(
        partials,
        key_cols=gcols or ["_one"],
        reduce_fn=finish,
        num_buckets=num_buckets if gcols else 1,
    )


def _fnv1a_strings(strs: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a (64-bit) over arbitrary ASCII strings — the
    `_fnv1a_decimal` fold generalized to composed row keys (e.g.
    "id|n_chars"). Strings group by length so every length-class folds
    as a dense [n, L] codepoint matrix — no per-row Python."""
    strs = np.asarray(strs, dtype=str)
    lens = np.char.str_len(strs)
    out = np.empty(len(strs), dtype=np.uint64)
    for L in np.unique(lens):
        m = lens == L
        codes = np.frombuffer(
            strs[m].astype(f"U{L}").tobytes(), dtype=np.uint32
        ).reshape(-1, L)
        h = np.full(int(m.sum()), _FNV_OFFSET, dtype=np.uint64)
        for c in range(L):
            h ^= codes[:, c].astype(np.uint64)
            h *= _FNV_PRIME
        out[m] = h
    return out
