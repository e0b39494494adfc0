"""Feature-encoding operators for ML pipelines over the engine's
tables: categorical → numeric transforms whose statistics are trained
on the corpus and applied back to every row (the classic
train-the-encoder / apply-the-encoder split a distributed feature
pipeline needs).

Same scale skeleton as `corpus_freq_score` (`kgflow/ops/text.py`): the
per-category statistic is category-bounded, so it reduces in ONE tiny
exchange and BROADCASTS (`ray.put`, one object-store read per actor) —
the corpus itself never shuffles for an encode."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def loo_target_encode(
    ds: "rd.Dataset",
    id_col: str,
    cat_col: str,
    y_col: str,
    scale: int = 100,
    max_categories: int = 100_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Leave-one-out target encoding — the leakage-safe categorical
    encoder: each row's category is replaced by the mean target of all
    OTHER rows in that category, te = (Σy_cat − y_i) / (n_cat − 1).

    Integer-exact and hash-stable: y is quantized first
    (q = floor(y·scale)), and the emitted columns are the EXACT int64
    fraction (te_num = Σq_cat − q_i, te_den = n_cat − 1) — the float
    division is the caller's one driver/consumer-side op, so an SQL
    oracle compares integers, never a float mean. NULL targets are
    excluded from both the statistic and the output (SQL join
    semantics).

    Scale shape: per-batch (cat, n, Σq) partials → ONE category-keyed
    reduce (category-bounded); the stats table is guarded by
    ``max_categories`` BEFORE the driver pull (the pivot-guard rule),
    then broadcast via ``ray.put`` and applied in a single vectorized
    pandas-merge pass per block — the data never shuffles."""
    import ray

    from kgflow.ops.shuffle import bucketed_group_reduce

    def partial(d: pd.DataFrame) -> pd.DataFrame:
        d = d[[cat_col, y_col]].dropna()
        q = np.floor(d[y_col].to_numpy(dtype=np.float64) * scale).astype(np.int64)
        t = pd.DataFrame(
            {cat_col: d[cat_col].to_numpy(), "n": np.int64(1), "sq": q}
        )
        return t.groupby(cat_col, as_index=False, sort=False).sum()

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(cat_col, as_index=False, sort=False)[["n", "sq"]].sum()

    stats_ds = bucketed_group_reduce(
        ds.select_columns([cat_col, y_col]).map_batches(
            partial, batch_format="pandas"
        ),
        key_cols=[cat_col],
        reduce_fn=finish,
        num_buckets=num_buckets,
    )
    n_cat = stats_ds.count()  # distributed count BEFORE any driver pull
    if n_cat > max_categories:
        raise ValueError(
            f"loo_target_encode: {n_cat} categories exceed the broadcast "
            f"guard ({max_categories}); encode a coarser key or raise the cap"
        )
    stats = stats_ds.to_pandas()
    ref = ray.put(stats)

    def apply(d: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(ref)
        d = d[[id_col, cat_col, y_col]].dropna(subset=[y_col])
        q = np.floor(d[y_col].to_numpy(dtype=np.float64) * scale).astype(np.int64)
        m = d[[id_col, cat_col]].merge(s, on=cat_col, how="left")
        return pd.DataFrame(
            {
                id_col: m[id_col].to_numpy(),
                cat_col: m[cat_col].to_numpy(),
                "te_num": m["sq"].to_numpy(dtype=np.int64) - q,
                "te_den": m["n"].to_numpy(dtype=np.int64) - 1,
            }
        )

    return ds.select_columns([id_col, cat_col, y_col]).map_batches(
        apply, batch_format="pandas"
    )


def hash_bucket_encode(
    ds: "rd.Dataset",
    id_col: str,
    cat_cols: list[str],
    n_buckets: int = 64,
) -> "rd.Dataset":
    """The feature-hashing trick (Weinberger et al. 2009): map a
    (possibly crossed) categorical key into a fixed bucket space with
    a deterministic hash — unbounded-cardinality categoricals (urls,
    token crosses) become fixed-width model inputs with NO trained
    state, no vocabulary pass, no shuffle.

    bucket = FNV-1a-64(col₁ || '|' || col₂ …) mod ``n_buckets`` —
    the engine's vectorized string fold (`_fnv1a_strings`, dense
    codepoint matrices per length class) and the SQL list_reduce fold
    compute the identical value, so the oracle hashes exactly. Purely
    map-side: one streaming pass, embarrassingly parallel."""
    from kgflow.ops.sketch import _fnv1a_strings

    def encode(d: pd.DataFrame) -> pd.DataFrame:
        key = d[cat_cols[0]].astype(str)
        for c in cat_cols[1:]:
            key = key + "|" + d[c].astype(str)
        h = _fnv1a_strings(key.to_numpy())
        return pd.DataFrame(
            {
                id_col: d[id_col].to_numpy(),
                "bucket": (h % np.uint64(n_buckets)).astype(np.int64),
            }
        )

    return ds.select_columns([id_col, *cat_cols]).map_batches(
        encode, batch_format="pandas"
    )
