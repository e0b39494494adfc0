"""Data-quality gate: vectorized rule-violation counts and referential
integrity — the validation pass a pipeline runs on every ingest before
promoting a partition (pairs with the lineage manifest's per-partition
metrics, `kgflow/materialize/manifest.py`).

Rule checks are per-batch boolean kernels (one partial count row per
rule per block — the exchange carries |rules| × |blocks| ints); FK
checks reuse the distinct-key semi/anti machinery
(`kgflow.ops.joins.anti_join`), so the parent side ships distinct keys
only.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
import ray.data as rd

from kgflow.ops.shuffle import bucketed_group_reduce


def rule_violation_counts(
    ds: "rd.Dataset",
    rules: dict[str, Callable[[pd.DataFrame], np.ndarray]],
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """(rule, n_violations) — each rule maps a batch to a boolean
    VIOLATION mask (True = bad row); partial counts per block, one tiny
    rule-keyed reduce."""
    if not rules:
        raise ValueError("rules must be non-empty")
    names = list(rules)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "rule": names,
                "n_violations": [
                    int(np.asarray(rules[n](df), dtype=bool).sum()) for n in names
                ],
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("rule", as_index=False)["n_violations"].sum()
        out["n_violations"] = out["n_violations"].astype(np.int64)
        return out

    return bucketed_group_reduce(
        ds.map_batches(partial, batch_format="pandas"),
        key_cols=["rule"],
        reduce_fn=merge,
        num_buckets=min(num_buckets or len(names), len(names)),
    )


def fk_violation_count(
    child: "rd.Dataset",
    parent: "rd.Dataset",
    child_key: str,
    parent_key: str,
    rule: str,
) -> pd.DataFrame:
    """One (rule, n_violations) row: child rows whose key has no parent
    (distributed anti join — parent reduces to distinct keys first)."""
    from kgflow.ops.joins import anti_join

    orphans = anti_join(
        child.select_columns([child_key]).map_batches(
            lambda df: df.rename(columns={child_key: parent_key}),
            batch_format="pandas",
        ),
        parent.select_columns([parent_key]),
        on=parent_key,
    )
    return pd.DataFrame({"rule": [rule], "n_violations": [int(orphans.count())]})


def table_checksum(
    ds: "rd.Dataset",
    cols: list[str],
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Order-independent table fingerprint: FNV-1a over each row's
    '|'-joined decimal key, wrap-summed mod 2⁶⁴ — the cheap
    anti-entropy check a 100-TB pipeline runs after every copy,
    re-partition or engine migration (two tables with equal (n_rows,
    checksum) agree row-for-row up to hash collision, regardless of
    row order or partitioning; a commutative sum is exactly what makes
    the check partitioning-independent and resumable).

    ``cols`` must be integer-valued columns (decimal form is the
    cross-engine-stable byte representation — the `_FNV_SQL_NOTE`
    convention, so the fingerprint reproduces bit-exactly in SQL).

    Output: ONE row (n_rows, checksum). Scale shape: each block folds
    to a single (count, wrapped-sum) partial — the exchange carries
    one 2-scalar row per block."""
    import numpy as np
    import pandas as pd

    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.ops.sketch import _fnv1a_strings

    def partial(d: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            return pd.DataFrame(
                {
                    "_g": pd.Series([], dtype="int64"),
                    "n_rows": pd.Series([], dtype="int64"),
                    "checksum": pd.Series([], dtype="uint64"),
                }
            )
        parts = [
            np.asarray(d[c].to_numpy(dtype=np.int64), dtype=np.int64).astype(str)
            for c in cols
        ]
        key = parts[0]
        for p in parts[1:]:
            key = np.char.add(np.char.add(key, "|"), p)
        h = _fnv1a_strings(key)
        with np.errstate(over="ignore"):
            s = np.uint64(np.add.reduce(h, dtype=np.uint64))
        return pd.DataFrame(
            {
                "_g": np.array([0], dtype=np.int64),
                "n_rows": np.array([len(d)], dtype=np.int64),
                "checksum": np.array([s], dtype=np.uint64),
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        with np.errstate(over="ignore"):
            s = np.uint64(
                np.add.reduce(g["checksum"].to_numpy(dtype=np.uint64), dtype=np.uint64)
            )
        return pd.DataFrame(
            {
                "n_rows": [int(g["n_rows"].sum())],
                "checksum": np.array([s], dtype=np.uint64),
            }
        )

    partials = ds.select_columns(cols).map_batches(partial, batch_format="pandas")
    return bucketed_group_reduce(
        partials, key_cols=["_g"], reduce_fn=finish, num_buckets=1
    )


def snapshot_diff(
    old: "rd.Dataset",
    new: "rd.Dataset",
    key_col: str,
    cols: list[str],
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Delta between two snapshots of a keyed table: (key, change) for
    every key that was ``added``, ``removed`` or ``changed`` between
    ``old`` and ``new`` — the incremental-ingest primitive (what
    changed since the last run decides what downstream recomputes).

    Keys must be unique within each snapshot; ``cols`` must be
    int/string-valued (their composed string repr is hashed — float
    repr is not cross-engine stable).

    Scale shape: each side shrinks per block to (key, FNV64-of-cols)
    — payloads never leave the scan — then ONE key-bucketed exchange
    classifies each key with a vectorized outer merge; hashes ride as
    nullable Int64 through the merge (a float64 upcast would corrupt
    equality above 2^53). Unchanged keys (the overwhelming majority in
    real deltas) are dropped inside the bucket, so output is
    delta-bounded."""
    from kgflow.ops.sketch import _fnv1a_strings

    def tagger(side: int):
        def tag(d: pd.DataFrame) -> pd.DataFrame:
            if not len(d):
                return pd.DataFrame(
                    {
                        key_col: pd.Series([], dtype="int64"),
                        "_h": pd.Series([], dtype="int64"),
                        "_side": pd.Series([], dtype="int8"),
                    }
                )
            parts = [d[c].to_numpy().astype(str) for c in cols]
            key = parts[0]
            for p in parts[1:]:
                key = np.char.add(np.char.add(key, "|"), p)
            h = _fnv1a_strings(key).view(np.int64)
            return pd.DataFrame(
                {
                    key_col: d[key_col].to_numpy(),
                    "_h": h,
                    "_side": np.full(len(d), side, dtype=np.int8),
                }
            )

        return tag

    tagged = old.map_batches(tagger(0), batch_format="pandas").union(
        new.map_batches(tagger(1), batch_format="pandas")
    )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        a = g.loc[g["_side"] == 0, [key_col, "_h"]].copy()
        b = g.loc[g["_side"] == 1, [key_col, "_h"]].copy()
        a["_h"] = a["_h"].astype("Int64")
        b["_h"] = b["_h"].astype("Int64")
        m = a.merge(b, on=key_col, how="outer", suffixes=("_a", "_b"))
        added = m["_h_a"].isna().to_numpy()
        removed = m["_h_b"].isna().to_numpy()
        same = (m["_h_a"] == m["_h_b"]).fillna(False).to_numpy()
        change = np.where(
            added, "added", np.where(removed, "removed", "changed")
        )
        keep = ~same
        return pd.DataFrame(
            {
                key_col: m.loc[keep, key_col].to_numpy(),
                "change": change[keep],
            }
        )

    return bucketed_group_reduce(
        tagged, key_cols=[key_col], reduce_fn=classify,
        num_buckets=num_buckets,
    )


def fd_violations(
    ds: "rd.Dataset",
    det_col: str,
    dep_col: str,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Functional-dependency audit: keys of ``det_col`` that map to
    MORE than one distinct ``dep_col`` value, with the exact distinct
    count — the schema-discovery / data-quality primitive behind
    "is X a reliable key for Y" (denormalization checks, merge-conflict
    detection, candidate-key mining). Emits (det, n_dep) for violating
    keys only.

    Scale shape: a per-block (det, dep) DISTINCT combiner shrinks each
    block before ONE det-bucketed exchange (same skeleton as the
    grouped distinct-count ops — a hot det key's distinct pairs spread
    across blocks still land in one bucket, bounded by its distinct
    dep cardinality, not its row count); the in-bucket pass is a
    vectorized drop_duplicates + value_counts."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df[[det_col, dep_col]].drop_duplicates()

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(subset=[det_col, dep_col])
        vc = u.groupby(det_col, as_index=False, sort=False).size()
        vc = vc.rename(columns={"size": "n_dep"})
        return vc[vc["n_dep"] > 1]

    return bucketed_group_reduce(
        ds.select_columns([det_col, dep_col]).map_batches(
            pairs, batch_format="pandas"
        ),
        key_cols=[det_col],
        reduce_fn=finish,
        num_buckets=num_buckets,
    )


def k_anonymity_violations(
    ds: "rd.Dataset",
    quasi_cols: "list[str]",
    id_col: str,
    k: int = 5,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Privacy audit (Sweeney 2002 k-anonymity): a quasi-identifier
    combination held by FEWER than ``k`` distinct subjects
    re-identifies them — return exactly those combinations with their
    subject counts (quasi_cols…, n_subjects), the rows a release gate
    must suppress or generalize before data leaves the pipeline.

    Scale shape: rides :func:`kgflow.ops.shuffle.grouped_distinct_count`
    — per-batch (quasi, subject) dedup combiners, a (quasi, subject)-
    bucketed exchange (hot quasi-groups SPREAD across buckets), tiny
    partial-sum shuffle — then a map-side ``< k`` filter; the output is
    violation-bounded, not table-bounded."""
    from kgflow.ops.shuffle import grouped_distinct_count

    if k < 2:
        raise ValueError("k_anonymity_violations: k must be >= 2")
    counts = grouped_distinct_count(
        ds, group_cols=list(quasi_cols), value_col=id_col,
        out_col="n_subjects", num_buckets=num_buckets,
    )
    return counts.map_batches(
        lambda d: d.loc[d["n_subjects"] < k], batch_format="pandas"
    )


def duplicate_key_count(
    ds: "rd.Dataset",
    key_cols: list[str],
    rule: str,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """One (rule, n_violations) row counting SURPLUS rows per duplicated
    key tuple (Σ_keys max(n−1, 0) — the dbt `unique` test). Per-batch
    count partials, one key-bucketed reduce; only (key, count) rows ride
    the exchange."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(key_cols, as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(key_cols, as_index=False)["n"].sum()
        return pd.DataFrame(
            {"dups": [int((c["n"].to_numpy(dtype=np.int64) - 1).clip(0).sum())]}
        )

    parts = bucketed_group_reduce(
        ds.select_columns(key_cols).map_batches(
            partial, batch_format="pandas"
        ),
        key_cols=key_cols,
        reduce_fn=merge,
        num_buckets=num_buckets,
    ).to_pandas()  # one int per bucket — bounded pull
    return pd.DataFrame(
        {"rule": [rule], "n_violations": [int(parts["dups"].sum())]}
    )


def expectation_suite(
    ds: "rd.Dataset",
    unique: list[list[str]] | None = None,
    rules: "dict[str, Callable[[pd.DataFrame], np.ndarray]] | None" = None,
    fks: list[tuple[str, str, "rd.Dataset", str]] | None = None,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """dbt/Great-Expectations-style validation suite in one call —
    ``unique`` key tuples (surplus-row counts), vectorized boolean
    ``rules`` (not_null / accepted_values / ranges as violation
    masks), and ``fks`` as (rule_name, child_col, parent_ds,
    parent_col) referential checks. Returns (rule, n_violations), one
    row per check, int64.

    Each check family runs its own bounded distributed pass (count
    partials / anti-join); the final table is |checks| rows, assembled
    on the driver (bounded by the suite size, not the data) —
    deliberately NOT a Dataset union of shared-lineage streams (the
    documented ray-2.49 union hazard)."""
    out: list[pd.DataFrame] = []
    if rules:
        out.append(
            rule_violation_counts(ds, rules, num_buckets=num_buckets)
            .to_pandas()  # |rules| rows
        )
    for keys in unique or []:
        out.append(
            duplicate_key_count(
                ds, keys, rule="unique:" + "+".join(keys),
                num_buckets=num_buckets,
            )
        )
    for name, child_col, parent, parent_col in fks or []:
        out.append(
            fk_violation_count(ds, parent, child_col, parent_col, name)
        )
    if not out:
        raise ValueError("expectation_suite: no checks given")
    res = pd.concat(out, ignore_index=True).astype(
        {"n_violations": "int64"}
    )
    res = res.sort_values("rule", kind="mergesort").reset_index(drop=True)
    return rd.from_pandas(res)
