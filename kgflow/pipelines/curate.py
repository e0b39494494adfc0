"""End-to-end corpus curation: the composed selection pass a
training-data pipeline runs between crawl and tokenizer, chaining the
three published-filter families this engine ships —

  1. Gopher heuristic quality rules   (Rae et al. 2021 A1.1;
     `kgflow.ops.clean.gopher_rules`)
  2. ExactSubstr duplicated-span cap  (Lee et al. 2022;
     `kgflow.ops.dedup.dupspan_counts`)
  3. DSIR importance scores           (Xie et al. 2023;
     `kgflow.ops.text.dsir_scores`)

Selection is INTEGER-exact (rule flags and a cross-multiplied dup-
fraction threshold), so the surviving set is engine/SQL-identical;
the DSIR score rides along as a float column for downstream sampling
rather than gating here (float order near ties is not hash-stable).

Scale shape: the three legs each stream the corpus once (their own
documented exchanges); the composition is ONE doc-keyed co-grouped
exchange over V-bounded per-doc stat rows — never text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def curate_docs(
    docs: "rd.Dataset",
    target_source: str,
    min_words: int = 50,
    min_stopwords: int = 2,
    max_dup_pct: int = 25,
    window: int = 8,
    n_buckets: int = 1024,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """(doc_id, n_words, n_grams, n_dup, dsir_score) for every document
    that passes ALL Gopher rules and whose window-gram cross-document
    duplication fraction is < ``max_dup_pct`` percent (cross-multiplied:
    ``n_dup * 100 < n_grams * max_dup_pct``). Documents shorter than
    ``window`` tokens have no grams and drop (nothing to dedup-check —
    the Gopher word-count floor already rejects them at real settings).
    """
    from kgflow.ops.clean import gopher_rules
    from kgflow.ops.dedup import dupspan_counts
    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.ops.text import dsir_scores

    rules = gopher_rules(docs, min_words=min_words, min_stopwords=min_stopwords)
    kept_rules = rules.map_batches(
        lambda df: df.loc[df["pass_all"] == 1, ["doc_id", "n_words"]],
        batch_format="pandas",
    )

    spans = dupspan_counts(docs, window=window, num_buckets=num_buckets)
    kept_spans = spans.map_batches(
        lambda df: df.loc[
            df["n_dup"] * 100 < df["n_grams"] * max_dup_pct,
            ["doc_id", "n_grams", "n_dup"],
        ],
        batch_format="pandas",
    )

    scored = dsir_scores(
        docs, target_source=target_source, n_buckets=n_buckets,
        num_buckets=num_buckets,
    ).map_batches(
        lambda df: df[["doc_id", "dsir_score"]], batch_format="pandas"
    )

    # one doc-keyed co-grouped exchange instead of two hash joins:
    # tag each leg's rows into a uniform nullable frame, reduce per
    # doc, keep docs present in ALL THREE legs (inner semantics).
    # Int64 nullable carries the absent columns without float upcast.
    COLS = ["n_words", "n_grams", "n_dup"]

    def tag(df: pd.DataFrame, flag: str) -> pd.DataFrame:
        out = pd.DataFrame({"doc_id": df["doc_id"].astype("int64")})
        for c in COLS:
            out[c] = (
                df[c].astype("Int64")
                if c in df.columns
                else pd.Series([pd.NA] * len(df), dtype="Int64")
            )
        out["dsir_score"] = (
            df["dsir_score"].astype("float64")
            if "dsir_score" in df.columns
            else np.nan
        )
        out["_legs"] = np.int64(1)
        del flag
        return out

    union = (
        kept_rules.map_batches(lambda d: tag(d, "r"), batch_format="pandas")
        .union(
            kept_spans.map_batches(lambda d: tag(d, "s"), batch_format="pandas")
        )
        .union(scored.map_batches(lambda d: tag(d, "d"), batch_format="pandas"))
    )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("doc_id", as_index=False).agg(
            n_words=("n_words", "max"),
            n_grams=("n_grams", "max"),
            n_dup=("n_dup", "max"),
            dsir_score=("dsir_score", "max"),
            _legs=("_legs", "sum"),
        )
        agg = agg[agg["_legs"] == 3]
        return pd.DataFrame(
            {
                "doc_id": agg["doc_id"].astype("int64"),
                "n_words": agg["n_words"].astype("int64"),
                "n_grams": agg["n_grams"].astype("int64"),
                "n_dup": agg["n_dup"].astype("int64"),
                "dsir_score": agg["dsir_score"].astype("float64"),
            }
        )

    return bucketed_group_reduce(
        union, key_cols=["doc_id"], reduce_fn=assemble, num_buckets=num_buckets
    )
