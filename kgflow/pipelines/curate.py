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
documented exchanges); the composition is two doc-keyed hash joins
over V-bounded per-doc stat rows — never text.
"""

from __future__ import annotations

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
    from kgflow.ops.joins import hash_join
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

    out = hash_join(kept_rules, kept_spans, on="doc_id", num_buckets=num_buckets)
    return hash_join(out, scored, on="doc_id", num_buckets=num_buckets)
