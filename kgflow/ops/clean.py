"""Corpus-cleaning operators: PII redaction, repetition statistics,
benchmark-contamination screening — the safety/quality passes a
training-data pipeline runs between crawl and tokenizer.

All three are per-document and therefore exchange-free: compiled-regex
/ vectorized-numpy `map_batches` stages that stream. The contamination
screen's benchmark side is broadcast once via ``ray.put`` (benchmark
suites are MB-scale — tiny next to the corpus; a shuffle join on
shingles would move the CORPUS, the broadcast moves the benchmark).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

#: redaction patterns, applied in order. Kept RE2-compatible (no
#: lookaround, no backrefs) so the same pattern strings run verbatim in
#: DuckDB's regexp_replace for oracle checking.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[- ]\d{3,4}[- ]\d{4}\b", "<PHONE>"),
]


class RedactPII:
    """Actor-pool stage: regexes compiled once per actor, applied
    vectorized (`pandas.Series.str.replace` → C loop over rows with a
    compiled pattern)."""

    def __init__(self, patterns: list[tuple[str, str]] | None = None):
        import re

        self.compiled = [
            (re.compile(p), repl) for p, repl in (patterns or PII_PATTERNS)
        ]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"]
        n_hits = np.zeros(len(df), dtype=np.int64)
        for pat, repl in self.compiled:
            n_hits += text.str.count(pat).to_numpy(dtype=np.int64)
            text = text.str.replace(pat, repl, regex=True)
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "text": text, "n_redactions": n_hits}
        )


def redact_pii(docs: "rd.Dataset", concurrency=(1, 4)) -> "rd.Dataset":
    """(doc_id, text, n_redactions) with emails/IPs/phones replaced by
    typed placeholders."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        RedactPII, batch_format="pandas", concurrency=concurrency
    )


#: whitespace-run pattern shared VERBATIM with the SQL oracle. An
#: explicit ASCII class, not ``\s``: Python's ``\s`` is unicode-wide
#: (\xa0,  , …) while RE2's is ASCII-only — the explicit class is
#: the intersection both engines agree on.
WS_PATTERN = r"[ \t\n\r\f\v]+"


class NormalizeText:
    """Actor-pool stage: NFC unicode normalization + whitespace-run
    collapse + space trim. Pattern compiled once per actor; all three
    steps are vectorized `pandas.Series.str` kernels."""

    def __init__(self):
        import re

        self.ws = re.compile(WS_PATTERN)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        t = (
            df["text"]
            .str.normalize("NFC")
            .str.replace(self.ws, " ", regex=True)
            .str.strip(" ")
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "text": t,
                "n_chars": t.str.len().astype(np.int64),
            }
        )


def normalize_text(docs: "rd.Dataset", concurrency=(1, 4)) -> "rd.Dataset":
    """(doc_id, text, n_chars): canonical text form ahead of hashing /
    dedup — NFC so visually-identical composed/decomposed sequences
    fingerprint identically, whitespace collapsed so formatting
    variants do too. Exchange-free streaming stage; n_chars counts code
    points (Python len == SQL length semantics)."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        NormalizeText, batch_format="pandas", concurrency=concurrency
    )


def repetition_stats(docs: "rd.Dataset") -> "rd.Dataset":
    """Gopher-style repetition signal per document: the fraction of
    word-bigram occurrences that are duplicates
    (1 − distinct/total; 0 for docs with <2 words). Used as a
    boilerplate/spam filter threshold at corpus scale. Floor-scaled
    1e4 so the float is oracle-hash-stable."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df["text"].str.lower().str.findall(r"\w+")
        # vectorized bigram build: explode tokens once, pair each token
        # with its successor inside the same doc (C kernels throughout —
        # no Python loop over documents)
        ex = toks.explode()
        grams = pd.DataFrame(
            {
                "doc": ex.index,
                "gram": ex.astype(str) + " " + ex.groupby(level=0).shift(-1),
            }
        ).dropna(subset=["gram"])
        agg = grams.groupby("doc")["gram"].agg(total="size", distinct="nunique")
        frac = np.zeros(len(df), dtype=np.float64)
        idx = df.index.get_indexer(agg.index)
        frac[idx] = 1.0 - agg["distinct"].to_numpy() / agg["total"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "dup_bigram_frac": np.floor(frac * 1e4) / 1e4,
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


def _doc_shingles(text: str, n: int, cache: dict) -> np.ndarray:
    """Word n-gram fingerprints for contamination (empty for docs with
    <n words — no padding, unlike the dedup variant's short-doc pad)."""
    import re

    from kgflow.ops.dedup import _word_shingles

    if len(re.findall(r"\w+", text)) < n:
        return np.empty(0, dtype=np.uint64)
    return _word_shingles(text, k=n, _cache=cache)


def contamination_screen(
    docs: "rd.Dataset",
    benchmark_texts: list[str],
    n: int = 8,
    concurrency=(1, 4),
) -> "rd.Dataset":
    """(doc_id, contaminated 0/1) — flags documents sharing ANY word
    ``n``-gram with the benchmark suite (the decontamination pass run
    before training). The benchmark's shingle-hash set is broadcast
    once (``ray.put``; benchmark suites are MBs — the corpus never
    shuffles); per-doc membership is a vectorized ``np.isin`` over the
    same memoized vectorized shingle fingerprints the dedup family uses
    (`kgflow.ops.dedup._word_shingles`; 64-bit collisions are ~1e-9 at
    suite scale — documented here rather than hidden)."""
    bench_cache: dict = {}
    arrs = [_doc_shingles(t, n, bench_cache) for t in benchmark_texts]
    bench_arr = (
        np.unique(np.concatenate(arrs)) if arrs else np.empty(0, dtype=np.uint64)
    )
    ref = ray.put(bench_arr)  # np.unique output is sorted

    class Screen:
        def __init__(self):
            self.bench = ray.get(ref)
            self.cache: dict = {}  # token-hash memo shared across batches

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            flags = np.zeros(len(df), dtype=np.int64)
            for i, t in enumerate(df["text"]):
                h = _doc_shingles(t, n, self.cache)
                if len(h):
                    flags[i] = int(np.isin(h, self.bench).any())
            return pd.DataFrame({"doc_id": df["doc_id"], "contaminated": flags})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        Screen, batch_format="pandas", concurrency=concurrency
    )


def strip_hot_spans(
    docs: "rd.Dataset",
    k: int = 8,
    max_df: int = 20,
    hot_limit: int = 5_000_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Cross-document repeated-span (boilerplate) removal — the
    dedup-within-documents pass of the web-curation canon (CCNet's
    repeated-paragraph drop; Lee et al. 2021 "Deduplicating Training
    Data Makes Language Models Better" substring family, restated at
    word-k-gram granularity): any word k-gram occurring more than
    ``max_df`` times corpus-wide is boilerplate, and every token covered
    by an occurrence of a hot k-gram is dropped from its document.
    documents(doc_id, text) → (doc_id, clean_text, n_removed).

    Two passes, one exchange:

    1. count: per-batch combiner pre-aggregates k-gram occurrence counts
       (one row per distinct gram per batch), ONE gram-keyed bucketed
       sum keeps only grams with count > max_df. The hot-gram table is
       bounded by the volume of actual boilerplate — it is pulled to the
       driver behind a distributed count with a LOUD ``hot_limit`` guard
       and broadcast once via ``ray.put``.
    2. rewrite: exchange-free map — retokenize, mark positions covered
       by any hot-gram occurrence (vectorized sliding window), emit the
       uncovered tokens space-joined.

    Grams are keyed by their literal string so the SQL oracle matches
    hash-exactly; at 100 TB, fingerprint grams (uint64 FNV) in pass 1
    and resolve only the hot fingerprints' strings — same shape, ~6×
    smaller exchange rows (documented tradeoff, not a silent cap).
    """
    import re as _re

    from kgflow.ops.shuffle import bucketed_group_reduce

    word_re = _re.compile(r"\w+")

    def gram_partials(df: pd.DataFrame) -> pd.DataFrame:
        counts: dict[str, int] = {}
        for t in df["text"]:
            toks = word_re.findall(t)
            for i in range(len(toks) - k + 1):
                g = " ".join(toks[i : i + k])
                counts[g] = counts.get(g, 0) + 1
        return pd.DataFrame(
            {
                "gram": pd.Series(list(counts), dtype="object"),
                "n": pd.Series(list(counts.values()), dtype="int64"),
            }
        )

    def hot_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("gram", as_index=False)["n"].sum()
        return out[out["n"] > max_df]

    hot = bucketed_group_reduce(
        docs.select_columns(["text"]).map_batches(
            gram_partials, batch_format="pandas"
        ),
        key_cols=["gram"],
        reduce_fn=hot_reduce,
        num_buckets=num_buckets,
    ).materialize()
    n_hot = hot.count()
    if n_hot > hot_limit:
        raise ValueError(
            f"strip_hot_spans: {n_hot} hot grams exceed hot_limit="
            f"{hot_limit} — raise max_df or the limit (the hot table is "
            "broadcast and must stay driver-bounded)"
        )
    hot_ref = ray.put(frozenset(hot.to_pandas()["gram"]))

    class Strip:
        def __init__(self):
            self.hot = ray.get(hot_ref)
            self.word_re = _re.compile(r"\w+")

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            clean, removed = [], np.zeros(len(df), dtype=np.int64)
            for row_i, t in enumerate(df["text"]):
                toks = self.word_re.findall(t)
                n = len(toks)
                if n < k or not self.hot:
                    clean.append(" ".join(toks))
                    continue
                cover = np.zeros(n, dtype=bool)
                for i in range(n - k + 1):
                    if " ".join(toks[i : i + k]) in self.hot:
                        cover[i : i + k] = True
                kept = [w for w, c in zip(toks, cover) if not c]
                removed[row_i] = int(cover.sum())
                clean.append(" ".join(kept))
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"],
                    "clean_text": pd.Series(clean, dtype="object"),
                    "n_removed": removed,
                }
            )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        Strip, batch_format="pandas", concurrency=(1, 4)
    )


def winsorize(
    ds: "rd.Dataset",
    group_cols: list[str],
    col: str,
    q_lo: float = 0.125,
    q_hi: float = 0.875,
    scale: int = 100,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-group winsorization: clip ``col`` into the group's
    [q_lo, q_hi] discrete-quantile band — the standard outlier-robust
    value repair before training-feature export (cousin of
    ``mad_outliers``, which FLAGS rows; this one repairs them).

    The band edges come from `grouped_quantiles` (exact nearest-rank at
    fixed-point ``scale``; q_lo/q_hi must be binary-exact fractions —
    the 0.125/0.875 defaults are ⅛ and ⅞), so they reproduce
    bit-identically in a quantile_disc SQL oracle. The clip itself is
    pure comparison (the output double is either the raw value or a
    band edge, both exact), so the whole op is hash-exact.

    Output: every input column plus ``{col}_w``. Scale shape: one
    quantile pass (combiner-reduced histograms), band table
    group-bounded and materialized once, then a broadcast-or-shuffle
    `hash_join` attach and an exchange-free clip pass.
    """
    from kgflow.ops.joins import hash_join
    from kgflow.ops.profile import grouped_quantiles
    from kgflow.ops.shuffle import bucketed_group_reduce

    gcols = list(group_cols)
    q = grouped_quantiles(ds, gcols, col, qs=(q_lo, q_hi), scale=scale,
                          num_buckets=num_buckets)

    def widen(d: pd.DataFrame) -> pd.DataFrame:
        lo = d[d["q"] == q_lo].rename(columns={"v": "_lo"}).drop(columns=["q"])
        hi = d[d["q"] == q_hi].rename(columns={"v": "_hi"}).drop(columns=["q"])
        return lo.merge(hi, on=gcols, how="inner")

    # A group's lo and hi rows must be paired in ONE task: relying on
    # them sharing a Ray block would silently drop the group if the
    # quantile output ever re-blocks between them, so pair through a
    # keyed reduce (tiny, group-bounded). materialize so the join's
    # schema/size probes don't re-run the quantile pipeline.
    band = bucketed_group_reduce(
        q, key_cols=gcols, reduce_fn=widen, num_buckets=num_buckets
    ).materialize()

    joined = hash_join(ds, band, on=gcols, num_buckets=num_buckets)

    def clip(d: pd.DataFrame) -> pd.DataFrame:
        v = d[col].to_numpy(dtype=np.float64)
        w = np.minimum(np.maximum(v, d["_lo"].to_numpy(np.float64)),
                       d["_hi"].to_numpy(np.float64))
        return d.drop(columns=["_lo", "_hi"]).assign(**{f"{col}_w": w})

    return joined.map_batches(clip, batch_format="pandas")


def source_quality_gate(docs: "rd.Dataset", num_buckets: int | None = None) -> "rd.Dataset":
    """Domain/source-level quality gate — the Common-Crawl pattern of
    filtering by the *publisher*, not the page: keep every document
    whose source's mean token count is ≥ the corpus-wide mean
    (scale-free bar, cf. CCNet/RefinedWeb per-domain filtering).
    Returns the surviving (doc_id, source) rows.

    Exact integer semantics: mean_src ≥ mean_all ⇔
    Σ_src·n_all ≥ Σ_all·n_src — cross-multiplied in arbitrary-
    precision Python ints on the source-bounded stats table, so no
    float mean ever decides the gate and the SQL oracle (HUGEINT
    products) matches bit-for-bit.

    Scale shape: pass 1 shrinks each batch to (source, n, sum_tokens)
    combiner rows → a source-bounded exchange; the per-source table
    and the two global scalars live on the driver (domain-bounded —
    the web has ~10⁸ registered domains, trivially driver-sized next
    to 10¹² pages); the pass set broadcasts via ``ray.put`` and pass 2
    streams documents reading ONLY (doc_id, source) — text is read
    once, in pass 1.
    """
    import pyarrow as pa_
    import pyarrow.compute as pc

    from kgflow.ops.shuffle import bucketed_group_reduce

    def partial(batch: pa_.Table) -> pa_.Table:
        nt = pc.cast(
            pc.count_substring_regex(batch.column("text"), r"\w+"), pa_.int64()
        )
        df = pd.DataFrame(
            {
                "source": batch.column("source").to_pandas(),
                "nt": nt.to_pandas(),
            }
        )
        agg = df.groupby("source", as_index=False).agg(
            n=("nt", "size"), st=("nt", "sum")
        )
        return pa_.table(
            {
                "source": pa_.array(agg["source"].astype(str)),
                "n": pa_.array(agg["n"].to_numpy(dtype=np.int64)),
                "st": pa_.array(agg["st"].to_numpy(dtype=np.int64)),
            }
        )

    stats = bucketed_group_reduce(
        docs.select_columns(["source", "text"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        key_cols=["source"],
        reduce_fn=lambda g: g.groupby("source", as_index=False)[["n", "st"]].sum(),
        num_buckets=num_buckets,
    ).to_pandas()  # source-bounded pull (see docstring)

    n_all = int(stats["n"].sum())
    s_all = int(stats["st"].sum())
    passing = {
        str(r.source)
        for r in stats.itertuples()
        if int(r.st) * n_all >= s_all * int(r.n)
    }
    pass_ref = ray.put(passing)

    def keep(batch: pa_.Table) -> pa_.Table:
        ok = ray.get(pass_ref)
        src = batch.column("source").to_pandas()
        m = src.isin(ok).to_numpy()
        return pa_.table(
            {
                "doc_id": pa_.array(
                    batch.column("doc_id").to_numpy(zero_copy_only=False)[m]
                ),
                "source": pa_.array(src.to_numpy()[m].astype(str)),
            }
        )

    return docs.select_columns(["doc_id", "source"]).map_batches(
        keep, batch_format="pyarrow"
    )


#: Gopher-rule stopword list (Rae et al. 2021, table A1 "stop words"):
#: a document must contain at least 2 DISTINCT words from this set.
#: Shared verbatim with the doc_gopher_rules SQL oracle.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    docs: "rd.Dataset", min_words: int = 50, min_stopwords: int = 2
) -> "rd.Dataset":
    """Gopher-style quality-rule gate (Rae et al. 2021 "Scaling
    Language Models: ... Gopher", appendix A1.1) — the published
    heuristic filter bundle a web-corpus pipeline runs before
    training, one int64 0/1 column per rule so every rule's pass rate
    is aggregable downstream:

      r_wordcount  min_words <= word count <= 100,000
      r_meanlen    3 <= mean word length <= 10
      r_stopwords  >= min_stopwords distinct hits in GOPHER_STOPWORDS
                   (paper default 2; corpora whose extractor strips
                   function words may need 1)
      r_numeric    < 20% of words are pure digits
      r_ellipsis   < 30% of newline-split lines end with "..."
      pass_all     every rule passed

    (The bullet-point and symbol-ratio rules of the paper key on
    markup this corpus' extractor already strips; they belong in the
    HTML-side extract stage.) Exchange-free: one vectorized pandas
    `map_batches` pass, rules shared verbatim with the SQL oracle.
    Word = `\\w+` on the lowercased text, matching the repo's other
    token ops."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        toks = df["text"].str.lower().str.findall(r"\w+")
        n_words = toks.str.len().fillna(0).astype(np.int64)
        word_chars = (
            df["text"].str.replace(r"\W", "", regex=True).str.len()
        ).astype(np.int64)
        # explode once; stopword/numeric counts as C groupby kernels
        ex = toks.explode().dropna()
        stop_hits = (
            ex[ex.isin(GOPHER_STOPWORDS)]
            .groupby(level=0)
            .nunique()
            .reindex(df.index, fill_value=0)
            .astype(np.int64)
        )
        n_numeric = (
            ex.str.fullmatch(r"[0-9]+")
            .groupby(level=0)
            .sum()
            .reindex(df.index, fill_value=0)
            .astype(np.int64)
        )
        lines = df["text"].str.split("\n")
        n_lines = lines.str.len().astype(np.int64)
        lx = lines.explode()
        n_ellipsis = (
            lx.str.rstrip()
            .str.endswith("...")
            .groupby(level=0)
            .sum()
            .reindex(df.index, fill_value=0)
            .astype(np.int64)
        )

        r_wordcount = ((n_words >= min_words) & (n_words <= 100_000)).astype(
            np.int64
        )
        # 3 <= word_chars/n_words <= 10, cross-multiplied: integer-exact
        r_meanlen = (
            (word_chars >= 3 * n_words) & (word_chars <= 10 * n_words)
        ).astype(np.int64)
        r_stopwords = (stop_hits >= min_stopwords).astype(np.int64)
        r_numeric = (n_numeric * 5 < n_words).astype(np.int64)  # <20%, exact
        r_ellipsis = (n_ellipsis * 10 < n_lines * 3).astype(np.int64)  # <30%
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_words": n_words,
                "r_wordcount": r_wordcount,
                "r_meanlen": r_meanlen,
                "r_stopwords": r_stopwords,
                "r_numeric": r_numeric,
                "r_ellipsis": r_ellipsis,
                "pass_all": r_wordcount
                * r_meanlen
                * r_stopwords
                * r_numeric
                * r_ellipsis,
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


def line_dedup(
    docs: "rd.Dataset",
    min_chars: int = 10,
    max_count: int = 1,
    num_buckets: int | None = None,
    broadcast_limit: int = 2_000_000,
    strategy: str = "auto",
) -> "rd.Dataset":
    """CCNet-style corpus-level LINE deduplication (Wenzek et al. 2020,
    CCNet; the pass that strips crawl boilerplate — nav bars, cookie
    banners, footers — before model training): drop EVERY occurrence of
    a line whose corpus-wide occurrence count exceeds ``max_count``;
    lines shorter than ``min_chars`` characters never participate
    (structural / empty lines are kept, so paragraph breaks survive).
    Returns (doc_id, text_clean, n_lines, n_dropped) with the kept
    lines rejoined by \\n in original order — a doc whose every line
    drops comes back with text_clean = ''.

    Scale shape, ``strategy="auto"``: line counts ride ONE md5-digest
    exchange (32-char fingerprints, never text — the ``exact_dedup``
    trick, digests computed once per batch-DISTINCT line); duplicated
    lines are then, in the common case, a bounded boilerplate set, so
    their digests broadcast via ``ray.put`` and the rebuild is a single
    exchange-FREE map pass (split → membership → rejoin per batch).
    When the dup set exceeds ``broadcast_limit`` the op falls back to
    the shuffle path (``strategy="shuffle"``): the exploded corpus
    materializes once and moves through TWO text-bearing exchanges —
    fp-keyed in-bucket counting, then doc-keyed reassembly.
    """
    import hashlib

    from kgflow.ops.shuffle import bucketed_group_reduce

    def _split(texts: pd.Series) -> pd.Series:
        return texts.str.split("\n")

    def _digests(lines: pd.Series) -> pd.Series:
        uniq = pd.Series(lines.unique())
        fps = pd.Series(
            [hashlib.md5(t.encode("utf-8")).hexdigest() for t in uniq],
            index=uniq,
        )
        return lines.map(fps)

    if strategy not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"line_dedup: unknown strategy {strategy!r}")

    if strategy in ("auto", "broadcast"):

        def count_partial(df: pd.DataFrame) -> pd.DataFrame:
            lx = _split(df["text"]).explode()
            lx = lx[lx.str.len() >= min_chars]
            if not len(lx):
                return pd.DataFrame(
                    {"fp": pd.Series([], dtype=object),
                     "c": pd.Series([], dtype="int64")}
                )
            g = lx.value_counts()
            return pd.DataFrame(
                {"fp": _digests(pd.Series(g.index)).to_numpy(),
                 "c": g.to_numpy(dtype=np.int64)}
            )

        counts = bucketed_group_reduce(
            docs.select_columns(["text"]).map_batches(
                count_partial, batch_format="pandas"
            ),
            key_cols=["fp"],
            reduce_fn=lambda g: g.groupby("fp", as_index=False)["c"].sum(),
            num_buckets=num_buckets,
        )
        dups = counts.map_batches(
            lambda d: d.loc[d["c"] > max_count, ["fp"]],
            batch_format="pandas",
        ).materialize()
        n_dup = dups.count()
        if n_dup <= broadcast_limit:
            dup_arr = (
                np.sort(dups.to_pandas()["fp"].to_numpy(dtype=object))
                if n_dup
                else np.array([], dtype=object)
            )
            dref = ray.put(dup_arr)

            def rebuild(df: pd.DataFrame, _d=dref) -> pd.DataFrame:
                dup_fps = ray.get(_d)
                ls = _split(df["text"])
                lx = ls.explode()
                eligible = lx.str.len() >= min_chars
                fps = _digests(lx[eligible])
                dropped = pd.Series(False, index=lx.index)
                dropped[eligible] = np.isin(
                    fps.to_numpy(dtype=object), dup_fps
                )
                keep = lx[~dropped]
                clean = keep.groupby(level=0).agg("\n".join)
                out = pd.DataFrame(
                    {
                        "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                        "text_clean": clean.reindex(df.index).fillna(""),
                        "n_lines": ls.str.len().to_numpy(dtype=np.int64),
                        "n_dropped": dropped.groupby(level=0)
                        .sum()
                        .reindex(df.index)
                        .fillna(0)
                        .to_numpy(dtype=np.int64),
                    }
                )
                return out

            return docs.select_columns(["doc_id", "text"]).map_batches(
                rebuild, batch_format="pandas"
            )
        if strategy == "broadcast":
            raise ValueError(
                f"line_dedup: {n_dup} duplicated lines exceed "
                f"broadcast_limit={broadcast_limit}; use strategy="
                f"'shuffle' (or 'auto')"
            )

    # shuffle path: explode once, count in-bucket, reassemble by doc
    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ls = _split(df["text"])
        lx = ls.explode()
        pos = lx.groupby(level=0).cumcount().to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].reindex(lx.index).to_numpy(
                    dtype=np.int64
                ),
                "pos": pos,
                "line": lx.to_numpy(dtype=object),
            }
        )

    lines = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(explode, batch_format="pandas")
        .materialize()  # consumed by both branches below
    )
    eligible = lines.map_batches(
        lambda d: d.loc[d["line"].str.len() >= min_chars].assign(
            fp=lambda x: _digests(x["line"]).to_numpy(dtype=object)
        ),
        batch_format="pandas",
    )

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        n = g.groupby("fp")["doc_id"].transform("size")
        out = g.loc[n <= max_count, ["doc_id", "pos", "line"]].copy()
        dropped = g.loc[n > max_count, ["doc_id", "pos"]].copy()
        dropped["line"] = None  # tombstone rows keep the drop count
        return pd.concat([out, dropped], ignore_index=True)

    marked = bucketed_group_reduce(
        eligible, key_cols=["fp"], reduce_fn=mark, num_buckets=num_buckets
    )
    ineligible = lines.map_batches(
        lambda d: d.loc[d["line"].str.len() < min_chars],
        batch_format="pandas",
    )

    def rebuild_doc(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for doc_id, d in g.groupby("doc_id", sort=False):
            d = d.sort_values("pos", kind="mergesort")
            kept = d["line"].notna()
            outs.append(
                (
                    int(doc_id),
                    "\n".join(d.loc[kept, "line"]),
                    len(d),
                    int((~kept).sum()),
                )
            )
        return pd.DataFrame(
            outs, columns=["doc_id", "text_clean", "n_lines", "n_dropped"]
        ).astype(
            {"doc_id": "int64", "n_lines": "int64", "n_dropped": "int64"}
        )

    return bucketed_group_reduce(
        marked.union(ineligible),
        key_cols=["doc_id"],
        reduce_fn=rebuild_doc,
        num_buckets=num_buckets,
    )
