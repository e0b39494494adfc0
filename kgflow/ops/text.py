"""Text-analysis operators over a document table (doc_id, text, lang, …).

Large-scale training-data-pipeline ops (mandated beyond the reference's
own operators): exact dedup, token counting, quality scoring, content
fingerprinting, heuristic language ID. All are single-pass vectorized
``map_batches`` ops (pyarrow.compute / pandas kernels, compiled regexes)
plus at most one combiner-reduced groupby; none materializes the corpus.

Each op has a ``queries()`` entry; the SQL-expressible ones also have a
DuckDB oracle (``__ray_entry__.oracle_sql``) with matching column names.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_WORD_RE = r"\w+"
_PUNCT_RE = r"[.!?,;:]"


def exact_dedup(docs: "rd.Dataset", output: str = "fp") -> "rd.Dataset":
    """Distinct texts with first doc_id + multiplicity.

    Hash-partition + per-group first (SURVEY.md §2.8): per-batch
    combiner (one row per distinct text per batch) then one groupby
    shuffle.

    ``output="fp"`` (scale default, round-2): the combiner replaces each
    distinct text with its md5 digest, so the shuffle ships 32-char
    fingerprints instead of full document bytes — at web scale the
    exchange shrinks by the mean document length / 32. Grouping by md5
    is exact for all practical purposes (2^-64 birthday bound at 10^12
    docs). Output: fp, first_doc_id, n.

    ``output="text"`` keeps the full text as key AND payload (the
    round-1 layout) for consumers that need the surviving text inline.
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    if output == "fp":

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("text", as_index=False).agg(
                first_doc_id=("doc_id", "min"), n=("doc_id", "size")
            )
            g["fp"] = [
                hashlib.md5(t.encode("utf-8")).hexdigest() for t in g["text"]
            ]
            return g[["fp", "first_doc_id", "n"]]

        def final(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("fp", as_index=False).agg(
                first_doc_id=("first_doc_id", "min"), n=("n", "sum")
            )

        key = ["fp"]
    else:

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("text", as_index=False).agg(
                first_doc_id=("doc_id", "min"), n=("doc_id", "size")
            )

        def final(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("text", as_index=False).agg(
                first_doc_id=("first_doc_id", "min"), n=("n", "sum")
            )

        key = ["text"]

    return bucketed_group_reduce(
        docs.select_columns(["doc_id", "text"]).map_batches(
            partial, batch_format="pandas"
        ),
        key_cols=key,
        reduce_fn=final,
    )


def token_counts(docs: "rd.Dataset") -> "rd.Dataset":
    """doc_id, n_tokens (regex \\w+ word count — vectorized Arrow kernel)."""

    def f(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"), _WORD_RE)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_tokens": pc.cast(n, pa.int64())}
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def quality_scores(docs: "rd.Dataset") -> "rd.Dataset":
    """Per-doc quality signals: doc_id, n_chars_c, n_tokens, n_punct,
    mean_token_len (all vectorized; SQL-expressible for the oracle)."""

    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tok = pc.cast(pc.count_substring_regex(text, _WORD_RE), pa.int64())
        n_punct = pc.cast(pc.count_substring_regex(text, _PUNCT_RE), pa.int64())
        # mean token length = total word chars / word count
        word_chars = pc.cast(
            pc.utf8_length(pc.replace_substring_regex(text, r"\W", "")), pa.int64()
        )
        mean_len = pc.divide(
            pc.cast(word_chars, pa.float64()),
            pc.cast(pc.max_element_wise(n_tok, 1), pa.float64()),
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars_c": n_chars,
                "n_tokens": n_tok,
                "n_punct": n_punct,
                "mean_token_len": mean_len,
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def vocab_topk(docs: "rd.Dataset", k: int = 100, num_buckets: int | None = None) -> "rd.Dataset":
    """Corpus-wide token vocabulary, top-``k`` by frequency — the
    vocabulary/BPE-seed pass of a training-data pipeline. Returns
    (token, n) ordered by n DESC, token ASC.

    Scale shape: a per-batch combiner (pandas explode + value_counts,
    both C kernels) shrinks each block to its distinct tokens BEFORE the
    exchange, the token-keyed bucketed reduce sums partials and emits
    only its bucket's top-k (a bucket's top-k is a superset of its
    contribution to the global top-k), so the final global sort touches
    ≤ num_buckets × k rows — never the vocabulary. The full-vocab
    variant (no head) would be the same pipeline minus the .head/.limit.
    """
    import pandas as pd_

    def partial(df: pd_.DataFrame) -> pd_.DataFrame:
        toks = df["text"].str.lower().str.findall(r"\w+").explode().dropna()
        vc = toks.value_counts()
        return pd_.DataFrame(
            {
                "token": vc.index.astype(str),
                "n": vc.to_numpy(dtype="int64"),
            }
        )

    def bucket_topk(g: pd_.DataFrame) -> pd_.DataFrame:
        agg = g.groupby("token", as_index=False)["n"].sum()
        return agg.sort_values(
            ["n", "token"], ascending=[False, True], kind="mergesort"
        ).head(k)

    from kgflow.ops.shuffle import bucketed_group_reduce

    reduced = bucketed_group_reduce(
        docs.select_columns(["text"]).map_batches(partial, batch_format="pandas"),
        key_cols=["token"],
        reduce_fn=bucket_topk,
        num_buckets=num_buckets,
    )
    top = reduced.sort(["n", "token"], descending=[True, False]).limit(k)
    return top


def doc_term_freqs(docs: "rd.Dataset") -> "rd.Dataset":
    """(doc_id, token, tf) — exact per-document term frequencies. A
    document is ONE row, so the per-batch groupby is globally exact with
    zero exchanges (same lower + ``\\w+`` tokenization as `vocab_topk`)."""
    import pandas as pd_

    def per_doc(df: pd_.DataFrame) -> pd_.DataFrame:
        toks = df.set_index("doc_id")["text"].str.lower().str.findall(r"\w+").explode().dropna()
        out = (
            toks.rename("token")
            .reset_index()
            .groupby(["doc_id", "token"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "tf"})
        )
        out["tf"] = out["tf"].astype("int64")
        return out

    return docs.select_columns(["doc_id", "text"]).map_batches(
        per_doc, batch_format="pandas"
    )


def top_terms(
    docs: "rd.Dataset", k: int = 3, num_buckets: int | None = None
) -> "rd.Dataset":
    """Per-document top-``k`` DISTINCTIVE terms: ranked by
    (tf DESC, df ASC, token ASC) — frequency first, corpus rarity as
    the discriminator. The rank keys are all integers/strings, so the
    result is hash-exact across engines (the float-scored TF-IDF
    variant is `tfidf_terms`, pytest-gated — float products rank
    differently across libm implementations in the last ulp).

    Scale shape: tf is exchange-free (`doc_term_freqs`) and is
    consumed by two branches (df reduce, join left side) — it RECOMPUTES
    rather than materializes, since the exploded (doc, token) corpus is
    larger than the input text and tokenization is a cheap streaming
    kernel; document
    frequency reduces the tf rows per-batch to (token, partial-df)
    before ONE token-keyed bucketed sum (vocab-bounded output); the
    df attach reuses `kgflow.ops.joins.hash_join` (auto broadcast vs
    co-partitioned shuffle — web-scale vocabularies exceed broadcast);
    the final per-doc top-k is `kgflow.ops.shuffle.grouped_topk`
    (local-topk combiner, one doc-keyed exchange)."""
    import pandas as pd_

    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce, grouped_topk

    tf = doc_term_freqs(docs)

    def df_partial(d: pd_.DataFrame) -> pd_.DataFrame:
        vc = d["token"].value_counts()
        return pd_.DataFrame(
            {"token": vc.index.astype(str), "df": vc.to_numpy(dtype="int64")}
        )

    def df_sum(g: pd_.DataFrame) -> pd_.DataFrame:
        out = g.groupby("token", as_index=False)["df"].sum()
        out["df"] = out["df"].astype("int64")
        return out

    # vocab-bounded: materialize so hash_join's broadcast decision count
    # is metadata-free and the winning path reuses the blocks (otherwise
    # the df reduce pipeline executes twice)
    dfreq = bucketed_group_reduce(
        tf.map_batches(df_partial, batch_format="pandas"),
        key_cols=["token"],
        reduce_fn=df_sum,
        num_buckets=num_buckets,
    ).materialize()

    joined = hash_join(tf, dfreq, on="token", num_buckets=num_buckets)
    return grouped_topk(
        joined,
        group_cols=["doc_id"],
        sort_cols=["tf", "df", "token"],
        ascending=[False, True, True],
        k=k,
        num_buckets=num_buckets,
    )


def tfidf_terms(
    docs: "rd.Dataset",
    n_docs: int,
    k: int = 3,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Per-document top-``k`` terms by true TF-IDF
    (tf · ln(n_docs / df); token ASC tiebreak). Same distributed shape
    as `top_terms` plus a vectorized score column; gated by pytest
    rather than a SQL oracle because float score ordering is
    libm-sensitive at the last ulp."""
    import numpy as np_
    import pandas as pd_

    from kgflow.ops.shuffle import grouped_topk

    # reuse top_terms' tf/df machinery up to the join by recomputing the
    # same frames (the join result is what we score)
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce

    tf = doc_term_freqs(docs)

    def df_partial(d: pd_.DataFrame) -> pd_.DataFrame:
        vc = d["token"].value_counts()
        return pd_.DataFrame(
            {"token": vc.index.astype(str), "df": vc.to_numpy(dtype="int64")}
        )

    dfreq = bucketed_group_reduce(
        tf.map_batches(df_partial, batch_format="pandas"),
        key_cols=["token"],
        reduce_fn=lambda g: g.groupby("token", as_index=False)["df"].sum(),
        num_buckets=num_buckets,
    ).materialize()  # vocab-bounded; see top_terms
    joined = hash_join(tf, dfreq, on="token", num_buckets=num_buckets)

    def score(d: pd_.DataFrame) -> pd_.DataFrame:
        d = d.copy()
        d["tfidf"] = d["tf"].to_numpy(dtype=np_.float64) * np_.log(
            float(n_docs) / d["df"].to_numpy(dtype=np_.float64)
        )
        return d

    scored = joined.map_batches(score, batch_format="pandas")
    return grouped_topk(
        scored,
        group_cols=["doc_id"],
        sort_cols=["tfidf", "token"],
        ascending=[False, True],
        k=k,
        num_buckets=num_buckets,
    )


def fingerprints(docs: "rd.Dataset") -> "rd.Dataset":
    """doc_id, fp — md5 content fingerprint (matches DuckDB md5())."""

    def f(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fp": pa.array(fps, pa.string())}
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def hash_split(
    docs: "rd.Dataset", boundaries: tuple[str, str] = ("cc", "e6")
) -> "rd.Dataset":
    """Deterministic train/val/test assignment by content hash:
    (doc_id, split) with split decided by the first md5(text) hex byte
    — < boundaries[0] → train, < boundaries[1] → val, else test
    (defaults 0xcc/0xe6 ≈ 80/10/10). Content-hash splitting is the
    standard leak-proof split for web corpora: duplicated documents
    land in the SAME split on every run, machine and engine, with no
    shuffle and no stored assignment table."""

    def f(batch: pa.Table) -> pa.Table:
        # Explicit string dtype: an empty batch would otherwise default to
        # float64 and the `< boundaries[0]` comparison raises UFuncTypeError.
        h2 = np.array(
            [
                hashlib.md5(t.encode("utf-8")).hexdigest()[:2]
                for t in batch.column("text").to_pylist()
            ],
            dtype="<U2",
        )
        split = np.where(
            h2 < boundaries[0], "train", np.where(h2 < boundaries[1], "val", "test")
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "split": pa.array(split.tolist(), pa.string()),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def grouped_sample(
    docs: "rd.Dataset",
    group_col: str = "lang",
    n_per_group: int = 20,
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Deterministic stratified sample: the ``n_per_group`` rows of
    each group with the smallest md5(id) rank → (group, id, rank 1..n).
    The training-data class-balancing pass: reproducible across runs,
    engines and partitionings (the rank is a pure content function, no
    RNG state), and leak-aware when combined with ``hash_split``.

    Combiner: each block keeps only its local per-group top-n BEFORE
    the exchange, so the group-keyed shuffle carries ≤ blocks×groups×n
    rows; the in-bucket reduce re-ranks the survivors."""
    import hashlib as _hashlib

    from kgflow.ops.shuffle import bucketed_group_reduce

    def rank_key(df: pd.DataFrame) -> pd.DataFrame:
        h = [
            _hashlib.md5(str(int(v)).encode()).hexdigest()
            for v in df[id_col].to_numpy()
        ]
        return pd.DataFrame(
            {
                group_col: df[group_col],
                id_col: df[id_col].astype("int64"),
                "_h": h,
            }
        )

    def local_topn(df: pd.DataFrame) -> pd.DataFrame:
        df = rank_key(df)
        return df.sort_values([group_col, "_h"], kind="mergesort").groupby(
            group_col, sort=False
        ).head(n_per_group)

    def final_topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, "_h"], kind="mergesort")
        top = g.groupby(group_col, sort=False).head(n_per_group).copy()
        top["rank"] = top.groupby(group_col, sort=False).cumcount() + 1
        return top[[group_col, id_col, "rank"]].astype({"rank": "int64"})

    return bucketed_group_reduce(
        docs.select_columns([group_col, id_col]).map_batches(
            local_topn, batch_format="pandas"
        ),
        key_cols=[group_col],
        reduce_fn=final_topn,
        num_buckets=num_buckets,
    )


class LangIdStage:
    """Heuristic language ID: stopword-profile scoring (en/de/fr/es),
    non-Latin scripts detected by codepoint class. Stateful stage: the
    profiles and regexes are compiled once per actor."""

    PROFILES = {
        "en": {"the", "and", "of", "to", "a", "in", "is", "was", "for", "with"},
        "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "von", "zu", "den"},
        "fr": {"le", "la", "les", "et", "est", "pas", "pour", "dans", "une", "que"},
        "es": {"el", "la", "los", "y", "es", "no", "por", "para", "una", "con"},
    }

    def __init__(self):
        self.word = re.compile(r"[a-zA-Z]+")
        self.cjk = re.compile(r"[一-鿿]")

    def detect(self, text: str) -> str:
        if self.cjk.search(text):
            return "zh"
        toks = [w.lower() for w in self.word.findall(text)]
        if not toks:
            return "und"
        best_lang, best = "und", 0.0
        for lang, stops in self.PROFILES.items():
            score = sum(1 for t in toks if t in stops) / len(toks)
            if score > best:
                best_lang, best = lang, score
        return best_lang if best > 0.0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        langs = [self.detect(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("lang_pred", pa.array(langs, pa.string()))


def lang_id(docs: "rd.Dataset", concurrency=(1, 4)) -> "rd.Dataset":
    return docs.select_columns(["doc_id", "text"]).map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=concurrency
    )


def rolling_fingerprint(docs: "rd.Dataset", window: int = 16) -> "rd.Dataset":
    """doc_id, rfp — 64-bit rolling (Rabin-Karp style) document
    fingerprint: min of window-hashes over the token stream. Oracle:
    restated exactly in SQL (HUGEINT modular FNV + list_slice window
    polynomials, `__ray_entry__.py` doc_rolling_fp) — keep the two in
    lockstep when changing the hash or window logic."""
    B = np.uint64(1099511628211)

    def f(batch: pa.Table) -> pa.Table:
        # token hashes repeat heavily within a batch — memoize per batch
        cache: dict = {}
        out = np.zeros(batch.num_rows, dtype=np.uint64)
        for i, t in enumerate(batch.column("text").to_pylist()):
            toks = re.findall(_WORD_RE, t)
            if not toks:
                continue
            hs = np.fromiter(
                (cache.setdefault(w, hash_token(w)) for w in toks),
                dtype=np.uint64,
                count=len(toks),
            )
            with np.errstate(over="ignore"):  # wrapping uint64 by design
                if len(hs) < window:
                    acc = np.uint64(0)
                    for h in hs:
                        acc = acc * B + h
                    out[i] = acc
                else:
                    # rolling windows via cumulative powers
                    acc = np.zeros(len(hs) - window + 1, dtype=np.uint64)
                    for w in range(window):
                        acc = acc * B + hs[w : w + len(acc)]
                    out[i] = acc.min()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "rfp": pa.array(out.astype(np.int64) & np.int64(0x7FFFFFFFFFFFFFFF)),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(f, batch_format="pyarrow")


def hash_token(w: str) -> int:
    h = 0xCBF29CE484222325
    for b in w.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def corpus_freq_score(
    docs: "rd.Dataset",
    num_buckets: int | None = None,
    broadcast_limit: int = 2_000_000,
) -> "rd.Dataset":
    """Per-document corpus-frequency score — the CCNet/RefinedWeb
    "score each document by a statistic trained on the corpus itself"
    pattern (there a KenLM perplexity; here an exactly-checkable unigram
    statistic: everything stays integer, so the oracle is hash-exact
    where a log-prob would drift in the last float ulp). Returns
    (doc_id, n_tokens, freq_sum) where ``freq_sum`` sums, over every
    token INSTANCE in the document, the corpus-wide count of that
    token; freq_sum/n_tokens is the mean-frequency quality signal
    (high = stopword soup, low = rare-token noise — both filter tails).
    Token-less documents drop (inner join semantics, mirrored in SQL).

    Scale shape (two passes over the exploded tokens, zero passes over
    raw text beyond tokenization): corpus counts reduce per-batch to
    (token, partial) before ONE token-keyed bucketed sum (vocab-bounded,
    materialized so the join decision is metadata-free); the attach
    reuses `kgflow.ops.joins.hash_join` (auto broadcast vs
    co-partitioned shuffle); the per-doc aggregate is a combiner + one
    doc-keyed exchange of 3-int rows."""
    import pandas as pd_

    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce

    tf = doc_term_freqs(docs)

    def cf_partial(d: pd_.DataFrame) -> pd_.DataFrame:
        g = d.groupby("token", as_index=False)["tf"].sum()
        return g.rename(columns={"tf": "cf"})

    def cf_sum(g: pd_.DataFrame) -> pd_.DataFrame:
        out = g.groupby("token", as_index=False)["cf"].sum()
        out["cf"] = out["cf"].astype("int64")
        return out

    cfreq = bucketed_group_reduce(
        tf.map_batches(cf_partial, batch_format="pandas"),
        key_cols=["token"],
        reduce_fn=cf_sum,
        num_buckets=num_buckets,
    ).materialize()

    # fast path: a broadcastable vocabulary makes the scoring pass
    # exchange-free — ship the count table once, re-tokenize each doc
    # (cheap streaming kernel; re-exploding through a join shuffled the
    # 500×-larger token rows and measured 22 s vs 9.5 s at sf0.1). The
    # join path remains for web-scale vocabularies and is parity-tested
    # against this one with a forced-zero threshold.
    if cfreq.count() <= broadcast_limit:
        import ray

        ref = ray.put(cfreq.to_pandas().set_index("token")["cf"])

        class Score:
            def __init__(self):
                self.cf = ray.get(ref)

            def __call__(self, df: pd_.DataFrame) -> pd_.DataFrame:
                toks = (
                    df.set_index("doc_id")["text"]
                    .str.lower()
                    .str.findall(r"\w+")
                    .explode()
                    .dropna()
                )
                fs = toks.map(self.cf).astype("int64")
                g = (
                    pd_.DataFrame({"doc_id": toks.index, "fs": fs.to_numpy()})
                    .groupby("doc_id", as_index=False)
                    .agg(n_tokens=("fs", "size"), freq_sum=("fs", "sum"))
                )
                g["n_tokens"] = g["n_tokens"].astype(np.int64)
                g["freq_sum"] = g["freq_sum"].astype(np.int64)
                return g

        return docs.select_columns(["doc_id", "text"]).map_batches(
            Score, batch_format="pandas", concurrency=(1, 4)
        )

    joined = hash_join(tf, cfreq, on="token", num_buckets=num_buckets)

    def doc_partial(d: pd_.DataFrame) -> pd_.DataFrame:
        fs = d["tf"].to_numpy(dtype=np.int64) * d["cf"].to_numpy(dtype=np.int64)
        g = d.assign(fs=fs).groupby("doc_id", as_index=False).agg(
            n_tokens=("tf", "sum"), freq_sum=("fs", "sum")
        )
        return g

    def doc_final(g: pd_.DataFrame) -> pd_.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            n_tokens=("n_tokens", "sum"), freq_sum=("freq_sum", "sum")
        )
        out["n_tokens"] = out["n_tokens"].astype(np.int64)
        out["freq_sum"] = out["freq_sum"].astype(np.int64)
        return out

    return bucketed_group_reduce(
        joined.map_batches(doc_partial, batch_format="pandas"),
        key_cols=["doc_id"],
        reduce_fn=doc_final,
        num_buckets=num_buckets,
    )


def collocations(
    docs: "rd.Dataset",
    min_count: int = 5,
    k: int = 50,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Top-``k`` adjacent-token bigram collocations ranked by the PMI
    *ratio* P(ab)/(P(a)P(b)) = c_ab·N / (c_a·c_b) — the standard
    corpus-linguistics collocation extractor (log-PMI is monotone in
    this ratio, so the ranking is identical while the score stays a
    RATIONAL number: an int64 product cast to double divided by an
    int64 product cast to double is correctly rounded identically in
    every IEEE engine, which makes the output hash-exact against the
    SQL oracle with no libm dependence).

    Output: (a, b, c_ab, ratio), ratio DESC / a / b order, c_ab ≥
    ``min_count``.

    Scale shape: bigram and unigram counts are combiner-reduced before
    their (pair- resp. vocab-keyed) exchanges; the unigram table is
    vocab-bounded and materialized once (reused by two joins + the
    total); the two count-attach joins go through `hash_join`'s auto
    broadcast-vs-shuffle; the final global top-k is a `grouped_topk`
    with a constant key, so only ≤ blocks×k local survivors reach the
    single reduce bucket. Nothing heavier than count rows rides any
    exchange.
    """
    import pandas as pd_

    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce, global_topk

    toks = docs.select_columns(["text"])

    def bigram_partial(d: pd_.DataFrame) -> pd_.DataFrame:
        ls = d["text"].str.lower().str.findall(_WORD_RE)
        a = ls.map(lambda l: l[:-1]).explode().dropna()
        b = ls.map(lambda l: l[1:]).explode().dropna()
        vc = (
            pd_.DataFrame({"a": a.to_numpy(), "b": b.to_numpy()})
            .groupby(["a", "b"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "c_ab"})
        )
        vc["c_ab"] = vc["c_ab"].astype("int64")
        return vc

    def bigram_sum(g: pd_.DataFrame) -> pd_.DataFrame:
        out = g.groupby(["a", "b"], as_index=False, sort=False)["c_ab"].sum()
        out = out[out["c_ab"] >= min_count].copy()
        out["c_ab"] = out["c_ab"].astype("int64")
        return out

    pairs = bucketed_group_reduce(
        toks.map_batches(bigram_partial, batch_format="pandas"),
        key_cols=["a", "b"],
        reduce_fn=bigram_sum,
        num_buckets=num_buckets,
    )

    def uni_partial(d: pd_.DataFrame) -> pd_.DataFrame:
        t = d["text"].str.lower().str.findall(_WORD_RE).explode().dropna()
        vc = t.value_counts()
        return pd_.DataFrame(
            {"token": vc.index.astype(str), "c": vc.to_numpy(dtype="int64")}
        )

    def uni_sum(g: pd_.DataFrame) -> pd_.DataFrame:
        out = g.groupby("token", as_index=False, sort=False)["c"].sum()
        out["c"] = out["c"].astype("int64")
        return out

    # vocab-bounded: reused by two joins and the N-total aggregate
    uni = bucketed_group_reduce(
        toks.map_batches(uni_partial, batch_format="pandas"),
        key_cols=["token"],
        reduce_fn=uni_sum,
        num_buckets=num_buckets,
    ).materialize()
    n_total = int(uni.sum("c"))

    ua = uni.map_batches(
        lambda d: d.rename(columns={"token": "a", "c": "c_a"}),
        batch_format="pandas",
    )
    ub = uni.map_batches(
        lambda d: d.rename(columns={"token": "b", "c": "c_b"}),
        batch_format="pandas",
    )
    joined = hash_join(
        hash_join(pairs, ua, on="a", num_buckets=num_buckets),
        ub,
        on="b",
        num_buckets=num_buckets,
    )

    def score(d: pd_.DataFrame) -> pd_.DataFrame:
        c_ab = d["c_ab"].to_numpy(dtype=np.int64)
        c_a = d["c_a"].to_numpy(dtype=np.int64)
        c_b = d["c_b"].to_numpy(dtype=np.int64)
        # exact int64 products cast to double — identical to the SQL
        # oracle's BIGINT arithmetic; fail loudly on overflow instead
        # of silently wrapping (same guard pattern as jaccard_pairs)
        if len(c_ab) and (
            c_ab.max() > (2**63 - 1) // max(n_total, 1)
            or (c_a.astype(np.float64) * c_b.astype(np.float64)).max() > 2**62
        ):
            raise ValueError(
                "collocations: count product exceeds int64 — rescale counts"
            )
        num = c_ab * np.int64(n_total)
        den = c_a * c_b
        ratio = num.astype(np.float64) / den.astype(np.float64)
        return d.assign(ratio=ratio)[["a", "b", "c_ab", "ratio"]]

    scored = joined.map_batches(score, batch_format="pandas")
    return global_topk(
        scored,
        sort_cols=["ratio", "a", "b"],
        ascending=[False, True, True],
        k=k,
        num_buckets=num_buckets,
    )


def bm25_topk(
    docs: "rd.Dataset",
    terms: tuple[str, ...],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Top-``k`` documents by BM25 against a fixed ``terms`` query,
    using the LOG-FREE idf variant idf(t) = (N − df + 0.5)/(df + 0.5)
    (monotone in the standard Robertson–Sparck-Jones idf, so the doc
    ranking for a single-term query is identical; chosen because every
    remaining operation is IEEE +,−,×,÷ — each correctly rounded — so
    the engine and the SQL oracle produce BIT-IDENTICAL doubles when
    they sequence the operations identically, with no libm log() in
    the path).

    score(d) = Σ_t idf(t) · (tf·(k1+1)) / (tf + k1·(0.25 + 0.75·dl/avgdl))
    summed in fixed ``terms`` order (left-associated, mirrored by the
    oracle — float addition is not associative). Docs with score 0 are
    dropped. Output: (doc_id, score), score DESC / doc_id order.

    Scale shape: ONE exchange-free tokenize pass emits a fixed-width
    per-doc stats row (dl + one tf column per query term); the corpus
    scalars (N, avgdl, per-term df) come from a constant-size partial
    → single-bucket reduce (the only driver pull is that one row); the
    scoring pass recomputes the stats stream (cheaper than
    materializing a per-doc table at corpus scale — same recompute
    rationale as `top_terms`) and the global top-k ships ≤ blocks×k
    survivor rows.
    """
    import pandas as pd_

    from kgflow.ops.shuffle import global_topk

    terms = tuple(terms)
    tf_cols = [f"tf{i}" for i in range(len(terms))]

    def stats(d: pd_.DataFrame) -> pd_.DataFrame:
        d = d.reset_index(drop=True)  # positional np.add.at below
        ls = d["text"].str.lower().str.findall(_WORD_RE)
        out = pd_.DataFrame({"doc_id": d["doc_id"].to_numpy()})
        out["dl"] = ls.map(len).to_numpy(dtype=np.int64)
        toks = ls.explode().dropna()
        idx = toks.index.to_numpy()
        tok = toks.to_numpy()
        for i, t in enumerate(terms):
            cnt = np.zeros(len(d), dtype=np.int64)
            np.add.at(cnt, idx[tok == t], 1)
            out[tf_cols[i]] = cnt
        return out

    stats_ds = docs.select_columns(["doc_id", "text"]).map_batches(
        stats, batch_format="pandas"
    )

    def scalar_partial(d: pd_.DataFrame) -> pd_.DataFrame:
        row = {"n_docs": np.int64(len(d)), "sum_dl": d["dl"].sum()}
        for c in tf_cols:
            row[f"df_{c}"] = np.int64((d[c].to_numpy() > 0).sum())
        return pd_.DataFrame([row])

    parts = stats_ds.map_batches(scalar_partial, batch_format="pandas")
    tot = parts.to_pandas().sum()  # ≤ one row per block — tiny
    n_docs = int(tot["n_docs"])
    avgdl = float(int(tot["sum_dl"])) / float(n_docs)
    dfs = [int(tot[f"df_{c}"]) for c in tf_cols]

    def score(d: pd_.DataFrame) -> pd_.DataFrame:
        dl = d["dl"].to_numpy(dtype=np.float64)
        denom_norm = k1 * (0.25 + 0.75 * (dl / avgdl))
        s = np.zeros(len(d), dtype=np.float64)
        # fixed left-associated term order — mirrored by the oracle
        for c, df_t in zip(tf_cols, dfs):
            tf = d[c].to_numpy(dtype=np.float64)
            idf = (float(n_docs - df_t) + 0.5) / (float(df_t) + 0.5)
            s = s + idf * (tf * (k1 + 1.0)) / (tf + denom_norm)
        out = pd_.DataFrame({"doc_id": d["doc_id"].to_numpy(), "score": s})
        return out[out["score"] > 0.0]

    scored = stats_ds.map_batches(score, batch_format="pandas")
    return global_topk(
        scored,
        sort_cols=["score", "doc_id"],
        ascending=[False, True],
        k=k,
        num_buckets=num_buckets,
    )


def inverted_index(
    docs: "rd.Dataset",
    max_postings: int = 20,
    min_df: int = 1,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Search-engine inverted index: per token, its document frequency
    and the FIRST ``max_postings`` posting doc_ids in ascending order
    (comma-joined string — bounded row size for hot stop-tokens; the
    full postings of a web-scale stopword would be a one-row gigabyte).

    Output: (token, df, postings).

    Scale shape: `doc_term_freqs` is exchange-free (one doc per row);
    distinct (token, doc_id) postings then ride ONE token-keyed
    exchange where each bucket computes df (exact, from all postings)
    and the truncated sorted posting string in whole-bucket vectorized
    kernels. A per-block combiner cannot shrink the df count (distinct
    doc_ids must meet once) but per-block `drop_duplicates` already
    holds: (doc, token) pairs are unique by construction upstream.
    """
    import pandas as pd_

    from kgflow.ops.shuffle import bucketed_group_reduce

    tf = doc_term_freqs(docs)  # (doc_id, token, tf) — unique pairs

    def reduce_fn(g: pd_.DataFrame) -> pd_.DataFrame:
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        grp = g.groupby("token", sort=False)
        df_ = grp.size().rename("df")
        head = g.loc[grp.cumcount() < max_postings]
        postings = (
            head.assign(_s=head["doc_id"].astype(str))
            .groupby("token", sort=False)["_s"]
            .agg(",".join)
            .rename("postings")
        )
        out = pd_.concat([df_, postings], axis=1).reset_index()
        out["df"] = out["df"].astype("int64")
        return out[out["df"] >= min_df]

    return bucketed_group_reduce(
        tf.map_batches(
            lambda d: d[["token", "doc_id"]], batch_format="pandas"
        ),
        key_cols=["token"],
        reduce_fn=reduce_fn,
        num_buckets=num_buckets,
    )


def flesch_scores(docs: "rd.Dataset") -> "rd.Dataset":
    """Per-document Flesch reading-ease with a deterministic
    vowel-group syllable counter: syllables(word) = max(1, number of
    [aeiouy]+ runs) — the standard heuristic used by readability
    filters over web corpora (exact enough to rank, cheap enough to
    stream). Sentences = [.!?]+ runs, floored at 1 so punctuation-free
    text still scores.

    score = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    computed left-to-right in float64 — every engine (numpy, DuckDB
    with e0 literals) rounds this identically, so the oracle is
    hash-exact with no tolerance.

    Output: (doc_id, n_words, n_sentences, n_syllables, flesch).
    Exchange-FREE: one row per document, all counts local to a batch.
    """

    def f(d: pd.DataFrame) -> pd.DataFrame:
        toks = (
            d.set_index("doc_id")["text"].str.lower().str.findall(_WORD_RE).explode().dropna()
        )
        vg = toks.str.count("[aeiouy]+")
        per_doc = pd.DataFrame(
            {
                "n_words": 1,
                # zero-vowel tokens still carry one spoken syllable
                "syl": np.maximum(vg.to_numpy(dtype=np.int64), 1),
            },
            index=toks.index,
        ).groupby(level=0).sum()
        sent = (
            d.set_index("doc_id")["text"].str.count(r"[.!?]+").clip(lower=1)
        )
        out = per_doc.join(sent.rename("n_sentences"))
        w = out["n_words"].to_numpy(dtype=np.float64)
        s = out["n_sentences"].to_numpy(dtype=np.float64)
        sy = out["syl"].to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "doc_id": out.index.to_numpy(dtype=np.int64),
                "n_words": out["n_words"].to_numpy(dtype=np.int64),
                "n_sentences": out["n_sentences"].to_numpy(dtype=np.int64),
                "n_syllables": out["syl"].to_numpy(dtype=np.int64),
                "flesch": 206.835 - 1.015 * (w / s) - 84.6 * (sy / w),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


def simpson_diversity(docs: "rd.Dataset") -> "rd.Dataset":
    """Per-document lexical diversity: Simpson concentration index
    Σ tf² / n² (the repeated-token probability — 1/types for a
    uniform doc, →1 for a one-token loop; the rational cousin of
    token entropy, chosen because Σtf² and n² are exact int64 and the
    single double division is correctly rounded identically in every
    IEEE engine — hash-exact with no libm log()).

    Output: (doc_id, n_tokens, simpson). Exchange-FREE: a document is
    one row, so the per-batch tokenize + groupby is globally exact.
    """
    import pandas as pd_

    def f(d: pd_.DataFrame) -> pd_.DataFrame:
        toks = (
            d.set_index("doc_id")["text"].str.lower().str.findall(_WORD_RE).explode().dropna()
        )
        tf = (
            toks.rename("token")
            .reset_index()
            .groupby(["doc_id", "token"], sort=False)
            .size()
            .rename("tf")
            .reset_index()
        )
        agg = tf.assign(sq=tf["tf"].to_numpy(dtype=np.int64) ** 2).groupby(
            "doc_id", as_index=False
        ).agg(n_tokens=("tf", "sum"), sq=("sq", "sum"))
        n = agg["n_tokens"].to_numpy(dtype=np.int64)
        sq = agg["sq"].to_numpy(dtype=np.int64)
        if len(n) and n.max() > 2**31:
            raise ValueError("simpson_diversity: n² exceeds int64 — rescale")
        return pd_.DataFrame(
            {
                "doc_id": agg["doc_id"],
                "n_tokens": n,
                "simpson": sq.astype(np.float64) / (n * n).astype(np.float64),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


def pack_sequences(
    docs: "rd.Dataset",
    budget: int = 2000,
    shard_size: int = 100,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Greedy sequence packing for training export: assign documents
    (in doc_id order) to context-window bins of ≤ ``budget`` tokens —
    the batching step an LLM data pipeline runs last, where padding
    waste is decided. Greedy-in-order: a bin closes when the next doc
    would overflow it; a single doc larger than the budget gets a bin
    of its own.

    Packing is SHARD-LOCAL (shard = doc_id // shard_size): a global
    greedy scan is inherently sequential (every boundary depends on
    the exact previous one), while per-shard packing is embarrassingly
    parallel, deterministic, and what production pipelines do anyway —
    the only cost is ≤ one partially-filled bin per shard. ONE
    shard-keyed exchange of (doc_id, n_tokens) rows; the in-bucket
    scan is O(bins · log docs) via cumsum + searchsorted jumps, not a
    per-doc loop.

    Output: (doc_id, shard, n_tokens, bin) — bin numbered 0.. within
    each shard. Zero-token documents are EXCLUDED (nothing to pack,
    and their cumsum ties at bin boundaries would make the bin
    assignment ambiguous between engines); with every n_tokens ≥ 1
    the per-shard cumsum is strictly increasing, so boundaries are
    unambiguous.
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    counts = token_counts(docs).map_batches(
        lambda d: d.loc[d["n_tokens"].to_numpy() > 0].assign(
            shard=lambda x: x["doc_id"].to_numpy(dtype=np.int64) // shard_size
        ),
        batch_format="pandas",
    )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "shard": pd.Series([], dtype="int64"),
                    "n_tokens": pd.Series([], dtype="int64"),
                    "bin": pd.Series([], dtype="int64"),
                }
            )
        g = g.sort_values(["shard", "doc_id"], kind="mergesort")
        shards = g["shard"].to_numpy(dtype=np.int64)
        toks = g["n_tokens"].to_numpy(dtype=np.int64)
        bins = np.empty(len(g), dtype=np.int64)
        starts = np.flatnonzero(
            np.concatenate(([True], shards[1:] != shards[:-1]))
        )
        ends = np.append(starts[1:], len(g))
        for s, e in zip(starts, ends):
            cs = np.cumsum(toks[s:e])
            i, b, base = 0, 0, 0
            while i < e - s:
                j = int(np.searchsorted(cs, base + budget, side="right"))
                if j == i:  # single doc exceeds the budget: own bin
                    j = i + 1
                bins[s + i : s + j] = b
                base = cs[j - 1]
                b += 1
                i = j
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(dtype=np.int64),
                "shard": shards,
                "n_tokens": toks,
                "bin": bins,
            }
        )

    return bucketed_group_reduce(
        counts, key_cols=["shard"], reduce_fn=pack, num_buckets=num_buckets
    )


def bigram_successors(
    docs: "rd.Dataset",
    min_pair_n: int = 1,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Corpus bigram language model, collapsed to its argmax: for every
    token, the most likely successor token and the bigram count — the
    count-based core of n-gram LM training (Kneser-Ney and friends
    start from exactly these adjacency counts) and of phrase/compound
    detection. Ties break lexicographically (first-wins argmax, the
    ``doc_langid``/``grouped_mode`` convention).

    Output: (token, next_token, pair_n), one row per distinct first
    token with a best pair count ≥ ``min_pair_n``.

    Scale shape: tokenization + per-batch bigram counting are C
    kernels (one str.findall pass, shifted-array pairing, a single
    two-column groupby), so each block shrinks to its DISTINCT bigrams
    before any exchange; exchange 1 sums partials bucketed on the
    BIGRAM (a stop-token head's pairs spread across buckets — no hot
    first-token reducer); exchange 2 is vocabulary-bounded (one best
    row per (bucket, token)) and picks the global argmax per token."""
    import pandas as pd_

    from kgflow.ops.shuffle import bucketed_group_reduce

    def partial(df: pd_.DataFrame) -> pd_.DataFrame:
        toks = df["text"].str.lower().str.findall(_WORD_RE)
        # shifted-array pairing per doc, vectorized across the batch:
        # explode once, mask out cross-document seams by doc ordinal
        ex = toks.explode().dropna()
        if not len(ex):
            return pd_.DataFrame(
                {
                    "token": pd_.Series([], dtype="object"),
                    "next_token": pd_.Series([], dtype="object"),
                    "pair_n": pd_.Series([], dtype="int64"),
                }
            )
        words = ex.to_numpy(dtype=object)
        doc_ord = ex.index.to_numpy()
        same_doc = doc_ord[:-1] == doc_ord[1:]
        a, b = words[:-1][same_doc], words[1:][same_doc]
        t = pd_.DataFrame({"token": a, "next_token": b})
        out = t.groupby(["token", "next_token"], sort=False, as_index=False).size()
        return out.rename(columns={"size": "pair_n"})

    def sum_pairs(g: pd_.DataFrame) -> pd_.DataFrame:
        agg = g.groupby(["token", "next_token"], as_index=False)["pair_n"].sum()
        # bucket-local argmax: one candidate row per token per bucket —
        # the global argmax per token is among the buckets' argmaxes
        return agg.sort_values(
            ["token", "pair_n", "next_token"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("token")

    def best(g: pd_.DataFrame) -> pd_.DataFrame:
        out = g.sort_values(
            ["token", "pair_n", "next_token"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("token")
        return out[out["pair_n"] >= min_pair_n]

    partials = bucketed_group_reduce(
        docs.select_columns(["text"]).map_batches(partial, batch_format="pandas"),
        key_cols=["token", "next_token"],
        reduce_fn=sum_pairs,
        num_buckets=num_buckets,
    )
    return bucketed_group_reduce(
        partials, key_cols=["token"], reduce_fn=best, num_buckets=num_buckets
    )


class ExtractSpans:
    """Actor for `regex_extract_spans`: patterns compile ONCE per actor
    (the LangIdStage convention), each batch explodes to long-format
    (doc_id, kind, match) rows via pandas str.findall C-dispatch."""

    def __init__(self, patterns: dict[str, str]):
        self.pats = {k: re.compile(p) for k, p in patterns.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for kind, pat in self.pats.items():
            m = df.set_index("doc_id")["text"].str.findall(pat).explode().dropna()
            outs.append(
                pd.DataFrame(
                    {
                        "doc_id": m.index.to_numpy(dtype=np.int64),
                        "kind": kind,
                        "match": m.to_numpy(dtype=object),
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "kind": pd.Series([], dtype="object"),
                    "match": pd.Series([], dtype="object"),
                }
            )
        return pd.concat(outs, ignore_index=True)


def regex_extract_spans(
    docs: "rd.Dataset",
    patterns: dict[str, str],
) -> "rd.Dataset":
    """Structured span extraction — the flat_map workhorse of web-corpus
    mining (URLs for link graphs, emails/phones for PII audits, code
    fences, citations): every regex match becomes one long-format row
    (doc_id, kind, match), multiple matches per doc preserved.

    Scale shape: embarrassingly parallel, no exchange at all; patterns
    compile once per actor; output is match-bounded, never
    text-bounded. The KIND column keeps one pass over the text for any
    number of patterns."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        ExtractSpans,
        batch_format="pandas",
        fn_constructor_kwargs={"patterns": patterns},
        concurrency=(1, 8),
    )


def pmi_collocations(
    docs: "rd.Dataset",
    min_count: int = 5,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Pointwise mutual information for ADJACENT token pairs (Church &
    Hanks 1990 collocations): per surviving bigram →
    (tok_a, tok_b, c_ab, pmi) where

        pmi = ln( c_ab · N_tok² / (N_pair · c_a · c_b) )

    with the same lower + ``\\w+`` tokenization as `vocab_topk`.

    Scale shape: unigram and bigram counts each run combiner → ONE
    keyed int64 exchange (partial counts per batch, never raw tokens);
    the two corpus scalars (N_tok, N_pair) fold from the count tables.
    The ``min_count`` filter shrinks the bigram table BEFORE any join;
    unigram counts are vocab-bounded, so the two count-attach joins
    auto-broadcast (`hash_join` right_small). Counts stay int64 end to
    end — the single final ln() is the only float op, so engine-vs-SQL
    drift is libm-ulp-bounded (the `grouped_entropy` precedent).
    """
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce

    def gram_partials(df: pd.DataFrame):
        toks = df["text"].str.lower().str.findall(r"\w+")
        uni: dict[str, int] = {}
        bi: dict[tuple[str, str], int] = {}
        for ts in toks:
            for t in ts:
                uni[t] = uni.get(t, 0) + 1
            for a, b in zip(ts, ts[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        return uni, bi

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        uni, _ = gram_partials(df)
        return pd.DataFrame(
            {"tok": list(uni.keys()),
             "c": np.fromiter(uni.values(), dtype=np.int64, count=len(uni))}
        )

    def bi_partial(df: pd.DataFrame) -> pd.DataFrame:
        _, bi = gram_partials(df)
        ks = list(bi.keys())
        return pd.DataFrame(
            {
                "tok_a": [k[0] for k in ks],
                "tok_b": [k[1] for k in ks],
                "c_ab": np.fromiter(bi.values(), dtype=np.int64, count=len(bi)),
            }
        )

    text = docs.select_columns(["text"])

    def sum_by(cols, cname):
        def red(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby(cols, as_index=False, sort=False)[cname].sum()
            out[cname] = out[cname].astype(np.int64)
            return out

        return red

    uni = bucketed_group_reduce(
        text.map_batches(uni_partial, batch_format="pandas"),
        key_cols=["tok"],
        reduce_fn=sum_by(["tok"], "c"),
        num_buckets=num_buckets,
    ).materialize()  # vocab-bounded; consumed by scalar sum + 2 joins

    # bigram-vocab-bounded; materialized ONCE for the N_pair scalar +
    # the min_count filter (two consumers would re-run the reduce)
    bi = bucketed_group_reduce(
        text.map_batches(bi_partial, batch_format="pandas"),
        key_cols=["tok_a", "tok_b"],
        reduce_fn=sum_by(["tok_a", "tok_b"], "c_ab"),
        num_buckets=num_buckets,
    ).materialize()

    n_tok = int(uni.sum("c"))
    n_pair = int(bi.sum("c_ab") or 0)

    survivors = bi.map_batches(
        lambda df: df[df["c_ab"] >= min_count], batch_format="pandas"
    ).materialize()  # bigram-vocab-bounded; cheap count probe + join input
    if survivors.count() == 0:
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "tok_a": pd.Series([], dtype=object),
                    "tok_b": pd.Series([], dtype=object),
                    "c_ab": pd.Series([], dtype="int64"),
                    "pmi": pd.Series([], dtype="float64"),
                }
            )
        )

    ca = uni.map_batches(
        lambda df: df.rename(columns={"tok": "tok_a", "c": "c_a"}),
        batch_format="pandas",
    )
    cb = uni.map_batches(
        lambda df: df.rename(columns={"tok": "tok_b", "c": "c_b"}),
        batch_format="pandas",
    )
    j = hash_join(
        hash_join(survivors, ca, on="tok_a", right_small=True),
        cb,
        on="tok_b",
        right_small=True,
    )

    def pmi(df: pd.DataFrame) -> pd.DataFrame:
        c_ab = df["c_ab"].to_numpy(dtype=np.int64)
        c_a = df["c_a"].to_numpy(dtype=np.int64)
        c_b = df["c_b"].to_numpy(dtype=np.int64)
        # exact int64 products (overflow-safe while c·N² < 2^63 —
        # beyond that scale switch to ln subtraction), ONE cast-divide
        # -ln mirroring the SQL form bit-for-bit
        num = c_ab * np.int64(n_tok) * np.int64(n_tok)
        den = np.int64(n_pair) * c_a * c_b
        val = np.log(num.astype(np.float64) / den.astype(np.float64))
        return pd.DataFrame(
            {
                "tok_a": df["tok_a"],
                "tok_b": df["tok_b"],
                "c_ab": c_ab,
                "pmi": val,
            }
        )

    return j.map_batches(pmi, batch_format="pandas")


def hapax_stats(docs: "rd.Dataset", num_buckets: int | None = None) -> "rd.Dataset":
    """Corpus hapax-legomena profile: ONE row (n_tokens, n_vocab,
    n_hapax, hapax_ratio) over the same lower + ``\\w+`` tokenization
    as `vocab_topk` — the classic corpus-quality signal (a shrinking
    hapax share flags template/boilerplate-dominated crawls).

    Scale shape: per-batch token-count combiner → ONE keyed int64
    exchange (vocab-bounded, never raw tokens); each bucket folds to a
    single (n_tokens, n_vocab, n_hapax) partial so the final reduce
    sees ≤ num_buckets rows. Counts stay int64; the closing ratio is
    the only float op.
    """
    from kgflow.ops.shuffle import bucketed_group_reduce

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"\w+").explode().dropna()
        out = toks.value_counts()
        return pd.DataFrame(
            {"tok": out.index.to_numpy(), "c": out.to_numpy(dtype=np.int64)}
        )

    def count_reduce(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("tok", sort=False)["c"].sum().to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "_k": np.zeros(1, dtype=np.int64),
                "n_tokens": [c.sum()],
                "n_vocab": [np.int64(len(c))],
                "n_hapax": [np.int64((c == 1).sum())],
            }
        )

    partials = bucketed_group_reduce(
        docs.select_columns(["text"]).map_batches(
            tok_partial, batch_format="pandas"
        ),
        key_cols=["tok"],
        reduce_fn=count_reduce,
        num_buckets=num_buckets,
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g[["n_tokens", "n_vocab", "n_hapax"]].sum().astype(np.int64)
        return pd.DataFrame(
            {
                "n_tokens": [s["n_tokens"]],
                "n_vocab": [s["n_vocab"]],
                "n_hapax": [s["n_hapax"]],
                "hapax_ratio": [s["n_hapax"] / s["n_vocab"]]
                if s["n_vocab"]
                else [0.0],
            }
        )

    return bucketed_group_reduce(
        partials, key_cols=["_k"], reduce_fn=fold, num_buckets=1
    )


def substring_position(
    docs: "rd.Dataset", needle: str, out_col: str = "pos"
) -> "rd.Dataset":
    """Per-doc 1-based position of the first occurrence of ``needle``
    in the lowercased text (0 = absent) — SQL ``strpos(lower(text),
    needle)`` semantics, computed with zero-copy Arrow kernels
    (utf8_lower + find_substring; no pandas round trip, no Python
    rows). Returns (doc_id, pos)."""

    def f(batch: pa.Table) -> pa.Table:
        lo = pc.utf8_lower(batch.column("text"))
        idx = pc.find_substring(lo, needle)  # -1 when absent
        pos = pc.add(pc.cast(idx, pa.int64()), 1)
        return pa.table({"doc_id": batch.column("doc_id"), out_col: pos})

    return docs.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def vocab_apply(
    docs: "rd.Dataset", vocab_size: int = 20, num_buckets: int | None = None
) -> "rd.Dataset":
    """The induce-then-apply tokenizer-prep pipeline: build the global
    top-``vocab_size`` token vocabulary (`vocab_topk` — per-block
    combiner + bucketed reduce, deterministic (freq DESC, token ASC)
    ties), broadcast it, then ONE streaming pass scores every document
    → (doc_id, n_tokens, n_unk) where n_unk counts out-of-vocabulary
    tokens. The shape every real tokenizer-training pipeline runs:
    vocabulary induction is corpus-wide, application is embarrassingly
    parallel against the broadcast vocab.

    The vocab pull is vocab_size-bounded (driver-safe by construction);
    the apply pass is a pandas C-kernel isin over exploded tokens —
    no per-row Python."""
    import ray

    vocab = set(
        vocab_topk(docs, k=vocab_size, num_buckets=num_buckets)
        .to_pandas()["token"]
        .astype(str)
    )
    ref = ray.put(vocab)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(ref)
        toks = df["text"].str.lower().str.findall(r"\w+")
        n_tok = toks.str.len().to_numpy(dtype=np.int64)
        ex = toks.explode().dropna()
        unk_mask = ~ex.isin(v)
        n_unk = (
            unk_mask.groupby(ex.index).sum().reindex(df.index, fill_value=0)
        ).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "n_tokens": n_tok,
                "n_unk": n_unk,
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pandas"
    )


def discriminative_tokens(
    docs: "rd.Dataset",
    group_col: str,
    target: str,
    k: int = 20,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Tokens that most distinguish ``target`` documents from the rest
    of the corpus — the integer-exact core of log-odds keyword
    analysis: score(token) = ca·tb − cb·ta (ca/cb = token counts in /
    out of the target, ta/tb the totals), positive when the token is
    over-represented in the target; the monotone cross-multiplied form
    of ca/ta > cb/tb, so ranking matches the ratio ranking with NO
    floats or smoothing constants. Returns the top-``k``
    (token, ca, cb, score) by (score DESC, token ASC).

    Scale shape: per-batch explode + value_counts combiner emits
    (token, ca, cb) partials; ONE vocab-bounded exchange sums them;
    totals fold to a broadcast 2-int scalar; scores cross-multiply in
    arbitrary-precision ints (1e12-row counts × 1e15 totals overflow
    int64 — the q11 pattern) and the top-k rides the global-topk
    semigroup combiner."""
    import ray

    from kgflow.ops.shuffle import bucketed_group_reduce, global_topk

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"\w+")
        in_a = (df[group_col] == target).to_numpy()
        rows = []
        for flag in (True, False):
            ex = toks[in_a == flag].explode().dropna()
            if not len(ex):
                continue
            vc = ex.value_counts()
            rows.append(
                pd.DataFrame(
                    {
                        "token": vc.index.astype(str),
                        "ca": vc.to_numpy(dtype=np.int64) if flag else 0,
                        "cb": 0 if flag else vc.to_numpy(dtype=np.int64),
                    }
                )
            )
        if not rows:
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype="object"),
                    "ca": pd.Series([], dtype="int64"),
                    "cb": pd.Series([], dtype="int64"),
                }
            )
        out = pd.concat(rows, ignore_index=True)
        return out.groupby("token", as_index=False)[["ca", "cb"]].sum()

    counts = bucketed_group_reduce(
        docs.select_columns([group_col, "text"]).map_batches(
            partial, batch_format="pandas"
        ),
        key_cols=["token"],
        reduce_fn=lambda g: g.groupby("token", as_index=False)[
            ["ca", "cb"]
        ].sum(),
        num_buckets=num_buckets,
    ).materialize()  # vocab-bounded; consumed by the totals fold + scoring

    tot = counts.map_batches(
        lambda d: pd.DataFrame(
            {"ta": [int(d["ca"].sum())], "tb": [int(d["cb"].sum())]}
        ),
        batch_format="pandas",
    ).to_pandas()
    ta, tb = int(tot["ta"].sum()), int(tot["tb"].sum())

    def score(d: pd.DataFrame) -> pd.DataFrame:
        ca = d["ca"].to_numpy(dtype=object)
        cb = d["cb"].to_numpy(dtype=object)
        s = ca * tb - cb * ta  # arbitrary-precision
        return pd.DataFrame(
            {
                "token": d["token"].astype(object),
                "ca": d["ca"].astype(np.int64),
                "cb": d["cb"].astype(np.int64),
                "score": np.array([int(x) for x in s], dtype=np.int64),
            }
        )

    return global_topk(
        counts.map_batches(score, batch_format="pandas"),
        sort_cols=["score", "token"],
        ascending=[False, True],
        k=k,
    )


def kwic_windows(
    docs: "rd.Dataset", keyword: str, radius: int = 3
) -> "rd.Dataset":
    """KWIC concordance — for every occurrence of ``keyword`` in the
    lowercased token stream, the ±``radius``-token context window:
    (doc_id, pos, window) with pos the 1-based token position and
    window the space-joined tokens [max(pos−radius, 1), pos+radius]
    (edges truncate), matching the SQL list-slice replay exactly.

    Exchange-free streaming pass; per-doc tokenization is the
    vectorized findall, occurrence location is np.where on the token
    array, and only the OCCURRENCES (keyword-bounded, not the corpus)
    pay a per-window join — the candidate-bounded-Python convention
    of the dedup verifies."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"\w+")
        ids, poss, wins = [], [], []
        for did, tl in zip(df["doc_id"].to_numpy(), toks):
            ta = np.asarray(tl, dtype=object)
            hits = np.flatnonzero(ta == keyword)
            for h in hits:
                i = int(h) + 1  # 1-based
                lo = max(i - radius, 1) - 1
                hi = i + radius
                ids.append(int(did))
                poss.append(i)
                wins.append(" ".join(ta[lo:hi]))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "pos": pd.Series(poss, dtype="int64"),
                "window": pd.Series(wins, dtype="object"),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pandas"
    )


def doc_bigram_freqs(docs: "rd.Dataset") -> "rd.Dataset":
    """(doc_id, token, next_token, c) — exact per-document bigram
    frequencies. A document is ONE input row (the `doc_term_freqs`
    invariant), so the shifted-array pairing + two-key groupby is
    globally exact with zero exchanges; cross-document seams are masked
    by the doc ordinal (the `bigram_successors` kernel, keyed)."""
    import pandas as pd_

    def per_doc(df: pd_.DataFrame) -> pd_.DataFrame:
        empty = pd_.DataFrame(
            {
                "doc_id": pd_.Series([], dtype="int64"),
                "token": pd_.Series([], dtype="object"),
                "next_token": pd_.Series([], dtype="object"),
                "c": pd_.Series([], dtype="int64"),
            }
        )
        toks = df.set_index("doc_id")["text"].str.lower().str.findall(_WORD_RE)
        ex = toks.explode().dropna()
        if not len(ex):
            return empty
        words = ex.to_numpy(dtype=object)
        did = ex.index.to_numpy()
        same = did[:-1] == did[1:]
        if not same.any():
            return empty
        t = pd_.DataFrame(
            {
                "doc_id": did[:-1][same],
                "token": words[:-1][same],
                "next_token": words[1:][same],
            }
        )
        out = t.groupby(
            ["doc_id", "token", "next_token"], sort=False, as_index=False
        ).size().rename(columns={"size": "c"})
        out["doc_id"] = out["doc_id"].astype("int64")
        out["c"] = out["c"].astype("int64")
        return out

    return docs.select_columns(["doc_id", "text"]).map_batches(
        per_doc, batch_format="pandas"
    )


def bigram_perplexity(
    docs: "rd.Dataset",
    num_buckets: int | None = None,
    broadcast_limit: int = 2_000_000,
) -> "rd.Dataset":
    """Per-document bigram-LM log-probability — the CCNet "score each
    document under a language model trained on the corpus" filter
    (CCNet uses KenLM perplexity; this is the exactly-checkable MLE
    bigram core: the LM is trained on the SAME corpus it scores, so
    every document bigram has count ≥ 1 and no smoothing is needed).

    Returns (doc_id, n_bigrams, logprob_sum) where ``logprob_sum`` =
    Σ over bigram instances of ln(pair_n / ctx_n); perplexity is the
    caller's single division exp(−logprob_sum / n_bigrams) and stays
    out of the compared schema (the `grouped_corr_moments` convention).
    Documents with < 2 tokens drop (no bigrams — inner semantics).

    Scale shape: tokenization happens ONCE — the per-doc bigram table
    is materialized and feeds both LM training and scoring. Training
    is one bigram-keyed bucketed sum (distinct-bigram bounded) plus a
    derived first-token sum. Scoring: when the LM fits under
    ``broadcast_limit`` rows it ships once via ``ray.put`` and the
    scoring pass is exchange-free (per-doc groups are block-local by
    the one-row-per-doc invariant); otherwise two co-partitioned
    `hash_join`s attach (pair_n, ctx_n) and one doc-keyed bucketed
    reduce sums the per-doc terms. Both paths are parity-tested."""
    import pandas as pd_

    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce

    dbg = doc_bigram_freqs(docs).materialize()

    def pair_partial(d: pd_.DataFrame) -> pd_.DataFrame:
        g = d.groupby(["token", "next_token"], as_index=False)["c"].sum()
        return g.rename(columns={"c": "pair_n"})

    def pair_sum(g: pd_.DataFrame) -> pd_.DataFrame:
        out = g.groupby(["token", "next_token"], as_index=False)["pair_n"].sum()
        out["pair_n"] = out["pair_n"].astype("int64")
        return out

    pairs = bucketed_group_reduce(
        dbg.map_batches(pair_partial, batch_format="pandas"),
        key_cols=["token", "next_token"],
        reduce_fn=pair_sum,
        num_buckets=num_buckets,
    ).materialize()

    if pairs.count() <= broadcast_limit:
        import ray

        lm = pairs.to_pandas()
        ctx = lm.groupby("token")["pair_n"].sum()
        lm["logp"] = np.log(lm["pair_n"].to_numpy(dtype=np.float64)) - np.log(
            ctx.reindex(lm["token"]).to_numpy(dtype=np.float64)
        )
        ref = ray.put(lm[["token", "next_token", "logp"]])

        class Score:
            def __init__(self):
                self.lm = ray.get(ref)

            def __call__(self, d: pd_.DataFrame) -> pd_.DataFrame:
                m = d.merge(self.lm, on=["token", "next_token"], how="left")
                m["lp"] = m["c"].to_numpy(dtype=np.float64) * m["logp"].to_numpy()
                g = m.groupby("doc_id", as_index=False).agg(
                    n_bigrams=("c", "sum"), logprob_sum=("lp", "sum")
                )
                g["n_bigrams"] = g["n_bigrams"].astype("int64")
                return g

        return dbg.map_batches(Score, batch_format="pandas", concurrency=(1, 4))

    def ctx_partial(d: pd_.DataFrame) -> pd_.DataFrame:
        g = d.groupby("token", as_index=False)["pair_n"].sum()
        return g.rename(columns={"pair_n": "ctx_n"})

    def ctx_sum(g: pd_.DataFrame) -> pd_.DataFrame:
        out = g.groupby("token", as_index=False)["ctx_n"].sum()
        out["ctx_n"] = out["ctx_n"].astype("int64")
        return out

    ctxs = bucketed_group_reduce(
        pairs.map_batches(ctx_partial, batch_format="pandas"),
        key_cols=["token"],
        reduce_fn=ctx_sum,
        num_buckets=num_buckets,
    ).materialize()

    j = hash_join(dbg, pairs, on=["token", "next_token"], num_buckets=num_buckets)
    j = hash_join(j, ctxs, on="token", num_buckets=num_buckets)

    def doc_partial(d: pd_.DataFrame) -> pd_.DataFrame:
        lp = d["c"].to_numpy(dtype=np.float64) * (
            np.log(d["pair_n"].to_numpy(dtype=np.float64))
            - np.log(d["ctx_n"].to_numpy(dtype=np.float64))
        )
        g = d.assign(lp=lp).groupby("doc_id", as_index=False).agg(
            n_bigrams=("c", "sum"), logprob_sum=("lp", "sum")
        )
        return g

    def doc_final(g: pd_.DataFrame) -> pd_.DataFrame:
        out = g.groupby("doc_id", as_index=False).agg(
            n_bigrams=("n_bigrams", "sum"), logprob_sum=("logprob_sum", "sum")
        )
        out["n_bigrams"] = out["n_bigrams"].astype("int64")
        return out

    return bucketed_group_reduce(
        j.map_batches(doc_partial, batch_format="pandas"),
        key_cols=["doc_id"],
        reduce_fn=doc_final,
        num_buckets=num_buckets,
    )


def multi_match(docs: "rd.Dataset", patterns: "list[str]") -> "rd.Dataset":
    """Blocklist / lexicon multi-pattern matching: (doc_id, pattern,
    n_hits) for every document × fixed-string pattern with ≥ 1
    occurrence (non-overlapping counts — the left-to-right scan both
    Arrow's ``count_substring`` and SQL ``replace`` implement).

    The filtering primitive behind banned-term gates and keyword
    lexicon scoring in webtext pipelines. Zero-copy Arrow end to end:
    one ``pyarrow.compute.count_substring`` C pass per pattern over the
    batch's string column — no pandas conversion, no Python loop over
    rows; the pattern list is a closure constant (a handful of strings,
    not actor state). Output is doc-bounded × |patterns| and carries no
    text."""
    import pyarrow as pa
    import pyarrow.compute as pc

    pats = [str(p) for p in patterns]
    if not pats:
        raise ValueError("patterns must be non-empty")

    def f(batch: "pa.Table") -> "pa.Table":
        ids = batch.column("doc_id")
        text = batch.column("text")
        parts = []
        for p in pats:
            n = pc.cast(pc.count_substring(text, pattern=p), pa.int64())
            mask = pc.greater(n, 0)
            k = pc.sum(pc.cast(mask, pa.int64())).as_py() or 0
            if not k:
                continue
            parts.append(
                pa.table(
                    {
                        "doc_id": pc.filter(ids, mask),
                        "pattern": pa.array([p] * k, type=pa.string()),
                        "n_hits": pc.filter(n, mask),
                    }
                )
            )
        if not parts:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "pattern": pa.array([], type=pa.string()),
                    "n_hits": pa.array([], type=pa.int64()),
                }
            )
        return pa.concat_tables(parts)

    return docs.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def char_entropy(docs: "rd.Dataset") -> "rd.Dataset":
    """Per-document byte-distribution Shannon entropy (nats) — the
    gibberish / mojibake / low-diversity signal webtext quality filters
    threshold on (uniform noise scores high, single-char runs score 0).
    Returns (doc_id, n_bytes, entropy) with entropy =
    ln(n) − Σ c·ln(c)/n over the UTF-8 byte histogram; empty documents
    drop (inner semantics). Byte-level by definition — identical to
    character-level on ASCII corpora (the sf fixtures are ASCII).

    Zero-copy Arrow hot path: per chunk, the string column's offsets +
    data buffers are viewed as numpy arrays directly (no pandas, no
    Python per row); one ``np.bincount`` over doc_ordinal·256+byte
    builds every histogram in the batch at once. No exchange — a
    document is one row, so the batch result is final."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def f(batch: "pa.Table") -> "pa.Table":
        ids_out = []
        nb_out = []
        ent_out = []
        text = pc.cast(batch.column("text"), pa.large_binary())
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        pos = 0
        for chunk in text.chunks if hasattr(text, "chunks") else [text]:
            n = len(chunk)
            if not n:
                continue
            cids = ids[pos : pos + n]
            pos += n
            bufs = chunk.buffers()
            offs = np.frombuffer(bufs[1], dtype=np.int64)[
                chunk.offset : chunk.offset + n + 1
            ]
            data = np.frombuffer(bufs[2], dtype=np.uint8)
            lens = np.diff(offs)
            keep = lens > 0
            if chunk.null_count:
                keep &= ~np.asarray(
                    [chunk.is_null()[i].as_py() for i in range(n)]
                )
            if not keep.any():
                continue
            kidx = np.flatnonzero(keep)
            doc_ord = np.repeat(
                np.arange(len(kidx), dtype=np.int64), lens[kidx]
            )
            if keep.all():
                # contiguous fast path: the kept spans ARE the buffer
                spans = data[offs[0] : offs[-1]].astype(np.int64)
            else:
                # rare path (empty/null docs): gather surviving spans
                spans = np.concatenate(
                    [data[offs[i] : offs[i + 1]] for i in kidx]
                ).astype(np.int64)
            hist = np.bincount(
                doc_ord * 256 + spans, minlength=len(kidx) * 256
            ).reshape(len(kidx), 256)
            nb = lens[kidx].astype(np.float64)
            c = hist.astype(np.float64)
            clogc = np.where(c > 0, c * np.log(np.maximum(c, 1.0)), 0.0)
            ent = np.log(nb) - clogc.sum(axis=1) / nb
            ids_out.append(cids[kidx])
            nb_out.append(lens[kidx].astype(np.int64))
            ent_out.append(ent)
        if not ids_out:
            return pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_bytes": pa.array([], type=pa.int64()),
                    "entropy": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(ids_out), type=pa.int64()),
                "n_bytes": pa.array(np.concatenate(nb_out)),
                "entropy": pa.array(np.concatenate(ent_out)),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def filtered_vocab(
    docs: "rd.Dataset",
    min_len: int = 5,
    max_len: int = 20,
    min_count: int = 2,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Corpus vocabulary restricted to clean lowercase-alpha tokens of
    ``min_len``..``max_len`` chars appearing ≥ ``min_count`` times —
    the candidate set for spell/typo analysis (`symdelete_pairs`) and
    lexicon induction. Returns (token, n).

    Scale shape: the standard vocab combiner (per-block explode +
    value_counts, C kernels, filtered BEFORE the exchange so junk
    tokens never ship) and ONE token-keyed bucketed count reduce —
    the exchange is vocabulary-bounded, never corpus-bounded."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"\w+").explode().dropna()
        toks = toks[
            toks.str.fullmatch(r"[a-z]+")
            & toks.str.len().between(min_len, max_len)
        ]
        vc = toks.value_counts()
        return pd.DataFrame(
            {"token": vc.index.to_numpy(), "n": vc.to_numpy(dtype=np.int64)}
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("token", as_index=False, sort=False)["n"].sum()
        return out[out["n"] >= min_count]

    return bucketed_group_reduce(
        docs.select_columns(["text"]).map_batches(partial, batch_format="pandas"),
        key_cols=["token"],
        reduce_fn=finish,
        num_buckets=num_buckets,
    )


def bpe_merges(
    docs: "rd.Dataset",
    n_merges: int = 10,
    num_buckets: int | None = None,
    driver_limit: int = 2_000_000,
) -> pd.DataFrame:
    """Distributed BPE merge training (Sennrich et al., ACL 2016 —
    word-frequency formulation): ONE corpus pass builds the
    (word, count) table, then each merge round is a pair-count
    map+reduce over the VOCABULARY followed by a global top-1 and a
    vectorized merge apply — the corpus is never touched again.
    Returns the merge table (rank, left, right, pair_count), the
    artifact a tokenizer-training pipeline persists.

    Determinism: ties break (count DESC, left ASC, right ASC) — the
    same rule on every engine, so merge sequences are reproducible.

    Scale shape: the only corpus-sized exchange is the initial word
    count; every round's pair-count exchange is vocabulary-bounded and
    the symbol table re-materializes per round (V-bounded state — the
    PageRank/CC iterative exception, documented). The per-word pair
    zip inside a round runs over vocab rows, not corpus rows; the
    round count is the caller's n_merges, a constant (~10k in real
    tokenizers).

    Word tables at or below ``driver_limit`` rows run the merge rounds
    driver-resident (the CC/k_core/pagerank small-state precedent:
    every distributed round is two sort barriers, ~1.5 s of fixed
    orchestration, against milliseconds of in-memory pair counting on
    a bounded vocabulary); identical tie-breaks, identical output.
    Pass ``driver_limit=0`` to force the distributed rounds."""
    from kgflow.ops.shuffle import bucketed_group_reduce, global_topk

    def word_counts(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(r"\w+").explode().dropna()
        vc = toks.value_counts()
        return pd.DataFrame(
            {"word": vc.index.to_numpy(), "n": vc.to_numpy(dtype=np.int64)}
        )

    def sum_counts(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("word", as_index=False, sort=False)["n"].sum()

    vocab = bucketed_group_reduce(
        docs.select_columns(["text"]).map_batches(word_counts, batch_format="pandas"),
        key_cols=["word"],
        reduce_fn=sum_counts,
        num_buckets=num_buckets,
    )

    if driver_limit > 0:
        vocab = vocab.materialize()
        if vocab.count() <= driver_limit:
            return _bpe_merges_driver(vocab.to_pandas(), n_merges)

    def to_symbols(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"syms": [list(w) for w in df["word"]], "n": df["n"].to_numpy()}
        )

    cur = vocab.map_batches(to_symbols, batch_format="pandas").materialize()
    merges: list[tuple[int, str, str, int]] = []

    for rank in range(1, n_merges + 1):

        def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
            rows: dict[tuple[str, str], int] = {}
            for syms, n in zip(df["syms"], df["n"]):
                for a, b in zip(syms, syms[1:]):
                    rows[(a, b)] = rows.get((a, b), 0) + int(n)
            if not rows:
                return pd.DataFrame(
                    {
                        "left": pd.Series([], dtype=object),
                        "right": pd.Series([], dtype=object),
                        "c": pd.Series([], dtype="int64"),
                    }
                )
            ks = list(rows)
            return pd.DataFrame(
                {
                    "left": [a for a, _ in ks],
                    "right": [b for _, b in ks],
                    "c": np.fromiter(rows.values(), dtype=np.int64, count=len(ks)),
                }
            )

        def pair_sum(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(["left", "right"], as_index=False, sort=False)["c"].sum()

        pairs = bucketed_group_reduce(
            cur.map_batches(pair_partial, batch_format="pandas"),
            key_cols=["left", "right"],
            reduce_fn=pair_sum,
            num_buckets=num_buckets,
        )
        top = global_topk(
            pairs, sort_cols=["c", "left", "right"],
            ascending=[False, True, True], k=1,
        ).to_pandas()
        if not len(top):
            break
        left, right, c = top["left"].iloc[0], top["right"].iloc[0], int(top["c"].iloc[0])
        merges.append((rank, left, right, c))

        def apply_merge(df: pd.DataFrame, _l=left, _r=right) -> pd.DataFrame:
            out = []
            for syms in df["syms"]:
                merged = []
                i = 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == _l and syms[i + 1] == _r:
                        merged.append(_l + _r)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                out.append(merged)
            return pd.DataFrame({"syms": out, "n": df["n"].to_numpy()})

        cur = cur.map_batches(apply_merge, batch_format="pandas").materialize()

    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])


def _bpe_merges_driver(vocab: pd.DataFrame, n_merges: int) -> pd.DataFrame:
    """Driver-resident BPE rounds over a bounded (word, n) table —
    same pair counts, same (count DESC, left ASC, right ASC)
    tie-break, same merge apply as the distributed rounds, minus the
    per-round sort barriers."""
    syms = [list(w) for w in vocab["word"]]
    ns = vocab["n"].to_numpy(dtype=np.int64)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for s, n in zip(syms, ns):
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + int(n)
        if not counts:
            break
        (left, right), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, c))
        for i, s in enumerate(syms):
            if left not in s:
                continue
            merged = []
            j = 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == left and s[j + 1] == right:
                    merged.append(left + right)
                    j += 2
                else:
                    merged.append(s[j])
                    j += 1
            syms[i] = merged
    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"])


def winnow_fingerprints(
    docs: "rd.Dataset", window: int = 16, winnow: int = 8
) -> "rd.Dataset":
    """Winnowing fingerprint selection (Schleimer-Wilkerson-Aiken,
    SIGMOD 2003 — the MOSS algorithm): over the stream of ``window``-
    token rolling hashes, keep the DISTINCT set of minima of every
    ``winnow`` consecutive hashes. Guarantees a selected fingerprint
    in every winnow-length stretch (coverage) while keeping the
    per-doc set small — the robust local-fingerprint scheme for
    plagiarism/near-dup evidence, strictly stronger than the single
    global-min fingerprint (`rolling_fingerprint`, whose hash
    convention this shares — keep in lockstep).

    Emits (doc_id, fp) distinct rows; docs with no tokens emit
    nothing. Vectorized: per doc one cumulative-power pass builds the
    window hashes, one stride-view sliding min selects; the exchange
    is the output rows themselves (set-bounded: ≤ positions/winnow
    per doc), no shuffle."""
    B = np.uint64(1099511628211)

    def f(batch: pa.Table) -> pa.Table:
        cache: dict = {}
        ids_out: list[int] = []
        fps_out: list[np.ndarray] = []
        ids = batch.column("doc_id").to_pylist()
        for i, t in enumerate(batch.column("text").to_pylist()):
            toks = re.findall(_WORD_RE, t)
            if not toks:
                continue
            hs = np.fromiter(
                (cache.setdefault(w, hash_token(w)) for w in toks),
                dtype=np.uint64,
                count=len(toks),
            )
            with np.errstate(over="ignore"):  # wrapping uint64 by design
                if len(hs) < window:
                    acc = np.uint64(0)
                    for h in hs:
                        acc = acc * B + h
                    ws = np.array([acc], dtype=np.uint64)
                else:
                    ws = np.zeros(len(hs) - window + 1, dtype=np.uint64)
                    for w in range(window):
                        ws = ws * B + hs[w : w + len(ws)]
            if len(ws) <= winnow:
                sel = np.array([ws.min()], dtype=np.uint64)
            else:
                sel = np.lib.stride_tricks.sliding_window_view(ws, winnow).min(
                    axis=1
                )
            sel = np.unique(sel)
            ids_out.extend([ids[i]] * len(sel))
            fps_out.append(sel)
        fp = (
            np.concatenate(fps_out).astype(np.int64)
            & np.int64(0x7FFFFFFFFFFFFFFF)
            if fps_out
            else np.array([], dtype=np.int64)
        )
        return pa.table(
            {
                "doc_id": pa.array(ids_out, pa.int64()),
                "fp": pa.array(fp),
            }
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def winnow_pairs(
    docs: "rd.Dataset",
    min_shared: int = 2,
    window: int = 16,
    winnow: int = 8,
    max_bucket: int = 2_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """MOSS similarity detection: document pairs sharing ≥
    ``min_shared`` winnowing fingerprints, with the exact shared
    count — local-fingerprint evidence that survives reordering and
    insertion (unlike the single global-min `rolling_fingerprint`).

    Scale shape: `winnow_fingerprints` emits set-bounded (doc_id, fp)
    rows; ONE fp-keyed exchange pairs co-fingerprinted docs (hot
    fingerprints — boilerplate — capped at ``max_bucket`` with a
    logged drop, the minhash-bucket rule); ONE pair-keyed count
    reduce. Only 16-byte id pairs ride the exchanges, never text."""
    from kgflow.ops.dedup import _segment_pair_indices
    from kgflow.ops.shuffle import bucketed_group_reduce

    fps = winnow_fingerprints(docs, window=window, winnow=winnow)

    EMPTY = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
        }
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return EMPTY.copy()
        g = g.sort_values(["fp", "doc_id"], kind="mergesort")
        v = g["fp"].to_numpy()
        new_seg = np.empty(len(g), dtype=bool)
        new_seg[0] = True
        new_seg[1:] = v[1:] != v[:-1]
        i_idx, j_idx, keep_rows = _segment_pair_indices(
            new_seg, max_bucket, "winnow_pairs"
        )
        ids = g["doc_id"].to_numpy(dtype=np.int64)
        if keep_rows is not None:
            ids = ids[keep_rows]
        if not len(i_idx):
            return EMPTY.copy()
        return pd.DataFrame({"doc_a": ids[i_idx], "doc_b": ids[j_idx]})

    def count_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["doc_a", "doc_b"], as_index=False, sort=False).size()
        out = out.rename(columns={"size": "n_shared"})
        return out[out["n_shared"] >= min_shared]

    cand = bucketed_group_reduce(
        fps, key_cols=["fp"], reduce_fn=pairs, num_buckets=num_buckets
    )
    return bucketed_group_reduce(
        cand, key_cols=["doc_a", "doc_b"], reduce_fn=count_pairs,
        num_buckets=num_buckets,
    )


def dsir_scores(
    docs: "rd.Dataset",
    target_source: str,
    n_buckets: int = 1024,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """DSIR-style hashed-n-gram importance score per document — the
    data-selection weight of Xie, Santurkar, Ma & Liang 2023 ("Data
    Selection for Language Models via Importance Resampling"), in its
    exactly-checkable hashed-UNIGRAM form: tokens hash into
    ``n_buckets`` feature buckets (FNV-1a over codepoints — the same
    fold the simhash / feature-hash oracles replicate in DuckDB
    HUGEINT arithmetic), the TARGET slice (``source == target_source``)
    and the WHOLE pool induce add-one-smoothed bucket distributions,
    and every document scores

        dsir_score = Σ_tokens [ ln(t_b + 1) − ln(p_b + 1) ]
                     − n_tokens · ( ln(T + B) − ln(P + B) )

    i.e. the log importance weight log( P_target(doc) / P_pool(doc) )
    under the bucket-multinomial model (t_b / p_b = bucket counts,
    T / P = total token counts, B = ``n_buckets``). Output:
    (doc_id, n_tokens, dsir_score); token-less documents drop.

    Scale shape: pass 1 reduces per-batch to ≤ B (bucket, t, p) rows
    before ONE bucket-keyed exchange that is ≤ B rows total; the
    B-row distribution table is pulled to the driver (bounded by the
    ``n_buckets`` PARAMETER, not the data) and broadcast via
    ``ray.put``; pass 2 is a pure map — the corpus itself never
    shuffles. Every per-token term is a function of exact int64
    counts, so engine and SQL disagree only in float summation order
    (within the 1e-6 comparator, like doc_perplexity)."""
    import ray

    from kgflow.ops.shuffle import bucketed_group_reduce
    from kgflow.ops.sketch import _fnv1a_strings

    B = int(n_buckets)

    def _doc_buckets(df: pd.DataFrame) -> tuple[pd.Series, np.ndarray]:
        """Exploded (doc_id-indexed) tokens → feature-bucket ids."""
        toks = (
            df.set_index("doc_id")["text"]
            .str.lower()
            .str.findall(_WORD_RE)
            .explode()
            .dropna()
        )
        if not len(toks):
            return toks, np.empty(0, dtype=np.int64)
        uniq, inv = np.unique(toks.to_numpy(dtype=object).astype(str), return_inverse=True)
        b_uniq = (_fnv1a_strings(uniq) % np.uint64(B)).astype(np.int64)
        return toks, b_uniq[inv]

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks, b = _doc_buckets(df)
        if not len(b):
            return pd.DataFrame(
                {
                    "b": pd.Series([], dtype="int64"),
                    "t": pd.Series([], dtype="int64"),
                    "p": pd.Series([], dtype="int64"),
                }
            )
        is_tgt = (
            df.set_index("doc_id")["source"].reindex(toks.index).to_numpy()
            == target_source
        )
        p = np.bincount(b, minlength=B)
        t = np.bincount(b[is_tgt], minlength=B)
        nz = np.flatnonzero(p)
        return pd.DataFrame(
            {"b": nz.astype(np.int64), "t": t[nz], "p": p[nz]}
        )

    def count_sum(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("b", as_index=False)[["t", "p"]].sum()
        out["t"] = out["t"].astype("int64")
        out["p"] = out["p"].astype("int64")
        return out

    counts = bucketed_group_reduce(
        docs.select_columns(["doc_id", "text", "source"]).map_batches(
            count_partial, batch_format="pandas"
        ),
        key_cols=["b"],
        reduce_fn=count_sum,
        num_buckets=num_buckets,
    ).to_pandas()  # ≤ n_buckets rows by construction

    t = np.zeros(B, dtype=np.int64)
    p = np.zeros(B, dtype=np.int64)
    t[counts["b"].to_numpy()] = counts["t"].to_numpy()
    p[counts["b"].to_numpy()] = counts["p"].to_numpy()
    lr = np.log(t + 1.0) - np.log(p + 1.0)
    const = float(np.log(t.sum() + B) - np.log(p.sum() + B))
    ref = ray.put(lr)

    class Score:
        def __init__(self):
            self.lr = ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            toks, b = _doc_buckets(df)
            if not len(b):
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "n_tokens": pd.Series([], dtype="int64"),
                        "dsir_score": pd.Series([], dtype="float64"),
                    }
                )
            g = (
                pd.DataFrame({"doc_id": toks.index, "s": self.lr[b]})
                .groupby("doc_id", as_index=False)
                .agg(n_tokens=("s", "size"), dsir_score=("s", "sum"))
            )
            g["n_tokens"] = g["n_tokens"].astype(np.int64)
            g["dsir_score"] = g["dsir_score"] - g["n_tokens"] * const
            return g

    return docs.select_columns(["doc_id", "text", "source"]).map_batches(
        Score, batch_format="pandas", concurrency=(1, 4)
    )


def source_mix_weights(
    docs: "rd.Dataset",
    alpha: float = 0.3,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Temperature-based mixture reweighting — the multilingual/
    multi-source corpus sampling rule of Lample & Conneau 2019 (XLM)
    and mC4 (Xue et al. 2021): a source with n_s tokens samples with
    probability ∝ n_s^alpha (alpha<1 up-weights low-resource
    sources). Returns (source, n_tokens, weight) with
    weight = n_s^alpha / Σ_s n_s^alpha.

    Scale shape: per-batch (source, token-count) combiner → ONE
    source-keyed bucketed sum (source-bounded — domains at web scale,
    still ≪ corpus); the normalizer Σ n^alpha is ONE scalar aggregate
    broadcast into a map — no driver pull of the source table. The
    only floats are pow/divide on exact int64 counts (1e-6 comparator
    grade)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = (
            df["text"].str.lower().str.count(_WORD_RE).astype(np.int64)
        )
        g = pd.DataFrame({"source": df["source"], "n_tokens": n})
        return g.groupby("source", as_index=False)["n_tokens"].sum()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("source", as_index=False)["n_tokens"].sum()
        out["n_tokens"] = out["n_tokens"].astype("int64")
        return out

    counts = bucketed_group_reduce(
        docs.select_columns(["source", "text"]).map_batches(
            partial, batch_format="pandas"
        ),
        key_cols=["source"],
        reduce_fn=final,
        num_buckets=num_buckets,
    ).materialize()  # source-bounded; consumed by the sum AND the map

    denom = counts.map_batches(
        lambda d: pd.DataFrame(
            {"s": [np.power(d["n_tokens"].to_numpy(np.float64), alpha).sum()]}
        ),
        batch_format="pandas",
    ).sum("s")

    def weigh(d: pd.DataFrame) -> pd.DataFrame:
        w = np.power(d["n_tokens"].to_numpy(np.float64), alpha) / denom
        return pd.DataFrame(
            {"source": d["source"], "n_tokens": d["n_tokens"], "weight": w}
        )

    return counts.map_batches(weigh, batch_format="pandas")


def zipf_alpha(
    docs: "rd.Dataset",
    k: int = 50,
    num_buckets: int | None = None,
) -> pd.DataFrame:
    """Zipf tail exponent of the corpus vocabulary via the Hill
    estimator (Hill 1975) over the top-``k`` token frequencies:
    alpha = 1 + k / Σ_{i=1..k} ln(f_i / f_{k+1}) — the standard check
    that a corpus' token distribution has the expected power-law tail
    (sanity signal for crawl mixes and synthetic-data detection).
    Returns one row (k, f_kplus1, alpha).

    Scale shape: the vocabulary pass is the `vocab_topk` combiner
    (per-block distinct shrink before the token-keyed exchange); the
    k+1 head rows come from the same semigroup top-k, so nothing
    larger than blocks×(k+1) crosses the final exchange. Ties at the
    boundary break (n DESC, token ASC) on both engines."""
    head = vocab_topk(docs, k=k + 1, num_buckets=num_buckets).to_pandas()
    if len(head) < k + 1:
        raise ValueError(
            f"zipf_alpha needs at least k+1={k + 1} distinct tokens; "
            f"corpus has {len(head)}"
        )
    f = head["n"].to_numpy(np.float64)
    tail = f[k]
    alpha = 1.0 + k / float(np.log(f[:k] / tail).sum())
    return pd.DataFrame(
        [{"k": np.int64(k), "f_kplus1": np.int64(tail), "alpha": alpha}]
    )


def apportion_budget(
    docs: "rd.Dataset",
    budget: int = 10_000,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Exact largest-remainder (Hamilton) apportionment of an epoch
    sampling budget across sources, proportional to token counts —
    the integer artifact a mixture-sampling pipeline actually executes
    ("draw quota_s examples from source s this epoch"). Every source's
    quota is floor(n_s·B / T) plus one extra for the B − Σfloor
    largest integer remainders (n_s·B mod T; ties break source ASC),
    so Σ quota == budget EXACTLY and the whole row is int64 —
    hash-stable with no float anywhere (contrast `source_mix_weights`,
    whose pow() weights are the alpha<1 generalization but float).
    Returns (source, n_tokens, quota).

    Scale shape: same source-bounded count reduce as
    `source_mix_weights`; the apportionment itself needs the GLOBAL
    total and remainder ranking, computed in one pass over the
    source-bounded table (a single bucket — sources ≪ corpus; at
    web scale with 1e8 domains, shard the floor pass and rank only
    the top B remainders via `global_topk`)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    if budget <= 0:
        raise ValueError("budget must be positive")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n = df["text"].str.lower().str.count(_WORD_RE).astype(np.int64)
        g = pd.DataFrame({"source": df["source"], "n_tokens": n})
        return g.groupby("source", as_index=False)["n_tokens"].sum()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("source", as_index=False)["n_tokens"].sum()
        out["n_tokens"] = out["n_tokens"].astype("int64")
        return out

    counts = bucketed_group_reduce(
        docs.select_columns(["source", "text"]).map_batches(
            partial, batch_format="pandas"
        ),
        key_cols=["source"],
        reduce_fn=final,
        num_buckets=num_buckets,
    )

    def apportion(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("source").reset_index(drop=True)
        n = g["n_tokens"].to_numpy(dtype=np.int64).astype(object)  # py ints: no overflow
        total = sum(n)
        if total == 0:
            raise ValueError("apportion_budget: corpus has no tokens")
        prod = [int(x) * budget for x in n]
        floors = np.array([p // total for p in prod], dtype=np.int64)
        rems = np.array([p % total for p in prod], dtype=np.int64)
        extra = budget - int(floors.sum())
        order = np.lexsort((np.arange(len(g)), -rems))  # rem DESC, source ASC
        quota = floors.copy()
        quota[order[:extra]] += 1
        return pd.DataFrame(
            {
                "source": g["source"],
                "n_tokens": g["n_tokens"].astype(np.int64),
                "quota": quota,
            }
        )

    # ONE single-bucket pass: the apportionment is a global rank over
    # the source-bounded table (see docstring for the 1e8-domain path)
    return bucketed_group_reduce(
        counts.map_batches(
            lambda d: d.assign(_g=np.int64(0)), batch_format="pandas"
        ),
        key_cols=["_g"],
        reduce_fn=lambda g: apportion(g.drop(columns=["_g"])),
        num_buckets=1,
    )


def chunk_documents(
    docs: "rd.Dataset",
    size: int = 64,
    stride: int = 48,
) -> "rd.Dataset":
    """RAG-style overlapping token chunking: lowercase ``\\w+`` tokens,
    chunk c covers tokens [c·stride, c·stride + size) for every
    c·stride < n_tokens → (doc_id, chunk_id, chunk_text, n_tokens),
    chunk_text the space-joined slice. Deterministic and exactly
    replayable in SQL (range() + list_slice + array_to_string), so the
    driver gate hash-checks the chunk text itself.

    Exchange-free (chunks never cross documents — the embarrassingly
    parallel shape): per batch, tokens explode ONCE with positions and
    each token replicates into the ≤ ceil(size/stride) chunks that
    cover it via vectorized index arithmetic; only the final per-chunk
    join assembles strings (one C-loop join per OUTPUT row, the same
    cost string_agg pays in SQL)."""
    if size < 1 or stride < 1:
        raise ValueError("chunk_documents: size and stride must be >= 1")
    n_cover = -(-size // stride)  # chunks covering one token

    def chunk(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "chunk_id": pd.Series([], dtype="int64"),
                "chunk_text": pd.Series([], dtype=object),
                "n_tokens": pd.Series([], dtype="int64"),
            }
        )
        if not len(df):
            return empty
        toks = df["text"].str.lower().str.findall(r"\w+")
        tx = toks.explode().dropna()
        if not len(tx):
            return empty
        doc_ids = df["doc_id"].to_numpy(dtype=np.int64)
        # map each exploded token back to its df ROW position once
        row_of = df.index.get_indexer(pd.Index(tx.index))
        pos = tx.groupby(level=0).cumcount().to_numpy(dtype=np.int64)
        tok_arr = tx.to_numpy(dtype=object)
        rows = {"doc": [], "chunk": [], "pos": [], "tok": []}
        base = pos // stride
        for j in range(n_cover):
            c = base - j
            ok = (c >= 0) & (pos - c * stride < size)
            rows["doc"].append(doc_ids[row_of[ok]])
            rows["chunk"].append(c[ok])
            rows["pos"].append(pos[ok])
            rows["tok"].append(tok_arr[ok])
        t = pd.DataFrame(
            {
                "doc_id": np.concatenate(rows["doc"]),
                "chunk_id": np.concatenate(rows["chunk"]),
                "pos": np.concatenate(rows["pos"]),
                "tok": np.concatenate(rows["tok"]),
            }
        ).sort_values(["doc_id", "chunk_id", "pos"], kind="mergesort")
        g = t.groupby(["doc_id", "chunk_id"], as_index=False).agg(
            chunk_text=("tok", " ".join), n_tokens=("tok", "size")
        )
        return g.astype(
            {"doc_id": "int64", "chunk_id": "int64", "n_tokens": "int64"}
        )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        chunk, batch_format="pandas"
    )


def bpe_encode(
    docs: "rd.Dataset",
    merges: pd.DataFrame,
    batch_size: int | None = None,
) -> "rd.Dataset":
    """Apply a trained BPE merge table (`bpe_merges` output) to encode
    the corpus — the second half of the tokenizer lifecycle
    (train → apply): per doc the long-format subword counts
    (doc_id, subword, cnt). Encoding a word replays the merges in
    rank order with the trainer's left-to-right scan, so
    encode(train_corpus) reproduces the trainer's final symbol table
    exactly (pinned in tests); concatenating a word's subwords always
    reconstructs the word (invariant-tested).

    Scale shape: exchange-FREE — an actor-pool stage; the merge table
    (vocab-bounded, ~10k rows in real tokenizers) ships ONCE per actor
    via ray.put, and the per-actor word→subwords cache means the
    per-word Python merge scan runs once per DISTINCT word per actor,
    not once per occurrence (the `langid`/PII compiled-state
    precedent). Output is (doc, distinct-subword)-bounded."""
    import ray

    ranked = [
        (str(l_), str(r_))
        for l_, r_ in merges.sort_values("rank")[["left", "right"]].values
    ]
    m_ref = ray.put(ranked)

    class BpeEncodeStage:
        def __init__(self, _m=m_ref):
            import re as _re

            self.merges: list[tuple[str, str]] = ray.get(_m)
            self.cache: dict[str, tuple[str, ...]] = {}
            self._wre = _re.compile(_WORD_RE)  # compiled once per actor

        def _encode(self, word: str) -> tuple[str, ...]:
            got = self.cache.get(word)
            if got is not None:
                return got
            syms = list(word)
            for l_, r_ in self.merges:
                i = 0
                out: list[str] = []
                while i < len(syms):
                    if (
                        i + 1 < len(syms)
                        and syms[i] == l_
                        and syms[i + 1] == r_
                    ):
                        out.append(l_ + r_)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            enc = tuple(syms)
            self.cache[word] = enc
            return enc

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            ids: list[int] = []
            subs: list[str] = []
            for doc_id, text in zip(df["doc_id"], df["text"]):
                words = self._wre.findall(str(text).lower())
                for w in words:
                    for s_ in self._encode(w):
                        ids.append(int(doc_id))
                        subs.append(s_)
            if not ids:
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series([], dtype="int64"),
                        "subword": pd.Series([], dtype="object"),
                        "cnt": pd.Series([], dtype="int64"),
                    }
                )
            out = pd.DataFrame({"doc_id": ids, "subword": subs})
            g = out.groupby(["doc_id", "subword"], as_index=False).size()
            return g.rename(columns={"size": "cnt"}).astype(
                {"doc_id": "int64", "cnt": "int64"}
            )

    return docs.select_columns(["doc_id", "text"]).map_batches(
        BpeEncodeStage,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


#: RAKE stopword list (Rose et al. 2010 use the Fox 1989 list; this is
#: the high-frequency English function-word core of it, shared VERBATIM
#: with the SQL oracle so both sides split phrases identically).
RAKE_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "from", "has", "have", "in", "is", "it", "its", "of", "on", "or",
    "that", "the", "this", "to", "was", "were", "will", "with", "not",
    "he", "she", "they", "we", "you", "i",
)


def rake_keyphrases(
    docs: "rd.Dataset",
    top_k: int = 3,
    stopwords: tuple[str, ...] = RAKE_STOPWORDS,
    scale: int = 1_000_000,
) -> "rd.Dataset":
    """RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    are maximal runs of non-stopword tokens; each word scores
    deg(w)/freq(w) where deg sums the lengths of the phrase occurrences
    containing w and freq counts w's occurrences — both per DOCUMENT
    (classic RAKE is document-local, embarrassingly parallel: NO
    exchange, one vectorized pass per batch). A phrase scores the sum
    of its tokens' floor-scaled terms (scale·deg // freq — pure int64,
    hash-exact vs SQL). Output: (doc_id, phrase, score, rank) — top_k
    phrases per doc by (score desc, phrase asc), identical phrase
    strings deduplicated."""
    stop = frozenset(stopwords)
    EMPTY = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype=np.int64),
            "phrase": pd.Series([], dtype=object),
            "score": pd.Series([], dtype=np.int64),
            "rank": pd.Series([], dtype=np.int64),
        }
    )

    def per_batch(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].astype(str).str.lower().str.findall(r"\w+")
        ex = toks.explode().dropna()
        if not len(ex):
            return EMPTY.copy()
        t = pd.DataFrame(
            {
                "doc_id": df["doc_id"].reindex(ex.index).to_numpy(),
                "w": ex.to_numpy(dtype=object),
            }
        )
        t["stop"] = t["w"].isin(stop)
        t["pid"] = t.groupby("doc_id", sort=False)["stop"].cumsum()
        t = t[~t["stop"]]
        if not len(t):
            return EMPTY.copy()
        # phrase length per occurrence; per-doc word deg/freq
        t["plen"] = t.groupby(["doc_id", "pid"], sort=False)[
            "w"
        ].transform("size")
        wd = t.groupby(["doc_id", "w"], sort=False).agg(
            deg=("plen", "sum"), freq=("plen", "size")
        )
        t = t.join(wd, on=["doc_id", "w"])
        t["term"] = (scale * t["deg"].to_numpy(dtype=np.int64)) // t[
            "freq"
        ].to_numpy(dtype=np.int64)
        ph = t.groupby(["doc_id", "pid"], sort=False).agg(
            phrase=("w", " ".join), score=("term", "sum")
        )
        ph = ph.reset_index().drop(columns=["pid"])
        # identical phrase strings in one doc score identically: dedup
        ph = ph.groupby(["doc_id", "phrase"], as_index=False, sort=False)[
            "score"
        ].min()
        ph = ph.sort_values(
            ["doc_id", "score", "phrase"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        ph["rank"] = (
            ph.groupby("doc_id", sort=False).cumcount() + 1
        ).astype(np.int64)
        out = ph[ph["rank"] <= top_k].reset_index(drop=True)
        out["score"] = out["score"].astype(np.int64)
        out["doc_id"] = out["doc_id"].astype(np.int64)
        return out

    return docs.select_columns(["doc_id", "text"]).map_batches(
        per_batch, batch_format="pandas"
    )


def gazetteer_spot(
    docs: "rd.Dataset",
    phrases: "rd.Dataset",
    phrase_col: str = "phrase",
    max_words: int = 8,
    fingerprint: bool = False,
) -> "rd.Dataset":
    """Gazetteer entity spotting: find every token-aligned occurrence
    of a dictionary phrase in every document — the KG mention-candidate
    generator for closed-world lexicons. Returns
    (doc_id, pos, phrase): 1-based token position of each match.

    Scale shape: the lexicon is a DATASET side of an equi-join, not a
    per-actor automaton — a 10⁸-name gazetteer rides the shuffle join
    (`kgflow.ops.joins.hash_join` auto-broadcasts small lexicons and
    hash-partitions big ones), which is the distributed substitute for
    Aho-Corasick. Docs emit (doc_id, pos, gram) n-gram rows ONLY for
    the word lengths the lexicon actually contains (distinct lengths
    are pulled to the driver — bounded by ``max_words``, not data) via
    one vectorized shift pass per length. ``fingerprint=True`` is the
    very-large-scale mode that promise referred to: both sides join on
    a 64-bit FNV fingerprint of the gram (8-byte shuffle keys instead
    of arbitrary-length strings) and verify each joined row against a
    SECOND independently-salted 64-bit fingerprint — a false match
    must defeat both (≈2⁻¹²⁸), with the lexicon phrase string attached
    from the SMALL side only. Output is identical to string mode
    (parity-tested); shuffle bytes stop scaling with phrase length."""
    from kgflow.ops.joins import hash_join

    def prep_phrases(df: pd.DataFrame) -> pd.DataFrame:
        # explicit typed-empty: Ray surfaces zero-row pandas blocks with
        # NO columns, and the lengths pull below needs the 'l' column
        if phrase_col not in df.columns or not len(df):
            return pd.DataFrame(
                {
                    "gram": pd.Series([], dtype=object),
                    "l": pd.Series([], dtype=np.int64),
                }
            )
        p = (
            df[phrase_col]
            .astype(str)
            .str.lower()
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
        )
        ln = p.str.count(" ") + 1
        out = pd.DataFrame({"gram": p, "l": ln.astype(np.int64)})
        return out[(out["l"] >= 1) & (out["l"] <= max_words)]

    lex = phrases.map_batches(prep_phrases, batch_format="pandas")
    ldf = (
        lex.select_columns(["l"])
        .map_batches(
            lambda df: df.drop_duplicates(), batch_format="pandas"
        )
        .to_pandas()
    )  # ≤ max_words rows — driver-bounded (empty lexicon → no columns)
    lengths = (
        sorted(ldf["l"].unique().tolist()) if "l" in ldf.columns else []
    )
    if not lengths:
        return docs.map_batches(
            lambda df: pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "pos": pd.Series([], dtype=np.int64),
                    "phrase": pd.Series([], dtype=object),
                }
            ),
            batch_format="pandas",
        )

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].astype(str).str.lower().str.findall(r"\w+")
        ex = toks.explode().dropna()
        if not len(ex):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "pos": pd.Series([], dtype=np.int64),
                    "gram": pd.Series([], dtype=object),
                }
            )
        did = df["doc_id"].reindex(ex.index).to_numpy(dtype=np.int64)
        w = ex.to_numpy(dtype=object)
        pos = (
            pd.Series(np.ones(len(ex), dtype=np.int64))
            .groupby(ex.index, sort=False)
            .cumsum()
            .to_numpy()
        )
        outs = []
        for L in lengths:
            if L == 1:
                outs.append(
                    pd.DataFrame({"doc_id": did, "pos": pos, "gram": w})
                )
                continue
            if len(w) < L:
                continue
            # windows that would cross a document boundary are dropped
            n = len(w) - L + 1
            ok = np.ones(n, dtype=bool)
            g = pd.Series(w[:n], dtype=object)
            for k in range(1, L):
                ok &= did[k : n + k] == did[:n]
                g = g + " " + pd.Series(w[k : n + k], dtype=object)
            outs.append(
                pd.DataFrame(
                    {
                        "doc_id": did[:n][ok],
                        "pos": pos[:n][ok],
                        "gram": g.to_numpy(dtype=object)[ok],
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    cand = docs.select_columns(["doc_id", "text"]).map_batches(
        grams, batch_format="pandas"
    )

    if not fingerprint:
        joined = hash_join(cand, lex.select_columns(["gram"]), on="gram")

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].astype(np.int64),
                    "pos": df["pos"].astype(np.int64),
                    "phrase": df["gram"],
                }
            )

        return joined.map_batches(finish, batch_format="pandas")

    from kgflow.ops.sketch import _fnv1a_strings

    def fp_pair(vals: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        a = np.asarray(vals, dtype=str)
        f1 = _fnv1a_strings(a).view(np.int64)
        f2 = _fnv1a_strings(np.char.add("\x01", a)).view(np.int64)
        return f1, f2

    def cand_fp(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "pos": pd.Series([], dtype=np.int64),
                    "fp": pd.Series([], dtype=np.int64),
                    "fp2": pd.Series([], dtype=np.int64),
                }
            )
        f1, f2 = fp_pair(df["gram"])
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "pos": df["pos"].astype(np.int64),
                "fp": f1,
                "fp2": f2,
            }
        )

    def lex_fp(df: pd.DataFrame) -> pd.DataFrame:
        if "gram" not in df.columns or not len(df):
            return pd.DataFrame(
                {
                    "fp": pd.Series([], dtype=np.int64),
                    "lex_fp2": pd.Series([], dtype=np.int64),
                    "phrase": pd.Series([], dtype=object),
                }
            )
        f1, f2 = fp_pair(df["gram"])
        return pd.DataFrame(
            {"fp": f1, "lex_fp2": f2, "phrase": df["gram"]}
        )

    joined = hash_join(
        cand.map_batches(cand_fp, batch_format="pandas"),
        lex.select_columns(["gram"]).map_batches(
            lex_fp, batch_format="pandas"
        ),
        on="fp",
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["fp2"].to_numpy(np.int64) == df["lex_fp2"].to_numpy(
            np.int64
        )
        df = df[ok]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "pos": df["pos"].astype(np.int64),
                "phrase": df["phrase"],
            }
        )

    return joined.map_batches(verify, batch_format="pandas")
