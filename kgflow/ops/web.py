"""Crawl-side web analytics over the pages table
(url, warc_ts, html, text, lang) — the input-hint schema: URL
canonicalization, re-crawl snapshot dedup (keep the newest capture
per canonical URL), and per-domain crawl statistics. These are the
frontier/dedup priors a Common-Crawl-style ingest runs BEFORE any
text processing: canonical-URL dedup alone removes the bulk of
re-crawl duplicates without touching document bytes.

All stages are vectorized `pandas.Series.str` kernels over the
URL/timestamp columns only (`html`/`text` never enter these ops);
the snapshot dedup's one exchange carries (canon, url, ts) triples,
never payloads.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

#: query parameters dropped by canonical_urls — the standard tracking
#: params (Google/Facebook click ids, UTM campaign tags)
TRACKING_PARAMS = ("utm_source", "utm_medium", "utm_campaign", "utm_term",
                   "utm_content", "gclid", "fbclid")


def _canonicalize(urls: pd.Series) -> pd.Series:
    """Vectorized URL canonical form:

    - scheme and host lowercased
    - default ports stripped (:80 for http, :443 for https)
    - fragment dropped
    - tracking query params (TRACKING_PARAMS) dropped; survivors kept
      in ORIGINAL order (param order is semantic for some endpoints);
      an emptied query string drops its '?'
    - trailing slash stripped from non-root paths
    """
    # positional index: explode+groupby(level=0) below must key on a
    # unique per-row label regardless of the caller's batch index
    s = urls.astype(str).reset_index(drop=True)
    parts = s.str.extract(
        r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?P<host>[^/?#]+)"
        r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
    )
    scheme = parts["scheme"].str.lower().fillna("")
    host = parts["host"].str.lower().fillna("")
    host = host.where(
        ~((scheme == "http") & host.str.endswith(":80")),
        host.str.replace(r":80$", "", regex=True),
    )
    host = host.where(
        ~((scheme == "https") & host.str.endswith(":443")),
        host.str.replace(r":443$", "", regex=True),
    )
    path = parts["path"].fillna("")
    path = path.where(path == "/", path.str.replace(r"/$", "", regex=True))
    path = path.where(path != "", "/")

    # query params: explode once, filter by key, groupby-rejoin — C
    # kernels throughout (no per-row Python on the page hot path)
    q = parts["query"]
    nonempty = q[q.notna() & (q != "")]
    query = pd.Series("", index=q.index, dtype=object)
    if len(nonempty):
        ex = nonempty.str.split("&").explode()
        keys = ex.str.split("=", n=1).str[0]
        kept = ex[~keys.isin(TRACKING_PARAMS)]
        if len(kept):
            query.update(kept.groupby(level=0).agg("&".join))
    out = scheme + "://" + host + path + np.where(query != "", "?" + query, "")
    # rows that did not parse as absolute URLs pass through unchanged
    return pd.Series(
        np.where(scheme == "", s.to_numpy(), out), index=urls.index
    )


def canonical_urls(pages: "rd.Dataset") -> "rd.Dataset":
    """(url, canon_url): the canonical form of every page URL —
    exchange-free map over the url column only."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"url": df["url"], "canon_url": _canonicalize(df["url"])}
        )

    return pages.select_columns(["url"]).map_batches(f, batch_format="pandas")


def latest_snapshots(pages: "rd.Dataset", num_buckets: int | None = None) -> "rd.Dataset":
    """Re-crawl dedup: one row per canonical URL — the capture with the
    NEWEST warc_ts (ties break url DESC, a total order) plus the number
    of captures folded in: (canon_url, url, warc_ts, n_snapshots).
    The caller semi-joins the winner urls back to the pages table for
    payloads; only (canon, url, int64-ts) triples ride the exchange.

    This is the first dedup pass of a crawl ingest — canonical-URL
    collapse removes re-crawls and tracking-param aliases before any
    content hashing."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame(
            {
                "canon_url": _canonicalize(df["url"]),
                "url": df["url"],
                "ts_us": df["warc_ts"].astype("datetime64[us]").astype(np.int64),
            }
        )
        # per-batch combiner: keep each canon's local winner + count
        d = d.sort_values(["canon_url", "ts_us", "url"])
        g = d.groupby("canon_url", as_index=False).agg(
            url=("url", "last"), ts_us=("ts_us", "last"), n=("url", "size")
        )
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["canon_url", "ts_us", "url"])
        out = g.groupby("canon_url", as_index=False).agg(
            url=("url", "last"), ts_us=("ts_us", "last"), n=("n", "sum")
        )
        return pd.DataFrame(
            {
                "canon_url": out["canon_url"],
                "url": out["url"],
                "warc_ts": out["ts_us"].astype("datetime64[us]"),
                "n_snapshots": out["n"].astype(np.int64),
            }
        )

    return bucketed_group_reduce(
        pages.select_columns(["url", "warc_ts"]).map_batches(
            partial, batch_format="pandas"
        ),
        key_cols=["canon_url"],
        reduce_fn=final,
        num_buckets=num_buckets,
    )


def domain_stats(pages: "rd.Dataset", num_buckets: int | None = None) -> "rd.Dataset":
    """Per-domain crawl statistics: (domain, n_pages, first_ts, last_ts,
    n_langs) — the domain-level priors (crawl breadth, freshness,
    language mix) a frontier scheduler and per-domain quality gates
    consume. One (domain, lang)-grain combiner per batch, ONE
    domain-keyed exchange of count/min/max rows."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        host = (
            df["url"]
            .astype(str)
            .str.extract(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)")[0]
            .str.lower()
            .fillna("")
        )
        ts = df["warc_ts"].astype("datetime64[us]").astype(np.int64)
        d = pd.DataFrame(
            {"domain": host, "lang": df["lang"], "ts_us": ts}
        )
        return d.groupby(["domain", "lang"], as_index=False).agg(
            n=("ts_us", "size"), mn=("ts_us", "min"), mx=("ts_us", "max")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        per_lang = g.groupby(["domain", "lang"], as_index=False).agg(
            n=("n", "sum"), mn=("mn", "min"), mx=("mx", "max")
        )
        out = per_lang.groupby("domain", as_index=False).agg(
            n_pages=("n", "sum"),
            first_ts=("mn", "min"),
            last_ts=("mx", "max"),
            n_langs=("lang", "nunique"),
        )
        return pd.DataFrame(
            {
                "domain": out["domain"],
                "n_pages": out["n_pages"].astype(np.int64),
                "first_ts": out["first_ts"].astype("datetime64[us]"),
                "last_ts": out["last_ts"].astype("datetime64[us]"),
                "n_langs": out["n_langs"].astype(np.int64),
            }
        )

    return bucketed_group_reduce(
        pages.select_columns(["url", "warc_ts", "lang"]).map_batches(
            partial, batch_format="pandas"
        ),
        key_cols=["domain"],
        reduce_fn=final,
        num_buckets=num_buckets,
    )


def edge_evidence(
    canon: "rd.Dataset",
    pages: "rd.Dataset",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Evidence aggregation for canonicalized triples — the
    KG-construction QA signal separating a fact asserted by 40 pages
    of ONE domain from one asserted across five independent domains:
    per canonical edge (subj_id, rel_id, obj_id) return
    (subj_canonical, rel, obj_canonical, weight, n_domains, first_ts,
    last_ts) where weight counts supporting triple OCCURRENCES,
    n_domains counts DISTINCT source domains, and first/last_ts bound
    the supporting captures' warc timestamps (microseconds since
    epoch).

    Scale shape: page metadata reduces to (url, domain, ts) before the
    ONE url-keyed join against triple occurrences (auto broadcast vs
    shuffle via `hash_join` — the metadata side is page-bounded, never
    html/text-bearing); per-block combiners collapse to
    (edge, domain) grain with min/max ts, so the edge-keyed exchange
    carries at most |edges|·|domains-per-edge| rows; the final reduce
    is a vectorized two-level groupby."""
    from kgflow.ops.joins import hash_join
    from kgflow.ops.shuffle import bucketed_group_reduce

    def page_meta(df: pd.DataFrame) -> pd.DataFrame:
        host = (
            df["url"]
            .astype(str)
            .str.extract(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)")[0]
            .str.lower()
            .fillna("")
        )
        return pd.DataFrame(
            {
                "url": df["url"].astype(str),
                "domain": host,
                "ts_us": df["warc_ts"]
                .astype("datetime64[us]")
                .astype(np.int64),
            }
        )

    meta = pages.select_columns(["url", "warc_ts"]).map_batches(
        page_meta, batch_format="pandas"
    )
    occ = canon.select_columns(
        [
            "subj_id",
            "rel_id",
            "obj_id",
            "subj_canonical",
            "rel",
            "obj_canonical",
            "url",
        ]
    )
    joined = hash_join(occ, meta, on="url")

    EDGE = [
        "subj_id",
        "rel_id",
        "obj_id",
        "subj_canonical",
        "rel",
        "obj_canonical",
    ]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby([*EDGE, "domain"], as_index=False).agg(
            w=("ts_us", "size"), mn=("ts_us", "min"), mx=("ts_us", "max")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        per_dom = g.groupby([*EDGE, "domain"], as_index=False).agg(
            w=("w", "sum"), mn=("mn", "min"), mx=("mx", "max")
        )
        out = per_dom.groupby(EDGE, as_index=False).agg(
            weight=("w", "sum"),
            n_domains=("domain", "nunique"),
            first_ts=("mn", "min"),
            last_ts=("mx", "max"),
        )
        return out.astype(
            {
                "weight": "int64",
                "n_domains": "int64",
                "first_ts": "int64",
                "last_ts": "int64",
            }
        )

    return bucketed_group_reduce(
        joined.map_batches(partial, batch_format="pandas"),
        key_cols=["subj_id", "rel_id", "obj_id"],
        reduce_fn=final,
        num_buckets=num_buckets,
    )


def functional_violations(
    edges: "rd.Dataset",
    functional_rels: "list[str]",
    subj_col: str = "subj_canonical",
    rel_col: str = "rel",
    obj_col: str = "obj_canonical",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Constraint audit for KG construction: a FUNCTIONAL relation
    (born_in, date_of_birth, capital_of …) admits at most one object
    per subject, so a subject asserting several is either an extraction
    error or entity-resolution debt. For every (subject, functional
    rel) with > 1 DISTINCT object, return
    (rel, subj, n_objects, objects_sample) where objects_sample holds
    up to 3 lexicographically-smallest conflicting objects joined by
    '|' (enough to eyeball the conflict without shipping the full
    object set).

    Scale shape: rows filter to the functional relations FIRST (the
    audit never touches the non-functional bulk); per-block combiners
    dedup (subj, rel, obj); ONE (rel, subj)-keyed exchange whose
    reduce counts distinct objects and keeps the bounded sample."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    rels = sorted(set(functional_rels))
    if not rels:
        raise ValueError("functional_violations: functional_rels is empty")

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        m = df[rel_col].isin(rels)
        d = df.loc[m, [subj_col, rel_col, obj_col]]
        return d.drop_duplicates().rename(
            columns={subj_col: "subj", rel_col: "rel", obj_col: "obj"}
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["rel", "subj", "obj"])
        g = g.sort_values(["rel", "subj", "obj"], kind="mergesort")
        agg = g.groupby(["rel", "subj"], as_index=False).agg(
            n_objects=("obj", "size"),
            objects_sample=("obj", lambda s: "|".join(s.iloc[:3])),
        )
        out = agg.loc[agg["n_objects"] > 1]
        return out.astype({"n_objects": "int64"})

    return bucketed_group_reduce(
        edges.select_columns([subj_col, rel_col, obj_col]).map_batches(
            prefilter, batch_format="pandas"
        ),
        key_cols=["rel", "subj"],
        reduce_fn=final,
        num_buckets=num_buckets,
    )


_HREF_RE = r'<a\s+[^>]*href="([^"]+)"[^>]*>([^<]*)</a>'


def extract_links(pages: "rd.Dataset") -> "rd.Dataset":
    """Anchor extraction from raw html — the crawl's link-graph feed:
    (src_url, href, anchor) per <a href="..."> tag, in document order.
    Vectorized: one pandas ``str.extractall`` (compiled C regex) per
    batch over the decoded html column; no per-row Python. The regex
    deliberately handles only well-formed double-quoted hrefs with
    text-only anchors — crawl-grade HTML needs a real parser behind
    the same signature (the multimodal codec precedent)."""

    def links(df: pd.DataFrame) -> pd.DataFrame:
        html = df["html"].apply(
            lambda b: b.decode("utf-8", "replace")
            if isinstance(b, (bytes, bytearray))
            else str(b)
        )
        m = html.str.extractall(_HREF_RE)
        if not len(m):
            return pd.DataFrame(
                {
                    "src_url": pd.Series([], dtype=object),
                    "href": pd.Series([], dtype=object),
                    "anchor": pd.Series([], dtype=object),
                }
            )
        src = df["url"].astype(str)
        return pd.DataFrame(
            {
                "src_url": src.reindex(
                    m.index.get_level_values(0)
                ).to_numpy(),
                "href": m[0].to_numpy(dtype=object),
                "anchor": m[1].to_numpy(dtype=object),
            }
        )

    return pages.select_columns(["url", "html"]).map_batches(
        links, batch_format="pandas"
    )


def domain_link_graph(
    pages: "rd.Dataset", num_buckets: int | None = None
) -> "rd.Dataset":
    """Domain-level link graph from raw crawl html: extract anchors,
    reduce (src_domain, dst_domain) pairs to link counts — the edge
    list PageRank/HITS-style crawl prioritization runs on. Self-loops
    (intra-domain navigation) are kept: their weight is the
    site-structure signal. ONE domain-pair-keyed exchange of count
    partials; html never rides a shuffle."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    host_re = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)"

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        src = (
            df["src_url"].astype(str).str.extract(host_re)[0].str.lower()
        )
        dst = df["href"].astype(str).str.extract(host_re)[0].str.lower()
        d = pd.DataFrame({"src_domain": src, "dst_domain": dst}).dropna()
        return d.groupby(
            ["src_domain", "dst_domain"], as_index=False
        ).size().rename(columns={"size": "n_links"})

    return bucketed_group_reduce(
        extract_links(pages).map_batches(
            pair_partial, batch_format="pandas"
        ),
        key_cols=["src_domain", "dst_domain"],
        reduce_fn=lambda g: g.groupby(
            ["src_domain", "dst_domain"], as_index=False
        )["n_links"].sum().astype({"n_links": "int64"}),
        num_buckets=num_buckets,
    )


def anchor_aliases(
    pages: "rd.Dataset",
    top_k: int = 3,
    min_count: int = 1,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Anchor-text alias mining — the classic web-scale KG-construction
    signal (how the crawl refers to a target page IS its entity's alias
    distribution; cf. anchor dictionaries in entity-linking literature):
    (target, alias, n_anchor, rank) — per canonicalized link target, the
    ``top_k`` normalized anchor texts by count (ties broken by alias
    string ascending, so the order is total and deterministic).

    Scale shape: html never rides a shuffle — anchors reduce to
    (target, alias) count PARTIALS per batch before the first exchange;
    the ranking exchange then carries only the count table (alias
    cardinality, not anchor occurrences) and pre-shrinks each block with
    the top-k semigroup combiner (rank needs the whole target group, so
    rank is assigned only in the final keyed reduce)."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        alias = (
            df["anchor"]
            .astype(str)
            .str.replace(r"\s+", " ", regex=True)
            .str.strip()
            .str.lower()
        )
        d = pd.DataFrame(
            {"target": _canonicalize(df["href"]).to_numpy(), "alias": alias}
        )
        d = d[d["alias"] != ""]
        return (
            d.groupby(["target", "alias"], as_index=False)
            .size()
            .rename(columns={"size": "n_anchor"})
        )

    def count_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["target", "alias"], as_index=False)["n_anchor"].sum()
        out["n_anchor"] = out["n_anchor"].astype(np.int64)
        return out[out["n_anchor"] >= min_count]

    counts = bucketed_group_reduce(
        extract_links(pages).map_batches(count_partial, batch_format="pandas"),
        key_cols=["target", "alias"],
        reduce_fn=count_reduce,
        num_buckets=num_buckets,
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(
                ["target", "n_anchor", "alias"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            .groupby("target", sort=False)
            .head(top_k)
        )

    def rank_reduce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["target", "n_anchor", "alias"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        g = g.assign(
            rank=(g.groupby("target", sort=False).cumcount() + 1).astype(
                np.int64
            )
        )
        return g[g["rank"] <= top_k].reset_index(drop=True)

    return bucketed_group_reduce(
        counts.map_batches(local_topk, batch_format="pandas"),
        key_cols=["target"],
        reduce_fn=rank_reduce,
        num_buckets=num_buckets,
    )


def inverse_relation_audit(
    edges: "rd.Dataset",
    subj_col: str = "subj_canonical",
    rel_col: str = "rel",
    obj_col: str = "obj_canonical",
    min_support: int = 1,
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Schema-induction audit for KG construction: detect INVERSE and
    SYMMETRIC relation pairs from the data alone (the AMIE-style
    r1(a,b) ⇒ r2(b,a) pattern) — e.g. `capital_of` vs `has_capital`,
    or a symmetric `borders`. For every unordered relation pair
    {rel_a ≤ rel_b} (rel_a == rel_b scores symmetry), return
    (rel_a, rel_b, n_a, n_b, n_pairs, score) where n_pairs counts
    distinct entity pairs (a, b), a ≠ b, asserting rel_a(a,b) AND
    rel_b(b,a), n_* are each relation's distinct non-loop pair
    counts, and score = n_pairs / min(n_a, n_b) ∈ [0, 1]. High score
    ⇒ the pair is (near-)inverse: merge candidates for the ontology,
    or redundant extractions to canonicalize.

    Scale shape: per-block combiners dedup (subj, rel, obj) and fold
    each triple to ONE 4-int-ish row keyed by the UNORDERED entity
    pair (lo, hi) with an orientation bit; one (lo, hi)-keyed
    exchange emits per-group relation-pair partials (group fan-out is
    |rels-in-group|², relation-vocab-bounded); a second
    relation²-bounded sum and a relation-bounded count table finish
    on tiny tables. Self-loops (a == a) are excluded — they satisfy
    every inverse vacuously."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    if min_support < 1:
        raise ValueError("inverse_relation_audit: min_support must be >= 1")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        d = df[[subj_col, rel_col, obj_col]].drop_duplicates()
        d = d.rename(
            columns={subj_col: "s", rel_col: "rel", obj_col: "o"}
        )
        d = d.loc[d["s"] != d["o"]]
        s = d["s"].astype(str)
        o = d["o"].astype(str)
        swap = s > o
        return pd.DataFrame(
            {
                "lo": s.where(~swap, o),
                "hi": o.where(~swap, s),
                "dir": swap.astype(np.int64),
                "rel": d["rel"].astype(str),
            }
        ).drop_duplicates()

    folded = bucketed_group_reduce(
        edges.select_columns([subj_col, rel_col, obj_col]).map_batches(
            fold, batch_format="pandas"
        ),
        key_cols=["lo", "hi"],
        reduce_fn=lambda g: g.drop_duplicates(),
        num_buckets=num_buckets,
    ).materialize()  # distinct-triple-bounded; reused by both sums

    # per-relation distinct non-loop pair counts (relation-bounded)
    def rel_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "rel" not in df.columns:  # schema-less empty
            return pd.DataFrame(
                {
                    "rel": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        g = df.groupby("rel", as_index=False).size()
        return g.rename(columns={"size": "n"})

    rel_counts = (
        bucketed_group_reduce(
            folded.map_batches(rel_partial, batch_format="pandas"),
            key_cols=["rel"],
            reduce_fn=lambda g: g.groupby("rel", as_index=False)["n"].sum(),
            num_buckets=num_buckets,
        ).to_pandas()  # relation-vocab-bounded pull
    )

    # per-entity-pair relation-pair partials: for (r1, d) and (r2, 1-d)
    # in the same group, the unordered pair {r1, r2} gains one instance
    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "dir" not in df.columns:  # schema-less empty
            return pd.DataFrame(
                {
                    "rel_a": pd.Series([], dtype="object"),
                    "rel_b": pd.Series([], dtype="object"),
                    "n_pairs": pd.Series([], dtype="int64"),
                }
            )
        d0 = df.loc[df["dir"] == 0, ["lo", "hi", "rel"]]
        d1 = df.loc[df["dir"] == 1, ["lo", "hi", "rel"]]
        m = d0.merge(d1, on=["lo", "hi"], suffixes=("_0", "_1"))
        if m.empty:
            return pd.DataFrame(
                {
                    "rel_a": pd.Series([], dtype="object"),
                    "rel_b": pd.Series([], dtype="object"),
                    "n_pairs": pd.Series([], dtype="int64"),
                }
            )
        ra = m["rel_0"].to_numpy(dtype=object)
        rb = m["rel_1"].to_numpy(dtype=object)
        sw = ra > rb
        t = pd.DataFrame(
            {
                "lo": m["lo"],
                "hi": m["hi"],
                "rel_a": np.where(sw, rb, ra),
                "rel_b": np.where(sw, ra, rb),
            }
        )
        # one count per unordered ENTITY pair: r1/r2 both asserted in
        # both directions must not double-count the same entity pair
        t = t.drop_duplicates()
        g = t.groupby(["rel_a", "rel_b"], as_index=False).size()
        return g.rename(columns={"size": "n_pairs"})

    # batch_size=None: whole blocks — the folded reduce emits each
    # (lo, hi) bucket as ONE block, so the merge sees complete groups
    pairs = bucketed_group_reduce(
        folded.map_batches(
            pair_partial, batch_format="pandas", batch_size=None
        ),
        key_cols=["rel_a", "rel_b"],
        reduce_fn=lambda g: g.groupby(["rel_a", "rel_b"], as_index=False)[
            "n_pairs"
        ].sum(),
        num_buckets=num_buckets,
    )

    import ray

    if "rel" not in rel_counts.columns:  # schema-less empty pull
        rel_counts = pd.DataFrame({"rel": [], "n": []})
    rc_ref = ray.put(
        dict(zip(rel_counts["rel"].astype(str), rel_counts["n"].astype(int)))
    )

    def finish(df: pd.DataFrame, _rc=rc_ref) -> pd.DataFrame:
        rc = ray.get(_rc)
        if not len(df) or "n_pairs" not in df.columns:
            d = pd.DataFrame()
        else:
            d = df.loc[df["n_pairs"] >= min_support].copy()
        if not len(d):
            return pd.DataFrame(
                {
                    "rel_a": pd.Series([], dtype="object"),
                    "rel_b": pd.Series([], dtype="object"),
                    "n_a": pd.Series([], dtype="int64"),
                    "n_b": pd.Series([], dtype="int64"),
                    "n_pairs": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        na = d["rel_a"].map(rc).astype("int64")
        nb = d["rel_b"].map(rc).astype("int64")
        d["n_a"] = na
        d["n_b"] = nb
        d["n_pairs"] = d["n_pairs"].astype("int64")
        # diagonal (symmetry) counts each unordered pair once against a
        # directed n_r, so it saturates at 0.5 — scale by 2 so a fully
        # symmetric relation scores 1.0 like a perfect inverse pair
        diag = (d["rel_a"] == d["rel_b"]).to_numpy()
        d["score"] = np.where(diag, 2.0, 1.0) * d["n_pairs"] / np.minimum(
            na, nb
        )
        return d[["rel_a", "rel_b", "n_a", "n_b", "n_pairs", "score"]]

    return pairs.map_batches(finish, batch_format="pandas")


def relation_cardinality_stats(
    edges: "rd.Dataset",
    subj_col: str = "subj_canonical",
    rel_col: str = "rel",
    obj_col: str = "obj_canonical",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """AMIE-style per-relation cardinality profile for schema
    induction: (rel, n_triples, n_subj, n_obj, fun, inv_fun) over
    DISTINCT triples, where fun = n_subj / n_triples (the
    functionality — 1.0 means every subject asserts the relation at
    most once, a candidate functional constraint for
    `functional_violations`) and inv_fun = n_obj / n_triples. Pairs
    with `inverse_relation_audit`: fun/inv_fun decide which direction
    of a detected inverse pair to keep as primary.

    Scale shape: one (subj, rel, obj)-keyed distinct exchange
    (triple-bounded), then two SHRINKING distinct exchanges — keyed
    (rel, subj) and (rel, obj) — whose per-block partials pre-dedup,
    and a final relation-bounded count merge. No driver state beyond
    the relation-vocab-bounded result."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df[[subj_col, rel_col, obj_col]]
            .rename(
                columns={subj_col: "s", rel_col: "rel", obj_col: "o"}
            )
            .astype({"rel": str})
            .drop_duplicates()
        )

    tri = bucketed_group_reduce(
        edges.select_columns([subj_col, rel_col, obj_col]).map_batches(
            fold, batch_format="pandas"
        ),
        key_cols=["s", "rel", "o"],
        reduce_fn=lambda g: g.drop_duplicates(),
        num_buckets=num_buckets,
    ).materialize()  # distinct-triple-bounded; feeds all three counts

    def _counts(key2: str, out_col: str) -> pd.DataFrame:
        def part(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "rel" not in df.columns:
                return pd.DataFrame(
                    {
                        "rel": pd.Series([], dtype="object"),
                        key2: pd.Series([], dtype="object"),
                    }
                )
            return df[["rel", key2]].drop_duplicates()

        dd = bucketed_group_reduce(
            tri.map_batches(part, batch_format="pandas"),
            key_cols=["rel", key2],
            reduce_fn=lambda g: g.drop_duplicates(),
            num_buckets=num_buckets,
        )

        def cnt(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "rel" not in df.columns:
                return pd.DataFrame(
                    {
                        "rel": pd.Series([], dtype="object"),
                        out_col: pd.Series([], dtype="int64"),
                    }
                )
            g = df.groupby("rel", as_index=False).size()
            return g.rename(columns={"size": out_col})

        return bucketed_group_reduce(
            dd.map_batches(cnt, batch_format="pandas"),
            key_cols=["rel"],
            reduce_fn=lambda g, _c=out_col: g.groupby(
                "rel", as_index=False
            )[_c].sum(),
            num_buckets=num_buckets,
        ).to_pandas()  # relation-vocab-bounded pull

    def tri_cnt(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "rel" not in df.columns:
            return pd.DataFrame(
                {
                    "rel": pd.Series([], dtype="object"),
                    "n_triples": pd.Series([], dtype="int64"),
                }
            )
        g = df.groupby("rel", as_index=False).size()
        return g.rename(columns={"size": "n_triples"})

    nt = bucketed_group_reduce(
        tri.map_batches(tri_cnt, batch_format="pandas"),
        key_cols=["rel"],
        reduce_fn=lambda g: g.groupby("rel", as_index=False)[
            "n_triples"
        ].sum(),
        num_buckets=num_buckets,
    ).to_pandas()  # relation-vocab-bounded pull

    if "rel" not in nt.columns or not len(nt):
        return rd.from_pandas(
            pd.DataFrame(
                {
                    "rel": pd.Series([], dtype="object"),
                    "n_triples": pd.Series([], dtype="int64"),
                    "n_subj": pd.Series([], dtype="int64"),
                    "n_obj": pd.Series([], dtype="int64"),
                    "fun": pd.Series([], dtype="float64"),
                    "inv_fun": pd.Series([], dtype="float64"),
                }
            )
        )

    ns = _counts("s", "n_subj")
    no = _counts("o", "n_obj")
    out = nt.merge(ns, on="rel").merge(no, on="rel")
    out["n_triples"] = out["n_triples"].astype("int64")
    out["n_subj"] = out["n_subj"].astype("int64")
    out["n_obj"] = out["n_obj"].astype("int64")
    out["fun"] = out["n_subj"] / out["n_triples"]
    out["inv_fun"] = out["n_obj"] / out["n_triples"]
    return rd.from_pandas(
        out[["rel", "n_triples", "n_subj", "n_obj", "fun", "inv_fun"]]
    )


def alias_ambiguity_stats(
    emap: "rd.Dataset",
    norm_col: str = "norm",
    entity_col: str = "entity_id",
    count_col: str = "n",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """Linking-quality profile of an entity map (one row per observed
    surface form): per NORMALIZED surface form (norm, n_entities,
    n_mentions, ambiguous) — n_entities = distinct canonical entities
    the surface links to (>1 ⇒ the blocking/linking stage conflated or
    correctly split a homonym: the precision-review queue), n_mentions
    = total observed occurrences. The synonymy direction (surfaces per
    entity) is `kg_entity_map`'s own grain; this is the inverse view.

    Scale shape: per-block (norm, entity) partials pre-aggregate, ONE
    norm-keyed exchange of (norm, entity, n) rows, vocabulary-bounded
    output."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or norm_col not in df.columns:
            return pd.DataFrame(
                {
                    "norm": pd.Series([], dtype="object"),
                    "ent": pd.Series([], dtype="int64"),
                    "n": pd.Series([], dtype="int64"),
                }
            )
        d = pd.DataFrame(
            {
                "norm": df[norm_col].astype(str),
                "ent": df[entity_col].to_numpy(dtype=np.int64),
                "n": df[count_col].to_numpy(dtype=np.int64),
            }
        )
        return d.groupby(["norm", "ent"], as_index=False)["n"].sum()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "norm" not in g.columns:
            return pd.DataFrame(
                {
                    "norm": pd.Series([], dtype="object"),
                    "n_entities": pd.Series([], dtype="int64"),
                    "n_mentions": pd.Series([], dtype="int64"),
                    "ambiguous": pd.Series([], dtype="int8"),
                }
            )
        pe = g.groupby(["norm", "ent"], as_index=False)["n"].sum()
        out = pe.groupby("norm", as_index=False).agg(
            n_entities=("ent", "nunique"), n_mentions=("n", "sum")
        )
        return pd.DataFrame(
            {
                "norm": out["norm"],
                "n_entities": out["n_entities"].astype(np.int64),
                "n_mentions": out["n_mentions"].astype(np.int64),
                "ambiguous": (out["n_entities"] > 1).astype(np.int8),
            }
        )

    return bucketed_group_reduce(
        emap.select_columns([norm_col, entity_col, count_col]).map_batches(
            part, batch_format="pandas"
        ),
        key_cols=["norm"],
        reduce_fn=final,
        num_buckets=num_buckets,
    )


def entity_cards(
    nodes: "rd.Dataset",
    edges: "rd.Dataset",
    subj_col: str = "subj_canonical",
    rel_col: str = "rel",
    obj_col: str = "obj_canonical",
    weight_col: str = "weight",
    num_buckets: int | None = None,
) -> "rd.Dataset":
    """The serving artifact a KG product exposes per entity — one row
    per canonical node: (canonical, n_mentions, n_aliases, out_degree,
    in_degree, n_rels_out, top_rel_out) where top_rel_out is the
    highest-weight outgoing relation (ties break rel ASC). Joins the
    node table (aliases/mentions) with degree/relation profiles of the
    canonical edge list.

    Scale shape: per-block (entity, rel, dir) combiners fold edges to
    counts, ONE canonical-keyed exchange merges them with the node
    rows (tagged union — nodes ship once, edges ship as count rows),
    vocabulary-bounded output."""
    from kgflow.ops.shuffle import bucketed_group_reduce

    def edge_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or subj_col not in df.columns:
            return pd.DataFrame(
                {
                    "canonical": pd.Series([], dtype="object"),
                    "rel": pd.Series([], dtype="object"),
                    "dir": pd.Series([], dtype="int8"),
                    "w": pd.Series([], dtype="int64"),
                    "kind": pd.Series([], dtype="int8"),
                    "n_mentions": pd.Series([], dtype="int64"),
                    "n_aliases": pd.Series([], dtype="int64"),
                }
            )
        w = (
            df[weight_col].to_numpy(dtype=np.int64)
            if weight_col in df.columns
            else np.ones(len(df), dtype=np.int64)
        )
        base = pd.DataFrame(
            {
                "canonical": np.concatenate(
                    [
                        df[subj_col].astype(str).to_numpy(dtype=object),
                        df[obj_col].astype(str).to_numpy(dtype=object),
                    ]
                ),
                "rel": np.tile(
                    df[rel_col].astype(str).to_numpy(dtype=object), 2
                ),
                "dir": np.concatenate(
                    [
                        np.zeros(len(df), dtype=np.int8),  # outgoing
                        np.ones(len(df), dtype=np.int8),  # incoming
                    ]
                ),
                "w": np.tile(w, 2),
            }
        )
        g = base.groupby(
            ["canonical", "rel", "dir"], as_index=False
        )["w"].sum()
        g["kind"] = np.ones(len(g), dtype=np.int8)
        # schema-align with node rows for the tagged union
        g["n_mentions"] = np.zeros(len(g), dtype=np.int64)
        g["n_aliases"] = np.zeros(len(g), dtype=np.int64)
        return g

    def node_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or "canonical" not in df.columns:
            return pd.DataFrame(
                {
                    "canonical": pd.Series([], dtype="object"),
                    "rel": pd.Series([], dtype="object"),
                    "dir": pd.Series([], dtype="int8"),
                    "w": pd.Series([], dtype="int64"),
                    "kind": pd.Series([], dtype="int8"),
                    "n_mentions": pd.Series([], dtype="int64"),
                    "n_aliases": pd.Series([], dtype="int64"),
                }
            )
        return pd.DataFrame(
            {
                "canonical": df["canonical"].astype(str),
                "rel": pd.Series([""] * len(df), dtype="object"),
                "dir": np.zeros(len(df), dtype=np.int8),
                "w": np.zeros(len(df), dtype=np.int64),
                "kind": np.zeros(len(df), dtype=np.int8),
                "n_mentions": df["n_mentions"].to_numpy(dtype=np.int64),
                "n_aliases": np.fromiter(
                    (len(a) for a in df["aliases"]),
                    dtype=np.int64,
                    count=len(df),
                ),
            }
        )

    EMPTY = pd.DataFrame(
        {
            "canonical": pd.Series([], dtype="object"),
            "n_mentions": pd.Series([], dtype="int64"),
            "n_aliases": pd.Series([], dtype="int64"),
            "out_degree": pd.Series([], dtype="int64"),
            "in_degree": pd.Series([], dtype="int64"),
            "n_rels_out": pd.Series([], dtype="int64"),
            "top_rel_out": pd.Series([], dtype="object"),
        }
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g) or "kind" not in g.columns:
            return EMPTY.copy()
        n = g.loc[g["kind"] == 0]
        if not len(n):
            return EMPTY.copy()
        nt = n.groupby("canonical", as_index=False).agg(
            n_mentions=("n_mentions", "sum"),
            n_aliases=("n_aliases", "sum"),
        )
        e = (
            g.loc[g["kind"] == 1]
            .groupby(["canonical", "rel", "dir"], as_index=False)["w"]
            .sum()
        )
        out_e = e.loc[e["dir"] == 0]
        in_e = e.loc[e["dir"] == 1]
        deg_out = out_e.groupby("canonical", as_index=False)["w"].sum()
        deg_in = in_e.groupby("canonical", as_index=False)["w"].sum()
        nrels = out_e.groupby("canonical", as_index=False)["rel"].nunique()
        top = (
            out_e.sort_values(
                ["canonical", "w", "rel"], ascending=[True, False, True]
            )
            .drop_duplicates("canonical")[["canonical", "rel"]]
        )
        m = (
            nt.merge(
                deg_out.rename(columns={"w": "out_degree"}),
                on="canonical",
                how="left",
            )
            .merge(
                deg_in.rename(columns={"w": "in_degree"}),
                on="canonical",
                how="left",
            )
            .merge(
                nrels.rename(columns={"rel": "n_rels_out"}),
                on="canonical",
                how="left",
            )
            .merge(
                top.rename(columns={"rel": "top_rel_out"}),
                on="canonical",
                how="left",
            )
        )
        for c in ("out_degree", "in_degree", "n_rels_out"):
            m[c] = m[c].fillna(0).astype(np.int64)
        m["top_rel_out"] = m["top_rel_out"].where(
            m["top_rel_out"].notna(), None
        )
        return m[
            [
                "canonical",
                "n_mentions",
                "n_aliases",
                "out_degree",
                "in_degree",
                "n_rels_out",
                "top_rel_out",
            ]
        ]

    tagged = nodes.map_batches(node_part, batch_format="pandas").union(
        edges.map_batches(edge_part, batch_format="pandas")
    )
    return bucketed_group_reduce(
        tagged, key_cols=["canonical"], reduce_fn=fold,
        num_buckets=num_buckets,
    )


def type_violation_counts(
    triples: "rd.Dataset",
    etype_map: dict[str, str],
    signatures: dict[str, tuple[str, str]],
) -> "rd.Dataset":
    """KG type-constraint audit: per relation, counts by (resolved
    subject type, resolved object type, matches-signature) — the
    cheapest high-yield error signal a KG build has (a born_in edge
    whose object resolves to a PER is wrong before any human look).

    ``etype_map`` is normalized-mention → type (pool-bounded — the
    alias dictionary side), broadcast once via ray.put; mentions that
    resolve to no known entity type as '?' and always fail the
    signature. ONE (rel, st, ot)-keyed reduce over per-batch count
    partials; the corpus never shuffles row-level."""
    import ray as _ray

    from kgflow.linking.link import normalize_mention
    from kgflow.ops.shuffle import bucketed_group_reduce

    ref = _ray.put((dict(etype_map), dict(signatures)))

    class Partial:
        def __init__(self):
            self.et, self.sig = _ray.get(ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "rel" not in df.columns:
                return pd.DataFrame(
                    {
                        "rel": pd.Series([], dtype=object),
                        "subj_type": pd.Series([], dtype=object),
                        "obj_type": pd.Series([], dtype=object),
                        "sig_ok": pd.Series([], dtype=bool),
                        "n": pd.Series([], dtype="int64"),
                    }
                )
            st = df["subj"].map(normalize_mention).map(self.et).fillna("?")
            ot = df["obj"].map(normalize_mention).map(self.et).fillna("?")
            # .get, not Series.map: map yields float NaN for missing
            # relations, and an unknown relation must fail, not crash
            want = [self.sig.get(r) for r in df["rel"]]
            ok = [
                w is not None and (a, b) == tuple(w)
                for w, a, b in zip(want, st, ot)
            ]
            t = pd.DataFrame(
                {
                    "rel": df["rel"],
                    "subj_type": st,
                    "obj_type": ot,
                    "sig_ok": ok,
                }
            )
            g = t.groupby(
                ["rel", "subj_type", "obj_type", "sig_ok"],
                as_index=False,
                sort=False,
            ).size()
            return g.rename(columns={"size": "n"})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(
            ["rel", "subj_type", "obj_type", "sig_ok"],
            as_index=False,
            sort=False,
        )["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    return bucketed_group_reduce(
        triples.map_batches(
            Partial, batch_format="pandas", concurrency=(1, 2)
        ),
        key_cols=["rel", "subj_type", "obj_type"],
        reduce_fn=final,
    )
