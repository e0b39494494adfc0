"""Driver contract for the kgflow engine (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the kgflow library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship pages→triples pipeline at sf0.001 scale.
- ``queries()``: one entry per implemented operator/pipeline
  (SURVEY.md §2 + the training-data ops); each callable takes an
  ``sf_dir`` (driver testdata dir) and returns a Dataset / DataFrame /
  Arrow table.
- ``oracle_sql()``: DuckDB-equivalent SQL for the SQL-expressible ops,
  with matching column names. KG-pipeline ops (stub-model inference,
  LSH linking, CC) are inherently non-SQL and are checked rows-only by
  the driver; their correctness gate is the engine-vs-oracle parity
  suite in tests/ (P/R = 1.0 vs the reference-semantics oracle).

Float-valued comparisons: aggregate floats are floor-scaled (e.g.
``floor(x*100)/100``) on BOTH sides so summation-order drift between
engines cannot flip a rounding direction.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np


# ---------------------------------------------------------------------------
# helpers

def _pages_dir(sf_dir: str) -> str:
    from kgflow.fixtures.pages import pages_for_sf_dir

    return pages_for_sf_dir(sf_dir)


def _docs(sf_dir: str):
    from kgflow.sources.parquet import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"))


# fixed BM25 demo query (mid-frequency corpus terms); shared verbatim
# between the engine call and the SQL oracle
_BM25_TERMS = ("hash", "merge", "vector", "window")

# fixed blocklist for the multi-pattern gate demo (borderless patterns:
# no prefix==suffix, so non-overlapping counts are scan-order-free);
# shared verbatim with the doc_blocklist_hits SQL oracle
_BLOCKLIST = ("merge", "slow join", "spark", "vector")

# fixed demo gazetteer for token-aligned entity spotting (mixed word
# lengths exercise every n-gram leg); shared verbatim with the
# doc_gazetteer SQL oracle
_GAZETTEER = (
    "hash join",
    "merge sort",
    "spark",
    "window function",
    "slow join",
    "vector",
)


def _floor_scale_pd(df, col, scale):
    df[col] = np.floor(df[col].to_numpy(dtype=np.float64) * scale) / scale
    return df


# ---------------------------------------------------------------------------
# entry

def entry() -> Any:
    """Flagship: pages → extracted triples at sf0.001 (1,000 pages)."""
    from kgflow.pipelines.kg import triples_ds

    pages = _pages_dir("/root/testdata/sf0.001")
    return triples_ds(pages).select_columns(
        ["url", "sent_id", "rel_id", "rel", "subj", "obj"]
    )


# ---------------------------------------------------------------------------
# queries

def queries() -> dict[str, Callable[[str], Any]]:
    import ray.data as rd

    # --- KG pipeline (non-SQL; rows-only driver check; gated by parity tests)
    def kg_sentences(sf_dir: str):
        from kgflow.pipelines.kg import read_pages, sentences_ds

        return sentences_ds(read_pages(_pages_dir(sf_dir)))

    def kg_domain_stats(sf_dir: str):
        """Rows-only (the pages fixture is not a driver SQL view; the
        exact aggregates are pinned in tests/test_wave16.py): per-
        domain crawl stats (n_pages, first/last warc_ts, n_langs) —
        the frontier/freshness priors of a crawl ingest."""
        from kgflow.ops.web import domain_stats
        from kgflow.pipelines.kg import KgConfig, read_pages

        cfg = KgConfig(read_columns=["url", "warc_ts", "lang"])
        return domain_stats(read_pages(_pages_dir(sf_dir), cfg))

    def kg_url_dedup(sf_dir: str):
        """Rows-only (pinned in tests/test_wave16.py): re-crawl
        snapshot dedup — newest capture per canonical URL (tracking
        params/fragments/default ports folded)."""
        from kgflow.ops.web import latest_snapshots
        from kgflow.pipelines.kg import KgConfig, read_pages

        cfg = KgConfig(read_columns=["url", "warc_ts"])
        return latest_snapshots(read_pages(_pages_dir(sf_dir), cfg))

    def kg_domain_yield(sf_dir: str):
        """Rows-only: per-domain triple yield — (domain, n_triples,
        n_rels) over the memoized extracted-triple set. The crawl-
        prioritization signal (which domains produce KG facts); joins
        nothing, ONE domain-keyed reduce over (domain, rel) partials."""
        import pandas as _pd

        from kgflow.ops.shuffle import bucketed_group_reduce

        def partial(df: _pd.DataFrame) -> _pd.DataFrame:
            host = (
                df["url"]
                .astype(str)
                .str.extract(r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)")[0]
                .str.lower()
                .fillna("")
            )
            d = _pd.DataFrame({"domain": host, "rel": df["rel"]})
            return d.groupby(["domain", "rel"], as_index=False).agg(
                n=("rel", "size")
            )

        def final(g: _pd.DataFrame) -> _pd.DataFrame:
            pr = g.groupby(["domain", "rel"], as_index=False)["n"].sum()
            out = pr.groupby("domain", as_index=False).agg(
                n_triples=("n", "sum"), n_rels=("rel", "nunique")
            )
            out["n_triples"] = out["n_triples"].astype("int64")
            out["n_rels"] = out["n_rels"].astype("int64")
            return out

        tri = _triples_mat(sf_dir).select_columns(["url", "rel"])
        return bucketed_group_reduce(
            tri.map_batches(partial, batch_format="pandas"),
            key_cols=["domain"],
            reduce_fn=final,
        )

    def kg_triples(sf_dir: str):
        from kgflow.pipelines.kg import triples_ds

        return triples_ds(_pages_dir(sf_dir)).select_columns(
            ["url", "sent_id", "rel_id", "rel", "subj", "obj"]
        )

    def kg_relations(sf_dir: str):
        """Stage-1 output distribution: sentences per selected relation."""
        return _triples_mat(sf_dir).groupby("rel").count()

    def kg_events(sf_dir: str):
        from kgflow.pipelines.kg import events_ds

        return events_ds(_pages_dir(sf_dir))

    # kg_entity_map / kg_edges / kg_nodes all consume the SAME extracted
    # triple set; memoize the materialized Dataset per pages dir so a
    # driver sweep runs the extraction once, not three times (the
    # production path stages via Parquet — kgflow/pipelines/build.py).
    _triples_memo: dict[str, Any] = {}

    def _triples_mat(sf_dir: str):
        from kgflow.pipelines.kg import triples_ds

        key = _pages_dir(sf_dir)
        if key not in _triples_memo:
            _triples_memo[key] = triples_ds(key).materialize()
        return _triples_memo[key]

    def kg_entity_map(sf_dir: str):
        from kgflow.linking.link import entity_map

        return entity_map(_triples_mat(sf_dir))

    def kg_edges(sf_dir: str):
        from kgflow.linking.link import canonical_triples
        from kgflow.materialize.edges import dedup_edges

        canon, _ = canonical_triples(_triples_mat(sf_dir))
        return dedup_edges(canon)

    def kg_edge_evidence(sf_dir: str):
        """Rows-only (exact semantics pinned on planted inputs in
        tests/test_wave17.py): evidence aggregation per canonical edge
        — supporting-occurrence weight, DISTINCT source-domain count,
        first/last capture timestamps. The fact-confidence signal that
        separates single-domain assertion spam from independently
        corroborated facts (`kgflow.ops.web.edge_evidence`)."""
        from kgflow.linking.link import canonical_triples
        from kgflow.ops.web import edge_evidence
        from kgflow.pipelines.kg import KgConfig, read_pages

        canon, _ = canonical_triples(_triples_mat(sf_dir))
        cfg = KgConfig(read_columns=["url", "warc_ts"])
        return edge_evidence(canon, read_pages(_pages_dir(sf_dir), cfg))

    def kg_snapshot_delta(sf_dir: str):
        """Rows-only (semantics pinned on planted inputs in
        tests/test_wave17.py): incremental KG diff between the edge
        set built from the even-numbered pages ("snapshot N-1") and
        the full corpus ("snapshot N") — added / removed / reweighted
        edges only, delta-bounded output. Both snapshots derive from
        the ONE memoized triple set (a deterministic url-number
        filter), so the gate pays no second model pass
        (`kgflow.materialize.edges.edges_delta`)."""
        import pandas as _pd

        from kgflow.linking.link import canonical_triples
        from kgflow.materialize.edges import dedup_edges, edges_delta

        canon, _ = canonical_triples(_triples_mat(sf_dir))

        def evens(df: _pd.DataFrame) -> _pd.DataFrame:
            n = (
                df["url"]
                .astype(str)
                .str.extract(r"(\d+)$")[0]
                .fillna("1")
                .astype("int64")
            )
            return df.loc[(n % 2) == 0]

        old = dedup_edges(canon.map_batches(evens, batch_format="pandas"))
        new = dedup_edges(canon)
        return edges_delta(old, new)

    def kg_link_graph(sf_dir: str):
        """Rows-only (semantics pinned on planted html in
        tests/test_wave17.py): domain-level link graph from raw crawl
        html — anchors planted deterministically (page i links to
        pages 2i and 3i+1 of the url wheel) since the fixture html has
        none; extraction is one vectorized extractall per batch, html
        never rides a shuffle (`kgflow.ops.web.domain_link_graph`)."""
        import pandas as _pd

        from kgflow.ops.web import domain_link_graph
        from kgflow.pipelines.kg import KgConfig, read_pages

        def plant(df: _pd.DataFrame) -> _pd.DataFrame:
            n = (
                df["url"]
                .astype(str)
                .str.extract(r"(\d+)$")[0]
                .fillna("0")
                .astype("int64")
            )
            a1 = (
                "<a href=\"https://site"
                + ((2 * n) % 1000).astype(str)
                + ".example/page/"
                + (2 * n).astype(str)
                + "\">next</a>"
            )
            a2 = (
                "<a href=\"https://site"
                + ((3 * n + 1) % 1000).astype(str)
                + ".example/page/"
                + (3 * n + 1).astype(str)
                + "\">related</a>"
            )
            html = df["html"].apply(
                lambda b: b.decode("utf-8", "replace")
                if isinstance(b, (bytes, bytearray))
                else str(b)
            )
            out = (html + a1 + a2).str.encode("utf-8")
            return _pd.DataFrame({"url": df["url"], "html": out})

        cfg = KgConfig(read_columns=["url", "html"])
        pages = read_pages(_pages_dir(sf_dir), cfg).map_batches(
            plant, batch_format="pandas"
        )
        return domain_link_graph(pages)

    def kg_functional_violations(sf_dir: str):
        """Rows-only (semantics pinned on planted inputs in
        tests/test_wave17.py): constraint audit — subjects asserting
        more than one DISTINCT object for a functional relation
        (born_in, capital_of), i.e. extraction errors or unresolved
        entity aliases (`kgflow.ops.web.functional_violations`)."""
        from kgflow.linking.link import canonical_triples
        from kgflow.ops.web import functional_violations

        canon, _ = canonical_triples(_triples_mat(sf_dir))
        return functional_violations(canon, ["born_in", "capital_of"])

    def kg_inverse_relations(sf_dir: str):
        """Rows-only (semantics pinned on planted inputs in
        tests/test_wave17.py): schema induction — detect inverse and
        symmetric relation pairs from the canonical triples alone
        (the AMIE-style r1(a,b) ⇒ r2(b,a) pattern): one unordered
        entity-pair exchange, relation²-bounded tail
        (`kgflow.ops.web.inverse_relation_audit`)."""
        from kgflow.linking.link import canonical_triples
        from kgflow.ops.web import inverse_relation_audit

        canon, _ = canonical_triples(_triples_mat(sf_dir))
        return inverse_relation_audit(canon)

    def kg_relation_cardinality(sf_dir: str):
        """Rows-only (semantics pinned on planted inputs in
        tests/test_wave17.py): AMIE-style per-relation functionality /
        inverse-functionality profile over DISTINCT canonical triples
        — one triple-keyed distinct exchange + two shrinking (rel, x)
        distinct exchanges, relation-vocab-bounded tail
        (`kgflow.ops.web.relation_cardinality_stats`)."""
        from kgflow.linking.link import canonical_triples
        from kgflow.ops.web import relation_cardinality_stats

        canon, _ = canonical_triples(_triples_mat(sf_dir))
        return relation_cardinality_stats(canon)

    def kg_alias_ambiguity(sf_dir: str):
        """Rows-only (planted-input exactness in tests/test_wave17.py):
        linking-quality profile — per normalized surface form the
        distinct-canonical-entity count (ambiguity: the precision-
        review queue) and total mentions; ONE norm-keyed exchange of
        pre-aggregated (norm, entity, n) rows
        (`kgflow.ops.web.alias_ambiguity_stats`)."""
        from kgflow.linking.link import entity_map
        from kgflow.ops.web import alias_ambiguity_stats

        return alias_ambiguity_stats(entity_map(_triples_mat(sf_dir)))

    def kg_taxonomy_cycles(sf_dir: str):
        """Rows-only (planted semantics via TestReachPairs; stub-model
        triples): taxonomy consistency audit — entities on a part_of
        cycle of length ≤ 3 (the is-a/part-of loops a noisy extractor
        emits, which would break any topological use of the
        hierarchy): the self pairs of the bounded transitive closure
        (`kgflow.ops.graph.reach_pairs`), returned as
        (entity, cycle_len)."""
        import pandas as pd

        from kgflow.linking.link import canonical_triples
        from kgflow.ops.graph import reach_pairs

        canon, _ = canonical_triples(_triples_mat(sf_dir))

        def po_edges(df: pd.DataFrame) -> pd.DataFrame:
            d = df.loc[df["rel"].astype(str) == "part_of"]
            s = d["subj_canonical"].astype(str)
            o = d["obj_canonical"].astype(str)
            # stable int ids for the closure (equality-only): per-row
            # md5 over PART_OF TRIPLES ONLY — relation-filtered before
            # hashing, so the Python loop is taxonomy-bounded, never
            # corpus-bounded (the linking fnv64-per-mention precedent)
            import numpy as _np

            def h(x: pd.Series) -> _np.ndarray:
                import hashlib

                return _np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.md5(v.encode()).digest()[:8], "big"
                        )
                        >> 1
                        for v in x
                    ),
                    dtype=_np.int64,
                    count=len(x),
                )

            return pd.DataFrame({"src": h(s), "dst": h(o), "name": s})

        e = canon.map_batches(po_edges, batch_format="pandas").materialize()
        closure = reach_pairs(
            e.select_columns(["src", "dst"]), max_hops=3
        )

        def selfs(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "src" not in df.columns:
                return pd.DataFrame(
                    {
                        "entity_hash": pd.Series([], dtype="int64"),
                        "cycle_len": pd.Series([], dtype="int64"),
                    }
                )
            d = df.loc[df["src"] == df["dst"]]
            return pd.DataFrame(
                {
                    "entity_hash": d["src"].astype("int64"),
                    "cycle_len": d["hops"].astype("int64"),
                }
            )

        return closure.map_batches(selfs, batch_format="pandas")

    def kg_entity_cards(sf_dir: str):
        """Rows-only (planted-input exactness in tests/test_wave17.py):
        the per-entity serving artifact — aliases/mentions joined with
        edge-list degree and relation profiles (out/in degree, distinct
        outgoing relations, highest-weight outgoing relation, ties rel
        ASC); nodes ship once, edges fold to count rows, ONE
        canonical-keyed exchange (`kgflow.ops.web.entity_cards`)."""
        from kgflow.linking.link import canonical_triples, entity_map
        from kgflow.materialize.edges import dedup_edges, nodes_table
        from kgflow.ops.web import entity_cards

        tri = _triples_mat(sf_dir)
        canon, emap = canonical_triples(tri)
        return entity_cards(nodes_table(entity_map(tri)), dedup_edges(canon))

    def kg_nodes(sf_dir: str):
        from kgflow.linking.link import entity_map
        from kgflow.materialize.edges import nodes_table

        return nodes_table(entity_map(_triples_mat(sf_dir)))

    def kg_pagerank(sf_dir: str):
        """Rows-only (iterative, not SQL-expressible): PageRank over the
        canonical deduplicated KG edges (`kgflow.ops.graph.pagerank` —
        per-iteration O(E) exchange, V-bounded state, dangling-mass
        redistribution); pinned against a dense NumPy power iteration in
        tests/test_graph.py. Ranks quantized to 1e-12 so the row payload
        is stable across partial-sum orderings."""
        import pandas as pd

        from kgflow.linking.link import canonical_triples
        from kgflow.materialize.edges import dedup_edges
        from kgflow.ops.graph import pagerank

        canon, _ = canonical_triples(_triples_mat(sf_dir))
        edges = dedup_edges(canon)
        # evidence-weighted: the walk follows edges in proportion to
        # their dedup weight (= observation count across pages)
        pr = pagerank(
            edges,
            src_col="subj_id",
            dst_col="obj_id",
            weight_col="weight",
            iters=5,
        )

        def quantize(df: pd.DataFrame) -> pd.DataFrame:
            df["rank"] = df["rank"].round(12)
            return df

        return pr.map_batches(quantize, batch_format="pandas")

    def kg_ppr(sf_dir: str):
        """Rows-only (iterative, not SQL-expressible; seeded variant
        pinned against a dense power iteration in tests/test_wave18.py):
        PERSONALIZED PageRank (Haveliwala 2002) around a deterministic
        3-entity seed set — the entity-relatedness ranking a KG serving
        layer answers "what's most related to X?" with. Teleport and
        dangling mass land only on seeds; same O(E)-per-iteration
        exchange as kg_pagerank (`kgflow.ops.graph.pagerank(seeds=…)`)."""
        import pandas as pd

        from kgflow.linking.link import canonical_triples
        from kgflow.materialize.edges import dedup_edges
        from kgflow.ops.graph import pagerank
        from kgflow.ops.shuffle import global_topk

        canon, _ = canonical_triples(_triples_mat(sf_dir))
        edges = dedup_edges(canon)
        # deterministic seeds: the 3 smallest subject ids (bounded pull)
        seeds = (
            global_topk(
                edges.select_columns(["subj_id"]),
                sort_cols=["subj_id"],
                ascending=[True],
                k=3,
            )
            .to_pandas()["subj_id"]
            .unique()
            .tolist()
        )
        pr = pagerank(
            edges,
            src_col="subj_id",
            dst_col="obj_id",
            weight_col="weight",
            iters=5,
            seeds=seeds,
        )

        def quantize(df: pd.DataFrame) -> pd.DataFrame:
            df["rank"] = df["rank"].round(12)
            return df

        return pr.map_batches(quantize, batch_format="pandas")

    def kg_hits(sf_dir: str):
        """Rows-only (iterative/spectral, not SQL-expressible): HITS
        hub/authority scores over the canonical KG edges
        (`kgflow.ops.graph.hits` — two E-bounded push exchanges per
        iteration, V-bounded score state); pinned against a dense
        NumPy reference in tests/test_wave10.py. Scores quantized to
        1e-12 for payload stability."""
        import pandas as pd

        from kgflow.linking.link import canonical_triples
        from kgflow.materialize.edges import dedup_edges
        from kgflow.ops.graph import hits

        canon, _ = canonical_triples(_triples_mat(sf_dir))
        edges = dedup_edges(canon)
        hs = hits(edges, src_col="subj_id", dst_col="obj_id", iters=5)

        def quantize(df: pd.DataFrame) -> pd.DataFrame:
            df["hub"] = df["hub"].round(12)
            df["authority"] = df["authority"].round(12)
            return df

        return hs.map_batches(quantize, batch_format="pandas")

    # --- training-feature builders over the golden corpus (rows-only;
    # semantics ≙ reference convert_examples_to_* — see
    # kgflow/stages/features.py citations)
    def _gold_corpus(sf_dir: str):
        import pyarrow as pa

        gold = rd.read_parquet(os.path.join(_pages_dir(sf_dir), "gold_spo.parquet"))

        def to_examples(batch: pa.Table) -> pa.Table:
            from kgflow.linking.minhash import fnv64

            tid = [
                fnv64(f"{u}#{int(s)}") & 0x7FFFFFFFFFFFFFFF
                for u, s in zip(
                    batch.column("url").to_pylist(), batch.column("sent_id").to_pylist()
                )
            ]
            return pa.table(
                {
                    "text_id": pa.array(tid, pa.int64()),
                    "text": batch.column("text"),
                    "spo": batch.column("spo"),
                }
            )

        return gold.map_batches(to_examples, batch_format="pyarrow")

    def feat_seq(sf_dir: str):
        from kgflow.stages.features import make_seq_features_fn

        return _gold_corpus(sf_dir).map_batches(
            make_seq_features_fn(), batch_format="pyarrow"
        )

    def feat_ner(sf_dir: str):
        from kgflow.stages.features import make_ner_features_fn

        return _gold_corpus(sf_dir).map_batches(
            make_ner_features_fn(), batch_format="pyarrow"
        )

    def feat_interactive(sf_dir: str):
        from kgflow.stages.features import make_interactive_features_fn

        return _gold_corpus(sf_dir).map_batches(
            make_interactive_features_fn(), batch_format="pyarrow"
        )

    def feat_diagnostics(sf_dir: str):
        from kgflow.stages.features import make_feature_diagnostics_fn

        ds = _gold_corpus(sf_dir).map_batches(
            make_feature_diagnostics_fn(), batch_format="pyarrow"
        )
        import pandas as pd

        agg = ds.sum(["n_empty_spo", "n_entity_not_found", "n_hard_to_solve"])
        return pd.DataFrame([{k.replace("sum(", "").replace(")", ""): int(v)
                              for k, v in agg.items()}])

    def kg_triple_prf(sf_dir: str):
        """A2 conformance metric, driver-pinned: corpus triple P/R/F1 of
        the extraction pipeline vs the fixture's gold_spo (reference
        semantics: lit_models/transformer.py:192-215). Rows-only check —
        the single row carries the counts so regressions show as value
        drift in future rounds."""
        import pandas as pd

        from kgflow.stages.metrics import explode_gold, triple_prf

        pages = _pages_dir(sf_dir)
        pred = _triples_mat(sf_dir)  # shared memo: extraction runs once per sweep
        gold = explode_gold(
            rd.read_parquet(os.path.join(pages, "gold_spo.parquet"))
        )
        m = triple_prf(pred, gold)
        return pd.DataFrame(
            [
                {
                    "pre": int(m["pre"]),
                    "true": int(m["true"]),
                    "cor": int(m["cor"]),
                    "p4": int(np.floor(m["p"] * 1e4)),
                    "r4": int(np.floor(m["r"] * 1e4)),
                    "f14": int(np.floor(m["f1"] * 1e4)),
                }
            ]
        )

    # --- BPE production-tokenizer path (round-5): the flagship DAG
    # under the LEARNED subword vocab (KgConfig.tokenizer="bpe",
    # kgflow/stages/tokenize.py BpeTokenizer) — trains per worker to
    # exhaustion on the fixture corpus, merges every in-corpus word to
    # one symbol, decodes losslessly via end-of-word markers.
    _bpe_triples_memo: dict[str, Any] = {}

    def _triples_mat_bpe(sf_dir: str):
        from kgflow.pipelines.kg import KgConfig, triples_ds

        key = _pages_dir(sf_dir)
        if key not in _bpe_triples_memo:
            _bpe_triples_memo[key] = triples_ds(
                key, KgConfig(tokenizer="bpe")
            ).materialize()
        return _bpe_triples_memo[key]

    def kg_triples_bpe(sf_dir: str):
        """Rows-only (surface parity vs the simple-tokenizer flagship
        pinned in tests/test_bpe_flagship.py): extracted triples under
        the learned BPE vocab."""
        return _triples_mat_bpe(sf_dir).select_columns(
            ["url", "sent_id", "rel_id", "rel", "subj", "obj"]
        )

    def kg_triple_prf_bpe(sf_dir: str):
        """The A2 P/R gate re-run under the BPE vocab — the round-4
        verdict's acceptance bar for the production tokenizer path
        (P/R must stay >= 0.95; the fixture world pins it at 1.0)."""
        import pandas as pd

        from kgflow.stages.metrics import explode_gold, triple_prf

        pages = _pages_dir(sf_dir)
        pred = _triples_mat_bpe(sf_dir)
        gold = explode_gold(
            rd.read_parquet(os.path.join(pages, "gold_spo.parquet"))
        )
        m = triple_prf(pred, gold)
        return pd.DataFrame(
            [
                {
                    "pre": int(m["pre"]),
                    "true": int(m["true"]),
                    "cor": int(m["cor"]),
                    "p4": int(np.floor(m["p"] * 1e4)),
                    "r4": int(np.floor(m["r"] * 1e4)),
                    "f14": int(np.floor(m["f1"] * 1e4)),
                }
            ]
        )

    # --- training lifecycle (run_seq.sh / run_ner.sh analogues;
    # data-parallel gradient descent on the engine, torch-free stand-in
    # models — see kgflow/train/seq.py). Rows-only: 1 summary row each.
    def train_seq(sf_dir: str):
        from kgflow.train.seq import train_and_eval_seq

        return train_and_eval_seq(_gold_corpus(sf_dir), epochs=30)

    def train_ner(sf_dir: str):
        from kgflow.train.seq import train_and_eval_ner

        return train_and_eval_ner(_gold_corpus(sf_dir), epochs=15)

    # --- text ops over documents (SQL-checked unless noted)
    def doc_exact_dedup(sf_dir: str):
        from kgflow.ops.text import exact_dedup

        return exact_dedup(_docs(sf_dir))

    def doc_lang_counts(sf_dir: str):
        return _docs(sf_dir).groupby("lang").count().map_batches(
            lambda df: df.rename(columns={"count()": "n"}), batch_format="pandas"
        )

    def doc_token_counts(sf_dir: str):
        from kgflow.ops.text import token_counts

        return token_counts(_docs(sf_dir))

    def doc_quality(sf_dir: str):
        from kgflow.ops.text import quality_scores

        return quality_scores(_docs(sf_dir)).map_batches(
            lambda df: _floor_scale_pd(df, "mean_token_len", 1e4),
            batch_format="pandas",
        )

    def doc_fingerprint(sf_dir: str):
        from kgflow.ops.text import fingerprints

        return fingerprints(_docs(sf_dir))

    def doc_vocab_topk(sf_dir: str):
        """Oracle-checked: corpus-wide top-100 token frequencies —
        combiner + bucketed sum-reduce with per-bucket top-k; ties
        break (n DESC, token ASC) on both sides."""
        from kgflow.ops.text import vocab_topk

        return vocab_topk(_docs(sf_dir), k=100)

    def doc_split(sf_dir: str):
        """Oracle-checked: deterministic md5-hex train/val/test split —
        the same lexicographic first-hex-byte comparison in SQL."""
        from kgflow.ops.text import hash_split

        return hash_split(_docs(sf_dir))

    def doc_sample(sf_dir: str):
        """Oracle-checked: deterministic stratified sample — per lang,
        the 20 docs with smallest md5(doc_id) rank; the oracle is a
        row_number() window over the same md5 ordering."""
        from kgflow.ops.text import grouped_sample

        import os as _os

        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            _os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "lang"]
        )
        return grouped_sample(docs, group_col="lang", n_per_group=20)

    def doc_collocations(sf_dir: str):
        """Oracle-checked: top-50 adjacent-bigram collocations by the
        PMI ratio c_ab·N/(c_a·c_b) — a RATIONAL score (int64 products
        cast to double, one division), so the ranking and the hash are
        libm-free exact against the SQL oracle."""
        from kgflow.ops.text import collocations

        return collocations(_docs(sf_dir), min_count=5, k=50)

    def doc_bm25(sf_dir: str):
        """Oracle-checked: BM25 top-20 docs for a fixed 4-term query
        (log-free idf variant — every op is a correctly-rounded IEEE
        +,−,×,÷ sequenced identically on both sides, so the float
        scores are bit-identical; terms summed in fixed order)."""
        from kgflow.ops.text import bm25_topk

        return bm25_topk(_docs(sf_dir), _BM25_TERMS, k=20)

    def events_user_paths(sf_dir: str):
        """Oracle-checked: per-user ORDERED event-type path —
        string_agg(event_type, '>' ORDER BY ts, event_id) truncated at
        50 items, plus the total count. One group-keyed exchange (the
        op's irreducible cost; ordered concat has no pre-shrink
        combiner)."""
        import os as _os

        from kgflow.ops.relational import ordered_collect
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        return ordered_collect(
            ev, "user_id", ["ts", "event_id"], "event_type", max_items=50
        )

    def events_value_sketch(sf_dir: str):
        """Oracle-checked: bottom-k sample quantile SKETCH — constant
        exchange size where exact histograms grow with the value
        domain. Deterministic (FNV id-hash sample is a pure
        min-semilattice, partitioning-independent), so the DuckDB
        oracle reproduces the sample and quantiles bit-exactly:
        approximate vs the data, EXACT vs the algorithm — the HLL/CMS
        oracle philosophy applied to quantiles."""
        import os as _os

        from kgflow.ops.sketch import bottomk_sample_quantiles
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "value"],
        )
        return bottomk_sample_quantiles(ev, "event_id", "value", k=1024)

    def events_gap_quantiles(sf_dir: str):
        """Oracle-checked: inter-arrival-time quantiles — per
        (user, type) stream gaps in whole seconds (date_diff
        convention, exact int64), nearest-rank ¼/½/¾ quantiles per
        event_type via the combiner-reduced histogram machinery."""
        import os as _os

        from kgflow.ops.window import gap_quantiles
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "ts", "event_id"],
        )
        return gap_quantiles(ev)

    def events_type_gini(sf_dir: str):
        """Oracle-checked: per-user Gini impurity of the event-type
        distribution — rational-exact (n² − Σc²)/n², int64 moments,
        one correctly-rounded double division; combiner + ONE
        user-keyed exchange of category-bounded count rows."""
        import os as _os

        from kgflow.ops.profile import grouped_gini
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type"],
        )
        return grouped_gini(ev, "user_id", "event_type")

    def events_mode_props(sf_dir: str):
        """Oracle-checked: per-event-type mode of props with the
        deterministic tie-break (max count, then lexicographically
        smallest value) — grouped argmax as a combiner + one
        exchange; the oracle uses a row_number() window with the
        identical ordering."""
        import os as _os

        from kgflow.ops.profile import grouped_mode
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "props"],
        )
        return grouped_mode(ev, "event_type", "props")

    def events_outliers(sf_dir: str):
        """Oracle-checked: per-event-type robust outliers
        |v − median| > 3·MAD with EXACT nearest-rank median/MAD at
        fixed-point scale 100 (the grouped_quantiles semantics the
        events_quantiles oracle already pins)."""
        import os as _os

        from kgflow.ops.profile import mad_outliers
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "event_type", "value"],
        )
        return mad_outliers(ev, ["event_type"], "value", k=3.0)

    def doc_packed(sf_dir: str):
        """Oracle-checked: greedy sequence packing — docs (in doc_id
        order) into ≤ 2000-token bins, shard-local (doc_id // 100) so
        packing parallelizes; bins numbered per shard; oversized docs
        get their own bin. The DuckDB oracle replays the identical
        greedy scan with a recursive CTE over per-shard boundary
        jumps."""
        from kgflow.ops.text import pack_sequences

        return pack_sequences(_docs(sf_dir), budget=2000, shard_size=100)

    def doc_length_deciles(sf_dir: str):
        """Oracle-checked: NTILE(10) / PERCENT_RANK / CUME_DIST of
        documents by length within each language — the shipped
        distribution_window machinery (one exchange, integer-exact
        front-loaded tiles, total order via doc_id tie-break) applied
        to the documents table."""
        import os as _os

        from kgflow.ops.window import distribution_window
        from kgflow.sources.parquet import read_parquet_clean

        d = read_parquet_clean(
            _os.path.join(sf_dir, "documents.parquet"),
            columns=["lang", "doc_id", "n_chars"],
        )
        return distribution_window(
            d, key="lang", id_col="doc_id", value_col="n_chars", tiles=10
        )

    def events_session_quantiles(sf_dir: str):
        """Oracle-checked: quantiles of gap-session durations —
        `sessionize` (one user-keyed exchange) composed with the exact
        nearest-rank quantile machinery at scale=1 (durations are
        whole seconds, so the fixed-point round is the identity)."""
        import os as _os

        from kgflow.ops.profile import column_quantiles
        from kgflow.ops.window import sessionize
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "value"],
        )
        return column_quantiles(
            sessionize(ev), col="duration_s", qs=(0.25, 0.5, 0.75), scale=1
        )

    def doc_readability(sf_dir: str):
        """Oracle-checked: per-doc Flesch reading-ease — vowel-group
        syllable heuristic, sentence floor 1, score computed in the
        same left-to-right float64 order as the SQL e0 literals so the
        doubles are bit-identical (no tolerance). Exchange-free."""
        from kgflow.ops.text import flesch_scores

        return flesch_scores(_docs(sf_dir))

    def doc_diversity(sf_dir: str):
        """Oracle-checked: per-doc Simpson lexical concentration
        Σtf²/n² — exact int64 moments, ONE correctly-rounded double
        division (the rational cousin of entropy; exchange-free)."""
        from kgflow.ops.text import simpson_diversity

        return simpson_diversity(_docs(sf_dir))

    def events_path_trigrams(sf_dir: str):
        """Oracle-checked: top-25 most frequent consecutive 3-step
        event sequences across per-user ordered streams — sequence
        mining via one user-keyed exchange + shifted-array gram masks,
        then a count reduce and the global_topk semigroup."""
        import os as _os

        from kgflow.ops.window import path_ngrams
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        return path_ngrams(ev, n=3, k=25)

    def events_triangles(sf_dir: str):
        """Oracle-checked: exact triangle count of the user co-activity
        graph (edge = two users active in the same (event_type, hour)
        cell) — degree-oriented wedge join, each triangle counted
        once. Non-vacuous: the hour graph is NOT the complete graph
        (7,788 of 11,175 possible edges at sf0.01)."""
        import os as _os

        import pyarrow as _pa
        import pyarrow.compute as _pc

        from kgflow.ops.graph import cooccurrence_edges, triangle_count
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "ts"],
        )

        def add_hour(batch: "_pa.Table") -> "_pa.Table":
            w = _pc.floor_temporal(batch.column("ts"), unit="hour")
            return _pa.table(
                {
                    "user_id": batch.column("user_id"),
                    "event_type": batch.column("event_type"),
                    "w": w,
                }
            )

        cells = ev.map_batches(add_hour, batch_format="pyarrow")
        edges = cooccurrence_edges(cells, "user_id", ["event_type", "w"])
        return triangle_count(edges)

    def events_clustering(sf_dir: str):
        """Oracle-checked: per-node exact triangle count + local
        clustering coefficient of the user co-activity graph (same
        edge construction as events_triangles) — degree-oriented
        wedge join keeping the wedge center, 3-corner credit melt +
        combiner → ONE V-bounded int64 exchange; left join keeps
        zero-triangle nodes (`kgflow.ops.graph.local_clustering`)."""
        import os as _os

        import pyarrow as _pa
        import pyarrow.compute as _pc

        from kgflow.ops.graph import cooccurrence_edges, local_clustering
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "ts"],
        )

        def add_hour(batch: "_pa.Table") -> "_pa.Table":
            w = _pc.floor_temporal(batch.column("ts"), unit="hour")
            return _pa.table(
                {
                    "user_id": batch.column("user_id"),
                    "event_type": batch.column("event_type"),
                    "w": w,
                }
            )

        cells = ev.map_batches(add_hour, batch_format="pyarrow")
        edges = cooccurrence_edges(cells, "user_id", ["event_type", "w"])
        return local_clustering(edges)

    def events_components(sf_dir: str):
        """Oracle-checked: connected components of the co-purchase
        graph (edge = two users sharing a props value among purchase
        events with value > 99) — the shipped CC machinery
        (`kgflow.linking.cc`, min-label) on int64 nodes; the oracle is
        a recursive-CTE transitive closure. Non-vacuous: 5 components
        over 114 users at sf0.01 (threshold chosen so the graph does
        NOT percolate into one blob)."""
        import os as _os

        import pandas as _pd

        from kgflow.linking.cc import connected_components
        from kgflow.ops.graph import cooccurrence_edges
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "props", "value"],
        )

        def cells(df: _pd.DataFrame) -> _pd.DataFrame:
            m = (df["event_type"] == "purchase") & (df["value"] > 99.0)
            return df.loc[m, ["user_id", "props"]]

        edges = cooccurrence_edges(
            ev.map_batches(cells, batch_format="pandas"),
            "user_id",
            ["props"],
        ).map_batches(
            lambda d: d.rename(columns={"u": "src", "v": "dst"}),
            batch_format="pandas",
        )
        # star = O(log n) rounds; each CC round costs ~2 exchanges of
        # fixed Ray overhead at toy scale, so round count dominates
        return connected_components(edges, algorithm="star")

    def events_modularity(sf_dir: str):
        """Oracle-checked: per-community modularity components over
        the co-purchase graph (same edges + CC labels as
        events_components) — (community, n_nodes, internal_edges,
        total_degree), the exact-integer ingredients of Newman Q,
        emitted unreduced so the score stays rational; label map
        broadcast, ONE streaming edge pass
        (`kgflow.ops.graph.community_stats`)."""
        import os as _os

        import pandas as _pd

        from kgflow.linking.cc import connected_components
        from kgflow.ops.graph import community_stats, cooccurrence_edges
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "props", "value"],
        )

        def cells(df: _pd.DataFrame) -> _pd.DataFrame:
            m = (df["event_type"] == "purchase") & (df["value"] > 99.0)
            return df.loc[m, ["user_id", "props"]]

        edges = cooccurrence_edges(
            ev.map_batches(cells, batch_format="pandas"),
            "user_id",
            ["props"],
        ).materialize()  # E-bounded; consumed by CC AND the stats pass
        labels = connected_components(
            edges.map_batches(
                lambda d: d.rename(columns={"u": "src", "v": "dst"}),
                batch_format="pandas",
            ),
            algorithm="star",
        )
        return community_stats(edges, labels)

    def doc_inverted_index(sf_dir: str):
        """Oracle-checked: inverted index — per token, document
        frequency + the first 20 ascending posting doc_ids (bounded row
        size even for web-scale stop-tokens)."""
        from kgflow.ops.text import inverted_index

        return inverted_index(_docs(sf_dir), max_postings=20)

    def events_funnel(sf_dir: str):
        """Oracle-checked: sequential view→click→purchase conversion
        funnel (min-timestamp chaining with (ts, event_id) total-order
        tiebreaks), over the value>60 event slice so the step counts
        actually discriminate (148 > 139 > 119 at sf0.01 — the
        non-vacuous-oracle rule)."""
        import os as _os

        import pyarrow.compute as _pc

        from kgflow.ops.window import funnel_counts
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type", "value"],
        )

        def thin(batch):
            out = batch.filter(_pc.greater(batch.column("value"), 60.0))
            return out.select(["user_id", "ts", "event_id", "event_type"])

        ev = ev.map_batches(thin, batch_format="pyarrow")
        return funnel_counts(ev, ["view", "click", "purchase"])

    def events_cohorts(sf_dir: str):
        """Oracle-checked: weekly cohort retention triangle — users
        cohorted by the Monday week of their first event; integer-exact
        week arithmetic (floor_temporal ≙ date_trunc('week'), //7)."""
        import os as _os

        from kgflow.ops.window import cohort_retention
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
        )
        return cohort_retention(ev)

    def doc_pii_redact(sf_dir: str):
        """Oracle-checked: PII redaction (email/IP/phone → typed
        placeholders) with deterministically PLANTED PII on engine AND
        oracle sides — the driver corpus has none, so an unplanted
        oracle would be vacuous (the embed_neardup lesson). Patterns
        are RE2-compatible strings shared verbatim with the SQL side;
        n_redactions counts hits per pattern on the progressively
        redacted text, mirrored by the oracle's CTE chain."""
        import pandas as pd

        from kgflow.ops.clean import redact_pii

        def plant(df: pd.DataFrame) -> pd.DataFrame:
            df = df[["doc_id", "text"]].copy()
            m = df["doc_id"] % 10 == 0
            df.loc[m, "text"] = (
                df.loc[m, "text"]
                + " contact user@example.com at 10.0.0.1 or call 555-123-4567"
            )
            return df

        return redact_pii(_docs(sf_dir).map_batches(plant, batch_format="pandas"))

    def doc_repetition(sf_dir: str):
        """Oracle-checked: Gopher-style duplicate-bigram fraction per
        doc (floor-scaled 1e4; integer set/len arithmetic so the float
        divide is bit-identical across engines)."""
        from kgflow.ops.clean import repetition_stats

        return repetition_stats(_docs(sf_dir))

    def doc_contamination(sf_dir: str):
        """Oracle-checked: benchmark-contamination screen — flags docs
        sharing any word 8-gram with a 'benchmark suite' (the texts of
        doc_id < 5, so planted positives exist: those docs flag
        themselves, plus any true overlaps). Engine compares 64-bit
        shingle fingerprints (collision ~1e-9); oracle intersects the
        string shingle lists."""
        import pyarrow.parquet as pq

        from kgflow.ops.clean import contamination_screen

        bench = (
            pq.read_table(
                os.path.join(sf_dir, "documents.parquet"),
                columns=["doc_id", "text"],
                filters=[("doc_id", "<", 5)],
            )
            .column("text")
            .to_pylist()
        )
        return contamination_screen(_docs(sf_dir), bench, n=8)

    def doc_incremental_new(sf_dir: str):
        """Oracle-checked: Bloom-filter incremental dedup — 'yesterday's
        crawl' (doc_id < 250) builds the filter, today's corpus keeps
        only definitely-new texts. At this load factor (250 keys in 2^22
        bits) the false-positive probability is ~1e-12, so the output
        equals the exact NOT IN oracle; the guarantee direction (no old
        text ever survives) is unconditional."""
        import pandas as pd

        from kgflow.ops.sketch import bloom_build, bloom_filter_new

        docs = _docs(sf_dir)
        old = docs.filter(expr="doc_id < 250")
        words = bloom_build(old, "text")
        out = bloom_filter_new(docs, "text", words)
        return out.map_batches(
            lambda df: pd.DataFrame({"doc_id": df["doc_id"]}), batch_format="pandas"
        )

    def doc_top_terms(sf_dir: str):
        """Oracle-checked: per-doc top-3 distinctive terms ranked
        (tf DESC, df ASC, token ASC) — integer-exact keys, so
        hash-exact; the float-scored TF-IDF variant is pytest-gated
        (`kgflow.ops.text.tfidf_terms`)."""
        from kgflow.ops.text import top_terms

        return top_terms(_docs(sf_dir), k=3)

    def doc_langid(sf_dir: str):
        """Oracle-checked (round-4): the stopword-profile heuristic is
        pure counting + argmax-with-first-wins tie-break, restated in
        SQL as per-doc stopword counts and an ordered CASE chain (same
        denominator ⇒ comparing raw counts equals comparing ratios);
        CJK detection is the same codepoint-class regex."""
        from kgflow.ops.text import lang_id

        return lang_id(_docs(sf_dir)).select_columns(["doc_id", "lang_pred"])

    def doc_rolling_fp(sf_dir: str):
        """Oracle-checked (round-4): the Rabin-Karp rolling fingerprint
        is wrapping-uint64 FNV token hashes + a window-16 polynomial
        min — restated EXACTLY in SQL with HUGEINT modular arithmetic
        (the doc_simhash_pairs FNV-in-SQL trick, plus list_slice windows
        and list_min). Driver text is ASCII, so codepoint == byte."""
        from kgflow.ops.text import rolling_fingerprint

        return rolling_fingerprint(_docs(sf_dir))

    def doc_dupspan(sf_dir: str):
        """Oracle-checked (round-4): per-document duplicated-span
        counts — the ExactSubstr signal (Lee et al. 2022) as a
        token-window-8 metric: a gram is duplicated iff its n-gram
        occurs in ≥2 documents. Gram fingerprints are the
        doc_rolling_fp HUGEINT fold (FNV token hashes + window
        polynomial), so SQL reproduces every fp bit-exactly; the
        output is pure int64 counts → hash-stable."""
        from kgflow.ops.dedup import dupspan_counts

        return dupspan_counts(_docs(sf_dir), window=8)

    def doc_gopher_rules(sf_dir: str):
        """Oracle-checked (round-4): the Gopher heuristic quality-rule
        bundle (Rae et al. 2021 A1.1) — word-count / mean-word-length
        / stopword / numeric-fraction / ellipsis-line rules as int64
        0/1 flags, every ratio cross-multiplied so the whole row is
        integer-exact and hash-stable. min_stopwords=1 here (paper
        default 2): the synthetic corpus' closed vocabulary reaches
        only one list word, and an all-zero rule column would be a
        vacuous check."""
        from kgflow.ops.clean import gopher_rules

        return gopher_rules(_docs(sf_dir), min_stopwords=1)

    def doc_mix_weights(sf_dir: str):
        """Oracle-checked (round-4): temperature-based source mixture
        weights (XLM / mC4 sampling rule, alpha=0.3) — per-source
        token counts are exact int64; pow/divide are the only floats
        (1e-6 comparator grade)."""
        from kgflow.ops.text import source_mix_weights

        return source_mix_weights(_docs(sf_dir), alpha=0.3)

    def doc_sample_plan(sf_dir: str):
        """Oracle-checked (round-4): exact Hamilton apportionment of a
        10k-example epoch budget across sources proportional to token
        counts — all-int64, Σ quota == budget exactly, remainder ties
        break source ASC on both engines."""
        from kgflow.ops.text import apportion_budget

        return apportion_budget(_docs(sf_dir), budget=10_000)

    def doc_zipf_alpha(sf_dir: str):
        """Oracle-checked (round-4): Hill estimator of the vocabulary
        Zipf tail over the top-20 token frequencies (the synthetic corpus
        has 31 distinct tokens); boundary ties
        break (n DESC, token ASC) identically on both engines."""
        from kgflow.ops.text import zipf_alpha

        return zipf_alpha(_docs(sf_dir), k=20)

    def doc_curation(sf_dir: str):
        """Oracle-checked (round-4): the composed corpus-curation
        pass — Gopher rules ∧ duplicated-span cap (<25%) ∧ DSIR score
        attach (`kgflow.pipelines.curate.curate_docs`). Selection is
        integer-exact on both sides; the DSIR float rides along at
        the ln-sum comparator grade."""
        from kgflow.pipelines.curate import curate_docs

        return curate_docs(
            _docs(sf_dir), target_source="src0", min_stopwords=1
        )

    def doc_novelty(sf_dir: str):
        """Oracle-checked (round-4): first-occurrence novelty — the
        incremental-corpus substring-dedup view (a gram is novel iff
        no lower-id doc contains it); same HUGEINT gram fold as
        doc_dupspan, pure int64 outputs."""
        from kgflow.ops.dedup import novelty_counts

        return novelty_counts(_docs(sf_dir), window=8)

    def doc_dsir_score(sf_dir: str):
        """Oracle-checked (round-4): DSIR importance weighting (Xie et
        al. 2023) in its hashed-unigram form — FNV-1a token hashes mod
        1024 buckets (the events_feature_hash SQL fold), add-one
        smoothed target-vs-pool bucket distributions (target slice:
        source = 'src0'), per-doc log importance weight. Counts are
        exact int64 on both sides; the only float is the final ln sum
        (doc_perplexity comparator grade)."""
        from kgflow.ops.text import dsir_scores

        return dsir_scores(_docs(sf_dir), target_source="src0")

    def doc_boilerplate_strip(sf_dir: str):
        """Oracle-checked (round-4): cross-document repeated-span
        (boilerplate) removal — any word 8-gram with > 20 corpus-wide
        occurrences is stripped from every covering position
        (`kgflow.ops.clean.strip_hot_spans`; CCNet repeated-paragraph /
        Lee et al. substring-dedup family). The query plants a fixed
        10-word boilerplate tail on doc_id % 5 == 0 on BOTH sides (the
        embed_neardup planting pattern) so the threshold is non-vacuous;
        clean_text strings compare byte-exact."""
        import pandas as pd

        from kgflow.ops.clean import strip_hot_spans

        BOILER = (
            "subscribe to our newsletter for updates terms of service apply"
        )

        def plant(df):
            df = df[["doc_id", "text"]].copy()
            m = df["doc_id"] % 5 == 0
            df.loc[m, "text"] = df.loc[m, "text"] + " " + BOILER
            return df

        planted = _docs(sf_dir).map_batches(plant, batch_format="pandas")
        return strip_hot_spans(planted, k=8, max_df=20)

    def doc_minhash_pairs(sf_dir: str):
        """Oracle-checked (round-3): the verify stage computes EXACT
        word-trigram Jaccard, so the DuckDB oracle recomputes true
        Jaccard over all pairs with list functions. The only gap is LSH
        recall; every driver-data pair above the 0.5 threshold has
        Jaccard ≥ 0.9, where the 16-band/4-row miss probability is
        (1-0.9^4)^16 ≈ 4e-8. sim is floor-scaled 1e4 on both sides;
        identical integer set sizes ⇒ identical doubles."""
        from kgflow.ops.dedup import minhash_pairs

        return minhash_pairs(_docs(sf_dir)).map_batches(
            lambda df: _floor_scale_pd(df, "sim", 1e4), batch_format="pandas"
        )

    def doc_jaccard_pairs(sf_dir: str):
        """Oracle-checked (round-3): EXACT prefix-filter Jaccard
        self-join (AllPairs/PPJoin family) — lossless candidate
        generation, so unlike doc_minhash_pairs there is no LSH recall
        caveat at all; the DuckDB oracle is the plain all-pairs
        true-Jaccard predicate. sim floor-scaled 1e4 on both sides."""
        from kgflow.ops.dedup import jaccard_pairs

        return jaccard_pairs(_docs(sf_dir)).map_batches(
            lambda df: _floor_scale_pd(df, "sim", 1e4), batch_format="pandas"
        )

    def doc_containment(sf_dir: str):
        """Oracle-checked (round-4): EXACT n-gram containment
        (overlap-coefficient) self-join — |A∩B| / min(|A|,|B|) ≥ 0.8,
        the quote/inclusion detector Jaccard structurally misses. The
        query plants excerpt docs on BOTH sides (first 40 tokens of
        every doc_id % 7 == 3 source plus five novel qa..qe{id} tokens,
        ids offset +1e6 — the boilerplate planting pattern), so the
        result contains pairs strictly between 0.8 and 1.0 whose true
        Jaccard is ~0.35, i.e. the measure is exercised non-vacuously.
        sim floor-scaled 1e4 on both sides."""
        import re as _re

        from kgflow.ops.dedup import containment_pairs

        tok_re = _re.compile(r"\w+")

        def plant(df):
            df = df[["doc_id", "text"]]
            src = df[df["doc_id"] % 7 == 3]
            rows = []
            for did, t in zip(src["doc_id"], src["text"]):
                toks = tok_re.findall(t.lower())[:40]
                toks += [f"q{c}{did}" for c in "abcde"]
                rows.append((did + 1_000_000, " ".join(toks)))
            import pandas as pd

            exc = pd.DataFrame(rows, columns=["doc_id", "text"])
            return pd.concat([df, exc], ignore_index=True)

        planted = _docs(sf_dir).map_batches(plant, batch_format="pandas")
        return containment_pairs(planted, threshold=0.8).map_batches(
            lambda df: _floor_scale_pd(df, "sim", 1e4), batch_format="pandas"
        )

    def doc_typo_pairs(sf_dir: str):
        """Oracle-checked (round-4): prefix-blocked edit-distance
        near-dup join — pairs sharing a 16-char prefix with
        Levenshtein ≤ 3 (typo/OCR-variant detection; prefix equality
        is part of the predicate, so blocking is recall-complete).
        The query plants a one-substitution typo copy (char 21 flipped,
        ids +2e6) of every doc_id % 11 == 5 source on BOTH sides, so
        dist-1 pairs exist beyond the planted exact dupes' dist-0."""
        from kgflow.ops.dedup import edit_distance_pairs

        def plant(df):
            import pandas as pd

            df = df[["doc_id", "text"]]
            src = df[(df["doc_id"] % 11 == 5) & (df["text"].str.len() >= 21)]
            mut = src["text"].str[:20] + np.where(
                src["text"].str[20] == "z", "y", "z"
            ) + src["text"].str[21:]
            typo = pd.DataFrame(
                {"doc_id": src["doc_id"] + 2_000_000, "text": mut}
            )
            return pd.concat([df, typo], ignore_index=True)

        planted = _docs(sf_dir).map_batches(plant, batch_format="pandas")
        return edit_distance_pairs(planted)

    def doc_vocab_editdist(sf_dir: str):
        """Oracle-checked: symmetric-deletion edit-distance self-join
        (SymSpell blocking, recall-complete for Levenshtein ≤ 2 —
        catches the first-char typos prefix blocking misses) over the
        clean a-z vocabulary. The fixture lexicon is closed with no
        natural near-tokens, so the query plants two deterministic
        mutations per token (t+'x', t[1:]) on BOTH engines — real
        pair discovery, known ED-1/ED-2 structure."""
        import pandas as pd

        from kgflow.ops.dedup import symdelete_pairs
        from kgflow.ops.text import filtered_vocab

        vocab = filtered_vocab(_docs(sf_dir), min_len=5, max_len=20, min_count=2)

        def augment(df):
            t = df["token"].astype(str)
            out = pd.concat(
                [t, t + "x", t.str[1:]], ignore_index=True
            ).drop_duplicates()
            return pd.DataFrame({"token": out})

        aug = vocab.map_batches(augment, batch_format="pandas")
        return symdelete_pairs(aug, token_col="token", max_dist=2)

    def events_cusum(sf_dir: str):
        """Oracle-checked: CUSUM change-point detection over daily
        counts per type — integer-exact via the prefix identity
        S_t = P_t − min(0, min prefix P); k = exact nearest-rank
        median daily count."""
        from kgflow.ops.relational import events_daily_cusum

        return events_daily_cusum(sf_dir)

    def events_streaks(sf_dir: str):
        """Oracle-checked: longest consecutive-active-day streak per
        user — gaps-and-islands via day − rank island keys, one
        user-bucketed exchange over deduped (user, day) rows."""
        from kgflow.ops.relational import events_daily_streaks

        return events_daily_streaks(sf_dir)

    def lineitem_fd_audit(sf_dir: str):
        """Oracle-checked: functional-dependency audit — l_partkey
        values served by MORE than one supplier, with the exact
        distinct-supplier count (schema discovery / candidate-key
        mining; `kgflow.ops.checks.fd_violations`)."""
        from kgflow.ops.checks import fd_violations
        from kgflow.sources.parquet import read_parquet_clean

        li = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey"],
        )
        return fd_violations(li, det_col="l_partkey", dep_col="l_suppkey")

    def lineitem_corr_matrix(sf_dir: str):
        """Oracle-checked: all-pairs bivariate moment MATRIX over the
        four numeric lineitem columns in ONE pass — (col_a, col_b, n,
        sx, sy, sxy) exact via chunked Python-int accumulation;
        Pearson r / cov are driver-side closed forms over the 10
        hash-exact rows (`kgflow.ops.profile.moment_matrix`)."""
        from kgflow.ops.profile import moment_matrix
        from kgflow.sources.parquet import read_parquet_clean

        cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        li = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"), columns=cols
        )
        return moment_matrix(li, cols=cols, scales={c: 100 for c in cols})

    def events_target_encode(sf_dir: str):
        """Oracle-checked: leave-one-out target encoding of event_type
        by value — integer-exact (te_num, te_den) fraction per row;
        category stats broadcast, the corpus never shuffles
        (`kgflow.ops.encode.loo_target_encode`)."""
        from kgflow.ops.encode import loo_target_encode
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "event_type", "value"],
        )
        return loo_target_encode(
            ev, id_col="event_id", cat_col="event_type", y_col="value"
        )

    def events_feature_hash(sf_dir: str):
        """Oracle-checked: feature-hashing trick — the event_type ×
        hour-of-day cross hashed into 64 fixed buckets with the
        engine/SQL-identical FNV-1a fold; purely map-side, no
        vocabulary pass (`kgflow.ops.encode.hash_bucket_encode`)."""
        import pandas as pd

        from kgflow.ops.encode import hash_bucket_encode
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "event_type", "ts"],
        )

        def add_hour(d: pd.DataFrame) -> pd.DataFrame:
            d = d.copy()
            d["hr"] = d["ts"].dt.hour.astype(np.int64)
            return d[["event_id", "event_type", "hr"]]

        return hash_bucket_encode(
            ev.map_batches(add_hour, batch_format="pandas"),
            id_col="event_id",
            cat_cols=["event_type", "hr"],
            n_buckets=64,
        )

    def embed_quantize(sf_dir: str):
        """Oracle-checked: per-dimension int8-style scalar quantization
        of the embedding store (the compression pass before IVF/PQ
        indexing) — global per-dim min/max broadcast, codes evaluated
        in float64 on both engines so IEEE makes them bit-identical
        (`kgflow.ops.ann.quantize_embeddings`)."""
        from kgflow.ops.ann import quantize_embeddings
        from kgflow.sources.parquet import read_parquet_clean

        emb = read_parquet_clean(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        return quantize_embeddings(emb)

    def embed_pq(sf_dir: str):
        """Rows-only (approximate by design, like the pruned IVF
        paths): product-quantization codes — per-subspace L2 k-means
        codebooks trained on the sorted bounded sample, map-only
        encode; determinism + nearest-centroid + compression-quality
        properties are pytest-pinned (`kgflow.ops.ann.pq_encode`)."""
        from kgflow.ops.ann import pq_encode
        from kgflow.sources.parquet import read_parquet_clean

        emb = read_parquet_clean(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        return pq_encode(emb)

    def ann_pq_topk(sf_dir: str):
        """Rows-only (approximate by design): PQ-ADC search — queries
        in float32, corpus scanned as 8-byte PQ codes, distances via S
        table lookups per vector; recall@k vs the exact scan is
        pytest-pinned (`kgflow.ops.ann.pq_adc_topk`)."""
        from kgflow.ops.ann import pq_adc_topk
        from kgflow.sources.parquet import read_parquet_clean

        qids, qm = _queries_for(sf_dir)
        emb = read_parquet_clean(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        return pq_adc_topk(emb, qids, qm, k=5).select_columns(
            ["query_id", "neighbor_id"]
        )

    def doc_auc(sf_dir: str):
        """Oracle-checked: exact corpus-scale ROC-AUC via the
        Mann-Whitney identity over a score-domain-bounded histogram —
        does document length rank the long-form sources above the
        rest? One row (n_pos, n_neg, u2); auc = u2/(2·n_pos·n_neg) is
        the caller's float (`kgflow.ops.profile.binary_auc_exact`)."""
        import pandas as pd

        from kgflow.ops.profile import binary_auc_exact

        POS = {"src1", "src7", "src11", "src13"}

        def label(d: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "y": d["source"].isin(POS).astype(np.int64),
                    "n_chars": d["n_chars"].astype(np.int64),
                }
            )

        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["source", "n_chars"],
        )
        return binary_auc_exact(
            docs.map_batches(label, batch_format="pandas"),
            label_col="y",
            score_col="n_chars",
        )

    def events_survival(sf_dir: str):
        """Oracle-checked: Kaplan-Meier input table over user
        lifetimes — exact (t, n_event, n_censored, n_at_risk) with
        7-day right-censoring at the corpus horizon, all time math in
        int64 microseconds (`kgflow.ops.window.survival_counts`)."""
        from kgflow.ops.window import survival_counts
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
        )
        return survival_counts(ev)

    def doc_ks_drift(sf_dir: str):
        """Oracle-checked: exact two-sample Kolmogorov-Smirnov drift
        statistic between two sources' document-length distributions,
        cross-multiplied to stay integer — D = d_num/(n_a·n_b) is the
        caller's float (`kgflow.ops.profile.ks_two_sample_exact`)."""
        from kgflow.ops.profile import ks_two_sample_exact
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["source", "n_chars"],
        )
        return ks_two_sample_exact(
            docs, group_col="source", value_col="n_chars",
            group_a="src1", group_b="src8",
        )

    def doc_bpe_merges(sf_dir: str):
        """Rows-only (iterative; merges are not SQL-expressible): the
        first 10 BPE merges trained on the corpus word-frequency table
        — one corpus pass, then vocabulary-bounded rounds; the merge
        sequence is deterministic (count DESC, pair ASC ties) and
        pytest-pinned against a hand-computed reference
        (`kgflow.ops.text.bpe_merges`)."""
        from kgflow.ops.text import bpe_merges

        return bpe_merges(_docs(sf_dir), n_merges=10)

    def doc_bpe_encode(sf_dir: str):
        """Rows-only (the merge loop is not SQL-expressible; pinned on
        a hand-computed corpus + reconstruction invariant in
        tests/test_wave17.py): apply the 10 trained BPE merges to
        encode the corpus — per-doc long-format subword counts; the
        merge table ships ONCE per actor and a per-actor word cache
        bounds the merge scan to DISTINCT words
        (`kgflow.ops.text.bpe_encode`)."""
        from kgflow.ops.text import bpe_encode, bpe_merges

        merges = bpe_merges(_docs(sf_dir), n_merges=10)
        return bpe_encode(_docs(sf_dir), merges)

    def doc_cross_dups(sf_dir: str):
        """Oracle-checked (the doc_minhash_pairs true-Jaccard SQL over
        the CROSS product of the two derived sides): bipartite near-dup
        join — the incremental-ingest shape (new crawl vs existing
        corpus). ONE map emits side 0 (every doc) and side 1
        (suffix-perturbed copies of every 7th doc, ids +3e6) — a
        single-lineage sided dataset by design: ray 2.49 unions with
        shared lineage were observed to duplicate blocks and float-
        upcast the exchange key (documented in
        `kgflow.ops.dedup.cross_minhash_pairs`). Only cross-side pairs
        are enumerated in-bucket; id collisions across sides raise."""
        import pandas as pd

        from kgflow.ops.dedup import cross_minhash_pairs

        def sided(df: pd.DataFrame) -> pd.DataFrame:
            a = pd.DataFrame(
                {
                    "doc_id": df["doc_id"].astype(np.int64),
                    "text": df["text"].astype(str),
                    "side": np.zeros(len(df), dtype=np.int8),
                }
            )
            d = df.loc[df["doc_id"] % 7 == 0]
            b = pd.DataFrame(
                {
                    "doc_id": d["doc_id"].astype(np.int64) + 3_000_000,
                    "text": d["text"].astype(str) + " qq zz xx",
                    "side": np.ones(len(d), dtype=np.int8),
                }
            )
            return pd.concat([a, b], ignore_index=True)

        docs = _docs(sf_dir).select_columns(["doc_id", "text"]).map_batches(
            sided, batch_format="pandas"
        )
        return cross_minhash_pairs(docs, threshold=0.5).map_batches(
            lambda df: _floor_scale_pd(df, "sim", 1e4), batch_format="pandas"
        )

    def doc_winnow(sf_dir: str):
        """Oracle-checked: MOSS winnowing — the distinct set of local
        minima of every 8 consecutive 16-token rolling hashes per doc
        (coverage-guaranteed local fingerprints; shares doc_rolling_fp's
        HUGEINT FNV/poly SQL restatement)."""
        from kgflow.ops.text import winnow_fingerprints

        return winnow_fingerprints(_docs(sf_dir))

    def doc_winnow_pairs(sf_dir: str):
        """Oracle-checked: MOSS similarity pairs — docs sharing ≥ 2
        winnowing fingerprints with the exact shared count; fp-keyed
        pair exchange + pair-keyed count, ids-only on the wire
        (`kgflow.ops.text.winnow_pairs`)."""
        from kgflow.ops.text import winnow_pairs

        return winnow_pairs(_docs(sf_dir))

    def doc_calibration(sf_dir: str):
        """Rows-only (PAV's sequential pooling is not SQL-expressible;
        exactness is pytest-pinned against a rational-arithmetic
        reference): isotonic calibration of P(long-form source | doc
        length) — per distinct length, the exact pooled block fraction
        (`kgflow.ops.profile.isotonic_calibrate`)."""
        import pandas as pd

        from kgflow.ops.profile import isotonic_calibrate
        from kgflow.sources.parquet import read_parquet_clean

        POS = {"src1", "src7", "src11", "src13"}

        def label(d: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "y": d["source"].isin(POS).astype(np.int64),
                    "n_chars": d["n_chars"].astype(np.int64),
                }
            )

        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["source", "n_chars"],
        )
        return isotonic_calibrate(
            docs.map_batches(label, batch_format="pandas"),
            label_col="y",
            score_col="n_chars",
        )

    def events_winsorized(sf_dir: str):
        """Oracle-checked: per-event-type winsorization — clip value
        into the exact nearest-rank [⅛, ⅞] quantile band (fixed-point
        scale 100, the events_quantiles semantics); output doubles are
        raw values or band edges, hash-exact."""
        import os as _os

        from kgflow.ops.clean import winsorize
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "event_type", "value"],
        )
        return winsorize(ev, ["event_type"], "value")

    # doc_dup_clusters and doc_canonical_keep consume the SAME LSH→CC
    # cluster table; memoize it per sf dir (the _triples_memo pattern)
    # so a driver sweep runs the clustering once, not twice.
    _clusters_memo: dict[str, Any] = {}

    def _clusters_mat(sf_dir: str):
        from kgflow.ops.dedup import neardup_clusters

        if sf_dir not in _clusters_memo:
            _clusters_memo[sf_dir] = neardup_clusters(
                _docs(sf_dir)
            ).materialize()
        return _clusters_memo[sf_dir]

    def doc_dup_clusters(sf_dir: str):
        """Oracle-checked (round-3): LSH pairs → connected components;
        the oracle runs the same true-Jaccard pair predicate and a
        recursive-CTE transitive closure with min-doc_id labels."""
        return _clusters_mat(sf_dir)

    def doc_simhash_pairs(sf_dir: str):
        """Oracle-checked (round-3): the DuckDB oracle recomputes the
        64-bit simhash EXACTLY in SQL (FNV-1a via list_reduce over
        codepoints — driver text is ASCII so codepoint == byte — sign
        votes per bit, bit-63 mask) and compares hamming via
        bit_count(xor(...)). max_hamming=3 < bands=4 guarantees banded
        recall by pigeonhole (Manku et al.), so engine output equals
        the exact all-pairs answer; the default max_hamming=6 variant
        (approximate for hamming 4-6) stays covered by pytest."""
        from kgflow.ops.dedup import simhash_pairs

        return simhash_pairs(_docs(sf_dir), max_hamming=3)

    # --- embeddings
    def _queries_for(sf_dir: str, n=10):
        """Pick the n smallest vec_ids as demo queries. Two pruned reads
        instead of one full-table driver pull (round-4 fix): first the
        8-byte id column only, then a predicate-pushed read of exactly
        the n chosen rows — the driver never holds the embedding matrix."""
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, "embeddings.parquet")
        ids = pq.read_table(path, columns=["vec_id"]).column("vec_id").to_numpy()
        qids = sorted(int(x) for x in np.partition(ids, min(n, len(ids)) - 1)[:n])
        t = pq.read_table(
            path,
            columns=["vec_id", "embedding"],
            filters=[("vec_id", "in", qids)],
        )
        df = t.to_pandas().sort_values("vec_id")
        return df["vec_id"].tolist(), np.asarray(list(df["embedding"]), dtype=np.float32)

    def ann_topk(sf_dir: str):
        import ray.data as rd

        from kgflow.ops.ann import brute_force_topk

        qids, qm = _queries_for(sf_dir)
        from kgflow.sources.parquet import read_parquet_clean

        emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))
        out = brute_force_topk(emb, qids, qm, k=5)
        # drop the float score: engines agree on top-k membership but can
        # disagree in the last ulp of the similarity value
        return out.select_columns(["query_id", "neighbor_id"])

    def ann_lsh_topk(sf_dir: str):  # approximate → rows-only
        import ray.data as rd

        from kgflow.ops.ann import lsh_topk

        qids, qm = _queries_for(sf_dir)
        from kgflow.sources.parquet import read_parquet_clean

        emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))
        return lsh_topk(emb, qids, qm, k=5)

    def ann_lsh_exact(sf_dir: str):
        """Oracle-checked (round-4): the SQL-checkable corner of the
        LSH surface (the ann_ivf_exact pattern): num_planes=1 with 16
        independent tables. A corpus vector is pruned only if its sign
        differs from ALL queries' signs in EVERY table; for a true
        top-5 neighbor (cos ≥ ~0.5, angle ≤ π/3) the per-table
        separation probability is ≤ 1/3, so the miss bound is
        (1/3)^16 ≈ 2e-8 — the same epistemic grade as
        doc_minhash_pairs' banding bound. Shares ann_topk's all-pairs
        cosine oracle; the pruned default variant stays rows-only."""
        from kgflow.ops.ann import lsh_topk
        from kgflow.sources.parquet import read_parquet_clean

        qids, qm = _queries_for(sf_dir)
        emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))
        out = lsh_topk(emb, qids, qm, k=5, num_planes=1, num_tables=16)
        return out.select_columns(["query_id", "neighbor_id"])

    def embed_centroids(sf_dir: str):
        """Oracle-checked: per-label embedding centroids (class
        prototypes / one exact k-means step) — quantize-first integer
        moments (the embed_gram trick), one label-keyed exchange of
        labels×dims rows, single exact double division."""
        from kgflow.ops.ann import label_centroids
        from kgflow.sources.parquet import read_parquet_clean

        emb = read_parquet_clean(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["label", "embedding"],
        )
        return label_centroids(emb)

    def embed_gram(sf_dir: str):
        """Oracle-checked (round-4): the distributed heart of
        embed_pca — the exact fixed-point second-moment matrix
        (quantize-first, so every sum is int64 with no float
        accumulation-order drift; `kgflow.ops.ann.embedding_gram`).
        The eigendecomposition itself is a driver-side dim×dim op not
        expressible in SQL, so embed_pca stays pytest-gated."""
        from kgflow.ops.ann import embedding_gram
        from kgflow.sources.parquet import read_parquet_clean

        emb = read_parquet_clean(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
        )
        return embedding_gram(emb)

    def ann_ivf_topk(sf_dir: str):  # approximate (nprobe<C) → rows-only
        import ray.data as rd

        from kgflow.ops.ann import ivf_topk

        qids, qm = _queries_for(sf_dir)
        from kgflow.sources.parquet import read_parquet_clean

        emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))
        return ivf_topk(emb, qids, qm, k=5, n_centroids=16, nprobe=4)

    def ann_ivf_stored(sf_dir: str):
        """Stored IVF-Flat layout: build once (hive-partitioned on the
        centroid id, centroid sidecar), then serve from a pruned read of
        only the probed partitions. Matches ann_ivf_topk exactly for the
        same (centroids, nprobe) — the pruning moves from an in-flight
        filter to the storage layer (rows-only; approximate at
        nprobe<C by design)."""
        import tempfile

        from kgflow.ops.ann import ivf_build_index, ivf_topk_stored
        from kgflow.sources.parquet import read_parquet_clean

        qids, qm = _queries_for(sf_dir)
        emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))
        idx = os.path.join(tempfile.gettempdir(), "kgflow_ivf_index")
        import shutil

        shutil.rmtree(idx, ignore_errors=True)
        ivf_build_index(emb, idx, n_centroids=16)
        return ivf_topk_stored(idx, qids, qm, k=5, nprobe=4)

    def ann_ivf_exact(sf_dir: str):
        """Oracle-checked: the stored IVF layout probed with nprobe ==
        n_centroids degrades to an exact scan (every partition is read),
        so the result equals brute-force top-k and shares ann_topk's
        all-pairs cosine oracle — the SQL-checkable corner of the IVF
        surface (the nprobe<C pruned paths stay rows-only by design)."""
        import shutil
        import tempfile

        from kgflow.ops.ann import ivf_build_index, ivf_topk_stored
        from kgflow.sources.parquet import read_parquet_clean

        qids, qm = _queries_for(sf_dir)
        emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))
        idx = os.path.join(tempfile.gettempdir(), "kgflow_ivf_index_exact")
        shutil.rmtree(idx, ignore_errors=True)
        C = 8
        ivf_build_index(emb, idx, n_centroids=C)
        out = ivf_topk_stored(idx, qids, qm, k=5, nprobe=C)
        return out.select_columns(["query_id", "neighbor_id"])

    def embed_pca(sf_dir: str):
        """Rows-only (float-heavy; gated by the low-rank-recovery
        pytest): distributed PCA — constant-size moment partials,
        driver eig of the dim×dim covariance, streamed projection with
        broadcast components."""
        from kgflow.ops.ann import embedding_pca
        from kgflow.sources.parquet import read_parquet_clean

        emb = read_parquet_clean(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
        )
        return embedding_pca(emb, k=8)

    def ann_lsh_exact(sf_dir: str):
        """Oracle-checked: sign-hyperplane LSH ANN with HASH-DERIVED
        integer-exact signatures (FNV ±1 directions over quantized
        int64 embeddings) — the candidate rule is replayed bit-for-bit
        by the SQL oracle, then both sides rerank candidates by exact
        cosine, so the full approximate pipeline is hash-checked (the
        float-plane `ann_lsh_topk` stays rows-only by design;
        `kgflow.ops.ann.lsh_topk_hashed`)."""
        from kgflow.ops.ann import lsh_topk_hashed
        from kgflow.sources.parquet import read_parquet_clean

        qids, qm = _queries_for(sf_dir)
        emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))
        out = lsh_topk_hashed(emb, qids, qm, k=5)
        return out.select_columns(["query_id", "neighbor_id"])

    def ann_int8_exact(sf_dir: str):
        """Oracle-checked: int8-quantized maximum-inner-product top-k
        — embeddings and queries quantize to floor(x*100) (int8-range)
        and the score is the EXACT integer dot product, so ranking,
        ties AND the score column are bit-reproducible and the oracle
        checks scores verbatim (none of the last-ulp float-cosine risk
        of the cosine oracles; `kgflow.ops.ann.int8_topk`)."""
        from kgflow.ops.ann import int8_topk
        from kgflow.sources.parquet import read_parquet_clean

        qids, qm = _queries_for(sf_dir)
        emb = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"))
        return int8_topk(emb, qids, qm, k=5)

    def ann_int8_recall(sf_dir: str):
        """Oracle-checked: quantization recall audit — per query, the
        overlap |int8-MIPS top-5 ∩ float-cosine top-5| (the deployment
        question "what does int8 quantization cost in recall",
        answered with two deterministic shipped rankers, so even this
        EVALUATION is hash-exact). Both sides run their standard
        pipelines; the overlap is a tiny (Q x k)-sized driver-side
        set intersection over the two 50-row results."""
        import pandas as _pd

        qids, _ = _queries_for(sf_dir)
        a = ann_int8_exact(sf_dir).to_pandas()
        b = ann_topk(sf_dir).to_pandas()
        sa = set(map(tuple, a[["query_id", "neighbor_id"]].to_numpy()))
        sb = set(map(tuple, b[["query_id", "neighbor_id"]].to_numpy()))
        both = sa & sb
        n = {q: 0 for q in qids}
        for q, _nid in both:
            n[int(q)] += 1
        return _pd.DataFrame(
            {
                "query_id": _pd.Series(sorted(n), dtype="int64"),
                "n_overlap": _pd.Series(
                    [n[q] for q in sorted(n)], dtype="int64"
                ),
            }
        )

    def embed_power_iter(sf_dir: str):
        """Oracle-checked: dominant eigenvector of the quantized
        uncentered scatter matrix XᵀX by exact-integer power iteration
        (400 steps, digit-count-adaptive arithmetic shifts) — the
        SQL-checkable corner of the PCA family: the distributed pass
        (constant-size int64 scatter partials per block) is identical
        to `embedding_pca`'s moment layout, and a recursive-CTE oracle
        replays the driver-side dim×dim recurrence bit-for-bit
        (`kgflow.ops.ann.power_iteration_scatter`)."""
        from kgflow.ops.ann import power_iteration_scatter
        from kgflow.sources.parquet import read_parquet_clean

        emb = read_parquet_clean(
            os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
        )
        return power_iteration_scatter(emb)

    def embed_neardup(sf_dir: str):
        """Oracle-checked (round-1 fix: was vacuous — the driver's
        embeddings are random, max off-diag cosine ~0.51, so no pairs at
        any sane threshold). The query deterministically plants exact
        duplicates (vec_id+1e6 copies of vec_id<25) on the engine AND
        oracle side, so the LSH op must recover exactly those 25 pairs;
        identical vectors always co-bucket, making LSH recall exact for
        the planted set."""
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc
        import ray.data as rd

        from kgflow.ops.dedup import embedding_neardup_pairs

        from kgflow.sources.parquet import read_parquet_clean

        emb = read_parquet_clean(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )

        def dup_batch(t: pa.Table) -> pa.Table:
            f = t.filter(pc.less(t.column("vec_id"), 25))
            return pa.table(
                {
                    "vec_id": pc.add(f.column("vec_id"), 1_000_000),
                    "embedding": f.column("embedding"),
                }
            )

        aug = emb.union(emb.map_batches(dup_batch, batch_format="pyarrow"))
        out = embedding_neardup_pairs(aug, threshold=0.98)
        return out.map_batches(
            lambda df: pd.DataFrame(
                {
                    "vec_a": np.minimum(df["vec_a"], df["vec_b"]).astype(np.int64),
                    "vec_b": np.maximum(df["vec_a"], df["vec_b"]).astype(np.int64),
                }
            ),
            batch_format="pandas",
        )

    def embed_semdedup(sf_dir: str):
        """Oracle-checked: SemDeDup (Abbas et al. 2023) — exact k-means
        E-step clustering (8 smallest-id seed centroids, quantized
        int64 distances), then within-cluster greedy semantic dedup:
        drop a vector iff some smaller-id vector of the SAME cluster
        has quantized cosine ≥ 19/20 (integer-exact: den²·dot² ≥
        num²·‖a‖²·‖b‖² over floor(x·1000) vectors — SQL replays it
        verbatim). Like embed_neardup, exact duplicates are planted
        (vec_id+1e6 copies of vec_id<25) on BOTH sides so the drop set
        is non-vacuous: exactly the 25 copies fall
        (`kgflow.ops.dedup.semdedup`)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        from kgflow.ops.dedup import semdedup
        from kgflow.sources.parquet import read_parquet_clean

        emb = read_parquet_clean(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )

        def dup_batch(t: pa.Table) -> pa.Table:
            f = t.filter(pc.less(t.column("vec_id"), 25))
            return pa.table(
                {
                    "vec_id": pc.add(f.column("vec_id"), 1_000_000),
                    "embedding": f.column("embedding"),
                }
            )

        aug = emb.union(emb.map_batches(dup_batch, batch_format="pyarrow"))
        return semdedup(aug, k=8)

    # --- relational demos (SQL-checked)
    def q1_pricing(sf_dir: str):
        from kgflow.ops.relational import pricing_summary

        def fix(df):
            df = _floor_scale_pd(df, "sum_qty", 1e1)
            df = _floor_scale_pd(df, "sum_revenue", 1e1)
            df = _floor_scale_pd(df, "avg_disc", 1e6)
            df["n"] = df["n"].astype(np.int64)
            return df

        return pricing_summary(sf_dir).map_batches(fix, batch_format="pandas")

    def top_customers(sf_dir: str):
        from kgflow.ops.relational import top_customers as tc

        return tc(sf_dir).map_batches(
            lambda df: _floor_scale_pd(df, "total_spent", 1e1), batch_format="pandas"
        )

    def events_hourly(sf_dir: str):
        # exact: engine sums int64(round(value*1e4)) and divides once;
        # oracle does the same in SQL — integer addition is associative,
        # so the hash compare is order-independent (round-1 fix).
        from kgflow.ops.relational import events_hourly as eh

        return eh(sf_dir)

    def events_sessions(sf_dir: str):
        """Gap-based sessionization (30-min gap) per user — the
        session-window operator; oracle is the textbook lag()/cumsum
        window-function construction. duration_s uses date_diff's
        boundary-crossing semantics on both sides; value sums are exact
        fixed-point like events_hourly."""
        import os as _os

        from kgflow.ops.window import sessionize
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "value"],
        )
        return sessionize(ev)

    def events_asof(sf_dir: str):
        """As-of join: each purchase event ← the most recent click by
        the same user at or before it (ties → larger click event_id);
        inner semantics so the output is NULL-free. Oracle is the
        inequality-join + QUALIFY row_number construction."""
        import os as _os

        from kgflow.ops.window import asof_join
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        return asof_join(
            ev.filter(expr="event_type == 'purchase'"),
            ev.filter(expr="event_type == 'click'"),
        )

    def events_window(sf_dir: str):
        """Oracle-checked: per-user ordered window functions —
        row_number, integer lag seconds (first event → -1), exact
        fixed-point running value sum — one bucketed exchange
        (`kgflow.ops.window.keyed_window`); oracle is the standard SQL
        window-function triple."""
        import os as _os

        from kgflow.ops.window import keyed_window
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "value"],
        )
        return keyed_window(ev)

    def events_in_sessions(sf_dir: str):
        """Oracle-checked: generic range join (point-in-interval, same
        key, both ends inclusive) demonstrated on the sessionization
        output — every event matches exactly its covering session, so
        the oracle is the session CTE + a BETWEEN join."""
        import os as _os

        from kgflow.ops.window import range_join, sessionize
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "value"],
        )
        sessions = sessionize(ev)
        return range_join(ev, sessions)

    def events_quantiles(sf_dir: str):
        """Oracle-checked: exact discrete quantiles of the quantized
        value column — histogram combiner + one value-keyed exchange;
        nearest-rank semantics mirror DuckDB quantile_disc (verified
        ceil(q*N)-1 indexing). Binary-exact q fractions only."""
        import os as _os

        from kgflow.ops.profile import column_quantiles
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"), columns=["value"]
        )
        return column_quantiles(ev, "value")

    def events_profile(sf_dir: str):
        """Oracle-checked: per-column numeric profile (rows, nulls,
        exact distinct, min/max) — extrema combine per block; distinct
        dedups per block then counts behind one (column, value)-keyed
        exchange."""
        import os as _os

        from kgflow.ops.profile import profile_columns
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "value"],
        )
        return profile_columns(ev, ["event_id", "user_id", "value"])

    def events_histogram(sf_dir: str):
        """Oracle-checked: fixed-width 20-bin histogram of the event
        value over [0, 100) — one bincount per block, one tiny
        bin-keyed reduce (`kgflow.ops.profile.column_histogram`);
        integer counts, hash-exact."""
        import os as _os

        from kgflow.ops.profile import column_histogram
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"), columns=["value"]
        )
        return column_histogram(ev, "value", lo=0.0, hi=100.0, n_bins=20)

    def events_sliding(sf_dir: str):
        """Oracle-checked: sliding 3-hour (2h preceding + current) window
        over the hourly rollup per event_type — RANGE semantics (gaps in
        the hour grid shrink the window, matching SQL RANGE PRECEDING);
        value sums exact fixed-point like events_hourly."""
        from kgflow.ops.relational import events_sliding as es

        return es(sf_dir)

    def events_daily_users(sf_dir: str):
        """Oracle-checked: exact grouped COUNT(DISTINCT user_id) per
        (event_type, day) — pair-dedup combiner + (group,value)-bucketed
        exchange so a hot group's distinct set parallelizes
        (`kgflow.ops.shuffle.grouped_distinct_count`)."""
        from kgflow.ops.relational import events_daily_active_users

        return events_daily_active_users(sf_dir)

    def events_pivot(sf_dir: str):
        """Oracle-checked: per-day counts pivoted wide by event type
        (`kgflow.ops.reshape.pivot_agg`; oracle is SQL conditional
        aggregation with the same static value list)."""
        from kgflow.ops.relational import events_type_pivot

        return events_type_pivot(sf_dir)

    def events_quantiles_by_type(sf_dir: str):
        """Oracle-checked: exact per-event_type quantile_disc of the
        quantized value column (`kgflow.ops.profile.grouped_quantiles`
        — distributed histogram, no driver pull)."""
        from kgflow.ops.relational import events_value_quantiles_by_type

        return events_value_quantiles_by_type(sf_dir)

    def events_users_hll(sf_dir: str):
        """Rows-only (sketch — deterministic but not SQL-reproducible;
        pytest gates the ±4σ error bound vs exact): HyperLogLog
        approximate distinct users per event_type. Exchange size is
        constant in the data (≤ groups × 2^p register rows)."""
        import os as _os

        from kgflow.ops.sketch import hll_distinct
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
        )
        return hll_distinct(ev, "user_id", group_cols=["event_type"])

    def doc_heavy_tokens(sf_dir: str):
        """Rows-only (sketch): count-min heavy hitters — top-10 tokens
        by frequency with constant-size mergeable sketch state; pytest
        gates top-k recovery + never-underestimate on zipf data."""
        import pandas as pd

        from kgflow.ops.sketch import heavy_hitters

        toks = _docs(sf_dir).map_batches(
            lambda df: pd.DataFrame(
                {"token": df["text"].str.lower().str.findall(r"\w+").explode().dropna()}
            ),
            batch_format="pandas",
        )
        return heavy_hitters(toks, "token", k=10)

    def customers_no_big_orders(sf_dir: str):
        """Oracle-checked: distributed ANTI join (customers with no
        order above 400k) — right side reduced to distinct keys by a
        combiner before anything wide; broadcast vs bucketed-shuffle
        auto-selected (`kgflow.ops.joins.anti_join`)."""
        from kgflow.ops.relational import customers_without_big_orders

        return customers_without_big_orders(sf_dir)

    def _user_days(sf_dir: str, event_type: str):
        import pyarrow as pa

        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"],
        )

        def f(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            b = batch.filter(pc.equal(batch.column("event_type"), event_type))
            return pa.table(
                {
                    "user_id": b.column("user_id"),
                    "day": pc.floor_temporal(b.column("ts"), unit="day"),
                }
            )

        return ev.map_batches(f, batch_format="pyarrow")

    def events_intersect(sf_dir: str):
        """Oracle-checked: SQL INTERSECT — (user, day) pairs with BOTH
        a purchase and an error (`kgflow.ops.joins.intersect_rows`:
        distinct-reduce both sides, then the semi machinery)."""
        from kgflow.ops.joins import intersect_rows

        return intersect_rows(
            _user_days(sf_dir, "purchase"),
            _user_days(sf_dir, "error"),
            ["user_id", "day"],
        )

    def events_except(sf_dir: str):
        """Oracle-checked: SQL EXCEPT — purchase (user, day) pairs with
        no error that day (`kgflow.ops.joins.except_rows`)."""
        from kgflow.ops.joins import except_rows

        return except_rows(
            _user_days(sf_dir, "purchase"),
            _user_days(sf_dir, "error"),
            ["user_id", "day"],
        )

    def orders_quality(sf_dir: str):
        """Oracle-checked: the data-quality gate — vectorized rule
        violation counts (negative price, null date, dates past the
        generator horizon) plus an FK orphan check (orders.o_custkey →
        customer) via the distributed anti join
        (`kgflow.ops.checks`). Exact integer counts."""
        import numpy as np
        import pandas as pd

        from kgflow.ops.checks import fk_violation_count, rule_violation_counts
        from kgflow.sources.parquet import read_parquet_clean

        orders = read_parquet_clean(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_custkey", "o_totalprice", "o_orderdate"],
        )
        cust = read_parquet_clean(
            os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
        )
        horizon = np.datetime64("1997-01-01", "us")
        rules = {
            "nonpositive_price": lambda df: df["o_totalprice"].to_numpy() <= 0,
            "null_orderdate": lambda df: df["o_orderdate"].isna().to_numpy(),
            "date_past_horizon": lambda df: df["o_orderdate"].to_numpy() >= horizon,
        }
        counts = rule_violation_counts(orders, rules).to_pandas()
        fk = fk_violation_count(orders, cust, "o_custkey", "c_custkey", "fk_orphan_custkey")
        return (
            pd.concat([counts, fk], ignore_index=True)
            .sort_values("rule")
            .reset_index(drop=True)
        )

    def q3_shipping(sf_dir: str):
        """Oracle-checked: TPC-H Q3-style top-10 open orders by
        outstanding revenue — dim semi-filter broadcast into the orders
        scan, fact-fact orderkey equi-join via the generic hash join,
        exact fixed-point revenue, bucketed grouped top-k."""
        from kgflow.ops.relational import q3_shipping as q3

        return q3(sf_dir)

    def q5_region_volume(sf_dir: str):
        """Oracle-checked (round-4): TPC-H Q5-style six-table join —
        revenue per nation of one region for one order year, counting
        only local-supplier lineitems (c_nationkey == s_nationkey).
        Dim filters pushed ahead of the ladder, ONE fact-fact orderkey
        exchange, broadcast supplier twist, 25-row final reduce
        (`kgflow.ops.relational.q5_region_volume`)."""
        from kgflow.ops.relational import q5_region_volume as q5

        return q5(sf_dir)

    def customer_orders_left(sf_dir: str):
        """Oracle-checked: LEFT outer join — every customer with order
        count + largest order, zeros for the order-less (combiner
        pre-aggregate makes the right side dim-sized;
        `kgflow.ops.joins.hash_join(how='left')` auto-selects
        broadcast vs bucketed shuffle)."""
        from kgflow.ops.relational import customer_order_profile

        return customer_order_profile(sf_dir)

    def orders_top_priority(sf_dir: str):
        """Oracle-checked: grouped top-k (3 priciest orders per order
        priority) via `kgflow.ops.shuffle.grouped_topk` — local top-k
        combiner, one group-bucketed exchange; total tie order makes
        it row_number()-equivalent and hash-exact."""
        from kgflow.ops.relational import orders_top_per_priority

        return orders_top_per_priority(sf_dir, k=3)

    def supplier_rollup_levels(sf_dir: str):
        """Oracle-checked: GROUP BY ROLLUP(region, nation) — subtotals
        at every level from one data pass
        (`kgflow.ops.reshape.rollup_sum`); fixed-point integer sums
        keep every level hash-exact."""
        from kgflow.ops.relational import supplier_region_rollup_levels

        return supplier_region_rollup_levels(sf_dir)

    def customer_orders_full(sf_dir: str):
        """Oracle-checked: FULL outer join — per-customer order counts
        in 1995 vs 1996 (`kgflow.ops.joins.hash_join(how='full')`,
        shuffle-only by construction); one-year-only customers exercise
        both null-extension directions; COALESCE-to-0 both sides keeps
        the columns int64-exact."""
        from kgflow.ops.relational import customer_year_activity_full

        return customer_year_activity_full(sf_dir)

    def events_cube(sf_dir: str):
        """Oracle-checked: GROUP BY CUBE(event_type, isodow) — all four
        grouping sets from one events pass
        (`kgflow.ops.reshape.cube_sum`); fixed-point integer value sums
        keep every set hash-exact."""
        from kgflow.ops.relational import events_type_dow_cube

        return events_type_dow_cube(sf_dir)

    def events_groupsets(sf_dir: str):
        """Oracle-checked: GROUP BY GROUPING SETS((type, dow), (dow),
        ()) — the generic grouping form completing ROLLUP/CUBE: only
        the LISTED sets, one data pass, every set re-aggregated from
        the finest grain (`kgflow.ops.reshape.grouping_sets_sum`);
        fixed-point value sums keep each set hash-exact, dow rides as
        VARCHAR so the typed-NULL convention matches (the events_cube
        precedent)."""
        import pandas as pd

        from kgflow.ops.reshape import grouping_sets_sum
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "ts", "value"],
        )

        def tag(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "dow": (df["ts"].dt.dayofweek + 1).astype(str),
                    "value_fp": np.round(
                        df["value"].to_numpy(dtype=np.float64) * 1e4
                    ).astype(np.int64),
                }
            )

        g = grouping_sets_sum(
            ev.map_batches(tag, batch_format="pandas"),
            sets=[["event_type", "dow"], ["dow"], []],
            sum_cols=["value_fp"],
            num_buckets=16,
        )

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            df["sum_value"] = df["value_fp"].to_numpy(dtype=np.int64) / 1e4
            df["n"] = df["n"].astype(np.int64)
            return df[["event_type", "dow", "sum_value", "n"]]

        return g.map_batches(finish, batch_format="pandas")

    def events_ranked(sf_dir: str):
        """Oracle-checked: rank-family window functions per user —
        RANK/DENSE_RANK over fixed-point value DESC (ties share ranks,
        so no tie-break column is needed for determinism), integer lead
        seconds (last event → -1), and a 3-row moving value sum as the
        difference of two exact int64 cumsums
        (`kgflow.ops.window.ranked_window`, one bucketed exchange)."""
        import os as _os

        from kgflow.ops.window import ranked_window
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "value"],
        )
        return ranked_window(ev)

    def events_distribution(sf_dir: str):
        """Oracle-checked: distribution-family window functions per
        user — NTILE(4) / PERCENT_RANK / CUME_DIST over a TOTAL ordering
        (value DESC, event_id), so rank == row_number and both ratios
        are single IEEE divisions of exact integers — bit-identical to
        the SQL engine (`kgflow.ops.window.distribution_window`, one
        bucketed exchange)."""
        import os as _os

        from kgflow.ops.window import distribution_window
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_id", "value"],
        )
        return distribution_window(ev)

    def events_boundary(sf_dir: str):
        """Oracle-checked (round-4): FIRST_VALUE/LAST_VALUE per user over
        the (ts, event_id) total order — semigroup combiner shrinks each
        block to ≤ one row per key before the exchange; raw value picks
        (no arithmetic) hash exactly against SQL arg_min/arg_max
        (`kgflow.ops.window.boundary_window`)."""
        import os as _os

        from kgflow.ops.window import boundary_window
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "value"],
        )
        return boundary_window(ev)

    def doc_freq_score(sf_dir: str):
        """Oracle-checked: corpus-frequency document scoring — the
        train-a-statistic-on-the-corpus-then-score-the-corpus pattern
        (CCNet/RefinedWeb's perplexity filter, with an integer unigram
        statistic so the oracle hashes exactly;
        `kgflow.ops.text.corpus_freq_score`)."""
        import os as _os

        from kgflow.ops.text import corpus_freq_score
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            _os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return corpus_freq_score(docs)

    def doc_quality_filter(sf_dir: str):
        """Oracle-checked: quantile-thresholded quality filtering — the
        canonical crawl-curation step: keep documents whose token count
        lies within the corpus's own [p12.5, p87.5] band. A COMPOSITION
        of shipped operators: `token_counts` (exchange-free) feeds
        `column_quantiles` (value-keyed histogram reduce, domain-bounded
        2-scalar driver pull) and the same materialized counts are then
        threshold-filtered — the corpus streams once per pass, never
        through a driver loop. Binary-exact quantile fractions keep
        nearest-rank identical across engines."""
        import os as _os

        from kgflow.ops.profile import column_quantiles
        from kgflow.ops.text import token_counts
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            _os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        tc = token_counts(docs).materialize()  # reused by both passes
        qv = column_quantiles(tc, col="n_tokens", qs=(0.125, 0.875), scale=1)
        lo, hi = int(qv["v"].iloc[0]), int(qv["v"].iloc[1])
        return tc.filter(expr=f"n_tokens >= {lo} and n_tokens <= {hi}")

    def events_intervals(sf_dir: str):
        """Oracle-checked: gaps-and-islands interval coalescing — every
        event opens a 10-minute interval; overlapping/touching intervals
        per user merge into maximal spans
        (`kgflow.ops.window.merge_intervals`, one bucketed exchange +
        vectorized island scan). Oracle is the classic shifted-cummax
        window construction."""
        import os as _os

        import pandas as pd

        from kgflow.ops.window import merge_intervals
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts"],
        )

        def mk(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": df["user_id"],
                    "s": df["ts"],
                    "e": df["ts"] + pd.Timedelta(minutes=10),
                }
            )

        return merge_intervals(ev.map_batches(mk, batch_format="pandas"))

    def events_overlap(sf_dir: str):
        """Oracle-checked: interval-interval overlap self-join (range
        join) — every purchase event opens a 10-60 minute half-open
        interval; all overlapping pairs with exact µs overlap length.
        Time-bucket decomposition (4 h buckets), exactly-once by the
        later-start-home rule, output-bounded contiguous-run
        enumeration (`kgflow.ops.window.interval_overlap_pairs`)."""
        import os as _os

        import pandas as pd

        from kgflow.ops.window import interval_overlap_pairs
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            _os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "event_type"],
        )

        def mk(df: pd.DataFrame) -> pd.DataFrame:
            d = df.loc[df["event_type"] == "purchase"]
            s = d["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            eid = d["event_id"].to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {"id": eid, "s": s, "e": s + 600_000_000 * (1 + eid % 6)}
            )

        return interval_overlap_pairs(
            ev.map_batches(mk, batch_format="pandas"),
            bucket_width=14_400 * 1_000_000,
        )

    def doc_normalize(sf_dir: str):
        """Oracle-checked: canonical text form — NFC unicode
        normalization + whitespace-run collapse + space trim
        (`kgflow.ops.clean.normalize_text`, exchange-free actor pool).
        The whitespace class is an explicit ASCII set shared verbatim
        with the SQL regexp_replace (Python's \\s is unicode-wide,
        RE2's is ASCII-only); planted NFD/whitespace variants on both
        sides keep the check non-vacuous on an ASCII-clean corpus."""
        import os as _os

        import pandas as pd

        from kgflow.ops.clean import normalize_text
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            _os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )

        def plant(df: pd.DataFrame) -> pd.DataFrame:
            df = df[["doc_id", "text"]].copy()
            m = (df["doc_id"] % 7 == 0).to_numpy()
            # decomposed e + combining acute, NBSP-free tab/newline runs
            df.loc[m, "text"] = (
                "  Cafe\u0301 \t menu:\n\n" + df.loc[m, "text"] + " \t "
            )
            return df

        return normalize_text(docs.map_batches(plant, batch_format="pandas"))

    def supplier_rollup(sf_dir: str):
        from kgflow.ops.relational import supplier_nation_rollup

        def fix(df):
            df = _floor_scale_pd(df, "total_acctbal", 1e1)
            df["n_suppliers"] = df["n_suppliers"].astype(np.int64)
            return df

        return supplier_nation_rollup(sf_dir).map_batches(fix, batch_format="pandas")

    # --- multimodal plumbing (rows-only; deterministic fake codec)
    def _media(n_fake=200, n_real=100):
        """Fake-codec rows (raw-byte plumbing path) + REAL-codec rows
        (BMP / 16-bit PCM WAV / KGV1 container — round-4: every byte
        round-trips through an actual encoder, so the stages parse real
        containers, not raw casts)."""
        import pyarrow as pa
        import ray.data as rd

        from kgflow.ops.multimodal import real_media_table, synth_media_table

        return rd.from_arrow(
            pa.concat_tables([synth_media_table(n_fake), real_media_table(n_real)])
        )

    def media_image_features(sf_dir: str):
        from kgflow.ops.multimodal import image_features

        return image_features(_media())

    def media_audio_features(sf_dir: str):
        from kgflow.ops.multimodal import audio_features

        return audio_features(_media())

    def media_video_features(sf_dir: str):
        from kgflow.ops.multimodal import video_frame_features

        return video_frame_features(_media())

    def media_thumbs(sf_dir: str):
        """Rows-only (exact NN-resize roundtrip pinned in
        tests/test_wave19.py): standardized 8x8 BMP thumbnails for
        every image row via the actor-pool decode -> integer-index
        nearest-neighbor resample -> re-encode stage (completes the
        brief's decode/feature/resize/frame-sample multimodal set;
        `kgflow.ops.multimodal.image_thumbs`)."""
        from kgflow.ops.multimodal import image_thumbs

        return image_thumbs(_media())

    def media_phash_pairs(sf_dir: str):
        """Rows-only (semantics pinned in tests/test_wave17.py):
        near-duplicate IMAGE pairs — per-image 63-bit average hash
        (aHash over an exact integral-image 8×8 grid) via the
        actor-pool decode stage, then the SAME banded hamming exchange
        as the text simhash path. Near-dups are planted: every 5th
        image re-encodes with one perturbed pixel, so the pairs are
        non-vacuous (`kgflow.ops.multimodal.image_phash_pairs`)."""
        import pyarrow as pa
        import pyarrow.compute as pc
        import numpy as _np

        from kgflow.ops.multimodal import (
            decode_bmp,
            decode_png,
            encode_bmp,
            encode_png,
            image_phash_pairs,
        )

        media = _media()

        def plant(t: pa.Table) -> pa.Table:
            ids = t.column("media_id").to_numpy(zero_copy_only=False)
            kinds = _np.asarray(t.column("kind").to_pylist())
            f = t.filter(pa.array((kinds == "image") & (ids % 5 == 0)))
            payloads = []
            for codec, payload, w, h in zip(
                f.column("codec").to_pylist(),
                f.column("payload").to_pylist(),
                f.column("width").to_pylist(),
                f.column("height").to_pylist(),
            ):
                if codec == "bmp":
                    img = decode_bmp(payload).copy()
                elif codec == "png":
                    img = decode_png(payload).copy()
                else:  # fake codec: raw RGB bytes
                    img = (
                        _np.frombuffer(payload, dtype=_np.uint8)[: w * h * 3]
                        .reshape(h, w, 3)
                        .copy()
                    )
                img[0, 0, 0] ^= 1  # one-bit pixel perturbation
                payloads.append(
                    encode_bmp(img)
                    if codec == "bmp"
                    else encode_png(img)
                    if codec == "png"
                    else img.tobytes()
                )
            cols = {name: f.column(name) for name in f.schema.names}
            cols["media_id"] = pc.add(f.column("media_id"), 5_000_000)
            cols["payload"] = pa.array(payloads, pa.binary())
            return pa.table(cols)

        aug = media.union(media.map_batches(plant, batch_format="pyarrow"))
        return image_phash_pairs(aug, max_hamming=3)

    def media_afp_pairs(sf_dir: str):
        """Rows-only (semantics pinned in tests/test_wave17.py):
        near-duplicate AUDIO pairs — 63-bit spectral fingerprint
        (8×8 frame-by-band energy threshold) per clip, shared banded
        hamming exchange. Every 5th clip re-encodes with one sample
        nudged by one quantum; the planted copies all surface, PLUS
        the fixture's sine tones 10 Hz apart — genuinely
        near-identical spectra, the fingerprint treating them as
        near-dups is the correct perceptual behavior (the unit test
        pins exact recovery on well-separated clips)
        (`kgflow.ops.multimodal.audio_fp_pairs`)."""
        import numpy as _np
        import pyarrow as pa

        from kgflow.ops.multimodal import (
            audio_fp_pairs,
            decode_wav,
            encode_wav,
        )

        media = _media()

        def plant(t: pa.Table) -> pa.Table:
            ids = t.column("media_id").to_numpy(zero_copy_only=False)
            kinds = _np.asarray(t.column("kind").to_pylist())
            f = t.filter(pa.array((kinds == "audio") & (ids % 5 == 0)))
            payloads = []
            for codec, payload, sr in zip(
                f.column("codec").to_pylist(),
                f.column("payload").to_pylist(),
                f.column("sample_rate").to_pylist(),
            ):
                if codec == "wav":
                    w, sr_ = decode_wav(payload)
                    s = (w * 32768.0).astype(_np.int16).copy()
                    s[0] ^= 1
                    payloads.append(encode_wav(s, sr_))
                else:  # fake codec: raw byte stream
                    b = bytearray(payload)
                    b[0] ^= 1
                    payloads.append(bytes(b))
            cols = {name: f.column(name) for name in f.schema.names}
            cols["media_id"] = pa.array(
                f.column("media_id").to_numpy(zero_copy_only=False)
                + 5_000_000
            )
            cols["payload"] = pa.array(payloads, pa.binary())
            return pa.table(cols)

        aug = media.union(media.map_batches(plant, batch_format="pyarrow"))
        return audio_fp_pairs(aug, max_hamming=3)

    def media_vhash_pairs(sf_dir: str):
        """Rows-only (semantics pinned in tests/test_wave17.py):
        near-duplicate VIDEO pairs — middle-frame aHash per clip,
        shared banded hamming exchange. Every 5th clip re-encodes
        with one pixel of its FIRST frame perturbed (the middle-frame
        hash is untouched: hamming 0), so the pair set is exactly the
        planted copies (`kgflow.ops.multimodal.video_hash_pairs`)."""
        import numpy as _np
        import pyarrow as pa

        from kgflow.ops.multimodal import (
            decode_kgv1,
            encode_kgv1,
            video_hash_pairs,
        )

        media = _media()

        def plant(t: pa.Table) -> pa.Table:
            ids = t.column("media_id").to_numpy(zero_copy_only=False)
            kinds = _np.asarray(t.column("kind").to_pylist())
            f = t.filter(pa.array((kinds == "video") & (ids % 5 == 0)))
            payloads = []
            for codec, payload, w, h, nf in zip(
                f.column("codec").to_pylist(),
                f.column("payload").to_pylist(),
                f.column("width").to_pylist(),
                f.column("height").to_pylist(),
                f.column("n_frames").to_pylist(),
            ):
                if codec == "kgv1":
                    frames = decode_kgv1(payload).copy()
                    frames[0, 0, 0, 0] ^= 1
                    payloads.append(encode_kgv1(frames))
                else:  # fake codec: raw frame bytes
                    b = bytearray(payload)
                    b[0] ^= 1
                    payloads.append(bytes(b))
            cols = {name: f.column(name) for name in f.schema.names}
            cols["media_id"] = pa.array(
                f.column("media_id").to_numpy(zero_copy_only=False)
                + 5_000_000
            )
            cols["payload"] = pa.array(payloads, pa.binary())
            return pa.table(cols)

        aug = media.union(media.map_batches(plant, batch_format="pyarrow"))
        return video_hash_pairs(aug, max_hamming=3)

    # --- ninth wave (round 4 continuation): LM counts, exact bivariate
    # moments, weighted sampling, graph degree histogram, Dice pairs
    def doc_bigram_lm(sf_dir: str):
        """Oracle-checked: corpus bigram-LM argmax — per token, the
        most likely successor and its adjacency count (first-wins tie
        break). Pair-keyed partial sums, then a vocabulary-bounded
        argmax exchange."""
        from kgflow.ops.text import bigram_successors

        return bigram_successors(_docs(sf_dir))

    def events_corr(sf_dir: str):
        """Oracle-checked: per-type exact bivariate moments of
        (value, props.k) — quantize-first int64 (n, Σx, Σy, Σx², Σy²,
        Σxy); Pearson corr / covariance / OLS slope are single
        driver-side divisions over this hash-exact row."""
        import pandas as _pd

        from kgflow.ops.profile import grouped_corr_moments
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value", "props"],
        )

        def with_k(df: _pd.DataFrame) -> _pd.DataFrame:
            df["k"] = df["props"].str.extract(r"(\d+)", expand=False).astype(
                "float64"
            )
            return df[["event_type", "value", "k"]]

        return grouped_corr_moments(
            ev.map_batches(with_k, batch_format="pandas"),
            key="event_type",
            x_col="value",
            y_col="k",
            x_scale=100,
            y_scale=1,
        )

    def events_skewkurt(sf_dir: str):
        """Oracle-checked: per-type exact power sums (n, Σq..Σq⁴) of
        quantized value — skewness/kurtosis are driver-side closed
        forms over this one hash-exact row. Arbitrary-precision via
        int64 lane splits (per-batch) + Python-int lane re-sum (tiny
        reduce table); SQL side sums in HUGEINT, both ship decimal
        strings."""
        from kgflow.ops.profile import grouped_power_sums
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        return grouped_power_sums(ev, key="event_type", col="value", scale=100)

    def orders_benford(sf_dir: str):
        """Oracle-checked: Benford first-significant-digit audit —
        (o_orderpriority, digit, n) counts of the leading digit of
        floor(o_totalprice·100); integer digit peel, one tiny
        (priority, digit) count exchange."""
        from kgflow.ops.relational import orders_benford_digits

        return orders_benford_digits(sf_dir)

    def events_autocorr(sf_dir: str):
        """Oracle-checked: lag-1 autocorrelation moments of the daily
        count per event_type — count reduce → self hash-join on
        (type, day−1) → exact bivariate int moments; r is one
        driver-side division."""
        from kgflow.ops.relational import events_daily_autocorr

        return events_daily_autocorr(sf_dir)

    def doc_weighted_sample(sf_dir: str):
        """Oracle-checked: deterministic weight-biased bottom-k sample
        (priority = FNV1a(doc_id) // n_chars — integer-exact priority
        sampling, SQL-reproducible via the HUGEINT FNV fold)."""
        from kgflow.ops.sketch import weighted_bottomk

        return weighted_bottomk(
            _docs(sf_dir).select_columns(["doc_id", "n_chars"]),
            id_col="doc_id",
            weight_col="n_chars",
            k=100,
        )

    def events_degree_hist(sf_dir: str):
        """Oracle-checked: degree distribution of the same co-activity
        graph events_triangles counts (users sharing an (event_type,
        hour) cell) — count-row exchanges only, output bounded by the
        number of distinct degrees."""
        import pyarrow as _pa
        import pyarrow.compute as _pc

        from kgflow.ops.graph import cooccurrence_edges, degree_histogram
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "ts"],
        )

        def add_hour(batch: "_pa.Table") -> "_pa.Table":
            return _pa.table(
                {
                    "user_id": batch.column("user_id"),
                    "event_type": batch.column("event_type"),
                    "w": _pc.floor_temporal(batch.column("ts"), unit="hour"),
                }
            )

        edges = cooccurrence_edges(
            ev.map_batches(add_hour, batch_format="pyarrow"),
            "user_id",
            ["event_type", "w"],
        )
        return degree_histogram(edges)

    def doc_dice_pairs(sf_dir: str):
        """Oracle-checked: Sørensen–Dice near-dup pairs over the same
        trigram-shingle count-join as doc_jaccard_pairs (dice = 2j/(1+j);
        threshold 0.6 ⇔ Jaccard ≈ 0.43, so the pair set strictly
        contains the Jaccard-0.5 set — non-vacuous by construction)."""
        import pandas as _pd

        from kgflow.ops.dedup import jaccard_pairs

        out = jaccard_pairs(
            _docs(sf_dir), k=3, threshold=0.6, measure="dice"
        )

        def fl(df: _pd.DataFrame) -> _pd.DataFrame:
            return _floor_scale_pd(df, "sim", 10000)

        return out.map_batches(fl, batch_format="pandas")

    def events_transitions(sf_dir: str):
        """Oracle-checked: first-order Markov transition counts over
        each user's (ts, id)-ordered event stream — ONE user-keyed
        adjacency exchange, then a category²-bounded pair sum."""
        from kgflow.ops.window import transition_counts
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "ts", "event_id"],
        )
        return transition_counts(ev)

    def events_basket_pairs(sf_dir: str):
        """Oracle-checked: market-basket pair support (Apriori k=2) —
        baskets = users, items = event types; confidence/lift are
        driver-side divisions over the hash-exact count row."""
        from kgflow.ops.graph import item_pair_support
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type"],
        )
        return item_pair_support(ev, basket_col="user_id", item_col="event_type")

    def events_basket_rules(sf_dir: str):
        """Oracle-checked: association rules from the Apriori pair
        supports — BOTH directions (ante → cons) with exact integer
        supports and confidence = n_both/n_ante, lift =
        n_both·n_baskets/(n_ante·n_cons); the divisions are single
        IEEE ops identical in SQL. The counting core is
        `kgflow.ops.graph.item_pair_support`; direction fan-out is an
        exchange-free map."""
        import pandas as pd

        from kgflow.ops.graph import item_pair_support
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type"],
        )
        sup = item_pair_support(
            ev, basket_col="user_id", item_col="event_type"
        )

        def rules(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df) or "item_a" not in df.columns:
                return pd.DataFrame(
                    {
                        "ante": pd.Series([], dtype="object"),
                        "cons": pd.Series([], dtype="object"),
                        "n_both": pd.Series([], dtype="int64"),
                        "n_ante": pd.Series([], dtype="int64"),
                        "confidence": pd.Series([], dtype="float64"),
                        "lift": pd.Series([], dtype="float64"),
                    }
                )
            import numpy as _np

            ab = pd.DataFrame(
                {
                    "ante": df["item_a"],
                    "cons": df["item_b"],
                    "n_both": df["n_ab"],
                    "n_ante": df["n_a"],
                    "n_cons": df["n_b"],
                    "nb": df["n_baskets"],
                }
            )
            ba = pd.DataFrame(
                {
                    "ante": df["item_b"],
                    "cons": df["item_a"],
                    "n_both": df["n_ab"],
                    "n_ante": df["n_b"],
                    "n_cons": df["n_a"],
                    "nb": df["n_baskets"],
                }
            )
            r = pd.concat([ab, ba], ignore_index=True)
            nb_ = r["n_both"].to_numpy(dtype=_np.float64)
            na_ = r["n_ante"].to_numpy(dtype=_np.float64)
            nc_ = r["n_cons"].to_numpy(dtype=_np.float64)
            tb_ = r["nb"].to_numpy(dtype=_np.float64)
            return pd.DataFrame(
                {
                    "ante": r["ante"],
                    "cons": r["cons"],
                    "n_both": r["n_both"].astype("int64"),
                    "n_ante": r["n_ante"].astype("int64"),
                    "confidence": nb_ / na_,
                    "lift": nb_ * tb_ / (na_ * nc_),
                }
            )

        return sup.map_batches(rules, batch_format="pandas")

    def events_zorder(sf_dir: str):
        """Oracle-checked (bit-exact list arithmetic in SQL): Z-order
        (Morton) clustering keys interleaving user_id and the hour-of-
        month of each event — the multi-column layout primitive: a
        zval range-partitioned write gives BOTH columns row-group
        locality (the Delta/Iceberg OPTIMIZE ZORDER shape). Exchange-
        free vectorized bit interleave, loud range guard
        (`kgflow.ops.shuffle.zorder_keys`)."""
        import pandas as pd

        from kgflow.ops.shuffle import zorder_keys
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "ts", "user_id"],
        )

        def mk(df: pd.DataFrame) -> pd.DataFrame:
            s = df["ts"].to_numpy().astype("datetime64[s]").astype(np.int64)
            return pd.DataFrame(
                {
                    "event_id": df["event_id"].astype(np.int64),
                    "uid": df["user_id"].to_numpy(dtype=np.int64) % 1024,
                    "hod": (s // 3600) % 1024,
                }
            )

        z = zorder_keys(
            ev.map_batches(mk, batch_format="pandas"),
            cols=["uid", "hod"],
            bits=10,
        )
        return z.select_columns(["event_id", "zval"])

    def q4_priority(sf_dir: str):
        """Oracle-checked: TPC-H Q4-style EXISTS semi-join — orders in
        a date window with ≥1 returned lineitem, counted per priority;
        the right side ships distinct keys only."""
        from kgflow.ops.relational import q4_order_priority

        return q4_order_priority(sf_dir)

    def q10_returns(sf_dir: str):
        """Oracle-checked: TPC-H Q10-style returned-item report — the
        lineitem ⋈ orders ⋈ customer ⋈ nation ladder with fixed-point
        revenue, pre-aggregated per join key at every hop."""
        from kgflow.ops.relational import q10_returned_revenue

        return q10_returned_revenue(sf_dir)

    def doc_extract_spans(sf_dir: str):
        """Oracle-checked: long-format regex span extraction (URLs +
        emails) — the flat_map workhorse of link-graph / PII mining;
        exchange-free, patterns compiled once per actor. The corpus
        gains planted contact lines (ids %13∈{2,7}) so both kinds are
        non-vacuous; the plant is shared verbatim with the SQL."""
        import pandas as _pd

        from kgflow.ops.text import regex_extract_spans

        def aug(df: _pd.DataFrame) -> _pd.DataFrame:
            df = df.copy()
            ids = df["doc_id"].to_numpy()
            m2 = ids % 13 == 2
            m7 = ids % 13 == 7
            t = df["text"].to_numpy(dtype=object)
            t[m2] = [
                f"{x} contact: user{n}@example.com"
                for x, n in zip(t[m2], ids[m2])
            ]
            t[m7] = [
                f"{x} see http://ex{n}.example/p" for x, n in zip(t[m7], ids[m7])
            ]
            df["text"] = t
            return df

        docs = _docs(sf_dir).map_batches(aug, batch_format="pandas")
        return regex_extract_spans(
            docs,
            patterns={
                "email": r"[\w.]+@[\w.]+",
                "url": r"https?://[^\s]+",
            },
        )

    def events_weekly_trend(sf_dir: str):
        """Oracle-checked: week-over-week volume trend per type —
        weekly counts anchored at 2024-01-01 (engine-neutral week
        arithmetic), previous-week lag and one exact int÷int ratio."""
        from kgflow.ops.relational import weekly_trend

        return weekly_trend(sf_dir)

    def doc_lang_sample(sf_dir: str):
        """Oracle-checked: stratified weighted sample — per language,
        the 20 length-weighted priority-sampling winners (the grouped
        variant of doc_weighted_sample's FNV // weight order)."""
        from kgflow.ops.sketch import weighted_bottomk

        return weighted_bottomk(
            _docs(sf_dir).select_columns(["lang", "doc_id", "n_chars"]),
            id_col="doc_id",
            weight_col="n_chars",
            k=20,
            group_cols=["lang"],
        )

    def events_new_users(sf_dir: str):
        """Oracle-checked: growth accounting — per day, first-seen
        users and the running cumulative distinct-user total (first-
        touch attribution makes cumulative distinct decompose exactly);
        semigroup-min per user, day-bounded counts, calendar-bounded
        running-sum bucket."""
        from kgflow.ops.window import new_users_daily
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
        )
        return new_users_daily(ev)

    def events_adoption(sf_dir: str):
        """Oracle-checked: per-type adoption curve — first day each
        user used each event type, counted and cumulated per type (the
        group_cols variant of events_new_users)."""
        from kgflow.ops.window import new_users_daily
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "user_id", "event_type"],
        )
        return new_users_daily(ev, group_cols=["event_type"])

    def orders_concentration(sf_dir: str):
        """Oracle-checked: revenue concentration — the p87.5 cut of
        per-customer totals (exact spread-bucketed quantile histogram)
        and the revenue share held at/above it (one int÷int division
        over fixed-point sums)."""
        from kgflow.ops.relational import revenue_concentration

        return revenue_concentration(sf_dir)

    def part_brand_revenue(sf_dir: str):
        """Oracle-checked: per-brand sales rollup — lineitem
        pre-aggregated per partkey, part dimension joined (auto
        broadcast), brand-bounded final exchange. Covers the last
        otherwise-unused driver table (part)."""
        from kgflow.ops.relational import brand_revenue

        return brand_revenue(sf_dir)

    def events_kcore(sf_dir: str):
        """Oracle-checked: 2-core of the co-purchase graph (the
        events_components edge set) by iterative peeling. The SQL
        oracle sidesteps the recursive-CTE single-reference rule with
        UNNEST([u, v]): one pass over the recursive table yields both
        endpoint degrees, so each peel round is expressible after all;
        also gated by golden-graph unit tests (tests/test_wave10.py)."""
        import pandas as _pd

        from kgflow.ops.graph import cooccurrence_edges, k_core
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "props", "value"],
        )

        def cells(df: _pd.DataFrame) -> _pd.DataFrame:
            m = (df["event_type"] == "purchase") & (df["value"] > 99.0)
            return df.loc[m, ["user_id", "props"]]

        edges = cooccurrence_edges(
            ev.map_batches(cells, batch_format="pandas"), "user_id", ["props"]
        )
        return k_core(edges, k=2)

    def events_kanon(sf_dir: str):
        """Oracle-checked: k-anonymity audit (Sweeney 2002) — the
        (event_type, props) quasi-identifier combinations held by
        fewer than 12 distinct users, i.e. the re-identifying rows a
        release gate must suppress (k chosen so the audit bites at
        both test scale factors — non-vacuous oracle)
        (`kgflow.ops.checks.k_anonymity_violations`)."""
        from kgflow.ops.checks import k_anonymity_violations
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "props", "user_id"],
        )
        return k_anonymity_violations(
            ev, quasi_cols=["event_type", "props"], id_col="user_id", k=12
        )

    def doc_chunks(sf_dir: str):
        """Oracle-checked: RAG-style overlapping token chunking —
        chunk c covers lowercase \\w+ tokens [c·48, c·48+64); the
        oracle hash-checks the CHUNK TEXT itself
        (range + list_slice + array_to_string)
        (`kgflow.ops.text.chunk_documents`)."""
        from kgflow.ops.text import chunk_documents

        return chunk_documents(_docs(sf_dir), size=64, stride=48)

    def doc_line_dedup(sf_dir: str):
        """Oracle-checked: CCNet-style corpus-level line dedup
        (Wenzek et al. 2020) — every occurrence of a line seen more
        than once corpus-wide drops; lines under 10 chars never
        participate; kept lines rejoin by newline in original order.
        The synthetic docs are single-line, so the query plants crawl
        boilerplate on BOTH sides (shared newsletter header on even
        doc_ids, shared copyright footer on all) — the op must strip
        exactly those and return each unique body intact
        (`kgflow.ops.clean.line_dedup`)."""
        import pandas as _pd

        from kgflow.ops.clean import line_dedup

        HEADER = "subscribe to our newsletter for updates"
        FOOTER = "copyright 2026 example corp all rights reserved"

        def plant(df: _pd.DataFrame) -> _pd.DataFrame:
            even = (df["doc_id"] % 2) == 0
            t = df["text"].copy()
            t[even] = HEADER + "\n" + t[even]
            return _pd.DataFrame(
                {"doc_id": df["doc_id"], "text": t + "\n" + FOOTER}
            )

        aug = _docs(sf_dir).map_batches(plant, batch_format="pandas")
        return line_dedup(aug, min_chars=10)

    def events_decayed_avg(sf_dir: str):
        """Oracle-checked: per-user exponentially-decayed trailing
        average (powers-of-two weights over the last 8 rows) — emitted
        as the EXACT integer numerator/denominator pair so the hash
        compare is bit-for-bit vs 8 SQL lag() terms with integer
        shifts (`kgflow.ops.window.decayed_moving_avg`)."""
        from kgflow.ops.window import decayed_moving_avg
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_id", "ts", "value"],
        )
        return decayed_moving_avg(ev, window=8)

    def events_lpa(sf_dir: str):
        """Oracle-checked: 5 rounds of deterministic SYNCHRONOUS label
        propagation (Raghavan et al. 2007) over the co-purchase graph
        (the events_components edge set) — each round every node
        adopts its neighbors' most frequent label, ties to the
        smallest; the fixed round count makes the oracle an exact
        recursive-CTE replay, oscillations and all
        (`kgflow.ops.graph.label_propagation`)."""
        import pandas as _pd

        from kgflow.ops.graph import cooccurrence_edges, label_propagation
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "props", "value"],
        )

        def cells(df: _pd.DataFrame) -> _pd.DataFrame:
            m = (df["event_type"] == "purchase") & (df["value"] > 99.0)
            return df.loc[m, ["user_id", "props"]]

        edges = cooccurrence_edges(
            ev.map_batches(cells, batch_format="pandas"), "user_id", ["props"]
        )
        return label_propagation(edges, rounds=5)

    def doc_csv_roundtrip(sf_dir: str):
        """Oracle-checked: CSV sink → CSV source round-trip — write
        documents(doc_id, n_chars) as partitioned CSV under /tmp, read
        it back with `ray.data.read_csv`, and fingerprint the result
        with `table_checksum`. The oracle is the SAME checksum SQL as
        doc_checksum computed from the parquet originals, so a green
        row proves the CSV path is lossless AND order/partition-
        independent (the checksum is commutative)."""
        import shutil

        from kgflow.ops.checks import table_checksum

        out_dir = f"/tmp/kgflow_csv_roundtrip_{abs(hash(sf_dir)) % 10**8}"
        shutil.rmtree(out_dir, ignore_errors=True)
        _docs(sf_dir).select_columns(["doc_id", "n_chars"]).write_csv(out_dir)
        back = rd.read_csv(out_dir)
        return table_checksum(back, cols=["doc_id", "n_chars"])

    def q6_revenue(sf_dir: str):
        """Oracle-checked: TPC-H Q6-style filtered global sum — one
        scan, per-row fixed-point quantization, one 2-scalar partial
        per block."""
        from kgflow.ops.relational import q6_forecast_revenue

        return q6_forecast_revenue(sf_dir)

    def q13_custdist(sf_dir: str):
        """Oracle-checked: TPC-H Q13-style order-count distribution —
        per-custkey count combiner, LEFT join from customer keys (zero
        bucket preserved), counts-bounded histogram exchange."""
        from kgflow.ops.relational import q13_customer_distribution

        return q13_customer_distribution(sf_dir)

    def q14_promo(sf_dir: str):
        """Oracle-checked: TPC-H Q14-style promo-revenue share — per-
        partkey fixed-point revenue combiner, auto-broadcast part join,
        one 2-scalar exchange + int÷int ratio."""
        from kgflow.ops.relational import q14_promo_share

        return q14_promo_share(sf_dir)

    def q15_top_supplier(sf_dir: str):
        """Oracle-checked: TPC-H Q15-style top supplier — per-suppkey
        fixed-point revenue, 1-row global max broadcast back as the
        filter scalar, exact tie semantics."""
        from kgflow.ops.relational import q15_top_supplier as _q15

        return _q15(sf_dir)

    def q18_big_orders(sf_dir: str):
        """Oracle-checked: TPC-H Q18-style large-volume customers —
        HAVING on a per-orderkey quantity sum (fixed-point ×100), the
        tiny qualifying set broadcast against orders then customer."""
        from kgflow.ops.relational import q18_big_orders as _q18

        return _q18(sf_dir)

    def q17_small_qty(sf_dir: str):
        """Oracle-checked: TPC-H Q17-style small-quantity revenue —
        per-part (count, Σqty) stats joined back to lineitem, integer-
        exact 20%-of-avg threshold, one 2-scalar exchange."""
        from kgflow.ops.relational import q17_small_quantity_revenue

        return q17_small_quantity_revenue(sf_dir)

    def q22_dormant(sf_dir: str):
        """Oracle-checked: TPC-H Q22-style dormant high-balance
        customers — 2-scalar global mean broadcast, integer-exact
        above-average test, distinct-key anti-join against recent
        orders, nations-bounded rollup."""
        from kgflow.ops.relational import q22_dormant_balance

        return q22_dormant_balance(sf_dir)

    def q7_nation_volume(sf_dir: str):
        """Oracle-checked: TPC-H Q7-style two-nation shipping volume —
        broadcast nation/supplier maps, customer pre-filtered to the
        pair, ONE orderkey fact-fact exchange carrying 4 ints/row,
        ≤ 2×2×years final reduce
        (`kgflow.ops.relational.q7_nation_volume`)."""
        from kgflow.ops.relational import q7_nation_volume as q7

        return q7(sf_dir)

    def q19_disjunctive(sf_dir: str):
        """Oracle-checked: TPC-H Q19-style OR-of-conjunctions revenue —
        broadcast part-attr map, vectorized disjunctive predicate, NO
        shuffle (per-batch int64 fixed-point partial sums → 1-row
        fold) (`kgflow.ops.relational.q19_disjunctive_revenue`)."""
        from kgflow.ops.relational import q19_disjunctive_revenue

        return q19_disjunctive_revenue(sf_dir)

    def q16_supplier_counts(sf_dir: str):
        """Oracle-checked: TPC-H Q16-style distinct-supplier counts per
        (brand, type, size) with a broadcast exclusion set
        (s_acctbal < 0 ≙ complaints anti-join); the distinct count
        runs grouped_distinct_count's (group, value)-bucketed exchange
        (`kgflow.ops.relational.q16_supplier_counts`)."""
        from kgflow.ops.relational import q16_supplier_counts as q16

        return q16(sf_dir)

    def q8_market_share(sf_dir: str):
        """Oracle-checked: TPC-H Q8-style national market share per
        order year — broadcast promo-part set + target-supplier set +
        region-customer filter; ONE orderkey fact-fact exchange of 3
        ints/row; int64 fixed-point sums, one closing division per
        year (`kgflow.ops.relational.q8_market_share`)."""
        from kgflow.ops.relational import q8_market_share as q8

        return q8(sf_dir)

    def q12_late_priority(sf_dir: str):
        """Oracle-checked: TPC-H Q12-style priority-vs-lateness counts
        (ship bucket = late/ontime at 365 days, no shipmode column in
        this corpus) — ONE orderkey fact-fact exchange of 3 ints/row,
        2×2 final reduce
        (`kgflow.ops.relational.q12_late_priority`)."""
        from kgflow.ops.relational import q12_late_priority as q12

        return q12(sf_dir)

    def q21_slowest_supplier(sf_dir: str):
        """Oracle-checked: TPC-H Q21-style unique-slowest-supplier
        counts over multi-supplier orders — per-batch (order, supp)
        max-shipdate combiner, ONE orderkey-bucketed exchange with a
        vectorized in-bucket argmax, dim-bounded supplier counts +
        broadcast name map
        (`kgflow.ops.relational.q21_slowest_supplier`)."""
        from kgflow.ops.relational import q21_slowest_supplier as q21

        return q21(sf_dir)

    def q2_min_cost_supplier(sf_dir: str):
        """Oracle-checked: TPC-H Q2-style cheapest-supplier-per-part
        over EUROPE suppliers — broadcast region-supplier filter +
        attach maps, per-batch (part, supp) min-cost combiner, ONE
        partkey-bucketed exchange with a vectorized in-bucket argmin
        (ties → smallest suppkey); int64-cents exact
        (`kgflow.ops.relational.q2_min_cost_supplier`)."""
        from kgflow.ops.relational import q2_min_cost_supplier as q2

        return q2(sf_dir)

    def q9_product_profit(sf_dir: str):
        """Oracle-checked: TPC-H Q9-style product profit by supplier
        nation and order year (unit cost = p_retailprice; parts whose
        name contains 'widget') — broadcast part/supplier dim maps
        shrink lineitem in one pass, the ONLY fact-fact exchange is
        lineitem ⋈ orders on orderkey at 3 ints/row; int64 1e-4
        fixed-point profit, one closing division
        (`kgflow.ops.relational.q9_product_profit`)."""
        from kgflow.ops.relational import q9_product_profit as q9

        return q9(sf_dir)

    def q11_important_parts(sf_dir: str):
        """Oracle-checked: TPC-H Q11-style important-stock parts
        (value = Σ l_extendedprice over EUROPE-supplier lines; keep
        value > 110% of the mean part value — scale-free) — broadcast
        supplier filter, per-batch partkey partials, ONE bucketed
        exchange; the global (total, count) scalar folds from bucket
        partials and the threshold is exact integer math
        (`kgflow.ops.relational.q11_important_parts`)."""
        from kgflow.ops.relational import q11_important_parts as q11

        return q11(sf_dir)

    def q20_excess_share(sf_dir: str):
        """Oracle-checked: TPC-H Q20-style excess-share suppliers
        (holding a strict majority of some 'widget' part's 1996
        shipped quantity) — broadcast name-filtered part keys,
        per-batch (part, supp) quantity partials, ONE partkey-bucketed
        exchange with transform('sum') majority test, dim-bounded
        distinct + name attach
        (`kgflow.ops.relational.q20_excess_share_suppliers`)."""
        from kgflow.ops.relational import q20_excess_share_suppliers as q20

        return q20(sf_dir)

    def graph_bfs_hops(sf_dir: str):
        """Oracle-checked (recursive CTE): distributed BFS min-hop ≤ 4
        from the smallest node over the bipartite part↔supplier graph
        (distinct high-quantity lineitem pairs; parts even / suppliers
        odd node ids). Per round ONE E-bounded frontier expansion with
        broadcast frontier/visited arrays + a node-bucketed distinct
        reduce (`kgflow.ops.graph.bfs_hops`)."""
        import pandas as pd

        from kgflow.ops.graph import bfs_hops
        from kgflow.sources.parquet import read_parquet_clean

        def pairs(df: pd.DataFrame) -> pd.DataFrame:
            d = df.loc[df["l_quantity"].to_numpy() >= 45.0]
            out = d[["l_partkey", "l_suppkey"]].drop_duplicates()
            return pd.DataFrame(
                {
                    "src": out["l_partkey"].to_numpy(dtype=np.int64) * 2,
                    "dst": out["l_suppkey"].to_numpy(dtype=np.int64) * 2
                    + 1,
                }
            )

        edges = (
            read_parquet_clean(
                os.path.join(sf_dir, "lineitem.parquet"),
                columns=["l_partkey", "l_suppkey", "l_quantity"],
            )
            .map_batches(pairs, batch_format="pandas")
            .materialize()  # E-bounded; consumed by min() probes + BFS
        )
        seed = int(min(edges.min("src"), edges.min("dst")))
        return bfs_hops(edges, seeds=[seed], max_hops=4)

    def graph_sssp(sf_dir: str):
        """Oracle-checked (recursive CTE with UNION dedup): weighted
        single-source shortest path ≤ 4 hops from the smallest node
        over the bipartite part↔supplier graph; positive integer
        weights w = 1 + round(qty) % 5, so distances are hash-exact.
        Bellman-Ford rounds with frontier optimization, ONE E-bounded
        relaxation pass per round (`kgflow.ops.graph.sssp_weighted`)."""
        import pandas as pd

        from kgflow.ops.graph import sssp_weighted
        from kgflow.sources.parquet import read_parquet_clean

        def wedges(df: pd.DataFrame) -> pd.DataFrame:
            d = df.loc[df["l_quantity"].to_numpy() >= 45.0]
            out = pd.DataFrame(
                {
                    "src": d["l_partkey"].to_numpy(dtype=np.int64) * 2,
                    "dst": d["l_suppkey"].to_numpy(dtype=np.int64) * 2 + 1,
                    "w": 1
                    + np.round(d["l_quantity"].to_numpy(dtype=np.float64))
                    .astype(np.int64)
                    % 5,
                }
            )
            # per-batch per-pair min combiner; parallel edges across
            # batches are harmless (relaxation minimizes over them)
            return out.groupby(["src", "dst"], as_index=False)["w"].min()

        edges = (
            read_parquet_clean(
                os.path.join(sf_dir, "lineitem.parquet"),
                columns=["l_partkey", "l_suppkey", "l_quantity"],
            )
            .map_batches(wedges, batch_format="pandas")
            .materialize()  # E-bounded; consumed by min() probes + rounds
        )
        seed = int(min(edges.min("src"), edges.min("dst")))
        return sssp_weighted(edges, seeds=[seed], max_hops=4)

    def doc_sorted_neighbors(sf_dir: str):
        """Oracle-checked: sorted-neighborhood blocking (Hernández-
        Stolfo SNM) — global row_number over the normalized 24-char
        key prefix (two-pass range decomposition), then every
        candidate pair within 5 rank positions via rank-bucketed
        ghost-overlap pairing; candidate volume exactly n·w
        (`kgflow.ops.dedup.sorted_neighborhood_pairs`)."""
        from kgflow.ops.dedup import sorted_neighborhood_pairs
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return sorted_neighborhood_pairs(docs, key_chars=24, window=5)

    def doc_source_gate(sf_dir: str):
        """Oracle-checked: per-source (domain-level) quality gate —
        keep docs whose source's mean token count ≥ the corpus mean;
        the bar is cross-multiplied in exact integers on the
        source-bounded stats table, pass set broadcast, second pass
        reads only (doc_id, source)
        (`kgflow.ops.clean.source_quality_gate`)."""
        from kgflow.ops.clean import source_quality_gate
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "source", "text"],
        )
        return source_quality_gate(docs)

    def embed_kmeans_assign(sf_dir: str):
        """Oracle-checked: exact k-means E-step — centroids = the 8
        smallest-id vectors, distances in quantized int64 space
        (floor(x·1e4)) so d² and the argmin are hash-identical to the
        SQL replay; seed fetch is a k-bounded min-k combiner, the
        assignment pass is exchange-free (broadcast centroid matrix,
        one int64 matmul per batch)
        (`kgflow.ops.ann.kmeans_assign`)."""
        from kgflow.ops.ann import kmeans_assign
        from kgflow.sources.parquet import read_parquet_clean

        emb = read_parquet_clean(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        return kmeans_assign(emb, k=8)

    def events_props_stats(sf_dir: str):
        """Oracle-checked: grouped integer-field stats extracted from
        the JSON props sidecar — one vectorized regex pass (no per-row
        json.loads), per-batch (group, n, sum, max) combiner,
        group-bounded exchange
        (`kgflow.ops.profile.json_int_field_stats`)."""
        from kgflow.ops.profile import json_int_field_stats
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "props"],
        )
        return json_int_field_stats(ev, "event_type", "props", "k")

    def supplier_copart(sf_dir: str):
        """Oracle-checked: weighted one-mode projection of the
        part↔supplier bipartite graph — supplier pairs weighted by
        DISTINCT co-supplied parts (cell-keyed dedup + guarded
        self-merge + pair-keyed count reduce), global top-20 by
        (shared DESC, u, v) via the min-k semigroup combiner
        (`kgflow.ops.graph.weighted_projection`)."""
        from kgflow.ops.graph import weighted_projection
        from kgflow.ops.shuffle import global_topk
        from kgflow.sources.parquet import read_parquet_clean

        li = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey"],
        )
        proj = weighted_projection(li, "l_suppkey", ["l_partkey"])
        return global_topk(
            proj,
            sort_cols=["shared", "u", "v"],
            ascending=[False, True, True],
            k=20,
        )

    def events_range_sum(sf_dir: str):
        """Oracle-checked: RANGE-frame windowed sum (trailing 24 h per
        user, SQL peer semantics included) — ONE key-bucketed exchange,
        in-bucket int64 cumsum + two vectorized searchsorted calls,
        fixed-point exact (`kgflow.ops.window.range_window_sum`)."""
        from kgflow.ops.window import range_window_sum
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "value"],
        )
        return range_window_sum(
            ev, key_col="user_id", ts_col="ts", value_col="value",
            id_col="event_id", hours=24,
        )

    def doc_snm_dups(sf_dir: str):
        """Oracle-checked: END-TO-END sorted-neighborhood dedup —
        SNM blocking (`dedup.sorted_neighborhood_pairs`) composed with
        the shared exact word-3-gram Jaccard verify tail
        (`dedup.exact_jaccard_verify`, threshold 0.5); candidate
        volume n·w, text ships once per side. sim floor-scaled 1e4 on
        both sides."""
        from kgflow.ops.dedup import (
            exact_jaccard_verify,
            sorted_neighborhood_pairs,
        )
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        cands = sorted_neighborhood_pairs(
            docs, key_chars=24, window=5
        ).map_batches(
            lambda df: df[["doc_a", "doc_b"]], batch_format="pandas"
        )
        return exact_jaccard_verify(cands, docs, threshold=0.5).map_batches(
            lambda df: _floor_scale_pd(df, "sim", 1e4), batch_format="pandas"
        )

    def events_basket3(sf_dir: str):
        """Oracle-checked: Apriori level-3 itemset support over
        (user, day) baskets — basket-keyed exchange with a guarded
        double self-merge per basket, item³-bounded count reduce
        (`kgflow.ops.graph.item_triple_support`)."""
        import pandas as pd

        from kgflow.ops.graph import item_triple_support
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"],
        )

        def basket(df: pd.DataFrame) -> pd.DataFrame:
            day = (
                df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
            )
            return pd.DataFrame(
                {
                    "basket": df["user_id"].to_numpy(dtype=np.int64)
                    * 1_000_000
                    + day,
                    "item": df["event_type"].astype(object),
                }
            )

        return item_triple_support(
            ev.map_batches(basket, batch_format="pandas"), "basket", "item"
        )

    def source_overlap(sf_dir: str):
        """Oracle-checked: cross-source near-dup exposure — source
        pairs weighted by shared normalized 24-char prefix keys (the
        SNM key as an exact blocking fingerprint), i.e. the
        contamination matrix between publishers
        (`kgflow.ops.graph.weighted_projection` over string
        entities)."""
        import pandas as pd

        from kgflow.ops.graph import weighted_projection
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["source", "text"],
        )

        def keyed(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "source": df["source"].astype(object),
                    "fp": df["text"]
                    .str.lower()
                    .str.replace(r"\s+", " ", regex=True)
                    .str.slice(0, 24)
                    .astype(object),
                }
            )

        return weighted_projection(
            docs.map_batches(keyed, batch_format="pandas"), "source", ["fp"]
        )

    def events_negatives(sf_dir: str):
        """Oracle-checked: deterministic negative sampling — for every
        (user, day) basket, the event types the basket does NOT
        contain (the implicit-feedback training complement); broadcast
        item universe + one basket-keyed exchange, exact ANTI JOIN
        semantics (`kgflow.ops.graph.basket_missing_items`)."""
        import pandas as pd

        from kgflow.ops.graph import basket_missing_items
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"],
        )

        def daily(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": df["user_id"].astype(np.int64),
                    "day": df["ts"]
                    .to_numpy()
                    .astype("datetime64[D]")
                    .astype("datetime64[us]"),
                    "event_type": df["event_type"].astype(object),
                }
            )

        return basket_missing_items(
            ev.map_batches(daily, batch_format="pandas"),
            ["user_id", "day"],
            "event_type",
        )

    def events_iqr_outliers(sf_dir: str):
        """Oracle-checked: per-type Tukey-fence outlier counts at 3×
        IQR with EXACT discrete quartiles (quantile_disc semantics,
        fixed-point) — distributed histogram quartiles, group-bounded
        fence broadcast, one counted streaming pass; q1/q3 in the
        output so the fences themselves are checked
        (`kgflow.ops.profile.grouped_iqr_outliers`)."""
        from kgflow.ops.profile import grouped_iqr_outliers
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        return grouped_iqr_outliers(ev, "event_type", "value", fence=3)

    def doc_query_dups(sf_dir: str):
        """Oracle-checked: asymmetric near-dup LOOKUP (online dedup /
        lexical retrieval) — planted excerpt queries (first 60 tokens
        of every doc_id % 83 == 5 source, ids offset +2e6, the
        doc_containment planting pattern) searched against the full
        corpus via the query×corpus count-join; candidate volume
        proportional to the QUERY side
        (`kgflow.ops.dedup.jaccard_lookup`, threshold 0.3). sim
        floor-scaled 1e4 on both sides."""
        import pandas as _pd

        from kgflow.ops.dedup import jaccard_lookup
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )

        def plant(df: _pd.DataFrame) -> _pd.DataFrame:
            qd = df.loc[df["doc_id"].to_numpy() % 83 == 5]
            toks = qd["text"].str.lower().str.findall(r"\w+")
            return _pd.DataFrame(
                {
                    "doc_id": qd["doc_id"].astype(np.int64) + 2_000_000,
                    "text": toks.str[:60].str.join(" "),
                }
            )

        queries = docs.map_batches(plant, batch_format="pandas")
        return jaccard_lookup(docs, queries, threshold=0.3).map_batches(
            lambda df: _floor_scale_pd(df, "sim", 1e4),
            batch_format="pandas",
        )

    def customer_rfm(sf_dir: str):
        """Oracle-checked: RFM segmentation — per-customer recency/
        frequency/monetary from orders, each NTILE(5)-bucketed over
        the total (value DESC, custkey) order via global_row_number's
        two-pass range decomposition (no single-bucket global sort);
        front-loaded NTILE split from (rank, N)
        (`kgflow.ops.relational.customer_rfm`)."""
        from kgflow.ops.relational import customer_rfm as rfm

        return rfm(sf_dir)

    def events_weighted_median(sf_dir: str):
        """Oracle-checked: per-type WEIGHTED lower median of value,
        weights = 1 + (props.k % 7) — exact integer cumulative-weight
        rule (2·cw ≥ tw), same spread-then-assemble histogram shape
        as grouped_quantiles
        (`kgflow.ops.profile.grouped_weighted_median`)."""
        import pandas as _pd

        from kgflow.ops.profile import grouped_weighted_median
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value", "props"],
        )

        def wt(df: _pd.DataFrame) -> _pd.DataFrame:
            k = (
                df["props"]
                .str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
                .astype("int64")
            )
            return _pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "value": df["value"],
                    "wt": 1 + (k.to_numpy() % 7),
                }
            )

        return grouped_weighted_median(
            ev.map_batches(wt, batch_format="pandas"),
            "event_type",
            "value",
            "wt",
        )

    def supplier_top_quantities(sf_dir: str):
        """Oracle-checked: per-supplier top-2 shipped quantities WITH
        ties (RANK() <= 2 semantics — boundary ties kept in full, row
        multiplicity preserved; integral quantities make ties dense) —
        sound rank-≤-k semigroup combiner before ONE group exchange
        (`kgflow.ops.shuffle.grouped_topk_ties`)."""
        import pandas as _pd

        from kgflow.ops.shuffle import grouped_topk_ties
        from kgflow.sources.parquet import read_parquet_clean

        li = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_suppkey", "l_quantity"],
        )

        def shrink(df: _pd.DataFrame) -> _pd.DataFrame:
            return _pd.DataFrame(
                {
                    "l_suppkey": df["l_suppkey"].astype(np.int64),
                    "q_fp": np.round(
                        df["l_quantity"].to_numpy(dtype=np.float64) * 100
                    ).astype(np.int64),
                }
            )

        return grouped_topk_ties(
            li.map_batches(shrink, batch_format="pandas"),
            group_cols=["l_suppkey"],
            sort_col="q_fp",
            k=2,
        )

    def doc_find_pos(sf_dir: str):
        """Oracle-checked: per-doc 1-based first-occurrence position of
        'the ' in the lowercased text (0 = absent) — pure zero-copy
        Arrow kernels, strpos semantics
        (`kgflow.ops.text.substring_position`)."""
        from kgflow.ops.text import substring_position
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return substring_position(docs, "the ")

    def doc_tokenize_unk(sf_dir: str):
        """Oracle-checked: induce-then-apply tokenizer prep — global
        top-20 vocabulary (deterministic freq/token ties) broadcast,
        then one streaming pass scores (doc_id, n_tokens, n_unk); the
        OOV rate is non-vacuous (~32% of tokens)
        (`kgflow.ops.text.vocab_apply`)."""
        from kgflow.ops.text import vocab_apply
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        return vocab_apply(docs, vocab_size=20)

    def events_twa(sf_dir: str):
        """Oracle-checked: per-user time-weighted average of value
        (each value holds until the next event; µs gaps × fixed-point
        values, arbitrary-precision numerator, SQL lead() replay)
        (`kgflow.ops.window.time_weighted_avg`)."""
        from kgflow.ops.window import time_weighted_avg
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "value"],
        )
        return time_weighted_avg(
            ev, key_col="user_id", ts_col="ts", value_col="value",
            id_col="event_id",
        )

    def orders_rich_semi(sf_dir: str):
        """Oracle-checked: Bloom-prefiltered semi join — orders of
        customers with c_acctbal > 9000; the broadcast Bloom drops
        definite non-members before any exchange and the exact semi
        join removes false positives, so the result is exact while
        the fact shuffle shrinks to survivors
        (`kgflow.ops.joins.bloom_semi_join`)."""
        import pandas as _pd

        from kgflow.ops.joins import bloom_semi_join
        from kgflow.sources.parquet import read_parquet_clean

        rich = read_parquet_clean(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_acctbal"],
        ).map_batches(
            lambda d: _pd.DataFrame(
                {
                    "o_custkey": d.loc[
                        d["c_acctbal"].to_numpy() > 9000.0, "c_custkey"
                    ].astype(np.int64)
                }
            ),
            batch_format="pandas",
        )
        orders = read_parquet_clean(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        )
        return bloom_semi_join(orders, rich, on="o_custkey")

    def orders_page(sf_dir: str):
        """Oracle-checked: LIMIT/OFFSET pagination over a DISTRIBUTED
        global sort — rows ranked 101..120 by (totalprice DESC,
        orderkey) via global_row_number's two-pass range decomposition
        (descending via a negated fixed-point column); stable
        pagination without any single-task whole-table sort."""
        import pandas as _pd

        from kgflow.ops.shuffle import global_row_number
        from kgflow.sources.parquet import read_parquet_clean

        orders = read_parquet_clean(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_totalprice"],
        ).map_batches(
            lambda d: _pd.DataFrame(
                {
                    "o_orderkey": d["o_orderkey"].astype(np.int64),
                    "o_totalprice": d["o_totalprice"],
                    "_neg": -np.round(
                        d["o_totalprice"].to_numpy(dtype=np.float64) * 100
                    ).astype(np.int64),
                }
            ),
            batch_format="pandas",
        )
        rn = global_row_number(
            orders, sort_cols=["_neg", "o_orderkey"], out_col="rn"
        )
        return rn.map_batches(
            lambda d: d.loc[
                (d["rn"] >= 101) & (d["rn"] <= 120),
                ["o_orderkey", "o_totalprice", "rn"],
            ],
            batch_format="pandas",
        )

    def events_running_distinct(sf_dir: str):
        """Oracle-checked: per-user running distinct event-type count
        at every event — first-occurrence flags under a per-key
        cumulative sum (SQL replay: row_number=1 per (key, value)
        inside a windowed sum, since COUNT(DISTINCT) OVER doesn't
        exist) (`kgflow.ops.window.running_distinct`)."""
        from kgflow.ops.window import running_distinct
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "event_type"],
        )
        return running_distinct(
            ev, key_col="user_id", value_col="event_type",
            ts_col="ts", id_col="event_id",
        )

    def source_vocab_overlap(sf_dir: str):
        """Oracle-checked: cross-source vocabulary drift — source
        pairs with shared distinct 3-gram shingle counts plus each
        side's shingle-set size (Jaccard = inter/(n_a+n_b−inter) at
        the edge, kept integer): `graph.weighted_projection` over
        (source, shingle) cells + a broadcast size attach."""
        import pandas as _pd
        import ray

        from kgflow.ops.dedup import _word_shingles
        from kgflow.ops.graph import weighted_projection
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["source", "text"],
        )

        def sh(df: _pd.DataFrame) -> _pd.DataFrame:
            cache: dict = {}
            srcs, shs = [], []
            for s, t in zip(df["source"], df["text"]):
                g = _word_shingles(t, 3, _cache=cache)
                srcs.append(np.full(len(g), s, dtype=object))
                shs.append(g)
            if not shs:
                return _pd.DataFrame(
                    {
                        "source": _pd.Series([], dtype="object"),
                        "sh": _pd.Series([], dtype="uint64"),
                    }
                )
            return _pd.DataFrame(
                {
                    "source": np.concatenate(srcs),
                    "sh": np.concatenate(shs),
                }
            ).drop_duplicates()

        st = docs.map_batches(sh, batch_format="pandas")
        pairs = weighted_projection(st, "source", ["sh"])

        # per-block dedup is NOT global: (source, shingle) rows repeat
        # across blocks, so set sizes go through the same cell-keyed
        # dedup exchange the projection uses before counting
        from kgflow.ops.shuffle import bucketed_group_reduce as _bgr

        dedup_st = _bgr(
            st,
            key_cols=["sh"],
            reduce_fn=lambda g: g.drop_duplicates(),
        )
        sizes = (
            _bgr(
                dedup_st.map_batches(
                    lambda d: d.groupby("source", as_index=False)
                    .size()
                    .rename(columns={"size": "n"}),
                    batch_format="pandas",
                ),
                key_cols=["source"],
                reduce_fn=lambda g: g.groupby("source", as_index=False)[
                    "n"
                ].sum(),
            )
            .to_pandas()
            .set_index("source")["n"]
            .to_dict()
        )
        sref = ray.put(sizes)

        def attach(d: _pd.DataFrame) -> _pd.DataFrame:
            sz = ray.get(sref)
            return _pd.DataFrame(
                {
                    "src_a": d["u"].astype(object),
                    "src_b": d["v"].astype(object),
                    "n_a": np.array(
                        [sz[x] for x in d["u"]], dtype=np.int64
                    ),
                    "n_b": np.array(
                        [sz[x] for x in d["v"]], dtype=np.int64
                    ),
                    "inter": d["shared"].astype(np.int64),
                }
            )

        return pairs.map_batches(attach, batch_format="pandas")

    def events_transition_times(sf_dir: str):
        """Oracle-checked: semi-Markov transition stats — per ordered
        (from, to) event-type pair across consecutive same-user
        events, transition count + total dwell gap in µs
        (`kgflow.ops.window.transition_gap_stats`)."""
        from kgflow.ops.window import transition_gap_stats
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "event_type"],
        )
        return transition_gap_stats(
            ev, key_col="user_id", state_col="event_type",
            ts_col="ts", id_col="event_id",
        )

    def events_bursts(sf_dir: str):
        """Oracle-checked: burst detection — events whose same-user
        trailing-1-hour event count (RANGE frame, peers included)
        reaches 3; reuses `range_window_sum` with a unit value at
        scale 1 so the windowed count stays integer-exact."""
        import pandas as _pd

        from kgflow.ops.window import range_window_sum
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts"],
        ).map_batches(
            lambda d: d.assign(one=np.ones(len(d), dtype=np.float64)),
            batch_format="pandas",
        )
        counts = range_window_sum(
            ev, key_col="user_id", ts_col="ts", value_col="one",
            id_col="event_id", hours=1, scale=1, out_col="cnt",
        )
        return counts.map_batches(
            lambda d: _pd.DataFrame(
                {
                    "event_id": d.loc[
                        d["cnt"].to_numpy() >= 3.0, "event_id"
                    ].astype(np.int64),
                    "cnt": d.loc[
                        d["cnt"].to_numpy() >= 3.0, "cnt"
                    ].astype(np.int64),
                }
            ),
            batch_format="pandas",
        )

    def source_distinctive_tokens(sf_dir: str):
        """Oracle-checked: the 20 tokens most over-represented in the
        largest source vs the rest — integer cross-multiplied log-odds
        core (ca·tb − cb·ta, no floats, no smoothing), vocab-bounded
        exchange + global-topk combiner
        (`kgflow.ops.text.discriminative_tokens`)."""
        import pandas as _pd

        from kgflow.ops.shuffle import bucketed_group_reduce
        from kgflow.ops.text import discriminative_tokens
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["source", "text"],
        )
        # biggest source by (count DESC, source ASC): source-bounded
        sizes = (
            bucketed_group_reduce(
                docs.map_batches(
                    lambda d: d.groupby("source", as_index=False)
                    .size()
                    .rename(columns={"size": "n"}),
                    batch_format="pandas",
                ),
                key_cols=["source"],
                reduce_fn=lambda g: g.groupby("source", as_index=False)[
                    "n"
                ].sum(),
            )
            .to_pandas()
            .sort_values(["n", "source"], ascending=[False, True])
        )
        target = str(sizes["source"].iloc[0])
        return discriminative_tokens(docs, "source", target, k=20)

    def events_locf(sf_dir: str):
        """Oracle-checked: LOCF grid resampling — the telemetry
        regularization op: a synthesized weekly grid (users × day-0 +
        7d·i) as-of joined to the event stream, so every grid point
        carries the last observation at or before it (inner semantics:
        points before a user's first event drop). Grid synthesis is a
        broadcast day array over the distinct-user exchange; the join
        is the shipped one-exchange `asof_join`."""
        import pandas as _pd

        from kgflow.ops.joins import distinct_rows
        from kgflow.ops.window import asof_join
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "event_type"],
        )
        mm = (
            ev.map_batches(
                lambda d: _pd.DataFrame(
                    {
                        "lo": [d["ts"].min()],
                        "hi": [d["ts"].max()],
                    }
                ),
                batch_format="pandas",
            ).to_pandas()
        )
        lo = mm["lo"].min().floor("D")
        hi = mm["hi"].max().floor("D")
        n_steps = int((hi - lo) / _pd.Timedelta(days=7)) + 1
        days = _pd.date_range(lo, periods=n_steps, freq="7D")

        def grid(df: _pd.DataFrame) -> _pd.DataFrame:
            u = df["user_id"].to_numpy(dtype=np.int64)
            return _pd.DataFrame(
                {
                    "event_id": np.repeat(u, n_steps) * 1000
                    + np.tile(np.arange(n_steps, dtype=np.int64), len(u)),
                    "user_id": np.repeat(u, n_steps),
                    "ts": np.tile(days.to_numpy(), len(u)),
                }
            )

        g = distinct_rows(ev, ["user_id"]).map_batches(
            grid, batch_format="pandas"
        )
        joined = asof_join(g, ev, key="user_id", ts_col="ts",
                           id_col="event_id")
        return joined.map_batches(
            lambda d: _pd.DataFrame(
                {
                    "user_id": d["user_id"].astype(np.int64),
                    "grid_ts": d["ts"],
                    "prior_event_id": d["prior_event_id"].astype(np.int64),
                }
            ),
            batch_format="pandas",
        )

    def part_abc(sf_dir: str):
        """Oracle-checked: ABC/Pareto inventory classification — parts
        by cumulative revenue share over the (revenue DESC, partkey)
        total order: class A to 80%, B to 95%, C beyond, decided by
        exact integer fence compares (5·cum ≤ 4·tot, 20·cum ≤ 19·tot)
        on `global_running_sum`'s two-pass range-decomposed prefix —
        no single-task sort, no float shares."""
        import pandas as _pd

        from kgflow.ops.shuffle import (
            bucketed_group_reduce,
            global_running_sum,
        )
        from kgflow.sources.parquet import read_parquet_clean

        pr = bucketed_group_reduce(
            read_parquet_clean(
                os.path.join(sf_dir, "lineitem.parquet"),
                columns=["l_partkey", "l_extendedprice"],
            ).map_batches(
                lambda d: _pd.DataFrame(
                    {
                        "l_partkey": d["l_partkey"].astype(np.int64),
                        "r_fp": np.round(
                            d["l_extendedprice"].to_numpy(dtype=np.float64)
                            * 100
                        ).astype(np.int64),
                    }
                ).groupby("l_partkey", as_index=False)["r_fp"].sum(),
                batch_format="pandas",
            ),
            key_cols=["l_partkey"],
            reduce_fn=lambda g: g.groupby("l_partkey", as_index=False)[
                "r_fp"
            ].sum(),
        ).map_batches(
            lambda d: d.assign(_neg=-d["r_fp"].to_numpy()),
            batch_format="pandas",
        ).materialize()  # part-bounded; running-sum passes + total fold

        tot = int(
            pr.map_batches(
                lambda d: _pd.DataFrame({"t": [d["r_fp"].sum()]}),
                batch_format="pandas",
            )
            .to_pandas()["t"]
            .sum()
        )
        cum = global_running_sum(
            pr, sort_cols=["_neg", "l_partkey"], value_col="r_fp",
            out_col="cum",
        )

        def classify(d: _pd.DataFrame) -> _pd.DataFrame:
            c = d["cum"].to_numpy(dtype=np.int64)
            cls = np.where(
                5 * c <= 4 * tot, "A", np.where(20 * c <= 19 * tot, "B", "C")
            )
            return _pd.DataFrame(
                {
                    "l_partkey": d["l_partkey"].astype(np.int64),
                    "r_fp": d["r_fp"].astype(np.int64),
                    "cls": cls,
                }
            )

        return cum.map_batches(classify, batch_format="pandas")

    def doc_cluster_sizes(sf_dir: str):
        """Oracle-checked: dedup-yield report — the near-dup cluster
        SIZE histogram (cluster_size, n_clusters), the number every
        dedup run reports first; reuses the memoized cluster table
        (engine cost ≈ one comp-keyed count + one size-keyed count)."""
        import pandas as _pd

        from kgflow.ops.shuffle import bucketed_group_reduce

        clusters = _clusters_mat(sf_dir)
        sizes = bucketed_group_reduce(
            clusters.map_batches(
                lambda d: d.groupby("cluster_id", as_index=False)
                .size()
                .rename(columns={"size": "sz"}),
                batch_format="pandas",
            ),
            key_cols=["cluster_id"],
            reduce_fn=lambda g: g.groupby("cluster_id", as_index=False)[
                "sz"
            ].sum(),
        )
        return bucketed_group_reduce(
            sizes.map_batches(
                lambda d: d.groupby("sz", as_index=False)
                .size()
                .rename(columns={"sz": "cluster_size", "size": "n_clusters"}),
                batch_format="pandas",
            ),
            key_cols=["cluster_size"],
            reduce_fn=lambda g: g.groupby("cluster_size", as_index=False)[
                "n_clusters"
            ].sum(),
        ).map_batches(
            lambda d: d.astype(
                {"cluster_size": "int64", "n_clusters": "int64"}
            ),
            batch_format="pandas",
        )

    def doc_kwic(sf_dir: str):
        """Oracle-checked: KWIC concordance for the 21st-ranked token
        (just outside the top-20 vocab, deterministic (n DESC, token)
        pick) — ±3-token windows per occurrence, exchange-free
        streaming pass, per-window work keyword-bounded
        (`kgflow.ops.text.kwic_windows`)."""
        from kgflow.ops.shuffle import bucketed_group_reduce
        from kgflow.ops.text import kwic_windows, vocab_topk
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        kw = str(
            vocab_topk(docs, k=21).to_pandas()["token"].iloc[20]
        )  # 21-bounded pull
        return kwic_windows(docs, kw, radius=3)

    def events_mad(sf_dir: str):
        """Oracle-checked: per-type exact median + median-absolute-
        deviation (Hampel robust outlier scale) — doubly holistic, so
        ONE key-bucketed exchange of raw (key, value) pairs; both
        medians are in-bucket numpy partitions
        (`kgflow.ops.profile.grouped_mad`)."""
        from kgflow.ops.profile import grouped_mad
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "value"],
        )
        return grouped_mad(ev, key="event_type")

    def events_chi2(sf_dir: str):
        """Oracle-checked: Pearson chi-square independence test of
        event_type × day-of-week — contingency counts via combiner +
        ONE category-bounded int64 exchange; the statistic folds in
        sorted cell order, absent cells contribute n − Σe exactly
        (`kgflow.ops.profile.chi2_independence`)."""
        import pandas as _pd

        from kgflow.ops.profile import chi2_independence
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "ts"],
        )

        def with_dow(df: _pd.DataFrame) -> _pd.DataFrame:
            return _pd.DataFrame(
                {
                    "event_type": df["event_type"],
                    "dow": df["ts"].dt.dayofweek.astype(np.int64),
                }
            )

        return chi2_independence(
            ev.map_batches(with_dow, batch_format="pandas"),
            row_col="event_type",
            col_col="dow",
        )

    def doc_hapax(sf_dir: str):
        """Oracle-checked: corpus hapax-legomena profile (n_tokens,
        n_vocab, n_hapax, hapax_ratio) — token-count combiner → ONE
        vocab-bounded int64 exchange, per-bucket 3-int fold; the ratio
        is the single float op (`kgflow.ops.text.hapax_stats`)."""
        from kgflow.ops.text import hapax_stats
        from kgflow.sources.parquet import read_parquet_clean

        return hapax_stats(
            read_parquet_clean(
                os.path.join(sf_dir, "documents.parquet"), columns=["text"]
            )
        )

    def events_first_last(sf_dir: str):
        """Oracle-checked: per-user FIRST/LAST event attributes in
        (ts, event_id) order — first/last is a semigroup, so each block
        ships ≤ 2 candidate rows per key into ONE keyed exchange
        (`kgflow.ops.window.grouped_first_last`)."""
        from kgflow.ops.window import grouped_first_last
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type", "value"],
        )
        return grouped_first_last(ev)

    def graph_assortativity(sf_dir: str):
        """Oracle-checked: exact degree-assortativity moments (n, Σx,
        Σy, Σx², Σy², Σxy) of the distinct high-quantity part→supplier
        edge list — distinct_rows combiner+exchange, node-bounded
        degree tables attached via auto-broadcast hash_join, ONE 6-int
        row shipped per block; the Pearson coefficient is a single
        driver-side division (`kgflow.ops.graph.degree_assortativity`).
        """
        import pandas as _pd

        from kgflow.ops.graph import degree_assortativity
        from kgflow.sources.parquet import read_parquet_clean

        def pairs(df: _pd.DataFrame) -> _pd.DataFrame:
            d = df.loc[df["l_quantity"].to_numpy() >= 45.0]
            return _pd.DataFrame(
                {
                    "src": d["l_partkey"].to_numpy(dtype=np.int64),
                    "dst": d["l_suppkey"].to_numpy(dtype=np.int64),
                }
            )

        edges = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        ).map_batches(pairs, batch_format="pandas")
        return degree_assortativity(edges)

    def events_moving_median(sf_dir: str):
        """Oracle-checked: per-user trailing-5 moving median of event
        values in (ts, event_id) order — holistic window, ONE
        key-bucketed exchange, in-bucket pandas rolling-median C
        kernel; even frames interpolate (a+b)/2 exactly like SQL
        median() OVER (`kgflow.ops.window.moving_median`)."""
        from kgflow.ops.window import moving_median
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "value"],
        )
        return moving_median(ev, window=5)

    def doc_pmi_pairs(sf_dir: str):
        """Oracle-checked: adjacent-bigram PMI collocations — unigram
        and bigram counts each combiner → ONE int64 keyed exchange,
        min_count filter before the vocab-bounded broadcast count
        joins, single final ln (`kgflow.ops.text.pmi_collocations`)."""
        from kgflow.ops.text import pmi_collocations
        from kgflow.sources.parquet import read_parquet_clean

        docs = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"), columns=["text"]
        )
        return pmi_collocations(docs, min_count=5)

    def events_concurrency(sf_dir: str):
        """Oracle-checked: per-day max concurrency of 30-minute
        intervals — the distributed sweep-line prefix sum (time-range
        buckets, per-bucket Σdelta offsets, in-bucket exact cumsum);
        SQL reproduces it with SUM(delta) OVER (ORDER BY t, delta)."""
        from kgflow.ops.window import interval_concurrency_daily
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"), columns=["ts"]
        )
        return interval_concurrency_daily(ev, duration_min=30)

    def orders_pareto(sf_dir: str):
        """Oracle-checked: 2-D Pareto frontier of orders — maximize
        o_totalprice, minimize o_orderdate ("high value, early"); local
        skyline per block + one single-bucket exact refine (skyline of
        skylines), vs the NOT EXISTS dominance SQL."""
        from kgflow.ops.shuffle import pareto_front
        from kgflow.sources.parquet import read_parquet_clean

        orders = read_parquet_clean(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_orderdate", "o_totalprice"],
        )
        return pareto_front(
            orders, x_col="o_totalprice", y_col="o_orderdate",
            maximize_x=True, minimize_y=True,
        )

    def doc_snapshot_diff(sf_dir: str):
        """Oracle-checked: incremental snapshot delta — version B of
        documents is synthesized deterministically (drop id%10==3,
        bump n_chars for id%10==7, add id+10^9 clones of id%10==0; the
        plant is shared verbatim with the SQL), then
        `checks.snapshot_diff` classifies every key added/removed/
        changed via per-row FNV hashes — payloads never ride the
        exchange."""
        import pandas as _pd

        from kgflow.ops.checks import snapshot_diff

        old = _docs(sf_dir).select_columns(["doc_id", "n_chars"])

        def make_b(df: _pd.DataFrame) -> _pd.DataFrame:
            ids = df["doc_id"].to_numpy(dtype=np.int64)
            nch = df["n_chars"].to_numpy(dtype=np.int64)
            keep = ids % 10 != 3
            base = _pd.DataFrame(
                {
                    "doc_id": ids[keep],
                    "n_chars": np.where(
                        ids[keep] % 10 == 7, nch[keep] + 1, nch[keep]
                    ),
                }
            )
            addm = ids % 10 == 0
            added = _pd.DataFrame(
                {"doc_id": ids[addm] + 10**9, "n_chars": nch[addm]}
            )
            return _pd.concat([base, added], ignore_index=True)

        new = _docs(sf_dir).select_columns(["doc_id", "n_chars"]).map_batches(
            make_b, batch_format="pandas"
        )
        return snapshot_diff(old, new, key_col="doc_id", cols=["n_chars"])

    def doc_canonical_keep(sf_dir: str):
        """Oracle-checked: keep-best-per-near-dup-cluster — the step
        that turns dedup CLUSTERS into a kept corpus: cluster ids from
        `neardup_clusters` (same predicate the doc_dup_clusters oracle
        replays), longest doc wins per cluster (n_chars desc, doc_id
        asc — total order), via one per-group top-1."""
        import pandas as _pd

        from kgflow.ops.joins import hash_join
        from kgflow.ops.shuffle import grouped_topk

        clusters = _clusters_mat(sf_dir)
        docs = _docs(sf_dir).select_columns(["doc_id", "n_chars"])
        joined = hash_join(clusters, docs, on="doc_id")
        keep = grouped_topk(
            joined,
            group_cols=["cluster_id"],
            sort_cols=["n_chars", "doc_id"],
            ascending=[False, True],
            k=1,
        )
        return keep.map_batches(
            lambda d: _pd.DataFrame(
                {
                    "cluster_id": d["cluster_id"].astype(np.int64),
                    "keep_doc_id": d["doc_id"].astype(np.int64),
                    "n_chars": d["n_chars"].astype(np.int64),
                }
            ),
            batch_format="pandas",
        )

    def events_dense_hourly(sf_dir: str):
        """Oracle-checked: gap-filled hourly counts per type — every
        hour between a type's first and last event, zero-filled; the
        dense grid expands distributed from a types-bounded bounds
        table, counts left-join co-bucketed."""
        from kgflow.ops.relational import dense_hourly_counts

        return dense_hourly_counts(sf_dir)

    def nation_share(sf_dir: str):
        """Oracle-checked: percent-of-total — each nation's order
        revenue and its share of the region total; per-custkey
        combiner, auto-broadcast customer join, nations-bounded final
        reduce with one exact int÷int division per nation."""
        from kgflow.ops.relational import nation_revenue_share

        return nation_revenue_share(sf_dir)

    def orders_gini(sf_dir: str):
        """Oracle-checked: exact Gini of per-customer revenue — the
        distributed ROW_NUMBER (range-decomposition rank) feeding the
        closed-form moment; integer-exact to the last division."""
        from kgflow.ops.relational import orders_gini_coefficient

        return orders_gini_coefficient(sf_dir)

    def events_user_entropy(sf_dir: str):
        """Oracle-checked: per-user Shannon entropy (nats) of the
        event-type mix — (user, type) count combiner, one user-keyed
        exchange, vectorized in-bucket entropy; counts stay int64 so
        engine-vs-SQL drift is libm-ulp-bounded."""
        from kgflow.ops.profile import grouped_entropy
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type"],
        )
        return grouped_entropy(ev, ["user_id"], "event_type")

    def events_dedup_day(sf_dir: str):
        """Oracle-checked: at-least-once log dedup — first event per
        (user, type, day); semigroup-min combiner, one (key, win)
        exchange."""
        from kgflow.ops.window import window_dedup
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "ts", "event_id"],
        )
        return window_dedup(ev, window="day")

    def events_rolling_dau(sf_dir: str):
        """Oracle-checked: rolling 7-day distinct active users per day
        — sliding-window distinct via bounded window explode over the
        deduped (day, user) pairs + exact grouped distinct count."""
        from kgflow.ops.window import rolling_window_distinct
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["ts", "user_id"],
        )
        return rolling_window_distinct(ev)

    def doc_checksum(sf_dir: str):
        """Oracle-checked: order-independent table fingerprint of
        documents(doc_id, n_chars) — per-block FNV fold + wrap-sum,
        one 2-scalar row per block on the exchange."""
        from kgflow.ops.checks import table_checksum

        return table_checksum(
            _docs(sf_dir).select_columns(["doc_id", "n_chars"]),
            cols=["doc_id", "n_chars"],
        )

    def doc_perplexity(sf_dir: str):
        """Oracle-checked: CCNet-style LM filter score — per-document
        MLE bigram-LM log-probability (n_bigrams, logprob_sum) with
        the LM trained on the same corpus it scores. One tokenize pass
        (the materialized per-doc bigram table feeds both training and
        scoring); broadcast-LM fast path with a co-partitioned
        two-join fallback, parity-tested."""
        from kgflow.ops.text import bigram_perplexity

        return bigram_perplexity(_docs(sf_dir))

    def graph_adamic_adar(sf_dir: str):
        """Oracle-checked: link-prediction scores (common-neighbor
        count + Adamic–Adar) over the part→supplier bipartite graph,
        high-quantity edges — hub-keyed wedge fan-out with a LOUD
        max-degree cap, pair-keyed sum."""
        from kgflow.ops.graph import adamic_adar_scores
        from kgflow.sources.parquet import read_parquet_clean

        li = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        ).filter(lambda r: r["l_quantity"] >= 45)
        return adamic_adar_scores(li, hub_col="l_partkey", leaf_col="l_suppkey")

    def graph_jaccard(sf_dir: str):
        """Oracle-checked: neighbor-set Jaccard link prediction
        (Liben-Nowell & Kleinberg 2003) over the same part→supplier
        bipartite graph as graph_adamic_adar — exact int64
        common-neighbor counts and degrees, one IEEE division
        (`kgflow.ops.graph.jaccard_link_scores`)."""
        from kgflow.ops.graph import jaccard_link_scores
        from kgflow.sources.parquet import read_parquet_clean

        li = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        ).filter(lambda r: r["l_quantity"] >= 45)
        return jaccard_link_scores(
            li, hub_col="l_partkey", leaf_col="l_suppkey"
        )

    def graph_scc(sf_dir: str):
        """Oracle-checked (recursive-CTE mutual-reach closure): EXACT
        strongly connected components over a DIRECTED mod-389
        part→supplier graph from high-quantity lineitems — the
        directed counterpart of connected components (KG use: cycle
        detection in is-a taxonomies, mutual-link crawl cores).
        Distributed path = Orzan-style max-id coloring (forward-max
        propagation + backward collect per peel round, E-bounded
        passes, V-bounded driver state); gate-scale edge sets take
        the driver-resident Kosaraju fast path with the same output
        contract (`kgflow.ops.graph.strongly_connected_components`)."""
        import pandas as pd

        from kgflow.ops.graph import strongly_connected_components
        from kgflow.sources.parquet import read_parquet_clean

        def pairs(df: pd.DataFrame) -> pd.DataFrame:
            d = df.loc[df["l_quantity"].to_numpy() >= 49.0]
            return pd.DataFrame(
                {
                    "src": d["l_partkey"].to_numpy(dtype=np.int64) % 389,
                    "dst": d["l_suppkey"].to_numpy(dtype=np.int64) % 389,
                }
            ).drop_duplicates()

        edges = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        ).map_batches(pairs, batch_format="pandas")
        return strongly_connected_components(edges)

    def graph_reach(sf_dir: str):
        """Oracle-checked (recursive CTE, GROUP BY MIN(hops)): bounded
        transitive closure — every (src, dst, min-hops ≤ 3) pair of the
        directed mod-389 part→supplier graph (the KG taxonomy-closure /
        bounded-cycle-detection shape; self pairs certify cycles).
        Fully dataset-resident pair state: per round ONE mid-keyed
        expansion exchange + ONE (src, dst)-keyed anti-join against the
        accumulated closure (`kgflow.ops.graph.reach_pairs`)."""
        import pandas as pd

        from kgflow.ops.graph import reach_pairs
        from kgflow.sources.parquet import read_parquet_clean

        def pairs(df: pd.DataFrame) -> pd.DataFrame:
            d = df.loc[df["l_quantity"].to_numpy() >= 49.0]
            return pd.DataFrame(
                {
                    "src": d["l_partkey"].to_numpy(dtype=np.int64) % 389,
                    "dst": d["l_suppkey"].to_numpy(dtype=np.int64) % 389,
                }
            ).drop_duplicates()

        edges = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        ).map_batches(pairs, batch_format="pandas")
        return reach_pairs(edges, max_hops=3)

    def graph_layers(sf_dir: str):
        """Oracle-checked (recursive CTE from the source set, GROUP BY
        MAX(len)): topological layering — longest-path depth per node
        of the mod-32 src<dst part→supplier DAG (the is-a hierarchy
        level assignment; raises on cycles). Max-relaxation rounds with
        broadcast frontier + node-bucketed max-reduce, V-bounded driver
        state (`kgflow.ops.graph.topo_layers`)."""
        import pandas as pd

        from kgflow.ops.graph import topo_layers
        from kgflow.sources.parquet import read_parquet_clean

        def pairs(df: pd.DataFrame) -> pd.DataFrame:
            d = df.loc[df["l_quantity"].to_numpy() >= 47.0]
            s = d["l_partkey"].to_numpy(dtype=np.int64) % 32
            t = d["l_suppkey"].to_numpy(dtype=np.int64) % 32
            m = s < t
            return pd.DataFrame({"src": s[m], "dst": t[m]}).drop_duplicates()

        edges = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        ).map_batches(pairs, batch_format="pandas")
        return topo_layers(edges)

    def graph_temporal_reach(sf_dir: str):
        """Oracle-checked (hop-bounded recursive CTE with the time
        constraint in the join): earliest-arrival TEMPORAL reachability
        ≤ 3 hops over the mod-61 part→supplier graph with shipdate-day
        edge times (the provenance-chain semantics: each hop departs no
        earlier than the previous arrival). Min-merge rounds with all
        pair state dataset-resident; ALL distinct parallel edge times
        survive to the expansion — a later parallel edge can be the
        only usable one (`kgflow.ops.graph.temporal_reach`)."""
        import pandas as pd

        from kgflow.ops.graph import temporal_reach
        from kgflow.sources.parquet import read_parquet_clean

        def tedges(df: pd.DataFrame) -> pd.DataFrame:
            d = df.loc[df["l_quantity"].to_numpy() >= 50.0]
            return pd.DataFrame(
                {
                    "src": d["l_partkey"].to_numpy(dtype=np.int64) % 61,
                    "dst": d["l_suppkey"].to_numpy(dtype=np.int64) % 61,
                    "t": d["l_shipdate"]
                    .to_numpy()
                    .astype("datetime64[D]")
                    .astype(np.int64),
                }
            ).drop_duplicates()

        edges = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        ).map_batches(tedges, batch_format="pandas")
        return temporal_reach(edges, max_hops=3)

    def graph_betweenness(sf_dir: str):
        """Rows-only (float δ sums; gated by driver == distributed +
        independent pair-enumeration parity in tests/test_wave17.py):
        Brandes betweenness centrality over the undirected mod-61
        part↔supplier graph — all V seeds advance level-synchronously
        as (seed, node, σ) rows, two exchanges per BFS level forward
        and two per level backward
        (`kgflow.ops.graph.betweenness_centrality`)."""
        import pandas as pd

        from kgflow.ops.graph import betweenness_centrality
        from kgflow.sources.parquet import read_parquet_clean

        def pairs(df: pd.DataFrame) -> pd.DataFrame:
            d = df.loc[df["l_quantity"].to_numpy() >= 49.0]
            return pd.DataFrame(
                {
                    "src": d["l_partkey"].to_numpy(dtype=np.int64) % 61,
                    "dst": d["l_suppkey"].to_numpy(dtype=np.int64) % 61,
                }
            ).drop_duplicates()

        edges = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        ).map_batches(pairs, batch_format="pandas")
        return betweenness_centrality(edges)

    def graph_closeness(sf_dir: str):
        """Oracle-checked (V-bounded recursive-CTE min-hop closure +
        GROUP BY; the one IEEE division is identical on both sides):
        closeness centrality over the undirected mod-61 part↔supplier
        graph — integer (n_reached, total_dist) per node plus
        closeness = n_reached / total_dist. All-seeds level-
        synchronous BFS, constant-size per-level partials
        (`kgflow.ops.graph.closeness_centrality`)."""
        import pandas as pd

        from kgflow.ops.graph import closeness_centrality
        from kgflow.sources.parquet import read_parquet_clean

        def pairs(df: pd.DataFrame) -> pd.DataFrame:
            d = df.loc[df["l_quantity"].to_numpy() >= 49.0]
            return pd.DataFrame(
                {
                    "src": d["l_partkey"].to_numpy(dtype=np.int64) % 61,
                    "dst": d["l_suppkey"].to_numpy(dtype=np.int64) % 61,
                }
            ).drop_duplicates()

        edges = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        ).map_batches(pairs, batch_format="pandas")
        return closeness_centrality(edges)

    def graph_eccentricity(sf_dir: str):
        """Oracle-checked (the graph_closeness closure CTE with MAX
        instead of SUM): per-node eccentricity over the undirected
        mod-61 part↔supplier graph — max(ecc) is the diameter, min the
        radius. All-seeds level-synchronous BFS; ecc(seed) = the last
        level at which the seed gained a node
        (`kgflow.ops.graph.eccentricity_stats`)."""
        import pandas as pd

        from kgflow.ops.graph import eccentricity_stats
        from kgflow.sources.parquet import read_parquet_clean

        def pairs(df: pd.DataFrame) -> pd.DataFrame:
            d = df.loc[df["l_quantity"].to_numpy() >= 49.0]
            return pd.DataFrame(
                {
                    "src": d["l_partkey"].to_numpy(dtype=np.int64) % 61,
                    "dst": d["l_suppkey"].to_numpy(dtype=np.int64) % 61,
                }
            ).drop_duplicates()

        edges = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        ).map_batches(pairs, batch_format="pandas")
        return eccentricity_stats(edges)

    def graph_walks(sf_dir: str):
        """Oracle-checked (recursive CTE joining on rank = LCG-hash %
        degree; constants shared verbatim): deterministic random-walk
        corpus (DeepWalk/node2vec training-data prep) — one 4-step walk
        per node of the mod-61 part→supplier graph, neighbor picked by
        the seeded (walk_id, step) mix over dst-sorted ranks, stopping
        at sinks. Ranked adjacency built once (ONE src-keyed exchange),
        ONE node-keyed tagged exchange per step, walk state V-bounded
        and dataset-resident (`kgflow.ops.graph.deterministic_walks`)."""
        import pandas as pd

        from kgflow.ops.graph import deterministic_walks
        from kgflow.sources.parquet import read_parquet_clean

        def pairs(df: pd.DataFrame) -> pd.DataFrame:
            d = df.loc[df["l_quantity"].to_numpy() >= 49.0]
            return pd.DataFrame(
                {
                    "src": d["l_partkey"].to_numpy(dtype=np.int64) % 61,
                    "dst": d["l_suppkey"].to_numpy(dtype=np.int64) % 61,
                }
            ).drop_duplicates()

        edges = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        ).map_batches(pairs, batch_format="pandas")
        return deterministic_walks(edges, steps=4)

    def events_redirects(sf_dir: str):
        """Oracle-checked (recursive CTE following single steps): the
        redirect/alias-chain resolver — a functional mapping (even
        event ids halve: id → id // 2) resolved to its terminal with
        exact chain lengths via pointer DOUBLING (⌈log₂ chain⌉ rounds
        of ONE tagged self-join exchange each, all state
        dataset-resident; `kgflow.ops.graph.resolve_pointer_chains`)."""
        import pandas as pd

        from kgflow.ops.graph import resolve_pointer_chains
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
        )

        def mk(df: pd.DataFrame) -> pd.DataFrame:
            eid = df["event_id"].to_numpy(dtype=np.int64)
            eid = eid[(eid % 2 == 0) & (eid > 0)]
            return pd.DataFrame({"src": eid, "dst": eid // 2}).drop_duplicates()

        return resolve_pointer_chains(ev.map_batches(mk, batch_format="pandas"))

    def graph_msf(sf_dir: str):
        """Rows-only (deterministic; pinned vs a driver Kruskal on
        random graphs in tests/test_wave17.py): Borůvka minimum
        spanning forest of the weighted mod-389 part↔supplier graph —
        log-round per-component min-edge reduces, V-bounded driver
        union-find (`kgflow.ops.graph.minimum_spanning_forest`).
        Ties break on the total (w, src, dst) order, so the output is
        run-to-run identical (rows-only because no recursive CTE can
        express MSF; the pytest gate is the exact Kruskal parity)."""
        import pandas as pd

        from kgflow.ops.graph import minimum_spanning_forest
        from kgflow.sources.parquet import read_parquet_clean

        def wedges(df: pd.DataFrame) -> pd.DataFrame:
            d = df.loc[df["l_quantity"].to_numpy() >= 49.0]
            return pd.DataFrame(
                {
                    "src": d["l_partkey"].to_numpy(dtype=np.int64) % 389,
                    "dst": d["l_suppkey"].to_numpy(dtype=np.int64) % 389,
                    "w": 1
                    + (
                        d["l_partkey"].to_numpy(dtype=np.int64)
                        * 31
                        + d["l_suppkey"].to_numpy(dtype=np.int64)
                    )
                    % 97,
                }
            )

        edges = read_parquet_clean(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        ).map_batches(wedges, batch_format="pandas")
        return minimum_spanning_forest(edges)

    def events_next_entropy(sf_dir: str):
        """Oracle-checked: per-event-type successor entropy (nats) over
        each user's (ts, id)-ordered stream — transition_counts (one
        user-keyed exchange) + a category-bounded entropy reduce."""
        from kgflow.ops.window import transition_entropy
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "event_type", "ts", "event_id"],
        )
        return transition_entropy(ev)

    def events_anomaly3s(sf_dir: str):
        """Oracle-checked: seasonal 3σ anomalies — events whose
        fixed-point value breaks (n·x−Σx)² > 9·(n·Σx²−(Σx)²) within
        their (event_type, hour-of-day) cell; the decision itself is
        integer-exact (float fast path + exact big-int recheck inside
        a guard band), so the flag set is hash-reproducible."""
        from kgflow.ops.profile import seasonal_sigma_outliers
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "event_type", "ts", "value"],
        )
        return seasonal_sigma_outliers(ev)

    def doc_char_entropy(sf_dir: str):
        """Oracle-checked: per-doc byte-distribution Shannon entropy
        (nats) — the gibberish/mojibake quality signal. Zero-copy
        Arrow: offsets+data buffers viewed as numpy, one bincount per
        batch, no exchange."""
        from kgflow.ops.text import char_entropy

        return char_entropy(_docs(sf_dir))

    def doc_hot_ngrams(sf_dir: str):
        """Oracle-checked: Lee-et-al-style duplicate n-gram masking —
        per doc, the count of token positions covered by any corpus-hot
        trigram (document frequency ≥ 4). Distinct-gram pre-shrink →
        one gram-keyed DF sum → broadcast hot-set attach → one
        (doc_id, pos) int exchange."""
        from kgflow.ops.dedup import hot_ngram_mask

        return hot_ngram_mask(_docs(sf_dir), n=3, min_df=4)

    def doc_blocklist_hits(sf_dir: str):
        """Oracle-checked: banned-term / lexicon gate — (doc_id,
        pattern, n_hits) for every doc × fixed-string blocklist entry
        with ≥ 1 non-overlapping occurrence. Zero-copy Arrow: one
        `count_substring` C pass per pattern, no pandas, no exchange."""
        from kgflow.ops.text import multi_match

        return multi_match(_docs(sf_dir), list(_BLOCKLIST))

    def events_attribution(sf_dir: str):
        """Oracle-checked: linear multi-touch attribution — every
        'purchase' splits an integer credit of 1e6 EQUALLY (floor
        division, so the sum is hash-exact vs SQL) over the same
        user's touch events strictly inside the trailing 1-day window;
        ONE user-bucketed exchange, window counts via a lexsort +
        per-type cumsum probe pass — never a per-conversion scan
        (`kgflow.ops.window.linear_attribution`)."""
        from kgflow.ops.window import linear_attribution
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_type"],
        )
        return linear_attribution(
            ev, convert_type="purchase", lookback_s=86400
        )

    def events_scd(sf_dir: str):
        """Oracle-checked: type-2 slowly-changing-dimension history —
        each user's event_type stream collapsed into change runs, one
        validity interval per run (version, valid_from, valid_to with
        the conventional 2999-12-31 open-interval sentinel — no NULL
        timestamps, so the hash compare is exact). ONE user-bucketed
        exchange, vectorized boundary detection
        (`kgflow.ops.window.scd2_intervals`)."""
        from kgflow.ops.window import scd2_intervals
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "user_id", "ts", "event_type"],
        )
        return scd2_intervals(ev)

    def kg_anchor_aliases(sf_dir: str):
        """Rows-only (semantics pinned on planted anchors in
        tests/test_wave18.py): anchor-text alias mining — per
        canonicalized link target, the top-3 normalized anchor texts
        by count (the classic entity-linking alias-dictionary signal).
        Anchors are planted on the fixture html (page i links to page
        2i with a small alias wheel) since the synthetic crawl has
        none; html never rides a shuffle — count partials reduce
        before the first exchange (`kgflow.ops.web.anchor_aliases`)."""
        import pandas as _pd

        from kgflow.ops.web import anchor_aliases
        from kgflow.pipelines.kg import KgConfig, read_pages

        def plant(df: _pd.DataFrame) -> _pd.DataFrame:
            n = (
                df["url"]
                .astype(str)
                .str.extract(r"(\d+)$")[0]
                .fillna("0")
                .astype("int64")
            )
            tgt = (2 * n) % 1000
            alias = _pd.Series(
                np.where(
                    n % 3 == 0,
                    "Site " + tgt.astype(str),
                    np.where(
                        n % 3 == 1,
                        "site " + tgt.astype(str) + "  Home",
                        "the site " + tgt.astype(str) + " portal",
                    ),
                ),
                index=df.index,
            )
            a = (
                '<a href="https://site'
                + tgt.astype(str)
                + ".example/page/"
                + tgt.astype(str)
                + '">'
                + alias
                + "</a>"
            )
            html = df["html"].apply(
                lambda b: b.decode("utf-8", "replace")
                if isinstance(b, (bytes, bytearray))
                else str(b)
            )
            return _pd.DataFrame(
                {"url": df["url"], "html": (html + a).str.encode("utf-8")}
            )

        cfg = KgConfig(read_columns=["url", "html"])
        pages = read_pages(_pages_dir(sf_dir), cfg).map_batches(
            plant, batch_format="pandas"
        )
        return anchor_aliases(pages, top_k=3)

    def kg_gazetteer_mentions(sf_dir: str):
        """Rows-only (brute-force exactness pinned in
        tests/test_wave19.py): token-aligned gazetteer mention
        candidates over the extracted sentence stream — the
        closed-lexicon recall channel beside the model NER (in
        production the lexicon is the KG's alias dictionary). Alias
        surfaces are normalized to the token alphabet (non-word runs →
        single space) so hyphenated forms match the \\w+ token stream;
        sentences ride the generic n-gram equi-join kernel
        (`kgflow.ops.text.gazetteer_spot`) under a packed int64 key
        (page_no << 20 | sent_id) that decodes back to (url, sent_id)
        after the join, and the pool-bounded phrase→entity map is
        broadcast once via ray.put."""
        import pandas as _pd
        import pyarrow.parquet as _pq
        import ray as _ray

        from kgflow.ops.text import gazetteer_spot
        from kgflow.pipelines.kg import read_pages, sentences_ds

        pages = _pages_dir(sf_dir)
        gold = _pq.read_table(
            os.path.join(pages, "gold_clusters.parquet")
        ).to_pandas()
        norm = (
            gold["mention"]
            .astype(str)
            .str.lower()
            .str.replace(r"[^0-9a-z]+", " ", regex=True)
            .str.strip()
        )
        lexdf = _pd.DataFrame(
            {"phrase": norm, "entity": gold["entity"]}
        ).drop_duplicates("phrase")
        ent_ref = _ray.put(dict(zip(lexdf["phrase"], lexdf["entity"])))
        lex = rd.from_pandas(lexdf[["phrase"]].reset_index(drop=True))

        def pack(df: _pd.DataFrame) -> _pd.DataFrame:
            if "url" not in df.columns or not len(df):
                return _pd.DataFrame(
                    {
                        "doc_id": _pd.Series([], dtype="int64"),
                        "text": _pd.Series([], dtype=object),
                    }
                )
            page = (
                df["url"].astype(str).str.extract(r"/page/(\d+)$")[0]
            ).astype("int64")
            return _pd.DataFrame(
                {
                    "doc_id": (
                        page * (1 << 20) + df["sent_id"]
                    ).astype("int64"),
                    "text": df["text"],
                }
            )

        sents = sentences_ds(read_pages(pages)).map_batches(
            pack, batch_format="pandas"
        )
        spots = gazetteer_spot(sents, lex)

        class Unpack:
            def __init__(self):
                self.ent = _ray.get(ent_ref)

            def __call__(self, df: _pd.DataFrame) -> _pd.DataFrame:
                if "doc_id" not in df.columns or not len(df):
                    return _pd.DataFrame(
                        {
                            "url": _pd.Series([], dtype=object),
                            "sent_id": _pd.Series([], dtype="int64"),
                            "pos": _pd.Series([], dtype="int64"),
                            "mention": _pd.Series([], dtype=object),
                            "entity": _pd.Series([], dtype=object),
                        }
                    )
                page = (df["doc_id"] // (1 << 20)).astype("int64")
                return _pd.DataFrame(
                    {
                        "url": "https://site"
                        + (page % 1000).astype(str)
                        + ".example/page/"
                        + page.astype(str),
                        "sent_id": (
                            df["doc_id"] & ((1 << 20) - 1)
                        ).astype("int64"),
                        "pos": df["pos"].astype("int64"),
                        "mention": df["phrase"],
                        "entity": df["phrase"].map(self.ent),
                    }
                )

        return spots.map_batches(
            Unpack, batch_format="pandas", concurrency=(1, 2)
        )

    def part_skyline(sf_dir: str):
        """Oracle-checked: 2-D Pareto frontier over part — the rows
        where no other part is both cheaper (p_retailprice) and larger
        (p_size); skyline is distributive, so each block's local
        frontier (vectorized sort+cummax) feeds one tiny merge of the
        same kernel, with a loud guard on frontier width
        (`kgflow.ops.relational.skyline`)."""
        from kgflow.ops.relational import skyline
        from kgflow.sources.parquet import read_parquet_clean

        part = read_parquet_clean(
            os.path.join(sf_dir, "part.parquet"),
            columns=["p_partkey", "p_retailprice", "p_size"],
        )
        return skyline(part, "p_retailprice", "p_size")

    def customer_cdc_state(sf_dir: str):
        """Oracle-checked: MERGE / CDC apply — orders replayed as a
        change stream over the customer snapshot (seq = o_orderkey,
        delete when o_orderkey % 97 == 0, else upsert to the
        fixed-point order total), latest-sequence-wins; base rows join
        the fold as seq −1 so one keyed exchange resolves everything
        (`kgflow.ops.relational.cdc_apply`). The oracle's LEFT JOIN
        shape relies on the fixture FK (every o_custkey exists in
        customer); the operator itself also handles pure inserts."""
        import pandas as _pd

        from kgflow.ops.relational import cdc_apply
        from kgflow.sources.parquet import read_parquet_clean

        def basep(df: _pd.DataFrame) -> _pd.DataFrame:
            return _pd.DataFrame(
                {
                    "c_custkey": df["c_custkey"].astype("int64"),
                    "bal_fp": np.floor(
                        df["c_acctbal"].to_numpy(np.float64) * 100
                    ).astype(np.int64),
                }
            )

        def chg(df: _pd.DataFrame) -> _pd.DataFrame:
            ok = df["o_orderkey"].to_numpy(np.int64)
            return _pd.DataFrame(
                {
                    "c_custkey": df["o_custkey"].astype("int64"),
                    "seq": ok,
                    "op": np.where(ok % 97 == 0, "D", "U"),
                    "bal_fp": np.floor(
                        df["o_totalprice"].to_numpy(np.float64) * 100
                    ).astype(np.int64),
                }
            )

        base = read_parquet_clean(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_acctbal"],
        ).map_batches(basep, batch_format="pandas")
        changes = read_parquet_clean(
            os.path.join(sf_dir, "orders.parquet"),
            columns=["o_orderkey", "o_custkey", "o_totalprice"],
        ).map_batches(chg, batch_format="pandas")
        return cdc_apply(
            base,
            changes,
            key="c_custkey",
            seq_col="seq",
            op_col="op",
            val_col="bal_fp",
        )

    def orders_range_pruned(sf_dir: str):
        """Oracle-checked: zone-map-pruned range read — orders staged
        into an o_orderkey-range-partitioned layout (the compacted-
        sorted-table shape), per-partition (min, max) sidecars built,
        and a 10%-of-keyspace range probe answered by reading ONLY the
        overlapping partitions with the exact filter re-applied inside
        the read (`kgflow.materialize.zonemap`). The oracle is the
        plain BETWEEN over the unpartitioned table — pruning is an
        optimization, never a semantic. Pruning efficacy (reads ~1/8
        of partitions) is pinned in tests/test_wave19.py. Key bounds
        come from an 8-byte-column driver read here; at scale use
        parquet footer stats."""
        import shutil
        import tempfile

        import pyarrow.compute as pc
        import pyarrow.parquet as _pq

        from kgflow.materialize.zonemap import (
            build_zonemap_index,
            read_range_pruned,
        )
        from kgflow.sources.parquet import read_parquet_clean

        src = os.path.join(sf_dir, "orders.parquet")
        keys = _pq.read_table(src, columns=["o_orderkey"]).column(
            "o_orderkey"
        )
        kmin, kmax = int(pc.min(keys).as_py()), int(pc.max(keys).as_py())
        span = kmax - kmin
        lo, hi = kmin + span // 10, kmin + (2 * span) // 10

        import hashlib

        # stable digest, not hash(): str hashing is salted per process,
        # which would leak one staging dir per run into /tmp
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        root = os.path.join(
            tempfile.gettempdir(), f"kgflow_zonemap_orders_{tag}"
        )
        shutil.rmtree(root, ignore_errors=True)
        orders = read_parquet_clean(
            src, columns=["o_orderkey", "o_custkey"]
        )

        def zpart(df):
            k = df["o_orderkey"].to_numpy(np.int64)
            df = df.copy()
            df["zpart"] = (k - kmin) * 8 // (span + 1)
            return df

        orders.map_batches(zpart, batch_format="pandas").write_parquet(
            root, partition_cols=["zpart"]
        )
        build_zonemap_index(root, "o_orderkey")
        out = read_range_pruned(
            root, "o_orderkey", lo, hi, columns=["o_orderkey", "o_custkey"]
        )
        return out.select_columns(["o_orderkey", "o_custkey"])

    def doc_rake(sf_dir: str):
        """Oracle-checked: RAKE keyphrase extraction (Rose et al.
        2010) — top-3 candidate phrases per document scored by the
        floor-scaled word deg/freq sum (pure int64, hash-exact; the
        stopword list is shared VERBATIM with the SQL). Document-local,
        embarrassingly parallel: NO exchange
        (`kgflow.ops.text.rake_keyphrases`)."""
        from kgflow.ops.text import rake_keyphrases

        return rake_keyphrases(_docs(sf_dir), top_k=3)

    def ann_rrf(sf_dir: str):
        """Oracle-checked: reciprocal-rank fusion (Cormack et al.
        2009) of a cosine and an L2 retriever over the same corpus —
        ONE dual-metric corpus pass (actor pool holding the broadcast
        query matrix; the L2 leg scores in float64 expanded form so
        rank order is stable vs the SQL), per-batch partial top-k per
        leg, one tiny query-keyed exchange ranks legs and fuses with
        integer floor terms (`kgflow.ops.ann.rrf_topk`)."""
        from kgflow.ops.ann import rrf_topk
        from kgflow.sources.parquet import read_parquet_clean

        qids, Qm = _queries_for(sf_dir)
        emb = read_parquet_clean(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        return rrf_topk(emb, qids, Qm, k_each=20, k_rrf=60, top_k=5)

    def doc_gazetteer(sf_dir: str):
        """Oracle-checked: gazetteer entity spotting — every
        token-aligned occurrence of a dictionary phrase, with 1-based
        token position. The lexicon is a JOIN side (auto broadcast
        here; hash-partitioned at 10⁸ names — the distributed
        Aho-Corasick substitute); docs emit n-gram rows only for the
        word lengths the lexicon contains
        (`kgflow.ops.text.gazetteer_spot`)."""
        import pandas as _pd
        import ray.data as _rd

        from kgflow.ops.text import gazetteer_spot

        lex = _rd.from_pandas(
            _pd.DataFrame({"phrase": list(_GAZETTEER)})
        )
        return gazetteer_spot(_docs(sf_dir), lex)

    def embed_rp(sf_dir: str):
        """Oracle-checked: sparse sign random projection (Achlioptas
        2003) onto 16 ±1 directions with FNV-1a-derived signs —
        quantize-first int64 matmul, so the projected values are exact
        integer sums the SQL replays bit-for-bit; embarrassingly
        parallel, no exchange (`kgflow.ops.ann.random_projection`)."""
        from kgflow.ops.ann import random_projection
        from kgflow.sources.parquet import read_parquet_clean

        emb = read_parquet_clean(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        return random_projection(emb, k=16)

    def kg_fact_history(sf_dir: str):
        """Rows-only (semantics pinned in tests/test_wave18.py via the
        shared `scd2_intervals` kernel): temporal fact versioning —
        each canonical (subj, rel) fact's OBJECT history across crawl
        snapshots as SCD-2 validity intervals ordered by the
        supporting page's warc_ts (the knowledge-evolution table:
        which fact changed, when, to what). Page metadata joins
        url-keyed (auto broadcast, html never rides), then the ONE
        fact-keyed exchange runs the same run-collapse kernel as
        events_scd (`kgflow.ops.window.scd2_intervals`)."""
        import pandas as _pd

        from kgflow.linking.link import canonical_triples
        from kgflow.ops.joins import hash_join
        from kgflow.ops.window import scd2_intervals
        from kgflow.pipelines.kg import KgConfig, read_pages

        canon, _ = canonical_triples(_triples_mat(sf_dir))
        occ = canon.select_columns(
            ["subj_canonical", "rel", "obj_canonical", "url"]
        )
        cfg = KgConfig(read_columns=["url", "warc_ts"])
        meta = read_pages(_pages_dir(sf_dir), cfg)
        joined = hash_join(occ, meta, on="url")

        def keyed(df: _pd.DataFrame) -> _pd.DataFrame:
            return _pd.DataFrame(
                {
                    "fact": df["subj_canonical"].astype(str)
                    + "\x1f"
                    + df["rel"].astype(str),
                    "obj_canonical": df["obj_canonical"],
                    "warc_ts": df["warc_ts"],
                    # total order inside equal timestamps: url + obj
                    "tie": df["url"].astype(str)
                    + "\x1f"
                    + df["obj_canonical"].astype(str),
                }
            )

        facts = joined.map_batches(keyed, batch_format="pandas")
        return scd2_intervals(
            facts,
            key="fact",
            ts_col="warc_ts",
            id_col="tie",
            attr_col="obj_canonical",
        )

    def doc_cluster_agreement(sf_dir: str):
        """Oracle-checked: extrinsic clustering agreement between two
        document labelings (lang vs doc_id%5 strata) — B-cubed
        precision/recall (Bagga & Baldwin 1998, per-item floor-scaled
        int sums) and exact pairwise TP/FP/FN. Everything reduces
        through the (pred, gold) contingency cells: ONE cell-keyed
        exchange, marginals over the cell table
        (`kgflow.ops.profile.clustering_metrics`)."""
        import pandas as _pd

        from kgflow.ops.profile import clustering_metrics

        def lab(df: _pd.DataFrame) -> _pd.DataFrame:
            return _pd.DataFrame(
                {
                    "pred": df["lang"].astype(str),
                    "gold": (df["doc_id"].to_numpy(dtype=np.int64) % 5)
                    .astype(str),
                }
            )

        return clustering_metrics(
            _docs(sf_dir).map_batches(lab, batch_format="pandas")
        )

    def kg_linking_quality(sf_dir: str):
        """Rows-only (kernel oracled via doc_cluster_agreement;
        semantics pinned in tests/test_wave18.py): B-cubed + pairwise
        quality of the entity-linking clusters against the fixture's
        gold alias table — the north-star linked-entity-cluster gate
        as a first-class pipeline metric. The gold table is
        entity-pool bounded (broadcast via ray.put); mentions join on
        the same normalize_mention the linker uses."""
        import pandas as _pd
        import pyarrow.parquet as _pq
        import ray as _ray

        from kgflow.linking.link import entity_map, normalize_mention
        from kgflow.ops.profile import clustering_metrics

        gold = _pq.read_table(
            os.path.join(_pages_dir(sf_dir), "gold_clusters.parquet")
        ).to_pandas()
        gold_by_norm = {
            normalize_mention(m): e
            for m, e in zip(gold["mention"], gold["entity"])
        }
        gref = _ray.put(gold_by_norm)

        emap = entity_map(_triples_mat(sf_dir))

        class Label:
            def __init__(self):
                self.gold = _ray.get(gref)

            def __call__(self, df: _pd.DataFrame) -> _pd.DataFrame:
                g = df["norm"].map(self.gold)
                keep = g.notna()
                return _pd.DataFrame(
                    {
                        "pred": df.loc[keep, "entity_id"].astype(str),
                        "gold": g[keep].astype(str),
                    }
                )

        labeled = emap.map_batches(
            Label, batch_format="pandas", concurrency=(1, 2)
        )
        return clustering_metrics(labeled)

    def events_holt(sf_dir: str):
        """Oracle-checked: Holt double-exponential smoothing
        (α = β = 1/2) over each type's dense zero-filled daily count
        series — level + trend state in scaled int64 with truncating
        halving, so a recursive-CTE SQL oracle replays the recurrence
        bit-exactly (the graph-closure oracle pattern applied to a
        time-series recurrence). One day-grain loop vectorized across
        keys; never a per-event loop
        (`kgflow.ops.window.holt_smooth`)."""
        from kgflow.ops.window import holt_smooth
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "ts"],
        )
        return holt_smooth(ev)

    def kg_type_violations(sf_dir: str):
        """Rows-only (exactness pinned in tests/test_wave19.py): KG
        type-constraint audit — per relation, counts of extracted
        triples by (resolved subject type, resolved object type,
        matches-signature), against the closed-world relation
        signatures (born_in: PER→LOC, …). Entity types resolve through
        the SAME mention normalization the linker uses, over the
        pool-bounded gold alias→etype table broadcast via ray.put;
        unresolvable mentions type as '?'. ONE (rel, st, ot)-keyed
        reduce over per-batch count partials — the precision-review
        queue for a production extractor (type clashes are the
        cheapest high-yield error signal a KG build has;
        `kgflow.ops.web.type_violation_counts`)."""
        import pyarrow.parquet as _pq

        from kgflow.fixtures.corpus import RELATIONS
        from kgflow.linking.link import normalize_mention
        from kgflow.ops.web import type_violation_counts

        gold = _pq.read_table(
            os.path.join(_pages_dir(sf_dir), "gold_clusters.parquet")
        ).to_pandas()
        et = {
            normalize_mention(m): t
            for m, t in zip(gold["mention"], gold["etype"])
        }
        sig = {name: (st, ot) for name, st, ot, _, _ in RELATIONS}
        tri = _triples_mat(sf_dir).select_columns(["rel", "subj", "obj"])
        return type_violation_counts(tri, et, sig)

    def customer_kanon(sf_dir: str):
        """Oracle-checked: k-anonymity / l-diversity audit — per
        quasi-identifier group (c_mktsegment, c_nationkey) the size n,
        l-diversity of the fixed acctbal band floor(bal/1000), and
        k_ok = n ≥ 5; bands-bounded partials, ONE keyed reduce
        (`kgflow.ops.relational.customer_kanon`)."""
        from kgflow.ops.relational import customer_kanon as _f

        return _f(sf_dir)

    def lineitem_seq_audit(sf_dir: str):
        """Oracle-checked: intra-order line-number density audit —
        per order (n_lines, n_distinct, min_ln, max_ln, dense) where
        dense requires n == n_distinct AND min == 1 AND max == n
        (count == max alone is fooled by a duplicate masking a gap);
        per-block (order, line, cnt) partials then ONE keyed reduce
        (`kgflow.ops.relational.lineitem_seq_audit`)."""
        from kgflow.ops.relational import lineitem_seq_audit as _f

        return _f(sf_dir)

    def events_heatmap(sf_dir: str):
        """Oracle-checked: hour-of-day × day-of-week activity heatmap
        per type — ONE count exchange over pre-aggregated partials;
        engine-neutral integer epoch-µs arithmetic (dow 0 = Monday via
        the 1970-01-01-was-Thursday offset; the oracle uses integer
        epoch_us, not DOUBLE epoch(), so second-boundary events cannot
        round across an hour; `kgflow.ops.relational.events_heatmap`)."""
        from kgflow.ops.relational import events_heatmap as _f

        return _f(sf_dir)

    def events_window_topk(sf_dir: str):
        """Oracle-checked: trailing-7-day top-3 users per (type, day)
        — windowed aggregate + per-group top-k via the SHIFT-JOIN
        identity (each (type,user,day) count re-keys to the 7 target
        days it feeds; 32-byte partials, never event rows), present-day
        semi-filter, vectorized in-bucket rank
        (`kgflow.ops.relational.events_window_topk`)."""
        from kgflow.ops.relational import events_window_topk as _f

        return _f(sf_dir)

    def events_wau(sf_dir: str):
        """Oracle-checked: trailing-7-day distinct users (WAU) per
        (type, active day) — the windowed-DISTINCT shape: presence
        rows (ONE dedup exchange) shift-join to target days, the
        reduce re-dedups (user, day) before counting so a user active
        twice in the window counts once
        (`kgflow.ops.relational.events_wau`)."""
        from kgflow.ops.relational import events_wau as _f

        return _f(sf_dir)

    def events_churn(sf_dir: str):
        """Oracle-checked: churned users per (type, active day) —
        active in the prior 7-day window, absent from the current one;
        the windowed ANTI-semi shape via ONE window-tagged shift-join
        and a vectorized indicator-pivot set difference in the reduce
        (`kgflow.ops.relational.events_churn`)."""
        from kgflow.ops.relational import events_churn as _f

        return _f(sf_dir)

    def orders_benford_gof(sf_dir: str):
        """Oracle-checked: Benford goodness-of-fit — global first-digit
        counts of fixed-point order totals WITH the Benford expectation
        floor(N*log10(1+1/d)*1e6) as a fixed-point column (the log10 is
        over constants, identical on every engine), so the deviation
        the audit exists to measure rides in the hash-checked result
        (the per-priority digit counts live in `orders_benford`;
        `kgflow.ops.relational.orders_benford_gof`)."""
        from kgflow.ops.relational import orders_benford_gof as _f

        return _f(sf_dir)

    def events_stickiness(sf_dir: str):
        """Oracle-checked: DAU/WAU stickiness inputs per (type,
        active day) — exact int64 numerator/denominator pair (the
        float ratio stays driver-side so the row hash-checks); one
        presence collapse feeds both the direct DAU count and the
        shift-join WAU, stitched by one equi-join
        (`kgflow.ops.relational.events_stickiness`)."""
        from kgflow.ops.relational import events_stickiness as _f

        return _f(sf_dir)

    def events_trend_ols(sf_dir: str):
        """Oracle-checked: per-type OLS trend of the dense zero-filled
        daily count series as exact integer moments — slope = num/den
        with num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)², x the day index
        over the type's span, absent days counting 0 (the holt_smooth
        grid); ONE count exchange + one type-bucketed days-bounded
        reduce (`kgflow.ops.relational.events_trend_ols`)."""
        from kgflow.ops.relational import events_trend_ols as _f

        return _f(sf_dir)

    def events_markov_acc(sf_dir: str):
        """Oracle-checked: first-order Markov next-event BACKTEST —
        adjacent pairs split by successor-id parity, even pairs train
        transition counts, odd pairs score the per-from argmax
        prediction (tie → target asc); exact integer accuracy per
        from-type. One user-keyed adjacency exchange, then
        category²-bounded count rows only
        (`kgflow.ops.window.markov_backtest`)."""
        from kgflow.ops.window import markov_backtest
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        return markov_backtest(ev)

    def events_late(sf_dir: str):
        """Oracle-checked: streaming late-data audit — replay each
        user's stream in arrival order and count events falling behind
        the running max(prior event time) − 1h watermark, the
        accounting that sizes a streaming window's allowed lateness.
        The fixture ingests in time order, so the arrival proxy is
        event_id XOR 3 (deterministic local reordering both engines
        compute identically) to exercise real lateness. ONE
        user-keyed exchange, per-key vectorized cumulative max
        (`kgflow.ops.window.late_arrivals`)."""
        import pandas as _pd

        from kgflow.ops.window import late_arrivals
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["user_id", "ts", "event_id"],
        ).map_batches(
            lambda df: df.assign(
                arrival=np.bitwise_xor(
                    df["event_id"].to_numpy(dtype=np.int64), 3
                )
            ),
            batch_format="pandas",
        )
        return late_arrivals(ev, arrival_col="arrival", watermark_s=3600)

    def orders_expectations(sf_dir: str):
        """Oracle-checked: dbt-style expectation suite over orders in
        one call — unique key, not-null, accepted-values, non-negative
        amount, and an FK-to-customer referential check; one
        (rule, n_violations) row per check. Rule masks are vectorized
        per batch; uniqueness ships (key, count) partials; the FK is
        the distinct-key anti join
        (`kgflow.ops.checks.expectation_suite`)."""
        import pandas as _pd

        from kgflow.ops.checks import expectation_suite
        from kgflow.sources.parquet import read_parquet_clean

        orders = read_parquet_clean(
            os.path.join(sf_dir, "orders.parquet"),
            columns=[
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
            ],
        )
        customer = read_parquet_clean(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey"],
        )
        return expectation_suite(
            orders,
            unique=[["o_orderkey"]],
            rules={
                "not_null:o_custkey": lambda df: df["o_custkey"]
                .isna()
                .to_numpy(),
                "accepted:o_orderstatus": lambda df: ~df["o_orderstatus"]
                .isin(("O", "F", "P"))
                .to_numpy(),
                "nonneg:o_totalprice": lambda df: (
                    df["o_totalprice"].to_numpy(dtype=np.float64) < 0
                ),
            },
            fks=[
                (
                    "fk:o_custkey->customer",
                    "o_custkey",
                    customer,
                    "c_custkey",
                )
            ],
        )

    def events_snaive(sf_dir: str):
        """Oracle-checked: seasonal-naive forecast backtest — per
        event type, each day's count forecast by the count 7 days
        earlier, scored as exact integer absolute error over days
        whose seasonal ancestor exists. Day-grain rows only ride the
        exchanges, never events
        (`kgflow.ops.window.snaive_backtest`)."""
        from kgflow.ops.window import snaive_backtest
        from kgflow.sources.parquet import read_parquet_clean

        ev = read_parquet_clean(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_type", "ts"],
        )
        return snaive_backtest(ev, season_days=7)

    return {
        "kg_sentences": kg_sentences,
        "kg_domain_stats": kg_domain_stats,
        "kg_url_dedup": kg_url_dedup,
        "kg_domain_yield": kg_domain_yield,
        "kg_triples": kg_triples,
        "kg_relations": kg_relations,
        "kg_events": kg_events,
        "kg_entity_map": kg_entity_map,
        "kg_edges": kg_edges,
        "kg_edge_evidence": kg_edge_evidence,
        "kg_functional_violations": kg_functional_violations,
        "kg_inverse_relations": kg_inverse_relations,
        "kg_relation_cardinality": kg_relation_cardinality,
        "kg_alias_ambiguity": kg_alias_ambiguity,
        "kg_taxonomy_cycles": kg_taxonomy_cycles,
        "kg_entity_cards": kg_entity_cards,
        "kg_snapshot_delta": kg_snapshot_delta,
        "kg_link_graph": kg_link_graph,
        "kg_nodes": kg_nodes,
        "kg_pagerank": kg_pagerank,
        "kg_ppr": kg_ppr,
        "kg_triple_prf": kg_triple_prf,
        "kg_triples_bpe": kg_triples_bpe,
        "kg_triple_prf_bpe": kg_triple_prf_bpe,
        "feat_seq": feat_seq,
        "feat_ner": feat_ner,
        "feat_interactive": feat_interactive,
        "feat_diagnostics": feat_diagnostics,
        "train_seq": train_seq,
        "train_ner": train_ner,
        "doc_exact_dedup": doc_exact_dedup,
        "doc_lang_counts": doc_lang_counts,
        "doc_token_counts": doc_token_counts,
        "doc_quality": doc_quality,
        "doc_fingerprint": doc_fingerprint,
        "doc_vocab_topk": doc_vocab_topk,
        "doc_split": doc_split,
        "doc_sample": doc_sample,
        "doc_collocations": doc_collocations,
        "doc_bm25": doc_bm25,
        "events_user_paths": events_user_paths,
        "events_outliers": events_outliers,
        "events_type_gini": events_type_gini,
        "events_gap_quantiles": events_gap_quantiles,
        "events_value_sketch": events_value_sketch,
        "events_mode_props": events_mode_props,
        "events_funnel": events_funnel,
        "events_cohorts": events_cohorts,
        "doc_inverted_index": doc_inverted_index,
        "events_triangles": events_triangles,
        "events_clustering": events_clustering,
        "events_components": events_components,
        "doc_diversity": doc_diversity,
        "doc_readability": doc_readability,
        "doc_packed": doc_packed,
        "doc_length_deciles": doc_length_deciles,
        "events_session_quantiles": events_session_quantiles,
        "events_path_trigrams": events_path_trigrams,
        "doc_pii_redact": doc_pii_redact,
        "doc_repetition": doc_repetition,
        "doc_contamination": doc_contamination,
        "doc_incremental_new": doc_incremental_new,
        "doc_top_terms": doc_top_terms,
        "doc_langid": doc_langid,
        "doc_rolling_fp": doc_rolling_fp,
        "doc_dupspan": doc_dupspan,
        "doc_novelty": doc_novelty,
        "doc_gopher_rules": doc_gopher_rules,
        "doc_curation": doc_curation,
        "doc_mix_weights": doc_mix_weights,
        "doc_sample_plan": doc_sample_plan,
        "doc_zipf_alpha": doc_zipf_alpha,
        "doc_dsir_score": doc_dsir_score,
        "doc_boilerplate_strip": doc_boilerplate_strip,
        "doc_minhash_pairs": doc_minhash_pairs,
        "doc_cross_dups": doc_cross_dups,
        "doc_jaccard_pairs": doc_jaccard_pairs,
        "doc_containment": doc_containment,
        "doc_typo_pairs": doc_typo_pairs,
        "events_winsorized": events_winsorized,
        "doc_simhash_pairs": doc_simhash_pairs,
        "doc_dup_clusters": doc_dup_clusters,
        "ann_topk": ann_topk,
        "ann_lsh_topk": ann_lsh_topk,
        "embed_gram": embed_gram,
        "embed_centroids": embed_centroids,
        "ann_ivf_topk": ann_ivf_topk,
        "ann_ivf_stored": ann_ivf_stored,
        "ann_ivf_exact": ann_ivf_exact,
        "ann_lsh_exact": ann_lsh_exact,
        "ann_int8_exact": ann_int8_exact,
        "ann_int8_recall": ann_int8_recall,
        "embed_pca": embed_pca,
        "embed_power_iter": embed_power_iter,
        "embed_neardup": embed_neardup,
        "embed_semdedup": embed_semdedup,
        "q1_pricing": q1_pricing,
        "top_customers": top_customers,
        "events_hourly": events_hourly,
        "events_sessions": events_sessions,
        "events_asof": events_asof,
        "events_window": events_window,
        "events_in_sessions": events_in_sessions,
        "events_quantiles": events_quantiles,
        "events_profile": events_profile,
        "events_histogram": events_histogram,
        "events_sliding": events_sliding,
        "events_daily_users": events_daily_users,
        "events_pivot": events_pivot,
        "events_quantiles_by_type": events_quantiles_by_type,
        "events_users_hll": events_users_hll,
        "doc_heavy_tokens": doc_heavy_tokens,
        "customers_no_big_orders": customers_no_big_orders,
        "customer_orders_left": customer_orders_left,
        "customer_orders_full": customer_orders_full,
        "orders_top_priority": orders_top_priority,
        "events_cube": events_cube,
        "events_groupsets": events_groupsets,
        "events_ranked": events_ranked,
        "events_distribution": events_distribution,
        "events_boundary": events_boundary,
        "q5_region_volume": q5_region_volume,
        "events_intervals": events_intervals,
        "events_overlap": events_overlap,
        "doc_normalize": doc_normalize,
        "doc_freq_score": doc_freq_score,
        "doc_quality_filter": doc_quality_filter,
        "events_intersect": events_intersect,
        "events_except": events_except,
        "orders_quality": orders_quality,
        "q3_shipping": q3_shipping,
        "supplier_rollup": supplier_rollup,
        "supplier_rollup_levels": supplier_rollup_levels,
        "media_image_features": media_image_features,
        "media_thumbs": media_thumbs,
        "media_audio_features": media_audio_features,
        "media_video_features": media_video_features,
        "media_phash_pairs": media_phash_pairs,
        "media_afp_pairs": media_afp_pairs,
        "media_vhash_pairs": media_vhash_pairs,
        "doc_bigram_lm": doc_bigram_lm,
        "doc_perplexity": doc_perplexity,
        "doc_blocklist_hits": doc_blocklist_hits,
        "doc_char_entropy": doc_char_entropy,
        "doc_hot_ngrams": doc_hot_ngrams,
        "graph_adamic_adar": graph_adamic_adar,
        "graph_jaccard": graph_jaccard,
        "graph_scc": graph_scc,
        "graph_reach": graph_reach,
        "graph_layers": graph_layers,
        "graph_msf": graph_msf,
        "events_redirects": events_redirects,
        "graph_temporal_reach": graph_temporal_reach,
        "graph_walks": graph_walks,
        "graph_betweenness": graph_betweenness,
        "graph_closeness": graph_closeness,
        "graph_eccentricity": graph_eccentricity,
        "events_next_entropy": events_next_entropy,
        "events_anomaly3s": events_anomaly3s,
        "events_corr": events_corr,
        "events_skewkurt": events_skewkurt,
        "events_autocorr": events_autocorr,
        "orders_benford": orders_benford,
        "doc_vocab_editdist": doc_vocab_editdist,
        "events_cusum": events_cusum,
        "events_streaks": events_streaks,
        "lineitem_fd_audit": lineitem_fd_audit,
        "lineitem_corr_matrix": lineitem_corr_matrix,
        "events_target_encode": events_target_encode,
        "events_feature_hash": events_feature_hash,
        "embed_quantize": embed_quantize,
        "embed_pq": embed_pq,
        "ann_pq_topk": ann_pq_topk,
        "doc_auc": doc_auc,
        "events_survival": events_survival,
        "doc_ks_drift": doc_ks_drift,
        "doc_bpe_merges": doc_bpe_merges,
        "doc_bpe_encode": doc_bpe_encode,
        "doc_winnow": doc_winnow,
        "doc_winnow_pairs": doc_winnow_pairs,
        "doc_calibration": doc_calibration,
        "doc_weighted_sample": doc_weighted_sample,
        "events_degree_hist": events_degree_hist,
        "doc_dice_pairs": doc_dice_pairs,
        "events_transitions": events_transitions,
        "events_basket_pairs": events_basket_pairs,
        "events_basket_rules": events_basket_rules,
        "events_zorder": events_zorder,
        "doc_checksum": doc_checksum,
        "q4_priority": q4_priority,
        "q10_returns": q10_returns,
        "q6_revenue": q6_revenue,
        "events_dedup_day": events_dedup_day,
        "events_rolling_dau": events_rolling_dau,
        "doc_extract_spans": doc_extract_spans,
        "events_weekly_trend": events_weekly_trend,
        "doc_lang_sample": doc_lang_sample,
        "part_brand_revenue": part_brand_revenue,
        "events_new_users": events_new_users,
        "events_adoption": events_adoption,
        "orders_concentration": orders_concentration,
        "doc_csv_roundtrip": doc_csv_roundtrip,
        "events_kcore": events_kcore,
        "events_lpa": events_lpa,
        "doc_line_dedup": doc_line_dedup,
        "events_decayed_avg": events_decayed_avg,
        "doc_chunks": doc_chunks,
        "events_kanon": events_kanon,
        "q13_custdist": q13_custdist,
        "q14_promo": q14_promo,
        "q15_top_supplier": q15_top_supplier,
        "q18_big_orders": q18_big_orders,
        "q17_small_qty": q17_small_qty,
        "q22_dormant": q22_dormant,
        "q7_nation_volume": q7_nation_volume,
        "graph_bfs_hops": graph_bfs_hops,
        "graph_sssp": graph_sssp,
        "doc_sorted_neighbors": doc_sorted_neighbors,
        "doc_source_gate": doc_source_gate,
        "embed_kmeans_assign": embed_kmeans_assign,
        "events_props_stats": events_props_stats,
        "supplier_copart": supplier_copart,
        "events_range_sum": events_range_sum,
        "doc_snm_dups": doc_snm_dups,
        "events_basket3": events_basket3,
        "source_overlap": source_overlap,
        "events_negatives": events_negatives,
        "events_iqr_outliers": events_iqr_outliers,
        "doc_query_dups": doc_query_dups,
        "customer_rfm": customer_rfm,
        "events_modularity": events_modularity,
        "events_weighted_median": events_weighted_median,
        "supplier_top_quantities": supplier_top_quantities,
        "doc_find_pos": doc_find_pos,
        "doc_tokenize_unk": doc_tokenize_unk,
        "events_twa": events_twa,
        "orders_rich_semi": orders_rich_semi,
        "orders_page": orders_page,
        "events_running_distinct": events_running_distinct,
        "source_vocab_overlap": source_vocab_overlap,
        "events_transition_times": events_transition_times,
        "events_bursts": events_bursts,
        "source_distinctive_tokens": source_distinctive_tokens,
        "doc_kwic": doc_kwic,
        "doc_cluster_sizes": doc_cluster_sizes,
        "part_abc": part_abc,
        "events_locf": events_locf,
        "events_attribution": events_attribution,
        "events_scd": events_scd,
        "kg_anchor_aliases": kg_anchor_aliases,
        "kg_gazetteer_mentions": kg_gazetteer_mentions,
        "part_skyline": part_skyline,
        "customer_cdc_state": customer_cdc_state,
        "orders_range_pruned": orders_range_pruned,
        "doc_rake": doc_rake,
        "ann_rrf": ann_rrf,
        "kg_fact_history": kg_fact_history,
        "embed_rp": embed_rp,
        "doc_gazetteer": doc_gazetteer,
        "doc_cluster_agreement": doc_cluster_agreement,
        "kg_linking_quality": kg_linking_quality,
        "events_snaive": events_snaive,
        "events_holt": events_holt,
        "events_trend_ols": events_trend_ols,
        "events_heatmap": events_heatmap,
        "events_window_topk": events_window_topk,
        "events_wau": events_wau,
        "events_churn": events_churn,
        "events_stickiness": events_stickiness,
        "orders_benford_gof": orders_benford_gof,
        "lineitem_seq_audit": lineitem_seq_audit,
        "customer_kanon": customer_kanon,
        "kg_type_violations": kg_type_violations,
        "events_markov_acc": events_markov_acc,
        "events_late": events_late,
        "orders_expectations": orders_expectations,
        "doc_pmi_pairs": doc_pmi_pairs,
        "graph_assortativity": graph_assortativity,
        "events_moving_median": events_moving_median,
        "doc_hapax": doc_hapax,
        "events_first_last": events_first_last,
        "events_mad": events_mad,
        "events_chi2": events_chi2,
        "q8_market_share": q8_market_share,
        "q12_late_priority": q12_late_priority,
        "q21_slowest_supplier": q21_slowest_supplier,
        "q2_min_cost_supplier": q2_min_cost_supplier,
        "q9_product_profit": q9_product_profit,
        "q11_important_parts": q11_important_parts,
        "q20_excess_share": q20_excess_share,
        "q19_disjunctive": q19_disjunctive,
        "q16_supplier_counts": q16_supplier_counts,
        "events_concurrency": events_concurrency,
        "orders_pareto": orders_pareto,
        "doc_snapshot_diff": doc_snapshot_diff,
        "doc_canonical_keep": doc_canonical_keep,
        "events_dense_hourly": events_dense_hourly,
        "nation_share": nation_share,
        "orders_gini": orders_gini,
        "events_user_entropy": events_user_entropy,
        "kg_hits": kg_hits,
    }


# ---------------------------------------------------------------------------
# oracles

def oracle_sql() -> dict[str, str]:
    return {
        "doc_exact_dedup": """
            SELECT md5(text) AS fp,
                   min(doc_id) AS first_doc_id,
                   count(*) AS n
            FROM documents GROUP BY text
        """,
        "doc_lang_counts": """
            SELECT lang, count(*) AS n FROM documents GROUP BY lang
        """,
        "doc_token_counts": """
            SELECT doc_id,
                   length(regexp_extract_all(text, '\\w+')) AS n_tokens
            FROM documents
        """,
        "doc_quality": r"""
            SELECT doc_id,
                   length(text) AS n_chars_c,
                   length(regexp_extract_all(text, '\w+')) AS n_tokens,
                   length(regexp_extract_all(text, '[.!?,;:]')) AS n_punct,
                   floor(
                     length(regexp_replace(text, '\W', '', 'g'))::DOUBLE
                     / greatest(length(regexp_extract_all(text, '\w+')), 1)
                     * 10000) / 10000 AS mean_token_len
            FROM documents
        """,
        "doc_vocab_topk": r"""
            WITH t AS (
              SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS token
              FROM documents
            ), c AS (
              SELECT token, count(*) AS n FROM t GROUP BY token
            )
            SELECT token, n FROM c ORDER BY n DESC, token LIMIT 100
        """,
        "doc_split": """
            SELECT doc_id,
                   CASE WHEN substr(md5(text), 1, 2) < 'cc' THEN 'train'
                        WHEN substr(md5(text), 1, 2) < 'e6' THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        """,
        "doc_sample": """
            SELECT lang, doc_id, CAST(rank AS BIGINT) AS rank FROM (
              SELECT lang, doc_id,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rank
              FROM documents
            ) WHERE rank <= 20
        """,
        # PMI ratio is kept RATIONAL (BIGINT products → one double
        # division) so the float column is bit-identical to the engine
        "doc_collocations": r"""
            WITH toks AS (
              SELECT regexp_extract_all(lower(text), '\w+') AS l FROM documents
            ), uni AS (
              SELECT t AS token, count(*)::BIGINT AS c
              FROM (SELECT unnest(l) AS t FROM toks) GROUP BY 1
            ), n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
            big AS (
              SELECT unnest(list_transform(range(1, len(l)), i -> l[i])) AS a,
                     unnest(list_transform(range(1, len(l)), i -> l[i+1])) AS b
              FROM toks
            ), pairs AS (
              SELECT a, b, count(*)::BIGINT AS c_ab FROM big
              GROUP BY 1, 2 HAVING count(*) >= 5
            )
            SELECT p.a, p.b, p.c_ab,
                   CAST(p.c_ab * (SELECT n FROM n) AS DOUBLE)
                     / CAST(ua.c * ub.c AS DOUBLE) AS ratio
            FROM pairs p
            JOIN uni ua ON ua.token = p.a
            JOIN uni ub ON ub.token = p.b
            ORDER BY ratio DESC, a, b LIMIT 50
        """,
        # log-free idf; every constant is an e0 DOUBLE literal (a bare
        # 2.2 parses as DECIMAL and takes an exact-decimal arithmetic
        # path that rounds differently from the engine's IEEE doubles);
        # term order and association mirror the engine's summation
        "doc_bm25": r"""
            WITH toks AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS l
              FROM documents
            ), stats AS (
              SELECT doc_id, len(l) AS dl,
                     len(list_filter(l, x -> x = 'hash'))   AS tf0,
                     len(list_filter(l, x -> x = 'merge'))  AS tf1,
                     len(list_filter(l, x -> x = 'vector')) AS tf2,
                     len(list_filter(l, x -> x = 'window')) AS tf3
              FROM toks
            ), g AS (
              SELECT count(*) AS n,
                     CAST(sum(dl) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avgdl,
                     sum(CASE WHEN tf0>0 THEN 1 ELSE 0 END) AS df0,
                     sum(CASE WHEN tf1>0 THEN 1 ELSE 0 END) AS df1,
                     sum(CASE WHEN tf2>0 THEN 1 ELSE 0 END) AS df2,
                     sum(CASE WHEN tf3>0 THEN 1 ELSE 0 END) AS df3
              FROM stats
            )
            SELECT doc_id, score FROM (
              SELECT doc_id,
                (CAST(n - df0 AS DOUBLE) + 0.5e0)/(CAST(df0 AS DOUBLE) + 0.5e0)
                  * (tf0*2.2e0) / (tf0 + 1.2e0*(0.25e0 + 0.75e0*(dl/avgdl)))
              + (CAST(n - df1 AS DOUBLE) + 0.5e0)/(CAST(df1 AS DOUBLE) + 0.5e0)
                  * (tf1*2.2e0) / (tf1 + 1.2e0*(0.25e0 + 0.75e0*(dl/avgdl)))
              + (CAST(n - df2 AS DOUBLE) + 0.5e0)/(CAST(df2 AS DOUBLE) + 0.5e0)
                  * (tf2*2.2e0) / (tf2 + 1.2e0*(0.25e0 + 0.75e0*(dl/avgdl)))
              + (CAST(n - df3 AS DOUBLE) + 0.5e0)/(CAST(df3 AS DOUBLE) + 0.5e0)
                  * (tf3*2.2e0) / (tf3 + 1.2e0*(0.25e0 + 0.75e0*(dl/avgdl)))
                AS score
              FROM stats, g
            ) WHERE score > 0e0
            ORDER BY score DESC, doc_id LIMIT 20
        """,
        "events_user_paths": """
            SELECT user_id, count(*) AS n_events,
                   array_to_string(
                     list_slice(list(event_type ORDER BY ts, event_id), 1, 50),
                     '>') AS path
            FROM events GROUP BY user_id
        """,
        # The sample is deterministic (FNV-1a over the id's decimal
        # codepoints — same HUGEINT fold as the simhash oracle), so
        # the sketch output is SQL-reproducible bit-exactly.
        "events_value_sketch": """
            WITH h AS (
              SELECT event_id, value,
                CAST(list_reduce(
                  list_prepend(CAST(14695981039346656037 AS HUGEINT),
                    list_transform(
                      range(1, length(CAST(event_id AS VARCHAR)) + 1),
                      j -> CAST(unicode(CAST(event_id AS VARCHAR)[j])
                                AS HUGEINT))),
                  (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                        CAST(c AS UBIGINT)) AS HUGEINT)
                               * 1099511628211) % 18446744073709551616
                ) AS UBIGINT) AS hv
              FROM events
            ), samp AS (
              SELECT value FROM h ORDER BY hv, event_id LIMIT 1024
            )
            SELECT 0.25e0 AS q, quantile_disc(value, 0.25)::DOUBLE AS v
            FROM samp
            UNION ALL
            SELECT 0.5e0, quantile_disc(value, 0.5)::DOUBLE FROM samp
            UNION ALL
            SELECT 0.75e0, quantile_disc(value, 0.75)::DOUBLE FROM samp
        """,
        "events_gap_quantiles": """
            WITH d AS (
              SELECT event_type,
                     date_diff('second',
                       lag(ts) OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts, event_id),
                       ts) AS gap_s
              FROM events
            ), g AS (
              SELECT event_type, gap_s FROM d WHERE gap_s IS NOT NULL
            )
            SELECT event_type, 0.25e0 AS q,
                   quantile_disc(gap_s, 0.25)::DOUBLE AS v
            FROM g GROUP BY event_type
            UNION ALL
            SELECT event_type, 0.5e0, quantile_disc(gap_s, 0.5)::DOUBLE
            FROM g GROUP BY event_type
            UNION ALL
            SELECT event_type, 0.75e0, quantile_disc(gap_s, 0.75)::DOUBLE
            FROM g GROUP BY event_type
        """,
        # Transitive closure with UNION dedup (the doc_dup_clusters
        # pattern); comp = min reachable user_id, matching the
        # engine's min-label CC.
        "events_components": """
            WITH RECURSIVE cells AS (
              SELECT DISTINCT user_id, props
              FROM events
              WHERE event_type = 'purchase' AND value > 99.0
            ), e AS (
              SELECT DISTINCT c1.user_id AS u, c2.user_id AS v
              FROM cells c1 JOIN cells c2
                ON c1.props = c2.props AND c1.user_id < c2.user_id
            ), und AS (
              SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
            ), nodes AS (
              SELECT DISTINCT u AS node FROM und
            ), reach(a, b) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT r.a, d.v FROM reach r JOIN und d ON d.u = r.b
            )
            SELECT a AS node, min(b) AS comp FROM reach GROUP BY a
        """,
        # per-community modularity components: same CC as
        # events_components, then exact integer edge/degree/node folds
        "events_modularity": """
            WITH RECURSIVE cells AS (
              SELECT DISTINCT user_id, props
              FROM events
              WHERE event_type = 'purchase' AND value > 99.0
            ), e AS (
              SELECT DISTINCT c1.user_id AS u, c2.user_id AS v
              FROM cells c1 JOIN cells c2
                ON c1.props = c2.props AND c1.user_id < c2.user_id
            ), und AS (
              SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
            ), nodes AS (
              SELECT DISTINCT u AS node FROM und
            ), reach(a, b) AS (
              SELECT node, node FROM nodes
              UNION
              SELECT r.a, d.v FROM reach r JOIN und d ON d.u = r.b
            ), lab AS (
              SELECT a AS node, min(b) AS comp FROM reach GROUP BY a
            ), estat AS (
              SELECT lu.comp AS community,
                     sum(CASE WHEN lu.comp = lv.comp THEN 1 ELSE 0 END)
                       AS internal_u,
                     count(*) AS deg_u
              FROM e
              JOIN lab lu ON lu.node = e.u
              JOIN lab lv ON lv.node = e.v
              GROUP BY 1
            ), estat_v AS (
              SELECT lv.comp AS community, count(*) AS deg_v
              FROM e
              JOIN lab lv ON lv.node = e.v
              GROUP BY 1
            ), nstat AS (
              SELECT comp AS community,
                     CAST(count(*) AS BIGINT) AS n_nodes
              FROM lab GROUP BY 1
            )
            SELECT n.community, n.n_nodes,
                   CAST(coalesce(es.internal_u, 0) AS BIGINT)
                     AS internal_edges,
                   CAST(coalesce(es.deg_u, 0)
                        + coalesce(ev2.deg_v, 0) AS BIGINT)
                     AS total_degree
            FROM nstat n
            LEFT JOIN estat es ON es.community = n.community
            LEFT JOIN estat_v ev2 ON ev2.community = n.community
        """,
        # exact k-core via a recursive CTE despite the single-reference
        # rule: UNNEST([u, v]) doubles each edge so ONE pass over the
        # recursive table yields both endpoint degrees (window COUNT
        # PARTITION BY node); an edge survives a peel round iff
        # min(endpoint degree) >= k; QUALIFY emits the survivors only
        # while the set strictly shrinks (guaranteed termination), and
        # the finalizer applies ONE extra peel to the max-round set so
        # the fully-peeled-to-empty case is exact too (the recursion
        # cannot emit an empty row-set, so its last set may be one
        # round short).
        "events_kcore": """
            WITH RECURSIVE cells AS (
              SELECT DISTINCT user_id, props FROM events
              WHERE event_type = 'purchase' AND value > 99.0
            ), e0 AS (
              SELECT DISTINCT c1.user_id AS u, c2.user_id AS v
              FROM cells c1 JOIN cells c2
                ON c1.props = c2.props AND c1.user_id < c2.user_id
            ), peel(it, u, v) AS (
              SELECT 0 AS it, u, v FROM e0
              UNION ALL
              SELECT it + 1 AS it, u, v FROM (
                SELECT it, u, v, any_value(n_prev) AS n_prev
                FROM (
                  SELECT it, u, v, node,
                         count(*) OVER (PARTITION BY node) AS nd,
                         (count(*) OVER ()) / 2 AS n_prev
                  FROM (SELECT it, u, v, unnest([u, v]) AS node
                        FROM peel)
                )
                GROUP BY it, u, v
                HAVING min(nd) >= 2
                QUALIFY count(*) OVER () < any_value(n_prev)
              )
            ), final_set AS (
              SELECT u, v FROM peel
              WHERE it = (SELECT max(it) FROM (SELECT it FROM peel))
            ), fpeel AS (
              SELECT u, v FROM (
                SELECT u, v, min(nd) AS min_nd FROM (
                  SELECT u, v, node,
                         count(*) OVER (PARTITION BY node) AS nd
                  FROM (SELECT u, v, unnest([u, v]) AS node
                        FROM final_set)
                ) GROUP BY u, v HAVING min(nd) >= 2
              )
            )
            SELECT node, count(*) AS core_deg
            FROM (SELECT unnest([u, v]) AS node FROM fpeel)
            GROUP BY node
        """,
        "events_kanon": """
            SELECT event_type, props,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_subjects
            FROM events GROUP BY 1, 2
            HAVING count(DISTINCT user_id) < 12
        """,
        "doc_chunks": r"""
            WITH t AS (
              SELECT doc_id,
                     regexp_extract_all(lower(text), '\w+') AS toks
              FROM documents
            ), c AS (
              SELECT doc_id, toks, length(toks) AS n,
                     unnest(range(0, length(toks), 48)) AS s
              FROM t WHERE length(toks) > 0
            )
            SELECT doc_id, CAST(s / 48 AS BIGINT) AS chunk_id,
                   array_to_string(
                     list_slice(toks, s + 1, least(s + 64, n)), ' ')
                     AS chunk_text,
                   CAST(least(s + 64, n) - s AS BIGINT) AS n_tokens
            FROM c
        """,
        # CCNet line dedup replay: plant the same boilerplate, explode
        # lines with ordinality, count eligible lines corpus-wide,
        # rebuild with string_agg ORDER BY pos (CASE skips dropped)
        "doc_line_dedup": """
            WITH aug AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 2 = 0
                          THEN 'subscribe to our newsletter for updates'
                               || chr(10) || text || chr(10) ||
                               'copyright 2026 example corp all rights reserved'
                          ELSE text || chr(10) ||
                               'copyright 2026 example corp all rights reserved'
                     END AS text
              FROM documents
            ), lines AS (
              SELECT doc_id, generate_subscripts(ls, 1) AS pos,
                     unnest(ls) AS line
              FROM (SELECT doc_id, string_split(text, chr(10)) AS ls
                    FROM aug)
            ), cnt AS (
              SELECT line, count(*) AS n FROM lines
              WHERE length(line) >= 10 GROUP BY 1
            ), marked AS (
              SELECT l.doc_id, l.pos, l.line,
                     CASE WHEN length(l.line) >= 10
                           AND coalesce(c.n, 0) > 1
                          THEN 1 ELSE 0 END AS dropped
              FROM lines l LEFT JOIN cnt c USING (line)
            )
            SELECT doc_id,
                   coalesce(string_agg(
                     CASE WHEN dropped = 0 THEN line END,
                     chr(10) ORDER BY pos), '') AS text_clean,
                   CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(sum(dropped) AS BIGINT) AS n_dropped
            FROM marked GROUP BY doc_id
        """,
        # exact decayed trailing average: m = least(rn, 8); term j
        # contributes lag_j << (m-1-j) while j < m (lag_j is NULL
        # exactly when j >= rn, i.e. outside the frame); den = 2^m - 1
        "events_decayed_avg": """
            WITH q AS (
              SELECT user_id, event_id, ts,
                     CAST(round(value * 10000) AS BIGINT) AS vfp
              FROM events
            ), l AS (
              SELECT user_id, event_id,
                     LEAST(row_number() OVER w, 8) AS m,
                     vfp AS l0,
                     lag(vfp, 1) OVER w AS l1,
                     lag(vfp, 2) OVER w AS l2,
                     lag(vfp, 3) OVER w AS l3,
                     lag(vfp, 4) OVER w AS l4,
                     lag(vfp, 5) OVER w AS l5,
                     lag(vfp, 6) OVER w AS l6,
                     lag(vfp, 7) OVER w AS l7
              FROM q
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, event_id,
                   (l0 << (m - 1))
                   + CASE WHEN m > 1 THEN l1 << (m - 2) ELSE 0 END
                   + CASE WHEN m > 2 THEN l2 << (m - 3) ELSE 0 END
                   + CASE WHEN m > 3 THEN l3 << (m - 4) ELSE 0 END
                   + CASE WHEN m > 4 THEN l4 << (m - 5) ELSE 0 END
                   + CASE WHEN m > 5 THEN l5 << (m - 6) ELSE 0 END
                   + CASE WHEN m > 6 THEN l6 << (m - 7) ELSE 0 END
                   + CASE WHEN m > 7 THEN l7 ELSE 0 END AS num,
                   (CAST(1 AS BIGINT) << m) - 1 AS den
            FROM l
        """,
        # 5-round synchronous LPA, replayed exactly: the recursive
        # state carries (it, node, label); each round joins the state
        # to the static undirected edge list (non-recursive CTEs may be
        # referenced freely), counts neighbor labels per node, and
        # QUALIFY keeps the (count DESC, label ASC) winner
        "events_lpa": """
            WITH RECURSIVE cells AS (
              SELECT DISTINCT user_id, props FROM events
              WHERE event_type = 'purchase' AND value > 99.0
            ), e AS (
              SELECT DISTINCT c1.user_id AS u, c2.user_id AS v
              FROM cells c1 JOIN cells c2
                ON c1.props = c2.props AND c1.user_id < c2.user_id
            ), und AS (
              SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
            ), nodes AS (
              SELECT DISTINCT u AS node FROM und
            ), state(it, node, label) AS (
              SELECT 0 AS it, node, node AS label FROM nodes
              UNION ALL
              SELECT it + 1 AS it, node, label FROM (
                SELECT s.it AS it, d.u AS node, s.label AS label,
                       count(*) AS c
                FROM state s JOIN und d ON d.v = s.node
                WHERE s.it < 5
                GROUP BY 1, 2, 3
                QUALIFY row_number() OVER (
                          PARTITION BY d.u
                          ORDER BY count(*) DESC, s.label ASC) = 1
              )
            )
            SELECT node, label AS community FROM state WHERE it = 5
        """,
        "events_type_gini": """
            WITH c AS (
              SELECT user_id, event_type, count(*)::BIGINT AS c
              FROM events GROUP BY 1, 2
            )
            SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
                   CAST(sum(c)*sum(c) - sum(c*c) AS DOUBLE)
                     / CAST(sum(c)*sum(c) AS DOUBLE) AS gini
            FROM c GROUP BY user_id
        """,
        "events_mode_props": """
            WITH c AS (
              SELECT event_type, props, count(*)::BIGINT AS c
              FROM events GROUP BY 1, 2
            ), r AS (
              SELECT event_type, props, c,
                     row_number() OVER (
                       PARTITION BY event_type
                       ORDER BY c DESC, props ASC) AS rn
              FROM c
            )
            SELECT event_type, props AS mode, c AS mode_count
            FROM r WHERE rn = 1
        """,
        "events_outliers": """
            WITH med AS (
              SELECT event_type,
                     quantile_disc(CAST(round(value*100) AS BIGINT), 0.5)/100.0 AS med
              FROM events GROUP BY event_type
            ), dev AS (
              SELECT e.event_id, e.event_type, e.value,
                     abs(e.value - m.med) AS dv
              FROM events e JOIN med m USING(event_type)
            ), mad AS (
              SELECT event_type,
                     quantile_disc(CAST(round(dv*100) AS BIGINT), 0.5)/100.0 AS mad
              FROM dev GROUP BY event_type
            )
            SELECT d.event_id, d.event_type, d.value
            FROM dev d JOIN mad m USING(event_type)
            WHERE d.dv > 3.0e0 * m.mad
        """,
        # Σtf² and n² are exact int64 on the engine side and exact
        # HUGEINT sums here; the one double division rounds identically
        # The recursive CTE replays the engine's greedy jump scan: each
        # step closes one bin per shard at the largest cumsum within
        # budget of the bin start (min-cumsum fallback = an oversized
        # doc alone in its bin); a doc's bin is the last boundary
        # strictly below its cumsum.
        "doc_packed": r"""
            WITH RECURSIVE t AS (
              SELECT doc_id, doc_id // 100 AS shard,
                     len(regexp_extract_all(lower(text), '\w+'))::BIGINT
                       AS n_tokens
              FROM documents
              WHERE len(regexp_extract_all(lower(text), '\w+')) > 0
            ), d AS (
              SELECT *, sum(n_tokens) OVER (PARTITION BY shard
                                            ORDER BY doc_id) AS cs
              FROM t
            ), bounds AS (
              SELECT shard, 0::BIGINT AS bin, 0::BIGINT AS start_cs
              FROM (SELECT DISTINCT shard FROM d)
              UNION ALL
              SELECT b.shard, b.bin + 1,
                     coalesce(
                       (SELECT max(cs) FROM d WHERE d.shard = b.shard
                          AND cs - b.start_cs <= 2000 AND cs > b.start_cs),
                       (SELECT min(cs) FROM d WHERE d.shard = b.shard
                          AND cs > b.start_cs))
              FROM bounds b
              WHERE EXISTS (
                SELECT 1 FROM d WHERE d.shard = b.shard
                  AND cs > coalesce(
                    (SELECT max(cs) FROM d WHERE d.shard = b.shard
                       AND cs - b.start_cs <= 2000 AND cs > b.start_cs),
                    (SELECT min(cs) FROM d WHERE d.shard = b.shard
                       AND cs > b.start_cs)))
            )
            SELECT d.doc_id, d.shard, d.n_tokens,
                   (SELECT max(bin) FROM bounds b
                     WHERE b.shard = d.shard AND b.start_cs < d.cs) AS bin
            FROM d
        """,
        "doc_length_deciles": """
            SELECT lang, doc_id,
                   CAST(ntile(10) OVER w AS BIGINT) AS tile,
                   percent_rank() OVER w AS pct_rank,
                   cume_dist() OVER w AS cume_dist
            FROM documents
            WINDOW w AS (PARTITION BY lang ORDER BY n_chars DESC, doc_id)
        """,
        # sessionize replica (the events_sessions oracle) wrapped in
        # quantile_disc over whole-second durations (scale=1 identity)
        "events_session_quantiles": """
            WITH o AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR date_diff('microsecond', lag(ts) OVER w, ts)
                               > 1800 * 1000000
                          THEN 1 ELSE 0 END AS b
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT *, CAST(sum(b) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
              FROM o
            ), d AS (
              SELECT date_diff('second', min(ts), max(ts)) AS duration_s
              FROM s GROUP BY user_id, session_seq
            ), a AS (
              SELECT quantile_disc(duration_s, [0.25, 0.5, 0.75]) AS l
              FROM d
            )
            SELECT unnest([0.25, 0.5, 0.75]) AS q,
                   CAST(unnest(l) AS DOUBLE) AS v
            FROM a
        """,
        # e0 float literals force DOUBLE (not DECIMAL) arithmetic so
        # DuckDB rounds identically to numpy; see the BM25 oracle note.
        "doc_readability": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '\w+')) AS w
              FROM documents
            ), agg AS (
              SELECT doc_id, count(*)::BIGINT AS n_words,
                     sum(greatest(
                       len(regexp_extract_all(w, '[aeiouy]+')), 1
                     ))::BIGINT AS n_syllables
              FROM tok GROUP BY doc_id
            ), sen AS (
              SELECT doc_id,
                     greatest(len(regexp_extract_all(text, '[.!?]+')),
                              1)::BIGINT AS n_sentences
              FROM documents
            )
            SELECT a.doc_id, n_words, n_sentences, n_syllables,
                   206.835e0
                     - 1.015e0 * (CAST(n_words AS DOUBLE)
                                  / CAST(n_sentences AS DOUBLE))
                     - 84.6e0 * (CAST(n_syllables AS DOUBLE)
                                 / CAST(n_words AS DOUBLE)) AS flesch
            FROM agg a JOIN sen s ON a.doc_id = s.doc_id
        """,
        "doc_diversity": r"""
            WITH tf AS (
              SELECT doc_id, token, count(*)::BIGINT AS tf FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '\w+')) AS token
                FROM documents
              ) GROUP BY 1, 2
            )
            SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
                   CAST(sum(tf*tf) AS DOUBLE)
                     / CAST(sum(tf)*sum(tf) AS DOUBLE) AS simpson
            FROM tf GROUP BY doc_id
        """,
        "events_path_trigrams": """
            WITH seq AS (
              SELECT user_id,
                     list(event_type ORDER BY ts, event_id) AS l
              FROM events GROUP BY user_id
            ), tg AS (
              SELECT unnest(list_transform(range(1, len(l)-1), i -> l[i]))   AS g0,
                     unnest(list_transform(range(1, len(l)-1), i -> l[i+1])) AS g1,
                     unnest(list_transform(range(1, len(l)-1), i -> l[i+2])) AS g2
              FROM seq
            )
            SELECT g0, g1, g2, count(*) AS cnt FROM tg
            GROUP BY 1, 2, 3
            ORDER BY cnt DESC, g0, g1, g2 LIMIT 25
        """,
        "events_triangles": """
            WITH cells AS (
              SELECT DISTINCT user_id, event_type,
                     date_trunc('hour', ts) AS w
              FROM events
            ), e AS (
              SELECT DISTINCT c1.user_id AS u, c2.user_id AS v
              FROM cells c1 JOIN cells c2
                ON c1.event_type = c2.event_type AND c1.w = c2.w
               AND c1.user_id < c2.user_id
            )
            SELECT count(*) AS n_triangles
            FROM e e1
            JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
        """,
        # each triangle found once at its wedge center, credits all 3
        # corners; 2.0*tri computed BEFORE the divide in both engines
        "events_clustering": """
            WITH cells AS (
              SELECT DISTINCT user_id, event_type,
                     date_trunc('hour', ts) AS w
              FROM events
            ), e AS (
              SELECT DISTINCT c1.user_id AS u, c2.user_id AS v
              FROM cells c1 JOIN cells c2
                ON c1.event_type = c2.event_type AND c1.w = c2.w
               AND c1.user_id < c2.user_id
            ), t AS (
              SELECT e1.u AS a, e1.v AS b, e2.v AS c
              FROM e e1
              JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
              JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
            ), cr AS (
              SELECT a AS node FROM t
              UNION ALL SELECT b FROM t
              UNION ALL SELECT c FROM t
            ), tri AS (
              SELECT node, CAST(count(*) AS BIGINT) AS tri
              FROM cr GROUP BY node
            ), deg AS (
              SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
                SELECT u AS node FROM e UNION ALL SELECT v FROM e)
              GROUP BY node
            )
            SELECT d.node, d.deg,
                   CAST(coalesce(tri.tri, 0) AS BIGINT) AS tri,
                   CASE WHEN d.deg >= 2
                        THEN 2.0 * coalesce(tri.tri, 0)
                             / (d.deg * (d.deg - 1))
                        ELSE 0.0 END AS lcc
            FROM deg d LEFT JOIN tri USING (node)
        """,
        "doc_inverted_index": r"""
            WITH tf AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '\w+')) AS token
              FROM documents
            ), pairs AS (
              SELECT DISTINCT doc_id, token FROM tf
            )
            SELECT token, count(*) AS df,
                   array_to_string(
                     list_slice(
                       list(CAST(doc_id AS VARCHAR) ORDER BY doc_id), 1, 20),
                     ',') AS postings
            FROM pairs GROUP BY token
        """,
        # strictly-after uses the (ts, event_id) total order on both
        # sides; the value>60 slice keeps the step counts non-vacuous
        "events_funnel": """
            WITH e AS (
              SELECT user_id, ts, event_id, event_type FROM events
              WHERE value > 60.0e0
            ),
            s1 AS (
              SELECT user_id, ts AS t, event_id AS i FROM (
                SELECT user_id, ts, event_id,
                       row_number() OVER (
                         PARTITION BY user_id ORDER BY ts, event_id) AS rn
                FROM e WHERE event_type = 'view') WHERE rn = 1
            ),
            s2 AS (
              SELECT user_id, ts AS t, event_id AS i FROM (
                SELECT e.user_id, e.ts, e.event_id,
                       row_number() OVER (
                         PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
                FROM e JOIN s1 USING(user_id)
                WHERE e.event_type = 'click'
                  AND (e.ts > s1.t OR (e.ts = s1.t AND e.event_id > s1.i))
              ) WHERE rn = 1
            ),
            s3 AS (
              SELECT user_id, ts AS t, event_id AS i FROM (
                SELECT e.user_id, e.ts, e.event_id,
                       row_number() OVER (
                         PARTITION BY e.user_id ORDER BY e.ts, e.event_id) AS rn
                FROM e JOIN s2 USING(user_id)
                WHERE e.event_type = 'purchase'
                  AND (e.ts > s2.t OR (e.ts = s2.t AND e.event_id > s2.i))
              ) WHERE rn = 1
            )
            SELECT * FROM (
              SELECT CAST(1 AS BIGINT) AS step_no, 'view' AS step,
                     count(*) AS n_users FROM s1
              UNION ALL SELECT 2, 'click', count(*) FROM s2
              UNION ALL SELECT 3, 'purchase', count(*) FROM s3
            )
        """,
        "events_cohorts": """
            WITH act AS (
              SELECT DISTINCT user_id, date_trunc('week', ts) AS week
              FROM events
            ), coh AS (
              SELECT user_id, min(week) AS cohort_week FROM act GROUP BY 1
            )
            SELECT c.cohort_week,
                   date_diff('day', c.cohort_week, a.week) // 7 AS week_no,
                   count(*) AS n_users
            FROM act a JOIN coh c USING(user_id)
            GROUP BY 1, 2
        """,
        "doc_fingerprint": """
            SELECT doc_id, md5(text) AS fp FROM documents
        """,
        # Same planted suffix and the same RE2 pattern strings as the
        # engine (kgflow/ops/clean.py PII_PATTERNS); hit counts are per
        # pattern on the progressively redacted text, engine order
        # email → ip → phone.
        "doc_pii_redact": r"""
            WITH planted AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 = 0
                          THEN text || ' contact user@example.com at'
                                    || ' 10.0.0.1 or call 555-123-4567'
                          ELSE text END AS t0
              FROM documents
            ), r1 AS (
              SELECT doc_id, t0,
                     regexp_replace(t0,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS t1
              FROM planted
            ), r2 AS (
              SELECT doc_id, t0, t1,
                     regexp_replace(t1,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                       '<IP>', 'g') AS t2
              FROM r1
            )
            SELECT doc_id,
                   regexp_replace(t2, '\b\d{3}[- ]\d{3,4}[- ]\d{4}\b',
                                  '<PHONE>', 'g') AS text,
                   length(regexp_extract_all(t0,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                   + length(regexp_extract_all(t1,
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                   + length(regexp_extract_all(t2,
                     '\b\d{3}[- ]\d{3,4}[- ]\d{4}\b')) AS n_redactions
            FROM r2
        """,
        "doc_repetition": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            )
            SELECT doc_id,
                   CASE WHEN len(w) < 2 THEN 0.0
                        ELSE floor((1.0
                               - len(list_distinct(list_transform(
                                   range(1, len(w)),
                                   i -> w[i] || ' ' || w[i+1])))::DOUBLE
                               / (len(w) - 1)) * 10000) / 10000
                   END AS dup_bigram_frac
            FROM tok
        """,
        "doc_contamination": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(w) - 6),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                            || w[i+3] || ' ' || w[i+4] || ' ' || w[i+5]
                            || ' ' || w[i+6] || ' ' || w[i+7])) AS s
              FROM tok
            ), bench AS (
              SELECT list_distinct(flatten(list(s))) AS bs
              FROM sh WHERE doc_id < 5
            )
            SELECT t.doc_id,
                   CAST(len(list_intersect(t.s, b.bs)) > 0 AS BIGINT)
                     AS contaminated
            FROM sh t CROSS JOIN bench b
        """,
        "doc_incremental_new": """
            SELECT doc_id FROM documents
            WHERE text NOT IN (
              SELECT text FROM documents WHERE doc_id < 250)
        """,
        "doc_top_terms": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '\w+')) AS token
              FROM documents
            ), tf AS (
              SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
            ), dfreq AS (
              SELECT token, count(*) AS df FROM tf GROUP BY 1
            )
            SELECT doc_id, token, tf, df FROM (
              SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
                     row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, dfreq.df, tf.token) AS rn
              FROM tf JOIN dfreq USING (token)
            ) WHERE rn <= 3
        """,
        # True word-trigram Jaccard over all pairs — the same exact
        # predicate the engine's verify stage applies after LSH
        # candidate generation (see doc_minhash_pairs docstring for the
        # recall argument).
        # bipartite true-Jaccard: side B = suffix-perturbed every-7th
        # docs (ids +3e6); only A x B pairs, same shingle/sim math as
        # doc_minhash_pairs
        "doc_cross_dups": r"""
            WITH a_tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), b_tok AS (
              SELECT doc_id + 3000000 AS doc_id,
                     regexp_extract_all(lower(text || ' qq zz xx'), '\w+')
                       AS w
              FROM documents WHERE doc_id % 7 = 0
            ), a_sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
              FROM a_tok
            ), b_sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
              FROM b_tok
            ), p AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     len(list_intersect(a.s, b.s))::DOUBLE
                       / (len(a.s) + len(b.s)
                          - len(list_intersect(a.s, b.s))) AS jac
              FROM a_sh a CROSS JOIN b_sh b
            )
            SELECT doc_a, doc_b, floor(jac * 10000) / 10000 AS sim
            FROM p WHERE jac >= 0.5
        """,
        "doc_minhash_pairs": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
              FROM tok
            ), p AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     len(list_intersect(a.s, b.s))::DOUBLE
                       / (len(a.s) + len(b.s)
                          - len(list_intersect(a.s, b.s))) AS jac
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            )
            SELECT doc_a, doc_b, floor(jac * 10000) / 10000 AS sim
            FROM p WHERE jac >= 0.5
        """,
        # Same true-Jaccard predicate as doc_minhash_pairs; the engine
        # side here is the EXACT prefix-filter join, so the oracle
        # equivalence needs no recall argument.
        # Prefix equality is part of the predicate, so the engine's
        # prefix blocking is recall-complete; the planted typo (char 21
        # flipped z<->y, ids +2e6) mirrors the engine's plant exactly.
        "doc_typo_pairs": """
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 2000000,
                     substr(text, 1, 20)
                       || CASE WHEN substr(text, 21, 1) = 'z'
                               THEN 'y' ELSE 'z' END
                       || substr(text, 22)
              FROM documents
              WHERE doc_id % 11 = 5 AND length(text) >= 21
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   levenshtein(a.text, b.text)::BIGINT AS dist
            FROM aug a JOIN aug b
              ON a.doc_id < b.doc_id
             AND substr(a.text, 1, 16) = substr(b.text, 1, 16)
            WHERE levenshtein(a.text, b.text) <= 3
        """,
        "events_winsorized": """
            WITH q AS (
              SELECT event_type,
                     quantile_disc(CAST(round(value*100) AS BIGINT),
                                   0.125)/100.0 AS lo,
                     quantile_disc(CAST(round(value*100) AS BIGINT),
                                   0.875)/100.0 AS hi
              FROM events GROUP BY event_type
            )
            SELECT e.event_id, e.event_type, e.value,
                   least(greatest(e.value, q.lo), q.hi) AS value_w
            FROM events e JOIN q USING(event_type)
        """,
        # Same shingle pipeline as doc_jaccard_pairs, but the score is
        # the overlap coefficient and the corpus gains planted excerpt
        # docs (first-40-token prefix + 5 novel tokens, ids +1e6) so
        # non-1.0 containment pairs exist. doc_id2 alias avoids DuckDB
        # lateral-alias capture of the shifted id in the suffix tokens.
        "doc_containment": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), exc AS (
              SELECT doc_id + 1000000 AS doc_id2,
                     list_concat(w[1:40],
                       ['qa'||doc_id, 'qb'||doc_id, 'qc'||doc_id,
                        'qd'||doc_id, 'qe'||doc_id]) AS w
              FROM tok WHERE doc_id % 7 = 3
            ), allw AS (
              SELECT doc_id, w FROM tok
              UNION ALL SELECT doc_id2 AS doc_id, w FROM exc
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
              FROM allw
            ), p AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     len(list_intersect(a.s, b.s))::DOUBLE
                       / least(len(a.s), len(b.s)) AS c
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            )
            SELECT doc_a, doc_b, floor(c * 10000) / 10000 AS sim
            FROM p WHERE c >= 0.8
        """,
        "doc_jaccard_pairs": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
              FROM tok
            ), p AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     len(list_intersect(a.s, b.s))::DOUBLE
                       / (len(a.s) + len(b.s)
                          - len(list_intersect(a.s, b.s))) AS jac
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            )
            SELECT doc_a, doc_b, floor(jac * 10000) / 10000 AS sim
            FROM p WHERE jac >= 0.5
        """,
        # Same pair predicate, then connected components as a
        # recursive-CTE transitive closure; cluster_id = min doc_id of
        # the component (singletons keep their own id).
        "doc_dup_clusters": r"""
            WITH RECURSIVE tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
              FROM tok
            ), pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s)
                       - len(list_intersect(a.s, b.s))) >= 0.5
            ), edges AS (
              SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs
            ), reach(a, b) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.a, e.v FROM reach r JOIN edges e ON e.u = r.b
            )
            SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
        """,
        # Repeated-span removal: k-grams via list slices (the rolling_fp
        # trick), corpus-wide HAVING threshold, coverage positions by
        # unnesting a 0..7 offset range, rebuild via ordered string_agg.
        "doc_boilerplate_strip": r"""
            WITH base AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0
                          THEN text || ' subscribe to our newsletter for updates terms of service apply'
                          ELSE text END AS text
              FROM documents
            ), lst AS (
              SELECT doc_id, regexp_extract_all(text, '\w+') AS toks FROM base
            ), gs AS (
              SELECT doc_id, toks,
                     unnest(range(1, greatest(len(toks) - 6, 1))) AS j
              FROM lst
            ), grams AS (
              SELECT doc_id, CAST(j AS BIGINT) AS s,
                     array_to_string(toks[j:j+7], ' ') AS gram
              FROM gs
            ), hot AS (
              SELECT gram FROM grams GROUP BY gram HAVING count(*) > 20
            ), hits AS (
              SELECT g.doc_id, g.s FROM grams g JOIN hot USING (gram)
            ), cov AS (
              SELECT DISTINCT doc_id, s + o AS pos
              FROM (SELECT doc_id, s, unnest(range(0, 8)) AS o FROM hits) q
            ), tok AS (
              SELECT doc_id, unnest(toks) AS w,
                     generate_subscripts(toks, 1) AS pos
              FROM lst
            ), keep AS (
              SELECT t.doc_id, t.pos, t.w
              FROM tok t LEFT JOIN cov c
                ON c.doc_id = t.doc_id AND c.pos = t.pos
              WHERE c.pos IS NULL
            )
            SELECT b.doc_id,
                   COALESCE(k.clean_text, '') AS clean_text,
                   CAST(l.n_total - COALESCE(k.n_keep, 0) AS BIGINT)
                     AS n_removed
            FROM base b
            JOIN (SELECT doc_id, len(toks) AS n_total FROM lst) l
              USING (doc_id)
            LEFT JOIN (
              SELECT doc_id, string_agg(w, ' ' ORDER BY pos) AS clean_text,
                     count(*) AS n_keep
              FROM keep GROUP BY doc_id
            ) k USING (doc_id)
        """,
        # Stopword-profile heuristic restated: per-doc stopword counts
        # share the token-count denominator, so comparing raw counts ==
        # comparing ratios; the CASE chain encodes first-wins ties
        # (en > de > fr > es) exactly like the Python loop.
        "doc_langid": r"""
            WITH toks AS (
              SELECT doc_id,
                     lower(unnest(regexp_extract_all(text, '[a-zA-Z]+'))) AS w
              FROM documents
            ), sc AS (
              SELECT doc_id, count(*) AS n,
                sum(CASE WHEN w IN ('the','and','of','to','a','in','is',
                                    'was','for','with')
                         THEN 1 ELSE 0 END) AS en,
                sum(CASE WHEN w IN ('der','die','das','und','ist','nicht',
                                    'mit','von','zu','den')
                         THEN 1 ELSE 0 END) AS de,
                sum(CASE WHEN w IN ('le','la','les','et','est','pas','pour',
                                    'dans','une','que')
                         THEN 1 ELSE 0 END) AS fr,
                sum(CASE WHEN w IN ('el','la','los','y','es','no','por',
                                    'para','una','con')
                         THEN 1 ELSE 0 END) AS es
              FROM toks GROUP BY doc_id
            )
            SELECT d.doc_id,
              CASE WHEN regexp_matches(d.text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
                   WHEN sc.n IS NULL THEN 'und'
                   WHEN greatest(en, de, fr, es) = 0 THEN 'und'
                   WHEN en >= de AND en >= fr AND en >= es THEN 'en'
                   WHEN de >= fr AND de >= es THEN 'de'
                   WHEN fr >= es THEN 'fr'
                   ELSE 'es' END AS lang_pred
            FROM documents d LEFT JOIN sc USING (doc_id)
        """,
        # Wrapping-uint64 rolling fingerprint in SQL: FNV-1a-64 per
        # token (HUGEINT modular arithmetic — the doc_simhash_pairs
        # trick), then min over window-16 polynomial hashes via
        # list_slice + list_reduce; sign bit masked like the engine.
        # ExactSubstr-style duplicated-span counts: same token-FNV +
        # window-polynomial HUGEINT fold as doc_rolling_fp, window 8,
        # every position kept (not min); pure integer outputs.
        "doc_dupspan": r"""
            WITH t AS (
              SELECT doc_id,
                list_transform(regexp_extract_all(text, '\w+'),
                  w -> CAST(list_reduce(
                         list_prepend(CAST(14695981039346656037 AS HUGEINT),
                           list_transform(range(1, length(w) + 1),
                                          i -> CAST(unicode(w[i]) AS HUGEINT))),
                         (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                               CAST(c AS UBIGINT)) AS HUGEINT)
                                      * 1099511628211)
                                     % 18446744073709551616
                       ) AS HUGEINT)) AS hs
              FROM documents
            ), pos AS (
              SELECT doc_id,
                unnest(list_transform(range(1, len(hs) - 6),
                  j -> list_reduce(
                         list_prepend(CAST(0 AS HUGEINT),
                                      list_slice(hs, j, j + 7)),
                         (acc, h) -> (acc * 1099511628211 + h)
                                     % 18446744073709551616))) AS fp
              FROM t WHERE len(hs) >= 8
            ), agg AS (
              SELECT fp, doc_id, count(*) AS k FROM pos GROUP BY 1, 2
            ), ndoc AS (
              SELECT fp, count(*) AS nd FROM agg GROUP BY 1
            )
            SELECT a.doc_id,
                   CAST(sum(a.k) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN ndoc.nd >= 2 THEN a.k ELSE 0 END)
                        AS BIGINT) AS n_dup
            FROM agg a JOIN ndoc USING (fp)
            GROUP BY 1
        """,
        # Gopher rule bundle: every ratio cross-multiplied (integer
        # exact); stopword list shared verbatim with
        # kgflow.ops.clean.GOPHER_STOPWORDS; rtrim charset = python
        # str.rstrip's whitespace minus newline (lines are \n-split)
        "doc_gopher_rules": r"""
            WITH s AS (
              SELECT doc_id,
                     len(regexp_extract_all(lower(text), '\w+')) AS n_words,
                     length(regexp_replace(text, '\W', '', 'g')) AS word_chars,
                     len(list_distinct(list_filter(
                       regexp_extract_all(lower(text), '\w+'),
                       w -> list_contains(
                         ['the','be','to','of','and','that','have','with'],
                         w)))) AS stop_hits,
                     len(list_filter(regexp_extract_all(lower(text), '\w+'),
                       w -> regexp_full_match(w, '[0-9]+'))) AS n_numeric,
                     len(string_split(text, chr(10))) AS n_lines,
                     len(list_filter(string_split(text, chr(10)),
                       l -> rtrim(l, ' ' || chr(9) || chr(13) || chr(12)
                                  || chr(11)) LIKE '%...')) AS n_ellipsis
              FROM documents
            ), r AS (
              SELECT doc_id, n_words,
                CASE WHEN n_words >= 50 AND n_words <= 100000
                     THEN 1 ELSE 0 END AS r_wordcount,
                CASE WHEN word_chars >= 3 * n_words
                          AND word_chars <= 10 * n_words
                     THEN 1 ELSE 0 END AS r_meanlen,
                CASE WHEN stop_hits >= 1 THEN 1 ELSE 0 END AS r_stopwords,
                CASE WHEN n_numeric * 5 < n_words THEN 1 ELSE 0 END
                  AS r_numeric,
                CASE WHEN n_ellipsis * 10 < n_lines * 3 THEN 1 ELSE 0 END
                  AS r_ellipsis
              FROM s
            )
            SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
                   CAST(r_wordcount AS BIGINT) AS r_wordcount,
                   CAST(r_meanlen AS BIGINT) AS r_meanlen,
                   CAST(r_stopwords AS BIGINT) AS r_stopwords,
                   CAST(r_numeric AS BIGINT) AS r_numeric,
                   CAST(r_ellipsis AS BIGINT) AS r_ellipsis,
                   CAST(r_wordcount * r_meanlen * r_stopwords
                        * r_numeric * r_ellipsis AS BIGINT) AS pass_all
            FROM r
        """,
        # temperature mixture weights: exact int64 counts, pow/divide
        # the only floats
        "doc_mix_weights": r"""
            WITH c AS (
              SELECT source,
                     CAST(sum(len(regexp_extract_all(lower(text), '\w+')))
                          AS BIGINT) AS n_tokens
              FROM documents GROUP BY 1
            )
            SELECT source, n_tokens,
                   pow(CAST(n_tokens AS DOUBLE), 0.3)
                     / (SELECT sum(pow(CAST(n_tokens AS DOUBLE), 0.3))
                        FROM c) AS weight
            FROM c
        """,
        # Hamilton apportionment: HUGEINT products, exact floor and
        # remainder; ties rem DESC then source ASC
        "doc_sample_plan": r"""
            WITH c AS (
              SELECT source,
                     CAST(sum(len(regexp_extract_all(lower(text), '\w+')))
                          AS BIGINT) AS n_tokens
              FROM documents GROUP BY 1
            ), t AS (
              SELECT CAST(sum(n_tokens) AS HUGEINT) AS total FROM c
            ), q AS (
              SELECT source, n_tokens,
                     CAST((CAST(n_tokens AS HUGEINT) * 10000) // total
                          AS BIGINT) AS fl,
                     CAST((CAST(n_tokens AS HUGEINT) * 10000) % total
                          AS BIGINT) AS rem
              FROM c CROSS JOIN t
            ), r AS (
              SELECT source, n_tokens, fl, rem,
                     row_number() OVER (ORDER BY rem DESC, source ASC) AS rk
              FROM q
            )
            SELECT source, n_tokens,
                   CAST(fl + CASE WHEN rk <= (SELECT 10000 - sum(fl) FROM q)
                             THEN 1 ELSE 0 END AS BIGINT) AS quota
            FROM r
        """,
        # Hill tail estimator over the top-20 vocabulary frequencies;
        # rank ties break (n DESC, token ASC) like doc_vocab_topk
        "doc_zipf_alpha": r"""
            WITH t AS (
              SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS token
              FROM documents
            ), v AS (
              SELECT token, count(*) AS n FROM t GROUP BY token
            ), r AS (
              SELECT n, row_number() OVER (ORDER BY n DESC, token ASC) AS rn
              FROM v
            )
            SELECT CAST(20 AS BIGINT) AS k,
                   CAST((SELECT n FROM r WHERE rn = 21) AS BIGINT)
                     AS f_kplus1,
                   1.0 + 20.0
                     / (SELECT sum(ln(CAST(n AS DOUBLE)
                          / (SELECT CAST(n AS DOUBLE) FROM r WHERE rn = 21)))
                        FROM r WHERE rn <= 20) AS alpha
        """,
        # composed curation: Gopher rule gate (threshold 1, see
        # doc_gopher_rules) AND dup-span < 25% (cross-multiplied) AND
        # DSIR score attach — each block verbatim from its own oracle
        "doc_curation": r"""
            WITH s AS (
              SELECT doc_id,
                     len(regexp_extract_all(lower(text), '\w+')) AS n_words,
                     length(regexp_replace(text, '\W', '', 'g')) AS word_chars,
                     len(list_distinct(list_filter(
                       regexp_extract_all(lower(text), '\w+'),
                       w -> list_contains(
                         ['the','be','to','of','and','that','have','with'],
                         w)))) AS stop_hits,
                     len(list_filter(regexp_extract_all(lower(text), '\w+'),
                       w -> regexp_full_match(w, '[0-9]+'))) AS n_numeric,
                     len(string_split(text, chr(10))) AS n_lines,
                     len(list_filter(string_split(text, chr(10)),
                       l -> rtrim(l, ' ' || chr(9) || chr(13) || chr(12)
                                  || chr(11)) LIKE '%...')) AS n_ellipsis
              FROM documents
            ), keep_rules AS (
              SELECT doc_id, CAST(n_words AS BIGINT) AS n_words
              FROM s
              WHERE n_words >= 50 AND n_words <= 100000
                AND word_chars >= 3 * n_words AND word_chars <= 10 * n_words
                AND stop_hits >= 1
                AND n_numeric * 5 < n_words
                AND n_ellipsis * 10 < n_lines * 3
            ), t AS (
              SELECT doc_id,
                list_transform(regexp_extract_all(text, '\w+'),
                  w -> CAST(list_reduce(
                         list_prepend(CAST(14695981039346656037 AS HUGEINT),
                           list_transform(range(1, length(w) + 1),
                                          i -> CAST(unicode(w[i]) AS HUGEINT))),
                         (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                               CAST(c AS UBIGINT)) AS HUGEINT)
                                      * 1099511628211)
                                     % 18446744073709551616
                       ) AS HUGEINT)) AS hs
              FROM documents
            ), pos AS (
              SELECT doc_id,
                unnest(list_transform(range(1, len(hs) - 6),
                  j -> list_reduce(
                         list_prepend(CAST(0 AS HUGEINT),
                                      list_slice(hs, j, j + 7)),
                         (acc, h) -> (acc * 1099511628211 + h)
                                     % 18446744073709551616))) AS fp
              FROM t WHERE len(hs) >= 8
            ), agg AS (
              SELECT fp, doc_id, count(*) AS k FROM pos GROUP BY 1, 2
            ), ndoc AS (
              SELECT fp, count(*) AS nd FROM agg GROUP BY 1
            ), keep_spans AS (
              SELECT a.doc_id,
                     CAST(sum(a.k) AS BIGINT) AS n_grams,
                     CAST(sum(CASE WHEN ndoc.nd >= 2 THEN a.k ELSE 0 END)
                          AS BIGINT) AS n_dup
              FROM agg a JOIN ndoc USING (fp)
              GROUP BY 1
              HAVING sum(CASE WHEN ndoc.nd >= 2 THEN a.k ELSE 0 END) * 100
                     < sum(a.k) * 25
            ), tok AS (
              SELECT doc_id, source,
                     unnest(regexp_extract_all(lower(text), '\w+')) AS w
              FROM documents
            ), dt AS (
              SELECT DISTINCT w FROM tok
            ), hb AS (
              SELECT w, CAST(CAST(list_reduce(
                     list_prepend(CAST(14695981039346656037 AS HUGEINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(unicode(w[i]) AS HUGEINT))),
                     (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                           CAST(c AS UBIGINT)) AS HUGEINT)
                                  * 1099511628211)
                                 % 18446744073709551616
                   ) AS UBIGINT) % 1024 AS BIGINT) AS b
              FROM dt
            ), tw AS (
              SELECT tok.doc_id, tok.source, hb.b
              FROM tok JOIN hb USING (w)
            ), tgt AS (
              SELECT b, count(*) AS t FROM tw WHERE source = 'src0' GROUP BY 1
            ), pool AS (
              SELECT b, count(*) AS p FROM tw GROUP BY 1
            ), tot AS (
              SELECT (SELECT sum(t) FROM tgt) AS tt,
                     (SELECT sum(p) FROM pool) AS pp
            ), dsir AS (
              SELECT tw.doc_id,
                     sum(ln(CAST(coalesce(tgt.t, 0) + 1 AS DOUBLE))
                         - ln(CAST(pool.p + 1 AS DOUBLE)))
                       - count(*) * (ln(CAST(tot.tt + 1024 AS DOUBLE))
                                     - ln(CAST(tot.pp + 1024 AS DOUBLE)))
                       AS dsir_score
              FROM tw JOIN pool USING (b) LEFT JOIN tgt USING (b)
                   CROSS JOIN tot
              GROUP BY tw.doc_id, tot.tt, tot.pp
            )
            SELECT k.doc_id, k.n_words, ks.n_grams, ks.n_dup, d.dsir_score
            FROM keep_rules k
            JOIN keep_spans ks USING (doc_id)
            JOIN dsir d USING (doc_id)
        """,
        # first-occurrence novelty: same fold as doc_dupspan, owner =
        # min doc_id per gram fingerprint
        "doc_novelty": r"""
            WITH t AS (
              SELECT doc_id,
                list_transform(regexp_extract_all(text, '\w+'),
                  w -> CAST(list_reduce(
                         list_prepend(CAST(14695981039346656037 AS HUGEINT),
                           list_transform(range(1, length(w) + 1),
                                          i -> CAST(unicode(w[i]) AS HUGEINT))),
                         (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                               CAST(c AS UBIGINT)) AS HUGEINT)
                                      * 1099511628211)
                                     % 18446744073709551616
                       ) AS HUGEINT)) AS hs
              FROM documents
            ), pos AS (
              SELECT doc_id,
                unnest(list_transform(range(1, len(hs) - 6),
                  j -> list_reduce(
                         list_prepend(CAST(0 AS HUGEINT),
                                      list_slice(hs, j, j + 7)),
                         (acc, h) -> (acc * 1099511628211 + h)
                                     % 18446744073709551616))) AS fp
              FROM t WHERE len(hs) >= 8
            ), agg AS (
              SELECT fp, doc_id, count(*) AS k FROM pos GROUP BY 1, 2
            ), owner AS (
              SELECT fp, min(doc_id) AS md FROM agg GROUP BY 1
            )
            SELECT a.doc_id,
                   CAST(sum(a.k) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN a.doc_id = owner.md THEN a.k ELSE 0 END)
                        AS BIGINT) AS n_novel
            FROM agg a JOIN owner USING (fp)
            GROUP BY 1
        """,
        # DSIR hashed-unigram importance weight: FNV fold per DISTINCT
        # token (events_feature_hash trick) mod 1024, add-one smoothed
        # target ('src0') vs whole-pool bucket counts, per-doc ln sum.
        "doc_dsir_score": r"""
            WITH tok AS (
              SELECT doc_id, source,
                     unnest(regexp_extract_all(lower(text), '\w+')) AS w
              FROM documents
            ), dt AS (
              SELECT DISTINCT w FROM tok
            ), hb AS (
              SELECT w, CAST(CAST(list_reduce(
                     list_prepend(CAST(14695981039346656037 AS HUGEINT),
                       list_transform(range(1, length(w) + 1),
                                      i -> CAST(unicode(w[i]) AS HUGEINT))),
                     (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                           CAST(c AS UBIGINT)) AS HUGEINT)
                                  * 1099511628211)
                                 % 18446744073709551616
                   ) AS UBIGINT) % 1024 AS BIGINT) AS b
              FROM dt
            ), tw AS (
              SELECT tok.doc_id, tok.source, hb.b
              FROM tok JOIN hb USING (w)
            ), tgt AS (
              SELECT b, count(*) AS t FROM tw WHERE source = 'src0' GROUP BY 1
            ), pool AS (
              SELECT b, count(*) AS p FROM tw GROUP BY 1
            ), tot AS (
              SELECT (SELECT sum(t) FROM tgt) AS tt,
                     (SELECT sum(p) FROM pool) AS pp
            )
            SELECT tw.doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   sum(ln(CAST(coalesce(tgt.t, 0) + 1 AS DOUBLE))
                       - ln(CAST(pool.p + 1 AS DOUBLE)))
                     - count(*) * (ln(CAST(tot.tt + 1024 AS DOUBLE))
                                   - ln(CAST(tot.pp + 1024 AS DOUBLE)))
                     AS dsir_score
            FROM tw JOIN pool USING (b) LEFT JOIN tgt USING (b) CROSS JOIN tot
            GROUP BY tw.doc_id, tot.tt, tot.pp
        """,
        "doc_rolling_fp": r"""
            WITH t AS (
              SELECT doc_id,
                list_transform(regexp_extract_all(text, '\w+'),
                  w -> CAST(list_reduce(
                         list_prepend(CAST(14695981039346656037 AS HUGEINT),
                           list_transform(range(1, length(w) + 1),
                                          i -> CAST(unicode(w[i]) AS HUGEINT))),
                         (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                               CAST(c AS UBIGINT)) AS HUGEINT)
                                      * 1099511628211)
                                     % 18446744073709551616
                       ) AS HUGEINT)) AS hs
              FROM documents
            ), fp AS (
              SELECT doc_id,
                CASE WHEN len(hs) = 0 THEN CAST(0 AS HUGEINT)
                     WHEN len(hs) < 16 THEN list_reduce(
                       list_prepend(CAST(0 AS HUGEINT), hs),
                       (acc, h) -> (acc * 1099511628211 + h)
                                   % 18446744073709551616)
                     ELSE list_min(list_transform(range(1, len(hs) - 14),
                       j -> list_reduce(
                         list_prepend(CAST(0 AS HUGEINT),
                                      list_slice(hs, j, j + 15)),
                         (acc, h) -> (acc * 1099511628211 + h)
                                     % 18446744073709551616)))
                END AS v
              FROM t
            )
            SELECT doc_id,
                   CAST(CAST(v AS UBIGINT) &
                        CAST(9223372036854775807 AS UBIGINT) AS BIGINT) AS rfp
            FROM fp
        """,
        # Exact SQL reimplementation of kgflow.ops.dedup.simhash64:
        # FNV-1a-64 per token (list_reduce over codepoints; driver text
        # is ASCII so codepoint == byte; HUGEINT modular arithmetic for
        # the wrapping multiply), xor the splitmix seed mask for
        # seed=42, per-bit sign votes over ALL tokens (not deduped),
        # bit-63 masked — then all-pairs hamming via bit_count(xor).
        # max_hamming=3 < bands=4 ⇒ the engine's banded LSH has
        # guaranteed recall, so both sides compute the exact answer.
        "doc_simhash_pairs": r"""
            WITH tok AS (
              SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS w
              FROM documents
            ), h AS (
              SELECT doc_id,
                     CAST(xor(
                       CAST(list_reduce(
                         list_prepend(
                           CAST(14695981039346656037 AS HUGEINT),
                           list_transform(range(1, length(w) + 1),
                                          i -> CAST(unicode(w[i]) AS HUGEINT))),
                         (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                               CAST(c AS UBIGINT)) AS HUGEINT)
                                      * 1099511628211)
                                     % 18446744073709551616
                       ) AS UBIGINT),
                       CAST(17661420568835545970 AS UBIGINT)) AS UBIGINT) AS hv
              FROM tok
            ), votes AS (
              SELECT doc_id, b.b AS bit,
                     sum(CAST((hv >> CAST(b.b AS UBIGINT)) & 1 AS BIGINT)) AS ones,
                     count(*) AS t
              FROM h CROSS JOIN (SELECT unnest(range(64)) AS b) b
              GROUP BY doc_id, b.b
            ), sh AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN 2 * ones - t > 0 AND bit < 63
                                   THEN CAST(1 AS UBIGINT) << CAST(bit AS UBIGINT)
                                   ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS simhash
              FROM votes GROUP BY doc_id
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "embed_neardup": """
            WITH aug AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000 AS vec_id, embedding
              FROM embeddings WHERE vec_id < 25
            ), s AS (
              SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                     list_cosine_similarity(a.embedding, b.embedding) AS cos
              FROM aug a JOIN aug b ON a.vec_id < b.vec_id
            )
            SELECT vec_a, vec_b FROM s WHERE cos >= 0.98
        """,
        "ann_topk": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qe
              FROM embeddings ORDER BY vec_id LIMIT 10
            ), s AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qe, e.embedding) AS sim
              FROM q CROSS JOIN embeddings e
              WHERE e.vec_id <> q.query_id
            ), r AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, neighbor_id
                     ) AS rn
              FROM s
            )
            SELECT query_id, neighbor_id FROM r WHERE rn <= 5
        """,
        # Exact fixed-point Gram matrix: quantize-first (floor, matching
        # numpy floor bit-for-bit on the same doubles), then pure int64
        # sums — no float accumulation-order drift on either side.
        "embed_centroids": """
            WITH e AS (
              SELECT label,
                     generate_subscripts(embedding, 1) AS dim,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000)
                          AS BIGINT) AS xq
              FROM embeddings
            )
            SELECT label, dim, count(*)::BIGINT AS n_vecs,
                   CAST(sum(xq) AS DOUBLE)
                     / CAST(count(*) * 10000 AS DOUBLE) AS centroid
            FROM e GROUP BY label, dim
        """,
        "embed_gram": """
            WITH e AS (
              SELECT vec_id,
                     generate_subscripts(embedding, 1) AS i,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000)
                          AS BIGINT) AS xq
              FROM embeddings
            )
            SELECT a.i AS i, b.i AS j, sum(a.xq * b.xq) AS sxx
            FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i
        """,
        # nprobe == n_centroids ⇒ the IVF scan is exhaustive; same
        # oracle as ann_topk.
        "ann_ivf_exact": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qe
              FROM embeddings ORDER BY vec_id LIMIT 10
            ), s AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qe, e.embedding) AS sim
              FROM q CROSS JOIN embeddings e
              WHERE e.vec_id <> q.query_id
            ), r AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, neighbor_id
                     ) AS rn
              FROM s
            )
            SELECT query_id, neighbor_id FROM r WHERE rn <= 5
        """,
        "customer_kanon": """
            SELECT c_mktsegment, c_nationkey, count(*)::BIGINT AS n,
                   count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT))
                     ::BIGINT AS l_div,
                   count(*) >= 5 AS k_ok
            FROM customer GROUP BY 1, 2
        """,
        "lineitem_seq_audit": """
            SELECT l_orderkey, count(*)::BIGINT AS n_lines,
                   count(DISTINCT l_linenumber)::BIGINT AS n_distinct,
                   min(l_linenumber)::BIGINT AS min_ln,
                   max(l_linenumber)::BIGINT AS max_ln,
                   (count(*) = count(DISTINCT l_linenumber)
                    AND min(l_linenumber) = 1
                    AND max(l_linenumber) = count(*)) AS dense
            FROM lineitem GROUP BY 1
        """,
        # integer epoch_us (never DOUBLE epoch(): CAST rounds and can
        # push a .6-second event into the next hour)
        "events_heatmap": """
            SELECT event_type,
                   ((epoch_us(ts) // 86400000000 + 3) % 7) AS dow,
                   ((epoch_us(ts) // 3600000000) % 24) AS hour,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2, 3
        """,
        # dau + windowed-distinct wau as one hash-exact pair
        "events_stickiness": """
            WITH pres AS (
              SELECT DISTINCT event_type, user_id,
                     (epoch_us(ts) // 86400000000) AS day
              FROM events
            ), dau AS (
              SELECT event_type, day,
                     count(DISTINCT user_id)::BIGINT AS dau
              FROM pres GROUP BY 1, 2
            ), wau AS (
              SELECT p.event_type, p.day,
                     count(DISTINCT d.user_id)::BIGINT AS wau
              FROM (SELECT DISTINCT event_type, day FROM pres) p
              JOIN pres d ON d.event_type = p.event_type
                         AND d.day BETWEEN p.day - 6 AND p.day
              GROUP BY 1, 2
            )
            SELECT dau.event_type, dau.day, dau.dau, wau.wau
            FROM dau JOIN wau USING (event_type, day)
        """,
        # int-string first digits; log10 over constants only
        "orders_benford_gof": """
            WITH v AS (
              SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS x
              FROM orders WHERE floor(o_totalprice * 100) > 0
            ), d AS (
              SELECT CAST(left(CAST(x AS VARCHAR), 1) AS BIGINT) AS digit
              FROM v
            ), c AS (
              SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY 1
            ), t AS (SELECT sum(n) AS total FROM c)
            SELECT c.digit, c.n,
                   CAST(floor(t.total * log10(1 + 1.0 / c.digit)
                              * 1000000) AS BIGINT) AS n_expected_fp
            FROM c, t
        """,
        # windowed anti-semi: prior-window users LEFT JOINed against
        # current-window membership, absent rows counted
        "events_churn": """
            WITH pres AS (
              SELECT DISTINCT event_type, user_id,
                     (epoch_us(ts) // 86400000000) AS day
              FROM events
            ), present AS (SELECT DISTINCT event_type, day FROM pres),
            pri AS (
              SELECT DISTINCT p.event_type, p.day, d.user_id
              FROM present p JOIN pres d
                ON d.event_type = p.event_type
               AND d.day BETWEEN p.day - 13 AND p.day - 7
            ), cur AS (
              SELECT DISTINCT p.event_type, p.day, d.user_id
              FROM present p JOIN pres d
                ON d.event_type = p.event_type
               AND d.day BETWEEN p.day - 6 AND p.day
            )
            SELECT p.event_type, p.day,
                   CAST(count(pri.user_id) FILTER (
                     WHERE cur.user_id IS NULL) AS BIGINT) AS churned
            FROM present p
            LEFT JOIN pri ON pri.event_type = p.event_type
                         AND pri.day = p.day
            LEFT JOIN cur ON cur.event_type = pri.event_type
                         AND cur.day = pri.day
                         AND cur.user_id = pri.user_id
            GROUP BY 1, 2
        """,
        # windowed DISTINCT via presence rows + BETWEEN range join
        "events_wau": """
            WITH pres AS (
              SELECT DISTINCT event_type, user_id,
                     (epoch_us(ts) // 86400000000) AS day
              FROM events
            ), present AS (SELECT DISTINCT event_type, day FROM pres)
            SELECT p.event_type, p.day,
                   count(DISTINCT d.user_id)::BIGINT AS wau
            FROM present p JOIN pres d
              ON d.event_type = p.event_type
             AND d.day BETWEEN p.day - 6 AND p.day
            GROUP BY 1, 2
        """,
        # shift-join trailing window replayed as a BETWEEN range join
        "events_window_topk": """
            WITH dc AS (
              SELECT event_type, user_id,
                     (epoch_us(ts) // 86400000000) AS day,
                     count(*)::BIGINT AS c
              FROM events GROUP BY 1, 2, 3
            ), present AS (SELECT DISTINCT event_type, day FROM dc),
            tr AS (
              SELECT p.event_type, p.day, d.user_id,
                     CAST(sum(d.c) AS BIGINT) AS n
              FROM present p JOIN dc d
                ON d.event_type = p.event_type
               AND d.day BETWEEN p.day - 6 AND p.day
              GROUP BY 1, 2, 3
            ), r AS (
              SELECT event_type, day, user_id, n,
                     row_number() OVER (PARTITION BY event_type, day
                                        ORDER BY n DESC, user_id) AS rn
              FROM tr
            )
            SELECT event_type, day, user_id, n FROM r WHERE rn <= 3
        """,
        # the holt_smooth dense-grid CTE feeding exact OLS moment sums
        "events_trend_ols": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS day,
                     count(*)::BIGINT AS v
              FROM events GROUP BY 1, 2
            ), bounds AS (
              SELECT event_type, min(day) AS dlo, max(day) AS dhi
              FROM daily GROUP BY 1
            ), grid AS (
              SELECT event_type,
                     unnest(generate_series(dlo, dhi, INTERVAL 1 DAY))
                       AS day
              FROM bounds
            ), g AS (
              SELECT grid.event_type, coalesce(daily.v, 0) AS y,
                     row_number() OVER (PARTITION BY grid.event_type
                                        ORDER BY grid.day) - 1 AS x
              FROM grid LEFT JOIN daily USING (event_type, day)
            )
            SELECT event_type, count(*)::BIGINT AS n_days,
                   CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
                     AS num,
                   CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
                     AS den
            FROM g GROUP BY event_type
        """,
        # the same 10%-of-keyspace range over the unpartitioned table;
        # integer // matches (all values nonnegative)
        "orders_range_pruned": """
            WITH b AS (
              SELECT min(o_orderkey) AS kmin,
                     max(o_orderkey) - min(o_orderkey) AS span
              FROM orders
            )
            SELECT o.o_orderkey, o.o_custkey
            FROM orders o, b
            WHERE o.o_orderkey BETWEEN b.kmin + b.span // 10
                                   AND b.kmin + (2 * b.span) // 10
        """,
        # dominance anti-join: a part is on the frontier iff no other
        # part is ≤ on price and ≥ on size with one strict
        "part_skyline": """
            SELECT p_partkey, p_retailprice, p_size FROM part a
            WHERE NOT EXISTS (
              SELECT 1 FROM part b
              WHERE b.p_retailprice <= a.p_retailprice
                AND b.p_size >= a.p_size
                AND (b.p_retailprice < a.p_retailprice
                     OR b.p_size > a.p_size)
            )
        """,
        # latest-seq-wins change fold; LEFT JOIN shape relies on the
        # fixture FK (o_custkey ⊆ c_custkey) — see the query docstring
        "customer_cdc_state": """
            WITH ch AS (
              SELECT o_custkey AS k, o_orderkey AS seq,
                     CASE WHEN o_orderkey % 97 = 0 THEN 'D' ELSE 'U' END
                       AS op,
                     CAST(floor(o_totalprice * 100) AS BIGINT) AS val
              FROM orders
            ), latest AS (
              SELECT k, op, val,
                     row_number() OVER (PARTITION BY k ORDER BY seq DESC)
                       AS rn
              FROM ch
            ), l AS (SELECT * FROM latest WHERE rn = 1)
            SELECT c.c_custkey AS c_custkey,
                   coalesce(l.val, CAST(floor(c.c_acctbal * 100) AS BIGINT))
                     AS bal_fp
            FROM customer c LEFT JOIN l ON l.k = c.c_custkey
            WHERE l.op IS NULL OR l.op <> 'D'
        """,
        # the hash-derived sign-LSH candidate rule replayed exactly:
        # FNV-1a(±1) directions over "dim|plane|table", floor(x·1e4)
        # int64 quantization, signature bit = sign of the integer dot
        # product, candidates = bucket collision with ANY query in ANY
        # table (union semantics), exact-cosine rerank with the
        # engine's (sim DESC, neighbor_id DESC) tie order
        "ann_lsh_exact": """
            WITH s AS MATERIALIZED (
              SELECT i, p, t,
                     CASE WHEN CAST(list_reduce(
                       list_prepend(CAST(14695981039346656037 AS HUGEINT),
                         list_transform(
                           range(1, length(CAST(i AS VARCHAR) || '|'
                                           || CAST(p AS VARCHAR) || '|'
                                           || CAST(t AS VARCHAR)) + 1),
                           pp -> CAST(unicode((CAST(i AS VARCHAR) || '|'
                                     || CAST(p AS VARCHAR) || '|'
                                     || CAST(t AS VARCHAR))[pp]) AS HUGEINT))),
                       (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                             CAST(c AS UBIGINT)) AS HUGEINT)
                                    * 1099511628211)
                                   % 18446744073709551616
                     ) AS UBIGINT) & 1 = 1 THEN 1 ELSE -1 END AS sgn
              FROM (SELECT CAST(unnest(range(1, 65)) AS BIGINT) AS i) dims
              CROSS JOIN (SELECT CAST(unnest(range(1, 9)) AS BIGINT) AS p) planes
              CROSS JOIN (SELECT CAST(unnest(range(1, 3)) AS BIGINT) AS t) tabs
            ), e AS MATERIALIZED (
              SELECT vec_id,
                     CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000)
                          AS BIGINT) AS xq
              FROM embeddings
            ), sig AS MATERIALIZED (
              SELECT vec_id, t, CAST(sum(b * (1 << (p - 1))) AS BIGINT) AS bkey
              FROM (
                SELECT e.vec_id, s.t, s.p,
                       CASE WHEN sum(e.xq * s.sgn) > 0 THEN 1 ELSE 0 END AS b
                FROM e JOIN s USING (i)
                GROUP BY e.vec_id, s.t, s.p
              ) GROUP BY vec_id, t
            ), q AS (
              SELECT vec_id AS query_id, embedding AS qe
              FROM embeddings ORDER BY vec_id LIMIT 10
            ), cand AS (
              SELECT DISTINCT sig.vec_id
              FROM sig JOIN (
                SELECT s2.t, s2.bkey
                FROM sig s2 JOIN q ON s2.vec_id = q.query_id
              ) qs ON sig.t = qs.t AND sig.bkey = qs.bkey
            ), r AS (
              SELECT q.query_id, e2.vec_id AS neighbor_id,
                     row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qe, e2.embedding)
                                  DESC,
                                e2.vec_id DESC
                     ) AS rn
              FROM q CROSS JOIN embeddings e2
              JOIN cand ON cand.vec_id = e2.vec_id
              WHERE e2.vec_id <> q.query_id
            )
            SELECT query_id, neighbor_id FROM r WHERE rn <= 5
        """,
        # integer dot products end to end: score checked verbatim
        "ann_int8_exact": """
            WITH q AS (
              SELECT vec_id AS query_id FROM embeddings
              ORDER BY vec_id LIMIT 10
            ), e AS MATERIALIZED (
              SELECT vec_id,
                     CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 100)
                          AS BIGINT) AS xq
              FROM embeddings
            ), qe AS (
              SELECT q.query_id, e.i, e.xq AS qq
              FROM q JOIN e ON e.vec_id = q.query_id
            ), s AS (
              SELECT qe.query_id, e.vec_id AS neighbor_id,
                     CAST(sum(e.xq * qe.qq) AS BIGINT) AS score
              FROM e JOIN qe USING (i)
              WHERE e.vec_id <> qe.query_id
              GROUP BY 1, 2
            ), r AS (
              SELECT query_id, neighbor_id, score,
                     row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score DESC, neighbor_id DESC
                     ) AS rn
              FROM s
            )
            SELECT query_id, neighbor_id, score FROM r WHERE rn <= 5
        """,
        # both deterministic rankers replayed, overlap counted per query
        "ann_int8_recall": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qe
              FROM embeddings ORDER BY vec_id LIMIT 10
            ), e AS MATERIALIZED (
              SELECT vec_id,
                     CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 100)
                          AS BIGINT) AS xq
              FROM embeddings
            ), qe AS (
              SELECT q.query_id, e.i, e.xq AS qq
              FROM q JOIN e ON e.vec_id = q.query_id
            ), si AS (
              SELECT qe.query_id, e.vec_id AS neighbor_id,
                     CAST(sum(e.xq * qe.qq) AS BIGINT) AS score
              FROM e JOIN qe USING (i)
              WHERE e.vec_id <> qe.query_id
              GROUP BY 1, 2
            ), ri AS (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY score DESC, neighbor_id DESC) AS rn
              FROM si
            ), i8 AS (SELECT query_id, neighbor_id FROM ri WHERE rn <= 5),
            sc AS (
              SELECT q.query_id, e2.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qe, e2.embedding) AS sim
              FROM q CROSS JOIN embeddings e2
              WHERE e2.vec_id <> q.query_id
            ), rc AS (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id DESC) AS rn
              FROM sc
            ), cosk AS (SELECT query_id, neighbor_id FROM rc WHERE rn <= 5)
            SELECT q.query_id,
                   CAST(count(i8.neighbor_id) AS BIGINT) AS n_overlap
            FROM q
            LEFT JOIN (
              SELECT i8.query_id, i8.neighbor_id
              FROM i8 JOIN cosk USING (query_id, neighbor_id)
            ) i8 ON i8.query_id = q.query_id
            GROUP BY 1
        """,
        # exact-integer power iteration on the quantized scatter matrix,
        # replayed by a recursive CTE: floor(x·100) int64, v0 = ones,
        # w = A·v, adaptive shift of 4·max(digits10(max|w|)-6, 0) bits
        # per step (>> is a floor shift on both sides), 400 steps
        "embed_power_iter": """
            WITH RECURSIVE e AS MATERIALIZED (
              SELECT vec_id,
                     CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 100)
                          AS BIGINT) AS x
              FROM embeddings
            ), a AS MATERIALIZED (
              SELECT l.i AS i, r.i AS j, CAST(sum(l.x * r.x) AS BIGINT) AS aij
              FROM e l JOIN e r USING (vec_id)
              GROUP BY 1, 2
            ), arows AS MATERIALIZED (
              SELECT i, list(aij ORDER BY j) AS arow FROM a GROUP BY i
            ), amat AS MATERIALIZED (
              SELECT list(arow ORDER BY i) AS m FROM arows
            ), rec AS (
              SELECT 0 AS k,
                     list_transform(range(1, 65),
                                    x -> CAST(1 AS BIGINT)) AS v
              UNION ALL
              SELECT k + 1, list_transform(w, x -> x >> sh)
              FROM (
                SELECT k, w,
                       4 * greatest(
                         length(CAST(list_max(
                           list_transform(w, x -> abs(x))) AS VARCHAR)) - 6,
                         0) AS sh
                FROM (
                  SELECT rec.k AS k,
                         list_transform(amat.m, arow ->
                           CAST(list_sum(list_transform(range(1, 65),
                             j -> arow[j] * rec.v[j])) AS BIGINT)) AS w
                  FROM rec, amat
                  WHERE rec.k < 400
                )
              )
            )
            SELECT CAST(generate_subscripts(v, 1) AS BIGINT) AS i,
                   CAST(unnest(v) AS BIGINT) AS v
            FROM rec WHERE k = 400
        """,
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   floor(sum(l_quantity) * 10) / 10 AS sum_qty,
                   floor(sum(l_extendedprice * (1 - l_discount)) * 10) / 10
                     AS sum_revenue,
                   floor(avg(l_discount) * 1000000) / 1000000 AS avg_disc,
                   count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT o.o_custkey, c.c_name,
                   floor(sum(o.o_totalprice) * 10) / 10 AS total_spent,
                   count(*) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY o.o_custkey, c.c_name
            ORDER BY sum(o.o_totalprice) DESC, o.o_custkey
            LIMIT 10
        """,
        "events_hourly": """
            SELECT event_type,
                   date_trunc('hour', ts) AS window_start,
                   count(*) AS n,
                   sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0
                     AS sum_value
            FROM events GROUP BY event_type, date_trunc('hour', ts)
        """,
        "events_sessions": """
            WITH o AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR date_diff('microsecond', lag(ts) OVER w, ts)
                               > 1800 * 1000000
                          THEN 1 ELSE 0 END AS b
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT *, CAST(sum(b) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
              FROM o
            )
            SELECT user_id, session_seq,
                   min(ts) AS session_start, max(ts) AS session_end,
                   date_diff('second', min(ts), max(ts)) AS duration_s,
                   count(*) AS n_events,
                   sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0
                     AS sum_value
            FROM s GROUP BY user_id, session_seq
        """,
        "events_window": """
            SELECT user_id, event_id, ts,
                   CAST(row_number() OVER w AS BIGINT) AS row_number,
                   CAST(COALESCE(
                     date_diff('second', lag(ts) OVER w, ts), -1)
                     AS BIGINT) AS lag_s,
                   (sum(CAST(round(value * 10000) AS BIGINT)) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING)) / 10000.0 AS run_value
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "events_in_sessions": """
            WITH o AS (
              SELECT user_id, event_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR date_diff('microsecond', lag(ts) OVER w, ts)
                               > 1800 * 1000000
                          THEN 1 ELSE 0 END AS b
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
              SELECT *, CAST(sum(b) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
              FROM o
            ), sess AS (
              SELECT user_id, session_seq,
                     min(ts) AS session_start, max(ts) AS session_end
              FROM s GROUP BY user_id, session_seq
            )
            SELECT e.event_id, e.user_id, e.ts, x.session_seq
            FROM events e
            JOIN sess x ON e.user_id = x.user_id
                       AND e.ts BETWEEN x.session_start AND x.session_end
        """,
        "events_quantiles": """
            WITH a AS (
              SELECT quantile_disc(CAST(round(value * 100) AS BIGINT),
                                   [0.25, 0.5, 0.75, 0.875]) AS l
              FROM events
            )
            SELECT unnest([0.25, 0.5, 0.75, 0.875]) AS q,
                   unnest(l) / 100.0 AS v
            FROM a
        """,
        "events_profile": """
            SELECT 'event_id' AS "column", count(*) AS n_rows,
                   count(*) - count(event_id) AS n_null,
                   count(DISTINCT event_id) AS n_distinct,
                   CAST(min(event_id) AS DOUBLE) AS vmin,
                   CAST(max(event_id) AS DOUBLE) AS vmax
            FROM events
            UNION ALL
            SELECT 'user_id', count(*), count(*) - count(user_id),
                   count(DISTINCT user_id),
                   CAST(min(user_id) AS DOUBLE), CAST(max(user_id) AS DOUBLE)
            FROM events
            UNION ALL
            SELECT 'value', count(*), count(*) - count(value),
                   count(DISTINCT value),
                   CAST(min(value) AS DOUBLE), CAST(max(value) AS DOUBLE)
            FROM events
        """,
        "events_histogram": """
            SELECT CAST(least(greatest(floor(value / 5.0), 0), 19)
                        AS BIGINT) AS bin,
                   count(*) AS n
            FROM events GROUP BY 1
        """,
        "events_asof": """
            SELECT a.event_id, a.user_id, a.ts,
                   b.event_id AS prior_event_id, b.ts AS prior_ts,
                   date_diff('second', b.ts, a.ts) AS lag_s
            FROM (SELECT * FROM events WHERE event_type = 'purchase') a
            JOIN (SELECT * FROM events WHERE event_type = 'click') b
              ON a.user_id = b.user_id AND b.ts <= a.ts
            QUALIFY row_number() OVER (
              PARTITION BY a.event_id
              ORDER BY b.ts DESC, b.event_id DESC) = 1
        """,
        "events_sliding": """
            WITH hourly AS (
              SELECT event_type, date_trunc('hour', ts) AS window_start,
                     count(*) AS n,
                     sum(CAST(round(value * 10000) AS BIGINT)) AS sum_fp
              FROM events GROUP BY 1, 2)
            SELECT event_type, window_start, n,
                   sum(n) OVER w AS w_n,
                   (sum(sum_fp) OVER w) / 10000.0 AS w_sum_value
            FROM hourly
            WINDOW w AS (PARTITION BY event_type ORDER BY window_start
                         RANGE BETWEEN INTERVAL 2 HOURS PRECEDING
                               AND CURRENT ROW)
        """,
        "events_daily_users": """
            SELECT event_type, date_trunc('day', ts) AS day,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1, 2
        """,
        "events_pivot": """
            SELECT date_trunc('day', ts) AS day,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                     AS n_click,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                     AS n_error,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     AS n_purchase,
                   sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                     AS n_signup,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                     AS n_view
            FROM events GROUP BY 1
        """,
        "events_quantiles_by_type": """
            WITH a AS (
              SELECT event_type,
                     quantile_disc(CAST(round(value * 100) AS BIGINT),
                                   [0.25, 0.5, 0.75, 0.875]) AS l
              FROM events GROUP BY event_type
            )
            SELECT event_type,
                   unnest([0.25, 0.5, 0.75, 0.875]) AS q,
                   unnest(l) / 100.0 AS v
            FROM a
        """,
        "customers_no_big_orders": """
            SELECT c_custkey, c_name, c_acctbal FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        """,
        "customer_orders_left": """
            SELECT c.c_custkey, c.c_name,
                   COALESCE(o.n_orders, 0) AS n_orders,
                   COALESCE(o.max_order, 0.0) AS max_order
            FROM customer c
            LEFT JOIN (
              SELECT o_custkey, count(*) AS n_orders,
                     max(o_totalprice) AS max_order
              FROM orders GROUP BY o_custkey
            ) o ON c.c_custkey = o.o_custkey
        """,
        "customer_orders_full": """
            WITH a AS (
              SELECT o_custkey, count(*) AS n_y1 FROM orders
              WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                AND o_orderdate < TIMESTAMP '1996-01-01'
              GROUP BY o_custkey
            ), b AS (
              SELECT o_custkey, count(*) AS n_y2 FROM orders
              WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                AND o_orderdate < TIMESTAMP '1997-01-01'
              GROUP BY o_custkey
            )
            SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
                   COALESCE(a.n_y1, 0) AS n_y1,
                   COALESCE(b.n_y2, 0) AS n_y2
            FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
        """,
        "events_cube": """
            SELECT event_type, CAST(isodow(ts) AS VARCHAR) AS dow,
                   sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0
                     AS sum_value,
                   count(*) AS n
            FROM events
            GROUP BY CUBE(event_type, CAST(isodow(ts) AS VARCHAR))
        """,
        "events_groupsets": """
            SELECT event_type, CAST(isodow(ts) AS VARCHAR) AS dow,
                   sum(CAST(round(value * 10000) AS BIGINT)) / 10000.0
                     AS sum_value,
                   count(*) AS n
            FROM events
            GROUP BY GROUPING SETS (
              (event_type, CAST(isodow(ts) AS VARCHAR)),
              (CAST(isodow(ts) AS VARCHAR)),
              ()
            )
        """,
        "events_ranked": """
            SELECT user_id, event_id, ts,
                   CAST(rank() OVER v AS BIGINT) AS val_rank,
                   CAST(dense_rank() OVER v AS BIGINT) AS val_dense_rank,
                   CAST(COALESCE(
                     date_diff('second', ts, lead(ts) OVER w), -1)
                     AS BIGINT) AS lead_s,
                   (sum(CAST(round(value * 10000) AS BIGINT)) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) / 10000.0
                     AS mov3_value
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
                   v AS (PARTITION BY user_id
                         ORDER BY CAST(round(value * 10000) AS BIGINT) DESC)
        """,
        "events_boundary": """
            WITH r AS (
              SELECT user_id, event_id, value,
                     row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS rn_a,
                     row_number() OVER (
                       PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                     ) AS rn_d
              FROM events
            )
            SELECT user_id,
                   max(CASE WHEN rn_a = 1 THEN event_id END) AS first_event_id,
                   max(CASE WHEN rn_d = 1 THEN event_id END) AS last_event_id,
                   max(CASE WHEN rn_a = 1 THEN value END) AS first_value,
                   max(CASE WHEN rn_d = 1 THEN value END) AS last_value,
                   count(*) AS n_events
            FROM r GROUP BY user_id
        """,
        "q5_region_volume": """
            SELECT n_name,
                   sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                            AS BIGINT)) / 10000.0 AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey
              AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= DATE '1996-01-01'
              AND o_orderdate < DATE '1997-01-01'
            GROUP BY n_name
        """,
        "events_distribution": """
            SELECT user_id, event_id,
                   CAST(ntile(4) OVER w AS BIGINT) AS tile,
                   percent_rank() OVER w AS pct_rank,
                   cume_dist() OVER w AS cume_dist
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id)
        """,
        "doc_quality_filter": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(length(regexp_extract_all(text, '\w+')) AS BIGINT)
                       AS n_tokens
              FROM documents
            ), b AS (
              SELECT quantile_disc(n_tokens, 0.125) AS lo,
                     quantile_disc(n_tokens, 0.875) AS hi
              FROM t
            )
            SELECT t.doc_id, t.n_tokens FROM t, b
            WHERE t.n_tokens >= b.lo AND t.n_tokens <= b.hi
        """,
        "doc_freq_score": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '\w+')) AS token
              FROM documents
            ), tf AS (
              SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2
            ), cf AS (
              SELECT token, sum(tf) AS cf FROM tf GROUP BY 1
            )
            SELECT tf.doc_id,
                   CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
                   CAST(sum(tf.tf * cf.cf) AS BIGINT) AS freq_sum
            FROM tf JOIN cf USING (token)
            GROUP BY tf.doc_id
        """,
        # interval overlap self-join: 10-60 min purchase windows,
        # exact integer-microsecond overlap = least(e) - greatest(s)
        "events_overlap": """
            WITH iv AS (
              SELECT event_id AS id,
                     epoch_us(ts) AS s,
                     epoch_us(ts) + 600000000 * (1 + event_id % 6) AS e
              FROM events WHERE event_type = 'purchase'
            )
            SELECT least(a.id, b.id) AS id_a,
                   greatest(a.id, b.id) AS id_b,
                   least(a.e, b.e) - greatest(a.s, b.s) AS ov
            FROM iv a JOIN iv b
              ON a.id < b.id AND a.s < b.e AND b.s < a.e
        """,
        "events_intervals": """
            WITH iv AS (
              SELECT user_id, ts AS s, ts + INTERVAL 10 MINUTE AS e
              FROM events
            ), flagged AS (
              SELECT user_id, s, e,
                     CASE WHEN s > COALESCE(max(e) OVER prev,
                                            TIMESTAMP '0001-01-01')
                          THEN 1 ELSE 0 END AS f
              FROM iv
              WINDOW prev AS (PARTITION BY user_id ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING)
            ), isl AS (
              SELECT user_id, s, e,
                     sum(f) OVER (PARTITION BY user_id ORDER BY s, e
                                  ROWS UNBOUNDED PRECEDING) AS island
              FROM flagged
            )
            SELECT user_id, min(s) AS interval_start,
                   max(e) AS interval_end,
                   count(*) AS n_merged
            FROM isl GROUP BY user_id, island
        """,
        "doc_normalize": """
            WITH planted AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0
                          THEN '  Caf' || chr(101) || chr(769) || ' '
                               || chr(9) || ' menu:' || chr(10) || chr(10)
                               || text || ' ' || chr(9) || ' '
                          ELSE text END AS text
              FROM documents
            ), norm AS (
              SELECT doc_id,
                     trim(regexp_replace(nfc_normalize(text),
                                         '[ \t\n\r\f\v]+', ' ', 'g'),
                          ' ') AS text
              FROM planted
            )
            SELECT doc_id, text, length(text) AS n_chars FROM norm
        """,
        "orders_top_priority": """
            SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
              SELECT o_orderpriority, o_orderkey, o_totalprice,
                     row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders
            ) WHERE rn <= 3
        """,
        "events_intersect": """
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events WHERE event_type = 'purchase'
            INTERSECT
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events WHERE event_type = 'error'
        """,
        "events_except": """
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events WHERE event_type = 'purchase'
            EXCEPT
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events WHERE event_type = 'error'
        """,
        "orders_quality": """
            SELECT rule, n_violations FROM (
              SELECT 'date_past_horizon' AS rule,
                     count(*) FILTER (
                       o_orderdate >= TIMESTAMP '1997-01-01') AS n_violations
              FROM orders
              UNION ALL
              SELECT 'fk_orphan_custkey',
                     count(*) FILTER (o_custkey NOT IN (
                       SELECT c_custkey FROM customer))
              FROM orders
              UNION ALL
              SELECT 'nonpositive_price',
                     count(*) FILTER (o_totalprice <= 0) FROM orders
              UNION ALL
              SELECT 'null_orderdate',
                     count(*) FILTER (o_orderdate IS NULL) FROM orders
            ) ORDER BY rule
        """,
        "q3_shipping": """
            SELECT o_orderkey,
                   sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                            AS BIGINT)) / 10000.0 AS revenue,
                   o_orderdate, o_orderpriority
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING'
              AND c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate < TIMESTAMP '1998-01-01'
              AND l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY o_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "supplier_rollup_levels": """
            SELECT r.r_name, n.n_name,
                   sum(CAST(round(s.s_acctbal * 100) AS BIGINT)) / 100.0
                     AS total_acctbal,
                   count(*) AS n
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY ROLLUP(r.r_name, n.n_name)
        """,
        "supplier_rollup": """
            SELECT r.r_name,
                   floor(sum(s.s_acctbal) * 10) / 10 AS total_acctbal,
                   count(*) AS n_suppliers
            FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        # bigram adjacency counts + first-wins argmax per first token
        # (row_number window, the doc_langid tie-break convention)
        # MLE bigram LM trained on the scored corpus itself: every doc
        # bigram has pair_n >= 1, so no smoothing term and the log is
        # always finite; ln-term magnitudes ~1e0 x ~3e2 terms keep float
        # drift ~1e-13 << the 1e-6 comparator
        "doc_perplexity": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), bg AS (
              SELECT doc_id, unnest(list_transform(
                       range(1, len(w)),
                       i -> w[i] || ' ' || w[i+1])) AS p
              FROM tok
            ), d AS (
              SELECT doc_id, split_part(p, ' ', 1) AS token,
                     split_part(p, ' ', 2) AS next_token, count(*) AS c
              FROM bg GROUP BY 1, 2, 3
            ), pair AS (
              SELECT token, next_token, CAST(sum(c) AS BIGINT) AS pair_n
              FROM d GROUP BY 1, 2
            ), ctx AS (
              SELECT token, CAST(sum(pair_n) AS BIGINT) AS ctx_n
              FROM pair GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(sum(c) AS BIGINT) AS n_bigrams,
                   sum(c * (ln(CAST(pair_n AS DOUBLE))
                            - ln(CAST(ctx_n AS DOUBLE)))) AS logprob_sum
            FROM d JOIN pair USING (token, next_token) JOIN ctx USING (token)
            GROUP BY d.doc_id
        """,
        # a shared hub always has degree >= 2, so ln(d) > 0; aa float
        # drift is sums of ~1e0 terms, far inside the 1e-6 comparator
        "graph_jaccard": """
            WITH e AS (
              SELECT DISTINCT l_partkey AS hub, l_suppkey AS leaf
              FROM lineitem WHERE l_quantity >= 45
            ), deg AS (
              SELECT leaf, CAST(count(*) AS BIGINT) AS deg
              FROM e GROUP BY 1
            ), pairs AS (
              SELECT a.leaf AS u, b.leaf AS v,
                     CAST(count(*) AS BIGINT) AS cn
              FROM e a JOIN e b ON a.hub = b.hub AND a.leaf < b.leaf
              GROUP BY 1, 2
            )
            SELECT p.u, p.v, p.cn, du.deg AS deg_u, dv.deg AS deg_v,
                   CAST(p.cn AS DOUBLE) / (du.deg + dv.deg - p.cn) AS jac
            FROM pairs p
            JOIN deg du ON du.leaf = p.u
            JOIN deg dv ON dv.leaf = p.v
        """,
        "graph_adamic_adar": """
            WITH e AS (
              SELECT DISTINCT l_partkey AS z, l_suppkey AS x
              FROM lineitem WHERE l_quantity >= 45
            ), deg AS (
              SELECT z, count(*) AS d FROM e GROUP BY z
            ), p AS (
              SELECT a.x AS u, b.x AS v, deg.d
              FROM e a JOIN e b ON a.z = b.z JOIN deg ON deg.z = a.z
              WHERE a.x < b.x
            )
            SELECT u, v, CAST(count(*) AS BIGINT) AS cn,
                   sum(1.0 / ln(CAST(d AS DOUBLE))) AS aa
            FROM p GROUP BY 1, 2
        """,
        # the events_user_entropy formula over first-order transition
        # counts (lead() per user ordered by ts, event_id)
        "events_next_entropy": """
            WITH o AS (
              SELECT user_id, event_type,
                     lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS nxt
              FROM events
            ), c AS (
              SELECT event_type AS from_cat, nxt, count(*) AS c
              FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2
            )
            SELECT from_cat,
                   CAST(sum(c) AS BIGINT) AS n_transitions,
                   ln(CAST(sum(c) AS DOUBLE))
                     - sum(c * ln(CAST(c AS DOUBLE)))
                       / CAST(sum(c) AS DOUBLE) AS next_entropy
            FROM c GROUP BY from_cat
        """,
        # the 3-sigma test cross-multiplied into HUGEINT so no float
        # mean/stddev touches the decision (engine mirrors with an
        # exact big-int recheck inside its float guard band)
        "events_anomaly3s": """
            WITH q AS (
              SELECT event_id, event_type,
                     CAST(extract(hour FROM ts) AS BIGINT) AS hr,
                     CAST(floor(value * 100) AS BIGINT) AS x
              FROM events WHERE value IS NOT NULL
            ), m AS (
              SELECT event_type, hr, CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(x) AS HUGEINT) AS sx,
                     CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
              FROM q GROUP BY 1, 2
            )
            SELECT event_id, event_type, hr, x
            FROM q JOIN m USING (event_type, hr)
            WHERE n >= 2 AND (n*x - sx)*(n*x - sx) > 9*(n*sxx - sx*sx)
        """,
        # byte == char on the ASCII fixtures (engine is byte-level by
        # definition; documented in kgflow.ops.text.char_entropy)
        "doc_char_entropy": """
            WITH ch AS (
              SELECT doc_id, unnest(string_split(text, '')) AS ch
              FROM documents
            ), c AS (
              SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2
            )
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_bytes,
                   ln(CAST(sum(c) AS DOUBLE))
                     - sum(c * ln(CAST(c AS DOUBLE)))
                       / CAST(sum(c) AS DOUBLE) AS entropy
            FROM c GROUP BY doc_id
        """,
        # trigram document frequency >= 4 (min_df shared verbatim with
        # the engine call); DISTINCT cover positions union the [i, i+2]
        # intervals exactly as the engine's final exchange does
        "doc_hot_ngrams": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), tg AS (
              SELECT doc_id, i, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
              FROM tok, unnest(range(1, len(w) - 1)) AS t(i)
            ), d AS (
              SELECT g, count(DISTINCT doc_id) AS dfn FROM tg GROUP BY g
            ), hot AS (
              SELECT g FROM d WHERE dfn >= 4
            ), cov AS (
              SELECT DISTINCT doc_id, i + o AS pos
              FROM tg JOIN hot USING (g), unnest([0, 1, 2]) AS u(o)
            )
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_masked
            FROM cov GROUP BY doc_id
        """,
        # patterns shared verbatim with _BLOCKLIST; replace() counts
        # non-overlapping left-to-right occurrences, same as Arrow's
        # count_substring
        "doc_blocklist_hits": """
            WITH p AS (SELECT * FROM (VALUES
              ('merge'), ('slow join'), ('spark'), ('vector')) AS t(pattern))
            SELECT doc_id, pattern,
                   CAST((length(text) - length(replace(text, pattern, '')))
                        // length(pattern) AS BIGINT) AS n_hits
            FROM documents CROSS JOIN p
            WHERE length(text) - length(replace(text, pattern, '')) > 0
        """,
        "doc_bigram_lm": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), bg AS (
              SELECT unnest(list_transform(
                       range(1, len(w)),
                       i -> w[i] || ' ' || w[i+1])) AS p
              FROM tok
            ), c AS (
              SELECT split_part(p, ' ', 1) AS token,
                     split_part(p, ' ', 2) AS next_token,
                     count(*) AS pair_n
              FROM bg GROUP BY 1, 2
            ), r AS (
              SELECT token, next_token, pair_n,
                     row_number() OVER (
                       PARTITION BY token
                       ORDER BY pair_n DESC, next_token) AS rn
              FROM c
            )
            SELECT token, next_token, pair_n FROM r WHERE rn = 1
        """,
        # quantize-first integer moments (the embed_gram trick): every
        # sum is over exact BIGINTs, so accumulation order is moot
        "events_corr": r"""
            WITH q AS (
              SELECT event_type,
                     CAST(floor(value * 100) AS BIGINT) AS x,
                     CAST(regexp_extract(props, '\d+') AS BIGINT) AS y
              FROM events
              WHERE value IS NOT NULL AND props IS NOT NULL
            )
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM q GROUP BY event_type
        """,
        # exact higher moments: HUGEINT sums → VARCHAR (the engine
        # ships Python-int lane re-sums as the same decimal strings)
        "events_skewkurt": r"""
            WITH q AS (
              SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS q
              FROM events WHERE value IS NOT NULL
            )
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(CAST(q AS HUGEINT)) AS VARCHAR) AS s1,
                   CAST(sum(CAST(q AS HUGEINT) * q) AS VARCHAR) AS s2,
                   CAST(sum(CAST(q AS HUGEINT) * q * q) AS VARCHAR) AS s3,
                   CAST(sum(CAST(q AS HUGEINT) * q * q * q) AS VARCHAR) AS s4
            FROM q GROUP BY event_type
        """,
        "orders_benford": r"""
            WITH q AS (
              SELECT o_orderpriority,
                     CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
              FROM orders
            )
            SELECT o_orderpriority,
                   CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                   count(*) AS n
            FROM q GROUP BY 1, 2
        """,
        "events_autocorr": r"""
            WITH c AS (
              SELECT event_type, date_trunc('day', ts) AS day, count(*) AS c
              FROM events GROUP BY 1, 2
            ), p AS (
              SELECT a.event_type, a.c AS x, b.c AS y
              FROM c a JOIN c b
                ON a.event_type = b.event_type
               AND b.day = a.day + INTERVAL 1 DAY
            )
            SELECT event_type,
                   count(*) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM p GROUP BY event_type
        """,
        # winnowing: the doc_rolling_fp window-hash list, then distinct
        # minima of every 8 consecutive window hashes
        "doc_winnow": r"""
            WITH t AS (
              SELECT doc_id,
                list_transform(regexp_extract_all(text, '\w+'),
                  w -> CAST(list_reduce(
                         list_prepend(CAST(14695981039346656037 AS HUGEINT),
                           list_transform(range(1, length(w) + 1),
                                          i -> CAST(unicode(w[i]) AS HUGEINT))),
                         (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                               CAST(c AS UBIGINT)) AS HUGEINT)
                                      * 1099511628211)
                                     % 18446744073709551616
                       ) AS HUGEINT)) AS hs
              FROM documents
            ), wh AS (
              SELECT doc_id,
                CASE WHEN len(hs) < 16 THEN [list_reduce(
                       list_prepend(CAST(0 AS HUGEINT), hs),
                       (acc, h) -> (acc * 1099511628211 + h)
                                   % 18446744073709551616)]
                     ELSE list_transform(range(1, len(hs) - 14),
                       j -> list_reduce(
                         list_prepend(CAST(0 AS HUGEINT),
                                      list_slice(hs, j, j + 15)),
                         (acc, h) -> (acc * 1099511628211 + h)
                                     % 18446744073709551616))
                END AS ws
              FROM t WHERE len(hs) > 0
            ), sel AS (
              SELECT doc_id,
                CASE WHEN len(ws) <= 8 THEN [list_min(ws)]
                     ELSE list_transform(range(1, len(ws) - 6),
                       j -> list_min(list_slice(ws, j, j + 7)))
                END AS mins
              FROM wh
            )
            SELECT DISTINCT doc_id,
                   CAST(CAST(v AS UBIGINT) &
                        CAST(9223372036854775807 AS UBIGINT) AS BIGINT) AS fp
            FROM (SELECT doc_id, unnest(mins) AS v FROM sel)
        """,
        # MOSS pairs: self-join the winnow fingerprint set
        "doc_winnow_pairs": r"""
            WITH t AS (
              SELECT doc_id,
                list_transform(regexp_extract_all(text, '\w+'),
                  w -> CAST(list_reduce(
                         list_prepend(CAST(14695981039346656037 AS HUGEINT),
                           list_transform(range(1, length(w) + 1),
                                          i -> CAST(unicode(w[i]) AS HUGEINT))),
                         (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                               CAST(c AS UBIGINT)) AS HUGEINT)
                                      * 1099511628211)
                                     % 18446744073709551616
                       ) AS HUGEINT)) AS hs
              FROM documents
            ), wh AS (
              SELECT doc_id,
                CASE WHEN len(hs) < 16 THEN [list_reduce(
                       list_prepend(CAST(0 AS HUGEINT), hs),
                       (acc, h) -> (acc * 1099511628211 + h)
                                   % 18446744073709551616)]
                     ELSE list_transform(range(1, len(hs) - 14),
                       j -> list_reduce(
                         list_prepend(CAST(0 AS HUGEINT),
                                      list_slice(hs, j, j + 15)),
                         (acc, h) -> (acc * 1099511628211 + h)
                                     % 18446744073709551616))
                END AS ws
              FROM t WHERE len(hs) > 0
            ), sel AS (
              SELECT doc_id,
                CASE WHEN len(ws) <= 8 THEN [list_min(ws)]
                     ELSE list_transform(range(1, len(ws) - 6),
                       j -> list_min(list_slice(ws, j, j + 7)))
                END AS mins
              FROM wh
            ), f AS (
              SELECT DISTINCT doc_id,
                     CAST(CAST(v AS UBIGINT) &
                          CAST(9223372036854775807 AS UBIGINT) AS BIGINT) AS fp
              FROM (SELECT doc_id, unnest(mins) AS v FROM sel)
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   count(*)::BIGINT AS n_shared
            FROM f a JOIN f b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        # exact KS: cross-multiplied sup-distance over the merged
        # value histogram (HUGEINT, never an empirical-CDF float)
        "doc_ks_drift": r"""
            WITH d AS (
              SELECT n_chars AS v,
                     CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS a
              FROM documents WHERE source IN ('src1', 'src8')
            ), h AS (
              SELECT v, sum(a)::HUGEINT AS ca, sum(1 - a)::HUGEINT AS cb
              FROM d GROUP BY v
            ), c AS (
              SELECT sum(ca) OVER w AS cuma, sum(cb) OVER w AS cumb
              FROM h
              WINDOW w AS (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ), t AS (
              SELECT sum(ca) AS na, sum(cb) AS nb FROM h
            )
            SELECT CAST(t.na AS BIGINT) AS n_a,
                   CAST(t.nb AS BIGINT) AS n_b,
                   CAST(CAST(max(abs(t.nb * c.cuma - t.na * c.cumb))
                        AS HUGEINT) AS VARCHAR) AS d_num
            FROM c, t GROUP BY t.na, t.nb
        """,
        # Kaplan-Meier counts: int64-microsecond lifetimes (epoch_us,
        # never epoch-seconds doubles), reversed-window at-risk sum
        "events_survival": r"""
            WITH u AS (
              SELECT user_id, epoch_us(min(ts)) AS f, epoch_us(max(ts)) AS l
              FROM events GROUP BY 1
            ), g AS (
              SELECT max(l) AS gmax FROM u
            ), d AS (
              SELECT (l - f) // 86400000000 AS t,
                     CASE WHEN (g.gmax - l) < 7 * 86400000000
                          THEN 1 ELSE 0 END AS censored
              FROM u, g
            ), h AS (
              SELECT t, sum(1 - censored)::BIGINT AS n_event,
                     sum(censored)::BIGINT AS n_censored
              FROM d GROUP BY t
            )
            SELECT CAST(t AS BIGINT) AS t, n_event, n_censored,
                   CAST(sum(n_event + n_censored) OVER (ORDER BY t DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS n_at_risk
            FROM h
        """,
        # exact AUC: Mann-Whitney 2U over the score histogram (ties
        # count once via np*nn); HUGEINT -> VARCHAR like the power sums
        "doc_auc": r"""
            WITH d AS (
              SELECT n_chars AS s,
                     CASE WHEN source IN ('src1','src7','src11','src13')
                          THEN 1 ELSE 0 END AS y
              FROM documents
            ), h AS (
              SELECT s, sum(y)::HUGEINT AS np, sum(1 - y)::HUGEINT AS nn
              FROM d GROUP BY s
            ), c AS (
              SELECT s, np, nn,
                     coalesce(sum(nn) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cumneg
              FROM h
            )
            SELECT CAST(sum(np) AS BIGINT) AS n_pos,
                   CAST(sum(nn) AS BIGINT) AS n_neg,
                   CAST(CAST(sum(2 * np * cumneg + np * nn) AS HUGEINT)
                        AS VARCHAR) AS u2
            FROM c
        """,
        # scalar quantization: per-dim min/max are pure selections;
        # the code expression runs in DOUBLE on both engines (IEEE
        # bit-identical), so codes hash exactly
        "embed_quantize": r"""
            WITH v AS (
              SELECT vec_id,
                     generate_subscripts(embedding, 1) AS dim,
                     unnest(embedding) AS x
              FROM embeddings
            ), s AS (
              SELECT dim, min(x) AS mn, max(x) AS mx FROM v GROUP BY dim
            )
            SELECT v.vec_id, CAST(v.dim AS BIGINT) AS dim,
                   CASE WHEN s.mx > s.mn THEN
                     CAST(floor((CAST(v.x AS DOUBLE) - CAST(s.mn AS DOUBLE))
                                / (CAST(s.mx AS DOUBLE) - CAST(s.mn AS DOUBLE))
                                * 255) AS BIGINT)
                   ELSE 0 END AS code
            FROM v JOIN s USING (dim)
        """,
        # feature hashing: the same FNV-1a fold as the simhash oracle,
        # over the crossed key event_type || '|' || hour
        "events_feature_hash": r"""
            WITH k AS (
              SELECT event_id,
                     event_type || '|'
                       || CAST(CAST(extract(hour FROM ts) AS BIGINT) AS VARCHAR)
                       AS key
              FROM events
            )
            SELECT event_id,
                   CAST((CAST(list_reduce(
                     list_prepend(
                       CAST(14695981039346656037 AS HUGEINT),
                       list_transform(range(1, length(key) + 1),
                                      i -> CAST(unicode(key[i]) AS HUGEINT))),
                     (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                           CAST(c AS UBIGINT)) AS HUGEINT)
                                  * 1099511628211)
                                 % 18446744073709551616
                   ) AS UBIGINT) % 64) AS BIGINT) AS bucket
            FROM k
        """,
        # LOO target encoding: exact integer fraction per row
        "events_target_encode": r"""
            WITH s AS (
              SELECT event_type, count(*) AS n,
                     sum(CAST(floor(value * 100) AS BIGINT)) AS sq
              FROM events WHERE value IS NOT NULL GROUP BY 1
            )
            SELECT e.event_id, e.event_type,
                   s.sq - CAST(floor(e.value * 100) AS BIGINT) AS te_num,
                   CAST(s.n - 1 AS BIGINT) AS te_den
            FROM events e JOIN s USING (event_type)
            WHERE e.value IS NOT NULL
        """,
        "lineitem_fd_audit": r"""
            SELECT l_partkey, count(DISTINCT l_suppkey) AS n_dep
            FROM lineitem GROUP BY 1
            HAVING count(DISTINCT l_suppkey) > 1
        """,
        # one-pass all-pairs moment matrix: HUGEINT pair sums -> VARCHAR
        "lineitem_corr_matrix": r"""
              SELECT 'l_quantity' AS col_a, 'l_quantity' AS col_b,
                     count(*) AS n,
                     CAST(sum(CAST(floor(l_quantity*100) AS HUGEINT)) AS VARCHAR) AS sx,
                     CAST(sum(CAST(floor(l_quantity*100) AS HUGEINT)) AS VARCHAR) AS sy,
                     CAST(sum(CAST(floor(l_quantity*100) AS HUGEINT)
                              * CAST(floor(l_quantity*100) AS HUGEINT)) AS VARCHAR) AS sxy
              FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_quantity IS NOT NULL
              UNION ALL
              SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                     count(*) AS n,
                     CAST(sum(CAST(floor(l_quantity*100) AS HUGEINT)) AS VARCHAR) AS sx,
                     CAST(sum(CAST(floor(l_extendedprice*100) AS HUGEINT)) AS VARCHAR) AS sy,
                     CAST(sum(CAST(floor(l_quantity*100) AS HUGEINT)
                              * CAST(floor(l_extendedprice*100) AS HUGEINT)) AS VARCHAR) AS sxy
              FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
              UNION ALL
              SELECT 'l_quantity' AS col_a, 'l_discount' AS col_b,
                     count(*) AS n,
                     CAST(sum(CAST(floor(l_quantity*100) AS HUGEINT)) AS VARCHAR) AS sx,
                     CAST(sum(CAST(floor(l_discount*100) AS HUGEINT)) AS VARCHAR) AS sy,
                     CAST(sum(CAST(floor(l_quantity*100) AS HUGEINT)
                              * CAST(floor(l_discount*100) AS HUGEINT)) AS VARCHAR) AS sxy
              FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
              UNION ALL
              SELECT 'l_quantity' AS col_a, 'l_tax' AS col_b,
                     count(*) AS n,
                     CAST(sum(CAST(floor(l_quantity*100) AS HUGEINT)) AS VARCHAR) AS sx,
                     CAST(sum(CAST(floor(l_tax*100) AS HUGEINT)) AS VARCHAR) AS sy,
                     CAST(sum(CAST(floor(l_quantity*100) AS HUGEINT)
                              * CAST(floor(l_tax*100) AS HUGEINT)) AS VARCHAR) AS sxy
              FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_tax IS NOT NULL
              UNION ALL
              SELECT 'l_extendedprice' AS col_a, 'l_extendedprice' AS col_b,
                     count(*) AS n,
                     CAST(sum(CAST(floor(l_extendedprice*100) AS HUGEINT)) AS VARCHAR) AS sx,
                     CAST(sum(CAST(floor(l_extendedprice*100) AS HUGEINT)) AS VARCHAR) AS sy,
                     CAST(sum(CAST(floor(l_extendedprice*100) AS HUGEINT)
                              * CAST(floor(l_extendedprice*100) AS HUGEINT)) AS VARCHAR) AS sxy
              FROM lineitem
              WHERE l_extendedprice IS NOT NULL AND l_extendedprice IS NOT NULL
              UNION ALL
              SELECT 'l_extendedprice' AS col_a, 'l_discount' AS col_b,
                     count(*) AS n,
                     CAST(sum(CAST(floor(l_extendedprice*100) AS HUGEINT)) AS VARCHAR) AS sx,
                     CAST(sum(CAST(floor(l_discount*100) AS HUGEINT)) AS VARCHAR) AS sy,
                     CAST(sum(CAST(floor(l_extendedprice*100) AS HUGEINT)
                              * CAST(floor(l_discount*100) AS HUGEINT)) AS VARCHAR) AS sxy
              FROM lineitem
              WHERE l_extendedprice IS NOT NULL AND l_discount IS NOT NULL
              UNION ALL
              SELECT 'l_extendedprice' AS col_a, 'l_tax' AS col_b,
                     count(*) AS n,
                     CAST(sum(CAST(floor(l_extendedprice*100) AS HUGEINT)) AS VARCHAR) AS sx,
                     CAST(sum(CAST(floor(l_tax*100) AS HUGEINT)) AS VARCHAR) AS sy,
                     CAST(sum(CAST(floor(l_extendedprice*100) AS HUGEINT)
                              * CAST(floor(l_tax*100) AS HUGEINT)) AS VARCHAR) AS sxy
              FROM lineitem
              WHERE l_extendedprice IS NOT NULL AND l_tax IS NOT NULL
              UNION ALL
              SELECT 'l_discount' AS col_a, 'l_discount' AS col_b,
                     count(*) AS n,
                     CAST(sum(CAST(floor(l_discount*100) AS HUGEINT)) AS VARCHAR) AS sx,
                     CAST(sum(CAST(floor(l_discount*100) AS HUGEINT)) AS VARCHAR) AS sy,
                     CAST(sum(CAST(floor(l_discount*100) AS HUGEINT)
                              * CAST(floor(l_discount*100) AS HUGEINT)) AS VARCHAR) AS sxy
              FROM lineitem
              WHERE l_discount IS NOT NULL AND l_discount IS NOT NULL
              UNION ALL
              SELECT 'l_discount' AS col_a, 'l_tax' AS col_b,
                     count(*) AS n,
                     CAST(sum(CAST(floor(l_discount*100) AS HUGEINT)) AS VARCHAR) AS sx,
                     CAST(sum(CAST(floor(l_tax*100) AS HUGEINT)) AS VARCHAR) AS sy,
                     CAST(sum(CAST(floor(l_discount*100) AS HUGEINT)
                              * CAST(floor(l_tax*100) AS HUGEINT)) AS VARCHAR) AS sxy
              FROM lineitem
              WHERE l_discount IS NOT NULL AND l_tax IS NOT NULL
              UNION ALL
              SELECT 'l_tax' AS col_a, 'l_tax' AS col_b,
                     count(*) AS n,
                     CAST(sum(CAST(floor(l_tax*100) AS HUGEINT)) AS VARCHAR) AS sx,
                     CAST(sum(CAST(floor(l_tax*100) AS HUGEINT)) AS VARCHAR) AS sy,
                     CAST(sum(CAST(floor(l_tax*100) AS HUGEINT)
                              * CAST(floor(l_tax*100) AS HUGEINT)) AS VARCHAR) AS sxy
              FROM lineitem
              WHERE l_tax IS NOT NULL AND l_tax IS NOT NULL
        """,
        # CUSUM via the prefix-min identity: S_t = P_t - min(0, min
        # prefix P) with P = running sum of (count - median)
        "events_cusum": r"""
            WITH c AS (
              SELECT event_type, date_trunc('day', ts) AS day,
                     count(*)::BIGINT AS c
              FROM events GROUP BY 1, 2
            ), k AS (
              SELECT event_type, quantile_disc(c, 0.5) AS k
              FROM c GROUP BY 1
            ), p AS (
              SELECT c.event_type, c.day, k.k,
                     sum(c.c - k.k) OVER (PARTITION BY c.event_type
                                          ORDER BY c.day) AS pt,
                     count(*) OVER (PARTITION BY c.event_type) AS n_days
              FROM c JOIN k USING (event_type)
            ), s AS (
              SELECT event_type, day, k, n_days,
                     pt - least(0, min(pt) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     )) AS s
              FROM p
            ), r AS (
              SELECT event_type, k, s AS s_max, day AS day_max, n_days,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY s DESC, day ASC) AS rn
              FROM s
            )
            SELECT event_type, k, CAST(s_max AS BIGINT) AS s_max,
                   day_max, CAST(n_days AS BIGINT) AS n_days
            FROM r WHERE rn = 1
        """,
        # gaps-and-islands: day - rank(day) is constant within a
        # consecutive-day run
        "events_streaks": r"""
            WITH d AS (
              SELECT DISTINCT user_id, date_trunc('day', ts) AS day
              FROM events
            ), i AS (
              SELECT user_id,
                     CAST(day AS DATE)
                     - CAST(row_number() OVER (PARTITION BY user_id
                                               ORDER BY day) AS INTEGER)
                       AS grp
              FROM d
            ), l AS (
              SELECT user_id, grp, count(*)::BIGINT AS len
              FROM i GROUP BY 1, 2
            )
            SELECT user_id,
                   CAST(sum(len) AS BIGINT) AS n_active_days,
                   CAST(max(len) AS BIGINT) AS max_streak
            FROM l GROUP BY user_id
        """,
        # the engine's symmetric-deletion blocking is recall-complete
        # for lev<=2, so the brute-force SQL join is the exact oracle
        "doc_vocab_editdist": r"""
            WITH t AS (
              SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS token
              FROM documents
            ), v AS (
              SELECT token FROM t
              WHERE regexp_matches(token, '^[a-z]+$')
                AND length(token) BETWEEN 5 AND 20
              GROUP BY token HAVING count(*) >= 2
            ), aug AS (
              SELECT DISTINCT token FROM (
                SELECT token FROM v
                UNION ALL SELECT token || 'x' FROM v
                UNION ALL SELECT substr(token, 2) FROM v
              )
            )
            SELECT a.token AS tok_a, b.token AS tok_b,
                   CAST(levenshtein(a.token, b.token) AS BIGINT) AS dist
            FROM aug a JOIN aug b
              ON a.token < b.token
             AND abs(length(a.token) - length(b.token)) <= 2
            WHERE levenshtein(a.token, b.token) <= 2
        """,
        # integer priority sampling: FNV1a(doc_id) folded in HUGEINT
        # (the events_value_sketch fold) integer-divided by the weight
        "doc_weighted_sample": """
            WITH h AS (
              SELECT doc_id, n_chars,
                CAST(list_reduce(
                  list_prepend(CAST(14695981039346656037 AS HUGEINT),
                    list_transform(
                      range(1, length(CAST(doc_id AS VARCHAR)) + 1),
                      j -> CAST(unicode(CAST(doc_id AS VARCHAR)[j])
                                AS HUGEINT))),
                  (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                        CAST(c AS UBIGINT)) AS HUGEINT)
                               * 1099511628211) % 18446744073709551616
                ) AS UBIGINT) AS hv
              FROM documents
            )
            SELECT doc_id, n_chars
            FROM h
            ORDER BY hv // CAST(n_chars AS UBIGINT), doc_id
            LIMIT 100
        """,
        # same co-activity cells as events_triangles, reduced to the
        # per-user degree then the (degree, n_nodes) histogram
        "events_degree_hist": """
            WITH cells AS (
              SELECT DISTINCT user_id, event_type,
                     date_trunc('hour', ts) AS w
              FROM events
            ), e AS (
              SELECT DISTINCT c1.user_id AS u, c2.user_id AS v
              FROM cells c1 JOIN cells c2
                ON c1.event_type = c2.event_type AND c1.w = c2.w
               AND c1.user_id < c2.user_id
            ), und AS (
              SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
            ), deg AS (
              SELECT node, count(*) AS degree FROM und GROUP BY node
            )
            SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
        """,
        # adjacent-event pairs via the (ts, event_id) total order —
        # the same ordering convention as events_gap_quantiles
        "events_transitions": """
            WITH s AS (
              SELECT lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS from_cat,
                     event_type AS to_cat
              FROM events
            )
            SELECT from_cat, to_cat, count(*) AS n
            FROM s WHERE from_cat IS NOT NULL
            GROUP BY from_cat, to_cat
        """,
        # distinct (basket, item) support counts + marginals; the
        # engine's tagged-union exchange reduces to these three CTEs
        # association rules: integer supports from distinct baskets,
        # both rule directions, single IEEE divisions on each side
        # Morton interleave in SQL: per bit b of k=2 columns, set
        # output bit b*2+ci; epoch seconds floor-divide exactly
        "events_zorder": """
            WITH q AS (
              SELECT event_id,
                     (user_id % 1024)::BIGINT AS uid,
                     ((epoch_us(ts) // 1000000) // 3600 % 1024)::BIGINT
                       AS hod
              FROM events
            )
            SELECT event_id,
                   CAST(
                     list_sum(list_transform(range(10),
                       b -> (((uid >> b) & 1) << (b * 2))
                            + (((hod >> b) & 1) << (b * 2 + 1))))
                     AS BIGINT) AS zval
            FROM q
        """,
        "events_basket_rules": """
            WITH b AS (
              SELECT DISTINCT user_id AS u, event_type AS i FROM events
            ), nbk AS (
              SELECT count(DISTINCT u) AS nb FROM b
            ), s AS (
              SELECT i, count(*) AS n_i FROM b GROUP BY i
            ), p AS (
              SELECT a.i AS ia, c.i AS ib, count(*) AS n_ab
              FROM b a JOIN b c ON a.u = c.u AND a.i < c.i
              GROUP BY 1, 2
            ), r AS (
              SELECT ia AS ante, ib AS cons, n_ab FROM p
              UNION ALL
              SELECT ib, ia, n_ab FROM p
            )
            SELECT r.ante, r.cons,
                   CAST(r.n_ab AS BIGINT) AS n_both,
                   CAST(sa.n_i AS BIGINT) AS n_ante,
                   CAST(r.n_ab AS DOUBLE) / sa.n_i AS confidence,
                   CAST(r.n_ab AS DOUBLE) * nbk.nb / (sa.n_i * sc.n_i)
                     AS lift
            FROM r
            JOIN s sa ON sa.i = r.ante
            JOIN s sc ON sc.i = r.cons
            CROSS JOIN nbk
        """,
        "events_basket_pairs": """
            WITH bi AS (
              SELECT DISTINCT user_id AS basket, event_type AS item
              FROM events
            ), nb AS (
              SELECT count(DISTINCT basket) AS n_baskets FROM bi
            ), m AS (
              SELECT item, count(*) AS n_item FROM bi GROUP BY item
            ), p AS (
              SELECT a.item AS item_a, b.item AS item_b,
                     count(*) AS n_ab
              FROM bi a JOIN bi b
                ON a.basket = b.basket AND a.item < b.item
              GROUP BY 1, 2
            )
            SELECT p.item_a, p.item_b,
                   ma.n_item AS n_a, mb.n_item AS n_b,
                   p.n_ab, nb.n_baskets
            FROM p
            JOIN m ma ON ma.item = p.item_a
            JOIN m mb ON mb.item = p.item_b
            CROSS JOIN nb
        """,
        "q4_priority": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01'
              AND EXISTS (
                SELECT 1 FROM lineitem l
                WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
            GROUP BY o_orderpriority
        """,
        # same planted contact lines as the engine (ids %13 in {2,7});
        # DuckDB regexes match the engine's Python patterns verbatim
        "doc_extract_spans": r"""
            WITH aug AS (
              SELECT doc_id,
                     CASE
                       WHEN doc_id % 13 = 2 THEN text
                         || ' contact: user' || doc_id || '@example.com'
                       WHEN doc_id % 13 = 7 THEN text
                         || ' see http://ex' || doc_id || '.example/p'
                       ELSE text
                     END AS text
              FROM documents
            )
            SELECT doc_id, 'email' AS kind,
                   unnest(regexp_extract_all(text, '[\w.]+@[\w.]+')) AS match
            FROM aug
            UNION ALL
            SELECT doc_id, 'url' AS kind,
                   unnest(regexp_extract_all(text, 'https?://[^\s]+')) AS match
            FROM aug
        """,
        # 7-day buckets anchored at 2024-01-01 on BOTH sides — no
        # locale week-start; ratio is one exact int/int double division
        "events_weekly_trend": """
            WITH w AS (
              SELECT event_type,
                     date_diff('day', TIMESTAMP '2024-01-01', ts) // 7
                       AS wk,
                     count(*) AS n
              FROM events GROUP BY 1, 2
            ), l AS (
              SELECT event_type, wk, n,
                     lag(n)  OVER (PARTITION BY event_type ORDER BY wk)
                       AS prev_n,
                     lag(wk) OVER (PARTITION BY event_type ORDER BY wk)
                       AS prev_wk
              FROM w
            )
            SELECT event_type,
                   TIMESTAMP '2024-01-01' + INTERVAL (wk * 7) DAY
                     AS week_start,
                   n, prev_n, n / prev_n AS ratio
            FROM l WHERE prev_wk = wk - 1
        """,
        # the doc_weighted_sample HUGEINT FNV fold, ranked per language
        "doc_lang_sample": """
            WITH h AS (
              SELECT lang, doc_id, n_chars,
                CAST(list_reduce(
                  list_prepend(CAST(14695981039346656037 AS HUGEINT),
                    list_transform(
                      range(1, length(CAST(doc_id AS VARCHAR)) + 1),
                      j -> CAST(unicode(CAST(doc_id AS VARCHAR)[j])
                                AS HUGEINT))),
                  (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                        CAST(c AS UBIGINT)) AS HUGEINT)
                               * 1099511628211) % 18446744073709551616
                ) AS UBIGINT) AS hv
              FROM documents
            ), r AS (
              SELECT lang, doc_id, n_chars,
                     row_number() OVER (
                       PARTITION BY lang
                       ORDER BY hv // CAST(n_chars AS UBIGINT), doc_id
                     ) AS rn
              FROM h
            )
            SELECT lang, doc_id, n_chars FROM r WHERE rn <= 20
        """,
        "events_new_users": """
            WITH f AS (
              SELECT user_id, min(date_trunc('day', ts)) AS d
              FROM events GROUP BY user_id
            ), c AS (
              SELECT d, count(*) AS n_new FROM f GROUP BY d
            )
            SELECT d AS day, n_new,
                   CAST(sum(n_new) OVER (ORDER BY d) AS BIGINT) AS cum_users
            FROM c
        """,
        "events_adoption": """
            WITH f AS (
              SELECT event_type, user_id, min(date_trunc('day', ts)) AS d
              FROM events GROUP BY event_type, user_id
            ), c AS (
              SELECT event_type, d, count(*) AS n_new
              FROM f GROUP BY event_type, d
            )
            SELECT event_type, d AS day, n_new,
                   CAST(sum(n_new) OVER (
                     PARTITION BY event_type ORDER BY d) AS BIGINT)
                     AS cum_users
            FROM c
        """,
        # nearest-rank quantile of fixed-point totals (quantile_disc on
        # BIGINT, the grouped_quantiles convention), then one int/int
        # double division for the share
        "orders_concentration": """
            WITH t AS (
              SELECT o_custkey,
                     sum(CAST(round(o_totalprice * 10000) AS BIGINT)) AS fp
              FROM orders GROUP BY o_custkey
            ), q AS (
              SELECT quantile_disc(fp, 0.875) AS cut FROM t
            )
            SELECT max(q.cut) / 10000.0 AS cut_value,
                   CAST(sum(CASE WHEN t.fp >= q.cut THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_top,
                   count(*) AS n_customers,
                   CAST(sum(CASE WHEN t.fp >= q.cut THEN t.fp ELSE 0 END)
                        AS BIGINT)
                     / CAST(sum(t.fp) AS BIGINT) AS top_share
            FROM t CROSS JOIN q
        """,
        "part_brand_revenue": """
            SELECT p.p_brand,
                   sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                  * 10000) AS BIGINT)) / 10000.0 AS revenue,
                   sum(CAST(round(l.l_quantity * 100) AS BIGINT)) / 100.0
                     AS sum_qty,
                   count(*) AS n_items
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand
        """,
        "q6_revenue": """
            SELECT sum(CAST(round(l_extendedprice * l_discount * 10000)
                            AS BIGINT)) / 10000.0 AS revenue,
                   count(*) AS n_items
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 25
        """,
        # first row per (user, type, day) under the (ts, event_id)
        # total order — the engine's semigroup-min winners
        "events_dedup_day": """
            WITH r AS (
              SELECT user_id, event_type,
                     date_trunc('day', ts) AS win, event_id, ts,
                     row_number() OVER (
                       PARTITION BY user_id, event_type,
                                    date_trunc('day', ts)
                       ORDER BY ts, event_id) AS rn
              FROM events
            )
            SELECT user_id, event_type, win, event_id, ts
            FROM r WHERE rn = 1
        """,
        # sliding-window distinct: day d counts users active in
        # [d-6, d]; windows restricted to days present in the data
        "events_rolling_dau": """
            WITH ud AS (
              SELECT DISTINCT date_trunc('day', ts) AS d, user_id
              FROM events
            ), days AS (
              SELECT DISTINCT d FROM ud
            )
            SELECT days.d AS win_day,
                   count(DISTINCT ud.user_id) AS n_users
            FROM days JOIN ud
              ON ud.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
            GROUP BY days.d
        """,
        "q10_returns": """
            SELECT c.c_custkey, c.c_name,
                   sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                  * 10000) AS BIGINT)) / 10000.0 AS revenue,
                   c.c_acctbal, n.n_name
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE l.l_returnflag = 'R'
            GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
            ORDER BY revenue DESC, c.c_custkey
            LIMIT 20
        """,
        # identical to doc_checksum: the round-trip must reproduce the
        # parquet originals' fingerprint bit-exactly
        "doc_csv_roundtrip": """
            WITH h AS (
              SELECT
                CAST(list_reduce(
                  list_prepend(CAST(14695981039346656037 AS HUGEINT),
                    list_transform(
                      range(1, length(CAST(doc_id AS VARCHAR) || '|'
                                      || CAST(n_chars AS VARCHAR)) + 1),
                      j -> CAST(unicode((CAST(doc_id AS VARCHAR) || '|'
                                         || CAST(n_chars AS VARCHAR))[j])
                                AS HUGEINT))),
                  (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                        CAST(c AS UBIGINT)) AS HUGEINT)
                               * 1099511628211) % 18446744073709551616
                ) AS UBIGINT) AS hv
              FROM documents
            )
            SELECT count(*) AS n_rows,
                   CAST(sum(CAST(hv AS HUGEINT))
                        % 18446744073709551616 AS UBIGINT) AS checksum
            FROM h
        """,
        "q13_custdist": """
            SELECT c_count, count(*) AS custdist
            FROM (
              SELECT c.c_custkey, count(o.o_custkey) AS c_count
              FROM customer c
              LEFT JOIN orders o ON o.o_custkey = c.c_custkey
              GROUP BY c.c_custkey
            )
            GROUP BY c_count
        """,
        # same per-row ROUND(...*1e4) fixed-point quantization as the
        # engine, so the two int sums and the final double divisions
        # are bit-identical
        "q14_promo": """
            WITH l AS (
              SELECT l_partkey,
                     CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000)
                          AS BIGINT) AS fp
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-09-01'
                AND l_shipdate < TIMESTAMP '1997-10-01'
            ), s AS (
              SELECT
                CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN l.fp ELSE 0 END)
                     AS BIGINT) AS pf,
                CAST(sum(l.fp) AS BIGINT) AS tf
              FROM l JOIN part p ON p.p_partkey = l.l_partkey
            )
            SELECT CAST(pf AS DOUBLE) / 10000.0 AS promo_revenue,
                   CAST(tf AS DOUBLE) / 10000.0 AS total_revenue,
                   100.0 * CAST(pf AS DOUBLE) / CAST(tf AS DOUBLE)
                     AS promo_share_pct
            FROM s
        """,
        "q15_top_supplier": """
            WITH r AS (
              SELECT l_suppkey AS s_suppkey,
                     CAST(sum(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                         * 10000) AS BIGINT)) AS BIGINT) AS fp
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1997-07-01'
              GROUP BY 1
            )
            SELECT r.s_suppkey, s.s_name,
                   CAST(fp AS DOUBLE) / 10000.0 AS total_revenue
            FROM r JOIN supplier s ON s.s_suppkey = r.s_suppkey
            WHERE fp = (SELECT max(fp) FROM r)
        """,
        "q18_big_orders": """
            WITH big AS (
              SELECT l_orderkey AS o_orderkey,
                     CAST(sum(CAST(ROUND(l_quantity * 100) AS BIGINT))
                          AS BIGINT) AS qty_fp
              FROM lineitem
              GROUP BY 1
              HAVING sum(CAST(ROUND(l_quantity * 100) AS BIGINT)) > 30000
            )
            SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
                   o.o_totalprice,
                   CAST(qty_fp AS DOUBLE) / 100.0 AS sum_qty
            FROM big
            JOIN orders o ON o.o_orderkey = big.o_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
        """,
        # qty_fp·5·n < Σqty_fp replaces the float 0.2·avg on BOTH sides
        # — the compare is integer-exact, so the row set is identical
        "q17_small_qty": """
            WITH s AS (
              SELECT l_partkey, count(*) AS n,
                     CAST(sum(CAST(ROUND(l_quantity * 100) AS BIGINT))
                          AS BIGINT) AS sum_qfp
              FROM lineitem GROUP BY 1
            ), q AS (
              SELECT
                CAST(sum(CAST(ROUND(l.l_extendedprice * 10000) AS BIGINT))
                     AS BIGINT) AS pf,
                count(*) AS n_items
              FROM lineitem l JOIN s ON s.l_partkey = l.l_partkey
              WHERE CAST(ROUND(l.l_quantity * 100) AS BIGINT) * 5 * s.n
                    < s.sum_qfp
            )
            SELECT CAST(pf AS DOUBLE) / 10000.0 / 7.0 AS avg_yearly,
                   n_items
            FROM q
        """,
        # bal_fp·n_pos > Σbal_fp is the integer-exact form of
        # c_acctbal > avg(positive balances)
        "q22_dormant": """
            WITH b AS (
              SELECT count(*) AS n,
                     CAST(sum(CAST(ROUND(c_acctbal * 100) AS BIGINT))
                          AS BIGINT) AS s
              FROM customer
              WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > 0
            ), rich AS (
              SELECT c.c_custkey, c.c_nationkey,
                     CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS fp
              FROM customer c, b
              WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * b.n > b.s
                AND NOT EXISTS (
                  SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
            )
            SELECT n.n_name, count(*) AS numcust,
                   CAST(CAST(sum(fp) AS BIGINT) AS DOUBLE) / 100.0
                     AS totacctbal
            FROM rich JOIN nation n ON n.n_nationkey = rich.c_nationkey
            GROUP BY n.n_name
        """,
        "q7_nation_volume": """
            SELECT n1.n_name AS supp_nation,
                   n2.n_name AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   sum(CAST(round(l_extendedprice * (1 - l_discount)
                                  * 10000) AS BIGINT)) / 10000.0
                     AS revenue
            FROM supplier s
            JOIN lineitem l ON s.s_suppkey = l.l_suppkey
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
            JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
            WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
                OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
              AND l.l_shipdate >= DATE '1995-01-01'
              AND l.l_shipdate <  DATE '1997-01-01'
            GROUP BY 1, 2, 3
        """,
        # int64 fixed-point revenue sums in both engines; the per-year
        # division is the single float op (ulp-bounded)
        "q8_market_share": """
            WITH base AS (
              SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                     CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                * 10000) AS BIGINT) AS rev_fp,
                     s.s_nationkey
              FROM lineitem l
              JOIN orders o   ON o.o_orderkey = l.l_orderkey
              JOIN customer c ON c.c_custkey = o.o_custkey
              JOIN supplier s ON s.s_suppkey = l.l_suppkey
              JOIN part p     ON p.p_partkey = l.l_partkey
              JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
              JOIN region r   ON r.r_regionkey = nc.n_regionkey
              WHERE p.p_type = 'PROMO'
                AND r.r_name = 'ASIA'
                AND o.o_orderdate >= DATE '1995-01-01'
                AND o.o_orderdate <  DATE '1998-01-01'
            )
            SELECT o_year,
                   CAST(sum(CASE WHEN s_nationkey =
                       (SELECT n_nationkey FROM nation
                        WHERE n_name = 'NATION_3')
                     THEN rev_fp ELSE 0 END) AS DOUBLE)
                   / CAST(sum(rev_fp) AS DOUBLE) AS mkt_share
            FROM base
            GROUP BY o_year
        """,
        "q12_late_priority": """
            SELECT CASE WHEN date_diff('day', o.o_orderdate,
                                       l.l_shipdate) > 365
                        THEN 'late' ELSE 'ontime' END AS ship_bucket,
                   CAST(sum(CASE WHEN o.o_orderpriority IN
                              ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT)
                     AS high_line_count,
                   CAST(sum(CASE WHEN o.o_orderpriority IN
                              ('1-URGENT', '2-HIGH')
                            THEN 0 ELSE 1 END) AS BIGINT)
                     AS low_line_count
            FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
            GROUP BY 1
        """,
        # unique-slowest-supplier over >=2-supplier orders: window
        # max/count over per-(order,supplier) ship maxima
        "q21_slowest_supplier": """
            WITH lmax AS (
              SELECT l_orderkey, l_suppkey, max(l_shipdate) AS smax
              FROM lineitem GROUP BY 1, 2
            ), w1 AS (
              SELECT *,
                     max(smax) OVER (PARTITION BY l_orderkey) AS omax,
                     count(*) OVER (PARTITION BY l_orderkey) AS nsupp
              FROM lmax
            ), w2 AS (
              SELECT *,
                     sum(CASE WHEN smax = omax THEN 1 ELSE 0 END)
                       OVER (PARTITION BY l_orderkey) AS nmax
              FROM w1
            )
            SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM w2 JOIN supplier s ON s.s_suppkey = w2.l_suppkey
            WHERE w2.nsupp >= 2 AND w2.nmax = 1 AND w2.smax = w2.omax
            GROUP BY s.s_name
        """,
        # cheapest EUROPE supplier per part; cost = min line price in
        # int64 cents, ties broken by smallest suppkey (row_number)
        "q2_min_cost_supplier": """
            WITH cost AS (
              SELECT l.l_partkey, l.l_suppkey,
                     min(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                       AS cost_fp
              FROM lineitem l
              JOIN supplier s ON s.s_suppkey = l.l_suppkey
              JOIN nation n   ON n.n_nationkey = s.s_nationkey
              JOIN region r   ON r.r_regionkey = n.n_regionkey
              WHERE r.r_name = 'EUROPE'
              GROUP BY 1, 2
            ), ranked AS (
              SELECT *, row_number() OVER (
                       PARTITION BY l_partkey
                       ORDER BY cost_fp, l_suppkey) AS rn
              FROM cost
            )
            SELECT c.l_partkey AS p_partkey,
                   CAST(c.cost_fp AS DOUBLE) / 100.0 AS cost,
                   s.s_name, n.n_name, s.s_acctbal
            FROM ranked c
            JOIN supplier s ON s.s_suppkey = c.l_suppkey
            JOIN nation n   ON n.n_nationkey = s.s_nationkey
            WHERE c.rn = 1
        """,
        # profit = revenue - retailprice*qty in int64 1e-4 fixed point
        # (quantity integral in this corpus), ONE closing division
        "q9_product_profit": """
            SELECT n.n_name,
                   CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(sum(
                     CAST(round(l.l_extendedprice * (1 - l.l_discount)
                                * 10000) AS BIGINT)
                     - CAST(round(p.p_retailprice * 10000) AS BIGINT)
                       * CAST(l.l_quantity AS BIGINT)
                   ) AS DOUBLE) / 10000.0 AS sum_profit
            FROM lineitem l
            JOIN orders o   ON o.o_orderkey = l.l_orderkey
            JOIN part p     ON p.p_partkey = l.l_partkey
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n   ON n.n_nationkey = s.s_nationkey
            WHERE p.p_name LIKE '%widget%'
            GROUP BY 1, 2
        """,
        # importance bar = 110% of the MEAN part value (scale-free);
        # HUGEINT casts keep the threshold compare exact at any scale
        "q11_important_parts": """
            WITH v AS (
              SELECT l.l_partkey,
                     sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                       AS val_fp
              FROM lineitem l
              JOIN supplier s ON s.s_suppkey = l.l_suppkey
              JOIN nation n   ON n.n_nationkey = s.s_nationkey
              JOIN region r   ON r.r_regionkey = n.n_regionkey
              WHERE r.r_name = 'EUROPE'
              GROUP BY 1
            )
            SELECT l_partkey AS p_partkey,
                   CAST(val_fp AS DOUBLE) / 100.0 AS value
            FROM v
            WHERE 10 * CAST((SELECT count(*) FROM v) AS HUGEINT)
                     * CAST(val_fp AS HUGEINT)
                > 11 * CAST((SELECT sum(val_fp) FROM v) AS HUGEINT)
        """,
        # strict majority of a matching part's 1996 shipped quantity
        # (int64 1e-2 fixed point); distinct suppliers + name attach
        "q20_excess_share": """
            WITH pq AS (
              SELECT l_partkey, l_suppkey,
                     sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sq
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE p_name LIKE '%widget%'
                AND l_shipdate >= DATE '1996-01-01'
                AND l_shipdate <  DATE '1997-01-01'
              GROUP BY 1, 2
            ), tot AS (
              SELECT l_partkey, sum(sq) AS tq FROM pq GROUP BY 1
            ), win AS (
              SELECT DISTINCT pq.l_suppkey
              FROM pq JOIN tot USING (l_partkey)
              WHERE 2 * CAST(pq.sq AS HUGEINT) > tot.tq
            )
            SELECT s.s_name, n.n_name
            FROM win
            JOIN supplier s ON s.s_suppkey = win.l_suppkey
            JOIN nation n   ON n.n_nationkey = s.s_nationkey
        """,
        # BFS min-hop ≡ recursive CTE with a hop bound: UNION dedups
        # (node, hop) pairs so the recursion terminates at hop 4, and
        # min(hop) per node is exactly the BFS distance ≤ 4
        "graph_bfs_hops": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT l_partkey * 2 AS src,
                              l_suppkey * 2 + 1 AS dst
              FROM lineitem WHERE l_quantity >= 45
            ), ue AS (
              SELECT src, dst FROM e
              UNION ALL
              SELECT dst, src FROM e
            ), seed AS (
              SELECT least(min(src), min(dst)) AS s FROM ue
            ), bfs(node, hop) AS (
              SELECT s, 0 FROM seed
              UNION
              SELECT ue.dst, bfs.hop + 1
              FROM bfs JOIN ue ON ue.src = bfs.node
              WHERE bfs.hop < 4
            )
            SELECT node, min(hop) AS hop FROM bfs GROUP BY node
        """,
        # weighted SSSP over <=4-hop paths: UNION dedups (node, dist,
        # hop) states so the bounded recursion terminates; min(dist)
        # per node is exactly the Bellman-Ford 4-round distance
        "graph_sssp": """
            WITH RECURSIVE e AS (
              SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
                     min(1 + CAST(round(l_quantity) AS BIGINT) % 5) AS w
              FROM lineitem WHERE l_quantity >= 45 GROUP BY 1, 2
            ), ue AS (
              SELECT src, dst, w FROM e
              UNION ALL
              SELECT dst, src, w FROM e
            ), seed AS (
              SELECT least(min(src), min(dst)) AS s FROM ue
            ), walk(node, dist, hop) AS (
              SELECT s, CAST(0 AS BIGINT), 0 FROM seed
              UNION
              SELECT ue.dst, walk.dist + ue.w, walk.hop + 1
              FROM walk JOIN ue ON ue.src = walk.node
              WHERE walk.hop < 4
            )
            SELECT node, min(dist) AS dist FROM walk GROUP BY node
        """,
        # bounded transitive closure: UNION dedups (src, dst, hops)
        # states so the hop-bounded recursion terminates on cycles;
        # min(hops) per pair = BFS-layer shortest path, exactly the
        # engine's anti-join-per-round semantics
        # eccentricity: the graph_closeness closure with MAX(h)
        "graph_eccentricity": """
            WITH RECURSIVE e0 AS (
              SELECT DISTINCT (l_partkey % 61)::BIGINT AS src,
                              (l_suppkey % 61)::BIGINT AS dst
              FROM lineitem WHERE l_quantity >= 49
            ), e AS (
              SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
            ), r(a, b, h) AS (
              SELECT src, dst, 1 FROM e
              UNION
              SELECT r.a, e2.dst, r.h + 1
              FROM r JOIN e e2 ON e2.src = r.b
              WHERE r.h < 61
            ), d AS (
              SELECT a, b, min(h) AS h FROM r WHERE a <> b GROUP BY a, b
            )
            SELECT a AS node, CAST(max(h) AS BIGINT) AS ecc
            FROM d GROUP BY a
        """,
        # closeness: min-hop closure bounded by V=61 (UNION dedups
        # (a, b, h) states so cycles terminate), then integer sums and
        # ONE double division — IEEE-identical to the engine
        "graph_closeness": """
            WITH RECURSIVE e0 AS (
              SELECT DISTINCT (l_partkey % 61)::BIGINT AS src,
                              (l_suppkey % 61)::BIGINT AS dst
              FROM lineitem WHERE l_quantity >= 49
            ), e AS (
              SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0
            ), r(a, b, h) AS (
              SELECT src, dst, 1 FROM e
              UNION
              SELECT r.a, e2.dst, r.h + 1
              FROM r JOIN e e2 ON e2.src = r.b
              WHERE r.h < 61
            ), d AS (
              SELECT a, b, min(h) AS h FROM r WHERE a <> b GROUP BY a, b
            )
            SELECT a AS node,
                   CAST(count(*) AS BIGINT) AS n_reached,
                   CAST(sum(h) AS BIGINT) AS total_dist,
                   CAST(count(*) AS DOUBLE) / CAST(sum(h) AS DOUBLE)
                     AS closeness
            FROM d GROUP BY a
        """,
        # deterministic walk corpus: the neighbor pick is an LCG mix
        # of (walk_id, step) mod 2^64 mod out-degree over dst-sorted
        # ranks — constants shared VERBATIM with kgflow WALK_A/B/C
        "graph_walks": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT (l_partkey % 61)::BIGINT AS src,
                              (l_suppkey % 61)::BIGINT AS dst
              FROM lineitem WHERE l_quantity >= 49
            ), adj AS (
              SELECT src, dst,
                     row_number() OVER (PARTITION BY src ORDER BY dst)
                       - 1 AS rnk,
                     count(*) OVER (PARTITION BY src) AS deg
              FROM e
            ), n AS (
              -- NOT "src UNION dst": inside WITH RECURSIVE duckdb 1.0
              -- silently drops the UNION dedup (observed); unnest is
              -- the established workaround (events_kcore precedent)
              SELECT DISTINCT unnest([src, dst]) AS node FROM e
            ), w(walk_id, step, node) AS (
              SELECT node, 0, node FROM n
              UNION ALL
              SELECT w.walk_id, w.step + 1, a.dst
              FROM w JOIN adj a ON a.src = w.node
               AND a.rnk = CAST(
                 ((CAST(w.walk_id AS HUGEINT) * 6364136223846793005
                   + CAST(w.step + 1 AS HUGEINT) * 1442695040888963407
                   + 1234567) % 18446744073709551616) % a.deg AS BIGINT)
              WHERE w.step < 4
            )
            SELECT walk_id, CAST(step AS BIGINT) AS step, node FROM w
        """,
        # earliest-arrival temporal reachability: UNION dedups
        # (a, b, arr, hop) states; the e.t >= w.arr join condition IS
        # the time-respecting constraint; min(arr) per pair
        "graph_temporal_reach": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT (l_partkey % 61)::BIGINT AS src,
                              (l_suppkey % 61)::BIGINT AS dst,
                              datediff('day', DATE '1970-01-01',
                                       CAST(l_shipdate AS DATE))::BIGINT AS t
              FROM lineitem WHERE l_quantity >= 50
            ), w(a, b, arr, hop) AS (
              SELECT src, dst, t, 1 FROM e
              UNION
              SELECT w.a, e2.dst, e2.t, w.hop + 1
              FROM w JOIN e e2 ON e2.src = w.b AND e2.t >= w.arr
              WHERE w.hop < 3
            )
            SELECT a AS src, b AS dst, CAST(min(arr) AS BIGINT) AS arr
            FROM w GROUP BY a, b
        """,
        # redirect-chain resolution: UNION ALL walks every prefix of
        # each (acyclic, functional) chain; the terminal row is the one
        # whose cur never appears as a mapping src
        "events_redirects": """
            WITH RECURSIVE m AS (
              SELECT DISTINCT event_id AS src, event_id // 2 AS dst
              FROM events WHERE event_id % 2 = 0 AND event_id > 0
            ), w(src, cur, len) AS (
              SELECT src, dst, 1 FROM m
              UNION ALL
              SELECT w.src, m2.dst, w.len + 1
              FROM w JOIN m m2 ON m2.src = w.cur
            )
            SELECT w.src AS src, w.cur AS final,
                   CAST(w.len AS BIGINT) AS chain_len
            FROM w WHERE w.cur NOT IN (SELECT src FROM m)
        """,
        "graph_reach": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT (l_partkey % 389)::BIGINT AS src,
                              (l_suppkey % 389)::BIGINT AS dst
              FROM lineitem WHERE l_quantity >= 49
            ), r(src, dst, hops) AS (
              SELECT src, dst, 1 FROM e
              UNION
              SELECT r.src, e.dst, r.hops + 1
              FROM r JOIN e ON e.src = r.dst
              WHERE r.hops < 3
            )
            SELECT src, dst, CAST(min(hops) AS BIGINT) AS hops
            FROM r GROUP BY src, dst
        """,
        # topological layering of the src<dst (hence acyclic) mod-32
        # graph: recurse all (node, path-len-from-a-source) states
        # (UNION-deduped, <= V * depth rows), then layer = max(len)
        "graph_layers": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT (l_partkey % 32)::BIGINT AS src,
                              (l_suppkey % 32)::BIGINT AS dst
              FROM lineitem
              WHERE l_quantity >= 47 AND (l_partkey % 32) < (l_suppkey % 32)
            ), n AS (
              SELECT src AS node FROM e UNION SELECT dst FROM e
            ), p(node, len) AS (
              SELECT node, 0 FROM n
              WHERE node NOT IN (SELECT dst FROM e)
              UNION
              SELECT e.dst, p.len + 1 FROM p JOIN e ON e.src = p.node
            )
            SELECT node, CAST(max(len) AS BIGINT) AS layer
            FROM p GROUP BY node
        """,
        # SCC = mutual reachability: scc_id(u) = min over {u} ∪ {v :
        # u →* v AND v →* u}, computed from the full recursive reach
        # closure (V ≤ 389, so the closure stays tiny)
        "graph_scc": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT (l_partkey % 389)::BIGINT AS src,
                              (l_suppkey % 389)::BIGINT AS dst
              FROM lineitem WHERE l_quantity >= 49
            ), n AS (
              SELECT src AS node FROM e UNION SELECT dst FROM e
            ), reach(a, b) AS (
              SELECT src, dst FROM e
              UNION
              SELECT r.a, e2.dst FROM reach r JOIN e e2 ON e2.src = r.b
            )
            SELECT n.node AS node,
                   LEAST(n.node,
                         COALESCE(MIN(CASE WHEN r2.a IS NOT NULL
                                           THEN r1.b END),
                                  n.node)) AS scc_id
            FROM n
            LEFT JOIN reach r1 ON r1.a = n.node
            LEFT JOIN reach r2 ON r2.a = r1.b AND r2.b = n.node
            GROUP BY n.node
        """,
        # sorted-neighborhood blocking: rank by the normalized 24-char
        # prefix (doc_id tiebreak), pair everything within 5 positions
        "doc_sorted_neighbors": r"""
            WITH k AS (
              SELECT doc_id,
                     substr(regexp_replace(lower(text), '\s+', ' ', 'g'),
                            1, 24) AS key
              FROM documents
            ), r AS (
              SELECT doc_id, key,
                     row_number() OVER (ORDER BY key, doc_id) AS rn
              FROM k
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(b.rn - a.rn AS BIGINT) AS gap
            FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 5
        """,
        # source-level gate: mean_src >= mean_all cross-multiplied in
        # HUGEINT so the integer bar matches the engine bit-for-bit
        "doc_source_gate": r"""
            WITH q AS (
              SELECT doc_id, source,
                     CAST(length(regexp_extract_all(text, '\w+'))
                          AS BIGINT) AS nt
              FROM documents
            ), s AS (
              SELECT source, CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(nt) AS HUGEINT) AS st
              FROM q GROUP BY 1
            ), g AS (
              SELECT sum(n) AS na, sum(st) AS sa FROM s
            ), pass AS (
              SELECT source FROM s, g WHERE st * na >= sa * n
            )
            SELECT d.doc_id, d.source
            FROM documents d JOIN pass USING (source)
        """,
        # exact k-means E-step in quantized int64 space: floor(x*1e4)
        # makes d2 and the argmin integer-exact; ties -> smaller cid
        "embed_kmeans_assign": """
            WITH q AS (
              -- cast FLOAT->DOUBLE before the multiply: the engine
              -- quantizes in float64, and float32*1e4 rounds off-by-
              -- one-quantum on some values (measured at sf0.001)
              SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                * 10000) AS BIGINT) AS xq
              FROM embeddings
            ), seeds AS (
              SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8
            ), c AS (
              SELECT q.vec_id AS cid, dim, xq AS cq
              FROM q JOIN seeds USING (vec_id)
            ), dd AS (
              SELECT q.vec_id, c.cid,
                     sum((q.xq - c.cq) * (q.xq - c.cq)) AS d2
              FROM q JOIN c USING (dim) GROUP BY 1, 2
            ), r AS (
              SELECT *, row_number() OVER (
                       PARTITION BY vec_id ORDER BY d2, cid) AS rn
              FROM dd
            )
            SELECT vec_id, cid AS centroid, CAST(d2 AS BIGINT) AS d2
            FROM r WHERE rn = 1
        """,
        # SemDeDup replay: E-step at scale 1e4 (the embed_kmeans_assign
        # SQL on the dup-planted union), then the integer cosine test
        # at scale 1e3 — a vector drops iff a smaller-id same-cluster
        # vector has dot > 0 AND 400·dot² >= 361·‖a‖²·‖b‖² (19/20)
        "embed_semdedup": """
            WITH base AS (
              SELECT vec_id, embedding FROM embeddings
              UNION ALL
              SELECT vec_id + 1000000 AS vec_id, embedding
              FROM embeddings WHERE vec_id < 25
            ), q AS (
              SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                * 10000) AS BIGINT) AS xq
              FROM base
            ), seeds AS (
              SELECT vec_id FROM base ORDER BY vec_id LIMIT 8
            ), c AS (
              SELECT q.vec_id AS cid, dim, xq AS cq
              FROM q JOIN seeds USING (vec_id)
            ), dd AS (
              SELECT q.vec_id, c.cid,
                     sum((q.xq - c.cq) * (q.xq - c.cq)) AS d2
              FROM q JOIN c USING (dim) GROUP BY 1, 2
            ), asg AS (
              SELECT vec_id, cid AS centroid FROM (
                SELECT *, row_number() OVER (
                         PARTITION BY vec_id ORDER BY d2, cid) AS rn
                FROM dd
              ) WHERE rn = 1
            ), qs AS (
              SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                * 1000) AS BIGINT) AS xq
              FROM base
            ), n2 AS (
              SELECT vec_id, sum(xq * xq) AS n2 FROM qs GROUP BY 1
            ), qa AS (
              SELECT qs.vec_id, asg.centroid, qs.dim, qs.xq
              FROM qs JOIN asg USING (vec_id)
            ), dots AS (
              SELECT b.vec_id AS idb, sum(a.xq * b.xq) AS dot,
                     a.vec_id AS ida
              FROM qa a JOIN qa b
                ON a.centroid = b.centroid AND a.dim = b.dim
               AND a.vec_id < b.vec_id
              GROUP BY idb, ida
            ), dropped AS (
              SELECT DISTINCT d.idb AS vec_id
              FROM dots d
              JOIN n2 na ON na.vec_id = d.ida
              JOIN n2 nb ON nb.vec_id = d.idb
              WHERE d.dot > 0
                AND 400 * d.dot * d.dot >= 361 * na.n2 * nb.n2
            )
            SELECT a.vec_id, a.centroid,
                   CAST(CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END
                        AS BIGINT) AS kept
            FROM asg a LEFT JOIN dropped dr USING (vec_id)
        """,
        "events_props_stats": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                        AS BIGINT) AS sum_k,
                   CAST(max(CAST(json_extract(props, '$.k') AS BIGINT))
                        AS BIGINT) AS max_k
            FROM events GROUP BY 1
        """,
        # weighted bipartite projection: supplier pairs by distinct
        # co-supplied parts, global top-20 with full tiebreaks
        "supplier_copart": """
            WITH ps AS (
              SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            ), pairs AS (
              SELECT a.l_suppkey AS u, b.l_suppkey AS v,
                     CAST(count(*) AS BIGINT) AS shared
              FROM ps a JOIN ps b
                ON a.l_partkey = b.l_partkey
               AND a.l_suppkey < b.l_suppkey
              GROUP BY 1, 2
            )
            SELECT u, v, shared FROM pairs
            ORDER BY shared DESC, u, v LIMIT 20
        """,
        # RANGE frame (value-based, peers included) — fixed-point sum
        # so the engine's cumsum prefix-difference matches bit-for-bit
        "events_range_sum": """
            SELECT event_id,
                   sum(CAST(round(value * 10000) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                           AND CURRENT ROW
                   ) / 10000.0 AS range_sum
            FROM events
        """,
        # SNM blocking (rank-window candidates) + exact 3-gram Jaccard
        # verify — the composed dedup pipeline replayed in one query
        "doc_snm_dups": r"""
            WITH k AS (
              SELECT doc_id,
                     substr(regexp_replace(lower(text), '\s+', ' ', 'g'),
                            1, 24) AS key
              FROM documents
            ), r AS (
              SELECT doc_id, key,
                     row_number() OVER (ORDER BY key, doc_id) AS rn
              FROM k
            ), cand AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 5
            ), tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
              FROM tok
            ), v AS (
              SELECT doc_a, doc_b,
                     len(list_intersect(a.s, b.s))::DOUBLE
                       / (len(a.s) + len(b.s)
                          - len(list_intersect(a.s, b.s))) AS jac
              FROM cand
              JOIN sh a ON a.doc_id = cand.doc_a
              JOIN sh b ON b.doc_id = cand.doc_b
            )
            SELECT doc_a, doc_b, floor(jac * 10000) / 10000 AS sim
            FROM v WHERE jac >= 0.5
        """,
        # Apriori k=3 over (user, day) baskets; basket id packs
        # user*1e6 + epoch-day exactly like the engine wrapper
        "events_basket3": """
            WITH b AS (
              SELECT DISTINCT user_id, date_trunc('day', ts) AS day,
                     event_type
              FROM events
            )
            SELECT a.event_type AS item_a, c.event_type AS item_b,
                   d.event_type AS item_c,
                   CAST(count(*) AS BIGINT) AS support
            FROM b a
            JOIN b c ON a.user_id = c.user_id AND a.day = c.day
                    AND a.event_type < c.event_type
            JOIN b d ON a.user_id = d.user_id AND a.day = d.day
                    AND c.event_type < d.event_type
            GROUP BY 1, 2, 3
        """,
        # cross-source contamination matrix keyed on the SNM prefix
        # fingerprint; dedup per (source, fp) first, then pair counts
        "source_overlap": r"""
            WITH ps AS (
              SELECT DISTINCT source,
                     substr(regexp_replace(lower(text), '\s+', ' ', 'g'),
                            1, 24) AS fp
              FROM documents
            )
            SELECT a.source AS u, b.source AS v,
                   CAST(count(*) AS BIGINT) AS shared
            FROM ps a JOIN ps b
              ON a.fp = b.fp AND a.source < b.source
            GROUP BY 1, 2
        """,
        # exact negative-sampling complement: baskets x item universe
        # ANTI JOIN positives
        "events_negatives": """
            WITH b AS (
              SELECT DISTINCT user_id, date_trunc('day', ts) AS day,
                     event_type
              FROM events
            ), ud AS (
              SELECT DISTINCT user_id, day FROM b
            ), ty AS (
              SELECT DISTINCT event_type FROM events
            )
            SELECT ud.user_id, ud.day, ty.event_type
            FROM ud CROSS JOIN ty
            ANTI JOIN b ON b.user_id = ud.user_id AND b.day = ud.day
                       AND b.event_type = ty.event_type
        """,
        # Tukey fences from exact discrete quartiles in 1e-4 fixed
        # point; integer fence compares, one closing division for q1/q3
        # RANK <= k keeps every boundary tie, row multiplicity intact
        "supplier_top_quantities": """
            WITH r AS (
              SELECT l_suppkey,
                     CAST(round(l_quantity * 100) AS BIGINT) AS q_fp,
                     CAST(rank() OVER (
                       PARTITION BY l_suppkey
                       ORDER BY l_quantity DESC) AS BIGINT) AS rank
              FROM lineitem
            )
            SELECT l_suppkey, q_fp, rank FROM r WHERE rank <= 2
        """,
        "doc_find_pos": """
            SELECT doc_id,
                   CAST(strpos(lower(text), 'the ') AS BIGINT) AS pos
            FROM documents
        """,
        # induce-then-apply: top-20 vocab (n DESC, token ASC), per-doc
        # OOV counts via LEFT JOIN
        "doc_tokenize_unk": """
            WITH t AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '\\w+'))
                       AS token
              FROM documents
            ), vc AS (
              SELECT token, count(*) AS n FROM t GROUP BY 1
            ), vocab AS (
              SELECT token FROM vc ORDER BY n DESC, token LIMIT 20
            )
            SELECT t.doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(count(*) FILTER (WHERE v.token IS NULL)
                        AS BIGINT) AS n_unk
            FROM t LEFT JOIN vocab v USING (token)
            GROUP BY 1
        """,
        # time-weighted average: value holds until the next event;
        # HUGEINT sums -> the two double casts mirror the engine
        "events_twa": """
            WITH o AS (
              SELECT user_id, ts,
                     CAST(round(value * 10000) AS BIGINT) AS v_fp,
                     lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS nxt
              FROM events
            ), s AS (
              SELECT user_id,
                     sum(CAST(v_fp AS HUGEINT)
                         * date_diff('microsecond', ts, nxt)) AS num,
                     sum(CAST(date_diff('microsecond', ts, nxt)
                              AS HUGEINT)) AS den
              FROM o WHERE nxt IS NOT NULL GROUP BY 1
              HAVING sum(date_diff('microsecond', ts, nxt)) > 0
            )
            SELECT user_id,
                   CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 10000
                     AS twa
            FROM s
        """,
        "orders_rich_semi": """
            SELECT o_orderkey, o_custkey, o_totalprice
            FROM orders
            WHERE o_custkey IN (
              SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        """,
        # stable OFFSET pagination over a total order
        "orders_page": """
            WITH r AS (
              SELECT o_orderkey, o_totalprice,
                     row_number() OVER (
                       ORDER BY round(o_totalprice * 100) DESC,
                                o_orderkey) AS rn
              FROM orders
            )
            SELECT o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
            FROM r WHERE rn BETWEEN 101 AND 120
        """,
        # cross-source 3-gram vocabulary overlap; engine shingles are
        # 64-bit hashes (the jaccard_pairs convention — collision-free
        # at these set sizes, same counts as string shingles)
        "source_vocab_overlap": """
            WITH tok AS (
              SELECT source, regexp_extract_all(lower(text), '\\w+') AS w
              FROM documents
            ), st AS (
              SELECT DISTINCT source,
                     unnest(list_transform(range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
              FROM tok
            ), sz AS (
              SELECT source, CAST(count(*) AS BIGINT) AS n
              FROM st GROUP BY 1
            )
            SELECT a.source AS src_a, b.source AS src_b,
                   za.n AS n_a, zb.n AS n_b,
                   CAST(count(*) AS BIGINT) AS inter
            FROM st a
            JOIN st b ON a.sh = b.sh AND a.source < b.source
            JOIN sz za ON za.source = a.source
            JOIN sz zb ON zb.source = b.source
            GROUP BY 1, 2, 3, 4
        """,
        # Gazetteer spotting: token n-grams (list slices over the \w+
        # token list) joined to the VALUES lexicon (verbatim
        # _GAZETTEER); 1-based positions.
        "doc_gazetteer": r"""
            WITH phr(phrase) AS (
              VALUES ('hash join'), ('merge sort'), ('spark'),
                     ('window function'), ('slow join'), ('vector')
            ), lens AS (
              SELECT DISTINCT len(string_split(phrase, ' ')) AS l
              FROM phr
            ), tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), grams AS (
              SELECT tok.doc_id,
                     CAST(unnest(range(1, len(w) - lens.l + 2)) AS BIGINT)
                       AS pos,
                     lens.l
              FROM tok CROSS JOIN lens
              WHERE len(w) >= lens.l
            ), gt AS (
              SELECT g.doc_id, g.pos,
                     array_to_string(
                       list_slice(t.w, g.pos, g.pos + g.l - 1), ' ')
                       AS gram
              FROM grams g JOIN tok t ON g.doc_id = t.doc_id
            )
            SELECT doc_id, pos, gram AS phrase
            FROM gt JOIN phr ON gt.gram = phr.phrase
        """,
        # Sparse sign random projection: FNV-1a over "i|j" picks each
        # ±1 sign (shared verbatim with the engine); quantize-first
        # integer sums are exact.
        "embed_rp": r"""
            WITH dims AS (
              SELECT CAST(unnest(range(1, 65)) AS BIGINT) AS i
            ), outs AS (
              SELECT CAST(unnest(range(1, 17)) AS BIGINT) AS j
            ), s AS (
              SELECT i, j,
                     CASE WHEN CAST(list_reduce(
                       list_prepend(CAST(14695981039346656037 AS HUGEINT),
                         list_transform(
                           range(1, length(CAST(i AS VARCHAR) || '|'
                                           || CAST(j AS VARCHAR)) + 1),
                           p -> CAST(unicode((CAST(i AS VARCHAR) || '|'
                                    || CAST(j AS VARCHAR))[p]) AS HUGEINT))),
                       (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                             CAST(c AS UBIGINT)) AS HUGEINT)
                                    * 1099511628211)
                                   % 18446744073709551616
                     ) AS UBIGINT) & 1 = 1 THEN 1 ELSE -1 END AS sgn
              FROM dims CROSS JOIN outs
            ), e AS (
              SELECT vec_id,
                     CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i,
                     CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000)
                          AS BIGINT) AS xq
              FROM embeddings
            )
            SELECT e.vec_id, s.j AS rp_dim,
                   sum(e.xq * s.sgn)::BIGINT AS y
            FROM e JOIN s USING (i)
            GROUP BY e.vec_id, s.j
        """,
        # B-cubed + pairwise agreement over the (pred, gold)
        # contingency cells; per-item floor-scaled integer B3 sums,
        # exact pairwise pair counts.
        "doc_cluster_agreement": """
            WITH cells AS (
              SELECT lang AS pred, (doc_id % 5)::VARCHAR AS gold,
                     count(*)::BIGINT AS n_cg
              FROM documents GROUP BY 1, 2
            ), marg AS (
              SELECT n_cg,
                     sum(n_cg) OVER (PARTITION BY pred) AS n_c,
                     sum(n_cg) OVER (PARTITION BY gold) AS n_g
              FROM cells
            ), pm AS (SELECT pred, sum(n_cg) AS m FROM cells GROUP BY pred),
            gm AS (SELECT gold, sum(n_cg) AS m FROM cells GROUP BY gold)
            SELECT sum(n_cg)::BIGINT AS n_items,
                   sum(n_cg * ((n_cg * 1000000000) // n_c))::BIGINT
                     AS b3_p_fp,
                   sum(n_cg * ((n_cg * 1000000000) // n_g))::BIGINT
                     AS b3_r_fp,
                   sum(n_cg * (n_cg - 1) // 2)::BIGINT AS pair_tp,
                   ((SELECT sum(m * (m - 1) // 2) FROM pm)
                    - sum(n_cg * (n_cg - 1) // 2))::BIGINT AS pair_fp,
                   ((SELECT sum(m * (m - 1) // 2) FROM gm)
                    - sum(n_cg * (n_cg - 1) // 2))::BIGINT AS pair_fn
            FROM marg
        """,
        # Expectation suite: one UNION ALL branch per check; engine
        # sorts by rule, the comparator sorts rows anyway.
        "orders_expectations": """
            SELECT 'accepted:o_orderstatus' AS rule,
                   coalesce(sum(CASE WHEN o_orderstatus NOT IN
                     ('O','F','P') THEN 1 ELSE 0 END), 0)::BIGINT
                     AS n_violations
            FROM orders
            UNION ALL
            SELECT 'fk:o_custkey->customer',
                   (SELECT count(*) FROM orders o
                    LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                    WHERE c.c_custkey IS NULL)::BIGINT
            UNION ALL
            SELECT 'not_null:o_custkey',
                   coalesce(sum(CASE WHEN o_custkey IS NULL
                     THEN 1 ELSE 0 END), 0)::BIGINT
            FROM orders
            UNION ALL
            SELECT 'nonneg:o_totalprice',
                   coalesce(sum(CASE WHEN o_totalprice < 0
                     THEN 1 ELSE 0 END), 0)::BIGINT
            FROM orders
            UNION ALL
            SELECT 'unique:o_orderkey',
                   coalesce((SELECT sum(n - 1) FROM (
                     SELECT count(*) AS n FROM orders
                     GROUP BY o_orderkey) WHERE n > 1), 0)::BIGINT
        """,
        # Streaming late-data audit: running prior-max over the
        # arrival order (event_id XOR 3), strict 1h-watermark flag,
        # integer lateness.
        "events_late": """
            WITH o AS (
              SELECT user_id, ts,
                     max(ts) OVER (PARTITION BY user_id
                       ORDER BY xor(event_id, 3)
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prior_max
              FROM events
            ), f AS (
              SELECT user_id,
                     CASE WHEN prior_max IS NOT NULL
                           AND ts < prior_max - INTERVAL 1 HOUR
                          THEN 1 ELSE 0 END AS late,
                     CASE WHEN prior_max IS NOT NULL
                           AND ts < prior_max - INTERVAL 1 HOUR
                          THEN epoch_us(prior_max) - 3600000000
                               - epoch_us(ts)
                          ELSE 0 END AS lat_us
              FROM o
            )
            SELECT user_id, count(*)::BIGINT AS n_events,
                   sum(late)::BIGINT AS n_late,
                   (max(lat_us) // 1000000)::BIGINT AS max_lateness_s
            FROM f GROUP BY user_id
        """,
        # Markov next-event backtest: lead() adjacency, parity split,
        # per-from argmax (count desc, target asc), exact accuracy.
        "events_markov_acc": """
            WITH ordered AS (
              SELECT event_type,
                     lead(event_type) OVER w AS nxt,
                     lead(event_id) OVER w AS nxt_id
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), pairs AS (
              SELECT event_type AS f, nxt AS t, nxt_id
              FROM ordered WHERE nxt IS NOT NULL
            ), train AS (
              SELECT f, t, count(*) AS c FROM pairs
              WHERE nxt_id % 2 = 0 GROUP BY f, t
            ), pred AS (
              SELECT f, t AS predicted,
                     row_number() OVER (PARTITION BY f
                                        ORDER BY c DESC, t) AS rn
              FROM train
            ), p1 AS (SELECT f, predicted FROM pred WHERE rn = 1),
            test AS (
              SELECT f, t FROM pairs WHERE nxt_id % 2 = 1
            )
            SELECT test.f AS from_type, min(p1.predicted) AS predicted,
                   count(*)::BIGINT AS n_test,
                   sum(CASE WHEN test.t = p1.predicted
                            THEN 1 ELSE 0 END)::BIGINT AS n_correct
            FROM test JOIN p1 USING (f)
            GROUP BY test.f
        """,
        # Holt smoothing: dense per-type daily grid, then the exact
        # integer recurrence replayed by a recursive CTE (DuckDB //
        # truncates toward zero; the engine's halving matches).
        "events_holt": """
            WITH RECURSIVE daily AS (
              SELECT event_type, date_trunc('day', ts) AS day,
                     count(*)::BIGINT AS v
              FROM events GROUP BY 1, 2
            ), bounds AS (
              SELECT event_type, min(day) AS dlo, max(day) AS dhi
              FROM daily GROUP BY 1
            ), grid AS (
              SELECT event_type,
                     unnest(generate_series(dlo, dhi, INTERVAL 1 DAY))
                       AS day
              FROM bounds
            ), g AS (
              SELECT grid.event_type, grid.day, coalesce(daily.v, 0) AS v,
                     row_number() OVER (PARTITION BY grid.event_type
                                        ORDER BY grid.day) AS t
              FROM grid LEFT JOIN daily USING (event_type, day)
            ), rec AS (
              SELECT event_type, t, day, v * 1000 AS l,
                     CAST(0 AS BIGINT) AS b
              FROM g WHERE t = 1
              UNION ALL
              SELECT g.event_type, g.t, g.day,
                     (g.v * 1000 + rec.l + rec.b) // 2 AS l,
                     (((g.v * 1000 + rec.l + rec.b) // 2 - rec.l)
                      + rec.b) // 2 AS b
              FROM rec JOIN g
                ON g.event_type = rec.event_type AND g.t = rec.t + 1
            )
            SELECT event_type, day, l AS level_fp, b AS trend_fp FROM rec
        """,
        # Seasonal-naive backtest: daily counts self-joined at a 7-day
        # lag; integer absolute errors.
        "events_snaive": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS day,
                     count(*)::BIGINT AS n
              FROM events GROUP BY 1, 2
            ), j AS (
              SELECT d.event_type, d.n, p.n AS fc
              FROM daily d JOIN daily p
                ON p.event_type = d.event_type
               AND p.day = d.day - INTERVAL 7 DAY
            )
            SELECT event_type, count(*)::BIGINT AS n_days,
                   sum(abs(n - fc))::BIGINT AS sum_abs_err,
                   sum(n)::BIGINT AS sum_actual
            FROM j GROUP BY event_type
        """,
        # RAKE (Rose et al. 2010): stopword-delimited candidate
        # phrases; word score = floor-scaled deg/freq over the doc;
        # phrase score sums its tokens' terms. The stoplist is the
        # VERBATIM kgflow.ops.text.RAKE_STOPWORDS (pinned equal by
        # tests/test_wave18.py).
        "doc_rake": r"""
            WITH tok AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '\w+')) AS w,
                     generate_subscripts(
                       regexp_extract_all(lower(text), '\w+'), 1) AS i
              FROM documents
            ), f AS (
              SELECT doc_id, i, w,
                     CASE WHEN w IN (
                       'a','an','and','are','as','at','be','but','by',
                       'for','from','has','have','in','is','it','its',
                       'of','on','or','that','the','this','to','was',
                       'were','will','with','not','he','she','they',
                       'we','you','i')
                     THEN 1 ELSE 0 END AS stop
              FROM tok
            ), p AS (
              SELECT doc_id, i, w, stop,
                     sum(stop) OVER (PARTITION BY doc_id ORDER BY i
                                     ROWS UNBOUNDED PRECEDING) AS pid
              FROM f
            ), words AS (
              SELECT doc_id, pid, i, w FROM p WHERE stop = 0
            ), plen AS (
              SELECT doc_id, pid, count(*) AS plen
              FROM words GROUP BY doc_id, pid
            ), wp AS (
              SELECT words.doc_id, words.pid, words.i, words.w, plen.plen
              FROM words JOIN plen USING (doc_id, pid)
            ), wd AS (
              SELECT doc_id, w, sum(plen)::BIGINT AS deg,
                     count(*)::BIGINT AS freq
              FROM wp GROUP BY doc_id, w
            ), terms AS (
              SELECT wp.doc_id, wp.pid, wp.i,
                     (1000000 * wd.deg) // wd.freq AS term
              FROM wp JOIN wd
                ON wp.doc_id = wd.doc_id AND wp.w = wd.w
            ), ph AS (
              SELECT terms.doc_id, terms.pid,
                     string_agg(wp.w, ' ' ORDER BY wp.i) AS phrase,
                     sum(terms.term)::BIGINT AS score
              FROM terms JOIN wp
                ON terms.doc_id = wp.doc_id AND terms.pid = wp.pid
               AND terms.i = wp.i
              GROUP BY terms.doc_id, terms.pid
            ), dd AS (
              SELECT doc_id, phrase, min(score)::BIGINT AS score
              FROM ph GROUP BY doc_id, phrase
            )
            SELECT doc_id, phrase, score,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, phrase) AS rank
            FROM dd QUALIFY rank <= 3
        """,
        # Reciprocal-rank fusion of the exact cosine and exact L2
        # rankings (both retrievers are exact, so the fusion is too);
        # integer floor terms make the fused scores hash-exact.
        "ann_rrf": """
            WITH q AS (
              SELECT vec_id AS query_id, embedding AS qe
              FROM embeddings ORDER BY vec_id LIMIT 10
            ), s AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qe, e.embedding) AS sim,
                     list_distance(q.qe, e.embedding) AS dist
              FROM q CROSS JOIN embeddings e
              WHERE e.vec_id <> q.query_id
            ), ra AS (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY sim DESC, neighbor_id) AS r
              FROM s QUALIFY r <= 20
            ), rb AS (
              SELECT query_id, neighbor_id,
                     row_number() OVER (PARTITION BY query_id
                       ORDER BY dist ASC, neighbor_id) AS r
              FROM s QUALIFY r <= 20
            ), u AS (
              SELECT * FROM ra UNION ALL SELECT * FROM rb
            ), f AS (
              SELECT query_id, neighbor_id,
                     sum(1000000 // (60 + r))::BIGINT AS rrf
              FROM u GROUP BY query_id, neighbor_id
            )
            SELECT query_id, neighbor_id, rrf,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY rrf DESC, neighbor_id) AS rank
            FROM f QUALIFY rank <= 5
        """,
        # Linear multi-touch attribution: conversions join touches in
        # the strict trailing window; per-conversion touch count n via
        # a grouped subquery; integer floor credit (1000000 // n) makes
        # the per-type sums hash-exact.
        "events_attribution": """
            WITH conv AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase'
            ), tt AS (
              SELECT user_id, ts, event_type FROM events
              WHERE event_type <> 'purchase'
            ), j AS (
              SELECT c.event_id AS cid, t.event_type AS event_type
              FROM conv c JOIN tt t ON t.user_id = c.user_id
               AND t.ts < c.ts AND t.ts > c.ts - INTERVAL 1 DAY
            ), n AS (SELECT cid, count(*) AS n FROM j GROUP BY cid)
            SELECT j.event_type, count(*)::BIGINT AS n_touches,
                   sum(1000000 // n.n)::BIGINT AS credit
            FROM j JOIN n USING (cid) GROUP BY j.event_type
        """,
        # SCD-2 run collapse: lag() change flags -> running-sum run
        # numbers -> one row per run, valid_to = next run's valid_from
        # (far-future sentinel for the open run).
        "events_scd": """
            WITH o AS (
              SELECT user_id, event_type, ts, event_id,
                     CASE WHEN lag(event_type) OVER
                            (PARTITION BY user_id ORDER BY ts, event_id)
                          IS DISTINCT FROM event_type
                          THEN 1 ELSE 0 END AS brk
              FROM events
            ), r AS (
              SELECT *, sum(brk) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS version
              FROM o
            ), runs AS (
              SELECT user_id, CAST(version AS BIGINT) AS version,
                     min(event_type) AS event_type, min(ts) AS valid_from
              FROM r GROUP BY user_id, version
            )
            SELECT user_id, version, event_type, valid_from,
                   coalesce(lead(valid_from) OVER
                              (PARTITION BY user_id ORDER BY version),
                            TIMESTAMP '2999-12-31 00:00:00') AS valid_to
            FROM runs
        """,
        # LOCF grid resample: weekly grid x users, ASOF to the last
        # event at or before each point (inner; constant 200-step cap
        # covers the corpus span, engine computes exact steps)
        "events_locf": """
            WITH b AS (
              SELECT date_trunc('day', min(ts)) AS lo,
                     date_trunc('day', max(ts)) AS hi
              FROM events
            ), off AS (SELECT unnest(range(0, 200)) AS i),
            grid AS (
              SELECT u.user_id, b.lo + i * INTERVAL 7 DAY AS grid_ts
              FROM (SELECT DISTINCT user_id FROM events) u, b, off
              WHERE b.lo + i * INTERVAL 7 DAY <= b.hi
            )
            SELECT grid.user_id, grid.grid_ts,
                   e.event_id AS prior_event_id
            FROM grid
            ASOF JOIN events e
              ON grid.user_id = e.user_id AND grid.grid_ts >= e.ts
        """,
        # ABC classes by integer cumulative-share fences over the
        # (revenue DESC, partkey) total order
        "part_abc": """
            WITH pr AS (
              SELECT l_partkey,
                     sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                       AS r_fp
              FROM lineitem GROUP BY 1
            ), w AS (
              SELECT l_partkey, r_fp,
                     sum(r_fp) OVER (
                       ORDER BY r_fp DESC, l_partkey
                       ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum,
                     sum(r_fp) OVER () AS tot
              FROM pr
            )
            SELECT l_partkey, r_fp,
                   CASE WHEN 5 * cum <= 4 * tot THEN 'A'
                        WHEN 20 * cum <= 19 * tot THEN 'B'
                        ELSE 'C' END AS cls
            FROM w
        """,
        # dedup-yield report: same CC predicate as doc_dup_clusters,
        # then a size histogram
        "doc_cluster_sizes": """
            WITH RECURSIVE tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS w
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
              FROM tok
            ), pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s)
                       - len(list_intersect(a.s, b.s))) >= 0.5
            ), edges AS (
              SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs
            ), reach(a, b) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.a, e.v FROM reach r JOIN edges e ON e.u = r.b
            ), lab AS (
              SELECT a AS doc_id, min(b) AS cluster_id FROM reach
              GROUP BY a
            ), cs AS (
              SELECT cluster_id, count(*) AS sz FROM lab GROUP BY 1
            )
            SELECT CAST(sz AS BIGINT) AS cluster_size,
                   CAST(count(*) AS BIGINT) AS n_clusters
            FROM cs GROUP BY 1
        """,
        # KWIC: keyword = 21st by (n DESC, token); 1-based inclusive
        # list slice [max(i-3,1), i+3] matches the engine's window
        "doc_kwic": """
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS w
              FROM documents
            ), vc AS (
              SELECT t AS token, count(*) AS n FROM (
                SELECT unnest(w) AS t FROM tok) GROUP BY 1
            ), kw AS (
              SELECT token FROM vc ORDER BY n DESC, token
              LIMIT 1 OFFSET 20
            ), pos AS (
              SELECT doc_id, w, generate_subscripts(w, 1) AS i,
                     unnest(w) AS t
              FROM tok
            )
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   array_to_string(w[greatest(i - 3, 1):i + 3], ' ')
                     AS window
            FROM pos WHERE t = (SELECT token FROM kw)
        """,
        "events_bursts": """
            WITH c AS (
              SELECT event_id,
                     count(*) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                             AND CURRENT ROW) AS cnt
              FROM events
            )
            SELECT event_id, CAST(cnt AS BIGINT) AS cnt
            FROM c WHERE cnt >= 3
        """,
        # integer cross-multiplied log-odds: ca/ta > cb/tb iff
        # ca*tb - cb*ta > 0; HUGEINT keeps it exact at any scale
        "source_distinctive_tokens": """
            WITH big AS (
              SELECT source FROM documents
              GROUP BY 1 ORDER BY count(*) DESC, source LIMIT 1
            ), t AS (
              SELECT (source = (SELECT source FROM big)) AS in_a,
                     unnest(regexp_extract_all(lower(text), '\\w+'))
                       AS token
              FROM documents
            ), c AS (
              SELECT token,
                     CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END)
                          AS BIGINT) AS ca,
                     CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END)
                          AS BIGINT) AS cb
              FROM t GROUP BY 1
            ), tot AS (
              SELECT CAST(sum(ca) AS HUGEINT) AS ta,
                     CAST(sum(cb) AS HUGEINT) AS tb
              FROM c
            )
            SELECT token, ca, cb,
                   CAST(ca * tb - cb * ta AS BIGINT) AS score
            FROM c, tot
            ORDER BY ca * tb - cb * ta DESC, token
            LIMIT 20
        """,
        # semi-Markov: consecutive same-user transitions with total
        # dwell gap in microseconds
        "events_transition_times": """
            WITH s AS (
              SELECT user_id, ts, event_type,
                     lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS nxt,
                     lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS nts
              FROM events
            )
            SELECT event_type AS from_state, nxt AS to_state,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(date_diff('microsecond', ts, nts))
                        AS BIGINT) AS sum_gap_us
            FROM s WHERE nxt IS NOT NULL
            GROUP BY 1, 2
        """,
        # COUNT(DISTINCT) OVER replay: first-occurrence flag under a
        # cumulative windowed sum
        "events_running_distinct": """
            WITH f AS (
              SELECT event_id, user_id, ts,
                     row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS rn
              FROM events
            )
            SELECT event_id,
                   CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS n_distinct
            FROM f
        """,
        # weighted lower median: smallest v with 2*cumweight >= total,
        # all integer; python % on negatives matches DuckDB % for k>=0
        "events_weighted_median": """
            WITH w AS (
              SELECT event_type AS g,
                     CAST(round(value * 10000) AS BIGINT) AS v,
                     1 + CAST(json_extract(props, '$.k') AS BIGINT) % 7
                       AS wt
              FROM events
            ), c AS (
              SELECT g, v, sum(wt) AS wt FROM w GROUP BY 1, 2
            ), o AS (
              SELECT g, v,
                     sum(wt) OVER (PARTITION BY g ORDER BY v) AS cw,
                     sum(wt) OVER (PARTITION BY g) AS tw
              FROM c
            )
            SELECT g AS event_type,
                   CAST(min(v) FILTER (WHERE 2 * cw >= tw) AS DOUBLE)
                     / 10000 AS wmedian
            FROM o GROUP BY g
        """,
        "events_iqr_outliers": """
            WITH q AS (
              SELECT event_type,
                     quantile_disc(CAST(round(value * 10000) AS BIGINT),
                                   0.25) AS q1,
                     quantile_disc(CAST(round(value * 10000) AS BIGINT),
                                   0.75) AS q3
              FROM events GROUP BY 1
            )
            SELECT e.event_type,
                   CAST(any_value(q.q1) AS DOUBLE) / 10000 AS q1,
                   CAST(any_value(q.q3) AS DOUBLE) / 10000 AS q3,
                   CAST(count(*) FILTER (
                     WHERE CAST(round(e.value * 10000) AS BIGINT)
                             < q.q1 - 3 * (q.q3 - q.q1)
                        OR CAST(round(e.value * 10000) AS BIGINT)
                             > q.q3 + 3 * (q.q3 - q.q1)) AS BIGINT)
                     AS n_out
            FROM events e JOIN q USING (event_type)
            GROUP BY 1
        """,
        # asymmetric lookup: planted 60-token excerpt queries (+2e6
        # ids) vs the full corpus; same shingle construction both sides
        "doc_query_dups": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
              FROM tok
            ), qsh AS (
              SELECT doc_id + 2000000 AS doc_id,
                     list_distinct(list_transform(
                       range(1, least(len(w), 60) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
              FROM tok WHERE doc_id % 83 = 5
            ), v AS (
              SELECT q.doc_id AS query_id, c.doc_id AS match_id,
                     len(list_intersect(q.s, c.s))::DOUBLE
                       / (len(q.s) + len(c.s)
                          - len(list_intersect(q.s, c.s))) AS jac
              FROM qsh q JOIN sh c ON q.doc_id != c.doc_id
            )
            SELECT query_id, match_id,
                   floor(jac * 10000) / 10000 AS sim
            FROM v WHERE jac >= 0.3
        """,
        # RFM: last-order epoch day / order count / spend in cents,
        # NTILE(5) over (value DESC, custkey) total orders
        "customer_rfm": """
            WITH agg AS (
              SELECT o_custkey AS c_custkey,
                     max(CAST(o_orderdate AS DATE)) AS last_day,
                     CAST(count(*) AS BIGINT) AS n,
                     sum(CAST(round(o_totalprice * 100) AS BIGINT))
                       AS m_fp
              FROM orders GROUP BY 1
            )
            SELECT c_custkey,
                   CAST(ntile(5) OVER (
                     ORDER BY last_day DESC, c_custkey) AS BIGINT)
                     AS r_tile,
                   CAST(ntile(5) OVER (
                     ORDER BY n DESC, c_custkey) AS BIGINT) AS f_tile,
                   CAST(ntile(5) OVER (
                     ORDER BY m_fp DESC, c_custkey) AS BIGINT) AS m_tile
            FROM agg
        """,
        "q19_disjunctive": """
            SELECT sum(CAST(round(l_extendedprice * (1 - l_discount)
                                  * 10000) AS BIGINT)) / 10000.0
                     AS revenue
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE (p.p_brand = 'Brand#3'
                   AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 1 AND 15)
               OR (p.p_brand = 'Brand#12'
                   AND p.p_size BETWEEN 1 AND 25
                   AND l.l_quantity BETWEEN 10 AND 30)
               OR (p.p_brand = 'Brand#21'
                   AND p.p_size BETWEEN 1 AND 35
                   AND l.l_quantity BETWEEN 20 AND 45)
        """,
        "q16_supplier_counts": """
            SELECT p.p_brand, p.p_type,
                   CAST(p.p_size AS BIGINT) AS p_size,
                   count(DISTINCT l.l_suppkey) AS supplier_cnt
            FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) l
            JOIN part p ON p.p_partkey = l.l_partkey
            WHERE l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
            GROUP BY 1, 2, 3
        """,
        # ends (-1) order before starts (+1) at equal t; within an
        # equal (t, delta) run the prefix multiset is permutation-
        # invariant, so the per-day max matches the engine exactly
        "events_concurrency": """
            WITH b AS (
              SELECT ts AS t, CAST(1 AS BIGINT) AS delta FROM events
              UNION ALL
              SELECT ts + INTERVAL 30 MINUTE AS t,
                     CAST(-1 AS BIGINT) AS delta
              FROM events
            ), p AS (
              SELECT t,
                     sum(delta) OVER (
                       ORDER BY t, delta
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS conc
              FROM b
            )
            SELECT date_trunc('day', t) AS day,
                   CAST(max(conc) AS BIGINT) AS max_concurrent
            FROM p
            GROUP BY 1
        """,
        "orders_pareto": """
            SELECT a.o_orderkey, a.o_orderdate, a.o_totalprice
            FROM orders a
            WHERE NOT EXISTS (
              SELECT 1 FROM orders b
              WHERE b.o_totalprice >= a.o_totalprice
                AND b.o_orderdate <= a.o_orderdate
                AND (b.o_totalprice > a.o_totalprice
                     OR b.o_orderdate < a.o_orderdate)
            )
        """,
        # same deterministic version-B plant as the engine; the engine
        # compares FNV row-hashes, the oracle compares values — equal
        # absent a 64-bit collision on this bounded corpus
        "doc_snapshot_diff": """
            WITH a AS (SELECT doc_id, n_chars FROM documents),
            b AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 = 7 THEN n_chars + 1
                          ELSE n_chars END AS n_chars
              FROM documents WHERE doc_id % 10 <> 3
              UNION ALL
              SELECT doc_id + 1000000000, n_chars
              FROM documents WHERE doc_id % 10 = 0
            )
            SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
                   CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'removed'
                        ELSE 'changed' END AS change
            FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
            WHERE a.doc_id IS NULL OR b.doc_id IS NULL
               OR a.n_chars <> b.n_chars
        """,
        # the doc_dup_clusters closure + a row_number argmax: longest
        # doc (ties: min doc_id) kept per cluster
        "doc_canonical_keep": r"""
            WITH RECURSIVE tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
              FROM tok
            ), pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              WHERE len(list_intersect(a.s, b.s))::DOUBLE
                    / (len(a.s) + len(b.s)
                       - len(list_intersect(a.s, b.s))) >= 0.5
            ), edges AS (
              SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs
            ), reach(a, b) AS (
              SELECT doc_id, doc_id FROM documents
              UNION
              SELECT r.a, e.v FROM reach r JOIN edges e ON e.u = r.b
            ), cl AS (
              SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
            ), ranked AS (
              SELECT c.cluster_id, d.doc_id, d.n_chars,
                     row_number() OVER (
                       PARTITION BY c.cluster_id
                       ORDER BY d.n_chars DESC, d.doc_id
                     ) AS rn
              FROM cl c JOIN documents d ON d.doc_id = c.doc_id
            )
            SELECT cluster_id, doc_id AS keep_doc_id, n_chars
            FROM ranked WHERE rn = 1
        """,
        "events_dense_hourly": """
            WITH c AS (
              SELECT event_type, date_trunc('hour', ts) AS h,
                     count(*) AS n
              FROM events GROUP BY 1, 2
            ), s AS (
              SELECT event_type, min(h) AS lo, max(h) AS hi
              FROM c GROUP BY 1
            ), g AS (
              SELECT event_type,
                     unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
              FROM s
            )
            SELECT g.event_type, g.h AS hour,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n
            FROM g LEFT JOIN c
              ON c.event_type = g.event_type AND c.h = g.h
        """,
        # revenue quantizes to cents on both sides; the share is one
        # int÷int double division per nation
        "nation_share": """
            WITH per_nation AS (
              SELECT n.n_regionkey, n.n_name,
                     CAST(sum(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS fp
              FROM orders o
              JOIN customer c ON c.c_custkey = o.o_custkey
              JOIN nation n ON n.n_nationkey = c.c_nationkey
              GROUP BY 1, 2
            )
            SELECT r.r_name, p.n_name,
                   CAST(fp AS DOUBLE) / 100.0 AS revenue,
                   CAST(fp AS DOUBLE)
                     / CAST(sum(fp) OVER (PARTITION BY p.n_regionkey)
                            AS DOUBLE) AS region_share
            FROM per_nation p
            JOIN region r ON r.r_regionkey = p.n_regionkey
        """,
        # HUGEINT keeps the Gini numerator/denominator exact until the
        # single closing division, matching the engine's python-int path
        "orders_gini": """
            WITH t AS (
              SELECT o_custkey,
                     CAST(sum(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS fp
              FROM orders GROUP BY 1
            ), r AS (
              SELECT fp,
                     row_number() OVER (ORDER BY fp, o_custkey) AS rn
              FROM t
            ), s AS (
              SELECT sum(CAST(rn AS HUGEINT) * fp) AS srx,
                     sum(CAST(fp AS HUGEINT)) AS sx,
                     count(*) AS n
              FROM r
            )
            SELECT CAST(2 * srx - (n + 1) * sx AS DOUBLE)
                     / CAST(n * sx AS DOUBLE) AS gini,
                   CAST(n AS BIGINT) AS n_customers
            FROM s
        """,
        # counts stay integer through both engines; only ln() is float
        "events_user_entropy": """
            WITH c AS (
              SELECT user_id, event_type, count(*) AS c
              FROM events GROUP BY 1, 2
            )
            SELECT user_id,
                   CAST(sum(c) AS BIGINT) AS n_rows,
                   ln(CAST(sum(c) AS DOUBLE))
                     - sum(c * ln(CAST(c AS DOUBLE)))
                       / CAST(sum(c) AS DOUBLE) AS entropy
            FROM c
            GROUP BY user_id
        """,
        # all-BIGINT moment row: the Pearson division stays out of the
        # compared schema (grouped_corr_moments convention)
        "graph_assortativity": """
            WITH e AS (
              SELECT DISTINCT l_partkey AS src, l_suppkey AS dst
              FROM lineitem WHERE l_quantity >= 45
            ), dxs AS (
              SELECT src, CAST(count(*) AS BIGINT) AS dx
              FROM e GROUP BY src
            ), dys AS (
              SELECT dst, CAST(count(*) AS BIGINT) AS dy
              FROM e GROUP BY dst
            ), j AS (
              SELECT dx AS x, dy AS y
              FROM e JOIN dxs USING (src) JOIN dys USING (dst)
            )
            SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy,
                   CAST(sum(x * y) AS BIGINT) AS sxy
            FROM j
        """,
        # both engines interpolate even-count medians as (a+b)/2;
        # comparator rounds to 1e-6
        "events_mad": """
            WITH m AS (
              SELECT event_type, median(value) AS med
              FROM events GROUP BY 1
            ), d AS (
              SELECT e.event_type, median(abs(e.value - m.med)) AS mad
              FROM events e JOIN m USING (event_type)
              GROUP BY e.event_type
            )
            SELECT d.event_type, m.med, d.mad
            FROM d JOIN m USING (event_type)
        """,
        # chi-square over the type x dow contingency table: absent
        # cells contribute exactly n - sum(e) since all expected mass
        # sums to n; dow encoding is label-invariant for the statistic
        "events_chi2": """
            WITH c AS (
              SELECT event_type AS r, dayofweek(ts) AS col,
                     CAST(count(*) AS BIGINT) AS c
              FROM events GROUP BY 1, 2
            ), rt AS (
              SELECT r, CAST(sum(c) AS BIGINT) AS rt FROM c GROUP BY r
            ), ct AS (
              SELECT col, CAST(sum(c) AS BIGINT) AS ct FROM c GROUP BY col
            ), tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c),
            e AS (
              SELECT c.c,
                     CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
                       / CAST(tot.n AS DOUBLE) AS e
              FROM c JOIN rt USING (r) JOIN ct USING (col) CROSS JOIN tot
            )
            SELECT (SELECT n FROM tot) AS n,
                   (SELECT CAST(count(*) AS BIGINT) FROM rt) AS n_row_cats,
                   (SELECT CAST(count(*) AS BIGINT) FROM ct) AS n_col_cats,
                   CAST(((SELECT count(*) FROM rt) - 1)
                        * ((SELECT count(*) FROM ct) - 1) AS BIGINT) AS dof,
                   sum((c - e) * (c - e) / e)
                     + ((SELECT n FROM tot) - sum(e)) AS chi2
            FROM e
        """,
        # counts stay int64 through both engines; the hapax ratio is
        # the single float division
        "doc_hapax": r"""
            WITH c AS (
              SELECT token, CAST(count(*) AS BIGINT) AS c
              FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+'))
                      AS token FROM documents)
              GROUP BY token
            )
            SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_vocab,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_hapax,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE) AS hapax_ratio
            FROM c
        """,
        # first/last via two row_number windows (DuckDB arg_min does
        # not take struct keys — FIXTURES.md workaround)
        "events_first_last": """
            WITH r AS (
              SELECT user_id, event_type, value,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS rn,
                     row_number() OVER (PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC) AS rl
              FROM events
            )
            SELECT user_id,
                   max(CASE WHEN rn = 1 THEN event_type END) AS first_type,
                   max(CASE WHEN rn = 1 THEN value END) AS first_value,
                   max(CASE WHEN rl = 1 THEN event_type END) AS last_type,
                   max(CASE WHEN rl = 1 THEN value END) AS last_value
            FROM r GROUP BY user_id
        """,
        # holistic window: both engines interpolate even frames as
        # (a+b)/2 in double; comparator rounds to 1e-6
        "events_moving_median": """
            SELECT user_id, event_id,
                   median(value) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med
            FROM events
        """,
        # PMI over adjacent \w+ bigrams: counts stay integer through
        # both engines (engine: int64 products; SQL: HUGEINT), ONE
        # cast-divide-ln at the end — same ulp-bounded shape as
        # events_user_entropy. min_count filter before the joins.
        "doc_pmi_pairs": r"""
            WITH toks AS (
              SELECT regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), ucnt AS (
              SELECT tok, CAST(count(*) AS BIGINT) AS c
              FROM (SELECT unnest(w) AS tok FROM toks)
              GROUP BY tok
            ), pairs AS (
              SELECT unnest(list_transform(
                       range(1, len(w)),
                       i -> {'a': w[i], 'b': w[i + 1]})) AS p
              FROM toks
            ), bcnt AS (
              SELECT p.a AS tok_a, p.b AS tok_b,
                     CAST(count(*) AS BIGINT) AS c_ab
              FROM pairs GROUP BY 1, 2
            ), tot AS (
              SELECT (SELECT sum(c) FROM ucnt) AS n_tok,
                     (SELECT sum(c_ab) FROM bcnt) AS n_pair
            )
            SELECT b.tok_a, b.tok_b, b.c_ab,
                   ln(CAST(b.c_ab * t.n_tok * t.n_tok AS DOUBLE)
                      / CAST(t.n_pair * ca.c * cb.c AS DOUBLE)) AS pmi
            FROM bcnt b
            CROSS JOIN tot t
            JOIN ucnt ca ON ca.tok = b.tok_a
            JOIN ucnt cb ON cb.tok = b.tok_b
            WHERE b.c_ab >= 5
        """,
        # FNV fold of 'doc_id|n_chars' per row (the events_value_sketch
        # HUGEINT fold over a composed key), wrap-summed mod 2^64
        "doc_checksum": """
            WITH h AS (
              SELECT
                CAST(list_reduce(
                  list_prepend(CAST(14695981039346656037 AS HUGEINT),
                    list_transform(
                      range(1, length(CAST(doc_id AS VARCHAR) || '|'
                                      || CAST(n_chars AS VARCHAR)) + 1),
                      j -> CAST(unicode((CAST(doc_id AS VARCHAR) || '|'
                                         || CAST(n_chars AS VARCHAR))[j])
                                AS HUGEINT))),
                  (acc, c) -> (CAST(xor(CAST(acc AS UBIGINT),
                                        CAST(c AS UBIGINT)) AS HUGEINT)
                               * 1099511628211) % 18446744073709551616
                ) AS UBIGINT) AS hv
              FROM documents
            )
            SELECT count(*) AS n_rows,
                   CAST(sum(CAST(hv AS HUGEINT))
                        % 18446744073709551616 AS UBIGINT) AS checksum
            FROM h
        """,
        # Sørensen–Dice over the doc_jaccard_pairs shingle pipeline
        "doc_dice_pairs": r"""
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS w
              FROM documents
            ), sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                       range(1, len(w) - 1),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s
              FROM tok
            ), p AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     2.0 * len(list_intersect(a.s, b.s))
                       / (len(a.s) + len(b.s)) AS d
              FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            )
            SELECT doc_a, doc_b, floor(d * 10000) / 10000 AS sim
            FROM p WHERE d >= 0.6
        """,
    }
