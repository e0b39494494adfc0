#!/usr/bin/env python
"""kgflow benchmark runner.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "rows": {...row counts...}}

Headline = end-to-end pages → canonical deduplicated edges (the
north-star metric is triples extracted/sec over that span).

Env: RAY_GRAFT_CPUS (default 32), GRAFT_SF_DIR (default
/root/testdata/sf0.1).

``--scaling`` runs the headline at num_cpus=8 and num_cpus=32 in fresh
subprocesses on the same (pre-generated, page-cache-warmed) input and
reports both throughputs + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import ray

    ray.init(
        address="local",
        num_cpus=ncpu,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import ray.data as rd

    from kgflow.fixtures.pages import pages_for_sf_dir, sf_from_dir

    pages = pages_for_sf_dir(sf_dir)  # generated once, cached under /tmp

    # warm the OS page cache so we measure compute+shuffle, not cold disk
    rd.read_parquet(os.path.join(pages, "pages")).count()

    queries: dict[str, float] = {}
    rows: dict[str, int] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        n = fn()
        queries[name] = round(time.perf_counter() - t0, 3)
        rows[name] = int(n)
        return n

    from kgflow.pipelines.kg import triples_ds

    headline_only = os.environ.get("KGFLOW_HEADLINE_ONLY", "0") == "1"
    if not headline_only:
        # stage visibility: extraction alone (costs a second extraction
        # pass; KGFLOW_HEADLINE_ONLY=1 skips it for scaling runs)
        timed("kg_triples", lambda: triples_ds(pages).count())

    # headline: pages → canonical deduplicated edges (extract + link +
    # canonicalize + dedup), fully streaming except the vocabulary-
    # bounded entity map
    def edges():
        from kgflow.linking.link import canonical_triples
        from kgflow.materialize.edges import dedup_edges

        triples = triples_ds(pages).materialize()
        rows["n_raw_triples"] = triples.count()
        if os.environ.get("KGFLOW_STATS", "0") == "1":
            sys.stderr.write(triples.stats() + "\n")
        canon, _ = canonical_triples(triples)
        out = dedup_edges(canon)
        n = out.count()
        if os.environ.get("KGFLOW_STATS", "0") == "1":
            sys.stderr.write(out.stats() + "\n")
        return n

    timed("kg_edges", edges)
    if headline_only:
        rows.setdefault("kg_triples", rows["n_raw_triples"])

    # training-data ops over the driver tables
    docs_path = os.path.join(sf_dir, "documents.parquet")
    if os.path.exists(docs_path):
        from kgflow.ops.dedup import minhash_pairs
        from kgflow.ops.text import exact_dedup, quality_scores

        timed("doc_exact_dedup", lambda: exact_dedup(rd.read_parquet(docs_path)).count())
        timed("doc_quality", lambda: quality_scores(rd.read_parquet(docs_path)).count())
        timed(
            "doc_minhash_pairs",
            lambda: minhash_pairs(rd.read_parquet(docs_path)).count(),
        )
        from kgflow.ops.dedup import jaccard_pairs

        timed(
            "doc_jaccard_pairs",
            lambda: jaccard_pairs(rd.read_parquet(docs_path)).count(),
        )

    ev_path = os.path.join(sf_dir, "events.parquet")
    if os.path.exists(ev_path):
        from kgflow.ops.window import sessionize

        timed(
            "events_sessions",
            lambda: sessionize(rd.read_parquet(ev_path)).count(),
        )

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if os.path.exists(emb_path):
        import numpy as np
        import pyarrow.parquet as pq

        from kgflow.ops.ann import brute_force_topk

        t = pq.read_table(emb_path, columns=["vec_id", "embedding"])
        df = t.to_pandas().sort_values("vec_id").head(10)
        qids = df["vec_id"].tolist()
        qm = np.asarray(list(df["embedding"]), dtype=np.float32)
        timed(
            "ann_topk",
            lambda: brute_force_topk(rd.read_parquet(emb_path), qids, qm, k=5).count(),
        )

    ray.shutdown()
    return {
        "metric": "end-to-end pages->canonical-edges wall time (headline kg_edges)",
        "value": queries.get("kg_edges"),
        "unit": "sec",
        "queries": queries,
        "rows": rows,
        "sf": sf_from_dir(sf_dir),
        "num_cpus": ncpu,
        # north metric: triples extracted per second over the FULL
        # pages→canonical-edges span
        "triples_per_sec": round(
            rows.get("n_raw_triples", rows.get("kg_triples", 0))
            / queries["kg_edges"],
            1,
        )
        if queries.get("kg_edges")
        else None,
    }


def run_scaling() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # pre-generate the fixture and warm the cache outside the timed runs
    from kgflow.fixtures.pages import pages_for_sf_dir

    pages_for_sf_dir(sf_dir)

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    pair = os.environ.get("KGFLOW_SCALE_PAIR", "8,32").split(",")
    lo_n, hi_n = int(pair[0]), int(pair[1])
    # ≥2 legs: median is the headline (best-of-N supplementary) — this
    # host's ≥8-core legs vary up to ~30% run-to-run, so a single leg
    # (or best-of-N alone) overstates confidence. Legs alternate between
    # levels so both levels sample the same noise windows.
    legs = max(1, int(os.environ.get("KGFLOW_SCALE_LEGS", "1")))
    lo_runs, hi_runs = [], []
    for _ in range(legs):
        lo_runs.append(run(lo_n))
        hi_runs.append(run(hi_n))

    def med(xs):
        xs = sorted(xs)
        n = len(xs)
        return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2

    lo_secs = [r["value"] for r in lo_runs]
    hi_secs = [r["value"] for r in hi_runs]
    lo, hi = lo_runs[0], hi_runs[0]
    med_lo, med_hi = med(lo_secs), med(hi_secs)
    best_lo, best_hi = min(lo_secs), min(hi_secs)
    eff_med = (med_lo / med_hi) / (hi_n / lo_n)
    eff_best = (best_lo / best_hi) / (hi_n / lo_n)
    n_triples = lo["rows"]["kg_triples"]
    return {
        "sf": lo["sf"],
        "legs": legs,
        f"sec_{lo_n}": med_lo,
        f"sec_{hi_n}": med_hi,
        f"sec_{lo_n}_all": lo_secs,
        f"sec_{hi_n}_all": hi_secs,
        f"triples_per_sec_{lo_n}": round(n_triples / med_lo, 1),
        f"triples_per_sec_{hi_n}": round(n_triples / med_hi, 1),
        "scaling_efficiency": round(eff_med, 3),  # MEDIAN = headline
        "scaling_efficiency_best": round(eff_best, 3),
        f"queries_{lo_n}": lo["queries"],
        f"queries_{hi_n}": hi["queries"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
