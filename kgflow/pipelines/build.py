"""Resumable three-phase KG build: extract → link → materialize.

Phase structure (SURVEY.md §7 steps 7-9) — this is the ``ray job
submit`` entry for a production run:

  A. **Extract** (per input shard, resumable): pages → triples,
     written to ``out/triples/shard=K/`` atomically; one manifest commit
     per shard with lineage (input files / url-hash class, model +
     vocab hashes) and metrics (sentence/triple counts). A re-run skips
     committed shards exactly.
  B. **Link** (one global job over phase-A output): mention → entity
     map, written to ``out/entity_map/``; manifest-committed as a unit.
  C. **Materialize** (streaming over phase-A output + broadcast entity
     map): canonical edges deduped, bucket-sorted, written partitioned by
     ``subj_bucket``; nodes table from the entity map.

Sharding: if the input directory has ≥ ``shards`` parquet files, a shard
is a file subset (production layout: thousands of WARC-derived files —
pure file-level resume, no refiltering). Otherwise (single-file test
fixture) a shard is the url-hash class ``fnv64(url) % shards``, applied
as a vectorized filter after the read.

Phase A re-reads nothing on resume; phases B/C re-read only phase-A
Parquet (columnar, pruned), never the raw pages.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import ray.data as rd

from kgflow.linking.link import entity_map
from kgflow.linking.minhash import shard_of
from kgflow.materialize.edges import dedup_edges, nodes_table
from kgflow.materialize.manifest import Manifest, atomic_replace_dir
from kgflow.pipelines.kg import KgConfig, sentences_ds, encoded_ds, read_pages
from kgflow.stages.fanout import make_fanout_fn
from kgflow.stages.relclassify import RelClassifyStage
from kgflow.stages.runtime import get_ner_model, get_rel_model, get_tokenizer
from kgflow.stages.tagdecode import TagDecodeStage


def _input_files(pages_path: str) -> list[str]:
    if os.path.isdir(pages_path):
        part_dir = os.path.join(pages_path, "pages")
        if os.path.isdir(part_dir):
            # fixture layout: pages/ is a directory of part files (real
            # corpora layout) beside the gold tables → file-level shards
            return sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
        single = os.path.join(pages_path, "pages.parquet")
        if os.path.exists(single):
            return [single]
        return sorted(glob.glob(os.path.join(pages_path, "*.parquet")))
    return [pages_path]


def _triples_for_shard(
    pages_path: str, shard: int, shards: int, cfg: KgConfig
) -> "rd.Dataset":
    files = _input_files(pages_path)
    import ray

    ncpu = max(2, int(ray.cluster_resources().get("CPU", 8)))
    if len(files) >= shards:
        shard_files = [f for i, f in enumerate(files) if i % shards == shard]
        ds = rd.read_parquet(
            shard_files,
            columns=cfg.read_columns,
            override_num_blocks=max(ncpu * 2, len(shard_files)),
        )
    else:
        ds = read_pages(pages_path, cfg)

        def url_filter(batch: pa.Table) -> pa.Table:
            urls = batch.column("url").to_pylist()
            keep = np.fromiter(
                (shard_of(u, shards) == shard for u in urls),
                dtype=bool,
                count=len(urls),
            )
            return batch.filter(pa.array(keep))

        ds = ds.map_batches(url_filter, batch_format="pyarrow")
    n = ncpu
    tok = get_tokenizer()
    ds = encoded_ds(sentences_ds(ds, cfg), cfg)
    ds = ds.map_batches(
        RelClassifyStage,
        fn_constructor_kwargs={"seed": cfg.seed},
        batch_format="pyarrow",
        batch_size=cfg.model_batch,
        concurrency=(1, max(1, n // 2)),
    )
    ds = ds.map_batches(
        make_fanout_fn(tok.start_idx), batch_format="pyarrow", batch_size=cfg.model_batch
    )
    return ds.map_batches(
        TagDecodeStage,
        fn_constructor_kwargs={"seed": cfg.seed},
        batch_format="pyarrow",
        batch_size=cfg.model_batch,
        concurrency=(1, n),
    )


def lineage_hashes(cfg: KgConfig) -> dict:
    tok = get_tokenizer()
    return {
        "vocab_hash": tok.vocab_hash(),
        "rel_model_hash": get_rel_model(cfg.seed).model_hash(),
        "ner_model_hash": get_ner_model(cfg.seed).model_hash(),
        "max_seq_length": cfg.max_seq_length,
        "seed": cfg.seed,
    }


def build_kg(
    pages_path: str,
    out_dir: str,
    cfg: KgConfig | None = None,
    shards: int = 8,
    num_buckets: int = 16,
    fail_after_shards: int | None = None,
    fail_after_buckets: int | None = None,
) -> dict:
    """Run (or resume) the full build. Returns summary counts.

    ``fail_after_shards`` injects a crash after K phase-A commits;
    ``fail_after_buckets`` injects one after K phase-C subj_bucket
    commits — both used by the resume tests (SURVEY.md §5.2 test #5,
    extract and sink granularity).
    """
    cfg = cfg or KgConfig()
    man = Manifest(out_dir)
    hashes = lineage_hashes(cfg)
    files = _input_files(pages_path)

    def done_under_current_config(phase: str) -> set:
        # resume safety: a committed partition only counts as done if it
        # was built under the SAME lineage (vocab/model hashes,
        # max_seq_length, seed) — resuming after a config change must
        # rebuild, not silently mix two configs in one output
        return {
            p
            for p, rec in man.committed(phase).items()
            if rec.get("lineage") == hashes
        }

    # ---- phase A: extract per shard ------------------------------------
    done = done_under_current_config("extract")
    n_new = 0
    for shard in range(shards):
        part = f"shard={shard}"
        if part in done:
            continue
        ds = _triples_for_shard(pages_path, shard, shards, cfg)
        tmp = os.path.join(out_dir, f"_tmp_triples_{shard}_{os.getpid()}")
        shutil.rmtree(tmp, ignore_errors=True)  # same-pid rerun: Ray's
        # write_parquet ADDS files to an existing dir, never clears it
        ds.write_parquet(tmp)
        os.makedirs(tmp, exist_ok=True)  # a zero-row write creates nothing
        import pyarrow.parquet as pq

        rows = sum(
            pq.read_metadata(f).num_rows for f in glob.glob(os.path.join(tmp, "*"))
        )
        final = os.path.join(out_dir, "triples", part)
        atomic_replace_dir(tmp, final)
        man.commit(
            "extract",
            part,
            input_shard={
                "files": [f for i, f in enumerate(files) if i % shards == shard]
                if len(files) >= shards
                else files,
                "url_hash_mod": None if len(files) >= shards else [shards, shard],
            },
            lineage=hashes,
            metrics={"triples": rows},
        )
        n_new += 1
        if fail_after_shards is not None and n_new >= fail_after_shards:
            raise RuntimeError(f"injected failure after {n_new} shards")

    triples = rd.read_parquet(os.path.join(out_dir, "triples"))

    # ---- phase B: entity linking ---------------------------------------
    if "entity_map" not in done_under_current_config("link"):
        emap = entity_map(triples, seed=cfg.seed)
        tmp = os.path.join(out_dir, f"_tmp_emap_{os.getpid()}")
        shutil.rmtree(tmp, ignore_errors=True)
        emap.write_parquet(tmp)
        atomic_replace_dir(tmp, os.path.join(out_dir, "entity_map"))
        man.commit("link", "entity_map", lineage=hashes)

    emap_ds = rd.read_parquet(os.path.join(out_dir, "entity_map"))

    # ---- phase C: canonical edges + nodes ------------------------------
    # Per-BUCKET commits at the sink (round-5, SURVEY §5.2 test #5 at
    # headline granularity): each subj_bucket partition is renamed into
    # place and manifest-committed individually, and a resume pushes the
    # missing-bucket predicate DOWN into the canonicalize stream — the
    # dedup shuffle and the write only ever carry rows of uncommitted
    # buckets, so a crash after K of num_buckets commits recomputes
    # exactly num_buckets − K partitions' worth of edge work.
    edone = done_under_current_config("materialize_edges")
    missing = [
        b for b in range(num_buckets) if f"subj_bucket={b}" not in edone
    ]
    if missing:
        # auto-selects broadcast vs bucketed-shuffle join on the
        # distinct-mention count (round-3: the broadcast join is no
        # longer the only way to APPLY a corpus-scale entity map)
        from kgflow.linking.link import canonicalize_triples_with_map

        canon = canonicalize_triples_with_map(triples, emap_ds)
        if len(missing) < num_buckets:
            from kgflow.ops.shuffle import add_hash_bucket

            keep = frozenset(missing)

            def only_missing(df):
                b = add_hash_bucket(df, ["subj_id"], num_buckets)
                return df[b["bucket"].isin(keep)]

            canon = canon.map_batches(only_missing, batch_format="pandas")
        edges = dedup_edges(canon, num_buckets=num_buckets)
        staging = os.path.join(out_dir, f"_tmp_edges_{os.getpid()}")
        # a crashed same-process attempt leaves its staging behind and
        # write_parquet appends rather than replaces — clear it first
        shutil.rmtree(staging, ignore_errors=True)
        edges.write_parquet(staging, partition_cols=["subj_bucket"])
        n_done = 0
        for b in missing:
            src = os.path.join(staging, f"subj_bucket={b}")
            os.makedirs(src, exist_ok=True)  # empty bucket writes nothing
            atomic_replace_dir(
                src, os.path.join(out_dir, "edges", f"subj_bucket={b}")
            )
            man.commit(
                "materialize_edges",
                f"subj_bucket={b}",
                lineage=hashes,
                metrics={"buckets": num_buckets},
            )
            n_done += 1
            if fail_after_buckets is not None and n_done >= fail_after_buckets:
                raise RuntimeError(
                    f"injected failure after {n_done} bucket commits"
                )
        shutil.rmtree(staging, ignore_errors=True)
    if "nodes" not in done_under_current_config("materialize"):
        nodes = nodes_table(emap_ds)
        tmp = os.path.join(out_dir, f"_tmp_nodes_{os.getpid()}")
        nodes.write_parquet(tmp)
        atomic_replace_dir(tmp, os.path.join(out_dir, "nodes"))
        man.commit("materialize", "nodes", lineage=hashes)

    edges_n = rd.read_parquet(os.path.join(out_dir, "edges")).count()
    nodes_n = rd.read_parquet(os.path.join(out_dir, "nodes")).count()
    return {"edges": edges_n, "nodes": nodes_n, "shards": shards}
