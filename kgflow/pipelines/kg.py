"""End-to-end KG extraction pipeline assembly (pages → triples).

One streaming ``ray.data.Dataset`` DAG (SURVEY.md §3.4):

    read_parquet(pages)                       # column-pruned at the read
      → map_batches(extract_batch)            # html→text, drops wide binary col
      → map_batches(lang_filter_batch)        # vectorized predicate
      → map_batches(split_sentences_batch)    # 1→k row explosion, keyed (url, sent_id)
      → map_batches(TokenizeStage, actor)     # ragged list<int32> input_ids
      → map_batches(RelClassifyStage, actor)  # stage-1 scores + X1 select
      → map_batches(fanout)                   # X2: only selected rows built
      → map_batches(EntityTagStage, actor)    # stage-2 tags + X4 truncate
      → map_batches(DecodeStage, actor)       # X5 decode + X6 detokenize

Everything is lazy; the caller consumes with write_parquet / aggregates.
No stage materializes the dataset; order is never relied upon — all rows
carry the (url, sent_id) key.

Sizing: the two model stages are actor pools (weights once per actor,
``num_gpus`` in production); autoscaling ``concurrency=(1, N)`` lets the
same code run at num_cpus=8 and num_cpus=32 without re-tuning, which is
what the N-vs-4N scaling bench exercises.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import ray.data as rd

from kgflow.stages.extract import extract_batch
from kgflow.stages.fanout import make_fanout_fn
from kgflow.stages.relclassify import RelClassifyStage
from kgflow.stages.sentences import lang_filter_batch, split_sentences_batch
from kgflow.stages.tagdecode import TagDecodeStage
from kgflow.stages.tokenize import SimpleTokenizer, make_tokenize_fn


def _pool_max() -> int:
    """Upper bound for actor-pool autoscaling: the session CPU budget."""
    try:
        import ray

        n = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n = 8
    return max(2, n)


@dataclass
class KgConfig:
    max_seq_length: int = 256
    seed: int = 42
    lang: str = "en"
    drop_titles: bool = False
    # "triple" | "event" — ≙ the reference task_name switch
    # ("event" in task_name selects event_process, models/model.py:148-154)
    decode_mode: str = "triple"
    # Parallelism granularity: map_batches parallelism is per BLOCK, and
    # an explicit batch_size makes Ray BUNDLE consecutive blocks until a
    # bundle reaches that many rows — collapsing task parallelism
    # (observed: 3 tasks on an 8-CPU cluster with batch_size=2048 over
    # 625-row blocks). So the stages use per-block batches
    # (batch_size=None) and the ONE parallelism knob is read
    # granularity: blocks_per_cpu × CPUs blocks at the read, which also
    # caps the post-fan-out [rows, maxlen] arrays per task.
    tokenize_batch: int | None = None
    model_batch: int | None = None
    # ~2-4 blocks per CPU: enough tasks for load balance (a few waves
    # per actor) without paying the ~15 ms per actor-task submission
    # overhead hundreds of times on a small job
    blocks_per_cpu: int = 4
    # fraction of the CPU budget each pool may autoscale to
    light_pool: float = 0.5
    heavy_pool: float = 1.0
    # pool MINIMUMS (pre-provisioned actors) as CPU fractions, now
    # tunable. A/B legs at 8 CPUs / 300k pages found no advantage
    # beyond noise for higher minimums (host phase drift of ~25%
    # swamps the autoscaler-ramp cost), so the defaults stay at the
    # round-1 values. HARD CONSTRAINT if tuning: the sum must stay
    # strictly below 1.0 — minimums equal to the whole CPU budget
    # deadlock any execution where a task operator (e.g. a lazy
    # .count() aggregation) is live while both pools hold their
    # floors; actors pin their CPU reservation, so the task can never
    # schedule (observed hang at mins 3+5 on an 8-CPU session).
    light_pool_min: float = 0.25
    heavy_pool_min: float = 0.5
    read_columns: list = field(
        default_factory=lambda: ["url", "html", "lang"]
    )


def read_pages(pages_path: str, cfg: KgConfig | None = None) -> "rd.Dataset":
    cfg = cfg or KgConfig()
    path = pages_path
    if os.path.isdir(pages_path):
        for cand in ("pages", "pages.parquet"):
            p = os.path.join(pages_path, cand)
            if os.path.exists(p):
                path = p
                break
    return rd.read_parquet(
        path,
        columns=cfg.read_columns,
        override_num_blocks=_pool_max() * cfg.blocks_per_cpu,
    )


def sentences_ds(pages: "rd.Dataset", cfg: KgConfig | None = None) -> "rd.Dataset":
    cfg = cfg or KgConfig()
    ds = pages.map_batches(extract_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        lambda b: lang_filter_batch(b, cfg.lang), batch_format="pyarrow"
    )
    ds = ds.map_batches(split_sentences_batch, batch_format="pyarrow")
    if cfg.drop_titles:
        from kgflow.stages.sentences import drop_title_rows

        ds = ds.map_batches(drop_title_rows, batch_format="pyarrow")
    return ds


def encoded_ds(sentences: "rd.Dataset", cfg: KgConfig | None = None) -> "rd.Dataset":
    cfg = cfg or KgConfig()
    # stateless task: fuses with the extract/split chain; tokenizer is a
    # per-worker-process singleton (kgflow.stages.runtime)
    return sentences.map_batches(
        make_tokenize_fn(cfg.max_seq_length),
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch,
    )


def triples_ds(pages_path: str, cfg: KgConfig | None = None) -> "rd.Dataset":
    """pages parquet path → streaming Dataset of extracted triples
    (url, sent_id, rel_id, rel, subj, obj, subj_ids, obj_ids).

    Exactly TWO actor pools (the two model stages); everything else is
    elastic stateless tasks that fuse around them. Each pool autoscales
    ``(1, frac·CPUs)`` so the identical code runs at num_cpus=8 and 32
    (the N-vs-4N scaling bench) without re-tuning, and the pools can
    never reserve every CPU (which would starve the read/shuffle tasks —
    observed as a live-lock on small clusters with one pool per stage).
    """
    cfg = cfg or KgConfig()
    n = _pool_max()
    from kgflow.stages.runtime import get_tokenizer

    tok = get_tokenizer()
    ds = encoded_ds(sentences_ds(read_pages(pages_path, cfg), cfg), cfg)
    # pool minimums pre-provision most capacity at operator start —
    # autoscaling from 1 actor was measured to cost several seconds of
    # ramp on a 32-CPU run; minimums sum to <1× CPUs so the two pools
    # can always co-schedule
    light_max = max(1, int(n * cfg.light_pool))
    heavy_max = max(1, int(n * cfg.heavy_pool))
    ds = ds.map_batches(
        RelClassifyStage,
        fn_constructor_kwargs={"seed": cfg.seed},
        batch_format="pyarrow",
        batch_size=cfg.model_batch,
        concurrency=(max(1, int(n * cfg.light_pool_min)), light_max),
    )
    ds = ds.map_batches(
        make_fanout_fn(tok.start_idx), batch_format="pyarrow",
        batch_size=cfg.model_batch,
    )
    # post-explosion batch capped so [rows, maxlen] tensors stay bounded
    ds = ds.map_batches(
        TagDecodeStage,
        fn_constructor_kwargs={"seed": cfg.seed, "mode": cfg.decode_mode},
        batch_format="pyarrow",
        batch_size=cfg.model_batch,
        concurrency=(max(1, int(n * cfg.heavy_pool_min)), heavy_max),
    )
    return ds


def events_ds(pages_path: str, cfg: KgConfig | None = None) -> "rd.Dataset":
    """Event-mode variant of the flagship pipeline (X7): pages →
    (url, sent_id, event_type, role, argument)."""
    cfg = cfg or KgConfig()
    from dataclasses import replace

    return triples_ds(pages_path, replace(cfg, decode_mode="event"))
