"""End-to-end KG extraction pipeline assembly (pages → triples).

One streaming ``ray.data.Dataset`` DAG (SURVEY.md §3.4):

    read_parquet(pages)                       # column-pruned at the read
      → map_batches(extract_batch)            # html→text, drops wide binary col
      → map_batches(lang_filter_batch)        # vectorized predicate
      → map_batches(split_sentences_batch)    # 1→k row explosion, keyed (url, sent_id)
      → map_batches(tokenize)                 # ragged list<int32> input_ids
      → map_batches(ExtractTriplesStage, actor pool)
          # ONE fused model pool: stage-1 scores + X1 select → X2
          # fan-out → stage-2 tags + X4 truncate → X5 decode + X6
          # detokenize (weights once per actor, num_gpus in production)

Everything is lazy; the caller consumes with write_parquet / aggregates.
No stage materializes the dataset; order is never relied upon — all rows
carry the (url, sent_id) key.

Sizing (round-3): every stateless step is a task that Ray fuses into
one operator around the SINGLE model actor pool; with one pool there is
no CPU split between model stages to tune (the old light/heavy pools
had a measured 1:5 work ratio, and any static split either hoarded or
starved — see ExtractTriplesStage). Autoscaling
``(pool_min·N, N)`` lets the same code run at num_cpus=2/8/32 without
re-tuning, which is what the N-vs-4N scaling bench exercises.
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
    blocks_per_cpu: int = field(
        default_factory=lambda: int(os.environ.get("KGFLOW_BLOCKS_PER_CPU", "4"))
    )
    # fraction of the CPU budget each pool may autoscale to. Sized to
    # the measured per-stage work ratio (8-cpu/300k-page stats: light
    # op 147 CPU-s vs heavy op 732 CPU-s ≈ 1:5): with light at 0.5 the
    # autoscaler held 4 of 8 CPUs on the cheap stage while the heavy
    # pool starved at ~64% utilization; capping light at 0.25 matches
    # the pools to the work split and lets the heavy pool own the rest.
    # Env-overridable for A/B scaling legs.
    light_pool: float = field(
        default_factory=lambda: float(os.environ.get("KGFLOW_LIGHT_POOL", "0.25"))
    )
    heavy_pool: float = field(
        default_factory=lambda: float(os.environ.get("KGFLOW_HEAVY_POOL", "1.0"))
    )
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
    light_pool_min: float = field(
        default_factory=lambda: float(os.environ.get("KGFLOW_LIGHT_POOL_MIN", "0.125"))
    )
    heavy_pool_min: float = field(
        default_factory=lambda: float(os.environ.get("KGFLOW_HEAVY_POOL_MIN", "0.5"))
    )
    # single-pool layout (default): min fraction of the CPU budget the
    # fused model pool pre-provisions; max is the full budget (Ray's
    # streaming resource manager still reserves task-operator shares,
    # verified no-livelock at 2 CPUs). 0.9 measured A/B: 32-cpu sf0.1
    # headline 16.6/17.0 s (0.5) -> 14.2/14.5 s (autoscale ramp was
    # ~15% of the job); 8-cpu and 2-cpu legs unchanged (34.5 vs 34.9 s;
    # 110.0 vs 110.3 s) because longer jobs amortize the ramp and
    # int(n*min) floors coincide at tiny n.
    pool_min: float = field(
        default_factory=lambda: float(os.environ.get("KGFLOW_POOL_MIN", "0.9"))
    )
    # "1" restores the round-2 two-pool layout (A/B lever; see
    # ExtractTriplesStage docstring for why single-pool is default)
    two_pools: bool = field(
        default_factory=lambda: os.environ.get("KGFLOW_TWO_POOLS", "0") == "1"
    )
    read_columns: list = field(
        default_factory=lambda: ["url", "html", "lang"]
    )
    # "simple" (closed-world stand-in) | "bpe" (learned-subword vocab,
    # trained once per worker — the production M1 path without HF).
    # Env-overridable for A/B runs.
    tokenizer: str = field(
        default_factory=lambda: os.environ.get("KGFLOW_TOKENIZER", "simple")
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
        make_tokenize_fn(cfg.max_seq_length, cfg.tokenizer),
        batch_format="pyarrow",
        batch_size=cfg.tokenize_batch,
    )


def triples_ds(pages_path: str, cfg: KgConfig | None = None) -> "rd.Dataset":
    """pages parquet path → streaming Dataset of extracted triples
    (url, sent_id, rel_id, rel, subj, obj, subj_ids, obj_ids).

    Default layout (round 3): ONE actor pool — the fused
    relation-classify → fan-out → entity-tag → decode model stage
    (`ExtractTriplesStage`) — fed by elastic stateless tasks (read +
    extract + split + tokenize fuse into one task operator). One pool
    means no CPU split between model stages to tune: the measured
    work ratio between the old light/heavy pools was ~1:5, and any
    static split either hoarded CPUs on the cheap stage or starved the
    expensive one (8-cpu heavy-pool utilization 64% → ~95% fused).
    The pool autoscales ``(pool_min·CPUs, CPUs)`` so identical code
    runs at num_cpus=2/8/32 (the N-vs-4N scaling bench) without
    re-tuning.

    ``cfg.two_pools`` (env KGFLOW_TWO_POOLS=1) restores the round-2
    two-pool layout for A/B scaling legs.
    """
    cfg = cfg or KgConfig()
    n = _pool_max()
    ds = encoded_ds(sentences_ds(read_pages(pages_path, cfg), cfg), cfg)
    if not cfg.two_pools:
        from kgflow.stages.tagdecode import ExtractTriplesStage

        return ds.map_batches(
            ExtractTriplesStage,
            fn_constructor_kwargs={
                "seed": cfg.seed,
                "mode": cfg.decode_mode,
                "tok_kind": cfg.tokenizer,
            },
            batch_format="pyarrow",
            batch_size=cfg.model_batch,
            concurrency=(max(1, int(n * cfg.pool_min)), n),
        )
    from kgflow.stages.runtime import get_tokenizer

    tok = get_tokenizer(cfg.tokenizer)
    # two-pool layout: pool minimums pre-provision most capacity at
    # operator start; minimums sum to <1× CPUs so the two pools can
    # always co-schedule
    light_max = max(1, int(n * cfg.light_pool))
    heavy_max = max(1, int(n * cfg.heavy_pool))
    ds = ds.map_batches(
        RelClassifyStage,
        fn_constructor_kwargs={"seed": cfg.seed, "tok_kind": cfg.tokenizer},
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
        fn_constructor_kwargs={
            "seed": cfg.seed,
            "mode": cfg.decode_mode,
            "tok_kind": cfg.tokenizer,
        },
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
