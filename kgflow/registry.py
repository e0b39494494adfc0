"""Stage registry + config-driven pipeline assembly.

≙ the reference's extension surface (SURVEY.md §2.11): OpenUE swaps
data/model/litmodel classes by NAME through ``_import_class``
(`/root/reference/main.py:19-25`) and switches feature builders with
``--task_name`` (`data/data_module.py:64`). The engine's equivalent: a
registry of named stage factories; a pipeline is a list of stage names
(+kwargs) applied left-to-right to a Dataset. A user-defined stage is
any callable (batch fn or actor class) registered under a name — the
UDF hook is ``map_batches`` itself.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

import ray.data as rd


@dataclass
class StageSpec:
    """How to mount one stage onto a Dataset."""

    factory: Callable[..., Any]  # returns a batch fn OR an actor class
    is_actor: bool = False
    batch_format: str = "pyarrow"
    default_kwargs: dict = field(default_factory=dict)


_REGISTRY: dict[str, StageSpec] = {}


def register(name: str, spec: StageSpec) -> None:
    _REGISTRY[name] = spec


def get(name: str) -> StageSpec:
    return _REGISTRY[name]


def available() -> list[str]:
    return sorted(_REGISTRY)


def apply_stage(ds: "rd.Dataset", name: str, **kwargs) -> "rd.Dataset":
    spec = _REGISTRY[name]
    merged = {**spec.default_kwargs, **kwargs}
    if spec.is_actor:
        concurrency = merged.pop("concurrency", (1, 4))
        return ds.map_batches(
            spec.factory,
            fn_constructor_kwargs=merged,
            batch_format=spec.batch_format,
            concurrency=concurrency,
        )
    return ds.map_batches(spec.factory(**merged), batch_format=spec.batch_format)


def build_pipeline(ds: "rd.Dataset", stages: list) -> "rd.Dataset":
    """stages: list of names or (name, kwargs) pairs, applied in order."""
    for s in stages:
        if isinstance(s, str):
            ds = apply_stage(ds, s)
        else:
            name, kwargs = s
            ds = apply_stage(ds, name, **kwargs)
    return ds


def _tokenizer():
    # runtime-backed: honors kgflow.stages.runtime.set_backend swaps
    from kgflow.stages.runtime import get_tokenizer

    return get_tokenizer()


def _register_builtins() -> None:
    from kgflow.stages.extract import extract_batch
    from kgflow.stages.fanout import make_fanout_fn
    from kgflow.stages.relclassify import RelClassifyStage
    from kgflow.stages.sentences import lang_filter_batch, split_sentences_batch
    from kgflow.stages.tagdecode import TagDecodeStage
    from kgflow.stages.tokenize import make_tokenize_fn

    register("extract", StageSpec(lambda: extract_batch))
    register(
        "lang_filter",
        StageSpec(lambda lang="en": (lambda b: lang_filter_batch(b, lang))),
    )
    register("split_sentences", StageSpec(lambda: split_sentences_batch))
    register(
        "tokenize",
        StageSpec(lambda max_seq_length=256: make_tokenize_fn(max_seq_length)),
    )
    register("rel_classify", StageSpec(RelClassifyStage, is_actor=True))
    register(
        "fanout",
        StageSpec(lambda: make_fanout_fn(_tokenizer().start_idx)),
    )
    register("tag_decode", StageSpec(TagDecodeStage, is_actor=True))

    # corpus-cleaning stages (per-batch; see kgflow/ops/clean.py)
    from kgflow.ops.clean import NormalizeText, RedactPII

    register(
        "redact_pii", StageSpec(RedactPII, is_actor=True, batch_format="pandas")
    )
    register(
        "normalize_text",
        StageSpec(NormalizeText, is_actor=True, batch_format="pandas"),
    )


_register_builtins()
