"""Per-worker-process singletons for tokenizer and stub models.

Stages that run as stateless Ray TASKS (tokenize, fan-out) still need the
tokenizer; building it per batch would repeat setup work, and shipping it
in every closure would re-serialize it. Instead each worker process
builds it once via these cached getters (the task-equivalent of doing
setup in an actor's ``__init__``). Actor stages keep using their
``__init__`` directly.
"""

from __future__ import annotations

from functools import lru_cache

from kgflow.fixtures.stub_model import StubNerModel, StubRelModel
from kgflow.stages.tokenize import SimpleTokenizer


@lru_cache(maxsize=1)
def get_tokenizer() -> SimpleTokenizer:
    return SimpleTokenizer()


@lru_cache(maxsize=4)
def get_rel_model(seed: int = 42) -> StubRelModel:
    return StubRelModel(get_tokenizer(), seed)


@lru_cache(maxsize=4)
def get_ner_model(seed: int = 42) -> StubNerModel:
    return StubNerModel(get_tokenizer(), seed)
