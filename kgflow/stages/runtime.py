"""Per-worker-process singletons for tokenizer and models, with a
pluggable backend.

Stages that run as stateless Ray TASKS (tokenize, fan-out) still need the
tokenizer; building it per batch would repeat setup work, and shipping it
in every closure would re-serialize it. Instead each worker process
builds it once via these cached getters (the task-equivalent of doing
setup in an actor's ``__init__``). Actor stages keep using their
``__init__`` directly.

Backend swap: the default backend is the deterministic stub pair
(`kgflow/fixtures/stub_model.py`); a deployment with torch installed
calls ``kgflow.adapters.hf.use_hf_backend(...)`` (which calls
``set_backend``) to route these getters to real HF BERT models behind
the identical duck-typed surface. ``set_backend`` clears the caches so
stages built afterwards pick up the new models.
"""

from __future__ import annotations

from functools import lru_cache

from kgflow.fixtures.stub_model import StubNerModel, StubRelModel
from kgflow.stages.tokenize import SimpleTokenizer

_tokenizer_factory = SimpleTokenizer
_rel_factory = StubRelModel
_ner_factory = StubNerModel


def set_backend(tokenizer_factory, rel_factory, ner_factory) -> None:
    """Replace the model backend (see module docstring). Factories:
    ``tokenizer_factory() -> tokenizer``,
    ``rel_factory(tokenizer, seed) -> rel model``,
    ``ner_factory(tokenizer, seed) -> ner model``."""
    global _tokenizer_factory, _rel_factory, _ner_factory
    _tokenizer_factory = tokenizer_factory
    _rel_factory = rel_factory
    _ner_factory = ner_factory
    get_tokenizer.cache_clear()
    get_rel_model.cache_clear()
    get_ner_model.cache_clear()


def _bpe_tokenizer():
    from kgflow.stages.tokenize import BpeTokenizer

    return BpeTokenizer()


#: named tokenizer kinds selectable per pipeline run (KgConfig.tokenizer
#: / KGFLOW_TOKENIZER). "simple" routes through the swappable backend
#: factory (`set_backend`); "bpe" is the learned-subword production path
#: (trained once per worker process inside this cached getter — the
#: per-actor-setup pattern, like a model load).
_KIND_FACTORIES = {"bpe": _bpe_tokenizer}


@lru_cache(maxsize=4)
def get_tokenizer(kind: str = "simple"):
    if kind == "simple":
        return _tokenizer_factory()
    return _KIND_FACTORIES[kind]()


@lru_cache(maxsize=8)
def get_rel_model(seed: int = 42, kind: str = "simple"):
    return _rel_factory(get_tokenizer(kind), seed)


@lru_cache(maxsize=8)
def get_ner_model(seed: int = 42, kind: str = "simple"):
    return _ner_factory(get_tokenizer(kind), seed)
