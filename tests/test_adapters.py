"""Real-model adapter boundary tests (no torch in this container):
the HF adapters must expose exactly the duck-typed surface the stubs
expose, so swapping backends cannot break a stage signature."""

import inspect

import pytest

from kgflow.adapters.hf import (
    HFNerModelAdapter,
    HFRelModelAdapter,
    HFTokenizerAdapter,
)
from kgflow.fixtures.stub_model import StubNerModel, StubRelModel
from kgflow.stages.tokenize import SimpleTokenizer

TOKENIZER_SURFACE = [
    "tokenize",
    "encode",
    "convert_ids_to_tokens",
    "convert_tokens_to_string",
    "decode_span",
    "vocab_hash",
]


def _params(cls, name):
    return list(inspect.signature(getattr(cls, name)).parameters)


def test_tokenizer_adapter_surface_matches_stub():
    for m in TOKENIZER_SURFACE:
        assert hasattr(HFTokenizerAdapter, m), m
        assert _params(SimpleTokenizer, m) == _params(HFTokenizerAdapter, m), m


def test_rel_model_adapter_surface_matches_stub():
    assert _params(StubRelModel, "sigmoid") == _params(HFRelModelAdapter, "sigmoid")
    assert _params(StubRelModel, "model_hash") == _params(
        HFRelModelAdapter, "model_hash"
    )
    # constructor: adapter accepts the stub's (tokenizer, seed) plus
    # deployment kwargs (weights_path, device) with defaults
    stub_p = _params(StubRelModel, "__init__")
    hf_p = _params(HFRelModelAdapter, "__init__")
    assert hf_p[: len(stub_p)] == stub_p
    for extra in hf_p[len(stub_p):]:
        param = inspect.signature(HFRelModelAdapter.__init__).parameters[extra]
        assert param.default is not inspect.Parameter.empty, extra


def test_ner_model_adapter_surface_matches_stub():
    assert _params(StubNerModel, "logits") == _params(HFNerModelAdapter, "logits")
    assert _params(StubNerModel, "model_hash") == _params(
        HFNerModelAdapter, "model_hash"
    )
    stub_p = _params(StubNerModel, "__init__")
    hf_p = _params(HFNerModelAdapter, "__init__")
    assert hf_p[: len(stub_p)] == stub_p


def test_adapters_raise_clear_error_without_torch():
    with pytest.raises(ImportError, match="torch"):
        HFTokenizerAdapter()


def test_set_backend_swaps_and_restores():
    from kgflow.stages import runtime

    class FakeTok(SimpleTokenizer):
        pass

    try:
        runtime.set_backend(FakeTok, StubRelModel, StubNerModel)
        assert type(runtime.get_tokenizer()) is FakeTok
        assert isinstance(runtime.get_rel_model(7), StubRelModel)
    finally:
        runtime.set_backend(SimpleTokenizer, StubRelModel, StubNerModel)
    assert type(runtime.get_tokenizer()) is SimpleTokenizer
