"""Recorded-logits execution of the HF adapter boundary (round-4
verdict item 6): inject minimal fake `torch`/`transformers` modules
whose models REPLAY the deterministic stub scorers' outputs (rel
probabilities shipped as logit(p), NER logits verbatim), then run the
full no-Ray stage chain through `use_hf_backend`. Every line of
kgflow/adapters/hf.py executes — tokenizer special-token registration,
vocab resize, tensor plumbing, sigmoid, model_hash — and the extracted
triples match the stub backend exactly, so the adapter's data flow
(not just its signatures) is pinned without torch in the container."""

import sys
import types

import numpy as np
import pyarrow as pa
import pytest

from kgflow.fixtures import corpus
from kgflow.fixtures.stub_model import StubNerModel, StubRelModel
from kgflow.stages.tokenize import SimpleTokenizer


class _FakeTensor:
    def __init__(self, arr):
        self.arr = np.asarray(arr)

    def cpu(self):
        return self

    def detach(self):
        return self

    def numpy(self):
        return self.arr

    def astype(self, dt):
        return self.arr.astype(dt)

    def tobytes(self):
        return self.arr.tobytes()


class _NoGrad:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _fake_torch():
    m = types.ModuleType("torch")
    m.as_tensor = lambda x, device=None: _FakeTensor(np.asarray(x))
    m.no_grad = _NoGrad
    m.sigmoid = lambda t: _FakeTensor(1.0 / (1.0 + np.exp(-t.arr)))
    return m


class _FakeHFTokenizer:
    """HF BertTokenizer surface over the deterministic SimpleTokenizer
    id space, so the replayed stub models see their own vocab."""

    def __init__(self):
        self._st = SimpleTokenizer()
        self.added = None

    def add_special_tokens(self, d):
        self.added = list(d["additional_special_tokens"])

    def convert_tokens_to_ids(self, tok):
        return self._st.vocab[tok]

    def __len__(self):
        return self._st.vocab_size

    def tokenize(self, text):
        return self._st.tokenize(text)

    def encode(self, text, add_special_tokens=True, truncation=False, max_length=None):
        return self._st.encode(
            text,
            add_special_tokens=add_special_tokens,
            max_length=max_length if truncation else None,
        )

    def convert_ids_to_tokens(self, ids):
        return self._st.convert_ids_to_tokens(ids)

    def convert_tokens_to_string(self, tokens):
        return self._st.convert_tokens_to_string(tokens)

    def get_vocab(self):
        return dict(self._st.vocab)


class _FakeRelModel:
    def __init__(self, num_labels):
        self._stub = StubRelModel(SimpleTokenizer())
        self.resized_to = None
        rng = np.random.RandomState(0)
        self._param = _FakeTensor(rng.randn(4).astype(np.float32))

    def resize_token_embeddings(self, n):
        self.resized_to = n

    def to(self, device):
        return self

    def eval(self):
        return self

    def parameters(self):
        yield self._param

    def __call__(self, input_ids=None, attention_mask=None):
        p = self._stub.sigmoid(input_ids.numpy(), attention_mask.numpy())
        p = np.clip(p.astype(np.float64), 1e-9, 1 - 1e-9)
        # ship logit(p): the adapter's torch.sigmoid recovers p exactly
        # to float32 — the recorded-output replay
        return types.SimpleNamespace(
            logits=_FakeTensor(np.log(p / (1.0 - p)))
        )


class _FakeNerModel:
    def __init__(self, num_labels):
        self._stub = StubNerModel(SimpleTokenizer())
        self.resized_to = None
        rng = np.random.RandomState(1)
        self._param = _FakeTensor(rng.randn(4).astype(np.float32))

    def resize_token_embeddings(self, n):
        self.resized_to = n

    def to(self, device):
        return self

    def eval(self):
        return self

    def parameters(self):
        yield self._param

    def __call__(self, input_ids=None, attention_mask=None):
        return types.SimpleNamespace(
            logits=_FakeTensor(
                self._stub.logits(input_ids.numpy(), attention_mask.numpy())
            )
        )


def _fake_transformers(created):
    m = types.ModuleType("transformers")

    class AutoTokenizer:
        @staticmethod
        def from_pretrained(name):
            t = _FakeHFTokenizer()
            created["tokenizer"] = t
            return t

    class AutoModelForSequenceClassification:
        @staticmethod
        def from_pretrained(path, num_labels=None, problem_type=None):
            mdl = _FakeRelModel(num_labels)
            created["rel"] = mdl
            return mdl

    class AutoModelForTokenClassification:
        @staticmethod
        def from_pretrained(path, num_labels=None):
            mdl = _FakeNerModel(num_labels)
            created["ner"] = mdl
            return mdl

    m.AutoTokenizer = AutoTokenizer
    m.AutoModelForSequenceClassification = AutoModelForSequenceClassification
    m.AutoModelForTokenClassification = AutoModelForTokenClassification
    return m


@pytest.fixture()
def hf_backend(monkeypatch):
    created = {}
    monkeypatch.setitem(sys.modules, "torch", _fake_torch())
    monkeypatch.setitem(sys.modules, "transformers", _fake_transformers(created))
    from kgflow.stages import runtime

    yield created
    # restore the stub backend for every later test
    from kgflow.fixtures.stub_model import StubNerModel as N, StubRelModel as R

    runtime.set_backend(SimpleTokenizer, R, N)


def _chain_triples(texts):
    from kgflow.stages.decode import DecodeStage
    from kgflow.stages.entitytag import EntityTagStage
    from kgflow.stages.fanout import make_fanout_fn
    from kgflow.stages.relclassify import RelClassifyStage
    from kgflow.stages.runtime import get_tokenizer
    from kgflow.stages.tokenize import TokenizeStage

    tok = get_tokenizer()
    chain = [
        TokenizeStage(tokenizer=tok),
        RelClassifyStage(),
        make_fanout_fn(tok.start_idx),
        EntityTagStage(),
        DecodeStage(tokenizer=tok),
    ]
    tbl = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(len(texts))]),
            "sent_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = tbl
    for stage in chain:
        out = stage(out)
    rows = sorted(
        zip(
            out.column("sent_id").to_pylist(),
            out.column("rel").to_pylist(),
            out.column("subj").to_pylist(),
            out.column("obj").to_pylist(),
        )
    )
    return rows


def test_hf_adapter_executes_and_matches_stub_backend(hf_backend):
    from kgflow.adapters.hf import use_hf_backend
    from kgflow.stages import runtime

    texts = [corpus.make_sentence(91_000 + i, i % 3)[0] for i in range(60)]
    stub_rows = _chain_triples(texts)  # default backend

    use_hf_backend("bert-base-cased", num_relations=corpus.NUM_RELATIONS)
    try:
        hf_rows = _chain_triples(texts)
    finally:
        pass  # fixture restores the backend

    assert len(stub_rows) > 20
    assert hf_rows == stub_rows

    # adapter construction details actually ran:
    tok = hf_backend["tokenizer"]
    assert tok.added == [
        f"[relation{k}]" for k in range(corpus.NUM_RELATIONS)
    ]
    st = SimpleTokenizer()
    assert hf_backend["rel"].resized_to == st.vocab_size
    assert hf_backend["ner"].resized_to == st.vocab_size

    # model_hash / vocab_hash adapter lines execute and are stable
    hf_tok = runtime.get_tokenizer()
    assert len(hf_tok.vocab_hash()) == 16
    assert len(runtime.get_rel_model().model_hash()) == 16
    assert len(runtime.get_ner_model().model_hash()) == 16


def test_hf_adapter_encode_truncation_path(hf_backend):
    from kgflow.adapters.hf import HFTokenizerAdapter

    tok = HFTokenizerAdapter("bert-base-cased", num_relations=corpus.NUM_RELATIONS)
    text = "alice fox was born in osaka ."
    full = tok.encode(text)
    assert tok.decode_span(full[1:-1]) == text
    short = tok.encode(text, max_length=5)
    assert len(short) == 5
    assert tok.tokenize(text)[0] == "alice"
    assert tok.start_idx == SimpleTokenizer().start_idx
    assert tok.vocab_size == SimpleTokenizer().vocab_size
