"""Real-model adapter boundary: HuggingFace BERT behind the stub API.

The reference pipeline loads a HF tokenizer and two BERT models
(`/root/reference/src/openue/data/data_module.py:19-35` adds the
``[relation0..K]`` special tokens; `models/model.py:140-197` builds
BertForRelationClassification / the NER head). This container has no
torch/transformers, so the engine runs on deterministic stand-ins
(`kgflow/fixtures/stub_model.py`, `kgflow/stages/tokenize.py`) — but the
swap boundary is THIS module: each adapter exposes exactly the
duck-typed surface the pipeline stages consume, so a deployment with
torch installed switches backends with one `set_backend` call and zero
stage changes:

    from kgflow.adapters.hf import use_hf_backend
    use_hf_backend("bert-base-cased", rel_weights="/path/rel.bin",
                   ner_weights="/path/ner.bin")
    # then build pipelines as usual; GPU stages: pass num_gpus=1 /
    # concurrency=#GPUs to the RelClassify/TagDecode map_batches calls
    # (kgflow/pipelines/kg.py) so Ray schedules one actor per GPU.

Duck-typed surface (kept in lockstep with the stubs; signature-parity
is unit-tested in tests/test_adapters.py):

- tokenizer: ``tokenize(text)``, ``encode(text, add_special_tokens,
  max_length)``, ``convert_ids_to_tokens(ids)``,
  ``convert_tokens_to_string(tokens)``, ``decode_span(ids)``,
  ``vocab_hash()``; attrs ``num_relations``, ``start_idx``,
  ``vocab_size``.
- relation model: ``sigmoid(input_ids, attention_mask) -> [B, R]
  float32``; ``model_hash()``.
- NER model: ``logits(input_ids, attention_mask) -> [B, L, num_labels]
  float32``; ``model_hash()``.

All imports are guarded: the module always imports; constructing an
adapter without torch/transformers raises a clear ImportError.
"""

from __future__ import annotations

import hashlib


def _require_hf():
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
    except ImportError as e:  # pragma: no cover - no torch in this container
        raise ImportError(
            "kgflow.adapters.hf needs `torch` and `transformers` installed; "
            "this environment runs the deterministic stub backend instead "
            "(kgflow/fixtures/stub_model.py)."
        ) from e


class HFTokenizerAdapter:
    """HF BertTokenizer behind the SimpleTokenizer surface.

    ≙ reference `data/data_module.py:19-35`: loads the pretrained
    tokenizer and registers ``[relation0..K-1]`` as additional special
    tokens (their ids become ``start_idx..start_idx+K-1``).
    """

    def __init__(self, model_name: str = "bert-base-cased", num_relations: int = 8):
        _require_hf()  # pragma: no cover - requires torch
        from transformers import AutoTokenizer

        self._tok = AutoTokenizer.from_pretrained(model_name)
        rel_tokens = [f"[relation{k}]" for k in range(num_relations)]
        self._tok.add_special_tokens({"additional_special_tokens": rel_tokens})
        self.num_relations = num_relations
        self.start_idx = self._tok.convert_tokens_to_ids(rel_tokens[0])
        self.vocab_size = len(self._tok)

    def tokenize(self, text: str) -> list:
        return self._tok.tokenize(text)  # pragma: no cover

    def encode(
        self,
        text: str,
        add_special_tokens: bool = True,
        max_length: int | None = None,
    ) -> list:  # pragma: no cover
        return self._tok.encode(
            text,
            add_special_tokens=add_special_tokens,
            truncation=max_length is not None,
            max_length=max_length,
        )

    def convert_ids_to_tokens(self, ids) -> list:  # pragma: no cover
        return self._tok.convert_ids_to_tokens(list(ids))

    def convert_tokens_to_string(self, tokens: list) -> str:  # pragma: no cover
        return self._tok.convert_tokens_to_string(tokens)

    def decode_span(self, ids) -> str:  # pragma: no cover
        return self.convert_tokens_to_string(self.convert_ids_to_tokens(ids))

    def vocab_hash(self) -> str:  # pragma: no cover
        h = hashlib.sha256()
        for w, i in sorted(self._tok.get_vocab().items()):
            h.update(f"{w}\x00{i}\n".encode())
        return h.hexdigest()[:16]


class HFRelModelAdapter:
    """BertForSequenceClassification (multi-label) behind StubRelModel's
    surface. ≙ reference BertForRelationClassification
    (`models/model.py:140-197`): pooled output → linear → sigmoid.

    ``weights_path`` may be a HF hub name or a local checkpoint dir;
    ``device`` is "cuda"/"cpu" — on a GPU actor (``num_gpus=1`` on the
    stage), pass "cuda".
    """

    def __init__(
        self,
        tokenizer,
        seed: int = 42,
        weights_path: str = "bert-base-cased",
        device: str = "cpu",
    ):
        _require_hf()  # pragma: no cover - requires torch
        import torch
        from transformers import AutoModelForSequenceClassification

        self._m = AutoModelForSequenceClassification.from_pretrained(
            weights_path,
            num_labels=tokenizer.num_relations,
            problem_type="multi_label_classification",
        )
        self._m.resize_token_embeddings(tokenizer.vocab_size)
        self._m.to(device).eval()
        self._device = device
        self._torch = torch
        self.num_relations = tokenizer.num_relations
        self._weights_path = weights_path

    def sigmoid(self, input_ids, attention_mask):  # pragma: no cover
        import numpy as np

        t = self._torch
        with t.no_grad():
            out = self._m(
                input_ids=t.as_tensor(np.asarray(input_ids), device=self._device),
                attention_mask=t.as_tensor(
                    np.asarray(attention_mask), device=self._device
                ),
            )
            return t.sigmoid(out.logits).cpu().numpy().astype(np.float32)

    def model_hash(self) -> str:  # pragma: no cover
        h = hashlib.sha256(b"hf-rel")
        h.update(self._weights_path.encode())
        for p in self._m.parameters():
            h.update(p.detach().cpu().numpy().tobytes())
            break  # first tensor suffices as a version fingerprint
        return h.hexdigest()[:16]


class HFNerModelAdapter:
    """BertForTokenClassification behind StubNerModel's surface.
    ≙ reference NER head (`models/model.py:199-...`): per-token logits
    over the BIO label set (8 labels in the two-stage scheme)."""

    def __init__(
        self,
        tokenizer,
        seed: int = 42,
        weights_path: str = "bert-base-cased",
        device: str = "cpu",
        num_labels: int = 8,
    ):
        _require_hf()  # pragma: no cover - requires torch
        import torch
        from transformers import AutoModelForTokenClassification

        self._m = AutoModelForTokenClassification.from_pretrained(
            weights_path, num_labels=num_labels
        )
        self._m.resize_token_embeddings(tokenizer.vocab_size)
        self._m.to(device).eval()
        self._device = device
        self._torch = torch
        self._weights_path = weights_path

    def logits(self, input_ids, attention_mask):  # pragma: no cover
        import numpy as np

        t = self._torch
        with t.no_grad():
            out = self._m(
                input_ids=t.as_tensor(np.asarray(input_ids), device=self._device),
                attention_mask=t.as_tensor(
                    np.asarray(attention_mask), device=self._device
                ),
            )
            return out.logits.cpu().numpy().astype(np.float32)

    def model_hash(self) -> str:  # pragma: no cover
        h = hashlib.sha256(b"hf-ner")
        h.update(self._weights_path.encode())
        for p in self._m.parameters():
            h.update(p.detach().cpu().numpy().tobytes())
            break
        return h.hexdigest()[:16]


def use_hf_backend(
    model_name: str = "bert-base-cased",
    rel_weights: str | None = None,
    ner_weights: str | None = None,
    device: str = "cpu",
    num_relations: int = 8,
) -> None:  # pragma: no cover - requires torch
    """Swap the engine's runtime singletons to the HF backend.

    Must run before any stage builds its models — in Ray that means
    calling it at module import time on workers (e.g. from a small
    site module shipped in the job) or inside each actor's ``__init__``.
    """
    _require_hf()
    from kgflow.stages import runtime

    def tok_factory():
        return HFTokenizerAdapter(model_name, num_relations=num_relations)

    def rel_factory(tokenizer, seed):
        return HFRelModelAdapter(
            tokenizer, seed, weights_path=rel_weights or model_name, device=device
        )

    def ner_factory(tokenizer, seed):
        return HFNerModelAdapter(
            tokenizer, seed, weights_path=ner_weights or model_name, device=device
        )

    runtime.set_backend(tok_factory, rel_factory, ner_factory)
