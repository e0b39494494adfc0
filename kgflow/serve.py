"""Online inference handler: the torchserve-deployment surface of the
reference re-expressed as a Ray actor.

≙ reference `deploy/handler_seq.py` / `deploy/handler_ner.py`
(`/root/reference/deploy/handler_seq.py:36-158`,
`deploy/handler_ner.py:37-169`): ``initialize()`` loads model +
tokenizer once per serving worker ≙ actor ``__init__``; the
preprocess → inference → postprocess request path ≙ ``predict``.
Output rows are the detokenized spo dicts of ``INFERLitModel.inference``
(`lit_models/transformer.py:217-226`): {subject, predict, object}.

Batch engine and serving share the exact same stage classes, so
serving-vs-batch parity is by construction. Deploy pattern:

    handler = ray.remote(InferenceHandler).options(num_cpus=1).remote()
    ray.get(handler.predict.remote(["alice fox was born in osaka ."]))

(or N replicas behind any router; each replica holds its own weights,
like torchserve workers).
"""

from __future__ import annotations

import pyarrow as pa

from kgflow.stages.relclassify import RelClassifyStage
from kgflow.stages.fanout import make_fanout_fn
from kgflow.stages.tagdecode import TagDecodeStage
from kgflow.stages.tokenize import SimpleTokenizer, TokenizeStage


class InferenceHandler:
    def __init__(self, max_seq_length: int = 256, seed: int = 42):
        from kgflow.stages.runtime import get_tokenizer

        tok = get_tokenizer()
        self.tokenize = TokenizeStage(max_seq_length=max_seq_length, tokenizer=tok)
        self.relcls = RelClassifyStage(seed=seed, tokenizer=tok)
        self.fanout = make_fanout_fn(tok.start_idx)
        self.tagdecode = TagDecodeStage(seed=seed)

    def predict(self, texts: list[str]) -> list[list[dict]]:
        """texts → per-text list of {subject, predict, object} dicts
        (the reference's interactive-demo output shape)."""
        tbl = pa.table(
            {
                "url": pa.array([f"req/{i}" for i in range(len(texts))]),
                "sent_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        out = self.tagdecode(self.fanout(self.relcls(self.tokenize(tbl))))
        result: list[list[dict]] = [[] for _ in texts]
        for sid, rel, subj, obj in zip(
            out.column("sent_id").to_pylist(),
            out.column("rel").to_pylist(),
            out.column("subj").to_pylist(),
            out.column("obj").to_pylist(),
        ):
            result[sid].append({"subject": subj, "predict": rel, "object": obj})
        return result
