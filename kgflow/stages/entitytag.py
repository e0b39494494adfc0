"""Stage 2 — relation-conditioned entity tagging (M3 + X3 + X4-truncate).

≙ reference ``BertForNER`` forward (`/root/reference/src/openue/models/
model.py:77-112`), per-token argmax (`:319`), and the per-row truncation
``[0 : rel_pos-1]`` (`:329-335`). The prefix-sum regrouping
(`:337-346`) is unnecessary here: every row carries its
``(url, sent_id, rel_id)`` key.

Actor-pool stage: weights load once per actor (production: BERT +
``num_gpus``; tests/bench: the deterministic stub tagger). Padding to
the batch max happens only inside the actor; the output is already
truncated to the decode window so downstream blocks are narrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kgflow.fixtures.stub_model import StubNerModel
from kgflow.stages.relclassify import pad_ragged
from kgflow.stages.tokenize import SimpleTokenizer


class EntityTagStage:
    def __init__(
        self,
        seed: int = 42,
        tokenizer: SimpleTokenizer | None = None,
        tok_kind: str = "simple",
    ):
        # see RelClassifyStage: default = runtime backend registry
        if tokenizer is None:
            from kgflow.stages.runtime import get_ner_model, get_tokenizer

            self.tok = get_tokenizer(tok_kind)
            self.model = get_ner_model(seed, tok_kind)
        else:
            self.tok = tokenizer
            self.model = StubNerModel(self.tok, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_list = batch.column("ner_input_ids").to_pylist()
        rel_pos = batch.column("rel_pos").to_numpy()
        if not ids_list:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "sent_id": pa.array([], pa.int64()),
                    "rel_id": pa.array([], pa.int32()),
                    "dec_ids": pa.array([], pa.list_(pa.int32())),
                    "dec_tags": pa.array([], pa.list_(pa.int8())),
                }
            )
        ids, att = pad_ragged(ids_list)
        logits = self.model.logits(ids, att)  # [B, L, 8]
        tags = np.argmax(logits, axis=2)  # X3 (ref :319)
        dec_ids: list[list[int]] = []
        dec_tags: list[list[int]] = []
        for i, row in enumerate(ids_list):
            p = int(rel_pos[i])  # original unpadded length
            dec_ids.append(row[0 : p - 1])  # X4 truncation (ref :329-335)
            dec_tags.append(tags[i, 0 : p - 1].tolist())
        return pa.table(
            {
                "url": batch.column("url"),
                "sent_id": batch.column("sent_id"),
                "rel_id": batch.column("rel_id"),
                "dec_ids": pa.array(dec_ids, type=pa.list_(pa.int32())),
                "dec_tags": pa.array(dec_tags, type=pa.list_(pa.int8())),
            }
        )
