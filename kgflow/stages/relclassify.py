"""Stage 1 — relation classification + selection (M2 + X1).

≙ reference ``BertForRelationClassification`` scoring
(`/root/reference/src/openue/models/model.py:19-57`, invoked at
`:216-224`) followed by the threshold-0.5 / argmax-fallback relation
selection (`models/model.py:227-233`).

Ray-Data mapping: an actor-pool ``map_batches`` stage — the model is
loaded ONCE per actor in ``__init__`` (in production: BERT weights +
``num_gpus=1``; here: the deterministic stub). Batches arrive as ragged
Arrow ``list<int32>`` columns and are padded to the batch max only inside
the actor (the reference pads in its collator, `data/utils.py:705-742`).

Unlike the reference's dense ``[B*num_relations, L]`` expand
(`models/model.py:252-260`), the engine emits just a ragged ``rel_ids``
column; the fan-out stage builds only the selected rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kgflow.fixtures.stub_model import StubRelModel
from kgflow.stages.tokenize import SimpleTokenizer


def pad_ragged(ids_list: list[list[int]]) -> tuple[np.ndarray, np.ndarray]:
    """Ragged id lists → (padded int64 [B, L], attention mask [B, L])."""
    B = len(ids_list)
    L = max((len(r) for r in ids_list), default=1)
    ids = np.zeros((B, L), dtype=np.int64)
    att = np.zeros((B, L), dtype=np.int64)
    for i, row in enumerate(ids_list):
        ids[i, : len(row)] = row
        att[i, : len(row)] = 1
    return ids, att


class RelClassifyStage:
    def __init__(
        self,
        seed: int = 42,
        tokenizer: SimpleTokenizer | None = None,
        tok_kind: str = "simple",
    ):
        # default path goes through the runtime backend registry so
        # set_backend (e.g. the HF adapter, kgflow/adapters/hf.py)
        # reaches this stage; an explicitly-passed tokenizer keeps the
        # stub pairing (test injection path). tok_kind selects a named
        # runtime tokenizer ("bpe" = learned-subword production path).
        if tokenizer is None:
            from kgflow.stages.runtime import get_rel_model, get_tokenizer

            self.tok = get_tokenizer(tok_kind)
            self.model = get_rel_model(seed, tok_kind)
        else:
            self.tok = tokenizer
            self.model = StubRelModel(self.tok, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_list = batch.column("input_ids").to_pylist()
        if not ids_list:
            return batch.append_column(
                "rel_ids", pa.array([], type=pa.list_(pa.int32()))
            )
        ids, att = pad_ragged(ids_list)
        sig = self.model.sigmoid(ids, att)  # [B, R]
        mask = sig > 0.5
        # argmax fallback: every sentence yields >=1 relation (ref :230-233)
        none_rows = ~mask.any(axis=1)
        if none_rows.any():
            mask[none_rows, np.argmax(sig[none_rows], axis=1)] = True
        rel_ids = [np.flatnonzero(m).astype(np.int32).tolist() for m in mask]
        return batch.append_column(
            "rel_ids", pa.array(rel_ids, type=pa.list_(pa.int32()))
        )
