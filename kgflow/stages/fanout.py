"""X2 — NER-input construction: the (sentence × selected-relation) fan-out.

≙ reference `models/model.py:239-310`: for each selected (sentence,
relation) pair, append ``[relationK]`` at position ``rel_pos =
sum(attention_mask)`` and a literal SEP (=102, hard-coded at
`models/model.py:245`) at ``rel_pos + 1``.

The reference materializes a dense ``[batch*num_relations, maxlen+2]``
tensor and masks rows out (`:252-260`); on unpadded rows the same
semantics reduce to *appending two tokens* — so the engine builds ONLY
the selected rows, as a stateless vectorized flat-map (1 row → k rows).
This is the row-explosion point of the pipeline; post-explosion block
size is bounded by the stage's ``batch_size`` so data-dependent skew
(many relations per sentence) cannot blow up a single task.

``rel_pos`` (the original unpadded length) is carried as a column so the
decode stage can truncate exactly like the reference's
``[0 : rel_pos-1]`` slice (`models/model.py:329-335`) without any
prefix-sum regrouping — the ``(url, sent_id)`` key replaces the
reference's positional bookkeeping (`:337-346`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kgflow.stages.tokenize import SEP_ID


def make_fanout_fn(start_idx: int):
    """Returns the map_batches fn; ``start_idx`` = id of [relation0]
    (`models/model.py:149`)."""

    def fanout_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        sids = batch.column("sent_id").to_pylist()
        ids_list = batch.column("input_ids").to_pylist()
        rels_list = batch.column("rel_ids").to_pylist()
        o_url: list[str] = []
        o_sid: list[int] = []
        o_rel: list[int] = []
        o_ids: list[list[int]] = []
        o_pos: list[int] = []
        for url, sid, ids, rels in zip(urls, sids, ids_list, rels_list):
            n = len(ids)
            for k in rels:
                o_url.append(url)
                o_sid.append(sid)
                o_rel.append(k)
                o_ids.append(ids + [start_idx + k, SEP_ID])
                o_pos.append(n)
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "sent_id": pa.array(np.asarray(o_sid, dtype=np.int64)),
                "rel_id": pa.array(np.asarray(o_rel, dtype=np.int32)),
                "ner_input_ids": pa.array(o_ids, type=pa.list_(pa.int32())),
                "rel_pos": pa.array(np.asarray(o_pos, dtype=np.int32)),
            }
        )

    return fanout_batch
