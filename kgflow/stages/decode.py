"""X5 + X6 — BIO span decode, subject×object cross product, detokenize.

≙ reference ``Inference.normal_process`` + triple emission
(`/root/reference/src/openue/models/model.py:356-421`) and the
detokenization in ``INFERLitModel.inference``
(`lit_models/transformer.py:217-226`).

Quirks cloned verbatim (SURVEY.md §2.4 X5 — the triple P/R gate depends
on them):
- a span opens at B-SUB/B-OBJ only when no span is open;
- a span closes ONLY at "O" (I-* continues it; a B-* immediately after
  an open span is absorbed into it);
- a span still open at sequence end is dropped;
- triples are the full subject×object cross product per
  (sentence, relation) row, ``rel_id = relation_token_id - start_idx``
  (`models/model.py:366`); duplicates are NOT deduplicated here (the
  reference doesn't either — dedup is a downstream materialize step).

Actor stage only because detokenization needs the vocab; the decode loop
itself is stateless per row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kgflow.fixtures.corpus import REL_NAMES
from kgflow.fixtures.stub_model import B_OBJ, B_SUB, O
from kgflow.stages.tokenize import SimpleTokenizer


def decode_spans(ids: list[int], tags: list[int]) -> tuple[list, list]:
    """normal_process on integer tag ids; returns (subject_spans, object_spans)."""
    subs: list[list[int]] = []
    objs: list[list[int]] = []
    start = None
    is_sub = True
    for idx, t in enumerate(tags):
        if start is None:
            if t == B_SUB:
                start, is_sub = idx, True
            elif t == B_OBJ:
                start, is_sub = idx, False
        else:
            if t == O:
                (subs if is_sub else objs).append(ids[start:idx])
                start = None
    return subs, objs


def event_process(text: list, result: list[str], fixed: bool = False) -> list[dict]:
    """≙ ``Inference.event_process`` (`models/model.py:424-450`), the
    X7 alternate decode selected when "event" is in task_name
    (`models/model.py:148-154`).

    Cloned verbatim with ``fixed=False``, INCLUDING the reference's dead
    branch: for an open span, the label-mismatch test
    ``t.split("-")[-1] != indicator`` is checked BEFORE ``t == "O"``,
    and "O".split("-")[-1] == "O" never equals a role label — so the
    close-at-O branch is unreachable and the verbatim function emits no
    spans (the reference also never wires event output into
    triple_output: `models/model.py:388-391` is commented out).
    ``fixed=True`` checks the close-at-O case first — the behavior the
    surrounding code evidently intends — and is what the engine's event
    mode uses.
    """
    index = 0
    start = None
    labels: list[dict] = []
    indicator = ""
    for w, t in zip(text, result):
        if start is None:
            if "B-" in t:
                indicator = t.split("-")[-1]
                start = index
        else:
            if fixed and t == "O":
                labels.append(dict(text=list(text[start:index]), label=indicator))
                start = None
            elif t.split("-")[-1] != indicator or "B-" in t:
                start = None  # B-a I-b wrong, B-a B-a wrong
            elif t == "O":  # unreachable when fixed=False (ref bug)
                labels.append(dict(text=list(text[start:index]), label=indicator))
                start = None
        index += 1
    return labels


class DecodeStage:
    """mode="triple" (default): X5+X6 triple decode. mode="event": the
    X7 alternate — per (sentence, relation/event-type) row, emit typed
    argument spans via ``event_process(fixed=True)`` (the verbatim
    reference function provably emits nothing, see its docstring; the
    reference also leaves event output unwired, `models/model.py:388-391`
    — the engine wires the evidently-intended behavior and documents the
    divergence)."""

    def __init__(self, tokenizer: SimpleTokenizer | None = None, mode: str = "triple"):
        if tokenizer is None:
            from kgflow.stages.runtime import get_tokenizer

            tokenizer = get_tokenizer()
        self.tok = tokenizer
        self.rel_names = list(REL_NAMES)
        self.mode = mode

    def _call_event(self, batch: pa.Table) -> pa.Table:
        from kgflow.fixtures.stub_model import NER_LABELS

        urls, sids, rels = (
            batch.column("url").to_pylist(),
            batch.column("sent_id").to_pylist(),
            batch.column("rel_id").to_pylist(),
        )
        o_url, o_sid, o_type, o_label, o_text = [], [], [], [], []
        for url, sid, rid, ids, tags in zip(
            urls,
            sids,
            rels,
            batch.column("dec_ids").to_pylist(),
            batch.column("dec_tags").to_pylist(),
        ):
            labels = [NER_LABELS[t] for t in tags]
            for arg in event_process(ids, labels, fixed=True):
                o_url.append(url)
                o_sid.append(sid)
                o_type.append(self.rel_names[rid])
                o_label.append(arg["label"])
                o_text.append(self.tok.decode_span(arg["text"]))
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "sent_id": pa.array(np.asarray(o_sid, dtype=np.int64)),
                "event_type": pa.array(o_type, pa.string()),
                "role": pa.array(o_label, pa.string()),
                "argument": pa.array(o_text, pa.string()),
            }
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.mode == "event":
            return self._call_event(batch)
        urls = batch.column("url").to_pylist()
        sids = batch.column("sent_id").to_pylist()
        rels = batch.column("rel_id").to_pylist()
        ids_col = batch.column("dec_ids").to_pylist()
        tags_col = batch.column("dec_tags").to_pylist()
        o_url, o_sid, o_rid = [], [], []
        o_rel, o_subj, o_obj = [], [], []
        o_subj_ids, o_obj_ids = [], []
        for url, sid, rid, ids, tags in zip(urls, sids, rels, ids_col, tags_col):
            subs, objs = decode_spans(ids, tags)
            if not subs or not objs:
                continue
            for hh in subs:  # cross product (ref :382-384)
                for tt in objs:
                    o_url.append(url)
                    o_sid.append(sid)
                    o_rid.append(rid)
                    o_rel.append(self.rel_names[rid])
                    o_subj.append(self.tok.decode_span(hh))
                    o_obj.append(self.tok.decode_span(tt))
                    o_subj_ids.append(hh)
                    o_obj_ids.append(tt)
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "sent_id": pa.array(np.asarray(o_sid, dtype=np.int64)),
                "rel_id": pa.array(np.asarray(o_rid, dtype=np.int32)),
                "rel": pa.array(o_rel, pa.string()),
                "subj": pa.array(o_subj, pa.string()),
                "obj": pa.array(o_obj, pa.string()),
                "subj_ids": pa.array(o_subj_ids, type=pa.list_(pa.int32())),
                "obj_ids": pa.array(o_obj_ids, type=pa.list_(pa.int32())),
            }
        )
