"""Training-feature builders: the reference's three dataset-prep tasks
as Ray Data transforms over a golden corpus (text_id, text, spo).

≙ reference (SURVEY.md §2.2 P3/P4/P6):
- ``seq_features``  ≙ ``convert_examples_to_seq_features``
  (`/root/reference/src/openue/data/utils.py:335-379`): tokenize
  lowered text, multi-hot relation label over the sentence's gold
  predicates (one-hot sum clamped to 1, `:366-373`); sentences with an
  EMPTY spo list are DROPPED (`cnt` skip, `:368-370`).
- ``ner_features``  ≙ ``convert_examples_to_ner_features``
  (`data/utils.py:387-546`): per sentence, gold triples grouped by
  relation (`:431-443`); one output row per (sentence, relation) with
  ``[... sentence ids ..., [relationK], SEP]`` appended (`:469-473`),
  BIO tags built by locating subject/object token subsequences
  (`:484-506`; subject pass first, object pass OVERWRITES overlaps),
  the (sentence, relation) row dropped when an entity is not found
  (``continue_flag``); structural tags CLS/SEP/Relation/SEP at the
  fixed positions (`:510-514`). The reference's subsequence search
  here has an off-by-one (`:417`: ``>=`` break loses a match ending at
  the last position); we implement the CORRECT variant (matching
  `:567`) and document the divergence — rows whose entity ends at the
  final position are kept, not dropped.
- ``interactive_features`` ≙ ``convert_examples_to_interactive_features``
  (`data/utils.py:550-613`): token-span indices ``[h_s, h_e, t_s, t_e,
  rel_id]`` per gold triple, sentence dropped when any span is missing
  (``bad_flag``, `:585-600`).

All three are stateless per-batch transforms (tokenizer = per-worker
singleton). ``feature_diagnostics`` emits the reference's drop counters
(`cnt` empty-spo skips, entity-not-found drops, ``hard_to_solve``,
`data/utils.py:355,502,544-545`) as per-batch count rows whose global
``sum`` reproduces the reference's end-of-run diagnostics without any
driver-side loop (SURVEY.md §2.6 A5).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from kgflow.fixtures.corpus import REL2ID
from kgflow.fixtures.stub_model import (
    B_OBJ,
    B_SUB,
    CLS_TAG,
    I_OBJ,
    I_SUB,
    REL_TAG,
    SEP_TAG,
)
from kgflow.stages.tokenize import SEP_ID


def find_subsequence(hay: list[int], needle: list[int]) -> tuple[int | None, int | None]:
    """≙ find_word_in_texts, the `<=` variant (`data/utils.py:564-569`)."""
    n = len(needle)
    for i in range(len(hay)):
        if i + n <= len(hay) and hay[i : i + n] == needle:
            return i, i + n
    return None, None


def _grouped_by_rel(spo) -> dict[str, tuple[list, list]]:
    """Group a sentence's gold triples by relation with lowered entity
    surfaces (ref :431-443 + preprocess :433-435)."""
    by_rel: dict[str, tuple[list, list]] = {}
    for t in spo or []:
        subs, objs = by_rel.setdefault(t["predicate"], ([], []))
        subs.append(t["subject"].lower())
        objs.append(t["object"].lower())
    return by_rel


def _ner_row(tok, text, rid, subs, objs, max_seq_length):
    """One (sentence, relation) NER training row, or None when an entity
    span is not found (continue_flag)."""
    base = tok.encode(text, max_length=max_seq_length - 2)
    ids = base + [tok.start_idx + rid, SEP_ID]  # (ref :469-473)
    tags = np.zeros(len(ids), dtype=np.int64)
    for ent_list, b_tag, i_tag in ((subs, B_SUB, I_SUB), (objs, B_OBJ, I_OBJ)):
        for ent in ent_list:
            ent_ids = tok.encode(ent, add_special_tokens=False)
            s_i, e_i = find_subsequence(ids, ent_ids)
            if s_i is None:
                return None
            tags[s_i:e_i] = i_tag
            tags[s_i] = b_tag
    tags[0] = CLS_TAG
    tags[-1] = SEP_TAG
    tags[-2] = REL_TAG
    tags[-3] = SEP_TAG  # structural labels (ref :510-514)
    return ids, tags.tolist()


def make_seq_features_fn(max_seq_length: int = 256, rel2id: dict | None = None):
    rel2id = dict(rel2id or REL2ID)
    num_rel = len(rel2id)

    def seq_features(batch: pa.Table) -> pa.Table:
        from kgflow.stages.runtime import get_tokenizer

        tok = get_tokenizer()
        o_id, o_ids, o_label = [], [], []
        for tid, text, spo in zip(
            batch.column("text_id").to_pylist(),
            batch.column("text").to_pylist(),
            batch.column("spo").to_pylist(),
        ):
            label = np.zeros(num_rel, dtype=np.float32)
            ok = False
            for t in spo or []:
                r = rel2id.get(t["predicate"])
                if r is not None:
                    label[r] = 1.0  # one-hot sum clamped (ref :366-373)
                    ok = True
            if not ok:
                continue  # `cnt` skip (ref :368-370)
            o_id.append(tid)
            o_ids.append(tok.encode(text, max_length=max_seq_length))
            o_label.append(label.tolist())
        return pa.table(
            {
                "text_id": pa.array(o_id, pa.int64()),
                "input_ids": pa.array(o_ids, pa.list_(pa.int32())),
                "label_ids_seq": pa.array(o_label, pa.list_(pa.float32())),
            }
        )

    return seq_features


def make_ner_features_fn(max_seq_length: int = 256, rel2id: dict | None = None):
    rel2id = dict(rel2id or REL2ID)

    def ner_features(batch: pa.Table) -> pa.Table:
        from kgflow.stages.runtime import get_tokenizer

        tok = get_tokenizer()
        o_id, o_ids, o_tags, o_rel = [], [], [], []
        for tid, text, spo in zip(
            batch.column("text_id").to_pylist(),
            batch.column("text").to_pylist(),
            batch.column("spo").to_pylist(),
        ):
            for rel, (subs, objs) in _grouped_by_rel(spo).items():
                rid = rel2id.get(rel)
                if rid is None:
                    continue
                row = _ner_row(tok, text, rid, subs, objs, max_seq_length)
                if row is None:
                    continue  # continue_flag drop (ref :487-508)
                o_id.append(tid)
                o_ids.append(row[0])
                o_tags.append(row[1])
                o_rel.append(rid)
        return pa.table(
            {
                "text_id": pa.array(o_id, pa.int64()),
                "input_ids": pa.array(o_ids, pa.list_(pa.int32())),
                "label_ids_ner": pa.array(o_tags, pa.list_(pa.int8())),
                "label_id_seq": pa.array(o_rel, pa.int32()),
            }
        )

    return ner_features


def make_interactive_features_fn(max_seq_length: int = 256, rel2id: dict | None = None):
    rel2id = dict(rel2id or REL2ID)
    span_type = pa.list_(pa.list_(pa.int32()))

    def interactive_features(batch: pa.Table) -> pa.Table:
        from kgflow.stages.runtime import get_tokenizer

        tok = get_tokenizer()
        o_id, o_ids, o_spans = [], [], []
        for tid, text, spo in zip(
            batch.column("text_id").to_pylist(),
            batch.column("text").to_pylist(),
            batch.column("spo").to_pylist(),
        ):
            ids = tok.encode(text, max_length=max_seq_length - 2)
            spans = []
            bad = False
            for t in spo or []:
                rid = rel2id.get(t["predicate"])
                h_ids = tok.encode(t["subject"].lower(), add_special_tokens=False)
                t_ids = tok.encode(t["object"].lower(), add_special_tokens=False)
                h_s, h_e = find_subsequence(ids, h_ids)
                t_s, t_e = find_subsequence(ids, t_ids)
                if None in (h_s, h_e, t_s, t_e) or rid is None:
                    bad = True  # bad_flag drops the sentence (ref :585-600)
                    break
                spans.append([h_s, h_e, t_s, t_e, rid])
            if bad:
                continue
            o_id.append(tid)
            o_ids.append(ids)
            o_spans.append(spans)
        return pa.table(
            {
                "text_id": pa.array(o_id, pa.int64()),
                "input_ids": pa.array(o_ids, pa.list_(pa.int32())),
                "triples": pa.array(o_spans, span_type),
            }
        )

    return interactive_features


def make_feature_diagnostics_fn(max_seq_length: int = 256, rel2id: dict | None = None):
    """Per-batch counts of the reference's drop diagnostics; global
    ``ds.sum`` over the output reproduces ``cnt`` / ``counter`` /
    ``hard_to_solve`` (`data/utils.py:355,502,544-545`)."""
    rel2id = dict(rel2id or REL2ID)

    def diagnostics(batch: pa.Table) -> pa.Table:
        from kgflow.stages.runtime import get_tokenizer

        tok = get_tokenizer()
        empty = notfound = hard = 0
        for text, spo in zip(
            batch.column("text").to_pylist(), batch.column("spo").to_pylist()
        ):
            if not spo:
                empty += 1
                continue
            for rel, (subs, objs) in _grouped_by_rel(spo).items():
                rid = rel2id.get(rel)
                if rid is None:
                    continue
                if set(subs) & set(objs):
                    hard += 1  # (ref :454-455)
                if _ner_row(tok, text, rid, subs, objs, max_seq_length) is None:
                    notfound += 1
        return pa.table(
            {
                "n_empty_spo": pa.array([empty], pa.int64()),
                "n_entity_not_found": pa.array([notfound], pa.int64()),
                "n_hard_to_solve": pa.array([hard], pa.int64()),
            }
        )

    return diagnostics
