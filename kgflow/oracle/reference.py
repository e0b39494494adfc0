"""Reference-semantics oracle: NumPy restatement of ``Inference.forward``.

This module re-derives, step for step, the two-stage inference composite
of the reference (`/root/reference/src/openue/models/model.py:199-421`)
on CPU with the shared deterministic stub scorers. It deliberately keeps
the reference's control flow — padded batch, dense [B*R, L] expand,
masked row selection, two appended zero columns, one-hot position
scatter, prefix-sum regrouping — so the Ray pipeline (which replaces all
of that with keyed, selected-rows Arrow ops) can be checked for exact
triple parity against it (SURVEY.md §5.2 test #2).

No code is copied from the reference; each step cites the line range it
reproduces.
"""

from __future__ import annotations

import numpy as np

from kgflow.fixtures.stub_model import StubNerModel, StubRelModel, NER_LABELS
from kgflow.stages.tokenize import SimpleTokenizer, SEP_ID

Triple = tuple[tuple[int, ...], int, tuple[int, ...]]


def normal_process(text_ids, tag_labels) -> dict[str, list]:
    """≙ ``Inference.normal_process`` (`models/model.py:395-421`).

    Quirks cloned verbatim: a span opens at B-SUB/B-OBJ only when no span
    is open; it closes ONLY at "O" (I-* and further B-* are absorbed); a
    span still open at sequence end is dropped.
    """
    start = None
    labels: dict[str, list] = {"subject": [], "object": []}
    indicator = ""
    for index, t in enumerate(tag_labels):
        if start is None:
            if t == "B-SUB":
                start = index
                indicator = "subject"
            elif t == "B-OBJ":
                start = index
                indicator = "object"
        else:
            if t == "O":
                labels[indicator].append(list(text_ids[start:index]))
                start = None
    return labels


def oracle_forward(
    input_ids_list: list[list[int]],
    rel_model: StubRelModel,
    ner_model: StubNerModel,
    start_idx: int,
    num_relations: int,
) -> list[list[Triple]]:
    """Full ``Inference.forward`` (`models/model.py:199-393`) in NumPy.

    Input: unpadded per-sentence token id lists (the interactive-feature
    rows, `data/utils.py:579-584`). Output: per sentence, a list of
    triples ``(h_ids, rel_id, t_ids)`` with ``rel_id = relation_token_id -
    start_idx`` (`models/model.py:366`).
    """
    batch_size = len(input_ids_list)
    if batch_size == 0:
        return []
    # pad-collate (interactive collator, data/utils.py:705-742)
    max_length = max(len(x) for x in input_ids_list)
    input_ids = np.zeros((batch_size, max_length), dtype=np.int64)
    attention_mask = np.zeros((batch_size, max_length), dtype=np.int64)
    for i, row in enumerate(input_ids_list):
        input_ids[i, : len(row)] = row
        attention_mask[i, : len(row)] = 1

    # stage 1: relation classification (models/model.py:216-224)
    relation_output_sigmoid = rel_model.sigmoid(input_ids, attention_mask)

    # X1: threshold + argmax fallback (models/model.py:227-233)
    mask_rel = relation_output_sigmoid > 0.5
    for i in range(batch_size):
        if mask_rel[i].sum() == 0:
            mask_rel[i][int(np.argmax(relation_output_sigmoid[i]))] = True
    mask_rel = mask_rel.astype(np.int64)
    mask_output = mask_rel.reshape(-1)  # [B*R]

    # X2: dense expand + masked select (models/model.py:241-304)
    relation_index = np.broadcast_to(
        np.arange(start_idx, start_idx + num_relations), (batch_size, num_relations)
    )
    relation_ids = relation_index[mask_rel.astype(bool)]  # row-major, like masked_select
    n = relation_ids.shape[0]

    ids_rep = np.broadcast_to(
        input_ids[:, None, :], (batch_size, num_relations, max_length)
    ).reshape(batch_size * num_relations, max_length)
    sel_ids = ids_rep[mask_output.astype(bool)]  # [n, L]
    # two appended zero columns (models/model.py:264-265)
    input_ids_ner = np.concatenate(
        [sel_ids, np.zeros((n, 2), dtype=np.int64)], axis=1
    )

    att_rep = np.broadcast_to(
        attention_mask[:, None, :], (batch_size, num_relations, max_length)
    ).reshape(batch_size * num_relations, max_length)
    sel_att = att_rep[mask_output.astype(bool)]  # [n, L]
    rel_pos = sel_att.sum(axis=1)  # (models/model.py:281)

    rows = np.arange(n)
    # scatter relation token + literal SEP=102 (models/model.py:283-289)
    input_ids_ner[rows, rel_pos] = relation_ids
    input_ids_ner[rows, rel_pos + 1] = SEP_ID
    token_type_ids_ner = np.zeros((n, max_length + 2), dtype=np.int64)
    token_type_ids_ner[rows, rel_pos] = 1
    token_type_ids_ner[rows, rel_pos + 1] = 1
    attention_mask_ner = np.concatenate(
        [sel_att, np.zeros((n, 2), dtype=np.int64)], axis=1
    )
    attention_mask_ner[rows, rel_pos] = 1
    attention_mask_ner[rows, rel_pos + 1] = 1

    # stage 2 + X3: NER forward, per-token argmax → label strings
    # (models/model.py:313-321)
    logits = ner_model.logits(input_ids_ner, attention_mask_ner)
    results = np.argmax(logits, axis=2)
    result_labels = [[NER_LABELS[t] for t in row] for row in results.tolist()]

    # X4: truncate to [0, rel_pos-1) and regroup via prefix-sum
    # (models/model.py:329-346)
    output = []
    out_ids = []
    for idx in range(n):
        p = int(rel_pos[idx])
        output.append(result_labels[idx][0 : p - 1])
        out_ids.append(input_ids_ner[idx].tolist()[0 : p - 1])
    input_split = mask_rel.sum(axis=1)
    for i in range(1, batch_size):
        input_split[i] += input_split[i - 1]
    grouped_ids = [out_ids[: input_split[0]]]
    grouped_out = [output[: input_split[0]]]
    for i in range(1, batch_size):
        grouped_ids.append(out_ids[input_split[i - 1] : input_split[i]])
        grouped_out.append(output[input_split[i - 1] : input_split[i]])

    # X5: decode + subject×object cross product (models/model.py:356-387)
    index = 0
    triple_output: list[list[Triple]] = [[] for _ in range(batch_size)]
    cnt = 0
    for ids_list, bio_list in zip(grouped_ids, grouped_out):
        for ids, bio in zip(ids_list, bio_list):
            labels = normal_process(ids, bio)
            r = int(relation_ids[index]) - start_idx
            h = labels["subject"] if labels["subject"] else None
            t = labels["object"] if labels["object"] else None
            if h and t:
                for hh in h:
                    for tt in t:
                        triple_output[cnt].append((tuple(hh), r, tuple(tt)))
            index += 1
        cnt += 1
    return triple_output


def oracle_triples_for_texts(
    texts: list[str],
    tokenizer: SimpleTokenizer | None = None,
    max_seq_length: int = 256,
    seed: int = 42,
    batch_size: int = 16,
) -> list[list[Triple]]:
    """Convenience: sentences → oracle triples, batched like the reference
    (inference batch 16, `config/run_infer.yaml:8`)."""
    tok = tokenizer or SimpleTokenizer()
    rel = StubRelModel(tok, seed)
    ner = StubNerModel(tok, seed)
    out: list[list[Triple]] = []
    for lo in range(0, len(texts), batch_size):
        chunk = texts[lo : lo + batch_size]
        ids = [tok.encode(t, max_length=max_seq_length - 2) for t in chunk]
        out.extend(
            oracle_forward(ids, rel, ner, tok.start_idx, tok.num_relations)
        )
    return out
