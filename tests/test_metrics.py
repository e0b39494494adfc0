"""A2/A3/A4 metric tests (reference counting semantics)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgflow.stages.metrics import (
    get_entities,
    ner_chunk_prf,
    seq_multilabel_prf,
    triple_prf,
)


def test_get_entities_matches_reference_rules():
    # B-I-O chunking with type change splitting chunks
    assert get_entities(["O", "B-SUB", "I-SUB", "O", "B-OBJ"]) == [
        ("SUB", 1, 2),
        ("OBJ", 4, 4),
    ]
    # I after O starts a chunk (seqeval leniency, ref start_of_chunk :45)
    assert get_entities(["O", "I-SUB", "I-SUB", "O"]) == [("SUB", 1, 2)]
    # type change mid-span closes and opens (ref :47-48, :77-78)
    assert get_entities(["B-SUB", "I-OBJ", "O"]) == [("SUB", 0, 0), ("OBJ", 1, 1)]
    # B after B closes the first (ref end_of_chunk :70)
    assert get_entities(["B-SUB", "B-SUB"]) == [("SUB", 0, 0), ("SUB", 1, 1)]


def test_ner_chunk_prf(ray_session):
    rows = pa.table(
        {
            "pred_tags": pa.array(
                [["O", "B-SUB", "I-SUB", "O"], ["B-OBJ", "O", "O", "O"]],
                pa.list_(pa.string()),
            ),
            "gold_tags": pa.array(
                [["O", "B-SUB", "I-SUB", "O"], ["B-OBJ", "I-OBJ", "O", "O"]],
                pa.list_(pa.string()),
            ),
        }
    )
    m = ner_chunk_prf(rd.from_arrow(rows))
    # pred: {(SUB,1,2)}, {(OBJ,0,0)}; gold: {(SUB,1,2)}, {(OBJ,0,1)} → cor=1
    assert m["p"] == 0.5 and m["r"] == 0.5 and m["f1"] == 0.5


def test_seq_multilabel_prf(ray_session):
    rows = pa.table(
        {
            "scores": pa.array([[0.9, 0.1, 0.7], [0.2, 0.8, 0.3]], pa.list_(pa.float32())),
            "labels": pa.array([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]], pa.list_(pa.float32())),
        }
    )
    m = seq_multilabel_prf(rd.from_arrow(rows))
    # preds>0.5: {0,2},{1}; tp = 1(row0 idx0) + 1(row1 idx1) = 2; pred=3; true=3
    assert abs(m["p"] - 2 / 3) < 1e-9 and abs(m["r"] - 2 / 3) < 1e-9


def test_triple_prf_duplicate_semantics(ray_session):
    # duplicates on the pred side each count; duplicate gold raises true only
    pred = pd.DataFrame(
        {
            "url": ["u"] * 3,
            "sent_id": [0] * 3,
            "subj": ["a", "a", "x"],
            "rel": ["r", "r", "r"],
            "obj": ["b", "b", "y"],
        }
    )
    gold = pd.DataFrame(
        {
            "url": ["u"] * 2,
            "sent_id": [0] * 2,
            "subj": ["a", "a"],
            "rel": ["r", "r"],
            "obj": ["b", "b"],
        }
    )
    m = triple_prf(rd.from_pandas(pred), rd.from_pandas(gold))
    assert m["pre"] == 3 and m["true"] == 2 and m["cor"] == 2
