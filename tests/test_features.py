"""Training-feature builders + golden-corpus source tests
(SURVEY.md §2.2 P3/P4/P6, §2.1 S1/S2)."""

import json

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from kgflow.fixtures.corpus import NUM_RELATIONS, REL2ID
from kgflow.fixtures.stub_model import (
    B_OBJ,
    B_SUB,
    CLS_TAG,
    I_OBJ,
    I_SUB,
    NER_LABELS,
    REL_TAG,
    SEP_TAG,
)
from kgflow.stages.features import (
    find_subsequence,
    make_feature_diagnostics_fn,
    make_interactive_features_fn,
    make_ner_features_fn,
    make_seq_features_fn,
)
from kgflow.stages.decode import event_process
from kgflow.stages.runtime import get_tokenizer


def _corpus_table():
    rows = [
        (0, "alice fox was born in osaka .", [("alice fox", "born_in", "osaka")]),
        (1, "the sky turned dark over the quiet hills .", []),  # empty spo → dropped
        (2, "bob hale is the spouse of vera holt .", [("bob hale", "spouse_of", "vera holt")]),
        (3, "carol singh works for helix labs and was born in lyon .",
         [("carol singh", "works_for", "helix labs"), ("carol singh", "born_in", "lyon")]),
        (4, "nothing matches here .", [("zzz unknown", "born_in", "osaka")]),  # entity not found
    ]
    spo_type = pa.list_(
        pa.struct([("subject", pa.string()), ("predicate", pa.string()), ("object", pa.string())])
    )
    return pa.table(
        {
            "text_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "spo": pa.array(
                [
                    [dict(subject=s, predicate=p, object=o) for (s, p, o) in r[2]]
                    for r in rows
                ],
                spo_type,
            ),
        }
    )


def test_seq_features_multihot_and_drop():
    out = make_seq_features_fn()(_corpus_table())
    ids = out.column("text_id").to_pylist()
    assert 1 not in ids  # empty spo dropped (ref cnt skip)
    labels = dict(zip(ids, out.column("label_ids_seq").to_pylist()))
    lab3 = np.asarray(labels[3])
    assert lab3.sum() == 2
    assert lab3[REL2ID["works_for"]] == 1 and lab3[REL2ID["born_in"]] == 1
    assert np.asarray(labels[0]).sum() == 1
    assert len(lab3) == NUM_RELATIONS


def test_ner_features_layout():
    tok = get_tokenizer()
    out = make_ner_features_fn()(_corpus_table())
    rows = {
        (tid, rid): (ids, tags)
        for tid, rid, ids, tags in zip(
            out.column("text_id").to_pylist(),
            out.column("label_id_seq").to_pylist(),
            out.column("input_ids").to_pylist(),
            out.column("label_ids_ner").to_pylist(),
        )
    }
    # sentence 4: entity not found → row dropped
    assert not any(tid == 4 for tid, _ in rows)
    # sentence 3 yields one row per relation
    assert (3, REL2ID["works_for"]) in rows and (3, REL2ID["born_in"]) in rows
    ids, tags = rows[(0, REL2ID["born_in"])]
    # layout: [CLS] ... [SEP] [relationK] [SEP]
    assert ids[-2] == tok.start_idx + REL2ID["born_in"]
    assert tags[0] == CLS_TAG and tags[-1] == SEP_TAG and tags[-2] == REL_TAG
    assert tags[-3] == SEP_TAG
    # subject/object BIO spans present
    assert B_SUB in tags and B_OBJ in tags
    # alice fox = 2 tokens → B-SUB I-SUB
    s = tags.index(B_SUB)
    assert tags[s + 1] == I_SUB


def test_ner_features_hard_case_object_overwrites():
    # same surface in subject and object lists → object pass overwrites
    spo_type = pa.list_(
        pa.struct([("subject", pa.string()), ("predicate", pa.string()), ("object", pa.string())])
    )
    t = pa.table(
        {
            "text_id": pa.array([0], pa.int64()),
            "text": pa.array(["alice fox is the spouse of alice fox ."]),
            "spo": pa.array(
                [[dict(subject="alice fox", predicate="spouse_of", object="alice fox")]],
                spo_type,
            ),
        }
    )
    out = make_ner_features_fn()(t)
    tags = out.column("label_ids_ner").to_pylist()[0]
    assert B_OBJ in tags and B_SUB not in tags  # overwritten, like the reference


def test_interactive_features_spans():
    tok = get_tokenizer()
    out = make_interactive_features_fn()(_corpus_table())
    ids_by_tid = dict(
        zip(out.column("text_id").to_pylist(), out.column("input_ids").to_pylist())
    )
    spans = dict(
        zip(out.column("text_id").to_pylist(), out.column("triples").to_pylist())
    )
    assert 4 not in spans  # bad_flag drop
    h_s, h_e, t_s, t_e, rid = spans[0][0]
    ids = ids_by_tid[0]
    assert tok.decode_span(ids[h_s:h_e]) == "alice fox"
    assert tok.decode_span(ids[t_s:t_e]) == "osaka"
    assert rid == REL2ID["born_in"]


def test_feature_diagnostics_counts():
    out = make_feature_diagnostics_fn()(_corpus_table())
    assert out.column("n_empty_spo").to_pylist() == [1]
    assert out.column("n_entity_not_found").to_pylist() == [1]


def test_find_subsequence_end_of_sequence():
    # the `<=` variant keeps a match ending at the last position (the
    # reference's ner-side `>=` variant would miss it — documented
    # divergence)
    assert find_subsequence([1, 2, 3], [2, 3]) == (1, 3)
    assert find_subsequence([1, 2, 3], [4]) == (None, None)


def test_event_process_verbatim_vs_fixed():
    text = list(range(6))
    tags = ["O", "B-SUB", "I-SUB", "O", "B-OBJ", "O"]
    # verbatim reference control flow: close-at-O unreachable → nothing
    assert event_process(text, tags) == []
    got = event_process(text, tags, fixed=True)
    assert got == [
        {"text": [1, 2], "label": "SUB"},
        {"text": [4], "label": "OBJ"},
    ]
    # label mismatch resets the span in both variants
    tags2 = ["O", "B-SUB", "I-OBJ", "O", "O", "O"]
    assert event_process(text, tags2, fixed=True) == []


def test_jsonl_source(ray_session, tmp_path):
    from kgflow.sources.jsonl import read_examples, read_rel2id, write_rel2id

    p = tmp_path / "train.json"
    lines = [
        json.dumps({"text": "alice fox was born in osaka .",
                    "spo_list": [{"subject": "alice fox", "predicate": "born_in",
                                  "object": "osaka", "subject_type": "PER",
                                  "object_type": "LOC"}]}),
        "not json at all {{{",
        json.dumps({"text": "no triples here", "spo_list": []}),
    ]
    p.write_text("\n".join(lines))
    rows = read_examples(str(p)).take_all()
    assert len(rows) == 2  # bad line dropped, not eval()'d
    assert rows[0]["spo"][0]["predicate"] == "born_in"

    rp = tmp_path / "rel2id.json"
    write_rel2id(str(rp))
    m = read_rel2id(str(rp))
    assert m == REL2ID


def test_jsonl_global_text_ids_across_files(ray_session, tmp_path):
    """text_id must be globally unique and sequential across multiple
    input files/blocks (round-1 fix: per-block ids restarted at 0)."""
    from kgflow.sources.jsonl import read_examples

    d = tmp_path / "corpus"
    d.mkdir()
    n_per = [5, 3, 7]
    for fi, n in enumerate(n_per):
        lines = [
            json.dumps({"text": f"file {fi} line {i}", "spo_list": []})
            for i in range(n)
        ]
        (d / f"part-{fi}.json").write_text("\n".join(lines))
    rows = read_examples(str(d)).take_all()
    ids = sorted(r["text_id"] for r in rows)
    assert ids == list(range(sum(n_per)))  # unique, contiguous, global
    # per-file blocks preserve in-file order under the path-sorted offset
    by_id = {r["text_id"]: r["text"] for r in rows}
    assert by_id[0] == "file 0 line 0"
    assert by_id[5] == "file 1 line 0"
    assert by_id[8] == "file 2 line 0"
