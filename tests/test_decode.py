"""X5 decode golden-array tests: the close-at-O quirks cloned from
reference models/model.py:395-421 (SURVEY.md §5.2 test #1)."""

from kgflow.fixtures.stub_model import B_OBJ, B_SUB, I_OBJ, I_SUB, NER_LABELS, O
from kgflow.oracle.reference import normal_process
from kgflow.stages.decode import decode_spans


def _both(ids, tags):
    subs, objs = decode_spans(ids, tags)
    ref = normal_process(ids, [NER_LABELS[t] for t in tags])
    assert [list(s) for s in subs] == ref["subject"]
    assert [list(o) for o in objs] == ref["object"]
    return subs, objs


def test_simple_spans():
    ids = [101, 10, 11, 12, 13, 14]
    tags = [6, B_SUB, I_SUB, O, B_OBJ, O]
    subs, objs = _both(ids, tags)
    assert subs == [[10, 11]] and objs == [[13]]


def test_unclosed_span_at_end_dropped():
    ids = [101, 10, 11]
    tags = [6, B_SUB, I_SUB]  # never closed by O
    subs, objs = _both(ids, tags)
    assert subs == [] and objs == []


def test_b_after_open_span_absorbed():
    # B-OBJ while a SUB span is open does NOT close/open; it is absorbed
    ids = [101, 10, 11, 12, 13]
    tags = [6, B_SUB, B_OBJ, I_OBJ, O]
    subs, objs = _both(ids, tags)
    assert subs == [[10, 11, 12]] and objs == []


def test_i_without_b_ignored():
    ids = [101, 10, 11, 12]
    tags = [6, I_SUB, O, O]
    subs, objs = _both(ids, tags)
    assert subs == [] and objs == []


def test_multiple_spans_cross_order():
    ids = [0, 1, 2, 3, 4, 5, 6, 7]
    tags = [O, B_OBJ, O, B_SUB, O, B_OBJ, I_OBJ, O]
    subs, objs = _both(ids, tags)
    assert subs == [[3]] and objs == [[1], [5, 6]]
