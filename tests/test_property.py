"""Property-based tests (SURVEY.md §5.2 #6) with hypothesis."""

from hypothesis import given, settings
from hypothesis import strategies as st

from kgflow.fixtures.stub_model import B_OBJ, B_SUB, I_OBJ, I_SUB, NER_LABELS, O
from kgflow.linking.minhash import MinHasher, char_shingles, jaccard, mix64
from kgflow.oracle.reference import normal_process
from kgflow.stages.decode import decode_spans

tags_strategy = st.lists(st.integers(min_value=0, max_value=7), min_size=0, max_size=40)


@settings(max_examples=200, deadline=None)
@given(tags_strategy)
def test_decode_matches_reference_and_invariants(tags):
    ids = list(range(len(tags)))
    subs, objs = decode_spans(ids, tags)
    ref = normal_process(ids, [NER_LABELS[t] for t in tags])
    assert [list(s) for s in subs] == ref["subject"]
    assert [list(o) for o in objs] == ref["object"]
    # invariants: spans are non-empty contiguous slices; each span's
    # first tag is its B-*, and the position after each span is O
    for span, b_tag in [(s, B_SUB) for s in subs] + [(o, B_OBJ) for o in objs]:
        assert span
        start = span[0]
        end = start + len(span)
        assert list(range(start, end)) == span  # contiguity (ids==positions)
        assert tags[start] == b_tag
        assert end < len(tags) and tags[end] == O  # close-at-O rule
    # spans never overlap
    covered = set()
    for span in subs + objs:
        s = set(span)
        assert not (covered & s)
        covered |= s


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=30))
def test_minhash_identical_cobucket(s):
    h = MinHasher(num_hashes=32)
    a = h.band_hashes(s, 8, 4)
    b = h.band_hashes(s, 8, 4)
    assert (a == b).all()


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=1, max_size=40), st.text(min_size=1, max_size=40))
def test_jaccard_bounds_and_symmetry(a, b):
    j = jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == jaccard(b, a)
    assert jaccard(a, a) == 1.0


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_mix64_range(x):
    y = mix64(x)
    assert 0 <= y < 2**64


def test_a2_counts_vs_bruteforce_random():
    import random

    from kgflow.stages.metrics import _bucket_counts
    import pandas as pd

    rng = random.Random(7)
    rows = []
    for sid in range(30):
        for src in ("p", "g"):
            for _ in range(rng.randrange(4)):
                rows.append(
                    (
                        "u",
                        sid,
                        rng.choice("ab"),
                        rng.choice("rq"),
                        rng.choice("xy"),
                        src,
                    )
                )
    df = pd.DataFrame(rows, columns=["url", "sent_id", "subj", "rel", "obj", "src"])
    got = _bucket_counts(df)
    # brute force per reference _cal semantics
    pre = true = cor = 0
    for sid in range(30):
        g = df[(df.sent_id == sid)]
        pred = [tuple(r) for r in g[g.src == "p"][["subj", "rel", "obj"]].values]
        gold = [tuple(r) for r in g[g.src == "g"][["subj", "rel", "obj"]].values]
        pre += len(pred)
        true += len(gold)
        cor += sum(1 for t in pred if t in gold)
    assert got["pre"][0] == pre and got["true"][0] == true and got["cor"][0] == cor
