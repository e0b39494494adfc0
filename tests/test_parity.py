"""Engine vs reference-semantics oracle: exact triple parity
(SURVEY.md §5.2 test #2 — evidences the P/R ≥ 0.95 gate as P/R = 1.0
with shared deterministic stub weights)."""

import pyarrow as pa

from kgflow.fixtures import corpus
from kgflow.oracle.reference import oracle_triples_for_texts
from kgflow.stages.decode import DecodeStage
from kgflow.stages.entitytag import EntityTagStage
from kgflow.stages.fanout import make_fanout_fn
from kgflow.stages.relclassify import RelClassifyStage
from kgflow.stages.tokenize import SimpleTokenizer, TokenizeStage


def engine_triples_for_texts(texts, max_seq_length=256, batch_size=37):
    """Run the engine's stage chain directly on Arrow tables (no Ray),
    with a batch size deliberately different from the oracle's 16 to
    prove padding/batching invariance."""
    tok = SimpleTokenizer()
    tokenize = TokenizeStage(max_seq_length=max_seq_length)
    relcls = RelClassifyStage()
    fanout = make_fanout_fn(tok.start_idx)
    tagger = EntityTagStage()
    decode = DecodeStage()
    per_sentence = {i: [] for i in range(len(texts))}
    for lo in range(0, len(texts), batch_size):
        chunk = texts[lo : lo + batch_size]
        tbl = pa.table(
            {
                "url": pa.array([f"u{i}" for i in range(lo, lo + len(chunk))]),
                "sent_id": pa.array(list(range(lo, lo + len(chunk))), pa.int64()),
                "text": pa.array(chunk),
            }
        )
        out = decode(tagger(fanout(relcls(tokenize(tbl)))))
        for sid, rid, s_ids, o_ids in zip(
            out.column("sent_id").to_pylist(),
            out.column("rel_id").to_pylist(),
            out.column("subj_ids").to_pylist(),
            out.column("obj_ids").to_pylist(),
        ):
            per_sentence[sid].append((tuple(s_ids), rid, tuple(o_ids)))
    return [per_sentence[i] for i in range(len(texts))]


def _sample_texts(n=240):
    texts = []
    for i in range(n):
        t, _ = corpus.make_sentence(10_000 + i, i % 5)
        texts.append(t)
    texts.append("Page 1234")  # title-like OOV sentence (fallback path)
    texts.append("")  # empty text edge case
    return texts


def test_engine_matches_oracle_exactly():
    texts = _sample_texts()
    got = engine_triples_for_texts(texts)
    want = oracle_triples_for_texts(texts)
    assert len(got) == len(want)
    n_triples = 0
    for i, (g, w) in enumerate(zip(got, want)):
        assert sorted(g) == sorted(w), f"sentence {i}: {texts[i]!r}"
        n_triples += len(w)
    assert n_triples > 100  # the corpus actually produces triples


def test_fallback_selects_exactly_one_relation():
    texts = [corpus.DISTRACTORS[0]]
    tok = SimpleTokenizer()
    tbl = pa.table({"url": ["u"], "sent_id": pa.array([0], pa.int64()), "text": texts})
    enc = TokenizeStage()(tbl)
    out = RelClassifyStage()(enc)
    rels = out.column("rel_ids").to_pylist()[0]
    assert len(rels) == 1  # argmax fallback (ref models/model.py:230-233)


def test_oracle_batch_invariance():
    texts = _sample_texts(60)
    a = oracle_triples_for_texts(texts, batch_size=16)
    b = oracle_triples_for_texts(texts, batch_size=7)
    assert [sorted(x) for x in a] == [sorted(x) for x in b]
