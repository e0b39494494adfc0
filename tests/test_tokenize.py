"""Tokenizer unit tests: BERT-convention ids, relation token range,
truncation semantics matching reference data/utils.py:579-584."""

from kgflow.fixtures import corpus
from kgflow.stages.tokenize import CLS_ID, SEP_ID, UNK_ID, SimpleTokenizer


def test_special_ids_and_relation_range():
    tok = SimpleTokenizer()
    # start_idx = id of [relation0] (ref models/model.py:149)
    assert tok.encode("[relation0]", add_special_tokens=False) == [tok.start_idx]
    for k in range(corpus.NUM_RELATIONS):
        assert tok.vocab[f"[relation{k}]"] == tok.start_idx + k


def test_encode_roundtrip_entities():
    tok = SimpleTokenizer()
    for ent in corpus.PER + corpus.LOC + corpus.ORG:
        ids = tok.encode(ent, add_special_tokens=False)
        assert UNK_ID not in ids  # closed world: entities always in-vocab
        assert tok.decode_span(ids) == ent


def test_encode_specials_and_lowercase():
    tok = SimpleTokenizer()
    ids = tok.encode("Alice Fox WAS born in OSAKA .")
    assert ids[0] == CLS_ID and ids[-1] == SEP_ID
    assert tok.decode_span(ids[1:-1]) == "alice fox was born in osaka ."


def test_truncation():
    tok = SimpleTokenizer()
    long = " ".join(["osaka"] * 500)
    ids = tok.encode(long, max_length=64)
    assert len(ids) == 64 and ids[0] == CLS_ID and ids[-1] == SEP_ID


def test_oov_maps_to_unk():
    tok = SimpleTokenizer()
    assert tok.encode("page 12345", add_special_tokens=False)[1] == UNK_ID
