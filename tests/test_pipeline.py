"""E2E streaming pipeline tests over the synthetic pages fixture
(SURVEY.md §5.2 test #4): pages → sentences → triples on Ray Data, plus
the A2 metric gate vs gold and vs the oracle."""

import pyarrow.parquet as pq
import pytest
import ray.data as rd

from kgflow.fixtures.pages import ensure_pages
from kgflow.oracle.reference import oracle_triples_for_texts
from kgflow.pipelines.kg import KgConfig, read_pages, sentences_ds, triples_ds
from kgflow.stages.metrics import explode_gold, triple_prf
from kgflow.stages.tokenize import SimpleTokenizer


@pytest.fixture(scope="module")
def fixture_dir(ray_session):
    return ensure_pages(400)


def test_sentences_match_gold_lines(fixture_dir):
    ds = sentences_ds(read_pages(fixture_dir))
    rows = ds.take_all()
    got = {(r["url"], r["sent_id"]): r["text"] for r in rows}
    gold = pq.read_table(fixture_dir + "/gold_spo.parquet")
    for url, sid, text in zip(
        gold.column("url").to_pylist(),
        gold.column("sent_id").to_pylist(),
        gold.column("text").to_pylist(),
    ):
        assert got[(url, sid)] == text


def test_triples_schema_and_prf_vs_gold(fixture_dir):
    ds = triples_ds(fixture_dir)
    names = ds.schema().names
    assert names == [
        "url", "sent_id", "rel_id", "rel", "subj", "obj", "subj_ids", "obj_ids",
    ]
    gold = explode_gold(rd.read_parquet(fixture_dir + "/gold_spo.parquet"))
    m = triple_prf(ds, gold)
    # the stub tagger recovers the closed-world gold almost perfectly;
    # residual misses are reference-semantics artifacts (cross-product
    # extras on multi-entity sentences), not engine bugs
    assert m["true"] > 300
    assert m["p"] >= 0.9 and m["r"] >= 0.9, m


def test_ray_pipeline_matches_oracle(fixture_dir):
    """Full Ray pipeline vs oracle on the same sentences: exact parity
    (the P/R >= 0.95 gate, expected 1.0 — FIXTURES.md §6)."""
    sent = sentences_ds(read_pages(fixture_dir)).take_all()
    sent.sort(key=lambda r: (r["url"], r["sent_id"]))
    texts = [r["text"] for r in sent]
    want = oracle_triples_for_texts(texts)
    oracle_by_key = {}
    for r, tr in zip(sent, want):
        oracle_by_key[(r["url"], r["sent_id"])] = sorted(tr)

    got_rows = triples_ds(fixture_dir).take_all()
    got_by_key = {k: [] for k in oracle_by_key}
    for r in got_rows:
        got_by_key[(r["url"], r["sent_id"])].append(
            (tuple(r["subj_ids"]), r["rel_id"], tuple(r["obj_ids"]))
        )
    n = 0
    for k, want_tr in oracle_by_key.items():
        assert sorted(got_by_key[k]) == want_tr, k
        n += len(want_tr)
    assert n > 200


def test_event_mode_pipeline(fixture_dir):
    from kgflow.pipelines.kg import events_ds

    rows = events_ds(fixture_dir).take(50)
    assert rows, "event mode should emit argument rows"
    for r in rows:
        assert r["role"] in ("SUB", "OBJ")
        assert r["event_type"] and r["argument"]


def test_detok_strings_match_ids(fixture_dir):
    tok = SimpleTokenizer()
    rows = triples_ds(fixture_dir).take(50)
    for r in rows:
        assert tok.decode_span(r["subj_ids"]) == r["subj"]
        assert tok.decode_span(r["obj_ids"]) == r["obj"]
        assert r["rel_id"] >= 0
