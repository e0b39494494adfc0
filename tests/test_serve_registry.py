"""Serving handler + registry-assembled pipeline parity tests."""

import ray

from kgflow.fixtures import corpus
from kgflow.oracle.reference import oracle_triples_for_texts
from kgflow.serve import InferenceHandler
from kgflow.stages.runtime import get_tokenizer


def test_handler_matches_oracle_detok(ray_session):
    texts = [corpus.make_sentence(77_000 + i, i % 3)[0] for i in range(20)]
    handler = InferenceHandler()
    got = handler.predict(texts)
    want = oracle_triples_for_texts(texts)
    tok = get_tokenizer()
    for g, w in zip(got, want):
        w_dicts = sorted(
            (
                tok.decode_span(h),
                corpus.REL_NAMES[r],
                tok.decode_span(t),
            )
            for (h, r, t) in w
        )
        g_dicts = sorted((d["subject"], d["predict"], d["object"]) for d in g)
        assert g_dicts == w_dicts


def test_handler_as_ray_actor(ray_session):
    h = ray.remote(InferenceHandler).options(num_cpus=1).remote()
    out = ray.get(h.predict.remote(["alice fox was born in osaka ."]))
    assert out[0] == [
        {"subject": "alice fox", "predict": "born_in", "object": "osaka"}
    ]


def test_registry_pipeline_matches_flagship(ray_session):
    import ray.data as rd

    from kgflow import registry
    from kgflow.fixtures.pages import ensure_pages
    from kgflow.pipelines.kg import read_pages, triples_ds

    d = ensure_pages(200)
    assert set(["extract", "rel_classify", "tag_decode"]) <= set(registry.available())
    ds = registry.build_pipeline(
        read_pages(d),
        [
            "extract",
            ("lang_filter", {"lang": "en"}),
            "split_sentences",
            ("tokenize", {"max_seq_length": 256}),
            ("rel_classify", {"seed": 42, "concurrency": (1, 2)}),
            "fanout",
            ("tag_decode", {"seed": 42, "concurrency": (1, 2)}),
        ],
    )
    a = sorted(
        (r["url"], r["sent_id"], r["rel_id"], r["subj"], r["obj"])
        for r in ds.take_all()
    )
    b = sorted(
        (r["url"], r["sent_id"], r["rel_id"], r["subj"], r["obj"])
        for r in triples_ds(d).take_all()
    )
    assert a == b
