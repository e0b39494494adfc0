"""Committed-golden E2E regression test (SURVEY.md §5.2 #4): the triples
for the first 100 fixture pages are committed to the repo; any
unintended change to the fixture generator, tokenizer, stub scorers, or
pipeline semantics shows up as a diff against the golden file."""

import json
import os

from kgflow.fixtures.pages import ensure_pages
from kgflow.pipelines.kg import triples_ds

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_triples_n100.json")
GOLDEN_EVENTS = os.path.join(os.path.dirname(__file__), "golden_events_n100.json")


def test_e2e_matches_committed_golden(ray_session):
    d = ensure_pages(100)
    rows = triples_ds(d).take_all()
    got = sorted(
        [r["url"], r["sent_id"], r["rel_id"], r["subj"], r["obj"]] for r in rows
    )
    want = sorted(json.load(open(GOLDEN)))
    assert len(got) == len(want)
    assert got == want


def test_event_mode_matches_committed_golden(ray_session):
    """Pins the event-mode decode semantics. kg_events deliberately
    diverges from the reference: the verbatim ``event_process``
    (models/model.py:148-154) provably emits nothing (dead branch —
    proof in kgflow/stages/decode.py), so the engine wires the
    documented intended semantics (``fixed=True``). This golden stops
    that divergence from drifting silently across rounds."""
    from kgflow.pipelines.kg import events_ds

    d = ensure_pages(100)
    rows = events_ds(d).take_all()
    got = sorted(
        [r["url"], r["sent_id"], r["event_type"], r["role"], r["argument"]]
        for r in rows
    )
    want = sorted(json.load(open(GOLDEN_EVENTS)))
    assert len(got) == len(want)
    assert got == want
