"""Resumable build test (SURVEY.md §5.2 test #5): kill after K shards,
rerun, assert only unfinished shards recompute and output equals the
uninterrupted run."""

import json
import os

import pandas as pd
import pytest
import ray.data as rd

from kgflow.fixtures.pages import ensure_pages
from kgflow.pipelines.build import build_kg
from kgflow.pipelines.kg import KgConfig


@pytest.fixture(scope="module")
def fixture_dir(ray_session):
    return ensure_pages(300)


def _edges_df(out_dir):
    df = rd.read_parquet(os.path.join(out_dir, "edges")).to_pandas()
    return (
        df.sort_values(["subj_id", "rel_id", "obj_id"]).reset_index(drop=True)
    )


def test_build_resume_exact(fixture_dir, tmp_path):
    cfg = KgConfig()
    out_full = str(tmp_path / "full")
    out_resume = str(tmp_path / "resume")

    s1 = build_kg(fixture_dir, out_full, cfg, shards=4)
    assert s1["edges"] > 0 and s1["nodes"] > 0

    # interrupted run: crash injected after 2 shard commits
    with pytest.raises(RuntimeError, match="injected failure"):
        build_kg(fixture_dir, out_resume, cfg, shards=4, fail_after_shards=2)
    commits = [
        json.loads(l)
        for l in open(os.path.join(out_resume, "_manifest", "commits.jsonl"))
    ]
    assert len([c for c in commits if c["phase"] == "extract"]) == 2

    # resume: only the 2 remaining shards are extracted
    s2 = build_kg(fixture_dir, out_resume, cfg, shards=4)
    commits = [
        json.loads(l)
        for l in open(os.path.join(out_resume, "_manifest", "commits.jsonl"))
    ]
    extract = [c for c in commits if c["phase"] == "extract"]
    assert len(extract) == 4  # no shard committed twice
    assert len({c["partition"] for c in extract}) == 4
    # lineage recorded per partition
    for c in extract:
        assert c["lineage"]["vocab_hash"] and c["lineage"]["ner_model_hash"]
        assert "triples" in c["metrics"]

    # resumed output == uninterrupted output
    a, b = _edges_df(out_full), _edges_df(out_resume)
    pd.testing.assert_frame_equal(a, b)
    assert s2["edges"] == s1["edges"] and s2["nodes"] == s1["nodes"]


def test_rerun_is_noop(fixture_dir, tmp_path):
    cfg = KgConfig()
    out = str(tmp_path / "noop")
    build_kg(fixture_dir, out, cfg, shards=2)
    n_commits = len(open(os.path.join(out, "_manifest", "commits.jsonl")).readlines())
    build_kg(fixture_dir, out, cfg, shards=2)  # fully committed → no new work
    n_commits2 = len(open(os.path.join(out, "_manifest", "commits.jsonl")).readlines())
    assert n_commits2 == n_commits

    # resuming under a DIFFERENT config must NOT skip committed shards:
    # lineage hashes differ, so every phase rebuilds (no silent mixing
    # of two configs in one output)
    cfg2 = KgConfig(max_seq_length=cfg.max_seq_length + 16)
    build_kg(fixture_dir, out, cfg2, shards=2)
    commits = [
        json.loads(l)
        for l in open(os.path.join(out, "_manifest", "commits.jsonl"))
    ]
    extract = [c for c in commits if c["phase"] == "extract"]
    assert len(extract) == 4  # 2 original + 2 rebuilt under cfg2
    lineages = {json.dumps(c["lineage"], sort_keys=True) for c in extract}
    assert len(lineages) == 2


def test_sink_bucket_resume_exact(fixture_dir, tmp_path):
    """SURVEY §5.2 test #5 at the HEADLINE granularity (round-5): kill
    after K of 16 subj_bucket sink commits; the resume recomputes only
    16−K bucket partitions (the missing-bucket predicate is pushed into
    the canonicalize stream) and the final edges are byte-identical to
    an uninterrupted run."""
    cfg = KgConfig()
    out_full = str(tmp_path / "full")
    out_resume = str(tmp_path / "resume")
    K = 5

    s1 = build_kg(fixture_dir, out_full, cfg, shards=2, num_buckets=16)

    with pytest.raises(RuntimeError, match="injected failure"):
        build_kg(
            fixture_dir,
            out_resume,
            cfg,
            shards=2,
            num_buckets=16,
            fail_after_buckets=K,
        )
    commits = [
        json.loads(l)
        for l in open(os.path.join(out_resume, "_manifest", "commits.jsonl"))
    ]
    bucket_commits = [c for c in commits if c["phase"] == "materialize_edges"]
    assert len(bucket_commits) == K
    committed_parts = {c["partition"] for c in bucket_commits}

    s2 = build_kg(fixture_dir, out_resume, cfg, shards=2, num_buckets=16)
    commits = [
        json.loads(l)
        for l in open(os.path.join(out_resume, "_manifest", "commits.jsonl"))
    ]
    bucket_commits = [c for c in commits if c["phase"] == "materialize_edges"]
    # 16 total, no bucket committed twice, and the resume touched only
    # the 16−K missing ones
    assert len(bucket_commits) == 16
    assert len({c["partition"] for c in bucket_commits}) == 16
    resumed = {c["partition"] for c in bucket_commits} - committed_parts
    assert len(resumed) == 16 - K

    a, b = _edges_df(out_full), _edges_df(out_resume)
    pd.testing.assert_frame_equal(a, b)
    assert s2["edges"] == s1["edges"] and s2["nodes"] == s1["nodes"]

    # extraction did NOT rerun on resume (phase-A commits unchanged)
    extract = [c for c in commits if c["phase"] == "extract"]
    assert len(extract) == 2
