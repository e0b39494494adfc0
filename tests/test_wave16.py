"""Wave-67 crawl-side web ops: URL canonicalization, re-crawl
snapshot dedup, per-domain crawl stats. The registered kg_* queries
are rows-only (the pages fixture is not a driver-registered SQL
view), so these tests ARE the gate: exact canonical forms, winner
selection, and domain aggregates on planted inputs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_canonical_url_forms():
    from kgflow.ops.web import _canonicalize

    urls = pd.Series(
        [
            "HTTPS://Example.COM:443/a/b/?utm_source=x&q=1#frag",
            "http://example.com:80/",
            "http://example.com:8080/path/",
            "https://example.com/a?utm_campaign=c&utm_term=t",
            "https://example.com/a?b=2&gclid=123&a=1",
            "not a url",
            "https://example.com",
        ]
    )
    got = _canonicalize(urls).tolist()
    assert got[0] == "https://example.com/a/b?q=1"
    assert got[1] == "http://example.com/"
    assert got[2] == "http://example.com:8080/path"  # non-default port kept
    assert got[3] == "https://example.com/a"  # all params dropped -> no '?'
    assert got[4] == "https://example.com/a?b=2&a=1"  # order preserved
    assert got[5] == "not a url"  # non-absolute passes through
    assert got[6] == "https://example.com/"  # empty path -> root


def test_latest_snapshots_keeps_newest_capture():
    from kgflow.ops.web import latest_snapshots

    ts = pd.to_datetime(
        ["2024-01-01", "2024-03-01", "2024-02-01", "2024-05-05"]
    )
    pages = rd.from_pandas(
        pd.DataFrame(
            {
                "url": [
                    "https://a.com/x?utm_source=feed",  # alias of /x
                    "https://a.com/x",                   # newest capture
                    "https://a.com/x#top",               # alias of /x
                    "https://b.com/y",
                ],
                "warc_ts": ts,
            }
        )
    ).repartition(3)
    out = (
        latest_snapshots(pages)
        .to_pandas()
        .set_index("canon_url")
        .sort_index()
    )
    assert len(out) == 2
    assert out.loc["https://a.com/x", "n_snapshots"] == 3
    assert out.loc["https://a.com/x", "url"] == "https://a.com/x"
    assert out.loc["https://a.com/x", "warc_ts"] == pd.Timestamp("2024-03-01")
    assert out.loc["https://b.com/y", "n_snapshots"] == 1


def test_domain_stats_aggregates():
    from kgflow.ops.web import domain_stats

    pages = rd.from_pandas(
        pd.DataFrame(
            {
                "url": [
                    "https://a.com/1",
                    "https://A.com/2",  # host case-folds into a.com
                    "https://b.com/1",
                ],
                "warc_ts": pd.to_datetime(
                    ["2024-01-01", "2024-06-01", "2024-03-03"]
                ),
                "lang": ["en", "de", "en"],
            }
        )
    ).repartition(2)
    out = domain_stats(pages).to_pandas().set_index("domain").sort_index()
    assert out.loc["a.com", "n_pages"] == 2
    assert out.loc["a.com", "n_langs"] == 2
    assert out.loc["a.com", "first_ts"] == pd.Timestamp("2024-01-01")
    assert out.loc["a.com", "last_ts"] == pd.Timestamp("2024-06-01")
    assert out.loc["b.com", "n_pages"] == 1
