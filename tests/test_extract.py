"""Fixture generator determinism + the byte-identical extraction invariant
(SURVEY.md §5.2 test #3; input_hint per-row invariant)."""

import pyarrow.parquet as pq

from kgflow.fixtures.pages import ensure_pages, render_page
from kgflow.stages.extract import extract_text


def test_render_deterministic():
    a = render_page(7)
    b = render_page(7)
    assert a == b
    assert a[0] == "https://site7.example/page/7"


def test_extract_byte_identical(tmp_path):
    out = ensure_pages(300, cache_root=str(tmp_path))
    t = pq.read_table(out + "/pages")
    htmls = t.column("html").to_pylist()
    texts = t.column("text").to_pylist()
    assert len(htmls) == 300
    for h, x in zip(htmls, texts):
        assert extract_text(h) == x  # byte-identical per url


def test_extract_edge_cases():
    assert extract_text(b"") == ""
    assert extract_text(None) == ""
    # broken <p> dropped, complete ones kept, nav/footer dropped
    html = b"<html><head><title>T</title></head><body><nav>skip me</nav><p>keep one</p><p>broken tail<footer>skip</footer></body></html>"
    assert extract_text(html) == "T\nkeep one"
    # inner tags become spaces, whitespace collapses
    assert extract_text(b"<p>a <b>bold</b>   word</p>") == "a bold word"


def test_gold_alignment(tmp_path):
    out = ensure_pages(200, cache_root=str(tmp_path))
    pages = pq.read_table(out + "/pages")
    gold = pq.read_table(out + "/gold_spo.parquet")
    by_url = {u: t for u, t in zip(pages.column("url").to_pylist(), pages.column("text").to_pylist())}
    langs = {u: l for u, l in zip(pages.column("url").to_pylist(), pages.column("lang").to_pylist())}
    for url, sid, text in zip(
        gold.column("url").to_pylist(),
        gold.column("sent_id").to_pylist(),
        gold.column("text").to_pylist(),
    ):
        assert langs[url] == "en"
        lines = by_url[url].split("\n")
        assert lines[sid] == text  # gold sent_id matches splitter line order
