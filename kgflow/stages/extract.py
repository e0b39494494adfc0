"""HTML → text extraction (deterministic, pure).

The reference (zjunlp/OpenUE) starts from pre-extracted sentences
(`/root/reference/src/openue/data/utils.py:311-332`); HTML extraction is a
north-rule addition for the Common-Crawl-style `pages` input
(`input_hint`: byte-identical extracted text per url).

``extract_text`` is a pure function of the html bytes — the fixture
generator writes ``pages.text`` with the SAME function, so the per-row
invariant ``extract_text(html) == text`` is checkable byte-for-byte.

Scale notes: this is a stateless, CPU-bound, embarrassingly parallel
stage; the regexes are module-level compiled (C-level scan per row). The
wide ``html: binary`` column is dropped immediately after this stage
(projection push-down) so downstream blocks stay narrow.
"""

from __future__ import annotations

import re

import pyarrow as pa

_TITLE_RE = re.compile(rb"<title>(.*?)</title>", re.S)
_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)
_TAG_RE = re.compile(rb"<[^>]*>")


def extract_text(html: bytes) -> str:
    """Deterministic main-content extraction.

    Keeps <title> and complete <p>…</p> blocks in document order;
    boilerplate (<nav>, <footer>, anything outside those tags, and any
    unterminated/broken block) is dropped. Inner tags become spaces;
    whitespace is collapsed; parts are newline-joined.
    """
    if html is None:
        return ""
    parts: list[bytes] = []
    m = _TITLE_RE.search(html)
    if m is not None:
        parts.append(m.group(1))
    parts.extend(_P_RE.findall(html))
    out: list[str] = []
    for raw in parts:
        s = _TAG_RE.sub(b" ", raw).decode("utf-8", "replace")
        s = " ".join(s.split())
        if s:
            out.append(s)
    return "\n".join(out)


def extract_batch(batch: pa.Table) -> pa.Table:
    """map_batches fn: pages(url, warc_ts, html, lang, …) → (url, warc_ts, lang, text).

    Recomputes text from html (the authoritative path at production scale,
    where the stored ``text`` column may be absent) and DROPS the wide
    ``html`` binary column so downstream blocks are narrow.
    """
    texts = pa.array(
        [extract_text(h) for h in batch.column("html").to_pylist()],
        type=pa.string(),
    )
    keep = [c for c in ("url", "warc_ts", "lang") if c in batch.column_names]
    out = batch.select(keep)
    return out.append_column("text", texts)
