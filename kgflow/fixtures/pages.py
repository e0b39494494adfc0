"""Deterministic synthetic `pages` fixture (FIXTURES.md §1).

Schema (exactly the BASELINE.json ``input_hint`` shape):
    url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string

plus a companion ``gold_spo`` table (url, sent_id, text,
spo: list<struct<subject,predicate,object>>) derived from the closed-world
templates at generation time — the analogue of OpenUE's ``{text, spo_list}``
JSONL rows (reference `/root/reference/src/openue/data/utils.py:311-332`).

``pages.text`` is produced by the SAME pure extractor the engine ships
(`kgflow.stages.extract.extract_text`), so the byte-identical per-url
invariant is checkable. Generation is a pure function of the page index
(seed 42); tables are cached as Parquet under /tmp keyed by page count.

Scale note: this generator exists only to synthesize test/bench input —
it is not part of the engine. It writes chunked Parquet (64 MiB-ish row
groups) so even large fixture sizes never hold the whole table in RAM.
"""

from __future__ import annotations

import datetime as _dt
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

from kgflow.fixtures import corpus
from kgflow.stages.extract import extract_text

_EPOCH = _dt.datetime(2024, 1, 1, 0, 0, 0)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

SPO_TYPE = pa.list_(
    pa.struct(
        [("subject", pa.string()), ("predicate", pa.string()), ("object", pa.string())]
    )
)
GOLD_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int64()),
        ("text", pa.string()),
        ("spo", SPO_TYPE),
    ]
)

_LANG_WHEEL = ["en"] * 90 + ["de"] * 4 + ["fr"] * 3 + [""] * 3

# bump when generator output changes so stale /tmp caches are ignored
FIXTURE_VERSION = 3

# pages are written as a DIRECTORY of part files (like real WARC-derived
# corpora): parallel read tasks + file-level shard resume. One part per
# _PAGES_PER_FILE pages.
_PAGES_PER_FILE = 1000


def page_url(i: int) -> str:
    return f"https://site{i % 1000}.example/page/{i}"


def render_page(i: int) -> tuple[str, _dt.datetime, bytes, str, str, list[tuple[str, list]]]:
    """Pure function page index → one pages row + its gold sentences.

    Returns (url, warc_ts, html, text, lang, gold) where gold is a list of
    (sentence_text, spo_list) in extracted-text line order starting at the
    line AFTER the title (the title line carries no gold).
    """
    rng = corpus._rng(i)
    lang = _LANG_WHEEL[rng.randrange(100)]
    n_sents = 1 + rng.randrange(5)
    sents = [corpus.make_sentence(i, j) for j in range(n_sents)]

    empty_body = rng.random() < 0.02
    broken = (not empty_body) and rng.random() < 0.01

    buf = [f"<html><head><title>Page {i}</title></head><body>"]
    buf.append("<nav>site navigation home about</nav>")
    if not empty_body:
        for j, (text, _) in enumerate(sents):
            if broken and j == n_sents - 1:
                buf.append(f"<p>{text}")  # unterminated → dropped by extractor
            else:
                buf.append(f"<p>{text}</p>")
    buf.append(f"<footer>copyright 2024 site{i % 1000}</footer></body></html>")
    html = "".join(buf).encode("utf-8")

    text = extract_text(html)
    kept = n_sents if not (empty_body or broken) else (0 if empty_body else n_sents - 1)
    gold = sents[:kept]
    return page_url(i), _EPOCH + _dt.timedelta(seconds=i), html, text, lang, gold


def _build_chunk(lo: int, hi: int) -> tuple[pa.Table, pa.Table]:
    # gold entity strings go through the tokenizer round-trip so they are
    # directly comparable with detokenized extraction output (the
    # reference compares token-level triples, transformer.py:198-201)
    from kgflow.stages.runtime import get_tokenizer

    tok = get_tokenizer()

    def _norm(s: str) -> str:
        return tok.decode_span(tok.encode(s, add_special_tokens=False))

    urls, tss, htmls, texts, langs = [], [], [], [], []
    g_url, g_sid, g_text, g_spo = [], [], [], []
    for i in range(lo, hi):
        url, ts, html, text, lang, gold = render_page(i)
        urls.append(url)
        tss.append(ts)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
        if lang == "en":
            # sent_id in extracted-text line order; line 0 is the title.
            for j, (stext, spo) in enumerate(gold):
                g_url.append(url)
                g_sid.append(j + 1)
                g_text.append(stext)
                g_spo.append(
                    [
                        {"subject": _norm(s), "predicate": p, "object": _norm(o)}
                        for (s, p, o) in spo
                    ]
                )
    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )
    gold_t = pa.table(
        {
            "url": pa.array(g_url, pa.string()),
            "sent_id": pa.array(g_sid, pa.int64()),
            "text": pa.array(g_text, pa.string()),
            "spo": pa.array(g_spo, SPO_TYPE),
        },
        schema=GOLD_SCHEMA,
    )
    return pages, gold_t


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.001


def n_pages_for_sf(sf: float) -> int:
    return max(10, round(1_000_000 * sf))


def ensure_pages(n_pages: int, cache_root: str = "/tmp/kgflow_fixtures") -> str:
    """Generate (or reuse cached) pages + gold_spo Parquet for ``n_pages``.

    Returns the fixture directory containing ``pages.parquet`` and
    ``gold_spo.parquet``. Atomic: writes into a temp dir then renames.
    """
    out = os.path.join(cache_root, f"pages_v{FIXTURE_VERSION}_n{n_pages}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    tmp = out + f".tmp.{os.getpid()}"
    os.makedirs(os.path.join(tmp, "pages"), exist_ok=True)
    gw = None
    try:
        for part, lo in enumerate(range(0, n_pages, _PAGES_PER_FILE)):
            pages, gold = _build_chunk(lo, min(lo + _PAGES_PER_FILE, n_pages))
            pq.write_table(
                pages, os.path.join(tmp, "pages", f"part-{part:05d}.parquet")
            )
            if gw is None:
                gw = pq.ParquetWriter(os.path.join(tmp, "gold_spo.parquet"), GOLD_SCHEMA)
            gw.write_table(gold)
    finally:
        if gw is not None:
            gw.close()
    # entity-linking ground truth (FIXTURES.md §5)
    from kgflow.fixtures.corpus import gold_cluster_rows

    rows = gold_cluster_rows()
    pq.write_table(
        pa.table(
            {
                "mention": pa.array([r[0] for r in rows], pa.string()),
                "entity": pa.array([r[1] for r in rows], pa.string()),
                "etype": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        os.path.join(tmp, "gold_clusters.parquet"),
    )
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    try:
        os.rename(tmp, out)
    except OSError:
        # another process won the race; our tmp dir is redundant
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out


def pages_for_sf_dir(sf_dir: str) -> str:
    """Fixture dir for a driver sf dir (e.g. /root/testdata/sf0.01).

    ``KGFLOW_PAGES`` overrides the page count — used by the scaling-
    evidence run, which measures at a larger input so fixed per-job
    costs (actor ramp, read fan-out) amortize the way they do at
    production scale."""
    n = int(os.environ.get("KGFLOW_PAGES", "0")) or n_pages_for_sf(sf_from_dir(sf_dir))
    return ensure_pages(n)
