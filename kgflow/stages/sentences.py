"""Language filter + sentence splitting (vectorized batch fns).

The reference consumes pre-split sentences (one JSONL row each,
`/root/reference/src/openue/data/utils.py:311-332`); splitting and language
filtering are north-rule additions for the web-page input.

Both are stateless, vectorized, and preserve the ``(url, sent_id)`` key
that every downstream table is keyed by (SURVEY.md §2.10: the engine
never relies on global row order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def lang_filter_batch(batch: pa.Table, lang: str = "en") -> pa.Table:
    """Keep rows whose ``lang`` column equals ``lang`` (page-level filter).

    Vectorized predicate inside map_batches (cheaper than ds.filter(row_fn)).
    """
    return batch.filter(pc.equal(batch.column("lang"), lang))


def split_sentences_batch(batch: pa.Table) -> pa.Table:
    """(url, text) → (url, sent_id, text): one row per extracted-text line.

    The deterministic extractor emits one logical sentence per line
    (title first), so the splitter is an exact line split. This is the
    1→k row-explosion point for pages; implemented as a vectorized
    flat-map inside map_batches (never ``ds.flat_map`` per row).
    """
    urls = batch.column("url").to_pylist()
    texts = batch.column("text").to_pylist()
    out_url: list[str] = []
    out_sid: list[int] = []
    out_text: list[str] = []
    for url, text in zip(urls, texts):
        if not text:
            continue
        for j, line in enumerate(text.split("\n")):
            if line:
                out_url.append(url)
                out_sid.append(j)
                out_text.append(line)
    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "sent_id": pa.array(np.asarray(out_sid, dtype=np.int64)),
            "text": pa.array(out_text, pa.string()),
        }
    )


def drop_title_rows(batch: pa.Table) -> pa.Table:
    """Optionally drop the title line (sent_id == 0) before extraction —
    titles carry no relations in the closed world; keeping them only adds
    fallback-path work. Kept as a separate op so the flagship pipeline can
    choose either behavior explicitly."""
    return batch.filter(pc.not_equal(batch.column("sent_id"), pa.scalar(0, pa.int64())))
