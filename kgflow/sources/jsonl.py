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

    ``text_id`` is a TRUE global sequential example number (the
    reference numbers examples sequentially, `data/utils.py:320-330`) —
    unique and contiguous across files and blocks (round-1 fix: the old
    per-block index restarted at 0 in every block). Construction:

    1. each file is parsed in one task with per-file local example ids
       (files are the parallelism unit — JSONL golden corpora are
       file-sharded);
    2. a file-count-sized groupby yields per-file example counts, from
       which the driver computes prefix-sum offsets in lexicographic
       path order (deterministic; the file list is small even when the
       data is not);
    3. a broadcast map adds ``offset[path] + local_id``.

    The corpus is read once; the parsed dataset is pinned in the object
    store across the two consumers.
    """
    files = rd.read_binary_files(path, include_paths=True)

    def parse_file(batch: pa.Table) -> pa.Table:
        paths, lids, texts, spos = [], [], [], []
        for p, raw in zip(
            batch.column("path").to_pylist(), batch.column("bytes").to_pylist()
        ):
            local = 0
            for line in raw.decode("utf-8").splitlines():
                if not line.strip():
                    continue
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
                paths.append(p)
                lids.append(local)
                texts.append(text)
                spos.append(spo)
                local += 1
        return pa.table(
            {
                "path": pa.array(paths, pa.string()),
                "local_id": pa.array(lids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "spo": pa.array(spos, SPO_TYPE),
            }
        )

    parsed = files.map_batches(parse_file, batch_format="pyarrow").materialize()
    counts = parsed.groupby("path").count().to_pandas()  # file-count-sized
    counts = counts.sort_values("path").reset_index(drop=True)
    offsets: dict[str, int] = {}
    acc = 0
    for p, n in zip(counts["path"], counts["count()"]):
        offsets[p] = acc
        acc += int(n)
    # plain closure (no actor pool): the offsets dict is file-count-sized
    # and ships with the task like any broadcast small side
    def add_offset(t: pa.Table) -> pa.Table:
        off = [offsets[p] for p in t.column("path").to_pylist()]
        tid = pa.array(
            [o + int(l) for o, l in zip(off, t.column("local_id").to_pylist())],
            pa.int64(),
        )
        return pa.table(
            {
                "text_id": tid,
                "text": t.column("text"),
                "spo": t.column("spo"),
            },
            schema=EXAMPLES_SCHEMA,
        )

    return parsed.map_batches(add_offset, batch_format="pyarrow")


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


QUARANTINE_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("line_no", pa.int64()),
        ("reason", pa.string()),
        ("snippet", pa.string()),
    ]
)


def read_examples_quarantine(path: str) -> tuple["rd.Dataset", "rd.Dataset"]:
    """`read_examples` with a QUARANTINE channel instead of silent
    drops: returns ``(examples, quarantine)`` where examples carries
    the same (text_id, text, spo) contract (global contiguous ids over
    GOOD rows only) and quarantine carries one row per rejected line —
    (path, line_no 1-based physical, reason ∈ {invalid_json,
    bad_schema}, snippet ≤120 chars). At corpus scale a 0.01% silent
    drop is millions of rows; the quarantine table is the audit trail
    (write it next to the output like the `_manifest` lineage dir) and
    its row count belongs in the run's data-quality gate
    (`kgflow.ops.checks`).

    Scale shape mirrors `read_examples`: one parse task per file, ONE
    materialized tagged pass feeding both outputs (neither filter
    re-reads or re-parses the corpus), file-count-sized offset fold."""
    files = rd.read_binary_files(path, include_paths=True)

    def parse_file(batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {
            "path": [], "local_id": [], "text": [], "spo": [],
            "ok": [], "line_no": [], "reason": [], "snippet": [],
        }

        def emit(p, ok, local=-1, text="", spo=None, ln=-1, why="", snip=""):
            rows["path"].append(p)
            rows["local_id"].append(local)
            rows["text"].append(text)
            rows["spo"].append(spo or [])
            rows["ok"].append(ok)
            rows["line_no"].append(ln)
            rows["reason"].append(why)
            rows["snippet"].append(snip)

        for p, raw in zip(
            batch.column("path").to_pylist(),
            batch.column("bytes").to_pylist(),
        ):
            local = 0
            for ln, line in enumerate(
                raw.decode("utf-8").splitlines(), start=1
            ):
                if not line.strip():
                    continue
                try:
                    item = json.loads(line)
                except json.JSONDecodeError:
                    emit(p, False, ln=ln, why="invalid_json",
                         snip=line[:120])
                    continue
                try:
                    text = item["text"]
                    if not isinstance(text, str):
                        raise TypeError("text not a string")
                    spo = [
                        {
                            "subject": t["subject"],
                            "predicate": t["predicate"],
                            "object": t["object"],
                        }
                        for t in item.get("spo_list", [])
                    ]
                except (KeyError, TypeError):
                    emit(p, False, ln=ln, why="bad_schema",
                         snip=line[:120])
                    continue
                emit(p, True, local=local, text=text, spo=spo)
                local += 1
        return pa.table(
            {
                "path": pa.array(rows["path"], pa.string()),
                "local_id": pa.array(rows["local_id"], pa.int64()),
                "text": pa.array(rows["text"], pa.string()),
                "spo": pa.array(rows["spo"], SPO_TYPE),
                "ok": pa.array(rows["ok"], pa.bool_()),
                "line_no": pa.array(rows["line_no"], pa.int64()),
                "reason": pa.array(rows["reason"], pa.string()),
                "snippet": pa.array(rows["snippet"], pa.string()),
            }
        )

    tagged = files.map_batches(
        parse_file, batch_format="pyarrow"
    ).materialize()

    import pyarrow.compute as pc

    good = tagged.filter(expr="ok")
    counts = (
        good.groupby("path").count().to_pandas()
    )  # file-count-sized
    counts = counts.sort_values("path").reset_index(drop=True)
    offsets: dict[str, int] = {}
    acc = 0
    for p, n in zip(counts["path"], counts["count()"]):
        offsets[p] = acc
        acc += int(n)

    def add_offset(t: pa.Table) -> pa.Table:
        off = [offsets[p] for p in t.column("path").to_pylist()]
        tid = pa.array(
            [
                o + int(l)
                for o, l in zip(off, t.column("local_id").to_pylist())
            ],
            pa.int64(),
        )
        return pa.table(
            {
                "text_id": tid,
                "text": t.column("text"),
                "spo": t.column("spo"),
            },
            schema=EXAMPLES_SCHEMA,
        )

    examples = good.map_batches(add_offset, batch_format="pyarrow")

    def only_bad(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t.column("ok")))
        return pa.table(
            {
                "path": t.column("path"),
                "line_no": t.column("line_no"),
                "reason": t.column("reason"),
                "snippet": t.column("snippet"),
            },
            schema=QUARANTINE_SCHEMA,
        )

    quarantine = tagged.map_batches(only_bad, batch_format="pyarrow")
    return examples, quarantine
