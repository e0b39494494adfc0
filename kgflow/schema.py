"""Declared pyarrow schemas for every logical table (SURVEY.md §1.3).

The reference fixes its record shapes with dataclasses
(`/root/reference/src/openue/data/utils.py:162-188`); the engine fixes
them with declared Arrow schemas, validated at stage boundaries in
tests (`tests/test_schema.py`). Ragged token sequences stay ragged
(`list<int32>`); padding exists only inside model actors.
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

SENTENCES = pa.schema(
    [("url", pa.string()), ("sent_id", pa.int64()), ("text", pa.string())]
)

ENCODED = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int64()),
        ("text", pa.string()),
        ("input_ids", pa.list_(pa.int32())),
        ("n_tokens", pa.int32()),
    ]
)

SENT_RELATIONS = pa.schema(
    list(ENCODED) + [pa.field("rel_ids", pa.list_(pa.int32()))]
)

NER_INPUT = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int64()),
        ("rel_id", pa.int32()),
        ("ner_input_ids", pa.list_(pa.int32())),
        ("rel_pos", pa.int32()),
    ]
)

TRIPLES = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int64()),
        ("rel_id", pa.int32()),
        ("rel", pa.string()),
        ("subj", pa.string()),
        ("obj", pa.string()),
        ("subj_ids", pa.list_(pa.int32())),
        ("obj_ids", pa.list_(pa.int32())),
    ]
)

EVENTS = pa.schema(
    [
        ("url", pa.string()),
        ("sent_id", pa.int64()),
        ("event_type", pa.string()),
        ("role", pa.string()),
        ("argument", pa.string()),
    ]
)

ENTITY_MAP = pa.schema(
    [
        ("mention", pa.string()),
        ("norm", pa.string()),
        ("entity_id", pa.int64()),
        ("canonical", pa.string()),
        ("n", pa.int64()),
    ]
)

EDGES = pa.schema(
    [
        ("subj_id", pa.int64()),
        ("rel_id", pa.int32()),
        ("obj_id", pa.int64()),
        ("subj_canonical", pa.string()),
        ("rel", pa.string()),
        ("obj_canonical", pa.string()),
        ("weight", pa.int64()),
        ("sample_url", pa.string()),
        ("subj_bucket", pa.int32()),
    ]
)

NODES = pa.schema(
    [
        ("entity_id", pa.int64()),
        ("canonical", pa.string()),
        ("aliases", pa.list_(pa.string())),
        ("n_mentions", pa.int64()),
    ]
)


def assert_matches(table: pa.Table, schema: pa.Schema) -> None:
    """Column names must match exactly; types must be castable-equal
    (int32/int64 promotion across pandas round-trips is tolerated, since
    several stages run as pandas blocks)."""
    assert table.column_names == schema.names, (
        table.column_names,
        schema.names,
    )
    for name in schema.names:
        want = schema.field(name).type
        got = table.schema.field(name).type
        if got == want:
            continue
        # tolerate integer-width promotion from pandas blocks
        if pa.types.is_integer(got) and pa.types.is_integer(want):
            continue
        raise AssertionError(f"{name}: {got} != {want}")
