"""Stage-boundary schema validation (SURVEY.md §1.3: fixed declared
Arrow schemas per logical table)."""

import pyarrow as pa
import pytest

from kgflow import schema
from kgflow.fixtures.pages import ensure_pages
from kgflow.pipelines.kg import (
    KgConfig,
    encoded_ds,
    events_ds,
    read_pages,
    sentences_ds,
    triples_ds,
)


@pytest.fixture(scope="module")
def fixture_dir(ray_session):
    return ensure_pages(120)


def _first_block(ds) -> pa.Table:
    import ray

    ref = ds.to_arrow_refs()[0]
    t = ray.get(ref)
    if not isinstance(t, pa.Table):
        t = pa.Table.from_pandas(t, preserve_index=False)
    return t


def test_pages_schema(fixture_dir):
    import pyarrow.parquet as pq

    t = pq.read_table(fixture_dir + "/pages")
    schema.assert_matches(t, schema.PAGES)


def test_stage_schemas(fixture_dir):
    cfg = KgConfig()
    pages = read_pages(fixture_dir, cfg)
    sent = sentences_ds(pages, cfg)
    schema.assert_matches(_first_block(sent), schema.SENTENCES)
    enc = encoded_ds(sent, cfg)
    schema.assert_matches(_first_block(enc), schema.ENCODED)
    tri = triples_ds(fixture_dir, cfg)
    schema.assert_matches(_first_block(tri), schema.TRIPLES)
    ev = events_ds(fixture_dir, cfg)
    schema.assert_matches(_first_block(ev), schema.EVENTS)


def test_linking_and_sink_schemas(fixture_dir):
    from kgflow.linking.link import canonical_triples, entity_map
    from kgflow.materialize.edges import dedup_edges, nodes_table

    tri = triples_ds(fixture_dir).materialize()
    emap = entity_map(tri)
    et = _first_block(emap.materialize())
    schema.assert_matches(et.select(schema.ENTITY_MAP.names), schema.ENTITY_MAP)
    canon, emap_ds = canonical_triples(tri)
    edges = dedup_edges(canon).materialize()
    eb = _first_block(edges)
    schema.assert_matches(eb.select(schema.EDGES.names), schema.EDGES)
    nodes = nodes_table(emap_ds).materialize()
    nb = _first_block(nodes)
    schema.assert_matches(nb.select(schema.NODES.names), schema.NODES)
