"""kgflow — a Ray-Data-native knowledge-graph construction engine.

Built from scratch with the extraction capabilities of zjunlp/OpenUE
(EMNLP 2020 demo; reference checkout at /root/reference): two-stage
universal extraction — multi-label relation classification followed by
relation-conditioned BIO entity tagging (reference
`src/openue/models/model.py:135-459`) — re-expressed as streaming
`ray.data.Dataset` pipelines over zero-copy Arrow batches, plus the
downstream stages a web-scale KG build needs (entity linking via
minhash/LSH blocking, connected-components canonicalization, sorted and
deduplicated edge/node Parquet materialization with per-partition
lineage manifests).

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
process that owns the Ray session (bench.py, pytest fixture, driver)
does that.
"""

__version__ = "0.1.0"
