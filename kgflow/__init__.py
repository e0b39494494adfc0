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


def _install_log_filters() -> None:
    """Suppress one known-benign Ray Data warning.

    Ray 2.49's pandas block sizer samples object columns and calls
    ``np.vectorize`` on the sample (ray/data/_internal/pandas_block.py:
    497-507); on a ZERO-ROW object column numpy raises ("cannot call
    `vectorize` on size 0 inputs unless `otypes` is set") and Ray logs
    the caught exception as a warning. kgflow's bucketed reduces
    intentionally emit schema-typed zero-row frames for empty buckets
    (see kgflow/ops/shuffle.py), which tickles that bug on every empty
    bucket. The size estimate for an empty block is irrelevant, so the
    warning is pure noise — filter exactly that message. Installed at
    import time so worker processes (which import kgflow to unpickle
    UDFs) are covered too."""
    import logging

    class _EmptyBlockSizeFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return not record.getMessage().startswith(
                "Error calculating size for column"
            )

    logging.getLogger("ray.data._internal.pandas_block").addFilter(
        _EmptyBlockSizeFilter()
    )

    # Second known-benign warning: transform_pyarrow's schema-dedup
    # cache hashes schemas and logs "Failed to hash the schemas (for
    # deduplication): unhashable type: 'dict'" whenever a schema carries
    # dict-valued metadata (e.g. pandas metadata written by parquet).
    # Purely an optimization miss inside Ray, not a correctness signal.
    class _SchemaHashFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return not record.getMessage().startswith("Failed to hash the schemas")

    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).addFilter(_SchemaHashFilter())


_install_log_filters()
