"""Round-5 regression tests for the round-4 advisor findings:
int8_topk tie-complete partials, duplicate registry keys, zone-map
empty-partition sentinel + stale-sidecar cleanup + file-less
partitions, and read_parquet_evolved shard groups with none of the
requested columns."""

import ast
import os
import pathlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module", autouse=True)
def _ray(ray_session):
    yield


def test_int8_topk_keeps_cutoff_ties_in_partial():
    from kgflow.ops.ann import int8_topk

    # 40 rows, ALL with the same embedding -> every integer dot product
    # ties; the documented tie rule (score DESC, neighbor_id DESC) makes
    # the answer the k highest neighbor ids. Before the fix, the
    # per-batch argpartition kept an arbitrary k+1 of the 40 tied rows,
    # so the merge could not recover the right ids.
    n, k = 40, 5
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(1, n + 1, dtype=np.int64),
            "embedding": [[0.5, 0.25, -0.125, 1.0]] * n,
        }
    )
    out = int8_topk(
        rd.from_pandas(emb),
        query_ids=[1],
        query_matrix=np.array([[0.5, 0.25, -0.125, 1.0]]),
        k=k,
    ).to_pandas()
    got = sorted(out["neighbor_id"].tolist(), reverse=True)
    assert got == [40, 39, 38, 37, 36]


def test_registry_dicts_have_no_duplicate_keys():
    src = (REPO / "__ray_entry__.py").read_text()
    tree = ast.parse(src)
    for fn in ast.walk(tree):
        if not (
            isinstance(fn, ast.FunctionDef)
            and fn.name in ("queries", "oracle_sql")
        ):
            continue
        for node in ast.walk(fn):
            if not isinstance(node, ast.Dict):
                continue
            keys = [
                k.value for k in node.keys if isinstance(k, ast.Constant)
            ]
            if len(keys) < 10:
                continue  # small helper dicts
            dups = sorted(k for k in set(keys) if keys.count(k) > 1)
            assert dups == [], f"{fn.name} duplicates keys {dups}"


def _write_part(table_dir, part, ids):
    d = os.path.join(table_dir, f"bucket={part}")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table({"k": pa.array(ids, pa.int64())}),
        os.path.join(d, "part0.parquet"),
    )


def test_zonemap_empty_partition_prunes(tmp_path):
    from kgflow.materialize.zonemap import (
        build_zonemap_index,
        zonemap_lookup,
    )

    table = str(tmp_path / "t")
    _write_part(table, 0, [5, 6, 7])
    _write_part(table, 1, [])  # empty partition
    build_zonemap_index(table, "k")
    # a probe spanning 0..1 used to match the old [1, 0] sentinel
    assert zonemap_lookup(table, "k", -10, 10) == ["bucket=0"]
    assert zonemap_lookup(table, "k", 0, 1) == []


def test_zonemap_stale_sidecar_cleared(tmp_path):
    import shutil

    from kgflow.materialize.zonemap import (
        build_zonemap_index,
        zonemap_lookup,
    )

    table = str(tmp_path / "t")
    _write_part(table, 0, [1, 2])
    _write_part(table, 1, [100, 200])
    build_zonemap_index(table, "k")
    shutil.rmtree(os.path.join(table, "bucket=1"))
    build_zonemap_index(table, "k")  # must drop the stale sidecar
    assert zonemap_lookup(table, "k", 0, 1000) == ["bucket=0"]


def test_read_range_pruned_fileless_partition(tmp_path):
    from kgflow.materialize.zonemap import (
        build_zonemap_index,
        read_range_pruned,
    )

    table = str(tmp_path / "t")
    _write_part(table, 0, [5])
    build_zonemap_index(table, "k")
    # partition overlaps but its parquet file vanished -> empty Dataset,
    # not a read_parquet error on an empty file list
    os.remove(os.path.join(table, "bucket=0", "part0.parquet"))
    out = read_range_pruned(table, "k", 0, 10).to_pandas()
    assert len(out) == 0


def test_read_parquet_evolved_group_without_requested_columns(tmp_path):
    from kgflow.sources.parquet import read_parquet_evolved

    d = str(tmp_path / "tbl")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "a": pa.array([1, 2], pa.int64()),
                "b": pa.array([10, 20], pa.int64()),
            }
        ),
        os.path.join(d, "s0.parquet"),
    )
    # drifted shard: no column `a` at all
    pq.write_table(
        pa.table(
            {
                "b": pa.array([30, 40, 50], pa.int64()),
                "c": pa.array(["x", "y", "z"]),
            }
        ),
        os.path.join(d, "s1.parquet"),
    )
    out = read_parquet_evolved(d, columns=["a"]).to_pandas()
    assert len(out) == 5
    assert sorted(out["a"].dropna().tolist()) == [1, 2]
    assert out["a"].isna().sum() == 3
