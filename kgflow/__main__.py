"""``ray job submit -- python -m kgflow <pages_path> <out_dir>`` entry.

Runs (or resumes) the full three-phase KG build
(`kgflow.pipelines.build.build_kg`). The job owns the Ray session; on a
cluster, ``ray.init(address="auto")`` attaches to it, locally it starts
one. This and bench.py/pytest are the ONLY places that call ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="kgflow", description=__doc__)
    p.add_argument("pages_path")
    p.add_argument("out_dir")
    p.add_argument("--shards", type=int, default=8)
    p.add_argument("--num-buckets", type=int, default=16)
    p.add_argument("--max-seq-length", type=int, default=256)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="local mode only; on a cluster omit and use address=auto")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from kgflow.pipelines.build import build_kg
    from kgflow.pipelines.kg import KgConfig

    summary = build_kg(
        args.pages_path,
        args.out_dir,
        KgConfig(max_seq_length=args.max_seq_length, seed=args.seed),
        shards=args.shards,
        num_buckets=args.num_buckets,
    )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
