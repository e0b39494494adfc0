"""Pipeline diagnostics: turn ``Dataset.stats()`` prose into a tidy
per-operator table so "read ds.stats() and iterate until wall-time is
dominated by useful compute" is a one-liner instead of eyeballing a
wall of text. Pure driver-side string parsing — no Ray calls, no data
movement; tolerant of unknown lines (unrecognized operators simply
carry NaN fields rather than failing a bench run)."""

from __future__ import annotations

import re

import pandas as pd

_OP = re.compile(
    r"^Operator (\d+) (.+?): (\d+) tasks executed, (\d+) blocks produced"
    r" in ([\d.]+)s",
    re.M,
)
_UNIT = {"us": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0}


def _total_seconds(block: str, label: str) -> float:
    m = re.search(
        rf"\* {re.escape(label)}: .*? ([\d.]+)(us|ms|s|m) total", block
    )
    if not m:
        return float("nan")
    return float(m.group(1)) * _UNIT[m.group(2)]


def stage_times(stats: str) -> pd.DataFrame:
    """Parse ``ds.stats()`` → one row per operator:
    (op_idx, operator, n_tasks, n_blocks, wall_s, remote_wall_s,
    remote_cpu_s, udf_s, rows_out). ``wall_s`` is the operator's
    streaming wall clock (overlaps with other operators); the remote
    totals are summed across tasks (> wall when parallel). Sort by
    ``remote_cpu_s`` to find where the compute actually goes, and
    compare ``udf_s`` to ``remote_wall_s`` to see framework overhead
    per stage."""
    ops = list(_OP.finditer(stats))
    rows = []
    for i, m in enumerate(ops):
        start = m.start()
        end = ops[i + 1].start() if i + 1 < len(ops) else len(stats)
        block = stats[start:end]
        nrows = re.search(
            r"\* Output num rows per block: .*? (\d+) total", block
        )
        rows.append(
            {
                "op_idx": int(m.group(1)),
                "operator": m.group(2),
                "n_tasks": int(m.group(3)),
                "n_blocks": int(m.group(4)),
                "wall_s": float(m.group(5)),
                "remote_wall_s": _total_seconds(block, "Remote wall time"),
                "remote_cpu_s": _total_seconds(block, "Remote cpu time"),
                "udf_s": _total_seconds(block, "UDF time"),
                "rows_out": int(nrows.group(1)) if nrows else -1,
            }
        )
    return pd.DataFrame(rows)
