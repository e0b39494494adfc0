"""Driver-contract sweep replica: run EVERY registered query at a
given sf dir, run its DuckDB oracle when one exists, and compare row
count + column names + normalized sorted values (the same dtype-loose
assert_frame_equal comparator as tests/test_entry.py, atol=1e-6). Use
before a round ends to guarantee the real sweep lands all-green and
to spot slow queries.

Usage: python BENCH/sweep.py [--sf /root/testdata/sf0.01] [--cpus 32]
       [--only name1,name2]
Writes one JSON line per query to stdout and a summary at the end.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(df):
    import numpy as np

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    import ray

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb
    import pandas as pd

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(qs)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    def oracle(sql):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{args.sf}/{t}.parquet')"
            )
        return con.sql(sql).df()

    t_all = time.time()
    n_pass = n_rows_only = n_fail = 0
    slow = []
    for name in names:
        t0 = time.time()
        rec = {"query": name}
        try:
            res = qs[name](args.sf)
            got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            rec["rows"] = int(len(got))
            rec["t_engine"] = round(time.time() - t0, 2)
            if name in oracles:
                t1 = time.time()
                want = oracle(oracles[name])
                rec["t_oracle"] = round(time.time() - t1, 2)
                g, w = _norm(got.copy()), _norm(want)
                ok = list(g.columns) == list(w.columns) and len(g) == len(w)
                if ok:
                    # same comparator as tests/test_entry.py (the
                    # pytest replica of the driver gate): dtype-loose,
                    # 1e-6 tolerance — a raw CSV hash false-positives
                    # on int64-vs-float64 and timestamp formatting
                    try:
                        pd.testing.assert_frame_equal(
                            g, w, check_dtype=False, atol=1e-6
                        )
                    except AssertionError:
                        ok = False
                rec["status"] = "pass" if ok else "FAIL"
                if not ok:
                    rec["detail"] = {
                        "engine_cols": list(g.columns),
                        "oracle_cols": list(w.columns),
                        "engine_rows": len(g),
                        "oracle_rows": len(w),
                    }
                    n_fail += 1
                else:
                    n_pass += 1
            else:
                rec["status"] = "rows_only"
                n_rows_only += 1
        except Exception as ex:  # noqa: BLE001
            rec["status"] = "ERROR"
            rec["error"] = f"{type(ex).__name__}: {ex}"[:300]
            n_fail += 1
        rec["t_total"] = round(time.time() - t0, 2)
        if rec["t_total"] > 15:
            slow.append((name, rec["t_total"]))
        print(json.dumps(rec), flush=True)

    print(
        json.dumps(
            {
                "summary": True,
                "queries": len(names),
                "oracled_pass": n_pass,
                "rows_only": n_rows_only,
                "failures": n_fail,
                "wall_sec": round(time.time() - t_all, 1),
                "slowest": sorted(slow, key=lambda x: -x[1])[:10],
            }
        )
    )
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
