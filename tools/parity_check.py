"""Local pre-flight of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB at
sf0.01, compare row count, column names, and order-insensitive values.

Usage: python tools/parity_check.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

from data_profiler_spark.operators.corpus import CORPUS  # noqa: E402
from data_profiler_spark.session import get_spark  # noqa: E402
from data_profiler_spark.sources.tpch import TPCH_TABLES  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            return 0.0
        return v
    if isinstance(v, bool):
        return int(v)
    return v


def multiset(rows, cols):
    out = Counter()
    for r in rows:
        d = dict(zip(cols, r)) if not isinstance(r, dict) else r
        out[tuple(norm_cell(d[c]) for c in sorted(cols))] += 1
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("parity_check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    names = args.names or list(CORPUS)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        fn, sql = CORPUS[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            srows = [r.asDict() for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if sql is None:
            print(f"ROWS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s, no oracle)")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(sql)
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if sorted(c.lower() for c in scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rows spark={len(srows)} duck={len(drows)}")
        if ok:
            ms = multiset(srows, [c.lower() for c in scols])
            md = multiset(drows, dcols)
            if ms != md:
                ok = False
                diff_s = ms - md
                diff_d = md - ms
                ex_s = list(diff_s.items())[:2]
                ex_d = list(diff_d.items())[:2]
                msgs.append(
                    f"values differ: {sum(diff_s.values())} spark-only / "
                    f"{sum(diff_d.values())} duck-only; e.g. spark{ex_s} duck{ex_d}"
                )
        if ok:
            print(f"PASS  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: " + " | ".join(msgs))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
