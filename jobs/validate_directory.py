"""spark-submit entrypoint for upload data-directory validation.

The analog of the reference's directory flow (data_directory.py: file
presence → header checks → coerce+fill → PK/FK checks, fail-fast), drivable
the same way every engine job is::

    zip -r dps.zip data_profiler_spark
    spark-submit --py-files dps.zip jobs/validate_directory.py \
        --path /uploads/customer_x --type headers --output /lake/dir_checks

Reads every expected csv/xlsx/xlsm file of the directory through the
validated ingest (sources/csvio), splits combined Inbound/Outbound for
REGULAR layouts, writes the single violations frame as parquet under
--output (plus one parquet table per coerced frame with --write-tables),
and prints a one-line JSON summary with per-check violation counts.
Exit code 1 when any check fired — the reference's fail-fast as a shell
contract.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", required=True, help="upload directory to validate")
    ap.add_argument("--type", default="headers", choices=["headers", "regular"])
    ap.add_argument("--output", required=True, help="output root for violations parquet")
    ap.add_argument("--cores", type=int, default=None, help="local[N] cores (sandbox)")
    ap.add_argument(
        "--write-tables",
        action="store_true",
        help="also persist each coerced frame as parquet under --output "
        "(the reference caches them for its transform step; this is the "
        "durable analog)",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_profiler_spark.session import get_spark
    from data_profiler_spark.sources.csvio import validate_upload_directory

    spark = get_spark(
        "validate_directory",
        cores=args.cores,
        extra_confs={"spark.ui.showConsoleProgress": "false"},
    )
    frames, violations = validate_upload_directory(spark, args.path, args.type)
    violations = violations.persist()
    violations.write.mode("overwrite").parquet(f"{args.output}/directory_violations")
    per_check = {
        r["check_name"]: r["n"]
        for r in violations.groupBy("check_name").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for name, n in sorted(per_check.items()):
        print(f"  {name}: FAIL ({n} violations)", file=sys.stderr)
    if args.write_tables:
        for name, df in frames.items():
            df.write.mode("overwrite").parquet(f"{args.output}/tables/{name}")
    passed = not per_check
    print(
        json.dumps(
            {
                "directory": args.path,
                "type": args.type,
                "frames": sorted(frames),
                "violations": sum(per_check.values()),
                "per_check": per_check,
                "passed": passed,
            }
        )
    )
    violations.unpersist()
    # no spark.stop(): spark-submit tears the session down at process exit,
    # and in-process callers (pytest) share the session (dedup_docs pattern)
    return 0 if passed else 1


if __name__ == "__main__":
    sys.exit(main())
