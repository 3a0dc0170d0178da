"""spark-submit entrypoint for the STREAMING near-dup dedup pipeline:
mark → verify → drop (streaming/neardup_pipeline.py).

Cluster usage (same launch contract as the other jobs)::

    zip -r dps.zip data_profiler_spark
    spark-submit --py-files dps.zip jobs/stream_neardup_docs.py \
        --input /lake/doc_stream --output /lake/neardup_out --threshold 0.5

``--input`` is a parquet directory used as a file-stream source
(doc_id string, text string, event_time timestamp); each invocation runs
ONE availableNow drain cycle (land → mark+verify) and prints a JSON
summary. State (band keys, stream offsets) lives in the output root's
checkpoints, so repeated invocations continue where the last stopped —
the batch-reconcile cadence the stream_neardup design note prescribes.

Outputs under --output (parquet):
  landing/   every doc that arrived (the raw corpus)
  markings/  banded candidate markings (per band, per batch)
  drops/     VERIFIED drop decisions (drop_id, kept_id, jaccard, batch_id)
  kept/      landing minus drops — rewritten each invocation
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet stream source dir")
    ap.add_argument("--output", required=True, help="output root")
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--watermark", default="1 hour")
    ap.add_argument("--shingle-k", type=int, default=3)
    ap.add_argument("--num-hashes", type=int, default=8)
    ap.add_argument("--rows-per-band", type=int, default=2)
    ap.add_argument("--cores", type=int, default=None, help="local[N] cores (sandbox)")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_profiler_spark.session import get_spark
    from data_profiler_spark.streaming import neardup_pipeline as P

    spark = get_spark("stream_neardup_docs", cores=args.cores)
    P.drain_once(
        spark,
        args.input,
        args.output,
        watermark=args.watermark,
        threshold=args.threshold,
        shingle_k=args.shingle_k,
        num_hashes=args.num_hashes,
        rows_per_band=args.rows_per_band,
    )
    kept = P.kept_docs(spark, args.output)
    kept.write.mode("overwrite").parquet(f"{args.output}/kept")
    landed = spark.read.parquet(f"{args.output}/landing").count()
    n_kept = spark.read.parquet(f"{args.output}/kept").count()
    # missing markings (no banded collision ever) legitimately means 0;
    # any other read failure (corrupt footer) must fail the job, not
    # silently report marked_pairs=0
    markings = P._read_if_exists(spark, f"{args.output}/markings")
    n_marks = (
        0
        if markings is None
        else markings.select(
            F.least("doc_id", "matched_doc_id"),
            F.greatest("doc_id", "matched_doc_id"),
        )
        .distinct()
        .count()
    )
    print(
        json.dumps(
            {
                "landed": landed,
                "kept": n_kept,
                "dropped": landed - n_kept,
                "marked_pairs": n_marks,
                "threshold": args.threshold,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
