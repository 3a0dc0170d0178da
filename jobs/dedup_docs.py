"""spark-submit entrypoint for the document dedup pipeline.

Cluster usage (same launch contract as validate_clips.py)::

    zip -r dps.zip data_profiler_spark
    spark-submit --py-files dps.zip jobs/dedup_docs.py \
        --input /lake/documents --output /lake/dedup_out --threshold 0.5

The job runs the full production dedup composition over a documents table
(doc_id, text):

  1. exact duplicates (md5 of normalized text) — free wins first;
  2. MinHash-LSH candidate pairs → exact Jaccard verification on the
     candidates only (``dedup.lsh_verified_near_dups``, candidate-bounded);
  3. transitive closure over exact ∪ verified-near pairs
     (``cluster.connected_components`` — alternating large-star/small-star);
  4. keep-list: one canonical doc per cluster (component min), plus a
     cluster report.

Outputs under --output (parquet):
  clusters/  (doc_id, cluster_id, cluster_size, is_canonical)
  keep/      (doc_id) — the post-dedup corpus membership
  report/    one row: docs, clusters, dups_dropped, exact_pairs, near_pairs

Scale shape: every stage is the bucketed/banded formulation the operator
modules document — no all-pairs joins; the CC loop's per-round cost is
two equi-join+agg shuffles over the pair frame, converging in O(log n)
rounds (strain-tested in BENCH/BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    ap.add_argument("--output", required=True, help="output root")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.5, help="Jaccard near-dup threshold")
    ap.add_argument("--num-hashes", type=int, default=8)
    ap.add_argument("--rows-per-band", type=int, default=2)
    ap.add_argument("--shingle-k", type=int, default=2)
    ap.add_argument("--cores", type=int, default=None, help="local[N] cores (sandbox)")
    args = ap.parse_args()

    from data_profiler_spark.operators import cluster, dedup
    from data_profiler_spark.session import get_spark

    spark = get_spark("dedup_docs", cores=args.cores)
    docs = spark.read.parquet(args.input).select(args.id_col, args.text_col)

    from pyspark.storagelevel import StorageLevel

    exact = dedup.exact_duplicates(docs, args.id_col, args.text_col)
    # both pair frames feed the CC loop AND the report counts — persist so
    # the LSH+Jaccard pipeline runs once, not once per consumer
    exact_pairs = (
        exact.filter(F.col("is_dup") == 1)
        .select(F.col("canonical_id").alias("id_a"), F.col("id").alias("id_b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    near_pairs = (
        dedup.lsh_verified_near_dups(
            docs,
            args.id_col,
            args.text_col,
            num_hashes=args.num_hashes,
            rows_per_band=args.rows_per_band,
            shingle_k=args.shingle_k,
            threshold=args.threshold,
        )
        .select("id_a", "id_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    clusters = cluster.duplicate_clusters(
        docs, exact_pairs.unionByName(near_pairs), id_col=args.id_col
    )
    clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")

    clusters_r = spark.read.parquet(f"{args.output}/clusters")
    keep = clusters_r.filter(F.col("is_canonical") == 1).select(
        F.col("id").alias(args.id_col)
    )
    keep.write.mode("overwrite").parquet(f"{args.output}/keep")

    agg = clusters_r.agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("cluster_id").alias("clusters"),
        F.sum(1 - F.col("is_canonical")).alias("dups_dropped"),
    ).first()
    report = {
        "docs": agg["docs"],
        "clusters": agg["clusters"],
        "dups_dropped": agg["dups_dropped"],
        "exact_pairs": exact_pairs.count(),
        "near_pairs": near_pairs.count(),
        "threshold": args.threshold,
    }
    from data_profiler_spark.functions.frames import local_frame

    local_frame(
        spark,
        [report],
        "docs long, clusters long, dups_dropped long, exact_pairs long, "
        "near_pairs long, threshold double",
    ).coalesce(1).write.mode("overwrite").json(f"{args.output}/report")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
