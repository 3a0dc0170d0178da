"""spark-submit entrypoint for the document dedup pipeline.

Cluster usage (same launch contract as validate_clips.py)::

    zip -r dps.zip data_profiler_spark
    spark-submit --py-files dps.zip jobs/dedup_docs.py \
        --input /lake/documents --output /lake/dedup_out --threshold 0.5

The job runs the full production dedup composition over a documents table
(doc_id, text):

  1. exact duplicates (md5 of normalized text) — free wins first;
  2. MinHash-LSH candidate pairs over the exact-CANONICAL docs only →
     exact Jaccard verification on the candidates
     (``dedup.lsh_verified_near_dups``, candidate-bounded);
  3. transitive closure over exact ∪ verified-near pairs
     (``cluster.connected_components`` — alternating large-star/small-star);
  4. keep-list: one canonical doc per cluster (component min), plus a
     cluster report.

Candidate-growth guards (the round-4 strain measured LSH candidates ≈ R²
under R-fold input replication; BENCH/BASELINE.md):

  - Exact-dup rows are PRUNED from the LSH signature input by default: a
    group of R identical texts shares every band key, so signing all of
    them turns one logical near-pair into R² banded candidates — while the
    canonical alone recovers the identical cluster closure through the
    exact edges (identical text ⇒ identical shingles ⇒ identical bands and
    Jaccard). ``--keep-exact-in-lsh`` restores the unpruned strain-mode
    behavior.
  - ``--max-bucket-size`` caps per-band bucket fan-out (a bucket of n docs
    is n·(n-1)/2 candidate pairs); skipped buckets are counted and
    reported (lsh_skipped_buckets / lsh_skipped_rows), never silent.

Outputs under --output (parquet):
  clusters/  (doc_id, cluster_id, cluster_size, is_canonical)
  keep/      (doc_id) — the post-dedup corpus membership
  report/    one row: docs, clusters, dups_dropped, exact_pairs, near_pairs
             + the candidate/skip metrics above

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
    ap.add_argument(
        "--replicate",
        type=int,
        default=1,
        metavar="R",
        help="strain mode: union R deterministic copies of the input with "
        "remapped ids (copy i>0 gets doc_id || '~r' || i) — every doc "
        "becomes an exact-dup cluster of R and LSH bucket membership grows "
        "R-fold (candidate pairs ~R^2 per bucket, the super-linear phase "
        "to watch; see BENCH/BASELINE.md)",
    )
    ap.add_argument(
        "--keep-exact-in-lsh",
        action="store_true",
        help="strain mode: sign ALL docs (including exact duplicates) instead "
        "of canonicals only — reproduces the unmitigated ~R^2 candidate "
        "growth the round-4 strain measured",
    )
    ap.add_argument(
        "--max-bucket-size",
        type=int,
        default=5000,
        metavar="N",
        help="skip LSH band buckets with more than N members (quadratic "
        "fan-out guard); skipped buckets/rows are reported, 0 disables",
    )
    args = ap.parse_args()

    import time

    from data_profiler_spark.operators import cluster, dedup
    from data_profiler_spark.session import get_spark

    spark = get_spark("dedup_docs", cores=args.cores)
    docs = spark.read.parquet(args.input).select(args.id_col, args.text_col)
    if args.replicate > 1:
        # ids become strings under replication (numeric ids can't carry the
        # '~rN' copy suffix); component-min canonicals stay deterministic.
        docs = docs.select(
            F.col(args.id_col).cast("string").alias(args.id_col), args.text_col
        )
        base = docs
        for i in range(1, args.replicate):
            docs = docs.unionByName(
                base.select(
                    F.concat(F.col(args.id_col), F.lit(f"~r{i}")).alias(args.id_col),
                    args.text_col,
                )
            )

    from pyspark.storagelevel import StorageLevel

    phase_sec: dict[str, float] = {}
    t0 = time.monotonic()

    def mark(label: str) -> None:
        nonlocal t0
        now = time.monotonic()
        phase_sec[label] = round(now - t0, 2)
        t0 = now

    exact = dedup.exact_duplicates(docs, args.id_col, args.text_col)
    # pair/candidate frames feed the CC loop AND the report counts — persist
    # so each pipeline stage runs once, not once per consumer; counting the
    # persisted frame is also what times the phase.
    exact_pairs = (
        exact.filter(F.col("is_dup") == 1)
        .select(F.col("canonical_id").alias("id_a"), F.col("id").alias("id_b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_exact = exact_pairs.count()
    mark("exact")
    # Default: sign CANONICALS only. Exact duplicates share every band key
    # with their canonical (identical normalized text ⇒ identical min-hash
    # signature), so signing them adds R^2 banded candidates per R-copy
    # group while the closure over exact edges recovers the same clusters
    # from the canonical's near-pairs alone.
    if args.keep_exact_in_lsh:
        lsh_docs = docs
    else:
        canon_ids = exact.filter(F.col("is_dup") == 0).select(
            F.col("id").alias(args.id_col)
        )
        lsh_docs = docs.join(canon_ids, args.id_col, "left_semi")
    cap = args.max_bucket_size if args.max_bucket_size > 0 else None
    banded = dedup.minhash_bands(
        lsh_docs,
        args.id_col,
        args.text_col,
        num_hashes=args.num_hashes,
        rows_per_band=args.rows_per_band,
        shingle_k=args.shingle_k,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    skipped = {"buckets": 0, "rows": 0}
    sizes = None
    if cap is not None:
        # one aggregation over the banded frame (the job's largest
        # intermediate) feeds BOTH the skip metrics and the <=cap filter
        # inside candidates_from_bands
        sizes = dedup.band_bucket_sizes(banded).persist(StorageLevel.MEMORY_AND_DISK)
        over = (
            sizes.filter(F.col("bucket_n") > cap)
            .agg(
                F.count(F.lit(1)).alias("b"),
                F.coalesce(F.sum("bucket_n"), F.lit(0)).alias("r"),
            )
            .first()
        )
        skipped = {"buckets": int(over["b"]), "rows": int(over["r"])}
    candidates = dedup.candidates_from_bands(
        banded, max_bucket_size=cap, bucket_sizes=sizes
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_cand = candidates.count()
    banded.unpersist()
    if sizes is not None:
        sizes.unpersist()
    mark("lsh_candidates")
    near_pairs = (
        dedup.lsh_verified_near_dups(
            lsh_docs,
            args.id_col,
            args.text_col,
            shingle_k=args.shingle_k,
            threshold=args.threshold,
            candidates=candidates,
        )
        .select("id_a", "id_b")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_near = near_pairs.count()
    mark("jaccard_verify")

    clusters = cluster.duplicate_clusters(
        docs, exact_pairs.unionByName(near_pairs), id_col=args.id_col
    )
    clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    mark("closure_and_write")

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
    mark("keep_and_report")
    report = {
        "docs": agg["docs"],
        "clusters": agg["clusters"],
        "dups_dropped": agg["dups_dropped"],
        "exact_pairs": n_exact,
        "lsh_candidates": n_cand,
        "lsh_skipped_buckets": skipped["buckets"],
        "lsh_skipped_rows": skipped["rows"],
        "keep_exact_in_lsh": bool(args.keep_exact_in_lsh),
        "max_bucket_size": args.max_bucket_size,
        "near_pairs": n_near,
        "threshold": args.threshold,
        "replicate": args.replicate,
        "phase_sec": phase_sec,
    }
    from data_profiler_spark.functions.frames import local_frame

    local_frame(
        spark,
        [{k: v for k, v in report.items() if k != "phase_sec"}],
        "docs long, clusters long, dups_dropped long, exact_pairs long, "
        "lsh_candidates long, lsh_skipped_buckets long, lsh_skipped_rows long, "
        "keep_exact_in_lsh boolean, max_bucket_size int, "
        "near_pairs long, threshold double, replicate int",
    ).coalesce(1).write.mode("overwrite").json(f"{args.output}/report")
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
