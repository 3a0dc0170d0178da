"""Transitive-closure duplicate clustering: connected components over
near-dup candidate pairs, and the dedup composition built on it.

The pair-level operators in ``operators/dedup.py`` stop at verified pairs
(id_a, id_b). Production dedup needs the *closure*: if A~B and B~C, all
three are one duplicate cluster and a single canonical survives, even when
A and C never collided in any LSH band. (Reference seed: the reference
only ever dedups by exact group-by-first, helpers/data_directory.py:419-440
— closure over a similarity graph has no analog there and is part of the
training-data-pipeline mandate.)

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii — "Connected Components in MapReduce and Beyond",
ACM SoCC 2014). Each round is two rounds of pure equi-join + min-aggregate
over the edge frame:

- large-star: every node connects its strictly-larger neighbors to the
  minimum of its closed neighborhood;
- small-star: every node connects its not-larger neighbors (and itself) to
  that minimum.

The edge set monotonically contracts toward a star forest centered at each
component's minimum id; the paper proves O(log^2 n) rounds (O(log n) in
practice). At a fixpoint every edge IS (member, component_min).

Scale design:
- No all-pairs products anywhere: each half-round is groupBy(min) + one
  equi-join on the node id, both map-side combinable / AQE skew-splittable.
  High-degree hub nodes (a 10^9-copy boilerplate cluster) are exactly the
  AQE skew-join case, and large-star handles them by construction — a hub's
  neighbors re-attach to the minimum, splitting the star across rounds.
- The driver loop materializes each round via ``localCheckpoint(eager)``:
  lineage is truncated so the plan does not grow by two joins per round
  (Catalyst analysis time would otherwise go quadratic), and each round
  reads the previous round's materialized partitions, not the raw pairs.
  On a real cluster with executor churn, set a reliable checkpoint dir and
  swap localCheckpoint for checkpoint — the seam is one line.
- Convergence is detected by a two-long fingerprint (count, bit_xor of
  xxhash64(u, v)) — one tiny aggregate job per round, no driver-side edge
  collection ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Convergence needs ~log2(max component diameter) rounds plus one detection
# round (measured: a 10k-node chain converges in 14, detected at 15 —
# BENCH/BASELINE.md). 64 covers a 2^60-node pathological chain, far beyond
# any physical graph, while still bounding a runaway loop.
_MAX_ROUNDS_DEFAULT = 64


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) -> edges (v, m) for v in Γ(u), v > u, m = min(Γ(u) ∪ {u})."""
    bi = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = bi.groupBy("u").agg(F.min("v").alias("__mn"))
    mins = mins.select("u", F.least("u", "__mn").alias("m"))
    return (
        bi.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges larger->smaller; for each u with smaller neighbors N,
    m = min(N), emit (v, m) for v in (N ∪ {u}) \\ {m}."""
    o = edges.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("m"))
    neigh = o.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    selfe = mins.select("u", F.col("m").alias("v"))
    return neigh.union(selfe).filter(F.col("u") != F.col("v")).distinct()


def _fingerprint(edges: DataFrame) -> tuple:
    # Two INDEPENDENT xor-hashes (second one salted) + the count, all in one
    # tiny agg job: declaring convergence on a single xor stream would let an
    # (astronomically unlikely, but silent) xor collision between distinct
    # same-size edge sets stop the loop early with wrong labels. A collision
    # now requires both 64-bit streams to collide simultaneously.
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(u, v))").alias("x"),
        F.expr("bit_xor(xxhash64(u, v, 1))").alias("x2"),
    ).first()
    return (row["n"], row["x"], row["x2"])


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Closure of a METADATA-SCALE edge set, driver-side.

    Collects the (already distinct, self-loop-free) edges, runs union-find
    with path compression and union-by-min (labels = component min — the
    exact contract of the distributed loop), and returns the (id,
    cluster_id) frame through the Arrow local_frame path. Bounded by
    ``small_graph_edges`` at the call site; never reached for graphs above
    the threshold."""
    from pyspark.sql.types import StructField, StructType

    from data_profiler_spark.functions.frames import local_frame

    id_type = edges.schema["u"].dataType
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in edges.collect():
        ra, rb = find(r["u"]), find(r["v"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(n, find(n)) for n in parent]
    schema = StructType(
        [StructField("id", id_type, True), StructField("cluster_id", id_type, True)]
    )
    return local_frame(edges.sparkSession, rows, schema)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = _MAX_ROUNDS_DEFAULT,
    checkpoint_dir: str | None = None,
    small_graph_edges: int = 200_000,
) -> DataFrame:
    """(id, cluster_id) for every node appearing in ``pairs``; cluster_id is
    the minimum node id of the connected component (deterministic).

    Nodes not present in any pair do not appear — callers join back to the
    full universe for singleton fill (``duplicate_clusters`` does).

    ``checkpoint_dir``: with a path (HDFS/S3 on a real cluster), per-round
    materialization uses RELIABLE checkpoints — an executor loss mid-loop
    recomputes nothing and corrupts nothing. Default (None) uses
    localCheckpoint: cheaper, right for local mode and short loops, but an
    executor loss loses the truncated lineage with it.

    ``small_graph_edges``: hybrid cutoff. A distinct edge set at or below
    this size resolves driver-side via union-find (one bounded collect, same
    component-min labels) instead of paying ~log(diameter) distributed
    rounds of fixed job latency. Near-dup graphs are tiny relative to their
    corpus (verified pairs ≈ O(dup rate × docs)); when they are NOT — 10^10
    edges from a 10^12-doc crawl — the count check routes to the log-round
    loop, whose per-round cost is shuffle-bound on |E|, which is the path
    that matters at scale. 0 disables the short-circuit (strain tests pin
    the distributed loop this way).

    NOTE the hybrid is an execution-mode change, not just an optimization:
    below the cutoff there is no per-round checkpointing even when
    ``checkpoint_dir`` is set (the driver pass has nothing to checkpoint —
    it is one bounded collect + an Arrow write-back). Callers that passed
    ``checkpoint_dir`` expecting distributed fault-tolerant rounds get a
    warning on stderr when the short-circuit fires; pass
    ``small_graph_edges=0`` to force the distributed loop.
    """
    spark = pairs.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _materialize(df: DataFrame) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    edges = _materialize(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    prev_fp = _fingerprint(edges)
    if small_graph_edges and prev_fp[0] <= small_graph_edges:
        if checkpoint_dir is not None:
            import sys as _sys

            print(
                f"connected_components: {prev_fp[0]} distinct edges <= "
                f"small_graph_edges={small_graph_edges}; resolving driver-side "
                "(union-find) — checkpoint_dir is unused on this path. Pass "
                "small_graph_edges=0 to force the checkpointed distributed loop.",
                file=_sys.stderr,
            )
        return _driver_union_find(edges)
    for _ in range(max_rounds):
        edges = _materialize(_small_star(_large_star(edges)))
        fp = _fingerprint(edges)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(O(log^2 n) expected — raise max_rounds for adversarial graphs)"
        )
    # fixpoint => star forest: every edge is (member, component_min)
    members = edges.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    roots = edges.select(F.col("v").alias("id"), F.col("v").alias("cluster_id")).distinct()
    return members.union(roots).distinct()


def duplicate_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Full-corpus duplicate clustering: closure over candidate ``pairs``
    plus singleton fill from ``docs``.

    Output (id, cluster_id, cluster_size, is_canonical): every doc labeled
    with its component's min id (its own id if it paired with nothing),
    component size, and the keep/drop flag production dedup filters on.

    The size/canonical tail is agg + equi-join on cluster_id (map-side
    combinable; the giant near-dup cluster a web crawl always has is the
    AQE skew case, never a window's single task).
    """
    cc = connected_components(pairs, src=src, dst=dst)
    ids = docs.select(F.col(id_col).alias("id"))
    labeled = (
        ids.join(cc, "id", "left")
        .select("id", F.coalesce("cluster_id", "id").alias("cluster_id"))
    )
    sizes = labeled.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labeled.join(sizes, "cluster_id")
        .select(
            "id",
            "cluster_id",
            "cluster_size",
            (F.col("id") == F.col("cluster_id")).cast("int").alias("is_canonical"),
        )
    )
