"""Connected-component clustering (operators/cluster.py) vs a pure-Python
union-find ground truth, plus the duplicate_clusters composition."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_profiler_spark.operators.cluster import connected_components, duplicate_clusters


def _union_find_labels(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _cc_spark(spark, pairs: list[tuple[int, int]], **kw) -> dict[int, int]:
    # small_graph_edges=0 pins the DISTRIBUTED large-star/small-star loop —
    # these tests exist to verify it (the driver union-find short-circuit
    # would otherwise absorb every toy graph and test nothing).
    kw.setdefault("small_graph_edges", 0)
    df = spark.createDataFrame(pairs, "id_a: long, id_b: long")
    out = connected_components(df, **kw).collect()
    return {r["id"]: r["cluster_id"] for r in out}


def test_cc_chain_star_and_islands(spark):
    # chain 1-2-3-4, star 10<-{11,12,13}, island pair (20,21), self-noise (30,30)
    pairs = [(2, 1), (2, 3), (4, 3), (10, 11), (12, 10), (13, 10), (21, 20), (30, 30)]
    got = _cc_spark(spark, pairs)
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }  # 30 never appears: self-loop only => no edges => not a pair node


def test_cc_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a: long, id_b: long")
    assert connected_components(df).count() == 0


def test_cc_single_giant_component(spark):
    # ring of 64 nodes: worst diameter-per-edge shape for propagation
    pairs = [(i, (i + 1) % 64) for i in range(64)]
    got = _cc_spark(spark, pairs)
    assert got == {i: 0 for i in range(64)}


# the spark fixture is session-scoped, which hypothesis permits inside
# @given (its health check only rejects function-scoped fixtures)
@settings(max_examples=6, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_cc_matches_union_find_property(spark, pairs):
    pairs = [p for p in pairs if p[0] != p[1]]
    if not pairs:
        return
    expected = _union_find_labels(pairs)
    got = _cc_spark(spark, pairs)
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=40,
    )
)
def test_cc_hybrid_paths_agree(spark, pairs):
    """The driver union-find short-circuit (default threshold) and the
    distributed star loop label identically — including string ids."""
    pairs = [p for p in pairs if p[0] != p[1]]
    if not pairs:
        return
    fast = _cc_spark(spark, pairs, small_graph_edges=200_000)
    slow = _cc_spark(spark, pairs, small_graph_edges=0)
    assert fast == slow


def test_cc_small_graph_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")], "id_a: string, id_b: string"
    )
    out = {r["id"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_duplicate_clusters_singleton_fill_and_sizes(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id: long")
    pairs = spark.createDataFrame([(1, 2), (2, 5), (6, 7)], "id_a: long, id_b: long")
    out = {
        r["id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in duplicate_clusters(docs, pairs).collect()
    }
    assert out == {
        0: (0, 1, 1),
        1: (1, 3, 1),
        2: (1, 3, 0),
        3: (3, 1, 1),
        4: (4, 1, 1),
        5: (1, 3, 0),
        6: (6, 2, 1),
        7: (6, 2, 0),
    }


def test_duplicate_clusters_survivor_rate(spark):
    # dedup contract: exactly one canonical per cluster
    docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id: long")
    pairs = spark.createDataFrame(
        [(i, i + 10) for i in range(0, 40)], "id_a: long, id_b: long"
    )
    out = duplicate_clusters(docs, pairs)
    per_cluster = out.groupBy("cluster_id").agg(
        F.sum("is_canonical").alias("canon"), F.count(F.lit(1)).alias("n")
    )
    assert per_cluster.filter(F.col("canon") != 1).count() == 0
    assert out.count() == 50


def test_embedding_dup_clusters_transitive_chain(spark):
    """A≈B≈C chain collapses to one cluster even though cos(A,C) is below
    threshold — the property pair-level near-dup output cannot express."""
    import math

    from data_profiler_spark.operators.similarity import embedding_dup_clusters

    def unit(theta):
        return [math.cos(theta), math.sin(theta)]

    # successive angle 6deg: cos ~= 0.9945 >= 0.99; A-C at 12deg: 0.978 < 0.99
    rows = [(0, unit(0.0)), (1, unit(0.105)), (2, unit(0.21)), (3, unit(2.0))]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    out = {r["id"]: r for r in embedding_dup_clusters(df, threshold=0.99).collect()}
    assert out[0]["cluster_id"] == out[1]["cluster_id"] == out[2]["cluster_id"] == 0
    assert out[0]["cluster_size"] == 3
    assert out[3]["cluster_id"] == 3 and out[3]["cluster_size"] == 1


def test_cc_reliable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches per-round materialization to reliable
    checkpoints (executor-loss-safe on a real cluster): same labels, and
    checkpoint data actually lands under the given dir."""
    import os

    cp = str(tmp_path / "cc_cp")
    pairs = [(2, 1), (2, 3), (10, 11)]
    df = spark.createDataFrame(pairs, "id_a: long, id_b: long")
    out = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df, checkpoint_dir=cp, small_graph_edges=0).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert any(files for _, _, files in os.walk(cp))  # rdd checkpoints written
