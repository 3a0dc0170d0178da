"""Deterministic stratified sampling (operators/sampling.py)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from data_profiler_spark.operators.sampling import sample_uniform, stratified_sample


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )


def test_rates_and_default(spark):
    df = _docs(spark)
    out = stratified_sample(df, "lang", {"en": 0.5, "de": 0.1}, key_col="doc_id")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert "fr" not in counts  # default 0.0 drops unlisted strata
    # ~667 per stratum; keyed-coin binomial within a wide tolerance
    assert 250 <= counts["en"] <= 420
    assert 30 <= counts.get("de", 0) <= 110


def test_deterministic_and_nested(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in stratified_sample(df, "lang", {"en": 0.4}, "doc_id").collect()}
    b = {r["doc_id"] for r in stratified_sample(df, "lang", {"en": 0.4}, "doc_id").collect()}
    assert a == b  # rerun-stable (no rand(), no partition dependence)
    smaller = {
        r["doc_id"] for r in stratified_sample(df, "lang", {"en": 0.2}, "doc_id").collect()
    }
    assert smaller <= a  # nested: shrinking the fraction yields a subset
    shuffled = df.repartition(13, "lang")
    c = {r["doc_id"] for r in stratified_sample(shuffled, "lang", {"en": 0.4}, "doc_id").collect()}
    assert c == a  # partitioning-independent


def test_seed_changes_sample(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in stratified_sample(df, "lang", {"en": 0.4}, "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in stratified_sample(df, "lang", {"en": 0.4}, "doc_id", seed="other").collect()
    }
    assert a != b


def test_coin_matches_duckdb(spark):
    """The keyed coin is engine-portable: DuckDB replays the identical md5
    fold and picks the identical rows."""
    df = _docs(spark, 500)
    kept = sorted(
        r["doc_id"]
        for r in stratified_sample(df, "lang", {"en": 0.3, "de": 0.7}, "doc_id").collect()
    )
    con = duckdb.connect()
    oracle = [
        r[0]
        for r in con.execute(
            """
            WITH d AS (
              SELECT i AS doc_id,
                     CASE i % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de' ELSE 'fr' END AS lang
              FROM range(500) t(i)
            )
            SELECT doc_id FROM d
            WHERE ('0x' || substr(md5('sample|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                  / 1152921504606846976.0
                  < CASE lang WHEN 'en' THEN 0.3 WHEN 'de' THEN 0.7 ELSE 0.0 END
            ORDER BY doc_id
            """
        ).fetchall()
    ]
    assert kept == oracle


def test_stratified_take_exact_k_and_nested(spark):
    from data_profiler_spark.operators.sampling import stratified_take

    df = _docs(spark)  # ~667 per lang
    out = stratified_take(df, "lang", 50, "doc_id")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 50, "de": 50, "fr": 50}
    # small stratum: takes everything
    tiny = df.filter((F.col("lang") != "en") | (F.col("doc_id") < 30))
    t = stratified_take(tiny, "lang", 50, "doc_id")
    assert t.filter(F.col("lang") == "en").count() == 10  # ids 0,3,...,27
    # nested: the 20-take is a strict subset of the 50-take, per stratum
    k20 = {r["doc_id"] for r in stratified_take(df, "lang", 20, "doc_id").collect()}
    k50 = {r["doc_id"] for r in out.collect()}
    assert k20 < k50
    # deterministic across repartitionings
    again = {
        r["doc_id"]
        for r in stratified_take(df.repartition(17), "lang", 50, "doc_id").collect()
    }
    assert again == k50


def test_null_key_total_coin(spark):
    """NULL keys get a deterministic coin (empty-string hash), so Bernoulli
    and exact-k treat them identically instead of drop-vs-sort-first."""
    from data_profiler_spark.operators.sampling import stratified_take

    df = spark.createDataFrame(
        [(None, "en"), (1, "en"), (2, "en"), (3, "en")], "doc_id: long, lang: string"
    )
    full = stratified_sample(df, "lang", {"en": 1.0}, "doc_id")
    assert full.count() == 4  # fraction 1.0 keeps everything, null key included
    t = stratified_take(df, "lang", 4, "doc_id")
    assert t.count() == 4
