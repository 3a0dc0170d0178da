"""Report-level pipelines — the reference's three T-SQL reports re-expressed
as single lazy DataFrame DAGs over the TPC-H-shaped testdata.

Reference reports (all under /root/reference/resources/sql/PROD/select/reports/):

- ``items_material_flow.sql`` — dimension table left-joined to THREE
  aggregated subqueries (per-SKU inbound / inventory / outbound), with
  activity-day scalars computed up front and folded into per-day rates
  (SURVEY.md J11 + A9 + F16). → :func:`part_material_flow`.
- ``inventory_stratification.sql`` — two-level aggregation (per-period
  per-SKU sum → per-SKU average) bucketed by a dual CASE (label + sort max)
  and re-aggregated per (Velocity, Range) (SURVEY.md A5 + A15 + O3).
  → :func:`part_stratification`.
- ``subwarehouse_material_flow_pallets.sql`` — the same 3-subquery join
  rolled up per subwarehouse with avg/max physical dims, TOP(10) by daily
  outbound (SURVEY.md J11 + O4). → :func:`nation_flow_top10`.

The reference re-runs each report once per UnitOfMeasure parameter
(output_tables_service.py:227-241); the Spark expression simply carries the
would-be parameter as a grouping column where relevant, so one pass serves
all parameter values (SURVEY.md §3.3).

Scalars like @DaysActive use EXACT distinct counts here so the DuckDB
oracle matches bit-for-bit; the production engine exposes the HLL variant
separately (corpus_relational.hll_distinct — A9's APPROX_COUNT_DISTINCT).

Scale notes: the dim side of every join is the small table (part: ~200k
rows at sf100 vs lineitem ~600M) → AQE broadcast; the two-level aggs are
map-side combinable; the day-count scalars are one tiny job each, reused
via crossJoin(broadcast(...)) instead of being re-computed per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_profiler_spark.sources.tpch import load_table

DEC = "decimal(18,4)"


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- items_material_flow → part-level flow report ---------------------------

def part_material_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part")

    # activity scalars (reference DECLARE block): exact distinct day counts
    days = li.agg(
        F.countDistinct("l_shipdate").alias("ship_days"),
        F.countDistinct(F.when(F.col("l_returnflag") == "R", F.col("l_shipdate"))).alias(
            "return_days"
        ),
        F.countDistinct(F.date_trunc("month", F.col("l_shipdate"))).alias("periods"),
    )

    # The reference's ib/ob subqueries read different tables; here both
    # channels live in lineitem, so they FUSE into one conditional-sum agg —
    # and (r5) the per-part totals re-aggregate the (month, part) frame
    # instead of scanning lineitem again: sum over months of the monthly
    # qty IS the total ship qty, so ship/ret/inv all come out of ONE
    # lineitem pass (each avoided scan is 600M+ rows at sf100; the
    # second-level agg runs over |months|x|parts| rows, not row data).
    monthly = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("period"), "l_partkey"
    ).agg(
        F.sum(F.col("l_quantity").cast(DEC)).alias("qty"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", F.col("l_quantity").cast(DEC))
        ).alias("ret_qty_m"),
    )
    per_part = monthly.groupBy("l_partkey").agg(
        F.sum("qty").alias("ship_qty"),
        F.sum("ret_qty_m").alias("ret_qty"),
        F.sum("qty").alias("inv_sum"),
        F.max("qty").cast("double").alias("max_monthly_qty"),
    )

    out = (
        part.join(per_part, part.p_partkey == per_part.l_partkey, "left")
        .drop("l_partkey")
        .crossJoin(F.broadcast(days))
    )
    return out.select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_brand").alias("brand"),
        F.col("ship_days").cast("long").alias("ship_days"),
        F.round(F.col("ship_qty").cast("double") / F.col("ship_days"), 2).alias(
            "ship_qty_per_day"
        ),
        F.col("ship_qty").cast("double").alias("total_ship_qty"),
        F.round(F.col("inv_sum").cast("double") / F.col("periods"), 2).alias(
            "avg_monthly_qty"
        ),
        F.col("max_monthly_qty"),
        F.col("return_days").cast("long").alias("return_days"),
        F.round(F.col("ret_qty").cast("double") / F.col("return_days"), 2).alias(
            "ret_qty_per_day"
        ),
        F.col("ret_qty").cast("double").alias("total_ret_qty"),
    )


PART_MATERIAL_FLOW_SQL = """
WITH days AS (
  SELECT COUNT(DISTINCT l_shipdate) AS ship_days,
         COUNT(DISTINCT CASE WHEN l_returnflag='R' THEN l_shipdate END) AS return_days,
         COUNT(DISTINCT date_trunc('month', l_shipdate)) AS periods
  FROM lineitem
), ship_ret AS (
  SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS ship_qty,
         SUM(CASE WHEN l_returnflag='R' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS ret_qty
  FROM lineitem GROUP BY l_partkey
), monthly AS (
  SELECT date_trunc('month', l_shipdate) AS period, l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
  FROM lineitem GROUP BY 1, 2
), inv AS (
  SELECT l_partkey, SUM(qty) AS inv_sum, CAST(MAX(qty) AS DOUBLE) AS max_monthly_qty
  FROM monthly GROUP BY l_partkey
)
SELECT p.p_partkey AS partkey, p.p_brand AS brand,
       CAST(d.ship_days AS BIGINT) AS ship_days,
       ROUND(CAST(s.ship_qty AS DOUBLE) / d.ship_days, 2) AS ship_qty_per_day,
       CAST(s.ship_qty AS DOUBLE) AS total_ship_qty,
       ROUND(CAST(i.inv_sum AS DOUBLE) / d.periods, 2) AS avg_monthly_qty,
       i.max_monthly_qty,
       CAST(d.return_days AS BIGINT) AS return_days,
       ROUND(CAST(s.ret_qty AS DOUBLE) / d.return_days, 2) AS ret_qty_per_day,
       CAST(s.ret_qty AS DOUBLE) AS total_ret_qty
FROM part p
LEFT JOIN ship_ret s ON p.p_partkey = s.l_partkey
LEFT JOIN inv i ON p.p_partkey = i.l_partkey
CROSS JOIN days d
"""


# --- inventory_stratification → part stratification -------------------------

_RANGE_EDGES = [(0, "0"), (1, "1"), (2, "2"), (5, "3-5"), (10, "6-10"),
                (20, "11-20"), (50, "21-50"), (100, "51-100")]


def _range_label(avg_col):
    expr = None
    for mx, label in _RANGE_EDGES:
        cond = (avg_col == mx) if mx <= 2 else (avg_col <= mx)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise("101+")


def _range_max(avg_col):
    expr = None
    for mx, _ in _RANGE_EDGES:
        cond = (avg_col == mx) if mx <= 2 else (avg_col <= mx)
        expr = F.when(cond, mx) if expr is None else expr.when(cond, mx)
    return expr.otherwise(101)


def part_stratification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    part = T(spark, sf_dir, "part").select("p_partkey", "p_brand")

    periods = li.agg(
        F.countDistinct(F.date_trunc("month", F.col("l_shipdate"))).alias("periods")
    )
    q = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            F.date_trunc("month", F.col("l_shipdate")).alias("period"),
            "p_partkey",
            "p_brand",
        )
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
    )
    avg_qty = F.avg(F.col("qty").cast("double"))
    tbl = (
        q.groupBy("p_partkey", "p_brand")
        .agg(
            F.sum("qty").alias("qty_sum"),
            _range_label(avg_qty).alias("qty_range"),
            _range_max(avg_qty).cast("int").alias("range_max"),
        )
        .crossJoin(F.broadcast(periods))
        .select(
            "p_partkey",
            "p_brand",
            F.round(F.col("qty_sum").cast("double") / F.col("periods"), 2).alias(
                "avg_qty"
            ),
            "qty_range",
            "range_max",
        )
    )
    return tbl.groupBy("p_brand", "qty_range").agg(
        F.max("range_max").alias("range_max"),
        F.count(F.lit(1)).alias("parts"),
        F.round(F.sum("avg_qty"), 0).alias("avg_total_qty"),
    )


PART_STRATIFICATION_SQL = """
WITH periods AS (
  SELECT COUNT(DISTINCT date_trunc('month', l_shipdate)) AS periods FROM lineitem
), q AS (
  SELECT date_trunc('month', l.l_shipdate) AS period, p.p_partkey, p.p_brand,
         SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2, 3
), tbl AS (
  SELECT q.p_partkey, q.p_brand,
    ROUND(CAST(SUM(q.qty) AS DOUBLE) / (SELECT periods FROM periods), 2) AS avg_qty,
    CASE WHEN AVG(CAST(q.qty AS DOUBLE)) = 0 THEN '0'
         WHEN AVG(CAST(q.qty AS DOUBLE)) = 1 THEN '1'
         WHEN AVG(CAST(q.qty AS DOUBLE)) = 2 THEN '2'
         WHEN AVG(CAST(q.qty AS DOUBLE)) <= 5 THEN '3-5'
         WHEN AVG(CAST(q.qty AS DOUBLE)) <= 10 THEN '6-10'
         WHEN AVG(CAST(q.qty AS DOUBLE)) <= 20 THEN '11-20'
         WHEN AVG(CAST(q.qty AS DOUBLE)) <= 50 THEN '21-50'
         WHEN AVG(CAST(q.qty AS DOUBLE)) <= 100 THEN '51-100'
         ELSE '101+' END AS qty_range,
    CASE WHEN AVG(CAST(q.qty AS DOUBLE)) = 0 THEN 0
         WHEN AVG(CAST(q.qty AS DOUBLE)) = 1 THEN 1
         WHEN AVG(CAST(q.qty AS DOUBLE)) = 2 THEN 2
         WHEN AVG(CAST(q.qty AS DOUBLE)) <= 5 THEN 5
         WHEN AVG(CAST(q.qty AS DOUBLE)) <= 10 THEN 10
         WHEN AVG(CAST(q.qty AS DOUBLE)) <= 20 THEN 20
         WHEN AVG(CAST(q.qty AS DOUBLE)) <= 50 THEN 50
         WHEN AVG(CAST(q.qty AS DOUBLE)) <= 100 THEN 100
         ELSE 101 END AS range_max
  FROM q GROUP BY q.p_partkey, q.p_brand
)
SELECT p_brand, qty_range, MAX(range_max) AS range_max,
       COUNT(*) AS parts, ROUND(SUM(avg_qty), 0) AS avg_total_qty
FROM tbl GROUP BY p_brand, qty_range
"""


# --- subwarehouse_material_flow_pallets → nation flow top-10 ----------------

def nation_flow_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = T(spark, sf_dir, "lineitem")
    sup = T(spark, sf_dir, "supplier")
    nat = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    part = T(spark, sf_dir, "part").select("p_partkey", "p_size", "p_retailprice")

    days = li.agg(F.countDistinct("l_shipdate").alias("ship_days"))

    by_sup_part = li.groupBy("l_suppkey", "l_partkey").agg(
        F.count(F.lit(1)).alias("lines"),
        F.sum(F.col("l_quantity").cast(DEC)).alias("qty"),
    )
    enriched = (
        by_sup_part.join(F.broadcast(part), by_sup_part.l_partkey == part.p_partkey)
        .join(F.broadcast(sup.select("s_suppkey", "s_nationkey")),
              by_sup_part.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
    )
    rolled = (
        enriched.groupBy("n_name")
        .agg(
            F.countDistinct("l_suppkey", "l_partkey").alias("sku_pairs"),
            F.sum("lines").alias("total_lines"),
            F.sum("qty").alias("total_qty"),
            F.round(F.avg(F.col("p_size").cast("double")), 2).alias("avg_size"),
            F.max("p_size").cast("long").alias("max_size"),
            F.round(F.avg(F.col("p_retailprice").cast("double")), 2).alias("avg_price"),
        )
        .crossJoin(F.broadcast(days))
    )
    return (
        rolled.select(
            F.col("n_name").alias("nation"),
            F.col("sku_pairs").cast("long").alias("sku_pairs"),
            F.col("ship_days").cast("long").alias("ship_days"),
            F.round(F.col("total_lines") / F.col("ship_days").cast("double"), 2).alias(
                "daily_lines"
            ),
            F.round(F.col("total_qty").cast("double") / F.col("ship_days"), 0).alias(
                "daily_qty"
            ),
            "avg_size",
            "max_size",
            "avg_price",
        )
        .orderBy(F.desc("daily_qty"), F.asc("nation"))
        .limit(10)
    )


NATION_FLOW_TOP10_SQL = """
WITH days AS (SELECT COUNT(DISTINCT l_shipdate) AS ship_days FROM lineitem),
bsp AS (
  SELECT l_suppkey, l_partkey, COUNT(*) AS lines,
         SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
  FROM lineitem GROUP BY 1, 2
), enr AS (
  SELECT b.*, p.p_size, p.p_retailprice, n.n_name
  FROM bsp b
  JOIN part p ON b.l_partkey = p.p_partkey
  JOIN supplier s ON b.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
)
SELECT n_name AS nation,
       CAST(COUNT(DISTINCT (l_suppkey, l_partkey)) AS BIGINT) AS sku_pairs,
       CAST((SELECT ship_days FROM days) AS BIGINT) AS ship_days,
       ROUND(SUM(lines) / CAST((SELECT ship_days FROM days) AS DOUBLE), 2) AS daily_lines,
       ROUND(CAST(SUM(qty) AS DOUBLE) / (SELECT ship_days FROM days), 0) AS daily_qty,
       ROUND(AVG(CAST(p_size AS DOUBLE)), 2) AS avg_size,
       CAST(MAX(p_size) AS BIGINT) AS max_size,
       ROUND(AVG(CAST(p_retailprice AS DOUBLE)), 2) AS avg_price
FROM enr GROUP BY n_name
ORDER BY daily_qty DESC, nation ASC LIMIT 10
"""


REPORT_QUERIES = {
    "part_material_flow": (part_material_flow, PART_MATERIAL_FLOW_SQL),
    "part_stratification": (part_stratification, PART_STRATIFICATION_SQL),
    "nation_flow_top10": (nation_flow_top10, NATION_FLOW_TOP10_SQL),
}
