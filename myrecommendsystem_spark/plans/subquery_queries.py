"""Correlated-subquery / decorrelation shapes (TPC-H Q4/Q17/Q18/Q21/Q22
adaptations) plus CUBE grouping sets and statistical-moment aggregates.

The reference's query surface is imperative RDD pipelines; a user moving a
real warehouse workload onto this engine will immediately write correlated
subqueries.  These queries pin the decorrelated DataFrame plans Spark
should produce for each classic shape — EXISTS → semi join, NOT EXISTS →
anti join, correlated scalar aggregate → partial-agg + equi join back,
uncorrelated scalar → 1-row broadcast cross join (never a driver collect).
The DuckDB oracles keep the *subquery* spelling so both engines must agree
after their own decorrelation.

All registered with ``defer=True`` (registry tier 2): full DuckDB oracles,
replayed by tests/test_registry_oracle.py at the driver's scale, behind the
round-1-verified prefix.

Dates in the testdata are parquet TIMESTAMP; predicates use explicit
``INTERVAL`` arithmetic valid in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from myrecommendsystem_spark.functions.compat import round_stable, sql_round_stable
from myrecommendsystem_spark.io import readers
from myrecommendsystem_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return readers.load_table(spark, sf_dir, name)


@register(
    "q4_order_priority_exists",
    """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="TPC-H Q4 shape: correlated EXISTS with a non-equi conjunct → left "
    "semi HASH join (equi on orderkey, shipdate>orderdate as join residual) "
    "+ partial-agg count; the date filter reaches the orders parquet scan",
    defer=True,
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "leftsemi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q17_small_quantity_revenue",
    f"""
SELECT {sql_round_stable('SUM(l_extendedprice) / 7.0', 2)} AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#4'
  AND l.l_quantity < (
      SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = p.p_partkey
  )
""",
    doc="TPC-H Q17 shape: correlated scalar AVG per part.  Spark plan: "
    "per-part partial aggregate joined back on the key (map-side combine, "
    "then one shuffle on l_partkey) — NOT a window sort over the fact, and "
    "never a driver-side loop; the brand filter broadcasts the part dim",
    defer=True,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#4")
        .select("p_partkey")
    )
    per_part = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(round_stable(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice,
       SUM(l.l_quantity) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING SUM(l_quantity) > 300
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
""",
    doc="TPC-H Q18 shape: IN over a grouped-HAVING subquery → aggregate the "
    "fact once, filter, then semi-shaped equi join; quantities re-summed on "
    "the surviving orders only",
    defer=True,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 300)
        .select("l_orderkey")
    )
    return (
        orders.join(big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "leftsemi")
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    )


@register(
    "q21_late_exclusive_suppliers",
    """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
""",
    doc="TPC-H Q21 shape (receipt/commit dates absent in testdata → late = "
    "shipped >90 days after order): EXISTS and NOT EXISTS over the same "
    "fact → one semi + one anti hash join, both equi on orderkey with the "
    "supplier inequality as residual; no nested-loop anywhere in the plan",
    defer=True,
)
def q21_late_exclusive_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late_cut = F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")

    fact = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    l1 = fact.filter(F.col("l_shipdate") > late_cut).select(
        "l_orderkey", "l_suppkey", "o_orderdate"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = fact.filter(F.col("l_shipdate") > late_cut).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    sole_late = (
        l1.join(
            l2,
            (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "leftsemi",
        ).join(
            l3,
            (F.col("k3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")),
            "leftanti",
        )
    )
    return (
        sole_late.join(
            F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "q22_idle_rich_customers",
    f"""
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
       {sql_round_stable('SUM(c_acctbal)', 2)} AS totbal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate > (SELECT MAX(o_orderdate) - INTERVAL 30 DAY
                             FROM orders)
  )
GROUP BY c_nationkey
ORDER BY c_nationkey
""",
    doc="TPC-H Q22 shape: uncorrelated scalar subquery + NOT EXISTS.  "
    "'Idle' = no order in the final 30 days of the data horizon (the "
    "synthetic data gives every customer SOME order, so the spec's "
    "no-orders-ever predicate was vacuously empty — this keeps the "
    "NOT EXISTS + scalar-subquery shape while the check exercises "
    "real rows).  The global average and the horizon both ride 1-row "
    "broadcasts; the NOT EXISTS is a left anti hash join on custkey",
    defer=True,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderdate"
    )
    horizon = orders.agg(
        F.date_sub(F.max("o_orderdate"), 30).alias("idle_cut")
    )
    recent = (
        orders.crossJoin(F.broadcast(horizon))
        .filter(F.col("o_orderdate") > F.col("idle_cut"))
        .select("c_custkey")
    )
    cut = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("bal_cut")
    )
    return (
        customer.crossJoin(F.broadcast(cut))
        .filter(F.col("c_acctbal") > F.col("bal_cut"))
        .join(recent, "c_custkey", "leftanti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            round_stable(F.sum("c_acctbal"), 2).alias("totbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "cube_lineitem_status",
    f"""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       {sql_round_stable('SUM(l_extendedprice)', 2)} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
    doc="CUBE grouping sets (completes the rollup coverage): all four "
    "(flag, status) marginals in ONE Expand+HashAggregate pass over the "
    "fact — never four scans; same single-pass property as "
    "rollup_revenue_region_nation",
    defer=True,
)
def cube_lineitem_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            round_stable(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_lines",
        )
        .orderBy("returnflag", "linestatus")
    )


@register(
    "lineitem_moments",
    f"""
SELECT {sql_round_stable('STDDEV_SAMP(l_quantity)', 4)} AS qty_stddev,
       {sql_round_stable('VAR_SAMP(l_quantity)', 4)} AS qty_var,
       {sql_round_stable('CORR(l_quantity, l_extendedprice)', 4)} AS qty_price_corr,
       {sql_round_stable('COVAR_SAMP(l_quantity, l_extendedprice)', 4)} AS qty_price_covar,
       {sql_round_stable('COVAR_POP(l_quantity, l_extendedprice)', 4)} AS qty_price_covar_pop
FROM lineitem
""",
    doc="statistical-moment aggregates (stddev/var/corr/covar) — "
    "single-pass partial-aggregatable moments, textbook definitions in "
    "both engines; rounded to 4 places (summation order differs)",
    defer=True,
)
def lineitem_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        round_stable(F.stddev_samp("l_quantity"), 4).alias("qty_stddev"),
        round_stable(F.var_samp("l_quantity"), 4).alias("qty_var"),
        round_stable(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_corr"
        ),
        round_stable(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        round_stable(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar_pop"
        ),
    )
