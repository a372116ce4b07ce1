"""Additional TPC-H-shaped analytics queries (Q6, Q14, Q18 shapes) and a
GROUPING SETS aggregate — widening the engine's verified OLAP surface.
All money math in exact cents-longs (see plans/registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_tables
from .registry import register
from .relational import _bp, _cents

_Q6_ORACLE = """
SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
             * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE, bench=True,
          description="TPC-H Q6 shape: pure scan-filter-agg (pushdown showcase)")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & _bp("l_discount").between(5, 7)
        & (F.col("l_quantity") < 24)
    )
    return li.select(
        (F.sum(_cents("l_extendedprice") * _bp("l_discount")).cast("double") / 10000.0).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


_Q14_ORACLE = """
SELECT round(
         100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                               THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                                    * (100 - CAST(round(l_discount * 100) AS BIGINT))
                               ELSE 0 END) AS DOUBLE)
         / CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE),
         6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
"""


@register("q14_promo_effect", oracle=_Q14_ORACLE,
          description="TPC-H Q14 shape: conditional aggregate ratio over a join")
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].where(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    joined = li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
    rev = _cents("l_extendedprice") * (100 - _bp("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast("double")
    total = F.sum(rev).cast("double")
    return joined.select(F.round(100.0 * promo / total, 6).alias("promo_revenue_pct"))


_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 250
)
SELECT c_name, o_orderkey, o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       total_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY totalprice_cents DESC, o_orderkey ASC
LIMIT 20
"""


@register("q18_large_orders", oracle=_Q18_ORACLE,
          description="TPC-H Q18 shape: agg-filter (HAVING) + join + top-k")
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    out = (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "o_orderkey", "o_orderdate",
            _cents("o_totalprice").alias("totalprice_cents"),
            "total_qty",
        )
    )
    return out.orderBy(F.col("totalprice_cents").desc(), F.col("o_orderkey").asc()).limit(20)


_GSETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
       CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@register("grouping_sets_marked", oracle=_GSETS_ORACLE,
          description="GROUPING SETS with GROUPING() markers (SQL API path)")
def grouping_sets_marked(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
               CAST(grouping(l_linestatus) AS BIGINT) AS g_status,
               SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------------------
# order fulfillment latency (order date → last shipment)
# ---------------------------------------------------------------------------

_FULFILL_ORACLE = """
WITH per_order AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         CAST(epoch_us(MAX(l.l_shipdate)) - epoch_us(o.o_orderdate) AS BIGINT)
           // 86400000000 AS days_to_fulfill
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
),
ranked AS (
  SELECT o_orderpriority, days_to_fulfill,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY days_to_fulfill, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM per_order
)
SELECT o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(MIN(days_to_fulfill) AS BIGINT) AS min_days,
       CAST(MAX(days_to_fulfill) AS BIGINT) AS max_days,
       CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN days_to_fulfill END) AS BIGINT) AS p50_days,
       CAST(MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN days_to_fulfill END) AS BIGINT) AS p90_days
FROM ranked GROUP BY o_orderpriority
"""


@register("order_fulfillment_latency", oracle=_FULFILL_ORACLE,
          description="order→last-shipment latency percentiles per priority (rank-exact)")
def order_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational SLA profile: days from order placement to the LAST
    line shipment, rank-exact p50/p90 per order priority. The fact-fact
    join shuffles once on the order key (the bucketed-layout candidate
    — test_scale_plans proves that layout removes this exchange), the
    per-order aggregate reuses that partitioning, and the priority rank
    window runs on the |orders| relation with the orderkey tiebreaker.
    Day arithmetic is exact integer epoch division on both engines.
    """
    t = load_tables(spark, sf_dir)
    per_order = (
        t["orders"]
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(
            ((F.unix_micros(F.max("l_shipdate")) - F.unix_micros(F.col("o_orderdate")))
             / F.lit(86400000000)).cast("long").alias("days_to_fulfill")
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("days_to_fulfill").asc(), F.col("o_orderkey").asc()
    )
    wn = Window.partitionBy("o_orderpriority")
    ranked = per_order.select(
        "o_orderpriority", "days_to_fulfill",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    return ranked.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n_orders"),
        F.min("days_to_fulfill").cast("long").alias("min_days"),
        F.max("days_to_fulfill").cast("long").alias("max_days"),
        F.min(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("days_to_fulfill")))
        .cast("long").alias("p50_days"),
        F.min(F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("days_to_fulfill")))
        .cast("long").alias("p90_days"),
    )


# ---------------------------------------------------------------------------
# cohort LTV triangle (first-order cohort x order-age month, exact cents)
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS ym
  FROM orders WHERE o_custkey IS NOT NULL
),
first AS (
  SELECT o_custkey, CAST(MIN(ym) AS BIGINT) AS cohort_ym FROM o GROUP BY o_custkey
)
SELECT
  CAST(cohort_ym // 12 AS BIGINT) AS cohort_year,
  CAST(cohort_ym % 12 + 1 AS BIGINT) AS cohort_month,
  CAST(o.ym - f.cohort_ym AS BIGINT) AS age_months,
  CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(o.cents) AS BIGINT) AS revenue_cents
FROM o JOIN first f USING (o_custkey)
GROUP BY cohort_ym, o.ym - f.cohort_ym
"""


@register("orders_cohort_ltv", oracle=_LTV_ORACLE,
          description="cohort LTV triangle: first-order cohort month x order "
                      "age in months, customers/orders/revenue in exact cents")
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value triangle — the revenue twin of
    events_cohort_retention (which counts active users on the events
    stream): orders roll up by the customer's FIRST-order month
    (cohort) and the order's age in months since that first order,
    with revenue in exact cents-longs so partition order can never
    perturb the sums. Month arithmetic is pure integers
    (year*12 + month), immune to calendar/interval edge cases.
    NULL o_custkey rows are dropped on both engines — an order without
    a customer belongs to no cohort.

    Shape at 100 TB: one customer-keyed aggregate for the first-order
    month (map-side combined), one customer-keyed join back (both
    sides hash-partitioned on o_custkey — AQE may broadcast the
    |customers|-sized first table when it fits), one
    |cohorts x ages|-sized aggregate (~thousands of cells regardless
    of fact size). Two shuffles total, both on the natural key.
    """
    t = load_tables(spark, sf_dir)
    ym = (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).cast("long")
    o = (
        t["orders"]
        .where(F.col("o_custkey").isNotNull())
        .select(
            "o_custkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
            ym.alias("ym"),
        )
    )
    first = o.groupBy("o_custkey").agg(F.min("ym").cast("long").alias("cohort_ym"))
    return (
        o.join(first, "o_custkey")
        .groupBy(
            F.col("cohort_ym"),
            (F.col("ym") - F.col("cohort_ym")).cast("long").alias("age_months"),
        )
        .agg(
            F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .select(
            F.expr("CAST(cohort_ym DIV 12 AS BIGINT)").alias("cohort_year"),
            F.expr("CAST(cohort_ym % 12 + 1 AS BIGINT)").alias("cohort_month"),
            "age_months", "n_customers", "n_orders", "revenue_cents",
        )
    )


# ---------------------------------------------------------------------------
# repeat-purchase interval profile (reorder-cycle histogram)
# ---------------------------------------------------------------------------

_REPEAT_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate, o_orderkey FROM orders
),
g AS (
  SELECT o_custkey,
         date_diff('day',
                   lag(o_orderdate) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey),
                   o_orderdate) AS gap_days
  FROM o
),
b AS (
  SELECT gap_days // 30 AS gap_bucket_30d,
         CAST(COUNT(*) AS BIGINT) AS n_intervals
  FROM g WHERE gap_days IS NOT NULL
  GROUP BY gap_days // 30
)
SELECT CAST(gap_bucket_30d AS BIGINT) AS gap_bucket_30d, n_intervals,
       CAST(10000 * n_intervals // SUM(n_intervals) OVER () AS BIGINT) AS share_bp
FROM b
"""


@register("orders_repeat_purchase", oracle=_REPEAT_ORACLE,
          description="repeat-purchase cycle: histogram of consecutive-order "
                      "gaps per customer in 30-day buckets (exact bp)")
def orders_repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reorder-cycle profile behind replenishment forecasting and
    churn-window choice (the events_churn_hazard censor horizon is
    usually read off exactly this table): for every customer with ≥2
    orders, the gap in days between consecutive orders, aggregated
    into 30-day buckets with an exact bp share. The lag ordering pins
    ties by (o_orderdate, o_orderkey), so same-day double orders land
    deterministically in bucket 0 on both engines.

    Shape at 100 TB: one customer-keyed shuffle for the lag window —
    per-customer order counts are pigeonhole-bounded (the sessionize
    contract in operators/windows.py), so the plain partitionBy window
    is the right form — then a buckets-sized aggregate and a
    parameter-sized share window. Dates subtract as exact integer days
    (datediff / date_diff).
    """
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    g = t["orders"].select(
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days")
    )
    b = (
        g.where(F.col("gap_days").isNotNull())
        .groupBy(F.expr("gap_days DIV 30").alias("gap_bucket_30d"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_intervals"))
    )
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return b.select(
        F.col("gap_bucket_30d").cast("long").alias("gap_bucket_30d"),
        "n_intervals",
        F.expr("CAST(10000 AS BIGINT)").alias("__sc"),
        F.sum("n_intervals").over(w_all).alias("__total"),
    ).select(
        "gap_bucket_30d", "n_intervals",
        F.expr("CAST(__sc * n_intervals DIV __total AS BIGINT)").alias("share_bp"),
    )


# ---------------------------------------------------------------------------
# revenue concentration: the Pareto ladder over per-customer spend
# ---------------------------------------------------------------------------

_PARETO_PCTS = (1, 5, 10, 20, 50)


def _pareto_oracle() -> str:
    arms = " UNION ALL ".join(
        f"SELECT CAST({p} AS BIGINT) AS top_pct" for p in _PARETO_PCTS
    )
    return f"""
WITH rev AS (
  SELECT o_custkey AS c,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders WHERE o_custkey IS NOT NULL GROUP BY o_custkey
),
rk AS (
  SELECT c, cents,
         CAST(ROW_NUMBER() OVER (ORDER BY cents DESC, c ASC) AS BIGINT) AS rn,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(cents) OVER () AS BIGINT) AS total_cents
  FROM rev
),
pcts AS ({arms})
SELECT p.top_pct,
       CAST((p.top_pct * MIN(rk.n)) // 100 AS BIGINT) AS n_top,
       CAST(SUM(CASE WHEN rk.rn <= (p.top_pct * rk.n) // 100
                     THEN rk.cents ELSE 0 END) AS BIGINT) AS top_cents,
       CAST(10000 * SUM(CASE WHEN rk.rn <= (p.top_pct * rk.n) // 100
                             THEN rk.cents ELSE 0 END)
            // MIN(rk.total_cents) AS BIGINT) AS revenue_share_bp
FROM rk CROSS JOIN pcts p
GROUP BY p.top_pct
"""


@register("orders_pareto_revenue_curve", oracle=_pareto_oracle(), bench=True,
          description="revenue concentration ladder: exact share of total "
                      "spend held by the top 1/5/10/20/50% of customers")
def orders_pareto_revenue_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 80/20 audit as one table: rank customers by exact cents
    spend and read off the revenue share of each top-p% prefix — the
    concentration number behind key-account risk, whale-dependence
    alerts, and (in the curation analogy) how much of a corpus a few
    sources dominate. Complements events_key_skew_profile's Gini with
    the actionable prefix form (Gini says "skewed"; this says "the top
    1% is 31% of revenue").

    Shape at 100 TB: one customer-keyed map-side-combined aggregate,
    one :func:`~..operators.windows.distributed_rank` pass (no
    single-task sort; n and total ride along on ladder-sized
    windows over the ranked relation — computed as conditional sums,
    the corpus_vocab_coverage pattern), ladder-sized output. The
    prefix cut uses rank ≤ (p·n) DIV 100 exactly on both engines.
    """
    from ..operators.windows import distributed_rank
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    rev = t["orders"].where(F.col("o_custkey").isNotNull()).groupBy(
        F.col("o_custkey").alias("c")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long").alias("cents")
    )
    rk = distributed_rank(
        rev, [F.col("cents").desc(), F.col("c").asc()],
        rank_name="rn", total_name="n",
    )
    aggs = [
        F.min("n").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
    ]
    for p in _PARETO_PCTS:
        aggs.append(
            F.sum(
                F.when(F.col("rn") <= F.expr(f"({p} * n) DIV 100"),
                       F.col("cents")).otherwise(0)
            ).cast("long").alias(f"__tc_{p}")
        )
    one = rk.agg(*aggs)
    ladder = F.array(*[
        F.struct(
            F.lit(p).cast("long").alias("top_pct"),
            F.col(f"__tc_{p}").alias("top_cents"),
        )
        for p in _PARETO_PCTS
    ])
    return one.select(
        "n_customers", "total_cents", F.explode(ladder).alias("x")
    ).select(
        F.col("x.top_pct").alias("top_pct"),
        F.expr("CAST(x.top_pct * n_customers DIV 100 AS BIGINT)")
        .alias("n_top"),
        F.col("x.top_cents").alias("top_cents"),
        F.expr("CAST(10000 * x.top_cents DIV total_cents AS BIGINT)")
        .alias("revenue_share_bp"),
    )
