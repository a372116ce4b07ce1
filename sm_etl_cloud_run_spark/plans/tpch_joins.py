"""Join-shape coverage: EXISTS / NOT EXISTS (semi & anti joins), outer
joins, NOT IN, per-group scalar comparisons, and INTERSECT/EXCEPT.

The reference performs only broadcast-style lookups (SURVEY §2.5) plus
semi/anti existence checks inside its upsert (J5,
etl/datasus_ftp_metadados.py:307-350); a complete engine must also
express the classic decision-support join shapes, phrased here as
TPC-H Q4/Q13/Q16/Q17/Q21/Q22 analogs over the driver's tables.

Scale notes: every anti/semi join below keys on the fact's join column
(shuffle hash / SMJ picked by Catalyst + AQE); dimension-sized sides
(supplier, scalar aggregates) broadcast, so the 100 TB fact side never
shuffles for them. Money math in exact cents-longs (plans/registry.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_tables
from .registry import register
from .relational import _bp, _cents  # noqa: F401  (shared scaled-int helpers)

_Q4_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


@register("q4_priority_exists", oracle=_Q4_ORACLE,
          description="TPC-H Q4 shape: EXISTS correlated predicate as a LEFT SEMI join")
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    orders = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    late = orders.join(
        t["lineitem"],
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


_Q13_ORACLE = """
WITH c_orders AS (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
"""


@register("q13_custdist_outer", oracle=_Q13_ORACLE,
          description="TPC-H Q13 shape: LEFT OUTER join with join-time filter + two-level agg")
def q13_custdist_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c_orders = (
        t["customer"].join(
            t["orders"],
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        # COUNT(col) semantics: unmatched customers count 0, not 1
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q16_ORACLE = """
SELECT p_brand, p_type, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_size BETWEEN 20 AND 35
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
"""


@register("q16_supplier_anti", oracle=_Q16_ORACLE,
          description="TPC-H Q16 shape: NOT IN as broadcast LEFT ANTI join + COUNT DISTINCT")
def q16_supplier_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bad_suppliers = t["supplier"].where(F.col("s_acctbal") < 0).select("s_suppkey")
    li = t["lineitem"].join(
        F.broadcast(bad_suppliers),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_anti",
    )
    parts = t["part"].where(F.col("p_size").between(20, 35))
    return (
        li.join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# Integer-exact Q17 predicate: qty < 0.2 * avg(qty per part) rewritten as
# qty * 5 * cnt < sum — no float division inside the comparison.
_Q17_ORACLE = """
WITH pa AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 700.0
         AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa ON pk = l_partkey
WHERE p_brand = 'Brand#4'
  AND CAST(round(l_quantity) AS BIGINT) * 5 * cnt < sq
"""


@register("q17_small_qty_revenue", oracle=_Q17_ORACLE,
          description="TPC-H Q17 shape: per-group scalar threshold (avg per part) joined back")
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    qty = F.round(F.col("l_quantity"), 0).cast("long")
    per_part = (
        t["lineitem"]
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(qty).alias("sq"), F.count(F.lit(1)).alias("cnt"))
    )
    li = (
        t["lineitem"]
        .join(t["part"].where(F.col("p_brand") == "Brand#4"),
              F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("pk") == F.col("l_partkey"))
        .where(qty * 5 * F.col("cnt") < F.col("sq"))
    )
    return li.select(
        (F.sum(_cents("l_extendedprice")).cast("double") / 700.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n"),
    )


# Q21 shape. The oracle states the semantics with correlated
# EXISTS/NOT EXISTS; the Spark plan computes the same thing with ONE
# pass of per-(order, supplier) aggregation + a per-order rollup —
# no repeated correlated scans, which is the shape that scales.
_Q21_ORACLE = """
SELECT s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""


@register("q21_sole_late_supplier", oracle=_Q21_ORACLE,
          description="TPC-H Q21 shape: EXISTS + NOT EXISTS via per-order supplier rollup")
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # NB: EXISTS l2 / NOT EXISTS l3 range over ALL lineitems of the
    # order (unfiltered), so the per-order rollup must too; only the
    # o_orderstatus filter restricts which orders are considered.
    lo = (
        t["lineitem"]
        .join(t["orders"].where(F.col("o_orderstatus") == "F"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
                .cast("int")
            ).alias("is_late")
        )
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum("is_late").alias("n_late"),
    )
    waiters = (
        lo.join(per_order, F.col("ok") == F.col("l_orderkey"))
        .where((F.col("is_late") == 1) & (F.col("n_supps") >= 2) & (F.col("n_late") == 1))
    )
    return (
        waiters.join(F.broadcast(t["supplier"]), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(25)
    )


_Q22_ORACLE = """
WITH cust AS (
  SELECT c_custkey, c_mktsegment,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer
), pos AS (
  SELECT CAST(SUM(bal_cents) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS n
  FROM cust WHERE bal_cents > 0
)
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(bal_cents) AS DOUBLE) / 100.0 AS totacctbal
FROM cust, pos
WHERE bal_cents * n > s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c_custkey
                    AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00')
GROUP BY c_mktsegment
"""


@register("q22_dormant_customers", oracle=_Q22_ORACLE,
          description="TPC-H Q22 shape: global-scalar threshold + NOT EXISTS anti join")
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    cust = t["customer"].select(
        "c_custkey", "c_mktsegment", _cents("c_acctbal").alias("bal_cents")
    )
    # scalar aggregate broadcast to every row (integer cross-multiply,
    # no float division in the predicate)
    pos = cust.where(F.col("bal_cents") > 0).agg(
        F.sum("bal_cents").alias("s"), F.count(F.lit(1)).alias("n")
    )
    early_orders = t["orders"].where(
        F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")
    ).select("o_custkey")
    rich_dormant = (
        cust.crossJoin(F.broadcast(pos))
        .where(F.col("bal_cents") * F.col("n") > F.col("s"))
        .join(early_orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
    )
    return rich_dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        (F.sum("bal_cents").cast("double") / 100.0).alias("totacctbal"),
    )


_SETOPS_ORACLE = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
               AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'),
     y96 AS (SELECT DISTINCT o_custkey FROM orders
             WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
               AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
SELECT
  CAST((SELECT COUNT(*) FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)) AS BIGINT)
    AS both_years,
  CAST((SELECT COUNT(*) FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)) AS BIGINT)
    AS only_1995,
  CAST((SELECT COUNT(*) FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y95)) AS BIGINT)
    AS only_1996
"""


@register("set_intersect_except", oracle=_SETOPS_ORACLE,
          description="INTERSECT / EXCEPT set operators (distinct semantics) over year cohorts")
def set_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)

    def cohort(year: int) -> DataFrame:
        return (
            t["orders"]
            .where(
                (F.col("o_orderdate") >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y95, y96 = cohort(1995), cohort(1996)
    both = y95.intersect(y96).agg(F.count(F.lit(1)).alias("both_years"))
    only95 = y95.exceptAll(y96).agg(F.count(F.lit(1)).alias("only_1995"))
    only96 = y96.exceptAll(y95).agg(F.count(F.lit(1)).alias("only_1996"))
    return both.crossJoin(only95).crossJoin(only96)


# ---------------------------------------------------------------------------
# Bloom-filter semi-join prefilter (broadcast a bitset, not the keys)
# ---------------------------------------------------------------------------

# 4 Kbit keeps the test-scale fill factor high enough that false
# positives actually occur (and must match the oracle bit-for-bit);
# production sizes m to the key count (docstring).
_BLOOM_BITS = 1 << 12          # m = 4096 bits = 128 x 32-bit words
_BLOOM_HASHES = 3              # k = 3 md5-derived hash functions
_BLOOM_SEGMENT = "BUILDING"


def _bloom_pos(key: str, i: int) -> str:
    """Bit position i for a key expression — identical SQL on both
    engines: first 8 hex chars of md5(key || ':' || i) mod m."""
    return (
        f"CAST(('0x' || substr(md5(CAST({key} AS VARCHAR) || ':{i}'), 1, 8)) AS BIGINT)"
        f" % {_BLOOM_BITS}"
    )


def _bloom_pos_spark(key: str, i: int) -> str:
    """Spark-SQL twin of `_bloom_pos` (conv() instead of the '0x' cast)."""
    return (
        f"CAST(conv(substring(md5(CAST({key} AS STRING) || ':{i}'), 1, 8), 16, 10)"
        f" AS BIGINT) % {_BLOOM_BITS}"
    )


def _bloom_word(pos_sql: str) -> "F.Column":
    return F.expr(f"CAST(({pos_sql}) DIV 32 AS BIGINT)")


def _bloom_mask(pos_sql: str) -> "F.Column":
    return F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(({pos_sql}) % 32 AS INT))")


_BLOOM_ORACLE = f"""
WITH keys AS (
  SELECT DISTINCT c_custkey FROM customer
  WHERE c_mktsegment = '{_BLOOM_SEGMENT}' AND c_custkey IS NOT NULL
),
bits AS (
  {" UNION ALL ".join(
      f"SELECT ({_bloom_pos('c_custkey', i)}) // 32 AS word_idx,"
      f" (CAST(1 AS BIGINT) << (({_bloom_pos('c_custkey', i)}) % 32)) AS mask FROM keys"
      for i in range(_BLOOM_HASHES))}
),
bloom AS (
  SELECT word_idx, CAST(bit_or(mask) AS BIGINT) AS word FROM bits GROUP BY word_idx
),
probe AS (
  SELECT o_orderkey, o_custkey, o_orderpriority,
         {", ".join(
             f"({_bloom_pos('o_custkey', i)}) // 32 AS w{i},"
             f" (CAST(1 AS BIGINT) << (({_bloom_pos('o_custkey', i)}) % 32)) AS m{i}"
             for i in range(_BLOOM_HASHES))}
  FROM orders
),
tested AS (
  SELECT p.o_orderkey, p.o_custkey, p.o_orderpriority,
         CASE WHEN {" AND ".join(
             f"COALESCE(b{i}.word, 0) & p.m{i} <> 0" for i in range(_BLOOM_HASHES))}
              THEN 1 ELSE 0 END AS candidate
  FROM probe p
  {" ".join(f"LEFT JOIN bloom b{i} ON b{i}.word_idx = p.w{i}" for i in range(_BLOOM_HASHES))}
),
confirmed AS (
  SELECT t.o_orderkey, t.o_orderpriority, t.candidate,
         CASE WHEN t.candidate = 1 AND k.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS matched
  FROM tested t LEFT JOIN keys k ON t.candidate = 1 AND k.c_custkey = t.o_custkey
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(candidate) AS BIGINT) AS n_candidates,
       CAST(SUM(matched) AS BIGINT) AS n_matched,
       CAST(SUM(candidate) - SUM(matched) AS BIGINT) AS n_false_pos,
       CAST((10000 * (SUM(candidate) - SUM(matched)))
            // GREATEST(COUNT(*) - SUM(matched), 1) AS BIGINT) AS fp_rate_bp
FROM confirmed
GROUP BY o_orderpriority
"""


@register("join_bloom_prefilter", oracle=_BLOOM_ORACLE, bench=True,
          description="distributed Bloom-filter build + broadcast bitset "
                      "semi-join prefilter, with measured false-positive rate")
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join pruning via an explicitly-built Bloom filter: hash the
    filtered dimension's keys into a 4 Kbit bitset (k=3 md5-derived
    hashes, 32-bit words so every mask stays positive on both engines),
    OR the words together with one tiny distributed aggregate, then
    test every fact row against the broadcast bitset BEFORE the exact
    join. The query reports, per order priority, how many fact rows
    the bitset would admit (candidates), how many survive the exact
    join (matched), and the false-positive rate among true negatives —
    the number that decides whether the prefilter pays for itself.
    The bitset is applied as ONE 1-row map broadcast (element_at
    lookups, whitelisted scalar-broadcast NLJ) — not three word-keyed
    joins — so the fact side pays a single projection.

    Why this matters at 100 TB: broadcasting 10^8 dimension keys for a
    semi-join is impossible, and shuffling the fact side for a 2%
    selective dim filter wastes the whole exchange. The bitset size is
    a PARAMETER independent of dim cardinality — size m to the key
    count for the target fp rate (m/n = 10 bits/key with k = 3 gives
    ~1.7% fp; 10^8 keys -> ~125 MB, still broadcastable where the keys
    themselves are not). This test instance uses m = 4 Kbit (~0.5 KB)
    so false positives actually occur at test scale — fact rows that fail
    it never enter the exact join's shuffle. Spark's AQE runtime
    filters do this implicitly for some shapes; the explicit operator
    covers the rest (multi-stage reuse, sink-side pruning) and
    MEASURES its own selectivity. Plan: one dim scan -> word-sized
    bit_or aggregate -> 1-row bitset-map broadcast applied in a single
    fact projection + 1 broadcast exact semi-check, fact side never
    shuffles until the final |priorities|-sized aggregate.

    Correctness is exact (and oracle-checked) because the md5 hash
    family is engine-identical: both engines agree on every candidate
    bit, so even the false positives match.
    """
    t = load_tables(spark, sf_dir)
    # NULL keys are dropped on BOTH engines: a NULL can never
    # equi-match in the exact join, and on the Spark side a NULL hash
    # position would poison map_from_entries (null map key)
    # r12 (guide §2.4): the k hash functions used to be a k-way unionAll
    # of selects over `keys` — the customer scan + distinct aggregate ran
    # once PER HASH, plus a 4th time for the exact semi-check below.
    # One persisted distinct relation + an inline explode of the k
    # (word, mask) structs runs it once (the array stays inline in the
    # Generate — the step-9 InferFiltersFromGenerate trap).
    from ..cache import persist_tracked

    keys = persist_tracked(
        t["customer"]
        .where((F.col("c_mktsegment") == _BLOOM_SEGMENT) & F.col("c_custkey").isNotNull())
        .select("c_custkey").distinct()
    )
    _pairs = []
    for i in range(_BLOOM_HASHES):
        pos = _bloom_pos_spark("c_custkey", i)
        _pairs.append(F.struct(
            _bloom_word(pos).alias("word_idx"), _bloom_mask(pos).alias("mask")
        ))
    bits = keys.select(F.explode(F.array(*_pairs)).alias("__b")).select(
        "__b.word_idx", "__b.mask"
    )
    # the whole bitset rides ONE 1-row map broadcast (m/32 entries,
    # parameter-sized): element_at lookups replace three separate
    # broadcast-hash joins — measured 1.29 s -> ~0.6 s in bench
    # context, and it is how an engine actually applies a bloom
    bloom = bits.groupBy("word_idx").agg(F.expr("CAST(bit_or(mask) AS BIGINT)").alias("word"))
    bloom_map = bloom.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias("bm")
    )
    probe = t["orders"].select("o_orderkey", "o_custkey", "o_orderpriority")
    for i in range(_BLOOM_HASHES):
        pos = _bloom_pos_spark("o_custkey", i)
        probe = probe.withColumn(f"w{i}", _bloom_word(pos)).withColumn(
            f"m{i}", _bloom_mask(pos)
        )
    candidate = F.when(
        F.expr(" AND ".join(
            f"(COALESCE(element_at(bm, w{i}), 0) & m{i}) <> 0"
            for i in range(_BLOOM_HASHES)
        )),
        1,
    ).otherwise(0)
    tested = probe.crossJoin(F.broadcast(bloom_map)).select(
        "o_orderkey", "o_custkey", "o_orderpriority", candidate.alias("candidate")
    )
    k = F.broadcast(keys.withColumnRenamed("c_custkey", "k_custkey"))
    confirmed = tested.join(
        k, (tested["candidate"] == 1) & (k["k_custkey"] == tested["o_custkey"]), "left"
    ).select(
        "o_orderpriority", "candidate",
        F.when((F.col("candidate") == 1) & F.col("k_custkey").isNotNull(), 1)
        .otherwise(0).alias("matched"),
    )
    return confirmed.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("candidate").cast("long").alias("n_candidates"),
        F.sum("matched").cast("long").alias("n_matched"),
        (F.sum("candidate") - F.sum("matched")).cast("long").alias("n_false_pos"),
        F.expr(
            "CAST((10000 * (SUM(candidate) - SUM(matched)))"
            " DIV GREATEST(COUNT(*) - SUM(matched), 1) AS BIGINT)"
        ).alias("fp_rate_bp"),
    )


# ---------------------------------------------------------------------------
# join-size estimation from a key-universe sample (planner primitive)
# ---------------------------------------------------------------------------

_JSE_S = 16  # 1-in-S key-universe sample (deterministic md5 coin)

_JSE_ORACLE = f"""
WITH f AS (
  SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem GROUP BY 1
),
exact AS (
  SELECT CAST(SUM(c * c) AS BIGINT) AS exact_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM f
),
samp AS (
  SELECT CAST(SUM(c * c) AS BIGINT) AS samp_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys_sampled
  FROM f
  WHERE CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT)
        % {_JSE_S} = 0
),
j AS (SELECT * FROM exact CROSS JOIN samp)
SELECT n_keys, n_keys_sampled, exact_rows,
       CAST({_JSE_S} * coalesce(samp_rows, 0) AS BIGINT) AS est_rows,
       CAST(CAST({_JSE_S} * coalesce(samp_rows, 0) AS DOUBLE)
            / exact_rows AS DOUBLE) AS est_ratio
FROM j
"""


@register("join_size_estimate_sampled", oracle=_JSE_ORACLE,
          description="planner primitive: many-many self-join cardinality "
                      "estimated from a deterministic 1-in-16 key-universe "
                      "sample, exact twin alongside")
def join_size_estimate_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|lineitem ⋈ lineitem ON l_partkey| = Σ_k f(k)² — the quantity a
    cost-based planner needs BEFORE committing to a join strategy (and
    the blow-up the clone-collapse gate and skew salting react to).
    Universe sampling on the KEY (md5 coin: key sampled iff
    h(k) mod S = 0) is the unbiased estimator for multiplicity-weighted
    join sizes — Bernoulli ROW sampling would need f² corrections, but
    sampling whole keys keeps each key's full f(k)² contribution, so
    E[S·Σ_sampled f²] = Σ f² exactly. The md5 coin makes the "sample"
    deterministic, so est_rows hash-checks exactly on both engines;
    est_ratio lands ~1 ± the sampling error the planner would live with.

    Shape at 100 TB: one key-keyed map-side-combined aggregate over
    the fact (the same f relation serves both arms), a filter for the
    sampled arm, two 1-row aggregates cross-joined (parameter-sized,
    whitelisted pattern). The production path runs ONLY the sampled
    arm — its aggregate is 1/S the state; the exact arm is this
    query's QA twin. Reference parity: the reference has no planner
    (pandas executes what it's given); this primitive is part of the
    scale layer the Spark engine adds.
    """
    t = load_tables(spark, sf_dir)
    f = (
        t["lineitem"].groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    from ..cache import persist_tracked
    f = persist_tracked(f)  # one fact aggregate feeds both arms
    exact = f.agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("exact_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    samp = f.where(
        F.expr(
            f"CAST(conv(substring(md5(CAST(k AS STRING)), 1, 8), 16, 10) AS BIGINT)"
            f" % {_JSE_S} = 0"
        )
    ).agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("samp_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys_sampled"),
    )
    return exact.crossJoin(samp).select(
        "n_keys", "n_keys_sampled", "exact_rows",
        F.expr(f"CAST({_JSE_S} * coalesce(samp_rows, 0) AS BIGINT)")
        .alias("est_rows"),
        F.expr(
            f"CAST(CAST({_JSE_S} * coalesce(samp_rows, 0) AS DOUBLE)"
            f" / exact_rows AS DOUBLE)"
        ).alias("est_ratio"),
    )


# ---------------------------------------------------------------------------
# two-table join-size estimation: correlated key-universe sampling
# ---------------------------------------------------------------------------

_JSE2_S = 16  # same 1-in-S coin; MUST flip identically on both tables


_JSE2_ORACLE = f"""
WITH a AS (
  SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS ca
  FROM orders GROUP BY 1
),
b AS (
  SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cb
  FROM lineitem GROUP BY 1
),
f AS (
  SELECT a.k, a.ca, b.cb,
         CAST(('0x' || substr(md5(CAST(a.k AS VARCHAR)), 1, 8)) AS BIGINT)
           % {_JSE2_S} AS coin
  FROM a JOIN b ON b.k = a.k
),
exact AS (
  SELECT CAST(SUM(ca * cb) AS BIGINT) AS exact_rows,
         CAST(COUNT(*) AS BIGINT) AS n_join_keys
  FROM f
),
samp AS (
  SELECT CAST(SUM(ca * cb) AS BIGINT) AS samp_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys_sampled
  FROM f WHERE coin = 0
),
j AS (SELECT * FROM exact CROSS JOIN samp)
SELECT n_join_keys, n_keys_sampled, exact_rows,
       CAST({_JSE2_S} * coalesce(samp_rows, 0) AS BIGINT) AS est_rows,
       CAST(ABS({_JSE2_S} * coalesce(samp_rows, 0) - exact_rows) * 10000
            // exact_rows AS BIGINT) AS err_bp
FROM j
"""


@register("join_size_estimate_two_table", oracle=_JSE2_ORACLE,
          description="planner primitive: |orders JOIN lineitem| estimated "
                      "from a CORRELATED 1-in-16 key-universe sample of both "
                      "sides, exact twin + err_bp alongside")
def join_size_estimate_two_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-relation sibling of join_size_estimate_sampled and the
    actual broadcast-vs-shuffle decision input: |R ⋈ S| = Σ_k a(k)·b(k),
    estimated by sampling the KEY UNIVERSE with one md5 coin shared by
    both sides (Vengerov et al., VLDB 2015: correlated sampling — two
    INDEPENDENT samples would almost never retain the same keys, giving
    quadratically fewer surviving pairs and a uselessly noisy estimate;
    one shared coin keeps each sampled key's full a·b contribution, so
    E[S·Σ_sampled a·b] = Σ a·b exactly). The md5 coin is deterministic,
    so est_rows hash-checks on both engines; err_bp is the integer
    sampling-error audit a planner would act on.

    Shape at 100 TB: one key-keyed map-side-combined aggregate per
    side, an equi-join of the two (already 1-row-per-key) count
    relations, a coin filter, and two 1-row aggregates cross-joined
    (the whitelisted scalar pattern). The production path runs only
    the coin=0 arm — both aggregates shrink by S before the join.
    """
    t = load_tables(spark, sf_dir)
    a = t["orders"].groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("ca")
    )
    b = t["lineitem"].groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("cb")
    )
    f = a.join(b, "k").select(
        "k", "ca", "cb",
        F.expr(
            f"CAST(conv(substring(md5(CAST(k AS STRING)), 1, 8), 16, 10)"
            f" AS BIGINT) % {_JSE2_S}"
        ).alias("coin"),
    )
    from ..cache import persist_tracked
    f = persist_tracked(f)  # the joined count relation feeds both arms
    exact = f.agg(
        F.sum(F.col("ca") * F.col("cb")).cast("long").alias("exact_rows"),
        F.count(F.lit(1)).cast("long").alias("n_join_keys"),
    )
    samp = f.where(F.col("coin") == 0).agg(
        F.sum(F.col("ca") * F.col("cb")).cast("long").alias("samp_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys_sampled"),
    )
    return exact.crossJoin(samp).select(
        "n_join_keys", "n_keys_sampled", "exact_rows",
        F.expr(f"CAST({_JSE2_S} * coalesce(samp_rows, 0) AS BIGINT)")
        .alias("est_rows"),
        F.expr(
            f"CAST(ABS({_JSE2_S} * coalesce(samp_rows, 0) - exact_rows)"
            f" * 10000 DIV exact_rows AS BIGINT)"
        ).alias("err_bp"),
    )
