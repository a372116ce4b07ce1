"""Declarative data-quality suite over the fact table.

The reference hardcodes its validators (A4 null-count checks,
`validar_dataframe`-style assertions — see SURVEY §2); this module
runs the generalized form: a declarative expectation suite compiled to
ONE aggregate pass (operators/expectations.py), reported long-format
so runs can be diffed and alerted on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.expectations import Expectation, run_expectations
from ..tables import load_tables
from .registry import register

_SUITE = [
    Expectation("orderkey_not_null", "not_null", column="l_orderkey"),
    Expectation("pk_unique", "unique", columns=("l_orderkey", "l_linenumber")),
    Expectation("quantity_in_1_50", "in_range", column="l_quantity", lo=1, hi=50),
    Expectation("returnflag_domain", "accepted_values", column="l_returnflag",
                values=("A", "N", "R")),
    Expectation("discount_complete_99pct", "completeness_bp", column="l_discount",
                threshold=9900),
    Expectation("linestatus_uppercase", "regex_violations", column="l_linestatus",
                pattern="^[A-Z]$"),
]

_DQ_ORACLE = """
WITH a AS (
  SELECT COUNT(*) - COUNT(l_orderkey) AS nn,
         COUNT(*) - COUNT(DISTINCT concat_ws('|',
             COALESCE(CAST(l_orderkey AS VARCHAR), '∅'),
             COALESCE(CAST(l_linenumber AS VARCHAR), '∅'))) AS dup,
         COUNT(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS rng,
         COUNT(CASE WHEN l_returnflag IS NOT NULL
                     AND l_returnflag NOT IN ('A', 'N', 'R') THEN 1 END) AS accv,
         (10000 * COUNT(l_discount)) // COUNT(*) AS comp,
         COUNT(CASE WHEN l_linestatus IS NOT NULL
                     AND NOT regexp_matches(l_linestatus, '^[A-Z]$') THEN 1 END) AS rex
  FROM lineitem
)
SELECT 'orderkey_not_null' AS check_id, 'not_null' AS kind,
       'l_orderkey' AS col_name, CAST(nn AS BIGINT) AS observed,
       CAST(0 AS BIGINT) AS threshold, CAST(nn <= 0 AS BIGINT) AS passed FROM a
UNION ALL
SELECT 'pk_unique', 'unique', 'l_orderkey|l_linenumber', CAST(dup AS BIGINT),
       CAST(0 AS BIGINT), CAST(dup <= 0 AS BIGINT) FROM a
UNION ALL
SELECT 'quantity_in_1_50', 'in_range', 'l_quantity', CAST(rng AS BIGINT),
       CAST(0 AS BIGINT), CAST(rng <= 0 AS BIGINT) FROM a
UNION ALL
SELECT 'returnflag_domain', 'accepted_values', 'l_returnflag',
       CAST(accv AS BIGINT), CAST(0 AS BIGINT), CAST(accv <= 0 AS BIGINT) FROM a
UNION ALL
SELECT 'discount_complete_99pct', 'completeness_bp', 'l_discount',
       CAST(comp AS BIGINT), CAST(9900 AS BIGINT),
       CAST(comp >= 9900 AS BIGINT) FROM a
UNION ALL
SELECT 'linestatus_uppercase', 'regex_violations', 'l_linestatus',
       CAST(rex AS BIGINT), CAST(0 AS BIGINT), CAST(rex <= 0 AS BIGINT) FROM a
"""


@register("dq_expectations_report", oracle=_DQ_ORACLE,
          description="declarative data-quality suite (not-null / unique / "
                      "range / domain / completeness / regex) in ONE aggregate "
                      "pass, long-format report")
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-expectation quality gate over lineitem, compiled to a single
    hash-aggregate scan (never one job per check — see
    operators/expectations.py for the 100 TB argument). Observations
    are exact integers (violation counts / completeness basis points),
    so the report is bit-stable across engines and runs."""
    t = load_tables(spark, sf_dir)
    return run_expectations(t["lineitem"], _SUITE)


_PROFILE_ORACLE = """
WITH a AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nr,
         CAST(COUNT(l_orderkey) AS BIGINT) AS c1,
         CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS d1,
         CAST(MIN(l_orderkey) AS BIGINT) AS mn1, CAST(MAX(l_orderkey) AS BIGINT) AS mx1,
         CAST(COUNT(l_quantity) AS BIGINT) AS c2,
         CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS d2,
         CAST(MIN(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS mn2,
         CAST(MAX(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS mx2,
         CAST(COUNT(l_extendedprice) AS BIGINT) AS c3,
         CAST(COUNT(DISTINCT l_extendedprice) AS BIGINT) AS d3,
         CAST(MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS mn3,
         CAST(MAX(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS mx3,
         CAST(COUNT(l_returnflag) AS BIGINT) AS c4,
         CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS d4,
         CAST(COUNT(l_shipdate) AS BIGINT) AS c5,
         CAST(COUNT(DISTINCT l_shipdate) AS BIGINT) AS d5,
         CAST(MIN(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))) AS BIGINT) AS mn5,
         CAST(MAX(date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))) AS BIGINT) AS mx5
  FROM lineitem
)
SELECT 'l_orderkey' AS col_name, nr AS n_rows, nr - c1 AS n_null, d1 AS n_distinct,
       mn1 AS min_rep, mx1 AS max_rep FROM a
UNION ALL
SELECT 'l_quantity', nr, nr - c2, d2, mn2, mx2 FROM a
UNION ALL
SELECT 'l_extendedprice', nr, nr - c3, d3, mn3, mx3 FROM a
UNION ALL
SELECT 'l_returnflag', nr, nr - c4, d4, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM a
UNION ALL
SELECT 'l_shipdate', nr, nr - c5, d5, mn5, mx5 FROM a
"""


@register("lineitem_column_profile", oracle=_PROFILE_ORACLE,
          description="ANALYZE-style column statistics (rows/nulls/NDV/min/max) "
                      "for five fact columns in ONE aggregate pass")
def lineitem_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics harvesting — the inputs a cost-based optimizer
    (or a human sizing a join) needs: row count, null count, exact NDV,
    and min/max per column, computed for five columns in ONE
    map-side-combined aggregate pass (never a pass per column).
    Numeric min/max are LONG representations (cents / epoch days) so
    the report is bit-stable cross-engine; categorical columns carry
    NDV only. At 100 TB swap exact NDV for HLL
    (events_sketch_rollup_merge shows the mergeable-sketch plumbing) —
    the plan shape is unchanged.
    """
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    cents = lambda c: F.round(F.col(c) * 100, 0).cast("long")  # noqa: E731
    days = F.datediff(F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
    a = li.agg(
        F.count(F.lit(1)).alias("nr"),
        F.count("l_orderkey").alias("c1"), F.countDistinct("l_orderkey").alias("d1"),
        F.min("l_orderkey").alias("mn1"), F.max("l_orderkey").alias("mx1"),
        F.count("l_quantity").alias("c2"), F.countDistinct("l_quantity").alias("d2"),
        F.min(cents("l_quantity")).alias("mn2"), F.max(cents("l_quantity")).alias("mx2"),
        F.count("l_extendedprice").alias("c3"), F.countDistinct("l_extendedprice").alias("d3"),
        F.min(cents("l_extendedprice")).alias("mn3"), F.max(cents("l_extendedprice")).alias("mx3"),
        F.count("l_returnflag").alias("c4"), F.countDistinct("l_returnflag").alias("d4"),
        F.count("l_shipdate").alias("c5"), F.countDistinct("l_shipdate").alias("d5"),
        F.min(days).alias("mn5"), F.max(days).alias("mx5"),
    )
    null_long = F.lit(None).cast("long")
    rows = [
        ("l_orderkey", "c1", "d1", F.col("mn1").cast("long"), F.col("mx1").cast("long")),
        ("l_quantity", "c2", "d2", F.col("mn2"), F.col("mx2")),
        ("l_extendedprice", "c3", "d3", F.col("mn3"), F.col("mx3")),
        ("l_returnflag", "c4", "d4", null_long, null_long),
        ("l_shipdate", "c5", "d5", F.col("mn5"), F.col("mx5")),
    ]
    structs = [
        F.struct(
            F.lit(name).alias("col_name"),
            F.col("nr").alias("n_rows"),
            (F.col("nr") - F.col(c)).cast("long").alias("n_null"),
            F.col(d).cast("long").alias("n_distinct"),
            mn.alias("min_rep"), mx.alias("max_rep"),
        )
        for name, c, d, mn, mx in rows
    ]
    return a.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


# ---------------------------------------------------------------------------
# one-pass pairwise correlation matrix
# ---------------------------------------------------------------------------

# (column, integer scaling expression) — dollars/percent units keep every
# cross-moment below 2^63 even at the 16x scale probe (cents² · 1e8 rows
# would overflow); the scaling is part of the metric's definition on BOTH
# engines, so parity is exact regardless.
_CORR_VARS = (
    ("qty", "CAST(round(l_quantity) AS BIGINT)"),
    ("price", "CAST(round(l_extendedprice) AS BIGINT)"),
    ("disc", "CAST(round(l_discount * 100) AS BIGINT)"),
    ("tax", "CAST(round(l_tax * 100) AS BIGINT)"),
)
_CORR_PAIRS = [
    (a, b) for i, (a, _) in enumerate(_CORR_VARS) for b, _ in [v for v in _CORR_VARS[i + 1:]]
]


def _corr_matrix_oracle() -> str:
    sel = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for name, expr in _CORR_VARS:
        sel.append(f"CAST(SUM({expr}) AS BIGINT) AS s_{name}")
        sel.append(f"CAST(SUM({expr} * {expr}) AS BIGINT) AS s_{name}_{name}")
    for a, b in _CORR_PAIRS:
        ea = dict(_CORR_VARS)[a]
        eb = dict(_CORR_VARS)[b]
        sel.append(f"CAST(SUM(({ea}) * ({eb})) AS BIGINT) AS s_{a}_{b}")
    rows = []
    for a, b in _CORR_PAIRS:
        num = f"(CAST(n AS DOUBLE) * s_{a}_{b} - CAST(s_{a} AS DOUBLE) * s_{b})"
        da = f"(CAST(n AS DOUBLE) * s_{a}_{a} - CAST(s_{a} AS DOUBLE) * s_{a})"
        db = f"(CAST(n AS DOUBLE) * s_{b}_{b} - CAST(s_{b} AS DOUBLE) * s_{b})"
        rows.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"round({num} / sqrt({da} * {db}), 6) AS corr FROM mom"
        )
    return (
        "WITH mom AS (SELECT " + ", ".join(sel) + " FROM lineitem)\n"
        + "\nUNION ALL\n".join(rows)
    )


@register("lineitem_corr_matrix", oracle=_corr_matrix_oracle(),
          description="pairwise Pearson matrix over 4 measures in ONE scan (exact moments)")
def lineitem_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 6 pairwise correlations from a single scan: one hash
    aggregate computes every first/second/cross moment as exact BIGINT
    sums (15 sums total), and the 6 Pearson values are pure expression
    arithmetic over that 1-row result — versus 6 separate `corr()`
    jobs, this reads the fact table once and is deterministic on both
    engines (float corr() accumulates in partition order). The melt to
    (col_a, col_b, corr) rows uses `stack` on the 1-row aggregate —
    free.
    """
    t = load_tables(spark, sf_dir)
    exprs = {name: F.expr(sql) for name, sql in _CORR_VARS}
    aggs = [F.count("*").cast("long").alias("n")]
    for name, _ in _CORR_VARS:
        e = exprs[name]
        aggs.append(F.sum(e).cast("long").alias(f"s_{name}"))
        aggs.append(F.sum(e * e).cast("long").alias(f"s_{name}_{name}"))
    for a, b in _CORR_PAIRS:
        aggs.append(F.sum(exprs[a] * exprs[b]).cast("long").alias(f"s_{a}_{b}"))
    mom = t["lineitem"].agg(*aggs)
    pair_cols = []
    for a, b in _CORR_PAIRS:
        n = F.col("n").cast("double")
        num = n * F.col(f"s_{a}_{b}") - F.col(f"s_{a}").cast("double") * F.col(f"s_{b}")
        da = n * F.col(f"s_{a}_{a}") - F.col(f"s_{a}").cast("double") * F.col(f"s_{a}")
        db = n * F.col(f"s_{b}_{b}") - F.col(f"s_{b}").cast("double") * F.col(f"s_{b}")
        pair_cols.append((a, b, F.round(num / F.sqrt(da * db), 6)))
    stack_expr = ", ".join(f"'{a}', '{b}', corr_{a}_{b}" for a, b, _ in pair_cols)
    wide = mom.select(
        *[c.alias(f"corr_{a}_{b}") for a, b, c in pair_cols]
    )
    return wide.selectExpr(
        f"stack({len(pair_cols)}, {stack_expr}) AS (col_a, col_b, corr)"
    )


# ---------------------------------------------------------------------------
# population stability index (distribution drift) per event type
# ---------------------------------------------------------------------------

_PSI_BINS = 10

# Window split at the exact midpoint of the observed time range
# (integer epoch-micros arithmetic — regeneration-proof, no pinned
# dates); 10 equal-width value bins over the observed cents range;
# +1 Laplace smoothing so empty bins can't ln(0). Per-bin PSI
# contributions are floored to 1e6 BEFORE the per-type sum (exact
# integer total on both engines).
_PSI_ORACLE = f"""
WITH bounds AS (
  SELECT CAST(MIN(epoch_us(ts)) AS BIGINT) AS t_lo, CAST(MAX(epoch_us(ts)) AS BIGINT) AS t_hi,
         CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c_lo,
         CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS c_hi
  FROM events
),
binned AS (
  SELECT event_type,
         CASE WHEN epoch_us(ts) * 2 < t_lo + t_hi THEN 'a' ELSE 'b' END AS side,
         least({_PSI_BINS - 1},
               (({_PSI_BINS} * (CAST(round(value * 100) AS BIGINT) - c_lo))
                // greatest(c_hi - c_lo + 1, 1))) AS bin
  FROM events CROSS JOIN bounds
  WHERE value IS NOT NULL
),
counts AS (
  SELECT event_type, bin,
         CAST(SUM(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
  FROM binned GROUP BY event_type, bin
),
tot AS (
  SELECT event_type,
         CAST(SUM(n_a) AS BIGINT) AS t_a, CAST(SUM(n_b) AS BIGINT) AS t_b,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM counts GROUP BY event_type
),
contrib AS (
  SELECT c.event_type,
         CAST(FLOOR(1000000.0 *
           (CAST(c.n_a + 1 AS DOUBLE) / (t.t_a + t.k) - CAST(c.n_b + 1 AS DOUBLE) / (t.t_b + t.k))
           * ln((CAST(c.n_a + 1 AS DOUBLE) / (t.t_a + t.k))
                / (CAST(c.n_b + 1 AS DOUBLE) / (t.t_b + t.k)))) AS BIGINT) AS psi_micro,
         c.n_a, c.n_b
  FROM counts c JOIN tot t USING (event_type)
)
SELECT event_type,
       CAST(SUM(psi_micro) AS BIGINT) AS psi_micro,
       CAST(SUM(n_a) AS BIGINT) AS n_first_half,
       CAST(SUM(n_b) AS BIGINT) AS n_second_half
FROM contrib GROUP BY event_type
"""


@register("events_distribution_drift", oracle=_PSI_ORACLE,
          description="PSI distribution drift: first vs second half of the time range")
def events_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: per event type, the
    value distribution of the first half of the observed time range
    against the second (the train-vs-serve drift check an ML pipeline
    schedules). Binning bounds and the time midpoint come from ONE
    1-row extrema aggregate (broadcast back, integer epoch arithmetic
    — no pinned dates to rot when the driver regenerates data); bins
    are Laplace-smoothed so empty cells can't ln(0); per-bin
    contributions are 1e6-floored integers so the per-type sum is
    exact on both engines. PSI > 0.2 is the conventional drift alarm.
    """
    t = load_tables(spark, sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    bounds = t["events"].agg(
        F.min(F.unix_micros("ts")).cast("long").alias("t_lo"),
        F.max(F.unix_micros("ts")).cast("long").alias("t_hi"),
        F.min(cents).alias("c_lo"),
        F.max(cents).alias("c_hi"),
    )
    binned = (
        t["events"].where(F.col("value").isNotNull())
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.when(F.unix_micros("ts") * 2 < F.col("t_lo") + F.col("t_hi"), "a")
            .otherwise("b").alias("side"),
            F.least(
                F.lit(_PSI_BINS - 1),
                F.expr(
                    f"({_PSI_BINS} * (CAST(round(value * 100) AS BIGINT) - c_lo))"
                    " div greatest(c_hi - c_lo + 1, 1)"
                ),
            ).alias("bin"),
        )
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("side") == "a", 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(F.col("side") == "b", 1).otherwise(0)).cast("long").alias("n_b"),
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("n_a").cast("long").alias("t_a"),
        F.sum("n_b").cast("long").alias("t_b"),
        F.count("*").cast("long").alias("k"),
    )
    pa = (F.col("n_a") + 1).cast("double") / (F.col("t_a") + F.col("k"))
    pb = (F.col("n_b") + 1).cast("double") / (F.col("t_b") + F.col("k"))
    contrib = counts.join(F.broadcast(tot), "event_type").select(
        "event_type", "n_a", "n_b",
        F.floor(1000000.0 * (pa - pb) * F.log(pa / pb)).cast("long").alias("psi_micro"),
    )
    return contrib.groupBy("event_type").agg(
        F.sum("psi_micro").cast("long").alias("psi_micro"),
        F.sum("n_a").cast("long").alias("n_first_half"),
        F.sum("n_b").cast("long").alias("n_second_half"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers
# ---------------------------------------------------------------------------

_K_ANON = 5

_KANON_ORACLE = f"""
WITH groups AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment, n,
       CAST(CASE WHEN n < {_K_ANON} THEN 1 ELSE 0 END AS BIGINT) AS below_k
FROM groups
"""


@register("customer_k_anonymity", oracle=_KANON_ORACLE,
          description=f"k-anonymity audit: quasi-identifier groups below k={_K_ANON}")
def customer_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-governance audit: group sizes over the quasi-identifier
    combination (nation, market segment); any group below k is a
    re-identification risk the release pipeline must generalize or
    suppress. One hash aggregate — the identifier combination space is
    small by construction, so the report is dimension-sized at any
    fact scale.
    """
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").cast("long").alias("n"))
        .select(
            "c_nationkey", "c_mktsegment", "n",
            F.when(F.col("n") < _K_ANON, 1).otherwise(0).cast("long").alias("below_k"),
        )
    )


# ---------------------------------------------------------------------------
# semi-structured key profile (schema inference report over props JSON)
# ---------------------------------------------------------------------------

_JSONKEY_ORACLE = """
WITH classified AS (
  SELECT props,
         CASE
           WHEN props IS NULL THEN '__null__'
           WHEN json_valid(props) AND json_type(props) = 'OBJECT' THEN 'object'
           ELSE '__malformed__'
         END AS cls
  FROM events
),
keyrows AS (
  SELECT unnest(json_keys(props)) AS key FROM classified WHERE cls = 'object'
)
SELECT key, CAST(COUNT(*) AS BIGINT) AS n FROM keyrows GROUP BY key
UNION ALL
SELECT cls AS key, CAST(COUNT(*) AS BIGINT) AS n
FROM classified WHERE cls <> 'object' GROUP BY cls
"""


@register("events_json_key_profile", oracle=_JSONKEY_ORACLE,
          description="semi-structured profiling: JSON key frequencies + malformed/null counts")
def events_json_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-inference report for the semi-structured column: how often
    each key occurs across valid objects, plus explicit `__malformed__`
    / `__null__` buckets (the quarantine counts a props-consuming
    pipeline budgets against). `json_object_keys` returns NULL exactly
    for non-objects, mirroring the oracle's json_valid + OBJECT gate —
    chaos-tested against hostile malformed rows. One explode + hash
    aggregate; the key space is schema-sized.
    """
    t = load_tables(spark, sf_dir)
    classified = t["events"].select(
        F.when(F.col("props").isNull(), "__null__")
        .when(F.json_object_keys("props").isNotNull(), "object")
        .otherwise("__malformed__").alias("cls"),
        F.json_object_keys("props").alias("keys"),
    )
    key_counts = (
        classified.where(F.col("cls") == "object")
        .select(F.explode("keys").alias("key"))
        .groupBy("key").agg(F.count("*").cast("long").alias("n"))
    )
    other = (
        classified.where(F.col("cls") != "object")
        .groupBy(F.col("cls").alias("key"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    return key_counts.unionByName(other)


# ---------------------------------------------------------------------------
# filter-gate agreement: Cohen's kappa between two keep verdicts
# ---------------------------------------------------------------------------

def _gate_agreement_oracle() -> str:
    from .mixture import _C4_ORACLE
    from .textops import _QLC_ORACLE

    return f"""
WITH a AS (SELECT doc_id, keep AS keep_a FROM ({_C4_ORACLE})),
b AS (SELECT doc_id, keep AS keep_b FROM ({_QLC_ORACLE})),
j AS (SELECT a.keep_a, b.keep_b FROM a JOIN b ON a.doc_id = b.doc_id),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(keep_a * keep_b) AS BIGINT) AS n11,
         CAST(SUM(keep_a * (1 - keep_b)) AS BIGINT) AS n10,
         CAST(SUM((1 - keep_a) * keep_b) AS BIGINT) AS n01,
         CAST(SUM((1 - keep_a) * (1 - keep_b)) AS BIGINT) AS n00
  FROM j
)
SELECT n, n11, n10, n01, n00,
       CAST(10000 * (n11 + n00) // n AS BIGINT) AS po_bp,
       CAST(10000 * ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))
            // (n * n) AS BIGINT) AS pe_bp,
       CAST(CASE WHEN n * n = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
            THEN 0
            ELSE (1000 * (n * (n11 + n00)
                          - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
                  + 1000 * (n * n
                          - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))))
                 // (n * n
                          - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))
                 - 1000
            END AS BIGINT) AS kappa_milli
FROM m
"""


@register("quality_gate_agreement", oracle=_gate_agreement_oracle(),
          description="Cohen's kappa between the C4 heuristic gate and the "
                      "hashed-linear classifier gate (exact milli)")
def quality_gate_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-rater agreement between two curation filters — the number
    that tells you whether a cheap heuristic gate and a model-based
    gate are interchangeable, redundant, or complementary before you
    pay for both at corpus scale. Raters: the C4 heuristic keep
    (text_c4_heuristics) and the hashed-linear classifier keep
    (quality_linear_classifier) — both REUSED as registered callables,
    so threshold drift in either breaks this query's parity instead of
    silently diverging.

    Cohen's kappa = (p_o − p_e) / (1 − p_e) stays integer-exact: the
    2×2 contingency counts are exact, p_o/p_e are reported in bp via
    DIV, and kappa lands in milli via the offset-then-DIV trick
    (+1000 shifts kappa's [−1, 1] range non-negative so floor == trunc
    on both engines; constant raters → pe = 1 → kappa defined as 0).
    The n² products bound n below ~3e9 for int64 — beyond that the
    gates are compared on a deterministic sample, which is how any
    agreement statistic is estimated at corpus scale anyway.

    Shape at 100 TB: two map-side gate projections (the classifier adds
    its one doc-keyed aggregate), one doc-keyed equi join, and ONE
    1-row hash aggregate. No windows, no scalar broadcasts.
    """
    from .mixture import text_c4_heuristics
    from .textops import quality_linear_classifier

    a = text_c4_heuristics(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("keep_a")
    )
    b = quality_linear_classifier(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("keep_b")
    )
    m = (
        a.join(b, "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("keep_a") * F.col("keep_b")).cast("long").alias("n11"),
            F.sum(F.col("keep_a") * (1 - F.col("keep_b"))).cast("long").alias("n10"),
            F.sum((1 - F.col("keep_a")) * F.col("keep_b")).cast("long").alias("n01"),
            F.sum((1 - F.col("keep_a")) * (1 - F.col("keep_b"))).cast("long").alias("n00"),
        )
    )
    pe_num = "((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00))"
    return m.select(
        "n", "n11", "n10", "n01", "n00",
        F.expr("CAST(10000 * (n11 + n00) DIV n AS BIGINT)").alias("po_bp"),
        F.expr(f"CAST(10000 * {pe_num} DIV (n * n) AS BIGINT)").alias("pe_bp"),
        F.expr(
            f"CAST(CASE WHEN n * n = {pe_num} THEN 0"
            f" ELSE (1000 * (n * (n11 + n00) - {pe_num})"
            f"       + 1000 * (n * n - {pe_num}))"
            f"      DIV (n * n - {pe_num}) - 1000 END AS BIGINT)"
        ).alias("kappa_milli"),
    )


# ---------------------------------------------------------------------------
# classifier length bias: Pearson / OLS slope of score vs document length
# ---------------------------------------------------------------------------

def _qlb_oracle() -> str:
    from .textops import QLC_WT_SQL

    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term FROM documents
),
w AS (
  SELECT doc_id,
         {QLC_WT_SQL} AS wt
  FROM tok
),
sc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS x,
         CAST(FLOOR(1000.0 * SUM(wt) / COUNT(*)) AS BIGINT) AS y
  FROM w GROUP BY doc_id
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM sc
)
SELECT n AS n_docs,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
         AS corr_len_score,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6)
         AS slope_milli_per_token
FROM mom
"""


@register("quality_length_bias", oracle=_qlb_oracle(),
          description="classifier length-bias audit: Pearson + OLS slope of "
                      "score vs token count from exact moments in one scan")
def quality_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic failure mode of model-based quality filters is a
    hidden LENGTH preference — a classifier that secretly scores long
    documents higher silently skews the curated corpus's length
    distribution. This audit reports the Pearson correlation and the
    OLS slope (score-milli per token) between the hashed-linear
    classifier's score (quality_linear_classifier's exact arithmetic)
    and document token count, from exact BIGINT moments in ONE pass —
    the lineitem_corr_matrix convention: integer sums, then a single
    identically-ordered double expression rounded to 6 places on both
    engines.

    Shape at 100 TB: explode → inline weight arithmetic → doc-keyed
    map-side-combined aggregate (the classifier pass) → ONE 1-row
    moment aggregate. No windows, no joins, no broadcasts.
    """
    t = load_tables(spark, sf_dir)
    from ..functions.text import tokens

    from .textops import QLC_WT_SPARK

    wt = F.expr(QLC_WT_SPARK)
    sc = (
        t["documents"]
        .select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .select("doc_id", wt.alias("wt"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("x"),
            F.floor(1000.0 * F.sum("wt") / F.count(F.lit(1))).cast("long").alias("y"),
        )
    )
    mom = sc.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
    dx = "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
    dy = "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)"
    return mom.select(
        F.col("n").alias("n_docs"),
        F.expr(f"round({num} / sqrt({dx} * {dy}), 6)").alias("corr_len_score"),
        F.expr(f"round({num} / {dx}, 6)").alias("slope_milli_per_token"),
    )


# ---------------------------------------------------------------------------
# l-diversity audit over quasi-identifiers (the k-anonymity companion)
# ---------------------------------------------------------------------------

_L_DIV = 3
# sensitive attribute: account balance in exact thousand-currency bands
# (cents-long DIV 100000); offset keeps the negative-balance band's DIV
# floor-identical on both engines
_LDIV_BAND_OFF = 1_000_000_000

_LDIV_ORACLE = f"""
WITH s AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(round(c_acctbal * 100) AS BIGINT) + {_LDIV_BAND_OFF}) // 100000
           AS bal_band
  FROM customer
),
g AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT bal_band) AS BIGINT) AS l_distinct
  FROM s GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment, n, l_distinct,
       CAST(CASE WHEN l_distinct < {_L_DIV} THEN 1 ELSE 0 END AS BIGINT) AS below_l
FROM g
"""


@register("customer_l_diversity", oracle=_LDIV_ORACLE,
          description=f"l-diversity audit: distinct sensitive-value bands per "
                      f"quasi-identifier group, flagged below l={_L_DIV}")
def customer_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k-anonymity companion (customer_k_anonymity): a group can be
    large enough to hide IN (k ≥ 5) and still leak its members'
    sensitive attribute if everyone in it shares one value — l-diversity
    requires ≥ l DISTINCT sensitive values per quasi-identifier group
    (Machanavajjhala et al. 2007). Quasi-identifiers: (nation, market
    segment); sensitive attribute: account balance in exact
    thousand-currency bands (cents-long arithmetic; a large offset
    keeps the negative-balance bands' floor division engine-identical).

    Shape at 100 TB: one hash aggregate with a COUNT(DISTINCT) — Spark
    plans the standard two-phase expand+agg, map-side combined; the
    report stays QI-combination-sized at any fact scale.
    """
    t = load_tables(spark, sf_dir)
    band = F.expr(
        f"(CAST(round(c_acctbal * 100, 0) AS BIGINT) + {_LDIV_BAND_OFF}) DIV 100000"
    )
    return (
        t["customer"]
        .select("c_nationkey", "c_mktsegment", band.alias("bal_band"))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.countDistinct("bal_band").cast("long").alias("l_distinct"),
        )
        .select(
            "c_nationkey", "c_mktsegment", "n", "l_distinct",
            F.when(F.col("l_distinct") < _L_DIV, 1).otherwise(0).cast("long")
            .alias("below_l"),
        )
    )


# ---------------------------------------------------------------------------
# distributed classifier TRAINING: integer-exact batch gradient descent
# ---------------------------------------------------------------------------

_QT_B = 64              # hashed feature buckets == the weight-table size
_QT_Y = 1_000_000       # label scale (micro): en → 1e6, else 0
_QT_K = 3               # gradient steps
_QT_C = 50_000          # LR denominator factor: DEN = n_docs * C (tuned:
#                         monotone MSE descent at sf0.001/0.01/0.1;
#                         C=20k oscillates, C=50k plateaus by step 3)
_QT_OFF = 2 ** 62       # offset making every DIV numerator non-negative
#                         (trunc == floor on both engines — the shared
#                         offset-DIV convention; |gradient| < 1e15 ≪ OFF)


def _qt_metrics_sql(k: int) -> str:
    return f"""
  SELECT CAST({k} AS BIGINT) AS step,
         (SELECT CAST(SUM((s - y) * (s - y)) // (SELECT n FROM nn) AS BIGINT)
            FROM s{k}) AS mse,
         (SELECT CAST(SUM(CASE WHEN (2 * s >= {_QT_Y}) = (y > 0)
                               THEN 1 ELSE 0 END) AS BIGINT)
            FROM s{k}) AS n_correct,
         (SELECT CAST(SUM(ABS(w)) AS BIGINT) FROM w{k}) AS w_l1,
         (SELECT CAST(SUM(CASE WHEN w <> 0 THEN 1 ELSE 0 END) AS BIGINT)
            FROM w{k}) AS n_nonzero_w,
         (SELECT CAST(b AS BIGINT) FROM w{k}
           ORDER BY w DESC, b ASC LIMIT 1) AS top_bucket,
         (SELECT CAST(w AS BIGINT) FROM w{k}
           ORDER BY w DESC, b ASC LIMIT 1) AS top_w
"""


def _qt_cte_prefix() -> str:
    """Shared CTE chain: featurization + K gradient-descent steps,
    ending (with a trailing comma) at s{_QT_K} — the step-K score
    relation. `_qt_oracle` appends the per-step metric rows;
    `_qt_auc_oracle` appends the Mann-Whitney U over s{_QT_K}."""
    steps = []
    for k in range(_QT_K):
        steps.append(f"""
g{k} AS (
  SELECT f.b, CAST(SUM((s.s - s.y) * f.x) AS BIGINT) AS g
  FROM feat f JOIN s{k} s ON s.doc_id = f.doc_id GROUP BY f.b
),
w{k + 1} AS (
  SELECT w.b,
         CAST(w.w - ((coalesce(g.g, 0) + {_QT_OFF}) // den.den
                     - {_QT_OFF} // den.den) AS BIGINT) AS w
  FROM w{k} w LEFT JOIN g{k} g ON g.b = w.b CROSS JOIN den
),
s{k + 1} AS (
  SELECT f.doc_id, f.y, CAST(SUM(w.w * f.x) AS BIGINT) AS s
  FROM feat f JOIN w{k + 1} w ON w.b = f.b GROUP BY f.doc_id, f.y
),""")
    return f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS term
  FROM documents
),
nt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tok GROUP BY doc_id),
bc AS (
  SELECT doc_id, CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) % {_QT_B} AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM tok GROUP BY doc_id, b
),
lab AS (
  SELECT doc_id, CAST(CASE WHEN lang = 'en' THEN {_QT_Y} ELSE 0 END AS BIGINT) AS y
  FROM documents
),
feat AS (
  SELECT bc.doc_id, bc.b, (1000 * bc.cnt) // nt.n_tok AS x, lab.y
  FROM bc JOIN nt ON nt.doc_id = bc.doc_id JOIN lab ON lab.doc_id = bc.doc_id
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lab),
den AS (SELECT n * {_QT_C} AS den FROM nn),
w0 AS (SELECT unnest(range(0, {_QT_B})) AS b, CAST(0 AS BIGINT) AS w),
s0 AS (
  SELECT f.doc_id, f.y, CAST(SUM(w.w * f.x) AS BIGINT) AS s
  FROM feat f JOIN w0 w ON w.b = f.b GROUP BY f.doc_id, f.y
),{"".join(steps)}"""


def _qt_oracle() -> str:
    mets = ",\n".join(
        f"m{k} AS ({_qt_metrics_sql(k)})" for k in range(_QT_K + 1)
    )
    union = "\nUNION ALL\n".join(f"SELECT * FROM m{k}" for k in range(_QT_K + 1))
    return f"""{_qt_cte_prefix()}
{mets}
{union}
"""


@register("quality_classifier_train", oracle=_qt_oracle(), bench=True,
          description="distributed classifier TRAINING: K integer-exact "
                      "batch-GD steps over hashed bucket features; corpus "
                      "featurized once, per-step descent hash-checked")
def quality_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trains the hashed linear quality classifier instead of taking
    its weights as given (VERDICT r8 item 3): documents are featurized
    ONCE into per-(doc, bucket) token shares x ∈ [0, 1000] over
    _QT_B=64 md5 buckets with a weak label y (lang='en' → 1e6, the
    quality_pr_curve convention), then K=3 full-batch gradient-descent
    steps on squared loss run ENTIRELY in integer arithmetic:
    s_d = Σ_b w_b·x_db, g_b = Σ_d (s_d − y_d)·x_db,
    w ← w − ((g + OFF) DIV DEN − OFF DIV DEN) with DEN = n_docs·C —
    every operand non-negative at the DIVs, so trunc == floor and both
    engines (and the driver-side Python update) agree bit-for-bit. The
    output is the per-step training curve — MSE (monotone decreasing:
    3.9e11 → 2.4e11 at sf0.001), threshold accuracy, and weight-table
    stats — so the driver hash-checks the ENTIRE descent trajectory,
    not just a final score. Swapping these trained weights into
    quality_linear_classifier is a broadcast join against the 64-row
    weight table (its docstring's stated seam).

    Driver-loop mechanics: the corpus is featurized ONCE (tokenize →
    bucket-count → persisted feat relation, ≤64 rows per doc); the
    descent then runs driver-side on sufficient statistics — the
    B×B Gram matrix, c = Σ y·x, and yy — so K more steps cost a 64×64
    integer multiply, not a Spark job; per-step threshold accuracy
    comes from ONE all-steps score pass at the end (see `_qt_fit`).
    At 100 TB feat is ~64×n_docs longs (a few TB for a trillion docs),
    the Gram self-join fans out ≤64× into a map-side-combined 4096-cell
    aggregate, and the all-steps weight table is 64·(K+1) rows
    broadcast.
    """
    rows, _ = _qt_fit(spark, sf_dir, with_metrics=True)
    return spark.createDataFrame(
        rows,
        "step long, mse long, n_correct long, w_l1 long, n_nonzero_w long, "
        "top_bucket long, top_w long",
    )


def _qt_fit(
    spark: SparkSession, sf_dir: str, *, with_metrics: bool
) -> tuple[list[tuple[int, int, int, int, int, int, int]], DataFrame]:
    """The K-step integer-exact GD loop shared by
    `quality_classifier_train` (which reports the per-step curve) and
    `quality_classifier_train_auc` (which evaluates the step-K scores).
    Returns (metric_rows, step-K score relation (doc_id, y, s)).

    The loop itself runs DRIVER-SIDE on sufficient statistics
    (VERDICT r9 "What's wrong" item 2 asked for the per-step
    two-jobs-over-feat cost to be halved; this removes it entirely).
    For squared loss on a linear model, everything a GD step needs is
    a closed form of three step-independent aggregates of feat:

        M[b1][b2] = Σ_d x_db1 · x_db2   (the _QT_B×_QT_B Gram matrix)
        c[b]      = Σ_d y_d · x_db
        yy        = Σ_d y_d²            (docs with ≥1 feature, as the
                                         per-doc score relation always
                                         scoped it)

    because s_d = Σ_b w_b·x_db gives, exactly in BIGINT arithmetic,
    gradient  g = M·w − c  and  sse = wᵀMw − 2wᵀc + yy. Every operand
    is an integer, so the trajectory is BIT-IDENTICAL to the previous
    per-step distributed form (the driver hash pins this). The one
    per-step quantity that is NOT a quadratic form — threshold
    accuracy, which needs each doc's score against the cut — is
    computed for ALL steps in ONE pass over the doc vectors at the
    end: by then the whole weight trajectory w_0..w_K is known.

    100 TB shape (r13): the corpus is featurized once into PER-DOC
    packed vectors (`dv`: one row per doc with parallel (bucket,
    count) arrays, ≤_QT_B entries — doc-table-sized, persisted), and
    the statistics/score passes are vectorized int64 numpy over Arrow
    batches (`mapInPandas`): Gram = Σ_d x_d x_dᵀ is a per-batch
    XᵀX matmul emitting ≤B²+B+1 partial rows per batch instead of the
    former doc_id self-join (≤B² join rows PER DOC — the single
    biggest bench cost in r13's before-plan), and the all-steps
    accuracy is X·Wᵀ per batch instead of a ×(K+1) broadcast-join
    fan-out. Integer matmul/sums are exact (no rounding anywhere), so
    every statistic is bit-identical to the join form. K more steps
    cost a 64×64 driver multiply, not a job. Collects are
    parameter-sized: ≤ B² + B + 2 statistic rows, then K+1 accuracy
    rows."""
    import numpy as np
    import pandas as pd

    from ..cache import persist_tracked
    from ..functions.text import tokens

    t = load_tables(spark, sf_dir)
    # project ONLY (doc_id, term) into the explode — `lang` rode along
    # unused (guide §2.3: project before the expansion); and tokenize
    # ONCE: n_tok is the sum of the per-bucket counts, so the former
    # separate `nt = tok.groupBy(doc_id).count()` pass re-ran the whole
    # scan+split+explode a second time for a number `bc` already holds
    # (r12: featurize 2 corpus passes → 1, bit-identical x).
    tok = t["documents"].select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    bc = (
        tok.select(
            "doc_id",
            F.expr(
                f"CAST(conv(substring(md5(term), 1, 8), 16, 10) AS BIGINT) % {_QT_B}"
            ).alias("b"),
        )
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    lab = t["documents"].select(
        "doc_id",
        F.when(F.col("lang") == "en", F.lit(_QT_Y)).otherwise(F.lit(0))
        .cast("long").alias("y"),
    )
    # r13: pack each doc's bucket counts into parallel arrays — one row
    # per doc. x = (1000·cnt) div n_tok is computed in numpy int64
    # floor division (== BIGINT div for the non-negative operands here),
    # so every consumer sees the exact same x the old feat relation
    # carried. sort_array makes the plan deterministic (sums are
    # order-free anyway).
    dv = persist_tracked(
        bc.groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("b", "cnt"))).alias("__bl"),
            F.sum("cnt").cast("long").alias("__n_tok"),
        )
        .join(lab, "doc_id")
        .select(
            "doc_id", "y",
            F.transform("__bl", lambda p: p["b"]).alias("bs"),
            F.transform("__bl", lambda p: p["cnt"]).alias("cs"),
            "__n_tok",
        )
    )
    B = _QT_B

    def _xmat(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        """Dense int64 (n_docs_in_batch × B) feature matrix + labels."""
        n = len(pdf)
        bs_list = pdf["bs"].to_numpy()
        lens = np.fromiter((len(a) for a in bs_list), dtype=np.int64, count=n)
        ri = np.repeat(np.arange(n), lens)
        bs_flat = np.concatenate(bs_list).astype(np.int64) if n else np.empty(0, np.int64)
        cs_flat = np.concatenate(pdf["cs"].to_numpy()).astype(np.int64) if n else np.empty(0, np.int64)
        nt = pdf["__n_tok"].to_numpy().astype(np.int64)
        X = np.zeros((n, B), dtype=np.int64)
        X[ri, bs_flat] = (1000 * cs_flat) // nt[ri]
        return X, pdf["y"].to_numpy().astype(np.int64)

    # sufficient statistics: per-batch XᵀX / Xᵀy / Σy² partials (exact
    # int64), summed by a parameter-sized aggregate, plus the JVM-side
    # n_docs count over lab (ALL docs, not only docs with features) —
    # all riding ONE tagged-union job (guide §2.6).
    def _stats_batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            X, y = _xmat(pdf)
            g = X.T @ X
            b1, k2 = np.nonzero(g)
            c = (X * y[:, None]).sum(axis=0)
            cb = np.nonzero(c)[0]
            yield pd.DataFrame({
                "tag": ["g"] * len(b1) + ["c"] * len(cb) + ["y"],
                "b1": np.concatenate([b1, cb, [0]]).astype(np.int64),
                "k2": np.concatenate([k2, np.zeros(len(cb) + 1, np.int64)]).astype(np.int64),
                "v": np.concatenate([g[b1, k2], c[cb], [int((y * y).sum())]]).astype(np.int64),
            })

    stat_parts = dv.mapInPandas(
        _stats_batches, "tag string, b1 long, k2 long, v long"
    ).groupBy("tag", "b1", "k2").agg(F.sum("v").cast("long").alias("v"))
    ndocs_df = lab.agg(F.count(F.lit(1)).cast("long").alias("v")).select(
        F.lit("n").alias("tag"), F.lit(0).cast("long").alias("b1"),
        F.lit(0).cast("long").alias("k2"), "v",
    )  # 1 row — same count the former lab.count() barrier returned
    stats = stat_parts.unionByName(ndocs_df)
    gram: dict[tuple[int, int], int] = {}
    cvec: dict[int, int] = {}
    yy = 0
    n_docs = 0
    for r in stats.collect():  # ≤ B² + B + 2 rows, one job
        if r["tag"] == "g":
            gram[(r["b1"], r["k2"])] = r["v"]
        elif r["tag"] == "c":
            cvec[r["b1"]] = r["v"]
        elif r["tag"] == "n":
            n_docs = r["v"]
        else:
            yy = r["v"] or 0
    den = n_docs * _QT_C

    w = {b: 0 for b in range(_QT_B)}
    wsteps: list[dict[int, int]] = [dict(w)]
    for _ in range(_QT_K):
        cur = wsteps[-1]
        # g = M·w − c and the update, exactly as the distributed form
        # computed them (sums of BIGINT products — no rounding anywhere);
        # the gradient reads the step SNAPSHOT, never the half-updated w
        for b in range(_QT_B):
            gb = sum(
                gram.get((b2, b), 0) * cur[b2] for b2 in range(_QT_B) if cur[b2]
            ) - cvec.get(b, 0)
            w[b] -= (gb + _QT_OFF) // den - _QT_OFF // den
        wsteps.append(dict(w))
    # wsteps holds w_0..w_K

    rows: list[tuple[int, int, int, int, int, int, int]] = []
    if with_metrics:
        # threshold accuracy per step: one pass over dv, all steps at
        # once — X·Wᵀ per Arrow batch (exact int64) instead of the
        # former ×(K+1) broadcast-join fan-out over feat
        W = np.array(
            [[wk[b] for b in range(_QT_B)] for wk in wsteps], dtype=np.int64
        )  # (K+1, B)

        def _acc_batches(it):
            for pdf in it:
                if not len(pdf):
                    continue
                X, y = _xmat(pdf)
                S = X @ W.T  # (n, K+1)
                ok = ((2 * S >= _QT_Y) == (y[:, None] > 0)).sum(axis=0)
                yield pd.DataFrame({
                    "step": np.arange(len(wsteps), dtype=np.int64),
                    "n_correct": ok.astype(np.int64),
                })

        nc = {
            r["step"]: r["n_correct"]
            for r in dv.mapInPandas(_acc_batches, "step long, n_correct long")
            .groupBy("step")
            .agg(F.sum("n_correct").cast("long").alias("n_correct"))
            .collect()  # K+1 rows
        }
        for step, wk in enumerate(wsteps):
            sse = (
                sum(
                    wk[b1] * wk[b2] * gram.get((b1, b2), 0)
                    for b1 in range(_QT_B) if wk[b1]
                    for b2 in range(_QT_B) if wk[b2]
                )
                - 2 * sum(wk[b] * cvec.get(b, 0) for b in range(_QT_B))
                + yy
            )
            top_b, top_w = max(wk.items(), key=lambda kv: (kv[1], -kv[0]))
            rows.append((
                step, sse // n_docs, nc.get(step, 0),
                sum(abs(v) for v in wk.values()),
                sum(1 for v in wk.values() if v != 0),
                top_b, top_w,
            ))

    # step-K score relation: one numpy pass over dv — s_d = Σ w_b·x_db
    # exactly as the old feat ⋈ weight-table aggregate computed it
    # (exact int64 dot; docs with no features are absent from dv, the
    # same scoping the old join had)
    wlast = np.array([wsteps[-1][b] for b in range(_QT_B)], dtype=np.int64)

    def _score_batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            X, y = _xmat(pdf)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].to_numpy().astype(np.int64),
                "y": y,
                "s": X @ wlast,
            })

    s = dv.mapInPandas(_score_batches, "doc_id long, y long, s long")
    return rows, s


# ---------------------------------------------------------------------------
# t-closeness: the third leg of the privacy-audit triad (k, l, t)
# ---------------------------------------------------------------------------

_TCLOSE_SCALE = 1_000_000   # micro fixed point for cumulative shares
_TCLOSE_T = 200_000         # flag groups with EMD > 0.2 (micro)

_TCLOSE_ORACLE = f"""
WITH s AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(round(c_acctbal * 100) AS BIGINT) + {_LDIV_BAND_OFF}) // 100000
           AS bal_band
  FROM customer
),
bands AS (
  SELECT bal_band,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM (SELECT DISTINCT bal_band FROM s) d
),
ga AS (
  SELECT bal_band, CAST(COUNT(*) AS BIGINT) AS c FROM s GROUP BY 1
),
gacum AS (
  SELECT b.bal_band, b.m,
         CAST(SUM(coalesce(ga.c, 0)) OVER (ORDER BY b.bal_band
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_all,
         CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_all
  FROM bands b LEFT JOIN ga ON ga.bal_band = b.bal_band
),
qi AS (
  SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
  FROM s GROUP BY 1, 2
),
gg AS (
  SELECT c_nationkey, c_mktsegment, bal_band, CAST(COUNT(*) AS BIGINT) AS c
  FROM s GROUP BY 1, 2, 3
),
grid AS (
  SELECT q.c_nationkey, q.c_mktsegment, q.n, g.bal_band, g.m, g.cum_all, g.n_all,
         CAST(SUM(coalesce(gg.c, 0)) OVER (PARTITION BY q.c_nationkey,
              q.c_mktsegment ORDER BY g.bal_band
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_grp
  FROM qi q CROSS JOIN gacum g
  LEFT JOIN gg ON gg.c_nationkey = q.c_nationkey
              AND gg.c_mktsegment = q.c_mktsegment
              AND gg.bal_band = g.bal_band
)
SELECT c_nationkey, c_mktsegment, n,
       CAST(SUM(ABS(({_TCLOSE_SCALE} * cum_grp) // n
                    - ({_TCLOSE_SCALE} * cum_all) // n_all))
            // (MAX(m) - 1) AS BIGINT) AS t_micro,
       CAST(CASE WHEN SUM(ABS(({_TCLOSE_SCALE} * cum_grp) // n
                              - ({_TCLOSE_SCALE} * cum_all) // n_all))
                      // (MAX(m) - 1) > {_TCLOSE_T}
                 THEN 1 ELSE 0 END AS BIGINT) AS above_t
FROM grid
GROUP BY c_nationkey, c_mktsegment, n
"""


@register("customer_t_closeness", oracle=_TCLOSE_ORACLE,
          description="t-closeness audit: ordered-EMD between each "
                      "QI-group's sensitive-band distribution and the "
                      "global one, exact micro fixed point")
def customer_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the privacy-audit triad (customer_k_anonymity,
    customer_l_diversity): a group can be big (k) and diverse (l) and
    STILL leak — if its sensitive-value distribution differs sharply
    from the table's, membership alone updates an attacker's prior.
    t-closeness (Li et al., ICDE 2007) bounds the Earth Mover's
    Distance between group and global distributions; for ordered
    numeric bands with equal steps, EMD has the closed form
    (1/(m−1))·Σ_i |CumP_i − CumQ_i|. Cumulative shares are computed in
    micro fixed point with floor DIV (non-negative operands, so both
    engines truncate identically) — t_micro is hash-exact, not a
    float estimate. Groups with t > 0.2 are flagged.

    Shape at 100 TB: two fact-side hash aggregates (per-band global,
    per-(QI, band) group counts); everything after is on the
    |QI-groups| × |bands| GRID — parameter-sized (≈ 25 nations × 5
    segments × a few dozen thousand-currency bands), built by an
    explicit crossJoin and windowed per group over ≤|bands| rows.
    The dense grid is the point: a band ABSENT from a group still
    moves the cumulative gap, so joining only observed (group, band)
    pairs would understate t.
    """
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    band = F.expr(
        f"(CAST(round(c_acctbal * 100, 0) AS BIGINT) + {_LDIV_BAND_OFF}) DIV 100000"
    )
    s = t["customer"].select("c_nationkey", "c_mktsegment", band.alias("bal_band"))
    from ..cache import persist_tracked
    s = persist_tracked(s)  # feeds bands, global counts, QI counts, group counts
    w_b = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # explicit NULLS LAST: a NULL band (NULL acctbal in hostile regen)
    # must cum in the same position on both engines (DuckDB ASC default
    # is NULLS LAST; Spark's is NULLS FIRST)
    w_bcum = Window.orderBy(F.col("bal_band").asc_nulls_last()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    bands = s.select("bal_band").distinct().select(
        "bal_band", F.count(F.lit(1)).over(w_b).cast("long").alias("m")
    )
    ga = s.groupBy("bal_band").agg(F.count(F.lit(1)).cast("long").alias("c"))
    n_all_w = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    gacum = (
        bands.join(ga, "bal_band", "left")
        .select(
            "bal_band", "m",
            F.sum(F.coalesce(F.col("c"), F.lit(0))).over(w_bcum)
            .cast("long").alias("cum_all"),
        )
        .select("bal_band", "m", "cum_all",
                F.max("cum_all").over(n_all_w).cast("long").alias("n_all"))
    )
    qi = s.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    gg = s.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("gc")
    )
    w_gcum = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy(F.col("bal_band").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grid = (
        qi.crossJoin(gacum)
        .join(gg, ["c_nationkey", "c_mktsegment", "bal_band"], "left")
        .select(
            "c_nationkey", "c_mktsegment", "n", "bal_band", "m",
            "cum_all", "n_all",
            F.sum(F.coalesce(F.col("gc"), F.lit(0))).over(w_gcum)
            .cast("long").alias("cum_grp"),
        )
    )
    out = grid.groupBy("c_nationkey", "c_mktsegment", "n").agg(
        F.expr(
            f"CAST(SUM(ABS(CAST({_TCLOSE_SCALE} * cum_grp AS BIGINT) DIV n"
            f" - CAST({_TCLOSE_SCALE} * cum_all AS BIGINT) DIV n_all))"
            f" DIV (MAX(m) - 1) AS BIGINT)"
        ).alias("t_micro"),
    )
    return out.select(
        "c_nationkey", "c_mktsegment", "n", "t_micro",
        F.when(F.col("t_micro") > _TCLOSE_T, 1).otherwise(0).cast("long")
        .alias("above_t"),
    )


def _qt_auc_oracle() -> str:
    return f"""{_qt_cte_prefix()}
by_s AS (
  SELECT s,
         CAST(SUM(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos_at,
         CAST(SUM(CASE WHEN y > 0 THEN 0 ELSE 1 END) AS BIGINT) AS neg_at
  FROM s{_QT_K} GROUP BY s
),
cum AS (
  SELECT pos_at, neg_at,
         CAST(coalesce(SUM(neg_at) OVER (ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS neg_below
  FROM by_s
)
SELECT CAST(SUM(pos_at) AS BIGINT) AS n_pos,
       CAST(SUM(neg_at) AS BIGINT) AS n_neg,
       CAST(SUM(pos_at * (2 * neg_below + neg_at)) AS BIGINT) AS u2,
       CASE WHEN SUM(pos_at) = 0 OR SUM(neg_at) = 0 THEN NULL
            ELSE CAST(SUM(pos_at * (2 * neg_below + neg_at)) AS DOUBLE)
                 / (2.0 * SUM(pos_at) * SUM(neg_at)) END AS auc
FROM cum
"""


@register("quality_classifier_train_auc", oracle=_qt_auc_oracle(),
          description="train-then-evaluate: exact Mann-Whitney AUC of the "
                      "step-K trained classifier scores — the whole descent "
                      "AND its threshold-free quality, one hash-checked row")
def quality_classifier_train_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closes the training loop VERDICT r8 item 3 opened: run the K
    integer-exact GD steps (`_qt_fit`, shared with
    quality_classifier_train) and evaluate the TRAINED scores s_K with
    the exact U-statistic (the quality_classifier_auc machinery) —
    so the driver hash-checks not just that the loss descended but
    where the trained ranking lands. Measured: trained AUC 0.508 /
    0.543 at sf0.001/0.01 vs the md5 stand-in scorer's 0.458 / 0.498
    (quality_classifier_auc) — K=3 full-batch steps on 64 hashed
    buckets beat chance and the stand-in, modestly, which is the
    honest ceiling of this feature space on the synthetic corpus; the
    two queries share output schema exactly so the comparison is one
    join away.

    Scale shape: the trainer's (feat scans per step, 64-row collects)
    plus one score-keyed hash aggregate and the distributed_cumsum
    prefix — unlike the stand-in scorer's bounded codomain, trained
    scores are sums of products (unbounded distinct values), so the
    U-statistic MUST ride the distributed prefix sum, and does.
    """
    from ..operators.windows import distributed_cumsum

    _, s = _qt_fit(spark, sf_dir, with_metrics=False)
    by_s = (
        s.groupBy("s")
        .agg(
            F.sum(F.when(F.col("y") > 0, 1).otherwise(0))
            .cast("long").alias("pos_at"),
            F.sum(F.when(F.col("y") > 0, 0).otherwise(1))
            .cast("long").alias("neg_at"),
        )
    )
    cum = distributed_cumsum(
        by_s, [F.col("s")], "neg_at", cumsum_name="__neg_incl"
    ).select(
        "pos_at", "neg_at",
        (F.col("__neg_incl") - F.col("neg_at")).cast("long").alias("neg_below"),
    )
    return cum.agg(
        F.sum("pos_at").cast("long").alias("n_pos"),
        F.sum("neg_at").cast("long").alias("n_neg"),
        F.sum(F.col("pos_at") * (2 * F.col("neg_below") + F.col("neg_at")))
        .cast("long").alias("u2"),
    ).select(
        "n_pos", "n_neg", "u2",
        F.when(
            (F.col("n_pos") == 0) | (F.col("n_neg") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(
            F.col("u2").cast("double")
            / (2.0 * F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
        )
        .alias("auc"),
    )


# ---------------------------------------------------------------------------
# classifier fairness across languages: the per-group calibration audit
# ---------------------------------------------------------------------------

_QFAIR_OFF = 1_000_000_000  # |score_milli| << OFF: offset-DIV floor parity


def _qfair_oracle() -> str:
    from .textops import QLC_WT_SQL

    return f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(trim(text), ' ')) AS term
  FROM documents
),
w AS (
  SELECT doc_id, lang, {QLC_WT_SQL} AS wt FROM tok
),
sc AS (
  SELECT doc_id, lang,
         CAST(FLOOR(1000.0 * SUM(wt) / COUNT(*)) AS BIGINT) AS y
  FROM w GROUP BY doc_id, lang
),
per_lang AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
  FROM sc GROUP BY lang
),
tot AS (
  SELECT lang, n_docs, sy, n_pos,
         CAST(SUM(n_docs) OVER () AS BIGINT) AS n_tot,
         CAST(SUM(sy) OVER () AS BIGINT) AS sy_tot
  FROM per_lang
)
SELECT lang, n_docs,
       CAST((sy + n_docs * {_QFAIR_OFF}) // n_docs - {_QFAIR_OFF} AS BIGINT)
         AS mean_score_milli,
       CAST(((sy + n_docs * {_QFAIR_OFF}) // n_docs - {_QFAIR_OFF})
            - ((sy_tot + n_tot * {_QFAIR_OFF}) // n_tot - {_QFAIR_OFF})
            AS BIGINT) AS gap_milli,
       CAST(10000 * n_pos // n_docs AS BIGINT) AS pos_share_bp
FROM tot
"""


@register("quality_classifier_lang_fairness", oracle=_qfair_oracle(),
          description="classifier fairness audit: per-language mean score, "
                      "gap vs the global mean, and positive-rate share — "
                      "exact milli/bp integers")
def quality_classifier_lang_fairness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The group-fairness companion to quality_length_bias: a learned
    quality filter that systematically under-scores a language quietly
    deletes that language from the curated corpus (the documented
    failure mode of perplexity and fasttext-style filters on
    low-resource languages). Per language: document count, mean
    classifier score (the quality_linear_classifier hashed-weight
    arithmetic, milli fixed-point), the GAP against the corpus-wide
    mean (demographic-parity-style difference — the number a curation
    review signs off on), and the positive-rate share (score > 0) in
    bp. NULL lang is its own audited group, not a dropped row.

    Exactness: scores are the registered classifier's own floored
    milli integers; both means use the offset-then-DIV trick so floor
    == trunc on negative sums; the gap subtracts two already-floored
    integers (no double rounding anywhere).

    Shape at 100 TB: explode → doc-keyed map-side-combined aggregate
    (the classifier pass) → |langs|-sized aggregate; the global mean
    rides a window over that parameter-sized relation. No fact-sized
    windows, no joins.
    """
    from pyspark.sql.window import Window

    from ..functions.text import tokens
    from .textops import QLC_WT_SPARK

    t = load_tables(spark, sf_dir)
    sc = (
        t["documents"]
        .select("doc_id", "lang", F.explode(tokens(F.col("text"))).alias("term"))
        .select("doc_id", "lang", F.expr(QLC_WT_SPARK).alias("wt"))
        .groupBy("doc_id", "lang")
        .agg(
            F.floor(1000.0 * F.sum("wt") / F.count(F.lit(1)))
            .cast("long").alias("y")
        )
    )
    per_lang = sc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.when(F.col("y") > 0, 1).otherwise(0)).cast("long").alias("n_pos"),
    )
    w_all = Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot = per_lang.select(
        "lang", "n_docs", "sy", "n_pos",
        F.sum("n_docs").over(w_all).cast("long").alias("n_tot"),
        F.sum("sy").over(w_all).cast("long").alias("sy_tot"),
    )
    mean_l = f"(sy + n_docs * {_QFAIR_OFF}) DIV n_docs - {_QFAIR_OFF}"
    mean_g = f"(sy_tot + n_tot * {_QFAIR_OFF}) DIV n_tot - {_QFAIR_OFF}"
    return tot.select(
        "lang", "n_docs",
        F.expr(f"CAST({mean_l} AS BIGINT)").alias("mean_score_milli"),
        F.expr(f"CAST(({mean_l}) - ({mean_g}) AS BIGINT)").alias("gap_milli"),
        F.expr("CAST(10000 * n_pos DIV n_docs AS BIGINT)").alias("pos_share_bp"),
    )


# ---------------------------------------------------------------------------
# k-anonymity generalization ladder: band width vs suppression cost
# ---------------------------------------------------------------------------

# candidate widths for the balance quasi-identifier, in cents: 1k / 10k /
# 100k currency bands, plus the fully generalized rung (no balance QI)
_KGEN_WIDTHS = (("band_1k", 100_000), ("band_10k", 1_000_000),
                ("band_100k", 10_000_000), ("no_band", 0))


def _kgen_oracle() -> str:
    arms = []
    for label, w in _KGEN_WIDTHS:
        band = ("CAST(0 AS BIGINT)" if w == 0 else
                f"(CAST(round(c_acctbal * 100) AS BIGINT) + {_LDIV_BAND_OFF}) // {w}")
        arms.append(f"""
  SELECT '{label}' AS rung,
         CAST(COUNT(*) AS BIGINT) AS n_groups,
         CAST(SUM(CASE WHEN n < {_K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
           AS groups_below_k,
         CAST(SUM(CASE WHEN n < {_K_ANON} THEN n ELSE 0 END) AS BIGINT)
           AS customers_suppressed,
         CAST(SUM(n) AS BIGINT) AS n_customers
  FROM (
    SELECT c_nationkey, c_mktsegment, {band} AS b,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer GROUP BY 1, 2, 3
  ) g""")
    return f"""
WITH arms AS ({" UNION ALL ".join(arms)})
SELECT rung, n_groups, groups_below_k, customers_suppressed,
       CAST(10000 * customers_suppressed // n_customers AS BIGINT)
         AS suppressed_bp
FROM arms
"""


@register("customer_k_anon_generalization_ladder", oracle=_kgen_oracle(),
          description=f"k-anonymization planner: per candidate balance-band "
                      f"width, exact group census and share of customers a "
                      f"k={_K_ANON} release would have to suppress")
def customer_k_anon_generalization_ladder(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ENGINEERING half of the privacy triad the k/l/t audits only
    measure: anonymizing a release means choosing how far to generalize
    the quasi-identifiers, and each candidate generalization trades
    analytic resolution (finer balance bands) against suppression (rows
    in groups still below k must be withheld). This ladder prices every
    rung — group count, groups below k, and the exact share of
    customers suppressed — so the release decision is read off a table
    instead of iterated by hand (the same decision-table pattern as
    events_watermark_tradeoff and training_context_length_ladder).

    Shape at 100 TB: the QI relation is customer-dimension-sized; each
    rung is one map-side-combined (QI, band) aggregate reduced to a
    1-row arm, unioned ladder-sized. Groupings differ per rung, so the
    rungs are separate aggregates by construction — each linear, none
    windowed. Exact cents arithmetic with the l-diversity band offset
    (negative balances floor identically on both engines).
    """
    t = load_tables(spark, sf_dir)
    arms = []
    for label, w in _KGEN_WIDTHS:
        band = (F.lit(0).cast("long") if w == 0 else F.expr(
            f"(CAST(round(c_acctbal * 100, 0) AS BIGINT) + {_LDIV_BAND_OFF})"
            f" DIV {w}"
        ))
        g = (
            t["customer"]
            .groupBy("c_nationkey", "c_mktsegment", band.alias("b"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        arms.append(g.agg(
            F.lit(label).alias("rung"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("n") < _K_ANON, 1).otherwise(0))
            .cast("long").alias("groups_below_k"),
            F.sum(F.when(F.col("n") < _K_ANON, F.col("n")).otherwise(0))
            .cast("long").alias("customers_suppressed"),
            F.sum("n").cast("long").alias("n_customers"),
        ))
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.select(
        "rung", "n_groups", "groups_below_k", "customers_suppressed",
        F.expr("CAST(10000 * customers_suppressed DIV n_customers AS BIGINT)")
        .alias("suppressed_bp"),
    )
