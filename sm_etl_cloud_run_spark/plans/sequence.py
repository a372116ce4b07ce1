"""Sequence analytics over the `events` stream: Markov transitions,
session paths, CDC snapshots, EWMA smoothing, equal-frequency binning,
and seasonal-adjusted anomaly ranking.

Round-7 layer. Everything follows the engine's determinism contract:
probabilities and means are scaled-integer arithmetic (basis points /
micro-units via integer division — exact on Spark's `DIV` and DuckDB's
`//`), money stays in cents, every ranked output has a unique
tiebreaker, and doubles appear only as a single final division or a
`round(..., 6)` of exact-integer inputs (the events_anomaly_zscore
precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.cdc import apply_cdc
from ..tables import load_tables
from .registry import register

# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       CAST((10000 * n) // SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS prob_bp
FROM pairs
"""


@register("events_transition_matrix", oracle=_TRANSITION_ORACLE,
          description="Markov transition matrix of per-user event-type bigrams")
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(next | prev) over per-user event sequences.

    One user-keyed shuffle for the lag, then a hash aggregate on the
    (prev, next) pair — the pair space is |types|², so the probability
    window runs on a trivially small relation regardless of corpus
    size. Probabilities are floored basis points (integer division).
    """
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        t["events"]
        .select("user_id", "event_type", "ts", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    return pairs.select(
        "prev_type", "next_type", "n",
        F.expr("(10000 * n) div sum(n) over (partition by prev_type)")
        .cast("long").alias("prob_bp"),
    )


# ---------------------------------------------------------------------------
# top user paths (first-5-event journeys)
# ---------------------------------------------------------------------------

_PATH_LEN = 5
_PATH_TOPK = 20

_PATHS_ORACLE = f"""
WITH ranked AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
paths AS (
  -- coalesce BEFORE aggregating: string_agg skips NULL elements (and
  -- returns NULL for all-NULL groups) while Spark's concat_ws drops
  -- them (returning '') — an explicit '' token makes both engines
  -- render a NULL-typed event identically inside the path.
  SELECT user_id,
         string_agg(coalesce(event_type, ''), '>' ORDER BY ts, event_id) AS path
  FROM ranked WHERE rn <= {_PATH_LEN}
  GROUP BY user_id
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
FROM paths
GROUP BY path
ORDER BY n_users DESC, path ASC
LIMIT {_PATH_TOPK}
"""


@register("events_top_paths", oracle=_PATHS_ORACLE,
          description="most common first-5-event user journeys (path analysis)")
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k opening event paths.

    One user-keyed shuffle serves both the rank and the path assembly
    (same partitioning, Catalyst reuses the exchange); the path count
    is a hash aggregate on strings of bounded length. Order inside the
    path is made explicit by sorting the collected (ts, event_id,
    type) structs — collect_list order is otherwise partition-luck.
    """
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = (
        t["events"]
        .select(
            "user_id", "ts", "event_id",
            # NULL-typed events render as an explicit empty token (see
            # the oracle comment: concat_ws vs string_agg NULL handling)
            F.coalesce(F.col("event_type"), F.lit("")).alias("event_type"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _PATH_LEN)
    )
    paths = ranked.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy(F.col("n_users").desc(), F.col("path").asc())
        .limit(_PATH_TOPK)
    )


# ---------------------------------------------------------------------------
# CDC snapshot: latest state per user, terminal 'error' deletes the key
# ---------------------------------------------------------------------------

_CDC_ORACLE = """
WITH log AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(round(value * 100) AS BIGINT) AS value_cents,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events
),
latest AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM log
)
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type, value_cents
FROM latest WHERE rn = 1 AND op <> 'D'
"""


@register("events_cdc_snapshot", oracle=_CDC_ORACLE,
          description="CDC apply: latest-writer-wins snapshot; terminal error deletes the key")
def events_cdc_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the current-state snapshot from the event change log
    via the generic `apply_cdc` operator (events as a Debezium-style
    log: any event upserts the user's state, an `error` as the LATEST
    event tombstones the user). One key shuffle, incremental-friendly.
    """
    t = load_tables(spark, sf_dir)
    log = t["events"].select(
        "user_id", "event_id", "ts", "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
        F.when(F.col("event_type") == "error", "D").otherwise("U").alias("op"),
    )
    snap = apply_cdc(log, ["user_id"], ["ts", "event_id"], op_col="op")
    return snap.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        "value_cents",
    )


# ---------------------------------------------------------------------------
# EWMA smoothing: power-of-two decay over the trailing 4 events
# ---------------------------------------------------------------------------

# Weights 8/4/2/1 (halving decay) over the last 4 values; the weighted
# mean is (Σ wᵢ·centsᵢ · 10000) // Σ wᵢ — micro-cents-level precision
# with pure BIGINT arithmetic. Rows with fewer than 4 predecessors use
# only the weights that exist (standard EWMA warm-up).
_EWMA_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents,
         lag(CAST(round(value * 100) AS BIGINT), 1) OVER w AS l1,
         lag(CAST(round(value * 100) AS BIGINT), 2) OVER w AS l2,
         lag(CAST(round(value * 100) AS BIGINT), 3) OVER w AS l3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id, cents,
       CAST((10000 * (8 * cents + coalesce(4 * l1, 0) + coalesce(2 * l2, 0) + coalesce(l3, 0)))
            // (8 + CASE WHEN l1 IS NULL THEN 0 ELSE 4 END
                  + CASE WHEN l2 IS NULL THEN 0 ELSE 2 END
                  + CASE WHEN l3 IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS ewma_cents_e4
FROM seq
"""


@register("events_ewma", oracle=_EWMA_ORACLE,
          description="EWMA smoothing (halving decay, trailing 4) in exact integer arithmetic")
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of the value series.

    Three lags over one user-keyed window (one shuffle, one sort) and
    a pure-integer weighted mean: weights are powers of two, the
    division is a single floored BIGINT op, so Spark and the oracle
    agree bit-for-bit — a float `avg` with decay would be
    partition-order-dependent. 10⁴ scale keeps precision at 1e-4 cents.
    """
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    seq = t["events"].select(
        "user_id", "event_id", "ts", cents.alias("cents")
    ).select(
        "user_id", "event_id", "ts", "cents",
        F.lag("cents", 1).over(w).alias("l1"),
        F.lag("cents", 2).over(w).alias("l2"),
        F.lag("cents", 3).over(w).alias("l3"),
    )
    num = (
        8 * F.col("cents")
        + F.coalesce(4 * F.col("l1"), F.lit(0))
        + F.coalesce(2 * F.col("l2"), F.lit(0))
        + F.coalesce(F.col("l3"), F.lit(0))
    )
    den = (
        F.lit(8)
        + F.when(F.col("l1").isNull(), 0).otherwise(4)
        + F.when(F.col("l2").isNull(), 0).otherwise(2)
        + F.when(F.col("l3").isNull(), 0).otherwise(1)
    )
    return seq.select(
        "user_id", "event_id", "cents",
        F.expr(
            "CAST((10000 * (8 * cents + coalesce(4 * l1, 0) + coalesce(2 * l2, 0)"
            " + coalesce(l3, 0))) div (8 + CASE WHEN l1 IS NULL THEN 0 ELSE 4 END"
            " + CASE WHEN l2 IS NULL THEN 0 ELSE 2 END"
            " + CASE WHEN l3 IS NULL THEN 0 ELSE 1 END) AS BIGINT)"
        ).alias("ewma_cents_e4"),
    )


# ---------------------------------------------------------------------------
# equal-frequency binning (ntile quartiles) per event type
# ---------------------------------------------------------------------------

_NTILE_ORACLE = """
WITH binned AS (
  SELECT event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(ntile(4) OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS quartile
  FROM events
)
SELECT event_type, quartile,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(cents) AS BIGINT) AS min_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents
FROM binned GROUP BY event_type, quartile
"""


@register("events_value_ntile", oracle=_NTILE_ORACLE,
          description="equal-frequency (ntile) quartile profile of value per event type")
def events_value_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile boundaries by equal-frequency binning: ntile(4) per
    event type (deterministic — the ORDER BY carries an event_id
    tiebreaker), then min/max/count per bin. One shuffle; the aggregate
    reuses the window's partitioning.
    """
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    binned = t["events"].select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )
    return binned.groupBy("event_type", "quartile").agg(
        F.count("*").cast("long").alias("n"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )


# ---------------------------------------------------------------------------
# seasonal-adjusted anomalies: z vs the hour-of-day baseline
# ---------------------------------------------------------------------------

_ANOM_TOPK = 50

_SEASONAL_ANOM_ORACLE = f"""
WITH base AS (
  SELECT event_id, event_type, CAST(hour(ts) AS INT) AS hod,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
),
stats AS (
  SELECT event_type, hod,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s1,
         CAST(SUM(cents * cents) AS BIGINT) AS s2
  FROM base GROUP BY event_type, hod
),
scored AS (
  SELECT b.event_id, b.event_type, b.hod, b.cents,
         round((CAST(b.cents AS DOUBLE) - CAST(s.s1 AS DOUBLE) / s.n)
               / sqrt(greatest(CAST(s.n AS DOUBLE) * s.s2 - CAST(s.s1 AS DOUBLE) * s.s1, 1)
                      / (CAST(s.n AS DOUBLE) * s.n)), 6) AS z
  FROM base b JOIN stats s USING (event_type, hod)
  WHERE s.n >= 2
)
SELECT event_id, event_type, hod, cents, z
FROM scored
ORDER BY abs(z) DESC, event_id ASC
LIMIT {_ANOM_TOPK}
"""


@register("events_seasonal_anomaly", oracle=_SEASONAL_ANOM_ORACLE,
          description="seasonal-adjusted anomalies: top |z| vs the hour-of-day baseline")
def events_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deseasonalized outlier ranking: each event scored against its
    (event_type, hour-of-day) population moments, top-k by |z|.

    The baseline is |types|×24 rows built from exact integer moments
    (Σc, Σc²) — broadcast back onto the fact scan, so the fact side
    never shuffles; the top-k is a TakeOrdered. The z expression is
    the events_anomaly_zscore precedent: identical double math over
    exact integers on both engines, rounded to 6 places.
    """
    t = load_tables(spark, sf_dir)
    base = t["events"].select(
        "event_id", "event_type",
        F.hour("ts").cast("int").alias("hod"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    stats = base.groupBy("event_type", "hod").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).cast("long").alias("s2"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    var_num = F.greatest(n * F.col("s2") - s1 * F.col("s1"), F.lit(1.0))
    scored = (
        base.join(F.broadcast(stats.where(F.col("n") >= 2)), ["event_type", "hod"])
        .select(
            "event_id", "event_type", "hod", "cents",
            F.round(
                (F.col("cents").cast("double") - s1 / n) / F.sqrt(var_num / (n * n)), 6
            ).alias("z"),
        )
    )
    return scored.orderBy(F.abs(F.col("z")).desc(), F.col("event_id").asc()).limit(_ANOM_TOPK)
