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
         CAST(ntile(4) OVER (PARTITION BY event_type
                             ORDER BY value ASC NULLS LAST, event_id) AS BIGINT) AS quartile
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
    tiebreaker), then min/max/count per bin.

    100 TB shape: the per-type quartile rides
    `distributed_ntile_in_groups` — the range partitioner splits on
    (event_type, value, event_id), so one heavy type's data sorts
    across MANY tasks (the bare partitionBy(event_type) ntile this
    replaced sorted each type in ONE task — the same single-task-group
    hazard the rank-exact percentile family was rewired off).
    """
    from ..operators.windows import distributed_ntile_in_groups

    t = load_tables(spark, sf_dir)
    # NULLS LAST explicitly on BOTH engines: Spark defaults ASC NULLS
    # FIRST, DuckDB NULLS LAST — a hostile NULL measure would silently
    # shift every bin boundary apart (the round-5 NULL-ordering lesson).
    binned = distributed_ntile_in_groups(
        t["events"].select(
            "event_type", "event_id", "value",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        ),
        ["event_type"],
        [F.col("value").asc_nulls_last(), F.col("event_id")],
        4,
        tile_name="quartile",
    ).select("event_type", "cents", "quartile")
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


# ---------------------------------------------------------------------------
# coherent (user-consistent) sampling
# ---------------------------------------------------------------------------

_COHERENT_MOD = 10  # keep ~1/10 of users

_COHERENT_ORACLE = f"""
WITH sampled AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
  WHERE CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
        % {_COHERENT_MOD} = 0
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS total_cents
FROM sampled GROUP BY user_id
"""


@register("events_user_coherent_sample", oracle=_COHERENT_ORACLE,
          description="coherent sampling: hash-select users, keep ALL their events")
def events_user_coherent_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-coherent sampling — the holdout shape a training pipeline
    needs: selecting 10% of USERS (not 10% of rows) keeps every
    sampled user's history intact, so sequence models and per-user
    metrics stay unbiased. The selector is a pure md5 hash of the key:
    deterministic, seedless, and computable on any engine or at any
    later date (a new events partition lands in the same side of the
    split). Pure filter + hash agg — no shuffle beyond the aggregate,
    and the filter pushes into the scan.
    """
    t = load_tables(spark, sf_dir)
    h32 = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10).cast("long")
    return (
        t["events"]
        .where(h32 % _COHERENT_MOD == 0)
        .select("user_id", F.round(F.col("value") * 100, 0).cast("long").alias("cents"))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# winsorized statistics (rank-based p05/p95 clipping)
# ---------------------------------------------------------------------------

_WINSOR_ORACLE = """
WITH ranked AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value ASC NULLS LAST, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
bounds AS (
  SELECT event_type,
         MIN(CASE WHEN rn = CAST(floor(0.05 * n) AS BIGINT) + 1 THEN cents END) AS lo,
         MIN(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT) THEN cents END) AS hi
  FROM ranked GROUP BY event_type
)
SELECT r.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       b.lo AS lo_cents, b.hi AS hi_cents,
       CAST(SUM(CASE WHEN r.cents < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
       CAST(SUM(CASE WHEN r.cents > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
       CAST((10000 * SUM(least(greatest(r.cents, b.lo), b.hi))) // COUNT(*) AS BIGINT)
         AS winsor_mean_e4
FROM ranked r JOIN bounds b USING (event_type)
GROUP BY r.event_type, b.lo, b.hi
"""


@register("events_winsorized_stats", oracle=_WINSOR_ORACLE, bench=True,
          description="winsorized mean per event type (rank-exact p05/p95 clipping)")
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics by winsorization: clip each type's values at
    the EXACT rank-based 5th/95th percentile positions (deterministic —
    row_number with an event_id tiebreaker; approx_percentile would
    neither be deterministic nor cross-engine), then an integer-exact
    clipped mean at 1e-4 precision. One shuffle for the rank window;
    the per-type bounds relation is |types| rows and broadcasts back.

    100 TB shape: the rank rides `distributed_rank_in_groups` — the
    range partitioner splits on (event_type, value, event_id), so one
    heavy type's data sorts across MANY tasks in parallel (the plain
    partitionBy(event_type) window this replaced sorted each type in
    ONE task: 5.0x wall at 16x data in the round-7 probe). Exact same
    ranks, no single-task fact-sized sort anywhere; the sketch twin
    `events_sketch_profile` (HLL + GK, one-pass, +/-5% pytest-bounded)
    remains the cheaper one-pass option.
    """
    from ..operators.windows import distributed_rank_in_groups

    t = load_tables(spark, sf_dir)
    # explicit NULLS LAST — same cross-engine ordering contract as the
    # ntile window above
    ranked = distributed_rank_in_groups(
        t["events"].select(
            "event_type", "event_id", "value",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        ),
        ["event_type"],
        [F.col("value").asc_nulls_last(), F.col("event_id")],
        rank_name="rn", total_name="n",
    ).select("event_type", "event_id", "cents", "rn", "n")
    bounds = ranked.groupBy("event_type").agg(
        F.min(F.when(F.col("rn") == F.floor(0.05 * F.col("n")).cast("long") + 1, F.col("cents"))).alias("lo"),
        F.min(F.when(F.col("rn") == F.ceil(0.95 * F.col("n")).cast("long"), F.col("cents"))).alias("hi"),
    )
    clipped = ranked.join(F.broadcast(bounds), "event_type")
    return (
        clipped.groupBy("event_type", "lo", "hi")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum((F.col("cents") < F.col("lo")).cast("long")).alias("n_clipped_low"),
            F.sum((F.col("cents") > F.col("hi")).cast("long")).alias("n_clipped_high"),
            F.expr(
                "CAST((10000 * sum(least(greatest(cents, lo), hi))) div count(*) AS BIGINT)"
            ).alias("winsor_mean_e4"),
        )
        .select(
            "event_type", "n",
            F.col("lo").alias("lo_cents"), F.col("hi").alias("hi_cents"),
            "n_clipped_low", "n_clipped_high", "winsor_mean_e4",
        )
    )


# ---------------------------------------------------------------------------
# GROUPING SETS (the cube/rollup family's general form, via the SQL surface)
# ---------------------------------------------------------------------------

_GSETS_ORACLE = """
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(CAST(month(ts) AS BIGINT), -1) AS m,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
GROUP BY GROUPING SETS ((event_type), (month(ts)), ())
"""


@register("events_grouping_sets", oracle=_GSETS_ORACLE,
          description="GROUPING SETS aggregate (cube/rollup family, arbitrary set list)")
def events_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping-set aggregation through the engine's SQL
    surface (`spark.sql`) — the general form that cube_aggregate /
    rollup_aggregate specialize. Spark expands the sets in ONE Expand +
    hash-aggregate pass (no per-set re-scan). NULL group labels are
    coalesced to sentinels so a hostile NULL event_type can't collide
    with the set-marker NULLs ambiguously on either engine.
    """
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT coalesce(event_type, 'ALL') AS event_type,
               coalesce(CAST(month(ts) AS BIGINT), -1) AS m,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM events
        GROUP BY GROUPING SETS ((event_type), (month(ts)), ())
    """)


# ---------------------------------------------------------------------------
# as-of join with tolerance (stale matches nulled)
# ---------------------------------------------------------------------------

_ASOF_TOL_ORACLE = """
WITH attached AS (
  SELECT event_id, user_id, ts, event_type,
         CAST(round(value * 100) AS BIGINT) AS value_cents,
         last_value(CASE WHEN event_type = 'click'
                         THEN CAST(round(value * 100) AS BIGINT) END IGNORE NULLS)
           OVER w AS last_click_cents,
         last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
           OVER w AS last_click_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, ts, value_cents,
       CASE WHEN last_click_ts >= ts - INTERVAL 1 HOUR
            THEN last_click_cents END AS last_click_cents_1h
FROM attached
WHERE event_type = 'purchase'
"""


@register("events_asof_tolerance", oracle=_ASOF_TOL_ORACLE,
          description="as-of join with tolerance: prior click only if within 1 hour")
def events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The toleranced as-of (pandas `merge_asof(tolerance=...)`
    semantics): each purchase carries the user's latest prior click
    ONLY if it happened within the last hour — stale state is null, not
    silently ancient. Same single window pass as events_asof_last_click
    (carry value AND its timestamp), plus one interval comparison; the
    tolerance costs nothing at scale.
    """
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_cents = F.when(
        F.col("event_type") == "click",
        F.round(F.col("value") * 100, 0).cast("long"),
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    attached = t["events"].select(
        "event_id", "user_id", "ts", "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("value_cents"),
        F.last(click_cents, ignorenulls=True).over(w).alias("last_click_cents"),
        F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts"),
    )
    return attached.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value_cents",
        F.when(
            F.col("last_click_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"),
            F.col("last_click_cents"),
        ).alias("last_click_cents_1h"),
    )


# ---------------------------------------------------------------------------
# rolling 7-day distinct users (WAU per day)
# ---------------------------------------------------------------------------

_WAU_ORACLE = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau,
       CAST(COUNT(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END) AS BIGINT) AS dau
FROM days d
JOIN du u ON u.day > d.day - INTERVAL 7 DAY AND u.day <= d.day
GROUP BY d.day
"""


@register("events_rolling_wau", oracle=_WAU_ORACLE,
          description="rolling 7-day distinct users per day (WAU/DAU, exact)")
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling weekly-active-users: dedupe to (day, user) first —
    the fact stream collapses to at most |days|·|users| rows — then
    each row fans out to the ≤7 report days it covers (bounded
    explode + broadcast day-grid equi-join; a literal range join
    would be a nested loop) and a distinct count per day. Distinct-count over a sliding window has NO
    partial-aggregate shortcut (cardinality is holistic), so the exact
    form is this ≤7× amplification of the DEDUPED day-user relation —
    at 100 TB you either accept that (it's ~7·|active users|·|days|
    rows, not 7× the corpus) or switch to the mergeable HLL rollup
    (`events_sketch_rollup_merge`) and take the ±2% estimate.
    """
    t = load_tables(spark, sf_dir)
    du = (
        t["events"]
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .distinct()
    )
    days = du.select("day").distinct()
    # Explode each (day, user) into the ≤7 report days it contributes
    # to — a bounded fan-out + HASH semi-join against the observed-day
    # grid, instead of a pure range join (which Spark can only execute
    # as a nested loop: |days| × |day-user| comparisons).
    contrib = du.select(
        "user_id",
        F.col("day").alias("active_day"),
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    return (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(
            F.count_distinct("user_id").cast("long").alias("wau"),
            F.count_distinct(
                F.when(F.col("active_day") == F.col("day"), F.col("user_id"))
            ).cast("long").alias("dau"),
        )
    )


@register("events_rolling_wau_hll", oracle=None,
          description="rolling 7-day users via mergeable daily HLL sketches (rows-only; "
                      "accuracy pytest-bounded vs the exact query)")
def events_rolling_wau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path `events_rolling_wau` points at: ONE pass builds a
    daily HLL sketch of user ids (mergeable state, O(sketch) per day),
    then each day's sketch fans out to the ≤7 report days it covers and
    `hll_union_agg` merges 7 sketches per day — the fact table is read
    once regardless of window length, versus the exact query's 7×
    amplification of the deduped day-user relation. Rows-only by design
    (DuckDB's HLL is a different algorithm); pytest bounds the estimate
    within 5% of the exact WAU at sf0.01
    (tests/test_plans.py::test_rolling_wau_hll_accuracy_vs_exact).
    """
    t = load_tables(spark, sf_dir)
    daily = (
        t["events"]
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id", F.lit(14)).alias("user_sketch"))
    )
    days = daily.select("day")
    contrib = daily.select(
        "user_sketch",
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 6 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    return (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("user_sketch"))
            .cast("long").alias("wau_approx")
        )
    )


# ---------------------------------------------------------------------------
# market-basket co-occurrence with lift
# ---------------------------------------------------------------------------

_COOC_ORACLE = """
WITH basket AS (
  SELECT DISTINCT user_id, event_type FROM events WHERE event_type IS NOT NULL
),
singles AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c FROM basket GROUP BY event_type
),
n_users AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM basket
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM basket a JOIN basket b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY type_a, type_b
)
SELECT p.type_a, p.type_b, p.c_ab,
       CAST((10000 * p.c_ab) // n.n AS BIGINT) AS support_bp,
       CAST((10000 * n.n * p.c_ab) // (sa.c * sb.c) AS BIGINT) AS lift_bp
FROM pairs p
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b
CROSS JOIN n_users n
"""


@register("events_type_cooccurrence", oracle=_COOC_ORACLE,
          description="market-basket co-occurrence: support and lift per event-type pair")
def events_type_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over user baskets: which event types co-occur
    beyond chance (lift = N·c_ab / (c_a·c_b), floored basis points —
    exact integer arithmetic; >10000 bp means positive association).

    Shape: the fact stream dedupes to the (user, type) basket relation
    first — at most |users|·|types| rows — and the pair join is keyed
    on user (hash join, bounded fan-out: ≤ |types|² pairs per user).
    Type marginals and the user count are |types|-and-1-row broadcasts.
    The full Apriori generalization replaces `event_type` with an
    itemset column; one level is what a pairwise affinity report needs.
    """
    t = load_tables(spark, sf_dir)
    basket = (
        t["events"].where(F.col("event_type").isNotNull())
        .select("user_id", "event_type").distinct()
    )
    singles = basket.groupBy("event_type").agg(F.count("*").cast("long").alias("c"))
    n_users = basket.agg(F.count_distinct("user_id").cast("long").alias("n"))
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("c_ab"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("c").alias("c_a"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("c").alias("c_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a", "type_b", "c_ab",
            F.expr("CAST((10000 * c_ab) div n AS BIGINT)").alias("support_bp"),
            F.expr("CAST((10000 * n * c_ab) div (c_a * c_b) AS BIGINT)").alias("lift_bp"),
        )
    )


# ---------------------------------------------------------------------------
# session-level stats: entry/exit types, duration, bounce rate
# ---------------------------------------------------------------------------

_SESSION_STATS_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM seq
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, session_id
                            ORDER BY ts, event_id) AS rn_first,
         row_number() OVER (PARTITION BY user_id, session_id
                            ORDER BY ts DESC, event_id DESC) AS rn_last
  FROM sess
),
per_session AS (
  SELECT user_id, session_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) // 1000000 AS duration_sec,
         MIN(CASE WHEN rn_first = 1 THEN event_type END) AS entry_type,
         MIN(CASE WHEN rn_last = 1 THEN event_type END) AS exit_type
  FROM ranked GROUP BY user_id, session_id
)
SELECT entry_type,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST((10000 * SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
         AS bounce_bp,
       CAST(SUM(duration_sec) // COUNT(*) AS BIGINT) AS avg_duration_sec,
       CAST(SUM(n_events) AS BIGINT) AS total_events
FROM per_session
GROUP BY entry_type
"""


@register("events_session_stats", oracle=_SESSION_STATS_ORACLE, bench=True,
          description="session-level analytics: entry type, bounce rate, duration")
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-analytics session rollup on top of the engine's `sessionize`
    operator (30-min gap): per (user, session) the entry/exit event,
    single-event bounce flag, and duration; aggregated per entry type
    with floored-basis-point bounce rates and integer-division average
    durations. Entry/exit come from min/max over (ts, event_id, type)
    structs — struct ordering IS argmin/argmax with the deterministic
    tiebreaker built in (the oracle uses first/last row_number flags:
    DuckDB's min_by has no composite-key overload). Everything reuses sessionize's one user-keyed
    shuffle; the final rollup is |types|-sized.
    """
    from ..operators.windows import sessionize

    t = load_tables(spark, sf_dir)
    ev = t["events"].select("user_id", "ts", "event_id", "event_type")
    sess = sessionize(ev, user_col="user_id", ts_col="ts", gap_minutes=30)
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        ((F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / F.lit(1000000))
        .cast("long").alias("duration_sec"),
        F.min(F.struct("ts", "event_id", "event_type"))["event_type"].alias("entry_type"),
        F.max(F.struct("ts", "event_id", "event_type"))["event_type"].alias("exit_type"),
    )
    return per_session.groupBy("entry_type").agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.expr(
            "CAST((10000 * sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END))"
            " div count(*) AS BIGINT)"
        ).alias("bounce_bp"),
        F.expr("CAST(sum(duration_sec) div count(*) AS BIGINT)").alias("avg_duration_sec"),
        F.sum("n_events").cast("long").alias("total_events"),
    )


# ---------------------------------------------------------------------------
# generic N-step ordered funnel
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ("signup", "click", "purchase")

_NSTEP_ORACLE = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT 1 AS step, '{_FUNNEL_STEPS[0]}' AS event_type,
       CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 2, '{_FUNNEL_STEPS[1]}', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
UNION ALL
SELECT 3, '{_FUNNEL_STEPS[2]}', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
"""


@register("events_nstep_funnel", oracle=_NSTEP_ORACLE,
          description="generic ordered N-step funnel (strictly increasing timestamps)")
def events_nstep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel over an arbitrary step list: a user reaches step
    k only via an event of type k STRICTLY AFTER their step-(k−1)
    completion time (earliest-completion semantics, the standard
    product-analytics definition — events_conversion_funnel is the
    windowed 2-step special case).

    Shape: one pass per step — each stage is a semi-join of the fact
    scan against the previous stage's per-user completion table
    (user-keyed hash join; the completion tables only shrink). N
    stages = N joins, not a per-user Python loop; at 100 TB each stage
    is a broadcast once the funnel narrows.
    """
    t = load_tables(spark, sf_dir)
    ev = t["events"]

    def stage_count(df, step_no, step_name):
        return df.agg(
            F.lit(step_no).cast("int").alias("step"),
            F.lit(step_name).alias("event_type"),
            F.count("*").cast("long").alias("n_users"),
        )

    prev = (
        ev.where(F.col("event_type") == _FUNNEL_STEPS[0])
        .groupBy("user_id").agg(F.min("ts").alias("t"))
    )
    out = stage_count(prev, 1, _FUNNEL_STEPS[0])
    for i, step in enumerate(_FUNNEL_STEPS[1:], start=2):
        prev = (
            ev.where(F.col("event_type") == step)
            .join(prev, "user_id")
            .where(F.col("ts") > F.col("t"))
            .groupBy("user_id").agg(F.min("ts").alias("t"))
        )
        out = out.unionByName(stage_count(prev, i, step))
    # ONE lazy plan: all stage counts in a single job (Catalyst reuses
    # the shared stage subplans), no driver-side count() per step
    return out


# ---------------------------------------------------------------------------
# MAD-based robust outliers (rank-exact medians)
# ---------------------------------------------------------------------------

_MAD_TOPK = 50

_MAD_ORACLE = f"""
WITH base AS (
  SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
r1 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM base
),
med AS (
  SELECT event_type, MIN(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS med_cents
  FROM r1 GROUP BY event_type
),
dev AS (
  SELECT b.event_id, b.event_type, b.cents, m.med_cents,
         abs(b.cents - m.med_cents) AS adev
  FROM base b JOIN med m USING (event_type)
),
r2 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type, MIN(CASE WHEN rn = (n + 1) // 2 THEN adev END) AS mad_cents
  FROM r2 GROUP BY event_type
)
SELECT d.event_id, d.event_type, d.cents, d.med_cents, m.mad_cents,
       round((d.cents - d.med_cents) / (1.4826 * greatest(m.mad_cents, 1)), 6) AS robust_z
FROM dev d JOIN mad m USING (event_type)
ORDER BY abs(round((d.cents - d.med_cents) / (1.4826 * greatest(m.mad_cents, 1)), 6)) DESC,
         d.event_id ASC
LIMIT {_MAD_TOPK}
"""


@register("events_mad_outliers", oracle=_MAD_ORACLE,
          description="robust outliers: MAD-normalized deviation from the rank-exact median")
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier ranking — the robust alternative to
    mean/stddev z-scores (one wild value can't drag its own
    threshold). Medians are RANK-EXACT (lower-middle element via
    row_number with an event_id tiebreaker — approx_percentile is
    neither deterministic nor cross-engine), so the whole pipeline is
    integer until the single final normalized quotient. Two rank
    passes + two |types|-sized broadcast joins + TakeOrdered.

    100 TB shape: both medians ride `distributed_rank_in_groups` — the
    range partitioner splits on (event_type, value, event_id), so one
    heavy type's data sorts across MANY tasks in parallel (the plain
    partitionBy(event_type) window this replaced sorted each type in
    ONE task: 5.0x wall at 16x data in the round-7 probe). Exact same
    medians; the sketch twin `events_sketch_profile` (HLL + GK,
    one-pass, +/-5% pytest-bounded) remains the cheaper option.
    """
    from ..operators.windows import distributed_rank_in_groups

    t = load_tables(spark, sf_dir)
    base = t["events"].where(F.col("value").isNotNull()).select(
        "event_id", "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )

    def _median_of(df, col, out):
        ranked = distributed_rank_in_groups(
            df.select("event_type", "event_id", col),
            ["event_type"],
            [F.col(col).asc(), F.col("event_id").asc()],
            rank_name="rn", total_name="n",
        )
        return ranked.groupBy("event_type").agg(
            F.min(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col(col))
            ).alias(out)
        )

    med = _median_of(base, "cents", "med_cents")
    dev = base.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("cents") - F.col("med_cents"))
    )
    mad = _median_of(dev, "adev", "mad_cents")
    z = F.round(
        (F.col("cents") - F.col("med_cents"))
        / (1.4826 * F.greatest(F.col("mad_cents"), F.lit(1))),
        6,
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select("event_id", "event_type", "cents", "med_cents", "mad_cents", z.alias("robust_z"))
        .orderBy(F.abs(F.col("robust_z")).desc(), F.col("event_id").asc())
        .limit(_MAD_TOPK)
    )


# ---------------------------------------------------------------------------
# A/B experiment readout: md5-coin assignment + two-proportion z-test
# ---------------------------------------------------------------------------

_AB_ORACLE = """
WITH assigned AS (
  SELECT user_id,
         CASE WHEN CAST(('0x' || substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
arms AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_converted
  FROM assigned GROUP BY arm
),
wide AS (
  SELECT
    MAX(CASE WHEN arm = 'A' THEN n_users END) AS na,
    MAX(CASE WHEN arm = 'A' THEN n_converted END) AS ca,
    MAX(CASE WHEN arm = 'B' THEN n_users END) AS nb,
    MAX(CASE WHEN arm = 'B' THEN n_converted END) AS cb
  FROM arms
)
SELECT na, ca, nb, cb,
       CAST((10000 * ca) // na AS BIGINT) AS rate_a_bp,
       CAST((10000 * cb) // nb AS BIGINT) AS rate_b_bp,
       round((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
             / sqrt(greatest(
                 (CAST(ca + cb AS DOUBLE) / (na + nb))
                 * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                 * (1.0 / na + 1.0 / nb), 1e-12)), 6) AS z_stat
FROM wide
"""


@register("events_ab_test_readout", oracle=_AB_ORACLE,
          description="A/B readout: deterministic md5 arm assignment + two-proportion z-test")
def events_ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis end-to-end: users are deterministically
    assigned to arms by a salted md5 coin (the same seedless split the
    training layer uses — re-runs and late events land in the same
    arm), conversion = any purchase, and the readout is the standard
    pooled two-proportion z statistic. Counts are exact integers; the
    z expression is the single final double (identical on both
    engines). One user-keyed aggregate + a 2-row pivot.
    """
    t = load_tables(spark, sf_dir)
    coin = F.conv(
        F.substring(F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    assigned = (
        t["events"]
        .groupBy("user_id")
        .agg(F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted"))
        .withColumn("arm", F.when(coin % 2 == 0, "A").otherwise("B"))
    )
    arms = assigned.groupBy("arm").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("n_converted"))).alias("ca"),
        F.max(F.when(F.col("arm") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("n_converted"))).alias("cb"),
    )
    na, ca, nb, cb = (F.col(c).cast("double") for c in ("na", "ca", "nb", "cb"))
    pooled = (ca + cb) / (na + nb)
    z = (ca / na - cb / nb) / F.sqrt(
        F.greatest(pooled * (1.0 - pooled) * (1.0 / na + 1.0 / nb), F.lit(1e-12))
    )
    return wide.select(
        "na", "ca", "nb", "cb",
        F.expr("CAST((10000 * ca) div na AS BIGINT)").alias("rate_a_bp"),
        F.expr("CAST((10000 * cb) div nb AS BIGINT)").alias("rate_b_bp"),
        F.round(z, 6).alias("z_stat"),
    )


# ---------------------------------------------------------------------------
# Benford's-law first-digit audit
# ---------------------------------------------------------------------------

_BENFORD_ORACLE = """
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM events
  WHERE value IS NOT NULL AND CAST(round(value * 100) AS BIGINT) >= 1
),
counts AS (
  SELECT d, CAST(COUNT(*) AS BIGINT) AS observed FROM digits GROUP BY d
),
tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM counts)
SELECT c.d AS digit, c.observed,
       round(t.n * log10(1.0 + 1.0 / c.d), 2) AS expected,
       round((c.observed - t.n * log10(1.0 + 1.0 / c.d))
             * (c.observed - t.n * log10(1.0 + 1.0 / c.d))
             / (t.n * log10(1.0 + 1.0 / c.d)), 6) AS chi2_term
FROM counts c CROSS JOIN tot t
"""


@register("events_benford_audit", oracle=_BENFORD_ORACLE,
          description="Benford's-law first-digit audit of the value column")
def events_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraud/quality screening: the leading-digit distribution of the
    value measure against Benford's law, with per-digit chi-square
    terms (sum them against the chi²₈ critical value downstream;
    synthetic uniform data FAILS loudly — which is itself the point of
    the audit: it detects non-natural generation processes). Digit
    extraction is pure string arithmetic on exact integer cents; the
    expectation is the only double. One hash aggregate on ≤9 keys.
    """
    t = load_tables(spark, sf_dir)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    digits = (
        t["events"]
        .where(F.col("value").isNotNull() & (cents >= 1))
        .select(F.substring(cents.cast("string"), 1, 1).cast("long").alias("d"))
    )
    counts = digits.groupBy("d").agg(F.count("*").cast("long").alias("observed"))
    tot = counts.agg(F.sum("observed").cast("long").alias("n"))
    expected = F.col("n") * F.log10(1.0 + 1.0 / F.col("d"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("digit"),
            "observed",
            F.round(expected, 2).alias("expected"),
            F.round((F.col("observed") - expected) * (F.col("observed") - expected) / expected, 6)
            .alias("chi2_term"),
        )
    )


# ---------------------------------------------------------------------------
# inter-arrival time profile per event type
# ---------------------------------------------------------------------------

_IAT_ORACLE = """
WITH seq AS (
  SELECT event_type,
         CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id))
              AS BIGINT) // 1000000 AS gap_sec
  FROM events
),
gaps AS (SELECT event_type, gap_sec FROM seq WHERE gap_sec IS NOT NULL),
ranked AS (
  SELECT event_type, gap_sec,
         row_number() OVER (PARTITION BY event_type ORDER BY gap_sec) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM gaps
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_gaps,
       CAST(MIN(gap_sec) AS BIGINT) AS min_sec,
       CAST(MAX(gap_sec) AS BIGINT) AS max_sec,
       CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN gap_sec END) AS BIGINT) AS p50_sec,
       CAST(MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_sec END) AS BIGINT) AS p90_sec
FROM ranked GROUP BY event_type
"""


@register("events_inter_arrival_stats", oracle=_IAT_ORACLE,
          description="inter-arrival time profile per event type (rank-exact p50/p90)")
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-process profile: consecutive-event gaps per type with
    rank-exact median and p90 (row_number at the floored rank position
    — deterministic and cross-engine, where approx_percentile is
    neither). Gaps are integer seconds from epoch-micros differences.

    100 TB shape: the consecutive-event delta rides `distributed_lag`
    and the percentile rank rides `distributed_rank_in_groups` — both
    range-partition on the composite (event_type, order) key, so one
    heavy type's data sorts across MANY tasks in parallel (the plain
    partitionBy(event_type) windows this replaced sorted each type in
    ONE task: 5.0x wall at 16x data in the round-7 probe). Exact same
    gaps and ranks; the sketch twin `events_sketch_profile` (HLL + GK,
    one-pass, +/-5% pytest-bounded) remains the cheaper option.
    """
    from ..operators.windows import distributed_lag, distributed_rank_in_groups

    t = load_tables(spark, sf_dir)
    lagged = distributed_lag(
        t["events"].select("event_type", "event_id", "ts"),
        ["event_type"], [F.col("ts"), F.col("event_id")], "ts",
        lag_name="prev_ts",
    )
    gaps = (
        lagged
        .select(
            "event_type",
            ((F.unix_micros("ts") - F.unix_micros("prev_ts")) / F.lit(1000000))
            .cast("long").alias("gap_sec"),
        )
        .where(F.col("gap_sec").isNotNull())
    )
    ranked = distributed_rank_in_groups(
        gaps, ["event_type"], [F.col("gap_sec").asc()],
        rank_name="rn", total_name="n",
    ).select("event_type", "gap_sec", "rn", "n")
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_gaps"),
        F.min("gap_sec").cast("long").alias("min_sec"),
        F.max("gap_sec").cast("long").alias("max_sec"),
        F.min(F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("gap_sec")))
        .cast("long").alias("p50_sec"),
        F.min(F.when(F.col("rn") == F.expr("(9 * n + 9) div 10"), F.col("gap_sec")))
        .cast("long").alias("p90_sec"),
    )


# ---------------------------------------------------------------------------
# decile lift chart (score = engagement, outcome = purchase)
# ---------------------------------------------------------------------------

_LIFT_ORACLE = """
WITH users AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
scored AS (
  SELECT *, CAST(ntile(10) OVER (ORDER BY n_events DESC, user_id) AS BIGINT) AS decile
  FROM users
),
per_decile AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_converted
  FROM scored GROUP BY decile
),
tot AS (
  SELECT CAST(SUM(n_users) AS BIGINT) AS tu, CAST(SUM(n_converted) AS BIGINT) AS tc
  FROM per_decile
),
cum AS (
  SELECT decile, n_users, n_converted,
         SUM(n_users) OVER (ORDER BY decile) AS cum_users,
         SUM(n_converted) OVER (ORDER BY decile) AS cum_converted
  FROM per_decile
)
SELECT c.decile, c.n_users, c.n_converted,
       CAST((10000 * c.n_converted) // c.n_users AS BIGINT) AS rate_bp,
       CAST((10000 * c.cum_converted * t.tu) // (c.cum_users * t.tc) AS BIGINT)
         AS cum_lift_bp
FROM cum c CROSS JOIN tot t
"""


@register("events_decile_lift", oracle=_LIFT_ORACLE,
          description="decile lift chart: engagement-ranked users vs conversion (model-eval shape)")
def events_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-evaluation lift table, computed relationally: users
    ranked by a score (here: event count — swap in any model score
    column) into deciles, per-decile conversion and CUMULATIVE lift vs
    the base rate (10000 bp = no better than random targeting).

    The decile assignment is :func:`distributed_ntile` (VERDICT r4
    item 1): range-partition on the full ordering, local row_number +
    broadcast per-partition offsets, closed-form rank→tile — the
    per-user relation is fact-cardinality at 10⁹ users, so a bare
    global ``ntile`` window (the previous form) would funnel it
    through one task. Tiebreaker user_id keeps it deterministic;
    rates and lift are floored-bp integer arithmetic; the per-decile
    relation is 10 rows, so the cumulative window and the 1-row
    totals broadcast are free.
    """
    from sm_etl_cloud_run_spark.operators.windows import distributed_ntile

    t = load_tables(spark, sf_dir)
    users = t["events"].groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted"),
    )
    scored = distributed_ntile(
        users,
        [F.col("n_events").desc(), F.col("user_id").asc()],
        10,
        tile_name="decile",
    )
    per_decile = scored.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
    )
    tot = per_decile.agg(
        F.sum("n_users").cast("long").alias("tu"),
        F.sum("n_converted").cast("long").alias("tc"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_decile.select(
        "decile", "n_users", "n_converted",
        F.sum("n_users").over(wc).alias("cum_users"),
        F.sum("n_converted").over(wc).alias("cum_converted"),
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        "decile", "n_users", "n_converted",
        F.expr("CAST((10000 * n_converted) div n_users AS BIGINT)").alias("rate_bp"),
        F.expr(
            "CAST((10000 * cum_converted * tu) div (cum_users * tc) AS BIGINT)"
        ).alias("cum_lift_bp"),
    )


# ---------------------------------------------------------------------------
# DAU/MAU stickiness (rolling 28-day engagement ratio)
# ---------------------------------------------------------------------------

_STICKY_ORACLE = """
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM du),
m AS (
  SELECT d.day,
         CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS mau,
         CAST(COUNT(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END) AS BIGINT) AS dau
  FROM days d
  JOIN du u ON u.day > d.day - INTERVAL 28 DAY AND u.day <= d.day
  GROUP BY d.day
)
SELECT day, dau, mau,
       CAST(10000 * dau // mau AS BIGINT) AS stickiness_bp
FROM m
"""


@register("events_dau_mau_stickiness", oracle=_STICKY_ORACLE,
          description="DAU/MAU stickiness per day: rolling 28-day distinct "
                      "users vs daily actives, exact bp")
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engagement ratio product teams steer by (DAU/MAU — what
    fraction of the monthly audience shows up on a given day), exact:
    dedupe the fact stream to (day, user), fan each row out to the ≤28
    report days it covers (bounded explode + broadcast day-grid
    equi-join — the events_rolling_wau pattern; a literal range join
    plans as a nested loop), one distinct-count per day, stickiness in
    integer bp (mau ≥ dau ≥ 0 and mau ≥ 1 for observed days, so DIV is
    floor-safe).

    Shape at 100 TB: the amplification is 28 × |deduped day-user| —
    active-user-scale, not corpus-scale; the sketch alternative
    (events_rolling_wau_hll's mergeable daily HLLs) is the same
    trade documented there. One distinct-agg shuffle, one broadcast.
    """
    t = load_tables(spark, sf_dir)
    du = (
        t["events"]
        .select(F.date_trunc("day", "ts").alias("day"), "user_id")
        .distinct()
    )
    days = du.select("day").distinct()
    contrib = du.select(
        "user_id",
        F.col("day").alias("active_day"),
        F.explode(
            F.sequence(
                F.col("day"),
                F.col("day") + F.expr("INTERVAL 27 DAYS"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day"),
    )
    return (
        contrib.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(
            F.count_distinct("user_id").cast("long").alias("mau"),
            F.count_distinct(
                F.when(F.col("active_day") == F.col("day"), F.col("user_id"))
            ).cast("long").alias("dau"),
        )
        .select(
            "day", "dau", "mau",
            F.expr("CAST(10000 * dau DIV mau AS BIGINT)").alias("stickiness_bp"),
        )
    )
