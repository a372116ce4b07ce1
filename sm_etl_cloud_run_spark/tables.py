"""Testdata catalog: load the driver's parquet tables and register views.

The driver provides TPC-H-ish synthetic tables (see /root/repo/TESTDATA.md):
facts ``lineitem``/``orders``/``events`` stand in for the reference's
PA/AIH/RAAS fact files, the small dims for its `unidades_geograficas`/`ufs`/
panel config tables, and ``documents``/``embeddings`` back the LLM-pipeline
operators.

Reads are plain ``spark.read.parquet`` — Catalyst gets predicate pushdown
and column pruning on every scan; nothing is cached or collected here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import apply_session_conventions

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


_CATALOG_CACHE: dict[tuple[int, str], dict[str, DataFrame]] = {}


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every testdata table as a DataFrame and register temp views.

    Also (re-)applies the engine's session conventions, because query
    callables may be invoked on a driver-owned session.

    The (session, dir) catalog is memoized — re-resolving 10 parquet
    schemas per query call costs ~0.5 s of pure overhead otherwise. The
    cached DataFrames are immutable logical plans; views are re-registered
    on every call so callers can rely on them.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    apply_session_conventions(spark)
    cache_key = (id(spark), sf_dir)
    cached = _CATALOG_CACHE.get(cache_key)
    if cached is not None:
        for name, df in cached.items():
            df.createOrReplaceTempView(name)
        return dict(cached)
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        # Encoding-agnostic timestamp normalization: the driver has shipped
        # the same logical column as TIMESTAMP(NANOS) (arriving as a
        # nano-long under `nanosAsLong`), as TIMESTAMP_NTZ (plain
        # timestamp[us] parquet), and could ship TIMESTAMP_LTZ. Pin ONE
        # canonical type — TimestampType — so no query ever sees a physical
        # encoding change (round-3 postmortem: a regenerated events.parquet
        # flipped nanos→µs and broke sessionize's cast). NTZ→LTZ goes
        # through the session timezone, which the engine pins to UTC
        # (session.py), so wall-clock values are preserved and DuckDB
        # oracle parity holds.
        for col_name in _TS_COLUMNS.get(name, ()):
            dtype = df.schema[col_name].dataType
            if isinstance(dtype, T.LongType):
                # TIMESTAMP(NANOS) read as nano-long; sub-µs truncated,
                # matching DuckDB's ns→µs behavior.
                df = df.withColumn(
                    col_name, F.timestamp_micros(F.expr(f"`{col_name}` div 1000"))
                )
            elif isinstance(dtype, (T.TimestampNTZType, T.DateType)):
                # DATE would surface as python `date` objects while the
                # DuckDB oracle's pandas conversion yields datetime64 —
                # a guaranteed driver hash mismatch. Same UTC-pinned
                # wall-clock value either way.
                df = df.withColumn(col_name, F.col(col_name).cast(T.TimestampType()))
        # Hostile-row contracts (see plans/registry._contract_oracle —
        # the oracles read through the same normalization): NULL text
        # is an empty document; a NULL-ts event is not an event.
        if name == "documents":
            # NULL text is an empty document; a document without an id
            # is not addressable (doc_id feeds rank orderings and md5
            # coins where Spark/DuckDB NULL ordering diverges). Each
            # normalization guarded by its own column's presence.
            if "text" in df.columns:
                df = df.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
            if "doc_id" in df.columns:
                df = df.where(F.col("doc_id").isNotNull())
        if name == "events":
            # A row with no timestamp is not an event, and a row with no
            # event_id is not addressable (event_id is the conversion key
            # in the attribution family and the dedup key in CDC replay —
            # a NULL there would silently merge into one NULL partition).
            # Unlike the wide TPC-H facts, events is narrow enough that
            # the extra IsNotNull pulling event_id (int64) into every
            # scan's ReadSchema costs ~8 bytes/row — an accepted trade
            # for the load-time contract. event_id UNIQUENESS is NOT
            # enforced here (it would cost a fact-wide shuffle at load);
            # duplicates merge deterministically and identically on both
            # engines (pinned by the hostile duplicate-id fixture in
            # tests/test_encoding_chaos.py). Each filter is guarded by
            # ITS OWN column's presence (ADVICE r8): a source with ts
            # but no event_id must not fail at analysis time, and one
            # with event_id but no ts must still get the event_id
            # contract.
            if "ts" in df.columns:
                df = df.where(F.col("ts").isNotNull())
            if "event_id" in df.columns:
                df = df.where(F.col("event_id").isNotNull())
        if name == "embeddings":
            # a vector without an id or payload can be neither ranked
            # (seed selection is ORDER BY vec_id) nor scored. Per-column
            # presence guards, same defensive style as events.
            if "vec_id" in df.columns:
                df = df.where(F.col("vec_id").isNotNull())
            if "embedding" in df.columns:
                df = df.where(F.col("embedding").isNotNull())
        # A fact row without its DATE column is not a valid fact row —
        # it can't be period-joined, watermark-gated, or
        # retention-filtered (same contract as events.ts). Only the
        # date: an IsNotNull on any other column would enter every
        # scan's PushedFilters and drag that column into ReadSchema,
        # breaking column pruning for queries that never touch it.
        # Key/attribute/measure NULLs stay, and every decode/aggregate
        # must handle them with SQL semantics. Beyond semantics the
        # date filter is a determinism guard: a NULL in a window ORDER
        # BY key makes even the DuckDB oracle's parallel window
        # nondeterministic (observed: j4's lead() flipping across
        # connections on the same data).
        if name == "orders" and "o_orderdate" in df.columns:
            df = df.where(F.col("o_orderdate").isNotNull())
        if name == "lineitem" and "l_shipdate" in df.columns:
            df = df.where(F.col("l_shipdate").isNotNull())
        df.createOrReplaceTempView(name)
        out[name] = df
    _CATALOG_CACHE[cache_key] = dict(out)
    return out


# Timestamp columns normalized to canonical TimestampType regardless of the
# parquet physical encoding (nano-long / TIMESTAMP_NTZ / TIMESTAMP_LTZ /
# DATE). events.ts has already flipped encodings across driver
# regenerations (nanos → µs); the lineitem/orders date columns are listed
# so a future DATE regeneration can't flip their pandas rendering either
# (tests/test_encoding_chaos.py locks all of this in).
_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
}
