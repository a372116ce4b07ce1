"""MERGE-style upsert and retention delete over plain Parquet (K5, K6).

Reference K5 (etl/datasus_ftp_metadados.py:252-382): per row keyed on
`nome` — if the key exists and the FTP mtime differs, update the payload
columns; if it exists unchanged, touch only the metadata timestamp; else
insert. K6 (:294-304): per (tipo, sigla_uf) delete rows older than the
group's minimum incoming date.

Without Delta on the classpath, MERGE is emulated as
read-target → dedupe-source → anti-join/union → staged write → atomic
directory swap. The swap gives the all-or-nothing visibility the
reference gets from its single `sessao.commit()`. On a real deployment
this module is the seam where Delta/Iceberg `MERGE INTO` slots in.

Scale: the union/anti-join shuffles on the merge key once; the staged
rewrite touches only the table being merged (control tables here are
small — the big fact tables use partition overwrite, not MERGE).
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _atomic_replace(spark: SparkSession, df: DataFrame, path: str) -> None:
    """Write `df` to a staging dir, then swap it into `path` atomically
    (rename within the same filesystem)."""
    parent = os.path.dirname(os.path.abspath(path))
    os.makedirs(parent, exist_ok=True)
    staging = os.path.join(parent, f".staging-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    backup = path + f".old-{uuid.uuid4().hex}"
    if os.path.exists(path):
        os.rename(path, backup)
    os.rename(staging, path)
    if os.path.exists(backup):
        shutil.rmtree(backup, ignore_errors=True)


def dedupe_last_write(source: DataFrame, keys: Sequence[str], order_col: str) -> DataFrame:
    """Deterministic last-write-wins per key before merging (SURVEY §7.3:
    distributed MERGE needs a deduped source)."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return source.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def merge_upsert(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    keys: Sequence[str],
    *,
    update_condition=None,
    touch_cols: dict[str, object] | None = None,
    allow_schema_evolution: bool = False,
) -> None:
    """K5: upsert `source` into the parquet table at `target_path`.

    - new keys are inserted;
    - matched keys where `update_condition` (a Column over `src.*`/`tgt.*`
      prefixed frames) holds take the source row;
    - matched keys where it doesn't hold keep the target row with
      `touch_cols` applied (the reference's "touch only the ETL
      timestamp" branch).

    `allow_schema_evolution=True` is the MERGE ... WITH SCHEMA
    EVOLUTION behavior: columns only one side has are added to the
    other as typed NULLs (additive evolution only — no renames, no
    type changes), so an upstream that grew a column doesn't break the
    nightly merge. Default False: a schema mismatch should fail loudly
    unless evolution was opted into.
    """
    if not os.path.exists(target_path):
        _atomic_replace(spark, source, target_path)
        return
    target = spark.read.parquet(target_path)
    if allow_schema_evolution:
        for field in target.schema.fields:
            if field.name not in source.columns:
                source = source.withColumn(
                    field.name, F.lit(None).cast(field.dataType)
                )
        for field in source.schema.fields:
            if field.name not in target.columns:
                target = target.withColumn(
                    field.name, F.lit(None).cast(field.dataType)
                )
    src = source.alias("src")
    tgt = target.alias("tgt")
    key_cond = None
    for k in keys:
        term = F.col(f"src.{k}") == F.col(f"tgt.{k}")
        key_cond = term if key_cond is None else (key_cond & term)

    inserted = src.join(tgt, key_cond, "left_anti").select("src.*")
    unmatched_tgt = tgt.join(src, key_cond, "left_anti").select("tgt.*")
    matched = tgt.join(src, key_cond, "inner")

    # SQL MERGE keeps the target row when no WHEN MATCHED clause fires:
    # a NULL condition (e.g. either compared timestamp is NULL) must land
    # in `kept`, not vanish — coalesce the three-valued condition to
    # False so `cond` and `~cond` partition `matched` exhaustively.
    cond = update_condition if update_condition is not None else F.lit(True)
    cond = F.coalesce(cond, F.lit(False))
    updated = matched.where(cond).select("src.*")
    kept = matched.where(~cond).select("tgt.*")
    if touch_cols:
        kept = kept.withColumns({c: F.lit(v) if not hasattr(v, "_jc") else v for c, v in touch_cols.items()})

    merged = unmatched_tgt.unionByName(updated).unionByName(kept).unionByName(inserted)
    _atomic_replace(spark, merged, target_path)


def retention_delete(
    spark: SparkSession,
    incoming: DataFrame,
    target_path: str,
    group_cols: Sequence[str],
    date_col: str,
) -> None:
    """K6: per group present in `incoming`, drop target rows strictly
    older than the group's minimum incoming date.

    Broadcast the per-group thresholds (small) against the target and
    rewrite — groups absent from `incoming` are untouched.
    """
    if not os.path.exists(target_path):
        return
    thresholds = incoming.groupBy(*group_cols).agg(F.min(date_col).alias("__min_d"))
    target = spark.read.parquet(target_path)
    joined = target.join(F.broadcast(thresholds), list(group_cols), "left")
    kept = joined.where(F.col("__min_d").isNull() | (F.col(date_col) >= F.col("__min_d"))).drop("__min_d")
    _atomic_replace(spark, kept, target_path)


def forget_entity(
    spark: SparkSession,
    table_keys: dict[str, Sequence[str]],
    subject_ids: DataFrame,
    *,
    audit: bool = True,
) -> dict[str, int]:
    """Right-to-be-forgotten purge: remove every row belonging to the
    subject ids from each parquet table, via staged rewrite + atomic
    swap (the engine's standard idempotent sink move — re-running a
    purge is a no-op).

    `table_keys` maps table path → the key column(s) identifying the
    subject in that table; `subject_ids` is a 1-column DataFrame of ids
    (broadcast — erasure requests are human-scale). Returns per-table
    removed-row counts when `audit=True` (erasure regulations require
    evidence of completion); pass audit=False to skip the extra count
    per table. Tombstoned CDC snapshots and SCD2 histories must list
    their underlying paths here too — forgetting only the current
    snapshot is not erasure.
    """
    id_col = subject_ids.columns[0]
    removed: dict[str, int] = {}
    for path, keys in table_keys.items():
        if not os.path.exists(path):
            removed[path] = 0
            continue
        tbl = spark.read.parquet(path)
        # chained anti-joins = remove a row when ANY listed key column
        # matches a subject id
        kept = tbl
        for k in keys:
            kept = kept.join(
                F.broadcast(subject_ids.select(F.col(id_col).alias(k))),
                on=k, how="left_anti",
            )
        if audit:
            before = tbl.count()
            after = kept.count()
            removed[path] = before - after
        _atomic_replace(spark, kept, path)
    return removed
