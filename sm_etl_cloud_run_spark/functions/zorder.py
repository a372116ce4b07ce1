"""Z-order (Morton) clustering key for multi-column scan pruning.

A single-column range sort (tools/storage_probe.py's measured layout)
gives perfect min/max pruning on ONE predicate column and none on the
others. Interleaving the bits of two normalized keys yields a total
order whose prefix ranges are axis-aligned rectangles in (a, b) space —
files sorted by the Z-value carry tight per-file min/max envelopes on
BOTH columns, so parquet row-group/file skipping works for filters on
either (or both) dimensions. This is the layout Delta/Iceberg expose as
OPTIMIZE ZORDER BY; here it is a plain codegen'd column expression plus
the engine's existing range-sorted writer.

Everything is integer bit arithmetic in BIGINT — no UDF, fully
whole-stage-codegen; the normalization is the classic
(v - min) * (2^bits - 1) / (max - min) affine map with floored integer
division, so two engines (or two runs) place every row identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalize_to_bits(col: Column, vmin: int, vmax: int, bits: int) -> Column:
    """Affine-map an integral column from [vmin, vmax] onto
    [0, 2^bits - 1] with floored integer arithmetic (constant bounds —
    compute them in one tiny agg before writing; a stale-but-covering
    envelope only loosens pruning, never breaks correctness)."""
    if vmax <= vmin:
        return F.lit(0).cast("long")
    span = vmax - vmin
    top = (1 << bits) - 1
    c = F.col(col) if isinstance(col, str) else col
    clamped = F.greatest(F.lit(vmin), F.least(F.lit(vmax), c.cast("long")))
    return ((clamped - F.lit(vmin)) * F.lit(top) / F.lit(span)).cast("long")


def zorder_key(a_norm: Column, b_norm: Column, *, bits: int = 16) -> Column:
    """Morton-interleave two `bits`-wide normalized keys into one
    BIGINT Z-value (a in even positions, b in odd). 2·bits ≤ 62 keeps
    the result positive in BIGINT."""
    if bits < 1 or 2 * bits > 62:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(a_norm, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(b_norm, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    bits: int = 16,
    num_files: int = 8,
) -> None:
    """Write `df` as parquet clustered by the Z-order of (col_a, col_b).

    One tiny bounds aggregate, then the engine's sorted-export shape
    (repartitionByRange + sortWithinPartitions on the Z-value — the
    TeraSort layout `test_sorted_export_uses_range_partitioning`
    validates): N files whose Z-ranges don't overlap, each covering a
    tight rectangle in (a, b). The Z column itself is dropped from the
    files — it is a layout device, not data.
    """
    bounds = df.agg(
        F.min(col_a).alias("amin"), F.max(col_a).alias("amax"),
        F.min(col_b).alias("bmin"), F.max(col_b).alias("bmax"),
    ).collect()[0]
    z = zorder_key(
        normalize_to_bits(F.col(col_a), int(bounds["amin"]), int(bounds["amax"]), bits),
        normalize_to_bits(F.col(col_b), int(bounds["bmin"]), int(bounds["bmax"]), bits),
        bits=bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
