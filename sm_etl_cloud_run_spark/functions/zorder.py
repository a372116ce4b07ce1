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
whole-stage-codegen; the normalization is an affine map quantized by a
power-of-two SHIFT instead of a division: (v - min) * (2^bits - 1) is
right-shifted by ceil(log2(span)) (pre-downshifting the offset when
span·2^bits would not fit in 63 bits). Pure shifts and multiplies are
exact in BIGINT on every engine — no double-precision Divide whose
rounding could differ across engines above 2^53, and no silent BIGINT
overflow for wide spans (a span ≥ 2^62 is rejected explicitly). The
slope is within 2× of the classic /span map, costing at most one bit
of resolution — irrelevant for file-level min/max pruning.
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
    if span >= (1 << 62):
        raise ValueError(
            f"span {span} >= 2^62: (v - vmin) itself risks BIGINT "
            "overflow; pre-bucket the column before Z-ordering"
        )
    top = (1 << bits) - 1
    c = F.col(col) if isinstance(col, str) else col
    clamped = F.greatest(F.lit(vmin), F.least(F.lit(vmax), c.cast("long")))
    offset = clamped - F.lit(vmin)
    # Quantize by shift: offset < 2^k, so (offset * top) >> k lands in
    # [0, top]. When k + bits > 62 the product could overflow BIGINT —
    # drop s low bits of the offset first; the result is the same map
    # at s fewer bits of input resolution, still exact and monotone.
    k = span.bit_length()
    s = max(0, k + bits - 62)
    if s:
        offset = F.shiftright(offset, s)
    return F.shiftright(offset * F.lit(top), k - s).cast("long")


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
