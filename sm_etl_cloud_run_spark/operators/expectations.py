"""Declarative data-quality expectations — a Deequ-style constraint
runner (extends the reference's A4 null-count validators,
operators/aggregates.py, from hardcoded checks to a declarative suite).

A suite of expectations compiles into ONE aggregate pass over the
table — never one job per check. At 100 TB that is the difference
between a usable quality gate (one scan, map-side-combined partial
aggregates, a parameter-sized report) and an overnight job (N scans).
The report is long-format (one row per check) so it can be sunk,
diffed across runs, and alerted on.

Determinism for oracle parity: observations are exact integers —
violation COUNTs, or basis points via integer division — never float
ratios; the uniqueness key uses per-column NULL sentinels so both
engines hash the same composite string.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NULL_SENTINEL = "∅"   # ∅ — coalesce marker for composite keys


@dataclass(frozen=True)
class Expectation:
    """One declarative check.

    kind:
    - ``not_null``: observed = NULL count in `column`; passes at ≤ threshold.
    - ``unique``: observed = duplicate row count over `columns`; ≤ threshold.
    - ``in_range``: observed = count outside [lo, hi] (NULLs don't count —
      pair with not_null to forbid them); ≤ threshold.
    - ``accepted_values``: observed = count of non-NULL values outside
      `values`; ≤ threshold.
    - ``completeness_bp``: observed = non-NULL basis points of `column`
      (integer division); passes at ≥ threshold.
    - ``regex_violations``: observed = count of non-NULL values NOT
      matching `pattern`; ≤ threshold.
    """

    check_id: str
    kind: str
    column: str = ""
    columns: tuple[str, ...] = ()
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    pattern: str = ""
    threshold: int = 0

    def _observed(self) -> Column:
        c = F.col(self.column) if self.column else None
        if self.kind == "not_null":
            return F.count(F.lit(1)) - F.count(c)
        if self.kind == "unique":
            key = F.concat_ws(
                "|", *[
                    F.coalesce(F.col(k).cast("string"), F.lit(_NULL_SENTINEL))
                    for k in self.columns
                ]
            )
            return F.count(F.lit(1)) - F.countDistinct(key)
        if self.kind == "in_range":
            return F.count(F.when((c < F.lit(self.lo)) | (c > F.lit(self.hi)), 1))
        if self.kind == "accepted_values":
            return F.count(F.when(c.isNotNull() & ~c.isin(*self.values), 1))
        if self.kind == "completeness_bp":
            return F.expr(f"(10000 * count({self.column})) DIV count(1)")
        if self.kind == "regex_violations":
            return F.count(F.when(c.isNotNull() & ~c.rlike(self.pattern), 1))
        raise ValueError(f"unknown expectation kind: {self.kind}")

    def _passed(self, observed: Column) -> Column:
        if self.kind == "completeness_bp":
            return observed >= F.lit(self.threshold)
        return observed <= F.lit(self.threshold)


def run_expectations(df: DataFrame, suite: list[Expectation]) -> DataFrame:
    """Evaluate a suite in ONE aggregate pass.

    Returns (check_id, kind, col_name, observed, threshold, passed) —
    one row per expectation. The plan is a single hash aggregate over
    the input (all observations are ordinary aggregate expressions,
    combined map-side) followed by an explode of the parameter-sized
    report — no per-check scan, no driver-side loop over data.
    """
    aggs = [
        e._observed().cast("long").alias(f"__obs_{i}") for i, e in enumerate(suite)
    ]
    one = df.agg(*aggs)
    rows = [
        F.struct(
            F.lit(e.check_id).alias("check_id"),
            F.lit(e.kind).alias("kind"),
            F.lit(e.column or "|".join(e.columns)).alias("col_name"),
            F.col(f"__obs_{i}").alias("observed"),
            F.lit(e.threshold).cast("long").alias("threshold"),
            e._passed(F.col(f"__obs_{i}")).cast("long").alias("passed"),
        )
        for i, e in enumerate(suite)
    ]
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
