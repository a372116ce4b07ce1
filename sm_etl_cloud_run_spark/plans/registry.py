"""Query registry: name → (spark callable, DuckDB oracle SQL, bench flag).

Conventions that make the driver's hash comparison deterministic
(CORRECTNESS gate, see /root/repo/__spark_entry__.py):

- every computed column is aliased identically in Spark and SQL;
- float aggregates are computed in **scaled integer space** (cents /
  basis points / 1e9 fixed-point) and divided back at the end — the sum
  of doubles is order-dependent across Spark partitions, the sum of
  longs is exact on both engines;
- content hashing is md5 (available & byte-identical on both engines);
- every ORDER BY ... LIMIT has a unique tiebreaker column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    bench: bool = False
    description: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    *,
    oracle: str | None = None,
    bench: bool = False,
    description: str = "",
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, bench, description)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def bench_queries() -> dict[str, QuerySpec]:
    return {k: v for k, v in _REGISTRY.items() if v.bench}


def get(name: str) -> QuerySpec:
    return _REGISTRY[name]
