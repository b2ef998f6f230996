"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Numeric determinism policy: double aggregates are computed as
SUM(CAST(x AS DECIMAL(18,4))) then cast to DOUBLE in BOTH engines, so
the result is exact and identical regardless of floating-point addition
order; averages are decimal-sum / count in double. Ordering policy:
queries whose semantics define an order (sort/topk) carry an explicit
rank column with a deterministic tie-break; everything else is
order-insensitive by design.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pippin_spark.entry_queries import ENTRY_QUERIES, ENTRY_ORACLES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-style pricing
    summary through the Pipeline API."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(ENTRY_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ENTRY_ORACLES)
