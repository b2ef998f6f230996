"""Declared correctness queries + DuckDB oracles (driver contract).

One entry per implemented operator from SURVEY.md §2 (+ engine
extensions). Each Spark query is expressed through the pippin_spark
API; each oracle is the equivalent ANSI SQL for DuckDB over the same
parquet tables.

Determinism policy (drives every pair):
- double aggregates: SUM over DECIMAL(18,4) then cast DOUBLE in both
  engines → bit-identical regardless of addition order.
- averages: decimal-sum cast double / count.
- list-valued results: sorted and joined to a string (hash-stable).
- ordered results (sort/topk): explicit rank with deterministic
  tie-break keys.
"""

from __future__ import annotations

from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pippin_spark.pipeline import Pipeline

ENTRY_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ENTRY_ORACLES: Dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def register(fn: Callable[[SparkSession, str], DataFrame]):
        ENTRY_QUERIES[name] = fn
        if oracle is not None:
            ENTRY_ORACLES[name] = oracle
        return fn

    return register


def _t(spark: SparkSession, sf_dir: str, name: str):
    """Table stage source (pipeline/pipeline.go:101-149 analog for
    parquet; SURVEY.md §2.1 extension)."""
    return Pipeline.from_table(spark, sf_dir, name)


def dsum(c, alias: str):
    """Exact double sum: decimal-sum then cast (determinism policy)."""
    return F.sum(F.col(c).cast("decimal(18,4)")).cast("double").alias(alias)


def davg(c, alias: str):
    return (
        F.sum(F.col(c).cast("decimal(18,4)")).cast("double") / F.count(F.col(c))
    ).alias(alias)


def SQL_DSUM(c: str, alias: str) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(18,4))) AS DOUBLE) AS {alias}"


def SQL_DAVG(c: str, alias: str) -> str:
    return f"CAST(SUM(CAST({c} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({c}) AS {alias}"


# ---------------------------------------------------------------------------
# flagship — TPC-H Q1-style pricing summary (SURVEY.md §7.1 step 2)
# ---------------------------------------------------------------------------


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    stage = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    return (
        stage.df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_q(
    "q1_pricing",
    f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_DSUM('l_quantity', 'sum_qty')},
           {SQL_DSUM('l_extendedprice', 'sum_base_price')},
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           {SQL_DAVG('l_quantity', 'avg_qty')},
           {SQL_DAVG('l_extendedprice', 'avg_price')},
           {SQL_DAVG('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)(flagship)


# ---------------------------------------------------------------------------
# transforms (transform/transform.go:29-235)
# ---------------------------------------------------------------------------


@_q("map_native", "SELECT l_quantity * 2 AS value FROM lineitem")
def q_map_native(spark, sf_dir):
    # Map, native Column path — stays in whole-stage codegen
    return (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_quantity").alias("value"))
        .map(lambda x: x * 2)
        .df
    )


@_q("map_pandas_udf", "SELECT l_quantity + 0.5 AS value FROM lineitem")
def q_map_pandas_udf(spark, sf_dir):
    # Map, Arrow-batched pandas-UDF fallback (the documented slow path)
    return (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_quantity").alias("value"))
        .map(lambda s: s + 0.5, return_type=T.DoubleType(), pandas=True)
        .df
    )


@_q("filter", "SELECT l_quantity AS value FROM lineitem WHERE l_quantity < 24")
def q_filter(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_quantity").alias("value"))
        .filter(lambda x: x < 24)
        .df
    )


_MIXED = "CASE WHEN l_linenumber % 2 = 1 THEN CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) ELSE l_returnflag END"


@_q(
    "map_with_error",
    f"SELECT v AS value FROM (SELECT TRY_CAST({_MIXED} AS BIGINT) AS v FROM lineitem) WHERE v IS NOT NULL",
)
def q_map_with_error(spark, sf_dir):
    # MapWithError: parse failures are dropped + quarantined
    # (transform/transform.go:52-64)
    mixed = F.when(
        F.col("l_linenumber") % 2 == 1,
        F.col("l_quantity").cast("bigint").cast("string"),
    ).otherwise(F.col("l_returnflag"))
    return (
        _t(spark, sf_dir, "lineitem")
        .select(mixed.alias("value"))
        .map_with_error(lambda x: x.try_cast("bigint"))
        .df
    )


@_q(
    "map_with_error_mapper",
    f"SELECT COALESCE(TRY_CAST({_MIXED} AS BIGINT), -1) AS value FROM lineitem",
)
def q_map_with_error_mapper(spark, sf_dir):
    # MapWithErrorMapper: substitute default on failure
    # (transform/transform.go:82-93)
    mixed = F.when(
        F.col("l_linenumber") % 2 == 1,
        F.col("l_quantity").cast("bigint").cast("string"),
    ).otherwise(F.col("l_returnflag"))
    return (
        _t(spark, sf_dir, "lineitem")
        .select(mixed.alias("value"))
        .map_with_error_mapper(lambda x: x.try_cast("bigint"), F.lit(-1).cast("bigint"))
        .df
    )


@_q("flat_map", "SELECT unnest(string_split(text, ' ')) AS value FROM documents")
def q_flat_map(spark, sf_dir):
    # FlatMap: slice-typed input flattens via explode
    # (transform/transform.go:107-128)
    return (
        _t(spark, sf_dir, "documents")
        .select(F.split(F.col("text"), " ").alias("value"))
        .flat_map()
        .df
    )


_ARR = "[CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), l_returnflag, CAST(CAST(l_partkey AS BIGINT) AS VARCHAR)]"


@_q(
    "flat_map_with_error",
    f"SELECT v AS value FROM (SELECT TRY_CAST(unnest({_ARR}) AS BIGINT) AS v FROM lineitem) WHERE v IS NOT NULL",
)
def q_flat_map_with_error(spark, sf_dir):
    # FlatMapWithError (transform/transform.go:145-172)
    arr = F.array(
        F.col("l_quantity").cast("bigint").cast("string"),
        F.col("l_returnflag"),
        F.col("l_partkey").cast("bigint").cast("string"),
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .select(arr.alias("value"))
        .flat_map_with_error(lambda x: x.try_cast("bigint"))
        .df
    )


@_q(
    "flat_map_with_error_mapper",
    f"SELECT COALESCE(TRY_CAST(unnest({_ARR}) AS BIGINT), 0) AS value FROM lineitem",
)
def q_flat_map_with_error_mapper(spark, sf_dir):
    # FlatMapWithErrorMapper (transform/transform.go:190-216)
    arr = F.array(
        F.col("l_quantity").cast("bigint").cast("string"),
        F.col("l_returnflag"),
        F.col("l_partkey").cast("bigint").cast("string"),
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .select(arr.alias("value"))
        .flat_map_with_error_mapper(lambda x: x.try_cast("bigint"), F.lit(0).cast("bigint"))
        .df
    )


# ---------------------------------------------------------------------------
# aggregations (aggregate/aggregate.go:29-508) — lazy *_df forms
# ---------------------------------------------------------------------------

_REVENUE = "l_extendedprice * (1 - l_discount)"


@_q(
    "agg_sum",
    f"SELECT CAST(SUM(CAST({_REVENUE} AS DECIMAL(18,4))) AS DOUBLE) AS sum FROM lineitem",
)
def q_agg_sum(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
            .alias("value")
        )
        .sum_df()
        .select(F.col("sum").cast("double").alias("sum"))
    )


@_q(
    "agg_avg",
    f"SELECT CAST(SUM(CAST({_REVENUE} AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg FROM lineitem",
)
def q_agg_avg(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem").df
    return df.agg(davg_expr())


def davg_expr():
    return (
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
        .cast("double")
        / F.count(F.lit(1))
    ).alias("avg")


@_q("agg_min", "SELECT MIN(o_totalprice) AS min FROM orders")
def q_agg_min(spark, sf_dir):
    return _t(spark, sf_dir, "orders").min_df("o_totalprice")


@_q("agg_max", "SELECT MAX(o_totalprice) AS max FROM orders")
def q_agg_max(spark, sf_dir):
    return _t(spark, sf_dir, "orders").max_df("o_totalprice")


@_q("agg_count", "SELECT COUNT(*) AS count FROM lineitem")
def q_agg_count(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").count_df()


@_q(
    "agg_sum_complex",
    f"""SELECT {SQL_DSUM('l_discount', 're')}, {SQL_DSUM('l_tax', 'im')} FROM lineitem""",
)
def q_agg_sum_complex(spark, sf_dir):
    # complex numbers as struct(re, im) — SURVEY.md §7.3 #4
    return (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.struct(
                F.col("l_discount").cast("decimal(18,4)").alias("re"),
                F.col("l_tax").cast("decimal(18,4)").alias("im"),
            ).alias("value")
        )
        .sum_complex_df()
        .select(F.col("re").cast("double").alias("re"), F.col("im").cast("double").alias("im"))
    )


@_q(
    "agg_avg_complex",
    f"""SELECT {SQL_DAVG('l_discount', 're')}, {SQL_DAVG('l_tax', 'im')} FROM lineitem""",
)
def q_agg_avg_complex(spark, sf_dir):
    df = _t(spark, sf_dir, "lineitem").df
    return df.agg(
        (F.sum(F.col("l_discount").cast("decimal(18,4)")).cast("double") / F.count(F.col("l_discount"))).alias("re"),
        (F.sum(F.col("l_tax").cast("decimal(18,4)")).cast("double") / F.count(F.col("l_tax"))).alias("im"),
    )


@_q(
    "agg_sort",
    """SELECT ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rank,
              o_orderkey, o_totalprice
       FROM orders""",
)
def q_agg_sort(spark, sf_dir):
    # Sort (aggregate.go:201-215): distributed total sort; rank column
    # captures the order for the order-insensitive hash compare
    from pyspark.sql import Window

    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return (
        _t(spark, sf_dir, "orders")
        .df.select("o_orderkey", "o_totalprice")
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "o_orderkey", "o_totalprice")
    )


@_q(
    "agg_sort_desc",
    """SELECT ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rank,
              o_orderkey, o_totalprice
       FROM orders""",
)
def q_agg_sort_desc(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        _t(spark, sf_dir, "orders")
        .df.select("o_orderkey", "o_totalprice")
        .withColumn("rank", F.row_number().over(w))
        .select("rank", "o_orderkey", "o_totalprice")
    )


@_q(
    "agg_group_by",
    """SELECT event_type AS key,
              array_to_string(array_agg(event_id ORDER BY event_id), ',') AS values
       FROM events GROUP BY event_type""",
)
def q_agg_group_by(spark, sf_dir):
    # GroupBy (aggregate.go:257-276); list stringified for hash
    # stability (order-insensitive inside via sort)
    g = (
        _t(spark, sf_dir, "events")
        .select(F.col("event_type").alias("key"), F.col("event_id").alias("value"))
        .group_by(None)
    )
    return g.df.select(
        "key", F.array_join(F.col("values"), ",").alias("values")
    )


@_q("agg_reduce", "SELECT SUM(CAST(l_quantity AS BIGINT)) AS r FROM lineitem")
def q_agg_reduce(spark, sf_dir):
    # Reduce with an associative+commutative fn (§1.4 contract) — the
    # native path lowers to a two-phase JVM fold
    stage = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("value")
    )
    df = stage.df.agg(
        F.reduce(
            F.collect_list("value"),
            F.lit(None).cast("bigint"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(acc + x),
        ).alias("r")
    )
    return df


@_q(
    "agg_as_slice",
    "SELECT l_orderkey * 10 + l_linenumber AS value FROM lineitem",
)
def q_agg_as_slice(spark, sf_dir):
    # AsSlice (aggregate.go:318-329): unordered collect → the lazy form
    # is just the projected DataFrame
    return (
        _t(spark, sf_dir, "lineitem")
        .select((F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("value"))
        .df
    )


@_q(
    "agg_as_map",
    "SELECT o_custkey AS key, MAX(o_totalprice) AS value FROM orders GROUP BY o_custkey",
)
def q_agg_as_map(spark, sf_dir):
    # AsMap with the documented deterministic max-wins conflict policy
    # (reference is last-write-wins nondeterministic, SURVEY §7.3 #3)
    return (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("key"), F.col("o_totalprice").alias("value"))
        .as_map_df()
    )


@_q(
    "agg_as_multi_map",
    """SELECT o_orderpriority AS key,
              array_to_string(array_agg(o_orderkey ORDER BY o_orderkey), ',') AS values
       FROM orders GROUP BY o_orderpriority""",
)
def q_agg_as_multi_map(spark, sf_dir):
    df = (
        _t(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("key"), F.col("o_orderkey").alias("value"))
        .as_multi_map_df()
    )
    return df.select("key", F.array_join(F.sort_array("values"), ",").alias("values"))


@_q(
    "agg_distinct",
    "SELECT DISTINCT CAST(l_quantity AS BIGINT) AS value FROM lineitem",
)
def q_agg_distinct(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_quantity").cast("bigint").alias("value"))
        .distinct_df()
    )


@_q(
    "agg_distinct_count",
    "SELECT COUNT(DISTINCT l_partkey) AS distinct_count FROM lineitem",
)
def q_agg_distinct_count(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").distinct_count_df("l_partkey")


@_q("agg_approx_distinct_count")  # approximate — rows-only check
def q_agg_approx_distinct_count(spark, sf_dir):
    # HLL sketch: the documented 100 TB fast path for DistinctCount
    return _t(spark, sf_dir, "lineitem").approx_distinct_count_df("l_partkey")


# ---------------------------------------------------------------------------
# sources (pipeline/pipeline.go:101-149)
# ---------------------------------------------------------------------------


@_q("source_from_slice", "SELECT upper(r_name) AS value FROM region")
def q_source_from_slice(spark, sf_dir):
    # FromSlice: driver-side values into a pipeline (small dims only)
    names = [r[0] for r in spark.read.parquet(f"{sf_dir}/region.parquet").select("r_name").collect()]
    return Pipeline.from_slice(spark, names).map(lambda x: F.upper(x)).df


@_q("source_from_map", "SELECT r_regionkey AS key, r_name AS value FROM region")
def q_source_from_map(spark, sf_dir):
    rows = spark.read.parquet(f"{sf_dir}/region.parquet").collect()
    mapping = {int(r["r_regionkey"]): r["r_name"] for r in rows}
    return Pipeline.from_map(spark, mapping).df.select(
        F.col("key").cast("int").alias("key"), "value"
    )
