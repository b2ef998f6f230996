"""Property-based aggregation parity (hypothesis): for random inputs,
every terminal aggregation must equal the plain-Python fold the
reference computes (aggregate/aggregate.go:29-508 semantics, SQL NULL
mode). Upgrades the reference's hand-picked goldens (SURVEY §5)."""

import math
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pippin_spark import Pipeline
from pyspark.sql import types as T

LONG = T.LongType()

ints = st.lists(st.integers(min_value=-(10**9), max_value=10**9), min_size=0, max_size=30)
nonempty_ints = st.lists(st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=30)

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(xs=nonempty_ints)
@settings(**SETTINGS)
def test_sum_min_max_count(spark, xs):
    s = Pipeline.from_slice(spark, xs)
    assert s.sum() == sum(xs)
    s = Pipeline.from_slice(spark, xs)
    assert s.min() == min(xs)
    s = Pipeline.from_slice(spark, xs)
    assert s.max() == max(xs)
    s = Pipeline.from_slice(spark, xs)
    assert s.count() == len(xs)


@given(xs=nonempty_ints)
@settings(**SETTINGS)
def test_avg(spark, xs):
    got = Pipeline.from_slice(spark, xs).avg()
    assert math.isclose(got, sum(xs) / len(xs), rel_tol=1e-9)


@given(xs=ints)
@settings(**SETTINGS)
def test_sort_and_distinct(spark, xs):
    assert Pipeline.from_slice(spark, xs, schema=LONG).sort() == sorted(xs)
    assert Pipeline.from_slice(spark, xs, schema=LONG).sort_desc() == sorted(xs, reverse=True)
    assert sorted(Pipeline.from_slice(spark, xs, schema=LONG).distinct()) == sorted(set(xs))
    assert Pipeline.from_slice(spark, xs, schema=LONG).distinct_count() == len(set(xs))


@given(xs=ints)
@settings(**SETTINGS)
def test_group_by_parity(spark, xs):
    got = (
        Pipeline.from_slice(spark, xs, schema=LONG)
        .group_by(lambda c: c % 3 == 0)
        .to_dict()
    )
    want = defaultdict(list)
    for x in xs:
        want[x % 3 == 0].append(x)
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in want.items()
    }


@given(xs=nonempty_ints)
@settings(**SETTINGS)
def test_reduce_associative_commutative(spark, xs):
    # Reduce contract: fn must be associative+commutative (SURVEY §1.4)
    got = Pipeline.from_slice(spark, xs).reduce(lambda a, b: a + b)
    assert got == sum(xs)


@given(xs=ints)
@settings(**SETTINGS)
def test_pipeline_composition(spark, xs):
    # transforms compose exactly like the Python fold
    got = (
        Pipeline.from_slice(spark, xs, schema=LONG)
        .filter(lambda c: c % 2 == 0)
        .map(lambda c: c * 3)
        .sum()
    )
    want = sum(x * 3 for x in xs if x % 2 == 0)
    if [x for x in xs if x % 2 == 0]:
        assert got == want
    else:
        assert got is None  # SQL semantics: empty sum is NULL


@given(ids=st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=50, unique=True),
       salt=st.integers(min_value=0, max_value=1000))
@settings(**SETTINGS)
def test_hash_bucket_engine_portable(spark, ids, salt):
    # the sampling hash must produce IDENTICAL buckets in Spark, DuckDB
    # (the oracle engine), and plain Python — that's what makes sample
    # membership stable across engines/runs/partitionings
    import duckdb

    from pippin_spark.operators.sampling import (
        hash_bucket, hash_bucket_sql, _KNUTH, _M31, _M32,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got_spark = {
        r["id"]: r["b"]
        for r in df.select("id", hash_bucket(F.col("id"), salt).alias("b")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    got_duck = dict(
        con.sql(f"SELECT id, {hash_bucket_sql('id', salt)} FROM t").fetchall()
    )
    got_py = {i: (((i + salt) % _M31) * _KNUTH) % _M32 for i in ids}
    assert got_spark == got_py
    assert got_duck == got_py
