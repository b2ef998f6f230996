"""The reference's canonical 8-stage end-to-end pipeline, golden = 398.

Replicates pippin_test.go:26-124 (F1 fixture, FIXTURES.md): mixed
parseable/garbage strings → MapWithError atoi → Filter odd → Map ×2 →
MapWithErrorMapper to matrix → FlatMapWithError +1 →
FlatMapWithErrorMapper >42 → FlatMap flatten → Sum.
"""

from pyspark.sql import types as T

from pippin_spark import Pipeline, Status

INPUT = ["1", "a", "2", "-3", "4", "5", "b"]
ARR = T.ArrayType(T.LongType())


def build(spark, on_error=None):
    def to_matrix(x):
        if x < 0:
            raise ValueError(f"negative number {x}")
        return [x * i for i in range(x)]

    def plus_one(x):
        if x == 0:
            raise ValueError("zero")
        return [x + 1]

    def gt42(x):
        if x <= 42:
            raise ValueError("42")
        return [x]

    return (
        Pipeline.from_slice(spark, INPUT)
        .map_with_error(lambda x: int(x), on_error=on_error, return_type=T.LongType())
        .filter(lambda x: x % 2 != 0)
        .map(lambda x: x * 2)
        .map_with_error_mapper(to_matrix, [42], return_type=ARR)
        .flat_map_with_error(plus_one, on_error=on_error, return_type=ARR)
        .flat_map_with_error_mapper(gt42, [0], return_type=ARR)
        .flat_map(lambda x: x)
    )


def test_canonical_sum_398(spark):
    stage = build(spark)
    assert stage.pipeline.status is Status.RUNNING  # pippin_test.go:29-31
    assert stage.sum() == 398  # pippin_test.go:107-116
    assert stage.pipeline.status is Status.DONE


def test_canonical_error_callbacks(spark):
    errs = []
    stage = build(spark, on_error=errs.append)
    assert stage.sum() == 398
    # atoi failures 'a','b' + FlatMapWithError zeros (two zero inner
    # elements from [0,2] and [0,10,...]) are quarantined
    assert sorted(str(e) for e in errs) == ["0", "0", "a", "b"]


def test_canonical_async(spark):
    stage = build(spark)
    fut = stage.sum_async()
    assert fut.get_with_timeout(120.0) == 398
    assert stage.pipeline.status is Status.DONE
