"""Frequency-sketch operators (engine extension, SURVEY.md §2 LLM-ops
surface).

Misra-Gries heavy hitters, two-pass and exactly-deterministic:

Pass 1 summarizes each Arrow batch with a k-counter Misra-Gries sketch
(`mapInPandas` — only ≤k (item, weight) rows per batch leave Python).
The MG guarantee transfers across partitions by pigeonhole: any item
with global frequency > n/k has frequency > n_p/k in at least one
partition p, so it survives that partition's sketch. Pass 2 recounts
ONLY the surviving candidates exactly (broadcast semi-join, map-side
partial agg) and keeps items with cnt·k > n — integer arithmetic, so
the result is the EXACT set of heavy hitters regardless of how the
data was partitioned or batched, even though the intermediate sketch
is partitioning-dependent. The candidate set is bounded by k·P rows.

At 100 TB: the fact table is scanned twice but shuffled never (pass 1
emits ≤k rows per batch; pass 2's aggregation is over the candidate
subset only, with map-side combine). This beats one exact groupBy on
a high-cardinality column, whose shuffle carries every distinct key.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from pippin_spark.operators.util import local_table


def _mg_sketch_batches(col: str, k: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for item in pdf[col]:
                if item in counters:
                    counters[item] += 1
                elif len(counters) < k:
                    counters[item] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        yield pd.DataFrame({col: list(counters.keys())})

    return fn


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact items with frequency strictly greater than n/k.

    Deterministic output (a pure function of the multiset of values)
    computed through a partitioning-dependent intermediate sketch —
    the exact recount collapses the nondeterminism.
    """
    src = df.select(col)
    candidates = (
        src.mapInPandas(_mg_sketch_batches(col, k), schema=src.schema)
        .distinct()
    )
    total = src.agg(F.count(F.lit(1)).alias("__n__"))
    counts = (
        # null-safe match: NULL can be a legitimate heavy hitter (it
        # survives the sketch as a None counter), and a plain equi-join
        # would silently drop it from the recount
        src.join(F.broadcast(candidates.withColumnRenamed(col, "__cand__")),
                 F.col(col).eqNullSafe(F.col("__cand__")), "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(k) > F.col("__n__"))
        .select(col, "cnt")
    )


def count_min_frequencies(
    df: DataFrame,
    col: str,
    probe_keys: DataFrame | None = None,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> DataFrame:
    """Count-Min frequency estimation (Cormode & Muthukrishnan 2005)
    via Spark's built-in mergeable ``count_min_sketch`` aggregate —
    the frequency-sketch counterpart to the Misra-Gries heavy-hitter
    pass: CMS answers "how often does THIS key occur" from one
    fixed-size sketch, for any key, after one pass.

    ``probe_keys``: the (bounded) keys to estimate — defaults to the
    column's distinct values, which is only sane for dimension-sized
    cardinalities; at corpus scale feed the Misra-Gries candidate set
    (heavy_hitters) so the probe list stays sketch-sized. Probing
    happens driver-side through the JVM sketch API (the sketch is one
    width·depth counter table, ~100 KB at the defaults).

    Output: (col, n_exact, within_band) — one row per probed key,
    including keys with ZERO occurrences (n_exact 0; CMS answers any
    key). within_band pins the CMS contract — the estimate never
    undershoots, and overshoots by at most eps·N (merges are exact
    counter additions, so the sketch — and the flag — is
    partition-layout-invariant for a fixed seed). The exact recount is
    one aggregation over the probed keys; a band violation returns
    FALSE and hash-mismatches the oracle.

    NULL keys are not probeable: Spark's count_min_sketch aggregate
    skips NULL inputs (they are not in the sketch or its totalCount),
    and the JVM estimator NPEs on a null probe — NULLs are dropped
    from the probe set; count NULLs with a plain filter if needed."""
    spark = df.sparkSession
    sk_row = df.agg(
        F.expr(
            f"count_min_sketch({col}, {eps}d, {confidence}d, {seed})"
        ).alias("__sk__")
    ).first()
    jvm = spark.sparkContext._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(sk_row["__sk__"]))
    )
    total = cms.totalCount()
    bound = int(eps * total) + 1
    keys = probe_keys if probe_keys is not None else df.select(col).distinct()
    ests = {
        r[0]: cms.estimateCount(r[0])
        for r in keys.select(col).filter(F.col(col).isNotNull()).collect()
    }
    # probe schema carries the key column's REAL type (a bigint key
    # probed through a hardcoded string field would mistype the join)
    from pyspark.sql.types import LongType, StructField, StructType

    est_schema = StructType(
        [
            StructField(col, df.schema[col].dataType, True),
            StructField("__est__", LongType(), False),
        ]
    )
    est_df = local_table(
        spark, [(k, int(v)) for k, v in sorted(ests.items())], est_schema
    )
    exact = df.join(F.broadcast(est_df.select(col)), col, "left_semi").groupBy(
        col
    ).agg(F.count(F.lit(1)).alias("n_exact"))
    # LEFT join from the probe list: a key absent from df must come
    # back as (key, 0, flag), not silently vanish
    return est_df.join(exact, col, "left").select(
        col,
        F.coalesce(F.col("n_exact"), F.lit(0)).alias("n_exact"),
        (
            (F.col("__est__") >= F.coalesce(F.col("n_exact"), F.lit(0)))
            & (
                F.col("__est__")
                <= F.coalesce(F.col("n_exact"), F.lit(0)) + F.lit(bound)
            )
        ).alias("within_band"),
    )
