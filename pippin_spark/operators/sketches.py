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
