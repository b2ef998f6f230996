"""Shared operator plumbing."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: Optional[int] = None) -> DataFrame:
    """Repartition up to the cluster's default parallelism before a
    compute-heavy narrow stage. A small/compact parquet file arrives as
    ~1 scan split; shingling / hashing / Python-UDF-ing it on 1 core
    idles the rest of the cluster. No-op when the scan already has
    enough splits (the 100 TB case — there the input is thousands of
    splits and an extra shuffle of raw bytes would be pure cost)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
