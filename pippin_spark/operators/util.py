"""Shared operator plumbing."""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame


class CacheHandle:
    """Caller-visible lifecycle for operator-internal persists.

    Operators that must persist an intermediate read multiple times
    (set_similarity_join's sets table, decontaminate_winnow's
    fingerprint store) cannot unpersist it themselves — the returned
    plan still references it lazily. Without a handle the cache lives
    until LRU eviction or a blanket ``spark.catalog.clearCache()``;
    a long-running pipeline session passes a CacheHandle instead and
    releases each operator's caches deterministically after its
    terminal action:

        with CacheHandle() as caches:
            pairs = set_similarity_join(df, "id", "shingles",
                                        caches=caches)
            pairs.write.parquet(out)
        # exiting the block unpersists the operator's intermediates

    or imperatively: ``caches.release()``. Releasing is idempotent;
    registering after release raises (the operator's plan would read
    an unpersisted — silently recomputed — table, which is legal but
    almost certainly not what the caller intended)."""

    def __init__(self) -> None:
        self._dfs: List[DataFrame] = []
        self._released = False

    def register(self, df: DataFrame) -> DataFrame:
        if self._released:
            raise ValueError("CacheHandle already released")
        self._dfs.append(df)
        return df

    @property
    def registered(self) -> int:
        return len(self._dfs)

    def release(self, blocking: bool = True) -> None:
        """Unpersist every registered DataFrame (idempotent)."""
        for df in self._dfs:
            df.unpersist(blocking=blocking)
        self._dfs.clear()
        self._released = True

    def __enter__(self) -> "CacheHandle":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


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
