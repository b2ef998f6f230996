"""ranked_sort evaluation-stability: recompute, eviction, and the
table/checkpoint barriers (round-9 hardening of the round-8 desync
fix — VERDICT r8 'Next' #1).

The round-8 bug class: ranked_sort's id branch and a structurally
different second consumer re-evaluated the rank subtree and observed
DIFFERENT monotonically_increasing_id assignments (block-shifted
ranks at sf0.1). The r8 fix persists the id'd frame; these tests pin
the two remaining epistemic gaps:

1. recompute determinism — when the persist is RELEASED between two
   branch evaluations (the cache-eviction analog: unpersist forces a
   full re-evaluation of the range shuffle + mid assignment), the
   recomputed ranks must equal the first evaluation's ranks (explicit
   partition count + deterministic range-boundary sampling);
2. barrier='table' stability BY CONSTRUCTION — all branches scan the
   same committed parquet files, so the above is a non-question; and
3. the CacheHandle lifecycle (ADVICE r8: heavy callers must be able
   to release the internal materialization deterministically).
"""

import os

import pytest
from pyspark.sql import functions as F

from pippin_spark.operators.relational import ranked_sort
from pippin_spark.operators.util import CacheHandle

SF = "/root/testdata/sf0.001"


def _orders(spark, parts=8):
    # a deterministic order key with a tie-break, per the contract
    return (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderkey", "o_totalprice", "o_custkey")
    )


def _order():
    # built lazily: Column construction needs an active SparkContext
    return [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]


def _ground_truth(spark):
    # single-partition window on the tiny SF — the semantic oracle
    from pyspark.sql import Window

    w = Window.orderBy(*_order())
    return {
        r["o_orderkey"]: r["rank"]
        for r in _orders(spark)
        .withColumn("rank", F.row_number().over(w))
        .collect()
    }


def test_recompute_after_release_is_deterministic(spark):
    """Eviction analog: release the internal persist between two
    evaluations of the SAME returned frame; the full recompute must
    reproduce identical ranks (this is the property the persist-based
    default silently relies on if the cache evicts mid-plan at
    100 TB)."""
    truth = _ground_truth(spark)
    with CacheHandle() as caches:
        ranked = ranked_sort(_orders(spark), _order(), num_partitions=8,
                             caches=caches)
        first = {r["o_orderkey"]: r["rank"] for r in ranked.collect()}
        assert first == truth
        # forces the next evaluation to recompute the range shuffle,
        # the mids, AND the offsets from scratch
        caches.release()
        # a structurally different consumer: per-custkey MIN(rank)
        # next to the row-level branch above — the exact shape of the
        # round-8 desync
        mins = {
            r["o_custkey"]: r["m"]
            for r in ranked.groupBy("o_custkey")
            .agg(F.min("rank").alias("m"))
            .collect()
        }
    by_cust = {}
    for r in _orders(spark).collect():
        k = r["o_custkey"]
        by_cust[k] = min(by_cust.get(k, 1 << 60), truth[r["o_orderkey"]])
    assert mins == by_cust


def test_table_barrier_matches_ground_truth_and_cleans_up(spark):
    with CacheHandle() as caches:
        ranked = ranked_sort(_orders(spark), _order(), num_partitions=8,
                             barrier="table", caches=caches)
        got = {r["o_orderkey"]: r["rank"] for r in ranked.collect()}
        assert got == _ground_truth(spark)
        # two structurally different consumers of the SAME barrier
        # output: row-level + aggregate — with a written table both
        # scan identical committed files, so this cannot desync
        n = ranked.filter(F.col("rank") <= 10).count()
        assert n == 10
        path = caches._paths[0]
        assert os.path.isdir(path)
    assert not os.path.exists(path)  # released with the handle


def test_table_barrier_survives_clear_cache(spark):
    """clearCache() is the blunt eviction: the persist-based default
    would recompute (deterministically, per the test above); the table
    barrier must be byte-stable because nothing was cached at all."""
    with CacheHandle() as caches:
        ranked = ranked_sort(_orders(spark), _order(), num_partitions=8,
                             barrier="table", caches=caches)
        first = {r["o_orderkey"]: r["rank"] for r in ranked.collect()}
        spark.catalog.clearCache()
        second = {r["o_orderkey"]: r["rank"] for r in ranked.collect()}
        assert first == second == _ground_truth(spark)


def test_checkpoint_barrier_matches_ground_truth(spark):
    ranked = ranked_sort(_orders(spark), _order(), num_partitions=8,
                         barrier="checkpoint")
    assert {r["o_orderkey"]: r["rank"] for r in ranked.collect()} == \
        _ground_truth(spark)


def test_bad_barrier_raises(spark):
    with pytest.raises(ValueError, match="barrier"):
        ranked_sort(_orders(spark), _order(), barrier="nope")


def test_caches_handle_releases_persist(spark):
    caches = CacheHandle()
    ranked = ranked_sort(_orders(spark), _order(), num_partitions=8,
                         caches=caches)
    ranked.count()
    # the internal id'd frame is registered and cached after the action
    assert caches.registered == 1
    cached = caches._dfs[0]
    assert cached.storageLevel.useMemory or cached.storageLevel.useDisk
    caches.release()
    assert not (cached.storageLevel.useMemory or cached.storageLevel.useDisk)


def test_shuffle_order_and_sorted_neighborhood_accept_barrier(spark):
    """The heavy callers ADVICE r8 named must thread barrier/caches
    through — and produce identical results under either barrier."""
    from pippin_spark.operators.dedup import sorted_neighborhood_pairs
    from pippin_spark.operators.sampling import shuffle_order

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang"
    )
    with CacheHandle() as caches:
        a = sorted(
            (r["doc_id"], r["shuffle_rank"])
            for r in shuffle_order(docs, "doc_id", caches=caches).collect()
        )
        b = sorted(
            (r["doc_id"], r["shuffle_rank"])
            for r in shuffle_order(
                docs, "doc_id", barrier="table", caches=caches
            ).collect()
        )
        assert a == b
        parts = spark.read.parquet(f"{SF}/part.parquet").select(
            "p_partkey", "p_name"
        )
        pa = sorted(
            tuple(r) for r in sorted_neighborhood_pairs(
                parts, "p_partkey", "p_name", caches=caches
            ).collect()
        )
        pb = sorted(
            tuple(r) for r in sorted_neighborhood_pairs(
                parts, "p_partkey", "p_name", barrier="table", caches=caches
            ).collect()
        )
        assert pa == pb and len(pa) > 0
