"""Distributed graph operators over edge DataFrames.

Triangle counting uses the degree-ordered orientation (Schank &
Wagner / Cohen's MapReduce formulation): orient every undirected edge
from its lower-(degree, id) endpoint to the higher one, enumerate
wedges at each source, and semi-join wedges against the oriented edge
set. Orientation bounds every node's out-degree by O(sqrt(|E|)), so
the wedge explosion — the quadratic danger on skewed graphs (a
celebrity node with 10^6 neighbors would otherwise emit 10^12
wedges) — is capped independent of the degree distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_edges(pairs: DataFrame, u_col: str, v_col: str) -> DataFrame:
    """Canonicalize to distinct undirected edges (u < v)."""
    u, v = F.col(u_col), F.col(v_col)
    return (
        pairs.select(
            F.least(u, v).alias("u"), F.greatest(u, v).alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over distinct undirected edges (u < v).

    Wedge enumeration joins oriented edges on their source — an
    equi-join whose fanout per node is the oriented out-degree,
    <= O(sqrt(|E|)) by construction; the closing semi-join is another
    equi-join on the (lo, hi) wedge endpoints. Three shuffles total
    (degree count, wedge build, closure), all on key columns.

    ``edges`` is consumed by four subtrees (two degree sides, the
    orientation, the closure) and ``oriented`` by two (both wedge
    legs): both are persisted so the upstream edge-construction chain
    — which typically contains its own distinct shuffle — materializes
    once instead of once per consumer (the plan-audit exchange count
    drops ~10x; same iterative-caching rationale as dedup_clusters).
    """
    edges = edges.persist()
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    ranked = edges.join(du, "u").join(dv, "v")
    # orient src -> dst by (degree, id): total order, so every
    # triangle has exactly one wedge-apex (its minimum node)
    # Pin the oriented table's partitioning to (cluster width, s)
    # BEFORE caching: the wedge join's fanout (Σ outdeg² rows) is
    # generated post-exchange, and AQE's byte-based coalescing sizes
    # that exchange by the oriented table's few MB — at bench scale it
    # coalesced to ~5 partitions (minPartitionSize floor) and the
    # whole wedge enumeration + closure probe ran on 5 of 32 cores.
    # An explicit hash repartition on the wedge key is exempt from
    # coalescing, keeps the self-join co-partitioned (no wedge-side
    # exchange), and is scale-adaptive by construction: on a real
    # cluster defaultParallelism is the core count, and at 100 TB AQE
    # would keep at least that many partitions anyway. Interleaved
    # A/B at sf0.1: 14.7/12.6, 11.3/9.7, 10.6/8.0 s (v0/v1 pairs).
    oriented = ranked.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
        )
        .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("d")))
        .alias("e")
    ).select("e.s", "e.d").repartition(
        edges.sparkSession.sparkContext.defaultParallelism, "s"
    ).persist()
    w1 = oriented.select(F.col("s"), F.col("d").alias("b"))
    w2 = oriented.select(F.col("s"), F.col("d").alias("c"))
    wedges = w1.join(w2, "s").filter(F.col("b") < F.col("c"))
    closing = edges.select(
        F.col("u").alias("b"), F.col("v").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"])
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))
