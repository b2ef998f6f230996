"""Recompute the sketch-oracle dispatch literals after a testdata regen.

The dedup_minhash / dedup_simhash / ann_topk_* / knn_join_ivf oracles
pin expected agreement counts as literals dispatched on a corpus
checksum (SUM(length(text)) for documents; COUNT + embedding-sum for
embeddings — the two 500-row embeddings fixtures hold different
vectors, so the sum disambiguates them). If the driver regenerates the testdata, those literals go
stale and the queries hash-mismatch. This tool runs the Spark side at
each SF and prints the values to paste into entry_queries.py.

Usage: python tools/sketch_expected.py [sf_dir ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    ]
    import duckdb

    from pippin_spark import get_spark
    from pippin_spark.entry_queries import ENTRY_QUERIES

    spark = get_spark("sketch-expected", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        s = duckdb.sql(
            f"SELECT SUM(length(text)) FROM '{d}/documents.parquet'"
        ).fetchone()[0]
        e = duckdb.sql(
            f"SELECT COUNT(*), SUM(list_sum(CAST(embedding AS DOUBLE[]))) "
            f"FROM '{d}/embeddings.parquet'"
        ).fetchone()
        print(f"\n=== {d}  SUM(length(text)) = {s}  "
              f"emb(count, sum) = {e}")
        for name in (
            "dedup_minhash",
            "dedup_simhash",
            "ann_topk_ivf",
            "ann_topk_ivf_kmeans",
            "ann_topk_lsh",
            "ann_topk_pq",
            "knn_join_ivf",
            "hard_negative_ivf",
            "streaming_minhash_dedup",
            "agg_count_min_events",
            "diversity_kcenter",
            "agg_approx_distinct_count",
            "agg_approx_percentile",
        ):
            row = ENTRY_QUERIES[name](spark, d).collect()[0].asDict()
            print(f"{name}: {row}")


if __name__ == "__main__":
    main()
