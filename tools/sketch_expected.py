"""Recompute the sketch-oracle dispatch literals after a testdata regen.

The dedup_minhash / dedup_simhash / ann_topk_ivf* oracles pin expected
agreement counts as literals dispatched on a corpus checksum
(SUM(length(text)) for documents; the embeddings table is constant
across SFs). If the driver regenerates the testdata, those literals go
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
        print(f"\n=== {d}  SUM(length(text)) = {s}")
        for name in (
            "dedup_minhash",
            "dedup_simhash",
            "ann_topk_ivf",
            "ann_topk_ivf_kmeans",
            "ann_topk_lsh",
            "agg_approx_distinct_count",
            "agg_approx_percentile",
        ):
            row = ENTRY_QUERIES[name](spark, d).collect()[0].asDict()
            print(f"{name}: {row}")


if __name__ == "__main__":
    main()
