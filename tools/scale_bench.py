"""Scaling slope measurement for the flagship scale claims.

VERDICT r4 #8: run the five flagship operators at sf0.1 and at the
10×/100× replicas built by tools/make_scale.py, and report wall time
plus the observed scaling exponent alpha (t ~ n^alpha between
consecutive sizes). Near-linear alpha is the empirical counterpart of
the plan audit's "no scale-killer" claim.

Operator parameters that a real deployment would scale WITH the data
scale here too, and are reported alongside:
- knn_join_ivf's num_cells grows with the corpus (constant ~500-vector
  cells — the IVF contract; fixed cells at 10× data would time O(n²/C)
  cell scoring, which no operator contract promises);
- everything else runs with the bench.py parameters unchanged.

Timing protocol = bench.py's: noop-sink materialization, one discarded
cold run, best of three warm runs; construction-time work is inside
the timed region for the build-timed ops (knn_join_ivf trains and the
greedy/codebook work happens at construction).

Usage: python tools/scale_bench.py [sf_dir ...]
       (default: /root/testdata/sf0.1 /root/repo/.scale/sf1)
Prints one JSON line per (query, sf_dir) and a final summary line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/root/repo/.scale/sf1",
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from pippin_spark import get_spark
    from pippin_spark.operators import dedup as DEDUP
    from pippin_spark.operators import similarity as SIM
    from pippin_spark.operators.packing import pack_sequences
    from pippin_spark.entry_queries import ENTRY_QUERIES
    from pippin_spark.pipeline import Pipeline

    spark = get_spark("pippin-scale-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def minhash(spark, d):
        docs = Pipeline.from_table(spark, d, "documents").df
        return DEDUP.dedup_minhash_lsh(
            docs, "text", "doc_id", n=3, num_hashes=64, bands=16,
            threshold=0.5,
        )

    def set_join(spark, d):
        # the declared set_join_jaccard_docs construction: hashed
        # 3-gram shingles (one Arrow pass) -> PPJoin prefix filtering
        docs = Pipeline.from_table(spark, d, "documents").df
        shingled = DEDUP.shingle_hashes(
            docs.select("doc_id", "text"), "text", n=3, out_col="sh"
        )
        return DEDUP.set_similarity_join(shingled, "doc_id", "sh", 1, 2)

    def knn_ivf(spark, d):
        emb = Pipeline.from_table(spark, d, "embeddings").df
        n = emb.count()
        cells = max(4, n // 500)
        return SIM.knn_join_ivf(
            emb, "embedding", "vec_id", k=3, num_cells=cells, train_iters=2
        )

    def pack(spark, d):
        docs = Pipeline.from_table(spark, d, "documents").df
        toks = F.split(F.col("text"), r"\s+")
        n_tok = F.size(F.filter(toks, lambda x: x != "")).cast("bigint")
        tc = docs.select("doc_id", n_tok.alias("n_tok"))
        return pack_sequences(
            tc, "doc_id", F.col("n_tok"), target_len=2048, num_shards=8
        )

    def q9(spark, d):
        return ENTRY_QUERIES["q9_product_profit"](spark, d)

    OPS = {
        "dedup_minhash": (minhash, False),
        "set_join_jaccard": (set_join, False),
        "knn_join_ivf": (knn_ivf, True),  # trains at construction
        "pack_sequences": (pack, False),
        "q9_product_profit": (q9, False),
    }

    results: dict[str, dict[str, float]] = {n: {} for n in OPS}
    rows: dict[str, dict[str, int]] = {n: {} for n in OPS}
    for d in dirs:
        spark.read.parquet(f"{d}/lineitem.parquet").count()  # warm footers
        for name, (fn, build_timed) in OPS.items():
            if build_timed:
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    df = fn(spark, d)
                    df.write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
            else:
                df = fn(spark, d)
                df.write.format("noop").mode("overwrite").save()
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
            n_out = fn(spark, d).count()
            results[name][d] = round(best, 3)
            rows[name][d] = int(n_out)
            print(
                json.dumps(
                    {"query": name, "sf_dir": d, "sec": round(best, 3),
                     "out_rows": n_out}
                ),
                flush=True,
            )

    # observed exponent between consecutive dirs (data ratio from
    # lineitem row counts — documents/embeddings scale identically)
    sizes = {
        d: spark.read.parquet(f"{d}/lineitem.parquet").count() for d in dirs
    }
    summary = {}
    for name in OPS:
        pairs = []
        for a, b in zip(dirs, dirs[1:]):
            ratio_n = sizes[b] / sizes[a]
            ratio_t = results[name][b] / max(results[name][a], 1e-9)
            pairs.append(
                {
                    "from": a,
                    "to": b,
                    "t_ratio": round(ratio_t, 2),
                    "alpha": round(
                        math.log(ratio_t) / math.log(ratio_n), 3
                    ),
                }
            )
        summary[name] = pairs
    print(json.dumps({"scaling": summary, "sizes": sizes}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
