"""Interleaved A/B timing inside ONE Spark session.

BASELINE.md's protocol: per-query regression conclusions on this box
must come from alternating reps in a single session — suite-level
runs swing ±30% with box state, so two whole-suite numbers from
different sessions cannot attribute a per-query delta. This tool is
that protocol, runnable:

    python tools/abtest.py q1_pricing q3_shipping --reps 5 \
        [--sf /root/testdata/sf0.1]

Runs A,B,A,B,... (one warmup each first), materializing through the
noop sink exactly like bench.py, and prints per-query median and all
reps. Compare two implementations by declaring both as queries (e.g.
asof_join_events vs asof_join_events_bucketed).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pippin_spark import get_spark
    import __spark_entry__ as entry

    spark = get_spark("pippin-abtest", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in args.queries:
        if name not in qs:
            sys.exit(f"unknown query: {name}")

    def run(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in args.queries:  # warm plans, codegen, worker pools
        run(name)

    reps: dict[str, list[float]] = {n: [] for n in args.queries}
    for _ in range(args.reps):
        for name in args.queries:  # interleaved: A,B,A,B,...
            reps[name].append(round(run(name), 4))

    print(
        json.dumps(
            {
                n: {"median": round(statistics.median(r), 4), "reps": r}
                for n, r in reps.items()
            }
        )
    )


if __name__ == "__main__":
    main()
