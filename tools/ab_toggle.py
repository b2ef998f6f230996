"""Interleaved A/B of one query under a module-attribute toggle, in
ONE Spark session (the BASELINE.md protocol, for cases where 'A' and
'B' are two code paths of the same query selected by a guard constant
— e.g. bpe._LOCAL_VOCAB_MAX gating the local-vocab training path).

    python tools/ab_toggle.py bpe_train_merges \
        --module pippin_spark.operators.bpe --attr _LOCAL_VOCAB_MAX \
        --a-value keep --b-value 0 --reps 5 [--sf /root/testdata/sf0.1]

A = the attribute's current (HEAD) value; B = --b-value (int). Runs
warmup A,B then A,B,... through the noop sink exactly like bench.py.
"""

from __future__ import annotations

import argparse
import importlib
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--module", required=True)
    ap.add_argument("--attr", required=True)
    ap.add_argument("--b-value", type=int, required=True)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--cpus", type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    args = ap.parse_args()

    from pippin_spark import get_spark
    import __spark_entry__ as entry

    mod = importlib.import_module(args.module)
    a_value = getattr(mod, args.attr)

    spark = get_spark("pippin-ab-toggle", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    def run(name: str, value) -> float:
        setattr(mod, args.attr, value)
        try:
            t0 = time.perf_counter()
            qs[name](spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t0
        finally:
            setattr(mod, args.attr, a_value)

    for name in args.queries:  # warm plans, codegen, worker pools
        run(name, a_value)
        run(name, args.b_value)

    for name in args.queries:
        a_reps, b_reps = [], []
        for _ in range(args.reps):
            a_reps.append(round(run(name, a_value), 4))
            b_reps.append(round(run(name, args.b_value), 4))
        print(
            f"{name}: A(={a_value}) median {statistics.median(a_reps):.3f} "
            f"{a_reps} | B(={args.b_value}) median "
            f"{statistics.median(b_reps):.3f} {b_reps}"
        )


if __name__ == "__main__":
    main()
