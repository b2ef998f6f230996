"""Strict local mirror of the driver's correctness gate.

Runs every declared query and its DuckDB oracle at sf0.01 and compares
with the driver's STRICT policy (typed value hash), not the tolerant
pytest comparator:

- row counts must match
- column-name sets must match
- per-column Arrow type KINDS must match after width normalization
  (int8..int64 are all "int"; float32/64 are "float"; but int vs
  decimal128 — e.g. DuckDB SUM(BIGINT)->HUGEINT — is a MISMATCH,
  which is exactly the class of bug that sank agg_reduce in r01)
- values must match EXACTLY (bit-exact floats) after sorting columns
  by name and rows by their stringified tuple — a value hash has no
  tolerance, so neither do we.

Usage: python tools/verify_strict.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pyarrow as pa

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


# kinds the driver's pandas canonicalizer can sort/hash — everything
# else (list/struct/map/…) is driver-incompatible as an output column
ATOMIC_KINDS = {"bool", "int", "float", "str", "bytes", "timestamp", "date", "null"}


def type_kind(t: pa.DataType) -> str:
    """Normalize an Arrow type to the width-insensitive kind the driver
    hash treats as equivalent."""
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return f"decimal(s={t.scale})"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{type_kind(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{type_kind(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_null(t):
        return "null"
    return str(t)


def canon_cell(v) -> str:
    import datetime
    import decimal

    if v is None:
        return "∅"
    if isinstance(v, float):
        return repr(v)  # full precision — bit-exact compare
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}={canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def canon_table(tbl: pa.Table):
    cols = sorted(tbl.column_names)
    kinds = {c: type_kind(tbl.schema.field(c).type) for c in cols}
    pyrows = []
    pylists = [tbl.column(c).to_pylist() for c in cols]
    for i in range(tbl.num_rows):
        pyrows.append(tuple(canon_cell(col[i]) for col in pylists))
    pyrows.sort()
    return cols, kinds, pyrows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    import os

    # VERIFY_MASTER / VERIFY_PARTITIONS mimic other harness layouts —
    # e.g. VERIFY_PARTITIONS=200 replicates the driver's PLAIN-session
    # default, the strongest partition-layout-invariance check short
    # of the driver itself
    spark = (
        SparkSession.builder.master(os.environ.get("VERIFY_MASTER", "local[8]"))
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("VERIFY_PARTITIONS", "8"),
        )
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("verify_strict")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sorted(only) if only else sorted(qs)
    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            stbl = sdf.toArrow()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no_oracle ({stbl.num_rows} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            otbl = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        scols, skinds, srows = canon_table(stbl)
        ocols, okinds, orows = canon_table(otbl)
        problems = []
        # the DRIVER's canonicalizer sorts rows with pandas, which
        # cannot hash list/struct/map cells (r5: the only window
        # failures were array-output queries) — non-atomic output
        # columns are a hard FAIL here even though canon_cell could
        # compare them. Allowlist the atomic kinds rather than
        # denylisting known composites, so map<...> (which type_kind
        # renders via str(t)) and any future composite fail too —
        # keeping this gate in agreement with the pytest schema gate.
        bad_atomic = {
            c: k
            for c, k in skinds.items()
            if k not in ATOMIC_KINDS and not k.startswith("decimal(")
        }
        if bad_atomic:
            problems.append(f"driver-incompatible non-atomic columns {bad_atomic}")
        if scols != ocols:
            problems.append(f"cols spark={scols} oracle={ocols}")
        else:
            bad_kinds = {
                c: (skinds[c], okinds[c]) for c in scols if skinds[c] != okinds[c]
            }
            if bad_kinds:
                problems.append(f"type kinds {bad_kinds}")
        if len(srows) != len(orows):
            problems.append(f"rows spark={len(srows)} oracle={len(orows)}")
        elif not problems:
            diff = [
                (a, b) for a, b in zip(srows, orows) if a != b
            ]
            if diff:
                problems.append(
                    f"{len(diff)}/{len(srows)} rows differ; first: spark={diff[0][0]} oracle={diff[0][1]}"
                )
        if problems:
            n_fail += 1
            print(f"FAIL {name}: " + " | ".join(problems) + f" [{time.time()-t0:.1f}s]")
        else:
            print(f"ok   {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
    print(f"\n{len(names)} queries, {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
