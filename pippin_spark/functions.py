"""Scalar function helpers for the engine's error-handling operators.

The reference's ``*WithError*`` transforms (transform/transform.go:52-216)
treat a failed per-element function as "drop or substitute" — in the
Spark engine that is expressed as a NULL-on-error expression. Spark's
``try_cast`` has exactly that semantic but, under ANSI mode (the Spark
4 default), is implemented as catch-per-failing-row: a JVM exception is
raised and swallowed for every non-parsing value, which measured ~15×
slower than a plain cast on a mostly-failing column (2.3s vs 0.15s per
600k rows, local[32]).

``safe_cast`` gets native speed back: a regexp guard admits values that
provably cast without error, the plain (codegen'd, exception-free) cast
runs on those, and only the rare ambiguous ones (e.g. >18-digit
integers that may overflow) fall back to ``try_cast``. Result-identical
to ``try_cast`` for all inputs; the fallback path is cold by
construction.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# digit budgets: an optionally-signed integer literal with ≤N digits is
# guaranteed in-range for the type (tinyint ±127 → 2, smallint ±32767
# → 4, int ±2.1e9 → 9, bigint ±9.2e18 → 18); longer literals MAY
# overflow and take the try_cast fallback.
_INT_DIGITS = {"tinyint": 2, "byte": 2, "smallint": 4, "short": 4, "int": 9, "integer": 9, "bigint": 18, "long": 18}

# a float literal: 123, 123., 123.45, .45, with optional exponent —
# plus the special values Spark's double parser accepts
# (inf / infinity / nan, any case, optional sign). double/float casts
# never throw on overflow (they saturate to ±Inf), so any literal
# matching this is exception-free.
_FLOAT_RE = r"(?i)^\s*[+-]?((\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?|inf(inity)?|nan)\s*$"

# the complete value set Spark's string→boolean cast accepts
_BOOL_RE = r"(?i)^\s*(true|false|t|f|y|n|yes|no|0|1)\s*$"


def safe_cast(col: Union[Column, str], dtype: Union[str, T.DataType]) -> Column:
    """``try_cast`` semantics (NULL on conversion failure) at plain-cast
    speed. Three-way split: values the guard PROVES convert → plain
    cast (codegen, exception-free); values that are syntactically valid
    but might overflow (>N-digit integers — rare by construction) →
    ``try_cast``; everything else → typed NULL with no conversion
    attempted at all. The middle branch is what makes this exact; the
    last is what makes it fast on mostly-failing columns (the case
    where ANSI try_cast degenerates to catch-per-row, measured 15×).
    Use in ``map_with_error`` / ``map_with_error_mapper`` expressions
    over string columns."""
    c = F.col(col) if isinstance(col, str) else col
    name = dtype.simpleString() if isinstance(dtype, T.DataType) else dtype.lower().strip()
    null = F.lit(None).cast(name)

    if name in _INT_DIGITS:
        fast = c.rlike(r"^\s*[+-]?\d{1,%d}\s*$" % _INT_DIGITS[name])
        maybe_overflow = c.rlike(r"^\s*[+-]?\d+\s*$")
        return F.when(fast, c.cast(name)).when(maybe_overflow, c.try_cast(name)).otherwise(null)
    if name in ("double", "float", "real"):
        return F.when(c.rlike(_FLOAT_RE), c.cast(name)).otherwise(null)
    if name == "boolean":
        return F.when(c.rlike(_BOOL_RE), c.cast(name)).otherwise(null)
    # dates/timestamps/decimals: no cheap guard that covers the
    # grammar — try_cast is the whole path.
    return c.try_cast(name)


def two_level_sums(df, keys, measures, scale: int = 4):
    """Exact decimal aggregation at long-add speed, via two levels.

    ``SUM(CAST(x AS DECIMAL(18,4)))`` is the engine's determinism
    policy for float measures (exact, order-independent — double sums
    are neither), but Spark's per-row decimal arithmetic measured
    ~3.5× slower than codegen long adds. This helper splits the fold:

    - **Level 1** groups by ``(*keys, spark_partition_id())`` and sums
      each measure as a scaled long (``round(x·10^scale)`` — identical
      row-level rounding to the decimal cast, pinned by the parity
      suite). A task sees exactly one partition id, so its partial agg
      fully collapses locally and the shuffle moves #groups rows per
      task. Overflow-safe by construction: a 128 MB scan split holds
      <~5M rows; even at 1e9 scaled units/row the per-partition sum
      stays < 5e15 ≪ 2^63 — the invariant holds at any corpus size
      because it is per-split, not global.
    - **Level 2** (the returned finalizers) combines the per-partition
      longs as DECIMAL(38,0) — exact at any scale — under ANY
      grouping the caller picks: ``groupBy`` / ``rollup`` / ``cube``
      over ``keys``. Grouping-set expansion (rollup ×(k+1), cube ×2^k)
      then multiplies only the pre-aggregate, not the corpus — the
      dominant saving for CUBE over a large fact table.

    Returns ``(pre, dsum, davg, count)``: the level-1 DataFrame plus
    finalizer builders — ``dsum(name, alias)`` the exact sum as double,
    ``davg(name, alias)`` sum/count(non-null) as double, and
    ``count(alias)`` for COUNT(*).

    Caller contract: |measure| < 9.2e14/10^scale per row (beyond that
    use the plain decimal path); measure NULLs are excluded from both
    sum and avg-count, matching SQL aggregate semantics."""
    mult = 10**scale
    proj = (
        [F.col(k) for k in keys]
        + [F.spark_partition_id().alias("__pid__")]
        + [F.round(c * mult, 0).cast("long").alias(f"__m_{n}__") for n, c in measures.items()]
    )
    pre = (
        df.select(*proj)
        .groupBy(*keys, "__pid__")
        .agg(
            F.count(F.lit(1)).alias("__n__"),
            *[F.sum(f"__m_{n}__").alias(f"__s_{n}__") for n in measures],
            *[F.count(f"__m_{n}__").alias(f"__c_{n}__") for n in measures],
        )
    )
    div = F.lit(mult).cast("decimal(10,0)")

    def dsum(name: str, alias: str) -> Column:
        return (F.sum(F.col(f"__s_{name}__").cast("decimal(38,0)")) / div).cast("double").alias(alias)

    def davg(name: str, alias: str) -> Column:
        return (
            (F.sum(F.col(f"__s_{name}__").cast("decimal(38,0)")) / div).cast("double")
            / F.sum(f"__c_{name}__")
        ).alias(alias)

    def count(alias: str) -> Column:
        return F.sum("__n__").alias(alias)

    return pre, dsum, davg, count
