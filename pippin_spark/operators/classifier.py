"""Distributed quality-classifier training (fastText-style logistic
regression over hashed bag-of-words), exact-arithmetic edition.

Real curation pipelines (CCNet, GPT-3, LLaMA) train a linear
classifier on hashed n-gram features to distill an expensive or
heuristic quality signal into a cheap scorer that runs over the whole
corpus. This module reproduces that shape Spark-first with one twist
that makes it *oracle-checkable across engines*: every quantity in the
training loop is integer-scaled and the sigmoid is the rational "fast
sigmoid" s(z) = 0.5 + z / (2 * (1 + |z|)) — no libm, no float sums —
so the full gradient-descent trajectory is bit-identical regardless of
partitioning, engine, or summation order. The declared queries carry a
FULL cross-engine DuckDB parity oracle (the unrolled iterations in
SQL), not a snapshot gate.

Fixed-point layout (all int64-safe; bounds in parentheses assume the
documented caps):
- features x_j: per-doc normalized term frequency scaled 1e4
  (sum_j x_j <= 1e4 per doc).
- weights w_j: scaled 1e6. With lr <= 4 and iters <= 16, |w| <= 64e6.
- dot product: z = (sum_j w_j * x_j) div 1e4, |z| <= 6.4e11 pre-div.
- sigmoid (scaled 1e6): 5e5 + (z * 1e6) div (2 * (1e6 + |z|));
  z * 1e6 <= 6.4e13 < 2^63.
- gradient sums: sum over docs of err * x_j <= n * 1e10 — int64-safe
  to n ~ 9e8 documents per training shard; beyond that, re-scale
  SCALE_X down or shard the training split (documented contract).
- every integer division is TRUNCATION TOWARD ZERO, which is what
  both Spark's `div` and DuckDB's `//` implement (verified -7 div 2
  == -3 in both).

Scale shape: the featurizer shuffles (doc, bucket) count rows once
and emits ONE dense-array row per document, which is cached; each GD
iteration is one scan of that cache — the per-row error is
materialized ONCE in a projection (bind-once discipline; the gradient
terms consume the attribute, not re-evaluations of the fold) —
followed by a posexplode -> dim-group map-side-partial aggregate
whose result is `dim` driver rows (the round's weight vector, a
bounded artifact exactly like BPE's merge table). No row UDFs
anywhere.

Not a reference-repo operator: engine extension for LLM curation
parity (the reference has no ML surface; cf. fastText
`supervised` + CCNet's quality LM as the modeled behavior).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pippin_spark.operators.util import feature_bucket, local_table

DIM = 64
SCALE_X = 10_000
SCALE_W = 1_000_000
HALF_W = SCALE_W // 2


def tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — the shared semantic
    of Spark `div` and DuckDB `//` (Python's // floors, which differs
    on negatives; the driver-side weight update must match the SQL
    engines bit-for-bit)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


# token -> feature bucket, promoted to operators.util (shared with
# DSIR's importance buckets); kept under the old private name for the
# module's call sites
_bucket = feature_bucket


def stopword_rule_label(
    text_col: Column, stopwords: Sequence[str], min_distinct: int = 2
) -> Column:
    """The heuristic the classifier distills: 1 when the doc contains
    at least `min_distinct` DISTINCT stopwords (the same stopword-hit
    signal the quality_score op uses), else 0."""
    toks = F.array_distinct(
        F.filter(F.split(F.lower(text_col), "\\s+"), lambda t: t != "")
    )
    hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in stopwords])))
    return F.when(hits >= min_distinct, F.lit(1)).otherwise(F.lit(0)).cast("int")


def hash_token_features(
    df: DataFrame,
    text_col: str,
    id_col: str,
    label: Column,
    dim: int = DIM,
) -> DataFrame:
    """(id, y, x) with x a dense length-`dim` array of normalized term
    frequencies scaled by SCALE_X (x_j = count_j * 1e4 div total).
    Documents with zero tokens are dropped (they carry no gradient and
    no score). The only shuffle is (doc, bucket) count rows keyed by
    doc id; output is one row per document."""
    # the label is a per-DOCUMENT expression (split + distinct +
    # intersect over the full text): bind it in its own projection
    # BELOW the generator. Projected in the same select as the
    # explode, it lands above the Generate and is re-evaluated once
    # per TOKEN row (measured 3.4 s vs 0.25 s for this stage at
    # sf0.1) — the same bind-once discipline as the HOF rewrites.
    base = df.select(
        F.col(id_col).alias("__id__"),
        label.alias("y"),
        F.col(text_col).alias("__text__"),
    )
    toks = base.select(
        "__id__",
        "y",
        F.explode(
            F.filter(F.split(F.lower(F.col("__text__")), "\\s+"), lambda t: t != "")
        ).alias("__tok__"),
    ).select(
        # bucket in a PROJECTION, not in the groupBy key list: a
        # grouping-key expression is evaluated once per key occurrence
        # in partial AND final aggregation (measured 2x slower)
        "__id__",
        "y",
        _bucket(F.col("__tok__"), dim).alias("__j__"),
    )
    cnt = toks.groupBy("__id__", "y", "__j__").agg(
        F.count(F.lit(1)).alias("__c__")
    )
    dense = (
        cnt.groupBy("__id__", "y")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__j__"), F.col("__c__")))
            ).alias("__m__"),
            F.sum("__c__").alias("__tot__"),
        )
        .select(
            F.col("__id__").alias(id_col),
            "y",
            F.expr(
                f"transform(sequence(0, {dim - 1}), "
                "i -> coalesce(try_element_at(__m__, cast(i as bigint)), 0L) "
                f"* {SCALE_X} div __tot__)"
            ).alias("x"),
        )
    )
    return dense


def _scored(feat: DataFrame, weights: List[int], via_table: bool = False) -> DataFrame:
    """feat + (z, prob, err) columns for a fixed weight vector.
    The fold is bound once per row; downstream consumers reference the
    materialized attributes.

    via_table routes the weights through a broadcast 1-row Arrow local
    table instead of literal folding: the physical plan (and its
    generated code) is then IDENTICAL across GD iterations, so the JVM
    compiles it once — measured 0.7 s/iter vs 2-3.5 s/iter with
    literal weights at sf0.001, bit-identical weights. Training uses
    the table route; one-shot scoring keeps literals."""
    if via_table:
        w_df = local_table(
            feat.sparkSession,
            [([int(w) for w in weights],)],
            "w array<long>",
        )
        feat = feat.crossJoin(F.broadcast(w_df))
        w_arr = F.col("w")
    else:
        w_arr = F.array(*[F.lit(int(w)).cast("long") for w in weights])
    z_pre = F.aggregate(
        F.zip_with(F.col("x"), w_arr, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        feat.withColumn("__zp__", z_pre)
        .withColumn("z", F.expr(f"__zp__ div {SCALE_X}"))
        .withColumn(
            "prob",
            F.expr(
                f"{HALF_W} + (z * {SCALE_W}) div (2 * ({SCALE_W} + abs(z)))"
            ),
        )
        .withColumn("err", F.col("prob") - F.col("y") * F.lit(SCALE_W))
    )


def logreg_train(
    feat: DataFrame,
    dim: int = DIM,
    iters: int = 8,
    lr_num: int = 4,
    lr_den: int = 1,
) -> List[int]:
    """Full-batch gradient descent on the fast-sigmoid logistic loss,
    exact integer arithmetic throughout. Returns the final scaled
    weight vector (a bounded driver artifact: `dim` longs).

    Each iteration is ONE scan of the cached feature table: project
    the per-row error once, then a posexplode -> dim-group partial
    aggregate (map-side combine; at most `dim` rows cross the
    exchange per partition). The weight update happens driver-side in
    exact ints with truncation-toward-zero division, mirroring the
    SQL engines."""
    feat = feat.persist()
    try:
        n = feat.count()
        if n == 0:
            return [0] * dim
        # size the cached table's partitioning to the data before the
        # iteration loop: the trainer re-scans this cache 'iters'
        # times, so per-stage task-scheduling overhead multiplies by
        # the round count. ~20k dense rows (~10 MB) per partition;
        # never grow the partition count. Value-safe BY DESIGN: every
        # training quantity is an exact integer sum, so the result is
        # partition-layout invariant (the bit-parity pytest pins it).
        # Measured at sf0.1 (4k docs): 8 rounds on 32 partitions
        # 2.8 s/round -> ~1 s/round coalesced; at the 100x replica
        # (400k docs) the target is 20 partitions and the coalesce is
        # a near-no-op.
        cur = feat.rdd.getNumPartitions()
        want = max(1, min(cur, -(-n // 20_000)))
        if want < cur // 2:
            shaped = feat.coalesce(want).persist()
            shaped.count()
            feat.unpersist()
            feat = shaped
        # The trajectory is exact int64 arithmetic end to end — z,
        # prob, err, X^T·err, and the truncating weight update are all
        # integers, so gradients are order-free sums and the result is
        # bit-identical however the rows are batched (the bit-parity
        # pytest pins it against the SQL replay). That licenses two
        # shapes, both numpy (the former per-round plan evaluated
        # three interpreted array HOFs per row plus a dim-row
        # posexplode — ~0.53 s/round at sf0.1):
        # - single-partition cache (the coalesce above lands here
        #   whenever n fits one ~20k-row partition, i.e. every local
        #   run): the ENTIRE iters-round loop runs inside ONE task —
        #   the task holds the full batch, so each round's gradient is
        #   already global. 8 rounds collapse from 8 driver-scheduled
        #   jobs (~0.25-0.45 s scheduling floor each) to 1.
        # - multi-partition (the 100 TB shape): one Arrow pass per
        #   round emitting per-batch partial gradients (dim rows per
        #   batch), summed exactly on the driver.
        # Magnitude bounds (dim=64, x <= SCALE_X, |w| bounded by the
        # truncating update): every product stays far inside int64.
        import numpy as _np
        import pandas as pd

        def _trunc_div(a, b: int):
            return _np.where(a >= 0, a // b, -((-a) // b))

        def _round(X, y, w_arr):
            z = _trunc_div(X @ w_arr, SCALE_X)
            prob = HALF_W + _trunc_div(
                z * SCALE_W, 2 * (SCALE_W + _np.abs(z))
            )
            err = prob - y * SCALE_W
            return X.T @ err

        n_parts = feat.rdd.getNumPartitions()
        if n_parts == 1 and n <= 200_000:
            iters_, lrn, lrd, n_ = iters, lr_num, lr_den, n

            def gen_all(batches):
                Xs, ys = [], []
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    Xs.append(
                        _np.stack(
                            [_np.asarray(x, dtype=_np.int64) for x in pdf["x"]]
                        )
                    )
                    ys.append(pdf["y"].to_numpy().astype(_np.int64))
                X = _np.vstack(Xs)
                y = _np.concatenate(ys)
                w = _np.zeros(dim, dtype=_np.int64)
                for _ in range(iters_):
                    g = _round(X, y, w)
                    w = w - _trunc_div(g * lrn, n_ * SCALE_X * lrd)
                yield pd.DataFrame(
                    {"j": _np.arange(dim, dtype=_np.int64), "w": w}
                )

            rows = feat.select("x", "y").mapInPandas(
                gen_all, "j long, w long"
            ).collect()
            weights = [0] * dim
            for r in rows:
                weights[int(r["j"])] = int(r["w"])
            return weights

        weights = [0] * dim
        for _ in range(iters):
            w_arr = _np.array(weights, dtype=_np.int64)

            def gen(batches):
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    X = _np.stack(
                        [_np.asarray(x, dtype=_np.int64) for x in pdf["x"]]
                    )
                    y = pdf["y"].to_numpy().astype(_np.int64)
                    g = _round(X, y, w_arr)
                    yield pd.DataFrame(
                        {"j": _np.arange(dim, dtype=_np.int64), "g": g}
                    )

            rows = feat.select("x", "y").mapInPandas(
                gen, "j long, g long"
            ).collect()
            grad = [0] * dim
            for r in rows:  # exact int partial sums, order-free
                grad[int(r["j"])] += int(r["g"])
            weights = [
                weights[j]
                - tdiv(grad[j] * lr_num, n * SCALE_X * lr_den)
                for j in range(dim)
            ]
        return weights
    finally:
        feat.unpersist()


def logreg_weights_df(spark: SparkSession, weights: List[int]) -> DataFrame:
    """Weight vector as a (feature_id, w_scaled) table (Arrow-backed
    local table — no Python-RDD scan tax)."""
    return local_table(
        spark,
        [(j, int(w)) for j, w in enumerate(weights)],
        "feature_id int, w_scaled long",
    )


def logreg_score(feat: DataFrame, weights: List[int]) -> DataFrame:
    """Score a (held-out) feature table with a trained weight vector:
    (id, z_scaled, prob_scaled, pred, label, correct) — all exact
    integers, full cross-engine parity. One scan, no shuffle beyond
    the featurizer's."""
    id_col = feat.columns[0]
    s = _scored(feat, weights)
    return s.select(
        F.col(id_col),
        F.col("z").alias("z_scaled"),
        F.col("prob").alias("prob_scaled"),
        F.when(F.col("prob") >= HALF_W, F.lit(1)).otherwise(F.lit(0)).alias(
            "pred"
        ),
        F.col("y").alias("label"),
        F.when(
            (F.col("prob") >= HALF_W) == (F.col("y") == 1), F.lit(1)
        ).otherwise(F.lit(0)).alias("correct"),
    )


def score_rowwise(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: List[int],
    stopwords: Sequence[str],
    min_distinct: int = 2,
    dim: int = DIM,
) -> DataFrame:
    """Stateless per-row scorer: the SAME integers as
    hash_token_features + logreg_score, but with ZERO shuffles —
    bucket counting, the truncating-div tf normalization, the dot
    product, and the fast sigmoid all evaluate inside per-row HOF
    expressions over the token array. This is the streaming/ingest
    form of the classifier: scoring a firehose must not shuffle, and
    Structured Streaming accepts the whole projection stateless.

    The token-bucket array binds ONCE per row as an outer aggregate's
    lambda variable (the bind-once discipline — inlined it would
    recompute the md5 transform once per distinct bucket). Documents
    with zero tokens are dropped, mirroring the featurizer.

    Equivalence argument: batch z_pre = sum over present buckets j of
    w_j * (cnt_j * SCALE_X div tot). The inner aggregate below walks
    array_distinct(js) and computes exactly that term per bucket —
    integer sums in any order are the same value, so stream and batch
    agree bit-for-bit (pinned by pytest and by the declared query's
    full cross-engine oracle)."""
    toks_sql = (
        f"filter(split(lower({text_col}), '\\\\s+'), t -> t != '')"
    )
    js_sql = (
        f"transform({toks_sql}, t -> "
        f"cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint) % {dim})"
    )
    w_sql = "array(" + ", ".join(f"{int(x)}L" for x in weights) + ")"
    z_pre = (
        f"aggregate(array({js_sql}), 0L, (acc0, js) -> "
        f"  aggregate(array_distinct(js), 0L, (acc, j) -> "
        f"    acc + element_at({w_sql}, cast(j + 1 as int)) * "
        f"      ((size(filter(js, x -> x = j)) * {SCALE_X}L) div size(js))))"
    )
    lab = stopword_rule_label(F.col(text_col), stopwords, min_distinct)
    return (
        df.filter(F.expr(f"size({toks_sql}) >= 1"))
        .select(
            F.col(id_col),
            F.expr(z_pre).alias("__zp__"),
            lab.alias("__y__"),
        )
        .withColumn("z", F.expr(f"__zp__ div {SCALE_X}"))
        .withColumn(
            "prob",
            F.expr(
                f"{HALF_W} + (z * {SCALE_W}) div (2 * ({SCALE_W} + abs(z)))"
            ),
        )
        .select(
            F.col(id_col),
            F.col("z").alias("z_scaled"),
            F.col("prob").alias("prob_scaled"),
            F.when(F.col("prob") >= HALF_W, F.lit(1))
            .otherwise(F.lit(0))
            .alias("pred"),
            F.col("__y__").alias("label"),
            F.when(
                (F.col("prob") >= HALF_W) == (F.col("__y__") == 1), F.lit(1)
            ).otherwise(F.lit(0)).alias("correct"),
        )
    )
