"""Deterministic sampling for training-data curation (north-star
extension; the reference has no sampling stage — closest prior art is
its Filter transform, /root/reference/stages/transform/transform.go).

Random `df.sample()` is the wrong tool for a 100 TB corpus pipeline:
resampling on retry/re-run yields a different corpus, and train/test
membership must be stable across runs, engines, and partitionings. The
scale-correct pattern is HASH sampling — a pure function of the row id
decides membership, so the sample is reproducible anywhere, needs no
shuffle, no state, and composes with incremental reruns.

The hash is a Knuth multiplicative hash over the id folded into
[0, 2^32): ``pmod(pmod(id, 2147483647) * 2654435761, 2^32)``. Chosen
because it is exact-integer-expressible in BOTH Spark SQL and ANSI SQL
(DuckDB oracle) without 64-bit overflow under ANSI arithmetic:
pmod(id, 2^31-1) < 2^31 and 2^31 · 2654435761 < 2^63. The prime
modulus folds high bits of >2^31 ids in rather than discarding them.
All ops are pure Column expressions — whole-stage codegen, zero UDFs,
zero shuffles added (only sample_per_group shuffles, by its group key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pippin_spark.operators.util import feature_bucket

_KNUTH = 2654435761
_M31 = 2147483647
_M32 = 4294967296


def hash_bucket(id_col: Column, salt: int = 0) -> Column:
    """Deterministic uniform bucket in [0, 2^32) from a bigint id.
    ``salt`` derives independent sampling decisions from the same id
    (e.g. one for sampling, one for splitting)."""
    folded = F.pmod(id_col.cast("bigint") + F.lit(int(salt)), F.lit(_M31))
    return F.pmod(folded * F.lit(_KNUTH), F.lit(_M32))


def hash_bucket_sql(id_expr: str, salt: int = 0) -> str:
    """The exact same bucket computation as ANSI SQL (for oracles and
    engine-portability documentation)."""
    return (
        f"(((({id_expr}) + {int(salt)}) % {_M31}) * {_KNUTH}) % {_M32}"
    )


def sample_hash(
    df: DataFrame, id_col: str, fraction: float, salt: int = 0
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hash bucket falls
    below fraction·2^32. Same rows on every run, every engine, every
    partitioning; the predicate is codegen'd next to the scan so column
    pruning and pushdown are unaffected."""
    thresh = int(fraction * _M32)
    return df.filter(hash_bucket(F.col(id_col), salt) < F.lit(thresh))


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic stratified sample: per-stratum keep fractions
    (e.g. downsample boilerplate-heavy sources, keep all rare-language
    docs). Strata not listed get ``default``. Pure filter — no shuffle,
    no two-pass count like exact-size stratified samplers need."""
    thresh: Column = F.lit(int(default * _M32))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(value), F.lit(int(frac * _M32))
        ).otherwise(thresh)
    return df.filter(hash_bucket(F.col(id_col), salt) < thresh)


def sample_per_group(
    df: DataFrame, group_col: str, id_col: str, n: int, salt: int = 0
) -> DataFrame:
    """Deterministic fixed-size sample of ``n`` rows per group (the
    reproducible replacement for per-group reservoir sampling): rank
    rows within each group by (hash, id) and keep the first n. One
    shuffle, keyed by the group column; each task holds one group's
    rows at a time (sort-based window, no per-group buffer blowup)."""
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    split_col: str = "split",
    salt: int = 0,
) -> DataFrame:
    """Assign every row a stable train/val/test-style split label by
    hash range. Fractions must sum to ≤ 1; any remainder gets the LAST
    label (so {'train': .9, 'test': .1} is airtight). Membership is a
    pure function of the id — a doc never migrates between train and
    test across reruns or repartitions, which is the property that
    matters for contamination-free corpus splits."""
    if not splits:
        raise ValueError("splits must be non-empty")
    bucket = hash_bucket(F.col(id_col), salt)
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for label, frac in splits.items():
        acc += frac
        bounds.append((label, int(acc * _M32)))
    # CASE WHEN b < hi1 THEN l1 WHEN b < hi2 THEN l2 ... ELSE last
    expr = None
    for label, hi in bounds[:-1]:
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    final = F.lit(bounds[-1][0]) if expr is None else expr.otherwise(F.lit(bounds[-1][0]))
    return df.withColumn(split_col, final)


def sample_balance(
    df: DataFrame, strata_col: str, id_col: str, salt: int = 0
) -> DataFrame:
    """Deterministic rebalancing sample: downsample every stratum to
    (approximately) the size of the smallest — e.g. equalize languages
    or sources before pretraining. Two passes: a tiny groupBy counts
    the strata, then the keep decision is the pure-integer predicate

        bucket(id) * n_stratum  <  n_min * 2^32

    (exact bigint arithmetic — bucket < 2^32 and n_stratum < 2^31 keep
    the product under 2^63; no float fraction, so engines agree
    bit-for-bit). The counts side is broadcast; the corpus itself is
    never shuffled — the filter fuses into the scan."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n__"))
    # global min over the tiny aggregated frame (rows = #strata)
    counts = counts.withColumn(
        "__min__", F.min("__n__").over(Window.partitionBy(F.lit(1)))
    )
    keep = hash_bucket(F.col(id_col), salt) * F.col("__n__") < F.col(
        "__min__"
    ) * F.lit(_M32)
    return (
        df.join(F.broadcast(counts), strata_col)
        .filter(keep)
        .drop("__n__", "__min__")
    )


def sample_balance_oracle_sql(
    table: str, strata_col: str, id_col: str, salt: int = 0
) -> str:
    """DuckDB WHERE-clause predicate identical to sample_balance's keep
    decision (caller joins the counts CTE; see entry_queries)."""
    return (
        f"({hash_bucket_sql(f'd.{id_col}', salt)}) * c.__n__ < m.__min__ * {_M32}"
    )


def sample_mixture(
    df: DataFrame,
    id_col: str,
    group_col: str,
    weights_ppm: dict,
    salt: int = 0,
) -> DataFrame:
    """Data-mixing sampler: subsample each source so the output's
    composition matches target weights (parts-per-million ints), at the
    largest total the corpus supports.

    Given per-source counts c_s and targets w_s, the binding source
    fixes the output budget B = min_s floor(c_s·10^6 / w_s); each
    source keeps ~n_s = floor(w_s·B / 10^6) ≤ c_s rows via the
    engine-portable hash threshold (bucket < n_s·2^32/c_s) — the same
    pure-integer membership predicate as every sampler here, so the
    sample is identical on every run/engine/partitioning and the
    predicate fuses into the scan.

    The per-source counts are a #sources-row aggregate collected to the
    driver to build the CASE thresholds — the standard tiny-dim
    pattern, not a data collect. Threshold arithmetic runs in Python
    (arbitrary precision), so n_s·2^32 cannot overflow at any corpus
    size.

    A weighted source with ZERO rows in the corpus is excluded from the
    budget computation (the mix is computed over the sources that
    exist) — matching ``mixture_oracle_sql``'s inner join, which drops
    absent groups. If no weighted source has rows, the sample is
    empty."""
    counts = {
        r["__g__"]: r["__c__"]
        for r in df.select(F.col(group_col).alias("__g__"))
        .groupBy("__g__")
        .agg(F.count(F.lit(1)).alias("__c__"))
        .collect()
    }
    present = [
        (g, w) for g, w in weights_ppm.items() if w > 0 and counts.get(g, 0) > 0
    ]
    if not present:
        return df.filter(F.lit(False))
    budget = min((counts[g] * 1_000_000) // w for g, w in present)
    pred = F.lit(False)
    for g, w in weights_ppm.items():
        c = counts.get(g, 0)
        if c == 0 or w <= 0:
            continue
        n = (w * budget) // 1_000_000
        thresh = (n * _M32) // c
        pred = F.when(
            F.col(group_col) == g, hash_bucket(F.col(id_col), salt) < F.lit(int(thresh))
        ).otherwise(pred)
    return df.filter(pred)


def mixture_oracle_sql(
    table: str, id_col: str, group_col: str, weights_ppm: dict, salt: int = 0
) -> str:
    """Self-contained DuckDB query computing the identical mixture
    sample (integer arithmetic end-to-end, same hash)."""
    values = ", ".join(f"('{g}', {int(w)})" for g, w in weights_ppm.items())
    return f"""
    WITH w({group_col}, wppm) AS (VALUES {values}),
    c AS (SELECT {group_col}, COUNT(*) AS cnt FROM {table} GROUP BY 1),
    b AS (SELECT MIN(c.cnt * 1000000 // w.wppm) AS budget
          FROM c JOIN w USING ({group_col}) WHERE w.wppm > 0),
    t AS (SELECT w.{group_col},
                 ((w.wppm * b.budget // 1000000) * {_M32}) // c.cnt AS th
          FROM w JOIN c USING ({group_col}) CROSS JOIN b
          WHERE w.wppm > 0 AND c.cnt > 0)
    SELECT d.* FROM {table} d JOIN t USING ({group_col})
    WHERE ({hash_bucket_sql(f'd.{id_col}', salt)}) < t.th
    """


def sample_weighted_topk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    group_col: str = None,
    salt: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): each row gets key = ln(u)/w with u a deterministic
    uniform from the id hash; the k largest keys are the sample —
    inclusion probability proportional to weight, membership a pure
    function of (id, weight, salt).

    Scale: global top-k lowers to TakeOrderedAndProject (per-partition
    heaps, never a single-partition exchange of the input); per-group
    uses the keyed window. The engine-portability caveat: ln() must
    agree bit-for-bit between engines for oracle checks — true when
    both use the platform libm (verified by the strict suite), and
    irrelevant for production use where only Spark evaluates it."""
    u = (hash_bucket(F.col(id_col), salt) + 1) / F.lit(float(_M32))
    key = F.ln(u) / F.col(weight_col)
    scored = df.withColumn("__aes__", key)
    order = [F.col("__aes__").desc(), F.col(id_col).asc()]
    if group_col is not None:
        w = Window.partitionBy(group_col).orderBy(*order)
        return (
            scored.withColumn("__rk__", F.row_number().over(w))
            .filter(F.col("__rk__") <= k)
            .drop("__aes__", "__rk__")
        )
    top = scored.orderBy(*order).limit(k)
    return top.drop("__aes__")


def dsir_importance_scores(
    df: DataFrame,
    text_col: str,
    id_col: str,
    target_label: Column,
    dim: int = 64,
    scale: int = 10_000,
) -> DataFrame:
    """Hashed-unigram frequency-ratio importance scores — the
    data-selection-with-importance-resampling shape (DSIR, Xie et al.
    2023, arXiv:2302.03169): estimate token-bucket frequencies under a
    TARGET split (rows where ``target_label`` = 1) and under the RAW
    corpus, and score every document by how target-like its tokens
    are. Returns ``(id, n_tok, imp_scaled)`` for every document with
    at least one token.

    Exact-integer contract (the same no-libm discipline as
    text_lm_score and the quality classifier): per-bucket ratio is
    add-one smoothed ``(cnt_target[b] + 1) * scale div (cnt_raw[b] +
    1)`` and the per-doc score is the truncating-div MEAN of its
    token-occurrence ratios. Documented divergence from the paper:
    ratio-MEAN pooling instead of log-ratio SUM — a monotone integer
    transform of the same per-bucket evidence, chosen so the full
    computation is bit-identical across engines and partition layouts
    (log-ratio sums need libm floats with engine-dependent rounding).

    Scale shape: ONE tokenize+explode corpus pass; the two bucket
    histograms are dim-row aggregates (map-side combine, <= dim rows
    per partition cross the exchange); the dim-row ratio table
    broadcast-joins back to the token stream; the per-doc mean is one
    keyed aggregate. No row UDFs, no driver data beyond dim rows.
    """
    # the per-doc label binds BELOW the token generator (the
    # bind-once discipline: projected beside the explode it would
    # re-evaluate once per token row)
    base = df.select(
        F.col(id_col).alias("__id__"),
        target_label.alias("__y__"),
        F.col(text_col).alias("__text__"),
    )
    toks = base.select(
        "__id__",
        "__y__",
        F.explode(
            F.filter(
                F.split(F.lower(F.col("__text__")), "\\s+"),
                lambda t: t != "",
            )
        ).alias("__tok__"),
    ).select("__id__", "__y__", feature_bucket(F.col("__tok__"), dim).alias("__j__"))
    cnt_r = toks.groupBy("__j__").agg(F.count(F.lit(1)).alias("__r__"))
    cnt_t = (
        toks.filter(F.col("__y__") == 1)
        .groupBy("__j__")
        .agg(F.count(F.lit(1)).alias("__t__"))
    )
    ratio = (
        cnt_r.join(cnt_t, "__j__", "left")
        .select(
            "__j__",
            F.expr(
                f"(coalesce(__t__, 0L) + 1) * {scale} div (__r__ + 1)"
            ).alias("__rb__"),
        )
    )
    return (
        toks.join(F.broadcast(ratio), "__j__")
        .groupBy("__id__")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum("__rb__").alias("__s__"),
        )
        .select(
            F.col("__id__").alias(id_col),
            "n_tok",
            F.expr("__s__ div n_tok").alias("imp_scaled"),
        )
    )


def exact_isqrt(n: Column) -> Column:
    """Exact integer square root of a non-negative BIGINT column.

    floor(sqrt(double)) alone is wrong at the edges: float64 sqrt can
    land a hair above or below the true root near perfect squares, and
    the two engines need not err the same way. One float estimate plus
    an integer-only ±1 correction is exact for all n < 2^52 and uses
    identical CASE logic on both sides of the oracle contract."""
    s0 = F.floor(F.sqrt(n.cast("double"))).cast("long")
    return (
        F.when((s0 + 1) * (s0 + 1) <= n, s0 + 1)
        .when(s0 * s0 > n, s0 - 1)
        .otherwise(s0)
    )


ISQRT_SQL = (
    "CASE WHEN (CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) + 1) "
    "          * (CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) + 1) <= {n} "
    "     THEN CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) + 1 "
    "     WHEN CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) "
    "          * CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) > {n} "
    "     THEN CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) - 1 "
    "     ELSE CAST(FLOOR(SQRT(CAST({n} AS DOUBLE))) AS BIGINT) END"
)
"""DuckDB mirror of exact_isqrt — same estimate, same ±1 correction."""


def sqrt_temperature_weights(
    df: DataFrame, domain_cols, scale: int = 1_000_000
) -> DataFrame:
    """Temperature-scaled (α = 0.5) domain mixture weights — the
    multilingual-pretraining sampling rule (mBERT / XLM-R style):
    a domain's sampling weight is proportional to sqrt(n) rather than
    n, up-weighting small domains without letting any one giant domain
    dominate the mix. Complements lang_rebalance_plan (uniform target)
    with the smooth-interpolation variant every mixture tuner reaches
    for first.

    Exact integers end-to-end: s = isqrt(n) (integer ±1-corrected),
    weight_ppm = s·scale div Σs — bit-identical across engines and
    partition layouts. Scale shape: one map-side-combined count per
    domain (≤ #domains rows cross the exchange), a 1-row Σs broadcast,
    pure arithmetic after; corpus volume never moves."""
    by = df.groupBy(*domain_cols).agg(F.count(F.lit(1)).alias("n"))
    bys = by.withColumn("s", exact_isqrt(F.col("n")))
    tot = bys.agg(F.sum("s").alias("__tot__"))
    return bys.join(F.broadcast(tot)).select(
        *domain_cols,
        "n",
        "s",
        F.expr(f"s * {scale} div __tot__").alias("weight_ppm"),
    )


def shuffle_order(
    df: DataFrame,
    id_col: str,
    seed: str = "shuf42",
    epoch: int = 0,
    rank_col: str = "shuffle_rank",
    barrier: str = "persist",
    caches=None,
) -> DataFrame:
    """Deterministic global shuffle order for one training EPOCH:
    rank by md5(seed:epoch:id). Every real training loop reshuffles
    per epoch; keying the hash on (seed, epoch) gives each epoch an
    independent, reproducible permutation — same ranks on any engine,
    cluster layout or run, and epoch 0 with the default seed is NOT
    special-cased (shuffle_order_docs predates the epoch key and keeps
    its original seed-only hash).

    Scale: ranked_sort's range-exchange + offset-broadcast — the full
    data crosses the wire once, never through a single-partition
    window (plan-gated for agg_sort; the same shape here)."""
    from pippin_spark.operators.relational import ranked_sort

    key = F.md5(
        F.concat(F.lit(f"{seed}:{int(epoch)}:"), F.col(id_col).cast("string"))
    )
    ranked = ranked_sort(
        df.withColumn("__k__", key),
        [F.col("__k__").asc(), F.col(id_col).asc()],
        rank_col=rank_col,
        barrier=barrier,
        caches=caches,
    )
    return ranked.drop("__k__")


def waterfill_allocate(
    domains: DataFrame,
    domain_col: str,
    avail_col: str,
    weight_col: str,
    budget: int,
) -> DataFrame:
    """Exact-integer water-filling token-budget allocation — the
    data-mixing primitive for "spend B tokens across domains in
    proportion to weights, but no domain can give more than it has":
    every domain gets its proportional share w_j·R div W of the
    remaining budget unless that share exceeds its availability, in
    which case it saturates (alloc = avail) and the surplus
    re-distributes proportionally among the unsaturated — iterated to
    fixpoint (≤ #domains rounds, each saturating ≥ 1 domain or
    stopping).

    The per-domain table is a bounded driver artifact by contract
    (#domains rows — the sqrt_temperature_weights collect pattern), so
    the fold runs in pure Python integers on the collected rows and
    the result returns as a local table; the corpus-sized work (the
    per-domain aggregation feeding this) stays distributed upstream.
    The DuckDB oracle replays the identical fold as unrolled
    saturate-and-redistribute CTE rounds (the quality_classifier_train
    unrolled-GD pattern). Deterministic: floor division end-to-end,
    iteration order irrelevant (a round saturates ALL rows whose share
    covers their availability before recomputing).

    Returns (domain, avail, weight, alloc) with Σ alloc ≤ budget and
    alloc == avail exactly on the saturated set."""
    rows = sorted(
        (
            (r[domain_col], int(r[avail_col]), int(r[weight_col]))
            for r in domains.select(domain_col, avail_col, weight_col).collect()
        ),
        key=lambda t: t[0],
    )
    sat: set = set()
    B = int(budget)
    while True:
        sa = sum(a for d, a, w in rows if d in sat)
        uw = sum(w for d, a, w in rows if d not in sat)
        if uw <= 0:
            break
        R = B - sa
        newly = {d for d, a, w in rows if d not in sat and w * R // uw >= a}
        if not newly:
            break
        sat |= newly
    sa = sum(a for d, a, w in rows if d in sat)
    uw = sum(w for d, a, w in rows if d not in sat)
    R = B - sa
    # uw == 0 with unsaturated rows remaining means every unsaturated
    # domain has weight 0: a zero-weight domain's proportional share is
    # 0, so allocate 0 (the oracle's ELSE branch matches).
    out = [
        (d, a, w, a if d in sat else (w * R // uw if uw > 0 else 0))
        for d, a, w in rows
    ]
    dom_t = domains.schema[domain_col].dataType.simpleString()
    from pippin_spark.operators.util import local_table

    return local_table(
        domains.sparkSession,
        out,
        f"{domain_col} {dom_t}, avail long, weight long, alloc long",
    )
