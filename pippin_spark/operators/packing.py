"""Sequence packing for LLM pretraining: assign documents to
fixed-token-budget training sequences (the concat-then-chunk packing
used by most pretraining data loaders), deterministically and in
parallel.

A global greedy packer is inherently sequential; the scale-correct
shape shards the corpus by a hash of the doc id (pure function — same
shards on every engine/run/partitioning), packs each shard
independently with a window cumulative sum, and emits
(shard, seq_id, start_off) per document. One window per shard — the
shuffle is on the shard key, never global — so 1000 executors pack
1000+ shards concurrently. A document whose span crosses a sequence
boundary belongs to the sequence where it starts (standard
concat-and-chunk semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pippin_spark.operators.sampling import hash_bucket


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col,
    target_len: int,
    num_shards: int = 64,
    salt: int = 0,
    order_by=None,
) -> DataFrame:
    """Adds ``shard``, ``seq_id``, ``start_off`` columns: the training
    sequence each document lands in when each shard's documents are
    concatenated in id order and chunked every ``target_len`` units
    (tokens, chars — whatever ``len_col`` measures). Exact integer
    arithmetic end-to-end.

    ``order_by`` overrides the in-shard concatenation order (the id
    stays the tie-break, keeping the order total): pass the per-epoch
    md5 shuffle key to pack each epoch in its OWN permutation — the
    sft_manifest_e2e composition — without a second operator."""
    ln = F.col(len_col) if isinstance(len_col, str) else len_col
    shard = F.pmod(hash_bucket(F.col(id_col), salt), F.lit(num_shards))
    out = df.withColumn("shard", shard.cast("long"))
    order = [F.col(id_col)] if order_by is None else [order_by, F.col(id_col)]
    w = (
        Window.partitionBy("shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(ln.cast("long")).over(w) - ln.cast("long")
    # integer `div`, not `/`: long '/' yields double, which silently
    # loses exactness once a shard's cumulative length passes 2^53 —
    # precisely the regime this op is sharded for
    return out.withColumn("start_off", start).withColumn(
        "seq_id", F.expr(f"start_off div {int(target_len)}")
    )


def pack_bins_nextfit(
    df: DataFrame,
    id_col: str,
    len_col,
    target_len: int,
    num_shards: int = 8,
    salt: int = 0,
) -> DataFrame:
    """No-split bin packing: next-fit over documents sorted by
    (length DESC, id ASC) within each hash shard — every document
    lands WHOLE in exactly one bin (``pack_sequences`` is the
    concat-then-chunk dual that splits spans at sequence boundaries;
    this is the variant sample-packing loaders use when cross-document
    attention must never see a split doc). A document longer than
    ``target_len`` gets a bin of its own (oversize allowed, never
    split).

    Determinism/scale contract: the shard is a pure hash of the id and
    the in-shard order is total, so bin assignments are identical
    across runs, engines and partitionings; packing is sequential BY
    NATURE inside a shard (each decision depends on the running fill),
    so the shard count is the parallelism knob — 1000 executors pack
    1000+ shards concurrently, and per-task memory is one shard's
    (id, len) pairs, never text. Exact integer arithmetic; the DuckDB
    oracle replays the identical fold as a recursive CTE.

    Returns (id, shard, bin, fill) — ``fill`` is the bin's running
    total AFTER placing the doc, so ``max_by(fill per (shard, bin))``
    is the bin's final load."""
    import pandas as _pd

    ln = F.col(len_col) if isinstance(len_col, str) else len_col
    shard = F.pmod(hash_bucket(F.col(id_col), salt), F.lit(num_shards))
    base = df.select(
        F.col(id_col).alias("__id__"),
        ln.cast("long").alias("__len__"),
        shard.cast("long").alias("shard"),
    )
    tgt = int(target_len)

    def pack(pdf: _pd.DataFrame) -> _pd.DataFrame:
        pdf = pdf.sort_values(
            ["__len__", "__id__"], ascending=[False, True], kind="mergesort"
        )
        bins, fills = [], []
        b, fill = 0, 0
        first = True
        for n in pdf["__len__"]:
            n = int(n)
            if not first and fill + n > tgt:
                b += 1
                fill = n
            else:
                fill += n
                first = False
            bins.append(b)
            fills.append(fill)
        out = pdf.assign(bin=bins, fill=fills)
        return out[["__id__", "shard", "bin", "fill"]]

    return (
        base.groupBy("shard")
        .applyInPandas(pack, "__id__ long, shard long, bin long, fill long")
        .withColumnRenamed("__id__", id_col)
    )


def pack_bins_nextfit_oracle_sql(
    toks_cte: str,
    target_len: int,
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of pack_bins_nextfit: the same next-fit fold
    replayed as a recursive CTE (one recursion level per in-shard
    rank; every shard advances in the same level, so depth = the
    largest shard's row count). ``toks_cte`` must yield
    (shard, {id_col}, n_tok)."""
    return f"""
    WITH RECURSIVE toks AS ({toks_cte}),
    ordered AS (
      SELECT shard, {id_col}, n_tok,
             ROW_NUMBER() OVER (PARTITION BY shard
                                ORDER BY n_tok DESC, {id_col}) AS rn
      FROM toks
    ),
    packed AS (
      SELECT shard, {id_col}, n_tok, rn,
             CAST(0 AS BIGINT) AS bin, n_tok AS fill
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.{id_col}, o.n_tok, o.rn,
             CASE WHEN p.fill + o.n_tok > {int(target_len)}
                  THEN p.bin + 1 ELSE p.bin END,
             CASE WHEN p.fill + o.n_tok > {int(target_len)}
                  THEN o.n_tok ELSE p.fill + o.n_tok END
      FROM packed p JOIN ordered o
        ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT {id_col}, shard, bin, fill FROM packed
    """


def pack_stream_offsets(
    df: DataFrame,
    len_col,
    rank_col: str,
    target_len: int,
    docs_per_bucket: int = 256,
    caches=None,
) -> DataFrame:
    """Global concat-then-chunk offsets along an EXISTING total order —
    the loader-feed composition (VERDICT r7 #4): given the epoch's
    permutation rank, ``start_off`` is the exact exclusive prefix sum
    of ``len_col`` in rank order and ``seq_id = start_off div
    target_len`` is the training sequence each document starts in.
    Unlike ``pack_sequences`` (hash shards, id order), the stream
    follows the permutation — what an actual shuffled-epoch data
    loader consumes.

    Scale shape (a global running sum WITHOUT a full-input
    single-partition window — the ranked_sort offsets pattern, one
    level up): bucket = (rank−1) div docs_per_bucket gives contiguous
    rank ranges; the within-bucket running sum is a bucket-partitioned
    window (hash exchange of (id, rank, len) triples only — text never
    moves); bucket totals aggregate to #buckets rows whose exclusive
    prefix runs in a tiny single-partition window and broadcast-joins
    back. Sequences legitimately span bucket boundaries — the global
    offset arithmetic handles that exactly. Size ``docs_per_bucket``
    so #buckets stays a broadcast-sized artifact (≤ ~1M rows): at
    1e12 docs, docs_per_bucket=1e6 keeps the prefix table at 1e6 rows
    while per-task state is one bucket's (id, rank, len) triples."""
    ln = (F.col(len_col) if isinstance(len_col, str) else len_col).cast("long")
    b = df.withColumn(
        "__b__", F.expr(f"({rank_col} - 1) div {int(docs_per_bucket)}")
    )
    wloc = (
        Window.partitionBy("__b__")
        .orderBy(F.col(rank_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the in-bucket cumsum is read TWICE (row offsets + bucket totals)
    # and column pruning gives the two consumers different projections
    # below the hash(__b__) exchange, so ReuseExchange cannot dedupe
    # them (measured: the un-persisted plan re-derives the entire rank
    # subtree — 2× scans and a duplicate range exchange). Persist the
    # thin (id, rank, len, bucket, cumsum) frame instead — the
    # set_similarity_join pattern; pass ``caches`` (a CacheHandle) to
    # release it deterministically after the terminal action.
    loc = b.withColumn("__cs__", F.sum(ln).over(wloc)).persist()
    if caches is not None:
        caches.register(loc)
    # bucket total = the bucket's LAST inclusive cumsum
    tot = loc.groupBy("__b__").agg(F.max("__cs__").alias("__t__"))
    wpre = Window.orderBy("__b__").rowsBetween(Window.unboundedPreceding, -1)
    pre = tot.withColumn(
        "__p__", F.coalesce(F.sum("__t__").over(wpre), F.lit(0))
    ).select("__b__", "__p__")
    return (
        loc.join(F.broadcast(pre), "__b__")
        .withColumn("start_off", F.col("__p__") + F.col("__cs__") - ln)
        .withColumn("seq_id", F.expr(f"start_off div {int(target_len)}"))
        .drop("__b__", "__cs__", "__p__")
    )


def pack_bins_report(packed: DataFrame, target_len: int) -> DataFrame:
    """Packing-efficiency report over ``pack_bins_nextfit`` output —
    the loader-tuning readout (how much padding does this shard/target
    combination waste?): per shard, the bin count, total packed
    length, capacity and utilization.

    A bin's final load is MAX(fill) over its rows (``fill`` is the
    running total after each placement); utilization is exact integer
    ppm — total_len·10^6 div (n_bins·target_len). Oversize documents
    (longer than ``target_len``, never split by contract) can push a
    bin past capacity, so util_ppm may legitimately exceed 10^6.
    Scale: two map-side-combined aggregates; only (shard, bin) rows
    then #shards rows cross the exchanges."""
    loads = packed.groupBy("shard", "bin").agg(F.max("fill").alias("load"))
    return (
        loads.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("load").alias("total_len"),
        )
        .select(
            "shard",
            "n_bins",
            "total_len",
            (F.col("n_bins") * F.lit(int(target_len))).alias("capacity"),
            F.expr(
                f"total_len * 1000000 div (n_bins * {int(target_len)})"
            ).alias("util_ppm"),
        )
    )
