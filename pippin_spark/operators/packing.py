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
) -> DataFrame:
    """Adds ``shard``, ``seq_id``, ``start_off`` columns: the training
    sequence each document lands in when each shard's documents are
    concatenated in id order and chunked every ``target_len`` units
    (tokens, chars — whatever ``len_col`` measures). Exact integer
    arithmetic end-to-end."""
    ln = F.col(len_col) if isinstance(len_col, str) else len_col
    shard = F.pmod(hash_bucket(F.col(id_col), salt), F.lit(num_shards))
    out = df.withColumn("shard", shard.cast("long"))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum(ln.cast("long")).over(w) - ln.cast("long")
    # integer `div`, not `/`: long '/' yields double, which silently
    # loses exactness once a shard's cumulative length passes 2^53 —
    # precisely the regime this op is sharded for
    return out.withColumn("start_off", start).withColumn(
        "seq_id", F.expr(f"start_off div {int(target_len)}")
    )
