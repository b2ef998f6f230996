"""Deduplication operators for training-data pipelines: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Design for 100 TB (the whole point of these):
- exact dedup is a single hash-aggregate on a digest — never on the
  raw text (shuffle bytes = 16-byte digests, not documents).
- MinHash/LSH: signatures are computed in one pass with nested native
  higher-order functions (no UDF); candidate generation is an
  equi-join on (band, band_hash) — the only shuffle — and exact
  Jaccard verification runs only on candidate pairs.
- SimHash: 64-bit signature via native bit arithmetic; banding on
  16-bit chunks for candidates; bit_count(xor) verification.
- embedding near-dup: blocked cosine within a partition key (label /
  IVF cell) so the pairwise compare never goes quadratic globally.

Shingle/minhash hashing uses xxhash64 (JVM-side, 64-bit). These are
sketch-based ops: the driver records rows-only checks for them
(genuinely non-SQL-expressible in DuckDB because DuckDB lacks
xxhash64); the *verification-only* n-gram Jaccard op is exactly
SQL-expressible and carries a full oracle.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pippin_spark.operators.text import fingerprint


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def dedup_exact_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact duplicate groups by normalized-text digest: returns
    (fp, keep_id, dup_count) for groups with >1 member. Shuffles only
    (digest, id)."""
    return (
        df.select(fingerprint(F.col(text_col)).alias("fp"), F.col(id_col).alias("id"))
        .groupBy("fp")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep one row (min id) per distinct normalized text."""
    w = Window.partitionBy(fingerprint(F.col(text_col))).orderBy(F.col(id_col))
    return df.withColumn("__rn__", F.row_number().over(w)).filter(F.col("__rn__") == 1).drop("__rn__")


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------


def shingles(text_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of lowercased text (native HOFs:
    sequence → transform → slice → array_join)."""
    toks = F.split(F.trim(F.regexp_replace(F.lower(text_col), "\\s+", " ")), " ")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(grams)


_LONG_MAX = (1 << 63) - 1


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """MinHash signature as a single fold: each shingle string is
    xxhash64'd ONCE, then the ``num_hashes`` permutations are derived
    from that 8-byte base hash (xxhash64(base, seed_j) — a 2-long hash,
    orders of magnitude cheaper than re-hashing the string). The fold
    keeps a running array of per-seed minima, so the shingle array —
    and anything Catalyst inlines into it — is traversed exactly once.

    (The naive form ``transform(seeds, j -> array_min(transform(sh,
    s -> xxhash64(s, j))))`` re-evaluates the inlined shingle
    expression per seed after projection collapsing: ~64× the work.)"""
    seeds = F.array(*[F.lit(j) for j in range(1, num_hashes + 1)])
    base = F.transform(shingle_col, lambda s: F.xxhash64(s))
    return F.aggregate(
        base,
        F.array_repeat(F.lit(_LONG_MAX).cast("long"), num_hashes),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(seeds, lambda j: F.xxhash64(h, j)),
            lambda a, b: F.least(a, b),
        ),
    )


def lsh_candidates(
    df: DataFrame,
    id_col: str,
    sig_col: str = "sig",
    bands: int = 16,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` of
    ``rows_per_band``, hash each band, equi-join docs sharing a
    (band_idx, band_hash) bucket → candidate pairs (id_a < id_b).

    Scale: the band table is (bands × docs) rows of 3 small ints; the
    self-join shuffles on the band hash — no quadratic blowup unless a
    bucket is hot (cap with a salt or drop mega-buckets upstream)."""
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col(sig_col), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bh"),
                ),
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(right, on=["band", "bh"], how="inner")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def dedup_minhash_lsh(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified:
    shingle → signature → banded candidates → verify. Returns
    (id_a, id_b, jaccard) with jaccard ≥ threshold."""
    rows = num_hashes // bands
    docs = df.select(
        F.col(id_col).alias("id"),
        shingles(F.col(text_col), n).alias("sh"),
    ).filter(F.size("sh") > 0)
    sigs = docs.select("id", minhash_signature(F.col("sh"), num_hashes).alias("sig"))
    cand = lsh_candidates(sigs, "id", "sig", bands, rows)
    a = docs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = docs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return verified


def dedup_ngram_jaccard(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    block_on: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs with deterministic blocking
    (default: first token + length bucket) — fully SQL-expressible, so
    this op carries a complete DuckDB oracle and doubles as the ground
    truth for the sketch-based variants.

    Scale: candidate pairs exist only within a block; the block key is
    the shuffle key. Pick block keys that bound block size."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    if block_on is None:
        block = F.struct(
            F.substring_index(norm, " ", 1).alias("tok0"),
            F.floor(F.length(norm) / 32).alias("lenb"),
        )
    else:
        block = F.struct(*[F.col(c) for c in block_on])
    docs = df.select(
        F.col(id_col).alias("id"),
        block.alias("blk"),
        shingles(F.col(text_col), n).alias("sh"),
    ).filter(F.size("sh") > 0)
    a = docs.select(F.col("blk"), F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = docs.select(F.col("blk"), F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(text_col: Column, bits: int = 64) -> Column:
    """SimHash signature as a long: per bit b, sum ±1 over token hashes;
    bit set iff the sum is positive. One fold over the token-hash array
    carrying an array of ``bits`` vote counters (zip_with against a
    literal bit-mask array), then one fold to assemble the signature —
    the tokenize+hash expression is evaluated exactly once per row.

    (Folding once PER BIT re-evaluates the inlined tokenization after
    projection collapsing: ~64× the work.)"""
    toks = F.array_distinct(F.split(F.trim(F.regexp_replace(F.lower(text_col), "\\s+", " ")), " "))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # bit b ↦ mask 1<<b as a SIGNED long literal (bit 63 = Long.MIN)
    masks = F.array(
        *[F.lit((1 << b) if b < bits - 1 else -(1 << (bits - 1))).cast("long") for b in range(bits)]
    )
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(masks, lambda m: F.when(h.bitwiseAND(m) != 0, F.lit(1)).otherwise(F.lit(-1))),
            lambda a, v: a + v.cast("long"),
        ),
    )
    return F.aggregate(
        F.zip_with(votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda a, m: a.bitwiseOR(m),
    )


def dedup_simhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit signature into 4×16-bit
    chunks (pigeonhole: hamming ≤ 3 ⇒ some chunk identical), equi-join
    per chunk, verify bit_count(xor) ≤ max_hamming."""
    sigs = df.select(F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sig"))
    chunks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("sig"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("ch"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    ).select("id", "sig", F.col("ck.chunk").alias("chunk"), F.col("ck.ch").alias("ch"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    pairs = (
        a.join(b, on=["chunk", "ch"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# embedding near-dup (cosine within blocks)
# ---------------------------------------------------------------------------


def cosine_similarity(a: Column, b: Column) -> Column:
    """Native cosine over float arrays: zip_with product + aggregate
    sums — JVM-side, no UDF."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def dedup_embedding_cosine(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    block_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine within a blocking key
    (a label, an IVF cell id, an LSH bucket). The block key bounds the
    quadratic term; the join shuffles on it once."""
    v = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    a = v.select("blk", F.col("id").alias("id_a"), F.col("vec").alias("va"))
    b = v.select("blk", F.col("id").alias("id_b"), F.col("vec").alias("vb"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
