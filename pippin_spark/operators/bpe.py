"""Distributed BPE tokenizer induction (Sennrich et al. 2016), the
vocabulary-training half of the pretraining pipeline.

The classic scale trick makes this Spark-friendly: after one corpus
pass for word counts, EVERY merge round operates on the distinct-word
vocabulary weighted by count — a table that is orders of magnitude
smaller than the corpus (100 TB of text is ~10^7 distinct
whitespace words). So the corpus is scanned exactly once; the
iterative part runs on vocab-sized data.

Per round (one 1-row action each):
- adjacent symbol pairs come from a narrow array-zip of each word's
  symbol sequence (weighted by word count, map-side partial agg);
- the argmax pair is a 1-row TakeOrdered with a total ordering
  (count desc, pair lexicographic) — deterministic under ties — whose
  single row is collected (the merge table is a driver-sized vocab
  artifact by design);
- the merge is applied by a greedy left-to-right fold (`aggregate`
  HOF) over each word's symbols with the best pair inlined as plan
  literals. Greedy-overlap semantics match the reference algorithm:
  merging (a,a) on "aaa" yields [aa, a].

Each round's sequence table is persisted so round r+1 reads a
materialized vocab table instead of re-deriving the whole chain
(MLlib-style iterative caching; the pattern dedup_clusters uses with
localCheckpoint), and the previous round's cache is released once the
new round materializes — peak cached storage is 2 vocab tables
regardless of the merge count.
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pippin_spark.operators.text import _ws_token_array

from pippin_spark.operators.util import local_table, sidecar_parquet_write

_CHARS = (
    "array_append(transform(sequence(1, length(word)), "
    "i -> substring(word, i, 1)), '</w>')"
)

_PAIRS = (
    "filter(transform(s, (x, i) -> "
    "struct(x as w1, try_element_at(s, i + 2) as w2)), p -> p.w2 is not null)"
)

# greedy left-to-right merge of the best pair into each word's symbol
# array: state = (emitted symbols, skip-next flag). The pair operands
# are {W1}/{W2} str.format placeholders — unambiguous tokens, unlike a
# bare-identifier textual replace, which would silently corrupt the
# expression if a future edit introduced an identifier containing the
# substring (r4 ADVICE).
_MERGE_FOLD = """
aggregate(
  transform(s, (x, i) -> struct(x as c, try_element_at(s, i + 2) as n)),
  struct(cast(array() as array<string>) as arr, false as skip),
  (st, e) -> case
      when st.skip then struct(st.arr as arr, false as skip)
      when e.c = {W1} and coalesce(e.n = {W2}, false)
        then struct(concat(st.arr, array(concat(e.c, e.n))) as arr,
                    true as skip)
      else struct(concat(st.arr, array(e.c)) as arr, false as skip)
  end,
  st -> st.arr)
"""


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: lowercase whitespace words with counts."""
    return (
        docs.select(F.explode(_ws_token_array(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# Local-training guard: when the distinct-word vocabulary fits the
# driver comfortably (every local/bench run; the corpus-scale shape
# is ~10^7 words and falls through to the distributed rounds), the
# whole merge loop runs in plain Python over the collected vocab —
# R driver-scheduled vocab jobs (~0.1-0.25 s scheduling floor each)
# collapse to one cached collect. The merge table is a driver-sized
# artifact by design (the distributed loop already collects one row
# per round), and the collected vocab is bounded by this guard — the
# same shape as logreg_train's single-partition fast path.
_LOCAL_VOCAB_MAX = 100_000


def _train_py(wc: dict, rounds: int, scoring: str):
    """Pure-Python replica of the per-round argmax/merge loop,
    bit-identical to the distributed plan: pair counts are exact
    integer sums; the argmax order is (count|score DESC, w1 ASC,
    w2 ASC) where Python str comparison equals Spark's UTF8 binary
    order (UTF-8 byte order preserves codepoint order); the WordPiece
    score is the exact per-trillion integer of _WP_SCORE (positive
    DECIMAL div == Python floordiv); the merge application is the same
    greedy left-to-right fold with overlap-skip. Pinned against the
    distributed path by test_bpe_local_train_matches_distributed."""
    seqs = {w: list(w) + ["</w>"] for w in wc}
    merges = []
    for r in range(1, rounds + 1):
        pairs: dict = {}
        syms: dict = {}
        for w, c in wc.items():
            s = seqs[w]
            if scoring == "wordpiece":
                for sym in s:
                    syms[sym] = syms.get(sym, 0) + c
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        if scoring == "wordpiece":
            best = min(
                pairs,
                key=lambda p: (
                    -(pairs[p] * 10**12 // (syms[p[0]] * syms[p[1]])),
                    p,
                ),
            )
            a, b = best
            merges.append(
                (r, a, b, pairs[best],
                 pairs[best] * 10**12 // (syms[a] * syms[b]))
            )
        else:
            best = min(pairs, key=lambda p: (-pairs[p], p))
            a, b = best
            merges.append((r, a, b, pairs[best]))
        for w, s in seqs.items():
            out, i, n = [], 0, len(s)
            while i < n:
                if s[i] == a and i + 1 < n and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


# WordPiece merge score (Schuster & Nakajima 2012; the BERT
# vocabulary criterion): likelihood gain of merging = pair_count /
# (count(w1) * count(w2)) under a unigram LM over current symbols.
# Computed as exact integer per-trillion (DECIMAL(38,0) product, so
# the 10^12-scaled numerator never overflows at any corpus size that
# fits BIGINT counts) — cross-engine-deterministic argmax ordering,
# unlike a double ratio. score <= 10^12 always (pair_count <=
# min(c1, c2)), so the floor-divided result fits BIGINT.
_WP_SCORE = (
    "CAST(total AS DECIMAL(38,0)) * 1000000000000 div "
    "(CAST(c1 AS DECIMAL(38,0)) * CAST(c2 AS DECIMAL(38,0)))"
)


def _train(docs: DataFrame, text_col: str, rounds: int, scoring: str = "count"):
    """Shared training loop: returns (merge rows, final seq).

    ``scoring`` selects the per-round argmax criterion — ``"count"``
    is BPE (raw weighted pair count, Sennrich et al. 2016);
    ``"wordpiece"`` ranks by the likelihood-gain score ``_WP_SCORE``
    (pair count over the product of the operand symbols' counts),
    which downweights merges of individually-frequent symbols — the
    classic divergence is (q, u) merging first under WordPiece while
    BPE picks the raw-count max. Everything else (pair derivation,
    greedy fold application, caching) is shared: WordPiece adds one
    vocab-sized symbol-count aggregate per round, joined to the pair
    table inside the same single action.

    The argmax pair is a 1-row TakeOrdered per round; collecting that
    single row (the merge table is a driver-sized vocab artifact by
    design) lets the next round fold it in as plan LITERALS — exactly
    how ``bpe_segment`` replays a learned table — so each round's
    sequence plan depends only on the previous round's cache, never on
    a chain of lazy best-pair branches. Each round materializes its
    sequence table and then releases the previous round's cache: peak
    cached storage is 2 vocab tables regardless of ``rounds`` (it
    previously grew linearly with the merge count). If the pair table
    runs dry before ``rounds`` (every word fully merged), training
    stops and the merge table simply has fewer rows."""
    words = word_counts(docs, text_col).persist()
    # ONE corpus pass materializes the word-count cache; n decides the
    # training shape (the count itself is the action every consumer
    # previously paid inside round 1's job).
    n_vocab = words.count()
    if n_vocab <= _LOCAL_VOCAB_MAX:
        wc = {r["word"]: int(r["cnt"]) for r in words.collect()}
        words.unpersist()
        merges, seqs = _train_py(wc, rounds, scoring)
        seq = local_table(
            docs.sparkSession,
            [(w, wc[w], seqs[w]) for w in sorted(wc)],
            "word string, cnt bigint, s array<string>",
        )
        return merges, seq
    seq = words.select("word", "cnt", F.expr(_CHARS).alias("s"))
    merges = []
    prev = None
    for r in range(1, rounds + 1):
        pairs = (
            seq.select("cnt", F.explode(F.expr(_PAIRS)).alias("p"))
            .groupBy("p.w1", "p.w2")
            .agg(F.sum("cnt").alias("total"))
        )
        if scoring == "wordpiece":
            syms = (
                seq.select("cnt", F.explode("s").alias("sym"))
                .groupBy("sym")
                .agg(F.sum("cnt").alias("c"))
            )
            pairs = (
                pairs.join(
                    syms.select(
                        F.col("sym").alias("w1"), F.col("c").alias("c1")
                    ),
                    "w1",
                )
                .join(
                    syms.select(
                        F.col("sym").alias("w2"), F.col("c").alias("c2")
                    ),
                    "w2",
                )
                .withColumn("score", F.expr(_WP_SCORE))
            )
            order = [F.desc("score"), F.asc("w1"), F.asc("w2")]
        else:
            order = [F.desc("total"), F.asc("w1"), F.asc("w2")]
        # the one action of the round: materializes seq off the
        # previous round's cache and returns the argmax pair
        row = pairs.orderBy(*order).limit(1).first()
        if row is None:
            break
        merges.append(
            (r, row["w1"], row["w2"], row["total"])
            if scoring == "count"
            else (r, row["w1"], row["w2"], row["total"], row["score"])
        )
        lit_pair = F.struct(
            F.lit(row["w1"]).alias("w1"), F.lit(row["w2"]).alias("w2")
        )
        seq = (
            seq.withColumn("__b__", lit_pair)
            .selectExpr(
                "word",
                "cnt",
                _MERGE_FOLD.format(W1="__b__.w1", W2="__b__.w2") + " as s",
            )
            .persist()
        )
        if prev is not None:
            prev.unpersist()
        prev = seq
    return merges, seq


def _merge_table(spark, merges) -> DataFrame:
    return local_table(
        spark,
        [(r, w1, w2, w1 + w2, total) for r, w1, w2, total in merges],
        "step int, w1 string, w2 string, merged string, pair_count bigint",
    )


def bpe_train_merges(
    docs: DataFrame, text_col: str = "text", rounds: int = 3
) -> DataFrame:
    """Learn the first ``rounds`` BPE merges; returns the merge table
    (step, w1, w2, merged, pair_count) — the artifact a tokenizer
    builds its vocab from, in learned order."""
    merges, _ = _train(docs, text_col, rounds)
    return _merge_table(docs.sparkSession, merges)


def wordpiece_train_merges(
    docs: DataFrame, text_col: str = "text", rounds: int = 3
) -> DataFrame:
    """Learn the first ``rounds`` WordPiece merges (likelihood-gain
    argmax, ``_WP_SCORE``); returns (step, w1, w2, merged, pair_count,
    score) with the exact per-trillion integer score the round was
    won at."""
    merges, _ = _train(docs, text_col, rounds, scoring="wordpiece")
    return local_table(
        docs.sparkSession,
        [
            (r, w1, w2, w1 + w2, total, score)
            for r, w1, w2, total, score in merges
        ],
        "step int, w1 string, w2 string, merged string,"
        " pair_count bigint, score bigint",
    )


def wordpiece_vocab_after(
    docs: DataFrame, text_col: str = "text", rounds: int = 3
) -> DataFrame:
    """The segmented vocabulary after ``rounds`` WordPiece merges —
    bpe_vocab_after's twin under the likelihood-gain criterion."""
    _, seq = _train(docs, text_col, rounds, scoring="wordpiece")
    return seq.select(
        "word", "cnt", F.array_join("s", " ").alias("pieces")
    )


def bpe_vocab_after(
    docs: DataFrame, text_col: str = "text", rounds: int = 3
) -> DataFrame:
    """The full segmented vocabulary after ``rounds`` learned merges:
    (word, cnt, pieces) with pieces space-joined — i.e. the training
    fold applied across EVERY distinct word, not just the merge table.
    This is the state a tokenizer persists alongside its merges, and a
    much stronger end-to-end check of merge application."""
    _, seq = _train(docs, text_col, rounds)
    return seq.select(
        "word", "cnt", F.array_join("s", " ").alias("pieces")
    )


def bpe_doc_piece_counts(
    docs: DataFrame, text_col: str = "text", rounds: int = 3
) -> DataFrame:
    """Per-DOCUMENT cost under the learned tokenizer: train ``rounds``
    merges, then count each document's words and BPE pieces —
    (doc_id, n_words, n_bpe_pieces). This is the number a
    token-budget planner (token_budget_waterfill, pack_sequences on
    token lengths) actually consumes; text_token_count's regex proxy
    approximates it without the learned merges.

    Scale shape: the corpus is scanned once for word counts (the
    training pass) and once for the doc→word explode; every merge
    round runs on the distinct-word VOCABULARY (the classic BPE scale
    trick — ~10^7 rows at 100 TB), and the final piece counts come
    back to documents via one word-keyed join of that vocab table
    (AQE broadcasts it at small scale; at corpus scale it is a plain
    shuffle join on a well-distributed key). Documents with zero
    words produce no row, matching the SQL oracle's inner join."""
    _, seq = _train(docs, text_col, rounds)
    return _doc_piece_counts(docs, text_col, seq, "n_bpe_pieces")


def _doc_piece_counts(
    docs: DataFrame, text_col: str, seq: DataFrame, out_col: str
) -> DataFrame:
    """Join a trained vocab's per-word piece counts back to the
    doc→word explode: (doc_id, n_words, <out_col>) — the shared tail
    of every *_encode_docs query."""
    vocab = seq.select("word", F.size("s").alias("__np__"))
    words = docs.select(
        "doc_id", F.explode(_ws_token_array(F.col(text_col))).alias("word")
    )
    return (
        words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("__np__").cast("long").alias(out_col),
        )
    )


def wordpiece_doc_piece_counts(
    docs: DataFrame, text_col: str = "text", rounds: int = 3
) -> DataFrame:
    """Per-document cost under the learned WORDPIECE tokenizer:
    (doc_id, n_words, n_wp_pieces) — bpe_doc_piece_counts under the
    likelihood-gain criterion; identical scale shape (two corpus
    scans, vocab-table training, one word-keyed join)."""
    _, seq = _train(docs, text_col, rounds, scoring="wordpiece")
    return _doc_piece_counts(docs, text_col, seq, "n_wp_pieces")


def bpe_write_merges(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    rounds: int = 3,
    scoring: str = "count",
) -> None:
    """Build-once half of the tokenizer artifact contract (the
    ann_index_write analog): train ``rounds`` merges and persist the
    merge table as parquet at ``path``. The artifact is driver-sized
    (one row per merge), and training is deterministic, so encoding
    against the persisted table equals encoding against a fresh train
    EXACTLY (pytest-pinned)."""
    merges, _ = _train(docs, text_col, rounds, scoring=scoring)
    spark = docs.sparkSession
    if scoring == "wordpiece":
        table = local_table(
            spark,
            [
                (r, w1, w2, w1 + w2, total, score)
                for r, w1, w2, total, score in merges
            ],
            "step int, w1 string, w2 string, merged string,"
            " pair_count bigint, score bigint",
        )
    else:
        table = _merge_table(spark, merges)
    # the merge table is driver-sized (one row per merge) — land it
    # via the driver writer, no Spark job; toArrow preserves the
    # exact Spark schema for the read-back
    sidecar_parquet_write(path, table.toArrow())


def bpe_doc_piece_counts_prebuilt(
    spark, path: str, docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Query-many half: per-document piece counts against the
    PERSISTED merge table — zero training actions, which is how a
    production loader prices a corpus under a frozen tokenizer.
    Reads the driver-sized merge table, replays it over the corpus's
    distinct words (bpe_segment — merges ride as plan literals), and
    joins the per-word counts back through the doc→word explode:
    same (doc_id, n_words, n_bpe_pieces) as bpe_doc_piece_counts,
    same two corpus scans, no argmax jobs."""
    # the merge table is a driver-written sidecar — load it as a
    # LocalRelation (zero Spark jobs; the merges are collected into
    # plan literals anyway)
    from pippin_spark.operators.util import sidecar_parquet_df

    merge_table = sidecar_parquet_df(spark, path)
    words = docs.select(
        F.explode(_ws_token_array(F.col(text_col))).alias("word")
    ).distinct()
    seg = bpe_segment(words, merge_table)
    vocab = seg.select("word", F.size("pieces").alias("__np__"))
    dw = docs.select(
        "doc_id", F.explode(_ws_token_array(F.col(text_col))).alias("word")
    )
    return (
        dw.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("__np__").cast("long").alias("n_bpe_pieces"),
        )
    )


def bpe_segment(words: DataFrame, merge_table: DataFrame) -> DataFrame:
    """Apply a learned merge table to segment words: replays the merges
    in order with the same greedy fold. Returns (word, pieces).

    The merge table is tiny (vocab-construction artifact) and rides in
    as a broadcast; segmentation itself is a narrow per-row pass per
    merge step — at inference scale you would collapse the loop into a
    single trie-based pandas UDF, but replaying R learned merges keeps
    training/apply semantics bit-identical."""
    seq = words.select("word", F.expr(_CHARS).alias("s"))
    steps = [
        (r["step"], r["w1"], r["w2"])
        for r in merge_table.select("step", "w1", "w2").collect()
    ]
    for _, w1, w2 in sorted(steps):
        lit_pair = F.struct(F.lit(w1).alias("w1"), F.lit(w2).alias("w2"))
        seq = seq.withColumn("__b__", lit_pair).selectExpr(
            "word",
            _MERGE_FOLD.format(W1="__b__.w1", W2="__b__.w2") + " as s",
        )
    return seq.select("word", F.col("s").alias("pieces"))
