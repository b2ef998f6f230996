"""Unigram-LM (SentencePiece-style) tokenizer induction — the second
of the two dominant real tokenizer families (Kudo 2018; BPE is the
other, operators/bpe.py), re-expressed with the same vocabulary-table
scale trick and exact-integer cross-engine parity.

Reference scope note: the reference engine (n0rdy/pippin) has no
tokenizer induction; this extends the LLM-pipeline surface the same
way bpe.py does (SURVEY.md north-star extensions).

Faithful-but-exact simplifications, documented divergences from full
SentencePiece:
- HARD-EM (Viterbi) instead of forward-backward soft-EM: the E-step
  segments every distinct word with the current piece costs; the
  M-step re-estimates piece frequencies from those segmentations
  (count-weighted) — the classic hard-EM variant of the algorithm.
- QUANTIZED integer costs instead of float -log p: cost(piece) =
  bit_length(total div freq) — i.e. floor(log2(total/freq)) + 1, an
  exact integer both engines compute identically (Python
  int.bit_length == DuckDB length(format('{:b}', x))), monotone in
  the true negative log-probability. Float log costs would make the
  Viterbi argmin engine-dependent at ties/ulp boundaries — the same
  reason collocations_pmi ranks by an integer transform.
- Pruning keeps the top-K multi-char pieces by re-estimated frequency
  (ties to the lexicographically smaller piece) instead of the exact
  loss-delta ranking; single-char pieces are never pruned (coverage:
  every word must remain segmentable).

Determinism contract (what makes the DuckDB oracle exact): seed
selection, costs, and the Viterbi tie-break are all total orders on
integers and ASCII strings. The Viterbi argmin compares
(cost, n_pieces, space-joined pieces) — and because ' ' sorts below
every piece character, the joined-string comparison equals the
piece-tuple comparison, so both engines pick the identical
segmentation.

Scale shape (the BPE trick, unchanged): the corpus is scanned ONCE
(word counts); the substring seed, both Viterbi passes and the
recount all run on the distinct-word VOCABULARY (~10^7 rows at
100 TB). The seed/cost tables are bounded driver artifacts
(seed_size + alphabet rows — the merge-table/codebook pattern);
segmentation is one Arrow pass over the vocab per EM round with the
cost dict in the closure."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pippin_spark.operators.bpe import word_counts
from pippin_spark.operators.util import local_table

# words longer than this would need deeper Viterbi unrolling in the
# SQL oracle; the Spark side raises rather than silently diverging
MAXLEN = 32


def _bitlen_cost(tot: int, freq: int) -> int:
    """cost = bit_length(tot div freq): exact integer, monotone in
    -log2(freq/tot); DuckDB mirror is length(format('{:b}', t // f))."""
    return (tot // freq).bit_length()


def _seed_pieces(
    words: DataFrame, max_piece: int, seed_size: int
) -> DataFrame:
    """Substring seed vocabulary: every substring of length
    1..max_piece of every distinct word, count-weighted; ALL
    single-char pieces (coverage) + the top ``seed_size`` multi-char
    by (freq DESC, piece ASC). One definition shared by training and
    the exposed seed-table artifact — the SQL oracle's subs/seed CTEs
    mirror exactly this."""
    subs = (
        words.selectExpr(
            "cnt",
            "explode(flatten(transform(sequence(1, length(word)), i -> "
            f"transform(sequence(1, least({int(max_piece)}, "
            "length(word) - i + 1)), l -> substring(word, i, l))))) AS piece",
        )
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("freq"))
    )
    singles = subs.filter(F.length("piece") == 1)
    multi = (
        subs.filter(F.length("piece") >= 2)
        .orderBy(F.desc("freq"), F.asc("piece"))
        .limit(int(seed_size))
    )
    return singles.unionByName(multi)


def _viterbi_pdf_iter(costs: dict, max_piece: int):
    """Arrow-batched Viterbi over (word, cnt) rows: per word the
    minimum-(cost, n_pieces, joined-parts) segmentation under the
    integer piece costs. O(len·max_piece) per word, pure function of
    (word, costs) — partition-layout invariant."""

    def run(batches):
        import pandas as pd

        for pdf in batches:
            words, cnts, parts_out, np_out, cost_out = [], [], [], [], []
            for word, cnt in zip(pdf["word"], pdf["cnt"]):
                n = len(word)
                if n > MAXLEN:
                    raise ValueError(
                        f"unigram: word of length {n} exceeds MAXLEN="
                        f"{MAXLEN} (the oracle's Viterbi unroll depth)"
                    )
                D = [(0, 0, "")] + [None] * n
                for k in range(1, n + 1):
                    best = None
                    for pl in range(1, min(max_piece, k) + 1):
                        prev = D[k - pl]
                        if prev is None:
                            continue
                        piece = word[k - pl:k]
                        c = costs.get(piece)
                        if c is None:
                            continue
                        joined = (
                            piece if prev[2] == "" else prev[2] + " " + piece
                        )
                        cand = (prev[0] + c, prev[1] + 1, joined)
                        if best is None or cand < best:
                            best = cand
                    D[k] = best
                fin = D[n]
                words.append(word)
                cnts.append(int(cnt))
                cost_out.append(fin[0])
                np_out.append(fin[1])
                parts_out.append(fin[2])
            yield pd.DataFrame(
                {
                    "word": words,
                    "cnt": cnts,
                    "pieces": parts_out,
                    "n_pieces": np_out,
                    "seg_cost": cost_out,
                }
            )

    return run


def _segment(words: DataFrame, costs: dict, max_piece: int) -> DataFrame:
    return words.select("word", "cnt").mapInPandas(
        _viterbi_pdf_iter(costs, max_piece),
        "word string, cnt long, pieces string, n_pieces int, seg_cost int",
    )


def unigram_train_segments(
    docs: DataFrame,
    text_col: str = "text",
    max_piece: int = 4,
    seed_size: int = 300,
    prune_keep: int = 150,
) -> DataFrame:
    """Train the unigram-LM vocabulary and return the final segmented
    vocabulary: (word, cnt, pieces, n_pieces, seg_cost) with pieces
    space-joined — bpe_vocab_after's sibling under the other tokenizer
    family.

    Algorithm (each step mirrored 1:1 by the chained-CTE SQL oracle):
    1. SEED: every substring of length 1..max_piece of every distinct
       word, frequency = count-weighted occurrences; keep ALL
       single-char pieces (coverage) + the top ``seed_size``
       multi-char pieces by (freq DESC, piece ASC).
    2. E-STEP 1: Viterbi-segment the vocabulary under
       cost = bit_length(total div freq) over the seed.
    3. M-STEP + PRUNE: re-count piece frequencies from the
       segmentations (count-weighted, distributed agg); keep singles +
       top ``prune_keep`` multi-char by (freq DESC, piece ASC); an
       unused single keeps coverage at the defined worst cost
       bit_length(total2) + 1.
    4. E-STEP 2: re-segment under the pruned, re-estimated costs.
    """
    words = word_counts(docs, text_col).persist()
    # 1. substring seed (vocab-sized explode: len·max_piece per word)
    seed_rows = _seed_pieces(words, max_piece, seed_size).collect()
    seed = {r["piece"]: int(r["freq"]) for r in seed_rows}
    tot = sum(seed.values())
    cost0 = {p: _bitlen_cost(tot, f) for p, f in seed.items()}
    # 2. E-step 1 (one Arrow pass over the vocab)
    seg1 = _segment(words, cost0, max_piece)
    # 3. M-step: count-weighted piece recount (distributed, vocab-sized)
    freq2_rows = (
        seg1.select("cnt", F.explode(F.split("pieces", " ")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").cast("long").alias("freq"))
        .collect()
    )
    freq2 = {r["piece"]: int(r["freq"]) for r in freq2_rows}
    kept_multi = sorted(
        ((p, f) for p, f in freq2.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[: int(prune_keep)]
    kept = {p: freq2.get(p, 0) for p in seed if len(p) == 1}
    kept.update(dict(kept_multi))
    tot2 = sum(kept.values())
    worst = tot2.bit_length() + 1
    cost2 = {
        p: (_bitlen_cost(tot2, f) if f > 0 else worst) for p, f in kept.items()
    }
    # 4. E-step 2. The word-count cache deliberately stays alive: the
    # returned plan is LAZY and still reads it — an eager unpersist
    # here made every later evaluation re-run the corpus-wide
    # doc→word explode, i.e. a silent extra full corpus scan per
    # consumer (round-11 self-review). Same persist-without-unpersist
    # convention as the entry-query compositions (q_pack_on_bpe_e2e);
    # the cache is vocab-sized and the session evicts it under
    # pressure.
    return _segment(words, cost2, max_piece)


def unigram_doc_piece_counts(
    docs: DataFrame,
    text_col: str = "text",
    max_piece: int = 4,
    seed_size: int = 300,
    prune_keep: int = 150,
) -> DataFrame:
    """Per-document cost under the learned UNIGRAM-LM tokenizer:
    (doc_id, n_words, n_uni_pieces) — bpe_doc_piece_counts' sibling.
    Training runs entirely on the vocab table; the per-word n_pieces
    come back to documents through one word-keyed join of the
    segmented vocabulary (the same two-corpus-scan shape)."""
    seg = unigram_train_segments(
        docs, text_col, max_piece=max_piece,
        seed_size=seed_size, prune_keep=prune_keep,
    )
    from pippin_spark.operators.text import _ws_token_array

    vocab = seg.select("word", F.col("n_pieces").alias("__np__"))
    words = docs.select(
        "doc_id", F.explode(_ws_token_array(F.col(text_col))).alias("word")
    )
    return (
        words.join(vocab, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("__np__").cast("long").alias("n_uni_pieces"),
        )
    )


def unigram_seed_table(
    docs: DataFrame,
    text_col: str = "text",
    max_piece: int = 4,
    seed_size: int = 300,
) -> DataFrame:
    """The seed vocabulary as a table (piece, freq, cost) — the
    driver-sized training artifact (merge-table analog), exposed for
    inspection/tests. Shares ``_seed_pieces`` with
    unigram_train_segments so the exposed artifact cannot drift from
    what training actually used."""
    spark = docs.sparkSession
    words = word_counts(docs, text_col)
    rows = _seed_pieces(words, max_piece, seed_size).collect()
    tot = sum(int(r["freq"]) for r in rows)
    return local_table(
        spark,
        [
            (r["piece"], int(r["freq"]), _bitlen_cost(tot, int(r["freq"])))
            for r in sorted(rows, key=lambda r: r["piece"])
        ],
        "piece string, freq long, cost int",
    )
