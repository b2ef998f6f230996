"""Text-analysis operators for training-data pipelines (north-star
extensions, BASELINE.json): tokenization, token counting, quality
scoring, language-ID heuristic, document fingerprinting.

Everything here is native Column expressions — zero Python UDFs — so
the whole stage stays inside whole-stage codegen and scales linearly
with executors. Each op has an exact DuckDB-SQL equivalent used by the
correctness oracle (pippin_spark/entry_queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: word runs or single non-space symbols — the
# same regex works in Java (Spark) and RE2-ish (DuckDB) dialects.
BPE_PATTERN = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"

# tiny per-language stopword lists for the n-gram/stopword-overlap
# language-ID heuristic (deterministic, public knowledge)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "de", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "y", "es", "de", "un", "una", "en", "por"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens of lowercased text."""
    return F.split(F.lower(col), "\\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: word runs + individual symbols (a cheap,
    deterministic proxy for a real BPE vocab)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_PATTERN), 0))


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit("[^A-Za-z0-9\\s]"), 0))


def stopword_hits(col: Column, lang: str = "en") -> Column:
    """Distinct stopwords of ``lang`` present in the text."""
    stoplist = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(tokens(col)), stoplist))


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1]: rewards reasonable length,
    low punctuation density, and stopword presence (a C4/Gopher-rule
    style filter reduced to deterministic arithmetic)."""
    n_chars = F.length(col).cast("double")
    n_tok = token_count(col).cast("double")
    avg_tok_len = n_chars / F.greatest(n_tok, F.lit(1.0))
    punct_ratio = punct_count(col).cast("double") / F.greatest(n_chars, F.lit(1.0))
    stop_ratio = stopword_hits(col).cast("double") / F.lit(10.0)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    tok_len_score = F.when((avg_tok_len >= 3) & (avg_tok_len <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_score = F.when(punct_ratio <= 0.2, F.lit(1.0)).otherwise(F.lit(0.5))
    return (
        F.round(
            0.4 * len_score + 0.2 * tok_len_score + 0.2 * punct_score + 0.2 * stop_ratio,
            6,
        )
    )


def lang_id(col: Column) -> Column:
    """Stopword-overlap language ID: argmax over per-language distinct
    stopword hits, deterministic tie-break by language code order."""
    toks = F.array_distinct(tokens(col))
    scored = None
    for code in sorted(STOPWORDS):
        stoplist = F.array(*[F.lit(w) for w in STOPWORDS[code]])
        hits = F.size(F.array_intersect(toks, stoplist))
        entry = F.struct(hits.alias("hits"), F.lit(code).alias("code"))
        scored = entry if scored is None else F.when(
            (entry["hits"] > scored["hits"]), entry
        ).otherwise(scored)
    return scored["code"]


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercased text (md5 is bit-identical across Spark and DuckDB,
    unlike xxhash64)."""
    normalized = F.trim(F.regexp_replace(F.lower(col), "\\s+", " "))
    return F.md5(normalized)


def lang_id_oracle_sql(text_expr: str = "text") -> str:
    """DuckDB SQL computing the identical lang_id (for the oracle)."""
    toks = f"list_distinct(string_split(regexp_replace(lower({text_expr}), '\\s+', ' ', 'g'), ' '))"
    # replicate the fold: later languages win only on strictly-greater hits,
    # evaluated in sorted(code) order (es > en > de beats require >)
    expr = None
    for code in sorted(STOPWORDS):
        lst = "[" + ", ".join(f"'{w}'" for w in STOPWORDS[code]) + "]"
        hits = f"len(list_intersect({toks}, {lst}))"
        if expr is None:
            expr = f"struct_pack(hits := {hits}, code := '{code}')"
        else:
            expr = (
                f"CASE WHEN {hits} > ({expr}).hits "
                f"THEN struct_pack(hits := {hits}, code := '{code}') "
                f"ELSE {expr} END"
            )
    return f"({expr}).code"
