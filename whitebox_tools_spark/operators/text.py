"""Text analysis for document pipelines (beyond the reference's scope —
first-class operators for a training-data engine). Built-ins only; every
formula is mirrorable 1:1 in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small fixed English stopword list (public knowledge) — kept tiny so the
# oracle SQL can embed it verbatim
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "that", "this", "be", "are",
]


def tokens_expr(text_col):
    """Whitespace tokenization of trimmed text; empty string -> empty array."""
    t = F.trim(text_col)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(docs: DataFrame, *, text: str = "text", doc_id: str = "doc_id") -> DataFrame:
    """Whitespace token count per doc. -> (doc_id, n_tokens)."""
    return docs.select(
        F.col(doc_id).alias("doc_id"),
        F.size(tokens_expr(F.col(text))).cast("long").alias("n_tokens"),
    )


def bpe_ish_token_count(docs: DataFrame, *, text: str = "text", doc_id: str = "doc_id") -> DataFrame:
    """BPE-ish subword proxy: count of matches of a GPT-2-style pretokenizer
    regex (word pieces, digits, punctuation runs). -> (doc_id, n_pieces)."""
    pattern = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"
    return docs.select(
        F.col(doc_id).alias("doc_id"),
        F.size(F.regexp_extract_all(F.col(text), F.lit(pattern), F.lit(0)))
        .cast("long")
        .alias("n_pieces"),
    )


def quality_score(docs: DataFrame, *, text: str = "text", doc_id: str = "doc_id") -> DataFrame:
    """Heuristic quality features: n_chars, n_tokens, mean token length,
    punctuation ratio, stopword ratio, and a composite score. All exact
    arithmetic over built-ins. -> one row per doc."""
    t = F.col(text)
    toks = tokens_expr(t)
    n_chars = F.length(t).cast("long")
    n_tokens = F.size(toks).cast("long")
    n_punct = (n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda w: F.lower(w).isin(EN_STOPWORDS))
    ).cast("long")
    mean_tok_len = F.when(
        n_tokens > 0,
        (n_chars - (n_tokens - 1)).cast("double") / n_tokens,
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.when((n_tokens >= 10) & (n_tokens <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
        * (F.lit(1.0) - punct_ratio)
        * F.least(stop_ratio * 4.0, F.lit(1.0))
    )
    return docs.select(
        F.col(doc_id).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        mean_tok_len.alias("mean_tok_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality"),
    )


def language_id(docs: DataFrame, *, text: str = "text", doc_id: str = "doc_id") -> DataFrame:
    """N-gram-free heuristic language ID: stopword-hit ratio against the
    English list -> 'en' when >= 0.08, else 'unknown'. (The synthetic corpus
    is en-only; richer lists slot in per language.)
    -> (doc_id, stop_ratio, pred_lang)."""
    toks = tokens_expr(F.col(text))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda w: F.lower(w).isin(EN_STOPWORDS)))
    ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0))
    return docs.select(
        F.col(doc_id).alias("doc_id"),
        ratio.alias("stop_ratio"),
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("unknown")).alias("pred_lang"),
    )


def fingerprint(docs: DataFrame, *, text: str = "text", doc_id: str = "doc_id") -> DataFrame:
    """Deterministic rolling document fingerprint over tokens:
        code(tok) = length(tok) * 7919 + ascii(first char)
        h         = fold(h * 1000003 + code) mod 2147483647
    Pure integer arithmetic (< 2^53 throughout) — identical in any SQL
    engine. -> (doc_id, fp)."""
    toks = tokens_expr(F.col(text))
    codes = F.transform(toks, lambda t: F.length(t).cast("long") * 7919 + F.ascii(t))
    h = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 1000003 + c) % 2147483647,
    )
    return docs.select(F.col(doc_id).alias("doc_id"), h.alias("fp"))
