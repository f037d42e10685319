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


# Gopher's stop-word presence rule uses this fixed 8-word list
# (Rae et al. 2021, "Scaling Language Models: ... Gopher", App. A1.1 —
# public paper; the rule requires >= 2 of these to appear in the doc)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_filter(
    docs: DataFrame,
    *,
    text: str = "text",
    doc_id: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    max_symbol_ratio: float = 0.1,
    min_stop_hits: int = 2,
    max_dup_line_frac: float = 0.3,
    max_top2_char_frac: float = 0.20,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, App. A1.1 —
    defaults are the paper's published thresholds). One row per doc with the
    rule inputs and a 0/1 `passes` flag:

      1. min_words <= n_words <= max_words
      2. min_mean_len <= mean word length <= max_mean_len
      3. fraction of words containing an ASCII letter >= min_alpha_frac
      4. (count('#') + count('...')) / n_words <= max_symbol_ratio
      5. at least min_stop_hits DISTINCT Gopher stop words appear
      6. fraction of duplicate lines (by count) <= max_dup_line_frac
      7. char mass of the single most frequent word 2-gram / total word
         chars <= max_top2_char_frac  (the paper's top-n-gram repetition
         family, n=2; char mass of a 2-gram occurrence = len(w1)+len(w2))

    Scale shape: rules 1-6 are pure per-row column expressions (one
    whole-stage-codegen scan). Rule 7 is the only one needing cross-token
    counting; it runs as explode -> partial-agg groupBy(doc, gram) ->
    per-doc max -> join back on doc_id — never a per-row O(tokens^2) HOF,
    so a 100k-word doc costs 100k gram rows, not 10^10 comparisons.
    All arithmetic mirrors 1:1 into the DuckDB oracle.
    """
    t = F.col(text)
    toks = tokens_expr(t)
    n_words = F.size(toks).cast("long")
    word_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_word_len = F.when(
        n_words > 0, word_chars.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    alpha_words = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    alpha_frac = F.when(
        n_words > 0, alpha_words.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ellipsis = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    ltoks = F.transform(toks, F.lower)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(ltoks, s),
        )
    ).cast("long")
    lines = F.split(t, "\n", -1)
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))).cast("double") / n_lines,
    ).otherwise(F.lit(0.0))

    base = docs.select(
        F.col(doc_id).alias("doc_id"),
        t.alias("_text"),
        n_words.alias("n_words"),
        word_chars.alias("word_chars"),
        mean_word_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        symbol_ratio.alias("symbol_ratio"),
        stop_hits.alias("stop_hits"),
        dup_line_frac.alias("dup_line_frac"),
        toks.alias("_toks"),
    )

    # rule 7: distributed top-2-gram char mass (map-side combine on
    # (doc_id, gram), then one per-doc max, then an equi-join back)
    grams = (
        base.filter(F.col("n_words") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("_toks"), 1, F.size(F.col("_toks")) - 1),
                    F.slice(F.col("_toks"), 2, F.size(F.col("_toks")) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("gram"),
        )
    )
    top2 = (
        grams.groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.max(F.col("cnt") * (F.length(F.col("gram")) - 1)).alias("top2_mass")
        )
    )
    out = base.join(top2, "doc_id", "left").withColumn(
        "top2_char_frac",
        F.when(
            F.col("word_chars") > 0,
            F.coalesce(F.col("top2_mass"), F.lit(0)).cast("double")
            / F.col("word_chars"),
        ).otherwise(F.lit(0.0)),
    )
    passes = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_len)
        & (F.col("mean_word_len") <= max_mean_len)
        & (F.col("alpha_frac") >= min_alpha_frac)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("stop_hits") >= min_stop_hits)
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("top2_char_frac") <= max_top2_char_frac)
    )
    return out.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_frac",
        "symbol_ratio",
        "stop_hits",
        "dup_line_frac",
        "top2_char_frac",
        passes.cast("long").alias("passes"),
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


def unigram_logprob_quality(
    docs: DataFrame, *, text: str = "text", doc_id: str = "doc_id"
) -> DataFrame:
    """LM-based quality scoring, unigram proxy (the CCNet family — Wenzek
    et al. 2020 score corpora by LM perplexity; a corpus-trained unigram
    model is its exact, dependency-free core): per-doc mean token
    log-probability under the corpus's own empirical unigram distribution.
    Common-token prose scores high; rare-token noise (gibberish, codes,
    OCR damage) scores low — rank / threshold downstream.

    Determinism contract: a float sum over a groupBy is order-dependent,
    so per-token log-probs are rounded to 9 dp and SCALED TO INTEGERS
    (lpi = llround(round(ln(n/total), 9) * 1e9)); the per-doc sum is then
    exact long arithmetic — partition- and engine-order invariant — and
    only the final mean returns to float (6 dp). The DuckDB oracle replays
    the identical quantization.

    Scale shape: explode -> token-count aggregate (map-side combined; the
    vocabulary table), one global total via a broadcast 1-row crossJoin,
    (doc, token) occurrence aggregate, one equi-join on token (AQE
    broadcasts the vocab when it fits), one per-doc aggregate. O(tokens)
    rows through two shuffles; no windows, no UDFs, no collect.
    Docs with zero tokens have no defined mean and are omitted (same
    inner-join semantics in the oracle).
    -> (doc_id, n_tokens, avg_logprob)."""
    tok = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.explode(tokens_expr(F.col(text))).alias("token"),
    )
    v = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    tot = v.agg(F.sum("n").alias("tot"))
    lp = v.crossJoin(F.broadcast(tot)).select(
        "token",
        F.round(
            F.round(F.log(F.col("n").cast("double") / F.col("tot")), 9)
            * F.lit(1e9),
            0,
        )
        .cast("long")
        .alias("lpi"),
    )
    dt = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("m"))
    agg = (
        dt.join(lp, "token")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("m") * F.col("lpi")).alias("s"),
            F.sum("m").alias("n_tokens"),
        )
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        (
            F.round(
                F.col("s").cast("double") / F.lit(1e9) / F.col("n_tokens"), 6
            )
            + F.lit(0.0)
        ).alias("avg_logprob"),
    )


def unigram_logprob_quality_oracle_sql(
    docs_rel: str = "SELECT * FROM documents",
) -> str:
    """DuckDB mirror of unigram_logprob_quality (identical tokenization,
    identical 9-dp scaled-integer quantization of ln(n/total), exact long
    sum, identical final rounding)."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                             ELSE regexp_split_to_array(trim(text), '\\s+') END) AS token
  FROM ({docs_rel}) d
),
v AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
tot AS (SELECT sum(n) AS tot FROM v),
lp AS (
  SELECT token,
         CAST(round(round(ln(CAST(n AS DOUBLE) / tot), 9) * 1e9, 0) AS BIGINT) AS lpi
  FROM v, tot
),
dt AS (SELECT doc_id, token, count(*) AS m FROM tok GROUP BY doc_id, token),
agg AS (
  SELECT doc_id, sum(m * lpi) AS s, sum(m) AS n_tokens
  FROM dt JOIN lp USING (token) GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       round(CAST(s AS DOUBLE) / 1e9 / n_tokens, 6) + 0.0 AS avg_logprob
FROM agg
"""


# ---------------------------------------------------------------------------
# C4-style line/document cleaning (Raffel et al. 2020, "Exploring the Limits
# of Transfer Learning with a Unified Text-to-Text Transformer", §2.2 — the
# public C4 cleaning heuristics)
# ---------------------------------------------------------------------------
def c4_quality_filter(
    docs: DataFrame,
    *,
    text: str = "text",
    doc_id: str = "doc_id",
    min_line_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2, published heuristics):

      line level — keep a line only if it (a) ends in a terminal
      punctuation mark (. ! ? "), (b) has >= min_line_words whitespace
      words, and (c) does not contain the word 'javascript';
      document level — drop the page if it has fewer than min_kept_lines
      surviving lines, or contains 'lorem ipsum', or contains '{'.

    Scale shape: every rule is a per-row higher-order-function column
    expression — ONE whole-stage-codegen scan, zero shuffles, zero UDFs.
    -> (doc_id, n_lines, n_kept_lines, has_lorem, has_brace, keep_doc,
    cleaned) where cleaned is the surviving lines re-joined with \\n."""
    t = F.col(text)
    lines = F.split(t, "\n", -1)

    def _nwords(ln):
        tr = F.trim(ln)
        return F.when(F.length(tr) == 0, F.lit(0)).otherwise(
            F.size(F.split(tr, r"\s+"))
        )

    kept = F.filter(
        lines,
        lambda ln: F.trim(ln).rlike('[.!?"]$')
        & (_nwords(ln) >= min_line_words)
        & ~F.contains(F.lower(ln), F.lit("javascript")),
    )
    has_lorem = F.contains(F.lower(t), F.lit("lorem ipsum"))
    has_brace = F.contains(t, F.lit("{"))
    n_kept = F.size(kept)
    keep_doc = (n_kept >= min_kept_lines) & ~has_lorem & ~has_brace
    return docs.select(
        F.col(doc_id).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        n_kept.cast("long").alias("n_kept_lines"),
        has_lorem.cast("long").alias("has_lorem"),
        has_brace.cast("long").alias("has_brace"),
        keep_doc.cast("long").alias("keep_doc"),
        F.array_join(kept, "\n").alias("cleaned"),
    )


def c4_rules_oracle_sql(
    docs_rel: str = "SELECT * FROM documents",
    *,
    min_line_words: int = 5,
    min_kept_lines: int = 3,
) -> str:
    """DuckDB mirror of c4_quality_filter (identical line split, word
    count, terminal-punctuation / javascript / lorem-ipsum / brace rules)."""
    keep = (
        "regexp_matches(trim(ln), '[.!?\"]$') AND "
        "(CASE WHEN length(trim(ln)) = 0 THEN 0 "
        " ELSE len(regexp_split_to_array(trim(ln), '\\s+')) END)"
        f" >= {min_line_words} AND NOT contains(lower(ln), 'javascript')"
    )
    return f"""
WITH d AS ({docs_rel}),
t AS (
  SELECT doc_id, string_split(text, chr(10)) AS lines,
         contains(lower(text), 'lorem ipsum') AS lorem,
         contains(text, '{{') AS brace
  FROM d
),
k AS (
  SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
         list_filter(lines, ln -> {keep}) AS kept, lorem, brace
  FROM t
)
SELECT doc_id, n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       CAST(lorem AS BIGINT) AS has_lorem,
       CAST(brace AS BIGINT) AS has_brace,
       CAST(len(kept) >= {min_kept_lines} AND NOT lorem AND NOT brace
            AS BIGINT) AS keep_doc,
       COALESCE(array_to_string(kept, chr(10)), '') AS cleaned
FROM k
"""


# ---------------------------------------------------------------------------
# PII detection + redaction (regex patterns are public knowledge; the scan
# is a pure column expression — the standard pre-training scrub pass)
# ---------------------------------------------------------------------------
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9][0-9 -]{6,}[0-9]"


def pii_redact(docs: DataFrame, *, text: str = "text", doc_id: str = "doc_id") -> DataFrame:
    """PII scrub: count and redact emails, IPv4 addresses, and
    international-format phone numbers, in that order (each count runs on
    the text AFTER the previous class was replaced, so overlapping matches
    are never double-counted and the output is order-deterministic).
    Patterns avoid alternation so Java-regex (Spark) and RE2 (DuckDB)
    agree on every match span. One codegen'd scan, zero shuffles.
    -> (doc_id, n_emails, n_ips, n_phones, redacted)."""
    t = F.col(text)
    n_emails = F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0)))
    r1 = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    n_ips = F.size(F.regexp_extract_all(r1, F.lit(PII_IPV4), F.lit(0)))
    r2 = F.regexp_replace(r1, PII_IPV4, "<IP>")
    n_phones = F.size(F.regexp_extract_all(r2, F.lit(PII_PHONE), F.lit(0)))
    r3 = F.regexp_replace(r2, PII_PHONE, "<PHONE>")
    return docs.select(
        F.col(doc_id).alias("doc_id"),
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
        r3.alias("redacted"),
    )


def pii_redact_oracle_sql(docs_rel: str = "SELECT * FROM documents") -> str:
    """DuckDB mirror of pii_redact (same patterns, same email -> ip ->
    phone redaction order, counts on the progressively redacted text)."""
    em, ip, ph = PII_EMAIL, PII_IPV4, PII_PHONE
    return f"""
WITH d AS ({docs_rel}),
s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{em}')) AS BIGINT) AS n_emails,
         regexp_replace(text, '{em}', '<EMAIL>', 'g') AS r1
  FROM d
),
s2 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(r1, '{ip}')) AS BIGINT) AS n_ips,
         regexp_replace(r1, '{ip}', '<IP>', 'g') AS r2
  FROM s1
)
SELECT doc_id, n_emails, n_ips,
       CAST(len(regexp_extract_all(r2, '{ph}')) AS BIGINT) AS n_phones,
       regexp_replace(r2, '{ph}', '<PHONE>', 'g') AS redacted
FROM s2
"""


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, "Data Selection for Language
# Models via Importance Resampling" — public paper): hashed-bigram bag
# features, importance weight = mean log( p_target(bucket) / p_raw(bucket) )
# under add-1-smoothed empirical bucket distributions.
# ---------------------------------------------------------------------------
def dsir_importance(
    docs: DataFrame,
    *,
    text: str = "text",
    doc_id: str = "doc_id",
    source: str = "source",
    target_sources: tuple = ("src0", "src1", "src2", "src3", "src4"),
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR: score every raw document by how target-like its hashed-bigram
    profile is. Word bigrams hash to `n_buckets` buckets via the repo's
    engine-portable 60-bit md5 hash; p_raw comes from ALL docs, p_target
    from docs whose `source` is in target_sources; both add-1 smoothed.

    Determinism contract (same as unigram_logprob_quality): each bucket's
    log-ratio is rounded to 9 dp and scaled to an integer, so the per-doc
    fold is exact long arithmetic — partition- and engine-order invariant;
    only the final mean returns to float (6 dp).

    Scale shape: explode bigrams -> bucket via md5 prefix -> ONE global
    bucket aggregate (map-side combined, <= n_buckets rows) -> broadcast
    1-row totals crossJoin -> (doc, bucket) aggregate -> broadcast equi-join
    on bucket -> one per-doc aggregate. No windows, no UDFs, no collect.
    Docs with < 2 words have no bigrams and are omitted (inner-join
    semantics, mirrored in the oracle).
    -> (doc_id, n_grams, dsir_logweight)."""
    toks = tokens_expr(F.col(text))
    grams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    tgt = F.col(source).isin(*target_sources).cast("long")
    g = docs.filter(F.size(toks) >= 2).select(
        F.col(doc_id).alias("doc_id"),
        tgt.alias("is_tgt"),
        F.explode(grams).alias("gram"),
    )
    bucket = F.pmod(
        F.expr("cast(conv(substr(md5(gram),1,15),16,10) as bigint)"),
        F.lit(n_buckets),
    )
    g = g.select("doc_id", "is_tgt", bucket.alias("b"))
    h = g.groupBy("b").agg(
        F.count(F.lit(1)).alias("n_raw"), F.sum("is_tgt").alias("n_tgt")
    )
    tot = h.agg(F.sum("n_raw").alias("raw_tot"), F.sum("n_tgt").alias("tgt_tot"))
    lw = h.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.round(
                F.log(
                    (F.col("n_tgt") + 1).cast("double")
                    / (F.col("tgt_tot") + n_buckets)
                )
                - F.log(
                    (F.col("n_raw") + 1).cast("double")
                    / (F.col("raw_tot") + n_buckets)
                ),
                9,
            )
            * F.lit(1e9),
            0,
        )
        .cast("long")
        .alias("lwi"),
    )
    db = g.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("m"))
    agg = (
        db.join(lw, "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("m") * F.col("lwi")).alias("s"), F.sum("m").alias("n_grams"))
    )
    return agg.select(
        "doc_id",
        "n_grams",
        (
            F.round(F.col("s").cast("double") / F.lit(1e9) / F.col("n_grams"), 6)
            + F.lit(0.0)
        ).alias("dsir_logweight"),
    )


def dsir_importance_oracle_sql(
    docs_rel: str = "SELECT * FROM documents",
    *,
    target_sources: tuple = ("src0", "src1", "src2", "src3", "src4"),
    n_buckets: int = 256,
) -> str:
    """DuckDB mirror of dsir_importance (identical tokenization, identical
    portable md5-prefix bucket hash, identical 9-dp scaled-integer
    quantization and exact long fold)."""
    tgt_list = ", ".join(f"'{s}'" for s in target_sources)
    return f"""
WITH d AS ({docs_rel}),
t AS (
  SELECT doc_id, CAST(source IN ({tgt_list}) AS BIGINT) AS is_tgt,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
  FROM d
),
g AS (
  SELECT doc_id, is_tgt,
         ('0x'||substr(md5(toks[i] || ' ' || toks[i + 1]),1,15))::BIGINT
           % {n_buckets} AS b
  FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
  WHERE len(toks) >= 2
),
h AS (SELECT b, count(*) AS n_raw, sum(is_tgt) AS n_tgt FROM g GROUP BY b),
tot AS (SELECT sum(n_raw) AS raw_tot, sum(n_tgt) AS tgt_tot FROM h),
lw AS (
  SELECT b,
         CAST(round(round(
             ln(CAST(n_tgt + 1 AS DOUBLE) / (tgt_tot + {n_buckets}))
           - ln(CAST(n_raw + 1 AS DOUBLE) / (raw_tot + {n_buckets})), 9) * 1e9,
           0) AS BIGINT) AS lwi
  FROM h, tot
),
db AS (SELECT doc_id, b, count(*) AS m FROM g GROUP BY doc_id, b),
agg AS (
  SELECT doc_id, sum(m * lwi) AS s, sum(m) AS n_grams
  FROM db JOIN lw USING (b) GROUP BY doc_id
)
SELECT doc_id, n_grams,
       round(CAST(s AS DOUBLE) / 1e9 / n_grams, 6) + 0.0 AS dsir_logweight
FROM agg
"""


# ---------------------------------------------------------------------------
# Full Gopher repetition-removal family (Rae et al. 2021, App. A1.1,
# Table A1 — the complete published rule set; gopher_quality_filter covers
# the doc-quality rules + the n=2 top-gram, this completes the other 12)
# ---------------------------------------------------------------------------
GOPHER_REP_THRESHOLDS = {
    # paper Table A1: remove the doc when the fraction EXCEEDS the threshold
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top2_char_frac": 0.20,
    "top3_char_frac": 0.18,
    "top4_char_frac": 0.16,
    "dup5_char_frac": 0.15,
    "dup6_char_frac": 0.14,
    "dup7_char_frac": 0.13,
    "dup8_char_frac": 0.12,
    "dup9_char_frac": 0.11,
    "dup10_char_frac": 0.10,
}


def _gram_structs(toks, n: int):
    """Array of (n, i, gram) structs for every word n-gram start i
    (1-based); empty when the doc has < n words. Guarded so F.sequence
    never sees start > stop (it would generate a DESCENDING range)."""
    sz = F.size(toks)
    idx = F.sequence(F.lit(1), sz - (n - 1))
    return F.when(
        sz >= n,
        F.transform(
            idx,
            lambda i: F.struct(
                F.lit(n).alias("n"),
                i.alias("i"),
                F.array_join(F.slice(toks, i, n), " ").alias("gram"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<n:int,i:int,gram:string>>"))


def gopher_repetition(
    docs: DataFrame,
    *,
    text: str = "text",
    doc_id: str = "doc_id",
    thresholds: dict = GOPHER_REP_THRESHOLDS,
) -> DataFrame:
    """The complete Gopher repetition family (Rae et al. 2021 App. A1.1),
    one row per doc with all 13 published fractions + a 0/1 `passes` flag
    (pass = no fraction exceeds its Table-A1 threshold):

      - dup line/paragraph fraction: repeated-occurrence share of lines
        (split on \\n, empties included) / paragraphs (split on \\n\\n):
        (occurrences - distinct) / occurrences.
      - dup line/paragraph CHAR fraction: char mass of ALL occurrences of
        duplicated lines/paragraphs over total line/paragraph char mass.
      - top-{2,3,4}-gram char fraction: char mass (sum of word lengths =
        len(gram) - (n-1) spaces, times count) of the most frequent word
        n-gram over total word chars — counted only when it occurs >= 2
        times (a single occurrence is not repetition).
      - dup-{5..10}-gram char fraction: word-stream char mass of the
        DISTINCT word positions covered by any duplicated n-gram, over
        total word chars (overlapping covers count once — the
        position-marking semantics of the public Gopher reproductions).

    Scale shape: every rule is explode -> (doc, key) hash aggregate
    (map-side combined) -> per-doc aggregate -> equi-join; the dup-n
    family marks covered positions by exploding bounded sequence(i, i+n-1)
    ranges and COUNT(DISTINCT position)-style aggregation — never an
    O(words^2) HOF, never a window, never a UDF, so a 100k-word doc costs
    O(6 * words) rows. All arithmetic mirrors 1:1 in the DuckDB oracle.
    -> (doc_id, 13 fraction columns rounded to 6 dp, passes)."""
    t = F.col(text)
    toks = tokens_expr(t)
    base = docs.select(
        F.col(doc_id).alias("doc_id"),
        t.alias("_t"),
        toks.alias("_toks"),
        F.size(toks).cast("long").alias("n_words"),
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
        .alias("word_chars"),
    )

    def unit_family(col_expr, prefix):
        """dup fraction + dup char fraction for one split unit."""
        u = base.select("doc_id", F.explode(col_expr).alias("u"))
        per = u.groupBy("doc_id", "u").agg(F.count(F.lit(1)).alias("c"))
        per = per.withColumn("ln", F.length("u"))
        return per.groupBy("doc_id").agg(
            F.sum("c").alias(f"{prefix}_n"),
            F.count(F.lit(1)).alias(f"{prefix}_d"),
            F.sum(F.col("c") * F.col("ln")).alias(f"{prefix}_chars"),
            F.sum(
                F.when(F.col("c") > 1, F.col("c") * F.col("ln")).otherwise(F.lit(0))
            ).alias(f"{prefix}_dchars"),
        )

    lines = unit_family(F.split(F.col("_t"), "\n", -1), "l")
    paras = unit_family(F.split(F.col("_t"), "\n\n", -1), "p")

    # top-{2,3,4}: char mass of the most frequent n-gram (count >= 2) —
    # one fused explode over all three n, one keyed aggregate, one per-doc
    # conditional-max aggregate (instead of three explode+join chains)
    g234 = base.select(
        "doc_id",
        F.explode(
            F.flatten(
                F.array(*[_gram_structs(F.col("_toks"), n) for n in (2, 3, 4)])
            )
        ).alias("g"),
    ).select("doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
    cnt234 = g234.groupBy("doc_id", "n", "gram").agg(F.count(F.lit(1)).alias("c"))
    tops = cnt234.groupBy("doc_id").agg(
        *[
            F.max(
                F.when(
                    (F.col("n") == n) & (F.col("c") >= 2),
                    F.col("c") * (F.length("gram") - (n - 1)),
                ).otherwise(F.lit(0))
            ).alias(f"top{n}_mass")
            for n in (2, 3, 4)
        ]
    )

    # dup-{5..10}: distinct covered word positions of duplicated n-grams
    occ = base.select(
        "doc_id",
        F.explode(
            F.flatten(
                F.array(*[_gram_structs(F.col("_toks"), n) for n in range(5, 11)])
            )
        ).alias("o"),
    ).select("doc_id", F.col("o.n").alias("n"), F.col("o.i").alias("i"), F.col("o.gram").alias("gram"))
    dup = (
        occ.groupBy("doc_id", "n", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("doc_id", "n", "gram")
    )
    cov = (
        occ.join(dup, ["doc_id", "n", "gram"])
        .select("doc_id", "n", F.explode(F.sequence(F.col("i"), F.col("i") + F.col("n") - 1)).alias("idx"))
        .distinct()
    )
    wl = base.select(
        "doc_id", F.posexplode(F.col("_toks")).alias("p", "w")
    ).select("doc_id", (F.col("p") + 1).alias("idx"), F.length("w").alias("wlen"))
    dupn = (
        cov.join(wl, ["doc_id", "idx"])
        .groupBy("doc_id")
        .agg(
            *[
                F.sum(F.when(F.col("n") == n, F.col("wlen")).otherwise(F.lit(0)))
                .alias(f"dup{n}_mass")
                for n in range(5, 11)
            ]
        )
    )

    out = (
        base.select("doc_id", "n_words", "word_chars")
        .join(lines, "doc_id", "left")
        .join(paras, "doc_id", "left")
        .join(tops, "doc_id", "left")
        .join(dupn, "doc_id", "left")
    )

    def frac(num, den):
        return F.when(
            den > 0, F.coalesce(num, F.lit(0)).cast("double") / den
        ).otherwise(F.lit(0.0))

    fr = {
        "dup_line_frac": frac(F.col("l_n") - F.col("l_d"), F.col("l_n")),
        "dup_para_frac": frac(F.col("p_n") - F.col("p_d"), F.col("p_n")),
        "dup_line_char_frac": frac(F.col("l_dchars"), F.col("l_chars")),
        "dup_para_char_frac": frac(F.col("p_dchars"), F.col("p_chars")),
        "top2_char_frac": frac(F.col("top2_mass"), F.col("word_chars")),
        "top3_char_frac": frac(F.col("top3_mass"), F.col("word_chars")),
        "top4_char_frac": frac(F.col("top4_mass"), F.col("word_chars")),
    }
    for n in range(5, 11):
        fr[f"dup{n}_char_frac"] = frac(F.col(f"dup{n}_mass"), F.col("word_chars"))
    passes = F.lit(True)
    for k, thr in thresholds.items():
        passes = passes & (fr[k] <= thr)
    return out.select(
        "doc_id",
        *[(F.round(v, 6) + F.lit(0.0)).alias(k) for k, v in fr.items()],
        passes.cast("long").alias("passes"),
    )


def gopher_repetition_oracle_sql(
    docs_rel: str = "SELECT * FROM documents",
    *,
    thresholds: dict = GOPHER_REP_THRESHOLDS,
) -> str:
    """DuckDB mirror of gopher_repetition (identical splits, gram char
    masses, distinct-covered-position marking, unrounded passes gate)."""
    tp_cte, tp_join = [], []
    for n in (2, 3, 4):
        tp_cte.append(f"""
g{n} AS (
  SELECT doc_id, array_to_string(toks[i:i+{n - 1}], ' ') AS gram
  FROM b, unnest(generate_series(1, len(toks) - {n - 1})) u(i)
  WHERE len(toks) >= {n}
),
gc{n} AS (SELECT doc_id, gram, count(*) AS c FROM g{n} GROUP BY 1, 2),
tp{n} AS (
  SELECT doc_id,
         max(CASE WHEN c >= 2 THEN c * (length(gram) - {n - 1}) ELSE 0 END)
           AS top{n}_mass
  FROM gc{n} GROUP BY doc_id
)""")
        tp_join.append(f"LEFT JOIN tp{n} USING (doc_id)")
    dup_mass = ", ".join(
        f"sum(CASE WHEN n = {n} THEN wlen ELSE 0 END) AS dup{n}_mass"
        for n in range(5, 11)
    )

    def frac(num, den):
        return (
            f"CASE WHEN {den} > 0 THEN CAST(COALESCE({num}, 0) AS DOUBLE)"
            f" / {den} ELSE 0.0 END"
        )

    fr = {
        "dup_line_frac": frac("l_n - l_d", "l_n"),
        "dup_para_frac": frac("p_n - p_d", "p_n"),
        "dup_line_char_frac": frac("l_dchars", "l_chars"),
        "dup_para_char_frac": frac("p_dchars", "p_chars"),
        "top2_char_frac": frac("top2_mass", "word_chars"),
        "top3_char_frac": frac("top3_mass", "word_chars"),
        "top4_char_frac": frac("top4_mass", "word_chars"),
    }
    for n in range(5, 11):
        fr[f"dup{n}_char_frac"] = frac(f"dup{n}_mass", "word_chars")
    ufr = ", ".join(f"{e} AS {k}_u" for k, e in fr.items())
    sel = ", ".join(f"round({k}_u, 6) + 0.0 AS {k}" for k in fr)
    gate = " AND ".join(f"{k}_u <= {thr!r}" for k, thr in thresholds.items())
    return f"""
WITH d AS ({docs_rel}),
b AS (
  SELECT doc_id, text,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
  FROM d
),
bb AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
         COALESCE(list_sum(list_transform(toks,
             w -> CAST(length(w) AS BIGINT))), 0) AS word_chars
  FROM b
),
lu AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS u FROM d),
lc AS (SELECT doc_id, u, count(*) AS c, length(u) AS ln FROM lu GROUP BY 1, 2),
la AS (
  SELECT doc_id, sum(c) AS l_n, count(*) AS l_d, sum(c * ln) AS l_chars,
         sum(CASE WHEN c > 1 THEN c * ln ELSE 0 END) AS l_dchars
  FROM lc GROUP BY doc_id
),
pu AS (SELECT doc_id, unnest(string_split(text, chr(10) || chr(10))) AS u FROM d),
pc AS (SELECT doc_id, u, count(*) AS c, length(u) AS ln FROM pu GROUP BY 1, 2),
pa AS (
  SELECT doc_id, sum(c) AS p_n, count(*) AS p_d, sum(c * ln) AS p_chars,
         sum(CASE WHEN c > 1 THEN c * ln ELSE 0 END) AS p_dchars
  FROM pc GROUP BY doc_id
),{",".join(tp_cte)},
occ AS (
  SELECT doc_id, n, i, array_to_string(toks[i:i+n-1], ' ') AS gram
  FROM b, unnest(generate_series(5, 10)) nn(n),
       unnest(generate_series(1, len(toks) - n + 1)) u(i)
  WHERE len(toks) >= n
),
dup AS (SELECT doc_id, n, gram FROM occ GROUP BY 1, 2, 3 HAVING count(*) > 1),
cov AS (
  SELECT DISTINCT o.doc_id, o.n, c.idx
  FROM occ o JOIN dup USING (doc_id, n, gram),
       unnest(generate_series(o.i, o.i + o.n - 1)) c(idx)
),
wl AS (
  SELECT doc_id, i AS idx, length(toks[i]) AS wlen
  FROM b, unnest(generate_series(1, len(toks))) w(i)
),
dupn AS (
  SELECT cov.doc_id, {dup_mass}
  FROM cov JOIN wl USING (doc_id, idx) GROUP BY cov.doc_id
),
j AS (
  SELECT bb.doc_id, {ufr}
  FROM bb LEFT JOIN la USING (doc_id) LEFT JOIN pa USING (doc_id)
  {" ".join(tp_join)} LEFT JOIN dupn USING (doc_id)
)
SELECT doc_id, {sel}, CAST({gate} AS BIGINT) AS passes FROM j
"""


# ---------------------------------------------------------------------------
# Multi-language ID (stopword-profile argmax — the dependency-free core of
# the Cavnar-Trenkle / fastText-style profile classifiers; lists are public
# knowledge, 10 high-frequency function words per language)
# ---------------------------------------------------------------------------
LANG_STOPWORDS = {
    "de": ["der", "die", "das", "und", "ein", "eine", "mit", "von", "zu", "ist"],
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "es": ["el", "los", "las", "y", "un", "una", "en", "que", "es", "por"],
    "fr": ["le", "la", "les", "de", "des", "et", "dans", "au", "pour", "sur"],
}


def language_id_multi(
    docs: DataFrame,
    *,
    text: str = "text",
    doc_id: str = "doc_id",
    min_ratio: float = 0.05,
) -> DataFrame:
    """Multi-language ID: per-language stopword-hit ratio, prediction =
    argmax ratio (ties break to the alphabetically first language code —
    deterministic), 'unknown' when the best ratio is under min_ratio.
    One codegen'd scan, zero shuffles; each ratio is a per-row HOF count.
    -> (doc_id, ratio_de, ratio_en, ratio_es, ratio_fr, pred_lang)."""
    toks = tokens_expr(F.col(text))
    n = F.size(toks)
    ratios = {
        lang: F.when(
            n > 0,
            F.size(F.filter(toks, lambda w: F.lower(w).isin(words))).cast("double")
            / n,
        ).otherwise(F.lit(0.0))
        for lang, words in LANG_STOPWORDS.items()
    }
    best = F.greatest(*ratios.values())
    pred = F.lit("unknown")
    # build the when-chain in REVERSE alphabetical order so the final
    # (outermost) match wins for the alphabetically first language on ties
    for lang in sorted(ratios, reverse=True):
        pred = F.when(ratios[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best < min_ratio, F.lit("unknown")).otherwise(pred)
    return docs.select(
        F.col(doc_id).alias("doc_id"),
        *[
            (F.round(ratios[lang], 6) + F.lit(0.0)).alias(f"ratio_{lang}")
            for lang in sorted(ratios)
        ],
        pred.alias("pred_lang"),
    )


def language_id_multi_oracle_sql(
    docs_rel: str = "SELECT * FROM documents", *, min_ratio: float = 0.05
) -> str:
    """DuckDB mirror of language_id_multi (identical lists, tie-break and
    threshold; prediction evaluated on UNROUNDED ratios like the engine)."""
    rat = {
        lang: (
            "CASE WHEN len(toks) > 0 THEN "
            f"CAST(len(list_filter(toks, w -> lower(w) IN "
            f"({', '.join(repr(w) for w in words)}))) AS DOUBLE) / len(toks) "
            "ELSE 0.0 END"
        )
        for lang, words in LANG_STOPWORDS.items()
    }
    cols = ", ".join(f"{e} AS r_{lang}" for lang, e in rat.items())
    langs = sorted(rat)
    best = f"greatest({', '.join('r_' + x for x in langs)})"
    pred = "'unknown'"
    for lang in sorted(langs, reverse=True):
        pred = f"CASE WHEN r_{lang} = best THEN '{lang}' ELSE {pred} END"
    return f"""
WITH d AS ({docs_rel}),
t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS toks
  FROM d
),
r AS (SELECT doc_id, {cols} FROM t),
rb AS (SELECT *, {best} AS best FROM r)
SELECT doc_id,
       {", ".join(f"round(r_{x}, 6) + 0.0 AS ratio_{x}" for x in langs)},
       CASE WHEN best < {min_ratio!r} THEN 'unknown' ELSE {pred} END AS pred_lang
FROM rb
"""
