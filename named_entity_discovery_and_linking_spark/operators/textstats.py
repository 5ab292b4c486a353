"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.  All pure Column expressions (whole-stage codegen,
no UDFs), each replicable in ANSI SQL for the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import seeded_hash

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": ["the", "a", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "en", "los"],
    "fr": ["le", "la", "de", "et", "les", "des", "un"],
    "de": ["der", "die", "das", "und", "von", "mit", "ein"],
}

FINGERPRINT_MOD = 1_000_000_007

# GPT-2-style pre-tokenizer, restricted to the RE2 ∩ Java-regex subset (no
# lookarounds) so Spark and the DuckDB oracle count identically: English
# contractions, space-prefixed letter runs, digit runs, punctuation runs.
# Counts tokens (coverage of stray whitespace is not attempted) — the cheap
# proxy for "how many BPE tokens will this document cost".
BPE_TOKEN_RE = r"'(s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\p{L}\p{N} ]+"


def _tokens(text_col):
    return F.split(F.col(text_col), " ")


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: per language, the fraction of tokens that are
    that language's stopwords; argmax wins, ties broken by language code.
    (id, pred_lang, lang_score)."""
    ts = _tokens(text_col)
    n = F.size(ts)
    scores = {}
    for lang, words in sorted(LANG_PROFILES.items()):
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(ts, lambda t: F.array_contains(arr, t)))
        scores[lang] = F.round(hits / n, 6)
    # argmax with ties resolved toward the lexicographically smallest lang:
    # explicit chained whens so the DuckDB oracle's CASE chain matches exactly
    langs = sorted(LANG_PROFILES)
    pred, score = None, None
    for i, lang in enumerate(langs):
        cond = None
        for other in langs[i + 1:]:
            c = scores[lang] >= scores[other]
            cond = c if cond is None else cond & c
        cond = cond if cond is not None else F.lit(True)
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
        score = F.when(cond, scores[lang]) if score is None else score.when(cond, scores[lang])
    return df.select(F.col(id_col), pred.alias("pred_lang"), score.alias("lang_score"))


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality features + score: token count, mean token length,
    stopword ratio, alpha ratio.  quality is an INTEGER 0..100 computed from
    exact integer arithmetic (floor((50*stop_hits*L + 30*alpha*N + 20*N*L) /
    (N*L))) so the DuckDB oracle matches bit-for-bit — a float-weighted score
    hits round-half boundary disagreements between engines."""
    ts = _tokens(text_col)
    n_tok = F.size(ts)
    en = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    stop_hits = F.size(F.filter(ts, lambda t: F.array_contains(en, t)))
    stop_ratio = F.round(stop_hits / n_tok, 6)
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", ""))
    n_chars = F.length(text_col)
    alpha_ratio = F.round(alpha_chars / n_chars, 6)
    mean_len = F.round((n_chars - n_tok + 1) / n_tok, 6)
    bonus = F.when((n_tok >= 10) & (n_tok <= 1000), 20).otherwise(0)
    score = F.floor(
        (stop_hits * 50 * n_chars + alpha_chars * 30 * n_tok + bonus * n_tok * n_chars)
        / (n_tok * n_chars)
    ).cast("bigint")
    return df.select(
        F.col(id_col), n_tok.alias("n_tokens"), mean_len.alias("mean_tok_len"),
        stop_ratio.alias("stop_ratio"), alpha_ratio.alias("alpha_ratio"),
        score.alias("quality"),
    )


def gopher_filter(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    min_words: int = 20, max_words: int = 80,
    min_mean_len: int = 3, max_mean_len: int = 10,
    min_stop_hits: int = 2, min_distinct_pct: int = 40,
) -> DataFrame:
    """Composite quality-filter DECISION (the Gopher/MassiveText rule family):
    word-count bounds, mean-word-length bounds, minimum stopword evidence,
    and a minimum distinct-word fraction (the repetition proxy that survives
    single-line web text).  This is the step the scalar signals
    (:func:`quality_score`, :func:`repetition_stats`) exist to feed — the
    keep/drop bit a curation pipeline actually acts on.

    Every criterion is an INTEGER comparison (mean length via cross
    multiplication: min*n <= word_chars <= max*n; distinct fraction via
    distinct*100 >= n*pct), so the DuckDB oracle matches bit-for-bit with no
    float-rounding hazards.  Pure Column expressions: one scan, no shuffle,
    whole-stage codegen — at 100 TB this is a map-only pass whose predicates
    Parquet/Iceberg can pushdown-prune on after materialization.
    Returns (id, n_words, ok_words, ok_mean_len, ok_stop, ok_distinct, keep).
    """
    f = _gopher_flags(text_col, min_words, max_words, min_mean_len,
                      max_mean_len, min_stop_hits, min_distinct_pct)
    return df.select(
        F.col(id_col), f["n_words"].alias("n_words"),
        f["ok_words"].alias("ok_words"), f["ok_mean_len"].alias("ok_mean_len"),
        f["ok_stop"].alias("ok_stop"), f["ok_distinct"].alias("ok_distinct"),
        f["keep"].alias("keep"),
    )


def _gopher_flags(text_col, min_words=20, max_words=80, min_mean_len=3,
                  max_mean_len=10, min_stop_hits=2, min_distinct_pct=40):
    """The gopher_filter criteria as reusable Column expressions, so callers
    (the per-doc decision, the corpus rollup) stay single-scan."""
    ts = _tokens(text_col)
    n_tok = F.size(ts)
    word_chars = F.length(F.regexp_replace(F.col(text_col), " ", ""))
    en = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    stop_hits = F.size(F.filter(ts, lambda t: F.array_contains(en, t)))
    n_distinct = F.size(F.array_distinct(ts))
    ok_words = (n_tok >= min_words) & (n_tok <= max_words)
    ok_mean_len = (word_chars >= min_mean_len * n_tok) & (word_chars <= max_mean_len * n_tok)
    ok_stop = stop_hits >= min_stop_hits
    ok_distinct = n_distinct * 100 >= n_tok * min_distinct_pct
    return {
        "n_words": n_tok, "ok_words": ok_words, "ok_mean_len": ok_mean_len,
        "ok_stop": ok_stop, "ok_distinct": ok_distinct,
        "keep": ok_words & ok_mean_len & ok_stop & ok_distinct,
    }


def curation_report(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                    strata_col: str = "lang", **gopher_kwargs) -> DataFrame:
    """Corpus-level curation observability: per (stratum, keep-decision),
    how many documents and tokens the :func:`gopher_filter` decision keeps
    and drops — the summary table an operator reads before committing a
    filtered corpus.  SINGLE scan: the decision columns are inlined next to
    the stratum (no self-join back on the id) and the groupBy's map-side
    partials reduce to |strata| * 2 rows before the shuffle — trivially
    small at any corpus size."""
    f = _gopher_flags(text_col, **gopher_kwargs)
    return (
        df.select(F.col(strata_col), f["keep"].alias("keep"),
                  f["n_words"].alias("n_words"))
        .groupBy(strata_col, "keep")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("n_tokens"),
        )
    )


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars, n_distinct, n_bpe_tokens): the cheap curation
    counters — whitespace tokens plus the BPE-ish pre-tokenizer count."""
    ts = _tokens(text_col)
    return df.select(
        F.col(id_col), F.size(ts).alias("n_tokens"),
        F.length(text_col).alias("n_chars_m"),
        F.size(F.array_distinct(ts)).alias("n_distinct"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), F.lit(0))
        ).alias("n_bpe_tokens"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Order-sensitive document fingerprint: sum over positions of
    h(pos || ':' || token) mod p.  Portable to SQL (same hash family);
    order-sensitive because the position is baked into the hash input."""
    ts = _tokens(text_col)
    terms = F.transform(
        ts, lambda t, i: seeded_hash(F.concat(i.cast("string"), F.lit(":"), t), 7) % FINGERPRINT_MOD
    )
    fp = F.aggregate(terms, F.lit(0).cast("bigint"), lambda acc, v: acc + v) % FINGERPRINT_MOD
    return df.select(F.col(id_col), fp.alias("fingerprint"))


# PII patterns: simple classes + bounded quantifiers only, so Java regex
# (Spark) and RE2 (DuckDB oracle) agree on every match.  No backrefs, no
# lookaround.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+?\d(?:[\- ]?\d){7,14}"


def pii_scrub(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Redact emails, IPv4s, and phone-like digit runs — the standard
    pre-training scrub pass.  Counts are taken on the PROGRESSIVELY
    scrubbed text (emails on raw, IPs after email redaction, phones after
    IP redaction) so a digit run inside an already-redacted span is never
    double-counted; the replace chain mirrors the same order.  Pure Column
    regexp expressions — whole-stage codegen, one scan, no shuffle.
    Returns (id, text_clean, n_emails, n_ips, n_phones)."""
    t0 = F.col(text_col)
    n_em = F.regexp_count(t0, F.lit(PII_EMAIL_RE))
    t1 = F.regexp_replace(t0, PII_EMAIL_RE, "<EMAIL>")
    n_ip = F.regexp_count(t1, F.lit(PII_IPV4_RE))
    t2 = F.regexp_replace(t1, PII_IPV4_RE, "<IP>")
    n_ph = F.regexp_count(t2, F.lit(PII_PHONE_RE))
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col), t3.alias("text_clean"),
        n_em.cast("bigint").alias("n_emails"),
        n_ip.cast("bigint").alias("n_ips"),
        n_ph.cast("bigint").alias("n_phones"),
    )


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", n: int = 2) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText family of
    repetition filters, adapted to n-grams since web text arrives as one
    line after extraction): duplicate-n-gram fraction (1 - distinct/total)
    and the share of the single most frequent n-gram.  Explode + two-level
    groupBy — partial aggregation is map-side, the shuffle carries one row
    per (doc, distinct gram), same linear shape as simhash.
    Returns (id, total_ngrams, distinct_ngrams, dup_ngram_frac,
    top_ngram_frac)."""
    from .dedup import shingles_col

    g = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles_col(text_col, n)).alias("g"),
    )
    cnt = g.groupBy("doc", "g").agg(F.count("*").alias("cnt"))
    return (
        cnt.groupBy("doc")
        .agg(
            F.sum("cnt").alias("total_ngrams"),
            F.count("*").alias("distinct_ngrams"),
            F.max("cnt").alias("maxc"),
        )
        .select(
            F.col("doc").alias(id_col), "total_ngrams", "distinct_ngrams",
            F.round(1 - F.col("distinct_ngrams") / F.col("total_ngrams"), 6).alias("dup_ngram_frac"),
            F.round(F.col("maxc") / F.col("total_ngrams"), 6).alias("top_ngram_frac"),
        )
    )
