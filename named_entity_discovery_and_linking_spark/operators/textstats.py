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


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_tokens, n_chars, n_distinct): the cheap curation counters."""
    ts = _tokens(text_col)
    return df.select(
        F.col(id_col), F.size(ts).alias("n_tokens"),
        F.length(text_col).alias("n_chars_m"),
        F.size(F.array_distinct(ts)).alias("n_distinct"),
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
