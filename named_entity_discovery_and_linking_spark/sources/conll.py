"""CoNLL reader/writer + mention-F1 scorer (SRC8, SURVEY.md §2.1/§5).

The reference trains/evaluates through 6-column CoNLL files
(``token_id word -- -- gold pred``, blank-line sentence separator;
reference ``code_ner_bert/run_ner.py:151-176``, ``result2conll.py:4-22``)
and scores them with the classic conll03eval.v2 perl script
(``ner.py:191-202``).  Here: a Spark reader (group-by-blank-line), a writer,
and a pure-Python phrase-level P/R/F1 scorer with conlleval semantics
(exact-boundary, exact-type phrase match over BIO tags).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """Read 6-col CoNLL into (sent_id, token_id, word, gold, pred) rows.
    Sentence boundaries = blank lines; sentence ids are per-file ordinal.

    Implementation: read lines with per-file order preserved via
    ``input_file_name`` + a zipWithIndex-free window (monotonic id is safe
    within a file read order for line-based text at this scale; the test
    harness only reads single files)."""
    lines = spark.read.text(path).withColumn("_fid", F.input_file_name())
    lines = lines.withColumn("_lid", F.monotonically_increasing_id())
    # sentence id = number of blank lines seen so far (running count)
    from pyspark.sql import Window

    w = Window.partitionBy("_fid").orderBy("_lid")
    lines = lines.withColumn(
        "sent_id", F.sum(F.when(F.trim("value") == "", 1).otherwise(0)).over(w)
    )
    toks = lines.filter(F.trim("value") != "").withColumn(
        "parts", F.split(F.trim("value"), r"\s+")
    )
    # lines with fewer than 6 columns ('-DOCSTART- O' boundaries, malformed
    # rows) are dropped like blank lines — getItem would return NULLs that
    # crash the scorer far from the offending input
    toks = toks.filter(F.size("parts") >= 6)
    return toks.select(
        "sent_id",
        F.col("parts").getItem(0).alias("token_id"),
        F.col("parts").getItem(1).alias("word"),
        F.col("parts").getItem(4).alias("gold"),
        F.col("parts").getItem(5).alias("pred"),
    )


def mentions_to_conll(mentions: DataFrame) -> DataFrame:
    """Project a mentions table into per-token BIO rows for scoring
    (result2conll.py:4-22 direction).  Returns (url, sid, token_idx, word,
    bio) rows for NAM mentions; tokens outside mentions are not emitted
    (the scorer joins against gold tokens, missing rows = 'O')."""
    m = mentions.filter(F.col("category") == "NAM")
    toks = m.select(
        "url", "sid", "char_begin",
        F.posexplode(F.split("mention", " ")).alias("token_idx", "word"),
        F.substring(F.col("type"), 8, 3).alias("etype"),
    )
    bio = F.when(F.col("token_idx") == 0, F.concat(F.lit("B-"), F.col("etype"))).otherwise(
        F.concat(F.lit("I-"), F.col("etype"))
    )
    return toks.select("url", "sid", "char_begin", "token_idx", "word", bio.alias("bio"))


def _phrases(tags: list[str]) -> set[tuple[int, int, str]]:
    """BIO tags -> {(begin, end, type)} phrases, conlleval semantics:
    a chunk starts on B-, on I- after O, AND on I- whose type differs from
    the running chunk's (conll03eval's startOfChunk 'prevType != type'
    rule) — [I-ORG, I-PER] is ORG(0,1) + PER(1,2), the PER token is not
    swallowed."""
    out = set()
    start, cur = None, None
    for i, t in enumerate(tags + ["O"]):
        if t.startswith("B-"):
            if cur is not None:
                out.add((start, i, cur))
            start, cur = i, t[2:]
        elif t.startswith("I-"):
            if cur is None:
                start, cur = i, t[2:]
            elif cur != t[2:]:
                out.add((start, i, cur))
                start, cur = i, t[2:]
        else:
            if cur is not None:
                out.add((start, i, cur))
            start, cur = None, None
    return out


def conll_f1(rows) -> dict:
    """Phrase-level precision/recall/F1 over (sent_id, gold, pred) rows —
    the conll03eval.v2 headline numbers (ner.py:191-202 parses the same).
    ``rows``: iterable of Row/tuple with sent_id, gold, pred in token order."""
    by_sent: dict = {}
    for r in rows:
        by_sent.setdefault(r[0], []).append((r[1], r[2]))
    tp = fp = fn = correct = total = 0
    for sent in by_sent.values():
        gold_tags = [g for g, _ in sent]
        pred_tags = [p for _, p in sent]
        total += len(sent)
        correct += sum(1 for g, p in sent if g == p)
        g = _phrases(gold_tags)
        p = _phrases(pred_tags)
        tp += len(g & p)
        fp += len(p - g)
        fn += len(g - p)
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {
        "accuracy": correct / total if total else 0.0,
        "precision": prec, "recall": rec, "f1": f1,
        "gold_phrases": tp + fn, "found_phrases": tp + fp,
    }
