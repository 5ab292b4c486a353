"""J7: merge an external EDL system's output into the mentions table.

Reference: ``code_ner_bert/unify_edl.py:7-36`` — for every mention, scan the
EDL tab rows of the same form (NAM/NOM) and attach (freebaseId, wikipediaId)
from any row with the same surface text whose char span is within +-1 of the
mention's (NAM matches on the mention span, NOM on the head span; the EDL end
offset is inclusive, so it is compared as ``edl.char_end + 1``).  The
reference's inner loop OVERWRITES on every hit, so the LAST matching tab line
wins — reproduced here with a max-line-number window.

Spark shape: an EQUI join on the mention text plus a band predicate on the
offsets — a hash join with a residual filter, never a nested loop (the equi
key carries the join).  The EDL side of a real corpus is the same order of
magnitude as the mentions side, so no broadcast hint: AQE picks the strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the 11 tab-separated EDL columns (unify_edl.py:11)
_EDL_COLS = [
    "c0", "c1", "mention", "span", "fb_id", "ner", "form", "c7",
    "expanded_mention", "ner_stanford", "wiki_id",
]


def read_edl_tab(spark, path: str) -> DataFrame:
    """SRC: parse an EDL tab file into (line_no, mention, char_begin,
    char_end, fb_id, wiki_id, form).  Span format ``doc:begin-end``
    (unify_edl.py:12-14); offsets kept as in the file (end inclusive)."""
    raw = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("_file_order"), "value"
    )
    # line numbers must be content-stable for the last-wins rule; the file is
    # read in order within a partition, and a single text file is one
    # partition — still, derive line_no from a window over the read order.
    w = Window.orderBy("_file_order")
    parts = F.split(F.col("value"), "\t")
    return (
        raw.withColumn("line_no", F.row_number().over(w))
        .select(
            "line_no",
            *[parts.getItem(i).alias(c) for i, c in enumerate(_EDL_COLS)],
        )
        .withColumn("char_begin", F.regexp_extract("span", r":(\d+)-", 1).cast("int"))
        .withColumn("char_end", F.regexp_extract("span", r"-(\d+)$", 1).cast("int"))
        .select("line_no", "mention", "char_begin", "char_end", "fb_id", "wiki_id", "form")
    )


def merge_edl(mentions: DataFrame, edl: DataFrame) -> DataFrame:
    """J7 (unify_edl.py:19-33): attach fb_id/wiki_id to mentions.

    ``edl`` columns: (line_no, mention, char_begin, char_end, fb_id,
    wiki_id, form) with form in {NAM, NOM} and char_end INCLUSIVE.
    Returns mentions + (fb_id, wiki_id), null where no EDL row matched.
    """
    e = edl.select(
        F.col("line_no").alias("e_line"),
        F.col("mention").alias("e_mention"),
        F.col("char_begin").alias("e_begin"),
        (F.col("char_end") + 1).alias("e_end"),  # inclusive -> exclusive
        F.col("fb_id").alias("e_fb"),
        F.col("wiki_id").alias("e_wiki"),
        F.col("form").alias("e_form"),
    )
    nam_cond = (
        (F.col("category") == "NAM") & (F.col("e_form") == "NAM")
        & (F.col("mention") == F.col("e_mention"))
        & (F.abs(F.col("e_begin") - F.col("char_begin")) <= 1)
        & (F.abs(F.col("e_end") - F.col("char_end")) <= 1)
    )
    nom_cond = (
        (F.col("category") == "NOM") & (F.col("e_form") == "NOM")
        & (F.col("headword") == F.col("e_mention"))
        & (F.abs(F.col("e_begin") - F.col("head_begin")) <= 1)
        & (F.abs(F.col("e_end") - F.col("head_end")) <= 1)
    )
    # equi key = surface text; the band rides as a residual predicate.
    # NAM joins on mention, NOM on headword — two joins, one union, so each
    # keeps a pure equi key (a single join on an OR of equi conditions would
    # degrade to a nested loop).
    nam = mentions.filter(F.col("category") == "NAM").join(
        e.filter(F.col("e_form") == "NAM"), nam_cond, "left"
    )
    nom = mentions.filter(F.col("category") == "NOM").join(
        e.filter(F.col("e_form") == "NOM"), nom_cond, "left"
    )
    rest = mentions.filter(~F.col("category").isin("NAM", "NOM")).select(
        "*", F.lit(None).cast("bigint").alias("e_line"),
        F.lit(None).cast("string").alias("e_fb"), F.lit(None).cast("string").alias("e_wiki"),
    )
    merged = nam.unionByName(nom, allowMissingColumns=True).select(
        *mentions.columns, "e_line", "e_fb", "e_wiki"
    ).unionByName(rest)
    # last matching tab line wins (the reference loop overwrites per hit)
    w = Window.partitionBy("mid").orderBy(F.col("e_line").desc_nulls_last())
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "e_line")
        .withColumnRenamed("e_fb", "fb_id")
        .withColumnRenamed("e_wiki", "wiki_id")
    )
