"""J7: merge an external EDL system's output into the mentions table.

Reference: ``code_ner_bert/unify_edl.py:7-36`` — for every mention, scan the
EDL tab rows of the same form (NAM/NOM) and attach (freebaseId, wikipediaId)
from any row with the same surface text whose char span is within +-1 of the
mention's (NAM matches on the mention span, NOM on the head span; the EDL end
offset is inclusive, so it is compared as ``edl.char_end + 1``).  The
reference's inner loop OVERWRITES on every hit, so the LAST matching tab line
wins — reproduced here with a max-line-number window.

Document scoping: the reference pairs each NER file with ITS OWN EDL file
(unify_edl.py:55-59), so the match is implicitly per-document — char offsets
restart at 0 in every doc.  We make that explicit: the EDL span's ``doc``
prefix (``doc:begin-end``) is parsed and kept, and ``merge_edl`` joins on
(document, surface text) so a multi-doc EDL feed can never bleed ids across
documents.

Spark shape: an EQUI join on (doc, text) plus a band predicate on the
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
    """SRC: parse EDL tab file(s) into (doc, line_no, mention, char_begin,
    char_end, fb_id, wiki_id, form).  Span format ``doc:begin-end``
    (unify_edl.py:12-14); offsets kept as in the file (end inclusive).

    ``path`` may be a single file, a glob, or a directory: line numbers
    are derived per input file (window partitioned by
    ``input_file_name()``) and then composed with the file's lexicographic
    rank into a TOTAL order, so the last-line-wins rule is deterministic
    both within and ACROSS files (a per-file restart would make the winner
    depend on which file a duplicate landed in).  Within a file, splits get
    increasing partition ids in byte-offset order, so
    ``monotonically_increasing_id`` is read-order-stable inside the
    per-file window.
    """
    raw = spark.read.text(path).select(
        F.input_file_name().alias("_src"),
        F.monotonically_increasing_id().alias("_file_order"),
        "value",
    )
    w = Window.partitionBy("_src").orderBy("_file_order")
    parts = F.split(F.col("value"), "\t")
    per_file = raw.withColumn("_file_line", F.row_number().over(w))
    # line_no must be a TOTAL order across files: merge_edl's last-wins rule
    # sorts on it, and a per-file restart would make the winner depend on
    # which file a duplicate landed in.  Files rank lexicographically (the
    # reference reads ONE tab file, so single-file behavior is identical);
    # the composite key leaves 2^32 lines per file.
    file_rank = (
        raw.select("_src").distinct()
        .withColumn("_file_idx",
                    F.row_number().over(Window.orderBy("_src")) - 1)
    )
    return (
        per_file.join(F.broadcast(file_rank), "_src")
        .withColumn(
            "line_no",
            (F.col("_file_idx").cast("bigint") * F.lit(2**32) + F.col("_file_line")),
        )
        .select(
            "line_no",
            *[parts.getItem(i).alias(c) for i, c in enumerate(_EDL_COLS)],
        )
        .withColumn("doc", F.regexp_extract("span", r"^(.*):\d+-\d+$", 1))
        # anchored: the unanchored ':(\d+)-' grabbed the FIRST ':digits-'
        # anywhere in the span, mis-parsing doc ids like 'doc:2020-01:45-67'
        .withColumn("char_begin", F.regexp_extract("span", r":(\d+)-\d+$", 1).cast("int"))
        .withColumn("char_end", F.regexp_extract("span", r"-(\d+)$", 1).cast("int"))
        .select("doc", "line_no", "mention", "char_begin", "char_end",
                "fb_id", "wiki_id", "form")
    )


def merge_edl(mentions: DataFrame, edl: DataFrame) -> DataFrame:
    """J7 (unify_edl.py:19-33): attach fb_id/wiki_id to mentions.

    ``mentions`` must carry ``url`` (its document key); ``edl`` columns:
    (doc, line_no, mention, char_begin, char_end, fb_id, wiki_id, form)
    with form in {NAM, NOM} and char_end INCLUSIVE.  Matches are scoped to
    ``url == doc`` — offsets restart per document, so a cross-document
    surface-text collision must never transfer ids.
    Returns mentions + (fb_id, wiki_id), null where no EDL row matched.
    """
    if "url" not in mentions.columns:
        raise ValueError("merge_edl: mentions must carry a 'url' document key")
    if "doc" not in edl.columns:
        raise ValueError("merge_edl: edl must carry a 'doc' column (span prefix)")
    e = edl.select(
        F.col("doc").alias("e_doc"),
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
        & (F.col("url") == F.col("e_doc"))
        & (F.col("mention") == F.col("e_mention"))
        & (F.abs(F.col("e_begin") - F.col("char_begin")) <= 1)
        & (F.abs(F.col("e_end") - F.col("char_end")) <= 1)
    )
    nom_cond = (
        (F.col("category") == "NOM") & (F.col("e_form") == "NOM")
        & (F.col("url") == F.col("e_doc"))
        & (F.col("headword") == F.col("e_mention"))
        & (F.abs(F.col("e_begin") - F.col("head_begin")) <= 1)
        & (F.abs(F.col("e_end") - F.col("head_end")) <= 1)
    )
    # equi key = (document, surface text); the band rides as a residual
    # predicate.  NAM joins on mention, NOM on headword — two joins, one
    # union, so each keeps a pure equi key (a single join on an OR of equi
    # conditions would degrade to a nested loop).
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
