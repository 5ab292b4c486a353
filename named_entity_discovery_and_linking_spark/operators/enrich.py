"""Enrichment operators completing the SURVEY.md §2 inventory.

  - J8  wiki mapping attach        (linking.py:390-402, 571-574)
  - J10 ru/uk fringe-link merge    (linking.py:533-551)
  - A4  subtype span vote          (run_multi_ner.py:479-491) + the
        distrust rule (ner.py:368-369)
  - J5  subtype attach w/ hierarchy gate (ner.py:367-382, 253-271)
  - A5  gazetteer substring majority vote (gazetteer.py:54-69)

All pure DataFrame ops; the vote/argmax shapes reuse the same
groupBy + row_number pattern as A2/A3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUBTYPE_DISTRUST_MAX_VOTES = 10  # ner.py:368-369


def attach_wiki(links: DataFrame, wiki_mapping: DataFrame) -> DataFrame:
    """J8: add the wikipedia url for refkb-linked rows ('None' rows were
    dropped at load, kb_tsv.load_wiki_mapping).  Broadcast join — the
    mapping is a small dimension."""
    wm = wiki_mapping.select(
        F.concat(F.lit("refkb:"), F.col("eid")).alias("eid"), "wiki_url"
    )
    return links.join(F.broadcast(wm), "eid", "left")


def merge_fringe_links(native: DataFrame, fringe: DataFrame) -> DataFrame:
    """J10 (linking.py:533-551): merge link results for the romanized
    "fringe" surface form with the native-form results; per (mid, eid) the
    confidences ADD, capped at 1.0; candidates found by only one side pass
    through.  Rank is recomputed on the merged confidence."""
    n = native.select("url", "mid", "eid", "cname", F.col("confidence").alias("c_n"), "subcomponent")
    f = fringe.select("mid", "eid", F.col("confidence").alias("c_f"),
                      F.col("cname").alias("cname_f"), F.col("url").alias("url_f"),
                      F.col("subcomponent").alias("sub_f"))
    merged = n.join(f, ["mid", "eid"], "full_outer").select(
        F.coalesce("url", "url_f").alias("url"),
        "mid", "eid",
        F.coalesce("cname", "cname_f").alias("cname"),
        F.least(F.lit(1.0), F.coalesce("c_n", F.lit(0.0)) + F.coalesce("c_f", F.lit(0.0))).alias("confidence"),
        F.coalesce("subcomponent", "sub_f").alias("subcomponent"),
    )
    w = Window.partitionBy("mid").orderBy(F.col("confidence").desc(), F.col("eid").asc())
    return merged.withColumn("rank", F.row_number().over(w))


def subtype_vote(span_votes: DataFrame) -> DataFrame:
    """A4 (run_multi_ner.py:479-491): per predicted span, votes over
    hierarchy-collapsed subtypes; winner + vote share; spans with more than
    SUBTYPE_DISTRUST_MAX_VOTES DISTINCT subtypes are dropped entirely — the
    reference's ``len(nertype) > 10`` (ner.py:368-369) counts the sorted
    (subtype, count) LIST, i.e. distinct subtypes, NOT total vote rows.

    Input rows: (url, sid, tok_begin, tok_end, subtype) — one per model vote.
    Output: (url, sid, tok_begin, tok_end, subtype, votes, vote_share).
    """
    keys = ["url", "sid", "tok_begin", "tok_end"]
    counts = span_votes.groupBy(*keys, "subtype").agg(F.count("*").alias("votes"))
    per_span = counts.groupBy(*keys).agg(
        F.sum("votes").alias("total"), F.count("*").alias("n_distinct_subtypes")
    )
    w = Window.partitionBy(*keys).orderBy(F.col("votes").desc(), F.col("subtype").asc())
    best = counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(per_span, keys)
        .filter(F.col("n_distinct_subtypes") <= SUBTYPE_DISTRUST_MAX_VOTES)
        .select(*keys, "subtype", "votes",
                F.round(F.col("votes") / F.col("total"), 6).alias("vote_share"))
    )


def attach_subtypes(mentions: DataFrame, subtype_spans: DataFrame,
                    hierarchy: DataFrame, end_col: str = "char_end") -> DataFrame:
    """J5 (ner.py:367-382): attach a predicted subtype to a NAM mention when
    the subtype span's END matches the mention span's end, and the subtype
    is legal for the mention's coarse type per SUBTYPE_HIERARCHY.

    COORDINATE CONTRACT: the reference matches ``ner['token_span'][1] ==
    span[1]`` — TOKEN indices.  ``subtype_spans.tok_end`` and the mentions
    column named by ``end_col`` must therefore be in the SAME coordinate
    space; callers composing with a token-indexed voter pass their mentions'
    token-end column, callers with char-offset spans pass a char column.
    (The default ``char_end`` matches the driver fixture, which synthesizes
    both sides from one position value.)

    When ``subtype_spans`` carries a ``votes`` column (subtype_vote's raw
    per-subtype counts), candidates are tried in (votes desc, subtype asc)
    order and the FIRST LEGAL one wins — the reference sorts the vote list
    and breaks on the first hierarchy hit, so an illegal top subtype falls
    through to the runner-up instead of attaching nothing.  Exactly one
    subtype attaches per mention (the reference's dict-overwrite keeps one);
    without votes the tie-break is (subtype asc, span end)."""
    has_votes = "votes" in subtype_spans.columns
    sel = [
        subtype_spans.url.alias("s_url"), subtype_spans.sid.alias("s_sid"),
        subtype_spans.tok_end.alias("s_end"),
        subtype_spans.subtype.alias("pred_subtype"),
        hierarchy.type.alias("h_type"),
    ]
    if has_votes:
        sel.append(subtype_spans.votes.alias("s_votes"))
    legal = subtype_spans.join(
        F.broadcast(hierarchy),
        (subtype_spans.subtype == hierarchy.subtype),
    ).select(*sel)
    joined = mentions.join(
        legal,
        (mentions.url == F.col("s_url"))
        & (mentions.sid == F.col("s_sid"))
        & (mentions[end_col] == F.col("s_end"))
        & (mentions.coarse_type == F.col("h_type")),
        "left",
    )
    order = ([F.col("s_votes").desc_nulls_last()] if has_votes else []) + [
        F.col("pred_subtype").asc_nulls_last(), F.col("s_end").asc_nulls_last(),
    ]
    w = Window.partitionBy("mid").orderBy(*order)
    joined = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", *(["s_votes"] if has_votes else []))
    )
    return joined.withColumn(
        "subtype", F.coalesce(F.col("pred_subtype"), F.col("subtype"))
    ).drop("s_url", "s_sid", "s_end", "pred_subtype", "h_type")


def gazetteer_substring_vote(mentions: DataFrame, gaz: DataFrame) -> DataFrame:
    """A5/J4 (gazetteer.py:54-69 lookup_per): gazetteer names CONTAINED in
    the lowercased mention each vote for their fine type; majority wins
    (ties -> lexicographically smallest type).  Expressed as a broadcast
    theta-join (containment predicate) + vote — the reference's per-mention
    substring scan over 5,290 keys, vectorized.

    Scale note: the containment predicate has no equi component, so this is
    a broadcast nested-loop by design — cost is |mentions| x |gaz|
    comparisons, LINEAR per mention with |gaz| (a few thousand rows) as the
    constant, identical to the reference's cost model.  It does NOT grow
    with the corpus squared; the gazetteer side must stay
    broadcast-small."""
    m = mentions.select("mid", F.lower(F.col("mention")).alias("m_low"))
    g = gaz.select(F.lower(F.col("name")).alias("g_name"), "fine_type")
    hits = m.join(F.broadcast(g), F.col("m_low").contains(F.col("g_name")))
    counts = hits.groupBy("mid", "fine_type").agg(F.count("*").alias("votes"))
    w = Window.partitionBy("mid").orderBy(F.col("votes").desc(), F.col("fine_type").asc())
    return counts.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select(
        "mid", F.col("fine_type").alias("voted_type"), "votes"
    )
