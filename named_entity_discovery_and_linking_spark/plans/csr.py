"""E3: CSR linking with coref + per-language routing (linking.py:480-700,
``--run_csr --en|--ru|--uk|--img``).

Route differences (linking.py:504-555):
  en  — context = the referenced sentence's text (IoU disambiguation uses it)
  ru/uk — empty context; if the native form linked AND the frame carries a
          romanized ``fringe`` form, the fringe's link results merge in
          (J10: per-eid confidence sum capped at 1.0, re-ranked)
  img — mention text = the frame label, empty context

NILs are looked up against the temporary KB but never count-promoted
(``link_mentions(promote=False)``); new entities appear only through
cluster election (A3 -> subcomponent 2, score 1.0, linking.py:654-666).
Coref clusters are CONSUMED from the CSR relation_evidence frames —
exactly the reference's consumption contract — and the same A2 vote /
A3 election operators the cross-document canonicalizer uses apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.canonicalize import cluster_link_vote, elect_best_mention
from ..operators.enrich import merge_fringe_links
from ..operators.linking import link_mentions

LANGS = ("en", "ru", "uk", "img")
COMPONENT = "opera.entities.edl.refkb.xianyang"


def _csr_mentions(entities: DataFrame, sentences: DataFrame, lang: str,
                  fringe: bool = False) -> DataFrame:
    """Entity frames -> the mentions shape link_mentions consumes.
    mid = frame id (unique per doc corpus); F10 named-form filter."""
    e = entities.filter(F.col("form") == "named")  # F10, linking.py:519-520
    text = F.col("label") if lang == "img" else F.col("text")
    if fringe:
        # linking.py:534-537: fne mention = fringe[1:] (leading marker char)
        e = e.filter(F.col("fringe").isNotNull())
        text = F.expr("substring(fringe, 2)")
    if lang == "en":
        e = e.join(
            sentences.select(
                F.col("doc").alias("s_doc"), F.col("sent_id"), "sent_text"
            ),
            (F.col("doc") == F.col("s_doc")) & (F.col("sent_ref") == F.col("sent_id")),
            "left",
        )
        ctx = F.coalesce("sent_text", F.lit(""))
    else:
        ctx = F.lit("")  # ru/uk/img query with empty context (linking.py:533,555)
    return e.select(
        F.col("doc").alias("url"),
        F.col("frame_id").alias("mid"),
        F.lit("NAM").alias("category"),
        text.alias("mention"),
        F.col("enttype").alias("type"),
        ctx.alias("sent_text"),
    ).filter(F.col("mention").isNotNull())


def link_csr(entities: DataFrame, sentences: DataFrame, clusters: DataFrame,
             kb: DataFrame, aliases: DataFrame, lang: str) -> DataFrame:
    """Per-frame xref rows: (doc, frame_id, eid, cname, confidence,
    subcomponent).  Applies the route's linking, the J10 fringe merge
    (ru/uk), then the cluster pass: A2 vote re-links every member of a
    cluster with >=1 linked member; A3 elects + registers for fully-NIL
    clusters (subcomponent 2, score 1.0)."""
    if lang not in LANGS:
        raise ValueError(f"lang must be one of {LANGS}")
    native = link_mentions(_csr_mentions(entities, sentences, lang), kb, aliases,
                           promote=False).localCheckpoint()
    if lang in ("ru", "uk"):
        fr_mentions = _csr_mentions(entities, sentences, lang, fringe=True)
        # the reference queries the fringe only when the NATIVE form linked
        # (linking.py:538) — and the fringe merge applies to refkb results
        fr_mentions = fr_mentions.join(
            native.filter(F.col("subcomponent") == 0).select("mid").distinct(),
            "mid", "left_semi",
        )
        fringe_links = link_mentions(fr_mentions, kb, aliases, promote=False).filter(
            F.col("subcomponent") == 0
        )
        native = merge_fringe_links(
            native.filter(F.col("subcomponent") == 0), fringe_links
        ).unionByName(
            native.filter(F.col("subcomponent") != 0), allowMissingColumns=True
        )
    top = native.filter(F.col("rank") == 1).select(
        "url", "mid", "eid", "cname", "confidence", "subcomponent",
        F.lit(1).alias("rank"),  # cluster_link_vote filters on rank itself
    ).localCheckpoint()

    clu = clusters.select(F.col("member").alias("mid"), "cluster_id")
    # A2 (linking.py:667-690): cluster_link_vote already re-links EVERY
    # member of a cluster with >=1 linked member to the vote winner; the
    # winner's subcomponent follows its KB space (refkb -> 0, tmpkb -> 1)
    voted = cluster_link_vote(clu, top).select(
        "mid", "eid", "cname", "confidence",
        F.when(F.col("eid").startswith("tmpkb:"), 1).otherwise(0).alias("subcomponent"),
    )
    # A3 (linking.py:624-666): fully-NIL clusters elect a best mention ->
    # new tmp entity, subcomponent 2, score 1.0, type-gated
    mention_surface = _csr_mentions(entities, sentences, lang).select(
        "mid", "mention", F.substring("type", 8, 3).alias("coarse_type"),
        F.lit("NAM").alias("category"),
    )
    linked_clusters = clu.join(top.select("mid").distinct(), "mid", "left_semi") \
        .select("cluster_id").distinct()
    fully_nil = clu.select("cluster_id").distinct().join(
        linked_clusters, "cluster_id", "left_anti"
    )
    elected = elect_best_mention(
        clu.join(fully_nil, "cluster_id", "left_semi"), mention_surface
    ).filter(
        F.col("coarse_type").isin("GPE", "LOC", "FAC", "PER", "ORG", "VEH", "WEA")
    ).select(
        "cluster_id",
        F.concat(
            F.lit("tmpkb:@"),
            F.substring(F.sha1(F.concat_ws("|", F.lower("best_mention"), "coarse_type")), 1, 12),
        ).alias("e_eid"),
        F.lower(F.col("best_mention")).alias("e_cname"),
    )
    elected_members = clu.join(elected, "cluster_id").select(
        "mid", F.col("e_eid").alias("eid"), F.col("e_cname").alias("cname"),
        F.lit(1.0).alias("confidence"), F.lit(2).alias("subcomponent"),
    )
    # frames outside any cluster keep their direct link
    solo = top.join(clu, "mid", "left_anti").select(
        "mid", "eid", "cname", "confidence", "subcomponent"
    )
    out = voted.unionByName(solo).unionByName(elected_members)
    frame_doc = entities.select(F.col("frame_id").alias("mid"), "doc")
    return out.join(frame_doc, "mid").select(
        "doc", F.col("mid").alias("frame_id"), "eid", "cname", "confidence", "subcomponent"
    )


def xref_records(linked: DataFrame):
    """linked rows -> {frame_id: [xref dicts]} per doc, in the reference's
    record shape (linking.py:564-568)."""
    out: dict = {}
    for r in linked.collect():
        rec = {
            "@type": "db_reference",
            "component": COMPONENT,
            "id": r["eid"],
            "canonical_name": r["cname"],
            "score": r["confidence"],
            "subcomponent": r["subcomponent"],
        }
        out.setdefault(r["doc"], {}).setdefault(r["frame_id"], []).append(rec)
    return out


def run_csr(spark, in_dir: str, out_dir: str, lang: str, kb=None, aliases=None) -> int:
    """The --run_csr CLI equivalent: read in_dir/*.csr.json, link per the
    language route, rewrite each file under out_dir with xref records.
    The per-file JSON rewrite is driver-side (files are small; at corpus
    scale swap append_xrefs_to_csr into a foreachPartition over file
    paths)."""
    import os

    from ..sources.csr_json import append_xrefs_to_csr, read_csr_dir

    if kb is None:
        from ..fixtures.generator import kb_dfs

        kb, aliases = kb_dfs(spark)
    entities, sentences, clusters = read_csr_dir(spark, in_dir)
    linked = link_csr(entities, sentences, clusters, kb, aliases, lang)
    by_doc = xref_records(linked)
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for fname in sorted(os.listdir(in_dir)):
        if not fname.endswith(".csr.json"):
            continue
        append_xrefs_to_csr(
            os.path.join(in_dir, fname), os.path.join(out_dir, fname),
            by_doc.get(fname, {}),
        )
        n += 1
    return n
