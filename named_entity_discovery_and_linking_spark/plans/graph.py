"""E3: links + clusters -> triples / nodes / edges tables.

The reference serializes per-mention ``xref`` records into CSR JSON
(linking.py:557-700); our comparison surface is an explicit triples table
(SURVEY.md §1.1-12): preds rdf:type, aida:linksTo, aida:sameAs,
aida:anchorOf.  nodes/edges are the Iceberg-shaped graph materialization
(parquet in the sandbox — no Iceberg runtime jar; see sources/io.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.canonicalize import canonical_entities, cluster_mentions


def build_triples(mentions: DataFrame, links: DataFrame, clusters: DataFrame,
                  entities: DataFrame) -> DataFrame:
    """(subj, pred, obj, conf, url, char_begin, char_end)."""
    m = mentions.select("mid", "url", "mention", "type", "score", "char_begin", "char_end")
    t_type = m.select(
        F.col("mid").alias("subj"), F.lit("rdf:type").alias("pred"),
        F.col("type").alias("obj"), F.col("score").alias("conf"),
        "url", "char_begin", "char_end",
    )
    t_anchor = m.select(
        F.col("mid").alias("subj"), F.lit("aida:anchorOf").alias("pred"),
        F.col("mention").alias("obj"), F.col("score").alias("conf"),
        "url", "char_begin", "char_end",
    )
    top = links.filter(F.col("rank") == 1)
    t_link = top.join(m.select("mid", "char_begin", "char_end"), "mid").select(
        F.col("mid").alias("subj"), F.lit("aida:linksTo").alias("pred"),
        F.col("eid").alias("obj"), F.col("confidence").alias("conf"),
        "url", "char_begin", "char_end",
    )
    t_same = (
        clusters.join(entities, "cluster_id")
        .join(m.select("mid", "url", "char_begin", "char_end"), "mid")
        .select(
            F.col("mid").alias("subj"), F.lit("aida:sameAs").alias("pred"),
            F.col("eid").alias("obj"), F.lit(1.0).alias("conf"),
            "url", "char_begin", "char_end",
        )
    )
    return t_type.unionByName(t_anchor).unionByName(t_link).unionByName(t_same)


def build_graph(mentions: DataFrame, links: DataFrame):
    """Full E3: returns (triples, nodes, edges) DataFrames.

    clusters/entities are localCheckpoint()ed: they fan out into 3+ union
    branches of the triples frame plus nodes — without materialization every
    branch re-runs the contraction joins and the CC mapping (measured ~30
    redundant jobs per kg_triples run at bench scale)."""
    clusters = cluster_mentions(mentions, links).localCheckpoint()
    entities = canonical_entities(clusters, links, mentions).localCheckpoint()
    triples = build_triples(mentions, links, clusters, entities)
    nodes = entities.select(
        F.col("eid").alias("node_id"), F.col("cname").alias("canonical_name")
    ).distinct()
    edges = (
        triples.filter(F.col("pred").isin("aida:linksTo", "aida:sameAs"))
        .select(
            F.col("subj").alias("src"), F.col("pred").alias("rel"),
            F.col("obj").alias("dst"), F.col("conf").alias("confidence"), "url",
        )
    )
    return triples, nodes, edges
