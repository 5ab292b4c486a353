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


def graph_stats(nodes: DataFrame, edges: DataFrame, top_k: int = 10) -> dict:
    """Post-materialize sanity summary of the nodes/edges tables — the check
    a KG consumer runs right after ``build_graph`` before shipping the
    tables (reference analog: the xref-count prints around
    xianyang_linking/linking.py:557-700's CSR emit).

    Returns a bounded dict::

        {n_nodes, n_edges, edges_by_rel: {rel: count},
         dst_degree: {p50, p99, max},        # mention-support per entity
         top_hubs: [{dst, rows}, ...]}       # top_k entities by in-degree

    Plan shape: one map-side-combinable groupBy per aggregate; the in-degree
    distribution reuses a single (dst -> count) frame for both the
    percentile summary and the deterministic top-k (ties break on dst).
    Every collect is one row or O(top_k) — safe at any graph size.
    """
    n_nodes = nodes.count()
    rel_rows = edges.groupBy("rel").agg(F.count(F.lit(1)).alias("n")).collect()
    edges_by_rel = {r["rel"]: int(r["n"]) for r in rel_rows}
    deg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("n"))
    drow = deg.agg(
        F.expr("percentile_approx(n, 0.5)").alias("p50"),
        F.expr("percentile_approx(n, 0.99)").alias("p99"),
        F.max("n").alias("mx"),
    ).collect()[0]
    hubs = deg.orderBy(F.desc("n"), "dst").limit(top_k).collect()
    return {
        "n_nodes": int(n_nodes),
        "n_edges": sum(edges_by_rel.values()),
        "edges_by_rel": edges_by_rel,
        "dst_degree": {
            "p50": int(drow["p50"] or 0),
            "p99": int(drow["p99"] or 0),
            "max": int(drow["mx"] or 0),
        },
        "top_hubs": [{"dst": r["dst"], "rows": int(r["n"])} for r in hubs],
    }


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
