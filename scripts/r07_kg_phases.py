"""Diagnostic: per-phase wall clock of the kg_triples pipeline (r07).

Usage: python scripts/r07_kg_phases.py [sf_dir]

Mirrors plans/driver_queries.kg_pipeline stage by stage, timing each
materialization boundary so the fixed-latency budget is attributable.
Purely diagnostic — the bench contract lives in bench.py (frozen).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    from named_entity_discovery_and_linking_spark.session import get_spark, materialize
    from named_entity_discovery_and_linking_spark.plans.driver_queries import derived_pages
    from named_entity_discovery_and_linking_spark.fixtures.generator import kb_dfs
    from named_entity_discovery_and_linking_spark.operators.linking import (
        MAX_FUZZY_DIST, build_alias_table, clean_kb, disambiguate,
        generate_candidates_unified, promote_nils, score_candidates,
        tmpkb_lookup, tmpkb_seed, _nam_queries,
    )
    from named_entity_discovery_and_linking_spark.operators.mentions import discover_mentions
    from named_entity_discovery_and_linking_spark.plans.graph import build_graph
    from pyspark.sql import functions as F

    spark = get_spark(
        "r07-kg-phases", master=f"local[{cpus}]", shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    t_all = time.time()
    marks = []

    def mark(tag, t0):
        dt = time.time() - t0
        marks.append((tag, dt))
        print(f"{tag:<28s} {dt:7.2f}s", flush=True)
        return time.time()

    t0 = time.time()
    pages = derived_pages(spark, sf_dir, 1)
    kb, al = kb_dfs(spark)
    t0 = mark("plan: pages+kb", t0)

    m = materialize(discover_mentions(pages).repartition(F.col("url")), "mentions")
    t0 = mark("mentions materialize", t0)

    alias_table = build_alias_table(clean_kb(kb), al).localCheckpoint()
    t0 = mark("alias_table checkpoint", t0)

    queries = materialize(_nam_queries(m), "queries")
    t0 = mark("queries materialize", t0)

    cands = generate_candidates_unified(queries, alias_table, MAX_FUZZY_DIST)
    scored = materialize(disambiguate(score_candidates(cands, queries), queries), "scored")
    t0 = mark("cands+score materialize", t0)

    kb_links = scored.select(
        "url", "mid", F.concat(F.lit("refkb:"), F.col("eid")).alias("eid"),
        "cname", "confidence", "rank", F.lit(0).alias("subcomponent"),
    )
    nil_queries = queries.join(scored.select("mid").distinct(), "mid", "left_anti")
    seed = tmpkb_seed(spark)
    seed_hit_mids = tmpkb_lookup(nil_queries, seed).select("mid").distinct()
    unresolved = nil_queries.join(seed_hit_mids, "mid", "left_anti")
    tmpkb = seed.unionByName(promote_nils(unresolved))
    tmp_links = tmpkb_lookup(nil_queries, tmpkb)
    links = materialize(kb_links.unionByName(tmp_links), "links")
    t0 = mark("nil+tmpkb+links mat", t0)

    triples = build_graph(m, links)[0].withColumn("conf", F.round("conf", 6))
    t0 = mark("build_graph (CC) plan+ckpt", t0)

    triples.write.format("noop").mode("overwrite").save()
    t0 = mark("triples noop sink", t0)

    print(f"{'TOTAL':<28s} {time.time() - t_all:7.2f}s")


if __name__ == "__main__":
    main()
