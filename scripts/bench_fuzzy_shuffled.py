"""Measure the fuzzy candidate join in the SHUFFLED (non-broadcast) regime.

Scenario: cold corpus/KB mismatch — every mention misses the exact pass, so
the SymSpell deletion-variant join processes the ENTIRE corpus (the worst
case the round-2 verdict flagged as asserted-but-unmeasured).  The KB is
synthesized ABOVE FUZZY_BROADCAST_MAX_ALIASES so auto mode would also pick
the shuffled plan; we pass broadcast_index=False explicitly.

Every query token is exactly one edit from its KB counterpart (prefix char
mutated), so each mention retrieves >=1 candidate through the variant join
and the levenshtein verify actually fires — the join is never empty-pruned.

Sub-quadratic evidence: corpus legs at n and 4n over a FIXED web-scale-ish
KB.  A quadratic (nested-loop) shape grows ~4x the work per mention when
the corpus quadruples only if the KB also grows — against a fixed KB the
BNLJ cost is |corpus| x |alias_tokens| = 4x, same as linear, so we ALSO
quadruple the KB in a third leg: shuffled-join work grows ~|corpus| +
|KB| (build + probe), while the BNLJ grows |corpus| x |KB| = 16x.

Usage: python scripts/bench_fuzzy_shuffled.py [--cpus N]
Prints one JSON line; paste the table into BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from named_entity_discovery_and_linking_spark.operators.linking import (
    generate_candidates_unified,
)
from named_entity_discovery_and_linking_spark.session import get_spark


def synth_alias_table(spark, n_kb: int):
    """KB of n_kb single-token GPE aliases: token = 'plc' + zero-padded id
    (length 11 -> fuzzy budget 2, 67 deletion variants per token)."""
    tok = F.concat(F.lit("plc"), F.lpad(F.col("id").cast("string"), 8, "0"))
    return spark.range(n_kb).select(
        F.col("id").alias("alias_id"),
        F.concat(F.lit("E"), F.col("id")).alias("eid"),
        tok.alias("cand_name"),
        tok.alias("cname"),
        F.lit("GPE").alias("cand_type"),
        F.lit("").alias("info"),
        F.lit(3).alias("info_nfields"),
        F.lit(1).alias("n_tokens"),
        F.array(tok).alias("tokens"),
    )


def synth_queries(spark, n_corpus: int, n_kb: int):
    """n_corpus NAM queries, each one edit away from KB alias (id % n_kb):
    leading 'p' -> 'q', so the exact pass misses EVERYTHING (NIL-heavy)."""
    tok = F.concat(F.lit("qlc"), F.lpad((F.col("id") % n_kb).cast("string"), 8, "0"))
    return spark.range(n_corpus).select(
        F.lit("u").alias("url"),
        F.concat(F.lit("m"), F.col("id")).alias("mid"),
        tok.alias("ent_name"),
        F.lit("GPE").alias("ent_type"),
        F.array(tok).alias("ctx_tokens"),
        F.array(tok).alias("q_tokens"),
        F.lit(1).alias("n_q"),
    )


def leg(spark, n_corpus: int, n_kb: int) -> dict:
    at = synth_alias_table(spark, n_kb).localCheckpoint()
    q = synth_queries(spark, n_corpus, n_kb).localCheckpoint()
    t0 = time.perf_counter()
    n_cands = generate_candidates_unified(q, at, broadcast_index=False).count()
    wall = time.perf_counter() - t0
    return {
        "corpus": n_corpus, "kb": n_kb, "cands": n_cands,
        "sec": round(wall, 2),
        "mentions_per_sec": round(n_corpus / wall, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    ap.add_argument("--base-corpus", type=int, default=50_000)
    ap.add_argument("--base-kb", type=int, default=300_000)
    args = ap.parse_args()

    spark = get_spark("bench-fuzzy-shuffled", master=f"local[{args.cpus}]",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    # warm plan shapes (codegen + analysis dominate first execution)
    leg(spark, 2_000, 10_000)

    legs = [
        leg(spark, args.base_corpus, args.base_kb),          # n corpus
        leg(spark, 4 * args.base_corpus, args.base_kb),      # 4n corpus
        leg(spark, 4 * args.base_corpus, 4 * args.base_kb),  # 4n corpus, 4n KB
    ]
    g_corpus = legs[1]["sec"] / legs[0]["sec"]
    g_both = legs[2]["sec"] / legs[0]["sec"]
    print(json.dumps({
        "metric": "fuzzy shuffled-regime wall time",
        "unit": "sec",
        "legs": legs,
        "growth_4x_corpus": round(g_corpus, 2),
        "growth_4x_corpus_and_kb": round(g_both, 2),
        "bnlj_would_be": {"4x_corpus": 4.0, "4x_corpus_and_kb": 16.0},
        "cpus": args.cpus,
    }))


if __name__ == "__main__":
    main()
