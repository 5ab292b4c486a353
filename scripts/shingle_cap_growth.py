"""Growth table for the hot-shingle document-frequency cap (VERDICT r3 #2).

Builds skewed corpora of growing size — every doc has a unique 10-word body,
50% of docs append the SAME 10-word boilerplate sentence — and measures the
shingle self-join's emitted row count (the actual quadratic work unit) and
wall time with the cap off vs on.  Uncapped, each boilerplate shingle is
shared by n/2 docs and emits ~(n/2)^2/2 join rows; capped at max_df, every
shingle emits at most max_df*(max_df-1)/2.

Usage: python scripts/shingle_cap_growth.py
Prints a markdown table ready for BENCH.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from named_entity_discovery_and_linking_spark.operators.dedup import (
    _doc_shingles,
    cap_document_frequency,
    ngram_jaccard_pairs,
)

BOILER = "subscribe to our newsletter for daily updates and breaking news"


def make_docs(spark, n):
    # 1% of docs are genuine near-dups of their predecessor (same unique body,
    # one trailing word changed) so the capped join still has real work to do.
    body_of = F.when(F.col("id") % 100 == 1, F.col("id") - 1).otherwise(F.col("id"))
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("document"), body_of.cast("string"), F.lit("body"),
            *[F.concat(F.lit(w), body_of.cast("string"))
              for w in ("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")],
            F.when(F.col("id") % 100 == 1, F.lit("variant")).otherwise(F.lit("original")),
        ).alias("uniq"),
    )
    return base.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.concat_ws(" ", "uniq", F.lit(BOILER)))
        .otherwise(F.col("uniq"))
        .alias("text"),
    ).repartition(32).localCheckpoint()


def join_rows(sh):
    a, b = sh.alias("a"), sh.alias("b")
    return a.join(
        b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc"))
    ).count()


def main():
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("shingle-cap-growth")
        .getOrCreate()
    )
    print("| n docs | max_df | uncapped join rows | uncapped s | capped join rows | capped s |")
    print("|---|---|---|---|---|---|")
    for n in (2_000, 8_000, 32_000, 128_000):
        docs = make_docs(spark, n)
        max_df = max(4, n // 1000)  # ~1e-3 of corpus, the knob from the docstring
        sh = _doc_shingles(docs, "doc_id", "text", 3).localCheckpoint()
        t0 = time.time()
        raw = join_rows(sh)
        t_raw = time.time() - t0
        t0 = time.time()
        capped_sh = cap_document_frequency(sh, max_df)
        cap = join_rows(capped_sh)
        t_cap = time.time() - t0
        print(f"| {n:,} | {max_df} | {raw:,} | {t_raw:.1f} | {cap:,} | {t_cap:.1f} |",
              flush=True)
        # sanity: the capped operator finds exactly the planted near-dup pairs
        assert ngram_jaccard_pairs(docs, 0.5, max_df=max_df).count() == n // 100
    spark.stop()


if __name__ == "__main__":
    main()
