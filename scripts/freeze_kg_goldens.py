"""Freeze the golden parquet oracles for kg_mentions / kg_triples.

The two flagship queries are not SQL-expressible (mapInPandas tagger +
iterative connected components), so their DuckDB oracle is a raw scan of a
frozen parquet of the sf0.01 pipeline output.  This script (re)generates
those files.  Run it ONLY on an intentional semantic change to the pipeline,
alongside the tests/goldens regeneration documented in test_pr_gate.

    python scripts/freeze_kg_goldens.py [sf_dir]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from named_entity_discovery_and_linking_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from named_entity_discovery_and_linking_spark.plans.driver_queries import QUERIES

    spark = get_spark(
        "freeze-goldens", master="local[8]", shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    out_dir = os.path.join(REPO, "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    for name in ("kg_mentions", "kg_triples"):
        pdf = QUERIES[name](spark, sf_dir).toPandas()
        path = os.path.join(out_dir, f"{name}_sf0_01.parquet")
        pdf.to_parquet(path, index=False)
        print(f"froze {name}: {len(pdf)} rows -> {path}")


if __name__ == "__main__":
    main()
