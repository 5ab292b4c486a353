"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  : flagship KG-construction query at sf0.001 — documents-derived
                pages -> mention discovery -> entity linking -> triples.
queries()     : one entry per implemented operator family from SURVEY.md §2
                plus the training-data-pipeline operators (dedup, similarity,
                text stats).  Each callable takes (spark, sf_dir).
oracle_sql()  : DuckDB-executable ANSI SQL equivalents, column-name aligned.
                kg_mentions / kg_triples intentionally have no oracle (the
                mapInPandas tagger and iterative connected components are not
                SQL-expressible) -> rows-only check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ship(spark: SparkSession) -> None:
    from named_entity_discovery_and_linking_spark.session import _ship_package

    _ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: KG triples end-to-end."""
    _ship(spark)
    from named_entity_discovery_and_linking_spark.plans.driver_queries import q_kg_triples

    return q_kg_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from named_entity_discovery_and_linking_spark.plans.driver_queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from named_entity_discovery_and_linking_spark.plans.driver_queries import ORACLES

    return dict(ORACLES)
