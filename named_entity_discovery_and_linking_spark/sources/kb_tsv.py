"""KB loaders from tab-separated files (SRC5/SRC6, SURVEY.md §2.1).

Mirrors the reference's LORELEI background-KB ingestion:
  - ``entities.tab``: >=47 tab columns; used columns 0=src, 1=type, 2=eid,
    3=name, GEO: 12=country_code, 8=feature_class, 46=wiki_link
    (linking.py:46-68)
  - ``alternate_names.tab``: (eid, alias) with a header line
    (linking.py:70-75)

Both loaders are plain ``spark.read.csv(sep='\\t')`` scans — at 100 TB the
KB side is still MB-GB scale, so this stays broadcastable after cleaning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_entities_tab(spark: SparkSession, path: str) -> DataFrame:
    """entities.tab -> (src, type, eid, name, country, feature, wiki).
    Column positions per linking.py:46-68 (GEO info fields; WLL/APB info is
    collapsed into ``country`` as a single bio string, matching the fixture
    convention used by build_alias_table)."""
    # quote='': the reference raw-splits each line on tabs (linking.py:50);
    # Spark's default quote='"' would treat a field STARTING with a double
    # quote (GeoNames nicknames like "Gorky") as quoted, swallowing tabs and
    # shifting every downstream column
    raw = spark.read.csv(path, sep="\t", header=True, inferSchema=False, quote="")
    cols = raw.columns
    c = lambda i: F.col(cols[i])  # noqa: E731
    wll_info = F.concat_ws("\t", c(26), c(27), c(28)) if len(cols) > 28 else F.lit("")
    apb_info = c(35) if len(cols) > 35 else F.lit("")
    return raw.select(
        c(0).alias("src"), c(1).alias("type"), c(2).alias("eid"), c(3).alias("name"),
        F.when(c(0) == "GEO", F.coalesce(c(12), F.lit("")))
        .when(c(0) == "WLL", F.coalesce(wll_info, F.lit("")))
        .when(c(0) == "APB", F.coalesce(apb_info, F.lit("")))
        .otherwise(F.lit("")).alias("country"),
        F.when(c(0) == "GEO", F.coalesce(c(8), F.lit(""))).otherwise(F.lit("")).alias("feature"),
        F.when(c(0) == "GEO", F.coalesce(c(46), F.lit(""))).otherwise(F.lit("")).alias("wiki")
        if len(cols) > 46
        else F.lit("").alias("wiki"),
    )


def load_aliases_tab(spark: SparkSession, path: str) -> DataFrame:
    """alternate_names.tab -> (eid, alias).  quote='' — see load_entities_tab."""
    raw = spark.read.csv(path, sep="\t", header=True, inferSchema=False, quote="")
    cols = raw.columns
    return raw.select(F.col(cols[0]).alias("eid"), F.col(cols[1]).alias("alias"))


def load_wiki_mapping(spark: SparkSession, path: str) -> DataFrame:
    """mapping_refkb2wiki.tab -> (eid, wiki_url), dropping 'None' urls
    (J8, linking.py:390-402)."""
    raw = spark.read.csv(path, sep="\t", header=False, inferSchema=False, quote="")
    cols = raw.columns
    return raw.select(
        F.col(cols[0]).alias("eid"), F.col(cols[2]).alias("wiki_url")
    ).filter(F.col("wiki_url") != "None")
