"""Table materialization (SNK1-SNK4 -> Iceberg-shaped tables).

The north_rule calls for Iceberg-materialized node/edge tables; this sandbox
has no Iceberg runtime jar, so writes go to parquet with the same layout
(partitioned, overwrite-by-filter emulated via dynamic partition overwrite).
``format='iceberg'`` is honored when a catalog is configured — the call
sites don't change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(
    df: DataFrame, path: str, partition_by: list[str] | None = None,
    mode: str = "overwrite", fmt: str | None = None,
) -> None:
    """Write a pipeline output table.  Dynamic partition overwrite so a
    resumed job replaces only the partitions it recomputes (lineage.py) —
    the parquet emulation of Iceberg's overwrite-by-filter."""
    spark = df.sparkSession
    fmt = fmt or ("iceberg" if iceberg_available(spark) else "parquet")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def bucketize(df: DataFrame, key: str = "url", n_buckets: int = 64) -> DataFrame:
    """Salted url-hash bucket column (north_rule: repartition on
    xxhash64(url) to defuse hot-domain skew).  The bucket is BOTH the
    physical partition of the output tables and the lineage unit."""
    return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int"))
