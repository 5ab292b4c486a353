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


RDF_TYPE_IRI = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _nt_escape_literal(c):
    """N-Triples string-literal escaping (grammar: ECHAR) — backslash first,
    then quote and the control characters.  Pure Column, no UDF."""
    for ch, esc in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                    ("\r", "\\r"), ("\t", "\\t")):
        c = F.replace(c, F.lit(ch), F.lit(esc))
    return c


def _nt_encode_iri(c):
    """Percent-encode the characters the N-Triples IRIREF production forbids
    unescaped: every control/space in \\x00-\\x20 (a raw newline here would
    split the statement line), angle brackets, quote, backslash, braces,
    pipe, caret, backtick.  Our mids/eids are URL-derived tokens, so these
    are rare but possible.  %-first so later replacements are not
    double-encoded.  ``F.replace`` is the literal (non-regex) replace — the
    whole chain stays one JVM codegen projection."""
    forbidden = ["%"] + [chr(i) for i in range(0x21)] + list('<>"\\{}|^`')
    for ch in forbidden:
        c = F.replace(c, F.lit(ch), F.lit(f"%{ord(ch):02X}"))
    return c


def write_ntriples(triples: DataFrame, path: str,
                   base: str = "http://example.org/ndl/") -> None:
    """Serialize the triples table to RDF N-Triples (one statement per
    line) — the standard interchange the reference's CSR JSON is not
    (SURVEY §1.1-12; linking.py:557-700 emits CSR; downstream KG loaders
    speak N-Triples/N-Quads).

    Mapping: subjects are mention IRIs under ``<base>mention/``;
    ``rdf:type`` keeps its W3C predicate IRI with the type as a ``<base>
    type/`` IRI; ``aida:linksTo`` / ``aida:sameAs`` become ``<base>``
    predicates with entity-IRI objects; ``aida:anchorOf`` keeps its
    surface string as an escaped literal.

    Plan shape: one pure-Column projection (escape/encode chains are
    literal ``F.replace``, JVM codegen) then ``write.text`` — map-only,
    no shuffle, linear at any corpus size."""
    subj = F.concat(F.lit(f"<{base}mention/"), _nt_encode_iri(F.col("subj")), F.lit(">"))
    pred = F.when(
        F.col("pred") == "rdf:type", F.lit(f"<{RDF_TYPE_IRI}>")
    ).otherwise(
        F.concat(F.lit(f"<{base}"),
                 F.regexp_replace("pred", "^aida:", ""), F.lit(">"))
    )
    obj = (
        F.when(F.col("pred") == "rdf:type",
               F.concat(F.lit(f"<{base}type/"), _nt_encode_iri(F.col("obj")), F.lit(">")))
        .when(F.col("pred") == "aida:anchorOf",
              F.concat(F.lit('"'), _nt_escape_literal(F.col("obj")), F.lit('"')))
        .otherwise(
            F.concat(F.lit(f"<{base}entity/"), _nt_encode_iri(F.col("obj")), F.lit(">")))
    )
    lines = triples.select(
        F.concat_ws(" ", subj, pred, obj, F.lit(".")).alias("value")
    )
    lines.write.mode("overwrite").text(path)


def compact_table(spark: SparkSession, path: str, target_mb: int = 256) -> dict:
    """Small-file compaction for append-mode table directories — the
    operational pass every streaming sink needs: each availableNow
    micro-batch appends its own parquet files, and at crawl scale a table
    accumulates millions of KB-sized files whose open/footer costs swamp
    the scan (the classic small-files problem).

    Rewrites the directory into ceil(bytes / target_mb) files and swaps it
    in.  On Iceberg this is ``rewrite_data_files`` (snapshot-atomic —
    readers never see a gap); the parquet emulation here is a maintenance
    window: write compacted data beside the table, two directory renames,
    drop the old.  A claim file fences concurrent compactors (same
    primitive as the lineage resume fencing); readers racing the swap on
    plain parquet can observe a missing-directory beat — documented
    emulation semantics, not a scale design (at 100 TB you run Iceberg
    and the commit is atomic).

    Returns {files_before, files_after, bytes} for observability.

    Streaming-sink caveat: a LIVE streaming output dir carries a
    ``_spark_metadata`` commit log that the rewrite does not preserve —
    compact a stream's output only after the stream is finished (the
    availableNow pattern) or via the Iceberg sink, whose snapshot log
    replaces the file-listing contract entirely.
    """
    import math

    from .fs import get_filesystem

    fs = get_filesystem(path)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(fs.spark_path(path))
    hfs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    size = hfs.getContentSummary(hpath).getLength()

    def _n_files() -> int:
        return sum(1 for f in fs.listdir(path) if f.endswith(".parquet"))

    files_before = _n_files()
    n_out = max(1, math.ceil(size / (target_mb * 1024 * 1024)))
    stats = {"files_before": files_before, "bytes": int(size)}
    if files_before <= n_out:
        return {**stats, "files_after": files_before, "skipped": True}

    claim = path.rstrip("/") + ".__compact_claim"
    if not fs.try_create_claim(claim, "compacting"):
        raise RuntimeError(f"another compaction holds {claim}")
    tmp = path.rstrip("/") + ".__compact_tmp"
    old = path.rstrip("/") + ".__compact_old"
    try:
        df = spark.read.parquet(fs.spark_path(path))
        fs.rmtree(tmp)
        df.repartition(n_out).write.mode("overwrite").parquet(fs.spark_path(tmp))
        fs.rename(path, old)
        fs.rename(tmp, path)
        fs.rmtree(old)
    finally:
        fs.break_claim_if(claim, "compacting")
    return {**stats, "files_after": _n_files(), "skipped": False}
