"""Structured Streaming variants of the discovery stage (SURVEY.md §2.9).

The reference has NO streaming — its corpus is a static directory processed
in one pass (main.py:341-342).  A web-scale ingestion pipeline does:
pages arrive continuously (file/Kafka source), mentions are extracted
incrementally, and rolling windowed statistics feed monitoring.

Everything here reuses the exact batch tagger (operators/mentions.py) —
``mapInPandas`` is streaming-compatible for stateless stages, so the batch
and streaming paths cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mentions import TaggerConfig, discover_mentions

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def read_page_stream(spark: SparkSession, input_dir: str, max_files: int = 16) -> DataFrame:
    """File-source page stream: parquet files dropped into input_dir become
    micro-batches.  maxFilesPerTrigger bounds batch size (backpressure)."""
    return (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def stream_mentions(pages_stream: DataFrame, cfg: TaggerConfig | None = None) -> DataFrame:
    """Streaming mention discovery: identical plan to the batch path —
    filter(lang) -> mapInPandas(tagger)."""
    return discover_mentions(pages_stream, cfg)


def windowed_mention_counts(
    mentions_stream: DataFrame, pages_stream: DataFrame, window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Rolling typed-mention counts with late-data handling: join mentions
    back to their page's warc_ts, watermark it, tumble-window per type.
    Late pages beyond the watermark are dropped (state bounded)."""
    ts = pages_stream.select("url", "warc_ts").withWatermark("warc_ts", watermark)
    m = mentions_stream.select("url", "coarse_type")
    return (
        m.join(ts, "url")
        .groupBy(F.window("warc_ts", window).alias("w"), "coarse_type")
        .agg(F.count("*").alias("n_mentions"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "coarse_type", "n_mentions",
        )
    )


def run_stream_to_table(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str,
    cfg: TaggerConfig | None = None, timeout_sec: int = 60,
):
    """End-to-end: page stream -> mentions -> parquet sink with checkpoint.
    availableNow trigger = process everything present, then stop (the batch
    parity mode used by the tests); the checkpoint directory makes restarts
    exactly-once per micro-batch."""
    pages = read_page_stream(spark, input_dir)
    mentions = stream_mentions(pages, cfg)
    q = (
        mentions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q


def stream_triples(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str,
    kb: DataFrame, aliases: DataFrame, cfg: TaggerConfig | None = None,
    timeout_sec: int = 120,
):
    """Full KG construction as a stream: every micro-batch of pages runs the
    SAME batch operators (discover_mentions -> link_mentions -> build_graph)
    inside ``foreachBatch``, and the batch's triples land in a
    ``batch_id=<n>`` partition written with dynamic partition overwrite
    (sources/io.py:write_table).  A replayed micro-batch after a crash
    carries the same batch_id and REWRITES its own partition instead of
    appending duplicates — exactly-once at the sink without a transactional
    format (and a no-op format switch when Iceberg is configured).

    Canonicalization (connected components) is batch-local here: triples
    within a micro-batch cluster together; the full-corpus batch path is the
    global variant.  NIL promotion is delegated to
    ``stateful_nil_promotion`` (cumulative counts need the state store) —
    this runner links with ``promote=False`` so per-batch counters cannot
    double-promote across batches.
    """
    from ..operators.linking import link_mentions
    from ..plans.graph import build_graph
    from ..sources.io import write_table

    pages = read_page_stream(spark, input_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        m = discover_mentions(batch_df, cfg).localCheckpoint()
        if not m.take(1):
            return
        links = link_mentions(m, kb, aliases, promote=False).localCheckpoint()
        triples = build_graph(m, links)[0].withColumn("batch_id", F.lit(batch_id))
        write_table(triples, output_dir, partition_by=["batch_id"])

    q = (
        pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return q


def stateful_nil_promotion(nil_stream: DataFrame, threshold: int | None = None) -> DataFrame:
    """A1/SNK4 as a TRUE stateful streaming operator
    (``applyInPandasWithState``): the reference's only mutable state is the
    temporary KB and its NIL counter (linking.py:338-388, 469-475) — here
    the running per-(name, type) NIL count lives in Spark's state store and
    a promotion row (name, type, tmp_eid, nil_count) is emitted EXACTLY ONCE
    when the cumulative count crosses the threshold, across micro-batches
    and restarts (checkpointed state).

    tmp_eid uses the same deterministic sha1 as the batch path
    (operators/linking._tmp_eid), so streaming promotions and batch
    promotions mint identical ids.  Input: a streaming DataFrame with
    (name string, type string), one row per still-NIL mention.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.linking import TMPKB_PROMOTE_MIN

    thr = threshold if threshold is not None else TMPKB_PROMOTE_MIN

    def update(key, pdfs, state):
        import hashlib

        import pandas as pd

        cnt, promoted = state.get if state.exists else (0, False)
        for pdf in pdfs:
            cnt += len(pdf)
        rows = []
        if not promoted and cnt >= thr:
            name, typ = key
            eid = "@" + hashlib.sha1(f"{name}|{typ}".encode()).hexdigest()[:12]
            rows.append((name, typ, eid, cnt))
            promoted = True
        state.update((cnt, bool(promoted)))
        yield pd.DataFrame(rows, columns=["name", "type", "tmp_eid", "nil_count"])

    return nil_stream.groupBy("name", "type").applyInPandasWithState(
        update,
        outputStructType="name string, type string, tmp_eid string, nil_count long",
        stateStructType="cnt long, promoted boolean",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
