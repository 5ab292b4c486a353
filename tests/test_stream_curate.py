"""Streaming (incremental) curation: cross-batch url + exact-content dedup
with checkpointed seen-set state (streaming/stream_curate.py).

The decisive property the batch tests can't show: a SECOND invocation of
the availableNow runner with the SAME checkpoint continues the dedup
history — a recrawl (same canonical url) or content copy (same md5)
arriving in a later crawl batch is dropped against state from an earlier
one, and survivors are appended exactly once.
"""

import pytest
from pyspark.sql import functions as F

from named_entity_discovery_and_linking_spark.streaming.stream_curate import (
    run_curate_stream,
)

# 25 'the'-words: passes every gopher gate (20-80 words, mean len 3,
# >= 2 en stopwords, but distinct fraction would fail) — so build a body
# with distinct words instead:
def _body(seed: int) -> str:
    words = [f"w{seed}x{i}" for i in range(22)]
    # two stopwords + distinct words keep all gopher gates green
    return "the and " + " ".join(words)


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, url string, text string, lang string"
    ).coalesce(1).write.mode("append").parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    return (str(tmp_path / "in"), str(tmp_path / "out"),
            str(tmp_path / "ckpt"))


def test_cross_batch_dedup_state_survives_restart(spark, dirs):
    src, out, ckpt = dirs
    _write(spark, src, [
        (1, "https://a.com/p1", _body(1), "en"),
        (2, "https://b.com/p2", _body(2), "en"),
        (3, "https://c.com/short", "too short", "en"),  # gopher-dropped
    ])
    run_curate_stream(spark, src, out, ckpt)
    got1 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got1 == {1, 2}

    # second crawl batch, NEW runner invocation, SAME checkpoint:
    #  - doc 4 = recrawl of doc 1's url (tracking params; same canonical)
    #  - doc 5 = exact content copy of doc 2 at a new url
    #  - doc 6 = genuinely new
    _write(spark, src, [
        (4, "https://a.com/p1?utm_source=x", _body(99), "en"),
        (5, "https://d.com/p5", _body(2), "en"),
        (6, "https://e.com/p6", _body(6), "en"),
    ])
    run_curate_stream(spark, src, out, ckpt)
    got2 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got2 == {1, 2, 6}, got2  # 4 lost to url state, 5 to content state

    # exactly-once append: survivors appear once each
    counts = (
        spark.read.parquet(out).groupBy("doc_id")
        .agg(F.count("*").alias("n")).collect()
    )
    assert all(r["n"] == 1 for r in counts)


def test_stream_curate_cli(spark, dirs, capsys):
    src, out_root, _ = dirs
    _write(spark, src, [(1, "https://a.com/p1", _body(1), "en")])
    from named_entity_discovery_and_linking_spark.__main__ import main

    assert main(["--stream-curate", "--pages", src, "--out", out_root]) == 0
    assert "done (stream-curate): 1 docs" in capsys.readouterr().out
    # same --out again: the checkpoint continues the dedup history
    _write(spark, src, [(4, "https://a.com/p1?ref=x", _body(9), "en")])
    assert main(["--stream-curate", "--pages", src, "--out", out_root]) == 0
    assert "done (stream-curate): 1 docs" in capsys.readouterr().out


def test_fresh_checkpoint_forgets_state(spark, dirs, tmp_path):
    """Control: the cross-batch drop really is the checkpoint state — a
    fresh checkpoint over the same input keeps the url-recrawl winner by
    within-run dedup only."""
    src, out, ckpt = dirs
    _write(spark, src, [(1, "https://a.com/p1", _body(1), "en")])
    run_curate_stream(spark, src, out, ckpt)
    _write(spark, src, [(4, "https://a.com/p1?utm_source=x", _body(99), "en")])
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    run_curate_stream(spark, src, out2, ckpt2)
    # fresh state: both files form ONE availableNow run, url dedup keeps a
    # single representative of the shared canonical url
    assert spark.read.parquet(out2).count() == 1
