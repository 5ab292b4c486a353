"""End-to-end curation cascade (plans/curation.curate_corpus, judge r5 #5).

The driver oracle value-checks the per-doc flags frame against a full
DuckDB replay (driver_queries._curation_pipeline_sql); these tests pin the
plan-level invariants the oracle can't see: funnel consistency between the
three returned frames, and partitioning-independence of the decisions.
"""

import pytest
from pyspark.sql import functions as F

from named_entity_discovery_and_linking_spark.plans.curation import curate_corpus

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pipeline(spark):
    from named_entity_discovery_and_linking_spark.plans.driver_queries import (
        _docs,
        _synth_url4,
    )

    docs = _synth_url4(_docs(spark, SF)).withColumn(
        "text",
        F.concat(
            F.lit("COOKIE NOTICE\n"), F.col("text"), F.lit("\nFOOTER "),
            (F.col("doc_id") % 3).cast("string"),
        ),
    )
    bench = _docs(spark, SF).filter(F.col("doc_id").isin(7, 42, 99)).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(F.split("text", " "), 1, 12)).alias("text"),
    )
    flags, curated, report = curate_corpus(
        docs, bench, line_max_df=2, jaccard_threshold=0.6,
        decontam_n=8, sample_rate=0.5,
    )
    return docs, flags.toPandas(), curated, report.toPandas()


def test_flags_cover_every_input_doc(pipeline):
    docs, flags, _, _ = pipeline
    assert len(flags) == docs.count()
    assert flags.doc_id.is_unique


def test_funnel_is_monotone_and_every_stage_fires(pipeline):
    _, flags, _, _ = pipeline
    # a doc that ships passed every stage
    kept = flags[flags.final_keep]
    assert len(kept) > 0
    assert kept.url_kept.all() and kept.gopher_keep.all()
    assert kept.dedup_canonical.all() and (~kept.contaminated).all()
    assert (kept.drop_stage == "kept").all()
    # every elimination stage fires non-trivially on the planted fixture
    stages = set(flags.drop_stage)
    assert {"url", "gopher", "sample", "kept"} <= stages, stages
    # a doc dropped at the url stage never shows later-stage decisions
    url_dropped = flags[~flags.url_kept]
    assert (url_dropped.n_lines == -1).all()
    assert (~url_dropped.gopher_keep).all()
    assert (url_dropped.drop_stage == "url").all()
    # boilerplate wrap: survivors lose COOKIE NOTICE + FOOTER lines
    reached = flags[flags.url_kept]
    assert (reached.n_lines == 3).all()
    assert (reached.n_kept <= 1).all()


def test_curated_and_report_match_flags(pipeline):
    _, flags, curated, report = pipeline
    kept_ids = set(flags[flags.final_keep].doc_id)
    assert set(r["doc_id"] for r in curated.select("doc_id").collect()) == kept_ids
    assert int(report.n_docs.sum()) == len(kept_ids)


def test_curate_cli_writes_tables_and_prints_funnel(spark, tmp_path, capsys):
    """--curate job mode: documents-shaped input (no url column -> the
    synthesized id:// urls make url-dedup a no-op), no benchmark, full
    sample rate; writes flags/curated/report tables under --out."""
    from named_entity_discovery_and_linking_spark.__main__ import main

    src = str(tmp_path / "docs.parquet")
    spark.read.parquet(f"{SF}/documents.parquet").limit(60).write.parquet(src)
    out = str(tmp_path / "out")
    assert main(["--curate", "--pages", src, "--out", out]) == 0
    assert "done (curate)" in capsys.readouterr().out
    flags = spark.read.parquet(f"{out}/curation_flags")
    assert flags.count() == 60
    # unique synthesized urls: nothing may drop at the url stage
    assert flags.filter("drop_stage = 'url'").count() == 0
    curated = spark.read.parquet(f"{out}/curated")
    assert curated.count() == flags.filter("final_keep").count()
    assert spark.read.parquet(f"{out}/curation_report").count() >= 1


def test_decisions_are_partitioning_independent(pipeline, spark):
    docs, flags, _, _ = pipeline
    flags17, _, _ = curate_corpus(
        docs.repartition(17),
        spark.createDataFrame(
            [(1, "xyzzy plugh")], "bench_id long, text string"
        ),
        line_max_df=2, jaccard_threshold=0.6, decontam_n=8, sample_rate=0.5,
    )
    f2 = flags17.toPandas().set_index("doc_id")
    f1 = flags.set_index("doc_id")
    # the nonsense benchmark contaminates nothing, so only the decontam
    # column may differ from the planted-benchmark run
    for col in ["url_kept", "n_lines", "n_kept", "gopher_keep",
                "dedup_canonical"]:
        assert f1[col].sort_index().equals(f2[col].sort_index()), col
    assert not f2.contaminated.any()


def test_curate_cli_synthesized_urls_are_dedup_neutral(spark, tmp_path):
    """Advisor r6 #2: string doc ids differing only in case or carrying
    '#'/'?'/trailing '/' must NOT collapse at the url stage (normalize_url
    lowercases the scheme://host prefix and strips fragments); the id://
    url is an md5 of the id, invariant under all of it."""
    from named_entity_discovery_and_linking_spark.__main__ import main

    src = str(tmp_path / "docs.parquet")
    rows = [("DocA", "alpha beta gamma delta epsilon zeta"),
            ("doca", "eta theta iota kappa lambda mu"),
            ("x#1", "nu xi omicron pi rho sigma"),
            ("x/1/", "tau upsilon phi chi psi omega")]
    spark.createDataFrame(
        [(i, t, "en") for i, t in rows], "doc_id string, text string, lang string"
    ).write.parquet(src)
    out = str(tmp_path / "out")
    assert main(["--curate", "--pages", src, "--out", out]) == 0
    flags = spark.read.parquet(f"{out}/curation_flags")
    assert flags.count() == 4
    assert flags.filter("drop_stage = 'url'").count() == 0
