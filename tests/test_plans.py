"""Physical-plan shape assertions: pushdown, pruning, broadcast, codegen.

These lock the scale-relevant properties of the plans — a correct result
from a plan that scans all columns or shuffles a broadcastable dimension is
a perf regression the row-level tests can't see.
"""

import pytest
from pyspark.sql import functions as F

from named_entity_discovery_and_linking_spark.fixtures.generator import kb_dfs, pages_df


@pytest.fixture(scope="module")
def sf_docs(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "docs.parquet")
    pages_df(spark, n_pages=30).write.parquet(p)
    return p


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        spark_explain_mode("formatted")
    ) if False else df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def spark_explain_mode(mode):  # pragma: no cover - helper indirection
    return mode


def test_lang_filter_pushed_to_scan(spark, sf_docs):
    df = spark.read.parquet(sf_docs).filter(F.col("lang") == "eng").select("url")
    plan = _plan(df)
    assert "PushedFilters" in plan and "lang" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_scan(spark, sf_docs):
    df = spark.read.parquet(sf_docs).select("url", "lang")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "url" in read_schema and "html" not in read_schema  # binary col pruned


def test_candidate_join_is_broadcast(spark):
    from named_entity_discovery_and_linking_spark.operators.linking import (
        build_alias_table,
        clean_kb,
        generate_candidates,
    )

    kb, al = kb_dfs(spark)
    at = build_alias_table(clean_kb(kb), al)
    q = spark.createDataFrame(
        [("u", "m1", "kyiv", "GPE", "x")],
        "url string, mid string, ent_name string, ent_type string, sent_text string",
    ).withColumn("q_tokens", F.array(F.col("ent_name"))).withColumn("n_q", F.lit(1))
    plan = _plan(generate_candidates(q, at, 0))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_fuzzy_join_is_equi_keyed_hash_join(spark):
    """J2's fuzzy retrieval must plan as a HASH join on the deletion-variant
    equi key — NOT a BroadcastNestedLoopJoin (the round-1 shape, whose cross
    product is |q_tokens| x |alias_tokens| levenshteins and cannot survive a
    NIL-heavy corpus)."""
    from named_entity_discovery_and_linking_spark.operators.linking import (
        build_alias_table,
        clean_kb,
        generate_candidates,
        generate_candidates_unified,
    )

    kb, al = kb_dfs(spark)
    at = build_alias_table(clean_kb(kb), al)
    q = spark.createDataFrame(
        [("u", "m1", "kramatorskk", "GPE", "x")],
        "url string, mid string, ent_name string, ent_type string, sent_text string",
    ).withColumn("q_tokens", F.array(F.col("ent_name"))).withColumn("n_q", F.lit(1)) \
     .withColumn("ctx_tokens", F.array(F.col("ent_name")))
    for df in (generate_candidates(q, at, 2), generate_candidates_unified(q, at)):
        plan = _plan(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan


def test_fuzzy_join_shuffled_regime(spark):
    """Above FUZZY_BROADCAST_MAX_ALIASES the variant index must NOT
    broadcast: the same deletion-variant equi key plans as a shuffled
    SORT-MERGE join (spillable — a shuffle-hash build OOMs on an unbounded
    KB), with zero BroadcastExchange anywhere in the candidate-generation
    plan and still no nested loop."""
    from named_entity_discovery_and_linking_spark.operators.linking import (
        build_alias_table,
        clean_kb,
        generate_candidates_unified,
    )

    kb, al = kb_dfs(spark)
    at = build_alias_table(clean_kb(kb), al)
    q = spark.createDataFrame(
        [("u", "m1", "kramatorskk", "GPE", "x")],
        "url string, mid string, ent_name string, ent_type string, sent_text string",
    ).withColumn("q_tokens", F.array(F.col("ent_name"))).withColumn("n_q", F.lit(1)) \
     .withColumn("ctx_tokens", F.array(F.col("ent_name")))
    df = generate_candidates_unified(q, at, broadcast_index=False)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastExchange" not in plan  # no hidden broadcast of the index
    assert "SortMergeJoin" in plan
    # the fuzzy join keys on the deletion-variant column in this regime too
    smj = plan.split("SortMergeJoin")
    assert any("variant" in seg[:300] for seg in smj[1:])
    # results identical across regimes (same equi key, same verify filter)
    a = sorted(tuple(r) for r in df.select("mid", "alias_id", "d_star").collect())
    b = sorted(
        tuple(r) for r in generate_candidates_unified(q, at, broadcast_index=True)
        .select("mid", "alias_id", "d_star").collect()
    )
    assert a == b and len(a) > 0


def test_mentions_single_python_stage(spark, sf_docs):
    """Discovery is ONE ArrowEvalPython/mapInPandas stage — no shuffle
    between the scan and the mentions output."""
    from named_entity_discovery_and_linking_spark.operators.mentions import discover_mentions

    pages = spark.read.parquet(sf_docs)
    plan = _plan(discover_mentions(pages))
    assert "Exchange" not in plan  # no shuffle anywhere in the discovery plan
    assert plan.count("MapInPandas (") == 1  # tree section lists each node once


def test_whole_stage_codegen_on_agg(spark):
    """The aggregation pipeline stays inside WholeStageCodegen (the '*'
    markers in the formatted tree).  AQE wraps plans in AdaptiveSparkPlan
    pre-execution, hiding the markers — disable it for the assertion."""
    from named_entity_discovery_and_linking_spark.plans.driver_queries import q_lineitem_agg

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(q_lineitem_agg(spark, "/root/testdata/sf0.001"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "* HashAggregate" in plan and "* ColumnarToRow" in plan


def test_sampling_and_quality_filter_are_map_only(spark, sf_docs):
    """The curation decision ops must stay single-stage: a filter/project
    in one WholeStageCodegen span over the scan — no Exchange, no Python
    stage.  (Pins the 100-TB property: these run at scan bandwidth.)"""
    from named_entity_discovery_and_linking_spark.operators.sampling import (
        stratified_sample,
    )
    from named_entity_discovery_and_linking_spark.operators.textstats import (
        gopher_filter,
    )

    docs = spark.read.parquet(sf_docs).withColumnRenamed("url", "doc_id")
    for df in (
        stratified_sample(docs, {"eng": 0.5}, default_rate=0.1),
        gopher_filter(docs),
    ):
        plan = _plan(df)
        assert "Exchange" not in plan
        assert "Python" not in plan  # BatchEvalPython / ArrowEvalPython / mapInPandas
        assert "codegen id" in plan  # formatted-mode whole-stage-codegen marker


def test_registered_domain_is_map_only(spark, sf_docs):
    """PSL eTLD+1 extraction must stay a literal when-chain inside the
    scan's codegen span — no join, no Exchange (the frozen-subset
    contract; the full PSL swaps in as a broadcast join, never a
    shuffle)."""
    from named_entity_discovery_and_linking_spark.operators.webcure import (
        registered_domain,
    )

    docs = spark.read.parquet(sf_docs).select(
        registered_domain(F.col("url")).alias("dom")
    )
    plan = _plan(docs)
    assert "Exchange" not in plan and "Join" not in plan
    assert "codegen id" in plan


def test_mode_union_queries_add_no_extra_shuffle(spark, sf_docs):
    """The r6 mode-union registry merges must cost exactly the union of
    their branches: `sampling` (two map-only filters) stays Exchange-free,
    and `token_pipeline` is one hash-aggregate exchange over the scan."""
    import named_entity_discovery_and_linking_spark.plans.driver_queries as DQ
    from named_entity_discovery_and_linking_spark.operators.sampling import (
        hash_sample,
        stratified_sample,
    )

    docs = spark.read.parquet(sf_docs).withColumnRenamed("url", "doc_id")
    sampling = hash_sample(docs, 0.25).select(
        F.lit("hash").alias("mode"), "doc_id"
    ).unionByName(
        stratified_sample(docs, {"eng": 0.5}, default_rate=0.1).select(
            F.lit("stratified").alias("mode"), "doc_id"
        )
    )
    plan = _plan(sampling)
    assert "Exchange" not in plan  # two map-only filters, a union, no shuffle
    tp = DQ.q_token_pipeline(spark, "/root/testdata/sf0.001")
    plan_tp = _plan(tp)
    # one logical shuffle: the (lang, word) aggregate; the _docs repartition
    # adds its explicit round-robin-by-id exchange before it
    assert plan_tp.count("hashpartitioning(lang") == 1


def test_skew_report_recommends_salt_for_hot_key(spark):
    """skew_report must identify the hot key deterministically and size the
    salt factor from the max key count, with bounded driver output."""
    from named_entity_discovery_and_linking_spark.plans.metrics import skew_report

    rows = [("hot.example", i) for i in range(60)]
    rows += [(f"d{k:02d}.example", i) for k in range(20) for i in range(2)]
    df = spark.createDataFrame(rows, "domain string, i int")

    rep = skew_report(df, "domain", target_rows_per_task=10, top_k=3)
    assert rep["n_rows"] == 100 and rep["n_keys"] == 21
    assert rep["max_key_rows"] == 60
    assert rep["recommended_salt"] == 6  # ceil(60 / 10)
    assert rep["hot_keys"][0] == {
        "key": {"domain": "hot.example"}, "rows": 60, "share": 0.6,
    }
    assert len(rep["hot_keys"]) == 3
    assert rep["skew_ratio"] > 10  # 60 vs mean 100/21

    # uniform frame: salt collapses to 1
    uni = spark.createDataFrame([(f"k{i}",) for i in range(8)], "k string")
    assert skew_report(uni, ["k"], target_rows_per_task=10)["recommended_salt"] == 1


def test_graph_stats_degree_summary(spark):
    from named_entity_discovery_and_linking_spark.plans.graph import graph_stats

    nodes = spark.createDataFrame(
        [("E1", "Alpha"), ("E2", "Beta"), ("E3", "Gamma")],
        "node_id string, canonical_name string",
    )
    edges = spark.createDataFrame(
        [("m1", "aida:linksTo", "E1", 0.9, "u1"),
         ("m2", "aida:linksTo", "E1", 0.8, "u2"),
         ("m3", "aida:linksTo", "E1", 0.7, "u3"),
         ("m4", "aida:sameAs", "E2", 1.0, "u4")],
        "src string, rel string, dst string, confidence double, url string",
    )
    st = graph_stats(nodes, edges, top_k=2)
    assert st["n_nodes"] == 3 and st["n_edges"] == 4
    assert st["edges_by_rel"] == {"aida:linksTo": 3, "aida:sameAs": 1}
    assert st["dst_degree"]["max"] == 3
    assert st["top_hubs"] == [{"dst": "E1", "rows": 3}, {"dst": "E2", "rows": 1}]


def test_skew_report_cli_mode(spark, tmp_path, capsys):
    """--skew-report KEY prints the diagnostic JSON over --pages and exits
    without requiring --out (no tables written)."""
    import json

    from named_entity_discovery_and_linking_spark.__main__ import main
    from named_entity_discovery_and_linking_spark.fixtures.generator import pages_df

    src = str(tmp_path / "pages.parquet")
    pages_df(spark, n_pages=50).write.parquet(src)
    assert main(["--skew-report", "lang", "--pages", src]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_rows"] == 50 and rep["recommended_salt"] >= 1
    assert rep["hot_keys"][0]["key"].keys() == {"lang"}


def test_session_pins_north_rule_confs(spark):
    """The north_rule's explicitly named knobs must survive session-builder
    refactors: AQE with skew-join splitting, explicit shuffle partitions,
    Arrow-batched Python."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    assert int(spark.conf.get("spark.sql.shuffle.partitions")) > 0


def test_aqe_skew_join_split_engages(spark):
    """north_rule: 'AQE skew-join handling' — prove the runtime path actually
    engages, not just that the conf is set: a sort-merge join with one hot
    key must show a skewed AQEShuffleRead in the final adaptive plan once
    the skew thresholds are scaled down to fixture size."""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        # scaled to fixture bytes (defaults are 256MB/64MB)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    }
    saved = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        # 90% of rows share key 0; pad must be incompressible (md5 chain),
        # or lz4 shrinks the hot shuffle partition below any threshold
        big = (
            spark.range(0, 60_000)
            .withColumn("k", F.when(F.col("id") % 10 < 9, F.lit(0))
                        .otherwise(F.col("id") % 997))
            .withColumn("pad", F.concat(
                *[F.md5((F.col("id") + i).cast("string")) for i in range(4)]))
        )
        dim = spark.range(0, 1_000).select(F.col("id").alias("k"),
                                           (F.col("id") * 2).alias("v"))
        joined = big.join(dim, "k")
        # collect() (not count()) so we inspect the execution that actually
        # ran — count() plans its own separate query
        assert len(joined.collect()) == 60_000
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan[:2000]
        assert "skewed" in final_plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
