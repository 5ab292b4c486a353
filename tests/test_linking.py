"""Linking semantics: scoring arithmetic of linking.py:150-213 + 284-307."""

import pytest
from pyspark.sql import functions as F

from named_entity_discovery_and_linking_spark.fixtures.generator import kb_dfs, pages_df
from named_entity_discovery_and_linking_spark.operators.linking import (
    build_alias_table,
    clean_kb,
    disambiguate,
    generate_candidates,
    link_mentions,
    promote_nils,
    score_candidates,
)
from named_entity_discovery_and_linking_spark.operators.mentions import discover_mentions


@pytest.fixture(scope="module")
def kb(spark):
    e, a = kb_dfs(spark)
    return e, a


@pytest.fixture(scope="module")
def alias_table(spark, kb):
    e, a = kb
    return build_alias_table(clean_kb(e), a).cache()


def mk_queries(spark, rows):
    df = spark.createDataFrame(
        rows, "url string, mid string, ent_name string, ent_type string, sent_text string"
    )
    return (
        df.withColumn("ctx_tokens", F.array_distinct(F.split(F.col("sent_text"), r"\s+")))
        .drop("sent_text")
        .withColumn("q_tokens", F.expr(r"array_distinct(filter(split(ent_name, '[^\\p{L}\\p{N}]+'), t -> t != ''))"))
        .withColumn("n_q", F.size("q_tokens"))
    )


def test_kb_cleaning(spark, kb):
    e, _ = kb
    cleaned = clean_kb(e)
    # duplicate eid dropped (linking.py:34-36)
    assert cleaned.count() == cleaned.select("eid").distinct().count()
    # GEO non-RU/UA with empty wiki dropped (linking.py:37-41)
    bad = cleaned.filter(
        (F.col("src") == "GEO") & ~F.col("country").isin("RU", "UA") & (F.col("wiki") == "")
    )
    assert bad.count() == 0


def test_and_semantics_candidate_gen(spark, alias_table):
    # 'donetsk' matches both Donetsk and Donetsk Oblast; 'donetsk oblast'
    # matches only the oblast (AND of terms, linking.py:105-112)
    q = mk_queries(spark, [("u", "m1", "donetsk", "GPE", "x"), ("u", "m2", "donetsk oblast", "GPE", "x")])
    c = generate_candidates(q, alias_table, 0)
    names_m1 = {r["cand_name"] for r in c.filter("mid='m1'").collect()}
    names_m2 = {r["cand_name"] for r in c.filter("mid='m2'").collect()}
    assert "Donetsk" in names_m1 and any("Oblast" in n for n in names_m1)
    assert names_m2 == {"Donetsk Oblast"}


def test_rule_scores_exact_arithmetic(spark, alias_table):
    """Hand-computed replication of linking.py:175-202 for 'moscow' GPE:
    RU Moscow: exact 1 + type 1 + info3 1 + RU 1       = 4.0
    US Moscow: exact 1 + type 1 + info3 1 + US -0.5    = 2.5
    -> W5 keeps only the RU row."""
    q = mk_queries(spark, [("u", "m1", "moscow", "GPE", "troops near moscow")])
    scored = score_candidates(generate_candidates(q, alias_table, 0), q)
    rows = {r["cand_name"] + "/" + (r["info"].split("\t")[0]): r["rule_score"] for r in scored.collect()}
    assert rows == {"Moscow/RU": 4.0}


def test_singleton_confidence_one(spark, alias_table):
    # mariupol has exactly one candidate -> confidence 1.0 (linking.py:333-335)
    q = mk_queries(spark, [("u", "m1", "mariupol", "GPE", "x")])
    d = disambiguate(score_candidates(generate_candidates(q, alias_table, 0), q), q)
    rows = d.collect()
    assert len(rows) == 1 and rows[0]["confidence"] == 1.0


def test_confidence_normalization_sums_to_one(spark, alias_table):
    # odessa: UA + US survive W5? UA: 1+1+1+1=4, US: 1+1+1-0.5=2.5, CA cleaned out
    # -> singleton again; use a tie-producing query instead: viktor marchenko PER
    q = mk_queries(spark, [("u", "m1", "viktor marchenko", "PER", "viktor marchenko in kyiv")])
    d = disambiguate(score_candidates(generate_candidates(q, alias_table, 0), q), q)
    rows = d.collect()
    if len(rows) > 1:
        assert abs(sum(r["confidence"] for r in rows) - 1.0) < 1e-9  # A7
        # context IoU x5 must prefer the Ukraine politician (linking.py:288-293)
        best = min(rows, key=lambda r: r["rank"])
        assert "Ukraine" in best["info"]


def test_fuzzy_retry_budget(spark, alias_table):
    # 'kramatorskk' (len 11 -> budget min(5,2)=2): dist-1 match to Kramatorsk
    q = mk_queries(spark, [("u", "m1", "kramatorskk", "GPE", "x")])
    c = generate_candidates(q, alias_table, 1)
    assert {r["cname"] for r in c.collect()} == {"Kramatorsk"}
    # 'kyi' (len 3 -> budget 0): exact gen finds nothing, fuzzy never runs
    q2 = mk_queries(spark, [("u", "m2", "kyi", "GPE", "x")])
    assert generate_candidates(q2, alias_table, 0).count() == 0


def test_nil_promotion_threshold(spark):
    rows = [("u%d" % i, "m%d" % i, "zorylenko", "PER", "x") for i in range(5)]
    rows += [("u9", "m9", "rare name", "PER", "x")]
    nils = mk_queries(spark, rows)
    promoted = promote_nils(nils)
    out = promoted.collect()
    assert len(out) == 1 and out[0]["name"] == "zorylenko"  # >=5 only (linking.py:473-475)
    # deterministic id (A6 deviation: sha1, not counter)
    again = {r["tmp_eid"] for r in promote_nils(nils).collect()}
    assert again == {out[0]["tmp_eid"]}


def test_link_mentions_end_to_end_deterministic(spark, kb):
    e, a = kb
    pages = pages_df(spark, n_pages=25)
    m = discover_mentions(pages).localCheckpoint()
    l1 = sorted(map(tuple, link_mentions(m, e, a).filter("rank=1").collect()))
    l2 = sorted(map(tuple, link_mentions(m.repartition(11), e, a).filter("rank=1").collect()))
    assert l1 == l2
    assert len(l1) > 0
    # every linked eid is prefixed (linking.py:405-407)
    assert all(r[2].startswith(("refkb:", "tmpkb:")) for r in l1)
    # determinism across KB partitionings too: alias_id is content-derived,
    # so reshuffling/reordering the KB side must not move any tie-break
    # (the round-1 monotonically_increasing_id bug surface)
    l3 = sorted(map(tuple, link_mentions(
        m, e.repartition(7).sortWithinPartitions("name"),
        a.repartition(5).sortWithinPartitions("alias"),
    ).filter("rank=1").collect()))
    assert l1 == l3


def test_query_kb_probe(spark):
    """--query probe (linking.py:753-759): full ranked candidate list with
    KB attribute columns; bare types get the ldcOnt: prefix."""
    from named_entity_discovery_and_linking_spark.fixtures.generator import kb_dfs
    from named_entity_discovery_and_linking_spark.operators.linking import query_kb

    kb, al = kb_dfs(spark)
    out = query_kb(spark, kb, al, [("Kyiv", "GPE"), ("Nosuchplace12345", "GPE")])
    rows = out.collect()
    kyiv = [r for r in rows if r["q_name"] == "Kyiv"]
    assert kyiv and kyiv[0]["q_type"] == "ldcOnt:GPE"
    assert any(r["rank"] == 1 for r in kyiv)
    assert all(r["cname"] is not None for r in kyiv)
    # KB attribute columns ride along (the printed 'info' fields)
    assert {"country", "feature", "wiki"} <= set(out.columns)
    # unlinkable name -> no rows (the CLI prints the REPL's 'none')
    assert not [r for r in rows if r["q_name"] == "Nosuchplace12345"]


def test_audit_map_file(spark, tmp_path):
    """--map_file audit (linking.py:769-807): 'L' rows only, first char of
    name/concept stripped, type from filename, every name present in the
    output even when unlinked."""
    from named_entity_discovery_and_linking_spark.fixtures.generator import kb_dfs
    from named_entity_discovery_and_linking_spark.operators.linking import audit_map_file

    p = tmp_path / "named_gpe_audit.csv"
    p.write_text("L,'Kyiv,'concept:kyiv\nX,'Skipme,'concept:skip\nL,'Qqqq,'concept:q\n"
                 "L,'Kyiv,'concept:kyiv2\n")  # same name, second concept
    kb, al = kb_dfs(spark)
    out = audit_map_file(spark, kb, al, str(p)).collect()
    by_name = {}
    for r in out:
        by_name.setdefault(r["q_name"], []).append(r)
    assert set(by_name) == {"Kyiv", "Qqqq"}          # non-L row skipped
    assert any(r["eid"] for r in by_name["Kyiv"])     # linked
    assert all(r["eid"] is None for r in by_name["Qqqq"])  # 'none' row kept
    # a name listed with two concepts gets each candidate set ONCE per
    # concept — no cross-multiplication from duplicate query rows
    kyiv_by_concept = {}
    for r in by_name["Kyiv"]:
        kyiv_by_concept.setdefault(r["concept"], []).append(r["eid"])
    assert set(kyiv_by_concept) == {"concept:kyiv", "concept:kyiv2"}
    assert kyiv_by_concept["concept:kyiv"] == kyiv_by_concept["concept:kyiv2"]
    assert len(kyiv_by_concept["concept:kyiv"]) == len(set(kyiv_by_concept["concept:kyiv"]))


def test_audit_map_file_requires_typed_filename(spark, tmp_path):
    import pytest as _pytest

    from named_entity_discovery_and_linking_spark.fixtures.generator import kb_dfs
    from named_entity_discovery_and_linking_spark.operators.linking import audit_map_file

    p = tmp_path / "other.csv"
    p.write_text("L,x,y\n")
    kb, al = kb_dfs(spark)
    with _pytest.raises(ValueError):
        audit_map_file(spark, kb, al, str(p))


def test_query_tmpkb_probe(spark):
    """--query_tmp probe (linking.py:760-768): seeded tmp-KB lookup with
    deterministic @sha1 ids; misses return no rows."""
    from named_entity_discovery_and_linking_spark.operators.linking import query_tmpkb

    out = {r["q_name"]: r for r in query_tmpkb(
        spark, [("MH17", "VEH"), ("Unknown999", "VEH")]).collect()}
    assert set(out) == {"MH17"}
    assert out["MH17"]["eid"].startswith("tmpkb:@")
    assert out["MH17"]["confidence"] == 1.0 and out["MH17"]["rank"] == 1


def test_cap_before_gate_reference_order(spark):
    """The top-100 cap applies to UNGATED retrieval (searcher.search(q, 100))
    and the F6 gate runs afterwards in score_candidates (linking.py:112,
    :151-159): a PER mention whose 3 PER candidates rank below 150 GPE
    candidates in retrieval order must go NIL — gating inside the retrieval
    join would incorrectly keep them.  Below the cap the same setup links."""
    from named_entity_discovery_and_linking_spark.operators.linking import (
        generate_candidates_unified,
        score_candidates,
    )

    def aliases(n_gpe):
        rows = [(i, f"gpe{i}", "washington", "washington", "GPE", "", 1, 1,
                 ["washington"]) for i in range(n_gpe)]
        rows += [(1000 + i, f"per{i}", "washington", "washington", "PER", "", 1, 1,
                  ["washington"]) for i in range(3)]
        return spark.createDataFrame(
            rows,
            "alias_id long, eid string, cand_name string, cname string, "
            "cand_type string, info string, info_nfields int, n_tokens int, "
            "tokens array<string>",
        )

    queries = spark.createDataFrame(
        [("u", "m1", "washington", "PER", ["washington"], ["washington"], 1)],
        "url string, mid string, ent_name string, ent_type string, "
        "ctx_tokens array<string>, q_tokens array<string>, n_q int",
    )
    # 150 GPE rows with lower alias_ids: the ungated top-100 is all-GPE,
    # the gate then empties it, fuzzy re-retrieves the same set -> NIL
    over = score_candidates(
        generate_candidates_unified(queries, aliases(150), 2, broadcast_index=True),
        queries,
    )
    assert over.count() == 0
    # 50 GPE rows: all 53 candidates fit the cap, the gate keeps the 3 PERs
    under = score_candidates(
        generate_candidates_unified(queries, aliases(50), 2, broadcast_index=True),
        queries,
    )
    assert sorted(r["eid"] for r in under.collect()) == ["per0", "per1", "per2"]


def test_tmpkb_token_subset_retrieval(spark):
    """TemporaryKB.query is Lucene AND-of-terms (linking.py:372): a mention
    whose tokens are a SUBSET of a registered name's tokens retrieves it —
    'boeing' hits a promoted 'boeing 777'; full-string equality is not
    required; type equality still gates."""
    from named_entity_discovery_and_linking_spark.operators.linking import (
        tmpkb_lookup,
    )

    tmpkb = spark.createDataFrame(
        [("@abc", "boeing 777", "VEH"), ("@def", "kyiv", "GPE")],
        "tmp_eid string, name string, type string",
    )
    nil_q = spark.createDataFrame(
        [("u", "m1", "boeing", "VEH", [""]),
         ("u", "m2", "777 boeing", "VEH", [""]),   # order-free AND
         ("u", "m3", "boeing 747", "VEH", [""]),   # '747' unmatched -> miss
         ("u", "m4", "boeing", "GPE", [""])],      # type gate -> miss
        "url string, mid string, ent_name string, ent_type string, "
        "ctx_tokens array<string>",
    )
    got = {r["mid"]: r for r in tmpkb_lookup(nil_q, tmpkb).collect()}
    assert set(got) == {"m1", "m2"}
    assert got["m1"]["eid"] == "tmpkb:@abc"
    assert got["m1"]["confidence"] == 1.0  # single hit -> normalized to 1
