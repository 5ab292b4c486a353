"""J8 / J10 / A4 / J5 / A5 enrichment operator semantics."""

from named_entity_discovery_and_linking_spark.operators.enrich import (
    attach_subtypes,
    attach_wiki,
    gazetteer_substring_vote,
    merge_fringe_links,
    subtype_vote,
)


def test_attach_wiki(spark):
    links = spark.createDataFrame(
        [("u", "m1", "refkb:E1", "Kyiv", 1.0, 1, 0), ("u", "m2", "tmpkb:@x", "Z", 1.0, 1, 2)],
        "url string, mid string, eid string, cname string, confidence double, rank int, subcomponent int",
    )
    wm = spark.createDataFrame([("E1", "https://w/Kyiv")], "eid string, wiki_url string")
    out = {r["mid"]: r["wiki_url"] for r in attach_wiki(links, wm).collect()}
    assert out["m1"] == "https://w/Kyiv" and out["m2"] is None


def test_merge_fringe_sums_and_caps(spark):
    schema = "url string, mid string, eid string, cname string, confidence double, rank int, subcomponent int"
    native = spark.createDataFrame([("u", "m1", "refkb:E1", "A", 0.7, 1, 0)], schema)
    fringe = spark.createDataFrame(
        [("u", "m1", "refkb:E1", "A", 0.6, 1, 0), ("u", "m1", "refkb:E2", "B", 0.4, 2, 0)], schema
    )
    out = {r["eid"]: (r["confidence"], r["rank"]) for r in merge_fringe_links(native, fringe).collect()}
    assert out["refkb:E1"] == (1.0, 1)  # 0.7+0.6 capped at 1.0 (linking.py:545-551)
    assert out["refkb:E2"] == (0.4, 2)  # fringe-only candidate passes through


def test_subtype_vote_majority_and_distrust(spark):
    rows = [("u", 0, 1, 3, "Politician")] * 3 + [("u", 0, 1, 3, "Combatant")] * 2
    # a second span with 11 votes -> dropped (distrust rule ner.py:368-369)
    rows += [("u", 0, 5, 7, f"T{i % 11}") for i in range(11)]
    votes = spark.createDataFrame(rows, "url string, sid int, tok_begin int, tok_end int, subtype string")
    out = subtype_vote(votes).collect()
    assert len(out) == 1
    r = out[0]
    assert r["subtype"] == "Politician" and r["votes"] == 3 and r["vote_share"] == 0.6


def test_attach_subtypes_hierarchy_gate(spark):
    mentions = spark.createDataFrame(
        [("u", 0, "m1", "PER", "n/a", 10), ("u", 0, "m2", "GPE", "n/a", 20)],
        "url string, sid int, mid string, coarse_type string, subtype string, char_end int",
    )
    spans = spark.createDataFrame(
        [("u", 0, 10, "Politician"), ("u", 0, 20, "Politician")],  # Politician illegal for GPE
        "url string, sid int, tok_end int, subtype string",
    )
    hier = spark.createDataFrame([("PER", "Politician")], "type string, subtype string")
    out = {r["mid"]: r["subtype"] for r in attach_subtypes(mentions, spans, hier).collect()}
    assert out["m1"] == "Politician"
    assert out["m2"] == "n/a"  # hierarchy gate blocked it (ner.py:377-382)


def test_gazetteer_substring_vote(spark):
    mentions = spark.createDataFrame(
        [("m1", "general dmitri volkov"), ("m2", "unrelated words")],
        "mid string, mention string",
    )
    gaz = spark.createDataFrame(
        [("volkov", "ldcOnt:PER.MilitaryPersonnel"),
         ("dmitri volkov", "ldcOnt:PER.MilitaryPersonnel"),
         ("general", "ldcOnt:PER.Politician")],
        "name string, fine_type string",
    )
    out = {r["mid"]: (r["voted_type"], r["votes"]) for r in gazetteer_substring_vote(mentions, gaz).collect()}
    assert out["m1"] == ("ldcOnt:PER.MilitaryPersonnel", 2)  # majority over substring hits
    assert "m2" not in out


def test_attach_subtypes_first_legal_falls_through(spark):
    """ner.py:378-381: candidates are tried in vote order and the FIRST
    LEGAL subtype wins — an illegal top-voted subtype falls through to the
    runner-up instead of attaching nothing; exactly one attaches."""
    from pyspark.sql import functions as F

    mentions = spark.createDataFrame(
        [("u", 0, "m1", "PER", 5, "n/a")],
        "url string, sid int, mid string, coarse_type string, char_end int, subtype string",
    )
    spans = spark.createDataFrame(
        [("u", 0, 5, "UrbanArea", 5),    # top votes but GPE-only: illegal
         ("u", 0, 5, "Politician", 2),   # runner-up, PER-legal -> wins
         ("u", 0, 5, "Government", 1)],  # legal but fewer votes
        "url string, sid int, tok_end int, subtype string, votes int",
    )
    hier = spark.createDataFrame(
        [("PER", "Politician"), ("PER", "Government"), ("GPE", "UrbanArea")],
        "type string, subtype string",
    )
    out = attach_subtypes(mentions, spans, hier).collect()
    assert len(out) == 1 and out[0]["subtype"] == "Politician"


def test_subtype_vote_distrust_counts_distinct_subtypes(spark):
    """ner.py:368-369: len(nertype) counts DISTINCT subtypes — a span with
    11 distinct one-vote subtypes is distrusted; one subtype with 50 votes
    is kept."""
    rows = [("u", 0, 1, 2, f"S{i}") for i in range(11)]          # 11 distinct
    rows += [("u", 0, 3, 4, "T")] * 50                            # hot but trusted
    votes = spark.createDataFrame(
        rows, "url string, sid int, tok_begin int, tok_end int, subtype string"
    )
    out = subtype_vote(votes).collect()
    assert len(out) == 1
    assert (out[0]["tok_begin"], out[0]["subtype"], out[0]["votes"]) == (3, "T", 50)
