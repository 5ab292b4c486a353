"""Equivalence proof-by-test: the single-pass unified candidate generation
(generate_candidates_unified) selects exactly the candidates the reference's
SEQUENTIAL retry loop would (linking.py:309-336): exact search first; if the
type-gated set is empty, fuzzy at dist=1, then 2, up to the EFFECTIVE budget
min(2, len//5) — the reference asks for up to min(5, len//5) but Lucene's
FuzzyQuery caps maxEdits at 2, so its 'term~3..5' retries throw and return
'none' (linking.py:322-324); first non-empty gated set wins."""

import pytest
from pyspark.sql import functions as F

from named_entity_discovery_and_linking_spark.fixtures.generator import kb_dfs
from named_entity_discovery_and_linking_spark.operators.linking import (
    build_alias_table,
    clean_kb,
    generate_candidates,
    generate_candidates_unified,
)


@pytest.fixture(scope="module")
def alias_table(spark):
    kb, al = kb_dfs(spark)
    return build_alias_table(clean_kb(kb), al).localCheckpoint()


def mk_queries(spark, names_types):
    rows = [("u", f"m{i}", n, t, n) for i, (n, t) in enumerate(names_types)]
    df = spark.createDataFrame(
        rows, "url string, mid string, ent_name string, ent_type string, sent_text string"
    )
    return (
        df.withColumn("ctx_tokens", F.array_distinct(F.split(F.col("sent_text"), r"\s+")))
        .drop("sent_text")
        .withColumn("q_tokens", F.expr(r"array_distinct(filter(split(ent_name, '[^\\p{L}\\p{N}]+'), t -> t != ''))"))
        .withColumn("n_q", F.size("q_tokens"))
    )


def sequential_reference(spark, queries, alias_table):
    """The reference's retry loop, literally: per dist, gated candidate set;
    first non-empty wins."""
    gate = (
        (F.col("ent_type").isin("GPE", "LOC", "FAC") & F.col("cand_type").isin("GPE", "LOC"))
        | ((F.col("ent_type") == "ORG") & (F.col("cand_type") == "ORG"))
        | ((F.col("ent_type") == "PER") & (F.col("cand_type") == "PER"))
    )
    result = {}  # mid -> set of eids
    q_rows = {r["mid"]: r for r in queries.collect()}
    for dist in range(0, 3):  # effective Lucene budget: maxEdits 2
        pending_mids = [m for m in q_rows if m not in result]
        if not pending_mids:
            break
        pending = queries.filter(F.col("mid").isin(pending_mids))
        if dist > 0:
            pending = pending.filter(
                F.least(F.lit(2), F.floor(F.length("ent_name") / 5)) >= dist
            )
        cands = generate_candidates(pending, alias_table, dist)
        gated = cands.join(
            queries.select("mid", "ent_type"), "mid"
        ).filter(gate)
        for r in gated.select("mid", "eid").distinct().collect():
            result.setdefault(r["mid"], set()).add(r["eid"])
    return result


def test_unified_equals_sequential(spark, alias_table):
    cases = [
        ("kyiv", "GPE"),            # exact hit
        ("moscow", "GPE"),          # exact, multiple candidates
        ("kramatorskk", "GPE"),     # fuzzy dist-1 only
        ("horlivkaaa", "GPE"),      # fuzzy dist-2
        ("mocsow", "GPE"),          # adjacent transposition: DL 1 (lev 2 > budget 1)
        ("kyi", "GPE"),             # budget 0 -> no fuzzy, NIL
        ("zorylenko", "PER"),       # no match at any dist
        ("viktor marchenko", "PER"),  # multiword exact
        ("donetsk oblast", "GPE"),  # AND semantics multiword
        ("ministry of defense", "ORG"),
        ("odessa", "PER"),          # type gate blocks everything
    ]
    queries = mk_queries(spark, cases).localCheckpoint()
    seq = sequential_reference(spark, queries, alias_table)
    # unified now emits UNGATED retrieval (score_candidates owns the F6
    # gate, as in the reference) — apply the same gate before comparing
    gate = (
        (F.col("ent_type").isin("GPE", "LOC", "FAC") & F.col("cand_type").isin("GPE", "LOC"))
        | ((F.col("ent_type") == "ORG") & (F.col("cand_type") == "ORG"))
        | ((F.col("ent_type") == "PER") & (F.col("cand_type") == "PER"))
    )
    uni_gated = (
        generate_candidates_unified(queries, alias_table)
        .join(queries.select("mid", "ent_type"), "mid")
        .filter(gate)
    )
    uni = {}
    for r in uni_gated.select("mid", "eid").distinct().collect():
        uni.setdefault(r["mid"], set()).add(r["eid"])
    assert uni == seq
