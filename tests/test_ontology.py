"""Real LDC ontology / stopword loaders (sources/ontology.py) against the
reference's ACTUAL files and its ACTUAL derivation code.

The nist_key parity test extracts main.py:17-61 from /root/reference
(read-only, never vendored) and executes it in a scratch cwd against the
real ``LDCOntology_v0.1.jsonld``, then requires our build_nist_key to match
the produced dict exactly — the same direct-execution methodology as
test_reference_scoring_parity.
"""

import json
import os
import shutil
import textwrap

import pytest

from named_entity_discovery_and_linking_spark.operators.mentions import (
    apply_nist_key,
    normalize_ldc_type,
)
from named_entity_discovery_and_linking_spark.sources.ontology import (
    REFERENCE_SUBTYPE_HIERARCHY,
    build_nist_key,
    load_ldc_ontology,
    load_nltk_stopwords,
    tagger_config_from_ldc,
)

REF_DIR = "/root/reference/code_ner_bert"
ONTO = os.path.join(REF_DIR, "LDCOntology_v0.1.jsonld")
needs_ref = pytest.mark.skipif(not os.path.exists(ONTO), reason="reference checkout absent")


@needs_ref
def test_ont_ids_from_real_jsonld():
    ids = load_ldc_ontology(ONTO)
    assert len(ids) > 100
    assert all(i.startswith("ldcOnt:") for i in ids)
    # file order preserved (X5 scans first-containing-id, main.py:158-171)
    raw = [fr["@id"] for fr in json.load(open(ONTO))["frames"]
           if fr["@type"] == "entity_type"]
    assert ids == raw


@needs_ref
def test_nist_key_matches_reference_execution(tmp_path):
    """Execute main.py:17-61 (the nist_ner scan + nist_key recurrence +
    manual overrides) from the reference source and compare dicts."""
    src = open(os.path.join(REF_DIR, "main.py")).read().splitlines()
    s = next(i for i, l in enumerate(src) if l.startswith("nist_ner = []"))
    e = next(i for i, l in enumerate(src) if l.startswith("nist_key['soldiers']"))
    snippet = textwrap.dedent("\n".join(src[s:e + 1]))
    # the snippet opens its inputs/outputs relative to cwd
    shutil.copy(ONTO, tmp_path / "LDCOntology_v0.1.jsonld")
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        ns = {"json": json, "pickle": __import__("pickle"), "print": lambda *a: None}
        exec(snippet, ns)
    finally:
        os.chdir(cwd)
    ours = build_nist_key(load_ldc_ontology(ONTO))
    assert ours == ns["nist_key"]


@needs_ref
def test_tagger_config_from_ldc_wiring(spark):
    cfg = tagger_config_from_ldc(ONTO)
    # X5 normalization against the REAL scan list
    assert normalize_ldc_type("ldcOnt:GPE.UrbanArea.City", "x", "y", cfg.ont_ids) \
        == "ldcOnt:GPE.UrbanArea.City"
    # the manual overrides land (main.py:59-61)
    assert cfg.nist_key["soldiers"] == "ldcOnt:PER.MilitaryPersonnel"
    assert apply_nist_key("the soldiers", "ldcOnt:PER", cfg.nist_key) \
        == "ldcOnt:PER.MilitaryPersonnel"
    # ner.py:251-270 hierarchy rides in, including the reproduced VEH
    # concatenation bug: 'AircraftMilitaryVehicle' present, neither intended
    # subtype is
    assert cfg.subtype_hierarchy is not None
    veh = cfg.subtype_hierarchy["VEH"]
    assert "AircraftMilitaryVehicle" in veh
    assert "Aircraft" not in veh and "MilitaryVehicle" not in veh
    assert "MissleSystem" in cfg.subtype_hierarchy["WEA"]  # typo kept
    # NLTK stopword surface (ner.py:8) — frozen snapshot in this container
    assert {"the", "and", "of", "wouldn't"} <= cfg.stopwords
    assert len(cfg.stopwords) == 179


def test_stopword_snapshot_shape():
    sw = load_nltk_stopwords()
    assert len(sw) == 179
    assert "ourselves" in sw and "mightn't" in sw
    assert "soldier" not in sw


def test_nist_key_query_equals_python_derivation(spark):
    """The q_nist_key window-function derivation must equal build_nist_key
    (the direct Python port) on the fixture scan list — and on the real
    ontology's id list when the reference checkout is present."""
    from named_entity_discovery_and_linking_spark.fixtures.generator import LDC_ENTITY_TYPES
    from named_entity_discovery_and_linking_spark.plans.driver_queries import q_nist_key

    got = {r["keyword"]: r["ont_id"] for r in q_nist_key(spark, "").collect()}
    assert got == build_nist_key(list(LDC_ENTITY_TYPES))

    if os.path.exists(ONTO):
        # same plan over the REAL ontology's scan list
        import unittest.mock as mock

        real_ids = load_ldc_ontology(ONTO)
        with mock.patch(
            "named_entity_discovery_and_linking_spark.fixtures.generator.LDC_ENTITY_TYPES",
            real_ids,
        ):
            got_real = {r["keyword"]: r["ont_id"] for r in q_nist_key(spark, "").collect()}
        assert got_real == build_nist_key(real_ids)


def test_reference_hierarchy_is_legal_for_attach(spark):
    """The real hierarchy drops into attach_subtypes unchanged: a legal
    (type, subtype) pair attaches, an illegal one does not."""
    from named_entity_discovery_and_linking_spark.operators.enrich import attach_subtypes

    mentions = spark.createDataFrame(
        [("d1", 0, "m1", "PER", None, 7), ("d1", 0, "m2", "WEA", None, 17)],
        "url string, sid int, mid string, coarse_type string, "
        "subtype string, char_end int",
    )
    spans = spark.createDataFrame(
        [("d1", 0, "Governor", 7), ("d1", 0, "Governor", 17)],
        "url string, sid int, subtype string, tok_end int",
    )
    hier = spark.createDataFrame(
        [(t, s) for t, subs in sorted(REFERENCE_SUBTYPE_HIERARCHY.items())
         for s in sorted(subs)],
        "type string, subtype string",
    )
    out = {r["mid"]: r["subtype"] for r in attach_subtypes(mentions, spans, hier).collect()}
    assert out.get("m1") == "Governor"      # PER allows Governor
    assert out.get("m2") != "Governor"      # WEA does not
