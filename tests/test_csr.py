"""E3 CSR ingestion + per-language routing (linking.py:480-700).

Synthetic .csr.json fixtures drive read_csr_dir -> link_csr -> xref append
against the fixture KB (kyiv/moscow/donbas... entities)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from named_entity_discovery_and_linking_spark.fixtures.generator import kb_dfs
from named_entity_discovery_and_linking_spark.plans.csr import link_csr, run_csr
from named_entity_discovery_and_linking_spark.sources.csr_json import read_csr_dir


def _frame_ent(fid, text, enttype, ref="s1", fringe=None, form="named", label=None):
    f = {
        "@type": "entity_evidence",
        "@id": fid,
        "provenance": {"text": text, "reference": ref},
        "interp": {"type": enttype, "form": form},
    }
    if fringe is not None:
        f["interp"]["fringe"] = fringe
    if label is not None:
        f["label"] = label
    return f


def _write_csr(path, frames):
    with open(path, "w") as f:
        json.dump({"frames": frames}, f)


@pytest.fixture(scope="module")
def csr_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("csr")
    _write_csr(
        os.path.join(d, "doc1.csr.json"),
        [
            {"@type": "sentence", "@id": "s1",
             "provenance": {"text": "Fighting near Kyiv continued"}},
            _frame_ent("e1", "Kyiv", "ldcOnt:GPE.UrbanArea.City"),
            _frame_ent("e2", "Kyiv", "ldcOnt:GPE"),
            # type as a LIST of {value} dicts (linking.py:526-528)
            _frame_ent("e3", "Zorylenko", [{"value": "ldcOnt:PER"}]),
            _frame_ent("e4", "Zorylenko", "ldcOnt:PER"),
            # nominal form is ignored (F10)
            _frame_ent("e5", "the city", "ldcOnt:GPE", form="nominal"),
            {"@type": "relation_evidence", "@id": "c1",
             "interp": {"type": "aida:entity_coreference",
                        "args": [{"arg": "e1"}, {"arg": "e2"}]}},
            {"@type": "relation_evidence", "@id": "c2",
             "interp": {"type": "aida:entity_coreference",
                        "args": [{"arg": "e3"}, {"arg": "e4"}]}},
        ],
    )
    return str(d)


def test_read_csr_dir(spark, csr_dir):
    ents, sents, clus = read_csr_dir(spark, csr_dir)
    e = {r["frame_id"]: r for r in ents.collect()}
    assert set(e) == {"e1", "e2", "e3", "e4", "e5"}
    assert e["e3"]["enttype"] == "ldcOnt:PER"  # list form unwrapped
    assert e["e5"]["form"] == "nominal"
    assert {r["sent_id"]: r["sent_text"] for r in sents.collect()} == {
        "s1": "Fighting near Kyiv continued"
    }
    got_clusters = {(r["cluster_id"], r["member"]) for r in clus.collect()}
    assert got_clusters == {("c1", "e1"), ("c1", "e2"), ("c2", "e3"), ("c2", "e4")}


def test_link_csr_en_vote_and_election(spark, csr_dir):
    ents, sents, clus = read_csr_dir(spark, csr_dir)
    kb, al = kb_dfs(spark)
    linked = link_csr(ents, sents, clus, kb, al, "en")
    rows = {r["frame_id"]: r for r in linked.collect()}
    # A2: both Kyiv frames re-linked to the same voted refkb entity
    assert rows["e1"]["eid"].startswith("refkb:")
    assert rows["e1"]["eid"] == rows["e2"]["eid"]
    assert rows["e1"]["subcomponent"] == 0
    # F10: the nominal frame never links
    assert "e5" not in rows
    # A3: the fully-NIL Zorylenko cluster elects one tmp entity for both
    assert rows["e3"]["eid"].startswith("tmpkb:@")
    assert rows["e3"]["eid"] == rows["e4"]["eid"]
    assert rows["e3"]["subcomponent"] == 2 and rows["e3"]["confidence"] == 1.0


def test_link_csr_ru_fringe_merge(spark, tmp_path):
    d = tmp_path / "ru"
    d.mkdir()
    _write_csr(
        str(d / "doc2.csr.json"),
        [
            # native form links exactly; fringe (marker char + romanized
            # alias) boosts the same entity (J10 confidence sum, cap 1.0)
            _frame_ent("r1", "Kyiv", "ldcOnt:GPE", fringe="@Kiev"),
            # fringe on a NIL native form is never queried (linking.py:538)
            _frame_ent("r2", "Zorylenko", "ldcOnt:PER", fringe="@Zorylenko"),
        ],
    )
    ents, sents, clus = read_csr_dir(spark, str(d))
    kb, al = kb_dfs(spark)
    linked = link_csr(ents, sents, clus, kb, al, "ru")
    rows = {r["frame_id"]: r for r in linked.collect()}
    assert rows["r1"]["eid"].startswith("refkb:")
    assert rows["r1"]["confidence"] == 1.0  # 1.0 native + fringe, capped
    assert "r2" not in rows  # NIL either way (no cluster, no election)


def test_run_csr_rewrites_files(spark, csr_dir, tmp_path):
    out = str(tmp_path / "out")
    n = run_csr(spark, csr_dir, out, "en")
    assert n == 1
    with open(os.path.join(out, "doc1.csr.json")) as f:
        doc = json.load(f)
    by_id = {fr["@id"]: fr for fr in doc["frames"] if fr["@type"] == "entity_evidence"}
    x1 = by_id["e1"]["interp"]["xref"]
    assert x1[0]["component"] == "opera.entities.edl.refkb.xianyang"
    assert x1[0]["id"].startswith("refkb:") and x1[0]["subcomponent"] == 0
    assert by_id["e3"]["interp"]["xref"][0]["subcomponent"] == 2
    assert "xref" not in by_id["e5"].get("interp", {})  # nominal untouched


def test_read_csr_dir_empty(spark, tmp_path):
    ents, sents, clus = read_csr_dir(spark, str(tmp_path))
    assert ents.count() == 0 and sents.count() == 0 and clus.count() == 0
    kb, al = kb_dfs(spark)
    assert link_csr(ents, sents, clus, kb, al, "en").count() == 0
