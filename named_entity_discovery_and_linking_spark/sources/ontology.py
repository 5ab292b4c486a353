"""Loaders for the reference's ACTUAL ontology/stopword inputs, so a user
with the real LDC files can build a TaggerConfig from them directly (the
gazetteer directory already loads via sources/gazetteers.py).

Reproduced (cites into /root/reference/code_ner_bert):
  - ``LDCOntology_v0.1.jsonld``  JSON-LD frame list; every frame with
    ``@type == 'entity_type'`` contributes its ``@id`` to the ont_ids scan
    list, in file order (main.py:17-23).
  - ``nist_key`` derivation (main.py:25-61): first-seen subtype /
    sub-subtype bookkeeping over the ont_ids, a literal allowlist for
    two-part ids, every unseen sub-subtype keyed, then the three manual
    force/forces/soldiers overrides.
  - NLTK English stopwords (ner.py:7-8).  nltk is used when importable;
    otherwise a frozen snapshot of the same public list (nltk_data
    ``corpora/stopwords/english``, 179 words) keeps behavior identical in
    environments without it, such as this container.
  - ``SUBTYPE_HIERARCHY`` literal (ner.py:251-270) reproduced bug-for-bug:
    the reference's typos ('Associaton', 'MissleSystem') and its
    ``'Aircraft' + 'MilitaryVehicle'`` string-concatenation bug (which
    yields 'AircraftMilitaryVehicle' and drops BOTH intended subtypes) are
    kept so a real run filters subtypes identically; noted in
    DEVIATIONS.md so nobody "fixes" it silently.

These are driver-side dimension loads (the ontology JSON-LD is ~100 KB);
the resulting lists/dicts ride into the mapInPandas tagger closure — the
broadcast-variable equivalent, same as the gazetteer loaders.
"""

from __future__ import annotations

import json

# main.py:37-39 — the literal subtype allowlist for two-part ontology ids.
NIST_KEY_SUBTYPES = [
    "police", "politician", "protester", "aircraft", "militaryvehicle",
    "rocket", "watercraft", "bomb", "bullets", "missilesystem",
]

# ner.py:251-270, verbatim semantics including the concatenation bug in the
# VEH row and the 'Associaton'/'MissleSystem' typos.
REFERENCE_SUBTYPE_HIERARCHY = {
    "FAC": set(
        ["ApartmentBuilding", "GovernmentBuilding", "House", "OfficeBuilding",
         "School", "StoreShop", "VotingFacility", "Border", "Checkpoint",
         "Airport", "MilitaryInstallation", "TrainStation", "Barricade",
         "Bridge", "Plaza", "Tower", "Highway", "Street"]
        + ["Building", "GeographicalArea", "Installation", "Structure", "Way"]
    ),
    "GPE": set(
        ["Country", "OrganizationOfCountries", "ProvinceState", "City",
         "Village"] + ["UrbanArea"]
    ),
    "LOC": set(
        ["Address", "Continent", "AirSpace", "CrimeScene", "Field",
         "Neighborhood", "Region"]
        + ["GeographicalPosition", "Land", "Position"]
    ),
    "ORG": set(
        ["Club", "Team", "BroadcastingCompany", "Corporation", "Manufacturer",
         "NewsAgency", "CriminalOrganization", "Agency", "Council",
         "FireDepartment", "LawEnforcementAgency", "LegislativeBody",
         "MonitoringGroup", "ProsecutorOffice", "Railway", "Commission",
         "GovernmentArmedForce", "Intelligence", "NonGovernmentMilitia"]
        + ["Associaton", "CommercialOrganization", "CriminalOrganization",
           "Government", "International", "MilitaryOrganization",
           "PoliticalOrganization"]
    ),
    "PER": set(
        ["Mercenary", "Sniper", "SportsFan", "MilitaryOfficer",
         "ChiefOfPolice", "Governor", "HeadOfGovernment", "Mayor",
         "Ambassador", "Firefighter", "Journalist", "Minister", "Paramedic",
         "Scientist", "Spokesperson", "Spy", "ProtestLeader"]
        + ["Combatant", "Fan", "MilitaryPersonnel", "Politician",
           "ProfessionalPosition", "Protester"]
    ),
    "VEH": set(
        ["Airplane", "CargoAircraft", "Helicopter", "FighterAircraft",
         "MilitaryBoat", "MilitaryTransportAircraft", "Tank", "Rocket",
         "Boat", "yacht", "Bus", "Car", "FireApparatus", "Train", "Truck"]
        + ["Aircraft" + "MilitaryVehicle", "Rocket", "Watercraft",
           "WheeledVehicle"]
    ),
    "WEA": set(
        ["Bomb", "Grenade", "Cannon", "DaggerKnifeSword", "PoisonGas",
         "Artillery", "Firearm", "AirToAirMissile", "AntiAircraftMissile",
         "Missile", "SurfaceToAirMissile", "Rock"]
        + ["Bomb", "Bullets", "Cannon", "Club", "DaggerKnifeSword", "Gas",
           "GrenadeLauncher", "Gun", "MissleSystem", "ThrownProjectile"]
    ),
}

# Frozen snapshot of NLTK's public English stopword corpus
# (nltk_data corpora/stopwords/english) — the exact set ner.py:8 builds.
_NLTK_ENGLISH_STOPWORDS = (
    "i me my myself we our ours ourselves you you're you've you'll you'd "
    "your yours yourself yourselves he him his himself she she's her hers "
    "herself it it's its itself they them their theirs themselves what "
    "which who whom this that that'll these those am is are was were be "
    "been being have has had having do does did doing a an the and but if "
    "or because as until while of at by for with about against between "
    "into through during before after above below to from up down in out "
    "on off over under again further then once here there when where why "
    "how all any both each few more most other some such no nor not only "
    "own same so than too very s t can will just don don't should "
    "should've now d ll m o re ve y ain aren aren't couldn couldn't didn "
    "didn't doesn doesn't hadn hadn't hasn hasn't haven haven't isn isn't "
    "ma mightn mightn't mustn mustn't needn needn't shan shan't shouldn "
    "shouldn't wasn wasn't weren weren't won won't wouldn wouldn't"
).split()


def load_ldc_ontology(path: str) -> list:
    """``LDCOntology_v0.1.jsonld`` -> ont_ids: the ``@id`` of every frame
    with ``@type == 'entity_type'``, in file order (main.py:17-23).  Order
    is load-bearing: both X5 normalization (first containing id wins,
    main.py:158-171) and the nist_key first-seen rules scan this list."""
    with open(path, encoding="utf-8") as f:
        onto = json.load(f)
    return [fr["@id"] for fr in onto["frames"] if fr["@type"] == "entity_type"]


def build_nist_key(ont_ids: list) -> dict:
    """The exact nist_key recurrence of main.py:25-61 over the ont_ids scan:

    - two-part id ``ldcOnt:T.S``: if S is UNSEEN, mark seen; if lower(S) is
      in the literal allowlist, key it to the full id.
    - three-part id ``ldcOnt:T.S.SS``: mark S seen (no key!); if SS is
      UNSEEN, mark seen and key lower(SS) to the full id.
    - afterwards force/forces/soldiers -> ldcOnt:PER.MilitaryPersonnel
      (main.py:59-61).

    "Unseen" is global across the scan, so a subtype that first appears in
    a three-part id never gets a two-part key later — order-dependent by
    design, reproduced faithfully."""
    nist_key: dict = {}
    stypes_seen: list = []
    sstypes_seen: list = []
    for ori in ont_ids:
        parts = ori.split(":")[1].split(".")
        if len(parts) == 2:
            _t, st = parts
            if st not in stypes_seen:
                stypes_seen.append(st)
                if st.lower() in NIST_KEY_SUBTYPES:
                    nist_key[st.lower()] = ori
        elif len(parts) == 3:
            _t, st, sst = parts
            if st not in stypes_seen:
                stypes_seen.append(st)
            if sst not in sstypes_seen:
                sstypes_seen.append(sst)
                nist_key[sst.lower()] = ori
    nist_key["force"] = "ldcOnt:PER.MilitaryPersonnel"
    nist_key["forces"] = "ldcOnt:PER.MilitaryPersonnel"
    nist_key["soldiers"] = "ldcOnt:PER.MilitaryPersonnel"
    return nist_key


def load_nltk_stopwords() -> set:
    """ner.py:7-8: ``set(stopwords.words('english'))``.  Uses nltk when the
    package and its corpus are present; otherwise the frozen snapshot of
    the same list."""
    try:
        from nltk.corpus import stopwords  # noqa: PLC0415

        return set(stopwords.words("english"))
    except Exception:
        return set(_NLTK_ENGLISH_STOPWORDS)


def tagger_config_from_ldc(ontology_path: str, base=None,
                           use_reference_hierarchy: bool = True,
                           use_nltk_stopwords: bool = True):
    """Build a TaggerConfig whose ontology dimensions come from the real
    LDC JSON-LD file: ont_ids (X5 scan order), nist_key (main.py:25-61),
    the ner.py:251-270 subtype hierarchy, and NLTK stopwords.

    ``base`` (default TaggerConfig.default()) supplies the surfaces this
    file does not carry (gazetteer phrases, titles, wordnet typing,
    adjectives); compose with tagger_config_from_gazetteer_dir to replace
    those from the reference's gazetteer directory too.
    """
    from ..operators.mentions import TaggerConfig

    base = base or _default_config()
    ont_ids = load_ldc_ontology(ontology_path)
    return TaggerConfig(
        gaz_phrases=base.gaz_phrases,
        titles=base.titles,
        title_dict=base.title_dict,
        wordnet=base.wordnet,
        ont_ids=ont_ids,
        nist_key=build_nist_key(ont_ids),
        subtype_hierarchy=(
            {k: set(v) for k, v in REFERENCE_SUBTYPE_HIERARCHY.items()}
            if use_reference_hierarchy else base.subtype_hierarchy
        ),
        stopwords=load_nltk_stopwords() if use_nltk_stopwords else base.stopwords,
        adjectives=base.adjectives,
    )


def _default_config():
    from ..operators.mentions import TaggerConfig

    return TaggerConfig.default()
