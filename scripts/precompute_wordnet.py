"""Offline WordNet -> lemma-type-table precompute (X7).

The reference calls ``get_semantic_class_with_subtype(lemma)`` at tag time
(wordnet.py:107-252): take the lemma's FIRST synset (wordnet.py:111-115),
then walk the hypernym closure with a BFS (wordnet.py:9-18 ``is_hypernym``)
against curated synset sets (wordnet.py:21-65) in a fixed branch order to
produce (type, subtype, subsubtype).  WordNet is static, so SURVEY.md §2.7
plans this as an OFFLINE precompute: run once, ship the TSV as a broadcast
dimension table (sources/gazetteers.load_wordnet_table ->
TaggerConfig.wordnet).

Requires nltk + its wordnet corpus (not in this container — the tool is
import-gated; the decision CHAIN itself is pure and unit-tested against a
fake synset graph in tests/test_gazetteer_loaders.py).

    python scripts/precompute_wordnet.py <vocab_file> <out_tsv>

vocab_file: one lemma per line; out_tsv: lemma\ttype\tsubtype\tsubsubtype
(only rows with at least one non-n/a field are written — F4 drops the rest
anyway).
"""

from __future__ import annotations

import sys
from collections import deque


def is_hypernym(sem_class, term) -> bool:
    """BFS over the hypernym closure (wordnet.py:9-18)."""
    q = deque([term])
    while q:
        synset = q.popleft()
        if synset in sem_class:
            return True
        q.extend(synset.hypernyms())
    return False


def build_semantic_sets(wn) -> dict:
    """The curated synset sets of wordnet.py:21-65."""
    s = lambda *names: set(sum((wn.synsets(n) for n in names), []))
    return {
        "PERSON": s("person"),
        "PERSON_COMBATANT": s("combatant"),
        "PERSON_MERCENARY": s("mercenary"),
        "PERSON_SNIPER": s("sniper"),
        "PERSON_FAN": s("fan"),
        "PERSON_POLICE": s("police"),
        "PERSON_POLITICIAN": s("politician"),
        "PERSON_AMBASSADOR": s("ambassador"),
        "PERSON_FIREFIGHTER": s("firefighter"),
        "PERSON_JOURNALIST": s("journalist"),
        "PERSON_MINISTER": s("minister"),
        "PERSON_PARAMEDIC": s("paramedic"),
        "PERSON_SCIENTIST": s("scientist"),
        "PERSON_SPOKEPERSON": s("spokeperson"),
        "PERSON_SPY": s("spy"),
        "PERSON_PROTESTER": s("protester"),
        "ORGANIZATION": s("organization", "military", "group"),
        "ORGANIZATION_GOVERNMENT": s("government"),
        "ORGANIZATION_POLITICAL": s("party", "court"),
        "ORGANIZATION_MILITARY": s("military"),
        "LOCATION": s("location"),
        "GPE": s("administrative_district"),
        "FACILITY": s("facility", "structure"),
        "VEHICLE": s("vehicle"),
        "VEHICLE_AIRCRAFT": s("aircraft"),
        "VEHICLE_ROCKET": s("rocket"),
        "VEHICLE_WATERCRAFT": s("watercraft"),
        "VEHICLE_BUS": s("bus"),
        "VEHICLE_CAR": s("car"),
        "VEHICLE_TRAIN": s("train"),
        "VEHICLE_TRUCK": s("truck"),
        "WEAPON": s("weapon", "weaponry", "arms", "implements_of_war",
                    "weapons_system", "munition"),
        "CRIME": s("crime"),
    }


def classify(term, sets, hyper=is_hypernym) -> tuple:
    """Faithful transcription of get_semantic_class_with_subtype's live
    branch chain (wordnet.py:152-252) over a FIRST synset ``term``; note the
    independent (non-elif) GPE/FAC/LOC/WEA/VEH type assignments where the
    LAST hit wins, exactly as in the reference.  ``hyper`` is injectable so
    the chain is unit-testable without nltk."""
    t, st, sst = "n/a", "n/a", "n/a"
    if hyper(sets["PERSON"], term):
        t = "PER"
    if hyper(sets["PERSON_COMBATANT"], term):
        t, st = "PER", "Combatant"
        if hyper(sets["PERSON_MERCENARY"], term):
            sst = "Mercenary"
        elif hyper(sets["PERSON_SNIPER"], term):
            sst = "Sniper"
    elif hyper(sets["PERSON_FAN"], term):
        t, st = "PER", "Fan"
    elif hyper(sets["PERSON_POLICE"], term):
        t, st = "PER", "Police"
    elif hyper(sets["PERSON_POLITICIAN"], term):
        t, st = "PER", "Politician"
    elif hyper(sets["PERSON_PROTESTER"], term):
        t, st = "PER", "Protester"
    elif hyper(sets["PERSON_AMBASSADOR"], term):
        t, st, sst = "PER", "ProfessionalPosition", "Ambassador"
    elif hyper(sets["PERSON_FIREFIGHTER"], term):
        t, st, sst = "PER", "ProfessionalPosition", "Firefighter"
    elif hyper(sets["PERSON_JOURNALIST"], term):
        t, st, sst = "PER", "ProfessionalPosition", "Journalist"
    elif hyper(sets["PERSON_MINISTER"], term):
        t, st, sst = "PER", "ProfessionalPosition", "Minister"
    elif hyper(sets["PERSON_PARAMEDIC"], term):
        t, st, sst = "PER", "ProfessionalPosition", "Paramedic"
    elif hyper(sets["PERSON_SCIENTIST"], term):
        t, st, sst = "PER", "ProfessionalPosition", "Scientist"
    elif hyper(sets["PERSON_SPOKEPERSON"], term):
        t, st, sst = "PER", "ProfessionalPosition", "Spokeperson"
    elif hyper(sets["PERSON_SPY"], term):
        t, st, sst = "PER", "ProfessionalPosition", "Spy"
    if st != "n/a" or sst != "n/a":
        return t, st, sst
    if hyper(sets["ORGANIZATION"], term):
        t = "ORG"
    if hyper(sets["ORGANIZATION_GOVERNMENT"], term):
        t, st, sst = "ORG", "Government", "n/a"
    elif hyper(sets["ORGANIZATION_POLITICAL"], term):
        t, st, sst = "ORG", "PoliticalOrganization", "n/a"
    elif hyper(sets["ORGANIZATION_MILITARY"], term):
        t, st, sst = "ORG", "MilitaryOrganization", "n/a"
    if st != "n/a" or sst != "n/a":
        return t, st, sst
    if hyper(sets["GPE"], term):
        t = "GPE"
    if hyper(sets["FACILITY"], term):
        t = "FAC"
    if hyper(sets["LOCATION"], term):
        t = "LOC"
    if hyper(sets["WEAPON"], term):
        t = "WEA"
    if hyper(sets["VEHICLE"], term):
        t = "VEH"
    if hyper(sets["VEHICLE_AIRCRAFT"], term):
        t, st, sst = "VEH", "Aircraft", "n/a"
    elif hyper(sets["VEHICLE_ROCKET"], term):
        t, st, sst = "VEH", "Rocket", "n/a"
    elif hyper(sets["VEHICLE_WATERCRAFT"], term):
        t, st, sst = "VEH", "Watercraft", "n/a"
    elif hyper(sets["VEHICLE_BUS"], term):
        t, st, sst = "VEH", "WheeledVehicle", "Bus"
    elif hyper(sets["VEHICLE_CAR"], term):
        t, st, sst = "VEH", "WheeledVehicle", "Car"
    elif hyper(sets["VEHICLE_TRAIN"], term):
        t, st, sst = "VEH", "WheeledVehicle", "Train"
    elif hyper(sets["VEHICLE_TRUCK"], term):
        t, st, sst = "VEH", "WheeledVehicle", "Truck"
    if st != "n/a" or sst != "n/a":
        return t, st, sst
    if hyper(sets["CRIME"], term):
        t = "CRM"
    return t, st, sst


def main() -> None:
    try:
        from nltk.corpus import wordnet as wn
        wn.synsets("person")  # force corpus load
    except Exception as e:  # pragma: no cover - container has no nltk corpus
        sys.exit(
            f"nltk WordNet unavailable ({e}); run where nltk + the wordnet "
            "corpus are installed. The decision chain itself is unit-tested "
            "without nltk (tests/test_gazetteer_loaders.py)."
        )
    vocab_file, out_tsv = sys.argv[1], sys.argv[2]
    sets = build_semantic_sets(wn)
    n = 0
    with open(vocab_file, encoding="utf-8") as f, open(out_tsv, "w", encoding="utf-8") as out:
        for line in f:
            lemma = line.strip().lower()
            if not lemma:
                continue
            syns = wn.synsets(lemma)
            if not syns:
                continue  # wordnet.py:111-113: no synset -> all n/a
            t, st, sst = classify(syns[0], sets)
            if (t, st, sst) != ("n/a", "n/a", "n/a"):
                out.write(f"{lemma}\t{t}\t{st}\t{sst}\n")
                n += 1
    print(f"wrote {n} typed lemmas to {out_tsv}")


if __name__ == "__main__":
    main()
