"""Loaders for the reference's ACTUAL gazetteer file formats, so a user with
the reference's ``code_ner_bert/gazetteer/`` directory can build a
TaggerConfig from it directly.

Formats (cites into /root/reference/code_ner_bert):
  - ``*.ga``   name<TAB>ldcOnt-type; keys lowercased (gazetteer.py:3-13)
  - ``*.lst`` / ``*.txt``  one name per line, lowercased (gazetteer.py:27-49,
    filler.py:4-8)
  - ``russian_names.lst``  plus FIRST-TWO-TOKEN expansion: each of the first
    two tokens of every name is itself added (gazetteer.py:14-23)
  - ``*.wiki``  name<TAB>native<TAB>region (cites.wiki; optional)
  - wordnet TSV  lemma<TAB>type<TAB>subtype<TAB>subsubtype — the offline
    precompute of wordnet.py:107-252 (scripts/precompute_wordnet.py)

These are driver-side dimension loads (KB/MB scale); the resulting dicts are
pickled into the mapInPandas tagger closure — the broadcast-variable
equivalent.  Literal sets (weapons, countries, locations) reproduce
gazetteer.py:25,33,36.
"""

from __future__ import annotations

import os

# literal sets from gazetteer.py:25 (weapon_names), :36 (country_names),
# :33 (location_names).  '9M38' keeps the reference's UPPERCASE: lookups
# run over lowercased tokens, so the entry never matches — a reference bug
# preserved bug-for-bug (lowercasing it here would emit WEA mentions the
# reference never produces on real MH17 corpora; cf. the preserved
# ontology typos, DEVIATIONS #13)
WEAPON_NAMES = {"buk", "buk-telar", "9M38", "missile"}
COUNTRY_NAMES = {"russia", "ukraine", "malaysia", "dutch", "netherland"}
LOCATION_NAMES = {"euromaidan"}


def load_ga(path: str) -> dict:
    """name<TAB>ldcOnt-type -> {lower(name): type} (gazetteer.py:3-13).
    Later duplicate keys overwrite earlier ones, like the reference dict."""
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.strip().split("\t")
            if len(parts) >= 2:
                out[parts[0].lower()] = parts[1]
    return out


def load_name_list(path: str) -> set:
    """One name per line, lowercased (gazetteer.py:27-49, filler.py:4-8)."""
    with open(path, encoding="utf-8") as f:
        return {line.strip().lower() for line in f if line.strip()}


def load_russian_names(path: str) -> set:
    """russian_names.lst with the first-two-token expansion
    (gazetteer.py:14-23): the full lowered name plus each of its first two
    tokens individually."""
    names = set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            low = line.strip().lower()
            if not low:
                continue
            names.add(low)
            for i, w in enumerate(low.split()):
                if i == 2:
                    break
                names.add(w)
    return names


def load_wiki_tab(path: str) -> list:
    """cites.wiki: name<TAB>native<TAB>region rows."""
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 3:
                rows.append((parts[0], parts[1], parts[2]))
    return rows


def load_wordnet_table(path: str) -> dict:
    """lemma<TAB>type<TAB>subtype<TAB>subsubtype -> {lemma: (t, st, sst)} —
    the offline precompute of wordnet.py:107-252 (see
    scripts/precompute_wordnet.py)."""
    out = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 4:
                out[parts[0]] = (parts[1], parts[2], parts[3])
    return out


def tagger_config_from_gazetteer_dir(gaz_dir: str, wordnet_table: str | None = None,
                                     base=None):
    """Build a TaggerConfig whose gazetteer/title surface comes from the
    reference's actual data files.

    Loaded (missing files are skipped — the checkout itself lacks ru.txt,
    which gazetteer.py:40 requires, so a faithful loader must tolerate it):
      per.ga -> PER phrases with fine types; cites.ga -> GPE with fine types;
      org.txt -> ORG; russian_names.lst (expanded) -> PER;
      ru.txt / ua.txt geonames -> GPE; jobtitles.lst (+'president',
      filler.py:8) -> titles; weapons/countries/locations literals.

    ``base`` (default TaggerConfig.default()) supplies the non-gazetteer
    dimensions (ontology ids, nist_key, subtype hierarchy, stopwords,
    adjectives) and, unless ``wordnet_table`` is given, the wordnet typing
    table.
    """
    from ..operators.mentions import TaggerConfig, _PhraseDict

    base = base or TaggerConfig.default()

    def maybe(fn, name):
        p = os.path.join(gaz_dir, name)
        return fn(p) if os.path.exists(p) else None

    phrases: dict = {}

    def add_phrases(names, ctype, fine_map=None):
        for n in names:
            phrases[tuple(n.split())] = (ctype, fine_map.get(n) if fine_map else None)

    per = maybe(load_ga, "per.ga") or {}
    add_phrases(per, "PER", per)
    cites = maybe(load_ga, "cites.ga") or {}
    add_phrases(cites, "GPE", cites)
    add_phrases(maybe(load_name_list, "org.txt") or set(), "ORG")
    add_phrases(maybe(load_russian_names, "russian_names.lst") or set(), "PER")
    add_phrases(maybe(load_name_list, "ru.txt") or set(), "GPE")
    add_phrases(maybe(load_name_list, "ua.txt") or set(), "GPE")
    add_phrases(WEAPON_NAMES, "WEA")
    add_phrases(COUNTRY_NAMES, "GPE",
                {n: "ldcOnt:GPE.Country.Country" for n in COUNTRY_NAMES})
    add_phrases(LOCATION_NAMES, "LOC")

    titles = maybe(load_name_list, "jobtitles.lst") or set()
    titles.add("president")  # filler.py:8
    title_tuples = {tuple(t.split()) for t in titles}

    wordnet = load_wordnet_table(wordnet_table) if wordnet_table else base.wordnet
    return TaggerConfig(
        gaz_phrases=_PhraseDict(phrases),
        titles=title_tuples,
        title_dict=_PhraseDict({t: None for t in title_tuples}),
        wordnet=wordnet,
        ont_ids=base.ont_ids,
        nist_key=base.nist_key,
        subtype_hierarchy=base.subtype_hierarchy,
        stopwords=base.stopwords,
        adjectives=base.adjectives,
    )
