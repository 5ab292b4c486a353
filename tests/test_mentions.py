"""Mention-discovery semantics (main.py:64-290 re-expressed)."""

from named_entity_discovery_and_linking_spark.fixtures.generator import pages_df
from named_entity_discovery_and_linking_spark.operators.mentions import (
    TaggerConfig,
    _analyze_doc,
    apply_nist_key,
    discover_mentions,
    is_url,
    normalize_ldc_type,
    resolve_filler_overlaps,
)

CFG = TaggerConfig.default()


def rows_for(text):
    return _analyze_doc("u://x", None, text, CFG)


def get(rows, category):
    return [r for r in rows if r[3] == category]


def test_gazetteer_nam():
    rows = rows_for("Viktor Marchenko visited Kyiv .")
    nams = get(rows, "NAM")
    texts = {r[4]: r[5] for r in nams}
    assert texts["Viktor Marchenko"] == "ldcOnt:PER.Politician"  # J4 fine type
    assert texts["Kyiv"] == "ldcOnt:GPE.UrbanArea.City"


def test_heuristic_nam_floor_score():
    rows = rows_for("They met Zorylenko yesterday .")
    nams = [r for r in get(rows, "NAM") if r[4] == "Zorylenko"]
    assert len(nams) == 1
    assert nams[0][14] == 0.6  # ner.py:327-329 probability floor


def test_sentence_initial_single_cap_not_nam():
    rows = rows_for("Fighting started near Donetsk .")
    assert all(r[4] != "Fighting" for r in get(rows, "NAM"))


def test_nominal_with_wordnet_type():
    rows = rows_for("Viktor Marchenko praised the army near Kyiv .")
    noms = get(rows, "NOM")
    assert any(r[4] == "the army" and r[5] == "ldcOnt:ORG.MilitaryOrganization" for r in noms)


def test_title_filler_requires_per():
    # J6 (filler.py:36-43): title emitted only when a PER is present
    with_per = rows_for("President Viktor Marchenko spoke .")
    without = rows_for("The president spoke at the meeting .")
    assert any(r[4].lower() == "president" for r in get(with_per, "FIL"))
    assert not any(r[4].lower() == "president" for r in get(without, "FIL"))


def test_time_number_url_fillers():
    rows = rows_for("At 14:30 on 2014-07-17 about 25% was posted at http://ex.com/a%20b .")
    fils = get(rows, "FIL")
    kinds = {r[6] for r in fils}
    assert {"TIME", "NUMERICAL", "URL"} <= kinds
    # URL chunk got the %20 -> ___ rewrite upstream and still matches F9
    assert any("___" in r[4] for r in fils if r[6] == "URL")
    # types normalize to VAL/TTL family (main.py:173-180)
    assert all(r[5].startswith("ldcOnt:VAL") for r in fils if r[6] != "TITLE")


def test_filler_overlap_keeps_longer():
    # W1 (main.py:100-126): containment keeps the longer span
    fils = [("14:30", 3, 8, "TIME"), ("14:30 on 2014-07-17", 3, 22, "TIME")]
    out = resolve_filler_overlaps(fils)
    assert out == [("14:30 on 2014-07-17", 3, 22, "TIME")]


def test_is_url_predicate():
    # F9 (dictionary.py:8-23) — the reference's char set is exactly
    # / \ . = - < > ' " ; '?', '&', '#', ':', '_' do NOT count
    assert is_url("http://a.b/c")
    assert is_url("x" * 31)
    assert is_url("a/b.c=d-e/f")          # 5 hits from the reference set
    assert is_url("\"quoted\"<x>'y'")      # quotes/brackets count (6 hits)
    assert not is_url("a:b?c&d#e_f~g")     # zero reference-set hits
    assert not is_url("hello")


def test_normalize_ldc_type_branches():
    ids = CFG.ont_ids
    # subsubtype wins first (main.py:158-161)
    assert normalize_ldc_type("VEH", "WheeledVehicle", "Truck", ids) == "ldcOnt:VEH.WheeledVehicle.Truck"
    # type+subtype containment
    assert normalize_ldc_type("ORG", "Government", "n/a", ids) == "ldcOnt:ORG.Government"
    # VAL/TTL rewrite (main.py:173-180)
    assert normalize_ldc_type("NUMERICAL", "n/a", "n/a", ids) == "ldcOnt:VAL"
    assert normalize_ldc_type("TITLE", "n/a", "n/a", ids) == "ldcOnt:TTL"
    # ldc-prefixed passthrough (main.py:189-190)
    assert normalize_ldc_type("ldcOnt:GPE.UrbanArea.City", "x", "y", ids) == "ldcOnt:GPE.UrbanArea.City"


def test_nist_key_exactly_one_hit():
    nk = CFG.nist_key
    assert apply_nist_key("the soldiers", "ldcOnt:PER", nk) == nk["soldiers"]
    # two hits -> no override (main.py:236-244)
    assert apply_nist_key("police force", "ldcOnt:ORG", nk) == "ldcOnt:ORG"


def test_discover_mentions_df(spark):
    pages = pages_df(spark, n_pages=20)
    m = discover_mentions(pages)
    rows = m.collect()
    assert len(rows) > 0
    cats = {r["category"] for r in rows}
    assert cats <= {"NAM", "NOM", "FIL"}
    # lang gate F1: only eng pages contribute
    langs = {r["url"] for r in rows}
    non_eng = {p["url"] for p in pages.filter("lang != 'eng'").collect()}
    assert not (langs & non_eng)


def test_mentions_deterministic_across_parallelism(spark):
    pages = pages_df(spark, n_pages=15)
    a = sorted(map(tuple, discover_mentions(pages).collect()))
    b = sorted(map(tuple, discover_mentions(pages.repartition(13)).collect()))
    assert a == b


# ---------------------------------------------------------------- NP chunker

def test_multiword_np_with_head_finding():
    """Multi-word NPs (nominal.py:26-43) with the reference head recursion
    (tree.py:64-76): head = last noun of the core, span covers det+mods."""
    rows = rows_for("The rebel military commander attacked .")
    noms = get(rows, "NOM")
    assert any(
        r[4] == "The rebel military commander" and r[13] == "commander"
        and r[5] == "ldcOnt:PER.MilitaryPersonnel"
        for r in noms
    ), noms


def test_pp_attached_np_head_is_first_core():
    """(NP (NP the commander) (PP of (NP the army))): no top-level NN ->
    recurse into the last top-level NP child -> 'commander'."""
    rows = rows_for("The commander of the army spoke .")
    noms = get(rows, "NOM")
    outer = [r for r in noms if r[4] == "The commander of the army"]
    assert outer and outer[0][13] == "commander"
    # the inner PP object keeps its own head
    assert any(r[4] == "the army" and r[13] == "army" for r in noms)
    # W2: 'The commander' core is subsumed by the outer span (same head)
    assert not any(r[4] == "The commander" for r in noms)


def test_find_head_of_np_recursion_unit():
    from named_entity_discovery_and_linking_spark.operators.mentions import (
        _NPNode,
        find_head_of_np,
    )

    # (NP (DT the) (JJ rebel) (NN commander) (NN army)) -> last top-level NN
    core = _NPNode("NP", [_NPNode("DT", index=0), _NPNode("JJ", index=1),
                          _NPNode("NN", index=2), _NPNode("NN", index=3)])
    assert find_head_of_np(core) == 3
    # composite: no top-level NN -> last top-level NP -> recurse
    inner = _NPNode("NP", [_NPNode("DT", index=4), _NPNode("NN", index=5)])
    pp = _NPNode("PP", [_NPNode("IN", index=3), inner])
    outer = _NPNode("NP", [core, pp])
    # NOTE: outer has top-level NP children only -> last NP child is `pp`?
    # no: PP is not NP; the last (only) NP child is `core` -> head index 3
    assert find_head_of_np(outer) == 3
    # no NN anywhere -> last leaf
    bare = _NPNode("NP", [_NPNode("DT", index=0), _NPNode("JJ", index=1)])
    assert find_head_of_np(bare) == 1


def test_coordinated_np_flat_last_conjunct_heads():
    """COORD := CORE ((CC|,) CORE)+ flat, PTB shape (NP (NP a) (CC and)
    (NP b)): find_head_of_np's last-NP recursion -> the LAST conjunct heads
    the coordination (tree.py:64-76 on the same shape)."""
    rows = rows_for("Soldiers and protesters gathered .")
    noms = get(rows, "NOM")
    outer = [r for r in noms if r[4] == "Soldiers and protesters"]
    assert outer and outer[0][13] == "protesters", noms
    # wordnet types the head (protester) but the NIST-key single-hit rule
    # (main.py:236-244) fires on 'soldiers' — the only nist_key token in the
    # wider span — and overrides to Combatant
    assert outer[0][5] == "ldcOnt:PER.Combatant"
    # first conjunct keeps its own mention; last is subsumed by W2 (same head)
    assert any(r[4] == "Soldiers" and r[13] == "Soldiers" for r in noms)
    assert not any(r[4] == "protesters" for r in noms)


def test_comma_list_with_oxford_cc():
    """Comma list 'a , b and c': separators of one or two (CC|,) tokens all
    coordinate into ONE flat NP; head = last conjunct."""
    rows = rows_for("Tanks , trucks and rockets fired .")
    noms = get(rows, "NOM")
    outer = [r for r in noms if r[4] == "Tanks , trucks and rockets"]
    assert outer and outer[0][13] == "rockets", noms
    assert outer[0][5] == "ldcOnt:WEA.MissileSystem.Missile"
    # non-head conjuncts survive as their own NOMs
    assert any(r[4] == "Tanks" for r in noms)
    assert any(r[4] == "trucks" for r in noms)


def test_appositive_comma_coordination():
    """Appositive 'the commander , a spokesman' coordinates over the bare
    comma; head = last conjunct (spokesman)."""
    rows = rows_for("The commander , a spokesman , arrived .")
    noms = get(rows, "NOM")
    outer = [r for r in noms if r[4] == "The commander , a spokesman"]
    assert outer and outer[0][13] == "spokesman", noms
    assert any(r[4] == "The commander" and r[13] == "commander" for r in noms)


def test_pp_chain_over_coordination():
    """NP := (CORE|COORD) (IN (CORE|COORD))*: a coordination can be a PP
    object; the composite's head is still the FIRST unit's head."""
    rows = rows_for("The commander of the army and the militia spoke .")
    noms = get(rows, "NOM")
    full = [r for r in noms if r[4] == "The commander of the army and the militia"]
    assert full and full[0][13] == "commander", noms
    # the coordinated PP object is its own NP, headed by the last conjunct
    assert any(r[4] == "the army and the militia" and r[13] == "militia" for r in noms)
    assert any(r[4] == "the army" for r in noms)


def test_possessive_core_heads_possessed_noun():
    """Genitive modifier: (NP (NP the government 's) (NNS soldiers)) — the
    possessive tags as a noun slot, the core ends at the possessed noun and
    heads there."""
    rows = rows_for("The government's soldiers attacked .")
    noms = get(rows, "NOM")
    outer = [r for r in noms if r[4] == "The government's soldiers"]
    assert outer and outer[0][13] == "soldiers", noms
    # a bare possessive with no possessed noun types nothing (lemma lookup
    # fails on the genitive form) and must not crash or emit
    rows2 = rows_for("The government's was blamed .")
    assert all(r[13] != "government's" for r in get(rows2, "NOM"))


def test_single_word_np_filters_reference_sets():
    """F3 single-token filters use the reference's literal sets
    (nominal.py:48-50): quantifiers/bare-NP words drop, plain nouns pass."""
    rows = rows_for("Soldiers gathered near the bridge .")
    noms = get(rows, "NOM")
    assert any(r[13].lower() == "soldiers" for r in noms)
    assert any(r[13] == "bridge" for r in noms)


def test_normalize_fallthrough_keeps_raw_type():
    """main.py:181-182: a no-match fall-through only prints a warning — the
    raw type survives (it is NOT coerced to ldcOnt:T; downstream type[7:10]
    slicing then yields '' and the mention never links, as in the
    reference)."""
    from named_entity_discovery_and_linking_spark.operators.mentions import (
        normalize_ldc_type,
    )

    ont = ["ldcOnt:GPE.UrbanArea.City", "ldcOnt:PER.Politician"]
    # sst known but matched nowhere -> raw
    assert normalize_ldc_type("PER", "Foo", "bar", ont) == "PER"
    # st known, t+st matched nowhere -> raw
    assert normalize_ldc_type("ORG", "Weird", None, ont) == "ORG"
    # all-n/a triple -> raw (the t=='n/a' elif shadows the rewrite branch)
    assert normalize_ldc_type("n/a", None, None, ont) == "n/a"
    # empty ontology: the loop never runs -> raw even for the VAL rewrite case
    assert normalize_ldc_type("numerical", None, None, []) == "numerical"
    # the in-loop VAL rewrite still fires with a non-empty ontology
    assert normalize_ldc_type("numerical", None, None, ont) == "ldcOnt:VAL"
