"""Tests for the DataFrame-level mention operators added in round 2:

- J7 merge_edl + read_edl_tab (unify_edl.py:7-36 semantics)
- F5 nam_nom_dedup_df (main.py:84-98 as anti-joins)
- X5 normalize_types_df: GRID equivalence against the reference-exact Python
  normalize_ldc_type (the columnar operator must agree on every branch)
"""

import itertools

import pytest
from pyspark.sql import functions as F

from named_entity_discovery_and_linking_spark.fixtures.generator import LDC_ENTITY_TYPES
from named_entity_discovery_and_linking_spark.operators.edl import merge_edl, read_edl_tab
from named_entity_discovery_and_linking_spark.operators.mentions import (
    nam_nom_dedup_df,
    normalize_ldc_type,
    normalize_types_df,
)

MENTION_COLS = (
    "url string, mid string, category string, mention string, char_begin int, char_end int, "
    "headword string, head_begin int, head_end int"
)
EDL_COLS = (
    "doc string, line_no bigint, mention string, char_begin int, char_end int, "
    "fb_id string, wiki_id string, form string"
)


def test_merge_edl_nam_band_and_last_wins(spark):
    mentions = spark.createDataFrame(
        [
            ("d1", "m1", "NAM", "Kyiv", 100, 104, "Kyiv", 100, 104),
            ("d1", "m2", "NAM", "Odessa", 200, 206, "Odessa", 200, 206),
            ("d1", "m3", "NAM", "Lviv", 300, 304, "Lviv", 300, 304),
        ],
        MENTION_COLS,
    )
    edl = spark.createDataFrame(
        [
            # matches m1 exactly (end inclusive: 103 + 1 == 104)
            ("d1", 1, "Kyiv", 100, 103, "fb:kyiv.a", "wk:kyiv", "NAM"),
            # also matches m1 within the +-1 band; HIGHER line_no -> wins
            ("d1", 2, "Kyiv", 101, 104, "fb:kyiv.b", "wk:kyiv2", "NAM"),
            # off by 2 -> no match for m2
            ("d1", 3, "Odessa", 202, 207, "fb:odessa", "wk:odessa", "NAM"),
            # right span, wrong form -> no match for m3
            ("d1", 4, "Lviv", 300, 303, "fb:lviv", "wk:lviv", "NOM"),
        ],
        EDL_COLS,
    )
    out = {r["mid"]: (r["fb_id"], r["wiki_id"]) for r in merge_edl(mentions, edl).collect()}
    assert out["m1"] == ("fb:kyiv.b", "wk:kyiv2")  # last matching line wins
    assert out["m2"] == (None, None)
    assert out["m3"] == (None, None)


def test_merge_edl_is_document_scoped(spark):
    """Offsets restart per doc (unify_edl.py pairs each ner file with its own
    edl file): a same-text same-span EDL row from ANOTHER document must not
    transfer its ids."""
    mentions = spark.createDataFrame(
        [("d1", "m1", "NAM", "Kyiv", 100, 104, "Kyiv", 100, 104)], MENTION_COLS
    )
    edl = spark.createDataFrame(
        [
            ("d2", 7, "Kyiv", 100, 103, "fb:other-doc", "wk:other", "NAM"),
            ("d1", 1, "Kyiv", 100, 103, "fb:same-doc", "wk:same", "NAM"),
        ],
        EDL_COLS,
    )
    row = merge_edl(mentions, edl).collect()[0]
    # d2's line_no is higher but it must lose: wrong document
    assert (row["fb_id"], row["wiki_id"]) == ("fb:same-doc", "wk:same")


def test_merge_edl_requires_doc_keys(spark):
    m = spark.createDataFrame([("m1", "NAM")], "mid string, category string")
    e = spark.createDataFrame([(1,)], "line_no bigint")
    with pytest.raises(ValueError, match="url"):
        merge_edl(m, e)


def test_merge_edl_nom_matches_on_head_span(spark):
    mentions = spark.createDataFrame(
        [("d1", "m1", "NOM", "the commander", 10, 23, "commander", 14, 23)],
        MENTION_COLS,
    )
    edl = spark.createDataFrame(
        [("d1", 1, "commander", 14, 22, "fb:cmd", "wk:cmd", "NOM")], EDL_COLS
    )
    row = merge_edl(mentions, edl).collect()[0]
    assert (row["fb_id"], row["wiki_id"]) == ("fb:cmd", "wk:cmd")


def test_read_edl_tab(spark, tmp_path):
    line = "\t".join(
        ["x", "x", "Kyiv", "doc1:100-103", "fb:kyiv", "GPE", "NAM", "x", "Kyiv city", "LOC", "wk:kyiv"]
    )
    p = tmp_path / "edl.tab"
    p.write_text(line + "\n" + line.replace("Kyiv", "Lviv").replace(":100-103", ":7-10") + "\n")
    rows = read_edl_tab(spark, str(p)).orderBy("line_no").collect()
    assert [r["mention"] for r in rows] == ["Kyiv", "Lviv"]
    assert rows[0]["doc"] == "doc1"
    assert (rows[0]["char_begin"], rows[0]["char_end"]) == (100, 103)
    assert (rows[1]["char_begin"], rows[1]["char_end"]) == (7, 10)
    assert rows[0]["fb_id"] == "fb:kyiv" and rows[0]["wiki_id"] == "wk:kyiv"
    assert rows[0]["form"] == "NAM"


def test_read_edl_tab_multi_file_line_numbers(spark, tmp_path):
    """line_no is a TOTAL order: per-file read order composed with the
    file's lexicographic rank (file_idx * 2^32 + file_line), so the
    last-line-wins rule is deterministic both within and across files —
    neither partition-enumeration order nor a per-file restart can change
    the winner."""
    def mk(word, doc, n):
        return "\n".join(
            "\t".join(["x", "x", f"{word}{i}", f"{doc}:{i}-{i+3}", f"fb:{word}{i}",
                       "GPE", "NAM", "x", word, "LOC", f"wk:{word}{i}"])
            for i in range(n)
        ) + "\n"

    (tmp_path / "a.tab").write_text(mk("Kyiv", "docA", 3))
    (tmp_path / "b.tab").write_text(mk("Lviv", "docB", 5))
    rows = read_edl_tab(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc"], []).append(r)
    base = 2 ** 32
    assert sorted(r["line_no"] for r in by_doc["docA"]) == [1, 2, 3]
    assert sorted(r["line_no"] for r in by_doc["docB"]) == [base + 1, base + 2,
                                                           base + 3, base + 4, base + 5]
    # a.tab ranks before b.tab lexicographically: every a line < every b line
    assert max(r["line_no"] for r in by_doc["docA"]) < min(r["line_no"] for r in by_doc["docB"])
    # within each file, line_no follows file order
    for doc, word, off in (("docA", "Kyiv", 0), ("docB", "Lviv", base)):
        for r in by_doc[doc]:
            assert r["mention"] == f"{word}{r['line_no'] - off - 1}"


def test_read_edl_tab_colon_doc_ids(spark, tmp_path):
    """Doc ids containing ':<digits>-' must parse correctly: the span regex
    is anchored, so 'doc:2020-01:45-67' yields doc='doc:2020-01',
    begin=45, end=67 (the unanchored form grabbed ':2020-')."""
    line = "\t".join(
        ["x", "x", "Kyiv", "doc:2020-01:45-67", "fb:k", "GPE", "NAM", "x", "K", "LOC", "wk:k"]
    )
    (tmp_path / "edl.tab").write_text(line + "\n")
    r = read_edl_tab(spark, str(tmp_path / "edl.tab")).collect()[0]
    assert r["doc"] == "doc:2020-01"
    assert (r["char_begin"], r["char_end"]) == (45, 67)


def test_merge_edl_cross_file_last_wins(spark, tmp_path):
    """Two files, both matching the same mention: the row from the
    lexicographically LATER file wins (total line order), regardless of
    partition enumeration."""
    row_a = "\t".join(["x", "x", "Kyiv", "d:100-103", "fb:A", "GPE", "NAM", "x", "K", "LOC", "wk:A"])
    row_b = "\t".join(["x", "x", "Kyiv", "d:100-103", "fb:B", "GPE", "NAM", "x", "K", "LOC", "wk:B"])
    (tmp_path / "a.tab").write_text(row_a + "\n")
    (tmp_path / "b.tab").write_text(row_b + "\n")
    edl = read_edl_tab(spark, str(tmp_path))
    mentions = spark.createDataFrame(
        [("d", "m1", "NAM", "Kyiv", 100, 104, "Kyiv", 100, 104)],
        "url string, mid string, category string, mention string, "
        "char_begin int, char_end int, headword string, head_begin int, head_end int",
    )
    out = merge_edl(mentions, edl).collect()
    assert len(out) == 1 and out[0]["fb_id"] == "fb:B"


def test_nam_nom_dedup_df(spark):
    nam = spark.createDataFrame(
        [("d", 0, "rebels"), ("d", 5, "kyiv"), ("d", 9, "tank")],
        "url string, char_begin int, mention string",
    )
    nom = spark.createDataFrame(
        [
            ("d", 0, "rebels", "Combatant"),   # pair, subtype known -> NOM wins
            ("d", 5, "kyiv", "n/a"),           # pair, subtype n/a  -> NAM wins
            ("d", 30, "city", "UrbanArea"),    # unpaired NOM survives
        ],
        "url string, char_begin int, mention string, subtype string",
    )
    out = {
        (r["category"], r["mention"]): r
        for r in nam_nom_dedup_df(nam, nom).collect()
    }
    assert set(out) == {
        ("NOM", "rebels"), ("NAM", "kyiv"), ("NAM", "tank"), ("NOM", "city")
    }


def test_normalize_types_df_equals_python(spark):
    """Exhaustive grid: the columnar X5 must agree with the reference-exact
    Python scan (main.py:155-180 semantics) on every branch combination."""
    etypes = ["GPE", "PER", "ORG", "LOC", "FAC", "VEH", "WEA", "n/a",
              "numerical", "url", "time", "title", "ldcOnt:GPE.UrbanArea.City"]
    subtypes = ["UrbanArea", "Politician", "Government", "MissileSystem",
                "Gun", "n/a", "na", ""]
    ssts = ["City", "Sniper", "Missile", "n/a", ""]
    grid = list(itertools.product(etypes, subtypes, ssts))
    df = spark.createDataFrame(grid, "etype string, subtype string, subsubtype string")
    got = {
        (r["etype"], r["subtype"], r["subsubtype"]): r["ont"]
        for r in normalize_types_df(df, list(LDC_ENTITY_TYPES)).collect()
    }
    for t, s, ss in grid:
        expected = normalize_ldc_type(t, s, ss, list(LDC_ENTITY_TYPES))
        assert got[(t, s, ss)] == expected, (t, s, ss, got[(t, s, ss)], expected)
