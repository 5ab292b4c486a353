"""SRC1 LTF XML ingestion: reconstruction quirks byte-for-byte
(document.py:50-70, 178-205)."""

import os

import pytest

from named_entity_discovery_and_linking_spark.sources.ltf_xml import (
    ltf_dir_to_pages,
    read_ltf,
)


def _ltf(lang, segs):
    seg_xml = []
    for begin, end, tokens in segs:
        toks = "".join(
            f'<TOKEN start_char="{b}" end_char="{e}">{t}</TOKEN>'
            for t, b, e in tokens
        )
        seg_xml.append(
            f'<SEG start_char="{begin}" end_char="{end}">'
            f"<ORIGINAL_TEXT>x</ORIGINAL_TEXT>{toks}</SEG>"
        )
    return (
        f'<LCTL_TEXT lang="{lang}"><DOC lang="{lang}"><TEXT>'
        + "".join(seg_xml)
        + "</TEXT></DOC></LCTL_TEXT>"
    )


def test_read_ltf_reconstruction_quirks(tmp_path):
    # sentence 1 at begin=3 (1-based): 2 leading dots + begin char;
    # doc = '.'*begin per document.py:51 -> 3 dots, then offset=begin-1
    p = tmp_path / "a.ltf.xml"
    p.write_text(_ltf("eng", [
        # words with an intra-sentence gap: 'ab' [3-4], 'cd%20' [7-11]
        (3, 11, [("ab", 3, 4), ("cd%20", 7, 11)]),
        # next sentence with a 2-char gap after the ';' -> newlines
        (15, 16, [("ef", 15, 16)]),
    ]))
    doc, lang = read_ltf(str(p))
    assert lang == "eng"
    # '...' + 'ab' + 2 gap spaces + 'cd___' (%20 rewritten, alnum-final
    # because '___'... not alnum -> no ';'), then gap newlines, 'ef', ';'
    assert doc.startswith("...ab  cd___")
    assert doc.endswith("ef;")
    assert "\n" in doc


def test_read_ltf_alnum_semicolon_and_rewind(tmp_path):
    p = tmp_path / "b.ltf.xml"
    p.write_text(_ltf("eng", [
        (1, 2, [("ab", 1, 2)]),          # alnum-final -> ';', offset -> 3
        (3, 4, [("cd", 3, 4)]),          # begin 3 <= offset 3 -> REWIND the ';'
    ]))
    doc, _ = read_ltf(str(p))
    # one leading dot ('.' * begin with 1-based begin=1, document.py:51);
    # the overlap rewind ate the first sentence's ';'
    assert doc == ".abcd;"


def test_read_ltf_non_eng_and_truncation(tmp_path):
    p = tmp_path / "c.ltf.xml"
    p.write_text(_ltf("rus", [(1, 2, [("ab", 1, 2)])]))
    doc, lang = read_ltf(str(p))
    assert doc is None and lang == "rus"
    # truncation: a token ending past 10000 stops ingestion AFTER its sentence
    p2 = tmp_path / "d.ltf.xml"
    p2.write_text(_ltf("eng", [
        (1, 2, [("ab", 1, 2)]),
        (10000, 10005, [("deep", 10000, 10005)]),
        (10010, 10012, [("gone", 10010, 10012)]),
    ]))
    doc, _ = read_ltf(str(p2))
    assert "deep" in doc and "gone" not in doc


def test_ltf_dir_to_pages_feeds_pipeline(spark, tmp_path):
    d = tmp_path / "ltf"
    d.mkdir()
    (d / "doc1.ltf.xml").write_text(_ltf("eng", [
        (1, 24, [("Viktor", 1, 6), ("Marchenko", 8, 16), ("visited", 18, 24)]),
        (26, 30, [("Kyiv", 26, 29), (".", 30, 30)]),
    ]))
    (d / "doc2.ltf.xml").write_text(_ltf("rus", [(1, 2, [("ab", 1, 2)])]))
    (d / "notltf.txt").write_text("ignored")
    pages = ltf_dir_to_pages(spark, str(d))
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {"doc1.ltf.xml", "doc2.ltf.xml"}
    assert rows["doc2.ltf.xml"]["lang"] == "rus" and rows["doc2.ltf.xml"]["text"] is None
    from named_entity_discovery_and_linking_spark.operators.mentions import discover_mentions

    m = discover_mentions(pages)
    nams = {r["mention"] for r in m.collect() if r["category"] == "NAM"}
    assert "Viktor Marchenko" in nams and "Kyiv" in nams


def test_ltf_dir_skips_malformed_files(spark, tmp_path):
    """One corrupt LTF file must not abort the job: the reference's
    per-document try/except skips it (main.py:66-72); good files still
    parse.  Empty-text TOKENs count as malformed (they would corrupt the
    overlap-rewind reconstruction; the reference crashes-and-skips)."""
    good = tmp_path / "good.ltf.xml"
    good.write_text(
        '<?xml version="1.0"?><LCTL_TEXT lang="eng"><DOC id="d"><TEXT>'
        '<SEG id="s1" start_char="0" end_char="10">'
        '<ORIGINAL_TEXT>hello world</ORIGINAL_TEXT>'
        '<TOKEN id="t1" start_char="0" end_char="4">hello</TOKEN>'
        '<TOKEN id="t2" start_char="6" end_char="10">world</TOKEN>'
        "</SEG></TEXT></DOC></LCTL_TEXT>"
    )
    (tmp_path / "trunc.ltf.xml").write_text("<?xml version='1.0'?><LCTL_TEXT lang=")
    empty_tok = tmp_path / "emptytok.ltf.xml"
    empty_tok.write_text(
        '<?xml version="1.0"?><LCTL_TEXT lang="eng"><DOC id="d2"><TEXT>'
        '<SEG id="s1" start_char="0" end_char="9">'
        '<TOKEN id="t1" start_char="0" end_char="4"/>'
        '<TOKEN id="t2" start_char="6" end_char="9">tail</TOKEN>'
        "</SEG></TEXT></DOC></LCTL_TEXT>"
    )
    from named_entity_discovery_and_linking_spark.sources.ltf_xml import ltf_dir_to_pages

    rows = {r["url"]: r for r in ltf_dir_to_pages(spark, str(tmp_path)).collect()}
    assert set(rows) == {"good.ltf.xml"}
    assert rows["good.ltf.xml"]["text"] == "hello world;"
