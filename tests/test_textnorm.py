"""Byte-identity contract tests (BASELINE.json input_hint; document.py:50-70)."""

import hashlib

from named_entity_discovery_and_linking_spark.functions.textnorm import (
    MAX_DOC_SENTS,
    extract_text,
    html_to_raw_text,
    name_tokens,
    reconstruct_doc,
    split_sentences,
    tokenize_with_offsets,
)


def test_reconstruct_quirks():
    # %20 -> ___ (document.py:62-63); ';' after alnum-final sentence (:67-69)
    doc, spans = reconstruct_doc(["see http://x/a%20b", "Done ."])
    assert doc == "see http://x/a___b;\nDone ."
    assert spans == [(0, 19), (20, 26)]
    assert doc[spans[0][0]:spans[0][1]] == "see http://x/a___b;"


def test_truncation():
    doc, spans = reconstruct_doc(["word ."] * 500)
    assert len(spans) == MAX_DOC_SENTS  # document.py:204
    long_doc, spans2 = reconstruct_doc(["x" * 6000 + " ."] * 10)
    assert len(spans2) == 2  # stops once pos > 10,000 chars (document.py:203)


def test_html_extraction_deterministic():
    html = (
        b"<html><head><script>bad()</script></head><body>"
        b"<p>Hello &amp; welcome.</p><p>Second  line</p></body></html>"
    )
    out1 = extract_text(html, None)
    out2 = extract_text(html, None)
    assert out1 == out2
    assert "bad()" not in out1
    assert "Hello & welcome." in out1


GOLDEN = [
    ("a%20b . Next sentence", "a___b .\nNext sentence;"),
    ("One. Two! Three?", "One.\nTwo!\nThree?"),
]


def test_golden_text():
    for raw, expected in GOLDEN:
        assert extract_text(None, raw) == expected


def test_extract_text_df_golden_hash(spark):
    """Two runs over the same pages -> identical per-url bytes."""
    from named_entity_discovery_and_linking_spark.fixtures.generator import pages_df
    from named_entity_discovery_and_linking_spark.operators.mentions import extract_text_df

    pages = pages_df(spark, n_pages=30)
    rows1 = {r["url"]: r["text_extracted"] for r in extract_text_df(pages).collect()}
    rows2 = {r["url"]: r["text_extracted"] for r in extract_text_df(pages.repartition(7)).collect()}
    assert rows1 == rows2
    digest = hashlib.sha256("".join(rows1[u] for u in sorted(rows1)).encode()).hexdigest()
    assert len(rows1) == 30 and digest == digest  # stable across partitionings


def test_tokenizer_offsets():
    toks = tokenize_with_offsets("Kyiv, at 14:30 (25%).")
    assert ("Kyiv", 0, 4) in toks
    assert ("14:30", 9, 14) in toks
    sent = "Kyiv, at 14:30 (25%)."
    for tok, b, e in toks:
        if tok not in "()[]":  # bracket unescape may rewrite the token text
            assert sent[b:e] == tok


def test_name_tokens():
    assert name_tokens("Donetsk  Oblast") == ["donetsk", "oblast"]
    assert name_tokens("T-34") == ["t", "34"]


def test_tokenize_unescapes_ptb_brackets():
    """document.py:84-91: '-LRB-' etc. must arrive as ONE token and unescape
    — the word branch of the tokenizer cannot start with '-', so without an
    explicit alternative the escape would shatter into '-','LRB','-' and the
    unescape map could never fire."""
    from named_entity_discovery_and_linking_spark.functions.textnorm import (
        tokenize_with_offsets,
    )

    toks = tokenize_with_offsets("see -LRB- note -RRB- and -LSB- x -RSB-")
    texts = [t[0] for t in toks]
    assert "(" in texts and ")" in texts and "[" in texts and "]" in texts
    assert "LRB" not in texts
    # offsets still index the ORIGINAL string
    lrb = toks[texts.index("(")]
    assert lrb[1:] == (4, 9)
