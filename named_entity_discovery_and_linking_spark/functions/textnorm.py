"""HTML -> text extraction, sentence split, tokenization.

This module is the **byte-identity contract** of the pipeline
(BASELINE.json input_hint: "byte-identical extracted text per url").  The
reference reconstructs a document string from LTF token offsets with several
quirks (reference ``code_ner_bert/document.py:50-70``):

  - leading padding before the first sentence,
  - ``%20`` -> ``___`` inside each sentence,
  - a ``;`` appended after any sentence whose last char is alphanumeric,
  - newline padding in inter-sentence gaps,
  - truncation at 10,000 chars or 200 sentences (``document.py:203-204``).

Our input is (html binary | text string), not LTF, so the exact byte-level
behavior below is OUR frozen spec: pure functions of the input bytes, locked
by golden fixtures in tests.  They are called only from Arrow-batched pandas
UDFs (see operators/mentions.py) — never per-row Python UDFs.

Offsets: the reference stores 1-based inclusive offsets in Word/Sentence
(``document.py:9-24``) and converts to 0-based begin / exclusive end in
mention dicts (``ner.py:335-336``).  We use 0-based begin / exclusive end
everywhere.
"""

from __future__ import annotations

import html as _htmllib
import re

MAX_DOC_CHARS = 10_000  # document.py:203
MAX_DOC_SENTS = 200  # document.py:204

_SCRIPT_RE = re.compile(r"(?is)<(script|style|noscript)\b.*?</\1>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_BLOCK_TAG_RE = re.compile(
    r"(?i)</?(p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|section|article|header|footer|blockquote|pre|title)\b[^>]*>"
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")
# token = word chars (incl. unicode letters, digits, '-', '.', ''' inside) or single punct
_TOKEN_RE = re.compile(
    # PTB bracket escapes FIRST: the word branch cannot start with '-', so
    # without the explicit alternative '-LRB-' would tokenize as '-','LRB','-'
    # and the unescape map in tokenize_with_offsets could never fire
    r"-L[RS]B-|-R[RS]B-|"
    r"\d{1,2}:\d{2}(?::\d{2})?|[^\W_]+(?:['\-.][^\W_]+)*|[^\w\s]", re.UNICODE
)


def html_to_raw_text(html_bytes: bytes | None) -> str:
    """Deterministic HTML -> raw text: strip script/style/comments, block tags
    become newlines, inline tags become spaces, entities unescaped, horizontal
    whitespace collapsed.  Pure function of the bytes."""
    if not html_bytes:
        return ""
    s = html_bytes.decode("utf-8", errors="replace")
    s = _SCRIPT_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _htmllib.unescape(s)
    s = _WS_RE.sub(" ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def split_sentences(raw: str) -> list[str]:
    """Deterministic sentence split: newline is always a boundary, then
    split after [.!?]+whitespace.  Empty sentences dropped."""
    out: list[str] = []
    for line in raw.split("\n"):
        line = line.strip()
        if not line:
            continue
        for sent in _SENT_SPLIT_RE.split(line):
            sent = sent.strip()
            if sent:
                out.append(sent)
    return out


def reconstruct_doc(sents: list[str]) -> tuple[str, list[tuple[int, int]]]:
    """Rebuild the canonical document string from sentences, with the
    reference's reconstruction quirks (document.py:50-70) and truncation
    (document.py:203-204).  Returns (doc, [(begin, end) per kept sentence])
    with 0-based begin / exclusive end offsets into doc.

    Quirks kept from the reference:
      - ``%20`` -> ``___`` per sentence (document.py:62-63)
      - trailing ``;`` after alnum-final sentences (document.py:67-69)
      - single ``\\n`` between sentences (gap padding collapsed to 1)
    """
    parts: list[str] = []
    spans: list[tuple[int, int]] = []
    pos = 0
    for i, sent in enumerate(sents):
        if i >= MAX_DOC_SENTS or pos > MAX_DOC_CHARS:
            break
        s = sent.replace("%20", "___")
        if s and s[-1].isalnum():
            s = s + ";"
        if i > 0:
            parts.append("\n")
            pos += 1
        begin = pos
        parts.append(s)
        pos += len(s)
        spans.append((begin, pos))
    return "".join(parts), spans


def extract_text(html_bytes: bytes | None, text: str | None) -> str:
    """The per-url byte-identity surface: prefer the pre-extracted ``text``
    column, else extract from ``html``; normalize through reconstruct_doc."""
    raw = text if text else html_to_raw_text(html_bytes)
    doc, _ = reconstruct_doc(split_sentences(raw))
    return doc


def tokenize_with_offsets(sent: str) -> list[tuple[str, int, int]]:
    """Deterministic tokenizer: (token, begin, end) with 0-based begin /
    exclusive end offsets into ``sent``.  Also unescapes PTB bracket escapes
    the way the reference does (document.py:84-91)."""
    out = []
    for m in _TOKEN_RE.finditer(sent):
        tok = m.group(0)
        tok = {
            "-LRB-": "(",
            "-RRB-": ")",
            "-LSB-": "[",
            "-RSB-": "]",
        }.get(tok, tok)
        out.append((tok, m.start(), m.end()))
    return out


def normalize_name(name: str) -> str:
    """Lowercase + collapse whitespace: the join key for candidate generation
    (reference lowers mention text at linking.py:310 and Lucene's
    StandardAnalyzer lowercases index terms)."""
    return " ".join(name.lower().split())


def name_tokens(name: str) -> list[str]:
    """Alphanumeric tokens of a normalized name (StandardAnalyzer-like:
    punctuation splits, lowercase, no stemming)."""
    return re.findall(r"[^\W_]+", name.lower(), re.UNICODE)
