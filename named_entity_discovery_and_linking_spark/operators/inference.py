"""M2/M3 batched-inference adapter: a real token-classification model drops
into the mention-discovery plan WITHOUT changing it.

The reference runs BERT NER one sentence per forward pass
(pytorch-pretrained-bert/examples/run_ner.py:119 — ``DataLoader(...,
batch_size=1)`` called per sentence from ner.py:283) — its defining
performance sin.  This adapter batches sentences ACROSS documents inside a
``mapInPandas`` partition: every Arrow batch of pages is sentence-split
first, then the model sees chunks of ``sentence_batch`` sentences per
forward call, and the outputs feed the exact same post-pipeline
(_assemble_rows: F2/F5/W1/J6/X5 + id minting) as the rule stub.

Model contract (word-level, the shape a HF ``BertForTokenClassification``
wrapper produces after wordpiece re-alignment, run_ner.py:126-149):

    model = model_factory()          # once per partition; cache weights in
                                     # the factory for executor reuse
    out = model.predict(batch)       # batch: list[list[str]] word tokens
    # out: list of (labels, probs) — labels: list[str] BIO ('B-GPE', 'I-GPE',
    # 'O', ... 17-label scheme, run_ner.py:178-181), probs: list[float]

BIO span assembly reproduces ner.py:326-344: a span starts at 'B-*', extends
over 'I-*', its score is the B token's prob floored at 0.6 (ner.py:327-329),
and the J4 gazetteer override (ner.py:349-364) re-types spans found in the
gazetteer.  test_inference proves the drop-in: a deterministic fake-weights
model produces EXACTLY discover_mentions' output with >1 sentence per
forward call.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .mentions import (
    MENTION_SCHEMA,
    TaggerConfig,
    _assemble_rows,
    _COLS,
    _extract_named,
    _sentence_units,
)

PROB_FLOOR = 0.6  # ner.py:327-329
DEFAULT_SENTENCE_BATCH = 64


def bio_to_spans(labels: list, probs: list, n_tokens: int) -> list:
    """W7 (ner.py:326-337): scan B/I tags into (i, j, coarse_type, None,
    score) spans; score = B-token prob floored at PROB_FLOOR."""
    spans = []
    i = 0
    n = min(n_tokens, len(labels))
    while i < n:
        lab = labels[i]
        if lab.startswith("B-"):
            score = max(float(probs[i]), PROB_FLOOR)
            ctype = lab[2:]
            j = i + 1
            while j < n and labels[j].startswith("I-"):
                j += 1
            spans.append((i, j, ctype, None, score))
            i = j
        else:
            i += 1
    return spans


def _apply_gazetteer_override(spans: list, lows: list, cfg: TaggerConfig) -> list:
    """J4 (ner.py:349-364 via gazetteer.py:76-99): a model span whose surface
    is a gazetteer phrase takes the gazetteer's (coarse, fine) typing."""
    out = []
    for i, j, ctype, fine, score in spans:
        hit = cfg.gaz_phrases.get(tuple(lows[i:j]))
        if hit is not None:
            ctype, fine = hit
        out.append((i, j, ctype, fine, score))
    return out


def tag_pages_pandas(
    pdf: pd.DataFrame,
    model,
    cfg: TaggerConfig,
    sentence_batch: int = DEFAULT_SENTENCE_BATCH,
) -> pd.DataFrame:
    """The per-Arrow-batch core of discover_mentions_batched, exposed so
    tests can drive it directly and inspect the model's forward-call sizes.

    1) sentence prep for the whole batch (cross-document), 2) forward passes
    of ``sentence_batch`` sentences each, 3) BIO decode + J4 override +
    shared assembly."""
    units = []  # (url, sid, sent, s_begin, tokens, lows, coarse)
    for url, html, text in zip(pdf["url"], pdf["html"], pdf["text"]):
        for u in _sentence_units(url, html, text, cfg):
            units.append((url, *u))
    preds = []
    for k in range(0, len(units), sentence_batch):
        chunk = units[k:k + sentence_batch]
        out = model.predict([[t[0] for t in u[4]] for u in chunk])
        if len(out) != len(chunk):
            # zip() would silently TRUNCATE, dropping the tail sentences of
            # every Arrow batch with no error — fail loudly instead
            raise ValueError(
                f"model.predict returned {len(out)} results for a batch of "
                f"{len(chunk)} sentences — the adapter contract is one "
                "(labels, probs) pair per input sentence"
            )
        preds.extend(out)
    rows = []
    for (url, sid, sent, s_begin, tokens, lows, coarse), (labels, probs) in zip(
        units, preds
    ):
        spans = bio_to_spans(labels, probs, len(tokens))
        named = _apply_gazetteer_override(spans, lows, cfg)
        claimed = [c != "O" for c in coarse]
        for i, j, *_rest in named:
            for k2 in range(i, j):
                claimed[k2] = True
        rows.extend(
            _assemble_rows(url, sid, sent, s_begin, tokens, lows, coarse,
                           named, claimed, cfg)
        )
    return pd.DataFrame(rows, columns=_COLS)


def discover_mentions_batched(
    pages: DataFrame,
    model_factory: Callable[[], object],
    cfg: TaggerConfig | None = None,
    sentence_batch: int = DEFAULT_SENTENCE_BATCH,
) -> DataFrame:
    """pages -> mentions via a BATCHED token-classification model.

    Same plan shape as discover_mentions (one mapInPandas after the pushed
    lang filter, zero shuffles); only the NAM source changes.  The model is
    constructed once per partition via ``model_factory`` (put weight loading
    there — executors cache the Python worker, so repeated batches reuse it).
    """
    cfg = cfg or TaggerConfig.default()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = model_factory()
        for pdf in batches:
            yield tag_pages_pandas(pdf, model, cfg, sentence_batch)

    return (
        pages.filter(F.col("lang") == "eng")  # F1
        .select("url", "html", "text")
        .mapInPandas(run, schema=MENTION_SCHEMA)
    )


class FakeBioModel:
    """Deterministic fake-weights model for tests: emits the BIO labels the
    rule/gazetteer stub implies, so discover_mentions_batched must reproduce
    discover_mentions EXACTLY.  Also records forward-call batch sizes so the
    >1-sentence-per-call property is assertable (vs the reference's
    batch_size=1, run_ner.py:119)."""

    def __init__(self, cfg: TaggerConfig):
        self.cfg = cfg
        self.batch_sizes: list[int] = []

    def predict(self, batch: list) -> list:
        from .mentions import _coarse_tags

        self.batch_sizes.append(len(batch))
        out = []
        for words in batch:
            tokens = [(w, 0, 0) for w in words]
            lows = [w.lower() for w in words]
            coarse = _coarse_tags(tokens)
            named, _claimed = _extract_named(tokens, coarse, self.cfg, lows)
            labels = ["O"] * len(words)
            probs = [0.0] * len(words)
            for i, j, ctype, _fine, score in named:
                labels[i] = f"B-{ctype}"
                probs[i] = score
                for k in range(i + 1, j):
                    labels[k] = f"I-{ctype}"
                    probs[k] = score
            out.append((labels, probs))
        return out
