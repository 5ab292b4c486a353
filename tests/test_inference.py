"""M2/M3 drop-in proof: discover_mentions_batched with a deterministic
fake-weights model reproduces discover_mentions EXACTLY (same schema, same
rows) while batching >1 sentence per forward call — the reference runs
batch_size=1 (run_ner.py:119)."""

import pandas as pd

from named_entity_discovery_and_linking_spark.fixtures.generator import make_pages, pages_df
from named_entity_discovery_and_linking_spark.operators.inference import (
    FakeBioModel,
    bio_to_spans,
    discover_mentions_batched,
    tag_pages_pandas,
)
from named_entity_discovery_and_linking_spark.operators.mentions import (
    TaggerConfig,
    discover_mentions,
)


def test_bio_to_spans_floor_and_runs():
    labels = ["B-GPE", "I-GPE", "O", "B-PER", "B-PER", "I-PER"]
    probs = [0.91, 0.2, 0.0, 0.3, 0.88, 0.1]
    spans = bio_to_spans(labels, probs, len(labels))
    # B-prob wins (I probs ignored), floored at 0.6; adjacent B starts anew
    assert spans == [(0, 2, "GPE", None, 0.91), (3, 4, "PER", None, 0.6),
                     (4, 6, "PER", None, 0.88)]
    # orphan I- tags (model noise) never start a span
    assert bio_to_spans(["I-PER", "O"], [0.9, 0.0], 2) == []


def test_batched_adapter_batches_sentences():
    """>1 sentence per forward call on a multi-doc Arrow batch."""
    cfg = TaggerConfig.default()
    model = FakeBioModel(cfg)
    rows = [
        {"url": p["url"], "html": p["html"], "text": p["text"]}
        for p in make_pages(n_pages=12) if p["lang"] == "eng"
    ]
    pdf = pd.DataFrame(rows)
    out = tag_pages_pandas(pdf, model, cfg, sentence_batch=16)
    assert len(out) > 0
    assert len(model.batch_sizes) >= 2  # multiple forward calls...
    assert max(model.batch_sizes) > 1   # ...each carrying many sentences
    total_sents = sum(model.batch_sizes)
    assert total_sents > len(pdf)  # batched ACROSS documents


def test_model_adapter_is_exact_drop_in(spark):
    """Swapping the rule stub for the batched model adapter changes NOTHING:
    identical mention rows, identical schema."""
    cfg = TaggerConfig.default()
    pages = pages_df(spark, n_pages=30)
    stub = discover_mentions(pages, cfg)
    batched = discover_mentions_batched(pages, lambda: FakeBioModel(cfg), cfg,
                                        sentence_batch=32)
    assert stub.schema == batched.schema
    a = sorted(map(tuple, stub.collect()))
    b = sorted(map(tuple, batched.collect()))
    assert a == b
