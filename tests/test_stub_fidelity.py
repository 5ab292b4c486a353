"""Measured fidelity gap of the deterministic M2-stub tagger.

DEVIATIONS #2 replaces the GPU BERT NER with rule/gazetteer taggers so the
pipeline is reproducible without model weights.  This test quantifies what
that costs on REAL text: run the stub (with the reference's actual
gazetteer directory and LDC ontology) over the sentences of the
reference's own NER dev document (ner-gold.conll) and score with the
conll03eval-parity scorer.

Reference BERT on the same document: P 71.23 / R 70.27 / F1 70.75
(ner_score.txt; elisa_2 run: F1 73.53).  The stub lands far below — that
is EXPECTED and pinned exactly so any tagger change surfaces here; the
batched-model adapter (operators/inference.py) is the drop-in point for
closing the gap with real weights.
"""

import os

import pytest

from named_entity_discovery_and_linking_spark.operators.mentions import _analyze_doc
from named_entity_discovery_and_linking_spark.sources.conll import conll_f1

REF = "/root/reference/code_ner_bert"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF), reason="reference checkout absent")


def _gold_sentences():
    sents, words, tags = [], [], []
    for line in open(os.path.join(REF, "ner-gold.conll")):
        parts = line.split()
        if not parts:
            if words:
                sents.append((words, tags))
                words, tags = [], []
            continue
        if parts[0] == "1" and words:
            sents.append((words, tags))
            words, tags = [], []
        words.append(parts[1])
        tags.append(parts[-1])
    if words:
        sents.append((words, tags))
    return sents


@needs_ref
def test_stub_tagger_f1_on_reference_dev_doc():
    from named_entity_discovery_and_linking_spark.sources.gazetteers import (
        tagger_config_from_gazetteer_dir,
    )
    from named_entity_discovery_and_linking_spark.sources.ontology import (
        tagger_config_from_ldc,
    )

    cfg = tagger_config_from_ldc(
        os.path.join(REF, "LDCOntology_v0.1.jsonld"),
        base=tagger_config_from_gazetteer_dir(os.path.join(REF, "gazetteer")),
    )
    sents = _gold_sentences()
    assert sum(len(w) for w, _ in sents) == 795  # the score files' token count

    rows = []
    for si, (ws, gold) in enumerate(sents):
        text = " ".join(ws)
        out = _analyze_doc(f"d{si}", None, text, cfg)
        starts, pos = {}, 0
        for ti, w in enumerate(ws):
            starts[pos] = ti
            pos += len(w) + 1
        pred = ["O"] * len(ws)
        for r in out:
            if r[3] != "NAM":
                continue
            coarse = r[5].split(":")[1].split(".")[0] if ":" in r[5] else r[5]
            ti = starts.get(r[9])  # char_begin -> token index
            if ti is None:
                continue
            for k in range(len(r[4].split())):
                if ti + k < len(ws):
                    pred[ti + k] = ("B-" if k == 0 else "I-") + coarse
        rows.extend((si, g, p) for g, p in zip(gold, pred))

    s = conll_f1(rows)
    # pinned EXACTLY (the stub is deterministic); reference BERT: F1 70.75.
    # Re-measured after the round-4 tagger parity fixes (raw-case stopword
    # survival, verbatim is_url char set, unconditional country fine-type)
    # which emit more NAM phrases on this doc: 109 found vs the prior 100.
    assert round(s["precision"] * 100, 2) == 17.43
    assert round(s["recall"] * 100, 2) == 25.68
    assert round(s["f1"] * 100, 2) == 20.77
    assert (s["gold_phrases"], s["found_phrases"]) == (74, 109)
