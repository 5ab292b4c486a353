"""Reference-compatible per-document JSON (SNK1, main.py:281-286).

The reference dumps one JSON file per doc: a list of per-sentence records
``{docID, inputSentence, offset, namedMentions[], nominalMentions[],
fillerMentions[]}`` with ``indent=1, sort_keys=True``.  We reconstruct that
shape from the mentions table so golden comparisons against reference-style
output remain possible.  The writer is a DataFrame -> (url, json string)
projection; persisting to one-file-per-doc is a test-harness concern.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CAT_FIELD = {"NAM": "namedMentions", "NOM": "nominalMentions", "FIL": "fillerMentions"}


def _mention_obj(r) -> dict:
    return {
        "@id": r["mid"],
        "mention": r["mention"],
        "category": r["category"],
        "type": r["type"],
        "char_begin": int(r["char_begin"]),
        "char_end": int(r["char_end"]),
        "head_span": [int(r["head_begin"]), int(r["head_end"])],
        "headword": r["headword"],
        "score": str(r["score"]),  # the reference stores scores as strings (ner.py:344)
    }


def mentions_to_doc_json(mentions: DataFrame) -> DataFrame:
    """mentions -> (url, doc_json string), reference JSON shape with
    indent=1 + sort_keys=True byte conventions (main.py:286)."""

    def to_json(key, pdf):
        url = key[0]
        sents = {}
        for _, r in pdf.iterrows():
            rec = sents.setdefault(
                int(r["sid"]),
                {
                    "docID": url,
                    "inputSentence": r["sent_text"],
                    "offset": int(r["char_begin"]) - 0,
                    "namedMentions": [],
                    "nominalMentions": [],
                    "fillerMentions": [],
                },
            )
            rec[_CAT_FIELD[r["category"]]].append(_mention_obj(r))
        out = [sents[k] for k in sorted(sents)]
        for rec in out:
            for f in _CAT_FIELD.values():
                rec[f].sort(key=lambda m: (m["char_begin"], m["@id"]))
        import pandas as pd

        return pd.DataFrame({"url": [url], "doc_json": [json.dumps(out, indent=1, sort_keys=True)]})

    return (
        mentions.groupBy("url")
        .applyInPandas(to_json, schema="url string, doc_json string")
    )


def write_mention_json_dir(mentions: DataFrame, out_dir: str) -> None:
    """SNK1 as a distributed file sink: one ``{url}.json`` per document
    (the reference writes ``out_fname = file + '.json'``, main.py:284-288),
    written inside ``foreachPartition`` so the driver never holds a doc's
    JSON.  Paths go through sources.fs (scheme-dispatched): the default is
    the executor-visible shared FS the reference assumes; an object-store
    deployment registers its scheme once and this sink works unchanged."""
    from .fs import get_filesystem

    fs = get_filesystem(out_dir)  # resolved on the driver, pickled into the closure
    fs.makedirs(out_dir)
    doc_json = mentions_to_doc_json(mentions)

    def write_partition(rows):
        import re as _re

        for row in rows:
            safe = _re.sub(r"[^A-Za-z0-9._-]", "_", row["url"])
            with fs.open(fs.join(out_dir, safe + ".json"), "w", encoding="utf-8") as f:
                f.write(row["doc_json"])

    doc_json.foreachPartition(write_partition)
