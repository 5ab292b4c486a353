"""Damerau-Levenshtein (full, with adjacent transpositions) edit distance.

Lucene's FuzzyQuery — the reference's effective fuzzy matcher
(linking.py:141-148) — builds its automata WITH transpositions: 'from'~1
matches 'form' (one transposition), which classic levenshtein scores 2.
Spark ships only classic ``levenshtein``, so verifying the SymSpell variant
join with it silently rejected every transposed pair the reference links.

This module provides the FULL DL distance (matching DuckDB's
``damerau_levenshtein``, which the oracles use — pinned against it by
test_properties) as an Arrow-batched pandas UDF.  Python in the fuzzy path
is acceptable here: the UDF runs AFTER the deletion-variant equi-join has
pruned candidates to near-matches, i.e. on O(retrieved pairs), not
|q_tokens| x |alias_tokens| — and tokens are short strings, so the O(|a||b|)
DP is a few dozen cells.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F


def dl_distance(a: str, b: str) -> int:
    """Full Damerau-Levenshtein (the 'distance with adjacent transpositions'
    DP, alphabet-dictionary form — NOT the restricted/OSA variant: e.g.
    dl('CA','ABC') == 2 via transpose+insert, where OSA gives 3)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxdist = la + lb
    da: dict[str, int] = {}
    d = [[0] * (lb + 2) for _ in range(la + 2)]
    d[0][0] = maxdist
    for i in range(la + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            m = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,          # substitution / match
                d[i + 1][j] + 1,         # insertion
                d[i][j + 1] + 1,         # deletion
                d[k][m] + (i - k - 1) + 1 + (j - m - 1),  # transposition
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _dl_batch(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [dl_distance(x or "", y or "") for x, y in zip(a, b)], dtype="int32"
    )


_UDF = None


def dl_distance_udf(a, b):
    """Column-level DL distance.  The pandas_udf object is created LAZILY on
    first use: registering it at import time needs an active SparkContext,
    and this module is re-imported inside executor Python workers (the
    shipped-package zip) where none exists."""
    global _UDF
    if _UDF is None:
        _UDF = F.pandas_udf(_dl_batch, "int")
    return _UDF(a, b)
