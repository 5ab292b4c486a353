"""Property-based tests (hypothesis) for the pure contract functions.

The reference has no property tests (SURVEY.md §5); these pin the invariants
that the distributed pipeline depends on: determinism, offset consistency,
truncation bounds, overlap-resolution postconditions, hash portability.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from named_entity_discovery_and_linking_spark.functions.textnorm import (
    MAX_DOC_SENTS,
    extract_text,
    name_tokens,
    reconstruct_doc,
    split_sentences,
    tokenize_with_offsets,
)
from named_entity_discovery_and_linking_spark.operators.mentions import (
    is_url,
    resolve_filler_overlaps,
)

printable_text = st.text(
    alphabet=string.ascii_letters + string.digits + " .,!?%:/-\n", max_size=400
)


@given(printable_text)
@settings(max_examples=200, deadline=None)
def test_extract_text_deterministic_and_idempotent_shape(s):
    a = extract_text(None, s)
    b = extract_text(None, s)
    assert a == b
    # re-extracting the extracted text never grows the document
    assert len(extract_text(None, a)) <= len(a) + a.count("\n") + a.count(";") + 8


@given(st.lists(st.text(alphabet=string.ascii_letters + " %20.", min_size=1, max_size=30), max_size=250))
@settings(max_examples=100, deadline=None)
def test_reconstruct_spans_consistent(sents):
    doc, spans = reconstruct_doc(sents)
    assert len(spans) <= MAX_DOC_SENTS
    for b, e in spans:
        assert 0 <= b <= e <= len(doc)
        assert "%20" not in doc[b:e]
    # spans are ordered and non-overlapping
    for (b1, e1), (b2, e2) in zip(spans, spans[1:]):
        assert e1 < b2


@given(st.text(alphabet=string.ascii_letters + string.digits + " .,()%:-", max_size=120))
@settings(max_examples=200, deadline=None)
def test_tokenizer_offsets_substring(s):
    for tok, b, e in tokenize_with_offsets(s):
        if tok not in "()[]":  # bracket unescape rewrites
            assert s[b:e] == tok
            assert b < e


@given(st.text(max_size=60))
@settings(max_examples=200, deadline=None)
def test_name_tokens_lowercase_alnum(s):
    for t in name_tokens(s):
        assert t == t.lower()
        assert t.isalnum()


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["14:30", "2014-07-17", "14:30 on 2014", "25%", "25", "x"]),
            st.integers(0, 50),
            st.integers(1, 20),
        ),
        max_size=12,
    )
)
@settings(max_examples=200, deadline=None)
def test_filler_overlap_resolution_postconditions(items):
    fils = [(t, b, b + l, "TIME") for t, b, l in items]
    out = resolve_filler_overlaps(fils)
    if fils:
        assert 1 <= len(out) <= len(fils)
        assert all(f in fils for f in out)
        # output is begin-sorted (the reference walks a begin-sorted list)
        begins = [f[1] for f in out]
        assert begins == sorted(begins)


@given(st.text(alphabet=string.printable, max_size=50))
@settings(max_examples=200, deadline=None)
def test_is_url_total(s):
    assert isinstance(is_url(s), bool)  # never raises on arbitrary tokens


@given(st.text(max_size=40))
@settings(max_examples=50, deadline=None)
def test_portable_hash_matches_duckdb(s):
    """The md5-derived 60-bit hash is engine-portable by construction;
    verify the Python reference of both formulas agree."""
    import hashlib

    hx = hashlib.md5(s.encode("utf-8")).hexdigest()[:15]
    spark_style = int(hx, 16)  # conv(substring(md5,1,15),16,10)
    duck_style = int("0x" + hx, 16)  # ('0x'||substring(md5,1,15))::BIGINT
    assert spark_style == duck_style < 2**60


# ------------------------------------------------- SymSpell deletion join

def _py_deletions(s: str, d: int) -> set:
    """Pure-Python mirror of linking.deletion_variants: all strings
    reachable by deleting up to d characters."""
    out = {s}
    frontier = {s}
    for _ in range(d):
        nxt = set()
        for t in frontier:
            for i in range(len(t)):
                nxt.add(t[:i] + t[i + 1:])
        out |= nxt
        frontier = nxt
    return out


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    st.text(alphabet="abcd", max_size=7),
    st.text(alphabet="abcd", max_size=7),
    st.integers(min_value=1, max_value=2),
)
@settings(max_examples=500, deadline=None)
def test_deletion_neighborhood_completeness(q, a, d):
    """The guarantee the equi-keyed fuzzy join rests on: lev(q, a) <= d
    implies q and a share a <=d-deletion variant — so the variant equi-join
    retrieves a SUPERSET of the true matches (the levenshtein post-filter
    then makes it exact).  Also: any shared variant bounds lev by 2d
    (soundness of the candidate set's blow-up)."""
    shared = _py_deletions(q, d) & _py_deletions(a, d)
    if _lev(q, a) <= d:
        assert shared, (q, a, d)
    if shared:
        assert _lev(q, a) <= 2 * d


def test_deletion_variants_sql_matches_python(spark):
    """The Spark SQL expression (nested transform/flatten) enumerates the
    same variant sets as the pure-Python reference enumeration."""
    from pyspark.sql import functions as F

    from named_entity_discovery_and_linking_spark.operators.linking import deletion_variants

    words = ["", "a", "ab", "kyiv", "kramatorsk", "donetsk", "x" * 12]
    df = spark.createDataFrame([(w, d) for w in words for d in (0, 1, 2)],
                               "w string, budget int")
    got = df.select("w", "budget", deletion_variants("w", "budget").alias("v")).collect()
    for r in got:
        assert set(r["v"]) == _py_deletions(r["w"], r["budget"]), (r["w"], r["budget"])


def _dl_cases():
    import random
    rng = random.Random(42)
    alpha = "abcde"
    out = []
    for _ in range(300):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 7)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 7)))
        out.append((a, b))
    return out


def test_dl_distance_matches_duckdb():
    """The Python full-DL implementation must agree with DuckDB's
    damerau_levenshtein — the oracle side of every fuzzy query — on random
    pairs AND the OSA-vs-full-DL discriminating case."""
    import duckdb

    from named_entity_discovery_and_linking_spark.functions.editdist import dl_distance

    con = duckdb.connect()
    assert dl_distance("CA", "ABC") == 2  # full DL (OSA would say 3)
    for a, b in _dl_cases() + [("from", "form"), ("CA", "ABC"), ("", "ab")]:
        want = con.sql(
            "select damerau_levenshtein(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert dl_distance(a, b) == want, (a, b)


def test_deletion_variant_guarantee_holds_for_damerau():
    """The SymSpell equi-join retrieves a SUPERSET of Damerau matches: every
    pair with dl <= d shares a string reachable by <= d deletions from each
    side (each DL edit — transpositions included — costs at most one
    deletion per side)."""
    from named_entity_discovery_and_linking_spark.functions.editdist import dl_distance

    def variants(s, d):
        out = {s}
        frontier = {s}
        for _ in range(d):
            nxt = set()
            for t in frontier:
                for i in range(len(t)):
                    nxt.add(t[:i] + t[i + 1:])
            out |= nxt
            frontier = nxt
        return out

    for a, b in _dl_cases():
        d = dl_distance(a, b)
        if d <= 2:
            assert variants(a, d) & variants(b, d), (a, b, d)
