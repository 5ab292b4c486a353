"""Dedup / similarity / textstats operator semantics on hand-built inputs."""

import pytest
from pyspark.sql import functions as F

from named_entity_discovery_and_linking_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from named_entity_discovery_and_linking_spark.operators.similarity import (
    cosine_topk,
    embedding_link_scores,
    lsh_bucketed_nn,
    sign_bucket,
)
from named_entity_discovery_and_linking_spark.operators.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    token_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (2, "the quick brown fox jumps over the sleepy dog"), # near dup
        (3, "completely different text about spark engines here"),
        (4, "el gato y el perro y el raton y la casa"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").coalesce(2)


def test_exact_dedup_groups(docs):
    out = {r["keep_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 1 collapse, min id kept
    assert out[2] == 1 and out[3] == 1


def test_jaccard_exact_dup_is_one(docs):
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, 0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.5 <= pairs[(0, 2)] < 1.0  # one shingle window changed
    assert (0, 3) not in pairs


def test_minhash_finds_near_dups(docs):
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs
    assert all(a < b for a, b in pairs)  # canonical ordering, no self-pairs


def test_minhash_signature_identical_for_dups(docs):
    sig = {r["doc"]: tuple(r[c] for c in r.asDict() if c.startswith("mh_"))
           for r in minhash_signatures(docs).collect()}
    assert sig[0] == sig[1]
    assert sig[0] != sig[3]


def test_simhash_close_for_near_dups(docs):
    s = {r["doc"]: r["simhash"] for r in simhash(docs).collect()}
    assert s[0] == s[1]
    ham_near = bin(s[0] ^ s[2]).count("1")
    ham_far = bin(s[0] ^ s[3]).count("1")
    assert ham_near <= ham_far


def test_cosine_topk_orders_by_similarity(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),  # antipode
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk(emb, [0], k=3).orderBy("rnk").collect()
    assert [r["n_id"] for r in out] == [1, 2, 3]
    assert out[0]["cos"] > 0.99 and out[2]["cos"] == -1.0


def test_lsh_bucket_groups_same_signs(spark):
    rows = [
        (0, [1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),
        (1, [2.0, 0.5, -0.1, 1.0, 1.0, 1.0, 1.0, 1.0]),  # same sign pattern
        (2, [-1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),  # different bucket
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = emb.select("vec_id", sign_bucket("embedding", 8).alias("bucket")).collect()
    buckets = {r["vec_id"]: r["bucket"] for r in b}
    assert buckets[0] == buckets[1] != buckets[2]
    nn = {r["vec_id"]: r["nn_id"] for r in lsh_bucketed_nn(emb, nbits=8).collect()}
    assert nn[0] == 1 and nn[1] == 0
    assert 2 not in nn  # alone in its bucket -> no neighbor row


def test_lang_id_picks_stopword_majority(spark):
    docs = spark.createDataFrame(
        [(0, "the cat and the dog in the house"), (1, "el gato y la casa de el perro")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert out[0] == "en" and out[1] == "es"


def test_quality_and_token_stats(spark):
    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog and runs away fast")],
        "doc_id long, text string",
    )
    q = quality_score(docs).collect()[0]
    assert q["n_tokens"] == 13 and 0 <= q["quality"] <= 100
    t = token_stats(docs).collect()[0]
    assert t["n_tokens"] == 13 and t["n_distinct"] == 12  # 'the' repeats


def test_fingerprint_order_sensitive(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}
    assert fp[0] == fp[2] != fp[1]


def _skewed_docs(spark, n_docs=80):
    """Boilerplate-skew fixture: one 10-word boilerplate sentence appended to
    half the docs (the hot-shingle quadratic corner from VERDICT r3 #2), plus
    one true near-dup pair (docs n_docs / n_docs+1) that also carries the
    boilerplate — the cap must kill the boilerplate blowup WITHOUT losing
    the genuine near-dup."""
    boiler = "subscribe to our newsletter for daily updates and breaking news"
    rows = []
    for i in range(n_docs):
        uniq = f"document {i} body alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
        rows.append((i, uniq + (" " + boiler if i % 2 == 0 else "")))
    near = "the quick brown fox jumps over the lazy sleeping dog at"
    rows.append((n_docs, near + " dawn " + boiler))
    rows.append((n_docs + 1, near + " dusk " + boiler))
    return spark.createDataFrame(rows, "doc_id long, text string").coalesce(4)


def test_df_cap_bounds_hot_shingle_join(spark):
    """The max_df cap bounds the shingle self-join's row count: uncapped, the
    boilerplate shingles (df ~ 42) emit ~df^2/2 rows each; capped at 4, every
    surviving shingle contributes <= 4*3/2 pairs."""
    from named_entity_discovery_and_linking_spark.operators.dedup import (
        _doc_shingles,
        cap_document_frequency,
    )

    docs = _skewed_docs(spark)

    def join_rows(frame):
        a, b = frame.alias("a"), frame.alias("b")
        return a.join(
            b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc"))
        ).count()

    sh = _doc_shingles(docs, "doc_id", "text", 3).localCheckpoint()
    uncapped = join_rows(sh)
    capped_sh = cap_document_frequency(sh, max_df=4).localCheckpoint()
    capped = join_rows(capped_sh)
    assert uncapped > 5000, uncapped          # boilerplate detonates the join
    assert capped < 100, capped               # cap bounds it
    n_keys = capped_sh.select("sh").distinct().count()
    assert capped <= n_keys * (4 * 3) // 2    # per-key bound max_df*(max_df-1)/2


def test_df_cap_preserves_true_near_dups(spark):
    """With the cap on, boilerplate-only pairs vanish but the genuine
    near-dup pair (shares 10+ informative shingles) survives."""
    docs = _skewed_docs(spark)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, 0.5, max_df=4).collect()
    }
    assert set(pairs) == {(80, 81)}, pairs
    assert pairs[(80, 81)] >= 0.5


def test_band_df_cap_bounds_minhash_candidates(spark):
    """max_band_df suppresses mega-collision band groups (30 exact dups ->
    435 candidate pairs uncapped) while a genuine near-dup pair outside the
    mega-group is still found; exact_dedup owns the suppressed group."""
    rows = [(i, "identical boilerplate page content repeated everywhere verbatim again") for i in range(30)]
    near = "completely distinct article about spark shuffle partition tuning strategies"
    rows.append((100, near + " today"))
    rows.append((101, near + " tomorrow"))
    docs = spark.createDataFrame(rows, "doc_id long, text string").coalesce(4)
    uncapped = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (100, 101) in uncapped
    assert sum(1 for a, b in uncapped if a < 30 and b < 30) == 435
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, threshold=0.5, max_band_df=5).collect()
    }
    assert capped == {(100, 101)}, capped
    # the suppressed mega-group is exactly what exact_dedup collapses
    groups = {r["keep_id"]: r["dup_count"] for r in exact_dedup(docs).collect()}
    assert groups[0] == 30


def test_jaccard_cap_matches_python_model(spark):
    """Model-based check on seeded random corpora: the Spark capped-Jaccard
    operator must agree pair-for-pair with a transparent pure-Python model
    (shingle sets -> df census -> cap -> inclusion-exclusion)."""
    import random
    from collections import Counter

    MAXDF, THR = 5, 0.2
    for seed in (1, 7):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(30)]
        docs = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
                for i in range(40)]

        def shingle_set(t):
            ts = t.split(" ")
            if len(ts) >= 3:
                return {" ".join(ts[i:i + 3]) for i in range(len(ts) - 2)}
            return {" ".join(ts)}

        sh = {i: shingle_set(t) for i, t in docs}
        df_census = Counter(s for ss in sh.values() for s in ss)
        capped = {i: {s for s in ss if df_census[s] <= MAXDF} for i, ss in sh.items()}
        want = {}
        ids = sorted(capped)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = ids[ai], ids[bi]
                inter = len(capped[a] & capped[b])
                if inter:
                    j = inter / (len(capped[a]) + len(capped[b]) - inter)
                    if j >= THR:
                        want[(a, b)] = j
        sdf = spark.createDataFrame(docs, "doc_id long, text string").repartition(5)
        got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
               for r in ngram_jaccard_pairs(sdf, THR, max_df=MAXDF).collect()}
        assert set(got) == set(want), seed
        for k in want:  # tolerance: Spark HALF_UP vs python HALF_EVEN at 6dp
            assert abs(got[k] - want[k]) <= 1e-6, (seed, k)


def test_minhash_verify_max_df_matches_jaccard_cap(spark):
    """max_df on the LSH verify join computes the same capped Jaccard as
    ngram_jaccard_pairs(max_df=...) — the two operators stay consistent."""
    docs = _skewed_docs(spark)
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.5, max_df=4, max_band_df=10).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, 0.5, max_df=4).collect()
    }
    assert set(lsh) <= set(exact)  # LSH is a candidate-filtered subset
    for k in lsh:
        assert lsh[k] == exact[k]


def test_ivf_partitions_every_vector_once(spark):
    """IVF invariants: hash-seeded cells are a partition (every vector in
    exactly one inverted list), centroids are deterministic across input
    partitionings, and probing all cells recovers the brute-force top-k."""
    from named_entity_discovery_and_linking_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    n = emb.count()
    cents = ivf_centroids(emb, n_cells=8)
    inv = ivf_assign(emb, cents)
    assert inv.count() == n
    assert inv.select("vid").distinct().count() == n
    # determinism across partitionings (content-derived hash seeding)
    c1 = sorted(map(tuple, cents.collect()))
    c2 = sorted(map(tuple, ivf_centroids(emb.repartition(7), n_cells=8).collect()))
    assert c1 == c2
    # nprobe = n_cells -> exhaustive: equals brute-force cosine top-k
    from named_entity_discovery_and_linking_spark.operators.similarity import cosine_topk

    exact = sorted(map(tuple, cosine_topk(emb, [0, 1, 2], k=3).collect()))
    full = sorted(map(tuple, ivf_topk(emb, [0, 1, 2], k=3, n_cells=8, nprobe=8).collect()))
    assert exact == full


def test_embedding_near_dup_pairs(spark):
    """Planted near-dups at a realistic threshold: a pair of almost-parallel
    vectors is found, orthogonal/antipodal vectors are not, candidates stay
    within sign buckets, ids come back canonically ordered."""
    from named_entity_discovery_and_linking_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    rows = [
        (0, [1.0, 0.5, 0.2, 0.1]),
        (1, [0.99, 0.52, 0.19, 0.11]),   # near-dup of 0
        (2, [0.0, 0.0, 1.0, 0.0]),       # same all-positive-signs bucket, far
        (3, [-1.0, -0.5, -0.2, -0.1]),   # antipode: different bucket entirely
        (4, [1.0, 0.5, 0.2, 0.100001]),  # second near-dup of 0
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["id_a"], r["id_b"]): r["cos"]
           for r in embedding_near_dup_pairs(emb, threshold=0.9, nbits=4).collect()}
    assert set(got) == {(0, 1), (0, 4), (1, 4)}
    assert all(c >= 0.9 for c in got.values())
    assert all(a < b for a, b in got)
    # threshold filters inside the bucket: 2 shares the bucket but never pairs
    loose = {(r["id_a"], r["id_b"])
             for r in embedding_near_dup_pairs(emb, threshold=-1.0, nbits=4).collect()}
    assert (0, 2) in loose and (2, 4) in loose  # candidates existed...
    assert not any(3 in p for p in loose)       # ...but 3's bucket is its own


def test_ivf_adaptive_cells(spark):
    """adaptive_n_cells ~ isqrt(n) clamped, and n_cells=None routes through
    it: identical results to passing the formula's value explicitly."""
    from named_entity_discovery_and_linking_spark.operators.similarity import (
        adaptive_n_cells,
        ivf_topk,
    )

    assert adaptive_n_cells(1) == 4          # clamp low
    assert adaptive_n_cells(500) == 22       # isqrt
    assert adaptive_n_cells(5000) == 70
    assert adaptive_n_cells(10**10) == 65536  # clamp high
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    n = emb.count()
    auto = sorted(map(tuple, ivf_topk(emb, [0, 1, 2], k=3, n_cells=None, nprobe=2).collect()))
    explicit = sorted(map(tuple, ivf_topk(
        emb, [0, 1, 2], k=3, n_cells=adaptive_n_cells(n), nprobe=2).collect()))
    assert auto == explicit


def test_ivf_probe_prunes_candidates(spark):
    """nprobe < n_cells searches a subset: results are a (possibly
    approximate) top-k drawn only from probed cells, every query still
    gets k rows at this corpus size, and recall vs brute force is high."""
    from named_entity_discovery_and_linking_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qs = [0, 1, 2, 3, 4]
    approx = ivf_topk(emb, qs, k=3, n_cells=8, nprobe=2).collect()
    assert {r["q_id"] for r in approx} == set(qs)
    assert all(sum(1 for r in approx if r["q_id"] == q) == 3 for q in qs)
    exact = {(r["q_id"], r["n_id"]) for r in cosine_topk(emb, qs, k=3).collect()}
    got = {(r["q_id"], r["n_id"]) for r in approx}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, recall


def test_dedup_clusters_transitive_chain(spark):
    """A~B and B~C by Jaccard without A~C still collapse to ONE cluster
    (the closure, not the pair list), exact dups join by star edge, and
    singletons survive as their own canonical cluster of size 1."""
    from named_entity_discovery_and_linking_spark.operators.dedup import (
        dedup_clusters,
    )

    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"
    rows = [
        (10, base),                                  # chain: A
        (11, base.replace("w0", "x0")),              # B ~ A (9/11 = 0.818...)
        (12, base.replace("w0", "x0").replace("w9", "x9")),  # C ~ B, not ~ A
        (13, "totally unrelated text with nothing shared here at all"),
        (20, "same bytes twice"),                    # exact pair
        (21, "same bytes twice"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").coalesce(2)
    out = {r["doc_id"]: r for r in dedup_clusters(df, threshold=0.6).collect()}

    assert len(out) == len(rows)  # every input doc labeled
    # A/B share 7 of 9+8-7=... shingle jaccard must link A-B and B-C; check
    # the chain collapsed transitively
    assert out[10]["cluster_id"] == out[11]["cluster_id"] == out[12]["cluster_id"] == 10
    assert out[10]["is_canonical"] and not out[11]["is_canonical"]
    assert out[12]["cluster_size"] == 3
    # exact dups via the md5 star edge
    assert out[20]["cluster_id"] == out[21]["cluster_id"] == 20
    assert out[21]["cluster_size"] == 2 and out[20]["is_canonical"]
    # singleton: own id, canonical, size 1
    assert out[13]["cluster_id"] == 13 and out[13]["is_canonical"]
    assert out[13]["cluster_size"] == 1
    # the survivor set is exactly the is_canonical rows: one per cluster
    canon = [d for d, r in out.items() if r["is_canonical"]]
    assert sorted(canon) == [10, 13, 20]


def test_pii_scrub_planted(spark):
    from named_entity_discovery_and_linking_spark.operators.textstats import (
        pii_scrub,
    )

    rows = [
        (1, "contact bob.smith+x@example.co.uk or 10.0.255.3 now"),
        (2, "call +1 555 123 4567 today"),
        (3, "clean text with no identifiers at all"),
        (4, "two mails a@b.io c@d.org and ip 1.2.3.4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_ips"] == 1 and out[1]["n_phones"] == 0
    assert out[1]["text_clean"] == "contact <EMAIL> or <IP> now"
    assert out[2]["n_phones"] == 1 and out[2]["text_clean"] == "call <PHONE> today"
    assert out[3]["text_clean"] == rows[2][1]  # untouched passthrough
    assert out[3]["n_emails"] == out[3]["n_ips"] == out[3]["n_phones"] == 0
    assert out[4]["n_emails"] == 2 and out[4]["n_ips"] == 1
    assert out[4]["text_clean"] == "two mails <EMAIL> <EMAIL> and ip <IP>"


def test_repetition_stats_planted(spark):
    from named_entity_discovery_and_linking_spark.operators.textstats import (
        repetition_stats,
    )

    rows = [
        (1, "a b a b a b"),   # 2-grams: ab ba ab ba ab -> 5 total, 2 distinct
        (2, "w"),             # single token -> degenerate 1-gram doc
        (3, "x y z q"),       # all distinct
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df, n=2).collect()}
    assert out[1]["total_ngrams"] == 5 and out[1]["distinct_ngrams"] == 2
    assert out[1]["dup_ngram_frac"] == 0.6 and out[1]["top_ngram_frac"] == 0.6
    assert out[2]["total_ngrams"] == 1 and out[2]["dup_ngram_frac"] == 0.0
    assert out[3]["dup_ngram_frac"] == 0.0 and out[3]["top_ngram_frac"] == 0.333333


def test_semdedup_clusters_transitive(spark):
    """A~B and B~C at cos>=0.9 without A~C collapse transitively; a far
    vector stays a singleton.  All vectors sign-positive so they share one
    LSH bucket — the test pins the closure, not bucket recall."""
    import math

    from named_entity_discovery_and_linking_spark.operators.similarity import (
        semdedup_clusters,
    )

    def v(deg):
        t = math.radians(deg)
        return [math.cos(t), math.sin(t), 1e-4, 1e-4]

    rows = [(10, v(0)), (11, v(25)), (12, v(50)), (30, v(85))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in semdedup_clusters(df, threshold=0.9).collect()}
    assert len(out) == 4
    assert out[10]["cluster_id"] == out[11]["cluster_id"] == out[12]["cluster_id"] == 10
    assert out[12]["cluster_size"] == 3 and out[10]["is_canonical"]
    assert out[30]["cluster_id"] == 30 and out[30]["is_canonical"]
    assert out[30]["cluster_size"] == 1


def test_gopher_filter_each_criterion(spark):
    """One planted doc per failure mode; flags are independent and keep is
    their conjunction."""
    from named_entity_discovery_and_linking_spark.operators.textstats import (
        gopher_filter,
    )

    good = "the quick brown fox jumps over a lazy dog and the small cat"
    rows = [
        (1, good),
        (2, "too short text"),                                   # < min_words
        (3, " ".join(["wordy"] * 30)),                           # no stopwords, 1 distinct
        (4, " ".join(["extraordinarily"] * 10 + ["the"] * 15)),  # mean len 15*10+3*15/25 > 10? -> check flag only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_filter(df, min_words=5, max_words=80).collect()}
    assert out[1]["keep"] and all(out[1][c] for c in ("ok_words", "ok_mean_len", "ok_stop", "ok_distinct"))
    assert not out[2]["ok_words"] and not out[2]["keep"]
    assert not out[3]["ok_stop"] and not out[3]["ok_distinct"] and not out[3]["keep"]
    # doc 4: word_chars = 10*15 + 15*3 = 195, n=25 -> mean 7.8 -> ok; distinct 2/25 -> fails
    assert out[4]["ok_mean_len"] and not out[4]["ok_distinct"]


def test_gopher_filter_mean_len_bounds(spark):
    from named_entity_discovery_and_linking_spark.operators.textstats import (
        gopher_filter,
    )

    rows = [
        (1, " ".join(["supercalifragilistic"] * 6)),  # mean 20 > max 10
        (2, " ".join(["a", "b", "c", "d", "e", "f"])),  # mean 1 < min 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_filter(df, min_words=3).collect()}
    assert not out[1]["ok_mean_len"] and not out[2]["ok_mean_len"]


def test_hash_sample_deterministic_and_partition_independent(spark):
    from named_entity_discovery_and_linking_spark.operators.sampling import (
        hash_sample,
    )

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    kept1 = {r["doc_id"] for r in hash_sample(df.repartition(1), 0.3).collect()}
    kept8 = {r["doc_id"] for r in hash_sample(df.repartition(8), 0.3).collect()}
    assert kept1 == kept8 and kept1  # same decision under any partitioning
    # rate is honored to a few percent at n=2000
    assert 0.25 < len(kept1) / 2000 < 0.35
    assert len({r["doc_id"] for r in hash_sample(df, 1.0).collect()}) == 2000
    assert hash_sample(df, 0.0).count() == 0
    # nested property: a lower-rate sample with the same seed is a subset,
    # so graded quality tiers carve consistent nested corpora
    kept_small = {r["doc_id"] for r in hash_sample(df, 0.1).collect()}
    assert kept_small < kept1


def test_stratified_sample_rates_and_default(spark):
    from named_entity_discovery_and_linking_spark.operators.sampling import (
        hash_sample,
        stratified_sample,
    )

    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "zh")
         .otherwise("fr").alias("lang"),
    )
    out = stratified_sample(df, {"en": 0.5, "zh": 1.0}, default_rate=0.0)
    by_lang = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("zh") == 1000       # 100% stratum keeps everything
    assert "fr" not in by_lang             # default 0 drops unlisted strata
    assert 400 < by_lang.get("en", 0) < 600
    # the en stratum decision equals a plain hash_sample at that rate:
    # stratification changes thresholds, never the per-key hash
    en_only = df.filter(F.col("lang") == "en")
    assert ({r["doc_id"] for r in out.filter(F.col("lang") == "en").collect()}
            == {r["doc_id"] for r in hash_sample(en_only, 0.5).collect()})


def test_curation_report_rollup(spark):
    from named_entity_discovery_and_linking_spark.operators.textstats import (
        curation_report,
    )

    rows = [
        (1, "the quick brown fox jumps over a lazy dog and the small cat", "en"),
        (2, "too short", "en"),
        (3, "kurz", "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {(r["lang"], r["keep"]): (r["n_docs"], r["n_tokens"])
           for r in curation_report(df, min_words=5).collect()}
    assert out[("en", True)] == (1, 13)
    assert out[("en", False)] == (1, 2)
    assert out[("de", False)] == (1, 1)


def test_decontaminate_flags_ngram_overlap(spark):
    """A doc embedding a benchmark 8-gram mid-text flags; a short benchmark
    item caught via the whole-text fallback; clean docs report zeros."""
    from named_entity_discovery_and_linking_spark.operators.dedup import (
        decontaminate,
    )

    bench_sent = "which of the following best describes the process"
    rows = [
        (1, "intro words then " + bench_sent + " trailing tail here"),
        (2, "totally unrelated document about spark shuffle partition tuning"),
        (3, "tiny quiz"),  # exact copy of short benchmark item 21
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(20, bench_sent), (21, "tiny quiz")], "bench_id long, text string"
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=8).collect()}
    assert len(out) == 3
    assert out[1]["contaminated"] and out[1]["n_benchmarks"] == 1
    assert out[1]["n_overlap_shingles"] == 1
    assert not out[2]["contaminated"] and out[2]["n_overlap_shingles"] == 0
    assert out[3]["contaminated"] and out[3]["n_benchmarks"] == 1


def test_bpe_token_count_pins(spark):
    from named_entity_discovery_and_linking_spark.operators.textstats import (
        token_stats,
    )

    rows = [(1, "it's a 42-year test... really?!"), (2, ""), (3, "plain words only")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["n_bpe_tokens"] for r in token_stats(df).collect()}
    # it|'s| a| 42|-year| test|...| really|?!  -> contraction split, digit
    # run, punctuation runs each counted separately
    assert out[1] == 10
    assert out[2] == 0
    assert out[3] == 3


def test_embedding_link_scores_blend_and_rank(spark):
    """Cosine dominates at alpha=1; prior breaks the tie at alpha=0; the
    prior feature normalizes within each mention's own candidate set."""
    cands = spark.createDataFrame(
        [
            # mention 1: e10 aligned with ctx, e11 orthogonal but popular
            (1, 10, [1.0, 0.0], [1.0, 0.0], 1),
            (1, 11, [1.0, 0.0], [0.0, 1.0], 4),
            # mention 2: both candidates identical vectors, different priors
            (2, 20, [0.0, 1.0], [0.0, 1.0], 2),
            (2, 21, [0.0, 1.0], [0.0, 1.0], 8),
        ],
        "mid long, eid long, ctx_vec array<double>, ent_vec array<double>, prior long",
    )
    by_cos = {r["mid"]: r for r in embedding_link_scores(cands, alpha=1.0).collect()}
    assert by_cos[1]["eid"] == 10 and by_cos[1]["cos"] == 1.0
    by_prior = {r["mid"]: r for r in embedding_link_scores(cands, alpha=0.0).collect()}
    assert by_prior[1]["eid"] == 11  # popularity wins when cosine is ignored
    assert by_prior[2]["eid"] == 21 and by_prior[2]["prior_feat"] == 1.0
    # normalization is per-mention: mention 1's max prior (4) != mention 2's (8)
    allrows = embedding_link_scores(cands, alpha=0.5, k=2).collect()
    feats = {(r["mid"], r["eid"]): r["prior_feat"] for r in allrows}
    assert feats[(1, 10)] == 0.25 and feats[(2, 20)] == 0.25


def test_embedding_link_scores_deterministic_tiebreak(spark):
    """Equal scores rank by eid ascending — stable across partitionings."""
    cands = spark.createDataFrame(
        [(1, e, [1.0, 0.0], [1.0, 0.0], 3) for e in (7, 5, 9)],
        "mid long, eid long, ctx_vec array<double>, ent_vec array<double>, prior long",
    )
    a = [(r["eid"], r["rnk"]) for r in
         embedding_link_scores(cands, k=3).orderBy("rnk").collect()]
    b = [(r["eid"], r["rnk"]) for r in
         embedding_link_scores(cands.repartition(5), k=3).orderBy("rnk").collect()]
    assert a == b == [(5, 1), (7, 2), (9, 3)]


def test_embedding_near_dups_multi_table_recovers_sign_flip(spark):
    """The documented single-table recall caveat and its remedy, pinned: a
    near-dup pair with one sign flip inside table 0's dims is invisible to
    the single-table pass but caught by the 2-table OR-amplification."""
    from named_entity_discovery_and_linking_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    base = [0.05] + [1.0] * 15     # dim 1 barely positive
    flip = [-0.05] + [1.0] * 15    # ...barely negative: cosine still ~0.995
    far = [-1.0] * 16
    emb = spark.createDataFrame(
        [(0, base), (1, flip), (2, far)],
        "vec_id long, embedding array<double>",
    )
    one = embedding_near_dup_pairs(emb, threshold=0.9, nbits=8, n_tables=1)
    assert one.count() == 0  # sign flip in dims 1-8 separates the buckets
    multi = {(r["id_a"], r["id_b"]): r["cos"]
             for r in embedding_near_dup_pairs(
                 emb, threshold=0.9, nbits=8, n_tables=2).collect()}
    assert set(multi) == {(0, 1)}  # table 1 (dims 9-16) collides them
    assert multi[(0, 1)] > 0.99


def test_embedding_link_scores_reuses_mention_partitioning(spark):
    """Both windows (prior max, rank) key on the mention id, so a frame
    already partitioned by mention flows through with NO additional
    exchange — the at-scale plan claim in the operator docstring."""
    cands = spark.createDataFrame(
        [(i % 5, 10 + i, [1.0, float(i)], [1.0, 0.5], i % 3 + 1) for i in range(30)],
        "mid long, eid long, ctx_vec array<double>, ent_vec array<double>, prior long",
    )
    plan = (
        embedding_link_scores(cands.repartition(8, "mid"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1  # the repartition only


def test_budget_sample_hits_token_budgets(spark):
    """budget_sample keeps ~budget tokens per stratum, deterministically:
    a 100%-budget stratum survives whole, an over-budget stratum is cut to
    ~budget mass, an unlisted stratum drops entirely, and the kept set is
    partitioning-independent."""
    from named_entity_discovery_and_linking_spark.operators.sampling import (
        budget_sample,
    )

    rows = [(i, "en" if i % 2 == 0 else ("de" if i % 4 == 1 else "fr"),
             10 + (i % 7)) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens int")
    tot = {r["lang"]: r["t"] for r in df.groupBy("lang")
           .agg(F.sum("n_tokens").alias("t")).collect()}
    budgets = {"en": int(tot["en"] * 0.3), "de": tot["de"] * 2}
    kept = budget_sample(df, budgets, token_col="n_tokens")
    got = {r["lang"]: r["t"] for r in kept.groupBy("lang")
           .agg(F.sum("n_tokens").alias("t")).collect()}
    # de: budget >= total -> rate clamps to 1.0, whole stratum kept
    assert got["de"] == tot["de"]
    # fr: unlisted -> default budget 0 -> dropped
    assert "fr" not in got
    # en: within 15% of the asked budget at this scale
    assert abs(got["en"] - budgets["en"]) / budgets["en"] < 0.15
    # determinism across partitionings
    k1 = {r["doc_id"] for r in kept.collect()}
    k2 = {r["doc_id"] for r in budget_sample(
        df.repartition(17), budgets, token_col="n_tokens").collect()}
    assert k1 == k2


def test_budget_sample_null_stratum_takes_default(spark):
    """Advisor r6 #3: a NULL stratum (no lang id) must neither crash the
    rate-table sort nor silently match anything — NULL rows fall through
    to the default rate (0.0)."""
    from named_entity_discovery_and_linking_spark.operators.sampling import budget_sample

    rows = [(i, "en" if i % 2 else None, 100) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    kept = budget_sample(df, {"en": 1000}, token_col="n_tokens")
    out = kept.collect()
    assert all(r.lang == "en" for r in out)
    assert 0 < len(out) <= 20
