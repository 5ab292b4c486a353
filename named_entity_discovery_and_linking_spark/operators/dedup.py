"""Deduplication operators for web-scale corpus curation.

Beyond the reference's operator set (the task brief's training-data-pipeline
requirements): exact dedup, n-gram Jaccard, MinHash+LSH, SimHash.  All are
pure Column expressions over the portable md5-derived hash family
(functions/hashing.py) so a DuckDB oracle can replicate them bit-for-bit.

Scale notes:
- exact dedup is a single hash-groupBy (map-side combinable);
- Jaccard/minhash candidate pairs join on *shingle* or *band* keys, never
  doc x doc — the classic blowup guard; band width tunes recall vs cost;
- HOT-KEY quadratic corner: a shingle shared by d documents emits d^2 pairs
  from the self-join.  AQE splits the skewed partition but cannot shrink the
  pair count — a boilerplate 3-gram in 1M docs is 10^12 pairs.  The fix is
  the ``max_df`` document-frequency cap: shingles with df > max_df carry
  ~zero Jaccard information (they are corpus-wide boilerplate) and are
  dropped BEFORE the join, bounding per-shingle work at max_df^2.  At 100 TB
  set max_df ~ 1e-4 x corpus size; it defaults to None (off) so the exact
  semantics stay oracle-replicable at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash, seeded_hash

SIMHASH_BITS = 16
MINHASH_HASHES = 12
MINHASH_BANDS = 4  # rows per band = 12/4 = 3


def tokens_col(text_col: str = "text"):
    return F.split(F.col(text_col), " ")


def shingles_col(text_col: str = "text", n: int = 3):
    """Word n-gram shingles as an array<string> Column."""
    ts = tokens_col(text_col)
    return F.when(
        F.size(ts) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ts) - n),
            lambda i: F.concat_ws(" ", *[F.element_at(ts, i + j + 1) for j in range(n)]),
        ),
    ).otherwise(F.array(F.concat_ws(" ", ts)))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: md5(text) -> (content_hash, keep_id, dup_count).
    keep_id = min id in the group (the canonical survivor)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles_col(text_col, n))).alias("sh"),
    )


def cap_document_frequency(sh: DataFrame, max_df: int | None,
                           key_col: str = "sh") -> DataFrame:
    """Drop keys whose document frequency exceeds ``max_df`` (the hot-shingle
    guard).  One linear groupBy over the exploded frame, then an anti-join
    against the (tiny) hot-key set — the hot set is by construction at most
    corpus_shingles / max_df keys, so Spark broadcasts it.  ``None`` = off."""
    if max_df is None:
        return sh
    hot = (
        sh.groupBy(key_col).agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df).select(key_col)
    )
    return sh.join(hot, key_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame, threshold: float = 0.6, id_col: str = "doc_id",
    text_col: str = "text", n: int = 3, max_df: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram-shingle Jaccard >= threshold.

    Relational formulation (no doc x doc cross join): explode distinct
    shingles, self-join on the shingle, count shared, Jaccard from
    inclusion-exclusion.  Returns (doc_a, doc_b, jaccard).

    ``max_df`` caps per-shingle document frequency BEFORE the self-join
    (see module docstring); when set, Jaccard is computed over the
    *informative* shingle sets (sizes and intersections both exclude capped
    shingles), so a pair sharing only boilerplate scores 0 instead of
    detonating the join."""
    sh = cap_document_frequency(_doc_shingles(df, id_col, text_col, n), max_df)
    if max_df is not None:
        # the shingle frame fans into sizes + both self-join sides; without
        # materialization the df-census groupBy (a full shuffle) re-runs
        # once per consumer (4x in the executed plan).  Parquet spill, not
        # localCheckpoint: the frame is data-scale (docs x shingles) and
        # object caching is the measured GC pathology (session.materialize)
        from ..session import materialize

        sh = materialize(sh, "capped-shingles")
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn("jaccard", F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    num_hashes: int = MINHASH_HASHES, n: int = 3,
) -> DataFrame:
    """(doc, mh_0..mh_{k-1}) MinHash signature columns over n-gram shingles."""
    sh = F.array_distinct(shingles_col(text_col, n))
    out = df.select(F.col(id_col).alias("doc"), sh.alias("shingles"))

    def hasher(seed: int):
        # closure FACTORY, not `lambda t, i=i`: a two-parameter lambda makes
        # pyspark's transform() pass the ARRAY INDEX as the second argument,
        # silently shadowing the seed — the f-string then embeds the index
        # Column's auto-generated lambda-variable repr, making the "seeds"
        # garbage AND nondeterministic across invocations (caught by a
        # flaky band-collision test; the oracle had only passed because
        # exact-Jaccard verification masked the candidate differences)
        return lambda t: seeded_hash(t, seed)

    for i in range(num_hashes):
        out = out.withColumn(
            f"mh_{i}", F.array_min(F.transform(F.col("shingles"), hasher(i)))
        )
    return out.drop("shingles")


def minhash_lsh_pairs(
    df: DataFrame, threshold: float = 0.5, id_col: str = "doc_id",
    text_col: str = "text", num_hashes: int = MINHASH_HASHES,
    bands: int = MINHASH_BANDS, n: int = 3, max_df: int | None = None,
    max_band_df: int | None = None,
) -> DataFrame:
    """MinHash + LSH banding: candidate pairs collide on at least one band
    (rows-per-band consecutive minhashes equal), then verified with exact
    shingle Jaccard >= threshold.  Returns (doc_a, doc_b, jaccard).

    ``max_df`` caps shingle document frequency in the verification join
    (the hot-shingle guard — see module docstring; signatures are still
    computed over the full shingle set, so candidate recall is unchanged).
    ``max_band_df`` caps BAND-key frequency in the candidate join: a band
    key shared by d docs emits d^2 candidates, which at boilerplate scale
    is the same quadratic corner.  This cap IS a recall trade, not a free
    lunch: a pair whose only colliding bands are hot loses its candidacy
    even if its true Jaccard clears the threshold.  Byte-identical
    mega-groups are already collapsed by ``exact_dedup``, but a TEMPLATE
    FAMILY (same boilerplate, differing bodies, pairwise Jaccard near the
    threshold) is not — for such corpora either run ``exact_dedup`` first
    and size ``max_band_df`` above the expected family size, or prefer
    ``max_df`` (which reweights rather than drops candidates).  The trade
    is MEASURED in BENCH.md (r5, scripts/band_df_recall.py): a cap above
    family size is free; 0.5x family drops only boilerplate-driven pairs
    (recall 0.707 -> 0.241) while body-shared content near-dups keep
    recall 1.000 at 3x fewer candidates."""
    rows = num_hashes // bands
    # the exploded shingle frame is a MAP-ONLY derivation (split + distinct
    # + explode); the shingle-building transform() is an interpreted
    # higher-order function, so every extra derivation over the full corpus
    # costs a full HOF pass — the r07 shape runs it over the corpus exactly
    # ONCE (the fused signature+size aggregation below) and a second time
    # only over the (broadcast-semi-filtered) candidate docs, which at any
    # sane threshold are a vanishing fraction of the corpus.  Caching the
    # exploded frame itself is worse than either: a docs x shingles
    # localCheckpoint is the measured object-store GC pathology
    # (session.materialize notes; 2.5 s to build at sf1.0).
    sh_all = _doc_shingles(df, id_col, text_col, n)
    # signatures via explode + groupBy min instead of array_min(transform):
    # higher-order functions evaluate interpreted (no whole-stage codegen),
    # so k md5s per array element in a lambda were the dominant cost; the
    # relational form runs codegen'd md5 + a map-side-combinable min
    # aggregate over the SAME seeded-hash values (min over the distinct set
    # == array_min over the array — guide §4.1, prefer built-ins).  The
    # uncapped per-doc shingle count rides along in the SAME pass (it is
    # exactly the verification set size when max_df is None), and the
    # resulting one-narrow-row-per-doc table is checkpointed: it feeds both
    # self-join sides of the band candidate join plus the size lookups.
    sig = sh_all.groupBy(F.col("doc")).agg(
        *[F.min(seeded_hash(F.col("sh"), i)).alias(f"mh_{i}")
          for i in range(num_hashes)],
        F.count("*").alias("n_sh_all"),
    ).localCheckpoint()
    band_keys = F.array(
        *[
            F.concat_ws("_", F.lit(b), *[F.col(f"mh_{b * rows + r}") for r in range(rows)])
            for b in range(bands)
        ]
    )
    band_rows = cap_document_frequency(
        sig.select("doc", F.explode(band_keys).alias("band_key")),
        max_band_df, key_col="band_key",
    )
    x = band_rows.alias("x")
    y = band_rows.alias("y")
    # candidate pairs are checkpointed: they feed the verify join AND the
    # two broadcast semi-filters that prune the shingle re-derivation
    cand = (
        x.join(y, (F.col("x.band_key") == F.col("y.band_key")) & (F.col("x.doc") < F.col("y.doc")))
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
        .localCheckpoint()
    )
    # exact-Jaccard verification restricted to the candidate pairs (never
    # re-derive all overlapping pairs — that defeats the point of LSH).
    # Only candidate docs need their shingle SETS back, so the re-derivation
    # is pruned with a broadcast semi-join BEFORE the explode (project
    # early — guide §2.3); the df cap applies only to verification, so
    # signature recall is unchanged.
    cand_docs = (
        cand.select(F.col("doc_a").alias("cdoc"))
        .union(cand.select("doc_b"))
        .distinct()
    )
    df_c = df.join(
        F.broadcast(cand_docs), F.col(id_col) == F.col("cdoc"), "left_semi"
    )
    if max_df is None:
        sh = _doc_shingles(df_c, id_col, text_col, n)
        # n_sh == the uncapped count already computed in the signature pass
        sizes = sig.select("doc", F.col("n_sh_all").alias("n_sh"))
    else:
        # capped Jaccard needs capped set sizes, and the census must run
        # over the FULL corpus (a shingle's document frequency counts every
        # doc, not just candidates) — keep the uncapped-corpus census +
        # candidate-pruned sets
        sh_full = cap_document_frequency(sh_all, max_df).localCheckpoint()
        sh = sh_full.join(
            F.broadcast(cand_docs), F.col("doc") == F.col("cdoc"), "left_semi"
        )
        sizes = sh_full.groupBy("doc").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc").alias("b_doc"), F.col("sh").alias("sh_b"))
    shared = (
        cand.join(a, "doc_a")
        .join(b, (F.col("doc_b") == F.col("b_doc")) & (F.col("sh_a") == F.col("sh_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn("jaccard", F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash over whitespace tokens: bit i of the fingerprint is 1 iff the
    majority of token hashes have bit i set.  (doc, simhash bigint).

    Explode + groupBy formulation: partial aggregation happens map-side, so
    the shuffle carries one row per (doc) — scales linearly."""
    tok = df.select(
        F.col(id_col).alias("doc"), F.explode(tokens_col(text_col)).alias("w")
    ).select("doc", portable_hash(F.col("w")).alias("h"))
    sums = tok.groupBy("doc").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))).alias(f"b{i}")
            for i in range(bits)
        ],
    )
    sim = None
    for i in range(bits):
        term = F.when(F.col(f"b{i}") * 2 > F.col("n"), F.lit(1 << i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return sums.select("doc", sim.cast("bigint").alias("simhash"))


def decontaminate(
    docs: DataFrame, benchmark: DataFrame, n: int = 8,
    id_col: str = "doc_id", text_col: str = "text",
    bench_id_col: str = "bench_id", bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination (the Lee et al. / GPT-3-style n-gram
    overlap check): flag every training document sharing a word ``n``-gram
    with any benchmark text, so eval data can be excluded from the corpus.

    Scale shape: the benchmark set is small by construction (eval suites
    are KBs, corpora are TBs), so its shingle set is BROADCAST and the
    docs side streams through a map-side hash join — no shuffle of the
    corpus.  Only matching shingle rows (rare) reach the per-doc groupBy,
    and the final left join back to the id list is AQE-broadcastable.
    Texts shorter than ``n`` words fall back to a whole-text shingle on
    both sides (``shingles_col`` semantics), so exact copies of short
    benchmark items are still caught.

    Returns one row per input document:
    (id, n_overlap_shingles, n_benchmarks, contaminated).
    """
    d_sh = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(F.array_distinct(shingles_col(text_col, n))).alias("sh"),
    )
    b_sh = benchmark.select(
        F.col(bench_id_col).alias("bench"),
        F.explode(F.array_distinct(shingles_col(bench_text_col, n))).alias("sh"),
    ).distinct()
    hits = (
        d_sh.join(F.broadcast(b_sh), "sh")
        .groupBy("doc")
        .agg(
            F.countDistinct("sh").alias("n_overlap_shingles"),
            F.countDistinct("bench").alias("n_benchmarks"),
        )
    )
    return (
        docs.select(F.col(id_col).alias("doc"))
        .join(hits, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("n_overlap_shingles", F.lit(0)).alias("n_overlap_shingles"),
            F.coalesce("n_benchmarks", F.lit(0)).alias("n_benchmarks"),
            (F.coalesce("n_overlap_shingles", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def dedup_clusters(
    df: DataFrame, threshold: float = 0.6, id_col: str = "doc_id",
    text_col: str = "text", n: int = 3, max_df: int | None = None,
) -> DataFrame:
    """The full dedup DECISION, not just the pair list: exact-duplicate star
    edges (doc -> min-id rep of its md5 group) union near-duplicate Jaccard
    pair edges -> connected components -> one canonical survivor per
    cluster.  Returns (doc_id, cluster_id, is_canonical, cluster_size) for
    EVERY input document; singletons are their own cluster of size 1, and
    the survivor set is exactly ``is_canonical``.

    Transitivity is the point: pairwise output alone cannot decide that
    A~B, B~C (but not A~C) must share ONE survivor — the closure does.
    Scale shape: edges come from the bounded pair generators (the shingle
    document-frequency cap applies via ``max_df``; exact edges are a
    hash-groupBy star, never group^2 pairs), and the CC is the same
    pointer-jumping loop the KG flagship uses (one job per O(log n) round)
    — duplicate families are shallow, so it converges in ~2 rounds.
    Beyond-reference operator (training-data-pipeline section): the
    reference dedups mentions (ner.py NAM/NOM passes), never documents.
    """
    from .canonicalize import connected_components

    docs = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("text"))
    rep = docs.groupBy(F.md5("text").alias("h")).agg(F.min("doc").alias("rep"))
    exact_edges = (
        docs.select(F.md5("text").alias("h"), "doc")
        .join(rep, "h")
        .filter(F.col("doc") != F.col("rep"))
        .select(F.col("doc").alias("src"), F.col("rep").alias("dst"))
    )
    near_edges = ngram_jaccard_pairs(
        df, threshold=threshold, id_col=id_col, text_col=text_col, n=n,
        max_df=max_df,
    ).select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(exact_edges.unionByName(near_edges))
    labeled = (
        docs.join(comp.withColumnRenamed("mid", "doc"), "doc", "left")
        .select("doc", F.coalesce("cluster_id", F.col("doc")).alias("cluster_id"))
    )
    w = Window.partitionBy("cluster_id")
    return labeled.select(
        F.col("doc").alias(id_col),
        "cluster_id",
        (F.col("doc") == F.col("cluster_id")).alias("is_canonical"),
        F.count("*").over(w).alias("cluster_size"),
    )
