"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline, and a sign-bit LSH
bucketed variant as the scale path (candidates only collide within a
bucket).  Dot products are pure Column expressions (zip_with + aggregate)
— JVM-side, no Python.  Cosines are rounded to 6 dp so a DuckDB oracle
(list_cosine_similarity) matches despite summation-order ULP differences.

At 100 TB the brute-force path is a broadcast of the (small) query set
against a partitioned corpus — linear scan, embarrassingly parallel; the
LSH path prunes the scan by bucket equality (equi-join, shuffle on bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    emb: DataFrame, query_ids: list, k: int = 3,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: for each query id, the k nearest other
    vectors.  Returns (q_id, n_id, cos) with deterministic tie-break on id.
    The query side is tiny -> broadcast; the corpus is scanned once."""
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = emb.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "cos", "rnk")
    )


def sign_bucket(vec_col, nbits: int = 8):
    """Axis-aligned sign LSH: bucket = bit-string of sign(v[i]) for the first
    nbits dims.  Deterministic, replicable in plain SQL."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.concat_ws(
        "", *[F.when(F.element_at(c, i + 1) >= 0, "1").otherwise("0") for i in range(nbits)]
    )


def adaptive_nbits(n: int, target_bucket: int = 64, min_bits: int = 4,
                   max_bits: int = 16) -> int:
    """Bucket width as a function of corpus size: 2^nbits buckets sized so
    the EXPECTED bucket holds ~target_bucket vectors, clamped to
    [min_bits, max_bits].  A fixed width is quadratic at scale: with nbits
    frozen the within-bucket pair join is O(sum |b|^2) = O(n^2 / 2^nbits);
    growing nbits with log2(n) keeps per-bucket work bounded."""
    import math

    bits = math.ceil(math.log2(n / target_bucket)) if n > target_bucket else min_bits
    return max(min_bits, min(max_bits, bits))


def lsh_bucketed_nn(
    emb: DataFrame, nbits: int | None = 8, id_col: str = "vec_id", vec_col: str = "embedding",
    target_bucket: int = 64,
) -> DataFrame:
    """Approximate nearest neighbor within sign-LSH buckets: for every
    vector, the best cosine match sharing its bucket.  Returns
    (vec_id, nn_id, cos).  The join is equi on bucket — shuffle on a
    low-cardinality key; AQE splits hot buckets.

    ``nbits=None`` sizes the bucket width from the corpus count
    (adaptive_nbits) — one count job up front; on a metastore-backed table
    at 100 TB, use the table statistics row count instead of a scan."""
    if nbits is None:
        nbits = adaptive_nbits(emb.count(), target_bucket)
    b = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
        sign_bucket(vec_col, nbits).alias("bucket"),
    )
    x = b.alias("x")
    y = b.alias("y")
    pairs = x.join(
        y, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.vid") != F.col("y.vid"))
    ).select(
        F.col("x.vid").alias("vec_id"), F.col("y.vid").alias("nn_id"),
        F.round(cosine(F.col("x.vec"), F.col("y.vec")), 6).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("nn_id").asc())
    return pairs.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") == 1).drop("rnk")
