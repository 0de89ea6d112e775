"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus a deterministic
random-hyperplane LSH bucketing as the scale path (bucket first, then
brute-force inside buckets — the classic recipe when a corpus-wide
k-NN would shuffle n^2).

All-JVM column math: dot products via ``aggregate``/``zip_with`` so
the hot path stays in whole-stage codegen; no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    # element-wise double math: float32*float32 would accumulate enough
    # error to flip round(x, 6) against a double-math SQL oracle
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query row, the k nearest
    corpus rows (excluding itself).

    Output: (query_id, neighbor_id, cos_sim rounded 6dp, rank).
    Rank ties break on neighbor_id for determinism.  The corpus side
    crossJoins against the (small) query side — Catalyst broadcasts the
    queries, so the scan streams once; cost O(|corpus| * |queries|),
    the right baseline shape when |queries| << |corpus|.
    """
    # norms precomputed once per row, not once per pair: aggregate/
    # zip_with lambdas run interpreted (outside codegen), so folding
    # the norm into the pair expression would cost O(n*q*dim) extra
    # interpreted work; same doubles, same results
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qnorm") * F.col("cnorm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def embedding_dup_pairs(
    embeddings: DataFrame,
    min_cos: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs baseline).

    Output: (id_a, id_b, cos_sim rounded 6dp) with id_a < id_b and
    cos >= min_cos.  O(n^2) by construction — the exact baseline for
    the LSH-bucketed scale path (``lsh_ann_topk`` restricted to
    bucket-mates); at corpus scale run the bucketed variant and use
    this only to audit its recall on a sample.
    """
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        _norm(F.col(vec_col)).alias("na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        _norm(F.col(vec_col)).alias("nb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= min_cos)
    )


def hyperplane_lsh_buckets(
    embeddings: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 1234,
) -> DataFrame:
    """Deterministic random-hyperplane signature: (id, bucket int).

    Plane p's weight for dimension d derives from md5(seed:p:d) — fully
    deterministic, no stored plane matrix, reproducible in any engine.
    bucket = sum over planes of sign-bit << p.
    """
    dims = embeddings.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col)).alias("d", "x"),
    )
    planes = dims.select(
        "id",
        "d",
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(n_planes - 1))).alias("p"),
    ).withColumn(
        # weight in [-7.5, 7.5]: first hex nibble of md5 minus 7.5
        "w",
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(seed), "p", "d")), 1, 1),
            16,
            10,
        ).cast("double")
        - 7.5,
    )
    return (
        planes.groupBy("id", "p")
        .agg(F.sum(F.col("w") * F.col("x")).alias("proj"))
        .withColumn("bit", F.when(F.col("proj") > 0, 1).otherwise(0))
        .groupBy("id")
        .agg(
            F.sum(F.col("bit") * F.pow(F.lit(2), F.col("p")).cast("long")).alias(
                "bucket"
            )
        )
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: brute-force cosine only within matching
    hyperplane buckets.  Recall < 1 by construction; the scale path
    when queries are many (bucket join replaces the cross join)."""
    buckets = hyperplane_lsh_buckets(embeddings, n_planes, id_col, vec_col)
    emb_b = embeddings.join(
        buckets.withColumnRenamed("id", id_col), id_col
    )
    q = emb_b.join(
        queries.select(F.col(id_col).alias("qid")).withColumnRenamed("qid", id_col),
        id_col,
        "left_semi",
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
        F.col("bucket"),
    )
    c = emb_b.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        _norm(F.col(vec_col)).alias("cnorm"),
        F.col("bucket"),
    )
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qnorm") * F.col("cnorm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
