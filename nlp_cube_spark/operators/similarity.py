"""Similarity search over embedding columns (ARRAY<FLOAT>).

- `cosine_topk`: brute-force exact top-k — the correctness baseline. Dot
  products via zip_with/aggregate (JVM, codegen); queries broadcast; top-k
  via window row_number (TakeOrderedAndProject-friendly per query).
- `ivf_topk`: the scale path — coarse quantization: assign every vector to
  its nearest of C centroids (broadcast), probe only the closest `nprobe`
  cells per query. At 100 TB the cell assignment is a narrow map stage and
  the probe is a semi-join on cell_id instead of a full scan.
- centroids come from a deterministic sample (no RNG: hash-ordered take).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

COS_EXPR = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
    " / (sqrt(aggregate({a}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double)))"
    " * sqrt(aggregate({b}, 0D, (acc, x) -> acc + cast(x as double) * cast(x as double))))"
)


def cosine_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5,
    id_col: str = "vec_id", q_id_col: str = "q_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector. queries: (q_id, embedding)."""
    cos = F.expr(COS_EXPR.format(a="q_emb", b=vec_col))
    scored = (
        vectors.alias("v")
        .join(F.broadcast(queries.select(F.col(q_id_col), F.col(vec_col).alias("q_emb"))))
        .select(F.col(q_id_col), F.col(id_col), F.round(cos, 6).alias("cos_sim"))
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def deterministic_centroids(vectors: DataFrame, n_centroids: int = 16, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Pick C centroid vectors deterministically: the C vectors with the
    smallest md5-derived hash of their id (uniform pseudo-random, stable
    across runs and parallelism)."""
    return (
        vectors.select(id_col, vec_col)
        .withColumn("_h", F.expr(f"conv(substr(md5(cast({id_col} as string)), 1, 15), 16, 10)"))
        .orderBy("_h")
        .limit(n_centroids)
        .withColumn("centroid_id", F.expr(f"row_number() over (order by _h)"))
        .select("centroid_id", F.col(vec_col).alias("c_emb"))
    )


def ivf_assign(vectors: DataFrame, centroids: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast, argmax).

    argmax is a max_by aggregate keyed on the vector id, not a window: the
    n x C scored rows reduce map-side (partial aggregation) instead of
    sort-shuffling 16x the data just to keep row_number()=1. Ties break to
    the smallest centroid_id (struct max on (_sim, -centroid_id))."""
    cos = F.expr(COS_EXPR.format(a="c_emb", b=vec_col))
    scored = vectors.join(F.broadcast(centroids)).select(
        id_col, vec_col, "centroid_id", cos.alias("_sim")
    )
    rank_key = F.struct(F.col("_sim"), (-F.col("centroid_id")).alias("neg_cid"))
    return scored.groupBy(id_col).agg(
        F.max_by(F.col("centroid_id"), rank_key).alias("centroid_id"),
        F.first(vec_col).alias(vec_col),
    ).select(id_col, vec_col, "centroid_id")


def ivf_topk(
    vectors: DataFrame, queries: DataFrame, k: int = 5, n_centroids: int = 16, nprobe: int = 4,
    id_col: str = "vec_id", q_id_col: str = "q_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe nearest cells per query."""
    cents = centroids = deterministic_centroids(vectors, n_centroids, id_col, vec_col)
    assigned = ivf_assign(vectors, centroids, id_col, vec_col)
    qcos = F.expr(COS_EXPR.format(a="c_emb", b="q_emb"))
    qcells = (
        queries.select(F.col(q_id_col), F.col(vec_col).alias("q_emb"))
        .join(F.broadcast(cents))
        .select(q_id_col, "q_emb", "centroid_id", qcos.alias("_sim"))
    )
    wq = Window.partitionBy(q_id_col).orderBy(F.desc("_sim"), F.asc("centroid_id"))
    probes = qcells.withColumn("_rn", F.row_number().over(wq)).where(F.col("_rn") <= nprobe).select(
        q_id_col, "q_emb", "centroid_id"
    )
    cos = F.expr(COS_EXPR.format(a="q_emb", b=vec_col))
    scored = assigned.join(F.broadcast(probes), "centroid_id").select(
        q_id_col, F.col(id_col), F.round(cos, 6).alias("cos_sim")
    )
    w = Window.partitionBy(q_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
