"""Similarity search over an embedding column.

- ``cosine_topk``: brute-force exact top-k — the correctness baseline; the
  dot product is a JVM-side ``aggregate(zip_with(...))``, queries are
  broadcast, ranking is one window per query.
- ``ivf_topk``: the scale path — an IVF-style index with deterministic
  centroids; each corpus vector is assigned to its nearest centroid
  (one broadcast join), queries probe only ``nprobe`` clusters, cutting
  the candidate set by ~K/nprobe. Same output schema as brute force.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _unit(a: Column) -> Column:
    n = _norm(a)
    return F.transform(a, lambda x: x / n)


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
                query_id: str = "query_id", corpus_id: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank).

    Excludes self-matches when ids collide. Queries are broadcast (they are
    few); the corpus is scanned once, no shuffle besides the per-query
    window ranking.
    """
    q = F.broadcast(queries.select(F.col(query_id),
                                   _unit(F.col(vec_col)).alias("_qv")))
    c = corpus.select(F.col(corpus_id), _unit(F.col(vec_col)).alias("_cv"))
    scored = (q.crossJoin(c)
              .where(F.col(query_id).cast("string") != F.col(corpus_id).cast("string"))
              .withColumn("cosine", F.round(_dot(F.col("_qv"), F.col("_cv")), 6)))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id, corpus_id, "cosine", "rank"))


def ivf_topk(queries: DataFrame, corpus: DataFrame, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             query_id: str = "query_id", corpus_id: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF-bucketed approximate top-k with deterministic centroids.

    Centroids: the ``n_centroids`` corpus vectors with the smallest
    ``xxhash64(id)`` (a deterministic pseudo-random sample — no RNG state,
    stable under re-runs and resume). Assignment and probing are broadcast
    joins; only probed clusters shuffle into the ranking window.
    """
    c_unit = corpus.select(F.col(corpus_id), _unit(F.col(vec_col)).alias("_cv"))
    centroids = (c_unit
                 .withColumn("_h", F.xxhash64(F.col(corpus_id).cast("string")))
                 .orderBy("_h").limit(n_centroids)
                 .select(F.monotonically_increasing_id().alias("centroid_id"),
                         F.col("_cv").alias("_centroid")))
    cb = F.broadcast(centroids)

    # corpus → nearest centroid (1 broadcast join + window)
    assign_w = Window.partitionBy(corpus_id).orderBy(
        F.col("_sim").desc(), F.col("centroid_id").asc())
    assigned = (c_unit.crossJoin(cb)
                .withColumn("_sim", _dot(F.col("_cv"), F.col("_centroid")))
                .withColumn("_rn", F.row_number().over(assign_w))
                .where(F.col("_rn") == 1)
                .select(corpus_id, "_cv", "centroid_id"))

    # queries → nprobe nearest centroids
    q_unit = queries.select(F.col(query_id), _unit(F.col(vec_col)).alias("_qv"))
    probe_w = Window.partitionBy(query_id).orderBy(
        F.col("_sim").desc(), F.col("centroid_id").asc())
    probes = (q_unit.crossJoin(cb)
              .withColumn("_sim", _dot(F.col("_qv"), F.col("_centroid")))
              .withColumn("_rn", F.row_number().over(probe_w))
              .where(F.col("_rn") <= nprobe)
              .select(query_id, "_qv", "centroid_id"))

    scored = (F.broadcast(probes).join(assigned, "centroid_id")
              .where(F.col(query_id).cast("string") != F.col(corpus_id).cast("string"))
              .withColumn("cosine", F.round(_dot(F.col("_qv"), F.col("_cv")), 6))
              .dropDuplicates([query_id, corpus_id]))
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(),
                                             F.col(corpus_id).asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(query_id, corpus_id, "cosine", "rank"))
