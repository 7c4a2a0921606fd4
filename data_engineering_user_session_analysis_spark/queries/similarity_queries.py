"""Similarity-search queries over the `embeddings` table
(array<float> vectors).

Float determinism: dot products fold left-to-right with a DOUBLE
accumulator in BOTH engines (Spark `aggregate` / DuckDB `list_sum`
over an element-wise transform), and float->double widening is exact,
so scores are bit-identical and rankings agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_user_session_analysis_spark.queries import register
from data_engineering_user_session_analysis_spark.sources.tables import load_table


def dot_double(a, b):
    """Sequential-fold dot product with a double accumulator."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


@register(
    "embedding_norms",
    """
SELECT label,
  CAST(count(*) AS BIGINT) AS n_vectors,
  CAST(min(len(embedding)) AS INT) AS min_dim,
  CAST(max(len(embedding)) AS INT) AS max_dim
FROM embeddings GROUP BY label
""",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table profile: vectors and dims per label."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.min(F.size("embedding")).cast("int").alias("min_dim"),
        F.max(F.size("embedding")).cast("int").alias("max_dim"),
    )


@register(
    "knn_brute_force",
    """
WITH anchors AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id % 50 = 0
), scored AS (
  SELECT q_id, vec_id AS neighbor_id,
    list_sum(list_transform(list_zip(q_emb, embedding),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dot
  FROM anchors, embeddings
  WHERE vec_id <> q_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
              ORDER BY dot DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
)
def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-5 nearest neighbors (dot product) for a 1/50
    sample of anchor vectors — the exact baseline ANN variants are
    judged against.

    Plan shape: the anchor set is tiny → broadcast nested-loop join
    against the full table (no shuffle of the big side), then a
    per-anchor top-k window.  At 100 TB the same plan holds: anchors
    broadcast, score+rank map-side, one small shuffle for the window."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        F.broadcast(anchors)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("neighbor_id"),
            dot_double(F.col("q_emb"), F.col("embedding")).alias("dot"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


@register(
    "embedding_neardup",
    """
WITH n AS (
  SELECT vec_id, embedding,
    sqrt(list_sum(list_transform(embedding,
         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
  list_sum(list_transform(list_zip(a.embedding, b.embedding),
           p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
    / (a.nrm * b.nrm) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.embedding, b.embedding),
           p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
    / (a.nrm * b.nrm) >= 0.4
""",
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= 0.4 — the
    synthetic embeddings have no planted dups; max pair cosine ~0.51,
    so this emits the extreme tail).

    All-pairs here; the scale path is LSH bucketing (random
    hyperplane signs) or IVF partitioning, both reducing candidates
    before this same exact scoring."""
    emb = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(dot_double(F.col("embedding"), F.col("embedding")))
    n = emb.select("vec_id", "embedding", nrm.alias("nrm"))
    a = n.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = n.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    cosine = dot_double(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cosine)
        .filter(F.col("cosine") >= 0.4)
        .select("vec_a", "vec_b", "cosine")
    )


@register(
    "ann_ivf_topk",
    """
WITH seeds AS (
  SELECT vec_id AS sid, embedding AS se FROM embeddings WHERE vec_id % 101 = 0
), assign_scored AS (
  SELECT e.vec_id, s.sid,
    row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY list_sum(list_transform(list_zip(e.embedding, s.se),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) DESC,
               s.sid ASC) AS rn
  FROM embeddings e, seeds s
), cells AS (
  SELECT vec_id, sid AS cell FROM assign_scored WHERE rn = 1
), anchors AS (
  -- multiprobe: each anchor searches its top-2 cells (nprobe=2)
  SELECT a.vec_id AS q_id, e.embedding AS q_emb, a.sid AS cell
  FROM assign_scored a JOIN embeddings e ON e.vec_id = a.vec_id
  WHERE a.vec_id % 50 = 0 AND a.rn <= 2
), scored AS (
  SELECT a.q_id, e.vec_id AS neighbor_id,
    row_number() OVER (
      PARTITION BY a.q_id
      ORDER BY list_sum(list_transform(list_zip(a.q_emb, e.embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) DESC,
               e.vec_id ASC) AS rank
  FROM anchors a
  JOIN cells c ON c.cell = a.cell
  JOIN embeddings e ON e.vec_id = c.vec_id
  WHERE e.vec_id <> a.q_id
)
SELECT q_id, neighbor_id, CAST(rank AS INT) AS rank
FROM scored WHERE rank <= 3
""",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned approximate nearest neighbors — the scale path
    for similarity search.

    Deterministic construction (so the oracle can replay it): coarse
    centroids = every 101st vector; every vector is assigned to its
    max-dot centroid (tie-break by centroid id); each anchor searches
    only its own cell, exact top-3 by dot.

    Scale shape: centroids broadcast (K vectors), assignment is one
    map-side pass + a top-1 window per vector; the search join is
    cell-equi (shuffle on cell id, cells ~N/K vectors) instead of a
    full cross join — candidates drop from N to N/K per query.
    Recall vs brute force is the probe tradeoff; nprobe>1 extends
    the same plan with the top-p cells per anchor."""
    emb = load_table(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") % 101 == 0).select(
        F.col("vec_id").alias("sid"), F.col("embedding").alias("se")
    )
    scored_assign = (
        emb.crossJoin(F.broadcast(seeds))
        .select(
            "vec_id",
            "sid",
            dot_double(F.col("embedding"), F.col("se")).alias("dot"),
        )
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("dot").desc(), F.col("sid").asc()
    )
    cells = (
        scored_assign.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("sid").alias("cell"))
    )
    # multiprobe nprobe=2: anchors search their two nearest cells —
    # measured recall@3 0.53 -> 0.70 on the clusterless synthetic set
    # at ~2x candidate cost; same plan shape, one more bucket per key.
    anchor_cells = (
        scored_assign.withColumn("rn", F.row_number().over(w_assign))
        .filter((F.col("vec_id") % 50 == 0) & (F.col("rn") <= 2))
        .select(F.col("vec_id").alias("q_id"), F.col("sid").alias("cell"))
    )
    anchors = anchor_cells.join(
        emb.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")),
        "q_id",
    )
    members = emb.join(cells, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("n_emb"),
        "cell",
    )
    w_rank = Window.partitionBy("q_id").orderBy(
        F.col("dot").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(anchors)
        .join(members, "cell")
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select(
            "q_id",
            "neighbor_id",
            dot_double(F.col("q_emb"), F.col("n_emb")).alias("dot"),
        )
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= 3)
        .select("q_id", "neighbor_id", F.col("rank").cast("int").alias("rank"))
    )


@register("approx_event_stats")  # no oracle: sketch outputs are engine-specific
def approx_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based statistics — the 100 TB variants of countDistinct
    and percentile (single-pass, mergeable, bounded memory).  HLL++ /
    KLL outputs are implementation-specific, so the driver records a
    rows-only check; exactness is covered by the exact twins
    (funnel, value_percentiles)."""
    from data_engineering_user_session_analysis_spark.sources.events import load_events

    ev = load_events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_p50"),
        F.percentile_approx("value", 0.99).alias("approx_p99"),
        F.count("*").alias("n_events"),
    )


@register("label_centroids")  # rows-only: float mean is summation-order-dependent
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors: posexplode -> per-(label, dim)
    mean -> re-assemble ordered array.  Registered without an oracle:
    a distributed float mean has no summation-order guarantee, so no
    cross-engine hash can be exact (counts/dims are checked by the
    rows-only gate; the math is pinned by test_similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    per_dim = (
        emb.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.avg(F.col("x").cast("double")).alias("mean_x"), F.count("*").alias("n"))
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean_x"))
            ).alias("dims"),
            F.max("n").alias("n_vectors"),
        )
        .select(
            "label",
            F.transform(F.col("dims"), lambda s: s["mean_x"]).alias("centroid"),
            "n_vectors",
        )
    )
