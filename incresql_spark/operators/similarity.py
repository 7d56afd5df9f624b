"""Similarity search over the ``embeddings`` table (``array<float>`` column).

- ``sim_topk_cosine``     — brute-force exact top-k cosine for a BOUNDED
  query set (the correctness baseline; hard-gated on |queries|).
- ``sim_ann_lsh``         — random-hyperplane LSH: search only the query's
  bucket, exact top-k within it (bucket join instead of cross product).
- ``sim_knn_graph``       — full-corpus kNN via the bucketed self-join.
- ``sim_dedup_semantic``  — SemDeDup: kNN graph → cosine threshold →
  connected components → one keeper per cluster.
- ``sim_ann_ivf``         — IVF coarse quantization + multi-probe search.
- ``sim_label_centroids`` / ``sim_kmeans`` — centroid aggregation and
  fixed-iteration Lloyd's k-means as pure DataFrame plans.

Oracle-matching strategy: hyperplane components are deterministic pseudo-
randoms derived from md5 (functions/hashing.unit_interval), embedded as
DOUBLE literals in BOTH the Spark plan and the DuckDB SQL; dot products are
strict left folds in both engines (bit-identical, verified in tests).  So
even the ANN variant is value-hash checkable — no rows-only fallback.

Scale notes: the query set is small → Spark broadcasts it (verified in
tests); the bucket key width is NOT a constant — ``plans.lsh.bits_for_corpus``
derives it from the corpus row count (buckets ≈ N / target_rows_per_bucket,
up to 2^24 buckets), so at 100 TB the bucket space grows with the data
instead of concentrating ~400 GB per bucket, and AQE splits residual skew.
The brute-force variant's cross join is the thing LSH exists to avoid; it
stays quadratic and is only run on bounded query sets (N_QUERIES = 8 here;
production callers gate it on |queries|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.hashing import hash60, hash60_sql
from ..plans.layout import materialize
from ..plans.lsh import (
    bits_for_corpus,
    bucket_expr_duck_dynamic,
    bucket_expr_spark,
    nbits_sql,
)

DIM = 64
TOP_K = 5
N_QUERIES = 8  # vec_id < 8 are the query vectors

# The oracle SQL below computes its LSH bit width IN SQL (nbits_sql CTE +
# width-masked bucket expression), mirroring the Spark side's
# bits_for_corpus(count) — so ONE static string hash-matches at every
# scale factor (the driver gate's sf0.01 AND local .scaled/sf1 runs alike).


_NORM_SPARK = (
    "sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "0D, (acc, x) -> acc + x))"
)
_NORM_DUCK = (
    "sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
    "(acc, x) -> acc + x))"
)
_DOT_AB_SPARK = (
    "aggregate(zip_with(qe, ne, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0D, (acc, x) -> acc + x)"
)
_DOT_AB_DUCK = (
    "list_reduce(list_transform(list_zip(qe, ne), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)"
)




#: hard ceiling on the exact scorer's query-set size — beyond this the
#: O(|queries| × corpus) scan is the wrong tool at any scale; use
#: sim_ann_lsh / sim_ann_ivf instead
MAX_EXACT_QUERIES = 128


def sim_topk_cosine(
    spark: SparkSession, sf_dir: str, n_queries: int = N_QUERIES
) -> DataFrame:
    """Exact top-5 cosine neighbours for each of the ``n_queries`` query
    vectors.  Exact scoring touches every (query, corpus) pair, so the
    query-set size is a hard-gated parameter, not a convention — a large
    query set must go through the ANN operators."""
    if n_queries > MAX_EXACT_QUERIES:
        raise ValueError(
            f"sim_topk_cosine scores n_queries x corpus exactly; "
            f"{n_queries} queries exceeds MAX_EXACT_QUERIES="
            f"{MAX_EXACT_QUERIES} — use sim_ann_lsh/sim_ann_ivf instead"
        )
    e = load_table(spark, sf_dir, "embeddings")
    withnorm = e.select("vec_id", "embedding", F.expr(_NORM_SPARK).alias("norm"))
    q = withnorm.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qnorm"),
    )
    n = withnorm.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        F.col("norm").alias("nnorm"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        q.crossJoin(n)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.expr(_DOT_AB_SPARK) / (F.col("qnorm") * F.col("nnorm")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


SIM_TOPK_COSINE_SQL = f"""
WITH withnorm AS (
  SELECT vec_id, embedding, {_NORM_DUCK} AS norm FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id,
         n.vec_id AS neighbor_id,
         {_DOT_AB_DUCK} / (q.norm * n.norm) AS cosine
  FROM (SELECT vec_id, embedding AS qe, norm FROM withnorm WHERE vec_id < {N_QUERIES}) q
  JOIN (SELECT vec_id, embedding AS ne, norm FROM withnorm) n
    ON q.vec_id <> n.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine
FROM ranked
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: search only the query's hyperplane-LSH bucket, exact top-3 inside.

    Recall vs the brute-force baseline is measured in tests; the driver gate
    checks exact determinism (same buckets → same candidates → same ranks in
    both engines).  Bucket width is derived from the corpus row count
    (plans.lsh.bits_for_corpus) — the one cheap pre-pass (a parquet count)
    buys a bucket space that scales with the data."""
    e = load_table(spark, sf_dir, "embeddings")
    n_planes = bits_for_corpus(e.count())
    bucketed = e.select(
        "vec_id",
        "embedding",
        F.expr(_NORM_SPARK).alias("norm"),
        F.expr(bucket_expr_spark(n_planes)).alias("bucket"),
    )
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qnorm"),
        "bucket",
    )
    n = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        F.col("norm").alias("nnorm"),
        "bucket",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        q.join(n, ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.expr(_DOT_AB_SPARK) / (F.col("qnorm") * F.col("nnorm")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "bucket", "neighbor_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


SIM_ANN_LSH_SQL = f"""
WITH nb AS (
  {nbits_sql('embeddings')}
),
bucketed AS (
  SELECT vec_id, embedding,
         {_NORM_DUCK} AS norm,
         {bucket_expr_duck_dynamic()} AS bucket
  FROM embeddings, nb
),
scored AS (
  SELECT q.vec_id AS query_id,
         q.bucket AS bucket,
         n.vec_id AS neighbor_id,
         {_DOT_AB_DUCK} / (q.norm * n.norm) AS cosine
  FROM (SELECT vec_id, embedding AS qe, norm, bucket FROM bucketed WHERE vec_id < {N_QUERIES}) q
  JOIN (SELECT vec_id, embedding AS ne, norm, bucket FROM bucketed) n USING (bucket)
  WHERE q.vec_id <> n.vec_id
),
ranked AS (
  SELECT query_id, bucket, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, bucket, neighbor_id, rank, cosine
FROM ranked
WHERE rank <= 3
ORDER BY query_id, rank
"""


def sim_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full corpus kNN graph: EVERY vector gets its top-3 bucket-local
    neighbors — the primitive behind SemDeDup-style semantic dedup and
    graph clustering, where restricting to a query set (sim_ann_lsh) is
    not enough.

    Scale: one bucket-keyed self-join — candidate pairs are bounded by
    sum over buckets of |bucket|², and the bucket count grows with the
    corpus (bits_for_corpus), so no all-pairs blowup; the top-3 window
    runs inside each query's partition.  This is the exact dataflow a
    100 TB embedding-dedup job runs, just with trained hyperplanes."""
    e = load_table(spark, sf_dir, "embeddings")
    n_planes = bits_for_corpus(e.count())
    # Materialized once (plans.layout.materialize; see its cluster fault-tolerance note): the norm fold + hyperplane
    # sign bits feed BOTH sides of the self-join; lazily each side would
    # re-evaluate the folds and re-ship the hyperplane-literal expression
    # trees in its task binaries (same rationale as dedup_embedding).
    bucketed = materialize(
        e.select(
            "vec_id",
            "embedding",
            F.expr(_NORM_SPARK).alias("norm"),
            F.expr(bucket_expr_spark(n_planes)).alias("bucket"),
        )
    )
    q = bucketed.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("norm").alias("qnorm"),
        "bucket",
    )
    n = bucketed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        F.col("norm").alias("nnorm"),
        "bucket",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        q.join(n, ["bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.expr(_DOT_AB_SPARK) / (F.col("qnorm") * F.col("nnorm")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("query_id", "neighbor_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


SIM_KNN_GRAPH_SQL = f"""
WITH nb AS (
  {nbits_sql('embeddings')}
),
bucketed AS (
  SELECT vec_id, embedding,
         {_NORM_DUCK} AS norm,
         {bucket_expr_duck_dynamic()} AS bucket
  FROM embeddings, nb
),
scored AS (
  SELECT q.vec_id AS query_id,
         n.vec_id AS neighbor_id,
         {_DOT_AB_DUCK} / (q.norm * n.norm) AS cosine
  FROM (SELECT vec_id, embedding AS qe, norm, bucket FROM bucketed) q
  JOIN (SELECT vec_id, embedding AS ne, norm, bucket FROM bucketed) n USING (bucket)
  WHERE q.vec_id <> n.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, cosine
FROM ranked
WHERE rank <= 3
ORDER BY query_id, rank
"""


# --- SemDeDup: semantic dedup from the kNN graph ---------------------------
SEMDEDUP_TAU = 0.30   # cosine above which two vectors are "the same content"
SEMDEDUP_ITERS = 3    # fixed label-propagation rounds (one Catalyst plan)


def sim_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., 2023, arXiv:2303.09540): drop semantically
    redundant items by thresholding the embedding kNN graph at cosine >=
    {TAU} and keeping ONE representative per connected component —
    composed entirely from this module's primitives: sim_knn_graph
    (bucketed LSH self-join, no all-pairs) -> threshold -> fixed-iteration
    min-label propagation (the dedup_clusters dataflow) -> keeper = min
    vec_id per cluster.

    Scale: the kNN graph bounds candidate edges per vector at k; edges are
    checkpointed once and each propagation round is one shuffle over them.
    The paper clusters with k-means first purely to shard the cosine
    search — the LSH bucketing here plays exactly that role.
    """
    knn = (
        sim_knn_graph(spark, sf_dir)
        .filter(F.col("cosine") >= SEMDEDUP_TAU)
        .select("query_id", "neighbor_id")
    )
    # Materialized once: both sides of every propagation round re-scan the
    # edge list, whose lineage is the full bucketed kNN self-join.
    edges = materialize(
        knn.union(knn.select(F.col("neighbor_id"), F.col("query_id"))).toDF(
            "src", "dst"
        )
    )
    lbl = (
        edges.select(F.col("src").alias("vid"))
        .distinct()
        .withColumn("lbl", F.col("vid"))
    )
    for _ in range(SEMDEDUP_ITERS):
        nb = (
            edges.join(lbl, edges.src == lbl.vid)
            .groupBy(F.col("dst").alias("v2"))
            .agg(F.min("lbl").alias("nl"))
        )
        lbl = lbl.join(nb, lbl.vid == nb.v2, "left").select(
            "vid",
            F.least(F.col("lbl"), F.coalesce(F.col("nl"), F.col("lbl"))).alias("lbl"),
        )
    return lbl.select(
        F.col("lbl").alias("cluster_id"),
        F.col("vid").alias("vec_id"),
        (F.col("vid") == F.col("lbl")).alias("is_keeper"),
    ).orderBy("cluster_id", "vec_id")


sim_dedup_semantic.__doc__ = sim_dedup_semantic.__doc__.replace(
    "{TAU}", str(SEMDEDUP_TAU)
)


def _semdedup_sql() -> str:
    ctes = [
        f"knn AS (SELECT query_id, neighbor_id FROM ({SIM_KNN_GRAPH_SQL}) "
        f"WHERE cosine >= {SEMDEDUP_TAU})",
        "edges AS (SELECT query_id AS src, neighbor_id AS dst FROM knn "
        "UNION ALL SELECT neighbor_id, query_id FROM knn)",
        "lbl0 AS (SELECT DISTINCT src AS vid, src AS lbl FROM edges)",
    ]
    for i in range(SEMDEDUP_ITERS):
        ctes.append(
            f"nb{i} AS (SELECT e.dst AS vid, MIN(l.lbl) AS nl "
            f"FROM edges e JOIN lbl{i} l ON e.src = l.vid GROUP BY e.dst)"
        )
        ctes.append(
            f"lbl{i + 1} AS (SELECT l.vid, "
            f"LEAST(l.lbl, COALESCE(n.nl, l.lbl)) AS lbl "
            f"FROM lbl{i} l LEFT JOIN nb{i} n ON n.vid = l.vid)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT lbl AS cluster_id, vid AS vec_id, (vid = lbl) AS is_keeper
FROM lbl{SEMDEDUP_ITERS}
ORDER BY cluster_id, vec_id
"""
    )


SIM_DEDUP_SEMANTIC_SQL = _semdedup_sql()


N_CENTROIDS = 8  # deterministic seed vectors: vec_id 100..107
N_PROBE = 2  # clusters searched per query


def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse quantization + multi-probe search.

    Centroids are a deterministic seed subset of the corpus (vec_id
    100..100+K — a stand-in for k-means centroids that keeps the operator
    oracle-checkable; swap in KMeans output at production scale).  Every
    vector is assigned to its max-dot-product centroid (the inverted file);
    a query probes its N_PROBE closest centroids' lists and ranks exact
    cosine inside them.

    Scale: assignment is a broadcast join against K centroids + argmax (one
    narrow pass); the probe search shuffles only the probed lists.  Recall
    rises with N_PROBE; the brute-force twin measures it in tests.
    """
    e = load_table(spark, sf_dir, "embeddings")
    withnorm = e.select("vec_id", "embedding", F.expr(_NORM_SPARK).alias("norm"))
    cents = withnorm.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + N_CENTROIDS)
    ).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("ce"),
        F.col("norm").alias("cnorm"),
    )
    # assignment: rank centroids per vector by cosine, keep argmax / top-probe
    scored = (
        withnorm.crossJoin(F.broadcast(cents))
        .withColumn(
            "ccos",
            F.expr(
                "aggregate(zip_with(embedding, ce, (x, y) -> CAST(x AS DOUBLE) * "
                "CAST(y AS DOUBLE)), 0D, (acc, x) -> acc + x)"
            )
            / (F.col("norm") * F.col("cnorm")),
        )
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id").asc()
    )
    ranked_cent = scored.withColumn("crank", F.row_number().over(w_assign))
    inverted = ranked_cent.filter(F.col("crank") == 1).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ne"),
        F.col("norm").alias("nnorm"),
        "cent_id",
    )
    probes = (
        ranked_cent.filter((F.col("vec_id") < N_QUERIES) & (F.col("crank") <= N_PROBE))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("norm").alias("qnorm"),
            "cent_id",
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        probes.join(inverted, ["cent_id"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.expr(_DOT_AB_SPARK) / (F.col("qnorm") * F.col("nnorm")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
        .orderBy("query_id", "rank")
    )


_CDOT_DUCK = (
    "list_reduce(list_transform(list_zip(v.embedding, c.ce), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, x) -> acc + x)"
)

SIM_ANN_IVF_SQL = f"""
WITH withnorm AS (
  SELECT vec_id, embedding, {_NORM_DUCK} AS norm FROM embeddings
),
cents AS (
  SELECT vec_id AS cent_id, embedding AS ce, norm AS cnorm
  FROM withnorm WHERE vec_id >= 100 AND vec_id < {100 + N_CENTROIDS}
),
scored AS (
  SELECT v.vec_id, v.embedding, v.norm, c.cent_id,
         {_CDOT_DUCK} / (v.norm * c.cnorm) AS ccos
  FROM withnorm v CROSS JOIN cents c
),
ranked_cent AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS crank
  FROM scored
),
inverted AS (
  SELECT vec_id AS neighbor_id, embedding AS ne, norm AS nnorm, cent_id
  FROM ranked_cent WHERE crank = 1
),
probes AS (
  SELECT vec_id AS query_id, embedding AS qe, norm AS qnorm, cent_id
  FROM ranked_cent WHERE vec_id < {N_QUERIES} AND crank <= {N_PROBE}
),
hits AS (
  SELECT p.query_id, i.neighbor_id,
         {_DOT_AB_DUCK} / (p.qnorm * i.nnorm) AS cosine
  FROM probes p JOIN inverted i USING (cent_id)
  WHERE p.query_id <> i.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM hits
)
SELECT query_id, neighbor_id, rank, cosine
FROM ranked WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding — the aggregation IVF/k-means training runs
    every iteration.

    posexplode → groupBy(label, dim) → mean reshapes the array aggregation
    into a plain hash aggregate: one shuffle keyed (label, dim), map-side
    partial sums, perfectly balanced regardless of label skew (every label
    spreads over DIM keys).  Sums are exact DECIMAL so distributed
    (any-order) addition hash-matches the single-threaded oracle; one final
    double division per (label, dim).
    """
    e = load_table(spark, sf_dir, "embeddings")
    per_dim = e.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    ).groupBy("label", "dim").agg(
        (
            # float → double is exact; double → decimal rounds identically
            # (half away from zero) in both engines
            F.sum(F.col("x").cast("double").cast("decimal(27,7)")).cast("double")
            / F.count("x").cast("double")
        ).alias("mean_x"),
        F.count("x").alias("n_vectors"),
    )
    return per_dim.select(
        "label", "dim", F.round("mean_x", 6).alias("mean_x"), "n_vectors"
    ).orderBy("label", "dim")


SIM_LABEL_CENTROIDS_SQL = """
WITH per_dim AS (
  -- parallel unnest zips the value with its 0-based position
  SELECT label,
         unnest(range(len(embedding))) AS dim,
         unnest(embedding) AS x
  FROM embeddings
)
SELECT label, CAST(dim AS INT) AS dim,
       round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(27,7))) AS DOUBLE)
             / CAST(COUNT(x) AS DOUBLE), 6) AS mean_x,
       CAST(COUNT(x) AS BIGINT) AS n_vectors
FROM per_dim
GROUP BY label, dim
ORDER BY label, dim
"""


KMEANS_K = 4
KMEANS_ITERS = 2


def sim_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (K=4, 2 iterations, deterministic seed vectors) as
    pure DataFrame ops — the iterative algorithm behind real IVF training,
    oracle-checkable end to end.

    Determinism across engines: distances are per-dim squared diffs rounded
    once into DECIMAL(30,15) then summed exactly (order-free); centroid
    updates are exact-decimal means; assignment ties break on cluster id.
    Each iteration is a broadcast join (K×DIM centroid rows) + two hash
    aggregations — no driver-side math, and iteration count is fixed, so
    the whole thing is one Catalyst plan.  At 100 TB you would checkpoint
    the small centroid frame between iterations; the dataflow is identical.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v_long = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "xf")
    ).select("vec_id", "dim", F.col("xf").cast("double").alias("x"))
    cent = (
        e.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + KMEANS_K))
        .select(
            (F.col("vec_id") - 100).alias("cluster"),
            F.posexplode("embedding").alias("dim", "mf"),
        )
        .select("cluster", "dim", F.col("mf").cast("double").alias("m"))
    )
    assign = None
    for _ in range(KMEANS_ITERS):
        d2 = (
            v_long.join(F.broadcast(cent), "dim")
            .groupBy("vec_id", "cluster")
            .agg(
                F.sum(F.expr("CAST((x - m) * (x - m) AS DECIMAL(30,15))")).alias("d2")
            )
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("d2").asc(), F.col("cluster").asc()
        )
        assign = (
            d2.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cluster")
        )
        cent = (
            v_long.join(assign, "vec_id")
            .groupBy("cluster", "dim")
            .agg(
                (
                    F.sum(F.expr("CAST(x AS DECIMAL(27,7))")).cast("double")
                    / F.count("x").cast("double")
                ).alias("m")
            )
        )
    sizes = assign.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vectors"))
    return (
        cent.join(sizes, "cluster")
        .select("cluster", "dim", F.round("m", 6).alias("mean_x"), "n_vectors")
        .orderBy("cluster", "dim")
    )


def _kmeans_sql() -> str:
    ctes = [
        """v_long AS (
  SELECT vec_id,
         unnest(range(len(embedding))) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
)""",
        f"""c0 AS (
  SELECT vec_id - 100 AS cluster,
         unnest(range(len(embedding))) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS m
  FROM embeddings WHERE vec_id >= 100 AND vec_id < {100 + KMEANS_K}
)""",
    ]
    prev = "c0"
    for i in range(1, KMEANS_ITERS + 1):
        ctes.append(f"""d{i} AS (
  SELECT v.vec_id, c.cluster,
         SUM(CAST((v.x - c.m) * (v.x - c.m) AS DECIMAL(30,15))) AS d2
  FROM v_long v JOIN {prev} c USING (dim)
  GROUP BY v.vec_id, c.cluster
)""")
        ctes.append(f"""a{i} AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cluster ASC) AS rn
    FROM d{i}
  ) WHERE rn = 1
)""")
        ctes.append(f"""c{i} AS (
  SELECT a.cluster, v.dim,
         CAST(SUM(CAST(v.x AS DECIMAL(27,7))) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS m
  FROM v_long v JOIN a{i} a USING (vec_id)
  GROUP BY a.cluster, v.dim
)""")
        prev = f"c{i}"
    last = KMEANS_ITERS
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
sizes AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS n_vectors
  FROM a{last} GROUP BY cluster
)
SELECT c.cluster, CAST(c.dim AS INT) AS dim,
       round(c.m, 6) AS mean_x, s.n_vectors
FROM c{last} c JOIN sizes s USING (cluster)
ORDER BY cluster, dim
"""
    )


SIM_KMEANS_SQL = _kmeans_sql()


def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization of the embedding corpus —
    the SQ8 compression step production ANN indexes (FAISS
    ``ScalarQuantizer``) apply before IVF/LSH so 100 TB of float vectors
    become 25 TB of codes.

    Two-phase plan, both phases scale-safe: (1) per-dimension min/max via
    posexplode → groupBy(dim) — one shuffle whose map-side partial min/max
    reduce N×DIM rows to DIM per task, perfectly balanced because every
    row spreads over all DIM keys; the DIM-row result is folded into two
    array literals and broadcast back.  (2) a narrow per-row pass encodes
    codes ``round((x-lo)*255/(hi-lo))``, reconstructs, and folds the L1
    reconstruction error — no shuffle except the deterministic ORDER BY.

    Cross-engine exactness: float→double casts are exact, the affine
    encode/decode uses one fixed parenthesization, round() is half-up for
    the non-negative arguments in both engines, and the error fold is a
    strict left fold in index order — so even the DOUBLE ``l1_err`` is
    bit-identical and the driver can value-hash it.  ``code_hash`` (60-bit
    md5 of the joined code string) pins the full code sequence, not just
    its summary stats."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = (
        e.select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("lo"),
            F.max(F.col("x").cast("double")).alias("hi"),
        )
    )
    params = dims.agg(
        F.expr("transform(array_sort(collect_list(struct(pos, lo))), s -> s.lo)").alias("los"),
        F.expr("transform(array_sort(collect_list(struct(pos, hi))), s -> s.hi)").alias("his"),
    )
    code_i = (
        "CASE WHEN element_at(his, i+1) = element_at(los, i+1) THEN 0 "
        "ELSE CAST(round((CAST(element_at(embedding, i+1) AS DOUBLE) "
        "- element_at(los, i+1)) * 255.0 "
        "/ (element_at(his, i+1) - element_at(los, i+1))) AS INT) END"
    )
    codes = f"transform(sequence(0, size(embedding) - 1), i -> {code_i})"
    # reconstruction reuses the already-computed codes array (round-13
    # review: re-expanding the encode CASE here doubled the per-element
    # arithmetic — Spark does not CSE across lambda bodies)
    recon_err_i = (
        "abs(CAST(element_at(embedding, i+1) AS DOUBLE) "
        "- (element_at(los, i+1) + element_at(codes, i+1) "
        "* (element_at(his, i+1) - element_at(los, i+1)) / 255.0))"
    )
    l1 = (
        f"aggregate(transform(sequence(0, size(embedding) - 1), "
        f"i -> {recon_err_i}), 0D, (acc, x) -> acc + x)"
    )
    return (
        e.crossJoin(F.broadcast(params))
        .select("vec_id", "embedding", "los", "his",
                F.expr(codes).alias("codes"))
        .select(
            "vec_id",
            F.size("embedding").alias("n_dims"),
            F.expr("array_min(codes)").cast("int").alias("code_min"),
            F.expr("array_max(codes)").cast("int").alias("code_max"),
            F.expr("aggregate(codes, 0L, (acc, c) -> acc + c)").alias("code_sum"),
            hash60(
                F.expr("array_join(transform(codes, c -> CAST(c AS STRING)), '-')")
            ).alias("code_hash"),
            F.expr(l1).alias("l1_err"),
        )
        .orderBy("vec_id")
    )


_SQ8_CODE_I = (
    "CASE WHEN his[i+1] = los[i+1] THEN 0 "
    "ELSE CAST(round((CAST(embedding[i+1] AS DOUBLE) - los[i+1]) * 255.0 "
    "/ (his[i+1] - los[i+1])) AS INT) END"
)

SIM_QUANTIZE_INT8_SQL = f"""
WITH ex AS (SELECT vec_id, embedding, len(embedding) AS nd FROM embeddings),
dims AS (
  SELECT pos, MIN(CAST(x AS DOUBLE)) AS lo, MAX(CAST(x AS DOUBLE)) AS hi
  FROM (SELECT unnest(embedding) AS x,
               unnest(range(0, len(embedding))) AS pos
        FROM embeddings)
  GROUP BY pos
),
params AS (SELECT list(lo ORDER BY pos) AS los, list(hi ORDER BY pos) AS his
           FROM dims),
coded AS (
  SELECT vec_id, nd, embedding, los, his,
         list_transform(range(0, nd), i -> {_SQ8_CODE_I}) AS codes
  FROM ex, params
)
SELECT vec_id,
       CAST(nd AS INT) AS n_dims,
       CAST(list_aggregate(codes, 'min') AS INT) AS code_min,
       CAST(list_aggregate(codes, 'max') AS INT) AS code_max,
       CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum,
       {hash60_sql("array_to_string(codes, '-')")} AS code_hash,
       list_reduce(list_transform(range(0, nd), i ->
           abs(CAST(embedding[i+1] AS DOUBLE)
               - (los[i+1] + codes[i+1]
                  * (his[i+1] - los[i+1]) / 255.0))),
         (a, b) -> a + b) AS l1_err
FROM coded ORDER BY vec_id
"""


QUERIES = {
    "sim_topk_cosine": sim_topk_cosine,
    "sim_ann_lsh": sim_ann_lsh,
    "sim_knn_graph": sim_knn_graph,
    "sim_dedup_semantic": sim_dedup_semantic,
    "sim_ann_ivf": sim_ann_ivf,
    "sim_label_centroids": sim_label_centroids,
    "sim_kmeans": sim_kmeans,
    "sim_quantize_int8": sim_quantize_int8,
}

ORACLE = {
    "sim_topk_cosine": SIM_TOPK_COSINE_SQL,
    "sim_ann_lsh": SIM_ANN_LSH_SQL,
    "sim_knn_graph": SIM_KNN_GRAPH_SQL,
    "sim_dedup_semantic": SIM_DEDUP_SEMANTIC_SQL,
    "sim_ann_ivf": SIM_ANN_IVF_SQL,
    "sim_label_centroids": SIM_LABEL_CENTROIDS_SQL,
    "sim_kmeans": SIM_KMEANS_SQL,
    "sim_quantize_int8": SIM_QUANTIZE_INT8_SQL,
}

BENCH_QUERIES = {"sim_topk_cosine": sim_topk_cosine}
