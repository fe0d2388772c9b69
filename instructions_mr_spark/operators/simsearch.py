"""Similarity-search operators over embedding columns
(SURVEY.md §2.7 sim_search; BASELINE mandate).

Three tiers, trading exactness for scan reduction:

1. brute-force cosine top-k (queries/llm_pipeline.sim_search_topk):
   exact, full scan — the recall baseline;
2. sign-bucket LSH (sim_search_ivf query): deterministic pruning,
   oracle-checkable;
3. k-means IVF (this module): train coarse centroids (pyspark.ml
   KMeans, fixed seed), assign each vector to its nearest centroid,
   search only the ``n_probe`` centroids nearest the query — the
   production ANN path.  At 100 TB the assignment is a write-time
   partition column, so probing becomes partition pruning.

The cosine kernel is the JVM-side functions.cosine_sim everywhere —
Python only appears in centroid training (bounded, sampled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from instructions_mr_spark.functions import cosine_sim, dot_product


def train_ivf_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 16,
    seed: int = 42,
    train_cap: int = 100_000,
) -> list[list[float]]:
    """Train k coarse centroids (fixed seed -> deterministic given the
    same input and Spark version).

    Training is bounded by ``train_cap``: coarse-quantizer centroids need
    only a representative sample, so running 20 KMeans iterations over the
    full table (100 TB of vectors) would be pure waste.  The cap is applied
    with a deterministic hash-bucket filter on the vector bytes (portable,
    order-independent — same sample on any partitioning), sized from a
    cheap count, then hard-bounded with ``limit``.  ``train_cap=None``
    disables sampling (tiny tables / tests).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sample = df
    if train_cap is not None:
        n = df.count()
        if n > train_cap:
            # Deterministic membership: md5 of the vector rendered to text,
            # keep buckets < cap/n of the space.  Not df.sample() — that
            # depends on partitioning; this is stable across engines/runs.
            n_buckets = 1_000_003
            keep = max(1, int(n_buckets * train_cap / n))
            bucket = F.pmod(
                F.abs(
                    F.conv(
                        F.substring(F.md5(F.col(vec_col).cast("string")), 1, 15), 16, 10
                    ).cast("long")
                ),
                F.lit(n_buckets),
            )
            sample = df.filter(bucket < keep).limit(train_cap)
    feat = sample.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=20).fit(feat)
    return [list(map(float, c)) for c in model.clusterCenters()]


def assign_ivf_cell(
    df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding", out: str = "cell"
) -> DataFrame:
    """Nearest-centroid assignment as a pure Column expression: argmax
    of dot products against centroid literals (no UDF, no shuffle —
    a projection usable as a write-time partition column)."""
    dots = F.array(
        *[
            dot_product(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
            for c in centroids
        ]
    )
    df = df.withColumn("__dots", dots)
    best = F.expr(
        "array_position(__dots, array_max(__dots))"
    ).cast("int") - 1
    return df.withColumn(out, best).drop("__dots")


def ivf_search(
    df: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    top_k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """ANN search: rank centroids by similarity to the query, scan only
    vectors assigned to the best ``n_probe`` cells, exact cosine within
    the candidates, top-k by (score desc, id)."""
    import math

    def cos(a: list[float], b: list[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    order = sorted(range(len(centroids)), key=lambda i: -cos(centroids[i], query_vec))
    probe = order[:n_probe]
    assigned = assign_ivf_cell(df, centroids, vec_col=vec_col)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        assigned.filter(F.col("cell").isin(probe))
        .select(id_col, cosine_sim(F.col(vec_col), qlit).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(top_k)
    )
