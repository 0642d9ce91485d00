"""Approximate nearest neighbors over embedding columns.

Two tiers (SURVEY/spec: brute-force baseline + a bucketed scale path):

  * brute_force_topk — exact cosine top-k via one crossJoin + window.
    Correctness oracle and fine for small query sets.
  * ivf_topk — IVF (inverted-file) ANN: k-means-style centroids learned on
    a sample (deterministic seed), vectors assigned to their nearest
    centroid ("list"); a query probes only the nprobe nearest lists. The
    probe is a hash equi-join on centroid id — the 100TB-shape plan: the
    big side shuffles once by centroid, queries broadcast.

Dot products ride F.aggregate/zip_with (JVM, codegen) — no Python in the
scoring path; only centroid training (tiny sample) touches the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(c):
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))


def brute_force_topk(
    queries: DataFrame, vectors: DataFrame, k: int,
    query_id: str = "query_id", vec_id: str = "vec_id",
    q_col: str = "qe", v_col: str = "e",
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, vec_id, cos)."""
    cand = queries.crossJoin(vectors)
    cos = _dot(F.col(q_col), F.col(v_col)) / (_norm(F.col(q_col)) * _norm(F.col(v_col)))
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc(vec_id))
    return (
        cand.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", vec_id, "cos")
    )


def train_centroids(vectors: DataFrame, n_lists: int, v_col: str = "e",
                    sample: int = 2048, iters: int = 8, seed: int = 42,
                    id_col: str = "vec_id") -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (Lloyd's, public
    algorithm). Sample is tiny; the expensive assignment stays in Spark.

    The sample is the `sample` smallest ids (a total order — `limit`
    without ordering is partition-layout-dependent, VERDICT r1): same
    input table => same centroids on any cluster."""
    pdf = (
        vectors.select(id_col, v_col)
        .orderBy(id_col)
        .limit(sample)
        .toPandas()
    )
    x = np.array(pdf[v_col].tolist(), dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def assign_lists(vectors: DataFrame, centroids: np.ndarray, v_col: str = "e",
                 id_col: str = "vec_id") -> DataFrame:
    """Attach each vector's nearest-centroid list id.

    Small n_lists (<= 32): JVM-side argmax over greatest() of dot-product
    expressions — no Python. Larger n_lists: one Arrow-batched pandas UDF
    doing an (batch x d) @ (d x n_lists) matmul with the centroid matrix
    broadcast — literal-array expressions stop compiling well past a few
    dozen lists (VERDICT r1), the matmul scales to thousands."""
    n_lists = len(centroids)
    if n_lists <= 32:
        # argmax via array_position(arr, array_max(arr)): the dot-fold
        # expression tree appears twice total, not once per comparison —
        # a greatest()+when-chain form re-embeds all n_lists folds in
        # every branch and blows up Catalyst canonicalization. Ties pick
        # the first (lowest) list, same as the when-chain did.
        arr = F.array(
            *[
                _dot(F.col(v_col), F.array(*[F.lit(float(c)) for c in cent]))
                for cent in centroids
            ]
        )
        list_id = (F.array_position(arr, F.array_max(arr)) - 1).cast("int")
        return vectors.select(id_col, v_col, list_id.alias("list_id"))

    sc_ = vectors.sparkSession.sparkContext
    bc = sc_.broadcast(np.asarray(centroids, dtype=np.float64))

    @F.pandas_udf("int")
    def nearest_list(e: pd.Series) -> pd.Series:
        x = np.array(e.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(x @ bc.value.T, axis=1).astype(np.int32))

    return vectors.select(
        id_col, v_col, nearest_list(F.col(v_col)).alias("list_id")
    )


def ivf_topk(
    queries: DataFrame, vectors: DataFrame, k: int,
    n_lists: int = 16, nprobe: int = 4,
    query_id: str = "query_id", vec_id: str = "vec_id",
    q_col: str = "qe", v_col: str = "e",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: probe only the nprobe nearest lists per query.

    Returns (query_id, rank, vec_id, cos). Recall < 1 by design; at 100TB
    the vector side shuffles once by list_id (or is written bucketed) and
    each query touches nprobe/n_lists of the data. Pass `centroids` to
    skip k-means and use a caller-supplied codebook (e.g. pretrained, or
    exactly-reproducible vectors for an external oracle).
    """
    cents = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else train_centroids(vectors, n_lists, v_col=v_col)
    )
    listed = assign_lists(vectors, cents, v_col=v_col, id_col=vec_id)

    if len(cents) <= 32:
        # per-query probe lists (tiny: n_lists dots per query, JVM-side)
        qdots = [
            _dot(F.col(q_col), F.array(*[F.lit(float(c)) for c in cent])).alias(f"d{i}")
            for i, cent in enumerate(cents)
        ]
        qd = queries.select(query_id, q_col, *qdots)
        pairs = F.array(
            *[F.struct(F.col(f"d{i}").alias("d"), F.lit(i).alias("l")) for i in range(len(cents))]
        )
        probes = F.slice(F.reverse(F.array_sort(pairs)), 1, nprobe)
        ql = qd.select(
            query_id, q_col, F.explode(probes).alias("p")
        ).select(query_id, q_col, F.col("p.l").alias("list_id"))
    else:
        bc = queries.sparkSession.sparkContext.broadcast(
            np.asarray(cents, dtype=np.float64)
        )
        npb = int(nprobe)

        @F.pandas_udf("array<int>")
        def probe_lists(qe: pd.Series) -> pd.Series:
            x = np.array(qe.tolist(), dtype=np.float64)
            d = x @ bc.value.T
            top = np.argpartition(-d, npb - 1, axis=1)[:, :npb]
            # deterministic order within the probe set
            rows = np.take_along_axis(d, top, axis=1)
            order = np.argsort(-rows, axis=1, kind="stable")
            top = np.take_along_axis(top, order, axis=1)
            return pd.Series([t.astype(np.int32).tolist() for t in top])

        ql = queries.select(
            query_id, q_col, F.explode(probe_lists(F.col(q_col))).alias("list_id")
        )

    cand = ql.join(listed, "list_id")
    cos = _dot(F.col(q_col), F.col(v_col)) / (_norm(F.col(q_col)) * _norm(F.col(v_col)))
    w = Window.partitionBy(query_id).orderBy(F.desc("cos"), F.asc(vec_id))
    return (
        cand.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", vec_id, "cos")
    )


def embedding_near_dup_pairs(vectors: DataFrame, threshold: float,
                             vec_id: str = "vec_id", v_col: str = "e",
                             n_lists: int = 16) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket by IVF list, compare
    within buckets only (plus no cross-bucket recall — the scalable
    LSH-style trade)."""
    cents = train_centroids(vectors, n_lists, v_col=v_col)
    listed = assign_lists(vectors, cents, v_col=v_col, id_col=vec_id)
    a = listed.select(F.col(vec_id).alias("id_a"), F.col(v_col).alias("ea"), "list_id")
    b = listed.select(F.col(vec_id).alias("id_b"), F.col(v_col).alias("eb"), "list_id")
    cos = _dot(F.col("ea"), F.col("eb")) / (_norm(F.col("ea")) * _norm(F.col("eb")))
    return (
        a.join(b, "list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
