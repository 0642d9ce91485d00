"""kNN join: expanding cell-ring candidate search + window top-k.

Spark-native restatement of S2ClosestPointQuery
(src/s2/s2closest_point_query_base.h:550-760): instead of a per-query
priority queue over index cells, every round is one *batched* equi-join:

  round i: ring = query cell at level L_i + its 8 neighbors (level L_0
           chosen from expected density; L_{i+1} = L_i - 2, i.e. 16x area)
           candidates = points equi-joined on their level-L_i ancestor
           top-k per query by (chord2, point_id)  [deterministic ties]

A query is RESOLVED when it has k candidates and the kth chord distance is
within the ring's guaranteed radius (kMinWidth at L_i — any non-candidate
point is at least one full cell away, src/s2/s2metrics.cc:54-58).
Unresolved queries (skew outliers) iterate with a 4x-coarser ring; the
final fallback joins the few survivors against all points (broadcast of the
tiny query side). Every round is fully vectorized; the driver loop runs at
most ~L_0/2 + 1 times.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from s2geo_spark import functions as sf
from s2geo_spark.kernel import cellid_v1 as v1
from s2geo_spark.kernel import metrics
from s2geo_spark.operators.spatial import xyz_cols


@F.pandas_udf(ArrayType(LongType()))
def _ring_cells(cell: pd.Series, level: pd.Series) -> pd.Series:
    """Query cell's ancestor at `level` + all 8 same-level neighbors.

    Cross-face wrap needs the kernel (AppendAllNeighbors,
    src/s2/s2cell_id_v1.cc:570-611) — Arrow-batched, one call per batch.
    """
    ids = cell.to_numpy(dtype=np.int64, na_value=0).view(np.uint64)
    lvl = int(level.iloc[0])
    anc = v1.parent(ids, lvl)
    rings = v1.append_all_neighbors(anc, lvl)  # (n, 8)
    full = np.concatenate([anc[:, None], rings], axis=1).view(np.int64)
    return pd.Series(list(full))


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    query_id: str = "query_id",
    point_id: str = "point_id",
    start_level: int = 8,
    max_rounds: int = 4,
) -> DataFrame:
    """For each query (query_id, lat, lon): the k nearest points
    (point_id, lat, lon) by spherical distance, ties broken by point_id.

    Returns (query_id, point_id, rank, dist2) with rank 1..k and
    dist2 = squared chord distance (monotone in angle, like S1ChordAngle —
    src/s2/s1chord_angle.h).
    """
    q = xyz_cols(queries, "lat", "lon").withColumn(
        "qcell", sf.s2_cell_id("lat", "lon")
    ).select(query_id, "qcell", F.col("px").alias("qx"), F.col("py").alias("qy"), F.col("pz").alias("qz"))
    p = xyz_cols(points, "lat", "lon").withColumn(
        "pcell", sf.s2_cell_id("lat", "lon")
    ).select(point_id, "pcell", "px", "py", "pz")
    p.cache()

    results = []
    remaining = q
    level = start_level
    for round_idx in range(max_rounds):
        # array_distinct: near face corners a cell has <8 distinct neighbors;
        # a duplicate ring cell would double-count its candidates in top-k
        ring = remaining.withColumn(
            "ring", _ring_cells(F.col("qcell"), F.lit(level))
        ).withColumn("rc", F.explode(F.array_distinct("ring"))).drop("ring")
        cand = ring.join(
            p.withColumn("pc", sf.s2_parent("pcell", level)),
            F.col("rc") == F.col("pc"),
            "inner",
        )
        dist2 = (
            (F.col("px") - F.col("qx")) ** 2
            + (F.col("py") - F.col("qy")) ** 2
            + (F.col("pz") - F.col("qz")) ** 2
        )
        w = Window.partitionBy(query_id).orderBy("dist2", point_id)
        topk = (
            cand.withColumn("dist2", dist2)
            # a point can match through one ring cell only (cells disjoint)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        # resolution bound: non-candidates are >= one cell width away
        safe_chord2 = float(
            (2.0 * np.sin(0.5 * metrics.metric_value(metrics.MIN_WIDTH_DERIV, level)))
            ** 2
        )
        per_query = topk.groupBy(query_id).agg(
            F.count("*").alias("n_cand"), F.max("dist2").alias("kth_dist2")
        )
        resolved_ids = per_query.filter(
            (F.col("n_cand") == k) & (F.col("kth_dist2") <= safe_chord2)
        ).select(query_id)
        results.append(
            topk.join(F.broadcast(resolved_ids), query_id, "leftsemi").select(
                query_id, point_id, "rank", "dist2"
            )
        )
        remaining = remaining.join(
            F.broadcast(resolved_ids), query_id, "left_anti"
        )
        # driver-side early exit: most rounds resolve everything — skip the
        # remaining rounds' jobs entirely (one cheap isEmpty action per round)
        remaining = remaining.cache()
        if remaining.isEmpty():
            remaining = remaining.sparkSession.createDataFrame([], remaining.schema)
            break
        level -= 2
        if level < 0:
            break

    # final fallback: brute force for the (few) unresolved queries
    fallback_cand = remaining.crossJoin(p)
    dist2 = (
        (F.col("px") - F.col("qx")) ** 2
        + (F.col("py") - F.col("qy")) ** 2
        + (F.col("pz") - F.col("qz")) ** 2
    )
    w = Window.partitionBy(query_id).orderBy("dist2", point_id)
    results.append(
        fallback_cand.withColumn("dist2", dist2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, point_id, "rank", "dist2")
    )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out
