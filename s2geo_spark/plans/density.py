"""Spatial density pre-pass + skew splitting — the S2DensityTree analog.

The reference builds a cell->weight tree to shard skewed spatial data
(S2DensityTree::InitToVertexDensity / GetPartitioning,
src/s2/s2density_tree.h:43-113, s2density_tree.cc). Spark-first restatement:

  * density  = groupBy(parent(cell, L)).count() — one hash aggregate with
    map-side partial aggregation; a per-level rollup gives the full tree
  * adaptive split = hot cells (count > max_weight) descend to children
    until balanced — a short driver loop over a tiny aggregated table
  * salting = hot join keys get a salt column (replicate the build side
    x S, hash-bucket the probe side), the north_rule's "explicit skew
    splitting for hot cells (dense urban tiles)"
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from s2geo_spark import functions as sf


def cell_density(points: DataFrame, level: int, cell_col: str = "cell") -> DataFrame:
    """(cell_at_level, weight) — one shuffle, partial aggs map-side."""
    return (
        points.select(sf.s2_parent(cell_col, level).alias("dcell"))
        .groupBy("dcell")
        .agg(F.count("*").alias("weight"))
    )


def density_rollup(points: DataFrame, levels: list[int], cell_col: str = "cell") -> DataFrame:
    """Multi-level density tree as one DataFrame (level, cell, weight).

    Computed from the finest level's aggregate (small) rather than
    re-scanning the input per level.
    """
    finest = max(levels)
    base = cell_density(points, finest, cell_col).cache()
    out = None
    for lv in sorted(levels):
        part = (
            base.select(
                F.lit(lv).alias("level"),
                sf.s2_parent("dcell", lv).alias("cell"),
                "weight",
            )
            .groupBy("level", "cell")
            .agg(F.sum("weight").alias("weight"))
        )
        out = part if out is None else out.unionByName(part)
    return out


def adaptive_partitioning(
    points: DataFrame,
    max_weight: int,
    start_level: int = 4,
    max_level: int = 12,
    cell_col: str = "cell",
):
    """Greedy equal-weight sharding (S2DensityTree::GetPartitioning analog).

    Returns a small pandas DataFrame (cell, level, weight) where every cell
    holds <= max_weight points unless already at max_level. Hot cells are
    recursively split to their children — the resulting cell set is the
    explicit partitioner for a skewed layer.
    """
    import pandas as pd

    from s2geo_spark.kernel import cellid_v1 as v1

    import numpy as np

    dens = cell_density(points, max_level, cell_col).toPandas()
    fine_cells = dens["dcell"].to_numpy().view(np.uint64)
    fine_w = dens["weight"].to_numpy()

    out_rows = []

    def recurse(level: int, prefix_cells, prefix_weights):
        parents = v1.parent(prefix_cells, level)
        agg: dict[int, int] = {}
        for p, w in zip(parents.tolist(), prefix_weights.tolist()):
            agg[p] = agg.get(p, 0) + w
        for p, w in agg.items():
            if w <= max_weight or level >= max_level:
                out_rows.append((np.int64(np.uint64(p)), level, w))
            else:
                mask = parents == np.uint64(p)
                recurse(level + 2 if level + 2 <= max_level else max_level,
                        prefix_cells[mask], prefix_weights[mask])

    recurse(start_level, fine_cells, fine_w)
    return pd.DataFrame(out_rows, columns=["cell", "level", "weight"])


def hot_keys(df: DataFrame, key_col: str, threshold: int) -> list:
    """Keys whose row count exceeds threshold (the salting candidates)."""
    rows = (
        df.groupBy(key_col)
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > threshold)
        .collect()
    )
    return [r[key_col] for r in rows]


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt: int,
    probe_id_col: str,
) -> DataFrame:
    """Skew-safe equi-join: replicate the (small) build side x salt,
    hash-bucket the probe side — hot keys spread over `salt` reducers.

    Equivalent to the north_rule's salted-broadcast strategy when build is
    broadcast; with a shuffle join it splits each hot key across salt
    partitions. AQE skew-join remains the backstop for residual skew.
    """
    salted_build = build.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    salted_probe = probe.withColumn(
        "salt", F.pmod(F.xxhash64(F.col(probe_id_col)), F.lit(salt)).cast("int")
    )
    return salted_probe.join(salted_build, [key, "salt"]).drop("salt")
