"""Bucketed physical layout for shuffle-free co-located joins.

At 100TB the dominant cost of cell-keyed joins is the shuffle of the big
fact table. Spark's native bucketing fixes the partitioning AT WRITE TIME:
two tables bucketed by the same column into the same bucket count hash-
partition identically, so an equi-join on that column runs with ZERO
exchanges (SortMergeJoin over pre-bucketed scans). This module is the thin
standard-API wrapper plus the repo's conventions:

  * bucket column: the quantized cell ancestor (`s2_parent(cell, L)`) —
    coarse enough to bound bucket count, fine enough to keep skew low
    (pair with plans/density.py salting for hot tiles);
  * bucket count: power of two, sized so bucket ~ executor-memory chunks.

Spark requires bucketed data to live in a catalog table (saveAsTable);
the default in-memory catalog + local warehouse works in tests and the
pattern carries unchanged to a production metastore/Iceberg catalog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from s2geo_spark import functions as sf


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df bucketed (and optionally sorted) by bucket_col."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_cell_bucketed(
    df: DataFrame,
    table: str,
    cell_col: str = "cell",
    level: int = 6,
    n_buckets: int = 32,
) -> str:
    """Bucket by the level-`level` ancestor of the cell column; returns the
    derived bucket column name (kept in the table for re-joining)."""
    bcol = f"{cell_col}_l{level}"
    out = df.withColumn(bcol, sf.s2_parent(cell_col, level))
    write_bucketed(out, table, bcol, n_buckets, sort_col=cell_col)
    return bcol


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket column —
    the plan contains no shuffle Exchange (asserted in tests)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
