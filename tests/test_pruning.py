"""Scan-pruning evidence: hive partition pruning and Hilbert-sort
row-group statistics.

At 100 TB the scan is the dominant cost; these tests pin the two layout
properties the engine's write path relies on:

1. A face-partitioned tile table must show PartitionFilters in the scan
   (only the filtered face's directory is read) and the residual cell
   predicate must reach the parquet reader as a pushed filter.
2. Hilbert-sorting rows before write (repartitionByRange + sort on
   s2_sortkey, README "physical sort key") must produce parquet
   row-groups whose [min, max] cell ranges are pairwise disjoint — the
   property parquet min/max data skipping needs to prune row groups for
   any cell-range query.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from pyspark.sql import functions as F


def _cells_df(spark, n=20_000, seed=3):
    rng = np.random.RandomState(seed)
    lat = rng.uniform(-60, 60, n)
    lon = rng.uniform(-180, 180, n)
    from s2geo_spark.kernel import cellid_v1 as v1

    cells = v1.from_latlng(lat, lon).astype(np.int64)
    faces = (cells >> np.int64(61)) & np.int64(7)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "cell": cells,
                "face": faces.astype(np.int64),
                "val": np.arange(n, dtype=np.int64),
            }
        )
    )


class TestScanPruning:
    def test_partition_pruning_and_pushdown(self, spark, tmp_path):
        path = str(tmp_path / "tiles")
        _cells_df(spark).write.partitionBy("face").mode(
            "overwrite"
        ).parquet(path)
        df = spark.read.parquet(path).where(
            (F.col("face") == 2) & (F.col("val") > 100)
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the face predicate must be a partition filter (directory-level
        # prune), NOT a data filter
        assert "PartitionFilters" in plan
        pf = plan.split("PartitionFilters")[1].split("]")[0]
        assert "face" in pf
        # the residual predicate must reach the parquet reader
        assert "PushedFilters" in plan
        pushed = plan.split("PushedFilters")[1].split("]")[0]
        assert "val" in pushed
        # and the result must actually be face 2 only
        faces = [r["face"] for r in df.select("face").distinct().collect()]
        assert faces == [2]

    def test_hilbert_sort_gives_disjoint_rowgroup_ranges(
        self, spark, tmp_path
    ):
        from s2geo_spark import functions as sfn

        path = str(tmp_path / "sorted")
        df = _cells_df(spark).withColumn("sk", sfn.s2_sortkey("cell"))
        (
            df.repartitionByRange(4, "sk")
            .sortWithinPartitions("sk")
            .write.mode("overwrite")
            .parquet(path)
        )
        ranges = []
        import glob

        for f in glob.glob(f"{path}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            ci = {
                meta.schema.column(i).name: i
                for i in range(meta.num_columns)
            }
            for g in range(meta.num_row_groups):
                st = meta.row_group(g).column(ci["sk"]).statistics
                ranges.append((st.min, st.max))
        assert len(ranges) >= 4
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, "row-group sortkey ranges overlap"
