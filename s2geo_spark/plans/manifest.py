"""Per-partition manifest checkpointing: resumable batch pipelines.

BASELINE.json north_rule: "checkpoints per-partition progress with lineage
and row-count metrics to a manifest table so a killed job resumes without
recomputation". Implementation:

  * the manifest is a parquet table of rows
      (partition_key, status, rows_in, rows_out, wall_ms, attempt, ts)
    appended once per completed partition (atomic at file granularity —
    a crash mid-partition leaves no manifest row, so the partition reruns)
  * output is written per-partition (out/<key>/), overwritten on rerun —
    idempotent MERGE-by-replacement (Iceberg snapshot semantics stand-in;
    with real Iceberg this is a MERGE keyed by url)
  * the driver loop processes only partitions with no 'done' row
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ManifestedRun:
    def __init__(self, spark: SparkSession, manifest_path: str, out_path: str):
        self.spark = spark
        self.manifest_path = manifest_path
        self.out_path = out_path

    def done_partitions(self) -> set:
        try:
            rows = (
                self.spark.read.parquet(self.manifest_path)
                .filter(F.col("status") == "done")
                .select("partition_key")
                .distinct()
                .collect()
            )
            return {r["partition_key"] for r in rows}
        except Exception:
            return set()

    def _append_manifest(self, rows: list[dict]) -> None:
        pdf = self.spark.createDataFrame(
            [
                (
                    r["partition_key"],
                    r["status"],
                    r["rows_in"],
                    r["rows_out"],
                    r["wall_ms"],
                    r["attempt"],
                    r["ts"],
                )
                for r in rows
            ],
            "partition_key string, status string, rows_in long, rows_out long, "
            "wall_ms long, attempt int, ts timestamp",
        )
        pdf.write.mode("append").parquet(self.manifest_path)

    def run(
        self,
        partition_keys: list[str],
        load_fn,
        process_fn,
        attempt: int = 1,
    ) -> dict:
        """Process every partition not yet marked done.

        load_fn(key) -> DataFrame of that partition's input rows;
        process_fn(df) -> output DataFrame. Output lands at
        out_path/<key>/ (overwrite = idempotent rerun).
        Returns {key: rows_out} for the partitions processed in this call.
        """
        import datetime

        done = self.done_partitions()
        processed = {}
        for key in partition_keys:
            if key in done:
                continue
            t0 = time.perf_counter()
            df_in = load_fn(key)
            rows_in = df_in.count()
            out = process_fn(df_in)
            out.write.mode("overwrite").parquet(f"{self.out_path}/{key}")
            rows_out = self.spark.read.parquet(f"{self.out_path}/{key}").count()
            self._append_manifest(
                [
                    {
                        "partition_key": key,
                        "status": "done",
                        "rows_in": rows_in,
                        "rows_out": rows_out,
                        "wall_ms": int((time.perf_counter() - t0) * 1000),
                        "attempt": attempt,
                        "ts": datetime.datetime.now(datetime.timezone.utc).replace(
                            tzinfo=None
                        ),
                    }
                ]
            )
            processed[key] = rows_out
        return processed
