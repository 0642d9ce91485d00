#!/usr/bin/env python3
"""spark-submit entry point for the pages -> tiles pipeline.

Usage (north_rule deployment shape):

    spark-submit --py-files s2geo_spark.zip scripts/run_pipeline.py \
        --pages <parquet dir or 'synth:N'> --out <dir> --manifest <dir> \
        [--tile-level 10] [--buckets 8]

Builds the zip with:  python -c "from s2geo_spark.deploy import \
make_pyfiles_zip; print(make_pyfiles_zip())"

The run is manifest-checkpointed per bucket: kill it mid-way and rerun —
completed buckets are skipped, outputs are idempotent overwrites.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--tile-level", type=int, default=10)
    ap.add_argument("--buckets", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("s2geo-pages-tiles").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from s2geo_spark import deploy
    from s2geo_spark import functions as sf
    from s2geo_spark.operators import spatial
    from s2geo_spark.plans import manifest as mani
    from s2geo_spark.sources import fixtures as fx
    from s2geo_spark.sources import pages as pages_src

    deploy.ensure_on_workers(spark)

    if args.pages.startswith("synth:"):
        n = int(args.pages.split(":", 1)[1])
        src = pages_src.synth_pages(spark, n)
        src = src.withColumn(
            "bucket", F.pmod(F.xxhash64("url"), F.lit(args.buckets)).cast("int")
        )
        staged = f"{args.out}__staged_input"
        src.write.partitionBy("bucket").mode("overwrite").parquet(staged)
        pages_path = staged
    else:
        pages_path = args.pages

    # shape-indexed flagship path: distributed polygon prep (no driver
    # loop), JVM quad-key scan side, clipped-edge residual
    index_df = spatial.build_index_df(
        spatial.polygons_to_df(spark, fx.pip_loops())
    ).persist()
    index_df.count()

    def load(key: str):
        return spark.read.parquet(f"{pages_path}/{key}")

    def process(df):
        geo = pages_src.extract_geo(df).filter(F.col("lat").isNotNull())
        pts = geo.select(F.col("url").alias("point_id"), "lat", "lon")
        joined = spatial.contains_join_indexed(pts, index_df, emit_cell=True)
        return joined.withColumn(
            "tile", sf.tile_assign("cell", args.tile_level)
        ).select(
            F.col("point_id").alias("url"), "polygon_id", "cell", "tile"
        )

    run = mani.ManifestedRun(spark, args.manifest, args.out)
    keys = [f"bucket={b}" for b in range(args.buckets)]
    processed = run.run(keys, load, process)
    print(json.dumps({"processed": processed, "skipped": len(keys) - len(processed)}))


if __name__ == "__main__":
    main()
