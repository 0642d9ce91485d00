"""Streaming tile assignment (SURVEY.md §2.9).

The reference is batch-only; the engine's streaming story is Spark-native:
new page files (standing in for Iceberg snapshot increments) stream through
the same stateless extract -> encode -> tile pipeline, and windowed
aggregations ride Structured Streaming with watermarks. The per-row
transforms are identical code paths to the batch operators, so streaming
and batch results agree by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from s2geo_spark import functions as sf
from s2geo_spark.sources import pages as pages_src

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def stream_pages(spark: SparkSession, path: str) -> DataFrame:
    """readStream over a pages directory (new files = new micro-batches)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def tile_assign_stream(pages_stream: DataFrame, tile_level: int = 10) -> DataFrame:
    """Stateless per-row tile assignment — same columns as the batch path."""
    geo = pages_src.extract_geo(pages_stream).filter(F.col("lat").isNotNull())
    return geo.select(
        "url",
        "warc_ts",
        sf.s2_cell_id("lat", "lon").alias("cell"),
    ).withColumn("tile", sf.tile_assign("cell", tile_level))


def windowed_tile_counts(pages_stream: DataFrame, tile_level: int = 6) -> DataFrame:
    """Watermarked tumbling-window counts per tile (late data handled)."""
    tiles = tile_assign_stream(pages_stream, tile_level)
    return (
        tiles.withWatermark("warc_ts", "10 minutes")
        .groupBy(F.window("warc_ts", "5 minutes"), "tile")
        .agg(F.count("*").alias("pages"))
        .select(
            F.unix_timestamp("window.start").alias("bucket"),
            "tile",
            "pages",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "append") -> None:
    """Drive a stream to completion synchronously (test/local harness).

    Aggregations should pass mode="complete" so windows emit without
    waiting for the watermark to pass them."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    q.processAllAvailable()
    q.stop()
