"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Coordinates are embedded in ``text`` as a ``geo:LAT,LON`` microformat token so
the extraction step is real and ``text`` round-trips byte-identically per
``url``. Point distribution drives the skew tests: 70% clustered in 20
"urban" caps (hot cells), 30% uniform on the sphere (normalized gaussians,
the s2random::Point construction, /root/reference/src/s2/s2random.h:44);
~7% of rows carry no geo token and must pass through un-tiled.

Everything is a pure function of the row id (splitmix64 hashing), so the
table is identical regardless of partitioning, parallelism, or retries —
the determinism the resumable-manifest design (SURVEY.md §4.2) relies on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

SEED = 42

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim minim veniam"
).split()

_LANGS = ["en", "de", "fr", "zh", "es"]


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _unit(h: np.ndarray) -> np.ndarray:
    """uint64 hash -> uniform double in [0, 1)."""
    return (h >> np.uint64(11)).astype(np.float64) * (1.0 / (1 << 53))


def _urban_centers(n_caps: int = 20):
    """Fixed seeded cap centers + radii (0.05..0.5 degrees)."""
    rng = np.random.default_rng(SEED)
    v = rng.normal(size=(n_caps, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    lat = np.degrees(np.arcsin(np.clip(v[:, 2], -1, 1)))
    lon = np.degrees(np.arctan2(v[:, 1], v[:, 0]))
    radius = rng.uniform(0.05, 0.5, n_caps)
    return lat, lon, radius


_CAP_LAT, _CAP_LON, _CAP_RAD = _urban_centers()

_COORD_SCHEMA = StructType(
    [
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("has_geo", IntegerType()),
        StructField("lang_idx", IntegerType()),
        StructField("w1", IntegerType()),
        StructField("w2", IntegerType()),
    ]
)


@F.pandas_udf(_COORD_SCHEMA)
def _page_attrs(row_id: pd.Series) -> pd.DataFrame:
    i = row_id.to_numpy(dtype=np.int64).view(np.uint64)
    h1 = _splitmix64(i)
    h2 = _splitmix64(h1)
    h3 = _splitmix64(h2)
    h4 = _splitmix64(h3)

    urban = (h1 % np.uint64(100)) < np.uint64(70)
    cap_idx = (h2 % np.uint64(len(_CAP_LAT))).astype(np.int64)

    # urban: gaussian-ish offset within the cap radius (Box-Muller)
    u1 = np.maximum(_unit(h3), 1e-12)
    u2 = _unit(h4)
    r = np.sqrt(-2.0 * np.log(u1))
    lat_u = _CAP_LAT[cap_idx] + _CAP_RAD[cap_idx] * 0.5 * r * np.cos(2 * np.pi * u2)
    lon_u = _CAP_LON[cap_idx] + _CAP_RAD[cap_idx] * 0.5 * r * np.sin(2 * np.pi * u2)
    lat_u = np.clip(lat_u, -89.999999, 89.999999)
    lon_u = ((lon_u + 180.0) % 360.0) - 180.0

    # uniform on sphere: z uniform, theta uniform
    z = 2.0 * _unit(h3) - 1.0
    theta = 2.0 * np.pi * _unit(h4)
    lat_s = np.degrees(np.arcsin(np.clip(z, -1, 1)))
    lon_s = np.degrees(((theta + np.pi) % (2 * np.pi)) - np.pi)

    lat = np.where(urban, lat_u, lat_s)
    lon = np.where(urban, lon_u, lon_s)
    has_geo = ((h1 % np.uint64(1000)) >= np.uint64(70)).astype(np.int32)  # ~93%
    lang_idx = (h2 % np.uint64(len(_LANGS))).astype(np.int32)
    w1 = (h3 % np.uint64(len(_WORDS))).astype(np.int32)
    w2 = (h4 % np.uint64(len(_WORDS))).astype(np.int32)
    return pd.DataFrame(
        {
            "lat": lat,
            "lon": lon,
            "has_geo": has_geo,
            "lang_idx": lang_idx,
            "w1": w1,
            "w2": w2,
        }
    )


def synth_pages(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """Generate the pages table, fully distributed and deterministic.

    Text assembly stays JVM-side (concat/format_string); only the hash ->
    coordinate math runs in the Arrow-batched UDF.
    """
    base = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    attrs = base.withColumn("a", _page_attrs(F.col("id"))).select("id", "a.*")

    words = F.array(*[F.lit(w) for w in _WORDS])
    langs = F.array(*[F.lit(lang) for lang in _LANGS])
    geo_tok = F.when(
        F.col("has_geo") == 1,
        F.format_string(" geo:%.6f,%.6f ", F.col("lat"), F.col("lon")),
    ).otherwise(F.lit(" "))
    text = F.concat(
        F.element_at(words, F.col("w1") + 1),
        F.lit(" "),
        F.element_at(words, F.col("w2") + 1),
        geo_tok,
        F.element_at(words, ((F.col("w1") + F.col("w2")) % len(_WORDS)) + 1),
    )
    return attrs.select(
        F.format_string("https://site%d.example/p/%d", F.col("id") % 1000, F.col("id")).alias("url"),
        F.timestamp_seconds(F.lit(1735689600) + F.col("id")).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "utf-8"
        ).alias("html"),
        text.alias("text"),
        F.element_at(langs, F.col("lang_idx") + 1).alias("lang"),
    )


def extract_text(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Extract the text payload from the ``html`` binary column — the
    input_hint's per-row invariant: the extracted text must be
    BYTE-IDENTICAL per url to the carried ``text`` column (the stand-in
    for "matches the reference extractor"; tests assert equality across
    partitionings). Pure JVM ops: utf-8 decode + substring between the
    body tags — no Python in the path."""
    decoded = F.decode(F.col(html_col), "utf-8")
    txt = F.substring_index(
        F.substring_index(decoded, "</body>", 1), "<body>", -1
    )
    return pages.withColumn("extracted_text", txt)


def extract_geo(pages: DataFrame) -> DataFrame:
    """Parse the ``geo:LAT,LON`` token back out of ``text``.

    Pure substring ops (substring_index), not regex — two regexp_extract
    passes cost ~20µs/row on this JVM vs ~2µs for locate+slice, and this
    runs once per page at the head of every pipeline. Rows without a token
    keep null lat/lon (they pass through un-tiled); try_cast turns any
    malformed tail into NULL rather than erroring (ANSI mode).
    """
    # token shape (synth_pages): " geo:<lat>,<lon> " — after 'geo:', lat is
    # everything up to ',', lon up to the following space
    after = F.substring_index("text", "geo:", -1)
    has = F.instr("text", "geo:") > 0
    lat = F.substring_index(after, ",", 1)
    lon = F.substring_index(F.substring_index(after, ",", -1), " ", 1)
    return pages.withColumns(
        {
            "lat": F.when(has, lat.try_cast("double")),
            "lon": F.when(has, lon.try_cast("double")),
        }
    )
