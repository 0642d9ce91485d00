"""Deterministic, SQL-expressible geo columns derived from the driver's
TPC-H-ish tables (FIXTURES.md F7).

The same integer-arithmetic formulas are used by the Spark queries and the
DuckDB oracle SQL, so spatial results are checkable with plain arithmetic.
All intermediate products fit comfortably in int64 at every scale factor.

Spark Column builders and the equivalent SQL fragments live side by side —
keep them in lockstep.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# lat in [-85, 85), lon in [-180, 180), deterministic per key.
_LAT_MUL = 7919
_LAT_MOD = 17_000_000
_LON_MUL = 104_729
_LON_MOD = 36_000_000


def lat_col(key) -> Column:
    k = F.col(key) if isinstance(key, str) else key
    return ((k.cast("long") * _LAT_MUL) % _LAT_MOD) / 100_000.0 - 85.0


def lon_col(key) -> Column:
    k = F.col(key) if isinstance(key, str) else key
    return ((k.cast("long") * _LON_MUL) % _LON_MOD) / 100_000.0 - 180.0


def lat_sql(key: str) -> str:
    return f"((CAST({key} AS BIGINT) * {_LAT_MUL}) % {_LAT_MOD}) / 100000.0 - 85.0"


def lon_sql(key: str) -> str:
    return f"((CAST({key} AS BIGINT) * {_LON_MUL}) % {_LON_MOD}) / 100000.0 - 180.0"


def lat_lon_values(keys):
    """NumPy twin of lat_col/lon_col for worker-side fixture builders."""
    import numpy as np

    k = np.asarray(keys, dtype=np.int64)
    lat = ((k * _LAT_MUL) % _LAT_MOD) / 100_000.0 - 85.0
    lon = ((k * _LON_MUL) % _LON_MOD) / 100_000.0 - 180.0
    return lat, lon


def points_from(df, key: str, id_alias: str = "point_id"):
    """Attach deterministic (lat, lon) to any keyed table."""
    return df.select(
        F.col(key).cast("long").alias(id_alias),
        lat_col(key).alias("lat"),
        lon_col(key).alias("lon"),
    )


# The matching SQL for the oracle side (DuckDB), parameterized by table/key.
def points_sql(table: str, key: str, id_alias: str = "point_id") -> str:
    return (
        f"SELECT CAST({key} AS BIGINT) AS {id_alias}, "
        f"{lat_sql(key)} AS lat, {lon_sql(key)} AS lon FROM {table}"
    )


# --- deterministic edge layers (for the crossing join) ---------------------
# endpoint1 = the point for `key`; endpoint2 = endpoint1 + a +-3 deg delta
# derived from the same key — identical integer arithmetic in SQL.
_DLAT_MUL, _DLAT_ADD = 13, 5
_DLON_MUL, _DLON_ADD = 29, 11


def edges_from(df, key: str, id_alias: str = "edge_id"):
    k = F.col(key).cast("long")
    lat1 = lat_col(key)
    lon1 = lon_col(key)
    dlat = ((k * _DLAT_MUL + _DLAT_ADD) % 600) / 100.0 - 3.0
    dlon = ((k * _DLON_MUL + _DLON_ADD) % 600) / 100.0 - 3.0
    return df.select(
        k.alias(id_alias),
        lat1.alias("lat1"),
        lon1.alias("lon1"),
        (lat1 + dlat).alias("lat2"),
        (lon1 + dlon).alias("lon2"),
    )


def edges_sql(table: str, key: str, id_alias: str = "edge_id") -> str:
    lat1 = lat_sql(key)
    lon1 = lon_sql(key)
    dlat = f"((CAST({key} AS BIGINT) * {_DLAT_MUL} + {_DLAT_ADD}) % 600) / 100.0 - 3.0"
    dlon = f"((CAST({key} AS BIGINT) * {_DLON_MUL} + {_DLON_ADD}) % 600) / 100.0 - 3.0"
    return (
        f"SELECT CAST({key} AS BIGINT) AS {id_alias}, "
        f"{lat1} AS lat1, {lon1} AS lon1, "
        f"({lat1}) + ({dlat}) AS lat2, ({lon1}) + ({dlon}) AS lon2 FROM {table}"
    )
