"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over :mod:`s2geo_spark.contract` — the engine's queries with
matching DuckDB oracle SQL. See SURVEY.md §2 for the operator inventory
each query exercises.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from s2geo_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: points -> S2 cells -> PIP join vs polygon layer -> level-10
    tile assignment -> per-(polygon, tile) rollup, on sf0.001."""
    return contract.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
