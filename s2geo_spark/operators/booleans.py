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


def region_covering_df(
    polys: DataFrame,
    out_id: str,
    id_col: str = "polygon_id",
    max_cells: int = 8,
    min_level: int = 4,
    max_level: int = 16,
) -> DataFrame:
    """(polygon_id, loops) -> (out_id, cell) covering relation, computed
    distributed (applyInPandas per polygon). The union of per-loop
    coverings covers the XOR-nested region (the outer loop's covering
    alone already does; holes only shrink it), so it is a valid candidate
    filter for pair enumeration."""

    def per(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from s2geo_spark.kernel import cellunion, coverer
        from s2geo_spark.kernel import loops as lps

        rows = []
        for _, r in pdf.iterrows():
            covs = []
            for l in r["loops"]:
                lp = lps.PreparedLoop(
                    np.asarray(l, dtype=np.float64).reshape(-1, 3)
                )
                covs.append(
                    coverer.get_covering(
                        lp,
                        max_cells=max_cells,
                        min_level=min_level,
                        max_level=max_level,
                    )
                )
            cells = cellunion.normalize(
                np.concatenate(covs).astype(np.uint64)
            ).view(np.int64)
            rows.extend((int(r[id_col]), int(c)) for c in cells)
        return pd.DataFrame(rows, columns=[out_id, "cell"])

    return polys.groupBy(id_col).applyInPandas(
        per, schema=f"{out_id} long, cell long"
    )


def boolean_join(
    a_polys: DataFrame,
    b_polys: DataFrame,
    op: str,
    a_id: str = "a_id",
    b_id: str = "b_id",
    pairs: DataFrame | None = None,
    all_pairs: bool = False,
    snap_level: int | None = None,
) -> DataFrame:
    """a_polys/b_polys: (id, loops array<array<double>>) rows — one or
    more XOR-nested CCW loops per polygon (holes at odd depth). Returns
    (a_id, b_id, n_loops, area, loops array<array<double>>) — result
    loops under the same XOR nesting (booleanop.region_* helpers).

    With pairs=None the candidate set defaults to covering-intersection
    pairs (distributed per-polygon coverings -> cellset.set_intersections
    ancestor equi-joins — VERDICT r2 next-#5): pairs whose coverings are
    disjoint are never enumerated, so the plan contains no
    CartesianProduct and scales with interacting pairs, not |A| x |B|.
    For `union`/`difference` that means disjoint pairs (whose result is
    trivially the inputs) are OMITTED from the output; pass explicit
    `pairs` or all_pairs=True (small layers only) if every pair's row is
    wanted.

    snap_level routes every pair through JOINT snap rounding at that cell
    level before the boolean (overlay.region_boolean_snapped): both
    layers' vertices snap to cell centers and edges split at the shared
    site set, so near-coincident borders (digitized twice, jittered)
    resolve exactly — the reference's per-op S2Builder snap function."""
    if pairs is None:
        if all_pairs:
            pairs = a_polys.select(F.col("polygon_id").alias(a_id)).crossJoin(
                b_polys.select(F.col("polygon_id").alias(b_id))
            )
        else:
            from s2geo_spark.operators import cellset

            # cache the covering UDF outputs: set_intersections probes
            # their distinct levels, and an uncached coverer would rerun
            # per probe. The pair ids are tiny — eagerly checkpoint them
            # and drop the covering cache right away (no session leak).
            cov_a = region_covering_df(a_polys, a_id).cache()
            cov_b = region_covering_df(b_polys, b_id).cache()
            pairs = cellset.set_intersections(
                cov_a, cov_b, a_id, b_id
            ).localCheckpoint(eager=True)
            cov_a.unpersist()
            cov_b.unpersist()
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
        from s2geo_spark.kernel import overlay as ov

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
                if snap_level is not None:
                    res = ov.region_boolean_snapped(av, bv, op, snap_level)
                else:
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


def buffer_polygons(
    polys: DataFrame,
    radius_rad: float,
    max_error: float = 1e-7,
    id_col: str = "polygon_id",
) -> DataFrame:
    """Distributed S2BufferOperation: buffer every polygon's region by a
    signed spherical radius (kernel/polyline.buffer_loop_exact — exact
    offset curves, round joins, trims). Shells (even XOR depth) take the
    radius as-is; holes (odd depth) take the NEGATED radius — growing a
    region shrinks its holes — and a hole annihilated by the shrink
    simply vanishes. Loops must remain disjoint after buffering (merging
    shells is the boolean overlay's job, as in the reference's builder).
    Input (id, loops) rows like boolean_join; output (id, n_loops, area,
    loops) under the XOR convention. Per-polygon work distributes in one
    mapInPandas; no driver loop."""
    schema = f"{id_col} long, n_loops int, area double, loops array<array<double>>"

    def run(batches):
        from s2geo_spark.kernel import booleanop as bo
        from s2geo_spark.kernel import loops as lps
        from s2geo_spark.kernel import polyline as pl

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arrs = [
                    np.asarray(l, dtype=np.float64).reshape(-1, 3)
                    for l in r["loops"]
                ]
                preps = [lps.PreparedLoop(l) for l in arrs]
                out_loops = []
                for i, verts in enumerate(arrs):
                    depth = sum(
                        1
                        for j, p in enumerate(preps)
                        if j != i and bool(p.contains_points(verts[:1])[0])
                    )
                    radius = radius_rad if depth % 2 == 0 else -radius_rad
                    try:
                        out_loops.extend(
                            pl.buffer_loop_exact(verts, radius, max_error)
                        )
                    except ValueError:
                        if depth % 2 == 0:
                            raise
                        # hole annihilated by the shrink: drop it
                rows.append(
                    {
                        id_col: r[id_col],
                        "n_loops": len(out_loops),
                        "area": bo.region_area(out_loops) if out_loops else 0.0,
                        "loops": [l.ravel().tolist() for l in out_loops],
                    }
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "n_loops", "area", "loops"]
            )

    return polys.mapInPandas(run, schema=schema)


def winding_regions(
    loops_df: DataFrame,
    rule: str,
    id_col: str = "region_id",
) -> DataFrame:
    """Distributed S2WindingOperation: every input row carries an ARBITRARY
    oriented loop collection (self-intersecting, doubly-wound, mutually
    crossing — array of flattened (m*3) loops); the winding region under
    `rule` (positive/negative/non_zero/odd) comes back as XOR-nested CCW
    loops. Per-region work distributes in one mapInPandas
    (kernel/overlay.winding_operation, s2winding_operation.cc:560)."""
    schema = f"{id_col} long, n_loops int, area double, loops array<array<double>>"

    def run(batches):
        from s2geo_spark.kernel import booleanop as bo
        from s2geo_spark.kernel import overlay as ov

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arrs = [
                    np.asarray(l, dtype=np.float64).reshape(-1, 3)
                    for l in r["loops"]
                ]
                res = ov.winding_operation(arrs, rule)
                rows.append(
                    {
                        id_col: r[id_col],
                        "n_loops": len(res),
                        "area": bo.region_area(res) if res else 0.0,
                        "loops": [l.ravel().tolist() for l in res],
                    }
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "n_loops", "area", "loops"]
            )

    return loops_df.mapInPandas(run, schema=schema)
