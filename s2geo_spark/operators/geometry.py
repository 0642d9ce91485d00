"""Geometry query operators: Hausdorff distance, polyline interpolation,
convex hull — the remaining S2 query family (SURVEY.md §2.4).

  * hausdorff_join — directed/undirected discrete Hausdorff between point
    sets: a kNN-style 1-NN join + groupBy.max
    (S2HausdorffDistanceQuery, src/s2/s2hausdorff_distance_query.h:16-40)
  * chain_interpolate — point-at-fraction along polylines: cumulative arc
    lengths + slerp, vectorized per row
    (S2ChainInterpolationQuery, src/s2/s2chain_interpolation_query.cc)
  * convex_hull — spherical convex hull per group via applyInPandas
    (S2ConvexHullQuery, src/s2/s2convex_hull_query.cc: Graham scan on the
    sphere using robust Sign orientation)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from s2geo_spark.kernel import predicates as pred
from s2geo_spark.kernel import s2coords as sc
from s2geo_spark.operators import knn as knn_op


def hausdorff_join(
    a: DataFrame, b: DataFrame, a_id: str = "set_a", b_id: str = "set_b",
    emit_witness: bool = False,
) -> DataFrame:
    """Directed discrete Hausdorff h(A->B) per (a_id) group against the
    whole of B: max over a in A of min over b in B of dist(a, b).

    Inputs: a(a_id, point_id, lat, lon), b(point_id, lat, lon). Output:
    (a_id, hausdorff_chord2), plus — with emit_witness — the achieving
    pair (witness_query from A, witness_point = its 1-NN in B), ties
    broken by ascending query id (matching the kNN rank tie rule, so an
    oracle can reproduce the ids without comparing floats). Composed
    entirely from the kNN join (1-NN) + a max/top-1 aggregate — no new
    kernel code.
    """
    nn = knn_op.knn_join(
        a.select(F.col("point_id").alias("query_id"), "lat", "lon"),
        b,
        k=1,
    )
    labels = a.select(F.col("point_id").alias("query_id"), a_id)
    nn = nn.join(labels, "query_id")
    if not emit_witness:
        return nn.groupBy(a_id).agg(F.max("dist2").alias("hausdorff_chord2"))
    w = Window.partitionBy(a_id).orderBy(
        F.col("dist2").desc(), F.col("query_id")
    )
    return (
        nn.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            a_id,
            F.col("query_id").alias("witness_query"),
            F.col("point_id").alias("witness_point"),
            F.col("dist2").alias("hausdorff_chord2"),
        )
    )


def chain_interpolate(
    polylines: DataFrame,
    fraction_col: str = "fraction",
    line_id: str = "line_id",
    vertices_col: str = "vertices",
    emit_seg: bool = False,
) -> DataFrame:
    """Point at a normalized distance along each polyline.

    polylines: (line_id, vertices array<array<double>> [lat, lon] pairs,
    fraction in [0,1]). Returns (line_id, lat, lon) — plus, with
    emit_seg, the index of the segment the target falls in (an exact
    integer an oracle can re-derive from cumulative arc lengths). Arc
    lengths and the spherical interpolation (slerp) run vectorized per
    row batch.
    """
    out_schema = f"{line_id} long, lat double, lon double"
    if emit_seg:
        out_schema += ", seg_idx int"

    def run(batches):
        for pdf in batches:
            ids, lats, lons, segs = [], [], [], []
            for _, row in pdf.iterrows():
                # Arrow hands nested lists as object arrays — stack explicitly
                verts = np.stack(
                    [np.asarray(p, dtype=np.float64) for p in row[vertices_col]]
                )
                frac = float(row[fraction_col])
                xyz = np.stack(
                    sc.latlng_degrees_to_xyz(verts[:, 0], verts[:, 1]), axis=1
                )
                # arc lengths between consecutive vertices
                dots = np.clip((xyz[:-1] * xyz[1:]).sum(1), -1.0, 1.0)
                seg = np.arccos(dots)
                cum = np.concatenate([[0.0], np.cumsum(seg)])
                target = frac * cum[-1]
                k = int(np.searchsorted(cum, target, side="right") - 1)
                k = min(max(k, 0), len(seg) - 1)
                t = 0.0 if seg[k] == 0 else (target - cum[k]) / seg[k]
                # slerp between xyz[k] and xyz[k+1]
                w = seg[k]
                if w == 0:
                    p = xyz[k]
                else:
                    p = (
                        np.sin((1 - t) * w) * xyz[k] + np.sin(t * w) * xyz[k + 1]
                    ) / np.sin(w)
                p /= np.linalg.norm(p)
                la, lo = sc.xyz_to_latlng_degrees(
                    np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
                )
                ids.append(row[line_id])
                lats.append(float(la[0]))
                lons.append(float(lo[0]))
                segs.append(k)
            out = {line_id: ids, "lat": lats, "lon": lons}
            if emit_seg:
                out["seg_idx"] = pd.array(segs, dtype="int32")
            yield pd.DataFrame(out)

    return polylines.mapInPandas(run, schema=out_schema)


def convex_hull(
    points: DataFrame, group_col: str = "group_id", id_col: str | None = None
) -> DataFrame:
    """Spherical convex hull per group (Graham-scan with the robust Sign
    orientation predicate). Input (group_id, lat, lon); output
    (group_id, hull_idx, lat, lon) — hull vertices in CCW order. With
    id_col, the input point id rides along so hull membership can be
    checked on exact integers (duplicate positions keep the smallest id).

    Per-group applyInPandas; groups are assumed to fit in one cap smaller
    than a hemisphere (the reference's precondition for a unique hull).
    """
    out_schema = f"{group_col} long, hull_idx int, lat double, lon double"
    if id_col:
        out_schema += f", {id_col} long"

    def per_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if id_col:
            pdf = pdf.sort_values(id_col)
        lat = pdf["lat"].to_numpy()
        lon = pdf["lon"].to_numpy()
        x, y, z = sc.latlng_degrees_to_xyz(lat, lon)
        stacked = np.stack([x, y, z], axis=1)
        pids = None
        if id_col:
            pts, first = np.unique(stacked, axis=0, return_index=True)
            pids = pdf[id_col].to_numpy()[first]
        else:
            pts = np.unique(stacked, axis=0)
        if pts.shape[0] < 3:
            hull = list(range(pts.shape[0]))
        else:
            # Graham scan around the centroid direction: sort by angle in
            # the tangent frame, keep left turns (Sign > 0)
            c = pts.mean(axis=0)
            c /= np.linalg.norm(c)
            u = pred.ortho(c)
            v = np.cross(c, u)
            ang = np.arctan2(pts @ v, pts @ u)
            order = np.argsort(ang, kind="stable")
            sorted_pts = pts[order]
            if pids is not None:
                pids = pids[order]
            hull_pts: list[int] = []
            for idx in range(sorted_pts.shape[0]):
                while len(hull_pts) >= 2 and (
                    pred.sign(
                        tuple(sorted_pts[hull_pts[-2]]),
                        tuple(sorted_pts[hull_pts[-1]]),
                        tuple(sorted_pts[idx]),
                    )
                    <= 0
                ):
                    hull_pts.pop()
                hull_pts.append(idx)
            # close the scan: wrap-around pruning
            changed = True
            while changed and len(hull_pts) > 2:
                changed = False
                if (
                    pred.sign(
                        tuple(sorted_pts[hull_pts[-2]]),
                        tuple(sorted_pts[hull_pts[-1]]),
                        tuple(sorted_pts[hull_pts[0]]),
                    )
                    <= 0
                ):
                    hull_pts.pop()
                    changed = True
                elif (
                    pred.sign(
                        tuple(sorted_pts[hull_pts[-1]]),
                        tuple(sorted_pts[hull_pts[0]]),
                        tuple(sorted_pts[hull_pts[1]]),
                    )
                    <= 0
                ):
                    hull_pts.pop(0)
                    changed = True
            hull = hull_pts
            pts = sorted_pts
        hx = pts[hull]
        la, lo = sc.xyz_to_latlng_degrees(hx[:, 0], hx[:, 1], hx[:, 2])
        out = {
            group_col: [key[0]] * len(hull),
            "hull_idx": np.arange(len(hull), dtype=np.int32),
            "lat": la,
            "lon": lo,
        }
        if pids is not None:
            out[id_col] = pids[hull]
        return pd.DataFrame(out)

    return points.groupBy(group_col).applyInPandas(per_group, schema=out_schema)


def polyline_medoid(
    lines: DataFrame,
    group_col: str = "group_id",
    line_col: str = "line_id",
    verts_col: str = "verts",
    approx: bool = True,
    cost_quantum: float | None = None,
) -> DataFrame:
    """Medoid polyline per group (GetMedoidPolyline,
    src/s2/s2polyline_alignment.h:83-87): input one row per polyline with
    `verts` = array of [lat, lon] pairs; output (group_id, medoid_line_id,
    total_cost) where total_cost is the medoid's summed alignment cost to
    the rest of its group. approx=True uses the FastDTW path (the
    reference's MedoidOptions default). applyInPandas per group — the
    pairwise O(N^2) cost matrix stays inside one task per group while
    groups spread across executors."""
    from s2geo_spark.kernel import polyline as poly_k

    out_schema = f"{group_col} long, medoid_line_id long, total_cost double"

    def per_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(line_col)
        xs = [_verts_to_xyz(v) for v in pdf[verts_col]]
        med, costs = poly_k.medoid_polyline(
            xs, approx=approx, cost_quantum=cost_quantum, return_costs=True
        )
        total = costs[med]
        return pd.DataFrame(
            {
                group_col: [key[0]],
                "medoid_line_id": [int(pdf[line_col].iloc[med])],
                "total_cost": [float(total)],
            }
        )

    return lines.groupBy(group_col).applyInPandas(per_group, out_schema)


def polyline_consensus(
    lines: DataFrame,
    group_col: str = "group_id",
    line_col: str = "line_id",
    verts_col: str = "verts",
    approx: bool = True,
    seed_medoid: bool = False,
    iteration_cap: int = 5,
) -> DataFrame:
    """DBA consensus polyline per group (GetConsensusPolyline,
    src/s2/s2polyline_alignment.h:190-230): output (group_id, vertex_idx,
    lat, lon) — the consensus keeps the seed line's vertex count (the
    group's first line by line_id, or the medoid with seed_medoid)."""
    from s2geo_spark.kernel import polyline as poly_k

    out_schema = f"{group_col} long, vertex_idx int, lat double, lon double"

    def per_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(line_col)
        xs = [_verts_to_xyz(v) for v in pdf[verts_col]]
        cons = poly_k.consensus_polyline(
            xs,
            approx=approx,
            seed_medoid=seed_medoid,
            iteration_cap=iteration_cap,
        )
        lat = np.degrees(np.arcsin(np.clip(cons[:, 2], -1, 1)))
        lon = np.degrees(np.arctan2(cons[:, 1], cons[:, 0]))
        return pd.DataFrame(
            {
                group_col: key[0],
                "vertex_idx": np.arange(len(cons), dtype=np.int32),
                "lat": lat,
                "lon": lon,
            }
        )

    return lines.groupBy(group_col).applyInPandas(per_group, out_schema)


def _verts_to_xyz(verts) -> np.ndarray:
    v = np.stack([np.asarray(p, dtype=np.float64) for p in verts])
    x, y, z = sc.latlng_degrees_to_xyz(v[:, 0], v[:, 1])
    return np.stack([x, y, z], axis=1)
