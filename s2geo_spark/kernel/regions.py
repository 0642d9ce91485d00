"""Region types (cap, lat/lng rect, spherical loop/polygon) with the
vectorized cell predicates the coverer needs.

Each region implements:
  contains_points(px, py, pz) -> bool[n]      exact point membership (float)
  contains_cells(cell_ids)    -> bool[n]      region fully contains cell
  may_intersect_cells(cell_ids) -> bool[n]    region possibly intersects cell
  cell_union_bound()          -> uint64[...]  coarse covering seed

Semantics anchors:
  * S2Cap cell tests: src/s2/s2cap.cc:224-300
  * S2Cap::GetCellUnionBound: src/s2/s2cap.cc:201-222
  * S2Loop point containment (crossing parity from S2::Origin):
    src/s2/s2loop.cc:549-599, origin constant src/s2/s2pointutil.h:98-115
  * Loop cell tests for covering: edge-vs-cell intersection + center parity
    (the logic MutableS2ShapeIndex encodes per clipped cell,
    src/s2/s2shape_index.h / s2loop.cc:479-519)
"""

from __future__ import annotations

import numpy as np

from . import cellid_v1 as v1
from . import cells as cl
from . import metrics
from . import s2coords as sc

# S2::Origin() — fixed interior-test origin (s2pointutil.h:98-115)
ORIGIN = np.array(
    [-0.0099994664350250197, 0.0025924542609324121, 0.99994664350250195]
)

_FACE_IDS = np.array([(2 * f + 1) << 60 for f in range(6)], dtype=np.uint64)


def latlng_to_unit(lat_deg, lon_deg):
    x, y, z = sc.latlng_degrees_to_xyz(lat_deg, lon_deg)
    return np.stack(np.broadcast_arrays(x, y, z), axis=-1)


class Cap:
    """Spherical cap: center unit vector + chord-angle-squared radius
    (S1ChordAngle length2, monotone in angle; src/s2/s2cap.h:62-77)."""

    def __init__(self, center: np.ndarray, length2: float):
        self.center = np.asarray(center, dtype=np.float64)
        self.length2 = float(length2)

    @classmethod
    def from_latlng_radius_degrees(cls, lat, lon, radius_deg):
        c = latlng_to_unit(np.float64(lat), np.float64(lon))
        r = np.radians(radius_deg)
        # chord^2 = (2*sin(r/2))^2
        return cls(c, float(4.0 * np.sin(0.5 * r) ** 2))

    @property
    def radius_radians(self) -> float:
        return float(2.0 * np.arcsin(0.5 * np.sqrt(min(self.length2, 4.0))))

    def contains_points(self, px, py, pz):
        d2 = (px - self.center[0]) ** 2 + (py - self.center[1]) ** 2 + (
            pz - self.center[2]
        ) ** 2
        return d2 <= self.length2

    def _sin2_angle(self) -> float:
        # sin^2(theta) from chord^2: r2 * (1 - r2/4)
        return self.length2 * (1.0 - self.length2 / 4.0)

    def _intersects(self, cell_ids, verts, vert_inside_any):
        """S2Cap::Intersects(cell, vertices) (s2cap.cc:224-268): true iff the
        cap intersects the cell excluding vertices (assumed already checked).
        """
        n = cell_ids.shape[0]
        out = np.zeros(n, dtype=bool)
        if self.length2 >= 2.0:  # hemisphere or larger: convex complement
            return out
        if self.length2 < 0:
            return out
        cx, cy, cz = self.center
        # cell contains cap center?
        center_in = cl.contains_points(
            cell_ids, np.full(n, cx), np.full(n, cy), np.full(n, cz)
        )
        out |= center_in
        todo = ~out
        if not todo.any():
            return out
        sin2 = self._sin2_angle()
        normals = cl.edge_normals_raw(cell_ids)  # (n,4,3)
        dots = normals @ self.center  # (n,4)
        norm2 = (normals * normals).sum(axis=2)
        # For edges with dot <= 0: if dot^2 > sin2*|edge|^2 the whole cap is
        # on the exterior side -> cannot intersect through this edge path.
        exterior = (dots <= 0) & (dots * dots > sin2 * norm2)
        dead = exterior.any(axis=1)
        # closest-approach within segment: dir = edge x center,
        # dir . v[k] < 0 and dir . v[k+1] > 0
        dirs = np.cross(normals, self.center[None, None, :])  # (n,4,3)
        d_k = (dirs * verts).sum(axis=2)  # dir_k . v_k
        v_next = verts[:, [1, 2, 3, 0], :]
        d_k1 = (dirs * v_next).sum(axis=2)
        hits = (dots <= 0) & (d_k < 0) & (d_k1 > 0) & ~exterior
        out |= todo & ~dead & hits.any(axis=1)
        return out

    def contains_cells(self, cell_ids):
        """S2Cap::Contains(cell) (s2cap.cc:270-286): all 4 vertices inside
        and the complement cap does not intersect the cell."""
        cell_ids = np.asarray(cell_ids, dtype=np.uint64)
        verts = cl.vertices(cell_ids)
        d2 = ((verts - self.center[None, None, :]) ** 2).sum(axis=2)
        all_in = (d2 <= self.length2).all(axis=1)
        comp = Cap(-self.center, 4.0 - self.length2)
        comp_hits = comp._intersects(cell_ids, verts, None)
        return all_in & ~comp_hits

    def may_intersect_cells(self, cell_ids):
        """S2Cap::MayIntersect(cell) (s2cap.cc:288-296)."""
        cell_ids = np.asarray(cell_ids, dtype=np.uint64)
        verts = cl.vertices(cell_ids)
        d2 = ((verts - self.center[None, None, :]) ** 2).sum(axis=2)
        any_vertex = (d2 <= self.length2).any(axis=1)
        return any_vertex | self._intersects(cell_ids, verts, any_vertex)

    def cell_union_bound(self):
        """<=4 vertex neighbors of the center cell, or the 6 faces
        (S2Cap::GetCellUnionBound, s2cap.cc:201-222)."""
        lvl = int(
            metrics.level_for_min_value(
                metrics.MIN_WIDTH_DERIV, np.array([self.radius_radians])
            )[0]
        ) - 1
        if self.radius_radians >= metrics.metric_value(metrics.MIN_WIDTH_DERIV, 0):
            lvl = -1
        if lvl < 0:
            return _FACE_IDS.copy()
        center_cell = v1.from_point(
            np.array([self.center[0]]),
            np.array([self.center[1]]),
            np.array([self.center[2]]),
        )
        ids, valid = v1.append_vertex_neighbors(center_cell, lvl)
        return ids[valid]

    def get_rect_bound(self) -> "LatLngRect":
        """Tight lat/lng bounding rectangle (S2Cap::GetRectBound,
        s2cap.cc:162-199): lat span = center_lat +- radius clamped to the
        poles; lng full when a pole is inside, else center_lng +-
        asin(sin(radius) / cos(center_lat))."""
        if self.length2 < 0:
            return LatLngRect(1.0, -1.0, 180.0, -180.0)  # empty
        clat, clng = sc.xyz_to_latlng_degrees(
            np.array([self.center[0]]),
            np.array([self.center[1]]),
            np.array([self.center[2]]),
        )
        clat, clng = float(clat[0]), float(clng[0])
        r_deg = np.degrees(self.radius_radians)
        lat_lo = clat - r_deg
        lat_hi = clat + r_deg
        if lat_lo <= -90.0 or lat_hi >= 90.0:
            return LatLngRect(max(lat_lo, -90.0), min(lat_hi, 90.0), -180.0, 180.0)
        sin_a = np.sin(self.radius_radians)
        cos_lat = np.cos(np.radians(clat))
        if sin_a >= cos_lat:
            return LatLngRect(lat_lo, lat_hi, -180.0, 180.0)
        dlng = np.degrees(np.arcsin(sin_a / cos_lat))
        lo = ((clng - dlng + 180.0) % 360.0) - 180.0
        hi = ((clng + dlng + 180.0) % 360.0) - 180.0
        return LatLngRect(lat_lo, lat_hi, lo, hi)


class LatLngRect:
    """Latitude/longitude rectangle (S2LatLngRect, src/s2/s2latlng_rect.h).

    lat/lng in degrees; lng interval may wrap (lo > hi means crossing the
    antimeridian). Cell predicates are conservative (vertex/bound based):
    exact enough for coverings (supersets) and interior fast paths.
    """

    def __init__(self, lat_lo, lat_hi, lng_lo, lng_hi):
        self.lat_lo, self.lat_hi = float(lat_lo), float(lat_hi)
        self.lng_lo, self.lng_hi = float(lng_lo), float(lng_hi)

    def _lng_contains(self, lng):
        if self.lng_lo <= self.lng_hi:
            return (lng >= self.lng_lo) & (lng <= self.lng_hi)
        return (lng >= self.lng_lo) | (lng <= self.lng_hi)

    def is_empty(self) -> bool:
        return self.lat_lo > self.lat_hi

    def expanded(self, margin_lat_deg: float, margin_lng_deg: float) -> "LatLngRect":
        """S2LatLngRect::Expanded (s2latlng_rect.cc:150-170): grow both
        intervals; the lng interval becomes full when the margin pushes it
        past a half-circle, and an empty rect stays empty."""
        if self.is_empty():
            return LatLngRect(1.0, -1.0, 180.0, -180.0)
        lat_lo = max(self.lat_lo - margin_lat_deg, -90.0)
        lat_hi = min(self.lat_hi + margin_lat_deg, 90.0)
        width = (
            self.lng_hi - self.lng_lo
            if self.lng_lo <= self.lng_hi
            else 360.0 - (self.lng_lo - self.lng_hi)
        )
        if width + 2.0 * margin_lng_deg >= 360.0 - 1e-12:
            return LatLngRect(lat_lo, lat_hi, -180.0, 180.0)
        lo = ((self.lng_lo - margin_lng_deg + 180.0) % 360.0) - 180.0
        hi = ((self.lng_hi + margin_lng_deg + 180.0) % 360.0) - 180.0
        return LatLngRect(lat_lo, lat_hi, lo, hi)

    def get_distance_degrees(self, lat, lng) -> np.ndarray:
        """Approximate surface distance (degrees) from points to the rect
        (S2LatLngRect::GetDistance semantics, s2latlng_rect.cc:400-460):
        0 inside; else the lat excess and the lng excess scaled by
        cos(closest latitude) combined as a right-angle bound. Exact for
        pure-lat or pure-lng offsets; conservative-to-~1% for corners."""
        lat = np.asarray(lat, dtype=np.float64)
        lng = np.asarray(lng, dtype=np.float64)
        dlat = np.maximum(np.maximum(self.lat_lo - lat, lat - self.lat_hi), 0.0)
        inside_lng = self._lng_contains(lng)
        d_lo = np.abs(((lng - self.lng_lo) + 180.0) % 360.0 - 180.0)
        d_hi = np.abs(((lng - self.lng_hi) + 180.0) % 360.0 - 180.0)
        dlng = np.where(inside_lng, 0.0, np.minimum(d_lo, d_hi))
        clamp_lat = np.clip(lat, self.lat_lo, self.lat_hi)
        return np.hypot(dlat, dlng * np.cos(np.radians(clamp_lat)))

    def contains_points(self, px, py, pz):
        lat, lng = sc.xyz_to_latlng_degrees(px, py, pz)
        return (
            (lat >= self.lat_lo)
            & (lat <= self.lat_hi)
            & self._lng_contains(lng)
        )

    def _vertex_hits(self, cell_ids):
        verts = cl.vertices(np.asarray(cell_ids, dtype=np.uint64))
        hits = np.zeros((verts.shape[0], 4), dtype=bool)
        for k in range(4):
            hits[:, k] = self.contains_points(
                verts[:, k, 0], verts[:, k, 1], verts[:, k, 2]
            )
        return hits

    def contains_cells(self, cell_ids):
        # conservative: all vertices + center in rect and the cell spans
        # less than the rect's width (cells are small vs rect or not at all)
        hits = self._vertex_hits(cell_ids)
        cx, cy, cz = v1.to_point(np.asarray(cell_ids, dtype=np.uint64))
        return hits.all(axis=1) & self.contains_points(cx, cy, cz)

    def may_intersect_cells(self, cell_ids):
        cell_ids = np.asarray(cell_ids, dtype=np.uint64)
        hits = self._vertex_hits(cell_ids)
        any_v = hits.any(axis=1)
        # also: rect corners inside cell (rect smaller than the cell)
        corners = [
            (self.lat_lo, self.lng_lo),
            (self.lat_lo, self.lng_hi),
            (self.lat_hi, self.lng_lo),
            (self.lat_hi, self.lng_hi),
            (0.5 * (self.lat_lo + self.lat_hi), 0.5 * (self.lng_lo + self.lng_hi)),
        ]
        n = cell_ids.shape[0]
        for la, lo in corners:
            p = latlng_to_unit(la, lo)
            any_v |= cl.contains_points(
                cell_ids, np.full(n, p[0]), np.full(n, p[1]), np.full(n, p[2])
            )
        return any_v

    def cell_union_bound(self):
        # seed from the bounding cap of the rect (center + max corner dist)
        mid = latlng_to_unit(
            0.5 * (self.lat_lo + self.lat_hi),
            self.lng_lo
            + 0.5 * (((self.lng_hi - self.lng_lo) % 360.0) or 360.0),
        )
        corners = np.array(
            [
                latlng_to_unit(self.lat_lo, self.lng_lo),
                latlng_to_unit(self.lat_lo, self.lng_hi),
                latlng_to_unit(self.lat_hi, self.lng_lo),
                latlng_to_unit(self.lat_hi, self.lng_hi),
            ]
        )
        d2 = ((corners - mid[None, :]) ** 2).sum(axis=1).max()
        return Cap(mid, float(d2)).cell_union_bound()


class RegionUnion:
    """Union-of-regions adapter for the coverer (S2RegionUnion,
    src/s2/s2region_union.cc): predicates compose as any()."""

    def __init__(self, regions_list):
        self.regions = list(regions_list)

    def contains_points(self, px, py, pz):
        out = np.zeros(np.asarray(px).shape[0], dtype=bool)
        for r in self.regions:
            out |= r.contains_points(px, py, pz)
        return out

    def may_intersect_cells(self, cell_ids):
        out = np.zeros(np.asarray(cell_ids).shape[0], dtype=bool)
        for r in self.regions:
            out |= r.may_intersect_cells(cell_ids)
        return out

    def contains_cells(self, cell_ids):
        out = np.zeros(np.asarray(cell_ids).shape[0], dtype=bool)
        for r in self.regions:
            out |= r.contains_cells(cell_ids)
        return out

    def cell_union_bound(self):
        from . import cellunion

        seeds = np.concatenate([r.cell_union_bound() for r in self.regions])
        return cellunion.normalize(seeds)


class RegionIntersection:
    """Intersection-of-regions adapter (S2RegionIntersection,
    src/s2/s2region_intersection.cc): may-intersect composes as all()
    (conservative), contains as all()."""

    def __init__(self, regions_list):
        self.regions = list(regions_list)

    def contains_points(self, px, py, pz):
        out = np.ones(np.asarray(px).shape[0], dtype=bool)
        for r in self.regions:
            out &= r.contains_points(px, py, pz)
        return out

    def may_intersect_cells(self, cell_ids):
        out = np.ones(np.asarray(cell_ids).shape[0], dtype=bool)
        for r in self.regions:
            out &= r.may_intersect_cells(cell_ids)
        return out

    def contains_cells(self, cell_ids):
        out = np.ones(np.asarray(cell_ids).shape[0], dtype=bool)
        for r in self.regions:
            out &= r.contains_cells(cell_ids)
        return out

    def cell_union_bound(self):
        # bound of any single member bounds the intersection; pick the
        # smallest seed set
        bounds = [r.cell_union_bound() for r in self.regions]
        return min(bounds, key=lambda b: len(b))
