"""Standalone encode-kernel microbench: from_latlng at 10M points,
single core, best-of-N (this host has bursty CPU steal — single runs vary
4x; see BENCH/BASELINE.md). Prints one JSON line.

Reference anchor: S2CellId::FromLatLng ~0.108 us/op per core (C++,
s2coords.h:270-275 pipeline); BASELINE.md targets <=5x => 0.55 us/op.
"""

import json
import time

import numpy as np

from s2geo_spark.kernel import cellid_v1 as v1
from s2geo_spark.kernel import s2coords as sc


def main(n: int = 10_000_000, reps: int = 5) -> dict:
    rng = np.random.default_rng(1)
    lat = rng.uniform(-89, 89, n)
    lon = rng.uniform(-180, 180, n)
    v1.from_latlng(lat[:1000], lon[:1000])  # warm

    def best(f):
        t = 1e9
        r = None
        for _ in range(reps):
            t0 = time.perf_counter()
            r = f()
            t1 = time.perf_counter()
            t = min(t, t1 - t0)
        return t / n * 1e6, r

    t_xyz, (x, y, z) = best(lambda: sc.latlng_degrees_to_xyz(lat, lon))
    t_fuv, (face, u, v) = best(lambda: sc.xyz_to_face_uv(x, y, z))
    t_ij, (i, j) = best(
        lambda: (sc.st_to_ij(sc.uv_to_st(u)), sc.st_to_ij(sc.uv_to_st(v)))
    )
    t_hil, _ = best(lambda: v1.from_face_ij(face, i, j))
    t_tot, _ = best(lambda: v1.from_latlng(lat, lon))
    return {
        "metric": "encode_us_per_op",
        "value": round(t_tot, 4),
        "unit": "us/op",
        "n": n,
        "reps": reps,
        "stages": {
            "latlng_to_xyz": round(t_xyz, 4),
            "xyz_to_face_uv": round(t_fuv, 4),
            "uv_to_ij": round(t_ij, 4),
            "hilbert": round(t_hil, 4),
        },
        "reference_us_per_op": 0.108,
        "ratio": round(t_tot / 0.108, 2),
    }


if __name__ == "__main__":
    print(json.dumps(main()))
