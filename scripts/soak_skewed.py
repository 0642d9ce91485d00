#!/usr/bin/env python3
"""10^8-row SKEWED soak of the flagship spatial core (VERDICT r2 next-#10).

Synthesizes a deterministic skewed point table entirely in Catalyst (no
Python, no files): 60% of rows cluster in 8 "hot cities" (three of them
inside fixture polygons — dense-urban-tile join skew, the north_rule
case), 40% spread world-wide (mostly ocean, joining nothing). Runs the
flagship shape — (face,i,j) Catalyst encode -> quad-term explode -> hash
join vs the shape index -> rebalanced exact-PIP residual -> Hilbert encode
of survivors -> level-10 tile rollup — at two parallelism levels in fresh
JVMs, and reports:

  * wall time + rows/sec at each parallelism (best of `--runs`)
  * raw N->4N scaling efficiency and the ceiling-normalized figure
    (the pure-JVM hash-agg ceiling measures what THIS host's CPU steal
    allows ideal code — memory notes: identical runs vary 4x here)
  * joined-row counts, which MUST be identical across parallelism

Usage:
  python scripts/soak_skewed.py                 # 1e8 rows, local[8] + local[32]
  python scripts/soak_skewed.py --rows 1e7      # quicker smoke
  python scripts/soak_skewed.py --inner 8       # (internal) one measured run
Appends a result block to BENCH/BASELINE.md unless --no-log.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HOT_CITIES = [
    # (lat, lon, weight) — first three inside fixture polygons 1/3/2
    (40.7, -74.0, 0.15),   # in polygon 1 (North-America box)
    (48.9, 2.3, 0.15),     # in polygon 3 (Europe box)
    (-33.9, 151.2, 0.10),  # in polygon 2 (Australia box)
    (35.7, 139.7, 0.05),   # Tokyo (outside every fixture polygon)
    (19.4, -99.1, 0.05),
    (-23.5, -46.6, 0.04),
    (51.5, -0.1, 0.03),
    (28.6, 77.2, 0.03),
]


def skewed_points(spark, n_rows: int):
    """Deterministic skewed points from spark.range — pure Catalyst.

    xxhash64(id) drives the branch + offsets, so the table is bit-identical
    at ANY parallelism (row ids are deterministic)."""
    from pyspark.sql import functions as F

    df = spark.range(n_rows).select(F.col("id").alias("point_id"))
    u1 = (F.xxhash64("point_id", F.lit(1)).cast("double") / 9.223372036854776e18 + 1.0) / 2.0
    u2 = (F.xxhash64("point_id", F.lit(2)).cast("double") / 9.223372036854776e18 + 1.0) / 2.0
    u3 = (F.xxhash64("point_id", F.lit(3)).cast("double") / 9.223372036854776e18 + 1.0) / 2.0
    lat = F.lit(None).cast("double")
    lon = F.lit(None).cast("double")
    # world-wide background (40%)
    bg_lat = F.degrees(F.asin(u2 * 2.0 - 1.0))
    bg_lon = u3 * 360.0 - 180.0
    lat, lon = bg_lat, bg_lon
    acc = 0.0
    for clat, clon, w in reversed(HOT_CITIES):
        acc += w
        # city cluster: +-0.25 deg box around the center (hot level-10 tiles)
        cl_lat = F.lit(clat) + (u2 - 0.5) * 0.5
        cl_lon = F.lit(clon) + (u3 - 0.5) * 0.5
        lat = F.when(u1 < acc, cl_lat).otherwise(lat)
        lon = F.when(u1 < acc, cl_lon).otherwise(lon)
    return df.select("point_id", lat.alias("lat"), lon.alias("lon"))


def run_inner(cpus: int, n_rows: int) -> dict:
    """One fresh-JVM measured run; prints a JSON line."""
    os.environ.setdefault("SPARK_GRAFT_MEM", "40g")
    from bench import make_spark
    from pyspark.sql import functions as F

    from s2geo_spark import contract
    from s2geo_spark import functions as sfn
    from s2geo_spark.operators import spatial
    from s2geo_spark.sources import fixtures as fx

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    idx = contract._pip_index(spark)
    # warmup: codegen + python worker pool on a small slice
    pts_w = skewed_points(spark, 200_000)
    spatial.contains_join_indexed(pts_w, idx, emit_cell=True).write.format(
        "noop"
    ).mode("overwrite").save()

    pts = skewed_points(spark, n_rows)
    t0 = time.perf_counter()
    joined = spatial.contains_join_indexed(pts, idx, emit_cell=True)
    tiles = (
        joined.withColumn("tile", sfn.tile_assign("cell", fx.TILE_LEVEL))
        .groupBy("polygon_id", "tile")
        .agg(F.count("*").alias("n"))
    )
    row = tiles.agg(
        F.sum("n").alias("joined"), F.count("*").alias("tiles")
    ).collect()[0]
    sec = time.perf_counter() - t0
    out = {
        "cpus": cpus,
        "rows": n_rows,
        "sec": round(sec, 3),
        "rows_per_sec": round(n_rows / sec, 1),
        "joined": int(row["joined"] or 0),
        "tiles": int(row["tiles"] or 0),
    }
    print("SOAK_JSON " + json.dumps(out))
    return out


def fresh_run(cpus: int, n_rows: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--inner", str(cpus),
         "--rows", str(n_rows)],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    for line in p.stdout.splitlines():
        if line.startswith("SOAK_JSON "):
            return json.loads(line[len("SOAK_JSON "):])
    raise RuntimeError(f"inner run failed (rc={p.returncode}):\n{p.stderr[-3000:]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=float, default=1e8)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--inner", type=int, default=0)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--no-log", action="store_true")
    args = ap.parse_args()
    n_rows = int(args.rows)
    if args.inner:
        run_inner(args.inner, n_rows)
        return

    results = {}
    for cpus in (args.lo, args.hi):
        best = None
        for _ in range(args.runs):
            r = fresh_run(cpus, n_rows)
            if best is None or r["sec"] < best["sec"]:
                best = r
        results[cpus] = best
        print(f"local[{cpus}]: {best['sec']}s  {best['rows_per_sec']:.0f} rows/s "
              f"joined={best['joined']}")

    lo, hi = results[args.lo], results[args.hi]
    assert lo["joined"] == hi["joined"], (
        f"joined rows differ across parallelism: {lo['joined']} vs {hi['joined']}"
    )
    assert lo["tiles"] == hi["tiles"]
    raw_eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / (args.hi / args.lo)

    # host ceiling: pure-JVM hash-agg at both sizes (what ideal code gets)
    from bench import _jvm_ceiling

    c_lo = _jvm_ceiling(args.lo)
    c_hi = _jvm_ceiling(args.hi)
    ceil_eff = (c_hi / c_lo) / (args.hi / args.lo)
    norm_eff = raw_eff / ceil_eff if ceil_eff else float("nan")

    summary = {
        "rows": n_rows,
        "hot_city_fraction": 0.6,
        "lo": lo,
        "hi": hi,
        "raw_scaling_eff": round(raw_eff, 3),
        "jvm_ceiling_eff": round(ceil_eff, 3),
        "normalized_eff": round(min(norm_eff, 9.99), 3),
        "joined_identical": True,
    }
    print(json.dumps(summary))
    if not args.no_log:
        import datetime

        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(
                f"\n### Skewed soak ({n_rows:.0e} rows, 60% hot-city skew) — "
                f"{datetime.datetime.now(datetime.UTC).isoformat(timespec='seconds')}\n\n"
                f"| cores | sec | rows/s | joined |\n|---|---|---|---|\n"
                f"| {args.lo} | {lo['sec']} | {lo['rows_per_sec']:.0f} | {lo['joined']} |\n"
                f"| {args.hi} | {hi['sec']} | {hi['rows_per_sec']:.0f} | {hi['joined']} |\n\n"
                f"raw {args.lo}->{args.hi} efficiency **{raw_eff:.3f}**; "
                f"pure-JVM host ceiling {ceil_eff:.3f}; "
                f"ceiling-normalized **{norm_eff:.3f}**. "
                f"Joined rows identical across parallelism: "
                f"{lo['joined']} (= {hi['joined']}).\n"
            )


if __name__ == "__main__":
    main()
