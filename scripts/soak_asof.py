#!/usr/bin/env python3
"""Sort/window-bound scaling soak: the as-of join at two parallelisms.

BENCH/BASELINE.md already carries map-bound (pages pipeline) and
shuffle-bound (PageRank) N->4N windows; the as-of join exercises the
third regime — one hash shuffle followed by a per-key SORT plus a
running-window scan (operators/temporal.asof_join's union+running-last
construction).  Sorting is the dominant cost, so this evidences the
north_rule two-parallelism criterion on the sort-bound path.

Input: ``--rows`` synthetic events from ``spark.range`` (no files); every
column is an xxhash64 of the row id, so the input — and, because the
as-of result is a pure function of the input, the output — is
bit-identical at any parallelism.  20% of rows are the left stream
("purchases"), 80% the right ("clicks"); keys are id-hash mod
(rows/1000), i.e. ~1k events/key — deep enough per-key history that the
window sort, not task scheduling, is what's measured.

Correctness across parallelism: (n, matched, bit_xor) checksum of the
joined output asserted equal between local[N] and local[4N].

Usage:
  python scripts/soak_asof.py                 # 64M rows, local[8]+[32]
  python scripts/soak_asof.py --rows 1e6      # smoke
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


def synth_streams(spark, n_rows: int):
    """Deterministic purchase/click streams from spark.range: all columns
    are xxhash64(id) derivations, bit-identical at any parallelism."""
    from pyspark.sql import functions as F

    n_keys = max(1, n_rows // 1000)
    span_us = 30 * 24 * 3600 * 1_000_000  # 30 days of microseconds
    ev = spark.range(n_rows).select(
        F.col("id"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n_keys))
        .cast("long").alias("key"),
        F.timestamp_micros(
            F.pmod(F.xxhash64("id", F.lit(5)), F.lit(span_us))
        ).alias("ts"),
    )
    left = ev.where(F.col("id") % 5 == 0)
    right = ev.where(F.col("id") % 5 != 0).select(
        F.col("id").alias("rid"), "key", "ts"
    )
    return left, right


def run_inner(cpus: int, n_rows: int) -> dict:
    os.environ.setdefault("SPARK_GRAFT_MEM", "40g")
    from bench import _steal_pct, _steal_snapshot, make_spark
    from pyspark.sql import functions as F

    from s2geo_spark.operators.temporal import asof_join

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def joined(n):
        left, right = synth_streams(spark, n)
        return asof_join(
            left, right, on=["key"], right_cols=["rid"], tie_col="rid"
        )

    def checksum(df):
        return df.agg(
            F.count("*").alias("n"),
            F.count("rid").alias("m"),
            F.expr("bit_xor(xxhash64(id, coalesce(rid, -1)))").alias("x"),
        ).collect()[0]

    # warmup: codegen + python-worker forks + shuffle machinery
    checksum(joined(100_000))

    s0 = _steal_snapshot()
    t0 = time.perf_counter()
    row = checksum(joined(n_rows))
    sec = time.perf_counter() - t0
    out = {
        "cpus": cpus,
        "rows": n_rows,
        "sec": round(sec, 3),
        "rows_per_sec": round(n_rows / sec, 1),
        "checksum": [int(row["n"]), int(row["m"]), int(row["x"])],
        "steal_pct": _steal_pct(s0, _steal_snapshot()),
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
    raise RuntimeError(
        f"inner run failed (rc={p.returncode}):\n{p.stderr[-3000:]}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=float, default=64e6)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--inner", type=int, default=0)
    ap.add_argument("--no-log", action="store_true")
    args = ap.parse_args()
    n_rows = int(args.rows)

    if args.inner:
        run_inner(args.inner, n_rows)
        return

    lo_runs = [fresh_run(args.lo, n_rows) for _ in range(args.runs)]
    hi_runs = [fresh_run(args.hi, n_rows) for _ in range(args.runs)]
    lo = min(lo_runs, key=lambda r: r["sec"])
    hi = min(hi_runs, key=lambda r: r["sec"])
    assert lo["checksum"] == hi["checksum"], (
        "as-of output differs across parallelism!", lo, hi)

    from bench import _jvm_ceiling
    c_lo, st_lo = _jvm_ceiling(args.lo)
    c_hi, st_hi = _jvm_ceiling(args.hi)
    ceil_eff = (c_lo / c_hi) / (args.hi / args.lo)
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / (args.hi / args.lo)
    norm = eff / ceil_eff if ceil_eff > 0 else float("nan")
    res = {
        "scaling_efficiency": round(eff, 3),
        "host_ceiling": round(ceil_eff, 3),
        "normalized": round(norm, 3),
        "lo": lo, "hi": hi,
        "lo_runs": [r["sec"] for r in lo_runs],
        "hi_runs": [r["sec"] for r in hi_runs],
        "lo_steals": [r["steal_pct"] for r in lo_runs],
        "hi_steals": [r["steal_pct"] for r in hi_runs],
    }
    print(json.dumps(res))
    if not args.no_log:
        stamp = time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime())
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(f"""
## As-of join scaling soak {stamp} — sort/window-bound path ({n_rows:,} events, ~1k/key, 20/80 left/right)

| parallelism | rows | wall (s, best of {args.runs}) | rows/sec | steal% per run |
|---|---|---|---|---|
| local[{args.lo}]  (N)  | {n_rows} | {lo['sec']} | {lo['rows_per_sec']} | {res['lo_steals']} |
| local[{args.hi}] (4N) | {n_rows} | {hi['sec']} | {hi['rows_per_sec']} | {res['hi_steals']} |

- throughput scaling efficiency N->4N: **{eff:.3f}** (north_rule two-cluster-size criterion, sort/window-bound regime)
- host ceiling (pure-JVM hash-agg, same N->4N): **{ceil_eff:.3f}**; ceiling-normalized: **{norm:.3f}**
- joined-output checksums identical across parallelism: True {lo['checksum']}
- per-run walls: N={res['lo_runs']} 4N={res['hi_runs']}
""")


if __name__ == "__main__":
    main()
