#!/usr/bin/env python3
"""Shuffle-bound scaling soak: fixed-point PageRank on a synthetic graph.

The pages-pipeline scaling windows (BENCH/BASELINE.md) measure the
map-heavy path (scan -> encode -> broadcast join -> rollup).  PageRank is
the opposite regime — every iteration is a full shuffle of the rank
vector against the edge list plus a keyed aggregation — so this soak
evidences the north_rule's two-parallelism criterion on the
shuffle-bound path too.

Graph: ``--nodes`` nodes from ``spark.range`` (pure Catalyst, no files);
each node gets 1 + (xxhash64 % 4) out-edges to xxhash64-derived targets
(same shape as operators/graph.synth_links, but xxhash64 instead of md5:
cross-engine portability is irrelevant here and the JVM hash is ~20x
cheaper, so the measurement is shuffle- not hash-bound).  3 iterations.

Correctness across parallelism: the int64 fixed-point contract makes the
final rank vector bit-identical at any parallelism — asserted via
(count, sum, bit_xor) checksums of the collected aggregate.

Usage:
  python scripts/soak_pagerank.py                # 16M nodes, local[8]+[32]
  python scripts/soak_pagerank.py --nodes 1e6    # smoke
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


def synth_graph(spark, n_nodes: int):
    """Deterministic (src, outdeg, dst) edges via xxhash64 — bit-identical
    at any parallelism (ids are deterministic)."""
    from pyspark.sql import functions as F

    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    deg = nodes.select(
        F.col("node").alias("src"),
        (F.lit(1) + F.pmod(F.xxhash64("node", F.lit(7)), F.lit(4)))
        .cast("long").alias("outdeg"),
    )
    edges = deg.select(
        "src", "outdeg",
        F.explode(F.sequence(F.lit(1), F.col("outdeg"))).alias("j"),
    ).select(
        "src", "outdeg",
        F.pmod(F.xxhash64("src", "j", F.lit(11)), F.lit(n_nodes))
        .cast("long").alias("dst"),
    )
    return nodes, edges


def run_inner(cpus: int, n_nodes: int) -> dict:
    os.environ.setdefault("SPARK_GRAFT_MEM", "40g")
    from bench import _steal_pct, _steal_snapshot, make_spark
    from pyspark.sql import functions as F

    from s2geo_spark.operators.graph import pagerank

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: codegen + shuffle machinery on a small slice
    wn, we = synth_graph(spark, 100_000)
    pagerank(wn, we, iters=1).agg(F.sum("rank")).collect()

    nodes, edges = synth_graph(spark, n_nodes)
    edges = edges.persist()
    edges.count()  # materialize input outside the timed window
    s0 = _steal_snapshot()
    t0 = time.perf_counter()
    ranks = pagerank(nodes, edges, iters=3)
    row = ranks.agg(
        F.count("*").alias("n"),
        F.sum("rank").alias("s"),
        F.expr("bit_xor(xxhash64(node, rank))").alias("x"),
    ).collect()[0]
    sec = time.perf_counter() - t0
    out = {
        "cpus": cpus,
        "nodes": n_nodes,
        "sec": round(sec, 3),
        "nodes_per_sec": round(n_nodes / sec, 1),
        "checksum": [int(row["n"]), int(row["s"]), int(row["x"])],
        "steal_pct": _steal_pct(s0, _steal_snapshot()),
    }
    print("SOAK_JSON " + json.dumps(out))
    return out


def fresh_run(cpus: int, n_nodes: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--inner", str(cpus),
         "--nodes", str(n_nodes)],
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
    ap.add_argument("--nodes", type=float, default=16e6)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--inner", type=int, default=0)
    ap.add_argument("--no-log", action="store_true")
    args = ap.parse_args()
    n_nodes = int(args.nodes)

    if args.inner:
        run_inner(args.inner, n_nodes)
        return

    lo_runs = [fresh_run(args.lo, n_nodes) for _ in range(args.runs)]
    hi_runs = [fresh_run(args.hi, n_nodes) for _ in range(args.runs)]
    lo = min(lo_runs, key=lambda r: r["sec"])
    hi = min(hi_runs, key=lambda r: r["sec"])
    assert lo["checksum"] == hi["checksum"], (
        "rank vector differs across parallelism!", lo, hi)

    from bench import _jvm_ceiling
    c_lo, st_lo = _jvm_ceiling(args.lo)
    c_hi, st_hi = _jvm_ceiling(args.hi)
    ceil_eff = (c_lo / c_hi) / (args.hi / args.lo)
    eff = (hi["nodes_per_sec"] / lo["nodes_per_sec"]) / (args.hi / args.lo)
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
## PageRank scaling soak {stamp} — shuffle-bound path (3 fixed-point iterations, {n_nodes:,} nodes, ~2.5 edges/node)

| parallelism | nodes | wall (s, best of {args.runs}) | nodes/sec | steal% per run |
|---|---|---|---|---|
| local[{args.lo}]  (N)  | {n_nodes} | {lo['sec']} | {lo['nodes_per_sec']} | {res['lo_steals']} |
| local[{args.hi}] (4N) | {n_nodes} | {hi['sec']} | {hi['nodes_per_sec']} | {res['hi_steals']} |

- throughput scaling efficiency N->4N: **{eff:.3f}** (north_rule two-cluster-size criterion, shuffle-bound regime)
- host ceiling (pure-JVM hash-agg, same N->4N): **{ceil_eff:.3f}**; ceiling-normalized: **{norm:.3f}**
- rank-vector checksums identical across parallelism: True {lo['checksum']}
- per-run walls: N={res['lo_runs']} 4N={res['hi_runs']}
""")


if __name__ == "__main__":
    main()
