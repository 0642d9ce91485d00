#!/usr/bin/env python3
"""Per-query isolation bench (guide §1.4): same session config and
methodology as the frozen bench.py (clearCache -> one untimed warm run ->
timed noop-sink runs), but with N repeats per query, per-run /proc/stat
steal%%, and optional .explain("formatted") capture to plans/r06/.

Usage:
  python bench_extra.py q1 q2 ...        # default: 3 timed reps each
  python bench_extra.py --reps 5 q1
  python bench_extra.py --plans suffix q1 q2   # also write plans/r06/<q>_<suffix>.txt
  python bench_extra.py --all            # every BENCH_QUERIES entry

Prints one JSON line: {"queries": {name: {"min":..,"runs":[..],"steal":[..]}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import bench  # frozen harness: reuse make_spark / constants

SF_DIR = bench.SF_DIR
CPUS = bench.CPUS


def capture_plan(df, path: str) -> None:
    qe = df._jdf.queryExecution()
    txt = df.sparkSession._jvm.PythonSQLUtils.explainString(qe, "formatted")
    with open(path, "w") as f:
        f.write(txt)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 3
    plan_suffix = None
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--plans":
            plan_suffix = args[i + 1]; i += 2
        elif a == "--all":
            names.extend(bench.BENCH_QUERIES); i += 1
        else:
            names.append(a); i += 1

    from s2geo_spark import contract

    spark = bench.make_spark(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = contract.queries()
    out = {}
    plan_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(plan_dir, exist_ok=True)
    for name in names:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"warm:{name}")
        try:
            qmap[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as ex:
            out[name] = {"err": f"{type(ex).__name__}: {str(ex)[:200]}"}
            continue
        runs, steals = [], []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"timed:{name}:{r}")
            s0 = bench._steal_snapshot()
            t0 = time.perf_counter()
            df = qmap[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
            steals.append(bench._steal_pct(s0, bench._steal_snapshot()))
        if plan_suffix is not None:
            try:
                capture_plan(
                    qmap[name](spark, SF_DIR),
                    os.path.join(plan_dir, f"{name}_{plan_suffix}.txt"),
                )
            except Exception as ex:
                print(f"plan capture failed for {name}: {ex}", file=sys.stderr)
        out[name] = {"min": min(runs), "runs": runs, "steal": steals}
        print(f"# {name}: min={min(runs)} runs={runs} steal={steals}",
              file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "queries": out}))


if __name__ == "__main__":
    main()
