"""Tests for operators/temporal.py (as-of + interval joins) and the
Bloom filter in operators/search.py.

The as-of oracle here is pandas.merge_asof (an independent public
implementation of the same semantics); the interval/bloom oracles are
brute-force Python.  The contract-level DuckDB oracles (events_asof,
olap_interval_ship, sketch_bloom) cover the parquet-scale path.
"""

import datetime as dt
import hashlib

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from s2geo_spark.operators.search import bloom_build, bloom_probe
from s2geo_spark.operators.temporal import (
    asof_join,
    interval_overlap_join,
    interval_point_join,
)

EPOCH = dt.datetime(2024, 1, 1)


def _ts(s):
    return EPOCH + dt.timedelta(seconds=int(s))


def _mk_events(seed, n, n_keys):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "key": rng.randint(0, n_keys, n).astype(np.int64),
            "ts": [_ts(s) for s in rng.randint(0, 100_000, n)],
            "val": rng.randint(0, 1000, n).astype(np.int64),
        }
    )


class TestAsofJoin:
    @pytest.mark.parametrize(
        "direction", ["backward", "forward", "nearest"]
    )
    def test_matches_pandas_merge_asof(self, spark, direction):
        left = _mk_events(1, 400, 7)
        right = _mk_events(2, 300, 7)
        # pandas merge_asof needs unique sort order to be deterministic
        # on ties; drop duplicate (key, ts) rows on the right, keeping
        # the row our tie rule (max id backward / min id forward) keeps
        # (for nearest the dedup makes candidates unique, so any keep
        # works and the two engines agree by construction).
        keep = "first" if direction == "forward" else "last"
        rd = (
            right.sort_values(["key", "ts", "id"])
            .drop_duplicates(["key", "ts"], keep=keep)
        )
        exp = pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            rd.sort_values("ts", kind="stable")[["key", "ts", "id"]].rename(
                columns={"id": "rid"}
            ),
            on="ts",
            by="key",
            direction=direction,
        ).sort_values("id")

        ldf = spark.createDataFrame(left)
        rdf = spark.createDataFrame(
            rd.rename(columns={"id": "rid"})[["key", "ts", "rid"]]
        )
        got = (
            asof_join(
                ldf, rdf, on=["key"], right_cols=["rid"],
                direction=direction, tie_col="rid",
            )
            .orderBy("id")
            .toPandas()
        )
        assert len(got) == len(left)
        g = got["rid"].fillna(-1).astype(np.int64).to_numpy()
        e = exp["rid"].fillna(-1).astype(np.int64).to_numpy()
        assert (g == e).all()

    def test_tie_on_equal_ts_inclusive(self, spark):
        # right rows at exactly the left ts must match (inclusive), and
        # among equal ts the greatest tie id must win.
        left = spark.createDataFrame(
            pd.DataFrame({"key": [1], "ts": [_ts(100)], "id": [0]})
        )
        right = spark.createDataFrame(
            pd.DataFrame(
                {
                    "key": [1, 1, 1],
                    "ts": [_ts(100), _ts(100), _ts(50)],
                    "rid": [10, 11, 12],
                }
            )
        )
        got = asof_join(
            left, right, on=["key"], right_cols=["rid"], tie_col="rid"
        ).collect()
        assert got[0]["rid"] == 11

    def test_tolerance(self, spark):
        left = spark.createDataFrame(
            pd.DataFrame(
                {"key": [1, 1], "ts": [_ts(100), _ts(5000)], "id": [0, 1]}
            )
        )
        right = spark.createDataFrame(
            pd.DataFrame({"key": [1], "ts": [_ts(90)], "rid": [7]})
        )
        got = (
            asof_join(
                left, right, on=["key"], right_cols=["rid"],
                tie_col="rid", tolerance_s=60,
            )
            .orderBy("id")
            .collect()
        )
        assert got[0]["rid"] == 7  # 10 s away: within tolerance
        assert got[1]["rid"] is None  # 4910 s away: nulled

    def test_single_shuffle_plan(self, spark):
        left = spark.createDataFrame(_mk_events(3, 50, 3))
        right = spark.createDataFrame(
            _mk_events(4, 50, 3).rename(columns={"id": "rid"})[
                ["key", "ts", "rid"]
            ]
        )
        plan = asof_join(
            left, right, on=["key"], right_cols=["rid"], tie_col="rid"
        )._jdf.queryExecution().executedPlan().toString()
        # union + window => exactly one exchange (hashpartitioning on key);
        # no SortMergeJoin / BroadcastNestedLoopJoin anywhere.
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan


class TestIntervalJoin:
    def test_point_join_brute(self, spark):
        rng = np.random.RandomState(7)
        n_iv, n_pt = 60, 500
        starts = rng.randint(0, 50_000, n_iv)
        lens = rng.randint(1, 3600, n_iv)
        pts = rng.randint(0, 60_000, n_pt)
        iv = pd.DataFrame(
            {
                "iid": np.arange(n_iv, dtype=np.int64),
                "s": [_ts(x) for x in starts],
                "e": [_ts(x + d) for x, d in zip(starts, lens)],
            }
        )
        pt = pd.DataFrame(
            {
                "pid": np.arange(n_pt, dtype=np.int64),
                "t": [_ts(x) for x in pts],
            }
        )
        got = (
            interval_point_join(
                spark.createDataFrame(iv),
                spark.createDataFrame(pt),
                "s", "e", "t", bucket_s=3600,
            )
            .select("iid", "pid")
            .toPandas()
        )
        exp = {
            (i, p)
            for i, (ss, ee) in enumerate(zip(starts, starts + lens))
            for p, tt in enumerate(pts)
            if ss <= tt < ee
        }
        assert set(zip(got["iid"], got["pid"])) == exp

    def test_overlap_join_brute_no_dups(self, spark):
        rng = np.random.RandomState(11)
        n = 80
        sa, sb = rng.randint(0, 20_000, n), rng.randint(0, 20_000, n)
        la, lb = rng.randint(1, 5000, n), rng.randint(1, 5000, n)
        a = pd.DataFrame(
            {
                "aid": np.arange(n, dtype=np.int64),
                "as_": [_ts(x) for x in sa],
                "ae": [_ts(x + d) for x, d in zip(sa, la)],
            }
        )
        b = pd.DataFrame(
            {
                "bid": np.arange(n, dtype=np.int64),
                "bs": [_ts(x) for x in sb],
                "be": [_ts(x + d) for x, d in zip(sb, lb)],
            }
        )
        got = (
            interval_overlap_join(
                spark.createDataFrame(a),
                spark.createDataFrame(b),
                "as_", "ae", "bs", "be", bucket_s=5000,
            )
            .select("aid", "bid")
            .toPandas()
        )
        pairs = list(zip(got["aid"], got["bid"]))
        exp = {
            (i, j)
            for i in range(n)
            for j in range(n)
            if sa[i] < sb[j] + lb[j] and sb[j] < sa[i] + la[i]
        }
        assert len(pairs) == len(set(pairs)), "pair emitted twice"
        assert set(pairs) == exp


def _py_bloom_positions(key, n_bits=1024, k=4):
    h = hashlib.md5(str(int(key)).encode()).hexdigest()
    return [int(h[i * 8:(i + 1) * 8], 16) % n_bits for i in range(k)]


class TestBloom:
    def test_build_matches_python(self, spark):
        keys = [3, 17, 99, 1234, 555]
        df = spark.createDataFrame(
            pd.DataFrame({"key": np.array(keys, dtype=np.int64)})
        )
        words = {
            r["word"]: r["bits"]
            for r in bloom_build(df, "key").collect()
        }
        exp = {}
        for kk in keys:
            for p in _py_bloom_positions(kk):
                exp[p // 32] = exp.get(p // 32, 0) | (1 << (p % 32))
        assert words == exp

    def test_probe_no_false_negatives_and_exact(self, spark):
        rng = np.random.RandomState(5)
        members = np.unique(rng.randint(0, 10_000, 80)).astype(np.int64)
        probes = np.arange(0, 3000, dtype=np.int64)
        mdf = spark.createDataFrame(pd.DataFrame({"key": members}))
        pdf = spark.createDataFrame(pd.DataFrame({"key": probes}))
        filt = bloom_build(mdf, "key")
        got = (
            bloom_probe(pdf, filt, "key")
            .orderBy("key")
            .toPandas()
        )
        # independent python replay of the filter
        bits = {}
        for kk in members:
            for p in _py_bloom_positions(kk):
                bits[p // 32] = bits.get(p // 32, 0) | (1 << (p % 32))
        exp = []
        for kk in probes:
            ok = all(
                bits.get(p // 32, 0) & (1 << (p % 32))
                for p in _py_bloom_positions(kk)
            )
            exp.append(ok)
        assert got["bloom_maybe"].tolist() == exp
        mem = set(members.tolist())
        for kk, maybe in zip(got["key"], got["bloom_maybe"]):
            if kk in mem:
                assert maybe, "false negative"

    def test_probe_plan_no_probe_shuffle(self, spark):
        pdf = spark.createDataFrame(
            pd.DataFrame({"key": np.arange(100, dtype=np.int64)})
        )
        mdf = spark.createDataFrame(
            pd.DataFrame({"key": np.arange(5, dtype=np.int64)})
        )
        filt = bloom_build(mdf, "key")
        plan = (
            bloom_probe(pdf, filt, "key")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestTriangles:
    def test_matches_brute_force(self, spark):
        from s2geo_spark.operators.graph import triangles

        rng = np.random.RandomState(13)
        n, m = 40, 160
        e = pd.DataFrame(
            {
                "src": rng.randint(0, n, m).astype(np.int64),
                "dst": rng.randint(0, n, m).astype(np.int64),
            }
        )
        got = triangles(spark.createDataFrame(e)).toPandas()
        trips = list(zip(got["a"], got["b"], got["c"]))
        # brute force over the canonical undirected simple graph
        adj = set()
        for s, d in zip(e["src"], e["dst"]):
            if s != d:
                adj.add((min(s, d), max(s, d)))
        exp = {
            (a, b, c)
            for (a, b) in adj
            for c in range(n)
            if b < c and (a, c) in adj and (b, c) in adj
        }
        assert len(trips) == len(set(trips)), "triangle emitted twice"
        assert set(trips) == exp
        for a, b, c in trips:
            assert a < b < c


class TestStreamAsof:
    def test_multi_batch_state_carry_matches_batch(self, spark, tmp_path):
        """Three time-ordered files -> three micro-batches: reference
        rows from earlier batches must match query rows in later ones
        (the state carry-in path the single-file contract query never
        exercises)."""
        import glob
        import os

        from s2geo_spark.operators.temporal import asof_join
        from s2geo_spark.streaming import pipeline as spl

        rng = np.random.RandomState(21)
        n = 900
        df = pd.DataFrame(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "user_id": rng.randint(0, 12, n).astype(np.int64),
                "ts": [_ts(s) for s in rng.randint(0, 90_000, n)],
                "side": (rng.rand(n) < 0.3).astype(np.int32),
            }
        ).sort_values("ts", kind="stable")
        src = str(tmp_path / "stream_src")
        os.makedirs(src)
        thirds = np.array_split(df, 3)
        for i, part in enumerate(thirds):
            spark.createDataFrame(part).coalesce(1).write.parquet(
                f"{src}/tmp{i}"
            )
            f = glob.glob(f"{src}/tmp{i}/*.parquet")[0]
            os.rename(f, f"{src}/{i:03d}.parquet")
            import shutil

            shutil.rmtree(f"{src}/tmp{i}")

        sdf = (
            spark.readStream.schema(
                spark.read.parquet(f"{src}/000.parquet").schema
            )
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(src)
        )
        import uuid

        name = f"t_asof_{uuid.uuid4().hex[:8]}"
        spl.run_to_memory(
            spl.asof_enrich_stream(sdf), name, mode="append"
        )
        got = (
            spark.table(name)
            .orderBy("event_id")
            .toPandas()[["event_id", "match_id", "lag_s"]]
        )

        full = spark.createDataFrame(df)
        left = full.where(F.col("side") == 1).select(
            "event_id", "user_id", "ts"
        )
        right = full.where(F.col("side") == 0).select(
            F.col("event_id").alias("rid"), "user_id", "ts"
        )
        exp = (
            asof_join(
                left, right, on=["user_id"], right_cols=["rid"],
                tie_col="rid",
            )
            .select(
                "event_id",
                F.coalesce("rid", F.lit(-1)).cast("long").alias("match_id"),
                F.coalesce(
                    F.unix_timestamp("ts") - F.unix_timestamp("ts_r"),
                    F.lit(-1),
                ).cast("long").alias("lag_s"),
            )
            .orderBy("event_id")
            .toPandas()
        )
        assert len(got) == len(exp)
        assert (
            got["match_id"].to_numpy() == exp["match_id"].to_numpy()
        ).all()
        assert (got["lag_s"].to_numpy() == exp["lag_s"].to_numpy()).all()
