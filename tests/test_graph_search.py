"""Unit tests for the r5 graph/search/sketch operators: fixed-point
PageRank, quantized BM25 top-k, HyperLogLog sketch, XYZ tile rollup.
The contract-level DuckDB oracle parity runs in test_contract.py; these
verify the operator semantics against independent Python references and
the determinism contracts (partitioning invariance, integer exactness).
"""

import math

import pytest
from pyspark.sql import functions as F

from s2geo_spark.operators.graph import pagerank, synth_links
from s2geo_spark.operators.search import bm25_topk, hll_distinct

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def _py_pagerank(n, edges, iters=4, scale=10 ** 9):
    """Independent reference: same integer rules, plain dicts."""
    outdeg = {}
    for s, d, od in edges:
        outdeg[s] = od
    r = {i: scale for i in range(n)}
    base = (15 * scale) // 100
    for _ in range(iters):
        in_sum = {i: 0 for i in range(n)}
        for s, d, od in edges:
            in_sum[d] += r[s] // od
        r = {i: base + (85 * in_sum[i]) // 100 for i in range(n)}
    return r


class TestPageRank:
    def test_tiny_graph_matches_python_reference(self, spark):
        # 0 -> 1, 0 -> 2 (outdeg 2); 1 -> 0 (outdeg 1); 2 has no outlinks
        # present as edges but node 2 exists in the node list.
        edges = [(0, 1, 2), (0, 2, 2), (1, 0, 1)]
        nodes = spark.createDataFrame([(i,) for i in range(3)], "node long")
        edf = spark.createDataFrame(
            [(s, od, d) for s, d, od in edges], "src long, outdeg long, dst long"
        )
        got = {
            r["node"]: r["rank"]
            for r in pagerank(nodes, edf, iters=4).collect()
        }
        want = _py_pagerank(3, edges, iters=4)
        assert got == want

    def test_partitioning_invariance_and_mass_bound(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        nodes = docs.select(F.col("doc_id"))
        edges = synth_links(docs)
        a = pagerank(nodes, edges, iters=3, id_col="doc_id")
        b = pagerank(
            nodes.repartition(7), edges.repartition(13), iters=3,
            id_col="doc_id",
        )
        pa = sorted((r["node"], r["rank"]) for r in a.collect())
        pb = sorted((r["node"], r["rank"]) for r in b.collect())
        assert pa == pb
        n = docs.count()
        total = sum(r for _, r in pa)
        # Mass conserved up to truncation loss: <= n*scale, and at least
        # the undamped base mass.
        assert total <= n * 10 ** 9
        assert total >= n * 150_000_000
        assert all(r >= 150_000_000 for _, r in pa)

    def test_synth_links_shape(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n = docs.count()
        e = synth_links(docs)
        stats = e.agg(
            F.min("outdeg"), F.max("outdeg"), F.min("dst"), F.max("dst"),
            F.count("*"),
        ).collect()[0]
        assert stats[0] >= 1 and stats[1] <= 4
        assert 0 <= stats[2] and stats[3] < n
        # per-src edge count == outdeg
        bad = (
            e.groupBy("src", "outdeg").agg(F.count("*").alias("c"))
            .where(F.col("c") != F.col("outdeg")).count()
        )
        assert bad == 0


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

def _py_bm25(docs, queries, k=10):
    """Independent reference with the same quantization contract."""
    toks = {d: [w for w in t.split(" ") if w] for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for q, terms in queries:
        scores = {}
        for term in terms:
            df = sum(1 for v in toks.values() if term in v)
            if df == 0:
                continue
            idf = (float(n - df) + 0.5) / (float(df) + 0.5)
            for d, v in toks.items():
                tf = v.count(term)
                if tf == 0:
                    continue
                s = (idf * (float(tf) * 2.2)) / (
                    float(tf) + 1.2 * (0.25 + (0.75 * float(len(v))) / avgdl)
                )
                scores[d] = scores.get(d, 0) + int(math.floor(s * 1048576.0))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[q] = [(i + 1, d, s) for i, (d, s) in enumerate(ranked)]
    return out


class TestBM25:
    def test_matches_python_reference(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        queries = [("qa", ["hash", "join"]), ("qb", ["vector"])]
        got = bm25_topk(docs, queries, k=5)
        got_map = {}
        for r in got.collect():
            got_map.setdefault(r["query"], []).append(
                (r["rank"], r["doc_id"], r["score"])
            )
        for v in got_map.values():
            v.sort()
        pdocs = [(r["doc_id"], r["text"]) for r in docs.collect()]
        want = _py_bm25(pdocs, queries, k=5)
        assert got_map == want

    def test_absent_term_query_empty(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        got = bm25_topk(docs, [("qz", ["zzznotaword"])], k=5)
        assert got.count() == 0


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

class TestHLL:
    def test_estimate_accuracy_and_bounds(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        rows = hll_distinct(docs, "lang", F.col("text")).collect()
        assert len(rows) == docs.select("lang").distinct().count()
        for r in rows:
            # raw HLL with m=64: relative error ~1.04/8 = 13%; allow 4 sigma
            assert r["hll_estimate"] == pytest.approx(
                r["n_exact"], rel=0.55
            )
            assert r["hll_t"] > 0

    def test_sketch_is_order_and_dup_insensitive(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        doubled = docs.unionByName(docs).repartition(11)
        a = {
            r["lang"]: r["hll_t"]
            for r in hll_distinct(docs, "lang", F.col("text")).collect()
        }
        b = {
            r["lang"]: r["hll_t"]
            for r in hll_distinct(doubled, "lang", F.col("text")).collect()
        }
        assert a == b  # duplicates and row order cannot move max(rho)


# ---------------------------------------------------------------------------
# XYZ tiles
# ---------------------------------------------------------------------------

class TestXYZTiles:
    def test_quadkey_and_ranges(self, spark):
        from s2geo_spark.contract import q_geo_xyz_tiles

        out = q_geo_xyz_tiles(spark, SF_DIR).collect()
        n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
        assert sum(r["cnt"] for r in out) == n_events
        for r in out:
            assert 0 <= r["tile_x"] < 64 and 0 <= r["tile_y"] < 64
            assert len(r["quadkey"]) == 6
            # quadkey decodes back to (tile_x, tile_y)
            x = y = 0
            for ch in r["quadkey"]:
                d = int(ch)
                x = (x << 1) | (d & 1)
                y = (y << 1) | (d >> 1)
            assert (x, y) == (r["tile_x"], r["tile_y"])


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

class TestCountMin:
    def test_overestimates_and_tracks_heavy_hitters(self, spark):
        from s2geo_spark.operators.search import count_min_heavy_hitters

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        rows = count_min_heavy_hitters(docs, top_n=15).collect()
        assert len(rows) == 15
        assert sorted(r["rank"] for r in rows) == list(range(1, 16))
        for r in rows:
            # CMS never underestimates; with 4x256 cells vs ~40 distinct
            # words, collisions are rare so the bound should be tight.
            assert r["cms_estimate"] >= r["exact_cnt"]
            assert r["cms_estimate"] <= 3 * r["exact_cnt"]

    def test_sketch_partitioning_invariance(self, spark):
        from s2geo_spark.operators.search import count_min_heavy_hitters

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        a = {(r["word"], r["cms_estimate"])
             for r in count_min_heavy_hitters(docs, top_n=10).collect()}
        b = {(r["word"], r["cms_estimate"])
             for r in count_min_heavy_hitters(
                 docs.repartition(13), top_n=10).collect()}
        assert a == b


# ---------------------------------------------------------------------------
# Stratified sample
# ---------------------------------------------------------------------------

class TestStratifiedSample:
    def test_exact_quota_per_stratum(self, spark):
        from s2geo_spark.operators.search import stratified_sample

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = stratified_sample(docs, "lang", frac_pct=10)
        got = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(
                F.count("*").alias("n")).collect()
        }
        want = {
            r["lang"]: (r["n"] * 10 + 99) // 100
            for r in docs.groupBy("lang").agg(
                F.count("*").alias("n")).collect()
        }
        assert got == want

    def test_deterministic_under_row_order(self, spark):
        from s2geo_spark.operators.search import stratified_sample

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        a = {r["doc_id"] for r in
             stratified_sample(docs, "lang", frac_pct=10).collect()}
        b = {r["doc_id"] for r in
             stratified_sample(docs.orderBy(F.desc("doc_id")), "lang",
                               frac_pct=10).collect()}
        assert a == b


# ---------------------------------------------------------------------------
# Plan shapes
# ---------------------------------------------------------------------------

class TestPlans:
    @staticmethod
    def _plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    def test_bm25_term_filter_is_broadcast(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        plan = self._plan(bm25_topk(docs, [("qa", ["hash", "join"])], k=5))
        # the query-term table is explicitly broadcast-hinted: the corpus
        # token stream must never shuffle for the term filter
        assert "BroadcastHashJoin" in plan
        assert "BroadcastNestedLoop" not in plan

    def test_count_min_probe_join_no_cartesian(self, spark):
        from s2geo_spark.operators.search import count_min_heavy_hitters

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        plan = self._plan(count_min_heavy_hitters(docs, top_n=10))
        assert "BroadcastNestedLoop" not in plan
        assert "CartesianProduct" not in plan

    def test_pagerank_no_cartesian(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        edges = synth_links(docs)
        df = pagerank(docs.select("doc_id"), edges, iters=2,
                      id_col="doc_id", checkpoint=False)
        plan = self._plan(df)
        assert "BroadcastNestedLoop" not in plan
        assert "CartesianProduct" not in plan
