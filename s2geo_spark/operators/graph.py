"""Link-graph operators for web-corpus pipelines: PageRank.

A crawl's link graph is the other first-class dataset next to the page
text: PageRank-style centrality is the classic quality prior (the
original Common Crawl / C4-era pipelines rank hosts by harmonic or
PageRank centrality before sampling).  At 100 TB the graph has billions
of edges, so the iteration must be a pure shuffle algorithm: each step
is one equi-join of the rank vector against the edge list (keyed on
src) plus one aggregation (keyed on dst) — no driver state, no
collects, lineage truncated per iteration.

Determinism contract: ranks are **int64 fixed-point** (scale = 1e9).
Integer contributions ``rank div outdeg`` and the damping update
``base + (85 * in_sum) div 100`` are exact and associativity-free, so
the result is bit-identical regardless of partitioning, join order, or
aggregation order — and a SQL oracle can replay the same iterations
unrolled.  (Float PageRank would differ across engines in the last ulp
because summation order differs; fixed-point sidesteps the whole
class.)

Overflow bound: total mass is conserved at ``n_nodes * scale`` up to
truncation loss, so ``85 * in_sum <= 85 * n * scale`` must stay below
2^63 — with scale=1e9 that holds to ~10^8 nodes; shrink ``scale`` for
larger graphs (the docstring constant, not the algorithm, is the
limit).

The reference repo is a C++ geometry library with no graph code; this
operator is part of the training-data-pipeline surface built on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _md5_long(col) -> F.Column:
    """Deterministic 60-bit int64 from a string column (portable: the
    same expression exists in DuckDB as ('0x' || substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def synth_links(docs: DataFrame, id_col: str = "doc_id",
                max_out: int = 4) -> DataFrame:
    """Deterministic synthetic link graph over a dense-id document set.

    Each doc gets ``1 + (md5('deg:'||id) % max_out)`` out-links; link j
    targets ``md5(id||':'||j) % n_docs``.  Self-loops and parallel edges
    are kept as generated (they are part of the deterministic contract).
    Returns (src, outdeg, dst).  Pure Catalyst: one count + a map-side
    explode; replayable in SQL for the oracle.
    """
    n = docs.count()  # bounded driver scalar (one number, any scale)
    deg = docs.select(
        F.col(id_col).cast("long").alias("src"),
        (F.lit(1) + _md5_long(F.concat(F.lit("deg:"), F.col(id_col).cast("string")))
         % max_out).cast("long").alias("outdeg"),
    )
    return deg.select(
        "src", "outdeg",
        F.explode(F.sequence(F.lit(1), F.col("outdeg"))).alias("j"),
    ).select(
        "src", "outdeg",
        (_md5_long(F.concat(F.col("src").cast("string"), F.lit(":"),
                            F.col("j").cast("string"))) % n).alias("dst"),
    )


def pagerank(nodes: DataFrame, edges: DataFrame, iters: int = 4,
             scale: int = 10 ** 9, damping_pct: int = 85,
             id_col: str = "node", checkpoint: bool = True) -> DataFrame:
    """Fixed-point PageRank: ``iters`` exact integer power iterations.

    nodes: one column ``id_col``; edges: (src, outdeg, dst).
    r_0 = scale; r_{t+1}(d) = base + (damping_pct * sum_{(s,d)} (r_t(s)
    div outdeg(s))) div 100, base = (100-damping_pct)*scale div 100.
    Dangling mass is dropped (the standard simplification; documented,
    deterministic).

    Scale shape: per iteration, one shuffle joining the rank vector to
    the edge list on src (both sides hash-partition on src; on a real
    cluster the edge list is bucketed by src once so only the rank
    vector moves), one map-side-combining sum keyed on dst, and one
    left join back to the node list (same key).  The rank vector is
    O(nodes) — always the small side relative to edges.  Lineage is
    truncated each iteration (localCheckpoint here; checkpoint() on a
    cluster) so the plan stays flat in ``iters``.
    """
    base = ((100 - damping_pct) * scale) // 100
    ranks = nodes.select(F.col(id_col).alias("node"),
                         F.lit(scale).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select(F.col("dst"),
                    F.expr("rank div outdeg").alias("c"))
        )
        in_sum = contrib.groupBy("dst").agg(F.sum("c").alias("m"))
        ranks = (
            nodes.select(F.col(id_col).alias("node"))
            .join(in_sum, F.col("node") == F.col("dst"), "left")
            .select(
                "node",
                (F.lit(base) +
                 F.expr(f"({damping_pct} * coalesce(m, CAST(0 AS BIGINT)))"
                        " div 100")).alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks


def triangles(edges: DataFrame, src: str = "src",
              dst: str = "dst") -> DataFrame:
    """Triangle enumeration via degree-ordered orientation
    ("compact-forward", Latapy 2008, public): orient every undirected
    edge from its lower-(degree, id) endpoint to the higher, form wedges
    as pairs of out-edges of the same source, and close each wedge
    against the oriented edge set.

    The orientation is the 100-TB ingredient: wedge count is bounded by
    sum(min-side out-degree choose 2) instead of sum(deg^2) — a hub with
    degree d contributes no wedges at all (all its edges point INTO it),
    so the classic power-law wedge explosion never happens.  Plan: two
    shuffle equi-joins (wedge build keyed on the source, closure keyed
    on the (v1, v2) pair); every triangle is emitted exactly once, no
    distinct() needed.

    Rank key = deg * 2^32 + node (total order; assumes node ids and
    degrees < 2^31 — shrink the shift for denser graphs).  Returns one
    row per triangle with id-sorted corners (a < b < c).
    """
    u = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        u.select(F.col("a").alias("node"))
        .unionAll(u.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    shift = F.lit(1 << 32).cast("long")
    ra = deg.select(
        F.col("node").alias("a"),
        (F.col("deg") * shift + F.col("node")).alias("rka"),
    )
    rb = deg.select(
        F.col("node").alias("b"),
        (F.col("deg") * shift + F.col("node")).alias("rkb"),
    )
    e = u.join(ra, "a").join(rb, "b")
    fwd = F.col("rka") < F.col("rkb")
    # materialize the oriented edge set once: it feeds three plan arms
    # (x, y, z) and Spark re-derives unshared subtrees per arm — at
    # scale that would be three scans+aggs of the edge set
    o = e.select(
        F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(fwd, F.col("rkb")).otherwise(F.col("rka")).alias("rkv"),
    ).localCheckpoint()
    x = o.select("u", F.col("v").alias("v1"), F.col("rkv").alias("rk1"))
    y = o.select("u", F.col("v").alias("v2"), F.col("rkv").alias("rk2"))
    wedge = x.join(y, "u").where(F.col("rk1") < F.col("rk2"))
    z = o.select(F.col("u").alias("v1"), F.col("v").alias("v2"))
    tri = wedge.join(z, ["v1", "v2"])
    lo = F.least("u", "v1", "v2")
    hi = F.greatest("u", "v1", "v2")
    return tri.select(
        lo.cast("long").alias("a"),
        (F.col("u") + F.col("v1") + F.col("v2") - lo - hi)
        .cast("long")
        .alias("b"),
        hi.cast("long").alias("c"),
    )
