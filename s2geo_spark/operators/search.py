"""Corpus search & cardinality operators: BM25 top-k retrieval and a
HyperLogLog distinct-count sketch.

BM25 (Robertson/Sparck-Jones, public) is the standard lexical ranking
function; a training-data pipeline uses it for targeted corpus slicing
("pull the top documents for these seed queries") and for building
retrieval-augmented eval sets.  The plan is the inverted-index shape
re-expressed relationally: tokenize -> explode -> broadcast-join the
(tiny) query-term table -> per-(doc,term) tf -> per-term df -> score ->
per-query top-k window.  Everything after the explode touches only rows
whose token IS a query term, so the shuffled volume is the posting
lists, not the corpus.

Determinism contract: floats appear only in per-(term,doc) scalar
expressions whose operation sequence is written identically in the SQL
oracle (each IEEE op is correctly rounded, so results are
bit-identical); per-term scores are quantized to int64 (floor(score *
2^20)) BEFORE the per-doc sum, so the only cross-row reduction is exact
integer addition — immune to aggregation order.  The idf uses the
rational form (N - df + 0.5)/(df + 0.5) WITHOUT the log so the oracle
needs no transcendental (libm log differs across engines in the last
ulp; the ranking it induces is monotone-identical for single-term
weighting comparisons at fixed N).

HyperLogLog (Flajolet et al. 2007, public): m=64 registers over a
60-bit md5-derived hash.  The register sum is carried as the exact
integer T = sum_j 2^(55 - rho_j) (common denominator 2^55), so the
whole sketch state is integer-exact and order-independent; the raw
estimate alpha*m^2*2^55 / T is one double division at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _words(text_col: str) -> F.Column:
    return F.filter(F.split(F.col(text_col), " "), lambda w: w != "")


def bm25_topk(docs: DataFrame, queries: list[tuple[str, list[str]]],
              k: int = 10, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Top-k docs per query under quantized rational-idf BM25
    (k1 = 1.2, b = 0.75 — the textbook defaults).

    Returns (query, rank, doc_id, score) where score is the int64
    quantized BM25 sum.  Scale shape: corpus-side work is one map-side
    tokenize+explode immediately filtered by a broadcast hash join
    against the O(#query terms) term table; tf/df aggregations are
    map-side combining sums on (term, doc) / (term); the final top-k is
    a per-query window over only the matching docs.
    """
    spark = docs.sparkSession
    terms = spark.createDataFrame(
        [(q, t) for q, ts in queries for t in ts], "query string, term string"
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _words(text_col).alias("w")
    ).select("doc_id", F.explode("w").alias("term"))
    # dl / avgdl / N from one corpus stats pass (ints; avgdl derived
    # identically in the oracle as CAST(sum AS DOUBLE)/CAST(n AS DOUBLE)).
    dl = docs.select(F.col(id_col).alias("doc_id"),
                     F.size(_words(text_col)).cast("long").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"),
                   F.sum("dl").alias("sum_dl")).collect()[0]
    n_docs, sum_dl = stats["n_docs"], stats["sum_dl"]

    tf = (
        toks.join(F.broadcast(terms.select("term").distinct()), "term")
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))

    # Per-(term, doc) quantized score.  The float expression tree below
    # is mirrored token-for-token in the oracle SQL: every intermediate
    # is a correctly-rounded IEEE double op on identical inputs.
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .withColumn(
            "qs",
            F.expr(
                f"""CAST(floor(
                  (((CAST({n_docs} - df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                    / (CAST(df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                   * (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE)))
                  / (CAST(tf AS DOUBLE)
                     + CAST(1.2 AS DOUBLE)
                       * (CAST(0.25 AS DOUBLE)
                          + (CAST(0.75 AS DOUBLE) * CAST(dl AS DOUBLE))
                            / (CAST({sum_dl} AS DOUBLE)
                               / CAST({n_docs} AS DOUBLE))))
                  * CAST(1048576.0 AS DOUBLE)) AS BIGINT)"""
            ),
        )
    )
    per_doc = (
        scored.join(F.broadcast(terms), "term")
        .groupBy("query", "doc_id")
        .agg(F.sum("qs").alias("score"))
    )
    w = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query", "rank", "doc_id", "score")
    )


def bm25_oracle_sql(queries: list[tuple[str, list[str]]], k: int = 10,
                    table: str = "documents", id_col: str = "doc_id",
                    text_col: str = "text") -> str:
    """DuckDB replay of bm25_topk with the identical float op sequence."""
    vals = ", ".join(
        f"('{q}', '{t}')" for q, ts in queries for t in ts
    )
    return f"""
WITH qt(query, term) AS (VALUES {vals}),
toks AS (
  SELECT {id_col} AS doc_id,
         unnest(list_filter(string_split({text_col}, ' '), w -> w <> '')) AS term
  FROM {table}
),
dl AS (
  SELECT {id_col} AS doc_id,
         CAST(len(list_filter(string_split({text_col}, ' '), w -> w <> ''))
              AS BIGINT) AS dl
  FROM {table}
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl
),
tf AS (
  SELECT t.term, t.doc_id, CAST(count(*) AS BIGINT) AS tf
  FROM toks t JOIN (SELECT DISTINCT term FROM qt) q USING (term)
  GROUP BY t.term, t.doc_id
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.term, tf.doc_id,
    CAST(floor(
      (((CAST(s.n_docs - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
        / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
       * (CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE)))
      / (CAST(tf.tf AS DOUBLE)
         + CAST(1.2 AS DOUBLE)
           * (CAST(0.25 AS DOUBLE)
              + (CAST(0.75 AS DOUBLE) * CAST(dl.dl AS DOUBLE))
                / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))
      * CAST(1048576.0 AS DOUBLE)) AS BIGINT) AS qs
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id), stats s
),
per_doc AS (
  SELECT qt.query, scored.doc_id, CAST(sum(scored.qs) AS BIGINT) AS score
  FROM scored JOIN qt USING (term)
  GROUP BY qt.query, scored.doc_id
),
ranked AS (
  SELECT query, doc_id, score,
         CAST(row_number() OVER (PARTITION BY query
                                 ORDER BY score DESC, doc_id) AS BIGINT)
           AS rank
  FROM per_doc
)
SELECT query, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""


def hll_register_maxes(df: DataFrame, group_col: str, value_col,
                       p: int = 6) -> DataFrame:
    """(grp, reg, mr) per-register rho maxes — the mergeable HLL sketch
    state.  Works on batch AND streaming DataFrames: max() is the whole
    merge rule, so Structured Streaming's stateful groupBy in complete
    mode maintains the identical sketch incrementally."""
    m = 1 << p
    rhocap = 61 - p  # max rho: hash < 2^60, remainder has 60-p bits
    h = F.conv(F.substring(F.md5(value_col), 1, 15), 16, 10).cast("long")
    rem = F.expr(f"h div {m}")
    rho = F.when(rem == 0, F.lit(rhocap)).otherwise(
        F.lit(rhocap) - F.length(F.bin(rem))
    )
    return (
        df.select(F.col(group_col).alias("grp"), h.alias("h"))
        .select("grp", F.expr(f"h % {m}").alias("reg"), rho.alias("rho"))
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("mr"))
    )


def hll_finish(regs: DataFrame, group_col: str, p: int = 6) -> DataFrame:
    """Fold (grp, reg, mr) register maxes into (group, hll_t, hll_estimate)."""
    m = 1 << p
    rhocap = 61 - p
    est = F.expr(
        f"((CAST(0.709 AS DOUBLE) * CAST({float(m * m)} AS DOUBLE))"
        f" * CAST({float(1 << rhocap)} AS DOUBLE)) / CAST(hll_t AS DOUBLE)"
    )
    return (
        regs.groupBy("grp")
        .agg(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                         f"CAST({rhocap} - mr AS INT))")).alias("t_seen"),
            F.count("*").alias("n_regs"),
        )
        .select(
            F.col("grp").alias(group_col),
            (F.col("t_seen")
             + (F.lit(m) - F.col("n_regs"))
             * F.lit(1 << rhocap).cast("long")).alias("hll_t"),
        )
        .select(group_col, "hll_t", est.alias("hll_estimate"))
    )


def hll_distinct(df: DataFrame, group_col: str, value_col,
                 p: int = 6) -> DataFrame:
    """HyperLogLog distinct-count per group, exact-integer sketch state.

    m = 2^p registers (p=6 -> 64); item hash = 60-bit md5 int; register
    j = hash % m; rho = leading-zero count of the remaining (60-p) bits
    plus 1 (so 1..(61-p)); empty register contributes rho = 0.  Returns
    (group, n_exact, hll_t, hll_estimate) where hll_t =
    sum_j 2^(RHOCAP - rho_j) with RHOCAP = 61 - p (exact int64: at most
    m * 2^RHOCAP = 2^(RHOCAP+p) = 2^61), and hll_estimate =
    alpha_m * m^2 * 2^RHOCAP / T — one double division.

    Scale shape: ONE map-side-combining aggregate over (group, register)
    then a tiny per-group rollup — the sketch is mergeable by max(), so
    this is exactly the two-level combine a 1000-executor groupBy does
    for free.  n_exact (countDistinct) rides along for the accuracy
    check; at 100 TB you would drop it and keep only the sketch.
    """
    m = 1 << p
    rhocap = 61 - p
    regs = (
        hll_register_maxes(df, group_col, value_col, p)
        .groupBy("grp")
        .agg(
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                         f"CAST({rhocap} - mr AS INT))")).alias("t_seen"),
            F.count("*").alias("n_regs"),
        )
        .select(
            "grp",
            (F.col("t_seen")
             + (F.lit(m) - F.col("n_regs"))
             * F.lit(1 << rhocap).cast("long")).alias("hll_t"),
        )
    )
    exact = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.countDistinct(value_col).alias("n_exact")
    )
    alpha_num = 0.709  # alpha_64 (Flajolet et al., m >= 64 constant)
    est = F.expr(
        f"((CAST({alpha_num} AS DOUBLE) * CAST({float(m * m)} AS DOUBLE))"
        f" * CAST({float(1 << rhocap)} AS DOUBLE)) / CAST(hll_t AS DOUBLE)"
    )
    return (
        exact.join(regs, "grp")
        .select(F.col("grp").alias(group_col), "n_exact", "hll_t",
                est.alias("hll_estimate"))
    )


def hll_oracle_sql(group_col: str, value_expr: str, table: str,
                   p: int = 6) -> str:
    """DuckDB replay of hll_distinct (identical integer sketch + one
    double division)."""
    m = 1 << p
    rhocap = 61 - p
    return f"""
WITH h AS (
  SELECT {group_col} AS grp,
         ('0x' || substr(md5({value_expr}), 1, 15))::BIGINT AS h
  FROM {table}
),
r AS (
  SELECT grp, h % {m} AS reg,
         CASE WHEN h // {m} = 0 THEN {rhocap}
              ELSE {rhocap} - length(bin(h // {m})) END AS rho
  FROM h
),
regs AS (
  SELECT grp, reg, max(rho) AS mr FROM r GROUP BY grp, reg
),
t AS (
  SELECT grp,
         CAST(sum(CAST(1 AS BIGINT) << ({rhocap} - mr)) AS BIGINT)
           + ({m} - CAST(count(*) AS BIGINT))
             * (CAST(1 AS BIGINT) << {rhocap}) AS hll_t
  FROM regs GROUP BY grp
),
ex AS (
  SELECT {group_col} AS grp, CAST(count(DISTINCT {value_expr}) AS BIGINT)
           AS n_exact
  FROM {table} GROUP BY {group_col}
)
SELECT ex.grp AS {group_col}, ex.n_exact, t.hll_t,
       ((CAST(0.709 AS DOUBLE) * CAST({float(m * m)} AS DOUBLE))
        * CAST({float(1 << rhocap)} AS DOUBLE)) / CAST(t.hll_t AS DOUBLE)
         AS hll_estimate
FROM ex JOIN t USING (grp)
"""


def count_min_heavy_hitters(docs: DataFrame, top_n: int = 15,
                            depth: int = 4, width: int = 256,
                            id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005, public) word
    frequencies, reported for the exact top-``top_n`` words.

    Sketch = depth x width integer counters; counter (j, md5('j:'||w) %
    width) accumulates every occurrence of w; the estimate for w is the
    min over the depth rows (always >= the true count; collisions only
    inflate).  The whole sketch state is exact integer addition — ONE
    map-side-combining aggregate over (row, bucket), mergeable across
    any partitioning, and replayable in SQL.  The exact top-n ranking
    (count desc, word) rides along as the accuracy reference, and the
    oracle hash-matches both.

    Scale shape: the corpus-side pass is tokenize -> explode -> a
    depth-way posexplode onto (row, bucket) keys -> groupBy over at most
    depth*width cells.  At 100 TB the combine happens map-side into
    <= 1024 cells per task; the shuffle moves only those cells.
    """
    toks = docs.select(F.explode(_words(text_col)).alias("w"))
    buckets = F.array(*[
        (F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{j}:"), F.col("w"))), 1, 15), 16, 10)
         .cast("long") % width).alias(f"b{j}")
        for j in range(depth)
    ])
    sketch = (
        toks.select(F.posexplode(buckets).alias("j", "bucket"))
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("c"))
    )
    exact = (
        toks.groupBy("w").agg(F.count("*").alias("exact_cnt"))
    )
    from pyspark.sql.window import Window as W
    top = (
        exact.withColumn(
            "rnk",
            F.row_number().over(
                W.orderBy(F.desc("exact_cnt"), F.asc("w"))).cast("long"),
        )
        .where(F.col("rnk") <= top_n)
    )
    probes = top.select(
        "w", "exact_cnt", "rnk",
        F.posexplode(buckets).alias("j", "bucket"),
    )
    return (
        probes.join(sketch, ["j", "bucket"])
        .groupBy("w", "exact_cnt", "rnk")
        .agg(F.min("c").alias("cms_estimate"))
        .select(F.col("w").alias("word"), F.col("rnk").alias("rank"),
                "exact_cnt", "cms_estimate")
    )


def count_min_oracle_sql(top_n: int = 15, depth: int = 4, width: int = 256,
                         table: str = "documents",
                         text_col: str = "text") -> str:
    """DuckDB replay of count_min_heavy_hitters (all-integer)."""
    bucket = (
        "('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || w), 1, 15))::BIGINT"
        f" % {width}"
    )
    return f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split({text_col}, ' '), x -> x <> ''))
           AS w
  FROM {table}
),
tj AS (
  SELECT w, unnest(generate_series(0, {depth - 1})) AS j FROM toks
),
cells AS (
  SELECT j, {bucket} AS bucket, CAST(count(*) AS BIGINT) AS c
  FROM tj GROUP BY j, {bucket}
),
exact AS (SELECT w, CAST(count(*) AS BIGINT) AS exact_cnt FROM toks GROUP BY w),
top AS (
  SELECT w, exact_cnt,
         CAST(row_number() OVER (ORDER BY exact_cnt DESC, w) AS BIGINT)
           AS rnk
  FROM exact QUALIFY rnk <= {top_n}
),
probes AS (
  SELECT w, exact_cnt, rnk, unnest(generate_series(0, {depth - 1})) AS j
  FROM top
),
est AS (
  SELECT p.w, p.exact_cnt, p.rnk, min(c.c) AS cms_estimate
  FROM (SELECT *, {bucket} AS bucket FROM probes) p
  JOIN cells c ON c.j = p.j AND c.bucket = p.bucket
  GROUP BY p.w, p.exact_cnt, p.rnk
)
SELECT w AS word, rnk AS rank, exact_cnt, cms_estimate FROM est
"""


def stratified_sample(df: DataFrame, stratum_col: str, frac_pct: int = 10,
                      id_col: str = "doc_id") -> DataFrame:
    """Exact-fraction deterministic stratified sample: within each
    stratum keep the ceil(frac_pct% of stratum size) rows whose md5
    priority hash sorts first — a reproducible uniform sample with the
    per-stratum rate pinned exactly (plain Bernoulli sampling drifts per
    stratum; training mixes need the quota exact).

    One shuffle on the stratum key; the per-stratum window sorts 8-byte
    (prio, id) pairs.  All integer — SQL-replayable.
    """
    prio = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    from pyspark.sql.window import Window as W
    w_rank = W.partitionBy(stratum_col).orderBy("prio", id_col)
    w_cnt = W.partitionBy(stratum_col)
    return (
        df.select(F.col(id_col), F.col(stratum_col), prio.alias("prio"))
        .withColumn("n_stratum", F.count("*").over(w_cnt))
        .withColumn("rnk", F.row_number().over(w_rank).cast("long"))
        .where(
            F.col("rnk")
            <= F.expr(f"(n_stratum * {frac_pct} + 99) div 100")
        )
        .select(id_col, stratum_col, "prio", "rnk",
                F.col("n_stratum").cast("long").alias("n_stratum"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970, public): distributed build + semi-join prefilter
# ---------------------------------------------------------------------------

def _bloom_pos(key_col: str, i: int, n_bits: int) -> F.Column:
    """i-th bit position for a key: an 8-hex-digit (32-bit) slice of
    md5(key) reduced mod n_bits.  Pure Catalyst, and replayable in any
    SQL engine with md5 + hex parsing (the oracle uses DuckDB's
    ('0x'||slice)::BIGINT)."""
    return F.expr(
        f"CAST(conv(substring(md5(CAST({key_col} AS STRING)), "
        f"{i * 8 + 1}, 8), 16, 10) AS BIGINT) % {n_bits}"
    )


def bloom_build(df: DataFrame, key_col: str, n_bits: int = 1024,
                k: int = 4, word_bits: int = 32) -> DataFrame:
    """Build a Bloom filter over df[key_col] as a (word, bits) table of
    n_bits/word_bits rows — the distributed representation of the bitset.

    The build is one partial-aggregated groupBy on the word index: every
    executor ORs its local masks first, so the shuffle carries at most
    n_bits/word_bits rows per map task no matter how many keys stream
    through — the right shape for building a prefilter from a 100-TB
    fact scan.  word_bits=32 keeps every mask < 2^31 so all arithmetic
    stays in non-overflowing BIGINT on both engines (Spark ANSI mode
    forbids silent 64-bit overflow).

    k is capped at 4 because positions are carved from disjoint 8-hex
    slices of one md5; 4 x 32 bits of independent hash is the standard
    double-hashing budget for n_bits up to ~2^30.
    """
    if not 1 <= k <= 4:
        raise ValueError("k must be in 1..4 (md5 slice budget)")
    pos = F.explode(
        F.array(*[_bloom_pos(key_col, i, n_bits) for i in range(k)])
    ).alias("p")
    return (
        df.select(pos)
        .groupBy(F.floor(F.col("p") / word_bits).alias("word"))
        .agg(
            F.bit_or(
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), "
                    f"CAST(p % {word_bits} AS INT))"
                )
            ).alias("bits")
        )
    )


def bloom_probe(df: DataFrame, filter_df: DataFrame, key_col: str,
                n_bits: int = 1024, k: int = 4, word_bits: int = 32,
                out_col: str = "bloom_maybe") -> DataFrame:
    """Tag each probe row with whether key_col MIGHT be in the filter
    (no false negatives; false-positive rate set by n_bits/k vs the
    build cardinality).

    The filter table is tiny by construction (n_bits/word_bits rows), so
    membership is k broadcast hash joins — zero shuffle of the probe
    side, which is exactly how a Bloom prefilter must behave in front of
    a 100-TB semi join.  A missing word row means no build key touched
    that word: bits IS NULL => that probe bit fails => not a member.
    """
    if not 1 <= k <= 4:
        raise ValueError("k must be in 1..4 (md5 slice budget)")
    out = df
    passes = []
    for i in range(k):
        h = _bloom_pos(key_col, i, n_bits)
        wcol, mcol, fw, fb = f"__bw{i}", f"__bm{i}", f"__fw{i}", f"__fb{i}"
        out = out.withColumn("__bh", h).withColumn(
            wcol, F.floor(F.col("__bh") / word_bits)
        ).withColumn(
            mcol,
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), "
                f"CAST(__bh % {word_bits} AS INT))"
            ),
        ).drop("__bh")
        filt = filter_df.select(
            F.col("word").alias(fw), F.col("bits").alias(fb)
        )
        out = out.join(
            F.broadcast(filt), F.col(wcol) == F.col(fw), "left"
        )
        passes.append(
            F.col(fb).isNotNull()
            & (F.col(fb).bitwiseAND(F.col(mcol)) != 0)
        )
    cond = passes[0]
    for p in passes[1:]:
        cond = cond & p
    out = out.withColumn(out_col, cond)
    drop = [c for i in range(k)
            for c in (f"__bw{i}", f"__bm{i}", f"__fw{i}", f"__fb{i}")]
    return out.drop(*drop)


def bloom_oracle_fragments(build_table_sql: str, key_sql: str,
                           n_bits: int = 1024, k: int = 4,
                           word_bits: int = 32) -> str:
    """DuckDB CTE fragment computing the identical (word, bits) filter:
    `bloom_words(word, bits)`.  key_sql is the key expression inside the
    build table subquery."""
    return f"""
bloom_pos AS (
  SELECT CAST(('0x' || substring(md5(CAST({key_sql} AS VARCHAR)),
              i.i * 8 + 1, 8)) AS BIGINT) % {n_bits} AS p
  FROM ({build_table_sql}) bsrc
  CROSS JOIN (SELECT unnest(range({k})) AS i) i
),
bloom_words AS (
  SELECT p // {word_bits} AS word,
         CAST(bit_or(CAST(1 AS BIGINT) << CAST(p % {word_bits} AS INT))
              AS BIGINT) AS bits
  FROM bloom_pos GROUP BY 1
)"""
