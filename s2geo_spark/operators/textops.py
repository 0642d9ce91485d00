"""Text-analysis operators for training-data pipelines: simhash,
fingerprinting, token stats. Vectorized; no per-row Python in hot paths.

SimHash (Charikar, public algorithm): 64-bit signature = sign of the
per-bit sum of token-hash bits (+1/-1); near-duplicates differ in few bits.
Token hash = splitmix64 of the token's md5-front — any stable 64-bit hash
works; this one is cheap in NumPy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType
from pyspark.sql.window import Window


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes for a token list (FNV-1a, public constants)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for idx, t in enumerate(tokens):
        h = np.uint64(0xCBF29CE484222325)
        for b in t.encode("utf-8"):
            h = (h ^ np.uint64(b)) * np.uint64(0x100000001B3)
        out[idx] = h
    return out


@F.pandas_udf(LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens."""
    out = np.zeros(len(text), dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    for row, t in enumerate(text):
        if not t:
            continue
        toks = [w for w in t.split(" ") if w]
        if not toks:
            continue
        hashes = _token_hashes(toks)
        bits = (hashes[:, None] >> bit_idx[None, :]) & np.uint64(1)
        votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        sig = np.uint64(0)
        for b in range(64):
            if votes[b] > 0:
                sig |= np.uint64(1) << np.uint64(b)
        out[row] = sig
    return pd.Series(out.view(np.int64))


def simhash_near_dup_pairs(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", band_bits: int = 16) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any of the 64/band_bits
    simhash bands (banded LSH over the signature)."""
    sig = docs.select(id_col, simhash64(F.col(text_col)).alias("sig"))
    n_bands = 64 // band_bits
    pairs = None
    for b in range(n_bands):
        band = F.shiftrightunsigned(F.col("sig"), b * band_bits).bitwiseAND(
            F.lit((1 << band_bits) - 1)
        )
        a = sig.select(F.col(id_col).alias("doc_a"), band.alias("band"))
        bb = sig.select(F.col(id_col).alias("doc_b"), band.alias("band"))
        p = (
            a.join(bb, "band")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )
        pairs = p if pairs is None else pairs.unionByName(p)
    return pairs.distinct()


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (JVM-side bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


def _words(text_col: str) -> Column:
    """Whitespace tokens with empties dropped, as an array column."""
    return F.filter(F.split(F.col(text_col), " "), lambda w: w != "")


def word_ngrams(docs: DataFrame, n: int, id_col: str = "doc_id",
                text_col: str = "text", hashed: bool = True) -> DataFrame:
    """Distinct word n-grams per document, exploded to one row per
    (id, gram).

    Gram construction is pure Catalyst (split → slice/transform →
    array_distinct → explode), so the whole stage stays inside
    whole-stage codegen. With ``hashed=True`` each gram is reduced to an
    int64 (md5 hex-prefix — the same hash family the shingle pipeline
    uses) BEFORE the explode, so every downstream shuffle moves 8-byte
    longs instead of n-word strings: at 100 TB the n-gram stream is the
    dominant shuffle and this is ~5-10× less shuffle volume."""
    gram = f"array_join(slice(w, i + 1, {n}), ' ')"
    if hashed:
        gram = f"cast(conv(substr(md5({gram}), 1, 15), 16, 10) as bigint)"
    return (
        docs.select(F.col(id_col), _words(text_col).alias("w"))
        .select(
            id_col,
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(slice(w, 1, greatest(size(w) - {n - 1},"
                        f" 0)), (x, i) -> {gram})"
                    )
                )
            ).alias("g"),
        )
    )


def domain_cap(docs: DataFrame, k: int = 10, domain_col: str = "source",
               id_col: str = "doc_id") -> DataFrame:
    """Per-domain cap (the Dolma/C4-style "keep at most k docs per
    domain" de-biasing pass): keep the k docs whose deterministic
    priority hash (md5 of the id) sorts first within each domain — a
    reproducible uniform sample, independent of row order.

    Scale shape: one shuffle on the domain key, then a per-domain
    window sort of (8-byte prio, id) pairs. Domains distribute across
    tasks by hash; even a 10M-page mega-domain sorts ~160 MB in one
    task, so no salting is needed for real web-domain distributions.
    (For adversarial single-key corpora the refinement is a per-domain
    count + broadcast prio threshold that prefilters to ~k x slack
    survivors before the exact window — same output, bounded task.)"""
    prio = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    w = Window.partitionBy(domain_col).orderBy("prio", id_col)
    return (
        docs.select(F.col(id_col), F.col(domain_col), prio.alias("prio"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, domain_col, "prio",
                F.col("rank").cast("long").alias("rank"))
    )


def pack_sequences(docs: DataFrame, seq_len: int = 2048,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Sequence packing for pretraining-data prep (the GPT-style "concat
    all docs in a fixed order and cut every ``seq_len`` tokens" layout):
    assign every doc its global token offset, the training chunk its
    first token lands in, the position within that chunk, and how many
    chunk boundaries it straddles.

    The global running sum is the scale problem: a naive
    ``Window.orderBy(id)`` with no partition key collapses the whole
    corpus into ONE task. This runs the classic two-phase distributed
    prefix sum instead: range-repartition by id (so partition order ==
    id order), per-partition running sums in parallel, then a
    partition-count-sized aggregate of per-partition totals is window-
    summed (tiny — one row per partition) and broadcast back as base
    offsets. Offsets are identical for ANY partitioning of the same
    input — range boundaries cancel out of a prefix sum."""
    toks = docs.select(
        F.col(id_col), F.size(_words(text_col)).cast("long").alias("n_tokens")
    ).repartitionByRange(F.col(id_col)).sortWithinPartitions(id_col)
    # Pin the range exchange to ONE physical RDD (lazy local checkpoint —
    # materialized by the query's own action): the per-partition totals
    # subplan and the main window both read spark_partition_id() over this
    # shuffle, and correctness requires both to see the SAME sampled range
    # boundaries. Exchange reuse usually guarantees that, but it is a
    # planner optimization, not a contract (ADVICE r5 #1); the checkpoint
    # makes the shared partitioning structural.
    toks = toks.localCheckpoint(eager=False)
    part = toks.withColumn("_pid", F.spark_partition_id())
    totals = part.groupBy("_pid").agg(F.sum("n_tokens").alias("_t"))
    wtot = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = totals.select(
        "_pid", F.coalesce(F.sum("_t").over(wtot), F.lit(0)).alias("_base")
    )
    wpart = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        part.withColumn(
            "_local", F.coalesce(F.sum("n_tokens").over(wpart), F.lit(0))
        )
        .join(F.broadcast(bases), "_pid")
        .select(
            id_col,
            "n_tokens",
            (F.col("_base") + F.col("_local")).alias("offset"),
            F.floor((F.col("_base") + F.col("_local")) / seq_len)
            .cast("long")
            .alias("chunk_id"),
            ((F.col("_base") + F.col("_local")) % seq_len).alias(
                "pos_in_chunk"
            ),
            # boundaries strictly inside (offset, offset + n_tokens)
            F.greatest(
                F.lit(0),
                F.floor(
                    (F.col("_base") + F.col("_local")
                     + F.col("n_tokens") - 1) / seq_len
                ).cast("long")
                - F.floor(
                    (F.col("_base") + F.col("_local")) / seq_len
                ).cast("long"),
            ).alias("n_splits"),
        )
    )


def hash_ngram_score(docs: DataFrame, n_buckets: int = 997,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Fasttext-style hashed-n-gram linear scorer — the model-scoring
    pass a web pipeline runs to keep/drop documents (CCNet / RedPajama
    quality filters, public): hash each unigram and bigram into
    ``n_buckets``, look up a deterministic weight per bucket, and score
    the doc as the mean feature weight; ``keep`` is the thresholded
    decision.

    The weight table is a closed-form hash of the bucket id (a stand-in
    for broadcast-joining a trained table — the data movement is
    identical, the arithmetic is reproducible in any engine), so a SQL
    oracle can replay scoring bit-for-bit. Everything is one map-only
    Catalyst projection: transform + aggregate over the token array, no
    explode, no shuffle, no Python per row — the ideal 100-TB shape for
    per-doc model scoring (with a real model, the weight lookup becomes
    a broadcast map over the same feature stream)."""
    def bucket(expr: str) -> str:
        return (f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"
                f" % {n_buckets}")

    # deterministic per-bucket weight in [-0.5, 0.5): a fixed LCG-style
    # mix that both Spark and the SQL oracle compute identically. The
    # weight is a dyadic rational (k/1024), so per-doc sums are EXACT in
    # double and the score is independent of summation order — an
    # engine-neutral contract no float-tolerance can give
    # NB: 1024.0D, not 1024.0 — Spark parses a bare decimal literal as
    # DECIMAL and the division would silently truncate to 6 digits
    def weight(b: str) -> str:
        return f"((({b}) * 40503 + 17) % 1024) / 1024.0D - 0.5D"

    uni = f"transform(w, x -> {weight(bucket('x'))})"
    # slice is 1-based but array subscripts are 0-based in Spark SQL:
    # sliced element i (0-based) pairs with original element w[i + 1]
    bi = (f"transform(slice(w, 1, greatest(size(w) - 1, 0)),"
          f" (x, i) -> {weight(bucket(f'''concat(x, ' ', w[i + 1])'''))})")
    feats = f"concat({uni}, {bi})"
    score = (f"aggregate({feats}, cast(0.0 as double), (a, x) -> a + x)"
             f" / greatest(size(w) * 2 - 1, 1)")
    return docs.select(
        F.col(id_col),
        _words(text_col).alias("w"),
    ).select(
        id_col,
        F.size("w").cast("long").alias("n_tokens"),
        F.expr(score).alias("score"),
    ).select(
        id_col,
        "n_tokens",
        "score",
        (F.col("score") > 0).alias("keep"),
    )


def span_dup_coverage(docs: DataFrame, n: int = 5, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """C4-style duplicated-span signal (Raffel et al. 2020 §2.2, public
    paper: "we discarded all but one of any three-sentence span
    occurring more than once in the data set"): slide an n-word window
    over every doc, count each window's occurrences corpus-wide, and
    report per doc how many of its windows are globally duplicated and
    what fraction of its words a duplicated window covers — the span
    statistic the drop-or-trim decision consumes.

    Scale shape: windows are hashed to int64 BEFORE the explode (8-byte
    shuffle keys); the global count is one map-side-combining groupBy on
    the hash; the flag join is a hash-partitioned equi-join (both sides
    shuffle on g once — never broadcast, the count table is corpus-sized
    at 100 TB); the exact word-coverage union runs per doc with window
    functions over ONLY the duplicated spans (a small fraction of the
    stream), via gaps-and-islands interval merge — no Python per row, no
    driver state."""
    gram = (
        f"cast(conv(substr(md5(array_join(slice(w, i + 1, {n}), ' ')),"
        f" 1, 15), 16, 10) as bigint)"
    )
    spans = (
        docs.select(F.col(id_col), _words(text_col).alias("w"))
        .select(
            id_col,
            F.size("w").alias("n_words"),
            F.posexplode(
                F.expr(
                    f"transform(slice(w, 1, greatest(size(w) - {n - 1},"
                    f" 0)), (x, i) -> {gram})"
                )
            ).alias("pos", "g"),
        )
    )
    # three consumers (global counts, per-doc totals, flag join) would
    # each re-run the md5-hashing explode; one lazy materialization of
    # the already-slim (id, n_words, pos, g) stream trades a
    # MEMORY_AND_DISK write for two full re-hash passes — the same trade
    # a production pipeline makes by materializing the span table once
    spans = spans.localCheckpoint(eager=False)
    counts = spans.groupBy("g").agg(F.count(F.lit(1)).alias("c"))
    totals = spans.groupBy(id_col).agg(
        F.first("n_words").alias("n_words"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    flagged = spans.join(counts.where(F.col("c") > 1), "g").select(
        id_col, "pos"
    )
    # gaps-and-islands: a window [pos, pos+n-1] starts a new island iff
    # it does not overlap the furthest end seen so far; island coverage
    # = max(pos) + n - min(pos) (n fixed, so max end = max pos + n - 1)
    bypos = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + (n - 1)).over(
        bypos.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        flagged.withColumn(
            "brk",
            F.when(
                prev_end.isNull() | (F.col("pos") > prev_end), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("brk").over(bypos))
        .groupBy(id_col, "island")
        .agg((F.max("pos") + n - F.min("pos")).alias("cl"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_nisl"),
            F.sum("cl").alias("covered_words"),
        )
    )
    ndup = flagged.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_dup_spans"))
    return (
        totals.join(ndup, id_col, "left")
        .join(islands.drop("_nisl"), id_col, "left")
        .select(
            id_col,
            "n_words",
            "n_spans",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("covered_words", F.lit(0)).alias("covered_words"),
            F.when(F.col("n_words") > 0,
                   F.coalesce("covered_words", F.lit(0))
                   / F.col("n_words"))
            .otherwise(F.lit(0.0))
            .alias("dup_cover_frac"),
        )
    )


def contamination_join(corpus: DataFrame, benchmark: DataFrame, n: int = 4,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Benchmark decontamination: for every corpus doc, the number of
    distinct word n-grams it shares with the benchmark set and how many
    distinct benchmark docs it collides with. Docs with zero overlap are
    absent (inner join) — the common pipeline drops or flags the rest.

    Scale shape: the benchmark side (eval sets — thousands of docs, not
    billions) is broadcast, so the 100-TB corpus n-gram stream never
    shuffles for the join; the only shuffle is the final per-doc count,
    which map-side partial aggregation keeps proportional to the number
    of CONTAMINATED docs, not the gram count."""
    grams = word_ngrams(corpus, n, id_col, text_col)
    bench = (
        word_ngrams(benchmark, n, id_col, text_col)
        .select(F.col(id_col).alias("bench_doc"), "g")
        .distinct()
    )
    return (
        grams.join(F.broadcast(bench), "g")
        .groupBy(id_col)
        .agg(
            F.countDistinct("g").alias("n_hit_grams"),
            F.countDistinct("bench_doc").alias("n_bench_docs"),
        )
    )


def repetition_signals(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals per document (Rae et al.
    2021, public): the fraction of tokens that are repeats, the share of
    bigram occurrences belonging to the single most frequent bigram, and
    the share belonging to any repeated bigram. High values mark
    boilerplate/spam for filtering before training.

    Distributed shape: one explode of the bigram stream, a (doc, bigram)
    count, then a per-doc rollup — both aggregations get map-side
    partial combine, and no state ever exceeds one doc's distinct
    bigrams per key. Everything is Catalyst; no Python in the row path."""
    base = docs.select(F.col(id_col), _words(text_col).alias("w")).select(
        id_col,
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct_words"),
        F.explode_outer(
            F.expr(
                "transform(slice(w, 1, greatest(size(w) - 1, 0)),"
                " (x, i) -> concat(x, ' ', w[i + 1]))"
            )
        ).alias("bg"),
    )
    counts = (
        base.groupBy(id_col, "n_words", "n_distinct_words", "bg")
        .agg(F.count("*").alias("c"))
    )
    has_bg = F.max(F.col("bg").isNotNull().cast("long")) == 1
    n_bigrams = F.sum(F.when(F.col("bg").isNotNull(), F.col("c")).otherwise(F.lit(0)))
    return counts.groupBy(id_col, "n_words", "n_distinct_words").agg(
        n_bigrams.alias("n_bigrams"),
        F.when(has_bg, F.max("c") / n_bigrams).otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(
            has_bg,
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            / n_bigrams,
        )
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    ).select(
        id_col,
        "n_words",
        "n_bigrams",
        (
            F.lit(1.0)
            - F.col("n_distinct_words") / F.col("n_words")
        ).alias("dup_word_frac"),
        "top_bigram_frac",
        "dup_bigram_frac",
    )


# Redaction passes run in list order: emails first (an email's host part
# can look like an IP), then IPs, then phones — each pattern is counted
# against the ORIGINAL text but replaced cumulatively.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,2}-\d{3}-\d{3}-\d{4}", "<PHONE>"),
]


def pii_scrub(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-document PII redaction — the scrub pass a web-text pipeline
    runs before training-data release: count and replace emails, IPv4
    addresses, and international-format phone numbers with typed
    placeholder tokens.

    Entirely Catalyst ``regexp_count``/``regexp_replace`` expressions
    (JVM-side, whole-stage codegen, no Python per row; the patterns use
    only character classes and bounded quantifiers so Java-regex and
    RE2 semantics agree). Returns per-doc match counts, the redacted
    length, and an md5-prefix int64 signature of the redacted text so a
    correctness oracle can pin the exact replacement output, not just
    the counts."""
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{key}")
        for key, pat, _ in PII_PATTERNS
    ]
    red = t
    for _key, pat, token in PII_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return docs.select(
        F.col(id_col),
        *counts,
        F.length(red).cast("long").alias("redacted_len"),
        F.conv(F.substring(F.md5(red), 1, 15), 16, 10)
        .cast("long")
        .alias("redacted_sig"),
    )


def url_normalize(url: Column) -> Column:
    """Canonicalize a URL for exact dedup, entirely in Catalyst
    expressions (JVM-side, whole-stage codegen — no Python per row):

    1. strip the ``#fragment``
    2. lowercase the scheme and host[:port] (path case is preserved)
    3. drop the scheme's default port (``:80`` http, ``:443`` https)
    4. drop ``utm_*`` tracking params, sort the surviving query params
    5. an empty path becomes ``/``

    The canonical web-pipeline first pass: exact dedup by normalized URL
    removes the bulk of recrawl duplicates before any content hashing."""
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda x: (x != "") & ~x.startswith("utm_"),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
