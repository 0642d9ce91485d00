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
