"""SimHash near-dup detection + multimodal binary plumbing."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from s2geo_spark.operators import multimodal, textops


def test_simhash_near_dups_close_far(spark):
    base = "the quick brown fox jumps over the lazy dog " * 20
    near = base.replace("lazy", "sleepy", 1)  # single-token edit
    far = "completely different content about spark joins and hash tables " * 20
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "text": [base, near, far]})
    df = spark.createDataFrame(pdf)
    sigs = df.select("doc_id", textops.simhash64("text").alias("sig")).orderBy("doc_id")
    rows = {r["doc_id"]: np.uint64(np.int64(r["sig"])) for r in sigs.collect()}
    d12 = bin(int(rows[1] ^ rows[2])).count("1")
    d13 = bin(int(rows[1] ^ rows[3])).count("1")
    assert d12 < d13, (d12, d13)
    assert d12 <= 12  # near-dup: few bits differ

    pairs = textops.simhash_near_dup_pairs(df, band_bits=8).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in got


def test_hamming_column(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [0b1011], "b": [0b0010]}))
    out = df.select(textops.hamming64(F.col("a"), F.col("b")).alias("d")).collect()
    assert out[0]["d"] == 2


def test_media_meta_extraction(spark):
    payloads = [
        b"\x89PNG\r\n\x1a\n" + b"x" * 100,
        b"\xff\xd8\xff\xe0" + b"y" * 50,
        b"<html><body>hi</body></html>",
        None,
    ]
    pdf = pd.DataFrame({"key": ["a", "b", "c", "d"], "blob": payloads})
    df = spark.createDataFrame(pdf)
    out = (
        multimodal.extract_media_meta(df, "key", "blob")
        .orderBy("key")
        .toPandas()
    )
    assert out["format"].tolist() == ["png", "jpeg", "html", "unknown"]
    assert out["n_bytes"].tolist() == [108, 54, 28, 0]
    assert all(len(f) == 8 for f in out["feature"])
    # deterministic: rerun gives identical features
    out2 = (
        multimodal.extract_media_meta(df, "key", "blob").orderBy("key").toPandas()
    )
    assert all(
        list(f1) == list(f2) for f1, f2 in zip(out["feature"], out2["feature"])
    )
