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


def test_url_normalize(spark):
    from pyspark.sql import functions as F

    from s2geo_spark.operators.textops import url_normalize

    cases = [
        # (raw, canonical)
        ("HTTP://ExAmPle.COM:80/Page/1?z=2&a=1#frag",
         "http://example.com/Page/1?a=1&z=2"),
        ("https://Host.net:443/p", "https://host.net/p"),
        ("https://host.net:8443/p", "https://host.net:8443/p"),  # non-default kept
        ("http://a.com", "http://a.com/"),                       # empty path
        ("http://a.com?utm_source=x&utm_medium=y", "http://a.com/"),
        ("http://a.com/p?b=2&a=1&utm_campaign=z", "http://a.com/p?a=1&b=2"),
        ("http://a.com/CaseKept/Path", "http://a.com/CaseKept/Path"),
        ("http://a.com:443/p", "http://a.com:443/p"),  # :443 not http default
        ("http://a.com/#only-frag", "http://a.com/"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "raw string")
    got = [
        r["n"] for r in
        df.select(url_normalize(F.col("raw")).alias("n")).collect()
    ]
    assert got == [c for _, c in cases]


class TestRepetitionSignals:
    def _run(self, spark, texts):
        from s2geo_spark.operators.textops import repetition_signals

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return {
            r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()
        }

    def test_all_distinct(self, spark):
        r = self._run(spark, ["a b c d"])[0]
        assert r["n_words"] == 4 and r["n_bigrams"] == 3
        assert r["dup_word_frac"] == 0.0
        assert r["top_bigram_frac"] == 1.0 / 3
        assert r["dup_bigram_frac"] == 0.0

    def test_fully_repetitive(self, spark):
        # "x x x x x": 4 identical bigrams, 1 distinct word of 5
        r = self._run(spark, ["x x x x x"])[0]
        assert r["n_bigrams"] == 4
        assert r["dup_word_frac"] == 1.0 - 1.0 / 5
        assert r["top_bigram_frac"] == 1.0
        assert r["dup_bigram_frac"] == 1.0

    def test_single_word_doc(self, spark):
        # no bigrams: fractions must be 0.0, not null/NaN
        r = self._run(spark, ["lonely"])[0]
        assert r["n_words"] == 1 and r["n_bigrams"] == 0
        assert r["top_bigram_frac"] == 0.0
        assert r["dup_bigram_frac"] == 0.0
        assert r["dup_word_frac"] == 0.0

    def test_mixed_counts(self, spark):
        # "a b a b c": bigrams = a-b, b-a, a-b, b-c; top = a-b (2/4),
        # dup occurrences = 2/4; distinct words 3 of 5
        r = self._run(spark, ["a b a b c", "q r"])[0]
        assert r["n_bigrams"] == 4
        assert r["top_bigram_frac"] == 0.5
        assert r["dup_bigram_frac"] == 0.5
        assert r["dup_word_frac"] == 1.0 - 3.0 / 5


class TestDomainCap:
    def test_cap_and_determinism(self, spark):
        from s2geo_spark.operators.textops import domain_cap

        rows = [(i, f"d{i % 3}") for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = domain_cap(df, k=4).collect()
        by_dom = {}
        for r in out:
            by_dom.setdefault(r["source"], []).append(r)
        assert set(by_dom) == {"d0", "d1", "d2"}
        for docs in by_dom.values():
            assert len(docs) == 4
            assert sorted(r["rank"] for r in docs) == [1, 2, 3, 4]
            # kept set is the 4 smallest priority hashes — reproducible
            assert [r["doc_id"] for r in sorted(docs, key=lambda r: r["rank"])] \
                == [r["doc_id"] for r in sorted(docs, key=lambda r: (r["prio"], r["doc_id"]))]
        # shuffled input order yields the identical kept set
        df2 = spark.createDataFrame(list(reversed(rows)), "doc_id long, source string")
        out2 = domain_cap(df2, k=4).collect()
        assert sorted((r["doc_id"], r["rank"]) for r in out2) \
            == sorted((r["doc_id"], r["rank"]) for r in out)

    def test_small_domain_kept_whole(self, spark):
        from s2geo_spark.operators.textops import domain_cap

        df = spark.createDataFrame(
            [(1, "tiny"), (2, "tiny")], "doc_id long, source string"
        )
        out = domain_cap(df, k=10).collect()
        assert len(out) == 2


class TestPackSequences:
    def _run(self, spark, token_counts, seq_len=10):
        from s2geo_spark.operators.textops import pack_sequences

        df = spark.createDataFrame(
            [(i, " ".join(["t"] * n)) for i, n in enumerate(token_counts)],
            "doc_id long, text string",
        )
        return {
            r["doc_id"]: r.asDict()
            for r in pack_sequences(df, seq_len=seq_len).collect()
        }

    def test_hand_computed_offsets(self, spark):
        # token counts [4, 7, 3, 12] at L=10:
        # offsets 0,4,11,14; chunks 0,0,1,1; splits 0,1,0,1
        out = self._run(spark, [4, 7, 3, 12])
        got = [
            (out[i]["offset"], out[i]["chunk_id"],
             out[i]["pos_in_chunk"], out[i]["n_splits"])
            for i in range(4)
        ]
        assert got == [(0, 0, 0, 0), (4, 0, 4, 1), (11, 1, 1, 0),
                       (14, 1, 4, 1)]

    def test_partition_count_invariant(self, spark):
        # range boundaries cancel out of a prefix sum: any shuffle
        # partition count yields identical offsets
        counts = [3, 9, 1, 14, 6, 2, 8, 5]
        old = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "1")
            a = self._run(spark, counts)
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            b = self._run(spark, counts)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        assert a == b

    def test_total_conservation(self, spark):
        counts = [5, 0, 11, 7]
        out = self._run(spark, counts)
        last = out[3]
        assert last["offset"] + last["n_tokens"] == sum(counts)

    def test_zero_token_doc(self, spark):
        out = self._run(spark, [10, 0, 4])
        r = out[1]
        assert r["n_tokens"] == 0 and r["offset"] == 10
        assert r["n_splits"] == 0


class TestHashNgramScore:
    @staticmethod
    def _ref_score(text, n_buckets=997):
        # independent reimplementation: md5-prefix bucket, LCG weight
        import hashlib

        def wgt(s):
            b = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % n_buckets
            return ((b * 40503 + 17) % 1024) / 1024.0 - 0.5

        w = [t for t in text.split(" ") if t]
        feats = [wgt(x) for x in w]
        feats += [wgt(f"{a} {b}") for a, b in zip(w, w[1:])]
        return sum(feats) / max(len(w) * 2 - 1, 1)

    def _run(self, spark, texts):
        from s2geo_spark.operators.textops import hash_ngram_score

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return {
            r["doc_id"]: r.asDict() for r in hash_ngram_score(df).collect()
        }

    def test_matches_python_reference(self, spark):
        texts = ["the quick brown fox", "lorem ipsum dolor sit amet", "x"]
        out = self._run(spark, texts)
        for i, t in enumerate(texts):
            assert out[i]["score"] == self._ref_score(t), t
            assert out[i]["keep"] == (self._ref_score(t) > 0)

    def test_empty_doc_scores_zero(self, spark):
        r = self._run(spark, ["", "   "])
        for i in (0, 1):
            assert r[i]["n_tokens"] == 0
            assert r[i]["score"] == 0.0
            assert r[i]["keep"] is False

    def test_map_only_plan(self, spark):
        from s2geo_spark.operators.textops import hash_ngram_score

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = (
            hash_ngram_score(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_score_is_exact_dyadic_sum(self, spark):
        # weights are k/1024, so score * (2n-1) * 1024 must be an exact
        # integer — the property that makes the oracle float-tolerance-free
        out = self._run(spark, ["alpha beta gamma delta epsilon zeta"])
        r = out[0]
        v = r["score"] * (r["n_tokens"] * 2 - 1) * 1024
        assert v == round(v)


class TestSpanDupCoverage:
    def _run(self, spark, texts, n=5):
        from s2geo_spark.operators.textops import span_dup_coverage

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return {
            r["doc_id"]: r.asDict()
            for r in span_dup_coverage(df, n=n).collect()
        }

    def test_cross_doc_shared_span(self, spark):
        # "a b c d e" appears in both docs; each doc has exactly one
        # duplicated window covering 5 of its 8 words
        out = self._run(
            spark, ["a b c d e f g h", "x a b c d e y z"]
        )
        for i in (0, 1):
            r = out[i]
            assert r["n_words"] == 8 and r["n_spans"] == 4
            assert r["n_dup_spans"] == 1
            assert r["covered_words"] == 5
            assert r["dup_cover_frac"] == 5 / 8

    def test_within_doc_repeat_and_island_merge(self, spark):
        # "p q r s t u" twice: windows pqrst (pos 0,6) and qrstu
        # (pos 1,7) are duplicated; overlapping intervals merge into two
        # islands of 6 words each -> full coverage
        r = self._run(spark, ["p q r s t u p q r s t u"])[0]
        assert r["n_spans"] == 8
        assert r["n_dup_spans"] == 4
        assert r["covered_words"] == 12
        assert r["dup_cover_frac"] == 1.0

    def test_no_duplicates(self, spark):
        r = self._run(spark, ["one two three four five six"])[0]
        assert r["n_dup_spans"] == 0
        assert r["covered_words"] == 0
        assert r["dup_cover_frac"] == 0.0

    def test_short_doc_absent(self, spark):
        # a doc with fewer than n words yields no windows and no row
        # (same contract as the SQL oracle)
        out = self._run(spark, ["a b c", "v w x y z v w x y z"])
        assert 0 not in out
        assert out[1]["n_spans"] == 6


class TestPiiScrub:
    def _run(self, spark, texts):
        from s2geo_spark.operators.textops import pii_scrub

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        return {r["doc_id"]: r.asDict() for r in pii_scrub(df).collect()}

    def test_counts_and_redaction(self, spark):
        r = self._run(
            spark,
            ["mail a.b+c@sub.example.org or call +1-555-123-4567 "
             "from 192.168.0.1 now"],
        )[0]
        assert r["n_email"] == 1
        assert r["n_phone"] == 1
        assert r["n_ip"] == 1
        redacted = "mail <EMAIL> or call <PHONE> from <IP> now"
        assert r["redacted_len"] == len(redacted)

    def test_ip_host_mailbox(self, spark):
        # "admin@10.0.0.1" is NOT an email under the pattern (the host
        # lacks an alphabetic TLD), so the IP pass redacts the address
        # part instead
        r = self._run(spark, ["ping admin@10.0.0.1 soon"])[0]
        assert r["n_email"] == 0
        assert r["n_ip"] == 1
        assert r["redacted_len"] == len("ping admin@<IP> soon")

    def test_email_with_digit_dot_local_part(self, spark):
        # the email pass runs FIRST: a local part that ends in an
        # IP-like digit run is consumed whole by <EMAIL>, so no <IP>
        # token appears in the redacted text even though the IP count
        # (against the original text) sees the digit run
        r = self._run(spark, ["see 10.0.0.1@ex.com ok"])[0]
        assert r["n_email"] == 1
        assert r["n_ip"] == 1
        assert r["redacted_len"] == len("see <EMAIL> ok")

    def test_clean_text_untouched(self, spark):
        txt = "no personal data here just words and numbers 42"
        r = self._run(spark, [txt])[0]
        assert (r["n_email"], r["n_phone"], r["n_ip"]) == (0, 0, 0)
        assert r["redacted_len"] == len(txt)

    def test_multiple_matches_per_doc(self, spark):
        r = self._run(
            spark, ["a@b.co c@d.org 1.2.3.4 5.6.7.8 +1-555-000-1111"]
        )[0]
        assert r["n_email"] == 2
        assert r["n_ip"] == 2
        assert r["n_phone"] == 1

    def test_map_only_plan(self, spark):
        # the scrub is a pure per-row projection: no exchange anywhere
        from s2geo_spark.operators.textops import pii_scrub

        df = spark.createDataFrame(
            [(1, "x@y.zz")], "doc_id long, text string"
        )
        plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestContamination:
    def test_ngrams_match_python(self, spark):
        from s2geo_spark.operators.textops import word_ngrams

        texts = ["a b c d e", "a b c", "x  y z w", ""]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            (r["doc_id"], r["g"])
            for r in word_ngrams(df, 3, hashed=False).collect()
        }
        want = set()
        for i, t in enumerate(texts):
            w = [x for x in t.split(" ") if x]
            want |= {(i, " ".join(w[j:j + 3])) for j in range(len(w) - 2)}
        assert got == want

    def test_overlap_counts(self, spark):
        from s2geo_spark.operators.textops import contamination_join

        bench = spark.createDataFrame(
            [(100, "the quick brown fox jumps"),
             (101, "pack my box with five dozen jugs")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [(0, "see the quick brown fox jumps high"),   # 2 shared 4-grams
             (1, "pack my box with nothing"),             # 1 shared (both?)
             (2, "totally disjoint words here")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in
                contamination_join(corpus, bench, n=4).collect()}
        assert set(rows) == {0, 1}
        assert rows[0]["n_hit_grams"] == 2 and rows[0]["n_bench_docs"] == 1
        assert rows[1]["n_hit_grams"] == 1 and rows[1]["n_bench_docs"] == 1

    def test_benchmark_side_broadcast(self, spark):
        from s2geo_spark.operators.textops import contamination_join

        df = spark.range(100).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("w"), F.col("id").cast("string"),
                     F.lit(" a b c d e f")).alias("text"),
        )
        plan = contamination_join(
            df.where(F.col("doc_id") % 10 != 0),
            df.where(F.col("doc_id") % 10 == 0),
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestMultimodalPlumbing:
    def test_resize_schema_and_determinism(self, spark):
        import pandas as pd

        pdf = pd.DataFrame(
            {
                "key": ["a", "b"],
                "payload": [b"\x89PNG1234payload", b"\xff\xd8\xffjpegpayload"],
            }
        )
        df = spark.createDataFrame(pdf)
        from s2geo_spark.operators import multimodal as mm

        out = mm.resize_media(df, "key", "payload", 16, 8).orderBy("key").toPandas()
        assert list(out.columns) == [
            "key", "width", "height", "target_w", "target_h", "resized"
        ]
        assert (out["target_w"] == 16).all() and (out["target_h"] == 8).all()
        assert out["resized"].apply(lambda b: len(bytes(b))).eq(16 * 8).all()
        out2 = mm.resize_media(df.repartition(2), "key", "payload", 16, 8).orderBy("key").toPandas()
        assert (out["resized"].apply(bytes) == out2["resized"].apply(bytes)).all()

    def test_frame_sampling_fanout(self, spark):
        import pandas as pd

        pdf = pd.DataFrame(
            {"key": ["v1", "v2", "v3"], "payload": [b"videoA", b"videoB", b"videoC"]}
        )
        df = spark.createDataFrame(pdf)
        from s2geo_spark.operators import multimodal as mm

        out = mm.sample_frames(df, "key", "payload", n_frames=5).toPandas()
        assert len(out) == 15  # 1 -> N fan-out
        for _, grp in out.groupby("key"):
            assert sorted(grp["frame_idx"].tolist()) == [0, 1, 2, 3, 4]
        # timestamps monotone per video, deterministic across runs
        for _, grp in out.groupby("key"):
            ts = grp.sort_values("frame_idx")["ts_ms"].tolist()
            assert ts == sorted(ts) and ts[0] == 0
        out2 = mm.sample_frames(df.repartition(3), "key", "payload", n_frames=5).toPandas()
        m1 = out.sort_values(["key", "frame_idx"])["frame"].apply(bytes).tolist()
        m2 = out2.sort_values(["key", "frame_idx"])["frame"].apply(bytes).tolist()
        assert m1 == m2


class TestRealCodecs:
    """The uncompressed-container decoders are REAL struct parsers —
    round trips, golden bytes, and dispatch semantics."""

    def test_bmp_round_trip_and_golden(self):
        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        rng = np.random.default_rng(5)
        for h, w in [(1, 1), (3, 5), (6, 8), (7, 3)]:  # incl. padded rows
            px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
            assert np.array_equal(mm.decode_bmp(mm.encode_bmp(px)), px)
        # golden: 1x2 RGB [(255,0,0),(0,128,64)] -> bottom-up BGR bytes
        px = np.array([[[255, 0, 0], [0, 128, 64]]], dtype=np.uint8)
        b = mm.encode_bmp(px)
        assert b[:2] == b"BM"
        assert b[54:60] == bytes([0, 0, 255, 64, 128, 0])

    def test_ppm_wav_round_trip(self):
        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, (4, 7, 3)).astype(np.uint8)
        assert np.array_equal(mm.decode_ppm(mm.encode_ppm(px)), px)
        s = rng.integers(-32768, 32767, 321).astype(np.int16)
        rate, s2 = mm.decode_wav(mm.encode_wav(s, rate=16000))
        assert rate == 16000 and np.array_equal(s, s2)

    def test_dispatch_and_honesty(self):
        import numpy as np
        import pytest

        from s2geo_spark.operators import multimodal as mm

        px = np.zeros((2, 2, 3), dtype=np.uint8)
        assert mm.decode_media(mm.encode_bmp(px))["kind"] == "bmp"
        assert mm.decode_media(mm.encode_ppm(px))["kind"] == "ppm"
        s = np.zeros(8, dtype=np.int16)
        assert mm.decode_media(mm.encode_wav(s))["kind"] == "wav"
        assert mm.decode_media(b"random junk bytes") is None
        # baseline JPEG now REALLY decodes (operators/jpeg.py, r4) —
        # garbage after the magic raises a parse error, not a fake result
        from s2geo_spark.operators import jpeg as jp

        assert (
            mm.decode_media(jp.encode_jpeg(np.zeros((8, 8), np.uint8)))["kind"]
            == "jpeg"
        )
        with pytest.raises(Exception):
            mm.decode_media(b"\xff\xd8\xff\xe0...")
        with pytest.raises(Exception):  # PNG magic with garbage body
            mm.decode_media(b"\x89PNG\r\n\x1a\n...")

    def test_real_resize_round_trip(self, spark):
        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, (6, 9, 3)).astype(np.uint8)
        df = spark.createDataFrame(
            [("a", bytearray(mm.encode_bmp(px))), ("junk", bytearray(b"xx"))],
            "key string, payload binary",
        )
        out = mm.resize_media(df, "key", "payload", target_w=4, target_h=3).toPandas()
        row = out[out["key"] == "a"].iloc[0]
        assert (row["width"], row["height"]) == (9, 6)
        got = mm.decode_bmp(bytes(row["resized"]))
        want = mm.resize_image_nn(px, 4, 3)
        assert np.array_equal(got, want)
        # exact nearest-neighbor semantics: (0,0) maps to source (0,0)
        assert np.array_equal(got[0, 0], px[0, 0])
        junk = out[out["key"] == "junk"].iloc[0]  # stub fallback intact
        assert len(bytes(junk["resized"])) == 4 * 3

    def test_y4m_round_trip_and_real_frames(self, spark):
        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        rng = np.random.default_rng(13)
        frames = rng.integers(0, 256, (5, 4, 6)).astype(np.uint8)
        clip = mm.encode_y4m(frames, fps=10)
        dec = mm.decode_y4m(clip)
        assert dec["width"] == 6 and dec["height"] == 4 and dec["fps"] == 10
        assert np.array_equal(dec["frames"], frames)
        assert mm.decode_media(clip)["kind"] == "y4m"

        df = spark.createDataFrame(
            [("v", bytearray(clip))], "key string, payload binary"
        )
        out = (
            mm.sample_frames(df, "key", "payload", n_frames=3)
            .orderBy("frame_idx")
            .toPandas()
        )
        assert len(out) == 3
        # floor-sampled source frames 0, 1, 3 of 5; raw luma planes
        for i, src in enumerate([0, 1, 3]):
            assert bytes(out.iloc[i]["frame"]) == frames[src].tobytes()
            assert out.iloc[i]["ts_ms"] == src * 1000 // 10

    def test_png_round_trip_and_filters(self):
        import struct
        import zlib

        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        rng = np.random.default_rng(17)
        for ch in (3, 4, 1):  # RGB / RGBA / greyscale
            px = rng.integers(0, 256, (5, 7, ch)).astype(np.uint8)
            assert np.array_equal(mm.decode_png(mm.encode_png(px)), px)
        # hand-filter a stream with all five filter types; the decoder
        # (which our encoder never exercises past type 0) must undo them
        px = rng.integers(0, 256, (5, 4, 3)).astype(np.uint8)
        h, w, ch = px.shape
        stride = w * ch
        flat = px.reshape(h, stride).astype(np.int64)
        raw = bytearray()
        for y, ft in enumerate([0, 1, 2, 3, 4]):
            prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
            row = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = flat[y][i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (flat[y][i] - pred) & 255
            raw.append(ft)
            raw += bytes(row.astype(np.uint8))
        idat = zlib.compress(bytes(raw))

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
            )

        payload = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", idat)
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(mm.decode_png(payload), px)
        assert mm.decode_media(mm.encode_png(px))["kind"] == "png"

    def test_bmp_paletted_and_32bpp(self):
        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        rng = np.random.default_rng(41)
        # 8bpp paletted: indices expand through the BGRX color table
        plte = rng.integers(0, 256, (256, 3)).astype(np.uint8)
        idx = rng.integers(0, 256, (5, 7)).astype(np.uint8)
        assert np.array_equal(
            mm.decode_bmp(mm.encode_bmp(idx, palette=plte)), plte[idx]
        )
        # short palette with biClrUsed set
        plte4 = rng.integers(0, 256, (4, 3)).astype(np.uint8)
        idx4 = rng.integers(0, 4, (3, 9)).astype(np.uint8)
        assert np.array_equal(
            mm.decode_bmp(mm.encode_bmp(idx4, palette=plte4)), plte4[idx4]
        )
        # 32bpp BGRA round trip keeps alpha
        px = rng.integers(0, 256, (6, 5, 4)).astype(np.uint8)
        assert np.array_equal(mm.decode_bmp(mm.encode_bmp(px)), px)
        # 24bpp still exact
        px3 = rng.integers(0, 256, (4, 6, 3)).astype(np.uint8)
        assert np.array_equal(mm.decode_bmp(mm.encode_bmp(px3)), px3)
        assert mm.decode_media(mm.encode_bmp(idx, palette=plte))["kind"] == "bmp"

    def test_wav_stereo_and_8bit(self):
        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        rng = np.random.default_rng(43)
        # stereo 16-bit
        st = rng.integers(-30000, 30000, (50, 2)).astype(np.int16)
        rate, out = mm.decode_wav(mm.encode_wav(st, rate=44100))
        assert rate == 44100 and out.shape == (50, 2)
        assert np.array_equal(out, st)
        # mono 8-bit, recentered round trip
        m8 = rng.integers(-128, 128, 33).astype(np.int16)
        rate, out = mm.decode_wav(mm.encode_wav(m8, bits=8))
        assert np.array_equal(out, m8) and out.dtype == np.int16
        # stereo 8-bit
        s8 = rng.integers(-128, 128, (21, 2)).astype(np.int16)
        _, out = mm.decode_wav(mm.encode_wav(s8, bits=8))
        assert np.array_equal(out, s8)
        # mono 16-bit unchanged (1-D shape preserved)
        m16 = rng.integers(-100, 100, 20).astype(np.int16)
        _, out = mm.decode_wav(mm.encode_wav(m16))
        assert out.shape == (20,) and np.array_equal(out, m16)

    def test_png_adam7_round_trip(self):
        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        rng = np.random.default_rng(23)
        # sizes chosen to leave Adam7 passes empty (anything < 8 wide or
        # tall skips at least one pass entirely)
        for h, w in [(1, 1), (1, 9), (3, 3), (4, 5), (7, 2), (8, 8),
                     (9, 17), (16, 5)]:
            for ch in (3, 1, 4):
                px = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
                ilc = mm.encode_png(px, interlace=True)
                seq = mm.encode_png(px)
                assert ilc != seq
                assert np.array_equal(mm.decode_png(ilc), px), (h, w, ch)

    def test_png_paletted(self):
        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        rng = np.random.default_rng(29)
        plte = rng.integers(0, 256, (256, 3)).astype(np.uint8)
        idx = rng.integers(0, 256, (11, 6)).astype(np.uint8)
        payload = mm.encode_png(idx, palette=plte)
        assert np.array_equal(mm.decode_png(payload), plte[idx])
        # paletted + interlaced combined
        payload2 = mm.encode_png(idx, palette=plte, interlace=True)
        assert np.array_equal(mm.decode_png(payload2), plte[idx])
        # dispatcher sees a normal RGB image
        dec = mm.decode_media(payload)
        assert dec["kind"] == "png" and dec["width"] == 6 and dec["height"] == 11

    def test_png_trns_raises(self):
        import struct
        import zlib

        import numpy as np
        import pytest

        from s2geo_spark.operators import multimodal as mm

        plte = np.zeros((4, 3), dtype=np.uint8)
        idx = np.zeros((2, 2), dtype=np.uint8)
        payload = bytearray(mm.encode_png(idx, palette=plte))
        # splice a tRNS chunk in before IDAT
        i = bytes(payload).index(b"IDAT") - 4
        trns = struct.pack(">I", 1) + b"tRNS" + b"\x00"
        trns += struct.pack(">I", zlib.crc32(b"tRNS\x00") & 0xFFFFFFFF)
        payload[i:i] = trns
        with pytest.raises(NotImplementedError, match="tRNS"):
            mm.decode_png(bytes(payload))

    def test_gif_lzw_round_trip(self, spark):
        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        rng = np.random.default_rng(23)
        # LZW torture: deep chains, random, runs, dictionary resets
        for data in [
            np.tile(np.arange(16, dtype=np.uint8), 2000),
            rng.integers(0, 256, 30000).astype(np.uint8),
            np.repeat(np.arange(256, dtype=np.uint8), 100),
            np.zeros(50000, dtype=np.uint8),
        ]:
            comp = mm._lzw_compress(data, 8)
            assert np.array_equal(mm._lzw_decompress(comp, 8), data)
        # multi-frame GIF round trip + real frame sampling (RGB render)
        frames = rng.integers(0, 256, (4, 6, 8)).astype(np.uint8)
        g = mm.encode_gif(frames)
        dec = mm.decode_gif(g)
        assert np.array_equal(dec["frames"], frames)
        df = spark.createDataFrame(
            [("g", bytearray(g))], "key string, payload binary"
        )
        out = (
            mm.sample_frames(df, "key", "payload", n_frames=2)
            .orderBy("frame_idx")
            .toPandas()
        )
        pal = mm._gif_palette()
        assert bytes(out.iloc[0]["frame"]) == pal[frames[0]].tobytes()
        assert bytes(out.iloc[1]["frame"]) == pal[frames[2]].tobytes()


class TestGifFps:
    """GIF frame-rate derivation: float fps from the FIRST GCE delay, with
    per-frame delays preserved for mixed-delay animations (ADVICE r4)."""

    def test_fps_is_float_not_truncated(self):
        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        frames = np.zeros((2, 4, 4), dtype=np.uint8)
        dec = mm.decode_gif(mm.encode_gif(frames, delay_cs=3))
        assert abs(dec["fps"] - 100.0 / 3.0) < 1e-9  # 33.33, not 33
        assert dec["frame_delays_cs"] == [3, 3]

    def test_mixed_delays_use_first_gce(self):
        import struct

        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        frames = np.zeros((2, 4, 4), dtype=np.uint8)
        g = bytearray(mm.encode_gif(frames, delay_cs=5))
        # rewrite the SECOND frame's GCE delay to 20cs; fps must still come
        # from the first (5cs -> 20 fps), and both delays must be reported
        hits = []
        i = 0
        while True:
            i = g.find(b"\x21\xf9\x04", i)
            if i < 0:
                break
            hits.append(i)
            i += 1
        assert len(hits) == 2
        struct.pack_into("<H", g, hits[1] + 4, 20)
        dec = mm.decode_gif(bytes(g))
        assert dec["fps"] == 20.0
        assert dec["frame_delays_cs"] == [5, 20]


class TestGifInterlace:
    """Interlaced GIF frames (GIF89a Appendix E four-pass row order):
    encode writes rows in pass order with the descriptor flag set, decode
    scatters them back — round trips must be bit-exact for any height."""

    def test_interlace_order_is_a_permutation(self):
        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        for h in range(1, 40):
            order = mm._gif_interlace_order(h)
            assert sorted(order.tolist()) == list(range(h))

    def test_interlaced_round_trip(self):
        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        rng = np.random.default_rng(31)
        # heights chosen to hit empty passes (h<5 leaves pass 2 empty, etc.)
        for h in (1, 2, 3, 4, 5, 8, 9, 16, 17):
            frames = rng.integers(0, 256, (2, h, 7)).astype(np.uint8)
            g = mm.encode_gif(frames, interlace=True)
            dec = mm.decode_gif(g)
            assert np.array_equal(dec["frames"], frames), h

    def test_interlaced_differs_on_wire_matches_decoded(self):
        import numpy as np

        from s2geo_spark.operators import multimodal as mm

        rng = np.random.default_rng(37)
        frames = rng.integers(0, 256, (1, 16, 6)).astype(np.uint8)
        seq = mm.encode_gif(frames)
        ilc = mm.encode_gif(frames, interlace=True)
        assert seq != ilc  # wire bytes differ (row order + flag)
        assert np.array_equal(mm.decode_gif(seq)["frames"],
                              mm.decode_gif(ilc)["frames"])


class TestH264Meta:
    """Header-level H.264: real SPS dims (with cropping), VUI frame rate,
    picture count from slice headers — while slice decode raises."""

    @staticmethod
    def _build_stream(n_pics=3):
        # hand-assembled Annex-B stream (ITU-T H.264 7.3.2.1.1)
        class BW:
            def __init__(self):
                self.bits = []

            def u(self, v, n):
                for i in range(n - 1, -1, -1):
                    self.bits.append((v >> i) & 1)

            def ue(self, v):
                k = v + 1
                nbits = k.bit_length()
                self.u(0, nbits - 1)
                self.u(k, nbits)

            def bytes_(self):
                bits = self.bits + [1]  # rbsp_stop_one_bit
                while len(bits) % 8:
                    bits.append(0)
                out = bytearray()
                for i in range(0, len(bits), 8):
                    b = 0
                    for bit in bits[i : i + 8]:
                        b = (b << 1) | bit
                    out.append(b)
                return bytes(out)

        def ep(rbsp):  # emulation prevention: 00 00 0x -> 00 00 03 0x
            out = bytearray()
            zeros = 0
            for b in rbsp:
                if zeros >= 2 and b <= 3:
                    out.append(3)
                    zeros = 0
                out.append(b)
                zeros = zeros + 1 if b == 0 else 0
            return bytes(out)

        w = BW()
        w.u(66, 8)   # profile_idc: baseline
        w.u(0, 8)    # constraint flags
        w.u(30, 8)   # level_idc
        w.ue(0)      # sps_id
        w.ue(0)      # log2_max_frame_num_minus4
        w.ue(0)      # pic_order_cnt_type = 0
        w.ue(0)      # log2_max_pic_order_cnt_lsb_minus4
        w.ue(1)      # max_num_ref_frames
        w.u(0, 1)    # gaps_in_frame_num
        w.ue(6)      # pic_width_in_mbs_minus1 -> 112 px
        w.ue(5)      # pic_height_in_map_units_minus1 -> 96 px
        w.u(1, 1)    # frame_mbs_only_flag
        w.u(1, 1)    # direct_8x8_inference
        w.u(1, 1)    # frame_cropping_flag
        w.ue(0); w.ue(6); w.ue(0); w.ue(3)  # crop -> 100 x 90
        w.u(1, 1)    # vui_parameters_present
        w.u(0, 1)    # aspect_ratio_info_present
        w.u(0, 1)    # overscan_info_present
        w.u(0, 1)    # video_signal_type_present
        w.u(0, 1)    # chroma_loc_info_present
        w.u(1, 1)    # timing_info_present
        w.u(1001, 32)   # num_units_in_tick (carries 00 00 03 pattern)
        w.u(60000, 32)  # time_scale -> 29.97 fps
        w.u(1, 1)    # fixed_frame_rate
        sps = b"\x00\x00\x00\x01" + b"\x67" + ep(w.bytes_())
        slices = b""
        for _ in range(n_pics):
            sw = BW()
            sw.ue(0)  # first_mb_in_slice = 0 -> new picture
            slices += b"\x00\x00\x01" + b"\x65" + ep(sw.bytes_())
        return sps + slices

    def test_sps_dims_fps_frames(self):
        from s2geo_spark.operators import multimodal as mm

        meta = mm.parse_h264_meta(self._build_stream())
        assert meta["width"] == 100 and meta["height"] == 90
        assert abs(meta["fps"] - 60000 / 2002) < 1e-9  # 29.97
        assert meta["n_frames"] == 3
        assert meta["profile_idc"] == 66

    def test_decode_still_raises_meta_flows(self, spark):
        import pytest as _pytest

        from s2geo_spark.operators import multimodal as mm

        stream = self._build_stream(n_pics=2)
        assert mm._sniff_format(stream[:16]) == "h264"
        with _pytest.raises(NotImplementedError):
            mm.decode_media(stream)
        df = spark.createDataFrame(
            [("v", bytearray(stream))], "key string, payload binary"
        )
        row = mm.extract_media_meta(df, "key", "payload").collect()[0]
        assert row["format"] == "h264"
        assert row["width"] == 100 and row["height"] == 90


class TestMp3Meta:
    """MP3 header walk: real rate/bitrate/channels/frame-count/duration
    from ISO 11172-3 frame headers; audio decode raises."""

    @staticmethod
    def _frame(kbps_idx=9, sr_idx=0, padding=0, mode=3):
        # MPEG1 Layer III: FF FB (sync + version 3 + layer 1 + no CRC)
        h2 = (kbps_idx << 4) | (sr_idx << 2) | (padding << 1)
        h3 = mode << 6
        head = bytes([0xFF, 0xFB, h2, h3])
        kbps = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320, 0][kbps_idx]
        rate = [44100, 48000, 32000][sr_idx]
        ln = 1152 // 8 * kbps * 1000 // rate + padding
        return head + b"\x00" * (ln - 4)

    def test_frame_walk(self):
        from s2geo_spark.operators import multimodal as mm

        stream = self._frame() * 5  # 5 frames, 128 kbps, 44.1 kHz, mono
        meta = mm.parse_mp3_meta(stream)
        assert meta["rate"] == 44100 and meta["kbps"] == 128
        assert meta["channels"] == 1 and meta["n_frames"] == 5
        assert abs(meta["duration_sec"] - 5 * 1152 / 44100) < 1e-9

    def test_id3_skip_and_decode_raises(self, spark):
        import pytest as _pytest

        from s2geo_spark.operators import multimodal as mm

        body = self._frame(mode=0) * 3  # stereo
        tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 7]) + b"PAYLOAD"
        stream = tag + body
        assert mm._sniff_format(stream[:16]) == "mp3"
        meta = mm.parse_mp3_meta(stream)
        assert meta["channels"] == 2 and meta["n_frames"] == 3
        with _pytest.raises(NotImplementedError):
            mm.decode_media(body)
        df = spark.createDataFrame(
            [("a", bytearray(stream))], "key string, payload binary"
        )
        row = mm.extract_media_meta(df, "key", "payload").collect()[0]
        assert row["format"] == "mp3"
        assert row["width"] == 3 and row["height"] == 2
