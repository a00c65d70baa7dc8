"""Extension-operator semantics (SURVEY.md §2.9): dedup families, vector
similarity, text analysis, event windows, multimodal plumbing. Ground truth
comes from plain Python/numpy/duckdb computed on the same rows."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from openapc_olap_spark.operators import dedup, multimodal, similarity, text, windows

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog again and again"),
        (2, "the  quick Brown fox jumps over the lazy dog again and again"),
        (3, "The quick brown fox jumps over the lazy cat again and again"),
        (4, "Completely different text about Spark query engines at scale"),
        (5, "Der schnelle braune Fuchs springt über den faulen Hund heute"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ---------------------------------------------------------------- text (X4)

def test_token_counts(spark, docs):
    out = {r["doc_id"]: r["n"] for r in
           docs.select("doc_id", text.token_count("text").alias("n")).collect()}
    assert out[1] == 12 and out[4] == 9


def test_fingerprint_normalizes_case_and_whitespace(docs):
    fps = {r["doc_id"]: r["fp"] for r in
           docs.select("doc_id", text.fingerprint("text").alias("fp")).collect()}
    assert fps[1] == fps[2]          # case + double-space normalized away
    assert fps[1] != fps[3]


def test_detect_language(docs):
    langs = {r["doc_id"]: r["lang"] for r in
             docs.select("doc_id",
                         text.detect_language("text").alias("lang")).collect()}
    assert langs[1] == "en"
    assert langs[5] == "de"


def test_redact_pii_precedence_and_counts(spark):
    rows = [(1, "Mail a.b-c@uni-x.de or visit https://x.org/y?m=z@q.io "
                "or call 555-123-4567 now"),
            (2, "no pii here at all"),
            (3, "http://plain.example and plain@example.org")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    counts = text.pii_counts("text")
    got = {r["doc_id"]: r.asDict() for r in df.select(
        "doc_id", counts["email"].alias("e"), counts["url"].alias("u"),
        counts["phone"].alias("p"),
        text.redact_pii("text").alias("red")).collect()}
    # the email inside the URL query string is claimed by [url] (url-first)
    assert got[1]["u"] == 1 and got[1]["p"] == 1
    assert got[1]["red"] == ("Mail [email] or visit [url] "
                             "or call [phone] now")
    assert got[2]["red"] == "no pii here at all"
    assert got[3]["red"] == "[url] and [email]"


def test_repetition_ratio(spark):
    rows = [(1, "a b c a b c a b c"),       # 7 trigrams, 3 distinct
            (2, "all words totally unique here"),
            (3, "x y")]                     # shorter than n -> 0
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["r"] for r in df.select(
        "doc_id", text.repetition_ratio("text").alias("r")).collect()}
    assert got[1] == pytest.approx(1 - 3 / 7)
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_token_frequencies(spark):
    rows = [(1, "the cat sat"), (2, "the dog sat"), (3, "the the end")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["token"]: (r["n_occurrences"], r["n_docs"])
           for r in text.token_frequencies(df, "text", "doc_id").collect()}
    assert got["the"] == (4, 3)          # two in doc 3, one in each other
    assert got["sat"] == (2, 2)
    assert got["cat"] == (1, 1)


def test_shingles_and_quality_bounds(spark, docs):
    row = docs.filter("doc_id = 1").select(
        text.shingles("text", 3).alias("sh"),
        text.quality_score("text").alias("q")).first()
    assert "the quick brown" in row["sh"]
    assert len(row["sh"]) == 10      # 12 tokens -> 10 trigrams (all distinct)
    assert 0.0 <= row["q"] <= 1.0


def test_analyze_runs_on_driver_documents(spark):
    df = text.analyze(spark.read.parquet(f"{SF}/documents.parquet"))
    row = df.select(F.count(F.lit(1)).alias("n"),
                    F.sum(F.when(F.col("lang_pred").isin(
                        "en", "de", "fr", "es", "und"), 0).otherwise(1))
                    .alias("bad")).first()
    assert row["n"] == 500 and row["bad"] == 0


# --------------------------------------------------------------- dedup (X1/X2)

def test_winnow_fingerprints_match_python(spark):
    """Winnowing fingerprints match a straightforward Python reference
    (hash every k-gram, window minima, distinct), including the short-doc
    and empty-doc edge cases; and the scheme's guarantee holds: docs
    sharing a substring of length >= k + window - 1 share a fingerprint."""
    import hashlib

    from openapc_olap_spark.operators.text import with_winnow_fingerprints

    k, w = 8, 4

    def ref(text):
        t = text.lower()
        grams = [int(hashlib.md5(t[i:i + k].encode()).hexdigest()[:15], 16)
                 for i in range(len(t) - k + 1)]
        if not grams:
            return []
        if len(grams) < w:
            return [min(grams)]
        return sorted({min(grams[j:j + w]) for j in range(len(grams) - w + 1)})

    shared = "a very distinctive shared passage of text"
    rows = [(1, "The quick brown fox jumps over the lazy dog. " + shared),
            (2, shared + " surrounded by totally different material here"),
            (3, "completely unrelated content with no overlap whatsoever"),
            (4, "tiny"),          # shorter than k -> no grams
            (5, "ninechars"),     # exactly k -> one gram, short of window
            (6, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: list(r["fingerprints"]) for r in
           with_winnow_fingerprints(df, k=k, window=w).collect()}
    for did, text in rows:
        assert got[did] == ref(text), f"doc {did}"
    assert set(got[1]) & set(got[2])          # shared substring detected
    assert not (set(got[1]) & set(got[3]))


def test_winnowing_guarantee_property():
    """Winnowing's detection guarantee, property-tested in pure Python on
    the reference implementation that test_winnow_fingerprints_match_python
    proves bit-identical to the Spark operator: any two texts sharing a
    substring of length >= k + window - 1 share at least one fingerprint."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    k, w = 8, 4

    def fps(text):
        t = text.lower()
        grams = [int(hashlib.md5(t[i:i + k].encode()).hexdigest()[:15], 16)
                 for i in range(len(t) - k + 1)]
        if not grams:
            return set()
        if len(grams) < w:
            return {min(grams)}
        return {min(grams[j:j + w]) for j in range(len(grams) - w + 1)}

    alpha = st.text(alphabet="ab ", min_size=0, max_size=40)
    shared = st.text(alphabet="xyz", min_size=k + w - 1, max_size=30)

    @settings(max_examples=200, deadline=None)
    @given(pre_a=alpha, post_a=alpha, pre_b=alpha, post_b=alpha, s=shared)
    def check(pre_a, post_a, pre_b, post_b, s):
        assert fps(pre_a + s + post_a) & fps(pre_b + s + post_b)

    check()


def test_winnow_candidate_pairs_finds_copied_passage(spark):
    """Two docs sharing one long passage (and nothing else) pair up; an
    unrelated doc pairs with neither; the df-cap drops a boilerplate
    footer present in every doc."""
    from openapc_olap_spark.operators.dedup import winnow_candidate_pairs

    passage = ("this exact paragraph was copied verbatim between the two "
               "documents and is long enough to winnow")
    footer = " all rights reserved standard footer text"
    rows = [(1, "first document unique preamble. " + passage + footer),
            (2, passage + " second document entirely different tail." + footer),
            (3, "nothing in common with the others at all, none." + footer)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r["id_a"], r["id_b"]) for r in
             winnow_candidate_pairs(df, min_shared=2,
                                    doc_freq_cap=2).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_curate_matches_funnel(spark):
    """curate() (production path) and curation_funnel() (single-pass
    monitoring view) agree: kept-doc count, PII totals, token totals; the
    curated output has unique fingerprints, passes the quality bar, and
    carries no unredacted PII."""
    import re

    from openapc_olap_spark.operators import curation
    from openapc_olap_spark.operators.text import PII_PATTERNS, fingerprint

    base = ("the quick brown fox jumps over the lazy dog and then the dog "
            "chases the fox around the yard for a while ") * 3
    rows = [(1, base + "unique tail one contact a@b.com"),
            (2, base + "unique tail one contact a@b.com"),   # exact dup of 1
            (3, base + "another document with https://x.org/p linked"),
            (4, "low"),                                       # fails quality
            (5, base + "phone 555-123-4567 here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    cur = curation.curate(df, min_quality=0.35)
    got = {r["doc_id"]: r for r in cur.collect()}
    assert set(got) == {1, 3, 5}                  # 2 deduped, 4 filtered
    for r in got.values():
        assert r["quality"] >= 0.35
        for pat in PII_PATTERNS.values():
            assert not re.search(pat, r["text"])
    fps = cur.select(fingerprint("text")).collect()
    assert len({x[0] for x in fps}) == len(fps)

    funnel = curation.curation_funnel(df, min_quality=0.35).first()
    assert funnel["n_input"] == 5
    assert funnel["n_quality"] == 4
    assert funnel["n_unique"] == 3
    assert funnel["n_pii_matches"] == sum(r["n_pii_matches"]
                                          for r in got.values())
    assert funnel["total_tokens"] == sum(r["n_tokens"] for r in got.values())


def test_exact_dedup(spark, docs):
    kept = dedup.exact_dedup(docs).select("doc_id").rdd.map(lambda r: r[0]).collect()
    assert sorted(kept) == [1, 3, 4, 5]   # 2 collapses into 1 (min id kept)
    dups = dedup.exact_duplicates(docs).collect()
    assert len(dups) == 1 and dups[0]["keep_id"] == 1 and dups[0]["n_docs"] == 2


def _py_jaccard(a: str, b: str, n=3):
    def sh(s):
        t = s.lower().split()
        return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}
    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B)


def test_ngram_jaccard_matches_python(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    expected = _py_jaccard(texts[1], texts[3])
    assert (1, 3) in pairs
    assert pairs[(1, 3)] == pytest.approx(expected)
    assert all(a < b for a, b in pairs)


def test_minhash_near_duplicates_finds_pair(docs):
    got = dedup.minhash_near_duplicates(docs, threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert (1, 2) in pairs            # normalized-identical
    assert (1, 3) in pairs            # one-word edit, jaccard ~0.54
    assert all(4 not in p and 5 not in p for p in pairs)


def test_simhash_near_duplicates(docs):
    got = dedup.simhash_near_duplicates(docs, max_hamming=10).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in got}
    assert pairs.get((1, 2)) == 0     # tokens identical after lowering
    assert all(4 not in p and 5 not in p for p in pairs)


def test_simhash_md5_token_hash_portable(docs, spark):
    # the md5 mode is the DuckDB-twin contract: 60-bit value = first 15 hex
    # chars of the digest ('0x'||substr(md5(t),1,15) on the DuckDB side)
    row = (spark.range(1)
           .select(dedup.token_hashes(F.lit("hello"), method="md5").alias("h"))
           .first())
    assert row["h"] == [0x5D41402ABC4B2A7]    # md5('hello')[:15] as int
    # arrow and expr signers must agree bit-for-bit under the md5 hash too
    arrow = dedup.simhash_near_duplicates(docs, max_hamming=10,
                                          token_hash="md5").collect()
    expr = dedup.simhash_near_duplicates(docs, max_hamming=10, method="expr",
                                         token_hash="md5").collect()
    key = lambda rows: {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    assert key(arrow) == key(expr)


# ------------------------------------------------------------ similarity (X3)

@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_brute_force_top_k_matches_numpy(emb):
    rows = emb.collect()
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = mat[0]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(zip(-sims, ids))[:10]
    expected = [int(i) for _, i in order]
    got = similarity.brute_force_top_k(emb, list(map(float, q)), k=10).collect()
    assert [r["vec_id"] for r in got] == expected
    assert got[0]["sim"] == pytest.approx(1.0)


def test_lsh_top_k_exact_sims_and_self_hit(emb):
    q = [float(x) for x in emb.first()["embedding"]]
    got = similarity.lsh_top_k(emb, q, k=5, nbits=8, max_hamming=2)
    rows = got.collect()
    assert 0 < len(rows) <= 5
    assert rows[0]["sim"] == pytest.approx(1.0)   # query vec is in the table
    sims = [r["sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_embedding_near_duplicates(spark):
    vecs = [(1, [1.0, 0.0, 0.5]), (2, [2.0, 0.0, 1.0]),   # colinear -> cos 1
            (3, [-1.0, 2.0, 0.0])]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    got = similarity.embedding_near_duplicates(
        df, threshold=0.99, nbits=4, dim=3).collect()
    assert len(got) == 1
    assert (got[0]["id_a"], got[0]["id_b"]) == (1, 2)
    assert got[0]["cos_sim"] == pytest.approx(1.0)


def test_embedding_near_duplicates_bucket_cap(emb):
    """Capped pairs ⊆ uncapped pairs; every dropped pair touches a
    hot bucket (> cap members); pairs wholly inside small buckets survive."""
    kw = dict(threshold=0.35, nbits=6, seed=42, dim=64)
    pairkey = lambda rows: {(r["id_a"], r["id_b"]) for r in rows}
    uncapped = pairkey(similarity.embedding_near_duplicates(emb, **kw).collect())
    capped = pairkey(similarity.embedding_near_duplicates(
        emb, bucket_cap=12, **kw).collect())
    assert capped < uncapped          # strictly prunes on this corpus
    bucketed = similarity.lsh_bucketize(emb, nbits=6, seed=42, dim=64) \
        .select("vec_id", "bucket").collect()
    bucket_of = {r["vec_id"]: r["bucket"] for r in bucketed}
    sizes = {}
    for b in bucket_of.values():
        sizes[b] = sizes.get(b, 0) + 1
    hot = {b for b, n in sizes.items() if n > 12}
    for a, b in uncapped - capped:    # dropped ⇒ in a hot bucket
        assert bucket_of[a] in hot and bucket_of[b] in hot


def test_with_image_dims_header_parse(spark):
    """PNG IHDR fixed-offset parse + JPEG bounded marker walk (APP0/APP1/DQT
    before SOF), non-image -> NULL dims — all pure expressions."""
    import struct

    from openapc_olap_spark.operators.multimodal import with_image_dims

    def png(w, h):
        return (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
                + struct.pack(">II", w, h) + b"\x08\x06\x00")

    def jpeg(w, h, app1_len=None):
        b = b"\xFF\xD8\xFF\xE0" + struct.pack(">H", 16) + b"JFIF" + b"\x00" * 10
        if app1_len:
            b += b"\xFF\xE1" + struct.pack(">H", app1_len) + b"X" * (app1_len - 2)
        b += b"\xFF\xDB" + struct.pack(">H", 67) + b"\x00" * 65      # DQT
        b += (b"\xFF\xC0" + struct.pack(">H", 17) + b"\x08"
              + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9)
        b += b"\xFF\xDA\x00\x08entropy"
        return b

    rows = [(1, png(640, 480)), (2, jpeg(800, 600)),
            (3, jpeg(1024, 768, app1_len=50)), (4, b"RIFFxxxxWAVE"),
            (5, b"\xFF\xD8\xFF" + b"\x00" * 4)]   # truncated jpeg
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: (r["width"], r["height"])
           for r in with_image_dims(df).collect()}
    assert got == {1: (640, 480), 2: (800, 600), 3: (1024, 768),
                   4: (None, None), 5: (None, None)}


def test_with_wav_metadata_header_parse(spark):
    """Canonical WAV header parse (little-endian fields) via pure
    expressions; non-WAV and truncated payloads -> NULLs."""
    import struct

    from openapc_olap_spark.operators.multimodal import with_wav_metadata

    def wav(channels, rate, bits, n_frames):
        data = n_frames * channels * bits // 8
        return (b"RIFF" + struct.pack("<I", 36 + data) + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                              rate * channels * bits // 8,
                              channels * bits // 8, bits)
                + b"data" + struct.pack("<I", data) + b"\x00" * 8)

    rows = [(1, wav(1, 8000, 16, 4000)),      # 0.5 s mono
            (2, wav(2, 44100, 16, 44100)),    # 1 s stereo
            (3, b"RIFFxxxxAVI LIST"),          # RIFF but not WAVE
            (4, b"\x89PNG\r\n\x1a\n")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in with_wav_metadata(df).collect()}
    assert got[1]["wav_channels"] == 1 and got[1]["wav_sample_rate"] == 8000
    assert got[1]["wav_bits"] == 16 and got[1]["wav_duration_ms"] == 500
    assert got[2]["wav_channels"] == 2 and got[2]["wav_duration_ms"] == 1000
    assert got[3]["wav_sample_rate"] is None
    assert got[4]["wav_sample_rate"] is None


def test_with_image_dims_gif_webp(spark):
    """GIF logical-screen LE16 dims; WebP VP8 lossy (sync-coded 14-bit),
    VP8L lossless (packed minus-one fields), VP8X extended (LE24 minus-one);
    bad sync / unknown fourcc -> NULLs."""
    import struct

    from openapc_olap_spark.operators.multimodal import with_image_dims

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\xF7\x00\x00"

    def webp(fourcc, body):
        chunk = fourcc + struct.pack("<I", len(body)) + body
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    def vp8(w, h):
        return webp(b"VP8 ", b"\x00\x00\x00" + b"\x9d\x01\x2a"
                    + struct.pack("<HH", w, h))

    def vp8l(w, h):
        bits = (w - 1) | ((h - 1) << 14)
        return webp(b"VP8L", b"\x2f" + struct.pack("<I", bits))

    def vp8x(w, h):
        return webp(b"VP8X", b"\x00\x00\x00\x00"
                    + struct.pack("<I", w - 1)[:3] + struct.pack("<I", h - 1)[:3])

    rows = [(1, gif(320, 200)), (2, vp8(640, 360)), (3, vp8l(1, 16384)),
            (4, vp8x(16384, 9000)), (5, webp(b"ANMF", b"\x00" * 10)),
            (6, b"RIFF\x00\x00\x00\x00AVI LIST")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: (r["width"], r["height"])
           for r in with_image_dims(df).collect()}
    assert got == {1: (320, 200), 2: (640, 360), 3: (1, 16384),
                   4: (16384, 9000), 5: (None, None), 6: (None, None)}


def test_with_flac_metadata_streaminfo(spark):
    """FLAC STREAMINFO bit-field parse: 20-bit rate, 3-bit channels-1,
    5-bit bits-1, 36-bit total samples; non-FLAC and non-STREAMINFO-first
    files -> NULLs."""
    import struct

    from openapc_olap_spark.operators.multimodal import with_flac_metadata

    def flac(rate, ch, bits, total, first_type=0):
        packed = (rate << 44) | ((ch - 1) << 41) | ((bits - 1) << 36) | total
        return (b"fLaC" + bytes([0x80 | first_type]) + b"\x00\x00\x22"
                + b"\x10\x00\x10\x00" + b"\x00" * 6
                + struct.pack(">Q", packed) + b"\x00" * 16)

    rows = [(1, flac(44100, 2, 16, 441000)),          # 10 s stereo
            (2, flac(96000, 8, 24, 2 ** 35)),         # max-ish fields
            (3, flac(8000, 1, 16, 4000, first_type=4)),  # VORBIS_COMMENT first
            (4, b"fLa" + b"\x00" * 20)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in with_flac_metadata(df).collect()}
    assert got[1]["flac_sample_rate"] == 44100
    assert got[1]["flac_channels"] == 2 and got[1]["flac_bits"] == 16
    assert got[1]["flac_duration_ms"] == 10000
    assert got[2]["flac_sample_rate"] == 96000
    assert got[2]["flac_channels"] == 8 and got[2]["flac_bits"] == 24
    assert got[2]["flac_total_samples"] == 2 ** 35
    assert got[3]["flac_sample_rate"] is None
    assert got[4]["flac_sample_rate"] is None


def test_with_mp3_metadata_frame_header(spark):
    """MPEG frame-header parse: MPEG1/MPEG2/MPEG2.5 Layer III tables, ID3v2
    syncsafe skip (incl. a >127-byte tag exercising the 7-bit packing),
    free/invalid bitrate -> NULL, reserved version/layer -> NULLs."""
    from openapc_olap_spark.operators.multimodal import with_mp3_metadata

    def frame(version_bits, br_idx, sr_idx, layer_bits=1):
        h1 = 0xE0 | (version_bits << 3) | (layer_bits << 1)
        return bytes([0xFF, h1, (br_idx << 4) | (sr_idx << 2), 0x44]) + b"\x00" * 4

    def id3(taglen, body):
        ss = bytes([(taglen >> 21) & 0x7F, (taglen >> 14) & 0x7F,
                    (taglen >> 7) & 0x7F, taglen & 0x7F])
        return b"ID3\x04\x00\x00" + ss + b"Y" * taglen + body

    rows = [(1, frame(3, 9, 0)),                  # MPEG1 L3 128kbps 44100
            (2, frame(2, 9, 1)),                  # MPEG2 L3 80kbps 24000
            (3, frame(0, 1, 2)),                  # MPEG2.5 L3 8kbps 8000
            (4, id3(200, frame(3, 14, 2))),       # big tag, 320kbps 32000
            (5, frame(3, 0, 0)),                  # free bitrate -> NULL kbps
            (6, frame(1, 9, 0)),                  # reserved version
            (7, frame(3, 9, 0, layer_bits=2)),    # Layer II -> NULLs
            (8, b"not audio at all")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r.asDict() for r in with_mp3_metadata(df).collect()}
    assert got[1]["mp3_version"] == "1"
    assert (got[1]["mp3_bitrate_kbps"], got[1]["mp3_sample_rate"]) == (128, 44100)
    assert (got[2]["mp3_bitrate_kbps"], got[2]["mp3_sample_rate"]) == (80, 24000)
    assert got[2]["mp3_version"] == "2"
    assert (got[3]["mp3_bitrate_kbps"], got[3]["mp3_sample_rate"]) == (8, 8000)
    assert got[3]["mp3_version"] == "2.5"
    assert (got[4]["mp3_bitrate_kbps"], got[4]["mp3_sample_rate"]) == (320, 32000)
    assert got[5]["mp3_bitrate_kbps"] is None
    assert got[5]["mp3_sample_rate"] == 44100    # rate valid even if free-bitrate
    assert got[6]["mp3_version"] is None
    assert got[7]["mp3_version"] is None
    assert got[8]["mp3_version"] is None


def test_media_header_parsers_randomized_roundtrip(spark):
    """Seeded randomized round-trip over every pure-expression header
    parser: synthesize 200 random-but-valid headers per format in Python
    (PNG, JPEG-with-APPn, GIF, WebP VP8L/VP8X, WAV, FLAC, MP3+ID3), parse
    them back in ONE Spark job each, and compare field-for-field with the
    generator's ground truth."""
    import random
    import struct

    from openapc_olap_spark.operators.multimodal import (
        with_flac_metadata, with_image_dims, with_mp3_metadata,
        with_wav_metadata,
    )

    rng = random.Random(20260813)
    img_rows, img_want = [], {}
    for i in range(200):
        w, h = rng.randint(1, 16383), rng.randint(1, 16383)
        kind = i % 5
        if kind == 0:
            b = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
                 + struct.pack(">II", w, h) + b"\x08\x06\x00")
        elif kind == 1:
            app_len = rng.randint(3, 200)
            b = (b"\xFF\xD8\xFF\xE1" + struct.pack(">H", app_len)
                 + b"Z" * (app_len - 2)
                 + b"\xFF\xC0\x00\x11\x08" + struct.pack(">HH", h, w) + b"\x03")
        elif kind == 2:
            w, h = min(w, 65535), min(h, 65535)
            b = b"GIF87a" + struct.pack("<HH", w, h) + b"\x80\x00\x00"
        elif kind == 3:
            bits = (w - 1) | ((h - 1) << 14)
            body = b"\x2f" + struct.pack("<I", bits)
            b = (b"RIFF" + struct.pack("<I", 12 + len(body)) + b"WEBP"
                 + b"VP8L" + struct.pack("<I", len(body)) + body)
        else:
            body = (b"\x00\x00\x00\x00" + struct.pack("<I", w - 1)[:3]
                    + struct.pack("<I", h - 1)[:3])
            b = (b"RIFF" + struct.pack("<I", 12 + len(body)) + b"WEBP"
                 + b"VP8X" + struct.pack("<I", len(body)) + body)
        img_rows.append((i, b))
        img_want[i] = (w, h)
    got = {r["media_id"]: (r["width"], r["height"]) for r in with_image_dims(
        spark.createDataFrame(img_rows, "media_id long, payload binary"))
        .collect()}
    assert got == img_want

    audio_rows, flac_want, mp3_want, wav_want = [], {}, {}, {}
    v1_br = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
    v2_br = [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
    for i in range(200):
        kind = i % 3
        if kind == 0:
            rate = rng.randint(8000, 655350)
            ch = rng.randint(1, 8)
            bits = rng.choice([8, 16, 24, 32])
            total = rng.randint(0, 2 ** 36 - 1)
            packed = ((rate << 44) | ((ch - 1) << 41)
                      | ((bits - 1) << 36) | total)
            b = (b"fLaC\x80\x00\x00\x22" + b"\x10\x00\x10\x00" + b"\x00" * 6
                 + struct.pack(">Q", packed) + b"\x00" * 16)
            flac_want[i] = (rate, ch, bits, total)
        elif kind == 1:
            ver = rng.choice([3, 2, 0])
            br, sr = rng.randint(1, 14), rng.randint(0, 2)
            hdr = bytes([0xFF, 0xE0 | (ver << 3) | 2,
                         (br << 4) | (sr << 2), 0x00]) + b"\x00" * 4
            if rng.random() < 0.5:
                taglen = rng.randint(1, 5000)
                ss = bytes([(taglen >> 21) & 0x7F, (taglen >> 14) & 0x7F,
                            (taglen >> 7) & 0x7F, taglen & 0x7F])
                b = b"ID3\x03\x00\x00" + ss + b"\x00" * taglen + hdr
            else:
                b = hdr
            table = v1_br if ver == 3 else v2_br
            rates = ([44100, 48000, 32000] if ver == 3 else
                     [22050, 24000, 16000] if ver == 2 else
                     [11025, 12000, 8000])
            mp3_want[i] = (table[br - 1], rates[sr])
        else:
            ch, rate = rng.randint(1, 8), rng.randint(8000, 192000)
            bits = rng.choice([8, 16, 24])
            frames = rng.randint(1, 10 ** 6)
            data = frames * ch * bits // 8
            b = (b"RIFF" + struct.pack("<I", 36 + data) + b"WAVEfmt "
                 + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                               rate * ch * bits // 8, ch * bits // 8, bits)
                 + b"data" + struct.pack("<I", data) + b"\x00" * 4)
            wav_want[i] = (ch, rate, bits)
        audio_rows.append((i, b))
    adf = spark.createDataFrame(audio_rows, "media_id long, payload binary")
    parsed = {r["media_id"]: r.asDict() for r in
              with_mp3_metadata(with_wav_metadata(
                  with_flac_metadata(adf))).collect()}
    for i, (rate, ch, bits, total) in flac_want.items():
        r = parsed[i]
        assert (r["flac_sample_rate"], r["flac_channels"], r["flac_bits"],
                r["flac_total_samples"]) == (rate, ch, bits, total), i
    for i, (kbps, rate) in mp3_want.items():
        r = parsed[i]
        assert (r["mp3_bitrate_kbps"], r["mp3_sample_rate"]) == (kbps, rate), i
    for i, (ch, rate, bits) in wav_want.items():
        r = parsed[i]
        assert (r["wav_channels"], r["wav_sample_rate"],
                r["wav_bits"]) == (ch, rate, bits), i


def test_profile_matches_numpy(spark):
    """profile() stats match numpy on a frame with nulls; approx and exact
    quantiles agree on small data."""
    import numpy as np

    from openapc_olap_spark.operators.profile import profile

    vals = [float(v) for v in range(1, 101)]
    rows = [(v,) for v in vals] + [(None,)] * 7
    df = spark.createDataFrame(rows, "x double")
    for exact in (True, False):
        r = {row["column"]: row for row in
             profile(df, ["x"], quantiles=(0.5, 0.95), exact=exact).collect()}
        p = r["x"]
        assert p["n"] == 100 and p["nulls"] == 7
        assert p["min"] == 1.0 and p["max"] == 100.0
        assert abs(p["mean"] - np.mean(vals)) < 1e-9
        assert abs(p["std"] - np.std(vals, ddof=1)) < 1e-9
        if exact:
            assert abs(p["q50"] - np.percentile(vals, 50)) < 1e-9
            assert abs(p["q95"] - np.percentile(vals, 95)) < 1e-9
        else:
            assert abs(p["q50"] - 50.5) <= 1.0       # sketch tolerance
            assert abs(p["q95"] - 95.05) <= 1.5


def test_pack_sequences_invariants(spark):
    """Packing invariants: every doc assigned exactly once with tokens
    preserved; bin offsets are in [0, capacity); bins are contiguous and
    non-decreasing in id within a shard; deterministic across runs."""
    from openapc_olap_spark.operators.packing import pack_sequences
    from openapc_olap_spark.operators.text import token_count

    docs = spark.createDataFrame(
        [(i, "tok " * (i % 37 + 1)) for i in range(300)], ["doc_id", "text"])
    cap = 64
    packed = pack_sequences(docs, capacity=cap, n_shards=4).collect()
    assert len(packed) == 300
    assert {r["doc_id"] for r in packed} == set(range(300))
    want_tokens = {r["doc_id"]: r["n"] for r in
                   docs.select("doc_id", token_count("text").alias("n"))
                   .collect()}
    by_shard: dict = {}
    for r in packed:
        assert r["n_tokens"] == want_tokens[r["doc_id"]]
        assert 0 <= r["bin_offset"] < cap
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        bins = [r["bin_id"] for r in shard_rows]
        assert bins == sorted(bins)                       # non-decreasing
        # start offsets are the exclusive cumsum -> bin cut arithmetic
        cum = 0
        for r in shard_rows:
            assert r["bin_id"] == cum // cap and r["bin_offset"] == cum % cap
            cum += r["n_tokens"]
    again = pack_sequences(docs, capacity=cap, n_shards=4).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, packed))


def test_hash_split_deterministic_and_balanced(spark):
    """hash_split: stable assignment, roughly-right fractions, and salt
    changes reshuffle membership."""
    from openapc_olap_spark.operators.packing import hash_split

    docs = spark.createDataFrame([(i,) for i in range(5000)], ["doc_id"])
    s1 = {r["doc_id"]: r["split"] for r in
          hash_split(docs, val_permille=100, test_permille=100).collect()}
    s2 = {r["doc_id"]: r["split"] for r in
          hash_split(docs, val_permille=100, test_permille=100).collect()}
    assert s1 == s2
    n_val = sum(1 for v in s1.values() if v == "val")
    n_test = sum(1 for v in s1.values() if v == "test")
    assert 350 <= n_val <= 650 and 350 <= n_test <= 650    # ~500 each
    s3 = {r["doc_id"]: r["split"] for r in
          hash_split(docs, val_permille=100, test_permille=100,
                     salt="other").collect()}
    assert s3 != s1


# --------------------------------------------------------------- windows (X6)

def test_tumbling_matches_duckdb(spark):
    from openapc_olap_spark.session import load_tables
    df = load_tables(spark, SF, ["events"])["events"]
    got = {(r["window_start"], ): (r["n_events"], r["value_sum"])
           for r in windows.tumbling(df, duration="1 hour").collect()}
    ora = duckdb.sql(f"""
        SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') s,
               count(*) n, round(sum(value), 4) v
        FROM '{SF}/events.parquet' GROUP BY 1""").fetchall()
    assert len(got) == len(ora)
    for s, n, v in ora:
        assert got[(s,)] == (n, pytest.approx(v))


def test_sessionize_gap_semantics(spark):
    rows = [(1, "2024-01-01 10:00:00", 7, "c", 1.0, "{}"),
            (2, "2024-01-01 10:05:00", 7, "c", 2.0, "{}"),
            (3, "2024-01-01 10:20:00", 7, "c", 3.0, "{}"),   # > 10 min gap
            (4, "2024-01-01 10:00:00", 8, "c", 4.0, "{}")]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).withColumn("ts", F.to_timestamp("ts"))
    got = windows.sessionize(df).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[7]) == 2
    first = min(by_user[7], key=lambda r: r["session_start"])
    assert first["n_events"] == 2 and first["value_sum"] == pytest.approx(3.0)
    assert len(by_user[8]) == 1
    stats = {r["user_id"]: r["n_sessions"]
             for r in windows.session_stats(df).collect()}
    assert stats == {7: 2, 8: 1}


# ------------------------------------------------------------ multimodal (X5)

def test_media_metadata_sniffs_magic_bytes(spark):
    rows = [(1, bytearray(b"\xff\xd8\xff\xe0" + b"x" * 60)),
            (2, bytearray(b"\x89PNG\r\n\x1a\n" + b"y" * 100)),
            (3, bytearray(b"RIFF1234WAVE" + b"z" * 20)),
            (4, bytearray(b"\x00\x01garbage"))]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    got = {r["media_id"]: r for r in
           multimodal.with_media_metadata(df).collect()}
    assert got[1]["media_format"] == "jpeg" and got[1]["media_bytes"] == 64
    assert got[2]["media_format"] == "png"
    assert got[3]["media_format"] == "riff"
    assert got[4]["media_format"] == "unknown"
    assert len({got[i]["media_hash"] for i in got}) == 4


def _bmp_rows(n):
    """n small BMPs with deterministic pixels (w=4+i%3, h=3+i%2)."""
    from openapc_olap_spark.operators.multimodal import _encode_bmp
    rows = []
    for i in range(1, n + 1):
        w, h = 4 + i % 3, 3 + i % 2
        px = bytes((i * 7 + j * 13) % 256 for j in range(w * h * 3))
        rows.append((i, bytearray(_encode_bmp(w, h, 3, px)), w, h, px))
    return rows


def test_decode_images_real_bmp_ppm_png(spark):
    """The decode kernel is REAL for BMP/PPM/PNG: dims and pixel-stat
    features come from the actual bytes, identically across partitionings."""
    import numpy as np
    from openapc_olap_spark.operators.multimodal import (
        _encode_bmp, _encode_png, _encode_ppm)
    px = bytes((j * 11) % 256 for j in range(6 * 4 * 3))
    rows = [(1, bytearray(_encode_bmp(6, 4, 3, px))),
            (2, bytearray(_encode_ppm(6, 4, 3, px))),
            (3, bytearray(_encode_png(6, 4, 3, px)))]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    a = {r["media_id"]: r for r in multimodal.decode_images(df).collect()}
    b = {r["media_id"]: r for r in
         multimodal.decode_images(df.repartition(3)).collect()}
    arr = np.frombuffer(px, np.uint8)
    for i in a:
        assert (a[i]["width"], a[i]["height"], a[i]["channels"]) == (6, 4, 3)
        f = a[i]["features"]
        assert f[0] == 24.0 and f[1] == float(arr.sum())
        assert f[2] == float(arr.min()) and f[3] == float(arr.max())
        assert f[4] == float(arr.reshape(-1, 3)[:, 0].sum())
        assert a[i] == b[i]          # partitioning-independent


def test_decode_images_on_error_modes(spark):
    """Corrupt bytes: default 'fail' raises (no silent fake dims), 'null'
    nulls the row, 'fake' opts in to the deterministic stand-in."""
    import pytest
    rows = [(i, bytearray(bytes([i]) * 32)) for i in range(1, 5)]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    with pytest.raises(Exception, match="image decode failed for media_id="):
        multimodal.decode_images(df).collect()
    nulls = multimodal.decode_images(df, on_error="null").collect()
    assert len(nulls) == 4 and all(r["width"] is None for r in nulls)
    a = {r["media_id"]: r for r in
         multimodal.decode_images(df, on_error="fake").collect()}
    b = {r["media_id"]: r for r in
         multimodal.decode_images(df.repartition(4), on_error="fake")
         .collect()}
    for i in a:
        assert a[i]["width"] >= 64 and a[i]["channels"] in (1, 2, 3, 4)
        assert len(a[i]["features"]) == 8
        assert a[i] == b[i]          # partitioning-independent


def test_resize_images_real_nearest_neighbor(spark):
    """BMP/PNG payloads are really resized: decode(resize(x)) has the
    target dims and the exact nearest-neighbor pixel grid."""
    import numpy as np
    from openapc_olap_spark.operators.multimodal import (
        _decode_image_bytes, _encode_bmp, _encode_png)
    px = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    rows = [(1, bytearray(_encode_bmp(2, 2, 3, px))),
            (2, bytearray(_encode_png(2, 2, 3, px)))]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    got = {r["media_id"]: r for r in
           multimodal.resize_images(df, target=(4, 4)).collect()}
    src = np.frombuffer(px, np.uint8).reshape(2, 2, 3)
    expect = src[(np.arange(4) * 2) // 4][:, (np.arange(4) * 2) // 4]
    for i in got:
        assert got[i]["resized"] is True
        w, h, c, out_px = _decode_image_bytes(bytes(got[i]["payload"]))
        assert (w, h, c) == (4, 4, 3)
        assert np.array_equal(
            np.frombuffer(out_px, np.uint8).reshape(4, 4, 3), expect)


def test_resize_images_passthrough_roundtrip(spark):
    """on_error='passthrough' (the opt-in lenient mode) round-trips
    undecodable payload bytes through Arrow untouched, flags
    resized=false, and records the target dims; the default fails."""
    import pytest
    rows = [(i, bytearray(bytes([i]) * 48)) for i in range(1, 5)]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    with pytest.raises(Exception, match="image resize failed for media_id="):
        multimodal.resize_images(df, target=(224, 224)).collect()
    got = {r["media_id"]: r for r in
           multimodal.resize_images(df, target=(224, 224),
                                    on_error="passthrough").collect()}
    assert len(got) == 4
    for i in got:
        assert bytes(got[i]["payload"]) == bytes([i]) * 48
        assert (got[i]["width"], got[i]["height"]) == (224, 224)
        assert got[i]["resized"] is False


def _wav_payload(rate, channels, samples_i16):
    import struct
    import numpy as np
    data = np.asarray(samples_i16, dtype="<i2").tobytes()
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, channels, rate,
                          rate * channels * 2, channels * 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def test_audio_features_real_wav_pcm(spark):
    """WAV PCM decode is real: duration/sample-rate from the header,
    features (sums, zero-crossings, rms) from the actual samples."""
    import numpy as np
    mono = [0, 1000, -1000, 500, -500, 250]
    stereo = [10, -99, -20, 99, 30, -99, -40, 99]  # ch0 = 10,-20,30,-40
    rows = [(1, bytearray(_wav_payload(8000, 1, mono))),
            (2, bytearray(_wav_payload(16000, 2, stereo)))]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    a = {r["media_id"]: r for r in
         multimodal.extract_audio_features(df).collect()}
    b = {r["media_id"]: r for r in
         multimodal.extract_audio_features(df.repartition(2)).collect()}
    m = np.array(mono)
    assert a[1]["sample_rate"] == 8000
    assert a[1]["duration_ms"] == round(len(mono) * 1000 / 8000)
    f = a[1]["features"]
    assert f[0] == 6.0 and f[1] == float(m.sum())
    assert f[2] == float(np.abs(m).sum()) and f[3] == 4.0  # sign flips
    s0 = np.array(stereo[::2])
    g = a[2]["features"]
    assert g[0] == 8.0 and g[1] == float(s0.sum()) and g[3] == 3.0
    assert a[1] == b[1] and a[2] == b[2]   # partitioning-independent


def test_audio_features_on_error_modes(spark):
    import pytest
    rows = [(i, bytearray(bytes([i]) * 16)) for i in range(1, 7)]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    with pytest.raises(Exception, match="audio decode failed for media_id="):
        multimodal.extract_audio_features(df).collect()
    nulls = multimodal.extract_audio_features(df, on_error="null").collect()
    assert all(r["sample_rate"] is None for r in nulls)
    a = {r["media_id"]: r for r in
         multimodal.extract_audio_features(df, on_error="fake").collect()}
    b = {r["media_id"]: r for r in
         multimodal.extract_audio_features(df.repartition(3),
                                           on_error="fake").collect()}
    assert len(a) == 6
    for i in a:
        assert len(a[i]["features"]) == 13
        assert a[i]["sample_rate"] in (8000, 16000, 22000, 44000)
        assert a[i]["duration_ms"] >= 1000
        assert a[i] == b[i]          # partitioning-independent


def test_sample_frames_grid(spark):
    df = spark.createDataFrame([(1, 3500), (2, 900)], ["media_id", "duration_ms"])
    got = multimodal.sample_frames(df, every_ms=1000).collect()
    per = {}
    for r in got:
        per.setdefault(r["media_id"], []).append((r["frame_idx"], r["frame_ts_ms"]))
    assert sorted(per[1]) == [(0, 0), (1, 1000), (2, 2000)]
    assert sorted(per[2]) == [(0, 0)]


def test_ivf_top_k_recall(spark, emb):
    """IVF ANN: self-hit + high recall vs brute force on the probed set."""
    cents = similarity.train_ivf_centroids(emb, k=8, seed=42)
    assert len(cents) == 8 and len(cents[0]) == len(emb.first()["embedding"])
    q = [float(x) for x in emb.first()["embedding"]]
    got = similarity.ivf_top_k(emb, cents, q, k=10, nprobe=4).collect()
    assert 0 < len(got) <= 10
    assert got[0]["sim"] == pytest.approx(1.0)          # query is in the table
    sims = [r["sim"] for r in got]
    assert sims == sorted(sims, reverse=True)
    exact = {r["vec_id"] for r in
             similarity.brute_force_top_k(emb, q, k=10).collect()}
    recall = len({r["vec_id"] for r in got} & exact) / 10
    assert recall >= 0.5                                 # nprobe=4 of 8 lists


def test_ann_index_partition_pruned_probe(spark, emb, tmp_path):
    """Written ANN index: probe is a partition-pruned scan (bucket predicate
    in PartitionFilters, not a post-scan filter) with correct top-k."""
    path = str(tmp_path / "ann")
    q = [float(x) for x in emb.first()["embedding"]]
    similarity.write_ann_index(emb, path, dim=len(q), nbits=4)
    got = similarity.ann_index_top_k(spark, path, q, k=5, nbits=4,
                                     max_hamming=1)
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "bucket" in pf
    rows = got.collect()
    assert rows and rows[0]["sim"] == pytest.approx(1.0)


# ---------------------------------------------------------------- skew utils

def test_salted_aggregate_matches_plain_groupby(spark):
    from openapc_olap_spark.operators import skew
    df = spark.range(0, 10_000).select(
        (F.col("id") % 7).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"))
    got = {r["k"]: (r["s"], r["c"]) for r in skew.salted_aggregate(
        df, ["k"],
        {"s": F.sum("v"), "c": F.count(F.lit(1))},
        {"s": F.sum("s"), "c": F.sum("c")},
        salt_buckets=8).collect()}
    want = {r["k"]: (r["s"], r["c"]) for r in
            df.groupBy("k").agg(F.sum("v").alias("s"),
                                F.count(F.lit(1)).alias("c")).collect()}
    assert got == want


def test_salted_aggregate_is_two_stage(spark):
    from openapc_olap_spark.operators import skew
    df = spark.range(0, 100).select((F.col("id") % 3).alias("k"),
                                    F.col("id").cast("double").alias("v"))
    out = skew.salted_aggregate(df, ["k"], {"s": F.sum("v")},
                                {"s": F.sum("s")})
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") >= 2           # (k, salt) stage + k stage


def test_salted_join_matches_plain_join(spark):
    from openapc_olap_spark.operators import skew
    fact = spark.range(0, 5_000).select(
        (F.col("id") % 4).alias("k"), F.col("id").alias("row_id"))
    dim = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (3, "d")], ["k", "attr"])
    got = skew.salted_join(fact, dim, "k", salt_buckets=4)
    want = fact.join(dim, "k")
    assert got.count() == want.count() == 5_000
    merged = {(r["row_id"], r["attr"]) for r in got.collect()}
    assert merged == {(r["row_id"], r["attr"]) for r in want.collect()}
    # outer joins would duplicate unmatched dim keys per salt replica
    with pytest.raises(ValueError, match="inner.*left"):
        skew.salted_join(fact, dim, "k", how="full")


def test_key_histogram_finds_hot_key(spark):
    from openapc_olap_spark.operators import skew
    df = spark.createDataFrame(
        [("hot",)] * 90 + [("cold",)] * 10, ["k"])
    top = skew.key_histogram(df, "k", top_n=1).collect()
    assert top[0]["k"] == "hot" and top[0]["n_rows"] == 90
    assert top[0]["share"] == pytest.approx(0.9)


# ------------------------------------------------- dedup scale caps

def test_ngram_doc_freq_cap_prunes_common_shingles(spark, docs):
    # uncapped finds the 1~2 / 1~3 / 2~3 near-dup cluster
    full = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    assert {(r["id_a"], r["id_b"]) for r in full.collect()} == {
        (1, 2), (1, 3), (2, 3)}
    # cap=1 keeps only shingles unique to one doc -> no join rows survive
    capped = dedup.ngram_jaccard_pairs(docs, threshold=0.5, doc_freq_cap=1)
    assert capped.count() == 0
    # a generous cap changes nothing
    loose = dedup.ngram_jaccard_pairs(docs, threshold=0.5, doc_freq_cap=100)
    assert {(r["id_a"], r["id_b"]) for r in loose.collect()} == {
        (1, 2), (1, 3), (2, 3)}


def test_minhash_bucket_cap_drops_pathological_buckets(spark):
    # 30 identical docs = every band bucket has 30 members; 2 distinct
    # near-identical docs pair in small buckets and must survive the cap
    rows = [(i, "boilerplate page exactly the same every time ok")
            for i in range(30)]
    rows += [(100, "a genuinely unique document about spark engines here"),
             (101, "a genuinely unique document about spark engines there")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = dedup.minhash_lsh_candidates(df, bucket_cap=10)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in pairs
    assert not any(a < 30 and b < 30 for a, b in pairs)   # hot bucket gone
    # uncapped: the boilerplate cluster floods 30*29/2 = 435 pairs
    full = dedup.minhash_lsh_candidates(df)
    assert full.count() >= 435


def test_curation_funnel_empty_input_all_zero(spark):
    """Empty input must yield a fully-defined all-zero funnel row (sum over
    zero rows is NULL without the coalesce) — monitoring consumers read
    these counts directly."""
    from openapc_olap_spark.operators import curation
    empty = spark.createDataFrame([], "doc_id long, text string")
    row = curation.curation_funnel(empty).collect()[0]
    assert row.asDict() == {"n_input": 0, "n_quality": 0, "n_unique": 0,
                            "n_pii_matches": 0, "total_tokens": 0}


def test_connected_components_chain_and_clique(spark):
    """Min-label propagation resolves chains (a-b, b-c -> one component),
    cliques, and leaves separate components separate; deterministic across
    partitionings."""
    pairs = [(1, 2), (2, 3),          # chain -> {1,2,3}
             (10, 11), (10, 12), (11, 12),   # clique -> {10,11,12}
             (20, 21)]                # pair  -> {20,21}
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r["id"]: r["comp"] for r in
           dedup.connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    got2 = {r["id"]: r["comp"] for r in
            dedup.connected_components(df.repartition(5)).collect()}
    assert got2 == got


def test_connected_components_long_chain_converges_log_rounds(spark):
    """A 30-node path graph (diameter 29) converges within 8 rounds: the
    pointer-jumping compression makes propagation distance double per
    round (plain one-hop propagation would need 30+ rounds and fail this
    max_iter)."""
    pairs = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r["id"]: r["comp"] for r in
           dedup.connected_components(df, max_iter=8).collect()}
    assert set(got.values()) == {0} and len(got) == 31


def test_connected_components_matches_union_find_property(spark):
    """Random-graph property check against a pure-Python union-find
    reference: component partitioning and min-representative choice match
    on 10 seeded random graphs."""
    import random

    def uf_components(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp = {}
        for n in nodes:
            comp.setdefault(find(n), []).append(n)
        return {n: min(members) for members in comp.values()
                for n in members}

    rng = random.Random(7)
    for trial in range(10):
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        nodes = sorted({x for e in edges for x in e})
        expect = uf_components(edges, nodes)
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {r["id"]: r["comp"] for r in
               dedup.connected_components(df).collect()}
        assert got == expect, f"trial {trial}: {edges}"


def test_duplicate_groups_and_resolve(spark, docs):
    """End-to-end over real near-dup pairs: docs 1/2/3 chain through
    shared text, 4/5 are singletons; resolve_duplicates keeps exactly one
    doc per group."""
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.2)
    groups = {r["canon_id"]: r["n_members"]
              for r in dedup.duplicate_groups(pairs).collect()}
    assert groups == {1: 3}
    resolved = dedup.resolve_duplicates(docs, pairs)
    canon = {r["doc_id"]: r["canon_id"] for r in resolved.collect()}
    assert canon == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}
    kept = resolved.filter(F.col("doc_id") == F.col("canon_id")).count()
    assert kept == 3


def test_connected_components_empty_and_no_pairs(spark):
    """Empty pair frames: components are empty, and resolve_duplicates
    maps every doc to itself (all singletons kept)."""
    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.connected_components(empty).count() == 0
    assert dedup.connected_components(empty, method="star").count() == 0
    assert dedup.connected_components(empty, method="both").count() == 0
    docs = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
    got = {r["doc_id"]: r["canon_id"]
           for r in dedup.resolve_duplicates(docs, empty).collect()}
    assert got == {1: 1, 2: 2}


def test_connected_components_star_mode(spark):
    """VERDICT r08 #3: the alternating large-star/small-star rewrite
    (Kiveris et al.) matches label propagation on chains, cliques,
    self-loops, duplicate/reversed edges — and 'both' self-certifies."""
    pairs = [(1, 2), (2, 3),                      # chain
             (10, 11), (10, 12), (11, 12),        # clique
             (20, 21), (21, 20), (20, 20),        # dup + reversed + loop
             (30, 31), (31, 32), (32, 33), (33, 34)]   # longer chain
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    want = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
            30: 30, 31: 30, 32: 30, 33: 30, 34: 30}
    for method in ("star", "both"):
        got = {r["id"]: r["comp"] for r in
               dedup.connected_components(df, method=method).collect()}
        assert got == want, method
    got2 = {r["id"]: r["comp"] for r in
            dedup.connected_components(df.repartition(5),
                                       method="star").collect()}
    assert got2 == want
    with pytest.raises(ValueError, match="method"):
        dedup.connected_components(df, method="bogus")


def test_connected_components_self_loop_only_nodes(spark):
    """ADVICE r09: a node whose ONLY edge is a self-loop must still get a
    (id, comp=id) row in every mode — star's u != v pre-filter used to
    drop it (and 'both' then raised a spurious label/star mismatch)."""
    pairs = [(1, 2),          # ordinary component
             (7, 7),          # self-loop-only node
             (9, 9), (9, 10)]  # self-loop on a node that ALSO has an edge
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    want = {1: 1, 2: 1, 7: 7, 9: 9, 10: 9}
    for method in ("label", "star", "both"):
        got = {r["id"]: r["comp"] for r in
               dedup.connected_components(df, method=method).collect()}
        assert got == want, method
    # all-self-loop frame: every node is its own singleton component
    loops = spark.createDataFrame([(5, 5), (6, 6)], ["id_a", "id_b"])
    for method in ("label", "star", "both"):
        got = {r["id"]: r["comp"] for r in
               dedup.connected_components(loops, method=method).collect()}
        assert got == {5: 5, 6: 6}, method


def test_connected_components_star_long_chain_few_rounds(spark):
    """A 64-node path (diameter 63) — star mode's worst published bound
    is O(log^2 n) alternating rounds; it must land well inside
    max_iter=10 where one-hop propagation would need 64."""
    pairs = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r["id"]: r["comp"] for r in
           dedup.connected_components(df, max_iter=10,
                                      method="star").collect()}
    assert set(got.values()) == {0} and len(got) == 65


def test_connected_components_star_matches_union_find_random(spark):
    """Same 10-seeded-random-graph property net as label mode, run
    through the star kernel."""
    import random

    def uf_components(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp = {}
        for n in nodes:
            comp.setdefault(find(n), []).append(n)
        return {n: min(members) for members in comp.values()
                for n in members}

    rng = random.Random(13)
    for trial in range(10):
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        nodes = sorted({x for e in edges for x in e})
        expect = uf_components(edges, nodes)
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {r["id"]: r["comp"] for r in
               dedup.connected_components(df, method="star").collect()}
        assert got == expect, f"trial {trial}: {edges}"


# ---------------------------------------------------------------- temporal

def test_asof_join_matches_duckdb_asof(spark):
    """asof_join (union+window, no range join) vs DuckDB's native ASOF
    LEFT JOIN on a case covering: inclusive ties, version updates,
    unmatched-early events, and a key with no versions at all."""
    from datetime import datetime as dt

    from openapc_olap_spark.operators.temporal import asof_join
    ev = [(1, dt(2024, 1, 1, 10), 1.0), (1, dt(2024, 1, 1, 11), 9.0),
          (1, dt(2024, 1, 1, 12), 2.0), (2, dt(2024, 1, 1, 9), 3.0),
          (3, dt(2024, 1, 1, 8), 7.0)]
    ver = [(1, dt(2024, 1, 1, 9), "a"), (1, dt(2024, 1, 1, 11), "b"),
           (2, dt(2024, 1, 2, 0), "c")]
    left = spark.createDataFrame(ev, "uid long, ts timestamp, v double")
    right = spark.createDataFrame(ver, "uid long, vts timestamp, tier string")
    got = sorted((r["uid"], r["ts"], r["tier"], r["__asof_ts"])
                 for r in asof_join(left, right, on="uid",
                                    right_ts="vts").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE ev(uid BIGINT, ts TIMESTAMP, v DOUBLE)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?)", ev)
    con.execute("CREATE TABLE ver(uid BIGINT, vts TIMESTAMP, tier VARCHAR)")
    con.executemany("INSERT INTO ver VALUES (?, ?, ?)", ver)
    want = sorted(map(tuple, con.execute(
        """SELECT e.uid, e.ts, v.tier, v.vts
           FROM ev e ASOF LEFT JOIN ver v
             ON e.uid = v.uid AND e.ts >= v.vts""").fetchall()))
    assert got == want
    # ties: event exactly at version time takes the NEW version
    assert (1, dt(2024, 1, 1, 11), "b", dt(2024, 1, 1, 11)) in got


def test_asof_join_tolerance_nulls_stale_matches(spark):
    from datetime import datetime as dt

    from openapc_olap_spark.operators.temporal import asof_join
    left = spark.createDataFrame(
        [(1, dt(2024, 1, 10), 1.0)], "uid long, ts timestamp, v double")
    right = spark.createDataFrame(
        [(1, dt(2024, 1, 1), "old")], "uid long, vts timestamp, tier string")
    fresh = asof_join(left, right, on="uid", right_ts="vts").collect()[0]
    assert fresh["tier"] == "old"
    stale = asof_join(left, right, on="uid", right_ts="vts",
                      tolerance="3 days").collect()[0]
    assert stale["tier"] is None and stale["__asof_ts"] is None
    ok = asof_join(left, right, on="uid", right_ts="vts",
                   tolerance="30 days").collect()[0]
    assert ok["tier"] == "old"


def test_asof_join_rejects_column_collision(spark):
    from datetime import datetime as dt

    import pytest as _pytest

    from openapc_olap_spark.operators.temporal import asof_join
    left = spark.createDataFrame(
        [(1, dt(2024, 1, 1), "x")], "uid long, ts timestamp, tier string")
    right = spark.createDataFrame(
        [(1, dt(2024, 1, 1), "y")], "uid long, vts timestamp, tier string")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="uid", right_ts="vts")


def test_interval_join_matches_duckdb_range_join(spark):
    """interval_join (bucketized equi-join + containment filter) vs a
    plain DuckDB inequality join: half-open boundaries, bucket-straddling
    intervals, overlapping intervals (a point in two), keyed + keyless,
    and a bucket chosen smaller than the intervals."""
    from datetime import datetime as dt

    from openapc_olap_spark.operators.temporal import interval_join
    pts = [(1, dt(2024, 1, 1, 0), 1.0), (1, dt(2024, 1, 2, 11, 59), 2.0),
           (1, dt(2024, 1, 2, 12, 0), 3.0), (2, dt(2024, 1, 5, 3), 4.0)]
    ivs = [(1, dt(2024, 1, 1, 0), dt(2024, 1, 2, 12), "a"),
           (1, dt(2024, 1, 2, 0), dt(2024, 1, 4, 0), "b"),   # overlaps 'a'
           (2, dt(2024, 1, 1, 0), dt(2024, 1, 9, 0), "c")]   # 8-day span
    left = spark.createDataFrame(pts, "uid long, ts timestamp, v double")
    right = spark.createDataFrame(
        ivs, "uid long, s timestamp, e timestamp, tag string")
    got = sorted((r["uid"], r["ts"], r["tag"]) for r in
                 interval_join(left, right, point_ts="ts", start_ts="s",
                               end_ts="e", on="uid",
                               bucket="1 day").collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE p(uid BIGINT, ts TIMESTAMP, v DOUBLE)")
    con.executemany("INSERT INTO p VALUES (?, ?, ?)", pts)
    con.execute("CREATE TABLE i(uid BIGINT, s TIMESTAMP, e TIMESTAMP, "
                "tag VARCHAR)")
    con.executemany("INSERT INTO i VALUES (?, ?, ?, ?)", ivs)
    want = sorted(map(tuple, con.execute(
        """SELECT p.uid, p.ts, i.tag FROM p JOIN i
           ON p.uid = i.uid AND p.ts >= i.s AND p.ts < i.e""").fetchall()))
    assert got == want
    # half-open: the 12:00 point is OUT of 'a' (end-exclusive), IN 'b'
    tags_at_noon = {t for u, ts_, t in got if ts_ == dt(2024, 1, 2, 12)}
    assert tags_at_noon == {"b"}
    # overlap: 11:59 point matches both 'a' and 'b' exactly once each
    assert [t for u, ts_, t in got
            if ts_ == dt(2024, 1, 2, 11, 59)] == ["a", "b"]


def test_stratified_sample_deterministic_and_nested(spark):
    """stratified_sample: reproducible across runs/partitionings, rates
    land near targets, and a smaller fraction's sample is a SUBSET of a
    larger one under the same salt (nested samples)."""
    from openapc_olap_spark.operators.packing import stratified_sample
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    frac = {"en": 0.8, "de": 0.3}
    a = {r["doc_id"] for r in
         stratified_sample(docs, "lang", frac).select("doc_id").collect()}
    b = {r["doc_id"] for r in
         stratified_sample(docs.repartition(7), "lang", frac)
         .select("doc_id").collect()}
    assert a == b and a
    by_lang = {r["lang"]: r["n"] for r in
               docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
    kept = {r["lang"]: r["n"] for r in
            stratified_sample(docs, "lang", frac)
            .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, f in frac.items():
        if by_lang.get(lang, 0) > 50:
            assert abs(kept.get(lang, 0) / by_lang[lang] - f) < 0.15
    assert set(kept) <= set(frac)          # default_fraction=0 drops rest
    small = {r["doc_id"] for r in
             stratified_sample(docs, "lang", {"en": 0.3, "de": 0.1})
             .select("doc_id").collect()}
    assert small <= a                      # nested under the same salt


# ---------------------------------------------------------------------------
# decontam: train/eval n-gram overlap
# ---------------------------------------------------------------------------

def test_decontaminate_counts_flags_and_drop(spark):
    from openapc_olap_spark.operators import decontam
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs"),
         (3, "the quick brown fox sat still"),   # shares 2 grams with eval
         (4, "hi")],                             # too short for a 3-gram
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "watch the quick brown fox jumps high")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_overlap"], r["contaminated"])
           for r in decontam.decontaminate(train, ev, n=3,
                                           min_hits=2).collect()}
    # eval grams: watch the quick / the quick brown / quick brown fox /
    #             brown fox jumps / fox jumps high
    assert out[1] == (3, True)     # the quick brown, quick brown fox, brown fox jumps
    assert out[2] == (0, False)
    assert out[3] == (2, True)     # the quick brown, quick brown fox
    assert out[4] == (0, False)    # gram-less doc still present, zero-filled
    kept = sorted(r["doc_id"] for r in
                  decontam.drop_contaminated(train, ev, n=3,
                                             min_hits=2).collect())
    assert kept == [2, 4]


def test_decontaminate_hashed_matches_string_path(spark):
    from openapc_olap_spark.operators import decontam
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta word"),
                 (F.col("id") % 7).cast("string"),
                 F.lit(" epsilon zeta")).alias("text"))
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    hashed = decontam.decontaminate(tr, ev, n=3, min_hits=1)
    strings = decontam.decontaminate(tr, ev, n=3, min_hits=1, hashed=False)
    assert sorted(map(tuple, hashed.collect())) == \
        sorted(map(tuple, strings.collect()))


# ---------------------------------------------------------------------------
# bloom: runtime prefilter semi-join
# ---------------------------------------------------------------------------

def test_bloom_no_false_negatives_and_exact_semi_join(spark):
    from openapc_olap_spark.operators import bloom
    fact = spark.range(5000).select((F.col("id") % 997).alias("k"),
                                    F.col("id").alias("v"))
    keys = spark.range(40).select((F.col("id") * 13 + 5).alias("k"))
    sketch = bloom.bloom_build(keys, "k", num_bits=1 << 12)
    # every true key passes the membership expression (no false negatives)
    missed = (keys.filter(~bloom.bloom_might_contain(F.col("k"), sketch))
              .count())
    assert missed == 0
    exact = bloom.bloom_semi_join(fact, keys, "k", num_bits=1 << 12)
    plain = fact.join(keys, "k", "left_semi")
    assert sorted(map(tuple, exact.collect())) == \
        sorted(map(tuple, plain.collect()))
    # superset mode keeps at least the exact rows
    sup = bloom.bloom_semi_join(fact, keys, "k", num_bits=1 << 12,
                                exact=False)
    assert sup.count() >= exact.count()


def test_bloom_sketch_is_fixed_size_and_selective(spark):
    from openapc_olap_spark.operators import bloom
    keys = spark.range(100).select(F.col("id").alias("k"))
    sketch = bloom.bloom_build(keys, "k", num_bits=1 << 12, num_hashes=5)
    assert len(sketch) == (1 << 12) // 64
    # probe 10k foreign keys: FPR should be far under 50%
    probes = spark.range(10_000, 20_000).select(F.col("id").alias("k"))
    fp = probes.filter(bloom.bloom_might_contain(F.col("k"), sketch)).count()
    assert fp < 2_000


# ---------------------------------------------------------------------------
# ranking: per-group top-k
# ---------------------------------------------------------------------------

def test_top_k_salted_equals_plain_and_breaks_ties(spark):
    from openapc_olap_spark.operators import ranking
    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).alias("grp"),
        (F.col("id") % 11).alias("score"))   # many ties
    plain = ranking.top_k_per_group(df, ["grp"], "score", 4, "doc_id")
    salted = ranking.top_k_per_group(df, ["grp"], "score", 4, "doc_id",
                                     salt_parts=5)
    rows_p = sorted(map(tuple, plain.collect()))
    rows_s = sorted(map(tuple, salted.collect()))
    assert rows_p == rows_s
    assert len(rows_p) == 7 * 4
    # rank 1 of group 0: max score 10, smallest doc_id with that score
    top = [r for r in rows_p if r[1] == 0 and r[3] == 1]
    assert top == [(21, 0, 10, 1)]
    best = ranking.best_per_group(df, ["grp"], "score", "doc_id")
    assert best.count() == 7 and "rk" not in best.columns


# ---------------------------------------------------------------------------
# packing.deterministic_shuffle
# ---------------------------------------------------------------------------

def test_deterministic_shuffle_stable_and_seed_sensitive(spark):
    from openapc_olap_spark.operators import packing
    df = spark.range(300).select(F.col("id").alias("doc_id"),
                                 F.lit("t").alias("text"))
    a = packing.deterministic_shuffle(df, seed="s1", n_shards=4)
    b = packing.deterministic_shuffle(df, seed="s1", n_shards=4)
    ra = sorted(map(tuple, a.select("doc_id", "shard", "pos").collect()))
    rb = sorted(map(tuple, b.select("doc_id", "shard", "pos").collect()))
    assert ra == rb                                  # reproducible
    # per-shard positions are contiguous 1..n
    import collections
    per = collections.defaultdict(list)
    for doc, shard, pos in ra:
        per[shard].append(pos)
    assert sum(len(v) for v in per.values()) == 300
    for shard, ps in per.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    c = packing.deterministic_shuffle(df, seed="s2", n_shards=4)
    rc = sorted(map(tuple, c.select("doc_id", "shard", "pos").collect()))
    assert rc != ra                                  # seed re-deals


# ---------------------------------------------------------------------------
# sketches: count-min
# ---------------------------------------------------------------------------

def test_cms_one_sided_error_and_merge(spark):
    from openapc_olap_spark.operators import sketches
    rows = [(f"k{i % 37}",) for i in range(2000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "t string")
    grid = sketches.cms_build(df, "t", width=256, depth=4)
    probes = spark.createDataFrame(
        [("hot",), ("k0",), ("k36",), ("absent",)], "token string")
    est = {r["token"]: r["est"]
           for r in sketches.cms_estimate(grid, probes, "token", width=256,
                                          depth=4).collect()}
    exact = {"hot": 500, "k0": 55, "k36": 54, "absent": 0}
    for k, n in exact.items():
        assert est[k] >= n                       # never undercounts
        assert est[k] <= n + 2500 * 4 / 256      # crude width bound
    # mergeability: sketch(full) == merge(sketch(a), sketch(b))
    a = spark.createDataFrame(rows[:1200], "t string")
    b = spark.createDataFrame(rows[1200:], "t string")
    merged = sketches.cms_merge(sketches.cms_build(a, "t", 256, 4),
                                sketches.cms_build(b, "t", 256, 4))
    full = sorted(map(tuple, grid.collect()))
    assert sorted(map(tuple, merged.collect())) == full


# ---------------------------------------------------------------------------
# tfidf
# ---------------------------------------------------------------------------

def test_tfidf_scores_and_tiebreak(spark):
    import math
    from openapc_olap_spark.operators import tfidf
    df = spark.createDataFrame(
        [(1, "apple apple banana common"),
         (2, "banana cherry common"),
         (3, "cherry common common")],
        "doc_id long, text string")
    out = tfidf.tfidf_top_terms(df, k=2)
    rows = {(r["doc_id"], r["rk"]): (r["term"], r["tf"], r["df"],
                                     r["tfidf"]) for r in out.collect()}
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert rows[(1, 1)][0] == "apple"
    assert abs(rows[(1, 1)][3] - 2 * math.log(3)) < 1e-9
    assert rows[(1, 2)][0] == "banana"
    # doc 2: banana and cherry both tf=1 df=2 — exact tie, term asc
    assert rows[(2, 1)][0] == "banana" and rows[(2, 2)][0] == "cherry"
    # common: df=3 -> idf ln(1)=0, never outranks an informative term
    assert all(t != "common" for (doc, rk), (t, *_) in rows.items()
               if rk == 1)
    # max_df_ratio prunes it entirely
    pruned = tfidf.tfidf_top_terms(df, k=3, max_df_ratio=0.9)
    assert "common" not in {r["term"] for r in pruned.collect()}


def test_tfidf_salted_equals_plain(spark):
    from openapc_olap_spark.operators import tfidf
    docs = spark.range(80).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w"), (F.col("id") % 11).cast("string"),
                 F.lit(" w"), (F.col("id") % 7).cast("string"),
                 F.lit(" w"), (F.col("id") % 5).cast("string"),
                 F.lit(" shared")).alias("text"))
    a = tfidf.tfidf_top_terms(docs, k=2, round_to=6)
    b = tfidf.tfidf_top_terms(docs, k=2, round_to=6, salt_parts=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# quantize: int8 embeddings
# ---------------------------------------------------------------------------

def test_quantize_roundtrip_fidelity_and_edges(spark):
    import math
    import random
    from openapc_olap_spark.operators import quantize
    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(50)]
    rows.append((50, [0.0] * 64))                       # zero vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = quantize.quantize_embeddings(df, keep_vec=True)
    got = {r["vec_id"]: r for r in q.collect()}
    assert got[50]["scale"] == 0.0 and set(got[50]["qvec"]) == {0}
    for i in range(50):
        r = got[i]
        assert max(abs(v) for v in r["qvec"]) == 127    # max element saturates
        deq = [v * r["scale"] for v in r["qvec"]]
        orig = r["embedding"]
        dot = sum(a * b for a, b in zip(deq, orig))
        cos = dot / (math.sqrt(sum(a * a for a in deq)) *
                     math.sqrt(sum(b * b for b in orig)))
        assert cos > 0.999                               # int8 fidelity
        # every element within half a quantization step
        assert all(abs(d - o) <= r["scale"] * 0.5 + 1e-12
                   for d, o in zip(deq, orig))


def test_quantized_dot_approximates_float_dot(spark):
    import random
    from openapc_olap_spark.operators import quantize
    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(64)],
             [rng.gauss(0, 1) for _ in range(64)]) for i in range(20)]
    df = spark.createDataFrame(
        rows, "i long, a array<double>, b array<double>")
    qa = quantize.quantize_embeddings(
        df.withColumnRenamed("a", "embedding"), keep_vec=True) \
        .select("i", "b", F.col("scale").alias("sa"),
                F.col("qvec").alias("qa"), F.col("embedding").alias("a"))
    qb = quantize.quantize_embeddings(
        qa.withColumnRenamed("b", "embedding"), keep_vec=True) \
        .select("i", "a", "sa", "qa", F.col("scale").alias("sb"),
                F.col("qvec").alias("qb"), F.col("embedding").alias("b"))
    out = qb.select(
        "i",
        quantize.quantized_dot(F.col("qa"), F.col("sa"),
                               F.col("qb"), F.col("sb")).alias("qdot"),
        F.aggregate(F.zip_with("a", "b", lambda x, y: x * y),
                    F.lit(0.0), lambda s, x: s + x).alias("fdot"))
    for r in out.collect():
        # 64-dim int8 dot: error bound ~ dim * (step_a*|b| + step_b*|a|)/2
        assert abs(r["qdot"] - r["fdot"]) < 0.35, r


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------

def test_chunk_documents_coverage_and_overlap(spark):
    from openapc_olap_spark.operators import chunking
    words = lambda n: " ".join(f"w{i}" for i in range(n))
    df = spark.createDataFrame(
        [(1, words(10)),    # n < chunk -> 1 chunk of 10
         (2, words(32)),    # n == chunk -> exactly 1 chunk
         (3, words(33)),    # one over -> 2 chunks, second is short
         (4, words(80)),    # 1 + ceil(48/24) = 3 chunks
         (5, "")],          # token-less -> no chunks
        "doc_id long, text string")
    out = chunking.chunk_documents(df, chunk_tokens=32, overlap=8)
    rows = sorted((r["doc_id"], r["chunk_id"], r["n_tokens"],
                   r["chunk_text"]) for r in out.collect())
    by_doc = {}
    for d, c, n, t in rows:
        by_doc.setdefault(d, []).append((c, n, t.split()))
    assert 5 not in by_doc
    assert [n for _, n, _ in by_doc[1]] == [10]
    assert [n for _, n, _ in by_doc[2]] == [32]
    assert [n for _, n, _ in by_doc[3]] == [32, 9]
    assert [n for _, n, _ in by_doc[4]] == [32, 32, 32]
    for d, n_total in [(1, 10), (2, 32), (3, 33), (4, 80)]:
        seen = set()
        chunks = by_doc[d]
        for i, (c, n, toks) in enumerate(chunks):
            assert c == i
            assert toks == [f"w{j}" for j in range(c * 24, c * 24 + n)]
            seen.update(toks)
            if i > 0:  # consecutive chunks overlap by exactly 8 tokens
                prev = set(chunks[i - 1][2])
                assert len(prev & set(toks)) == min(8, n)
        assert seen == {f"w{j}" for j in range(n_total)}  # full coverage


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest
    from openapc_olap_spark.operators import chunking
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        chunking.chunk_documents(df, chunk_tokens=8, overlap=8)


# ---------------------------------------------------------------------------
# packing.rebalance_mixture
# ---------------------------------------------------------------------------

def test_mixture_fractions_math_and_rebalance(spark):
    from openapc_olap_spark.operators import packing
    rows = ([(i, "en") for i in range(600)] +
            [(i + 1000, "de") for i in range(100)] +
            [(i + 2000, "fr") for i in range(300)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    # targets 50/25/25 -> cap limited by de: T = 100/.25 = 400; fractions
    # floored to permille (engine-portable resolution)
    fr = packing.mixture_fractions(df, "lang",
                                   {"en": 0.5, "de": 0.25, "fr": 0.25})
    assert fr["en"] == 0.333
    assert fr["de"] == 1.0
    assert fr["fr"] == 0.333
    out = packing.rebalance_mixture(df, "lang",
                                    {"en": 0.5, "de": 0.25, "fr": 0.25})
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["de"] == 100                      # fraction 1.0 keeps all
    # hash-uniform sampling: within ~15% of the target counts
    assert abs(got["en"] - 200) < 30 and abs(got["fr"] - 100) < 20
    import pytest as _pytest
    with _pytest.raises(ValueError):
        packing.mixture_fractions(df, "lang", {"en": 1.0, "xx": 1.0})


# ---------------------------------------------------------------------------
# dedup.incremental_dedup
# ---------------------------------------------------------------------------

def test_incremental_dedup_bloom_equals_plain(spark):
    from openapc_olap_spark.operators import dedup as _dedup
    from openapc_olap_spark.operators.text import fingerprint
    seen_docs = spark.createDataFrame(
        [(i, f"known document number {i}") for i in range(40)],
        "doc_id long, text string")
    new_docs = spark.createDataFrame(
        # 10 duplicates of the index (ids 100+), 20 novel
        [(100 + i, f"known  DOCUMENT number {i}") for i in range(10)] +
        [(200 + i, f"fresh content {i}") for i in range(20)],
        "doc_id long, text string")
    seen = seen_docs.select(fingerprint("text").alias("fp"))
    plain = _dedup.incremental_dedup(new_docs, seen)
    fast = _dedup.incremental_dedup(new_docs, seen, bloom_bits=1 << 12)
    ids_plain = sorted(r["doc_id"] for r in plain.collect())
    ids_fast = sorted(r["doc_id"] for r in fast.collect())
    # normalization: case/whitespace variants of indexed docs are dropped
    assert ids_plain == [200 + i for i in range(20)]
    assert ids_fast == ids_plain
    assert fast.columns == new_docs.columns      # helper column dropped


def test_incremental_dedup_keep_fp(spark):
    """keep_fp=True (round 14) keeps the computed fingerprint as __fp:
    same surviving rows as the default, and the column equals
    text.fingerprint of the surviving text — commit paths reuse it
    instead of re-hashing."""
    from openapc_olap_spark.operators import dedup as _dedup
    from openapc_olap_spark.operators.text import fingerprint
    seen_docs = spark.createDataFrame(
        [(i, f"known document number {i}") for i in range(10)],
        "doc_id long, text string")
    new_docs = spark.createDataFrame(
        [(100 + i, f"known document number {i}") for i in range(5)] +
        [(200 + i, f"fresh content {i}") for i in range(8)],
        "doc_id long, text string")
    seen = seen_docs.select(fingerprint("text").alias("fp"))
    for bits in (None, 1 << 12):          # plain and bloom-guarded paths
        kept = _dedup.incremental_dedup(new_docs, seen, bloom_bits=bits,
                                        keep_fp=True)
        assert kept.columns == new_docs.columns + ["__fp"]
        rows = {r["doc_id"]: r["__fp"] for r in kept.collect()}
        assert sorted(rows) == [200 + i for i in range(8)]
        expect = {r["doc_id"]: r["fp"] for r in new_docs.select(
            "doc_id", fingerprint("text").alias("fp")).collect()}
        assert all(rows[i] == expect[i] for i in rows)


def test_chunking_formula_property():
    """Chunk-count arithmetic property-tested in pure Python on the same
    formula chunk_documents evaluates in-plan (k = 1 + ceil(max(n-c,0)/s),
    chunk i = tokens[i*s : i*s + c]; test_chunk_documents_coverage_and_
    overlap pins the Spark operator to this mirror): full coverage, no
    empty chunk, exact overlap, and minimality (k-1 chunks never cover)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=500, deadline=None)
    @given(n=st.integers(1, 500), c=st.integers(1, 64),
           data=st.data())
    def check(n, c, data):
        o = data.draw(st.integers(0, c - 1))
        s = c - o
        k = 1 + -(-max(n - c, 0) // s)
        chunks = [(i * s, min(i * s + c, n)) for i in range(k)]
        assert chunks[0][0] == 0 and chunks[-1][1] == n      # coverage
        assert all(a < b for a, b in chunks)                 # never empty
        for (a1, b1), (a2, b2) in zip(chunks, chunks[1:]):
            assert a2 == a1 + s                              # stride
            assert max(0, b1 - a2) == min(o, b2 - a2)        # overlap
        if k > 1:                                            # minimality
            assert chunks[-2][1] < n

    check()


# ---------------------------------------------------------------------------
# sources.io: generic dataset IO
# ---------------------------------------------------------------------------

def test_write_read_dataset_all_formats(spark, tmp_path):
    from openapc_olap_spark.sources.io import read_dataset, write_dataset
    df = spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5, i % 3) for i in range(100)],
        "id long, name string, val double, grp int")
    want = sorted(map(tuple, df.collect()))
    for fmt in ["parquet", "orc", "json", "csv"]:
        p = str(tmp_path / fmt)
        write_dataset(df, p, fmt=fmt, partition_by=["grp"],
                      sort_by=["id"], num_files=2)
        schema = df.schema if fmt in ("csv", "json") else None
        back = read_dataset(spark, p, fmt=fmt, schema=schema)
        got = sorted(tuple(r[c] for c in df.columns)
                     for r in back.select(*df.columns).collect())
        assert got == want, fmt
    import os as _os
    files = [f for f in _os.listdir(str(tmp_path / "orc" / "grp=0"))
             if f.endswith(".orc")]
    assert 0 < len(files) <= 2        # num_files bounds the sink fan-out
    import pytest as _pytest
    with _pytest.raises(ValueError):
        write_dataset(df, str(tmp_path / "x"), fmt="avro")


# ---------------------------------------------------------------------------
# pipeline: end-to-end pretraining chain, DuckDB twin of the whole thing
# ---------------------------------------------------------------------------

def test_pretraining_pipeline_matches_duckdb_twin(spark):
    """The composed quality→dedup→decontaminate→chunk→split chain against
    a single DuckDB SQL twin of all five stages — the same methodology as
    the driver gates, run in-suite (gate material for the next window)."""
    import duckdb

    from openapc_olap_spark.operators import pipeline
    from openapc_olap_spark.session import load_tables

    sf = "/root/testdata/sf0.001"
    docs = load_tables(spark, sf, ["documents"])["documents"]
    train = docs.filter(F.col("doc_id") % 13 != 0)
    ev = docs.filter(F.col("doc_id") % 13 == 0)
    out = pipeline.pretraining_pipeline(
        train, ev, min_tokens=20, ngram=3, min_hits=2,
        chunk_tokens=32, overlap=8)
    got = sorted(map(tuple,
                     pipeline.pipeline_report(out)
                     .select("split", "n_chunks", "n_docs", "total_tokens")
                     .collect()))

    toks = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"
    sh = ("list_distinct(list_transform("
          "generate_series(1, greatest(len(toks) - 2, 0)),"
          "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))")
    want = duckdb.sql(f"""
      WITH base AS (
        SELECT doc_id, text, {toks} AS toks
        FROM '{sf}/documents.parquet'),
      q AS (SELECT * FROM base WHERE doc_id % 13 <> 0 AND len(toks) >= 20),
      fp AS (
        SELECT *, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                 AS f FROM q),
      dd AS (
        SELECT * FROM (SELECT *, min(doc_id) OVER (PARTITION BY f) AS keep
                       FROM fp) WHERE doc_id = keep),
      evg AS (
        SELECT DISTINCT unnest({sh}) AS g FROM
          (SELECT {toks} AS toks FROM '{sf}/documents.parquet'
           WHERE doc_id % 13 = 0)),
      contam AS (
        SELECT t.doc_id FROM
          (SELECT doc_id, unnest({sh}) AS g FROM
             (SELECT doc_id, toks FROM dd)) t
        JOIN evg USING (g) GROUP BY 1 HAVING count(*) >= 2),
      cl AS (
        SELECT doc_id, toks FROM dd
        WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
      ch AS (
        SELECT doc_id, unnest(generate_series(0,
                 (greatest(len(toks) - 32, 0) + 23) // 24)) AS chunk_id,
               toks FROM cl),
      pieces AS (
        SELECT doc_id, chunk_id,
               len(toks[chunk_id * 24 + 1 : chunk_id * 24 + 32]) AS n_tokens
        FROM ch),
      sp AS (
        SELECT *, CASE WHEN b < 50 THEN 'val' WHEN b < 100 THEN 'test'
                       ELSE 'train' END AS split FROM
          (SELECT *, ('0x' || substr(md5('split:' || doc_id::VARCHAR || '#'
                      || chunk_id::VARCHAR), 1, 15))::BIGINT % 1000 AS b
           FROM pieces))
      SELECT split, count(*) AS n_chunks, count(DISTINCT doc_id) AS n_docs,
             sum(n_tokens)::BIGINT AS total_tokens
      FROM sp GROUP BY 1 ORDER BY 1
    """).fetchall()
    assert got == sorted(map(tuple, want))
    assert sum(r[1] for r in got) > 50            # the chain kept real data


def test_recommended_nbits_occupancy_rule(spark):
    from openapc_olap_spark.operators.similarity import recommended_nbits
    assert recommended_nbits(500, 8) == 6
    assert recommended_nbits(10**9, 1024) == 20
    assert recommended_nbits(0) == 4                    # degenerate floor
    assert recommended_nbits(10**12, 1) == 28           # cap
    # monotone in corpus size
    ns = [10**k for k in range(2, 10)]
    bits = [recommended_nbits(n) for n in ns]
    assert bits == sorted(bits)


# ---------------------------------------------------------------------------
# semdedup: SemDeDup-style IVF-cluster semantic dedup
# ---------------------------------------------------------------------------

def test_semantic_dedup_matches_numpy(emb):
    """Survivor set against a numpy replication of the whole algorithm:
    first-8 centroid argmin assignment, intra-cluster cosine pairs,
    min-id-wins drop."""
    from openapc_olap_spark.operators import semdedup

    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    cents = mat[:8]
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)                       # first index wins ties
    norms = np.linalg.norm(mat, axis=1)
    drops = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if assign[i] != assign[j]:
                continue
            cos = mat[i] @ mat[j] / (norms[i] * norms[j])
            if cos >= 0.35:
                drops.add(max(ids[i], ids[j]))
    expected = set(ids) - drops

    spark_cents = [list(map(float, c)) for c in cents]
    kept = semdedup.semantic_dedup(emb, spark_cents, threshold=0.35)
    got = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert got == expected
    assert 0 < len(got) < len(ids)                   # it actually dropped


def test_semantic_dedup_min_id_survives(spark):
    from openapc_olap_spark.operators import semdedup

    vecs = [(1, [1.0, 0.0, 0.5]), (2, [2.0, 0.0, 1.0]),   # colinear pair
            (3, [-1.0, 2.0, 0.0])]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    cents = [[1.0, 0.0, 0.5], [-1.0, 2.0, 0.0]]
    pairs = semdedup.semantic_candidate_pairs(df, cents, threshold=0.99)
    got = pairs.collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
    assert got[0]["cos_sim"] == pytest.approx(1.0)
    kept = semdedup.semantic_dedup(df, cents, threshold=0.99)
    assert {r["vec_id"] for r in kept.collect()} == {1, 3}


def test_semantic_dedup_cluster_cap(emb):
    """cluster_cap drops only pairs inside capped (hot) clusters; with a
    cap no cluster exceeds, results are identical to uncapped."""
    from openapc_olap_spark.operators import semdedup
    from openapc_olap_spark.operators.similarity import ivf_assign

    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    cents = [list(map(float, r["embedding"])) for r in rows[:8]]
    sizes = (ivf_assign(emb, cents).groupBy("list_id").count().collect())
    biggest = max(r["count"] for r in sizes)
    kw = dict(threshold=0.35)
    keyset = lambda df: {r["vec_id"] for r in df.select("vec_id").collect()}
    uncapped = keyset(semdedup.semantic_dedup(emb, cents, **kw))
    nocap_effect = keyset(semdedup.semantic_dedup(
        emb, cents, cluster_cap=biggest, **kw))
    assert nocap_effect == uncapped
    capped = keyset(semdedup.semantic_dedup(
        emb, cents, cluster_cap=max(r["count"] for r in sizes) - 1, **kw))
    assert capped >= uncapped                    # capping only saves rows
    assert capped > uncapped                     # and the hot cluster was live


# ---------------------------------------------------------------------------
# lm: unigram language-model scoring
# ---------------------------------------------------------------------------

def test_unigram_logprob_hand_computed(spark):
    """Two-doc corpus small enough to verify every probability by hand:
    corpus tokens = [a a b], N=3, V=2, denom = 3 + 1*(2+1) = 6;
    p(a)=(2+1)/6=0.5, p(b)=(1+1)/6=1/3."""
    import math

    from openapc_olap_spark.operators import lm

    df = spark.createDataFrame([(1, "a a"), (2, "b")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in lm.doc_mean_logprob(df).collect()}
    assert got[1]["n_tokens"] == 2
    assert got[1]["mean_logprob"] == pytest.approx(math.log(0.5))
    assert got[2]["n_tokens"] == 1
    assert got[2]["mean_logprob"] == pytest.approx(math.log(1 / 3))


def test_unigram_logprob_oov_and_reference_model(spark):
    """Scoring against a pre-trained reference model: unseen tokens get
    the smoothing mass k/denom; an all-OOV doc scores exactly ln(1/denom)
    and LOWER than an in-vocabulary doc (the quality-filter signal)."""
    import math

    from openapc_olap_spark.operators import lm

    ref = spark.createDataFrame([(1, "a a b")], ["doc_id", "text"])
    model = lm.unigram_counts(ref)
    score_df = spark.createDataFrame(
        [(10, "a b"), (11, "zz qq")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           lm.doc_mean_logprob(score_df, model=model).collect()}
    denom = 3 + 1 * (2 + 1)
    assert got[11]["mean_logprob"] == pytest.approx(math.log(1 / denom))
    expected_10 = (math.log(3 / denom) + math.log(2 / denom)) / 2
    assert got[10]["mean_logprob"] == pytest.approx(expected_10)
    assert got[11]["mean_logprob"] < got[10]["mean_logprob"]


def test_unigram_min_count_prunes_to_oov(spark):
    """min_count removes rare tokens from the vocabulary: they then score
    at OOV mass, and V shrinks accordingly."""
    import math

    from openapc_olap_spark.operators import lm

    df = spark.createDataFrame([(1, "a a a rare")], ["doc_id", "text"])
    model = lm.unigram_counts(df, min_count=2)     # keeps only 'a' (c=3)
    assert [tuple(r) for r in model.collect()] == [("a", 3)]
    got = lm.doc_mean_logprob(df, model=model).collect()[0]
    denom = 3 + 1 * (1 + 1)                         # N=3 (model mass), V=1
    expected = (3 * math.log(4 / denom) + math.log(1 / denom)) / 4
    assert got["mean_logprob"] == pytest.approx(expected)


def test_unigram_logprob_empty_docs_emit_no_row(spark):
    from openapc_olap_spark.operators import lm

    df = spark.createDataFrame([(1, "x y"), (2, "   ")], ["doc_id", "text"])
    got = lm.doc_mean_logprob(df).collect()
    assert {r["doc_id"] for r in got} == {1}


# ---------------------------------------------------------------------------
# bpe: byte-pair-encoding vocabulary induction
# ---------------------------------------------------------------------------

def test_bpe_train_classic_example(spark):
    """The Sennrich low/lower corpus: first merges must be l+o, lo+w
    (frequency-weighted), then e+r."""
    from openapc_olap_spark.operators import bpe

    df = spark.createDataFrame(
        [(1, "low lower lowest low low newer newest"),
         (2, "wider new newer low")], ["doc_id", "text"])
    merges, vocab = bpe.bpe_train(df, 3)
    assert merges == [("l", "o", 6), ("lo", "w", 6), ("e", "r", 4)]
    seg = {r["word"]: list(r["symbols"]) for r in vocab.collect()}
    assert seg["low"] == ["low"]
    assert seg["lower"] == ["low", "er"]
    assert seg["newer"] == ["n", "e", "w", "er"]


def test_bpe_merge_greedy_no_reuse(spark):
    """Greedy left-to-right with no intra-pass reuse: merging (a,a) over
    'aaa' yields [aa, a], never [aa, aa]-style reconsumption; and a
    token created by a merge does not immediately chain."""
    from openapc_olap_spark.operators import bpe

    df = spark.createDataFrame([("aaa", 1), ("abab", 1), ("aab", 1)],
                               ["word", "wc"])
    v = bpe.with_initial_symbols(df)
    out = {r["word"]: list(r["symbols"])
           for r in bpe.apply_merge(v, "a", "a").collect()}
    assert out["aaa"] == ["aa", "a"]
    assert out["abab"] == ["a", "b", "a", "b"]
    assert out["aab"] == ["aa", "b"]
    out2 = {r["word"]: list(r["symbols"])
            for r in bpe.apply_merge(v, "a", "b").collect()}
    assert out2["abab"] == ["ab", "ab"]
    assert out2["aab"] == ["a", "ab"]


def test_bpe_pair_counts_weighted(spark):
    from openapc_olap_spark.operators import bpe

    df = spark.createDataFrame([("ab", 3), ("abc", 2), ("x", 5)],
                               ["word", "wc"])
    got = {r["pair"]: r["cnt"] for r in
           bpe.pair_counts(bpe.with_initial_symbols(df)).collect()}
    assert got == {"a b": 5, "b c": 2}      # 1-char words emit no pairs


def test_bpe_train_stops_when_no_pairs(spark):
    from openapc_olap_spark.operators import bpe

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    merges, vocab = bpe.bpe_train(df, 5)
    assert merges == []                      # all words single-symbol
    assert vocab.count() == 3


def test_bpe_train_batched_equals_sequential(spark):
    """merge_batch is an EXACT optimization (VERDICT r05 item 3): the
    learned merge LIST — order, pairs, counts — and the final
    segmentation digest are bit-identical to the sequential loop, on the
    Sennrich corpus and on a messier corpus engineered to hit the
    conflict/tie machinery; only the Spark job count drops."""
    from openapc_olap_spark.operators import bpe

    corpora = [
        [(1, "low lower lowest low low newer newest"),
         (2, "wider new newer low")],
        # conflict-heavy: overlapping pairs, ties, single chars
        [(1, "aab aab abba baab bb aa ab ba"),
         (2, "abc bca cab abcabc aabbcc"),
         (3, "xyzzy zzyzx xyz zyx zz yy xx")],
    ]
    for rows in corpora:
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        seq_m, seq_v = bpe.bpe_train(df, 8, merge_batch=1)
        dig_seq = seq_v.agg(bpe.segment_digest()).first()[0]
        for batch in (3, 8):
            bat_m, bat_v = bpe.bpe_train(df, 8, merge_batch=batch)
            assert bat_m == seq_m
            assert bat_v.agg(bpe.segment_digest()).first()[0] == dig_seq


def test_bpe_select_merge_batch_rules():
    """Unit coverage of the exactness gates: conflict cut, strict count
    gate, concat-collision guards, tie fallback, exhausted list."""
    from openapc_olap_spark.operators.bpe import _select_merge_batch

    # conflict at rank 3 cuts; survivors beat the cut count strictly
    rows = [{"pair": "a b", "cnt": 30}, {"pair": "c d", "cnt": 20},
            {"pair": "b c", "cnt": 7}]
    assert _select_merge_batch(rows, 8) == [("a", "b", 30), ("c", "d", 20)]
    # a member TYING the cut count is rejected (created pairs bounded by
    # cut could tie into it via the pair-asc tie-break)
    rows = [{"pair": "a b", "cnt": 10}, {"pair": "c d", "cnt": 7},
            {"pair": "b c", "cnt": 7}]
    assert _select_merge_batch(rows, 8) == [("a", "b", 10)]
    # tie with a conflicting pair -> only the argmax survives
    rows = [{"pair": "a b", "cnt": 10}, {"pair": "b c", "cnt": 10}]
    assert _select_merge_batch(rows, 8) == [("a", "b", 10)]
    # concat collision: (ab, c) would create "abc" == (a, bc)'s concat;
    # the prefix stops there even though tokens are disjoint
    rows = [{"pair": "a bc", "cnt": 30}, {"pair": "x y", "cnt": 20},
            {"pair": "ab c", "cnt": 9}]
    assert _select_merge_batch(rows, 8) == [("a", "bc", 30),
                                            ("x", "y", 20)]
    # concat equal to a selected token: "cd" created while token "cd"
    # participates in a selected pair -> stop
    rows = [{"pair": "cd e", "cnt": 30}, {"pair": "c d", "cnt": 9}]
    assert _select_merge_batch(rows, 8) == [("cd", "e", 30)]
    # exhausted list, no conflict -> everything is safe (no gate)
    rows = [{"pair": "a b", "cnt": 10}, {"pair": "c d", "cnt": 10}]
    assert _select_merge_batch(rows, 8) == [("a", "b", 10),
                                            ("c", "d", 10)]
    # cap acts as a cut: the capped-out row's count gates the batch
    rows = [{"pair": "a b", "cnt": 30}, {"pair": "c d", "cnt": 8},
            {"pair": "e f", "cnt": 8}]
    assert _select_merge_batch(rows, 2) == [("a", "b", 30)]


# ---------------------------------------------------------------------------
# web: URL parsing / registrable domains / blocklist filtering
# ---------------------------------------------------------------------------

def test_url_host_and_registrable_domain(spark):
    from openapc_olap_spark.operators import web

    cases = [
        ("https://www.example.com/a?b=c", "www.example.com", "example.com"),
        ("http://user:pw@Sub.Host.co.uk:8080/p", "sub.host.co.uk",
         "host.co.uk"),
        ("ftp://example.org", "example.org", "example.org"),
        ("https://a.b.c.d.com.au/x#f", "a.b.c.d.com.au", "d.com.au"),
        ("https://localhost:9000/", "localhost", "localhost"),
        ("not a url", "", ""),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], ["url"])
    got = {r["url"]: (r["host"], r["domain"])
           for r in web.with_domain(df).collect()}
    for url, host, domain in cases:
        assert got[url] == (host, domain), url


def test_domain_stats_rollup(spark):
    from openapc_olap_spark.operators import web

    df = spark.createDataFrame(
        [("https://www.x.com/1", "a b c"),
         ("https://cdn.x.com/2", "d e"),
         ("https://y.org/3", "f")], ["url", "text"])
    got = {r["domain"]: r for r in web.domain_stats(df).collect()}
    assert got["x.com"]["n_docs"] == 2
    assert got["x.com"]["n_hosts"] == 2
    assert got["x.com"]["total_tokens"] == 5
    assert got["y.org"]["n_docs"] == 1
    assert got["y.org"]["n_hosts"] == 1


def test_filter_blocklisted_broadcast_anti(spark):
    from openapc_olap_spark.operators import web

    docs = spark.createDataFrame(
        [(1, "https://spam.co.uk/x"), (2, "https://keep.com/y"),
         (3, "https://www.spam.co.uk/z")], ["doc_id", "url"])
    bl = spark.createDataFrame([("spam.co.uk",)], ["domain"])
    kept = web.filter_blocklisted(docs, bl)
    assert [r["doc_id"] for r in kept.collect()] == [2]
    assert set(kept.columns) == {"doc_id", "url"}   # helper cols dropped
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_semantic_pairs_blocked_equals_plain(emb):
    """The triangle-blocked self-join must produce the IDENTICAL pair set
    for any block count (it only re-cells the same candidate space)."""
    from openapc_olap_spark.operators import semdedup

    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    cents = [list(map(float, r["embedding"])) for r in rows[:8]]
    key = lambda df: {(r["id_a"], r["id_b"]): round(r["cos_sim"], 9)
                      for r in df.collect()}
    plain = key(semdedup.semantic_candidate_pairs(emb, cents,
                                                  threshold=0.35))
    assert plain                                     # fixture has pairs
    for B in (2, 4, 7):
        blocked = key(semdedup.semantic_candidate_pairs(
            emb, cents, threshold=0.35, block_parts=B))
        assert blocked == plain, f"block_parts={B}"


# ---------------------------------------------------------------------------
# mixture: temperature-based resampling
# ---------------------------------------------------------------------------

def test_temperature_targets_math(spark):
    """T=1 reproduces the observed distribution; T=2 flattens toward
    uniform (rare strata gain weight, common strata lose); weights
    always normalize to 1."""
    from openapc_olap_spark.operators import mixture

    rows = [("en",)] * 80 + [("de",)] * 15 + [("fr",)] * 5
    df = spark.createDataFrame(rows, ["lang"])
    t1 = mixture.temperature_targets(df, "lang", 1.0)
    assert t1["en"] == pytest.approx(0.80)
    assert t1["fr"] == pytest.approx(0.05)
    t2 = mixture.temperature_targets(df, "lang", 2.0)
    assert sum(t2.values()) == pytest.approx(1.0)
    assert t2["en"] < t1["en"] and t2["fr"] > t1["fr"]
    tbig = mixture.temperature_targets(df, "lang", 1000.0)
    assert tbig["en"] == pytest.approx(1 / 3, rel=1e-2)   # ~uniform


def test_temperature_resample_keeps_rarest_whole(spark):
    """The rarest stratum is never downsampled (largest t_s/n_s sets the
    feasibility cap); common strata shrink toward the flattened mix."""
    from openapc_olap_spark.operators import mixture

    rows = [(i, "en") for i in range(400)] + \
           [(i + 1000, "fr") for i in range(25)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = mixture.temperature_resample(df, "lang", temperature=2.0)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["fr"] == 25                       # kept whole
    # en target/fr target = sqrt(400/25) = 4 -> en kept ~100 of 400
    assert 80 <= got["en"] <= 120


def test_temperature_validation(spark):
    from openapc_olap_spark.operators import mixture

    df = spark.createDataFrame([("en",)], ["lang"])
    with pytest.raises(ValueError):
        mixture.temperature_targets(df, "lang", 0.0)
    assert mixture.temperature_targets(df.filter("lang <> 'en'"),
                                       "lang", 2.0) == {}


def test_bigram_logprob_hand_computed(spark):
    """Corpus 'a b a b' / 'b a' / 'x': c(a,b)=2, c(b,a)=2, c(a)=c(b)=3,
    V=3, denom=c(prev)+4 -> every bigram scores ln(3/7)."""
    import math

    from openapc_olap_spark.operators import lm

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a"), (3, "x")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in lm.doc_mean_bigram_logprob(df).collect()}
    assert set(got) == {1, 2}                # doc 3 has no bigrams
    assert got[1]["n_bigrams"] == 3
    assert got[1]["mean_logprob"] == pytest.approx(math.log(3 / 7))
    assert got[2]["mean_logprob"] == pytest.approx(math.log(3 / 7))


def test_bigram_unseen_context_scores_oov(spark):
    """Unseen (prev, token) AND unseen prev: p = k / (k*(V+1)) ->
    -ln(V+1); a fluent in-model doc scores strictly higher."""
    import math

    from openapc_olap_spark.operators import lm

    ref = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    bg = lm.bigram_counts(ref)
    ug = lm.unigram_counts(ref)
    score = spark.createDataFrame(
        [(10, "a b"), (11, "zz qq")], ["doc_id", "text"])
    got = {r["doc_id"]: r["mean_logprob"] for r in
           lm.doc_mean_bigram_logprob(score, bg, ug).collect()}
    assert got[11] == pytest.approx(-math.log(3))   # V=2 -> ln(1/3)
    assert got[10] > got[11]


def test_cluster_outliers_flags_planted_outlier(spark):
    """A cluster of near-identical vectors plus one far vector: the far
    vector is flagged; a single-member cluster never flags (stddev
    undefined)."""
    from openapc_olap_spark.operators import semdedup

    base = [1.0, 0.0, 0.0]
    rows = [(i, [1.0, 0.01 * i, 0.0]) for i in range(8)]     # tight cluster
    rows.append((99, [0.2, 0.98, 0.0]))                      # planted outlier
    rows.append((500, [0.0, 0.0, 1.0]))                      # lone cluster
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = [base, [0.0, 0.0, 1.0]]
    out = {r["vec_id"]: r for r in
           semdedup.cluster_outliers(df, cents, z=1.5).collect()}
    assert out[99]["is_outlier"] is True
    assert out[500]["is_outlier"] is False      # single-member cluster
    assert not any(out[i]["is_outlier"] for i in range(8))
    assert out[99]["list_id"] == 0 and out[500]["list_id"] == 1


def test_with_centroid_cosine_values(spark):
    from openapc_olap_spark.operators import semdedup

    df = spark.createDataFrame([(1, [2.0, 0.0]), (2, [0.0, 3.0])],
                               ["vec_id", "embedding"])
    cents = [[1.0, 0.0], [0.0, 1.0]]
    got = {r["vec_id"]: r for r in
           semdedup.with_centroid_cosine(df, cents).collect()}
    assert got[1]["list_id"] == 0
    assert got[1]["centroid_cos"] == pytest.approx(1.0)
    assert got[2]["list_id"] == 1
    assert got[2]["centroid_cos"] == pytest.approx(1.0)


def test_bpe_encode_uses_trained_segmentation_and_char_fallback(spark):
    from openapc_olap_spark.operators import bpe

    train = spark.createDataFrame(
        [(1, "low lower lowest low low newer newest"),
         (2, "wider new newer low")], ["doc_id", "text"])
    _, vocab = bpe.bpe_train(train, 3)
    enc = bpe.bpe_encode(
        spark.createDataFrame([(7, "low lower unknown"), (8, "  ")],
                              ["doc_id", "text"]), vocab)
    got = {r["doc_id"]: r for r in enc.collect()}
    assert list(got[7]["bpe_tokens"]) == \
        ["low", "low", "er", "u", "n", "k", "n", "o", "w", "n"]
    assert got[7]["n_bpe_tokens"] == 10
    assert 8 not in got                      # token-less doc emits no row


def test_bpe_encode_preserves_order_across_duplicates(spark):
    """Repeated words keep their positions (the position-sorted fold,
    not a set join)."""
    from openapc_olap_spark.operators import bpe

    vocab = bpe.with_initial_symbols(
        spark.createDataFrame([("ab", 1)], ["word", "wc"]))
    vocab = bpe.apply_merge(vocab, "a", "b")
    enc = bpe.bpe_encode(
        spark.createDataFrame([(1, "ab x ab")], ["doc_id", "text"]), vocab)
    assert list(enc.first()["bpe_tokens"]) == ["ab", "x", "ab"]


# ---------------------------------------------------------------------------
# rules: Gopher-style named quality rules
# ---------------------------------------------------------------------------

def test_quality_rules_each_rule_fires(spark):
    from openapc_olap_spark.operators import rules

    good = " ".join(f"word{i}" for i in range(30)) + " " + \
        " ".join(f"word{i}" for i in range(30))
    docs = spark.createDataFrame([
        (1, good),                                   # passes everything
        (2, "too short"),                            # doc_length
        (3, " ".join(["a"] * 60)),                   # mean_word_length low
                                                     # (+ distinct_tokens)
        (4, " ".join(["###", "#tag"] * 30)),         # symbol_ratio
        (5, " ".join(["123", "456"] * 30)),          # alpha_words
        (6, " ".join(["word", "word"] * 30)),        # distinct_tokens
    ], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           rules.with_rules(docs, min_tokens=20).collect()}
    assert out[1]["passes_all"]
    assert not out[2]["rule_doc_length"]
    assert not out[3]["rule_mean_word_length"]
    assert not out[4]["rule_symbol_ratio"]
    assert not out[5]["rule_alpha_words"]
    assert not out[6]["rule_distinct_tokens"]
    for i in (2, 3, 4, 5, 6):
        assert not out[i]["passes_all"]


def test_rule_report_counts(spark):
    from openapc_olap_spark.operators import rules

    good = " ".join(f"word{i}" for i in range(30)) + " " + \
        " ".join(f"word{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, good, "en"), (2, "tiny", "en"), (3, good, "de")],
        ["doc_id", "text", "lang"])
    got = {r["lang"]: r for r in
           rules.rule_report(docs, group_col="lang",
                             min_tokens=20).collect()}
    assert got["en"]["n_docs"] == 2 and got["en"]["n_pass"] == 1
    assert got["en"]["fail_doc_length"] == 1
    assert got["de"]["n_pass"] == 1


# ---------------------------------------------------------------------------
# funnel: ordered event progression
# ---------------------------------------------------------------------------

def test_funnel_progress_ordering_semantics(spark):
    """Advancement requires strictly-later events in step order: a
    purchase BEFORE the signup does not count, a later one does; ties at
    identical timestamps never advance."""
    import datetime

    from openapc_olap_spark.operators import funnel

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1: full ordered funnel
        (1, "click", t(1)), (1, "signup", t(2)), (1, "purchase", t(3)),
        # user 2: purchase precedes signup -> depth 2
        (2, "click", t(1)), (2, "purchase", t(2)), (2, "signup", t(3)),
        # user 3: signup only, no click -> depth 0
        (3, "signup", t(1)),
        # user 4: click & signup at the SAME instant -> strict > blocks
        (4, "click", t(5)), (4, "signup", t(5)),
        # user 5: unrelated events only -> filtered out entirely
        (5, "view", t(1)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {r["user_id"]: r["step_reached"] for r in
           funnel.funnel_progress(
               df, ["click", "signup", "purchase"]).collect()}
    assert got == {1: 3, 2: 2, 3: 0, 4: 1}
    rep = {r["step_reached"]: r["n_users"] for r in
           funnel.funnel_report(
               df, ["click", "signup", "purchase"]).collect()}
    assert rep == {3: 1, 2: 1, 1: 1, 0: 1}

    with pytest.raises(ValueError):
        funnel.funnel_progress(df, [])


def test_funnel_null_ts_never_starts_or_advances(spark):
    """ADVICE r05: a NULL-timestamp event must neither start the funnel
    (the step-0 sentinel is also NULL) nor advance it — matching the SQL
    min-after-min chain, where comparisons with NULL never select."""
    import datetime

    from openapc_olap_spark.operators import funnel

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    rows = [
        # user 1: NULL click, real signup later — without the filter the
        # NULL click would "start" the funnel and the signup advance it
        (1, "click", None), (1, "signup", t(2)),
        # user 2: real click, NULL signup, real purchase — NULL must not
        # bridge the gap to depth 3
        (2, "click", t(1)), (2, "signup", None), (2, "purchase", t(3)),
        # user 3: only NULL events -> no row at all (all filtered)
        (3, "click", None),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    got = {r["user_id"]: r["step_reached"] for r in
           funnel.funnel_progress(
               df, ["click", "signup", "purchase"]).collect()}
    assert got == {1: 0, 2: 1}


def test_funnel_event_cap_bounds_bot_user(spark):
    """VERDICT r05 item 5 skew guard: with max_events_per_type set, a
    bot user's array is bounded (earliest-N per type) and every
    under-cap user's result is unchanged vs the exact path."""
    import datetime

    from openapc_olap_spark.operators import funnel

    t = lambda m, s=0: datetime.datetime(2024, 1, 1, 0, m, s)
    rows = [(1, "click", t(0)), (1, "signup", t(1)), (1, "purchase", t(2)),
            (2, "click", t(5))]
    # bot user 99: 5k clicks then a signup after all of them
    rows += [(99, "click", t(10, s % 60)) for s in range(5000)]
    rows += [(99, "signup", t(30))]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    steps = ["click", "signup", "purchase"]
    exact = {r["user_id"]: (r["step_reached"], r["step_ts"]) for r in
             funnel.funnel_progress(df, steps).collect()}
    capped = {r["user_id"]: (r["step_reached"], r["step_ts"]) for r in
              funnel.funnel_progress(
                  df, steps, max_events_per_type=10).collect()}
    assert capped[1] == exact[1] and capped[2] == exact[2]
    # the bot's earliest clicks precede its signup -> still exact here
    assert capped[99] == exact[99] == (2, t(30))


# ---------------------------------------------------------------------------
# cohort: retention analysis
# ---------------------------------------------------------------------------

def test_cohort_retention_hand_computed(spark):
    """Two cohorts over daily periods: user A active days 0,1,3; user B
    active day 0 only; user C first seen day 1, active days 1,2."""
    import datetime

    from openapc_olap_spark.operators import cohort

    d = lambda day, u: (u, datetime.datetime(2024, 1, 1 + day, 12))
    rows = [d(0, "A"), d(1, "A"), d(3, "A"), d(0, "B"), d(1, "C"), d(2, "C"),
            d(1, "A")]                                   # same-period dup
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    ret = {(r["cohort_period"], r["period_offset"]): r["n_users"]
           for r in cohort.cohort_retention(df, period_days=1).collect()}
    c0 = min(k[0] for k in ret)                          # day-0 cohort id
    assert ret[(c0, 0)] == 2                             # A, B
    assert ret[(c0, 1)] == 1                             # A only
    assert ret[(c0, 3)] == 1                             # A
    assert (c0, 2) not in ret                            # nobody day 2
    assert ret[(c0 + 1, 0)] == 1 and ret[(c0 + 1, 1)] == 1   # C's cohort
    rates = {(r["cohort_period"], r["period_offset"]): r["retention"]
             for r in cohort.retention_rates(
                 cohort.cohort_retention(df, period_days=1)).collect()}
    assert rates[(c0, 0)] == 1.0
    assert rates[(c0, 1)] == 0.5


# ---------------------------------------------------------------------------
# r06 hardening: conditional spread, required dim, hint plumbing
# ---------------------------------------------------------------------------

def test_spread_skips_already_wide_frames(spark):
    """VERDICT r05 item 4: _spread repartitions only frames NARROWER than
    defaultParallelism — an already-spread frame passes through untouched
    (same object, no extra shuffle), so sf0.1+ scans stop paying the
    fixed repartition the r05 bench flagged on x06/x18."""
    from openapc_olap_spark.operators.dedup import _spread

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(100).coalesce(1)
    assert narrow.rdd.getNumPartitions() < par
    assert _spread(narrow).rdd.getNumPartitions() == par
    wide = spark.range(100).repartition(par + 2)
    assert _spread(wide) is wide


def test_lsh_bucketize_requires_dim(spark):
    """r04/r05 verdict carry-over: no internal driver-side first-row
    probe — dim is mandatory everywhere."""
    from openapc_olap_spark.operators import similarity

    df = spark.createDataFrame([(1, [0.1, 0.2])], ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="dim"):
        similarity.lsh_bucketize(df, nbits=4)
    assert "bucket" in similarity.lsh_bucketize(df, nbits=4, dim=2).columns


def test_model_hint_modes(spark):
    """lm/bpe join hints: True forces broadcast, False forces a shuffle
    hash join, None adds no hint (AQE/statistics decide) — the scores
    are identical in every mode."""
    from openapc_olap_spark.operators import lm

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog ran the end")],
        ["doc_id", "text"])
    base = sorted(lm.doc_mean_logprob(docs, round_to=6).collect())
    for mode in (True, False):
        got = sorted(lm.doc_mean_logprob(
            docs, round_to=6, broadcast_model=mode).collect())
        assert got == base


# ---------------------------------------------------------------------------
# r06 new operators: urlnorm / linededup / stats / rolling / sharding /
# canonical docs
# ---------------------------------------------------------------------------

def test_canonical_url_rules(spark):
    from openapc_olap_spark.operators import urlnorm

    cases = {
        "HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&b=2&a=1#frag":
            "example.com/A/b?a=1&b=2",
        "http://example.com:80/": "example.com",
        "https://sub.example.com/path/": "sub.example.com/path",
        "example.com/path?gclid=1": "example.com/path",
        "http://www.example.com": "example.com",
        # path case preserved, host folded; non-default port kept
        "https://Ex.COM:8080/CaseS": "ex.com:8080/CaseS",
        # bare ref is SEMANTIC (VCS branch refs, API selectors) — kept by
        # default; ref_src (the Twitter tracker) still strips
        "https://git.example.com/tree?ref=main&ref_src=twsrc":
            "git.example.com/tree?ref=main",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {r["url"]: r["c"] for r in
           df.select("url", urlnorm.canonical_url("url").alias("c"))
           .collect()}
    assert got == cases
    # a site where ref IS a tracker opts in via its own strip list
    custom = df.select(urlnorm.canonical_url(
        "url", tracking_param_re=r"^(utm_[a-z]+|ref|ref_src)=").alias("c"))
    assert "git.example.com/tree" in {r["c"] for r in custom.collect()}


def test_url_dedup_keeps_min_id(spark):
    from openapc_olap_spark.operators import urlnorm

    df = spark.createDataFrame(
        [(3, "https://www.a.com/x/"), (1, "http://a.com/x"),
         (2, "https://a.com/x?utm_source=f"), (9, "https://b.com/y")],
        ["doc_id", "url"])
    dups = urlnorm.url_duplicates(df).collect()
    assert len(dups) == 1
    assert dups[0]["canonical_url"] == "a.com/x"
    assert dups[0]["kept_id"] == 1 and dups[0]["n_dups"] == 3
    kept = sorted(r["doc_id"]
                  for r in urlnorm.dedup_by_url(df).collect())
    assert kept == [1, 9]


def test_remove_boilerplate_lines_semantics(spark):
    from openapc_olap_spark.operators import linededup

    df = spark.createDataFrame(
        [(1, "cookie\nreal content one\ncookie"),      # within-doc repeat
         (2, "cookie\nreal content two"),
         (3, "cookie\nunique line"),
         (4, "no boilerplate here")],
        ["doc_id", "text"])
    freq = {r["line"]: r["n_docs"] for r in
            linededup.line_frequencies(df).collect()}
    assert freq["cookie"] == 3                 # distinct docs, not 4
    out = {r["doc_id"]: (r["text"], r["n_removed"]) for r in
           linededup.remove_boilerplate_lines(df, max_docs=2).collect()}
    assert out[1] == ("real content one", 2)   # both occurrences removed
    assert out[2] == ("real content two", 1)
    assert out[3] == ("unique line", 1)
    assert out[4] == ("no boilerplate here", 0)


def test_char_entropy_hand_computed(spark):
    import math

    from openapc_olap_spark.operators import stats

    df = spark.createDataFrame(
        [(1, "aab"), (2, "abcd"), (3, "aaaa"), (4, "")],
        ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_chars"], r["entropy"]) for r in
           stats.char_entropy(df, round_to=6).collect()}
    assert got[1] == (3, round(math.log(3) - (2 * math.log(2)) / 3, 6))
    assert got[2] == (4, round(math.log(4), 6))
    assert got[3] == (4, 0.0)
    assert 4 not in got                        # empty doc emits no row


def test_percentile_filter_exact_bounds(spark):
    from openapc_olap_spark.operators import stats

    df = spark.createDataFrame([(i, float(i)) for i in range(1, 11)],
                               ["id", "m"])
    lo, hi = stats.percentile_bounds(df, "m", 0.25, 0.75)
    # R-7 interpolation on 1..10: p25 = 3.25, p75 = 7.75
    assert (lo, hi) == (3.25, 7.75)
    kept = sorted(r["id"] for r in
                  stats.filter_by_percentile(df, "m", 0.25, 0.75).collect())
    assert kept == [4, 5, 6, 7]


def test_rolling_features_hand_computed(spark):
    import datetime

    from openapc_olap_spark.operators import rolling

    t = lambda s: datetime.datetime(2024, 1, 1, 0, 0, s)
    rows = [(1, 10, t(1), 2.0), (2, 10, t(2), 4.0), (3, 10, t(3), 9.0),
            (4, 10, t(4), 1.0), (5, 20, t(1), 7.0)]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "value"])
    got = {r["event_id"]: (r["event_idx"], r["value_delta"],
                           r["rolling_mean_k"]) for r in
           rolling.rolling_features(df, k=3, round_to=4).collect()}
    assert got[1] == (1, None, 2.0)
    assert got[2] == (2, 2.0, 3.0)
    assert got[3] == (3, 5.0, 5.0)
    assert got[4] == (4, -8.0, round((9 + 4 + 1) / 3, 4))
    assert got[5] == (1, None, 7.0)
    with pytest.raises(ValueError):
        rolling.rolling_features(df, k=0)


def test_assign_shards_exact_and_partition_invariant(spark):
    from openapc_olap_spark.operators import sharding

    rows = [(i, 10 * (i % 3 + 1)) for i in range(100)]   # weights 10/20/30
    df = spark.createDataFrame(rows, ["doc_id", "n_chars"])
    out = sharding.assign_shards(df, target=100, num_partitions=7)
    got = {r["doc_id"]: (r["cum_before"], r["shard"])
           for r in out.collect()}
    out.unpersist()
    cum = 0
    for i, w in rows:
        assert got[i] == (cum, cum // 100)
        cum += w
    # partitioning must not change the assignment
    out2 = sharding.assign_shards(df.repartition(13), target=100,
                                  num_partitions=3)
    got2 = {r["doc_id"]: (r["cum_before"], r["shard"])
            for r in out2.collect()}
    out2.unpersist()
    assert got2 == got
    summ = {r["shard"]: (r["n_docs"], r["total_weight"]) for r in
            sharding.shard_summary(out).collect()}
    assert sum(v[1] for v in summ.values()) == cum
    with pytest.raises(ValueError):
        sharding.assign_shards(df, target=0)


def test_write_shards_roundtrip_one_file_per_shard(spark, tmp_path):
    """VERDICT r06 item 5: the sharded sink is real — hive shard=
    directories, exactly one data file per shard, id-sorted content,
    and a lossless round trip."""
    import os

    from openapc_olap_spark.operators import sharding
    from openapc_olap_spark.sources.io import read_dataset

    rows = [(i, 10 * (i % 3 + 1), f"t{i}") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "n_chars", "text"])
    p = str(tmp_path / "shards")
    sharding.write_shards(df.repartition(9), p, target=100)
    dirs = sorted(d for d in os.listdir(p) if d.startswith("shard="))
    cum = sum(w for _, w, _ in rows)
    assert len(dirs) == (cum - 1) // 100 + 1
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(p, d))
                 if f.endswith(".parquet")]
        assert len(files) == 1, (d, files)
    back = read_dataset(spark, p)
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(100))
    # shard content matches the assignment (partition column survives)
    got = {r["doc_id"]: r["shard"] for r in back.collect()}
    want = {r["doc_id"]: r["shard"] for r in
            sharding.assign_shards(df, target=100).collect()}
    assert got == want


def test_canonical_documents_picks_best_copy(spark):
    from openapc_olap_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "Same  Page", 5), (2, "same page", 9), (3, "same page", 9),
         (4, "other", 1)],
        ["doc_id", "text", "score"])
    got = {r["doc_id"]: r["n_copies"] for r in
           dedup.canonical_documents(df, score_col="score").collect()}
    # ids 1-3 normalize identically; best score 9, tie -> min id 2
    assert got == {2: 3, 4: 1}


def test_canonical_url_differential_random(spark):
    """Differential test: Spark canonical_url vs an independent pure-
    Python canonicalizer over 200 seeded random URLs covering every rule
    combination — one Spark job for the whole batch."""
    import random
    import re

    from openapc_olap_spark.operators import urlnorm

    def py_canonical(u):
        u = re.sub(r"^[Hh][Tt][Tt][Pp][Ss]?://", "", u)
        u = re.sub(r"#.*$", "", u)
        base, _, query = u.partition("?")
        host, slash, path = base.partition("/")
        host = host.lower()
        host = re.sub(r"^www\.", "", host)
        host = re.sub(r":(80|443)$", "", host)
        path = (slash + path).rstrip("/")
        kept = sorted(p for p in query.split("&")
                      if p and not re.match(
                          r"^(utm_[a-z]+|gclid|fbclid|msclkid|ref_src)=",
                          p))
        qs = "?" + "&".join(kept) if kept else ""
        return host + path + qs

    rng = random.Random(99)
    urls = []
    for _ in range(200):
        scheme = rng.choice(["http://", "https://", "HTTPS://", "HtTp://", ""])
        www = rng.choice(["www.", ""])
        host = rng.choice(["Example.COM", "a.b.example.org", "x.io"])
        port = rng.choice(["", ":80", ":443", ":8080"])
        path = rng.choice(["", "/", "/P/q", "/P/q/", "/one//two/"])
        params = rng.sample(["a=1", "b=2", "utm_source=x", "gclid=9",
                             "z=3", "ref=h"], k=rng.randint(0, 4))
        rng.shuffle(params)
        query = "?" + "&".join(params) if params else ""
        frag = rng.choice(["", "#f", "#a/b?c=1"])
        urls.append(scheme + www + host + port + path + query + frag)
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               ["i", "url"])
    got = {r["i"]: r["c"] for r in
           df.select("i", urlnorm.canonical_url("url").alias("c")).collect()}
    for i, u in enumerate(urls):
        assert got[i] == py_canonical(u), (u, got[i], py_canonical(u))
    # idempotence: canonical(canonical(u)) == canonical(u)
    df2 = spark.createDataFrame([(v,) for v in set(got.values())], ["url"])
    twice = {r["url"]: r["c"] for r in
             df2.select("url",
                        urlnorm.canonical_url("url").alias("c")).collect()}
    assert all(twice[v] == v for v in twice)


def test_bpe_batched_equals_sequential_collision_heavy(spark):
    """Adversarial exactness check: tiny {a,b} alphabet corpora maximize
    concat collisions ((a,b) vs (ab,*) vs (*,ab) chains), the case the
    vocabulary collision scan exists for. Three seeded corpora, full
    merge runs, merge list + digest must be identical."""
    import random

    from openapc_olap_spark.operators import bpe

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        words = ["".join(rng.choice("ab") for _ in range(rng.randint(1, 8)))
                 for _ in range(60)]
        docs = spark.createDataFrame(
            [(i, " ".join(rng.choices(words, k=12))) for i in range(30)],
            ["doc_id", "text"])
        seq_m, seq_v = bpe.bpe_train(docs, 12, merge_batch=1)
        dig = seq_v.agg(bpe.segment_digest()).first()[0]
        bat_m, bat_v = bpe.bpe_train(docs, 12, merge_batch=8)
        assert bat_m == seq_m, f"seed {seed}"
        assert bat_v.agg(bpe.segment_digest()).first()[0] == dig


def test_bpe_greedy_mode_valid_and_fewer_rounds(spark):
    """selection='greedy' (the production mode): every learned merge had
    a positive count at selection, encoding with the greedy vocab works,
    and the round count drops to ~merges/batch where exact mode must
    stay sequential (flat counts)."""
    from openapc_olap_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "low lower lowest low low newer newest"),
         (2, "wider new newer low")], ["doc_id", "text"])
    orig = bpe.pair_counts
    calls = {"greedy": 0, "exact": 0}

    def make(tag):
        def counted(*a, **k):
            calls[tag] += 1
            return orig(*a, **k)
        return counted

    try:
        bpe.pair_counts = make("greedy")
        gm, gv = bpe.bpe_train(docs, 8, merge_batch=8, selection="greedy")
        bpe.pair_counts = make("exact")
        em, ev = bpe.bpe_train(docs, 8, merge_batch=8)
    finally:
        bpe.pair_counts = orig
    assert len(gm) == len(em) == 8
    assert all(c > 0 for _, _, c in gm)
    assert calls["greedy"] < calls["exact"]
    # same merge SET is not guaranteed, but the greedy vocab must encode
    enc = bpe.bpe_encode(docs, gv)
    assert enc.count() == 2
    with pytest.raises(ValueError):
        bpe.bpe_train(docs, 2, selection="nope")


def test_line_dedup_differential_random(spark):
    """Differential test: remove_boilerplate_lines vs a pure-Python
    reference over a seeded random corpus (one Spark job)."""
    import random
    from collections import Counter

    from openapc_olap_spark.operators import linededup

    rng = random.Random(11)
    lines_pool = [f"l{i}" for i in range(12)]
    docs = [(i, "\n".join(rng.choices(lines_pool, k=rng.randint(1, 9))))
            for i in range(40)]
    max_docs = 6
    freq = Counter()
    for _, text in docs:
        freq.update(set(l for l in text.split("\n") if l))
    hot = {l for l, c in freq.items() if c > max_docs}
    want = {}
    for i, text in docs:
        parts = text.split("\n")
        kept = [l for l in parts if l not in hot]
        want[i] = ("\n".join(kept), sum(1 for l in parts if l in hot))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: (r["text"], r["n_removed"]) for r in
           linededup.remove_boilerplate_lines(df, max_docs=max_docs)
           .collect()}
    assert got == want


def test_r06_operators_empty_input(spark):
    """Empty corpora flow through every round-6 operator without
    crashing: empty outputs (or an explicit ValueError for the
    two-scalar percentile probe), never an inference/NoneType error."""
    from openapc_olap_spark.operators import (dedup, linededup, rolling,
                                              sharding, stats, urlnorm)

    docs = spark.createDataFrame([], "doc_id long, text string, n_chars long")
    ev = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, value double")
    assert urlnorm.url_duplicates(
        docs.withColumnRenamed("text", "url")).count() == 0
    assert linededup.remove_boilerplate_lines(
        docs.select("doc_id", "text"), 1).count() == 0
    assert stats.char_entropy(docs).count() == 0
    with pytest.raises(ValueError, match="no non-null"):
        stats.percentile_bounds(docs, "n_chars")
    assert stats.filter_by_percentile(docs, "n_chars").count() == 0
    assert rolling.rolling_features(ev, k=3).count() == 0
    assert sharding.assign_shards(docs, target=10).count() == 0
    assert dedup.canonical_documents(docs, "n_chars").count() == 0


def test_incremental_dedup_commit_two_crawls(spark, tmp_path):
    """VERDICT r09 #5: crawl-over-crawl dedup against the transactional
    fingerprint store — crawl 2 must be filtered by crawl 1's committed
    fingerprints, each crawl advances exactly one store version, and a
    re-run of the same crawl yields zero new rows (convergence)."""
    from openapc_olap_spark.sources import txn

    hist = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text")], ["doc_id", "text"])
    seen = (hist.select(dedup.fingerprint("text").alias("fp"))
            .distinct().withColumn("seq", F.lit(0).cast("long")))
    store = txn.TxnTable.create(
        spark, str(tmp_path / "fps"), txn.add_bucket(seen, ["fp"], 4),
        "bucket", meta={"n_buckets": 4})
    crawl1 = spark.createDataFrame(
        [(10, "ALPHA  text"),            # dup of history (normalized)
         (11, "gamma text")], ["doc_id", "text"])
    kept1 = dedup.incremental_dedup_commit(crawl1, store, crawl_seq=1)
    assert {r["doc_id"] for r in kept1.collect()} == {11}
    assert store.version() == 1
    crawl2 = spark.createDataFrame(
        [(20, "gamma TEXT"),             # dup of crawl 1
         (21, "delta text")], ["doc_id", "text"])
    kept2 = dedup.incremental_dedup_commit(crawl2, store, crawl_seq=2,
                                           bloom_bits=1 << 12)
    assert {r["doc_id"] for r in kept2.collect()} == {21}
    assert store.version() == 2
    # convergence: re-running crawl 2 admits nothing and still commits
    kept2b = dedup.incremental_dedup_commit(crawl2, store, crawl_seq=3)
    assert kept2b.count() == 0
    # store without bucket meta fails fast
    bare = txn.TxnTable.create(
        spark, str(tmp_path / "bare"), txn.add_bucket(seen, ["fp"], 4),
        "bucket")
    with pytest.raises(ValueError, match="n_buckets"):
        dedup.incremental_dedup_commit(crawl1, bare, crawl_seq=1)


def test_functions_facade_exports_work(spark):
    """VERDICT r09 #8: openapc_olap_spark.functions is the documented
    one-import surface (README quick-start) — every __all__ export
    resolves and the facade drives a real projection."""
    from openapc_olap_spark import functions as OF

    for name in OF.__all__:
        assert callable(getattr(OF, name)), name
    df = spark.createDataFrame(
        [(1, "The quick brown fox.", [3.0, 4.0])],
        ["doc_id", "text", "v"])
    row = df.select(
        OF.token_count("text").alias("n"),
        OF.fingerprint("text").alias("fp"),
        OF.strip_ror_prefix(F.lit("https://ror.org/abc")).alias("ror"),
        OF.norm("v").alias("nrm")).first()
    assert row["n"] == 4 and row["ror"] == "abc"
    assert len(row["fp"]) == 32 and abs(row["nrm"] - 5.0) < 1e-12


def test_incremental_near_dup_commit_two_crawls(spark, tmp_path):
    """Crawl-over-crawl NEAR-dup dedup against the transactional LSH
    band index + shingle store: near-rewrites of stored docs are
    dropped (not just byte-dups), in-batch near-dup groups resolve to
    the min id, each crawl advances both stores once, and replaying a
    crawl admits nothing (idempotence)."""
    from openapc_olap_spark.sources import txn

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight")
    edit = base.replace("tonight", "at dawn")      # near-dup of base
    other = ("completely different content about spark catalyst "
             "optimizer rules and adaptive query execution plans "
             "with shuffle partition coalescing at runtime")
    hist = spark.createDataFrame([(1, base)], ["doc_id", "text"])
    hsets = (hist.select(F.col("doc_id").alias("id"),
                         dedup.shingles("text", 3).alias("sh")))
    hband = (dedup._band_rows(hsets, 32, 16, 42)
             .select("band", "bhash", F.col("id").alias("doc_id"))
             .withColumn("seq", F.lit(0).cast("long")))
    band_store = txn.TxnTable.create(
        spark, str(tmp_path / "band"),
        txn.add_bucket(hband, ["band", "bhash", "doc_id"], 4),
        "bucket", meta={"n_buckets": 4})
    hsh = (hsets.select(F.col("id").alias("doc_id"), "sh")
           .withColumn("seq", F.lit(0).cast("long")))
    sh_store = txn.TxnTable.create(
        spark, str(tmp_path / "sh"),
        txn.add_bucket(hsh, ["doc_id"], 4),
        "bucket", meta={"n_buckets": 4})

    third = ("yet another unrelated document discussing parquet "
             "row group statistics bloom filters and dictionary "
             "encoding tradeoffs for very wide tables in practice")
    crawl = spark.createDataFrame(
        [(10, edit),                      # near-dup of stored doc 1
         (11, other), (12, other + " !"),  # in-batch near-dup pair
         (13, third)], ["doc_id", "text"])
    kept = dedup.incremental_near_dup_commit(
        crawl, band_store, sh_store, crawl_seq=1, threshold=0.5)
    assert {r["doc_id"] for r in kept.collect()} == {11, 13}
    assert band_store.version() == 1 and sh_store.version() == 1
    # replay: everything now near-dups the stores
    kept2 = dedup.incremental_near_dup_commit(
        crawl, band_store, sh_store, crawl_seq=2, threshold=0.5)
    assert kept2.count() == 0
    assert sh_store.version() == 2
    # store without bucket meta fails fast
    bare = txn.TxnTable.create(
        spark, str(tmp_path / "bare"),
        txn.add_bucket(hsh, ["doc_id"], 4), "bucket")
    with pytest.raises(ValueError, match="n_buckets"):
        dedup.incremental_near_dup_commit(crawl, bare, sh_store, 1)


def test_incremental_near_dup_commit_concurrent_content(spark, tmp_path):
    """Round 14: the two store commits run from concurrent driver
    threads (independent stores, guide §2.6). Pin that the landed
    CONTENT of each store is exactly what a serial application would
    land: the survivors' shingle sets, and the survivors' band rows
    re-derived independently from those sets."""
    from openapc_olap_spark.sources import txn

    docs = [(i, f"doc number {i} with shared filler words plus "
                f"unique token u{i} v{i} w{i} x{i} y{i} z{i}")
            for i in range(1, 9)]
    hist = spark.createDataFrame(docs[:2], ["doc_id", "text"])
    hsets = (hist.select(F.col("doc_id").alias("id"),
                         dedup.shingles("text", 3).alias("sh")))
    hband = (dedup._band_rows(hsets, 32, 16, 42)
             .select("band", "bhash", F.col("id").alias("doc_id"))
             .withColumn("seq", F.lit(0).cast("long")))
    band_store = txn.TxnTable.create(
        spark, str(tmp_path / "band"),
        txn.add_bucket(hband, ["band", "bhash", "doc_id"], 4),
        "bucket", meta={"n_buckets": 4})
    hsh = (hsets.select(F.col("id").alias("doc_id"), "sh")
           .withColumn("seq", F.lit(0).cast("long")))
    sh_store = txn.TxnTable.create(
        spark, str(tmp_path / "sh"),
        txn.add_bucket(hsh, ["doc_id"], 4),
        "bucket", meta={"n_buckets": 4})
    crawl = spark.createDataFrame(docs[2:], ["doc_id", "text"])
    kept = dedup.incremental_near_dup_commit(
        crawl, band_store, sh_store, crawl_seq=1, threshold=0.9)
    assert band_store.version() == 1 and sh_store.version() == 1
    kept_ids = {r["doc_id"] for r in kept.collect()}
    # serial expectation, re-derived outside the operator
    ksets = (kept.select(F.col("doc_id").alias("id"),
                         dedup.shingles("text", 3).alias("sh")))
    want_band = {(r["band"], r["bhash"], r["id"]) for r in
                 dedup._band_rows(ksets, 32, 16, 42).collect()}
    want_band |= {(r["band"], r["bhash"], r["doc_id"])
                  for r in hband.collect()}
    got_band = {(r["band"], r["bhash"], r["doc_id"])
                for r in band_store.read().collect()}
    assert got_band == want_band
    got_sh = {r["doc_id"]: tuple(sorted(r["sh"]))
              for r in sh_store.read().collect()}
    assert set(got_sh) == kept_ids | {1, 2}
    want_sh = {r["id"]: tuple(sorted(r["sh"]))
               for r in ksets.collect()}
    for i, sh in want_sh.items():
        assert got_sh[i] == sh


def test_kn_bigram_logprob_backoff_and_discount(spark):
    """Interpolated Kneser-Ney: training-corpus bigrams score above the
    continuation floor, fully-OOV documents hit exactly the add-1
    continuation floor ln(k / (T + k(V+1))), and a seen-context/unseen-
    bigram pair lands strictly between."""
    import math

    from openapc_olap_spark.operators import lm

    train = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog sat on the cat")],
        "doc_id long, text string")
    bg = lm.bigram_counts(train)
    ug = lm.unigram_counts(train)
    score = spark.createDataFrame(
        [(10, "the cat sat"),        # all seen
         (11, "zz qq zz"),           # fully OOV
         (12, "the mat")],           # seen context, unseen bigram
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           lm.doc_mean_kn_logprob(score, bg, ug).collect()}
    t_types, vocab = bg.count(), ug.count()        # 7 bigrams, 6 words
    floor = math.log(1.0 / (t_types + (vocab + 1)))
    assert abs(got[11]["mean_logprob"] - floor) < 1e-12
    assert got[10]["mean_logprob"] > got[12]["mean_logprob"] > floor
    assert got[10]["n_bigrams"] == 2 and got[12]["n_bigrams"] == 1


def test_kn_continuation_beats_raw_frequency(spark):
    """The KN signature: a token frequent only in ONE context gets a
    lower continuation probability than a token following many distinct
    contexts — add-k cannot express this."""
    from openapc_olap_spark.operators import lm

    # 'x' follows only 'san' (4 times); 'y' follows 4 distinct contexts
    train = spark.createDataFrame(
        [(1, "san x san x san x san x a y b y c y d y")],
        "doc_id long, text string")
    bg = lm.bigram_counts(train)
    ug = lm.unigram_counts(train)
    score = spark.createDataFrame(
        [(10, "q x"), (11, "q y")],   # unseen context 'q' -> pure Pcont
        "doc_id long, text string")
    got = {r["doc_id"]: r["mean_logprob"] for r in
           lm.doc_mean_kn_logprob(score, bg, ug).collect()}
    assert got[11] > got[10]
