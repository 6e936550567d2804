"""Text-analysis function tests (lang-id accuracy, token counts, fingerprints)
and multimodal binary plumbing tests (stub decode via mapInPandas)."""

import hashlib
import math
import os

import pytest
from pyspark.sql import functions as F

from plenario_mapper_spark.functions import text as TX
from plenario_mapper_spark.operators import multimodal as MM

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_token_count_matches_python(spark):
    df = spark.createDataFrame(
        [("hello world  foo",), ("",), ("  a b ",), ("one",)], "text string"
    )
    got = [r[0] for r in df.select(TX.token_count(F.col("text"))).collect()]
    assert got == [3, 0, 2, 1]


def test_lang_id_real_text(spark):
    """Stopword-vote lang-id on genuine language samples. (The synthetic corpus
    can't test this: all five lang labels share one identical 31-token vocabulary,
    so its labels carry no text signal — verified empirically; max achievable
    accuracy there is the majority-class rate.)"""
    samples = [
        ("en", "the cat is in the house and it is warm for a winter day"),
        ("en", "it is the best of times and the worst of times for a reader"),
        ("es", "el perro esta en la casa y es un dia de invierno con los amigos"),
        ("es", "la vida es un viaje que hay que vivir con los que quieres"),
        ("fr", "le chien est dans la maison et les enfants du village sont une famille"),
        ("fr", "la vie est une aventure et les amis du quartier sont la pour nous"),
        ("de", "der hund ist in dem haus und die kinder sind mit den eltern zu hause"),
        ("de", "das leben ist eine reise und die freunde sind von anfang an mit dabei"),
    ]
    df = spark.createDataFrame(samples, "lang string, text string")
    rows = df.select("lang", TX.lang_id(F.col("text")).alias("pred")).collect()
    acc = sum(1 for r in rows if r["pred"] == r["lang"]) / len(rows)
    assert acc >= 0.85, f"lang-id accuracy {acc}: {rows}"


def test_lang_id_corpus_stable(docs):
    """On the (signal-free) synthetic corpus the classifier must still be total:
    every doc gets a prediction from the closed label set."""
    preds = {r["pred"] for r in docs.select(TX.lang_id(F.col("text")).alias("pred")).collect()}
    assert preds <= {"en", "es", "fr", "de", "und"}


def test_fingerprint_layout_insensitive(spark):
    df = spark.createDataFrame(
        [("Hello,   World!",), ("hello world",), ("different text",)], "text string"
    )
    fps = [r[0] for r in df.select(TX.fingerprint(F.col("text"))).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    got = [r[0] for r in df.select(TX.shingles(F.col("text"), 3)).collect()]
    assert sorted(got[0]) == ["a b c", "b c d"]
    assert got[1] == ["a b"]  # shorter than n -> single whole-text shingle


def test_quality_score_range(docs):
    rows = docs.select(TX.quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_multimodal_stub_features(spark):
    payloads = [b"\x00\x01\x02\x03" * 10, b"same byte " * 5, b""]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, payload binary"
    )
    wrapped = MM.attach_binary_meta(df, "doc_id", "payload")
    meta = {r["doc_id"]: r["meta"] for r in wrapped.collect()}
    assert meta[0]["n_bytes"] == 40
    assert meta[0]["sha256"] == hashlib.sha256(payloads[0]).hexdigest()

    feats = {r["doc_id"]: r for r in MM.extract_features(wrapped).collect()}
    assert feats[0]["n_bytes"] == 40
    assert feats[0]["mean_byte"] == pytest.approx(1.5)
    assert feats[0]["entropy"] == pytest.approx(2.0)  # 4 equiprobable bytes
    assert feats[2]["n_bytes"] == 0 and feats[2]["entropy"] == 0.0


def test_multimodal_resize_and_frame_sample(spark):
    import numpy as np

    from plenario_mapper_spark.functions import codecs

    # real resize: P5 gradient 16x8 -> 8x4; 2x downsample is exactly the
    # (a+b+c+d+2)//4 block average (codecs.bilinear_resize rounds half-up)
    px = (np.arange(128) % 256).astype(np.uint8).reshape(8, 16)
    payloads = [codecs.encode_pnm(px), b"xy"]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "doc_id long, payload binary"
    )
    resized = {r["doc_id"]: r for r in MM.resize_images(df, 8, 4).collect()}
    dec = codecs.decode(bytes(resized[0]["payload"]))
    assert (dec.width, dec.height) == (8, 4)
    blocks = px.reshape(4, 2, 8, 2).swapaxes(1, 2).reshape(4, 8, 4).sum(axis=2)
    assert (dec.data == ((blocks + 2) // 4).astype(np.uint8)).all()
    assert resized[0]["resize_version"] == "bilinear-v1"
    # non-image payloads stay total: NULL payload, version 'unsupported'
    assert resized[1]["payload"] is None
    assert resized[1]["resize_version"] == "unsupported"
    assert (resized[1]["width"], resized[1]["height"]) == (8, 4)

    frames = MM.sample_frames(df, n_frames=4, frame_ms=250).collect()
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[0]) == 4  # UDTF fan-out: 1 row in, n_frames out
    f0 = sorted(by_doc[0], key=lambda r: r["frame_idx"])
    assert [r["ts_ms"] for r in f0] == [0, 250, 500, 750]
    b0 = payloads[0]
    step = len(b0) // 4
    assert bytes(f0[1]["frame"]) == b0[step : 2 * step]  # slice 2 of 4


def test_codec_roundtrips():
    """Pure-numpy codecs: encode -> decode is identity on dims + content."""
    import numpy as np

    from plenario_mapper_spark.functions import codecs

    gray = (np.arange(6 * 4) % 256).astype(np.uint8).reshape(4, 6)
    d = codecs.decode_pnm(codecs.encode_pnm(gray))
    assert (d.width, d.height, d.channels) == (6, 4, 1)
    assert np.array_equal(d.data, gray)

    rgb = (np.arange(5 * 3 * 3) % 256).astype(np.uint8).reshape(3, 5, 3)
    d = codecs.decode_pnm(codecs.encode_pnm(rgb))
    assert (d.width, d.height, d.channels) == (5, 3, 3)
    assert np.array_equal(d.data, rgb)

    # width 5 -> 15-byte rows -> 1 pad byte per row exercises stride handling
    bgr = (np.arange(5 * 2 * 3) * 7 % 256).astype(np.uint8).reshape(2, 5, 3)
    d = codecs.decode_bmp(codecs.encode_bmp(bgr))
    assert (d.width, d.height, d.channels) == (5, 2, 3)
    assert np.array_equal(d.data, bgr)

    samples = ((np.arange(64) * 1201) % 65536 - 32768).astype(np.int16)
    d = codecs.decode_wav(codecs.encode_wav(samples, 8000))
    assert (d.sample_rate, d.channels) == (8000, 1)
    assert np.array_equal(d.data, samples)

    # PNM comment + multi-whitespace header tolerance
    hdr_variant = b"P5\n# a comment\n 6  4\n255\n" + gray.tobytes()
    d = codecs.decode_pnm(hdr_variant)
    assert (d.width, d.height) == (6, 4) and np.array_equal(d.data, gray)

    assert codecs.decode(b"\x89PNG not supported") is None
    # corrupt payloads behind a recognized magic must degrade, not raise:
    # the Spark operator is total over arbitrary blobs
    assert codecs.decode(b"P5\n# truncated header only") is None
    assert codecs.decode(b"BM" + b"\x00" * 20) is None
    assert codecs.decode(b"RIFF\x04\x00\x00\x00WAVE") is None


def test_decode_features_real(spark):
    """decode_features: real header parse + stats per modality, with the
    unknown-format fallback keeping the operator total."""
    import numpy as np

    from plenario_mapper_spark.functions import codecs

    gray = np.full((4, 4), 10, dtype=np.uint8)
    wav = codecs.encode_wav(np.array([100, -100, 300, -300], dtype=np.int16), 16000)
    payloads = [
        (0, codecs.encode_pnm(gray)),
        (1, codecs.encode_bmp(np.full((2, 3, 3), 7, dtype=np.uint8))),
        (2, wav),
        (3, b"opaque blob"),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    feats = {r["doc_id"]: r for r in MM.decode_features(df).collect()}
    assert (feats[0]["width"], feats[0]["height"], feats[0]["channels"]) == (4, 4, 1)
    assert feats[0]["val_mean"] == pytest.approx(10.0)
    assert feats[0]["val_std"] == pytest.approx(0.0)
    assert (feats[1]["modality"], feats[1]["n_units"]) == ("image", 18)
    assert feats[1]["val_mean"] == pytest.approx(7.0)
    assert (feats[2]["modality"], feats[2]["sample_rate"]) == ("audio", 16000)
    assert feats[2]["n_units"] == 4 and feats[2]["val_mean"] == pytest.approx(0.0)
    assert feats[3]["modality"] == "unknown" and feats[3]["n_units"] == 11


# ---------------------------------------------------------------------------
# Deterministic sampling
# ---------------------------------------------------------------------------


def test_deterministic_sample_stable_under_repartition(spark):
    from plenario_mapper_spark.operators import sampling as SP

    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = SP.deterministic_sample(df, "k", 0.3, salt="t")
    b = SP.deterministic_sample(df.repartition(13), "k", 0.3, salt="t")
    sa = {r["k"] for r in a.collect()}
    sb = {r["k"] for r in b.collect()}
    assert sa == sb
    # md5 is uniform: 30% +- a loose band
    assert 0.25 < len(sa) / 2000 < 0.35


def test_deterministic_sample_monotone_in_fraction(spark):
    from plenario_mapper_spark.operators import sampling as SP

    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    small = {r["k"] for r in SP.deterministic_sample(df, "k", 0.1).collect()}
    big = {r["k"] for r in SP.deterministic_sample(df, "k", 0.5).collect()}
    assert small <= big  # nested samples: same hash, higher gate


def test_stratified_sample_rates_and_default(spark):
    from pyspark.sql import functions as F

    from plenario_mapper_spark.operators import sampling as SP

    df = spark.range(0, 3000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("g")
    )
    out = SP.deterministic_stratified_sample(
        df, "k", "g", {"0": 0.0, "1": 1.0}, default_fraction=0.5
    )
    by_g = {r["g"]: r["n"] for r in out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert "0" not in by_g
    assert by_g["1"] == 1000
    assert 400 < by_g["2"] < 600


def test_sampling_threshold_properties():
    """Pure-Python properties of the hash-gate threshold: monotone in the
    fraction, exact at the endpoints, and always within the 32-bit domain."""
    import pytest

    from plenario_mapper_spark.operators.sampling import threshold_for

    assert threshold_for(0.0) == 0
    assert threshold_for(1.0) == 1 << 32
    prev = -1
    for i in range(0, 101):
        t = threshold_for(i / 100)
        assert 0 <= t <= 1 << 32
        assert t >= prev
        prev = t
    with pytest.raises(ValueError):
        threshold_for(1.5)
    with pytest.raises(ValueError):
        threshold_for(-0.1)


def test_redact_pii_order_and_counts(spark):
    """Email pass runs first (an address containing digit runs must become
    <EMAIL>, not be half-eaten by the phone/ip pass); placeholders are
    digit-free so later passes never rewrite earlier ones; counts reflect the
    original text."""
    from pyspark.sql import functions as F

    from plenario_mapper_spark.functions.text import pii_count, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail 312.555.0199@spam.com or x@y.io, call (312) 555-0142 at 10.0.0.1"),
            (2, "nothing sensitive here"),
        ],
        "id long, t string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            redact_pii(F.col("t")).alias("rt"),
            pii_count(F.col("t"), "email").alias("ne"),
            pii_count(F.col("t"), "phone").alias("np"),
            pii_count(F.col("t"), "ip").alias("ni"),
        ).collect()
    }
    assert out[1]["rt"] == "mail <EMAIL> or <EMAIL>, call <PHONE> at <IP>"
    # counts run on the ORIGINAL text, so the phone-shaped digit run inside
    # the first email address counts as a phone too (2, not 1) — redaction,
    # by contrast, consumed it as part of <EMAIL> (asserted above).
    assert (out[1]["ne"], out[1]["np"], out[1]["ni"]) == (2, 2, 1)
    assert out[2]["rt"] == "nothing sensitive here"
    assert (out[2]["ne"], out[2]["np"], out[2]["ni"]) == (0, 0, 0)


def test_pos_ngrams_udf_matches_expression(spark):
    """The Arrow positional-gram UDF must agree with the JVM expression on
    every doc, including duplicate grams and sub-n short docs."""
    from pyspark.sql import functions as F

    from plenario_mapper_spark.functions.pandas_sigs import make_pos_ngrams_udf
    from plenario_mapper_spark.functions.text import pos_ngrams

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").union(
        spark.createDataFrame([(99991, "a b a b a", "en", "s", 9),
                               (99992, "x y", "en", "s", 3)],
                              "doc_id long, text string, lang string, source string, n_chars long")
    )
    rows = d.select(
        pos_ngrams(F.col("text"), 3).alias("e"),
        make_pos_ngrams_udf(3)(F.col("text")).alias("u"),
    ).collect()
    assert rows and all(r["e"] == r["u"] for r in rows)


def test_resize_degenerate_image_degrades_not_dies(spark):
    """A structurally-valid PNM with zero-area geometry must come back as
    'unsupported', not kill the stage (regression: IndexError in
    bilinear_resize on the empty pixel array)."""
    from plenario_mapper_spark.operators import multimodal as MM

    df = spark.createDataFrame(
        [(0, b"P5\n0 0\n255\n"), (1, b"P5\n3 0\n255\n")],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in MM.resize_images(df, 8, 4).collect()}
    assert rows[0]["payload"] is None and rows[0]["resize_version"] == "unsupported"
    assert rows[1]["payload"] is None and rows[1]["resize_version"] == "unsupported"


def test_native_udtf_direct_and_lateral(spark):
    """The §2.G table-function surface via the first-class @udtf API: direct
    invocation and a SQL LATERAL join both fan one row out to typed rows;
    empty text yields zero rows (generator semantics, not a NULL row)."""
    from pyspark.sql.functions import lit

    from plenario_mapper_spark.functions.udtf_sigs import ChunkWords, register_udtfs

    direct = ChunkWords(lit("a b c d e"), lit(2)).collect()
    assert [(r["chunk"], r["idx"], r["n_tokens"]) for r in direct] == [
        ("a b", 0, 2), ("c d", 1, 2), ("e", 2, 1),
    ]

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "x y z"), (2, "")], "doc_id long, text string"
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT d.doc_id, c.chunk, c.idx FROM udtf_docs d, "
        "LATERAL chunk_words(d.text, 2) c ORDER BY d.doc_id, c.idx"
    ).collect()
    assert [(r["doc_id"], r["chunk"], r["idx"]) for r in rows] == [
        (1, "x y", 0), (1, "z", 1),
    ]  # doc 2 (empty text) contributes no rows


def test_mixture_weights_invariants(spark):
    """Mixture-weight contract: both fraction columns are distributions
    (sum to 1), resampling by the weights lands exactly on the target
    mixture, and the temperature flattening upweights small sources,
    downweights large ones (weight strictly decreasing in source size)."""
    from plenario_mapper_spark.plans import QUERIES

    rows = QUERIES["q_doc_mixture_weights"](spark, "/root/testdata/sf0.01").collect()
    assert abs(sum(r["actual_frac"] for r in rows) - 1.0) < 1e-9
    assert abs(sum(r["target_frac"] for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert abs(r["actual_frac"] * r["sample_weight"] - r["target_frac"]) < 1e-12
    by_size = sorted(rows, key=lambda r: r["n_tokens"])
    weights = [r["sample_weight"] for r in by_size]
    assert weights == sorted(weights, reverse=True)


def test_audio_spectrum_recovers_known_tone(spark):
    """Physics check: a pure sine synthesized at an exact FFT bin must come
    back as that bin's frequency, and the spectral centroid must sit within
    1% of the tone (int16 quantization is the only noise)."""
    import numpy as np
    import pandas as pd

    from plenario_mapper_spark.functions import codecs
    from plenario_mapper_spark.operators import multimodal as MM

    sr, n = 8000, 256
    rows = []
    tones = {}
    for doc_id in range(6):
        m = 2 + doc_id  # bin index -> f = m * sr/n
        f = m * sr / n
        tones[doc_id] = (m, f)
        t = np.arange(n) / sr
        s = np.round(0.5 * 32767 * np.sin(2 * np.pi * f * t)).astype(np.int16)
        rows.append((doc_id, bytearray(codecs.encode_wav(s, sr))))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in MM.audio_spectrum(df).collect()}
    for doc_id, (m, f) in tones.items():
        r = out[doc_id]
        assert r["dominant_bin"] == m
        assert r["dominant_freq_hz"] == f
        assert abs(r["spectral_centroid_hz"] - f) / f < 0.01
    # corrupt payload degrades to NULL features, keeps the row
    bad = spark.createDataFrame(
        pd.DataFrame([(99, bytearray(b"not a wav"))], columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    r = MM.audio_spectrum(bad).collect()[0]
    assert r["doc_id"] == 99 and r["dominant_bin"] is None


def test_phash_structure_sensitivity(spark):
    """Identical images hash identically; a lightly-noised copy stays within
    a small Hamming radius; structurally different images land far apart.
    The phash column composes with dedup.hamming64 (the SimHash machinery)."""
    import numpy as np
    import pandas as pd

    from plenario_mapper_spark.functions import codecs
    from plenario_mapper_spark.operators import dedup as DD
    from plenario_mapper_spark.operators import multimodal as MM
    from pyspark.sql import functions as F

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, (64, 64)).astype(np.uint8)
    # smooth it so structure dominates (pure noise has no low-freq signature)
    base = codecs.bilinear_resize(
        codecs.bilinear_resize(base, 8, 8), 64, 64
    )
    noisy = np.clip(
        base.astype(int) + rng.randint(-8, 9, base.shape), 0, 255
    ).astype(np.uint8)
    other = codecs.bilinear_resize(
        codecs.bilinear_resize(rng.randint(0, 256, (8, 8)).astype(np.uint8), 8, 8),
        64, 64,
    )
    rows = [
        (0, bytearray(codecs.encode_pnm(base))),
        (1, bytearray(codecs.encode_pnm(base))),
        (2, bytearray(codecs.encode_pnm(noisy))),
        (3, bytearray(codecs.encode_pnm(other))),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"]),
        "doc_id long, payload binary",
    )
    ph = MM.image_phash(df)
    h = {r["doc_id"]: r["phash"] for r in ph.collect()}
    assert h[0] == h[1]

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h[0], h[2]) <= 10          # noised copy stays close
    assert ham(h[0], h[3]) >= 16          # different structure lands far
    # composes with the Spark-side Hamming used by SimHash near-dup
    pairs = (
        ph.alias("a").join(ph.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("ia"), F.col("b.doc_id").alias("ib"),
            DD.hamming64(F.col("a.phash"), F.col("b.phash")).alias("d"),
        )
    )
    got = {(r["ia"], r["ib"]): r["d"] for r in pairs.collect()}
    assert got[(0, 1)] == 0
    assert got[(0, 2)] == ham(h[0], h[2])


def test_png_roundtrip_and_filters():
    """encode_png -> decode_png is identity for gray and RGB; the defilter
    path reconstructs Sub/Up/Average/Paeth scanlines (synthesized directly
    against the spec's filter functions, since our encoder emits filter 0)."""
    import struct
    import zlib

    import numpy as np

    from plenario_mapper_spark.functions import codecs

    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, (9, 7), dtype=np.uint8)
    assert (codecs.decode_png(codecs.encode_png(gray)).data == gray).all()
    rgb = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    d = codecs.decode_png(codecs.encode_png(rgb))
    assert d.mime == "image/png" and d.channels == 3 and (d.data == rgb).all()
    assert codecs.sniff(codecs.encode_png(gray)) == "png"

    # hand-filter an RGB image with every filter type, rebuild the IDAT, and
    # require exact reconstruction
    img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    h, w, ch = img.shape
    raw = bytearray()
    for r in range(h):
        f = r % 5
        line = img[r].reshape(-1).astype(np.int32)
        prev = img[r - 1].reshape(-1).astype(np.int32) if r else np.zeros(w * ch, np.int32)
        enc = np.zeros(w * ch, np.int32)
        for i in range(w * ch):
            left = line[i - ch] if i >= ch else 0
            up = prev[i]
            ul = prev[i - ch] if i >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
            enc[i] = (line[i] - pred) % 256
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        codecs._PNG_MAGIC
        + codecs._png_chunk(b"IHDR", ihdr)
        + codecs._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + codecs._png_chunk(b"IEND", b"")
    )
    got = codecs.decode_png(png)
    assert (got.data == img).all()


def test_png_corrupt_degrades_not_dies():
    from plenario_mapper_spark.functions import codecs

    good = codecs.encode_png(
        __import__("numpy").arange(16, dtype="uint8").reshape(4, 4)
    )
    assert codecs.decode(good[:20]) is None          # truncated
    assert codecs.decode(good[:8] + b"junk") is None  # magic only
    # interlaced flag set -> unsupported, total decode returns None
    bad = bytearray(good)
    bad[8 + 4 + 4 + 12] = 1  # IHDR interlace byte
    assert codecs.decode(bytes(bad)) is None


def test_png_resize_roundtrip(spark):
    """resize_images re-encodes PNG sources as PNG and the 2x downsample obeys
    the (a+b+c+d+2)//4 closed form, same as the PNM path."""
    import numpy as np

    from plenario_mapper_spark.functions import codecs
    from plenario_mapper_spark.operators import multimodal as MM

    px = ((7 * np.arange(128)) % 256).astype(np.uint8).reshape(8, 16)
    df = spark.createDataFrame(
        [(1, bytearray(codecs.encode_png(px)))], "doc_id long, payload binary"
    )
    out = MM.resize_images(df, 8, 4).collect()[0]
    assert out["resize_version"] == "bilinear-v1"
    dec = codecs.decode_png(bytes(out["payload"]))
    expect = (
        px.reshape(4, 2, 8, 2).transpose(0, 2, 1, 3).reshape(4, 8, 4).astype(int)
    )
    expect = (expect.sum(axis=2) + 2) // 4
    assert (dec.data == expect).all()


def test_jpeg_block_constant_exact():
    """Baseline JPEG round-trips 8x8-block-constant images EXACTLY when
    sample values are even: the only nonzero coefficient per block is the DC
    term 8*(v-128), divisible by the Annex-K luminance q00=16 at quality 50,
    and gray RGB pins both chroma planes to exactly 128. Distinct block
    values exercise DC differential prediction across blocks."""
    import numpy as np

    from plenario_mapper_spark.functions import codecs

    img = np.zeros((16, 16), dtype=np.uint8)
    for i, v in enumerate([20, 84, 150, 254]):
        by, bx = divmod(i, 2)
        img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = v
    d = codecs.decode_jpeg(codecs.encode_jpeg(img, quality=50))
    assert (d.width, d.height, d.channels, d.mime) == (16, 16, 1, "image/jpeg")
    assert np.array_equal(d.data, img)
    rgb = np.stack([img] * 3, axis=-1)
    d = codecs.decode_jpeg(codecs.encode_jpeg(rgb, quality=50))
    assert d.channels == 3 and np.array_equal(d.data, rgb)


def test_jpeg_subsampling_restart_and_odd_dims():
    """4:2:2 / 4:2:0 chroma subsampling and DRI/RSTn restart intervals decode
    exactly on block-constant gray-RGB content (chroma is constant 128, so
    box-downsample + replication-upsample are identity); non-multiple-of-8
    dimensions crop the padded MCU grid back correctly."""
    import numpy as np

    from plenario_mapper_spark.functions import codecs

    img = np.zeros((16, 16), dtype=np.uint8)
    for i, v in enumerate([20, 84, 150, 254]):
        by, bx = divmod(i, 2)
        img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = v
    rgb = np.stack([img] * 3, axis=-1)
    for ss in [(2, 1), (1, 2), (2, 2)]:
        d = codecs.decode_jpeg(codecs.encode_jpeg(rgb, quality=50, subsampling=ss))
        assert np.array_equal(d.data, rgb), f"subsampling {ss}"
    d = codecs.decode_jpeg(codecs.encode_jpeg(rgb, quality=50, restart_interval=1))
    assert np.array_equal(d.data, rgb)
    # odd dims: 19x13 gradient survives with bounded error (edge-replicated pad)
    y, x = np.mgrid[0:19, 0:13]
    grad = (y * 3 + x * 2 + 90).astype(np.uint8)  # smooth, no wrap edges
    d = codecs.decode_jpeg(codecs.encode_jpeg(grad, quality=95))
    assert (d.height, d.width) == (19, 13)
    assert np.abs(d.data.astype(int) - grad.astype(int)).max() <= 3


def test_jpeg_lossy_error_shrinks_with_quality():
    import numpy as np

    from plenario_mapper_spark.functions import codecs

    y, x = np.mgrid[0:24, 0:40]
    grad = ((y * 3 + x * 2) % 256).astype(np.uint8)
    errs = []
    for q in (30, 60, 95):
        d = codecs.decode_jpeg(codecs.encode_jpeg(grad, quality=q))
        errs.append(np.abs(d.data.astype(int) - grad.astype(int)).max())
    assert errs[0] >= errs[1] >= errs[2]
    assert errs[2] <= 1  # near-lossless at q95 on smooth content


def test_jpeg_corrupt_degrades_not_dies():
    import numpy as np

    from plenario_mapper_spark.functions import codecs

    good = codecs.encode_jpeg(np.full((8, 8), 100, dtype=np.uint8))
    assert codecs.sniff(good) == "jpeg"
    assert codecs.decode(good[:2]) is None            # SOI only
    assert codecs.decode(good[:40]) is None           # truncated mid-marker
    # progressive SOF2 -> unsupported, total decode returns None
    bad = bytearray(good)
    idx = bytes(good).find(b"\xff\xc0")
    bad[idx + 1] = 0xC2
    assert codecs.decode(bytes(bad)) is None


def test_jpeg_decode_features_and_resize(spark):
    """JPEG payloads flow through the Arrow-batched decode_features path with
    exact stats on block-constant content, and resize_images re-encodes
    JPEG sources as JPEG."""
    import numpy as np

    from plenario_mapper_spark.functions import codecs

    img = np.zeros((16, 16), dtype=np.uint8)
    for i, v in enumerate([20, 84, 150, 254]):
        by, bx = divmod(i, 2)
        img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = v
    rgb = np.stack([img] * 3, axis=-1)
    df = spark.createDataFrame(
        [(0, bytearray(codecs.encode_jpeg(rgb, quality=50))), (1, b"\xff\xd8junk")],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in MM.decode_features(df).collect()}
    assert rows[0]["mime"] == "image/jpeg"
    assert (rows[0]["width"], rows[0]["height"], rows[0]["channels"]) == (16, 16, 3)
    assert rows[0]["n_units"] == 16 * 16 * 3
    assert rows[0]["val_mean"] == (20 + 84 + 150 + 254) / 4
    assert rows[1]["modality"] == "unknown"  # corrupt degrades, stage survives
    out = MM.resize_images(df, 8, 8).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["resize_version"] == "bilinear-v1"
    dec = codecs.decode(bytes(by_id[0]["payload"]))
    assert dec.mime == "image/jpeg" and (dec.height, dec.width) == (8, 8)
    assert by_id[1]["resize_version"] == "unsupported"


def test_jpeg_property_roundtrip_and_total_decode():
    """Property sweep (no Spark): (a) random images of arbitrary small
    geometry round-trip through every subsampling mode with error bounded by
    the quantization step of the content's frequency band — worst-case bound
    here is loose (uniform noise at q95) but must hold for EVERY geometry
    including 1x1 and non-multiples of 8; (b) decode() is TOTAL over
    arbitrary prefixes/corruptions of valid JPEG bytes (returns Decoded or
    None, never raises)."""
    import numpy as np

    from plenario_mapper_spark.functions import codecs

    rng = np.random.default_rng(13)
    for trial in range(12):
        h = int(rng.integers(1, 25))
        w = int(rng.integers(1, 25))
        gray = trial % 2 == 0
        shape = (h, w) if gray else (h, w, 3)
        # low-frequency content: constant base + mild noise, so the q95
        # round-trip error bound (<=12) is meaningful, not vacuous
        img = (rng.integers(60, 200) + rng.integers(-8, 9, shape)).astype(np.uint8)
        ss = [(1, 1), (2, 1), (1, 2), (2, 2)][trial % 4]
        ri = int(rng.integers(0, 3))
        b = codecs.encode_jpeg(
            img, quality=95, subsampling=(1, 1) if gray else ss,
            restart_interval=ri,
        )
        d = codecs.decode_jpeg(b)
        assert (d.height, d.width) == (h, w)
        assert d.channels == (1 if gray else 3)
        err = np.abs(d.data.astype(int) - img.astype(int)).max()
        # 4:4:4/gray: bounded by luma quantization of the noise band; the
        # subsampled modes additionally pay chroma decimation (box-avg of
        # ±8-noise chroma, re-expanded through the ~1.8x YCbCr->RGB gains)
        bound = 12 if (gray or ss == (1, 1)) else 40
        assert err <= bound, f"trial {trial} shape {shape} ss {ss} err {err}"
        # corruption totality: truncations and byte flips never raise
        for cut in (3, 10, len(b) // 2, len(b) - 1):
            assert codecs.decode(b[:cut]) is None or hasattr(
                codecs.decode(b[:cut]), "data"
            )
        flipped = bytearray(b)
        pos = int(rng.integers(2, len(b)))
        flipped[pos] ^= 0xFF
        out = codecs.decode(bytes(flipped))
        assert out is None or hasattr(out, "data")


def test_jpeg_stuffed_pad_byte_before_restart_marker():
    """A pad byte that fills to 0xFF is byte-STUFFED by the encoder (FF 00);
    the decoder's restart alignment must skip that pair rather than misread
    the 0x00 as the marker (seed 9 is the first of ~30/400 random images
    whose entropy stream hits this; before the fix they all failed decode
    and degraded to byte stats)."""
    import numpy as np

    from plenario_mapper_spark.functions import codecs

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    b = codecs.encode_jpeg(img, quality=30, restart_interval=1)
    seg = b[b.find(b"\xff\xda"):]
    assert any(
        seg[i] == 0xFF and seg[i + 1] == 0x00 and seg[i + 2] == 0xFF
        and 0xD0 <= seg[i + 3] <= 0xD7
        for i in range(len(seg) - 3)
    ), "fixture no longer triggers the stuffed-pad-before-RST layout"
    d = codecs.decode_jpeg(b)
    assert d.data.shape == (16, 16)
