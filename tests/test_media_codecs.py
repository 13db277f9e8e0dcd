"""Real-decoder coverage: byte-exact codec round-trips (pure numpy, no
Spark) and the Spark-side decode/perceptual-dedup operators over
payloads synthesized from the documents table."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spinebasedrecordlinkage_jl_spark.functions.codecs import (
    ahash64,
    decode_pnm,
    decode_wav_pcm16,
    dhash64,
    encode_pnm,
    encode_wav_pcm16,
    hamming64,
    to_gray,
)
from spinebasedrecordlinkage_jl_spark.operators.media import (
    PPM_TYPE,
    WAV_TYPE,
    decode_media,
    hamming_band_pairs,
    image_dhash_pairs,
    synthesize_media_payloads,
)

# ---------------------------------------------------------------------------
# codecs (no Spark)
# ---------------------------------------------------------------------------


def test_wav_round_trip_mono_and_stereo():
    rng = np.random.RandomState(7)
    mono = rng.randint(-32768, 32767, size=500, dtype=np.int16)
    rate, back = decode_wav_pcm16(encode_wav_pcm16(mono, 8000))
    assert rate == 8000 and back.shape == (500, 1)
    np.testing.assert_array_equal(back[:, 0], mono)

    stereo = rng.randint(-32768, 32767, size=(300, 2), dtype=np.int16)
    rate, back = decode_wav_pcm16(encode_wav_pcm16(stereo, 44100))
    assert rate == 44100 and back.shape == (300, 2)
    np.testing.assert_array_equal(back, stereo)


def test_wav_decoder_walks_unknown_chunks():
    import struct

    samples = np.arange(-100, 100, dtype=np.int16)
    buf = encode_wav_pcm16(samples, 16000)
    # splice a LIST chunk between fmt and data (odd size -> pad byte)
    fmt_end = buf.index(b"data")
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = buf[:fmt_end] + junk + buf[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    rate, back = decode_wav_pcm16(spliced)
    assert rate == 16000
    np.testing.assert_array_equal(back[:, 0], samples)


def test_wav_rejects_non_pcm():
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"plain text payload")


def test_pnm_round_trip_gray_and_rgb():
    rng = np.random.RandomState(3)
    gray = rng.randint(0, 256, size=(17, 23), dtype=np.uint8)
    np.testing.assert_array_equal(decode_pnm(encode_pnm(gray)), gray)
    rgb = rng.randint(0, 256, size=(9, 14, 3), dtype=np.uint8)
    np.testing.assert_array_equal(decode_pnm(encode_pnm(rgb)), rgb)


def test_pnm_header_comments_and_whitespace():
    px = np.arange(6, dtype=np.uint8).reshape(2, 3)
    raw = b"P5 # a comment\n# another\n 3\t2 \n255\n" + px.tobytes()
    np.testing.assert_array_equal(decode_pnm(raw), px)


def test_perceptual_hashes_stability_and_separation():
    rng = np.random.RandomState(11)
    blocks = rng.randint(0, 256, size=(8, 8, 3), dtype=np.int64)
    img = np.repeat(np.repeat(blocks, 4, axis=0), 4, axis=1)
    base = np.clip(img, 0, 255).astype(np.uint8)

    # identical image -> identical hash
    assert ahash64(base) == ahash64(base.copy())
    assert dhash64(base) == dhash64(base.copy())

    # small per-pixel noise -> small Hamming distance
    noisy = np.clip(img + rng.randint(-2, 3, size=img.shape), 0, 255).astype(np.uint8)
    assert hamming64(dhash64(base), dhash64(noisy)) <= 6
    assert hamming64(ahash64(base), ahash64(noisy)) <= 6

    # an unrelated image -> large distance
    other_blocks = rng.randint(0, 256, size=(8, 8, 3), dtype=np.int64)
    other = np.repeat(np.repeat(other_blocks, 4, axis=0), 4, axis=1).astype(np.uint8)
    assert hamming64(dhash64(base), dhash64(other)) > 12

    # dHash ignores global brightness shifts (gradients preserved)
    brighter = np.clip(img + 30, 0, 255).astype(np.uint8)
    assert hamming64(dhash64(base), dhash64(brighter)) <= 6


def test_to_gray_and_nonuniform_blocks():
    rgb = np.zeros((5, 7, 3), dtype=np.uint8)
    rgb[..., 1] = 255  # pure green
    assert int(to_gray(rgb)[0, 0]) == 149  # 587*255//1000
    # non-divisible shapes still hash without error
    odd = np.random.RandomState(0).randint(0, 256, size=(13, 29), dtype=np.uint8)
    assert isinstance(dhash64(odd), int)
    tiny = np.array([[0, 255]], dtype=np.uint8)  # smaller than the 8x8 grid
    assert isinstance(ahash64(tiny), int)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra import numpy as hnp

    @given(
        samples=hnp.arrays(
            np.int16, st.tuples(st.integers(1, 200), st.integers(1, 3))
        ),
        rate=st.sampled_from([8000, 16000, 44100]),
    )
    @settings(max_examples=40, deadline=None)
    def test_wav_round_trip_property(samples, rate):
        r, back = decode_wav_pcm16(encode_wav_pcm16(samples, rate))
        assert r == rate
        np.testing.assert_array_equal(back, samples)

    @given(
        px=hnp.arrays(np.uint8, st.tuples(st.integers(1, 40), st.integers(1, 40)))
    )
    @settings(max_examples=40, deadline=None)
    def test_pnm_round_trip_property(px):
        np.testing.assert_array_equal(decode_pnm(encode_pnm(px)), px)
except ImportError:  # pragma: no cover - hypothesis is baked in the sandbox
    pass


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def test_media_synthesis_and_decode(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    payloads = synthesize_media_payloads(docs, kind="both").cache()
    media = decode_media(payloads)

    imgs = media.filter(F.col("kind") == "image")
    auds = media.filter(F.col("kind") == "audio")
    n_docs = docs.count()
    assert imgs.count() == n_docs and auds.count() == n_docs

    img = imgs.first()
    assert (img["width"], img["height"]) == (32, 32)
    assert img["dhash"] is not None and img["sample_rate"] is None

    aud = auds.first()
    assert aud["sample_rate"] == 8000 and aud["n_channels"] == 1
    assert aud["duration_sec"] == pytest.approx(1024 / 8000)
    # sine RMS ~ amplitude/sqrt(2); amplitude in [8192, 24576)
    assert 8192 / np.sqrt(2) * 0.9 <= aud["rms"] <= 24576 / np.sqrt(2) * 1.1
    assert aud["peak"] <= 24576

    # unknown content types fall through as opaque, not an exception
    opaque = decode_media(
        payloads.withColumn("content_type", F.lit("video/mp4"))
    )
    assert opaque.filter(F.col("kind") != "opaque").count() == 0
    assert opaque.filter(F.col("n_bytes") > 0).count() == 2 * n_docs


def test_image_dhash_pairs_find_text_neardups(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    # plant near-dups: 10 docs re-appear under new ids with text changed
    # only in case (same normalized text -> perceptually-near image with
    # per-doc noise on top)
    shift = docs.agg(F.max("doc_id")).first()[0] + 1
    dups = docs.orderBy("doc_id").limit(10).select(
        (F.col("doc_id") + shift).alias("doc_id"),
        F.upper(F.col("text")).alias("text"),
    )
    corpus = docs.select("doc_id", "text").unionByName(dups)

    media = decode_media(synthesize_media_payloads(corpus, kind="image"))
    pairs = image_dhash_pairs(media, max_hamming=8).collect()

    planted = {(int(r["doc_id"]) - shift, int(r["doc_id"])) for r in dups.collect()}
    found = {(min(r["doc_id_1"], r["doc_id_2"]), max(r["doc_id_1"], r["doc_id_2"])) for r in pairs}
    # full recall on planted near-dups; precision against accidental
    # collisions between unrelated 64-bit fingerprints
    assert planted <= found
    assert len(found - planted) <= 1


def test_hamming_band_pairs_purges_hot_buckets(spark):
    # 50 identical fingerprints = one hot bucket in every band
    df = spark.range(50).select(F.col("id").alias("doc_id"), F.lit(12345).alias("h"))
    pairs, purged = hamming_band_pairs(
        df, "h", max_band_population=10, return_purged=True
    )
    assert pairs.count() == 0
    audit = purged.collect()
    assert audit and all(r["band_population"] == 50 for r in audit)


# ---------------------------------------------------------------------------
# resize_area / image_resize
# ---------------------------------------------------------------------------


def test_resize_area_constant_and_gradient():
    from spinebasedrecordlinkage_jl_spark.functions.codecs import resize_area

    flat = np.full((16, 12), 200, dtype=np.uint8)
    out = resize_area(flat, 4, 3)
    assert out.shape == (4, 3) and out.dtype == np.uint8
    assert (out == 200).all()

    # 2x2 block means of a known gradient, rounded half-up
    g = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_area(g, 2, 2)
    assert out.tolist() == [[3, 5], [11, 13]]  # e.g. mean(0,1,4,5)=2.5 -> 3

    rgb = np.stack([flat, flat // 2, np.zeros_like(flat)], axis=2)
    out3 = resize_area(rgb, 4, 3)
    assert out3.shape == (4, 3, 3)
    assert (out3[..., 0] == 200).all() and (out3[..., 2] == 0).all()

    with pytest.raises(ValueError):
        resize_area(np.zeros((4, 4, 2), dtype=np.uint8), 2, 2)


def test_image_resize_operator(spark, sf_dir):
    from spinebasedrecordlinkage_jl_spark.functions.codecs import decode_pnm
    from spinebasedrecordlinkage_jl_spark.operators.multimodal import image_resize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(6)
    payloads = synthesize_media_payloads(docs, kind="both")
    # one corrupt image row must not fail the stage
    corrupt = spark.createDataFrame(
        [(9_999_999, "image/x-portable-pixmap", bytearray(b"P6 garbage"))],
        "doc_id long, content_type string, payload binary",
    )
    rows = image_resize(payloads.unionByName(corrupt), 8, 8).collect()
    assert len(rows) == 13  # 6 image + 6 audio + 1 corrupt
    resized = [r for r in rows if r["payload"] is not None]
    for r in resized:
        assert (r["height"], r["width"]) == (8, 8)
        assert decode_pnm(bytes(r["payload"])).shape == (8, 8, 3)
    assert len(resized) == 6               # every real image resized
    # corrupt image -> NULL (no stage failure); audio rows pass through NULL
    null_ids = {r["doc_id"] for r in rows if r["payload"] is None}
    assert 9_999_999 in null_ids and len(null_ids - {9_999_999}) == 6


def test_image_resize_zero_dim_payload_yields_null(spark):
    """ADVICE r5: a zero-dimension netpbm header decodes to shape (0, 0)
    and used to escape the ValueError guard as a ZeroDivisionError in the
    upscale path, killing the whole Arrow stage — it must degrade to a
    NULL row like any other corrupt blob."""
    from spinebasedrecordlinkage_jl_spark.operators.multimodal import image_resize

    bad = spark.createDataFrame(
        [(1, "image/x-portable-graymap", bytearray(b"P5\n0 0\n255\n"))],
        "doc_id long, content_type string, payload binary",
    )
    rows = image_resize(bad, 8, 8).collect()
    assert len(rows) == 1
    assert rows[0]["payload"] is None and rows[0]["height"] is None


def test_synthesize_and_decode_matches_two_stage(spark, sf_dir):
    """r6 fused synth->decode stage is row-for-row identical to the
    two-stage composition it replaces (same encode->decode round trip,
    only the intermediate Arrow payload transfer removed)."""
    from spinebasedrecordlinkage_jl_spark.operators.media import synthesize_and_decode

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(8)
    fused = synthesize_and_decode(docs, kind="both")
    two_stage = decode_media(synthesize_media_payloads(docs, kind="both"))
    assert fused.schema == two_stage.schema
    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, two_stage.collect()))
    assert a == b
