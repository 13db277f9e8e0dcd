"""Multimodal operators with REAL decoders (no external codec libs).

``operators/multimodal.py`` established the Spark plumbing for opaque
binary media columns but had to fake the decode step (the sandbox has
no PIL/ffmpeg). This module closes that gap for the container formats a
pure-numpy decoder can handle for real — WAV PCM16 audio and netpbm
(P5/P6) images — via ``functions/codecs.py``:

- ``synthesize_media_payloads``: deterministic WAV/PPM payloads derived
  from the documents table (test/bench corpus synthesis; payload bytes
  are a pure function of the normalized text, so text near-dups become
  media near-dups with seeded per-doc pixel noise on top).
- ``decode_media``: Arrow-batched ``mapInPandas`` decode dispatching on
  ``content_type`` — REAL parse for wav/pnm (sample rate, duration,
  RMS, peak, width/height, aHash/dHash perceptual fingerprints), the
  documented stub only for formats that need external codecs.
- ``hamming_band_pairs`` / ``image_dhash_pairs``: banded Hamming LSH
  self-join over any 64-bit fingerprint column (same hot-bucket purge
  contract as ``dedup.simhash_dedup``), giving perceptual image dedup.

At 100 TB the decode stage is the classic CPU-bound map: no shuffle,
one Arrow batch in / one typed frame out, linear in corpus size; the
pair stage is the banded join every other dedup operator here uses.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.codecs import (
    ahash64,
    decode_pnm,
    decode_wav_pcm16,
    dhash64,
    encode_pnm,
    encode_wav_pcm16,
)

WAV_TYPE = "audio/wav"
PPM_TYPE = "image/x-portable-pixmap"

PAYLOAD_SCHEMA = "doc_id long, content_type string, payload binary"

MEDIA_SCHEMA = (
    "doc_id long, kind string, n_bytes long, "
    "width int, height int, ahash long, dhash long, "
    "sample_rate int, n_samples int, n_channels int, "
    "duration_sec double, rms double, peak int"
)


def _seed_from_text(text: str) -> np.ndarray:
    """Deterministic per-document seed material: 8 uint32 words from a
    stable hash of the NORMALIZED text (lowercased, alnum-only) — docs
    that differ only in case/punctuation/whitespace synthesize the same
    base media, which is what makes perceptual dedup testable."""
    import hashlib

    norm = "".join(c for c in (text or "").lower() if c.isalnum())
    digest = hashlib.sha256(norm.encode("utf-8")).digest()
    return np.frombuffer(digest, dtype="<u4")


def _synth_image(text: str, doc_id: int, noise_amplitude: int) -> bytes:
    """32x32 RGB PPM: an 8x8 grid of uniform 4x4-px color blocks drawn
    from the text seed (block-aligned so dHash bits ride on large
    adjacent-block differences), plus seeded per-DOC pixel noise — two
    docs with equal normalized text get perceptually-near, not
    byte-equal, images."""
    words = _seed_from_text(text)
    rng = np.random.RandomState(words)
    blocks = rng.randint(0, 256, size=(8, 8, 3), dtype=np.int64)
    img = np.repeat(np.repeat(blocks, 4, axis=0), 4, axis=1)
    if noise_amplitude:
        nrng = np.random.RandomState(np.uint32(doc_id & 0xFFFFFFFF))
        img = img + nrng.randint(-noise_amplitude, noise_amplitude + 1, size=img.shape)
    return encode_pnm(np.clip(img, 0, 255).astype(np.uint8))


def _synth_wav(text: str, sample_rate: int = 8000, n_samples: int = 1024) -> bytes:
    """Mono sine whose frequency/amplitude derive from the text seed."""
    words = _seed_from_text(text)
    freq = 200.0 + float(words[0] % 1800)
    amp = 8192.0 + float(words[1] % 16384)
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    samples = (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)
    return encode_wav_pcm16(samples, sample_rate)


def synthesize_media_payloads(
    docs: DataFrame,
    kind: str = "image",
    text_col: str = "text",
    id_col: str = "doc_id",
    noise_amplitude: int = 2,
) -> DataFrame:
    """(doc_id, content_type, payload) with real WAV/PPM bytes derived
    deterministically from each document's text. ``kind``: "image",
    "audio", or "both" (two rows per doc)."""
    if kind not in ("image", "audio", "both"):
        raise ValueError(f"kind must be image|audio|both, got {kind!r}")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "content_type": [], "payload": []}
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if kind in ("image", "both"):
                    out["doc_id"].append(int(doc_id))
                    out["content_type"].append(PPM_TYPE)
                    out["payload"].append(_synth_image(text, int(doc_id), noise_amplitude))
                if kind in ("audio", "both"):
                    out["doc_id"].append(int(doc_id))
                    out["content_type"].append(WAV_TYPE)
                    out["payload"].append(_synth_wav(text))
            yield pd.DataFrame(out)

    from ..session import widen_if_narrow

    # synthesis is pure per-row compute: spread a narrow scan across the
    # cluster before it, or the whole corpus renders through one task
    return widen_if_narrow(docs.select(id_col, text_col)).mapInPandas(
        _gen, schema=PAYLOAD_SCHEMA
    )


def _decode_row(doc_id: int, ctype: str, b: bytes) -> dict:
    """One payload -> one MEDIA_SCHEMA row (shared by decode_media and
    the fused synthesize_and_decode path)."""
    row = {
        "doc_id": doc_id,
        "kind": "opaque",
        "n_bytes": len(b),
        "width": None, "height": None, "ahash": None, "dhash": None,
        "sample_rate": None, "n_samples": None, "n_channels": None,
        "duration_sec": None, "rms": None, "peak": None,
    }
    if ctype == PPM_TYPE or ctype == "image/x-portable-graymap":
        px = decode_pnm(b)
        row.update(
            kind="image",
            width=int(px.shape[1]), height=int(px.shape[0]),
            ahash=ahash64(px), dhash=dhash64(px),
        )
    elif ctype == WAV_TYPE:
        rate, samples = decode_wav_pcm16(b)
        x = samples.astype(np.float64)
        row.update(
            kind="audio",
            sample_rate=int(rate),
            n_samples=int(samples.shape[0]),
            n_channels=int(samples.shape[1]),
            duration_sec=samples.shape[0] / rate,
            rms=float(np.sqrt(np.mean(x * x))),
            peak=int(np.abs(samples).max()) if samples.size else 0,
        )
    return row


def decode_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL decode for wav/pnm payloads (typed stats + perceptual
    hashes); rows with other content types come back kind='opaque' with
    only n_bytes set (route those to an external-codec decoder in
    production). One Arrow batch per call, no per-row Python outside
    the codec itself, no state across batches — the same contract
    ``multimodal.decode_features`` documents for its stub."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _decode_row(int(doc_id), ctype, bytes(payload))
                for doc_id, ctype, payload in zip(
                    pdf[id_col], pdf["content_type"], pdf["payload"]
                )
            ]
            yield pd.DataFrame(rows)

    from ..session import widen_if_narrow

    # the codec is the expensive leg — parallelize a narrow payload
    # frame before it (no-op at scale, where the scan has many splits)
    return widen_if_narrow(df.select(id_col, "content_type", "payload")).mapInPandas(
        _decode, schema=MEDIA_SCHEMA
    )


def synthesize_and_decode(
    docs: DataFrame,
    kind: str = "image",
    text_col: str = "text",
    id_col: str = "doc_id",
    noise_amplitude: int = 2,
) -> DataFrame:
    """Fused ``synthesize_media_payloads`` -> ``decode_media`` for the
    synthetic-corpus paths: one Arrow stage instead of two, so the
    payload bytes never cross the JVM<->Python boundary between
    synthesis and decode (guide §4 — the payload is the widest column
    by far). Row-for-row identical to the two-stage composition: the
    same encode -> decode round trip runs per payload, only the
    intermediate Arrow transfer is gone."""
    if kind not in ("image", "audio", "both"):
        raise ValueError(f"kind must be image|audio|both, got {kind!r}")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if kind in ("image", "both"):
                    b = _synth_image(text, int(doc_id), noise_amplitude)
                    rows.append(_decode_row(int(doc_id), PPM_TYPE, b))
                if kind in ("audio", "both"):
                    b = _synth_wav(text)
                    rows.append(_decode_row(int(doc_id), WAV_TYPE, b))
            yield pd.DataFrame(rows)

    from ..session import widen_if_narrow

    return widen_if_narrow(docs.select(id_col, text_col)).mapInPandas(
        _gen, schema=MEDIA_SCHEMA
    )


def hamming_band_pairs(
    df: DataFrame,
    hash_col: str,
    id_col: str = "doc_id",
    bits: int = 64,
    band_bits: int = 16,
    max_hamming: int | None = None,
    max_band_population: int | None = 100_000,
    return_purged: bool = False,
):
    """Banded Hamming LSH self-join over a precomputed integer
    fingerprint column: pairs matching on >=1 of bits/band_bits bands,
    with the full Hamming distance computed JVM-side on the survivors.
    Same hot-bucket purge contract as ``dedup.simhash_dedup`` (which
    computes its fingerprint inline; this is the generic version for
    fingerprints produced elsewhere, e.g. perceptual image hashes).

    The tiny (id, fingerprint) projection is persisted before the
    self-join: both join sides would otherwise re-run the upstream
    plan, and that upstream is typically a decode (mapInPandas codec)
    that must not execute twice per document."""
    sh = df.select(
        F.col(id_col).alias("id"), F.col(hash_col).cast("long").alias("sh")
    ).persist()
    n_bands = bits // band_bits
    bands = sh.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftright(F.col("sh"), i * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select("id", "sh", "band.band_idx", "band.band_val")
    purged = None
    if max_band_population is not None:
        sizes = bands.groupBy("band_idx", "band_val").agg(
            F.count("*").alias("band_population")
        )
        purged = sizes.filter(F.col("band_population") > max_band_population)
        bands = bands.join(
            F.broadcast(purged.select("band_idx", "band_val")),
            ["band_idx", "band_val"],
            "left_anti",
        )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_1"),
            F.col("b.id").alias("id_2"),
            F.col("a.sh").bitwiseXOR(F.col("b.sh")).alias("x"),
        )
        .select("id_1", "id_2", F.bit_count("x").alias("hamming"))
    )
    # r6 (guide §2.3, same reorder as dedup.simhash_dedup): Hamming-verify
    # BEFORE the dedup shuffle — bit_count is map-side and the filter
    # commutes with distinct (hamming is a function of the pair), so the
    # distinct exchange carries only verified pairs when a threshold is
    # given, instead of every banded candidate row. Identical output set.
    if max_hamming is not None:
        pairs = pairs.filter(F.col("hamming") <= max_hamming)
    pairs = pairs.distinct()
    if return_purged:
        return pairs, purged
    return pairs


def image_dhash_pairs(
    media: DataFrame,
    max_hamming: int = 6,
    band_bits: int = 16,
    max_band_population: int | None = 100_000,
) -> DataFrame:
    """Perceptual image near-dup pairs over ``decode_media`` output:
    dHash band join + exact Hamming verify. (doc_id_1, doc_id_2,
    hamming)."""
    imgs = media.filter(F.col("kind") == "image")
    return (
        hamming_band_pairs(
            imgs,
            "dhash",
            id_col="doc_id",
            band_bits=band_bits,
            max_hamming=max_hamming,
            max_band_population=max_band_population,
        )
        .withColumnsRenamed({"id_1": "doc_id_1", "id_2": "doc_id_2"})
    )
