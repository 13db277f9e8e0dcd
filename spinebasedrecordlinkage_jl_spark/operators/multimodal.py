"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content rides through the pipeline as ``binary``
columns with a content-type column; decode / feature-extract / resize /
frame-sample run as Arrow-batched ``mapInPandas`` stages. WAV and netpbm
payloads decode/resize through the real pure-numpy codecs in
``functions.codecs``; for every other format the codec work is STUBBED
(the image/audio libraries are not in this container): ``decode_stub``
produces deterministic fake features derived from the payload hash, and
the real-decoder seam is a single function swap. Everything Spark-side — schema, partitioning, UDF signature,
Arrow batch shape — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of extract_metadata (typed metadata for a binary column).
METADATA_SCHEMA = (
    "doc_id long, n_bytes long, content_hash string, content_type string"
)

#: Output schema of decode_features (stubbed decode -> fixed-size features).
FEATURES_SCHEMA = (
    "doc_id long, width int, height int, n_frames int, feature array<float>"
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", content_type: str = "text/plain"
) -> DataFrame:
    """Attach an opaque binary payload column (UTF-8 bytes of the text in
    this sandbox; in production this is the raw image/audio bytes read
    from object storage)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "content_type", F.lit(content_type)
    )


def extract_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Typed metadata per payload via mapInPandas (one Arrow batch per
    call; no per-row Python)."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "content_hash": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "content_type": pdf["content_type"],
                }
            )

    return df.select(id_col, "payload", "content_type").mapInPandas(
        _meta, schema=METADATA_SCHEMA
    )


def decode_stub(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic fake decoder: pretends the payload is a media file
    and derives (width, height, n_frames, 8-dim feature) from its hash.
    Swap this single function for a real codec (PIL/ffmpeg) in
    production; the Spark plumbing around it is unchanged.
    """
    h = hashlib.sha256(bytes(payload)).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 16
    feature = [b / 255.0 for b in h[3:11]]
    return width, height, n_frames, feature


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """'Decode' payloads into fixed-size features via mapInPandas.

    Real decode would be CPU-bound per batch; the partitioning contract
    (one Arrow batch of payloads in, one feature frame out, no state
    across batches) is exactly what a PIL/ffmpeg decoder needs.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["payload"].map(decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": decoded.map(lambda d: d[0]).astype("int32"),
                    "height": decoded.map(lambda d: d[1]).astype("int32"),
                    "n_frames": decoded.map(lambda d: d[2]).astype("int32"),
                    "feature": decoded.map(lambda d: d[3]),
                }
            )

    return df.select(id_col, "payload").mapInPandas(_decode, schema=FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling plumbing: explode a (stub-)decoded video into frame
    rows, keeping every n-th frame — the shape of a real video pipeline
    (decode once, fan out frames, process frames independently)."""
    frames = F.filter(
        F.sequence(F.lit(0), F.col("n_frames") - 1),
        lambda i: i % every_n == 0,
    )
    return df.withColumn("frame_idx", F.explode(frames))


#: Output schema of image_resize.
RESIZED_SCHEMA = "doc_id long, payload binary, height int, width int"


def image_resize(
    df: DataFrame,
    out_h: int,
    out_w: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    content_type_col: str = "content_type",
) -> DataFrame:
    """Resize netpbm image payloads to (out_h, out_w) by deterministic
    area-mean pooling, re-encoded as netpbm: (id, payload, height,
    width). Non-image rows (content_type not image/*) and undecodable
    payloads yield NULL payload/dims instead of failing the batch — at
    100 TB a corrupt blob must not kill the stage.

    Runs as an Arrow-batched ``mapInPandas`` stage (decode + resize +
    re-encode are per-row CPU work, no state across batches), the same
    partitioning contract a PIL/ffmpeg resizer needs — embarrassingly
    parallel, zero shuffle."""
    from ..functions.codecs import decode_pnm, encode_pnm, resize_area

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, heights, widths = [], [], []
            for ctype, payload in zip(pdf[content_type_col], pdf[payload_col]):
                resized = None
                if payload is not None and str(ctype).startswith("image/"):
                    try:
                        small = resize_area(decode_pnm(payload), out_h, out_w)
                        resized = encode_pnm(small)
                    except Exception:
                        # 'a corrupt blob must not kill the stage': any
                        # malformed payload — not just the ValueErrors the
                        # parser raises itself (e.g. a zero-dimension
                        # header reaches the upscale path as a
                        # ZeroDivisionError, ADVICE r5) — degrades to NULL
                        resized = None
                out_payload.append(resized)
                heights.append(out_h if resized is not None else None)
                widths.append(out_w if resized is not None else None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": out_payload,
                    "height": pd.array(heights, dtype="Int32"),
                    "width": pd.array(widths, dtype="Int32"),
                }
            )

    return df.select(id_col, content_type_col, payload_col).mapInPandas(
        _resize, schema=RESIZED_SCHEMA
    )
