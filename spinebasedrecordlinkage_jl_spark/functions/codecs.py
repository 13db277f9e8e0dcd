"""Pure-numpy media codecs for container formats that need no external
codec libraries: WAV (RIFF, 16-bit PCM) and netpbm images (binary P5
grayscale / P6 RGB), plus 64-bit perceptual hashes (aHash / dHash) over
decoded images.

These are REAL decoders — byte-exact round-trips, chunk-walking RIFF
parse, comment-tolerant netpbm header parse — not the hash-derived fake
in ``operators/multimodal.py``. They replace the stub for every content
type they cover; the stub remains only for formats that genuinely
require external codecs in this sandbox (JPEG, MP4, ...). The Spark
side (Arrow-batched ``mapInPandas`` over an opaque ``binary`` column)
lives in ``operators/media.py`` and is identical in shape to what a
PIL/ffmpeg-backed decoder needs.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV (RIFF PCM16)
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, ch) — as a RIFF/WAVE
    PCM16 payload (the canonical 44-byte-header layout)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"samples must be (n,) or (n, ch), got shape {s.shape}")
    n_channels = s.shape[1]
    data = s.tobytes()  # interleaved little-endian, the PCM wire format
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE PCM16 payload -> (sample_rate, int16 array of
    shape (n, ch)). Walks chunks (tolerates LIST/INFO etc. between fmt
    and data) instead of assuming the fixed 44-byte layout."""
    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        chunk = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", chunk, 0)
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (format={audio_format}, bits={bits})")
    n = len(data) // (2 * n_channels)
    arr = np.frombuffer(data[: n * 2 * n_channels], dtype="<i2").reshape(n, n_channels)
    return sample_rate, arr


# ---------------------------------------------------------------------------
# netpbm (binary P5 grayscale / P6 RGB, maxval <= 255)
# ---------------------------------------------------------------------------


def encode_pnm(pixels: np.ndarray) -> bytes:
    """Encode a uint8 array — (h, w) -> P5, (h, w, 3) -> P6."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        magic = b"P5"
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"pixels must be (h,w) or (h,w,3), got shape {a.shape}")
    h, w = a.shape[0], a.shape[1]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def _pnm_tokens(buf: bytes, start: int, count: int) -> tuple[list[int], int]:
    """Read ``count`` whitespace-separated integer tokens from a netpbm
    header, honoring '#' comments, returning (tokens, raster_offset)."""
    tokens: list[int] = []
    pos = start
    while len(tokens) < count:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < len(buf) and buf[pos] == ord("#"):
            while pos < len(buf) and buf[pos] != ord("\n"):
                pos += 1
            continue
        t = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        if t == pos:
            raise ValueError("truncated netpbm header")
        tokens.append(int(buf[t:pos]))
    # exactly one whitespace byte separates the maxval token from raster
    return tokens, pos + 1


def decode_pnm(payload: bytes) -> np.ndarray:
    """Decode binary P5/P6 -> uint8 array (h, w) or (h, w, 3)."""
    buf = bytes(payload)
    magic = buf[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"unsupported netpbm magic {magic!r}")
    (w, h, maxval), off = _pnm_tokens(buf, 2, 3)
    if maxval <= 0 or maxval > 255:
        raise ValueError(f"only 8-bit netpbm supported (maxval={maxval})")
    depth = 3 if magic == b"P6" else 1
    n = w * h * depth
    raster = np.frombuffer(buf, dtype=np.uint8, count=n, offset=off)
    return raster.reshape((h, w, 3) if depth == 3 else (h, w))


# ---------------------------------------------------------------------------
# perceptual hashes
# ---------------------------------------------------------------------------


def to_gray(pixels: np.ndarray) -> np.ndarray:
    """uint8 (h,w[,3]) -> uint8 (h,w) via the integer ITU-R 601 luma
    (deterministic across platforms: pure int arithmetic)."""
    a = np.asarray(pixels)
    if a.ndim == 2:
        return a.astype(np.uint8)
    r, g, b = a[..., 0].astype(np.int64), a[..., 1].astype(np.int64), a[..., 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


def _block_means(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Block-mean downsample to (out_h, out_w) — each output cell is the
    mean of its (possibly uneven) source block; float64, deterministic."""
    g = np.asarray(gray, dtype=np.float64)
    h, w = g.shape
    if h < out_h or w < out_w:  # upscale by repetition, then reduce exactly
        g = np.repeat(np.repeat(g, -(-out_h // h), axis=0), -(-out_w // w), axis=1)
        h, w = g.shape
    rb = (np.arange(out_h + 1) * h) // out_h
    cb = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w))
    csum = np.zeros((h + 1, w + 1))
    csum[1:, 1:] = g.cumsum(0).cumsum(1)
    for i in range(out_h):
        for j in range(out_w):
            r0, r1, c0, c1 = rb[i], rb[i + 1], cb[j], cb[j + 1]
            out[i, j] = (
                csum[r1, c1] - csum[r0, c1] - csum[r1, c0] + csum[r0, c0]
            ) / ((r1 - r0) * (c1 - c0))
    return out


def resize_area(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-mean resize of a uint8 (h,w) or (h,w,3) image to
    (out_h, out_w[,3]) — each output pixel is the mean of its source
    block (per channel), rounded half-up to uint8. Deterministic pure
    numpy; the same block-mean kernel the perceptual hashes use."""
    a = np.asarray(pixels)
    if a.ndim == 2:
        return np.floor(_block_means(a, out_h, out_w) + 0.5).astype(np.uint8)
    if a.ndim == 3 and a.shape[2] == 3:
        chans = [
            np.floor(_block_means(a[..., c], out_h, out_w) + 0.5) for c in range(3)
        ]
        return np.stack(chans, axis=2).astype(np.uint8)
    raise ValueError(f"pixels must be (h,w) or (h,w,3), got shape {a.shape}")


def _pack_bits(bits: np.ndarray) -> int:
    """Row-major bool array -> int, MSB first; returned as a SIGNED
    64-bit value so it fits a Spark LongType column unchanged."""
    v = 0
    for b in bits.ravel():
        v = (v << 1) | int(b)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def ahash64(pixels: np.ndarray) -> int:
    """Average hash: 8x8 block means thresholded by their overall mean."""
    m = _block_means(to_gray(pixels), 8, 8)
    return _pack_bits(m > m.mean())


def dhash64(pixels: np.ndarray) -> int:
    """Difference hash: 8x9 block means, bit = m[i,j] > m[i,j+1] —
    gradient-based, more robust to global brightness shifts than aHash."""
    m = _block_means(to_gray(pixels), 8, 9)
    return _pack_bits(m[:, :-1] > m[:, 1:])


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")
