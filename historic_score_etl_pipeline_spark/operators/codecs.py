"""Pure-Python/numpy media codecs for the multimodal pillar (SURVEY §2K-K5).

No external image/audio library exists in this container, so the codecs
here are written against the PUBLIC file-format specs directly:

* **PNG** (RFC 2083 / ISO 15948): chunk framing with CRC-32, zlib-deflated
  scanlines, all five filter types (None/Sub/Up/Average/Paeth) on decode,
  8-bit gray / gray+alpha / RGB / RGBA, non-interlaced.  Encode writes
  filter-0 rows — simplest valid stream, decodable by any PNG reader.
* **WAV** (RIFF/WAVE, PCM format 1): 8-bit unsigned and 16-bit signed
  little-endian samples, any channel count; chunk-walk tolerant of extra
  chunks (LIST, fact, …).

These complement the BMP/PPM codecs in ``operators.multimodal`` — between
them every *codec-free or stdlib-compressible* raster/audio format the
engine claims is decoded for real; only formats needing external codec
libraries (JPEG, Vorbis, H.264, …) remain stub-gated.

Scale note: decode runs inside Arrow-batched ``mapInPandas`` (see
``operators.multimodal``), so the per-row cost here is the whole story —
the numpy paths (Up/Sub unfiltering, sample statistics) are vectorized;
only Average/Paeth unfiltering walks pixels in Python, and only on rows
that actually use those filters (our own encoder never does).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """Encode (H, W) or (H, W, C∈{1,2,3,4}) uint8 as a non-interlaced
    8-bit PNG (filter 0 rows, one zlib IDAT).  ``level`` is the deflate
    effort (1 = fastest, 9 = smallest) — any level yields a valid PNG,
    so throughput-bound pipelines pick 1."""
    if pixels.dtype != np.uint8:
        raise ValueError("encode_png expects a uint8 array")
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    if pixels.ndim != 3 or pixels.shape[2] not in (1, 2, 3, 4):
        raise ValueError("encode_png expects (H, W[, C<=4])")
    h, w, c = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    # filter byte 0 prepended to every scanline
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * c)], axis=1
    ).tobytes()

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, level))
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering → (h, stride) uint8 recon array."""
    if len(raw) < h * (stride + 1):
        raise ValueError("PNG pixel data truncated")
    lines = np.frombuffer(raw, np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    recon = np.zeros((h, stride), np.uint16)
    prev = np.zeros(stride, np.uint16)
    for y in range(h):
        ftype, line = int(lines[y, 0]), lines[y, 1:].astype(np.uint16)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub: prefix-sum within each byte lane, mod 256
            cur = np.cumsum(
                line.reshape(-1, bpp), axis=0, dtype=np.uint32
            ).reshape(stride) % 256
        elif ftype == 2:  # Up
            cur = (line + prev) % 256
        elif ftype == 3:  # Average — sequential in x
            cur = line.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + (int(a) + int(prev[x])) // 2) % 256
        elif ftype == 4:  # Paeth — sequential in x
            cur = line.copy()
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                cur[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        recon[y] = cur
        prev = recon[y]
    return recon.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG → (H, W, C) uint8.  Verifies chunk
    CRCs; raises ValueError on anything outside the supported profile."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG profile: depth={depth} interlace={interlace}"
        )
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    c = _PNG_CHANNELS[color_type]
    recon = _unfilter(zlib.decompress(bytes(idat)), h, w * c, c)
    return recon.reshape(h, w, c).copy()


# --- WAV (RIFF/WAVE PCM) ----------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode (N,) or (N, CH) int16 samples as PCM WAV."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    body = samples.astype("<i2").tobytes()  # interleaved little-endian
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM WAV → ((N, CH) int16 samples, sample_rate).  8-bit
    unsigned input is widened to int16.  Walks chunks, skipping any
    non-fmt/data chunk (LIST, fact, …)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + length]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body)
        elif cid == b"data":
            data = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format {audio_format} (PCM only)")
    if bits == 16:
        samples = np.frombuffer(data, "<i2")
    elif bits == 8:
        samples = (np.frombuffer(data, np.uint8).astype(np.int16) - 128) << 8
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    n = len(samples) // ch
    return samples[: n * ch].reshape(n, ch).copy(), sample_rate
