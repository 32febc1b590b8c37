"""PNG and WAV codec correctness (operators/codecs.py) plus the audio
feature plumbing (operators/multimodal.py).  Pure-function tests run
without Spark; the Spark-side audio path is covered at the end."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from historic_score_etl_pipeline_spark.operators.codecs import (
    PNG_SIG,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    img = RNG.integers(0, 256, size=(13, 17, channels), dtype=np.uint8)
    back = decode_png(encode_png(img))
    assert back.shape == (13, 17, channels)
    assert np.array_equal(back, img)


def test_png_roundtrip_2d_gray_input():
    img = RNG.integers(0, 256, size=(9, 4), dtype=np.uint8)
    back = decode_png(encode_png(img))
    assert back.shape == (9, 4, 1)
    assert np.array_equal(back[:, :, 0], img)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-build a PNG whose row y uses filters[y] — exercises the decoder
    against streams our own (filter-0-only) encoder never produces."""
    h, w, c = img.shape
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, np.int32)
    for y in range(h):
        cur = img[y].reshape(w * c).astype(np.int32)
        f = filters[y]
        raw.append(f)
        for x in range(w * c):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            cc = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
            raw.append((int(cur[x]) - int(pred)) % 256)
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_every_filter_type():
    img = RNG.integers(0, 256, size=(5, 11, 3), dtype=np.uint8)
    payload = _png_with_filters(img, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(payload), img)


def test_png_crc_corruption_detected():
    payload = bytearray(encode_png(np.zeros((4, 4, 3), np.uint8)))
    payload[40] ^= 0xFF  # inside IDAT body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))


def test_png_rejects_unsupported_profiles():
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM" + b"\x00" * 60)
    # 16-bit depth header
    img = encode_png(np.zeros((2, 2, 3), np.uint8))
    hacked = bytearray(img)
    hacked[24] = 16  # IHDR bit-depth byte
    # fix IHDR CRC so we reach the profile check
    ihdr = bytes(hacked[12:16]) + bytes(hacked[16:29])
    hacked[29:33] = struct.pack(">I", zlib.crc32(ihdr) & 0xFFFFFFFF)
    with pytest.raises(ValueError, match="unsupported PNG profile"):
        decode_png(bytes(hacked))


def test_wav_roundtrip_mono_and_stereo():
    mono = (RNG.integers(-32768, 32767, size=500)).astype(np.int16)
    samples, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and samples.shape == (500, 1)
    assert np.array_equal(samples[:, 0], mono)

    stereo = RNG.integers(-32768, 32767, size=(300, 2)).astype(np.int16)
    samples, rate = decode_wav(encode_wav(stereo, 44100))
    assert rate == 44100 and samples.shape == (300, 2)
    assert np.array_equal(samples, stereo)


def test_wav_8bit_and_extra_chunks():
    """8-bit PCM widens to int16; unknown chunks (LIST) are skipped."""
    pcm8 = bytes(range(0, 200, 2))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    payload = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"LIST" + struct.pack("<I", 4) + b"INFO"  # skipped chunk
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm8)) + pcm8
    )
    samples, rate = decode_wav(payload)
    assert rate == 8000 and samples.shape == (100, 1)
    assert samples[0, 0] == (0 - 128) << 8
    assert samples[99, 0] == (198 - 128) << 8


def test_wav_rejects_non_pcm():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    payload = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="PCM only"):
        decode_wav(payload)


def test_decode_image_dispatches_png(spark=None):
    from historic_score_etl_pipeline_spark.operators.multimodal import decode_image

    rgb = RNG.integers(0, 256, size=(6, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(rgb)), rgb)
    rgba = RNG.integers(0, 256, size=(6, 7, 4), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(rgba)), rgba[:, :, :3])
    gray = RNG.integers(0, 256, size=(6, 7, 1), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_png(gray)), np.repeat(gray, 3, 2))


def test_audio_features_real_decode(spark, sf_smoke):
    """Spark-side WAV pipeline: render → decode → sample-accurate stats;
    RMS/peak must match a direct numpy recompute for a sampled row."""
    from historic_score_etl_pipeline_spark.operators.multimodal import (
        AUDIO_SAMPLE_RATE,
        documents_as_audio_media,
        extract_audio_features,
        render_text_wav,
    )
    from historic_score_etl_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, sf_smoke, "documents")
    feats = extract_audio_features(documents_as_audio_media(docs))
    rows = {r["media_id"]: r for r in feats.collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert rows.keys() == texts.keys()
    for mid, r in rows.items():
        assert r["decoded"] and r["sample_rate"] == AUDIO_SAMPLE_RATE
        nb = len((texts[mid] or "").encode("utf-8"))
        assert r["n_samples"] == nb % 441 + 100
        assert r["duration_us"] == r["n_samples"] * 125
    # spot-check amplitude stats against a direct decode
    mid = sorted(rows)[0]
    samples, _ = decode_wav(render_text_wav(texts[mid] or ""))
    flat = samples.astype(np.float64)
    assert rows[mid]["rms"] == pytest.approx(float(np.sqrt((flat * flat).mean())))
    assert rows[mid]["peak"] == int(np.abs(samples).max())


def test_corrupt_audio_payload_degrades_not_fails(spark):
    from historic_score_etl_pipeline_spark.operators.multimodal import (
        extract_audio_features,
    )

    media = spark.createDataFrame(
        [(1, bytearray(b"not a wav"), "audio/wav", 9)],
        "media_id long, payload binary, mime string, n_bytes long",
    )
    row = extract_audio_features(media).collect()[0]
    assert row["decoded"] is False and row["n_samples"] is None
