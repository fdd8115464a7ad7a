"""Real-media decode tests (ops/codecs.py) — fixtures built with stdlib
only: PNGs assembled by hand from zlib-compressed filtered scanlines
(independent of the decoder), WAVs written by the stdlib ``wave`` module.
Plus the multimodal batch functions routing real payloads through the
real decoders while synthetic payloads keep the oracle-compared fakes.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from probe_spark.ops import codecs


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def make_png(px: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Minimal PNG encoder for tests: px is (h, w, ch) uint8; filters is
    the per-row filter type (default all 0 = None).  Filtered bytes are
    computed by the PNG spec's forward formulas, so decoding them back
    exercises the decoder's unfilter logic against the spec, not against
    itself."""
    h, w, ch = px.shape
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        row = px[y].reshape(w * ch).astype(np.int32)
        ft = filters[y]
        raw.append(ft)
        for i in range(w * ch):
            a = int(row[i - ch]) if i >= ch else 0  # left (RECONSTRUCTED)
            b = int(prev[i])
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = row[i] - a
            elif ft == 2:
                v = row[i] - b
            elif ft == 3:
                v = row[i] - ((a + b) >> 1)
            else:  # 4 Paeth
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = row[i] - pr
            raw.append(v & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    return (
        codecs.PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def make_wav(pcm16: np.ndarray, rate: int, nch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm16.astype("<i2").tobytes())
    return buf.getvalue()


class TestSniff:
    def test_magics(self):
        assert codecs.sniff(make_png(np.zeros((1, 1, 1), np.uint8))) == "png"
        assert codecs.sniff(b"\xff\xd8\xff\xe0rest") == "jpeg"
        assert codecs.sniff(make_wav(np.zeros(4), 8000)) == "wav"
        assert codecs.sniff(b"\x00\x01random synthetic bytes") is None
        assert codecs.sniff(b"") is None


class TestPng:
    @pytest.mark.parametrize("ch", [1, 3, 4])
    def test_roundtrip_filter_none(self, ch):
        rng = np.random.default_rng(7)
        px = rng.integers(0, 256, size=(5, 4, ch), dtype=np.uint8)
        out = codecs.decode_png(make_png(px))
        assert out.shape == (5, 4, ch)
        np.testing.assert_array_equal(out, px)

    @pytest.mark.parametrize("ft", [1, 2, 3, 4])
    def test_roundtrip_each_filter(self, ft):
        rng = np.random.default_rng(ft)
        px = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
        out = codecs.decode_png(make_png(px, filters=[ft] * 6))
        np.testing.assert_array_equal(out, px)

    def test_roundtrip_mixed_filters(self):
        rng = np.random.default_rng(42)
        px = rng.integers(0, 256, size=(5, 7, 4), dtype=np.uint8)
        out = codecs.decode_png(make_png(px, filters=[0, 1, 2, 3, 4]))
        np.testing.assert_array_equal(out, px)

    def test_corrupt_raises(self):
        good = bytearray(make_png(np.zeros((2, 2, 1), np.uint8)))
        # mangle a byte inside the IDAT zlib stream
        idat_at = bytes(good).index(b"IDAT") + 6
        good[idat_at] ^= 0xFF
        with pytest.raises(ValueError):
            codecs.decode_png(bytes(good))
        with pytest.raises(ValueError):
            codecs.decode_png(b"\x89PNG\r\n\x1a\nnot chunks")

    def test_decode_image_gray(self):
        px = np.zeros((2, 2, 3), np.uint8)
        px[0, 0] = (255, 0, 0)
        w, h, gray = codecs.decode_image(make_png(px))
        assert (w, h) == (2, 2)
        assert gray[0, 0] == pytest.approx(0.299 * 255)
        assert gray[1, 1] == 0.0

    def test_resize_upscale_no_nan(self):
        # rounding puts a box start AT w when upscaling (1 px wide -> 3
        # wide gives xs=[0,0,1,1]); the clamp keeps every source box
        # non-empty so no output cell is a NaN mean of an empty slice
        g = np.array([[7.0], [9.0]])
        out = codecs.resize_area_f64(g, 3, 3)
        assert out.shape == (3, 3)
        assert np.isfinite(out).all()
        assert set(np.unique(out)) <= {7.0, 8.0, 9.0}
        out2 = codecs.resize_area_f64(np.array([[5.0]]), 4, 2)
        assert np.isfinite(out2).all() and (out2 == 5.0).all()


class TestJpeg:
    def test_sof_size(self):
        # hand-assembled minimal JPEG header stream: SOI, APP0, SOF0
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(
            ">HH", 48, 64
        ) + b"\x01\x01\x11\x00"
        data = b"\xff\xd8" + app0 + sof
        assert codecs.jpeg_size(data) == (64, 48)
        w, h, gray = codecs.decode_image(data)
        assert (w, h, gray) == (64, 48, None)

    def test_not_jpeg(self):
        with pytest.raises(ValueError):
            codecs.jpeg_size(b"\x89PNG")


class TestWav:
    def test_mono_16bit(self):
        pcm = np.array([0, 16384, -16384, 32767], dtype=np.int16)
        mono, rate = codecs.decode_wav(make_wav(pcm, 8000))
        assert rate == 8000
        np.testing.assert_allclose(mono, pcm / 32768.0)

    def test_stereo_downmix(self):
        pcm = np.array([100, 300, -100, -300], dtype=np.int16)  # L,R,L,R
        mono, rate = codecs.decode_wav(make_wav(pcm, 16000, nch=2))
        assert rate == 16000
        np.testing.assert_allclose(mono * 32768.0, [200.0, -200.0])

    def test_corrupt(self):
        with pytest.raises(ValueError):
            codecs.decode_wav(b"RIFF\x00\x00\x00\x00WAVEjunk")


class TestMultimodalRealDecode:
    def test_image_features_real_png(self, spark):
        from probe_spark.ops.multimodal import image_features

        px = np.full((10, 20, 1), 7, np.uint8)
        rows = (
            image_features(
                spark.createDataFrame(
                    [(1, bytearray(make_png(px))), (2, bytearray(b"\x05syn"))],
                    "sample_id long, image binary",
                )
            )
            .orderBy("sample_id")
            .collect()
        )
        real, fake = rows
        assert (real["width"], real["height"]) == (20, 10)
        assert real["byte_mean"] == pytest.approx(7.0)
        assert real["status"] == "ok"
        # synthetic payload keeps the deterministic fake (oracle path)
        assert (fake["width"], fake["height"]) == (16 + 5 % 64, 16 + ord("n") % 64)

    def test_image_resize_real_png(self, spark):
        from probe_spark.ops.multimodal import image_resize

        # left half black, right half white: the 2x2 area resize must
        # see real geometry, which the byte-fold fake cannot
        px = np.zeros((8, 8, 1), np.uint8)
        px[:, 4:] = 200
        row = (
            image_resize(
                spark.createDataFrame(
                    [(1, bytearray(make_png(px)))],
                    "sample_id long, image binary",
                ),
                out_w=2,
                out_h=2,
            ).collect()
        )[0]
        assert row["pixels"] == pytest.approx([0.0, 200.0, 0.0, 200.0])

    def test_audio_features_real_wav(self, spark):
        from probe_spark.ops.multimodal import audio_features

        pcm = np.array([1000, -1000] * 400, dtype=np.int16)  # 800 samples
        row = (
            audio_features(
                spark.createDataFrame(
                    [(1, bytearray(make_wav(pcm, 4000)))],
                    "sample_id long, audio binary",
                )
            ).collect()
        )[0]
        # real rate 4000 (not the 16k fallback): 800 samples -> 200 ms
        assert row["duration_ms"] == pytest.approx(200.0)
        assert row["rms"] == pytest.approx(1000.0)
        assert row["status"] == "ok"
