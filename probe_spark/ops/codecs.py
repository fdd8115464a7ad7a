"""Real media decoders for the multimodal ops — import-gated, stdlib-first.

``ops/multimodal.py`` keeps its deterministic fake decoders as the
documented fallback (the correctness oracles ride them, over synthetic
non-media payloads), but when a payload actually IS a recognized media
file the batch functions route here and the features come from a real
decode:

  * **PNG** — pure zlib + numpy decoder (IHDR/IDAT parse, per-row
    unfilter for all five filter types, 8-bit gray/RGB/palette-less
    color, non-interlaced).  No third-party dependency.
  * **JPEG** — header-only size parse (SOF marker scan); pixel decode
    needs a DCT codec, so JPEG payloads get real (w, h) and fall back
    to byte features for the rest.
  * **WAV** — stdlib ``wave`` parse: real sample rate / channels /
    sample width, PCM decoded to mono float64.
  * **Pillow / soundfile** — used FIRST when importable (not in this
    container); the pure decoders are the no-dependency floor, so the
    column is genuinely usable either way.

Dispatch is by magic bytes (``sniff``): 8-byte PNG signature, 3-byte
JPEG SOI, RIFF/WAVE.  Synthetic fixture payloads match none of them, so
the oracle-compared fake path is untouched.
"""

from __future__ import annotations

import io
import struct
import zlib

import numpy as np

try:  # pragma: no cover - not present in this container
    import PIL.Image as _PIL_Image
except ImportError:
    _PIL_Image = None

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff(data: bytes) -> str | None:
    """'png' | 'jpeg' | 'wav' | None by magic bytes."""
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


# --------------------------------------------------------------------------
# PNG
# --------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a (h, w, channels) uint8
    array.  Raises ValueError on anything malformed or unsupported."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    w = h = ct = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        if len(chunk) != ln:
            raise ValueError("truncated PNG chunk")
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, bitd, ct, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
            if bitd != 8:
                raise ValueError(f"unsupported PNG bit depth {bitd}")
            if ct not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {ct}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    ch = _PNG_CHANNELS[ct]
    stride = w * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad PNG IDAT stream: {e}") from e
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG decompressed size mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(filters[y])
        row = rows[y]
        if ft == 0:  # None
            cur = row.copy()
        elif ft == 1:  # Sub: + left pixel, cumulative along the row
            cur = (
                row.reshape(w, ch).astype(np.uint32).cumsum(axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif ft == 2:  # Up
            cur = row + prev  # uint8 wraps mod 256
        elif ft in (3, 4):  # Average / Paeth: left-dependent, per pixel
            cur = np.empty(stride, dtype=np.uint8)
            rw = row.astype(np.int32)
            pv = prev.astype(np.int32)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(pv[i])
                if ft == 3:
                    cur[i] = (rw[i] + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[i - ch]) if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    if pa <= pb and pa <= pc:
                        pr = a
                    elif pb <= pc:
                        pr = b
                    else:
                        pr = c
                    cur[i] = (rw[i] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ft}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, ch)


def jpeg_size(data: bytes) -> tuple[int, int]:
    """(width, height) from a JPEG's SOF marker — header-only parse."""
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG")
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = data[pos + 1]
        while marker == 0xFF and pos + 2 < n:  # fill bytes
            pos += 1
            marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        # SOF0-SOF15 minus DHT(C4)/JPG(C8)/DAC(CC) carry the frame size
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > n:
                raise ValueError("truncated JPEG SOF")
            h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
            return int(w), int(h)
        pos += 2 + seg_len
    raise ValueError("JPEG SOF not found")


def to_gray_f64(px: np.ndarray) -> np.ndarray:
    """(h, w, ch) uint8 -> (h, w) float64 luma (BT.601 for color)."""
    if px.shape[2] == 1:
        return px[:, :, 0].astype(np.float64)
    if px.shape[2] == 2:  # gray + alpha
        return px[:, :, 0].astype(np.float64)
    p = px.astype(np.float64)
    return 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]


def resize_area_f64(gray: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-average resample of a (h, w) float64 image to (out_h, out_w):
    each output cell is the mean of its source box (bilinear-free, exact
    for integer ratios; the mean-pool a feature extractor wants)."""
    h, w = gray.shape
    ys = (np.arange(out_h + 1) * h / out_h).round().astype(int)
    xs = (np.arange(out_w + 1) * w / out_w).round().astype(int)
    ys = np.clip(ys, 0, h)
    xs = np.clip(xs, 0, w)
    out = np.empty((out_h, out_w), dtype=np.float64)
    for r in range(out_h):
        # clamp the box start to the last valid source row/column: when
        # upscaling, rounding can put ys[r]/xs[c] AT h/w (1-px image to
        # 3 wide gives xs=[0,0,1,1]), and an empty source box means a
        # NaN mean reported as an 'ok' feature
        y0 = min(int(ys[r]), h - 1)
        y1 = max(int(ys[r + 1]), y0 + 1)
        band = gray[y0:y1]
        for c in range(out_w):
            x0 = min(int(xs[c]), w - 1)
            x1 = max(int(xs[c + 1]), x0 + 1)
            out[r, c] = band[:, x0:x1].mean()
    return out


def decode_image(data: bytes):
    """Best-effort real decode: returns (width, height, gray_f64 | None)
    or raises ValueError if the payload is recognized media but corrupt.
    Returns None entirely when the payload is not recognized media (the
    caller falls back to its deterministic fake)."""
    kind = sniff(data)
    if kind is None:
        return None
    if _PIL_Image is not None:  # pragma: no cover - PIL not in container
        img = _PIL_Image.open(io.BytesIO(data))
        g = np.asarray(img.convert("L"), dtype=np.float64)
        return img.width, img.height, g
    if kind == "png":
        px = decode_png(data)
        return px.shape[1], px.shape[0], to_gray_f64(px)
    if kind == "jpeg":
        w, h = jpeg_size(data)
        return w, h, None  # header-only without a DCT codec
    return None


# --------------------------------------------------------------------------
# WAV
# --------------------------------------------------------------------------


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(mono float64 PCM in [-1, 1], sample_rate) from a RIFF/WAVE
    payload via stdlib ``wave``.  Raises ValueError when unparseable."""
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            rate = wf.getframerate()
            nch = wf.getnchannels()
            sw = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"bad WAV: {e}") from e
    if sw == 2:
        pcm = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # unsigned 8-bit
        pcm = (
            np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    elif sw == 4:
        pcm = (
            np.frombuffer(frames, dtype="<i4").astype(np.float64)
            / 2147483648.0
        )
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if nch > 1:
        pcm = pcm[: len(pcm) - len(pcm) % nch].reshape(-1, nch).mean(axis=1)
    return pcm, rate
