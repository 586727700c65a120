"""From-scratch pure-Python media codecs (no external libraries).

The container ships no PIL/torchaudio/ffmpeg, so the multimodal decode
stage implements the formats that are decodable with the standard library
alone, for real:

- **BMP** — uncompressed 24-bit ``BI_RGB`` (bottom-up rows, 4-byte padding);
- **WAV** — RIFF/WAVE PCM, 16-bit mono;
- **PNG** — 8-bit RGB, all five scanline filters (None/Sub/Up/Average/
  Paeth), zlib (stdlib) IDAT streams;
- **AVI** — RIFF video container with uncompressed DIB frames (the
  frame-sample path operates on real decoded frames).

Each codec has an encoder (used by the synthetic media table) and a
decoder (used by ``DecodeStage``); round-trip identity is pytest-locked.
The PNG encoder deliberately cycles the filter type per row so the
decoder's filter paths are exercised by every image.  JPEG (DCT entropy
coding) remains genuinely unimplemented — ``media_info`` reports it as
unsupported and the decode stage raises, which is the honest boundary.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

BMP_MAGIC = b"BM"
PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
RIFF_MAGIC = b"RIFF"
JPEG_MAGIC = b"\xff\xd8\xff"


def sniff(data: bytes) -> str | None:
    if data[:2] == BMP_MAGIC:
        return "bmp"
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:4] == RIFF_MAGIC and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == RIFF_MAGIC and data[8:12] == b"AVI ":
        return "avi"
    if data[:3] == JPEG_MAGIC:
        return "jpeg"
    return None


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB)
# ---------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> uncompressed 24-bit BMP bytes."""
    h, w, c = pixels.shape
    assert c == 3
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    img_size = (row_bytes + pad) * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", BMP_MAGIC, off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = bytearray()
    bgr = pixels[:, :, ::-1]  # BMP stores BGR
    zeros = b"\x00" * pad
    for r in range(h - 1, -1, -1):  # bottom-up
        body += bgr[r].tobytes() + zeros
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes -> (H, W, 3) uint8 RGB."""
    if data[:2] != BMP_MAGIC:
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    raw = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ---------------------------------------------------------------------------
# WAV (RIFF PCM 16-bit mono)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return RIFF_MAGIC + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes -> (int16 mono samples, sample_rate)."""
    if data[:4] != RIFF_MAGIC or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate = None
    pcm = None
    channels = 1
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError("only 16-bit PCM WAV supported")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(pcm, dtype="<i2")
    if channels > 1:
        samples = samples.reshape(-1, channels)[:, 0].copy()
    return samples, rate


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, filters 0-4)
# ---------------------------------------------------------------------------

def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> PNG bytes.

    The per-row filter type cycles 0..4 (None/Sub/Up/Average/Paeth) so every
    encoded image exercises every decoder filter path."""
    h, w, c = pixels.shape
    assert c == 3
    px = pixels.astype(np.int32)
    raw = bytearray()
    prev = np.zeros((w, 3), dtype=np.int32)
    for r in range(h):
        row = px[r]
        ftype = r % 5
        left = np.vstack([np.zeros((1, 3), np.int32), row[:-1]])
        up_left = np.vstack([np.zeros((1, 3), np.int32), prev[:-1]])
        if ftype == 0:
            filt = row
        elif ftype == 1:
            filt = row - left
        elif ftype == 2:
            filt = row - prev
        elif ftype == 3:
            filt = row - (left + prev) // 2
        else:  # Paeth
            p = left + prev - up_left
            pa_ = np.abs(p - left)
            pb_ = np.abs(p - prev)
            pc_ = np.abs(p - up_left)
            pred = np.where(
                (pa_ <= pb_) & (pa_ <= pc_), left, np.where(pb_ <= pc_, prev, up_left)
            )
            filt = row - pred
        raw.append(ftype)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes (8-bit RGB, non-interlaced) -> (H, W, 3) uint8."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (size,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or color != 2 or interlace != 0:
                raise NotImplementedError(
                    "only 8-bit non-interlaced RGB PNG supported"
                )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size
    raw = zlib.decompress(bytes(idat))
    stride = w * 3 + 1
    out = np.zeros((h, w, 3), dtype=np.int32)
    prev = np.zeros((w, 3), dtype=np.int32)
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        ftype = line[0]
        row = np.frombuffer(line, dtype=np.uint8, count=w * 3, offset=1).reshape(
            w, 3
        ).astype(np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 2:
            cur = (row + prev) % 256
        elif ftype in (1, 3, 4):
            # left-dependent filters are sequential in x: walk columns with
            # vectorized channel math (w is small for media thumbnails)
            cur = np.zeros((w, 3), dtype=np.int32)
            for x in range(w):
                left = cur[x - 1] if x else np.zeros(3, np.int32)
                up = prev[x]
                up_left = prev[x - 1] if x else np.zeros(3, np.int32)
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - up_left
                    pa_ = np.abs(p - left)
                    pb_ = np.abs(p - up)
                    pc_ = np.abs(p - up_left)
                    pred = np.where(
                        (pa_ <= pb_) & (pa_ <= pc_),
                        left,
                        np.where(pb_ <= pc_, up, up_left),
                    )
                cur[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[r] = cur
        prev = cur
    return out.astype(np.uint8)


# ---------------------------------------------------------------------------
# Unified metadata probe
# ---------------------------------------------------------------------------

def media_info(data: bytes) -> dict:
    """Decode-backed metadata for a payload: kind, dimensions, duration.

    Raises NotImplementedError for codecs this environment cannot decode
    (jpeg, video containers, unknown formats)."""
    kind = sniff(data)
    if kind == "bmp":
        px = decode_bmp(data)
        return {"kind": "bmp", "width": px.shape[1], "height": px.shape[0],
                "sample_rate": None, "duration_ms": None}
    if kind == "png":
        px = decode_png(data)
        return {"kind": "png", "width": px.shape[1], "height": px.shape[0],
                "sample_rate": None, "duration_ms": None}
    if kind == "wav":
        samples, rate = decode_wav(data)
        return {"kind": "wav", "width": None, "height": None,
                "sample_rate": rate,
                "duration_ms": int(len(samples) * 1000 / rate)}
    if kind == "avi":
        frames, fps = decode_avi(data)
        return {"kind": "avi", "width": int(frames.shape[2]),
                "height": int(frames.shape[1]), "sample_rate": None,
                "duration_ms": int(len(frames) * 1000 / max(fps, 1))}
    raise NotImplementedError(f"no decoder for payload kind: {kind!r}")


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor image resize (the thumbnailing kernel)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[ys][:, xs]


# ---------------------------------------------------------------------------
# AVI (RIFF, uncompressed DIB frames) — the video container
# ---------------------------------------------------------------------------

def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(N, H, W, 3) uint8 RGB frames -> minimal uncompressed AVI bytes.

    RIFF 'AVI ' with an hdrl (avih + one 'vids'/'DIB ' stream) and a movi
    list of '00db' chunks, each a bottom-up BGR DIB with 4-byte row padding
    (the same pixel layout as the BMP codec)."""
    n, h, w, c = frames.shape
    assert c == 3
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    frame_size = (row_bytes + pad) * h

    def dib(frame: np.ndarray) -> bytes:
        bgr = frame[:, :, ::-1]
        body = bytearray()
        zeros = b"\x00" * pad
        for r in range(h - 1, -1, -1):
            body += bgr[r].tobytes() + zeros
        return bytes(body)

    us_per_frame = int(1_000_000 / fps)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, frame_size * fps, 0, 0x10, n, 0, 1, frame_size, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                                        n, frame_size, 0, 0xFFFFFFFF)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        out = cid + struct.pack("<I", len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    strl = lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + strl)
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(data: bytes) -> tuple[np.ndarray, int]:
    """Minimal AVI bytes -> ((N, H, W, 3) uint8 RGB frames, fps)."""
    if data[:4] != RIFF_MAGIC or data[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    w = h = None
    us_per_frame = 100_000
    frames = []

    def walk(buf: bytes):
        nonlocal w, h, us_per_frame
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack_from("<I", buf, pos + 4)
            body = buf[pos + 8 : pos + 8 + size]
            if cid == b"LIST":
                walk(body[4:])  # skip the list type fourcc
            elif cid == b"avih":
                us_per_frame, = struct.unpack_from("<I", body, 0)
                w, h = struct.unpack_from("<II", body, 32)
            elif cid in (b"00db", b"00dc"):
                frames.append(body)
            pos += 8 + size + (size & 1)

    walk(data[12:])
    if w is None or h is None:
        raise ValueError("AVI missing avih header")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for i, fb in enumerate(frames):
        raw = np.frombuffer(fb, dtype=np.uint8, count=stride * h)
        rows = raw.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
        out[i] = rows[::-1, :, ::-1]  # bottom-up BGR -> top-down RGB
    fps = int(round(1_000_000 / us_per_frame)) if us_per_frame else 10
    return out, fps
