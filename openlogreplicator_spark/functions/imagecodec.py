"""Pure-Python media codecs for the multimodal plane.

This container ships no imaging/audio libraries, so the decode stage
implements the formats directly from their public specifications —
real pixels, not a stub:

- **BMP**: 24-bit uncompressed ``BI_RGB`` Windows bitmaps
  (BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, bottom-up rows, rows
  padded to 4 bytes, BGR byte order).
- **PPM**: binary ``P6`` (netpbm), maxval 255.
- **PNG**: 8-bit truecolor (color type 2), zlib-inflated IDAT, all five
  scanline filters (None/Sub/Up/Average/Paeth) on decode; encode uses
  filter 0. CRC-32 via zlib.
- **WAV**: RIFF/WAVE PCM 16-bit mono.
- **MPNG**: this repo's trivial multi-frame container for the video
  kind — ``b"MPNG" | u32 n_frames | (u32 len | png bytes)*`` — each
  frame a real PNG.

Everything is numpy-vectorized per image; the per-row Python is the
codec itself, exactly the shape a PIL/ffmpeg swap-in would have.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


# --------------------------------------------------------------------------
# BMP (24-bit BI_RGB)
# --------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BMP."""
    h, w, _ = pixels.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    bgr = pixels[:, :, ::-1]  # BMP stores BGR
    for y in range(h - 1, -1, -1):
        body += bgr[y].tobytes() + b"\x00" * pad
    pixel_off = 14 + 40
    size = pixel_off + len(body)
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, pixel_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    return hdr + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    (pixel_off,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: {bpp}bpp compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        data, np.uint8, count=h * stride, offset=pixel_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


# --------------------------------------------------------------------------
# PPM (P6)
# --------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval, single whitespace, raster
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while data[i] in b" \t\r\n":
            i += 1
        if data[i: i + 1] == b"#":  # comment to end of line
            while data[i] not in b"\r\n":
                i += 1
            continue
        j = i
        while data[j] not in b" \t\r\n":
            j += 1
        fields.append(int(data[i:j]))
        i = j
    i += 1  # the single whitespace before the raster
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    return np.frombuffer(data, np.uint8, count=h * w * 3, offset=i).reshape(
        h, w, 3
    ).copy()


# --------------------------------------------------------------------------
# PNG (8-bit RGB, color type 2)
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type None
        raw += pixels[y].tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG file")
    i = len(_PNG_SIG)
    w = h = None
    idat = bytearray()
    while i < len(data):
        (length,) = struct.unpack_from(">I", data, i)
        tag = data[i + 4: i + 8]
        body = data[i + 8: i + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype != 2 or inter != 0:
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + length
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = w * bpp
    out = np.zeros((h, stride), np.uint8)
    pos = 0
    prev = bytearray(stride)
    for y in range(h):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1: pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up — whole-line vector op
            line = bytearray(
                (
                    np.frombuffer(bytes(line), np.uint8)
                    + np.frombuffer(bytes(prev), np.uint8)
                ).astype(np.uint8).tobytes()
            )
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = np.frombuffer(bytes(line), np.uint8)
        prev = line
    return out.reshape(h, w, 3)


# --------------------------------------------------------------------------
# WAV (RIFF PCM16 mono)
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    pcm = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    sample_rate = None
    samples = None
    while i + 8 <= len(data):
        tag = data[i: i + 4]
        (length,) = struct.unpack_from("<I", data, i + 4)
        body = data[i + 8: i + 8 + length]
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from(
                "<HHI", body, 0
            )
            if audio_fmt != 1 or channels != 1:
                raise ValueError("only PCM mono supported")
        elif tag == b"data":
            samples = np.frombuffer(body, "<i2").copy()
        i += 8 + length + (length & 1)
    if samples is None or sample_rate is None:
        raise ValueError("missing fmt/data chunk")
    return samples, sample_rate


# --------------------------------------------------------------------------
# MPNG (multi-frame container: video kind)
# --------------------------------------------------------------------------


def encode_mpng(frames: list[np.ndarray]) -> bytes:
    out = bytearray(b"MPNG" + struct.pack("<I", len(frames)))
    for f in frames:
        png = encode_png(f)
        out += struct.pack("<I", len(png)) + png
    return bytes(out)


def decode_mpng(data: bytes) -> list[np.ndarray]:
    if data[:4] != b"MPNG":
        raise ValueError("not an MPNG container")
    (n,) = struct.unpack_from("<I", data, 4)
    i = 8
    frames = []
    for _ in range(n):
        (length,) = struct.unpack_from("<I", data, i)
        frames.append(decode_png(data[i + 4: i + 4 + length]))
        i += 4 + length
    return frames


def mpng_frame(data: bytes, idx: int) -> np.ndarray:
    """Random access to one frame without decoding the others (the
    frame-sampling path never inflates skipped frames)."""
    (n,) = struct.unpack_from("<I", data, 4)
    if idx >= n:
        raise IndexError(idx)
    i = 8
    for k in range(n):
        (length,) = struct.unpack_from("<I", data, i)
        if k == idx:
            return decode_png(data[i + 4: i + 4 + length])
        i += 4 + length
    raise IndexError(idx)


def sniff_format(data: bytes) -> str:
    if data[: len(_PNG_SIG)] == _PNG_SIG:
        return "png"
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"MPNG":
        return "mpng"
    return "raw"


def decode_image(data: bytes) -> np.ndarray:
    fmt = sniff_format(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "ppm":
        return decode_ppm(data)
    raise ValueError(f"not a still image: {fmt}")


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample — two integer index grids, pure numpy."""
    h, w, _ = pixels.shape
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]
