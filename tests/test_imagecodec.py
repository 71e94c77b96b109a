"""Pure-Python media codecs: spec-level round trips, foreign-filtered
PNG decode, container random access, resize."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from openlogreplicator_spark.functions.imagecodec import (
    decode_bmp,
    decode_image,
    decode_mpng,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_mpng,
    encode_png,
    encode_ppm,
    encode_wav,
    mpng_frame,
    resize_nearest,
    sniff_format,
)

RNG = np.random.default_rng(20260815)
PX = RNG.integers(0, 256, (23, 17, 3), dtype=np.uint8)


def test_bmp_roundtrip_and_padding():
    # width 17 → 51-byte rows padded to 52: the 4-byte row padding and
    # the bottom-up BGR layout must both survive
    assert (decode_bmp(encode_bmp(PX)) == PX).all()
    blob = encode_bmp(PX)
    assert blob[:2] == b"BM" and sniff_format(blob) == "bmp"


def test_ppm_roundtrip_and_comment_header():
    assert (decode_ppm(encode_ppm(PX)) == PX).all()
    # netpbm allows comments inside the header
    raw = b"P6\n# a comment\n17 23\n255\n" + PX.tobytes()
    assert (decode_ppm(raw) == PX).all()


def test_png_roundtrip():
    blob = encode_png(PX)
    assert sniff_format(blob) == "png"
    assert (decode_png(blob) == PX).all()


def _png_with_filters(px: np.ndarray, ftypes: list[int]) -> bytes:
    """Encode a PNG using every scanline filter type — an independent
    encoder, so the decoder's filter reconstruction is tested against
    the spec, not against our own filter-0 writer."""
    h, w, _ = px.shape
    bpp, stride = 3, w * 3
    flat = px.reshape(h, stride).astype(int)
    raw = bytearray()
    prev = np.zeros(stride, int)
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        line = flat[y]
        enc = line.copy()
        if f == 1:
            enc[bpp:] = (line[bpp:] - line[:-bpp]) % 256
        elif f == 2:
            enc = (line - prev) % 256
        elif f == 3:
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                enc[x] = (line[x] - ((left + prev[x]) >> 1)) % 256
        elif f == 4:
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                b = prev[x]
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (line[x] - pr) % 256
        raw.append(f)
        raw += bytes(enc.astype(np.uint8))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_all_filter_types_decode():
    assert (decode_png(_png_with_filters(PX, [0, 1, 2, 3, 4])) == PX).all()
    assert (decode_png(_png_with_filters(PX, [4])) == PX).all()
    assert (decode_png(_png_with_filters(PX, [3, 1])) == PX).all()


def test_wav_roundtrip():
    s = (np.sin(np.arange(800) / 10) * 20000).astype("<i2")
    out, sr = decode_wav(encode_wav(s, 8000))
    assert sr == 8000 and (out == s).all()


def test_mpng_container_and_random_access():
    frames = [
        RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(4)
    ]
    blob = encode_mpng(frames)
    assert sniff_format(blob) == "mpng"
    dec = decode_mpng(blob)
    assert all((a == b).all() for a, b in zip(dec, frames))
    assert (mpng_frame(blob, 2) == frames[2]).all()
    with pytest.raises(IndexError):
        mpng_frame(blob, 4)


def test_resize_nearest_geometry_and_identity():
    r = resize_nearest(PX, 34, 46)
    assert r.shape == (46, 34, 3)
    assert (resize_nearest(PX, 17, 23) == PX).all()  # identity resize
    solid = np.full((5, 5, 3), 9, np.uint8)
    assert (resize_nearest(solid, 50, 3) == 9).all()


def test_decode_image_dispatch_and_raw():
    for enc in (encode_png, encode_bmp, encode_ppm):
        assert (decode_image(enc(PX)) == PX).all()
    assert sniff_format(b"\x00\x01garbage") == "raw"
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01garbage")
