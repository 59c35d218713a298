"""Real-codec coverage for the multimodal stages: the pure-stdlib PNG
decoder/encoder and WAV parser (functions/media_codecs.py), and their use
inside the mapInPandas decode/resize operators.

The first PNG test decodes a byte string constructed chunk-by-chunk in the
test itself (struct + zlib, NOT via png_encode) so decoder and encoder are
not just validating each other; the filter tests feed hand-computed
scanlines through every PNG filter type (0-4)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from cdc_poc_spark.functions import media_codecs as mc
from cdc_poc_spark.operators import multimodal as mm


def _raw_chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _manual_png(width, height, color_type, channels, scanlines: bytes) -> bytes:
    """Independent PNG construction (no png_encode): IHDR + one IDAT whose
    payload is the given pre-filtered scanline bytes."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        mc.PNG_SIG
        + _raw_chunk(b"IHDR", ihdr)
        + _raw_chunk(b"IDAT", zlib.compress(scanlines))
        + _raw_chunk(b"IEND", b"")
    )


def test_decode_real_1x1_png():
    # 1x1 gray pixel, value 0x7f, filter 0 — built byte-by-byte
    png = _manual_png(1, 1, 0, 1, b"\x00\x7f")
    w, h, c, px = mc.png_decode(png)
    assert (w, h, c) == (1, 1, 1)
    assert px[0, 0, 0] == 0x7F


def test_decode_rgb_2x2_png():
    # rows: (255,0,0),(0,255,0) / (0,0,255),(255,255,255), filter 0
    row0 = b"\x00" + bytes([255, 0, 0, 0, 255, 0])
    row1 = b"\x00" + bytes([0, 0, 255, 255, 255, 255])
    png = _manual_png(2, 2, 2, 3, row0 + row1)
    w, h, c, px = mc.png_decode(png)
    assert (w, h, c) == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[1, 1].tolist() == [255, 255, 255]


def test_png_filters_sub_up_average_paeth():
    # gray 3x4: feed each filter type one row, with hand-filtered bytes.
    # target pixel rows:
    #   r0 = [10, 20, 30]   (filter 1 Sub:   raw = [10, 10, 10])
    #   r1 = [15, 25, 35]   (filter 2 Up:    raw = [5, 5, 5])
    #   r2 = [20, 30, 40]   (filter 3 Avg:   raw[x] = p[x] - (left+up)//2)
    #   r3 = [25, 35, 45]   (filter 4 Paeth)
    r0 = bytes([1, 10, 10, 10])
    r1 = bytes([2, 5, 5, 5])
    # Average: x=0: left=0, up=15 -> raw = 20 - 7 = 13
    #          x=1: left=20, up=25 -> raw = 30 - 22 = 8
    #          x=2: left=30, up=35 -> raw = 40 - 32 = 8
    r2 = bytes([3, 13, 8, 8])
    # Paeth over (left, up, upper-left):
    # x=0: a=0,b=20,c=0 -> p=20 -> pred=b=20 -> raw = 25-20 = 5
    # x=1: a=25,b=30,c=20 -> p=35; pa=10,pb=5,pc=15 -> pred=30 -> raw=5
    # x=2: a=35,b=40,c=30 -> pred=40 -> raw = 45-40 = 5
    r3 = bytes([4, 5, 5, 5])
    png = _manual_png(3, 4, 0, 1, r0 + r1 + r2 + r3)
    _w, _h, _c, px = mc.png_decode(png)
    assert px[:, :, 0].tolist() == [
        [10, 20, 30],
        [15, 25, 35],
        [20, 30, 40],
        [25, 35, 45],
    ]


def test_png_round_trip_rgba():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 9, 4), dtype=np.uint8)
    w, h, c, back = mc.png_decode(mc.png_encode(px))
    assert (w, h, c) == (9, 5, 4)
    assert np.array_equal(back, px)


def test_png_rejects_malformed():
    # illegal depth for the color type (palette @ 16-bit)
    ihdr_bad = struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0)
    bad = (
        mc.PNG_SIG
        + _raw_chunk(b"IHDR", ihdr_bad)
        + _raw_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + _raw_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="illegal PNG depth"):
        mc.png_decode(bad)
    # unknown color type
    ihdr_ct = struct.pack(">IIBBBBB", 1, 1, 8, 7, 0, 0, 0)
    bad_ct = (
        mc.PNG_SIG
        + _raw_chunk(b"IHDR", ihdr_ct)
        + _raw_chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + _raw_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="color type"):
        mc.png_decode(bad_ct)
    # truncated scanline payload
    short = _manual_png(2, 2, 0, 1, b"\x00\x01\x02")
    with pytest.raises(ValueError, match="size mismatch"):
        mc.png_decode(short)
    with pytest.raises(ValueError, match="not a PNG"):
        mc.png_decode(b"plain text")


def _manual_png_full(
    width, height, depth, color_type, scanlines: bytes,
    palette: bytes | None = None, trns: bytes | None = None,
    interlace: int = 0,
) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, interlace)
    png = mc.PNG_SIG + _raw_chunk(b"IHDR", ihdr)
    if palette is not None:
        png += _raw_chunk(b"PLTE", palette)
    if trns is not None:
        png += _raw_chunk(b"tRNS", trns)
    return png + _raw_chunk(b"IDAT", zlib.compress(scanlines)) + _raw_chunk(b"IEND", b"")


def test_png_palette_decode_with_and_without_trns():
    # 2x2 palette image over a 3-entry palette, indices [[0,1],[2,1]]
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    rows = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 1])
    png = _manual_png_full(2, 2, 8, 3, rows, palette=plte)
    w, h, c, px = mc.png_decode(png)
    assert (w, h, c) == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[1, 0].tolist() == [0, 0, 255]
    # tRNS covering entry 0 only -> RGBA with alpha 7 on entry 0, 255 elsewhere
    png_a = _manual_png_full(2, 2, 8, 3, rows, palette=plte, trns=bytes([7]))
    w, h, c, px = mc.png_decode(png_a)
    assert c == 4
    assert px[0, 0].tolist() == [255, 0, 0, 7]
    assert px[0, 1].tolist() == [0, 255, 0, 255]


def test_png_palette_2bit_indices():
    # 4x1, 2-bit palette indices 0,1,2,3 packed MSB-first into one byte
    plte = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 40, 40, 40])
    packed = bytes([0b00_01_10_11])
    png = _manual_png_full(4, 1, 2, 3, b"\x00" + packed, palette=plte)
    w, h, c, px = mc.png_decode(png)
    assert (w, h, c) == (4, 1, 3)
    assert px[0, 0].tolist() == [10, 0, 0]
    assert px[0, 3].tolist() == [40, 40, 40]


def test_png_16bit_gray_and_rgb_downshift():
    # 1x1 gray16 0xABCD -> high byte 0xAB
    png = _manual_png_full(1, 1, 16, 0, b"\x00" + bytes([0xAB, 0xCD]))
    w, h, c, px = mc.png_decode(png)
    assert (w, h, c) == (1, 1, 1) and px[0, 0, 0] == 0xAB
    # 2x1 rgb16
    row = b"\x00" + struct.pack(">HHH", 0xFF00, 0x1234, 0x0001) + struct.pack(
        ">HHH", 0x8000, 0x7FFF, 0xFFFF
    )
    png = _manual_png_full(2, 1, 16, 2, row)
    w, h, c, px = mc.png_decode(png)
    assert (w, h, c) == (2, 1, 3)
    assert px[0, 0].tolist() == [0xFF, 0x12, 0x00]
    assert px[0, 1].tolist() == [0x80, 0x7F, 0xFF]


def test_png_sub8bit_gray_scales_to_full_range():
    # 4x1 1-bit gray 1,0,1,1 -> 255,0,255,255
    png = _manual_png_full(4, 1, 1, 0, b"\x00" + bytes([0b1011_0000]))
    w, h, c, px = mc.png_decode(png)
    assert px[0, :, 0].tolist() == [255, 0, 255, 255]
    # 2x1 4-bit gray 0x5, 0xF -> 85, 255 (scale 17)
    png = _manual_png_full(2, 1, 4, 0, b"\x00" + bytes([0x5F]))
    w, h, c, px = mc.png_decode(png)
    assert px[0, :, 0].tolist() == [85, 255]


def _adam7_scanlines(img: np.ndarray) -> bytes:
    """Reference Adam7 interlacer (filter-0 rows per pass) for test input
    construction — independent of the decoder's pass arithmetic."""
    out = bytearray()
    for xs, ys, xstep, ystep in (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ):
        sub = img[ys::ystep, xs::xstep]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            out += b"\x00" + row.tobytes()
    return bytes(out)


def test_png_adam7_interlaced_gray():
    rng = np.arange(5 * 7, dtype=np.uint8).reshape(5, 7) * 3
    png = _manual_png_full(7, 5, 8, 0, _adam7_scanlines(rng), interlace=1)
    w, h, c, px = mc.png_decode(png)
    assert (w, h, c) == (7, 5, 1)
    assert np.array_equal(px[:, :, 0], rng)


def test_png_adam7_interlaced_rgb():
    rng = (np.arange(9 * 10 * 3, dtype=np.uint8).reshape(9, 10, 3) * 5) % 251
    flat = rng.reshape(9, 10 * 3)  # interlacer slices rows of pixel triples
    out = bytearray()
    for xs, ys, xstep, ystep in (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ):
        sub = rng[ys::ystep, xs::xstep]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            out += b"\x00" + row.tobytes()
    png = _manual_png_full(10, 9, 8, 2, bytes(out), interlace=1)
    w, h, c, px = mc.png_decode(png)
    assert (w, h, c) == (10, 9, 3)
    assert np.array_equal(px, rng)


def test_resize_nearest_dims_and_identity():
    px = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    out = mc.resize_nearest(px, 8, 4)
    assert out.shape == (4, 8, 3)
    assert np.array_equal(mc.resize_nearest(px, 4, 2), px)


def test_wav_round_trip():
    samples = (np.sin(np.linspace(0, 20, 320)) * 30000).astype(np.int16)
    data = mc.wav_encode(samples, sample_rate=8000, n_channels=1)
    assert mc.is_wav(data)
    assert mc.wav_info(data) == (1, 8000, 320)


# ------------------------------------------------- Spark-level integration


def _real_media_df(spark):
    png = mc.png_encode(
        np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    )  # 8x6 RGB
    wav = mc.wav_encode(np.zeros(441, dtype=np.int16), sample_rate=44100)
    rows = [
        (1, "image", bytearray(png)),
        (2, "audio", bytearray(wav)),
        (3, "video", bytearray(b"not-a-real-container")),
    ]
    return spark.createDataFrame(rows, "media_id long, media_type string, content binary")


def test_decode_features_uses_real_codecs(spark):
    out = {
        r["media_id"]: r
        for r in mm.decode_features(_real_media_df(spark)).collect()
    }
    # PNG: true pixel dimensions
    assert (out[1]["width"], out[1]["height"], out[1]["n_frames"]) == (8, 6, 1)
    # WAV: (sample_rate, channels, frames)
    assert (out[2]["width"], out[2]["height"], out[2]["n_frames"]) == (44100, 1, 441)
    # unknown bytes: deterministic stub (n=20 -> 16+20, 16+140, 1+20)
    assert (out[3]["width"], out[3]["height"], out[3]["n_frames"]) == (36, 156, 21)


def test_resize_images_real_png_path(spark):
    out = mm.resize_images(_real_media_df(spark), target_w=4, target_h=2).collect()
    assert len(out) == 1  # only the image row
    row = out[0]
    assert (row["width"], row["height"]) == (4, 2)
    w, h, c, px = mc.png_decode(bytes(row["content"]))
    assert (w, h, c) == (4, 2, 3)
    # nearest-neighbor of the deterministic gradient: spot-check one pixel
    src = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    assert np.array_equal(px, mc.resize_nearest(src, 4, 2))
