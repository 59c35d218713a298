"""Self-contained media codecs (no third-party imaging/audio wheels).

The multimodal stages (operators/multimodal.py) need real decode paths to
be more than plumbing. This environment has no PIL/pyav/librosa, but two
formats are fully decodable with the standard library alone:

- PNG: chunk walk + zlib inflate + scanline unfilter (filter types 0-4 per
  the PNG spec), for 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced.
  Encoding writes filter-0 scanlines. This is a correct, small-image codec;
  a production build swaps in PIL for palette/16-bit/interlaced inputs,
  keeping these signatures.
- WAV: RIFF/WAVE header parse via the stdlib ``wave`` module (channel
  count, sample rate, frame count).

Everything is deterministic and dependency-free, so executor-side decode
inside mapInPandas needs no extra packages at any cluster size.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_COLORTYPE_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_SIG


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a PNG byte string -> (width, height, channels, pixels) with
    ``pixels`` a (height, width, channels) uint8 array.

    Supports 8-bit depth, color types 0/2/4/6, no interlace; raises
    ValueError otherwise (callers fall back to their stub path).
    """
    if not is_png(data):
        raise ValueError("not a PNG byte stream")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if color not in _COLORTYPE_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _COLORTYPE_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                line[x] = (line[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    return width, height, channels, out.reshape(height, width, channels)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode a (height, width, channels) uint8 array as PNG (8-bit,
    filter-0 scanlines). channels: 1=gray, 2=gray+alpha, 3=RGB, 4=RGBA."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    height, width, channels = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise ValueError(f"unsupported channel count {channels}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    flat = pixels.astype(np.uint8).reshape(height, width * channels)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(height))
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resample of (h, w, c) uint8 pixels — the
    deterministic resize used by the image stage (PIL-free)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(target_h) * h) // target_h
    xs = (np.arange(target_w) * w) // target_w
    return pixels[ys][:, xs]


def wav_info(data: bytes) -> tuple[int, int, int]:
    """(n_channels, sample_rate, n_frames) of a PCM WAV byte string."""
    with wave.open(io.BytesIO(data), "rb") as w:
        return w.getnchannels(), w.getframerate(), w.getnframes()


def wav_encode(
    samples: np.ndarray, sample_rate: int = 16000, n_channels: int = 1
) -> bytes:
    """Encode int16 samples as a PCM WAV byte string (test/generator aid)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()
