"""Self-contained media codecs (no third-party imaging/audio wheels).

The multimodal stages (operators/multimodal.py) need real decode paths to
be more than plumbing. This environment has no PIL/pyav/librosa, but two
formats are fully decodable with the standard library alone:

- PNG: chunk walk + zlib inflate + scanline unfilter (filter types 0-4 per
  the PNG spec). The decoder covers the FULL static feature matrix:
  bit depths 1/2/4/8/16, color types 0 (gray) / 2 (RGB) / 3 (palette,
  with optional tRNS alpha) / 4 (gray+alpha) / 6 (RGBA), and Adam7
  interlacing. Output is always a (height, width, channels) uint8 array
  (16-bit samples take their high byte — the standard 16->8 downshift;
  sub-8-bit gray scales to the full 0..255 range; palette rows expand
  through PLTE). Encoding writes 8-bit filter-0 scanlines.
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

_COLORTYPE_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# legal bit depths per color type (PNG spec §11.2.2)
_COLORTYPE_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

# Adam7 pass layout: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


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


def _unfilter(raw: bytes, offset: int, height: int, stride: int, bpp: int):
    """Reverse PNG scanline filtering for ``height`` rows of ``stride``
    bytes starting at ``offset`` in ``raw`` (each row prefixed by its
    filter-type byte). Returns (rows ndarray (height, stride) uint8,
    next offset).

    Vectorized (round 10, guide §4.2): the per-byte Python loops were
    the decoder's dominant cost inside the mapInPandas stages. Every
    filter's recurrence is modular-256 arithmetic, so uint8 numpy ops
    reproduce it exactly:
      - None: the filtered bytes ARE the pixels (one reshape — the only
        path the repo's own filter-0 encoder ever produces);
      - Up (out[y] = line[y] + out[y-1]): a column-wise cumulative sum,
        wrapping in uint8 (mod-256 addition is associative, so wrap
        timing is irrelevant);
      - Sub (out[x] = line[x] + out[x-bpp]): a row-local prefix sum down
        the bpp byte lanes (stride is always a multiple of bpp: for
        depths >= 8, stride = width*channels*depth/8 and
        bpp = channels*depth/8; sub-byte depths have bpp = 1);
      - Average/Paeth: genuinely sequential nonlinear recurrences along
        x — kept as the original per-byte loops (never produced by this
        package's encoder; held by the tests/test_media_codecs.py filter
        matrix).
    Mixed-filter images process row-by-row but each Up/Sub/None row is a
    vector op; uniform filter-0 / filter-2 images take whole-image paths."""
    need = (stride + 1) * height
    if offset + need > len(raw):
        raise ValueError("PNG scanline payload size mismatch")
    block = np.frombuffer(raw, dtype=np.uint8, count=need, offset=offset)
    block = block.reshape(height, stride + 1)
    ftypes = block[:, 0]
    lines = block[:, 1:]
    bad = ftypes[ftypes > 4]
    if bad.size:
        raise ValueError(f"unknown PNG filter type {int(bad[0])}")
    if not ftypes.any():  # all None — the common case
        return lines.copy(), offset + need
    if (ftypes == 2).all():  # all Up — column cumsum mod 256
        return np.cumsum(lines, axis=0, dtype=np.uint8), offset + need
    out = np.zeros((height, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = int(ftypes[y])
        line = lines[y]
        prev = out[y - 1] if y > 0 else zero
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 1:  # Sub: prefix sum down the bpp lanes
            out[y] = np.cumsum(
                line.reshape(-1, bpp), axis=0, dtype=np.uint8
            ).reshape(-1)
        elif ftype == 2:  # Up
            out[y] = line + prev  # uint8 add wraps mod 256
        elif ftype == 3:  # Average (sequential along x — original loop)
            lb = bytearray(line.tobytes())
            for x in range(stride):
                left = lb[x - bpp] if x >= bpp else 0
                lb[x] = (lb[x] + ((left + int(prev[x])) >> 1)) & 0xFF
            out[y] = np.frombuffer(bytes(lb), dtype=np.uint8)
        else:  # Paeth (sequential along x — original loop)
            lb = bytearray(line.tobytes())
            for x in range(stride):
                left = lb[x - bpp] if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                lb[x] = (lb[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
            out[y] = np.frombuffer(bytes(lb), dtype=np.uint8)
    return out, offset + need


def _rows_to_samples(
    rows: np.ndarray, width: int, depth: int, channels: int
) -> np.ndarray:
    """(height, stride) filtered-byte rows -> (height, width, channels)
    sample array at the image's native depth (uint8 for <=8, uint16 for
    16). Sub-8-bit samples are left UNSCALED (raw 0..2^depth-1 values) —
    the caller decides between palette lookup and gray rescale."""
    height = rows.shape[0]
    if depth == 16:
        u16 = rows.reshape(height, -1).view(">u2").astype(np.uint16)
        return u16.reshape(height, width, channels)
    if depth == 8:
        return rows.reshape(height, width, channels)
    # depth 1/2/4: single-channel by spec (gray or palette indices)
    bits = np.unpackbits(rows, axis=1)
    per = bits[:, : width * depth].reshape(height, width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (per * weights).sum(axis=2).astype(np.uint8)
    return vals.reshape(height, width, 1)


def _decode_image(
    raw: bytes, offset: int, width: int, height: int, depth: int, channels: int
):
    """Unfilter + unpack one (sub)image; returns (samples, next offset)."""
    stride = (width * channels * depth + 7) // 8
    bpp = max(1, (channels * depth) // 8)
    rows, offset = _unfilter(raw, offset, height, stride, bpp)
    return _rows_to_samples(rows, width, depth, channels), offset


def png_decode(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a PNG byte string -> (width, height, channels, pixels) with
    ``pixels`` a (height, width, channels) uint8 array.

    Full static-PNG coverage: bit depths 1/2/4/8/16, color types
    0/2/3/4/6 (palette via PLTE, optional tRNS palette alpha), Adam7
    interlace. Raises ValueError on malformed streams (callers fall back
    to their stub path).
    """
    if not is_png(data):
        raise ValueError("not a PNG byte stream")
    pos = 8
    width = height = depth = color = interlace = None
    palette: np.ndarray | None = None
    trns: np.ndarray | None = None
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
            if color not in _COLORTYPE_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if depth not in _COLORTYPE_DEPTHS[color]:
                raise ValueError(
                    f"illegal PNG depth {depth} for color type {color}"
                )
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS" and color == 3:
            trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if color == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE")
    channels = _COLORTYPE_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))

    if interlace == 0:
        samples, offset = _decode_image(raw, 0, width, height, depth, channels)
        if offset != len(raw):
            raise ValueError("PNG scanline payload size mismatch")
    else:  # Adam7: seven independently-filtered sub-images, scattered
        dtype = np.uint16 if depth == 16 else np.uint8
        samples = np.zeros((height, width, channels), dtype=dtype)
        offset = 0
        for xs, ys, xstep, ystep in _ADAM7:
            pw = (width - xs + xstep - 1) // xstep
            ph = (height - ys + ystep - 1) // ystep
            if pw <= 0 or ph <= 0:
                continue
            sub, offset = _decode_image(raw, offset, pw, ph, depth, channels)
            samples[ys::ystep, xs::xstep] = sub
        if offset != len(raw):
            raise ValueError("PNG scanline payload size mismatch")

    if color == 3:  # palette expansion (indices are always <= 8-bit)
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("PNG palette index out of range")
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(len(palette), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            out = np.dstack([rgb, alpha[idx]])
        else:
            out = rgb
        return width, height, out.shape[2], out

    if depth == 16:  # high byte ~ round(v*255/65535): conventional
        # PIL-style downshift, off by at most 1 (e.g. v=0x00FF -> 0 vs 1)
        return width, height, channels, (samples >> 8).astype(np.uint8)
    if depth < 8:  # gray: scale 0..2^d-1 to the full 0..255 range
        scale = 255 // ((1 << depth) - 1)
        return width, height, channels, (samples * scale).astype(np.uint8)
    return width, height, channels, samples.astype(np.uint8)


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
    # one preallocated (height, stride+1) block instead of a per-row
    # bytes join: column 0 is the filter-0 byte, identical output bytes
    raw_arr = np.zeros((height, width * channels + 1), dtype=np.uint8)
    raw_arr[:, 1:] = flat
    raw = raw_arr.tobytes()
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
