"""Pure-NumPy baseline TIFF codec (grayscale, strips).

Eighth container format for the format-agnostic ingest contract
(reference analog: ffmpeg.c:35-65 — ingest accepts anything the codec
layer decodes).  Implements the public TIFF 6.0 specification subset
that covers real-world grayscale masters:

  decode: II/MM byte order, classic 42 magic, first IFD only; strip-
          based BitsPerSample-8 grayscale (PhotometricInterpretation
          0/1, min-is-black normalization), Compression 1 (none) and
          32773 (PackBits); RGB (SamplesPerPixel 3, chunky) collapses
          by per-pixel channel MEAN (wav.c:364-374 analog).
  encode: little-endian, single strip, uncompressed 8-bit grayscale.
          Lossless, so planted exact-duplicate rows survive re-encode.

Malformed input raises ``codecs.CodecError`` for per-row quarantine
(wav.c:136-139 strict-validation analog); every offset/length is
checked before indexing.
"""

from __future__ import annotations

import struct

import numpy as np

from mnemophonix_spark.codecs import CodecError

_MAX_PIXELS = 64 << 20

# tag ids
_WIDTH, _HEIGHT = 256, 257
_BITS, _COMPRESSION, _PHOTOMETRIC = 258, 259, 262
_STRIP_OFFSETS, _SAMPLES_PER_PIXEL, _ROWS_PER_STRIP = 273, 277, 278
_STRIP_COUNTS, _PLANAR = 279, 284

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I"}


def _read_entry(data: bytes, pos: int, e: str) -> tuple[int, list[int]]:
    tag, typ, count = struct.unpack_from(e + "HHI", data, pos)
    if typ not in _TYPE_SIZE:
        return tag, []
    size = _TYPE_SIZE[typ] * count
    if size <= 4:
        raw = data[pos + 8 : pos + 8 + size]
    else:
        (off,) = struct.unpack_from(e + "I", data, pos + 8)
        if off + size > len(data):
            raise CodecError("TIFF value offset out of range")
        raw = data[off : off + size]
    fmt = _TYPE_FMT.get(typ)
    if fmt is None:
        return tag, []
    return tag, list(struct.unpack(e + fmt * count, raw))


def _packbits_decode(src: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(src)
    while i < n and len(out) < expected:
        h = src[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            if i + h + 1 > n:
                raise CodecError("truncated PackBits literal")
            out += src[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            if i >= n:
                raise CodecError("truncated PackBits repeat")
            out += bytes([src[i]]) * (257 - h)
            i += 1
        # h == 128: no-op per spec
    if len(out) < expected:
        raise CodecError("PackBits underrun")
    return bytes(out[:expected])


def decode_tiff(data: bytes) -> np.ndarray:
    """TIFF bytes -> grayscale float32 [h, w] in [0, 255] (first IFD)."""
    if len(data) < 8:
        raise CodecError("not a TIFF")
    order = data[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise CodecError("not a TIFF")
    magic, ifd_off = struct.unpack_from(e + "HI", data, 2)
    if magic != 42:
        raise CodecError("bad TIFF magic")
    if ifd_off + 2 > len(data):
        raise CodecError("IFD offset out of range")
    (n_entries,) = struct.unpack_from(e + "H", data, ifd_off)
    if ifd_off + 2 + 12 * n_entries > len(data):
        raise CodecError("truncated IFD")
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        try:
            tag, vals = _read_entry(data, ifd_off + 2 + 12 * i, e)
        except struct.error:
            raise CodecError("malformed IFD entry") from None
        if vals:
            tags[tag] = vals

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise CodecError(f"missing TIFF tag {tag}")
        return default

    w, h = one(_WIDTH), one(_HEIGHT)
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise CodecError(f"bad TIFF geometry {w}x{h}")
    spp = one(_SAMPLES_PER_PIXEL, 1)
    bits = tags.get(_BITS, [8])
    if spp not in (1, 3) or any(b != 8 for b in bits):
        raise CodecError(f"unsupported TIFF spp={spp} bits={bits}")
    if one(_PLANAR, 1) != 1:
        raise CodecError("unsupported planar TIFF")
    compression = one(_COMPRESSION, 1)
    if compression not in (1, 32773):
        raise CodecError(f"unsupported TIFF compression {compression}")
    photometric = one(_PHOTOMETRIC, 1)
    if photometric not in (0, 1, 2):
        raise CodecError(f"unsupported TIFF photometric {photometric}")
    offsets = tags.get(_STRIP_OFFSETS)
    if not offsets:
        raise CodecError("missing TIFF strip offsets")
    rows_per_strip = one(_ROWS_PER_STRIP, h)
    counts = tags.get(_STRIP_COUNTS)
    if counts is None or len(counts) != len(offsets):
        raise CodecError("missing/mismatched TIFF strip byte counts")
    row_bytes = w * spp
    raw = bytearray()
    for strip_i, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise CodecError("TIFF strip out of range")
        body = data[off : off + cnt]
        n_rows = min(rows_per_strip, h - strip_i * rows_per_strip)
        if n_rows <= 0:
            raise CodecError("extra TIFF strips beyond image height")
        expected = n_rows * row_bytes
        if compression == 32773:
            raw += _packbits_decode(body, expected)
        else:
            if cnt < expected:
                raise CodecError("TIFF strip underrun")
            raw += body[:expected]
    if len(raw) < h * row_bytes:
        raise CodecError("TIFF strips underrun image")
    px = np.frombuffer(bytes(raw[: h * row_bytes]), dtype=np.uint8)
    if spp == 3:
        img = px.reshape(h, w, 3).astype(np.float32).mean(axis=2)
    else:
        img = px.reshape(h, w).astype(np.float32)
        if photometric == 0:  # min-is-white (fax convention): invert
            img = np.float32(255.0) - img
    return img


def encode_tiff(gray: np.ndarray) -> bytes:
    """Grayscale [h, w] -> little-endian single-strip 8-bit TIFF."""
    g = np.round(np.clip(np.asarray(gray, dtype=np.float64), 0, 255)).astype(
        np.uint8
    )
    if g.ndim != 2:
        raise ValueError("encode_tiff expects a 2-D grayscale array")
    h, w = g.shape
    pixels = g.tobytes()
    # header(8) + IFD follows pixel data
    ifd_off = 8 + len(pixels)
    entries = [
        (_WIDTH, 4, 1, w),
        (_HEIGHT, 4, 1, h),
        (_BITS, 3, 1, 8),
        (_COMPRESSION, 3, 1, 1),
        (_PHOTOMETRIC, 3, 1, 1),
        (_STRIP_OFFSETS, 4, 1, 8),
        (_SAMPLES_PER_PIXEL, 3, 1, 1),
        (_ROWS_PER_STRIP, 4, 1, h),
        (_STRIP_COUNTS, 4, 1, len(pixels)),
    ]
    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out += pixels
    out += struct.pack("<H", len(entries))
    for tag, typ, count, val in entries:
        out += struct.pack("<HHII", tag, typ, count, val)
    out += struct.pack("<I", 0)  # no next IFD
    return bytes(out)
