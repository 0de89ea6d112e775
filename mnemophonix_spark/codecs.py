"""Pure-NumPy image codecs (this container has no PIL/cv2).

Formats:
  - ``bmp``  : 24-bit bottom-up BGR, lossless.
  - ``png``  : 8-bit, zlib, scanline filters 0-4 on decode; every
               8-bit color type decodes (gray, RGB, palette,
               gray+alpha, RGBA — color planes unfilter per channel
               and collapse by channel mean).  Encoder emits
               grayscale filter 0 (plus color types for tests via
               ``encode_png_color``), lossless.
  - ``pgm``  : netpbm P5 (binary) / P2 (ASCII) grayscale, maxval 255,
               comment-tolerant header, lossless.
  - ``jpeg`` : DETERMINISTIC FAKE LOSSY CODEC.  Real JPEG needs libjpeg,
               which is not in this container, so per the build rules the
               decode is replaced by a deterministic fake: uniform pixel
               quantization (step q) inside a magic-tagged PNG container.
               q=2 ("quality 95") gives PSNR ~52.9 dB, q=4 ("quality 90")
               ~46.9 dB — both exercise the lossy PSNR>=40 dB verification
               path (BASELINE.json input_hint).  The Spark-side plumbing
               (binary column in, decode inside Arrow batches, quarantine
               on failure) is real and tested; only the bitstream format
               is the stand-in.

Decode mirrors the reference's strict source validation: wav.c:136-139
rejects malformed fmt chunks, wav.c:88-106 walks RIFF chunks; here each
decoder validates magic + geometry and raises ``CodecError`` so the scan
operator can quarantine the row (SURVEY.md §2.1).

Multi-channel decode collapses to grayscale by per-pixel channel MEAN —
the analog of the reference's channel mixdown ``sum/channels`` at
wav.c:364-374 (the batch path; the mic path's unsigned-average bug at
wav.c:319-325 is deliberately NOT reproduced, SURVEY.md §2.4).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class CodecError(ValueError):
    """Raised on malformed image bytes; rows are quarantined, not fatal."""


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_FJPG_MAGIC = b"FJPG"  # fake-jpeg container tag


# --------------------------------------------------------------------------
# BMP (24-bit BGR, bottom-up)
# --------------------------------------------------------------------------

def encode_bmp(gray: np.ndarray) -> bytes:
    h, w = gray.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    g = np.clip(gray, 0, 255).astype(np.uint8)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    bgr = np.repeat(g[:, :, None], 3, axis=2)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    return header + rows[::-1].tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    if len(data) < 54 or data[:2] != b"BM":
        raise CodecError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise CodecError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0 or w <= 0:
        raise CodecError(f"unsupported BMP variant bpp={bpp}")
    flip = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    if offset + row_size * h > len(data):
        raise CodecError("truncated BMP")
    raw = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if flip:
        rows = rows[::-1]
    # channel-mean mixdown (wav.c:364-374 analog)
    return rows.astype(np.float32).mean(axis=2)


# --------------------------------------------------------------------------
# PGM (netpbm P5/P2, 8-bit grayscale) — a third REAL container format
# --------------------------------------------------------------------------

def encode_pgm(gray: np.ndarray, binary: bool = True) -> bytes:
    """8-bit grayscale netpbm: P5 (binary) or P2 (ASCII)."""
    h, w = gray.shape
    g = np.clip(gray, 0, 255).astype(np.uint8)
    if binary:
        return f"P5\n{w} {h}\n255\n".encode() + g.tobytes()
    body = "\n".join(" ".join(str(int(v)) for v in row) for row in g)
    return f"P2\n{w} {h}\n255\n{body}\n".encode()


def _pgm_tokens(data: bytes, n_needed: int) -> tuple[list[bytes], int]:
    """First ``n_needed`` whitespace tokens after the magic, skipping
    ``#`` comment lines (netpbm spec); returns (tokens, offset past the
    single whitespace byte that terminates the last token)."""
    toks: list[bytes] = []
    i, n = 2, len(data)
    while len(toks) < n_needed and i < n:
        c = data[i : i + 1]
        if c == b"#":
            while i < n and data[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not data[j : j + 1].isspace() and data[j : j + 1] != b"#":
                j += 1
            toks.append(data[i:j])
            i = j
    if len(toks) < n_needed:
        raise CodecError("truncated PGM header")
    return toks, i + 1  # consume exactly ONE whitespace after maxval (spec)


def decode_pgm(data: bytes) -> np.ndarray:
    """Strict netpbm grayscale decode (P5 binary, P2 ASCII), maxval 255.

    Real-format coverage beyond BMP/PNG: the header grammar (comments,
    arbitrary whitespace, single post-maxval delimiter before the P5
    raster) is the part foreign files actually vary in.
    """
    magic = data[:2]
    if magic not in (b"P5", b"P2"):
        raise CodecError("not a PGM")
    toks, off = _pgm_tokens(data, 3)
    try:
        w, h, maxval = (int(t) for t in toks)
    except ValueError:
        raise CodecError("bad PGM header") from None
    if w <= 0 or h <= 0:
        raise CodecError("bad PGM geometry")
    if maxval != 255:
        raise CodecError(f"unsupported PGM maxval {maxval}")
    if magic == b"P5":
        if off + w * h > len(data):
            raise CodecError("truncated PGM raster")
        raw = np.frombuffer(data, dtype=np.uint8, count=w * h, offset=off)
        return raw.reshape(h, w).astype(np.float32)
    vals = np.array(data[off - 1 :].split(), dtype=np.int64)
    if vals.size != w * h:
        raise CodecError("bad PGM sample count")
    if vals.min(initial=0) < 0 or vals.max(initial=0) > maxval:
        raise CodecError("PGM sample out of range")
    return vals.reshape(h, w).astype(np.float32)


# --------------------------------------------------------------------------
# PNG (8-bit grayscale)
# --------------------------------------------------------------------------

def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(gray: np.ndarray, row_filters=None) -> bytes:
    """8-bit grayscale PNG.  ``row_filters`` (None = all 0) is an
    optional per-row array of filter types 0-4 — used to produce
    corpora that exercise the Sub/Up/Average/Paeth decode paths the
    way real-world encoders do (adaptive per-row filtering)."""
    h, w = gray.shape
    g = np.clip(gray, 0, 255).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    scanlines = np.zeros((h, 1 + w), dtype=np.uint8)
    if row_filters is None:
        scanlines[:, 1:] = g  # filter byte 0 per row
    else:
        f = np.asarray(row_filters, dtype=np.uint8)
        if f.shape != (h,) or f.max(initial=0) > 4:
            raise CodecError("bad row_filters")
        cur = g.astype(np.int32)
        up = np.zeros((h, w), dtype=np.int32)
        up[1:] = cur[:-1]
        left = np.zeros((h, w), dtype=np.int32)
        left[:, 1:] = cur[:, :-1]
        ul = np.zeros((h, w), dtype=np.int32)
        ul[1:, 1:] = cur[:-1, :-1]
        pred = np.select(
            [f[:, None] == 1, f[:, None] == 2, f[:, None] == 3, f[:, None] == 4],
            [left, up, (left + up) >> 1, _paeth(left, up, ul)],
            default=0,
        )
        scanlines[:, 0] = f
        scanlines[:, 1:] = ((cur - pred) & 0xFF).astype(np.uint8)
    idat = zlib.compress(scanlines.tobytes(), 6)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def encode_png_color(img: np.ndarray, color_type: int = 2,
                     palette: np.ndarray | None = None,
                     row_filters=None) -> bytes:
    """Color PNG encoder (decode-side test vectors; filter 0 or a
    per-row mix like ``encode_png``).

    ``img``: [h, w, 3] RGB for type 2; [h, w, 4] RGBA for type 6;
    [h, w] palette indices (with ``palette`` [n, 3]) for type 3;
    [h, w, 2] gray+alpha for type 4.
    """
    arr = np.asarray(img)
    if color_type == 3:
        if palette is None or arr.ndim != 2:
            raise ValueError("type 3 needs [h, w] indices + palette")
        h, w = arr.shape
        pix = arr.astype(np.uint8)[:, :, None]
    else:
        bpp = _PNG_CHANNELS[color_type]
        if arr.ndim != 3 or arr.shape[2] != bpp:
            raise ValueError(f"type {color_type} needs [h, w, {bpp}]")
        h, w = arr.shape[:2]
        pix = np.clip(arr, 0, 255).astype(np.uint8)
    bpp = pix.shape[2]
    flat = pix.reshape(h, w * bpp).astype(np.int32)
    scan = np.zeros((h, w * bpp + 1), dtype=np.uint8)
    if row_filters is None:
        scan[:, 1:] = flat
    else:
        f = np.asarray(row_filters, dtype=np.uint8)
        if f.shape != (h,) or f.max(initial=0) > 4:
            raise CodecError("bad row_filters")
        up = np.zeros_like(flat)
        up[1:] = flat[:-1]
        left = np.zeros_like(flat)
        left[:, bpp:] = flat[:, :-bpp]
        ul = np.zeros_like(flat)
        ul[1:, bpp:] = flat[:-1, :-bpp]
        pred = np.select(
            [f[:, None] == 1, f[:, None] == 2, f[:, None] == 3, f[:, None] == 4],
            [left, up, (left + up) >> 1, _paeth(left, up, ul)],
            default=0,
        )
        scan[:, 0] = f
        scan[:, 1:] = ((flat - pred) & 0xFF).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    chunks = _PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
    if color_type == 3:
        chunks += _png_chunk(b"PLTE", np.asarray(palette, dtype=np.uint8).tobytes())
    chunks += _png_chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
    return chunks + _png_chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec 9.4): nearest of a/b/c to
    a+b-c, ties broken a, then b."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _unfilter(scan: np.ndarray, w: int, h: int, bpp: int = 1) -> np.ndarray:
    """Undo PNG scanline filters 0-4 (grayscale, 1 byte/pixel) — fully
    vectorized, no per-pixel Python.

    Three tiers by what the file actually uses:
    - all filter 0 (our encoder, many grayscale writers): one reshape;
    - filters {0,1} only: no inter-row dependency — filter-1 rows are
      a mod-256 prefix sum, one batched cumsum for all of them;
    - general mix: anti-diagonal wavefront.  Cell (y,x) depends only on
      (y,x-1), (y-1,x), (y-1,x-1), so every cell on diagonal d = x+y is
      computable at once from diagonals d-1 and d-2 — O(h+w) vector
      steps instead of O(h*w) Python iterations, any per-row filter mix.
    """
    stride = w * bpp
    mat = scan[: h * (stride + 1)].reshape(h, stride + 1)
    filters = mat[:, 0]
    if filters.max(initial=0) > 4:
        raise CodecError(f"bad PNG filter {int(filters.max())}")
    data = mat[:, 1:]
    if not filters.any():
        return data.copy()
    if filters.max() <= 2:
        # {0,1,2} only — no Average/Paeth, so nothing is sequential in
        # x given mod-256 prefix sums: filter-0/1 rows are independent
        # (1 = horizontal cumsum), and each maximal run of consecutive
        # filter-2 rows is a vertical cumsum on top of the row above.
        acc = np.cumsum(data.astype(np.uint32), axis=1, dtype=np.uint32) & 0xFF
        out = np.where(filters[:, None] == 1, acc, data).astype(np.uint32)
        is_up = filters == 2
        y = 0
        while y < h:
            if not is_up[y]:
                y += 1
                continue
            end = y
            while end < h and is_up[end]:
                end += 1
            base = out[y - 1] if y > 0 else np.zeros(w, dtype=np.uint32)
            out[y:end] = (
                base + np.cumsum(out[y:end], axis=0, dtype=np.uint32)
            ) & 0xFF
            y = end
        return out.astype(np.uint8)
    # General mix: anti-diagonal wavefront over a zero-padded buffer.
    # In the flat padded array, the cells of diagonal d and their
    # left/up/up-left neighbors are all arithmetic progressions of
    # stride w, so every step is plain strided slicing — no index
    # arrays, no boundary masks (the pad row/column supplies the
    # spec's zero priors).
    pad = np.zeros((h + 1) * (w + 1), dtype=np.int32)
    padf = pad  # flat view; cell (y, x) lives at (y+1)*(w+1) + x + 1
    row = data.astype(np.int32).reshape(-1)  # flat [h*w]; (y,x) at y*w+x
    f = filters.astype(np.int32)
    any4 = bool((f == 4).any())
    uniform = int(f[0]) if (f == f[0]).all() else -1
    for d in range(h + w - 1):
        y0 = max(0, d - w + 1)
        y1 = min(h, d + 1)
        cnt = y1 - y0
        cur = slice((w + d + 2) + y0 * w, (w + d + 2) + y1 * w, w)
        left = padf[(w + 1 + d) + y0 * w : (w + 1 + d) + y1 * w : w]
        up = padf[(d + 1) + y0 * w : (d + 1) + y1 * w : w]
        fd = f[y0:y1]
        if w > 1:  # flat (y, d-y) = y*(w-1) + d: stride w-1
            raw = row[d + y0 * (w - 1) : d + y1 * (w - 1) : w - 1]
        else:  # single column: diagonal d holds exactly cell (d, 0)
            raw = row[y0:y1]
        if uniform == 4:
            pred = _paeth(left, up, padf[d + y0 * w : d + y1 * w : w])
        elif uniform == 3:
            pred = (left + up) >> 1
        elif any4:
            ul = padf[d + y0 * w : d + y1 * w : w]
            pred = np.select(
                [fd == 1, fd == 2, fd == 3, fd == 4],
                [left, up, (left + up) >> 1, _paeth(left, up, ul)],
                default=0,
            )
        else:
            pred = np.select(
                [fd == 1, fd == 2, fd == 3],
                [left, up, (left + up) >> 1],
                default=0,
            )
        padf[cur] = (raw[:cnt] + pred[:cnt]) & 0xFF
    return pad.reshape(h + 1, w + 1)[1:, 1:].astype(np.uint8)


# PNG color type -> bytes per pixel at bit depth 8
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_png_full(
    data: bytes,
) -> tuple[np.ndarray, int, int, int, np.ndarray | None]:
    """Container parse + inflate: (scanlines, w, h, color_type, palette).

    Accepts every 8-bit non-interlaced color type (0 gray, 2 RGB,
    3 palette, 4 gray+alpha, 6 RGBA); scanlines are the raw filtered
    bytes, ``h * (w*bpp + 1)`` of them.
    """
    if not data.startswith(_PNG_MAGIC):
        raise CodecError("not a PNG")
    pos, w = len(_PNG_MAGIC), 0
    h = color_type = -1
    idat = b""
    palette: np.ndarray | None = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            if len(body) < 13:
                raise CodecError("truncated IHDR")
            w, h, bit_depth, color_type = struct.unpack_from(">IIBB", body, 0)[:4]
            interlace = body[12]
            if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
                raise CodecError("unsupported PNG variant")
        elif tag == b"PLTE":
            if len(body) % 3 or not body:
                raise CodecError("bad PLTE length")
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w <= 0 or h <= 0 or not idat or color_type < 0:
        raise CodecError("truncated PNG")
    if w * h > 64 << 20:
        raise CodecError(f"bad PNG geometry {w}x{h}")
    bpp = _PNG_CHANNELS[color_type]
    try:
        scan = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    except zlib.error as e:
        raise CodecError(f"bad PNG deflate stream: {e}") from None
    if scan.size != h * (w * bpp + 1):
        raise CodecError("bad PNG payload size")
    return scan, w, h, color_type, palette


def _parse_png(data: bytes) -> tuple[np.ndarray, int, int]:
    """Grayscale-only parse (the graded corpus path); color types
    raise so batch callers route them to ``decode_png`` per-row."""
    scan, w, h, color_type, _ = _parse_png_full(data)
    if color_type != 0:
        raise CodecError("unsupported PNG variant")
    return scan, w, h


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> grayscale float32 [h, w]; every 8-bit color type.

    Color types beyond grayscale unfilter PER CHANNEL — PNG's Sub/
    Average/Paeth reference the corresponding byte one whole pixel
    left, so each channel plane is exactly the grayscale problem the
    vectorized tiers already solve.  RGB/palette collapse by per-pixel
    channel MEAN (wav.c:364-374 analog); alpha channels are ignored
    (the mixdown contract is content, not compositing).
    """
    scan, w, h, color_type, palette = _parse_png_full(data)
    if color_type == 0:
        return _unfilter(scan, w, h).astype(np.float32)
    bpp = _PNG_CHANNELS[color_type]
    mat = scan.reshape(h, w * bpp + 1)
    filters = mat[:, 0]
    pixels = mat[:, 1:].reshape(h, w, bpp)
    planes = np.empty((bpp, h, w), dtype=np.uint8)
    for c in range(bpp):
        # per-channel scanlines with the shared per-row filter bytes
        chan = np.empty((h, w + 1), dtype=np.uint8)
        chan[:, 0] = filters
        chan[:, 1:] = pixels[:, :, c]
        planes[c] = _unfilter(chan.reshape(-1), w, h)
    if color_type == 3:
        if palette is None:
            raise CodecError("palette PNG without PLTE")
        idx = planes[0]
        if int(idx.max(initial=0)) >= len(palette):
            raise CodecError("palette index out of range")
        return palette[idx].astype(np.float32).mean(axis=2)
    if color_type == 4:  # gray + alpha: gray plane is the content
        return planes[0].astype(np.float32)
    # RGB / RGBA: mean of the three color channels
    return (
        planes[:3].astype(np.float32).mean(axis=0)
    )


def _unfilter_batch(scans: np.ndarray, w: int, h: int) -> np.ndarray:
    """Batched general-mix unfilter: scans [k, h*(w+1)] -> [k, h, w].

    Same anti-diagonal wavefront as ``_unfilter``'s general tier with a
    leading image axis: each of the O(h+w) Python-dispatched steps now
    advances ALL k same-shape images at once, so the per-step
    interpreter overhead — which dominates at 128x128 (255 steps of
    ~128-element slices) — amortizes k-fold.  Semantically identical to
    per-image ``_unfilter`` (parity-pinned by pytest).
    """
    k = scans.shape[0]
    mat = scans.reshape(k, h, w + 1)
    filters = mat[:, :, 0]
    if filters.max(initial=0) > 4:
        raise CodecError(f"bad PNG filter {int(filters.max())}")
    data = mat[:, :, 1:]
    pad = np.zeros((k, (h + 1) * (w + 1)), dtype=np.int32)
    row = np.ascontiguousarray(data).astype(np.int32).reshape(k, -1)
    f = filters.astype(np.int32)
    any4 = bool((f == 4).any())
    uniform = int(f.flat[0]) if (f == f.flat[0]).all() else -1
    for d in range(h + w - 1):
        y0 = max(0, d - w + 1)
        y1 = min(h, d + 1)
        cnt = y1 - y0
        cur = slice((w + d + 2) + y0 * w, (w + d + 2) + y1 * w, w)
        left = pad[:, (w + 1 + d) + y0 * w : (w + 1 + d) + y1 * w : w]
        up = pad[:, (d + 1) + y0 * w : (d + 1) + y1 * w : w]
        fd = f[:, y0:y1]
        if w > 1:  # flat (y, d-y) = y*(w-1) + d: stride w-1
            raw = row[:, d + y0 * (w - 1) : d + y1 * (w - 1) : w - 1]
        else:
            raw = row[:, y0:y1]
        if uniform == 4:
            pred = _paeth(left, up, pad[:, d + y0 * w : d + y1 * w : w])
        elif uniform == 3:
            pred = (left + up) >> 1
        elif any4:
            ul = pad[:, d + y0 * w : d + y1 * w : w]
            pred = np.select(
                [fd == 1, fd == 2, fd == 3, fd == 4],
                [left, up, (left + up) >> 1, _paeth(left, up, ul)],
                default=0,
            )
        else:
            pred = np.select(
                [fd == 1, fd == 2, fd == 3],
                [left, up, (left + up) >> 1],
                default=0,
            )
        pad[:, cur] = (raw[:, :cnt] + pred[:, :cnt]) & 0xFF
    return pad.reshape(k, h + 1, w + 1)[:, 1:, 1:].astype(np.uint8)


# --------------------------------------------------------------------------
# fake JPEG: quantized grayscale in a tagged PNG container
# --------------------------------------------------------------------------

def encode_fake_jpeg(gray: np.ndarray, quality: int = 95) -> bytes:
    """Deterministic lossy stand-in: quantize to step q then PNG-pack.

    quality 95 -> q=2 (PSNR ~52.9 dB); quality 90 -> q=4 (~46.9 dB).
    """
    q = 2 if quality >= 95 else 4
    g = np.clip(gray, 0, 255).astype(np.float64)
    quantized = np.clip(np.round(g / q) * q, 0, 255)
    return _FJPG_MAGIC + bytes([q]) + encode_png(quantized)


def decode_fake_jpeg(data: bytes) -> np.ndarray:
    if not data.startswith(_FJPG_MAGIC):
        raise CodecError("not a fake-jpeg")
    return decode_png(data[len(_FJPG_MAGIC) + 1 :])


# --------------------------------------------------------------------------
# WAV (strict 16-bit 44100 Hz integer PCM — the reference's native input)
# --------------------------------------------------------------------------

_WAV_RATE = 44100


def encode_wav(
    samples: np.ndarray,
    rate: int = _WAV_RATE,
    artist: str | None = None,
    title: str | None = None,
    album: str | None = None,
) -> bytes:
    """int16[n, channels] -> RIFF/WAVE bytes, with an optional LIST INFO
    chunk after the data chunk carrying IART/INAM/IPRD metadata
    (the layout wav.c:188-255 reads)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    block_align = 2 * ch
    data = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * block_align, block_align, 16
    )
    info = b""
    fields = [(b"IART", artist), (b"INAM", title), (b"IPRD", album)]
    body = b"".join(
        tag + struct.pack("<I", len(v.encode())) + v.encode()
        for tag, v in fields
        if v is not None
    )
    if body:
        info = b"LIST" + struct.pack("<I", 4 + len(body)) + b"INFO" + body
    payload = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + info
    )
    return b"RIFF" + struct.pack("<I", len(payload)) + payload


def decode_wav(data: bytes) -> tuple[np.ndarray, dict[str, str | None]]:
    """Strict WAV parse (wav.c:88-299): returns (int16[n, channels],
    {artist, title, album}).

    Validation mirrors the reference exactly: RIFF/WAVE magic
    (wav.c:88-106), fmt chunk first with wFormatTag==1, chunk size 16,
    44100 Hz, 16-bit (wav.c:136-139 — anything else is rejected), walk
    unknown chunks to 'data' (wav.c:158-178), then an optional
    LIST/INFO chunk AFTER data for IART/INAM/IPRD (wav.c:188-255).
    Raises CodecError so the scan operator quarantines the row.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise CodecError("not a WAVE file")
    pos = 12
    if len(data) < pos + 8 or data[pos : pos + 4] != b"fmt ":
        raise CodecError("missing fmt chunk")
    (fmt_size,) = struct.unpack_from("<I", data, pos + 4)
    if fmt_size < 16 or pos + 8 + fmt_size > len(data):
        raise CodecError("truncated fmt chunk")
    tag, ch, rate, _avg, block_align, bits = struct.unpack_from(
        "<HHIIHH", data, pos + 8
    )
    if tag != 1 or fmt_size != 16 or rate != _WAV_RATE or bits != 16:
        raise CodecError(
            f"unsupported wave format tag={tag} rate={rate} bits={bits}"
        )
    if ch == 0 or block_align != 2 * ch:
        raise CodecError("bad channel layout")
    pos += 8 + fmt_size
    # walk optional chunks to 'data' (wav.c:158-178)
    while True:
        if pos + 8 > len(data):
            raise CodecError("no data chunk")
        ctag = data[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", data, pos + 4)
        pos += 8
        if ctag == b"data":
            break
        pos += csize
    if pos + csize > len(data):
        raise CodecError("truncated data chunk")
    n = csize // block_align
    samples = (
        np.frombuffer(data, dtype="<i2", count=n * ch, offset=pos)
        .reshape(n, ch)
        .copy()
    )
    meta: dict[str, str | None] = {"artist": None, "title": None, "album": None}
    # optional LIST INFO after data (wav.c:188-255)
    ipos = pos + csize
    if ipos + 12 <= len(data) and data[ipos : ipos + 4] == b"LIST":
        (lsize,) = struct.unpack_from("<I", data, ipos + 4)
        if data[ipos + 8 : ipos + 12] == b"INFO":
            j, end = ipos + 12, min(ipos + 8 + lsize, len(data))
            keys = {b"IART": "artist", b"INAM": "title", b"IPRD": "album"}
            while j + 8 <= end:
                ftag = data[j : j + 4]
                (fsize,) = struct.unpack_from("<I", data, j + 4)
                j += 8
                if ftag in keys and j + fsize <= end:
                    meta[keys[ftag]] = data[j : j + fsize].split(b"\x00")[0].decode(
                        "utf-8", "replace"
                    )
                j += fsize
    return samples, meta


def mixdown(samples: np.ndarray) -> np.ndarray:
    """int16[n, channels] -> mono float32[n] in [-1, 1]: per-sample
    channel sum / channels / 32767.0, the signed batch-path mixdown of
    wav.c:358-374 (the mic path's unsigned-average bug at wav.c:319-325
    is deliberately not reproduced)."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    acc = s.astype(np.int32).sum(axis=1)
    return (
        (acc.astype(np.float32) / np.float32(s.shape[1])) / np.float32(32767.0)
    ).astype(np.float32)


# --------------------------------------------------------------------------
# dispatch
# --------------------------------------------------------------------------

def _decode_jfif(data: bytes) -> np.ndarray:
    from mnemophonix_spark import jfif

    return jfif.decode_jfif(data)


def _encode_jfif(gray: np.ndarray, quality: int = 90,
                 restart_interval: int = 1) -> bytes:
    from mnemophonix_spark import jfif

    return jfif.encode_jfif(gray, quality, restart_interval=restart_interval)


def _decode_webp(data: bytes) -> np.ndarray:
    from mnemophonix_spark import webp

    return webp.decode_webp(data)


def _decode_gif(data: bytes) -> np.ndarray:
    from mnemophonix_spark import gif

    return gif.decode_gif(data)


def _decode_tiff(data: bytes) -> np.ndarray:
    from mnemophonix_spark import tiff

    return tiff.decode_tiff(data)


def _encode_tiff(gray: np.ndarray) -> bytes:
    from mnemophonix_spark import tiff

    return tiff.encode_tiff(gray)


def _encode_gif(gray: np.ndarray) -> bytes:
    from mnemophonix_spark import gif

    return gif.encode_gif(gray)


def _encode_webp(img: np.ndarray, **kw) -> bytes:
    from mnemophonix_spark import webp

    return webp.encode_webp(np.round(np.clip(img, 0, 255)).astype(np.uint8),
                            **kw)


_DECODERS = {
    "bmp": decode_bmp,
    "png": decode_png,
    "jpeg": decode_fake_jpeg,
    "pgm": decode_pgm,
    # REAL baseline JPEG (T.81 grayscale, mnemophonix_spark.jfif) —
    # its own format key so the FJPG-based `jpeg` corpus fixtures stay
    # byte-stable while a genuine lossy bitstream is supported
    "jfif": _decode_jfif,
    # REAL WebP lossless (VP8L, RFC 9649, mnemophonix_spark.webp)
    "webp": _decode_webp,
    # REAL GIF87a/89a (LZW, mnemophonix_spark.gif)
    "gif": _decode_gif,
    # REAL TIFF 6.0 grayscale subset (mnemophonix_spark.tiff)
    "tiff": _decode_tiff,
}
_ENCODERS = {
    "bmp": encode_bmp,
    "png": encode_png,
    "jpeg": encode_fake_jpeg,
    "pgm": encode_pgm,
    "jfif": _encode_jfif,
    "webp": _encode_webp,
    "gif": _encode_gif,
    "tiff": _encode_tiff,
}


def decode(data: bytes, fmt: str) -> np.ndarray:
    """bytes + fmt -> grayscale float32 [h, w] in [0, 255].

    Raises CodecError on malformed input (caller quarantines the row,
    mirroring the reference's strict validation at wav.c:136-139).
    """
    try:
        dec = _DECODERS[fmt]
    except KeyError:
        raise CodecError(f"unknown fmt {fmt!r}") from None
    return dec(data)


def encode(gray: np.ndarray, fmt: str, **kw) -> bytes:
    return _ENCODERS[fmt](gray, **kw)


def decode_batch(
    payloads: list[bytes], fmts: list[str]
) -> list[np.ndarray | CodecError]:
    """Batch decode for the Arrow hot path: per-row results in input
    order, with malformed rows returned as ``CodecError`` values (the
    caller quarantines them — same contract as per-row ``decode`` under
    try/except).

    Per-image cost on trivially-filtered PNGs (our encoder, filter 0-2)
    is already a few closed-form NumPy calls; the win here is for
    foreign PNGs using Average/Paeth rows, whose wavefront decode is
    dominated by per-diagonal Python dispatch: those are grouped by
    (h, w) and run through ``_unfilter_batch`` so the O(h+w) dispatched
    steps amortize across every same-shape image in the batch.
    """
    n = len(payloads)
    results: list[np.ndarray | CodecError | None] = [None] * n
    groups: dict[tuple[int, int], list[tuple[int, np.ndarray]]] = {}
    jfif_idx: list[int] = []
    webp_idx: list[int] = []
    for i in range(n):
        data, fmt = payloads[i], fmts[i]
        try:
            if fmt == "bmp":
                results[i] = decode_bmp(data)
                continue
            if fmt == "pgm":
                results[i] = decode_pgm(data)
                continue
            if fmt == "gif":
                # LZW decode is already fully vectorized per image
                # (segment gathers + pointer doubling, gif.py); no
                # cross-image amortization left worth grouping for
                results[i] = _decode_gif(data)
                continue
            if fmt == "tiff":
                results[i] = _decode_tiff(data)
                continue
            if fmt == "jfif":
                jfif_idx.append(i)
                continue
            if fmt == "webp":
                webp_idx.append(i)
                continue
            if fmt == "jpeg":
                if not data.startswith(_FJPG_MAGIC):
                    raise CodecError("not a fake-jpeg")
                data = data[len(_FJPG_MAGIC) + 1 :]
            elif fmt != "png":
                raise CodecError(f"unknown fmt {fmt!r}")
            elif len(data) > 25 and data[25] != 0:
                # color-type byte in the (always-first) IHDR chunk:
                # color PNGs take the per-row per-channel path; the
                # grouped wavefront below stays grayscale-only
                results[i] = decode_png(data)
                continue
            scan, w, h = _parse_png(data)
            filters = scan[: h * (w + 1)].reshape(h, w + 1)[:, 0]
            if filters.max(initial=0) > 4:
                raise CodecError(f"bad PNG filter {int(filters.max())}")
            if filters.max(initial=0) <= 2:
                # closed-form tiers: no dispatch overhead worth batching
                results[i] = _unfilter(scan, w, h).astype(np.float32)
            else:
                groups.setdefault((h, w), []).append((i, scan))
        except CodecError as e:
            results[i] = e
    for (h, w), items in groups.items():
        if len(items) == 1:
            i, scan = items[0]
            results[i] = _unfilter(scan, w, h).astype(np.float32)
            continue
        outs = _unfilter_batch(np.stack([s for _, s in items]), w, h)
        for j, (i, _) in enumerate(items):
            results[i] = outs[j].astype(np.float32)
    if webp_idx:
        from mnemophonix_spark import webp as _webp

        # flat8-shape rows (the corpus encoder default) batch into one
        # unpackbits + matvec pass per (h, w) group inside
        # decode_webp_gray_batch; foreign shapes decode per-image
        # inside it.  A CodecError out of the batch (malformed row)
        # drops every webp row to the per-row loop so quarantine stays
        # per-row — same recovery pattern as the jfif group below.
        try:
            outs_w = _webp.decode_webp_gray_batch(
                [payloads[i] for i in webp_idx]
            )
            for i, out in zip(webp_idx, outs_w):
                results[i] = out
        except CodecError:
            for i in webp_idx:
                try:
                    results[i] = _decode_webp(payloads[i])
                except CodecError as e:
                    results[i] = e
    if jfif_idx:
        from mnemophonix_spark import jfif as _jfif

        # the batch's grayscale-SOF0 JFIF rows decode through ONE
        # lockstep pass (every restart segment a lane of the same
        # vectorized state machine); color / progressive / headerless
        # rows are routed per-image up front by a cheap header probe —
        # otherwise one such row would abort the joint pass and push
        # EVERY jfif row in the batch onto the slow path.  A malformed
        # stream that still slips into the joint pass aborts it, and
        # those rows fall back to per-image decode so quarantine stays
        # per-row.
        gray_idx: list[int] = []
        color_idx: list[int] = []
        slow_idx: list[int] = []
        for i in jfif_idx:
            m, nc = _jfif._sof_info(payloads[i])
            if m == 0xFFC0 and nc == 1:
                gray_idx.append(i)
            elif m == 0xFFC0 and nc == 3:
                color_idx.append(i)
            else:
                slow_idx.append(i)
        if gray_idx:
            try:
                outs2 = _jfif.decode_jfif_batch([payloads[i] for i in gray_idx])
                for i, out in zip(gray_idx, outs2):
                    results[i] = out
            except CodecError:
                slow_idx.extend(gray_idx)
        if color_idx:
            try:
                outs3 = _jfif.decode_jfif_color_batch(
                    [payloads[i] for i in color_idx]
                )
                for i, out in zip(color_idx, outs3):
                    # channel-mean mixdown, same luma path as decode_jfif
                    results[i] = out.mean(axis=2).astype(np.float32)
            except CodecError:
                slow_idx.extend(color_idx)
        for i in slow_idx:
            if results[i] is None:
                try:
                    results[i] = _jfif.decode_jfif(payloads[i])
                except CodecError as e:
                    results[i] = e
    return results  # type: ignore[return-value]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB over 0..255 grayscale arrays."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
