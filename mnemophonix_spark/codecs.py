"""Pure-NumPy image codecs (this container has no PIL/cv2).

Formats:
  - ``bmp``  : 24-bit bottom-up BGR, lossless.
  - ``png``  : 8-bit grayscale, zlib, scanline filters 0-4 on decode
               (encoder emits filter 0), lossless.
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
# PNG (8-bit grayscale)
# --------------------------------------------------------------------------

def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(gray: np.ndarray) -> bytes:
    h, w = gray.shape
    g = np.clip(gray, 0, 255).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    scanlines = np.zeros((h, 1 + w), dtype=np.uint8)
    scanlines[:, 1:] = g  # filter byte 0 per row
    idat = zlib.compress(scanlines.tobytes(), 6)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _unfilter(scan: np.ndarray, w: int, h: int, bpp: int = 1) -> np.ndarray:
    """Undo PNG scanline filters 0-4 (grayscale, 1 byte/pixel)."""
    stride = w * bpp
    mat = scan[: h * (stride + 1)].reshape(h, stride + 1)
    if not mat[:, 0].any():
        # every scanline filter 0 (what our encoder and most
        # grayscale writers emit): raw bytes, no per-row loop
        return mat[:, 1:].copy()
    out = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        f = scan[y * (stride + 1)]
        row = scan[y * (stride + 1) + 1 : (y + 1) * (stride + 1)].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(w, dtype=np.int32)
        if f == 0:
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need a left-scan
            cur = np.zeros(w, dtype=np.int32)
            left = 0
            for x in range(w):
                if f == 1:
                    val = row[x] + left
                elif f == 3:
                    val = row[x] + ((left + prev[x]) >> 1)
                else:  # Paeth
                    a, b2, c2 = left, prev[x], (prev[x - 1] if x > 0 else 0)
                    p = a + b2 - c2
                    pa, pb, pc = abs(p - a), abs(p - b2), abs(p - c2)
                    pred = a if (pa <= pb and pa <= pc) else (b2 if pb <= pc else c2)
                    val = row[x] + pred
                cur[x] = val & 0xFF
                left = cur[x]
        else:
            raise CodecError(f"bad PNG filter {f}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_MAGIC):
        raise CodecError("not a PNG")
    pos, w = len(_PNG_MAGIC), 0
    h = bit_depth = color_type = -1
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack_from(">IIBB", body, 0)[:4]
            interlace = body[12]
            if bit_depth != 8 or color_type != 0 or interlace != 0:
                raise CodecError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w <= 0 or h <= 0 or not idat:
        raise CodecError("truncated PNG")
    scan = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if scan.size != h * (w + 1):
        raise CodecError("bad PNG payload size")
    return _unfilter(scan, w, h).astype(np.float32)


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

_DECODERS = {"bmp": decode_bmp, "png": decode_png, "jpeg": decode_fake_jpeg}
_ENCODERS = {"bmp": encode_bmp, "png": encode_png, "jpeg": encode_fake_jpeg}


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


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB over 0..255 grayscale arrays."""
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
