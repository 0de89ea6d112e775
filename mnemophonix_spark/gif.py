"""Pure-Python/NumPy GIF codec (GIF87a/89a, LZW).

Seventh real container format for the format-agnostic ingest contract
(reference analog: ffmpeg.c:35-65 — the reference accepts anything
ffmpeg decodes; this engine accepts anything its codec layer decodes,
and GIF is the classic legacy web format).  Implements the public
CompuServe/W3C GIF89a specification from scratch:

  decode: header + logical screen descriptor, global/local color
          tables, extension-block skipping (GCE/comment/app/plain
          text), FIRST image frame only, variable-width LSB-first LZW
          with clear/EOI handling and 12-bit table cap, 4-pass
          interlace reorder, palette lookup, per-pixel channel-MEAN
          mixdown to grayscale (the project-wide wav.c:364-374 analog).
  encode: GIF87a, 256-entry grayscale global palette, single
          non-interlaced frame, real LZW (dict keyed on
          (prefix_code, byte)), table reset at 4096.  Lossless for
          8-bit grayscale, so planted exact-duplicate rows survive
          re-encode byte-for-value.

Malformed input raises ``codecs.CodecError`` so the Arrow scan
quarantines the row (wav.c:136-139 strict-validation analog); every
length is checked before indexing/unpacking, per the round-3 advisory
on quarantine escapes.
"""

from __future__ import annotations

import struct

import numpy as np

from mnemophonix_spark.codecs import CodecError

_MAX_PIXELS = 64 << 20  # geometry sanity bound, checked before LZW

# shared ramp for the vectorized code-extraction / back-reference paths;
# grown on demand, read-only slices handed out
_ARANGE = np.arange(1 << 16, dtype=np.int64)


def _arange(n: int) -> np.ndarray:
    global _ARANGE
    if n > _ARANGE.size:
        _ARANGE = np.arange(max(n, 2 * _ARANGE.size), dtype=np.int64)
    return _ARANGE[:n]


# --------------------------------------------------------------------------
# LZW
# --------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF variable-width LSB-first LZW decode, bounded at n_pixels."""
    # palette indices are at most 255, so pixel data caps the min code
    # size at 8; larger values would let literal codes >= 256 through
    # (round-4 advisory: the fast path wrapped them mod 256 silently)
    if not 2 <= min_code_size <= 8:
        raise CodecError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    out = bytearray()
    buf = 0
    nbits = 0
    pos = 0
    n = len(data)
    prev: bytes | None = None
    while True:
        while nbits < code_size and pos < n:
            buf |= data[pos] << nbits
            nbits += 8
            pos += 1
        if nbits < code_size:
            break  # stream ran out without EOI; accept what we have
        code = buf & ((1 << code_size) - 1)
        buf >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise CodecError("LZW code before any literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise CodecError(f"LZW code {code} out of range")
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        out += entry
        prev = entry
        if len(out) >= n_pixels:
            break
    return out


def _extract_codes(stream: bytes, min_code_size: int,
                   max_codes: int = 1 << 62):
    """Split the LZW bitstream into clear-delimited segments of codes.

    The code width between clears follows a deterministic schedule
    (the table grows by one entry per non-special code after the
    first, and the width bumps when the table reaches 2^w), so whole
    width-runs extract in ONE vectorized gather: positions
    ``bitpos + w*arange(k)``, three bytes gathered per position,
    shift + mask.  Only the clear/EOI scan is data-dependent.

    Returns a list of int32 arrays (one per clear segment, specials
    stripped).  Mirrors the per-code reader ``_lzw_decode`` exactly,
    including its leniency about streams that end without an EOI.
    ``max_codes`` bounds total extraction: every code emits at least
    one pixel, so the caller passes its pixel budget and a multi-MB
    garbage stream cannot balloon into unbounded int arrays before
    the output-level truncation kicks in.
    """
    if not 2 <= min_code_size <= 8:
        raise CodecError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = clear + 2
    buf = np.frombuffer(stream, dtype=np.uint8)
    # pad so the 3-byte gather below never runs off the end
    buf3 = np.concatenate([buf, np.zeros(3, dtype=np.uint8)]).astype(np.uint32)
    total_bits = len(buf) * 8
    segments: list[np.ndarray] = []
    current: list[np.ndarray] = []
    bitpos = 0
    t = 0  # non-special codes so far in this segment
    w = min_code_size + 1
    extracted = 0
    done = False
    while not done and extracted < max_codes:
        growth_t = (1 << w) - base + 1 if w < 12 else 1 << 62
        if t >= growth_t:
            w += 1
            continue
        k = min(growth_t - t, (total_bits - bitpos) // w,
                max_codes - extracted)
        if k <= 0:
            break  # underrun without EOI: accept what we have
        pos = bitpos + w * _arange(k)
        bi = pos >> 3
        val = buf3[bi] | (buf3[bi + 1] << 8) | (buf3[bi + 2] << 16)
        codes = (val >> (pos & 7).astype(np.uint32)) & ((1 << w) - 1)
        codes = codes.astype(np.int32)
        special = np.nonzero((codes == clear) | (codes == eoi))[0]
        if special.size:
            s = int(special[0])
            if s:
                current.append(codes[:s])
            t += s
            extracted += s
            bitpos += w * (s + 1)
            if int(codes[s]) == eoi:
                done = True
            else:  # clear: close the segment, reset the schedule
                if current:
                    segments.append(np.concatenate(current))
                    current = []
                t = 0
                w = min_code_size + 1
        else:
            current.append(codes)
            t += k
            extracted += k
            bitpos += w * k
            if t == growth_t:
                w += 1
    if current:
        segments.append(np.concatenate(current))
    return segments


def _chain_resolve(par: np.ndarray, is_lit: np.ndarray):
    """Pointer-double parent chains: for each code index, the chain
    length to (and the index of) its first-literal ancestor.

    ``par[j]`` is the code index this entry's string extends (j itself
    for literals).  Converges in O(log max-chain) full-array gathers —
    the same amortization trick as the PNG wavefront batch.
    """
    anc = np.where(is_lit, _arange(par.size), par)
    steps = (~is_lit).astype(np.int64)
    while True:
        unresolved = ~is_lit[anc]
        if not unresolved.any():
            return steps, anc
        steps = steps + np.where(unresolved, steps[anc], 0)
        anc = np.where(unresolved, anc[anc], anc)


def _lzw_decode_fast(stream: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """Vectorized LZW decode (same contract/output as ``_lzw_decode``).

    Per clear segment: entry slot ``i`` is created while processing
    code ``i+1`` and its string is ``string(codes[i]) + one byte``, so
    every code's output length and origin resolve from parent chains
    over CODE INDICES via pointer doubling; then every output byte's
    back-reference ``ref = arange(n) - repeat(delta, lens)`` resolves
    to its origin literal with ``R = ref[R]`` doubling, and the pixels
    are one final gather.  No per-code Python.
    """
    clear = 1 << min_code_size
    base = clear + 2
    cap = 4096 - base  # entry slots per segment
    out_parts: list[np.ndarray] = []
    produced = 0
    # each non-special code emits >=1 pixel, so n_pixels (+1 slack for
    # the code that crosses the boundary) bounds useful extraction
    for codes in _extract_codes(stream, min_code_size, n_pixels + 1):
        m = codes.size
        if not m:
            continue
        if int(codes[0]) >= base:
            raise CodecError("LZW code before any literal")
        j = _arange(m)
        slot = codes.astype(np.int64) - base
        is_lit = slot < 0
        # entry validity: slot i exists for code j iff i < min(j, cap)
        # (slot j-1 is the KwKwK self-reference, created mid-code)
        if np.any(~is_lit & ((slot > j - 1) | (slot >= cap))):
            raise CodecError("LZW code out of range")
        par = np.where(is_lit, j, slot)
        lens, origin = _chain_resolve(par, is_lit)
        lens = lens + 1  # literal string length is 1
        ends = np.cumsum(lens)
        need = n_pixels - produced
        if ends[-1] > need:
            cut = int(np.searchsorted(ends, need))
            keep = min(cut + 1, m)
            codes, j, slot, is_lit, par, lens = (
                a[:keep] for a in (codes, j, slot, is_lit, par, lens))
            ends = ends[:keep]
            m = keep
        total = int(ends[-1])
        starts = ends - lens
        delta = np.where(is_lit, 0, starts - starts[par])
        ref = _arange(total) - np.repeat(delta, lens)
        vals = np.repeat(codes.astype(np.int64), lens)
        moved = ref != _arange(total)
        while moved.any():
            ref = np.where(moved, ref[ref], ref)
            moved = ref != ref[ref]
        out_parts.append(vals[ref].astype(np.uint8))
        produced += total
        if produced >= n_pixels:
            break
    if not out_parts:
        return b""
    return b"".join(p.tobytes() for p in out_parts)


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW encode; emits clear up front and resets at table 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = 0
    nbits = 0

    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear)
    it = iter(indices)
    code = next(it)
    for k in it:
        nxt = table.get((code, k))
        if nxt is not None:
            code = nxt
            continue
        emit(code)
        table[(code, k)] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code == 4096:
            emit(clear)
            table.clear()
            next_code = eoi + 1
            code_size = min_code_size + 1
        code = k
    emit(code)
    emit(eoi)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------

def _read_color_table(data: bytes, pos: int, packed: int) -> tuple[np.ndarray | None, int]:
    if not packed & 0x80:
        return None, pos
    n = 2 << (packed & 0x07)
    end = pos + 3 * n
    if end > len(data):
        raise CodecError("truncated color table")
    pal = np.frombuffer(data, dtype=np.uint8, count=3 * n, offset=pos)
    return pal.reshape(n, 3), end


def _skip_subblocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise CodecError("truncated sub-blocks")
        sz = data[pos]
        pos += 1
        if sz == 0:
            return pos
        pos += sz
        if pos > len(data):
            raise CodecError("truncated sub-block body")


def _collect_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        if pos >= len(data):
            raise CodecError("truncated image data")
        sz = data[pos]
        pos += 1
        if sz == 0:
            return b"".join(parts), pos
        if pos + sz > len(data):
            raise CodecError("truncated image data block")
        parts.append(data[pos : pos + sz])
        pos += sz


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> grayscale float32 [h, w] in [0, 255] (first frame)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise CodecError("not a GIF")
    packed = data[10]
    global_pal, pos = _read_color_table(data, 13, packed)
    while True:
        if pos >= len(data):
            raise CodecError("no image frame before end of data")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise CodecError("no image frame in GIF")
        if block == 0x21:  # extension: label + sub-blocks, all skipped
            if pos >= len(data):
                raise CodecError("truncated extension")
            pos = _skip_subblocks(data, pos + 1)
            continue
        if block != 0x2C:
            raise CodecError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        if pos + 9 > len(data):
            raise CodecError("truncated image descriptor")
        _left, _top, w, h = struct.unpack_from("<HHHH", data, pos)
        ipacked = data[pos + 8]
        pos += 9
        if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
            raise CodecError(f"bad GIF geometry {w}x{h}")
        local_pal, pos = _read_color_table(data, pos, ipacked)
        pal = local_pal if local_pal is not None else global_pal
        if pal is None:
            raise CodecError("GIF frame has no color table")
        if pos >= len(data):
            raise CodecError("missing LZW min code size")
        min_code_size = data[pos]
        pos += 1
        stream, pos = _collect_subblocks(data, pos)
        try:
            raw = _lzw_decode_fast(stream, min_code_size, w * h)
        except (IndexError, OverflowError) as e:  # pragma: no cover
            raise CodecError(f"LZW decode failed: {e}") from None
        if len(raw) < w * h:
            raise CodecError(
                f"LZW underrun: {len(raw)} of {w * h} pixels"
            )
        idx = np.frombuffer(bytes(raw[: w * h]), dtype=np.uint8)
        if int(idx.max(initial=0)) >= len(pal):
            raise CodecError("palette index out of range")
        rows = idx.reshape(h, w)
        if ipacked & 0x40:  # interlaced: 4-pass row order
            order = np.concatenate(
                [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
            )
            out_rows = np.empty_like(rows)
            out_rows[order] = rows
            rows = out_rows
        rgb = pal[rows]  # [h, w, 3] uint8
        return rgb.astype(np.float32).mean(axis=2)


def _parse_gce(data: bytes, pos: int) -> tuple[int, int | None, int]:
    """Parse a Graphic Control Extension body starting at its first
    sub-block; returns (disposal, transparent_index|None, new_pos)."""
    disposal, trans = 0, None
    while True:
        if pos >= len(data):
            raise CodecError("truncated GCE")
        sz = data[pos]
        pos += 1
        if sz == 0:
            return disposal, trans, pos
        if pos + sz > len(data):
            raise CodecError("truncated GCE body")
        if sz >= 4:
            flags = data[pos]
            disposal = (flags >> 2) & 0x07
            if flags & 0x01:
                trans = data[pos + 3]
        pos += sz


def decode_gif_frames(data: bytes, max_frames: int = 4096) -> np.ndarray:
    """Animated GIF -> [n, h, w] float32 composed grayscale frames.

    The multimodal video path's second REAL container (alongside
    MJPEG-in-AVI, multimodal.py): walks every image descriptor,
    honoring per-frame Graphic Control Extensions — transparency index
    (transparent pixels keep the canvas), disposal 2 (restore frame
    rect to background) and 3 (restore previous canvas) — and
    composing partial frames at their (left, top) offsets onto the
    logical screen, per the GIF89a spec's animation model.  Each
    yielded frame is the canvas after composition, mixed down by
    per-pixel channel mean (wav.c:364-374 analog).
    """
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise CodecError("not a GIF")
    sw, sh = struct.unpack_from("<HH", data, 6)
    if sw <= 0 or sh <= 0 or sw * sh > _MAX_PIXELS:
        raise CodecError(f"bad GIF logical screen {sw}x{sh}")
    packed = data[10]
    bg_index = data[11]
    global_pal, pos = _read_color_table(data, 13, packed)
    if global_pal is not None and bg_index < len(global_pal):
        bg_rgb = global_pal[bg_index].astype(np.float32)
    else:
        bg_rgb = np.zeros(3, dtype=np.float32)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    # total OUTPUT budget, not just a frame count: each composed frame
    # materializes a full sh*sw float32 canvas, so a few-KB GIF with a
    # huge logical screen and thousands of 1x1 frame rects must not
    # expand past _MAX_PIXELS cumulative pixels (round-4 advisory)
    frame_budget = min(max_frames, max(1, _MAX_PIXELS // (sw * sh)))
    frames: list[np.ndarray] = []
    disposal, trans = 0, None
    while True:
        if pos >= len(data):
            raise CodecError("GIF ended without trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            if pos >= len(data):
                raise CodecError("truncated extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:
                disposal, trans, pos = _parse_gce(data, pos)
            else:
                pos = _skip_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise CodecError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise CodecError("truncated image descriptor")
        left, top, w, h = struct.unpack_from("<HHHH", data, pos)
        ipacked = data[pos + 8]
        pos += 9
        if w <= 0 or h <= 0 or left + w > sw or top + h > sh:
            raise CodecError(f"bad GIF frame rect {left},{top} {w}x{h}")
        local_pal, pos = _read_color_table(data, pos, ipacked)
        pal = local_pal if local_pal is not None else global_pal
        if pal is None:
            raise CodecError("GIF frame has no color table")
        if pos >= len(data):
            raise CodecError("missing LZW min code size")
        min_code_size = data[pos]
        pos += 1
        stream, pos = _collect_subblocks(data, pos)
        raw = _lzw_decode_fast(stream, min_code_size, w * h)
        if len(raw) < w * h:
            raise CodecError(f"LZW underrun: {len(raw)} of {w * h} pixels")
        idx = np.frombuffer(raw[: w * h], dtype=np.uint8)
        if int(idx.max(initial=0)) >= len(pal):
            raise CodecError("palette index out of range")
        rows = idx.reshape(h, w)
        if ipacked & 0x40:
            order = np.concatenate(
                [np.arange(s, h, st) for s, st in _INTERLACE_PASSES]
            )
            out_rows = np.empty_like(rows)
            out_rows[order] = rows
            rows = out_rows
        prev = canvas.copy() if disposal == 3 else None
        rect = canvas[top : top + h, left : left + w]
        rgb = pal[rows].astype(np.float32)
        if trans is None:
            rect[:] = rgb
        else:
            opaque = rows != trans
            rect[opaque] = rgb[opaque]
        frames.append(canvas.mean(axis=2).astype(np.float32))
        if len(frames) >= frame_budget:
            break
        if disposal == 2:
            rect[:] = bg_rgb
        elif disposal == 3 and prev is not None:
            canvas = prev
        disposal, trans = 0, None
    if not frames:
        raise CodecError("no image frame in GIF")
    return np.stack(frames)


def encode_gif_frames(frames: np.ndarray) -> bytes:
    """[n, h, w] grayscale -> animated GIF89a (full-frame replacement,
    disposal 1, NETSCAPE loop extension, 256-gray global palette).
    Lossless per frame, so planted clone entries decode bit-identical."""
    f = np.round(np.clip(np.asarray(frames, dtype=np.float64), 0, 255)).astype(
        np.uint8
    )
    if f.ndim != 3 or f.shape[0] < 1:
        raise ValueError("encode_gif_frames expects [n, h, w]")
    n, h, w = f.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | 0x07, 0, 0)
    out += np.repeat(np.arange(256, dtype=np.uint8), 3).tobytes()
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    for k in range(n):
        out += b"\x21\xf9\x04\x04\x04\x00\x00\x00"  # GCE: disposal 1, 4cs
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        lzw = _lzw_encode(f[k].tobytes(), 8)
        out.append(8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def encode_gif(gray: np.ndarray) -> bytes:
    """Grayscale [h, w] -> single-frame GIF87a with a 256-gray palette."""
    g = np.round(np.clip(np.asarray(gray, dtype=np.float64), 0, 255)).astype(np.uint8)
    if g.ndim != 2:
        raise ValueError("encode_gif expects a 2-D grayscale array")
    h, w = g.shape
    header = b"GIF87a" + struct.pack("<HHBBB", w, h, 0x80 | 0x70 | 0x07, 0, 0)
    ramp = np.repeat(np.arange(256, dtype=np.uint8), 3)
    descriptor = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = _lzw_encode(g.tobytes(), 8)
    body = bytearray(b"\x08")
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        body.append(len(chunk))
        body += chunk
    body.append(0)
    return header + ramp.tobytes() + descriptor + bytes(body) + b"\x3b"
