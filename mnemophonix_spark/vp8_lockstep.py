"""Lane-pool lockstep decoder for VP8 coefficient partitions.

The VP8 boolean arithmetic coder is sequential PER BIT — unlike JPEG's
Huffman codes there is no multi-bit LUT gather, so the per-image
Python path costs ~20-90 ms/img (bench `vp8_decode_paths`).  The only
axis left to vectorize over is LANES: every frame in an Arrow batch
decodes its token partition as one lane of a single NumPy state
machine, where each global iteration performs ONE vectorized boolean
read (split/compare/renorm as array ops over all active lanes) and one
table-driven transition of the RFC 6386 §13.2 coefficient-token
automaton.  Same architecture as the foreign-JPEG general pool
(jfif.py `_lockstep_general`): per-lane probability tables share one
gather, lanes retire by compaction, and the win scales with pool
width — small pools route per-image (the router in webp.py applies
the measured crossover).

Inner-loop economy (the same note as jfif's lockstep, amplified):
one iteration decodes ONE BIT per active lane and photo-content frames
run tens of thousands of iterations, so every numpy dispatch in the
loop is multiplied by that.  Hence
  - all transition effects are single table gathers on state*2+bit
    (next state / coeff advance / ctx set / value set / block end);
  - the category-extra-bit counter is EMBEDDED in the state id
    (state 11+j reads the bit of weight 2^j), so no separate counter
    array or masked override exists;
  - the per-block walk (which block follows which, its context cells,
    whether a neighbor was skipped) is PRECOMPUTED per lane as a flat
    static schedule: entering a block is ~12 gathers, and MB skip
    flags never appear in the hot loop at all — a skipped MB's
    context zeroing is equivalent to masking the one later block that
    reads each zeroed cell (every cell is rewritten by every MB
    visit, so the zero is observed exactly once);
  - each lane's bytes carry one zero pad byte and the byte fetch
    clamps to it, reproducing the scalar decoder's zero-fill
    past-the-end semantics with no bounds arithmetic.

Semantics are BIT-IDENTICAL to the scalar reference path
(`vp8._decode_tokens_scalar`), including the zero-fill behavior, so
truncated streams produce the same (garbage) levels in both paths;
structural validation already happened in the per-image header parse.
Reference contract: ffmpeg.c:35-65 (format-agnostic ingest at corpus
scale).
"""

from __future__ import annotations

import numpy as np

from mnemophonix_spark.vp8 import (
    COEFF_BANDS,
    ZIGZAG,
    _CATS,
    _N_PHASES,
)

# --- per-phase layout LUTs (phase: 0=Y2, 1..16=Y raster, 17..20=U,
# 21..24=V; see vp8._decode_tokens_scalar) ---------------------------------

_PT = np.zeros(_N_PHASES, np.int64)          # plane type per phase
_PT[0] = 1
_PT[1:17] = 0
_PT[17:] = 2
_FIRST = np.zeros(_N_PHASES, np.int64)       # first coeff index
_FIRST[1:17] = 1
# above-slot address: A_MBC*mb_cols + A_MXM*mx + A_ADD
# lane slot layout: y [0,4c) by (mx*4+bc), y2 [4c,5c), u [5c,7c), v [7c,9c)
_A_MBC = np.zeros(_N_PHASES, np.int64)
_A_MXM = np.zeros(_N_PHASES, np.int64)
_A_ADD = np.zeros(_N_PHASES, np.int64)
_L_SLOT = np.zeros(_N_PHASES, np.int64)      # left slot 0..8
# intra-MB neighbor flags: the above/left context cell was written by
# a block of the SAME macroblock (always live) vs by the neighboring
# MB (live only if that MB exists and was not skipped)
_A_INTRA = np.zeros(_N_PHASES, np.int64)
_L_INTRA = np.zeros(_N_PHASES, np.int64)
_A_MBC[0], _A_MXM[0], _A_ADD[0], _L_SLOT[0] = 4, 1, 0, 4
for _b in range(16):
    _A_MBC[1 + _b], _A_MXM[1 + _b] = 0, 4
    _A_ADD[1 + _b] = _b % 4
    _L_SLOT[1 + _b] = _b // 4
    _A_INTRA[1 + _b] = 1 if _b // 4 > 0 else 0
    _L_INTRA[1 + _b] = 1 if _b % 4 > 0 else 0
for _b in range(4):
    _A_MBC[17 + _b], _A_MXM[17 + _b] = 5, 2
    _A_ADD[17 + _b] = _b % 2
    _L_SLOT[17 + _b] = 5 + _b // 2
    _A_INTRA[17 + _b] = 1 if _b // 2 > 0 else 0
    _L_INTRA[17 + _b] = 1 if _b % 2 > 0 else 0
    _A_MBC[21 + _b], _A_MXM[21 + _b] = 7, 2
    _A_ADD[21 + _b] = _b % 2
    _L_SLOT[21 + _b] = 7 + _b // 2
    _A_INTRA[21 + _b] = 1 if _b // 2 > 0 else 0
    _L_INTRA[21 + _b] = 1 if _b % 2 > 0 else 0

_BANDS = np.asarray(COEFF_BANDS + [7], dtype=np.int64)  # i==16 guard
_ZIG = np.asarray(list(ZIGZAG) + [0], dtype=np.int64)

# renormalization shift: smallest s with (r << s) >= 128 (r >= 1)
_RENORM = np.zeros(256, np.int64)
for _r in range(1, 256):
    _s = 0
    while (_r << _s) < 128:
        _s += 1
    _RENORM[_r] = _s

# token-automaton states:
#   0..10   = the §13.2 tree node whose probability index equals the
#             state id
#   11..21  = category extra bit of weight 2^(state-11) (prob 128);
#             counts DOWN to 11, then the sign bit follows
#   22      = sign bit (prob 128), then the next coefficient
_S_SIGN = 22
_N_STATES = 23

_TRACE = None  # tests may set to a list to record block-end states

_T_NS = np.zeros(2 * _N_STATES, np.int64)    # next state
_T_DI = np.zeros(2 * _N_STATES, np.int64)    # i increment
_T_C = np.full(2 * _N_STATES, -1, np.int64)  # ctx set (-1 = keep)
_T_V = np.full(2 * _N_STATES, -1, np.int64)  # value set (-1 = keep)
_T_END = np.zeros(2 * _N_STATES, np.int64)   # block ends (EOB)


def _xst(nb: int) -> int:
    """Entry state for a category with ``nb`` extra bits."""
    return 11 + nb - 1


for _st, _bit, _ns, _di, _c, _v, _e in (
    (0, 0, 0, 0, -1, -1, 1),         # EOB
    (0, 1, 1, 0, -1, -1, 0),
    (1, 0, 1, 1, 0, -1, 0),          # zero coeff (skip-EOB: stay at 1)
    (1, 1, 2, 0, -1, -1, 0),
    (2, 0, _S_SIGN, 0, 1, 1, 0),     # v=1
    (2, 1, 3, 0, 2, -1, 0),
    (3, 0, 4, 0, -1, -1, 0),
    (3, 1, 6, 0, -1, -1, 0),
    (4, 0, _S_SIGN, 0, -1, 2, 0),    # v=2
    (4, 1, 5, 0, -1, -1, 0),
    (5, 0, _S_SIGN, 0, -1, 3, 0),    # v=3
    (5, 1, _S_SIGN, 0, -1, 4, 0),    # v=4
    (6, 0, 7, 0, -1, -1, 0),
    (6, 1, 8, 0, -1, -1, 0),
    (7, 0, _xst(_CATS[0][1]), 0, -1, _CATS[0][0], 0),
    (7, 1, _xst(_CATS[1][1]), 0, -1, _CATS[1][0], 0),
    (8, 0, 9, 0, -1, -1, 0),
    (8, 1, 10, 0, -1, -1, 0),
    (9, 0, _xst(_CATS[2][1]), 0, -1, _CATS[2][0], 0),
    (9, 1, _xst(_CATS[3][1]), 0, -1, _CATS[3][0], 0),
    (10, 0, _xst(_CATS[4][1]), 0, -1, _CATS[4][0], 0),
    (10, 1, _xst(_CATS[5][1]), 0, -1, _CATS[5][0], 0),
    (_S_SIGN, 0, 0, 1, -1, -1, 0),   # sign: advance to next coeff
    (_S_SIGN, 1, 0, 1, -1, -1, 0),
):
    _k = _st * 2 + _bit
    _T_NS[_k], _T_DI[_k], _T_C[_k] = _ns, _di, _c
    _T_V[_k], _T_END[_k] = _v, _e
for _j in range(11):                 # extra-bit countdown chain
    for _bit in range(2):
        _k = (11 + _j) * 2 + _bit
        _T_NS[_k] = _S_SIGN if _j == 0 else 11 + _j - 1


def _build_schedule(lanes, mbc, nmb, obase):
    """Static per-lane walk: one row per VISITED block (skipped MBs
    contribute none).  Returns flat arrays over all lanes' schedules
    plus per-lane (vbase, vcount):
      SA   above-cell index (into the pool's `above` array)
      SAM  0/1: above contribution masked out (neighbor MB skipped,
           or first MB row) — see module docstring
      SL   left-slot 0..8  /  SLM same masking for the left cell
      SI0  first coefficient index (0 or 1)
      SOB  output block row  /  SPB (pt*8 + band(first))*33 prob base
    """
    per_lane = []
    abase_off = 0
    for k, (_t, _p, skips) in enumerate(lanes):
        rows, cols = skips.shape
        sk = skips.astype(bool)
        my, mx = np.nonzero(~sk)
        mcount = my.size
        ph = np.broadcast_to(np.arange(_N_PHASES), (mcount, _N_PHASES))
        myb = my[:, None]
        mxb = mx[:, None]
        sa = (abase_off + _A_MBC[ph] * cols + _A_MXM[ph] * mxb
              + _A_ADD[ph])
        # above neighbor: same MB (intra) OR MB (my-1, mx)
        up_ok = (myb > 0) & ~np.take(
            sk, np.maximum(myb - 1, 0) * cols + mxb)
        sam = np.where(_A_INTRA[ph] == 1, 1, up_ok.astype(np.int64))
        lf_ok = (mxb > 0) & ~np.take(
            sk, myb * cols + np.maximum(mxb - 1, 0))
        slm = np.where(_L_INTRA[ph] == 1, 1, lf_ok.astype(np.int64))
        sl = np.broadcast_to(_L_SLOT, (mcount, _N_PHASES))
        si0 = np.broadcast_to(_FIRST, (mcount, _N_PHASES))
        sob = (obase[k] + (myb * cols + mxb) * _N_PHASES + ph)
        spb = (_PT[ph] * 8 + _BANDS[_FIRST[ph]]) * 33
        spt = _PT[ph] * 8
        per_lane.append((sa.ravel(), sam.ravel(), sl.ravel(),
                         slm.ravel(), si0.ravel(), sob.ravel(),
                         np.broadcast_to(spb, sa.shape).ravel(),
                         np.broadcast_to(spt, sa.shape).ravel()))
        abase_off += cols * 9
    vcount = np.asarray([p[0].size for p in per_lane], np.int64)
    vbase = np.zeros(len(lanes), np.int64)
    np.cumsum(vcount[:-1], out=vbase[1:])
    cat = [np.concatenate([p[j] for p in per_lane])
           for j in range(8)]
    return cat, vbase, vcount, abase_off


def decode_token_pool(lanes: list) -> list:
    """Decode a pool of coefficient partitions in lockstep.

    ``lanes``: list of (token_buf: bytes, probs: int64[4,8,3,11],
    skips: int64[mb_rows, mb_cols]) — one per frame, from
    vp8._parse_frame_header.  Returns quantized LEVELS
    [nmb, 25, 16] per lane, array-equal to
    vp8._decode_tokens_scalar's output.
    """
    nl = len(lanes)
    if nl == 0:
        return []
    # --- concatenated pool storage -------------------------------------
    bufs = [np.frombuffer(t, np.uint8).astype(np.int64) for t, _, _ in lanes]
    big = np.concatenate(
        [np.concatenate([b, np.zeros(1, np.int64)]) for b in bufs])
    sizes = np.asarray([b.size for b in bufs], np.int64)
    if (sizes < 2).any():
        raise ValueError("lane with <2-byte token partition in pool")
    bbase = np.zeros(nl, np.int64)
    np.cumsum((sizes + 1)[:-1], out=bbase[1:])
    hard = bbase + sizes  # index of each lane's pad zero

    # per-lane prob tables; tail pad keeps the fused gather (base +
    # c*11 + state, state up to 22) in bounds for the last lane
    probs_flat = np.concatenate(
        [p.astype(np.int64).ravel() for _, p, _ in lanes]
        + [np.zeros(64, np.int64)])
    pbase = np.arange(nl, dtype=np.int64) * 1056

    mbc = np.asarray([s.shape[1] for _, _, s in lanes], np.int64)
    nmb = np.asarray([s.size for _, _, s in lanes], np.int64)
    obase = np.zeros(nl, np.int64)                  # output block bases
    np.cumsum((nmb * _N_PHASES)[:-1], out=obase[1:])
    out = np.zeros(int((nmb * _N_PHASES).sum()) * 16, np.int64)

    (sa_t, sam_t, sl_t, slm_t, si0_t, sob_t, spb_t, spt_t), vbase, \
        vcount, asz = _build_schedule(lanes, mbc, nmb, obase)
    above = np.zeros(asz, np.int64)
    left = np.zeros((nl, 9), np.int64)

    # --- per-lane dynamic state -----------------------------------------
    lane = np.arange(nl, dtype=np.int64)
    value = (big[bbase] << 8) | big[bbase + 1]   # vp8._BoolDecoder init
    pos = bbase + 2
    rng = np.full(nl, 255, np.int64)
    shift = np.zeros(nl, np.int64)
    hardc = hard.copy()
    plb = pbase.copy()
    bk = np.full(nl, -1, np.int64)       # visited-block counter
    vb = vbase.copy()
    vc = vcount.copy()
    i = np.zeros(nl, np.int64)
    cq = np.zeros(nl, np.int64)      # ctx of the CURRENT coefficient
    cn = np.zeros(nl, np.int64)      # pending ctx for the next one
    state = np.zeros(nl, np.int64)
    v = np.zeros(nl, np.int64)
    nnz = np.zeros(nl, np.int64)
    a_abs = np.zeros(nl, np.int64)
    l_slot = np.zeros(nl, np.int64)
    oblk = np.zeros(nl, np.int64)
    pb = np.zeros(nl, np.int64)
    pt8 = np.zeros(nl, np.int64)

    state_arrays = ("lane", "value", "pos", "rng", "shift", "hardc",
                    "plb", "bk", "vb", "vc", "i", "cq", "cn", "state",
                    "v", "nnz", "a_abs", "l_slot", "oblk", "pb", "pt8")

    def _enter(sel):
        """Advance lanes (positions ``sel``) to their next scheduled
        block; returns the still-alive mask over ``sel``."""
        bk[sel] += 1
        alive = bk[sel] < vc[sel]
        sub = sel[alive]
        if sub.size:
            k = vb[sub] + bk[sub]
            a_abs[sub] = sa_t[k]
            l_slot[sub] = sl_t[k]
            ctx = (above[sa_t[k]] * sam_t[k]
                   + left[lane[sub], sl_t[k]] * slm_t[k])
            cq[sub] = ctx
            cn[sub] = ctx
            i[sub] = si0_t[k]
            oblk[sub] = sob_t[k]
            pb[sub] = plb[sub] + spb_t[k]
            pt8[sub] = spt_t[k]
            state[sub] = 0
            nnz[sub] = 0
            v[sub] = 0
        return alive

    alive0 = _enter(np.arange(nl, dtype=np.int64))
    loc = locals()
    (lane, value, pos, rng, shift, hardc, plb, bk, vb, vc, i, cq, cn,
     state, v, nnz, a_abs, l_slot, oblk, pb, pt8) = (
        loc[nm][alive0] for nm in state_arrays)

    while lane.size:
        # ---- one vectorized boolean read (vp8._BoolDecoder.read) ----
        prob = np.where(state <= 10, probs_flat[pb + cq * 11 + state],
                        128)
        split = 1 + (((rng - 1) * prob) >> 8)
        bigv = split << 8
        bit = value >= bigv                  # bool; promotes where used
        if _TRACE is not None and lane.size == 1:
            _TRACE.append(("r", int(state[0]), int(cq[0]), int(i[0]),
                           int(prob[0]), int(bit[0])))
        value = value - bigv * bit
        rng = np.where(bit, rng - split, split)
        s = _RENORM[rng]
        rng = rng << s
        sh = shift + s
        cross = sh >> 3                      # 0/1: shift<8 and s<8
        sh = sh & 7
        value = (value << s) | ((big[pos] * cross) << sh)
        pos = np.minimum(pos + cross, hardc)
        shift = sh

        # ---- table-driven transition ---------------------------------
        st = state
        st2b = st * 2 + bit
        tc = _T_C[st2b]
        cn = np.where(tc >= 0, tc, cn)
        tv = _T_V[st2b]
        v = np.where(tv >= 0, tv, v)

        isx = (st >= 11) & (st < _S_SIGN)
        if isx.any():                        # category extra bits
            v = v + (bit << np.maximum(st - 11, 0)) * isx

        msg = st == _S_SIGN
        if msg.any():                        # sign: emit coefficient
            sel = np.nonzero(msg)[0]
            vs = v[sel]
            out[oblk[sel] * 16 + _ZIG[i[sel]]] = np.where(
                bit[sel], -vs, vs)
            nnz = nnz | msg

        di = _T_DI[st2b]
        moved = di != 0
        cq = np.where(moved, cn, cq)     # ctx applies from the NEXT
        i = i + di                       # coefficient on (scalar latch)
        endblk = (_T_END[st2b] | (di & (i >= 16))) != 0
        state = _T_NS[st2b]
        adv = moved & ~endblk
        if adv.any():                        # band moved: re-fuse pb
            sel = np.nonzero(adv)[0]
            pb[sel] = plb[sel] + (pt8[sel] + _BANDS[i[sel]]) * 33
        # ---- block end: store ctx, advance, retire -------------------
        if endblk.any():
            sel = np.nonzero(endblk)[0]
            if _TRACE is not None:  # debug hook (tests only)
                for q in sel:
                    _TRACE.append((int(lane[q]), int(pos[q]),
                                   int(value[q]), int(rng[q]),
                                   int(shift[q]), int(nnz[q])))
            above[a_abs[sel]] = nnz[sel]
            left[lane[sel], l_slot[sel]] = nnz[sel]
            alive = _enter(sel)
            if not alive.all():
                keep = np.ones(lane.size, bool)
                keep[sel[~alive]] = False
                loc = locals()
                (lane, value, pos, rng, shift, hardc, plb, bk, vb,
                 vc, i, cq, cn, state, v, nnz, a_abs, l_slot, oblk,
                 pb, pt8) = (loc[nm][keep] for nm in state_arrays)

    levels = []
    for k in range(nl):
        nb = int(nmb[k]) * _N_PHASES
        levels.append(
            out[int(obase[k]) * 16 : (int(obase[k]) + nb) * 16]
            .reshape(int(nmb[k]), _N_PHASES, 16)
        )
    return levels


# A lockstep RECONSTRUCTION pool (one MB per lane per iteration, DC/V/
# H/TM via masks, canvases as one flat array) was built and measured
# here and REJECTED: computing the gather/scatter index arrays for
# (lanes, 16, 16) pixel tiles costs more element work than the whole
# per-image slice-based walk in vp8._reconstruct (96x128: 3.6 vs 1.3
# ms/img; 256x333: 51 vs 10.7 — even with a DC-only specialization and
# integer-identical output).  Same evidence-over-dogma call as the
# packed minhash band table (BENCH minhash_paths): the win axis for
# VP8 is the token pool above, not the pixel walk.
