"""Flat device emission, part 1: the sort-based layout pass.

The round-4 decide kernel (encode_bulk._decide_kernel) mirrors the whole
TokenSink byte machine (csrc tsq_core.cpp:52-138; upstream layout rules
tsq_encode.cpp:192-342) inside its scalar chain: side-plane RMWs,
reserved-slot bookkeeping, run/record splitting — measured ~300
cyc/symbol compiled, ~85% of the two-pass device-compress cost. This
module moves ALL of that byte layout off the scalar unit: the decision
chain only appends one i32 DESCRIPTOR per symbol, and the payload bytes
are reconstructed here in closed form with vector primitives.

Descriptor word (i32):
    bit  31     type (1 = literal run, 0 = match)
    bits 25-28  size nibble (literal: run-1; match: length code)
    bits 0-16   match offset (rep-anchor relative, 4..65534)

Everything else the TokenSink tracks is a closed-form function of the
descriptor sequence:

    w_n   payload width      = lit ? nibble+1 : 2
    adv_n input consumed     = lit ? nibble+1 : code_to_advance(nibble)
    src_n literal source     = base + exclusive_cumsum(adv)
    P_n   payload position   = 5 + exclusive_cumsum(w) + n//8 + n//2
    ctrl slot g (g>=1) at P_{8g-1} + w_{8g-1}; slot 0 at 3
    size slot s (s>=1) at P_{2s-1} + w_{2s-1} + [(2s) % 8 == 0]; slot 0 at 4
    payload size j = 5 + sum(w) + nsym//8 + nsym//2

(The n//8 and n//2 terms count the ctrl/size slots TokenSink reserves
when a group completes, tsq_core.cpp:83-86; the +[(2s)%8==0] orders the
ctrl reserve before the size reserve at shared boundaries.) Slot VALUES
are the shift-or accumulations with the finish() padding rules
(csrc TokenSink::finish): a partial final ctrl byte pads with 1-bits, a
half-filled size byte pads its low nibble with 0, and a reserved slot
that no group ever filled keeps the byte the last literal's 16-byte
over-copy deposited (or 0 above the high-water mark) — at most the two
trailing slots, reproduced here from the last literal symbol; when the
tail loop runs (nsym % 8 != 0) the trailing empty SIZE slot's residue
additionally shifts one nibble left (tsq_encode.cpp:330-339).

Scatter and gather run ~0.14 Gelem/s on this ISA (encode_xla.py memo),
so the byte assembly is built from the fast primitives only — SORTS,
cumsums and reshapes:

  sort 1 ("ownership merge"): input-byte elements and symbol-start
      markers merge on input position; a last-defined scan hands every
      literal byte its symbol's output delta (P_n - src_n), giving each
      byte an output-position key.
  sort 2 ("the layout"): literal bytes, match-offset bytes, slot bytes
      and the 3-byte header, keyed by output position — the sorted
      value sequence IS the payload.

Byte-identity contract: payload_from_words(layout output) equals the
host level-1 emission (native.encode_block_candidates) exactly,
including dead trailing slots (tests/test_encode_flat.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_tokens import LANES, ROW_BYTES
from .encode_bulk import OUT_ROWS_BULK
from .encode_emit import (IN_ROWS, CAND_ROWS, _NONE, _len_code,
                          _code_width, _lsr, _tzb32, make_input_reader)

_INF = jnp.int32(1 << 30)          # out-position key for dropped elements
DESC_ROWS = 16384                  # 2^21 symbols (worst case ~1.7M/block)


def _ex_cumsum(x):
    c = jnp.cumsum(x, axis=1)
    return c - x


def _last_defined_scan(v):
    """Forward-fill the last value >= 0 along axis 1 (-1 = undefined)."""
    return jax.lax.associative_scan(
        lambda a, b: jnp.where(b >= 0, b, a), v, axis=1)


def _fields(desc, nsym, *, ext):
    """Per-symbol closed-form fields from descriptor words."""
    B, S = desc.shape
    n = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = n < nsym[:, None]
    typ = _lsr(desc, 31) & 1
    nib = _lsr(desc, 25) & 0xF
    off = desc & 0x1FFFF
    if ext:
        madv = jnp.where(nib < 3, (nib + 2) << 4, nib + 1)
    else:
        madv = nib + 1
    w = jnp.where(valid, jnp.where(typ == 1, nib + 1, 2), 0)
    adv = jnp.where(valid, jnp.where(typ == 1, nib + 1, madv), 0)
    P = 5 + _ex_cumsum(w) + n // 8 + n // 2
    return n, valid, typ, nib, off, w, adv, P


@functools.partial(jax.jit, static_argnames=("ext", "out_rows"))
def layout_batch(desc, nsym, input_words, meta, *, ext=True,
                 out_rows=OUT_ROWS_BULK):
    """Reconstruct payload planes from descriptor streams.

    desc: (B, D_ROWS, 128) i32 descriptor planes; nsym: (B,) i32;
    input_words: (B, IN_ROWS, 128) i32; meta: (B, 8) i32 [size, base].
    Returns (payload_words (B, out_rows, 128) i32, osz (B, 8) i32) with
    the emit_bulk osz ABI rows [payload_size, n_win, overflow, 0...].
    """
    B = desc.shape[0]
    S = desc.shape[1] * desc.shape[2]
    desc = desc.reshape(B, S)
    size = meta[:, 0]
    base = meta[:, 1]
    n, valid, typ, nib, off, w, adv, P = _fields(desc, nsym, ext=ext)
    nib = jnp.where(valid, nib, 0)
    src = base[:, None] + _ex_cumsum(adv)
    jfin = 5 + jnp.sum(w, axis=1) + nsym // 8 + nsym // 2

    # --- input bytes (i32 values) -------------------------------------------
    iw = input_words.reshape(B, -1)
    ib = jnp.stack([iw & 0xFF, _lsr(iw, 8) & 0xFF, _lsr(iw, 16) & 0xFF,
                    _lsr(iw, 24) & 0xFF], axis=-1).reshape(B, -1)
    INB = ib.shape[1]

    # --- sort 1: ownership merge on input position --------------------------
    # Literal-symbol markers (key even) sort before same-position byte
    # elements (key odd); two last-defined scans hand every input byte its
    # owning literal's payload position and run bound. A byte is emitted
    # iff it lies INSIDE its owner's run — bytes consumed by matches, tail
    # bytes and over-copy reach all drop out (dead slots are reproduced
    # separately below), so sort 2 sees exactly one element per payload
    # position.
    is_lit = jnp.logical_and(valid, typ == 1)
    mkey = jnp.where(is_lit, src * 2, _INF)
    mA = jnp.where(is_lit, P, -1)                      # payload position
    mB = jnp.where(is_lit, (src << 4) | (adv - 1), -1)  # run bound
    bpos = jnp.broadcast_to(jnp.arange(INB, dtype=jnp.int32)[None, :],
                            (B, INB))
    neg = jnp.full((B, INB), -1, jnp.int32)
    k1 = jnp.concatenate([mkey, bpos * 2 + 1], axis=1)
    a1 = jnp.concatenate([mA, neg], axis=1)
    b1 = jnp.concatenate([mB, neg], axis=1)
    bv1 = jnp.concatenate([jnp.zeros((B, S), jnp.int32), ib], axis=1)
    sk, sa, sbnd, sb = jax.lax.sort((k1, a1, b1, bv1), dimension=1,
                                    is_stable=True, num_keys=1)
    fillA = _last_defined_scan(sa)
    fillB = _last_defined_scan(sbnd)
    is_byte = (sk & 1) == 1
    b_in = _lsr(sk, 1)
    r = b_in - _lsr(fillB, 4)
    lit_ok = jnp.logical_and(
        jnp.logical_and(is_byte, fillA >= 0),
        r <= (fillB & 15))
    lit_key = jnp.where(lit_ok, fillA + r, _INF)

    # --- match offset bytes --------------------------------------------------
    is_m = jnp.logical_and(valid, typ == 0)
    mk0 = jnp.where(is_m, P, _INF)
    mv0 = off & 0xFF
    mk1 = jnp.where(is_m, P + 1, _INF)
    mv1 = _lsr(off, 8) & 0xFF

    # --- ctrl slots (reshape by symbol groups of 8) -------------------------
    Pw = P + w
    G = S // 8
    g = jnp.arange(G, dtype=jnp.int32)[None, :]
    bits = typ.reshape(B, G, 8)
    weight = (1 << (7 - jnp.arange(8, dtype=jnp.int32)))[None, None, :]
    cnt_c = jnp.clip(nsym[:, None] - g * 8, 0, 8)
    raw_c = jnp.sum(bits * weight * valid.reshape(B, G, 8), axis=2)
    pad_c = 8 - cnt_c
    val_c = raw_c | jnp.where(cnt_c > 0, (1 << pad_c) - 1, 0)
    pos_c = jnp.concatenate(
        [jnp.full((B, 1), 3, jnp.int32),
         Pw.reshape(B, G, 8)[:, :-1, 7]], axis=1)
    ck = jnp.where(g <= nsym[:, None] // 8, pos_c, _INF)

    # --- size slots (groups of 2) --------------------------------------------
    H = S // 2
    s = jnp.arange(H, dtype=jnp.int32)[None, :]
    nib2 = nib.reshape(B, H, 2)
    cnt_z = jnp.clip(nsym[:, None] - s * 2, 0, 2)
    val_z = jnp.where(cnt_z == 2, (nib2[:, :, 0] << 4) | nib2[:, :, 1],
                      nib2[:, :, 0] << 4)
    pos_z = jnp.concatenate(
        [jnp.full((B, 1), 4, jnp.int32),
         Pw.reshape(B, H, 2)[:, :-1, 1]
         + ((s[:, 1:] * 2) % 8 == 0).astype(jnp.int32)], axis=1)
    zk = jnp.where(s <= nsym[:, None] // 2, pos_z, _INF)

    # --- dead trailing slots (never filled): over-copy rule ------------------
    # last literal symbol L; slot byte = p < P_L + 16 ? input[src_L+p-P_L] : 0
    L = jnp.max(jnp.where(jnp.logical_and(valid, typ == 1), n, -1), axis=1)
    PL = jnp.take_along_axis(P, jnp.maximum(L, 0)[:, None], axis=1)[:, 0]
    srcL = jnp.take_along_axis(src, jnp.maximum(L, 0)[:, None],
                               axis=1)[:, 0]

    def dead_val(p):
        idx = jnp.clip(srcL + (p - PL), 0, INB - 1)
        byte = jnp.take_along_axis(ib, idx[:, None], axis=1)[:, 0]
        return jnp.where(jnp.logical_and(L >= 0, p < PL + 16), byte, 0)

    dead_c = jnp.logical_and(cnt_c == 0, g <= nsym[:, None] // 8)
    val_c = jnp.where(dead_c, dead_val(jnp.where(dead_c, pos_c, 0)
                                       .max(axis=1))[:, None], val_c)
    dead_z = jnp.logical_and(cnt_z == 0, s <= nsym[:, None] // 2)
    # the upstream tail loop shifts the trailing EMPTY size slot one
    # nibble left whenever it runs (nsym % 8 != 0): residue << 4
    zsh = jnp.where((nsym % 8) != 0, 4, 0)
    dzv = (dead_val(jnp.where(dead_z, pos_z, 0).max(axis=1))
           << zsh) & 0xFF
    val_z = jnp.where(dead_z, dzv[:, None], val_z)

    # --- header ---------------------------------------------------------------
    hk = jnp.broadcast_to(jnp.arange(3, dtype=jnp.int32)[None, :], (B, 3))
    hv = jnp.stack([size & 0xFF, _lsr(size, 8) & 0xFF,
                    _lsr(size, 16) & 0xFF], axis=1)

    # --- sort 2: the layout ----------------------------------------------------
    keys = jnp.concatenate([lit_key, mk0, mk1, ck, zk, hk], axis=1)
    vals = jnp.concatenate([sb, mv0, mv1, val_c, val_z, hv], axis=1)
    okey, oval = jax.lax.sort((keys, vals), dimension=1, is_stable=True,
                              num_keys=1)

    J = out_rows * ROW_BYTES
    pos = jnp.arange(J, dtype=jnp.int32)[None, :]
    ob = jnp.where(pos < jfin[:, None], oval[:, :J], 0)
    q = ob.reshape(B, -1, 4)
    words = (q[:, :, 0] | (q[:, :, 1] << 8) | (q[:, :, 2] << 16)
             | (q[:, :, 3] << 24)).reshape(B, out_rows, LANES)

    osz = jnp.zeros((B, 8), jnp.int32)
    osz = osz.at[:, 0].set(jfin)
    osz = osz.at[:, 1].set((jfin + (1 << 21) - 1) >> 21)
    ovf = jnp.logical_or(jfin > J - 64, nsym > S - 64).astype(jnp.int32)
    osz = osz.at[:, 2].set(ovf)
    return words, osz


# --- the flat gang decide kernel ---------------------------------------------
#
# nblk mutually independent decision chains interleaved in one loop body
# (the decode-gang trick applied to the encode parse). Each chain's step
# is one of three straight-line actions picked by selects:
#
#   A  literal drain: one <=16-byte run descriptor from [rs, le)
#   B1 scan+probe:    nv jump; big gaps turn into drain quanta (the loop
#                     re-runs idempotently); at a stop, head-candidate
#                     probe + flush-at-32 bookkeeping (host order: probe
#                     under the pre-flush anchor, flush, revalidate)
#   B2 match:         inline 8-byte extend, window cap, emit, bump,
#                     re-probe for chained matches
#
# Everything data-dependent-loopy is a REQUEST serviced by ONE rare-path
# cond at the body end (ring catchup, candidate-chain walks, >=8-byte
# extends, descriptor-slot ships); the requesting step retries next
# iteration, consuming the service result from override registers
# (ready bits). Byte semantics follow encode_bulk._decide_kernel (host
# parity: csrc encode_candidates_impl, upstream loop
# tsq_encode.cpp:216-326); this kernel only APPENDS descriptors — the
# payload bytes are reconstructed by layout_batch above.

_IN_SLOTS = 32
_POSRING_SLOTS = 4
_DESC_SLOTS = 4
_SLOT_ROWS = 8
_SLOT_BYTES = _SLOT_ROWS * ROW_BYTES

# modes
_M_SCAN = 0
_M_MF = 2        # first match step after a stop
_M_MFR = 3       # same, revalidate (the stop's flush fired)
_M_MCH = 4       # chained match
_M_DONE = 5
# request bits
_RQ_CATCH = 1
_RQ_WALK = 2
_RQ_EXT = 4
_RQ_SHIP = 8
# ready bits
_RD_POS = 1
_RD_KLEN = 2

# per-block state register indices
(_I, _RS, _LE, _ANCH, _NSYM, _POS, _KLEN, _MODE, _REQ, _RDY, _WP, _CT,
 _WIN, _WCA, _WNV, _DOF) = range(16)
_NREG = 16


def _flat_decide_kernel(meta_ref, in_hbm, cand_hbm, nv_hbm, desc_hbm,
                        osz_ref, *scratch, nblk, ext, desc_rows):
    g = pl.program_id(0)
    rings = scratch[:4 * nblk]
    sems = scratch[4 * nblk:8 * nblk]

    def ring(k, which):
        return rings[4 * k + which]

    def sem(k, which):
        return sems[4 * k + which]

    blocks = [g * nblk + k for k in range(nblk)]
    sizes = [meta_ref[b, 0] for b in blocks]
    bases = [meta_ref[b, 1] for b in blocks]
    ends = [bases[k] + sizes[k] for k in range(nblk)]

    # --- ring DMAs (encode_bulk protocol: slots [0, w] complete,
    # (w, w+2] in flight) ------------------------------------------------------
    def in_dma(k, w):
        row0 = jnp.clip(w * _SLOT_ROWS, 0, IN_ROWS - _SLOT_ROWS)
        return pltpu.make_async_copy(
            in_hbm.at[blocks[k], pl.ds(row0, _SLOT_ROWS)],
            ring(k, 0).at[pl.ds((w & (_IN_SLOTS - 1)) * _SLOT_ROWS,
                                _SLOT_ROWS)],
            sem(k, 0).at[w & 3])

    def cand_dma(k, w):
        row0 = jnp.clip(w * _SLOT_ROWS, 0, CAND_ROWS - _SLOT_ROWS)
        return pltpu.make_async_copy(
            cand_hbm.at[blocks[k], pl.ds(row0, _SLOT_ROWS)],
            ring(k, 1).at[pl.ds((w & (_POSRING_SLOTS - 1)) * _SLOT_ROWS,
                                _SLOT_ROWS)],
            sem(k, 1).at[w & 3])

    def nv_dma(k, w):
        row0 = jnp.clip(w * _SLOT_ROWS, 0, CAND_ROWS - _SLOT_ROWS)
        return pltpu.make_async_copy(
            nv_hbm.at[blocks[k], pl.ds(row0, _SLOT_ROWS)],
            ring(k, 2).at[pl.ds((w & (_POSRING_SLOTS - 1)) * _SLOT_ROWS,
                                _SLOT_ROWS)],
            sem(k, 2).at[w & 3])

    def desc_dma(k, s):
        row0 = jnp.minimum(s * _SLOT_ROWS, desc_rows - _SLOT_ROWS)
        return pltpu.make_async_copy(
            ring(k, 3).at[pl.ds((s & (_DESC_SLOTS - 1)) * _SLOT_ROWS,
                                _SLOT_ROWS)],
            desc_hbm.at[blocks[k], pl.ds(row0, _SLOT_ROWS)],
            sem(k, 3).at[s & 1])

    # prologue: dict history + prefetch lead
    for k in range(nblk):
        s0_in = bases[k] >> 12
        s0_pos = bases[k] >> 10
        for q in range(17):
            w = jnp.clip(s0_in - 16 + q, 0, s0_in)

            @pl.when(bases[k] > 0)
            def _(k=k, w=w):
                dma = in_dma(k, w)
                dma.start()
                dma.wait()

        @pl.when(bases[k] > 0)
        def _(k=k, s0_pos=s0_pos):
            dma = cand_dma(k, jnp.maximum(s0_pos - 1, 0))
            dma.start()
            dma.wait()

        for d in range(3):
            in_dma(k, s0_in + d).start()
            cand_dma(k, s0_pos + d).start()
            nv_dma(k, s0_pos + d).start()
        in_dma(k, s0_in).wait()
        cand_dma(k, s0_pos).wait()
        nv_dma(k, s0_pos).wait()

    readers = [make_input_reader(ring(k, 0)) for k in range(nblk)]

    def cand_at(k, p):
        e = p & (_POSRING_SLOTS * _SLOT_BYTES // 4 - 1)
        return ring(k, 1)[e >> 7, e & (LANES - 1)]

    def nv_at(k, p):
        e = p & (_POSRING_SLOTS * _SLOT_BYTES // 4 - 1)
        return ring(k, 2)[e >> 7, e & (LANES - 1)]

    _DESC_RING_WORDS = _DESC_SLOTS * _SLOT_BYTES // 4

    def desc_store(k, wp, v, active):
        wi = wp & (_DESC_RING_WORDS - 1)
        row = jnp.where(active, wi >> 7, _DESC_SLOTS * _SLOT_ROWS)
        ring(k, 3)[row, wi & (LANES - 1)] = v

    def tz8(lo, hi):
        t = _tzb32(lo)
        return jnp.where(t < 4, t, 4 + _tzb32(hi))

    def extend8(k, a, c):
        alo, ahi = readers[k][2](a)
        blo, bhi = readers[k][2](c)
        return tz8(alo ^ blo, ahi ^ bhi)

    # --- one common-path step for chain k ------------------------------------
    def step(S, k):
        R = S[k * _NREG:(k + 1) * _NREG]
        i, rs, le, anch, nsym, pos, klen, mode, req, rdy, wp, ct, \
            win, wca, wnv, dof = R
        end = ends[k]
        stalled = req != 0

        do_a = jnp.logical_and(rs < le, jnp.logical_not(stalled))
        drained = rs >= le
        do_b1 = jnp.logical_and(
            drained, jnp.logical_and(mode == _M_SCAN,
                                     jnp.logical_not(stalled)))
        do_b2 = jnp.logical_and(
            drained, jnp.logical_and(mode >= _M_MF,
                                     jnp.logical_and(mode <= _M_MCH,
                                                     jnp.logical_not(
                                                         stalled))))

        # --- A: one literal run --------------------------------------------
        run = jnp.minimum(16, le - rs)
        a_desc = jnp.int32(-0x80000000) | ((run - 1) << 25)
        a_nsym = nsym + 1
        a_anch = jnp.where((a_nsym & 1) == 0, rs + run, anch)
        a_rs = rs + run

        # --- B1: scan + probe ------------------------------------------------
        # a retry after the rare-path usable service consumes the saved
        # jump target: the rings advanced to cover it, so the nv read at
        # i+1 may be evicted (its value is unselected then)
        posrdy0 = (rdy & _RD_POS) != 0
        nxt = jnp.where(posrdy0, ct,
                        jnp.minimum(nv_at(k, i + 1), end))
        gap = nxt - rs
        pc = (gap - 1) >> 5
        big = pc > 0                     # drain quanta, stay in SCAN
        b1_le_big = rs + (pc << 5)
        at_end = nxt >= end
        # ring coverage for the landing position; any probe that cannot
        # complete inline (rings lag, or the head candidate needs the
        # chain walk) defers WHOLLY to the rare-path usable service —
        # reads must never touch in-flight (unwaited) slots
        lag = jnp.logical_or(
            ((nxt + 80) >> 12) > win,
            jnp.logical_or(((nxt + 2) >> 10) > wca,
                           ((nxt + 2) >> 10) > wnv))
        cw = cand_at(k, nxt)
        posrdy = (rdy & _RD_POS) != 0
        head_ok = jnp.logical_and(cw >= 0, cw + 4 <= anch)
        need_walk = jnp.logical_and(cw >= 0, cw + 4 > anch)
        p_head = jnp.where(
            jnp.logical_and(head_ok, anch - cw <= 65534), cw,
            jnp.int32(_NONE))
        b1_pos = jnp.where(posrdy, pos, p_head)
        flush32 = (nxt - rs) == 32
        hit = b1_pos != _NONE
        b1_abort = jnp.logical_and(
            jnp.logical_not(big),
            jnp.logical_and(
                jnp.logical_not(at_end),
                jnp.logical_and(jnp.logical_not(posrdy),
                                jnp.logical_or(lag, need_walk))))
        b1_req = jnp.where(
            b1_abort,
            req | _RQ_WALK | jnp.where(lag, _RQ_CATCH, 0), req)
        b1_ct = jnp.where(b1_abort, nxt, ct)
        b1_commit = jnp.logical_and(jnp.logical_not(big),
                                    jnp.logical_not(b1_abort))
        b1_i = jnp.where(b1_commit, nxt, i)
        b1_le = jnp.where(
            big, b1_le_big,
            jnp.where(b1_commit,
                      jnp.where(at_end, nxt,
                                jnp.where(hit, nxt,
                                          jnp.where(flush32, rs + 32,
                                                    le))),
                      le))
        b1_mode = jnp.where(
            b1_commit,
            jnp.where(at_end, _M_DONE,
                      jnp.where(hit, jnp.where(flush32, _M_MFR, _M_MF),
                                _M_SCAN)),
            mode)
        b1_pos_out = jnp.where(b1_commit, b1_pos, pos)
        b1_rdy = jnp.where(b1_commit, rdy & ~_RD_POS, rdy)

        # --- B2: match -------------------------------------------------------
        none_pos = pos == _NONE
        firstm = mode <= _M_MFR
        fresh = jnp.logical_and(
            firstm,
            jnp.logical_or(mode == _M_MFR, anch - pos > 65534))
        fw = cand_at(k, i)
        f_head_ok = jnp.logical_and(fw >= 0, fw + 4 <= anch)
        f_need_walk = jnp.logical_and(
            jnp.logical_and(fresh, jnp.logical_not(posrdy)),
            jnp.logical_and(fw >= 0, fw + 4 > anch))
        f_pos = jnp.where(
            jnp.logical_and(f_head_ok, anch - fw <= 65534), fw,
            jnp.int32(_NONE))
        pos2 = jnp.where(fresh, jnp.where(posrdy, pos, f_pos), pos)
        none2 = jnp.logical_or(none_pos, pos2 == _NONE)
        klrdy = (rdy & _RD_KLEN) != 0
        k8 = extend8(k, i, pos2)
        need_ext = jnp.logical_and(jnp.logical_not(klrdy),
                                   jnp.logical_and(k8 >= 8,
                                                   jnp.logical_not(none2)))
        k_raw = jnp.where(klrdy, klen, k8)
        window = anch - pos2
        kk = jnp.where(k_raw > window, window - 1, k_raw)
        good = jnp.logical_and(kk >= 4, window <= 65534)
        code = _len_code(kk)
        adv = _code_width(code)
        b2_desc = (code << 25) | window
        b2_i = i + adv
        b2_nsym = nsym + 1
        b2_anch = jnp.where((b2_nsym & 1) == 0, b2_i, anch)
        # reprobe at the advanced cursor; a lagging or walking reprobe
        # defers to the rare-path usable service (catch-then-walk order
        # inside the service makes the combination safe)
        cont = b2_i + 5 < end
        cw2 = cand_at(k, b2_i)
        r_head_ok = jnp.logical_and(cw2 >= 0, cw2 + 4 <= b2_anch)
        lag2 = jnp.logical_or(
            ((b2_i + 80) >> 12) > win,
            jnp.logical_or(((b2_i + 2) >> 10) > wca,
                           ((b2_i + 2) >> 10) > wnv))
        r_need_walk = jnp.logical_and(
            cont,
            jnp.logical_or(lag2,
                           jnp.logical_and(cw2 >= 0, cw2 + 4 > b2_anch)))
        r_pos = jnp.where(
            jnp.logical_and(
                cont, jnp.logical_and(r_head_ok,
                                      b2_anch - cw2 <= 65534)),
            cw2, jnp.int32(_NONE))
        b2_abort = jnp.logical_and(
            jnp.logical_not(none2),
            jnp.logical_or(f_need_walk, need_ext))
        b2_emit = jnp.logical_and(jnp.logical_not(none2),
                                  jnp.logical_and(good,
                                                  jnp.logical_not(
                                                      b2_abort)))
        b2_commit = jnp.logical_not(b2_abort)
        b2_req = jnp.where(
            f_need_walk, req | _RQ_WALK,
            jnp.where(need_ext, req | _RQ_EXT,
                      jnp.where(
                          jnp.logical_and(b2_emit, r_need_walk),
                          req | _RQ_WALK
                          | jnp.where(lag2, _RQ_CATCH, 0), req)))
        b2_ct = jnp.where(f_need_walk, i,
                          jnp.where(jnp.logical_and(b2_emit,
                                                    r_need_walk),
                                    b2_i, ct))
        b2_mode = jnp.where(
            b2_commit,
            jnp.where(b2_emit,
                      jnp.where(jnp.logical_or(r_pos != _NONE,
                                               r_need_walk),
                                _M_MCH, _M_SCAN),
                      _M_SCAN),
            mode)
        b2_pos_out = jnp.where(
            b2_commit,
            jnp.where(b2_emit,
                      jnp.where(r_need_walk, jnp.int32(_NONE), r_pos),
                      pos2),
            pos)
        # the scan resumes from the cursor after the match loop (host:
        # last_i = i); keep rs == le == cursor through chained matches
        b2_cursor = jnp.where(b2_emit, b2_i, i)
        b2_rs = jnp.where(b2_commit, b2_cursor, rs)
        b2_le = jnp.where(b2_commit, b2_cursor, le)
        b2_rdy = jnp.where(b2_commit, rdy & ~(_RD_POS | _RD_KLEN), rdy)

        # --- merge ------------------------------------------------------------
        emit_a = do_a
        emit_b2 = jnp.logical_and(do_b2, jnp.logical_and(b2_emit,
                                                         b2_commit))
        d_word = jnp.where(emit_a, a_desc, b2_desc)
        desc_store(k, wp, d_word, jnp.logical_or(emit_a, emit_b2))
        wp2 = wp + jnp.where(jnp.logical_or(emit_a, emit_b2), 1, 0)
        ship_due = (wp2 >> 10) > dof  # slot dof complete (1024 words)
        ovf = wp2 > (desc_rows - 8) * LANES

        i_n = jnp.where(do_b1, b1_i, jnp.where(do_b2,
                                               jnp.where(b2_commit,
                                                         jnp.where(
                                                             b2_emit,
                                                             b2_i, i),
                                                         i), i))
        rs_n = jnp.where(do_a, a_rs, jnp.where(do_b2, b2_rs, rs))
        le_n = jnp.where(do_b1, b1_le, jnp.where(do_b2, b2_le, le))
        anch_n = jnp.where(do_a, a_anch,
                           jnp.where(jnp.logical_and(do_b2, b2_commit),
                                     jnp.where(b2_emit, b2_anch, anch),
                                     anch))
        nsym_n = jnp.where(do_a, a_nsym,
                           jnp.where(emit_b2, b2_nsym, nsym))
        pos_n = jnp.where(do_b1, b1_pos_out,
                          jnp.where(do_b2, b2_pos_out, pos))
        mode_n = jnp.where(do_b1, b1_mode, jnp.where(do_b2, b2_mode,
                                                     mode))
        mode_n = jnp.where(ovf, _M_DONE, mode_n)
        req_n = jnp.where(do_b1, b1_req, jnp.where(do_b2, b2_req, req))
        req_n = jnp.where(ship_due, req_n | _RQ_SHIP, req_n)
        rdy_n = jnp.where(do_b1, b1_rdy, jnp.where(do_b2, b2_rdy, rdy))
        ct_n = jnp.where(do_b1, b1_ct, jnp.where(do_b2, b2_ct, ct))

        out = (i_n, rs_n, le_n, anch_n, nsym_n, pos_n, klen, mode_n,
               req_n, rdy_n, wp2, ct_n, win, wca, wnv, dof)
        return S[:k * _NREG] + out + S[(k + 1) * _NREG:]

    # --- rare-path services ----------------------------------------------------
    def service(S, k):
        R = S[k * _NREG:(k + 1) * _NREG]
        i, rs, le, anch, nsym, pos, klen, mode, req, rdy, wp, ct, \
            win, wca, wnv, dof = R

        def caught(st):
            win_, wca_, wnv_ = st

            def adv_in(w):
                in_dma(k, w + 1).wait()
                in_dma(k, w + 3).start()
                return w + 1

            def adv_ca(w):
                cand_dma(k, w + 1).wait()
                cand_dma(k, w + 3).start()
                return w + 1

            def adv_nv(w):
                nv_dma(k, w + 1).wait()
                nv_dma(k, w + 3).start()
                return w + 1

            wi = jax.lax.while_loop(lambda w: ((ct + 80) >> 12) > w,
                                    adv_in, win_)
            wc = jax.lax.while_loop(lambda w: ((ct + 2) >> 10) > w,
                                    adv_ca, wca_)
            wn = jax.lax.while_loop(lambda w: ((ct + 2) >> 10) > w,
                                    adv_nv, wnv_)
            return wi, wc, wn

        win, wca, wnv = jax.lax.cond(
            (req & _RQ_CATCH) != 0, caught, lambda st: st,
            (win, wca, wnv))

        def walked(st):
            pos_, rdy_ = st
            p0 = cand_at(k, ct)

            def wcond(p):
                return jnp.logical_and(p >= 0, p + 4 > anch)

            p = jax.lax.while_loop(wcond, lambda p: cand_at(k, p), p0)
            bad = jnp.logical_or(p < 0, anch - p > 65534)
            return (jnp.where(bad, jnp.int32(_NONE), p),
                    rdy_ | _RD_POS)

        pos, rdy = jax.lax.cond((req & _RQ_WALK) != 0, walked,
                                lambda st: st, (pos, rdy))

        def extended(st):
            klen_, rdy_ = st

            def body(m):
                kacc, mm, nb = m
                nb2 = tz8(*(lambda a, b: (a[0] ^ b[0], a[1] ^ b[1]))(
                    readers[k][2](i + 8 * mm), readers[k][2](pos + 8 * mm)))
                return kacc + nb2, mm + 1, nb2

            if ext:
                def cond(m):
                    kacc, mm, nb = m
                    return jnp.logical_and(nb == 8,
                                           jnp.logical_and(kacc < 64,
                                                           mm < 9))

                kk, _, _ = jax.lax.while_loop(cond, body,
                                              (jnp.int32(8), jnp.int32(1),
                                               jnp.int32(8)))
            else:
                kk, _, _ = body((jnp.int32(8), jnp.int32(1), jnp.int32(8)))
            return kk, rdy_ | _RD_KLEN

        klen, rdy = jax.lax.cond((req & _RQ_EXT) != 0, extended,
                                 lambda st: st, (klen, rdy))

        def shipped(st):
            dof_ = st

            def need(d):
                return (wp >> 10) > d

            def ship(d):
                @pl.when(d >= 2)
                def _():
                    desc_dma(k, d - 2).wait()

                desc_dma(k, d).start()
                return d + 1

            return jax.lax.while_loop(need, ship, dof_)

        dof = jax.lax.cond((req & _RQ_SHIP) != 0, shipped, lambda d: d,
                           dof)

        out = (i, rs, le, anch, nsym, pos, klen, mode, jnp.int32(0),
               rdy, wp, ct, win, wca, wnv, dof)
        return S[:k * _NREG] + out + S[(k + 1) * _NREG:]

    # --- main loop ---------------------------------------------------------------
    def live(S):
        alive = jnp.int32(0)
        for k in range(nblk):
            R = S[k * _NREG:(k + 1) * _NREG]
            done = jnp.logical_and(R[_MODE] == _M_DONE, R[_RS] >= R[_LE])
            alive = alive | jnp.where(done, 0, 1)
        return alive != 0

    def body(S):
        for k in range(nblk):
            S = step(S, k)
        any_req = jnp.int32(0)
        for k in range(nblk):
            any_req = any_req | S[k * _NREG + _REQ]

        def serve(S):
            for k in range(nblk):
                S = jax.lax.cond(S[k * _NREG + _REQ] != 0,
                                 lambda s, k=k: service(s, k),
                                 lambda s: s, S)
            return S

        return jax.lax.cond(any_req != 0, serve, lambda s: s, S)

    S0 = ()
    for k in range(nblk):
        z = jnp.int32(0)
        mode0 = jnp.where(sizes[k] > 0, _M_SCAN, _M_DONE)
        S0 = S0 + (bases[k], bases[k], bases[k], bases[k], z,
                   jnp.int32(_NONE), z, mode0, z, z, z, z,
                   bases[k] >> 12, bases[k] >> 10, bases[k] >> 10, z)

    S = jax.lax.while_loop(live, body, S0)

    # epilogue: drain rings, ship descriptor tails, report
    for k in range(nblk):
        R = S[k * _NREG:(k + 1) * _NREG]
        in_dma(k, R[_WIN] + 1).wait()
        in_dma(k, R[_WIN] + 2).wait()
        cand_dma(k, R[_WCA] + 1).wait()
        cand_dma(k, R[_WCA] + 2).wait()
        nv_dma(k, R[_WNV] + 1).wait()
        nv_dma(k, R[_WNV] + 2).wait()

        dof = R[_DOF]

        @pl.when(dof >= 2)
        def _(k=k, dof=dof):
            desc_dma(k, dof - 2).wait()

        @pl.when(dof >= 1)
        def _(k=k, dof=dof):
            desc_dma(k, dof - 1).wait()

        last = R[_WP] // (_SLOT_BYTES // 4) + 1

        def drain(st, k=k, last=last):
            s = st
            d = desc_dma(k, s)
            d.start()
            d.wait()
            return s + 1

        jax.lax.while_loop(lambda s: s <= last, drain, dof)

        osz_ref[blocks[k], 0] = R[_NSYM]
        osz_ref[blocks[k], 1] = jnp.where(
            R[_WP] > (desc_rows - 8) * LANES, 1, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "ext", "nblk",
                                             "desc_rows"))
def flat_decide_batch(input_words, cand_words, nv_words, meta, *,
                      ext=True, nblk=1, desc_rows=DESC_ROWS,
                      interpret=False):
    """Gang decide pass: returns (desc planes (B, desc_rows, 128),
    stats (B, 8) with rows [n_sym, overflow, 0...])."""
    B = input_words.shape[0]
    if B % nblk:
        raise ValueError("flat_decide_batch needs B % nblk == 0")
    kernel = functools.partial(_flat_decide_kernel, nblk=nblk, ext=ext,
                               desc_rows=desc_rows)
    scratch = []
    for _ in range(nblk):
        scratch.append(pltpu.SMEM((_IN_SLOTS * _SLOT_ROWS, LANES),
                                  jnp.int32))
        scratch.append(pltpu.SMEM((_POSRING_SLOTS * _SLOT_ROWS, LANES),
                                  jnp.int32))
        scratch.append(pltpu.SMEM((_POSRING_SLOTS * _SLOT_ROWS, LANES),
                                  jnp.int32))
        scratch.append(pltpu.SMEM((_DESC_SLOTS * _SLOT_ROWS + 1, LANES),
                                  jnp.int32))
    for _ in range(nblk):
        scratch.append(pltpu.SemaphoreType.DMA((4,)))
        scratch.append(pltpu.SemaphoreType.DMA((4,)))
        scratch.append(pltpu.SemaphoreType.DMA((4,)))
        scratch.append(pltpu.SemaphoreType.DMA((2,)))
    return pl.pallas_call(
        kernel,
        grid=(B // nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, desc_rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, 8), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(meta, input_words, cand_words, nv_words)


@functools.partial(jax.jit, static_argnames=("interpret", "ext", "nblk",
                                             "desc_rows", "out_rows"))
def flat_emit_batch(input_words, cand_words, meta, *, ext=True, nblk=1,
                    desc_rows=DESC_ROWS, out_rows=OUT_ROWS_BULK,
                    interpret=False):
    """Device-resident flat emission: gang decide -> sort layout. Same
    contract as encode_bulk.emit_bulk_batch (payloads byte-identical to
    the host level-1 emission); osz[:, 2] flags overflowed blocks."""
    from .encode_bulk import next_valid

    nv = next_valid(cand_words)
    desc, stats = flat_decide_batch(input_words, cand_words, nv, meta,
                                    ext=ext, nblk=nblk,
                                    desc_rows=desc_rows,
                                    interpret=interpret)
    words, osz = layout_batch(desc, stats[:, 0], input_words, meta,
                              ext=ext, out_rows=out_rows)
    osz = osz.at[:, 2].set(osz[:, 2] | stats[:, 1])
    return words, osz


def flat_emit_block(block: bytes, cand, *, ext=True, base=0, nblk=1,
                    interpret=True):
    """Single-block helper for tests: returns (payload bytes, overflow)."""
    from .encode_emit import (pack_input_words, pack_cand_words,
                              payload_from_words)

    iw = pack_input_words(block)[None]
    cw = pack_cand_words(np.asarray(cand, np.int32))[None]
    meta = np.zeros((1, 8), np.int32)
    meta[0, 0] = len(block) - base
    meta[0, 1] = base
    rows = max(((len(block) * 2) // ROW_BYTES) + 32, 128)
    rows += (-rows) % 8
    orows = (len(block) * 5 // 4 + 8192) // ROW_BYTES + 8
    orows += (-orows) % 8
    words, osz = flat_emit_batch(jnp.asarray(iw), jnp.asarray(cw),
                                 jnp.asarray(meta), ext=ext, nblk=nblk,
                                 desc_rows=rows, out_rows=orows,
                                 interpret=interpret)
    osz = np.asarray(osz)
    return payload_from_words(words[0], int(osz[0, 0])), int(osz[0, 2])


# --- host-side helpers --------------------------------------------------------

def descs_from_tokens(payload: bytes, ext: bool) -> np.ndarray:
    """Derive the descriptor stream from an emitted payload (tests): the
    tokenizer's symbol list maps 1:1 onto descriptor words."""
    from ..reference_codec import tokenize_block

    dst, src, lns, lit, size = tokenize_block(payload, ext)
    # the tokenizer's inner pair loop parses the tail-pad control bit as a
    # phantom 1-byte literal when a stream ends mid-pair; real symbols
    # start strictly below the declared size
    while dst and dst[-1] >= size:
        dst.pop(), src.pop(), lns.pop(), lit.pop()
    out = np.zeros(len(dst), np.int64)
    for k in range(len(dst)):
        if lit[k]:
            out[k] = (1 << 31) | ((lns[k] - 1) << 25)
        else:
            if ext and lns[k] in (32, 48, 64):
                code = {32: 0, 48: 1, 64: 2}[lns[k]]
            else:
                code = lns[k] - 1
            anchor = dst[k - (k & 1)]
            out[k] = (code << 25) | (anchor - src[k])
    return out.astype(np.uint32).view(np.int32)


def pack_desc_words(desc: np.ndarray, rows: int) -> np.ndarray:
    buf = np.zeros(rows * LANES, np.int32)
    buf[:len(desc)] = desc
    return buf.reshape(rows, LANES)


def layout_block(block: bytes, desc: np.ndarray, *, ext=True, base=0,
                 out_rows=0) -> bytes:
    """Single-block test helper: descriptors -> payload bytes."""
    from .encode_emit import pack_input_words, payload_from_words

    if out_rows <= 0:  # worst case ~1.25x + slot/slack margin
        out_rows = (len(block) * 5 // 4 + 8192) // ROW_BYTES + 8
        out_rows += (-out_rows) % 8

    rows = max((len(desc) + LANES - 1) // LANES + 8, 16)
    rows += (-rows) % 8
    iw = pack_input_words(block)[None]
    dw = pack_desc_words(np.asarray(desc, np.int32), rows)[None]
    meta = np.zeros((1, 8), np.int32)
    meta[0, 0] = len(block) - base
    meta[0, 1] = base
    words, osz = layout_batch(jnp.asarray(dw),
                              jnp.asarray([len(desc)], dtype=jnp.int32),
                              jnp.asarray(iw), jnp.asarray(meta), ext=ext,
                              out_rows=out_rows)
    osz = np.asarray(osz)
    assert osz[0, 2] == 0, "layout overflow on test block"
    return payload_from_words(words[0], int(osz[0, 0]))
