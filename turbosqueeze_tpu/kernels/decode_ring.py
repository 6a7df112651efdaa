"""Fused on-chip decode v2: K interleaved block streams per kernel instance.

The r1 fused kernel (decode_stream.py) decodes ONE block per grid step, so
the ~85-cycle crossbar latency of each pair reconstruction and the scalar
parse chain serialize down a single token stream. Blocks are independent,
and slope-measured microbenchmarks (bench/microbench_scheduling.py, recorded in
BASELINE.md) show
  * gathers/RMWs on SEPARATE scratch refs pipeline across streams at a
    marginal ~4-5 cyc/pair (one shared scratch serializes them at ~90+:
    Mosaic must assume dynamic row indices alias);
  * independent scalar parse chains interleave on the scalar unit
    (13 -> 7 cyc/byte at 8 streams);
  * but ONLY straight-line code pipelines: every lax.cond/pl.when is a
    scheduling barrier, so the loop body keeps all per-stream parse work
    and all vector reconstruction in single uninterrupted phases, with
    the rare conditional maintenance (window advance, eviction, rebase)
    clustered outside them.
So this kernel runs K blocks in lockstep, one control group each per loop
iteration, every stream on its own VMEM scratch ref.

K full blocks do not fit VMEM (a 4 MiB block's unified buffer is ~9.5 MB),
so per-stream state shrinks to what the format actually requires:

  * a 272-row (136 KiB) SLIDING OUTPUT WINDOW — sound because match
    offsets are 16-bit (<= 65534 bytes back from the pair anchor,
    tsq_encode.cpp:298), so every match source lies within the last 129
    rows below the write frontier. Window coordinates are linear
    (byte - base): when the local frontier nears the top (row 269), the
    last 134 rows are copied down to row 0 and the base advances — a
    bulk 8-row-chunk copy once per ~67 KiB of output (~2% of the byte
    traffic), which removes every per-pair wraparound/seam branch a
    mod-addressed ring would need.
  * decoded rows are evicted to HBM in 8-row DMA chunks as soon as the
    frontier leads the eviction cursor by 16 rows (so rows are always
    evicted long before a rebase discards them), and drained at end of
    stream. Chunk c is waited at the start of chunk c+1: at most one
    eviction in flight, and its source rows are provably untouched by
    later writes or rebases until then.
  * a 4-slot x 4-row payload window ring, DMA'd ahead of the parse cursor
    TWICE: into SMEM (scalar bitstream parse, as in r1) and into VMEM
    rows [PAY_BASE..) of the same scratch (vector literal-copy sources),
    + a 2-row seam mirror tied to slot-0 window DMAs so 2-row literal
    reads at the pay-ring top never wrap mid-read.

The parse keeps tsq_decode.cpp:129-315 semantics (byte-exact, including
the corrupt-stream tolerance of the r1 kernels: sources are clamped in
bounds, every write is byte-masked, groups always advance). Streams of a
batch may decode blocks of different sizes: a finished stream's symbol
sizes clamp to zero, freezing its frontier (and with it evictions and
rebases) until the last stream finishes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_tokens import LANES, OUT_ROWS, ROW_BYTES, _PairConsts

_WIN_ROWS = 4                         # 2 KiB parse/literal window
_WIN_BYTES = _WIN_ROWS * ROW_BYTES
# Maintenance (window advance / eviction / rebase) runs every 4th loop
# iteration: conds are scheduling barriers, so they are amortized. All
# slacks below are sized for that 4-iteration check period: a group
# consumes <= 133 payload bytes and emits <= 2 output rows.
_MAINT_PERIOD = 4
_GROUP_SLACK = 704                    # 133 * (4 + 1) + margin

W_ROWS = 288                          # sliding output window rows
_REBASE_AT = 278                      # local frontier row triggering rebase
_REBASE_KEEP = 134                    # rows kept on rebase (>= 129 + slack)
PAY_SLOTS = 4
_PAY_ROWS = PAY_SLOTS * _WIN_ROWS                 # 16 rows, 8 KiB
_PAY_MASK = _PAY_ROWS * ROW_BYTES - 1
PAY_BASE = W_ROWS                     # pay ring rows follow the window
_PAY_BASE_BYTES = PAY_BASE * ROW_BYTES
_MIRROR_ROW = PAY_BASE + _PAY_ROWS    # 2-row seam mirror of pay slot 0
SCR_ROWS = _MIRROR_ROW + 2            # per-stream scratch rows (290)

_EVICT_CHUNK = 8                      # rows per eviction DMA
_EVICT_LEAD = 16                      # start evicting at this frontier lead


def _reconstruct_pair_win(u, cs, dst1, ln1, s1, dst2, ln2, s2):
    """One format pair's byte movement against the sliding window: scalar
    (window-local dst/src bytes + true lengths) in, one crossbar pass and
    three masked row RMWs out. Identical math to decode_tokens.
    _reconstruct_pair (see there for the derivation); local coordinates
    preserve every congruence the kernel uses (byte-in-word, word-in-row,
    row deltas), and rows stay inside [0, W_ROWS) by the window invariant
    (sources clamped by the parser, frontier below _REBASE_AT + 2)."""
    lane8, row8 = cs.lane8, cs.row8
    half8, tok_hi, byte_hi = cs.half8, cs.tok_hi, cs.byte_hi

    def fields(dst, s):
        delta = s - dst
        omega8 = (delta & 3) * 8
        src_row = s >> 9
        cc = (dst >> 9) * LANES + (delta >> 2) - src_row * LANES
        return omega8, src_row, cc

    om1, srow1, c1 = fields(dst1, s1)
    om2, srow2, c2 = fields(dst2, s2)

    win1 = u[pl.ds(srow1, 2), :]
    win2 = u[pl.ds(srow2, 2), :]
    stack = jnp.concatenate([win1, win1, win2, win2], axis=0)

    cvec = jnp.where(tok_hi, c2, c1) + half8
    shifted = lane8 + cvec
    g = jnp.take_along_axis(stack, shifted & (LANES - 1), axis=1)
    wsel = (shifted & 255) < LANES

    def images(lo, hi, w):
        return jnp.where(w, lo, hi), jnp.where(w, hi, lo)

    a1im, b1im = images(g[0:1], g[1:2], wsel[0:1])
    a1p, b1p = images(g[2:3], g[3:4], wsel[2:3])
    a2im, b2im = images(g[4:5], g[5:6], wsel[4:5])
    a2p, b2p = images(g[6:7], g[7:8], wsel[6:7])

    ab = jnp.concatenate([a1im, b1im, a2im, b2im], axis=0)
    abp = jnp.concatenate([a1p, b1p, a2p, b2p], axis=0)
    om = jnp.where(byte_hi, om2, om1)
    val4 = jnp.where(
        om == 0, ab,
        jax.lax.shift_right_logical(ab, om)
        | jax.lax.shift_left(abp, 32 - jnp.maximum(om, 8)))

    r1 = dst1 >> 9
    m_hi = jnp.logical_and(row8 >= 3, row8 < 6)
    rvec = jnp.where(m_hi, dst2 >> 9, dst1 >> 9)
    xvec = jnp.where(row8 < 6, r1 + row8 % 3, -1)
    dstv = jnp.where(m_hi, dst2, dst1)
    lnv = jnp.where(row8 < 6, jnp.where(m_hi, ln2, ln1), 0)

    va = jnp.concatenate([val4[0:1], val4[0:1], val4[0:1],
                          val4[2:3], val4[2:3], val4[2:3],
                          val4[0:1], val4[0:1]], axis=0)
    vb = jnp.concatenate([val4[1:2], val4[1:2], val4[1:2],
                          val4[3:4], val4[3:4], val4[3:4],
                          val4[1:2], val4[1:2]], axis=0)
    val8 = jnp.where(xvec == rvec, va, vb)

    base = xvec * ROW_BYTES + lane8 * 4
    m8 = jnp.zeros((8, LANES), jnp.int32)
    for kk in range(4):
        pos = base + kk
        inside = jnp.logical_and(pos >= dstv, pos < dstv + lnv)
        m8 = m8 | jnp.where(inside, jnp.int32(0xFF) << (8 * kk), 0)

    tt = val8 & m8
    vrows = tt[0:3, :] | tt[3:6, :]
    mrows = m8[0:3, :] | m8[3:6, :]
    for j in range(3):
        cur = u[pl.ds(r1 + j, 1), :]
        u[pl.ds(r1 + j, 1), :] = (
            (cur & ~mrows[j:j + 1, :]) | vrows[j:j + 1, :])


def _decode_ring_kernel(meta_ref, payload_hbm, dict_hbm, out_hbm,
                        *refs, K, pay_rows, out_rows, dict_rows,
                        _skip=()):
    g = pl.program_id(0)
    cs = _PairConsts()
    scr = refs[:K]                    # per-stream VMEM scratch
    pwin = refs[K:2 * K]              # per-stream SMEM parse windows
    sem_w = refs[2 * K]               # (K, 4) SMEM window DMA sems
    sem_v = refs[2 * K + 1]           # (K, 4) VMEM window DMA sems
    sem_m = refs[2 * K + 2]           # (K,) pay seam-mirror DMA sems
    sem_e = refs[2 * K + 3]           # (K, 2) eviction DMA sems
    sem_d = refs[2 * K + 4]           # (K,) dict staging sems

    def win_smem(k, bk, w):
        row0 = jnp.clip(w * _WIN_ROWS, 0, pay_rows - _WIN_ROWS)
        return pltpu.make_async_copy(
            payload_hbm.at[bk, pl.ds(row0, _WIN_ROWS)],
            pwin[k].at[w & 3], sem_w.at[k, w & 3])

    def win_vmem(k, bk, w):
        row0 = jnp.clip(w * _WIN_ROWS, 0, pay_rows - _WIN_ROWS)
        return pltpu.make_async_copy(
            payload_hbm.at[bk, pl.ds(row0, _WIN_ROWS)],
            scr[k].at[pl.ds(PAY_BASE + (w & 3) * _WIN_ROWS, _WIN_ROWS)],
            sem_v.at[k, w & 3])

    def win_mirror(k, bk, w):
        # slot-0 windows double into the 2-row seam mirror so 2-row pay
        # reads at pay-ring row 15 never wrap mid-read
        row0 = jnp.clip(w * _WIN_ROWS, 0, pay_rows - 2)
        return pltpu.make_async_copy(
            payload_hbm.at[bk, pl.ds(row0, 2)],
            scr[k].at[pl.ds(_MIRROR_ROW, 2)], sem_m.at[k])

    def start_window(k, bk, w):
        win_smem(k, bk, w).start()
        win_vmem(k, bk, w).start()

        @pl.when(w & 3 == 0)
        def _():
            win_mirror(k, bk, w).start()

    def wait_window(k, bk, w):
        win_smem(k, bk, w).wait()
        win_vmem(k, bk, w).wait()

        @pl.when(w & 3 == 0)
        def _():
            win_mirror(k, bk, w).wait()

    def byte_at(k, i):
        slot = (i >> 11) & 3
        off = i & (_WIN_BYTES - 1)
        w = pwin[k][slot, off >> 9, (off >> 2) & (LANES - 1)]
        return (w >> ((i & 3) * 8)) & 0xFF

    def u16_at(k, i):
        # unaligned 16-bit LE read out of a word pair; logical shift (an
        # arithmetic >> would sign-extend w0's high byte into the second
        # result byte at sh=24)
        wi = i >> 2
        w0 = pwin[k][(wi >> 9) & 3, (wi >> 7) & 3, wi & (LANES - 1)]
        wj = wi + 1
        w1 = pwin[k][(wj >> 9) & 3, (wj >> 7) & 3, wj & (LANES - 1)]
        sh = (i & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        return (lo | (w1 << (32 - jnp.maximum(sh, 8)))) & 0xFFFF

    def evict(k, bk, E, base_row, par):
        # window rows [E - base_row, +8) -> HBM rows [E, +8); E 8-aligned.
        # The local clip ceiling is the SCRATCH bound, not the window
        # bound: the final drain's overshoot chunks may start at local
        # rows up to ~271 and read a tail of pay-ring rows (garbage that
        # only ever lands on HBM slack rows past the declared size); a
        # tighter clamp would silently shift REAL final rows.
        row = jnp.minimum(E, out_rows - _EVICT_CHUNK)
        loc = jnp.clip(E - base_row, 0, SCR_ROWS - _EVICT_CHUNK)
        return pltpu.make_async_copy(
            scr[k].at[pl.ds(loc, _EVICT_CHUNK)],
            out_hbm.at[bk, pl.ds(row, _EVICT_CHUNK)], sem_e.at[k, par])

    # --- prologue: dict staging + window prefetch for every stream ----------
    for k in range(K):
        bk = g * K + k
        if dict_rows:
            pltpu.make_async_copy(
                dict_hbm, scr[k].at[pl.ds(0, dict_rows)],
                sem_d.at[k]).start()
        start_window(k, bk, 0)
        start_window(k, bk, 1)
        start_window(k, bk, 2)
    for k in range(K):
        bk = g * K + k
        wait_window(k, bk, 0)
        if dict_rows:
            pltpu.make_async_copy(
                dict_hbm, scr[k].at[pl.ds(0, dict_rows)], sem_d.at[k]).wait()

    def parse_group(k, ext, dead, base_bytes, i, j):
        """One control group (scalar unit, straight-line): advanced
        cursors + the 4 pairs' (dst_local, ln, src_local) fields. `dead`
        clamps every symbol size to 0 once the stream is past its end."""
        ctrl = byte_at(k, i)
        i += 1
        fields = []
        for pair_ix in range(4):
            size_byte = byte_at(k, i)
            i += 1
            anchor = j
            pair = [anchor - base_bytes]
            for half in range(2):
                nib = (size_byte >> 4) if half == 0 else (size_byte & 15)
                is_lit = (ctrl >> (7 - pair_ix * 2 - half)) & 1
                lit_sz = nib + 1
                mat_sz = jnp.where(jnp.logical_and(ext != 0, nib < 3),
                                   32 + 16 * nib, nib + 1)
                off = u16_at(k, i)
                src_m = jnp.clip(anchor - off - base_bytes, 0,
                                 (W_ROWS - 2) * ROW_BYTES - 1)
                sz = jnp.where(dead, 0,
                               jnp.where(is_lit == 1, lit_sz, mat_sz))
                src_r = jnp.where(
                    is_lit == 1, _PAY_BASE_BYTES + (i & _PAY_MASK), src_m)
                i = i + jnp.where(is_lit == 1, lit_sz, 2)
                pair += [sz, src_r]
                j = j + sz
            fields.append(tuple(pair))
        return i, j, tuple(fields)

    def reconstruct_group(k, flat):
        for p in range(4):
            d1, l1, s1, l2, s2 = flat[5 * p:5 * p + 5]
            _reconstruct_pair_win(scr[k], cs, d1, l1, s1, d1 + l1, l2, s2)

    NF = 20   # carried fields: 4 pairs x (dst1, ln1, src1, ln2, src2)
    NS = 7 + NF

    def parse_flat(k, ext, size_end, i, j, base_row):
        dead = j >= size_end
        i, j, fields = parse_group(k, ext, dead, base_row * ROW_BYTES, i, j)
        flat = []
        for pr in fields:
            flat += list(pr)
        return i, j, flat

    def body(c):
        t = c[-1]
        sts = [list(c[NS * k:NS * k + NS]) for k in range(K)]

        # phase V: reconstruct the PREVIOUS iteration's parsed groups
        # (vector). Software pipelining: these consume carried fields, so
        # they are data-independent of this iteration's scalar parse and
        # the VLIW scheduler can overlap the two (the r1 kernel measured
        # 1.57x from exactly this; without it the phases are additive).
        if "recon" not in _skip:
            for k in range(K):
                reconstruct_group(k, sts[k][7:])

        # phase M: gated, clustered maintenance
        def maint_all(args):
            outs = []
            for k in range(K):
                bk = g * K + k
                i, j, waited, E, par, base_row, pend = \
                    args[7 * k:7 * k + 7]
                hi_w = (i + _GROUP_SLACK - 1) >> 11

                def advance(st, k=k, bk=bk):
                    w_, = st
                    wait_window(k, bk, w_ + 1)
                    start_window(k, bk, w_ + 3)
                    return (w_ + 1,)

                (waited,) = jax.lax.cond(hi_w > waited, advance,
                                         lambda st: st, (waited,))

                def do_evict(st, k=k, bk=bk):
                    E_, p_, pd_, b_ = st

                    @pl.when(pd_ != 0)
                    def _():
                        evict(k, bk, E_ - _EVICT_CHUNK, b_, p_ ^ 1).wait()

                    evict(k, bk, E_, b_, p_).start()
                    return E_ + _EVICT_CHUNK, p_ ^ 1, jnp.int32(1), b_

                # up to 2 chunks per check: the frontier can grow 8 rows
                # per period at max expansion, so one chunk would fall
                # behind and let a rebase discard unevicted rows
                for _ in range(2):
                    E, par, pend, _b = jax.lax.cond(
                        (j >> 9) - E >= _EVICT_LEAD, do_evict,
                        lambda st: st, (E, par, pend, base_row))

                def do_rebase(st, k=k, j=j):
                    b_, = st
                    f_loc = (j >> 9) - b_
                    src0 = f_loc - (_REBASE_KEEP - 3)

                    def cp(c2, _):
                        v = scr[k][pl.ds(src0 + c2 * 8, 8), :]
                        scr[k][pl.ds(c2 * 8, 8), :] = v
                        return 0

                    jax.lax.fori_loop(0, _REBASE_KEEP // 8 + 1, cp, 0)
                    return (b_ + src0,)

                (base_row,) = jax.lax.cond(
                    (j >> 9) - base_row >= _REBASE_AT, do_rebase,
                    lambda st: st, (base_row,))
                outs += [i, j, waited, E, par, base_row, pend]
            return tuple(outs)

        if "maint" not in _skip:
            mstate = tuple(v for st in sts for v in st[:7])
            mstate = jax.lax.cond((t & (_MAINT_PERIOD - 1)) == 0,
                                  maint_all, lambda a: a, mstate)
            for k in range(K):
                sts[k][:7] = list(mstate[7 * k:7 * k + 7])

        # phase S: parse the next group per stream (scalar, straight-line)
        for k in range(K):
            bk = g * K + k
            ext = meta_ref[bk, 0]
            size_end = meta_ref[bk, 2] + meta_ref[bk, 1]
            i, j, flat = parse_flat(k, ext, size_end, sts[k][0],
                                    sts[k][1], sts[k][5])
            sts[k][0], sts[k][1] = i, j
            sts[k][7:] = flat
        return tuple(v for st in sts for v in st) + (t + 1,)

    def cond(c):
        alive = jnp.int32(0)
        for k in range(K):
            bk = g * K + k
            size_end = meta_ref[bk, 2] + meta_ref[bk, 1]
            alive = alive | (c[NS * k + 1] < size_end)
        return alive != 0

    # prime the pipeline: parse group 0 of every stream before the loop
    init = []
    for k in range(K):
        bk = g * K + k
        ext = meta_ref[bk, 0]
        size_end = meta_ref[bk, 2] + meta_ref[bk, 1]
        i0, j0, flat0 = parse_flat(k, ext, size_end, jnp.int32(3),
                                   meta_ref[bk, 2], jnp.int32(0))
        init += [i0, j0, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                 jnp.int32(0), jnp.int32(0)] + flat0
    final = jax.lax.while_loop(cond, body, tuple(init) + (jnp.int32(1),))

    # --- epilogue: drain the pipeline, in-flight DMAs + window rows --------
    if "recon" not in _skip:
        for k in range(K):
            reconstruct_group(k, final[NS * k + 7:NS * k + NS])
    for k in range(K):
        bk = g * K + k
        i, j, waited, E, par, base_row, pend = final[NS * k:NS * k + 7]
        wait_window(k, bk, waited + 1)
        wait_window(k, bk, waited + 2)

        @pl.when(pend != 0)
        def _():
            evict(k, bk, E - _EVICT_CHUNK, base_row, par ^ 1).wait()

        size_end = meta_ref[bk, 2] + meta_ref[bk, 1]
        end_row = jnp.minimum(((size_end + ROW_BYTES - 1) >> 9) + 2,
                              out_rows)

        def drain_body(st, k=k, bk=bk, base_row=base_row):
            E_, p_ = st
            dma = evict(k, bk, E_, base_row, p_)
            dma.start()
            dma.wait()
            return E_ + _EVICT_CHUNK, p_ ^ 1

        jax.lax.while_loop(lambda st: st[0] < end_row, drain_body, (E, par))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "out_rows", "streams",
                                    "_skip"))
def decode_ring_batch(payload_words, meta, dict_words=None, *,
                      interpret=False, out_rows: int = OUT_ROWS,
                      streams: int = 8, _skip=()):
    """Decode a batch of blocks from RAW payload words, `streams` blocks in
    lockstep per kernel instance (B must be a multiple of `streams`).

    payload_words: (B, pay_rows, 128) i32 zero-padded compressed payloads.
    meta: (B, 8) i32 with [ext, declared_size, dict_len, 0...] per block.
    dict_words: optional (dict_rows, 128) i32 replicated preset dictionary
    (dict_rows <= 128: the format's 64 KiB window). Returns
    (B, out_rows, 128) i32; decoded bytes follow the staged dictionary —
    callers slice [dict_len : dict_len + size].
    """
    B = payload_words.shape[0]
    K = streams
    if B % K:
        raise ValueError(f"batch {B} not a multiple of streams {K}")
    pay_rows = payload_words.shape[1]
    if pay_rows % _WIN_ROWS or pay_rows < _WIN_ROWS:
        raise ValueError(
            f"pay_rows must be a positive multiple of {_WIN_ROWS}")
    if out_rows % _EVICT_CHUNK:
        # eviction clamps the HBM destination row to out_rows-8 without
        # adjusting the window source; a ragged out_rows would silently
        # shift the final rows
        raise ValueError(
            f"out_rows must be a multiple of {_EVICT_CHUNK}, got {out_rows}")
    if dict_words is None:
        dict_words = jnp.zeros((8, LANES), jnp.int32)
        dict_rows = 0
    else:
        dict_rows = dict_words.shape[0]
        if dict_rows > 128:
            raise ValueError("dictionary exceeds the 64 KiB format window")
    kernel = functools.partial(
        _decode_ring_kernel, K=K, pay_rows=pay_rows, out_rows=out_rows,
        dict_rows=dict_rows, _skip=_skip)
    return pl.pallas_call(
        kernel,
        grid=(B // K,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # whole (B, 8) meta
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, LANES), jnp.int32),
        scratch_shapes=(
            [pltpu.VMEM((SCR_ROWS, LANES), jnp.int32) for _ in range(K)]
            + [pltpu.SMEM((PAY_SLOTS, _WIN_ROWS, LANES), jnp.int32)
               for _ in range(K)]
            + [pltpu.SemaphoreType.DMA((K, PAY_SLOTS)),
               pltpu.SemaphoreType.DMA((K, PAY_SLOTS)),
               pltpu.SemaphoreType.DMA((K,)),
               pltpu.SemaphoreType.DMA((K, 2)),
               pltpu.SemaphoreType.DMA((K,))]),
        interpret=interpret,
    )(meta, payload_words, dict_words)
