"""Bulk reconstruction kernel: wave-free record-stream decode.

Round-3 replacement for the per-pair fused decoder's reconstruction
phase. The host resolver (csrc/tsq_bulk.cpp, native.bulk_prep) turns a
block payload into:

  * a compacted LITERAL plane (non-constant literal bytes, in order),
  * a row-grouped RECORD stream: ordered entries, one 512-byte output
    row each (rows may repeat), holding copy/fill records that cover
    every output byte exactly once, each copy reading a single source
    row of already-final space.

This kernel executes the stream. Per entry: load the output row into a
register accumulator, apply the records, store the row once. Records
read only from (a) the U plane — a 130-row tail of previous 2 MiB
windows' output followed by the literal plane — which the record loop
never writes, or (b) W rows finalized by earlier entries (stream order
is the topological order; the resolver guarantees an entry never reads
bytes its own accumulator holds). Compare the fused kernel
(decode_stream.py): no bitstream parse on the scalar unit (21.7
cyc/token measured floor — the parse lives on the host, ~80 MB/s/core
and embarrassingly parallel across blocks/cores),
no read-modify-writes, and no same-ref store->read chains on the hot
path, which is what Mosaic's index-blind aliasing serializes
(BASELINE.md round-2 roofline).

Records are processed in gangs of 8, one record per SUBLANE: parameters
are extracted from a VMEM mirror of the stream by crossbar takes (the
scalar unit only supplies the 8 source-row addresses), and all
alignment/mask/select math runs once per gang at (8,128). The gang loop
is explicitly software-pipelined — gang g's gathered vectors ride the
loop carry while gang g+1's loads issue — because Mosaic does not
overlap chains across fori iterations on its own (measured: 93
cyc/record fully serial, 27 with straight-line ganging, the pipeline
hides the remaining crossbar latency).

Geometry is shared with the resolver: 2 MiB windows (4096 rows),
130-row tail reach (65534-byte offsets + a 64-byte pre-window anchor,
/root/reference/tsq_encode.cpp:293-298), record encodings documented in
csrc/tsq_bulk.cpp.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_tokens import LANES, OUT_ROWS, ROW_BYTES

WIN_BYTES = 1 << 21
WIN_ROWS = WIN_BYTES // ROW_BYTES           # 4096
TAIL_ROWS = 130                             # >= (65534 + 64) / 512
TAIL_BYTES = TAIL_ROWS * ROW_BYTES
MAX_WIN = 2                                 # 4 MiB block / 2 MiB window
METAN_WORDS = 16                            # bulk_mergen meta ABI width

_REC_SLOT_WORDS = 1024                      # ring slot = (8,128) i32
_REC_SLOTS = 8
# an entry consumes <= 2 + 2*120 words (csrc kBulkMaxEntryRecs); the ring
# must have this much lookahead beyond the cursor before parsing an entry
_ENTRY_SLACK = 256
_ENTRY_SLACK2 = 512  # two entries per iteration in the pair kernel


def _machinery(ring_ref, vring_ref, lit_rows):
    """Shared per-entry machinery over the given stream rings."""
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    plus1 = (row8 >> 1) & 1  # rows 2,3 (and 6,7) gather the +1-word view
    base4 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) * 4

    def word(p):
        return ring_ref[(p >> 7) & 63, p & (LANES - 1)]

    def apply_record(src_ref, w0, w1, acc):
        """Single-record remainder path (entries' count mod 8)."""
        off = w0 >> 10
        ln = w0 & 1023
        is_fill = jax.lax.shift_right_logical(w1, 31)
        srow = (w1 & 0x0FFFFFFF) >> 9
        e = (w1 & 511) - off
        eq = e >> 2                      # arithmetic: floor for negatives
        om = (e & 3) * 8
        # single source row (resolver invariant); one crossbar pass: rows
        # 0-1 gather word q, rows 2-3 word q+1 (the cross-word byte view)
        win = src_ref[pl.ds(srow, 1), :]
        stack = jnp.broadcast_to(win, (8, LANES))
        q8 = lane8 + eq + plus1
        g = jnp.take_along_axis(stack, q8 & (LANES - 1), axis=1)
        g0 = g[0:1]
        g1 = g[2:3]
        val = jnp.where(
            om == 0, g0,
            jax.lax.shift_right_logical(g0, om)
            | jax.lax.shift_left(g1, 32 - jnp.maximum(om, 8)))
        fillw = (w1 & 0xFF) * 0x01010101
        val = jnp.where(is_fill == 1, fillw, val)
        m = jnp.zeros((1, LANES), jnp.int32)
        for kk in range(4):
            pos = base4 + kk
            inside = jnp.logical_and(pos >= off, pos < off + ln)
            m = m | jnp.where(inside, jnp.int32(0xFF) << (8 * kk), 0)
        return (val & m) | (acc & ~m)

    def gather8(src_ref, p):
        """Issue the loads for one gang of 8 same-row records: stream
        params from the VMEM mirror, source rows by scalar-addressed
        slices, the aligned word views by two crossbar takes."""
        rr = (p >> 7) & 63
        row_a = vring_ref[pl.ds(rr, 1), :]
        row_b = vring_ref[pl.ds((rr + 1) & 63, 1), :]
        a8 = jnp.broadcast_to(row_a, (8, LANES))
        b8 = jnp.broadcast_to(row_b, (8, LANES))
        L = (p & (LANES - 1)) + 2 * row8
        w0v = jnp.where(L < LANES,
                        jnp.take_along_axis(a8, L & (LANES - 1), axis=1),
                        jnp.take_along_axis(b8, L & (LANES - 1), axis=1))
        L1 = L + 1
        w1v = jnp.where(L1 < LANES,
                        jnp.take_along_axis(a8, L1 & (LANES - 1), axis=1),
                        jnp.take_along_axis(b8, L1 & (LANES - 1), axis=1))
        s0 = jnp.concatenate(
            [src_ref[pl.ds((word(p + 2 * k + 1) & 0x0FFFFFFF) >> 9, 1), :]
             for k in range(8)], axis=0)
        offv = w0v >> 10
        ev = (w1v & 511) - offv
        eqv = ev >> 2
        q = lane8 + eqv
        g0 = jnp.take_along_axis(s0, q & (LANES - 1), axis=1)
        g1 = jnp.take_along_axis(s0, (q + 1) & (LANES - 1), axis=1)
        return w0v, w1v, g0, g1

    def fold8(st, acc):
        """Fold one gathered gang into the row accumulator."""
        w0v, w1v, g0, g1 = st
        offv = w0v >> 10
        lnv = w0v & 1023
        ev = (w1v & 511) - offv
        omv = (ev & 3) * 8
        val = jnp.where(
            omv == 0, g0,
            jax.lax.shift_right_logical(g0, omv)
            | jax.lax.shift_left(g1, 32 - jnp.maximum(omv, 8)))
        isfillv = jax.lax.shift_right_logical(w1v, 31)
        fillw = (w1v & 0xFF) * 0x01010101
        val = jnp.where(isfillv == 1, fillw, val)
        pos0 = lane8 * 4
        # byte-range mask per 4-byte word, arithmetically from clamped
        # shift ranges: bytes [s4, e4) of the word at byte position pos0
        # are covered ([off, off+ln) clamped in). Decided round 4 over
        # the 4-step per-byte loop (~1% faster on-device, ab_decode.py).
        s4 = jnp.clip(offv - pos0, 0, 4)
        e4 = jnp.clip(offv + lnv - pos0, 0, 4)
        all1 = jnp.int32(-1)
        ms = jnp.where(s4 >= 4, 0, jax.lax.shift_left(all1, 8 * s4))
        me = jnp.where(e4 >= 4, 0, jax.lax.shift_left(all1, 8 * e4))
        m = ms & ~me
        contrib = val & m
        cv = contrib[0:4] | contrib[4:8]
        cv = cv[0:2] | cv[2:4]
        cv = cv[0:1] | cv[1:2]
        mv = m[0:4] | m[4:8]
        mv = mv[0:2] | mv[2:4]
        mv = mv[0:1] | mv[1:2]
        return cv | (acc & ~mv)

    def pipe8(src_ref, p, n8, acc):
        """Gang loop: gather + fold straight-line per iteration. (An
        explicit carried-state software pipeline measured SLOWER — 168 vs
        182 MB/s — Mosaic spills the carried tiles; cross-gang overlap
        comes from the two-block co-schedule instead.)"""

        def g16(_, c):
            # two independent gangs per body: the second gang's scalar
            # loads and crossbar chain overlap the first's fold (Mosaic
            # schedules within a straight-line span only)
            p_, a = c
            st0 = gather8(src_ref, p_)
            st1 = gather8(src_ref, p_ + 16)
            a = fold8(st0, a)
            a = fold8(st1, a)
            return p_ + 32, a

        def g8(_, c):
            p_, a = c
            a = fold8(gather8(src_ref, p_), a)
            return p_ + 16, a

        p, acc = jax.lax.fori_loop(0, n8 >> 1, g16, (p, acc))
        return jax.lax.fori_loop(0, n8 & 1, g8, (p, acc))

    def do_entry(p, u_ref, w_ref):
        """Process one entry at stream position p; returns the new p."""
        row = word(p)
        h1 = word(p + 1)
        n_u = h1 >> 16
        n_w = h1 & 0xFFFF
        p += 2
        acc = w_ref[pl.ds(row, 1), :]

        def one(src_ref):
            def rest(_, c):
                p_, a = c
                a = apply_record(src_ref, word(p_), word(p_ + 1), a)
                return p_ + 2, a

            return rest

        p, acc = pipe8(u_ref, p, n_u >> 3, acc)
        p, acc = jax.lax.fori_loop(0, n_u & 7, one(u_ref), (p, acc))
        p, acc = pipe8(w_ref, p, n_w >> 3, acc)
        p, acc = jax.lax.fori_loop(0, n_w & 7, one(w_ref), (p, acc))
        w_ref[pl.ds(row, 1), :] = acc
        return p

    return word, do_entry


def _stage_tail(u_ref, w_ref):
    """Last TAIL_ROWS rows of the previous window -> U rows [0, TAIL)."""
    for k in range(TAIL_ROWS // 8 + 1):
        src0 = min(WIN_ROWS - TAIL_ROWS + 8 * k, WIN_ROWS - 8)
        dst0 = min(8 * k, TAIL_ROWS - 8)
        u_ref[pl.ds(dst0, 8), :] = w_ref[pl.ds(src0, 8), :]


def _decode_bulk_kernel(meta_ref, lit_hbm, rec_hbm, out_hbm, u_ref, w_ref,
                        ring_ref, vring_ref, sem_lit, sem_out, sem_ring,
                        sem_vring, *, lit_rows, rec_rows, out_rows,
                        max_win=MAX_WIN):
    b = pl.program_id(0)
    n_win = meta_ref[b, 1]

    # U layout mirrors the record encoding: [tail rows | literal plane],
    # so source row = u_address >> 9 with no flag arithmetic
    dlit = pltpu.make_async_copy(
        lit_hbm.at[b], u_ref.at[pl.ds(TAIL_ROWS, lit_rows)], sem_lit)
    dlit.start()

    # the record stream rides TWO mirrored prefetch rings: an SMEM ring
    # (scalar header/source-row reads) and a VMEM ring (per-sublane
    # parameter extraction by the gang path — the scalar unit cannot feed
    # 8-wide vector params, and the vector units cannot read SMEM)
    def ring_copy(s):
        row0 = jnp.minimum(s * 8, rec_rows - 8)
        return pltpu.make_async_copy(
            rec_hbm.at[b, pl.ds(row0, 8)],
            ring_ref.at[pl.ds((s & 7) * 8, 8)], sem_ring.at[s & 7])

    def vring_copy(s):
        row0 = jnp.minimum(s * 8, rec_rows - 8)
        return pltpu.make_async_copy(
            rec_hbm.at[b, pl.ds(row0, 8)],
            vring_ref.at[pl.ds((s & 7) * 8, 8)], sem_vring.at[s & 7])

    for s in range(3):
        ring_copy(s).start()
        vring_copy(s).start()
    ring_copy(0).wait()
    vring_copy(0).wait()
    dlit.wait()

    word, do_entry = _machinery(ring_ref, vring_ref, lit_rows)

    def entry(carry):
        p, waited = carry
        # ring invariant: slots [0, waited] complete, (waited, waited+2]
        # in flight; one entry consumes <= _ENTRY_SLACK words
        hi = (p + _ENTRY_SLACK) >> 10

        def advance(st):
            p_, w_ = st
            ring_copy(w_ + 1).wait()
            ring_copy(w_ + 3).start()
            vring_copy(w_ + 1).wait()
            vring_copy(w_ + 3).start()
            return p_, w_ + 1

        p, waited = jax.lax.cond(hi > waited, advance, lambda st: st,
                                 (p, waited))
        return do_entry(p, u_ref, w_ref), waited

    waited = jnp.int32(0)
    p = jnp.int32(0)
    for w in range(max_win):
        if w > 0:
            @pl.when(w + 1 <= n_win)
            def _():
                _stage_tail(u_ref, w_ref)

        p_end = meta_ref[b, 5 + w]
        p, waited = jax.lax.while_loop(lambda c: c[0] < p_end, entry,
                                       (p, waited))

        @pl.when(w + 1 <= n_win)
        def _(w=w):
            dout = pltpu.make_async_copy(
                w_ref.at[pl.ds(0, WIN_ROWS)],
                out_hbm.at[b, pl.ds(w * WIN_ROWS, WIN_ROWS)], sem_out)
            dout.start()
            dout.wait()

    # drain the in-flight ring prefetches before the grid step ends
    ring_copy(waited + 1).wait()
    ring_copy(waited + 2).wait()
    vring_copy(waited + 1).wait()
    vring_copy(waited + 2).wait()


def _decode_bulk2_kernel(meta_ref, lit_hbm, rec_hbm, out_hbm, u0_ref, w0_ref,
                         u1_ref, w1_ref, ring_ref, vring_ref, sem_lit,
                         sem_out, sem_ring, sem_vring, *, lit_rows, rec_rows,
                         out_rows, max_win=MAX_WIN):
    """Two-block co-schedule: one merged, strictly-alternating record
    stream (csrc bulk_merge2) drives a pair of blocks against SEPARATE
    scratch refs. Each loop body processes one A-entry and one B-entry
    straight-line — their gather chains are independent (disjoint refs),
    which is the one reliable way to hide the crossbar latency that
    bounds the single-block kernel (Mosaic neither pipelines across
    iterations nor past conds; measured 26.7 cyc/record single-block)."""
    g = pl.program_id(0)
    n_win_a = meta_ref[g, 2]
    n_win_b = meta_ref[g, 3]
    n_win = jnp.maximum(n_win_a, n_win_b)

    dlit0 = pltpu.make_async_copy(
        lit_hbm.at[2 * g], u0_ref.at[pl.ds(TAIL_ROWS, lit_rows)],
        sem_lit.at[0])
    dlit1 = pltpu.make_async_copy(
        lit_hbm.at[2 * g + 1], u1_ref.at[pl.ds(TAIL_ROWS, lit_rows)],
        sem_lit.at[1])
    dlit0.start()
    dlit1.start()

    def ring_copy(s):
        row0 = jnp.minimum(s * 8, rec_rows - 8)
        return pltpu.make_async_copy(
            rec_hbm.at[g, pl.ds(row0, 8)],
            ring_ref.at[pl.ds((s & 7) * 8, 8)], sem_ring.at[s & 7])

    def vring_copy(s):
        row0 = jnp.minimum(s * 8, rec_rows - 8)
        return pltpu.make_async_copy(
            rec_hbm.at[g, pl.ds(row0, 8)],
            vring_ref.at[pl.ds((s & 7) * 8, 8)], sem_vring.at[s & 7])

    for s in range(3):
        ring_copy(s).start()
        vring_copy(s).start()
    ring_copy(0).wait()
    vring_copy(0).wait()
    dlit0.wait()
    dlit1.wait()

    word, do_entry = _machinery(ring_ref, vring_ref, lit_rows)

    def entry_pair(carry):
        p, waited = carry
        # two entries per iteration: <= 2 * (2 + 2*120) words
        hi = (p + _ENTRY_SLACK2) >> 10

        def advance(st):
            p_, w_ = st
            ring_copy(w_ + 1).wait()
            ring_copy(w_ + 3).start()
            vring_copy(w_ + 1).wait()
            vring_copy(w_ + 3).start()
            return p_, w_ + 1

        p, waited = jax.lax.cond(hi > waited, advance, lambda st: st,
                                 (p, waited))
        p = do_entry(p, u0_ref, w0_ref)
        p = do_entry(p, u1_ref, w1_ref)
        return p, waited

    waited = jnp.int32(0)
    p = jnp.int32(0)
    for w in range(max_win):
        if w > 0:
            @pl.when(w + 1 <= n_win_a)
            def _():
                _stage_tail(u0_ref, w0_ref)

            @pl.when(w + 1 <= n_win_b)
            def _():
                _stage_tail(u1_ref, w1_ref)

        p_end = meta_ref[g, 5 + w]
        p, waited = jax.lax.while_loop(lambda c: c[0] < p_end, entry_pair,
                                       (p, waited))

        @pl.when(w + 1 <= n_win_a)
        def _(w=w):
            d = pltpu.make_async_copy(
                w0_ref.at[pl.ds(0, WIN_ROWS)],
                out_hbm.at[2 * g, pl.ds(w * WIN_ROWS, WIN_ROWS)],
                sem_out.at[0])
            d.start()
            d.wait()

        @pl.when(w + 1 <= n_win_b)
        def _(w=w):
            d = pltpu.make_async_copy(
                w1_ref.at[pl.ds(0, WIN_ROWS)],
                out_hbm.at[2 * g + 1, pl.ds(w * WIN_ROWS, WIN_ROWS)],
                sem_out.at[1])
            d.start()
            d.wait()

    ring_copy(waited + 1).wait()
    ring_copy(waited + 2).wait()
    vring_copy(waited + 1).wait()
    vring_copy(waited + 2).wait()


def _decode_bulkn_kernel(meta_ref, lit_hbm, rec_hbm, out_hbm, *refs,
                         nblk, lit_rows, rec_rows, out_rows,
                         max_win=MAX_WIN):
    """N-way co-schedule (general form of the pair kernel): one merged,
    strictly round-robin record stream (csrc bulk_mergen) drives nblk
    blocks against SEPARATE scratch refs, one entry per block per
    straight-line loop body. More co-scheduled chains hide more of the
    per-gang crossbar latency that bounds the single-block kernel; nblk
    is capped by VMEM (each block needs its own literal+window planes —
    see coschedule_fit). Stream meta is the 16-word bulk_mergen layout:
    sizes [0..3], n_win [4..7], window boundaries [8..15]."""
    uw = refs[:2 * nblk]
    ring_ref, vring_ref = refs[2 * nblk:2 * nblk + 2]
    sem_lit, sem_out, sem_ring, sem_vring = refs[2 * nblk + 2:]
    g = pl.program_id(0)
    n_wins = [meta_ref[g, 4 + k] for k in range(nblk)]

    dlits = [pltpu.make_async_copy(
        lit_hbm.at[nblk * g + k],
        uw[2 * k].at[pl.ds(TAIL_ROWS, lit_rows)],
        sem_lit.at[k]) for k in range(nblk)]
    for d in dlits:
        d.start()

    def ring_copy(s):
        row0 = jnp.minimum(s * 8, rec_rows - 8)
        return pltpu.make_async_copy(
            rec_hbm.at[g, pl.ds(row0, 8)],
            ring_ref.at[pl.ds((s & 7) * 8, 8)], sem_ring.at[s & 7])

    def vring_copy(s):
        row0 = jnp.minimum(s * 8, rec_rows - 8)
        return pltpu.make_async_copy(
            rec_hbm.at[g, pl.ds(row0, 8)],
            vring_ref.at[pl.ds((s & 7) * 8, 8)], sem_vring.at[s & 7])

    for s in range(3):
        ring_copy(s).start()
        vring_copy(s).start()
    ring_copy(0).wait()
    vring_copy(0).wait()
    for d in dlits:
        d.wait()

    word, do_entry = _machinery(ring_ref, vring_ref, lit_rows)
    slack = _ENTRY_SLACK * nblk

    def entry_round(carry):
        p, waited = carry
        # nblk entries per iteration: <= nblk * (2 + 2*120) words
        hi = (p + slack) >> 10

        def advance(st):
            p_, w_ = st
            ring_copy(w_ + 1).wait()
            ring_copy(w_ + 3).start()
            vring_copy(w_ + 1).wait()
            vring_copy(w_ + 3).start()
            return p_, w_ + 1

        p, waited = jax.lax.cond(hi > waited, advance, lambda st: st,
                                 (p, waited))
        for k in range(nblk):
            p = do_entry(p, uw[2 * k], uw[2 * k + 1])
        return p, waited

    waited = jnp.int32(0)
    p = jnp.int32(0)
    for w in range(max_win):
        if w > 0:
            for k in range(nblk):
                @pl.when(w + 1 <= n_wins[k])
                def _(k=k):
                    _stage_tail(uw[2 * k], uw[2 * k + 1])

        p_end = meta_ref[g, 9 + w]
        p, waited = jax.lax.while_loop(lambda c: c[0] < p_end, entry_round,
                                       (p, waited))

        for k in range(nblk):
            @pl.when(w + 1 <= n_wins[k])
            def _(w=w, k=k):
                d = pltpu.make_async_copy(
                    uw[2 * k + 1].at[pl.ds(0, WIN_ROWS)],
                    out_hbm.at[nblk * g + k,
                               pl.ds(w * WIN_ROWS, WIN_ROWS)],
                    sem_out.at[k])
                d.start()
                d.wait()

    ring_copy(waited + 1).wait()
    ring_copy(waited + 2).wait()
    vring_copy(waited + 1).wait()
    vring_copy(waited + 2).wait()


# VMEM budget for coschedule_fit: 16 MiB minus rings/overhead headroom
_VMEM_ROWS_BUDGET = (15 << 20) // ROW_BYTES


def coschedule_fit(lit_rows: int, nblk: int) -> bool:
    """True when nblk co-scheduled blocks' scratch planes fit VMEM:
    nblk * (tail + literal plane + window plane) + stream mirror."""
    per = TAIL_ROWS + lit_rows + 2 + WIN_ROWS + 2
    return nblk * per + _REC_SLOTS * 8 + 64 <= _VMEM_ROWS_BUDGET


def best_coschedule(lit_rows: int, max_n: int = 4) -> int:
    """Largest nblk in [1, max_n] whose scratch planes fit VMEM."""
    for n in range(max_n, 1, -1):
        if coschedule_fit(lit_rows, n):
            return n
    return 1


@functools.partial(jax.jit,
                   static_argnames=("interpret", "nblk", "out_rows",
                                    "max_win", ))
def decode_bulkn_batch(lit_words, recn_words, metan, *, nblk,
                       interpret=False, out_rows: int = OUT_ROWS,
                       max_win: int = MAX_WIN):
    """N-way co-scheduled variant: block groups (nblk*g .. nblk*g+nblk-1)
    share one merged record stream (native.bulk_mergen) and decode
    together.

    lit_words:  (B, lit_rows, 128) i32, B % nblk == 0 — per-block planes.
    recn_words: (B//nblk, rec_rows, 128) i32 merged streams per group.
    metan:      (B//nblk, 16) i32 — bulk_mergen meta words per group.
    Returns (B, out_rows, 128) i32 decoded words.
    """
    B, lit_rows, _ = lit_words.shape
    if B % nblk:
        raise ValueError("decode_bulkn_batch needs B % nblk == 0")
    if not 1 <= nblk <= 4:
        raise ValueError("nblk must be in [1, 4]")
    rec_rows = recn_words.shape[1]
    if lit_rows % 8 or rec_rows % 8:
        raise ValueError("plane rows must be multiples of 8")
    kernel = functools.partial(_decode_bulkn_kernel, nblk=nblk,
                               lit_rows=lit_rows, rec_rows=rec_rows,
                               out_rows=out_rows, max_win=max_win)
    plane_scratch = []
    for _ in range(nblk):
        plane_scratch.append(
            pltpu.VMEM((TAIL_ROWS + lit_rows + 2, LANES), jnp.int32))
        plane_scratch.append(
            pltpu.VMEM((WIN_ROWS + 2, LANES), jnp.int32))
    return pl.pallas_call(
        kernel,
        grid=(B // nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, LANES), jnp.int32),
        scratch_shapes=plane_scratch + [
            pltpu.SMEM((_REC_SLOTS * 8, LANES), jnp.int32),
            pltpu.VMEM((_REC_SLOTS * 8, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((nblk,)),
            pltpu.SemaphoreType.DMA((nblk,)),
            pltpu.SemaphoreType.DMA((_REC_SLOTS,)),
            pltpu.SemaphoreType.DMA((_REC_SLOTS,)),
        ],
        interpret=interpret,
    )(metan, lit_words, recn_words)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "out_rows", "max_win",
                                    ))
def decode_bulk_batch(lit_words, rec_words, meta, *, interpret=False,
                      out_rows: int = OUT_ROWS, max_win: int = MAX_WIN):
    """Reconstruct a batch of blocks from resolver planes.

    lit_words: (B, lit_rows, 128) i32 zero-padded literal planes.
    rec_words: (B, rec_rows, 128) i32 record streams (rows multiple of 8).
    meta:      (B, 8) i32 — bulk_prep meta words per block.
    Returns (B, out_rows, 128) i32 decoded words (block bytes at [0,size);
    dict-extended planes need max_win=3 and out_rows >= 3*WIN_ROWS, with
    the block's bytes at [dict_len, dict_len + size)).
    """
    B, lit_rows, _ = lit_words.shape
    rec_rows = rec_words.shape[1]
    if lit_rows % 8 or rec_rows % 8:
        raise ValueError("plane rows must be multiples of 8")
    kernel = functools.partial(_decode_bulk_kernel, lit_rows=lit_rows,
                               rec_rows=rec_rows, out_rows=out_rows,
                               max_win=max_win)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((TAIL_ROWS + lit_rows + 2, LANES), jnp.int32),
            pltpu.VMEM((WIN_ROWS + 2, LANES), jnp.int32),
            pltpu.SMEM((_REC_SLOTS * 8, LANES), jnp.int32),
            pltpu.VMEM((_REC_SLOTS * 8, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((_REC_SLOTS,)),
            pltpu.SemaphoreType.DMA((_REC_SLOTS,)),
        ],
        interpret=interpret,
    )(meta, lit_words, rec_words)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "out_rows", "max_win",
                                    ))
def decode_bulk2_batch(lit_words, rec2_words, meta2, *, interpret=False,
                       out_rows: int = OUT_ROWS, max_win: int = MAX_WIN):
    """Two-block co-scheduled variant: block pairs (2g, 2g+1) share one
    merged record stream (native.bulk_merge2) and decode together.

    lit_words:  (B, lit_rows, 128) i32, B even — per-block literal planes.
    rec2_words: (B//2, rec_rows, 128) i32 merged streams per pair.
    meta2:      (B//2, 8) i32 — bulk_merge2 meta words per pair.
    Returns (B, out_rows, 128) i32 decoded words.
    """
    B, lit_rows, _ = lit_words.shape
    if B % 2:
        raise ValueError("decode_bulk2_batch needs an even block count")
    rec_rows = rec2_words.shape[1]
    if lit_rows % 8 or rec_rows % 8:
        raise ValueError("plane rows must be multiples of 8")
    kernel = functools.partial(_decode_bulk2_kernel, lit_rows=lit_rows,
                               rec_rows=rec_rows, out_rows=out_rows,
                               max_win=max_win)
    return pl.pallas_call(
        kernel,
        grid=(B // 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((TAIL_ROWS + lit_rows + 2, LANES), jnp.int32),
            pltpu.VMEM((WIN_ROWS + 2, LANES), jnp.int32),
            pltpu.VMEM((TAIL_ROWS + lit_rows + 2, LANES), jnp.int32),
            pltpu.VMEM((WIN_ROWS + 2, LANES), jnp.int32),
            pltpu.SMEM((_REC_SLOTS * 8, LANES), jnp.int32),
            pltpu.VMEM((_REC_SLOTS * 8, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((_REC_SLOTS,)),
            pltpu.SemaphoreType.DMA((_REC_SLOTS,)),
        ],
        interpret=interpret,
    )(meta2, lit_words, rec2_words)


# --- host-side glue ----------------------------------------------------------

def rows_for_bytes(nbytes: int) -> int:
    rows = -(-max(nbytes, 1) // ROW_BYTES) + 2
    return max(8, -(-rows // 8) * 8)


def pack_lit_words(lit: np.ndarray, lit_rows: int) -> np.ndarray:
    buf = np.zeros(lit_rows * ROW_BYTES, dtype=np.uint8)
    buf[:len(lit)] = lit
    return buf.view("<i4").reshape(lit_rows, LANES)


def pack_rec_words(rec: np.ndarray, rec_rows: int) -> np.ndarray:
    buf = np.zeros(rec_rows * LANES, dtype=np.uint32)
    buf[:len(rec)] = rec
    return buf.view(np.int32).reshape(rec_rows, LANES)


def prep_batch(payloads_ext):
    """bulk_prep a list of (payload, ext); returns packed batch planes or
    None if any block needs the fused-parser fallback.

    (lit_words (B, LR, 128), rec_words (B, RR, 128), meta (B, 8), sizes)
    """
    from ..runtime import native

    preps, sizes = [], []
    for payload, ext in payloads_ext:
        r = native.bulk_prep(payload, ext)
        if r is None:
            return None
        lit, rec, meta = r
        preps.append((lit, rec, meta))
        sizes.append(int(meta[0]))
    lit_rows = max(rows_for_bytes(len(p[0])) for p in preps)
    rec_rows = max(rows_for_bytes(4 * len(p[1])) for p in preps)
    B = len(preps)
    lit_words = np.zeros((B, lit_rows, LANES), np.int32)
    rec_words = np.zeros((B, rec_rows, LANES), np.int32)
    meta = np.zeros((B, 8), np.int32)
    for k, (lit, rec, m) in enumerate(preps):
        lit_words[k] = pack_lit_words(lit, lit_rows)
        rec_words[k] = pack_rec_words(rec, rec_rows)
        meta[k] = m.astype(np.int64).astype(np.int32)  # u32 -> i32 bits
    return lit_words, rec_words, meta, sizes


def prep_batch2(payloads_ext):
    """Like prep_batch, but pairs blocks for the co-scheduled kernel.

    Returns (lit_words (B2, LR, 128), rec2_words (B2//2, RR, 128),
    meta2 (B2//2, 8), sizes) with B2 = len rounded up to even, or None if
    any block needs the fused-parser fallback.
    """
    from ..runtime import native

    preps, sizes = [], []
    for payload, ext in payloads_ext:
        r = native.bulk_prep(payload, ext)
        if r is None:
            return None
        preps.append(r)
        sizes.append(int(r[2][0]))
    if len(preps) % 2:  # pad with an empty block
        preps.append((np.zeros(0, np.uint8), np.zeros(0, np.uint32),
                      np.zeros(8, np.uint32)))
    B2 = len(preps)
    merged = [native.bulk_merge2(preps[2 * g][1], preps[2 * g][2],
                                 preps[2 * g + 1][1], preps[2 * g + 1][2])
              for g in range(B2 // 2)]
    lit_rows = max(rows_for_bytes(len(p[0])) for p in preps)
    rec_rows = max(rows_for_bytes(4 * len(m[0])) for m in merged)
    lit_words = np.zeros((B2, lit_rows, LANES), np.int32)
    rec2_words = np.zeros((B2 // 2, rec_rows, LANES), np.int32)
    meta2 = np.zeros((B2 // 2, 8), np.int32)
    for k, p in enumerate(preps):
        lit_words[k] = pack_lit_words(p[0], lit_rows)
    for gidx, (rec, m2) in enumerate(merged):
        rec2_words[gidx] = pack_rec_words(rec, rec_rows)
        meta2[gidx] = m2.astype(np.int64).astype(np.int32)
    return lit_words, rec2_words, meta2, sizes


def prep_batchn(payloads_ext, nblk: int):
    """Like prep_batch2, but groups nblk blocks per merged stream for the
    N-way co-scheduled kernel.

    Returns (lit_words (Bn, LR, 128), recn_words (Bn//nblk, RR, 128),
    metan (Bn//nblk, 16), sizes) with Bn = len rounded up to a multiple
    of nblk, or None if any block needs the fused-parser fallback.
    """
    from ..runtime import native

    preps, sizes = [], []
    for payload, ext in payloads_ext:
        r = native.bulk_prep(payload, ext)
        if r is None:
            return None
        preps.append(r)
        sizes.append(int(r[2][0]))
    while len(preps) % nblk:  # pad with empty blocks
        preps.append((np.zeros(0, np.uint8), np.zeros(0, np.uint32),
                      np.zeros(8, np.uint32)))
    Bn = len(preps)
    merged = [native.bulk_mergen(
        [preps[nblk * g + k][1] for k in range(nblk)],
        [preps[nblk * g + k][2] for k in range(nblk)])
        for g in range(Bn // nblk)]
    lit_rows = max(rows_for_bytes(len(p[0])) for p in preps)
    rec_rows = max(rows_for_bytes(4 * len(m[0])) for m in merged)
    lit_words = np.zeros((Bn, lit_rows, LANES), np.int32)
    recn_words = np.zeros((Bn // nblk, rec_rows, LANES), np.int32)
    metan = np.zeros((Bn // nblk, METAN_WORDS), np.int32)
    for k, p in enumerate(preps):
        lit_words[k] = pack_lit_words(p[0], lit_rows)
    for gidx, (rec, m) in enumerate(merged):
        recn_words[gidx] = pack_rec_words(rec, rec_rows)
        metan[gidx] = m.astype(np.int64).astype(np.int32)
    return lit_words, recn_words, metan, sizes


def decode_bulk_block(payload: bytes, ext: bool, interpret: bool = True,
                      dictionary: bytes = None):
    """Single-block helper for tests: payload -> decoded bytes or None
    (fallback needed). With ``dictionary`` the resolver works in the
    dict-extended output space (third window possible)."""
    from ..runtime import native

    r = native.bulk_prep(payload, ext, dictionary)
    if r is None:
        return None
    lit, rec, meta = r
    base = len(dictionary) if dictionary else 0
    lit_rows = rows_for_bytes(len(lit))
    rec_rows = rows_for_bytes(4 * len(rec))
    out = decode_bulk_batch(
        pack_lit_words(lit, lit_rows)[None],
        pack_rec_words(rec, rec_rows)[None],
        meta.astype(np.int64).astype(np.int32)[None],
        interpret=interpret,
        out_rows=3 * WIN_ROWS if base else OUT_ROWS,
        max_win=3 if base else MAX_WIN)
    size = int(meta[0])
    return (np.asarray(out)[0].reshape(-1).view("<u1")
            [base:base + size].tobytes())
