"""Gang-stream decode kernel: the round-4 co-schedule that actually
overlaps.

The round-3 bulk kernels (decode_bulk.py) put the record PARSE back on
the scalar unit in one place: each entry's stream position is computed
from the previous entry's header, so even the N-way merged streams
(bulk_mergen) executed as ONE serial scalar chain — measured
bench/ab_decode.py: bulk == bulk2 == bulk4 ~ 220 MB/s/chip. This kernel
consumes the gang stream (csrc/tsq_gang.cpp) instead, where EVERY
position is arithmetic:

  * gang = 8 records, one output row, 16 words, 16-word aligned;
  * round r = nblk gangs at words (r*nblk + k)*16, one per co-scheduled
    block (separate scratch refs);
  * per window: a U segment (gangs read the never-written [tail|lit]
    plane) then a W segment (gangs read this window's finalized rows) —
    the source ref is picked per SEGMENT, so the loop body is nblk
    straight-line, mutually independent gather->fold->store chains with
    no parse, no inner dynamic-trip loops, and no conds.

Each gang loads its output row into a register accumulator, folds 8
records (two crossbar takes for the parameters, 8 scalar-addressed
source-row slices, one aligned-pair crossbar gather, ~30 elementwise
ops), and stores the row once. Consecutive gangs of the SAME block are
serialized by Mosaic's index-blind aliasing on that block's refs — which
is exactly the correctness order the stream requires — while the other
nblk-1 blocks' chains fill the latency.

Stream ABI and segment padding: csrc/tsq_gang.cpp. Correctness of the
U/W phase split: bulk_prep already emits each window as [all U entries |
all W entries] (emit_deferred runs at window close), so the segments are
a relabeling of the existing topological order, and a W record never
reads bytes written by its own entry (the resolver's same-entry hazard
rule), so per-gang stores need no extra hazard handling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_bulk import (MAX_WIN, TAIL_ROWS, WIN_ROWS, pack_lit_words,
                          rows_for_bytes)
from .decode_tokens import LANES, OUT_ROWS, ROW_BYTES

GANG_WORDS = 16      # words per 8-record slot (2 per record)
GMETA_WORDS = 32     # csrc kGangMetaWords: sizes [0..7], n_win [8..15],
#                      segment bounds [16+2w]/[17+2w], rounds [30], nblk [31]

_REC_SLOTS = 8  # 8 ring slots x (8,128) words


def _gang_machinery(ring_ref, vring_ref, recs=8):
    laneR = jax.lax.broadcasted_iota(jnp.int32, (recs, LANES), 1)
    rowR = jax.lax.broadcasted_iota(jnp.int32, (recs, LANES), 0)
    pos0 = laneR * 4  # loop-invariant: byte index of each lane word

    def do_gang(q, src_ref, w_ref):
        """One gang at stream word q (2*recs-aligned, never
        row-straddling): load row accumulator, fold `recs` records,
        store the row. recs=16 halves the per-gang fixed costs (acc
        load/store, scalar row read) at double per-op tile height.

        Accumulation is a plain OR: window rows are zeroed before each
        window's segments (the stream covers every in-size output byte
        exactly once, so no two records' masked contributions overlap)
        — this drops the second tree fold over the byte masks and the
        acc&~mask merge the round-4 kernel paid per gang."""
        rr = (q >> 7) & 63
        lo = q & (LANES - 1)
        row = (ring_ref[rr, lo] >> 19) & 0xFFF
        acc = w_ref[pl.ds(row, 1), :]
        # parameter extraction: one vring row broadcast + two takes
        # (slots are 2*recs-aligned, so lanes lo..lo+2*recs-1 never wrap
        # the 128-word stream row)
        a8 = jnp.broadcast_to(vring_ref[pl.ds(rr, 1), :], (recs, LANES))
        L = lo + 2 * rowR
        w0v = jnp.take_along_axis(a8, L, axis=1)
        w1v = jnp.take_along_axis(a8, L + 1, axis=1)
        # source rows: `recs` scalar-addressed single-row slices
        s0 = jnp.concatenate(
            [src_ref[pl.ds((ring_ref[rr, lo + 2 * k + 1] & 0x0FFFFFFF)
                           >> 9, 1), :]
             for k in range(recs)], axis=0)
        offv = (w0v >> 10) & 511    # row bits live above bit 18
        lnv = w0v & 1023
        ev = (w1v & 511) - offv
        eqv = ev >> 2               # arithmetic: floor for negatives
        g0 = jnp.take_along_axis(s0, (laneR + eqv) & (LANES - 1), axis=1)
        g1 = jnp.take_along_axis(s0, (laneR + eqv + 1) & (LANES - 1),
                                 axis=1)
        omv = (ev & 3) * 8
        val = jnp.where(
            omv == 0, g0,
            jax.lax.shift_right_logical(g0, omv)
            | jax.lax.shift_left(g1, 32 - jnp.maximum(omv, 8)))
        isfillv = jax.lax.shift_right_logical(w1v, 31)
        val = jnp.where(isfillv == 1, (w1v & 0xFF) * 0x01010101, val)
        # byte-range mask from clamped shift ranges (the round-4 decided
        # variant; see decode_bulk fold8)
        s4 = jnp.clip(offv - pos0, 0, 4)
        e4 = jnp.clip(offv + lnv - pos0, 0, 4)
        all1 = jnp.int32(-1)
        ms = jnp.where(s4 >= 4, 0, jax.lax.shift_left(all1, 8 * s4))
        me = jnp.where(e4 >= 4, 0, jax.lax.shift_left(all1, 8 * e4))
        cv = val & (ms & ~me)
        while cv.shape[0] > 1:  # tree-OR fold to one output row
            h = cv.shape[0] // 2
            cv = cv[0:h] | cv[h:]
        w_ref[pl.ds(row, 1), :] = acc | cv

    return do_gang


def _zero_window(w_ref):
    """Zero the 2 MiB window plane before its segments run: OR-accum
    correctness (every in-size byte is covered exactly once by the
    stream, so a zeroed base + masked ORs reproduce the old
    load-mask-merge exactly). ~4k cyc/window vs ~3M to decode it."""
    def body(r, _):
        w_ref[pl.ds(r * 8, 8), :] = jnp.zeros((8, LANES), jnp.int32)
        return 0

    jax.lax.fori_loop(0, WIN_ROWS // 8, body, 0)


def _stage_tail(u_ref, w_ref):
    for k in range(TAIL_ROWS // 8 + 1):
        src0 = min(WIN_ROWS - TAIL_ROWS + 8 * k, WIN_ROWS - 8)
        dst0 = min(8 * k, TAIL_ROWS - 8)
        u_ref[pl.ds(dst0, 8), :] = w_ref[pl.ds(src0, 8), :]


def _decode_gang_kernel(meta_ref, lit_hbm, rec_hbm, out_hbm, *refs,
                        nblk, unroll, lit_rows, rec_rows, out_rows,
                        max_win=MAX_WIN, slot_recs=8):
    uw = refs[:2 * nblk]
    ring_ref, vring_ref = refs[2 * nblk:2 * nblk + 2]
    sem_lit, sem_out, sem_ring, sem_vring = refs[2 * nblk + 2:]
    g = pl.program_id(0)
    n_wins = [meta_ref[g, 8 + k] for k in range(nblk)]

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

    do_gang = _gang_machinery(ring_ref, vring_ref, slot_recs)
    gw = 2 * slot_recs
    rw = nblk * gw
    slack = unroll * rw

    def segment(r0, r_end, waited, phase_w):
        """Run rounds [r0, r_end); src ref per block is u (phase_w=0) or
        w (phase_w=1). Segment lengths are multiples of `unroll`."""

        def body(carry):
            r, waited = carry
            q0 = r * rw
            hi = (q0 + slack) >> 10

            def advance(st):
                r_, w_ = st
                ring_copy(w_ + 1).wait()
                ring_copy(w_ + 3).start()
                vring_copy(w_ + 1).wait()
                vring_copy(w_ + 3).start()
                return r_, w_ + 1

            # while (not cond): geometries whose per-iteration stream
            # advance exceeds one 1024-word ring slot need >1 advance per
            # body or gangs would read un-waited slots
            r, waited = jax.lax.while_loop(lambda st: hi > st[1], advance,
                                           (r, waited))
            for u in range(unroll):
                for k in range(nblk):
                    do_gang(q0 + (u * nblk + k) * gw,
                            uw[2 * k + phase_w], uw[2 * k + 1])
            return r + unroll, waited

        r, waited = jax.lax.while_loop(lambda c: c[0] < r_end, body,
                                       (r0, waited))
        return r, waited

    waited = jnp.int32(0)
    r = jnp.int32(0)
    for w in range(max_win):
        if w > 0:
            for k in range(nblk):
                @pl.when(w + 1 <= n_wins[k])
                def _(k=k):
                    _stage_tail(uw[2 * k], uw[2 * k + 1])

        for k in range(nblk):  # OR-accum base (see _zero_window)
            @pl.when(w + 1 <= n_wins[k])
            def _(k=k):
                _zero_window(uw[2 * k + 1])

        r, waited = segment(r, meta_ref[g, 16 + 2 * w], waited, 0)
        r, waited = segment(r, meta_ref[g, 17 + 2 * w], waited, 1)

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


@functools.partial(jax.jit,
                   static_argnames=("interpret", "nblk", "unroll",
                                    "out_rows", "max_win", "slot_recs"))
def decode_gang_batch(lit_words, gang_words, gmeta, *, nblk, unroll=2,
                      interpret=False, out_rows: int = OUT_ROWS,
                      max_win: int = MAX_WIN, slot_recs: int = 8):
    """Decode block groups through the gang-stream kernel.

    lit_words:  (B, lit_rows, 128) i32, B % nblk == 0 — per-block planes.
    gang_words: (B//nblk, rec_rows, 128) i32 gang streams per group.
    gmeta:      (B//nblk, 16) i32 — bulk_gang meta words per group.
    Returns (B, out_rows, 128) i32 decoded words.
    """
    B, lit_rows, _ = lit_words.shape
    if B % nblk:
        raise ValueError("decode_gang_batch needs B % nblk == 0")
    if not 1 <= nblk <= 8:
        raise ValueError("nblk must be in [1, 8]")
    if 8 % unroll:
        raise ValueError("unroll must divide kGangAlignRounds (8)")
    rec_rows = gang_words.shape[1]
    if lit_rows % 8 or rec_rows % 8:
        raise ValueError("plane rows must be multiples of 8")
    if slot_recs not in (8, 16, 32):
        raise ValueError("slot_recs must be 8, 16 or 32")
    kernel = functools.partial(_decode_gang_kernel, nblk=nblk,
                               unroll=unroll, lit_rows=lit_rows,
                               rec_rows=rec_rows, out_rows=out_rows,
                               max_win=max_win, slot_recs=slot_recs)
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
    )(gmeta, lit_words, gang_words)


# --- host-side glue ----------------------------------------------------------

def pack_gang_words(rec: np.ndarray, rec_rows: int) -> np.ndarray:
    buf = np.zeros(rec_rows * LANES, dtype=np.uint32)
    buf[:len(rec)] = rec
    return buf.view(np.int32).reshape(rec_rows, LANES)


def prep_gang(payloads_ext, nblk: int, slot_recs: int = 8):
    """bulk_prep + bulk_gang a list of (payload, ext); returns packed
    batch planes or None if any block needs the fused-parser fallback.

    (lit_words (Bn, LR, 128), gang_words (Bn//nblk, RR, 128),
    gmeta (Bn//nblk, 16), sizes) with Bn = len rounded up to a multiple
    of nblk.
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
    merged = [native.bulk_gang(
        [preps[nblk * g + k][1] for k in range(nblk)],
        [preps[nblk * g + k][2] for k in range(nblk)], slot_recs)
        for g in range(Bn // nblk)]
    lit_rows = max(rows_for_bytes(len(p[0])) for p in preps)
    rec_rows = max(rows_for_bytes(4 * len(m[0])) for m in merged)
    lit_words = np.zeros((Bn, lit_rows, LANES), np.int32)
    gang_words = np.zeros((Bn // nblk, rec_rows, LANES), np.int32)
    gmeta = np.zeros((Bn // nblk, GMETA_WORDS), np.int32)
    for k, p in enumerate(preps):
        lit_words[k] = pack_lit_words(p[0], lit_rows)
    for gidx, (rec, m) in enumerate(merged):
        gang_words[gidx] = pack_gang_words(rec, rec_rows)
        gmeta[gidx] = m.astype(np.int64).astype(np.int32)
    return lit_words, gang_words, gmeta, sizes
