"""Two-pass device-resident emission: scalar decisions, vector assembly.

Round-3 replacement for the single-pass scalar emitter (encode_emit.py,
measured 31 cyc/input-byte — scalar-issue-bound on literal byte movement
and bitstream RMWs). The insight mirrors the bulk decoder: the sequential
part of LZ emission is only the DECISIONS (greedy candidate scan with the
anchor feedback, csrc encode_candidates_impl / reference hot loop
tsq_encode.cpp:216-326); every output byte is either an input byte
(literal payloads) or a byte the decision pass can compute into a compact
side stream (3-byte header, ctrl/size slot bytes, 2-byte match offsets).
The final payload is a deterministic interleave of those two sources —
a record-stream assembly problem the bulk-decode gang machinery
(decode_bulk._machinery) already executes at VPU rate.

  Pass 1 _decide_kernel (scalar):  input + phase-A candidates
      -> side plane   (computed bytes, in output order)
      -> record stream (decode_bulk format; all records U-space copies
         from [input plane | side plane], one entry per output row)
      -> meta (payload size, window count, per-window stream ends)
  Pass 2 _assemble_kernel (vector): executes the record stream with
      gangs of 8 records/sublane — identical hot loop to the decoder.

Decisions cost O(symbols), not O(bytes): an XLA-precomputed skip table
(next position whose candidate chain is non-empty, `next_valid`) lets the
scan jump straight between candidate stops, replaying the host's 32-byte
literal-flush chunks in closed form. Byte-identity with the host emission
(native.encode_block_candidates level=1) is preserved bit-for-bit,
including TokenSink's dead-reserved-slot contract (csrc tsq_core.cpp:
83-86,126-138): a trailing ctrl/size slot that no group ever filled holds
0 — or, below the literal high-water mark, the byte the last literal
over-copy deposited; the decide pass reproduces that byte from the input
ring at reserve time.

Records coalesce far better than decode-side records (5.5 B/record): a
run of consecutive match symbols is ONE contiguous side-stream copy per
512-byte row, and a 32-byte literal chunk between size slots is one
record, so match-heavy regions assemble at hundreds of bytes per record.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_tokens import LANES, ROW_BYTES
from .decode_bulk import _machinery, TAIL_ROWS, TAIL_BYTES, WIN_ROWS
from .encode_emit import (IN_ROWS, CAND_ROWS, _NONE, _len_code, _code_width,
                          _lsr, make_input_reader, make_extend, make_usable,
                          pack_input_words, pack_cand_words,
                          payload_from_words)

_SLOT_ROWS = 8                      # 4 KiB DMA slots everywhere
_SLOT_BYTES = _SLOT_ROWS * ROW_BYTES
_IN_SLOTS = 32
_CAND_SLOTS = 4
_NV_SLOTS = 4
_SIDE_SLOTS = 8
_REC_SLOTS = 8
_SIDE_RING_BYTES = _SIDE_SLOTS * _SLOT_BYTES
_REC_RING_WORDS = _REC_SLOTS * _SLOT_BYTES // 4

IN_BYTES = IN_ROWS * ROW_BYTES
# side plane: worst case ~3.3 B/input-byte/5 in pathological 1-literal/
# 4-match alternation; 4 MiB covers everything real with margin
SIDE_ROWS = 8192
# record stream: ~2 records per symbol worst case; overflow falls back
REC_ROWS = 12288
OUT_WIN = 3                         # compressed payload <= OUTPUT_SZ < 6 MiB
OUT_ROWS_BULK = OUT_WIN * WIN_ROWS

# U-plane byte offsets for the assembly kernel (layout [tail|input|side];
# the tail region is dead — encode records never reference it — but keeps
# srow = address >> 9 shared with the decoder's machinery)
U_IN = TAIL_BYTES
U_SIDE = TAIL_BYTES + IN_BYTES

_MAX_ENTRY_RECS = 120               # decode_bulk._ENTRY_SLACK contract


def _decide_kernel(meta_ref, in_hbm, cand_hbm, nv_hbm, side_hbm, rec_hbm,
                   osz_ref, sin, scand, snv, sside, srec, sem_i, sem_c,
                   sem_n, sem_s, sem_r, *, ext):
    b = pl.program_id(0)
    size = meta_ref[b, 0]
    base = meta_ref[b, 1]          # dict length (0 for plain blocks)
    end = base + size

    # --- ring DMAs ----------------------------------------------------------
    def in_dma(w):
        row0 = jnp.clip(w * _SLOT_ROWS, 0, IN_ROWS - _SLOT_ROWS)
        return pltpu.make_async_copy(
            in_hbm.at[b, pl.ds(row0, _SLOT_ROWS)],
            sin.at[pl.ds((w & (_IN_SLOTS - 1)) * _SLOT_ROWS, _SLOT_ROWS)],
            sem_i.at[w & 3])

    def cand_dma(w):
        row0 = jnp.clip(w * _SLOT_ROWS, 0, CAND_ROWS - _SLOT_ROWS)
        return pltpu.make_async_copy(
            cand_hbm.at[b, pl.ds(row0, _SLOT_ROWS)],
            scand.at[pl.ds((w & (_CAND_SLOTS - 1)) * _SLOT_ROWS,
                           _SLOT_ROWS)],
            sem_c.at[w & 3])

    def nv_dma(w):
        row0 = jnp.clip(w * _SLOT_ROWS, 0, CAND_ROWS - _SLOT_ROWS)
        return pltpu.make_async_copy(
            nv_hbm.at[b, pl.ds(row0, _SLOT_ROWS)],
            snv.at[pl.ds((w & (_NV_SLOTS - 1)) * _SLOT_ROWS, _SLOT_ROWS)],
            sem_n.at[w & 3])

    def side_dma(s, par):
        row0 = jnp.minimum(s * _SLOT_ROWS, SIDE_ROWS - _SLOT_ROWS)
        return pltpu.make_async_copy(
            sside.at[pl.ds((s & (_SIDE_SLOTS - 1)) * _SLOT_ROWS,
                           _SLOT_ROWS)],
            side_hbm.at[b, pl.ds(row0, _SLOT_ROWS)], sem_s.at[par])

    def rec_dma(s, par):
        row0 = jnp.minimum(s * _SLOT_ROWS, REC_ROWS - _SLOT_ROWS)
        return pltpu.make_async_copy(
            srec.at[pl.ds((s & (_REC_SLOTS - 1)) * _SLOT_ROWS,
                          _SLOT_ROWS)],
            rec_hbm.at[b, pl.ds(row0, _SLOT_ROWS)], sem_r.at[par])

    # prologue: dict history + 2 slots of prefetch lead (encode_emit
    # protocol: slots [0, w] complete, (w, w+2] in flight)
    s0_in = base >> 12
    s0_pos = base >> 10
    for k in range(17):
        w = jnp.clip(s0_in - 16 + k, 0, s0_in)

        @pl.when(base > 0)
        def _(w=w):
            dma = in_dma(w)
            dma.start()
            dma.wait()

    @pl.when(base > 0)
    def _():
        dma = cand_dma(jnp.maximum(s0_pos - 1, 0))
        dma.start()
        dma.wait()

    for d in range(3):
        in_dma(s0_in + d).start()
        cand_dma(s0_pos + d).start()
        nv_dma(s0_pos + d).start()
    in_dma(s0_in).wait()
    cand_dma(s0_pos).wait()
    nv_dma(s0_pos).wait()

    # --- scalar accessors ---------------------------------------------------
    in_word, load32, load64 = make_input_reader(sin)

    def cand_at(p):
        e = p & (_CAND_SLOTS * _SLOT_BYTES // 4 - 1)
        return scand[e >> 7, e & (LANES - 1)]

    def nv_at(p):
        e = p & (_NV_SLOTS * _SLOT_BYTES // 4 - 1)
        return snv[e >> 7, e & (LANES - 1)]

    extend = make_extend(load64, ext)
    usable = make_usable(cand_at)

    _SIDE_WORDS = _SIDE_RING_BYTES // 4

    def side_byte(sp, v):
        sp = jnp.int32(sp)
        wi = (sp >> 2) & (_SIDE_WORDS - 1)
        sh = (sp & 3) * 8
        m = jnp.int32(0xFF) << sh
        cur = sside[wi >> 7, wi & (LANES - 1)]
        sside[wi >> 7, wi & (LANES - 1)] = \
            (cur & ~m) | (((v & 0xFF) << sh) & m)

    def rec_word(rp, v):
        wi = rp & (_REC_RING_WORDS - 1)
        srec[wi >> 7, wi & (LANES - 1)] = v

    # --- decide-pass state --------------------------------------------------
    # S is a flat int32 tuple; indices below. All cursors are byte
    # positions except rp (record-stream words).
    (J, SJ, CSAT, SSAT, NSYM, ANCHOR, CACC, SACC,     # TokenSink mirror
     HWM, LLO, LLS,                                   # dead-slot contract
     RTYPE, ROUT0, RSRC0,                             # open run
     RP, EAT, EN, EROW, EWIN,                         # record stream
     WIIN, WICAND, WINV, SOFS, SPAR, ROFS, RPAR,      # rings
     OVF) = range(27)

    def rings_catchup(i, S):
        """Advance all read rings to cover cursor i (jump-capable: loops
        one slot at a time; DMA waits pipeline 2-deep)."""
        due_in = ((i + 72) >> 12) > S[WIIN]
        due_pos = ((i + 2) >> 10) > S[WICAND]

        def go(S):
            def adv_in(w):
                in_dma(w + 1).wait()
                in_dma(w + 3).start()
                return w + 1

            def adv_cand(w):
                cand_dma(w + 1).wait()
                cand_dma(w + 3).start()
                return w + 1

            def adv_nv(w):
                nv_dma(w + 1).wait()
                nv_dma(w + 3).start()
                return w + 1

            wi = jax.lax.while_loop(
                lambda w: ((i + 72) >> 12) > w, adv_in, S[WIIN])
            wc = jax.lax.while_loop(
                lambda w: ((i + 2) >> 10) > w, adv_cand, S[WICAND])
            wn = jax.lax.while_loop(
                lambda w: ((i + 2) >> 10) > w, adv_nv, S[WINV])
            return S[:WIIN] + (wi, wc, wn) + S[WINV + 1:]

        return jax.lax.cond(jnp.logical_or(due_in, due_pos), go,
                            lambda S: S, S)

    def rec_flush(S):
        def need(st):
            ofs, par = st
            return S[RP] - 300 >= (ofs + 1) * (_SLOT_BYTES // 4)

        def ship(st):
            ofs, par = st

            @pl.when(ofs >= 2)
            def _():
                rec_dma(ofs - 2, par).wait()

            rec_dma(ofs, par).start()
            return ofs + 1, par ^ 1

        ofs, par = jax.lax.while_loop(need, ship, (S[ROFS], S[RPAR]))
        return S[:ROFS] + (ofs, par) + S[ROFS + 2:]

    def side_flush(S):
        def need(st):
            ofs, par = st
            return S[SJ] - 256 >= (ofs + 1) * _SLOT_BYTES

        def ship(st):
            ofs, par = st

            @pl.when(ofs >= 2)
            def _():
                side_dma(ofs - 2, par).wait()

            side_dma(ofs, par).start()
            return ofs + 1, par ^ 1

        ofs, par = jax.lax.while_loop(need, ship, (S[SOFS], S[SPAR]))
        return S[:SOFS] + (ofs, par) + S[SOFS + 2:]

    def close_entry(S):
        """Patch the open entry's H1 with its record count."""
        def patch(S):
            rec_word(S[EAT] + 1, S[EN] << 16)   # nU = EN, nW = 0
            return S

        return jax.lax.cond(S[EAT] >= 0, patch, lambda S: S, S)

    def open_entry(S, row):
        """Close the previous entry, record window ends crossed, start a
        new entry for global output row `row`."""
        S = close_entry(S)
        w = row >> 12                           # 4096 rows per window

        def adv(st):
            ew, _ = st
            osz_ref[b, 5 + jnp.minimum(ew, 2)] = S[RP]
            return ew + 1, 0

        ewin, _ = jax.lax.while_loop(lambda st: st[0] < w, adv,
                                     (S[EWIN], 0))
        rec_word(S[RP], row & (WIN_ROWS - 1))
        S = S[:RP] + (S[RP] + 2, S[RP], jnp.int32(0), row, ewin) \
            + S[EWIN + 1:]
        return rec_flush(S)

    def close_run(S):
        """Emit records covering the open run [ROUT0, J); split at output
        rows (entry granularity), source rows, and the 120-records/entry
        ring-slack cap (capped entries reopen the same row)."""
        usrc0 = S[RSRC0] + jnp.where(S[RTYPE] == 1, U_IN, U_SIDE)

        def body(st):
            S, o, src = st
            row = o >> 9

            def need_entry(S):
                return open_entry(S, row)

            S = jax.lax.cond(
                jnp.logical_or(row != S[EROW], S[EN] >= _MAX_ENTRY_RECS),
                need_entry, lambda S: S, S)
            ln = jnp.minimum(S[J] - o,
                             jnp.minimum(512 - (o & 511), 512 - (src & 511)))
            rec_word(S[RP], ((o & 511) << 10) | ln)
            rec_word(S[RP] + 1, src)
            S = S[:RP] + (S[RP] + 2,) + S[RP + 1:]
            S = S[:EN] + (S[EN] + 1,) + S[EN + 1:]
            return S, o + ln, src + ln

        S, _, _ = jax.lax.while_loop(lambda st: st[1] < st[0][J], body,
                                     (S, S[ROUT0], usrc0))
        S = rec_flush(S)
        ovf = S[OVF] | (S[RP] > (REC_ROWS - 64) * LANES).astype(jnp.int32)
        return S[:OVF] + (ovf,)

    def to_run(S, t, src):
        """Ensure the open run has type t (0 comp / 1 lit) starting here."""
        def flip(S):
            S = close_run(S)
            return S[:RTYPE] + (jnp.int32(t), S[J], src) + S[RSRC0 + 1:]

        return jax.lax.cond(S[RTYPE] != t, flip, lambda S: S, S)

    def reserve(S, which):
        """TokenSink::reserve (csrc tsq_core.cpp:83-86) in two-plane form:
        allocate the output byte at J inside a computed run, remember the
        slot's side position, and materialize the dead-slot value the host
        semantics would leave if no group ever fills it (0 at/above the
        literal high-water mark, else the last over-copy's input byte)."""
        S = to_run(S, 0, S[SJ])
        dead = jnp.where(
            S[J] >= S[HWM], jnp.int32(0),
            load32(S[LLS] + (S[J] - S[LLO])) & 0xFF)
        side_byte(S[SJ], dead)
        at = CSAT if which == 0 else SSAT
        S = S[:at] + (S[SJ],) + S[at + 1:]
        return S[:J] + (S[J] + 1, S[SJ] + 1) + S[SJ + 1:]

    def account(S, ctrl_bit, nibble, cursor):
        """TokenSink::account against the side plane. Unlike the
        single-pass kernel (whose out ring could ship a slot mid-group,
        forcing store-every-symbol), the side plane stays SMEM-resident
        256+ bytes past the write cursor — far beyond a group's ~130-byte
        extent — so accumulators store ONLY at group boundaries; finish()
        patches partial trailing groups."""
        n_sym = S[NSYM] + 1
        cacc = ((S[CACC] << 1) | ctrl_bit) & 0xFF
        S = S[:NSYM] + (n_sym,) + S[NSYM + 1:]
        S = S[:CACC] + (cacc,) + S[CACC + 1:]

        def grp8(S):
            # ring upkeep rides the 1-in-8 branch: SJ grows <= ~140 bytes
            # per group against the 3.8 KiB ship margin
            side_byte(S[CSAT], cacc)
            return side_flush(reserve(S, 0))

        S = jax.lax.cond((n_sym & 7) == 0, grp8, lambda S: S, S)
        sacc = ((S[SACC] << 4) | nibble) & 0xFF
        S = S[:SACC] + (sacc,) + S[SACC + 1:]

        def adv2(S):
            side_byte(S[SSAT], sacc)
            S = reserve(S, 1)
            return S[:ANCHOR] + (cursor,) + S[ANCHOR + 1:]

        return jax.lax.cond((n_sym & 1) == 0, adv2, lambda S: S, S)

    def lit_symbol(S, frm, run):
        """One <=16-byte literal symbol: no byte movement — extend/open
        the literal run, mirror the over-copy high-water mark."""
        S = to_run(S, 1, frm)
        hwm = jnp.maximum(S[HWM], S[J] + 16)
        S = S[:HWM] + (hwm, S[J], frm) + S[LLS + 1:]
        S = S[:J] + (S[J] + run,) + S[J + 1:]
        return account(S, jnp.int32(1), run - 1, frm + run)

    def do_literals(S, frm, upto, max_runs):
        rem = upto - frm
        for _ in range(max_runs):
            def live(st):
                S, f, r = st
                run = jnp.minimum(r, 16)
                return lit_symbol(S, f, run), f + run, r - run

            S, frm, rem = jax.lax.cond(rem > 0, live, lambda st: st,
                                       (S, frm, rem))
        return S

    def put_match(S, offset, code, new_cursor):
        S = to_run(S, 0, S[SJ])
        side_byte(S[SJ], offset & 0xFF)
        side_byte(S[SJ] + 1, _lsr(offset, 8) & 0xFF)
        S = S[:J] + (S[J] + 2, S[SJ] + 2) + S[SJ + 1:]
        S = account(S, jnp.int32(0), code, new_cursor)
        return S

    # --- initial state ------------------------------------------------------
    # header: 3 declared-size bytes then the two ctor-reserved slots
    # (TokenSink ctor, csrc tsq_core.cpp:72-81); all computed bytes
    side_byte(0, size & 0xFF)
    side_byte(1, _lsr(size, 8) & 0xFF)
    side_byte(2, _lsr(size, 16) & 0xFF)
    z = jnp.int32(0)
    S = (z + 3, z + 3,          # J, SJ (cursors after the header)
         z + 3, z + 4,          # CSAT, SSAT (patched below by reserve)
         z, base, z, z,         # NSYM, ANCHOR, CACC, SACC
         z + 3, z, z,           # HWM, LLO, LLS
         z, z, z,               # RTYPE=comp, ROUT0=0, RSRC0=0
         z, z - 1, z, z - 1, z, # RP, EAT=-1, EN, EROW=-1, EWIN
         s0_in, s0_pos, s0_pos, # WIIN, WICAND, WINV
         z, z, z, z,            # SOFS, SPAR, ROFS, RPAR
         z)                     # OVF
    S = reserve(S, 0)
    S = reserve(S, 1)

    # --- the decision state machine (csrc encode_candidates_impl with the
    # scan jump-compressed through the next_valid table) -------------------
    def outer_cond(st):
        return st[0][OVF + 1] != 0        # live flag appended

    def outer(st):
        S, = st[:1]
        i, rs = st[1], st[2]
        S = S[:OVF + 1]

        # SCAN: jump between candidate stops, replaying the host's
        # 32-byte literal-flush chunks (flush fires at i - rs == 32,
        # emitting [rs, rs+32); csrc tsq_core encode loop)
        def scan_cond(sst):
            i_, pos_ = sst[1], sst[3]
            return jnp.logical_and(i_ < end, pos_ == _NONE)

        def scan(sst):
            S_, i_, rs_, _ = sst
            nxt = jnp.minimum(nv_at(i_ + 1), end)

            def replay(st):
                S_r, rs_r = st
                S_r = rings_catchup(rs_r + 32, S_r)
                S_r = do_literals(S_r, rs_r, rs_r + 32, 2)
                return S_r, rs_r + 32

            S_, rs_ = jax.lax.while_loop(
                lambda st: nxt - st[1] > 32, replay, (S_, rs_))
            i_ = nxt
            S_ = rings_catchup(i_, S_)

            def at_stop(st):
                S_s, rs_s = st
                # host order: pos under the pre-flush anchor, then the
                # flush (when one lands exactly here), then re-validate
                pos_pre = usable(i_, S_s[ANCHOR])

                def flush_here(st2):
                    S_f, pos_f = st2
                    S_f = do_literals(S_f, i_ - 32, i_, 2)
                    pos_f = jnp.where(pos_f != _NONE,
                                      usable(i_, S_f[ANCHOR]),
                                      jnp.int32(_NONE))
                    return S_f, pos_f, i_

                def no_flush(st2):
                    S_f, pos_f = st2
                    return S_f, pos_f, rs_s

                return jax.lax.cond(i_ - rs_s >= 32, flush_here, no_flush,
                                    (S_s, pos_pre))

            def at_end(st):
                S_s, rs_s = st
                return S_s, jnp.int32(_NONE), rs_s

            S_, pos_, rs_ = jax.lax.cond(i_ < end, at_stop, at_end,
                                         (S_, rs_))
            return S_, i_, rs_, pos_

        S, i, rs, pos = jax.lax.while_loop(
            scan_cond, scan, (S, i, rs, jnp.int32(_NONE)))

        # trailing literals of the run (< 32 bytes by the flush rule)
        S = do_literals(S, rs, i, 2)
        # flush may advance the anchor past the candidate's 16-bit reach;
        # re-walk (host parity, upstream re-check tsq_encode.cpp:298)
        pos = jnp.where(S[ANCHOR] - pos > 65534, usable(i, S[ANCHOR]), pos)

        def matches(mst):
            def mcond(m):
                return m[3] != 0

            def mbody(m):
                S_, i_, pos_, _ = m
                anchor = S_[ANCHOR]
                k = extend(i_, pos_, anchor)

                def emit(em):
                    S_e, i_e, pos_e = em
                    offset = S_e[ANCHOR] - pos_e
                    code = _len_code(k)
                    i_e = i_e + _code_width(code)
                    S_e = put_match(S_e, offset, code, i_e)
                    S_e = rings_catchup(i_e, S_e)
                    pos_n = jnp.where(i_e < end - 5,
                                      usable(i_e, S_e[ANCHOR]),
                                      jnp.int32(_NONE))
                    cont = (pos_n != _NONE).astype(jnp.int32)
                    return S_e, i_e, pos_n, cont

                def stop(em):
                    S_e, i_e, pos_e = em
                    return S_e, i_e, pos_e, jnp.int32(0)

                return jax.lax.cond(k >= 4, emit, stop, (S_, i_, pos_))

            m = jax.lax.while_loop(mcond, mbody,
                                   (mst[0], mst[1], mst[2], jnp.int32(1)))
            return m[0], m[1], m[2], jnp.int32(0)

        S, i, pos, _ = jax.lax.cond(
            jnp.logical_and(i < end, pos != _NONE), matches,
            lambda mst: (mst[0], mst[1], mst[2], jnp.int32(0)),
            (S, i, pos, jnp.int32(0)))
        live = (i < end).astype(jnp.int32)
        return (S + (live,), i, i)

    live0 = (size > 0).astype(jnp.int32)
    fin = jax.lax.while_loop(outer_cond, outer,
                             (S + (live0,), base, base))
    S = fin[0][:OVF + 1]

    # finish(): csrc TokenSink::finish — pad the final ctrl byte with
    # literal bits, pad a half-filled size byte's low nibble with zero.
    # At even n_sym the upstream tail loop still shifts the freshly
    # reserved EMPTY size slot one nibble left (its materialized dead
    # value << 4, tsq_encode.cpp:330-339); only n_sym % 8 == 0 streams
    # leave dead slots exactly as reserve() left them.
    n_sym = S[NSYM]

    def side_read(sp):
        sp = jnp.int32(sp)
        wi = (sp >> 2) & (_SIDE_WORDS - 1)
        sh = (sp & 3) * 8
        return _lsr(sside[wi >> 7, wi & (LANES - 1)], sh) & 0xFF

    @pl.when((n_sym & 7) != 0)
    def _():
        half = (n_sym & 1) != 0
        side_byte(S[SSAT], jnp.where(half, (S[SACC] << 4) & 0xFF,
                                     (side_read(S[SSAT]) << 4) & 0xFF))

        pad = 8 - (n_sym & 7)
        side_byte(S[CSAT], ((S[CACC] << pad) | ((1 << pad) - 1)) & 0xFF)

    # close the open run and entry; flush the remaining window ends
    S = close_run(S)
    S = close_entry(S)

    def fill_tail(st):
        ew, _ = st
        osz_ref[b, 5 + jnp.minimum(ew, 2)] = S[RP]
        return ew + 1, 0

    jax.lax.while_loop(lambda st: st[0] < OUT_WIN, fill_tail, (S[EWIN], 0))

    osz = S[J]
    osz_ref[b, 0] = osz
    osz_ref[b, 1] = (osz + (WIN_ROWS * ROW_BYTES) - 1) >> 21
    osz_ref[b, 2] = S[OVF] | (S[SJ] > (SIDE_ROWS - 64) * ROW_BYTES) \
        .astype(jnp.int32)

    # epilogue: drain ring DMAs; ship the remaining side/rec slots
    in_dma(S[WIIN] + 1).wait()
    in_dma(S[WIIN] + 2).wait()
    cand_dma(S[WICAND] + 1).wait()
    cand_dma(S[WICAND] + 2).wait()
    nv_dma(S[WINV] + 1).wait()
    nv_dma(S[WINV] + 2).wait()

    for ofs_i, par_i, dma, cap in ((SOFS, SPAR, side_dma, S[SJ] // 4),
                                   (ROFS, RPAR, rec_dma, S[RP])):
        ofs, par = S[ofs_i], S[par_i]

        @pl.when(ofs >= 2)
        def _(ofs=ofs, par=par, dma=dma):
            dma(ofs - 2, par).wait()

        @pl.when(ofs >= 1)
        def _(ofs=ofs, par=par, dma=dma):
            dma(ofs - 1, par ^ 1).wait()

        last = cap // (_SLOT_BYTES // 4) + 1

        def drain(st, dma=dma, last=last):
            s, p = st
            d = dma(s, p)
            d.start()
            d.wait()
            return s + 1, p ^ 1

        jax.lax.while_loop(lambda st: st[0] <= last, drain, (ofs, par))


def _assemble_kernel(meta_ref, in_hbm, side_hbm, rec_hbm, out_hbm, u_ref,
                     w_ref, ring_ref, vring_ref, sem_u, sem_out, sem_ring,
                     sem_vring):
    """Execute the decide pass's record stream: decode_bulk's gang loop
    over a U plane of [dead tail | input | side]. All records are U-space
    (an output byte is never re-read), so there is no tail staging and no
    W-source hazard ordering — pure straight-line assembly."""
    g = pl.program_id(0)
    n_win = meta_ref[g, 1]

    din = pltpu.make_async_copy(
        in_hbm.at[g], u_ref.at[pl.ds(TAIL_ROWS, IN_ROWS)], sem_u.at[0])
    dside = pltpu.make_async_copy(
        side_hbm.at[g], u_ref.at[pl.ds(TAIL_ROWS + IN_ROWS, SIDE_ROWS)],
        sem_u.at[1])
    din.start()
    dside.start()

    def ring_copy(s):
        row0 = jnp.minimum(s * 8, REC_ROWS - 8)
        return pltpu.make_async_copy(
            rec_hbm.at[g, pl.ds(row0, 8)],
            ring_ref.at[pl.ds((s & 7) * 8, 8)], sem_ring.at[s & 7])

    def vring_copy(s):
        row0 = jnp.minimum(s * 8, REC_ROWS - 8)
        return pltpu.make_async_copy(
            rec_hbm.at[g, pl.ds(row0, 8)],
            vring_ref.at[pl.ds((s & 7) * 8, 8)], sem_vring.at[s & 7])

    for s in range(3):
        ring_copy(s).start()
        vring_copy(s).start()
    ring_copy(0).wait()
    vring_copy(0).wait()
    din.wait()
    dside.wait()

    word, do_entry = _machinery(ring_ref, vring_ref, 0)

    def entry(carry):
        p, waited = carry
        hi = (p + 256) >> 10

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
    for w in range(OUT_WIN):
        p_end = meta_ref[g, 5 + w]
        p, waited = jax.lax.while_loop(lambda c: c[0] < p_end, entry,
                                       (p, waited))

        @pl.when(w + 1 <= n_win)
        def _(w=w):
            dout = pltpu.make_async_copy(
                w_ref.at[pl.ds(0, WIN_ROWS)],
                out_hbm.at[g, pl.ds(w * WIN_ROWS, WIN_ROWS)], sem_out)
            dout.start()
            dout.wait()

    ring_copy(waited + 1).wait()
    ring_copy(waited + 2).wait()
    vring_copy(waited + 1).wait()
    vring_copy(waited + 2).wait()


def next_valid(cand_words):
    """Skip table: nv[i] = smallest j >= i whose candidate chain is
    non-empty (cand[j] >= 0); padded with 2^30. Runs as plain XLA on the
    (B, CAND_ROWS, 128) candidate planes (reverse cummin, ~1 ms/4M)."""
    B = cand_words.shape[0]
    flat = cand_words.reshape(B, -1)
    n = flat.shape[1]
    idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    vals = jnp.where(flat >= 0, idx, jnp.int32(1 << 30))
    nv = jax.lax.cummin(vals, axis=1, reverse=True)
    return nv.reshape(cand_words.shape)


@functools.partial(jax.jit, static_argnames=("interpret", "ext"))
def decide_batch(input_words, cand_words, nv_words, meta, *, ext=True,
                 interpret=False):
    """Pass 1: decisions only. Returns (side_words, rec_words, osz) where
    osz rows are [payload_size, n_win, overflow, 0, 0, p_end0..2]."""
    B = input_words.shape[0]
    kernel = functools.partial(_decide_kernel, ext=ext)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, SIDE_ROWS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, REC_ROWS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((_IN_SLOTS * _SLOT_ROWS, LANES), jnp.int32),
            pltpu.SMEM((_CAND_SLOTS * _SLOT_ROWS, LANES), jnp.int32),
            pltpu.SMEM((_NV_SLOTS * _SLOT_ROWS, LANES), jnp.int32),
            pltpu.SMEM((_SIDE_SLOTS * _SLOT_ROWS, LANES), jnp.int32),
            pltpu.SMEM((_REC_SLOTS * _SLOT_ROWS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(meta, input_words, cand_words, nv_words)


@functools.partial(jax.jit, static_argnames=("interpret",))
def assemble_batch(input_words, side_words, rec_words, osz, *,
                   interpret=False):
    """Pass 2: execute the record streams into payload planes."""
    B = input_words.shape[0]
    return pl.pallas_call(
        _assemble_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, OUT_ROWS_BULK, LANES),
                                       jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((TAIL_ROWS + IN_ROWS + SIDE_ROWS + 2, LANES),
                       jnp.int32),
            pltpu.VMEM((WIN_ROWS + 2, LANES), jnp.int32),
            pltpu.SMEM((_REC_SLOTS * 8, LANES), jnp.int32),
            pltpu.VMEM((_REC_SLOTS * 8, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
    )(osz, input_words, side_words, rec_words)


@functools.partial(jax.jit, static_argnames=("interpret", "ext"))
def emit_bulk_batch(input_words, cand_words, meta, *, ext=True,
                    interpret=False):
    """Device-resident two-pass emission. Same contract as
    encode_emit.emit_batch(matcher='cand') — payloads byte-identical to
    the host level-1 emission for the same candidates — at VPU assembly
    rate. Returns (payload_words (B, OUT_ROWS_BULK, 128), osz (B, 8));
    osz[:, 2] != 0 flags blocks that overflowed the record/side planes
    (pathological symbol mixes) and must take the single-pass fallback.
    """
    nv = next_valid(cand_words)
    side, rec, osz = decide_batch(input_words, cand_words, nv, meta,
                                  ext=ext, interpret=interpret)
    payload = assemble_batch(input_words, side, rec, osz,
                             interpret=interpret)
    return payload, osz


def emit_bulk_block(block: bytes, cand, *, ext=True, base=0,
                    interpret=True):
    """Single-block helper for tests: returns (payload bytes, overflow)."""
    iw = pack_input_words(block)[None]
    cw = pack_cand_words(np.asarray(cand, np.int32))[None]
    meta = np.zeros((1, 8), np.int32)
    meta[0, 0] = len(block) - base
    meta[0, 1] = base
    payload, osz = emit_bulk_batch(jnp.asarray(iw), jnp.asarray(cw),
                                   jnp.asarray(meta), ext=ext,
                                   interpret=interpret)
    osz = np.asarray(osz)
    return payload_from_words(payload[0], int(osz[0, 0])), int(osz[0, 2])
