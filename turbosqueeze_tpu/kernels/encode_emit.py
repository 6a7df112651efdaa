"""On-chip token emission (encode phase B): device-resident compress.

Phase A (kernels/encode_xla.find_candidates) already runs the exact
windowed predecessor search on device; this kernel closes the loop by
emitting the interleaved ctrl/size/token bitstream from that candidate
array ON CHIP, so ``backend="tpu"`` compression is device-resident end to
end (the host's only jobs are the 3-byte block headers and container
assembly). Output is byte-identical to the host level-1 emission
(csrc encode_candidates_impl + TokenSink, themselves upstream-decodable;
reference hot loop: tsq_encode.cpp:216-326) given the same candidates.

Everything here is scalar-unit work — LZ emission is a pointer-chasing
byte-granular scan with data-dependent control flow, the one shape of
compute a TPU's vector units cannot absorb — so per-chip throughput is
modest by design and fleet throughput comes from the block-DP mesh axis
(SURVEY.md §2). The memory system, however, is TPU-native: the 4 MiB
block never materializes in SMEM; three rings slide over HBM via DMA:

  * INPUT ring: 32 x 4 KiB slots. Match-extension sources reach
    <= 65534+63 bytes back, i.e. at most 17 slots — always resident.
    Refilled one slot per 4 KiB of cursor advance. Unaligned 32/64-bit
    loads mask EACH word index mod the ring, so reads crossing the ring
    seam wrap onto the correct slot by the residency invariant (scalar
    word reads need no mirror slot, unlike the decode kernels' contiguous
    2-row vector windows).
  * CAND ring: 4 x 1024-entry slots of the phase-A candidate array. The
    usable-candidate chain walk only dereferences positions in
    (anchor-4, i] — entries whose offset would be unrepresentable are
    exit conditions, not reads — so a 4096-entry ring vastly overcovers.
  * OUT ring: 8 x 4 KiB slots, flushed to HBM one slot behind the write
    cursor with a 64-byte delay so in-flight ctrl/size slot patches
    (always within 35 bytes of the cursor) land before their slot ships.

TokenSink semantics are replicated branchlessly: the ctrl/size
accumulators are RE-stored into their reserved slots on every symbol (the
final store of a group wins; intermediate values are never observed), and
`reserve` keeps bytes below the high-water mark exactly as the host does,
so the 16-byte literal over-copy contract — and with it byte-identity —
survives the ring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format import BLOCK_SZ, HASH_MASK, OUTPUT_SZ
from .decode_tokens import LANES, ROW_BYTES

# Shapes include a 64 KiB + slack dictionary margin: in dictionary mode the
# input is concat(dict, block) and candidates cover both (meta carries the
# block's base offset).
_DICT_ROWS = 136
IN_ROWS = BLOCK_SZ // ROW_BYTES + 8 + _DICT_ROWS   # zero-padded input words
OUT_ROWS = (OUTPUT_SZ + 3) // ROW_BYTES + 16
CAND_ROWS = BLOCK_SZ // LANES + 8 + _DICT_ROWS * 4  # one i32 cand per byte

_SLOT_ROWS = 8                                # 4 KiB DMA slots everywhere
_IN_SLOTS = 32
_IN_RING_BYTES = _IN_SLOTS * _SLOT_ROWS * ROW_BYTES        # 128 KiB
_CAND_SLOTS = 4
_CAND_RING = _CAND_SLOTS * _SLOT_ROWS * LANES              # 4096 entries
_OUT_SLOTS = 8
_OUT_RING_BYTES = _OUT_SLOTS * _SLOT_ROWS * ROW_BYTES      # 32 KiB
_SLOT_BYTES = _SLOT_ROWS * ROW_BYTES

_NONE = 0x7FFFFFFF                 # usable_candidate's UINT32_MAX

# len_code table as two packed constants: code for k in [4,16] is k-1,
# [17,31] -> 15, [32,47] -> 0, [48,63] -> 1, 64 -> 2 (csrc len_code).
def _len_code(k):
    return jnp.where(
        k <= 16, k - 1,
        jnp.where(k <= 31, 15, jnp.where(k <= 47, 0,
                                         jnp.where(k <= 63, 1, 2))))


def _code_width(c):
    return jnp.where(c < 3, (c + 2) << 4, c + 1)


def _lsr(x, n):
    return jax.lax.shift_right_logical(x, n)


# --- shared scalar machinery builders (used here and by encode_bulk) --------

def make_input_reader(sin):
    """Unaligned scalar 32/64-bit loads over the input SMEM ring (ring-wrap
    per word; residency is the caller's invariant, module docstring)."""
    _IN_WORDS = _IN_RING_BYTES // 4

    def in_word(wi):
        wi = wi & (_IN_WORDS - 1)
        return sin[wi >> 7, wi & (LANES - 1)]

    def load32(p):
        wi = p >> 2
        w0 = in_word(wi)
        w1 = in_word(wi + 1)
        sh = (p & 3) * 8
        return jnp.where(sh == 0, w0,
                         _lsr(w0, sh) | (w1 << (32 - jnp.maximum(sh, 8))))

    def load64(p):
        wi = p >> 2
        w0 = in_word(wi)
        w1 = in_word(wi + 1)
        w2 = in_word(wi + 2)
        sh = (p & 3) * 8
        ish = 32 - jnp.maximum(sh, 8)
        lo = jnp.where(sh == 0, w0, _lsr(w0, sh) | (w1 << ish))
        hi = jnp.where(sh == 0, w1, _lsr(w1, sh) | (w2 << ish))
        return lo, hi

    return in_word, load32, load64


def _tzb32(w):
    return jnp.where(w & 0xFF, 0,
                     jnp.where(w & 0xFFFF, 1,
                               jnp.where(w & 0xFFFFFF, 2,
                                         jnp.where(w, 3, 4))))


def make_extend(load64, ext):
    """Common-prefix length with format caps (csrc extend_match)."""
    def tz8(lo, hi):
        t = _tzb32(lo)
        return jnp.where(t < 4, t, 4 + _tzb32(hi))

    def xor_tz(a, c):
        alo, ahi = load64(a)
        blo, bhi = load64(c)
        return tz8(alo ^ blo, ahi ^ bhi)

    def extend(i, pos, anchor):
        k = xor_tz(i, pos)
        if ext:
            def ecxt(st):
                k_, m_ = st
                return jnp.logical_and(k_ == 8 * m_,
                                       jnp.logical_and(k_ < 64, m_ < 8))

            def ebody(st):
                k_, m_ = st
                nb = xor_tz(i + 8 * m_, pos + 8 * m_)
                return k_ + nb, m_ + 1

            k, _ = jax.lax.while_loop(ecxt, ebody, (k, jnp.int32(1)))
        else:
            k = jnp.where(k == 8, k + xor_tz(i + 8, pos + 8), k)
        window = anchor - pos
        return jnp.where(k > window, window - 1, k)

    return extend


def make_usable(cand_at):
    """Nearest chain entry p with p + 4 <= anchor (csrc usable_candidate);
    _NONE when absent/unrepresentable. Chain reads only touch positions in
    (anchor-4, i] — inside the cand ring."""
    def usable(i, anchor):
        p = cand_at(i)

        def wcond(p_):
            return jnp.logical_and(p_ >= 0, p_ + 4 > anchor)

        p = jax.lax.while_loop(wcond, lambda p_: cand_at(p_), p)
        bad = jnp.logical_or(p < 0, anchor - p > 65534)
        return jnp.where(bad, jnp.int32(_NONE), p)

    return usable


def _emit_kernel(meta_ref, in_hbm, cand_hbm, out_hbm, osz_ref,
                 sin, scand, sout, sem_i, sem_c, sem_o, *, ext,
                 matcher="cand"):
    b = pl.program_id(0)
    size = meta_ref[b, 0]
    base = meta_ref[b, 1]          # dict length (0 for plain blocks)
    end = base + size
    # matcher="table": scand IS the upstream 2^17-entry 16-bit hash table
    # (two entries packed per i32 word, zeroed per block below) and the
    # candidate ring/DMAs are absent — the exact tsqEncode probe semantics
    # (tsq_encode.cpp:222-229) run inline in the scan.

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

    def out_dma(s, par):
        row0 = jnp.minimum(s * _SLOT_ROWS, OUT_ROWS - _SLOT_ROWS)
        return pltpu.make_async_copy(
            sout.at[pl.ds((s & (_OUT_SLOTS - 1)) * _SLOT_ROWS, _SLOT_ROWS)],
            out_hbm.at[b, pl.ds(row0, _SLOT_ROWS)], sem_o.at[par])

    # prologue: 2 slots of prefetch lead on both read rings from the
    # cursor's start slot (the decode kernels' protocol: slots [0, waited]
    # complete, (waited, waited+2] in flight; advance waits w+1, starts
    # w+3). In dictionary mode the cursor starts at `base`, so the dict
    # region BEHIND it (match-extension reach: 65534+63 bytes) is
    # preloaded serially first — one-time, <= 17 slots.
    s0_in = base >> 12
    s0_cand = base >> 10
    for k in range(17):            # input slots [s0-16, s0] (clamped)
        w = jnp.clip(s0_in - 16 + k, 0, s0_in)

        @pl.when(base > 0)
        def _(w=w):
            dma = in_dma(w)
            dma.start()
            dma.wait()

    if matcher == "cand":
        @pl.when(base > 0)
        def _():
            dma = cand_dma(jnp.maximum(s0_cand - 1, 0))
            dma.start()
            dma.wait()

    for d in range(3):
        in_dma(s0_in + d).start()
        if matcher == "cand":
            cand_dma(s0_cand + d).start()
    in_dma(s0_in).wait()
    if matcher == "cand":
        cand_dma(s0_cand).wait()
    else:
        # zero the hash table: blocks are pure functions of their bytes
        # (the upstream zeroes via tsqInit, tsq_threads.cpp:176)
        def zrow(w, _):
            scand[w >> 7, w & (LANES - 1)] = jnp.int32(0)
            return 0

        jax.lax.fori_loop(0, (HASH_MASK + 1) // 2, zrow, 0)

    # --- scalar ring accessors ---------------------------------------------
    in_word, load32, load64 = make_input_reader(sin)

    def cand_at(p):
        e = p & (_CAND_RING - 1)
        return scand[e >> 7, e & (LANES - 1)]

    _OUT_WORDS = _OUT_RING_BYTES // 4

    def out_byte(p, v):
        p = jnp.int32(p)   # python-int positions: keep shifts in int32
        wi = (p >> 2) & (_OUT_WORDS - 1)
        sh = (p & 3) * 8
        m = jnp.int32(0xFF) << sh
        cur = sout[wi >> 7, wi & (LANES - 1)]
        sout[wi >> 7, wi & (LANES - 1)] = (
            (cur & ~m) | (((v & 0xFF) << sh) & m))

    def out_word_rmw(wi, keep_mask, val):
        wi = wi & (_OUT_WORDS - 1)
        cur = sout[wi >> 7, wi & (LANES - 1)]
        sout[wi >> 7, wi & (LANES - 1)] = (cur & keep_mask) | val

    # --- format helpers -----------------------------------------------------
    extend = make_extend(load64, ext)
    usable = make_usable(cand_at)

    def probe(i):
        """Exact upstream hash probe: 16-bit stored position promoted into
        the 64 KiB window ending at i, then record i (tsq_encode.cpp:
        222-229). Returns (current 4 bytes, candidate position)."""
        cur = load32(i)
        h = (cur ^ _lsr(cur, 12)) & HASH_MASK
        word = h >> 1
        half = h & 1
        v = scand[word >> 7, word & (LANES - 1)]
        p16 = jnp.where(half == 1, _lsr(v, 16), v) & 0xFFFF
        i16 = i & 0xFFFF
        hi = i & ~0xFFFF
        pos = jnp.where(p16 >= i16, p16 + hi - 65536, p16 + hi)
        nv = jnp.where(half == 1, (v & 0xFFFF) | (i16 << 16),
                       (v & jnp.int32(-65536)) | i16)
        scand[word >> 7, word & (LANES - 1)] = nv
        return cur, pos

    def probe_ok(i, cur, pos, anchor):
        offset = anchor - pos
        return jnp.logical_and(
            cur == load32(pos),
            jnp.logical_and(offset >= 4, offset <= 65534))

    # --- TokenSink state: packed in a dict-like tuple ----------------------
    # (j, ctrl_at, size_at, n_sym, anchor, ctrl_acc, size_acc, hwm,
    #  out_flushed_slot, out_par)
    def reserve_keep(j, hwm):
        # zero the reserved slot only at/above the high-water mark; below
        # it an over-copy byte must survive (host reserve())
        wi = (j >> 2) & (_OUT_WORDS - 1)
        sh = (j & 3) * 8
        cur = sout[wi >> 7, wi & (LANES - 1)]
        zeroed = cur & ~(jnp.int32(0xFF) << sh)
        sout[wi >> 7, wi & (LANES - 1)] = jnp.where(j >= hwm, zeroed, cur)

    def account(sink, ctrl_bit, nibble, cursor):
        (j, ctrl_at, size_at, n_sym, anchor, ctrl_acc, size_acc, hwm,
         ofs, opar) = sink
        n_sym = n_sym + 1
        ctrl_acc = ((ctrl_acc << 1) | ctrl_bit) & 0xFF
        out_byte(ctrl_at, ctrl_acc)       # group-final store wins
        adv8 = ((n_sym & 7) == 0).astype(jnp.int32)
        reserve_keep(j, hwm)              # benign when adv8 == 0: the byte
        ctrl_at = jnp.where(adv8 == 1, j, ctrl_at)   # is rewritten by data
        j = j + adv8
        size_acc = ((size_acc << 4) | nibble) & 0xFF
        out_byte(size_at, size_acc)
        adv2 = ((n_sym & 1) == 0).astype(jnp.int32)
        reserve_keep(j, hwm)
        size_at = jnp.where(adv2 == 1, j, size_at)
        j = j + adv2
        anchor = jnp.where(adv2 == 1, cursor, anchor)
        return (j, ctrl_at, size_at, n_sym, anchor, ctrl_acc, size_acc,
                hwm, ofs, opar)

    def out_flush(sink):
        """Ship completed out-ring slots (with the 64-byte patch delay)."""
        (j, ctrl_at, size_at, n_sym, anchor, ctrl_acc, size_acc, hwm,
         ofs, opar) = sink

        def need(st):
            ofs_, opar_ = st
            return j - 64 >= (ofs_ + 1) * _SLOT_BYTES

        def ship(st):
            ofs_, opar_ = st

            @pl.when(ofs_ >= 2)
            def _():
                out_dma(ofs_ - 2, opar_).wait()

            out_dma(ofs_, opar_).start()
            return ofs_ + 1, opar_ ^ 1

        ofs, opar = jax.lax.while_loop(need, ship, (ofs, opar))
        return (j, ctrl_at, size_at, n_sym, anchor, ctrl_acc, size_acc,
                hwm, ofs, opar)

    def put_literal16(sink, src):
        """One literal symbol's 16-byte over-copying store (host
        TokenSink::literals memcpy contract)."""
        (j, ctrl_at, size_at, n_sym, anchor, ctrl_acc, size_acc, hwm,
         ofs, opar) = sink
        v = [load32(src + 4 * m) for m in range(4)]
        wi = j >> 2
        ds = (j & 3) * 8
        ids = 32 - jnp.maximum(ds, 8)
        lowm = ~(jnp.int32(-1) << jnp.minimum(ds, 31)) & \
            jnp.where(ds == 0, 0, -1)
        # first word: keep low ds bits
        out_word_rmw(wi, lowm, (v[0] << ds) & ~lowm)
        for m in range(1, 4):
            full = jnp.where(ds == 0, v[m],
                             _lsr(v[m - 1], ids) | (v[m] << ds))
            out_word_rmw(wi + m, 0, full)
        # fifth word only when misaligned: keep high bits
        tailv = jnp.where(ds == 0, 0, _lsr(v[3], ids) & lowm)
        tailm = jnp.where(ds == 0, jnp.int32(-1), ~lowm)
        out_word_rmw(wi + 4, tailm, tailv)
        return sink

    def literals(sink, in_from, upto):
        """Flush [from, upto) as <=16-byte runs (bounded unrolled: callers
        flush at most 32 bytes at a time)."""
        def one(sink, frm, rem):
            run = jnp.minimum(rem, 16)
            sink = put_literal16(sink, frm)
            j = sink[0]
            hwm = jnp.maximum(sink[7], j + 16)
            sink = sink[:7] + (hwm,) + sink[8:]
            sink = (j + run,) + sink[1:]
            sink = account(sink, jnp.int32(1), run - 1, frm + run)
            return out_flush(sink), frm + run, rem - run

        return one, sink, in_from, upto

    def do_literals(sink, frm, upto, max_runs):
        one, sink, frm, _ = literals(sink, frm, upto)
        rem = upto - frm
        for _ in range(max_runs):
            def live(st):
                s_, f_, r_ = st
                return one(s_, f_, r_)

            def dead(st):
                return st

            sink, frm, rem = jax.lax.cond(rem > 0, live, dead,
                                          (sink, frm, rem))
        return sink

    def put_match(sink, offset, code, new_cursor):
        (j, ctrl_at, size_at, n_sym, anchor, ctrl_acc, size_acc, hwm,
         ofs, opar) = sink
        out_byte(j, offset & 0xFF)
        out_byte(j + 1, _lsr(offset, 8) & 0xFF)
        hwm = jnp.maximum(hwm, j + 2)
        sink = (j + 2, ctrl_at, size_at, n_sym, anchor, ctrl_acc,
                size_acc, hwm, ofs, opar)
        sink = account(sink, jnp.int32(0), code, new_cursor)
        return out_flush(sink)

    # --- ring maintenance driven by the input cursor -----------------------
    def rings_advance(i, wi_in, wi_cand):
        """Keep 2 slots of prefetch lead on the input and cand rings; one
        cond per cursor step, keyed on either boundary. `wi_*` = highest
        COMPLETE slot; (wi, wi+2] in flight. Cursor jumps are < one slot
        (64 < 1024 entries / 4096 bytes), so one advance per call keeps
        the invariant."""
        due_in = ((i + 72) >> 12) > wi_in       # reads reach i + 71
        due_cand = ((i + 2) >> 10) > wi_cand if matcher == "cand" \
            else jnp.bool_(False)               # no cand ring in table mode

        def adv(st):
            wi_in_, wi_cand_ = st

            def adv_in(w):
                in_dma(w + 1).wait()
                in_dma(w + 3).start()
                return w + 1

            def adv_cand(w):
                cand_dma(w + 1).wait()
                cand_dma(w + 3).start()
                return w + 1

            wi_in_ = jax.lax.cond(due_in, adv_in, lambda w: w, wi_in_)
            if matcher == "cand":
                wi_cand_ = jax.lax.cond(due_cand, adv_cand, lambda w: w,
                                        wi_cand_)
            return wi_in_, wi_cand_

        return jax.lax.cond(jnp.logical_or(due_in, due_cand), adv,
                            lambda st: st, (wi_in, wi_cand))

    # --- the emission state machine (csrc encode_candidates_impl) ----------
    # state: i, run_start, pos, live, sink(10), wi_in, wi_cand
    sink0 = (jnp.int32(5), jnp.int32(3), jnp.int32(4), jnp.int32(0),
             base, jnp.int32(0), jnp.int32(0), jnp.int32(5),
             jnp.int32(0), jnp.int32(0))
    # payload header: 3-byte declared size + the two slots the host ctor
    # reserves (and zeroes) for the first group's ctrl/size bytes
    out_byte(0, size & 0xFF)
    out_byte(1, _lsr(size, 8) & 0xFF)
    out_byte(2, _lsr(size, 16) & 0xFF)
    out_byte(3, 0)
    out_byte(4, 0)

    def outer_cond(st):
        return st[3] != 0

    def outer(st):
        i, run_start, pos, live, wi_in, wi_cand = \
            st[0], st[1], st[2], st[3], st[14], st[15]
        sink = st[4:14]

        # SCAN: advance until a usable candidate or end of block
        def scan_cond(sst):
            i_, pos_ = sst[0], sst[2]
            return jnp.logical_and(i_ < end, pos_ == _NONE)

        def scan(sst):
            i_, rs_, pos_, wi_in_, wi_cand_ = \
                sst[0], sst[1], sst[2], sst[13], sst[14]
            sink_ = sst[3:13]
            i_ = i_ + 1
            wi_in_, wi_cand_ = rings_advance(i_, wi_in_, wi_cand_)
            if matcher == "cand":
                pos_ = jnp.where(i_ < end, usable(i_, sink_[4]),
                                 jnp.int32(_NONE))
            else:
                # exact upstream scan step: probe + update the table at
                # EVERY position, validate against the PRE-flush anchor
                # (the stale offset in the loop condition is upstream
                # behavior; the match loop re-validates)
                cur_, cpos_ = probe(i_)
                ok_ = jnp.logical_and(i_ < end,
                                      probe_ok(i_, cur_, cpos_, sink_[4]))
                pos_ = jnp.where(ok_, cpos_, jnp.int32(_NONE))

            def flush32(fst):
                sink_f, pos_f = fst
                sink_f = do_literals(sink_f, i_ - 32, i_, 2)
                if matcher == "cand":
                    pos_f = jnp.where(
                        jnp.logical_and(i_ < end, pos_f != _NONE),
                        usable(i_, sink_f[4]), pos_f)
                return sink_f, pos_f

            sink_, pos_ = jax.lax.cond(
                i_ - rs_ > 31, flush32, lambda fst: fst, (sink_, pos_))
            rs_ = jnp.where(i_ - rs_ > 31, i_, rs_)
            return (i_, rs_, pos_) + sink_ + (wi_in_, wi_cand_)

        sst = jax.lax.while_loop(
            scan_cond, scan,
            (i, run_start, pos) + sink + (wi_in, wi_cand))
        i, run_start, pos, wi_in, wi_cand = \
            sst[0], sst[1], sst[2], sst[13], sst[14]
        sink = sst[3:13]
        # trailing literals of the run (<= 32 bytes by the flush rule)
        sink = do_literals(sink, run_start, i, 2)
        if matcher == "cand":
            # the trailing flush can advance the anchor past the
            # candidate's 16-bit reach; re-walk the chain under the new
            # anchor (host parity: an unvalidated emit would wrap the
            # offset mod 2^16 — the upstream re-checks too,
            # tsq_encode.cpp:298)
            pos = jnp.where(sink[4] - pos > 65534,
                            usable(i, sink[4]), pos)

        def after_end(mst):
            return mst

        def matches(mst):
            # MATCH loop with immediate chaining
            def mcond(m):
                return m[2] != 0

            def mbody(m):
                i_, pos_, _, wi_in_, wi_cand_ = \
                    m[0], m[1], m[2], m[13], m[14]
                sink_ = m[3:13]
                anchor = sink_[4]
                k = extend(i_, pos_, anchor)

                def emit(em):
                    i_e, pos_e, sink_e, wi_i, wi_c = em
                    anchor_e = sink_e[4]
                    offset = anchor_e - pos_e
                    code = _len_code(k)
                    i_e = i_e + _code_width(code)
                    sink_e = put_match(sink_e, offset, code, i_e)
                    wi_i, wi_c = rings_advance(i_e, wi_i, wi_c)
                    if matcher == "cand":
                        pos_n = jnp.where(i_e < end - 5,
                                          usable(i_e, sink_e[4]),
                                          jnp.int32(_NONE))
                    else:
                        # re-probe chaining, upstream tsq_encode.cpp:
                        # 315-321 (the table updates at the new cursor
                        # even when the loop is about to exit)
                        cur_n, cpos_n = probe(i_e)
                        ok_n = jnp.logical_and(
                            i_e < end - 5,
                            probe_ok(i_e, cur_n, cpos_n, sink_e[4]))
                        pos_n = jnp.where(ok_n, cpos_n, jnp.int32(_NONE))
                    cont = (pos_n != _NONE).astype(jnp.int32)
                    return i_e, pos_n, cont, sink_e, wi_i, wi_c

                def stop(em):
                    i_e, pos_e, sink_e, wi_i, wi_c = em
                    return i_e, pos_e, jnp.int32(0), sink_e, wi_i, wi_c

                if matcher == "cand":
                    can_emit = k >= 4
                else:
                    # the anchor may have advanced since the scan's probe
                    # (literal flushes): re-validate the offset exactly
                    # where the upstream does (tsq_encode.cpp:298)
                    off_ = sink_[4] - pos_
                    can_emit = jnp.logical_and(
                        k >= 4, jnp.logical_and(off_ >= 4, off_ <= 65534))
                i_, pos_, cont, sink_, wi_in_, wi_cand_ = jax.lax.cond(
                    can_emit, emit, stop,
                    (i_, pos_, sink_, wi_in_, wi_cand_))
                return (i_, pos_, cont) + sink_ + (wi_in_, wi_cand_)

            m = jax.lax.while_loop(
                mcond, mbody,
                (mst[0], mst[1], jnp.int32(1)) + mst[3:13]
                + (mst[13], mst[14]))
            return (m[0], m[1], jnp.int32(0)) + m[3:13] + (m[13], m[14])

        mst = (i, pos, jnp.int32(0)) + sink + (wi_in, wi_cand)
        mst = jax.lax.cond(
            jnp.logical_and(i < end, pos != _NONE), matches, after_end,
            mst)
        i, wi_in, wi_cand = mst[0], mst[13], mst[14]
        sink = mst[3:13]
        live = (i < end).astype(jnp.int32)
        return (i, i, jnp.int32(_NONE), live) + sink + (wi_in, wi_cand)

    init = (base, base, jnp.int32(_NONE),
            (size > 0).astype(jnp.int32)
            ) + sink0 + (s0_in, s0_cand)
    fin = jax.lax.while_loop(outer_cond, outer, init)
    sink = fin[4:14]
    wi_in, wi_cand = fin[14], fin[15]

    # finish(): pad the final control byte with literal bits; a half-filled
    # size byte pads its low nibble with zero (host TokenSink::finish).
    # At even n_sym the upstream tail loop still shifts the freshly
    # reserved EMPTY size slot one nibble left (residue << 4,
    # tsq_encode.cpp:330-339) — only n_sym % 8 == 0 skips the loop.
    (j, ctrl_at, size_at, n_sym, anchor, ctrl_acc, size_acc, hwm,
     ofs, opar) = sink

    def out_read(p):
        p = jnp.int32(p)
        wi = (p >> 2) & (_OUT_WORDS - 1)
        sh = (p & 3) * 8
        return _lsr(sout[wi >> 7, wi & (LANES - 1)], sh) & 0xFF

    @pl.when((n_sym & 7) != 0)
    def _():
        half = (n_sym & 1) != 0
        out_byte(size_at, jnp.where(half, (size_acc << 4) & 0xFF,
                                    (out_read(size_at) << 4) & 0xFF))

        pad = 8 - (n_sym & 7)
        out_byte(ctrl_at, ((ctrl_acc << pad) | ((1 << pad) - 1)) & 0xFF)

    osz_ref[b, 0] = j

    # epilogue: drain every ring DMA (read rings' in-flight prefetches and
    # the remaining out slots, over-copy slack included)
    in_dma(wi_in + 1).wait()
    in_dma(wi_in + 2).wait()
    if matcher == "cand":
        cand_dma(wi_cand + 1).wait()
        cand_dma(wi_cand + 2).wait()

    @pl.when(ofs >= 2)
    def _():
        out_dma(ofs - 2, opar).wait()

    @pl.when(ofs >= 1)
    def _():
        out_dma(ofs - 1, opar ^ 1).wait()

    last_slot = (j + 16) // _SLOT_BYTES

    def drain(st):
        s, p = st
        dma = out_dma(s, p)
        dma.start()
        dma.wait()
        return s + 1, p ^ 1

    jax.lax.while_loop(lambda st: st[0] <= last_slot, drain, (ofs, opar))


@functools.partial(jax.jit, static_argnames=("interpret", "ext",
                                              "matcher"))
def emit_batch(input_words, cand_words, meta, *, ext=True,
               interpret=False, matcher="cand"):
    """Emit block payloads from input bytes + phase-A candidates, on chip.

    input_words: (B, IN_ROWS, 128) i32 zero-padded block bytes.
    cand_words:  (B, CAND_ROWS, 128) i32 candidate array (find_candidates
    output padded with -1), one entry per input byte.
    meta: (B, 8) i32 with [size, base(dict len), 0...] per block.
    Returns (payload_words (B, OUT_ROWS, 128) i32, sizes (B, 8) i32 with
    the payload byte length in column 0). matcher='cand' (default):
    payloads are byte-identical to native.encode_block_candidates(...,
    level=1) for the same candidates. matcher='table': cand_words may be
    None — the kernel runs the upstream's exact 16-bit hash-table parse
    (tsq_encode.cpp:216-326) and payloads are byte-identical to the
    UPSTREAM BINARY's (and native level-0's) output.
    """
    B = input_words.shape[0]
    if matcher == "table":
        # no phase-A candidates: the upstream 2^17 x u16 hash table lives
        # in SMEM (two entries per word) and the probe runs in the scan
        if cand_words is None:
            cand_words = jnp.zeros((1, 8, LANES), jnp.int32)
        scand_shape = ((HASH_MASK + 1) // 2 // LANES, LANES)
    else:
        scand_shape = (_CAND_SLOTS * _SLOT_ROWS, LANES)
    kernel = functools.partial(_emit_kernel, ext=ext, matcher=matcher)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, OUT_ROWS, LANES), jnp.int32),
            jax.ShapeDtypeStruct((B, 8), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((_IN_SLOTS * _SLOT_ROWS, LANES), jnp.int32),
            pltpu.SMEM(scand_shape, jnp.int32),
            pltpu.SMEM((_OUT_SLOTS * _SLOT_ROWS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(meta, input_words, cand_words)


# --- host-side glue ----------------------------------------------------------

def pack_input_words(block: bytes) -> np.ndarray:
    buf = np.zeros(IN_ROWS * ROW_BYTES, dtype=np.uint8)
    buf[:len(block)] = np.frombuffer(block, dtype=np.uint8)
    return buf.view("<i4").reshape(IN_ROWS, LANES)


def pack_cand_words(cand: np.ndarray) -> np.ndarray:
    buf = np.full(CAND_ROWS * LANES, -1, dtype=np.int32)
    buf[:len(cand)] = cand
    return buf.reshape(CAND_ROWS, LANES)


def payload_from_words(words, psz: int) -> bytes:
    return np.asarray(words).reshape(-1).view("<u1")[:psz].tobytes()
