"""Fused on-chip decode: bitstream parse + reconstruction in one kernel.

decode_tokens.py runs reconstruction (phase B) from host-parsed token
chunks. This kernel goes further: the RAW PAYLOAD is the only input — the
scalar unit parses the .tsq bitstream (control bits, size nibbles, offsets;
tsq_decode.cpp:42-315 semantics) out of small SMEM windows DMA'd ahead of
the parse cursor, while the vector unit reconstructs each format pair with
the shared single-crossbar pass (_reconstruct_pair). Host work drops to
the 3-byte container scan, and the device upload shrinks to the compressed
payload itself (token chunks are ~6x larger on dense streams).

Parse state rides the lax.while_loop carry (cursor, write frontier, parse
window bookkeeping); one iteration = one control group (8 symbols, <= 133
payload bytes). A four-slot SMEM window ring keeps ~2 windows of prefetch
lead ahead of the parse cursor. Trailing pad symbols of the final group parse as
garbage tokens, which is safe by construction: their destinations lie at
or beyond the declared size and every write is byte-masked, so decoded
bytes are never touched (the same tolerance the upstream decoder has).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_tokens import (
    LANES,
    OUT_ROWS,
    ROW_BYTES,
    _PairConsts,
    _reconstruct_pair,
)

_WIN_ROWS = 8                        # 4 KiB scalar parse window
_WIN_BYTES = _WIN_ROWS * ROW_BYTES
_WIN_SHIFT = 12                      # log2(_WIN_BYTES)
_GROUP_SLACK = 160                   # max group consumption (133) + margin


def _decode_stream_kernel(meta_ref, payload_hbm, dict_hbm, out_hbm, u_ref,
                          pwin_ref, sem_in, sem_out, sem_w, sem_d, *,
                          pay_rows, out_rows, dict_rows):
    b = pl.program_id(0)
    u_rows = pay_rows + out_rows
    pay_bytes = pay_rows * ROW_BYTES
    ext = meta_ref[b, 0]
    size = meta_ref[b, 1]
    dict_len = meta_ref[b, 2]
    cs = _PairConsts()

    # vector-source copy of the whole payload (literal/match reads)
    din = pltpu.make_async_copy(
        payload_hbm.at[b], u_ref.at[pl.ds(0, pay_rows)], sem_in)
    din.start()
    # preset dictionary (replicated across blocks): staged at the head of
    # the output region, so match sources reaching before the block hit it
    # — the on-chip twin of the upstream's reserved guard region
    # (turbosqueeze.cpp:128-136)
    if dict_rows:
        ddma = pltpu.make_async_copy(
            dict_hbm, u_ref.at[pl.ds(pay_rows, dict_rows)], sem_d)
        ddma.start()
        ddma.wait()

    def win_copy(w):
        row0 = jnp.minimum(w * _WIN_ROWS, pay_rows - _WIN_ROWS)
        return pltpu.make_async_copy(
            payload_hbm.at[b, pl.ds(row0, _WIN_ROWS)],
            pwin_ref.at[w & 3], sem_w.at[w & 3])

    win_copy(0).start()
    win_copy(1).start()
    win_copy(2).start()
    win_copy(0).wait()
    din.wait()

    def byte_at(i):
        # windows ride a 4-slot ring addressed by window index mod 4, so
        # any byte inside the resident windows resolves by i alone
        slot = (i >> _WIN_SHIFT) & 3
        off = i & (_WIN_BYTES - 1)
        w = pwin_ref[slot, off >> 9, (off >> 2) & (LANES - 1)]
        return (w >> ((i & 3) * 8)) & 0xFF

    def u16_at(i):
        # unaligned 16-bit LE read out of a word pair: ~2/3 the scalar ops
        # of two byte_at calls. Logical shift — an arithmetic >> would
        # sign-extend w0's high byte into the second result byte at sh=24.
        wi = i >> 2
        w0 = pwin_ref[(wi >> (_WIN_SHIFT - 2)) & 3,
                      (wi >> 7) & (_WIN_ROWS - 1), wi & (LANES - 1)]
        wj = wi + 1
        w1 = pwin_ref[(wj >> (_WIN_SHIFT - 2)) & 3,
                      (wj >> 7) & (_WIN_ROWS - 1), wj & (LANES - 1)]
        sh = (i & 3) * 8
        lo = jax.lax.shift_right_logical(w0, sh)
        return (lo | (w1 << (32 - jnp.maximum(sh, 8)))) & 0xFFFF

    size_end = dict_len + size

    def parse_group(i, j, waited):
        """Parse one control group (scalar unit only) -> cursors + the
        group's 24 token fields (dst_u, sz, src per symbol).

        Window ring invariant: windows [0, waited] are complete, windows
        (waited, waited+2] are in flight, and a slot is only overwritten
        three windows after the parse cursor leaves it. hi_w advances at
        most one window per group (a group consumes <= 133 bytes), so a
        single advance step per group maintains the invariant with ~2
        windows of prefetch lead.
        """
        hi_w = (i + _GROUP_SLACK - 1) >> _WIN_SHIFT

        def advance(st):
            i_, w_ = st
            win_copy(w_ + 1).wait()
            win_copy(w_ + 3).start()  # overwrites window w_ - 1's slot
            return i_, w_ + 1

        i, waited = jax.lax.cond(hi_w > waited, advance, lambda st: st,
                                 (i, waited))

        ctrl = byte_at(i)
        i += 1
        fields = []
        for pair_ix in range(4):
            size_byte = byte_at(i)
            i += 1
            anchor = j
            for half in range(2):
                nib = (size_byte >> 4) if half == 0 else (size_byte & 15)
                is_lit = (ctrl >> (7 - pair_ix * 2 - half)) & 1
                lit_sz = nib + 1
                mat_sz = jnp.where(jnp.logical_and(ext != 0, nib < 3),
                                   32 + 16 * nib, nib + 1)
                off = u16_at(i)
                src = jnp.where(is_lit == 1, i,
                                pay_bytes + anchor - off)
                sz = jnp.where(is_lit == 1, lit_sz, mat_sz)
                i = i + jnp.where(is_lit == 1, lit_sz, 2)
                fields += [pay_bytes + j, sz, jnp.clip(src, 0, None)]
                j = j + sz
        return i, j, waited, tuple(fields)

    def reconstruct_group(fields):
        for p in range(4):
            _reconstruct_pair(u_ref, u_rows, cs, *fields[6 * p:6 * p + 6])

    def cond(c):
        return c[1] < size_end  # parse frontier

    def body(c):
        # SOFTWARE PIPELINE at PAIR granularity: parse pair p of group g
        # (scalar unit) interleaved in program order with the
        # reconstruction of pair p of group g-1 from the carry (vector
        # unit). The two are data-independent inside one iteration; the
        # fine interleave makes the scalar/vector overlap explicit in
        # program order instead of hoping the scheduler hoists across a
        # whole group's worth of instructions (group-level separation
        # measured 1.57x over no pipelining in one session and ~1.0x in
        # another — scheduling across long straight-line spans is not
        # reliable; the per-pair weave holds the overlap structurally).
        i, j, waited = c[0], c[1], c[2]
        prev = c[3:]
        hi_w = (i + _GROUP_SLACK - 1) >> _WIN_SHIFT

        def advance(st):
            i_, w_ = st
            win_copy(w_ + 1).wait()
            win_copy(w_ + 3).start()
            return i_, w_ + 1

        i, waited = jax.lax.cond(hi_w > waited, advance, lambda st: st,
                                 (i, waited))
        ctrl = byte_at(i)
        i += 1
        fields = []
        for pair_ix in range(4):
            size_byte = byte_at(i)
            i += 1
            anchor = j
            for half in range(2):
                nib = (size_byte >> 4) if half == 0 else (size_byte & 15)
                is_lit = (ctrl >> (7 - pair_ix * 2 - half)) & 1
                lit_sz = nib + 1
                mat_sz = jnp.where(jnp.logical_and(ext != 0, nib < 3),
                                   32 + 16 * nib, nib + 1)
                off = u16_at(i)
                src = jnp.where(is_lit == 1, i,
                                pay_bytes + anchor - off)
                sz = jnp.where(is_lit == 1, lit_sz, mat_sz)
                i = i + jnp.where(is_lit == 1, lit_sz, 2)
                fields += [pay_bytes + j, sz, jnp.clip(src, 0, None)]
                j = j + sz
            _reconstruct_pair(u_ref, u_rows, cs,
                              *prev[6 * pair_ix:6 * pair_ix + 6])
        return (i, j, waited) + tuple(fields)

    # prime the pipeline: parse group 0 before the loop
    i0, j0, w0, f0 = parse_group(jnp.int32(3), dict_len, jnp.int32(0))
    final = jax.lax.while_loop(cond, body, (i0, j0, w0) + f0)
    waited = final[2]

    @pl.when(size > 0)
    def _():
        reconstruct_group(final[3:])  # drain the last parsed group

    # drain the two still-in-flight window prefetches: every DMA must be
    # waited before the kernel (grid step) ends
    win_copy(waited + 1).wait()
    win_copy(waited + 2).wait()

    dout = pltpu.make_async_copy(
        u_ref.at[pl.ds(pay_rows, out_rows)], out_hbm.at[b], sem_out)
    dout.start()
    dout.wait()


@functools.partial(jax.jit, static_argnames=("interpret", "out_rows"))
def decode_stream_batch(payload_words, meta, dict_words=None, *,
                        interpret=False, out_rows: int = OUT_ROWS):
    """Decode a batch of blocks from RAW payload words — no token input.

    payload_words: (B, pay_rows, 128) i32 zero-padded compressed payloads.
    meta: (B, 8) i32 with [ext, declared_size, dict_len, 0...] per block.
    dict_words: optional (dict_rows, 128) i32 preset dictionary, shared by
    every block in the batch (the BASELINE 'dictionary broadcast': under
    shard_map it is replicated across the mesh). Decoded bytes follow the
    staged dictionary — callers slice [dict_len : dict_len + size].
    Returns (B, out_rows, 128) i32 decoded words.
    """
    B = payload_words.shape[0]
    pay_rows = payload_words.shape[1]
    # byte_at addresses the 4-slot window ring purely by the cursor, which
    # assumes every window starts at w * _WIN_ROWS; a ragged final window
    # would silently misalign the parse (win_copy clamps its row0).
    if pay_rows % _WIN_ROWS or pay_rows < _WIN_ROWS:
        raise ValueError(
            f"pay_rows must be a positive multiple of {_WIN_ROWS}, "
            f"got {pay_rows}")
    if dict_words is None:
        dict_words = jnp.zeros((8, LANES), jnp.int32)
        dict_rows = 0
    else:
        dict_rows = dict_words.shape[0]
    kernel = functools.partial(_decode_stream_kernel, pay_rows=pay_rows,
                               out_rows=out_rows, dict_rows=dict_rows)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (B, 8) meta
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((pay_rows + out_rows, LANES), jnp.int32),
            pltpu.SMEM((4, _WIN_ROWS, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(meta, payload_words, dict_words)


def pack_meta(payloads_ext, sizes, dict_len: int = 0) -> np.ndarray:
    """(ext, size, dict_len) scalars per block for decode_stream_batch."""
    B = len(payloads_ext)
    meta = np.zeros((B, 8), dtype=np.int32)
    for k, (ext, size) in enumerate(zip(payloads_ext, sizes)):
        meta[k, 0] = 1 if ext else 0
        meta[k, 1] = size
        meta[k, 2] = dict_len
    return meta


def pack_dict_words(dictionary: bytes) -> np.ndarray:
    """Preset dictionary -> zero-padded (rows, 128) i32 words."""
    rows = max(-(-len(dictionary) // ROW_BYTES), 1)
    rows = -(-rows // 8) * 8
    buf = np.zeros(rows * ROW_BYTES, dtype=np.uint8)
    buf[:len(dictionary)] = np.frombuffer(dictionary, dtype=np.uint8)
    return buf.view("<i4").reshape(rows, LANES)
