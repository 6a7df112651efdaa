"""Pallas TPU kernel: token-driven block reconstruction (decode phase B).

Decode is split TPU-first into two phases (SURVEY.md §7.2):
  A. token parse — a byte-granular serial scan (3-30x cheaper than the byte
     moving itself). Produced by the native tokenizer (csrc tsq_tokenize_block)
     for arbitrary .tsq streams, or emitted directly by our encoder.
  B. reconstruction — ALL the byte movement: literal copies from the payload
     and match copies from the decoded output. This kernel runs phase B
     entirely on-chip, batched over independent blocks (the data-parallel
     axis that shards across the mesh, parallel/pipeline.py).

Design notes (hardware-measured on TPU v5e):
  * XLA-level gather/scatter runs ~137 Melem/s — unusable. The two fast
    dynamic-addressing primitives are scalar-driven dynamic row slices of
    VMEM and (8,128) tpu.dynamic_gather (take_along_axis with matching
    shapes). The kernel is built from exactly those.
  * Data lives as little-endian i32 words in (rows, 128) VMEM tiles
    (512 bytes per row). A <=64-byte copy touches <=18 consecutive words =
    always within 2 consecutive rows.
  * Per symbol: read 2 source rows (dynamic slice) -> rotate lanes to align
    (lane gather) -> byte-shift across words -> lane-place at the
    destination (lane gather) -> masked read-modify-write of 2 dest rows.
  * Match sources always end strictly before their pair anchor (encoder
    invariant, format spec), so processing symbols in order never reads
    bytes later than the write frontier; the masked RMW makes over-wide
    row operations safe.

Token streams arrive packed two-words-per-token in SMEM chunks:
  word A = dst | len << 23 | is_literal << 30        word B = src
Slot 0 of each chunk holds the live-token count (so no separate counts
input has to fight the SMEM tiling rules); tokens occupy slots 1..count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format import BLOCK_SZ, OUTPUT_SZ

LANES = 128
ROW_BYTES = LANES * 4                       # 512 bytes per (1,128) i32 row
OUT_ROWS = BLOCK_SZ // ROW_BYTES + 16       # 4 MiB + overshoot slack
PAY_ROWS = (OUTPUT_SZ + 3) // ROW_BYTES + 16
TOKENS_PER_CHUNK = 1024                     # slot 0 = count, 1023 tokens
_SLOT_ROWS = TOKENS_PER_CHUNK // LANES

_DST_MASK = (1 << 23) - 1
_LEN_SHIFT = 23
_LEN_MASK = (1 << 7) - 1
_LIT_SHIFT = 30


def _lane_iota8():
    return jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)


def _tga_lanes(x8, idx8):
    """Lane gather on (8,128) tiles — the TPU dynamic_gather crossbar path.

    Mosaic requires operand/index/output shapes to match exactly and only
    supports the native (8,128) tile, hence the broadcast-to-8-rows dance in
    the callers (7/8 rows are redundant; token batching can reclaim them).
    """
    return jnp.take_along_axis(x8, idx8, axis=1)


def _bcast_row(row1):
    """(1,128) -> (8,128) broadcast."""
    return jnp.broadcast_to(row1, (8, LANES))


def _decode_chunk_kernel(tok_a_ref, tok_b_ref, payload_ref, out_ref):
    """Execute one chunk of tokens against this block's payload/output."""
    n = tok_a_ref[0, 0, 0, 0]
    pay_rows = payload_ref.shape[1]
    out_rows = out_ref.shape[1]
    lane8 = _lane_iota8()
    lane = lane8[0:1, :]

    def body(t, _):
        a = tok_a_ref[0, 0, t >> 7, t & 127]
        src = tok_b_ref[0, 0, t >> 7, t & 127]
        dst = a & _DST_MASK
        ln = (a >> _LEN_SHIFT) & _LEN_MASK
        is_lit = a >> _LIT_SHIFT

        # --- source read: aligned words holding bytes src..src+71 ----------
        src_w = src >> 2
        src_row = src_w >> 7
        src_lane = src_w & (LANES - 1)
        sa = (src & 3) * 8  # bit offset within the first word

        def read_aligned(ref, max_rows):
            row = jnp.minimum(src_row, max_rows - 2)
            win = ref[0, pl.ds(row, 2), :]
            lo = _bcast_row(win[0:1, :])
            hi = _bcast_row(win[1:2, :])
            # lanes src_lane .. src_lane+18 of the 256-lane window; only
            # lanes 0..17 of the result are ever used, so deriving the
            # +1-shifted view by a lane roll is safe (lane 127 is junk).
            idx = src_lane + lane8
            w0 = jnp.where(idx < LANES, _tga_lanes(lo, idx & (LANES - 1)),
                           _tga_lanes(hi, idx & (LANES - 1)))[0:1, :]
            w1 = jnp.roll(w0, -1, axis=1)
            # byte-align: little-endian, so byte k of the stream is bits
            # [8k, 8k+8) of word k>>2
            return jnp.where(
                sa == 0, w0,
                jax.lax.shift_right_logical(w0, sa)
                | jax.lax.shift_left(w1, 32 - jnp.where(sa == 0, 1, sa)))

        # cond over the two sources: measured faster than a branch-free
        # double-read (the extra dynamic-index window read costs more than
        # the branch).
        aligned = jax.lax.cond(
            is_lit != 0,
            lambda: read_aligned(payload_ref, pay_rows),
            lambda: read_aligned(out_ref, out_rows),
        )

        # --- destination write: masked RMW of 2 rows -----------------------
        dst_w = dst >> 2
        dst_row = jnp.minimum(dst_w >> 7, out_rows - 2)
        dst_lane = dst_w & (LANES - 1)
        d = (dst & 3) * 8

        # shift the aligned bytes right by d bits across word boundaries
        placed0 = jnp.where(d == 0, aligned, jax.lax.shift_left(aligned, d))
        carry = jnp.where(
            d == 0, jnp.zeros_like(aligned),
            jax.lax.shift_right_logical(aligned, 32 - jnp.where(d == 0, 1, d)))
        # word w of the destination window gets placed0[w] | carry[w-1]
        carry_prev = jnp.where(lane == 0, 0, jnp.roll(carry, 1, axis=1))
        update8 = _bcast_row(placed0 | carry_prev)

        # place into destination lanes: window lane q holds update word
        # (q - dst_lane) for row 0 and (q + 128 - dst_lane) for row 1.
        # Both coincide mod 128, so one gather serves both rows;
        # out-of-range lanes are killed by the byte masks below.
        row_val = _tga_lanes(update8, (lane8 - dst_lane) & (LANES - 1))[0:1, :]

        # per-byte masks: global byte positions [dst, dst+ln)
        def byte_mask(row_origin_byte):
            base = row_origin_byte + lane * 4
            m = jnp.zeros((1, LANES), jnp.int32)
            for k in range(4):
                byte_idx = base + k
                inside = jnp.logical_and(byte_idx >= dst, byte_idx < dst + ln)
                m = m | jnp.where(inside, jnp.int32(0xFF) << (8 * k), 0)
            return m

        origin = dst_row * ROW_BYTES
        m0 = byte_mask(origin)
        m1 = byte_mask(origin + ROW_BYTES)

        cur0 = out_ref[0, pl.ds(dst_row, 1), :]
        out_ref[0, pl.ds(dst_row, 1), :] = (cur0 & ~m0) | (row_val & m0)
        cur1 = out_ref[0, pl.ds(dst_row + 1, 1), :]
        out_ref[0, pl.ds(dst_row + 1, 1), :] = (cur1 & ~m1) | (row_val & m1)
        return 0

    jax.lax.fori_loop(1, n + 1, body, 0, unroll=False)


@functools.partial(jax.jit, static_argnames=("interpret", "out_rows"))
def decode_tokens_batch(payload_words, tok_a, tok_b, *, interpret=False,
                        out_rows: int = OUT_ROWS):
    """Reconstruct a batch of blocks from payload words and token chunks.

    payload_words: (B, pay_rows, 128) i32 — per-block compressed payloads.
    tok_a, tok_b:  (B, n_chunks, 8, 128) i32 packed token chunks.
    Returns (B, out_rows, 128) i32 decoded words.

    The batch axis is the data-parallel axis: shard it over the mesh
    (parallel/pipeline.py wraps this in shard_map). Row counts default to
    full 4 MiB blocks; smaller values serve fast compile checks and tests.
    """
    B, n_chunks = tok_a.shape[0], tok_a.shape[1]
    pay_rows = payload_words.shape[1]
    tok_spec = pl.BlockSpec((1, 1, _SLOT_ROWS, LANES),
                            lambda b, c: (b, c, 0, 0),
                            memory_space=pltpu.SMEM)
    return pl.pallas_call(
        _decode_chunk_kernel,
        grid=(B, n_chunks),
        in_specs=[
            tok_spec, tok_spec,
            pl.BlockSpec((1, pay_rows, LANES), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_rows, LANES), lambda b, c: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, LANES), jnp.int32),
        interpret=interpret,
    )(tok_a, tok_b, payload_words)


# --- host-side glue ----------------------------------------------------------

def pack_payload_words(payload: bytes) -> np.ndarray:
    buf = np.zeros(PAY_ROWS * ROW_BYTES, dtype=np.uint8)
    buf[:len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    return buf.view("<i4").reshape(PAY_ROWS, LANES)


def pack_tokens(dst, src, ln, lit, n_chunks: int):
    """Pack token fields into the two-plane chunked layout (numpy).

    Returns (tok_a, tok_b) of shape (n_chunks, 8, 128) i32 with slot 0 of
    each chunk holding the live count.
    """
    n = len(dst)
    per = TOKENS_PER_CHUNK - 1
    cap = n_chunks * per
    if n > cap:
        raise ValueError(f"{n} tokens exceed capacity {cap}")
    a = (dst.astype(np.int64) | (ln.astype(np.int64) << _LEN_SHIFT)
         | (lit.astype(np.int64) << _LIT_SHIFT)).astype(np.int32)
    tok_a = np.zeros((n_chunks, TOKENS_PER_CHUNK), dtype=np.int32)
    tok_b = np.zeros((n_chunks, TOKENS_PER_CHUNK), dtype=np.int32)
    for c in range(n_chunks):
        lo = c * per
        k = min(per, max(0, n - lo))
        tok_a[c, 0] = k
        if k:
            tok_a[c, 1:1 + k] = a[lo:lo + k]
            tok_b[c, 1:1 + k] = src[lo:lo + k]
    shape = (n_chunks, _SLOT_ROWS, LANES)
    return tok_a.reshape(shape), tok_b.reshape(shape)


def n_chunks_for_tokens(n_tokens: int) -> int:
    return max(1, -(-n_tokens // (TOKENS_PER_CHUNK - 1)))


def words_to_bytes(words, size: int) -> bytes:
    return np.asarray(words).reshape(-1).view("<u1")[:size].tobytes()
