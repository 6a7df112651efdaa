"""Pallas TPU kernel: token-driven block reconstruction (decode phase B).

Decode is split TPU-first into two phases (SURVEY.md §7.2):
  A. token parse — a byte-granular serial scan (3-30x cheaper than the byte
     moving itself). Produced by the native tokenizer (csrc tsq_tokenize_block)
     for arbitrary .tsq streams, or emitted directly by our encoder.
  B. reconstruction — ALL the byte movement: literal copies from the payload
     and match copies from the decoded output. This kernel runs phase B
     entirely on-chip, batched over independent blocks (the data-parallel
     axis that shards across the mesh, parallel/pipeline.py).

Design notes (hardware-measured on TPU v5e with forced-sync timing —
per-op costs: dynamic VMEM row slice ~9 cyc, masked row RMW ~9.5 cyc,
elementwise (8,128) ops ~1-5 cyc, but ANY lane permutation — dynamic
gather, dynamic roll, even static roll — rides the ~75-85 cyc lane
crossbar. The kernel therefore spends exactly ONE crossbar op per token
PAIR and avoids rolls entirely):

  * One unified VMEM scratch holds [payload rows | output rows] as
    little-endian i32 words in (rows, 128) tiles (512 B per row). Literal
    sources index the payload region, match sources the output region, so
    source reads need no branch; the block's payload is DMA'd in from HBM
    at the first grid step and the decoded output DMA'd back at the last
    (keeping per-step VMEM at one resident copy — no pipeline
    double-buffering blowup, so full-size multi-block batches fit).
  * Tokens are processed in format PAIRS (two symbols sharing a rep
    anchor). The format guarantees every match source ends strictly before
    its pair anchor (= the pair's first dst, tsq_encode.cpp:293), so the
    two tokens of a pair are read-independent and their byte-masked writes
    are disjoint: one fused read->align->mask->RMW pass handles both.
  * Per pair, ONE (8,128) dynamic_gather performs all eight needed lane
    rotations at once: for each token, its 2-row source window rotated by
    the source/dest lane delta C and by C+1 (the +1-word view that feeds
    the cross-word byte shift) — 8 independent 128-lane permutations in a
    single crossbar pass. Window-crossing is resolved by mod-256 selects;
    byte alignment by elementwise dual shifts (cheap); destination-row
    placement by per-byte masks; the pair lands with three row RMWs.

Token streams arrive packed two-words-per-token in SMEM chunks:
  word A = unified_dst | len << 24          word B = unified_src
Slot 0 of each chunk holds the live-token count; tokens occupy slots
1..count with an EVEN per-chunk capacity so chunk boundaries never split
a format pair.
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
TOKENS_PER_CHUNK = 1024                     # slot 0 = count; 1022 tokens
_TOKENS_CAP = TOKENS_PER_CHUNK - 2          # even: pairs never split chunks
_SLOT_ROWS = TOKENS_PER_CHUNK // LANES

_DST_MASK = (1 << 24) - 1
_LEN_SHIFT = 24
_LEN_MASK = (1 << 7) - 1


class _PairConsts:
    """Iota tiles shared by every pair-reconstruction call."""

    def __init__(self):
        self.lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
        self.row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        self.half8 = (self.row8 >> 1) & 1   # +1-view rows within each token
        self.tok_hi = self.row8 >= 4        # token-2 rows of the gather tile
        self.byte_hi = self.row8[0:4, :] >= 2  # token-2 value-stack rows


def _reconstruct_pair(u_ref, u_rows, cs, dst1, ln1, s1, dst2, ln2, s2):
    """All byte movement for one format pair: scalar (dst, ln, src) fields
    (unified byte coordinates) in, three masked row RMWs out. One crossbar
    pass per call. Shared by the token-chunk kernel and the fused
    stream-parsing kernel."""
    lane8, row8 = cs.lane8, cs.row8
    half8, tok_hi, byte_hi = cs.half8, cs.tok_hi, cs.byte_hi

    def fields(dst, s):
        delta = s - dst
        omega8 = (delta & 3) * 8            # byte phase within the word
        src_row = jnp.clip(s >> 9, 0, u_rows - 2)
        # lane delta C: dest lane q reads window lane q + C (mod 256)
        cc = (dst >> 9) * LANES + (delta >> 2) - src_row * LANES
        return omega8, src_row, cc

    om1, srow1, c1 = fields(dst1, s1)
    om2, srow2, c2 = fields(dst2, s2)

    win1 = u_ref[pl.ds(srow1, 2), :]
    win2 = u_ref[pl.ds(srow2, 2), :]
    # rows: lo1 hi1 lo1 hi1 lo2 hi2 lo2 hi2
    stack = jnp.concatenate([win1, win1, win2, win2], axis=0)

    # one crossbar pass: rotations by C and C+1 for both tokens
    cvec = jnp.where(tok_hi, c2, c1) + half8
    shifted = lane8 + cvec
    g = jnp.take_along_axis(stack, shifted & (LANES - 1), axis=1)
    wsel = (shifted & 255) < LANES      # window lane < 128 -> lo row

    # images: A = dest row r_i, B = dest row r_i + 1 (window lane +128)
    def images(lo, hi, w):
        return jnp.where(w, lo, hi), jnp.where(w, hi, lo)

    a1im, b1im = images(g[0:1], g[1:2], wsel[0:1])
    a1p, b1p = images(g[2:3], g[3:4], wsel[2:3])
    a2im, b2im = images(g[4:5], g[5:6], wsel[4:5])
    a2p, b2p = images(g[6:7], g[7:8], wsel[6:7])

    # byte-align across word boundaries: elementwise dual shift (cheap)
    ab = jnp.concatenate([a1im, b1im, a2im, b2im], axis=0)
    abp = jnp.concatenate([a1p, b1p, a2p, b2p], axis=0)
    om = jnp.where(byte_hi, om2, om1)
    val4 = jnp.where(
        om == 0, ab,
        jax.lax.shift_right_logical(ab, om)
        | jax.lax.shift_left(abp, 32 - jnp.maximum(om, 8)))

    # destination rows r1..r1+2 cover both tokens (dst2 = dst1 + ln1):
    # the mask tile's rows are (X, token) combos — rows 0-2 pair token 1
    # with X = r1..r1+2, rows 3-5 token 2, rows 6-7 dead (ln forced 0).
    r1 = jnp.clip(dst1 >> 9, 0, u_rows - 3)
    m_hi = jnp.logical_and(row8 >= 3, row8 < 6)
    rvec = jnp.where(m_hi, dst2 >> 9, dst1 >> 9)
    xvec = jnp.where(row8 < 6, r1 + row8 % 3, -1)
    dstv = jnp.where(m_hi, dst2, dst1)
    lnv = jnp.where(row8 < 6, jnp.where(m_hi, ln2, ln1), 0)

    # value for (row X, token i): aligned image A if X == r_i else B;
    # the byte masks below zero every non-overlapping combination.
    va = jnp.concatenate([val4[0:1], val4[0:1], val4[0:1],
                          val4[2:3], val4[2:3], val4[2:3],
                          val4[0:1], val4[0:1]], axis=0)
    vb = jnp.concatenate([val4[1:2], val4[1:2], val4[1:2],
                          val4[3:4], val4[3:4], val4[3:4],
                          val4[1:2], val4[1:2]], axis=0)
    val8 = jnp.where(xvec == rvec, va, vb)

    # per-byte masks: global byte positions [dst, dst+ln) within row X
    base = xvec * ROW_BYTES + lane8 * 4
    m8 = jnp.zeros((8, LANES), jnp.int32)
    for kk in range(4):
        pos = base + kk
        inside = jnp.logical_and(pos >= dstv, pos < dstv + lnv)
        m8 = m8 | jnp.where(inside, jnp.int32(0xFF) << (8 * kk), 0)

    tt = val8 & m8
    vrows = tt[0:3, :] | tt[3:6, :]
    mrows = m8[0:3, :] | m8[3:6, :]
    # All three rows are written unconditionally: predicating the third
    # (only needed when the pair straddles a row boundary) measured no
    # faster within run-to-run variance — the RMWs overlap the crossbar
    # pass in the pipelined pair loop, so they are not the bottleneck.
    for j in range(3):
        cur = u_ref[pl.ds(r1 + j, 1), :]
        u_ref[pl.ds(r1 + j, 1), :] = (
            (cur & ~mrows[j:j + 1, :]) | vrows[j:j + 1, :])


def _decode_pairs_kernel(tok_a_ref, tok_b_ref, payload_hbm, out_hbm,
                         u_ref, sem_in, sem_out, *, pay_rows, out_rows):
    """Execute one chunk of token pairs against the unified block buffer."""
    b = pl.program_id(0)
    c = pl.program_id(1)
    n_chunks = pl.num_programs(1)
    u_rows = pay_rows + out_rows

    @pl.when(c == 0)
    def _():
        din = pltpu.make_async_copy(
            payload_hbm.at[b], u_ref.at[pl.ds(0, pay_rows)], sem_in)
        din.start()
        din.wait()

    n = tok_a_ref[0, 0, 0, 0]
    cs = _PairConsts()

    def pair(k, _):
        t = 1 + 2 * k
        a1 = tok_a_ref[0, 0, t >> 7, t & 127]
        s1 = tok_b_ref[0, 0, t >> 7, t & 127]
        t2 = t + 1
        live2 = t2 <= n
        a2 = jnp.where(live2, tok_a_ref[0, 0, t2 >> 7, t2 & 127], 0)
        s2 = jnp.where(live2, tok_b_ref[0, 0, t2 >> 7, t2 & 127], 0)
        _reconstruct_pair(u_ref, u_rows, cs,
                          a1 & _DST_MASK, (a1 >> _LEN_SHIFT) & _LEN_MASK, s1,
                          a2 & _DST_MASK, (a2 >> _LEN_SHIFT) & _LEN_MASK, s2)
        return 0

    jax.lax.fori_loop(0, (n + 1) >> 1, pair, 0, unroll=False)

    @pl.when(c == n_chunks - 1)
    def _():
        dout = pltpu.make_async_copy(
            u_ref.at[pl.ds(pay_rows, out_rows)], out_hbm.at[b], sem_out)
        dout.start()
        dout.wait()


@functools.partial(jax.jit, static_argnames=("interpret", "out_rows"))
def decode_tokens_batch(payload_words, tok_a, tok_b, *, interpret=False,
                        out_rows: int = OUT_ROWS):
    """Reconstruct a batch of blocks from payload words and token chunks.

    payload_words: (B, pay_rows, 128) i32 — per-block compressed payloads.
    tok_a, tok_b:  (B, n_chunks, 8, 128) i32 packed token chunks (pack_tokens
    MUST have been called with the same pay_rows).
    Returns (B, out_rows, 128) i32 decoded words (bytes beyond each block's
    true size are unspecified; callers slice).

    The batch axis is the data-parallel axis: shard it over the mesh
    (parallel/pipeline.py wraps this in shard_map). Row counts default to
    full 4 MiB blocks; smaller values serve fast compile checks and tests.
    Payload and output live in HBM; only the one unified scratch occupies
    VMEM, so multi-block batches compile within the 16 MiB budget.
    """
    B, n_chunks = tok_a.shape[0], tok_a.shape[1]
    pay_rows = payload_words.shape[1]
    tok_spec = pl.BlockSpec((1, 1, _SLOT_ROWS, LANES),
                            lambda b, c: (b, c, 0, 0),
                            memory_space=pltpu.SMEM)
    kernel = functools.partial(_decode_pairs_kernel, pay_rows=pay_rows,
                               out_rows=out_rows)
    return pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[
            tok_spec, tok_spec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((pay_rows + out_rows, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(tok_a, tok_b, payload_words)


# --- host-side glue ----------------------------------------------------------

def pack_payload_words(payload: bytes, pay_rows: int = PAY_ROWS) -> np.ndarray:
    buf = np.zeros(pay_rows * ROW_BYTES, dtype=np.uint8)
    buf[:len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    return buf.view("<i4").reshape(pay_rows, LANES)


def pack_tokens(dst, src, ln, lit, n_chunks: int,
                pay_rows: int = PAY_ROWS):
    """Pack token fields into the two-plane chunked layout (numpy).

    Positions are translated into the kernel's unified byte space: the
    payload occupies [0, pay_rows*512) and the decoded output follows, so
    literal sources stay payload-relative while match sources and all
    destinations shift up by the payload extent. Returns (tok_a, tok_b) of
    shape (n_chunks, 8, 128) i32 with slot 0 of each chunk holding the live
    count; per-chunk capacity is even so format pairs never straddle chunks.
    """
    n = len(dst)
    cap = n_chunks * _TOKENS_CAP
    if n > cap:
        raise ValueError(f"{n} tokens exceed capacity {cap}")
    pay_bytes = pay_rows * ROW_BYTES
    dst = np.asarray(dst, np.int64) + pay_bytes
    lit64 = np.asarray(lit, np.int64)
    src = np.asarray(src, np.int64) + np.where(lit64 == 1, 0, pay_bytes)
    a = (dst | (np.asarray(ln, np.int64) << _LEN_SHIFT)).astype(np.int32)
    src = src.astype(np.int32)
    tok_a = np.zeros((n_chunks, TOKENS_PER_CHUNK), dtype=np.int32)
    tok_b = np.zeros((n_chunks, TOKENS_PER_CHUNK), dtype=np.int32)
    for c in range(n_chunks):
        lo = c * _TOKENS_CAP
        k = min(_TOKENS_CAP, max(0, n - lo))
        tok_a[c, 0] = k
        if k:
            tok_a[c, 1:1 + k] = a[lo:lo + k]
            tok_b[c, 1:1 + k] = src[lo:lo + k]
    shape = (n_chunks, _SLOT_ROWS, LANES)
    return tok_a.reshape(shape), tok_b.reshape(shape)


def n_chunks_for_tokens(n_tokens: int) -> int:
    return max(1, -(-n_tokens // _TOKENS_CAP))


def words_to_bytes(words, size: int) -> bytes:
    return np.asarray(words).reshape(-1).view("<u1")[:size].tobytes()
