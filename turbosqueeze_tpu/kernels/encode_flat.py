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
(tsq_core.cpp:126-138): a partial final ctrl byte pads with 1-bits, a
half-filled size byte pads its low nibble with 0, and a reserved slot
that no group ever filled keeps the byte the last literal's 16-byte
over-copy deposited (or 0 above the high-water mark) — at most the two
trailing slots, reproduced here from the last literal symbol.

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

from .decode_tokens import LANES, ROW_BYTES
from .encode_bulk import OUT_ROWS_BULK
from .encode_emit import IN_ROWS, _lsr

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
    val_z = jnp.where(dead_z, dead_val(jnp.where(dead_z, pos_z, 0)
                                       .max(axis=1))[:, None], val_z)

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
