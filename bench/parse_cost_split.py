"""Split the fused kernel's cost: parse-only variant vs full kernel."""
import functools
import sys
import time

sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parent.parent))
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from turbosqueeze_tpu.kernels.decode_tokens import LANES, ROW_BYTES, PAY_ROWS, OUT_ROWS
from turbosqueeze_tpu.kernels import decode_stream as DS
from turbosqueeze_tpu.kernels import decode_tokens as K
from turbosqueeze_tpu.runtime import native
from turbosqueeze_tpu.format import iter_container
from turbosqueeze_tpu.utils.corpus import synthetic_text

_WIN_ROWS = 4
_WIN_BYTES = _WIN_ROWS * ROW_BYTES
_GROUP_SLACK = 160


def _parse_only_kernel(meta_ref, payload_hbm, out_hbm, u_ref, pwin_ref,
                       sem_in, sem_out, sem_w, *, pay_rows, out_rows):
    b = pl.program_id(0)
    pay_bytes = pay_rows * ROW_BYTES
    ext = meta_ref[b, 0]
    size = meta_ref[b, 1]

    def win_copy(w):
        row0 = jnp.minimum(w * _WIN_ROWS, pay_rows - _WIN_ROWS)
        return pltpu.make_async_copy(
            payload_hbm.at[b, pl.ds(row0, _WIN_ROWS)],
            pwin_ref.at[w & 3], sem_w.at[w & 3])

    win_copy(0).start(); win_copy(1).start(); win_copy(2).start()
    win_copy(0).wait()

    def byte_at(i):
        slot = (i >> 11) & 3
        off = i & (_WIN_BYTES - 1)
        w = pwin_ref[slot, off >> 9, (off >> 2) & (LANES - 1)]
        return (w >> ((i & 3) * 8)) & 0xFF

    def cond(c):
        return c[1] < size

    def group(c):
        i, j, waited, acc = c
        hi_w = (i + _GROUP_SLACK - 1) >> 11

        def advance(st):
            i_, w_ = st
            win_copy(w_ + 1).wait()
            win_copy(w_ + 3).start()
            return i_, w_ + 1

        i, waited = jax.lax.cond(hi_w > waited, advance, lambda st: st,
                                 (i, waited))
        ctrl = byte_at(i); i += 1
        for pair_ix in range(4):
            size_byte = byte_at(i); i += 1
            anchor = j
            for half in range(2):
                nib = jnp.where(half == 0, size_byte >> 4, size_byte & 15)
                is_lit = (ctrl >> (7 - pair_ix * 2 - half)) & 1
                lit_sz = nib + 1
                mat_sz = jnp.where(jnp.logical_and(ext != 0, nib < 3),
                                   32 + 16 * nib, nib + 1)
                off2 = byte_at(i) | (byte_at(i + 1) << 8)
                src = jnp.where(is_lit == 1, i, pay_bytes + anchor - off2)
                sz = jnp.where(is_lit == 1, lit_sz, mat_sz)
                i = i + jnp.where(is_lit == 1, lit_sz, 2)
                acc = acc ^ (src + sz)   # keep the parse live
                j = j + sz
        return i, j, waited, acc

    _, _, waited, acc = jax.lax.while_loop(
        cond, group, (jnp.int32(3), jnp.int32(0), jnp.int32(0),
                      jnp.int32(0)))
    win_copy(waited + 1).wait()
    win_copy(waited + 2).wait()
    u_ref[0:1, :] = jnp.full((1, LANES), acc, jnp.int32)
    dout = pltpu.make_async_copy(u_ref.at[pl.ds(0, out_rows)],
                                 out_hbm.at[b], sem_out)
    dout.start(); dout.wait()


@functools.partial(jax.jit, static_argnames=("out_rows",))
def parse_only_batch(payload_words, meta, out_rows=OUT_ROWS):
    B, pay_rows = payload_words.shape[0], payload_words.shape[1]
    kernel = functools.partial(_parse_only_kernel, pay_rows=pay_rows,
                               out_rows=out_rows)
    return pl.pallas_call(
        kernel, grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((out_rows, LANES), jnp.int32),
                        pltpu.SMEM((4, _WIN_ROWS, LANES), jnp.int32),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA((4,))],
    )(meta, payload_words)


data = synthetic_text(4 << 22, seed=11)
stream = native.compress(data, True)
blocks = [(p, e) for _, p, e in iter_container(stream)]
sizes = [min(len(data) - (k << 22), 1 << 22) for k in range(4)]
ntok = sum(len(native.tokenize_block(p, e)[0]) for p, e in blocks)


def make(B):
    pw = np.zeros((B, PAY_ROWS, LANES), np.int32)
    exts, szs = [], []
    for b in range(B):
        p, e = blocks[b % 4]
        pw[b] = K.pack_payload_words(p)
        exts.append(e); szs.append(sizes[b % 4])
    return jax.device_put(pw), jax.device_put(DS.pack_meta(exts, szs))


def timed(fn, B, reps=3):
    pw, meta = make(B)
    r = fn(pw, meta); jax.block_until_ready(r)
    np.asarray(jax.device_get(jnp.reshape(r, (-1,))[:1]))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(pw, meta)
        np.asarray(jax.device_get(jnp.reshape(r, (-1,))[:1]))
    return (time.perf_counter() - t0) / reps


for name, fn in (("parse-only", parse_only_batch),
                 ("full fused", DS.decode_stream_batch)):
    t1, t4 = timed(fn, 1), timed(fn, 4)
    per = (t4 - t1) / 3
    print(f"{name}: {per*1e3:.1f} ms/block, "
          f"{per*0.94e9/(ntok/4):.1f} cyc/token")
