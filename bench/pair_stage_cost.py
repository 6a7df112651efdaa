"""Which part of _reconstruct_pair costs what: staged variants, K=8."""
import sys, time, os
sys.path.insert(0, str(__import__('pathlib').Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROW_BYTES = 512
CLOCK = 0.94e9

def mk(K, T, stage):
    rows = 64

    def kernel(x_ref, o_ref, *scr):
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
        row8 = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
        half8 = (row8 >> 1) & 1
        tok_hi = row8 >= 4
        byte_hi = row8[0:4, :] >= 2
        row8m3 = row8 % 3

        def pair(u, dst1, ln1, s1, dst2, ln2, s2):
            delta1, delta2 = s1 - dst1, s2 - dst2
            om1, om2 = (delta1 & 3) * 8, (delta2 & 3) * 8
            srow1, srow2 = s1 >> 9, s2 >> 9
            c1 = (dst1 >> 9) * LANES + (delta1 >> 2) - srow1 * LANES
            c2 = (dst2 >> 9) * LANES + (delta2 >> 2) - srow2 * LANES
            win1 = u[pl.ds(srow1 & 47, 2), :]
            win2 = u[pl.ds(srow2 & 47, 2), :]
            stack = jnp.concatenate([win1, win1, win2, win2], axis=0)
            cvec = jnp.where(tok_hi, c2, c1) + half8
            shifted = lane8 + cvec
            g = jnp.take_along_axis(stack, shifted & (LANES - 1), axis=1)
            if stage == "gather":
                return g[0:3] , g[0:3, :1].sum()
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
            if stage == "align":
                return val4[0:3], val4[0:1, :1].sum()
            r1 = dst1 >> 9
            m_hi = jnp.logical_and(row8 >= 3, row8 < 6)
            rvec = jnp.where(m_hi, dst2 >> 9, dst1 >> 9)
            xvec = jnp.where(row8 < 6, r1 + row8m3, -1)
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
            if stage == "mask":
                return vrows, mrows[0:1, :1].sum()
            r1c = r1 & 47
            for j in range(3):
                cur = u[pl.ds(r1c + j, 1), :]
                u[pl.ds(r1c + j, 1), :] = (
                    (cur & ~mrows[j:j + 1, :]) | vrows[j:j + 1, :])
            return vrows, vrows[0:1, :1].sum()

        def body(t, cs_):
            out = []
            for k in range(K):
                c = cs_[k]
                _, upd = pair(scr[k], c & 8191, 16, (c * 7) & 8191, (c & 8191) + 16,
                              12, (c * 13) & 8191)
                out.append((c + upd) & 16383)
            return tuple(out)

        cs_ = jax.lax.fori_loop(0, T, body,
                                tuple(jnp.int32(3 + k) for k in range(K)))
        acc = cs_[0]
        for k in range(1, K):
            acc = acc + cs_[k]
        o_ref[...] = x_ref[...] + acc

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.int32)
                        for _ in range(K)],
    )
    x = jnp.ones((8, LANES), jnp.int32)
    return lambda: f(x)

def _force(r):
    np.asarray(jax.device_get(jnp.reshape(r, (-1,))[:1]))

def sync_time(f, reps=3):
    _force(f())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(f())
        ts.append(time.perf_counter() - t0)
    return min(ts)

K = 8
n1, n2 = 100_000, 1_000_000
for stage in ("gather", "align", "mask", "full"):
    t1 = sync_time(mk(K, n1, stage))
    t2 = sync_time(mk(K, n2, stage))
    c = (t2 - t1) / (n2 - n1) * CLOCK
    print(f"stage {stage:7s}: {c:7.1f} cyc/iter = {c/K:6.1f} cyc/pair",
          flush=True)
