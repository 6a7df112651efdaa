"""Round-2 design microbenchmarks (run on the real TPU via axon).

Questions:
  Q1 dependent-gather latency vs tile height (8/16/32/64 rows)
  Q2 K independent gather chains -> pipelined throughput per gather
  Q3 pair-sim: gather + 3 row RMWs, K streams on SEPARATE scratch refs
     (provable independence) vs ONE shared scratch (current kernel)
  Q4 scalar SMEM chain: byte_at-style extract vs word-pair u16 extract
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLOCK_HZ = 0.94e9
LANES = 128


def _force(r):
    np.asarray(jax.device_get(jnp.reshape(r, (-1,))[:1]))


def sync_time(f, *a, reps=3):
    _force(f(*a))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(f(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def slope_cycles(mk, n1, n2, reps=3):
    f1, f2 = mk(n1), mk(n2)
    t1, t2 = sync_time(f1, reps=reps), sync_time(f2, reps=reps)
    return (t2 - t1) / (n2 - n1) * CLOCK_HZ


# --- Q1: dependent gather latency vs rows -----------------------------------

def q1(rows, T):
    def kernel(x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)

        def body(t, g):
            idx = (lane + t + (g & 1)) & (LANES - 1)
            return jnp.take_along_axis(g, idx, axis=1)

        o_ref[...] = jax.lax.fori_loop(0, T, body, x_ref[...])

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
    )
    x = jnp.ones((rows, LANES), jnp.int32)
    return lambda: f(x)


# --- Q2: K independent gather chains ----------------------------------------

def q2(K, T):
    def kernel(x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

        def body(t, gs):
            out = []
            for k in range(K):
                idx = (lane + t + k + (gs[k] & 1)) & (LANES - 1)
                out.append(jnp.take_along_axis(gs[k], idx, axis=1))
            return tuple(out)

        gs = jax.lax.fori_loop(
            0, T, body, tuple(x_ref[...] + k for k in range(K)))
        acc = gs[0]
        for k in range(1, K):
            acc = acc ^ gs[k]
        o_ref[...] = acc

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
    )
    x = jnp.ones((8, LANES), jnp.int32)
    return lambda: f(x)


# --- Q3: pair-sim (gather from window + 3 row RMWs), K streams --------------

def q3(K, T, shared):
    n_scr = 1 if shared else K
    rows = 64

    def kernel(x_ref, o_ref, *scr):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

        def body(t, carries):
            out = []
            for k in range(K):
                u = scr[0] if shared else scr[k]
                c = carries[k]
                srow = (c + t) & (rows - 8)
                win = u[pl.ds(srow, 2), :]
                stack = jnp.concatenate([win, win, win, win], axis=0)
                idx = (lane + c) & (LANES - 1)
                g = jnp.take_along_axis(stack, idx, axis=1)
                r1 = (c + 2 * t) & (rows - 4)
                for j in range(3):
                    cur = u[pl.ds(r1 + j, 1), :]
                    u[pl.ds(r1 + j, 1), :] = cur ^ g[j:j + 1, :]
                out.append((c + jnp.sum(g[0, :1])) & 63)
            return tuple(out)

        cs = jax.lax.fori_loop(
            0, T, body, tuple(jnp.int32(k) for k in range(K)))
        acc = cs[0]
        for k in range(1, K):
            acc = acc + cs[k]
        o_ref[...] = x_ref[...] + acc

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((rows, LANES), jnp.int32)
                        for _ in range(n_scr)],
    )
    x = jnp.ones((8, LANES), jnp.int32)
    return lambda: f(x)


# --- Q4: scalar SMEM chains --------------------------------------------------

def q4_byte(T):
    """byte_at-style: slot/row/lane index math + byte extract, dependent."""
    def kernel(x_ref, o_ref, smem):
        def body(t, i):
            slot = (i >> 11) & 3
            off = i & 2047
            w = smem[slot, (off >> 9), (off >> 2) & (LANES - 1)]
            return i + 1 + ((w >> ((i & 3) * 8)) & 1)

        o_ref[...] = x_ref[...] + jax.lax.fori_loop(0, T, body, jnp.int32(3))

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((4, 4, LANES), jnp.int32)],
    )
    x = jnp.ones((8, LANES), jnp.int32)
    return lambda: f(x)


def q4_u16(T):
    """word-pair unaligned u16 extract, dependent chain."""
    def kernel(x_ref, o_ref, smem):
        def body(t, i):
            wi = i >> 2
            w0 = smem[(wi >> 7) & 15, wi & (LANES - 1)]
            w1 = smem[((wi + 1) >> 7) & 15, (wi + 1) & (LANES - 1)]
            sh = (i & 3) * 8
            v = ((w0 >> sh) | (w1 << (32 - jnp.maximum(sh, 8)))) & 0xFFFF
            return i + 2 + (v & 1)

        o_ref[...] = x_ref[...] + jax.lax.fori_loop(0, T, body, jnp.int32(3))

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((16, LANES), jnp.int32)],
    )
    x = jnp.ones((8, LANES), jnp.int32)
    return lambda: f(x)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    n1, n2 = 200_000, 2_000_000

    for rows in (8, 16, 32, 64):
        c = slope_cycles(lambda T: q1(rows, T), n1, n2)
        print(f"Q1 dep gather ({rows:2d},128): {c:7.1f} cyc/gather "
              f"({c / (rows / 8):5.1f} per 8 rows)", flush=True)

    for K in (1, 2, 4, 8):
        c = slope_cycles(lambda T: q2(K, T), n1, n2)
        print(f"Q2 {K} indep (8,128) chains: {c:7.1f} cyc/iter "
              f"= {c / K:5.1f} per gather", flush=True)

    for shared in (True, False):
        for K in (1, 2, 4):
            c = slope_cycles(lambda T: q3(K, T, shared), n1, n2 // 2)
            tag = "shared" if shared else "sep   "
            print(f"Q3 pair-sim {tag} K={K}: {c:7.1f} cyc/iter "
                  f"= {c / K:5.1f} per pair", flush=True)

    c = slope_cycles(q4_byte, n1, n2)
    print(f"Q4 byte_at chain: {c:5.1f} cyc/byte", flush=True)
    c = slope_cycles(q4_u16, n1, n2)
    print(f"Q4 u16 word-pair chain: {c:5.1f} cyc/u16", flush=True)


if __name__ == "__main__":
    main()


# --- Q5: K independent scalar byte chains -----------------------------------

def q5(K, T):
    def kernel(x_ref, o_ref, smem):
        def body(t, ii):
            out = []
            for k in range(K):
                i = ii[k]
                slot = (i >> 11) & 3
                off = i & 2047
                w = smem[slot, (off >> 9), (off >> 2) & (LANES - 1)]
                out.append(i + 1 + ((w >> ((i & 3) * 8)) & 1))
            return tuple(out)

        ii = jax.lax.fori_loop(0, T, body,
                               tuple(jnp.int32(3 + k) for k in range(K)))
        acc = ii[0]
        for k in range(1, K):
            acc = acc + ii[k]
        o_ref[...] = x_ref[...] + acc

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((4, 4, LANES), jnp.int32)],
    )
    x = jnp.ones((8, LANES), jnp.int32)
    return lambda: f(x)


# --- Q6: K streams of (scalar parse-sim + vector pair on own scratch) -------

def q6(K, T, with_vec=True, with_scalar=True):
    rows = 64

    def kernel(x_ref, o_ref, smem, *scr):
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)

        def parse_sim(i):
            # ~2 dependent SMEM reads + ~12 alu: one symbol's parse work
            slot = (i >> 11) & 3
            off = i & 2047
            w = smem[slot, (off >> 9), (off >> 2) & (LANES - 1)]
            nib = (w >> ((i & 3) * 8)) & 15
            lit = (w >> 7) & 1
            sz = jnp.where(lit == 1, nib + 1, 18 - nib)
            w2 = smem[slot, ((off + 64) >> 9), (((off + 64) >> 2)
                                               & (LANES - 1))]
            src = jnp.where(lit == 1, i, i - (w2 & 0xFFFF))
            i2 = i + 1 + (sz & 3)
            return i2, sz, src

        def body(t, carries):
            out = []
            for k in range(K):
                u = scr[k % len(scr)]
                i = carries[k]
                if with_scalar:
                    i2, sz, src = parse_sim(i)
                else:
                    i2, sz, src = i + 1, i & 63, i & 31
                if with_vec:
                    srow = src & (rows - 8)
                    win = u[pl.ds(srow, 2), :]
                    stack = jnp.concatenate([win, win, win, win], axis=0)
                    idx = (lane + sz) & (LANES - 1)
                    g = jnp.take_along_axis(stack, idx, axis=1)
                    r1 = (i + 2 * t) & (rows - 4)
                    for j in range(3):
                        cur = u[pl.ds(r1 + j, 1), :]
                        u[pl.ds(r1 + j, 1), :] = cur ^ g[j:j + 1, :]
                out.append(i2 & 8191)
            return tuple(out)

        cs = jax.lax.fori_loop(
            0, T, body, tuple(jnp.int32(3 + k) for k in range(K)))
        acc = cs[0]
        for k in range(1, K):
            acc = acc + cs[k]
        o_ref[...] = x_ref[...] + acc

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((4, 4, LANES), jnp.int32)] +
                       [pltpu.VMEM((rows, LANES), jnp.int32)
                        for _ in range(K)],
    )
    x = jnp.ones((8, LANES), jnp.int32)
    return lambda: f(x)


def main2():
    print("platform:", jax.devices()[0].platform, flush=True)
    n1, n2 = 200_000, 2_000_000
    for K in (1, 2, 4, 8):
        c = slope_cycles(lambda T: q5(K, T), n1, n2)
        print(f"Q5 {K} indep scalar byte chains: {c:7.1f} cyc/iter "
              f"= {c / K:5.1f} per byte", flush=True)
    for K in (1, 2, 4, 8):
        c = slope_cycles(lambda T: q6(K, T, True, False), n1, n2 // 2)
        print(f"Q6 {K} vec-only streams: {c:7.1f} cyc/iter "
              f"= {c / K:5.1f} per sym", flush=True)
    for K in (1, 2, 4, 8):
        c = slope_cycles(lambda T: q6(K, T, False, True), n1, n2 // 2)
        print(f"Q6 {K} scalar-only streams: {c:7.1f} cyc/iter "
              f"= {c / K:5.1f} per sym", flush=True)
    for K in (1, 2, 4, 8):
        c = slope_cycles(lambda T: q6(K, T, True, True), n1, n2 // 2)
        print(f"Q6 {K} fused streams: {c:7.1f} cyc/iter "
              f"= {c / K:5.1f} per sym", flush=True)
