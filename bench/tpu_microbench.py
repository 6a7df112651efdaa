"""TPU primitive microbenchmarks behind the kernel design decisions.

Run: python bench/tpu_microbench.py  (on a machine with a real TPU)

Measurement discipline (the whole point of this file): through remoted/
tunneled runtimes, `jax.block_until_ready` can acknowledge DISPATCH before
execution, so naive timing loops measure nothing (we observed "29 PFLOP/s
matmuls"). Two honest patterns:

  * forced sync — fetch a few result bytes per repetition
    (`np.asarray(jax.device_get(jnp.reshape(r, (-1,))[:1]))`), then
    subtract the measured round-trip floor; noisy when RTT is tens of ms.
  * batch slope — time k=1 vs k=N repetitions chained by a REAL data
    dependency inside one jit (beware loop-invariant hoisting: make each
    iteration's input depend on the previous output, e.g. `x ^ (carry &
    1)`) and take the slope. RTT and fixed dispatch costs cancel.

Run on an otherwise idle host: dispatch goes through host CPU, so a busy
host inflates or even inverts small slopes.

Findings on TPU v5e that shaped this framework (see BASELINE.md):
elementwise gather/scatter ~0.14 Gelem/s regardless of pattern/dtype;
stable multi-operand sort ~6 ms / 4M; Pallas dynamic VMEM row slice ~9
cyc, masked row RMW ~9.5 cyc, elementwise (8,128) ops ~1-5 cyc, ANY lane
permutation (dynamic gather / dynamic roll / static roll) ~75-85 cyc
crossbar latency that pipelines across loop iterations.
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

CLOCK_HZ = 0.94e9  # v5e


def _force(r):
    np.asarray(jax.device_get(jnp.reshape(r, (-1,))[:1]))


def sync_time(f, *a, reps=3):
    _force(f(*a))
    t0 = time.perf_counter()
    for _ in range(reps):
        _force(f(*a))
    return (time.perf_counter() - t0) / reps


def slope_cycles(mk, n1=100_000, n2=2_000_000, reps=3):
    """Per-iteration cycles of a kernel factory mk(n_iters) -> callable."""
    f1, f2 = mk(n1), mk(n2)
    t1, t2 = sync_time(f1, reps=reps), sync_time(f2, reps=reps)
    return (t2 - t1) / (n2 - n1) * CLOCK_HZ


def slope_seconds(mk, n1=1, n2=9, reps=3):
    """Per-application seconds of op factory mk(k) -> callable (slope)."""
    t1 = sync_time(mk(n1), reps=reps)
    t2 = sync_time(mk(n2), reps=reps)
    return (t2 - t1) / (n2 - n1)


def xla_ops():
    """XLA bulk-op costs, slope-measured with real data dependencies
    between repetitions (x ^ (carry & 1) defeats loop-invariant hoisting)."""
    rng = np.random.default_rng(0)
    n = 1 << 22
    idx = jax.device_put(jnp.asarray(rng.integers(0, n, n, np.int64)
                                     .astype(np.int32)))
    rtt = sync_time(jax.jit(lambda x: x + 1), jax.device_put(jnp.float32(1)))
    print(f"sync round-trip floor: {rtt*1e3:.1f} ms (for context only)")

    def chain(op):
        def mk(k):
            @jax.jit
            def f(x):
                return jax.lax.fori_loop(
                    0, k, lambda _, c: op(x ^ (c & 1)), jnp.zeros_like(x))
            return functools.partial(f, idx)
        return mk

    dt = slope_seconds(chain(lambda x: jnp.take(x, x, mode="clip")))
    print(f"4M elementwise gather: {dt*1e3:.1f} ms "
          f"({n/max(dt,1e-9)/1e9:.2f} Gelem/s)")
    dt = slope_seconds(chain(lambda x: jax.lax.sort(
        (x, x, x), dimension=0, is_stable=True, num_keys=1)[1]))
    print(f"4M 3-operand stable sort: {dt*1e3:.1f} ms")
    dt = slope_seconds(chain(lambda x: jax.lax.cummax(x, axis=0)))
    print(f"4M cummax: {dt*1e3:.1f} ms")


def pallas_ops():
    rng = np.random.default_rng(0)
    idx = jax.device_put(jnp.asarray(
        rng.integers(0, 8000, (8, 1024), np.int64).astype(np.int32)))
    buf = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 20, (8192, 128), np.int64).astype(np.int32)))

    def call(k, out_shape, *refs):
        return pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(refs) - 1),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape)(*refs)

    def mk_dynslice(nit):
        def k(idx_ref, buf_ref, out_ref):
            def body(t, acc):
                r = idx_ref[0, t & 1023]
                w = buf_ref[pl.ds(r, 2), :]
                return acc + w[0:1, :] + w[1:2, :]
            out_ref[0:1, :] = jax.lax.fori_loop(
                0, nit, body, jnp.zeros((1, 128), jnp.int32))
        f = jax.jit(lambda i, b: call(
            k, jax.ShapeDtypeStruct((1, 128), jnp.int32), i, b))
        return functools.partial(f, idx, buf)

    print(f"dyn 2-row VMEM slice + adds: {slope_cycles(mk_dynslice):.1f} "
          "cyc/iter")

    def mk_gather(nit):
        def k(idx_ref, out_ref):
            lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

            def body(t, acc):
                r = idx_ref[0, t & 1023]
                return jnp.take_along_axis(acc, (lane8 + r) & 127, axis=1) + 1
            out_ref[:, :] = jax.lax.fori_loop(
                0, nit, body, jnp.zeros((8, 128), jnp.int32))
        f = jax.jit(lambda i: call(
            k, jax.ShapeDtypeStruct((8, 128), jnp.int32), i))
        return functools.partial(f, idx)

    print("(8,128) lane crossbar (dependent chain): "
          f"{slope_cycles(mk_gather):.1f} cyc/iter")


if __name__ == "__main__":
    print("devices:", jax.devices())
    xla_ops()
    pallas_ops()
