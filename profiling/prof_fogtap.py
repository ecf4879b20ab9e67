"""Microbench the fog trilinear tap variants on the real TPU.

The round-3 z-pair packed-row gather measured 5.35 ms/frame in the
bench trace — far above the ~1.3 ms per-lookup bound for 130k row
gathers — suspected layout pathology: the channel-first transpose in
fog_planes propagates a {0,1} (channel-major) layout into the gather
output, turning each 32-float row write into 32 strided stores.

Run: python profiling/prof_fogtap.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, qtab, idx, fx, fy, fz, n=50):
    """Chain n calls inside ONE jit with a real data dependency (tunnel
    methodology: identical repeated dispatches are memoized and
    block_until_ready returns early — see PERF.md)."""
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def chain(qtab, idx, fx, fy, fz, s0):
        def body(i, s):
            out = fn(qtab, jnp.clip(idx + i, 0, qtab.shape[0] - 1),
                     fx, fy, fz)
            return s + jnp.mean(out)
        return jax.lax.fori_loop(0, n, body, s0)

    _ = float(chain(qtab, idx, fx, fy, fz, jnp.float32(0)))
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        _ = float(chain(qtab, idx, fx, fy, fz, jnp.float32(r)))
        ts.append((time.perf_counter() - t0) / n)
    return min(ts) * 1e3


def main():
    from datum_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    D, FH, FW = 64, 90, 160
    hq, wq = 272, 480
    key = jax.random.PRNGKey(0)
    qtab = jax.device_put(jax.random.uniform(key, (D * FH * FW, 32)))
    idx = jax.device_put(
        jax.random.randint(key, (hq, wq), 0, D * FH * FW, dtype=jnp.int32))
    fx = jax.device_put(jax.random.uniform(key, (1, wq, 1)))
    fy = jax.device_put(jax.random.uniform(key, (hq, 1, 1)))
    fz = jax.device_put(jax.random.uniform(key, (hq, wq, 1)))

    def bilerp(rows, fx, fy):
        t00, t01 = rows[..., 0:4], rows[..., 4:8]
        t10, t11 = rows[..., 8:12], rows[..., 12:16]
        top = t00 + (t01 - t00) * fx
        bot = t10 + (t11 - t10) * fx
        return top + (bot - top) * fy

    @jax.jit
    def v_current(qtab, idx, fx, fy, fz):
        rows = qtab[idx]                                 # (hq, wq, 32)
        a = bilerp(rows[..., :16], fx, fy)
        out = a + (bilerp(rows[..., 16:], fx, fy) - a) * fz
        return jnp.transpose(out, (2, 0, 1))             # channel-first

    @jax.jit
    def v_chlast(qtab, idx, fx, fy, fz):
        rows = qtab[idx]
        a = bilerp(rows[..., :16], fx, fy)
        return a + (bilerp(rows[..., 16:], fx, fy) - a) * fz

    @jax.jit
    def v_barrier(qtab, idx, fx, fy, fz):
        rows = qtab[idx]
        a = bilerp(rows[..., :16], fx, fy)
        out = a + (bilerp(rows[..., 16:], fx, fy) - a) * fz
        out = jax.lax.optimization_barrier(out)
        return jnp.transpose(out, (2, 0, 1))

    @jax.jit
    def v_two16(qtab, idx, fx, fy, fz):
        t = qtab.reshape(-1, 2, 16)
        r0 = t[:, 0][idx]
        r1 = t[:, 1][idx]
        a = bilerp(r0, fx, fy)
        out = a + (bilerp(r1, fx, fy) - a) * fz
        return jnp.transpose(out, (2, 0, 1))

    for name, fn in [("current(ch-first)", v_current),
                     ("ch-last", v_chlast),
                     ("barrier+transpose", v_barrier),
                     ("two-16-gathers", v_two16)]:
        ms = timeit(fn, qtab, idx, fx, fy, fz)
        print(f"{name:20s} {ms:7.3f} ms")


if __name__ == "__main__":
    main()
