"""Microbench: batched half->full upsample of the 15 gplane stack.

Compares the roll+interleave dense chain (upsample2_batch — measured
3.3 ms/frame in the r3 bench trace: the lane interleave forces HBM
relayout copies) against MXU matmul resampling (resize_matmul batched),
in f32 and bf16.

Run: python profiling/prof_upsample.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def chain_time(fn, x, n=30):
    @functools.partial(jax.jit, static_argnames=())
    def chain(x, s0):
        def body(i, s):
            out = fn(x * (1.0 + 1e-12 * s))
            return s + jnp.mean(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, s0)

    _ = float(chain(x, jnp.float32(0)))
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        _ = float(chain(x, jnp.float32(r)))
        ts.append((time.perf_counter() - t0) / n)
    return min(ts) * 1e3


def main():
    from datum_tpu.utils import enable_compilation_cache
    from datum_tpu.ops.blur import upsample2_batch, _resample_matrix
    enable_compilation_cache()

    N, H2, W2 = 15, 544, 960
    key = jax.random.PRNGKey(0)
    x32 = jax.device_put(jax.random.uniform(key, (N, H2, W2), jnp.float32))
    x16 = jax.device_put(x32.astype(jnp.bfloat16))

    my = jnp.asarray(_resample_matrix(H2, H2 * 2).T)     # (H, H2)
    mx = jnp.asarray(_resample_matrix(W2, W2 * 2))       # (W2, W)

    def up_mm(x):
        m1 = my.astype(x.dtype)
        m2 = mx.astype(x.dtype)
        out = jnp.einsum("Oh,nhw->nOw", m1, x)
        return jnp.einsum("nOw,wW->nOW", out, m2)

    print(f"roll+interleave f32  {chain_time(upsample2_batch, x32):7.3f} ms")
    print(f"roll+interleave bf16 {chain_time(upsample2_batch, x16):7.3f} ms")
    print(f"matmul-resample f32  {chain_time(up_mm, x32):7.3f} ms")
    print(f"matmul-resample bf16 {chain_time(up_mm, x16):7.3f} ms")


if __name__ == "__main__":
    main()
