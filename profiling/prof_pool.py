"""Microbench: 2x2 pooling strategies at full res (1088x1920x3)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

K = 16
FENCE = 0.0


def t_ms(fn, *args, k=K, n=3, name=""):
    def chained(args):
        def body(i, carry):
            args, acc = carry
            out = fn(*args)
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32)
            newargs = tuple(a + s * 1e-20 for a in args)
            return newargs, acc + s
        _, acc = jax.lax.fori_loop(0, k, body, (args, jnp.float32(0.0)))
        return acc
    cf = jax.jit(chained)
    float(cf(args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(cf(args)); ts.append(time.perf_counter() - t0)
    print(f"{name:46s} {(float(np.median(ts)) * 1000 - FENCE) / k:8.2f} ms/it", flush=True)


def main():
    global FENCE
    f = jax.jit(lambda x: x + 1.0); x0 = jnp.float32(0.0); float(f(x0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(f(x0)); ts.append(time.perf_counter() - t0)
    FENCE = float(np.median(ts)) * 1000
    print(f"fence {FENCE:.1f}")

    H, W, C = 1088, 1920, 3
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W, C), jnp.float32)

    def pool_reshape(x):
        return x.reshape(H // 2, 2, W // 2, 2, C).mean((1, 3))

    def pool_strided(x):
        return (x[::2, ::2] + x[1::2, ::2] + x[::2, 1::2] + x[1::2, 1::2]) * 0.25

    def pool_reduce_window(x):
        return lax.reduce_window(x, 0.0, lax.add, (2, 2, 1), (2, 2, 1),
                                 "VALID") * 0.25

    WP = (np.zeros((W, W // 2), np.float32))
    WP[np.arange(W), np.arange(W) // 2] = 0.5
    WPj = jnp.asarray(WP)

    def pool_matmul(x):
        # H-pool via reshape (sublane, cheap), W-pool via MXU matmul
        xh = x.reshape(H // 2, 2, W, C).mean(1)            # (H/2, W, C)
        return jnp.einsum("hwc,wv->hvc", xh, WPj)

    WPb = WPj.astype(jnp.bfloat16)

    def pool_matmul_bf16(x):
        xh = x.reshape(H // 2, 2, W, C).mean(1)
        return lax.dot_general(xh.astype(jnp.bfloat16), WPb,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32).transpose(0, 2, 1)

    def pool_hreshape_only(x):
        return x.reshape(H // 2, 2, W, C).mean(1)

    def pool_wreshape_only(x):
        return x.reshape(H, W // 2, 2, C).mean(2)

    t_ms(pool_reshape, img, name="pool reshape both axes")
    t_ms(pool_strided, img, name="pool strided slices")
    t_ms(pool_reduce_window, img, name="pool reduce_window")
    t_ms(pool_matmul, img, name="pool H-reshape + W-matmul f32")
    t_ms(pool_matmul_bf16, img, name="pool H-reshape + W-matmul bf16")
    t_ms(pool_hreshape_only, img, name="  H-axis reshape-mean only")
    t_ms(pool_wreshape_only, img, name="  W-axis reshape-mean only")

    img1 = img[..., 0]
    t_ms(lambda x: x.reshape(H // 2, 2, W // 2, 2).mean((1, 3)), img1,
         name="pool reshape 1ch")
    t_ms(lambda x: lax.reduce_window(x, 0.0, lax.add, (2, 2), (2, 2), "VALID"),
         img1, name="pool reduce_window 1ch")

    # roll/shift cost (for SSR direction bins + blurs)
    t_ms(lambda x: jnp.roll(x, 5, axis=1) + jnp.roll(x, -3, axis=0), img1,
         name="2 rolls 1ch full-res")


if __name__ == "__main__":
    main()
