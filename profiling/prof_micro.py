"""Microbench: bloom stages + gather cost across table shapes."""
import time
import numpy as np
import jax
import jax.numpy as jnp

K = 16


def t_ms(fn, *args, k=K, n=3, name=""):
    def chained(args):
        def body(i, carry):
            args, acc = carry
            out = fn(*args)
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32)
            newargs = jax.tree_util.tree_map(
                lambda a: (a + s.astype(a.dtype) * 0 if jnp.issubdtype(a.dtype, jnp.integer)
                           else a + s * 1e-20), args)
            return newargs, acc + s
        _, acc = jax.lax.fori_loop(0, k, body, (args, jnp.float32(0.0)))
        return acc
    cf = jax.jit(chained)
    float(cf(args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(cf(args))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"{name:44s} {(t * 1000 - FENCE) / k:8.2f} ms/it", flush=True)


def fence():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(f(x)); ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000


FENCE = 0.0

def main():
    global FENCE
    FENCE = fence()
    print(f"fence {FENCE:.1f} ms")

    H, W = 1088, 1920
    key = jax.random.PRNGKey(0)
    hdr = jax.random.uniform(key, (H, W, 3), jnp.float32) * 20.0

    from datum_tpu.ops.blur import (downsample2, gaussian_blur,
                                    resize_up_dense, upsample2_dense)
    from datum_tpu.ops.bloom import bloom
    from datum_tpu.ops.composite import tonemap

    t_ms(lambda x: bloom(x, 1.0), hdr, name="bloom full")
    t_ms(lambda x: downsample2(downsample2(x)), hdr, name="  downsample2 x2 (full->quarter)")
    q = downsample2(downsample2(hdr))
    t_ms(lambda x: gaussian_blur(x, 4.0), q, name="  gaussian_blur quarter")
    t_ms(lambda x: resize_up_dense(x, H, W), q, name="  resize_up_dense quarter->full x3ch")
    t_ms(lambda x: upsample2_dense(x), q, name="  upsample2_dense quarter x3ch")

    # ---- gathers
    P = H * W
    idx = jax.random.randint(key, (P,), 0, 65536, jnp.int32)
    for rows, width in [(65536, 4), (65536, 16), (65536, 48), (1536, 4), (256, 4)]:
        tab = jax.random.uniform(key, (rows, width), jnp.float32)
        ii = jnp.clip(idx, 0, rows - 1)
        t_ms(lambda t_, i_: t_[i_], tab, ii,
             name=f"gather 2M from ({rows},{width}) f32")
    tab8 = (jax.random.uniform(key, (65536, 4)) * 255).astype(jnp.uint8)
    t_ms(lambda t_, i_: t_[i_], tab8, idx, name="gather 2M from (65536,4) u8")
    idx_h = idx[:P // 4]
    tab = jax.random.uniform(key, (65536, 48), jnp.float32)
    t_ms(lambda t_, i_: t_[i_], tab, idx_h, name="gather 0.5M from (65536,48) f32")
    # 2D image gather (H,W) style
    img = jax.random.uniform(key, (1024, 1024), jnp.float32)
    iy = jax.random.randint(key, (H, W), 0, 1024)
    ix = jax.random.randint(jax.random.PRNGKey(1), (H, W), 0, 1024)
    t_ms(lambda im, y, x: im[y, x], img, iy, ix, name="gather 2M 2d-index (1024,1024)")

    # one-hot matmul "gather": (P,) indices into (R, C) table via matmul
    R, C = 1536, 4
    tab = jax.random.uniform(key, (R, C), jnp.bfloat16)
    idxs = jax.random.randint(key, (P,), 0, R, jnp.int32)
    def onehot_gather(tab, idxs):
        oh = (idxs[:, None] == jnp.arange(R, dtype=jnp.int32)[None, :])
        return jnp.dot(oh.astype(jnp.bfloat16), tab,
                       preferred_element_type=jnp.float32)
    t_ms(onehot_gather, tab, idxs, name=f"onehot-matmul 2M from ({R},{C}) bf16")


if __name__ == "__main__":
    main()
