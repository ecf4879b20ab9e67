"""Sort micro-bench: stable vs unstable, sizes, dtypes."""
import time, numpy as np, jax, jax.numpy as jnp

def timeit(fn, *args, n=6, name=""):
    sfn = jax.jit(lambda *a: fn(*a).ravel()[:1].astype(jnp.float32).sum())
    float(sfn(*args))
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); float(sfn(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name:40s} {np.median(ts)*1000:8.2f} ms", flush=True)

rng = np.random.RandomState(0)
for n in (524288,):
    x = jnp.asarray(rng.randint(0, 1 << 30, n).astype(np.int32))
    timeit(lambda v: jnp.sort(v), x, name=f"jnp.sort int32 {n}")
    timeit(lambda v: jax.lax.sort(v, is_stable=False), x, name=f"lax.sort unstable {n}")
    xf = x.astype(jnp.float32)
    timeit(lambda v: jax.lax.sort(v, is_stable=False), xf, name=f"lax.sort unstable f32 {n}")
    timeit(lambda v: jnp.sort(v.reshape(4, -1), axis=1), x, name=f"4x batched sort {n}")
