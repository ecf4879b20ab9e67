"""Split shade_deferred: env IBL block vs ESM-fast factor vs rest."""
import time, numpy as np, jax, jax.numpy as jnp

def timeit(fn, *args, n=4, name=""):
    sfn = jax.jit(lambda *a: jax.tree_util.tree_leaves(fn(*a))[0].ravel()[:1].astype(jnp.float32).sum())
    float(sfn(*args))
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); float(sfn(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name:40s} {np.median(ts)*1000:8.2f} ms", flush=True)

from datum_tpu.scenes import datumtest_scene
from datum_tpu.render.types import make_sceneset
from datum_tpu.ops import brdf
from datum_tpu.ops.sampling import sample_cubemap, sample_cubemap_lod
from datum_tpu.ops.shadow import shadow_factor_esm_fast

H, W = 1088, 1920
rng = np.random.RandomState(0)
normal = jnp.asarray(rng.rand(H, W, 3).astype(np.float32) * 2 - 1)
normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
eyevec = jnp.asarray(rng.rand(H, W, 3).astype(np.float32) * 2 - 1)
eyevec = eyevec / jnp.linalg.norm(eyevec, axis=-1, keepdims=True)
rough = jnp.asarray(rng.rand(H, W).astype(np.float32))
wp = jnp.asarray((rng.rand(H, W, 3) * 40 - 20).astype(np.float32))
vd = jnp.asarray((rng.rand(H, W) * 50 + 1).astype(np.float32))

ctx, camera, params, make_rl = datumtest_scene(width=W, height=H, sphere_detail=8, grid=(2,2), n_point_lights=8)
ss = jax.device_put(make_sceneset(camera, params))
dev = ctx.device_state()
ibl = dev.get("ibl")
if ibl is None:
    from datum_tpu.render.envmap import EnvMap
    cube = jnp.asarray(np.random.rand(6, 64, 64, 3).astype(np.float32))
    from datum_tpu.ops.ibl import build_specular_mips
    mips = [jnp.asarray(m) for m in build_specular_mips(cube, 5, samples=8)]
    from datum_tpu.ops.ibl import bake_envbrdf
    ibl = dict(mips=mips, envbrdf=jnp.asarray(np.random.rand(64, 64, 2).astype(np.float32)))
mips = ibl["mips"]

def env_block(n, e, r):
    rr = 2.0 * jnp.sum(n * e, -1, keepdims=True) * n - e
    sdir = brdf.specular_dominant_direction(n, rr, r)
    ddir = brdf.diffuse_dominant_direction(n, e, r)
    lod = r * (len(mips) - 1)
    es = sample_cubemap_lod(mips, sdir, lod)[..., :3]
    ed = sample_cubemap(mips[-1], ddir)[..., :3]
    return es + ed
timeit(env_block, normal, eyevec, rough, name="env IBL block (spec lod + diff)")

def env_spec_only(n, e, r):
    rr = 2.0 * jnp.sum(n * e, -1, keepdims=True) * n - e
    sdir = brdf.specular_dominant_direction(n, rr, r)
    return sample_cubemap_lod(mips, sdir, r * (len(mips) - 1))[..., :3]
timeit(env_spec_only, normal, eyevec, rough, name="env specular lod only")

esm = (jnp.asarray(rng.rand(4, 512, 512).astype(np.float32)+1),
       jnp.asarray(np.ones(4, np.float32)*0.1), jnp.asarray(np.ones(4, np.float32)*10))
def pool2(x):
    sh = x.shape
    return x.reshape(sh[0]//2, 2, sh[1]//2, 2, *sh[2:]).mean((1, 3))
def esm_fast(wp2, n2, v2):
    sf_h = shadow_factor_esm_fast(pool2(wp2), esm[0], esm[1], esm[2],
                                  ss["mainlight"]["splits"], ss["mainlight"]["shadowview"],
                                  pool2(v2), normal=pool2(n2))
    return jax.image.resize(sf_h, (H, W), method="linear")
timeit(esm_fast, wp, normal, vd, name="ESM fast halfres factor+resize")

lut = ibl["envbrdf"]
def envbrdf_tap(r, n, e):
    s = lut.shape[0]
    ndv = jnp.clip(jnp.sum(n * e, -1), 0.0, 1.0)
    bi = jnp.clip((r * s).astype(jnp.int32), 0, s - 1)
    bj = jnp.clip((ndv * s).astype(jnp.int32), 0, s - 1)
    return lut[bi, bj]
timeit(envbrdf_tap, rough, normal, eyevec, name="envbrdf LUT tap")
