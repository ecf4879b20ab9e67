"""Micro-profile the lighting pass internals on TPU."""
import time, numpy as np, jax, jax.numpy as jnp

def timeit(fn, *args, n=4, name=""):
    sfn = jax.jit(lambda *a: jax.tree_util.tree_leaves(fn(*a))[0].ravel()[:1].astype(jnp.float32).sum())
    float(sfn(*args))
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); float(sfn(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name:38s} {np.median(ts)*1000:8.2f} ms", flush=True)

from datum_tpu.scenes import datumtest_scene
from datum_tpu.render.types import make_sceneset
from datum_tpu.ops import lighting_pass as L, brdf
from datum_tpu.ops.shadow import shadow_factor_esm

H, W = 1088, 1920
rng = np.random.RandomState(0)
depth = jnp.asarray(np.clip(rng.rand(H, W), 0.01, 1).astype(np.float32))
gb = dict(
    diffuse=jnp.asarray(rng.rand(H, W, 4).astype(np.float32)),
    specular=jnp.asarray(rng.rand(H, W, 4).astype(np.float32)),
    normal=jnp.asarray(rng.rand(H, W, 4).astype(np.float32)),
    mask=jnp.asarray(np.ones((H, W), bool)),
)
ctx, camera, params, make_rl = datumtest_scene(width=W, height=H, sphere_detail=8, grid=(2,2), n_point_lights=8)
rl = make_rl(0.0)
ss = jax.device_put(make_sceneset(camera, params, point_lights=rl.point_lights))
esm = (jnp.asarray(rng.rand(4, 1024, 1024).astype(np.float32)+1),
       jnp.asarray(np.ones(4, np.float32)*0.1), jnp.asarray(np.ones(4, np.float32)*10))

f_rec = jax.jit(lambda d: L.reconstruct_positions(d, ss["proj"], ss["invview"], W, H))
vp, wp = f_rec(depth)
timeit(f_rec, depth, name="reconstruct positions")

normal = gb["normal"][..., :3] * 2 - 1
material = dict(diffuse=gb["diffuse"][..., :3], specular=gb["specular"][..., :3],
                roughness=gb["specular"][..., 3], alpha=gb["specular"][..., 3]**2,
                emissive=gb["diffuse"][..., 3])
eyevec = brdf.normalize(ss["invview"][:3, 3] - wp)

f_main = jax.jit(lambda n, e: brdf.main_light(n, e, material, ss["mainlight"]["direction"], ss["mainlight"]["intensity"], ss["mainlight"]["cutoff"], jnp.ones((H, W))))
timeit(f_main, normal, eyevec, name="main light BRDF")

f_esm = jax.jit(lambda wp2: shadow_factor_esm(wp2[::2, ::2], esm[0], esm[1], esm[2], ss["mainlight"]["splits"], ss["mainlight"]["shadowview"], -vp[::2, ::2, 2], normal=normal[::2, ::2], nearest=True))
timeit(f_esm, wp, name="ESM halfres factor")

def points(wp2, n, e):
    pl = ss["pointlights"]
    def body(i, acc):
        d, s = brdf.point_light(wp2, n, e, material, pl["position"][i], pl["intensity"][i], pl["attenuation"][i])
        return (acc[0] + d, acc[1] + s)
    return jax.lax.fori_loop(0, 8, body, (jnp.zeros((H, W, 3)), jnp.zeros((H, W, 3))))
f_pts = jax.jit(points)
timeit(f_pts, wp, normal, eyevec, name="8 point lights fori")

f_full = jax.jit(lambda gb, d, sm: L.shade_deferred(gb, d, ss, proj=ss["proj"], invview=ss["invview"], shadowmaps=sm))
timeit(f_full, gb, depth, esm, name="shade_deferred full")

from datum_tpu.ops.bloom import bloom as bloom_op
hdr = jnp.asarray(rng.rand(H, W, 3).astype(np.float32) * 5)
f_bl = jax.jit(lambda x: bloom_op(x, 1.0))
timeit(f_bl, hdr, name="bloom (quarter-res dense)")
