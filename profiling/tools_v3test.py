import time, numpy as np, jax, jax.numpy as jnp

def timeit(fn, *args, n=4, name=""):
    sfn = jax.jit(lambda *a: jax.tree_util.tree_leaves(fn(*a))[0].ravel()[:1].astype(jnp.float32).sum())
    float(sfn(*args))
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); float(sfn(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name:30s} {np.median(ts)*1000:8.2f} ms", flush=True)

from datum_tpu.scenes import datumtest_scene
from datum_tpu.render.types import make_sceneset
from datum_tpu.render.frame import expand_draws
from datum_tpu.ops import raster as R
from datum_tpu.ops.raster_pallas import raster_shade_pallas, raster_shade_mxu
from datum_tpu.ops.geometry import transform_vertices_rigid

ctx, camera, params, make_rl = datumtest_scene(
    width=1920, height=1088, sphere_detail=24, n_point_lights=8,
    max_vertices=1 << 15, max_triangles=1 << 15,
    bin_capacity=256, big_capacity=64, enable_material_maps=False)
cfg = ctx.config
device = jax.device_put(ctx.device_state())
rl = make_rl(0.0)
ss = jax.device_put(make_sceneset(camera, params, point_lights=rl.point_lights))
draws = jax.device_put(rl.draw_arrays(cfg.max_instances, ctx.default_material))
geom = device["geometry"]
w, h, tx, ty = cfg.padded_width, cfg.padded_height, cfg.tiles_x, cfg.tiles_y

f = jax.jit(lambda d, ss: None)
ex = jax.jit(lambda d: expand_draws(geom, d["mesh"], d["count"], cfg.max_vertices, cfg.max_triangles))(draws)
vp = jnp.asarray(ss["proj"] @ ss["view"])
clip, wn, wt, wp = jax.jit(transform_vertices_rigid)(geom["positions"][ex["src_v"]], geom["normals"][ex["src_v"]], geom["tangents"][ex["src_v"]], ex["vtx_draw"], draws["world"], vp)
setup = jax.jit(lambda c, t: R.triangle_setup(c, t, w, h, tx, ty, cull=-1))(clip, ex["tris"])
bins, counts, big = jax.jit(lambda s: R.bin_triangles(s, cfg.max_triangles, tx, ty, cfg.bin_capacity, cfg.big_capacity))(setup)
uvv = geom["texcoords"][ex["src_v"]]
trimat = draws["material"][ex["tri_draw"]]

f2 = jax.jit(lambda *a: raster_shade_pallas(*a, device["materials"], tx, ty, w, h))
timeit(f2, setup, bins, big, counts, ex["tris"], uvv, wn, trimat, name="v2 scalar-loop kernel")
f3 = jax.jit(lambda *a: raster_shade_mxu(*a, device["materials"], tx, ty, w, h))
timeit(f3, setup, bins, big, counts, ex["tris"], uvv, wn, trimat, name="v3 MXU kernel")
# verify agreement on TPU
a = f2(setup, bins, big, counts, ex["tris"], uvv, wn, trimat) if False else None
pa = raster_shade_pallas(setup, bins, big, counts, ex["tris"], uvv, wn, trimat, device["materials"], tx, ty, w, h)
pb = raster_shade_mxu(setup, bins, big, counts, ex["tris"], uvv, wn, trimat, device["materials"], tx, ty, w, h)
va, vb = np.asarray(pa["vis"]), np.asarray(pb["vis"])
print("vis agreement:", (va == vb).mean())
