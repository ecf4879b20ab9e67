import time, numpy as np, jax, jax.numpy as jnp
from functools import partial

def timeit(fn, *args, n=4, name=""):
    sfn = jax.jit(lambda *a: jax.tree_util.tree_leaves(fn(*a))[0].ravel()[:1].astype(jnp.float32).sum())
    float(sfn(*args))
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); float(sfn(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name:34s} {np.median(ts)*1000:8.2f} ms", flush=True)

from datum_tpu.scenes import datumtest_scene
from datum_tpu.render.types import make_sceneset
from datum_tpu.render.frame import expand_draws, _frame
from datum_tpu.ops import raster as R, shade as S, lighting_pass as L, composite as C
from datum_tpu.ops.raster_pallas import raster_shade_pallas
from datum_tpu.ops.geometry import transform_vertices_rigid
from datum_tpu.ops.shadow import render_shadow_cascades, build_esm

ctx, camera, params, make_rl = datumtest_scene(
    width=1920, height=1088, sphere_detail=24, n_point_lights=8,
    max_vertices=1 << 15, max_triangles=1 << 15,
    bin_capacity=256, big_capacity=64, bin_max_span=8, use_pallas=True,
    enable_material_maps=False, texture_filter="nearest_half",
    shadow_factor_scale=4)
cfg = ctx.config
device = jax.device_put(ctx.device_state())
rl = make_rl(0.0)
ss = jax.device_put(make_sceneset(camera, params, point_lights=rl.point_lights))
draws = jax.device_put(rl.draw_arrays(cfg.max_instances, ctx.default_material))
geom = device["geometry"]
w, h, tx, ty = cfg.padded_width, cfg.padded_height, cfg.tiles_x, cfg.tiles_y

def pre(d, ss):
    ex = expand_draws(geom, d["mesh"], d["count"], cfg.max_vertices, cfg.max_triangles)
    p = geom["positions"][ex["src_v"]]
    vp = (ss["proj"] @ ss["view"]).astype(jnp.float32)
    clip, wn, wt, wp = transform_vertices_rigid(p, geom["normals"][ex["src_v"]], geom["tangents"][ex["src_v"]], ex["vtx_draw"], d["world"], vp)
    setup = R.triangle_setup(clip, ex["tris"], w, h, tx, ty, cull=-1)
    return ex, clip, wn, wp, setup
f_pre = jax.jit(pre)
ex, clip, wn, wp, setup = f_pre(draws, ss)
timeit(f_pre, draws, ss, name="expand+vertex+setup")

f_bin = jax.jit(lambda setup: R.bin_triangles(setup, cfg.max_triangles, tx, ty, cfg.bin_capacity, cfg.big_capacity))
bins, counts, big = f_bin(setup)
timeit(f_bin, setup, name="bin_triangles sort")

uvv = jax.jit(lambda ex: geom["texcoords"][ex["src_v"]])(ex)
trimat = jax.jit(lambda d, ex: d["material"][ex["tri_draw"]])(draws, ex)
f_rs = jax.jit(lambda setup, bins, big, counts, uv, wn, tm: raster_shade_pallas(setup, bins, big, counts, ex["tris"], uv, wn, tm, device["materials"], tx, ty, w, h))
planes = f_rs(setup, bins, big, counts, uvv, wn, trimat)
timeit(f_rs, setup, bins, big, counts, uvv, wn, trimat, name="fused raster+attr kernel")

f_gb = jax.jit(lambda planes: S.gbuffer_from_planes(planes, device["textures"]))
gb = f_gb(planes)
timeit(f_gb, planes, name="gbuffer (albedo nearest tap)")

f_sh = jax.jit(lambda wp, tris, sv: render_shadow_cascades(wp, tris, sv, res=cfg.shadow_res, bin_capacity=cfg.shadow_bin_capacity, big_capacity=cfg.big_capacity, use_pallas=True))
raw = f_sh(wp, ex["tris"], ss["mainlight"]["shadowview"])
timeit(f_sh, wp, ex["tris"], ss["mainlight"]["shadowview"], name="shadow cascades x4 pallas")

f_esm = jax.jit(lambda r, sv: build_esm(r, sv))
esm = f_esm(raw, ss["mainlight"]["shadowview"])
timeit(f_esm, raw, ss["mainlight"]["shadowview"], name="build_esm (blurs)")

f_li = jax.jit(lambda gb, d, ss, esm: L.shade_deferred(gb, d, ss, proj=ss["proj"], invview=ss["invview"], shadowmaps=esm))
hdr = f_li(gb, planes["depth"], ss, esm)
timeit(f_li, gb, planes["depth"], ss, esm, name="lighting + halfres ESM")

from datum_tpu.ops.bloom import bloom as bloom_op
f_bl = jax.jit(lambda hdr: bloom_op(hdr, 1.0))
timeit(f_bl, hdr, name="bloom")

f_co = jax.jit(lambda hdr: C.to_u8_image(C.composite(hdr, 1.0)))
timeit(f_co, hdr, name="composite+u8")

f_frame = jax.jit(lambda d, ss: _frame(cfg, device, d, ss)["image"])
img = f_frame(draws, ss)
timeit(f_frame, draws, ss, name="FULL FRAME")
