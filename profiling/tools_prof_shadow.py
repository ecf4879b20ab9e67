"""Shadow cascade raster: depth-only kernel + caster culling, on TPU."""
import time, numpy as np, jax, jax.numpy as jnp

def timeit(fn, *args, n=4, name=""):
    sfn = jax.jit(lambda *a: jax.tree_util.tree_leaves(fn(*a))[0].ravel()[:1].astype(jnp.float32).sum())
    float(sfn(*args))
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); float(sfn(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name:44s} {np.median(ts)*1000:8.2f} ms", flush=True)

from datum_tpu.scenes import datumtest_scene
from datum_tpu.render.types import make_sceneset
from datum_tpu.render import frame as frame_mod
from datum_tpu.ops import shadow as shadow_ops

ctx, camera, params, make_rl = datumtest_scene(
    width=1920, height=1088, sphere_detail=24, n_point_lights=8,
    max_vertices=1 << 15, max_triangles=1 << 15,
    bin_capacity=256, big_capacity=64,
    use_pallas=True, enable_material_maps=False, texture_filter="nearest_half")
device = jax.device_put(ctx.device_state())
rl = make_rl(0.0)
ss = jax.device_put(make_sceneset(camera, params, point_lights=rl.point_lights))
draws = jax.device_put(rl.draw_arrays(ctx.config.max_instances, ctx.default_material))
cfg = ctx.config

def shadows(draws, ss):
    from datum_tpu.render.frame import expand_draws
    from datum_tpu.ops.geometry import transform_vertices_rigid
    geom = device["geometry"]
    ex = expand_draws(geom, draws["mesh"], draws["count"], cfg.max_vertices, cfg.max_triangles)
    pos = geom["positions"][ex["src_v"]]
    nrm = geom["normals"][ex["src_v"]]
    tan = geom["tangents"][ex["src_v"]]
    vp = (ss["proj"] @ ss["view"]).astype(jnp.float32)
    _, _, _, wpos = transform_vertices_rigid(pos, nrm, tan, ex["vtx_draw"], draws["world"], vp)
    return shadow_ops.render_shadow_cascades(
        wpos, ex["tris"], ss["mainlight"]["shadowview"], res=cfg.shadow_res,
        bin_capacity=cfg.shadow_bin_capacity, big_capacity=cfg.big_capacity,
        use_pallas=True)
timeit(shadows, draws, ss, name="shadow cascades (depth-only + cull)")

def full(draws, ss):
    return frame_mod.render_frame(cfg, device, draws, ss)["luminance"]
timeit(full, draws, ss, name="FULL FRAME")
