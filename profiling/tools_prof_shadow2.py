"""Shadow sub-pass breakdown: setup / binning sort / depth kernel."""
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
from datum_tpu.render.frame import expand_draws
from datum_tpu.ops.geometry import transform_vertices_rigid
from datum_tpu.ops import raster as raster_ops
from datum_tpu.ops.raster_pallas import raster_depth_pallas

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
geom = device["geometry"]
res = cfg.shadow_res
n_slices = 4
tiles_x = res // 128
tiles_y = (res * n_slices) // 32
vh = res * n_slices

def prep(draws, ss):
    ex = expand_draws(geom, draws["mesh"], draws["count"], cfg.max_vertices, cfg.max_triangles)
    pos = geom["positions"][ex["src_v"]]
    nrm = geom["normals"][ex["src_v"]]
    tan = geom["tangents"][ex["src_v"]]
    vp = (ss["proj"] @ ss["view"]).astype(jnp.float32)
    _, _, _, wpos = transform_vertices_rigid(pos, nrm, tan, ex["vtx_draw"], draws["world"], vp)
    sv = ss["mainlight"]["shadowview"]
    V = wpos.shape[0]
    clips, tris_all = [], []
    for s in range(n_slices):
        m = sv[s]
        c = wpos @ m[:, :3].T + m[:, 3]
        y = (c[:, 1] + (2.0 * s - (n_slices - 1)) * c[:, 3]) * (1.0 / n_slices)
        clips.append(jnp.stack([c[:, 0], y, c[:, 2], c[:, 3]], -1))
        tris_all.append(ex["tris"] + s * V)
    return jnp.concatenate(clips), jnp.concatenate(tris_all)

clip_all, tris_all = jax.jit(prep)(draws, ss)
clip_all, tris_all = jax.device_put((clip_all, tris_all))
timeit(prep, draws, ss, name="expand+transform+band remap")

def setup_fn(clip_all, tris_all):
    s = raster_ops.triangle_setup(clip_all, tris_all, res, vh, tiles_x, tiles_y, cull=-1, max_span=4)
    band = jnp.arange(tris_all.shape[0], dtype=jnp.int32) // (tris_all.shape[0] // n_slices)
    lo = -1.0 + band.astype(jnp.float32) * (2.0 / n_slices)
    s["ylim"] = jnp.stack([lo, lo + 2.0 / n_slices], -1)
    return s
setup = jax.jit(setup_fn)(clip_all, tris_all)
setup = jax.device_put(setup)
timeit(setup_fn, clip_all, tris_all, name="shadow triangle_setup")

def bin_fn(setup):
    return raster_ops.bin_triangles(setup, tris_all.shape[0], tiles_x, tiles_y,
                                    cfg.shadow_bin_capacity, cfg.big_capacity, max_span=4)
bins, counts, big = jax.jit(bin_fn)(setup)
bins, counts, big = jax.device_put((bins, counts, big))
timeit(bin_fn, setup, name="shadow bin_triangles (sort)")

def kern(setup, bins, big, counts):
    return raster_depth_pallas(setup, bins, big, counts, tiles_x, tiles_y, res, vh)
timeit(kern, setup, bins, big, counts, name="depth-only pallas kernel")
print("coverage stats: counts max", int(counts.max()), "sum", int(counts.sum()),
      "bigs", int((big >= 0).sum()), flush=True)
