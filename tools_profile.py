"""Per-pass TPU profiling harness (dev tool).

Times each frame stage as its own jitted function with per-call
blocking, to locate the hot passes on real hardware.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def timeit(fn, *args, n=5, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {np.median(ts)*1000:8.2f} ms")
    return out


def main():
    from datum_tpu.scenes import datumtest_scene
    from datum_tpu.render.types import make_sceneset
    from datum_tpu.render.frame import expand_draws
    from datum_tpu.ops import raster as R, shade as S, lighting_pass as L, composite as C
    from datum_tpu.ops.geometry import transform_vertices_rigid
    from datum_tpu.ops.shadow import render_shadow_cascades

    ctx, camera, params, make_rl = datumtest_scene(
        width=1920, height=1088, sphere_detail=24, n_point_lights=8,
        max_vertices=1 << 16, max_triangles=1 << 16,
        bin_capacity=256, big_capacity=64)
    cfg = ctx.config
    device = jax.device_put(ctx.device_state())
    rl = make_rl(0.0)
    ss = jax.device_put(make_sceneset(camera, params, point_lights=rl.point_lights))
    draws = jax.device_put(rl.draw_arrays(cfg.max_instances, ctx.default_material))
    geom = device["geometry"]
    w, h, tx, ty = cfg.padded_width, cfg.padded_height, cfg.tiles_x, cfg.tiles_y

    f_expand = jax.jit(lambda d: expand_draws(geom, d["mesh"], d["count"],
                                              cfg.max_vertices, cfg.max_triangles))
    ex = timeit(f_expand, draws, name="expand_draws")

    def vtx(ex, d, ss):
        p = geom["positions"][ex["src_v"]]
        vp = (ss["proj"] @ ss["view"]).astype(jnp.float32)
        return transform_vertices_rigid(p, geom["normals"][ex["src_v"]],
                                        geom["tangents"][ex["src_v"]],
                                        ex["vtx_draw"], d["world"], vp)
    f_vtx = jax.jit(vtx)
    clip, wn, wt, wp = timeit(f_vtx, ex, draws, ss, name="vertex transform")

    f_setup = jax.jit(lambda clip, tris: R.triangle_setup(clip, tris, w, h, tx, ty))
    setup = timeit(f_setup, clip, ex["tris"], name="triangle_setup")

    f_bin = jax.jit(lambda setup: R.bin_triangles(setup, cfg.max_triangles, tx, ty,
                                                  cfg.bin_capacity, cfg.big_capacity))
    bins, counts, big = timeit(f_bin, setup, name="bin_triangles (sort)")

    f_raster = jax.jit(lambda setup, bins, big: R.raster(setup, bins, big, tx, ty, w, h))
    depth, vis = timeit(f_raster, setup, bins, big, name="raster scan")

    f_shadow = jax.jit(lambda wp, tris, sv: render_shadow_cascades(
        wp, tris, sv, res=cfg.shadow_res, bin_capacity=cfg.shadow_bin_capacity,
        big_capacity=cfg.big_capacity))
    shadowmaps = timeit(f_shadow, wp, ex["tris"], ss["mainlight"]["shadowview"],
                        name="shadow cascades x4")

    attrs = dict(uv=geom["texcoords"], normal=wn, tangent=wt)
    def resolve(vis, setup, ex, uv):
        a = dict(uv=uv, normal=wn, tangent=wt)
        return S.resolve_gbuffer(vis, setup, ex["tris"], ex["tri_draw"], a,
                                 dict(material=draws["material"]),
                                 device["materials"], device["textures"], w, h)
    uv = jax.jit(lambda ex: geom["texcoords"][ex["src_v"]])(ex)
    f_resolve = jax.jit(resolve)
    gb = timeit(f_resolve, vis, setup, ex, uv, name="resolve_gbuffer")

    f_light = jax.jit(lambda gb, depth, ss, sm: L.shade_deferred(
        gb, depth, ss, proj=ss["proj"], invview=ss["invview"], shadowmaps=sm))
    hdr = timeit(f_light, gb, depth, ss, shadowmaps, name="lighting+shadowPCF")

    f_light_nosh = jax.jit(lambda gb, depth, ss: L.shade_deferred(
        gb, depth, ss, proj=ss["proj"], invview=ss["invview"]))
    timeit(f_light_nosh, gb, depth, ss, name="lighting (no shadow)")

    f_comp = jax.jit(lambda hdr: C.to_u8_image(C.composite(hdr, 1.0)))
    timeit(f_comp, hdr, name="composite")


if __name__ == "__main__":
    main()
