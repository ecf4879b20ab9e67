"""Per-pass TPU profiling harness (dev tool).

Times each frame stage as its own jitted function with per-call
blocking, to locate the hot passes on real hardware.
"""

import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial


def _scalarize(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(l[..., :1] if l.ndim else l).astype(jnp.float32)
               for l in leaves[:1])


def timeit(fn, *args, n=5, name=""):
    # the axon tunnel's block_until_ready does not actually block, so a
    # scalar host readback is the only honest timing fence
    sfn = jax.jit(lambda *a: (fn(*a), _scalarize(fn(*a))))
    out, s = sfn(*args)
    float(s)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out, s = sfn(*args)
        float(s)
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {np.median(ts)*1000:8.2f} ms", flush=True)
    return out


def main():
    from datum_tpu.scenes import datumtest_scene
    from datum_tpu.render.types import make_sceneset
    from datum_tpu.render.frame import expand_draws
    from datum_tpu.ops import raster as R, shade as S, lighting_pass as L, composite as C
    from datum_tpu.ops.raster_pallas import raster_pallas
    from datum_tpu.ops.geometry import transform_vertices_rigid
    from datum_tpu.ops.shadow import render_shadow_cascades, build_esm

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

    f_rp = jax.jit(lambda setup, bins, big, counts: raster_pallas(
        setup, bins, big, counts, tx, ty, w, h))
    depth, vis, l0, l1 = timeit(f_rp, setup, bins, big, counts, name="raster PALLAS")
    lam = jnp.stack([l0, l1, 1.0 - l0 - l1], -1)

    f_shadow = jax.jit(lambda wp, tris, sv: render_shadow_cascades(
        wp, tris, sv, res=cfg.shadow_res, bin_capacity=cfg.shadow_bin_capacity,
        big_capacity=cfg.big_capacity, use_pallas=True))
    raw_sm = timeit(f_shadow, wp, ex["tris"], ss["mainlight"]["shadowview"],
                    name="shadow cascades x4 PALLAS")

    f_esm = jax.jit(lambda sm, sv: build_esm(sm, sv))
    esm = timeit(f_esm, raw_sm, ss["mainlight"]["shadowview"], name="build_esm")

    def resolve(vis, setup, ex, uv, lam):
        a = dict(uv=uv, normal=wn, tangent=wt)
        return S.resolve_gbuffer(vis, setup, ex["tris"], ex["tri_draw"], a,
                                 dict(material=draws["material"]),
                                 device["materials"], device["textures"], w, h,
                                 material_maps=False, lam=lam)
    uv = jax.jit(lambda ex: geom["texcoords"][ex["src_v"]])(ex)
    f_resolve = jax.jit(resolve)
    gb = timeit(f_resolve, vis, setup, ex, uv, lam, name="resolve_gbuffer (lam)")

    f_light = jax.jit(lambda gb, depth, ss, sm: L.shade_deferred(
        gb, depth, ss, proj=ss["proj"], invview=ss["invview"], shadowmaps=sm))
    hdr = timeit(f_light, gb, depth, ss, esm, name="lighting+ESM shadow")

    f_light_nosh = jax.jit(lambda gb, depth, ss: L.shade_deferred(
        gb, depth, ss, proj=ss["proj"], invview=ss["invview"]))
    timeit(f_light_nosh, gb, depth, ss, name="lighting (no shadow)")

    f_comp = jax.jit(lambda hdr: C.to_u8_image(C.composite(hdr, 1.0)))
    timeit(f_comp, hdr, name="composite")


if __name__ == "__main__":
    main()
