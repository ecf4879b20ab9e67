"""Per-pass profile via chained repetition (fence amortized).

Each pass runs K times inside ONE jit, iterations chained by a tiny
data dependency (out scalar perturbs an input), so the tunnel fence
(~24 ms) and dispatch overhead amortize to noise.  Reports marginal
ms/iteration.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

K = 16


def chain_time(fn, perturb, *args, k=K, n=3, name=""):
    """fn(*args) -> pytree; perturb(args, scalar) -> args."""
    def chained(args):
        def body(i, carry):
            args, acc = carry
            out = fn(*args)
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32)
            return perturb(args, s * 1e-20), acc + s
        _, acc = jax.lax.fori_loop(0, k, body, (args, jnp.float32(0.0)))
        return acc
    cf = jax.jit(chained)
    float(cf(args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(cf(args))
        ts.append(time.perf_counter() - t0)
    # subtract the same measurement at k=1 is noisy; instead report
    # (t - fence)/k using a measured empty-chain fence
    t = float(np.median(ts))
    print(f"{name:36s} {(t * 1000 - FENCE_MS) / k:8.2f} ms/it   (total {t*1000:7.1f})", flush=True)


def fence_ms():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    float(f(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000


FENCE_MS = 0.0


def main():
    global FENCE_MS
    FENCE_MS = fence_ms()
    print(f"fence: {FENCE_MS:.1f} ms")

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
        bin_capacity=160, big_capacity=64, bin_max_span=8, use_pallas=True,
        enable_material_maps=False, texture_filter="nearest_half",
        shadow_factor_scale=4)
    cfg = ctx.config
    device = jax.device_put(ctx.device_state())
    rl = make_rl(0.0)
    ss = jax.device_put(make_sceneset(camera, params, point_lights=rl.point_lights,
                                      spot_lights=rl.spot_lights))
    draws = jax.device_put(rl.draw_arrays(cfg.max_instances, ctx.default_material))
    geom = device["geometry"]
    w, h, tx, ty = cfg.padded_width, cfg.padded_height, cfg.tiles_x, cfg.tiles_y

    def pre(d, ss):
        ex = expand_draws(geom, d["mesh"], d["count"], cfg.max_vertices, cfg.max_triangles)
        p = geom["positions"][ex["src_v"]]
        vp = (ss["proj"] @ ss["view"]).astype(jnp.float32)
        clip, wnm, wt, wp = transform_vertices_rigid(
            p, geom["normals"][ex["src_v"]], geom["tangents"][ex["src_v"]],
            ex["vtx_draw"], d["world"], vp)
        setup = R.triangle_setup(clip, ex["tris"], w, h, tx, ty, cull=-1,
                                 max_span=cfg.bin_max_span)
        return ex, clip, wnm, wp, setup

    ex, clip, wnm, wp, setup = jax.jit(pre)(draws, ss)

    def pturb_world(args, s):
        d = dict(args[0]); d["world"] = d["world"] + s
        return (d,) + args[1:]

    chain_time(lambda d: pre(d, ss), pturb_world, draws, name="expand+vertex+setup")

    zw = clip[:, 2] / jnp.maximum(clip[:, 3], 1e-6)
    prio = jnp.clip(zw[ex["tris"]].max(axis=1), 0.0, 1.0)

    def binf(pr):
        return R.bin_triangles(setup, cfg.max_triangles, tx, ty, cfg.bin_capacity,
                               cfg.big_capacity, max_span=cfg.bin_max_span,
                               depth_prio=pr)

    def pturb0(args, s):
        return (args[0] + s,) + args[1:]

    def pturb_setup(args, s):
        st = dict(args[0]); st["zc"] = st["zc"] + s
        return (st,) + args[1:]

    bins, counts, big = jax.jit(binf)(prio)
    chain_time(binf, pturb0, prio, name="bin_triangles sort")

    uvv = geom["texcoords"][np.asarray(ex["src_v"])]
    trimat = jax.jit(lambda d: d["material"][ex["tri_draw"]])(draws)

    def rs(setup, bins, big, counts):
        return raster_shade_pallas(setup, bins, big, counts, ex["tris"], uvv,
                                   wnm, trimat, device["materials"], tx, ty, w, h)
    planes = jax.jit(rs)(setup, bins, big, counts)
    chain_time(rs, pturb_setup, setup, bins, big, counts, name="fused raster+attr kernel")

    def gbf(planes):
        return S.gbuffer_from_planes(planes, device["textures"],
                                     texture_filter=cfg.texture_filter)
    def pturb_planes(args, s):
        p = dict(args[0]); p["uv"] = p["uv"] + s
        return (p,) + args[1:]
    gb = jax.jit(gbf)(planes)
    chain_time(gbf, pturb_planes, planes, name="gbuffer albedo tap (half,nearest)")

    def shf(wp):
        return render_shadow_cascades(wp, ex["tris"], ss["mainlight"]["shadowview"],
                                      res=cfg.shadow_res,
                                      bin_capacity=cfg.shadow_bin_capacity,
                                      big_capacity=cfg.big_capacity, use_pallas=True)
    raw = jax.jit(shf)(wp)
    chain_time(shf, pturb0, wp, name="shadow cascades x4")

    esmf = lambda r: build_esm(r, ss["mainlight"]["shadowview"])
    esm = jax.jit(esmf)(raw)
    chain_time(esmf, pturb0, raw, name="build_esm blurs")

    def lif(gb, d):
        return L.shade_deferred(gb, d, ss, proj=ss["proj"], invview=ss["invview"],
                                shadowmaps=esm, ibl=device.get("ibl"),
                                shadow_factor_scale=cfg.shadow_factor_scale)
    def pturb_gb(args, s):
        g = dict(args[0]); g["normal"] = g["normal"] + s
        return (g,) + args[1:]
    hdr = jax.jit(lif)(gb, planes["depth"])
    chain_time(lif, pturb_gb, gb, planes["depth"], name="lighting shade_deferred")

    from datum_tpu.ops.bloom import bloom as bloom_op
    chain_time(lambda h_: bloom_op(h_, 1.0), pturb0, hdr, name="bloom")

    chain_time(lambda h_: C.to_u8_image(C.composite(h_, 1.0, lut=device.get("colorlut"))),
               pturb0, hdr, name="composite+grade+u8")

    # ---- full frame (chained), should match bench.py
    def ff(d, ss_):
        out = _frame(cfg, device, d, ss_)
        return out["luminance"]
    def pturb_ff(args, s):
        ss_ = dict(args[1]); cam = dict(ss_["camera"])
        cam["exposure"] = cam["exposure"] * (1.0 + s)
        ss_["camera"] = cam
        return (args[0], ss_)
    chain_time(ff, pturb_ff, draws, ss, k=8, name="FULL FRAME")


if __name__ == "__main__":
    main()
