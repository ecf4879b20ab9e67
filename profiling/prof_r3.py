"""Round-3 per-pass profile at the EXACT bench config.

Mirrors render/frame.py's fast path pass by pass; each pass chain-times
K iterations inside one jit (data-dependency chained) so the ~24 ms
tunnel fence amortizes away.  Reports marginal ms/iteration.

Run: python profiling/prof_r3.py            (real TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

K = 12
FENCE_MS = 0.0


def chain_time(fn, perturb, *args, k=K, n=3, name="", unroll=False):
    if unroll:
        # Python-unrolled chain: inside a fori body XLA scopes pallas
        # outputs onto the vmem stack and big kernels fail to compile
        # (bench.py chains the same way)
        def chained(args):
            acc = jnp.float32(0.0)
            for _ in range(k):
                out = fn(*args)
                s = jax.tree_util.tree_leaves(out)[0].ravel()[0] \
                    .astype(jnp.float32)
                args = perturb(args, s * 1e-20)
                acc = acc + s
            return acc
    else:
        def chained(args):
            def body(i, carry):
                args, acc = carry
                out = fn(*args)
                s = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32)
                return perturb(args, s * 1e-20), acc + s
            _, acc = jax.lax.fori_loop(0, k, body, (args, jnp.float32(0.0)))
            return acc
    cf = jax.jit(chained)
    try:
        float(cf(args))
    except Exception as e:  # standalone-jit quirks (e.g. scoped-vmem
        print(f"{name:40s} SKIPPED: {str(e)[:120]}", flush=True)
        return              # output placement) — measure by subtraction
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(cf(args))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"{name:40s} {(t * 1000 - FENCE_MS) / k:8.2f} ms/it   (total {t*1000:7.1f})",
          flush=True)


def fence_ms():
    # x must live on device already: the chained calls pay ONE readback
    # roundtrip, so the fence must too (a host-side scalar arg adds an
    # upload roundtrip and doubles the measured fence)
    f = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(jnp.float32(0.0))
    float(f(x))
    ts = []
    for _ in range(9):
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000


def main():
    global FENCE_MS
    from datum_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    FENCE_MS = fence_ms()
    print(f"fence: {FENCE_MS:.1f} ms", flush=True)

    from datum_tpu.scenes import datumtest_scene
    from datum_tpu.render import frame as F
    from datum_tpu.render.types import make_sceneset
    from datum_tpu.ops import raster as R
    from datum_tpu.ops.geometry import transform_vertices_rigid
    from datum_tpu.ops.raster_pallas import (raster_shade_pallas,
                                             raster_blend_pallas)
    from datum_tpu.ops.shadow import (render_shadow_cascades, build_esm,
                                      render_spot_maps_parabolic,
                                      build_spot_esm,
                                      spot_factor_quarter_parabolic)
    from datum_tpu.render.renderlist import RenderList

    ctx, camera, params, make_rl = datumtest_scene(
        width=1920, height=1088, sphere_detail=24, n_point_lights=8,
        max_vertices=1 << 15, max_triangles=1 << 15,
        bin_capacity=160, big_capacity=64, bin_max_span=8,
        use_pallas=True, shadow_factor_scale=4,
        enable_material_maps=True, texture_filter="mip_half",
        enable_ssao=True, enable_fog=True, enable_ssr=True,
        max_spot_shadows=1, max_particle_quads=512,
        max_translucent_draws=2, max_translucent_tris=2048,
        max_decals_active=2, decal_textures=False,
        translucent_lit_scale=2)
    cfg = ctx.config
    device = jax.device_put(ctx.device_state())
    rl = make_rl(0.0)
    ss = make_sceneset(camera, params, point_lights=rl.point_lights,
                       spot_lights=rl.spot_lights)
    draws = rl.draw_arrays(cfg.max_instances, ctx.default_material)
    ctx.expand_host(draws)
    draws["forward"] = rl.forward_arrays(cfg.max_particle_quads, camera)
    draws["translucent"] = rl.translucent_arrays(
        cfg.max_translucent_draws, ctx.default_material)
    draws["decals"] = rl.decal_arrays(cfg.max_decals_active)
    draws = jax.device_put(draws)
    ss = jax.device_put(ss)
    geom = device["geometry"]
    w, h, tx, ty = cfg.padded_width, cfg.padded_height, cfg.tiles_x, cfg.tiles_y
    ibl = device.get("ibl")

    # ---- pre: attr gather + transform + setup
    def pre(d, ss_):
        ex = dict(src_v=d["src_v"], vtx_draw=d["vtx_draw"],
                  v_valid=d["v_valid"], tris=d["tris"],
                  tri_draw=d["tri_draw"], t_valid=d["t_valid"])
        rows12 = geom["attr12"][ex["src_v"]]
        positions, uv = rows12[:, 0:3], rows12[:, 3:5]
        normals, tangents = rows12[:, 5:8], rows12[:, 8:12]
        vp = (ss_["proj"] @ ss_["view"]).astype(jnp.float32)
        clip, wnm, wt, wp = transform_vertices_rigid(
            positions, normals, tangents, ex["vtx_draw"], d["world"], vp)
        setup = R.triangle_setup(clip, ex["tris"], w, h, tx, ty, cull=-1,
                                 max_span=cfg.bin_max_span)
        return ex, clip, uv, wnm, wt, wp, setup

    def pturb_world(args, s):
        d = dict(args[0]); d["world"] = d["world"] + s
        return (d,) + args[1:]

    ex, clip, uv, wnm, wt, wp, setup = jax.jit(pre)(draws, ss)
    chain_time(lambda d: pre(d, ss), pturb_world, draws,
               name="pre: attr gather+vertex+setup")

    # ---- bin sort
    zw = clip[:, 2] / jnp.maximum(clip[:, 3], 1e-6)
    prio = jnp.clip(zw[ex["tris"]].max(axis=1), 0.0, 1.0)

    def binf(pr):
        return R.bin_triangles(setup, cfg.max_triangles, tx, ty,
                               cfg.bin_capacity, cfg.big_capacity,
                               max_span=cfg.bin_max_span,
                               return_overflow=True, depth_prio=pr)

    def pturb0(args, s):
        return (args[0] + s,) + args[1:]

    bins, counts, big, _ovf = jax.jit(binf)(prio)
    chain_time(binf, pturb0, prio, name="bin_triangles sort (main)")

    # ---- shadow cascades + ESM
    def shf(wp_):
        raw = render_shadow_cascades(
            wp_, ex["tris"], ss["mainlight"]["shadowview"],
            res=cfg.shadow_res, bin_capacity=cfg.shadow_bin_capacity,
            big_capacity=cfg.big_capacity, use_pallas=True)
        return raw
    raw_sh = jax.jit(shf)(wp)
    chain_time(shf, pturb0, wp, name="shadow cascades raster x4")

    esmf = lambda r: build_esm(r, ss["mainlight"]["shadowview"])
    esm = jax.jit(esmf)(raw_sh)
    chain_time(esmf, pturb0, raw_sh, name="build_esm")

    # ---- spot maps (parabolic) + factors
    sl_ = ss["spotlights"]

    def spotf(wp_):
        maps = render_spot_maps_parabolic(
            wp_, ex["tris"], sl_["view"], sl_["attenuation"][:, 3],
            cfg.max_spot_shadows, res=cfg.spot_shadow_res,
            bin_capacity=cfg.shadow_bin_capacity,
            big_capacity=cfg.big_capacity)
        return maps
    spotmaps = jax.jit(spotf)(wp)
    chain_time(spotf, pturb0, wp, name="spot maps raster (parabolic)")

    # ---- fused visibility raster + attrs
    tri_mat = draws["tri_mat"]

    def rs(setup_, bins_, big_, counts_):
        return raster_shade_pallas(
            setup_, bins_, big_, counts_, ex["tris"], uv, wnm, tri_mat,
            device["materials"], tx, ty, w, h, tangent=wt,
            matmaps=device["matmaps"], planes_2d=True)

    def pturb_setup(args, s):
        st = dict(args[0]); st["row16"] = st["row16"] + s * 0.0
        st["zc"] = st["zc"] + s
        return (st,) + args[1:]

    planes = jax.jit(rs)(setup, bins, big, counts)
    chain_time(rs, pturb_setup, setup, bins, big, counts,
               name="fused raster+attr kernel")

    # ---- gplane assembly (materials, env fields, TBN, sun shadow)
    def asm(planes_):
        return F._assemble_gplanes(cfg, planes_, device, ss, ibl, esm, w, h)

    def pturb_planes(args, s):
        p = dict(args[0]); p["u"] = p["u"] + s
        return (p,) + args[1:]

    gpl, mask = jax.jit(asm)(planes)
    chain_time(asm, pturb_planes, planes, name="gplane assembly (mat+env+sf)")

    # ---- SSAO
    from datum_tpu.ops.ssao import hbao, make_hbao_params
    from datum_tpu.ops.blur import downsample_pool, resize_up_dense

    def aof(planes_):
        dec = max(int(round(1.0 / cfg.ssao_scale)), 1)
        dd = downsample_pool(planes_["depth"], dec, reduce="first")
        nn = jnp.stack([downsample_pool(planes_["nx"], dec, reduce="first"),
                        downsample_pool(planes_["ny"], dec, reduce="first"),
                        downsample_pool(planes_["nz"], dec, reduce="first")],
                       -1)
        from datum_tpu.ops import brdf
        nn = brdf.normalize(nn) * 0.5 + 0.5
        ao = hbao(dd, nn, ss["proj"], ss["view"], params=make_hbao_params())
        return 1.0 + (resize_up_dense(ao[..., 0], h, w) - 1.0)
    ao_img = jax.jit(aof)(planes)
    chain_time(aof, pturb_planes, planes, name="SSAO (hbao+blur+upsample)")

    # ---- fog volume + planes
    from datum_tpu.ops import fog as fog_ops

    def fogf(depth_):
        vol = fog_ops.build_fog_volume(ss, proj=ss["proj"],
                                       invview=ss["invview"], shadow=esm,
                                       depth_range=cfg.fog_depth_range)
        return fog_ops.fog_planes(depth_, vol, ss["proj"],
                                  depth_range=cfg.fog_depth_range)
    fpl = jax.jit(fogf)(planes["depth"])
    chain_time(fogf, pturb0, planes["depth"], name="fog volume build+planes")

    # ---- OIT particles raster
    fwd = draws["forward"]
    viewproj = (ss["proj"] @ ss["view"]).astype(jnp.float32)
    ftris = jnp.asarray(RenderList.quad_triangles(cfg.max_particle_quads))

    def oitf(depth_):
        fclip = fwd["positions"] @ viewproj[:, :3].T + viewproj[:, 3]
        tvalid = jnp.arange(ftris.shape[0]) < fwd["quad_count"] * 2
        fsetup = R.triangle_setup(fclip, ftris, w, h, tx, ty,
                                  tri_valid=tvalid)
        fbins, fcounts, fbig = R.bin_triangles(
            fsetup, ftris.shape[0], tx, ty, cfg.bin_capacity,
            cfg.big_capacity)
        return raster_blend_pallas(fsetup, fbins, fbig, fcounts, ftris,
                                   fwd["uv"], fwd["color"], depth_,
                                   tx, ty, w, h, planes=True)
    oit5 = jax.jit(oitf)(planes["depth"])
    chain_time(oitf, pturb0, planes["depth"], name="particles OIT raster")

    # ---- megakernel (with full epilogue planes)
    from datum_tpu.ops.shade_pallas import shade_deferred_pallas
    from datum_tpu.ops.sampling import sample_cubemap_lod_quad
    from datum_tpu.ops.lighting_pass import view_ray_grid, _inv_proj

    gpl_full = dict(gpl)
    rx, ry = view_ray_grid(_inv_proj(ss["proj"]), w, h)
    rays = jnp.stack([rx, ry, -jnp.ones_like(rx)], -1) @ ss["invview"][:3, :3].T
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    rays_q = downsample_pool(rays, 4)
    sky_q = sample_cubemap_lod_quad(ibl["flatq"], rays_q,
                                    jnp.zeros(rays_q.shape[:-1]))[..., :3]
    sky_q = jnp.transpose(sky_q, (2, 0, 1))
    for c, ch in enumerate("rgb"):
        gpl_full[f"sky_{ch}"] = resize_up_dense(sky_q[c], h, w)
    gpl_full["fog_r"], gpl_full["fog_g"], gpl_full["fog_b"], \
        gpl_full["fog_t"] = fpl
    (gpl_full["oit_r"], gpl_full["oit_g"], gpl_full["oit_b"],
     gpl_full["oit_w"], gpl_full["oit_rev"]) = oit5
    ss2 = dict(ss)
    ss2["_sh"] = ibl["sh"]
    spotsf = jnp.ones((1, h, w), jnp.float32)

    def mk(gpl_):
        out = shade_deferred_pallas(gpl_, ss2, proj=ss["proj"],
                                    invview=ss["invview"], ao=ao_img,
                                    spotsf=spotsf)
        # reduce to keep XLA from scoping the kernel outputs onto the
        # vmem stack (standalone jit puts unconsumed pallas outputs in
        # S(1) and trips the 16M scoped limit)
        return out.mean(), out

    def pturb_gpl(args, s):
        g = dict(args[0]); g["depth"] = g["depth"] + s
        return (g,) + args[1:]

    try:
        _, hdr = jax.jit(mk)(gpl_full)
    except Exception:
        hdr = jnp.abs(jnp.stack([gpl_full["dr"], gpl_full["dg"],
                                 gpl_full["db"]], -1)) + 0.1
    chain_time(mk, pturb_gpl, gpl_full, k=6, unroll=True,
               name="shade megakernel (+epilogue)")

    # ---- whole mid-frame block: _shade_with_kernel (gplane assembly +
    # decals + SSAO + spot + fog planes + lit translucent layer + OIT
    # accumulation + megakernel w/ epilogue) — the honest aggregate
    def swk(planes_):
        hdr_, mask_, gb_, _ = F._shade_with_kernel(
            cfg, planes_, device, ss, draws, ibl, esm, wp, ex, w, h)
        return hdr_.mean(), hdr_
    chain_time(swk, pturb_planes, planes, k=6, unroll=True,
               name="_shade_with_kernel TOTAL")

    # ---- spot factor planes
    def sff(depth_):
        sesm = build_spot_esm(spotmaps)
        return resize_up_dense(
            spot_factor_quarter_parabolic(
                depth_, sesm[0], sl_["view"][0], sl_["attenuation"][0, 3],
                proj=ss["proj"], invview=ss["invview"]), h, w)
    chain_time(sff, pturb0, planes["depth"], name="spot ESM+factor plane")

    # ---- SSR
    from datum_tpu.ops.ssr2 import ssr_binned
    sn3 = jnp.stack([gpl["nx"], gpl["ny"], gpl["nz"]], -1)
    spec4 = jnp.stack([gpl["sr"], gpl["sg"], gpl["sb"], gpl["rgh"]], -1)

    def ssrf(hdr_):
        q = 4
        ssr_q = ssr_binned(
            downsample_pool(hdr_, q),
            downsample_pool(planes["depth"], q, reduce="first"),
            downsample_pool(sn3, q, reduce="first"),
            downsample_pool(spec4[..., :3], q),
            downsample_pool(spec4[..., 3], q, reduce="first"),
            downsample_pool(mask.astype(jnp.float32), q) > 0.5,
            ss["proj"], ss["view"], envbrdf_lut=ibl["envbrdf"])
        return resize_up_dense(ssr_q, h, w)
    ssr_img = jax.jit(ssrf)(hdr)
    chain_time(ssrf, pturb0, hdr, name="SSR binned march")

    # ---- bloom
    from datum_tpu.ops.bloom import bloom as bloom_op
    chain_time(lambda h_: bloom_op(h_, 1.0), pturb0, hdr, name="bloom")

    # ---- composite + grade + u8 + luminance
    from datum_tpu.ops import composite as C

    def post(hdr_):
        lum_w = jnp.array([0.2126, 0.7152, 0.0722], jnp.float32)
        lum = jnp.exp(jnp.mean(jnp.log(1e-4 + hdr_[:cfg.height, :cfg.width]
                                       @ lum_w)))
        rgb = C.composite(hdr_, 1.0, bloom=None, ssr=ssr_img,
                          lut=device.get("colorlut"))
        return C.to_u8_image(rgb[:cfg.height, :cfg.width]), lum
    chain_time(post, pturb0, hdr, name="luminance+composite+grade+u8")

    # ---- FULL FRAME
    def ff(d, ss_):
        out = F.render_frame(cfg, device, d, ss_)
        return out["luminance"]

    def pturb_ff(args, s):
        ss_ = dict(args[1]); cam = dict(ss_["camera"])
        cam["exposure"] = cam["exposure"] * (1.0 + s)
        ss_["camera"] = cam
        return (args[0], ss_)
    chain_time(ff, pturb_ff, draws, ss, k=6, unroll=True,
               name="FULL FRAME")


if __name__ == "__main__":
    main()
