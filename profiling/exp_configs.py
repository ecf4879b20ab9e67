"""Config experiments on the bench scene: time render_frame variants.

Each variant times an N-frame python-unrolled chain (bench.py
methodology) and saves a frame PNG for visual inspection.

Run: python profiling/exp_configs.py [variant ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

N = 8

VARIANTS = {
    "base": {},
    "shadow512": dict(shadow_res=512),
    "shadow512f2": dict(shadow_res=512, shadow_factor_scale=2),
    "clusters": dict(use_light_clusters=True, tile_light_capacity=16),
    "clusters_shadow512": dict(use_light_clusters=True,
                               tile_light_capacity=16, shadow_res=512),
    "trscale2": dict(translucent_lit_scale=2),
    "trscale2_shadow512": dict(translucent_lit_scale=2, shadow_res=512),
    "no_translucent": dict(max_translucent_draws=0),
    "no_decals": dict(max_decals_active=0),
    "no_tr_no_decals": dict(max_translucent_draws=0, max_decals_active=0),
    "no_particles": dict(max_particle_quads=0),
    # round-3: mixed-res far cascades (the bench default now)
    "farres512": dict(shadow_far_res=512, translucent_lit_scale=2),
    # marginal feature costs WITH dispatch overhead (vs prof_r3's pure
    # chained-pass numbers): base-minus-variant = the honest cost
    "no_fog": dict(enable_fog=False, translucent_lit_scale=2,
                   shadow_far_res=512),
    "no_ssao": dict(enable_ssao=False, translucent_lit_scale=2,
                    shadow_far_res=512),
    "no_ssr": dict(enable_ssr=False, translucent_lit_scale=2,
                   shadow_far_res=512),
    "no_spot": dict(max_spot_shadows=0, translucent_lit_scale=2,
                    shadow_far_res=512),
    "no_shadows": dict(enable_shadows=False, translucent_lit_scale=2),
    # dispatch-floor calibration: the bare core (raster + shade +
    # sky/bloom + composite), every optional pass off
    "core_only": dict(enable_ssao=False, enable_fog=False,
                      enable_ssr=False, max_spot_shadows=0,
                      max_particle_quads=0, max_translucent_draws=0,
                      max_decals_active=0, enable_shadows=False),
}


def run_variant(name, overrides):
    from datum_tpu.scenes import datumtest_scene
    from datum_tpu.render import frame as frame_mod
    from datum_tpu.render.types import make_sceneset

    kw = dict(
        width=1920, height=1088, sphere_detail=24, n_point_lights=8,
        max_vertices=1 << 15, max_triangles=1 << 15,
        bin_capacity=160, big_capacity=64, bin_max_span=8,
        use_pallas=True, shadow_factor_scale=4,
        enable_material_maps=True, texture_filter="mip_half",
        enable_ssao=True, enable_fog=True, enable_ssr=True,
        max_spot_shadows=1, max_particle_quads=512,
        max_translucent_draws=2, max_translucent_tris=2048,
        max_decals_active=2, decal_textures=False)
    kw.update(overrides)
    ctx, camera, params, make_rl = datumtest_scene(**kw)
    device = jax.device_put(ctx.device_state())

    def frame_inputs(t):
        rl = make_rl(t)
        ss = make_sceneset(camera, params, point_lights=rl.point_lights,
                           spot_lights=rl.spot_lights)
        draws = rl.draw_arrays(ctx.config.max_instances,
                               ctx.default_material)
        ctx.expand_host(draws)
        draws["forward"] = rl.forward_arrays(ctx.config.max_particle_quads,
                                             camera)
        draws["translucent"] = rl.translucent_arrays(
            ctx.config.max_translucent_draws, ctx.default_material)
        draws["decals"] = rl.decal_arrays(ctx.config.max_decals_active)
        return draws, ss

    draws, ss = frame_inputs(0.0)
    out = frame_mod.render_frame(ctx.config, device, draws, ss)
    jax.block_until_ready(out["image"])
    ovf = int(out["bin_overflow"])

    inputs = [jax.device_put(frame_inputs(0.3 + 0.05 * i)) for i in range(N)]

    def run_chain(lum0):
        lum = lum0
        for draws_i, ss_i in inputs:
            ss_i = dict(ss_i)
            cam = dict(ss_i["camera"])
            cam["exposure"] = cam["exposure"] * (1.0 + 1e-12 * lum)
            ss_i["camera"] = cam
            o = frame_mod.render_frame(ctx.config, device, draws_i, ss_i)
            lum = o["luminance"]
        return lum

    _ = float(run_chain(np.float32(0.1)))
    times = []
    for rep in range(3):
        t0 = time.perf_counter()
        _ = float(run_chain(np.float32(0.1 + 1e-6 * rep)))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) * 1000.0 / N
    print(f"{name:24s} {dt:7.2f} ms/frame   bin_overflow={ovf}", flush=True)

    from PIL import Image
    img = np.asarray(out["image"])
    Image.fromarray(img).save(f"/tmp/exp_{name}.png")


def main():
    from datum_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        run_variant(name, VARIANTS[name])


if __name__ == "__main__":
    main()
