#!/usr/bin/env python
"""Render the megakernel-path golden frame (interpret mode, CPU).

The committed goldens for the examples all render the XLA/CPU path; this
frame locks the FAST path instead — Pallas visibility raster + deferred-
shade megakernel with the full bench feature set (clustered lights,
shadowed spot, SSAO, volumetric fog, SSR, OIT particles, lit translucent
glass + water at half res, decals) in interpret mode, so a megakernel
visual regression fails CI without TPU hardware (VERDICT r2: the round-1
blocky-shadow class of bug was invisible to unit RMSE tests).

Usage: python -m datum_tpu.tools.megakernel_golden out.png
"""

from __future__ import annotations

import numpy as np


def render_megakernel_frame():
    """Returns the (H, W, 3) u8 frame of the fast-path golden config."""
    from datum_tpu.render import frame as frame_mod
    from datum_tpu.render.types import make_sceneset
    from datum_tpu.scenes import datumtest_scene
    from datum_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    ctx, camera, params, make_rl = datumtest_scene(
        width=256, height=128, sphere_detail=8, grid=(3, 2),
        n_point_lights=4, skybox=True, skybox_size=16,
        max_vertices=4096, max_triangles=4096,
        max_instances=16, bin_capacity=128, big_capacity=32,
        use_pallas=True, pallas_interpret=True,
        enable_material_maps=True, texture_filter="mip_half",
        enable_ssao=True, enable_fog=True, enable_ssr=True,
        enable_shadows=True, shadow_res=128, shadow_bin_capacity=128,
        max_spot_shadows=1, spot_shadow_res=128,
        max_particle_quads=64, max_translucent_draws=2,
        max_translucent_tris=1024, max_decals_active=2,
        use_light_clusters=True, translucent_lit_scale=2)
    rl = make_rl(0.0)
    sceneset = make_sceneset(camera, params, point_lights=rl.point_lights,
                             spot_lights=rl.spot_lights)
    cfg = ctx.config
    draws = rl.draw_arrays(cfg.max_instances, ctx.default_material)
    ctx.expand_host(draws)
    draws["forward"] = rl.forward_arrays(cfg.max_particle_quads, camera)
    draws["translucent"] = rl.translucent_arrays(
        cfg.max_translucent_draws, ctx.default_material)
    draws["decals"] = rl.decal_arrays(cfg.max_decals_active)
    out = frame_mod.render_frame(cfg, ctx.device_state(), draws, sceneset)
    assert int(out["bin_overflow"]) == 0
    return np.asarray(out["image"])


def main(out_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from PIL import Image

    img = render_megakernel_frame()
    Image.fromarray(img).save(out_path)
    print(f"saved {out_path} {img.shape}")


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "megakernel.png")
