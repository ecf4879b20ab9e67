"""Capture the full-res datumtest frame ON TPU and gate it vs the
committed artifact.

Round-5 verdict item: the golden images are 320x160 CPU renders and the
bench only checks scalars — no full-res frame rendered on the real chip
is committed anywhere, so TPU-vs-CPU lowering divergences (e.g. bf16
dot_general defaults) have no numeric gate.  This renders ONE
1920x1088 frame with the bench feature set (the reference's
unconditional dispatch list), writes
tests/golden/datumtest_1080_tpu.png, and — when the artifact already
exists — asserts RMSE < 0.01 against it.

Usage:
    python profiling/capture_frame.py            # capture + gate
    DATUM_CAPTURE_UPDATE=1 python profiling/capture_frame.py  # re-bless

Eyeball target: /root/reference/bin/datumtest.png (the reference's own
golden screenshot, README.md:24) — same sphere wall / shadows / fog /
bloom composition; per-feature visual parity notes live in PARITY.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from datum_tpu.render.types import make_sceneset
    from datum_tpu.render import frame as frame_mod
    from datum_tpu.scenes import datumtest_scene
    from datum_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    # the bench config (bench.py) — the full unconditional pass set
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
        translucent_lit_scale=2, shadow_far_res=512,
        shadow_slice_blend=0.25, fog_sample_scale=8)
    rl = make_rl(0.5)
    sceneset = make_sceneset(camera, params, point_lights=rl.point_lights,
                             spot_lights=rl.spot_lights)
    draws = rl.draw_arrays(ctx.config.max_instances, ctx.default_material)
    ctx.expand_host(draws)
    draws["forward"] = rl.forward_arrays(ctx.config.max_particle_quads,
                                         camera)
    draws["translucent"] = rl.translucent_arrays(
        ctx.config.max_translucent_draws, ctx.default_material)
    draws["decals"] = rl.decal_arrays(ctx.config.max_decals_active)
    device = jax.device_put(ctx.device_state())

    out = frame_mod.render_frame(ctx.config, device, draws, sceneset)
    img = np.asarray(out["image"])[:1080]
    print(f"device: {jax.devices()[0].platform}; "
          f"frame {img.shape}, luminance {float(out['luminance']):.4f}, "
          f"bin_overflow {int(out['bin_overflow'])}")
    assert int(out["bin_overflow"]) == 0

    from PIL import Image
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden",
        "datumtest_1080_tpu.png")
    if os.path.exists(path) and not os.environ.get("DATUM_CAPTURE_UPDATE"):
        ref = np.asarray(Image.open(path).convert("RGB"))
        rmse = float(np.sqrt(np.mean(
            (img.astype(np.float32) / 255.0
             - ref.astype(np.float32) / 255.0) ** 2)))
        print(f"RMSE vs committed artifact: {rmse:.5f}")
        assert rmse < 0.01, f"full-res TPU frame drifted: RMSE {rmse}"
    else:
        Image.fromarray(img).save(path)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
