"""128-light stress bench: clustered vs dense in-kernel light loops.

The datumtest scene with 128 animated point lights at 1080p — the scale
the reference's 512-light SceneSet capacities promise (reference:
test/datumtest.cpp Sponza block + renderer.cpp:226-238).
"""
import time

import jax
import numpy as np


def run(label, **kw):
    from datum_tpu.scenes import datumtest_scene
    from datum_tpu.render import frame as frame_mod
    from datum_tpu.render.types import make_sceneset

    ctx, camera, params, make_rl = datumtest_scene(
        width=1920, height=1088, sphere_detail=24, n_point_lights=128,
        max_vertices=1 << 15, max_triangles=1 << 15,
        bin_capacity=160, big_capacity=64, bin_max_span=8,
        use_pallas=True, shadow_factor_scale=4,
        enable_material_maps=True, texture_filter="mip_half", **kw)
    device = jax.device_put(ctx.device_state())

    def frame_inputs(t):
        rl = make_rl(t)
        ss = make_sceneset(camera, params, point_lights=rl.point_lights,
                           spot_lights=rl.spot_lights)
        draws = rl.draw_arrays(ctx.config.max_instances, ctx.default_material)
        ctx.expand_host(draws)
        return draws, ss

    out = frame_mod.render_frame(ctx.config, device, *frame_inputs(0.0))
    jax.block_until_ready(out["image"])
    N = 8
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
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        _ = float(run_chain(np.float32(0.1 + 1e-6 * rep)))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {float(np.median(ts)) * 1000 / N:.2f} ms/frame",
          flush=True)


def run_dense(label, **kw):
    """Sponza-class density: ~250k-triangle terrain + high-detail sphere
    wall + 128 clustered lights (reference: datumtest.cpp:175-202)."""
    from datum_tpu.scenes import stress_scene
    from datum_tpu.render import frame as frame_mod
    from datum_tpu.render.types import make_sceneset

    ctx, camera, params, make_rl = stress_scene(
        width=1920, height=1088, terrain_n=256, sphere_detail=48,
        grid=(8, 4), n_point_lights=128, use_pallas=True,
        shadow_factor_scale=4, enable_material_maps=True,
        texture_filter="mip_half", bin_max_span=8, **kw)
    device = jax.device_put(ctx.device_state())

    def frame_inputs(t):
        rl = make_rl(t)
        ss = make_sceneset(camera, params, point_lights=rl.point_lights,
                           spot_lights=rl.spot_lights)
        draws = rl.draw_arrays(ctx.config.max_instances,
                               ctx.default_material)
        ctx.expand_host(draws)
        return draws, ss

    out = frame_mod.render_frame(ctx.config, device, *frame_inputs(0.0))
    jax.block_until_ready(out["image"])
    print(f"{label}: bin_overflow {int(out['bin_overflow'])}", flush=True)
    N = 8
    inputs = [jax.device_put(frame_inputs(0.3 + 0.05 * i))
              for i in range(N)]

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
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        _ = float(run_chain(np.float32(0.1 + 1e-6 * rep)))
        ts.append(time.perf_counter() - t0)
    print(f"{label}: {float(np.median(ts)) * 1000 / N:.2f} ms/frame",
          flush=True)


if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("lights", "all"):
        run("128 lights, dense loop", use_light_clusters=False)
        run("128 lights, clustered", use_light_clusters=True,
            tile_light_capacity=64)
    if which in ("dense", "all"):
        run_dense("dense 250k tris + 128 clustered lights")
        run_dense("dense 250k tris + 128 lights, dense loop",
                  use_light_clusters=False)
