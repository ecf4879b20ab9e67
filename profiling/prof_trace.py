"""HLO-fusion-level device profile of the bench frame via jax.profiler.

Traces a few warmed bench-config frames on the real TPU, parses the
trace.json, and prints device-op durations grouped by fusion — the
honest per-op timeline (chained-jit marginal timing under-counts: XLA
hoists loop-invariant passes; see PERF.md round-3 caveat).

Run: python profiling/prof_trace.py [variant]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def main():
    from datum_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from datum_tpu.scenes import datumtest_scene
    from datum_tpu.render import frame as frame_mod
    from datum_tpu.render.types import make_sceneset

    variant = sys.argv[1] if len(sys.argv) > 1 else ""
    extra = {}
    if variant == "two_phase":
        extra = dict(raster_two_phase=True)
    elif variant == "two_phase_no_ez":
        extra = dict(raster_two_phase=True, raster_early_z=False)
    elif variant == "no_early_z":
        extra = dict(raster_early_z=False)
    elif variant == "clusters":
        extra = dict(use_light_clusters=True, tile_light_capacity=64)

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
        fog_sample_scale=8, **extra)
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
        return jax.device_put((draws, ss))

    inputs = [frame_inputs(0.3 + 0.1 * i) for i in range(3)]
    # warm every specialization
    for d, s in inputs:
        out = frame_mod.render_frame(ctx.config, device, d, s)
    jax.block_until_ready(out["image"])

    trace_dir = "/tmp/datum_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for d, s in inputs:
        out = frame_mod.render_frame(ctx.config, device, d, s)
    print("lum", float(out["luminance"]))     # fence inside the trace
    jax.profiler.stop_trace()

    from trace_util import report
    report(trace_dir, len(inputs))


if __name__ == "__main__":
    main()
