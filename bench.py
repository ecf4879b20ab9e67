"""Benchmark: flagship datumtest scene, steady-state frame time on TPU.

North star (BASELINE.md): < 16 ms/frame at 1920x1080 on one TPU v5e.
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = 16ms / measured (>1 means faster than the target).

FULL pipeline, matching the reference's unconditional per-frame dispatch
list (reference: renderer.cpp:6548-6752): environment IBL, 4-cascade ESM
sun shadows, 8 point lights, one shadowed spot, SSAO, volumetric fog,
SSR, particles (OIT), a lit glass sphere + shallow water pool
(translucent layer with depth-aware transmission + refraction), two
floor decals, material maps with mipped filtering, bloom,
tonemap + grading.  Asserts zero raster bin overflow.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np


def main():
    import os
    import sys
    import threading

    # the axon plugin ignores the JAX_PLATFORMS env var — honor it here
    # so CPU smoke-runs (DATUM_BENCH_W/H/N overrides) never touch the
    # tunnel
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # fail FAST if the device is unreachable or hangs mid-run (the axon
    # tunnel can hang indefinitely on backend init OR on any dispatch —
    # a silent hang eats the driver's whole bench budget; an explicit
    # error line does not).  Each phase re-arms the deadline.
    state = {"deadline": time.monotonic() + 240, "phase": "backend init"}

    def _watchdog():
        while True:
            wait = state["deadline"] - time.monotonic()
            if wait <= 0:
                print(json.dumps({
                    "metric": "datumtest_full_frame_time_1080p",
                    "value": -1.0, "unit": "ms", "vs_baseline": 0.0,
                    "error": f"device hang during {state['phase']}"}))
                sys.stdout.flush()
                os._exit(3)
            threading.Event().wait(min(wait, 10.0))

    def _arm(phase, seconds):
        state["phase"] = phase
        state["deadline"] = time.monotonic() + seconds

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax.numpy as _jnp
    jax.block_until_ready(_jnp.ones((8, 8)) @ _jnp.ones((8, 8)))
    # one REAL scalar readback up front: on the axon tunnel,
    # block_until_ready returns before the device finishes, and the
    # session's FIRST host readback can carry 60-90 s of one-time
    # channel setup (degraded periods: minutes).  Absorb it here under
    # its own generous deadline so later phases time only their own
    # work.
    _arm("session warmup readback", 900)
    _ = float((_jnp.ones((8, 8)) @ _jnp.ones((8, 8)))[0, 0])
    _arm("scene build", 900)

    from datum_tpu.scenes import datumtest_scene
    from datum_tpu.render import frame as frame_mod
    from datum_tpu.render.types import make_sceneset
    from datum_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    # debug overrides: DATUM_BENCH_W/H/N + JAX_PLATFORMS=cpu let the
    # whole chain smoke-run on CPU at a tiny config (logic check only —
    # never a perf number)
    W = int(os.environ.get("DATUM_BENCH_W", 1920))
    H = int(os.environ.get("DATUM_BENCH_H", 1088))

    # DATUM_BENCH_DOF=1: A/B the depth-of-field pass (a config toggle in
    # the reference too — camera.focalwidth drives it); the measured
    # delta is recorded in PERF.md
    dof = bool(int(os.environ.get("DATUM_BENCH_DOF", "0")))
    ctx, camera, params, make_rl = datumtest_scene(
        width=W, height=H, sphere_detail=24, n_point_lights=8,
        enable_depth_of_field=dof,
        max_vertices=1 << 15, max_triangles=1 << 15,
        # the tuned capacity is for the 1080p tile count; debug sizes
        # auto-size (deep bins where tiles are few, FrameConfig rule)
        bin_capacity=160 if (W, H) == (1920, 1088) else None,
        big_capacity=64, bin_max_span=8,
        use_pallas=True, shadow_factor_scale=4,
        enable_material_maps=True, texture_filter="mip_half",
        enable_ssao=True, enable_fog=True, enable_ssr=True,
        max_spot_shadows=1, max_particle_quads=512,
        max_translucent_draws=2, max_translucent_tris=2048,
        max_decals_active=2, decal_textures=False,
        translucent_lit_scale=2, shadow_far_res=512,
        # cascade-boundary blend (reference lighting.comp:63-95 always
        # blends); pair-packed ESM rows make it gather-neutral, see
        # ops/shadow.py build_esm_pair
        shadow_slice_blend=0.25,
        # fog taps at 8x stride (FrameConfig default is 4): the 160x90
        # froxel grid spans ~12 px/cell at 1080p so 8x still Nyquist-
        # covers it, but reduce='first' depth subsampling over 8x8
        # blocks does coarsen fog halos at depth edges — the bench
        # measures this reduced-quality fog-tap setting (4x costs
        # ~+2.6 ms, ops/common.py note)
        fog_sample_scale=8,
        # CPU smoke-runs execute the Pallas kernels in interpret mode
        pallas_interpret=(os.environ.get("JAX_PLATFORMS") == "cpu"))
    if dof:
        camera.set_depth_of_field(4.0, 14.0)   # focus on the sphere wall
    device = jax.device_put(ctx.device_state())

    def frame_inputs(t):
        rl = make_rl(t)
        sceneset = make_sceneset(camera, params, point_lights=rl.point_lights,
                                 spot_lights=rl.spot_lights)
        draws = rl.draw_arrays(ctx.config.max_instances, ctx.default_material)
        ctx.expand_host(draws)
        draws["forward"] = rl.forward_arrays(ctx.config.max_particle_quads,
                                             camera)
        draws["translucent"] = rl.translucent_arrays(
            ctx.config.max_translucent_draws, ctx.default_material)
        draws["decals"] = rl.decal_arrays(ctx.config.max_decals_active)
        return draws, sceneset

    # bin-overflow guard via a tiny dedicated jit (setup + binning only):
    # compiling the full frame twice (standalone warmup + the chain
    # below) roughly doubles cold-start wall time for no extra signal
    cfg = ctx.config
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def bin_overflow_of(device, draws, sceneset):
        geom, ex, uv, clip, *_ = frame_mod._vertex_stage(
            cfg, device, draws, sceneset)
        import jax.numpy as jnp
        setup = frame_mod.raster_ops.triangle_setup(
            clip, ex["tris"], cfg.padded_width, cfg.padded_height,
            cfg.tiles_x, cfg.tiles_y, cull=-1 if cfg.backface_cull else 0,
            max_span=cfg.bin_max_span)
        prio = setup["zbound"]
        *_, overflow = frame_mod.raster_ops.bin_triangles(
            setup, cfg.max_triangles, cfg.tiles_x, cfg.tiles_y,
            cfg.bin_capacity, cfg.big_capacity, max_span=cfg.bin_max_span,
            return_overflow=True, depth_prio=prio)
        return overflow

    _arm("bin-overflow guard", 900)
    for i in range(3):
        draws, sceneset = frame_inputs(0.1 * i)
        ov = int(bin_overflow_of(device, draws, sceneset))
        assert ov == 0, (f"raster bin overflow {ov} — raise "
                         "bin_capacity/bin_max_span")

    # steady state THROUGHPUT: N frames with varying inputs, chained by a
    # real data dependency (frame i's luminance perturbs frame i+1's
    # exposure by 1e-12, numerically nil but not DCE-able), one readback
    # at the end.  This measures per-frame device time the way a game
    # loop on a locally-attached device experiences it.  Two tunnel
    # artifacts are amortized: the ~24 ms readback fence (one per chain)
    # and the ~4-7 ms PER-EXECUTE dispatch RPC (measured: a trivial
    # one-scalar jit costs 3.7 ms/call through the tunnel;
    # profiling/exp_args) — so the chain runs as ONE executable: a
    # fori_loop whose body renders frame i from pre-stacked device
    # inputs (dynamic_index keeps every pass live each iteration — no
    # loop-invariant hoisting; the body compiles ONCE, so compile time
    # is independent of N).  The carry folds in a full-image mean so
    # the post chain (SSR/bloom/composite/u8) cannot be DCE'd, and the
    # luminance->exposure dependency serializes the frames.
    # N=30: the chain's fixed tunnel costs (one ~4-7 ms dispatch RPC +
    # one ~24 ms readback fence) amortize to <1 ms/frame; compile time
    # is independent of N (the fori_loop body compiles once) and the
    # stacked inputs stay far under HBM (~8 MB/frame of draw arrays)
    N = int(os.environ.get("DATUM_BENCH_N", 30))
    import jax.numpy as jnp
    inputs = [frame_inputs(0.3 + 0.05 * i) for i in range(N)]
    stacked = jax.device_put(
        jax.tree_util.tree_map(lambda *xs: np.stack(xs), *inputs))

    import functools

    @functools.partial(jax.jit, donate_argnums=())
    def run_chain(stacked, device, lum0):
        def body(i, lum):
            draws_i, ss_i = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, i, 0,
                                                       keepdims=False),
                stacked)
            ss_i = dict(ss_i)
            cam = dict(ss_i["camera"])
            cam["exposure"] = cam["exposure"] * (1.0 + 1e-12 * lum)
            ss_i["camera"] = cam
            out = frame_mod.render_frame(ctx.config, device, draws_i, ss_i)
            img_keep = jnp.mean(out["image"].astype(jnp.float32))
            return out["luminance"] + 1e-9 * img_keep
        return jax.lax.fori_loop(0, N, body, lum0)

    _arm("chain compile + warm run", 2400)
    lum0 = jax.device_put(np.float32(0.1))
    _ = float(run_chain(stacked, device, lum0))    # compile + warm

    if os.environ.get("DATUM_BENCH_TRACE"):
        # trace ONE timed chain and attribute device time to source
        # lines (the honest profile of exactly what the bench measures)
        _arm("trace rep", 600)
        trace_dir = "/tmp/datum_bench_trace"
        os.system(f"rm -rf {trace_dir}")
        jax.profiler.start_trace(trace_dir)
        _ = float(run_chain(stacked, device,
                            jax.device_put(np.float32(0.1 + 1e-7))))
        jax.profiler.stop_trace()
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "profiling"))
        from trace_util import report
        report(trace_dir, N)

    times = []
    for rep in range(3):
        _arm(f"timed rep {rep}", 600)
        lum0 = jax.device_put(np.float32(0.1 + 1e-6 * rep))
        t0 = time.perf_counter()
        _ = float(run_chain(stacked, device, lum0))
        times.append(time.perf_counter() - t0)
    # one dispatch + one readback round-trip amortized over N frames
    dt_ms = (float(np.median(times)) * 1000.0) / N

    print(json.dumps({
        "metric": "datumtest_full_frame_time_1080p",
        "value": round(dt_ms, 3),
        "unit": "ms",
        "vs_baseline": round(16.0 / dt_ms, 3),
    }))


if __name__ == "__main__":
    main()
