"""128-light + dense-mesh stress bench: clustered vs dense light loops.

The datumtest scene with 128 animated point lights at 1080p, and the
Sponza-class stress scene (~250k-triangle terrain + sphere wall) — the
scale the reference's 512-light SceneSet capacities promise (reference:
test/datumtest.cpp:175-202 Sponza block + renderer.cpp:226-238).

Measurement: same fori-loop chain as bench.py — ONE executable renders
N frames from stacked device inputs with a luminance->exposure
dependency serializing them and a full-image mean keeping the post
chain alive; one dispatch + one fence amortize over N.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _measure(ctx, camera, params, make_rl, label, N=8, with_spot=False):
    from datum_tpu.render import frame as frame_mod
    from datum_tpu.render.types import make_sceneset

    device = jax.device_put(ctx.device_state())

    def frame_inputs(t):
        rl = make_rl(t)
        ss = make_sceneset(camera, params, point_lights=rl.point_lights,
                          spot_lights=rl.spot_lights)
        draws = rl.draw_arrays(ctx.config.max_instances,
                               ctx.default_material)
        ctx.expand_host(draws)
        if ctx.config.max_particle_quads > 0:
            draws["forward"] = rl.forward_arrays(
                ctx.config.max_particle_quads, camera)
        if ctx.config.max_translucent_draws > 0:
            draws["translucent"] = rl.translucent_arrays(
                ctx.config.max_translucent_draws, ctx.default_material)
        if ctx.config.max_decals_active > 0:
            draws["decals"] = rl.decal_arrays(ctx.config.max_decals_active)
        return draws, ss

    d0, s0 = frame_inputs(0.0)
    out = frame_mod.render_frame(ctx.config, jax.device_put(ctx.device_state()),
                                 d0, s0)
    ov = int(out["bin_overflow"])
    jax.block_until_ready(out["image"])
    print(f"{label}: bin_overflow {ov}", flush=True)

    inputs = [frame_inputs(0.3 + 0.05 * i) for i in range(N)]
    stacked = jax.device_put(
        jax.tree_util.tree_map(lambda *xs: np.stack(xs), *inputs))

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
            o = frame_mod.render_frame(ctx.config, device, draws_i, ss_i)
            keep = jnp.mean(o["image"].astype(jnp.float32))
            return o["luminance"] + 1e-9 * keep
        return jax.lax.fori_loop(0, N, body, lum0)

    _ = float(run_chain(stacked, device, jax.device_put(np.float32(0.1))))
    ts = []
    for rep in range(3):
        lum0 = jax.device_put(np.float32(0.1 + 1e-6 * rep))
        t0 = time.perf_counter()
        _ = float(run_chain(stacked, device, lum0))
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1000 / N
    print(f"{label}: {ms:.2f} ms/frame", flush=True)
    return ms


def run(label, **kw):
    from datum_tpu.scenes import datumtest_scene

    ctx, camera, params, make_rl = datumtest_scene(
        width=1920, height=1088, sphere_detail=24, n_point_lights=128,
        max_vertices=1 << 15, max_triangles=1 << 15,
        bin_capacity=160, big_capacity=64, bin_max_span=8,
        use_pallas=True, shadow_factor_scale=4,
        enable_material_maps=True, texture_filter="mip_half", **kw)
    return _measure(ctx, camera, params, make_rl, label)


def run_dense(label, **kw):
    """Sponza-class density: ~250k-triangle terrain + high-detail sphere
    wall + 128 clustered lights (reference: datumtest.cpp:175-202).

    Deep bins (bin_capacity 768): ~250k triangles over 510 tiles
    average ~490 entries/tile — the auto-sized capacity overflowed
    49k entries at 1080p (dropped triangles).  The raster grid factor R
    self-bounds against the scoped-VMEM limit at these capacities."""
    from datum_tpu.scenes import stress_scene

    kw.setdefault("bin_capacity", 768)
    kw.setdefault("big_capacity", 128)
    ctx, camera, params, make_rl = stress_scene(
        width=1920, height=1088, terrain_n=256, sphere_detail=48,
        grid=(8, 4), n_point_lights=128, use_pallas=True,
        shadow_factor_scale=4, enable_material_maps=True,
        texture_filter="mip_half", bin_max_span=8, **kw)
    return _measure(ctx, camera, params, make_rl, label)


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from datum_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    # 768 measured 3357 overflow entries (0.86%) at 1080p dense density
    # (PERF.md round-5 stress row); 1024 is sized to absorb that tail
    cap = int(os.environ.get("DATUM_STRESS_CAP", "1024"))
    if which in ("lights", "all"):
        run("128 lights, dense loop", use_light_clusters=False)
        run("128 lights, clustered cap64", use_light_clusters=True,
            tile_light_capacity=64)
    if which in ("lights32", "all"):
        run("128 lights, clustered cap32", use_light_clusters=True,
            tile_light_capacity=32)
    if which in ("dense", "all"):
        run_dense(f"dense 250k tris + 128 clustered lights (cap {cap})",
                  bin_capacity=cap)
        run_dense("dense + early-z", raster_early_z=True, bin_capacity=cap)
    if which == "dense1":
        run_dense(f"dense 250k tris + 128 clustered lights (cap {cap})",
                  bin_capacity=cap)
