"""Shadow pipeline breakdown: setup vs sort vs depth kernel."""
import time
import numpy as np
import jax
import jax.numpy as jnp

K = 16
FENCE = 0.0


def t_ms(fn, *args, k=K, name=""):
    def chained(args):
        def body(i, carry):
            args, acc = carry
            out = fn(*args)
            s = jax.tree_util.tree_leaves(out)[0].ravel()[0].astype(jnp.float32)
            newargs = jax.tree_util.tree_map(
                lambda a: (a + s * 1e-20
                           if jnp.issubdtype(a.dtype, jnp.floating) else a),
                args)
            return newargs, acc + s
        _, acc = jax.lax.fori_loop(0, k, body, (args, jnp.float32(0.0)))
        return acc
    cf = jax.jit(chained)
    float(cf(args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(cf(args)); ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {(float(np.median(ts)) * 1000 - FENCE) / k:8.2f} ms/it", flush=True)


def main():
    global FENCE
    f = jax.jit(lambda x: x + 1.0); x0 = jnp.float32(0.0); float(f(x0))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); float(f(x0)); ts.append(time.perf_counter() - t0)
    FENCE = float(np.median(ts)) * 1000
    print(f"fence {FENCE:.1f}")

    from datum_tpu.scenes import datumtest_scene
    from datum_tpu.render.types import make_sceneset
    from datum_tpu.render.frame import expand_draws
    from datum_tpu.ops import raster as R
    from datum_tpu.ops.geometry import transform_vertices_rigid
    from datum_tpu.ops.raster_pallas import raster_depth_pallas

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

    def wpf(d, ss):
        ex = expand_draws(geom, d["mesh"], d["count"], cfg.max_vertices,
                          cfg.max_triangles)
        p = geom["positions"][ex["src_v"]]
        vp = (ss["proj"] @ ss["view"]).astype(jnp.float32)
        _, _, _, wp = transform_vertices_rigid(
            p, geom["normals"][ex["src_v"]], geom["tangents"][ex["src_v"]],
            ex["vtx_draw"], d["world"], vp)
        return wp, ex["tris"]
    wp, tris = jax.jit(wpf)(draws, ss)
    sv = ss["mainlight"]["shadowview"]

    res = cfg.shadow_res
    n_slices = 4
    tiles_x = res // R.TILE_W
    tiles_y = (res * n_slices) // R.TILE_H
    vh = res * n_slices
    V = wp.shape[0]
    T = tris.shape[0]

    def setupf(wp):
        clips = []
        for s in range(n_slices):
            m = sv[s]
            c = wp @ m[:, :3].T + m[:, 3]
            y = (c[:, 1] + (2.0 * s - (n_slices - 1)) * c[:, 3]) * (1.0 / n_slices)
            clips.append(jnp.stack([c[:, 0], y, c[:, 2], c[:, 3]], -1))
        clip_all = jnp.concatenate(clips, axis=0)
        tris_all = jnp.concatenate([tris + s * V for s in range(n_slices)], axis=0)
        setup = R.triangle_setup(clip_all, tris_all, res, vh, tiles_x, tiles_y,
                                 cull=-1, max_span=4)
        band = jnp.arange(n_slices * T, dtype=jnp.int32) // T
        band_lo = -1.0 + band.astype(jnp.float32) * (2.0 / n_slices)
        setup["ylim"] = jnp.stack([band_lo, band_lo + 2.0 / n_slices], -1)
        return setup
    setup = jax.jit(setupf)(wp)
    t_ms(setupf, wp, name="shadow setup (4x transform + setup)")

    def binf(setup):
        return R.bin_triangles(setup, n_slices * T, tiles_x, tiles_y,
                               cfg.shadow_bin_capacity, cfg.big_capacity,
                               max_span=4,
                               depth_prio=jnp.clip(setup["zc"].max(axis=1), 0., 1.))
    def binargs(setup):
        return (setup,)
    bins, counts, big = jax.jit(binf)(setup)
    def binf2(zc, setup):
        s2 = dict(setup); s2["zc"] = zc
        return R.bin_triangles(s2, n_slices * T, tiles_x, tiles_y,
                               cfg.shadow_bin_capacity, cfg.big_capacity,
                               max_span=4,
                               depth_prio=jnp.clip(zc.max(axis=1), 0., 1.))
    t_ms(binf2, setup["zc"], setup, name="shadow bin+sort (524k keys)")

    def kern(setup, bins, big, counts):
        return raster_depth_pallas(setup, bins, big, counts, tiles_x, tiles_y,
                                   res, vh)
    def kern2(zc, setup, bins, big, counts):
        s2 = dict(setup); s2["zc"] = zc
        return raster_depth_pallas(s2, bins, big, counts, tiles_x, tiles_y,
                                   res, vh)
    _ = jax.jit(kern)(setup, bins, big, counts)
    t_ms(kern2, setup["zc"], setup, bins, big, counts,
         name="shadow depth kernel (4Mpx)")

    from datum_tpu.ops.shadow import build_esm
    raw = jax.jit(lambda wp: __import__("datum_tpu.ops.shadow", fromlist=["x"])
                  .render_shadow_cascades(wp, tris, sv, res=res,
                                          bin_capacity=cfg.shadow_bin_capacity,
                                          big_capacity=cfg.big_capacity,
                                          use_pallas=True))(wp)
    t_ms(lambda r: build_esm(r, sv), raw, name="build_esm")


if __name__ == "__main__":
    main()
