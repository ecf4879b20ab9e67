"""Mixed-resolution shadow cascades (FrameConfig.shadow_far_res).

Far cascades (2-3) cover 2-4x the near cascades' world extent, so
rendering them at half resolution is visually sub-pixel; the ESM blurs
at native res and upsamples, keeping the uniform (S, R, R) contract for
every consumer (sun factor, fog shadowing, sharded path)."""

import dataclasses as dc

import numpy as np
import pytest

from datum_tpu.scenes import datumtest_scene
from datum_tpu.render.types import make_sceneset
from datum_tpu.render import frame as frame_mod


def test_far_res_cascades_match_full_res():
    ctx, camera, params, make_rl = datumtest_scene(
        width=256, height=128, sphere_detail=10, grid=(4, 3),
        n_point_lights=4, max_vertices=1 << 13, max_triangles=1 << 13,
        max_instances=16, bin_capacity=256, big_capacity=16,
        shadow_res=256, shadow_bin_capacity=128)
    rl = make_rl(0.0)
    ss = make_sceneset(camera, params, point_lights=rl.point_lights)
    draws = rl.draw_arrays(ctx.config.max_instances, ctx.default_material)
    dev = ctx.device_state()
    base = np.asarray(frame_mod.render_frame(ctx.config, dev, draws,
                                             ss)["image"]).astype(np.float32)
    cfg2 = dc.replace(ctx.config, shadow_far_res=128)
    mixed = np.asarray(frame_mod.render_frame(cfg2, dev, draws,
                                              ss)["image"]).astype(np.float32)
    rmse = float(np.sqrt(np.mean(((base - mixed) / 255.0) ** 2)))
    assert rmse < 0.02, f"mixed-res cascades diverge: RMSE {rmse:.4f}"


@pytest.mark.slow
def test_mixed_res_esm_shapes():
    import jax.numpy as jnp

    from datum_tpu.ops.shadow import build_esm, render_shadow_cascades

    rng = np.random.RandomState(7)
    V, T = 128, 64
    wp = jnp.asarray(rng.randn(V, 3).astype(np.float32) * 3.0)
    tris = jnp.asarray(rng.randint(0, V, (T, 3)).astype(np.int32))
    # four ortho light views with growing extent
    views = []
    for s in range(4):
        r = 4.0 * (1 + s)
        m = np.diag([1.0 / r, 1.0 / r, 1.0 / 50.0, 1.0]).astype(np.float32)
        m[2, 3] = 0.5
        views.append(m)
    sv = jnp.asarray(np.stack(views))
    maps = render_shadow_cascades(wp, tris, sv, res=256, far_res=128,
                                  bin_capacity=64, big_capacity=16)
    assert isinstance(maps, list) and len(maps) == 4
    assert maps[0].shape == (256, 256) and maps[3].shape == (128, 128)
    esm, zmax, zscale = build_esm(maps, sv)
    assert esm.shape == (4, 256, 256)
    assert zmax.shape == (4,) and zscale.shape == (4,)
    assert bool(jnp.isfinite(esm).all())
