"""Multi-chip sharding tests on the virtual 8-device CPU mesh:
the tile-sharded frame must produce the same image as the single-device
frame graph."""

import pytest
import numpy as np
import jax

from datum_tpu.ops.common import TILE_H
from datum_tpu.parallel import make_device_mesh, render_frame_sharded
from datum_tpu.render import frame as frame_mod
from datum_tpu.render.types import make_sceneset
from datum_tpu.scenes import datumtest_scene

pytestmark = pytest.mark.slow


def _tiny_scene(n_rows):
    return datumtest_scene(
        width=128, height=TILE_H * n_rows, sphere_detail=8, grid=(2, 2),
        n_point_lights=2, max_vertices=2048, max_triangles=2048,
        max_instances=8, bin_capacity=32, big_capacity=8,
        enable_shadows=True, shadow_res=128, shadow_bin_capacity=32,
        enable_bloom=False,  # post chain needs halo exchange on shards
        skybox=False)        # sharded frame lights without the env pass


def test_sharded_matches_single_device():
    n_dev = len(jax.devices())
    assert n_dev == 8, f"conftest should give 8 cpu devices, got {n_dev}"
    ctx, camera, params, make_rl = _tiny_scene(8)
    rl = make_rl(0.0)
    sceneset = make_sceneset(camera, params, point_lights=rl.point_lights)
    draws = rl.draw_arrays(ctx.config.max_instances, ctx.default_material)
    device = ctx.device_state()

    single = frame_mod.render_frame(ctx.config, device, draws, sceneset)
    mesh = make_device_mesh(8)
    sharded = render_frame_sharded(ctx.config, mesh, device, draws, sceneset)

    img_a = np.asarray(single["image"])
    img_b = np.asarray(sharded["image"])
    assert img_a.shape == img_b.shape
    # exact since round 5: the reduced path's factor/env upsamples ride
    # all-gather-upsample-slice closures and the composite applies the
    # same grading LUT as the single-device frame (measured max diff 0;
    # <=1 leaves rounding headroom across XLA versions)
    mismatch = np.abs(img_a.astype(int) - img_b.astype(int)).max(-1)
    assert mismatch.max() <= 1, f"max diff {mismatch.max()}"
    assert (mismatch > 0).mean() < 1e-3, f"{(mismatch > 0).sum()} seam pixels"
    assert abs(float(single["luminance"]) - float(sharded["luminance"])) < 1e-3


def test_sharded_on_two_devices():
    ctx, camera, params, make_rl = _tiny_scene(4)
    rl = make_rl(0.0)
    sceneset = make_sceneset(camera, params, point_lights=rl.point_lights)
    draws = rl.draw_arrays(ctx.config.max_instances, ctx.default_material)
    mesh = make_device_mesh(2)
    out = render_frame_sharded(ctx.config, mesh, ctx.device_state(), draws, sceneset)
    img = np.asarray(out["image"])
    assert (img.max(-1) > 0).mean() > 0.05


def test_sharded_bloom_halo_exchange():
    """Bloom on shards: halo rows ride ppermute; result matches the
    single-device blur away from deep seam reach."""
    import dataclasses

    from datum_tpu.math import Transform
    from datum_tpu.render import primitives

    ctx, camera, params, make_rl = _tiny_scene(8)
    cfg = dataclasses.replace(ctx.config, enable_bloom=True, bin_capacity=128)
    qv, qi = primitives.unit_quad()
    beacon = ctx.add_mesh(qv, qi)
    glow = ctx.add_material(color=(1.0, 0.8, 0.4, 1), emissive=0.8)
    rl = make_rl(0.0)
    rl.push_mesh(beacon, Transform.translation([0, 2.0, 2.0]), glow)
    sceneset = make_sceneset(camera, params, point_lights=rl.point_lights)
    draws = rl.draw_arrays(cfg.max_instances, ctx.default_material)
    device = ctx.device_state()

    single = frame_mod.render_frame(cfg, device, draws, sceneset)
    mesh = make_device_mesh(8)
    sharded = render_frame_sharded(cfg, mesh, device, draws, sceneset)
    img_a = np.asarray(single["image"]).astype(int)
    img_b = np.asarray(sharded["image"]).astype(int)

    # bloom must actually fire (otherwise this test is vacuous)
    cfg_off = dataclasses.replace(cfg, enable_bloom=False)
    base = np.asarray(frame_mod.render_frame(cfg_off, device, draws,
                                             sceneset)["image"]).astype(int)
    assert np.abs(img_a - base).max() > 8, "no bloom in the test scene"

    mismatch = np.abs(img_a - img_b).max(-1)
    assert mismatch.mean() < 1.0, f"mean diff {mismatch.mean()}"
    assert (mismatch > 12).mean() < 5e-3, \
        f"{(mismatch > 12).sum()} strong seam pixels"


def test_sharded_full_path_clustered_lights_match():
    """The FULL fast path (Pallas raster + megakernel, interpret mode)
    with clustered light lists shards bit-near-exactly: each band bins
    its own tile rows against the global tile frustum planes."""
    ctx, camera, params, make_rl = datumtest_scene(
        width=128, height=TILE_H * 4, sphere_detail=8, grid=(2, 2),
        n_point_lights=6, max_vertices=2048, max_triangles=2048,
        max_instances=8, bin_capacity=32, big_capacity=8,
        enable_shadows=True, shadow_res=128, shadow_bin_capacity=32,
        enable_bloom=False, skybox=False,
        use_pallas=True, pallas_interpret=True,
        enable_material_maps=True, texture_filter="mip",
        use_light_clusters=True, tile_light_capacity=8)
    rl = make_rl(0.0)
    sceneset = make_sceneset(camera, params, point_lights=rl.point_lights)
    draws = rl.draw_arrays(ctx.config.max_instances, ctx.default_material)
    device = ctx.device_state()

    single = frame_mod.render_frame(ctx.config, device, draws, sceneset)
    mesh = make_device_mesh(2)
    sharded = render_frame_sharded(ctx.config, mesh, device, draws,
                                   sceneset)
    img_a = np.asarray(single["image"]).astype(int)
    img_b = np.asarray(sharded["image"]).astype(int)
    assert img_a.shape == img_b.shape
    # lights must actually contribute (clusters non-empty)
    assert img_a.max() > 0
    # the full fast path has known low-amplitude band seams (the sun/
    # spot factor upsamples clamp at band edges — same tolerance as the
    # driver dryrun's parity metric); cluster binning errors would show
    # up as whole wrong TILES, not seam pixels
    mismatch = np.abs(img_a - img_b).max(-1)
    rmse = float(np.sqrt(np.mean((img_a - img_b) ** 2))) / 255.0
    assert rmse < 0.01, f"RMSE {rmse:.4f}"
    assert (mismatch > 8).mean() < 5e-3, f"{(mismatch > 8).sum()} seam px"


def test_sharded_temporal_ao_and_exact_parity():
    """Round-4 parity closures: the sharded fast path must match the
    single-device frame BIT-EXACTLY (all-gathered cross-band fields +
    global upsample closures + the mip-LOD halo row), and temporal AO
    history must thread through prev= with the same contract as
    frame.render_frame."""
    ctx, camera, params, make_rl = datumtest_scene(
        width=128, height=TILE_H * 4, sphere_detail=8, grid=(2, 2),
        n_point_lights=2, max_vertices=2048, max_triangles=2048,
        max_instances=8, bin_capacity=32, big_capacity=8,
        enable_shadows=True, shadow_res=128, shadow_bin_capacity=32,
        enable_bloom=False, skybox=False,
        use_pallas=True, pallas_interpret=True,
        enable_material_maps=True, texture_filter="mip",
        enable_ssao=True, ssao_temporal=True)
    device = ctx.device_state()
    mesh = make_device_mesh(2)

    prev_s = prev_m = None
    for t in (0.0, 0.1):
        rl = make_rl(t)
        ss = make_sceneset(camera, params, point_lights=rl.point_lights)
        draws = rl.draw_arrays(ctx.config.max_instances,
                               ctx.default_material)
        ctx.expand_host(draws)
        single = frame_mod.render_frame(ctx.config, device, draws, ss,
                                        prev=prev_s)
        sharded = render_frame_sharded(ctx.config, mesh, device, draws, ss,
                                       prev=prev_m)
        assert "ao_prev" in single and "ao_prev" in sharded
        prev_s = single["ao_prev"]
        prev_m = sharded["ao_prev"]
        img_a = np.asarray(single["image"]).astype(int)
        img_b = np.asarray(sharded["image"]).astype(int)
        assert np.abs(img_a - img_b).max() == 0, (
            f"frame t={t}: sharded image diverged "
            f"(max {np.abs(img_a - img_b).max()})")
    # the threaded history states agree too
    np.testing.assert_allclose(np.asarray(prev_s["ao"]),
                               np.asarray(prev_m["ao"]), atol=1e-6)
