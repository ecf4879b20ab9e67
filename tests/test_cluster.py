"""Clustered light binning: lists match brute-force containment, and the
clustered frame matches the dense-loop frame."""

import pytest
import numpy as np
import jax.numpy as jnp

from datum_tpu.ops.cluster import bin_lights, tile_frustum_planes
from datum_tpu.math.matrix import perspective_proj
from datum_tpu.render import Camera

pytestmark = pytest.mark.slow


def _setup(n_lights=32, seed=0):
    rng = np.random.RandomState(seed)
    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 3, 12]), np.array([0.0, 0, 0]), np.array([0.0, 1, 0]))
    pos = rng.uniform([-10, 0, -8], [10, 5, 8], (n_lights, 3)).astype(np.float32)
    rng_ = rng.uniform(1.0, 4.0, n_lights).astype(np.float32)
    return cam, pos, rng_


def test_onscreen_light_is_in_its_tile():
    cam, _, _ = _setup()
    # a light exactly at the view center, small range
    pos = np.array([[0, 0, 0.0]], np.float32)
    rng_ = np.array([1.0], np.float32)
    lists, counts = bin_lights(jnp.asarray(pos), jnp.asarray(rng_), jnp.int32(1),
                               jnp.asarray(cam.view()), jnp.asarray(cam.proj()),
                               4, 8, 512, 256, 8)
    lists, counts = np.asarray(lists), np.asarray(counts)
    assert counts.sum() > 0
    # centre tiles contain it
    assert (lists == 0).any()


def test_offscreen_light_binned_nowhere():
    cam, _, _ = _setup()
    pos = np.array([[0, 0, 40.0]], np.float32)   # behind camera
    rng_ = np.array([2.0], np.float32)
    lists, counts = bin_lights(jnp.asarray(pos), jnp.asarray(rng_), jnp.int32(1),
                               jnp.asarray(cam.view()), jnp.asarray(cam.proj()),
                               4, 8, 512, 256, 8)
    assert np.asarray(counts).sum() == 0


def test_clustered_frame_matches_dense():
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import RenderContext, RenderList, RenderParams
    from datum_tpu.render import primitives
    from datum_tpu.math import Transform

    imgs = {}
    for use_cluster in (False, True):
        cfg = FrameConfig(width=256, height=128, max_vertices=2048,
                          max_triangles=2048, max_instances=4, bin_capacity=64,
                          big_capacity=8, enable_shadows=False,
                          use_light_clusters=use_cluster, tile_light_capacity=16)
        ctx = RenderContext(cfg)
        pv, pi = primitives.plane(10.0)
        floor = ctx.add_mesh(pv, pi)
        mat = ctx.add_material(color=(0.8, 0.8, 0.8, 1))
        cam, pos, rng_ = _setup()
        rl = RenderList()
        rl.push_mesh(floor, Transform.identity(), mat)
        rng2 = np.random.RandomState(7)
        for i in range(12):
            rl.push_pointlight(rng2.uniform([-8, 0.5, -6], [8, 2, 6]),
                               rng2.uniform(2, 10, 3), (1.0, 0.0, 1.0),
                               range_=6.0)
        params = RenderParams(width=256, height=128)
        params.sunintensity = np.zeros(3, np.float32)
        params.ambientintensity = 0.02
        imgs[use_cluster] = ctx.render(cam, rl, params).astype(np.float32)

    a, b = imgs[False], imgs[True]
    assert a.max() > 5
    diff = np.abs(a - b)
    assert diff.max() <= 2, f"cluster path diverges: max diff {diff.max()}"


def test_kernel_clustered_matches_dense_128_lights():
    """Megakernel clustered lighting (per-sub-tile lists, depth-bounds
    culled) matches the dense in-kernel loop on a 128-light scene: the
    range falloff zeroes every culled light exactly."""
    import functools
    import numpy as np
    import datum_tpu.ops.raster_pallas as rp
    import datum_tpu.ops.shade_pallas as sp
    from datum_tpu.scenes import datumtest_scene
    from datum_tpu.render import frame as frame_mod
    from datum_tpu.render.types import make_sceneset

    imgs = {}
    if True:
        for clustered in (True, False):
            ctx, camera, params, make_rl = datumtest_scene(
                width=256, height=128, sphere_detail=8, grid=(4, 3),
                n_point_lights=128, max_vertices=8192, max_triangles=8192,
                max_instances=32, bin_capacity=64, big_capacity=16,
                use_pallas=True, enable_material_maps=True,
                texture_filter="mip_half", skybox=False,
                enable_shadows=False,
                use_light_clusters=clustered, tile_light_capacity=128,
                pallas_interpret=True)
            rl = make_rl(0.0)
            ss = make_sceneset(camera, params,
                               point_lights=rl.point_lights,
                               spot_lights=rl.spot_lights)
            draws = rl.draw_arrays(ctx.config.max_instances,
                                   ctx.default_material)
            ctx.expand_host(draws)
            out = frame_mod.render_frame(ctx.config, ctx.device_state(),
                                         draws, ss)
            imgs[clustered] = np.asarray(out["image"]).astype(np.float32)

    d = np.abs(imgs[True] - imgs[False])
    assert d.mean() < 0.5 and d.max() <= 2.0, (d.mean(), d.max())
    # the lights must actually contribute (not a black-frame vacuous pass)
    assert imgs[True].mean() > 10
