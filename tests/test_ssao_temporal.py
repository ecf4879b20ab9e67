"""Temporal AO reprojection (reference: data/hbao.comp:156-162 — blend
current AO toward the reprojected previous-frame value, rejecting stale
history by AO difference + view-position distance)."""

import numpy as np
import jax.numpy as jnp
import pytest

from datum_tpu.ops.common import FrameConfig
from datum_tpu.ops.ssao import hbao, make_hbao_params
from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
from datum_tpu.math import Transform


def _step_scene(h=64, w=128):
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = 1.0
    proj[1, 1] = -1.0
    proj[2, 3] = 0.1
    depth = np.full((h, w), 0.04, np.float32)
    depth[:, w // 2:] = 0.05
    normal = np.tile(np.float32([0.5, 0.5, 1.0]), (h, w, 1))
    return jnp.asarray(depth), jnp.asarray(normal), jnp.asarray(proj)


def test_temporal_static_camera_converges():
    # with an unchanged view and history == the cold result, the temporal
    # lerp is a fixed point: output must match the cold AO
    depth, normal, proj = _step_scene()
    view = jnp.eye(4)
    pr = make_hbao_params()
    cold = hbao(depth, normal, proj, view, params=pr)
    warm = hbao(depth, normal, proj, view, params=pr,
                prev_ao=cold, prevview=view, invview=jnp.eye(4))
    assert np.allclose(np.asarray(cold[..., 0]), np.asarray(warm[..., 0]),
                       atol=2e-3)


def test_temporal_blends_toward_plausible_history():
    # history that's slightly off gets blended in (stabilisation);
    # history that's wildly off is rejected (tw -> 1 keeps current AO)
    depth, normal, proj = _step_scene()
    view = jnp.eye(4)
    pr = make_hbao_params()
    cold = np.asarray(hbao(depth, normal, proj, view, params=pr))

    near = jnp.asarray(cold).at[..., 0].add(0.05)
    warm = np.asarray(hbao(depth, normal, proj, view, params=pr,
                           prev_ao=near, prevview=view,
                           invview=jnp.eye(4)))
    # output pulled toward history: the +0.05 bias survives attenuated
    bias = (warm[..., 0] - cold[..., 0]).mean()
    assert 0.02 < bias < 0.05

    far = jnp.asarray(cold).at[..., 0].set(0.0)   # black history
    rej = np.asarray(hbao(depth, normal, proj, view, params=pr,
                          prev_ao=far, prevview=view, invview=jnp.eye(4)))
    # rejected: output stays much closer to current than to history
    assert abs((rej[..., 0] - cold[..., 0]).mean()) < 0.35 * abs(
        cold[..., 0].mean())


@pytest.mark.slow
def test_frame_threads_temporal_ao_state():
    # full-frame plumbing: Context feeds frame N's ao_prev into frame
    # N+1; a static camera re-render stays (near-)identical
    cfg = FrameConfig(width=256, height=128, max_vertices=1024,
                      max_triangles=1024, max_instances=8, bin_capacity=64,
                      big_capacity=8, enable_shadows=False, enable_ssao=True,
                      ssao_temporal=True, enable_ssr=False,
                      enable_bloom=False)
    ctx = RenderContext(cfg)
    mesh = ctx.add_mesh(
        dict(position=np.array([[-1.5, -1, 0], [1.5, -1, 0], [0, 1.5, 0]],
                               np.float32),
             normal=np.tile([0, 0, 1.0], (3, 1))),
        np.array([0, 1, 2]))
    mat = ctx.add_material(color=(0.8, 0.8, 0.8, 1))

    cam = Camera()
    cam.set_projection(np.radians(60), cfg.width / cfg.height)
    cam.lookat(np.array([0.0, 1.0, 5.0]), np.array([0.0, 0.0, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    rl = RenderList()
    rl.push_mesh(mesh, Transform.identity(), mat)
    params = RenderParams(width=cfg.width, height=cfg.height)

    img1 = ctx.render(cam, rl, params)          # cold: prev=None
    assert getattr(ctx, "_ao_prev", None) is not None, \
        "frame did not return temporal AO state"
    rl2 = RenderList()
    rl2.push_mesh(mesh, Transform.identity(), mat)
    img2 = ctx.render(cam, rl2, params)         # warm: prev threaded
    diff = np.abs(img1.astype(np.float32) - img2.astype(np.float32))
    assert diff.mean() < 1.0, "static-camera temporal AO changed the frame"
