"""Post-processing chain: SSR, SSAO, bloom, DoF, LUT grading wired
through the frame."""

import numpy as np
import pytest

from datum_tpu.math import Transform
from datum_tpu.ops.common import FrameConfig
from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
from datum_tpu.render import primitives


def _scene(cfg):
    ctx = RenderContext(cfg)
    pv, pi = primitives.plane(12.0)
    floor = ctx.add_mesh(pv, pi)
    sv, si = primitives.unit_sphere(12, 6)
    sphere = ctx.add_mesh(sv, si)
    shiny = ctx.add_material(color=(0.9, 0.3, 0.2, 1), metalness=0.6, roughness=0.1)
    fmat = ctx.add_material(color=(0.5, 0.5, 0.55, 1), roughness=0.15,
                            reflectivity=0.9)
    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 3.0, 8.0]), np.array([0.0, 0.5, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=cfg.width, height=cfg.height)
    params.sundirection = np.array([-0.4, -0.8, -0.4], np.float32)
    params.sundirection /= np.linalg.norm(params.sundirection)
    params.sunintensity = np.array([30.0, 29.0, 28.0], np.float32)
    rl = RenderList()
    rl.push_mesh(floor, Transform.identity(), fmat)
    rl.push_mesh(sphere, Transform.translation([0, 1.0, 0]), shiny)
    return ctx, cam, params, rl


BASE = dict(width=256, height=128, max_vertices=2048, max_triangles=2048,
            max_instances=4, bin_capacity=128, big_capacity=8,
            enable_shadows=False)


@pytest.mark.slow
def test_all_post_effects_run():
    cfg = FrameConfig(**BASE, enable_ssr=True, enable_ssao=True,
                      enable_bloom=True, enable_depth_of_field=True)
    ctx, cam, params, rl = _scene(cfg)
    cam.set_depth_of_field(2.0, 8.0)
    lut = np.stack(np.meshgrid(*[np.linspace(0, 1, 8)] * 3, indexing="ij"),
                   -1)[..., [2, 1, 0]].astype(np.float32)   # identity LUT
    ctx.set_colorlut(lut)
    img = ctx.render(cam, rl, params)
    assert img.shape == (128, 256, 3)
    assert np.isfinite(img.astype(np.float32)).all()
    assert img.max() > 30


def test_bloom_spreads_highlights():
    imgs = {}
    for on in (False, True):
        cfg = FrameConfig(**BASE, enable_bloom=on)
        ctx, cam, params, rl = _scene(cfg)
        params.sunintensity = np.array([200.0, 200.0, 200.0], np.float32)
        imgs[on] = ctx.render(cam, rl, params).astype(np.float32)
    # bloom adds energy around bright regions
    assert imgs[True].sum() > imgs[False].sum() + 100


def test_lut_grading_tints():
    cfg = FrameConfig(**BASE)
    ctx, cam, params, rl = _scene(cfg)
    base_img = ctx.render(cam, rl, params).astype(np.float32)

    cfg2 = FrameConfig(**BASE)
    ctx2, cam2, params2, rl2 = _scene(cfg2)
    g = np.linspace(0, 1, 8)
    r, gg, b = np.meshgrid(g, g, g, indexing="ij")
    lut = np.stack([b * 0.3, gg, r], -1).astype(np.float32)  # crush red
    ctx2.set_colorlut(lut)
    tinted = ctx2.render(cam2, rl2, params2).astype(np.float32)
    assert tinted[..., 0].mean() < base_img[..., 0].mean() * 0.7
