"""Decals + box env probes on the megakernel fast path.

Round-2 verdict item: the shade megakernel was mutually exclusive with
decals and cubemap env probes (they forced the slow XLA path).  These
tests pin the fast path's parity against the XLA path for both features
(reference: data/lighting.comp:136-164 decal loop, :187-207 environment
loop — both run unconditionally inside the reference's lighting kernel).
"""

import numpy as np
import pytest
import jax.numpy as jnp

from datum_tpu.math import Transform
from datum_tpu.ops.common import FrameConfig
from datum_tpu.render import (Camera, RenderContext, RenderList,
                              RenderParams, primitives)
from datum_tpu.render import frame as frame_mod
from datum_tpu.render.types import make_sceneset


def _render(cfg, build):
    ctx = RenderContext(cfg)
    cam, params, rl = build(ctx)
    ss = make_sceneset(cam, params, point_lights=rl.point_lights,
                       spot_lights=rl.spot_lights)
    draws = rl.draw_arrays(cfg.max_instances, ctx.default_material)
    ctx.expand_host(draws)
    if cfg.max_decals_active > 0:
        draws["decals"] = rl.decal_arrays(cfg.max_decals_active)
    out = frame_mod.render_frame(cfg, ctx.device_state(), draws, ss)
    return np.asarray(out["image"]).astype(np.float32) / 255.0


def _base_cfg(**kw):
    return FrameConfig(width=256, height=128, max_vertices=4096,
                       max_triangles=4096, max_instances=8,
                       bin_capacity=128, big_capacity=16,
                       enable_shadows=False, enable_material_maps=True,
                       texture_filter="mip_half", use_pallas=True,
                       pallas_interpret=True, **kw)


def _decal_scene(textured):
    def build(ctx):
        pv, pi = primitives.plane(16.0, 4.0)
        floor = ctx.add_mesh(pv, pi)
        grey = ctx.add_material(color=(0.7, 0.7, 0.7, 1), roughness=0.8)
        cam = Camera()
        cam.set_projection(np.radians(60), 2.0)
        cam.lookat(np.array([0.0, 5.0, 8.0]), np.array([0.0, 0.0, 0.0]),
                   np.array([0.0, 1.0, 0.0]))
        params = RenderParams(width=256, height=128)
        params.sunintensity = np.array([3.0, 3.0, 2.9], np.float32)
        params.ambientintensity = 0.4
        rl = RenderList()
        rl.push_mesh(floor, Transform.identity(), grey)
        kw = {}
        if textured:
            stripes = np.zeros((32, 32, 4), np.uint8)
            stripes[:, ::2] = [255, 255, 255, 255]
            stripes[:, 1::2] = [255, 255, 255, 40]
            kw["albedomap"] = ctx.add_texture(stripes)
        rl.push_decal(Transform.translation([0, 0, 0]), [2.0, 1.0, 2.0],
                      color=(1.0, 0.1, 0.1, 0.9), roughness=0.3, **kw)
        return cam, params, rl
    return build


@pytest.mark.slow
def test_decal_fast_path_matches_xla():
    imgs = {}
    for use_k in (True, False):
        cfg = _base_cfg(max_decals_active=2, use_shade_kernel=use_k)
        imgs[use_k] = _render(cfg, _decal_scene(textured=False))
    rmse = float(np.sqrt(np.mean((imgs[True] - imgs[False]) ** 2)))
    assert rmse < 0.02, f"decal fast-vs-XLA RMSE {rmse}"
    # the decal must actually land (red centre region on the grey floor)
    centre = imgs[True][64:100, 100:156]
    assert centre[..., 0].mean() > centre[..., 1].mean() + 0.05, (
        f"decal not visible: {centre.mean(axis=(0, 1))}")


@pytest.mark.slow
def test_textured_decal_fast_path():
    cfg = _base_cfg(max_decals_active=2)
    img = _render(cfg, _decal_scene(textured=True))
    # the stripe texture must modulate decal alpha: the decal footprint
    # shows alternating red/grey columns
    strip = img[70:95, 90:170, 0] - img[70:95, 90:170, 1]
    assert strip.max() > 0.05
    assert strip.std() > 0.01, f"stripes not visible, std {strip.std()}"


def _probe_scene(with_probe):
    def build(ctx):
        from datum_tpu.render.envmap import EnvMap
        sky = np.full((6, 16, 16, 3), 0.2, np.float32)
        ctx.set_skybox(EnvMap.from_cubemap(jnp.asarray(sky), 3, samples=4))
        if with_probe:
            red = np.zeros((6, 16, 16, 3), np.float32)
            red[..., 0] = 3.0
            ctx.add_environment([0, 1, 0], [5, 4, 5], red, levels=3)
        pv, pi = primitives.plane(16.0, 4.0)
        floor = ctx.add_mesh(pv, pi)
        sv, si = primitives.unit_sphere(12, 6)
        ball = ctx.add_mesh(sv, si)
        shiny = ctx.add_material(color=(0.9, 0.9, 0.9, 1), metalness=1.0,
                                 roughness=0.15, reflectivity=0.9)
        cam = Camera()
        cam.set_projection(np.radians(60), 2.0)
        cam.lookat(np.array([0.0, 2.5, 6.0]), np.array([0.0, 1.0, 0.0]),
                   np.array([0.0, 1.0, 0.0]))
        params = RenderParams(width=256, height=128)
        params.sunintensity = np.array([1.0, 1.0, 1.0], np.float32)
        params.ambientintensity = 1.0
        rl = RenderList()
        rl.push_mesh(floor, Transform.identity(), shiny)
        rl.push_mesh(ball, Transform.translation([0.0, 1.2, 0.0]), shiny)
        return cam, params, rl
    return build


@pytest.mark.slow
def test_env_probe_fast_path_matches_xla():
    imgs = {}
    for use_k in (True, False):
        cfg = _base_cfg(use_shade_kernel=use_k)
        imgs[use_k] = _render(cfg, _probe_scene(with_probe=True))
    rmse = float(np.sqrt(np.mean((imgs[True] - imgs[False]) ** 2)))
    # the fast path taps probes at quarter res (the XLA path per pixel),
    # so the tolerance is looser than the decal test's
    assert rmse < 0.04, f"probe fast-vs-XLA RMSE {rmse}"


@pytest.mark.slow
def test_env_probe_tints_fast_path():
    cfg = _base_cfg()
    with_p = _render(cfg, _probe_scene(with_probe=True))
    without = _render(cfg, _probe_scene(with_probe=False))
    d = np.abs(with_p - without)
    assert d.mean() > 0.01, f"probe changed nothing: {d.mean()}"
    # the red box probe must redden the metallic sphere
    ball = with_p[30:80, 100:156]
    ball0 = without[30:80, 100:156]
    assert ball[..., 0].mean() - ball[..., 2].mean() > \
        ball0[..., 0].mean() - ball0[..., 2].mean() + 0.02
