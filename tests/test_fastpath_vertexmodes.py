"""Non-rigid vertex modes through the Pallas fast path.

Round-3 verdict item: dual-quat skinning (reference:
data/actor.geometry.vert:38-47), foliage wind bend
(data/transform.inc:158-186) and ocean dynamic vertices
(data/ocean.gen.comp -> dynamic vertex slab) executed through the Pallas
raster only in examples, never in CI.  This composes all three in one
scene on the shipping fast path (use_pallas + megakernel, interpret
mode) and asserts (a) parity against the XLA raster path and (b) each
mode actually moves its vertices.
"""

import numpy as np
import pytest

from datum_tpu.math import Transform
from datum_tpu.ops.common import FrameConfig
from datum_tpu.render import (Camera, RenderContext, RenderList,
                              RenderParams, primitives)

pytestmark = pytest.mark.slow


def _cfg(fast):
    return FrameConfig(
        width=256, height=128, max_vertices=1 << 13, max_triangles=1 << 13,
        max_instances=8, bin_capacity=512, big_capacity=16,
        enable_shadows=False, enable_material_maps=True,
        texture_filter="mip_half",        # same filtering on both paths
        enable_skinning=True, max_palettes=4, max_bones=8,
        enable_foliage=True, max_dynamic_vertices=1 << 11,
        use_pallas=fast, pallas_interpret=fast)


def _scene(cfg, bent, t):
    from datum_tpu.render.ocean import (Ocean, OceanParams,
                                        render_ocean_surface)

    ctx = RenderContext(cfg)
    # tall column (sphere stretched 3x in y), rigged to 2 bones:
    # bottom half bone 0 (identity), top half bone 1
    sv, si = primitives.unit_sphere(12, 6)
    pos = sv["position"] * np.array([0.8, 2.2, 0.8], np.float32)
    sv = dict(sv, position=pos)
    rig = np.zeros(len(pos), dtype=[("bone", np.int32, 4),
                                    ("weight", np.float32, 4)])
    rig["bone"][:, 0] = (pos[:, 1] > 0.0)
    rig["weight"][:, 0] = 1.0
    actor = ctx.add_mesh(sv, si, rig=rig)

    qv, qi = primitives.unit_quad()
    blade = ctx.add_mesh(dict(qv, position=qv["position"] * 2.0), qi)
    pv, pi = primitives.plane(20.0, 4.0)
    floor = ctx.add_mesh(pv, pi)

    mat = ctx.add_material(color=(0.85, 0.3, 0.2, 1), roughness=0.5)
    green = ctx.add_material(color=(0.2, 0.8, 0.3, 1), roughness=0.8)
    grey = ctx.add_material(color=(0.6, 0.6, 0.65, 1), roughness=0.9)
    water = ctx.add_water_material()
    ocean = Ocean(ctx, grid=16, patch_size=6.0,
                  params=OceanParams(amplitude=2e-3, choppiness=1.2))
    ocean.update(1.0 + t)

    palette = np.stack([
        Transform.identity().flat(),
        (Transform.rotation([0, 0, 1.0], 0.9 if bent else 0.0)).flat(),
    ]).astype(np.float32)

    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 3.0, 10.0]), np.array([0.0, 1.0, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=cfg.width, height=cfg.height)
    params.sundirection = np.array([-0.3, -0.8, -0.4], np.float32)
    params.sundirection /= np.linalg.norm(params.sundirection)
    params.sunintensity = np.array([3.5, 3.4, 3.2], np.float32)
    params.ambientintensity = 0.5

    rl = RenderList()
    rl.push_mesh(floor, Transform.identity(), grey)
    rl.push_actor(actor, Transform.translation([-4.0, 2.2, 0.0]), mat,
                  palette)
    rl.push_foliage(blade, Transform.translation([0.0, 1.0, 2.0]), green,
                    wind=(2.5 * t, 0.0, 0.0, 0.8), bendscale=(0, 0.35, 0))
    render_ocean_surface(ocean, rl, Transform.translation([4.5, 0.2, 2.0]),
                         water)
    return ctx, cam, params, rl


def _render(fast, bent=False, t=0.0):
    cfg = _cfg(fast)
    ctx, cam, params, rl = _scene(cfg, bent, t)
    return ctx.render(cam, rl, params).astype(np.float32) / 255.0


def test_vertex_modes_fast_path():
    base = _render(fast=True)
    slow = _render(fast=False)
    moved = _render(fast=True, bent=True, t=2.0)

    # (a) the Pallas raster consumes skinned/foliage/dynamic vertex
    # streams identically to the XLA raster
    rmse = float(np.sqrt(np.mean((base - slow) ** 2)))
    assert rmse < 0.03, f"fast-vs-XLA vertex modes RMSE {rmse:.4f}"

    # (b) each mode moved ITS region of the frame (thirds: actor left,
    # foliage centre, ocean right)
    d = np.abs(moved - base).mean(-1)
    third = d.shape[1] // 3
    d_actor = d[:, :third].mean()
    d_fol = d[:, third:2 * third].mean()
    d_ocean = d[:, 2 * third:].mean()
    assert d_actor > 0.003, f"skinned bend invisible: {d_actor:.5f}"
    assert d_fol > 0.003, f"wind bend invisible: {d_fol:.5f}"
    assert d_ocean > 0.001, f"ocean motion invisible: {d_ocean:.5f}"
