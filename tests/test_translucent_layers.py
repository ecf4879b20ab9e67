"""Multi-layer lit translucency (FrameConfig.translucent_lit_layers).

Reference: data/translucent.frag shades EVERY translucent fragment via
back-to-front subpasses (renderer.cpp:6596-6684).  Our fast path shades
the nearest N layers with the full deferred megakernel (depth-peeled
re-raster) and accumulates fragments beyond them as unlit WBOIT."""

import numpy as np
import pytest

from datum_tpu.math import Transform
from datum_tpu.ops.common import FrameConfig
from datum_tpu.render import (Camera, RenderContext, RenderList,
                              RenderParams, primitives)
from datum_tpu.render import frame as frame_mod
from datum_tpu.render.types import make_sceneset


def _cfg(**kw):
    return FrameConfig(width=256, height=128, max_vertices=4096,
                       max_triangles=4096, max_instances=8,
                       bin_capacity=128, big_capacity=16,
                       enable_shadows=False, enable_material_maps=True,
                       texture_filter="mip_half", use_pallas=True,
                       pallas_interpret=True, max_translucent_draws=4,
                       max_translucent_tris=2048, **kw)


def _render(cfg, n_quads):
    """n_quads stacked glass quads facing the camera; the nearest is
    large, deeper ones shrink so each is fully inside the previous."""
    ctx = RenderContext(cfg)
    # rigid transforms only (dual quats): bake per-quad sizes into the
    # meshes (each deeper quad fully inside the previous on screen)
    quads = [ctx.add_mesh(*primitives.plane(8.0 * (1.0 - 0.18 * q), 1.0))
             for q in range(3)]
    floor = ctx.add_mesh(*primitives.plane(24.0, 4.0))
    grey = ctx.add_material(color=(0.55, 0.55, 0.55, 1), roughness=0.9)
    glass = [
        ctx.add_material(color=(0.85, 0.9, 1.0, 0.35), roughness=0.05,
                         reflectivity=0.9),
        ctx.add_material(color=(0.2, 0.4, 1.0, 0.5), roughness=0.05,
                         reflectivity=0.9),
        ctx.add_material(color=(1.0, 0.2, 0.1, 0.6), roughness=0.05,
                         reflectivity=0.9),
    ]
    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 2.0, 9.0]), np.array([0.0, 1.5, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=cfg.width, height=cfg.height)
    params.sunintensity = np.array([3.0, 3.0, 2.8], np.float32)
    params.ambientintensity = 0.5
    rl = RenderList()
    rl.push_mesh(floor, Transform.identity(), grey)
    # quads stand upright (rotate the xz plane onto xy), stacked in z
    import math
    rot = Transform.rotation([1.0, 0.0, 0.0], math.pi / 2)
    for q in range(n_quads):
        t = Transform.translation([0.0, 1.5, 2.0 - 2.0 * q]) * rot
        rl.push_translucent(quads[q], t, glass[q % 3])
    ss = make_sceneset(cam, params, point_lights=rl.point_lights,
                       spot_lights=rl.spot_lights)
    draws = rl.draw_arrays(cfg.max_instances, ctx.default_material)
    ctx.expand_host(draws)
    draws["translucent"] = rl.translucent_arrays(
        cfg.max_translucent_draws, ctx.default_material)
    out = frame_mod.render_frame(cfg, ctx.device_state(), draws, ss)
    return np.asarray(out["image"]).astype(np.float32) / 255.0


@pytest.mark.slow
def test_second_layer_is_lit():
    one = _render(_cfg(translucent_lit_layers=1), 2)
    two = _render(_cfg(translucent_lit_layers=2), 2)
    # the rear quad sits fully behind the front one: with a single lit
    # layer it is invisible; with two layers it shows through the glass
    overlap = (slice(30, 95), slice(80, 175))
    d = np.abs(two[overlap] - one[overlap]).mean()
    assert d > 0.01, f"second layer changed nothing (mean diff {d:.4f})"
    # the rear quad is strongly blue: the overlap gets bluer
    blue_gain = (two[overlap][..., 2].mean() - two[overlap][..., 0].mean())
    blue_base = (one[overlap][..., 2].mean() - one[overlap][..., 0].mean())
    assert blue_gain > blue_base + 0.01, (
        f"rear blue quad not visible: {blue_gain:.4f} vs {blue_base:.4f}")


@pytest.mark.slow
def test_layers_beyond_two_fall_back_to_wboit():
    two = _render(_cfg(translucent_lit_layers=2), 2)
    three = _render(_cfg(translucent_lit_layers=2), 3)
    # the 3rd (red) quad must still appear — as unlit WBOIT residual
    overlap = (slice(35, 90), slice(90, 165))
    d = np.abs(three[overlap] - two[overlap]).mean()
    assert d > 0.005, f"3rd layer dropped entirely (mean diff {d:.4f})"
    red_gain = (three[overlap][..., 0].mean()
                - three[overlap][..., 2].mean())
    red_base = (two[overlap][..., 0].mean() - two[overlap][..., 2].mean())
    assert red_gain > red_base + 0.005, (
        f"red residual not visible: {red_gain:.4f} vs {red_base:.4f}")


@pytest.mark.slow
def test_third_layer_is_lit():
    """Three stacked glass quads: with translucent_lit_layers=3 the
    deepest (red) quad gets the full deferred shade — its specular /
    sun response shows up versus the unlit-WBOIT fallback (reference:
    translucent.frag shades every fragment)."""
    two = _render(_cfg(translucent_lit_layers=2), 3)
    three = _render(_cfg(translucent_lit_layers=3), 3)
    three_no3rd = _render(_cfg(translucent_lit_layers=3), 2)
    overlap = (slice(35, 90), slice(90, 165))
    # the third layer switches from unlit WBOIT blend to the full
    # deferred shade: the image must change substantially (measured
    # mean diff ~0.14 — raw unlit color blend vs physically attenuated
    # lit shading)
    d = np.abs(three[overlap] - two[overlap]).mean()
    assert d > 0.01, f"3rd lit layer changed nothing (mean diff {d:.4f})"
    # the red 3rd quad stays visible through the two front layers:
    # red-vs-blue balance shifts red vs the same config without it
    # (measured: -0.018 vs -0.043)
    rg = (three[overlap][..., 0].mean() - three[overlap][..., 2].mean())
    rg_no = (three_no3rd[overlap][..., 0].mean()
             - three_no3rd[overlap][..., 2].mean())
    assert rg > rg_no + 0.005, (
        f"red lit 3rd layer not visible: {rg:.4f} vs {rg_no:.4f} without")


@pytest.mark.slow
def test_single_layer_unchanged_by_flag():
    # layers=2 with only ONE translucent surface must match layers=1
    one = _render(_cfg(translucent_lit_layers=1), 1)
    two = _render(_cfg(translucent_lit_layers=2), 1)
    rmse = float(np.sqrt(np.mean((one - two) ** 2)))
    assert rmse < 0.005, f"empty 2nd layer changed the image: {rmse:.4f}"
