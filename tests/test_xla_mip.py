"""Mip-filtered textures on the pure-XLA path (no Pallas).

The v2 matmap table is platform-agnostic: with texture_filter='mip*',
resolve_gbuffer samples the combined quad-row mip chain, so CPU/XLA
renders (and therefore the committed example goldens) get the same
minification filtering as the Pallas fast path (reference:
src/renderer/texture.cpp — mipped trilinear everywhere)."""

import numpy as np
import pytest

from datum_tpu.render import frame as frame_mod
from datum_tpu.render.types import make_sceneset
from datum_tpu.scenes import datumtest_scene

pytestmark = pytest.mark.slow


def _render(**kw):
    ctx, camera, params, make_rl = datumtest_scene(
        width=256, height=128, sphere_detail=8, n_point_lights=4,
        max_vertices=4096, max_triangles=4096, bin_capacity=64,
        big_capacity=16, enable_material_maps=True, **kw)
    rl = make_rl(0.0)
    ss = make_sceneset(camera, params, point_lights=rl.point_lights,
                       spot_lights=rl.spot_lights)
    draws = rl.draw_arrays(ctx.config.max_instances, ctx.default_material)
    ctx.expand_host(draws)
    out = frame_mod.render_frame(ctx.config, ctx.device_state(), draws, ss)
    return np.asarray(out["image"]).astype(np.float32) / 255.0


def test_xla_mip_matches_fast_path():
    xla_mip = _render(use_pallas=False, texture_filter="mip_half")
    fast = _render(use_pallas=True, pallas_interpret=True,
                   texture_filter="mip_half")
    rmse = float(np.sqrt(np.mean((xla_mip - fast) ** 2)))
    # the fast path samples materials at half res; tolerance covers that
    assert rmse < 0.03, f"XLA-mip vs fast path RMSE {rmse:.4f}"


def test_xla_mip_differs_from_nearest():
    xla_mip = _render(use_pallas=False, texture_filter="mip_half")
    xla_near = _render(use_pallas=False, texture_filter="nearest")
    # the checkerboard floor must actually be filtered differently
    floor = (slice(90, 126), slice(20, 236))
    d = np.abs(xla_mip[floor] - xla_near[floor]).mean()
    assert d > 0.01, f"mip filter changed nothing on the floor ({d:.4f})"
    # mips suppress minification aliasing: the distant floor's local
    # contrast (std of the luma) must drop vs nearest sampling
    luma_m = xla_mip[floor] @ np.float32([0.299, 0.587, 0.114])
    luma_n = xla_near[floor] @ np.float32([0.299, 0.587, 0.114])
    assert luma_m.std() < luma_n.std(), (
        f"mip path did not reduce aliasing: {luma_m.std():.4f} vs "
        f"{luma_n.std():.4f}")
