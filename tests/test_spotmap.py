"""Parabolic spot shadow maps (reference: map_parabolic spot path)."""

import functools

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow


def _render(cutoff, mode):
    import datum_tpu.ops.raster_pallas as rp
    import datum_tpu.ops.shade_pallas as sp
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import (Camera, RenderContext, RenderList,
                                  RenderParams, primitives)
    from datum_tpu.render import frame as frame_mod
    from datum_tpu.render.types import make_sceneset
    from datum_tpu.math import Transform

    if True:
        cfg = FrameConfig(width=256, height=128, max_vertices=4096,
                          max_triangles=4096, max_instances=8,
                          bin_capacity=128, big_capacity=16,
                          enable_shadows=False, enable_material_maps=True,
                          texture_filter="mip_half", use_pallas=True,
                          max_spot_shadows=1, spot_shadow_res=256,
                          spot_shadow_mode=mode, pallas_interpret=True)
        ctx = RenderContext(cfg)
        pv, pi = primitives.plane(24.0, 4.0)
        floor = ctx.add_mesh(pv, pi)
        cv, ci = primitives.unit_cube()
        cube = ctx.add_mesh(cv, ci)
        grey = ctx.add_material(color=(0.7, 0.7, 0.7, 1), roughness=0.9)
        cam = Camera()
        cam.set_projection(np.radians(60), 2.0)
        cam.lookat(np.array([0.0, 6.0, 10.0]), np.array([0.0, 0.0, 0.0]),
                   np.array([0.0, 1.0, 0.0]))
        params = RenderParams(width=256, height=128)
        params.sunintensity = np.array([0.0, 0.0, 0.0], np.float32)
        params.ambientintensity = 0.05
        rl = RenderList()
        rl.push_mesh(floor, Transform.identity(), grey)
        rl.push_mesh(cube, Transform.translation([0.0, 2.5, 0.0]), grey)
        # wide-cone spot directly above, shining down
        rl.push_spotlight(np.float32([2.0, 6.0, 0.0]),
                          np.float32([-0.25, -1.0, 0.0]),
                          np.float32([60.0, 60.0, 60.0]), cutoff=cutoff,
                          attenuation=(0.2, 0.0, 1.0), range_=40.0)
        ss = make_sceneset(cam, params, spot_lights=rl.spot_lights)
        draws = rl.draw_arrays(cfg.max_instances, ctx.default_material)
        ctx.expand_host(draws)
        out = frame_mod.render_frame(cfg, ctx.device_state(), draws, ss)
        return np.asarray(out["image"]).astype(np.float32)


def test_parabolic_wide_cone_casts_shadow():
    """A ~150-degree cone (cutoff 0.25) — far beyond a perspective map's
    usable fov — still produces a cube shadow on the floor."""
    img = _render(cutoff=0.25, mode="parabolic")
    assert np.isfinite(img).all()
    # the floating cube's shadow is projected onto the floor left of
    # centre (light is up-right); compare it with the symmetric lit
    # region on the right
    row = img[86:104]
    shadowed = row[:, 84:116].mean()
    lit = row[:, 150:182].mean()
    assert lit > shadowed + 6, f"lit {lit:.1f} vs shadowed {shadowed:.1f}"


def test_parabolic_matches_perspective_for_narrow_cone():
    """Narrow cones agree between the two spot-map modes."""
    a = _render(cutoff=0.75, mode="parabolic")
    b = _render(cutoff=0.75, mode="perspective")
    d = np.abs(a - b).mean()
    assert d < 14.0, f"modes diverge: mean abs {d:.2f}"
