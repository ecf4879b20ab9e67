"""End-to-end skinned rendering: the reference character.pack animated
through the Animator + device dual-quat skinning path."""

import numpy as np
import pytest

from datum_tpu.asset import PackReader
from datum_tpu.math import Transform
from datum_tpu.ops.common import FrameConfig
from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
from datum_tpu.render.animation import Animation, Animator


@pytest.fixture(scope="module")
def character():
    return PackReader("/root/reference/bin/character.pack")


def test_character_skinned_frames_differ(character):
    mesh_data = character.mesh(1)
    # dense mesh: ~11k triangles land in a handful of tiles, so the
    # per-tile bin capacity must cover thousands
    cfg = FrameConfig(width=128, height=128, max_vertices=1 << 14,
                      max_triangles=1 << 14, max_instances=4,
                      bin_capacity=4096, big_capacity=16,
                      enable_shadows=False, enable_skinning=True,
                      max_palettes=4, max_bones=128)
    ctx = RenderContext(cfg)
    mesh = ctx.add_mesh(mesh_data["vertices"], mesh_data["indices"],
                        mincorner=mesh_data["mincorner"],
                        maxcorner=mesh_data["maxcorner"], rig=mesh_data["rig"])
    mat = ctx.add_material(color=(0.8, 0.7, 0.6, 1))

    an = Animator(mesh_data["bones"])
    anim = Animation.from_asset(character.animation(2))
    an.play(anim, weight=1.0, rate=1.0)

    centre = 0.5 * (mesh_data["mincorner"] + mesh_data["maxcorner"])
    size = float(np.linalg.norm(mesh_data["maxcorner"] - mesh_data["mincorner"]))
    cam = Camera()
    cam.set_projection(np.radians(60), 1.0)
    cam.lookat(centre + np.array([0, 0.2 * size, 1.2 * size], np.float32),
               centre, np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=128, height=128)
    params.sundirection = np.array([-0.3, -0.8, -0.5], np.float32)
    params.sundirection /= np.linalg.norm(params.sundirection)
    params.sunintensity = np.array([3.0, 3.0, 3.0], np.float32)

    imgs = []
    for step in range(2):
        an.update(0.6)
        rl = RenderList()
        rl.push_actor(mesh, Transform.identity(), mat, an.palette())
        imgs.append(ctx.render(cam, rl, params).astype(np.float32))

    cov0 = (imgs[0].max(-1) > 0).mean()
    assert 0.02 < cov0 < 0.9, f"character coverage {cov0}"
    diff = np.abs(imgs[0] - imgs[1]).mean()
    assert diff > 0.1, f"animation frames identical (diff={diff})"


def test_bindpose_matches_rigid(character):
    """Identity palette (bind-compose) must reproduce the unskinned mesh."""
    mesh_data = character.mesh(1)
    cfg = FrameConfig(width=128, height=128, max_vertices=1 << 14,
                      max_triangles=1 << 14, max_instances=4,
                      bin_capacity=128, big_capacity=16,
                      enable_shadows=False, enable_skinning=True,
                      max_palettes=4, max_bones=128)
    ctx = RenderContext(cfg)
    mesh = ctx.add_mesh(mesh_data["vertices"], mesh_data["indices"],
                        rig=mesh_data["rig"])
    mat = ctx.add_material()
    centre = 0.5 * (mesh_data["mincorner"] + mesh_data["maxcorner"])
    size = float(np.linalg.norm(mesh_data["maxcorner"] - mesh_data["mincorner"]))
    cam = Camera()
    cam.set_projection(np.radians(60), 1.0)
    cam.lookat(centre + np.array([0, 0, 1.2 * size], np.float32), centre,
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=128, height=128)

    # bind pose palette: world joints s.t. palette = identity composition.
    # Using all-identity palettes deforms unless bind transforms compose to
    # identity; instead render with palette rows = identity (treat as
    # rigid) vs rigid path
    rl1 = RenderList()
    rl1.push_mesh(mesh, Transform.identity(), mat)
    img_rigid = ctx.render(cam, rl1, params)

    ident = np.tile(Transform.identity().flat(), (128, 1))
    rl2 = RenderList()
    rl2.push_actor(mesh, Transform.identity(), mat, ident)
    img_skin = ctx.render(cam, rl2, params)
    np.testing.assert_array_equal(img_rigid, img_skin)
