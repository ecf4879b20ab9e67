"""Terrain LOD geomorph (reference: data/terrain.geometry.vert —
vertices mix toward floor-snapped coarse-grid points by camera-distance
smoothstep; the heightmap is re-sampled at the snapped point).  The TPU
build bakes the snap targets (render/terrain.py grid_morph_targets) and
the vertex stage lerps toward them (ops/geometry.terrain_morph)."""

import numpy as np
import pytest

from datum_tpu.math import Transform
from datum_tpu.ops.common import FrameConfig
from datum_tpu.render import (Camera, RenderContext, RenderList,
                              RenderParams, primitives)


def test_morph_targets_floor_snap():
    # 5x5 grid, g=2: vertex (1,1) snaps to (0,0); (3,2) -> (2,2);
    # boundary index 4 is g-aligned and stays fixed
    from datum_tpu.render.terrain import grid_morph_targets

    h = w = 5
    pos = np.random.RandomState(0).randn(h, w, 3).astype(np.float32)
    nrm = np.random.RandomState(1).randn(h, w, 3).astype(np.float32)
    mp, mn = grid_morph_targets(pos, nrm, 2)
    mp = mp.reshape(h, w, 3)
    np.testing.assert_array_equal(mp[1, 1], pos[0, 0])
    np.testing.assert_array_equal(mp[3, 2], pos[2, 2])
    np.testing.assert_array_equal(mp[4, 4], pos[4, 4])
    np.testing.assert_array_equal(mp[4, 3], pos[4, 2])


def test_terrain_morph_math():
    """alpha = smoothstep(beg, end, horizontal local distance); end <= 0
    disables; normals renormalize."""
    import jax.numpy as jnp

    from datum_tpu.ops.geometry import terrain_morph

    pos = np.array([[0.0, 1.0, 0.0],      # at the camera: alpha 0
                    [10.0, 1.0, 0.0],     # far: alpha 1
                    [3.0, 1.0, 0.0]],     # mid: smoothstep(2,4,3) = 0.5
                   np.float32)
    nrm = np.tile([0.0, 1.0, 0.0], (3, 1)).astype(np.float32)
    morph6 = np.concatenate([np.tile([0.0, -1.0, 0.0], (3, 1)),
                             np.zeros((3, 3))], 1).astype(np.float32)
    vtx_draw = np.zeros(3, np.int32)
    world = np.eye(3, 4, dtype=np.float32)[None]      # identity
    campos = jnp.asarray([0.0, 5.0, 0.0])             # y ignored

    p, n = terrain_morph(jnp.asarray(pos), jnp.asarray(nrm),
                         jnp.asarray(morph6), jnp.asarray(vtx_draw),
                         jnp.asarray(world),
                         jnp.asarray([[2.0, 4.0]], np.float32), campos)
    p = np.asarray(p)
    np.testing.assert_allclose(p[0], pos[0], atol=1e-6)
    np.testing.assert_allclose(p[1, 1], 0.0, atol=1e-6)        # fully morphed
    np.testing.assert_allclose(p[2, 1], 0.5, atol=1e-6)        # smoothstep mid
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=-1),
                               1.0, atol=1e-5)

    # disabled range (end <= 0): no movement anywhere
    p0, _ = terrain_morph(jnp.asarray(pos), jnp.asarray(nrm),
                          jnp.asarray(morph6), jnp.asarray(vtx_draw),
                          jnp.asarray(world),
                          jnp.asarray([[0.0, 0.0]], np.float32), campos)
    np.testing.assert_allclose(np.asarray(p0), pos, atol=1e-6)

    # rigid world transform: distance measured in LOCAL xz — translating
    # the draw +100x with the camera translated identically changes
    # nothing
    world_t = np.eye(3, 4, dtype=np.float32)[None]
    world_t[0, 0, 3] = 100.0
    p2, _ = terrain_morph(jnp.asarray(pos), jnp.asarray(nrm),
                          jnp.asarray(morph6), jnp.asarray(vtx_draw),
                          jnp.asarray(world_t),
                          jnp.asarray([[2.0, 4.0]], np.float32),
                          campos + jnp.asarray([100.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(p2), p, atol=1e-4)


@pytest.mark.slow
def test_terrain_morph_in_frame():
    """Fully-morphed terrain renders identically to the coarse mesh
    baked directly from the snap targets; disabled morph matches the
    un-morphed fine mesh."""
    tverts, tidx = primitives.terrain(size=8.0, n=16, height=1.5,
                                      morph_grid=4)

    def render(verts, push_morph):
        cfg = FrameConfig(width=256, height=128, max_vertices=1 << 11,
                          max_triangles=1 << 11, max_instances=2,
                          bin_capacity=64, big_capacity=8,
                          enable_shadows=False, enable_terrain_morph=True)
        ctx = RenderContext(cfg)
        mesh = ctx.add_mesh(verts, tidx)
        mat = ctx.add_material(color=(0.4, 0.7, 0.3, 1), roughness=0.9)
        cam = Camera()
        cam.set_projection(np.radians(60), 2.0)
        cam.lookat(np.array([0.0, 6.0, 14.0]), np.array([0.0, 0.0, 0.0]),
                   np.array([0.0, 1.0, 0.0]))
        params = RenderParams(width=cfg.width, height=cfg.height)
        params.ambientintensity = 0.8
        rl = RenderList()
        if push_morph is None:
            rl.push_mesh(mesh, Transform.identity(), mat)
        else:
            rl.push_terrain(mesh, Transform.identity(), mat,
                            morph=push_morph)
        return ctx.render(cam, rl, params).astype(np.float32)

    base = render(tverts, None)                       # plain push_mesh
    off = render(tverts, (0.0, 0.0))                  # morph disabled
    np.testing.assert_array_equal(off, base)

    # beg/end tiny: every vertex is beyond `end` from the camera's local
    # xz -> alpha = 1 everywhere -> positions == baked coarse targets
    full = render(tverts, (1e-4, 2e-4))
    coarse_verts = dict(position=tverts["morph_position"],
                        texcoord=tverts["texcoord"],
                        normal=tverts["morph_normal"],
                        tangent=tverts["tangent"])
    coarse = render(coarse_verts, None)
    rmse = float(np.sqrt(np.mean((full / 255.0 - coarse / 255.0) ** 2)))
    assert rmse < 2e-3, f"fully-morphed vs baked-coarse RMSE {rmse:.5f}"
    # and the morph visibly changed the silhouette vs the fine mesh
    assert np.abs(full - base).mean() > 0.1
