"""Canonical test scenes.

`datumtest_scene` mirrors the reference kitchen-sink test scene
(reference: test/datumtest.cpp:205-233 — a grid of spheres sweeping
roughness x metalness, a ground plane, a spot-lit caster, particles)
and is the flagship workload for bench.py and __graft_entry__.py.
"""

from __future__ import annotations

import numpy as np

from .math import Transform
from .ops.common import FrameConfig
from .render import Camera, RenderContext, RenderList, RenderParams
from .render import primitives


class _ParticleCloud:
    """Minimal live-particle state for the scene's OIT pass (duck-typed
    like render.particlesystem.ParticleInstance)."""

    def __init__(self, positions, size=0.22, color=(1.0, 0.8, 0.45, 0.35)):
        n = len(positions)
        self.position = np.ascontiguousarray(positions, np.float32)
        self.size = np.full((n, 2), size, np.float32)
        self.rotation = np.zeros(n, np.float32)
        self.color = np.tile(np.asarray(color, np.float32), (n, 1))
        self.alive = np.ones(n, bool)


def datumtest_scene(width=1920, height=1080, *, sphere_detail=24, grid=(7, 5),
                    n_point_lights=8, skybox=True, skybox_size=64, **cfg_kw):
    """Build the flagship scene; returns (ctx, camera, params, make_renderlist)."""
    cfg = FrameConfig(width=width, height=height, **cfg_kw)
    ctx = RenderContext(cfg)

    if skybox:
        # the reference datumtest lights with a real environment
        # (test/datumtest.cpp skybox + envmap resources)
        from .render.skybox import SkyBox
        ctx.set_skybox(SkyBox(size=skybox_size, convolve_samples=16))

    verts, idx = primitives.unit_sphere(sphere_detail, sphere_detail // 2)
    sphere = ctx.add_mesh(verts, idx)
    pverts, pidx = primitives.plane(16.0, 8.0)
    ground = ctx.add_mesh(pverts, pidx)

    # checkerboard albedo for the floor
    checker = np.zeros((64, 64, 4), np.uint8)
    ii, jj = np.indices((64, 64))
    c = ((ii // 8) + (jj // 8)) % 2
    checker[..., :3] = np.where(c[..., None] > 0, 200, 90)
    checker[..., 3] = 255
    checker_tex = ctx.add_texture(checker)
    floor_mat = ctx.add_material(color=(1, 1, 1, 1), metalness=0.0, roughness=0.8,
                                 albedomap=checker_tex)

    # forward/OIT content (reference: datumtest.cpp:579-673 always
    # renders its translucent + water + decal set): a glass sphere, a
    # shallow water pool and two floor decals, active whenever the
    # config carries the capacity
    glass_mat = ctx.add_material(color=(0.35, 0.55, 2.0, 0.42),
                                 metalness=0.0, roughness=0.12,
                                 reflectivity=0.9)
    water_mat = ctx.add_material(color=(0.12, 0.3, 0.42, 0.10),
                                 metalness=0.0, roughness=0.06,
                                 reflectivity=0.9, absorb=0.55)
    wverts, widx = primitives.plane(3.2, 1.0)
    water_patch = ctx.add_mesh(wverts, widx)

    gx, gy = grid
    sphere_mats = []
    for j in range(gy):
        for i in range(gx):
            rough = max(i / (gx - 1), 0.04)
            metal = j / (gy - 1)
            sphere_mats.append(ctx.add_material(
                color=(0.8, 0.16, 0.12, 1), metalness=metal, roughness=rough,
                reflectivity=0.5))

    # color-grading LUT (reference: datumtest loads a colorlut asset and
    # the composite pass grades through it, camera.inc colorgrad) — a
    # gentle cinematic grade: mild S-curve contrast, teal-tinted
    # shadows, warm highlights.  Smooth, so set_colorlut's polynomial
    # fit replaces the 8-gather trilinear tap on the TPU path.
    s_ = 32
    gax = np.linspace(0.0, 1.0, s_, dtype=np.float32)
    lb, lg, lr = np.meshgrid(gax, gax, gax, indexing="ij")
    lum_ = 0.2126 * lr + 0.7152 * lg + 0.0722 * lb
    con = lambda x: x + 0.12 * x * (1.0 - x) * (2.0 * x - 1.0)
    hw_ = lum_ ** 2
    # mild S-curve + warm highlights; headroom-scaled tints keep the
    # grade in [0,1] by construction (no clip kinks, so the polynomial
    # fit is near-exact)
    lut = np.stack([
        con(lr) + 0.035 * hw_ * (1 - con(lr)),
        con(lg) + 0.010 * hw_ * (1 - con(lg)),
        con(lb),
    ], -1)
    ctx.set_colorlut(lut)

    camera = Camera()
    camera.set_projection(np.radians(60), width / height)
    camera.lookat(np.array([0.0, 4.0, 14.0]), np.array([0.0, 2.0, 0.0]),
                  np.array([0.0, 1.0, 0.0]))

    params = RenderParams(width=width, height=height)
    params.sundirection = np.array([-0.7, -0.8, -0.2], np.float32)
    params.sundirection /= np.linalg.norm(params.sundirection)
    params.sunintensity = np.array([4.0, 3.9, 3.7], np.float32)
    params.ambientintensity = 0.5

    rng = np.random.RandomState(42)
    light_pos = rng.uniform([-8, 0.5, -6], [8, 4.0, 6], (n_point_lights, 3))
    light_col = rng.uniform(0.5, 8.0, (n_point_lights, 3))

    # particle cloud state for scenes that enable the OIT pass
    # (reference: datumtest.cpp particles block)
    n_particles = 256
    part_base = rng.uniform([-6, 0.5, -3], [6, 5.0, 3],
                            (n_particles, 3)).astype(np.float32)
    part_phase = rng.uniform(0, 2 * np.pi, n_particles).astype(np.float32)

    def make_renderlist(t=0.0):
        rl = RenderList()
        rl.push_mesh(ground, Transform.identity(), floor_mat)
        k = 0
        for j in range(gy):
            for i in range(gx):
                x = (i - (gx - 1) / 2) * 2.2
                y = 1.0 + j * 2.2
                rl.push_mesh(sphere, Transform.translation([x, y, 0.0]),
                             sphere_mats[k])
                k += 1
        for li in range(n_point_lights):
            p = light_pos[li].copy()
            p[0] += np.sin(t + li) * 1.5
            rl.push_pointlight(p, light_col[li], (1.0, 0.0, 1.0), range_=12.0)
        # shadow-casting spot over the sphere wall (reference:
        # datumtest.cpp spotlight + caster)
        rl.push_spotlight(np.float32([4.0, 8.0, 6.0]),
                          np.float32([-0.35, -0.75, -0.55]),
                          np.float32([20.0, 19.0, 17.0]), cutoff=0.6,
                          attenuation=(0.5, 0.0, 1.0), range_=30.0)
        if cfg.max_translucent_draws > 0:
            # glass sphere front-right; shallow water pool front-left
            # (absorb > 0 routes it through the depth-aware water
            # transmission + refraction path)
            rl.push_translucent(sphere,
                                Transform.translation([4.2, 1.1, 5.0]),
                                glass_mat)
            rl.push_translucent(water_patch,
                                Transform.translation([-4.5, 0.35, 5.0]),
                                water_mat)
        if cfg.max_decals_active > 0:
            rl.push_decal(Transform.translation([-1.5, 0.0, 6.0]),
                          [1.4, 0.8, 1.4], color=(0.75, 0.1, 0.05, 0.85),
                          roughness=0.35)
            rl.push_decal(Transform.translation([1.8, 0.0, 7.0]),
                          [1.0, 0.8, 1.0], color=(0.05, 0.05, 0.06, 0.9),
                          roughness=0.9)
        if cfg.max_particle_quads > 0:
            pos = part_base + np.stack(
                [np.sin(t * 0.7 + part_phase) * 0.8,
                 np.cos(t * 0.4 + part_phase) * 0.4 + 0.2,
                 np.cos(t * 0.6 + part_phase) * 0.8], -1).astype(np.float32)
            inst = _ParticleCloud(pos)
            rl.push_particles(inst, emissive=0.4)
        return rl

    return ctx, camera, params, make_renderlist


def stress_scene(width=1920, height=1080, *, terrain_n=192,
                 sphere_detail=36, grid=(8, 4), n_point_lights=128,
                 skybox=True, skybox_size=32, **cfg_kw):
    """Dense-mesh + many-light stress scene (reference:
    test/datumtest.cpp:175-202 — the Sponza + 128-light block the
    512-light SceneSet capacities promise).

    ~2*terrain_n^2 terrain triangles + grid spheres at sphere_detail
    (defaults ≈ 74k + 52k ≈ 126k visible triangles after culling;
    terrain_n=256 + detail 48 pushes ≈ 250k).  Returns
    (ctx, camera, params, make_renderlist) like datumtest_scene.
    """
    cfg_kw.setdefault("max_vertices", 1 << 18)
    cfg_kw.setdefault("max_triangles", 1 << 18)
    cfg_kw.setdefault("use_light_clusters", True)
    cfg_kw.setdefault("tile_light_capacity", 64)
    # terrain LOD geomorph: distant ground vertices relax onto the
    # coarse grid (reference: terrain.geometry.vert)
    cfg_kw.setdefault("enable_terrain_morph", True)
    cfg = FrameConfig(width=width, height=height, **cfg_kw)
    ctx = RenderContext(cfg)

    if skybox:
        from .render.skybox import SkyBox
        ctx.set_skybox(SkyBox(size=skybox_size, convolve_samples=16))

    tverts, tidx = primitives.terrain(
        size=28.0, n=terrain_n, height=2.2,
        morph_grid=(4 if cfg.enable_terrain_morph else 0))
    ground = ctx.add_mesh(tverts, tidx)
    rock = np.zeros((64, 64, 4), np.uint8)
    ri, rj = np.indices((64, 64))
    c = ((ri // 4) + (rj // 4)) % 2
    rock[..., :3] = np.where(c[..., None] > 0, 150, 110)
    rock[..., 3] = 255
    ground_mat = ctx.add_material(color=(1, 1, 1, 1), roughness=0.85,
                                  albedomap=ctx.add_texture(rock))

    verts, idx = primitives.unit_sphere(sphere_detail, sphere_detail // 2)
    sphere = ctx.add_mesh(verts, idx)
    gx, gy = grid
    mats = []
    for j in range(gy):
        for i in range(gx):
            mats.append(ctx.add_material(
                color=(0.75, 0.2 + 0.5 * (i % 3) / 2, 0.15, 1),
                metalness=j / max(gy - 1, 1),
                roughness=max(i / max(gx - 1, 1), 0.05),
                reflectivity=0.5))

    camera = Camera()
    camera.set_projection(np.radians(60), width / height)
    camera.lookat(np.array([0.0, 6.0, 20.0]), np.array([0.0, 2.5, 0.0]),
                  np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=width, height=height)
    params.sundirection = np.array([-0.6, -0.75, -0.3], np.float32)
    params.sundirection /= np.linalg.norm(params.sundirection)
    params.sunintensity = np.array([3.5, 3.4, 3.2], np.float32)
    params.ambientintensity = 0.45

    rng = np.random.RandomState(11)
    light_pos = rng.uniform([-14, 0.8, -10], [14, 6.0, 12],
                            (n_point_lights, 3)).astype(np.float32)
    light_col = rng.uniform(0.5, 6.0, (n_point_lights, 3)).astype(np.float32)

    def make_renderlist(t=0.0):
        rl = RenderList()
        if cfg.enable_terrain_morph:
            rl.push_terrain(ground, Transform.identity(), ground_mat,
                            morph=(18.0, 34.0))
        else:
            rl.push_mesh(ground, Transform.identity(), ground_mat)
        k = 0
        for j in range(gy):
            for i in range(gx):
                x = (i - (gx - 1) / 2) * 3.0
                y = 2.0 + j * 2.6
                rl.push_mesh(sphere, Transform.translation([x, y, 0.0]),
                             mats[k])
                k += 1
        for li in range(n_point_lights):
            p = light_pos[li].copy()
            p[0] += np.sin(t * 0.9 + li * 0.61) * 1.2
            p[2] += np.cos(t * 0.7 + li * 0.37) * 1.2
            rl.push_pointlight(p, light_col[li], (1.0, 0.0, 1.0),
                               range_=7.0)
        return rl

    return ctx, camera, params, make_renderlist
