"""Forward OIT particle rendering (stardust-style)."""

import numpy as np

from datum_tpu.math import Transform
from datum_tpu.ops.common import FrameConfig
from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
from datum_tpu.render.particlesystem import (
    Distribution, ParticleEmitter, ParticleSystem,
)


def test_particles_visible_and_blended():
    cfg = FrameConfig(width=256, height=128, max_vertices=512, max_triangles=512,
                      max_instances=4, bin_capacity=64, big_capacity=16,
                      enable_shadows=False, max_particle_quads=256)
    ctx = RenderContext(cfg)

    ps = ParticleSystem(maxparticles=200, emitters=[ParticleEmitter(
        rate=0.0, bursts=[(0.0, 150)], life=Distribution.constant(10.0),
        velocity=Distribution.constant(0.0), shape="sphere", shape_radius=1.5,
        size=Distribution.constant(0.25),
        color=Distribution.constant([4.0, 2.0, 0.5, 0.6]),
        acceleration=np.zeros(3, np.float32))])
    inst = ps.create(seed=5)
    ps.update(inst, 0.02, Transform.identity())
    assert inst.count > 100

    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 0.0, 6.0]), np.array([0.0, 0.0, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    rl = RenderList()
    rl.push_particles(inst)
    params = RenderParams(width=256, height=128)
    params.sunintensity = np.zeros(3, np.float32)
    params.ambientintensity = 0.0
    img = ctx.render(cam, rl, params).astype(np.float32)

    centre = img[40:90, 90:170]
    assert centre.mean() > 2.0, f"particles invisible (mean {centre.mean()})"
    # warm tint: red > blue
    assert centre[..., 0].sum() > centre[..., 2].sum()
    # corners empty
    assert img[:8, :8].max() == 0


def test_particles_occluded_by_opaque():
    from datum_tpu.render import primitives

    cfg = FrameConfig(width=256, height=128, max_vertices=512, max_triangles=512,
                      max_instances=4, bin_capacity=64, big_capacity=16,
                      enable_shadows=False, max_particle_quads=64)
    ctx = RenderContext(cfg)
    qv, qi = primitives.unit_quad()
    wall = ctx.add_mesh(qv, qi)
    mat = ctx.add_material(color=(0.1, 0.1, 0.9, 1))

    ps = ParticleSystem(maxparticles=32, emitters=[ParticleEmitter(
        rate=0.0, bursts=[(0.0, 20)], life=Distribution.constant(10.0),
        velocity=Distribution.constant(0.0), shape="point",
        size=Distribution.constant(0.3),
        color=Distribution.constant([8.0, 8.0, 0.5, 0.9]),
        acceleration=np.zeros(3, np.float32))])
    inst = ps.create()
    # particles at z=-2, wall at z=0 (between camera at z=6 and particles)
    ps.update(inst, 0.02, Transform.translation([0, 0, -2.0]))

    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 0.0, 6.0]), np.array([0.0, 0.0, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=256, height=128)
    params.sunintensity = np.zeros(3, np.float32)
    params.ambientintensity = 1.0

    rl = RenderList()
    rl.push_mesh(wall, Transform.rotation([0, 1, 0], 0.0) * Transform.identity(), mat)
    rl.push_particles(inst)
    img = ctx.render(cam, rl, params).astype(np.float32)
    centre = img[50:78, 112:144]
    # wall (blue-ish ambient) wins over yellow particles behind it
    assert centre[..., 2].mean() > centre[..., 0].mean(), \
        f"particles bled through wall: {centre.mean(axis=(0, 1))}"


def test_translucent_mesh_blends():
    from datum_tpu.render import primitives
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
    from datum_tpu.math import Transform

    cfg = FrameConfig(width=256, height=128, max_vertices=1024, max_triangles=1024,
                      max_instances=4, bin_capacity=64, big_capacity=16,
                      enable_shadows=False, max_translucent_draws=4,
                      max_translucent_tris=64)
    ctx = RenderContext(cfg)
    qv, qi = primitives.unit_quad()
    quad = ctx.add_mesh(qv, qi)
    opaque_red = ctx.add_material(color=(1, 0, 0, 1))
    glass_blue = ctx.add_material(color=(0.1, 0.2, 3.0, 0.5))

    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 0.0, 5.0]), np.array([0.0, 0.0, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=256, height=128)
    params.ambientintensity = 1.0

    rl = RenderList()
    rl.push_mesh(quad, Transform.translation([0, 0, -1.0]), opaque_red)
    rl.push_translucent(quad, Transform.translation([0.5, 0, 1.0]), glass_blue)
    img = ctx.render(cam, rl, params).astype(np.float32)
    # overlap region: red shows through blue glass -> both channels up
    overlap = img[40:80, 140:180]
    red_only = img[40:80, 60:90]
    assert overlap[..., 2].mean() > 20, f"glass invisible {overlap.mean(0).mean(0)}"
    assert overlap[..., 0].mean() > 10, "background lost behind glass"
    assert red_only[..., 2].mean() < overlap[..., 2].mean() * 0.5


def test_native_billboards_match_numpy():
    from datum_tpu.render.particlesystem import _native_particles
    from datum_tpu.render import Camera, RenderList

    if _native_particles() is None:
        import pytest
        pytest.skip("native lib not built")

    ps = ParticleSystem(maxparticles=9000, emitters=[ParticleEmitter(
        rate=0.0, bursts=[(0.0, 8000)], life=Distribution.constant(10.0),
        velocity=Distribution.uniform(0.2, 1.0), shape="sphere",
        shape_radius=2.0, size=Distribution.uniform(0.05, 0.3),
        rotation=Distribution.uniform(0.0, 3.0),
        color=Distribution.constant([1, 1, 1, 1]),
        acceleration=np.zeros(3, np.float32))])
    inst = ps.create(seed=3)
    ps.update(inst, 0.02, Transform.identity())
    assert inst.count > 4096          # native path kicks in above 4096

    cam = Camera()
    cam.lookat(np.array([0, 1.0, 5.0]), np.zeros(3), np.array([0, 1.0, 0]))
    rl = RenderList()
    rl.push_particles(inst)
    fast = rl.forward_arrays(8192, cam)

    import datum_tpu.render.renderlist as RL
    import datum_tpu.render.particlesystem as PS
    saved = PS._native_lib
    PS._native_lib = None             # force numpy fallback
    try:
        slow = rl.forward_arrays(8192, cam)
    finally:
        PS._native_lib = saved
    np.testing.assert_allclose(fast["positions"], slow["positions"],
                               atol=1e-5)
    assert fast["quad_count"] == slow["quad_count"]


def test_multi_emitter_independence():
    """Per-emitter state: rates must not couple through a shared
    accumulator, and over-life/acceleration must use the OWNING emitter
    (reference keeps per-emitter modules, particlesystem.h:86-159)."""
    from datum_tpu.math import Transform

    up = ParticleEmitter(rate=10.0, acceleration=(0, 5, 0),
                         life=Distribution.constant(100.0),
                         velocity=Distribution.constant(0.0),
                         color=Distribution.constant([1, 0, 0, 1]))
    down = ParticleEmitter(rate=2.5, acceleration=(0, -5, 0),
                           life=Distribution.constant(100.0),
                           velocity=Distribution.constant(0.0),
                           color=Distribution.constant([0, 1, 0, 1]))
    ps = ParticleSystem(maxparticles=512, emitters=[up, down])
    inst = ps.create(seed=3)
    tf = Transform.identity()
    for _ in range(10):
        ps.update(inst, 0.1, tf)
    # one second at rates 10 + 2.5: counts must be per-emitter exact
    n_up = int((inst.alive & (inst.emitter == 0)).sum())
    n_down = int((inst.alive & (inst.emitter == 1)).sum())
    assert n_up == 10, n_up
    assert n_down == 2, n_down
    # opposite accelerations: owners must separate vertically
    y_up = inst.position[inst.alive & (inst.emitter == 0), 1]
    y_down = inst.position[inst.alive & (inst.emitter == 1), 1]
    # the newest particle hasn't integrated yet (position 0)
    assert y_up.min() >= 0.0 and (y_up > 0).sum() >= 9
    assert y_down.max() <= 0.0 and (y_down < 0).sum() >= 1
    # colors come from the owning emitter
    c_up = inst.color[inst.alive & (inst.emitter == 0)]
    assert np.allclose(c_up[:, 0], 1) and np.allclose(c_up[:, 1], 0)
