"""IBL tests: SH projection identities, cubemap sampling roundtrip,
skybox generation, env lighting in the frame."""

import numpy as np
import jax.numpy as jnp
import pytest

from datum_tpu.ops import ibl as ibl_ops
from datum_tpu.ops.sampling import cubemap_face_uv, cubemap_texel_dir, sample_cubemap
from datum_tpu.ops.brdf import probe_irradiance


class TestCubemapSampling:
    def test_dir_uv_roundtrip(self, rng):
        d = rng.randn(100, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        face, uv = cubemap_face_uv(jnp.asarray(d))
        d2 = np.asarray(cubemap_texel_dir(face, uv[..., 0], uv[..., 1]))
        np.testing.assert_allclose(d2, d, atol=1e-5)

    def test_sample_constant(self):
        cube = jnp.full((6, 8, 8, 3), 0.7, jnp.float32)
        d = jnp.asarray(np.random.RandomState(0).randn(50, 3), jnp.float32)
        out = np.asarray(sample_cubemap(cube, d))
        np.testing.assert_allclose(out, 0.7, atol=1e-5)

    def test_sample_face_identity(self):
        # each face painted its index; sampling along axis dirs returns it
        cube = jnp.zeros((6, 8, 8, 1), jnp.float32)
        for f in range(6):
            cube = cube.at[f].set(float(f))
        axes = [(1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)]
        for f, a in enumerate(axes):
            v = float(np.asarray(sample_cubemap(cube, jnp.asarray([a], jnp.float32)))[0, 0])
            assert v == pytest.approx(f, abs=1e-5)


class TestSH:
    def test_constant_cube_projects_to_l0(self):
        cube = jnp.full((6, 16, 16, 3), 2.0, jnp.float32)
        sh = np.asarray(ibl_ops.sh_project(cube))
        # L0 term: 4*pi normalisation * 0.282095 * 2.0
        assert sh[0, 0] == pytest.approx(4 * np.pi * 0.282095 * 2.0 / (4 * np.pi) * 4 * np.pi, rel=0.02) \
            or sh[0, 0] == pytest.approx(2.0 * 0.282095 * 4 * np.pi, rel=0.02)
        # higher bands vanish
        assert np.abs(sh[1:]).max() < 0.05 * abs(sh[0, 0])

    def test_constant_irradiance_isotropic(self):
        cube = jnp.full((6, 16, 16, 3), 1.0, jnp.float32)
        sh = ibl_ops.sh_project(cube)
        n = jnp.asarray(np.random.RandomState(1).randn(20, 3), jnp.float32)
        n = n / jnp.linalg.norm(n, axis=1, keepdims=True)
        irr = np.asarray(probe_irradiance(jnp.broadcast_to(sh, (20, 9, 3)), n))
        # irradiance of unit-radiance environment = pi
        np.testing.assert_allclose(irr, np.pi, rtol=0.05)

    def test_directional_cube(self):
        # bright +y face: irradiance at n=+y much larger than n=-y
        cube = jnp.zeros((6, 16, 16, 3), jnp.float32)
        cube = cube.at[2].set(5.0)   # +Y face
        sh = ibl_ops.sh_project(cube)
        up = np.asarray(probe_irradiance(sh[None], jnp.asarray([[0.0, 1, 0]])))[0]
        down = np.asarray(probe_irradiance(sh[None], jnp.asarray([[0.0, -1, 0]])))[0]
        assert up.mean() > 4 * max(down.mean(), 1e-6)


class TestEnvBrdf:
    def test_bake_shape_and_range(self):
        lut = ibl_ops.bake_envbrdf(16, 64)
        assert lut.shape == (16, 16, 3)
        assert np.all(lut >= 0) and np.all(lut[..., :2] <= 1.5)
        # smooth surfaces at normal incidence reflect strongly: a+b near 1
        assert lut[0, -1, 0] + lut[0, -1, 1] > 0.8


class TestSkybox:
    def test_generate(self):
        from datum_tpu.ops.skybox_gen import generate_skybox

        cube = np.asarray(generate_skybox(
            16, skycolor=(0.65, 0.57, 0.475), groundcolor=(0.4, 0.37, 0.32),
            sundirection=(-0.4, -0.7, -0.6), sunintensity=(8.0, 7.6, 7.9)))
        assert cube.shape == (6, 16, 16, 3)
        assert np.isfinite(cube).all()
        assert cube.max() > 0.05
        # upper hemisphere brighter than nothing; +Y face is sky
        assert cube[2].mean() > 0.0

    def test_specular_mips_shrink(self):
        from datum_tpu.ops.ibl import build_specular_mips

        cube = jnp.asarray(np.random.RandomState(0).rand(6, 32, 32, 3), jnp.float32)
        mips = build_specular_mips(cube, n_mips=4, samples=8)
        assert len(mips) == 4
        assert mips[1].shape == (6, 16, 16, 3)
        # convolution smooths: variance decreases down the chain
        assert float(jnp.var(mips[-1])) < float(jnp.var(mips[0]))


class TestFrameWithIBL:
    def test_skybox_background_and_reflection(self):
        import jax
        from datum_tpu.ops.common import FrameConfig
        from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
        from datum_tpu.render.skybox import SkyBox, SkyBoxParams
        from datum_tpu.render import primitives
        from datum_tpu.math import Transform

        cfg = FrameConfig(width=256, height=128, max_vertices=4096, max_triangles=4096,
                          max_instances=8, bin_capacity=64, big_capacity=8,
                          enable_shadows=False)
        ctx = RenderContext(cfg)
        ctx.set_skybox(SkyBox(size=32, convolve_samples=8))
        verts, idx = primitives.unit_sphere(16, 8)
        sphere = ctx.add_mesh(verts, idx)
        chrome = ctx.add_material(color=(1, 1, 1, 1), metalness=1.0, roughness=0.05)

        cam = Camera()
        cam.set_projection(np.radians(60), 2.0)
        cam.lookat(np.array([0.0, 1.0, 4.0]), np.array([0.0, 0.0, 0.0]),
                   np.array([0.0, 1.0, 0.0]))
        rl = RenderList()
        rl.push_mesh(sphere, Transform.identity(), chrome)
        params = RenderParams(width=256, height=128)
        img = ctx.render(cam, rl, params)

        # background is sky, not black
        corner = img[:10, :10].astype(np.float32)
        assert corner.mean() > 3, f"background black: {corner.mean()}"
        # chrome sphere reflects environment -> nonzero
        centre = img[54:74, 118:138].astype(np.float32)
        assert centre.mean() > 2


class TestProbes:
    def test_probe_brightens_locally(self):
        import jax.numpy as jnp
        from datum_tpu.ops.common import FrameConfig
        from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
        from datum_tpu.render.skybox import SkyBox
        from datum_tpu.render import primitives
        from datum_tpu.math import Transform
        from datum_tpu.ops import ibl as ibl_ops

        cfg = FrameConfig(width=256, height=128, max_vertices=2048,
                          max_triangles=2048, max_instances=4, bin_capacity=64,
                          big_capacity=8, enable_shadows=False)
        ctx = RenderContext(cfg)
        ctx.set_skybox(SkyBox(size=16, convolve_samples=8))
        pv, pi = primitives.plane(10.0)
        floor = ctx.add_mesh(pv, pi)
        mat = ctx.add_material(color=(0.8, 0.8, 0.8, 1))
        cam = Camera()
        cam.set_projection(np.radians(60), 2.0)
        cam.lookat(np.array([0.0, 6.0, 8.0]), np.array([0.0, 0.0, 0.0]),
                   np.array([0.0, 1.0, 0.0]))
        params = RenderParams(width=256, height=128)
        params.sunintensity = np.zeros(3, np.float32)
        params.ambientintensity = 1.0

        def render(with_probe):
            rl = RenderList()
            rl.push_mesh(floor, Transform.identity(), mat)
            if with_probe:
                # a bright warm probe: constant SH (L0-only)
                bright = jnp.full((6, 8, 8, 3),
                                  jnp.asarray([6.0, 3.0, 1.0]), jnp.float32)
                sh = np.asarray(ibl_ops.sh_project(bright))
                rl.push_probe([2.0, 0.5, 0.0], sh, radius=3.0)
            return ctx.render(cam, rl, params).astype(np.float32)

        base = render(False)
        lit = render(True)
        # near the probe the floor gains warm light; far corner unchanged
        near = lit[60:76, 160:200] - base[60:76, 160:200]
        far = lit[100:120, 10:40] - base[100:120, 10:40]
        assert near.mean() > 3, f"probe had no effect ({near.mean():.2f})"
        assert near[..., 0].mean() > near[..., 2].mean()   # warm
        assert abs(far.mean()) < 2


def test_flat_lod_matches_dense_lod():
    import jax.numpy as jnp
    from datum_tpu.ops.sampling import (
        flatten_cube_mips, sample_cubemap_lod, sample_cubemap_lod_flat,
    )

    rng = np.random.RandomState(3)
    mips = [jnp.asarray(rng.rand(6, s, s, 3).astype(np.float32))
            for s in (16, 8, 4, 2)]
    d = rng.randn(257, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    lod = jnp.asarray(rng.rand(257).astype(np.float32) * 3)
    dense = sample_cubemap_lod(mips, d, lod)
    flat = sample_cubemap_lod_flat(flatten_cube_mips(mips), d, lod)
    np.testing.assert_allclose(np.asarray(flat), np.asarray(dense),
                               atol=1e-5)


def test_rotate_sh9_matches_rotated_eval(rng):
    """SH(rotate_sh9(c, Rinv), n) == SH(c, Rinv @ n) for any rotation.

    (The per-band cosine-lobe convolution weights in probe_irradiance
    are rotation-invariant, so validating through it covers the raw
    basis too; maximum() clamp avoided via a positive DC offset.)"""
    import jax.numpy as jnp

    from datum_tpu.math.quaternion import quat_axis_angle, quat_to_matrix
    from datum_tpu.ops.brdf import probe_irradiance
    from datum_tpu.ops.ibl import rotate_sh9

    sh = rng.randn(9, 3).astype(np.float32) * 0.2
    sh[0] += 3.0                      # keep evaluations positive
    for seed in range(3):
        axis = rng.randn(3).astype(np.float32)
        axis /= np.linalg.norm(axis)
        q = quat_axis_angle(axis, 0.3 + 1.1 * seed)
        r_inv = np.asarray(quat_to_matrix(q), np.float32).T

        d = rng.randn(64, 3).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        a = probe_irradiance(jnp.asarray(rotate_sh9(jnp.asarray(sh),
                                                    jnp.asarray(r_inv))),
                             jnp.asarray(d))
        b = probe_irradiance(jnp.asarray(sh), jnp.asarray(d @ r_inv.T))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_skybox_orientation_rotates_background():
    """params.skyboxorientation rotates the visible sky (reference:
    renderer.cpp:6221 skyview, :6347 environment invtransform)."""
    import jax.numpy as jnp

    from datum_tpu.math import Transform
    from datum_tpu.math.quaternion import quat_axis_angle
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import (Camera, RenderContext, RenderList,
                                  RenderParams)
    from datum_tpu.render.envmap import EnvMap

    cfg = FrameConfig(width=128, height=64, max_vertices=512,
                      max_triangles=512, max_instances=2, bin_capacity=32,
                      big_capacity=8, enable_shadows=False)
    ctx = RenderContext(cfg)
    cube = np.full((6, 16, 16, 3), 0.05, np.float32)
    cube[0] = [4.0, 0.2, 0.2]          # +X red
    cube[5] = [0.2, 0.2, 4.0]          # -Z blue
    ctx.set_skybox(EnvMap.from_cubemap(jnp.asarray(cube), 3, samples=4))

    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 0.0, 0.0]), np.array([0.0, 0.0, -4.0]),
               np.array([0.0, 1.0, 0.0]))
    rl = RenderList()
    params = RenderParams(width=128, height=64)

    base = ctx.render(cam, rl, params).astype(np.float32)
    c0 = base[24:40, 48:80].mean((0, 1))
    assert c0[2] > 2 * c0[0], f"expected blue -Z face, got {c0}"

    # +90 deg about Y: R^-1 maps the camera's -Z view ray onto +X
    params.skyboxorientation = np.asarray(
        quat_axis_angle([0.0, 1.0, 0.0], np.pi / 2), np.float32)
    rot = ctx.render(cam, rl, params).astype(np.float32)
    c1 = rot[24:40, 48:80].mean((0, 1))
    assert c1[0] > 2 * c1[2], f"expected red +X face, got {c1}"


class TestPairPackedChain:
    """Mip-pair quad rows: ONE gather per trilinear sample
    (sampling.flatten_cube_mips_pair) must track the two-gather flatq
    sampler within the documented half-coarse-texel blur."""

    def _chain(self, rng, base=16, n=4, c=4):
        mips, s = [], base
        for _ in range(n):
            mips.append(rng.uniform(0, 1, (6, s, s, c)).astype(np.float32))
            s //= 2
        return mips

    def test_matches_quad_sampler(self):
        from datum_tpu.ops.sampling import (flatten_cube_mips_pair,
                                            flatten_cube_mips_quad,
                                            sample_cubemap_lod_pair,
                                            sample_cubemap_lod_quad)
        rng = np.random.RandomState(11)
        # smooth chain (env chains are pre-convolved): low-frequency data
        mips = self._chain(rng)
        for i, m in enumerate(mips):
            k = m.mean(axis=(1, 2), keepdims=True)
            mips[i] = (0.3 * m + 0.7 * k).astype(np.float32)
        flatq = flatten_cube_mips_quad(mips)
        flatp = flatten_cube_mips_pair(mips)
        d = rng.normal(size=(512, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        lod = rng.uniform(0, len(mips) - 1, 512).astype(np.float32)
        a = np.asarray(sample_cubemap_lod_quad(flatq, jnp.asarray(d),
                                               jnp.asarray(lod)))
        b = np.asarray(sample_cubemap_lod_pair(flatp, jnp.asarray(d),
                                               jnp.asarray(lod)))
        assert np.abs(a - b).max() < 0.08, np.abs(a - b).max()
        assert np.abs(a - b).mean() < 0.02

    def test_integer_lod_zero_exact(self):
        """At lod 0 the fine quad dominates: exact match with flatq."""
        from datum_tpu.ops.sampling import (flatten_cube_mips_pair,
                                            flatten_cube_mips_quad,
                                            sample_cubemap_lod_pair,
                                            sample_cubemap_lod_quad)
        rng = np.random.RandomState(5)
        mips = self._chain(rng)
        flatq = flatten_cube_mips_quad(mips)
        flatp = flatten_cube_mips_pair(mips)
        d = rng.normal(size=(256, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        z = jnp.zeros(256, jnp.float32)
        a = np.asarray(sample_cubemap_lod_quad(flatq, jnp.asarray(d), z))
        b = np.asarray(sample_cubemap_lod_pair(flatp, jnp.asarray(d), z))
        np.testing.assert_allclose(a, b, atol=1e-5)
