"""FFT ocean tests: spectrum statistics, wave motion, end-to-end render."""

import numpy as np
import jax.numpy as jnp

from datum_tpu.ops import ocean as ocean_ops


class TestSpectrum:
    def test_seed_shape_and_hermitian_energy(self):
        h0 = ocean_ops.phillips_spectrum(64, 64.0, (10.0, 0.0))
        assert h0.shape == (64, 64)
        assert h0[0, 0] == 0
        assert np.isfinite(h0).all()
        assert np.abs(h0).max() > 0

    def test_maps_real_and_moving(self):
        h0 = ocean_ops.phillips_spectrum(64, 64.0, (10.0, 3.0))
        kx, ky, k, om = ocean_ops.wave_frequencies(64, 64.0)
        d0, n0 = ocean_ops.ocean_maps(h0, kx, ky, k, om, 0.0)
        d1, n1 = ocean_ops.ocean_maps(h0, kx, ky, k, om, 0.7)
        d0, d1 = np.asarray(d0), np.asarray(d1)
        assert np.isfinite(d0).all()
        # heights have zero-ish mean and nonzero variance
        assert abs(d0[..., 1].mean()) < 0.2 * d0[..., 1].std()
        assert d0[..., 1].std() > 1e-4
        # waves move over time
        assert np.abs(d1[..., 1] - d0[..., 1]).max() > 0.2 * d0[..., 1].std()
        # normals unit length, mostly up
        n0 = np.asarray(n0)
        np.testing.assert_allclose(np.linalg.norm(n0, axis=-1), 1.0, atol=1e-4)
        assert n0[..., 1].mean() > 0.7

    def test_displace_grid_periodic(self):
        h0 = ocean_ops.phillips_spectrum(32, 32.0, (6.0, 0.0))
        kx, ky, k, om = ocean_ops.wave_frequencies(32, 32.0)
        disp, nrm = ocean_ops.ocean_maps(h0, kx, ky, k, om, 1.0)
        base = np.zeros((4, 3), np.float32)
        base[:, 0] = [0.0, 32.0, 5.0, 5.0 + 32.0]
        base[:, 2] = [0.0, 0.0, 7.0, 7.0]
        pos, _ = ocean_ops.displace_grid(jnp.asarray(base), disp, nrm, 32.0)
        pos = np.asarray(pos)
        # the patch tiles: x and x+patch displace identically
        np.testing.assert_allclose(pos[0, 1], pos[1, 1], atol=1e-4)
        np.testing.assert_allclose(pos[2, 1], pos[3, 1], atol=1e-4)


class TestOceanRender:
    def test_ocean_renders_and_animates(self):
        from datum_tpu.ops.common import FrameConfig
        from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
        from datum_tpu.render.ocean import Ocean, render_ocean_surface
        from datum_tpu.math import Transform

        cfg = FrameConfig(width=256, height=128, max_vertices=1 << 14,
                          max_triangles=1 << 15, max_instances=4,
                          bin_capacity=512, big_capacity=32,
                          enable_shadows=False,
                          max_dynamic_vertices=1 << 14)
        ctx = RenderContext(cfg)
        ocean = Ocean(ctx, grid=48, patch_size=64.0,
                      params=None)
        water = ctx.add_material(color=(0.1, 0.3, 0.5, 1), metalness=0.0,
                                 roughness=0.12, reflectivity=0.8)
        cam = Camera()
        cam.set_projection(np.radians(60), 2.0)
        cam.lookat(np.array([32.0, 10.0, 80.0]), np.array([32.0, 0.0, 32.0]),
                   np.array([0.0, 1.0, 0.0]))
        params = RenderParams(width=256, height=128)
        params.sundirection = np.array([-0.3, -0.7, -0.4], np.float32)
        params.sundirection /= np.linalg.norm(params.sundirection)
        params.sunintensity = np.array([4.0, 4.0, 3.8], np.float32)

        imgs = []
        for step in range(2):
            ocean.update(0.8)
            rl = RenderList()
            render_ocean_surface(ocean, rl, Transform.identity(), water)
            imgs.append(ctx.render(cam, rl, params).astype(np.float32))

        cov = (imgs[0].max(-1) > 0).mean()
        assert cov > 0.1, f"ocean coverage {cov}"
        diff = np.abs(imgs[1] - imgs[0]).mean()
        assert diff > 0.05, f"ocean static between frames (diff {diff})"

    def test_water_lut_shading_and_foam(self):
        from datum_tpu.ops.common import FrameConfig
        from datum_tpu.ops.ocean import ocean_lut_uv, water_color_lut
        from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
        from datum_tpu.render.ocean import Ocean, OceanParams, render_ocean_surface
        from datum_tpu.math import Transform

        lut = water_color_lut()
        # foam row is white, deep row is dark
        assert lut[-1, 32, :3].min() > 0.95
        assert lut[0, -1, :3].max() < 0.3

        # foam whitens the v coordinate above the foam plane
        pos = np.array([[0, 3.0, 0], [0, -1.0, 0]], np.float32)
        nrm = np.tile([0, 1, 0.0], (2, 1)).astype(np.float32)
        uv = np.asarray(ocean_lut_uv(pos, nrm, (0, 10, 50.0),
                                     foamwaveheight=1.0, foamwavescale=2.0))
        assert uv[0, 1] > uv[1, 1] + 0.3, f"no foam whitening {uv}"

        cfg = FrameConfig(width=256, height=128, max_vertices=1 << 14,
                          max_triangles=1 << 15, max_instances=4,
                          bin_capacity=512, big_capacity=32,
                          enable_shadows=False, texture_filter="bilinear",
                          max_dynamic_vertices=1 << 14)
        ctx = RenderContext(cfg)
        ocean = Ocean(ctx, grid=48, patch_size=64.0,
                      params=OceanParams(amplitude=2e-3, foamwavescale=1.5,
                                         foamwaveheight=0.4, flow=(0.5, 0.2)))
        water = ctx.add_water_material()
        cam = Camera()
        cam.set_projection(np.radians(60), 2.0)
        cam.lookat(np.array([32.0, 9.0, 78.0]), np.array([32.0, 0.0, 32.0]),
                   np.array([0.0, 1.0, 0.0]))
        params = RenderParams(width=256, height=128)
        params.sunintensity = np.array([4.0, 4.0, 3.8], np.float32)
        ocean.update(1.2)
        rl = RenderList()
        render_ocean_surface(ocean, rl, Transform.identity(), water)
        img = ctx.render(cam, rl, params).astype(np.float32)
        water_px = img.max(-1) > 0
        assert water_px.mean() > 0.1
        # water reads blue-green (LUT), not the white default texture
        sel = img[water_px]
        assert sel[:, 2].mean() > sel[:, 0].mean() * 1.05, \
            f"water not blue: {sel.mean(0)}"


class TestWater:
    def test_water_surface_renders_calm(self):
        from datum_tpu.ops.common import FrameConfig
        from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
        from datum_tpu.render.water import Water, push_water
        from datum_tpu.math import Transform

        cfg = FrameConfig(width=256, height=128, max_vertices=1 << 14,
                          max_triangles=1 << 15, max_instances=4,
                          bin_capacity=512, big_capacity=32,
                          enable_shadows=False, texture_filter="bilinear",
                          max_dynamic_vertices=1 << 14)
        ctx = RenderContext(cfg)
        water = Water(ctx, grid=32, patch_size=64.0)
        mat = ctx.add_water_material()
        cam = Camera()
        cam.set_projection(np.radians(60), 2.0)
        cam.lookat(np.array([32.0, 8.0, 76.0]), np.array([32.0, 0.0, 32.0]),
                   np.array([0.0, 1.0, 0.0]))
        params = RenderParams(width=256, height=128)
        params.sunintensity = np.array([3.0, 3.0, 2.9], np.float32)
        water.update(0.5)
        rl = RenderList()
        push_water(rl, water, Transform.identity(), mat)
        img = ctx.render(cam, rl, params).astype(np.float32)
        covered = img.max(-1) > 0
        assert covered.mean() > 0.1
        sel = img[covered]
        # calm water: surface is flat enough that variance stays low and
        # color reads blue-green from the LUT
        assert sel[:, 2].mean() > sel[:, 0].mean()
