"""End-to-end frame tests — the minimum slice (triangle example) and a
reference cube.pack render through the full jitted frame graph."""

import numpy as np
import pytest

from datum_tpu.ops.common import FrameConfig
from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
from datum_tpu.math import Transform

CFG = FrameConfig(width=256, height=128, max_vertices=1024, max_triangles=1024,
                  max_instances=8, bin_capacity=64, big_capacity=8,
                  enable_shadows=False,
                  enable_ssao=False, enable_ssr=False, enable_bloom=False)


@pytest.fixture(scope="module")
def ctx():
    return RenderContext(CFG)


def make_camera():
    cam = Camera()
    cam.set_projection(np.radians(60), CFG.width / CFG.height)
    cam.lookat(np.array([0.0, 1.0, 5.0]), np.array([0.0, 0.0, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    return cam


class TestTriangle:
    def test_minimal_triangle_frame(self, ctx):
        # the example-triangle scene: one triangle in front of the camera
        mesh = ctx.add_mesh(
            dict(position=np.array([[-1.5, -1, 0], [1.5, -1, 0], [0, 1.5, 0]], np.float32),
                 normal=np.tile([0, 0, 1.0], (3, 1))),
            np.array([0, 1, 2]))
        mat = ctx.add_material(color=(1.0, 0.2, 0.1, 1))

        rl = RenderList()
        rl.push_mesh(mesh, Transform.identity(), mat)
        params = RenderParams(width=CFG.width, height=CFG.height)
        params.sundirection = np.array([0, -0.3, -1.0], np.float32)
        params.sundirection /= np.linalg.norm(params.sundirection)

        img = ctx.render(make_camera(), rl, params)
        assert img.shape == (CFG.height, CFG.width, 3)
        assert img.dtype == np.uint8
        centre = img[CFG.height // 2 - 10:CFG.height // 2 + 10,
                     CFG.width // 2 - 10:CFG.width // 2 + 10]
        assert centre.mean() > 10, "triangle not visible"
        # red material => red channel dominates
        assert centre[..., 0].mean() > centre[..., 2].mean() * 1.5
        # corners are background (black)
        assert img[:4, :4].max() == 0
        assert ctx.luminance > 0

    def test_instancing_two_draws(self, ctx):
        mesh = ctx.add_mesh(
            dict(position=np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0, 0.5, 0]],
                                   np.float32)),
            np.array([0, 1, 2]))
        mat = ctx.add_material(color=(0.2, 1.0, 0.2, 1))
        rl = RenderList()
        rl.push_mesh(mesh, Transform.translation([-1.2, 0, 0]), mat)
        rl.push_mesh(mesh, Transform.translation([1.2, 0, 0]), mat)
        img = ctx.render(make_camera(), rl, RenderParams(width=CFG.width, height=CFG.height))
        left = img[:, :CFG.width // 2]
        right = img[:, CFG.width // 2:]
        assert left.max() > 0 and right.max() > 0

    def test_depth_occlusion_between_draws(self, ctx):
        quad_v = dict(position=np.array(
            [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32))
        quad_i = np.array([0, 1, 2, 0, 2, 3])
        mesh = ctx.add_mesh(quad_v, quad_i)
        red = ctx.add_material(color=(1, 0, 0, 1))
        blue = ctx.add_material(color=(0, 0, 1, 1))
        rl = RenderList()
        rl.push_mesh(mesh, Transform.translation([0, 0, -1.0]), red)   # behind
        rl.push_mesh(mesh, Transform.translation([0, 0, 1.0]), blue)   # in front
        img = ctx.render(make_camera(), rl, RenderParams(width=CFG.width, height=CFG.height))
        centre = img[CFG.height // 2, CFG.width // 2]
        assert centre[2] > centre[0], f"front (blue) quad should win: {centre}"


class TestShadows:
    def test_cube_casts_shadow_on_floor(self):
        from datum_tpu.render import primitives

        cfg = FrameConfig(width=256, height=128, max_vertices=2048,
                          max_triangles=2048, max_instances=8, bin_capacity=64,
                          big_capacity=8, enable_shadows=True, shadow_res=256,
                          shadow_bin_capacity=64)
        sctx = RenderContext(cfg)
        pv, pi = primitives.plane(8.0)
        floor = sctx.add_mesh(pv, pi)
        cv, ci = primitives.unit_cube()
        cube = sctx.add_mesh(cv, ci)
        mat = sctx.add_material(color=(0.9, 0.9, 0.9, 1))

        cam = Camera()
        cam.set_projection(np.radians(60), 2.0)
        cam.lookat(np.array([0.0, 6.0, 8.0]), np.array([0.0, 0.0, 0.0]),
                   np.array([0.0, 1.0, 0.0]))
        params = RenderParams(width=256, height=128)
        # sun from the left so the shadow falls to the cube's right,
        # visible from the camera (straight-down sun hides it behind
        # the cube itself)
        params.sundirection = np.array([-0.7, -1.0, 0.0], np.float32)
        params.sundirection /= np.linalg.norm(params.sundirection)
        params.sunintensity = np.array([4.0, 4.0, 4.0], np.float32)
        params.ambientintensity = 0.05

        rl = RenderList()
        rl.push_mesh(floor, Transform.identity(), mat)
        rl.push_mesh(cube, Transform.translation([0.0, 1.5, 0.0]), mat)
        img = sctx.render(cam, rl, params).astype(np.float32)

        # light travels toward -x/-y: a compact shadow falls just left of
        # the cube.  Take the darkest pixels of that area vs lit floor.
        h, w = 128, 256
        region = img[int(h * 0.30):int(h * 0.60), int(w * 0.33):int(w * 0.49)].mean(-1)
        shadowed = np.percentile(region[region > 0], 10)
        lit = img[int(h * 0.42):int(h * 0.58), int(w * 0.60):int(w * 0.72)].mean()
        assert shadowed < lit * 0.7, f"no shadow: shadowed={shadowed:.1f} lit={lit:.1f}"


class TestCubePack:
    def test_reference_cube_renders(self, ctx):
        from datum_tpu.asset import PackReader
        pack = PackReader("/root/reference/bin/cube.pack")
        m = pack.mesh(0)
        mesh = ctx.add_mesh(m["vertices"], m["indices"])
        mat = ctx.add_material(color=(0.8, 0.8, 0.8, 1), roughness=0.6)
        rl = RenderList()
        rl.push_mesh(mesh, Transform.rotation([0, 1, 0], 0.5), mat)
        cam = make_camera()
        img = ctx.render(cam, rl, RenderParams(width=CFG.width, height=CFG.height))
        frac = (img.max(-1) > 0).mean()
        assert 0.05 < frac < 0.9, f"cube coverage {frac}"

    def test_point_light_illuminates(self, ctx):
        from datum_tpu.asset import PackReader
        pack = PackReader("/root/reference/bin/cube.pack")
        m = pack.mesh(0)
        mesh = ctx.add_mesh(m["vertices"], m["indices"])
        mat = ctx.add_material(color=(0.8, 0.8, 0.8, 1))
        params = RenderParams(width=CFG.width, height=CFG.height)
        params.sunintensity = np.zeros(3, np.float32)  # no sun
        params.ambientintensity = 0.0

        rl = RenderList()
        rl.push_mesh(mesh, Transform.identity(), mat)
        dark = ctx.render(make_camera(), rl, params)

        rl2 = RenderList()
        rl2.push_mesh(mesh, Transform.identity(), mat)
        rl2.push_pointlight([0, 2.0, 3.0], [30.0, 30.0, 30.0], (1.0, 0.0, 1.0), range_=50)
        lit = ctx.render(make_camera(), rl2, params)
        assert lit.astype(int).sum() > dark.astype(int).sum() + 1000


class TestSpotShadows:
    def test_spot_light_casts_shadow(self):
        from datum_tpu.render import primitives

        cfg = FrameConfig(width=256, height=128, max_vertices=2048,
                          max_triangles=2048, max_instances=8, bin_capacity=64,
                          big_capacity=8, enable_shadows=False,
                          max_spot_shadows=2, spot_shadow_res=128,
                          shadow_bin_capacity=64)
        sctx = RenderContext(cfg)
        pv, pi = primitives.plane(8.0)
        floor = sctx.add_mesh(pv, pi)
        cv, ci = primitives.unit_cube()
        cube = sctx.add_mesh(cv, ci)
        mat = sctx.add_material(color=(0.9, 0.9, 0.9, 1))

        cam = Camera()
        cam.set_projection(np.radians(60), 2.0)
        cam.lookat(np.array([0.0, 7.0, 9.0]), np.array([0.0, 0.0, 0.0]),
                   np.array([0.0, 1.0, 0.0]))
        params = RenderParams(width=256, height=128)
        params.sunintensity = np.zeros(3, np.float32)
        params.ambientintensity = 0.02

        def render(with_cube):
            rl = RenderList()
            rl.push_mesh(floor, Transform.identity(), mat)
            if with_cube:
                rl.push_mesh(cube, Transform.translation([0.0, 2.0, 0.0]), mat)
            rl.push_spotlight([0.0, 7.0, 0.0], [0.0, -1.0, 0.0],
                              [220.0, 220.0, 220.0], cutoff=0.6,
                              attenuation=(1.0, 0.0, 1.0), range_=20.0)
            return sctx.render(cam, rl, params).astype(np.float32)

        lit = render(False)
        shadowed = render(True)
        assert lit.max() > 20, "spot not lighting floor"
        # the cube's footprint shadow darkens floor pixels around its
        # base; find pixels that dropped strongly (excluding pixels the
        # cube itself now covers, which change color rather than darken
        # smoothly — ratio test over the central floor band)
        band_l = lit[55:85, 96:160].mean(-1)
        band_s = shadowed[55:85, 96:160].mean(-1)
        ratio = (band_s + 1) / (band_l + 1)
        assert (ratio < 0.5).sum() > 20, \
            f"no spot shadow: min ratio {ratio.min():.2f}"


def test_foliage_wind_bends_in_frame():
    import numpy as np

    from datum_tpu.math import Transform
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
    from datum_tpu.render import primitives

    cfg = FrameConfig(width=256, height=128, max_vertices=2048,
                      max_triangles=2048, max_instances=8, bin_capacity=64,
                      big_capacity=8, enable_shadows=False,
                      enable_foliage=True)
    ctx = RenderContext(cfg)
    # a tall thin quad as a grass blade
    qv, qi = primitives.unit_quad()
    pos = np.asarray(qv["position"], np.float32).copy()
    pos[:, 1] = pos[:, 1] * 2 + 2.0     # y in [0, 4]
    blade = ctx.add_mesh(dict(position=pos, texcoord=qv["texcoord"],
                              normal=qv["normal"], tangent=qv["tangent"]), qi)
    mat = ctx.add_material(color=(0.2, 0.9, 0.2, 1))
    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 2.0, 8.0]), np.array([0.0, 2.0, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=256, height=128)
    params.ambientintensity = 1.0

    imgs = []
    for windx in (0.0, 0.8):
        rl = RenderList()
        rl.push_foliage(blade, Transform.identity(), mat,
                        wind=(windx, 0, 0, 0.3), bendscale=(0, 0.08, 0))
        imgs.append(ctx.render(cam, rl, params).astype(np.float32))
    # wind bends the blade: top pixels shift right
    base_cols = np.nonzero(imgs[0][10:40].max(axis=(0, 2)) > 0)[0]
    bent_cols = np.nonzero(imgs[1][10:40].max(axis=(0, 2)) > 0)[0]
    assert len(base_cols) and len(bent_cols)
    assert bent_cols.mean() > base_cols.mean() + 3, \
        f"no bend: {base_cols.mean()} vs {bent_cols.mean()}"
    # roots stay put: compare the lowest covered rows
    rows0 = np.nonzero(imgs[0].max(axis=(1, 2)) > 0)[0]
    lo = slice(rows0.max() - 6, rows0.max() + 1)
    rb = np.nonzero(imgs[0][lo].max(axis=(0, 2)) > 0)[0]
    bb = np.nonzero(imgs[1][lo].max(axis=(0, 2)) > 0)[0]
    assert len(bb) and abs(rb.mean() - bb.mean()) < 8


def test_render_scale_blits_to_viewport():
    import numpy as np

    from datum_tpu.math import Transform
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
    from datum_tpu.render import primitives

    cfg = FrameConfig(width=256, height=128, max_vertices=512,
                      max_triangles=512, max_instances=4, bin_capacity=64,
                      big_capacity=8, enable_shadows=False)
    ctx = RenderContext(cfg)
    qv, qi = primitives.unit_quad()
    quad = ctx.add_mesh(qv, qi)
    mat = ctx.add_material(color=(1, 0.2, 0.2, 1))
    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 0.0, 4.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=256, height=128)
    params.ambientintensity = 1.0
    params.scale = 0.5
    rl = RenderList()
    rl.push_mesh(quad, Transform.identity(), mat)
    img = ctx.render(cam, rl, params)
    assert img.shape == (128, 256, 3)       # blitted back to the viewport
    centre = img[50:78, 112:144].astype(np.float32)
    assert centre[..., 0].mean() > 40       # quad still visible


def test_context_resize_respecializes():
    """Context.resize(): two viewport sizes render in ONE session,
    reusing the pools (reference: examples/example-xcb.cpp:911-925
    re-runs prepare_render_pipeline on resize)."""
    import numpy as np

    from datum_tpu.math import Transform
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
    from datum_tpu.render import primitives

    cfg = FrameConfig(width=256, height=128, max_vertices=512,
                      max_triangles=512, max_instances=4, bin_capacity=64,
                      big_capacity=8, enable_shadows=False)
    ctx = RenderContext(cfg)
    qv, qi = primitives.unit_quad()
    quad = ctx.add_mesh(qv, qi)
    mat = ctx.add_material(color=(1, 0.2, 0.2, 1))
    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 0.0, 4.0]), np.zeros(3),
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=256, height=128)
    params.ambientintensity = 1.0

    def draw():
        rl = RenderList()
        rl.push_mesh(quad, Transform.identity(), mat)
        return ctx.render(cam, rl, params)

    img = draw()
    assert img.shape == (128, 256, 3)
    assert ctx.last_depth.shape == (128, 256)

    ctx.resize(128, 64)                     # tile-aligned like all sizes
    img2 = draw()
    assert img2.shape == (64, 128, 3)
    assert ctx.last_depth.shape == (64, 128)
    centre = img2[25:39, 56:72].astype(np.float32)
    assert centre[..., 0].mean() > 40       # quad still visible

    ctx.resize(256, 128)                    # back to the original size
    img3 = draw()
    np.testing.assert_array_equal(img3, img)


def test_bin_overflow_reported():
    import numpy as np

    from datum_tpu.math import Transform
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
    from datum_tpu.render import primitives

    def run(bin_capacity):
        cfg = FrameConfig(width=256, height=128, max_vertices=4096,
                          max_triangles=4096, max_instances=8,
                          bin_capacity=bin_capacity, big_capacity=8,
                          enable_shadows=False)
        ctx = RenderContext(cfg)
        sv, si = primitives.unit_sphere(24, 12)
        ball = ctx.add_mesh(sv, si)
        mat = ctx.add_material(color=(1, 1, 1, 1))
        cam = Camera()
        cam.set_projection(np.radians(60), 2.0)
        cam.lookat(np.array([0.0, 0.0, 3.0]), np.zeros(3),
                   np.array([0.0, 1.0, 0.0]))
        params = RenderParams(width=256, height=128)
        rl = RenderList()
        rl.push_mesh(ball, Transform.identity(), mat)
        ctx.render(cam, rl, params)
        return ctx.bin_overflow

    assert run(16) > 0          # dense sphere overflows small bins
    assert run(512) == 0


def test_live_material_and_texture_update():
    import numpy as np

    from datum_tpu.math import Transform
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
    from datum_tpu.render import primitives

    cfg = FrameConfig(width=256, height=128, max_vertices=512,
                      max_triangles=512, max_instances=4, bin_capacity=64,
                      big_capacity=8, enable_shadows=False,
                      texture_filter="bilinear")
    ctx = RenderContext(cfg)
    qv, qi = primitives.unit_quad()
    quad = ctx.add_mesh(qv, qi)
    tex = ctx.add_texture(np.full((8, 8, 4), [255, 0, 0, 255], np.uint8))
    mat = ctx.add_material(color=(1, 1, 1, 1), albedomap=tex)
    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 0.0, 3.0]), np.zeros(3), np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=256, height=128)
    params.ambientintensity = 1.0
    rl = RenderList()
    rl.push_mesh(quad, Transform.identity(), mat)

    a = ctx.render(cam, rl, params).astype(np.float32)
    ctx.update_texture(tex, np.full((8, 8, 4), [0, 0, 255, 255], np.uint8))
    rl2 = RenderList()
    rl2.push_mesh(quad, Transform.identity(), mat)
    b = ctx.render(cam, rl2, params).astype(np.float32)
    c = a[50:78, 112:144]
    d = b[50:78, 112:144]
    assert c[..., 0].mean() > c[..., 2].mean() * 1.5     # red first
    assert d[..., 2].mean() > d[..., 0].mean() * 1.5     # blue after update

    ctx.update_material(mat, emissive=0.9)
    rl3 = RenderList()
    rl3.push_mesh(quad, Transform.identity(), mat)
    e = ctx.render(cam, rl3, params).astype(np.float32)
    assert e[50:78, 112:144].mean() > d.mean() + 20
