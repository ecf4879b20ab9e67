"""Device sprite/overlay pass tests (ops/sprite_pass.py).

Reference parity: the OVERLAY pass sprite pipeline (reference:
data/sprite.vert/frag, renderer.cpp:6760-6789) — ordered alpha-blended
screen quads sampling a sprite atlas, drawn after composite.
"""

import numpy as np
import pytest

from datum_tpu.ops.common import FrameConfig
from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
from datum_tpu.render.renderlist import RenderList as RL
from datum_tpu.math import Transform


def np_composite_sprites(rgb, inst, atlas, region=64):
    """numpy mirror of ops/sprite_pass.composite_sprites (same sampling
    and blend conventions, full-image evaluation — no region windows,
    so it also checks the window clamping logic of the device op)."""
    h, w = rgb.shape[:2]
    ah, aw = atlas.shape[:2]
    out = rgb.astype(np.float64).copy()
    ys, xs = np.meshgrid(np.arange(h) + 0.5, np.arange(w) + 0.5,
                         indexing="ij")
    for i in range(int(inst["count"])):
        ox, oy = inst["origin"][i]
        ax = inst["axis_x"][i]
        ay = inst["axis_y"][i]
        uv0, uv1 = inst["uv0"][i], inst["uv1"][i]
        tint = inst["tint"][i]
        dx, dy = xs - ox, ys - oy
        det = ax[0] * ay[1] - ax[1] * ay[0]
        if abs(det) < 1e-8:
            continue
        u = (dx * ay[1] - dy * ay[0]) / det
        v = (dy * ax[0] - dx * ax[1]) / det
        inside = (u >= 0) & (u < 1) & (v >= 0) & (v < 1)
        px = uv0[0] + u * (uv1[0] - uv0[0])
        py = uv0[1] + v * (uv1[1] - uv0[1])
        x0 = np.floor(px - 0.5)
        y0 = np.floor(py - 0.5)
        fx = (px - 0.5) - x0
        fy = (py - 0.5) - y0

        def tap(xi, yi):
            xc = np.clip(xi.astype(np.int64), 0, aw - 1)
            yc = np.clip(yi.astype(np.int64), 0, ah - 1)
            return atlas[yc, xc]

        t = ((tap(x0, y0) * (1 - fx[..., None])
              + tap(x0 + 1, y0) * fx[..., None]) * (1 - fy[..., None])
             + (tap(x0, y0 + 1) * (1 - fx[..., None])
                + tap(x0 + 1, y0 + 1) * fx[..., None]) * fy[..., None])
        a = t[..., 3] * tint[3] * inside
        src = t[..., :3] * tint[:3]
        out = out * (1 - a[..., None]) + src * a[..., None]
    return out


def make_inst(prims, S=8):
    origin = np.zeros((S, 2), np.float32)
    axis_x = np.zeros((S, 2), np.float32)
    axis_y = np.zeros((S, 2), np.float32)
    uv0 = np.zeros((S, 2), np.float32)
    uv1 = np.zeros((S, 2), np.float32)
    tint = np.zeros((S, 4), np.float32)
    for i, p in enumerate(prims):
        origin[i], axis_x[i], axis_y[i], uv0[i], uv1[i], tint[i] = p
    return dict(origin=origin, axis_x=axis_x, axis_y=axis_y, uv0=uv0,
                uv1=uv1, tint=tint, count=np.int32(len(prims)))


class TestSpritePassOp:
    def test_matches_numpy_reference(self, rng):
        from datum_tpu.ops.sprite_pass import composite_sprites
        atlas = rng.rand(32, 48, 4).astype(np.float32)
        rgb = rng.rand(96, 160, 3).astype(np.float32)
        c, s = np.cos(0.4), np.sin(0.4)
        prims = [
            # axis-aligned, interior
            ((40, 30), (24, 0), (0, 16), (2, 2), (30, 18), (1, 1, 1, 1)),
            # rotated, tinted, translucent
            ((90, 40), (20 * c, 20 * s), (-12 * s, 12 * c),
             (10, 4), (40, 28), (0.9, 0.5, 0.2, 0.6)),
            # partially offscreen (left/top edge clamps the window)
            ((-8, -5), (20, 0), (0, 20), (0, 0), (20, 20), (1, 1, 1, 0.8)),
            # partially offscreen (bottom-right)
            ((150, 88), (20, 0), (0, 20), (0, 0), (20, 20), (1, 1, 1, 1)),
        ]
        inst = make_inst(prims)
        got = np.asarray(composite_sprites(rgb, inst, atlas, region=64))
        want = np_composite_sprites(rgb, inst, atlas)
        assert np.abs(got - want).max() < 1e-4

    def test_draw_order(self, rng):
        from datum_tpu.ops.sprite_pass import composite_sprites
        atlas = np.zeros((4, 8, 4), np.float32)
        atlas[:, :4] = [1, 0, 0, 1]     # red, opaque
        atlas[:, 4:] = [0, 0, 1, 1]     # blue, opaque
        rgb = np.zeros((64, 64, 3), np.float32)
        red = ((10, 10), (20, 0), (0, 20), (0, 0), (4, 4), (1, 1, 1, 1))
        blue = ((15, 15), (20, 0), (0, 20), (4, 0), (8, 4), (1, 1, 1, 1))
        out = np.asarray(composite_sprites(rgb, make_inst([red, blue]),
                                           atlas, region=32))
        # overlap region shows the LAST pushed sprite (blue)
        assert out[20, 20, 2] > 0.9 and out[20, 20, 0] < 0.1
        out2 = np.asarray(composite_sprites(rgb, make_inst([blue, red]),
                                            atlas, region=32))
        assert out2[20, 20, 0] > 0.9 and out2[20, 20, 2] < 0.1

    def test_inactive_tail_ignored(self, rng):
        from datum_tpu.ops.sprite_pass import composite_sprites
        atlas = np.ones((4, 4, 4), np.float32)
        rgb = np.zeros((64, 64, 3), np.float32)
        prims = [((8, 8), (16, 0), (0, 16), (0, 0), (4, 4), (1, 1, 1, 1))]
        inst = make_inst(prims, S=8)
        # garbage in the padded tail must not render
        inst["origin"][4] = (30, 30)
        inst["axis_x"][4] = (16, 0)
        inst["axis_y"][4] = (0, 16)
        inst["uv1"][4] = (4, 4)
        inst["tint"][4] = (1, 1, 1, 1)
        out = np.asarray(composite_sprites(rgb, inst, atlas, region=32))
        assert out[38, 38].max() == 0.0
        assert out[12, 12].min() > 0.9


class TestSpriteArrays:
    def test_oversize_split_partitions_exactly(self):
        rl = RL()
        rl.push_sprite((5, 7, 300, 90), 0, rotation=0.3)
        overlay = dict(uv0=[np.array([0, 0], np.float32)],
                       uv1=[np.array([64, 32], np.float32)], layers=[1])
        inst = rl.sprite_arrays(overlay, max_sprites=32, region=128)
        n = int(inst["count"])
        assert n > 1, "expected a split"
        # every chunk bbox fits the region
        for i in range(n):
            bw = abs(inst["axis_x"][i][0]) + abs(inst["axis_y"][i][0])
            bh = abs(inst["axis_x"][i][1]) + abs(inst["axis_y"][i][1])
            assert bw <= 128 and bh <= 128
        # sample points inside the parent rect map into exactly one
        # chunk, with a consistent atlas coordinate
        c, s = np.cos(0.3), np.sin(0.3)
        ax = np.array([300 * c, 300 * s])
        ay = np.array([-90 * s, 90 * c])
        ctr = np.array([5 + 150, 7 + 45])
        org = ctr - 0.5 * ax - 0.5 * ay
        rngl = np.random.RandomState(0)
        for _ in range(50):
            u, v = rngl.rand(), rngl.rand()
            p = org + ax * u + ay * v
            hits = []
            for i in range(n):
                axi, ayi = inst["axis_x"][i], inst["axis_y"][i]
                d = p - inst["origin"][i]
                det = axi[0] * ayi[1] - axi[1] * ayi[0]
                ui = (d[0] * ayi[1] - d[1] * ayi[0]) / det
                vi = (d[1] * axi[0] - d[0] * axi[1]) / det
                if 0 <= ui < 1 and 0 <= vi < 1:
                    uvp = (inst["uv0"][i]
                           + np.array([ui, vi]) * (inst["uv1"][i]
                                                   - inst["uv0"][i]))
                    hits.append(uvp)
            assert len(hits) == 1, f"point in {len(hits)} chunks"
            expect = np.array([64 * u, 32 * v])
            assert np.abs(hits[0] - expect).max() < 1e-3

    def test_text_expansion_matches_host_metrics(self):
        from datum_tpu.render.sprite import Font
        font = Font.builtin()
        ctx_like = dict(origin=np.array([100, 0], np.float32),
                        x=font.x, y=font.y, width=font.width,
                        height=font.height, offsetx=font.offsetx,
                        offsety=font.offsety, advance=font.advance,
                        glyph_index=font.glyph_index)
        rl = RL()
        rl.push_text("AB 12", (20, 30))
        inst = rl.sprite_arrays(dict(uv0=[], uv1=[], layers=[],
                                     font=ctx_like), max_sprites=16)
        # 5 glyph boxes (the builtin font gives the space a blank box)
        assert int(inst["count"]) == 5
        # first glyph at x=20 (builtin offsetx 0), advance 6 apart
        assert inst["origin"][0][0] == 20
        assert inst["origin"][1][0] == 26
        # '1' starts at 20+3*6 after the space advance
        assert inst["origin"][3][0] == 38


class TestSpriteFrame:
    def test_frame_with_overlay_sprites(self):
        cfg = FrameConfig(width=256, height=128, max_vertices=1024,
                          max_triangles=1024, max_instances=8,
                          bin_capacity=64, big_capacity=8,
                          enable_shadows=False, enable_ssao=False,
                          enable_ssr=False, enable_bloom=False,
                          max_overlay_sprites=8, overlay_region=64)
        ctx = RenderContext(cfg)
        icon = np.zeros((16, 16, 4), np.uint8)
        icon[:, :, 1] = 255
        icon[:, :, 3] = 255
        sid = ctx.add_sprite(icon)
        ctx.set_overlay_font()

        mesh = ctx.add_mesh(
            dict(position=np.array([[-1.5, -1, 0], [1.5, -1, 0],
                                    [0, 1.5, 0]], np.float32),
                 normal=np.tile([0, 0, 1.0], (3, 1))),
            np.array([0, 1, 2]))
        mat = ctx.add_material(color=(1.0, 0.2, 0.1, 1))
        cam = Camera()
        cam.set_projection(np.radians(60), cfg.width / cfg.height)
        cam.lookat(np.array([0.0, 1.0, 5.0]), np.array([0.0, 0.0, 0.0]),
                   np.array([0.0, 1.0, 0.0]))
        rl = RenderList()
        rl.push_mesh(mesh, Transform.identity(), mat)
        rl.push_sprite((8, 8, 16, 16), sid)
        rl.push_text("FPS 60", (8, 100), tint=(1, 1, 0.2, 1))
        params = RenderParams(width=cfg.width, height=cfg.height)
        params.sundirection = np.array([0, -0.3, -1.0], np.float32)
        params.sundirection /= np.linalg.norm(params.sundirection)

        img = ctx.render(cam, rl, params)
        # green icon blended at (8..24)^2
        patch = img[10:22, 10:22]
        assert patch[..., 1].mean() > 150
        assert patch[..., 0].mean() < 80
        # text pixels present near (8, 100)
        row = img[100:108, 8:50]
        assert (row[..., 0] > 128).sum() > 10
        # scene still renders (triangle center)
        centre = img[cfg.height // 2 - 6:cfg.height // 2 + 6,
                     cfg.width // 2 - 6:cfg.width // 2 + 6]
        assert centre[..., 0].mean() > 10


def test_overlay_sprites_display_space_under_scale():
    """With params.scale != 1 the overlay composites AFTER the upscale
    blit at DISPLAY coordinates (reference order: renderer.cpp:6797
    blit, then :6760 overlay) — sprites must land exactly where pushed,
    at their native size."""
    cfg = FrameConfig(width=256, height=128, max_vertices=1024,
                      max_triangles=1024, max_instances=8,
                      bin_capacity=64, big_capacity=8,
                      enable_shadows=False, enable_ssao=False,
                      enable_ssr=False, enable_bloom=False,
                      max_overlay_sprites=4, overlay_region=64)
    ctx = RenderContext(cfg)
    icon = np.zeros((16, 16, 4), np.uint8)
    icon[:, :, 1] = 255
    icon[:, :, 3] = 255
    sid = ctx.add_sprite(icon)

    cam = Camera()
    cam.set_projection(np.radians(60), cfg.width / cfg.height)
    cam.lookat(np.array([0.0, 1.0, 5.0]), np.array([0.0, 0.0, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    rl = RenderList()
    rl.push_sprite((200, 90, 16, 16), sid)
    params = RenderParams(width=cfg.width, height=cfg.height)
    params.scale = 0.5

    img = ctx.render(cam, rl, params)
    assert img.shape == (128, 256, 3)
    patch = img[92:104, 202:214]
    assert patch[..., 1].mean() > 150, patch[..., 1].mean()
    # nothing at the half-scale position (100, 45)
    wrong = img[47:55, 102:110]
    assert wrong[..., 1].mean() < 60, wrong[..., 1].mean()
