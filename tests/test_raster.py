"""Rasterizer tests: coverage, depth ordering, perspective correctness,
near-plane robustness (homogeneous raster needs no clipping)."""

import numpy as np
import pytest
import jax.numpy as jnp

from datum_tpu.ops.raster import (
    rasterize, resolve_barycentrics, triangle_setup, bin_triangles,
)
from datum_tpu.math.matrix import perspective_proj

W, H = 256, 128   # 2x1 tiles of (32,128) -> tiles_x=2, tiles_y=4
TX, TY = W // 128, H // 32


def ras(clip, tris, **kw):
    kw.setdefault("bin_capacity", 32)
    kw.setdefault("big_capacity", 8)
    return rasterize(jnp.asarray(clip, jnp.float32), jnp.asarray(tris, jnp.int32),
                     width=W, height=H, tiles_x=TX, tiles_y=TY, **kw)


class TestCoverage:
    def test_fullscreen_triangle(self):
        # NDC triangle covering whole screen (w=1 everywhere)
        clip = np.array([[-3, -1, 0.5, 1], [1, -1, 0.5, 1], [1, 3, 0.5, 1]], np.float32)
        # big triangle covering at least the full viewport
        clip = np.array([[-4, -4, 0.5, 1], [4, -4, 0.5, 1], [0, 6, 0.5, 1]], np.float32)
        tris = np.array([[0, 1, 2]])
        depth, vis, _ = ras(clip, tris)
        assert np.all(np.asarray(vis) == 0)
        np.testing.assert_allclose(np.asarray(depth), 0.5, atol=1e-5)

    def test_half_screen_coverage(self):
        # diagonal triangle covering ~half of the unit square viewport
        clip = np.array([[-1, -1, 0.5, 1], [1, -1, 0.5, 1], [-1, 1, 0.5, 1]], np.float32)
        tris = np.array([[0, 1, 2]])
        _, vis, _ = ras(clip, tris)
        frac = (np.asarray(vis) >= 0).mean()
        assert frac == pytest.approx(0.5, abs=0.02)

    def test_empty_outside(self):
        clip = np.array([[2, 2, 0.5, 1], [3, 2, 0.5, 1], [2, 3, 0.5, 1]], np.float32)
        _, vis, _ = ras(clip, np.array([[0, 1, 2]]))
        assert np.all(np.asarray(vis) == -1)

    def test_degenerate_padding(self):
        clip = np.zeros((4, 4), np.float32)
        clip[:, 3] = 1
        _, vis, _ = ras(clip, np.array([[0, 0, 0], [1, 1, 1]]))
        assert np.all(np.asarray(vis) == -1)


class TestDepth:
    def test_reverse_z_ordering(self):
        # two overlapping triangles: nearer (larger reverse-Z depth) wins
        def tri(z):
            return np.array([[-2, -2, z, 1], [2, -2, z, 1], [0, 3, z, 1]], np.float32)

        clip = np.vstack([tri(0.3), tri(0.8)])  # 0.8 = nearer in reverse-Z
        tris = np.array([[0, 1, 2], [3, 4, 5]])
        depth, vis, _ = ras(clip, tris)
        covered = np.asarray(vis) >= 0
        assert covered.any()
        assert np.all(np.asarray(vis)[covered] == 1)
        np.testing.assert_allclose(np.asarray(depth)[covered], 0.8, atol=1e-5)

    def test_draw_order_on_equal_depth_is_last(self):
        def tri(z):
            return np.array([[-2, -2, z, 1], [2, -2, z, 1], [0, 3, z, 1]], np.float32)
        clip = np.vstack([tri(0.5), tri(0.5)])
        depth, vis, _ = ras(clip, np.array([[0, 1, 2], [3, 4, 5]]))
        covered = np.asarray(vis) >= 0
        # strict greater-than depth test: first drawn at equal depth wins
        assert np.all(np.asarray(vis)[covered] == 0)

    def test_perspective_interpolated_depth(self):
        # a "floor" quad receding in z under perspective; check depth at
        # two rows against analytic projection
        proj = perspective_proj(np.radians(90), W / H, 0.1)
        pts = np.array([
            [-10, -1, -0.2], [10, -1, -0.2], [-10, -1, -50], [10, -1, -50]], np.float32)
        hp = np.concatenate([pts, np.ones((4, 1), np.float32)], 1)
        clip = hp @ proj.T
        tris = np.array([[0, 1, 2], [1, 3, 2]])
        depth, vis, _ = ras(clip, tris)
        depth = np.asarray(depth)
        vis = np.asarray(vis)
        # sample a covered pixel, reconstruct its view z, verify it lies on
        # the plane y=-1
        ys, xs = np.nonzero(vis >= 0)
        assert len(ys) > 1000
        for py, px in [(ys[0], xs[0]), (ys[-1], xs[-1])]:
            d = depth[py, px]
            viewz = proj[2, 3] / d          # infinite reverse-Z: z = near/d magnitude
            yn = (py + 0.5) / H * 2 - 1
            # view-space y at that pixel: y = yn * viewz / proj[1,1] (sign folded)
            y_view = yn * viewz / proj[1, 1]
            assert y_view == pytest.approx(-1, abs=0.01)


class TestNearPlane:
    def test_triangle_crossing_w0(self):
        # triangle with one vertex behind the camera must still rasterize
        # its visible part (no clipping needed)
        proj = perspective_proj(np.radians(90), W / H, 0.1)
        pts = np.array([[0, 1, -10], [-5, -1, 5], [5, -1, 5]], np.float32)  # 2 behind
        hp = np.concatenate([pts, np.ones((3, 1), np.float32)], 1)
        clip = hp @ proj.T
        depth, vis, _ = ras(clip, np.array([[0, 1, 2]]))
        vis = np.asarray(vis)
        assert (vis >= 0).any()          # visible portion rasterized
        d = np.asarray(depth)[vis >= 0]
        assert np.all((d > 0) & (d <= 1.0))


class TestBarycentrics:
    def test_resolve_sums_to_one_and_interpolates(self):
        clip = np.array([[-1, -1, 0.5, 1], [1, -1, 0.5, 1], [-1, 1, 0.5, 1]], np.float32)
        tris = np.array([[0, 1, 2]])
        depth, vis, setup = ras(clip, tris)
        lam, mask = resolve_barycentrics(vis, setup, W, H)
        lam = np.asarray(lam)
        mask = np.asarray(mask)
        assert mask.sum() > 100
        np.testing.assert_allclose(lam[mask].sum(-1), 1.0, atol=1e-4)
        # interpolating the vertex x coords reproduces pixel ndc x
        xs = (np.arange(W) + 0.5) / W * 2 - 1
        interp_x = (lam * clip[None, None, :, 0]).sum(-1)
        err = np.abs(interp_x - xs[None, :])[mask]
        assert err.max() < 1e-3

    def test_perspective_correct_attrs(self):
        # receding quad: interpolate view-space z as attribute; perspective
        # correctness means it should match analytic 1/depth relation
        proj = perspective_proj(np.radians(90), W / H, 0.1)
        pts = np.array([
            [-10, -1, -1.0], [10, -1, -1.0], [-10, -1, -20], [10, -1, -20]], np.float32)
        hp = np.concatenate([pts, np.ones((4, 1), np.float32)], 1)
        clip = hp @ proj.T
        tris = np.array([[0, 1, 2], [1, 3, 2]])
        depth, vis, setup = ras(clip, tris)
        lam, mask = resolve_barycentrics(vis, setup, W, H)
        lam, mask, vis = np.asarray(lam), np.asarray(mask), np.asarray(vis)
        zattr = pts[:, 2]
        tri_z = zattr[np.asarray(tris)][np.maximum(vis, 0)]      # (H,W,3)
        interp_z = (lam * tri_z).sum(-1)
        # reconstruct from depth buffer instead: view_z = -near/depth
        d = np.asarray(depth)
        recon = -proj[2, 3] / np.maximum(d, 1e-9)
        err = np.abs(interp_z - recon)[mask] / np.abs(recon[mask])
        assert err.max() < 1e-3


class TestBinning:
    def test_bbox_spans_tiles(self):
        clip = np.array([[-0.9, -0.9, 0.5, 1], [0.9, -0.9, 0.5, 1], [0.0, 0.9, 0.5, 1]],
                        np.float32)
        tris = jnp.asarray(np.array([[0, 1, 2]]), jnp.int32)
        setup = triangle_setup(jnp.asarray(clip), tris, W, H, TX, TY)
        bins, counts, big = bin_triangles(setup, 1, TX, TY, 16, 4)
        counts = np.asarray(counts)
        assert counts.sum() >= 4  # covers multiple tiles
        assert np.all(np.asarray(big) == -1)

    def test_big_triangle_near_plane(self):
        proj = perspective_proj(np.radians(90), W / H, 0.1)
        pts = np.array([[0, 1, -10], [-5, -1, 5], [5, -1, 5]], np.float32)
        hp = np.concatenate([pts, np.ones((3, 1), np.float32)], 1)
        clip = jnp.asarray(hp @ proj.T)
        tris = jnp.asarray(np.array([[0, 1, 2]]), jnp.int32)
        setup = triangle_setup(clip, tris, W, H, TX, TY)
        bins, counts, big = bin_triangles(setup, 1, TX, TY, 16, 4)
        assert np.asarray(big)[0] == 0  # went to the big list
        assert np.asarray(counts).sum() == 0


def test_depth_prio_binning_keeps_nearest():
    import jax.numpy as jnp

    from datum_tpu.ops import raster as R

    # three stacked quads covering the same tile, nearest (reverse-Z
    # largest) pushed LAST — draw-order binning would drop it at cap 4
    clip = []
    tris = []
    for i, z in enumerate((0.2, 0.5, 0.9)):        # far -> near
        b = 4 * i
        clip += [[-1, -1, z, 1], [1, -1, z, 1], [1, 1, z, 1], [-1, 1, z, 1]]
        tris += [[b, b + 1, b + 2], [b, b + 2, b + 3]]
    clip = jnp.asarray(clip, jnp.float32)
    tris = jnp.asarray(tris, jnp.int32)
    setup = R.triangle_setup(clip, tris, 128, 32, 1, 1, max_span=4)
    prio = jnp.clip(setup["zc"].max(axis=1), 0.0, 1.0)

    bins, counts, big, ov = R.bin_triangles(setup, 6, 1, 1, 2, 4, max_span=4,
                                            return_overflow=True,
                                            depth_prio=prio)
    kept = set(np.asarray(bins[0][bins[0] >= 0]).tolist())
    assert int(ov) > 0
    assert kept == {4, 5}, f"nearest triangles not kept: {kept}"

    # draw order without prio keeps the first-pushed (farthest)
    bins2, _, _ = R.bin_triangles(setup, 6, 1, 1, 2, 4, max_span=4)
    kept2 = set(np.asarray(bins2[0][bins2[0] >= 0]).tolist())
    assert kept2 == {0, 1}


class TestKeyCapacity:
    """Dynamic sort-key packing: big tile counts and big triangle counts
    must bin correctly (round-1 bug: fixed 21-bit tile shift overflowed
    int32 at >=1024 tiles, and depth-prio capped T at 2^17)."""

    def _quad_at_tile(self, tx, ty, tiles_x, tiles_y):
        # clip-space quad exactly covering tile (tx, ty), w=1
        w, h = tiles_x * 128, tiles_y * 32
        x0, x1 = tx * 128 / w * 2 - 1, (tx + 1) * 128 / w * 2 - 1
        y0, y1 = ty * 32 / h * 2 - 1, (ty + 1) * 32 / h * 2 - 1
        return [[x0, y0, 0.5, 1], [x1, y0, 0.5, 1], [x1, y1, 0.5, 1], [x0, y1, 0.5, 1]]

    def test_tiles_beyond_1024(self):
        # 8 x 136 = 1088 tiles (> 1023): triangles binned into a
        # high-index tile must land there, not vanish
        tiles_x, tiles_y = 8, 136
        target = (tiles_x - 1, tiles_y - 1)          # tile index 1087
        clip = jnp.asarray(self._quad_at_tile(*target, tiles_x, tiles_y),
                           jnp.float32)
        tris = jnp.asarray([[0, 1, 2], [0, 2, 3]], jnp.int32)
        setup = triangle_setup(clip, tris, tiles_x * 128, tiles_y * 32,
                               tiles_x, tiles_y)
        bins, counts, big = bin_triangles(setup, 2, tiles_x, tiles_y, 8, 4)
        tid = target[1] * tiles_x + target[0]
        assert int(counts[tid]) == 2
        assert set(np.asarray(bins[tid][:2]).tolist()) == {0, 1}
        assert int(counts.sum()) == 2                # nowhere else

    def test_depth_prio_large_t(self):
        # T > 2^17 with depth_prio (the default-config shadow shape):
        # packing must still sort/bin correctly with reduced dq bits
        T = (1 << 17) + 8
        clip = jnp.asarray(self._quad_at_tile(0, 0, 1, 1) , jnp.float32)
        tris = jnp.zeros((T, 3), jnp.int32)
        # only the last two triangles are real
        tris = tris.at[T - 2].set(jnp.asarray([0, 1, 2]))
        tris = tris.at[T - 1].set(jnp.asarray([0, 2, 3]))
        setup = triangle_setup(clip, tris, 128, 32, 1, 1)
        prio = jnp.clip(setup["zc"].max(axis=1), 0.0, 1.0)
        bins, counts, big = bin_triangles(setup, T, 1, 1, 8, 4,
                                          depth_prio=prio)
        assert int(counts[0]) == 2
        assert set(np.asarray(bins[0][:2]).tolist()) == {T - 2, T - 1}


def test_default_frameconfig_renders():
    """FrameConfig() defaults must produce a frame (round-1 bug: the
    4-cascade shadow stream exceeded the depth-prio key capacity at the
    default max_triangles=65536)."""
    from datum_tpu.render import (Camera, RenderContext, RenderList,
                                  RenderParams, primitives)

    ctx = RenderContext()                            # all defaults
    verts, idx = primitives.unit_sphere(12, 6)
    mesh = ctx.add_mesh(verts, idx)
    cam = Camera()
    cam.set_projection(np.radians(60),
                       ctx.config.width / ctx.config.height)
    cam.lookat(np.array([0.0, 1.0, 3.0]), np.array([0.0, 0.5, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    rl = RenderList()
    rl.push_mesh(mesh, np.eye(4, dtype=np.float32), ctx.default_material)
    params = RenderParams(width=ctx.config.width, height=ctx.config.height)
    img = ctx.render(cam, rl, params)
    assert img.shape[0] == ctx.config.height
    assert (img.max(-1) > 0).any()
