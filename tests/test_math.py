"""Math layer unit tests: dual-quat transforms vs matrix algebra, bounds, frusta."""

import numpy as np
import pytest

from datum_tpu.math import (
    Bound3, Frustum, Transform, normalize, perspective_proj, orthographic_proj,
    look_at_matrix, quat_axis_angle, quat_rotate, quat_to_matrix, quat_mul, quat_conj,
)
from datum_tpu.math.transform import tf_lerp, tf_blend
from datum_tpu.math.matrix import proj_depth, view_depth
from datum_tpu.math import color


def random_transform(rng):
    axis = normalize(rng.randn(3))
    t = Transform.rotation(axis, rng.uniform(-np.pi, np.pi))
    return Transform.translation(rng.randn(3) * 5) * t


class TestQuaternion:
    def test_rotate_matches_matrix(self, rng):
        q = quat_axis_angle(normalize(rng.randn(3)), 1.234)
        v = rng.randn(10, 3).astype(np.float32)
        np.testing.assert_allclose(quat_rotate(q, v), v @ quat_to_matrix(q).T, atol=1e-5)

    def test_mul_compose(self, rng):
        q1 = quat_axis_angle([0, 0, 1], 0.5)
        q2 = quat_axis_angle([1, 0, 0], 0.7)
        v = rng.randn(3).astype(np.float32)
        np.testing.assert_allclose(
            quat_rotate(quat_mul(q1, q2), v), quat_rotate(q1, quat_rotate(q2, v)), atol=1e-5)

    def test_conj_inverse(self, rng):
        q = quat_axis_angle(normalize(rng.randn(3)), 0.9)
        v = rng.randn(3).astype(np.float32)
        np.testing.assert_allclose(quat_rotate(quat_conj(q), quat_rotate(q, v)), v, atol=1e-5)


class TestTransform:
    def test_identity(self):
        t = Transform.identity()
        np.testing.assert_allclose(t.transform_point([1.0, 2.0, 3.0]), [1, 2, 3], atol=1e-6)

    def test_translation_roundtrip(self):
        t = Transform.translation([3.0, -4.0, 5.0])
        np.testing.assert_allclose(t.translation_vec(), [3, -4, 5], atol=1e-6)

    def test_compose_matches_matrix(self, rng):
        for _ in range(5):
            a, b = random_transform(rng), random_transform(rng)
            ab = a * b
            np.testing.assert_allclose(ab.matrix(), a.matrix() @ b.matrix(), atol=1e-4)

    def test_transform_point_matches_matrix(self, rng):
        t = random_transform(rng)
        p = rng.randn(7, 3).astype(np.float32)
        hp = np.concatenate([p, np.ones((7, 1), np.float32)], axis=1)
        expect = (t.matrix() @ hp.T).T[:, :3]
        np.testing.assert_allclose(t.transform_point(p), expect, atol=1e-4)

    def test_inverse(self, rng):
        t = random_transform(rng)
        p = rng.randn(3).astype(np.float32)
        np.testing.assert_allclose(t.inverse().transform_point(t.transform_point(p)), p, atol=1e-4)

    def test_lookat_places_camera(self):
        t = Transform.lookat([0.0, 0.0, 5.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
        np.testing.assert_allclose(t.translation_vec(), [0, 0, 5], atol=1e-5)
        # camera looks down -z in its own frame: world origin should be at
        # local (0,0,-5)
        np.testing.assert_allclose(t.inverse().transform_point([0.0, 0.0, 0.0]), [0, 0, -5], atol=1e-5)

    def test_flat_roundtrip(self, rng):
        t = random_transform(rng)
        t2 = Transform.from_flat(t.flat())
        np.testing.assert_allclose(t2.matrix(), t.matrix(), atol=1e-6)

    def test_lerp_endpoints(self, rng):
        a, b = random_transform(rng), random_transform(rng)
        np.testing.assert_allclose(tf_lerp(a, b, 0.0).matrix(), a.matrix(), atol=1e-4)
        np.testing.assert_allclose(tf_lerp(a, b, 1.0).matrix(), b.matrix(), atol=1e-4)

    def test_blend_normalise_is_weighted_mix(self, rng):
        a = random_transform(rng)
        blended = tf_blend(a, a, 1.0).normalized()
        np.testing.assert_allclose(blended.matrix(), a.matrix(), atol=1e-4)


class TestProjection:
    def test_reverse_z(self):
        proj = perspective_proj(np.radians(60), 16 / 9, 0.1, 1000.0)
        # near plane -> depth ~1, far plane -> depth ~0
        near = proj @ np.array([0, 0, -0.1, 1], np.float32)
        far = proj @ np.array([0, 0, -1000.0, 1], np.float32)
        assert near[2] / near[3] == pytest.approx(1.0, abs=1e-4)
        assert far[2] / far[3] == pytest.approx(0.0, abs=1e-4)

    def test_infinite_far(self):
        proj = perspective_proj(np.radians(60), 16 / 9, 0.1)
        near = proj @ np.array([0, 0, -0.1, 1], np.float32)
        assert near[2] / near[3] == pytest.approx(1.0, abs=1e-5)
        far = proj @ np.array([0, 0, -1e9, 1], np.float32)
        assert far[2] / far[3] == pytest.approx(0.0, abs=1e-5)

    def test_y_flipped(self):
        proj = perspective_proj(np.radians(60), 1.0, 0.1)
        up = proj @ np.array([0, 1, -1, 1], np.float32)
        assert up[1] / up[3] < 0  # world up maps to -y clip (Vulkan-style)

    def test_depth_reconstruction(self):
        proj = perspective_proj(np.radians(60), 16 / 9, 0.1)
        for z in (-0.5, -10.0, -500.0):
            d = proj_depth(proj, z)
            assert view_depth(proj, d) == pytest.approx(-z, rel=1e-4)

    def test_ortho_reverse_z(self):
        proj = orthographic_proj(-10, 10, -10, 10, 1.0, 100.0)
        near = proj @ np.array([0, 0, -1.0, 1], np.float32)
        far = proj @ np.array([0, 0, -100.0, 1], np.float32)
        assert near[2] == pytest.approx(1.0, abs=1e-5)
        assert far[2] == pytest.approx(0.0, abs=1e-5)


class TestFrustum:
    def _vp(self):
        proj = perspective_proj(np.radians(90), 1.0, 0.1, 100.0)
        view = look_at_matrix(np.array([0.0, 0, 0]), np.array([0.0, 0, -1]), np.array([0.0, 1, 0]))
        return proj @ view

    def test_point_containment(self):
        f = Frustum.from_viewproj(self._vp())
        assert f.contains_point([0, 0, -5])
        assert not f.contains_point([0, 0, 5])
        assert not f.contains_point([0, 0, -200])
        assert not f.contains_point([20, 0, -5])

    def test_sphere(self):
        f = Frustum.from_viewproj(self._vp())
        assert f.intersects_sphere([0, 0, 1.0], 2.0)  # behind but overlapping near
        assert not f.intersects_sphere([0, 0, 10.0], 2.0)

    def test_bounds_vectorized(self):
        f = Frustum.from_viewproj(self._vp())
        mins = np.array([[-1, -1, -6], [30, 30, -6], [-1, -1, -300]], np.float32)
        maxs = mins + 2
        np.testing.assert_array_equal(f.intersects_bounds(mins, maxs), [True, False, False])


class TestBound:
    def test_transformed(self, rng):
        b = Bound3([-1, -2, -3], [1, 2, 3])
        t = random_transform(rng)
        tb = b.transformed(t)
        # every transformed corner is inside
        corners = np.array([[x, y, z] for x in (-1, 1) for y in (-2, 2) for z in (-3, 3)], np.float32)
        moved = t.transform_point(corners)
        assert np.all(moved >= tb.min - 1e-4) and np.all(moved <= tb.max + 1e-4)


class TestColor:
    def test_rgba_roundtrip(self, rng):
        c = rng.rand(16, 4).astype(np.float32)
        out = color.unpack_rgba(color.pack_rgba(c))
        np.testing.assert_allclose(out, c, atol=1 / 255.0 + 1e-6)

    def test_rgbe_roundtrip(self, rng):
        c = (rng.rand(32, 3).astype(np.float32) * 100).astype(np.float32)
        out = color.unpack_rgbe(color.pack_rgbe(c))
        # 9-bit mantissa shared exponent: error bounded by half a step of
        # the row max's scale, 2^e/511 with 2^e <= 2*rowmax
        step = 2.0 * c.max(axis=-1, keepdims=True) / 511.0
        assert np.all(np.abs(out - c) <= step * 0.75 + 1e-4)

    def test_rgbm_roundtrip(self, rng):
        c = rng.rand(32, 3).astype(np.float32) * 6.0
        out = color.unpack_rgbm(color.pack_rgbm(c))
        np.testing.assert_allclose(out, c, atol=0.1)


def test_perlin_range_and_determinism():
    from datum_tpu.math import PerlinEngine

    eng = PerlinEngine(seed=7)
    xs, ys = np.meshgrid(np.linspace(0, 10, 64), np.linspace(0, 10, 64))
    n = eng.noise2(xs, ys)
    assert n.shape == (64, 64)
    assert np.all(np.abs(n) <= 1.5)
    assert n.std() > 0.05
    n2 = PerlinEngine(seed=7).noise2(xs, ys)
    np.testing.assert_array_equal(n, n2)
