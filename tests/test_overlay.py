"""Host overlay compositor: lines, wireframe, gizmo, outline, fill."""

import numpy as np

from datum_tpu.math import Transform
from datum_tpu.math.matrix import perspective_proj
from datum_tpu.render import overlay, primitives


def _vp(eye=(0, 0, 6.0)):
    view = np.asarray(Transform.lookat(
        np.asarray(eye, np.float32), np.zeros(3, np.float32),
        np.array([0, 1, 0], np.float32)).matrix(), np.float32)
    proj = np.asarray(perspective_proj(np.radians(60), 2.0, 0.1), np.float32)
    return proj @ np.linalg.inv(view)


def test_lines_and_gizmo_draw_pixels():
    img = np.zeros((128, 256, 3), np.uint8)
    vp = _vp()
    overlay.draw_lines(img, [[[-1, 0, 0], [1, 0, 0]]], vp, (255, 0, 0))
    assert (img[:, :, 0] > 0).sum() > 30
    overlay.draw_gizmo(img, Transform.identity(), vp, size=1.0)
    assert (img[:, :, 1] > 0).sum() > 5 and (img[:, :, 2] > 0).sum() > 5


def test_wireframe_and_outline():
    img = np.zeros((128, 256, 3), np.uint8)
    vp = _vp()
    cv, ci = primitives.unit_cube()
    overlay.draw_wireframe(img, cv["position"], ci, Transform.identity(), vp)
    n_wire = (img.max(-1) > 0).sum()
    assert n_wire > 100

    img2 = np.zeros((128, 256, 3), np.uint8)
    overlay.draw_outline(img2, cv["position"], ci, Transform.identity(), vp,
                         campos=[0, 0, 6.0])
    n_out = (img2.max(-1) > 0).sum()
    # outline = silhouette only: fewer pixels than the full wireframe
    assert 30 < n_out < n_wire


def test_depth_tested_lines():
    """Overlay draws hide behind scene geometry when given the frame's
    reverse-Z depth plane (reference: the OVERLAY pass depth-tests
    against the scene depth attachment, renderer.cpp:6760-6789)."""
    vp = _vp()
    h, w = 128, 256

    # synthetic scene depth: left half has a very near wall (big z/w),
    # right half is empty (0 = far plane in reverse-Z)
    depth = np.zeros((h, w), np.float32)
    depth[:, : w // 2] = 10.0

    img = np.zeros((h, w, 3), np.uint8)
    overlay.draw_lines(img, [[[-1, 0, 0], [1, 0, 0]]], vp, (255, 0, 0),
                       depth=depth)
    left = (img[:, : w // 2, 0] > 0).sum()
    right = (img[:, w // 2:, 0] > 0).sum()
    assert left == 0 and right > 10

    # half-res depth plane (FrameConfig.scale path): indices rescale
    depth_half = depth[::2, ::2].copy()
    img2 = np.zeros((h, w, 3), np.uint8)
    overlay.draw_lines(img2, [[[-1, 0, 0], [1, 0, 0]]], vp, (255, 0, 0),
                       depth=depth_half)
    assert (img2[:, : w // 2, 0] > 0).sum() == 0
    assert (img2[:, w // 2:, 0] > 0).sum() > 10

    # a line ON the surface wins via the relative bias (coplanar
    # wireframes draw instead of z-fighting away)
    seg = np.array([[[-1, 0, 0], [1, 0, 0]]], np.float32)
    x, y, ok, z = overlay._project(seg.reshape(-1, 3), vp, w, h)
    coplanar = np.zeros((h, w), np.float32)
    coplanar[:] = z[0]                      # scene exactly at line depth
    img3 = np.zeros((h, w, 3), np.uint8)
    overlay.draw_lines(img3, seg, vp, (255, 0, 0), depth=coplanar)
    assert (img3[:, :, 0] > 0).sum() > 30


def test_fill_and_path():
    img = np.zeros((64, 64, 3), np.uint8)
    overlay.draw_fill(img, [[10, 10], [50, 10], [50, 40], [10, 40]],
                      (0, 128, 255))
    assert img[25, 30, 2] == 255 and img[25, 30, 1] == 128
    assert img[5, 5].max() == 0 and img[50, 30].max() == 0

    img3 = np.zeros((64, 64, 3), np.uint8)
    overlay.draw_path(img3, [[5, 5], [60, 5], [60, 60]], color=(255, 255, 0))
    assert (img3[5, 5:60, 0] > 0).mean() > 0.9
