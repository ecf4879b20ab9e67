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


def test_fill_and_path():
    img = np.zeros((64, 64, 3), np.uint8)
    overlay.draw_fill(img, [[10, 10], [50, 10], [50, 40], [10, 40]],
                      (0, 128, 255))
    assert img[25, 30, 2] == 255 and img[25, 30, 1] == 128
    assert img[5, 5].max() == 0 and img[50, 30].max() == 0

    img3 = np.zeros((64, 64, 3), np.uint8)
    overlay.draw_path(img3, [[5, 5], [60, 5], [60, 60]], color=(255, 255, 0))
    assert (img3[5, 5:60, 0] > 0).mean() > 0.9
