"""4x4 matrix helpers (column-vector convention: clip = M @ v).

Projection conventions follow the reference renderer (reference:
src/renderer/camera.cpp:77-92): Y-flipped, reverse-Z, with the
far plane pushed to infinity when zfar >> znear (proj[2][2] =
zfar/(zfar-znear) - 1 -> 0 as zfar -> inf, so depth = znear / -z).
Reverse-Z means depth 1.0 at the near plane and 0.0 at infinity;
the depth buffer clears to 0 and the depth test is greater-than.
"""

from __future__ import annotations

import numpy as np


def perspective_proj(fov, aspect, znear, zfar=None):
    """Reverse-Z, Y-flipped perspective projection.

    With zfar=None produces the infinite-far-plane variant the renderer
    uses for the main camera.
    """
    proj = np.zeros((4, 4), np.float32)
    t = np.tan(fov / 2)
    proj[0, 0] = 1.0 / (aspect * t)
    proj[1, 1] = -1.0 / t
    if zfar is None:
        proj[2, 2] = 0.0
        proj[2, 3] = znear
    else:
        proj[2, 2] = zfar / (zfar - znear) - 1.0
        proj[2, 3] = zfar * znear / (zfar - znear)
    proj[3, 2] = -1.0
    return proj


def orthographic_proj(left, right, bottom, top, znear, zfar):
    """Reverse-Z orthographic projection (used for shadow cascades)."""
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = 2.0 / (right - left)
    proj[1, 1] = 2.0 / (top - bottom)
    proj[2, 2] = 1.0 / (zfar - znear)
    proj[0, 3] = -(right + left) / (right - left)
    proj[1, 3] = -(top + bottom) / (top - bottom)
    proj[2, 3] = zfar / (zfar - znear)
    proj[3, 3] = 1.0
    return proj


def look_at_matrix(eye, target, up):
    """World->view matrix for a right-handed camera looking down -Z."""
    eye = np.asarray(eye, np.float32)
    f = target - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3] = s
    m[1, :3] = u
    m[2, :3] = -f
    m[:3, 3] = -m[:3, :3] @ eye
    return m


def mat4_inverse(m):
    return np.linalg.inv(np.asarray(m, np.float64)).astype(np.float32)


def proj_depth(proj, view_z):
    """Clip depth for a view-space z (negative in front of camera).

    Matches the gbuffer depth reconstruction contract (reference:
    data/gbuffer.inc proj_depth/view_depth).
    """
    return (proj[2, 2] * view_z + proj[2, 3]) / -view_z


def view_depth(proj, depth):
    """Positive view-space distance from clip depth.

    Inverse of proj_depth up to sign: view_depth(proj_depth(z)) == -z
    for z < 0 (in front of the camera).
    """
    return proj[2, 3] / (depth + proj[2, 2])
