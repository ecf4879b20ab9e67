"""Vector helpers over NumPy arrays.

Semantics follow the reference math layer (reference: src/math/vec.h,
which views vectors through leap::lml::VectorView).  We use raw
float32 ndarrays — shape (2,), (3,), (4,) or batched (..., N) — instead
of wrapper classes; every helper broadcasts over leading dimensions.
"""

from __future__ import annotations

import numpy as np


def vec2(x, y=None):
    if y is None:
        return np.asarray(x, dtype=np.float32).reshape(2)
    return np.array([x, y], dtype=np.float32)


def vec3(x, y=None, z=None):
    if y is None:
        a = np.asarray(x, dtype=np.float32)
        return a.reshape(3) if a.size == 3 else np.full(3, float(x), np.float32)
    return np.array([x, y, z], dtype=np.float32)


def vec4(x, y=None, z=None, w=None):
    if y is None:
        return np.asarray(x, dtype=np.float32).reshape(4)
    return np.array([x, y, z, w], dtype=np.float32)


def dot(a, b, axis=-1):
    return np.sum(np.asarray(a) * np.asarray(b), axis=axis)


def length(a, axis=-1):
    return np.sqrt(dot(a, a, axis=axis))


def normalize(a, axis=-1, eps=0.0):
    a = np.asarray(a, dtype=np.float32)
    n = length(a, axis=axis)
    return a / np.maximum(np.expand_dims(n, axis), eps if eps else np.finfo(np.float32).tiny)


def cross(a, b):
    return np.cross(np.asarray(a, np.float32), np.asarray(b, np.float32)).astype(np.float32)


def lerp(a, b, t):
    return np.asarray(a) + (np.asarray(b) - np.asarray(a)) * t


def clamp(x, lo, hi):
    return np.minimum(np.maximum(x, lo), hi)


def orthogonal(v, n):
    """Component of v orthogonal to n (Gram-Schmidt step)."""
    v = np.asarray(v, np.float32)
    n = np.asarray(n, np.float32)
    return v - n * (dot(v, n) / np.maximum(dot(n, n), 1e-20))[..., None]


def perp(v):
    """Any unit vector perpendicular to v (3d)."""
    v = normalize(v)
    a = np.array([1.0, 0.0, 0.0], np.float32)
    if abs(float(dot(v, a))) > 0.9:
        a = np.array([0.0, 1.0, 0.0], np.float32)
    return normalize(cross(v, a))
