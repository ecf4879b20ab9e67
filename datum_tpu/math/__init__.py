"""Host-side math library (NumPy).

Mirrors the semantics of the reference math layer (reference:
src/math/*.h, which extends leap::lml) — dual-quaternion rigid
transforms, bounds, frusta, color codecs — but as plain NumPy
functions/value types.  Device-side (jnp) equivalents of the hot
subset live in datum_tpu/ops/dquat.py and are cross-checked against
this module in tests.
"""

from .vec import (
    vec2, vec3, vec4, normalize, cross, dot, length, lerp, clamp,
    orthogonal, perp,
)
from .quaternion import (
    quat, quat_axis_angle, quat_mul, quat_conj, quat_rotate, quat_from_axes,
    quat_slerp, quat_to_matrix,
)
from .transform import Transform
from .matrix import (
    perspective_proj, orthographic_proj, look_at_matrix, mat4_inverse,
)
from .bound import Bound3, Sphere, Plane, Frustum, bound_union, bound_expand
from . import color
from .perlin import PerlinEngine
