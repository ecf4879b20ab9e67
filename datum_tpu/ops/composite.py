"""Tonemap + color grade + final composite.

Numerics match the reference post chain (reference: data/camera.inc
tonemap = uncharted2 filmic with 2x pre-exposure and white point 11.2,
colorgrad 3D-LUT; data/composite.frag:41-69 combine order).
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import srgb_encode


def filmic_uncharted2(color):
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    x = jnp.maximum(color, 0.0)
    return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f


def filmic_aces(color):
    x = jnp.maximum(color, 0.0)
    return (x * (2.51 * x + 0.03)) / (x * (2.43 * x + 0.59) + 0.14)


def reinhard(color):
    return color / (color + 1.0)


def _filmic_white(x=11.2):
    a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30
    return ((x * (a * x + c * b) + d * e) / (x * (a * x + b) + d * f)) - e / f


_WHITE = _filmic_white()  # plain float: safe across jit traces


def tonemap(color):
    """Default tonemap (reference: camera.inc tonemap)."""
    return filmic_uncharted2(2.0 * color) * (1.0 / _WHITE)


def color_grade(lut, color):
    """3D LUT grade with trilinear sampling.

    lut: (S, S, S, 3) indexed [b, g, r]; color in [0,1]
    (reference: camera.inc colorgrad — 32^3 LUT, half-texel offset).
    """
    s = lut.shape[0]
    c = jnp.clip(color, 0.0, 1.0) * (s - 1)
    c0 = jnp.floor(c).astype(jnp.int32)
    c1 = jnp.minimum(c0 + 1, s - 1)
    f = c - c0
    r0, g0, b0 = c0[..., 0], c0[..., 1], c0[..., 2]
    r1, g1, b1 = c1[..., 0], c1[..., 1], c1[..., 2]
    fr, fg, fb = f[..., 0:1], f[..., 1:2], f[..., 2:3]

    def L(b, g, r):
        return lut[b, g, r]

    c00 = L(b0, g0, r0) * (1 - fr) + L(b0, g0, r1) * fr
    c01 = L(b0, g1, r0) * (1 - fr) + L(b0, g1, r1) * fr
    c10 = L(b1, g0, r0) * (1 - fr) + L(b1, g0, r1) * fr
    c11 = L(b1, g1, r0) * (1 - fr) + L(b1, g1, r1) * fr
    c0_ = c00 * (1 - fg) + c01 * fg
    c1_ = c10 * (1 - fg) + c11 * fg
    return c0_ * (1 - fb) + c1_ * fb


def composite(hdr, exposure, *, bloom=None, bloom_strength=0.0, ssr=None,
              dof_blur=None, dof_amount=None, lut=None, glow=None):
    """Combine HDR color + effects, tonemap, optional grade -> display RGB.

    Mirrors the composite pass combine order (reference:
    data/composite.frag): SSR add, DoF mix, bloom add, exposure,
    tonemap, LUT grade.  Returns float RGB in [0,1] (sRGB-encoded).

    glow: pre-combined additive term (SSR*weight + bloom summed at
    quarter res, ONE shared upsample) — only valid when DoF is off,
    where the reference combine order makes the two adds associative.
    """
    color = hdr
    if glow is not None:
        color = color + glow
    if ssr is not None:
        color = color + ssr[..., :3] * ssr[..., 3:4]
    if dof_blur is not None and dof_amount is not None:
        color = color + (dof_blur - color) * dof_amount[..., None]
    if bloom is not None:
        color = color + bloom * bloom_strength
    color = tonemap(color * exposure)
    if lut is not None:
        color = color_grade(lut, color)
    else:
        pass
    return srgb_encode(color)


def to_u8_image(rgb):
    return jnp.clip(rgb * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
