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


def _poly_terms(degree):
    """Monomial exponent triples (i, j, k) with i+j+k <= degree."""
    return [(i, j, k) for i in range(degree + 1)
            for j in range(degree + 1 - i)
            for k in range(degree + 1 - i - j)]


def fit_lut_poly(lut, degree=4):
    """Fit a 3D grading LUT with a polynomial transfer (host, numpy).

    Per-pixel 3D-LUT sampling is 8 random gathers — the TPU wall
    (PERF.md lesson 1: ~15-25 ms per 2M lookups).  Typical film grades
    are SMOOTH functions of RGB, so we least-squares-fit the LUT grid
    with a degree-`degree` trivariate polynomial per output channel
    (35 terms at degree 4) and evaluate it as one fused elementwise
    chain on the VPU: zero gathers (reference behavior:
    data/camera.inc colorgrad 3D-LUT tap).

    Returns (coeffs (T, 3) float32, max_abs_err) — the caller decides
    whether the fit is close enough to replace the exact trilinear tap.
    """
    import numpy as np

    lut = np.asarray(lut, np.float32)
    s = lut.shape[0]
    g = np.linspace(0.0, 1.0, s, dtype=np.float32)
    b, gg, r = np.meshgrid(g, g, g, indexing="ij")     # lut is [b, g, r]
    terms = _poly_terms(degree)
    A = np.stack([(r ** i) * (gg ** j) * (b ** k)
                  for (i, j, k) in terms], -1).reshape(-1, len(terms))
    y = lut.reshape(-1, 3)
    coeffs, *_ = np.linalg.lstsq(A, y, rcond=None)
    err = float(np.abs(A @ coeffs - y).max())
    return coeffs.astype(np.float32), err


def color_grade_poly(coeffs, color, degree=None):
    """Polynomial grading transfer (see fit_lut_poly): dense VPU math,
    no memory lookups.  color in [0,1]; coeffs (T, 3)."""
    if degree is None:                 # infer from the term count
        degree = 1
        while len(_poly_terms(degree)) != coeffs.shape[0]:
            degree += 1
            assert degree <= 8, "coeffs length matches no degree <= 8"
    c = jnp.clip(color, 0.0, 1.0)
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    rp = [jnp.ones_like(r), r]
    gp = [jnp.ones_like(g), g]
    bp = [jnp.ones_like(b), b]
    for _ in range(degree - 1):
        rp.append(rp[-1] * r)
        gp.append(gp[-1] * g)
        bp.append(bp[-1] * b)
    out = [jnp.zeros_like(r) for _ in range(3)]
    for t, (i, j, k) in enumerate(_poly_terms(degree)):
        m = rp[i] * gp[j] * bp[k]
        for ch in range(3):
            out[ch] = out[ch] + coeffs[t, ch] * m
    return jnp.clip(jnp.stack(out, -1), 0.0, 1.0)


def composite(hdr, exposure, *, bloom=None, bloom_strength=0.0, ssr=None,
              dof_blur=None, dof_amount=None, lut=None, lut_poly=None,
              glow=None):
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
    if lut_poly is not None:
        color = color_grade_poly(lut_poly, color)
    elif lut is not None:
        color = color_grade(lut, color)
    return srgb_encode(color)


def to_u8_image(rgb):
    return jnp.clip(rgb * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
