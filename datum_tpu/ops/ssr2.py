"""Screen-space reflections v2 — direction-binned dense march.

TPU-native reformulation of the reference Hi-Z SSR (reference:
data/ssr.comp McGuire DDA + mip walk).  Per-pixel rays make every march
sample a data-dependent 2-D gather — the TPU wall.  Instead:

  1. each pixel's screen-space ray direction is quantized to K bins;
  2. for bin k, step s, the sample position is a UNIFORM image shift
     (static offset) — jnp.roll, which is free on TPU;
  3. the ray's 1/z is LINEAR in screen distance (perspective-correct),
     so the depth test against the shifted buffer is elementwise.

The march is K*S dense passes with ~8 VPU ops each — ~1-2 ms at
quarter res versus ~25+ ms for gather-based DDA.  Quantization costs
angular precision (reflection rays snap to 360/K-degree sectors), hidden
by the roughness/edge fades and the blur of compositing at quarter res.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import brdf
from .lighting_pass import _inv_proj

K_BINS = 8
STEPS = (2, 4, 7, 11, 16, 23, 32, 44, 60, 80, 104, 134)   # pixels (input res)
THICKNESS = 1.5         # acceptance band in 1/z units scaled by gradient


def ssr_binned(hdr_color, depth, normal_enc, spec_rgb, roughness, mask,
               proj, view, envbrdf_lut=None):
    """hdr_color (H, W, 3); depth (H, W) reverse-Z; normal_enc (H, W, 3)
    encoded *0.5+0.5 world normals; spec_rgb/roughness per pixel; mask
    coverage.  Returns (H, W, 4): rgb premultiplied, a = strength."""
    h, w = depth.shape
    invp = _inv_proj(proj)
    yn = ((jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0 - 1.0)[:, None]
    xn = ((jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0)[None, :]
    denom = depth + proj[2, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-7, 1e-7, denom)
    dist = proj[2, 3] / denom
    pos = jnp.stack([invp[0, 0] * xn * dist, invp[1, 1] * yn * dist, -dist],
                    -1)

    n_world = normal_enc * 2.0 - 1.0
    normal = n_world @ view[:3, :3].T
    eyevec = brdf.normalize(-pos)
    refl = brdf.normalize(pos - 2.0 * jnp.sum(pos * normal, -1,
                                              keepdims=True) * normal)
    # march only plausibly-reflective pixels (reference fade criteria)
    active = (roughness < 0.4) & mask & (refl[..., 2] < -0.02)

    # screen position/direction of the ray: project pos and pos + refl*e
    def to_screen(p):
        zc = jnp.maximum(-p[..., 2], 1e-6)
        sx = (proj[0, 0] * p[..., 0] / zc * 0.5 + 0.5) * w
        sy = (proj[1, 1] * p[..., 1] / zc * 0.5 + 0.5) * h
        return sx, sy

    eps = 0.25
    p1 = pos + refl * eps
    sx0, sy0 = to_screen(pos)
    sx1, sy1 = to_screen(p1)
    ddx = sx1 - sx0
    ddy = sy1 - sy0
    dlen = jnp.sqrt(jnp.maximum(ddx * ddx + ddy * ddy, 1e-12))
    # a reflection collinear with the view ray has ~zero screen-space
    # motion: its clamped dlen would explode g and the acceptance band,
    # recording a spurious first-step hit in an arbitrary bin — such
    # pixels can't be marched in screen space at all
    active = active & (dlen > 1e-3)
    ux = ddx / dlen                       # unit screen direction
    uy = ddy / dlen
    # 1/z gradient per unit screen distance (1/z is linear in screen)
    iz0 = 1.0 / jnp.maximum(-pos[..., 2], 1e-6)
    iz1 = 1.0 / jnp.maximum(-p1[..., 2], 1e-6)
    g = (iz1 - iz0) / dlen

    # direction bin per pixel
    ang = jnp.arctan2(uy, ux)
    binf = jnp.mod(ang / (2.0 * np.pi) * K_BINS + 0.5, K_BINS)
    bin_id = jnp.floor(binf).astype(jnp.int32)

    iz_scene = iz0                 # the surface's own 1/z field

    ii = jnp.arange(h, dtype=jnp.int32)[:, None]
    jj = jnp.arange(w, dtype=jnp.int32)[None, :]

    hit = jnp.zeros((h, w), jnp.bool_)
    hit_color = jnp.zeros((h, w, 3), jnp.float32)
    hit_r = jnp.zeros((h, w), jnp.float32)

    # padded STATIC slices instead of jnp.roll (same rewrite as
    # ops/ssao.py's ladder): each 2-axis roll lowered to slice+concat
    # pairs that do NOT fuse — the K_BINS*len(STEPS) march carried 288
    # rolls ≈ 575 standalone HBM-streaming dispatches per frame, the
    # single biggest population of the frame's 5-100 us mid-band
    # (profiling/hlo_census.py).  Slices of one padded plane fuse into
    # the consuming elementwise step for free.  Out-of-bounds taps read
    # the pad (zeros) and are rejected by the same `inb` mask that
    # previously neutralized roll wraparound, and a wrapped (now
    # padded) `prev_above` sample only matters at a LATER step of the
    # same outward march, which is itself out of bounds — bit-identical
    # results (test_pass_kernels.py::test_ssr_pad_slices_match_rolls).
    M = int(STEPS[-1])
    izp = jnp.pad(iz_scene, ((M, M), (M, M)))
    dp = jnp.pad(depth, ((M, M), (M, M)))
    cp = jnp.pad(hdr_color, ((M, M), (M, M), (0, 0)))

    for k in range(K_BINS):
        a = 2.0 * np.pi * k / K_BINS
        bx, by = np.cos(a), np.sin(a)
        sel = bin_id == k
        prev_above = jnp.ones((h, w), jnp.bool_)
        for r in STEPS:
            dx = int(round(bx * r))
            dy = int(round(by * r))
            sc_iz = izp[M + dy:M + dy + h, M + dx:M + dx + w]
            sc_d = dp[M + dy:M + dy + h, M + dx:M + dx + w]
            inb = ((ii + dy >= 0) & (ii + dy < h)
                   & (jj + dx >= 0) & (jj + dx < w))
            ray_iz = iz0 + g * r
            # crossing: ray goes behind the surface within a band
            band = THICKNESS * (jnp.abs(g) * r + 2e-3)
            crossed = (ray_iz <= sc_iz) & (ray_iz >= sc_iz - band) \
                & (sc_d > 0) & inb & prev_above
            newhit = sel & crossed & (~hit)
            sc_c = cp[M + dy:M + dy + h, M + dx:M + dx + w]
            hit_color = jnp.where(newhit[..., None], sc_c, hit_color)
            hit_r = jnp.where(newhit, jnp.float32(r), hit_r)
            hit = hit | newhit
            prev_above = prev_above & (ray_iz > sc_iz - band)

    # fades (reference: ssr.comp:195-205 adapted)
    maxr = float(STEPS[-1])
    distancefade = 1.0 - jnp.minimum(hit_r / maxr, 1.0)
    roughnessfade = 1.0 - jnp.minimum(2.5 * roughness, 1.0)
    anglefade = jnp.clip(-refl[..., 2] * 10.0, 0.0, 1.0)
    # screen-edge fade at the hit position
    hx = jnp.clip((jj + 0.5) / w + ux * hit_r / w, 0.0, 1.0)
    hy = jnp.clip((ii + 0.5) / h + uy * hit_r / h, 0.0, 1.0)
    edgefade = 1.0 - 10.0 * jnp.clip(
        jnp.maximum(jnp.abs(hx - 0.5), jnp.abs(hy - 0.5)) - 0.4, 0.0, 0.1)

    ndv = jnp.clip(jnp.sum(normal * eyevec, -1), 0.0, 1.0)
    if envbrdf_lut is not None:
        s = envbrdf_lut.shape[0]
        flat = envbrdf_lut.reshape(-1, envbrdf_lut.shape[-1])
        bi = jnp.clip((roughness * (s - 1)).astype(jnp.int32), 0, s - 1)
        bj = jnp.clip((ndv * (s - 1)).astype(jnp.int32), 0, s - 1)
        eb = flat[bi * s + bj]
        weight = eb[..., 0:1] * spec_rgb + eb[..., 1:2]
    else:
        weight = spec_rgb

    fade = (distancefade * roughnessfade * anglefade * edgefade
            * hit.astype(jnp.float32) * active.astype(jnp.float32))
    rgb = hit_color * weight
    return jnp.concatenate([rgb, jnp.clip(fade, 0, 1)[..., None]], -1)
