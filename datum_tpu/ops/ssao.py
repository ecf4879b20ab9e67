"""HBAO — horizon-based ambient occlusion with spatial blur + temporal
reprojection.

Dense TPU formulation of the reference AO kernel (reference:
data/hbao.comp — 8 rays x 4 steps horizon walk, depth-weighted 4x4
spatial blur in shared memory, temporal blend against the previous
frame's reprojected AO).  Shared-memory windows become shifted-slice
stacks; everything is (H, W)-parallel.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .lighting_pass import reconstruct_positions, _inv_proj

RAYS = 8
STEPS = 4
STRENGTH = 0.1
FALLOFF = 3.0
BIAS = 0.03
BLUR_RADIUS = 2
LADDER = (1, 2, 3, 5, 8, 13, 21)     # fixed pixel radii per ray


def make_hbao_params(seed=0):
    """Noise (16, 3) + ray kernel (RAYS, 2) — the reference fills these
    from random vectors at init (ssao params SSBO)."""
    rng = np.random.RandomState(seed)
    noise = rng.uniform(-1, 1, (16, 3)).astype(np.float32)
    noise[:, :2] /= np.maximum(np.linalg.norm(noise[:, :2], axis=1, keepdims=True), 1e-6)
    noise[:, 2] = rng.uniform(0, 1, 16)
    angles = (np.arange(RAYS) + 0.5) / RAYS * 2 * np.pi
    kernel = np.stack([np.cos(angles), np.sin(angles)], -1).astype(np.float32)
    return dict(noise=noise, kernel=kernel)


def _view_positions(depth, proj, width, height):
    h, w = depth.shape
    invp = _inv_proj(proj)
    yn = ((jnp.arange(h, dtype=jnp.float32) + 0.5) / height * 2.0 - 1.0)[:, None]
    xn = ((jnp.arange(w, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0)[None, :]
    dist = proj[2, 3] / jnp.maximum(depth + proj[2, 2], 1e-8)   # bg depth=0 guard
    return jnp.stack([invp[0, 0] * xn * dist, invp[1, 1] * yn * dist, -dist], -1)


def hbao(depth, normal_enc, proj, view, *, params, prev_ao=None, prevview=None,
         invview=None):
    """depth (H,W); normal_enc (H,W,3) world normal *0.5+0.5 from gbuffer.

    Returns (H, W, 2): [ao, depth] — channel y feeds next frame's
    temporal pass, exactly like the reference's prevmap.
    """
    h, w = depth.shape
    position = _view_positions(depth, proj, w, h)
    covered = depth > 0.0

    # view-space normal (gbuffer stores world normal; reference applies view)
    n_world = normal_enc * 2.0 - 1.0
    normal = n_world @ view[:3, :3].T

    # TPU reformulation: the reference walks per-pixel randomized rays
    # with view-distance-scaled steps (hbao.comp:60-69) — data-dependent
    # gathers costing ~11 ns each on v5e (~175 ms/frame at half res).
    # Here every ray uses FIXED pixel offsets (dense jnp.roll shifts,
    # free): the view-space falloff term supplies the distance scaling —
    # wide samples on near geometry exceed the world-space falloff
    # radius and weigh ~0, so the horizon walk self-limits exactly where
    # the reference shrank its step size.
    kernel = np.asarray(params["kernel"])
    nx, ny, nz = normal[..., 0], normal[..., 1], normal[..., 2]
    px, py, pz = position[..., 0], position[..., 1], position[..., 2]
    yi = jnp.arange(h)[:, None]
    xi = jnp.arange(w)[None, :]

    # padded STATIC slices instead of jnp.roll: each roll materialized a
    # (h, w) copy x3 planes x 56 steps (~170 copy ops/frame); slices of
    # one padded stack fuse into the consuming elementwise op for free.
    # Out-of-bounds taps read the pad (zeros) and are neutralized by the
    # same `inb` mask that previously neutralized roll wraparound.
    M = max(LADDER)
    pp = jnp.pad(position, ((M, M), (M, M), (0, 0)))
    ppx, ppy, ppz = pp[..., 0], pp[..., 1], pp[..., 2]

    occ_sum = jnp.zeros((h, w), jnp.float32)
    for i in range(RAYS):
        dx_u, dy_u = float(kernel[i, 0]), float(kernel[i, 1])
        top = jnp.full((h, w), BIAS, jnp.float32)
        for r in LADDER:
            dx = int(round(dx_u * r))
            dy = int(round(dy_u * r))
            inb = ((yi + dy >= 0) & (yi + dy < h)
                   & (xi + dx >= 0) & (xi + dx < w))
            hx = ppx[M + dy:M + dy + h, M + dx:M + dx + w] - px
            hy = ppy[M + dy:M + dy + h, M + dx:M + dx + w] - py
            hz = ppz[M + dy:M + dy + h, M + dx:M + dx + w] - pz
            hlen = jnp.sqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-12))
            # out-of-bounds taps wrap via roll; neutralize them entirely
            # (occl = top -> zero diff, horizon unchanged) so a wrapped
            # garbage sample can't raise the horizon near borders
            occl = jnp.where(inb, (nx * hx + ny * hy + nz * hz) / hlen, top)
            diff = jnp.maximum(occl - top, 0.0)
            top = jnp.maximum(occl, top)
            dist = jnp.minimum(hlen / FALLOFF, 1.0)
            occ_sum = occ_sum + diff * (1.0 - dist * dist)

    ao = 1.0 - jnp.minimum(STRENGTH * occ_sum, 1.0)
    ao = jnp.where(covered, ao, 1.0)

    # depth-weighted spatial blur (radius 2 window)
    ao = _depth_weighted_blur(ao, depth, BLUR_RADIUS)

    # temporal reprojection
    if prev_ao is not None and prevview is not None and invview is not None:
        reproj = (position @ (prevview[:3, :3] @ invview[:3, :3]).T
                  + (prevview[:3, :3] @ invview[:3, 3] + prevview[:3, 3]))
        # guard the divide (a point at/behind the previous camera plane
        # would produce Inf/NaN indices and weights)
        rz = jnp.minimum(reproj[..., 2], -1e-6)
        px = 0.5 * (proj[0, 0] * reproj[..., 0] / -rz) + 0.5
        py = 0.5 * (proj[1, 1] * reproj[..., 1] / -rz) + 0.5
        sx = jnp.clip((px * w).astype(jnp.int32), 0, w - 1)
        sy = jnp.clip((py * h).astype(jnp.int32), 0, h - 1)
        prev = prev_ao[sy, sx]
        prevpos = _view_positions_at(prev[..., 1], sx, sy, proj, w, h)
        # disocclusion: previous surface vs where THIS pixel reprojects
        # (both in previous-frame view space — comparing against the
        # current-frame position measured ego-motion, not geometry)
        tw = jnp.clip(5.0 * jnp.abs(prev[..., 0] - ao)
                      + 0.001 * jnp.linalg.norm(prevpos - reproj, axis=-1),
                      0.1, 1.0)
        # newly-revealed pixels (reprojected off-screen or behind the
        # previous camera) take the fresh AO outright — clamped border
        # history smeared a stale band along screen edges otherwise
        onscreen = ((px >= 0.0) & (px < 1.0) & (py >= 0.0) & (py < 1.0)
                    & (reproj[..., 2] < -1e-6))
        tw = jnp.where(onscreen, tw, 1.0)
        ao = jnp.where(covered, prev[..., 0] + (ao - prev[..., 0]) * tw, ao)

    return jnp.stack([ao, depth], -1)


def _view_positions_at(depth_vals, sx, sy, proj, width, height):
    invp = _inv_proj(proj)
    xn = (sx.astype(jnp.float32) + 0.5) / width * 2.0 - 1.0
    yn = (sy.astype(jnp.float32) + 0.5) / height * 2.0 - 1.0
    dist = proj[2, 3] / jnp.maximum(depth_vals + proj[2, 2], 1e-8)
    return jnp.stack([invp[0, 0] * xn * dist, invp[1, 1] * yn * dist, -dist], -1)


def _depth_weighted_blur(ao, depth, radius):
    h, w = ao.shape
    pad_ao = jnp.pad(ao, radius, mode="edge")
    pad_d = jnp.pad(depth, radius, mode="edge")
    acc = jnp.zeros_like(ao)
    wsum = jnp.zeros_like(ao)
    for dy in range(-radius, radius):
        for dx in range(-radius, radius):
            a = pad_ao[radius + dy:radius + dy + h, radius + dx:radius + dx + w]
            d = pad_d[radius + dy:radius + dy + h, radius + dx:radius + dx + w]
            weight = jnp.maximum(1.0 - 250.0 * jnp.abs(d - depth), 0.0)
            acc = acc + weight * a
            wsum = wsum + weight
    return jnp.where(depth > 0, acc / jnp.maximum(wsum, 1e-6), ao)
