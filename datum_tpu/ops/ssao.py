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

    noise = jnp.asarray(params["noise"])
    kernel = jnp.asarray(params["kernel"])
    xi = jnp.arange(w)[None, :]
    yi = jnp.arange(h)[:, None]
    nidx = (xi + yi * 4) % noise.shape[0]
    randomvec = noise[nidx]                              # (H, W, 3)

    bx = randomvec[..., :2]
    bx = bx / jnp.maximum(jnp.linalg.norm(bx, axis=-1, keepdims=True), 1e-6)
    by = jnp.stack([-bx[..., 1], bx[..., 0]], -1)

    screenpixels = (0.25 * w * proj[1, 1]) / jnp.where(covered, position[..., 2], -1.0)
    steppixels = screenpixels / (STEPS + 1)

    occ_sum = jnp.zeros((h, w), jnp.float32)
    for i in range(RAYS):
        sd = kernel[i]
        sampledir = jnp.stack([sd[0] * bx[..., 0] + sd[1] * bx[..., 1],
                               sd[0] * by[..., 0] + sd[1] * by[..., 1]], -1)
        top = jnp.full((h, w), BIAS, jnp.float32)
        raypixels = randomvec[..., 2] * steppixels + 1.0
        for k in range(STEPS):
            sx = jnp.round(xi + raypixels * sampledir[..., 0]).astype(jnp.int32)
            sy = jnp.round(yi + raypixels * sampledir[..., 1]).astype(jnp.int32)
            sx = jnp.clip(sx, 0, w - 1)
            sy = jnp.clip(sy, 0, h - 1)
            sdep = depth[sy, sx]
            spos = _view_positions_at(sdep, sx, sy, proj, w, h)
            horizon = spos - position
            hlen = jnp.sqrt(jnp.maximum(jnp.sum(horizon * horizon, -1), 1e-12))
            occl = jnp.sum(normal * horizon, -1) / hlen
            diff = jnp.maximum(occl - top, 0.0)
            top = jnp.maximum(occl, top)
            dist = jnp.minimum(hlen / FALLOFF, 1.0)
            occ_sum = occ_sum + diff * (1.0 - dist * dist)
            raypixels = raypixels + steppixels

    ao = 1.0 - jnp.minimum(STRENGTH * occ_sum, 1.0)
    ao = jnp.where(covered, ao, 1.0)

    # depth-weighted spatial blur (radius 2 window)
    ao = _depth_weighted_blur(ao, depth, BLUR_RADIUS)

    # temporal reprojection
    if prev_ao is not None and prevview is not None and invview is not None:
        reproj = (position @ (prevview[:3, :3] @ invview[:3, :3]).T
                  + (prevview[:3, :3] @ invview[:3, 3] + prevview[:3, 3]))
        px = 0.5 * (proj[0, 0] * reproj[..., 0] / -reproj[..., 2]) + 0.5
        py = 0.5 * (proj[1, 1] * reproj[..., 1] / -reproj[..., 2]) + 0.5
        sx = jnp.clip((px * w).astype(jnp.int32), 0, w - 1)
        sy = jnp.clip((py * h).astype(jnp.int32), 0, h - 1)
        prev = prev_ao[sy, sx]
        prevpos = _view_positions_at(prev[..., 1], sx, sy, proj, w, h)
        tw = jnp.clip(5.0 * jnp.abs(prev[..., 0] - ao)
                      + 0.001 * jnp.linalg.norm(prevpos - position, axis=-1), 0.1, 1.0)
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
