"""Screen-space reflections — dense fixed-step DDA march.

TPU reformulation of the reference Hi-Z SSR walk (reference:
data/ssr.comp — McGuire-style screen-space DDA with mip walking,
roughness/edge/distance/angle fades, env-BRDF weighting).  The
data-dependent Hi-Z level loop becomes a fixed-count coarse march +
binary refinement — every pixel does identical work, which is what the
VPU wants; fade math and acceptance tests match the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from .lighting_pass import _inv_proj
from . import brdf

MAX_DISTANCE = 24.0
THICKNESS = 0.1
COARSE_STEPS = 48
REFINE_STEPS = 6


def specular_dominant_direction(n, r, roughness):
    smooth = 1.0 - roughness
    f = smooth * (jnp.sqrt(smooth) + roughness)
    return n + (r - n) * f[..., None]


def ssr(hdr_color, depth, gbuffer, proj, view, envbrdf_lut=None):
    """Returns (H, W, 4): rgb = reflection color (already BRDF-weighted),
    a = strength (composite adds rgb*a)."""
    h, w = depth.shape
    invp = _inv_proj(proj)
    yn = ((jnp.arange(h, dtype=jnp.float32) + 0.5) / h * 2.0 - 1.0)[:, None]
    xn = ((jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0)[None, :]
    dist = proj[2, 3] / (depth + proj[2, 2])
    position = jnp.stack([invp[0, 0] * xn * dist, invp[1, 1] * yn * dist, -dist], -1)

    roughness = gbuffer["specular"][..., 3]
    specular = gbuffer["specular"][..., :3]
    n_world = gbuffer["normal"][..., :3] * 2.0 - 1.0
    normal = n_world @ view[:3, :3].T

    eyevec = brdf.normalize(-position + jnp.array([0.0, 0.5, 0.0]))
    refl = brdf.normalize(
        -eyevec - 2.0 * jnp.sum(-eyevec * normal, -1, keepdims=True) * normal)
    direction = brdf.normalize(specular_dominant_direction(normal, refl, roughness))

    active = (depth > 1 - 0.998) & (roughness < 0.4) & gbuffer["mask"]

    # march in view space; project each step (dense, fixed count)
    end = position + direction * MAX_DISTANCE

    def to_screen(p):
        zc = -p[..., 2]
        px = (proj[0, 0] * p[..., 0] / zc * 0.5 + 0.5) * w
        py = (proj[1, 1] * p[..., 1] / zc * 0.5 + 0.5) * h
        return px, py

    hit_t = jnp.full((h, w), 2.0, jnp.float32)     # >1 means miss
    prev_hit = jnp.zeros((h, w), jnp.bool_)
    ts = jnp.linspace(1.0 / COARSE_STEPS, 1.0, COARSE_STEPS)

    # perspective-correct parametrisation: interpolate in 1/z
    z0 = -position[..., 2]
    z1 = jnp.maximum(-end[..., 2], 0.05)

    def sample_scene_z(px, py):
        sx = jnp.clip(px.astype(jnp.int32), 0, w - 1)
        sy = jnp.clip(py.astype(jnp.int32), 0, h - 1)
        d = depth[sy, sx]
        return proj[2, 3] / (d + proj[2, 2]), d

    for t in ts:
        p = position + (end - position) * t
        px, py = to_screen(p)
        ray_z = -p[..., 2]
        scene_z, scene_d = sample_scene_z(px, py)
        crossed = (ray_z >= scene_z) & (ray_z <= scene_z + THICKNESS * (1 + ray_z * 0.5)) \
            & (scene_d > 0)
        newhit = crossed & (~prev_hit)
        hit_t = jnp.where(newhit & (hit_t > 1.5), t, hit_t)
        prev_hit = prev_hit | crossed

    hit = hit_t <= 1.0

    # binary refinement between (hit_t - step, hit_t)
    step = 1.0 / COARSE_STEPS
    lo = jnp.maximum(hit_t - step, 0.0)
    hi = hit_t
    for _ in range(REFINE_STEPS):
        mid = 0.5 * (lo + hi)
        p = position + (end - position) * mid[..., None]
        px, py = to_screen(p)
        ray_z = -p[..., 2]
        scene_z, _ = sample_scene_z(px, py)
        above = ray_z < scene_z
        lo = jnp.where(above, mid, lo)
        hi = jnp.where(above, hi, mid)

    t_hit = 0.5 * (lo + hi)
    p_hit = position + (end - position) * t_hit[..., None]
    px, py = to_screen(p_hit)
    sx = jnp.clip(px.astype(jnp.int32), 0, w - 1)
    sy = jnp.clip(py.astype(jnp.int32), 0, h - 1)
    hitcolor = hdr_color[sy, sx]

    # fades (reference: ssr.comp:195-205)
    u = px / w
    v = py / h
    edgefade = 1.0 - 10.0 * jnp.clip(
        jnp.maximum(jnp.abs(u - 0.5), jnp.abs(v - 0.5)) - 0.4, 0.0, 0.1)
    depthfade = 1.0 - 1000.0 * jnp.maximum((1.0 - depth) - 0.997, 0.0)
    distancefade = 1.0 - jnp.minimum(
        jnp.linalg.norm(p_hit - position, axis=-1) / MAX_DISTANCE, 1.0)
    anglefade = 10.0 * jnp.clip(-direction[..., 2], 0.0, 0.1)
    roughnessfade = 1.0 - jnp.minimum(2.5 * roughness, 1.0)

    ndv = jnp.clip(jnp.sum(normal * eyevec, -1), 0.0, 1.0)
    if envbrdf_lut is not None:
        s = envbrdf_lut.shape[0]
        bi = jnp.clip((roughness * (s - 1)).astype(jnp.int32), 0, s - 1)
        bj = jnp.clip((ndv * (s - 1)).astype(jnp.int32), 0, s - 1)
        eb = envbrdf_lut[bi, bj]
        weight = eb[..., 0:1] * specular + eb[..., 1:2]
    else:
        weight = specular

    fade = (edgefade * depthfade * distancefade * anglefade * roughnessfade
            * hit.astype(jnp.float32) * active.astype(jnp.float32))
    rgb = hitcolor * weight
    return jnp.concatenate([rgb, jnp.clip(fade, 0, 1)[..., None]], -1)
