"""PBR BRDF and light evaluators (jnp, fully broadcastable).

Numerics match the reference shading contract so images are comparable
(reference: data/lighting.inc:302-471 — fresnel_schlick, smith
visibility, GGX distribution, Disney diffuse, env/main/point/spot
evaluators; data/lighting.inc:167-187 make_material).  All functions
broadcast over leading pixel dims; vectors are (..., 3).
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265358979


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def vdot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def normalize(v, eps=1e-12):
    return v / jnp.sqrt(jnp.maximum(jnp.sum(v * v, -1, keepdims=True), eps))


def make_material(albedo, emissive, metalness, reflectivity, roughness):
    """Material param derivation (reference: lighting.inc make_material).

    albedo: (..., 3); scalars broadcast (...,).  Returns dict(diffuse
    (...,3), specular (...,3), emissive, roughness, alpha).
    """
    e = jnp.asarray(emissive)
    metalness = jnp.asarray(metalness)
    diffuse = albedo * (1.0 - metalness[..., None])
    spec0 = (0.16 * reflectivity * reflectivity)[..., None]
    # mix(vec3(0.16 r^2), albedo, metalness)
    specular = spec0 + (albedo - spec0) * metalness[..., None]
    return dict(
        diffuse=diffuse,
        specular=specular,
        emissive=128.0 * e * e * e,
        roughness=roughness,
        alpha=roughness * roughness,
    )


def fresnel_schlick(f0, f90, u):
    # pow(x,5) via multiplies: pow lowers to exp/log transcendentals on
    # the VPU and dominates the lighting pass at 2M pixels
    x = saturate(1.0 - u)
    x2 = x * x
    return f0 + (f90 - f0) * (x2 * x2 * x)


def visibility_smith(NdotV, NdotL, alpha):
    k = alpha / 2.0
    ggx_l = NdotL * (1 - k) + k
    ggx_v = NdotV * (1 - k) + k
    return 0.25 / (ggx_v * ggx_l + 1e-5)


def distribution_ggx(NdotH, alpha):
    alpha2 = alpha * alpha
    f = (NdotH * alpha2 - NdotH) * NdotH + 1.0
    return alpha2 / (f * f)


def diffuse_disney(NdotV, NdotL, LdotH, alpha):
    energy_bias = 0.5 * alpha
    energy_factor = 1.0 + alpha * (1.0 / 1.51 - 1.0)
    f90 = energy_bias + 2.0 * LdotH * LdotH * alpha
    light_scatter = fresnel_schlick(1.0, f90, NdotL)
    view_scatter = fresnel_schlick(1.0, f90, NdotV)
    return light_scatter * view_scatter * energy_factor


def specular_ggx(f0, f90, NdotV, NdotL, LdotH, NdotH, alpha):
    fc = fresnel_schlick(f0, f90, LdotH[..., None])
    v = visibility_smith(NdotV, NdotL, alpha)
    d = distribution_ggx(NdotH, alpha)
    return (d * v)[..., None] * fc


def _angles(normal, eyevec, lightvec):
    halfvec = normalize(lightvec + eyevec)
    NdotV = jnp.maximum(vdot(normal, eyevec)[..., 0], 0.0)
    NdotL = jnp.maximum(vdot(normal, lightvec)[..., 0], 0.0)
    NdotH = jnp.maximum(vdot(normal, halfvec)[..., 0], 0.0)
    LdotH = saturate(vdot(lightvec, halfvec)[..., 0])
    return NdotV, NdotL, NdotH, LdotH


def main_light(normal, eyevec, material, direction, intensity, cutoff, shadowfactor):
    """Sun/main directional light with roughness-bent light vector
    (reference: lighting.inc main_light).  Returns (diffuse, specular)."""
    r = 2.0 * vdot(normal, eyevec) * normal - eyevec  # reflect(-eye, n)
    LdotR = vdot(-direction, r)[..., 0]
    rough = material["roughness"][..., None]
    bent = -direction + (r + direction) * rough
    lightvec = jnp.where((LdotR < cutoff)[..., None], -direction, bent)
    lightvec = normalize(lightvec)

    NdotV, NdotL, NdotH, LdotH = _angles(normal, eyevec, lightvec)
    alpha = material["alpha"]
    fd = diffuse_disney(NdotV, NdotL, LdotH, alpha) * (1.0 / PI)
    fr = specular_ggx(material["specular"], 1.0, NdotV, NdotL, LdotH, NdotH, alpha) * (1.0 / PI)
    w = (NdotL * shadowfactor)[..., None]
    return w * fd[..., None] * intensity, w * fr * intensity


def point_light(position, normal, eyevec, material, light_pos, intensity, attenuation):
    """Point light (reference: lighting.inc point_light).

    attenuation: (..., 4) [quadratic, linear, constant, range].
    """
    tolight = light_pos - position
    dist = jnp.sqrt(jnp.maximum(jnp.sum(tolight * tolight, -1), 1e-12))
    lightvec = tolight / dist[..., None]
    NdotV, NdotL, NdotH, LdotH = _angles(normal, eyevec, lightvec)
    alpha = material["alpha"]
    fd = diffuse_disney(NdotV, NdotL, LdotH, alpha) * (1.0 / PI)
    fr = specular_ggx(material["specular"], 1.0, NdotV, NdotL, LdotH, NdotH, alpha) * (1.0 / PI)

    # denominator guard: padded (all-zero) light rows in chunked loops
    # are evaluated then masked — 1/0 * 0 would poison the frame with NaN
    att = jnp.sign(NdotL) / jnp.maximum(
        attenuation[..., 2] + attenuation[..., 1] * dist
        + attenuation[..., 0] * dist * dist, 1e-9)
    dr = dist / jnp.maximum(attenuation[..., 3], 1e-6)
    dr2 = dr * dr
    falloff = saturate(1.0 - dr2 * dr2)
    att = att * falloff * falloff
    w = (NdotL * att)[..., None]
    return w * fd[..., None] * intensity, w * fr * intensity


def spot_light(position, normal, eyevec, material, light_pos, intensity, attenuation,
               direction, cutoff, shadowfactor):
    """Spot light with smooth cone edge (reference: lighting.inc spot_light)."""
    tolight = light_pos - position
    dist = jnp.sqrt(jnp.maximum(jnp.sum(tolight * tolight, -1), 1e-12))
    lightvec = tolight / dist[..., None]
    NdotV, NdotL, NdotH, LdotH = _angles(normal, eyevec, lightvec)
    alpha = material["alpha"]
    fd = diffuse_disney(NdotV, NdotL, LdotH, alpha) * (1.0 / PI)
    fr = specular_ggx(material["specular"], 1.0, NdotV, NdotL, LdotH, NdotH, alpha) * (1.0 / PI)

    att = jnp.sign(NdotL) / jnp.maximum(
        attenuation[..., 2] + attenuation[..., 1] * dist
        + attenuation[..., 0] * dist * dist, 1e-9)
    dr = dist / jnp.maximum(attenuation[..., 3], 1e-6)
    dr2 = dr * dr
    falloff = saturate(1.0 - dr2 * dr2)
    att = att * falloff * falloff
    cone = vdot(direction, -lightvec)[..., 0]
    att = att * jnp.clip((cone - cutoff) / 0.05, 0.0, 1.0)
    w = (NdotL * att * shadowfactor)[..., None]
    return w * fd[..., None] * intensity, w * fr * intensity


def specular_dominant_direction(n, r, roughness):
    """Roughness-bent reflection lookup dir (reference: lighting.inc
    specular_dominantdirection)."""
    smooth = 1.0 - roughness
    f = smooth * (jnp.sqrt(smooth) + roughness)
    return n + (r - n) * f[..., None]


def diffuse_dominant_direction(n, v, roughness):
    """(reference: lighting.inc dffuse_dominantdirection)."""
    a = 1.02341 * roughness - 1.51174
    b = -0.511705 * roughness + 0.755868
    ndv = jnp.sum(n * v, -1)
    f = jnp.clip((ndv * a + b) * roughness, 0.0, 1.0)
    return n + (v - n) * f[..., None]


def env_light(material, envdiffuse, envspecular, envbrdf, ambientintensity):
    """IBL split-sum apply (reference: lighting.inc env_light)."""
    f90 = 0.8
    diffuse = envdiffuse * envbrdf[..., 2:3] * ambientintensity[..., None]
    specular = envspecular * (material["specular"] * envbrdf[..., 0:1]
                              + f90 * envbrdf[..., 1:2]) * ambientintensity[..., None]
    return diffuse, specular


def probe_irradiance(sh, normal):
    """Evaluate 9-coeff SH irradiance (reference: lighting.inc
    probe_irradiance basis weights).  sh: (..., 9, 3); normal: (..., 3)."""
    x, y, z = normal[..., 0], normal[..., 1], normal[..., 2]
    basis = jnp.stack([
        jnp.full_like(x, PI * 0.282095),
        2.094395 * 0.488603 * y,
        2.094395 * 0.488603 * z,
        2.094395 * 0.488603 * x,
        0.785398 * 1.092548 * x * y,
        0.785398 * 1.092548 * y * z,
        0.785398 * 0.315392 * (3 * z * z - 1),
        0.785398 * 1.092548 * z * x,
        0.785398 * 0.546274 * (x * x - y * y),
    ], axis=-1)
    return jnp.maximum(jnp.sum(basis[..., None] * sh, axis=-2), 0.0)
