"""Deferred decals: oriented-box projections blended into the gbuffer.

Reference parity: the decal stage of the lighting kernel (reference:
data/lighting.comp:136-164 — cluster-masked loop over 128 decals, each
an inverse-transformed box carrying albedo/normal/material overrides;
src/renderer/decal.{h,cpp} resource).  The TPU build blends decals
densely over the gbuffer before lighting; a static loop over the
active-decal capacity keeps shapes fixed.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import brdf


def apply_decals(gbuffer, worldpos, decals):
    """Blend decals into gbuffer (diffuse/specular/normal).

    decals: dict with
      inv_rot (D, 3, 3)  world->decal rotation
      position (D, 3)    decal centre
      halfdim (D, 3)
      color (D, 4)       rgba (a = opacity)
      metalness/roughness/reflectivity/emissive (D,)
      count () int32
    """
    d_n = decals["position"].shape[0]
    diffuse = gbuffer["diffuse"]
    specular = gbuffer["specular"]
    normal = gbuffer["normal"]

    for i in range(d_n):
        local = (worldpos - decals["position"][i]) @ decals["inv_rot"][i].T
        inside = jnp.all(jnp.abs(local) <= decals["halfdim"][i], axis=-1)
        active = (i < decals["count"])
        a = decals["color"][i, 3] * inside.astype(jnp.float32) * active \
            * gbuffer["mask"].astype(jnp.float32)
        # fade near the box z faces to avoid hard clipping
        zfade = jnp.clip(1.5 - 1.5 * jnp.abs(local[..., 2])
                         / jnp.maximum(decals["halfdim"][i, 2], 1e-6), 0.0, 1.0)
        a = (a * zfade)[..., None]

        m = brdf.make_material(
            jnp.broadcast_to(decals["color"][i, :3], diffuse[..., :3].shape),
            decals["emissive"][i], decals["metalness"][i],
            decals["reflectivity"][i], decals["roughness"][i])
        diffuse = jnp.concatenate([
            diffuse[..., :3] * (1 - a) + m["diffuse"] * a,
            diffuse[..., 3:] * (1 - a) + decals["emissive"][i] * a], -1)
        specular = jnp.concatenate([
            specular[..., :3] * (1 - a) + m["specular"] * a,
            specular[..., 3:] * (1 - a) + decals["roughness"][i] * a], -1)

    out = dict(gbuffer)
    out["diffuse"] = diffuse
    out["specular"] = specular
    out["normal"] = normal
    return out
