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


def apply_decals(gbuffer, worldpos, decals, textures=None):
    """Blend decals into gbuffer (diffuse/specular/normal).

    decals: dict with
      inv_rot (D, 3, 3)  world->decal rotation
      position (D, 3)    decal centre
      halfdim (D, 3)
      color (D, 4)       rgba (a = opacity)
      metalness/roughness/reflectivity/emissive (D,)
      albedomap/normalmap (D,) int32  texture-pool ids, -1 = flat
      count () int32
    textures: (N, S, S, 4) uint8 pool (reference: decal albedo/normal
    texture arrays bound in lighting.comp's decal loop).
    """
    d_n = decals["position"].shape[0]
    diffuse = gbuffer["diffuse"]
    specular = gbuffer["specular"]
    normal = gbuffer["normal"]
    has_tex = textures is not None and "albedomap" in decals

    for i in range(d_n):
        rot = decals["inv_rot"][i]
        local = (worldpos - decals["position"][i]) @ rot.T
        inside = jnp.all(jnp.abs(local) <= decals["halfdim"][i], axis=-1)
        active = (i < decals["count"])
        a = decals["color"][i, 3] * inside.astype(jnp.float32) * active \
            * gbuffer["mask"].astype(jnp.float32)
        # fade near the box z faces to avoid hard clipping
        zfade = jnp.clip(1.5 - 1.5 * jnp.abs(local[..., 2])
                         / jnp.maximum(decals["halfdim"][i, 2], 1e-6), 0.0, 1.0)
        base_rgb = jnp.broadcast_to(decals["color"][i, :3],
                                    diffuse[..., :3].shape)
        if has_tex:
            uvd = local[..., :2] / jnp.maximum(
                decals["halfdim"][i, :2], 1e-6) * 0.5 + 0.5
            s = textures.shape[1]
            px = jnp.clip((uvd * s).astype(jnp.int32), 0, s - 1)
            aid = decals["albedomap"][i]
            tex = textures[jnp.maximum(aid, 0), px[..., 1], px[..., 0]] \
                .astype(jnp.float32) / 255.0
            use = (aid >= 0).astype(jnp.float32)
            base_rgb = base_rgb * (1 - use) + base_rgb * tex[..., :3] * use
            a = a * (1 - use + tex[..., 3] * use)
            nid = decals["normalmap"][i]
            ntex = textures[jnp.maximum(nid, 0), px[..., 1], px[..., 0]] \
                .astype(jnp.float32) / 127.5 - 1.0
            # decal tangent frame = rows of the world->decal rotation
            nworld = (ntex[..., 0:1] * rot[0] + ntex[..., 1:2] * rot[1]
                      + ntex[..., 2:3] * rot[2])
            usen = ((nid >= 0) & inside & active)[..., None] \
                * decals["color"][i, 3] * zfade[..., None]
            blended = normal[..., :3] * (1 - usen) + nworld * usen
            blended = blended / jnp.maximum(
                jnp.linalg.norm(blended, axis=-1, keepdims=True), 1e-6)
            normal = jnp.concatenate([blended, normal[..., 3:]], -1)
        a = (a * zfade)[..., None]

        m = brdf.make_material(
            base_rgb, decals["emissive"][i], decals["metalness"][i],
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
