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
            # gate the normal override exactly like the color blend:
            # alpha-cutout albedo texels must not bend normals either
            usen = ((nid >= 0) & inside & active)[..., None] \
                * decals["color"][i, 3] * zfade[..., None] \
                * (1 - use + tex[..., 3:4] * use)
            # the gbuffer normal is ENCODED (n*0.5+0.5): decode before
            # blending with the world-space decal normal, renormalize,
            # re-encode (blending/normalizing the encoded vector skewed
            # every pixel whenever a texture pool was bound)
            n_dec = normal[..., :3] * 2.0 - 1.0
            blended = n_dec * (1 - usen) + nworld * usen
            blended = blended / jnp.maximum(
                jnp.linalg.norm(blended, axis=-1, keepdims=True), 1e-6)
            normal = jnp.concatenate([blended * 0.5 + 0.5,
                                      normal[..., 3:]], -1)
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


def apply_decals_planes(gpl, worldp, decals, mask, textures=None,
                        tap_scale=4):
    """Decal blend over the 2-D shade planes (megakernel fast path).

    Same semantics as apply_decals, but on the channel-planes layout the
    deferred-shade megakernel consumes (dr/dg/db encoded diffuse,
    sr/sg/sb encoded specular, rgh, em, nx/ny/nz shaded normal) — all
    work is dense elementwise VPU math, so decals no longer force the
    slow XLA path (reference: data/lighting.comp:136-164 blends decals
    unconditionally inside the lighting kernel).

    worldp: (wx, wy, wz) full-res world-position planes.
    textures: optional (N, S, S, 4) uint8 pool; texture taps run at
    1/tap_scale res with a dense upsample (per-pixel gathers are the
    TPU wall — PERF.md lesson 1).
    """
    from .blur import downsample_pool, resize_up_dense

    wx, wy, wz = worldp
    h, w = wx.shape
    d_n = decals["position"].shape[0]
    out = dict(gpl)
    maskf = mask.astype(jnp.float32)

    if textures is not None:
        p = tap_scale
        wx_q = downsample_pool(wx, p, reduce="first")
        wy_q = downsample_pool(wy, p, reduce="first")
        wz_q = downsample_pool(wz, p, reduce="first")

    for i in range(d_n):
        rot = decals["inv_rot"][i]
        pos = decals["position"][i]
        hd = decals["halfdim"][i]
        lx = (rot[0, 0] * (wx - pos[0]) + rot[0, 1] * (wy - pos[1])
              + rot[0, 2] * (wz - pos[2]))
        ly = (rot[1, 0] * (wx - pos[0]) + rot[1, 1] * (wy - pos[1])
              + rot[1, 2] * (wz - pos[2]))
        lz = (rot[2, 0] * (wx - pos[0]) + rot[2, 1] * (wy - pos[1])
              + rot[2, 2] * (wz - pos[2]))
        inside = ((jnp.abs(lx) <= hd[0]) & (jnp.abs(ly) <= hd[1])
                  & (jnp.abs(lz) <= hd[2]))
        active = (i < decals["count"]).astype(jnp.float32)
        a = decals["color"][i, 3] * inside * active * maskf
        zfade = jnp.clip(1.5 - 1.5 * jnp.abs(lz) / jnp.maximum(hd[2], 1e-6),
                         0.0, 1.0)

        base_r = decals["color"][i, 0]
        base_g = decals["color"][i, 1]
        base_b = decals["color"][i, 2]
        base = (base_r * jnp.ones_like(wx), base_g * jnp.ones_like(wx),
                base_b * jnp.ones_like(wx))
        if textures is not None:
            # reduced-res texture taps (albedo rgba + normal), dense
            # upsample; flat decals (map id -1) keep the base color
            lx_q = (rot[0, 0] * (wx_q - pos[0]) + rot[0, 1] * (wy_q - pos[1])
                    + rot[0, 2] * (wz_q - pos[2]))
            ly_q = (rot[1, 0] * (wx_q - pos[0]) + rot[1, 1] * (wy_q - pos[1])
                    + rot[1, 2] * (wz_q - pos[2]))
            u_q = jnp.clip(lx_q / jnp.maximum(hd[0], 1e-6) * 0.5 + 0.5,
                           0.0, 1.0)
            v_q = jnp.clip(ly_q / jnp.maximum(hd[1], 1e-6) * 0.5 + 0.5,
                           0.0, 1.0)
            s = textures.shape[1]
            px = jnp.clip((u_q * s).astype(jnp.int32), 0, s - 1)
            py = jnp.clip((v_q * s).astype(jnp.int32), 0, s - 1)
            aid = decals["albedomap"][i]
            tex_q = (textures[jnp.maximum(aid, 0), py, px]
                     .astype(jnp.float32) / 255.0)
            use = (aid >= 0).astype(jnp.float32)
            tr = resize_up_dense(tex_q[..., 0], h, w)
            tg = resize_up_dense(tex_q[..., 1], h, w)
            tb = resize_up_dense(tex_q[..., 2], h, w)
            ta = resize_up_dense(tex_q[..., 3], h, w)
            base = (base[0] * (1 - use) + base[0] * tr * use,
                    base[1] * (1 - use) + base[1] * tg * use,
                    base[2] * (1 - use) + base[2] * tb * use)
            a = a * (1 - use + ta * use)

            nid = decals["normalmap"][i]
            ntex_q = (textures[jnp.maximum(nid, 0), py, px]
                      .astype(jnp.float32) / 127.5 - 1.0)
            nwx = resize_up_dense(
                ntex_q[..., 0] * rot[0, 0] + ntex_q[..., 1] * rot[1, 0]
                + ntex_q[..., 2] * rot[2, 0], h, w)
            nwy = resize_up_dense(
                ntex_q[..., 0] * rot[0, 1] + ntex_q[..., 1] * rot[1, 1]
                + ntex_q[..., 2] * rot[2, 1], h, w)
            nwz = resize_up_dense(
                ntex_q[..., 0] * rot[0, 2] + ntex_q[..., 1] * rot[1, 2]
                + ntex_q[..., 2] * rot[2, 2], h, w)
            # same alpha/coverage gating as the color blend (maskf
            # keeps background pixels' normal planes untouched)
            usen = ((nid >= 0).astype(jnp.float32) * inside * active
                    * decals["color"][i, 3] * zfade * maskf
                    * (1 - use + ta * use))
            bx = out["nx"] * (1 - usen) + nwx * usen
            by = out["ny"] * (1 - usen) + nwy * usen
            bz = out["nz"] * (1 - usen) + nwz * usen
            inv = 1.0 / jnp.sqrt(jnp.maximum(bx * bx + by * by + bz * bz,
                                             1e-12))
            out["nx"], out["ny"], out["nz"] = bx * inv, by * inv, bz * inv

        a = a * zfade

        # gbuffer-encode the decal material exactly like the opaque
        # planes (matches brdf.make_material)
        metal = decals["metalness"][i]
        refl = decals["reflectivity"][i]
        rough_d = decals["roughness"][i]
        em_d = decals["emissive"][i]
        s0 = 0.16 * refl * refl
        one_m = 1.0 - metal
        for c, ch in enumerate("rgb"):
            dif_d = base[c] * one_m
            spc_d = s0 + (base[c] - s0) * metal
            out[f"d{ch}"] = out[f"d{ch}"] * (1 - a) + dif_d * a
            out[f"s{ch}"] = out[f"s{ch}"] * (1 - a) + spc_d * a
        out["em"] = out["em"] * (1 - a) + em_d * a
        out["rgh"] = out["rgh"] * (1 - a) + rough_d * a
    return out
