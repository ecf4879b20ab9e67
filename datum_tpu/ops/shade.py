"""Deferred material resolve: visibility buffer -> gbuffer.

The dense, data-parallel replacement for the reference geometry pass
fragment work (reference: data/geometry.frag — texture fetch, TBN
normal mapping, make_material, gbuffer encode).  Every pixel gathers
its winning triangle's vertex attributes, interpolates with the
homogeneous barycentrics, samples the texture pool, and emits the
same gbuffer layout the reference uses (reference:
renderer.cpp:5683-5760):

  rt0 diffuse+emissive   (albedo*(1-metal), emissive)
  rt1 specular+roughness
  rt2 normal*0.5+0.5, decalmask
"""

from __future__ import annotations

import jax.numpy as jnp

from . import brdf
from .raster import resolve_barycentrics
from .sampling import sample_bilinear


def resolve_gbuffer(vis, setup, tris, tri_instance, attrs, instances, materials,
                    textures, width, height, y0=0, material_maps=True, lam=None):
    """vis: (H,W) int32; attrs: dict(uv (V,2), normal (V,3), tangent (V,4));
    instances: dict(material (I,) int32); materials: dict(color (M,4),
    metalness/roughness/reflectivity/emissive (M,), albedomap/surfacemap/
    normalmap (M,) int32); textures: (N,S,S,4) uint8.

    Returns gbuffer dict(diffuse (H,W,4), specular (H,W,4),
    normal (H,W,4), mask (H,W) bool).
    """
    if lam is None:
        lam, mask = resolve_barycentrics(vis, setup, width, height, y0=y0)
    else:
        mask = vis >= 0
    t = jnp.maximum(vis, 0)
    vid = tris[t]                                   # (H, W, 3)

    # single packed gather of all vertex attributes (uv2|nrm3|tan4):
    # contiguous 36-byte rows gather far faster on TPU than 3 separate
    # scattered gathers
    a9 = jnp.concatenate([attrs["uv"], attrs["normal"], attrs["tangent"]], -1)
    rows = a9[vid]                                  # (H, W, 3, 9)
    interp9 = jnp.sum(rows * lam[..., None], axis=-2)
    uv = interp9[..., 0:2]
    n = interp9[..., 2:5]
    tan = interp9[..., 5:8]
    tan_w = interp9[..., 8]

    inst = tri_instance[t]                          # (H, W)
    mat = instances["material"][inst]               # (H, W)

    albedo_id = materials["albedomap"][mat]
    albedo_tex = sample_bilinear(textures, albedo_id, uv)
    nrm = brdf.normalize(n)
    if material_maps:
        surface_id = materials["surfacemap"][mat]
        normal_id = materials["normalmap"][mat]
        surface_tex = sample_bilinear(textures, surface_id, uv)
        normal_tex = sample_bilinear(textures, normal_id, uv)
        # TBN: gram-schmidt the interpolated frame, bitangent sign = tan.w
        tgt = brdf.normalize(tan - nrm * jnp.sum(tan * nrm, -1, keepdims=True))
        btg = jnp.cross(nrm, tgt) * tan_w[..., None]
        tn = normal_tex[..., :3] * 2.0 - 1.0
        shaded_n = brdf.normalize(
            tgt * tn[..., 0:1] + btg * tn[..., 1:2] + nrm * tn[..., 2:3])
        surf_m, surf_r, surf_rough = (surface_tex[..., 0], surface_tex[..., 1],
                                      surface_tex[..., 3])
    else:
        shaded_n = nrm
        surf_m = surf_r = surf_rough = 1.0

    color = materials["color"][mat]                 # (H, W, 4)
    metalness = materials["metalness"][mat] * surf_m
    reflectivity = materials["reflectivity"][mat] * surf_r
    roughness = materials["roughness"][mat] * surf_rough
    emissive = materials["emissive"][mat]

    m = brdf.make_material(albedo_tex[..., :3] * color[..., :3], emissive,
                           metalness, reflectivity, roughness)

    diffuse = jnp.concatenate([m["diffuse"], emissive[..., None]], -1)
    specular = jnp.concatenate([m["specular"], roughness[..., None]], -1)
    normal_out = jnp.concatenate([shaded_n * 0.5 + 0.5,
                                  jnp.zeros_like(emissive)[..., None]], -1)

    bg = ~mask
    zero = jnp.zeros_like(diffuse)
    return dict(
        diffuse=jnp.where(bg[..., None], zero, diffuse),
        specular=jnp.where(bg[..., None], zero, specular),
        normal=jnp.where(bg[..., None], zero, normal_out),
        mask=mask,
    )


def gbuffer_from_planes(planes, textures, texture_filter="nearest"):
    """Gbuffer from the fused raster kernel's interpolated planes
    (ops/raster_pallas.py raster_shade_pallas) — the only per-pixel
    gather left is the albedo texture tap."""
    mask = planes["vis"] >= 0
    nrm = brdf.normalize(planes["normal"])

    s = textures.shape[1]
    uv = planes["uv"]

    def nearest_tap(uv_, ids_):
        tx = jnp.mod((uv_[..., 0] * s).astype(jnp.int32), s)
        ty = jnp.mod((uv_[..., 1] * s).astype(jnp.int32), s)
        flat = textures.reshape(-1, textures.shape[-1])
        idx = ids_ * (s * s) + ty * s + tx
        return flat[idx].astype(jnp.float32) / 255.0

    if texture_filter == "none":
        albedo = jnp.ones(planes["color"].shape[:2] + (4,), jnp.float32)
    elif texture_filter in ("nearest_half", "nearest_quarter"):
        # gather at reduced res, dense upsample: divides the gather cost
        # by p^2.  reshape-slice pooling instead of [::2] (strided lane
        # reads are slow on TPU)
        p = 2 if texture_filter == "nearest_half" else 4
        h, w = uv.shape[:2]
        uv_h = uv.reshape(h // p, p, w // p, p, 2).mean((1, 3))
        ids_h = planes["albedo_id"].reshape(h // p, p, w // p, p)[:, 0, :, 0]
        a_h = nearest_tap(uv_h, ids_h)
        from .blur import resize_up_dense
        albedo = resize_up_dense(a_h, h, w)
    elif texture_filter == "nearest":
        albedo = nearest_tap(uv, planes["albedo_id"])
    else:
        albedo = sample_bilinear(textures, planes["albedo_id"], uv)

    m = brdf.make_material(albedo[..., :3] * planes["color"],
                           planes["emissive"], planes["metalness"],
                           planes["reflectivity"], planes["roughness"])
    diffuse = jnp.concatenate([m["diffuse"], planes["emissive"][..., None]], -1)
    specular = jnp.concatenate([m["specular"], planes["roughness"][..., None]], -1)
    normal_out = jnp.concatenate(
        [nrm * 0.5 + 0.5, jnp.zeros_like(planes["emissive"])[..., None]], -1)
    bg = ~mask
    zero = jnp.zeros_like(diffuse)
    return dict(
        diffuse=jnp.where(bg[..., None], zero, diffuse),
        specular=jnp.where(bg[..., None], zero, specular),
        normal=jnp.where(bg[..., None], zero, normal_out),
        mask=mask,
    )
