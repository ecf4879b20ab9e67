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


def _tbn_normal(nrm, tan3, tan_w, nmap_rgb):
    """Shaded normal from the interpolated TBN frame + a normal map
    texel (reference: data/geometry.frag normal mapping) — ONE recipe
    for every gbuffer encode path."""
    tgt = brdf.normalize(tan3 - nrm * jnp.sum(tan3 * nrm, -1, keepdims=True))
    btg = jnp.cross(nrm, tgt) * tan_w[..., None]
    tn = nmap_rgb * 2.0 - 1.0
    return brdf.normalize(tgt * tn[..., 0:1] + btg * tn[..., 1:2]
                          + nrm * tn[..., 2:3])


def _encode_gbuffer(albedo_rgb, emissive, metalness, reflectivity, roughness,
                    shaded_n, mask):
    """diffuse/specular/normal gbuffer planes + background zeroing —
    the shared epilogue of all three resolve paths (the reference's
    geometry.frag encode, data/geometry.frag:36-55)."""
    m = brdf.make_material(albedo_rgb, emissive, metalness, reflectivity,
                           roughness)
    diffuse = jnp.concatenate([m["diffuse"], emissive[..., None]], -1)
    specular = jnp.concatenate([m["specular"], roughness[..., None]], -1)
    normal_out = jnp.concatenate(
        [shaded_n * 0.5 + 0.5, jnp.zeros_like(emissive)[..., None]], -1)
    bg = ~mask
    zero = jnp.zeros_like(diffuse)
    return dict(
        diffuse=jnp.where(bg[..., None], zero, diffuse),
        specular=jnp.where(bg[..., None], zero, specular),
        normal=jnp.where(bg[..., None], zero, normal_out),
        mask=mask,
    )


def resolve_gbuffer(vis, setup, tris, tri_instance, attrs, instances, materials,
                    textures, width, height, y0=0, material_maps=True, lam=None,
                    matmaps=None):
    """vis: (H,W) int32; attrs: dict(uv (V,2), normal (V,3), tangent (V,4));
    instances: dict(material (I,) int32); materials: dict(color (M,4),
    metalness/roughness/reflectivity/emissive (M,), albedomap/surfacemap/
    normalmap (M,) int32); textures: (N,S,S,4) uint8.

    matmaps: optional texture-system-v2 dict(table (R,48) u8, base (M,),
    size (M,)) — when given, albedo/surface/normal come from the
    combined mip table (trilinear-ready quad rows, one gather for all
    three maps) instead of the legacy 256^2 nearest/bilinear pool; this
    gives the pure-XLA path (CPU goldens) the same mip filtering as the
    Pallas fast path (reference: src/renderer/texture.cpp mipped
    trilinear everywhere).

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

    nrm = brdf.normalize(n)
    if matmaps is not None:
        albedo_tex, surface_tex, normal_tex = sample_matmaps(
            matmaps["table"], matmaps["base"][mat], matmaps["size"][mat],
            uv)
    else:
        albedo_id = materials["albedomap"][mat]
        albedo_tex = sample_bilinear(textures, albedo_id, uv)
    if material_maps:
        if matmaps is None:
            surface_id = materials["surfacemap"][mat]
            normal_id = materials["normalmap"][mat]
            surface_tex = sample_bilinear(textures, surface_id, uv)
            normal_tex = sample_bilinear(textures, normal_id, uv)
        shaded_n = _tbn_normal(nrm, tan, tan_w, normal_tex[..., :3])
        surf_m, surf_r, surf_rough = (surface_tex[..., 0], surface_tex[..., 1],
                                      surface_tex[..., 3])
    else:
        shaded_n = nrm
        surf_m = surf_r = surf_rough = 1.0

    color = materials["color"][mat]                 # (H, W, 4)
    return _encode_gbuffer(albedo_tex[..., :3] * color[..., :3],
                           materials["emissive"][mat],
                           materials["metalness"][mat] * surf_m,
                           materials["reflectivity"][mat] * surf_r,
                           materials["roughness"][mat] * surf_rough,
                           shaded_n, mask)


def sample_matmaps(table, base, size, uv, pool=1, channel_first=False,
                   prev_uv_row=None):
    """One-gather material sample from the combined mip table.

    table: (R, 48) u8 quad rows (render/texturepool.py layout); base,
    size: per-pixel (H, W) int32 planes; uv: (H, W, 2).  The mip level
    comes from screen-space uv derivatives (dense rolls are free on
    TPU); `pool` notes an external resolution divisor so derivatives
    stay calibrated when sampling at reduced res.

    Returns (albedo, surface, normal_ts) each (..., 4) f32 in [0, 1].
    """
    u, v = uv[..., 0], uv[..., 1]
    sf = size.astype(jnp.float32)
    # uv footprint per output pixel (edge-clamped backward difference —
    # jnp.roll would wrap the first row/col across the image; `pool`
    # rescales the step to full-res pixels).  prev_uv_row: optional
    # (1, W, 2) row PRECEDING row 0 — the tile-sharded path passes the
    # neighbor band's last row so the row-0 mip level matches the
    # single-device frame (clamping there flipped the LOD on band-edge
    # rows, the round-4 parity diagnosis)
    def _bdiff(a, axis, prev0=None):
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(0, 1)
        first = a[tuple(sl)] if prev0 is None else prev0
        sl[axis] = slice(0, -1)
        prev = jnp.concatenate([first, a[tuple(sl)]], axis=axis)
        return jnp.abs(a - prev)

    pu = pv = None
    if prev_uv_row is not None:
        pu, pv = prev_uv_row[..., 0], prev_uv_row[..., 1]
    du = _bdiff(u, 1) + _bdiff(u, 0, pu)
    dv = _bdiff(v, 1) + _bdiff(v, 0, pv)
    span = jnp.maximum(du, dv) * sf * (1.0 / max(pool, 1))
    lod = jnp.log2(jnp.maximum(span, 1.0))
    max_lod = jnp.log2(jnp.maximum(sf, 1.0))          # exact for pow2
    level = jnp.clip(jnp.round(lod), 0.0, max_lod).astype(jnp.int32)
    s_l = (size >> level).astype(jnp.int32)
    slf = s_l.astype(jnp.float32)
    # mip row offset: 4*(S^2 - (S>>l)^2)/3, exact in f32 below 2^24
    mip_base = base + (4 * (size * size - s_l * s_l)) // 3

    x = u * slf - 0.5
    y = v * slf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    # REPEAT wrap via bitwise AND — s_l is pow2 (texturepool contract)
    # and two's-complement AND wraps negatives correctly; jnp.mod
    # lowered to a divide + sign-fixup select chain (~0.5 ms at half
    # res in a degenerate (P, 1) T(1,128) layout)
    xi = x0.astype(jnp.int32) & (s_l - 1)
    yi = y0.astype(jnp.int32) & (s_l - 1)
    idx = mip_base + yi * s_l + xi
    if channel_first:
        # flat-row bilinear then ONE (P,12)->(12,P) transpose: the
        # image-shaped formulation forced XLA into a ~1.2 ms col-major
        # relayout of the (P,48) gather plus per-12ch copies
        hh, ww = idx.shape
        rows = table[idx.reshape(-1)].astype(jnp.float32) * (1.0 / 255.0)
        fxf = fx.reshape(-1, 1)
        fyf = fy.reshape(-1, 1)
        t00, t01 = rows[:, 0:12], rows[:, 12:24]
        t10, t11 = rows[:, 24:36], rows[:, 36:48]
        top = t00 + (t01 - t00) * fxf
        bot = t10 + (t11 - t10) * fxf
        out = top + (bot - top) * fyf
        return out.T.reshape(12, hh, ww)
    rows = table[idx].astype(jnp.float32) * (1.0 / 255.0)
    t00, t01 = rows[..., 0:12], rows[..., 12:24]
    t10, t11 = rows[..., 24:36], rows[..., 36:48]
    out = (t00 + (t01 - t00) * fx) + ((t10 + (t11 - t10) * fx)
                                      - (t00 + (t01 - t00) * fx)) * fy
    return out[..., 0:4], out[..., 4:8], out[..., 8:12]


def gbuffer_from_planes(planes, textures, texture_filter="nearest",
                        matmaps=None):
    """Gbuffer from the fused raster kernel's interpolated planes
    (ops/raster_pallas.py raster_shade_pallas) — the only per-pixel
    gather left is the material texture tap."""
    mask = planes["vis"] >= 0
    nrm = brdf.normalize(planes["normal"])

    if texture_filter in ("mip", "mip_half"):
        # texture system v2: ONE quad-row gather yields albedo + surface
        # + normal maps, bilinear-filtered at the derivative-chosen mip
        h, w = planes["uv"].shape[:2]
        p = 2 if texture_filter == "mip_half" else 1
        if p > 1:
            from .blur import downsample_pool, resize_up_dense
            uv_h = downsample_pool(planes["uv"], p)
            base_h = downsample_pool(planes["matmap_base"], p, reduce="first")
            size_h = downsample_pool(planes["matmap_size"], p, reduce="first")
            alb, srf, nmap = sample_matmaps(matmaps["table"], base_h, size_h,
                                            uv_h, pool=p)
            packed = jnp.concatenate([alb, srf, nmap], -1)
            packed = resize_up_dense(packed, h, w)
            alb, srf, nmap = packed[..., 0:4], packed[..., 4:8], packed[..., 8:12]
        else:
            alb, srf, nmap = sample_matmaps(
                matmaps["table"], planes["matmap_base"],
                planes["matmap_size"], planes["uv"])
        tan = planes["tangent"]
        shaded_n = _tbn_normal(nrm, tan[..., :3], tan[..., 3], nmap[..., :3])
        return _encode_gbuffer(alb[..., :3] * planes["color"],
                               planes["emissive"],
                               planes["metalness"] * srf[..., 0],
                               planes["reflectivity"] * srf[..., 1],
                               planes["roughness"] * srf[..., 3],
                               shaded_n, mask)

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
        from .blur import downsample_pool
        uv_h = downsample_pool(uv, p)
        ids_h = downsample_pool(planes["albedo_id"], p, reduce="first")
        a_h = nearest_tap(uv_h, ids_h)
        from .blur import resize_up_dense
        albedo = resize_up_dense(a_h, h, w)
    elif texture_filter == "nearest":
        albedo = nearest_tap(uv, planes["albedo_id"])
    else:
        albedo = sample_bilinear(textures, planes["albedo_id"], uv)

    return _encode_gbuffer(albedo[..., :3] * planes["color"],
                           planes["emissive"], planes["metalness"],
                           planes["reflectivity"], planes["roughness"],
                           nrm, mask)
