"""Volumetric froxel fog.

TPU re-design of the reference fog chain (reference:
data/fog.density.comp — 160x90x64 froxel scattering with height-fog
density and ESM-shadowed main light; data/fog.scatter.comp —
front-to-back accumulation into in-scatter + transmittance; applied in
lighting via global_fog, data/lighting.inc:473-490; froxel depth =
(z/D)^FogDepthExponent * FogDepthRange).

The z-accumulation is a cumsum/cumprod (no scan); the screen-space
apply avoids per-pixel 3D gathers by upsampling each depth slice
densely and blending with per-pixel slice masks — pure VPU work.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import FOG_W, FOG_H, FOG_D, FOG_DEPTH_RANGE, FOG_DEPTH_EXPONENT


def froxel_depths(n=FOG_D, depth_range=FOG_DEPTH_RANGE, exponent=FOG_DEPTH_EXPONENT):
    k = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n
    return jnp.power(k, exponent) * depth_range


def build_fog_volume(sceneset, *, proj, invview, shadow=None, normalquery=None,
                     fog_w=FOG_W, fog_h=FOG_H, fog_d=FOG_D,
                     depth_range=FOG_DEPTH_RANGE, height_falloff=0.15,
                     base_height=0.0, ambient=0.1, shadow_coarse=True):
    """Returns fog volume (fog_d, fog_h, fog_w, 4): [in-scatter rgb,
    transmittance].

    Density follows the reference's directional falloff (reference:
    fog.density.comp:116  density = fogdensity.a *
    exp(-max(dot(fogattenuation, position), 0))) when the sceneset
    carries camera.fogattenuation; otherwise the legacy height falloff
    (height_falloff above base_height) applies.  NOTE: make_sceneset
    always packs fogattenuation (default (0, 0.15, 0) == the legacy
    law at base_height 0), so the height_falloff/base_height kwargs
    only matter for hand-built scenesets — set
    RenderParams.fogattenuation instead."""
    fogdensity = sceneset["camera"]["fogdensity"]      # rgb sigma + w scale
    fogatt = sceneset["camera"].get("fogattenuation")
    ml = sceneset["mainlight"]

    inv00 = 1.0 / proj[0, 0]
    inv11 = 1.0 / proj[1, 1]
    xs = (jnp.arange(fog_w, dtype=jnp.float32) + 0.5) / fog_w * 2 - 1
    ys = (jnp.arange(fog_h, dtype=jnp.float32) + 0.5) / fog_h * 2 - 1
    ds = froxel_depths(fog_d, depth_range)

    rx = inv00 * xs[None, None, :]
    ry = inv11 * ys[None, :, None]
    dist = ds[:, None, None]
    shape3 = (fog_d, fog_h, fog_w)
    # SoA world transform: (D,H,W,3) @ matrix puts 3 on the lane axis
    vx = jnp.broadcast_to(rx * dist, shape3)
    vy = jnp.broadcast_to(ry * dist, shape3)
    vz = jnp.broadcast_to(-dist, shape3)
    iv = invview
    wx = iv[0, 0] * vx + iv[0, 1] * vy + iv[0, 2] * vz + iv[0, 3]
    wy = iv[1, 0] * vx + iv[1, 1] * vy + iv[1, 2] * vz + iv[1, 3]
    wz = iv[2, 0] * vx + iv[2, 1] * vy + iv[2, 2] * vz + iv[2, 3]
    worldpos = jnp.stack([wx, wy, wz], -1)

    # density falloff: directional (reference fogattenuation dot) when
    # provided, else exponential height falloff above base_height
    if fogatt is not None:
        d_ = (fogatt[0] * wx + fogatt[1] * wy + fogatt[2] * wz)
        sigma = fogdensity[3] * jnp.exp(-jnp.maximum(d_, 0.0))
    else:
        sigma = (fogdensity[3]
                 * jnp.exp(-jnp.maximum(wy - base_height, 0.0)
                           * height_falloff))
    sigma_rgb = fogdensity[:3] * sigma[..., None]

    # main-light in-scatter, shadowed when an ESM is available.  The
    # factor field is sampled on a HALF-resolution froxel grid (8x fewer
    # gathers — the full grid's ~1M lookups cost ~6.5 ms on v5e) and
    # nearest-upsampled: volumetric shadowing is blurred by the
    # scattering integral anyway.
    sun = ml["intensity"]
    if shadow is not None:
        from .shadow import shadow_factor_esm_fast
        esm, zmx, zsc = shadow[:3]
        splits, shadowview = ml["splits"], ml["shadowview"]
        if shadow_coarse:
            # volumetric shadowing is blurred by the scattering
            # integral: tap ONLY the coarsest cascade (it covers every
            # finer slice's range) — a 1-slice table kills the select
            # chains and gathers from a 4x smaller (cache-warm) map.
            # The MATRICES must shrink with the maps: with one slice
            # the selector always picks shadowview[0], so passing the
            # full stack would project froxels with the FINEST
            # cascade's frustum while tapping the coarsest map
            esm, zmx, zsc = esm[-1:], zmx[-1:], zsc[-1:]
            shadowview = shadowview[-1:]
            splits = splits[-1:]   # unused with one slice
        cd, ch, cw = fog_d // 2, fog_h // 2, fog_w // 2
        # coarse grid world positions computed directly (cell centers)
        xs_c = (jnp.arange(cw, dtype=jnp.float32) + 0.5) / cw * 2 - 1
        ys_c = (jnp.arange(ch, dtype=jnp.float32) + 0.5) / ch * 2 - 1
        ds_c = froxel_depths(cd, depth_range)
        cshape = (cd, ch, cw)
        cvx = jnp.broadcast_to(inv00 * xs_c[None, None, :]
                               * ds_c[:, None, None], cshape)
        cvy = jnp.broadcast_to(inv11 * ys_c[None, :, None]
                               * ds_c[:, None, None], cshape)
        cvz = jnp.broadcast_to(-ds_c[:, None, None], cshape)
        cwx = iv[0, 0] * cvx + iv[0, 1] * cvy + iv[0, 2] * cvz + iv[0, 3]
        cwy = iv[1, 0] * cvx + iv[1, 1] * cvy + iv[1, 2] * cvz + iv[1, 3]
        cwz = iv[2, 0] * cvx + iv[2, 1] * cvy + iv[2, 2] * cvz + iv[2, 3]
        wp_c = jnp.stack([cwx, cwy, cwz], -1)
        dist_c = jnp.broadcast_to(ds_c[:, None, None], cshape)
        sf_c = shadow_factor_esm_fast(
            wp_c.reshape(-1, 3), esm, zmx, zsc,
            splits, shadowview, dist_c.reshape(-1))
        sf_c = sf_c.reshape(cd, ch, cw)
        sf = jnp.repeat(jnp.repeat(jnp.repeat(sf_c, 2, 0), 2, 1), 2, 2)
    else:
        sf = 1.0
    light = sun * (sf[..., None] if shadow is not None else 1.0) + ambient

    # front-to-back accumulation along z (cumsum/cumprod formulation)
    dz = jnp.diff(jnp.concatenate([jnp.zeros(1), froxel_depths(fog_d, depth_range)]))
    tau = jnp.cumsum(sigma * dz[:, None, None], axis=0)
    transmit = jnp.exp(-tau)
    scatter_step = sigma_rgb * light * (transmit * dz[:, None, None])[..., None]
    inscatter = jnp.cumsum(scatter_step, axis=0)
    return jnp.concatenate([inscatter, transmit[..., None]], -1)


def _fog_sample(depth, fogvol, proj, *, depth_range, exponent, sample_scale,
                band_y0=0, full_height=None):
    """Reduced-res fog tap: (hq, wq, 4) [inscatter rgb, transmittance].

    TWO flat row-gathers per pixel (quad-packed xy rows make each tap
    xy-bilinear; the z pair is lerped) — the per-slice dense-resize
    formulation cost ~200 ms/frame at 1080p.
    """
    import jax

    from .blur import downsample_pool
    from .sampling import quad_pack

    h, w = depth.shape
    fog_d, fog_h, fog_w, _ = fogvol.shape
    q = sample_scale
    while q > 1 and (h % q or w % q):
        q //= 2

    # two 16-float row gathers (slice k and k+1) against one quad-packed
    # table.  The round-3 z-pair 32-float packed row measured SLOWER on
    # the real chip (3.47 vs 3.15 ms at quarter res,
    # profiling/prof_fogtap.py): gather cost is per-BYTE here, not
    # per-issue, and the doubled table costs an extra ~59 MB build/frame
    # (118 MB total for the 64*90*160*32-float table vs 59 MB kept)
    qtab = jax.vmap(quad_pack)(fogvol).reshape(-1, 16)   # (D*H*W, 16)

    dq = downsample_pool(depth, q, reduce="first")
    hq, wq = dq.shape
    dist = proj[2, 3] / jnp.maximum(dq + proj[2, 2], 1e-7)
    slice_f = (jnp.power(jnp.clip(dist / depth_range, 0.0, 1.0),
                         1.0 / exponent) * fog_d - 0.5)
    k0 = jnp.clip(jnp.floor(slice_f), 0, fog_d - 1).astype(jnp.int32)
    fz = jnp.clip(slice_f - k0, 0.0, 1.0)[..., None]

    fhq = (full_height // q) if full_height is not None else hq
    xf = (jnp.arange(wq, dtype=jnp.float32) + 0.5) / wq * fog_w - 0.5
    yf = ((jnp.arange(hq, dtype=jnp.float32) + band_y0 // q + 0.5) / fhq
          * fog_h - 0.5)
    x0 = jnp.clip(jnp.floor(xf), 0, fog_w - 1).astype(jnp.int32)[None, :]
    y0 = jnp.clip(jnp.floor(yf), 0, fog_h - 1).astype(jnp.int32)[:, None]
    # zero the fraction where the floor was clamped at the low edge, so
    # border pixels clamp to texel 0 instead of extrapolating toward
    # texel 1 (same fix as sampling._quad_bilinear)
    fx = jnp.where(jnp.floor(xf) < 0, 0.0,
                   jnp.clip(xf - jnp.floor(xf), 0.0, 1.0))[None, :, None]
    fy = jnp.where(jnp.floor(yf) < 0, 0.0,
                   jnp.clip(yf - jnp.floor(yf), 0.0, 1.0))[:, None, None]
    cell = y0 * fog_w + x0                               # (hq, wq)

    def xy_bilerp(rows):
        t00, t01 = rows[..., 0:4], rows[..., 4:8]
        t10, t11 = rows[..., 8:12], rows[..., 12:16]
        top = t00 + (t01 - t00) * fx
        bot = t10 + (t11 - t10) * fx
        return top + (bot - top) * fy

    flat0 = k0 * (fog_h * fog_w) + cell                  # (hq, wq)
    flat1 = jnp.minimum(k0 + 1, fog_d - 1) * (fog_h * fog_w) + cell
    fog_q = xy_bilerp(qtab[flat0])
    return fog_q + (xy_bilerp(qtab[flat1]) - fog_q) * fz, q


def apply_fog(hdr, depth, fogvol, proj, *, depth_range=FOG_DEPTH_RANGE,
              exponent=FOG_DEPTH_EXPONENT, sample_scale=4):
    """Blend the fog volume over the HDR image.

    color' = color * transmittance + inscatter, slice chosen per pixel
    from view depth (reference: lighting.comp fog apply + global_fog).
    """
    from .blur import resize_up_dense

    h, w = depth.shape
    fog_q, q = _fog_sample(depth, fogvol, proj, depth_range=depth_range,
                           exponent=exponent, sample_scale=sample_scale)
    fog = resize_up_dense(fog_q, h, w) if q > 1 else fog_q
    return hdr * fog[..., 3:4] + fog[..., :3]


def fog_planes(depth, fogvol, proj, *, depth_range=FOG_DEPTH_RANGE,
               exponent=FOG_DEPTH_EXPONENT, sample_scale=4, y0=0,
               full_height=None):
    """Fog apply factors as 4 channel-first full-res planes
    [inscatter r, g, b, transmittance] for the shade megakernel.
    y0/full_height (full-res units) globalize the screen mapping for
    tile-sharded bands."""
    from .blur import resize_up_dense

    h, w = depth.shape
    fog_q, q = _fog_sample(depth, fogvol, proj, depth_range=depth_range,
                           exponent=exponent, sample_scale=sample_scale,
                           band_y0=y0, full_height=full_height)
    fq = jnp.transpose(fog_q, (2, 0, 1))
    return [resize_up_dense(fq[c], h, w) if q > 1 else fq[c]
            for c in range(4)]


def apply_fog_planes(hdr, depth, planes, *, proj, invview, exposure=1.0,
                     full_size=None, y0=0):
    """Analytic half-space fog planes blended over the lit frame.

    Reference parity: data/fogplane.frag — per pixel, the distance the
    view ray travels through the fog half-space gives factor =
    exp2(-(density*dist)^2); the plane color blends in with weight
    alpha*(1-factor).  planes: dict(plane (K,4), color (K,4), density
    (K,), startdistance (K,), falloff (K,), count () int32).
    """
    from .lighting_pass import reconstruct_positions

    h, w = depth.shape
    fh, fw = full_size if full_size is not None else (h, w)
    # background depth=0 reconstructs at infinity under the infinite-far
    # reverse-Z projection; clamp so the fog math stays finite (the sky
    # then simply receives full-distance fog, as in the reference)
    safe_depth = jnp.maximum(depth, 1e-7)
    _, worldpos = reconstruct_positions(safe_depth, proj, invview, fw, fh,
                                        y0=y0)
    campos = invview[:3, 3]
    v = campos - worldpos
    vlen = jnp.minimum(jnp.linalg.norm(v, axis=-1), 1e7)

    for i in range(planes["plane"].shape[0]):
        pl = planes["plane"][i]
        fdotc = jnp.dot(pl[:3], campos) + pl[3]
        fdotp = worldpos @ pl[:3] + pl[3]
        fdotv = v @ pl[:3]
        k = jnp.where(fdotc <= 0, 1.0, 0.0)
        c1 = jnp.minimum(k * fdotp, 0.0) + k * fdotc
        c2 = jnp.where(fdotp <= 0, (1 - k) * fdotp, k * fdotc)
        t = jnp.minimum(-0.5 * planes["falloff"][i]
                        * (c1 - c2 * fdotp / jnp.maximum(jnp.abs(fdotv), 1e-6)),
                        1.0)
        dist = jnp.clip(t * vlen - planes["startdistance"][i], 0.0, 1e6)
        factor = jnp.clip(jnp.exp2(-(planes["density"][i] * dist) ** 2),
                          0.0, 1.0)
        on = (i < planes["count"]).astype(jnp.float32)
        wgt = (planes["color"][i, 3] * (1.0 - factor) * on)[..., None]
        hdr = hdr * (1 - wgt) + exposure * planes["color"][i, :3] * wgt
    return hdr
