"""Deferred lighting pass: gbuffer + lights -> HDR color.

TPU equivalent of the clustered-deferred shading kernel (reference:
data/lighting.comp — gbuffer decode, cascaded main light, point/spot
loops, IBL env + SH probes, fog apply, exposure).  v1 shades densely:
main light + ambient IBL-less terms + a bounded point/spot loop over
the whole screen; the clustered per-tile light-list path replaces the
dense loop as scenes scale (see ops/cluster.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import brdf


def view_ray_grid(invproj, width, height, y0=0, local_h=None, dtype=jnp.float32):
    """Per-pixel view ray (x, y, -1) through each pixel center."""
    lh = local_h or height
    yn = ((jnp.arange(lh, dtype=dtype) + y0 + 0.5) / height * 2.0 - 1.0)[:, None]
    xn = ((jnp.arange(width, dtype=dtype) + 0.5) / width * 2.0 - 1.0)[None, :]
    rx = invproj[0, 0] * xn
    ry = invproj[1, 1] * yn
    return jnp.broadcast_to(rx, (lh, width)), jnp.broadcast_to(ry, (lh, width))


def reconstruct_positions(depth, proj, invview, width, height, y0=0):
    """Depth buffer -> view-space and world-space positions.

    Matches the reconstruction contract (reference: data/gbuffer.inc
    view_depth/view_position): view_z = proj[2][3]/(d + proj[2][2]) is
    the positive distance along -Z.
    """
    h, w = depth.shape
    rx, ry = view_ray_grid(_inv_proj(proj), width, height, y0=y0, local_h=h)
    # background depth==0 under the infinite reverse-Z projection makes
    # the denominator 0 -> inf positions -> NaN eyevec; those NaNs used
    # to die at the final mask, but reduced-res pooling mixes them into
    # covered pixels (and bloom then smears NaN over the whole frame).
    # Clamp to a huge-but-finite distance instead.
    denom = depth + proj[2, 2]
    dist = proj[2, 3] / jnp.where(jnp.abs(denom) < 1e-7,
                                  jnp.where(denom < 0, -1e-7, 1e-7), denom)
    viewpos = jnp.stack([rx * dist, ry * dist, -dist], axis=-1)
    worldpos = viewpos @ invview[:3, :3].T + invview[:3, 3]
    return viewpos, worldpos


def _inv_proj(proj):
    # analytic inverse entries needed for the ray grid (perspective form)
    inv00 = 1.0 / proj[0, 0]
    inv11 = 1.0 / proj[1, 1]
    m = jnp.zeros((4, 4), proj.dtype)
    m = m.at[0, 0].set(inv00).at[1, 1].set(inv11)
    return m


def shade_deferred(gbuffer, depth, sceneset, *, proj, invview,
                   ssao=None, fogvol=None, shadowfactor=None, shadowmaps=None,
                   ibl=None, env_specular=None, env_diffuse=None, envbrdf=None,
                   cluster=None, spotmaps=None, full_size=None, y0=0,
                   shadow_factor_scale=2, env_scale=2,
                   shadow_slice_blend=0.0, up_to=None):
    """Main deferred shade.  Returns HDR color (H, W, 3) premultiplied by
    camera exposure (reference: lighting.comp:274-283 applies exposure at
    the end of the lighting pass).  full_size/y0 support row-band shards.

    up_to(x, out_h, out_w): upsampler for the reduced-res factor/env
    fields (default resize_up_dense).  Tile-sharded bands pass an
    all-gather-upsample-slice closure — a band-local upsample edge-clamps
    at band boundaries and diverges from the single-device frame (same
    parity mechanism as frame._assemble_gplanes)."""
    h, w = depth.shape
    fh, fw = full_size if full_size is not None else (h, w)
    viewpos, worldpos = reconstruct_positions(depth, proj, invview, fw, fh, y0=y0)
    campos = invview[:3, 3]

    normal = gbuffer["normal"][..., :3] * 2.0 - 1.0
    material = dict(
        diffuse=gbuffer["diffuse"][..., :3],
        specular=gbuffer["specular"][..., :3],
        roughness=gbuffer["specular"][..., 3],
        alpha=gbuffer["specular"][..., 3] ** 2,
        emissive=128.0 * gbuffer["diffuse"][..., 3] ** 3,
    )
    eyevec = brdf.normalize(campos - worldpos)

    ambient = sceneset["camera"]["ambientintensity"]
    if ssao is not None:
        ambient = ambient * ssao

    diffuse = jnp.zeros((h, w, 3), jnp.float32)
    specular = jnp.zeros((h, w, 3), jnp.float32)

    # environment lookups from the global IBL (reference:
    # lighting.comp:174-226 — env diffuse from a deep mip along the
    # diffuse dominant direction, specular from the roughness mip chain)
    if ibl is not None and env_diffuse is None:
        from .sampling import (
            sample_cubemap, sample_cubemap_lod, sample_cubemap_lod_flat,
            sample_cubemap_lod_quad,
        )

        mips = ibl["mips"]
        rough = material["roughness"]
        r = 2.0 * jnp.sum(normal * eyevec, -1, keepdims=True) * normal - eyevec
        sdir = brdf.specular_dominant_direction(normal, r, rough)
        ddir = brdf.diffuse_dominant_direction(normal, eyevec, rough)
        # skybox orientation: global env lookups rotate world dirs into
        # env space (reference: lighting.comp:192-193 invtransform)
        skyrot = sceneset["camera"].get("skyrot_inv",
                                        jnp.eye(3, dtype=jnp.float32))
        if "sh" in ibl and "flatq" in ibl and ibl.get("envprobes") is None \
                and env_scale > 1 and h % env_scale == 0 and w % env_scale == 0:
            # fast path: env radiance terms at 1/env_scale res (2 quad
            # gathers + 1 flat LUT gather per low-res pixel), upsampled
            # densely; diffuse irradiance is a per-pixel SH-9 polynomial
            # — zero full-res gathers.  Per-pixel gathers are the TPU
            # wall (see PERF.md lesson 1); the env radiance field is
            # smooth so reduced-res costs no visible quality.
            from .blur import downsample_pool, resize_up_dense
            p = env_scale
            # mask-weighted pooling: background lanes carry garbage
            # (huge clamped positions) that would bleed into covered
            # pixels at silhouettes
            mk = gbuffer["mask"].astype(jnp.float32)[..., None]
            mk_h = jnp.maximum(downsample_pool(mk, p), 1e-6)
            sdir_h = brdf.normalize(downsample_pool(sdir * mk, p) / mk_h)
            rough_h = downsample_pool(rough[..., None] * mk, p)[..., 0] / mk_h[..., 0]
            ndv = jnp.clip(jnp.sum(normal * eyevec, -1), 0.0, 1.0)
            ndv_h = downsample_pool(ndv[..., None] * mk, p)[..., 0] / mk_h[..., 0]
            lod_h = rough_h * (len(mips) - 1)
            spec_h = sample_cubemap_lod_quad(ibl["flatq"], sdir_h @ skyrot.T,
                                             lod_h)[..., :3]
            lut = ibl["envbrdf"]
            s = lut.shape[0]
            flat_lut = lut.reshape(-1, lut.shape[-1])
            bi = jnp.clip((rough_h * s).astype(jnp.int32), 0, s - 1)
            bj = jnp.clip((ndv_h * s).astype(jnp.int32), 0, s - 1)
            eb_h = flat_lut[bi * s + bj]
            _up = up_to if up_to is not None else resize_up_dense
            env_specular = _up(spec_h, h, w)
            envbrdf = _up(eb_h, h, w)
            # deepest specular mip ~ E(d)/pi (the GGX roughness-1
            # prefilter normalizes by sum N.L); probe_irradiance(sh)
            # evaluates E(d), so /pi matches the sampled path.  ddir is
            # NOT unit length (dominant-direction bend) — the SH basis
            # needs a normalized direction (cubemap taps normalize
            # implicitly)
            env_diffuse = brdf.probe_irradiance(
                ibl["sh"], brdf.normalize(ddir) @ skyrot.T) / brdf.PI
        else:
            lod = rough * (len(mips) - 1)
            sdir_e, ddir_e = sdir @ skyrot.T, ddir @ skyrot.T
            if "flat" in ibl:   # 8 gathers/pixel vs 4 per mip level
                env_specular = sample_cubemap_lod_flat(ibl["flat"], sdir_e,
                                                       lod)[..., :3]
            else:
                env_specular = sample_cubemap_lod(mips, sdir_e, lod)[..., :3]
            env_diffuse = sample_cubemap(mips[-1], ddir_e)[..., :3]
            lut = ibl["envbrdf"]
            s = lut.shape[0]
            ndv = jnp.clip(jnp.sum(normal * eyevec, -1), 0.0, 1.0)
            bi = jnp.clip((rough * s).astype(jnp.int32), 0, s - 1)
            bj = jnp.clip((ndv * s).astype(jnp.int32), 0, s - 1)
            envbrdf = lut[bi, bj]

        # local environment probe boxes override the global env
        # (reference: lighting.comp:187-207 environment loop)
        envs = ibl.get("envprobes")
        if envs is not None and envs["position"].shape[0] > 0:
            from .envprobe import env_probe_lookup
            env_specular, env_diffuse = env_probe_lookup(
                worldpos, sdir, ddir, rough, envs, env_specular, env_diffuse)

    # SH irradiance probes add to env diffuse (reference:
    # lighting.comp:210-221 probe_irradiance accumulation)
    probes = sceneset.get("probes")
    if probes is not None and int(probes["position"].shape[0]) > 0 \
            and env_diffuse is not None:
        total_w = jnp.ones(worldpos.shape[:-1], jnp.float32)
        acc = env_diffuse
        for i in range(probes["position"].shape[0]):
            on = (i < probes["count"]).astype(jnp.float32)
            pd = jnp.linalg.norm(probes["position"][i, :3] - worldpos, axis=-1)
            dr = pd / jnp.maximum(probes["position"][i, 3], 1e-6)
            dr2 = dr * dr
            att = jnp.clip(1.0 - dr2 * dr2, 0.0, 1.0)
            att = att * att * on
            irr = brdf.probe_irradiance(probes["sh"][i], normal)
            acc = acc + irr * att[..., None]
            total_w = total_w + att
        env_diffuse = acc / total_w[..., None]

    # environment / ambient term
    if env_diffuse is not None and envbrdf is not None:
        d, s = brdf.env_light(material, env_diffuse, env_specular, envbrdf,
                              jnp.broadcast_to(jnp.asarray(ambient), (h, w)))
        diffuse = diffuse + d
        specular = specular + s * sceneset["camera"]["specularintensity"]
    else:
        # constant-ambient fallback while IBL inputs are absent
        amb = jnp.asarray(ambient * 0.2)
        diffuse = diffuse + (amb[..., None] if amb.ndim == 2 else amb)

    # main light
    ml = sceneset["mainlight"]
    if shadowfactor is not None:
        sf = shadowfactor
    elif shadowmaps is not None and isinstance(shadowmaps, tuple):
        # reduced-res single-gather ESM lookup, densely upsampled (the
        # ESM is pre-blurred so the factor field is smooth); avg-pool
        # instead of strided slicing (lane-strided reads are slow on TPU)
        from .shadow import shadow_factor_esm_fast

        p = shadow_factor_scale

        from .blur import downsample_pool

        def pool(x):
            return downsample_pool(x, p)

        esm, zmx, zsc = shadowmaps[:3]
        sf_h = shadow_factor_esm_fast(pool(worldpos), esm, zmx, zsc,
                                      ml["splits"], ml["shadowview"],
                                      pool(-viewpos[..., 2]),
                                      normal=pool(normal),
                                      slice_blend=shadow_slice_blend,
                                      esm_pair=(shadowmaps[3]
                                                if len(shadowmaps) > 3
                                                else None))
        from .blur import resize_up_dense
        sf = (up_to if up_to is not None else resize_up_dense)(sf_h, h, w)
    elif shadowmaps is not None:
        from .shadow import shadow_factor as _shadow_factor
        sf = _shadow_factor(worldpos, shadowmaps, ml["splits"], ml["shadowview"],
                            -viewpos[..., 2], normal=normal)
    else:
        sf = jnp.ones((h, w), jnp.float32)
    d, s = brdf.main_light(normal, eyevec, material, ml["direction"],
                           ml["intensity"], ml["cutoff"], sf)
    diffuse = diffuse + d
    specular = specular + s

    # point lights: clustered per-tile lists when provided (reference:
    # lighting.comp cluster-mask loops), else a bounded dense loop
    pl = sceneset["pointlights"]
    nlights = pl["position"].shape[0]
    count = pl["count"]

    if cluster is not None and nlights > 0:
        from .cluster import clustered_point_lights
        lists, ccounts, ctx_, cty_ = cluster
        d, s = clustered_point_lights(worldpos, normal, eyevec, material,
                                      pl, lists, ctx_, cty_)
        diffuse = diffuse + d
        specular = specular + s
    elif nlights > 0:
        # chunked loop: evaluate K lights per trip so the two full-res
        # accumulators round-trip HBM once per chunk, not once per light
        # (the per-light fori measured ~3.4 ms for 8 lights on v5e,
        # trace while.38) — one trip total for scenes with <= K lights
        K = 8

        def body(c, accum):
            dif, spec = accum
            for j in range(K):
                i = c * K + j
                ic = jnp.minimum(i, nlights - 1)
                d_i, s_i = brdf.point_light(
                    worldpos, normal, eyevec, material,
                    pl["position"][ic], pl["intensity"][ic],
                    pl["attenuation"][ic])
                on = (i < count).astype(jnp.float32)
                dif = dif + on * d_i
                spec = spec + on * s_i
            return (dif, spec)

        nchunks = (jnp.minimum(count, nlights) + K - 1) // K
        diffuse, specular = jax.lax.fori_loop(0, nchunks, body,
                                              (diffuse, specular))

    # spot lights (shadowed for the first max_spot_shadows slots)
    sl = sceneset.get("spotlights")
    if sl is not None and sl["position"].shape[0] > 0:
        n_maps = spotmaps.shape[0] if spotmaps is not None else 0
        ns = sl["position"].shape[0]
        scount = sl["count"]
        # shadowed slots are static config (max_spot_shadows): unroll
        from .shadow import spot_shadow_factor
        for i in range(n_maps):
            shadow = spot_shadow_factor(worldpos, spotmaps[i],
                                        sl["shadowview"][i])
            d_i, s_i = brdf.spot_light(worldpos, normal, eyevec, material,
                                       sl["position"][i], sl["intensity"][i],
                                       sl["attenuation"][i], sl["direction"][i],
                                       sl["cutoff"][i], shadow)
            on = (i < scount).astype(jnp.float32)
            diffuse = diffuse + on * d_i
            specular = specular + on * s_i
        # unshadowed remainder: chunked like the point lights
        K = 4

        def sbody(c, accum):
            dif, spec = accum
            for j in range(K):
                i = n_maps + c * K + j
                ic = jnp.minimum(i, ns - 1)
                d_i, s_i = brdf.spot_light(
                    worldpos, normal, eyevec, material,
                    sl["position"][ic], sl["intensity"][ic],
                    sl["attenuation"][ic], sl["direction"][ic],
                    sl["cutoff"][ic], jnp.float32(1.0))
                on = (i < scount).astype(jnp.float32)
                dif = dif + on * d_i
                spec = spec + on * s_i
            return (dif, spec)

        nchunks = (jnp.maximum(jnp.minimum(scount, ns) - n_maps, 0)
                   + K - 1) // K
        diffuse, specular = jax.lax.fori_loop(0, nchunks, sbody,
                                              (diffuse, specular))

    emissive_term = material["emissive"][..., None] * material["diffuse"]
    color = (material["diffuse"] * diffuse + specular + emissive_term)

    if fogvol is not None:
        color = color * fogvol[..., 3:4] + fogvol[..., :3]

    exposure = sceneset["camera"]["exposure"]
    color = color * exposure
    # background stays black (skybox pass fills it separately)
    return jnp.where(gbuffer["mask"][..., None], color, jnp.zeros_like(color))
