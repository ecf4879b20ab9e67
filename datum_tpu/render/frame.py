"""The jitted frame graph.

TPU equivalent of the reference's render() frame submission (reference:
src/renderer/renderer.cpp:6423-6853): one compiled XLA program that
takes (device pools, per-frame draw arrays, sceneset pytree) and
produces the final display image plus feedback values (scene
luminance).  Pass ordering becomes pure dataflow — XLA schedules and
fuses; no semaphores exist.

Draw expansion: the host ships only (mesh id, transform, material) per
draw; cumsum + searchsorted gathers expand the persistent mesh pools
into per-frame vertex/triangle streams at static capacity — the
device-side analogue of instanced indirect draw.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import raster as raster_ops
from ..ops import shade as shade_ops
from ..ops import lighting_pass
from ..ops import composite as composite_ops
from ..ops.geometry import transform_vertices_rigid
from ..ops.common import FrameConfig


def expand_draws_host(pool, draw_mesh, draw_count, max_v, max_t):
    """Host-side (numpy) draw expansion — same contract as expand_draws.

    The expansion indices depend only on the draw list topology (mesh
    ids + counts), not on any per-frame device data, so computing them
    on the CPU while the previous frame renders removes ~3.5 ms of
    scalar-unit index fusions from the device graph (the reference
    likewise builds its draw streams on the CPU render thread).
    """
    import numpy as np

    draw_mesh = np.asarray(draw_mesh)
    D = draw_mesh.shape[0]
    n = int(draw_count)
    dv = np.zeros(D, np.int64)
    dt = np.zeros(D, np.int64)
    dv[:n] = pool.mesh_vtx_count[draw_mesh[:n]]
    dt[:n] = pool.mesh_tri_count[draw_mesh[:n]]
    cv = np.cumsum(dv)
    ct = np.cumsum(dt)
    total_v = int(min(cv[-1], max_v))
    total_t = int(min(ct[-1], max_t))

    vtx_draw = np.full(max_v, D - 1, np.int32)
    vd = np.repeat(np.arange(D, dtype=np.int32), dv)[:total_v]
    vtx_draw[:total_v] = vd
    av = np.arange(max_v, dtype=np.int64)
    local_v = av[:total_v] - (cv - dv)[vd]
    src_v = np.zeros(max_v, np.int32)
    src_v[:total_v] = pool.mesh_vtx_offset[draw_mesh[vd]] + local_v
    v_valid = av < total_v

    tri_draw = np.full(max_t, D - 1, np.int32)
    td = np.repeat(np.arange(D, dtype=np.int32), dt)[:total_t]
    tri_draw[:total_t] = td
    at = np.arange(max_t, dtype=np.int64)
    local_t = at[:total_t] - (ct - dt)[td]
    src_t = pool.mesh_tri_offset[draw_mesh[td]] + local_t
    t_valid = at < total_t

    tris = np.zeros((max_t, 3), np.int32)
    startv = (cv - dv)[td].astype(np.int64)
    tris[:total_t] = (pool.triangles[src_t] + startv[:, None]
                      - pool.mesh_vtx_offset[draw_mesh[td]][:, None])

    return dict(src_v=src_v, vtx_draw=vtx_draw, v_valid=v_valid,
                tris=tris, tri_draw=tri_draw, t_valid=t_valid)


def attach_host_expansion(pool, draws, max_v, max_t):
    """expand_draws_host + derived per-triangle lookups, attached in
    place (called by RenderContext.expand_host)."""
    draws.update(expand_draws_host(pool, draws["mesh"], draws["count"],
                                   max_v, max_t))
    import numpy as np
    draws["tri_mat"] = np.asarray(draws["material"])[draws["tri_draw"]]
    return draws


def _bucketize(cum, n, dtype=jnp.int32):
    """searchsorted(cum, arange(n), side='right') as a dense compare-sum.

    XLA lowers searchsorted to a serial while-loop that measured ~4.8 ms
    per call at n=32k on v5e (trace: while.50/51 + their body fusions);
    the (n, D) broadcast-compare reduction is ~0.1 ms for D<=256.
    """
    a = jnp.arange(n, dtype=dtype)
    return jnp.sum((a[:, None] >= cum[None, :]).astype(dtype), axis=1)


def expand_draws(geom, draw_mesh, draw_count, max_v, max_t):
    """Expand the draw list into vertex/triangle streams (static shapes)."""
    D = draw_mesh.shape[0]
    active = jnp.arange(D) < draw_count
    dv = jnp.where(active, geom["mesh_vtx_count"][draw_mesh], 0)
    dt = jnp.where(active, geom["mesh_tri_count"][draw_mesh], 0)
    cv = jnp.cumsum(dv)
    ct = jnp.cumsum(dt)
    startv = cv - dv
    startt = ct - dt

    av = jnp.arange(max_v, dtype=jnp.int32)
    vtx_draw = jnp.clip(_bucketize(cv, max_v), 0, D - 1)
    local_v = av - startv[vtx_draw]
    v_valid = av < cv[-1]
    src_v = jnp.where(v_valid,
                      geom["mesh_vtx_offset"][draw_mesh[vtx_draw]] + local_v, 0)

    at = jnp.arange(max_t, dtype=jnp.int32)
    tri_draw = jnp.clip(_bucketize(ct, max_t), 0, D - 1)
    local_t = at - startt[tri_draw]
    t_valid = at < ct[-1]
    src_t = jnp.where(t_valid,
                      geom["mesh_tri_offset"][draw_mesh[tri_draw]] + local_t, 0)

    tri_pool = geom["triangles"][src_t]                     # pool-global vids
    mesh_of_tri = draw_mesh[tri_draw]
    tris = (startv[tri_draw][:, None] + tri_pool
            - geom["mesh_vtx_offset"][mesh_of_tri][:, None])
    tris = jnp.where(t_valid[:, None], tris, 0)             # padding -> degenerate

    return dict(src_v=src_v, vtx_draw=vtx_draw, v_valid=v_valid,
                tris=tris, tri_draw=tri_draw, t_valid=t_valid)


def _skyrot(sceneset):
    """World->env rotation for global environment lookups (reference:
    environments[0].invtransform = inverse(params.skyboxorientation),
    renderer.cpp:6347).  Identity when the sceneset doesn't carry it."""
    return sceneset["camera"].get("skyrot_inv",
                                  jnp.eye(3, dtype=jnp.float32))


def _assemble_gplanes(cfg, planes, device, sceneset, ibl, shadowmaps, w, h,
                      y0=0, full_h=None, up_to=None, up_to_batch=None,
                      prev_row=None):
    """Material + environment + sun-shadow plane assembly for ONE layer
    of raster output (opaque or the lit translucent layer).  Returns
    (gpl dict for the shade megakernel, coverage mask).

    y0/full_h globalize screen-space reconstruction when planes are a
    tile-sharded band (y0 may be traced).

    up_to(x, oh, ow) / up_to_batch(x3, oh, ow): upsamplers for
    reduced-res fields.  The tile-sharded path passes closures that
    all-gather the field, upsample globally and slice the band back out
    — a band-local upsample edge-clamps at band boundaries and diverges
    from the single-device frame (the round-3 multi-chip parity gap)."""
    if full_h is None:
        full_h = h
    from ..ops import brdf
    from ..ops.blur import downsample_pool, resize_up_dense
    from ..ops.blur import resize_up_dense_batch as _up_batch_local
    if up_to is None:
        up_to = resize_up_dense
    if up_to_batch is None:
        up_to_batch = _up_batch_local
    from ..ops.lighting_pass import reconstruct_positions
    from ..ops.sampling import sample_cubemap_lod_quad
    from ..ops.shade import sample_matmaps
    from ..ops.shadow import sun_shadow_factor_quarter

    depth = planes["depth"]
    mask = planes["visf"] >= 0.0
    proj, invview = sceneset["proj"], sceneset["invview"]

    # ---- half-res material taps + environment fields
    p = 2
    uv_h = jnp.stack([downsample_pool(planes["u"], p),
                      downsample_pool(planes["v"], p)], -1)
    base_h = jnp.round(downsample_pool(planes["mbase"], p,
                                       reduce="first")).astype(jnp.int32)
    size_h = jnp.round(downsample_pool(planes["msize"], p,
                                       reduce="first")).astype(jnp.int32)
    # tile-sharded bands pass prev_row (ppermute of the neighbor band's
    # last uv row) so the mip-LOD backward difference at band row 0
    # matches the single-device frame
    prev_uv = prev_row(uv_h) if prev_row is not None else None
    mm12 = sample_matmaps(device["matmaps"]["table"], base_h, size_h, uv_h,
                          pool=p, channel_first=True,
                          prev_uv_row=prev_uv)   # (12, H/2, W/2)

    probe_dif = None
    if ibl is not None:
        mk = mask.astype(jnp.float32)
        # ONE stacked 5-channel pool (mask, masked normal, masked rough)
        # instead of five reduce_window launches
        pooled5 = downsample_pool(jnp.stack(
            [mk, planes["nx"] * mk, planes["ny"] * mk, planes["nz"] * mk,
             planes["rgh"] * mk], -1), p)
        mk_h = jnp.maximum(pooled5[..., :1], 1e-6)
        nrm_h = brdf.normalize(pooled5[..., 1:4] / mk_h)
        d_h = downsample_pool(depth, p, reduce="first")
        vp_h, wp_h = reconstruct_positions(d_h, proj, invview,
                                           w // p, full_h // p,
                                           y0=y0 // p)
        eye_h = brdf.normalize(invview[:3, 3] - wp_h)
        rough_h = pooled5[..., 4] / mk_h[..., 0] * mm12[7]
        r_h = (2.0 * jnp.sum(nrm_h * eye_h, -1, keepdims=True) * nrm_h
               - eye_h)
        sdir_h = brdf.specular_dominant_direction(nrm_h, r_h, rough_h)
        mips_n = len(ibl["mips"])
        # global env samples rotate by the skybox orientation (probes
        # below keep world-space dirs — local boxes are world-authored).
        # mip-pair rows (flatp) tap trilinear in ONE gather
        if "flatp" in ibl:
            from ..ops.sampling import sample_cubemap_lod_pair
            spec_h = sample_cubemap_lod_pair(
                ibl["flatp"], brdf.normalize(sdir_h) @ _skyrot(sceneset).T,
                rough_h * (mips_n - 1))[..., :3]
        else:
            spec_h = sample_cubemap_lod_quad(
                ibl["flatq"], brdf.normalize(sdir_h) @ _skyrot(sceneset).T,
                rough_h * (mips_n - 1))[..., :3]

        # box-projected env probes (reference: lighting.comp:187-207):
        # quarter-res override fields — specular blends into the
        # half-res env field here, diffuse ships to the kernel as
        # override planes (edr/edg/edb/edm)
        envs = ibl.get("envprobes")
        if envs is not None and "flatqs" in envs:
            from ..ops.envprobe import env_probe_fields
            wp_q = downsample_pool(wp_h, 2)
            sdir_q = brdf.normalize(downsample_pool(sdir_h, 2))
            rough_q2 = downsample_pool(rough_h, 2)
            nrm_q = brdf.normalize(downsample_pool(nrm_h, 2))
            eye_q = brdf.normalize(downsample_pool(eye_h, 2))
            ddir_q = brdf.diffuse_dominant_direction(nrm_q, eye_q, rough_q2)
            spec_o, dif_o, hitm = env_probe_fields(wp_q, sdir_q, ddir_q,
                                                   rough_q2, envs)
            hit_h = up_to(hitm, h // p, w // p)
            spec_h = jnp.where(hit_h[..., None] > 0.5,
                               up_to(spec_o, h // p, w // p),
                               spec_h)
            probe_dif = (dif_o, hitm)
        # envBRDF at quarter res: the split-sum integral field is smooth
        # in (roughness, NdotV), so halve the lookups again
        lut = ibl["envbrdf"]
        s_ = lut.shape[0]
        ndv_h = jnp.clip(jnp.sum(nrm_h * eye_h, -1), 0.0, 1.0)
        rough_q = downsample_pool(rough_h, 2)
        ndv_q = downsample_pool(ndv_h, 2)
        bi = jnp.clip((rough_q * s_).astype(jnp.int32), 0, s_ - 1)
        bj = jnp.clip((ndv_q * s_).astype(jnp.int32), 0, s_ - 1)
        eb_h = up_to(lut.reshape(-1, lut.shape[-1])[bi * s_ + bj],
                     h // p, w // p)
    else:
        # no environment: zero specular env; the constant-ambient
        # fallback (amb * 0.2, matching shade_deferred) rides the SH DC
        # coefficient with eb2 = 1
        h2, w2 = h // p, w // p
        spec_h = jnp.zeros((h2, w2, 3), jnp.float32)
        eb_h = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                                (h2, w2, 3))

    # 15 half-res channel-first planes -> ONE batched dense 2x upsample
    # (lane interleaves are impossible inside Mosaic, so upsampling
    # happens here; mm12 is already channel-first from the flat sampler;
    # the per-plane loop cost ~30 extra dispatches on a dispatch-bound
    # frame)
    half = jnp.concatenate([
        mm12[jnp.array([0, 1, 2, 4, 5, 7, 8, 9, 10])],   # alb rgb, surf
                                                         # m/r/rough, nmap
        jnp.transpose(spec_h, (2, 0, 1)),
        jnp.transpose(eb_h, (2, 0, 1)),
    ], axis=0)                                         # (15, H/2, W/2)
    up3 = up_to_batch(half, h, w)
    up = [up3[k] for k in range(15)]
    (alb_r, alb_g, alb_b, surf_m, surf_r, surf_rough,
     nm_x, nm_y, nm_z, es_r, es_g, es_b, eb0, eb1, eb2) = up

    # ---- full-res material derivation (gbuffer encode, elementwise)
    metal = planes["met"] * surf_m
    refl = planes["rfl"] * surf_r
    rough = planes["rgh"] * surf_rough
    albc = (alb_r * planes["cr"], alb_g * planes["cg"], alb_b * planes["cb"])
    one_m = 1.0 - metal
    s0 = 0.16 * refl * refl
    gpl = dict(
        depth=depth, visf=planes["visf"], em=planes["em"], rgh=rough,
        dr=albc[0] * one_m, dg=albc[1] * one_m, db=albc[2] * one_m,
        sr=s0 + (albc[0] - s0) * metal,
        sg=s0 + (albc[1] - s0) * metal,
        sb=s0 + (albc[2] - s0) * metal,
        esr=es_r, esg=es_g, esb=es_b, eb0=eb0, eb1=eb1, eb2=eb2,
    )
    # TBN normal mapping (reference: geometry.frag)
    nrm = brdf.normalize(jnp.stack([planes["nx"], planes["ny"],
                                    planes["nz"]], -1))
    tan = jnp.stack([planes["tanx"], planes["tany"], planes["tanz"]], -1)
    tgt = brdf.normalize(tan - nrm * jnp.sum(tan * nrm, -1, keepdims=True))
    btg = jnp.cross(nrm, tgt) * planes["tanw"][..., None]
    sn = brdf.normalize(tgt * nm_x[..., None] * 2.0
                        + btg * nm_y[..., None] * 2.0
                        + nrm * nm_z[..., None] * 2.0
                        - (tgt + btg + nrm))
    gpl["nx"], gpl["ny"], gpl["nz"] = sn[..., 0], sn[..., 1], sn[..., 2]

    # ---- box env-probe diffuse override planes (see above)
    if probe_dif is not None:
        dif_o, hitm = probe_dif
        dif_f = up_to(dif_o, h, w)
        gpl["edr"], gpl["edg"], gpl["edb"] = \
            dif_f[..., 0], dif_f[..., 1], dif_f[..., 2]
        gpl["edm"] = up_to(hitm, h, w)

    # ---- sun shadow factor (quarter-res ESM, upsampled)
    if cfg.enable_shadows and shadowmaps is not None:
        sfq = sun_shadow_factor_quarter(
            depth, (planes["nx"], planes["ny"], planes["nz"]), shadowmaps,
            sceneset, proj=proj, invview=invview, y0=y0,
            full_height=full_h, slice_blend=cfg.shadow_slice_blend)
        gpl["sf"] = up_to(sfq, h, w)
    else:
        gpl["sf"] = jnp.ones((h, w), jnp.float32)
    return gpl, mask


def _shade_with_kernel(cfg, planes, device, sceneset, draws, ibl, shadowmaps,
                       worldp, ex, w, h, geom=None, band=None, prev=None):
    """Assemble per-layer planes and launch the deferred-shade
    megakernel (ops/shade_pallas.py).  Returns (hdr, mask,
    gbuffer-or-None, ao_state-or-None).

    prev: previous-frame temporal state dict {"ao": (h/dec, w/dec, 2)
    stack from the last frame's hbao, "view": (4, 4) view matrix} —
    enables the reference's temporal AO reprojection (hbao.comp:156-162).

    band (tile-sharded path): dict with y0 (global first row, traced),
    full_h (global image height), tile_ids ((n_local,) global tile ids,
    traced), and optional precomputed 'ao' ((h, w) plane or None),
    'fogvol' (replicated fog volume), 'spotmaps' (pre-rastered spot
    maps).  planes/worldp stay band-local; NDC math goes global."""
    from ..ops import brdf
    from ..ops.blur import downsample_pool, resize_up_dense
    from ..ops.shade_pallas import shade_deferred_pallas
    from ..ops.shadow import (build_spot_esm, render_spot_maps,
                              spot_factor_quarter)

    depth = planes["depth"]
    proj, invview = sceneset["proj"], sceneset["invview"]
    y0 = band["y0"] if band else 0
    gh = band["full_h"] if band else h
    tile_ids = band.get("tile_ids") if band else None
    up_to = band.get("up_to") if band else None
    up_to_batch = band.get("up_to_batch") if band else None
    _up = up_to if up_to is not None else resize_up_dense
    prev_row = band.get("prev_row") if band else None
    gpl, mask = _assemble_gplanes(cfg, planes, device, sceneset, ibl,
                                  shadowmaps, w, h, y0=y0, full_h=gh,
                                  up_to=up_to, up_to_batch=up_to_batch,
                                  prev_row=prev_row)

    # ---- deferred decals on the fast path: dense blend over the shade
    # planes before lighting (reference: lighting.comp:136-164 — the
    # lighting kernel blends decals unconditionally)
    if cfg.max_decals_active > 0:
        from ..ops.decal import apply_decals_planes
        from ..ops.lighting_pass import reconstruct_positions
        _, wpos = reconstruct_positions(depth, proj, invview, w, gh,
                                        y0=y0)
        gpl = apply_decals_planes(
            gpl, (wpos[..., 0], wpos[..., 1], wpos[..., 2]),
            draws["decals"], mask,
            textures=(device.get("textures") if cfg.decal_textures
                      else None))

    # ---- optional SSAO feeding the kernel's ambient term
    ao_img = ao_state = None
    if band is not None and "ao" in band:
        ao_img = band["ao"]            # precomputed by the shard body
    elif cfg.enable_ssao and cfg.ssao_scale > 0:
        from ..ops.ssao import hbao, make_hbao_params
        dec = max(int(round(1.0 / cfg.ssao_scale)), 1)
        # ONE stacked 4-channel subsample instead of four launches
        sub4 = downsample_pool(jnp.stack(
            [depth, planes["nx"], planes["ny"], planes["nz"]], -1),
            dec, reduce="first")
        dd = sub4[..., 0]
        nn = brdf.normalize(sub4[..., 1:4]) * 0.5 + 0.5
        ao = hbao(dd, nn, proj, sceneset["view"], params=make_hbao_params(),
                  prev_ao=None if prev is None else prev["ao"],
                  prevview=None if prev is None else prev["view"],
                  invview=invview)
        ao_state = ao                  # feeds next frame's temporal pass
        strength = sceneset["camera"].get("ssaostrength", jnp.float32(1.0))
        ao_img = 1.0 + (resize_up_dense(ao[..., 0], h, w) - 1.0) * strength

    # ---- spot shadow factors (quarter res, ESM-softened)
    spotsf = None
    if cfg.max_spot_shadows > 0:
        sl_ = sceneset["spotlights"]
        if cfg.spot_shadow_mode == "parabolic":
            from ..ops.shadow import (render_spot_maps_parabolic,
                                      spot_factor_quarter_parabolic)
            if band is not None and band.get("spotmaps") is not None:
                spotmaps = band["spotmaps"]
            else:
                spotmaps = render_spot_maps_parabolic(
                    worldp, ex["tris"], sl_["view"],
                    sl_["attenuation"][:, 3],
                    cfg.max_spot_shadows, res=cfg.spot_shadow_res,
                    bin_capacity=cfg.shadow_bin_capacity,
                    big_capacity=cfg.big_capacity,
                    interpret=cfg.pallas_interpret,
                    early_z=cfg.raster_early_z)
            sesm = build_spot_esm(spotmaps)
            spotsf = jnp.stack([
                _up(
                    spot_factor_quarter_parabolic(
                        depth, sesm[i], sl_["view"][i],
                        sl_["attenuation"][i, 3], proj=proj,
                        invview=invview, y0=y0, full_height=gh), h, w)
                for i in range(cfg.max_spot_shadows)])
        else:
            if band is not None and band.get("spotmaps") is not None:
                spotmaps = band["spotmaps"]
            else:
                spotmaps = render_spot_maps(
                    worldp, ex["tris"], sl_["shadowview"],
                    cfg.max_spot_shadows, res=cfg.spot_shadow_res,
                    bin_capacity=cfg.shadow_bin_capacity,
                    big_capacity=cfg.big_capacity, use_pallas=True,
                    interpret=cfg.pallas_interpret,
                    early_z=cfg.raster_early_z)
            sesm = build_spot_esm(spotmaps)
            spotsf = jnp.stack([
                _up(
                    spot_factor_quarter(depth, sesm[i],
                                        sl_["shadowview"][i],
                                        proj=proj, invview=invview,
                                        y0=y0, full_height=gh), h, w)
                for i in range(cfg.max_spot_shadows)])

    ss2 = dict(sceneset)
    if ibl is not None:
        # rotate the SH-9 coefficients by the skybox orientation so the
        # kernel's per-pixel SH eval with WORLD normals matches the
        # reference's rotated env diffuse (lighting.comp:192)
        from ..ops.ibl import rotate_sh9
        ss2["_sh"] = rotate_sh9(ibl["sh"], _skyrot(sceneset))
    else:
        # DC-only SH reproducing the constant-ambient fallback:
        # basis0 * c0 / pi = 0.2  =>  c0 = 0.2 * pi / 0.886227
        sh0 = jnp.zeros((9, 3), jnp.float32).at[0, :].set(0.70898)
        ss2["_sh"] = sh0

    # ---- epilogue inputs: sky, volumetric fog, WBOIT — folded into the
    # kernel's final blend (each is ~10 separate full-res XLA ops
    # otherwise, and the frame is op-dispatch-bound)
    if ibl is not None and "flatq" in ibl:
        from ..ops.lighting_pass import view_ray_grid, _inv_proj
        from ..ops.sampling import sample_cubemap_lod_quad

        rx, ry = view_ray_grid(_inv_proj(proj), w, gh, y0=y0, local_h=h)
        rays = jnp.stack([rx, ry, -jnp.ones_like(rx)], -1)
        rays = rays @ invview[:3, :3].T
        rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
        lod = jnp.maximum(sceneset["camera"].get("skyboxlod",
                                                 jnp.float32(-1.0)), 0.0)
        rays_q = downsample_pool(rays, 4)
        # skybox orientation: world ray -> env-space ray (reference:
        # renderer.cpp:6221 skyview = inverse(skyboxorientation) * ...)
        rays_q = rays_q @ _skyrot(sceneset).T
        if "flatp" in ibl:
            from ..ops.sampling import sample_cubemap_lod_pair
            sky_q = sample_cubemap_lod_pair(
                ibl["flatp"], rays_q,
                jnp.broadcast_to(lod, rays_q.shape[:-1]))[..., :3]
        else:
            sky_q = sample_cubemap_lod_quad(
                ibl["flatq"], rays_q,
                jnp.broadcast_to(lod, rays_q.shape[:-1]))[..., :3]
        from ..ops.blur import resize_up_dense_batch
        sky3 = (up_to_batch or resize_up_dense_batch)(
            jnp.transpose(sky_q, (2, 0, 1)), h, w)
        for c, ch in enumerate("rgb"):
            gpl[f"sky_{ch}"] = sky3[c]

    if cfg.enable_fog:
        from ..ops import fog as fog_ops

        if band is not None and band.get("fogvol") is not None:
            fogvol = band["fogvol"]
        else:
            fogvol = fog_ops.build_fog_volume(
                sceneset, proj=proj, invview=invview,
                shadow=shadowmaps if (cfg.enable_shadows
                                      and cfg.shadow_mode == "esm")
                else None,
                depth_range=cfg.fog_depth_range)
        fr_, fg_, fb_, ft_ = fog_ops.fog_planes(
            depth, fogvol, proj, depth_range=cfg.fog_depth_range,
            sample_scale=cfg.fog_sample_scale, y0=y0, full_height=gh)
        gpl["fog_r"], gpl["fog_g"], gpl["fog_b"], gpl["fog_t"] = \
            fr_, fg_, fb_, ft_

    # ---- lit translucent layers: the nearest translucent surfaces get
    # the FULL deferred shade (env + SH + shadowed sun + light loops) via
    # additional raster + megakernel invocations (depth-peeled),
    # composited in the main kernel's epilogue between sky and fog
    # (reference: data/translucent.frag — clustered-forward shading);
    # fragments beyond the lit layers fall back to unlit WBOIT below
    lit_peel_full = None
    if cfg.max_translucent_draws > 0 and cfg.translucent_lit:
        from ..ops.common import TILE_H, TILE_W, round_up
        from ..ops.geometry import transform_vertices_rigid
        from ..ops.raster_pallas import raster_shade_pallas
        from ..ops.blur import resize_matmul

        # reduced-res lit layer (glass/water is smooth): its raster +
        # plane assembly + second megakernel run over a ~1/N^2-pixel
        # viewport that spans the full NDC range, and the resulting
        # composite planes upsample back via static-matrix matmuls
        # band (sharded) mode runs the lit layer at FULL band resolution
        # regardless of translucent_lit_scale: the half-res planes'
        # band-local matmul upsamples would edge-clamp at band seams.
        # PARITY NOTE: for translucent_lit_scale > 1 configs the sharded
        # frame therefore shades the lit layer at HIGHER resolution than
        # the single-device frame — bit-exact sharded parity holds only
        # for translucent_lit_scale == 1 (documented in parallel/sharded)
        s_t = cfg.translucent_lit_scale if band is None else 1
        if s_t > 1:
            h_t = round_up(gh // s_t, TILE_H)
            w_t = round_up(w // s_t, TILE_W)
            tx_, ty_ = w_t // TILE_W, h_t // TILE_H
            depth_t = resize_matmul(depth, h_t, w_t, nearest=True)
            gh_t, y0_t, tid_t = h_t, 0, None
        else:
            h_t, w_t = h, w
            tx_, ty_ = cfg.tiles_x, cfg.tiles_y
            depth_t = depth
            gh_t, y0_t, tid_t = gh, y0, tile_ids

        if geom is None:
            geom = device["geometry"]
        viewproj_t = (proj @ sceneset["view"]).astype(jnp.float32)
        td = draws["translucent"]
        tex2 = expand_draws(geom, td["mesh"], td["count"],
                            cfg.max_vertices, cfg.max_translucent_tris)
        tpos = geom["positions"][tex2["src_v"]]
        tclip, twn, twt, _ = transform_vertices_rigid(
            tpos, geom["normals"][tex2["src_v"]],
            geom["tangents"][tex2["src_v"]], tex2["vtx_draw"],
            td["world"], viewproj_t)
        tuv = geom["texcoords"][tex2["src_v"]]
        tmat = td["material"][tex2["tri_draw"]]
        tsetup = raster_ops.triangle_setup(tclip, tex2["tris"], w_t, gh_t,
                                           tx_, ty_, cull=0,
                                           tri_valid=tex2["t_valid"])
        tbins, tcounts, tbig = raster_ops.bin_triangles(
            tsetup, cfg.max_translucent_tris, tx_, ty_,
            cfg.forward_bin_capacity, cfg.forward_big_capacity)
        if tid_t is not None:          # slice this band's bin rows
            nloc = tid_t.shape[0]
            tbins = jax.lax.dynamic_slice_in_dim(tbins, tid_t[0], nloc, 0)
            tcounts = jax.lax.dynamic_slice_in_dim(tcounts, tid_t[0],
                                                   nloc, 0)

        def _dist(d):
            dn = d + proj[2, 2]
            return proj[2, 3] / jnp.where(jnp.abs(dn) < 1e-7, 1e-7, dn)

        # depth-peeled lit layers, nearest first: layer k rasters only
        # fragments strictly farther than layer k-1 (reference:
        # translucent.frag shades EVERY translucent fragment via
        # back-to-front subpasses, renderer.cpp:6596-6684; layers beyond
        # these fall back to unlit WBOIT)
        from ..ops.shade_pallas import MAX_TR_LAYERS
        n_layers = min(max(1, int(getattr(cfg, "translucent_lit_layers", 1))),
                       MAX_TR_LAYERS)
        peel = None
        for layer in range(n_layers):
            # NOTE: the height arg is the NDC viewport height the kernel
            # maps GLOBAL tile rows through — must be gh_t, not the band
            # height (output planes are still band-sized via tile_ids)
            planes_t = raster_shade_pallas(
                tsetup, tbins, tbig, tcounts, tex2["tris"], tuv, twn, tmat,
                device["materials"], tx_, ty_, w_t, gh_t, tangent=twt,
                matmaps=device["matmaps"], planes_2d=True, alpha_in_alb=True,
                interpret=cfg.pallas_interpret, tile_ids=tid_t,
                peel_depth=peel, two_phase=cfg.raster_two_phase,
                early_z=cfg.raster_early_z)
            peel = planes_t["depth"]       # next layer peels against this
            # only keep fragments nearer than the opaque surface
            visf_t = jnp.where(planes_t["depth"] > depth_t,
                               planes_t["visf"], -1.0)
            planes_t = dict(planes_t, visf=visf_t)
            gpl_t, mask_t = _assemble_gplanes(
                cfg, planes_t, device, sceneset, ibl, shadowmaps,
                w_t, h_t, y0=y0_t, full_h=gh_t,
                # band mode runs the lit layer at full res (s_t == 1),
                # so the band upsample closures apply directly
                up_to=(up_to if s_t == 1 else None),
                up_to_batch=(up_to_batch if s_t == 1 else None),
                prev_row=(prev_row if s_t == 1 else None))
            tr = shade_deferred_pallas(gpl_t, ss2, proj=proj,
                                       invview=invview, planes_out=True,
                                       interpret=cfg.pallas_interpret,
                                       y0=y0_t, full_height=gh_t)
            # depth-aware transmission (reference: data/water.frag
            # shallow fade): absorb > 0 materials blend by the water
            # column between the surface and the opaque floor
            mkt = mask_t.astype(jnp.float32)
            a_mat = jnp.clip(planes_t["alb"], 0.0, 1.0)
            absorb = planes_t["absorb"]
            column = jnp.maximum(_dist(depth_t) - _dist(planes_t["depth"]),
                                 0.0)
            a_depth = 1.0 - (1.0 - a_mat) * jnp.exp(-absorb * column)
            alpha_t = jnp.where(absorb > 0, a_depth, a_mat) * mkt
            pfx = "tr" if layer == 0 else f"tr{layer + 1}"
            if s_t > 1:
                # premultiplied-alpha upsample (then unpremultiply) so
                # the bilinear border doesn't mix unshaded black in;
                # ONE stacked matmul resample for all 4 planes
                st4 = resize_matmul(jnp.stack(
                    [tr[0] * alpha_t, tr[1] * alpha_t, tr[2] * alpha_t,
                     alpha_t], -1), h, w)
                a_up = st4[..., 3]
                un = 1.0 / jnp.maximum(a_up, 1e-4)
                (gpl[f"{pfx}_r"], gpl[f"{pfx}_g"], gpl[f"{pfx}_b"]) = (
                    st4[..., 0] * un, st4[..., 1] * un, st4[..., 2] * un)
                gpl[f"{pfx}_a"] = a_up
            else:
                gpl[f"{pfx}_r"], gpl[f"{pfx}_g"], gpl[f"{pfx}_b"] = tr
                gpl[f"{pfx}_a"] = alpha_t
            if layer == 0:
                # refraction offsets (pixels): view-space normal xy
                # scaled by surface distance; absorbing surfaces only
                v_ = sceneset["view"]
                nvx = (v_[0, 0] * gpl_t["nx"] + v_[0, 1] * gpl_t["ny"]
                       + v_[0, 2] * gpl_t["nz"])
                nvy = (v_[1, 0] * gpl_t["nx"] + v_[1, 1] * gpl_t["ny"]
                       + v_[1, 2] * gpl_t["nz"])
                refr_k = 90.0 / jnp.maximum(_dist(planes_t["depth"]), 1.0)
                on_refr = (absorb > 0) & mask_t
                tr_ox = jnp.where(on_refr, jnp.clip(nvx * refr_k,
                                                    -9.0, 9.0), 0.0)
                # vertical shifts are band-local rolls in the kernel;
                # keep within REFR_STEPS_Y's +-4 px (see shade_pallas)
                tr_oy = jnp.where(on_refr, jnp.clip(nvy * refr_k,
                                                    -4.0, 4.0), 0.0)
                if s_t > 1:
                    oxy = resize_matmul(jnp.stack([tr_ox, tr_oy], -1),
                                        h, w)
                    gpl["tr_ox"], gpl["tr_oy"] = oxy[..., 0], oxy[..., 1]
                else:
                    gpl["tr_ox"], gpl["tr_oy"] = tr_ox, tr_oy
        if n_layers >= 2:
            # fragments beyond the last lit layer accumulate as unlit
            # WBOIT (the residual raster below peels against this)
            lit_peel_full = (resize_matmul(peel, h, w, nearest=True)
                             if s_t > 1 else peel)

    if cfg.max_translucent_draws > 0 or cfg.max_particle_quads > 0:
        from ..ops.raster_pallas import raster_blend_pallas
        from .renderlist import RenderList

        viewproj = (proj @ sceneset["view"]).astype(jnp.float32)
        if geom is None:
            geom = device["geometry"]
        tx_, ty_ = cfg.tiles_x, cfg.tiles_y
        # ONE merged WBOIT stream: translucent residual triangles
        # (depth-peeled behind the lit layers) and soft particle quads
        # share one setup + binning + kernel walk — per-triangle row
        # flags select the peel test / radial falloff per entry, saving
        # a full sort + bins gather + kernel launch per frame vs the
        # two-stream formulation
        want_tr = cfg.max_translucent_draws > 0 and (
            not cfg.translucent_lit or lit_peel_full is not None)
        verts, uvs, cols, trilists, valids, softs, peels = \
            [], [], [], [], [], [], []
        vbase = 0
        if want_tr:
            # unlit WBOIT: either ALL translucent fragments (v1 path) or
            # only the residual strictly behind the lit layers (peel)
            td = draws["translucent"]
            tex2 = expand_draws(geom, td["mesh"], td["count"],
                                cfg.max_vertices, cfg.max_translucent_tris)
            tpos = geom["positions"][tex2["src_v"]]
            from ..ops.geometry import transform_vertices_rigid
            tclip, _, _, _ = transform_vertices_rigid(
                tpos, geom["normals"][tex2["src_v"]],
                geom["tangents"][tex2["src_v"]], tex2["vtx_draw"],
                td["world"], viewproj)
            tcol = device["materials"]["color"][td["material"][tex2["vtx_draw"]]]
            tuv = geom["texcoords"][tex2["src_v"]]
            nt = tex2["tris"].shape[0]
            verts.append(tclip); uvs.append(tuv); cols.append(tcol)
            trilists.append(tex2["tris"]); valids.append(tex2["t_valid"])
            softs.append(jnp.zeros((nt,), jnp.float32))
            peels.append(jnp.full((nt,), 1.0 if lit_peel_full is not None
                                  else 0.0, jnp.float32))
            vbase = tclip.shape[0]
        if cfg.max_particle_quads > 0:
            fwd = draws["forward"]
            fclip = fwd["positions"] @ viewproj[:, :3].T + viewproj[:, 3]
            ftris = jnp.asarray(RenderList.quad_triangles(
                cfg.max_particle_quads))
            nf = ftris.shape[0]
            verts.append(fclip); uvs.append(fwd["uv"]); cols.append(fwd["color"])
            trilists.append(ftris + vbase)
            valids.append(jnp.arange(nf) < fwd["quad_count"] * 2)
            softs.append(jnp.ones((nf,), jnp.float32))
            peels.append(jnp.zeros((nf,), jnp.float32))
        if not verts:
            zero = jnp.zeros((h, w), jnp.float32)
            verts = None
            acc5 = (zero, zero, zero, zero, 1.0 - zero)
        mclip = (None if verts is None else
                 jnp.concatenate(verts) if len(verts) > 1 else verts[0])
        if verts is not None:
            muv = jnp.concatenate(uvs) if len(uvs) > 1 else uvs[0]
            mcol = jnp.concatenate(cols) if len(cols) > 1 else cols[0]
            mtris = (jnp.concatenate(trilists) if len(trilists) > 1
                     else trilists[0])
            mvalid = (jnp.concatenate(valids) if len(valids) > 1
                      else valids[0])
            msoft = jnp.concatenate(softs) if len(softs) > 1 else softs[0]
            mpeel = jnp.concatenate(peels) if len(peels) > 1 else peels[0]
            nstreams = len(verts)
            msetup = raster_ops.triangle_setup(mclip, mtris, w, gh, tx_, ty_,
                                               tri_valid=mvalid)
            mbins, mcounts, mbig = raster_ops.bin_triangles(
                msetup, mtris.shape[0], tx_, ty_,
                cfg.forward_bin_capacity * nstreams,
                cfg.forward_big_capacity * nstreams)
            if tile_ids is not None:
                nloc = tile_ids.shape[0]
                mbins = jax.lax.dynamic_slice_in_dim(mbins, tile_ids[0],
                                                     nloc, 0)
                mcounts = jax.lax.dynamic_slice_in_dim(mcounts, tile_ids[0],
                                                       nloc, 0)
            acc5 = raster_blend_pallas(
                msetup, mbins, mbig, mcounts, mtris, muv, mcol, depth,
                tx_, ty_, w, gh, soft="per_tri", planes=True,
                interpret=cfg.pallas_interpret, tile_ids=tile_ids,
                peel_depth=lit_peel_full, soft_flag=msoft, peel_flag=mpeel)
        # exposure on the color accumulators only (not the weight): the
        # kernel's resolve is rgb/weight — matching resolve_oit's
        # exposed average (reference forward shaders multiply by
        # scene.exposure before blending)
        exp_ = sceneset["camera"]["exposure"]
        (gpl["oit_r"], gpl["oit_g"], gpl["oit_b"]) = \
            (acc5[0] * exp_, acc5[1] * exp_, acc5[2] * exp_)
        gpl["oit_w"], gpl["oit_rev"] = acc5[3], acc5[4]

    clusters = None
    if cfg.use_light_clusters:
        # per-tile light lists with depth-bounds culling, consumed by
        # the kernel's per-sub-tile loops (the reference's cluster
        # z-slice refinement; ops/cluster.py tile_depth_bounds).  On the
        # tile-sharded path each band bins only its own tile rows
        # (planes are global, depth bounds band-local).
        from ..ops.common import TILE_H
        from ..ops.cluster import bin_lights, tile_depth_bounds
        pl_ = sceneset["pointlights"]
        ty_local = h // TILE_H
        full_ty = gh // TILE_H
        zb = tile_depth_bounds(depth, proj)
        lists, ccounts = bin_lights(
            pl_["position"], pl_["attenuation"][:, 3], pl_["count"],
            sceneset["view"], proj, cfg.tiles_x, full_ty, w, gh,
            cfg.tile_light_capacity, tile_zrange=zb,
            tile0=(tile_ids[0] if tile_ids is not None else 0),
            n_local=(ty_local * cfg.tiles_x if band is not None else None))
        # 16-row shade bands: band b shares tile row b//2's lists
        tl = lists.reshape(ty_local, cfg.tiles_x,
                           cfg.tile_light_capacity)
        tc = ccounts.reshape(ty_local, cfg.tiles_x)
        band_lists = jnp.repeat(tl, 2, axis=0)
        band_counts = jnp.repeat(tc, 2, axis=0)
        clusters = (band_lists, band_counts)
    hdr = shade_deferred_pallas(gpl, ss2, proj=proj, invview=invview,
                                ao=ao_img, spotsf=spotsf, clusters=clusters,
                                interpret=cfg.pallas_interpret,
                                y0=y0, full_height=gh)

    gbuffer = None
    if cfg.enable_ssr:
        # minimal gbuffer for the SSR pass
        sn3 = jnp.stack([gpl["nx"], gpl["ny"], gpl["nz"]], -1)
        gbuffer = dict(
            normal=jnp.concatenate([sn3 * 0.5 + 0.5,
                                    jnp.zeros_like(depth)[..., None]], -1),
            specular=jnp.stack([gpl["sr"], gpl["sg"], gpl["sb"],
                                gpl["rgh"]], -1),
            diffuse=jnp.stack([gpl["dr"], gpl["dg"], gpl["db"],
                               gpl["em"]], -1),
            mask=mask,
        )
    return hdr, mask, gbuffer, ao_state


def _vertex_stage(cfg: FrameConfig, device, draws, sceneset):
    """Draw expansion + attribute gather + vertex modifiers + world/clip
    transform — the replicated geometry stage shared by the single-chip
    frame and the tile-sharded path (reference: the *.vert programs +
    renderer.cpp draw-stream build)."""
    geom = device["geometry"]

    # dynamic vertex slab: device-computed geometry (ocean surface)
    # overwrites its pool range each frame (reference: ocean.gen.comp
    # writing displaced vertices into the mesh vertex buffer)
    if cfg.max_dynamic_vertices > 0:
        dyn = draws["dyn"]
        md = cfg.max_dynamic_vertices
        mask = (jnp.arange(md) < dyn["count"])[:, None]
        cur_p = jax.lax.dynamic_slice(geom["positions"], (dyn["offset"], 0), (md, 3))
        cur_n = jax.lax.dynamic_slice(geom["normals"], (dyn["offset"], 0), (md, 3))
        new_p = jnp.where(mask, dyn["positions"], cur_p)
        new_n = jnp.where(mask, dyn["normals"], cur_n)
        geom = dict(geom)
        geom["positions"] = jax.lax.dynamic_update_slice(
            geom["positions"], new_p, (dyn["offset"], 0))
        geom["normals"] = jax.lax.dynamic_update_slice(
            geom["normals"], new_n, (dyn["offset"], 0))
        if "texcoords" in dyn:      # ocean water-LUT coords
            cur_t = jax.lax.dynamic_slice(
                geom["texcoords"], (dyn["offset"], 0), (md, 2))
            geom["texcoords"] = jax.lax.dynamic_update_slice(
                geom["texcoords"], jnp.where(mask, dyn["texcoords"], cur_t),
                (dyn["offset"], 0))

    if "src_v" in draws:        # host-precomputed expansion (see
        ex = dict(src_v=draws["src_v"], vtx_draw=draws["vtx_draw"],
                  v_valid=draws["v_valid"], tris=draws["tris"],
                  tri_draw=draws["tri_draw"], t_valid=draws["t_valid"])
    else:                       # expand_draws_host) or on-device fallback
        ex = expand_draws(geom, draws["mesh"], draws["count"],
                          cfg.max_vertices, cfg.max_triangles)

    if cfg.max_dynamic_vertices == 0 and "attr12" in geom:
        # ONE combined row gather (gathers have ~0.2 ms fixed cost each)
        rows12 = geom["attr12"][ex["src_v"]]
        positions = rows12[:, 0:3]
        uv = rows12[:, 3:5]
        normals = rows12[:, 5:8]
        tangents = rows12[:, 8:12]
    else:   # the dynamic-vertex slab patches the split pool arrays
        positions = geom["positions"][ex["src_v"]]
        uv = geom["texcoords"][ex["src_v"]]
        normals = geom["normals"][ex["src_v"]]
        tangents = geom["tangents"][ex["src_v"]]

    # foliage wind bend in local space (reference: foilage.geometry.vert
    # transform_detailbend + transform_bend with the wind rotated into
    # the model frame)
    if cfg.enable_foliage:
        R = draws["world"][:, :, :3]                     # (D, 3, 3)
        lw = jnp.einsum("dji,dj->di", R, draws["wind"][:, :3])
        wv = lw[ex["vtx_draw"]]                          # (V, 3)
        tv = draws["wind"][ex["vtx_draw"], 3]
        bs = draws["bendscale"][ex["vtx_draw"]]
        ds = draws["detailbendscale"][ex["vtx_draw"]]
        anch = draws["world"][ex["vtx_draw"], :, 3]

        phase = positions @ jnp.ones((3,), jnp.float32) * anch.sum(-1)
        wvs = jnp.stack([(tv + phase) * 1.975, (tv + phase) * 0.793], -1)
        waves = jnp.mod(wvs, 1.0) * 2.0 - 1.0
        waves = jnp.abs(jnp.mod(waves + 0.5, 1.0) * 2.0 - 1.0)
        waves = waves * waves * (3.0 - 2.0 * waves)
        positions = positions + wv * (waves.sum(-1)
                                      * jnp.sum(positions * ds, -1))[:, None]

        bf = jnp.sum(positions * bs, -1) + 1.0
        bf = bf * bf
        bf = bf * bf - bf
        bent = positions + wv * bf[:, None]
        ln = jnp.linalg.norm(positions, axis=-1, keepdims=True)
        bn = jnp.maximum(jnp.linalg.norm(bent, axis=-1, keepdims=True), 1e-20)
        positions = bent * (ln / bn)

    if cfg.enable_skinning:
        from ..ops.geometry import skin_vertices
        pal_of_v = draws["palette_id"][ex["vtx_draw"]]
        positions, normals, tangents = skin_vertices(
            positions, normals, tangents,
            geom["bone_idx"][ex["src_v"]], geom["bone_wt"][ex["src_v"]],
            draws["palettes"].reshape(-1, 8), pal_of_v, cfg.max_bones)

    # terrain LOD geomorph (reference: data/terrain.geometry.vert):
    # lerp toward baked coarse-grid targets by camera distance
    if cfg.enable_terrain_morph:
        from ..ops.geometry import terrain_morph
        positions, normals = terrain_morph(
            positions, normals, geom["morph6"][ex["src_v"]],
            ex["vtx_draw"], draws["world"], draws["morph_range"],
            sceneset["invview"][:3, 3])

    viewproj = (sceneset["proj"] @ sceneset["view"]).astype(jnp.float32)
    clip, wnormal, wtangent, worldp = transform_vertices_rigid(
        positions, normals, tangents, ex["vtx_draw"], draws["world"], viewproj)
    return geom, ex, uv, clip, wnormal, wtangent, worldp, viewproj


@partial(jax.jit, static_argnames=("cfg",))
def _frame(cfg: FrameConfig, device, draws, sceneset, prev=None):
    w, h = cfg.padded_width, cfg.padded_height
    tx, ty = cfg.tiles_x, cfg.tiles_y
    geom, ex, uv, clip, wnormal, wtangent, worldp, viewproj = \
        _vertex_stage(cfg, device, draws, sceneset)

    # shadow cascades (reference: renderer.cpp:6458-6473 SHADOW pass)
    shadowmaps = None
    if cfg.enable_shadows:
        from ..ops.shadow import render_shadow_cascades, build_esm
        raw = render_shadow_cascades(
            worldp, ex["tris"], sceneset["mainlight"]["shadowview"],
            res=cfg.shadow_res, bin_capacity=cfg.shadow_bin_capacity,
            big_capacity=cfg.big_capacity, use_pallas=cfg.use_pallas,
            interpret=cfg.pallas_interpret,
            far_res=(cfg.shadow_far_res if cfg.shadow_mode == "esm"
                     else None), early_z=cfg.raster_early_z)
        if cfg.shadow_mode == "esm":
            # cascade-boundary blending taps the next slice directly
            # via affine constants (shadow_factor_esm_fast affine_next)
            # — the round-4 pair-row table rebuilt a ~3.4 ms/frame
            # einsum resample and its gather traced 3x a plain row tap
            shadowmaps = build_esm(raw, sceneset["mainlight"]["shadowview"])
        else:
            shadowmaps = raw

    # raster (visibility buffer); front faces carry det<0 under the
    # Y-flipped projection + pack winding convention
    setup = raster_ops.triangle_setup(clip, ex["tris"], w, h, tx, ty,
                                      cull=-1 if cfg.backface_cull else 0,
                                      max_span=cfg.bin_max_span)
    # near-first priority: a saturated bin keeps the NEAREST triangles,
    # so overflow degrades to dropping mostly-occluded geometry instead
    # of whatever was pushed last (opaque raster is draw-order free).
    # setup["zbound"] is the same max(z/w) quantity triangle_setup
    # already derived — re-gathering clip z per corner cost ~0.8 ms.
    prio = setup["zbound"]
    bins, counts, big_ids, bin_overflow, bin_zub = raster_ops.bin_triangles(
        setup, cfg.max_triangles, tx, ty, cfg.bin_capacity, cfg.big_capacity,
        max_span=cfg.bin_max_span, return_overflow=True, depth_prio=prio,
        return_zub=True)
    fused_mip = (cfg.use_pallas and cfg.texture_filter.startswith("mip")
                 and cfg.raster_kernel != "mxu")
    ibl = device.get("ibl")
    # deferred-shade megakernel: material resolve + full lighting in ONE
    # tile-resident kernel (ops/shade_pallas.py) — requires the plane
    # raster, the quad/SH env path, and ESM shadows.  Decals blend into
    # the shade planes (apply_decals_planes) and box env probes ride the
    # quarter-res override fields, so neither forces the slow path
    use_shade_kernel = (
        cfg.use_shade_kernel
        and fused_mip
        and (ibl is None or ("sh" in ibl and "flatq" in ibl
                             and (ibl.get("envprobes") is None
                                  or "flatqs" in ibl["envprobes"])))
        and (not cfg.enable_shadows or cfg.shadow_mode == "esm"))
    ao_state = None
    if use_shade_kernel:
        from ..ops.raster_pallas import raster_shade_pallas
        tri_mat = draws.get("tri_mat")
        if tri_mat is None:
            tri_mat = draws["material"][ex["tri_draw"]]
        planes = raster_shade_pallas(
            setup, bins, big_ids, counts, ex["tris"], uv, wnormal, tri_mat,
            device["materials"], tx, ty, w, h, tangent=wtangent,
            matmaps=device["matmaps"], planes_2d=True,
            interpret=cfg.pallas_interpret,
            two_phase=cfg.raster_two_phase, early_z=cfg.raster_early_z,
            bin_zub=bin_zub)
        depth = planes["depth"]
        vis = jnp.round(planes["visf"]).astype(jnp.int32)
        hdr, mask, gbuffer, ao_state = _shade_with_kernel(
            cfg, planes, device, sceneset, draws, ibl, shadowmaps,
            worldp, ex, w, h, geom=geom, prev=prev)
    elif cfg.use_pallas and (not cfg.enable_material_maps or fused_mip):
        # fused raster + attribute/material interpolation: no per-pixel
        # attribute gathers at all (gather throughput is the TPU wall);
        # the 'mip' filters add tangent + matmap planes so the deferred
        # material tap is ONE quad-row gather for all three maps
        from ..ops.raster_pallas import raster_shade_pallas, raster_shade_mxu
        shade_fn = (raster_shade_mxu if cfg.raster_kernel == "mxu"
                    else raster_shade_pallas)
        tri_mat = draws.get("tri_mat")
        if tri_mat is None:
            tri_mat = draws["material"][ex["tri_draw"]]
        kw = {}
        if fused_mip:
            kw = dict(tangent=wtangent, matmaps=device["matmaps"])
        if shade_fn is raster_shade_pallas:
            kw["early_z"] = cfg.raster_early_z
            kw["bin_zub"] = bin_zub
        planes = shade_fn(
            setup, bins, big_ids, counts, ex["tris"], uv, wnormal, tri_mat,
            device["materials"], tx, ty, w, h,
            interpret=cfg.pallas_interpret, **kw)
        depth, vis = planes["depth"], planes["vis"]
        gbuffer = shade_ops.gbuffer_from_planes(planes, device["textures"],
                                                texture_filter=cfg.texture_filter,
                                                matmaps=device.get("matmaps"))
    else:
        if cfg.use_pallas:
            from ..ops.raster_pallas import raster_pallas
            depth, vis, l0, l1 = raster_pallas(setup, bins, big_ids, counts,
                                               tx, ty, w, h,
                                               interpret=cfg.pallas_interpret)
            lam = jnp.stack([l0, l1, 1.0 - l0 - l1], axis=-1)
        else:
            depth, vis = raster_ops.raster(setup, bins, big_ids, tx, ty, w, h)
            lam = None

        # deferred material resolve -> gbuffer; 'mip*' filters route
        # through the v2 matmap table (platform-agnostic quad-row mips)
        # so the pure-XLA/CPU path gets the same trilinear-ready
        # filtering as the Pallas fast path
        attrs = dict(uv=uv, normal=wnormal, tangent=wtangent)
        gbuffer = shade_ops.resolve_gbuffer(
            vis, setup, ex["tris"], ex["tri_draw"], attrs,
            dict(material=draws["material"]), device["materials"],
            device["textures"], w, h, material_maps=cfg.enable_material_maps,
            lam=lam,
            matmaps=(device.get("matmaps")
                     if cfg.texture_filter.startswith("mip") else None))

    # deferred lighting (XLA path; the megakernel branch above already
    # produced hdr)
    if not use_shade_kernel:
        mask = gbuffer["mask"]
        cluster = None
        if cfg.use_light_clusters:
            from ..ops.cluster import bin_lights
            pl = sceneset["pointlights"]
            lists, ccounts = bin_lights(pl["position"], pl["attenuation"][:, 3],
                                        pl["count"], sceneset["view"],
                                        sceneset["proj"], tx, ty, w, h,
                                        cfg.tile_light_capacity)
            cluster = (lists, ccounts, tx, ty)
        # deferred decals (reference: lighting.comp:136-164 decal loop)
        if cfg.max_decals_active > 0:
            from ..ops.decal import apply_decals
            from ..ops.lighting_pass import reconstruct_positions
            _, wpos = reconstruct_positions(depth, sceneset["proj"],
                                            sceneset["invview"], w, h)
            gbuffer = apply_decals(gbuffer, wpos, draws["decals"],
                                   textures=device.get("textures"))

        # ambient occlusion (reference: hbao.comp) at cfg.ssao_scale of
        # the fbo resolution (reference: ssaobuffer = fbo*ssaoscale,
        # renderer.cpp:5841; ssaoscale==0 disables, :6558)
        ssao_img = None
        if cfg.enable_ssao and cfg.ssao_scale > 0:
            from ..ops.ssao import hbao, make_hbao_params
            dec = max(int(round(1.0 / cfg.ssao_scale)), 1)
            pr = make_hbao_params()
            from ..ops.blur import downsample_pool
            dd = downsample_pool(depth, dec, reduce="first")
            nn = downsample_pool(gbuffer["normal"][..., :3], dec,
                                 reduce="first")
            ao = hbao(dd, nn, sceneset["proj"], sceneset["view"], params=pr,
                      prev_ao=None if prev is None else prev["ao"],
                      prevview=None if prev is None else prev["view"],
                      invview=sceneset["invview"])
            ao_state = ao
            from ..ops.blur import resize_up_dense
            # ssaostrength: intensity lerp toward unoccluded (our knob;
            # the reference has no AO strength dial)
            strength = sceneset["camera"].get("ssaostrength",
                                              jnp.float32(1.0))
            ssao_img = 1.0 + (resize_up_dense(ao[..., 0], h, w) - 1.0) * strength

        spotmaps = None
        if cfg.max_spot_shadows > 0:
            from ..ops.shadow import render_spot_maps
            spotmaps = render_spot_maps(
                worldp, ex["tris"], sceneset["spotlights"]["shadowview"],
                cfg.max_spot_shadows, res=cfg.spot_shadow_res,
                bin_capacity=cfg.shadow_bin_capacity,
                big_capacity=cfg.big_capacity,
                use_pallas=cfg.use_pallas,
                interpret=cfg.pallas_interpret)

        hdr = lighting_pass.shade_deferred(
            gbuffer, depth, sceneset,
            proj=sceneset["proj"], invview=sceneset["invview"],
            shadowmaps=shadowmaps, ibl=ibl, cluster=cluster, ssao=ssao_img,
            spotmaps=spotmaps, shadow_factor_scale=cfg.shadow_factor_scale,
            shadow_slice_blend=cfg.shadow_slice_blend)

    # skybox background (reference: forward pass skybox.vert/frag fills
    # uncovered pixels along the view ray)
    if ibl is not None and not use_shade_kernel:
        from ..ops.sampling import sample_cubemap, sample_cubemap_lod_flat
        from ..ops.lighting_pass import view_ray_grid, _inv_proj

        rx, ry = view_ray_grid(_inv_proj(sceneset["proj"]), w, h)
        rays = jnp.stack([rx, ry, -jnp.ones_like(rx)], -1)
        rays = rays @ sceneset["invview"][:3, :3].T
        rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
        rays = rays @ _skyrot(sceneset).T     # skybox orientation
        # skyboxlod: -1 = sharp (mip 0), >= 0 selects a blurred mip
        # (reference: RenderParams::skyboxlod)
        lod = jnp.maximum(sceneset["camera"].get("skyboxlod",
                                                 jnp.float32(-1.0)), 0.0)
        if "flatq" in ibl:
            # quarter-res sky tap (quad rows: 2 gathers/sample), dense
            # upsample — the sky field is smooth; per-pixel gathers are
            # the TPU wall (PERF.md lesson 1)
            from ..ops.blur import downsample_pool, resize_up_dense
            from ..ops.sampling import sample_cubemap_lod_quad
            rays_h = downsample_pool(rays, 4)
            sky_h = sample_cubemap_lod_quad(
                ibl["flatq"], rays_h,
                jnp.broadcast_to(lod, rays_h.shape[:-1]))[..., :3]
            sky = resize_up_dense(sky_h, h, w)
        elif "flat" in ibl:
            sky = sample_cubemap_lod_flat(
                ibl["flat"], rays, jnp.broadcast_to(lod, rays.shape[:-1])
            )[..., :3]
        else:
            sky = sample_cubemap(ibl["mips"][0], rays)[..., :3]
        exposure = sceneset["camera"]["exposure"]
        hdr = jnp.where(mask[..., None], hdr, sky * exposure)

    # volumetric fog (reference: fog.density/scatter.comp + lighting apply)
    if cfg.enable_fog and not use_shade_kernel:
        from ..ops import fog as fog_ops

        fogvol = fog_ops.build_fog_volume(
            sceneset, proj=sceneset["proj"], invview=sceneset["invview"],
            shadow=shadowmaps if (cfg.enable_shadows and cfg.shadow_mode == "esm") else None,
            depth_range=cfg.fog_depth_range)
        hdr = fog_ops.apply_fog(hdr, depth, fogvol, sceneset["proj"],
                                depth_range=cfg.fog_depth_range,
                                sample_scale=cfg.fog_sample_scale)

    # analytic half-space fog planes (reference: data/fogplane.frag)
    if cfg.max_fog_planes > 0:
        from ..ops import fog as fog_ops

        hdr = fog_ops.apply_fog_planes(
            hdr, depth, draws["fogplanes"], proj=sceneset["proj"],
            invview=sceneset["invview"],
            exposure=sceneset["camera"]["exposure"])

    # translucent meshes via weighted-blend OIT (reference:
    # renderer.cpp:6596-6684 translucent subpass; v1 shading = tinted
    # N.L-less blend, clustered forward shading on the backlog)
    if cfg.max_translucent_draws > 0 and not use_shade_kernel:
        from ..ops import blend as blend_ops

        td = draws["translucent"]
        tex = expand_draws(geom, td["mesh"], td["count"],
                           cfg.max_vertices, cfg.max_translucent_tris)
        tpos = geom["positions"][tex["src_v"]]
        tclip, _, _, _ = transform_vertices_rigid(
            tpos, geom["normals"][tex["src_v"]],
            geom["tangents"][tex["src_v"]], tex["vtx_draw"], td["world"],
            viewproj)
        tmat = td["material"][tex["vtx_draw"]]
        tcol = device["materials"]["color"][tmat]          # (V, 4)
        tuv = geom["texcoords"][tex["src_v"]]
        tsetup = raster_ops.triangle_setup(tclip, tex["tris"], w, h, tx, ty,
                                           tri_valid=tex["t_valid"])
        tbins, tcounts, tbig = raster_ops.bin_triangles(
            tsetup, cfg.max_translucent_tris, tx, ty,
            cfg.forward_bin_capacity, cfg.forward_big_capacity)
        exposure_t = sceneset["camera"]["exposure"]
        if cfg.use_pallas:
            from ..ops.raster_pallas import raster_blend_pallas
            taccum, treveal = raster_blend_pallas(
                tsetup, tbins, tbig, tcounts, tex["tris"], tuv, tcol, depth,
                tx, ty, w, h, soft=False, interpret=cfg.pallas_interpret)
        else:
            taccum, treveal = blend_ops.raster_blend(
                tsetup, tbins, tbig, tuv, tcol, tex["tris"], depth, tx, ty,
                w, h, soft=False)
        hdr = blend_ops.resolve_oit(hdr, taccum, treveal,
                                    exposure=exposure_t)

    # forward OIT: particles / translucents (reference: renderer.cpp
    # :6596-6684 weighted-blend subpasses + weightblend resolve)
    if cfg.max_particle_quads > 0 and not use_shade_kernel:
        from ..ops import blend as blend_ops

        from .renderlist import RenderList

        fwd = draws["forward"]
        fclip = fwd["positions"] @ viewproj[:, :3].T + viewproj[:, 3]
        ftris = jnp.asarray(RenderList.quad_triangles(cfg.max_particle_quads))
        tvalid = jnp.arange(ftris.shape[0]) < fwd["quad_count"] * 2
        fsetup = raster_ops.triangle_setup(fclip, ftris, w, h, tx, ty,
                                           tri_valid=tvalid)
        fbins, fcounts, fbig = raster_ops.bin_triangles(
            fsetup, ftris.shape[0], tx, ty, cfg.forward_bin_capacity,
            cfg.forward_big_capacity)
        exposure = sceneset["camera"]["exposure"]
        if cfg.use_pallas:
            from ..ops.raster_pallas import raster_blend_pallas
            accum, reveal = raster_blend_pallas(
                fsetup, fbins, fbig, fcounts, ftris, fwd["uv"], fwd["color"],
                depth, tx, ty, w, h, interpret=cfg.pallas_interpret)
        else:
            accum, reveal = blend_ops.raster_blend(
                fsetup, fbins, fbig, fwd["uv"], fwd["color"], ftris, depth,
                tx, ty, w, h)
        hdr = blend_ops.resolve_oit(hdr, accum, reveal, exposure=exposure)

    # scene luminance (log-average, reference: data/luminance.comp)
    lum_w = jnp.array([0.2126, 0.7152, 0.0722], jnp.float32)
    lum = jnp.exp(jnp.mean(jnp.log(1e-4 + hdr[:cfg.height, :cfg.width] @ lum_w)))

    # screen-space reflections (reference: ssr.comp + Hi-Z)
    ssr_img = ssr_q = None
    if cfg.enable_ssr and cfg.ssr_mode == "binned":
        # direction-binned dense march at quarter res (ops/ssr2.py):
        # every march sample is a uniform image shift — zero gathers
        from ..ops.blur import downsample_pool, resize_up_dense
        from ..ops.ssr2 import ssr_binned
        q = 4
        ssr_q = ssr_binned(
            downsample_pool(hdr, q),
            downsample_pool(depth, q, reduce="first"),
            downsample_pool(gbuffer["normal"][..., :3], q, reduce="first"),
            downsample_pool(gbuffer["specular"][..., :3], q),
            downsample_pool(gbuffer["specular"][..., 3], q, reduce="first"),
            downsample_pool(gbuffer["mask"].astype(jnp.float32), q) > 0.5,
            sceneset["proj"], sceneset["view"],
            envbrdf_lut=ibl["envbrdf"] if ibl else None)
        # scale the rgb only: the composite adds rgb*weight, so scaling
        # all 4 channels would square the strength
        s_ssr = sceneset["camera"].get("ssrstrength", jnp.float32(1.0))
        ssr_q = ssr_q.at[..., :3].multiply(s_ssr)
        if cfg.enable_depth_of_field:
            # DoF mixes BETWEEN the SSR and bloom adds (composite.frag
            # combine order) — SSR must upsample separately
            ssr_img = resize_up_dense(ssr_q, h, w)
            ssr_q = None
    elif cfg.enable_ssr:
        from ..ops.ssr import ssr as ssr_op
        from ..ops.blur import downsample_pool, resize_up_dense
        gb_h = {k: (downsample_pool(v, 2, reduce="first")
                    if hasattr(v, "ndim") else v)
                for k, v in gbuffer.items()}
        ssr_h = ssr_op(downsample_pool(hdr, 2),
                       downsample_pool(depth, 2, reduce="first"), gb_h,
                       sceneset["proj"], sceneset["view"],
                       envbrdf_lut=ibl["envbrdf"] if ibl else None)
        ssr_img = resize_up_dense(ssr_h, h, w)
        ssr_img = ssr_img.at[..., :3].multiply(
            sceneset["camera"].get("ssrstrength", jnp.float32(1.0)))

    # bloom (reference: bloom.luma + separable blurs).  With DoF off,
    # bloom and SSR are both additive (composite.frag order: +ssr,
    # +bloom) and both live at quarter res — sum them there and pay ONE
    # full-res upsample (`glow`) instead of two.
    bloom_img = glow = None
    if cfg.enable_bloom:
        from ..ops.bloom import bloom as bloom_op
        if cfg.enable_depth_of_field:
            bloom_img = bloom_op(hdr, sceneset["camera"]["bloomstrength"])
        else:
            bloom_q = bloom_op(hdr, sceneset["camera"]["bloomstrength"],
                               upsample=False)
            if ssr_q is not None:
                bloom_q = bloom_q + ssr_q[..., :3] * ssr_q[..., 3:4]
                ssr_q = None
            from ..ops.blur import resize_up_dense
            glow = resize_up_dense(bloom_q, h, w)
    if ssr_q is not None:              # SSR alone (bloom off, DoF off)
        from ..ops.blur import resize_up_dense
        glow = resize_up_dense(ssr_q[..., :3] * ssr_q[..., 3:4], h, w)

    # depth of field: half-res blur mixed by focal distance
    dof_blur = dof_amount = None
    if cfg.enable_depth_of_field:
        from ..ops.blur import downsample2, gaussian_blur
        from ..ops.blur import resize_up_dense
        blurred = resize_up_dense(gaussian_blur(downsample2(hdr), 3.0), h, w)
        dist = sceneset["proj"][2, 3] / (depth + sceneset["proj"][2, 2])
        amount = jnp.clip(jnp.abs(dist - sceneset["camera"]["focaldistance"])
                          / jnp.maximum(sceneset["camera"]["focalwidth"], 1e-3),
                          0.0, 1.0)
        dof_blur, dof_amount = blurred, amount

    grading = cfg.enable_color_grading
    lut = device.get("colorlut") if grading else None
    lut_poly = device.get("colorlut_poly") if grading else None

    rgb = composite_ops.composite(hdr, 1.0, bloom=bloom_img,
                                  bloom_strength=1.0, ssr=ssr_img,
                                  dof_blur=dof_blur, dof_amount=dof_amount,
                                  lut=lut, lut_poly=lut_poly, glow=glow)

    # device sprite/overlay pass: ordered alpha blend in display space
    # (reference: OVERLAY pass sprite pipeline, renderer.cpp:6760-6789)
    if cfg.max_overlay_sprites > 0 and "sprites" in draws:
        from ..ops.sprite_pass import composite_sprites
        rgb = composite_sprites(rgb, draws["sprites"],
                                device["overlay_atlas"],
                                region=min(cfg.overlay_region, w, h))
    image = composite_ops.to_u8_image(rgb[:cfg.height, :cfg.width])

    out = dict(image=image, luminance=lum, depth=depth, vis=vis,
               bin_overflow=bin_overflow)
    if ao_state is not None:
        # temporal AO state: feed back as `prev` next frame (reference:
        # hbao.comp:156-162 prevmap reprojection)
        out["ao_prev"] = dict(ao=ao_state, view=sceneset["view"])
    return out


def render_frame(cfg: FrameConfig, device, draws, sceneset, prev=None):
    """prev: the previous frame's out["ao_prev"] (or None on the first
    frame) — enables temporal AO reprojection."""
    return _frame(cfg, device, draws, sceneset, prev=prev)
