"""Tile-sharded frame: shard_map over framebuffer tile-rows.

Work split (reference analogue: the full per-frame dispatch list
renderer.cpp:6423-6853, distributed over devices):

- REPLICATED (scene-space, tiny vs pixel work): draw expansion, vertex
  transform, triangle setup + binning, shadow cascades + ESM, spot
  maps, the fog froxel volume.
- SHARDED by tile-rows: the fused Pallas visibility raster, plane
  assembly (materials/env/decals), the deferred-shade megakernel with
  its sky/fog/OIT/translucent epilogue, spot/sun factor planes, OIT
  rasters, composite.
- CROSS-BAND passes (SSAO / SSR / bloom / DoF) consume REDUCED-RES
  fields: each shard downsamples its band, all-gathers the low-res
  field over ICI, computes the pass on the full low-res image and
  slices its own band back out.  This is exact (bit-identical math to
  the single-device frame) at any band size; halo exchange (ppermute)
  is the scalable refinement once bands are tall enough.
- Luminance reduces with a psum; the image returns row-sharded.

The legacy reduced path (XLA raster + basic deferred) remains for
configs without the Pallas fast path.

PARITY EXCEPTION: configs with translucent_lit_scale > 1 shade the lit
translucent layer at full band resolution here (frame.py forces
s_t = 1 in band mode — the half-res planes' band-local upsamples would
edge-clamp at band seams), so the sharded image is bit-exact vs the
single-device frame ONLY for translucent_lit_scale == 1; at scale > 1
it differs by shading the lit layer at higher resolution.

Round-4 parity closures: band-local upsamples of reduced-res fields
(sun/spot factors, env/probe fields, the 15-plane material upsample)
ride all-gather-upsample-slice closures instead of clamping at band
edges; the matmap mip-LOD backward difference receives the neighbor
band's last uv row via ppermute; the device sprite pass composites on
the gathered display rgb (bit-identical); temporal AO history threads
through `prev=` exactly like frame.render_frame (the state is computed
from gathered fields, so it is device-identical and returns
replicated).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops import raster as raster_ops
from ..ops import shade as shade_ops
from ..ops import lighting_pass
from ..ops import composite as composite_ops
from ..ops.common import TILE_H, FrameConfig
from ..render.frame import (expand_draws, _vertex_stage, _shade_with_kernel)
from ..ops.geometry import transform_vertices_rigid


# ---- ICI traffic ledger (trace-time): every collective in the shard
# body records its per-device receive bytes here when the jit traces.
# Sizing note (SURVEY §5.8): the all-gather-reduced-res design trades
# bandwidth for exactness — each cross-band pass gathers a quarter/
# half-res field, so per-device ICI traffic scales with the REDUCED
# image area times (n_dev - 1)/n_dev, independent of band height.  At
# 1080p/8 devices the dominant terms are the sprite-pass full-res rgb
# gather (~12 MB) and the SSAO/SSR quarter-res fields (~1 MB each);
# v5e ICI is ~400 GB/s/link, so the whole ledger is well under 0.1 ms.
# A ppermute halo exchange (band_h-independent, a few rows) is the
# scalable refinement once bands are tall enough to contain the blur/
# SSR neighborhoods.  Run `ici_report()` after a traced frame — the
# driver dryrun prints it.
_ICI_LEDGER = []


def _ag(x, axis, *, gather_axis, n_dev, label, tiled=True):
    """all_gather + ledger: per-device receive = (n_dev-1) local shards."""
    _ICI_LEDGER.append((label, x.size * x.dtype.itemsize * (n_dev - 1)))
    return jax.lax.all_gather(x, axis, axis=gather_axis, tiled=tiled)


def _pp(x, axis, perm, label):
    _ICI_LEDGER.append((label, x.size * x.dtype.itemsize))
    return jax.lax.ppermute(x, axis, perm)


def ici_report(reset=False):
    """Aggregate the trace-time ledger: {label: bytes/frame/device}."""
    agg = {}
    for label, b in _ICI_LEDGER:
        agg[label] = agg.get(label, 0) + b
    agg["TOTAL"] = sum(b for _, b in _ICI_LEDGER)
    if reset:
        _ICI_LEDGER.clear()
    return agg


def render_frame_sharded(cfg: FrameConfig, mesh, device, draws, sceneset,
                         prev=None):
    """Returns dict(image (H, W, 3) u8 sharded over rows, luminance,
    bin_overflow[, ao_prev]).

    prev: the previous frame's out["ao_prev"] (temporal AO history,
    replicated) — same contract as frame.render_frame."""
    n_dev = mesh.devices.size
    if cfg.tiles_y % n_dev != 0:
        raise ValueError(f"tiles_y={cfg.tiles_y} must divide over {n_dev} devices")
    # same fast-path eligibility gates as the single-device frame
    # (frame.py use_shade_kernel): mip filter + non-mxu kernel + ESM-only
    # shadows + quad/SH env tables — otherwise the reduced path, so the
    # two backends never silently diverge on ineligible configs
    ibl = device.get("ibl")
    fused_mip = (cfg.use_pallas and cfg.texture_filter.startswith("mip")
                 and cfg.raster_kernel != "mxu")
    full_ok = (
        cfg.use_shade_kernel and fused_mip
        and (ibl is None or ("sh" in ibl and "flatq" in ibl
                             and (ibl.get("envprobes") is None
                                  or "flatqs" in ibl["envprobes"])))
        and (not cfg.enable_shadows or cfg.shadow_mode == "esm"))
    if full_ok:
        return _render_sharded_full(cfg, mesh, device, draws, sceneset,
                                    prev=prev)
    return _render_sharded_reduced(cfg, mesh, device, draws, sceneset)


def _band_luminance(hdr, y0, cfg, axis):
    """Log-average luminance over the visible (uncropped) pixels of a
    row band, psum-reduced over the mesh — matches frame.py's
    single-device reduce."""
    rows_ok = (y0 + jnp.arange(hdr.shape[0]) < cfg.height)[:, None]
    cols_ok = (jnp.arange(hdr.shape[1]) < cfg.width)[None, :]
    ok = (rows_ok & cols_ok).astype(jnp.float32)
    lum_w = jnp.array([0.2126, 0.7152, 0.0722], jnp.float32)
    loglum = jnp.sum(jnp.log(1e-4 + hdr @ lum_w) * ok)
    loglum = jax.lax.psum(loglum, axis)
    return jnp.exp(loglum / (cfg.height * cfg.width))


def _render_sharded_full(cfg: FrameConfig, mesh, device, draws, sceneset,
                         prev=None):
    """The FULL fast path (Pallas raster + shade megakernel + SSAO/fog/
    SSR/OIT/spot shadows/decals/translucents) over tile-row shards."""
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]
    tx, ty = cfg.tiles_x, cfg.tiles_y
    w, h = cfg.padded_width, cfg.padded_height
    tiles_per_dev = (ty // n_dev) * tx
    band_h = (ty // n_dev) * TILE_H

    @jax.jit
    def frame(device, draws, sceneset, prev):
        # geom carries the dynamic-vertex (ocean) patch — it must flow
        # into the shard body, NOT be re-read from the device pool
        geom, ex, uv, clip, wnormal, wtangent, worldp, _ = \
            _vertex_stage(cfg, device, draws, sceneset)

        # ---- replicated light-space passes
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
            # blend taps the next slice via affine constants (no pair
            # table — see frame.py's matching note)
            shadowmaps = (build_esm(raw, sceneset["mainlight"]["shadowview"])
                          if cfg.shadow_mode == "esm" else raw)

        spotmaps = None
        if cfg.max_spot_shadows > 0:
            sl_ = sceneset["spotlights"]
            if cfg.spot_shadow_mode == "parabolic":
                from ..ops.shadow import render_spot_maps_parabolic
                spotmaps = render_spot_maps_parabolic(
                    worldp, ex["tris"], sl_["view"],
                    sl_["attenuation"][:, 3],
                    cfg.max_spot_shadows, res=cfg.spot_shadow_res,
                    bin_capacity=cfg.shadow_bin_capacity,
                    big_capacity=cfg.big_capacity,
                    interpret=cfg.pallas_interpret,
                    early_z=cfg.raster_early_z)
            else:
                from ..ops.shadow import render_spot_maps
                spotmaps = render_spot_maps(
                    worldp, ex["tris"], sl_["shadowview"],
                    cfg.max_spot_shadows, res=cfg.spot_shadow_res,
                    bin_capacity=cfg.shadow_bin_capacity,
                    big_capacity=cfg.big_capacity, use_pallas=True,
                    interpret=cfg.pallas_interpret,
                    early_z=cfg.raster_early_z)

        fogvol = None
        if cfg.enable_fog:
            from ..ops import fog as fog_ops
            fogvol = fog_ops.build_fog_volume(
                sceneset, proj=sceneset["proj"], invview=sceneset["invview"],
                shadow=shadowmaps if (cfg.enable_shadows
                                      and cfg.shadow_mode == "esm")
                else None,
                depth_range=cfg.fog_depth_range)

        # ---- main raster setup + binning (replicated; bins shard)
        setup = raster_ops.triangle_setup(
            clip, ex["tris"], w, h, tx, ty,
            cull=-1 if cfg.backface_cull else 0, max_span=cfg.bin_max_span)
        prio = setup["zbound"]
        bins, counts, big_ids, overflow = raster_ops.bin_triangles(
            setup, cfg.max_triangles, tx, ty, cfg.bin_capacity,
            cfg.big_capacity, max_span=cfg.bin_max_span,
            return_overflow=True, depth_prio=prio)
        tri_mat = draws.get("tri_mat")
        if tri_mat is None:
            tri_mat = draws["material"][ex["tri_draw"]]

        def shard_body(bins_s, counts_s, device, draws, sceneset,
                       setup, big_ids, aux, shadowmaps, spotmaps, fogvol,
                       prev):
            from ..ops.raster_pallas import raster_shade_pallas
            from ..ops.blur import downsample_pool, resize_up_dense
            from ..ops import brdf

            dev = jax.lax.axis_index(axis)
            tile0 = dev * tiles_per_dev
            tile_ids = tile0 + jnp.arange(tiles_per_dev, dtype=jnp.int32)
            y0 = (tile0 // tx) * TILE_H
            proj, invview = sceneset["proj"], sceneset["invview"]
            ibl = device.get("ibl")

            planes = raster_shade_pallas(
                setup, bins_s, big_ids, counts_s, aux["tris"], aux["uv"],
                aux["wnormal"], aux["tri_mat"], device["materials"],
                tx, ty, w, h, tangent=aux["wtangent"],
                matmaps=device["matmaps"], planes_2d=True,
                interpret=cfg.pallas_interpret, tile_ids=tile_ids,
                two_phase=cfg.raster_two_phase,
                early_z=cfg.raster_early_z)
            depth = planes["depth"]                       # (band_h, w)

            # reduced-res field upsamplers: all-gather the band-local
            # field, upsample GLOBALLY, slice the band back out — a
            # band-local upsample edge-clamps at band boundaries and
            # diverges from the single-device frame (the round-3
            # multi-chip parity gap, 4.2e-3 RMSE).  Fields are tiny
            # (quarter/half res), so the gathers ride ICI cheaply.
            def _up_to(x, oh, ow):
                scale = oh / band_h
                goh = int(round(h * scale))
                full = _ag(x, axis, gather_axis=0, n_dev=n_dev,
                           label='up_to')
                up = resize_up_dense(full, goh, ow)
                row0 = (y0 * oh) // band_h
                return jax.lax.dynamic_slice_in_dim(up, row0, oh, 0)

            def _up_to_batch(x3, oh, ow):       # (C, hh, ww) channel-first
                from ..ops.blur import resize_up_dense_batch
                scale = oh / band_h
                goh = int(round(h * scale))
                full = _ag(x3, axis, gather_axis=1, n_dev=n_dev,
                           label='up_to_batch')
                up = resize_up_dense_batch(full, goh, ow)
                row0 = (y0 * oh) // band_h
                return jax.lax.dynamic_slice_in_dim(up, row0, oh, 1)

            def _prev_row(x):
                # the row PRECEDING this band's row 0 of a band-local
                # field: the neighbor band's last row via ppermute
                # (device 0 clamps to its own first row, matching the
                # single-device image-edge clamp)
                last = x[-1:]
                fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
                from_above = _pp(last, axis, fwd, 'prev_row')
                first_dev = (dev == 0)
                return jnp.where(first_dev, x[:1], from_above)

            # SSAO: reduced-res field all-gathered so horizon taps cross
            # band boundaries exactly like the single-device pass
            band = dict(y0=y0, full_h=h, tile_ids=tile_ids,
                        fogvol=fogvol, spotmaps=spotmaps,
                        up_to=_up_to, up_to_batch=_up_to_batch,
                        prev_row=_prev_row)
            ao_state = None
            if cfg.enable_ssao and cfg.ssao_scale > 0:
                from ..ops.ssao import hbao, make_hbao_params
                dec = max(int(round(1.0 / cfg.ssao_scale)), 1)
                if band_h % dec:
                    raise ValueError(
                        f"ssao_scale {cfg.ssao_scale}: decimation {dec} "
                        f"must divide the band height {band_h} — the "
                        "per-band downsample would tear the gathered "
                        "field at band edges")
                dd_l = downsample_pool(depth, dec, reduce="first")
                nn_l = jnp.stack(
                    [downsample_pool(planes["nx"], dec, reduce="first"),
                     downsample_pool(planes["ny"], dec, reduce="first"),
                     downsample_pool(planes["nz"], dec, reduce="first")],
                    -1)
                dd = _ag(dd_l, axis, gather_axis=0, n_dev=n_dev,
                         label='ssao')
                nn = _ag(nn_l, axis, gather_axis=0, n_dev=n_dev,
                         label='ssao')
                nn = brdf.normalize(nn) * 0.5 + 0.5
                # temporal reprojection (prev replicated): the gathered
                # low-res field is global, so the history threading is
                # bit-identical to the single-device pass
                ao_full = hbao(dd, nn, proj, sceneset["view"],
                               params=make_hbao_params(),
                               prev_ao=None if prev is None else prev["ao"],
                               prevview=(None if prev is None
                                         else prev["view"]),
                               invview=invview)
                ao_state = ao_full
                strength = sceneset["camera"].get("ssaostrength",
                                                  jnp.float32(1.0))
                # upsample at FULL res, then slice the band: bit-exact
                # vs the single-device pass (band-local upsample would
                # clamp at band edges)
                ao_up = 1.0 + (resize_up_dense(ao_full[..., 0], h, w)
                               - 1.0) * strength
                band["ao"] = jax.lax.dynamic_slice_in_dim(
                    ao_up, y0, band_h, 0)

            hdr, mask, gbuffer, _ = _shade_with_kernel(
                cfg, planes, device, sceneset, draws, ibl, shadowmaps,
                aux["worldp"], dict(tris=aux["tris"]), w, band_h,
                geom=aux["geom"], band=band)

            # luminance over visible pixels (psum across shards)
            lum = _band_luminance(hdr, y0, cfg, axis)

            # SSR from all-gathered quarter-res fields (exact)
            ssr_img = ssr_q = None
            if cfg.enable_ssr and cfg.ssr_mode == "binned":
                from ..ops.ssr2 import ssr_binned
                q = 4
                gather = lambda x: _ag(x, axis, gather_axis=0,
                                       n_dev=n_dev, label='ssr')
                ssr_q = ssr_binned(
                    gather(downsample_pool(hdr, q)),
                    gather(downsample_pool(depth, q, reduce="first")),
                    gather(downsample_pool(gbuffer["normal"][..., :3], q,
                                           reduce="first")),
                    gather(downsample_pool(gbuffer["specular"][..., :3], q)),
                    gather(downsample_pool(gbuffer["specular"][..., 3], q,
                                           reduce="first")),
                    gather(downsample_pool(
                        gbuffer["mask"].astype(jnp.float32), q)) > 0.5,
                    proj, sceneset["view"],
                    envbrdf_lut=ibl["envbrdf"] if ibl else None)
                # rgb only — composite adds rgb*weight (see frame.py)
                s_ssr = sceneset["camera"].get("ssrstrength",
                                               jnp.float32(1.0))
                ssr_q = ssr_q.at[..., :3].multiply(s_ssr)
                if cfg.enable_depth_of_field:
                    # DoF mixes between the SSR and bloom adds — SSR
                    # upsamples separately (matches frame.py)
                    ssr_up = resize_up_dense(ssr_q, h, w)
                    ssr_img = jax.lax.dynamic_slice_in_dim(
                        ssr_up, y0, band_h, 0)
                    ssr_q = None
            elif cfg.enable_ssr:
                # dda fallback at half res from all-gathered fields
                # (matches frame.py's elif branch)
                from ..ops.ssr import ssr as ssr_op
                gather = lambda x: _ag(x, axis, gather_axis=0,
                                       n_dev=n_dev, label='ssr')
                gb_h = {k: (gather(downsample_pool(v, 2, reduce="first"))
                            if hasattr(v, "ndim") else v)
                        for k, v in gbuffer.items()}
                ssr_h = ssr_op(gather(downsample_pool(hdr, 2)),
                               gather(downsample_pool(depth, 2,
                                                      reduce="first")),
                               gb_h, proj, sceneset["view"],
                               envbrdf_lut=ibl["envbrdf"] if ibl else None)
                ssr_up = resize_up_dense(ssr_h, h, w)
                ssr_up = ssr_up.at[..., :3].multiply(
                    sceneset["camera"].get("ssrstrength", jnp.float32(1.0)))
                ssr_img = jax.lax.dynamic_slice_in_dim(ssr_up, y0, band_h, 0)

            # bloom from the all-gathered quarter-res image (exact);
            # with DoF off, SSR folds in at quarter res and the two
            # share ONE full-res upsample (`glow`, matches frame.py)
            bloom_img = glow = None
            if cfg.enable_bloom:
                from ..ops.bloom import bloom as bloom_op
                from ..ops.blur import downsample2
                hdr_full = _ag(downsample2(downsample2(hdr)), axis,
                               gather_axis=0, n_dev=n_dev, label='bloom')
                bq = bloom_op(hdr_full, sceneset["camera"]["bloomstrength"],
                              pre_downsampled=True,
                              upsample=cfg.enable_depth_of_field)
                if cfg.enable_depth_of_field:      # bq at full res (h, w)
                    bloom_img = jax.lax.dynamic_slice_in_dim(
                        bq, y0, band_h, 0)
                else:                              # bq at quarter res
                    if ssr_q is not None:
                        bq = bq + ssr_q[..., :3] * ssr_q[..., 3:4]
                        ssr_q = None
                    glow = jax.lax.dynamic_slice_in_dim(
                        resize_up_dense(bq, h, w), y0, band_h, 0)
            if ssr_q is not None:          # SSR alone (bloom off, DoF off)
                glow = jax.lax.dynamic_slice_in_dim(
                    resize_up_dense(ssr_q[..., :3] * ssr_q[..., 3:4], h, w),
                    y0, band_h, 0)

            dof_blur = dof_amount = None
            if cfg.enable_depth_of_field:
                from ..ops.blur import downsample2, gaussian_blur
                hq = _ag(downsample2(hdr), axis, gather_axis=0,
                         n_dev=n_dev, label='dof')
                blurred = resize_up_dense(gaussian_blur(hq, 3.0), h, w)
                dof_blur = jax.lax.dynamic_slice_in_dim(
                    blurred, y0, band_h, 0)
                dist = proj[2, 3] / (depth + proj[2, 2])
                dof_amount = jnp.clip(
                    jnp.abs(dist - sceneset["camera"]["focaldistance"])
                    / jnp.maximum(sceneset["camera"]["focalwidth"], 1e-3),
                    0.0, 1.0)

            grading = cfg.enable_color_grading
            lut = device.get("colorlut") if grading else None
            lut_poly = device.get("colorlut_poly") if grading else None
            rgb = composite_ops.composite(hdr, 1.0, bloom=bloom_img,
                                          bloom_strength=1.0, ssr=ssr_img,
                                          dof_blur=dof_blur,
                                          dof_amount=dof_amount, lut=lut,
                                          lut_poly=lut_poly, glow=glow)
            # device sprite/overlay pass: display-space regions straddle
            # band edges, so gather the full display rgb, composite
            # (bit-identical to the single-device frame), slice the band
            # back out.  One full-res gather, only when sprites exist.
            if cfg.max_overlay_sprites > 0 and "sprites" in draws:
                from ..ops.sprite_pass import composite_sprites
                rgb_full = _ag(rgb, axis, gather_axis=0, n_dev=n_dev,
                               label='sprites_rgb')
                rgb_full = composite_sprites(
                    rgb_full, draws["sprites"], device["overlay_atlas"],
                    region=min(cfg.overlay_region, w, h))
                rgb = jax.lax.dynamic_slice_in_dim(rgb_full, y0, band_h, 0)
            image = composite_ops.to_u8_image(rgb)
            # ao_state is computed from all-gathered fields: identical
            # on every device, returned replicated (P()) for the next
            # frame's temporal history
            if ao_state is None:
                return image, lum[None]
            return image, lum[None], ao_state

        aux = dict(tris=ex["tris"], uv=uv, wnormal=wnormal,
                   wtangent=wtangent, worldp=worldp, tri_mat=tri_mat,
                   geom=geom)
        if shadowmaps is None:
            shadowmaps = jnp.zeros((1, 1, 1), jnp.float32)
        if spotmaps is None:
            spotmaps = jnp.zeros((1, 1, 1), jnp.float32)
        if fogvol is None:
            fogvol = jnp.zeros((1, 1, 1, 1), jnp.float32)
        with_ao = bool(cfg.enable_ssao and cfg.ssao_scale > 0)
        sharded = shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P(), P(), P(), P(),
                      P(), P(), P(), P(), P()),
            # ao_state (if any) is device-identical -> replicated spec
            out_specs=((P(axis), P(axis), P()) if with_ao
                       else (P(axis), P(axis))),
            check_vma=False,     # pallas_call outputs carry no vma info
        )
        outs = sharded(bins, counts, device, draws, sceneset,
                       setup, big_ids, aux, shadowmaps, spotmaps,
                       fogvol, prev)
        image, lum = outs[0], outs[1]
        out = dict(image=image[:cfg.height, :cfg.width], luminance=lum[0],
                   bin_overflow=overflow)
        if with_ao:
            # temporal AO history for the next frame (same contract as
            # frame.render_frame's out["ao_prev"])
            out["ao_prev"] = dict(ao=outs[2], view=sceneset["view"])
        return out

    return frame(device, draws, sceneset, prev)


def _render_sharded_reduced(cfg: FrameConfig, mesh, device, draws, sceneset):
    """Legacy reduced path: XLA raster + basic deferred + bloom with
    ppermute halo exchange (configs without the Pallas fast path)."""
    n_dev = mesh.devices.size
    axis = mesh.axis_names[0]

    @partial(jax.jit, static_argnames=())
    def frame(device, draws, sceneset):
        geom = device["geometry"]
        w, h = cfg.padded_width, cfg.padded_height
        tx, ty = cfg.tiles_x, cfg.tiles_y

        # replicated geometry stage
        ex = expand_draws(geom, draws["mesh"], draws["count"],
                          cfg.max_vertices, cfg.max_triangles)
        positions = geom["positions"][ex["src_v"]]
        uv = geom["texcoords"][ex["src_v"]]
        normals = geom["normals"][ex["src_v"]]
        tangents = geom["tangents"][ex["src_v"]]
        viewproj = (sceneset["proj"] @ sceneset["view"]).astype(jnp.float32)
        clip, wnormal, wtangent, worldp = transform_vertices_rigid(
            positions, normals, tangents, ex["vtx_draw"], draws["world"], viewproj)
        shadowmaps = None
        if cfg.enable_shadows:
            from ..ops.shadow import render_shadow_cascades, build_esm
            raw = render_shadow_cascades(
                worldp, ex["tris"], sceneset["mainlight"]["shadowview"],
                res=cfg.shadow_res, bin_capacity=cfg.shadow_bin_capacity,
                big_capacity=cfg.big_capacity)
            shadowmaps = (build_esm(raw, sceneset["mainlight"]["shadowview"])
                          if cfg.shadow_mode == "esm" else raw)
        setup = raster_ops.triangle_setup(clip, ex["tris"], w, h, tx, ty,
                                          cull=-1 if cfg.backface_cull else 0)
        bins, counts, big_ids, overflow = raster_ops.bin_triangles(
            setup, cfg.max_triangles, tx, ty, cfg.bin_capacity,
            cfg.big_capacity, return_overflow=True)

        attrs = dict(uv=uv, normal=wnormal, tangent=wtangent)

        def shard_body(bins_shard, setup, big_ids, attrs, aux, materials,
                       textures, sceneset, shadowmaps, luts):
            # which band of tile-rows does this device own?
            dev = jax.lax.axis_index(axis)
            tiles_per_dev = (ty // n_dev) * tx
            tile0 = dev * tiles_per_dev
            tile_ids = tile0 + jnp.arange(tiles_per_dev, dtype=jnp.int32)
            y0 = (tile0 // tx) * TILE_H

            depth, vis = raster_ops.raster(setup, bins_shard, big_ids, tx, ty,
                                           w, h, tile_ids=tile_ids)
            gbuffer = shade_ops.resolve_gbuffer(
                vis, setup, aux["tris"], aux["tri_draw"], attrs,
                dict(material=aux["material"]), materials,
                textures, w, h, y0=y0,
                material_maps=cfg.enable_material_maps)
            def up_to(x, oh, ow):
                # all-gather-upsample-slice: the reduced-res factor/env
                # fields upsample GLOBALLY and the band slices itself
                # back out — a band-local upsample edge-clamps at band
                # boundaries, and the composed upsample matrix has
                # multi-row support so the clamp reached well into each
                # band (max u8 diff 5, 38% of shadowed pixels off by
                # 2-3 vs the single-device frame before this closure)
                from ..ops.blur import resize_up_dense
                full = _ag(x, axis, gather_axis=0, n_dev=n_dev,
                           label="reduced_up")
                up = resize_up_dense(full, n_dev * oh, ow)
                return jax.lax.dynamic_slice_in_dim(up, dev * oh, oh, 0)

            hdr = lighting_pass.shade_deferred(
                gbuffer, depth, sceneset, proj=sceneset["proj"],
                invview=sceneset["invview"],
                shadowmaps=shadowmaps if cfg.enable_shadows else None,
                full_size=(h, w), y0=y0, up_to=up_to)

            # log-average luminance over the *visible* (uncropped) pixels
            lum = _band_luminance(hdr, y0, cfg, axis)

            # bloom on shards: the blur kernel reaches across band edges,
            # so shards exchange halo rows over ICI with ppermute before
            # blurring (reference chain: bloom.luma + h/vblur at reduced
            # res — here quarter res, halo = blur reach in quarter rows)
            bloom_img = None
            if cfg.enable_bloom:
                from ..ops.blur import downsample2, gaussian_blur, resize_up_dense
                from ..ops.bloom import SIGMA, bloom_seed

                seeded = bloom_seed(downsample2(downsample2(hdr)))

                halo = min(16, seeded.shape[0])
                fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
                bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
                from_above = _pp(seeded[-halo:], axis, fwd, 'halo')
                from_below = _pp(seeded[:halo], axis, bwd, 'halo')
                # zero the wrap-around halos at the frame edges
                first = (dev == 0).astype(jnp.float32)
                last = (dev == n_dev - 1).astype(jnp.float32)
                ext = jnp.concatenate([from_above * (1 - first),
                                       seeded,
                                       from_below * (1 - last)], axis=0)
                blurred = gaussian_blur(ext, SIGMA * 0.5)
                # upsample WITH the halo rows still attached, then slice
                # the band: a band-local upsample would edge-clamp at the
                # boundary and seam the bloom the halo exchange prevents
                up = resize_up_dense(blurred, 4 * blurred.shape[0],
                                     hdr.shape[1])
                bloom_img = up[4 * halo:4 * halo + hdr.shape[0]]
                bloom_img = bloom_img * sceneset["camera"]["bloomstrength"]

            # color grading must match the single-device composite
            # (its omission showed as a uniform few-count u8 shift on
            # every covered pixel vs frame.render_frame)
            rgb = composite_ops.composite(hdr, 1.0, bloom=bloom_img,
                                          bloom_strength=1.0,
                                          lut=luts.get("lut"),
                                          lut_poly=luts.get("lut_poly"))
            image = composite_ops.to_u8_image(rgb)
            return image, lum[None]

        aux = dict(tris=ex["tris"], tri_draw=ex["tri_draw"],
                   material=draws["material"])
        if shadowmaps is None:
            shadowmaps = jnp.zeros((1, 1, 1), jnp.float32)
        luts = {}
        if cfg.enable_color_grading:
            if device.get("colorlut") is not None:
                luts["lut"] = device["colorlut"]
            if device.get("colorlut_poly") is not None:
                luts["lut_poly"] = device["colorlut_poly"]
        sharded = shard_map(
            shard_body, mesh=mesh,
            in_specs=(P(axis), P(), P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P(axis), P(axis)),
        )
        image, lum = sharded(bins, setup, big_ids, attrs, aux,
                             device["materials"], device["textures"], sceneset,
                             shadowmaps, luts)
        return dict(image=image[:cfg.height, :cfg.width], luminance=lum[0],
                    bin_overflow=overflow)

    return frame(device, draws, sceneset)
