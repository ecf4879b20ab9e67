"""Tile-sharded frame: shard_map over framebuffer tile-rows.

Work split: geometry (draw expansion, vertex transform, setup, binning)
is replicated — it is tiny relative to pixel work; raster + material
resolve + lighting run per-shard on each device's band of tile rows.
Scene luminance reduces with a psum over the mesh; the final image is
returned sharded by rows (callers all-gather only if a full host image
is needed).
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
from ..render.frame import expand_draws
from ..ops.geometry import transform_vertices_rigid


def render_frame_sharded(cfg: FrameConfig, mesh, device, draws, sceneset):
    """Returns dict(image (H, W, 3) u8 sharded over rows, luminance)."""
    n_dev = mesh.devices.size
    if cfg.tiles_y % n_dev != 0:
        raise ValueError(f"tiles_y={cfg.tiles_y} must divide over {n_dev} devices")

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
        bins, counts, big_ids = raster_ops.bin_triangles(
            setup, cfg.max_triangles, tx, ty, cfg.bin_capacity, cfg.big_capacity)

        attrs = dict(uv=uv, normal=wnormal, tangent=wtangent)

        def shard_body(bins_shard, setup, big_ids, attrs, aux, materials,
                       textures, sceneset, shadowmaps):
            # which band of tile-rows does this device own?
            dev = jax.lax.axis_index("tiles")
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
            hdr = lighting_pass.shade_deferred(
                gbuffer, depth, sceneset, proj=sceneset["proj"],
                invview=sceneset["invview"],
                shadowmaps=shadowmaps if cfg.enable_shadows else None,
                full_size=(h, w), y0=y0)

            # log-average luminance over the *visible* (uncropped) pixels
            lh = hdr.shape[0]
            rows_ok = (y0 + jnp.arange(lh) < cfg.height)[:, None]
            cols_ok = (jnp.arange(hdr.shape[1]) < cfg.width)[None, :]
            ok = (rows_ok & cols_ok).astype(jnp.float32)
            lum_w = jnp.array([0.2126, 0.7152, 0.0722], jnp.float32)
            loglum = jnp.sum(jnp.log(1e-4 + hdr @ lum_w) * ok)
            loglum = jax.lax.psum(loglum, "tiles")
            lum = jnp.exp(loglum / (cfg.height * cfg.width))

            # bloom on shards: the blur kernel reaches across band edges,
            # so shards exchange halo rows over ICI with ppermute before
            # blurring (reference chain: bloom.luma + h/vblur at reduced
            # res — here quarter res, halo = blur reach in quarter rows)
            bloom_img = None
            if cfg.enable_bloom:
                from ..ops.blur import downsample2, gaussian_blur, resize_up_dense
                from ..ops.bloom import CUTOFF, SIGMA
                from ..ops.composite import tonemap

                quarter = downsample2(downsample2(hdr))
                luma = quarter @ jnp.array([0.299, 0.587, 0.114], jnp.float32)
                t = jnp.clip(luma - CUTOFF, 0.0, 1.0)
                t = t * t * (3.0 - 2.0 * t)
                seeded = tonemap(quarter * t[..., None])

                halo = min(16, seeded.shape[0])
                fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
                bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]
                from_above = jax.lax.ppermute(seeded[-halo:], "tiles", fwd)
                from_below = jax.lax.ppermute(seeded[:halo], "tiles", bwd)
                # zero the wrap-around halos at the frame edges
                first = (dev == 0).astype(jnp.float32)
                last = (dev == n_dev - 1).astype(jnp.float32)
                ext = jnp.concatenate([from_above * (1 - first),
                                       seeded,
                                       from_below * (1 - last)], axis=0)
                blurred = gaussian_blur(ext, SIGMA * 0.5)[halo:-halo]
                bloom_img = resize_up_dense(blurred, hdr.shape[0], hdr.shape[1])
                bloom_img = bloom_img * sceneset["camera"]["bloomstrength"]

            rgb = composite_ops.composite(hdr, 1.0, bloom=bloom_img,
                                          bloom_strength=1.0)
            image = composite_ops.to_u8_image(rgb)
            return image, lum[None]

        aux = dict(tris=ex["tris"], tri_draw=ex["tri_draw"],
                   material=draws["material"])
        if shadowmaps is None:
            shadowmaps = jnp.zeros((1, 1, 1), jnp.float32)
        sharded = shard_map(
            shard_body, mesh=mesh,
            in_specs=(P("tiles"), P(), P(), P(), P(), P(), P(), P(), P()),
            out_specs=(P("tiles"), P("tiles")),
        )
        image, lum = sharded(bins, setup, big_ids, attrs, aux,
                             device["materials"], device["textures"], sceneset,
                             shadowmaps)
        return dict(image=image[:cfg.height, :cfg.width], luminance=lum[0])

    return frame(device, draws, sceneset)
