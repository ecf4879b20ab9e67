"""Pallas TPU raster kernel.

The hot inner loop of the visibility rasterizer as a Mosaic kernel:
each grid step owns one (TILE_H, TILE_W) framebuffer tile whose
depth/id/barycentric state lives in VMEM for the whole triangle loop —
the XLA scan formulation spills that carry to HBM every step, which
made raster HBM-bandwidth-bound.  Per-tile triangle setup rows are
pre-gathered densely on the XLA side; the kernel's trip count comes
from the per-tile bin count (scalar prefetch), so empty tiles cost
almost nothing.

Outputs per pixel: depth, winning triangle id, and the two leading
perspective-correct barycentrics (so the deferred resolve needs no
per-pixel setup re-gather).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import TILE_H, TILE_W

SETUP_WIDTH = 128  # per-triangle setup row padded to the TPU lane width
                   # (14 floats used; Mosaic requires last-dim blocks
                   # aligned to 128)


def pack_tile_setup(setup, bins, big_ids):
    """Dense per-tile setup rows: (n_tiles, K+B, SETUP_WIDTH).

    Row layout: [a00,a01,a02, a10,a11,a12, a20,a21,a22, zs0,zs1,zs2,
    valid, tri_id, 0, 0] where e_i = a_i . (xn, yn, 1), depth =
    zs . (xn, yn, 1), and adj rows carry det's sign so the inside test
    is sign-free.  tri_id is stored as float (exact below 2^24).
    """
    adj, det, zc = setup["adj"], setup["det"], setup["zc"]
    ez = adj * (zc[:, :, None] / det[:, None, None])
    zs = ez.sum(axis=1)                               # (T, 3)
    sgn = jnp.sign(det)
    T = adj.shape[0]
    ylim = setup.get("ylim")
    if ylim is None:
        ylim = jnp.broadcast_to(jnp.array([-8.0, 8.0], jnp.float32), (T, 2))
    flat = jnp.concatenate([
        adj.reshape(-1, 9) * sgn[:, None], zs,
        jnp.ones((T, 1), jnp.float32),
        jnp.zeros((T, 1), jnp.float32),     # slot 13: tri id (set below)
        ylim,                                # slots 14/15: y scissor band
        jnp.zeros((T, SETUP_WIDTH - 16), jnp.float32),
    ], axis=-1)                                       # (T, SETUP_WIDTH)

    # big-list entries FIRST so the dynamic trip count (B + bin count)
    # walks them before the tile's binned range
    ids = jnp.concatenate(
        [jnp.broadcast_to(big_ids[None, :], (bins.shape[0], big_ids.shape[0])), bins],
        axis=1)                                       # (n_tiles, B+K)
    ok = ids >= 0
    rows = flat[jnp.maximum(ids, 0)] * ok[..., None]  # invalid -> zero row
    rows = rows.at[..., 13].set(ids.astype(jnp.float32))
    return rows


def _raster_kernel(tile_ids_ref, counts_ref, rows_ref,
                   depth_ref, vis_ref, l0_ref, l1_ref,
                   *, tiles_x, width, height, n_entries):
    i = pl.program_id(0)
    tile = tile_ids_ref[i]
    ty = tile // tiles_x
    tx = tile % tiles_x

    yy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
    yn = (ty.astype(jnp.float32) * TILE_H + yy + 0.5) * (2.0 / height) - 1.0
    xn = (tx.astype(jnp.float32) * TILE_W + xx + 0.5) * (2.0 / width) - 1.0

    def body(k, carry):
        depth, vis, l0, l1 = carry
        e0 = rows_ref[k, 0] * xn + rows_ref[k, 1] * yn + rows_ref[k, 2]
        e1 = rows_ref[k, 3] * xn + rows_ref[k, 4] * yn + rows_ref[k, 5]
        e2 = rows_ref[k, 6] * xn + rows_ref[k, 7] * yn + rows_ref[k, 8]
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
        s = e0 + e1 + e2
        inside = inside & (s > 0) & (rows_ref[k, 12] > 0)
        inside = inside & (yn >= rows_ref[k, 14]) & (yn < rows_ref[k, 15])
        d = rows_ref[k, 9] * xn + rows_ref[k, 10] * yn + rows_ref[k, 11]
        passed = inside & (d > depth) & (d <= 1.0)
        inv_s = 1.0 / jnp.where(s == 0, 1.0, s)
        tri = rows_ref[k, 13]
        depth = jnp.where(passed, d, depth)
        vis = jnp.where(passed, tri, vis)
        l0 = jnp.where(passed, e0 * inv_s, l0)
        l1 = jnp.where(passed, e1 * inv_s, l1)
        return depth, vis, l0, l1

    init = (jnp.zeros((TILE_H, TILE_W), jnp.float32),
            jnp.full((TILE_H, TILE_W), -1.0, jnp.float32),
            jnp.zeros((TILE_H, TILE_W), jnp.float32),
            jnp.zeros((TILE_H, TILE_W), jnp.float32))
    # two segments: [0, big_count) valid big entries, then the tile's
    # binned range [n_big, n_big + count) — skips the empty big slots
    big_count = counts_ref[0]
    count = counts_ref[2 + i]
    carry = jax.lax.fori_loop(0, big_count, body, init)
    depth, vis, l0, l1 = jax.lax.fori_loop(
        counts_ref[1], counts_ref[1] + count, body, carry)
    depth_ref[...] = depth
    vis_ref[...] = vis
    l0_ref[...] = l0
    l1_ref[...] = l1


def raster_pallas(setup, bins, big_ids, counts, tiles_x, tiles_y, width, height,
                  tile_ids=None, interpret=False):
    """Pallas raster.  Returns (depth, vis int32, lam0, lam1) images."""
    rows = pack_tile_setup(setup, bins, big_ids)
    n_entries = rows.shape[1]
    if tile_ids is None:
        tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    else:
        rows = rows[tile_ids]
        counts = counts[tile_ids]
    n_tiles = tile_ids.shape[0]
    B = big_ids.shape[0]
    # scalar-prefetch layout: [n_valid_bigs, B, per-tile bin counts...]
    big_count = jnp.sum(big_ids >= 0).astype(jnp.int32)
    trip = jnp.concatenate([big_count[None], jnp.int32(B)[None],
                            counts.astype(jnp.int32)])

    def kernel_wrap(tile_ids_ref, counts_ref, rows_ref,
                    depth_ref, vis_ref, l0_ref, l1_ref):
        _raster_kernel(tile_ids_ref, counts_ref, rows_ref.at[0],
                       depth_ref.at[0], vis_ref.at[0], l0_ref.at[0], l1_ref.at[0],
                       tiles_x=tiles_x, width=width, height=height,
                       n_entries=n_entries)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, n_entries, SETUP_WIDTH), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32),
    ]
    depth, vis, l0, l1 = pl.pallas_call(
        kernel_wrap, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(tile_ids, trip, rows)

    from .raster import _untile
    ty_local = n_tiles // tiles_x
    vis_i = jnp.round(vis).astype(jnp.int32)
    return (_untile(depth, tiles_x, ty_local), _untile(vis_i, tiles_x, ty_local),
            _untile(l0, tiles_x, ty_local), _untile(l1, tiles_x, ty_local))


# ---------------------------------------------------------------------------
# v2: fused attribute-interpolating raster ("forward visibility raster")
#
# Per-pixel attribute gathers cost ~15-25 ms per 2M-pixel pass on TPU
# (gather-instruction throughput bound, independent of table size), so
# the deferred resolve's gathers dominated the frame.  In the raster
# loop the triangle index is a *uniform scalar*, so interpolating the
# winner's attributes costs only vector selects — no gathers at all.
# The kernel emits uv/normal/material planes directly.
# ---------------------------------------------------------------------------

ATTR_BASE = 16        # slots 16..: per-vertex uv(6), normal(9)
MAT_BASE = 34         # material: rgb(3), emissive, metalness, roughness,
                      # reflectivity, albedo_id  -> slots 34..41


def pack_tile_setup_attrs(setup, bins, big_ids, tris, uv, normal, tri_material,
                          materials):
    """Setup rows extended with per-vertex attributes + material params."""
    rows = pack_tile_setup(setup, bins, big_ids)      # (n_tiles, E, 128)
    uv_t = uv[tris].reshape(-1, 6)                    # (T, 6)
    n_t = normal[tris].reshape(-1, 9)                 # (T, 9)
    mat = tri_material                                 # (T,) int32
    mrows = jnp.concatenate([
        materials["color"][mat][:, :3],
        materials["emissive"][mat][:, None],
        materials["metalness"][mat][:, None],
        materials["roughness"][mat][:, None],
        materials["reflectivity"][mat][:, None],
        materials["albedomap"][mat][:, None].astype(jnp.float32),
    ], axis=-1)                                       # (T, 8)
    attr_flat = jnp.concatenate([uv_t, n_t, jnp.zeros((uv_t.shape[0], 1))], -1)

    ids = jnp.concatenate(
        [jnp.broadcast_to(big_ids[None, :], (bins.shape[0], big_ids.shape[0])), bins],
        axis=1)
    ok = (ids >= 0)[..., None]
    t = jnp.maximum(ids, 0)
    rows = rows.at[..., ATTR_BASE:ATTR_BASE + 15].set(attr_flat[t][..., :15] * ok)
    rows = rows.at[..., MAT_BASE:MAT_BASE + 8].set(mrows[t] * ok)
    return rows


def _raster_shade_kernel(tile_ids_ref, counts_ref, rows_ref, out_refs,
                         *, tiles_x, width, height, n_entries):
    i = pl.program_id(0)
    tile = tile_ids_ref[i]
    ty = tile // tiles_x
    tx = tile % tiles_x

    yy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
    yn = (ty.astype(jnp.float32) * TILE_H + yy + 0.5) * (2.0 / height) - 1.0
    xn = (tx.astype(jnp.float32) * TILE_W + xx + 0.5) * (2.0 / width) - 1.0

    N_PLANES = 15   # depth, vis, u, v, nx, ny, nz, r, g, b, em, met, rgh, rfl, alb

    def body(k, carry):
        depth = carry[0]
        e0 = rows_ref[k, 0] * xn + rows_ref[k, 1] * yn + rows_ref[k, 2]
        e1 = rows_ref[k, 3] * xn + rows_ref[k, 4] * yn + rows_ref[k, 5]
        e2 = rows_ref[k, 6] * xn + rows_ref[k, 7] * yn + rows_ref[k, 8]
        s = e0 + e1 + e2
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (s > 0) & (rows_ref[k, 12] > 0)
        d = rows_ref[k, 9] * xn + rows_ref[k, 10] * yn + rows_ref[k, 11]
        passed = inside & (d > depth) & (d <= 1.0)
        inv = 1.0 / jnp.where(s == 0, 1.0, s)
        l0 = e0 * inv
        l1 = e1 * inv
        l2 = 1.0 - l0 - l1

        u = rows_ref[k, 16] * l0 + rows_ref[k, 18] * l1 + rows_ref[k, 20] * l2
        v = rows_ref[k, 17] * l0 + rows_ref[k, 19] * l1 + rows_ref[k, 21] * l2
        nx = rows_ref[k, 22] * l0 + rows_ref[k, 25] * l1 + rows_ref[k, 28] * l2
        ny = rows_ref[k, 23] * l0 + rows_ref[k, 26] * l1 + rows_ref[k, 29] * l2
        nz = rows_ref[k, 24] * l0 + rows_ref[k, 27] * l1 + rows_ref[k, 30] * l2

        vals = [d, rows_ref[k, 13], u, v, nx, ny, nz,
                rows_ref[k, 34], rows_ref[k, 35], rows_ref[k, 36],
                rows_ref[k, 37], rows_ref[k, 38], rows_ref[k, 39],
                rows_ref[k, 40], rows_ref[k, 41]]
        return tuple(jnp.where(passed, vals[j], carry[j]) for j in range(N_PLANES))

    zeros = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    init = (zeros, zeros - 1.0) + tuple(zeros for _ in range(13))
    big_count = counts_ref[0]
    count = counts_ref[2 + i]
    carry = jax.lax.fori_loop(0, big_count, body, init)
    out = jax.lax.fori_loop(counts_ref[1], counts_ref[1] + count, body, carry)
    for j in range(N_PLANES):
        out_refs[j][...] = out[j]


def raster_shade_pallas(setup, bins, big_ids, counts, tris, uv, normal,
                        tri_material, materials, tiles_x, tiles_y, width, height,
                        tile_ids=None, interpret=False):
    """Fused raster + attribute/material interpolation.

    Returns dict of full-res planes: depth, vis (int32), uv (H,W,2),
    normal (H,W,3), color (H,W,3), emissive, metalness, roughness,
    reflectivity, albedo_id (int32).
    """
    rows = pack_tile_setup_attrs(setup, bins, big_ids, tris, uv, normal,
                                 tri_material, materials)
    n_entries = rows.shape[1]
    if tile_ids is None:
        tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    else:
        rows = rows[tile_ids]
        counts = counts[tile_ids]
    n_tiles = tile_ids.shape[0]
    B = big_ids.shape[0]
    big_count = jnp.sum(big_ids >= 0).astype(jnp.int32)
    trip = jnp.concatenate([big_count[None], jnp.int32(B)[None],
                            counts.astype(jnp.int32)])

    N_PLANES = 15

    def kernel_wrap(tile_ids_ref, counts_ref, rows_ref, *outs):
        _raster_shade_kernel(tile_ids_ref, counts_ref, rows_ref.at[0],
                             [o.at[0] for o in outs],
                             tiles_x=tiles_x, width=width, height=height,
                             n_entries=n_entries)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, n_entries, SETUP_WIDTH), lambda i, *_: (i, 0, 0))],
        out_specs=[pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0))
                   for _ in range(N_PLANES)],
    )
    out_shape = [jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32)
                 for _ in range(N_PLANES)]
    planes = pl.pallas_call(kernel_wrap, grid_spec=grid_spec,
                            out_shape=out_shape, interpret=interpret)(
        tile_ids, trip, rows)

    from .raster import _untile
    tyl = n_tiles // tiles_x
    u = [_untile(p, tiles_x, tyl) for p in planes]
    return dict(
        depth=u[0], vis=jnp.round(u[1]).astype(jnp.int32),
        uv=jnp.stack([u[2], u[3]], -1),
        normal=jnp.stack([u[4], u[5], u[6]], -1),
        color=jnp.stack([u[7], u[8], u[9]], -1),
        emissive=u[10], metalness=u[11], roughness=u[12],
        reflectivity=u[13], albedo_id=jnp.round(u[14]).astype(jnp.int32),
    )
