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
    row16 = setup["row16"]                            # (T, 16) prebuilt SoA
    T = row16.shape[0]
    flat = jnp.concatenate([
        row16, jnp.zeros((T, SETUP_WIDTH - 16), jnp.float32),
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
    # tile_ids names the GLOBAL tile of each bins row (1:1, same
    # contract as raster.raster) — the tile-sharded path passes its
    # band's ids with band-local bins; may be traced (shard_map)
    if tile_ids is None:
        tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    n_tiles = tile_ids.shape[0]
    assert rows.shape[0] == n_tiles, (rows.shape, n_tiles)
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


SHADE_PACK = 2        # triangles per 128-lane row (64 slots each)


def pack_tile_setup_attrs(setup, bins, big_ids, tris, uv, normal, tri_material,
                          materials, tangent=None, matmaps=None,
                          alpha_in_alb=False, ids=None):
    """Setup+attribute rows, 2 triangles packed per 128-lane row.

    Entry layout within its 64-lane half: [adj*sgn 0-8, zs 9-11, valid 12,
    tri_id 13, uv numerator coeffs 16-21, normal coeffs 22-30, material
    34-41, matmap base/size 42-43, tangent coeffs 44-52 + tanw 53 (when
    given)].  Returns (n_tiles, E/2, 128); the kernel statically unrolls
    the half offset, halving row DMA and loop trips vs one-entry-per-row.

    Interpolated attributes ship as NUMERATOR plane coefficients: attr =
    (X*xn + Y*yn + Z) / s with s = e0+e1+e2 — the kernel selects the
    winner's numerators and s, then divides ONCE per pixel after the
    entry loop.  vs interpolating per entry (l0/l1/l2 + 3-FMA per attr +
    a reciprocal per entry) this cuts ~16 vector ops from the ~76-op
    per-entry cost of the extended kernel.
    """
    row16 = setup["row16"]                            # (T, 16) prebuilt SoA
    T = row16.shape[0]

    # adj[t, i] = edge i's (a, b, c); numerator coeff c of an attr with
    # vertex values v_i is sum_i adj[t, i, c] * v_i
    adj = row16[:, :9].reshape(T, 3, 3)

    def num_coef_batch(vA):
        """(T, 3, A) vertex attrs -> (T, A*3) numerator coeffs
        (attr-major: [a0c0 a0c1 a0c2 a1c0 ...]).

        ONE broadcast-multiply-reduce fusion, NOT an einsum and NOT
        per-column FMAs: the batched (3, 3) @ (3, A) contraction
        lowered to tiny per-T matmuls that pad the 3-dims onto the MXU
        (0.95 ms/frame at HIGHEST precision in the round-5 trace); the
        per-column Python list lowered to ~64 tiny unfused (T,) VPU
        dispatches (~1.6 ms aggregate in trace r5b — dispatch-bound,
        worse than the einsum it replaced).  The broadcast form sums k
        in one 3-element reduce — f32-exact to ~1 ulp of the FMA chain
        (measured max 1e-6 abs on unit-scale coeffs; the reduce may
        reassociate) — and XLA emits a single loop fusion."""
        T_, _, A = vA.shape
        # out[t, a, c] = sum_k adj[t, k, c] * vA[t, k, a]
        prod = vA[:, :, :, None] * adj[:, :, None, :]     # (T, 3, A, 3)
        return jnp.sum(prod, axis=1).reshape(T_, A * 3)   # (T, A*3)

    uv_v = uv[tris]                                   # (T, 3, 2)
    n_v = normal[tris]                                # (T, 3, 3)
    uvn_t = num_coef_batch(jnp.concatenate([uv_v, n_v], -1))  # (T, 15)
    mat = tri_material                                 # (T,) int32
    pk = materials.get("packed10")
    if pk is not None:
        rows10 = pk[mat]                              # ONE material gather
        mrows = rows10[:, 0:8]
        mm = rows10[:, 8:10]
        if alpha_in_alb:
            # translucent layer: the albedo-id slot carries the material
            # alpha instead (the mip path never reads the id)
            mrows = jnp.concatenate(
                [mrows[:, 0:7], materials["color"][mat][:, 3:4]], axis=-1)
    else:
        mrows = jnp.concatenate([
            materials["color"][mat][:, :3],
            materials["emissive"][mat][:, None],
            materials["metalness"][mat][:, None],
            materials["roughness"][mat][:, None],
            materials["reflectivity"][mat][:, None],
            materials["albedomap"][mat][:, None].astype(jnp.float32),
        ], axis=-1)                                   # (T, 8)
        mm = None

    pieces = [
        row16,                                        # 0..12 setup, 13 id,
                                                      # 14-15 ylim (unused)
        uvn_t,                                        # 16..30 uv + normal
        jnp.zeros((T, 3), jnp.float32),               # 31-33 pad
        mrows,                                        # 34..41
    ]
    if tangent is not None:
        if mm is None:
            mm = jnp.stack([matmaps["base"][mat].astype(jnp.float32),
                            matmaps["size"][mat].astype(jnp.float32)], -1)
        t_v = tangent[tris]                           # (T, 3, 4)
        t_t = jnp.concatenate(
            [num_coef_batch(t_v[..., :3]), t_v[:, 0, 3:4],
             jnp.zeros((T, 2), jnp.float32)], -1)     # (T, 12)
        absorb = (rows10[:, 10:11] if pk is not None
                  else jnp.zeros((T, 1), jnp.float32))
        pieces += [mm, t_t, absorb, jnp.zeros((T, 64 - 57), jnp.float32)]
    else:
        pieces += [jnp.zeros((T, 64 - 42), jnp.float32)]
    flat = jnp.concatenate(pieces, axis=-1)           # (T, 64)

    if ids is None:
        ids = _entry_ids(bins, big_ids)
    E = ids.shape[1]
    assert E % SHADE_PACK == 0
    ok = (ids >= 0)[..., None]
    rows = flat[jnp.maximum(ids, 0)] * ok             # (n_tiles, E, 64)
    rows = rows.at[..., 13].set(ids.astype(jnp.float32))
    return rows.reshape(ids.shape[0], E // SHADE_PACK, SHADE_PACK * 64)


def _entry_ids(bins, big_ids):
    """(n_tiles, B+K) entry-id table in kernel walk order (big first)."""
    return jnp.concatenate(
        [jnp.broadcast_to(big_ids[None, :],
                          (bins.shape[0], big_ids.shape[0])), bins], axis=1)


def suffix_zbound_groups(setup, ids, pack):
    """Per-group SUFFIX max of the entry depth bound, in kernel walk
    order (ids from _entry_ids — the same table the row packers gather
    with, so the gather isn't duplicated).

    szmax[t, g] = max over entries in groups >= g of setup['zbound']
    (a proven upper bound on any fragment's reverse-Z depth, padded by
    f32 rounding slop).  Once the tile's MIN depth reaches szmax[g], no
    remaining entry can pass the strict `d > depth` test — the raster
    loop skips the rest (early-z exit).  Padding entries contribute 0.
    """
    zb = jnp.where(ids >= 0, setup["zbound"][jnp.maximum(ids, 0)], 0.0)
    E = ids.shape[1]
    gm = zb.reshape(ids.shape[0], E // pack, pack).max(-1)
    return jnp.flip(jax.lax.cummax(jnp.flip(gm, 1), axis=1), 1)


def suffix_zbound_groups_banded(setup, big_ids, bin_zub, pack):
    """suffix_zbound_groups from the binning's quantized depth bands.

    bin_zub (bin_triangles return_zub=True) is a DENSE per-entry upper
    bound recovered from the sort keys — no (n_tiles x E) gather.  The
    band bound is up to 1/15 looser than the exact zbound, which only
    delays the early-z exit by at most one 4-bit depth band; it stays
    conservative (bound >= every fragment's depth), so outputs are
    bit-identical.  Big entries still gather their exact bound (a
    (big_capacity,) gather is noise)."""
    big_zb = jnp.where(big_ids >= 0,
                       setup["zbound"][jnp.maximum(big_ids, 0)], 0.0)
    zb = jnp.concatenate(
        [jnp.broadcast_to(big_zb[None, :],
                          (bin_zub.shape[0], big_ids.shape[0])), bin_zub],
        axis=1)
    E = zb.shape[1]
    gm = zb.reshape(zb.shape[0], E // pack, pack).max(-1)
    return jnp.flip(jax.lax.cummax(jnp.flip(gm, 1), axis=1), 1)


def _szmax_blocks(szmax, R):
    """Repack (n_tiles, n_groups) suffix bounds into per-grid-step
    blocks of shape (n_steps, G8, 128): sublane = group (the kernel's
    dynamic index — Mosaic forbids dynamic lane indexing), lane = the
    static within-step tile slot, padded to the 128-lane tile so the
    block equals the array's last two dims (any (sublane, R) block with
    R not 128-divisible fails real-TPU lowering; interpret mode does
    not enforce this).  Padding lanes/rows are never read."""
    n_tiles, n_groups = szmax.shape
    n_steps = n_tiles // R
    s = szmax.reshape(n_steps, R, n_groups).transpose(0, 2, 1)
    G8 = -(-n_groups // 8) * 8
    return jnp.pad(s, ((0, 0), (0, G8 - n_groups), (0, 128 - R)))


def _raster_shade_kernel(tile_ids_ref, counts_ref, rows_all, out_refs,
                         *, tiles_x, width, height,
                         tiles_per_step=1, extended=False, peel_all=None,
                         szmax_all=None):
    """peel_all: optional (R, TILE_H, TILE_W) reverse-Z depth — fragments
    at or nearer than it are rejected (depth peeling: pass layer N-1's
    depth to raster layer N).

    szmax_all: optional (R, n_groups) suffix depth bounds
    (suffix_zbound_groups) enabling the early-z exit: once the tile's
    min depth exceeds the bound of everything remaining, each further
    group costs one scalar compare + branch instead of the full
    interpolate+select block."""
    i = pl.program_id(0)
    yy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
    P = SHADE_PACK
    big_groups = (counts_ref[0] + (P - 1)) // P
    bin_group0 = counts_ref[1] // P

    # depth, vis, u, v, nx, ny, nz, r, g, b, em, met, rgh, rfl, alb
    # (+ matmap base, matmap size, tangent xyzw, absorb when extended)
    N_PLANES = 22 if extended else 15

    for rstep in range(tiles_per_step):
        slot = i * tiles_per_step + rstep
        tile = tile_ids_ref[slot]
        ty = tile // tiles_x
        tx = tile % tiles_x
        yn = (ty.astype(jnp.float32) * TILE_H + yy + 0.5) * (2.0 / height) - 1.0
        xn = (tx.astype(jnp.float32) * TILE_W + xx + 0.5) * (2.0 / width) - 1.0
        rows = rows_all.at[rstep]
        peel = None if peel_all is None else peel_all[rstep]

        def group_work(g, carry):
            for q in range(P):
                o = q * 64
                depth = carry[0]
                e0 = rows[g, o + 0] * xn + rows[g, o + 1] * yn + rows[g, o + 2]
                e1 = rows[g, o + 3] * xn + rows[g, o + 4] * yn + rows[g, o + 5]
                e2 = rows[g, o + 6] * xn + rows[g, o + 7] * yn + rows[g, o + 8]
                s = e0 + e1 + e2
                inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (s > 0) \
                    & (rows[g, o + 12] > 0)
                d = rows[g, o + 9] * xn + rows[g, o + 10] * yn + rows[g, o + 11]
                passed = inside & (d > depth) & (d <= 1.0)
                if peel is not None:
                    # strictly farther than the previous layer (reverse-Z:
                    # smaller d); the layer's own fragments interpolate to
                    # exactly-equal d and fail the strict test
                    passed = passed & (d < peel)
                # deferred perspective divide: select the winner's
                # numerator planes + s, divide ONCE after the loop
                u = rows[g, o + 16] * xn + rows[g, o + 17] * yn + rows[g, o + 18]
                v = rows[g, o + 19] * xn + rows[g, o + 20] * yn + rows[g, o + 21]
                nx = rows[g, o + 22] * xn + rows[g, o + 23] * yn + rows[g, o + 24]
                ny = rows[g, o + 25] * xn + rows[g, o + 26] * yn + rows[g, o + 27]
                nz = rows[g, o + 28] * xn + rows[g, o + 29] * yn + rows[g, o + 30]

                vals = [d, rows[g, o + 13], u, v, nx, ny, nz,
                        rows[g, o + 34], rows[g, o + 35], rows[g, o + 36],
                        rows[g, o + 37], rows[g, o + 38], rows[g, o + 39],
                        rows[g, o + 40], rows[g, o + 41]]
                if extended:
                    tx_ = rows[g, o + 44] * xn + rows[g, o + 45] * yn \
                        + rows[g, o + 46]
                    ty_ = rows[g, o + 47] * xn + rows[g, o + 48] * yn \
                        + rows[g, o + 49]
                    tz_ = rows[g, o + 50] * xn + rows[g, o + 51] * yn \
                        + rows[g, o + 52]
                    vals += [rows[g, o + 42], rows[g, o + 43],
                             tx_, ty_, tz_, rows[g, o + 53],
                             rows[g, o + 56]]
                vals.append(s)
                carry = tuple(jnp.where(passed, vals[j], carry[j])
                              for j in range(N_PLANES + 1))
            return carry

        if szmax_all is None:
            body = group_work
        else:
            # early-z exit: the carry's last slot tracks the tile's min
            # depth; groups whose suffix bound can't beat it reduce to a
            # scalar compare + branch (bit-identical — skipped entries
            # provably fail the strict depth test)
            def body(g, carry):
                def work(c):
                    out = group_work(g, c[:-1])
                    return out + (jnp.min(out[0]),)
                # szmax block is (1, G8, 128): the dynamic g index rides
                # the sublane dim (Mosaic forbids dynamic lane indexing)
                return jax.lax.cond(szmax_all[0, g, rstep] > carry[-1],
                                    work, lambda c: c, carry)

        zeros = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        init = (zeros, zeros - 1.0) + tuple(zeros for _ in range(N_PLANES - 1))
        if szmax_all is not None:
            init = init + (jnp.float32(0.0),)
        count_groups = (counts_ref[2 + slot] + (P - 1)) // P
        carry = jax.lax.fori_loop(0, big_groups, body, init)
        out = jax.lax.fori_loop(bin_group0, bin_group0 + count_groups, body,
                                carry)
        # ONE perspective divide per pixel (winner's numerators / s)
        s_win = out[N_PLANES]
        rcp = 1.0 / jnp.where(s_win == 0.0, 1.0, s_win)
        rational = (2, 3, 4, 5, 6) + ((17, 18, 19) if extended else ())
        for j in range(N_PLANES):
            out_refs[j][rstep, :, :] = (out[j] * rcp if j in rational
                                        else out[j])


def _raster_shade_kernel_2p(tile_ids_ref, counts_ref, rows_all, out_refs,
                            *, tiles_x, width, height,
                            tiles_per_step=1, extended=False, peel_all=None,
                            szmax_all=None):
    """Two-phase variant of _raster_shade_kernel: a cheap depth prepass
    finds each pixel's winning ENTRY SLOT, then a second walk
    interpolates attributes only for groups that won >= 1 pixel in the
    tile (lax.cond skips the ~40-vector-op interpolate+select block for
    occluded/missed triangles — most of a deep bin).  Bitwise-identical
    outputs to the one-phase kernel (same arithmetic, same tie rules).
    """
    i = pl.program_id(0)
    yy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
    P = SHADE_PACK
    big_groups = (counts_ref[0] + (P - 1)) // P
    bin_group0 = counts_ref[1] // P

    N_PLANES = 22 if extended else 15

    for rstep in range(tiles_per_step):
        slot_i = i * tiles_per_step + rstep
        tile = tile_ids_ref[slot_i]
        ty = tile // tiles_x
        tx = tile % tiles_x
        yn = (ty.astype(jnp.float32) * TILE_H + yy + 0.5) * (2.0 / height) - 1.0
        xn = (tx.astype(jnp.float32) * TILE_W + xx + 0.5) * (2.0 / width) - 1.0
        rows = rows_all.at[rstep]
        peel = None if peel_all is None else peel_all[rstep]

        def edges(g, o):
            e0 = rows[g, o + 0] * xn + rows[g, o + 1] * yn + rows[g, o + 2]
            e1 = rows[g, o + 3] * xn + rows[g, o + 4] * yn + rows[g, o + 5]
            e2 = rows[g, o + 6] * xn + rows[g, o + 7] * yn + rows[g, o + 8]
            s = e0 + e1 + e2
            inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (s > 0) \
                & (rows[g, o + 12] > 0)
            d = rows[g, o + 9] * xn + rows[g, o + 10] * yn + rows[g, o + 11]
            return e0, e1, s, inside, d

        # ---- phase 1: depth + winning slot (entry index, f32-exact)
        def depth_work(g, carry):
            depth, slot = carry
            for q in range(P):
                o = q * 64
                _, _, _, inside, d = edges(g, o)
                passed = inside & (d > depth) & (d <= 1.0)
                if peel is not None:
                    passed = passed & (d < peel)
                k = (g * P + q).astype(jnp.float32)
                depth = jnp.where(passed, d, depth)
                slot = jnp.where(passed, k, slot)
            return depth, slot

        if szmax_all is None:
            depth_body = depth_work
            init_extra = ()
        else:
            def depth_body(g, carry):      # early-z exit (see one-phase)
                def work(c):
                    d_, s_ = depth_work(g, c[:-1])
                    return d_, s_, jnp.min(d_)
                return jax.lax.cond(szmax_all[0, g, rstep] > carry[-1],
                                    work, lambda c: c, carry)
            init_extra = (jnp.float32(0.0),)

        zeros = jnp.zeros((TILE_H, TILE_W), jnp.float32)
        init = (zeros, zeros - 1.0) + init_extra
        count_groups = (counts_ref[2 + slot_i] + (P - 1)) // P
        carry = jax.lax.fori_loop(0, big_groups, depth_body, init)
        carry = jax.lax.fori_loop(
            bin_group0, bin_group0 + count_groups, depth_body, carry)
        depth, slot = carry[0], carry[1]

        # ---- phase 2: attributes only for groups that won pixels
        def attr_winner(g, planes):
            for q in range(P):
                o = q * 64
                e0, e1, s, _, _ = edges(g, o)
                won = slot == (g * P + q).astype(jnp.float32)
                inv = 1.0 / jnp.where(s == 0, 1.0, s)
                u = (rows[g, o + 16] * xn + rows[g, o + 17] * yn
                     + rows[g, o + 18]) * inv
                v = (rows[g, o + 19] * xn + rows[g, o + 20] * yn
                     + rows[g, o + 21]) * inv
                nx = (rows[g, o + 22] * xn + rows[g, o + 23] * yn
                      + rows[g, o + 24]) * inv
                ny = (rows[g, o + 25] * xn + rows[g, o + 26] * yn
                      + rows[g, o + 27]) * inv
                nz = (rows[g, o + 28] * xn + rows[g, o + 29] * yn
                      + rows[g, o + 30]) * inv
                vals = [rows[g, o + 13], u, v, nx, ny, nz,
                        rows[g, o + 34], rows[g, o + 35], rows[g, o + 36],
                        rows[g, o + 37], rows[g, o + 38], rows[g, o + 39],
                        rows[g, o + 40], rows[g, o + 41]]
                if extended:
                    tx_ = (rows[g, o + 44] * xn + rows[g, o + 45] * yn
                           + rows[g, o + 46]) * inv
                    ty_ = (rows[g, o + 47] * xn + rows[g, o + 48] * yn
                           + rows[g, o + 49]) * inv
                    tz_ = (rows[g, o + 50] * xn + rows[g, o + 51] * yn
                           + rows[g, o + 52]) * inv
                    vals += [rows[g, o + 42], rows[g, o + 43],
                             tx_, ty_, tz_, rows[g, o + 53],
                             rows[g, o + 56]]
                planes = tuple(jnp.where(won, vals[j], planes[j])
                               for j in range(N_PLANES - 1))
            return planes

        def attr_body(g, planes):
            lo = (g * P).astype(jnp.float32)
            hi = ((g + 1) * P).astype(jnp.float32)
            hit = jnp.any((slot >= lo) & (slot < hi))
            return jax.lax.cond(hit, lambda p: attr_winner(g, p),
                                lambda p: p, planes)

        # walk no further than the last winning slot's group: everything
        # beyond it can't satisfy `hit` (slots only come from phase 1)
        g_hi = (jnp.max(slot).astype(jnp.int32) // P) + 1
        init_p = (zeros - 1.0,) + tuple(zeros for _ in range(N_PLANES - 2))
        planes = jax.lax.fori_loop(0, jnp.minimum(big_groups, g_hi),
                                   attr_body, init_p)
        planes = jax.lax.fori_loop(
            bin_group0,
            jnp.clip(g_hi, bin_group0, bin_group0 + count_groups),
            attr_body, planes)

        out = (depth,) + planes
        for j in range(N_PLANES):
            out_refs[j][rstep, :, :] = out[j]


def raster_shade_pallas(setup, bins, big_ids, counts, tris, uv, normal,
                        tri_material, materials, tiles_x, tiles_y, width, height,
                        tile_ids=None, interpret=False, tangent=None,
                        matmaps=None, planes_2d=False, alpha_in_alb=False,
                        peel_depth=None, two_phase=False, early_z=True,
                        bin_zub=None):
    """Fused raster + attribute/material interpolation.

    Returns dict of full-res planes: depth, vis (int32), uv (H,W,2),
    normal (H,W,3), color (H,W,3), emissive, metalness, roughness,
    reflectivity, albedo_id (int32); with tangent/matmaps also
    tangent (H,W,4), matmap_base (H,W) i32, matmap_size (H,W) i32.

    peel_depth: optional (local_H, W) reverse-Z depth plane — keep only
    fragments strictly farther (depth peeling; reference analogue: the
    translucent subpasses shade every layer, renderer.cpp:6596-6684).
    """
    assert big_ids.shape[0] % SHADE_PACK == 0
    extended = tangent is not None
    ids = _entry_ids(bins, big_ids)
    rows = pack_tile_setup_attrs(setup, bins, big_ids, tris, uv, normal,
                                 tri_material, materials, tangent=tangent,
                                 matmaps=matmaps, alpha_in_alb=alpha_in_alb,
                                 ids=ids)
    n_groups = rows.shape[1]
    # tile_ids: global tile of each bins row (1:1, see raster_pallas)
    if tile_ids is None:
        tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    n_tiles = tile_ids.shape[0]
    assert rows.shape[0] == n_tiles, (rows.shape, n_tiles)
    B = big_ids.shape[0]
    big_count = jnp.sum(big_ids >= 0).astype(jnp.int32)
    trip = jnp.concatenate([big_count[None], jnp.int32(B)[None],
                            counts.astype(jnp.int32)])

    N_PLANES = 22 if extended else 15
    # multi-tile grid steps amortize per-step dispatch/DMA latency —
    # bounded by the 16 MB scoped-VMEM limit: the per-step block is
    # R * (rows + output planes), double-buffered by Mosaic.  Deep bins
    # (stress-scale capacities) must drop R rather than fail to compile
    per_tile = (n_groups * 128 * rows.dtype.itemsize
                + N_PLANES * TILE_H * TILE_W * 4)
    # calibration: cap-1024 (n_groups 576) at R=15 measured 16.41 MB of
    # scoped vmem -> the scheduler's effective footprint is ~1.67x the
    # raw per-step block (outputs double-buffer, inputs stream)
    r_max = max(int(15.5 * 2**20 / (1.67 * per_tile)), 1)
    R = next((r for r in (15, 10, 6, 5, 4, 3, 2)
              if r <= r_max and n_tiles % r == 0), 1)

    has_peel = peel_depth is not None

    kern = _raster_shade_kernel_2p if two_phase else _raster_shade_kernel

    def kernel_wrap(tile_ids_ref, counts_ref, rows_ref, *rest):
        rest = list(rest)
        peel_ref = rest.pop(0) if has_peel else None
        szmax_ref = rest.pop(0) if early_z else None
        kern(tile_ids_ref, counts_ref, rows_ref,
             rest,
             tiles_x=tiles_x, width=width, height=height,
             tiles_per_step=R, extended=extended,
             peel_all=peel_ref, szmax_all=szmax_ref)

    in_specs = [pl.BlockSpec((R, n_groups, SHADE_PACK * 64),
                             lambda i, *_: (i, 0, 0))]
    args = [tile_ids, trip, rows]
    if has_peel:
        from .raster import tile_image
        tyl_ = n_tiles // tiles_x
        args.append(tile_image(peel_depth, tiles_x, tyl_))
        in_specs.append(pl.BlockSpec((R, TILE_H, TILE_W),
                                     lambda i, *_: (i, 0, 0)))
    if early_z:
        sz = (suffix_zbound_groups_banded(setup, big_ids, bin_zub, SHADE_PACK)
              if bin_zub is not None
              else suffix_zbound_groups(setup, ids, SHADE_PACK))
        szmax = _szmax_blocks(sz, R)
        args.append(szmax)
        in_specs.append(pl.BlockSpec((1,) + szmax.shape[1:],
                                     lambda i, *_: (i, 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles // R,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((R, TILE_H, TILE_W), lambda i, *_: (i, 0, 0))
                   for _ in range(N_PLANES)],
    )
    out_shape = [jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32)
                 for _ in range(N_PLANES)]
    planes = pl.pallas_call(kernel_wrap, grid_spec=grid_spec,
                            out_shape=out_shape, interpret=interpret)(*args)

    from .raster import _untile
    tyl = n_tiles // tiles_x
    u = [_untile(p, tiles_x, tyl) for p in planes]
    if planes_2d:
        # raw 2-D planes for the deferred-shade megakernel — avoids the
        # channel-last stacking relayouts entirely
        names = ["depth", "visf", "u", "v", "nx", "ny", "nz", "cr", "cg",
                 "cb", "em", "met", "rgh", "rfl", "alb"]
        if extended:
            names += ["mbase", "msize", "tanx", "tany", "tanz", "tanw",
                      "absorb"]
        return dict(zip(names, u))
    out = dict(
        depth=u[0], vis=jnp.round(u[1]).astype(jnp.int32),
        uv=jnp.stack([u[2], u[3]], -1),
        normal=jnp.stack([u[4], u[5], u[6]], -1),
        color=jnp.stack([u[7], u[8], u[9]], -1),
        emissive=u[10], metalness=u[11], roughness=u[12],
        reflectivity=u[13], albedo_id=jnp.round(u[14]).astype(jnp.int32),
    )
    if extended:
        out["matmap_base"] = jnp.round(u[15]).astype(jnp.int32)
        out["matmap_size"] = jnp.round(u[16]).astype(jnp.int32)
        out["tangent"] = jnp.stack([u[17], u[18], u[19], u[20]], -1)
        out["absorb"] = u[21]
    return out


DEPTH_TILES_PER_STEP = 16   # amortize per-grid-step latency: shadow
                            # bins are short, so step overhead dominates
DEPTH_PACK = 8              # triangles per 128-lane row (16 slots each)


def pack_tile_setup_depth(setup, bins, big_ids, ids=None):
    """Depth-only rows, 8 triangles packed per 128-lane row.

    Returns (n_tiles, E/8, 128) where lane r*16+j holds slot j of entry
    g*8+r — the kernel statically unrolls r, so every lane offset stays
    static (Mosaic forbids dynamic lane indexing).  8x less gather/DMA
    traffic than the 128-wide single-entry rows.
    """
    flat = setup["row16"]                             # (T, 16) prebuilt SoA

    if ids is None:
        ids = _entry_ids(bins, big_ids)               # (n_tiles, E)
    E = ids.shape[1]
    assert E % DEPTH_PACK == 0
    ok = ids >= 0
    rows = flat[jnp.maximum(ids, 0)] * ok[..., None]  # (n_tiles, E, 16)
    return rows.reshape(ids.shape[0], E // DEPTH_PACK, DEPTH_PACK * 16)


def _depth_kernel(counts_ref, rows_ref, depth_ref,
                  *, tiles_x, width, height, tiles_per_step,
                  szmax_ref=None):
    """Depth-only variant of _raster_kernel (shadow cascades): no
    barycentrics, no id plane, no per-triangle reciprocal; walks
    tiles_per_step consecutive tiles per grid step, DEPTH_PACK packed
    triangles per row group (static lane offsets, unrolled)."""
    i = pl.program_id(0)

    yy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
    # bigs occupy groups [0, ceil(big/P)); the bin segment starts at
    # group B/P and runs ceil(count/P) groups — zero rows in partially
    # filled groups fail the valid test (slot 12)
    P = DEPTH_PACK
    big_groups = (counts_ref[0] + (P - 1)) // P
    bin_group0 = counts_ref[1] // P

    for r in range(tiles_per_step):
        tile = i * tiles_per_step + r
        ty = tile // tiles_x
        tx = tile % tiles_x
        yn = (ty.astype(jnp.float32) * TILE_H + yy + 0.5) * (2.0 / height) - 1.0
        xn = (tx.astype(jnp.float32) * TILE_W + xx + 0.5) * (2.0 / width) - 1.0
        rows = rows_ref.at[r]

        def group_work(g, depth):
            for q in range(P):
                o = q * 16
                e0 = rows[g, o + 0] * xn + rows[g, o + 1] * yn + rows[g, o + 2]
                e1 = rows[g, o + 3] * xn + rows[g, o + 4] * yn + rows[g, o + 5]
                e2 = rows[g, o + 6] * xn + rows[g, o + 7] * yn + rows[g, o + 8]
                s = e0 + e1 + e2
                inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (s > 0) \
                    & (rows[g, o + 12] > 0) \
                    & (yn >= rows[g, o + 14]) & (yn < rows[g, o + 15])
                d = rows[g, o + 9] * xn + rows[g, o + 10] * yn + rows[g, o + 11]
                depth = jnp.where(inside & (d > depth) & (d <= 1.0), d, depth)
            return depth

        if szmax_ref is None:
            body, init = group_work, jnp.zeros((TILE_H, TILE_W), jnp.float32)
        else:
            def body(g, carry):            # early-z exit (see shade kernel)
                def work(c):
                    d_ = group_work(g, c[0])
                    return d_, jnp.min(d_)
                return jax.lax.cond(szmax_ref[0, g, r] > carry[1],
                                    work, lambda c: c, carry)
            init = (jnp.zeros((TILE_H, TILE_W), jnp.float32),
                    jnp.float32(0.0))
        count_groups = (counts_ref[2 + tile] + (P - 1)) // P
        depth = jax.lax.fori_loop(0, big_groups, body, init)
        depth = jax.lax.fori_loop(bin_group0, bin_group0 + count_groups,
                                  body, depth)
        depth_ref[r, :, :] = depth if szmax_ref is None else depth[0]


def raster_depth_pallas(setup, bins, big_ids, counts, tiles_x, tiles_y,
                        width, height, interpret=False, early_z=True,
                        bin_zub=None):
    """Depth-only pallas raster (shadow maps).  Returns (H, W) depth."""
    assert big_ids.shape[0] % DEPTH_PACK == 0
    ids = _entry_ids(bins, big_ids)
    rows = pack_tile_setup_depth(setup, bins, big_ids, ids=ids)
    n_groups = rows.shape[1]
    n_tiles = tiles_x * tiles_y
    R = DEPTH_TILES_PER_STEP
    while n_tiles % R:
        R //= 2
    B = big_ids.shape[0]
    big_count = jnp.sum(big_ids >= 0).astype(jnp.int32)
    trip = jnp.concatenate([big_count[None], jnp.int32(B)[None],
                            counts.astype(jnp.int32)])

    def kernel_wrap(counts_ref, rows_ref, *rest):
        szmax_ref = rest[0] if early_z else None
        _depth_kernel(counts_ref, rows_ref, rest[-1],
                      tiles_x=tiles_x, width=width, height=height,
                      tiles_per_step=R, szmax_ref=szmax_ref)

    in_specs = [pl.BlockSpec((R, n_groups, DEPTH_PACK * 16),
                             lambda i, *_: (i, 0, 0))]
    args = [trip, rows]
    if early_z:
        sz = (suffix_zbound_groups_banded(setup, big_ids, bin_zub, DEPTH_PACK)
              if bin_zub is not None
              else suffix_zbound_groups(setup, ids, DEPTH_PACK))
        szmax = _szmax_blocks(sz, R)
        args.append(szmax)                 # (n_steps, G8, 128), see above
        in_specs.append(pl.BlockSpec((1,) + szmax.shape[1:],
                                     lambda i, *_: (i, 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles // R,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((R, TILE_H, TILE_W), lambda i, *_: (i, 0, 0))],
    )
    out_shape = [jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32)]
    (planes,) = pl.pallas_call(kernel_wrap, grid_spec=grid_spec,
                               out_shape=out_shape, interpret=interpret)(
        *args)
    from .raster import _untile
    return _untile(planes, tiles_x, tiles_y)


# ---------------------------------------------------------------------------
# Weighted-blend OIT raster kernel (particles + translucent meshes).
#
# The XLA scan formulation carries the full-res accumulators through HBM
# on every one of its bin_capacity+big steps (~755 ms/frame at 1080p
# with a 4096-quad budget); here each tile's (acc rgb+w, reveal) lives
# in VMEM for the whole loop, same shape as the opaque raster kernel.
# ---------------------------------------------------------------------------

BLEND_PACK = 2        # triangles per 128-lane row (64 slots each)
# entry layout in its 64-slot half: [adj*sgn 0-8, zs 9-11, valid 12,
# uv 16-21 (3 corners x 2), rgba 22-33 (3 corners x 4), soft flag 34]


def pack_tile_blend(setup, bins, big_ids, tris, uv, color,
                    soft_flag=None, peel_flag=None):
    """soft_flag / peel_flag: optional per-TRIANGLE (T,) 0/1 f32 flags
    (row slots 34/35) for a merged stream mixing soft particles with
    depth-peeled translucent residual triangles in ONE kernel walk."""
    row16 = setup["row16"]                            # (T, 16)
    T = row16.shape[0]
    uv_t = uv[tris].reshape(-1, 6)
    c_t = color[tris].reshape(-1, 12)
    flat = jnp.concatenate([
        row16, uv_t, c_t,
        (jnp.zeros((T, 1), jnp.float32) if soft_flag is None
         else soft_flag[:, None].astype(jnp.float32)),
        (jnp.zeros((T, 1), jnp.float32) if peel_flag is None
         else peel_flag[:, None].astype(jnp.float32)),
        jnp.zeros((T, 64 - 36), jnp.float32),
    ], axis=-1)                                       # (T, 64)
    ids = jnp.concatenate(
        [jnp.broadcast_to(big_ids[None, :], (bins.shape[0], big_ids.shape[0])),
         bins], axis=1)
    E = ids.shape[1]
    assert E % BLEND_PACK == 0
    ok = (ids >= 0)[..., None]
    rows = flat[jnp.maximum(ids, 0)] * ok
    return rows.reshape(ids.shape[0], E // BLEND_PACK, BLEND_PACK * 64)


def _blend_kernel(tile_ids_ref, counts_ref, rows_ref, od_ref,
                  ar_ref, ag_ref, ab_ref, aw_ref, rv_ref,
                  *, tiles_x, width, height, soft, peel_ref=None):
    i = pl.program_id(0)
    tile = tile_ids_ref[i]             # global tile id (sharded bands)
    ty = tile // tiles_x
    tx = tile % tiles_x
    yy = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32)
    yn = (ty * TILE_H + yy + 0.5) * (2.0 / height) - 1.0
    xn = (tx * TILE_W + xx + 0.5) * (2.0 / width) - 1.0
    od = od_ref[...]
    peel = None if peel_ref is None else peel_ref[...]

    P = BLEND_PACK
    big_groups = (counts_ref[0] + (P - 1)) // P
    bin_group0 = counts_ref[1] // P
    rows = rows_ref

    def body(g, carry):
        ar, ag, ab, aw, rv = carry
        for q in range(P):
            o = q * 64
            e0 = rows[g, o + 0] * xn + rows[g, o + 1] * yn + rows[g, o + 2]
            e1 = rows[g, o + 3] * xn + rows[g, o + 4] * yn + rows[g, o + 5]
            e2 = rows[g, o + 6] * xn + rows[g, o + 7] * yn + rows[g, o + 8]
            s = e0 + e1 + e2
            inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (s > 0) \
                & (rows[g, o + 12] > 0)
            d = rows[g, o + 9] * xn + rows[g, o + 10] * yn + rows[g, o + 11]
            visible = inside & (d > od) & (d <= 1.0)
            if peel is not None:
                # depth-peel residual: only fragments strictly farther
                # than the last LIT translucent layer accumulate here.
                # per_tri mode: row slot 35 flags which triangles peel
                # (merged particle+translucent streams share one walk)
                if soft == "per_tri":
                    visible = visible & ((d < peel)
                                         | (rows[g, o + 35] <= 0))
                else:
                    visible = visible & (d < peel)
            inv = 1.0 / jnp.where(s == 0, 1.0, s)
            l0 = e0 * inv
            l1 = e1 * inv
            l2 = 1.0 - l0 - l1
            cr = rows[g, o + 22] * l0 + rows[g, o + 26] * l1 + rows[g, o + 30] * l2
            cg = rows[g, o + 23] * l0 + rows[g, o + 27] * l1 + rows[g, o + 31] * l2
            cb = rows[g, o + 24] * l0 + rows[g, o + 28] * l1 + rows[g, o + 32] * l2
            ca = rows[g, o + 25] * l0 + rows[g, o + 29] * l1 + rows[g, o + 33] * l2
            if soft:
                u = rows[g, o + 16] * l0 + rows[g, o + 18] * l1 + rows[g, o + 20] * l2
                v = rows[g, o + 17] * l0 + rows[g, o + 19] * l1 + rows[g, o + 21] * l2
                r2 = (2 * u - 1) ** 2 + (2 * v - 1) ** 2
                falloff = jnp.clip(1.0 - r2, 0.0, 1.0)
                if soft == "per_tri":  # slot 34 flags soft triangles
                    falloff = jnp.where(rows[g, o + 34] > 0, falloff, 1.0)
                ca = ca * falloff
            alpha = jnp.where(visible, ca, 0.0)
            # oit_weight(d) without pow: ((1-d)*5)^3 via multiplies
            b_ = (1.0 - d) * 5.0
            wgt = jnp.clip(10.0 / (1e-5 + b_ * b_ * b_), 0.01, 300.0) * alpha
            ar = ar + cr * wgt
            ag = ag + cg * wgt
            ab = ab + cb * wgt
            aw = aw + wgt
            rv = rv * (1.0 - alpha)
        return (ar, ag, ab, aw, rv)

    zeros = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    init = (zeros, zeros, zeros, zeros, zeros + 1.0)
    count_groups = (counts_ref[2 + i] + (P - 1)) // P
    carry = jax.lax.fori_loop(0, big_groups, body, init)
    out = jax.lax.fori_loop(bin_group0, bin_group0 + count_groups, body, carry)
    for ref, val in zip((ar_ref, ag_ref, ab_ref, aw_ref, rv_ref), out):
        ref[...] = val


def raster_blend_pallas(setup, bins, big_ids, counts, tris, uv, color,
                        opaque_depth, tiles_x, tiles_y, width, height,
                        soft=True, interpret=False, planes=False,
                        tile_ids=None, peel_depth=None,
                        soft_flag=None, peel_flag=None):
    """Pallas WBOIT accumulation.  Returns (accum (H,W,4), reveal (H,W)),
    or the five raw planes (ar, ag, ab, aw, reveal) with planes=True.

    tile_ids: global tile of each bins row (1:1); the sharded path
    passes its band's ids, band-local bins and a band-local
    opaque_depth — outputs are band-local too.

    peel_depth: optional (local_H, W) reverse-Z depth — only fragments
    strictly FARTHER than it accumulate (the unlit residual behind the
    lit translucent layers).

    soft='per_tri' with soft_flag/peel_flag (T,) merges streams with
    different blend behavior (soft particles + peeled translucents)
    into ONE setup/bin/walk — one kernel launch instead of two.
    """
    assert big_ids.shape[0] % BLEND_PACK == 0
    rows = pack_tile_blend(setup, bins, big_ids, tris, uv, color,
                           soft_flag=soft_flag, peel_flag=peel_flag)
    n_groups = rows.shape[1]
    if tile_ids is None:
        tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    n_tiles = tile_ids.shape[0]
    assert rows.shape[0] == n_tiles, (rows.shape, n_tiles)
    local_ty = n_tiles // tiles_x
    big_count = jnp.sum(big_ids >= 0).astype(jnp.int32)
    trip = jnp.concatenate([big_count[None],
                            jnp.int32(big_ids.shape[0])[None],
                            counts.astype(jnp.int32)])
    has_peel = peel_depth is not None

    def wrap(tile_ids_ref, counts_ref, rows_ref, od_ref, *rest):
        if has_peel:
            peel_ref, outs = rest[0], rest[1:]
        else:
            peel_ref, outs = None, rest
        _blend_kernel(tile_ids_ref, counts_ref, rows_ref.at[0], od_ref,
                      *outs,
                      tiles_x=tiles_x, width=width, height=height, soft=soft,
                      peel_ref=peel_ref)

    tile_spec = pl.BlockSpec((TILE_H, TILE_W),
                             lambda i, *_: (i // tiles_x, i % tiles_x))
    in_specs = [
        pl.BlockSpec((1, n_groups, BLEND_PACK * 64),
                     lambda i, *_: (i, 0, 0)),
        tile_spec,
    ]
    args = [tile_ids, trip, rows, opaque_depth]
    if has_peel:
        in_specs.append(tile_spec)
        args.append(peel_depth)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[tile_spec for _ in range(5)],
    )
    out_shape = [jax.ShapeDtypeStruct((local_ty * TILE_H, tiles_x * TILE_W),
                                      jnp.float32) for _ in range(5)]
    ar, ag, ab, aw, rv = pl.pallas_call(
        wrap, grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
    )(*args)
    if planes:
        return ar, ag, ab, aw, rv
    return jnp.stack([ar, ag, ab, aw], axis=-1), rv


# ---------------------------------------------------------------------------
# v3: MXU-formulated raster — triangle chunks as matmuls.
#
# The v2 loop pays hundreds of cycles per triangle in dynamic scalar
# loads.  v3 processes V3_CHUNK triangles at once: edge/depth/scissor
# values for all (triangle, pixel) pairs come from ONE dot_general of a
# transposed coefficient block against a per-pixel basis matrix; the
# depth test reduces across the chunk with max + first-match one-hot;
# the winner's per-vertex attributes come from ONE one-hot matmul.
# Every memory access is an aligned vector slice.
# ---------------------------------------------------------------------------

V3_CHUNK = 128                # lane slices must be 128-aligned (Mosaic)
V3_HALF = TILE_H // 2         # tile processed as two 16-row halves: the
V3_PIX = V3_HALF * TILE_W     # full-tile E6 (CHUNK, 6*4096) f32 blew the
                              # 16M scoped-vmem limit by 124K; half-tile
                              # blocks of 2048 pixels fit comfortably
N_COEF = 24                   # 6 groups x 3 rows: e0 e1 e2 d scis_lo scis_hi
N_ATTR = 32


def pack_v3(setup, bins, big_ids, tris, uv, normal, tri_material, materials):
    """Transposed per-tile blocks: coefT (n_tiles, 24, E), attrT
    (n_tiles, 32, E)."""
    adj, det, zc = setup["adj"], setup["det"], setup["zc"]
    ez = adj * (zc[:, :, None] / det[:, None, None])
    zs = ez.sum(axis=1)
    sgn = jnp.sign(det)
    T = adj.shape[0]
    ylim = setup.get("ylim")
    if ylim is None:
        ylim = jnp.broadcast_to(jnp.array([-8.0, 8.0], jnp.float32), (T, 2))
    zero = jnp.zeros((T, 1), jnp.float32)
    one = jnp.ones((T, 1), jnp.float32)
    coef = jnp.concatenate([
        adj.reshape(-1, 9) * sgn[:, None],                  # rows 0..8
        zs,                                                 # rows 9..11 (d)
        zero, one, -ylim[:, 0:1],                           # rows 12..14 e3
        zero, -one, ylim[:, 1:2],                           # rows 15..17 e4
        jnp.zeros((T, N_COEF - 18), jnp.float32),
    ], axis=-1)                                             # (T, 24)

    uv_t = uv[tris].reshape(-1, 6)
    n_t = normal[tris].reshape(-1, 9)
    mat = tri_material
    mrows = jnp.concatenate([
        materials["color"][mat][:, :3],
        materials["emissive"][mat][:, None],
        materials["metalness"][mat][:, None],
        materials["roughness"][mat][:, None],
        materials["reflectivity"][mat][:, None],
        materials["albedomap"][mat][:, None].astype(jnp.float32),
    ], axis=-1)                                             # (T, 8)
    attr = jnp.concatenate([
        uv_t, n_t,
        jnp.zeros((T, 1), jnp.float32),                     # row 15: tri id
        mrows,
        jnp.zeros((T, N_ATTR - 24), jnp.float32),
    ], axis=-1)                                             # (T, 32)

    ids = jnp.concatenate(
        [jnp.broadcast_to(big_ids[None, :], (bins.shape[0], big_ids.shape[0])),
         bins], axis=1)
    ok = (ids >= 0)
    t = jnp.maximum(ids, 0)
    coefT = (coef[t] * ok[..., None]).transpose(0, 2, 1)    # (n_tiles, 24, E)
    attrG = attr[t] * ok[..., None]
    attrG = attrG.at[..., 15].set(ids.astype(jnp.float32))
    attrT = attrG.transpose(0, 2, 1)                        # (n_tiles, 32, E)
    return coefT, attrT


def _v3_kernel(tile_ids_ref, counts_ref, coefT_ref, attrT_ref, out_refs,
               *, tiles_x, width, height, n_entries):
    i = pl.program_id(0)
    tile = tile_ids_ref[i]
    ty = tile // tiles_x
    tx = tile % tiles_x
    n_chunks = n_entries // V3_CHUNK
    count = counts_ref[1] + counts_ref[2 + i]   # big slots + tile bins

    for half in range(TILE_H // V3_HALF):
        _v3_half(half, ty, tx, count, n_chunks, coefT_ref, attrT_ref,
                 out_refs, width=width, height=height)


def _v3_half(half, ty, tx, count, n_chunks, coefT_ref, attrT_ref, out_refs,
             *, width, height):
    yy = jax.lax.broadcasted_iota(jnp.int32, (V3_HALF, TILE_W), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (V3_HALF, TILE_W), 1).astype(jnp.float32)
    yn_t = (ty.astype(jnp.float32) * TILE_H + half * V3_HALF + yy + 0.5) * (2.0 / height) - 1.0
    xn_t = (tx.astype(jnp.float32) * TILE_W + xx + 0.5) * (2.0 / width) - 1.0
    xn = xn_t.reshape(1, V3_PIX)
    yn = yn_t.reshape(1, V3_PIX)
    one = jnp.ones_like(xn)
    basis = jnp.concatenate([xn, yn, one], axis=0)          # (3, PIX)

    # P24: column group g activates coefficient rows 3g..3g+2
    # (static construction — Mosaic lacks dynamic_update_slice)
    blocks = []
    for g in range(6):
        parts = []
        if g:
            parts.append(jnp.zeros((3 * g, V3_PIX), jnp.float32))
        parts.append(basis)
        if N_COEF - 3 * g - 3:
            parts.append(jnp.zeros((N_COEF - 3 * g - 3, V3_PIX), jnp.float32))
        blocks.append(jnp.concatenate(parts, axis=0))
    P = jnp.concatenate(blocks, axis=1)

    def chunk_step(c, carry):
        best_d, best = carry                                # (1,PIX),(15,PIX)
        C = coefT_ref[:, pl.ds(c * V3_CHUNK, V3_CHUNK)]     # (24, CHUNK)
        A = attrT_ref[:, pl.ds(c * V3_CHUNK, V3_CHUNK)]     # (32, CHUNK)
        active = ((jax.lax.broadcasted_iota(jnp.int32, (V3_CHUNK, 1), 0)
                   + c * V3_CHUNK) < count)

        E6 = jax.lax.dot_general(C, P, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # (CHUNK, 6*PIX)
        e0 = E6[:, 0 * V3_PIX:1 * V3_PIX]
        e1 = E6[:, 1 * V3_PIX:2 * V3_PIX]
        e2 = E6[:, 2 * V3_PIX:3 * V3_PIX]
        d = E6[:, 3 * V3_PIX:4 * V3_PIX]
        s3 = E6[:, 4 * V3_PIX:5 * V3_PIX]
        s4 = E6[:, 5 * V3_PIX:6 * V3_PIX]
        s = e0 + e1 + e2
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (s > 0) & active
        inside = inside & (s3 >= 0) & (s4 > 0)
        valid = inside & (d > best_d) & (d <= 1.0)
        score = jnp.where(valid, d, -1.0)

        cmax = jnp.max(score, axis=0, keepdims=True)        # (1, PIX)
        hit = (score == cmax) & (cmax > 0)
        # first-match tie-break without cumsum (unsupported in Mosaic):
        # lowest row index among hits
        ridx = jax.lax.broadcasted_iota(jnp.int32, (V3_CHUNK, V3_PIX), 0)
        fid = jnp.min(jnp.where(hit, ridx, V3_CHUNK + 1), axis=0, keepdims=True)
        first = hit & (ridx == fid)
        oh = first.astype(jnp.float32)

        inv_s = 1.0 / jnp.where(s == 0.0, 1.0, s)
        l0 = jnp.sum(e0 * inv_s * oh, axis=0, keepdims=True)
        l1 = jnp.sum(e1 * inv_s * oh, axis=0, keepdims=True)
        l2 = 1.0 - l0 - l1

        WA = jax.lax.dot_general(A, oh, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # (32, PIX): winner's per-vertex/per-tri values
        u = WA[0:1] * l0 + WA[2:3] * l1 + WA[4:5] * l2
        v = WA[1:2] * l0 + WA[3:4] * l1 + WA[5:6] * l2
        nx = WA[6:7] * l0 + WA[9:10] * l1 + WA[12:13] * l2
        ny = WA[7:8] * l0 + WA[10:11] * l1 + WA[13:14] * l2
        nz = WA[8:9] * l0 + WA[11:12] * l1 + WA[14:15] * l2

        won = cmax > 0
        tri_id = jnp.where(won, WA[15:16], best[1:2])
        new = jnp.concatenate([cmax, tri_id, u, v, nx, ny, nz,
                               WA[16:24]], axis=0)          # (15, PIX)
        best = jnp.where(won, new, best)
        best_d = jnp.where(won, cmax, best_d)
        return best_d, best

    init_d = jnp.zeros((1, V3_PIX), jnp.float32)
    init_b = jnp.concatenate([
        jnp.zeros((1, V3_PIX), jnp.float32),
        jnp.full((1, V3_PIX), -1.0, jnp.float32),
        jnp.zeros((13, V3_PIX), jnp.float32)], axis=0)
    best_d, best = jax.lax.fori_loop(0, n_chunks, chunk_step, (init_d, init_b))
    r0, r1 = half * V3_HALF, (half + 1) * V3_HALF
    out_refs[0][r0:r1, :] = best_d.reshape(V3_HALF, TILE_W)
    for j in range(1, 15):
        out_refs[j][r0:r1, :] = best[j:j + 1].reshape(V3_HALF, TILE_W)


def raster_shade_mxu(setup, bins, big_ids, counts, tris, uv, normal,
                     tri_material, materials, tiles_x, tiles_y, width, height,
                     tile_ids=None, interpret=False):
    """MXU raster+shade.  Same contract as raster_shade_pallas."""
    coefT, attrT = pack_v3(setup, bins, big_ids, tris, uv, normal,
                           tri_material, materials)
    E = coefT.shape[2]
    pad = (-E) % V3_CHUNK
    if pad:
        coefT = jnp.pad(coefT, ((0, 0), (0, 0), (0, pad)))
        attrT = jnp.pad(attrT, ((0, 0), (0, 0), (0, pad)))
    n_entries = coefT.shape[2]

    if tile_ids is None:
        tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    else:
        coefT = coefT[tile_ids]
        attrT = attrT[tile_ids]
        counts = counts[tile_ids]
    n_tiles = tile_ids.shape[0]
    B = big_ids.shape[0]
    trip = jnp.concatenate([jnp.sum(big_ids >= 0).astype(jnp.int32)[None],
                            jnp.int32(B)[None], counts.astype(jnp.int32)])

    N_OUT = 15

    def kernel_wrap(tile_ids_ref, counts_ref, coefT_ref, attrT_ref, *outs):
        _v3_kernel(tile_ids_ref, counts_ref, coefT_ref.at[0], attrT_ref.at[0],
                   [o.at[0] for o in outs], tiles_x=tiles_x, width=width,
                   height=height, n_entries=n_entries)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, N_COEF, n_entries), lambda i, *_: (i, 0, 0)),
                  pl.BlockSpec((1, N_ATTR, n_entries), lambda i, *_: (i, 0, 0))],
        out_specs=[pl.BlockSpec((1, TILE_H, TILE_W), lambda i, *_: (i, 0, 0))
                   for _ in range(N_OUT)],
    )
    out_shape = [jax.ShapeDtypeStruct((n_tiles, TILE_H, TILE_W), jnp.float32)
                 for _ in range(N_OUT)]
    planes = pl.pallas_call(kernel_wrap, grid_spec=grid_spec,
                            out_shape=out_shape, interpret=interpret)(
        tile_ids, trip, coefT, attrT)

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
