"""Visibility-buffer rasterizer: setup -> bin -> raster -> resolve.

TPU re-design of the reference's raster pipeline (reference: the
prepass/geometry passes of src/renderer/renderer.cpp:6498-6540 plus the
*.prepass.vert / geometry.frag programs).  Instead of a hardware raster
pipe we use 2D-homogeneous (Olano-Greer) edge functions:

    M  = [[x0, x1, x2], [y0, y1, y2], [w0, w1, w2]]   (clip coords)
    e  = adj(M) @ (x_ndc, y_ndc, 1)
    inside        <=> all e_i >= 0  (or all <= 0 for the other winding)
    lambda_i      =  e_i / sum(e)          (perspective-correct barys)
    depth (z/w)   =  sum(e_i * z_i) / det  (since sum(e_i * w_i) == det)

No near-plane clipping is ever needed — triangles crossing w=0
rasterize correctly, and behind-eye coverage is rejected by the
depth-range test (reverse-Z keeps visible depth in (0, 1]).

The raster stage emits only (depth, triangle id) per pixel; attribute
interpolation happens in a dense deferred resolve pass (gather by id,
re-evaluate e) — scatter state stays minimal, everything else is
data-parallel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .common import TILE_H, TILE_W, FrameConfig

BIN_MAX_SPAN = 16  # max tiles a binned triangle may cover; larger -> big list


def adjugate3(m):
    """Adjugate of (..., 3, 3) matrices: adj(M) @ M = det(M) * I."""
    a = m
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    # adjugate = transposed cofactors; rows are the edge-coefficient vectors
    return jnp.stack(
        [jnp.stack([c00, c10, c20], -1),
         jnp.stack([c01, c11, c21], -1),
         jnp.stack([c02, c12, c22], -1)], axis=-2)


def triangle_setup_comps(comps, shared, width, height, tiles_x, tiles_y,
                         tri_valid=None, cull=0, max_span=BIN_MAX_SPAN,
                         ylim=None):
    """SoA triangle setup core.

    comps: dict of (T,) f32 arrays x0,y0,z0,w0,x1,...,w2 (clip coords per
    corner); shared: (T,) bool degenerate-id mask.  All math runs on
    (T,)-shaped arrays so the triangle count rides the 128-lane axis —
    the (T,3,3) AoS formulation wastes 125/128 lanes per op and measured
    ~3 ms at T=131k (profiling/prof_shadow3.py).

    Returns the setup dict: SoA fields bbox_soa (tx0,ty0,tx1,ty1),
    valid/big (T,), row16 (T,16) packed kernel rows, plus AoS adj/det/zc
    (one stack each) for the XLA fallback/resolve consumers.
    """
    x0, y0, z0, w0 = comps["x0"], comps["y0"], comps["z0"], comps["w0"]
    x1, y1, z1, w1 = comps["x1"], comps["y1"], comps["z1"], comps["w1"]
    x2, y2, z2, w2 = comps["x2"], comps["y2"], comps["z2"], comps["w2"]

    # adjugate of M = [[x0,x1,x2],[y0,y1,y2],[w0,w1,w2]]: row k of adj is
    # the edge-coefficient vector of edge k (cofactors, transposed)
    a00 = y1 * w2 - w1 * y2
    a01 = w1 * x2 - x1 * w2
    a02 = x1 * y2 - y1 * x2
    a10 = w0 * y2 - y0 * w2
    a11 = x0 * w2 - w0 * x2
    a12 = y0 * x2 - x0 * y2
    a20 = y0 * w1 - w0 * y1
    a21 = w0 * x1 - x0 * w1
    a22 = x0 * y1 - y0 * x1
    det = x0 * a00 + y0 * a01 + w0 * a02

    # conservative frustum reject: all vertices outside one clip plane
    out = (((x0 > w0) & (x1 > w1) & (x2 > w2))
           | ((x0 < -w0) & (x1 < -w1) & (x2 < -w2))
           | ((y0 > w0) & (y1 > w1) & (y2 > w2))
           | ((y0 < -w0) & (y1 < -w1) & (y2 < -w2))
           | ((z0 < 0) & (z1 < 0) & (z2 < 0))
           | ((z0 > w0) & (z1 > w1) & (z2 > w2)))
    # relative degeneracy test: a zero-area triangle (e.g. lat-long
    # sphere pole quads whose corners coincide in POSITION but not id)
    # has true det == 0 but f32 rounding noise ~eps * sum|terms| — an
    # absolute epsilon lets the noise pick a random winding and the
    # "sliver" can cover half the screen when an edge row collapses to
    # -0.  Anything under 64 ulps of the term magnitude is sub-pixel.
    det_mag = (jnp.abs(x0 * a00) + jnp.abs(y0 * a01) + jnp.abs(w0 * a02))
    degenerate = shared | (jnp.abs(det) <= 64.0 * 1.1920929e-07 * det_mag)
    valid = ~(out | degenerate)
    if cull > 0:
        valid = valid & (det > 0)
    elif cull < 0:
        valid = valid & (det < 0)
    if tri_valid is not None:
        valid = valid & tri_valid

    # screen bbox (only meaningful when all w comfortably positive)
    w_ok = (w0 > 1e-6) & (w1 > 1e-6) & (w2 > 1e-6)
    iw0 = 1.0 / jnp.where(w_ok, w0, 1.0)
    iw1 = 1.0 / jnp.where(w_ok, w1, 1.0)
    iw2 = 1.0 / jnp.where(w_ok, w2, 1.0)
    sx0, sx1, sx2 = x0 * iw0, x1 * iw1, x2 * iw2
    sy0, sy1, sy2 = y0 * iw0, y1 * iw1, y2 * iw2
    sxmin = (jnp.minimum(jnp.minimum(sx0, sx1), sx2) * 0.5 + 0.5) * width
    sxmax = (jnp.maximum(jnp.maximum(sx0, sx1), sx2) * 0.5 + 0.5) * width
    symin = (jnp.minimum(jnp.minimum(sy0, sy1), sy2) * 0.5 + 0.5) * height
    symax = (jnp.maximum(jnp.maximum(sy0, sy1), sy2) * 0.5 + 0.5) * height
    tx0 = jnp.clip(jnp.floor(sxmin / TILE_W).astype(jnp.int32), 0, tiles_x - 1)
    tx1 = jnp.clip(jnp.floor(sxmax / TILE_W).astype(jnp.int32), 0, tiles_x - 1)
    ty0 = jnp.clip(jnp.floor(symin / TILE_H).astype(jnp.int32), 0, tiles_y - 1)
    ty1 = jnp.clip(jnp.floor(symax / TILE_H).astype(jnp.int32), 0, tiles_y - 1)

    onscreen = (sxmax >= 0) & (sxmin < width) & (symax >= 0) & (symin < height)
    valid = valid & (w_ok & onscreen | ~w_ok)

    span = (tx1 - tx0 + 1) * (ty1 - ty0 + 1)
    big = valid & (~w_ok | (span > max_span))
    binned = valid & ~big

    # depth-plane coefficients: depth = sum_k e_k * z_k / det
    idet = 1.0 / jnp.where(jnp.abs(det) < 1e-30, 1.0, det)
    zs0 = (a00 * z0 + a10 * z1 + a20 * z2) * idet
    zs1 = (a01 * z0 + a11 * z1 + a21 * z2) * idet
    zs2 = (a02 * z0 + a12 * z1 + a22 * z2) * idet
    sgn = jnp.sign(det)
    if ylim is None:
        ylo = jnp.full_like(det, -8.0)
        yhi = jnp.full_like(det, 8.0)
    else:
        ylo, yhi = ylim
        ylo = jnp.broadcast_to(ylo, det.shape)
        yhi = jnp.broadcast_to(yhi, det.shape)
    val_f = valid | big   # kernel-visible validity (slot 12)
    # packed kernel row: [adj*sgn 0-8, zs 9-11, valid 12, tri-id 13 (set
    # by the packers), ylim 14-15] — ONE stack relayout instead of
    # re-deriving from (T,3,3) AoS in every pack_tile_setup_*
    row16 = jnp.stack([
        a00 * sgn, a01 * sgn, a02 * sgn,
        a10 * sgn, a11 * sgn, a12 * sgn,
        a20 * sgn, a21 * sgn, a22 * sgn,
        zs0, zs1, zs2,
        val_f.astype(jnp.float32), jnp.zeros_like(det), ylo, yhi,
    ], axis=-1)

    adj = jnp.stack([
        jnp.stack([a00, a01, a02], -1),
        jnp.stack([a10, a11, a12], -1),
        jnp.stack([a20, a21, a22], -1)], axis=-2)     # (T, 3, 3)
    zc = jnp.stack([z0, z1, z2], -1)

    # conservative screen-depth upper bound: inside a w>0 triangle the
    # interpolated z/w is a convex combination of the vertex z/w, so
    # d <= max_i(z_i/w_i) in exact arithmetic.  The kernel evaluates d
    # through the adjugate depth plane, whose f32 rounding can land a
    # few ulps above this bound — pad by ~32 ulps relative so the
    # early-z skip stays conservative under rounding (fragments beyond
    # that slop are degenerate-sliver z-fights).  Behind-eye (w<=0)
    # triangles get the max bound 1.0 (never skipped).
    zb = jnp.maximum(jnp.maximum(z0 * iw0, z1 * iw1), z2 * iw2)
    zb = zb + jnp.abs(zb) * 4e-6 + 1e-9
    # non-finite guard: a NaN bound would poison the suffix-max chain
    # (NaN > x is False -> groups wrongly skipped); degenerate geometry
    # gets the safe bound 1.0 instead
    zbound = jnp.where(w_ok & jnp.isfinite(zb), jnp.clip(zb, 0.0, 1.0), 1.0)

    return dict(
        adj=adj, det=det, zc=zc, row16=row16, zmax=jnp.maximum(
            jnp.maximum(z0, z1), z2),
        zbound=zbound,
        bbox_soa=(tx0, ty0, tx1, ty1),
        tile_bbox=jnp.stack([tx0, ty0, tx1, ty1], axis=-1),
        valid=binned, big=big,
    )


def triangle_setup(clip, tris, width, height, tiles_x, tiles_y, tri_valid=None,
                   cull=0, max_span=BIN_MAX_SPAN, ylim=None):
    """Per-triangle raster setup (row-gather wrapper over the SoA core).

    clip: (V, 4) clip positions; tris: (T, 3) int32 vertex ids
    (padding triangles use [0,0,0] -> zero area -> culled);
    cull: 0 = two-sided, +1 = cull det<0 backfaces, -1 = cull det>0.
    """
    v0 = clip[tris[:, 0]].T                         # (4, T): one relayout
    v1 = clip[tris[:, 1]].T
    v2 = clip[tris[:, 2]].T
    comps = dict(x0=v0[0], y0=v0[1], z0=v0[2], w0=v0[3],
                 x1=v1[0], y1=v1[1], z1=v1[2], w1=v1[3],
                 x2=v2[0], y2=v2[1], z2=v2[2], w2=v2[3])
    shared = ((tris[:, 0] == tris[:, 1]) | (tris[:, 1] == tris[:, 2])
              | (tris[:, 0] == tris[:, 2]))
    return triangle_setup_comps(comps, shared, width, height, tiles_x,
                                tiles_y, tri_valid=tri_valid, cull=cull,
                                max_span=max_span, ylim=ylim)


def bin_triangles(setup, n_tris, tiles_x, tiles_y, bin_capacity, big_capacity,
                  max_span=BIN_MAX_SPAN, return_overflow=False,
                  depth_prio=None, return_zub=False, tri_block=None):
    """Build per-tile triangle lists via pair-expansion + sort.

    Each binned triangle emits up to max_span (tile, tri) pairs over
    its tile bbox; pairs sort by tile and each tile gathers its segment
    (capacity bin_capacity).  Unbounded triangles go to a shared 'big'
    list every tile also walks.  Replaces the scatter/atomic pattern a
    GPU would use with sort+searchsorted, which XLA executes well.

    depth_prio: optional (T,) reverse-Z depth in [0, 1].  When given, a
    4-bit near-first depth band rides the sort key, so a saturated bin
    keeps the NEAREST triangles — overflow then only drops triangles
    that are occluded anyway (used by the shadow cascades, where hot
    far-cascade tiles can hold thousands of sub-texel triangles).
    Costs 4 tri-id bits: T <= 2^17.

    tri_block: optional (n_blocks, tiles_per_block) for stacked-atlas
    streams (the shadow cascade stack): triangle ids are laid out as
    block b owning ids [b*T/n_blocks, (b+1)*T/n_blocks) and tiles
    [b*tiles_per_block, ...), and a triangle only ever bins into its
    own block's tiles.  The sort key then packs tri % (T/n_blocks) —
    log2(n_blocks) fewer key bits — and the block id is recovered from
    the tile at unpack.  Keeps depth-prio binning viable at stress
    scale (4 cascades x 256k casters needed 20 tri bits otherwise).
    """
    n_tiles = tiles_x * tiles_y
    if "bbox_soa" in setup:
        tx0, ty0, tx1, ty1 = setup["bbox_soa"]
    else:
        bbox = setup["tile_bbox"]
        tx0, ty0, tx1, ty1 = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    T = n_tris
    T_local = T
    if tri_block is not None:
        n_blocks, tiles_per_block = tri_block
        assert T % n_blocks == 0 and n_tiles == n_blocks * tiles_per_block
        assert tiles_per_block % tiles_x == 0
        T_local = T // n_blocks
        # clamp each triangle's pair rows to ITS block's tile rows: a
        # bbox spilling into the neighbor band would mis-unpack there
        # (and the raster scissors those pixels out anyway, so the
        # clamp changes nothing in the output)
        rows_per_block = tiles_per_block // tiles_x
        blk = jnp.arange(T, dtype=jnp.int32) // T_local
        lo = blk * rows_per_block
        hi = lo + rows_per_block - 1
        ty0 = jnp.clip(ty0, lo, hi)
        ty1 = jnp.clip(ty1, lo, hi)
    span_w = tx1 - tx0 + 1
    span = span_w * (ty1 - ty0 + 1)

    # pair expansion TRANSPOSED (span, T): T rides the 128-lane axis —
    # the (T, span) layout wastes (128 - span) lanes per op
    k = jnp.arange(max_span, dtype=jnp.int32)[:, None]               # (S, 1)
    kx = k % span_w[None, :]
    ky = k // span_w[None, :]
    tile = (ty0[None, :] + ky) * tiles_x + (tx0[None, :] + kx)       # (S, T)
    pair_ok = setup["valid"][None, :] & (k < span[None, :])
    tile = jnp.where(pair_ok, tile, n_tiles)                          # sentinel

    # pack (tile[, depth band], tri) into one 32-bit key: a single-array
    # sort moves half the data of an argsort+gather and stays in draw
    # order per tile (per band when depth_prio is on).  Bit widths are
    # sized to the actual tile/triangle capacities; int32 while the key
    # fits in 31 bits, uint32 when it needs all 32.
    tile_bits = max(int(n_tiles).bit_length(), 1)   # sentinel n_tiles fits
    tri_bits = max(int(T_local - 1).bit_length(), 1)
    if depth_prio is None:
        dq_bits = 0
    else:
        dq_bits = min(4, 32 - tile_bits - tri_bits)
        assert dq_bits >= 2, (
            f"depth-prio binning needs >=2 spare key bits: "
            f"{n_tiles} tiles ({tile_bits}b) + {T} tris ({tri_bits}b)")
    total_bits = tile_bits + dq_bits + tri_bits
    assert total_bits <= 32, (
        f"bin sort key overflow: {n_tiles} tiles ({tile_bits}b) + "
        f"{T} tris ({tri_bits}b) + {dq_bits} depth bits > 32")
    key_dtype = jnp.int32 if total_bits <= 31 else jnp.uint32
    shift = dq_bits + tri_bits

    tri_arange = jnp.arange(T, dtype=jnp.int32)
    if tri_block is not None:
        tri_arange = tri_arange % T_local
    tri_ids = jnp.broadcast_to(tri_arange[None, :],
                               tile.shape).astype(key_dtype)
    key = (tile.astype(key_dtype) << shift) | tri_ids
    if depth_prio is not None:
        levels = (1 << dq_bits) - 1
        dq = jnp.clip(((1.0 - depth_prio) * levels).astype(jnp.int32),
                      0, levels)
        dq = jnp.broadcast_to(dq[None, :], tile.shape).astype(key_dtype)
        key = key | (dq << tri_bits)
    skey = jnp.sort(key.reshape(-1))
    sorted_tile = (skey >> shift).astype(jnp.int32)

    L = sorted_tile.shape[0]
    if (n_tiles + 1) * L <= (1 << 28):
        # starts[t] = #{keys < t} as a dense broadcast-compare reduce:
        # XLA lowers searchsorted to a serial while loop (~0.5 ms/frame
        # across the frame's binning calls on v5e; cf. _bucketize in
        # render/frame.py).  Guarded by output size — the stress-scale
        # shadow stacks (4k tiles x 1M pair rows) stay on searchsorted.
        starts = jnp.sum(sorted_tile[None, :]
                         < jnp.arange(n_tiles + 1, dtype=jnp.int32)[:, None],
                         axis=1).astype(jnp.int32)
    else:
        starts = jnp.searchsorted(sorted_tile,
                                  jnp.arange(n_tiles + 1, dtype=jnp.int32))
    raw_counts = starts[1:] - starts[:-1]
    counts = jnp.minimum(raw_counts, bin_capacity)

    # contiguous-run gather as aligned 8-wide rows + a lane realign:
    # each tile's entries are CONSECUTIVE in skey (sorted by tile), so
    # fetching ceil((capacity+7)/8) aligned rows of 8 per tile and
    # shifting by starts % 8 replaces the (n_tiles x capacity)
    # per-element gather — the TPU gather engine is per-ROW (~150 M
    # rows/s for element fetches), so ~8x fewer rows is a direct win;
    # the 8-way shift-select below is exact (bit-identical keys)
    L = skey.shape[0]
    if L % 8:
        skey = jnp.concatenate(
            [skey, jnp.broadcast_to(skey[-1:], (8 - L % 8,))])
    rows8 = skey.reshape(-1, 8)
    G = (bin_capacity + 14) // 8                      # G*8 >= capacity+7
    r0 = starts[:-1] >> 3
    ridx = jnp.minimum(r0[:, None] + jnp.arange(G, dtype=jnp.int32)[None, :],
                       rows8.shape[0] - 1)
    g8 = rows8[ridx].reshape(n_tiles, G * 8)
    s8 = (starts[:-1] & 7)[:, None]
    k = g8[:, 0:bin_capacity]
    for kk in range(1, 8):
        k = jnp.where(s8 == kk, g8[:, kk:kk + bin_capacity], k)
    entry_ok = ((k >> shift).astype(jnp.int32)
                == jnp.arange(n_tiles, dtype=jnp.int32)[:, None])
    tri_unpacked = (k & ((1 << tri_bits) - 1)).astype(jnp.int32)
    if tri_block is not None:
        # recover the block-global id from the tile's block
        block_of_tile = (jnp.arange(n_tiles, dtype=jnp.int32)
                         // tiles_per_block)
        tri_unpacked = tri_unpacked + block_of_tile[:, None] * T_local
    bins = jnp.where(entry_ok, tri_unpacked, -1)
    bin_zub = None
    if return_zub:
        # per-entry depth upper bound recovered from the sort key's
        # quantized band: dq = floor((1-prio)*levels) => prio <=
        # 1 - dq/levels.  Dense unpack of the already-gathered keys —
        # the early-z suffix bounds no longer need a second
        # (n_tiles x E) gather of setup["zbound"] (~1.7 ms at 1080p).
        # Requires depth_prio to upper-bound the kernel's interpolated
        # fragment depth (zbound / ortho zmax do).
        assert depth_prio is not None, "return_zub needs depth_prio"
        levels = (1 << dq_bits) - 1
        dq_e = ((k >> tri_bits) & levels).astype(jnp.float32)
        bin_zub = jnp.where(entry_ok, 1.0 - dq_e * (1.0 / levels), 0.0)

    # compact big-triangle ids with a dense rank compare: id[j] = index
    # of the (j+1)-th set bit = #{t: cumsum[t] <= j}.  The (K, T)
    # broadcast-compare reduction is one fused VPU pass (~8M lanes at
    # K=64); the previous cumsum+scatter compaction traced at ~0.24 ms
    # per call x4 calls/frame (jnp.nonzero(size=K) was worse, ~1.1 ms)
    bigm = setup["big"]
    cs = jnp.cumsum(bigm.astype(jnp.int32))
    jj = jnp.arange(big_capacity, dtype=jnp.int32)
    big_ids = jnp.sum((cs[None, :] <= jj[:, None]).astype(jnp.int32), axis=1)
    big_ids = jnp.where(jj < cs[-1], big_ids, -1)
    ret = (bins, counts.astype(jnp.int32), big_ids)
    if return_overflow:
        # dropped (tile, tri) pairs: bins saturate in draw order, so a
        # nonzero overflow means later draws lost coverage in hot tiles
        overflow = (jnp.sum(jnp.maximum(raw_counts - bin_capacity, 0))
                    + jnp.maximum(jnp.sum(setup["big"]) - big_capacity, 0))
        ret = ret + (overflow.astype(jnp.int32),)
    if return_zub:
        ret = ret + (bin_zub,)
    return ret


def _tile_ndc(tile_idx, tiles_x, width, height, dtype=jnp.float32):
    """NDC coords of one tile's pixel centers (TILE_H, TILE_W)."""
    ty = tile_idx // tiles_x
    tx = tile_idx % tiles_x
    py = ty * TILE_H + jnp.arange(TILE_H, dtype=dtype)[:, None]
    px = tx * TILE_W + jnp.arange(TILE_W, dtype=dtype)[None, :]
    yn = (py + 0.5) / height * 2.0 - 1.0
    xn = (px + 0.5) / width * 2.0 - 1.0
    return jnp.broadcast_to(xn, (TILE_H, TILE_W)), jnp.broadcast_to(yn, (TILE_H, TILE_W))


def raster(setup, bins, big_ids, tiles_x, tiles_y, width, height, tile_ids=None):
    """Depth + id raster over all tiles.

    Returns depth (Hp, Wp) f32 (reverse-Z, cleared 0) and vis (Hp, Wp)
    int32 triangle id (-1 = background).  Hp/Wp are the tile-padded
    extents.  tile_ids names the global tile of each bins row (default:
    all tiles) — the hook the tile-sharded multi-chip path uses to give
    each device its band; bins rows always correspond 1:1 to tile_ids.
    """
    adj, det, zc = setup["adj"], setup["det"], setup["zc"]
    ylim = setup.get("ylim")           # optional per-tri y scissor band
    # per-triangle packed setup: e-coeffs (9) + z-over-det dot coeffs (3)
    ez = adj * (zc[:, :, None] / det[:, None, None])   # rows scaled: depth = sum_i e_i*z_i/det
    if tile_ids is None:
        tile_ids = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32)
    n_tiles = tile_ids.shape[0]

    K = bins.shape[1]
    B = big_ids.shape[0]

    xn, yn = jax.vmap(lambda t: _tile_ndc(t, tiles_x, width, height))(tile_ids)
    # (n_tiles, TILE_H, TILE_W)

    def step(carry, k):
        depth, vis = carry
        tri = jnp.where(k < K, bins[:, jnp.minimum(k, K - 1)],
                        big_ids[jnp.minimum(k - K, B - 1)])
        ok = tri >= 0
        t = jnp.maximum(tri, 0)
        a = adj[t]                                    # (n_tiles, 3, 3)
        z3 = ez[t]                                    # (n_tiles, 3, 3)
        e0 = a[:, 0, 0, None, None] * xn + a[:, 0, 1, None, None] * yn + a[:, 0, 2, None, None]
        e1 = a[:, 1, 0, None, None] * xn + a[:, 1, 1, None, None] * yn + a[:, 1, 2, None, None]
        e2 = a[:, 2, 0, None, None] * xn + a[:, 2, 1, None, None] * yn + a[:, 2, 2, None, None]
        inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
        # reject the mirror image of w<0 (behind-eye) triangle regions:
        # interpolated clip w = det/sum(e) must be positive
        inside = inside & ((e0 + e1 + e2) * det[t][:, None, None] > 0)
        if ylim is not None:
            yl = ylim[t]
            inside = inside & (yn >= yl[:, 0, None, None]) \
                & (yn < yl[:, 1, None, None])
        zs = z3.sum(axis=1)                           # (n_tiles, 3): coeffs for depth
        d = zs[:, 0, None, None] * xn + zs[:, 1, None, None] * yn + zs[:, 2, None, None]
        passed = (inside & ok[:, None, None]
                  & (d > depth) & (d <= 1.0))
        depth = jnp.where(passed, d, depth)
        vis = jnp.where(passed, t[:, None, None], vis)
        return (depth, vis), None

    # init carry derived from tile_ids so its manual-sharding "varying"
    # axes match the body output under shard_map (zero-cost: XLA folds it)
    tvar = tile_ids[:, None, None]
    depth0 = jnp.zeros((n_tiles, TILE_H, TILE_W), jnp.float32) + 0.0 * tvar.astype(jnp.float32)
    vis0 = jnp.full((n_tiles, TILE_H, TILE_W), -1, jnp.int32) + 0 * tvar
    (depth, vis), _ = jax.lax.scan(step, (depth0, vis0),
                                   jnp.arange(K + B, dtype=jnp.int32))

    tiles_y_local = n_tiles // tiles_x   # callers shard whole tile-rows
    return _untile(depth, tiles_x, tiles_y_local), _untile(vis, tiles_x, tiles_y_local)


def _untile(tiled, tiles_x, tiles_y):
    """(n_tiles, TH, TW) -> (tiles_y*TH, tiles_x*TW)."""
    n, th, tw = tiled.shape
    return (tiled.reshape(tiles_y, tiles_x, th, tw)
            .transpose(0, 2, 1, 3)
            .reshape(tiles_y * th, tiles_x * tw))


def tile_image(img, tiles_x, tiles_y):
    """(H, W, ...) -> (n_tiles, TH, TW, ...)."""
    h, w = img.shape[:2]
    rest = img.shape[2:]
    return (img.reshape(tiles_y, TILE_H, tiles_x, TILE_W, *rest)
            .transpose(0, 2, 1, 3, *(range(4, 4 + len(rest))))
            .reshape(tiles_y * tiles_x, TILE_H, TILE_W, *rest))


def resolve_barycentrics(vis, setup, width, height, y0=0):
    """Per-pixel perspective-correct barycentrics for the winning triangle.

    Returns lam (H, W, 3) with sum=1 on covered pixels, plus mask (H, W).
    y0 is the global row of this band's first row (tile-sharded path).
    """
    h, w = vis.shape
    ys = (jnp.arange(h, dtype=jnp.float32)[:, None] + y0 + 0.5) / height * 2.0 - 1.0
    xs = (jnp.arange(w, dtype=jnp.float32)[None, :] + 0.5) / width * 2.0 - 1.0
    mask = vis >= 0
    t = jnp.maximum(vis, 0)
    a = setup["adj"][t]                                   # (H, W, 3, 3)
    e = (a[..., 0] * xs[..., None] + a[..., 1] * ys[..., None] + a[..., 2])
    s = e.sum(-1, keepdims=True)
    lam = e / jnp.where(jnp.abs(s) < 1e-20, 1.0, s)
    return lam, mask


@partial(jax.jit, static_argnames=("width", "height", "tiles_x", "tiles_y",
                                   "bin_capacity", "big_capacity"))
def rasterize(clip, tris, *, width, height, tiles_x, tiles_y,
              bin_capacity=256, big_capacity=64):
    """End-to-end: clip-space triangles -> (depth, vis id, setup)."""
    setup = triangle_setup(clip, tris, width, height, tiles_x, tiles_y)
    bins, counts, big_ids = bin_triangles(setup, tris.shape[0], tiles_x, tiles_y,
                                          bin_capacity, big_capacity)
    depth, vis = raster(setup, bins, big_ids, tiles_x, tiles_y, width, height)
    return depth, vis, setup
