"""Weighted-blended OIT accumulation raster (translucents + particles).

TPU re-design of the reference's forward translucent subpasses
(reference: renderer.cpp:6596-6684 — weighted-blend accumulation then
weightblend.{vert,frag} resolve; data/particle.frag soft particles).
Order-independent transparency needs no sorting: each fragment
accumulates (w*a*rgb, w*a) and multiplies revealage (1-a); the resolve
combines with the opaque HDR color.  Runs as a jnp scan (CPU/testing)
or fused into the same per-tile loop style as the opaque raster.

Fragments here are vertex-colored billboards/translucent geometry with
radial-soft alpha (particle sprites); texture-mapped translucents reuse
the deferred resolve path later.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import TILE_H, TILE_W
from .raster import _untile, tile_image as _tile


def oit_weight(depth):
    """Depth weight for WBOIT (near fragments weigh more); depth is
    reverse-Z in (0,1]."""
    return jnp.clip(10.0 / (1e-5 + jnp.power((1.0 - depth) * 5.0, 3.0)), 0.01, 300.0)


def raster_blend(setup, bins, big_ids, vert_uv, vert_color, tris,
                 opaque_depth, tiles_x, tiles_y, width, height, soft=True):
    """Accumulate translucent coverage over tiles.

    setup/bins/big_ids: from triangle_setup/bin_triangles over the
    translucent stream; vert_uv (V,2), vert_color (V,4) premultiplied-
    alpha-ready tints; opaque_depth (H,W) for depth reject.

    Returns (accum (H,W,4) = [sum w*a*rgb, sum w*a], revealage (H,W)).
    """
    n_tiles = tiles_x * tiles_y
    adj, det, zc = setup["adj"], setup["det"], setup["zc"]
    ez = adj * (zc[:, :, None] / det[:, None, None])
    zs = ez.sum(axis=1)
    sgn = jnp.sign(det)
    adj_s = adj * sgn[:, None, None]

    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    from .raster import _tile_ndc
    xn, yn = jax.vmap(lambda t: _tile_ndc(t, tiles_x, width, height))(tile_ids)
    od = _tile(opaque_depth, tiles_x, tiles_y)

    K = bins.shape[1]
    B = big_ids.shape[0]

    uv_tri = vert_uv[tris]        # (T, 3, 2)
    col_tri = vert_color[tris]    # (T, 3, 4)

    def step(carry, k):
        acc, reveal = carry
        tri = jnp.where(k < K, bins[:, jnp.minimum(k, K - 1)],
                        big_ids[jnp.minimum(k - K, B - 1)])
        ok = tri >= 0
        t = jnp.maximum(tri, 0)
        a = adj_s[t]
        e0 = a[:, 0, 0, None, None] * xn + a[:, 0, 1, None, None] * yn + a[:, 0, 2, None, None]
        e1 = a[:, 1, 0, None, None] * xn + a[:, 1, 1, None, None] * yn + a[:, 1, 2, None, None]
        e2 = a[:, 2, 0, None, None] * xn + a[:, 2, 1, None, None] * yn + a[:, 2, 2, None, None]
        s = e0 + e1 + e2
        inside = (e0 >= 0) & (e1 >= 0) & (e2 >= 0) & (s > 0) & ok[:, None, None]
        z = zs[t]
        d = z[:, 0, None, None] * xn + z[:, 1, None, None] * yn + z[:, 2, None, None]
        visible = inside & (d > od) & (d <= 1.0)

        inv = 1.0 / jnp.where(s == 0, 1.0, s)
        l0 = e0 * inv
        l1 = e1 * inv
        l2 = 1.0 - l0 - l1
        uvt = uv_tri[t]
        u = uvt[:, 0, 0, None, None] * l0 + uvt[:, 1, 0, None, None] * l1 + uvt[:, 2, 0, None, None] * l2
        v = uvt[:, 0, 1, None, None] * l0 + uvt[:, 1, 1, None, None] * l1 + uvt[:, 2, 1, None, None] * l2
        ct = col_tri[t]
        col = (ct[:, 0, None, None, :] * l0[..., None]
               + ct[:, 1, None, None, :] * l1[..., None]
               + ct[:, 2, None, None, :] * l2[..., None])
        alpha = col[..., 3]
        if soft:
            r2 = (2 * u - 1) ** 2 + (2 * v - 1) ** 2
            alpha = alpha * jnp.clip(1.0 - r2, 0.0, 1.0)
        alpha = jnp.where(visible, alpha, 0.0)
        wgt = oit_weight(d) * alpha
        acc = acc + jnp.concatenate(
            [col[..., :3] * wgt[..., None], wgt[..., None]], -1)
        reveal = reveal * (1.0 - alpha)
        return (acc, reveal), None

    acc0 = jnp.zeros((n_tiles, TILE_H, TILE_W, 4), jnp.float32)
    rev0 = jnp.ones((n_tiles, TILE_H, TILE_W), jnp.float32)
    (acc, reveal), _ = jax.lax.scan(step, (acc0, rev0),
                                    jnp.arange(K + B, dtype=jnp.int32))
    return _untile4(acc, tiles_x, tiles_y), _untile(reveal, tiles_x, tiles_y)


def _untile4(tiled, tiles_x, tiles_y):
    """(n_tiles, TH, TW, C) -> (H, W, C): _untile with a channel axis."""
    n, th, tw, c = tiled.shape
    return (tiled.reshape(tiles_y, tiles_x, th, tw, c)
            .transpose(0, 2, 1, 3, 4).reshape(tiles_y * th, tiles_x * tw, c))


def resolve_oit(hdr, accum, revealage, exposure=1.0):
    """Composite WBOIT over the opaque HDR image (reference:
    data/weightblend.frag resolve).

    exposure scales the resolved average color — the reference's forward
    shaders multiply by scene.exposure before blending into the HDR
    target.  (Scaling the whole accum would cancel in rgb/weight.)
    """
    avg = accum[..., :3] / jnp.maximum(accum[..., 3:4], 1e-5) * exposure
    alpha = 1.0 - revealage
    return hdr * revealage[..., None] + avg * alpha[..., None]
