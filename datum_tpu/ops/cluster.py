"""Clustered light binning: per-tile light lists.

TPU re-design of the reference cluster kernel (reference:
data/cluster.comp — 64x64px tiles x 24 z-slices, per-tile atomicOr
bitmasks over 512 point lights consumed by lighting.comp's findLSB
loops).  Atomics become a dense (tiles x lights) sphere/frustum test +
per-tile compaction to fixed-capacity light lists; the lighting loop
then runs tile-major (scan over list slots, vectorized over the tile's
pixels) so per-step light-parameter access is one tiny gather per tile
instead of per pixel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .common import TILE_H, TILE_W
from . import brdf


def tile_frustum_planes(view, proj, tiles_x, tiles_y, width, height):
    """Per-tile 4 side planes in world space: (n_tiles, 4, 4) [n|d] with
    inside = n.p + d >= 0."""
    # tile corner NDC coords
    tx = jnp.arange(tiles_x, dtype=jnp.float32)
    ty = jnp.arange(tiles_y, dtype=jnp.float32)
    x0 = (tx * TILE_W) / width * 2 - 1
    x1 = ((tx + 1) * TILE_W) / width * 2 - 1
    y0 = (ty * TILE_H) / height * 2 - 1
    y1 = ((ty + 1) * TILE_H) / height * 2 - 1

    inv00 = 1.0 / proj[0, 0]
    inv11 = 1.0 / proj[1, 1]

    # view-space ray directions through the 4 tile corners (z = -1 plane)
    def corners(xa, yb):
        return jnp.stack([inv00 * xa, inv11 * yb, -jnp.ones_like(xa)], -1)

    X0, Y0 = jnp.meshgrid(x0, y0, indexing="xy")   # (ty, tx) grids
    X1, Y1 = jnp.meshgrid(x1, y1, indexing="xy")
    c00 = corners(X0, Y0).reshape(-1, 3)
    c10 = corners(X1, Y0).reshape(-1, 3)
    c01 = corners(X0, Y1).reshape(-1, 3)
    c11 = corners(X1, Y1).reshape(-1, 3)

    # side planes through the camera origin: normal = cross of edge rays,
    # oriented inward
    def plane(a, b):
        n = jnp.cross(a, b)
        return n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)

    left = plane(c01, c00)
    right = plane(c10, c11)
    top = plane(c00, c10)
    bottom = plane(c11, c01)
    planes_v = jnp.stack([left, right, top, bottom], axis=1)  # (T, 4, 3) view space

    # to world space: n_w = R^T n_v (view rotation R maps world->view),
    # plane passes through camera position
    R = view[:3, :3]
    n_w = planes_v @ R                                        # (T, 4, 3)
    campos = -R.T @ view[:3, 3]
    d = -jnp.einsum("tpk,k->tp", n_w, campos)
    return jnp.concatenate([n_w, d[..., None]], -1)           # (T, 4, 4)


def tile_depth_bounds(depth, proj):
    """Per-tile view-distance interval from the depth plane.

    The practical equivalent of the reference's 24-way cluster z-slicing
    (reference: data/lighting.inc:127-137): instead of pre-slicing depth
    into fixed bins, each screen tile culls lights against its ACTUAL
    depth range — tighter than fixed slices for the same purpose
    (skipping lights that only overlap the tile's 2D footprint).
    Returns (zmin (n_tiles,), zmax (n_tiles,)) distances along forward.
    """
    from jax import lax

    denom = depth + proj[2, 2]
    dist = proj[2, 3] / jnp.where(jnp.abs(denom) < 1e-7, 1e-7, denom)
    dist = jnp.clip(dist, 0.0, 1e7)          # background -> huge
    zmin = -lax.reduce_window(-dist, -jnp.inf, lax.max,
                              (TILE_H, TILE_W), (TILE_H, TILE_W), "VALID")
    zmax = lax.reduce_window(dist, -jnp.inf, lax.max,
                             (TILE_H, TILE_W), (TILE_H, TILE_W), "VALID")
    return zmin.reshape(-1), zmax.reshape(-1)


def bin_lights(light_pos, light_range, count, view, proj, tiles_x, tiles_y,
               width, height, capacity, tile_zrange=None, tile0=0,
               n_local=None):
    """Per-tile light lists.

    tile_zrange: optional (zmin, zmax) per-tile view-distance bounds
    (tile_depth_bounds) — lights outside a tile's depth interval are
    culled (the z-refinement the reference gets from cluster z-slices).
    tile0/n_local: bin only the contiguous tile range [tile0, tile0 +
    n_local) of the FULL grid (the tile-sharded path bins each band's
    own tiles; tile0 may be traced).  tile_zrange is band-local then.
    Returns (lists (n_tiles, capacity) int32 light ids (-1 pad),
    counts (n_tiles,)).
    """
    import jax

    planes = tile_frustum_planes(view, proj, tiles_x, tiles_y, width, height)
    if n_local is not None:
        planes = jax.lax.dynamic_slice_in_dim(planes, tile0, n_local, 0)
    n_lights = light_pos.shape[0]
    hp = jnp.concatenate([light_pos, jnp.ones((n_lights, 1), jnp.float32)], -1)
    # (T, 4, L): signed distance of each light to each plane
    dist = jnp.einsum("tpc,lc->tpl", planes, hp)
    hit = jnp.all(dist >= -light_range[None, None, :], axis=1)     # (T, L)
    active = jnp.arange(n_lights) < count
    hit = hit & active[None, :]

    if tile_zrange is not None:
        zmin, zmax = tile_zrange
        # light distance along the camera forward axis (-view z)
        dl = -(light_pos @ view[2, :3] + view[2, 3])               # (L,)
        hit = hit & (dl[None, :] + light_range[None, :] >= zmin[:, None]) \
            & (dl[None, :] - light_range[None, :] <= zmax[:, None])

    order = jnp.argsort(~hit, axis=1, stable=True)                 # hits first
    lists = jnp.where(
        jnp.take_along_axis(hit, order[:, :capacity], axis=1),
        order[:, :capacity], -1).astype(jnp.int32)
    counts = jnp.minimum(hit.sum(axis=1), capacity).astype(jnp.int32)
    return lists, counts


def _tile(img, tiles_x, tiles_y):
    rest = img.shape[2:]
    return (img.reshape(tiles_y, TILE_H, tiles_x, TILE_W, *rest)
            .transpose(0, 2, 1, 3, *range(4, 4 + len(rest)))
            .reshape(tiles_y * tiles_x, TILE_H, TILE_W, *rest))


def _untile(t, tiles_x, tiles_y):
    rest = t.shape[3:]
    return (t.reshape(tiles_y, tiles_x, TILE_H, TILE_W, *rest)
            .transpose(0, 2, 1, 3, *range(4, 4 + len(rest)))
            .reshape(tiles_y * TILE_H, tiles_x * TILE_W, *rest))


def clustered_point_lights(worldpos, normal, eyevec, material, pl, lists,
                           tiles_x, tiles_y):
    """Accumulate point lights tile-major using the binned lists.

    Inputs are full-screen (H, W, ...) arrays; returns (diffuse,
    specular) full-screen accumulations.
    """
    wp = _tile(worldpos, tiles_x, tiles_y)
    nr = _tile(normal, tiles_x, tiles_y)
    ey = _tile(eyevec, tiles_x, tiles_y)
    mat_t = dict(
        specular=_tile(material["specular"], tiles_x, tiles_y),
        alpha=_tile(material["alpha"][..., None], tiles_x, tiles_y)[..., 0],
    )
    L = lists.shape[1]

    def step(carry, k):
        dif, spec = carry
        lid = lists[:, k]
        ok = (lid >= 0)[:, None, None]
        li = jnp.maximum(lid, 0)
        pos = pl["position"][li][:, None, None, :]
        inten = pl["intensity"][li][:, None, None, :]
        att = pl["attenuation"][li][:, None, None, :]
        d, s = brdf.point_light(wp, nr, ey, mat_t, pos, inten, att)
        w = ok.astype(jnp.float32)[..., None]
        return (dif + d * w, spec + s * w), None

    z = jnp.zeros(wp.shape, jnp.float32)
    (dif, spec), _ = jax.lax.scan(step, (z, z), jnp.arange(L, dtype=jnp.int32))
    return _untile(dif, tiles_x, tiles_y), _untile(spec, tiles_x, tiles_y)
