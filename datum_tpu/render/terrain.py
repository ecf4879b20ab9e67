"""Terrain meshes from heightmaps.

Reference parity: the terrain vertex path (reference:
data/terrain.prepass/geometry.vert — heightmap-displaced grid with LOD
morphing).  The TPU build bakes the displaced grid at build time (the
pool is persistent device memory).  Continuous LOD geomorphing
(reference: terrain.geometry.vert — vertices mix toward floor-snapped
coarse-grid points by camera distance, re-sampling the heightmap there)
is baked as per-vertex morph targets via morph_grid= and applied by the
vertex stage (ops/geometry.terrain_morph) when
FrameConfig.enable_terrain_morph; push the mesh with
RenderList.push_terrain to set the (morphbeg, morphend) distances.
Discrete LOD levels remain available via step=, like the asteroids
example.
"""

from __future__ import annotations

import numpy as np


def grid_morph_targets(pos_grid, nrm_grid, morph_grid):
    """Floor-snap each grid vertex to its morph_grid-aligned coarse
    corner (reference: terrain.geometry.vert gridpos = floor(xy / g) * g
    with the heightmap re-sampled there — baked, the snapped vertex's
    own height/normal).  Grids sized n*g + 1 keep boundary vertices
    fixed (the last row/col index is g-aligned)."""
    h, w = pos_grid.shape[:2]
    ii = (np.arange(h) // morph_grid) * morph_grid
    jj = (np.arange(w) // morph_grid) * morph_grid
    return (pos_grid[ii][:, jj].reshape(-1, 3),
            nrm_grid[ii][:, jj].reshape(-1, 3))


def make_terrain_mesh(heightmap, size=64.0, height_scale=8.0, step=1,
                      morph_grid=0):
    """Grid mesh displaced by a (H, W) heightmap.

    Returns (vertices dict, indices) for RenderContext.add_mesh; step
    subsamples the heightmap for LOD levels; morph_grid > 0 bakes
    geomorph targets (see module docstring).
    """
    hm = np.asarray(heightmap, np.float32)[::step, ::step]
    h, w = hm.shape
    xs = np.linspace(0, size, w, dtype=np.float32)
    zs = np.linspace(0, size, h, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs, indexing="xy")
    gy = hm * height_scale

    # normals from central differences
    dx = np.gradient(gy, xs[1] - xs[0] if w > 1 else 1.0, axis=1)
    dz = np.gradient(gy, zs[1] - zs[0] if h > 1 else 1.0, axis=0)
    n = np.stack([-dx, np.ones_like(gy), -dz], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)

    pos = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    uv = np.stack([gx / size, gz / size], -1).reshape(-1, 2)
    nrm = n.reshape(-1, 3)
    tan = np.tile([1, 0, 0, 1.0], (len(pos), 1)).astype(np.float32)

    idx = []
    for j in range(h - 1):
        for i in range(w - 1):
            a = j * w + i
            idx += [a, a + w, a + 1, a + 1, a + w, a + w + 1]
    verts = dict(position=pos, texcoord=uv, normal=nrm, tangent=tan)
    if morph_grid > 0:
        mp, mn = grid_morph_targets(np.stack([gx, gy, gz], -1), n,
                                    morph_grid)
        verts["morph_position"] = mp
        verts["morph_normal"] = mn
    return verts, np.asarray(idx, np.int32)


def terrain_lod_chain(heightmap, size=64.0, height_scale=8.0, levels=3):
    """LOD chain: full res, half, quarter grids."""
    return [make_terrain_mesh(heightmap, size, height_scale, step=1 << i)
            for i in range(levels)]
