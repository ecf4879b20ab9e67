"""Min/max depth pyramid (Hi-Z).

Replaces the reference Hi-Z mip kernel (reference: data/depth.mip.comp
— 6 levels of R16G16 min/max reduction used by the SSR walk).  Levels
are produced by 2x2 min/max reductions; level i has shape (H/2^i, W/2^i)
with channels [min_view_depth, max_view_depth] stored as the raw
(reverse-Z) depth min/max.
"""

from __future__ import annotations

import jax.numpy as jnp


def build_depth_pyramid(depth, levels=6):
    """depth (H, W) reverse-Z.  Returns list of (h, w, 2) [zmin, zmax]
    arrays, level 0 = half resolution (matching the reference, whose
    mip 0 is already a 2x reduction of the full-res depth)."""
    cur = jnp.stack([depth, depth], -1)
    out = []
    for _ in range(levels):
        h, w = cur.shape[:2]
        h2, w2 = h // 2 * 2, w // 2 * 2
        c = cur[:h2, :w2].reshape(h // 2, 2, w // 2, 2, 2)
        # reverse-Z: larger value = nearer; track both extremes
        mn = c[..., 0].min((1, 2))
        mx = c[..., 1].max((1, 2))
        cur = jnp.stack([mn, mx], -1)
        out.append(cur)
    return out
