"""Device sprite/overlay compositing pass.

Reference parity: the overlay sprite pipeline (reference:
data/sprite.vert:1-31 screen-rect transform, data/sprite.frag:1-14
atlas sample * tint with standard alpha blend, dispatched in the
OVERLAY pass renderer.cpp:6760-6789).  The reference draws each sprite
as an alpha-blended quad into the final sRGB target after composite.

TPU design: sprites are tiny, ordered, and sparse — a full-screen pass
per sprite would waste bandwidth, and scatter blending inside one
Pallas kernel would need ordered per-pixel gathers (the TPU wall).
Instead each sprite blends a fixed RxR region: dynamic_slice the
display image around the sprite, inverse-affine map region pixels into
the atlas rect, bilinear-sample the atlas (4 bounded gathers over R^2
taps), alpha-blend in draw order, dynamic_update_slice back.  A
lax.fori_loop over the instance capacity compiles the body ONCE; the
whole pass is O(S * R^2) independent of resolution.

Instances larger than the region capacity must be split by the caller
(RenderList.sprite_arrays tiles oversized rects into region-sized
chunks, so arbitrary HUD panels still work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_atlas(atlas_flat, aw, ah, px, py):
    """4-tap bilinear sample of a flattened (AH*AW, 4) atlas at float
    pixel coords (px, py); coordinates clamp to the atlas edge."""
    x0 = jnp.floor(px - 0.5)
    y0 = jnp.floor(py - 0.5)
    fx = (px - 0.5) - x0
    fy = (py - 0.5) - y0

    def tap(xi, yi):
        xc = jnp.clip(xi.astype(jnp.int32), 0, aw - 1)
        yc = jnp.clip(yi.astype(jnp.int32), 0, ah - 1)
        return atlas_flat[(yc * aw + xc).reshape(-1)].reshape(px.shape + (4,))

    t00 = tap(x0, y0)
    t10 = tap(x0 + 1, y0)
    t01 = tap(x0, y0 + 1)
    t11 = tap(x0 + 1, y0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return ((t00 * (1 - fx) + t10 * fx) * (1 - fy)
            + (t01 * (1 - fx) + t11 * fx) * fy)


def composite_sprites(rgb, inst, atlas, region=128):
    """Alpha-blend up to S sprite quads into the display-space image.

    rgb: (H, W, 3) float display-space (post-tonemap) color.
    atlas: (AH, AW, 4) float [0, 1] combined sprite/glyph atlas.
    inst: dict of arrays (static capacity S) + scalar "count":
      origin (S, 2): screen px position of the sprite rect's uv0 corner
      axis_x (S, 2), axis_y (S, 2): screen-space edge vectors of the
        rect (supports rotation); a point p maps to sprite-local
        (u, v) in [0, 1]^2 via the inverse 2x2 basis
      uv0 (S, 2), uv1 (S, 2): atlas rect in PIXELS
      tint (S, 4): color multiplier + alpha
    Sprites blend in draw order (reference: OVERLAY pass sequencing).
    """
    rgb = jnp.asarray(rgb, jnp.float32)
    h, w = rgb.shape[:2]
    S = inst["origin"].shape[0]
    R = int(region)
    assert R <= h and R <= w, f"overlay region {R} exceeds image {h}x{w}"
    ah, aw = atlas.shape[:2]
    atlas_flat = jnp.asarray(atlas, jnp.float32).reshape(-1, atlas.shape[-1])
    inst = {k: jnp.asarray(v) for k, v in inst.items()}

    ys, xs = jnp.meshgrid(jnp.arange(R, dtype=jnp.float32),
                          jnp.arange(R, dtype=jnp.float32), indexing="ij")

    def body(i, img):
        take = lambda a: jax.lax.dynamic_index_in_dim(a, i, 0,
                                                      keepdims=False)
        origin = take(inst["origin"])
        ax = take(inst["axis_x"])
        ay = take(inst["axis_y"])
        uv0 = take(inst["uv0"])
        uv1 = take(inst["uv1"])
        tint = take(inst["tint"])
        active = (i < inst["count"]).astype(jnp.float32)

        # region top-left: center the region on the rect bbox, clamped
        # so the slice stays in bounds (coordinates stay global, so the
        # clamp costs nothing — pixels outside the rect mask out)
        bx0 = jnp.minimum(jnp.minimum(0.0, ax[0]), jnp.minimum(ay[0], ax[0] + ay[0]))
        bx1 = jnp.maximum(jnp.maximum(0.0, ax[0]), jnp.maximum(ay[0], ax[0] + ay[0]))
        by0 = jnp.minimum(jnp.minimum(0.0, ax[1]), jnp.minimum(ay[1], ax[1] + ay[1]))
        by1 = jnp.maximum(jnp.maximum(0.0, ax[1]), jnp.maximum(ay[1], ax[1] + ay[1]))
        cx = origin[0] + 0.5 * (bx0 + bx1)
        cy = origin[1] + 0.5 * (by0 + by1)
        sx = jnp.clip(jnp.round(cx - R * 0.5).astype(jnp.int32), 0, w - R)
        sy = jnp.clip(jnp.round(cy - R * 0.5).astype(jnp.int32), 0, h - R)

        reg = jax.lax.dynamic_slice(img, (sy, sx, 0), (R, R, 3))

        # pixel-center coords relative to the sprite origin
        dx = xs + (sx.astype(jnp.float32) + 0.5 - origin[0])
        dy = ys + (sy.astype(jnp.float32) + 0.5 - origin[1])
        det = ax[0] * ay[1] - ax[1] * ay[0]
        inv_det = jnp.where(jnp.abs(det) < 1e-8, 0.0, 1.0 / det)
        u = (dx * ay[1] - dy * ay[0]) * inv_det
        v = (dy * ax[0] - dx * ax[1]) * inv_det
        # a degenerate sprite (zero-area axes) must paint NOTHING: with
        # inv_det zeroed, u=v=0 would otherwise pass the inside test for
        # every region pixel
        inside = ((u >= 0.0) & (u < 1.0) & (v >= 0.0) & (v < 1.0)
                  & (jnp.abs(det) >= 1e-8))

        px = uv0[0] + u * (uv1[0] - uv0[0])
        py = uv0[1] + v * (uv1[1] - uv0[1])
        texel = _bilinear_atlas(atlas_flat, aw, ah, px, py)
        a = (texel[..., 3] * tint[3] * active
             * inside.astype(jnp.float32))[..., None]
        src = texel[..., :3] * tint[:3]
        out = reg * (1.0 - a) + src * a
        return jax.lax.dynamic_update_slice(img, out, (sy, sx, 0))

    return jax.lax.fori_loop(0, S, body, rgb)
