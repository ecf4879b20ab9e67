"""Bloom: luma threshold + separable gaussian at half resolution.

Matches the reference chain (reference: data/bloom.luma.comp — cutoff
on Rec.601 luma with tonemapped output at half res; data/bloom.h/
vblur.comp — sigma-8 radius-16 separable gaussian).
"""

from __future__ import annotations

import jax.numpy as jnp

from .blur import downsample2, gaussian_blur, upsample2_bilinear
from .composite import tonemap

CUTOFF = 11.2
SIGMA = 8.0
RADIUS = 16


def bloom_seed(quarter):
    """Luma-thresholded, tonemapped bloom seed at the given (reduced)
    resolution — shared by the single-device chain and the sharded
    halo-exchange path so the seed math can't drift."""
    luma = quarter @ jnp.array([0.299, 0.587, 0.114], jnp.float32)
    t = jnp.clip(luma - CUTOFF, 0.0, 1.0)
    t = t * t * (3.0 - 2.0 * t)   # smoothstep(0,1, luma-cutoff)
    return tonemap(quarter * t[..., None])


def bloom(hdr, strength=1.0, pre_downsampled=False, upsample=True):
    """hdr (H, W, 3) -> blurred tonemapped overflow at full res.

    The reference composites tonemapped bloom additively after tonemap
    (composite.frag adds bloom sampled from the blurred luma target).
    Runs at quarter res with the cumsum box-gaussian; the upsample is a
    dense jax.image.resize (gather-free).

    pre_downsampled: hdr is already the quarter-res image (the sharded
    path all-gathers its bands' quarter-res rows); upsample=False
    returns the quarter-res result for the caller to slice + upsample.
    """
    import jax

    quarter = hdr if pre_downsampled else downsample2(downsample2(hdr))
    blurred = gaussian_blur(bloom_seed(quarter), SIGMA * 0.5)
    if not upsample:
        return blurred * strength
    from .blur import resize_up_dense
    return resize_up_dense(blurred, quarter.shape[0] * 4,
                           quarter.shape[1] * 4) * strength
