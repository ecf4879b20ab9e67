"""Cascade slice-boundary blending (FrameConfig.shadow_slice_blend).

Reference: data/lighting.comp:63-95 lerps between adjacent cascade
slices over the tail of each split range, hiding the resolution seam.
Our single-gather ESM factor adds one extra tap from the next slice and
mixes by the in-slice fraction.
"""

import numpy as np
import jax.numpy as jnp

from datum_tpu.ops.shadow import shadow_factor_esm_fast


def _setup():
    """Two synthetic slices: slice 0 fully lit, slice 1 fully dark."""
    res = 8
    esm = jnp.stack([jnp.ones((res, res), jnp.float32),
                     jnp.zeros((res, res), jnp.float32)])
    zmax = jnp.asarray([0.5, 0.5], jnp.float32)
    zscale = jnp.asarray([1.0, 1.0], jnp.float32)
    splits = jnp.asarray([10.0, 20.0], jnp.float32)
    # cx ~ 0 (u = 0.5), cy = 0 (v = 0.5), ref = 0.5: always inside, and
    # dref = (zmax - ref) * zscale = 0 so lit == tap exactly
    sv = np.zeros((2, 4, 4), np.float32)
    sv[:, 0, 0] = 1e-3                 # xnorm > 0 (texel size finite)
    sv[:, 2, 3] = 0.5
    sv[:, 3, 3] = 1.0
    shadowview = jnp.asarray(sv)
    n = 64
    view_dist = jnp.linspace(0.0, 20.0, n)
    worldpos = jnp.stack([jnp.zeros(n)] * 3, -1)
    return worldpos, esm, zmax, zscale, splits, shadowview, view_dist


def test_hard_seam_without_blend():
    wp, esm, zmx, zsc, splits, sv, vd = _setup()
    f = np.asarray(shadow_factor_esm_fast(wp, esm, zmx, zsc, splits, sv, vd))
    jumps = np.abs(np.diff(f))
    assert jumps.max() > 0.9, "expected a hard 1->0 seam at the boundary"


def test_blend_smooths_the_seam():
    wp, esm, zmx, zsc, splits, sv, vd = _setup()
    f = np.asarray(shadow_factor_esm_fast(wp, esm, zmx, zsc, splits, sv, vd,
                                          slice_blend=0.3))
    jumps = np.abs(np.diff(f))
    assert jumps.max() < 0.35, f"seam not blended: max jump {jumps.max():.3f}"
    # mid-transition samples sit strictly between the two slices
    vd_np = np.asarray(vd)
    mid = (vd_np > 8.0) & (vd_np < 10.0)
    assert (f[mid] > 0.05).all() and (f[mid] < 0.95).all()
    # far side of the boundary is fully in the dark slice
    assert (f[vd_np > 11.0] < 0.05).all()
    # well before the transition: fully lit
    assert (f[vd_np < 6.0] > 0.95).all()


def test_blend_noop_when_slices_match():
    """Identical slices: blending must not change the factor."""
    wp, esm, zmx, zsc, splits, sv, vd = _setup()
    esm_same = jnp.stack([esm[0], esm[0]])
    a = np.asarray(shadow_factor_esm_fast(wp, esm_same, zmx, zsc, splits,
                                          sv, vd))
    b = np.asarray(shadow_factor_esm_fast(wp, esm_same, zmx, zsc, splits,
                                          sv, vd, slice_blend=0.3))
    assert np.abs(a - b).max() < 1e-6
