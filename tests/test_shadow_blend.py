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


def test_pair_rows_match_two_gather_blend():
    """esm_pair with identical slice frames (identity resample) must
    reproduce the two-gather blend path exactly."""
    from datum_tpu.ops.shadow import build_esm_pair

    wp, esm, zmx, zsc, splits, sv, vd = _setup()
    two = np.asarray(shadow_factor_esm_fast(wp, esm, zmx, zsc, splits, sv,
                                            vd, slice_blend=0.3))
    pair = build_esm_pair(esm, sv)
    one = np.asarray(shadow_factor_esm_fast(wp, esm, zmx, zsc, splits, sv,
                                            vd, slice_blend=0.3,
                                            esm_pair=pair))
    # identical shadowview frames -> a=1, b=0 -> channel 1 == esm[1]
    assert np.abs(np.asarray(pair)[0, ..., 1]
                  - np.asarray(esm[1])).max() < 1e-6
    assert np.abs(one - two).max() < 1e-6


def test_pair_resample_scale_translate():
    """Slice 1 at half the uv scale of slice 0 (2x world extent):
    build_esm_pair's channel 1 must equal an analytic bilinear pull."""
    from datum_tpu.ops.shadow import build_esm_pair

    res = 16
    rng = np.random.default_rng(3)
    e1 = rng.uniform(0.5, 2.0, (res, res)).astype(np.float32)
    esm = jnp.stack([jnp.ones((res, res), jnp.float32), jnp.asarray(e1)])
    sv = np.zeros((2, 4, 4), np.float32)
    # slice 0: clip = p; slice 1: clip = 0.5 p + 0.1  (same axes)
    sv[0, 0, 0] = 1.0
    sv[0, 1, 1] = 1.0
    sv[1, 0, 0] = 0.5
    sv[1, 0, 3] = 0.1
    sv[1, 1, 1] = 0.5
    sv[1, 1, 3] = 0.1
    sv[:, 2, 2] = 1.0
    sv[:, 3, 3] = 1.0
    pair = np.asarray(build_esm_pair(esm, jnp.asarray(sv)))

    # analytic: target texel centers of slice 0 -> slice-1 texel coords
    j = (np.arange(res) + 0.5) / res          # uv in slice 0
    c0 = 2.0 * j - 1.0                        # clip in slice 0
    c1 = 0.5 * c0 + 0.1                       # clip in slice 1
    t = np.clip((c1 * 0.5 + 0.5) * res - 0.5, 0.0, res - 1.0)
    lo = np.floor(t).astype(np.int32)
    hi = np.minimum(lo + 1, res - 1)
    f = t - lo
    rows = (e1[lo] * (1 - f)[:, None] + e1[hi] * f[:, None])
    want = (rows[:, lo] * (1 - f)[None, :] + rows[:, hi] * f[None, :])
    assert np.abs(pair[0, ..., 1] - want).max() < 1e-5
