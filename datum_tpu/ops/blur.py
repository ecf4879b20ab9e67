"""Separable blurs (gaussian and box) over 2-D images.

Replaces the reference's separable blur compute kernels (reference:
data/bloom.h/vblur.comp — sigma 8 radius 16 gaussian; data/color.h/
vblur.comp — DoF half-res blur; data/esm.h/vblur.comp — shadow blur).
Implemented as lax depthwise convolutions so XLA lowers them to
efficient TPU fusions.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def gaussian_kernel(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def blur_1d(img, kernel, axis):
    """Convolve (H, W) or (H, W, C) along axis 0 or 1 with edge clamp."""
    k = jnp.asarray(kernel, jnp.float32)
    r = (k.shape[0] - 1) // 2
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    pad = [(0, 0)] * 3
    pad[axis] = (r, r)
    x = jnp.pad(img, pad, mode="edge")
    # NHWC depthwise conv
    x = x[None]
    if axis == 0:
        rhs = k.reshape(-1, 1, 1, 1)
        window = (k.shape[0], 1)
    else:
        rhs = k.reshape(1, -1, 1, 1)
        window = (1, k.shape[0])
    rhs = jnp.tile(rhs, (1, 1, 1, c))
    out = lax.conv_general_dilated(
        x, rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    out = out[0]
    return out[..., 0] if squeeze else out


def box_blur_1d(img, r: int, axis: int):
    """O(1)-per-radius box blur via cumulative sums (edge-clamped)."""
    if r <= 0:
        return img
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    pad = [(0, 0)] * 3
    pad[axis] = (r + 1, r)
    x = jnp.pad(img, pad, mode="edge")
    c = jnp.cumsum(x, axis=axis)
    n = img.shape[axis]
    hi = lax.slice_in_dim(c, 2 * r + 1, 2 * r + 1 + n, axis=axis)
    lo = lax.slice_in_dim(c, 0, n, axis=axis)
    out = (hi - lo) / (2 * r + 1)
    return out[..., 0] if squeeze else out


def shifted_gaussian_blur(img, sigma: float, radius: int = 3):
    """Separable gaussian via explicit shifted adds (edge-clamped).

    Unlike the cumsum box chain, this is cancellation-free: safe for
    high-dynamic-range inputs like ESM exp(c*d') maps where a full-axis
    cumsum reaches ~1e11 and differencing destroys small window sums
    (the round-1 blocky shadow-noise artifact).  Cost is 2*(2r+1) dense
    fused adds — cheap for the small radii shadow/ESM blurs use.
    """
    k = gaussian_kernel(sigma, radius)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    for axis in (0, 1):
        pad = [(0, 0)] * 3
        pad[axis] = (radius, radius)
        x = jnp.pad(img, pad, mode="edge")
        n = img.shape[axis]
        acc = None
        for j in range(2 * radius + 1):
            term = lax.slice_in_dim(x, j, j + n, axis=axis) * k[j]
            acc = term if acc is None else acc + term
        img = acc
    return img[..., 0] if squeeze else img


def gaussian_blur(img, sigma: float):
    """Gaussian approximated by 3 box-blur passes.

    Depthwise convs lower poorly on TPU (~70 ms at half-res r16); the
    cumsum box formulation is pure dense adds.  Each box of half-width
    r has variance r(r+1)/3, so three iterated boxes need r(r+1) =
    sigma^2 -> r = (sqrt(1+4 sigma^2)-1)/2 (the old r = 0.6*sigma gave
    an effective sigma only ~0.65x the requested one — bloom/DoF were
    visibly narrower than the reference's sigma-8/sigma-3 blurs).
    """
    r = max(int((np.sqrt(1.0 + 4.0 * sigma * sigma) - 1.0) / 2.0), 1)
    # mixed radii: upgrading k of the 3 boxes to r+1 picks the closest
    # total variance to sigma^2 (integer radii alone overshoot by ~12%)
    target = 3.0 * sigma * sigma
    best_k = min(range(4), key=lambda k: abs(
        (3 - k) * r * (r + 1) + k * (r + 1) * (r + 2) - target))
    out = img
    for i in range(3):
        ri = r + 1 if i < best_k else r
        out = box_blur_1d(box_blur_1d(out, ri, 1), ri, 0)
    return out


def gaussian_blur_conv(img, sigma: float, radius: int | None = None):
    """Exact separable gaussian (conv path, reference semantics)."""
    if radius is None:
        radius = int(np.ceil(3 * sigma))
    k = gaussian_kernel(sigma, radius)
    return blur_1d(blur_1d(img, k, 1), k, 0)


def downsample_pool(img, p: int, reduce="mean"):
    """pxp box downsample via lax.reduce_window.

    reduce_window lowers to a fast fused TPU loop (~0.15 ms at
    1088x1920x3), while the reshape-(h,p,w,p)-mean pattern relayouts
    across lanes (~5 ms) and strided slices are worse (~17 ms) — see
    profiling/prof_pool.py.  reduce: 'mean' | 'max' | 'first' (plain
    subsample via max of the top-left element, for id planes).
    """
    if p <= 1:
        return img
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    img = img[:h - h % p, :w - w % p]
    if reduce == "first":
        # exact subsample of the top-left texel of each cell: zero the
        # rest via an iota mask, then max-reduce (works for int planes)
        yy = jnp.arange(img.shape[0]) % p
        xx = jnp.arange(img.shape[1]) % p
        keep = (yy[:, None] == 0) & (xx[None, :] == 0)
        neutral = jnp.asarray(jnp.iinfo(img.dtype).min if
                              jnp.issubdtype(img.dtype, jnp.integer)
                              else -jnp.inf, img.dtype)
        masked = jnp.where(keep[..., None], img, neutral)
        out = lax.reduce_window(masked, neutral, lax.max,
                                (p, p, 1), (p, p, 1), "VALID")
    elif reduce == "max":
        neutral = jnp.asarray(jnp.iinfo(img.dtype).min if
                              jnp.issubdtype(img.dtype, jnp.integer)
                              else -jnp.inf, img.dtype)
        out = lax.reduce_window(img, neutral, lax.max,
                                (p, p, 1), (p, p, 1), "VALID")
    else:
        out = lax.reduce_window(img, jnp.asarray(0.0, img.dtype), lax.add,
                                (p, p, 1), (p, p, 1), "VALID") / (p * p)
    return out[..., 0] if squeeze else out


def downsample2(img):
    """2x box downsample (for half-res effect chains)."""
    return downsample_pool(img, 2)


def upsample2_bilinear(img, out_h, out_w):
    """Bilinear 2x upsample to an explicit size."""
    from .sampling import sample_image_bilinear
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    uv = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    return sample_image_bilinear(img, uv)


def upsample2_dense(img):
    """Gather-free bilinear 2x upsample (half-pixel centers).

    up[2i] = 0.75*x[i] + 0.25*x[i-1]; up[2i+1] = 0.75*x[i] + 0.25*x[i+1]
    via roll + interleave — dense vector ops only, no per-pixel gathers
    (jax.image.resize lowers to gathers for odd ratios on TPU).
    """
    def axis_up(x, axis):
        def sl(a, b):
            s = [slice(None)] * x.ndim
            s[axis] = slice(a, b)
            return tuple(s)

        prev = jnp.concatenate([x[sl(0, 1)], x[sl(0, -1)]], axis=axis)
        nxt = jnp.concatenate([x[sl(1, None)], x[sl(-1, None)]], axis=axis)
        a = 0.75 * x + 0.25 * prev
        b = 0.75 * x + 0.25 * nxt
        stacked = jnp.stack([a, b], axis=axis + 1)
        shape = list(x.shape)
        shape[axis] *= 2
        return stacked.reshape(shape)

    return axis_up(axis_up(img, 0), 1)


def _up2_matrix(n: int) -> np.ndarray:
    """(n, 2n) matrix of upsample2_dense's half-pixel 2x weights."""
    m = np.zeros((n, 2 * n), np.float32)
    i = np.arange(n)
    m[i, 2 * i] += 0.75
    m[np.maximum(i - 1, 0), 2 * i] += 0.25
    m[i, 2 * i + 1] += 0.75
    m[np.minimum(i + 1, n - 1), 2 * i + 1] += 0.25
    return m


def _updense_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_in, n_out) matrix composing iterated-2x rounds (the exact
    weights of the old upsample2_dense chain) plus a final bilinear for
    any non-pow2 remainder (what jax.image.resize 'linear' computed)."""
    m = np.eye(n_in, dtype=np.float32)
    n = n_in
    while n * 2 <= n_out:
        m = m @ _up2_matrix(n)
        n *= 2
    if n != n_out:
        m = m @ _resample_matrix(n, n_out)
    return m


def resize_up_dense(img, out_h, out_w, precision=None):
    """Upsample to (out_h, out_w) with iterated-2x half-pixel weights.

    Lowered as TWO static-matrix contractions (MXU) instead of the old
    roll+interleave chain — the chain cost ~12 dense full-size ops +
    lane-interleave relayouts per call on an op-dispatch-bound frame
    (PERF.md round-4).  The matrices COMPOSE the per-round 2x weights,
    so values match the old chain to matmul rounding (bf16-compute on
    TPU at default precision — below the bf16 quantum of the megakernel
    plane storage; pass precision=HIGHEST for exact-f32 consumers)."""
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img
    my = jnp.asarray(_updense_matrix(h, out_h).T)     # (out_h, h)
    mx = jnp.asarray(_updense_matrix(w, out_w))       # (w, out_w)
    if img.ndim == 2:
        out = jnp.einsum("Oh,hw->Ow", my, img, precision=precision)
        return jnp.einsum("Ow,wW->OW", out, mx, precision=precision)
    out = jnp.einsum("Oh,hwc->Owc", my, img, precision=precision)
    return jnp.einsum("Owc,wW->OWc", out, mx, precision=precision)


def upsample2_batch(stack):
    """upsample2_dense over a channel-FIRST (N, H, W) stack: one fused
    pass upsamples all N planes (the per-plane loop costs ~2N dispatches
    on an op-dispatch-bound frame)."""
    def axis_up(x, axis):
        def sl(a, b):
            s = [slice(None)] * x.ndim
            s[axis] = slice(a, b)
            return tuple(s)

        prev = jnp.concatenate([x[sl(0, 1)], x[sl(0, -1)]], axis=axis)
        nxt = jnp.concatenate([x[sl(1, None)], x[sl(-1, None)]], axis=axis)
        a = 0.75 * x + 0.25 * prev
        b = 0.75 * x + 0.25 * nxt
        stacked = jnp.stack([a, b], axis=axis + 1)
        shape = list(x.shape)
        shape[axis] *= 2
        return stacked.reshape(shape)

    return axis_up(axis_up(stack, 1), 2)


def resize_up_dense_batch(stack, out_h, out_w, precision=None):
    """resize_up_dense over a channel-first (N, H, W) stack.

    Lowered as two static-matrix einsums (MXU): the roll+interleave
    chain's lane interleave forces HBM relayout copies — measured
    2.85 ms vs 1.46 ms for the 15-plane half->full gplane stack at
    1080p (profiling/prof_upsample.py).  Two caveats vs the old chain:

    * At default `precision` the TPU MXU computes f32 inputs in bf16
      passes (measured max error ~3.3e-3 vs exact f32) — the 1.46 ms
      number is bf16-compute.  That is below the bf16 quantum of the
      megakernel's plane storage (shade_pallas casts all gplanes to
      bf16), so the fast-path caller keeps the default; callers that
      need exact f32 pass precision=jax.lax.Precision.HIGHEST.
    * Value equality with the iterated-2x chain holds only at exactly
      2x ratios: for larger ratios (e.g. the 4x sky upsample) the
      matrix is a direct 2-tap bilinear between the two grids — a
      genuinely different (sharper) filter than iterated 2x."""
    h, w = stack.shape[1], stack.shape[2]
    if (h, w) == (out_h, out_w):
        return stack
    my = jnp.asarray(_resample_matrix(h, out_h).T, stack.dtype)   # (O, h)
    mx = jnp.asarray(_resample_matrix(w, out_w), stack.dtype)     # (w, W)
    out = jnp.einsum("Oh,nhw->nOw", my, stack, precision=precision)
    return jnp.einsum("nOw,wW->nOW", out, mx, precision=precision)


def _resample_matrix(n_in: int, n_out: int, nearest: bool = False):
    """(n_in, n_out) static interpolation matrix: out = in @ M.  Pixel
    centers of both grids span the same NDC range (align_corners=False);
    bilinear weights, or one-hot rows for nearest.  Resampling as a
    matmul keeps arbitrary-ratio resizes on the MXU with zero gathers."""
    src = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
    i0 = np.clip(np.floor(src).astype(np.int64), 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    f = np.clip(src - np.floor(src), 0.0, 1.0)
    f = np.where(src < 0, 0.0, np.where(src > n_in - 1, 1.0, f))
    m = np.zeros((n_in, n_out), np.float32)
    if nearest:
        nn = np.where(f < 0.5, i0, i1)
        m[nn, np.arange(n_out)] = 1.0
    else:
        m[i0, np.arange(n_out)] += (1.0 - f).astype(np.float32)
        m[i1, np.arange(n_out)] += f.astype(np.float32)
    return m


def resize_matmul(img, out_h, out_w, nearest: bool = False):
    """Dense (h, w) -> (out_h, out_w) resample via two static-matrix
    matmuls (MXU work, no gathers); handles any up/down ratio per axis."""
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img
    my = jnp.asarray(_resample_matrix(h, out_h, nearest).T)   # (out_h, h)
    mx = jnp.asarray(_resample_matrix(w, out_w, nearest))     # (w, out_w)
    if img.ndim == 2:
        return (my @ img) @ mx
    out = jnp.einsum("Oh,hwc->Owc", my, img)
    return jnp.einsum("Owc,wW->OWc", out, mx)
