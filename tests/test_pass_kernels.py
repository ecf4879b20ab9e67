"""Pass-kernel rewrites: OIT blend kernel, dense HBAO, fog gather apply."""

import numpy as np
import jax
import jax.numpy as jnp

from datum_tpu.ops import raster as R
from datum_tpu.ops import blend as blend_ops
from datum_tpu.ops.raster_pallas import raster_blend_pallas

H, W = 64, 256
TX, TY = W // 128, H // 32


def _tri_scene(n=24, seed=0):
    rng = np.random.RandomState(seed)
    V = n * 3
    pos = rng.uniform(-0.9, 0.9, (V, 2)).astype(np.float32)
    z = rng.uniform(0.1, 0.9, (V,)).astype(np.float32)
    clip = np.concatenate([pos, z[:, None], np.ones((V, 1), np.float32)], -1)
    tris = np.arange(V, dtype=np.int32).reshape(n, 3)
    uv = rng.uniform(0, 1, (V, 2)).astype(np.float32)
    color = rng.uniform(0, 1, (V, 4)).astype(np.float32)
    color[:, 3] = rng.uniform(0.2, 0.9, V)
    return jnp.asarray(clip), jnp.asarray(tris), jnp.asarray(uv), jnp.asarray(color)


def test_blend_kernel_matches_scan():
    clip, tris, uv, color = _tri_scene()
    setup = R.triangle_setup(clip, tris, W, H, TX, TY)
    bins, counts, big = R.bin_triangles(setup, tris.shape[0], TX, TY, 32, 8)
    od = jnp.zeros((H, W), jnp.float32)       # empty opaque depth
    acc_ref, rev_ref = blend_ops.raster_blend(setup, bins, big, uv, color,
                                              tris, od, TX, TY, W, H)
    acc_k, rev_k = raster_blend_pallas(setup, bins, big, counts, tris, uv,
                                       color, od, TX, TY, W, H,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(acc_k), np.asarray(acc_ref),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(rev_k), np.asarray(rev_ref),
                               atol=2e-4)


def test_blend_kernel_depth_reject():
    clip, tris, uv, color = _tri_scene()
    setup = R.triangle_setup(clip, tris, W, H, TX, TY)
    bins, counts, big = R.bin_triangles(setup, tris.shape[0], TX, TY, 32, 8)
    od = jnp.full((H, W), 0.95, jnp.float32)  # opaque nearly everywhere
    acc_k, rev_k = raster_blend_pallas(setup, bins, big, counts, tris, uv,
                                       color, od, TX, TY, W, H,
                                       interpret=True)
    # only fragments nearer than 0.95 may contribute
    assert float(jnp.abs(1.0 - rev_k).mean()) < 0.2


def test_hbao_dense_darkens_corners():
    from datum_tpu.ops.ssao import hbao, make_hbao_params

    h, w = 64, 128
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = 1.0
    proj[1, 1] = -1.0
    proj[2, 3] = 0.1
    # a step: right half much nearer than left half -> occlusion at the edge
    # left half at view distance 2.5, right half a 0.5-unit-nearer wall
    # (within the world-space falloff radius)
    depth = np.full((h, w), 0.04, np.float32)
    depth[:, w // 2:] = 0.05
    normal = np.tile(np.float32([0.5, 0.5, 1.0]), (h, w, 1))
    ao = hbao(jnp.asarray(depth), jnp.asarray(normal), jnp.asarray(proj),
              jnp.eye(4), params=make_hbao_params())
    a = np.asarray(ao[..., 0])
    assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= 1.0
    # pixels just left of the step are occluded by the near wall
    edge = a[:, w // 2 - 4:w // 2].mean()
    flat = a[:, 8:w // 2 - 16].mean()
    assert edge < flat - 0.02


def test_fog_apply_matches_direct_trilinear():
    from datum_tpu.ops.fog import apply_fog, froxel_depths
    from datum_tpu.ops.common import FOG_DEPTH_RANGE, FOG_DEPTH_EXPONENT

    rng = np.random.RandomState(1)
    fog_d, fog_h, fog_w = 8, 12, 20
    vol = rng.uniform(0.1, 0.9, (fog_d, fog_h, fog_w, 4)).astype(np.float32)
    h, w = 48, 128
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = 1.0
    proj[1, 1] = -1.0
    proj[2, 3] = 0.1
    depth = rng.uniform(0.003, 0.5, (h, w)).astype(np.float32)
    hdr = rng.uniform(0, 2, (h, w, 3)).astype(np.float32)

    out = apply_fog(jnp.asarray(hdr), jnp.asarray(depth), jnp.asarray(vol),
                    jnp.asarray(proj), sample_scale=1)

    # direct per-pixel trilinear (numpy reference)
    dist = proj[2, 3] / (depth + proj[2, 2])
    sf = (np.clip(dist / FOG_DEPTH_RANGE, 0, 1) ** (1.0 / FOG_DEPTH_EXPONENT)
          * fog_d - 0.5)
    k0 = np.clip(np.floor(sf), 0, fog_d - 1).astype(int)
    k1 = np.minimum(k0 + 1, fog_d - 1)
    fz = np.clip(sf - k0, 0, 1)
    xf = (np.arange(w) + 0.5) / w * fog_w - 0.5
    yf = (np.arange(h) + 0.5) / h * fog_h - 0.5
    x0 = np.clip(np.floor(xf), 0, fog_w - 1).astype(int)
    y0 = np.clip(np.floor(yf), 0, fog_h - 1).astype(int)
    x1 = np.minimum(x0 + 1, fog_w - 1)
    y1 = np.minimum(y0 + 1, fog_h - 1)
    # low-edge clamp: pixels below texel-0's center take texel 0 exactly
    # (matches _fog_sample's clamped fraction)
    fx = np.where(np.floor(xf) < 0, 0.0,
                  np.clip(xf - np.floor(xf), 0, 1))[None, :, None]
    fy = np.where(np.floor(yf) < 0, 0.0,
                  np.clip(yf - np.floor(yf), 0, 1))[:, None, None]

    def bil(k):
        t00 = vol[k, y0[:, None], x0[None, :]]
        t01 = vol[k, y0[:, None], x1[None, :]]
        t10 = vol[k, y1[:, None], x0[None, :]]
        t11 = vol[k, y1[:, None], x1[None, :]]
        return (t00 * (1 - fx) + t01 * fx) * (1 - fy) \
            + (t10 * (1 - fx) + t11 * fx) * fy

    f0 = bil(k0)
    f1 = bil(k1)
    fog = f0 + (f1 - f0) * fz[..., None]
    ref = hdr * fog[..., 3:4] + fog[..., :3]
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-4)


def test_ssr_pad_slices_match_rolls():
    """The pad-slice SSR march must be BIT-IDENTICAL to the original
    jnp.roll formulation (out-of-bounds taps were roll-wrapped but
    masked by `inb`; padded zeros are masked by the same test, and a
    wrapped prev_above sample only matters at later steps of the same
    outward march, which are themselves out of bounds)."""
    from datum_tpu.ops import ssr2

    rng = np.random.RandomState(7)
    h, w = 64, 96
    depth = jnp.asarray(np.where(rng.rand(h, w) < 0.15, 0.0,
                                 rng.rand(h, w) * 0.9 + 0.05).astype(np.float32))
    hdr = jnp.asarray(rng.rand(h, w, 3).astype(np.float32) * 3.0)
    nenc = rng.rand(h, w, 3).astype(np.float32)
    nenc /= np.linalg.norm(nenc * 2 - 1, axis=-1, keepdims=True) + 1e-6
    normal_enc = jnp.asarray(nenc * 0.5 + 0.5 + 0.25)
    spec = jnp.asarray(rng.rand(h, w, 3).astype(np.float32))
    rough = jnp.asarray((rng.rand(h, w) * 0.6).astype(np.float32))
    mask = jnp.asarray(rng.rand(h, w) < 0.8)
    proj = jnp.asarray(np.array(
        [[1.3, 0, 0, 0], [0, 2.2, 0, 0],
         [0, 0, 0, 0.1], [0, 0, -1, 0]], np.float32))
    view = jnp.eye(4, dtype=jnp.float32)

    out_new = np.asarray(ssr2.ssr_binned(hdr, depth, normal_enc, spec,
                                         rough, mask, proj, view))

    # reference: the original roll-based march, inlined
    import types
    src = open(ssr2.__file__).read()
    src = src.replace(
        "sc_iz = izp[M + dy:M + dy + h, M + dx:M + dx + w]",
        "sc_iz = jnp.roll(iz_scene, (-dy, -dx), axis=(0, 1))").replace(
        "sc_d = dp[M + dy:M + dy + h, M + dx:M + dx + w]",
        "sc_d = jnp.roll(depth, (-dy, -dx), axis=(0, 1))").replace(
        "sc_c = cp[M + dy:M + dy + h, M + dx:M + dx + w]",
        "sc_c = jnp.roll(hdr_color, (-dy, -dx), axis=(0, 1))")
    mod = types.ModuleType("datum_tpu.ops._ssr2_rolls")
    mod.__file__ = ssr2.__file__
    mod.__package__ = "datum_tpu.ops"
    exec(compile(src, ssr2.__file__, "exec"), mod.__dict__)
    out_old = np.asarray(mod.ssr_binned(hdr, depth, normal_enc, spec,
                                        rough, mask, proj, view))
    np.testing.assert_array_equal(out_new, out_old)
