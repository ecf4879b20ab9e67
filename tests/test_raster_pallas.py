"""Pallas raster kernel vs the jnp reference raster (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from datum_tpu.ops import raster as R
from datum_tpu.ops.raster_pallas import raster_pallas
from datum_tpu.ops.raster import resolve_barycentrics
from datum_tpu.math.matrix import perspective_proj

W, H, TX, TY = 256, 128, 2, 4


def run_both(clip, tris, bin_capacity=32, big_capacity=8):
    clip = jnp.asarray(clip, jnp.float32)
    tris = jnp.asarray(tris, jnp.int32)
    setup = R.triangle_setup(clip, tris, W, H, TX, TY)
    bins, counts, big = R.bin_triangles(setup, tris.shape[0], TX, TY,
                                        bin_capacity, big_capacity)
    d_ref, v_ref = R.raster(setup, bins, big, TX, TY, W, H)
    d_p, v_p, l0, l1 = raster_pallas(setup, bins, big, counts, TX, TY, W, H,
                                     interpret=True)
    return (np.asarray(d_ref), np.asarray(v_ref), np.asarray(d_p),
            np.asarray(v_p), np.asarray(l0), np.asarray(l1), setup)


def test_matches_reference_simple():
    clip = np.array([[-1, -1, 0.5, 1], [1, -1, 0.5, 1], [-1, 1, 0.5, 1],
                     [-0.5, -0.5, 0.7, 1], [0.9, -0.5, 0.7, 1], [-0.5, 0.9, 0.7, 1]],
                    np.float32)
    tris = np.array([[0, 1, 2], [3, 4, 5]])
    d_ref, v_ref, d_p, v_p, l0, l1, setup = run_both(clip, tris)
    np.testing.assert_array_equal(v_ref, v_p)
    np.testing.assert_allclose(d_ref, d_p, atol=1e-6)


def test_matches_reference_perspective_mesh(rng):
    proj = perspective_proj(np.radians(70), W / H, 0.1)
    pts = rng.randn(60, 3).astype(np.float32) * 2
    pts[:, 2] -= 6
    hp = np.concatenate([pts, np.ones((60, 1), np.float32)], 1)
    clip = hp @ proj.T
    tris = rng.randint(0, 60, (80, 3)).astype(np.int32)
    d_ref, v_ref, d_p, v_p, l0, l1, setup = run_both(clip, tris, 64, 16)
    # identical winners except possible fp tie-breaks on shared edges
    mismatch = (v_ref != v_p).mean()
    assert mismatch < 0.002, f"{mismatch:.4f} of pixels differ"
    np.testing.assert_allclose(d_ref[v_ref == v_p], d_p[v_ref == v_p], atol=1e-5)


def test_barycentrics_match_resolve():
    clip = np.array([[-1, -1, 0.5, 1], [1, -1, 0.5, 1], [-1, 1, 0.5, 1]], np.float32)
    tris = np.array([[0, 1, 2]])
    d_ref, v_ref, d_p, v_p, l0, l1, setup = run_both(clip, tris)
    lam, mask = resolve_barycentrics(jnp.asarray(v_p), setup, W, H)
    lam = np.asarray(lam)
    covered = v_p >= 0
    np.testing.assert_allclose(l0[covered], lam[covered][:, 0], atol=1e-4)
    np.testing.assert_allclose(l1[covered], lam[covered][:, 1], atol=1e-4)


def test_near_plane_crossing():
    proj = perspective_proj(np.radians(90), W / H, 0.1)
    pts = np.array([[0, 1, -10], [-5, -1, 5], [5, -1, 5]], np.float32)
    hp = np.concatenate([pts, np.ones((3, 1), np.float32)], 1)
    clip = hp @ proj.T
    d_ref, v_ref, d_p, v_p, l0, l1, setup = run_both(clip, np.array([[0, 1, 2]]))
    np.testing.assert_array_equal(v_ref, v_p)


def test_fused_attr_kernel_matches_deferred(rng):
    """raster_shade_pallas (interpret) matches resolve_gbuffer output."""
    import jax.numpy as jnp
    from datum_tpu.ops.raster_pallas import raster_shade_pallas
    from datum_tpu.ops import shade as S

    proj = perspective_proj(np.radians(70), W / H, 0.1)
    pts = rng.randn(30, 3).astype(np.float32) * 2
    pts[:, 2] -= 6
    hp = np.concatenate([pts, np.ones((30, 1), np.float32)], 1)
    clip = jnp.asarray(hp @ proj.T)
    tris = jnp.asarray(rng.randint(0, 30, (40, 3)).astype(np.int32))
    uv = jnp.asarray(rng.rand(30, 2).astype(np.float32))
    nrm = jnp.asarray(rng.randn(30, 3).astype(np.float32))
    tri_mat = jnp.zeros(40, jnp.int32)
    materials = dict(
        color=jnp.asarray(np.tile([0.5, 0.6, 0.7, 1.0], (4, 1)).astype(np.float32)),
        emissive=jnp.zeros(4), metalness=jnp.full(4, 0.3),
        roughness=jnp.full(4, 0.6), reflectivity=jnp.full(4, 0.5),
        albedomap=jnp.zeros(4, jnp.int32),
    )

    setup = R.triangle_setup(clip, tris, W, H, TX, TY)
    bins, counts, big = R.bin_triangles(setup, 40, TX, TY, 32, 8)
    planes = raster_shade_pallas(setup, bins, big, counts, tris, uv, nrm,
                                 tri_mat, materials, TX, TY, W, H,
                                 interpret=True)
    d_ref, v_ref = R.raster(setup, bins, big, TX, TY, W, H)
    v_ref = np.asarray(v_ref)
    vis = np.asarray(planes["vis"])
    agree = v_ref == vis
    assert agree.mean() > 0.998

    # interpolated uv matches the deferred resolve on agreeing pixels
    lam, mask = R.resolve_barycentrics(jnp.asarray(vis), setup, W, H)
    vid = np.asarray(tris)[np.maximum(vis, 0)]
    uv_ref = (np.asarray(uv)[vid] * np.asarray(lam)[..., None]).sum(-2)
    sel = agree & (vis >= 0)
    err = np.abs(np.asarray(planes["uv"])[sel] - uv_ref[sel])
    assert err.max() < 1e-3, err.max()


@pytest.mark.slow
def test_mxu_kernel_matches_v2(rng):
    """raster_shade_mxu (interpret) matches raster_shade_pallas."""
    import jax.numpy as jnp
    from datum_tpu.ops.raster_pallas import raster_shade_pallas, raster_shade_mxu

    proj = perspective_proj(np.radians(70), W / H, 0.1)
    pts = rng.randn(40, 3).astype(np.float32) * 2
    pts[:, 2] -= 6
    hp = np.concatenate([pts, np.ones((40, 1), np.float32)], 1)
    clip = jnp.asarray(hp @ proj.T)
    tris = jnp.asarray(rng.randint(0, 40, (60, 3)).astype(np.int32))
    uv = jnp.asarray(rng.rand(40, 2).astype(np.float32))
    nrm = jnp.asarray(rng.randn(40, 3).astype(np.float32))
    tri_mat = jnp.asarray(rng.randint(0, 3, 60).astype(np.int32))
    materials = dict(
        color=jnp.asarray(rng.rand(4, 4).astype(np.float32)),
        emissive=jnp.asarray(rng.rand(4).astype(np.float32)),
        metalness=jnp.asarray(rng.rand(4).astype(np.float32)),
        roughness=jnp.asarray(rng.rand(4).astype(np.float32)),
        reflectivity=jnp.asarray(rng.rand(4).astype(np.float32)),
        albedomap=jnp.zeros(4, jnp.int32),
    )
    setup = R.triangle_setup(clip, tris, W, H, TX, TY)
    bins, counts, big = R.bin_triangles(setup, 60, TX, TY, 32, 8)

    a = raster_shade_pallas(setup, bins, big, counts, tris, uv, nrm, tri_mat,
                            materials, TX, TY, W, H, interpret=True)
    b = raster_shade_mxu(setup, bins, big, counts, tris, uv, nrm, tri_mat,
                         materials, TX, TY, W, H, interpret=True)
    va, vb = np.asarray(a["vis"]), np.asarray(b["vis"])
    agree = va == vb
    assert agree.mean() > 0.998, f"{(~agree).sum()} vis mismatches"
    sel = agree & (va >= 0)
    np.testing.assert_allclose(np.asarray(a["depth"])[sel],
                               np.asarray(b["depth"])[sel], atol=1e-5)
    np.testing.assert_allclose(np.asarray(a["uv"])[sel],
                               np.asarray(b["uv"])[sel], atol=2e-3)
    np.testing.assert_allclose(np.asarray(a["normal"])[sel],
                               np.asarray(b["normal"])[sel], atol=2e-3)
    np.testing.assert_allclose(np.asarray(a["color"])[sel],
                               np.asarray(b["color"])[sel], atol=1e-4)


@pytest.mark.slow
def test_depth_only_kernel_matches_reference(rng):
    from datum_tpu.ops.raster_pallas import raster_depth_pallas

    pts = rng.randn(48, 3).astype(np.float32) * 0.8
    pts[:, 2] -= 3.0
    proj = np.asarray(perspective_proj(np.radians(60), 2.0, 0.1))
    hp = np.concatenate([pts, np.ones((48, 1), np.float32)], -1)
    clip = jnp.asarray(hp @ proj.T)
    tris = jnp.asarray(rng.randint(0, 48, (30, 3)), jnp.int32)
    setup = R.triangle_setup(clip, tris, W, H, TX, TY, max_span=4)
    bins, counts, big = R.bin_triangles(setup, 30, TX, TY, 32, 8, max_span=4)
    d_ref, _ = R.raster(setup, bins, big, TX, TY, W, H)
    d_p = raster_depth_pallas(setup, bins, big, counts, TX, TY, W, H,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_p), atol=1e-6)


@pytest.mark.slow
def test_two_phase_kernel_matches_one_phase(rng):
    """two_phase (depth prepass + winner-gated attribute walk) is
    bit-identical to the one-phase fused kernel, incl. the extended
    (tangent/matmap) planes and depth peeling."""
    import jax.numpy as jnp
    from datum_tpu.ops.raster_pallas import raster_shade_pallas

    proj = perspective_proj(np.radians(70), W / H, 0.1)
    pts = rng.randn(36, 3).astype(np.float32) * 2
    pts[:, 2] -= 6
    hp = np.concatenate([pts, np.ones((36, 1), np.float32)], 1)
    clip = jnp.asarray(hp @ proj.T)
    tris = jnp.asarray(rng.randint(0, 36, (48, 3)).astype(np.int32))
    uv = jnp.asarray(rng.rand(36, 2).astype(np.float32))
    nrm = jnp.asarray(rng.randn(36, 3).astype(np.float32))
    tan = jnp.asarray(rng.randn(36, 4).astype(np.float32))
    tri_mat = jnp.asarray(rng.randint(0, 4, 48).astype(np.int32))
    materials = dict(
        color=jnp.asarray(rng.rand(4, 4).astype(np.float32)),
        emissive=jnp.zeros(4), metalness=jnp.full(4, 0.3),
        roughness=jnp.full(4, 0.6), reflectivity=jnp.full(4, 0.5),
        albedomap=jnp.zeros(4, jnp.int32),
        packed10=jnp.asarray(rng.rand(4, 12).astype(np.float32)),
    )
    matmaps = dict(base=jnp.zeros(4, jnp.int32), size=jnp.ones(4, jnp.int32))

    setup = R.triangle_setup(clip, tris, W, H, TX, TY)
    bins, counts, big = R.bin_triangles(setup, 48, TX, TY, 32, 8)

    for kw in (dict(), dict(tangent=tan, matmaps=matmaps, planes_2d=True)):
        a = raster_shade_pallas(setup, bins, big, counts, tris, uv, nrm,
                                tri_mat, materials, TX, TY, W, H,
                                interpret=True, **kw)
        b = raster_shade_pallas(setup, bins, big, counts, tris, uv, nrm,
                                tri_mat, materials, TX, TY, W, H,
                                interpret=True, two_phase=True, **kw)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=k)

    # peel: second layer strictly behind the first
    planes = raster_shade_pallas(setup, bins, big, counts, tris, uv, nrm,
                                 tri_mat, materials, TX, TY, W, H,
                                 interpret=True, planes_2d=True,
                                 tangent=tan, matmaps=matmaps)
    for tp in (False, True):
        out = raster_shade_pallas(setup, bins, big, counts, tris, uv, nrm,
                                  tri_mat, materials, TX, TY, W, H,
                                  interpret=True, planes_2d=True,
                                  tangent=tan, matmaps=matmaps,
                                  peel_depth=planes["depth"], two_phase=tp)
        if tp:
            for k in ref:
                np.testing.assert_array_equal(np.asarray(ref[k]),
                                              np.asarray(out[k]), err_msg=k)
        else:
            ref = out


@pytest.mark.slow
def test_early_z_exit_bit_identical(rng):
    """early_z on/off bit-exactness on a depth-complex stack of quads.

    The stack is pushed NEAR-FIRST (the bin order depth_prio produces),
    so the suffix-zbound gate actually fires after the first group —
    the remaining groups must be provably skippable without changing
    any output plane.
    """
    import jax.numpy as jnp
    from datum_tpu.ops.raster_pallas import (raster_depth_pallas,
                                             raster_shade_pallas)

    # 24 full-ish screen quads, depth 0.9 (near, reverse-Z) down to 0.1,
    # plus a sprinkle of random triangles behind them
    n_layers, pts, tris = 24, [], []
    for i in range(n_layers):
        z = 0.9 - 0.8 * i / (n_layers - 1)
        s = 1.2 - 0.01 * i
        b = len(pts)
        pts += [[-s, -s, z, 1], [s, -s, z, 1], [-s, s, z, 1], [s, s, z, 1]]
        tris += [[b, b + 1, b + 2], [b + 2, b + 1, b + 3]]
    extra = rng.randn(30, 3).astype(np.float32)
    for t in rng.randint(0, 30, (20, 3)):
        if len(set(t.tolist())) == 3:
            b = len(pts)
            for j in t:
                pts.append([extra[j, 0], extra[j, 1], 0.05, 1.0])
            tris.append([b, b + 1, b + 2])
    clip = jnp.asarray(np.asarray(pts, np.float32))
    tris = jnp.asarray(np.asarray(tris, np.int32))
    T = tris.shape[0]
    uv = jnp.asarray(rng.rand(clip.shape[0], 2).astype(np.float32))
    nrm = jnp.asarray(rng.randn(clip.shape[0], 3).astype(np.float32))
    tri_mat = jnp.asarray(rng.randint(0, 4, T).astype(np.int32))
    materials = dict(
        color=jnp.asarray(rng.rand(4, 4).astype(np.float32)),
        emissive=jnp.zeros(4), metalness=jnp.full(4, 0.3),
        roughness=jnp.full(4, 0.6), reflectivity=jnp.full(4, 0.5),
        albedomap=jnp.zeros(4, jnp.int32),
    )

    setup = R.triangle_setup(clip, tris, W, H, TX, TY)
    bins, counts, big = R.bin_triangles(setup, T, TX, TY, 64, 16)
    # banded bounds require depth-prio binning (same bins content: the
    # quads are already pushed near-first, so the band sort is stable)
    binsb, countsb, bigb, zub = R.bin_triangles(
        setup, T, TX, TY, 64, 16, depth_prio=setup["zbound"],
        return_zub=True)

    outs = {}
    for ez in (False, True):
        for tp in (False, True):
            outs[(ez, tp)] = raster_shade_pallas(
                setup, bins, big, counts, tris, uv, nrm, tri_mat,
                materials, TX, TY, W, H, interpret=True, early_z=ez,
                two_phase=tp)
    ref = outs[(False, False)]
    # banded early-z (bin_zub from the sort keys): compare against the
    # same depth-sorted bins with early_z off (depth-prio binning may
    # reorder exact-tie winners vs the unsorted bins)
    ref_b = raster_shade_pallas(
        setup, binsb, bigb, countsb, tris, uv, nrm, tri_mat,
        materials, TX, TY, W, H, interpret=True, early_z=False)
    out_b = raster_shade_pallas(
        setup, binsb, bigb, countsb, tris, uv, nrm, tri_mat,
        materials, TX, TY, W, H, interpret=True, early_z=True,
        bin_zub=zub)
    for k in ref_b:
        np.testing.assert_array_equal(np.asarray(ref_b[k]),
                                      np.asarray(out_b[k]),
                                      err_msg=f"banded {k}")
    for key, out in outs.items():
        for k in ref:
            np.testing.assert_array_equal(np.asarray(ref[k]),
                                          np.asarray(out[k]),
                                          err_msg=f"{key} {k}")

    d_off = raster_depth_pallas(setup, bins, big, counts, TX, TY, W, H,
                                interpret=True, early_z=False)
    d_on = raster_depth_pallas(setup, bins, big, counts, TX, TY, W, H,
                               interpret=True, early_z=True)
    np.testing.assert_array_equal(np.asarray(d_off), np.asarray(d_on))
    d_refb = raster_depth_pallas(setup, binsb, bigb, countsb, TX, TY, W, H,
                                 interpret=True, early_z=False)
    d_band = raster_depth_pallas(setup, binsb, bigb, countsb, TX, TY, W, H,
                                 interpret=True, early_z=True, bin_zub=zub)
    np.testing.assert_array_equal(np.asarray(d_refb), np.asarray(d_band))
