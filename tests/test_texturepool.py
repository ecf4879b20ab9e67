"""Texture system v2: combined material-map mip table + one-gather
sampling (render/texturepool.py + ops/shade.py sample_matmaps)."""

import numpy as np
import jax.numpy as jnp
import pytest

from datum_tpu.render.texturepool import (build_matmap_pool, entry_rows,
                                          mip_base_offset)
from datum_tpu.ops.shade import sample_matmaps


def _checker(size, a=255, b=0):
    yy, xx = np.mgrid[0:size, 0:size]
    c = ((yy // 8 + xx // 8) % 2).astype(np.uint8)
    img = np.zeros((size, size, 4), np.uint8)
    img[..., 0] = img[..., 1] = img[..., 2] = c * a + (1 - c) * b
    img[..., 3] = 255
    return img


def _flat(color):
    return np.tile(np.asarray(color, np.uint8)[None, None], (1, 1, 1))


WHITE = _flat([255, 255, 255, 255])
SURF = _flat([200, 150, 255, 100])
NRM = _flat([128, 128, 255, 255])


def test_entry_layout_math():
    assert mip_base_offset(64, 0) == 0
    assert mip_base_offset(64, 1) == 64 * 64
    assert mip_base_offset(64, 2) == 64 * 64 + 32 * 32
    assert entry_rows(64) == sum((64 >> l) ** 2 for l in range(7))
    assert entry_rows(1) == 1


def test_pool_dedup_and_sizes():
    imgs = {0: _checker(64), 1: SURF, 2: NRM, 3: _checker(256)}
    mats = [(0, 1, 2), (0, 1, 2), (3, 1, 2), (1, 1, 2)]
    table, base, size = build_matmap_pool(mats, imgs, max_size=256)
    assert size[0] == 64 and size[2] == 256 and size[3] == 1
    assert base[0] == base[1]                 # dedup of identical triples
    assert table.shape[1] == 48
    assert table.shape[0] == entry_rows(64) + entry_rows(256) + entry_rows(1)


def test_sample_matches_source_at_mip0():
    imgs = {0: _checker(64), 1: SURF, 2: NRM}
    table, base, size = build_matmap_pool([(0, 1, 2)], imgs, max_size=256)
    tab = jnp.asarray(table)
    H = W = 8
    # texel centers of an 8x8 region -> exact texel values, tiny footprint
    us = (np.arange(W) + 0.5) / 64.0
    vs = (np.arange(H) + 0.5) / 64.0
    uv = jnp.asarray(np.stack(np.meshgrid(us, vs, indexing="xy"), -1),
                     jnp.float32)
    b = jnp.full((H, W), int(base[0]), jnp.int32)
    s = jnp.full((H, W), int(size[0]), jnp.int32)
    alb, srf, nrm = sample_matmaps(tab, b, s, uv)
    src = imgs[0].astype(np.float32) / 255.0
    np.testing.assert_allclose(np.asarray(alb)[..., :3], src[:H, :W, :3],
                               atol=1.5e-2)
    np.testing.assert_allclose(np.asarray(srf),
                               np.tile(SURF[0, 0] / 255.0, (H, W, 1)),
                               atol=1.5e-2)
    np.testing.assert_allclose(np.asarray(nrm),
                               np.tile(NRM[0, 0] / 255.0, (H, W, 1)),
                               atol=1.5e-2)


def test_mip_selection_minified():
    """A large uv footprint selects a deep mip ~= the image mean."""
    imgs = {0: _checker(64), 1: SURF, 2: NRM}
    table, base, size = build_matmap_pool([(0, 1, 2)], imgs, max_size=256)
    tab = jnp.asarray(table)
    H = W = 8
    # uv steps of 0.5 per pixel -> footprint 32 texels -> deepest mips
    us = np.arange(W) * 0.5
    vs = np.arange(H) * 0.5
    uv = jnp.asarray(np.stack(np.meshgrid(us, vs, indexing="xy"), -1),
                     jnp.float32)
    b = jnp.full((H, W), int(base[0]), jnp.int32)
    s = jnp.full((H, W), int(size[0]), jnp.int32)
    alb, _, _ = sample_matmaps(tab, b, s, uv)
    mean = (imgs[0].astype(np.float32) / 255.0)[..., 0].mean()
    assert abs(float(alb[H // 2, W // 2, 0]) - mean) < 0.08


def test_wrap_repeat():
    imgs = {0: _checker(64), 1: SURF, 2: NRM}
    table, base, size = build_matmap_pool([(0, 1, 2)], imgs, max_size=256)
    tab = jnp.asarray(table)
    uv0 = jnp.asarray([[[0.25, 0.25]]], jnp.float32)
    uv1 = jnp.asarray([[[1.25, -0.75]]], jnp.float32)   # same point, wrapped
    b = jnp.full((1, 1), int(base[0]), jnp.int32)
    s = jnp.full((1, 1), int(size[0]), jnp.int32)
    a0, _, _ = sample_matmaps(tab, b, s, uv0)
    a1, _, _ = sample_matmaps(tab, b, s, uv1)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), atol=1e-5)


@pytest.mark.slow
def test_frame_with_mip_filter_runs():
    """End-to-end: fused raster + mip_half material tap (interpret)."""
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import RenderContext, Camera, RenderParams, primitives
    from datum_tpu.render.renderlist import RenderList
    from datum_tpu.math import Transform

    cfg = FrameConfig(width=128, height=64, max_vertices=512,
                      max_triangles=512, max_instances=4, bin_capacity=64,
                      big_capacity=8, enable_shadows=False,
                      enable_material_maps=True, texture_filter="mip_half",
                      use_pallas=True, pallas_interpret=True)
    ctx = RenderContext(cfg)
    tex = ctx.add_texture(_checker(64))
    mat = ctx.add_material(color=(1, 1, 1, 1), albedomap=tex, roughness=0.6)
    pv, pi = primitives.plane(4.0, 1.0)
    plane = ctx.add_mesh(pv, pi)
    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 1.5, 3.0]), np.array([0.0, 0.0, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=128, height=64)
    rl = RenderList()
    rl.push_mesh(plane, Transform.identity(), mat)

    img = ctx.render(cam, rl, params)
    assert img.shape == (64, 128, 3)
    # the checkerboard must produce both dark and bright floor pixels
    band = img[40:, :, 0].astype(np.float32)
    assert band.std() > 8.0
