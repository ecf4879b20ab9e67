"""Texture sampling: bilinear/trilinear gathers with wrap/clamp modes.

The TPU replacement for Vulkan samplers (reference: renderer.cpp
repeat/clamped samplers bound at set 0).  Textures live as dense
arrays; filtering is explicit gather + lerp.  Layouts:

  texture array:  (N, S, S, C)  — N textures resampled to a common
                  size S (the reference's per-material texture arrays
                  become one indexed pool)
  cubemap:        (6, S, S, C)  — faces ordered +X -X +Y -Y +Z -Z
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

WRAP_REPEAT = 0
WRAP_CLAMP = 1


def _bilerp(t00, t01, t10, t11, fx, fy):
    """Shared bilinear mix — keep every sampling path on one recipe."""
    top = t00 + (t01 - t00) * fx
    bot = t10 + (t11 - t10) * fx
    return top + (bot - top) * fy


def _to_f32(v):
    """u8 textures normalize to [0,1]; everything else passes through —
    ONE rule for every path in this module."""
    if v.dtype == jnp.uint8:
        return v.astype(jnp.float32) * (1.0 / 255.0)
    return v.astype(jnp.float32)


def pack_rows_u8(table):
    """Bitcast an (R, W) f32 row table to (R, 4W) u8 for faster gathers.

    TPU row-gather cost scales with the 32-bit ELEMENT count for f32
    tables but is width-flat for u8 rows (profiling/prof_gather.py:
    12xf32 rows gather at ~27 ns/row, the same 48 bytes as u8 at ~15;
    gather-as-u8 + bitcast-back lands ~20).  Values are bit-identical —
    only the gather dtype changes.  Unpack with take_rows_f32.
    """
    assert table.dtype == jnp.float32, table.dtype
    r, w = table.shape
    return jax.lax.bitcast_convert_type(table, jnp.uint8).reshape(r, 4 * w)


def _row_elems(table):
    """f32 element count of a row table, whether packed or not."""
    return table.shape[-1] // (4 if table.dtype == jnp.uint8 else 1)


def take_rows_f32(table, idx):
    """Row gather returning f32 rows; understands pack_rows_u8 tables
    (u8 dtype == bit-packed f32: gather the bytes, reassemble words).

    The reassembly is strided minor-dim slices + shifts/ors, NOT a
    (..., W, 4) reshape + bitcast: on TPU that reshape retiles the
    minor dims and materialized ~0.19 ms/copy in-frame, eating the
    gather win.  Slices with stride fuse into the elementwise consumer.
    """
    if table.dtype == jnp.uint8:
        rows = table[idx]
        word = (rows[..., 0::4].astype(jnp.int32)
                | (rows[..., 1::4].astype(jnp.int32) << 8)
                | (rows[..., 2::4].astype(jnp.int32) << 16)
                | (rows[..., 3::4].astype(jnp.int32) << 24))
        return jax.lax.bitcast_convert_type(word, jnp.float32)
    return table[idx]


def _wrap_uv(u, size, mode):
    if mode == WRAP_REPEAT:
        return jnp.mod(u, size)
    return jnp.clip(u, 0, size - 1)


def sample_bilinear(tex, tex_ids, uv, mode=WRAP_REPEAT):
    """Bilinear sample from a texture pool.

    tex: (N, S, S, C) float or uint8; tex_ids: (...,) int32; uv: (..., 2)
    in texture coordinates [0,1] (repeat beyond).  Returns (..., C) f32.
    """
    n, s, _, c = tex.shape
    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0w, x1w = _wrap_uv(x0, s, mode), _wrap_uv(x0 + 1, s, mode)
    y0w, y1w = _wrap_uv(y0, s, mode), _wrap_uv(y0 + 1, s, mode)

    def fetch(yy, xx):
        return _to_f32(tex[tex_ids, yy, xx])

    return _bilerp(fetch(y0w, x0w), fetch(y0w, x1w),
                   fetch(y1w, x0w), fetch(y1w, x1w), fx, fy)


def sample_image_bilinear(img, uv, mode=WRAP_CLAMP):
    """Bilinear sample a single (H, W, C) image with uv in [0,1]."""
    h, w = img.shape[:2]
    x = uv[..., 0] * w - 0.5
    y = uv[..., 1] * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    xs = (_wrap_uv(x0, w, mode), _wrap_uv(x0 + 1, w, mode))
    ys = (_wrap_uv(y0, h, mode), _wrap_uv(y0 + 1, h, mode))
    return _bilerp(_to_f32(img[ys[0], xs[0]]), _to_f32(img[ys[0], xs[1]]),
                   _to_f32(img[ys[1], xs[0]]), _to_f32(img[ys[1], xs[1]]),
                   fx, fy)


def cubemap_face_uv(d):
    """Direction (..., 3) -> (face id (...,), uv (..., 2) in [0,1]).

    Face order +X -X +Y -Y +Z -Z with standard cubemap face bases.
    """
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)

    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)

    face = jnp.where(is_x, jnp.where(x > 0, 0, 1),
                     jnp.where(is_y, jnp.where(y > 0, 2, 3),
                               jnp.where(z > 0, 4, 5)))
    ma = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    ma = jnp.maximum(ma, 1e-20)
    # standard face (sc, tc) conventions
    sc = jnp.where(is_x, jnp.where(x > 0, -z, z),
                   jnp.where(is_y, x, jnp.where(z > 0, x, -x)))
    tc = jnp.where(is_x, -y, jnp.where(is_y, jnp.where(y > 0, z, -z), -y))
    u = 0.5 * (sc / ma + 1.0)
    v = 0.5 * (tc / ma + 1.0)
    return face.astype(jnp.int32), jnp.stack([u, v], axis=-1)


def cubemap_texel_dir(face, u, v):
    """Inverse of cubemap_face_uv: face + uv in [0,1] -> direction.

    Used by IBL bakers iterating cubemap texels.
    """
    sc = 2.0 * u - 1.0
    tc = 2.0 * v - 1.0
    one = jnp.ones_like(sc)
    dirs = [
        jnp.stack([one, -tc, -sc], -1),    # +X
        jnp.stack([-one, -tc, sc], -1),    # -X
        jnp.stack([sc, one, tc], -1),      # +Y
        jnp.stack([sc, -one, -tc], -1),    # -Y
        jnp.stack([sc, -tc, one], -1),     # +Z
        jnp.stack([-sc, -tc, -one], -1),   # -Z
    ]
    face = jnp.asarray(face)
    d = dirs[0]
    for i in range(1, 6):
        d = jnp.where((face == i)[..., None], dirs[i], d)
    n = jnp.sqrt(jnp.sum(d * d, -1, keepdims=True))
    return d / n


def sample_cubemap(cube, d):
    """Bilinear cubemap sample (no seam filtering).

    cube: (6, S, S, C); d: (..., 3) directions.  Returns (..., C) f32.
    """
    face, uv = cubemap_face_uv(d)
    s = cube.shape[1]
    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0c, x1c = jnp.clip(x0, 0, s - 1), jnp.clip(x0 + 1, 0, s - 1)
    y0c, y1c = jnp.clip(y0, 0, s - 1), jnp.clip(y0 + 1, 0, s - 1)
    return _bilerp(_to_f32(cube[face, y0c, x0c]), _to_f32(cube[face, y0c, x1c]),
                   _to_f32(cube[face, y1c, x0c]), _to_f32(cube[face, y1c, x1c]),
                   fx, fy)


def sample_cubemap_lod(cube_mips, d, lod):
    """Trilinear-across-mips cubemap sample.

    cube_mips: list of (6, S_i, S_i, C); lod: (...,) continuous mip.
    Linear blend between floor/ceil mips (each bilinear).
    """
    n = len(cube_mips)
    lod = jnp.clip(lod, 0.0, n - 1)
    l0 = jnp.floor(lod).astype(jnp.int32)
    f = (lod - l0)[..., None]
    out0 = jnp.zeros(d.shape[:-1] + (cube_mips[0].shape[-1],), jnp.float32)
    out1 = jnp.zeros_like(out0)
    for i in range(n):
        s_i = sample_cubemap(cube_mips[i], d)
        out0 = jnp.where((l0 == i)[..., None], s_i, out0)
        out1 = jnp.where((jnp.minimum(l0 + 1, n - 1) == i)[..., None], s_i, out1)
    return out0 + (out1 - out0) * f


def flatten_cube_mips(cube_mips):
    """Concatenate a power-of-two mip chain into one flat texel table.

    Returns (table (N, C), bases (n,) int32, sizes (n,) int32).  Feeds
    sample_cubemap_lod_flat: per-pixel trilinear then costs 8 gathers
    instead of 4 gathers per mip level.
    """
    flats, bases, sizes = [], [], []
    off = 0
    for m in cube_mips:
        s = int(m.shape[1])
        flats.append(_to_f32(jnp.asarray(m).reshape(-1, m.shape[-1])))
        bases.append(off)
        sizes.append(s)
        off += 6 * s * s
    return (jnp.concatenate(flats, axis=0), jnp.asarray(bases, jnp.int32),
            jnp.asarray(sizes, jnp.int32))


def _flat_bilinear(table, base, s, face, uv):
    sf = s.astype(jnp.float32)
    x = uv[..., 0] * sf - 0.5
    y = uv[..., 1] * sf - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0c = jnp.clip(x0, 0, s - 1)
    x1c = jnp.clip(x0 + 1, 0, s - 1)
    y0c = jnp.clip(y0, 0, s - 1)
    y1c = jnp.clip(y0 + 1, 0, s - 1)
    row = base + (face * s + y0c) * s
    row1 = base + (face * s + y1c) * s
    return _bilerp(table[row + x0c], table[row + x1c],
                   table[row1 + x0c], table[row1 + x1c], fx, fy)


def sample_cubemap_lod_flat(flat, d, lod):
    """Trilinear cubemap sample from a flattened mip chain.

    flat: (table, bases, sizes) from flatten_cube_mips; d (..., 3);
    lod (...,) continuous.  8 gathers per output texel regardless of
    chain length (vs 4 * n_mips for the dense-select path).
    """
    table, bases, sizes = flat
    n = bases.shape[0]
    lod = jnp.clip(lod, 0.0, n - 1)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n - 1)
    f = (lod - l0)[..., None]
    face, uv = cubemap_face_uv(d)
    s0 = sample_cubemap_lod_flat_level(table, bases, sizes, face, uv, l0)
    s1 = sample_cubemap_lod_flat_level(table, bases, sizes, face, uv, l1)
    return s0 + (s1 - s0) * f


def sample_cubemap_lod_flat_level(table, bases, sizes, face, uv, level):
    return _flat_bilinear(table, bases[level], sizes[level], face, uv)


# ---------------------------------------------------------------------------
# Quad-packed tables: one gather per bilinear tap.
#
# TPU gather cost is per-LOOKUP, not per-byte (profiling/prof_micro.py:
# 2M row-gathers cost ~3.8 ms whether rows are 4 or 48 floats), so
# packing each texel's 2x2 bilinear footprint into its row turns a
# 4-gather bilinear into ONE gather + lerps.
# ---------------------------------------------------------------------------


def quad_pack(img):
    """(H, W, C) -> (H*W, 4C) rows [t(y,x), t(y,x+1), t(y+1,x), t(y+1,x+1)]
    with edge clamp."""
    h, w, c = img.shape
    xr = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    yd = jnp.concatenate([img[1:], img[-1:]], axis=0)
    xyd = jnp.concatenate([yd[:, 1:], yd[:, -1:]], axis=1)
    return jnp.concatenate([img, xr, yd, xyd], axis=-1).reshape(h * w, 4 * c)


def flatten_cube_mips_quad(cube_mips):
    """Quad-packed flat cubemap mip chain.

    Returns (table (N, 4C), bases (n,), sizes (n,)).  Bilinear within a
    face needs ONE gather; trilinear needs two (adjacent mips).  Face
    edges clamp within the face (no seam filtering — same contract as
    sample_cubemap).
    """
    flats, bases, sizes = [], [], []
    off = 0
    for m in cube_mips:
        m = _to_f32(jnp.asarray(m))
        s = int(m.shape[1])
        flats.append(jnp.concatenate(
            [quad_pack(m[f]) for f in range(6)], axis=0))
        bases.append(off)
        sizes.append(s)
        off += 6 * s * s
    return (pack_rows_u8(jnp.concatenate(flats, axis=0)),
            jnp.asarray(bases, jnp.int32), jnp.asarray(sizes, jnp.int32))


def _quad_bilinear(table, base, s, face, uv, channels):
    sf = s.astype(jnp.float32)
    x = uv[..., 0] * sf - 0.5
    y = uv[..., 1] * sf - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    # low-edge clamp must kill the fraction too (the clamped row's +1
    # neighbor is texel 1, but both taps should be texel 0 there)
    fx = jnp.where(x0 < 0, 0.0, x - x0)[..., None]
    fy = jnp.where(y0 < 0, 0.0, y - y0)[..., None]
    # clamp the quad origin; the packed row handles the +1 neighbors
    x0c = jnp.clip(x0, 0, s - 1)
    y0c = jnp.clip(y0, 0, s - 1)
    # edge half-texels: quad row at the clamped origin still interpolates
    # correctly because rows clamp their own neighbors
    row = take_rows_f32(table, base + (face * s + y0c) * s + x0c)  # (..., 4C)
    c = channels
    return _bilerp(row[..., 0:c], row[..., c:2 * c],
                   row[..., 2 * c:3 * c], row[..., 3 * c:4 * c], fx, fy)


def sample_cubemap_lod_quad(flatq, d, lod):
    """Trilinear cubemap sample from a quad-packed mip chain: 2 gathers
    per output texel (one per adjacent mip)."""
    table, bases, sizes = flatq
    c = _row_elems(table) // 4
    n = bases.shape[0]
    lod = jnp.clip(lod, 0.0, n - 1)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n - 1)
    f = (lod - l0)[..., None]
    face, uv = cubemap_face_uv(d)
    s0 = _quad_bilinear(table, bases[l0], sizes[l0], face, uv, c)
    s1 = _quad_bilinear(table, bases[l1], sizes[l1], face, uv, c)
    return s0 + (s1 - s0) * f


def flatten_cube_mips_pair(cube_mips):
    """Mip-PAIR quad-packed cubemap chain: ONE gather per trilinear
    sample (vs two for flatq).

    Each mip-l row carries its own 2x2 quad (4C) plus the 2x2 quad of
    "mip l+1 resampled onto mip l's texel grid" (4C more, 8C total).
    Interpolating the resampled coarse field is a bilinear-of-bilinear —
    up to half a coarse texel blurrier than a true mip-l+1 tap, which is
    invisible on pre-convolved environment/sky chains, and it halves
    the gather count of every env-specular / sky sample (TPU gather
    cost is per-lookup: PERF.md lesson 1).  The last mip pairs with
    itself.
    """
    flats, bases, sizes = [], [], []
    off = 0
    n = len(cube_mips)
    for li, m in enumerate(cube_mips):
        m = _to_f32(jnp.asarray(m))
        s = int(m.shape[1])
        nxt = _to_f32(jnp.asarray(cube_mips[min(li + 1, n - 1)]))
        # resample mip l+1 to this mip's texel centers (per face)
        if nxt.shape[1] != s:
            sn = nxt.shape[1]
            x = (jnp.arange(s, dtype=jnp.float32) + 0.5) * (sn / s) - 0.5
            x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, sn - 1)
            x1 = jnp.minimum(x0 + 1, sn - 1)
            fx = jnp.clip(x - x0, 0.0, 1.0)
            a = nxt[:, x0][:, :, x0]
            b = nxt[:, x0][:, :, x1]
            c_ = nxt[:, x1][:, :, x0]
            d_ = nxt[:, x1][:, :, x1]
            top = a + (b - a) * fx[None, None, :, None]
            bot = c_ + (d_ - c_) * fx[None, None, :, None]
            nxt = top + (bot - top) * fx[None, :, None, None]
        rows = []
        for f in range(6):
            rows.append(jnp.concatenate([quad_pack(m[f]),
                                         quad_pack(nxt[f])], axis=-1))
        flats.append(jnp.concatenate(rows, axis=0))
        bases.append(off)
        sizes.append(s)
        off += 6 * s * s
    return (pack_rows_u8(jnp.concatenate(flats, axis=0)),
            jnp.asarray(bases, jnp.int32), jnp.asarray(sizes, jnp.int32))


def sample_cubemap_lod_pair(flatp, d, lod):
    """Trilinear cubemap sample from a mip-pair quad chain: ONE gather
    per output texel (see flatten_cube_mips_pair)."""
    table, bases, sizes = flatp
    c = _row_elems(table) // 8
    n = bases.shape[0]
    lod = jnp.clip(lod, 0.0, n - 1)
    l0 = jnp.floor(lod).astype(jnp.int32)
    f = (lod - l0)[..., None]
    face, uv = cubemap_face_uv(d)
    base, s = bases[l0], sizes[l0]
    sf = s.astype(jnp.float32)
    x = uv[..., 0] * sf - 0.5
    y = uv[..., 1] * sf - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = jnp.where(x0 < 0, 0.0, x - x0)[..., None]
    fy = jnp.where(y0 < 0, 0.0, y - y0)[..., None]
    x0c = jnp.clip(x0, 0, s - 1)
    y0c = jnp.clip(y0, 0, s - 1)
    row = take_rows_f32(table, base + (face * s + y0c) * s + x0c)  # (..., 8C)
    s0 = _bilerp(row[..., 0:c], row[..., c:2 * c],
                 row[..., 2 * c:3 * c], row[..., 3 * c:4 * c], fx, fy)
    s1 = _bilerp(row[..., 4 * c:5 * c], row[..., 5 * c:6 * c],
                 row[..., 6 * c:7 * c], row[..., 7 * c:8 * c], fx, fy)
    return s0 + (s1 - s0) * f


def sample_cubemap_quad(flatq, d, level=0):
    """Bilinear cubemap sample from a quad-packed chain: ONE gather."""
    table, bases, sizes = flatq
    c = _row_elems(table) // 4
    face, uv = cubemap_face_uv(d)
    return _quad_bilinear(table, bases[level], sizes[level], face, uv, c)
