"""Shadow map raster + PCF cascade lookup (device side).

Replaces the reference shadow pass + shadow sampling (reference:
renderer.cpp:6458-6473 4-slice D32 array raster via
model/actor.shadow.vert + shadow.geom instanced layer routing;
data/lighting.inc shadow_split smoothstep cascade blend +
shadow_intensity 12-tap Poisson PCF).  Cascade raster is a vmap of the
visibility rasterizer in depth-only mode; the PCF compare uses the
reverse-Z convention (nearest occluder = max depth).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import raster as raster_ops
from .common import gather_pair8, gather_row8

# 12-tap unit-disk pattern (blue-noise-ish, deterministic); role matches
# the reference's PoissonDisk table
_golden = np.pi * (3 - np.sqrt(5))
_r = np.sqrt((np.arange(12) + 0.5) / 12)
_a = np.arange(12) * _golden
POISSON = np.stack([_r * np.cos(_a), _r * np.sin(_a)], -1).astype(np.float32)


def _render_cascade_stack(p0, p1, p2, shared, shadowview, *, res,
                          bin_capacity, big_capacity, use_pallas,
                          interpret, early_z=True):
    """One vertically stacked depth raster over the given slice subset
    (SoA corner components pre-gathered).  Returns (S, res, res)."""
    n_slices = shadowview.shape[0]
    tiles_x = res // raster_ops.TILE_W
    tiles_y = (res * n_slices) // raster_ops.TILE_H
    vh = res * n_slices
    T = p0.shape[1]

    # band remap in clip space: y' = (y + (2s - (n-1)) * w) / n_slices
    names = ("x", "y", "z", "w")
    parts = {f"{n}{j}": [] for n in names for j in range(3)}
    for s in range(n_slices):
        m = shadowview[s]
        off = (2.0 * s - (n_slices - 1)) / n_slices
        for j, p in enumerate((p0, p1, p2)):
            cx = m[0, 0] * p[0] + m[0, 1] * p[1] + m[0, 2] * p[2] + m[0, 3]
            cy = m[1, 0] * p[0] + m[1, 1] * p[1] + m[1, 2] * p[2] + m[1, 3]
            cz = m[2, 0] * p[0] + m[2, 1] * p[1] + m[2, 2] * p[2] + m[2, 3]
            cw = m[3, 0] * p[0] + m[3, 1] * p[1] + m[3, 2] * p[2] + m[3, 3]
            parts[f"x{j}"].append(cx)
            parts[f"y{j}"].append(cy * (1.0 / n_slices) + off * cw)
            parts[f"z{j}"].append(cz)
            parts[f"w{j}"].append(cw)
    comps = {k: jnp.concatenate(v) for k, v in parts.items()}
    shared_all = jnp.tile(shared, n_slices)

    # per-band scissor: casters crossing a slice frustum's y-planes are
    # not clipped by the homogeneous raster, so bound coverage to the
    # triangle's own band (applied per pixel inside the raster)
    band = jnp.arange(n_slices * T, dtype=jnp.int32) // T
    band_lo = -1.0 + band.astype(jnp.float32) * (2.0 / n_slices)
    # cull casters facing away from the light (cull=-1); tight pair-span
    # keeps the binning sort array (max_span * 4T entries) small
    setup = raster_ops.triangle_setup_comps(
        comps, shared_all, res, vh, tiles_x, tiles_y, cull=-1, max_span=4,
        ylim=(band_lo, band_lo + 2.0 / n_slices))
    # near-to-light priority: saturated far-cascade bins then drop only
    # triangles already occluded in light space (zbound == zmax for the
    # ortho light projection's w == 1, and doubles as the early-z band
    # bound source — see suffix_zbound_groups_banded)
    # tri_block: each slice's triangles only bin into its own band of
    # the stacked atlas, so the sort key packs tri % T — 2 fewer key
    # bits, keeping depth-prio binning viable at stress scale (256k
    # casters x 4 slices)
    bins, counts, big, bin_zub = raster_ops.bin_triangles(
        setup, n_slices * T, tiles_x, tiles_y, bin_capacity,
        big_capacity, max_span=4, depth_prio=setup["zbound"],
        return_zub=True,
        tri_block=(n_slices, (tiles_x * tiles_y) // n_slices))
    if use_pallas:
        from .raster_pallas import raster_depth_pallas
        depth = raster_depth_pallas(setup, bins, big, counts,
                                    tiles_x, tiles_y, res, vh,
                                    interpret=interpret, early_z=early_z,
                                    bin_zub=bin_zub)
    else:
        depth, _ = raster_ops.raster(setup, bins, big, tiles_x, tiles_y,
                                     res, vh)
    return depth.reshape(n_slices, res, res)


def render_shadow_cascades(world_pos, tris, shadowview, *, res=1024,
                           bin_capacity=128, big_capacity=32, use_pallas=False,
                           interpret=False, far_res=None, near_slices=2,
                           early_z=True):
    """Rasterize depth-only cascades in ONE pass (two with mixed res).

    All S slices render into a vertically stacked virtual framebuffer
    (res wide, S*res tall): each slice's projection is rescaled on the
    fly so its NDC maps to its band — one triangle-stream (S copies with
    remapped matrices), one binning sort, one raster launch instead of
    S.  world_pos: (V, 3); tris: (T, 3); shadowview: (S, 4, 4).
    Returns (S, res, res) reverse-Z depth — or, with far_res set, a LIST
    of per-slice maps [(res, res)] * near_slices +
    [(far_res, far_res)] * rest.

    far_res: render cascades >= near_slices at this reduced resolution
    (their world extent is 2-4x the near cascades', so screen-space
    texel density is already far lower — the perf dial the reference
    exposes as per-cascade map sizing).  build_esm accepts the mixed
    list and upsamples after the native-res blur, so every downstream
    consumer keeps the uniform (S, R, R) contract.
    """
    # gather the triangle corners ONCE (3 row gathers at T lookups),
    # transpose to SoA (3, T): the per-slice transform + setup math then
    # runs on (T,)-lane arrays — the old (S*V, 4) @ matrix formulation
    # plus (S*T,3,3) AoS setup measured ~3 ms at S*T=131k of lane-starved
    # ops (profiling/prof_shadow3.py)
    p0 = world_pos[tris[:, 0]].T                              # (3, T)
    p1 = world_pos[tris[:, 1]].T
    p2 = world_pos[tris[:, 2]].T
    shared = ((tris[:, 0] == tris[:, 1]) | (tris[:, 1] == tris[:, 2])
              | (tris[:, 0] == tris[:, 2]))
    kw = dict(bin_capacity=bin_capacity, big_capacity=big_capacity,
              use_pallas=use_pallas, interpret=interpret, early_z=early_z)

    n_slices = shadowview.shape[0]
    if far_res is None or far_res == res or n_slices <= near_slices:
        return _render_cascade_stack(p0, p1, p2, shared, shadowview,
                                     res=res, **kw)
    near = _render_cascade_stack(p0, p1, p2, shared,
                                 shadowview[:near_slices], res=res, **kw)
    far = _render_cascade_stack(p0, p1, p2, shared,
                                shadowview[near_slices:], res=far_res, **kw)
    return [near[s] for s in range(near_slices)] + \
        [far[s] for s in range(n_slices - near_slices)]


ESM_C = 40.0


def build_esm(shadowmaps, shadowview, blur_sigma=1.5):
    """Exponential shadow maps from raw cascade depth.

    Per cascade we store E[exp(c * d')] blurred in light space, where
    d' = (zmax - z) / scale is depth-from-nearest-occluder normalized by
    the cascade's world extent (keeps the exponent bounded regardless of
    the 1000-unit light extrusion).  The per-pixel test is then ONE
    bilinear tap: lit = clamp(esm_tap * exp(-c * d'_ref), 0, 1) — the
    TPU-friendly replacement for 48-tap PCF; the reference applies the
    same ESM transform for its fog shadowing (reference:
    data/esm.gen.comp exp(30*z) + separable blurs).

    Returns (esm (S, R, R), zmax (S,), zscale (S,)) with zscale mapping
    raw depth differences to the normalized d' domain.

    shadowmaps: (S, R, R) stack, or a mixed-res LIST of per-slice maps
    (render_shadow_cascades far_res) — reduced slices blur at native res
    and upsample to the max res afterward, so the returned stack (and
    every consumer) keeps the uniform shape.
    """
    from .blur import resize_up_dense, shifted_gaussian_blur

    nslices = len(shadowmaps)
    max_res = max(m.shape[-1] for m in shadowmaps) \
        if isinstance(shadowmaps, (list, tuple)) else shadowmaps.shape[-1]
    esms, zmaxs, zscales = [], [], []
    for s in range(nslices):
        m = shadowview[s]
        # cascade world extent (ortho half-width r: |m[0,:3]| == 1/r)
        extent = 2.0 / jnp.maximum(jnp.linalg.norm(m[0, :3]), 1e-9)
        depth_per_world = jnp.linalg.norm(m[2, :3])
        norm_scale = 1.0 / jnp.maximum(depth_per_world * extent, 1e-12)
        zmax = jnp.max(shadowmaps[s])
        # d' = 0 at the nearest occluder, grows away from the light;
        # background (raw depth 0) maps to the largest d' -> reads lit
        dprime = (zmax - shadowmaps[s]) * norm_scale
        # cap the exponent: the box-blur cumsum differences lose f32
        # precision when the dynamic range exceeds ~1e4 of the window sum
        e = jnp.exp(jnp.clip(ESM_C * dprime, 0.0, 20.0))
        # cancellation-free blur: cumsum box chains destroy small window
        # sums next to e^20 background texels (blocky shadow noise)
        e = shifted_gaussian_blur(e, blur_sigma, radius=3)
        if e.shape[-1] != max_res:
            e = resize_up_dense(e, max_res, max_res)
        esms.append(e)
        zmaxs.append(zmax)
        zscales.append(norm_scale)
    return jnp.stack(esms), jnp.stack(zmaxs), jnp.stack(zscales)


def build_esm_pair(esm, shadowview):
    """Pack each cascade with its successor resampled onto its grid.

    Sun cascades share the light's orientation — only the ortho extents
    and centers differ — so the uv mapping between adjacent slices is a
    pure per-axis scale+translate and the resample is two small dense
    matmuls per slice (MXU work, no gathers).  The blended factor tap
    (shadow_factor_esm_fast slice_blend + esm_pair) then reads BOTH
    slices from one 8-byte row: gather cost on TPU is per row, so the
    reference's cascade-boundary lerp (lighting.comp:63-95) becomes
    free relative to the unblended path.

    Returns (S, R, R, 2): [..., 0] the slice's own ESM, [..., 1] the
    next slice's ESM at the same world position (last slice duplicates
    itself; its blend weight is forced to 0).
    """
    S, R, _ = esm.shape
    j = jnp.arange(R, dtype=jnp.float32)

    def axis_map(r0, r1):
        # clip'_{s+1} = a * clip_s + b along a shared axis direction
        n0 = jnp.sum(r0[:3] * r0[:3])
        a = jnp.sum(r1[:3] * r0[:3]) / jnp.maximum(n0, 1e-12)
        b = r1[3] - a * r0[3]
        return a, b

    def wmat(a, b):
        # bilinear pull weights: target texel i of slice s reads source
        # coordinate y' of slice s+1 (edge-clamped)
        u = (j + 0.5) * (1.0 / R)
        c = a * (2.0 * u - 1.0) + b
        y = jnp.clip((c * 0.5 + 0.5) * R - 0.5, 0.0, R - 1.0)
        return jnp.maximum(1.0 - jnp.abs(y[:, None] - j[None, :]), 0.0)

    outs = []
    for s in range(S):
        if s == S - 1:
            outs.append(jnp.stack([esm[s], esm[s]], -1))
            continue
        ax, bx = axis_map(shadowview[s, 0], shadowview[s + 1, 0])
        ay, by = axis_map(shadowview[s, 1], shadowview[s + 1, 1])
        # f32 throughout: ESM texels span ~e^20 and bf16-mantissa MXU
        # passes would put ~0.5% noise into the factor
        nxt = jnp.einsum("ik,kl,jl->ij", wmat(ay, by), esm[s + 1],
                         wmat(ax, bx),
                         precision=jax.lax.Precision.HIGHEST)
        outs.append(jnp.stack([esm[s], nxt], -1))
    return jnp.stack(outs)


def shadow_factor_esm(worldpos, esm, zmax, zscale, splits, shadowview, view_dist,
                      normal=None, nearest=False):
    """Single-tap ESM shadow factor.

    lit = clamp(E[exp(c d'_occ)] * exp(-c d'_ref), 0, 1): an occluder
    nearer to the light than the receiver (d'_occ < d'_ref) drives the
    product below 1; background/no-occluder taps exceed 1 and clamp to
    lit.  Selects the first cascade containing the point (hard select —
    the ESM blur already softens boundaries).
    """
    nslices, res, _ = esm.shape
    factor = jnp.ones(worldpos.shape[:-1], jnp.float32)
    chosen = jnp.zeros_like(factor, dtype=jnp.bool_)

    for s in range(nslices):
        m = shadowview[s]
        wtexel = 2.0 / (res * jnp.linalg.norm(m[0, :3]))
        pos = worldpos if normal is None else worldpos + normal * (1.5 * wtexel)
        clip = pos @ m[:3, :3].T + m[:3, 3]
        u = clip[..., 0] * 0.5 + 0.5
        v = clip[..., 1] * 0.5 + 0.5
        ref = clip[..., 2]
        inside = (u > 0.01) & (u < 0.99) & (v > 0.01) & (v < 0.99) \
            & (ref > 0) & (ref < 1) & (view_dist < splits[s] * 1.05)
        x = u * res - 0.5
        y = v * res - 0.5
        if nearest:
            xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, res - 1)
            yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, res - 1)
            tap = esm[s, yi, xi]
        else:
            x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, res - 1)
            y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, res - 1)
            x1 = jnp.minimum(x0 + 1, res - 1)
            y1 = jnp.minimum(y0 + 1, res - 1)
            fx = jnp.clip(x - x0, 0, 1)
            fy = jnp.clip(y - y0, 0, 1)
            e00 = esm[s, y0, x0]
            e01 = esm[s, y0, x1]
            e10 = esm[s, y1, x0]
            e11 = esm[s, y1, x1]
            tap = ((e00 * (1 - fx) + e01 * fx) * (1 - fy)
                   + (e10 * (1 - fx) + e11 * fx) * fy)
        # receiver normalized depth-from-nearest, slope bias of ~2 texels
        dref = (zmax[s] - ref) * zscale[s]
        bias = wtexel * zscale[s] * jnp.linalg.norm(m[2, :3]) * 2.0
        lit = jnp.clip(tap * jnp.exp(jnp.clip(-ESM_C * (dref - bias), -20.0, 20.0)),
                       0.0, 1.0)
        use = inside & (~chosen)
        factor = jnp.where(use, lit, factor)
        chosen = chosen | inside
    return factor


def sun_shadow_factor_quarter(depth, nrm_planes, shadowmaps, sceneset, *,
                              proj, invview, scale=4, y0=0,
                              full_height=None, slice_blend=0.0):
    """Quarter-res sun ESM factor straight from the depth plane.

    Feeds the deferred-shade megakernel (ops/shade_pallas.py), which
    upsamples it in-kernel — no full-res worldpos is ever materialized.
    y0/full_height (full-res units) globalize the reconstruction for
    tile-sharded bands.
    """
    from .blur import downsample_pool
    from .lighting_pass import reconstruct_positions

    esm, zmx, zsc = shadowmaps[:3]
    esm_pair = shadowmaps[3] if len(shadowmaps) > 3 else None
    dq = downsample_pool(depth, scale, reduce="first")
    h4, w4 = dq.shape
    fh4 = (full_height // scale) if full_height is not None else h4
    viewpos, wpos = reconstruct_positions(dq, proj, invview, w4, fh4,
                                          y0=y0 // scale)
    nrm = jnp.stack([downsample_pool(nrm_planes[0], scale, reduce="first"),
                     downsample_pool(nrm_planes[1], scale, reduce="first"),
                     downsample_pool(nrm_planes[2], scale, reduce="first")],
                    axis=-1)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-6)
    ml = sceneset["mainlight"]
    return shadow_factor_esm_fast(wpos, esm, zmx, zsc, ml["splits"],
                                  ml["shadowview"], -viewpos[..., 2],
                                  normal=nrm, slice_blend=slice_blend,
                                  esm_pair=esm_pair)


SPOT_ESM_C = 30.0


def build_spot_esm(spotmaps, blur_sigma=1.0):
    """Exponential transform + blur of spot depth maps.

    factor = clamp(E[exp(-c*occ)] * exp(c*ref)): a receiver further from
    the light than the stored occluder (ref < occ in reverse-Z) goes
    dark; empty texels (occ = 0) read lit.  Soft edges come from the
    light-space blur (the reference spot path is PCF-soft).
    """
    from .blur import shifted_gaussian_blur

    e = jnp.exp(-SPOT_ESM_C * jnp.clip(spotmaps, 0.0, 1.0))
    return jnp.stack([shifted_gaussian_blur(e[i], blur_sigma, radius=2)
                      for i in range(e.shape[0])])


def spot_factor_quarter(depth, spot_esm, shadowview, *, proj, invview,
                        scale=4, y0=0, full_height=None):
    """Quarter-res shadow factor for ONE spot light from its ESM map."""
    from .blur import downsample_pool
    from .lighting_pass import reconstruct_positions

    res = spot_esm.shape[0]
    dq = downsample_pool(depth, scale, reduce="first")
    h4, w4 = dq.shape
    fh4 = (full_height // scale) if full_height is not None else h4
    _, wpos = reconstruct_positions(dq, proj, invview, w4, fh4,
                                    y0=y0 // scale)
    hp = wpos @ shadowview[:3, :3].T + shadowview[:3, 3]
    ww = wpos @ shadowview[3, :3] + shadowview[3, 3]
    ws = jnp.where(jnp.abs(ww) < 1e-8, 1e-8, ww)
    u = hp[..., 0] / ws * 0.5 + 0.5
    v = hp[..., 1] / ws * 0.5 + 0.5
    ref = hp[..., 2] / ws
    inside = (u > 0) & (u < 1) & (v > 0) & (v < 1) & (ref > 0) & (ref < 1) \
        & (ww > 0)
    xi = jnp.clip((u * res).astype(jnp.int32), 0, res - 1)
    yi = jnp.clip((v * res).astype(jnp.int32), 0, res - 1)
    tap = gather_row8(spot_esm.reshape(-1), yi * res + xi)
    lit = jnp.clip(tap * jnp.exp(jnp.clip(SPOT_ESM_C * ref, 0.0, 30.0)),
                   0.0, 1.0)
    return jnp.where(inside, lit, 1.0)


def render_spot_maps_parabolic(world_pos, tris, spotview_rigid, spot_far,
                               n_maps, *, res=256, bin_capacity=128,
                               big_capacity=32, interpret=False,
                               early_z=True):
    """Parabolic spot shadow maps (reference: data/transform.inc:187
    map_parabolic + src/renderer/spotmap.cpp).

    Each caster vertex maps through the paraboloid x' = vx/(L - vz),
    y' = vy/(L - vz) with depth 1 - L/far (reverse), covering the whole
    front hemisphere regardless of cone angle — triangle edges stay
    linear between warped vertices exactly as the reference's
    vertex-warp + hardware raster does.  All n_maps spots raster into
    one vertically stacked virtual framebuffer (one binning + launch).
    """
    from .common import TILE_W
    res = max(res, TILE_W)
    n = n_maps
    tiles_x = res // raster_ops.TILE_W
    tiles_y = (res * n) // raster_ops.TILE_H
    vh = res * n
    T = tris.shape[0]

    p0 = world_pos[tris[:, 0]].T                              # (3, T)
    p1 = world_pos[tris[:, 1]].T
    p2 = world_pos[tris[:, 2]].T
    shared = ((tris[:, 0] == tris[:, 1]) | (tris[:, 1] == tris[:, 2])
              | (tris[:, 0] == tris[:, 2]))

    names = ("x", "y", "z", "w")
    parts = {f"{nm}{j}": [] for nm in names for j in range(3)}
    valid_parts = []
    for s in range(n):
        m = spotview_rigid[s]
        far = jnp.maximum(spot_far[s], 1e-3)
        off = (2.0 * s - (n - 1)) / n
        corner_ok = []
        for j, p in enumerate((p0, p1, p2)):
            vx = m[0, 0] * p[0] + m[0, 1] * p[1] + m[0, 2] * p[2] + m[0, 3]
            vy = m[1, 0] * p[0] + m[1, 1] * p[1] + m[1, 2] * p[2] + m[1, 3]
            vz = m[2, 0] * p[0] + m[2, 1] * p[1] + m[2, 2] * p[2] + m[2, 3]
            L = jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-12))
            denom = jnp.maximum(L - vz, 1e-6)
            px = vx / denom
            py = vy / denom
            parts[f"x{j}"].append(px)
            parts[f"y{j}"].append(py * (1.0 / n) + off)
            parts[f"z{j}"].append(1.0 - L / far)
            parts[f"w{j}"].append(jnp.ones_like(px))
            # reject corners near the paraboloid singularity (behind
            # the light): the warp folds there
            corner_ok.append(vz < 0.6 * L)
        valid_parts.append(corner_ok[0] & corner_ok[1] & corner_ok[2])
    comps = {k: jnp.concatenate(v) for k, v in parts.items()}
    shared_all = jnp.tile(shared, n)
    tri_valid = jnp.concatenate(valid_parts)

    band = jnp.arange(n * T, dtype=jnp.int32) // T
    band_lo = -1.0 + band.astype(jnp.float32) * (2.0 / n)
    setup = raster_ops.triangle_setup_comps(
        comps, shared_all, res, vh, tiles_x, tiles_y, cull=0, max_span=4,
        tri_valid=tri_valid, ylim=(band_lo, band_lo + 2.0 / n))
    bins, counts, big, bin_zub = raster_ops.bin_triangles(
        setup, n * T, tiles_x, tiles_y, bin_capacity, big_capacity,
        max_span=4, depth_prio=setup["zbound"], return_zub=True)
    from .raster_pallas import raster_depth_pallas
    depth = raster_depth_pallas(setup, bins, big, counts, tiles_x, tiles_y,
                                res, vh, interpret=interpret,
                                early_z=early_z, bin_zub=bin_zub)
    return depth.reshape(n, res, res)


def spot_factor_quarter_parabolic(depth, spot_esm, view_rigid, far, *,
                                  proj, invview, scale=4, y0=0,
                                  full_height=None):
    """Quarter-res parabolic spot factor from its ESM map."""
    from .blur import downsample_pool
    from .lighting_pass import reconstruct_positions

    res = spot_esm.shape[0]
    dq = downsample_pool(depth, scale, reduce="first")
    h4, w4 = dq.shape
    fh4 = (full_height // scale) if full_height is not None else h4
    _, wpos = reconstruct_positions(dq, proj, invview, w4, fh4,
                                    y0=y0 // scale)
    m = view_rigid
    vx = wpos @ m[0, :3] + m[0, 3]
    vy = wpos @ m[1, :3] + m[1, 3]
    vz = wpos @ m[2, :3] + m[2, 3]
    L = jnp.sqrt(jnp.maximum(vx * vx + vy * vy + vz * vz, 1e-12))
    denom = jnp.maximum(L - vz, 1e-6)
    px = vx / denom
    py = vy / denom
    ref = 1.0 - L / jnp.maximum(far, 1e-3)
    inside = (px * px + py * py < 0.96) & (ref > 0) & (ref < 1) \
        & (vz < 0.6 * L)
    u = px * 0.5 + 0.5
    v = py * 0.5 + 0.5
    xi = jnp.clip((u * res).astype(jnp.int32), 0, res - 1)
    yi = jnp.clip((v * res).astype(jnp.int32), 0, res - 1)
    tap = gather_row8(spot_esm.reshape(-1), yi * res + xi)
    lit = jnp.clip(tap * jnp.exp(jnp.clip(SPOT_ESM_C * ref, 0.0, 30.0)),
                   0.0, 1.0)
    return jnp.where(inside, lit, 1.0)


def render_spot_maps(world_pos, tris, spotview, n_maps, *, res=256,
                     bin_capacity=128, big_capacity=32, use_pallas=False,
                     interpret=False, early_z=True):
    """Depth maps for the first n_maps spot lights (reference:
    src/renderer/spotmap.cpp render_spotmaps — one D32 target per spot,
    parabolic in the reference, perspective here)."""
    from .common import TILE_W
    res = max(res, TILE_W)      # raster tiles are TILE_W wide
    return render_shadow_cascades(world_pos, tris, spotview[:n_maps],
                                  res=res, bin_capacity=bin_capacity,
                                  big_capacity=big_capacity,
                                  use_pallas=use_pallas, interpret=interpret,
                                  early_z=early_z)


def spot_shadow_factor(worldpos, spotmap, shadowview, bias=2e-3):
    """Single-tap perspective shadow test for one spot light.

    worldpos (H, W, 3); spotmap (R, R) reverse-Z; shadowview (4, 4).
    """
    res = spotmap.shape[0]
    hp = worldpos @ shadowview[:3, :3].T + shadowview[:3, 3]
    ww = worldpos @ shadowview[3, :3] + shadowview[3, 3]
    ws = jnp.where(jnp.abs(ww) < 1e-8, 1e-8, ww)
    u = hp[..., 0] / ws * 0.5 + 0.5
    v = hp[..., 1] / ws * 0.5 + 0.5
    ref = hp[..., 2] / ws
    inside = (u > 0) & (u < 1) & (v > 0) & (v < 1) & (ref > 0) & (ref < 1) & (ww > 0)
    xi = jnp.clip((u * res).astype(jnp.int32), 0, res - 1)
    yi = jnp.clip((v * res).astype(jnp.int32), 0, res - 1)
    stored = spotmap[yi, xi]
    lit = (stored <= ref + bias).astype(jnp.float32)
    return jnp.where(inside, lit, 1.0)


def shadow_split_weights(splits, nslices, depth_dist):
    """Per-cascade blend weights (reference: lighting.inc shadow_split).

    splits: (4,) slice far distances; depth_dist: (...,) view distance.
    Returns (..., 4) weights summing to <= 1.
    """
    s = splits[:3]
    t = jnp.clip((depth_dist[..., None] - 0.75 * s) / (s - 0.75 * s), 0.0, 1.0)
    t = t * t * (3 - 2 * t)                      # smoothstep
    a = jnp.concatenate([t, jnp.zeros_like(t[..., :1])], -1)
    b = jnp.concatenate([jnp.ones_like(t[..., :1]), t], -1)
    w = (1 - a) * b
    mask = jnp.arange(4) < nslices
    return jnp.where(mask, w, 0.0)


def shadow_factor(worldpos, shadowmaps, splits, shadowview, view_dist,
                  normal=None, spread=1.5):
    """PCF shadow factor in [0,1] for the main light.

    worldpos: (H, W, 3); shadowmaps: (S, R, R) reverse-Z;
    view_dist: (H, W) positive view distance for cascade selection;
    normal (H, W, 3) enables normal-offset sampling against acne.
    Bias is slope-scaled per cascade from the light matrix's texel
    footprint.
    """
    nslices, res, _ = shadowmaps.shape
    weights = shadow_split_weights(splits, nslices, view_dist)     # (H, W, S)

    factor = jnp.ones(worldpos.shape[:-1], jnp.float32)
    total_w = jnp.zeros_like(factor)
    lit_acc = jnp.zeros_like(factor)
    texel = spread / res

    for s in range(nslices):
        m = shadowview[s]
        # world size of one texel and depth scale of this cascade
        wtexel = 2.0 / (res * jnp.linalg.norm(m[0, :3]))
        zscale = jnp.linalg.norm(m[2, :3])
        bias = 2.0 * wtexel * zscale + 1e-5
        pos = worldpos
        if normal is not None:
            pos = worldpos + normal * (1.5 * wtexel)
        clip = pos @ m[:3, :3].T + m[:3, 3]
        # ortho: w == 1
        u = clip[..., 0] * 0.5 + 0.5
        v = clip[..., 1] * 0.5 + 0.5
        ref = clip[..., 2]
        inside = (u > 0) & (u < 1) & (v > 0) & (v < 1) & (ref > 0) & (ref < 1)
        lit = jnp.zeros_like(factor)
        for k in range(POISSON.shape[0]):
            su = jnp.clip(((u + POISSON[k, 0] * texel) * res).astype(jnp.int32), 0, res - 1)
            sv = jnp.clip(((v + POISSON[k, 1] * texel) * res).astype(jnp.int32), 0, res - 1)
            stored = shadowmaps[s, sv, su]
            # reverse-Z: occluder nearer to light => stored > ref
            lit = lit + (stored <= ref + bias).astype(jnp.float32)
        lit = lit / POISSON.shape[0]
        w_s = weights[..., s] * inside.astype(jnp.float32)
        lit_acc = lit_acc + w_s * lit
        total_w = total_w + w_s

    return jnp.where(total_w > 1e-6, lit_acc / jnp.maximum(total_w, 1e-6), 1.0)


def shadow_factor_esm_fast(worldpos, esm, zmax, zscale, splits, shadowview,
                           view_dist, normal=None, slice_blend=0.0,
                           esm_pair=None, affine_next=True):
    """Single-gather ESM factor: per-pixel cascade chosen arithmetically,
    then ONE combined nearest tap from the stacked maps.

    The general path gathers once per slice (4x the taps) — at TPU
    gather throughput (~15-25 ms per 2M taps) that dominated lighting.

    slice_blend > 0 adds the reference's cascade-boundary lerp
    (lighting.comp:63-95 blends slice N into N+1 over the tail of each
    split range): a second tap from the next slice, mixed over the last
    `slice_blend` fraction of the slice — hides resolution seams at
    cascade boundaries.  Default blend path (`affine_next`): the next
    slice's clip coords come from per-slice affine constants (sun
    cascades share axes) and the second tap is one more ~0.2 ms row
    gather.  `esm_pair` (build_esm_pair) packs both slices into one
    8-byte row instead — kept as an alternate path, but on v5e it
    measured WORSE: the pair table rebuilds every frame (~3.4 ms of
    einsum resample) and the pair gather traced ~3x a plain row gather
    (round-5 trace, PERF.md).  `affine_next=False` falls back to the
    fully general second projection (cascades with unrelated axes).
    """
    nslices, res, _ = esm.shape
    # monotonic splits -> slice index = count of splits below the distance
    s_sel = jnp.zeros(view_dist.shape, jnp.int32)
    for s in range(nslices - 1):
        s_sel = s_sel + (view_dist > splits[s] * 1.05).astype(jnp.int32)

    # per-slice scalars via where-chains, not gathers — gather cost is
    # per-lookup regardless of table size, selects are free.  Matrix
    # COEFFICIENTS select individually too: broadcasting (N, 4, 4)
    # matrices puts 4 on the lane axis (124/128 lanes idle)
    xnorm = jnp.linalg.norm(shadowview[:, 0, :3], axis=-1)
    znorm = jnp.linalg.norm(shadowview[:, 2, :3], axis=-1)

    def sel(table):
        out = jnp.full(s_sel.shape, table[0])
        for s in range(1, nslices):
            out = jnp.where(s_sel == s, table[s], out)
        return out

    def project_of(s_sel, sel):
        """Everything per-slice EXCEPT the tap (no gathers): texel
        index, inside mask, and the exp term the tap multiplies."""
        m = [[sel(shadowview[:, r_, c_]) for c_ in range(4)]
             for r_ in range(3)]
        zmax_sel = sel(zmax)
        zscale_sel = sel(zscale)
        xnorm_sel = sel(xnorm)
        znorm_sel = sel(znorm)
        wtexel = 2.0 / (res * xnorm_sel)
        pos = (worldpos if normal is None
               else worldpos + normal * (1.5 * wtexel)[..., None])

        px, py, pz = pos[..., 0], pos[..., 1], pos[..., 2]
        cx = m[0][0] * px + m[0][1] * py + m[0][2] * pz + m[0][3]
        cy = m[1][0] * px + m[1][1] * py + m[1][2] * pz + m[1][3]
        ref = m[2][0] * px + m[2][1] * py + m[2][2] * pz + m[2][3]
        u = cx * 0.5 + 0.5
        v = cy * 0.5 + 0.5
        inside = (u > 0.01) & (u < 0.99) & (v > 0.01) & (v < 0.99) \
            & (ref > 0) & (ref < 1)
        xi = jnp.clip((u * res).astype(jnp.int32), 0, res - 1)
        yi = jnp.clip((v * res).astype(jnp.int32), 0, res - 1)

        dref = (zmax_sel - ref) * zscale_sel
        bias = wtexel * zscale_sel * znorm_sel * 2.0
        expt = jnp.exp(jnp.clip(-ESM_C * (dref - bias), -20.0, 20.0))
        return xi, yi, inside, expt, (cx, cy, ref)

    def lit_of(tap, inside, expt):
        return jnp.where(inside, jnp.clip(tap * expt, 0.0, 1.0), 1.0)

    xi, yi, inside, expt, clip_sel = project_of(s_sel, sel)
    blend_on = slice_blend > 0 and nslices > 1

    if esm_pair is not None and blend_on:
        # pair-row mode (build_esm_pair): one 8-byte gather carries
        # both slices.  KEPT AS AN ALTERNATE PATH ONLY — on v5e the
        # pair-table build traced at ~3.4 ms/frame (the einsum
        # resample re-runs every frame) and the pair gather at
        # ~0.67 ms/call vs gather_row8's ~0.2, so the round-5 default
        # is affine_next below (PERF.md round-5).
        row = gather_pair8(esm_pair.reshape(-1, 2),
                           (s_sel * res + yi) * res + xi)
        lit = lit_of(row[..., 0], inside, expt)
    else:
        lit = lit_of(gather_row8(esm.reshape(-1),
                                 (s_sel * res + yi) * res + xi),
                     inside, expt)
    if blend_on:
        # fraction into the current slice's range, 0 at its near split
        lo = jnp.where(s_sel > 0, sel(jnp.concatenate(
            [splits[:1] * 0, splits[:nslices - 1]])) * 1.05, 0.0)
        hi = sel(splits[:nslices])
        t_ = (view_dist - lo) / jnp.maximum(hi - lo, 1e-3)
        wgt = jnp.clip((t_ - (1.0 - slice_blend)) / slice_blend, 0.0, 1.0)
        # the LAST slice has no successor to blend into
        wgt = jnp.where(s_sel >= nslices - 1, 0.0, wgt)
        s_next = jnp.minimum(s_sel + 1, nslices - 1)

        def sel_next(table):
            out = jnp.full(s_next.shape, table[0])
            for s in range(1, nslices):
                out = jnp.where(s_next == s, table[s], out)
            return out

        if esm_pair is not None or affine_next:
            # sun cascades share axes, so the NEXT slice's clip coords
            # are affine in this slice's: a per-slice constants table
            # replaces the whole second projection (12 matrix selects +
            # 9 muls -> 6 selected scalars).  Residual approximation:
            # the normal-offset receiver bias uses THIS slice's texel
            # size, a sub-texel difference at the blend seam.
            r3 = shadowview[:, :3, :3]                       # (S, 3, 3)
            n2 = jnp.maximum(jnp.sum(r3 * r3, -1), 1e-12)    # (S, 3)
            nxtv = jnp.concatenate([shadowview[1:], shadowview[-1:]], 0)
            a_rc = jnp.sum(nxtv[:, :3, :3] * r3, -1) / n2    # (S, 3)
            b_rc = nxtv[:, :3, 3] - a_rc * shadowview[:, :3, 3]
            cx, cy, ref = clip_sel
            cxn = sel(a_rc[:, 0]) * cx + sel(b_rc[:, 0])
            cyn = sel(a_rc[:, 1]) * cy + sel(b_rc[:, 1])
            refn = sel(a_rc[:, 2]) * ref + sel(b_rc[:, 2])
            inn = (jnp.abs(cxn) < 0.98) & (jnp.abs(cyn) < 0.98) \
                & (refn > 0) & (refn < 1)

            def sel_shift(table):
                return sel(jnp.concatenate([table[1:], table[-1:]]))

            zscn = sel_shift(zscale)
            drefn = (sel_shift(zmax) - refn) * zscn
            biasn = (2.0 / (res * sel_shift(xnorm))) * zscn \
                * sel_shift(znorm) * 2.0
            exptn = jnp.exp(jnp.clip(-ESM_C * (drefn - biasn),
                                     -20.0, 20.0))
            if esm_pair is not None:
                lit_next = lit_of(row[..., 1], inn, exptn)
            else:
                # round-5 default: tap the NEXT slice's own map at the
                # affine-projected coords — a second ~0.2 ms row
                # gather, with NO per-frame pair-table build and no
                # resample blur (the pair row's slot 1 was the next
                # map pulled through a bilinear resample)
                xin = jnp.clip(((cxn * 0.5 + 0.5) * res).astype(jnp.int32),
                               0, res - 1)
                yin = jnp.clip(((cyn * 0.5 + 0.5) * res).astype(jnp.int32),
                               0, res - 1)
                lit_next = lit_of(
                    gather_row8(esm.reshape(-1),
                                (s_next * res + yin) * res + xin),
                    inn, exptn)
        else:
            xin, yin, inn, exptn, _ = project_of(s_next, sel_next)
            lit_next = lit_of(
                gather_row8(esm.reshape(-1),
                            (s_next * res + yin) * res + xin),
                inn, exptn)
        lit = lit + (lit_next - lit) * wgt
    return lit
