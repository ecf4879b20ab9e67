"""Image-based lighting bakes: env-BRDF LUT, GGX prefilter, SH-9 project.

TPU equivalents of the reference IBL chain (reference: tools/ibl.cpp
integrate/image_pack_envbrdf — split-sum BRDF LUT with a Disney-diffuse
third channel; data/convolve.comp — Hammersley + GGX importance-sampled
specular prefilter, mip = roughness; data/project.comp — cubemap ->
9-coeff SH irradiance with analytic texel solid angles).  All bakes are
vectorized over whole cubemaps; sample loops are short python loops
unrolled into the XLA graph.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .sampling import cubemap_texel_dir, sample_cubemap
from .brdf import diffuse_disney

PI = np.pi


def radical_inverse(i):
    bits = np.asarray(i, np.uint32)
    bits = (bits << np.uint32(16)) | (bits >> np.uint32(16))
    bits = ((bits & np.uint32(0x55555555)) << np.uint32(1)) | ((bits & np.uint32(0xAAAAAAAA)) >> np.uint32(1))
    bits = ((bits & np.uint32(0x33333333)) << np.uint32(2)) | ((bits & np.uint32(0xCCCCCCCC)) >> np.uint32(2))
    bits = ((bits & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | ((bits & np.uint32(0xF0F0F0F0)) >> np.uint32(4))
    bits = ((bits & np.uint32(0x00FF00FF)) << np.uint32(8)) | ((bits & np.uint32(0xFF00FF00)) >> np.uint32(8))
    return bits.astype(np.float64) * 2.3283064365386963e-10


def hammersley(n):
    i = np.arange(n)
    return np.stack([i / n, radical_inverse(i)], -1).astype(np.float32)


def _ggx_sample_dirs(u, alpha):
    """Half-vector directions around +Z for GGX importance samples."""
    phi = 2 * PI * u[:, 0]
    costheta = np.sqrt((1 - u[:, 1]) / (1 + (alpha * alpha - 1) * u[:, 1]))
    sintheta = np.sqrt(np.maximum(1 - costheta * costheta, 0))
    return np.stack([sintheta * np.cos(phi), sintheta * np.sin(phi), costheta], -1)


def _g_smith_ibl(ndx, alpha):
    k = alpha / 2.0
    return ndx / (ndx * (1 - k) + k)


def bake_envbrdf(size=64, samples=256):
    """Split-sum LUT (size, size, 3): [scale, bias, disney-diffuse].

    Index [roughness_row, NdotV_col] (matches the reference layout:
    x = NdotV, y = roughness).  Pure numpy — runs once at init.
    """
    u = hammersley(samples)
    ndv = (np.arange(size) + 0.5) / size
    rough = (np.arange(size) + 0.5) / size
    out = np.zeros((size, size, 3), np.float32)

    for yi, r in enumerate(rough):
        alpha = r * r
        h = _ggx_sample_dirs(u, alpha)                       # (N, 3)
        for xi, nv in enumerate(ndv):
            v = np.array([np.sqrt(max(1 - nv * nv, 0)), 0, nv])
            l = 2 * (h @ v)[:, None] * h - v
            ndl = np.clip(l[:, 2], 0, 1)
            ndh = np.clip(h[:, 2], 0, 1)
            vdh = np.clip(h @ v, 0, 1)
            ok = ndl > 0
            g = _g_smith_ibl(ndl, alpha) * _g_smith_ibl(nv, alpha)
            gv = np.where(ok & (ndh > 0), g * vdh / np.maximum(ndh * nv, 1e-6), 0)
            fc = (1 - vdh) ** 5
            a = np.sum((1 - fc) * gv) / samples
            b = np.sum(fc * gv) / samples

            # cosine-sampled Disney diffuse integral
            u2 = np.mod(u + 0.5, 1.0)
            phi = 2 * PI * u2[:, 0]
            ct = np.sqrt(1 - u2[:, 1])
            st = np.sqrt(u2[:, 1])
            ld = np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)
            ndl2 = np.clip(ld[:, 2], 0, 1)
            hv = v + ld
            hv /= np.maximum(np.linalg.norm(hv, axis=1, keepdims=True), 1e-9)
            ldh = np.clip(np.sum(ld * hv, 1), 0, 1)
            dd = np.asarray(diffuse_disney(nv, ndl2, ldh, alpha))
            c = np.sum(np.where(ndl2 > 0, dd, 0)) / samples

            out[yi, xi] = (a, b, c)
    return out


def cube_dirs(size):
    """All texel directions of a (6, S, S) cubemap."""
    u = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    uu, vv = jnp.meshgrid(u, u, indexing="xy")
    dirs = []
    for f in range(6):
        face = jnp.full(uu.shape, f, jnp.int32)
        dirs.append(cubemap_texel_dir(face, uu, vv))
    return jnp.stack(dirs, 0)      # (6, S, S, 3)


def convolve_cubemap(cube, roughness, samples=64, seed_u=None):
    """GGX specular prefilter of one mip (reference: data/convolve.comp).

    cube: (6, S, S, 3) source (mip 0); roughness in [0,1].  N = V = R
    approximation; returns (6, out_S, out_S, 3) at the source size of
    `cube` unless callers downsample first.
    """
    size = cube.shape[1]
    n = cube_dirs(size)                                     # (6,S,S,3)
    if roughness <= 1e-3:
        return cube

    alpha = roughness * roughness
    u = hammersley(samples) if seed_u is None else seed_u
    h_local = _ggx_sample_dirs(u, alpha)                    # (N, 3)

    # tangent frame per texel
    up = jnp.where(jnp.abs(n[..., 2:3]) < 0.999,
                   jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
    t = jnp.cross(up, n)
    t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-9)
    b = jnp.cross(n, t)

    acc = jnp.zeros_like(cube)
    wsum = jnp.zeros(cube.shape[:-1] + (1,), jnp.float32)
    for i in range(h_local.shape[0]):
        hx, hy, hz = float(h_local[i, 0]), float(h_local[i, 1]), float(h_local[i, 2])
        h = t * hx + b * hy + n * hz
        vdh = jnp.sum(n * h, -1, keepdims=True)
        l = 2 * vdh * h - n
        ndl = jnp.clip(jnp.sum(n * l, -1, keepdims=True), 0.0, 1.0)
        col = sample_cubemap(cube, l)
        acc = acc + col * ndl
        wsum = wsum + ndl
    return acc / jnp.maximum(wsum, 1e-6)


def build_specular_mips(cube, n_mips=6, samples=64):
    """Roughness mip chain: mip i prefiltered at roughness i/(n-1).

    Each mip is half the previous resolution (downsample then convolve),
    mirroring the reference's per-mip convolve chain
    (reference: src/renderer/skybox.cpp:427-470).
    """
    mips = [cube]
    cur = cube
    for i in range(1, n_mips):
        s = cur.shape[1] // 2
        if s < 4:
            break
        cur = cur.reshape(6, s, 2, s, 2, cur.shape[-1]).mean((2, 4))
        roughness = i / (n_mips - 1)
        mips.append(convolve_cubemap(cur, roughness, samples))
    return mips


def _sh2_basis(d, xp=jnp):
    """Band-2 real SH basis (..., 3) -> (..., 5), same constants/order
    as sh_project.  xp: array namespace (np for the host-side constant
    below, jnp in traced code)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    return xp.stack([1.092548 * x * y, 1.092548 * y * z,
                     0.315392 * (3 * z * z - 1), 1.092548 * z * x,
                     0.546274 * (x * x - y * y)], -1)


# Sloan's SH-rotation sampling trick: band 2 rotates via projection at 5
# fixed directions whose band-2 basis matrix is invertible
_K = np.float32(1.0 / np.sqrt(2.0))
_SH2_DIRS = np.array([[1, 0, 0], [0, 0, 1], [_K, _K, 0],
                      [_K, 0, _K], [0, _K, _K]], np.float32)
_SH2_INV = np.linalg.inv(_sh2_basis(_SH2_DIRS, xp=np)).astype(np.float32)


def rotate_sh9(sh, r_inv):
    """Rotate SH-9 coefficients so that SH(out, n) == SH(sh, r_inv @ n).

    r_inv is the world->env rotation (inverse skybox orientation): the
    rotated coefficients evaluate the env's irradiance with WORLD
    directions, matching the reference's env invtransform on the diffuse
    direction (reference: data/lighting.comp:192).  Band 0 is invariant;
    band 1 rotates as the vector (x=c3, y=c1, z=c2); band 2 via the
    5-direction projection trick (exact — the band is closed under
    rotation).
    """
    r = r_inv.T                                     # env -> world
    u = jnp.stack([sh[3], sh[1], sh[2]], 0)         # (3, C) in x,y,z
    u2 = r @ u
    b1 = jnp.stack([u2[1], u2[2], u2[0]], 0)        # back to (y, z, x)
    nd = _SH2_DIRS @ r                              # rows: r_inv @ N_i
    b2 = jnp.asarray(_SH2_INV) @ (_sh2_basis(nd) @ sh[4:9])
    return jnp.concatenate([sh[0:1], b1, b2], axis=0)


def sh_project(cube):
    """Cubemap -> SH-9 irradiance coefficients (9, 3).

    Analytic per-texel solid-angle weights (reference: data/project.comp
    atan-based weight formula), scaled by 4*pi/total_weight.
    """
    size = cube.shape[1]
    d = cube_dirs(size)                                     # (6,S,S,3)
    u = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size * 2.0 - 1.0
    uu, vv = jnp.meshgrid(u, u, indexing="xy")

    def _w(x, y):
        return jnp.arctan2(x * y, jnp.sqrt(x * x + y * y + 1))

    x0, x1 = uu - 1.0 / size, uu + 1.0 / size
    y0, y1 = vv - 1.0 / size, vv + 1.0 / size
    w = _w(x0, y0) - _w(x0, y1) - _w(x1, y0) + _w(x1, y1)   # (S, S)
    w = jnp.broadcast_to(w, (6, size, size))

    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    basis = jnp.stack([
        0.282095 * jnp.ones_like(x),
        0.488603 * y, 0.488603 * z, 0.488603 * x,
        1.092548 * x * y, 1.092548 * y * z,
        0.315392 * (3 * z * z - 1),
        1.092548 * z * x,
        0.546274 * (x * x - y * y),
    ], axis=0)                                              # (9, 6, S, S)

    total = jnp.sum(w)
    sh = jnp.einsum("kfij,fij,fijc->kc", basis, w, cube[..., :3])
    return sh * (4 * PI / total)
