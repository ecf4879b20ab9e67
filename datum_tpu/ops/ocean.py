"""FFT ocean simulation.

TPU re-design of the reference ocean pipeline (reference:
src/renderer/ocean.{h,cpp} — CPU Phillips-spectrum seed (seed_ocean
ocean.cpp:128) + phase advance (update_ocean :217), then 5 compute
dispatches: sim -> 64-point radix-2 iFFT x/y -> displacement/normal
map -> vertex-buffer writer (data/ocean.*.comp)).  Here the spectrum
evolves and inverts with jnp.fft.ifft2 in one fused jit, and the
vertex writer samples the displacement map over the render grid.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

GRAVITY = 9.81


def phillips_spectrum(n=64, size=64.0, wind=(8.0, 4.0), amplitude=2e-5,
                      seed=0):
    """Seed h0(k) (reference: seed_ocean).  Returns complex (n, n)."""
    rng = np.random.RandomState(seed)
    k1 = np.fft.fftfreq(n, d=size / (2 * np.pi * n))
    kx, ky = np.meshgrid(k1, k1, indexing="xy")
    k2 = kx * kx + ky * ky
    k2 = np.where(k2 == 0, 1e-12, k2)
    wind = np.asarray(wind, np.float64)
    wspeed = np.linalg.norm(wind)
    wdir = wind / max(wspeed, 1e-9)
    l = wspeed * wspeed / GRAVITY
    kdotw = (kx * wdir[0] + ky * wdir[1]) / np.sqrt(k2)
    ph = (amplitude * np.exp(-1.0 / (k2 * l * l)) / (k2 * k2)
          * kdotw ** 2)
    # suppress tiny waves + waves against the wind
    ph *= np.exp(-k2 * (size / n * 0.5) ** 2)
    ph = np.where(kdotw < 0, ph * 0.1, ph)
    ph[0, 0] = 0.0
    xi = rng.randn(n, n) + 1j * rng.randn(n, n)
    return (xi * np.sqrt(ph / 2.0)).astype(np.complex64)


def wave_frequencies(n=64, size=64.0):
    k1 = np.fft.fftfreq(n, d=size / (2 * np.pi * n))
    kx, ky = np.meshgrid(k1, k1, indexing="xy")
    k = np.sqrt(kx * kx + ky * ky)
    omega = np.sqrt(GRAVITY * k)
    return (kx.astype(np.float32), ky.astype(np.float32), k.astype(np.float32),
            omega.astype(np.float32))


def ocean_maps(h0, kx, ky, k, omega, t, choppiness=1.5):
    """Evolve + invert the spectrum at time t.

    Returns (displacement (n,n,3) [dx, height, dz], normal (n,n,3)).
    Replaces ocean.sim/fftx/ffty/map.comp with one fused jnp program.
    """
    h0 = jnp.asarray(h0)
    phase = omega * t
    rot = jnp.exp(1j * phase)
    h0_conj = jnp.conj(h0[(-jnp.arange(h0.shape[0])) % h0.shape[0]][:, (-jnp.arange(h0.shape[1])) % h0.shape[1]])
    hk = h0 * rot + h0_conj * jnp.conj(rot)

    ksafe = jnp.where(k == 0, 1e-12, k)
    # ONE batched inverse FFT over the five spectra (height, dx, dz,
    # sx, sz) instead of five separate FFT dispatches
    spectra = jnp.stack([hk, 1j * kx / ksafe * hk, 1j * ky / ksafe * hk,
                         1j * kx * hk, 1j * ky * hk])
    height, dx, dz, sx, sz = (
        jnp.fft.ifft2(spectra).real * (h0.shape[0] * h0.shape[1]))

    disp = jnp.stack([-choppiness * dx, height, -choppiness * dz], -1)
    normal = jnp.stack([-sx, jnp.ones_like(sx), -sz], -1)
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    return disp.astype(jnp.float32), normal.astype(jnp.float32)


def displace_grid(base_xz, disp, normal, patch_size, swell=(0.0, 0.0, 0.0, 1.0)):
    """Vertex writer: sample the (periodic) maps at grid positions.

    base_xz: (V, 3) flat grid vertices (y=0); swell = (amp, dirx, dirz,
    wavelength) Gerstner term (reference: ocean.gen.comp swell).
    Returns (positions (V,3), normals (V,3)).
    """
    n = disp.shape[0]
    u = base_xz[:, 0] / patch_size * n
    v = base_xz[:, 2] / patch_size * n

    def bil(m):
        x0 = jnp.floor(u).astype(jnp.int32)
        y0 = jnp.floor(v).astype(jnp.int32)
        fx = (u - x0)[:, None]
        fy = (v - y0)[:, None]
        x0 = jnp.mod(x0, n)
        y0 = jnp.mod(y0, n)
        x1 = jnp.mod(x0 + 1, n)
        y1 = jnp.mod(y0 + 1, n)
        a = m[y0, x0] * (1 - fx) + m[y0, x1] * fx
        b = m[y1, x0] * (1 - fx) + m[y1, x1] * fx
        return a * (1 - fy) + b * fy

    d = bil(disp)
    nrm = bil(normal)
    pos = base_xz + d

    amp, dx_, dz_, wl = swell
    if amp:
        freq = 2 * np.pi / wl
        ph = (base_xz[:, 0] * dx_ + base_xz[:, 2] * dz_) * freq
        pos = pos.at[:, 1].add(amp * jnp.sin(ph))
        # analytic slope of amp*sin(freq * d.x) is amp*freq*cos — the
        # frequency factor matters (reference: ocean.gen.comp:98
        # phi = frequency * amplitude drives the swell normal)
        slope = amp * freq * jnp.cos(ph)
        nrm = nrm.at[:, 0].add(-slope * dx_)
        nrm = nrm.at[:, 2].add(-slope * dz_)
        nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    return pos.astype(jnp.float32), nrm.astype(jnp.float32)


def water_color_lut(size=64, deep=(0.02, 0.08, 0.14), shallow=(0.10, 0.42, 0.40),
                    facing_tint=(0.25, 0.45, 0.55)):
    """Procedural water-color LUT texture (the ocean albedo map asset).

    Axis u = depth scale (0 shallow -> 1 deep), axis v = fresnel facing
    (0 grazing -> 1 head-on); the top rows are reserved pure-white foam
    so per-vertex foam can whiten by pushing v -> 1 (reference:
    data/ocean.frag albedo = texture(albedomap, (scale, facing))).
    Returns (size, size, 4) float32 rgba.
    """
    u = np.linspace(0, 1, size, dtype=np.float32)[None, :, None]
    v = np.linspace(0, 1, size, dtype=np.float32)[:, None, None]
    deep = np.asarray(deep, np.float32)
    shallow = np.asarray(shallow, np.float32)
    tint = np.asarray(facing_tint, np.float32)
    rgb = shallow * (1 - u) + deep * u
    rgb = rgb * (1 - 0.5 * v) + tint * (0.5 * v)
    foam = np.clip((v - 0.9) / 0.1, 0, 1)
    rgb = rgb * (1 - foam) + foam
    a = np.ones((size, size, 1), np.float32)
    return np.concatenate([np.broadcast_to(rgb, (size, size, 3)), a], -1)


def ocean_lut_uv(pos, nrm, cam_pos, foamplane=(0.0, 1.0, 0.0, 0.0),
                 foamwaveheight=1.0, foamwavescale=0.0,
                 foamshoreheight=0.1, foamshorescale=0.0,
                 depthscale=0.05, waterdepth=20.0):
    """Per-vertex water-LUT coordinates + foam (reference data/ocean.frag
    main: scale/facing albedo lookup, wavefoam from the foam plane with a
    cubed falloff, shorefoam from water depth).

    The reference reads scene depth behind the surface per fragment; on
    the TPU path the surface is shaded through the generic deferred
    pipeline, so water depth is approximated by `waterdepth` minus the
    plane height (deep water unless the caller passes a terrain-aware
    value).  Returns (V, 2) texcoords into water_color_lut.
    """
    cam = jnp.asarray(cam_pos, jnp.float32)
    eyevec = cam[None, :] - pos
    eyevec = eyevec / jnp.maximum(
        jnp.linalg.norm(eyevec, axis=-1, keepdims=True), 1e-6)
    facing = jnp.clip(1.0 - jnp.sum(eyevec * nrm, -1), 0.0, 1.0)

    fp = jnp.asarray(foamplane, jnp.float32)
    height = pos @ fp[:3] + fp[3]
    dist = jnp.maximum(waterdepth - height, 0.0)
    hw = height - foamwaveheight
    wavefoam = jnp.clip(hw * hw * hw * foamwavescale, 0.0, 1.0)
    # NOTE: exact reference formula (ocean.frag:96) — including its
    # degenerate foamshorescale=0 case (clamp(height, 0, 1) then)
    shorefoam = jnp.clip(height - (dist - foamshoreheight) * foamshorescale,
                         0.0, 1.0) * 0.27
    foam = jnp.clip(wavefoam + shorefoam, 0.0, 1.0)

    u = jnp.clip(depthscale * dist, 1e-3, 1.0)
    v = (1.0 - facing) * 0.88          # grazing -> lighter rows
    v = v + foam * (1.0 - v)           # foam whitens (v=1 row is white)
    return jnp.stack([u, v], -1).astype(jnp.float32)
