"""Local environment probes: box volumes with parallax-corrected lookup.

Reference parity: data/lighting.comp:187-207 — per pixel, the first
environment box whose specular dominant ray exits the box while the
pixel is inside it supplies env specular (from the parallax-corrected
hit point) and env diffuse (deep mip along the diffuse direction);
pixels in no box keep the global skybox IBL.  src/renderer/envmap
holds the per-box cubemap assets.  The TPU build loops statically over
a small env pool (all-pixel masks instead of cluster bitmasks) — env
counts are single digits, so E dense cubemap taps stay cheap.
"""

from __future__ import annotations

import jax.numpy as jnp

from .sampling import sample_cubemap, sample_cubemap_lod


def ray_box_exit(origin, direction, halfdim):
    """Slab test: (t_enter, t_exit) of rays against box [-h, h]^3.

    origin/direction (..., 3); halfdim (3,).  Matches the reference's
    intersections() helper (data/lighting.inc).
    """
    inv = 1.0 / jnp.where(jnp.abs(direction) < 1e-8,
                          jnp.where(direction < 0, -1e-8, 1e-8), direction)
    t0 = (-halfdim - origin) * inv
    t1 = (halfdim - origin) * inv
    t_enter = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_exit = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return t_enter, t_exit


def env_probe_lookup(worldpos, sdir, ddir, roughness, envs,
                     env_specular, env_diffuse):
    """Override global env terms with local box probes.

    envs: dict(position (E,3), inv_rot (E,3,3), halfdim (E,3),
    mips: list of (E,6,S,S,C) mip levels, count () int32).
    Returns (env_specular, env_diffuse) with probe pixels replaced;
    earliest env index wins (reference's loop `break`).
    """
    n_env = envs["position"].shape[0]
    n_lod = len(envs["mips"])
    taken = jnp.zeros(worldpos.shape[:-1], bool)
    for i in range(n_env):
        rot = envs["inv_rot"][i]
        localpos = (worldpos - envs["position"][i]) @ rot.T
        localspec = sdir @ rot.T
        localdiff = ddir @ rot.T
        t_in, t_out = ray_box_exit(localpos, localspec, envs["halfdim"][i])
        hit = (t_out > jnp.maximum(t_in, 0.0)) & (t_in < 0.0) \
            & (i < envs["count"]) & ~taken

        localray = localpos + t_out[..., None] * localspec
        raylen = jnp.maximum(
            jnp.linalg.norm(localray, axis=-1), 1e-6)
        localrough = jnp.clip(roughness * t_out / raylen, 0.0, roughness)

        mips_i = [m[i] for m in envs["mips"]]
        spec = sample_cubemap_lod(mips_i, localray / raylen[..., None],
                                  localrough * (n_lod - 1))[..., :3]
        diff = sample_cubemap(mips_i[-1], localdiff)[..., :3]

        m = hit[..., None]
        env_specular = jnp.where(m, spec, env_specular)
        env_diffuse = jnp.where(m, diff, env_diffuse)
        taken = taken | hit
    return env_specular, env_diffuse


def env_probe_fields(worldpos, sdir, ddir, roughness, envs):
    """Reduced-res probe override fields for the megakernel fast path.

    All inputs are low-res (h, w[, 3]) arrays; envs must carry "flatqs"
    (per-probe quad-packed mip tables, built by
    RenderContext.device_state).  Returns (spec (h,w,3), dif (h,w,3),
    hit (h,w) float) — the caller upsamples and blends spec into the
    half-res env specular field and ships dif/hit to the shade kernel
    as the env-diffuse override planes (reference:
    data/lighting.comp:187-207 environment loop; earliest box wins).
    """
    from .sampling import sample_cubemap_lod_quad, sample_cubemap_quad

    n_env = envs["position"].shape[0]
    flatqs = envs["flatqs"]
    n_lod = len(envs["mips"])
    spec_o = jnp.zeros(worldpos.shape[:-1] + (3,), jnp.float32)
    dif_o = jnp.zeros_like(spec_o)
    taken = jnp.zeros(worldpos.shape[:-1], bool)
    for i in range(n_env):
        rot = envs["inv_rot"][i]
        localpos = (worldpos - envs["position"][i]) @ rot.T
        localspec = sdir @ rot.T
        localdiff = ddir @ rot.T
        t_in, t_out = ray_box_exit(localpos, localspec, envs["halfdim"][i])
        hit = (t_out > jnp.maximum(t_in, 0.0)) & (t_in < 0.0) \
            & (i < envs["count"]) & ~taken

        localray = localpos + t_out[..., None] * localspec
        raylen = jnp.maximum(jnp.linalg.norm(localray, axis=-1), 1e-6)
        localrough = jnp.clip(roughness * t_out / raylen, 0.0, roughness)
        spec = sample_cubemap_lod_quad(flatqs[i], localray / raylen[..., None],
                                       localrough * (n_lod - 1))[..., :3]
        dif = sample_cubemap_quad(flatqs[i], localdiff,
                                  level=n_lod - 1)[..., :3]
        m = hit[..., None]
        spec_o = jnp.where(m, spec, spec_o)
        dif_o = jnp.where(m, dif, dif_o)
        taken = taken | hit
    return spec_o, dif_o, taken.astype(jnp.float32)
