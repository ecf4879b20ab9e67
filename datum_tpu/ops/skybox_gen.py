"""Procedural skybox generation — single-scatter atmosphere.

TPU port of the reference sky kernel semantics (reference:
data/skybox.gen.comp — O'Neil-style Rayleigh/Mie single scattering with
inverse-wavelength tint, sun disc via strong Mie forward lobe, ground
hemisphere blend, optional normal-lit cloud layer).  Evaluates all six
cubemap faces densely in one call.
"""

from __future__ import annotations

import jax.numpy as jnp

from .ibl import cube_dirs
from .sampling import sample_image_bilinear

OUTER_R = 1.025
INNER_R = 1.0
CAMERA_HEIGHT = 0.0001
KR = 0.0025
KM = 0.0015
KR4PI = KR * 4.0 * 3.14159265
KM4PI = KM * 4.0 * 3.14159265
SCALE = 1.0 / (OUTER_R - INNER_R)
SCALE_DEPTH = 0.25
SAMPLES = 2


def _scale_fn(cosangle):
    x = 1.0 - cosangle
    return 0.25 * jnp.exp(-0.00287 + x * (0.459 + x * (3.83 + x * (-6.80 + x * 5.25))))


def _mie_phase(cosangle, g):
    return (1.5 * ((1 - g * g) / (2 + g * g)) * (1 + cosangle * cosangle)
            / jnp.power(jnp.maximum(1 + g * g - 2 * g * cosangle, 1e-4), 1.5))


def _rayleigh_phase(cosangle):
    return 0.75 + 0.75 * cosangle * cosangle


def generate_skybox(size, *, skycolor, groundcolor, sundirection, sunintensity,
                    exposure=1.0, clouds=None, cloudheight=100.0,
                    cloudcolor=(1.0, 1.0, 1.0, 0.0)):
    """Returns (6, size, size, 3) HDR cubemap.

    clouds: optional dict(density (H,W,1)-ish image, normal (H,W,3)).
    """
    ray = cube_dirs(size)                                  # (6,S,S,3)
    skycolor = jnp.asarray(skycolor, jnp.float32)
    sund = jnp.asarray(sundirection, jnp.float32)
    sund = sund / jnp.maximum(jnp.linalg.norm(sund), 1e-9)
    suni = jnp.asarray(sunintensity, jnp.float32)

    eyepos_y = INNER_R + CAMERA_HEIGHT
    ry = ray[..., 1]
    far = jnp.sqrt(jnp.maximum(
        OUTER_R ** 2 + INNER_R ** 2 * ry * ry - INNER_R ** 2, 0.0)) - INNER_R * ry

    startangle = ry  # dot(ray, eyepos)/|eyepos| with eyepos along +y
    startdepth = jnp.exp(-SCALE / SCALE_DEPTH * CAMERA_HEIGHT)
    startoffset = startdepth * _scale_fn(startangle)

    samplelength = far / SAMPLES
    scaledlength = samplelength * SCALE
    sampleray = ray * samplelength[..., None]
    samplepoint = jnp.array([0.0, eyepos_y, 0.0]) + 0.5 * sampleray

    inv_wl = 1.0 / jnp.power(jnp.maximum(skycolor, 1e-3), 4.0)

    frontcolor = jnp.zeros(ray.shape, jnp.float32)
    for _ in range(SAMPLES):
        height = jnp.maximum(jnp.linalg.norm(samplepoint, axis=-1), INNER_R)
        depth = jnp.exp(SCALE / SCALE_DEPTH * (INNER_R - height))
        lightangle = jnp.sum(-sund * samplepoint, -1) / height
        cameraangle = jnp.sum(ray * samplepoint, -1) / height
        scatter = startoffset + depth * (_scale_fn(lightangle) - _scale_fn(cameraangle))
        attenuate = jnp.exp(-jnp.clip(scatter, 0, 50)[..., None]
                            * (inv_wl * KR4PI + KM4PI))
        frontcolor = frontcolor + attenuate * (depth * scaledlength)[..., None]
        samplepoint = samplepoint + sampleray

    cosangle = jnp.sum(-sund * -ray, -1)
    c0 = frontcolor * inv_wl * KR * suni
    c1 = frontcolor * KM * suni
    sky = (c0 * _rayleigh_phase(cosangle)[..., None]
           + jnp.clip(c1 * _mie_phase(cosangle, -0.990)[..., None], 0.0, 1.0))

    ground = (jnp.asarray(groundcolor, jnp.float32)
              * jnp.maximum(-sund[1], 0.0))
    skyalpha = jnp.clip(-10.0 * ry, 0.0, 1.0)[..., None]
    color = sky * (1 - skyalpha) + ground * skyalpha

    if clouds is not None:
        cloudpos = ray * (cloudheight / jnp.where(jnp.abs(ry) < 1e-3, 1e-3, ry))[..., None]
        clouduv = jnp.mod(0.000005 * cloudpos[..., [0, 2]], 1.0)
        cn = sample_image_bilinear(clouds["normal"], clouduv)
        cn = cn * 2.0 - 1.0
        cn = cn / jnp.maximum(jnp.linalg.norm(cn, axis=-1, keepdims=True), 1e-6)
        cn_world = jnp.stack([cn[..., 0], cn[..., 2], cn[..., 1]], -1)
        ndl = jnp.maximum(jnp.sum(cn_world * -sund, -1), 0.0)
        dens = sample_image_bilinear(clouds["density"], clouduv)[..., 0]
        calpha = ndl * dens * jnp.clip(10.0 * ry, 0.0, 1.0) * cloudcolor[3]
        color = color + (jnp.asarray(cloudcolor[:3]) - color) * calpha[..., None]

    return exposure * color
