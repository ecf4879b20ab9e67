"""Frame parameter types and the SceneSet device pytree.

RenderParams mirrors the reference per-frame knob struct (reference:
src/renderer/renderer.h:488-515) and make_sceneset packs it — together
with the camera and light lists — into the fixed-capacity device
arrays the reference packs into its SceneSet UBO (reference:
src/renderer/renderer.cpp:208-241 prepare_sceneset).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops.common import (
    MAX_POINT_LIGHTS, MAX_SPOT_LIGHTS, MAX_PROBES, MAX_ENVIRONMENTS, MAX_DECALS,
)


def _spot_view(light):
    """World -> light-space rigid view for one spot (forward = -z)."""
    from ..math import Transform

    pos = np.asarray(light["position"], np.float32)
    d = np.asarray(light["direction"], np.float32)
    d = d / max(np.linalg.norm(d), 1e-9)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    if abs(float(np.dot(d, up))) > 0.99:
        up = np.array([1.0, 0.0, 0.0], np.float32)
    return Transform.lookat(pos, pos + d, up).inverse().matrix().astype(
        np.float32)


def _spot_shadowview(light):
    """Perspective shadow matrix for one spot light (legacy XLA path;
    the pallas path uses the parabolic warp from the rigid view —
    reference: spotmap.*.vert + data/transform.inc:187 map_parabolic).
    """
    from ..math.matrix import perspective_proj

    view = _spot_view(light)
    half = np.arccos(np.clip(light["cutoff"], -0.999, 0.999))
    fov = np.clip(2.2 * half, 0.2, 2.8)
    zfar = float(light["attenuation"][3]) or 50.0
    proj = perspective_proj(fov, 1.0, 0.05, zfar)
    return (proj @ view).astype(np.float32)


def _skyrot_inv(params):
    """Inverse rotation of params.skyboxorientation (quat w,x,y,z) as a
    (3, 3) matrix — identity when the param is absent/default."""
    from ..math.quaternion import quat_to_matrix

    q = np.asarray(getattr(params, "skyboxorientation",
                           [1.0, 0.0, 0.0, 0.0]), np.float32)
    r = np.asarray(quat_to_matrix(q), np.float32)
    return r.T      # rotation inverse = transpose


def _mainlight(camera, params):
    from .shadow import prepare_shadowview

    splits, shadowview = prepare_shadowview(camera, params.sundirection)
    return dict(
        direction=np.asarray(params.sundirection, np.float32),
        intensity=np.asarray(params.sunintensity, np.float32),
        cutoff=np.float32(params.suncutoff),
        splits=splits,
        shadowview=shadowview,
    )


@dataclasses.dataclass
class RenderParams:
    width: int = 1280
    height: int = 720
    scale: float = 1.0
    aspect: float = 16 / 9

    sundirection: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, -1.0, 0.0], np.float32))
    sunintensity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 1.0, 1.0], np.float32))
    suncutoff: float = 0.7

    skybox = None
    skyboxorientation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([1.0, 0, 0, 0], np.float32))
    skyboxlod: float = -1.0

    ambientintensity: float = 1.0
    specularintensity: float = 1.0
    # global light-range scale applied to every point/spot light's
    # attenuation range at sceneset pack time (reference:
    # renderer.cpp:6265,6275 params.lightfalloff * attenuation.w; the
    # reference defaults 0.66 — our scenes are authored against 1.0)
    lightfalloff: float = 1.0
    # extra knob (not in the reference): AO intensity lerp toward
    # unoccluded; the reference's ssaoscale (AO buffer resolution) is the
    # static FrameConfig.ssao_scale
    ssaostrength: float = 1.0
    ssrstrength: float = 1.0
    bloomstrength: float = 1.0

    fogdensity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(4, np.float32))
    # directional fog-density falloff vector: density = fogdensity.a *
    # exp(-max(dot(fogattenuation, worldpos), 0)) (reference:
    # fog.density.comp:116; reference default (0, 0.5, 0)).  The default
    # reproduces the engine's historical height falloff (0.15 above y=0).
    fogattenuation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.0, 0.15, 0.0], np.float32))

    colorlut = None


def make_sceneset(camera, params: RenderParams, *, point_lights=(), spot_lights=(),
                  probes=(), environments=(), prevview=None,
                  n_point=MAX_POINT_LIGHTS, n_spot=MAX_SPOT_LIGHTS,
                  n_probe=8):
    """Pack camera + params + lights into the fixed-shape SceneSet pytree.

    point_lights: iterable of dict(position, intensity, attenuation).
    spot_lights:  iterable of dict(position, intensity, attenuation,
                  direction, cutoff).
    All arrays are numpy here; the jitted frame receives them as device
    arrays.  Capacities are static so the frame never recompiles as
    light counts change (the reference relies on the same fixed-size
    UBO arrays).
    """
    proj = camera.proj()
    view = camera.view()
    invview = camera.transform().matrix()

    pl_pos = np.zeros((n_point, 3), np.float32)
    pl_int = np.zeros((n_point, 3), np.float32)
    pl_att = np.ones((n_point, 4), np.float32)
    falloff = np.float32(getattr(params, "lightfalloff", 1.0))
    for i, l in enumerate(point_lights[:n_point]):
        pl_pos[i] = l["position"]
        pl_int[i] = l["intensity"]
        pl_att[i] = l["attenuation"]
        pl_att[i, 3] *= falloff

    sl_pos = np.zeros((n_spot, 3), np.float32)
    sl_int = np.zeros((n_spot, 3), np.float32)
    sl_att = np.ones((n_spot, 4), np.float32)
    sl_dir = np.zeros((n_spot, 3), np.float32)
    sl_dir[:, 1] = -1
    sl_cut = np.zeros((n_spot,), np.float32)
    sl_view = np.tile(np.eye(4, dtype=np.float32), (n_spot, 1, 1))
    sl_rigid = np.tile(np.eye(4, dtype=np.float32), (n_spot, 1, 1))
    for i, l in enumerate(spot_lights[:n_spot]):
        sl_pos[i] = l["position"]
        sl_int[i] = l["intensity"]
        sl_att[i] = l["attenuation"]
        sl_att[i, 3] *= falloff
        sl_dir[i] = l["direction"]
        sl_cut[i] = l["cutoff"]
        sl_view[i] = _spot_shadowview(l)
        sl_rigid[i] = _spot_view(l)

    return dict(
        proj=proj.astype(np.float32),
        view=view.astype(np.float32),
        invview=invview.astype(np.float32),
        prevview=(prevview if prevview is not None else view).astype(np.float32),
        camera=dict(
            position=np.asarray(camera.position, np.float32),
            exposure=np.float32(camera.exposure),
            focalwidth=np.float32(camera.focalwidth),
            focaldistance=np.float32(camera.focaldistance),
            skyboxlod=np.float32(params.skyboxlod),
            ambientintensity=np.float32(params.ambientintensity),
            specularintensity=np.float32(params.specularintensity),
            ssrstrength=np.float32(params.ssrstrength),
            ssaostrength=np.float32(params.ssaostrength),
            bloomstrength=np.float32(params.bloomstrength),
            fogdensity=np.asarray(params.fogdensity, np.float32),
            fogattenuation=np.asarray(params.fogattenuation, np.float32),
            # inverse skybox orientation: world dir -> env-space dir for
            # every global-environment lookup (reference: renderer.cpp:6347
            # environments[0].invtransform = inverse(skyboxorientation),
            # applied in lighting.comp:191-193; :6221 skyview)
            skyrot_inv=_skyrot_inv(params),
        ),
        mainlight=_mainlight(camera, params),
        pointlights=dict(
            position=pl_pos, intensity=pl_int, attenuation=pl_att,
            count=np.int32(min(len(point_lights), n_point)),
        ),
        spotlights=dict(
            position=sl_pos, intensity=sl_int, attenuation=sl_att,
            direction=sl_dir, cutoff=sl_cut, shadowview=sl_view,
            view=sl_rigid,
            count=np.int32(min(len(spot_lights), n_spot)),
        ),
        probes=_probes(probes, n_probe),
    )


def _probes(probes, n_probe):
    """SH irradiance probes (reference: lighting.inc Probe — position.xyz
    + radius in w, 9x3 SH coefficients)."""
    pos = np.zeros((n_probe, 4), np.float32)
    pos[:, 3] = 1.0
    sh = np.zeros((n_probe, 9, 3), np.float32)
    for i, p in enumerate(probes[:n_probe]):
        pos[i, :3] = p["position"]
        pos[i, 3] = p.get("radius", 5.0)
        sh[i] = np.asarray(p["sh"], np.float32).reshape(9, 3)
    return dict(position=pos, sh=sh,
                count=np.int32(min(len(probes), n_probe)))
