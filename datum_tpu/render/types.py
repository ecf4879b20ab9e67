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
    ssaoscale: float = 1.0
    ssrstrength: float = 1.0
    bloomstrength: float = 1.0

    fogdensity: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(4, np.float32))
    fogattenuation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([0.5, 0.5, 0.5], np.float32))

    colorlut = None


def make_sceneset(camera, params: RenderParams, *, point_lights=(), spot_lights=(),
                  probes=(), environments=(), prevview=None,
                  n_point=MAX_POINT_LIGHTS, n_spot=MAX_SPOT_LIGHTS):
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
    for i, l in enumerate(point_lights[:n_point]):
        pl_pos[i] = l["position"]
        pl_int[i] = l["intensity"]
        pl_att[i] = l["attenuation"]

    sl_pos = np.zeros((n_spot, 3), np.float32)
    sl_int = np.zeros((n_spot, 3), np.float32)
    sl_att = np.ones((n_spot, 4), np.float32)
    sl_dir = np.zeros((n_spot, 3), np.float32)
    sl_dir[:, 1] = -1
    sl_cut = np.zeros((n_spot,), np.float32)
    for i, l in enumerate(spot_lights[:n_spot]):
        sl_pos[i] = l["position"]
        sl_int[i] = l["intensity"]
        sl_att[i] = l["attenuation"]
        sl_dir[i] = l["direction"]
        sl_cut[i] = l["cutoff"]

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
            bloomstrength=np.float32(params.bloomstrength),
            fogdensity=np.asarray(params.fogdensity, np.float32),
        ),
        mainlight=_mainlight(camera, params),
        pointlights=dict(
            position=pl_pos, intensity=pl_int, attenuation=pl_att,
            count=np.int32(min(len(point_lights), n_point)),
        ),
        spotlights=dict(
            position=sl_pos, intensity=sl_int, attenuation=sl_att,
            direction=sl_dir, cutoff=sl_cut,
            count=np.int32(min(len(spot_lights), n_spot)),
        ),
    )
