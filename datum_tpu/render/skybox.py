"""SkyBox resource + procedural sky rendering.

Reference parity: src/renderer/skybox.{h,cpp} — SkyBox is an EnvMap
with its own generation pass (data/skybox.gen.comp atmosphere) followed
by the GGX convolve chain over its mips (skybox.cpp:382-479).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..ops import skybox_gen
from .envmap import EnvMap, N_MIPS


@dataclasses.dataclass
class SkyBoxParams:
    skycolor: tuple = (0.65, 0.57, 0.475)
    groundcolor: tuple = (0.41, 0.37, 0.32)
    sundirection: tuple = (-0.4, -0.7, -0.6)
    sunintensity: tuple = (8.0, 7.56, 7.88)
    exposure: float = 1.0
    cloudheight: float = 100.0
    cloudcolor: tuple = (1.0, 1.0, 1.0, 0.0)
    clouds: object = None


class SkyBox(EnvMap):
    """Procedural sky environment."""

    def __init__(self, size=128, params: SkyBoxParams | None = None,
                 convolve_samples=32):
        self.gen_size = size
        self.convolve_samples = convolve_samples
        params = params or SkyBoxParams()
        cube = self._generate(params)
        env = EnvMap.from_cubemap(cube, N_MIPS, convolve_samples)
        super().__init__(env.mips)
        self.params = params

    def _generate(self, params: SkyBoxParams):
        sd = np.asarray(params.sundirection, np.float32)
        sd = sd / max(np.linalg.norm(sd), 1e-9)
        return skybox_gen.generate_skybox(
            self.gen_size, skycolor=params.skycolor, groundcolor=params.groundcolor,
            sundirection=sd, sunintensity=params.sunintensity,
            exposure=params.exposure, clouds=params.clouds,
            cloudheight=params.cloudheight, cloudcolor=params.cloudcolor)


def render_skybox(skybox: SkyBox, params: SkyBoxParams | None = None):
    """Regenerate + reconvolve (reference: skybox.cpp render_skybox)."""
    if params is not None:
        skybox.params = params
    cube = skybox._generate(skybox.params)
    env = EnvMap.from_cubemap(cube, N_MIPS, skybox.convolve_samples)
    skybox.mips = env.mips
    return skybox
