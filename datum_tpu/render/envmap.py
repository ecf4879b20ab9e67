"""EnvMap resource: cubemap + roughness mip chain + SH irradiance.

Reference parity: src/renderer/envmap.{h,cpp} — EnvMap cubemap
resource, ConvolveContext/convolve() GGX prefilter chain, Project
Context/project() SH-9 irradiance readback (kernels data/convolve.comp,
data/project.comp).  In the TPU build both are jitted bakes returning
device arrays.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import ibl as ibl_ops

N_MIPS = 7   # mip roughness resolution; deep mip feeds diffuse lookups


class Irradiance:
    """9-coefficient SH irradiance (matches reference envmap.h:112)."""

    def __init__(self, sh):
        self.sh = np.asarray(sh, np.float32).reshape(9, 3)


class EnvMap:
    def __init__(self, mips, sh=None):
        self.mips = [jnp.asarray(m) for m in mips]
        self.sh = sh

    @classmethod
    def from_cubemap(cls, cube, n_mips=N_MIPS, samples=64):
        cube = jnp.asarray(cube, jnp.float32)
        mips = ibl_ops.build_specular_mips(cube, n_mips, samples)
        return cls(mips)

    @property
    def size(self):
        return int(self.mips[0].shape[1])

    def project(self) -> Irradiance:
        """SH-9 irradiance projection (reference: envmap.cpp:729+)."""
        return Irradiance(np.asarray(ibl_ops.sh_project(self.mips[0])))


def convolve(envmap: EnvMap, samples=64):
    """Re-run the GGX prefilter chain in place (reference:
    envmap.cpp:482-543)."""
    envmap.mips = [jnp.asarray(m) for m in
                   ibl_ops.build_specular_mips(envmap.mips[0], len(envmap.mips) or N_MIPS,
                                               samples)]
    return envmap


def project(envmap: EnvMap) -> Irradiance:
    return envmap.project()
