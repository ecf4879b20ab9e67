"""Ocean resource: dynamic FFT-displaced mesh.

Reference parity: src/renderer/ocean.{h,cpp} — Ocean is a Mesh whose
vertices are recomputed per frame from the evolving Phillips spectrum;
OceanParams carries swell/wave lerp state advanced by update_ocean.
The displaced vertices flow into the frame's dynamic-vertex slab
(render/frame.py) and shade through the standard deferred path with a
water material.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import ocean as ocean_ops


@dataclasses.dataclass
class OceanParams:
    wind: tuple = (8.0, 4.0)
    amplitude: float = 4e-4
    choppiness: float = 1.5
    swellamplitude: float = 0.0
    swelldirection: tuple = (1.0, 0.0)
    swellwavelength: float = 40.0
    flow: tuple = (0.0, 0.0)
    seed: int = 0


class Ocean:
    """Grid mesh + spectrum state."""

    def __init__(self, ctx, grid=96, patch_size=64.0, spectrum_n=64,
                 params: OceanParams | None = None, material=None):
        self.params = params or OceanParams()
        self.patch_size = patch_size
        self.time = 0.0

        # base grid (grid x grid quads over patch_size)
        xs = np.linspace(0, patch_size, grid + 1, dtype=np.float32)
        gx, gz = np.meshgrid(xs, xs, indexing="xy")
        pos = np.stack([gx, np.zeros_like(gx), gz], -1).reshape(-1, 3)
        uv = np.stack([gx / patch_size, gz / patch_size], -1).reshape(-1, 2)
        idx = []
        n1 = grid + 1
        for j in range(grid):
            for i in range(grid):
                a = j * n1 + i
                idx += [a, a + n1, a + 1, a + 1, a + n1, a + n1 + 1]
        self.base_positions = pos
        self.mesh = ctx.add_mesh(
            dict(position=pos, texcoord=uv,
                 normal=np.tile([0, 1, 0.0], (len(pos), 1)),
                 tangent=np.tile([1, 0, 0, 1.0], (len(pos), 1))),
            np.asarray(idx, np.int32),
            mincorner=[0, -4, 0], maxcorner=[patch_size, 4, patch_size])
        self.vertex_offset = int(
            ctx.pool.mesh_vtx_offset[self.mesh.mesh_id])
        self.vertexcount = len(pos)

        self.h0 = ocean_ops.phillips_spectrum(
            spectrum_n, patch_size, self.params.wind, self.params.amplitude,
            self.params.seed)
        self.kx, self.ky, self.k, self.omega = ocean_ops.wave_frequencies(
            spectrum_n, patch_size)
        self.material = material
        self._base_dev = jnp.asarray(pos)
        self._compute = jax.jit(self._compute_impl)

    def _compute_impl(self, t):
        disp, normal = ocean_ops.ocean_maps(
            self.h0, self.kx, self.ky, self.k, self.omega, t,
            self.params.choppiness)
        swell = (self.params.swellamplitude, self.params.swelldirection[0],
                 self.params.swelldirection[1], self.params.swellwavelength)
        return ocean_ops.displace_grid(self._base_dev, disp, normal,
                                       self.patch_size, swell)

    def update(self, dt):
        """Advance simulation time (reference: update_ocean)."""
        self.time += dt

    def vertex_data(self, max_dynamic):
        """(positions, normals, offset, count) padded to max_dynamic."""
        pos, nrm = self._compute(jnp.float32(self.time))
        pad = max_dynamic - self.vertexcount
        if pad < 0:
            raise ValueError("ocean grid exceeds max_dynamic_vertices")
        pos = jnp.pad(pos, ((0, pad), (0, 0)))
        nrm = jnp.pad(nrm, ((0, pad), (0, 0)))
        return dict(positions=pos, normals=nrm,
                    offset=np.int32(self.vertex_offset),
                    count=np.int32(self.vertexcount))


def render_ocean_surface(ocean: Ocean, renderlist, transform, material):
    """Queue the ocean for this frame (reference: render_ocean_surface +
    geometrylist push_ocean)."""
    renderlist.push_mesh(ocean.mesh, transform, material)
    renderlist.oceans.append(ocean)
