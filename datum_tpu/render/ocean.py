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
    """Simulation + shading params (reference: src/renderer/ocean.h
    OceanParams and geometrylist.h:60 push_ocean arguments)."""
    wind: tuple = (8.0, 4.0)
    amplitude: float = 4e-4
    choppiness: float = 1.5
    swellamplitude: float = 0.0
    swelldirection: tuple = (1.0, 0.0)
    swellwavelength: float = 40.0
    flow: tuple = (0.0, 0.0)
    seed: int = 0
    # shading (data/ocean.frag)
    bumpscale: tuple = (1.0, 1.0, 1.0)
    foamplane: tuple = (0.0, 1.0, 0.0, 0.0)
    foamwaveheight: float = 1.0
    foamwavescale: float = 0.0
    foamshoreheight: float = 0.1
    foamshorescale: float = 0.0
    waterdepth: float = 20.0


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

    def _compute_impl(self, t, cam_pos):
        p = self.params
        # flow scrolls the (periodic) displacement field under the grid
        # (reference: data/ocean.frag params.flow scrolling the bump maps)
        base = self._base_dev.at[:, 0].add(p.flow[0] * t)
        base = base.at[:, 2].add(p.flow[1] * t)
        disp, normal = ocean_ops.ocean_maps(
            self.h0, self.kx, self.ky, self.k, self.omega, t, p.choppiness)
        swell = (p.swellamplitude, p.swelldirection[0],
                 p.swelldirection[1], p.swellwavelength)
        pos, nrm = ocean_ops.displace_grid(base, disp, normal,
                                           self.patch_size, swell)
        pos = pos - (base - self._base_dev)     # flow moves waves, not mesh
        uv = ocean_ops.ocean_lut_uv(
            pos, nrm, cam_pos, p.foamplane, p.foamwaveheight, p.foamwavescale,
            p.foamshoreheight, p.foamshorescale, waterdepth=p.waterdepth)
        return pos, nrm, uv

    def update(self, dt):
        """Advance simulation time (reference: update_ocean)."""
        self.time += dt

    def vertex_data(self, max_dynamic, cam_pos=(0.0, 10.0, 0.0)):
        """(positions, normals, texcoords, offset, count) padded to
        max_dynamic.  texcoords index a water_color_lut texture."""
        pos, nrm, uv = self._compute(jnp.float32(self.time),
                                     jnp.asarray(cam_pos, jnp.float32))
        pad = max_dynamic - self.vertexcount
        if pad < 0:
            raise ValueError("ocean grid exceeds max_dynamic_vertices")
        pos = jnp.pad(pos, ((0, pad), (0, 0)))
        nrm = jnp.pad(nrm, ((0, pad), (0, 0)))
        uv = jnp.pad(uv, ((0, pad), (0, 0)))
        return dict(positions=pos, normals=nrm, texcoords=uv,
                    offset=np.int32(self.vertex_offset),
                    count=np.int32(self.vertexcount))


def render_ocean_surface(ocean: Ocean, renderlist, transform, material,
                         translucent=False):
    """Queue the ocean for this frame (reference: render_ocean_surface +
    geometrylist push_ocean).  translucent routes the surface through
    the lit-translucent layer (full shade + depth-aware transmission +
    refraction — reference data/water.frag); opaque is the deep-ocean
    path."""
    if translucent:
        renderlist.push_translucent(ocean.mesh, transform, material)
    else:
        renderlist.push_mesh(ocean.mesh, transform, material)
    renderlist.oceans.append(ocean)
