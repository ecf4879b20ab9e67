"""Flat water surface (reference: ForwardList::push_water,
data/water.{vert,frag}).

The reference shades water as a forward translucent plane: 3-octave
scrolling bump normal, (depth, facing) albedo LUT, box-projected env
specular, clustered lights, and a transmission term that fades the
surface out over shallow water.  The TPU build routes water through the
ocean path — a dynamic grid with per-vertex LUT coords and flow, shaded
by the deferred pipeline (env probes supply the box-projected
reflection; see ops/envprobe.py).  With translucent=True (see
push_water below) the surface instead goes through the lit-translucent
layer: full deferred shade on the surface, depth-aware transmission by
the water column between surface and floor, and in-kernel refraction of
the background (reference data/water.frag parity; render/frame.py
_shade_with_kernel).  The opaque route remains for material-LUT ocean
shading without a translucent budget.
"""

from __future__ import annotations

import numpy as np

from .ocean import Ocean, OceanParams, render_ocean_surface


class Water(Ocean):
    """Calm water plane: the ocean grid with a flat spectrum (bump comes
    from the residual small-wave amplitude) plus flow scroll."""

    def __init__(self, ctx, grid=48, patch_size=64.0, flow=(0.02, 0.01),
                 ripple=4e-6, material=None, waterdepth=6.0):
        params = OceanParams(amplitude=ripple, choppiness=0.4, flow=flow,
                             waterdepth=waterdepth,
                             foamwavescale=0.0, foamshorescale=0.0)
        super().__init__(ctx, grid=grid, patch_size=patch_size,
                         params=params, material=material)


def push_water(renderlist, water: Water, transform, material,
               translucent=False):
    """Queue a water surface (reference: forwardlist.h:65-67).

    With translucent=True the surface goes through the lit-translucent
    layer: full deferred shade + depth-aware transmission + quantized
    refraction of the background (the megakernel path; reference:
    data/water.frag).  Requires FrameConfig.max_translucent_draws > 0.
    """
    render_ocean_surface(water, renderlist, transform, material,
                         translucent=translucent)
