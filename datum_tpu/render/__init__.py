"""Renderer host layer: resources, render lists, the jitted frame graph.

TPU re-architecture of the reference renderer core (reference:
src/renderer/renderer.{h,cpp}, renderlist.{h,cpp}): scene geometry
lives in persistent device pools; a frame is ONE jitted function over
static-shape tensors (sceneset pytree + per-frame instance data), with
all passes fused by XLA.
"""

from .camera import Camera, adapt
from .types import (
    RenderParams, make_sceneset, MAX_POINT_LIGHTS, MAX_SPOT_LIGHTS,
)
from .context import RenderContext, GeometryPool
from .renderlist import RenderList
