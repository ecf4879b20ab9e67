"""Multi-chip scaling: tile-parallel frame rendering over a device mesh.

The reference is single-GPU (reference: SURVEY.md §2.3 — no collectives
exist); the TPU build scales anyway: framebuffer tile-rows shard across
chips over ICI, geometry processing is replicated (tiny vs. pixel
work), and the only cross-chip communication is a psum for scene
luminance plus the final image gather — both tiny.
"""

from .mesh import make_device_mesh
from .sharded import render_frame_sharded
