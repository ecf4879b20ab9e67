"""Device kernels (JAX/XLA/Pallas) — the TPU equivalent of the
reference's GLSL pipeline (reference: data/*.comp, data/*.vert/frag).

Architecture: a visibility-buffer renderer.  Rasterization uses
2D-homogeneous (Olano-Greer) edge functions so no near-plane clipping
or variable-length geometry ever exists on device; the raster stage
produces only (depth, triangle-id) per pixel, and all shading is dense
data-parallel gathers + math downstream — the shape XLA/TPU executes
best.  Hot kernels have Pallas implementations; every kernel also has
a pure-jnp reference used for CPU testing and as the XLA fallback.
"""
