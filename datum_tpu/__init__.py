"""datum_tpu — a TPU-native real-time rendering engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of pniekamp/datum
(a C++14 Vulkan clustered-deferred PBR game engine).  The compute path —
rasterization, clustered deferred lighting, post-processing, FFT ocean,
IBL baking — runs as XLA/Pallas kernels on TPU; the host control plane
(scene graph, asset streaming, platform loop) is Python with C++ native
helpers for the hot IO paths (LZ4 pack decompression).

Layer map (mirrors reference layers, re-architected for TPU):
  math/      — host math: dual-quaternion transforms, bounds, frusta
  asset/     — binary .pack asset pipeline (format-compatible reader/writer)
  platform/  — host loop, file IO, input, worker pool
  render/    — resources (mesh/texture/material/...), render lists, frame graph
  ops/       — the device kernels (visibility-buffer rasterizer, lighting, post)
  scene/     — entity-component scene graph + per-frame systems
  parallel/  — device-mesh sharding of the frame (tile-parallel over ICI)
  debug/     — timed-block profiling ring + overlay
  tools/     — offline asset compiler (packer, obj parser, IBL baker)
"""

__version__ = "0.1.0"
