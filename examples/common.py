"""Shared example-app harness.

Reference parity: the example host (reference: examples/example-xcb.cpp
fixed-timestep loop + resize).  Each example defines init/update/render
and runs headless for N frames, saving the last frame as a PNG.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def setup_jax(force_cpu=False):
    if force_cpu or os.environ.get("DATUM_CPU"):
        os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    # persistent XLA executable cache — the PipelineCache equivalent
    # (reference: renderer.cpp:512-520; SURVEY 5.4)
    from datum_tpu.utils import enable_compilation_cache
    enable_compilation_cache()


def run_example(name, init, update, render, frames=8, width=640, height=352,
                out=None):
    parser = argparse.ArgumentParser(name)
    parser.add_argument("--frames", type=int, default=frames)
    parser.add_argument("--width", type=int, default=width)
    parser.add_argument("--height", type=int, default=height)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--out", default=out or f"/tmp/{name}.png")
    parser.add_argument("--overlay", action="store_true")
    args = parser.parse_args()
    setup_jax(args.cpu)

    from datum_tpu.debug import frame_marker, render_debug_overlay, timed_block

    state = init(args)
    dt = 1 / 60
    img = None
    t_last = time.perf_counter()
    fps = 0.0
    for i in range(args.frames):
        frame_marker()
        with timed_block("update"):
            update(state, dt)
        with timed_block("render"):
            img = render(state)
        now = time.perf_counter()
        fps = 1.0 / max(now - t_last, 1e-6)
        t_last = now
    if img is not None:
        img = img.copy()
        if args.overlay:
            render_debug_overlay(img, fps=fps)
        from PIL import Image
        Image.fromarray(img).save(args.out)
        print(f"{name}: {args.frames} frames, saved {args.out}")
    return state
