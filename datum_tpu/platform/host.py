"""Host game loop + frame presentation.

Reference parity: the example host loop (reference:
examples/example-xcb.cpp:1085-1130 — fixed-timestep catch-up update +
render with interpolation factor) and the datumtest host (dedicated
update thread with triple-buffered frame handoff,
test/datumtest-xcb.cpp:1083-1127).  Presentation writes PNG frames or
feeds a callback; JAX's async dispatch gives the same update/render
overlap the reference gets from its render thread.
"""

from __future__ import annotations

import os
import time

import numpy as np

from .platform import GameInput, Platform


class FrameSink:
    """Receives presented frames (the swapchain stand-in)."""

    def __init__(self, directory=None, callback=None, keep_last=True):
        self.directory = directory
        self.callback = callback
        self.keep_last = keep_last
        self.last_frame = None
        self.count = 0
        if directory:
            os.makedirs(directory, exist_ok=True)

    def present(self, image: np.ndarray):
        if self.keep_last:
            self.last_frame = image
        if self.callback:
            self.callback(image, self.count)
        if self.directory:
            from PIL import Image
            Image.fromarray(image).save(
                os.path.join(self.directory, f"frame_{self.count:05d}.png"))
        self.count += 1


def run_game_loop(game_init, game_update, game_render, *, fps=60,
                  max_frames=None, max_seconds=None, sink=None,
                  platform=None, realtime=False):
    """Fixed-timestep catch-up loop.

    game_init(platform) -> state
    game_update(platform, state, input, dt) -> None
    game_render(platform, state, viewport_sink, lerp) -> None
    """
    platform = platform or Platform()
    sink = sink or FrameSink()
    inp = GameInput()
    state = game_init(platform)

    dt = 1.0 / fps
    sim_time = time.perf_counter() if realtime else 0.0
    frames = 0
    start = time.perf_counter()
    while not platform.terminated:
        if max_frames is not None and frames >= max_frames:
            break
        if max_seconds is not None and time.perf_counter() - start > max_seconds:
            break
        if realtime:
            now = time.perf_counter()
            steps = 0
            while sim_time < now and steps < 5:
                game_update(platform, state, inp, dt)
                sim_time += dt
                steps += 1
            lerp = min(max((now - (sim_time - dt)) / dt, 0.0), 1.0)
        else:
            game_update(platform, state, inp, dt)
            lerp = 1.0
        game_render(platform, state, sink, lerp)
        frames += 1
    return state, sink
