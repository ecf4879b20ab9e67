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


class TripleBuffer:
    """Lock-free-style triple-buffered frame handoff.

    Reference parity: the RenderFrame exchange between the 60 Hz update
    thread and the render thread (reference: test/datumtest.cpp:49-62,
    520-548 — writeframe = readyframe.exchange(writeframe)).
    """

    def __init__(self, make_frame):
        import threading as _t

        self._frames = [make_frame() for _ in range(3)]
        self._ready = None        # index of the freshest completed frame
        self._lock = _t.Lock()
        self._write = 0
        self._read = None

    def write_frame(self):
        return self._frames[self._write]

    def publish(self):
        """Update thread: swap the written frame into the ready slot."""
        with self._lock:
            old_ready = self._ready
            self._ready = self._write
            # reuse the stale ready slot (or the never-used third buffer)
            free = {0, 1, 2} - {self._ready, self._read}
            self._write = free.pop() if old_ready is None or old_ready in free \
                else old_ready

    def acquire_read(self):
        """Render thread: take the freshest frame (None if nothing new)."""
        with self._lock:
            if self._ready is None:
                return None
            self._read = self._ready
            self._ready = None
            return self._frames[self._read]


def run_threaded_loop(game_init, game_update, game_render, *, hz=60,
                      max_frames=None, sink=None, platform=None,
                      make_frame=dict):
    """Dedicated update thread + render on the caller thread.

    Reference parity: the datumtest host model (reference:
    test/datumtest-xcb.cpp:1083-1127 — update thread stepping at 1/hz,
    render thread spinning on the freshest ready frame).
    """
    import threading as _t

    platform = platform or Platform()
    sink = sink or FrameSink()
    inp = GameInput()
    state = game_init(platform)
    buffers = TripleBuffer(make_frame)
    stop = _t.Event()

    def update_thread():
        dt = 1.0 / hz
        next_t = time.perf_counter()
        while not stop.is_set() and not platform.terminated:
            game_update(platform, state, inp, dt, buffers.write_frame())
            buffers.publish()
            next_t += dt
            delay = next_t - time.perf_counter()
            if delay > 0:
                time.sleep(min(delay, dt))

    t = _t.Thread(target=update_thread, daemon=True)
    t.start()
    frames = 0
    try:
        while not platform.terminated:
            if max_frames is not None and frames >= max_frames:
                break
            frame = buffers.acquire_read()
            if frame is None:
                time.sleep(0.0005)
                continue
            game_render(platform, state, frame, sink)
            frames += 1
    finally:
        stop.set()
        t.join(timeout=2.0)
    return state, sink
