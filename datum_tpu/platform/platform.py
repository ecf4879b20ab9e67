"""PlatformInterface equivalent: files, worker pool, input state.

Reference parity: src/platform.h:155-201 — PlatformInterface vtable
(open_handle/read_handle/close_handle, submit_work, terminate), the
GameMemory arenas (not needed — Python owns allocation; the device
pools in render/context.py are the arena analogue), GameInput
(keys/mouse/controllers/events).
"""

from __future__ import annotations

import threading
from concurrent.futures import ThreadPoolExecutor


class FileHandle:
    __slots__ = ("_f", "_lock")

    def __init__(self, path):
        self._f = open(path, "rb")
        self._lock = threading.Lock()

    def read(self, position, nbytes):
        with self._lock:
            self._f.seek(position)
            return self._f.read(nbytes)

    def close(self):
        self._f.close()


class WorkQueue:
    """submit_work equivalent (reference: platform.h:185, the worker
    thread pool the asset loader and particle systems fan out to)."""

    def __init__(self, workers=4):
        self._pool = ThreadPoolExecutor(max_workers=workers,
                                        thread_name_prefix="datum-worker")
        self._sem = threading.Semaphore(0)

    def submit(self, fn, *args):
        def run():
            try:
                fn(*args)
            finally:
                self._sem.release()
        self._pool.submit(run)

    def wait(self, count):
        """Join `count` completed work items (reference: the
        semaphore-counted fan-out/join in examples/stardust.cpp:341-355)."""
        for _ in range(count):
            self._sem.acquire()


class GameInput:
    """Polled input snapshot (reference: platform.h GameInput)."""

    def __init__(self):
        self.keys = [False] * 256
        self.mouse_x = 0.0
        self.mouse_y = 0.0
        self.mouse_dx = 0.0
        self.mouse_dy = 0.0
        self.mouse_buttons = [False] * 5
        self.mouse_wheel = 0.0
        self.text = ""
        self.controllers = []

    def key_pressed(self, code):
        return self.keys[code % 256]


class Platform:
    def __init__(self, workers=4):
        self._handles: dict[int, FileHandle] = {}
        self._next = 1
        self.workqueue = WorkQueue(workers)
        self.terminated = False

    # --- files ------------------------------------------------------------
    def open_handle(self, identifier) -> int:
        h = self._next
        self._next += 1
        self._handles[h] = FileHandle(identifier)
        return h

    def read_handle(self, handle, position, nbytes) -> bytes:
        return self._handles[handle].read(position, nbytes)

    def close_handle(self, handle):
        self._handles.pop(handle).close()

    # --- work -------------------------------------------------------------
    def submit_work(self, fn, *args):
        self.workqueue.submit(fn, *args)

    def terminate(self):
        self.terminated = True
