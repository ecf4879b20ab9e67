"""Timed-block profiling ring + statistics + debug menu.

Reference parity: src/debug.h:104-213 — a fixed-size global event ring
(g_debuglog[4096]) stamped with a monotonic counter, BEGIN/END_TIMED_
BLOCK macros, GPU block entries (here: jitted-pass wall times measured
with readback fences), RESOURCE_USE gauges, STATISTIC_HIT counters,
DEBUG_MENU_VALUE live-tunable values, and a binary dump
(stream_debuglog) loadable by the offline viewer (tools/debugviewer).
"""

from __future__ import annotations

import contextlib
import struct
import threading
import time

RING_SIZE = 4096

ENTRY_FRAME = 0
ENTRY_BEGIN = 1
ENTRY_END = 2
ENTRY_GPU = 3
ENTRY_STAT = 4
ENTRY_GAUGE = 5


class DebugLog:
    def __init__(self, size=RING_SIZE):
        self.entries = [None] * size
        self.tail = 0
        self.size = size
        self._lock = threading.Lock()
        self.statistics: dict[str, int] = {}
        self.gauges: dict[str, tuple] = {}
        self.menu_values: dict[str, float] = {}
        self.frame = 0

    def push(self, kind, name, timestamp=None, color=(1, 1, 1), extra=0.0):
        ts = timestamp if timestamp is not None else time.perf_counter()
        i = self.tail % self.size
        self.entries[i] = (kind, name, ts, color, extra, self.frame)
        self.tail += 1

    # --- queries ------------------------------------------------------------
    def block_times(self, frames_back=1):
        """{name: total seconds} over recent frames, pairing begin/end."""
        open_ts = {}
        totals = {}
        lo = max(0, self.tail - self.size)
        min_frame = self.frame - frames_back
        for idx in range(lo, self.tail):
            e = self.entries[idx % self.size]
            if e is None or e[5] < min_frame:
                continue
            kind, name, ts = e[0], e[1], e[2]
            if kind == ENTRY_BEGIN:
                open_ts[name] = ts
            elif kind == ENTRY_END and name in open_ts:
                totals[name] = totals.get(name, 0.0) + ts - open_ts.pop(name)
            elif kind == ENTRY_GPU:
                totals[name] = totals.get(name, 0.0) + e[4]
        return totals


g_debuglog = DebugLog()


def frame_marker():
    g_debuglog.frame += 1
    g_debuglog.push(ENTRY_FRAME, "frame")


def begin_timed_block(name, color=(1, 1, 1)):
    g_debuglog.push(ENTRY_BEGIN, name, color=color)


def end_timed_block(name):
    g_debuglog.push(ENTRY_END, name)


@contextlib.contextmanager
def timed_block(name, color=(1, 1, 1)):
    begin_timed_block(name, color)
    try:
        yield
    finally:
        end_timed_block(name)


def gpu_block(name, seconds):
    """Record a device pass duration (the GPU_TIMED_BLOCK analogue —
    measured by readback-fenced wall time or profiler trace)."""
    g_debuglog.push(ENTRY_GPU, name, extra=seconds)


def statistic_hit(name, count=1):
    g_debuglog.statistics[name] = g_debuglog.statistics.get(name, 0) + count


def resource_use(name, used, capacity):
    g_debuglog.gauges[name] = (used, capacity)


def debug_menu_value(name, default):
    """Live-tunable value (reference: DEBUG_MENU_VALUE)."""
    return g_debuglog.menu_values.setdefault(name, default)


def set_debug_menu_value(name, value):
    g_debuglog.menu_values[name] = value


MAGIC = 0x44544C47  # 'GLTD'


def stream_debuglog(path, log: DebugLog | None = None):
    """Binary dump of the event ring (reference: debug.h:228-261)."""
    log = log or g_debuglog
    with open(path, "wb") as f:
        lo = max(0, log.tail - log.size)
        entries = [log.entries[i % log.size] for i in range(lo, log.tail)]
        entries = [e for e in entries if e is not None]
        f.write(struct.pack("<II", MAGIC, len(entries)))
        for kind, name, ts, color, extra, frame in entries:
            nb = name.encode()[:63]
            f.write(struct.pack("<BdfI", kind, ts, extra, frame))
            f.write(struct.pack("<B", len(nb)) + nb)


def load_debuglog(path):
    out = []
    with open(path, "rb") as f:
        magic, count = struct.unpack("<II", f.read(8))
        assert magic == MAGIC, "bad debuglog dump"
        for _ in range(count):
            kind, ts, extra, frame = struct.unpack("<BdfI", f.read(17))
            (nlen,) = struct.unpack("<B", f.read(1))
            name = f.read(nlen).decode()
            out.append(dict(kind=kind, name=name, time=ts, extra=extra, frame=frame))
    return out


_logged_once = set()


def log_once(message):
    """Print a message at most once per process (reference: debug.h
    LOG_ONCE macro)."""
    if message not in _logged_once:
        _logged_once.add(message)
        print(message)
