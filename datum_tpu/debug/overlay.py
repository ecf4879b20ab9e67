"""In-frame debug overlay: frame-time bars, block list, gauges.

Reference parity: src/debug.cpp:926-1035 — the interactive overlay with
a frame-time flamegraph, resource-usage bars and live value menu,
rendered via the sprite pass.  Here it composites onto the presented
frame with the host blitter.
"""

from __future__ import annotations

import numpy as np

from ..render.sprite import Font, draw_text
from .debug import g_debuglog

_font = None


def _get_font():
    global _font
    if _font is None:
        _font = Font.builtin()
    return _font


def render_debug_overlay(image: np.ndarray, fps=None, log=None):
    """Draw profiling overlay onto a uint8 frame in place."""
    log = log or g_debuglog
    font = _get_font()
    y = 8
    if fps is not None:
        draw_text(image, font, f"FPS: {fps:.1f}", 8, y, tint=(1, 1, 0.3, 1))
        y += 10

    times = log.block_times(frames_back=1)
    total = sum(times.values()) or 1e-9
    barw = min(200, image.shape[1] - 120)
    for name, secs in sorted(times.items(), key=lambda kv: -kv[1])[:12]:
        ms = secs * 1000
        draw_text(image, font, f"{name[:14]}", 8, y, tint=(1, 1, 1, 0.9))
        draw_text(image, font, f"{ms:7.2f} MS", 100, y, tint=(0.6, 1, 0.6, 0.9))
        frac = min(secs / total, 1.0)
        x0 = 170
        image[y:y + 6, x0:x0 + int(barw * frac), 1] = 200
        image[y:y + 6, x0:x0 + int(barw * frac), 0] = 80
        y += 9
        if y > image.shape[0] - 20:
            break

    for name, (used, cap) in list(log.gauges.items())[:8]:
        draw_text(image, font, f"{name[:14]}", 8, y, tint=(0.8, 0.8, 1, 0.9))
        draw_text(image, font, f"{used}/{cap}", 100, y, tint=(0.8, 0.8, 1, 0.9))
        y += 9
    return image
