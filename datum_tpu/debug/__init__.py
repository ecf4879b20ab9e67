"""Debug / profiling layer.

Reference parity: src/debug.{h,cpp} — lock-free timed-block event ring
with frame markers, GPU pass timings, resource gauges, statistics,
live-tunable debug menu values, interactive overlay, binary dump for
offline viewing.
"""

from .debug import (
    DebugLog, timed_block, begin_timed_block, end_timed_block, frame_marker,
    statistic_hit, resource_use, debug_menu_value, stream_debuglog,
    load_debuglog, g_debuglog, log_once,
)
from .overlay import render_debug_overlay
