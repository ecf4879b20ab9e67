"""Platform layer: game memory, input, file IO, worker queue, host loop.

Reference parity: src/platform.h PlatformInterface (open/read/close
handles, submit_work thread pool, terminate), GameInput, and the two
host models (test/datumtest-xcb.cpp dedicated update thread + triple
buffered handoff; examples/example-xcb.cpp fixed-timestep catch-up
loop).  Presentation is headless: frames go to PNG/PPM sinks or a
user callback (no display server in the TPU deployment target).
"""

from .platform import Platform, GameInput, WorkQueue
from .host import run_game_loop, FrameSink
