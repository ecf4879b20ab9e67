"""Platform layer: worker queue, file handles, threaded host loop."""

import numpy as np

from datum_tpu.platform import Platform, WorkQueue, run_game_loop, FrameSink
from datum_tpu.platform.host import TripleBuffer, run_threaded_loop


def test_workqueue_fanout_join():
    q = WorkQueue(workers=4)
    results = []
    import threading
    lock = threading.Lock()

    def work(i):
        with lock:
            results.append(i * i)

    for i in range(16):
        q.submit(work, i)
    q.wait(16)
    assert sorted(results) == [i * i for i in range(16)]


def test_file_handles(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(bytes(range(100)))
    plat = Platform()
    h = plat.open_handle(str(p))
    assert plat.read_handle(h, 10, 5) == bytes(range(10, 15))
    plat.close_handle(h)


def test_fixed_timestep_loop():
    steps = []

    def init(p):
        return dict(n=0)

    def update(p, s, inp, dt):
        s["n"] += 1
        steps.append(dt)

    def render(p, s, sink, lerp):
        sink.present(np.zeros((4, 4, 3), np.uint8))

    state, sink = run_game_loop(init, update, render, max_frames=5)
    assert state["n"] == 5
    assert sink.count == 5


def test_triple_buffer_handoff():
    tb = TripleBuffer(lambda: {"v": 0})
    assert tb.acquire_read() is None
    tb.write_frame()["v"] = 1
    tb.publish()
    f = tb.acquire_read()
    assert f["v"] == 1
    assert tb.acquire_read() is None   # consumed
    tb.write_frame()["v"] = 2
    tb.publish()
    tb.write_frame()["v"] = 3
    tb.publish()
    assert tb.acquire_read()["v"] == 3  # freshest wins


def test_threaded_loop_runs():
    import time

    def init(p):
        return dict(ticks=0, rendered=0)

    def update(p, s, inp, dt, frame):
        s["ticks"] += 1
        frame["t"] = s["ticks"]

    def render(p, s, frame, sink):
        s["rendered"] = frame["t"]
        sink.present(np.zeros((2, 2, 3), np.uint8))

    state, sink = run_threaded_loop(init, update, render, hz=120, max_frames=5)
    assert sink.count == 5
    assert state["ticks"] >= 5
    assert state["rendered"] > 0
