

def test_debugviewer_renders_timeline(tmp_path):
    import time

    from datum_tpu.debug.debug import (
        DebugLog, frame_marker, g_debuglog, gpu_block, stream_debuglog,
        timed_block,
    )
    from datum_tpu.tools.debugviewer import main, render_html

    for _ in range(2):
        frame_marker()
        with timed_block("update"):
            with timed_block("animation"):
                time.sleep(0.001)
        with timed_block("render"):
            time.sleep(0.002)
        gpu_block("raster", 0.004)
    dump = tmp_path / "prof.gltd"
    stream_debuglog(dump)
    out = tmp_path / "prof.html"
    assert main([str(dump), str(out)]) == 0
    text = out.read_text()
    assert "animation" in text and "raster" in text and "<svg" in text


def test_debug_overlay_menu():
    import numpy as np

    from datum_tpu.debug.debug import DebugLog, debug_menu_value, g_debuglog
    from datum_tpu.debug.overlay import debug_menu_adjust, render_debug_overlay

    debug_menu_value("fog.density", 0.5)
    debug_menu_value("bloom.cut", 7.8)
    name = debug_menu_adjust(direction=1)
    assert name == "bloom.cut"
    debug_menu_adjust(delta=0.1)
    assert g_debuglog.menu_values["bloom.cut"] > 7.8

    img = np.zeros((128, 256, 3), np.uint8)
    render_debug_overlay(img, fps=60.0)
    assert img.max() > 0
