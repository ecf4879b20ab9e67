

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
