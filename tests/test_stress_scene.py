"""Dense-mesh + many-light stress scene (reference:
test/datumtest.cpp:175-202 Sponza + 128-light block).

CI runs a reduced CPU-sized config; the full 1080p / 250k-triangle /
128-light numbers are recorded by profiling/bench_stress.py on TPU (see
PERF.md scale table)."""

import numpy as np
import pytest

from datum_tpu.render import frame as frame_mod
from datum_tpu.render.types import make_sceneset
from datum_tpu.scenes import stress_scene

pytestmark = pytest.mark.slow


def test_stress_scene_renders_without_overflow():
    import os
    from datum_tpu.tools.stress_golden import render

    img_u8, out = render()
    img = img_u8.astype(np.float32)

    assert int(out["bin_overflow"]) == 0, (
        f"bin overflow {int(out['bin_overflow'])} at stress density")
    coverage = (img.max(-1) > 0).mean()
    assert coverage > 0.95, f"coverage {coverage:.3f}"
    # terrain fills the lower half; the sphere wall the middle
    lower = img[100:150, 40:280]
    assert lower.mean() > 15, f"terrain too dark: {lower.mean():.1f}"
    assert 0.005 < float(out["luminance"]) < 5.0

    # image golden: dense-mesh raster regressions (bin pressure, sliver
    # leaks, cluster binning) fail here
    from PIL import Image
    gp = os.path.join(os.path.dirname(__file__), "golden", "stress.png")
    assert os.path.exists(gp), (
        "missing stress golden; run python -m datum_tpu.tools.stress_golden")
    gold = np.asarray(Image.open(gp).convert("RGB")).astype(np.float32)
    rmse = float(np.sqrt(np.mean((img / 255.0 - gold / 255.0) ** 2)))
    assert rmse < 2.0 / 255.0, f"stress RMSE {rmse:.5f} vs golden"
