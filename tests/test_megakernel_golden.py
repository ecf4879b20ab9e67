"""Golden-image gate for the megakernel FAST path (interpret mode).

All 9 example goldens render the XLA/CPU path; this one locks the Pallas
raster + deferred-shade megakernel with the full bench feature set
(clusters + spot + fog + SSAO + OIT + lit translucent + decals) so a
megakernel visual regression fails CI without TPU hardware.

Regenerate after intentional visual changes:
    python -m datum_tpu.tools.megakernel_golden tests/golden/megakernel.png
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "megakernel.png")
RMSE_TOL = 2.0 / 255.0


def test_megakernel_frame_matches_golden():
    from PIL import Image

    from datum_tpu.tools.megakernel_golden import render_megakernel_frame

    assert os.path.exists(GOLDEN), (
        "missing golden; run python -m datum_tpu.tools.megakernel_golden "
        "tests/golden/megakernel.png")
    img = render_megakernel_frame()
    gold = np.asarray(Image.open(GOLDEN).convert("RGB"))
    assert img.shape == gold.shape
    d = img.astype(np.float32) / 255.0 - gold.astype(np.float32) / 255.0
    err = float(np.sqrt(np.mean(d * d)))
    assert err < RMSE_TOL, (
        f"megakernel fast path: RMSE {err:.5f} vs golden (tol "
        f"{RMSE_TOL:.5f}) — if intentional, regenerate the golden")
