"""Golden-image gate for the example apps.

Every example renders headless (virtual-CPU platform, fixed tiny config,
fixed seeds) and must match its committed golden PNG within a small
RMSE.  This is the image-quality harness BASELINE.json's acceptance
asks for (per-pass RMSE vs captured frames), and it doubles as the
examples smoke test — a crash or a visual regression (e.g. the round-1
blocky shadow noise) fails here.

Regenerate after intentional visual changes:
    python datum_tpu/tools/update_goldens.py [example ...]
"""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")

sys.path.insert(0, os.path.join(REPO))

EXAMPLES = ["triangle", "teapot", "material", "skybox", "character",
            "ocean", "stardust", "asteroids", "datumtest", "city"]

# identical float programs on the same platform reproduce exactly; the
# tolerance absorbs XLA-version fusion drift, not visual change
RMSE_TOL = 2.0 / 255.0


def _rmse(a, b):
    d = a.astype(np.float32) / 255.0 - b.astype(np.float32) / 255.0
    return float(np.sqrt(np.mean(d * d)))


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_matches_golden(name):
    from PIL import Image

    from datum_tpu.tools.update_goldens import render_example

    golden_path = os.path.join(GOLDEN_DIR, f"{name}.png")
    assert os.path.exists(golden_path), (
        f"missing golden for {name}; run datum_tpu/tools/update_goldens.py")
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, f"{name}.png")
        render_example(name, out)          # raises on nonzero exit (smoke)
        img = np.asarray(Image.open(out).convert("RGB"))
    gold = np.asarray(Image.open(golden_path).convert("RGB"))
    assert img.shape == gold.shape
    err = _rmse(img, gold)
    assert err < RMSE_TOL, (
        f"{name}: RMSE {err:.5f} vs golden (tol {RMSE_TOL:.5f}) — if the "
        "change is intentional, regenerate with update_goldens.py")
