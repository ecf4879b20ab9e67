#!/usr/bin/env python
"""Regenerate the committed golden images for the example apps.

Runs every example headless on the virtual-CPU platform at a small fixed
config and stores the final frame under tests/golden/.  The image-RMSE
test (tests/test_examples_golden.py) gates regressions against these
(BASELINE.json acceptance: per-pass RMSE vs reference frames; the
committed goldens are our captured frames).

Usage: python tools/update_goldens.py [example ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
GOLDEN_DIR = os.path.join(REPO, "tests", "golden")

# (name, extra argv) — small sizes keep CPU render time and repo bytes low
EXAMPLES = {
    "triangle": [],
    "teapot": [],
    "material": [],
    "skybox": [],
    "character": [],
    "ocean": [],
    "stardust": [],
    "asteroids": [],
    "datumtest": [],
    "city": [],
}
COMMON = ["--cpu", "--frames", "3", "--width", "320", "--height", "160"]


def render_example(name: str, out_path: str) -> None:
    cmd = ([sys.executable, os.path.join(REPO, "examples", f"{name}.py")]
           + COMMON + EXAMPLES[name] + ["--out", out_path])
    env = dict(os.environ)
    res = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=1200)
    if res.returncode != 0:
        raise RuntimeError(f"{name} failed rc={res.returncode}:\n"
                           f"{res.stdout[-2000:]}\n{res.stderr[-2000:]}")


def render_megakernel(out_path: str) -> None:
    """Fast-path (Pallas megakernel, interpret mode) golden — see
    datum_tpu/tools/megakernel_golden.py."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "-m", "datum_tpu.tools.megakernel_golden",
         out_path], env=env, cwd=REPO, capture_output=True, text=True,
        timeout=1800)
    if res.returncode != 0:
        raise RuntimeError(f"megakernel golden failed rc={res.returncode}:\n"
                           f"{res.stdout[-2000:]}\n{res.stderr[-2000:]}")


def render_stress(out_path: str) -> None:
    """Dense-mesh + many-light stress golden (see
    datum_tpu/tools/stress_golden.py)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "-m", "datum_tpu.tools.stress_golden", out_path],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1800)
    if res.returncode != 0:
        raise RuntimeError(f"stress golden failed rc={res.returncode}:\n"
                           f"{res.stdout[-2000:]}\n{res.stderr[-2000:]}")


def main(argv):
    names = argv or (list(EXAMPLES) + ["megakernel", "stress"])
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in names:
        out = os.path.join(GOLDEN_DIR, f"{name}.png")
        print(f"rendering golden: {name} -> {out}", flush=True)
        if name == "megakernel":
            render_megakernel(out)
        elif name == "stress":
            render_stress(out)
        else:
            render_example(name, out)
    print("done")


if __name__ == "__main__":
    main(sys.argv[1:])
