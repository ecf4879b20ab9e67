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
    ctx, camera, params, make_rl = stress_scene(
        width=320, height=160, terrain_n=96, sphere_detail=20,
        grid=(6, 3), n_point_lights=64, skybox_size=16,
        max_vertices=1 << 16, max_triangles=1 << 16, big_capacity=32)
    rl = make_rl(0.0)
    ss = make_sceneset(camera, params, point_lights=rl.point_lights)
    draws = rl.draw_arrays(ctx.config.max_instances, ctx.default_material)
    out = frame_mod.render_frame(ctx.config, ctx.device_state(), draws, ss)
    img = np.asarray(out["image"]).astype(np.float32)

    assert int(out["bin_overflow"]) == 0, (
        f"bin overflow {int(out['bin_overflow'])} at stress density")
    coverage = (img.max(-1) > 0).mean()
    assert coverage > 0.95, f"coverage {coverage:.3f}"
    # terrain fills the lower half; the sphere wall the middle
    lower = img[100:150, 40:280]
    assert lower.mean() > 15, f"terrain too dark: {lower.mean():.1f}"
    assert 0.005 < float(out["luminance"]) < 5.0
