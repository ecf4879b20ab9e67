"""Golden-statistics regression test for the flagship scene.

The reference ships golden screenshots (reference: bin/datumtest.png);
pixel-exact goldens are too brittle across kernel changes, so this
locks broad image statistics of the datumtest scene instead — coverage,
channel balance, brightness band, luminance feedback.
"""

import numpy as np

from datum_tpu.scenes import datumtest_scene
from datum_tpu.render.types import make_sceneset
from datum_tpu.render import frame as frame_mod


def test_datumtest_scene_statistics():
    ctx, camera, params, make_rl = datumtest_scene(
        width=256, height=128, sphere_detail=10, grid=(4, 3),
        n_point_lights=4, max_vertices=1 << 13, max_triangles=1 << 13,
        max_instances=16, bin_capacity=256, big_capacity=16,
        shadow_res=256, shadow_bin_capacity=128)
    rl = make_rl(0.0)
    ss = make_sceneset(camera, params, point_lights=rl.point_lights)
    draws = rl.draw_arrays(ctx.config.max_instances, ctx.default_material)
    out = frame_mod.render_frame(ctx.config, ctx.device_state(), draws, ss)
    img = np.asarray(out["image"]).astype(np.float32)

    # with the scene skybox every pixel is covered (sky fills background)
    coverage = (img.max(-1) > 0).mean()
    assert 0.95 < coverage <= 1.0, f"coverage {coverage:.3f}"
    mean = img.mean()
    assert 25 < mean < 160, f"mean brightness {mean:.1f}"
    # red spheres dominate the centre band (the blue sky owns the top)
    centre = img[img.shape[0] // 4: img.shape[0] // 2,
                 img.shape[1] // 4: 3 * img.shape[1] // 4]
    assert centre[..., 0].mean() > centre[..., 2].mean()
    lum = float(out["luminance"])
    assert 0.005 < lum < 2.0, f"luminance {lum}"
    # determinism: identical input -> identical image
    out2 = frame_mod.render_frame(ctx.config, ctx.device_state(), draws, ss)
    np.testing.assert_array_equal(np.asarray(out2["image"]), img.astype(np.uint8))
