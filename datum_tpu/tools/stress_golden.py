"""Dense-mesh + many-light stress-scene golden renderer.

Reference parity: the Sponza + 128-light stress block
(reference: test/datumtest.cpp:175-202) — this is the reduced CI-sized
cut of that promise: ~30k-triangle terrain + sphere wall + 64 clustered
lights, rendered on the XLA/CPU path at a fixed config and gated by an
image golden (tests/test_stress_scene.py).

Run standalone to (re)generate: python -m datum_tpu.tools.stress_golden
tests/golden/stress.png
"""

from __future__ import annotations

import numpy as np

CONFIG = dict(width=320, height=160, terrain_n=96, sphere_detail=20,
              grid=(6, 3), n_point_lights=64, skybox_size=16,
              max_vertices=1 << 16, max_triangles=1 << 16, big_capacity=32)


def render():
    """Render the fixed stress config; returns (img u8, out dict)."""
    from ..render import frame as frame_mod
    from ..render.types import make_sceneset
    from ..scenes import stress_scene

    ctx, camera, params, make_rl = stress_scene(**CONFIG)
    rl = make_rl(0.0)
    ss = make_sceneset(camera, params, point_lights=rl.point_lights)
    draws = rl.draw_arrays(ctx.config.max_instances, ctx.default_material)
    out = frame_mod.render_frame(ctx.config, ctx.device_state(), draws, ss)
    return np.asarray(out["image"]), out


def main(argv):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from PIL import Image

    out_path = argv[0] if argv else "tests/golden/stress.png"
    img, out = render()
    assert int(out["bin_overflow"]) == 0
    Image.fromarray(img).save(out_path)
    print(f"stress golden -> {out_path}")


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
