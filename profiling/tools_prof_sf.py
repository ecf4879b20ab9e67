"""ESM shadow-factor scale: time full frame at scale 2 vs 4."""
import time, numpy as np, jax, jax.numpy as jnp
import dataclasses

def timeit(fn, *args, n=5, name=""):
    sfn = jax.jit(lambda *a: jax.tree_util.tree_leaves(fn(*a))[0].ravel()[:1].astype(jnp.float32).sum())
    float(sfn(*args))
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); float(sfn(*args)); ts.append(time.perf_counter()-t0)
    print(f"{name:40s} {np.median(ts)*1000:8.2f} ms", flush=True)

from datum_tpu.scenes import datumtest_scene
from datum_tpu.render.types import make_sceneset
from datum_tpu.render import frame as frame_mod

for scale in (2, 4):
    ctx, camera, params, make_rl = datumtest_scene(
        width=1920, height=1088, sphere_detail=24, n_point_lights=8,
        max_vertices=1 << 15, max_triangles=1 << 15,
        bin_capacity=256, big_capacity=64,
        use_pallas=True, enable_material_maps=False,
        texture_filter="nearest_half", shadow_factor_scale=scale)
    device = jax.device_put(ctx.device_state())
    rl = make_rl(0.0)
    ss = jax.device_put(make_sceneset(camera, params, point_lights=rl.point_lights))
    draws = jax.device_put(rl.draw_arrays(ctx.config.max_instances, ctx.default_material))
    cfg = ctx.config
    def full(draws, ss, cfg=cfg, device=device):
        return frame_mod.render_frame(cfg, device, draws, ss)["luminance"]
    timeit(full, draws, ss, name=f"FULL FRAME sf_scale={scale}")
