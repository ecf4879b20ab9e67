"""Diagnose sharded-vs-single divergence: save both frames + diff map.

Run:  _DATUM_MULTICHIP_CHILD=1 JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python profiling/diag_shard.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from datum_tpu.utils import enable_compilation_cache
enable_compilation_cache()

from datum_tpu.ops.common import TILE_H
from datum_tpu.parallel import make_device_mesh, render_frame_sharded
from datum_tpu.render import frame as frame_mod
from datum_tpu.render.types import make_sceneset
from datum_tpu.scenes import datumtest_scene

n_devices = 8
height = 2 * TILE_H * max(n_devices, 2)
ctx, camera, params, make_rl = datumtest_scene(
    width=256, height=height, sphere_detail=8, grid=(3, 2),
    n_point_lights=4, skybox=True, skybox_size=16,
    max_vertices=4096, max_triangles=4096,
    max_instances=16, bin_capacity=128, big_capacity=32,
    use_pallas=True, pallas_interpret=True,
    enable_material_maps=True, texture_filter="mip_half",
    enable_ssao=True, enable_fog=True, enable_ssr=True,
    enable_shadows=True, shadow_res=128, shadow_bin_capacity=128,
    max_spot_shadows=1, spot_shadow_res=128,
    max_particle_quads=64, max_translucent_draws=2,
    max_translucent_tris=1024, max_decals_active=2)
rl = make_rl(0.0)
sceneset = make_sceneset(camera, params, point_lights=rl.point_lights,
                         spot_lights=rl.spot_lights)
cfg = ctx.config
draws = rl.draw_arrays(cfg.max_instances, ctx.default_material)
ctx.expand_host(draws)
draws["forward"] = rl.forward_arrays(cfg.max_particle_quads, camera)
draws["translucent"] = rl.translucent_arrays(
    cfg.max_translucent_draws, ctx.default_material)
draws["decals"] = rl.decal_arrays(cfg.max_decals_active)
device = ctx.device_state()

mesh = make_device_mesh(n_devices)
out = render_frame_sharded(cfg, mesh, device, draws, sceneset)
img = np.asarray(jax.block_until_ready(out["image"])).astype(np.float32)
ref = frame_mod.render_frame(cfg, device, draws, sceneset)
ref_img = np.asarray(ref["image"]).astype(np.float32)

d = np.abs(img - ref_img).max(-1)
rmse = float(np.sqrt(np.mean(((img - ref_img) / 255.0) ** 2)))
print("rmse", rmse, "maxdiff", d.max())
band_h = (cfg.tiles_y // n_devices) * TILE_H
for b in range(n_devices):
    sl = d[b * band_h:(b + 1) * band_h]
    print(f"band {b}: mean {sl.mean():6.2f}  max {sl.max():5.0f}  "
          f"rows>8: {(sl.max(1) > 8).sum()}/{band_h}")
# worst rows overall
rows = d.max(1)
worst = np.argsort(rows)[-10:]
print("worst rows:", sorted(worst.tolist()), rows[worst])

from PIL import Image
Image.fromarray(img.astype(np.uint8)).save("/tmp/shard_img.png")
Image.fromarray(ref_img.astype(np.uint8)).save("/tmp/shard_ref.png")
dv = np.clip(d * 4.0, 0, 255).astype(np.uint8)
Image.fromarray(dv).save("/tmp/shard_diff.png")
print("saved /tmp/shard_{img,ref,diff}.png")
