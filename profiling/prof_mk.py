"""Megakernel-only timing, bench-style: one jit, k separate dispatches
chained by a data dependency, one readback (avoids the nested-jit vmem
scoping that breaks the all-in-one-executable chain)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

K = 10


def main():
    from datum_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from datum_tpu.scenes import datumtest_scene
    from datum_tpu.render import frame as F
    from datum_tpu.render.types import make_sceneset
    from datum_tpu.ops.blur import downsample_pool, resize_up_dense
    from datum_tpu.ops.shade_pallas import shade_deferred_pallas
    from datum_tpu.ops.sampling import sample_cubemap_lod_quad
    from datum_tpu.ops.lighting_pass import view_ray_grid, _inv_proj

    ctx, camera, params, make_rl = datumtest_scene(
        width=1920, height=1088, sphere_detail=24, n_point_lights=8,
        max_vertices=1 << 15, max_triangles=1 << 15,
        bin_capacity=160, big_capacity=64, bin_max_span=8,
        use_pallas=True, shadow_factor_scale=4,
        enable_material_maps=True, texture_filter="mip_half",
        enable_ssao=True, enable_fog=True, enable_ssr=True,
        max_spot_shadows=1, max_particle_quads=512)
    cfg = ctx.config
    w, h = cfg.padded_width, cfg.padded_height
    rl = make_rl(0.0)
    ss = jax.device_put(make_sceneset(camera, params,
                                      point_lights=rl.point_lights,
                                      spot_lights=rl.spot_lights))
    rng = np.random.RandomState(5)

    names = ["depth", "visf", "nx", "ny", "nz", "dr", "dg", "db", "em",
             "sr", "sg", "sb", "rgh", "esr", "esg", "esb", "eb0", "eb1",
             "eb2", "sf", "sky_r", "sky_g", "sky_b", "fog_r", "fog_g",
             "fog_b", "fog_t", "oit_r", "oit_g", "oit_b", "oit_w",
             "oit_rev"]
    gpl = {k: jax.device_put(rng.uniform(0.01, 0.9, (h, w))
                             .astype(np.float32)) for k in names}
    ao = jax.device_put(rng.uniform(0.5, 1.0, (h, w)).astype(np.float32))
    spotsf = jax.device_put(rng.uniform(0.5, 1.0, (1, h, w))
                            .astype(np.float32))
    ss2 = dict(ss)
    sh9 = np.zeros((9, 3), np.float32)
    sh9[0] = 0.5
    ss2["_sh"] = jnp.asarray(sh9)

    @jax.jit
    def mk(gpl_, seed):
        g = dict(gpl_)
        g["depth"] = g["depth"] * (1.0 + 1e-12 * seed)
        out = shade_deferred_pallas(g, ss2, proj=ss["proj"],
                                    invview=ss["invview"], ao=ao,
                                    spotsf=spotsf)
        return out[0, 0, 0]

    s = jnp.float32(0.0)
    s = mk(gpl, s)
    float(s)                    # compile + settle
    for name, kk in (("megakernel chain", K),):
        ts = []
        for _ in range(3):
            s = jnp.float32(0.001)
            t0 = time.perf_counter()
            for _ in range(kk):
                s = mk(gpl, s)
            v = float(s)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts)) * 1000
        print(f"{name}: {(t - 26.0) / kk:.2f} ms/it (total {t:.1f})",
              flush=True)


if __name__ == "__main__":
    main()
