"""datumtest: the kitchen-sink integration scene (reference:
test/datumtest.cpp — roughness/metalness sphere grid, floor, lights,
spot shadow, particles, auto-exposure, debug overlay)."""

import numpy as np

from common import run_example


def init(args):
    from datum_tpu.math import Transform
    from datum_tpu.render.particlesystem import (
        Distribution, ParticleEmitter, ParticleSystem,
    )
    from datum_tpu.scenes import datumtest_scene

    ctx, camera, params, make_rl = datumtest_scene(
        width=args.width, height=args.height, sphere_detail=20,
        n_point_lights=8, max_vertices=1 << 15, max_triangles=1 << 15,
        big_capacity=32,
        # mip-filtered material maps (v2 table) — works on the XLA/CPU
        # path too, so the committed golden is moire-free
        enable_material_maps=True, texture_filter="mip",
        max_particle_quads=512, max_spot_shadows=1, spot_shadow_res=256,
        # forward/OIT content — the reference datumtest always renders
        # its translucent + water + decal set (datumtest.cpp:579-673);
        # on this XLA path glass/water blend as WBOIT and decals apply
        # in the deferred resolve
        max_translucent_draws=2, max_translucent_tris=2048,
        max_decals_active=2)

    ps = ParticleSystem(maxparticles=400, emitters=[ParticleEmitter(
        rate=120.0, life=Distribution.uniform(1.0, 2.5),
        velocity=Distribution.uniform(1.0, 3.0), shape="cone", shape_angle=0.4,
        size=Distribution.uniform(0.05, 0.15),
        color=Distribution.uniform([2.0, 1.0, 0.2, 0.4], [5.0, 2.0, 0.5, 0.8]))])
    inst = ps.create(seed=2)
    return dict(ctx=ctx, camera=camera, params=params, make_rl=make_rl,
                ps=ps, inst=inst, t=0.0,
                emitter_tf=Transform.translation([6.0, 0.2, 2.0]))


def update(state, dt):
    from datum_tpu.render.camera import adapt

    state["t"] += dt
    state["ps"].update(state["inst"], dt, state["emitter_tf"])
    # auto-exposure from last frame's luminance (reference:
    # datumtest.cpp:357 adapt())
    adapt(state["camera"], state["ctx"].luminance, targetluminance=0.4)


def render(state):
    rl = state["make_rl"](state["t"])
    rl.push_particles(state["inst"])
    rl.push_spotlight([4.0, 6.0, 4.0], [-0.4, -1.0, -0.4], [120.0, 110.0, 90.0],
                      cutoff=0.75, attenuation=(1.0, 0.0, 1.0), range_=25.0)
    return state["ctx"].render(state["camera"], rl, state["params"])


if __name__ == "__main__":
    run_example("datumtest", init, update, render, width=640, height=352)
