"""example-stardust: large particle field with worker-thread updates
(reference: examples/stardust — 120k particles fanned out over the
worker pool)."""

import numpy as np

from common import run_example


def init(args):
    from datum_tpu.math import Transform
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.platform import Platform
    from datum_tpu.render import Camera, RenderContext, RenderParams
    from datum_tpu.render.particlesystem import (
        Distribution, ParticleEmitter, ParticleSystem,
    )

    cfg = FrameConfig(width=args.width, height=args.height,
                      max_vertices=256, max_triangles=256, max_instances=4,
                      bin_capacity=2048, big_capacity=64,
                      enable_shadows=False, max_particle_quads=4096,
                      enable_bloom=True)
    ctx = RenderContext(cfg)
    platform = Platform(workers=4)

    systems = []
    for k in range(4):       # 4 systems updated on worker threads
        ps = ParticleSystem(maxparticles=1024, emitters=[ParticleEmitter(
            rate=400.0, life=Distribution.uniform(2.0, 5.0),
            velocity=Distribution.uniform(0.2, 1.2), shape="sphere",
            shape_radius=6.0,
            size=Distribution.uniform(0.03, 0.10),
            color=Distribution.uniform([1.0, 0.7, 0.2, 0.3], [4.0, 2.5, 1.0, 0.8]),
            acceleration=np.array([0, 0.05, 0], np.float32),
            rotate_over_life=Distribution.constant(1.0))])
        systems.append((ps, ps.create(seed=k), Transform.translation(
            [(k % 2) * 6 - 3.0, 0.0, (k // 2) * 6 - 3.0])))

    cam = Camera()
    cam.set_projection(np.radians(60), args.width / args.height)
    cam.lookat(np.array([0.0, 3.0, 14.0]), np.array([0.0, 0.5, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=args.width, height=args.height)
    params.sunintensity = np.zeros(3, np.float32)
    params.ambientintensity = 0.0
    return dict(ctx=ctx, platform=platform, systems=systems, cam=cam,
                params=params)


def update(state, dt):
    # fan out particle updates to the worker pool, then join
    # (reference: stardust.cpp:341-355 semaphore-counted submit_work)
    plat = state["platform"]
    for ps, inst, tf in state["systems"]:
        plat.submit_work(ps.update, inst, dt, tf)
    plat.workqueue.wait(len(state["systems"]))


def render(state):
    from datum_tpu.render import RenderList

    rl = RenderList()
    for ps, inst, tf in state["systems"]:
        rl.push_particles(inst)
    return state["ctx"].render(state["cam"], rl, state["params"])


if __name__ == "__main__":
    run_example("stardust", init, update, render)
