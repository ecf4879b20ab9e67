"""example-character: skeletal animation blending idle/walk/run
(reference: examples/character — channel-weight blending)."""

import numpy as np

from common import run_example


def init(args):
    from datum_tpu.asset import PackReader
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import Camera, RenderContext, RenderParams, primitives
    from datum_tpu.render.animation import Animation, Animator

    cfg = FrameConfig(width=args.width, height=args.height,
                      max_vertices=1 << 14, max_triangles=1 << 14,
                      max_instances=4, bin_capacity=4096, big_capacity=16,
                      enable_shadows=False, enable_skinning=True,
                      max_palettes=4, max_bones=128)
    ctx = RenderContext(cfg)
    pack = PackReader("/root/reference/bin/character.pack")
    md = pack.mesh(1)
    mesh = ctx.add_mesh(md["vertices"], md["indices"],
                        mincorner=md["mincorner"], maxcorner=md["maxcorner"],
                        rig=md["rig"])
    pv, pi = primitives.plane(8.0, 4.0)
    floor = ctx.add_mesh(pv, pi)
    mat = ctx.add_material(color=(0.75, 0.6, 0.5, 1), roughness=0.6)
    fmat = ctx.add_material(color=(0.45, 0.45, 0.48, 1), roughness=0.8)

    animator = Animator(md["bones"])
    channels = []
    for aid in (2, 3, 4):   # idle / walk / run clips in the pack
        anim = Animation.from_asset(pack.animation(aid))
        channels.append(animator.play(anim, weight=0.0, rate=1.0))
    channels[0].weight = 1.0

    centre = 0.5 * (md["mincorner"] + md["maxcorner"])
    size = float(np.linalg.norm(md["maxcorner"] - md["mincorner"]))
    cam = Camera()
    cam.set_projection(np.radians(55), args.width / args.height)
    cam.lookat(centre + np.array([0.3 * size, 0.25 * size, 1.1 * size], np.float32),
               centre, np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=args.width, height=args.height)
    params.sundirection = np.array([-0.4, -0.8, -0.45], np.float32)
    params.sundirection /= np.linalg.norm(params.sundirection)
    params.sunintensity = np.array([3.6, 3.5, 3.3], np.float32)
    params.ambientintensity = 0.4
    return dict(ctx=ctx, mesh=mesh, floor=floor, mat=mat, fmat=fmat,
                animator=animator, channels=channels, cam=cam, params=params,
                t=0.0)


def update(state, dt):
    state["t"] += dt
    # crossfade idle -> walk over time (reference character.cpp:54-56)
    blend = min(max(np.sin(state["t"] * 0.5) + 0.5, 0.0), 1.0)
    state["channels"][0].weight = 1.0 - blend
    state["channels"][1].weight = blend
    state["animator"].update(dt)


def render(state):
    from datum_tpu.math import Transform
    from datum_tpu.render import RenderList

    rl = RenderList()
    rl.push_mesh(state["floor"], Transform.identity(), state["fmat"])
    rl.push_actor(state["mesh"], Transform.identity(), state["mat"],
                  state["animator"].palette())
    return state["ctx"].render(state["cam"], rl, state["params"])


if __name__ == "__main__":
    run_example("character", init, update, render, width=384, height=384)
