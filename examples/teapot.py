"""example-teapot: pack-loaded mesh, PBR material, shadows (reference:
examples/teapot)."""

import numpy as np

from common import run_example


def init(args):
    from datum_tpu.asset import PackReader
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import Camera, RenderContext, RenderParams
    from datum_tpu.render import primitives

    cfg = FrameConfig(width=args.width, height=args.height,
                      max_vertices=1 << 14, max_triangles=1 << 14,
                      max_instances=8, bin_capacity=1024, big_capacity=16,
                      shadow_res=512, shadow_bin_capacity=256)
    ctx = RenderContext(cfg)
    pack = PackReader("/root/reference/bin/teapot.pack")
    m = pack.mesh(0)
    teapot = ctx.add_mesh(m["vertices"], m["indices"],
                          mincorner=m["mincorner"], maxcorner=m["maxcorner"])
    pv, pi = primitives.plane(12.0, 6.0)
    floor = ctx.add_mesh(pv, pi)
    mat = ctx.add_material(color=(0.7, 0.2, 0.15, 1), metalness=0.2, roughness=0.35)
    fmat = ctx.add_material(color=(0.6, 0.6, 0.62, 1), roughness=0.8)

    centre = 0.5 * (m["mincorner"] + m["maxcorner"])
    size = float(np.linalg.norm(m["maxcorner"] - m["mincorner"]))
    cam = Camera()
    cam.set_projection(np.radians(60), args.width / args.height)
    cam.lookat(centre + np.array([0.6 * size, 0.5 * size, size], np.float32),
               centre, np.array([0.0, 1.0, 0.0]))
    params = __import__("datum_tpu.render", fromlist=["RenderParams"]).RenderParams(
        width=args.width, height=args.height)
    params.sundirection = np.array([-0.5, -0.8, -0.3], np.float32)
    params.sundirection /= np.linalg.norm(params.sundirection)
    params.sunintensity = np.array([4.0, 3.9, 3.6], np.float32)
    params.ambientintensity = 0.35
    return dict(ctx=ctx, teapot=teapot, floor=floor, mat=mat, fmat=fmat,
                cam=cam, params=params, t=0.0,
                floor_y=float(m["mincorner"][1]))


def update(state, dt):
    state["t"] += dt


def render(state):
    from datum_tpu.math import Transform
    from datum_tpu.render import RenderList

    rl = RenderList()
    rl.push_mesh(state["floor"], Transform.translation([0, state["floor_y"], 0]),
                 state["fmat"])
    rl.push_mesh(state["teapot"], Transform.rotation([0, 1, 0], 0.5 * state["t"]),
                 state["mat"])
    return state["ctx"].render(state["cam"], rl, state["params"])


if __name__ == "__main__":
    run_example("teapot", init, update, render)
