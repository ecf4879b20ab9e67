"""example-ocean: FFT water surface (reference: examples/ocean)."""

import numpy as np

from common import run_example


def init(args):
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import Camera, RenderContext, RenderParams
    from datum_tpu.render.ocean import Ocean, OceanParams

    cfg = FrameConfig(width=args.width, height=args.height,
                      max_vertices=1 << 14, max_triangles=1 << 15,
                      max_instances=4, big_capacity=64,
                      enable_shadows=False, max_dynamic_vertices=1 << 14,
                      enable_bloom=True)
    ctx = RenderContext(cfg)
    ocean = Ocean(ctx, grid=96, patch_size=64.0,
                  params=OceanParams(wind=(9.0, 3.0), choppiness=1.6,
                                     swellamplitude=0.4))
    water = ctx.add_material(color=(0.07, 0.22, 0.36, 1), metalness=0.0,
                             roughness=0.1, reflectivity=0.9)
    cam = Camera()
    cam.set_projection(np.radians(60), args.width / args.height)
    cam.lookat(np.array([32.0, 16.0, 78.0]), np.array([32.0, 0.0, 32.0]),
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=args.width, height=args.height)
    params.sundirection = np.array([-0.4, -0.5, -0.75], np.float32)
    params.sundirection /= np.linalg.norm(params.sundirection)
    params.sunintensity = np.array([5.0, 4.7, 4.2], np.float32)
    params.ambientintensity = 0.5
    return dict(ctx=ctx, ocean=ocean, water=water, cam=cam, params=params)


def update(state, dt):
    state["ocean"].update(dt)


def render(state):
    from datum_tpu.math import Transform
    from datum_tpu.render import RenderList
    from datum_tpu.render.ocean import render_ocean_surface

    rl = RenderList()
    render_ocean_surface(state["ocean"], rl, Transform.identity(), state["water"])
    return state["ctx"].render(state["cam"], rl, state["params"])


if __name__ == "__main__":
    run_example("ocean", init, update, render)
