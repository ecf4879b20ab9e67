"""Local environment probe boxes with box-projected parallax."""

import numpy as np
import pytest
import jax.numpy as jnp


def test_ray_box_exit():
    from datum_tpu.ops.envprobe import ray_box_exit

    o = jnp.array([[0.0, 0, 0], [0, 0, 0], [5.0, 0, 0]])
    d = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [1.0, 0, 0]])
    t_in, t_out = ray_box_exit(o, d, jnp.array([2.0, 3.0, 4.0]))
    np.testing.assert_allclose(t_out, [2.0, 3.0, -3.0], atol=1e-5)
    assert t_in[0] < 0                      # inside the box
    assert t_out[2] < max(t_in[2], 0.0)     # box behind ray: no hit


@pytest.mark.slow
def test_probe_overrides_global_env():
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
    from datum_tpu.render import primitives
    from datum_tpu.render.envmap import EnvMap
    from datum_tpu.math import Transform

    cfg = FrameConfig(width=256, height=128, max_vertices=1024,
                      max_triangles=1024, max_instances=4, bin_capacity=64,
                      big_capacity=8, enable_shadows=False)
    ctx = RenderContext(cfg)
    pv, pi = primitives.plane(16.0)
    floor = ctx.add_mesh(pv, pi)
    mirror = ctx.add_material(color=(1, 1, 1, 1), metalness=1.0,
                              roughness=0.05, reflectivity=1.0)

    # dim grey global sky, bright red local box around the floor centre
    grey = np.full((6, 32, 32, 3), 0.05, np.float32)
    ctx.set_skybox(EnvMap.from_cubemap(jnp.asarray(grey), 4, samples=8))
    red = np.zeros((6, 32, 32, 3), np.float32)
    red[..., 0] = 6.0
    ctx.add_environment([0.0, 0.0, 0.0], [4.0, 4.0, 4.0], red, levels=4)

    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 3.0, 7.0]), np.array([0.0, 0.0, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=256, height=128)
    params.sunintensity = np.zeros(3, np.float32)
    params.ambientintensity = 1.0
    params.specularintensity = 1.0

    rl = RenderList()
    rl.push_mesh(floor, Transform.identity(), mirror)
    img = ctx.render(cam, rl, params).astype(np.float32)

    # centre of floor is inside the box -> red reflection;
    # far floor (outside box) reflects the grey sky
    inside = img[70:95, 110:146]
    outside = img[52:58, 20:50]
    assert inside[..., 0].mean() > inside[..., 1].mean() * 2, \
        f"no red probe reflection: {inside.mean(axis=(0, 1))}"
    assert outside[..., 0].mean() < outside[..., 1].mean() + 12, \
        f"probe leaked outside its box: {outside.mean(axis=(0, 1))}"
