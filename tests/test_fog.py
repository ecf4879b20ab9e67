"""Volumetric fog: accumulation physics + frame integration."""

import numpy as np
import jax.numpy as jnp

from datum_tpu.ops import fog as fog_ops


def _sceneset(density):
    return dict(
        camera=dict(fogdensity=np.array([0.5, 0.6, 0.7, density], np.float32)),
        mainlight=dict(direction=np.array([0, -1, 0], np.float32),
                       intensity=np.array([1.0, 1, 1], np.float32),
                       splits=np.ones(4, np.float32),
                       shadowview=np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))),
    )


def test_transmittance_decreases_with_depth():
    from datum_tpu.math.matrix import perspective_proj

    proj = jnp.asarray(perspective_proj(np.radians(60), 16 / 9, 0.1))
    invview = jnp.eye(4)
    vol = np.asarray(fog_ops.build_fog_volume(
        _sceneset(0.2), proj=proj, invview=invview, fog_w=20, fog_h=12, fog_d=16))
    t = vol[..., 3]
    assert np.all(np.diff(t, axis=0) <= 1e-6)      # monotonic along z
    assert t[0].mean() > 0.9
    assert t[-1].mean() < t[0].mean()
    # in-scatter grows with depth
    assert vol[-1, ..., :3].mean() > vol[0, ..., :3].mean()


def test_zero_density_is_identity():
    from datum_tpu.math.matrix import perspective_proj

    proj = jnp.asarray(perspective_proj(np.radians(60), 16 / 9, 0.1))
    vol = fog_ops.build_fog_volume(_sceneset(0.0), proj=proj, invview=jnp.eye(4),
                                   fog_w=8, fog_h=8, fog_d=8)
    hdr = jnp.ones((64, 128, 3)) * 0.5
    depth = jnp.full((64, 128), 0.01)
    out = np.asarray(fog_ops.apply_fog(hdr, depth, vol, proj))
    np.testing.assert_allclose(out, 0.5, atol=1e-4)


def test_fog_in_frame_fades_distance():
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
    from datum_tpu.render import primitives
    from datum_tpu.math import Transform

    cfg = FrameConfig(width=256, height=128, max_vertices=1024, max_triangles=1024,
                      max_instances=4, bin_capacity=64, big_capacity=8,
                      enable_shadows=False, enable_fog=True, fog_depth_range=30.0)
    ctx = RenderContext(cfg)
    pv, pi = primitives.plane(40.0, 10.0)
    floor = ctx.add_mesh(pv, pi)
    mat = ctx.add_material(color=(0.1, 0.1, 0.1, 1))
    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 2.0, 18.0]), np.array([0.0, 0.0, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=256, height=128)
    params.fogdensity = np.array([0.6, 0.65, 0.7, 0.25], np.float32)
    params.sunintensity = np.array([2.0, 2.0, 2.0], np.float32)
    rl = RenderList()
    rl.push_mesh(floor, Transform.identity(), mat)
    img = ctx.render(cam, rl, params).astype(np.float32)
    near = img[120:127, 100:156].mean()
    far = img[70:76, 100:156].mean()
    assert far > near + 3, f"distant fog not brighter: near={near:.1f} far={far:.1f}"


def test_fogplane_fades_with_distance():
    import numpy as np

    from datum_tpu.math import Transform
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import Camera, RenderContext, RenderList, RenderParams
    from datum_tpu.render import primitives

    cfg = FrameConfig(width=256, height=128, max_vertices=1024,
                      max_triangles=1024, max_instances=4, bin_capacity=64,
                      big_capacity=8, enable_shadows=False, max_fog_planes=2)
    ctx = RenderContext(cfg)
    pv, pi = primitives.plane(60.0)
    floor = ctx.add_mesh(pv, pi)
    mat = ctx.add_material(color=(0.2, 0.6, 0.2, 1))
    cam = Camera()
    cam.set_projection(np.radians(60), 2.0)
    cam.lookat(np.array([0.0, 4.0, 28.0]), np.array([0.0, 0.0, 0.0]),
               np.array([0.0, 1.0, 0.0]))
    params = RenderParams(width=256, height=128)
    params.ambientintensity = 1.0

    rl = RenderList()
    rl.push_mesh(floor, Transform.identity(), mat)
    base = ctx.render(cam, rl, params).astype(np.float32)

    rl = RenderList()
    rl.push_mesh(floor, Transform.identity(), mat)
    rl.push_fogplane(color=(0.7, 0.72, 0.8, 1.0), plane=(0, 1, 0, -3.0),
                     density=0.08, startdistance=2.0, falloff=2.0)
    img = ctx.render(cam, rl, params).astype(np.float32)

    near = slice(110, 126), slice(112, 144)     # floor close to camera
    far = slice(66, 74), slice(112, 144)        # floor near horizon
    d_near = np.abs(img[near] - base[near]).mean()
    d_far = np.abs(img[far] - base[far]).mean()
    assert d_far > d_near + 5, f"fogplane near {d_near} far {d_far}"
    # fog is grey-blue: blue channel rises in the distance
    assert img[far][..., 2].mean() > base[far][..., 2].mean() + 10


def test_fog_shadow_coarse_uses_coarse_cascade_matrix():
    """shadow_coarse=True taps ONLY the coarsest cascade: the projection
    matrices must shrink along with the map stack.  Regression for the
    round-4 advisor finding: with DISTINCT per-cascade matrices, passing
    the full shadowview while slicing esm to [-1:] projected froxels
    with the FINEST frustum (most fall outside -> lit=1) while gathering
    the coarsest map's texels."""
    from datum_tpu.math.matrix import perspective_proj

    proj = jnp.asarray(perspective_proj(np.radians(60), 16 / 9, 0.1))
    res = 32

    # fine cascade covers only |x|,|y| < 0.5 world units; coarse covers
    # the whole 30-unit fog frustum.  Fine map fully LIT, coarse map
    # fully SHADOWED — any fine-matrix leakage shows up as light.
    fine = np.diag([2.0, 2.0, -2.0, 1.0]).astype(np.float32)
    coarse = np.diag([1 / 40, 1 / 40, -1 / 40, 1.0]).astype(np.float32)
    shadowview = np.stack([fine, coarse])
    esm = np.stack([np.full((res, res), np.exp(20.0), np.float32),
                    np.zeros((res, res), np.float32)])
    zmax = np.ones(2, np.float32)
    zscale = np.ones(2, np.float32)

    ss = _sceneset(0.4)
    ss["mainlight"]["splits"] = np.array([5.0, 60.0], np.float32)
    ss["mainlight"]["shadowview"] = shadowview

    kw = dict(proj=proj, invview=jnp.eye(4), fog_w=16, fog_h=8, fog_d=8,
              ambient=0.0)
    vol = np.asarray(fog_ops.build_fog_volume(
        ss, shadow=(esm, zmax, zscale), shadow_coarse=True, **kw))

    # reference: the same computation with a hand-sliced 1-cascade stack
    ss1 = _sceneset(0.4)
    ss1["mainlight"]["splits"] = np.array([60.0], np.float32)
    ss1["mainlight"]["shadowview"] = shadowview[-1:]
    vol_ref = np.asarray(fog_ops.build_fog_volume(
        ss1, shadow=(esm[-1:], zmax[-1:], zscale[-1:]),
        shadow_coarse=False, **kw))
    np.testing.assert_allclose(vol, vol_ref, atol=1e-6)

    # and the coarse map's full shadowing must actually bite: in-scatter
    # stays near zero (ambient=0, sun fully occluded)
    vol_lit = np.asarray(fog_ops.build_fog_volume(ss, shadow=None, **kw))
    assert vol[..., :3].max() < 1e-3 * max(vol_lit[..., :3].max(), 1e-6), \
        (vol[..., :3].max(), vol_lit[..., :3].max())


def test_directional_fogattenuation_density():
    """camera.fogattenuation drives the reference's directional density
    falloff: density = fogdensity.a * exp(-max(dot(att, worldpos), 0))
    (reference: fog.density.comp:116).  With att = (0, k, 0) the fog
    thins with altitude; flipping the camera below y=0 must show MORE
    fog than above it."""
    from datum_tpu.math.matrix import perspective_proj

    proj = jnp.asarray(perspective_proj(np.radians(60), 16 / 9, 0.1))

    def vol_at(cam_y, att):
        ss = _sceneset(0.4)
        ss["camera"]["fogattenuation"] = np.asarray(att, np.float32)
        invview = jnp.eye(4).at[1, 3].set(cam_y)
        return np.asarray(fog_ops.build_fog_volume(
            ss, proj=proj, invview=invview, fog_w=16, fog_h=8, fog_d=12))

    att = (0.0, 0.6, 0.0)
    t_high = vol_at(6.0, att)[..., 3]
    t_low = vol_at(-6.0, att)[..., 3]
    # below base height the dot clamps to 0 -> full density everywhere;
    # high camera sees exponentially thinner fog
    assert t_low[-1].mean() < t_high[-1].mean(), (t_low[-1].mean(),
                                                  t_high[-1].mean())

    # numpy cross-check of the density law on one froxel column: the
    # column's view ray has its own y slope (row 4 of 8 is 0.125 NDC
    # above center), so worldpos y = cam_y + ry * dist
    k = 0.6
    ds = np.asarray(fog_ops.froxel_depths(12))
    inv11 = 1.0 / float(np.asarray(proj)[1, 1])
    ry = inv11 * ((4 + 0.5) / 8 * 2.0 - 1.0)
    ys = 6.0 + ry * ds
    sigma = 0.4 * np.exp(-np.maximum(k * ys, 0.0))
    dz = np.diff(np.concatenate([[0.0], ds]))
    expect_t = np.exp(-np.cumsum(sigma * dz))
    got_t = t_high[:, 4, 8]
    np.testing.assert_allclose(got_t, expect_t, rtol=5e-2)
