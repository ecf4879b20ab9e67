"""Deferred-shade megakernel vs the XLA lighting path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from datum_tpu.ops import brdf
from datum_tpu.ops.lighting_pass import shade_deferred, reconstruct_positions
from datum_tpu.ops.shade_pallas import shade_deferred_pallas

H, W = 64, 256


def _scene(n_point=3, n_spot=2, probes=False):
    rng = np.random.RandomState(7)
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = 1.2
    proj[1, 1] = -2.1
    proj[2, 3] = 0.1          # reverse-Z infinite
    proj[3, 2] = -1.0
    invview = np.eye(4, dtype=np.float32)
    invview[:3, 3] = [0.0, 2.0, 5.0]

    npl, nsl = 8, 4
    pl_pos = np.zeros((npl, 3), np.float32)
    pl_int = np.zeros((npl, 3), np.float32)
    pl_att = np.zeros((npl, 4), np.float32)
    pl_pos[:n_point] = rng.uniform(-3, 3, (n_point, 3)) + [0, 2, 0]
    pl_int[:n_point] = rng.uniform(1, 4, (n_point, 3))
    pl_att[:n_point] = [0.2, 0.1, 1.0, 8.0]
    sl_pos = np.zeros((nsl, 3), np.float32)
    sl_int = np.zeros((nsl, 3), np.float32)
    sl_att = np.zeros((nsl, 4), np.float32)
    sl_dir = np.tile(np.float32([0, -1, 0]), (nsl, 1))
    sl_cut = np.full(nsl, 0.5, np.float32)
    sl_view = np.tile(np.eye(4, dtype=np.float32), (nsl, 1, 1))
    sl_pos[:n_spot] = rng.uniform(-2, 2, (n_spot, 3)) + [0, 3, 0]
    sl_int[:n_spot] = rng.uniform(1, 3, (n_spot, 3))
    sl_att[:n_spot] = [0.1, 0.1, 1.0, 10.0]

    n_probe = 4
    pr_pos = np.zeros((n_probe, 4), np.float32)
    pr_sh = np.zeros((n_probe, 9, 3), np.float32)
    pr_count = 0
    if probes:
        pr_count = 2
        pr_pos[:2] = [[0, 1, -3, 4.0], [2, 1, -4, 3.0]]
        pr_sh[:2] = rng.uniform(0, 0.4, (2, 9, 3))

    ss = dict(
        proj=jnp.asarray(proj), view=jnp.asarray(np.linalg.inv(invview)),
        invview=jnp.asarray(invview),
        camera=dict(exposure=jnp.float32(1.1),
                    ambientintensity=jnp.float32(0.6),
                    specularintensity=jnp.float32(0.9)),
        mainlight=dict(direction=jnp.asarray(np.float32([0.3, -0.8, -0.5])
                                             / np.linalg.norm([0.3, -0.8, -0.5])),
                       intensity=jnp.asarray(np.float32([4.0, 3.8, 3.5])),
                       cutoff=jnp.float32(0.9),
                       splits=jnp.asarray(np.float32([5, 10, 20, 40])),
                       shadowview=jnp.asarray(np.tile(
                           np.eye(4, dtype=np.float32), (4, 1, 1)))),
        pointlights=dict(position=jnp.asarray(pl_pos),
                         intensity=jnp.asarray(pl_int),
                         attenuation=jnp.asarray(pl_att),
                         count=jnp.int32(n_point)),
        spotlights=dict(position=jnp.asarray(sl_pos),
                        intensity=jnp.asarray(sl_int),
                        attenuation=jnp.asarray(sl_att),
                        direction=jnp.asarray(sl_dir),
                        cutoff=jnp.asarray(sl_cut),
                        shadowview=jnp.asarray(sl_view),
                        count=jnp.int32(n_spot)),
        probes=dict(position=jnp.asarray(pr_pos), sh=jnp.asarray(pr_sh),
                    count=jnp.int32(pr_count)),
    )
    return ss


def _gplanes():
    rng = np.random.RandomState(3)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    depth = 0.02 + 0.01 * np.sin(xx * 0.05) * np.cos(yy * 0.07)
    maskf = (((xx // 32) + (yy // 16)) % 3 != 0).astype(np.float32)
    visf = np.where(maskf > 0, 1.0, -1.0)
    nz = np.ones((H, W), np.float32)
    nx = 0.3 * np.sin(xx * 0.1)
    ny = 0.3 * np.cos(yy * 0.1)
    nn = np.sqrt(nx * nx + ny * ny + nz * nz)
    g = dict(
        depth=depth * maskf, visf=visf,
        nx=nx / nn, ny=ny / nn, nz=nz / nn,
        dr=0.4 + 0.2 * np.sin(xx * 0.02), dg=np.full((H, W), 0.5),
        db=0.4 + 0.2 * np.cos(yy * 0.03),
        em=np.full((H, W), 0.05),
        sr=0.1 + 0.5 * np.sin(xx * 0.013) ** 2,
        sg=np.full((H, W), 0.2), sb=np.full((H, W), 0.3),
        rgh=0.25 + 0.5 * (yy / H),
        esr=rng.uniform(0.1, 0.6, (H, W)),
        esg=rng.uniform(0.1, 0.6, (H, W)),
        esb=rng.uniform(0.1, 0.6, (H, W)),
        eb0=np.full((H, W), 0.7), eb1=np.full((H, W), 0.1),
        eb2=np.full((H, W), 0.9),
        sf=rng.uniform(0.3, 1.0, (H, W)),
    )
    return {k: jnp.asarray(np.asarray(v, np.float32)) for k, v in g.items()}


def _gbuffer(g):
    return dict(
        diffuse=jnp.stack([g["dr"], g["dg"], g["db"], g["em"]], -1),
        specular=jnp.stack([g["sr"], g["sg"], g["sb"], g["rgh"]], -1),
        normal=jnp.concatenate(
            [jnp.stack([g["nx"], g["ny"], g["nz"]], -1) * 0.5 + 0.5,
             jnp.zeros((H, W, 1), jnp.float32)], -1),
        mask=g["visf"] >= 0,
    )


@pytest.mark.parametrize("probes", [False, True])
def test_megakernel_matches_xla_path(probes):
    ss = _scene(probes=probes)
    g = _gplanes()
    sh9 = np.zeros((9, 3), np.float32)
    sh9[0] = [0.8, 0.9, 1.0]
    sh9[2] = [0.2, 0.2, 0.3]
    ss2 = dict(ss)
    ss2["_sh"] = jnp.asarray(sh9)

    hdr_k = shade_deferred_pallas(g, ss2, proj=ss["proj"],
                                  invview=ss["invview"], interpret=True)

    # XLA reference with identical inputs
    gb = _gbuffer(g)
    env_spec = jnp.stack([g["esr"], g["esg"], g["esb"]], -1)
    eb = jnp.stack([g["eb0"], g["eb1"], g["eb2"]], -1)
    gbn = jnp.stack([g["nx"], g["ny"], g["nz"]], -1)
    _, wpos = reconstruct_positions(g["depth"], ss["proj"], ss["invview"],
                                    W, H)
    eye = brdf.normalize(ss["invview"][:3, 3] - wpos)
    ddir = brdf.normalize(brdf.diffuse_dominant_direction(
        gbn, eye, g["rgh"]))
    env_dif = brdf.probe_irradiance(ss2["_sh"], ddir) / brdf.PI
    hdr_x = shade_deferred(gb, g["depth"], ss, proj=ss["proj"],
                           invview=ss["invview"], shadowfactor=g["sf"],
                           env_specular=env_spec, env_diffuse=env_dif,
                           envbrdf=eb)

    a = np.asarray(hdr_k)
    b = np.asarray(hdr_x)
    assert np.isfinite(a).all()
    d = np.abs(a - b)
    scale = max(float(np.abs(b).max()), 1e-6)
    # the only expected divergence: the sun's bent-lightvec select flips
    # on numerically-borderline pixels — exclude the top 0.01% outliers
    q = np.quantile(d, 0.9999)
    assert q / scale < 0.01, f"q99.99 rel err {q / scale}"
    assert d.mean() / scale < 1e-3, f"mean rel err {d.mean() / scale}"


def test_megakernel_spot_shadow_planes():
    """Shadowed spot slots consume per-slot factor planes."""
    ss = _scene(n_point=0, n_spot=2)
    ss["camera"] = dict(ss["camera"], ambientintensity=jnp.float32(0.0))
    ml = dict(ss["mainlight"])
    ml["intensity"] = ml["intensity"] * 0.0
    ss["mainlight"] = ml
    g = _gplanes()
    ss2 = dict(ss)
    ss2["_sh"] = jnp.zeros((9, 3), jnp.float32)

    ones = jnp.ones((1, H, W), jnp.float32)
    zeros = jnp.zeros((1, H, W), jnp.float32)
    lit = shade_deferred_pallas(g, ss2, proj=ss["proj"],
                                invview=ss["invview"], spotsf=ones,
                                interpret=True)
    dark = shade_deferred_pallas(g, ss2, proj=ss["proj"],
                                 invview=ss["invview"], spotsf=zeros,
                                 interpret=True)
    # the zero factor must remove the first spot's contribution
    assert float(jnp.abs(lit - dark).max()) > 1e-4
    nosf = shade_deferred_pallas(g, ss2, proj=ss["proj"],
                                 invview=ss["invview"], interpret=True)
    np.testing.assert_allclose(np.asarray(lit), np.asarray(nosf),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_frame_with_megakernel_matches_xla_frame():
    """End-to-end: the megakernel frame vs the XLA-lighting frame on the
    flagship scene (interpret mode, CPU)."""
    from datum_tpu.scenes import datumtest_scene
    from datum_tpu.render import frame as frame_mod
    from datum_tpu.render.types import make_sceneset

    imgs = {}
    for use_k in (True, False):
        ctx, camera, params, make_rl = datumtest_scene(
            width=256, height=128, sphere_detail=8, n_point_lights=4,
            max_vertices=4096, max_triangles=4096, bin_capacity=64,
            big_capacity=16, use_pallas=True,
            enable_material_maps=True, texture_filter="mip_half",
            use_shade_kernel=use_k, pallas_interpret=True)
        rl = make_rl(0.0)
        ss = make_sceneset(camera, params, point_lights=rl.point_lights,
                           spot_lights=rl.spot_lights)
        draws = rl.draw_arrays(ctx.config.max_instances,
                               ctx.default_material)
        ctx.expand_host(draws)
        out = frame_mod.render_frame(ctx.config, ctx.device_state(),
                                     draws, ss)
        imgs[use_k] = np.asarray(out["image"]).astype(np.float32) / 255.0

    rmse = float(np.sqrt(np.mean((imgs[True] - imgs[False]) ** 2)))
    assert rmse < 0.02, f"megakernel vs XLA frame RMSE {rmse}"


@pytest.mark.slow
def test_lit_translucent_layer_and_water_absorb():
    """The megakernel path shades the nearest translucent layer with the
    full BRDF and applies depth-aware transmission for absorbing
    (water-like) materials."""
    from datum_tpu.ops.common import FrameConfig
    from datum_tpu.render import (Camera, RenderContext, RenderList,
                                  RenderParams, primitives)
    from datum_tpu.math import Transform

    imgs = {}
    if True:
        for lit in (True, False):
            cfg = FrameConfig(width=256, height=128, max_vertices=8192,
                              max_triangles=8192, max_instances=8,
                              bin_capacity=128, big_capacity=16,
                              enable_shadows=False,
                              enable_material_maps=True,
                              texture_filter="mip_half", use_pallas=True,
                              max_translucent_draws=4,
                              translucent_lit=lit, pallas_interpret=True)
            ctx = RenderContext(cfg)
            pv, pi = primitives.plane(20.0, 4.0)
            floor = ctx.add_mesh(pv, pi)
            sv, si = primitives.unit_sphere(12, 6)
            sphere = ctx.add_mesh(sv, si)
            red = ctx.add_material(color=(0.8, 0.1, 0.1, 1), roughness=0.7)
            water = ctx.add_material(color=(0.2, 0.5, 0.7, 0.15),
                                     roughness=0.1, reflectivity=0.8,
                                     absorb=0.5)
            cam = Camera()
            cam.set_projection(np.radians(60), 2.0)
            cam.lookat(np.array([0.0, 3.5, 8.0]), np.array([0.0, 0.5, 0.0]),
                       np.array([0.0, 1.0, 0.0]))
            params = RenderParams(width=256, height=128)
            params.sunintensity = np.array([4.0, 4.0, 3.8], np.float32)
            rl = RenderList()
            rl.push_mesh(floor, Transform.identity(), red)
            rl.push_translucent(sphere,
                                Transform.translation([0.0, 1.2, 2.0]),
                                water)
            draws = rl.draw_arrays(cfg.max_instances, ctx.default_material)
            ctx.expand_host(draws)
            draws["translucent"] = rl.translucent_arrays(
                cfg.max_translucent_draws, ctx.default_material)
            from datum_tpu.render import frame as frame_mod
            from datum_tpu.render.types import make_sceneset
            ss = make_sceneset(cam, params)
            out = frame_mod.render_frame(cfg, ctx.device_state(), draws, ss)
            imgs[lit] = np.asarray(out["image"]).astype(np.float32)

    a, b = imgs[True], imgs[False]
    assert np.isfinite(a).all()
    # the translucent sphere region must be shaded differently by the
    # lit layer (specular/sun variation vs flat unlit tint)
    diff = np.abs(a - b).mean(-1)
    assert (diff > 8).mean() > 0.005, f"lit layer changed {(diff>8).mean()}"
    # the sphere must not vanish in either mode
    assert a[40:90, 100:160].std() > 4
