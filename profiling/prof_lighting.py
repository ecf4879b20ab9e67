"""Per-component timing of the deferred lighting pass on TPU.

Chain methodology: N dependent evaluations, one readback, minus the
same-chain cost of an empty body — removes the ~22 ms tunnel fence.
"""
import time, numpy as np, jax, jax.numpy as jnp

def chain_time(fn, *args, n=8, name=""):
    # perturb one input leaf per step by a numerically-nil amount so the
    # tunnel can't memoize, and keep a scalar data dependency across steps
    def run(eps):
        s = jnp.float32(0.0)
        for i in range(n):
            out = fn(*args, eps * (i + 1) + s * 1e-20)
            s = out.ravel()[0].astype(jnp.float32)
        return s
    jrun = jax.jit(run)
    float(jrun(jnp.float32(1e-12)))
    ts = []
    for r in range(3):
        t0 = time.perf_counter()
        float(jrun(jnp.float32(1e-12 * (r + 2))))
        ts.append(time.perf_counter() - t0)
    dt = np.median(ts)
    print(f"{name:40s} {dt * 1000 / n:8.2f} ms/it  ({dt*1000:.1f} total)", flush=True)
    return dt / n

from datum_tpu.scenes import datumtest_scene
from datum_tpu.render.types import make_sceneset
from datum_tpu.render.frame import expand_draws
from datum_tpu.ops.geometry import transform_vertices_rigid
from datum_tpu.ops import raster as R, brdf
from datum_tpu.ops.raster_pallas import raster_shade_pallas
from datum_tpu.ops.shade import gbuffer_from_planes
from datum_tpu.ops.shadow import render_shadow_cascades, build_esm, shadow_factor_esm_fast
from datum_tpu.ops.lighting_pass import reconstruct_positions, shade_deferred, _inv_proj
from datum_tpu.ops.sampling import sample_cubemap, sample_cubemap_lod_flat

ctx, camera, params, make_rl = datumtest_scene(
    width=1920, height=1088, sphere_detail=24, n_point_lights=8,
    max_vertices=1 << 15, max_triangles=1 << 15,
    bin_capacity=160, big_capacity=64, bin_max_span=8, use_pallas=True,
    enable_material_maps=False, texture_filter="nearest_half",
    shadow_factor_scale=4)
cfg = ctx.config
device = jax.device_put(ctx.device_state())
rl = make_rl(0.0)
ss = jax.device_put(make_sceneset(camera, params, point_lights=rl.point_lights))
draws = jax.device_put(rl.draw_arrays(cfg.max_instances, ctx.default_material))
geom = device["geometry"]
w, h, tx, ty = cfg.padded_width, cfg.padded_height, cfg.tiles_x, cfg.tiles_y

@jax.jit
def pre(d, ss):
    ex = expand_draws(geom, d["mesh"], d["count"], cfg.max_vertices, cfg.max_triangles)
    p = geom["positions"][ex["src_v"]]
    vp = (ss["proj"] @ ss["view"]).astype(jnp.float32)
    clip, wn, wt, wp = transform_vertices_rigid(p, geom["normals"][ex["src_v"]], geom["tangents"][ex["src_v"]], ex["vtx_draw"], d["world"], vp)
    setup = R.triangle_setup(clip, ex["tris"], w, h, tx, ty, cull=-1, max_span=cfg.bin_max_span)
    bins, counts, big = R.bin_triangles(setup, cfg.max_triangles, tx, ty, cfg.bin_capacity, cfg.big_capacity, max_span=cfg.bin_max_span)
    uv = geom["texcoords"][ex["src_v"]]
    tm = d["material"][ex["tri_draw"]]
    planes = raster_shade_pallas(setup, bins, big, counts, ex["tris"], uv, wn, tm, device["materials"], tx, ty, w, h)
    gb = gbuffer_from_planes(planes, device["textures"], texture_filter=cfg.texture_filter)
    raw = render_shadow_cascades(wp, ex["tris"], ss["mainlight"]["shadowview"], res=cfg.shadow_res, bin_capacity=cfg.shadow_bin_capacity, big_capacity=cfg.big_capacity, use_pallas=True)
    esm = build_esm(raw, ss["mainlight"]["shadowview"])
    return planes, gb, esm

planes, gb, esm = jax.block_until_ready(pre(draws, ss))
depth = planes["depth"]
ibl = device.get("ibl")
if ibl is None:
    from datum_tpu.render.skybox import SkyBox
    sb = SkyBox(size=64, convolve_samples=16)
    ctx.set_skybox(sb)
    ibl = jax.device_put(ctx.device_state().get("ibl"))
ml = ss["mainlight"]

normal = gb["normal"][..., :3] * 2.0 - 1.0
viewpos, worldpos = jax.jit(lambda d: reconstruct_positions(d, ss["proj"], ss["invview"], w, h))(depth)
campos = ss["invview"][:3, 3]
eyevec = jax.jit(lambda wp: brdf.normalize(campos - wp))(worldpos)
rough = gb["specular"][..., 3]

def f_recon(d, eps):
    vp_, wp_ = reconstruct_positions(d + eps, ss["proj"], ss["invview"], w, h)
    return wp_
chain_time(f_recon, depth, name="reconstruct_positions")

def f_spec_flat(n, eps):
    nn = n + eps
    r = 2.0 * jnp.sum(nn * eyevec, -1, keepdims=True) * nn - eyevec
    sdir = brdf.specular_dominant_direction(nn, r, rough)
    lod = rough * (len(ibl["mips"]) - 1)
    return sample_cubemap_lod_flat(ibl["flat"], sdir, lod)[..., :3]
chain_time(f_spec_flat, normal, name="IBL specular flat (8 gathers/px)")

def f_diff(n, eps):
    nn = n + eps
    ddir = brdf.diffuse_dominant_direction(nn, eyevec, rough)
    return sample_cubemap(ibl["mips"][-1], ddir)[..., :3]
chain_time(f_diff, normal, name="IBL diffuse (one mip bilinear)")

def f_envbrdf(n, eps):
    lut = ibl["envbrdf"]; s = lut.shape[0]
    ndv = jnp.clip(jnp.sum((n + eps) * eyevec, -1), 0.0, 1.0)
    bi = jnp.clip((rough * s).astype(jnp.int32), 0, s - 1)
    bj = jnp.clip((ndv * s).astype(jnp.int32), 0, s - 1)
    return lut[bi, bj]
chain_time(f_envbrdf, normal, name="envbrdf LUT gather")

def f_esm(wp, eps):
    p = 4
    def pool(x):
        sh = x.shape
        return x.reshape(sh[0] // p, p, sh[1] // p, p, *sh[2:]).mean((1, 3))
    e, zm, zs = esm
    sf_h = shadow_factor_esm_fast(pool(wp + eps), e, zm, zs, ml["splits"], ml["shadowview"], pool(-viewpos[..., 2]), normal=pool(normal))
    from datum_tpu.ops.blur import resize_up_dense
    return resize_up_dense(sf_h, h, w)
chain_time(f_esm, worldpos, name="ESM factor (quarter res + upsample)")

material = dict(diffuse=gb["diffuse"][..., :3], specular=gb["specular"][..., :3],
                roughness=rough, alpha=rough ** 2, emissive=128.0 * gb["diffuse"][..., 3] ** 3)

def f_main(n, eps):
    d, s = brdf.main_light(n + eps, eyevec, material, ml["direction"], ml["intensity"], ml["cutoff"], jnp.ones((h, w), jnp.float32))
    return d + s
chain_time(f_main, normal, name="main light BRDF")

pl = ss["pointlights"]
def f_points(n, eps):
    nn = n + eps
    def body(i, accum):
        dif, spec = accum
        d_i, s_i = brdf.point_light(worldpos, nn, eyevec, material, pl["position"][i], pl["intensity"][i], pl["attenuation"][i])
        on = (i < pl["count"]).astype(jnp.float32)
        return (dif + on * d_i, spec + on * s_i)
    dif, spec = jax.lax.fori_loop(0, jnp.minimum(pl["count"], 512), body,
                                  (jnp.zeros((h, w, 3)), jnp.zeros((h, w, 3))))
    return dif + spec
chain_time(f_points, normal, name="8 point lights dense loop")

def f_full(n, eps):
    gb2 = dict(gb); gb2["normal"] = gb["normal"] + eps
    return shade_deferred(gb2, depth, ss, proj=ss["proj"], invview=ss["invview"], shadowmaps=esm, ibl=ibl, shadow_factor_scale=4)
chain_time(f_full, normal, name="shade_deferred FULL")
