"""Deferred-shade Pallas megakernel (lighting stage).

Folds the whole deferred lighting pass (reference: data/lighting.comp)
into ONE tile-resident TPU kernel: per 32-row band it reconstructs
world positions from depth, applies IBL (SH-9 diffuse evaluated
in-kernel + precomputed specular/envBRDF fields), SH probe blending,
the ESM-shadowed sun, and the point/spot light loops — with every
accumulator resident in VMEM.

Why: the XLA formulation streams the two full-res RGB accumulators
through HBM on every light-loop trip (~2.9 ms for 8 lights at 1080p on
v5e, trace while.27) and splinters into ~20 separate full-res fusions
(~3.5 ms); here the whole thing is one pass over the framebuffer.

Layout contract: every image input is a 2-D (H, W) f32 plane —
channel-last arrays would put 3 channels on the 128-lane axis.  Vec3
values are (x, y, z) tuples of 2-D arrays.  Material assembly (mip
material taps, TBN) stays outside: it is cheap XLA element-wise work,
and lane-interleaving upsamples are impossible in Mosaic (pltpu.repeat
is tile-repeat, not element-repeat).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


SHADE_ROWS = 16     # rows per grid step: 24+ full-width plane blocks and
                    # the kernel's live temporaries must fit scoped VMEM
                    # (32-row bands overflowed the 16 MB limit at 1920w)

# ---- vec3 helpers over 2-D component planes -------------------------------


def dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def madd3(a, b, s):
    return (a[0] + b[0] * s, a[1] + b[1] * s, a[2] + b[2] * s)


def normalize3(a, eps=1e-12):
    inv = jax.lax.rsqrt(jnp.maximum(dot3(a, a), eps))
    return scale3(a, inv)


def sat(x):
    return jnp.clip(x, 0.0, 1.0)


def pow5(x):
    x2 = x * x
    return x2 * x2 * x


# ---- BRDF (component form, matches ops/brdf.py) ---------------------------


def _angles(nrm, eye, lv):
    hv = normalize3(add3(lv, eye))
    ndv = jnp.maximum(dot3(nrm, eye), 0.0)
    ndl = jnp.maximum(dot3(nrm, lv), 0.0)
    ndh = jnp.maximum(dot3(nrm, hv), 0.0)
    ldh = sat(dot3(lv, hv))
    return ndv, ndl, ndh, ldh


def _disney(ndv, ndl, ldh, alpha):
    bias = 0.5 * alpha
    factor = 1.0 + alpha * (1.0 / 1.51 - 1.0)
    f90 = bias + 2.0 * ldh * ldh * alpha
    ls = 1.0 + (f90 - 1.0) * pow5(sat(1.0 - ndl))
    vs = 1.0 + (f90 - 1.0) * pow5(sat(1.0 - ndv))
    return ls * vs * factor


def _spec_ggx(spec, ndv, ndl, ldh, ndh, alpha):
    fc = pow5(sat(1.0 - ldh))
    f = tuple(s + (1.0 - s) * fc for s in spec)
    k = alpha * 0.5
    gv = ndv * (1 - k) + k
    gl = ndl * (1 - k) + k
    vis = 0.25 / (gv * gl + 1e-5)
    a2 = alpha * alpha
    d = (ndh * a2 - ndh) * ndh + 1.0
    dist = a2 / (d * d)
    return tuple(fi * (vis * dist) for fi in f)


INV_PI = 0.3183098861837907


def _eval_light(worldp, nrm, eye, spec, alpha, lp, li, la):
    """One point light: lp/li tuples of scalars, la (4,) attenuation."""
    tolight = (lp[0] - worldp[0], lp[1] - worldp[1], lp[2] - worldp[2])
    d2 = jnp.maximum(dot3(tolight, tolight), 1e-12)
    inv_d = jax.lax.rsqrt(d2)
    dist = d2 * inv_d
    lv = scale3(tolight, inv_d)
    ndv, ndl, ndh, ldh = _angles(nrm, eye, lv)
    fd = _disney(ndv, ndl, ldh, alpha) * INV_PI
    fr = _spec_ggx(spec, ndv, ndl, ldh, ndh, alpha)
    # guard: padded light rows are all-zero -> 1/0 * on(0) would be NaN
    att = 1.0 / jnp.maximum(la[2] + la[1] * dist + la[0] * d2, 1e-9)
    dr2 = d2 / jnp.maximum(la[3] * la[3], 1e-12)
    fall = sat(1.0 - dr2 * dr2)
    w = ndl * att * (fall * fall)
    dif = (w * fd * li[0], w * fd * li[1], w * fd * li[2])
    spc = tuple(w * INV_PI * fi * lj for fi, lj in zip(fr, li))
    return dif, spc, lv


# plane input order (all (H, W) f32)
PLANE_NAMES = ["depth", "visf", "nx", "ny", "nz", "dr", "dg", "db", "em",
               "sr", "sg", "sb", "rgh",
               "esr", "esg", "esb", "eb0", "eb1", "eb2", "sf"]
# optional epilogue planes (folds the sky composite, volumetric-fog
# apply and WBOIT resolve into the same pass — each is ~10 full-res XLA
# ops otherwise, and the frame is op-dispatch-bound)
SKY_NAMES = ["sky_r", "sky_g", "sky_b"]
# box env-probe diffuse override (reference: lighting.comp:187-207 —
# pixels inside an environment box take its cubemap's deep-mip diffuse
# instead of the global SH; specular override rides the esr/esg/esb
# fields assembled outside)
ENVD_NAMES = ["edr", "edg", "edb", "edm"]
TR_NAMES = ["tr_r", "tr_g", "tr_b", "tr_a"]     # lit translucent layer
# deeper depth-peeled lit layers (tr2 = 2nd nearest, ...): every peeled
# fragment gets the FULL deferred shade (reference: translucent.frag
# shades every translucent fragment via back-to-front subpasses)
MAX_TR_LAYERS = 4


def _trk_names(k):
    return [f"tr{k}_r", f"tr{k}_g", f"tr{k}_b", f"tr{k}_a"]
REFR_NAMES = ["tr_ox", "tr_oy"]                 # refraction offsets (px)
REFR_STEPS = (-8, -3, 0, 3, 8)                  # quantized shift ladder (x)
# vertical shifts roll within the 16-row band, so the ladder stays at
# <= SHADE_ROWS/4: a +-8 step wrapped half the band and fetched color
# from the opposite band edge on strongly tilted normals
REFR_STEPS_Y = (-4, -2, 0, 2, 4)
FOG_NAMES = ["fog_r", "fog_g", "fog_b", "fog_t"]
OIT_NAMES = ["oit_r", "oit_g", "oit_b", "oit_w", "oit_rev"]


def _shade_kernel(counts_ref, params_ref, lights_ref, spots_ref, probes_ref,
                  plane_refs, ao_ref, spotsf_refs, cluster_refs,
                  hr_ref, hg_ref, hb_ref,
                  *, W, H, point_chunk, with_ao, n_probes, names,
                  n_subtiles=0):
    i = pl.program_id(0)
    P = params_ref
    # planes arrive bf16 (except depth/visf — see F32_PLANES): halves
    # the scoped-vmem block budget + input DMA; all math runs f32
    g = dict(zip(names, [r[...].astype(jnp.float32)
                         for r in plane_refs]))

    rows = SHADE_ROWS
    yy = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1).astype(jnp.float32)
    # P[0, 26]: global row offset of this band (tile-sharded path); H is
    # the FULL image height so NDC stays global per shard
    yn = (P[0, 26] + i * rows + yy + 0.5) * (2.0 / H) - 1.0
    xn = (xx + 0.5) * (2.0 / W) - 1.0

    depth = g["depth"]
    mask = g["visf"] >= 0.0

    # world position from reverse-Z depth (matches
    # lighting_pass.reconstruct_positions incl. the background clamp)
    denom = depth + P[0, 2]
    denom = jnp.where(jnp.abs(denom) < 1e-7,
                      jnp.where(denom < 0, -1e-7, 1e-7), denom)
    dist = P[0, 3] / denom
    vx = P[0, 0] * xn * dist
    vy = P[0, 1] * yn * dist
    vz = -dist
    # invview rows at P[0, 4:16]
    worldp = (P[0, 4] * vx + P[0, 5] * vy + P[0, 6] * vz + P[0, 7],
              P[0, 8] * vx + P[0, 9] * vy + P[0, 10] * vz + P[0, 11],
              P[0, 12] * vx + P[0, 13] * vy + P[0, 14] * vz + P[0, 15])
    campos = (P[0, 7], P[0, 11], P[0, 15])
    eye = normalize3((campos[0] - worldp[0], campos[1] - worldp[1],
                      campos[2] - worldp[2]))

    nrm = normalize3((g["nx"], g["ny"], g["nz"]))
    diffuse_col = (g["dr"], g["dg"], g["db"])
    spec_col = (g["sr"], g["sg"], g["sb"])
    rough = g["rgh"]
    alpha = rough * rough
    env_spec = (g["esr"], g["esg"], g["esb"])
    eb0, eb1, eb2 = g["eb0"], g["eb1"], g["eb2"]

    # ---- ambient / IBL
    ambient = P[0, 23]
    if with_ao:
        ambient = ambient * ao_ref[...].astype(jnp.float32)
    ndv_s = dot3(nrm, eye)
    fdd = sat(((ndv_s * (1.02341 * rough - 1.51174))
               + (-0.511705 * rough + 0.755868)) * rough)
    ddir = normalize3(madd3(nrm, sub3(eye, nrm), fdd))
    # SH-9 irradiance (brdf.probe_irradiance weights), coeffs P[0, 27:54]
    x, y, z = ddir
    basis = (0.886227, 1.023326 * y, 1.023326 * z, 1.023326 * x,
             0.858086 * x * y, 0.858086 * y * z,
             0.247708 * (3 * z * z - 1.0), 0.858086 * z * x,
             0.429043 * (x * x - y * y))
    env_dif = []
    for c in range(3):
        acc = basis[0] * P[0, 27 + c]
        for k in range(1, 9):
            acc = acc + basis[k] * P[0, 27 + 3 * k + c]
        env_dif.append(jnp.maximum(acc, 0.0) * INV_PI)

    # box env-probe diffuse override (before SH-probe blending, matching
    # the XLA path's env_probe_lookup -> SH probe order)
    if "edm" in g:
        env_dif = [jnp.where(g["edm"] > 0.5, g["ed" + ch], e)
                   for ch, e in zip("rgb", env_dif)]

    # local SH irradiance probes blended by radial falloff (reference:
    # lighting.comp:210-221; matches lighting_pass's probe block, which
    # evaluates the basis at the surface normal).  Dynamic fori (most
    # frames have 0 probes) — a static unroll held 8 probes of live
    # temporaries and blew the scoped-VMEM stack
    if n_probes > 0:
        pnx, pny, pnz = nrm
        pbasis = (0.886227, 1.023326 * pny, 1.023326 * pnz, 1.023326 * pnx,
                  0.858086 * pnx * pny, 0.858086 * pny * pnz,
                  0.247708 * (3 * pnz * pnz - 1.0), 0.858086 * pnz * pnx,
                  0.429043 * (pnx * pnx - pny * pny))

        def probe_body(pi_, acc):
            pacc, total_w = acc
            dx = probes_ref[pi_, 0] - worldp[0]
            dy = probes_ref[pi_, 1] - worldp[1]
            dz = probes_ref[pi_, 2] - worldp[2]
            pd = jnp.sqrt(dx * dx + dy * dy + dz * dz)
            drr = pd / jnp.maximum(probes_ref[pi_, 3], 1e-6)
            dr2 = drr * drr
            att = sat(1.0 - dr2 * dr2)
            att = att * att
            out = []
            for c in range(3):
                irr = pbasis[0] * probes_ref[pi_, 4 + c]
                for k in range(1, 9):
                    irr = irr + pbasis[k] * probes_ref[pi_, 4 + 3 * k + c]
                out.append(pacc[c] + jnp.maximum(irr, 0.0) * att)
            return (tuple(out), total_w + att)

        pacc, total_w = jax.lax.fori_loop(
            0, jnp.minimum(counts_ref[3], n_probes), probe_body,
            (tuple(env_dif), jnp.ones_like(depth)))
        inv_tw = 1.0 / total_w
        env_dif = [a * inv_tw for a in pacc]

    # env split-sum apply (brdf.env_light, f90 = 0.8)
    dif_acc = tuple(e * eb2 * ambient for e in env_dif)
    specint = P[0, 25]
    spc_acc = tuple(es * (sc * eb0 + 0.8 * eb1) * ambient * specint
                    for es, sc in zip(env_spec, spec_col))

    # ---- main light (sun) with precomputed ESM factor plane
    sf = g["sf"]
    ldir = (P[0, 16], P[0, 17], P[0, 18])       # = -direction
    r_ = madd3(scale3(nrm, 2.0 * dot3(nrm, eye)), eye, -1.0)
    ldr = dot3(ldir, r_)
    bent = madd3(ldir, sub3(r_, ldir), rough)
    use_bent = ldr >= P[0, 22]
    lv = normalize3(tuple(jnp.where(use_bent, b, l)
                          for b, l in zip(bent, ldir)))
    ndv, ndl, ndh, ldh = _angles(nrm, eye, lv)
    fd = _disney(ndv, ndl, ldh, alpha) * INV_PI
    fr = _spec_ggx(spec_col, ndv, ndl, ldh, ndh, alpha)
    wsun = ndl * sf
    sun_i = (P[0, 19], P[0, 20], P[0, 21])
    dif_acc = tuple(d + wsun * fd * si for d, si in zip(dif_acc, sun_i))
    spc_acc = tuple(s + wsun * INV_PI * fi * si
                    for s, fi, si in zip(spc_acc, fr, sun_i))

    # ---- point lights
    if n_subtiles > 0:
        # clustered: each 128-lane sub-tile walks ITS binned light list
        # (depth-bounds-culled outside) — cost scales with actual
        # overlap, not the global light count (reference: lighting.comp
        # cluster-mask loops)
        lists_ref, ccounts_ref = cluster_refs
        dparts = [[], [], []]
        sparts = [[], [], []]
        for k in range(n_subtiles):
            sl = slice(k * 128, (k + 1) * 128)
            wp_k = tuple(v[:, sl] for v in worldp)
            nr_k = tuple(v[:, sl] for v in nrm)
            eye_k = tuple(v[:, sl] for v in eye)
            spec_k = tuple(v[:, sl] for v in spec_col)
            alpha_k = alpha[:, sl]
            da0 = tuple(v[:, sl] for v in dif_acc)
            sa0 = tuple(v[:, sl] for v in spc_acc)

            def cbody(j, acc, _k=k, _wp=wp_k, _nr=nr_k, _eye=eye_k,
                      _spec=spec_k, _alpha=alpha_k):
                da_, sa_ = acc
                li_ = lists_ref[0, j, _k]
                lp = (lights_ref[li_, 0], lights_ref[li_, 1],
                      lights_ref[li_, 2])
                lint = (lights_ref[li_, 3], lights_ref[li_, 4],
                        lights_ref[li_, 5])
                la = (lights_ref[li_, 6], lights_ref[li_, 7],
                      lights_ref[li_, 8], lights_ref[li_, 9])
                d_i, s_i, _ = _eval_light(_wp, _nr, _eye, _spec, _alpha,
                                          lp, lint, la)
                return (tuple(a + d for a, d in zip(da_, d_i)),
                        tuple(a + s for a, s in zip(sa_, s_i)))

            da_k, sa_k = jax.lax.fori_loop(0, ccounts_ref[0, 0, k], cbody,
                                           (da0, sa0))
            for c in range(3):
                dparts[c].append(da_k[c])
                sparts[c].append(sa_k[c])
        dif_acc = tuple(jnp.concatenate(dparts[c], axis=1) for c in range(3))
        spc_acc = tuple(jnp.concatenate(sparts[c], axis=1) for c in range(3))
    else:
        n_point = counts_ref[0]

        def chunk_body(c, acc):
            da, sa = acc
            for j in range(point_chunk):
                idx = c * point_chunk + j
                # clamp the read: the last chunk may index past the
                # table when rows % point_chunk != 0 — Mosaic scalar
                # loads are unchecked on hardware and garbage bits can
                # be NaN (NaN * on(0) = NaN); the `on` mask handles the
                # contribution (matches lighting_pass.py:259)
                ridx = jnp.minimum(idx, lights_ref.shape[0] - 1)
                lp = (lights_ref[ridx, 0], lights_ref[ridx, 1],
                      lights_ref[ridx, 2])
                li = (lights_ref[ridx, 3], lights_ref[ridx, 4],
                      lights_ref[ridx, 5])
                la = (lights_ref[ridx, 6], lights_ref[ridx, 7],
                      lights_ref[ridx, 8], lights_ref[ridx, 9])
                on = (idx < n_point).astype(jnp.float32)
                d_i, s_i, _ = _eval_light(worldp, nrm, eye, spec_col, alpha,
                                          lp, li, la)
                da = tuple(a + on * d for a, d in zip(da, d_i))
                sa = tuple(a + on * s for a, s in zip(sa, s_i))
            return (da, sa)

        nchunks = (n_point + point_chunk - 1) // point_chunk
        dif_acc, spc_acc = jax.lax.fori_loop(0, nchunks, chunk_body,
                                             (dif_acc, spc_acc))

    # ---- spot lights: static shadowed slots (factor planes) + dynamic
    # unshadowed remainder
    n_spot = counts_ref[1]
    n_maps = len(spotsf_refs)

    def _spot_eval(idx, shadow):
        # clamp the read (see chunk_body): more factor planes than spot
        # rows must not read past the table
        r = jnp.minimum(idx, spots_ref.shape[0] - 1)
        lp = (spots_ref[r, 0], spots_ref[r, 1], spots_ref[r, 2])
        li = (spots_ref[r, 3], spots_ref[r, 4], spots_ref[r, 5])
        la = (spots_ref[r, 6], spots_ref[r, 7], spots_ref[r, 8],
              spots_ref[r, 9])
        sd = (spots_ref[r, 10], spots_ref[r, 11], spots_ref[r, 12])
        cut = spots_ref[r, 13]
        d_i, s_i, lv2 = _eval_light(worldp, nrm, eye, spec_col, alpha,
                                    lp, li, la)
        cone = sat((-dot3(sd, lv2) - cut) * 20.0)
        on = (idx < n_spot).astype(jnp.float32) * cone * shadow
        return (tuple(on * d for d in d_i), tuple(on * s for s in s_i))

    for m in range(n_maps):
        d_i, s_i = _spot_eval(m, spotsf_refs[m][...].astype(jnp.float32))
        dif_acc = tuple(a + d for a, d in zip(dif_acc, d_i))
        spc_acc = tuple(a + s for a, s in zip(spc_acc, s_i))

    def spot_body(c, acc):
        da, sa = acc
        d_i, s_i = _spot_eval(n_maps + c, 1.0)
        return (tuple(a + d for a, d in zip(da, d_i)),
                tuple(a + s for a, s in zip(sa, s_i)))

    nsp = jnp.maximum(n_spot - n_maps, 0)
    dif_acc, spc_acc = jax.lax.fori_loop(0, nsp, spot_body,
                                         (dif_acc, spc_acc))

    exposure = P[0, 24]
    emissive = g["em"]
    em_term = 128.0 * emissive * emissive * emissive
    cols = []
    for c in range(3):
        col = (diffuse_col[c] * (dif_acc[c] + em_term) + spc_acc[c])
        col = jnp.where(mask, col * exposure, 0.0)
        if f"sky_{'rgb'[c]}" in g:    # sky fills uncovered pixels
            col = jnp.where(mask, col, g[f"sky_{'rgb'[c]}"] * exposure)
        cols.append(col)

    # deeper depth-peeled lit layers blend under layer 1, back-to-front
    # (deepest first; reference: translucent.frag shades EVERY
    # translucent fragment; fragments beyond the last peeled layer fall
    # back to unlit WBOIT via the oit accumulators)
    for k_ in range(MAX_TR_LAYERS, 1, -1):
        if f"tr{k_}_a" in g:
            a_ = g[f"tr{k_}_a"]
            cols = [b * (1.0 - a_) + g[f"tr{k_}_{'rgb'[c]}"] * a_
                    for c, b in enumerate(cols)]

    if "tr_a" in g:               # lit translucent layer (pre-shaded)
        bg = cols
        if "tr_ox" in g:
            # refraction: shift the background by the surface normal,
            # quantized to a static ladder — dynamic per-pixel taps are
            # gathers, but rolls + selects are dense VPU work.  Applied
            # separably (x then y); band-local wrap is hidden under the
            # translucent surface's own distortion.
            def _shift_sel(planes_, off, axis, steps):
                n = planes_[0].shape[axis]
                acc = [jnp.zeros_like(p) for p in planes_]
                # nearest ladder step per pixel
                best = jnp.full_like(off, 1e9)
                pick = jnp.zeros_like(off)
                for s in steps:
                    d2 = jnp.abs(off - s)
                    pick = jnp.where(d2 < best, jnp.float32(s), pick)
                    best = jnp.minimum(best, d2)
                for s in steps:
                    m = pick == s
                    sh = (-s) % n
                    for j, p in enumerate(planes_):
                        acc[j] = jnp.where(m, pltpu.roll(p, sh, axis),
                                           acc[j])
                return acc
            bg = _shift_sel(bg, g["tr_ox"], 1, REFR_STEPS)
            bg = _shift_sel(bg, g["tr_oy"], 0, REFR_STEPS_Y)
            # only refract where the translucent layer covers
            bg = [jnp.where(g["tr_a"] > 0.0, b, c_)
                  for b, c_ in zip(bg, cols)]
        cols = [b * (1.0 - g["tr_a"]) + g[f"tr_{'rgb'[c]}"] * g["tr_a"]
                for c, b in enumerate(bg)]

    if "fog_t" in g:
        fog_t = g["fog_t"]
    if "oit_rev" in g:
        inv_w = 1.0 / jnp.maximum(g["oit_w"], 1e-5)
        oit_alpha = 1.0 - g["oit_rev"]
    for c, (ch, out) in enumerate(zip("rgb", (hr_ref, hg_ref, hb_ref))):
        col = cols[c]
        if "fog_t" in g:          # volumetric fog apply (matches the
            col = col * fog_t + g[f"fog_{ch}"]       # XLA apply_fog)
        if "oit_rev" in g:        # WBOIT resolve (weightblend.frag)
            col = (col * g["oit_rev"]
                   + g[f"oit_{ch}"] * inv_w * oit_alpha)
        out[...] = col


def shade_deferred_pallas(gplanes, sceneset, *, proj, invview,
                          ao=None, spotsf=None, point_chunk=8,
                          interpret=False, planes_out=False, clusters=None,
                          y0=0, full_height=None):
    """Launch the deferred-shade megakernel.

    gplanes: dict of (H, W) f32 planes — gbuffer [depth, visf, nx..nz
    (shaded normal), dr/dg/db (diffuse color), em, sr/sg/sb (specular
    color), rgh] + env fields [esr/esg/esb (specular env radiance),
    eb0/eb1/eb2 (envBRDF)] + sf (sun shadow factor); ao: optional (H, W)
    ambient multiplier; spotsf: optional (n_maps, H, W) spot factors.
    sceneset additionally carries "_sh" (9, 3).  Returns hdr (H, W, 3).

    Tile-sharded bands: pass y0 (global first row, may be traced) and
    full_height (global image height) — the grid covers the local band
    while NDC math stays global.
    """
    H, W = gplanes["depth"].shape
    local_H = H
    if full_height is not None:
        H = full_height

    ml = sceneset["mainlight"]
    cam = sceneset["camera"]
    iv = invview
    params = jnp.zeros((1, 64), jnp.float32)
    params = params.at[0, 0].set(1.0 / proj[0, 0])
    params = params.at[0, 1].set(1.0 / proj[1, 1])
    params = params.at[0, 2].set(proj[2, 2])
    params = params.at[0, 3].set(proj[2, 3])
    params = params.at[0, 4:16].set(iv[:3, :4].reshape(-1))
    params = params.at[0, 16:19].set(-jnp.asarray(ml["direction"]))
    params = params.at[0, 19:22].set(jnp.asarray(ml["intensity"]))
    params = params.at[0, 22].set(ml["cutoff"])
    params = params.at[0, 23].set(cam["ambientintensity"])
    params = params.at[0, 24].set(cam["exposure"])
    params = params.at[0, 25].set(cam["specularintensity"])
    params = params.at[0, 26].set(jnp.asarray(y0, jnp.float32))
    params = params.at[0, 27:54].set(jnp.asarray(sceneset["_sh"]).reshape(-1))

    pl_ = sceneset["pointlights"]
    lights = jnp.concatenate([pl_["position"], pl_["intensity"],
                              pl_["attenuation"],
                              jnp.zeros((pl_["position"].shape[0], 6),
                                        jnp.float32)], axis=1)   # (L, 16)
    sl = sceneset.get("spotlights")
    if sl is not None:
        spots = jnp.concatenate([
            sl["position"], sl["intensity"], sl["attenuation"],
            sl["direction"], sl["cutoff"][:, None],
            jnp.zeros((sl["position"].shape[0], 2), jnp.float32)], axis=1)
        n_spot = sl["count"]
    else:
        spots = jnp.zeros((1, 16), jnp.float32)
        n_spot = jnp.int32(0)
    probes = sceneset.get("probes")
    if probes is not None and probes["position"].shape[0] > 0:
        n_probes = int(probes["position"].shape[0])
        probe_tab = jnp.concatenate([
            probes["position"],                                   # xyz + r
            probes["sh"].reshape(n_probes, 27),
            jnp.zeros((n_probes, 1), jnp.float32)], axis=1)       # (N, 32)
        probe_count = probes["count"]
    else:
        n_probes = 0
        probe_tab = jnp.zeros((1, 32), jnp.float32)
        probe_count = jnp.int32(0)
    counts = jnp.stack([jnp.minimum(pl_["count"],
                                    pl_["position"].shape[0]).astype(jnp.int32),
                        jnp.minimum(n_spot,
                                    spots.shape[0]).astype(jnp.int32),
                        jnp.int32(0),
                        jnp.asarray(probe_count, jnp.int32)])

    n_maps = 0 if spotsf is None else spotsf.shape[0]

    assert local_H % SHADE_ROWS == 0, (
        f"shade_deferred_pallas needs height % {SHADE_ROWS} == 0 "
        f"(got {local_H}) — pad planes to the tile grid first")
    grid = local_H // SHADE_ROWS
    band = lambda i, *_: (i, 0)
    full = lambda i, *_: (0, 0)
    in_specs = [
        pl.BlockSpec((1, 64), full, memory_space=pltpu.VMEM),       # params
        pl.BlockSpec((lights.shape[0], 16), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((spots.shape[0], 16), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((probe_tab.shape[0], 32), full, memory_space=pltpu.VMEM),
    ]
    names = list(PLANE_NAMES)
    trk_groups = [_trk_names(k) for k in range(2, MAX_TR_LAYERS + 1)]
    for grp in (SKY_NAMES, ENVD_NAMES, TR_NAMES, *trk_groups, REFR_NAMES,
                FOG_NAMES, OIT_NAMES):
        if grp[0] in gplanes:
            names += grp
    # bf16 plane storage (except depth/visf): the reference's gbuffer is
    # 8/10-bit anyway; halves input DMA and keeps the kernel's scoped
    # VMEM well under the 16 MB cliff as epilogue plane groups grow
    F32_PLANES = ("depth", "visf")
    plane_args = [gplanes[k] if k in F32_PLANES
                  else gplanes[k].astype(jnp.bfloat16) for k in names]
    in_specs += [pl.BlockSpec((SHADE_ROWS, W), band, memory_space=pltpu.VMEM)
                 for _ in plane_args]
    if ao is None:
        ao = jnp.ones((8, 128), jnp.bfloat16)
        in_specs += [pl.BlockSpec((8, 128), full, memory_space=pltpu.VMEM)]
        with_ao = False
    else:
        ao = ao.astype(jnp.bfloat16)
        in_specs += [pl.BlockSpec((SHADE_ROWS, W), band,
                                  memory_space=pltpu.VMEM)]
        with_ao = True
    in_specs += [pl.BlockSpec((1, SHADE_ROWS, W), lambda i, *_: (0, i, 0),
                              memory_space=pltpu.VMEM)
                 for _ in range(n_maps)]
    n_subtiles = 0
    cluster_args = []
    if clusters is not None:
        from .common import round_up

        band_lists, band_counts = clusters
        n_subtiles = band_lists.shape[1]
        assert n_subtiles * 128 == W, (n_subtiles, W)
        # layout (band, cap, subtile): the per-light loop index must
        # ride the SUBLANE axis (Mosaic scalar loads need static lane
        # positions); pad to (sublane % 8, lane % 128)
        cap = round_up(band_lists.shape[2], 8)
        band_lists = jnp.pad(band_lists,
                             ((0, 0), (0, 128 - n_subtiles),
                              (0, cap - band_lists.shape[2])))
        band_lists = jnp.transpose(band_lists, (0, 2, 1))
        band_counts = jnp.pad(band_counts,
                              ((0, 0), (0, 128 - n_subtiles)))[:, None, :]
        in_specs += [
            pl.BlockSpec((1, cap, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        cluster_args = [band_lists, band_counts]

    out_specs = [pl.BlockSpec((SHADE_ROWS, W), band, memory_space=pltpu.VMEM)
                 for _ in range(3)]
    out_shape = [jax.ShapeDtypeStruct((local_H, W), jnp.float32)] * 3

    NP = len(names)
    names_t = tuple(names)

    def wrap(counts_ref, params_ref, lights_ref, spots_ref, probes_ref,
             *rest):
        plane_refs = rest[:NP]
        ao_ref = rest[NP]
        ssf_refs = rest[NP + 1:NP + 1 + n_maps]
        ncl = 2 if n_subtiles else 0
        cl_refs = rest[NP + 1 + n_maps:NP + 1 + n_maps + ncl] or None
        outs = rest[NP + 1 + n_maps + ncl:]
        _shade_kernel(counts_ref, params_ref, lights_ref, spots_ref,
                      probes_ref, plane_refs, ao_ref,
                      [s.at[0] for s in ssf_refs], cl_refs,
                      *outs,
                      W=W, H=H, point_chunk=point_chunk,
                      with_ao=with_ao, n_probes=n_probes, names=names_t,
                      n_subtiles=n_subtiles)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    hr, hg, hb = pl.pallas_call(
        wrap, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
    )(counts, params, lights, spots, probe_tab, *plane_args, ao,
      *([spotsf[k:k + 1].astype(jnp.bfloat16) for k in range(n_maps)]
        if spotsf is not None
        else []), *cluster_args)
    if planes_out:
        return hr, hg, hb
    return jnp.stack([hr, hg, hb], axis=-1)
