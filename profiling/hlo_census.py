"""Offline XLA-op census of the frame graph (no device needed).

Compiles render_frame at a reduced resolution of the bench config and
aggregates the OPTIMIZED HLO's top-level instructions (each one device
dispatch) by source line.  The round-4/5 trace arithmetic says the
"unattributed residue" is the 5-100 us mid-band: hundreds of small
fusions each individually invisible — this census names where they
come from without needing the (intermittently degraded) TPU tunnel.

Caveat: CPU and TPU backends fuse differently, so counts are a guide,
not ground truth; the TPU trace (DATUM_BENCH_TRACE=1 bench.py) remains
the ledger.  Buffer bytes assume f32 and report the OUTPUT size of
each instruction as a bandwidth floor.

Usage:  JAX_PLATFORMS=cpu python profiling/hlo_census.py [W H]
"""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def census(width=512, height=256):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from datum_tpu.render import frame as frame_mod
    from datum_tpu.render.types import make_sceneset
    from datum_tpu.scenes import datumtest_scene
    from datum_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    ctx, camera, params, make_rl = datumtest_scene(
        width=width, height=height, sphere_detail=24, n_point_lights=8,
        max_vertices=1 << 15, max_triangles=1 << 15,
        big_capacity=64, bin_max_span=8,
        use_pallas=True, shadow_factor_scale=4,
        enable_material_maps=True, texture_filter="mip_half",
        enable_ssao=True, enable_fog=True, enable_ssr=True,
        max_spot_shadows=1, max_particle_quads=512,
        max_translucent_draws=2, max_translucent_tris=2048,
        max_decals_active=2, decal_textures=False,
        translucent_lit_scale=2, shadow_far_res=512,
        shadow_slice_blend=0.25, fog_sample_scale=8,
        pallas_interpret=True)
    rl = make_rl(0.5)
    sceneset = make_sceneset(camera, params, point_lights=rl.point_lights,
                             spot_lights=rl.spot_lights)
    draws = rl.draw_arrays(ctx.config.max_instances, ctx.default_material)
    ctx.expand_host(draws)
    draws["forward"] = rl.forward_arrays(ctx.config.max_particle_quads,
                                         camera)
    draws["translucent"] = rl.translucent_arrays(
        ctx.config.max_translucent_draws, ctx.default_material)
    draws["decals"] = rl.decal_arrays(ctx.config.max_decals_active)
    device = ctx.device_state()

    import functools
    fn = functools.partial(frame_mod.render_frame, ctx.config)
    lowered = jax.jit(fn).lower(device, draws, sceneset)
    compiled = lowered.compile()
    txt = compiled.as_text()
    return report(txt)


_SHAPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "u8": 1, "s8": 1, "pred": 1, "u16": 2, "s16": 2,
                "f64": 8, "s64": 8, "u64": 8}


def _out_bytes(shape_str):
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in _SHAPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _SHAPE_BYTES[dt]
    return total


def report(txt, top=45):
    """Aggregate ENTRY-computation instructions by metadata source."""
    in_entry = False
    rows = []
    for line in txt.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            in_entry = False
        if not in_entry:
            continue
        s = line.strip()
        if " = " not in s:
            continue
        rhs = s.split(" = ", 1)[1]
        # shape token: either a (tuple, of, shapes) — find the matching
        # close paren — or a single space-free token (layout annotations
        # like {1,0:T(8,128)S(1)} contain no spaces)
        if rhs.startswith("("):
            depth = 0
            end = 0
            for i, ch in enumerate(rhs):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        end = i + 1
                        break
            shape, rest = rhs[:end], rhs[end:].lstrip()
        else:
            parts = rhs.split(None, 1)
            if len(parts) < 2:
                continue
            shape, rest = parts[0], parts[1]
        m = re.match(r"([\w\-]+)", rest)
        if not m:
            continue
        opname = m.group(1)
        meta = re.search(r'metadata=\{[^}]*source_file="([^"]+)"'
                         r'[^}]*source_line=(\d+)', s)
        src = (f"{meta.group(1).split('/')[-1]}:{meta.group(2)}"
               if meta else "?")
        rows.append((opname, src, _out_bytes(shape)))

    print(f"entry instructions (device dispatches): {len(rows)}")
    byop = collections.Counter(r[0] for r in rows)
    print("\n== by op kind ==")
    for k, c in byop.most_common(15):
        print(f"  {c:5d}  {k}")
    bysrc = collections.defaultdict(lambda: [0, 0])
    for opname, src, b in rows:
        bysrc[src][0] += 1
        bysrc[src][1] += b
    print(f"\n== top {top} source lines by instruction count ==")
    for src, (c, b) in sorted(bysrc.items(), key=lambda kv: -kv[1][0])[:top]:
        print(f"  {c:5d}  {b/1e6:8.2f}MB  {src}")
    byfile = collections.defaultdict(lambda: [0, 0])
    for opname, src, b in rows:
        f = src.split(":")[0]
        byfile[f][0] += 1
        byfile[f][1] += b
    print("\n== by file ==")
    for f, (c, b) in sorted(byfile.items(), key=lambda kv: -kv[1][0]):
        print(f"  {c:5d}  {b/1e6:8.2f}MB  {f}")
    return rows


if __name__ == "__main__":
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    census(w, h)
