"""Offline tools: obj parser, pack compressor, core pack builder, dump."""

import numpy as np

from datum_tpu.asset.pack import PackReader


def test_objparser_cube():
    from datum_tpu.tools.objparser import parse_obj

    with open("/root/reference/data/cube.obj") as f:
        v, i = parse_obj(f.read())
    assert len(i) % 3 == 0 and len(i) // 3 >= 12
    assert i.max() < len(v)
    n = np.linalg.norm(v["normal"], axis=1)
    assert np.all(n > 0.9)
    t = np.linalg.norm(v["tangent"][:, :3], axis=1)
    assert np.all(t > 0.5)


def test_compressor_roundtrip(tmp_path):
    from datum_tpu.tools.assetcompressor import compress_pack

    dst = str(tmp_path / "c.pack")
    a, b = compress_pack("/root/reference/bin/teapot.pack", dst)
    assert b < a
    m1 = PackReader("/root/reference/bin/teapot.pack").mesh(0)
    m2 = PackReader(dst).mesh(0)
    np.testing.assert_array_equal(m1["vertices"], m2["vertices"])
    np.testing.assert_array_equal(m1["indices"], m2["indices"])


def test_core_pack_builds(tmp_path):
    from datum_tpu.tools.assetbuilder import build_core_pack
    from datum_tpu.asset.corepack import CoreAsset, CORE_MAGIC

    path = str(tmp_path / "core.pack")
    build_core_pack(path, envbrdf_size=8, skybox_size=8, compress=True)
    pack = PackReader(path)
    cat = pack.catalog(0)
    assert pack.assets[0].fields["magic"] == CORE_MAGIC
    # built-in meshes present and valid
    for cid in (CoreAsset.unit_quad, CoreAsset.unit_cube, CoreAsset.unit_sphere):
        m = pack.mesh(int(cid))
        assert m["indices"].max() < len(m["vertices"])
    # line-list overlay meshes (edges encoded as degenerate triangles)
    for cid in (CoreAsset.line_quad, CoreAsset.line_cube, CoreAsset.line_cone):
        m = pack.mesh(int(cid))
        tri = np.asarray(m["indices"]).reshape(-1, 3)
        assert (tri[:, 1] == tri[:, 2]).all()
    # baked data assets: water/cloud/noise textures, loader/test images,
    # default particle (reference: corepack.h ids 104-113)
    for cid in (CoreAsset.wave_color, CoreAsset.wave_normal,
                CoreAsset.wave_foam, CoreAsset.cloud_density,
                CoreAsset.cloud_normal, CoreAsset.noise_normal,
                CoreAsset.loader_image, CoreAsset.test_image):
        img = pack.image(int(cid))
        assert img["mips"][0].size > 0
    nrm = pack.image(int(CoreAsset.wave_normal))["mips"][0]
    # normal-map blue channel dominates (unit normals, z-up encoding);
    # pack layout is 0xAARRGGBB — blue is the LOW byte
    from datum_tpu.math.color import unpack_rgba
    rgba = unpack_rgba(np.asarray(nrm))
    assert rgba[..., 2].mean() > 0.6
    assert int(CoreAsset.default_particle) in pack.assets
    # kernel registry entries resolve to real symbols
    import importlib

    checked = 0
    for aid, name in cat.items():
        mod, _, sym = name.rpartition(".")
        sym = sym.split("#")[0]
        if not mod:
            continue
        m = importlib.import_module(mod)
        assert hasattr(m, sym), f"{name} missing"
        checked += 1
    assert checked > 20


def test_dump_runs(tmp_path):
    from datum_tpu.tools.assetdump import dump

    out = dump("/root/reference/bin/cube.pack")
    assert "MESH" in out


def test_hdr_roundtrip(tmp_path, rng):
    from datum_tpu.tools.hdr import save_hdr, load_hdr

    img = (rng.rand(16, 32, 3) * 50).astype(np.float32)
    p = str(tmp_path / "t.hdr")
    save_hdr(p, img)
    back = load_hdr(p)
    err = np.abs(back - img) / np.maximum(img.max(-1, keepdims=True), 1e-6)
    assert err.max() < 0.02  # 8-bit shared-exponent mantissa


def test_embed_image(rng):
    from datum_tpu.tools.assetembed import embed_image

    img = (rng.rand(4, 4, 4) * 255).astype(np.uint8)
    src = embed_image(img, "logo")
    ns = {}
    exec(src, ns)
    assert ns["logo_width"] == 4 and ns["logo_height"] == 4
    assert bytes(b"".join([ns["logo_data"]]) if isinstance(ns["logo_data"], bytes)
                 else b"".join(ns["logo_data"])) == img.tobytes()
    csrc = embed_image(img, "logo", lang="c")
    assert "logo_data[]" in csrc


def test_render_fallback():
    from datum_tpu.render.context import render_fallback

    fb = render_fallback(320, 180, tick=5)
    assert fb.shape == (180, 320, 3)
    assert fb.max() > 100   # logo text visible
