"""Asset pipeline tests: LZ4 codec, pack reader against reference
fixtures, writer/reader roundtrip, asset manager streaming."""

import os

import numpy as np
import pytest

from datum_tpu.asset import AssetManager, PackReader
from datum_tpu.asset import lz4
from datum_tpu.asset.pack import PackWriter, VERTEX_DTYPE, IMAGE_RGBA, _fast_checksum, chunk_checksum

REF_BIN = "/root/reference/bin"


class TestLZ4:
    def test_roundtrip_random(self, rng):
        data = rng.bytes(50000)
        comp, consumed = lz4.compress(data, 200000)
        assert consumed == len(data)
        out = lz4.decompress(comp, len(data))
        assert out == data

    def test_roundtrip_compressible(self):
        data = (b"hello world, this is a compressible string! " * 1000)
        comp, consumed = lz4.compress(data, len(data))
        assert consumed == len(data)
        assert len(comp) < len(data) // 4
        assert lz4.decompress(comp, len(data)) == data

    def test_partial_fit(self):
        data = os.urandom(50000)  # incompressible
        comp, consumed = lz4.compress(data, 10000)
        assert 0 < consumed <= 10000
        assert lz4.decompress(comp, consumed) == data[:consumed]

    def test_python_native_agree(self, rng):
        data = (b"abcabcabc" * 500) + rng.bytes(1000) + (b"xyz" * 700)
        if not lz4._load_native():
            pytest.skip("native lib unavailable")
        ncomp, ncons = lz4.compress(data, len(data) * 2)
        # python decoder decodes native stream
        assert lz4._py_decompress(ncomp, len(data)) == data
        # native decoder decodes python stream
        pcomp, pcons = lz4._py_compress(data, len(data) * 2)
        assert pcons == len(data)
        assert lz4.decompress(pcomp, len(data)) == data

    def test_empty(self):
        comp, consumed = lz4.compress(b"", 100)
        assert consumed == 0
        assert lz4.decompress(comp, 0) == b""


class TestChecksum:
    def test_fast_matches_reference_algorithm(self, rng):
        data = rng.bytes(1021)
        assert _fast_checksum(data) == chunk_checksum(data)


@pytest.mark.skipif(not os.path.exists(REF_BIN), reason="reference fixtures unavailable")
class TestReferenceFixtures:
    def test_cube(self):
        pack = PackReader(os.path.join(REF_BIN, "cube.pack"))
        assert 0 in pack.assets
        mesh = pack.mesh(0)
        assert len(mesh["vertices"]) == 24
        assert len(mesh["indices"]) == 36
        np.testing.assert_allclose(mesh["mincorner"], [-1, -1, -1])
        # all positions inside the bound
        pos = mesh["vertices"]["position"]
        assert pos.min() >= -1.001 and pos.max() <= 1.001
        # normals are unit length
        n = mesh["vertices"]["normal"]
        np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-3)
        # indices in range
        assert mesh["indices"].max() < 24

    def test_teapot(self):
        pack = PackReader(os.path.join(REF_BIN, "teapot.pack"))
        mesh = pack.mesh(0)
        assert len(mesh["vertices"]) > 1000
        assert len(mesh["indices"]) % 3 == 0
        assert mesh["indices"].max() < len(mesh["vertices"])

    def test_character_rigged(self):
        pack = PackReader(os.path.join(REF_BIN, "character.pack"))
        types = {info.type for info in pack.assets.values()}
        meshes = [i for i, info in pack.assets.items() if info.type == "mesh"]
        rigged = [i for i in meshes if pack.assets[i].fields["bonecount"] > 0]
        assert rigged, f"expected a rigged mesh, got types {types}"
        mesh = pack.mesh(rigged[0])
        assert "rig" in mesh and "bones" in mesh
        w = mesh["rig"]["weight"]
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-2)
        assert mesh["rig"]["bone"].max() < len(mesh["bones"])
        anims = [i for i, info in pack.assets.items() if info.type == "anim"]
        if anims:
            anim = pack.animation(anims[0])
            assert anim["duration"] > 0
            assert len(anim["joints"]) > 0

    def test_all_fixture_packs_parse(self):
        for name in ("cube", "plane", "sphere", "suzanne", "teapot", "character"):
            pack = PackReader(os.path.join(REF_BIN, f"{name}.pack"))
            assert pack.assets
            for aid, info in pack.assets.items():
                if info.type == "mesh":
                    m = pack.mesh(aid)
                    assert m["indices"].max() < len(m["vertices"])


class TestWriterRoundtrip:
    def _make_mesh(self, rng, n=100):
        verts = np.zeros(n, VERTEX_DTYPE)
        verts["position"] = rng.randn(n, 3)
        verts["texcoord"] = rng.rand(n, 2)
        verts["normal"] = rng.randn(n, 3)
        verts["tangent"] = rng.randn(n, 4)
        indices = rng.randint(0, n, 3 * n).astype(np.uint32)
        return verts, indices

    def test_mesh_roundtrip(self, rng, tmp_path):
        verts, indices = self._make_mesh(rng)
        w = PackWriter()
        w.write_catalog(0, 0x1234, 1, {1: "test/mesh"})
        w.write_mesh(1, verts, indices, verts["position"].min(0), verts["position"].max(0))
        path = tmp_path / "test.pack"
        w.save(path)

        r = PackReader(str(path))
        assert r.catalog(0) == {1: "test/mesh"}
        m = r.mesh(1)
        np.testing.assert_array_equal(m["vertices"], verts)
        np.testing.assert_array_equal(m["indices"], indices)

    def test_compressed_mesh_roundtrip(self, rng, tmp_path):
        verts, indices = self._make_mesh(rng, 3000)
        w = PackWriter()
        w.write_mesh(7, verts, indices, [-1, -1, -1], [1, 1, 1], compress=True)
        r = PackReader(w.finish())
        m = r.mesh(7)
        np.testing.assert_array_equal(m["vertices"], verts)
        np.testing.assert_array_equal(m["indices"], indices)

    def test_image_roundtrip(self, rng):
        img = rng.randint(0, 2**32, (2, 64, 64), dtype=np.uint64).astype(np.uint32)
        mip1 = rng.randint(0, 2**32, (2, 32, 32), dtype=np.uint64).astype(np.uint32)
        w = PackWriter()
        w.write_image(3, 64, 64, 2, 2, IMAGE_RGBA, img.tobytes() + mip1.tobytes(), compress=True)
        r = PackReader(w.finish())
        decoded = r.image(3)
        assert decoded["levels"] == 2
        np.testing.assert_array_equal(decoded["mips"][0], img)
        np.testing.assert_array_equal(decoded["mips"][1], mip1)

    def test_material_roundtrip(self):
        w = PackWriter()
        w.write_material(2, color=(1, 0.5, 0.25, 1), metalness=0.9, roughness=0.3,
                         reflectivity=0.4, emissive=0.1, albedomap=5, surfacemap=6, normalmap=7)
        r = PackReader(w.finish())
        m = r.material(2)
        np.testing.assert_allclose(m["color"], [1, 0.5, 0.25, 1])
        assert m["metalness"] == pytest.approx(0.9)
        assert (m["albedomap"], m["surfacemap"], m["normalmap"]) == (5, 6, 7)

    def test_model_animation_roundtrip(self, rng):
        w = PackWriter()
        joints = [dict(name="root", parent=0, index=0, count=2),
                  dict(name="arm", parent=0, index=2, count=2)]
        times = [0.0, 1.0, 0.0, 1.0]
        tfs = rng.randn(4, 8).astype(np.float32)
        w.write_animation(1, 1.0, joints, times, tfs)
        w.write_model(2, [dict(type=1, texture=4)],
                      [dict(color=np.ones(4, np.float32), metalness=0.0, roughness=1.0,
                            reflectivity=0.5, emissive=0.0, albedomap=0, surfacemap=0,
                            normalmap=0)],
                      [9], [dict(mesh=0, material=0, transform=np.eye(1, 8, dtype=np.float32)[0],
                                 childcount=0)])
        r = PackReader(w.finish())
        a = r.animation(1)
        assert a["joints"][1]["name"] == "arm"
        np.testing.assert_allclose(a["transforms"], tfs)
        m = r.model(2)
        assert m["meshes"] == [9]
        assert m["instances"][0]["childcount"] == 0


class TestAssetManager:
    def test_request_streams_in(self, tmp_path, rng):
        verts = np.zeros(10, VERTEX_DTYPE)
        verts["position"] = rng.randn(10, 3)
        w = PackWriter()
        w.write_mesh(0, verts, np.arange(10, dtype=np.uint32), [-1, -1, -1], [1, 1, 1])
        path = tmp_path / "m.pack"
        w.save(path)

        mgr = AssetManager()
        base = mgr.load(str(path))
        asset = mgr.find(base + 0)
        assert asset.type == "mesh"
        # poll until background load completes
        import time
        payload = None
        for _ in range(200):
            payload = mgr.request(base + 0)
            if payload is not None:
                break
            time.sleep(0.01)
        assert payload is not None
        np.testing.assert_array_equal(payload["vertices"], verts)

    def test_multi_pack_base_ids(self, tmp_path, rng):
        paths = []
        for i in range(2):
            w = PackWriter()
            w.write_material(0, color=(i, 0, 0, 1))
            w.write_material(1, color=(i, 1, 0, 1))
            p = tmp_path / f"p{i}.pack"
            w.save(p)
            paths.append(p)
        mgr = AssetManager()
        b0 = mgr.load(str(paths[0]))
        b1 = mgr.load(str(paths[1]))
        assert b0 == 0 and b1 == 2
        assert mgr.load_sync(b1 + 1)["color"][0] == pytest.approx(1.0)

    def test_lru_eviction(self, tmp_path):
        w = PackWriter()
        for i in range(4):
            w.write_text(i, bytes(100))
        path = tmp_path / "t.pack"
        w.save(path)
        mgr = AssetManager(budget_bytes=250)
        mgr.load(str(path))
        mgr.load_sync(0)
        mgr.load_sync(1)
        mgr.load_sync(2)  # evicts 0
        assert not mgr.ready(0)
        assert mgr.ready(2)


def test_pack_watcher_hot_reload(tmp_path):
    import time

    from datum_tpu.asset.manager import AssetManager, PackWatcher
    from datum_tpu.asset.pack import PackWriter

    p = tmp_path / "live.pack"
    w = PackWriter()
    w.write_material(7, color=(1, 0, 0, 1))
    w.save(str(p))

    mgr = AssetManager()
    mgr.load(str(p))
    first = mgr.load_sync(7)
    assert abs(first["color"][0] - 1.0) < 1e-6

    watcher = PackWatcher(mgr)
    assert watcher.poll() == []

    time.sleep(0.01)
    w2 = PackWriter()
    w2.write_material(7, color=(0, 1, 0, 1))
    w2.save(str(p))

    changed = watcher.poll()
    assert 7 in changed
    second = mgr.load_sync(7)
    assert abs(second["color"][1] - 1.0) < 1e-6, second["color"]
