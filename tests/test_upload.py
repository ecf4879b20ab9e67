"""Background device-upload queue tests (asset/upload.py).

Reference parity: the staging TransferLump flow — background decode ->
transfer-queue copy -> fence -> ready (reference: src/asset.cpp:396-425,
src/renderer/resource.h:107-127).
"""

import time

import numpy as np

from datum_tpu.asset.upload import DeviceUploader


def wait_ready(up, key, timeout=10.0):
    t0 = time.time()
    while not up.ready(key):
        assert time.time() - t0 < timeout, "upload never landed"
        time.sleep(0.005)


class TestDeviceUploader:
    def test_submit_poll_get(self):
        up = DeviceUploader()
        a = np.arange(24, dtype=np.float32).reshape(4, 6)
        assert up.get("a") is None
        up.submit("a", a)
        wait_ready(up, "a")
        got = np.asarray(up.get("a"))
        assert np.array_equal(got, a)
        up.close()

    def test_pytree_and_many(self):
        up = DeviceUploader()
        for i in range(16):
            up.submit(i, dict(x=np.full((8, 8), i, np.float32),
                              y=np.int32(i)))
        up.flush()
        for i in range(16):
            got = up.get(i)
            assert float(got["x"][0, 0]) == i and int(got["y"]) == i
        up.close()

    def test_duplicate_submit_is_noop(self):
        up = DeviceUploader()
        a = np.ones(4, np.float32)
        up.submit("k", a)
        up.submit("k", a * 2)      # ignored: already pending/resident
        up.flush()
        assert float(np.asarray(up.get("k"))[0]) == 1.0
        up.evict("k")
        assert up.get("k") is None
        up.close()

    def test_chained_asset_request(self, tmp_path):
        """AssetManager streaming -> device upload, end to end against
        a real pack written by the pack writer."""
        from datum_tpu.asset.manager import AssetManager
        from datum_tpu.asset.pack import IMAGE_RGBA, PackWriter

        path = tmp_path / "t.pack"
        rng = np.random.RandomState(0)
        img = rng.randint(0, 2**32, (1, 8, 8), dtype=np.uint64).astype(
            np.uint32)
        w = PackWriter()
        w.write_image(0, 8, 8, 1, 1, IMAGE_RGBA, img.tobytes())
        path.write_bytes(w.finish())

        mgr = AssetManager()
        base = mgr.load(str(path))
        up = DeviceUploader()
        t0 = time.time()
        dev = None
        while dev is None and time.time() - t0 < 10.0:
            dev = up.request(("tex", base), mgr, base)
            time.sleep(0.005)
        assert dev is not None, "chained request never became resident"
        host = mgr.request(base)
        np.testing.assert_array_equal(np.asarray(dev["mips"][0]),
                                      np.asarray(host["mips"][0]))
