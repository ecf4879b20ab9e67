"""Background device-upload queue.

Capability match for the reference's asset->GPU staging flow
(reference: src/renderer/resource.h:107-127 TransferLump ring +
src/asset.cpp:396-425 background_loader -> vkCmdCopyBufferToImage on
the transfer queue -> fence -> Ready): decoded host payloads stream to
the device on a worker thread while the render loop keeps polling
`ready()`, never blocking a frame on an upload.

TPU shape: `jax.device_put` already overlaps host->device DMA with
compute; the queue adds (a) a completion fence per upload (the
reference's `ready()` contract — device_put returns before the copy
lands), (b) decode->upload chaining off the AssetManager's worker pool,
and (c) a single place to serialize uploads so streaming N textures
does not fight the frame for PCIe/ICI bandwidth.
"""

from __future__ import annotations

import queue
import threading


class DeviceUploader:
    """Single-worker upload queue with per-key completion states.

    States mirror the reference resource lifecycle (resource.h Empty ->
    Loading -> Ready): absent -> pending -> resident.
    """

    def __init__(self, device=None):
        self._device = device
        self._resident = {}
        self._pending = set()
        self._lock = threading.Lock()
        self._q = queue.Queue()
        self._thread = threading.Thread(target=self._worker, daemon=True,
                                        name="device-upload")
        self._thread.start()

    def _worker(self):
        import jax

        while True:
            item = self._q.get()
            if item is None:
                return
            key, payload = item
            try:
                arr = jax.device_put(payload, self._device)
                # fence: ready() must mean the copy LANDED (the
                # reference polls a VkFence on its transfer lump)
                jax.block_until_ready(arr)
            except Exception as e:        # corrupt payload: park the error
                arr = e
            with self._lock:
                self._resident[key] = arr
                self._pending.discard(key)

    # --- producer side ------------------------------------------------------
    def submit(self, key, payload) -> None:
        """Enqueue a host payload (array or pytree) for device upload."""
        with self._lock:
            if key in self._pending or key in self._resident:
                return
            self._pending.add(key)
        self._q.put((key, payload))

    def request(self, key, manager, asset_id):
        """Chain AssetManager streaming into the upload queue: returns
        the device payload if resident, else schedules decode (manager
        worker pool) + upload (this thread) and returns None — the
        non-blocking request() contract of the reference asset system
        (reference: src/asset.cpp:396-425)."""
        got = self.get(key)
        if got is not None:
            return got
        with self._lock:
            if key in self._pending:
                return None
        payload = manager.request(asset_id)
        if payload is None:
            return None                   # still decoding; poll again
        self.submit(key, payload)
        return None

    # --- consumer side ------------------------------------------------------
    def ready(self, key) -> bool:
        with self._lock:
            return key in self._resident

    def get(self, key):
        """Device payload if the upload landed, else None.  Raises if
        the upload failed (parked exception)."""
        with self._lock:
            arr = self._resident.get(key)
        if isinstance(arr, Exception):
            raise arr
        return arr

    def flush(self):
        """Block until every queued upload has landed."""
        while True:
            with self._lock:
                if not self._pending:
                    return
            threading.Event().wait(0.005)

    def evict(self, key):
        with self._lock:
            self._resident.pop(key, None)

    def close(self):
        self._q.put(None)
        self._thread.join(timeout=5)
