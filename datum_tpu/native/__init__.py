"""Native helper library loader.

The C++ helpers (LZ4 block codec, software occlusion raster, particle
integrator) build into libdatum_native.so on first use.  The binary is
NOT committed — it is compiled from the checked-in sources whenever it
is missing or older than them, so the loaded code always matches the
sources.  Build failures are reported once (warning), and every caller
has a pure-Python/numpy fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

_lib = None   # None = not tried, False = unavailable, else CDLL

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libdatum_native.so")


def _stale() -> bool:
    if not os.path.exists(_SO):
        return True
    so_mtime = os.path.getmtime(_SO)
    for f in os.listdir(_HERE):
        if f.endswith((".cpp", ".h")) or f == "Makefile":
            if os.path.getmtime(os.path.join(_HERE, f)) > so_mtime:
                return True
    return False


def load():
    """Return the native CDLL, building it if needed; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib or None
    if _stale():
        try:
            # build under a file lock and link to a temp name that is
            # os.rename'd into place: concurrent processes would
            # otherwise race make and can dlopen a half-written .so
            import fcntl
            lockf = open(os.path.join(_HERE, ".build.lock"), "w")
            fcntl.flock(lockf, fcntl.LOCK_EX)
            try:
                if _stale():      # re-check under the lock
                    tmp = f"libdatum_native.tmp{os.getpid()}.so"
                    res = subprocess.run(
                        ["make", "-C", _HERE, "-s", f"LIB={tmp}"],
                        capture_output=True, text=True, timeout=120)
                    if res.returncode == 0:
                        os.replace(os.path.join(_HERE, tmp), _SO)
                else:
                    res = subprocess.CompletedProcess([], 0, "", "")
            finally:
                fcntl.flock(lockf, fcntl.LOCK_UN)
                lockf.close()
            if res.returncode != 0:
                warnings.warn(
                    "datum_tpu native build failed (pure-Python fallbacks "
                    f"will be used):\n{res.stderr.strip()[-2000:]}")
                _lib = False
                return None
        except (OSError, subprocess.TimeoutExpired) as e:
            warnings.warn(f"datum_tpu native build unavailable: {e}")
            _lib = False
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        warnings.warn(f"datum_tpu native library failed to load: {e}")
        _lib = False
        return None
    lib.datum_lz4_decompress.restype = ctypes.c_long
    lib.datum_lz4_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long]
    lib.datum_lz4_compress.restype = ctypes.c_long
    lib.datum_lz4_compress.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_long), ctypes.c_void_p,
        ctypes.c_long]
    _lib = lib
    return lib


def probe(symbol: str):
    """The loaded CDLL if it exports `symbol`, else None — the shared
    tri-state helper the occlusion/particle callers used to duplicate."""
    lib = load()
    return lib if lib is not None and hasattr(lib, symbol) else None
