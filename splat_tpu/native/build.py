"""On-demand g++ build + ctypes load of the native library."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import threading

_SRC = os.path.join(os.path.dirname(__file__), "ply_loader.cpp")
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_FAILED: str | None = None


def _build_dir() -> str:
    d = os.environ.get("SPLAT_TPU_NATIVE_DIR")
    if d:
        return d
    return os.path.join(tempfile.gettempdir(),
                        f"splat_tpu_native_{os.getuid()}")


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_build_dir(), f"ply_loader_{digest}.so")


def load_library() -> ctypes.CDLL:
    """Build (if needed) and load the native library.  Raises on failure."""
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _FAILED is not None:
            raise RuntimeError(_FAILED)
        so = _so_path()
        if not os.path.exists(so):
            os.makedirs(os.path.dirname(so), exist_ok=True)
            cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                   "-std=c++17", "-pthread", _SRC, "-o", so + ".tmp"]
            try:
                subprocess.run(cmd, check=True, capture_output=True,
                               timeout=120)
                os.replace(so + ".tmp", so)
            except (subprocess.SubprocessError, OSError) as e:
                detail = getattr(e, "stderr", b"")
                if isinstance(detail, bytes):
                    detail = detail.decode(errors="replace")
                _FAILED = f"native build failed: {e}\n{detail}"
                raise RuntimeError(_FAILED) from e
        lib = ctypes.CDLL(so)
        lib.splat_ply_query.restype = ctypes.c_longlong
        lib.splat_ply_query.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_int)]
        lib.splat_ply_last_error.restype = ctypes.c_char_p
        lib.splat_ply_read.restype = ctypes.c_int
        lib.splat_ply_read.argtypes = [ctypes.c_char_p] + \
            [ctypes.POINTER(ctypes.c_float)] * 5 + [ctypes.c_int]
        _LIB = lib
        return lib


def native_available() -> bool:
    try:
        load_library()
        return True
    except RuntimeError:
        return False
