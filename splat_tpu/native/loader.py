"""Native PLY loading entry point with NumPy fallback wiring."""

from __future__ import annotations

import ctypes
import os

import numpy as np

from splat_tpu.native.build import load_library
from splat_tpu.scene import GaussianScene


class NativeUnsupported(RuntimeError):
    """The file (or toolchain) isn't handled by the native fast path."""


def load_ply_native(path: str | os.PathLike, *,
                    center: bool = True,
                    num_threads: int = 0) -> GaussianScene:
    """Load a standard-schema 3DGS PLY through the C++ fast path.

    Raises NativeUnsupported for non-standard files (caller should fall back
    to :func:`splat_tpu.io.ply.load_ply`).
    """
    try:
        lib = load_library()
    except RuntimeError as e:
        raise NativeUnsupported(str(e)) from e

    pathb = os.fspath(path).encode()
    sh_rest = ctypes.c_int(0)
    n = lib.splat_ply_query(pathb, ctypes.byref(sh_rest))
    if n < 0:
        raise NativeUnsupported(lib.splat_ply_last_error().decode())
    n = int(n)
    coeffs = 1 + sh_rest.value

    means = np.empty((n, 3), np.float32)
    quats = np.empty((n, 4), np.float32)
    scales = np.empty((n, 3), np.float32)
    opac = np.empty((n,), np.float32)
    sh = np.empty((n, coeffs, 3), np.float32)

    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    rc = lib.splat_ply_read(pathb, fp(means), fp(quats), fp(scales),
                            fp(opac), fp(sh), num_threads)
    if rc != 0:
        raise NativeUnsupported(lib.splat_ply_last_error().decode())

    if center and means.shape[0] > 0:   # empty-slice mean is NaN-noise
        means -= means.mean(axis=0, keepdims=True)
    return GaussianScene.create(means=means, quats=quats, scales=scales,
                                opacities=opac, sh=sh)
