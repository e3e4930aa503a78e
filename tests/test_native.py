"""Native C++ PLY loader: parity with the NumPy path + error handling."""

import time

import numpy as np
import pytest

from splat_tpu.io.ply import load_ply, save_ply
from splat_tpu.utils.fixtures import random_scene

native = pytest.importorskip("splat_tpu.native")

if not native.native_available():
    pytest.skip("no C++ toolchain available", allow_module_level=True)

from splat_tpu.native.loader import NativeUnsupported, load_ply_native


@pytest.fixture(scope="module")
def ply_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("native") / "scene.ply"
    save_ply(p, random_scene(4096, seed=13))
    return str(p)


def test_native_matches_numpy(ply_file):
    a = load_ply_native(ply_file, center=False)
    b = load_ply(ply_file, center=False, native=False)
    for name in ("means", "quats", "scales", "opacities", "sh"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            rtol=1e-6, atol=1e-7, err_msg=name)


def test_native_centering(ply_file):
    a = load_ply_native(ply_file, center=True)
    np.testing.assert_allclose(np.asarray(a.means).mean(0), 0.0, atol=1e-4)


def test_native_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.ply"
    bad.write_bytes(b"\x00nope")
    with pytest.raises(NativeUnsupported):
        load_ply_native(bad)


def test_native_rejects_ascii(tmp_path):
    p = tmp_path / "a.ply"
    p.write_bytes(b"ply\nformat ascii 1.0\nelement vertex 1\n"
                  b"property float x\nproperty float y\nproperty float z\n"
                  b"property float opacity\nend_header\n0 0 0 0\n")
    with pytest.raises(NativeUnsupported, match="format"):
        load_ply_native(p)
    # the public loader falls back to NumPy and succeeds
    scene = load_ply(p, center=False)
    assert scene.num_gaussians == 1


def test_native_rejects_duplicate_f_rest(tmp_path):
    """Duplicate f_rest_N properties would leave -1 holes in the layout and
    an out-of-bounds rec[-1] read; the header parse must reject them."""
    p = tmp_path / "dup.ply"
    header = (b"ply\nformat binary_little_endian 1.0\n"
              b"element vertex 1\n"
              b"property float x\nproperty float y\nproperty float z\n"
              b"property float opacity\n"
              b"property float f_rest_0\nproperty float f_rest_0\n"
              b"property float f_rest_2\n"
              b"end_header\n")
    p.write_bytes(header + b"\x00" * (7 * 4))
    with pytest.raises(NativeUnsupported, match="duplicate"):
        load_ply_native(p)


def test_native_is_default_and_fast(ply_file):
    t0 = time.perf_counter()
    a = load_ply(ply_file, center=False)  # auto: native
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = load_ply(ply_file, center=False, native=False)
    t_numpy = time.perf_counter() - t0
    assert a.num_gaussians == b.num_gaussians
    # informational: native should not be slower by much on small files
    print(f"native={t_native * 1e3:.1f}ms numpy={t_numpy * 1e3:.1f}ms")
