"""PLY loader/writer tests: activations, layout, round-trips, errors."""

import numpy as np
import pytest

from splat_tpu.io.cache import load_npz, load_scene_cached, save_npz
from splat_tpu.io.ply import (PlyError, arrays_to_scene, load_ply,
                              read_ply_arrays, save_ply, trim_ply)
from splat_tpu.utils.fixtures import naive_gaussians, random_scene


def _write_manual_ply(path, n=3, fmt="binary_little_endian", seed=0):
    """Hand-build a 3DGS ply with known raw values; returns the raw arrays."""
    rng = np.random.default_rng(seed)
    fields = {}
    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(3)]
             + [f"f_rest_{i}" for i in range(45)]
             + ["opacity"]
             + [f"scale_{i}" for i in range(3)]
             + [f"rot_{i}" for i in range(4)])
    for name in names:
        fields[name] = rng.normal(size=n).astype(np.float32)
    header = ["ply", f"format {fmt} 1.0", f"element vertex {n}"]
    header += [f"property float {nm}" for nm in names]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if fmt == "ascii":
            for i in range(n):
                f.write((" ".join(repr(float(fields[nm][i]))
                                  for nm in names) + "\n").encode())
        else:
            rec = np.zeros(n, dtype=[(nm, "<f4") for nm in names])
            for nm in names:
                rec[nm] = fields[nm]
            f.write(rec.tobytes())
    return fields


def test_load_activations(tmp_path):
    p = tmp_path / "t.ply"
    fields = _write_manual_ply(p, n=5)
    scene = load_ply(p, center=False)
    np.testing.assert_allclose(
        np.asarray(scene.scales),
        np.exp(np.stack([fields[f"scale_{i}"] for i in range(3)], 1)),
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(scene.opacities),
        1 / (1 + np.exp(-fields["opacity"])), rtol=1e-6)
    q = np.stack([fields[f"rot_{i}"] for i in range(4)], 1)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    np.testing.assert_allclose(np.asarray(scene.quats), q, rtol=1e-5,
                               atol=1e-6)


def test_load_mean_centering(tmp_path):
    p = tmp_path / "t.ply"
    _write_manual_ply(p, n=50)
    scene = load_ply(p, center=True)
    np.testing.assert_allclose(np.asarray(scene.means).mean(0), 0.0,
                               atol=1e-5)


def test_f_rest_channel_major_transpose(tmp_path):
    """File stores 15 R coeffs, then 15 G, then 15 B
    (notes/util_gau.py:82-84)."""
    p = tmp_path / "t.ply"
    fields = _write_manual_ply(p, n=2)
    scene = load_ply(p, center=False)
    sh = np.asarray(scene.sh)
    # sh[:, 1+k, ch] == f_rest_{ch*15 + k}
    for k in (0, 7, 14):
        for ch in range(3):
            np.testing.assert_allclose(sh[:, 1 + k, ch],
                                       fields[f"f_rest_{ch * 15 + k}"],
                                       rtol=1e-6)
    np.testing.assert_allclose(sh[:, 0, 1], fields["f_dc_1"], rtol=1e-6)


def test_ascii_format(tmp_path):
    p_bin = tmp_path / "b.ply"
    p_asc = tmp_path / "a.ply"
    _write_manual_ply(p_bin, n=4, seed=3)
    _write_manual_ply(p_asc, n=4, fmt="ascii", seed=3)
    sb = load_ply(p_bin, center=False)
    sa = load_ply(p_asc, center=False)
    np.testing.assert_allclose(np.asarray(sa.means), np.asarray(sb.means),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sa.sh), np.asarray(sb.sh),
                               rtol=1e-6)


def test_save_load_roundtrip(tmp_path):
    scene = random_scene(16, seed=5)
    p = tmp_path / "rt.ply"
    save_ply(p, scene)
    back = load_ply(p, center=False)
    for name in ("means", "quats", "scales", "opacities", "sh"):
        np.testing.assert_allclose(np.asarray(getattr(back, name)),
                                   np.asarray(getattr(scene, name)),
                                   rtol=1e-4, atol=1e-5)


def test_trim(tmp_path):
    scene = random_scene(10, seed=6)
    src = tmp_path / "big.ply"
    dst = tmp_path / "small.ply"
    save_ply(src, scene)
    assert trim_ply(src, dst, count=3) == 3
    small = load_ply(dst, center=False)
    assert small.num_gaussians == 3
    np.testing.assert_allclose(np.asarray(small.means),
                               np.asarray(scene.means)[:3], rtol=1e-4,
                               atol=1e-5)


def test_empty_scene_ply_roundtrip(tmp_path):
    """A zero-gaussian scene must save, load, and trim without error
    (regressions: reshape(0, -1) in save_ply; NaN empty-slice centering;
    CLI info reductions with no identity)."""
    import warnings
    scene = random_scene(0, seed=0)
    p = tmp_path / "empty.ply"
    with warnings.catch_warnings():
        warnings.simplefilter("error")          # NaN-mean warns -> fail
        save_ply(p, scene)
        back = load_ply(p)                      # center=True path
    assert back.num_gaussians == 0
    assert trim_ply(p, tmp_path / "z.ply", count=0) == 0


def test_npz_cache_roundtrip(tmp_path):
    scene = naive_gaussians()
    p = tmp_path / "c.npz"
    save_npz(p, scene)
    back = load_npz(p)
    np.testing.assert_allclose(np.asarray(back.sh), np.asarray(scene.sh))


def test_load_scene_cached_creates_and_reuses(tmp_path):
    scene = random_scene(8, seed=8)
    ply = tmp_path / "s.ply"
    save_ply(ply, scene)
    s1 = load_scene_cached(ply, center=False)
    assert (tmp_path / "s.ply.npz").exists()
    s2 = load_scene_cached(ply, center=False)
    np.testing.assert_allclose(np.asarray(s1.means), np.asarray(s2.means))


def test_errors_are_typed(tmp_path):
    bad = tmp_path / "bad.ply"
    bad.write_bytes(b"not a ply at all")
    with pytest.raises(PlyError):
        read_ply_arrays(bad)
    trunc = tmp_path / "trunc.ply"
    trunc.write_bytes(
        b"ply\nformat binary_little_endian 1.0\nelement vertex 10\n"
        b"property float x\nend_header\n\x00\x00\x00\x00")
    with pytest.raises(PlyError, match="truncated"):
        read_ply_arrays(trunc)
    with pytest.raises(PlyError, match="missing required"):
        arrays_to_scene({"x": np.zeros(1, np.float32)})


def test_scene_pad_to():
    scene = naive_gaussians()
    padded = scene.pad_to(16)
    assert padded.num_gaussians == 16
    assert float(padded.opacities[4:].max()) == 0.0
    np.testing.assert_allclose(np.asarray(padded.means[:4]),
                               np.asarray(scene.means))


def test_obj_info_and_unknown_keywords_tolerated(tmp_path):
    """Legal obj_info lines and vendor keywords must not reject the file.

    The reference panics on header surprises (src/gaussians.rs:375-405);
    some 3DGS exporters emit obj_info, so we warn-and-skip instead.
    """
    p = tmp_path / "t.ply"
    _write_manual_ply(p, n=4)
    raw = p.read_bytes()
    head, _, payload = raw.partition(b"end_header\n")
    lines = head.decode().strip().split("\n")
    # insert benign lines after the format line
    lines.insert(2, "obj_info generated by splat_tpu test")
    lines.insert(3, "comment hello")
    lines.insert(4, "vendor_custom_keyword 42")
    p.write_bytes(("\n".join(lines) + "\nend_header\n").encode() + payload)
    import warnings as _w
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        fields = read_ply_arrays(p)
    assert fields["x"].shape == (4,)
    # obj_info/comment are silent; the unknown keyword warns
    msgs = [str(r.message) for r in rec]
    assert any("vendor_custom_keyword" in m for m in msgs)
    assert not any("obj_info" in m for m in msgs)
    scene = load_ply(p, center=False, native=False)
    assert scene.num_gaussians == 4


def test_header_fuzz_never_crashes_untyped(tmp_path):
    """Mutated/truncated headers must raise PlyError (or parse), never
    an untyped crash (IndexError, UnicodeDecodeError, struct.error...)."""
    p = tmp_path / "base.ply"
    _write_manual_ply(p, n=3)
    raw = p.read_bytes()
    rng = np.random.default_rng(7)
    mutants = []
    # truncations at every header-ish prefix length
    for cut in [0, 1, 3, 4, 10, 30, 50, len(raw) // 2, len(raw) - 1]:
        mutants.append(raw[:cut])
    # byte flips in the header region
    for _ in range(40):
        b = bytearray(raw)
        i = int(rng.integers(0, min(400, len(b))))
        b[i] = int(rng.integers(0, 256))
        mutants.append(bytes(b))
    # structured mutations
    mutants.append(raw.replace(b"element vertex 3", b"element vertex -1"))
    mutants.append(raw.replace(b"element vertex 3", b"element vertex 999999"))
    mutants.append(raw.replace(b"property float x", b"property list x"))
    mutants.append(raw.replace(b"property float x", b"property blob x"))
    mutants.append(raw.replace(b"format binary_little_endian 1.0",
                               b"format binary_martian 1.0"))
    mutants.append(b"ply\n" + b"comment spam\n" * 5 + raw[4:])
    f = tmp_path / "fuzz.ply"
    parsed = 0
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore")  # mutants legitimately warn; keep quiet
        for m in mutants:
            f.write_bytes(m)
            try:
                fields = read_ply_arrays(f)
                arrays_to_scene(fields, center=False)
                parsed += 1
            except PlyError:
                pass  # typed rejection is the contract
            except (ValueError, OverflowError) as e:
                # numpy-level rejections riding through are acceptable
                # only as ValueError subclasses with a message
                assert str(e)
    assert parsed >= 1  # the unmutated-equivalent variants still load
