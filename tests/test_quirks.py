"""Quirk-reproduction flags (PARITY.md): opt-ins that reproduce the
reference's three known internal bugs bit-for-bit, for side-by-side
comparisons against the reference stacks.

* ``cov3d_transpose`` — the notebook's R^T diag(s^2) R covariance
  ordering (notes/00_Gaussian_Projection.ipynb cell 1: M = S·R,
  Sigma = M^T·M) vs the active Rust renderer's R diag(s^2) R^T
  (src/gaussians.rs:111, the default here).
* ``sh_stale_eye`` — the Rust viewer evaluates SH rays from the
  un-orbited base position (src/pipelines.rs:99 reads
  ``camera.position``, which compute_matrices never updates,
  src/camera.rs:41-68).
* ``load_ply(f_rest_layout="raw")`` — the Rust loader stores f_rest
  verbatim (sh[3+i] = f_rest_i, src/gaussians.rs:276-279),
  mis-interleaving SH bands >= 1.
"""

import numpy as np
import pytest

from splat_tpu.camera import Camera
from splat_tpu.config import RenderConfig
from splat_tpu.io.ply import load_ply, save_ply
from splat_tpu.render.dense import render_dense
from splat_tpu.render.oracle import render_oracle
from splat_tpu.utils.fixtures import random_scene
from splat_tpu.utils.image import psnr


def _np_rot(q):
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def test_cov3d_transpose_is_notebook_convention():
    """Conjugating the quaternion (the implementation trick) really does
    produce R^T diag(s^2) R, the notebook cell-1 ordering."""
    from splat_tpu.ops.transforms import compute_cov6_cols
    rng = np.random.default_rng(3)
    q = rng.normal(size=4).astype(np.float32)
    s = rng.uniform(0.5, 2.0, 3).astype(np.float32)
    rot = _np_rot(q)
    want = rot.T @ np.diag(s.astype(np.float64) ** 2) @ rot  # notebook
    qc = (np.float32(q[0]), np.float32(-q[1]),
          np.float32(-q[2]), np.float32(-q[3]))
    xx, xy, xz, yy, yz, zz = [
        float(v) for v in compute_cov6_cols(
            qc, (np.float32(s[0]), np.float32(s[1]), np.float32(s[2])))]
    got = np.array([[xx, xy, xz], [xy, yy, yz], [xz, yz, zz]])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_cov3d_transpose_renderer_matches_oracle():
    """The flag flows through projection AND the oracle identically —
    and actually changes the image for anisotropic rotated splats."""
    scene = random_scene(40, seed=11)
    cam = Camera.create(h=96, w=96, position=(0.0, 0.0, 4.0))
    cfg = RenderConfig(cov3d_transpose=True)
    ours = np.asarray(render_dense(scene, cam, cfg))
    gold = render_oracle(scene, cam, cfg)
    assert psnr(ours, gold) >= 45.0
    base = np.asarray(render_dense(scene, cam, RenderConfig()))
    assert np.abs(ours - base).max() > 1e-3, \
        "transposed cov3d should differ for rotated anisotropic splats"


def test_sh_stale_eye_matches_oracle_at_nonzero_yaw():
    scene = random_scene(40, seed=12)
    cam = Camera.create(h=96, w=96, position=(0.0, 0.0, 4.0), yaw=0.8)
    cfg = RenderConfig(sh_stale_eye=True)
    ours = np.asarray(render_dense(scene, cam, cfg))
    gold = render_oracle(scene, cam, cfg)
    assert psnr(ours, gold) >= 45.0
    base = np.asarray(render_dense(scene, cam, RenderConfig()))
    assert np.abs(ours - base).max() > 1e-4, \
        "stale-eye SH should differ from orbited-eye SH at yaw != 0"


def test_sh_stale_eye_identity_at_zero_orbit():
    """At yaw = pitch = 0 the stale and orbited eyes coincide exactly
    (src/camera.rs:41-68 rotates by zero)."""
    scene = random_scene(25, seed=13)
    cam = Camera.create(h=64, w=64, position=(0.5, -0.3, 4.0))
    a = np.asarray(render_dense(scene, cam, RenderConfig()))
    b = np.asarray(render_dense(scene, cam,
                                RenderConfig(sh_stale_eye=True)))
    np.testing.assert_array_equal(a, b)


def test_f_rest_raw_layout(tmp_path):
    """save_ply writes the file channel-major (the INRIA export layout);
    loading it raw must equal the inria load re-interleaved the way the
    Rust loader mis-reads it."""
    scene = random_scene(6, seed=14)
    p = tmp_path / "s.ply"
    save_ply(p, scene)
    inria = load_ply(p, center=False)
    raw = load_ply(p, center=False, f_rest_layout="raw")
    n = 6
    want = np.asarray(inria.sh)[:, 1:, :].transpose(0, 2, 1).reshape(
        n, 15, 3)
    np.testing.assert_allclose(np.asarray(raw.sh)[:, 1:, :], want,
                               rtol=0, atol=0)
    # DC band is f_dc, untouched by the layout flag
    np.testing.assert_allclose(np.asarray(raw.sh)[:, 0, :],
                               np.asarray(inria.sh)[:, 0, :])
    assert np.abs(want - np.asarray(inria.sh)[:, 1:, :]).max() > 1e-4

    with pytest.raises(Exception):
        load_ply(p, center=False, f_rest_layout="bogus")
