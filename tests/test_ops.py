"""Unit tests for per-gaussian ops vs independently computed values."""

import jax.numpy as jnp
import numpy as np
import pytest

from splat_tpu.camera import Camera
from splat_tpu.config import RenderConfig
from splat_tpu.ops.projection import ewa_project, project_gaussians
from splat_tpu.ops.sh import SH_C0, eval_sh, rgb_to_dc
from splat_tpu.ops.transforms import (compute_cov3d, pack_cov3d,
                                      quat_to_rotmat, unpack_cov3d)


def _scipy_rot(q_wxyz):
    from scipy.spatial.transform import Rotation
    w, x, y, z = q_wxyz
    return Rotation.from_quat([x, y, z, w]).as_matrix()


def test_quat_to_rotmat_identity():
    r = np.asarray(quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]])))
    np.testing.assert_allclose(r[0], np.eye(3), atol=1e-6)


def test_quat_to_rotmat_vs_scipy():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(32, 4)).astype(np.float32)
    ours = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    for i in range(32):
        expected = _scipy_rot(q[i] / np.linalg.norm(q[i]))
        np.testing.assert_allclose(ours[i], expected, atol=1e-5)


def test_quat_rotmat_unnormalized_input_normalized():
    q = jnp.array([[2.0, 0, 0, 0]])
    r = np.asarray(quat_to_rotmat(q))
    np.testing.assert_allclose(r[0], np.eye(3), atol=1e-6)


def test_cov3d_matches_r_s2_rt():
    """cov3d = R diag(s^2) R^T (reference src/gaussians.rs:101-113)."""
    rng = np.random.default_rng(1)
    q = rng.normal(size=(16, 4)).astype(np.float32)
    s = rng.uniform(0.01, 0.5, size=(16, 3)).astype(np.float32)
    got = np.asarray(compute_cov3d(jnp.asarray(q), jnp.asarray(s)))
    for i in range(16):
        r = _scipy_rot(q[i] / np.linalg.norm(q[i]))
        expected = r @ np.diag(s[i] ** 2) @ r.T
        np.testing.assert_allclose(got[i], expected, atol=1e-5)


def test_cov3d_identity_quat_is_diag():
    got = np.asarray(compute_cov3d(jnp.array([[1.0, 0, 0, 0]]),
                                   jnp.array([[0.1, 0.2, 0.3]])))
    np.testing.assert_allclose(got[0], np.diag([0.01, 0.04, 0.09]), atol=1e-7)


def test_cov6_cols_matches_packed():
    """The column form feeding DeviceScene must agree with the (N,4)/(N,3)
    entry point."""
    from splat_tpu.ops.transforms import compute_cov3d_packed, \
        compute_cov6_cols
    rng = np.random.default_rng(5)
    q = rng.normal(size=(64, 4)).astype(np.float32)
    s = rng.uniform(0.01, 0.5, size=(64, 3)).astype(np.float32)
    want = np.asarray(compute_cov3d_packed(jnp.asarray(q), jnp.asarray(s)))
    got = np.stack([np.asarray(c) for c in compute_cov6_cols(
        tuple(jnp.asarray(q[:, i]) for i in range(4)),
        tuple(jnp.asarray(s[:, i]) for i in range(3)))], axis=-1)
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-7)


def test_eval_sh_cols_matches_eval_sh():
    from splat_tpu.ops.sh import eval_sh_cols
    rng = np.random.default_rng(6)
    sh = rng.normal(size=(64, 16, 3)).astype(np.float32)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    shs = tuple(jnp.asarray(sh[:, k, c])
                for k in range(16) for c in range(3))
    for degree in range(4):
        want = np.asarray(eval_sh(jnp.asarray(sh), jnp.asarray(dirs),
                                  degree))
        r, g, b = eval_sh_cols(shs, jnp.asarray(dirs[:, 0]),
                               jnp.asarray(dirs[:, 1]),
                               jnp.asarray(dirs[:, 2]), degree)
        got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)],
                       axis=-1)
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=2e-6), degree


def test_cov3d_pack_roundtrip():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(8, 4)).astype(np.float32)
    s = rng.uniform(0.01, 0.5, size=(8, 3)).astype(np.float32)
    cov = compute_cov3d(jnp.asarray(q), jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(unpack_cov3d(pack_cov3d(cov))),
                               np.asarray(cov), atol=0)


def test_sh_dc_only():
    sh = jnp.zeros((2, 16, 3)).at[:, 0, :].set(jnp.array([1.0, 2.0, 3.0]))
    dirs = jnp.array([[0.0, 0, 1], [1.0, 0, 0]])
    c = np.asarray(eval_sh(sh, dirs, degree=0))
    expected = SH_C0 * np.array([1.0, 2.0, 3.0]) + 0.5
    np.testing.assert_allclose(c, np.tile(expected, (2, 1)), atol=1e-6)


def test_sh_degree1_signs():
    """Reference sign pattern: -C1*y*c1 + C1*z*c2 - C1*x*c3
    (src/gaussians.rs:59)."""
    sh = jnp.zeros((3, 16, 3))
    sh = sh.at[0, 1, 0].set(1.0)  # c1 -> responds to -y
    sh = sh.at[1, 2, 0].set(1.0)  # c2 -> responds to +z
    sh = sh.at[2, 3, 0].set(1.0)  # c3 -> responds to -x
    c1const = 0.4886025119029199
    dirs = jnp.array([[0.0, 1, 0], [0.0, 0, 1], [1.0, 0, 0]])
    got = np.asarray(eval_sh(sh, dirs, degree=1))
    assert got[0, 0] == pytest.approx(0.5 - c1const, abs=1e-6)
    assert got[1, 0] == pytest.approx(0.5 + c1const, abs=1e-6)
    assert got[2, 0] == pytest.approx(0.5 - c1const, abs=1e-6)


def test_sh_degree_gating_matches_reference_bands():
    """degree=2 must ignore band-3 coefficients (Rust sh_dim=15 behavior)."""
    rng = np.random.default_rng(3)
    sh = jnp.asarray(rng.normal(size=(4, 16, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    c2 = eval_sh(sh, d, degree=2)
    sh_zeroed = sh.at[:, 9:, :].set(0.0)
    c2b = eval_sh(sh_zeroed, d, degree=2)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c2b), atol=0)
    c3 = eval_sh(sh, d, degree=3)
    assert not np.allclose(np.asarray(c2), np.asarray(c3))


def test_rgb_to_dc_roundtrip():
    rgb = jnp.array([[0.2, 0.5, 0.9]])
    sh = jnp.zeros((1, 16, 3)).at[:, 0, :].set(rgb_to_dc(rgb))
    got = eval_sh(sh, jnp.array([[0.0, 0, 1]]), degree=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(rgb), atol=1e-6)


def test_ewa_project_matches_notebook_formula():
    """ewa_project == the notebook cell-1 get_cov2d math, computed naively."""
    rng = np.random.default_rng(4)
    n = 16
    means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    s = rng.uniform(0.01, 0.3, (n, 3)).astype(np.float32)
    cam = Camera.create(h=720, w=1280,
                        position=(-0.57651054, 2.99040512, -0.03924271))
    view = np.asarray(cam.view_matrix(), np.float64)
    htanx, htany, focal = (float(v) for v in cam.htanfovxy_focal())
    cov3d = compute_cov3d(jnp.asarray(q), jnp.asarray(s))
    got = np.asarray(ewa_project(jnp.asarray(means), cov3d,
                                 jnp.asarray(view, dtype=jnp.float32),
                                 htanx, htany, focal, lowpass=0.3))
    for i in range(n):
        pos_cam = view[:3, :3] @ means[i] + view[:3, 3]
        tz = pos_cam[2]
        limx, limy = 1.3 * htanx, 1.3 * htany
        tx = min(limx, max(-limx, pos_cam[0] / tz)) * tz
        ty = min(limy, max(-limy, pos_cam[1] / tz)) * tz
        J = np.array([[focal / tz, 0, -(focal * tx) / tz ** 2],
                      [0, focal / tz, -(focal * ty) / tz ** 2],
                      [0, 0, 0]])
        W = view[:3, :3].T
        T = W @ J
        c3 = np.asarray(cov3d[i], np.float64)
        cov = T.T @ c3.T @ T
        cov = cov[:2, :2] + 0.3 * np.eye(2)
        np.testing.assert_allclose(got[i], cov, rtol=2e-4, atol=2e-4)


def test_project_gaussians_shapes_and_visibility(naive_scene, demo_camera):
    proj = project_gaussians(naive_scene, demo_camera, RenderConfig())
    n = naive_scene.num_gaussians
    assert proj.depth.shape == (n,)
    assert proj.center_px.shape == (n, 2)
    assert proj.conic.shape == (n, 3)
    assert bool(proj.visible.all())
    # conic must be PSD where visible: a>0, c>0, a*c - b^2 > 0
    a, b, c = (np.asarray(proj.conic[:, i]) for i in range(3))
    assert np.all(a > 0) and np.all(c > 0) and np.all(a * c - b * b > 0)
    # all depths positive (in front of the camera)
    assert np.all(np.asarray(proj.depth) > 0)


def test_project_center_px_matches_manual(naive_scene, demo_camera):
    proj = project_gaussians(naive_scene, demo_camera, RenderConfig())
    view = np.asarray(demo_camera.view_matrix(), np.float64)
    projm = np.asarray(demo_camera.projection_matrix(), np.float64)
    means = np.asarray(naive_scene.means, np.float64)
    for i in range(4):
        p4 = np.append(view[:3, :3] @ means[i] + view[:3, 3], 1.0)
        clip = projm @ p4
        ndc = clip[:2] / clip[3]
        cx = (ndc[0] + 1) * demo_camera.w / 2
        cy = (1 - ndc[1]) * demo_camera.h / 2
        np.testing.assert_allclose(np.asarray(proj.center_px[i]), [cx, cy],
                                   rtol=1e-3, atol=1e-2)


def test_behind_camera_invisible():
    from splat_tpu.utils.fixtures import naive_gaussians
    scene = naive_gaussians()
    cam = Camera.create(h=64, w=64, position=(0.0, 0.0, 0.5),
                        target=(0.0, 0.0, 2.0))  # looking away from origin
    proj = project_gaussians(scene, cam, RenderConfig())
    vis = np.asarray(proj.visible)
    assert not vis[0]  # origin splat is behind the camera


def test_sort_gaussians_reference_order(naive_scene):
    """Back-to-front: ascending camera-space z (most negative = farthest
    first), reference src/gaussians.rs:297-306."""
    from splat_tpu.ops.sort import (camera_space_z, sort_gaussians,
                                    sort_gaussians_front_to_back)
    cam = Camera.create(h=32, w=32, position=(0.0, 0.0, 5.0))
    order = np.asarray(sort_gaussians(naive_scene, cam))
    z = np.asarray(camera_space_z(naive_scene.means, cam.view_matrix()))
    assert np.all(np.diff(z[order]) >= 0)  # ascending z = back-to-front
    f2b = np.asarray(sort_gaussians_front_to_back(naive_scene, cam))
    assert np.all(np.diff(z[f2b]) <= 0)


def test_world_to_cam_and_ndc(naive_scene):
    from splat_tpu.camera import cam_to_ndc, world_to_cam
    cam = Camera.create(h=100, w=100, position=(0.0, 0.0, 3.0))
    pc = np.asarray(world_to_cam(cam, naive_scene.means))
    assert pc.shape == (4, 3)
    # the origin splat sits 3 in front of the camera: z_cam = -3
    np.testing.assert_allclose(pc[0], [0, 0, -3], atol=1e-5)
    ndc = np.asarray(cam_to_ndc(cam, pc))
    np.testing.assert_allclose(ndc[0][:2], 0.0, atol=1e-5)
