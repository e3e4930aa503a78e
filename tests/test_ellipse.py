"""Ellipse-decomposition ops (reference src/gaussians.rs:172-243) and the
conic/bbox overlay (notebook cell 2 twin)."""

import numpy as np
import pytest

from splat_tpu.camera import Camera
from splat_tpu.config import RenderConfig
from splat_tpu.ops.ellipse import (extract_rotation_of_ellipse,
                                   extract_scale_of_covariance,
                                   extract_translation_of_ellipse,
                                   projected_covariance_of_ellipsoid)
from splat_tpu.ops.projection import project_gaussians
from splat_tpu.utils.fixtures import naive_gaussians, random_scene
from splat_tpu.utils.overlay import draw_conics_and_bbs


def test_extract_scale_matches_eigenvalues():
    rng = np.random.default_rng(0)
    for _ in range(20):
        m = rng.normal(size=(2, 2))
        cov = m @ m.T + 0.1 * np.eye(2)
        major, minor = extract_scale_of_covariance(
            cov[0, 0], cov[0, 1], cov[1, 1])
        evals = np.sort(np.linalg.eigvalsh(cov))
        assert float(major) == pytest.approx(np.sqrt(evals[1]), rel=1e-4)
        assert float(minor) == pytest.approx(np.sqrt(evals[0]), rel=1e-4)


def test_extract_rotation_diagonalizes():
    """Rotating the ellipse frame by -phi must kill the cross term."""
    rng = np.random.default_rng(1)
    for _ in range(20):
        m = rng.normal(size=(2, 2))
        cov = m @ m.T + 0.05 * np.eye(2)
        s, c = (float(v) for v in extract_rotation_of_ellipse(
            cov[0, 0], cov[0, 1], cov[1, 1]))
        assert s * s + c * c == pytest.approx(1.0, abs=1e-4)
        # the reference's convention diagonalizes via R C R^T with
        # R = [c, -s; s, c] (verified against a scalar port of
        # src/gaussians.rs:208-230)
        r = np.array([[c, -s], [s, c]])
        d = r @ cov @ r.T
        assert abs(d[0, 1]) < 1e-3 * max(1.0, abs(d[0, 0]), abs(d[1, 1]))


def test_extract_translation_center():
    """For conic3 built from a centered quadratic, center must be recovered."""
    rng = np.random.default_rng(2)
    for _ in range(10):
        m = rng.normal(size=(2, 2))
        q = m @ m.T + 0.1 * np.eye(2)  # positive definite quadratic part
        t = rng.normal(size=2)
        # implicit conic for ellipse centered at t: [Q, -Q t; ., .]
        conic3 = np.zeros((1, 3, 3))
        conic3[0, :2, :2] = q
        conic3[0, :2, 2] = -q @ t
        conic3[0, 2, :2] = -q @ t
        got = np.asarray(extract_translation_of_ellipse(conic3))[0]
        np.testing.assert_allclose(got, t, rtol=1e-4, atol=1e-5)


def test_projected_covariance_shapes():
    scene = random_scene(16, seed=3)
    cam = Camera.create(h=64, w=64, position=(0.0, 0.0, 4.0))
    cov = np.asarray(projected_covariance_of_ellipsoid(
        scene.means, scene.quats, scene.scales, cam.view_matrix()))
    assert cov.shape == (16, 3, 3)
    assert np.isfinite(cov).all()
    # symmetric by construction
    np.testing.assert_allclose(cov, np.swapaxes(cov, 1, 2), atol=1e-5)


def test_overlay_draws_visible_gaussians(demo_camera):
    scene = naive_gaussians()
    proj = project_gaussians(scene, demo_camera, RenderConfig())
    img = draw_conics_and_bbs(proj, demo_camera.h, demo_camera.w)
    assert img.shape == (demo_camera.h, demo_camera.w, 3)
    assert img.max() > 0.5  # outlines drawn
    # outlines should be sparse (an outline, not a fill)
    assert (img.max(-1) > 0).mean() < 0.2
