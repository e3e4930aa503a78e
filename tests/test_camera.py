"""Camera math vs hand-computed glm conventions (reference src/camera.rs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from splat_tpu.camera import Camera, look_at, ndc_to_pixel, perspective


def test_look_at_matches_glm_identity_case():
    # eye at +z looking at origin with y-down up vector (COLMAP).
    view = np.asarray(look_at(jnp.array([0.0, 0.0, 3.0]),
                              jnp.zeros(3), jnp.array([0.0, -1.0, 0.0])))
    # forward f = (0,0,-1); s = cross(f, up) = (-1, 0, 0); u = cross(s,f) = (0,-1,0)
    expected = np.array([
        [-1, 0, 0, 0],
        [0, -1, 0, 0],
        [0, 0, 1, -3],
        [0, 0, 0, 1],
    ], np.float32)
    np.testing.assert_allclose(view, expected, atol=1e-6)


def test_look_at_transforms_target_to_negative_z():
    eye = jnp.array([1.0, 2.0, 3.0])
    target = jnp.array([-0.5, 0.3, 0.1])
    view = look_at(eye, target, jnp.array([0.0, -1.0, 0.0]))
    p = view @ jnp.append(target, 1.0)
    dist = np.linalg.norm(np.asarray(eye - target))
    np.testing.assert_allclose(np.asarray(p[:3]), [0, 0, -dist], atol=1e-5)
    # camera itself maps to origin
    pe = view @ jnp.append(eye, 1.0)
    np.testing.assert_allclose(np.asarray(pe[:3]), 0.0, atol=1e-5)


def test_perspective_matches_glm_rh_no():
    fovy, aspect, znear, zfar = np.pi / 2, 4 / 3, 0.01, 100.0
    p = np.asarray(perspective(fovy, aspect, znear, zfar))
    t = np.tan(fovy / 2)
    assert p[0, 0] == pytest.approx(1 / (aspect * t), rel=1e-6)
    assert p[1, 1] == pytest.approx(1 / t, rel=1e-6)
    assert p[2, 2] == pytest.approx(-(zfar + znear) / (zfar - znear), rel=1e-6)
    assert p[2, 3] == pytest.approx(-2 * zfar * znear / (zfar - znear), rel=1e-6)
    assert p[3, 2] == -1.0
    # near plane maps to z_ndc = -1, far plane to +1 (GL convention)
    near_pt = p @ np.array([0, 0, -znear, 1.0])
    far_pt = p @ np.array([0, 0, -zfar, 1.0])
    assert near_pt[2] / near_pt[3] == pytest.approx(-1.0, abs=1e-4)
    assert far_pt[2] / far_pt[3] == pytest.approx(1.0, abs=1e-4)


def test_htanfovxy_focal():
    cam = Camera.create(h=600, w=800)
    htanx, htany, focal = cam.htanfovxy_focal()
    # fovy = pi/2 -> tan = 1; focal = h/2 (reference src/camera.rs:84-89)
    assert float(htany) == pytest.approx(1.0, rel=1e-6)
    assert float(htanx) == pytest.approx(800 / 600, rel=1e-6)
    assert float(focal) == pytest.approx(300.0, rel=1e-6)


def test_orbit_yaw_rotates_about_up():
    cam = Camera.create(h=100, w=100, position=(0.0, 0.0, 3.0))
    eye0 = np.asarray(cam.eye())
    np.testing.assert_allclose(eye0, [0, 0, 3], atol=1e-6)
    # yaw by 90 degrees about up=(0,-1,0): (0,0,3) -> (-3, 0, 0)
    cam90 = cam.rotate(dyaw=np.pi / 2)
    eye90 = np.asarray(cam90.eye())
    np.testing.assert_allclose(eye90, [-3, 0, 0], atol=1e-5)
    # distance to target preserved under any yaw/pitch
    cam_rp = cam.rotate(dyaw=0.7, dpitch=0.4)
    assert np.linalg.norm(np.asarray(cam_rp.eye())) == pytest.approx(3.0, rel=1e-5)


def test_orbit_pole_guard():
    # pitch driving the view direction onto the up axis gets zeroed
    cam = Camera.create(h=10, w=10, position=(0.0, -2.9, 0.5))
    # viewdir nearly parallel to up=(0,-1,0): cos_angle close to 1
    cam = cam.rotate(dpitch=0.3)
    eye = np.asarray(cam.eye())
    assert np.all(np.isfinite(eye))


def test_reset_zeroes_angles():
    cam = Camera.create(h=10, w=10).rotate(dyaw=1.0, dpitch=-0.5).reset()
    assert float(cam.yaw) == 0.0 and float(cam.pitch) == 0.0


def test_ndc_to_pixel_yflip():
    xy = jnp.array([[0.0, 0.0], [-1.0, 1.0], [1.0, -1.0]])
    px = np.asarray(ndc_to_pixel(xy, w=800, h=600))
    np.testing.assert_allclose(px[0], [400, 300])
    np.testing.assert_allclose(px[1], [0, 0])       # top-left
    np.testing.assert_allclose(px[2], [800, 600])   # bottom-right


def test_camera_is_pytree_pose_traced():
    import jax
    cam = Camera.create(h=8, w=8)
    leaves, treedef = jax.tree.flatten(cam)
    assert len(leaves) == 8  # position, target, up, yaw, pitch, znear, zfar, fovy
    cam2 = jax.tree.unflatten(treedef, leaves)
    assert cam2.h == 8
