"""Golden-image parity: jitted renderers vs the independent NumPy oracle.

SURVEY §4's formalization of the reference's implicit test strategy: the
naive-4-gaussian scene and random scenes rendered from pinned cameras, PSNR
thresholds against the oracle (port of notebook cell-3 semantics with the
documented fixes).
"""

import jax
import numpy as np
import pytest

from splat_tpu.camera import Camera
from splat_tpu.config import RenderConfig
from splat_tpu.render.dense import render_dense
from splat_tpu.render.oracle import render_oracle
from splat_tpu.utils.fixtures import naive_gaussians, random_scene
from splat_tpu.utils.image import psnr


def test_dense_matches_oracle_naive(naive_scene, demo_camera):
    config = RenderConfig()
    ours = np.asarray(render_dense(naive_scene, demo_camera, config))
    gold = render_oracle(naive_scene, demo_camera, config)
    assert ours.shape == gold.shape == (144, 256, 3)
    p = psnr(ours, gold)
    assert p >= 45.0, f"PSNR {p:.2f} dB < 45"
    # sanity: the image actually contains the splats (not all background)
    assert gold.max() > 0.5
    assert ours.max() > 0.5


def test_dense_matches_oracle_random_scene(small_random_scene):
    cam = Camera.create(h=128, w=128, position=(0.0, 0.0, 4.0))
    config = RenderConfig()
    ours = np.asarray(render_dense(small_random_scene, cam, config))
    gold = render_oracle(small_random_scene, cam, config)
    p = psnr(ours, gold)
    assert p >= 45.0, f"PSNR {p:.2f} dB < 45"
    assert gold.std() > 0.01  # non-trivial image


def test_dense_sh_degree2_rust_mode(naive_scene, demo_camera):
    """sh_degree=2 (the Rust renderer's sh_dim=15 behavior) also matches."""
    config = RenderConfig(sh_degree=2, lowpass=0.01)
    ours = np.asarray(render_dense(naive_scene, demo_camera, config))
    gold = render_oracle(naive_scene, demo_camera, config)
    assert psnr(ours, gold) >= 45.0


def test_dense_is_jittable_and_pose_does_not_recompile(naive_scene):
    config = RenderConfig()
    f = jax.jit(lambda s, c: render_dense(s, c, config))
    cam = Camera.create(h=32, w=32)
    img1 = f(naive_scene, cam)
    n0 = f._cache_size()
    img2 = f(naive_scene, cam.rotate(dyaw=0.3))
    assert f._cache_size() == n0  # camera move must not recompile
    assert not np.allclose(np.asarray(img1), np.asarray(img2))


def test_dense_chunk_invariance(naive_scene, demo_camera):
    config = RenderConfig()
    a = np.asarray(render_dense(naive_scene, demo_camera, config, chunk=1))
    b = np.asarray(render_dense(naive_scene, demo_camera, config, chunk=16))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_background_composited():
    scene = naive_gaussians()
    cam = Camera.create(h=16, w=16, position=(0.0, 0.0, 30.0))
    config = RenderConfig(background=(1.0, 0.0, 0.0))
    img = np.asarray(render_dense(scene, cam, config))
    # corners see pure background
    np.testing.assert_allclose(img[0, 0], [1.0, 0.0, 0.0], atol=1e-5)


def test_background_matches_oracle(small_random_scene):
    """Nonzero background parity vs the oracle (fuzzer-found regression:
    the oracle used to composite onto black regardless of
    config.background, so every colored-background comparison scored
    ~8 dB while the renderers agreed with each other)."""
    cam = Camera.create(h=64, w=64, position=(1.2, 1.6, 3.7),
                        yaw=0.23, pitch=0.04)
    config = RenderConfig(background=(0.54, 0.30, 0.42))
    ours = np.asarray(render_dense(small_random_scene, cam, config))
    gold = render_oracle(small_random_scene, cam, config)
    p = psnr(ours, gold)
    assert p >= 45.0, f"PSNR {p:.2f} dB < 45"
    # the background must actually be visible somewhere (non-covered pixel)
    assert np.any(np.all(np.abs(gold - [0.54, 0.30, 0.42]) < 1e-6, axis=-1))


def test_alpha_properties(small_random_scene):
    """Property test: output in [0,1], finite, deterministic."""
    cam = Camera.create(h=64, w=64, position=(0.0, 0.0, 4.0))
    img1 = np.asarray(render_dense(small_random_scene, cam))
    img2 = np.asarray(render_dense(small_random_scene, cam))
    assert np.all(np.isfinite(img1))
    assert img1.min() >= 0.0 and img1.max() <= 1.0
    np.testing.assert_array_equal(img1, img2)


def test_back_to_front_ordering_matters():
    """Two overlapping opaque splats: the nearer one must win."""
    from splat_tpu.scene import GaussianScene
    means = np.array([[0, 0, 0], [0, 0, 1.0]], np.float32)  # second nearer
    quats = np.tile([[1, 0, 0, 0]], (2, 1)).astype(np.float32)
    scales = np.full((2, 3), 0.3, np.float32)
    sh = np.zeros((2, 16, 3), np.float32)
    sh[0, 0] = (np.array([1, 0, 0]) - 0.5) / 0.28209479177387814  # far red
    sh[1, 0] = (np.array([0, 1, 0]) - 0.5) / 0.28209479177387814  # near green
    scene = GaussianScene.create(means=means, quats=quats, scales=scales,
                                 opacities=np.ones(2, np.float32), sh=sh)
    cam = Camera.create(h=32, w=32, position=(0.0, 0.0, 3.0))
    img = np.asarray(render_dense(scene, cam))
    center = img[16, 16]
    assert center[1] > 0.8 and center[0] < 0.2  # green in front


def test_sh_eye_convention_at_nonzero_yaw(small_random_scene):
    """Pins the SH ray-direction convention (PARITY.md): rays originate at
    the ORBITED eye, a deliberate deviation from the Rust renderer (which
    uses the stale un-orbited camera.position, src/pipelines.rs:99).  The
    oracle shares the convention, so an orbited camera with sh_degree>=1
    must still hit parity — and the view-dependent color must actually
    change with yaw (proving SH follows the orbit)."""
    config = RenderConfig(sh_degree=3)
    cam0 = Camera.create(h=96, w=96, position=(0.0, 0.0, 4.0))
    cam = cam0.rotate(dyaw=np.deg2rad(40.0), dpitch=np.deg2rad(10.0))
    ours = np.asarray(render_dense(small_random_scene, cam, config))
    gold = render_oracle(small_random_scene, cam, config)
    p = psnr(ours, gold)
    assert p >= 45.0, f"PSNR {p:.2f} dB < 45 at nonzero yaw"
    # SH degree >= 1 makes color view-dependent: rendering the same scene
    # with sh_degree=0 from the same orbited pose must differ (i.e. the
    # rest bands are being evaluated along the orbited ray directions).
    flat = np.asarray(render_dense(small_random_scene, cam,
                                   RenderConfig(sh_degree=0)))
    assert not np.allclose(ours, flat, atol=1e-3)


def test_surface_scene_parity():
    from splat_tpu.utils.fixtures import surface_scene
    scene = surface_scene(400, seed=3)
    cam = Camera.create(h=96, w=96, position=(0.0, -1.0, 3.5))
    ours = np.asarray(render_dense(scene, cam))
    gold = render_oracle(scene, cam)
    p = psnr(ours, gold)
    assert p >= 45.0, f"PSNR {p:.2f}"
    assert gold.max() > 0.3
