"""render_mode="depth": alpha-weighted expected-depth maps.

The reference has no depth output; this is the 3DGS ecosystem's "expected
depth" extension.  Depth rides the per-gaussian color rows
(ops/projection.encode_depth_color), so every renderer (dense, tiled,
sharded) composites it with unchanged machinery — these tests pin that the
paths agree with each other, with the oracle, and with hand-computed
values.
"""

import jax
import numpy as np
import pytest

from splat_tpu.camera import Camera
from splat_tpu.config import RenderConfig
from splat_tpu.parallel.sharding import make_mesh, render_sharded
from splat_tpu.render.api import render_fn
from splat_tpu.render.dense import render_dense
from splat_tpu.render.oracle import render_oracle
from splat_tpu.scene import GaussianScene
from splat_tpu.utils.image import psnr


def _one_splat(depth_world: float, opacity: float = 1.0) -> GaussianScene:
    sh = np.zeros((1, 16, 3), np.float32)
    return GaussianScene.create(
        means=np.array([[0.0, 0.0, depth_world]], np.float32),
        quats=np.array([[1.0, 0, 0, 0]], np.float32),
        scales=np.full((1, 3), 0.3, np.float32),
        opacities=np.array([opacity], np.float32), sh=sh)


def test_config_validation():
    with pytest.raises(ValueError, match="render_mode"):
        RenderConfig(render_mode="normals")
    with pytest.raises(ValueError, match="depth_range"):
        RenderConfig(render_mode="depth", depth_range=(3.0, 2.0))
    with pytest.raises(ValueError, match="depth_range"):
        RenderConfig(render_mode="depth", depth_range=(0.0, np.inf))


def test_single_splat_expected_depth():
    """Analytic check: one opaque splat at view depth 4 with range (2, 6)
    composites 0.99 * 0.5 at its center pixel, and the RGBA coverage
    channel recovers the mean depth exactly."""
    scene = _one_splat(0.0)                      # camera at z=4 -> depth 4
    cam = Camera.create(h=32, w=32, position=(0.0, 0.0, 4.0))
    config = RenderConfig(render_mode="depth", depth_range=(2.0, 6.0),
                          alpha_channel=True)
    img = np.asarray(render_dense(scene, cam, config))
    assert img.shape == (32, 32, 4)
    center = img[16, 16]
    np.testing.assert_allclose(center[:3], 0.99 * 0.5, atol=1e-4)
    np.testing.assert_allclose(center[3], 0.99, atol=1e-4)
    mean_depth = center[0] / center[3]
    np.testing.assert_allclose(mean_depth, 0.5, atol=1e-4)


def test_two_splats_weighted_depth():
    """Near splat (alpha a) over far splat: expected depth is
    a*d_near + (1-a)*a'*d_far at the shared center pixel."""
    sh = np.zeros((2, 16, 3), np.float32)
    scene = GaussianScene.create(
        means=np.array([[0, 0, 1.0], [0, 0, -1.0]], np.float32),
        quats=np.tile([[1.0, 0, 0, 0]], (2, 1)).astype(np.float32),
        scales=np.full((2, 3), 0.4, np.float32),
        opacities=np.array([0.5, 0.9], np.float32), sh=sh)
    cam = Camera.create(h=32, w=32, position=(0.0, 0.0, 4.0))
    config = RenderConfig(render_mode="depth", depth_range=(2.0, 6.0))
    img = np.asarray(render_dense(scene, cam, config))
    d_near, d_far = (3.0 - 2.0) / 4.0, (5.0 - 2.0) / 4.0
    expect = 0.5 * d_near + 0.5 * 0.9 * d_far
    np.testing.assert_allclose(img[16, 16, 0], expect, atol=1e-3)


def test_dense_matches_oracle_explicit_range(small_random_scene):
    cam = Camera.create(h=96, w=96, position=(0.4, -0.3, 4.0), yaw=0.2)
    config = RenderConfig(render_mode="depth", depth_range=(1.0, 7.0))
    ours = np.asarray(render_dense(small_random_scene, cam, config))
    gold = render_oracle(small_random_scene, cam, config)
    p = psnr(ours, gold)
    assert p >= 45.0, f"PSNR {p:.2f} dB < 45"
    assert gold.std() > 0.01


def test_dense_matches_oracle_auto_range(small_random_scene):
    """Auto range: the oracle's pre-pass must reproduce the projection's
    visible-depth min/max rule exactly."""
    cam = Camera.create(h=96, w=96, position=(0.0, 0.0, 4.0))
    config = RenderConfig(render_mode="depth")
    ours = np.asarray(render_dense(small_random_scene, cam, config))
    gold = render_oracle(small_random_scene, cam, config)
    p = psnr(ours, gold)
    assert p >= 45.0, f"PSNR {p:.2f} dB < 45 (auto range drifted)"


def test_tiled_matches_dense_depth(small_random_scene):
    cam = Camera.create(h=128, w=128, position=(0.0, 0.0, 4.0))
    config = RenderConfig(render_mode="depth", alpha_channel=True)
    dense = np.asarray(render_fn("dense", config)(small_random_scene, cam))
    tiled = np.asarray(render_fn("tiled", config)(
        small_random_scene.pack_device(), cam))
    p = psnr(tiled, dense)
    assert p >= 45.0, f"PSNR {p:.2f} dB < 45"
    assert dense.shape == tiled.shape == (128, 128, 4)


def test_grayscale_channels_equal(small_random_scene):
    cam = Camera.create(h=64, w=64, position=(0.0, 0.0, 4.0))
    img = np.asarray(render_dense(small_random_scene, cam,
                                  RenderConfig(render_mode="depth")))
    # identical per-splat channel values; the color-accumulation einsum
    # may land channels in different lanes, so allow 1-ULP drift
    np.testing.assert_allclose(img[..., 0], img[..., 1], atol=1e-6)
    np.testing.assert_allclose(img[..., 0], img[..., 2], atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_sharded_requires_explicit_range(small_random_scene):
    mesh = make_mesh()
    cam = Camera.create(h=64, w=64, position=(0.0, 0.0, 4.0))
    with pytest.raises(ValueError, match="depth_range"):
        render_sharded(small_random_scene.pad_to(512), cam, mesh,
                       RenderConfig(render_mode="depth"))


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs 8 (virtual) devices")
def test_sharded_matches_dense_depth(small_random_scene):
    mesh = make_mesh()
    cam = Camera.create(h=64, w=64, position=(0.0, 0.0, 4.0))
    config = RenderConfig(render_mode="depth", depth_range=(1.0, 7.0))
    scene = small_random_scene.pad_to(512)
    sharded = np.asarray(render_sharded(scene, cam, mesh, config))
    dense = np.asarray(render_dense(scene, cam, config))
    p = psnr(sharded, dense)
    assert p >= 45.0, f"sharded vs dense depth PSNR {p:.2f} dB"
