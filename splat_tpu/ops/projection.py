"""EWA 3D->2D projection and per-gaussian screen-space quantities.

This is "stage A" of the frame: everything per-gaussian, fully vectorized —
the batched twin of reference src/gaussians.rs:114-161 / :473-522
(``project_cov3d_to_screen``) plus the center/bbox math the reference's quad
vertex shader performs (src/pipelines.rs:17-51), computed ONCE per gaussian
instead of once per quad corner.

Pixel-space conventions (matching the notebook oracle, notes/util.py:99-114):
the 2D covariance is expressed in *pixel* units (the EWA Jacobian is scaled by
``focal = h / (2 tan(fovy/2))``), centers map through clip -> NDC ->
``x_px = (x+1) w/2, y_px = (1-y) h/2``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from splat_tpu.camera import Camera, ndc_to_pixel
from splat_tpu.config import RenderConfig
from splat_tpu.ops.sh import eval_sh
from splat_tpu.ops.transforms import compute_cov3d


@partial(jax.tree_util.register_dataclass,
         data_fields=["depth", "center_px", "conic", "radius_px", "color",
                      "opacity", "visible"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class ProjectedGaussians:
    """Per-gaussian screen-space quantities (all (N, ...) float32).

    Attributes:
      depth: (N,) camera-space view depth (-z_cam; positive in front).
      center_px: (N, 2) splat center in pixel coordinates (x, y).
      conic: (N, 3) upper-triangle (a, b, c) of the inverse 2D covariance in
        pixel units (reference src/pipelines.rs:22-23).
      radius_px: (N, 2) axis-aligned half-extents of the sigma_cutoff bbox in
        pixels: cutoff * sqrt(diag(cov2d)) (reference src/pipelines.rs:27).
      color: (N, 3) SH-evaluated RGB (with +0.5, unclamped).
      opacity: (N,) activated opacities.
      visible: (N,) bool — in front of the near plane, finite conic, and bbox
        intersecting the screen.
    """

    depth: jax.Array
    center_px: jax.Array
    conic: jax.Array
    radius_px: jax.Array
    color: jax.Array
    opacity: jax.Array
    visible: jax.Array


def _pos_cam(means: jax.Array, view: jax.Array) -> jax.Array:
    """(N,3) world -> camera space in true f32 (no bf16 matmul lowering)."""
    return (jnp.einsum("nj,ij->ni", means, view[:3, :3],
                       precision=jax.lax.Precision.HIGHEST)
            + view[:3, 3])


def ewa_project(means: jax.Array, cov3d: jax.Array, view: jax.Array,
                htanx, htany, focal, lowpass: float) -> jax.Array:
    """Project (N,3,3) world covariances to (N,2,2) pixel-space covariances.

    Reference math (src/gaussians.rs:114-161, identically notebook cell 1
    ``get_cov2d``): camera-space position, perspective Jacobian J scaled by
    ``focal`` so the result is in pixel units, W = view[:3,:3]^T, T = W J,
    cov2d = (T^T Sigma^T T)[:2,:2] + lowpass * I.  ``htanx``/``htany`` are
    accepted for signature stability but the reference's +-1.3 tan(fov)
    clamp only affects the skew terms that the truncation discards (see
    inline comment below).
    """
    del htanx, htany  # see docstring
    pos_cam = _pos_cam(means, view)                            # (N,3)
    tz = pos_cam[:, 2]

    # The reference builds a row-major J whose first two COLUMNS are
    # (f/tz, 0, 0) and (0, f/tz, 0); with T = W J and cov = (T^T Sigma T)
    # truncated to [:2,:2], only those two columns ever reach the result —
    # the perspective-skew entries J[0,2], J[1,2] land in the discarded third
    # row/column.  (Both the Rust renderer, src/gaussians.rs:143-151, and the
    # notebook prototype, cell 1 get_cov2d, share this behavior; we match it
    # exactly.)  The +-1.3 tan(fov) clamp therefore only matters through the
    # reference's (unused here) skew terms, but we keep tz untouched as they
    # do.  Net effect: T[:, :2] = (f / tz) * W[:, :2].
    w2 = view[:3, :3].T[:, :2]                                 # (3,2) W[:, :2]
    scale = (focal / tz)                                       # (N,)
    # cov2d = scale^2 * w2^T Sigma w2.  HIGHEST precision: keep these tiny
    # contractions in true f32 (TPU default would go through bf16).
    hi = jax.lax.Precision.HIGHEST
    sig_w = jnp.einsum("nij,jk->nik", cov3d, w2, precision=hi)  # (N,3,2)
    base = jnp.einsum("ji,njk->nik", w2, sig_w, precision=hi)   # (N,2,2)
    cov2d = base * (scale * scale)[:, None, None]
    eye = jnp.eye(2, dtype=jnp.float32) * lowpass
    return cov2d + eye


def project_gaussians(scene, camera: Camera,
                      config: RenderConfig) -> ProjectedGaussians:
    """All per-gaussian screen-space quantities for one frame, vectorized."""
    view = camera.view_matrix()
    proj = camera.projection_matrix()
    htanx, htany, focal = camera.htanfovxy_focal()

    cov3d = compute_cov3d(scene.quats, scene.scales)
    cov2d = ewa_project(scene.means, cov3d, view, htanx, htany, focal,
                        config.lowpass)

    a = cov2d[:, 0, 0]
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1]
    det = a * c - b * b
    det_safe = jnp.where(det > 0, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    radius = config.sigma_cutoff * jnp.sqrt(
        jnp.maximum(jnp.stack([a, c], axis=-1), 0.0))          # (N,2) px

    # Clip-space center -> NDC -> pixel (reference src/pipelines.rs:37-48,
    # pixel mapping notes/util.py:109-111).
    hi = jax.lax.Precision.HIGHEST
    pos_cam = _pos_cam(scene.means, view)
    clip = jnp.einsum("nj,ij->ni", pos_cam, proj[:3, :3],
                      precision=hi) + proj[:3, 3]
    clip_w = jnp.einsum("nj,j->n", pos_cam, proj[3, :3],
                        precision=hi) + proj[3, 3]
    ndc = clip[:, :2] / clip_w[:, None]
    center_px = ndc_to_pixel(ndc, camera.w, camera.h)

    depth = -pos_cam[:, 2]                                     # view depth >0 in front

    # View-dependent color from the *orbited* eye (src/pipelines.rs:98-100).
    eye = camera.eye()
    raydir = scene.means - eye
    raydir = raydir / jnp.maximum(
        jnp.linalg.norm(raydir, axis=-1, keepdims=True), 1e-12)
    color = eval_sh(scene.sh, raydir, config.sh_degree)

    # Visibility: in front of near plane, positive-definite cov2d, bbox
    # overlapping the screen.  The reference has no culling (splats behind
    # the camera are clipped by euc); culling only removes zero-contribution
    # splats so parity is unaffected.
    lo = center_px - radius
    hi = center_px + radius
    visible = ((depth > camera.znear)
               & (det > 0)
               & (hi[:, 0] > 0) & (lo[:, 0] < camera.w)
               & (hi[:, 1] > 0) & (lo[:, 1] < camera.h)
               & jnp.isfinite(center_px).all(axis=-1))

    return ProjectedGaussians(depth=depth, center_px=center_px, conic=conic,
                              radius_px=radius, color=color,
                              # jnp.asarray: scenes may carry host (NumPy)
                              # leaves; downstream indexes with tracers.
                              opacity=jnp.asarray(scene.opacities),
                              visible=visible)
