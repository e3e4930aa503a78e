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
from splat_tpu.ops.transforms import compute_cov3d_packed, pack_cov3d


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
      radius_px: (N, 2) axis-aligned half-extents of the splat bbox in
        pixels: min(sigma_cutoff, opacity-aware cutoff) * sqrt(diag(cov2d))
        (reference src/pipelines.rs:27 uses a fixed 3σ quad; shrinking to
        the opacity-aware radius is lossless — see project_gaussians).
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
    """(N,3) world -> camera space, elementwise (no MXU dispatch: batched
    tiny matmuls are pathological on TPU — see compute_cov3d_packed)."""
    mx, my, mz = means[:, 0], means[:, 1], means[:, 2]
    out = [view[i, 0] * mx + view[i, 1] * my + view[i, 2] * mz + view[i, 3]
           for i in range(3)]
    return jnp.stack(out, axis=-1)


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
    a, b, c = ewa_project_packed(means, pack_cov3d(cov3d), view, focal,
                                 lowpass)
    row0 = jnp.stack([a, b], axis=-1)
    row1 = jnp.stack([b, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def ewa_project_packed(means, cov6, view, focal, lowpass: float):
    """Packed elementwise EWA: (N,3),(N,6) -> conic-ready (a, b, c) of the
    2D pixel-space covariance, each (N,).

    Math (reference src/gaussians.rs:114-161 == notebook cell 1 get_cov2d):
    the reference builds a row-major J whose first two COLUMNS are
    (f/tz, 0, 0) and (0, f/tz, 0); with T = W J and cov = (T^T Sigma T)
    truncated to [:2,:2], only those two columns ever reach the result —
    the perspective-skew entries J[0,2], J[1,2] land in the discarded third
    row/column (so the +-1.3 tan(fov) clamp has no observable effect; both
    reference implementations share this).  Net effect with W = R_view^T:
      cov2d = (f/tz)^2 * [u^T Sigma u, u^T Sigma v; ., v^T Sigma v]
    where u, v are the first two rows of the view rotation.

    Everything is fused multiply-adds over (N,) vectors — no MXU dispatch,
    full f32 (parity needs true f32; TPU matmul default is bf16-grade).
    """
    xx, xy, xz, yy, yz, zz = (cov6[:, i] for i in range(6))
    u = view[0, :3]
    v = view[1, :3]

    def quad(p, q):  # p^T Sigma q, elementwise over N
        return (xx * (p[0] * q[0]) + yy * (p[1] * q[1]) + zz * (p[2] * q[2])
                + xy * (p[0] * q[1] + p[1] * q[0])
                + xz * (p[0] * q[2] + p[2] * q[0])
                + yz * (p[1] * q[2] + p[2] * q[1]))

    tz = _pos_cam(means, view)[:, 2]
    s2 = (focal / tz) ** 2
    a = s2 * quad(u, u) + lowpass
    b = s2 * quad(u, v)
    c = s2 * quad(v, v) + lowpass
    return a, b, c


def project_gaussians(scene, camera: Camera,
                      config: RenderConfig) -> ProjectedGaussians:
    """All per-gaussian screen-space quantities for one frame, vectorized."""
    view = camera.view_matrix()
    proj = camera.projection_matrix()
    _, _, focal = camera.htanfovxy_focal()

    cov6 = compute_cov3d_packed(scene.quats, scene.scales)
    a, b, c = ewa_project_packed(scene.means, cov6, view, focal,
                                 config.lowpass)

    det = a * c - b * b
    det_safe = jnp.where(det > 0, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # Splat half-extents.  The reference paints a fixed sigma_cutoff (3σ)
    # quad (src/pipelines.rs:27) and lets the fragment α-test kill pixels
    # below alpha_min (src/pipelines.rs:140-143).  The final image only
    # contains pixels with α >= alpha_min, so the bbox may shrink to the
    # opacity-aware radius LOSSLESSLY: by the marginal bound
    # min_dy Q(dx, dy) = dx²/Σxx, any pixel with
    # |dx| > sqrt(Σxx · 2·ln(opacity/alpha_min)) has α < alpha_min and is
    # dropped by the kernel's own cutoff anyway.  This cuts (gaussian, tile)
    # pair counts at N-cost — the key scale-by-N lever for binning.
    opacity = jnp.asarray(scene.opacities)
    diag = jnp.maximum(jnp.stack([a, c], axis=-1), 0.0)        # (N,2)
    cut2 = jnp.asarray(config.sigma_cutoff, jnp.float32) ** 2
    if config.tight_radius:
        qmax = 2.0 * jnp.log(
            jnp.maximum(opacity / config.alpha_min, 1e-12))
        cut2 = jnp.minimum(cut2, jnp.maximum(qmax, 0.0))[:, None]
    radius = jnp.sqrt(cut2 * diag)                             # (N,2) px

    # Clip-space center -> NDC -> pixel (reference src/pipelines.rs:37-48,
    # pixel mapping notes/util.py:109-111).  Elementwise: the glm projection
    # matrix is sparse, so x_clip = P00 x, y_clip = P11 y,
    # w_clip = -z (P32 = -1) — no matmul needed.
    pos_cam = _pos_cam(scene.means, view)
    clip_x = proj[0, 0] * pos_cam[:, 0]
    clip_y = proj[1, 1] * pos_cam[:, 1]
    clip_w = -pos_cam[:, 2]
    ndc = jnp.stack([clip_x, clip_y], axis=-1) / clip_w[:, None]
    center_px = ndc_to_pixel(ndc, camera.w, camera.h)

    depth = -pos_cam[:, 2]                                     # view depth >0 in front

    # View-dependent color: SH is evaluated from the ORBITED eye — a
    # deliberate deviation from the reference, which computes ray directions
    # from the un-orbited base position (src/pipelines.rs:99 uses
    # camera.position, and camera.rs:41-68 never writes the rotated position
    # back), so its colors don't follow the orbit.  Using the true eye is
    # the physically-correct behavior; the oracle shares this convention and
    # tests/test_render_parity.py pins it at nonzero yaw.  See PARITY.md.
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
               & jnp.isfinite(center_px).all(axis=-1)
               # peak α = min(clamp, opacity·e⁰) — below alpha_min the splat
               # can never pass the kernel's cutoff at any pixel (lossless)
               & (opacity >= config.alpha_min))

    return ProjectedGaussians(depth=depth, center_px=center_px, conic=conic,
                              radius_px=radius, color=color,
                              # jnp.asarray: scenes may carry host (NumPy)
                              # leaves; downstream indexes with tracers.
                              opacity=jnp.asarray(scene.opacities),
                              visible=visible)
