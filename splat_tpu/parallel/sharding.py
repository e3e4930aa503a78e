"""Multi-chip rendering via jax.sharding / shard_map over a device Mesh.

The reference is strictly single-process single-thread (SURVEY §2.3: no DP /
TP / PP / comms anywhere).  The TPU engine adds two orthogonal axes of
scaling, both riding ICI via XLA collectives:

* **gaussian/tensor parallelism** (mesh axis ``"g"``): the per-gaussian
  stage (cov3d + EWA + SH — the FLOP-heavy part at large N) runs on each
  chip's shard of the gaussian arrays; the compact projected records
  (~13 f32 each vs 59 f32 of raw splat state) are then ``all_gather``-ed so
  every chip can composite in correct global depth order.  Compositing
  itself is image-parallel: each chip owns a horizontal slab of rows, so no
  further communication happens in the pixel stage.
* **data parallelism** (mesh axis ``"d"``): independent frames (cameras) of
  a trajectory batch.

Over-compositing is order-dependent across depth, which is why gaussians
cannot simply be composited shard-locally and psum-ed; the
project-local/gather-compact/composite-slab decomposition keeps the math
exact while the collective payload stays small.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from splat_tpu.camera import Camera
from splat_tpu.config import RenderConfig
from splat_tpu.ops.projection import ProjectedGaussians, project_gaussians


def make_mesh(n_data: int = 1, n_gaussian: int | None = None,
              devices=None) -> Mesh:
    """Build a (d, g) mesh.  Defaults to all devices on the gaussian axis."""
    if devices is None:
        devices = jax.devices()
    total = len(devices)
    if n_gaussian is None:
        n_gaussian = total // n_data
    if n_data * n_gaussian != total:
        raise ValueError(
            f"mesh {n_data}x{n_gaussian} != {total} devices")
    arr = np.asarray(devices).reshape(n_data, n_gaussian)
    return Mesh(arr, axis_names=("d", "g"))


def _composite_rows(proj: ProjectedGaussians, row0, h_local: int, w: int,
                    config: RenderConfig, chunk: int) -> jax.Array:
    """Front-to-back composite of already-sorted projected gaussians over a
    row slab [row0, row0 + h_local).  Mirrors render_dense's inner loop."""
    n = proj.depth.shape[0]
    py, px = jnp.mgrid[0:h_local, 0:w]
    px = px.astype(jnp.float32)
    py = py.astype(jnp.float32) + row0

    pad = (-n) % chunk
    def padded(a):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    idx = padded(jnp.arange(n)).reshape(-1, chunk)
    ok = padded(jnp.ones((n,), bool)).reshape(-1, chunk)

    def step(carry, io):
        img, transmit = carry
        i, o = io
        cx = proj.center_px[i, 0][:, None, None]
        cy = proj.center_px[i, 1][:, None, None]
        ca = proj.conic[i, 0][:, None, None]
        cb = proj.conic[i, 1][:, None, None]
        cc = proj.conic[i, 2][:, None, None]
        rx = proj.radius_px[i, 0][:, None, None]
        ry = proj.radius_px[i, 1][:, None, None]
        op = proj.opacity[i][:, None, None]
        vis = proj.visible[i][:, None, None] & o[:, None, None]
        dx = px[None] - cx
        dy = cy - py[None]
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(config.alpha_clamp, op * jnp.exp(power))
        keep = ((power <= 0) & (alpha >= config.alpha_min)
                & (jnp.abs(dx) <= rx) & (jnp.abs(dy) <= ry) & vis)
        alpha = jnp.where(keep, alpha, 0.0)
        color = jnp.clip(proj.color[i], 0.0, 1.0)
        t_within = jnp.cumprod(1.0 - alpha, axis=0)
        t_before = jnp.concatenate(
            [jnp.ones_like(t_within[:1]), t_within[:-1]], axis=0)
        contrib = jnp.einsum("khw,kc->hwc", alpha * t_before, color,
                             precision=jax.lax.Precision.HIGHEST)
        img = img + transmit[..., None] * contrib
        transmit = transmit * t_within[-1]
        return (img, transmit), None

    init = (jnp.zeros((h_local, w, 3), jnp.float32),
            jnp.ones((h_local, w), jnp.float32))
    (img, transmit), _ = jax.lax.scan(step, init, (idx, ok))
    img = img + transmit[..., None] * jnp.asarray(config.background,
                                                  jnp.float32)
    return jnp.clip(img, 0.0, 1.0)


def render_sharded(scene, camera: Camera, mesh: Mesh,
                   config: RenderConfig | None = None,
                   chunk: int = 16) -> jax.Array:
    """Single-frame render, gaussians sharded over mesh axis 'g'.

    Call under jit with ``scene`` sharded along axis 0 of every leaf
    (``P("g")``) and camera replicated.  Returns the full (H, W, 3) image
    (replicated).  H must be divisible by the 'g' axis size.
    """
    config = config or RenderConfig()
    h, w = camera.h, camera.w
    n_g = mesh.shape["g"]
    if h % n_g:
        raise ValueError(f"image height {h} not divisible by g={n_g}")
    h_local = h // n_g

    def fn(scene_local, cam):
        # --- TP stage: project only the local gaussian shard. ---
        proj_local = project_gaussians(scene_local, cam, config)
        # --- gather compact projected records to all chips (ICI). ---
        proj = jax.tree.map(
            lambda a: jax.lax.all_gather(a, "g", axis=0, tiled=True),
            proj_local)
        # --- replicated global depth sort (front-to-back). ---
        key = jnp.where(proj.visible, proj.depth, jnp.inf)
        order = jnp.argsort(key)
        proj = jax.tree.map(lambda a: a[order], proj)
        # --- image-parallel compositing: this chip's row slab. ---
        g_idx = jax.lax.axis_index("g")
        slab = _composite_rows(proj, g_idx * h_local, h_local, w,
                               config, chunk)
        # --- reassemble full image on every chip. ---
        img = jax.lax.all_gather(slab, "g", axis=0, tiled=True)
        return img

    specs = P("g")
    fn_mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: specs, scene), P()),
        out_specs=P(),
        check_vma=False)
    return fn_mapped(scene, camera)


def render_batch_sharded(scene, cameras: Camera, mesh: Mesh,
                         config: RenderConfig | None = None,
                         chunk: int = 16) -> jax.Array:
    """Trajectory batch: frames over mesh axis 'd', gaussians over 'g'.

    ``cameras`` is a batched Camera (leading frame axis on every leaf, e.g.
    from :func:`splat_tpu.camera.orbit_trajectory`); the frame count must be
    divisible by the 'd' axis size.  Returns (F, H, W, 3).
    """
    config = config or RenderConfig()

    def one_frame(scene_local, cam):
        # Identical to render_sharded's body but usable under vmap over 'd'
        # local frames.
        proj_local = project_gaussians(scene_local, cam, config)
        proj = jax.tree.map(
            lambda a: jax.lax.all_gather(a, "g", axis=0, tiled=True),
            proj_local)
        key = jnp.where(proj.visible, proj.depth, jnp.inf)
        order = jnp.argsort(key)
        proj = jax.tree.map(lambda a: a[order], proj)
        g_idx = jax.lax.axis_index("g")
        h_local = cam.h // mesh.shape["g"]
        slab = _composite_rows(proj, g_idx * h_local, h_local, cam.w,
                               config, chunk)
        return jax.lax.all_gather(slab, "g", axis=0, tiled=True)

    def fn(scene_local, cams_local):
        return jax.vmap(one_frame, in_axes=(None, 0))(scene_local,
                                                      cams_local)

    cam_specs = jax.tree.map(lambda _: P("d"), cameras)
    fn_mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("g"), scene), cam_specs),
        out_specs=P("d"),
        check_vma=False)
    return fn_mapped(scene, cameras)


def _render_slab_tiled(proj, row0, h_local: int, w: int,
                       config: RenderConfig, interpret: bool):
    """Tile-binned rasterization of a horizontal row slab [row0, row0+h_local).

    Shifts projected centers into slab coordinates and re-gates visibility to
    splats whose bbox intersects the slab, then reuses the single-device
    binning + Pallas kernel on the slab's own tile grid.
    """
    import dataclasses as _dc

    from splat_tpu.render.binning import build_tile_bins
    from splat_tpu.render.kernels import rasterize_tiles

    shift = jnp.stack([jnp.zeros_like(row0.astype(jnp.float32)),
                       row0.astype(jnp.float32)])
    center = proj.center_px - shift[None, :]
    lo_y = center[:, 1] - proj.radius_px[:, 1]
    hi_y = center[:, 1] + proj.radius_px[:, 1]
    visible = proj.visible & (hi_y > 0) & (lo_y < h_local)
    proj2 = _dc.replace(proj, center_px=center, visible=visible)
    bins = build_tile_bins(proj2, h_local, w, config)
    return rasterize_tiles(bins, h_local, w, config, interpret=interpret)


def render_sharded_tiled(scene, camera: Camera, mesh: Mesh,
                         config: RenderConfig | None = None) -> jax.Array:
    """Single-frame tile-binned render, gaussians sharded over mesh axis 'g'.

    Same project-local / all-gather-compact / composite-slab decomposition as
    :func:`render_sharded`, but each chip rasterizes its row slab with the
    production tiled Pallas kernel instead of the dense compositor.
    """
    config = config or RenderConfig()
    h, w = camera.h, camera.w
    n_g = mesh.shape["g"]
    if h % n_g:
        raise ValueError(f"image height {h} not divisible by g={n_g}")
    h_local = h // n_g
    interpret = jax.default_backend() == "cpu"

    def fn(scene_local, cam):
        proj_local = project_gaussians(scene_local, cam, config)
        proj = jax.tree.map(
            lambda a: jax.lax.all_gather(a, "g", axis=0, tiled=True),
            proj_local)
        g_idx = jax.lax.axis_index("g")
        slab = _render_slab_tiled(proj, g_idx * h_local, h_local, w,
                                  config, interpret)
        return jax.lax.all_gather(slab, "g", axis=0, tiled=True)

    fn_mapped = jax.shard_map(
        fn, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P("g"), scene), P()),
        out_specs=P(),
        check_vma=False)
    return fn_mapped(scene, camera)
