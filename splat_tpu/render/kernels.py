"""Pallas TPU kernel: per-tile front-to-back alpha compositing.

Each grid program owns one tile_px x tile_px pixel tile and walks its
pre-sorted gaussian range front-to-back in lane-aligned windows:

  HBM --async DMA--> VMEM window (16, chunk) of feature-major gaussian data
  alpha        : (P, chunk) vectorized conic evaluation (VPU), pixels on the
                 sublane axis, gaussians on the lane axis — so per-gaussian
                 rows (1, chunk) and per-pixel columns (P, 1) broadcast with
                 no transposes/relayouts
  transmittance: log-depth exclusive cumulative product along lanes
  contribution : masked weighted reductions along lanes
  early exit   : whole tile stops once max transmittance < alpha_min

Alignment: Mosaic requires DMA windows 128-aligned on the lane axis, but a
tile's range [s, e) starts anywhere.  Window j covers lanes
[align128(s) + j*chunk, +chunk); pairs outside [s, e) are masked by their
global index (they belong to neighboring tiles).

This replaces the reference's per-pixel fragment/blend callbacks
(src/pipelines.rs:127-168) — there, one scalar callback per covered pixel
per gaussian; here every (pixel, gaussian) pair in a window is one lane of a
dense VPU op, with no data-dependent control flow below the window level.

Double-buffered DMA overlaps the next window's fetch with compute; a DMA for
window j+1 is only started when the loop will actually process it, so no
semaphore is left signaled across grid steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splat_tpu.config import RenderConfig
from splat_tpu.render.binning import FEATURE_DIM, TileBins


def _cumprod_excl_lanes(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(P, C) -> (exclusive cumprod along axis 1, total product (P, 1)).

    Log-depth prefix product; C must be a power of two.
    """
    c = x.shape[1]
    assert (c & (c - 1)) == 0, f"chunk {c} must be a power of two"
    ones = jnp.ones_like(x)
    incl = x
    shift = 1
    while shift < c:
        incl = incl * jnp.concatenate(
            [ones[:, :shift], incl[:, :-shift]], axis=1)
        shift *= 2
    excl = jnp.concatenate([ones[:, :1], incl[:, :-1]], axis=1)
    return excl, incl[:, c - 1:c]


def _raster_kernel(
    # scalar prefetch
    start_ref, end_ref,
    # inputs
    feat_hbm,                       # (FEATURE_DIM, Kp) in HBM/ANY
    # outputs
    out_ref,                        # (3, 1, bs0, bs1) VMEM block
    # scratch
    feat_vmem, sem,
    *, chunk: int, tile_px: int, tiles_x: int, bs0: int, bs1: int,
    alpha_clamp: float, alpha_min: float, bg: tuple[float, float, float],
):
    t = pl.program_id(0)
    s = start_ref[t]
    e = end_ref[t]
    base = (s // 128) * 128          # lane-aligned DMA base
    nchunks = (e - base + chunk - 1) // chunk
    p = bs0 * bs1                    # pixels per tile

    # --- pixel coordinates as a (P, 1) column ------------------------------
    p_lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px_loc = p_lin % tile_px
    py_loc = p_lin // tile_px
    tile_y = t // tiles_x
    tile_x = t % tiles_x
    pxf = (tile_x * tile_px + px_loc).astype(jnp.float32)   # (P, 1)
    pyf = (tile_y * tile_px + py_loc).astype(jnp.float32)

    def dma(slot, j):
        off = pl.multiple_of(base + j * chunk, 128)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, chunk)],
            feat_vmem.at[slot],
            sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def body(carry):
        j, img, transmit, _ = carry
        slot = jax.lax.rem(j, 2)
        dma(slot, j).wait()
        f = feat_vmem[slot]                       # (FEATURE_DIM, chunk)

        row = lambda i: f[i:i + 1, :]             # (1, chunk)
        cx, cy = row(0), row(1)
        ca, cb, cc = row(2), row(3), row(4)
        rx, ry = row(9), row(10)
        k_global = base + j * chunk + lane        # (1, chunk)
        # Fold the pair-range validity into the opacity ROW (1, chunk)
        # before broadcasting: lanes outside [s, e) get op=0, so they fail
        # the alpha cutoff with no (P, chunk)-wide range compares.
        op = jnp.where((k_global >= s) & (k_global < e), row(8), 0.0)

        dx = pxf - cx                             # (P, chunk)
        dy = cy - pyf                             # local +y up on screen
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        alpha = jnp.minimum(alpha_clamp, op * jnp.exp(power))
        # No power<=0 test here: visibility gating requires det(cov2d)>0
        # (projection.py), so the conic is PSD and power<=0 always holds;
        # the reference's check (src/pipelines.rs:135) is defensive only.
        keep = ((alpha >= alpha_min)
                & (jnp.abs(dx) <= rx) & (jnp.abs(dy) <= ry))
        alpha = jnp.where(keep, alpha, 0.0)

        t_before, t_chunk = _cumprod_excl_lanes(1.0 - alpha)
        weight = alpha * t_before * transmit      # (P, chunk)
        # Channel accumulation on the MXU: contract (P, chunk) with the
        # (3, chunk) color rows on their lane dims (no transpose) — frees
        # ~6 VPU passes per window and overlaps with the VPU's next ops.
        # HIGHEST keeps f32 accuracy (TPU matmul default is bf16-grade,
        # which would burn the 45 dB parity budget).
        img = img + jax.lax.dot_general(
            weight, f[5:8, :], (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)   # (P, 3)
        transmit = transmit * t_chunk
        saturated = jnp.max(transmit) < alpha_min

        @pl.when((j + 1 < nchunks) & jnp.logical_not(saturated))
        def _():
            dma(jax.lax.rem(j + 1, 2), j + 1).start()

        return j + 1, img, transmit, saturated

    def cond(carry):
        j, _, _, saturated = carry
        return (j < nchunks) & jnp.logical_not(saturated)

    init = (jnp.int32(0),
            jnp.zeros((p, 3), jnp.float32),
            jnp.ones((p, 1), jnp.float32),
            jnp.bool_(False))
    _, img, transmit, _ = jax.lax.while_loop(cond, body, init)

    for c in range(3):
        chan = img[:, c:c + 1] + transmit * float(bg[c])
        out_ref[c, 0] = jnp.clip(chan, 0.0, 1.0).reshape(bs0, bs1)


def rasterize_tiles(bins: TileBins, h: int, w: int, config: RenderConfig,
                    *, interpret: bool = False) -> jax.Array:
    """Run the compositing kernel.  Returns float32 (H, W, 3) in [0, 1]."""
    tp = config.tile_px
    bs0, bs1 = config.block_shape
    ntx, nty = bins.tiles_x, bins.tiles_y
    num_tiles = ntx * nty
    chunk = config.chunk

    kernel = functools.partial(
        _raster_kernel, chunk=chunk, tile_px=tp, tiles_x=ntx,
        bs0=bs0, bs1=bs1, alpha_clamp=config.alpha_clamp,
        alpha_min=config.alpha_min, bg=tuple(config.background))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((3, 1, bs0, bs1), lambda t, *_: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, FEATURE_DIM, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, num_tiles, bs0, bs1),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(bins.tile_start, bins.tile_end, bins.features)

    # untile: (3, T, bs0, bs1) -> (H, W, 3).  Block pixel p = r*bs1 + c maps
    # to (p // tile_px, p % tile_px) inside the tile.
    img = out.reshape(3, nty, ntx, tp, tp)
    img = img.transpose(1, 3, 2, 4, 0).reshape(nty * tp, ntx * tp, 3)
    return img[:h, :w]
