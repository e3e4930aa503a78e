"""Pallas TPU kernel: per-tile front-to-back alpha compositing.

Each grid program owns one tile_px x tile_px pixel tile and walks its
pre-sorted gaussian range front-to-back in lane-aligned windows:

  HBM --async DMA--> VMEM window (8, chunk) of packed feature-major data
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

DMA pipelining: window fetches run NBUF-buffered with a 2-window lookahead
issued BEFORE the current window's compute, so HBM latency hides behind
two windows of VPU work.  (Round 2 fix: the fetch for j+1 used to be
issued only after window j's compute and saturation check — a full
latency stall on every window, ~0.5 us x 17.6k windows at 1M@1080p.)
On saturation early-exit, in-flight fetches are drained after the loop so
no semaphore is left signaled across grid steps; the one speculative
fetch a saturated tile wastes is free bandwidth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splat_tpu.config import RenderConfig
from splat_tpu.render.binning import FEATURE_DIM, TileBins

# Feature-window DMA buffers: lookahead 2 needs >= 3 live slots (j, j+1,
# j+2); 4 keeps rem() on a power of two.
NBUF = 4


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
    *, chunk: int, tile_w: int, tile_h: int, tiles_x: int, bs0: int,
    bs1: int, alpha_clamp: float, alpha_min: float,
    bg: tuple[float, float, float], color_precision,
):
    t = pl.program_id(0)
    s = start_ref[t]
    e = end_ref[t]
    base = (s // 128) * 128          # lane-aligned DMA base
    nchunks = (e - base + chunk - 1) // chunk
    p = bs0 * bs1                    # pixels per tile

    # --- pixel coordinates as a (P, 1) column ------------------------------
    p_lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    px_loc = p_lin % tile_w
    py_loc = p_lin // tile_w
    tile_y = t // tiles_x
    tile_x = t % tiles_x
    pxf = (tile_x * tile_w + px_loc).astype(jnp.float32)    # (P, 1)
    pyf = (tile_y * tile_h + py_loc).astype(jnp.float32)

    def dma(slot, j):
        off = pl.multiple_of(base + j * chunk, 128)
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(off, chunk)],
            feat_vmem.at[slot],
            sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    @pl.when(nchunks > 1)
    def _():
        dma(1, 1).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def body(carry):
        j, img, transmit, _ = carry
        slot = jax.lax.rem(j, NBUF)
        dma(slot, j).wait()

        # Issue the fetch two windows ahead BEFORE this window's compute,
        # so its HBM latency hides behind two windows of VPU work.
        @pl.when(j + 2 < nchunks)
        def _():
            dma(jax.lax.rem(j + 2, NBUF), j + 2).start()

        f = feat_vmem[slot]                       # (FEATURE_DIM, chunk) i32

        # Decode the packed feature rows (binning.py layout) with cheap
        # (1, chunk) window-level ops: rows 0-4 are f32 bits of
        # [cx, cy, -a/2, -b, -c/2]; rows 5/6 are u16 pairs of (r, g) and
        # (b, opacity); row 7 is 15-bit (rx, ry) in 1/8-px units (bit 30
        # is the visibility flag, unused here).  The conic arrives
        # prescaled and the bbox test uses squared radii, shaving ~3
        # (P, chunk) VPU ops.
        frow = lambda i: jax.lax.bitcast_convert_type(
            f[i:i + 1, :], jnp.float32)           # (1, chunk) f32 bits
        lo16 = lambda i: (f[i:i + 1, :] & 0xFFFF).astype(jnp.float32)
        hi16 = lambda i: ((f[i:i + 1, :] >> 16) & 0xFFFF).astype(
            jnp.float32)
        cx, cy = frow(0), frow(1)
        a2, b2, c2 = frow(2), frow(3), frow(4)
        inv_u16 = 1.0 / 65535.0
        colors = jnp.concatenate(
            [lo16(5), hi16(5), lo16(6)]) * inv_u16            # (3, chunk)
        rx = (f[7:8, :] & 0x7FFF).astype(jnp.float32) * 0.125
        ry = ((f[7:8, :] >> 15) & 0x7FFF).astype(jnp.float32) * 0.125
        rx2, ry2 = rx * rx, ry * ry
        k_global = base + j * chunk + lane        # (1, chunk)
        # Fold the pair-range validity into the opacity ROW (1, chunk)
        # before broadcasting: lanes outside [s, e) get op=0, so they fail
        # the alpha cutoff with no (P, chunk)-wide range compares.
        op = jnp.where((k_global >= s) & (k_global < e),
                       hi16(6) * inv_u16, 0.0)

        dx = pxf - cx                             # (P, chunk)
        dy = cy - pyf                             # local +y up on screen
        dx_2 = dx * dx
        dy_2 = dy * dy
        power = a2 * dx_2 + c2 * dy_2 + b2 * (dx * dy)
        alpha = jnp.minimum(alpha_clamp, op * jnp.exp(power))
        # No power<=0 test here: visibility gating requires det(cov2d)>0
        # (projection.py), so the conic is PSD and power<=0 always holds;
        # the reference's check (src/pipelines.rs:135) is defensive only.
        keep = (alpha >= alpha_min) & (dx_2 <= rx2) & (dy_2 <= ry2)
        alpha = jnp.where(keep, alpha, 0.0)

        t_before, t_chunk = _cumprod_excl_lanes(1.0 - alpha)
        weight = alpha * t_before                 # (P, chunk), window-local
        # Channel accumulation on the MXU: contract (P, chunk) with the
        # (3, chunk) color rows on their lane dims (no transpose) — frees
        # ~6 VPU passes per window and overlaps with the VPU's next ops.
        # Precision DEFAULT (one bf16 pass, f32 accumulation) is the
        # measured sweet spot: per-term weight rounding is ~0.4% relative
        # but contributions average down — 70.3 dB vs the oracle at
        # 800x600 on-chip (HIGHEST: 79.5 dB; threshold 45; the u16 color
        # quantization already bounds the exact path).  HIGHEST costs
        # ~3.8 ms/frame at 1M@1080p; RenderConfig.exact_color_accum
        # restores it.  The carried transmittance multiplies the
        # contracted (P, 3) result — one tiny op instead of a full
        # (P, chunk) pass on the weights.
        img = img + transmit * jax.lax.dot_general(
            weight, colors, (((1,), (1,)), ((), ())),
            precision=color_precision,
            preferred_element_type=jnp.float32)   # (P, 3)
        transmit = transmit * t_chunk
        saturated = jnp.max(transmit) < alpha_min

        return j + 1, img, transmit, saturated

    def cond(carry):
        j, _, _, saturated = carry
        return (j < nchunks) & jnp.logical_not(saturated)

    init = (jnp.int32(0),
            jnp.zeros((p, 3), jnp.float32),
            jnp.ones((p, 1), jnp.float32),
            jnp.bool_(False))
    j_end, img, transmit, _ = jax.lax.while_loop(cond, body, init)

    # Drain in-flight fetches on saturation early-exit (body j issues
    # j + 2; exiting after body j_end - 1 leaves j_end and j_end + 1
    # outstanding when they exist).
    @pl.when(j_end < nchunks)
    def _():
        dma(jax.lax.rem(j_end, NBUF), j_end).wait()

    @pl.when(j_end + 1 < nchunks)
    def _():
        dma(jax.lax.rem(j_end + 1, NBUF), j_end + 1).wait()

    for c in range(3):
        chan = img[:, c:c + 1] + transmit * float(bg[c])
        out_ref[c, 0] = jnp.clip(chan, 0.0, 1.0).reshape(bs0, bs1)


def rasterize_tiles(bins: TileBins, h: int, w: int, config: RenderConfig,
                    *, interpret: bool = False) -> jax.Array:
    """Run the compositing kernel.  Returns float32 (H, W, 3) in [0, 1]."""
    tw, th = config.tile_w, config.tile_h
    bs0, bs1 = config.block_shape
    ntx, nty = bins.tiles_x, bins.tiles_y
    num_tiles = ntx * nty
    chunk = config.chunk

    kernel = functools.partial(
        _raster_kernel, chunk=chunk, tile_w=tw, tile_h=th, tiles_x=ntx,
        bs0=bs0, bs1=bs1, alpha_clamp=config.alpha_clamp,
        alpha_min=config.alpha_min, bg=tuple(config.background),
        color_precision=(jax.lax.Precision.HIGHEST
                         if config.exact_color_accum
                         else jax.lax.Precision.DEFAULT))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((3, 1, bs0, bs1), lambda t, *_: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, FEATURE_DIM, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
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
    # to (p // tile_w, p % tile_w) inside the tile.
    img = out.reshape(3, nty, ntx, th, tw)
    img = img.transpose(1, 3, 2, 4, 0).reshape(nty * th, ntx * tw, 3)
    return img[:h, :w]
