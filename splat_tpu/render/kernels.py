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
  early exit   : per PIXEL GROUP (see below), and the whole tile stops once
                 every group is saturated

Saturation exit granularity: the tile's pixels are partitioned into
GROUP_H x GROUP_W (8 x 16) pixel blocks of 128 pixels, one sublane-slice
of the accumulators each, each with its own saturation flag kept in SMEM.
A window's (pixels x gaussians) math runs per STILL-ACTIVE group only
(@pl.when predication — the flags were written one window earlier, so the
scalar core resolves the branches without waiting on this window's VPU
work).  This is the fix for trained-scene silhouette tiles: a 32x32 tile
that mixes opaque surface (saturates after tens of pairs) with background
(never saturates) used to walk its entire multi-thousand-pair range at
full tile width because ONE unsaturated pixel kept all 1024 alive; now
the saturated surface blocks drop out and the tail of the range runs only
on the (few) background blocks.  Measured at 1M@1080p on v5e: surface
scene raster stage 37.4 -> ~17 ms; random scene also improves (partially
saturated tiles shed their covered blocks).

Alignment: Mosaic requires DMA windows 128-aligned on the lane axis, but a
tile's range [s, e) starts anywhere.  Window j covers lanes
[align128(s) + j*chunk, +chunk); pairs outside [s, e) are masked by their
global index (they belong to neighboring tiles).

This replaces the reference's per-pixel fragment/blend callbacks
(src/pipelines.rs:127-168) — there, one scalar callback per covered pixel
per gaussian; here every (pixel, gaussian) pair in a window is one lane of a
dense VPU op, with no data-dependent control flow below the group level.

DMA pipelining: window fetches run NBUF-buffered with a 2-window lookahead
issued BEFORE the current window's compute, so HBM latency hides behind
two windows of VPU work.  On saturation early-exit, in-flight fetches are
drained after the loop so no semaphore is left signaled across grid steps;
the one speculative fetch a saturated tile wastes is free bandwidth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from splat_tpu.config import RenderConfig
from splat_tpu.render.binning import FEATURE_DIM, _R15_MAX, TileBins

# Feature-window DMA buffers: lookahead 2 needs >= 3 live slots (j, j+1,
# j+2); 4 keeps rem() on a power of two.
NBUF = 4

# Pixel-group block shape for the per-group saturation exit: 8 sublanes x
# 16 pixels = 128 pixels = one minimal f32 slice of the (P, ...)
# accumulators.  8x16 keeps groups 2D-compact so an occlusion edge of any
# orientation deactivates most of them (a scanline group would only help
# horizontal edges).
GROUP_W = 16
GROUP_H = 8


def group_grid(tile_w: int, tile_h: int, subtile: bool):
    """(GY, GX, BH, BW): the tile's pixel-group decomposition.

    subtile=False (or a tile not divisible into 8x16 blocks) degrades to
    one whole-tile group — exactly the pre-group kernel behavior.
    """
    if subtile and tile_w % GROUP_W == 0 and tile_h % GROUP_H == 0 \
            and tile_w * tile_h > GROUP_W * GROUP_H:
        return tile_h // GROUP_H, tile_w // GROUP_W, GROUP_H, GROUP_W
    return 1, 1, tile_h, tile_w


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
    feat_vmem, sem, img_ref, tr_ref, act_ref,
    *, chunk: int, tile_w: int, tile_h: int, tiles_x: int, bs0: int,
    bs1: int, alpha_clamp: float, alpha_min: float,
    bg: tuple[float, float, float], color_precision, gy_n: int, gx_n: int,
    bh: int, bw: int,
):
    t = pl.program_id(0)
    s = start_ref[t]
    e = end_ref[t]
    base = (s // 128) * 128          # lane-aligned DMA base
    nchunks = (e - base + chunk - 1) // chunk
    p = bs0 * bs1                    # pixels per tile
    ng = gy_n * gx_n                 # pixel groups
    pg = p // ng                     # pixels per group
    tile_y = t // tiles_x
    tile_x = t % tiles_x

    # Per-program state: accumulators + group-active flags.  Scratch
    # persists across grid steps, so everything is (re)initialized here.
    img_ref[...] = jnp.zeros((p, 3), jnp.float32)
    tr_ref[...] = jnp.ones((p, 1), jnp.float32)
    for g in range(ng):
        act_ref[g] = 1

    # Pixel coordinates per GROUP, as (pg, 1) columns with static offsets:
    # group g = gy * gx_n + gx covers the bh x bw pixel block at
    # (gy*bh, gx*bw) within the tile; within-group index q maps to
    # (q // bw, q % bw).  The untile in rasterize_tiles inverts this.
    q_lin = jax.lax.broadcasted_iota(jnp.int32, (pg, 1), 0)
    qx = q_lin % bw
    qy = q_lin // bw

    def group_coords(g):
        gy, gx = g // gx_n, g % gx_n
        pxf = (tile_x * tile_w + gx * bw + qx).astype(jnp.float32)
        pyf = (tile_y * tile_h + gy * bh + qy).astype(jnp.float32)
        return pxf, pyf

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
        j, _ = carry
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
        # is the visibility flag, unused here).  A saturated radius field
        # (_R15_MAX) means "covers everything": its squared radius decodes
        # to +inf so the bbox compare always passes.  The conic arrives
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
        rxq = f[7:8, :] & 0x7FFF
        ryq = (f[7:8, :] >> 15) & 0x7FFF
        rx = rxq.astype(jnp.float32) * 0.125
        ry = ryq.astype(jnp.float32) * 0.125
        rx2 = jnp.where(rxq == _R15_MAX, jnp.inf, rx * rx)
        ry2 = jnp.where(ryq == _R15_MAX, jnp.inf, ry * ry)
        k_global = base + j * chunk + lane        # (1, chunk)
        # Fold the pair-range validity into the opacity ROW (1, chunk)
        # before broadcasting: lanes outside [s, e) get op=0, so they fail
        # the alpha cutoff with no (P, chunk)-wide range compares.
        op = jnp.where((k_global >= s) & (k_global < e),
                       hi16(6) * inv_u16, 0.0)

        for g in range(ng):
            @pl.when(act_ref[g] == 1)
            def _(g=g):
                pxf, pyf = group_coords(g)
                r0 = g * pg
                dx = pxf - cx                     # (pg, chunk)
                dy = cy - pyf                     # local +y up on screen
                dx_2 = dx * dx
                dy_2 = dy * dy
                power = a2 * dx_2 + c2 * dy_2 + b2 * (dx * dy)
                alpha = jnp.minimum(alpha_clamp, op * jnp.exp(power))
                # No power<=0 test: visibility gating requires
                # det(cov2d)>0 (projection.py), so the conic is PSD and
                # power<=0 always holds; the reference's check
                # (src/pipelines.rs:135) is defensive only.
                keep = (alpha >= alpha_min) & (dx_2 <= rx2) & (dy_2 <= ry2)
                alpha = jnp.where(keep, alpha, 0.0)

                t_before, t_chunk = _cumprod_excl_lanes(1.0 - alpha)
                transmit = tr_ref[r0:r0 + pg, :]
                weight = alpha * t_before         # (pg, chunk), window-local
                # Channel accumulation on the MXU: contract (pg, chunk)
                # with the (3, chunk) color rows on their lane dims (no
                # transpose) — frees ~6 VPU passes per window and overlaps
                # with the VPU's next ops.  Precision DEFAULT (one bf16
                # pass, f32 accumulation) is the measured sweet spot:
                # per-term weight rounding is ~0.4% relative but
                # contributions average down — 70.3 dB vs the oracle at
                # 800x600 on-chip (HIGHEST: 79.5 dB; threshold 45; the u16
                # color quantization already bounds the exact path).
                # HIGHEST costs ~3.8 ms/frame at 1M@1080p;
                # RenderConfig.exact_color_accum restores it.  The carried
                # transmittance multiplies the contracted (pg, 3) result —
                # one tiny op instead of a full (pg, chunk) pass on the
                # weights.
                img_ref[r0:r0 + pg, :] = (
                    img_ref[r0:r0 + pg, :]
                    + transmit * jax.lax.dot_general(
                        weight, colors, (((1,), (1,)), ((), ())),
                        precision=color_precision,
                        preferred_element_type=jnp.float32))  # (pg, 3)
                transmit = transmit * t_chunk
                tr_ref[r0:r0 + pg, :] = transmit
                # This group's flag gates NEXT window's branch; the scalar
                # core only stalls on it one window later, after this
                # window's VPU work is already issued.
                act_ref[g] = jnp.where(jnp.max(transmit) < alpha_min,
                                       0, 1).astype(jnp.int32)

        nact = act_ref[0]
        for g in range(1, ng):
            nact = nact + act_ref[g]
        return j + 1, nact

    def cond(carry):
        j, nact = carry
        return (j < nchunks) & (nact > 0)

    j_end, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(ng)))

    # Drain in-flight fetches on saturation early-exit (body j issues
    # j + 2; exiting after body j_end - 1 leaves j_end and j_end + 1
    # outstanding when they exist).
    @pl.when(j_end < nchunks)
    def _():
        dma(jax.lax.rem(j_end, NBUF), j_end).wait()

    @pl.when(j_end + 1 < nchunks)
    def _():
        dma(jax.lax.rem(j_end + 1, NBUF), j_end + 1).wait()

    img = img_ref[...]
    transmit = tr_ref[...]
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
    p = tw * th
    gy_n, gx_n, bh, bw = group_grid(tw, th, config.subtile_exit)

    kernel = functools.partial(
        _raster_kernel, chunk=chunk, tile_w=tw, tile_h=th, tiles_x=ntx,
        bs0=bs0, bs1=bs1, alpha_clamp=config.alpha_clamp,
        alpha_min=config.alpha_min, bg=tuple(config.background),
        color_precision=(jax.lax.Precision.HIGHEST
                         if config.exact_color_accum
                         else jax.lax.Precision.DEFAULT),
        gy_n=gy_n, gx_n=gx_n, bh=bh, bw=bw)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((3, 1, bs0, bs1), lambda t, *_: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, FEATURE_DIM, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.VMEM((p, 3), jnp.float32),
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.SMEM((gy_n * gx_n,), jnp.int32),
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

    # untile: (3, T, bs0, bs1) -> (H, W, 3).  Linear pixel index
    # p = sublane*bs1 + lane decomposes as (g, q) = (p // 128-ish block
    # grouping) per the kernel's group mapping: g = gy*gx_n + gx,
    # q = qy*bw + qx, pixel = (gy*bh + qy, gx*bw + qx).
    img = out.reshape(3, nty, ntx, gy_n, gx_n, bh, bw)
    img = img.transpose(1, 3, 5, 2, 4, 6, 0).reshape(
        nty * th, ntx * tw, 3)
    return img[:h, :w]
