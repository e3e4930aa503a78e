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
  early exit   : whole tile for short ranges; per PIXEL GROUP for long
                 ranges (see below)

Saturation-exit granularity is load-adaptive.  Short pair ranges walk the
tile as ONE (P, chunk) body with a whole-tile exit — zero bookkeeping
overhead, the right trade when the walk is a handful of windows.  Ranges
longer than ``subtile_heavy_pairs`` additionally get PHASE COMPACTION
(config.subtile_exit): the tile's pixels are viewed as 8 x 16 blocks of
128 rows; the walk starts at full width while per-block saturation flags
refresh every SAT_CHECK_EVERY windows, and once <= COMPACT_GROUPS blocks
remain unsaturated their rows (coords, color, transmittance) are copied
into a contiguous compact buffer and the REST of the range walks at
compact width — then the compact rows are written back once.  This is
the trained-scene silhouette-tile structure: opaque surface saturates
its blocks after tens of pairs while open background never saturates, so
one unsaturated pixel used to keep all 1024 burning VPU for tens of
thousands of pairs.  All control flow sits at the single phase boundary:
per-window per-group predication was measured at ~0.3 us/branch plus
~0.26 us fixed per 128-row body on v5e — more than the work it skips —
so the design moves pixels once instead of branching every window.

Alignment: Mosaic requires DMA windows 128-aligned on the lane axis, but a
tile's range [s, e) starts anywhere.  Window j covers lanes
[align128(s) + j*chunk, +chunk); pairs outside [s, e) are masked by their
global index (they belong to neighboring tiles).

This replaces the reference's per-pixel fragment/blend callbacks
(src/pipelines.rs:127-168) — there, one scalar callback per covered pixel
per gaussian; here every (pixel, gaussian) pair in a window is one lane of
a dense VPU op, with no data-dependent control flow below the group level.

DMA pipelining: window fetches run NBUF-buffered with a 2-window lookahead
issued BEFORE the current window's compute, so HBM latency hides behind
two windows of VPU work.  On saturation early-exit, in-flight fetches are
drained after the loop so no semaphore is left signaled across grid steps;
the one speculative fetch a saturated tile wastes is free bandwidth.
"""

from __future__ import annotations

import functools
import math

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

# Windows between group-flag re-evaluations on the heavy path: each check
# is a (pg, 1) vector max funneled to a scalar SMEM flag — cheap VPU work
# but a scalar-core sync — so it is amortized over several windows.  The
# cost is up to SAT_CHECK_EVERY - 1 windows of extra work per group after
# it saturates: noise against the hundreds-of-windows walks that take
# this path.
SAT_CHECK_EVERY = 8

# Pixel groups carried into the compact phase of a heavy tile's walk
# (COMPACT_GROUPS * 128 = 512 compact rows — a half-width tail walk).
# Measured on the surface scene at 1M@1080p: a quarter-width buffer (2
# groups) rarely engaged — silhouette tiles commonly hold 3-6 live
# groups deep into their range — while half-width qualifies most of the
# heavy tail.
COMPACT_GROUPS = 4


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
    feat_vmem, sem, img_ref, tr_ref, act_ref, cpx_ref, cpy_ref,
    cimg_ref, ctr_ref, meta_ref,
    *, chunk: int, tile_w: int, tile_h: int, tiles_x: int, bs0: int,
    bs1: int, alpha_clamp: float, alpha_min: float,
    bg: tuple[float, float, float], color_precision, gy_n: int, gx_n: int,
    bh: int, bw: int, heavy_chunks: int, transmit_mxu: bool,
    skip_bbox: bool, alpha_channel: bool,
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

    # Per-program state (scratch persists across grid steps — reinit).
    img_ref[...] = jnp.zeros((p, 3), jnp.float32)
    tr_ref[...] = jnp.ones((p, 1), jnp.float32)

    # Pixel coordinates of all P accumulator rows, computed ONCE per
    # program as (P, 1) columns; window bodies slice per group.  Linear
    # row index r = g * pg + q where group g = gy * gx_n + gx covers the
    # bh x bw pixel block at (gy*bh, gx*bw) and q maps to
    # (q // bw, q % bw); rasterize_tiles' untile inverts this mapping.
    r_lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    g_of = r_lin // pg
    q_of = r_lin % pg
    pxf_all = (tile_x * tile_w + (g_of % gx_n) * bw
               + q_of % bw).astype(jnp.float32)
    pyf_all = (tile_y * tile_h + (g_of // gx_n) * bh
               + q_of // bw).astype(jnp.float32)

    if transmit_mxu:
        # strictly-lower-triangular ones: contracting lane i of a window
        # row with column j yields the EXCLUSIVE prefix sum over i < j
        ti = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
        tj = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
        tri_excl = (ti < tj).astype(jnp.float32)

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

    def decode(f):
        """Packed feature rows (binning.py layout) -> per-window rows,
        all (1, chunk) or (3, chunk): rows 0-4 are f32 bits of
        [cx, cy, -a/2, -b, -c/2]; rows 5/6 are u16 pairs of (r, g) and
        (b, opacity); row 7 is 15-bit (rx, ry) in 1/8-px units.  A
        saturated radius field (_R15_MAX) means "covers everything": its
        squared radius decodes to +inf so the bbox compare always passes.
        The conic arrives prescaled and the bbox test uses squared radii,
        shaving ~3 (P, chunk) VPU ops."""
        frow = lambda i: jax.lax.bitcast_convert_type(
            f[i:i + 1, :], jnp.float32)           # (1, chunk) f32 bits
        lo16 = lambda i: (f[i:i + 1, :] & 0xFFFF).astype(jnp.float32)
        hi16 = lambda i: ((f[i:i + 1, :] >> 16) & 0xFFFF).astype(
            jnp.float32)
        inv_u16 = 1.0 / 65535.0
        colors = jnp.concatenate(
            [lo16(5), hi16(5), lo16(6)]) * inv_u16            # (3, chunk)
        w = dict(
            cx=frow(0), cy=frow(1), a2=frow(2), b2=frow(3), c2=frow(4),
            colors=colors,
            op_raw=hi16(6) * inv_u16)
        if not skip_bbox:     # sigma_cutoff=inf: alpha test subsumes bbox
            rxq = f[7:8, :] & 0x7FFF
            ryq = (f[7:8, :] >> 15) & 0x7FFF
            rx = rxq.astype(jnp.float32) * 0.125
            ry = ryq.astype(jnp.float32) * 0.125
            w["rx2"] = jnp.where(rxq == _R15_MAX, jnp.inf, rx * rx)
            w["ry2"] = jnp.where(ryq == _R15_MAX, jnp.inf, ry * ry)
        return w

    def composite_rows(w, op, img_t, tr_t, pxc, pyc, rows):
        """One window's front-to-back compositing of ``rows`` accumulator
        rows (img_t/tr_t refs, pxc/pyc pixel-coordinate columns); returns
        the updated transmittance."""
        dx = pxc - w["cx"]                        # (rows, chunk)
        dy = w["cy"] - pyc                        # local +y up on screen
        dx_2 = dx * dx
        dy_2 = dy * dy
        power = w["a2"] * dx_2 + w["c2"] * dy_2 + w["b2"] * (dx * dy)
        alpha = jnp.minimum(alpha_clamp, op * jnp.exp(power))
        # No power<=0 test: visibility gating requires det(cov2d)>0
        # (projection.py), so the conic is PSD and power<=0 always holds;
        # the reference's check (src/pipelines.rs:135) is defensive only.
        if skip_bbox:
            # sigma_cutoff=inf + tight_radius: the stored bbox IS the
            # (ceil-quantized, hence >=) alpha_min kill radius, so
            # alpha >= alpha_min implies |dx| <= rx and |dy| <= ry
            # (marginal bound, ops/projection.py) — the two compares and
            # two ands are statically dropped.
            keep = alpha >= alpha_min
        else:
            keep = ((alpha >= alpha_min) & (dx_2 <= w["rx2"])
                    & (dy_2 <= w["ry2"]))
        alpha = jnp.where(keep, alpha, 0.0)

        if transmit_mxu:
            # Transmittance prefix on the MXU: log-space cumsum via ONE
            # strictly-lower-triangular-ones contraction.  x is Dekker-
            # split with a bit mask (NEVER x - f32(bf16(x)): XLA's
            # excess-precision pass elides the round-trip) so two DEFAULT
            # bf16 passes are f32-exact: the triangular mask is 0/1
            # (exact in bf16) and each split part fits a bf16 mantissa.
            # Replaces the 7-level shifted-multiply prefix (~14 VPU
            # passes) with ~4 VPU passes + MXU work that overlaps.
            # alpha <= alpha_clamp (0.99) already, so log1p's argument is
            # bounded away from -1 with no extra (rows, chunk) clamp pass;
            # only guard when a caller configures alpha_clamp ~ 1.
            if alpha_clamp < 0.999999:
                x = jnp.log1p(-alpha)
            else:
                x = jnp.log1p(-jnp.minimum(alpha, 0.999999))
            xb = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(x, jnp.int32)
                & ~jnp.int32(0xFFFF),
                jnp.float32)
            xl = x - xb
            dot = lambda a_: jax.lax.dot_general(
                a_, tri_excl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s_log = dot(xb) + dot(xl)             # (rows, chunk) excl sum
            t_before = jnp.exp(s_log)
            t_chunk = jnp.exp(s_log[:, -1:] + x[:, -1:])
        else:
            t_before, t_chunk = _cumprod_excl_lanes(1.0 - alpha)
        transmit = tr_t[0:rows, :]
        weight = alpha * t_before                 # (rows, chunk)
        # Channel accumulation on the MXU: contract (rows, chunk) with
        # the (3, chunk) color rows on their lane dims (no transpose) —
        # frees ~6 VPU passes per window and overlaps with the VPU's
        # next ops.  Precision DEFAULT (one bf16 pass, f32 accumulation)
        # is the measured sweet spot — 70 dB vs the oracle on-chip
        # (HIGHEST: 79.5 dB; threshold 45); exact_color_accum restores
        # HIGHEST at ~3.8 ms/frame at 1M@1080p.  The carried
        # transmittance multiplies the contracted (rows, 3) result —
        # one tiny op instead of a full (rows, chunk) pass on the
        # weights.  (An all-VPU masked-reduction variant existed for the
        # rejected per-group walk — per-group MXU launches serialized
        # against the vector pipeline — but the shipped phase-compaction
        # design composites full-width everywhere; see the ledger.)
        contrib = jax.lax.dot_general(
            weight, w["colors"], (((1,), (1,)), ((), ())),
            precision=color_precision,
            preferred_element_type=jnp.float32)   # (rows, 3)
        img_t[0:rows, :] = img_t[0:rows, :] + transmit * contrib
        transmit = transmit * t_chunk
        tr_t[0:rows, :] = transmit
        return transmit

    def window_rows(j):
        """DMA bookkeeping + decode for window j; returns the decoded
        rows with pair-range validity folded into the opacity row: lanes
        outside [s, e) get op=0, failing the alpha cutoff with no
        (rows, chunk)-wide range compares."""
        slot = jax.lax.rem(j, NBUF)
        dma(slot, j).wait()

        # Issue the fetch two windows ahead BEFORE this window's compute,
        # so its HBM latency hides behind two windows of VPU work.
        @pl.when(j + 2 < nchunks)
        def _():
            dma(jax.lax.rem(j + 2, NBUF), j + 2).start()

        w = decode(feat_vmem[slot])
        k_global = base + j * chunk + lane        # (1, chunk)
        op = jnp.where((k_global >= s) & (k_global < e), w["op_raw"], 0.0)
        return w, op

    def drain(j_end):
        """Drain in-flight fetches on early exit (body j issues j + 2;
        exiting after body j_end - 1 leaves j_end and j_end + 1
        outstanding when they exist)."""
        @pl.when(j_end < nchunks)
        def _():
            dma(jax.lax.rem(j_end, NBUF), j_end).wait()

        @pl.when(j_end + 1 < nchunks)
        def _():
            dma(jax.lax.rem(j_end + 1, NBUF), j_end + 1).wait()

    # ---- light path: whole-tile body, whole-tile saturation exit -------
    def light_loop():
        def body(carry):
            j, _ = carry
            w, op = window_rows(j)
            transmit = composite_rows(w, op, img_ref, tr_ref,
                                      pxf_all, pyf_all, p)
            return j + 1, jnp.max(transmit) < alpha_min

        def cond(carry):
            j, saturated = carry
            return (j < nchunks) & jnp.logical_not(saturated)

        j_end, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.bool_(False)))
        drain(j_end)

    # ---- heavy path: whole-tile walk + PHASE COMPACTION ----------------
    # Two sequential loops, all control flow at the single phase boundary
    # (per-window per-group predication measured ~0.3 us/branch plus
    # ~0.26 us fixed per 128-row body on v5e — more than the work it
    # saves).  Phase 1 walks the FULL tile exactly like the light path,
    # additionally refreshing per-group saturation flags every
    # SAT_CHECK_EVERY windows; once <= COMPACT_GROUPS groups remain
    # unsaturated, their rows (pixel coords, color, transmittance) are
    # copied into a contiguous compact buffer and phase 2 walks the rest
    # of the range at compact width with zero bookkeeping.  Saturated
    # rows' state stays valid in the full accumulators; the compact rows
    # are written back once at the end.
    def heavy_loop():
        for g in range(ng):
            act_ref[g] = 1

        def body_full(carry):
            j, nact = carry
            w, op = window_rows(j)
            composite_rows(w, op, img_ref, tr_ref, pxf_all, pyf_all, p)
            check = jax.lax.rem(j, SAT_CHECK_EVERY) == SAT_CHECK_EVERY - 1

            @pl.when(check)
            def _():
                for g in range(ng):
                    act_ref[g] = jnp.where(
                        jnp.max(tr_ref[g * pg:(g + 1) * pg, :])
                        < alpha_min, 0, 1).astype(jnp.int32)

            nact2 = act_ref[0]
            for g in range(1, ng):
                nact2 = nact2 + act_ref[g]
            return j + 1, jnp.where(check, nact2, nact)

        def cond_full(carry):
            j, nact = carry
            return (j < nchunks) & (nact > COMPACT_GROUPS)

        j1, nact1 = jax.lax.while_loop(cond_full, body_full,
                                       (jnp.int32(0), jnp.int32(ng)))

        do_compact = (j1 < nchunks) & (nact1 > 0)

        @pl.when(do_compact)
        def _():
            # Gather the still-active groups' state into the compact
            # buffers.  meta_ref: [count, group_id_0, group_id_1].
            meta_ref[0] = 0
            for g in range(ng):
                @pl.when(act_ref[g] == 1)
                def _(g=g):
                    k = meta_ref[0]

                    @pl.when(k < COMPACT_GROUPS)
                    def _():
                        meta_ref[1 + k] = g
                    meta_ref[0] = k + 1
            for k in range(COMPACT_GROUPS):
                lo, hi = k * pg, (k + 1) * pg

                @pl.when(k < meta_ref[0])
                def _(k=k, lo=lo, hi=hi):
                    g = meta_ref[1 + k]
                    r0 = g * pg
                    # group g's pixel coords recomputed from its id
                    # (Mosaic cannot dynamic-slice VALUES, only refs)
                    q = jax.lax.broadcasted_iota(jnp.int32, (pg, 1), 0)
                    cpx_ref[lo:hi, :] = (
                        tile_x * tile_w + (g % gx_n) * bw
                        + q % bw).astype(jnp.float32)
                    cpy_ref[lo:hi, :] = (
                        tile_y * tile_h + (g // gx_n) * bh
                        + q // bw).astype(jnp.float32)
                    cimg_ref[lo:hi, :] = img_ref[pl.ds(r0, pg), :]
                    ctr_ref[lo:hi, :] = tr_ref[pl.ds(r0, pg), :]

                @pl.when(k >= meta_ref[0])
                def _(lo=lo, hi=hi):
                    # Padding rows: zero coords keep the alpha math
                    # finite; zero transmittance silences contributions
                    # AND the saturation check (never written back).
                    cpx_ref[lo:hi, :] = jnp.zeros((pg, 1), jnp.float32)
                    cpy_ref[lo:hi, :] = jnp.zeros((pg, 1), jnp.float32)
                    cimg_ref[lo:hi, :] = jnp.zeros((pg, 3), jnp.float32)
                    ctr_ref[lo:hi, :] = jnp.zeros((pg, 1), jnp.float32)

        cpx = cpx_ref[...]
        cpy = cpy_ref[...]

        def body_c(carry):
            j, alive = carry
            w, op = window_rows(j)
            transmit = composite_rows(w, op, cimg_ref, ctr_ref, cpx, cpy,
                                      COMPACT_GROUPS * pg)
            sat = jnp.max(transmit) < alpha_min
            return j + 1, jnp.where(sat, jnp.int32(0), alive)

        def cond_c(carry):
            j, alive = carry
            return (j < nchunks) & (alive > 0)

        j2, _ = jax.lax.while_loop(
            cond_c, body_c,
            (j1, jnp.where(do_compact, jnp.int32(1), jnp.int32(0))))

        @pl.when(do_compact)
        def _():
            for k in range(COMPACT_GROUPS):
                lo, hi = k * pg, (k + 1) * pg

                @pl.when(k < meta_ref[0])
                def _(k=k, lo=lo, hi=hi):
                    g = meta_ref[1 + k]
                    img_ref[pl.ds(g * pg, pg), :] = cimg_ref[lo:hi, :]
                    tr_ref[pl.ds(g * pg, pg), :] = ctr_ref[lo:hi, :]

        drain(j2)

    if ng == 1:
        light_loop()
    else:
        heavy = nchunks > heavy_chunks

        @pl.when(jnp.logical_not(heavy))
        def _():
            light_loop()

        @pl.when(heavy)
        def _():
            heavy_loop()

    img = img_ref[...]
    transmit = tr_ref[...]
    for c in range(3):
        chan = img[:, c:c + 1] + transmit * float(bg[c])
        out_ref[c, 0] = jnp.clip(chan, 0.0, 1.0).reshape(bs0, bs1)
    if alpha_channel:
        # accumulated coverage (notebook semantics; see config.py) — NOT
        # the reference's last-fragment alpha byte
        out_ref[3, 0] = jnp.clip(1.0 - transmit, 0.0, 1.0).reshape(bs0, bs1)


def rasterize_tiles(bins: TileBins, h: int, w: int, config: RenderConfig,
                    *, interpret: bool = False,
                    _raw: bool = False) -> jax.Array:
    """Run the compositing kernel.  Returns float32 (H, W, 3) in [0, 1]
    (or (H, W, 4) with config.alpha_channel: RGB + accumulated 1 - T).

    _raw: return the kernel's native (C, tiles, bs0, bs1) output without
      the untile relayout — profiling hook (scripts/devtime.py --stage
      raster) for splitting kernel cost from the XLA untile transpose."""
    tw, th = config.tile_w, config.tile_h
    bs0, bs1 = config.block_shape
    ntx, nty = bins.tiles_x, bins.tiles_y
    num_tiles = ntx * nty
    chunk = config.chunk
    p = tw * th
    gy_n, gx_n, bh, bw = group_grid(tw, th, config.subtile_exit)
    cg_pg = p // (gy_n * gx_n)   # rows per pixel group
    # Phase-compaction scratch is only reachable when the tile decomposes
    # into >1 pixel group (ng > 1); the default whole-tile path would
    # otherwise still reserve ~4*p rows of dead VMEM per program.
    cg_rows = COMPACT_GROUPS * cg_pg if gy_n * gx_n > 1 else 8

    kernel = functools.partial(
        _raster_kernel, chunk=chunk, tile_w=tw, tile_h=th, tiles_x=ntx,
        bs0=bs0, bs1=bs1, alpha_clamp=config.alpha_clamp,
        alpha_min=config.alpha_min, bg=tuple(config.background),
        color_precision=(jax.lax.Precision.HIGHEST
                         if config.exact_color_accum
                         else jax.lax.Precision.DEFAULT),
        gy_n=gy_n, gx_n=gx_n, bh=bh, bw=bw,
        heavy_chunks=-(-config.subtile_heavy_pairs // chunk),
        transmit_mxu=config.transmit_mxu,
        skip_bbox=not math.isfinite(config.sigma_cutoff),
        alpha_channel=config.alpha_channel)
    nchan = 4 if config.alpha_channel else 3

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((nchan, 1, bs0, bs1),
                               lambda t, *_: (0, t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NBUF, FEATURE_DIM, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.VMEM((p, 3), jnp.float32),
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.SMEM((gy_n * gx_n,), jnp.int32),
            pltpu.VMEM((cg_rows, 1), jnp.float32),
            pltpu.VMEM((cg_rows, 1), jnp.float32),
            pltpu.VMEM((cg_rows, 3), jnp.float32),
            pltpu.VMEM((cg_rows, 1), jnp.float32),
            pltpu.SMEM((1 + COMPACT_GROUPS,), jnp.int32),
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nchan, num_tiles, bs0, bs1),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(bins.tile_start, bins.tile_end, bins.features)
    if _raw:
        return out

    # untile: (C, T, bs0, bs1) -> (H, W, C).  Linear pixel index
    # r = sublane*bs1 + lane decomposes per the kernel's group mapping:
    # (g, q) = (r // pg, r % pg), pixel = (gy*bh + q//bw, gx*bw + q%bw).
    img = out.reshape(nchan, nty, ntx, gy_n, gx_n, bh, bw)
    img = img.transpose(1, 3, 5, 2, 4, 6, 0).reshape(
        nty * th, ntx * tw, nchan)
    return img[:h, :w]
