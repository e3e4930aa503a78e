"""Pallas pair-expansion kernel: slots -> packed pair sort keys.

Expands N gaussians (each covering a rectangle of ``counts[g]`` tiles)
into a capacity-bounded array of K_cap packed sort keys — the
DuplicateWithKeys step of the INRIA tiled algorithm the reference only
describes (reference notes.md:19-42) — without any scatter, gather, or
cumsum at K scale.  Two key modes (config.binning_key, see binning.py):
rank keys (input order = depth order, key low bits = owner row) and
depth keys (any input order; key low bits = the owner's quantized depth,
plus a second output carrying the owner row as the pair sort's payload).

Why a kernel: XLA's formulation (scatter N deltas + cumsum over K) costs
~6-7 ns per scattered element on the TPU scalar core plus K-length
cumsums — ~15 ms at 1M gaussians.  Here each program owns a block of B
output slots and recovers each slot's owning gaussian by *local
comparison* against the (sorted, strictly increasing) ``first_slot``
array:

  owner(k) = the unique j with first_slot[j] <= k < first_slot[j+1]

Because first_slot is sorted, the owners of a B-slot block all lie in a
WP-wide window whose start comes from one tiny host-side searchsorted.
The kernel builds the one-hot owner matrix (B, WP) with two vectorized
compares and contracts it with the per-gaussian value rows on the MXU:

  values (8, WP) @ onehot^T (WP, B) -> (8, B)   [one bf16 matmul]

All value rows are byte-split (<= 255) so a single-pass bf16 matmul is
EXACT: one-hot entries are 0/1 (exact in bf16) and each selected value
accumulates in f32.  The per-slot decode (span -> tile coords -> packed
key) is a handful of (1, B) vector ops.

(Emitting the full per-pair FEATURE columns here and carrying them as
lax.sort payload operands was built and measured in round 2: the payload
movement through the sort network costs ~1.5 ms per f32 row at K=2.2M —
a 12-row payload sort is ~18 ms slower than the single-key sort, far
more than the ~10 ms post-sort gather it replaces.  The gather stays;
this kernel emits keys only.)

Cost: ~B*WP compares + one thin matmul per block — ~4 ms at K=2.2M vs
~15 ms for the XLA scatter path, and the kernel emits final sort keys
directly (no separate decode/tile/key stages).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output slots per inner block; owner window per block.  A B-slot block's
# owners are CWIN = 128 + B consecutive table columns: the 128-alignment
# slack (<=127) plus the <= B+1 owners a block can have.  This REQUIRES
# first_slot to be strictly increasing over every column before the
# padding tail — zero-count columns interleaved with owners would
# stretch a block's owner span past the window and silently zero its
# one-hot rows.  Rank mode guarantees it by depth-sorting (invisible
# gaussians sort to the tail); depth mode (scene order) guarantees it by
# giving every invisible gaussian one sentinel-tile fake slot
# (build_tile_bins step 1).  Rel owner indices then lie in [0, CWIN-1].  The DMA window is one
# 128-lane grain wider (WINDOW = CWIN + 128): the one-hot construction
# needs fs[j + 1] for the last owner column, and lane sizes must stay
# 128-aligned anyway.  Compares and the one-hot matmul contract over CWIN
# only — at CWIN = 384 that is 3 MXU chunks instead of the 4 a
# full-window contraction pays (measured ~0.9 ms/frame at K=2.05M).
# Per-slot compare AND matmul cost scale with CWIN, so SMALLER blocks are
# cheaper per slot; BLOCK=256 balances that against grid/DMA overhead
# (BLOCKS_PER_PROG keeps programs coarse: 4096 slots each).  Each inner
# block writes one (1, BLOCK) output row — a dynamic-sublane store with
# static lane layout, which Mosaic handles natively.
BLOCK = 256
CWIN = BLOCK + 128
WINDOW = CWIN + 128
BLOCKS_PER_PROG = 16

# The byte-split value rows force these bounds; binning falls back to the
# XLA expansion path outside them.
MAX_KCAP = (1 << 24) - 256      # first_slot must stay f32/3-byte exact
MAX_TILE_COORD = 255            # tx0 / ty0 / span_w must fit one byte


def _expand_kernel(seg_ref, total_ref, table_hbm, *rest,
                   ntx: int, bits_rank: int, num_tiles: int, n: int,
                   cull: bool, tw8: int, th8: int, key_xor: int,
                   depth_bits: int):
    if depth_bits:
        out_ref, idx_ref, win, sem = rest
    else:
        out_ref, win, sem = rest
        idx_ref = None
    prog = pl.program_id(0)
    total = total_ref[0]

    def dma(slot, blk):
        base = pl.multiple_of(seg_ref[blk], 128)
        return pltpu.make_async_copy(
            table_hbm.at[:, pl.ds(base, WINDOW)], win.at[slot],
            sem.at[slot])

    dma(0, prog * BLOCKS_PER_PROG).start()

    k_col = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0)
    k_row = jax.lax.broadcasted_iota(jnp.int32, (1, BLOCK), 1)
    j_row = jax.lax.broadcasted_iota(jnp.int32, (1, CWIN), 1)
    j_bytes = jnp.concatenate([
        (j_row & 255).astype(jnp.float32),
        (j_row >> 8).astype(jnp.float32)])              # (2, CWIN)

    def body(t, _):
        blk = prog * BLOCKS_PER_PROG + t
        slot = jax.lax.rem(t, 2)
        dma(slot, blk).wait()
        w = win[slot]                                   # (8, WINDOW) f32
        base = seg_ref[blk]
        k0 = blk * BLOCK

        @pl.when(t + 1 < BLOCKS_PER_PROG)
        def _():
            dma(jax.lax.rem(t + 1, 2), blk + 1).start()

        # first_slot reconstructed from its byte rows (exact <= 2^24).
        # All owners live in the first CWIN columns (see the constants
        # comment); only the one-hot's j+1 neighbor peeks at column CWIN,
        # so compares and the contraction run at CWIN width — one MXU
        # chunk narrower than the full DMA window.
        fs = (w[0:1, :CWIN + 1] + 256.0 * w[1:2, :CWIN + 1]
              + 65536.0 * w[2:3, :CWIN + 1])            # (1, CWIN+1)
        le = fs <= (k0 + k_col).astype(jnp.float32)     # (B, CWIN+1)
        onehot = le[:, :CWIN] & jnp.logical_not(le[:, 1:CWIN + 1])
        onehot = onehot.astype(jnp.bfloat16)            # (B, CWIN)

        # Table rows beyond the 3 first_slot byte rows carry packed
        # <= 255 pairs (a + 256*b, f32-exact <= 65535); decompose before
        # the matmul so every contracted value row stays <= 255
        # (bf16-exact).  See expand_pair_keys for each mode's layout.
        def split256(row):
            hi = jnp.floor(row * (1.0 / 256.0))
            return row - 256.0 * hi, hi

        if cull and depth_bits:
            # 3: tx0+256*d0, 4: ty0+256*d1, 5: sw+256*r8, 6: cx8+256*d2
            tx0_row, d0_row = split256(w[3:4, :CWIN])
            ty0_row, d1_row = split256(w[4:5, :CWIN])
            sw_row, r8_row = split256(w[5:6, :CWIN])
            cx8_row, d2_row = split256(w[6:7, :CWIN])
            vrows = [w[0:3, :CWIN], tx0_row, ty0_row, sw_row,
                     cx8_row, w[7:8, :CWIN], r8_row,
                     d0_row, d1_row, d2_row, j_bytes]
        elif cull:
            # 5: sw + 256*r8; 6/7: cx8/cy8
            sw_row, r8_row = split256(w[5:6, :CWIN])
            vrows = [w[0:5, :CWIN], sw_row,
                     w[6:8, :CWIN], r8_row, j_bytes]
        elif depth_bits:
            # 5: sw + 256*d2; 6/7: d0/d1
            sw_row, d2_row = split256(w[5:6, :CWIN])
            vrows = [w[0:5, :CWIN], sw_row,
                     w[6:8, :CWIN], d2_row, j_bytes]
        else:
            vrows = [w[0:6, :CWIN], j_bytes]
        values = jnp.concatenate(vrows).astype(jnp.bfloat16)
        # (R, CWIN) x (B, CWIN) contracted on dim 1 -> (R, B); single-pass
        # bf16 is exact: lhs bytes <= 255, rhs is one-hot, accum f32.
        res = jax.lax.dot_general(
            values, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        fs_o = res[0:1] + 256.0 * res[1:2] + 65536.0 * res[2:3]
        tx0 = res[3:4]
        ty0 = res[4:5]
        sw = jnp.maximum(res[5:6], 1.0)
        di = 9 if cull else 6           # depth byte rows (depth mode)
        ji = di + 3 if depth_bits else (9 if cull else 6)
        rank = base + (res[ji:ji + 1]
                       + 256.0 * res[ji + 1:ji + 2]).astype(jnp.int32)
        rank = jnp.clip(rank, 0, n - 1)

        r = (k0 + k_row).astype(jnp.float32) - fs_o     # within-span index
        # r // sw with a vector divisor is bit-serial on TPU; r < num_tiles
        # so exact f32 reciprocal math floors correctly (r < 2^22).
        dy = jnp.floor((r + 0.5) / sw)
        dx = r - dy * sw
        tile = (ty0 + dy) * float(ntx) + tx0 + dx       # exact: < 2^24
        # key_xor flips the sign bit when tile+low bits fill 32, making
        # signed sort order equal unsigned order (see binning.py); shifts
        # that overflow int31 wrap to exactly the intended bit pattern.
        # (The sentinel's high part is wrapped host-side: a Python int
        # above 2^31 - 1 cannot become an int32 constant.)
        if depth_bits:
            # depth mode: low bits = quantized depth; the gaussian index
            # rides the sort as a payload (idx_ref) instead of the key.
            low = (res[di:di + 1] + 256.0 * res[di + 1:di + 2]
                   + 65536.0 * res[di + 2:di + 3]).astype(jnp.int32)
            shift = depth_bits
        else:
            low = rank
            shift = bits_rank
        key = ((tile.astype(jnp.int32) << shift) | low) ^ key_xor
        sent_hi = (num_tiles << shift) & 0xFFFFFFFF
        if sent_hi >= 1 << 31:
            sent_hi -= 1 << 32
        sentinel = (sent_hi | low) ^ key_xor
        key = jnp.where(k0 + k_row < total, key, sentinel)
        if cull:
            # Conservative dead-pair test in 8-px units: the tile rect is
            # [8*x08, 8*(x08+tp8)) x [...], the center is within 8 px of
            # (8*cx8, 8*cy8), and r8 over-counts the kill radius by one
            # unit — so dd8^2 > (r8-1)^2 certifies alpha < alpha_min at
            # every tile pixel (lossless; the raster kernel would zero the
            # whole pair anyway).
            cx8, cy8, r8 = res[6:7], res[7:8], res[8:9]
            x08 = (tx0 + dx) * float(tw8)
            y08 = (ty0 + dy) * float(th8)
            ddx8 = jnp.maximum(jnp.maximum(
                x08 - cx8 - 1.0, cx8 - x08 - float(tw8)), 0.0)
            ddy8 = jnp.maximum(jnp.maximum(
                y08 - cy8 - 1.0, cy8 - y08 - float(th8)), 0.0)
            dead = ((ddx8 * ddx8 + ddy8 * ddy8
                     > (r8 - 1.0) * (r8 - 1.0))
                    & (r8 < 254.5))   # r8 == 255: never-cull sentinel
            key = jnp.where(dead, sentinel, key)

        out_ref[pl.ds(t, 1), :] = key
        if depth_bits:
            idx_ref[pl.ds(t, 1), :] = rank
        return 0

    jax.lax.fori_loop(0, BLOCKS_PER_PROG, body, 0, unroll=False)


def expand_pair_keys(first_slot, tx0, ty0, span_w, total, *, n: int,
                     k_cap: int, ntx: int, num_tiles: int, bits_rank: int,
                     tile_wh=(32, 32), key_xor: int = 0, cull=None,
                     depth_q=None, depth_bits: int = 0,
                     interpret: bool = False):
    """(N,) spans -> (k_cap,) packed sort keys (+ gather indices).

    first_slot: exclusive prefix sum of per-gaussian tile counts.
    tx0/ty0/span_w: tile-rect origin and width per gaussian, in the SAME
      order as first_slot (depth order for rank keys; any order — in
      practice the original scene order — for depth keys).
    total: () int32 — true pair count (slots >= min(total, k_cap) get the
      sentinel tile ``num_tiles`` so they sort to the end).
    cull: optional (cx_px, cy_px, r_cull_px) per-gaussian f32 arrays — the
      splat center and the radius beyond which alpha < alpha_min
      everywhere.  Pairs whose whole tile lies (conservatively, in 8-px
      quanta) outside that radius get the sentinel key: lossless, since
      the raster kernel's own alpha cutoff would zero them.
    depth_q/depth_bits: depth-key mode (config.binning_key == "depth").
      depth_q is the (N,) int32 per-gaussian quantized depth
      (< 2^depth_bits, depth_bits <= 24); the emitted key is
      (tile ‖ depth_q) and a SECOND (k_cap,) int32 output carries each
      slot's gaussian index (the caller's walk-order row — rides the
      pair sort as a payload and becomes the post-sort feature-gather
      index).  The three depth bytes travel in the value table packed
      as a + 256*b pairs with the <= 255 rows (f32-exact <= 65535), so
      the table stays exactly 8 rows in every mode.  Returns
      (keys, indices) instead of keys.
    Requires k_cap % (BLOCK * BLOCKS_PER_PROG) == 0, k_cap < 2^24, and
    tile coords <= 255 (callers fall back to the XLA path otherwise).
    """
    assert k_cap % (BLOCK * BLOCKS_PER_PROG) == 0
    assert tile_wh[0] % 8 == 0 and tile_wh[1] % 8 == 0
    assert (depth_q is None) == (depth_bits == 0)
    assert depth_bits <= 24
    num_blocks = k_cap // BLOCK
    n_pad = -(-(n + WINDOW) // 128) * 128

    fs_pad = jnp.full((n_pad - n,), MAX_KCAP + 128, jnp.int32)
    fs_full = jnp.concatenate([first_slot, fs_pad])
    def bytes3(v):
        return [(v & 255).astype(jnp.float32),
                ((v >> 8) & 255).astype(jnp.float32),
                (v >> 16).astype(jnp.float32)]
    def pad0(v):
        return jnp.pad(v.astype(jnp.float32), (0, n_pad - n))
    if depth_q is not None:
        d0 = (depth_q & 255).astype(jnp.float32)
        d1 = ((depth_q >> 8) & 255).astype(jnp.float32)
        d2 = ((depth_q >> 16) & 255).astype(jnp.float32)
    if cull is not None:
        cx, cy, r_cull = cull
        # NaN/inf sanitation is load-bearing: one non-finite value row
        # poisons EVERY slot of any block whose owner window contains that
        # column (0 * NaN = NaN survives the one-hot matmul) — so a single
        # degenerate splat (z ~ 0 fly-through) would corrupt up to 512
        # unrelated pairs' keys.  Non-finite -> r8 = 255 = never-cull.
        bad = ~(jnp.isfinite(cx) & jnp.isfinite(cy) & jnp.isfinite(r_cull))
        # Centers representable only in [0, 2040] px; beyond that the
        # quantized distance is not conservative (the clamp can move the
        # center PAST a tile), so disable culling for those splats too.
        bad = bad | (cx < 0.0) | (cx > 2040.0) | (cy < 0.0) | (cy > 2040.0)
        cxs = jnp.nan_to_num(cx, nan=0.0, posinf=0.0, neginf=0.0)
        cys = jnp.nan_to_num(cy, nan=0.0, posinf=0.0, neginf=0.0)
        cx8 = jnp.clip(jnp.floor(cxs * 0.125), 0.0, 255.0)
        cy8 = jnp.clip(jnp.floor(cys * 0.125), 0.0, 255.0)
        # +1 unit absorbs the ceil and the center-floor error; r8 = 255 is
        # the NEVER-CULL sentinel (the kernel requires r8 <= 254 to kill),
        # covering kill radii >= 2032 px and all 'bad' splats.
        r8 = jnp.clip(jnp.ceil(
            jnp.nan_to_num(r_cull, nan=1e9, posinf=1e9) * 0.125) + 1.0,
            1.0, 255.0)
        r8 = jnp.where(bad, 255.0, r8)
        sw_comb = span_w.astype(jnp.float32) + 256.0 * r8
        if depth_q is not None:
            # depth bytes pack into the <= 255 rows (all sums <= 65535,
            # f32-exact; the kernel splits them back out before the
            # contraction): 3: tx0+256*d0, 4: ty0+256*d1, 6: cx8+256*d2
            table = jnp.stack(bytes3(fs_full)
                              + [pad0(tx0.astype(jnp.float32) + 256.0 * d0),
                                 pad0(ty0.astype(jnp.float32) + 256.0 * d1),
                                 pad0(sw_comb),
                                 pad0(cx8 + 256.0 * d2), pad0(cy8)])
        else:
            table = jnp.stack(bytes3(fs_full)
                              + [pad0(tx0), pad0(ty0), pad0(sw_comb),
                                 pad0(cx8), pad0(cy8)])       # (8, n_pad)
    elif depth_q is not None:
        # 5: sw + 256*d2 (span_w ∈ [1, 255] so the split is exact);
        # 6/7: d0/d1
        table = jnp.stack(bytes3(fs_full)
                          + [pad0(tx0), pad0(ty0),
                             pad0(span_w.astype(jnp.float32) + 256.0 * d2),
                             pad0(d0), pad0(d1)])
    else:
        table = jnp.stack(bytes3(fs_full)
                          + [pad0(tx0), pad0(ty0), pad0(span_w)]
                          + [jnp.zeros((n_pad,), jnp.float32)] * 2)

    # Window start per block: last gaussian whose span begins at or before
    # the block's first slot, aligned down to the 128-lane DMA grain.
    starts = jnp.searchsorted(
        first_slot, jnp.arange(num_blocks, dtype=jnp.int32) * BLOCK,
        side="right").astype(jnp.int32) - 1
    seg_base = jnp.clip(starts, 0, n_pad - WINDOW) & ~127

    kernel = functools.partial(_expand_kernel, ntx=ntx,
                               bits_rank=bits_rank, num_tiles=num_tiles,
                               n=n, cull=cull is not None,
                               tw8=tile_wh[0] // 8, th8=tile_wh[1] // 8,
                               key_xor=key_xor, depth_bits=depth_bits)
    out_spec = pl.BlockSpec((BLOCKS_PER_PROG, BLOCK),
                            lambda p, *_: (p, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((num_blocks, BLOCK), jnp.int32)
    two_out = depth_q is not None
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks // BLOCKS_PER_PROG,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[out_spec, out_spec] if two_out else out_spec,
        scratch_shapes=[
            pltpu.VMEM((2, 8, WINDOW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out_shape, out_shape] if two_out else out_shape,
        interpret=interpret,
    )(seg_base, total.reshape(1), table)
    if two_out:
        key, idx = out
        return key.reshape(k_cap), idx.reshape(k_cap)
    return out.reshape(k_cap)
