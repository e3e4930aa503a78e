"""Stage B: tile binning — (gaussian, tile) pair expansion + ordering.

This is the INRIA-style tiled decomposition the reference *describes* but
never built (reference notes.md:19-42: DuplicateWithKeys, radix sort,
per-tile ranges), reformulated for XLA's static shapes:

1. depth-sort the N projected gaussians once (front-to-back);
2. each visible gaussian covers a rectangle of tiles derived from its
   sigma_cutoff bbox; per-gaussian pair counts -> exclusive prefix sum;
3. expand to a capacity-bounded slot array WITHOUT scatter-per-pair: a
   single scatter-add of N ones at each gaussian's first slot followed by a
   cumulative sum yields the slot->depth-rank map in O(K + N);
4. ONE unstable sort on packed (tile id ‖ depth rank) uint keys groups
   pairs per tile with exact front-to-back order inside each tile (ranks
   are unique and depth-ascending), replacing a stable key+payload sort —
   and the sorted key's low bits are directly the feature-gather indices;
5. per-tile [start, end) ranges via searchsorted over the sorted keys.

Capacity: K_cap = max_dup_factor * N slots.  If a frame produces more pairs,
the overflow count is returned (pairs dropped are the *deepest* ones —
graceful degradation) and surfaced by the non-jit wrapper.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from splat_tpu.config import RenderConfig
from splat_tpu.ops.projection import ProjectedGaussians


@partial(jax.tree_util.register_dataclass,
         data_fields=["features", "tile_start", "tile_end", "num_pairs",
                      "overflow"],
         meta_fields=["tiles_x", "tiles_y"])
@dataclasses.dataclass(frozen=True)
class TileBins:
    """Sorted (gaussian, tile) pairs ready for the raster kernel.

    features: (16, K_cap + chunk) f32 feature-major, columns ordered by
      (tile, depth): rows are
      [cx, cy, conic_a, conic_b, conic_c, r, g, b, opacity, rx, ry,
       depth, 0*4]
    tile_start/tile_end: (T,) int32 pair ranges per tile.
    num_pairs: () int32 total valid pairs (pre-capacity).
    overflow: () int32 pairs dropped due to capacity.
    """

    features: jax.Array
    tile_start: jax.Array
    tile_end: jax.Array
    num_pairs: jax.Array
    overflow: jax.Array
    tiles_x: int
    tiles_y: int


FEATURE_DIM = 16


def build_tile_bins(proj: ProjectedGaussians, h: int, w: int,
                    config: RenderConfig, debug_stage: str | None = None,
                    interpret: bool | None = None):
    """debug_stage (profiling only): return a scalar checksum right after
    the named sub-stage ('order', 'counts', 'slots', 'tiles', 'sort',
    'edges') so each stage's device cost can be measured cumulatively."""
    tp = config.tile_px
    ntx = -(-w // tp)
    nty = -(-h // tp)
    num_tiles = ntx * nty
    n = proj.depth.shape[0]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    # capacity in slots, rounded up to the expansion-kernel grain
    # (max_dup_factor may be fractional — every K-sized op below scales
    # linearly with k_cap, so tracking the scene's true pair count pays)
    from splat_tpu.render import expand as _expand
    grain = _expand.BLOCK * _expand.BLOCKS_PER_PROG
    k_cap = -(-int(config.max_dup_factor * n) // grain) * grain

    # -- 1. front-to-back global order ------------------------------------
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)
    if debug_stage == "order":
        return jnp.sum(order)

    # -- 2. tile spans + pair counts (computed in original order, then the
    #       small N-sized fields are re-indexed into depth order) ----------
    cx, cy = proj.center_px[:, 0], proj.center_px[:, 1]
    rx, ry = proj.radius_px[:, 0], proj.radius_px[:, 1]
    tx0_o = jnp.clip(jnp.floor((cx - rx) / tp), 0, ntx - 1).astype(jnp.int32)
    tx1_o = jnp.clip(jnp.floor((cx + rx) / tp), 0, ntx - 1).astype(jnp.int32)
    ty0_o = jnp.clip(jnp.floor((cy - ry) / tp), 0, nty - 1).astype(jnp.int32)
    ty1_o = jnp.clip(jnp.floor((cy + ry) / tp), 0, nty - 1).astype(jnp.int32)
    counts_o = jnp.where(proj.visible,
                         (tx1_o - tx0_o + 1) * (ty1_o - ty0_o + 1),
                         0).astype(jnp.int32)
    # Adaptive bit budget for the packed expansion word (see step 3):
    # tile coords need ceil(log2(ntx/nty)) bits, the span width one more
    # than x, and the within-span index r = slot - first_slot is bounded by
    # the span area (< num_tiles), so only the LOW bits of first_slot are
    # needed — modular subtraction recovers r exactly.  When everything
    # fits in 31 bits (sign clear), ONE expansion word carries geometry and
    # first_slot together; otherwise first_slot gets its own row.
    bits_x = max(int(ntx - 1).bit_length(), 1)
    bits_y = max(int(nty - 1).bit_length(), 1)
    bits_w = max(int(ntx).bit_length(), 1)
    bits_r = max(int(num_tiles).bit_length(), 1)
    packed_first = (1 + bits_x + bits_y + bits_w + bits_r) <= 32
    shift_f = bits_x + bits_y + bits_w
    mask_r = (1 << bits_r) - 1
    # Pack the per-gaussian geometry into one word in ORIGINAL order, then
    # ONE consolidated take moves geometry, counts AND all kernel feature
    # rows into depth order together — each TPU gather index costs ~6-7 ns
    # REGARDLESS of row count (width amortizes), so widening the single
    # gather is free while a second N-gather would double the cost.  The
    # int32 rows ride along bitcast to f32 (gathers move bits verbatim).
    geom_o = (tx0_o | (ty0_o << bits_x)
              | ((tx1_o - tx0_o + 1) << (bits_x + bits_y)))
    feats_o = jnp.stack([
        cx, cy,
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
        jnp.clip(proj.color[:, 0], 0.0, 1.0),
        jnp.clip(proj.color[:, 1], 0.0, 1.0),
        jnp.clip(proj.color[:, 2], 0.0, 1.0),
        jnp.asarray(proj.opacity), rx, ry,
        # row 11: view depth — unused by the kernel, carried so tests can
        # assert per-tile front-to-back monotonicity (the sort's
        # correctness contract) directly on the binned output.
        proj.depth,
    ])                                                         # (12, N)
    int_rows = jax.lax.bitcast_convert_type(
        jnp.stack([geom_o, counts_o]), jnp.float32)            # (2, N)
    all_d = jnp.take(jnp.concatenate([int_rows, feats_o]), order, axis=1)
    geom, counts = jax.lax.bitcast_convert_type(all_d[:2], jnp.int32)
    # Depth-ordered feature table: the post-sort K-gather indexes this by
    # depth rank (which the packed sort key carries for free).
    feats_d = jnp.pad(all_d[2:], ((0, FEATURE_DIM - 12), (0, 0)))

    cum = jnp.cumsum(counts)
    total = cum[-1]
    first_slot = cum - counts                       # exclusive prefix sum
    overflow = jnp.maximum(total - k_cap, 0)
    if debug_stage == "counts":
        return total + jnp.sum(first_slot)

    # -- 3. per-slot expansion -> packed (tile ‖ rank) sort keys -----------
    bits_rank = max(int(n - 1).bit_length(), 1)
    bits_tile = max(int(num_tiles).bit_length(), 1)  # sentinel must fit
    packed_key = bits_tile + bits_rank <= 31
    use_pallas_expand = (
        config.expand_impl != "xla"
        and packed_key and k_cap < _expand.MAX_KCAP
        and max(ntx, nty) <= _expand.MAX_TILE_COORD)
    num_pairs = jnp.minimum(total, jnp.int32(k_cap))
    key = None

    if use_pallas_expand:
        # Pallas expansion (render/expand.py): per-block one-hot owner
        # recovery + one exact bf16 MXU contraction — no K-scale scatter,
        # cumsum, or decode; the kernel emits final sort keys directly,
        # with the optional lossless dead-pair cull folded in.
        cull_cols = None
        if config.cull_pairs:
            ca_n, cb_n, cc_n = feats_d[2], feats_d[3], feats_d[4]
            half = 0.5 * (ca_n + cc_n)
            lam_min_n = half - jnp.sqrt(jnp.maximum(
                half * half - (ca_n * cc_n - cb_n * cb_n), 0.0))
            thresh_n = 2.0 * jnp.log(
                jnp.maximum(feats_d[8], 1e-12) / config.alpha_min)
            r_cull = jnp.sqrt(jnp.maximum(thresh_n, 0.0)
                              / jnp.maximum(lam_min_n, 1e-12))
            cull_cols = (feats_d[0], feats_d[1], r_cull)
        key = _expand.expand_pair_keys(
            first_slot,
            geom & ((1 << bits_x) - 1),
            (geom >> bits_x) & ((1 << bits_y) - 1),
            (geom >> (bits_x + bits_y)) & ((1 << bits_w) - 1),
            total, n=n, k_cap=k_cap, ntx=ntx, num_tiles=num_tiles,
            bits_rank=bits_rank, tile_px=tp, cull=cull_cols,
            interpret=interpret)
        if config.cull_pairs:
            # pairs the kernel will actually walk (post-cull)
            num_pairs = jnp.sum(
                ((key >> bits_rank) != num_tiles).astype(jnp.int32))
        if debug_stage in ("slots", "tiles"):
            return jnp.sum(key)
        return _sort_and_gather(key, None, sorted_rank_bits=bits_rank,
                                feats_d=feats_d, num_tiles=num_tiles,
                                num_pairs=num_pairs, overflow=overflow,
                                ntx=ntx, nty=nty, config=config,
                                debug_stage=debug_stage)

    # XLA fallback expansion via batched diff-scatter-cumsum:
    # TPU gathers cost ~6-7 ns per INDEX (scalar-core bound): a K-sized
    # gather is ~40 ms at K=6M, and the naive formulation needs five of
    # them.  Instead, any int32 per-gaussian sequence v expands to slots
    # exactly by scattering wrapped differences at each gaussian's first
    # slot and taking a wrapping cumulative sum (telescoping; zero-count
    # gaussians stack their deltas on the next start, which telescopes
    # through).  One batched scatter + one batched cumsum expand all
    # sequences at once:
    #   row 0: packed word: geometry (tx0, ty0, span_w) and, when the bit
    #          budget allows, the low bits of first_slot (for r_of_slot)
    #   plus a scatter of ONES whose cumsum is the depth RANK of each
    #   slot's gaussian (ranks increase by exactly 1 per visible gaussian,
    #   so the "wrapped differences" of the rank sequence are all ones —
    #   no gather needed; zero-count gaussians stack and telescope).  The
    #   rank doubles as the feature-gather source into feats_d AND the
    #   low bits of the packed sort key.
    slot_ids = jnp.arange(k_cap, dtype=jnp.int32)
    if packed_first:
        word = geom | ((first_slot & mask_r) << shift_f)
        rows = jnp.stack([word])                                   # (1, N)
    else:
        rows = jnp.stack([geom, first_slot])                       # (2, N)
    deltas = jnp.concatenate(
        [rows[:, :1], rows[:, 1:] - rows[:, :-1]], axis=1)         # wraps ok
    idx = jnp.minimum(first_slot, k_cap)
    # barrier: keep the scatters PURE (fused update computations re-evaluate
    # per update on the scalar core), and use plain 1-row scatters — the
    # batched windowed form scatters multi-element columns into a
    # minor-dim-k layout, which measured 46 ms vs ~3 ms for row scatters.
    deltas, idx = jax.lax.optimization_barrier((deltas, idx))
    expanded = [
        jnp.cumsum(jnp.zeros((k_cap + 1,), jnp.int32).at[idx].add(
            deltas[r], mode="drop")[:k_cap])
        for r in range(rows.shape[0])
    ]
    ones = jnp.ones((n,), jnp.int32)
    rank_e = jnp.cumsum(
        jnp.zeros((k_cap + 1,), jnp.int32).at[idx].add(
            ones, mode="drop")[:k_cap]) - 1
    rank_e = jnp.clip(rank_e, 0, n - 1)
    if packed_first:
        (word_e,) = expanded
        geom_e = word_e  # low bits hold geometry; masks below select fields
        first_low = (word_e >> shift_f) & mask_r
        r_of_slot = (slot_ids - first_low) & mask_r
    else:
        geom_e, first_e = expanded
        r_of_slot = slot_ids - first_e
    if debug_stage == "slots":
        return jnp.sum(rank_e)

    tx0_e = geom_e & ((1 << bits_x) - 1)
    ty0_e = (geom_e >> bits_x) & ((1 << bits_y) - 1)
    sw = (geom_e >> (bits_x + bits_y)) & ((1 << bits_w) - 1)
    # r // sw and r % sw with a VECTOR divisor are software-emulated
    # (bit-serial) integer division on TPU.  r_of_slot < span area <= a few
    # thousand, so exact f32 reciprocal math is safe: (r + 0.5)/sw floors to
    # the true quotient for any integer r < 2^22.
    rf = r_of_slot.astype(jnp.float32) + 0.5
    dy = jnp.floor(rf / sw.astype(jnp.float32)).astype(jnp.int32)
    dx_ = r_of_slot - dy * sw
    tile_col = tx0_e + dx_
    tile_row = ty0_e + dy
    tile_id = tile_row * ntx + tile_col
    valid = slot_ids < jnp.minimum(total, k_cap)

    if config.cull_pairs:
        # Fine-grained pair culling: a pair is dead when even the most
        # favorable pixel of the tile has alpha < alpha_min — exactly the
        # kernel's own per-pixel cutoff, so dropping it is lossless.  Bound
        # the quadratic form from below by lambda_min(conic) * dist^2 where
        # dist is the center->tile-rect distance (conservative: lambda_min
        # underestimates Q, so we only drop when certainly dead).
        # Per-gaussian quantities are computed once at N; the per-slot
        # lookup is ONE feature-major (4, K) gather.
        ca_n, cb_n, cc_n = feats_d[2], feats_d[3], feats_d[4]
        half = 0.5 * (ca_n + cc_n)
        lam_min_n = half - jnp.sqrt(
            jnp.maximum(half * half - (ca_n * cc_n - cb_n * cb_n), 0.0))
        thresh_n = 2.0 * jnp.log(
            jnp.maximum(feats_d[8], 1e-12) / config.alpha_min)
        cull_rows = jnp.stack([feats_d[0], feats_d[1],
                               lam_min_n, thresh_n])           # (4, N)
        vals = jnp.take(cull_rows, rank_e, axis=1)             # (4, K)
        cxd, cyd, lam_min, thresh = vals[0], vals[1], vals[2], vals[3]
        x0 = tile_col.astype(jnp.float32) * tp
        y0 = tile_row.astype(jnp.float32) * tp
        ddx = jnp.maximum(jnp.maximum(x0 - cxd, cxd - (x0 + tp - 1)), 0.0)
        ddy = jnp.maximum(jnp.maximum(y0 - cyd, cyd - (y0 + tp - 1)), 0.0)
        q_low = lam_min * (ddx * ddx + ddy * ddy)
        # alpha_max = opacity * exp(-q_low / 2) < alpha_min  <=>
        # q_low > 2 * log(opacity / alpha_min)
        valid = valid & (q_low <= thresh)

    tile_id = jnp.where(valid, tile_id, num_tiles).astype(jnp.int32)
    if debug_stage == "tiles":
        return jnp.sum(tile_id)
    # pairs the kernel will actually walk (post-cull)
    num_pairs = jnp.sum(valid.astype(jnp.int32))
    pair = None
    if packed_key:
        key = (tile_id << bits_rank) | rank_e
    else:
        pair = (tile_id, rank_e)
    return _sort_and_gather(key, pair, sorted_rank_bits=bits_rank,
                            feats_d=feats_d, num_tiles=num_tiles,
                            num_pairs=num_pairs, overflow=overflow,
                            ntx=ntx, nty=nty, config=config,
                            debug_stage=debug_stage)


def _sort_and_gather(key, pair, *, sorted_rank_bits: int, feats_d,
                     num_tiles: int, num_pairs, overflow, ntx: int,
                     nty: int, config: RenderConfig,
                     debug_stage: str | None):
    """Steps 4-6: tile sort, per-tile ranges, feature gather.

    When (tile ‖ rank) fits in 31 bits (``key`` given), ONE unstable
    single-array sort on the packed key replaces the stable key+payload
    sort: ranks are unique and ascending in depth, so ordering by the
    packed key groups by tile with exact front-to-back order inside each
    tile — and the sorted key's low bits ARE the feature-gather indices
    into the depth-ordered feature table.
    """
    if key is not None:
        sorted_key = jax.lax.sort(key)
        sorted_rank = sorted_key & ((1 << sorted_rank_bits) - 1)
        edge_queries = (jnp.arange(num_tiles + 1, dtype=jnp.int32)
                        << sorted_rank_bits)
        edge_space = sorted_key
    else:
        sorted_tile, sorted_rank = jax.lax.sort(pair, num_keys=1,
                                                is_stable=True)
        edge_queries = jnp.arange(num_tiles + 1, dtype=jnp.int32)
        edge_space = sorted_tile
    if debug_stage == "sort":
        return jnp.sum(edge_space) + jnp.sum(sorted_rank)

    # -- 5. per-tile ranges -------------------------------------------------
    edges = jnp.searchsorted(edge_space, edge_queries,
                             side="left").astype(jnp.int32)
    tile_start, tile_end = edges[:-1], edges[1:]
    if debug_stage == "edges":
        return jnp.sum(edges)

    # -- 6. feature gather: the one unavoidable K-gather, feature-major ----
    # Each sorted pair pulls its gaussian's 64-byte feature column from the
    # DEPTH-ORDERED table in a single index operation.
    # chunk padding so the kernel's fixed-size DMA never reads out of bounds
    src = jnp.pad(sorted_rank, (0, config.chunk), constant_values=0)
    features = jnp.take(feats_d, src, axis=1)                 # (16, Kp)

    return TileBins(features=features, tile_start=tile_start,
                    tile_end=tile_end, num_pairs=num_pairs,
                    overflow=overflow, tiles_x=ntx, tiles_y=nty)
