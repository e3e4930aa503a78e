"""Decompose the backward's pair->gaussian scatter (~72 ms at 1M@1080p,
the largest single component of the training step after round 5's
saturation cut) into its pieces:

  ranks    valid mask + gaussian-id cast (the id rides the
           grads buffer from the kernel — no bins.ranks take)
  sort     + the 3-operand unstable sort by gaussian id
  gather   + the 8-row value take at the sort order
  cumsum   + both compensated cumsum passes (c0, residual, c1)
  take     + the 18-row boundary take at N+1 segment offsets (= full)
  offsets  _segment_offsets alone (tile_spans + cumsums at N)
  full     _scatter_pair_grads verbatim

Prefix differences isolate each stage (same chained-scan protocol as
expandprobe.py: the carry inoculates one f32 input so the device cannot
overlap frames; every stage output is consumed).

Usage: python scripts/scatterprobe.py --piece full --n 1000000
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--dup", type=float, default=2.2)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--scene", choices=["random", "surface"],
                    default="surface")
    ap.add_argument("--piece",
                    choices=["ranks", "sort", "gather", "cumsum", "take",
                             "offsets", "full"],
                    default="full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import splat_tpu as st
    from splat_tpu.config import RenderConfig
    from splat_tpu.ops.projection import project_gaussians
    from splat_tpu.render import diff as D
    from splat_tpu.render.binning import build_tile_bins
    from splat_tpu.utils.compilecache import enable_persistent_cache

    enable_persistent_cache()
    if args.scene == "surface":
        scene = st.surface_scene(args.n, seed=0)
    else:
        scene = st.random_scene(args.n, seed=0, extent=3.0,
                                scale_range=(0.004, 0.03))
    scene = scene.pack_device()
    cam = st.Camera.create(h=args.h, w=args.w, position=(0.0, 0.0, 4.0))
    config = RenderConfig(max_dup_factor=args.dup)
    interpret = jax.default_backend() == "cpu"
    n = args.n

    @jax.jit
    def prep(s, c):
        proj = project_gaussians(s, c, config)
        bins = build_tile_bins(proj, c.h, c.w, config,
                               interpret=interpret)
        c_raw, lt, cut = D._fwd_raster(bins, c.h, c.w, config, interpret)
        g_c = jnp.full_like(c_raw, 1e-3)
        g_lt = jnp.full_like(lt, 1e-3)
        grads, pad_base, base_t = D._bwd_raster(
            bins, g_c, g_lt, lt, cut, c.h, c.w, config, interpret)
        return proj, bins, grads, pad_base, base_t

    proj, bins, grads, pad_base, base_t = jax.block_until_ready(
        prep(scene, cam))
    kp2 = grads.shape[1]
    k_cap = bins.ranks.shape[0]
    print(f"kp2={kp2} k_cap={k_cap}", flush=True)

    GRAD_SEM, GRAD_KG = D.GRAD_SEM, D.GRAD_KG

    def piece_fn(gr, piece):
        p_ids = jnp.arange(kp2, dtype=jnp.int32)
        kg = gr[GRAD_KG]
        valid = (p_ids < pad_base[-1]) & (kg >= 0.0)
        # round 5: the kernel's GRAD_KG row IS the gaussian id (it rides
        # the feature table) — the former take(bins.ranks, k_global)
        # K-gather is gone (it measured 25.6 ms here at ~10 ns/index)
        gidx = jnp.where(valid, kg.astype(jnp.int32), n)
        if piece == "ranks":
            return jnp.sum(gidx).astype(jnp.float32)
        row8 = jnp.where(valid, gr[GRAD_SEM - 1], 0.0)
        sg, order, row8_s = jax.lax.sort((gidx, p_ids, row8), num_keys=1,
                                         is_stable=False)
        if piece == "sort":
            return (jnp.sum(sg) + jnp.sum(order)).astype(jnp.float32) \
                + jnp.sum(row8_s)
        del sg
        sv8 = jnp.take(jnp.where(valid[None, :], gr[:GRAD_SEM - 1], 0.0),
                       order, axis=1)
        sv = jnp.concatenate([sv8, row8_s[None, :]], axis=0)
        if piece == "gather":
            return jnp.sum(sv)
        c0 = jnp.cumsum(sv, axis=1)
        resid = sv - jnp.diff(c0, axis=1,
                              prepend=jnp.zeros((GRAD_SEM, 1),
                                                jnp.float32))
        c1 = jnp.cumsum(resid, axis=1)
        if piece == "cumsum":
            return jnp.sum(c0[:, -1]) + jnp.sum(c1[:, -1])
        zero = jnp.zeros((2 * GRAD_SEM, 1), jnp.float32)
        cpad = jnp.concatenate(
            [zero, jnp.concatenate([c0, c1], axis=0)], axis=1)
        off = D._segment_offsets(proj, k_cap, bins.tiles_x, bins.tiles_y,
                                 config)
        q = D._boundary_take(cpad, off)
        seg = q[:, 1:] - q[:, :-1]
        return jnp.sum(seg[:GRAD_SEM] + seg[GRAD_SEM:])

    if args.piece == "offsets":
        def fn(cr):
            off = D._segment_offsets(proj, k_cap, bins.tiles_x,
                                     bins.tiles_y, config)
            return jnp.sum(off).astype(jnp.float32) + cr * 1e-20
    elif args.piece == "full":
        def fn(cr):
            gr = grads.at[0, 0].add(cr * 1e-20)
            per_g = D._scatter_pair_grads(gr, pad_base, base_t, bins,
                                          proj, n, config)
            return sum(jnp.sum(r) for r in per_g)
    else:
        def fn(cr, piece=args.piece):
            gr = grads.at[0, 0].add(cr * 1e-20)
            return piece_fn(gr, piece)

    def chained():
        def step(carry, i):
            v = fn(carry)
            return v.astype(jnp.float32) * 1e-30, v
        c, vs = jax.lax.scan(step, jnp.float32(0.0),
                             jnp.arange(args.frames))
        return c, vs

    import time
    f = jax.jit(chained)
    t0 = time.time()
    jax.block_until_ready(f())
    comp = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(f())
    ms = (time.time() - t0) / args.frames * 1e3
    print(f"n={n} {args.w}x{args.h} dup={args.dup} scene={args.scene} "
          f"piece={args.piece} | {ms:.2f} ms ({comp:.0f}s compile)",
          flush=True)


if __name__ == "__main__":
    main()
