"""Saturation-structure profile of heavy tiles (design tool, CPU).

For the heaviest tiles of a scene/pose, computes per-pixel saturation
depth (the pair index at which transmittance crosses alpha_min) by
replaying the tile's sorted pair range densely, then reports what a
per-pixel-group early exit could actually save:

  whole-tile cost  = nchunks * ng            (units: group-windows)
  grouped cost     = sum_j #active_groups(j)
  ideal cost       = sum over pixels of ceil(sat_depth / chunk) / pg

Run:  python scripts/satprofile.py [--n N] [--scene surface] [--top T]
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
    ap.add_argument("--scene", default="surface",
                    choices=["surface", "random"])
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--chunk", type=int, default=128)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import splat_tpu as st
    from splat_tpu.config import RenderConfig
    from splat_tpu.ops.projection import project_gaussians
    from splat_tpu.render.binning import build_tile_bins
    from splat_tpu.render.kernels import group_grid

    config = RenderConfig(max_dup_factor=2.1)
    if args.scene == "surface":
        scene = st.surface_scene(args.n, seed=0)
    else:
        scene = st.random_scene(args.n, seed=0, extent=3.0,
                                scale_range=(0.004, 0.03))
    cam = st.Camera.create(h=args.h, w=args.w, position=(0.0, 0.0, 4.0))

    proj = jax.jit(lambda s, c: project_gaussians(s, c, config))(scene, cam)
    bins = jax.jit(lambda p: build_tile_bins(p, args.h, args.w, config),
                   static_argnames=())(proj)
    start = np.asarray(bins.tile_start)
    end = np.asarray(bins.tile_end)
    occ = end - start
    feats = np.asarray(bins.features)
    ntx = bins.tiles_x
    tw, th = config.tile_w, config.tile_h
    gy_n, gx_n, bh, bw = group_grid(tw, th, True)
    ng, pg = gy_n * gx_n, bh * bw
    chunk = args.chunk
    amin = config.alpha_min

    cx_r = feats[0].view(np.float32)
    cy_r = feats[1].view(np.float32)
    a2_r = feats[2].view(np.float32)
    b2_r = feats[3].view(np.float32)
    c2_r = feats[4].view(np.float32)
    op_r = ((feats[6] >> 16) & 0xFFFF).astype(np.float32) / 65535.0
    rxq = feats[7] & 0x7FFF
    ryq = (feats[7] >> 15) & 0x7FFF
    rx2_r = np.where(rxq == 32767, np.inf, (rxq * 0.125) ** 2)
    ry2_r = np.where(ryq == 32767, np.inf, (ryq * 0.125) ** 2)

    cx_r, cy_r, a2_r, b2_r, c2_r, op_r, rx2_r, ry2_r = (
        jnp.asarray(v) for v in
        (cx_r, cy_r, a2_r, b2_r, c2_r, op_r, rx2_r, ry2_r))

    # pixel coords in GROUP-major row order (kernels.py mapping)
    r = np.arange(tw * th)
    g, q = r // pg, r % pg
    px = jnp.asarray((g % gx_n) * bw + q % bw)
    py = jnp.asarray((g // gx_n) * bh + q // bw)

    @jax.jit
    def sat_depth(s_, e_, tx, ty):
        k = jnp.arange(int(occ.max()))
        valid = k < (e_ - s_)
        idx = jnp.minimum(s_ + k, feats.shape[1] - 1)
        dx = (tx * tw + px)[:, None] - cx_r[idx][None, :]
        dy = cy_r[idx][None, :] - (ty * th + py)[:, None]
        power = (a2_r[idx] * dx * dx + c2_r[idx] * dy * dy
                 + b2_r[idx] * dx * dy)
        alpha = jnp.minimum(0.99, op_r[idx] * jnp.exp(power))
        keep = ((alpha >= amin) & (dx * dx <= rx2_r[idx])
                & (dy * dy <= ry2_r[idx]) & valid[None, :])
        alpha = jnp.where(keep, alpha, 0.0)
        logt = jnp.cumsum(jnp.log1p(-jnp.minimum(alpha, 0.999999)), axis=1)
        sat = logt < jnp.log(amin)
        first = jnp.argmax(sat, axis=1)
        return jnp.where(sat.any(axis=1), first, e_ - s_)   # (P,)

    order = np.argsort(-occ)
    print(f"{args.scene} N={args.n} {args.w}x{args.h}: pairs="
          f"{int(bins.num_pairs)} tiles>{4096}pairs="
          f"{int((occ > 4096).sum())} "
          f"heavy-pair-share={occ[occ > 4096].sum() / occ.sum():.2f}")
    tot_whole = tot_group = tot_ideal = 0.0
    for t in order[:args.top]:
        s_, e_ = int(start[t]), int(end[t])
        depth = np.asarray(sat_depth(s_, e_, t % ntx, t // ntx))
        nch = -(-(e_ - s_) // chunk)
        gdepth = depth.reshape(ng, pg).max(1)          # group exit index
        wins_g = np.ceil((gdepth + 1) / chunk).clip(max=nch)
        whole = nch * ng
        grouped = wins_g.sum()
        ideal = np.ceil((depth + 1) / chunk).clip(max=nch).sum() / pg
        tot_whole += whole
        tot_group += grouped
        tot_ideal += ideal
        sat_frac = (depth < (e_ - s_)).mean()
        print(f"  tile {t}: pairs={e_ - s_} satpix={sat_frac:.2f} "
              f"group-windows: whole={whole} grouped={int(grouped)} "
              f"ideal={ideal:.0f}")
    print(f"top-{args.top} totals: whole={tot_whole:.0f} "
          f"grouped={tot_group:.0f} ({tot_group / tot_whole:.2f}x) "
          f"ideal={tot_ideal:.0f} ({tot_ideal / tot_whole:.2f}x)")


if __name__ == "__main__":
    main()
