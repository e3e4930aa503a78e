"""Quantify the backward-kernel saturation-cut opportunity (round-5
backward campaign): how many sorted pairs sit BEHIND the point where a
tile's every pixel has logT < THRESH?

Two thresholds:
  -105.0            exp(logT) == +0.0 in f32 on BOTH backends (below
                    half the minimum denormal) — pairs behind this have
                    EXACTLY zero gradients (weight = alpha*T = 0, and
                    the D-suffix terms they feed are exact zeros), so a
                    backward kernel that starts its reverse walk at the
                    cut is bit-equivalent to the full walk.
  log(1/255) = -5.54  the light path's inference exit — an UPPER bound
                    on what approximate (INRIA-style last-contributor)
                    cutting could ever reclaim.

Method: the real compiled binning (build_tile_bins) feeds a plain-XLA
re-walk of each tile's pair range in windows of `chunk`, tracking the
per-pixel running logT (the same alpha math as diff._alpha_window,
decoded from the packed feature table) and recording per tile the first
window index after which all pixels are below each threshold.  Runs in
seconds on the TPU; tile groups bound memory.

Usage: python scripts/satcut_probe.py --n 1000000 [--scene surface]
"""

from __future__ import annotations

import argparse
import functools
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

THRESH_EXACT = -105.0
THRESH_INFER = math.log(1.0 / 255.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--dup", type=float, default=2.2)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--group", type=int, default=255)
    ap.add_argument("--scene", choices=["random", "surface"],
                    default="surface")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import splat_tpu as st
    from splat_tpu.config import RenderConfig
    from splat_tpu.ops.projection import project_gaussians
    from splat_tpu.render.binning import _R15_MAX, build_tile_bins
    from splat_tpu.utils.compilecache import enable_persistent_cache

    enable_persistent_cache()
    if args.scene == "surface":
        scene = st.surface_scene(args.n, seed=0)
    else:
        scene = st.random_scene(args.n, seed=0, extent=3.0,
                                scale_range=(0.004, 0.03))
    scene = scene.pack_device()
    cam = st.Camera.create(h=args.h, w=args.w, position=(0.0, 0.0, 4.0))
    config = RenderConfig(tile_px=args.tile, chunk=args.chunk,
                          max_dup_factor=args.dup)

    bins = jax.jit(
        lambda s, c: build_tile_bins(
            project_gaussians(s, c, config), args.h, args.w, config)
    )(scene, cam)
    feats = bins.features                       # (8, Kp) int32
    starts = bins.tile_start
    ends = bins.tile_end
    ntx = bins.tiles_x
    nt = int(starts.shape[0])
    th = config.tile_h
    tw = config.tile_w
    p = th * tw
    chunk = args.chunk
    kp = int(feats.shape[1])

    base = (starts // 128) * 128
    nwin = (ends - base + chunk - 1) // chunk
    maxwin = int(jax.device_get(jnp.max(nwin)))
    g = args.group
    ntp = ((nt + g - 1) // g) * g
    print(f"tiles={nt} pairs={int(jax.device_get(bins.num_pairs))} "
          f"maxwin={maxwin}", flush=True)

    alpha_clamp = config.alpha_clamp
    alpha_min = config.alpha_min
    inv_u16 = 1.0 / 65535.0

    @functools.partial(jax.jit, static_argnums=())
    def probe_group(tids):
        """tids: (G,) int32 tile ids (padded entries = nt -> masked).
        Returns per-tile cut window index for both thresholds."""
        ok = tids < nt
        tid = jnp.where(ok, tids, 0)
        s = jnp.take(starts, tid)
        e = jnp.where(ok, jnp.take(ends, tid), 0)
        b = jnp.take(base, tid)
        ty = tid // ntx
        tx = tid % ntx
        r_lin = jnp.arange(p, dtype=jnp.int32)[None, :]      # (1, P)
        pxf = (tx[:, None] * tw + r_lin % tw).astype(jnp.float32)
        pyf = (ty[:, None] * th + r_lin // tw).astype(jnp.float32)
        pxf = pxf[:, :, None]                                 # (G, P, 1)
        pyf = pyf[:, :, None]

        def step(carry, j):
            lt, cut_x, cut_i, done_x, done_i = carry
            kg = (b[:, None] + j * chunk
                  + jnp.arange(chunk, dtype=jnp.int32)[None, :])
            idx = jnp.clip(kg, 0, kp - 1)                     # (G, chunk)
            f = jnp.take(feats, idx, axis=1)                  # (8,G,chunk)
            frow = lambda i: jax.lax.bitcast_convert_type(f[i],
                                                          jnp.float32)
            cx = frow(0)[:, None, :]
            cy = frow(1)[:, None, :]
            a2 = frow(2)[:, None, :]
            b2 = frow(3)[:, None, :]
            c2 = frow(4)[:, None, :]
            op = (((f[6] >> 16) & 0xFFFF).astype(jnp.float32)
                  * inv_u16)[:, None, :]
            rxq = f[7] & 0x7FFF
            ryq = (f[7] >> 15) & 0x7FFF
            rx = rxq.astype(jnp.float32) * 0.125
            ry = ryq.astype(jnp.float32) * 0.125
            rx2 = jnp.where(rxq == _R15_MAX, jnp.inf,
                            rx * rx)[:, None, :]
            ry2 = jnp.where(ryq == _R15_MAX, jnp.inf,
                            ry * ry)[:, None, :]
            inrange = ((kg >= s[:, None]) & (kg < e[:, None]))
            op = jnp.where(inrange[:, None, :], op, 0.0)
            dx = pxf - cx
            dy = cy - pyf
            dx2 = dx * dx
            dy2 = dy * dy
            power = a2 * dx2 + c2 * dy2 + b2 * (dx * dy)
            a_raw = op * jnp.exp(power)
            alpha = jnp.minimum(alpha_clamp, a_raw)
            keep = (alpha >= alpha_min) & (dx2 <= rx2) & (dy2 <= ry2)
            alpha = jnp.where(keep, alpha, 0.0)
            lt = lt + jnp.sum(jnp.log1p(-jnp.minimum(alpha, 0.999999)),
                              axis=2)                        # (G, P)
            worst = jnp.max(lt, axis=1)                      # (G,)
            live = j * chunk < (e - b)   # window overlaps the range
            sat_x = (worst < THRESH_EXACT) | ~live
            sat_i = (worst < THRESH_INFER) | ~live
            cut_x = jnp.where(~done_x & sat_x, j + 1, cut_x)
            cut_i = jnp.where(~done_i & sat_i, j + 1, cut_i)
            return (lt, cut_x, cut_i,
                    done_x | sat_x, done_i | sat_i), None

        lt0 = jnp.zeros((tids.shape[0], p), jnp.float32)
        nw = jnp.full((tids.shape[0],), maxwin, jnp.int32)
        carry0 = (lt0, nw, nw, jnp.zeros_like(nw, bool),
                  jnp.zeros_like(nw, bool))
        (lt, cut_x, cut_i, done_x, done_i), _ = jax.lax.scan(
            step, carry0, jnp.arange(maxwin, dtype=jnp.int32))
        cut_x = jnp.where(done_x, cut_x, nw)
        cut_i = jnp.where(done_i, cut_i, nw)
        return cut_x, cut_i, jnp.min(lt), jnp.min(jnp.max(lt, axis=1))

    all_x = []
    all_i = []
    lt_min = 0.0
    worst_min = 0.0
    for g0 in range(0, ntp, g):
        tids = jnp.arange(g0, g0 + g, dtype=jnp.int32)
        cx_, ci_, lm, wm = jax.device_get(probe_group(tids))
        all_x.append(cx_)
        all_i.append(ci_)
        lt_min = min(lt_min, float(lm))
        worst_min = min(worst_min, float(wm))
    print(f"final-lt sanity: min={lt_min:.1f} "
          f"min-over-tiles-of-worst-pixel={worst_min:.1f}", flush=True)
    cut_x = np.concatenate(all_x)[:nt]
    cut_i = np.concatenate(all_i)[:nt]
    s_np = np.asarray(jax.device_get(starts))
    e_np = np.asarray(jax.device_get(ends))
    b_np = (s_np // 128) * 128
    walked = np.maximum(e_np - b_np, 0)

    def report(cut, name):
        kept = np.minimum(np.maximum(cut * chunk, 0), walked)
        skip = walked - kept
        print(f"[{name}] walked_slots={walked.sum()} "
              f"skippable={skip.sum()} "
              f"({100.0 * skip.sum() / max(walked.sum(), 1):.1f}%) "
              f"tiles_with_cut={(skip > 0).sum()}/{nt} "
              f"max_tile_skip={skip.max()}", flush=True)

    report(cut_x, f"exact logT<{THRESH_EXACT}")
    report(cut_i, f"inference logT<{THRESH_INFER:.2f}")


if __name__ == "__main__":
    main()
