"""Device-time measurement for the tiled renderer.

The axon relay makes host-side timing useless (block_until_ready is async,
dispatch costs ~100 ms HTTP round-trip), so frames are chained inside one
jitted lax.scan — each frame's yaw depends on the previous frame's pixels,
forcing sequential device execution — and a single scalar is fetched.

Usage: python scripts/devtime.py [--n N] [--h H] [--w W] [--frames F]
       [--tile T] [--chunk C] [--dup D] [--scale lo,hi] [--empty]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--tiley", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--dup", type=float, default=4)
    ap.add_argument("--scale", type=str, default="0.004,0.03")
    ap.add_argument("--extent", type=float, default=3.0)
    ap.add_argument("--scene", choices=["random", "surface"],
                    default="random")
    ap.add_argument("--empty", action="store_true",
                    help="camera looks away: measures fixed overhead")
    ap.add_argument("--stage",
                    choices=["full", "project", "bins", "bins_order",
                             "bins_counts", "bins_slots", "bins_tiles",
                             "bins_sort", "bins_edges", "bins_gather"],
                    default="full")
    ap.add_argument("--nocull", action="store_true", default=None)
    ap.add_argument("--cull", dest="nocull", action="store_false")
    ap.add_argument("--nosubtile", action="store_true",
                    help="disable the per-pixel-group saturation exit")
    ap.add_argument("--psnr", action="store_true",
                    help="skip timing; render a deterministic fixture scene "
                         "through the COMPILED Mosaic kernel on the current "
                         "backend and report PSNR vs the NumPy oracle "
                         "(BASELINE.md ladder item 2: 800x600 full-frame "
                         "parity)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import splat_tpu as st
    from splat_tpu.config import RenderConfig
    from splat_tpu.render.tiled import render_tiled
    from splat_tpu.ops.projection import project_gaussians
    from splat_tpu.render.binning import build_tile_bins

    if args.psnr:
        from splat_tpu.render.oracle import render_oracle
        from splat_tpu.render.tiled import render_tiled_checked
        from splat_tpu.utils.image import psnr
        scene = st.surface_scene(5000, seed=11)
        cam = st.Camera.create(h=600, w=800, position=(0.0, -1.0, 3.5))
        config = RenderConfig(tile_px=args.tile, tile_py=args.tiley,
                              chunk=args.chunk, max_dup_factor=args.dup)
        img = np.asarray(render_tiled_checked(scene.to_device(), cam,
                                              config))
        gold = render_oracle(scene, cam, config)
        p = psnr(img, gold)
        print(f"on-device parity: backend={jax.default_backend()} "
              f"surface_scene(5000) 800x600 PSNR={p:.2f} dB "
              f"(threshold 45)")
        if p < 45.0:
            raise SystemExit(1)
        return

    lo, hi = (float(x) for x in args.scale.split(","))
    if args.scene == "surface":
        scene = st.surface_scene(args.n, seed=0).to_device()
    else:
        scene = st.random_scene(args.n, seed=0, extent=args.extent,
                                scale_range=(lo, hi)).to_device()
    pos = (0.0, 0.0, 400.0) if args.empty else (0.0, 0.0, 4.0)
    tgt = (0.0, 0.0, 500.0) if args.empty else (0.0, 0.0, 0.0)
    cam = st.Camera.create(h=args.h, w=args.w, position=pos, target=tgt)
    config = RenderConfig(tile_px=args.tile, tile_py=args.tiley,
                          chunk=args.chunk, max_dup_factor=args.dup,
                          cull_pairs=(args.nocull is False),
                          subtile_exit=not args.nosubtile)

    f_frames = args.frames

    def frame(scene, c):
        if args.stage == "project":
            # consume EVERY output: XLA DCEs unconsumed ones, understating
            # the stage (same trap as partial sort-output micro-benchmarks)
            p = project_gaussians(scene, c, config)
            return (jnp.sum(p.center_px) + jnp.sum(p.color)
                    + jnp.sum(p.conic) + jnp.sum(p.radius_px)
                    + jnp.sum(p.depth) + jnp.sum(p.opacity)
                    + jnp.sum(p.visible.astype(jnp.float32)))
        if args.stage == "bins":
            p = project_gaussians(scene, c, config)
            b = build_tile_bins(p, args.h, args.w, config)
            return (jnp.sum(b.tile_end) + b.num_pairs).astype(jnp.float32)
        if args.stage.startswith("bins_"):
            p = project_gaussians(scene, c, config)
            v = build_tile_bins(p, args.h, args.w, config,
                                debug_stage=args.stage[5:])
            return v.astype(jnp.float32)
        img = render_tiled(scene, c, config)
        return jnp.mean(img) * 3

    def chained(scene, cam):
        def step(carry, i):
            c = dataclasses.replace(
                cam, yaw=cam.yaw + 0.01 * i.astype(jnp.float32)
                + carry * 1e-20)
            v = frame(scene, c)
            return v.astype(jnp.float32), v
        carry, vals = jax.lax.scan(step, jnp.float32(0.0),
                                   jnp.arange(f_frames))
        return carry, vals

    f = jax.jit(chained)
    t0 = time.time()
    jax.device_get(f(scene, cam))
    compile_s = time.time() - t0
    t0 = time.time()
    out = jax.device_get(f(scene, cam))
    dt = time.time() - t0
    if args.stage == "full":
        _, stats = jax.jit(lambda s, c: render_tiled(s, c, config,
                                                     return_stats=True))(
            scene, cam)
        stats = {k: float(v) for k, v in jax.device_get(stats).items()}
    else:
        stats = {"num_pairs": -1, "max_tile_pairs": -1, "overflow": -1}
    ms = dt / f_frames * 1e3
    print(f"n={args.n} {args.w}x{args.h} tile={args.tile}x{args.tiley or args.tile} chunk={args.chunk} "
          f"dup={args.dup} cull={args.nocull is False} "
          f"stage={args.stage} "
          f"empty={args.empty} | "
          f"{ms:.2f} ms/frame ({1e3 / ms:.1f} FPS) "
          f"compile={compile_s:.0f}s pairs={stats['num_pairs']:.0f} "
          f"maxtile={stats['max_tile_pairs']:.0f} "
          f"overflow={stats['overflow']:.0f}")


if __name__ == "__main__":
    main()
