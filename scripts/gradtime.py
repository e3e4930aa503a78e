"""Device-time decomposition of the TRAINING step (the backward twin of
devtime.py).

The forward has a per-stage rejection ledger (ARCHITECTURE.md); this
gives the backward the same rigor: each --stage times a prefix (or an
isolated piece) of the full adam step so differences isolate components.

Stages:
  fwd        public render_tiled_diff forward (proj+bins+kernel+finalize)
  loss       fwd + L2 loss vs a fixed target
  grad       value_and_grad(loss) w.r.t. RawParams — the full backward
  step       grad + adam update (the production train step)
  fwdraster  proj + bins + forward kernel only (no finalize)
  rasterbwd  fwdraster + backward Pallas kernel (unit cotangents)
  scatter    rasterbwd + pair->gaussian segment-sum
  projvjp    projection VJP alone (fabricated per-gaussian cotangents)

Timing protocol is devtime.py's: frames chained inside one jitted
lax.scan (each frame's pose perturbed by the previous frame's scalar so
the device cannot overlap them), one scalar fetched; host-side timing on
this backend lies (async dispatch ~100 ms HTTP).

Usage: python scripts/gradtime.py --stage step --n 1000000
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
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--dup", type=float, default=2.2)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--tile", type=int, default=32)
    ap.add_argument("--scene", choices=["random", "surface"],
                    default="surface")
    ap.add_argument("--sat-exit", action="store_true",
                    help="config.train_sat_exit=True (INRIA-style exit)")
    ap.add_argument("--stage",
                    choices=["fwd", "loss", "grad", "step", "fwdraster",
                             "rasterbwd", "scatter", "projvjp"],
                    default="step")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    import splat_tpu as st
    from splat_tpu.config import RenderConfig
    from splat_tpu.render import diff as D
    from splat_tpu.render.binning import build_tile_bins
    from splat_tpu.ops.projection import project_gaussians
    from splat_tpu.train import RawParams

    if args.scene == "surface":
        scene = st.surface_scene(args.n, seed=0)
    else:
        scene = st.random_scene(args.n, seed=0, extent=3.0,
                                scale_range=(0.004, 0.03))
    raw = jax.device_put(RawParams.from_scene(scene))
    cam = st.Camera.create(h=args.h, w=args.w, position=(0.0, 0.0, 4.0))
    config = RenderConfig(tile_px=args.tile, chunk=args.chunk,
                          max_dup_factor=args.dup,
                          train_sat_exit=args.sat_exit)
    interpret = jax.default_backend() == "cpu"

    def fwd_val(r, c):
        img = D.render_tiled_diff(r.to_scene(), c, config)
        return jnp.mean(img)

    def loss_val(r, c):
        img = D.render_tiled_diff(r.to_scene(), c, config)
        return jnp.mean((img - 0.5) ** 2)

    def consume(tree):
        return sum(jnp.sum(l) for l in jax.tree.leaves(tree))

    def fwdraster_val(r, c):
        proj = project_gaussians(r.to_scene(), c, config)
        bins = build_tile_bins(proj, c.h, c.w, config,
                               interpret=interpret)
        c_raw, lt, _ = D._fwd_raster(bins, c.h, c.w, config, interpret)
        return jnp.mean(c_raw) + jnp.mean(lt)

    def _bwd_parts(r, c):
        proj = project_gaussians(r.to_scene(), c, config)
        bins = build_tile_bins(proj, c.h, c.w, config,
                               interpret=interpret)
        c_raw, lt, cut = D._fwd_raster(bins, c.h, c.w, config, interpret)
        g_c = jnp.full_like(c_raw, 1e-3)
        g_lt = jnp.full_like(lt, 1e-3)
        grads, pad_base, base_t = D._bwd_raster(
            bins, g_c, g_lt, lt, cut, c.h, c.w, config, interpret)
        return proj, bins, grads, pad_base, base_t, c_raw, lt

    def rasterbwd_val(r, c):
        _, _, grads, *_ , c_raw, lt = _bwd_parts(r, c)
        return jnp.sum(grads) + jnp.mean(c_raw) + jnp.mean(lt)

    def scatter_val(r, c):
        proj, bins, grads, pad_base, base_t, c_raw, lt = _bwd_parts(r, c)
        per_g = D._scatter_pair_grads(grads, pad_base, base_t, bins,
                                      proj, args.n, config)
        return consume(per_g) + jnp.mean(c_raw) + jnp.mean(lt)

    def projvjp_val(r, c):
        out, pullback, proj = jax.vjp(
            lambda s, cam_: D._proj_arrays(s, cam_, config), r.to_scene(),
            c, has_aux=True)
        cts = tuple(jnp.full_like(o, 1e-4) for o in out)
        d_scene, d_cam = pullback(cts)
        return consume(d_scene) + consume(jax.tree.leaves(d_cam)[0])

    opt = optax.adam(1e-3)
    opt_state0 = opt.init(raw)

    def chained(raw, cam):
        def pose(carry_scalar, i):
            return dataclasses.replace(
                cam, yaw=cam.yaw + 0.01 * i.astype(jnp.float32)
                + carry_scalar * 1e-20)

        if args.stage == "step":
            def body(carry, i):
                r, o, s = carry
                c = pose(s, i)
                l, g = jax.value_and_grad(loss_val)(r, c)
                upd, o = opt.update(g, o)
                r = optax.apply_updates(r, upd)
                return (r, o, l), l
            (_, _, v), _ = jax.lax.scan(
                body, (raw, opt_state0, jnp.float32(0.0)),
                jnp.arange(args.frames))
            return v

        val = {"fwd": fwd_val, "loss": loss_val,
               "fwdraster": fwdraster_val, "rasterbwd": rasterbwd_val,
               "scatter": scatter_val, "projvjp": projvjp_val}.get(
                   args.stage)

        def body(carry, i):
            c = pose(carry, i)
            if args.stage == "grad":
                l, g = jax.value_and_grad(loss_val)(raw, c)
                v = l + consume(g) * 1e-20
            else:
                v = val(raw, c)
            return v.astype(jnp.float32), v
        v, _ = jax.lax.scan(body, jnp.float32(0.0),
                            jnp.arange(args.frames))
        return v

    f = jax.jit(chained)
    t0 = time.time()
    jax.device_get(f(raw, cam))
    compile_s = time.time() - t0
    t0 = time.time()
    jax.device_get(f(raw, cam))
    ms = (time.time() - t0) / args.frames * 1e3
    print(f"n={args.n} {args.w}x{args.h} tile={args.tile} "
          f"chunk={args.chunk} dup={args.dup} scene={args.scene} "
          f"stage={args.stage} | {ms:.2f} ms/step "
          f"({1e3 / ms:.2f} steps/s) compile={compile_s:.0f}s")


if __name__ == "__main__":
    main()
