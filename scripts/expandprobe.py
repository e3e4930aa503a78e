"""Isolate the 6M expansion superlinearity (round-5 ledger): the slots
stage grows 24.7 -> 63.4 ms from 3M/dup2.1 to 6M/dup2.2 (2.57x for
2.1x k_cap) while every component is linear on paper.  Time each piece
of binning step 3 separately:

  table    the (8, n_pad) value-table build (N-side stacks/pads)
  starts   the per-block searchsorted into first_slot (k_cap/256 queries)
  kernel   the pallas expansion call alone (table/starts precomputed)
  slots    the full debug_stage="slots" cut (reference)

Timing protocol = devtime.py's chained scan (pose-perturbation replaced
by a carry*1e-20 inoculation into one f32 input so the device cannot
overlap frames).

Usage: python scripts/expandprobe.py --n 6000000 --dup 2.2 --stage kernel
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6_000_000)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--dup", type=float, default=2.2)
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--stage", choices=["table", "starts", "kernel",
                                        "slots"], default="kernel")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import splat_tpu as st
    from splat_tpu.config import RenderConfig
    from splat_tpu.ops.projection import project_gaussians
    from splat_tpu.render import binning as B
    from splat_tpu.render import expand as E
    from splat_tpu.utils.compilecache import enable_persistent_cache

    enable_persistent_cache()
    scene = st.random_scene(args.n, seed=0, extent=3.0,
                            scale_range=(0.004, 0.03)).pack_device()
    cam = st.Camera.create(h=args.h, w=args.w,
                           position=(0.0, 0.0, 4.0))
    config = RenderConfig(max_dup_factor=args.dup)

    # --- host-side one-time: reproduce binning's step-1/2 inputs -------
    h, w = args.h, args.w
    tpx, tpy = config.tile_w, config.tile_h
    ntx = -(-w // tpx)
    nty = -(-h // tpy)
    num_tiles = ntx * nty
    grain = E.BLOCK * E.BLOCKS_PER_PROG
    k_cap = -(-int(args.dup * args.n) // grain) * grain
    num_tiles_bits = max(int(num_tiles).bit_length(), 1)
    depth_bits = max(1, min(24, 32 - num_tiles_bits))

    @jax.jit
    def prep(s, c):
        proj = project_gaussians(s, c, config)
        rbits = B.quantize_radius_bits(proj.radius_px[:, 0],
                                       proj.radius_px[:, 1], proj.visible)
        tx0, ty0, sw, counts = B.tile_spans(
            proj.center_px[:, 0], proj.center_px[:, 1], rbits,
            tpx, tpy, ntx, nty)
        counts = jnp.where(proj.visible, counts, 1)
        cum = jnp.cumsum(counts)
        first_slot = (cum - counts).astype(jnp.int32)
        total = jnp.minimum(cum[-1], jnp.int32(2 ** 30))
        qmax = float((1 << depth_bits) - 1)
        dvis = jnp.where(proj.visible, proj.depth, jnp.inf)
        dmin = jnp.min(dvis)
        dmax = jnp.max(jnp.where(proj.visible, proj.depth, -jnp.inf))
        scale = qmax / jnp.maximum(dmax - dmin, 1e-30)
        dqf = jnp.floor((dvis - dmin) * scale)
        dq = jnp.clip(jnp.where(jnp.isfinite(dqf), dqf, 0.0), 0.0,
                      qmax).astype(jnp.int32)
        return first_slot, tx0, ty0, sw, total.astype(jnp.int32), dq

    first_slot, tx0, ty0, sw, total, dq = jax.block_until_ready(
        prep(scene, cam))
    n = args.n
    bits_rank = max(int(n - 1).bit_length(), 1)
    key_xor = (-(1 << 31)
               if num_tiles_bits + depth_bits == 32 else 0)

    num_blocks = k_cap // E.BLOCK
    n_pad = -(-(n + E.WINDOW) // 128) * 128

    def build_table(fsf, tx0_, ty0_, sw_, dq_, inoc):
        fs_pad = jnp.full((n_pad - n,), E.MAX_KCAP + 128, jnp.int32)
        fs_full = jnp.concatenate([fsf, fs_pad])
        bytes3 = lambda v: [(v & 255).astype(jnp.float32),
                            ((v >> 8) & 255).astype(jnp.float32),
                            (v >> 16).astype(jnp.float32)]
        pad0 = lambda v: jnp.pad(v.astype(jnp.float32), (0, n_pad - n))
        d0 = (dq_ & 255).astype(jnp.float32)
        d1 = ((dq_ >> 8) & 255).astype(jnp.float32)
        d2 = ((dq_ >> 16) & 255).astype(jnp.float32)
        return jnp.stack(
            bytes3(fs_full)
            + [pad0(tx0_), pad0(ty0_),
               pad0(sw_.astype(jnp.float32) + 256.0 * d2 + inoc),
               pad0(d0), pad0(d1)])

    def build_starts(fsf):
        starts = jnp.searchsorted(
            fsf, jnp.arange(num_blocks, dtype=jnp.int32) * E.BLOCK,
            side="right").astype(jnp.int32) - 1
        return jnp.clip(starts, 0, n_pad - E.WINDOW) & ~127

    table0 = jax.block_until_ready(jax.jit(
        lambda f, a, b2_, c, d: build_table(f, a, b2_, c, d,
                                            jnp.float32(0.0)))(
        first_slot, tx0, ty0, sw, dq))
    starts0 = jax.block_until_ready(jax.jit(build_starts)(first_slot))

    kernel = functools.partial(
        E._expand_kernel, ntx=ntx, bits_rank=bits_rank,
        num_tiles=num_tiles, n=n, cull=False,
        tw8=tpx // 8, th8=tpy // 8, key_xor=key_xor,
        depth_bits=depth_bits)
    out_spec = E.pl.BlockSpec((E.BLOCKS_PER_PROG, E.BLOCK),
                              lambda p, *_: (p, 0),
                              memory_space=E.pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((num_blocks, E.BLOCK), jnp.int32)
    grid_spec = E.pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks // E.BLOCKS_PER_PROG,),
        in_specs=[E.pl.BlockSpec(memory_space=E.pl.ANY)],
        out_specs=[out_spec, out_spec],
        scratch_shapes=[
            E.pltpu.VMEM((2, 8, E.WINDOW), jnp.float32),
            E.pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    interp = jax.default_backend() == "cpu"

    def run_kernel(tab, st_, tot):
        key, idx = E.pl.pallas_call(
            kernel, grid_spec=grid_spec, interpret=interp,
            out_shape=[out_shape, out_shape])(st_, tot.reshape(1), tab)
        return (jnp.sum(key) + jnp.sum(idx)).astype(jnp.float32)

    def chained(fn, *inputs):
        def step(carry, i):
            v = fn(carry, *inputs)
            return v.astype(jnp.float32) * 1e-30, v
        c, vs = jax.lax.scan(step, jnp.float32(0.0),
                             jnp.arange(args.frames))
        return c, vs

    if args.stage == "table":
        f = jax.jit(lambda fs, a, b2_, c, d: chained(
            lambda cr, fs_, a_, b_, c_, d_: jnp.sum(
                build_table(fs_, a_, b_, c_, d_, cr * 1e-20)),
            fs, a, b2_, c, d))
        inp = (first_slot, tx0, ty0, sw, dq)
    elif args.stage == "starts":
        f = jax.jit(lambda fs: chained(
            lambda cr, fs_: jnp.sum(build_starts(
                fs_ + (cr * 1e-20).astype(jnp.int32))).astype(jnp.float32),
            fs))
        inp = (first_slot,)
    elif args.stage == "kernel":
        f = jax.jit(lambda tab, st_, tot: chained(
            lambda cr, t_, s_, to_: run_kernel(t_ + cr * 1e-20, s_, to_),
            tab, st_, tot))
        inp = (table0, starts0, total)
    else:
        def slots_fn(s, c):
            proj = project_gaussians(s, c, config)
            return B.build_tile_bins(proj, h, w, config,
                                     debug_stage="slots")

        def chained_pose(s, c):
            def step(carry, i):
                cc = dataclasses.replace(
                    c, yaw=c.yaw + 0.01 * i.astype(jnp.float32)
                    + carry * 1e-20)
                v = slots_fn(s, cc)
                return v.astype(jnp.float32) * 1e-30, v
            return jax.lax.scan(step, jnp.float32(0.0),
                                jnp.arange(args.frames))
        f = jax.jit(chained_pose)
        inp = (scene, cam)

    t0 = time.time()
    jax.device_get(f(*inp))
    comp = time.time() - t0
    t0 = time.time()
    jax.device_get(f(*inp))
    dt = time.time() - t0
    ms = dt / args.frames * 1e3
    print(f"expandprobe n={args.n} dup={args.dup} k_cap={k_cap} "
          f"stage={args.stage} | {ms:.2f} ms/frame compile={comp:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
