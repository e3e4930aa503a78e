"""Measure the a2a-vs-gather routing crossover (ARCHITECTURE.md §Multi-chip).

For the sharded tiled renderer (parallel/sharding.py), compares per-chip
collective traffic of the two record-routing strategies at mesh sizes
n_g ∈ {2, 4, 8} on trained-like and uniform scene distributions:

  gather:  every chip replicates all records    -> (n_g - 1) * N_local * 13 f32
  a2a:     route by slab ownership, capacity
           cap = min(1, 4/n_g) * N_local        -> n_g * cap * 13 f32
           (+ overflow count when a (src, dst) pair exceeds cap)

The slab-touch counts come from the real projection at a representative
pose; the script also runs ONE actual 8-chip mesh render per scene and
asserts the measured routing overflow matches the analytic prediction.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/a2a_crossover.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import splat_tpu as st
    from splat_tpu.config import RenderConfig
    from splat_tpu.ops.projection import project_gaussians

    n = 200_000
    h = w = 512
    config = RenderConfig()
    cam = st.Camera.create(h=h, w=w, position=(0.0, 0.0, 4.0))

    scenes = {
        "surface": st.surface_scene(n, seed=0),
        "random": st.random_scene(n, seed=0, extent=3.0,
                                  scale_range=(0.004, 0.03)),
    }

    for kind, scene in scenes.items():
        proj = jax.jit(lambda s, c: project_gaussians(s, c, config))(
            scene, cam)
        cy = np.asarray(proj.center_px[:, 1])
        ry = np.asarray(proj.radius_px[:, 1])
        vis = np.asarray(proj.visible)
        lo, hi = cy - ry, cy + ry
        print(f"\n[{kind}] N={n} {w}x{h} visible={int(vis.sum())}")
        for n_g in (2, 4, 8):
            h_local = h // n_g
            n_local = n // n_g
            # slabs touched per splat (the quantity the crossover math is
            # about): a splat's records go to every slab its bbox spans
            slabs = np.zeros(n, np.int64)
            sent = np.zeros((n_g, n_g), np.int64)   # [src shard, dst slab]
            shard_of = np.arange(n) // n_local
            for d in range(n_g):
                y0 = d * h_local
                t = vis & (hi > y0) & (lo < y0 + h_local)
                slabs += t
                for s_ in range(n_g):
                    sent[s_, d] = int(t[shard_of == s_].sum())
            cap = min(max(128, -(-int(n_local * min(1, 4 / n_g)) // 128)
                          * 128), n_local)
            a2a_mb = n_g * cap * 13 * 4 / 2**20
            gather_mb = (n_g - 1) * n_local * 13 * 4 / 2**20
            overflow = int(np.maximum(sent - cap, 0).sum())
            mean_slabs = float(slabs[vis].mean()) if vis.any() else 0.0
            # same loads with spatially-decorrelated shards
            # (GaussianScene.permuted): sent[s, d] -> touches[d] / n_g
            rng = np.random.default_rng(1)
            shard_perm = shard_of[rng.permutation(n)]
            sent_p = np.zeros((n_g, n_g), np.int64)
            for d in range(n_g):
                y0 = d * h_local
                t = vis & (hi > y0) & (lo < y0 + h_local)
                for s_ in range(n_g):
                    sent_p[s_, d] = int(t[shard_perm == s_].sum())
            overflow_p = int(np.maximum(sent_p - cap, 0).sum())
            print(f"  n_g={n_g}: slabs/splat={mean_slabs:.2f} "
                  f"cap={cap} a2a={a2a_mb:.1f} MB/chip "
                  f"gather={gather_mb:.1f} MB/chip "
                  f"ratio={a2a_mb / gather_mb:.2f} "
                  f"max_sent={int(sent.max())} "
                  f"pred_overflow={overflow} "
                  f"(permuted: max_sent={int(sent_p.max())} "
                  f"overflow={overflow_p})")

        # one real mesh run at n_g=8: measured routing overflow must match
        if len(jax.devices()) >= 8:
            from splat_tpu.parallel.sharding import (make_mesh,
                                                     render_sharded_tiled)
            mesh = make_mesh(n_data=1, n_gaussian=8)
            _, got = render_sharded_tiled(scene, cam, mesh, config,
                                          route="a2a")
            # note: the returned count also includes slab BINNING overflow
            # (zero at default capacity for these scenes)
            print(f"  mesh n_g=8: measured overflow={int(got)} "
                  f"(analytic {overflow})")
            assert int(got) == overflow, (int(got), overflow)


if __name__ == "__main__":
    main()
