"""Randomized parity fuzzer: tiled renderer vs the NumPy oracle.

Draws random scenes, cameras, and RenderConfigs (tile shapes, chunk,
capacity, sh degree, culling, compaction, transmittance path) and
asserts PSNR >= 45 dB plus overflow-count consistency.  Run on CPU
(interpret-mode Pallas) for bug hunting:

    python scripts/fuzz_parity.py [--cases N] [--seed S]

Any failing case prints its full recipe so it can be distilled into a
regression test.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--min-psnr", type=float, default=45.0)
    args = ap.parse_args()

    import jax
    if jax.default_backend() != "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import splat_tpu as st
    from splat_tpu.config import RenderConfig
    from splat_tpu.render.oracle import render_oracle
    from splat_tpu.render.tiled import render_tiled
    from splat_tpu.utils.image import psnr

    rng = np.random.default_rng(args.seed)
    failures = 0
    for case in range(args.cases):
        n = int(rng.choice([1, 7, 64, 300, 1500]))
        kind = rng.choice(["random", "surface"])
        if kind == "surface":
            scene = st.surface_scene(max(n, 50), seed=int(rng.integers(1e6)))
        else:
            scene = st.random_scene(
                n, seed=int(rng.integers(1e6)),
                extent=float(rng.uniform(0.5, 4.0)),
                scale_range=(float(rng.uniform(0.002, 0.02)),
                             float(rng.uniform(0.03, 0.3))))
        h = int(rng.choice([16, 40, 96, 130, 256]))
        w = int(rng.choice([16, 48, 100, 160, 250]))
        tile = int(rng.choice([16, 32, 64]))
        tile_y = int(rng.choice([0, 8, 16]))
        if (tile * (tile_y or tile)) % 128:
            tile_y = 0
        if (tile * (tile_y or tile)) % 128:
            tile = 16; tile_y = 8
        cam = st.Camera.create(
            h=h, w=w,
            position=tuple(rng.uniform(-1, 1, 3) * [2, 2, 1] + [0, 0, 3.5]),
            yaw=float(rng.uniform(-0.5, 0.5)),
            pitch=float(rng.uniform(-0.5, 0.5)))
        config = RenderConfig(
            tile_px=tile, tile_py=tile_y,
            chunk=int(rng.choice([64, 128])),
            max_dup_factor=float(rng.uniform(4.0, 9.0)),
            sh_degree=int(rng.choice([0, 1, 2, 3])),
            cull_pairs=bool(rng.random() < 0.3),
            subtile_exit=bool(rng.random() < 0.3),
            subtile_heavy_pairs=int(rng.choice([0, 256, 8192])),
            transmit_mxu=bool(rng.random() < 0.7),
            exact_color_accum=bool(rng.random() < 0.3),
            tight_radius=bool(rng.random() < 0.8),
            expand_impl=str(rng.choice(["auto", "xla"])),
            background=tuple(rng.uniform(0, 1, 3)))
        recipe = (f"case {case}: kind={kind} n={scene.num_gaussians} "
                  f"h={h} w={w} cfg={config}")
        try:
            img, stats = render_tiled(scene.pack_device(), cam, config,
                                      interpret=True, return_stats=True)
            img = np.asarray(img)
            gold = render_oracle(scene, cam, config)
            if int(stats["overflow"]) > 0:
                print(f"SKIP (overflow {int(stats['overflow'])}) {recipe}")
                continue
            p = psnr(img, gold)
            ok = p >= args.min_psnr and np.isfinite(img).all()
            tag = "ok  " if ok else "FAIL"
            print(f"{tag} psnr={p:6.2f} {recipe}")
            if not ok:
                failures += 1
        except Exception as e:  # noqa: BLE001 — fuzzer: report and go on
            print(f"CRASH {type(e).__name__}: {e}\n  {recipe}")
            failures += 1
    print(f"\n{failures} failures / {args.cases} cases")
    raise SystemExit(1 if failures else 0)


if __name__ == "__main__":
    main()
