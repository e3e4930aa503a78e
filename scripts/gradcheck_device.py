"""Compiled-Mosaic vs interpret-mode gradient comparison on the REAL
chip (the diff-path miscompile check CLAUDE.md requires after any
render/diff.py change — interpret-mode CPU tests cannot catch
Mosaic-only miscompiles).

Runs jax.grad through render_tiled_diff twice — compiled kernels vs
interpret=True — on the same scene/pose, and reports per-leaf cosine
similarity and max rel diff.  End-to-end gradients legitimately differ
~2-4e-3 between backends through u16-quantization boundary flips
upstream of the kernels (ARCHITECTURE.md); the gate here is
cos >= 0.999 per leaf.

Usage: python scripts/gradcheck_device.py [--n 20000]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--h", type=int, default=300)
    ap.add_argument("--w", type=int, default=400)
    ap.add_argument("--gate", type=float, default=0.999)
    ap.add_argument("--sat-exit", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import splat_tpu as st
    from splat_tpu.config import RenderConfig
    from splat_tpu.render.diff import render_tiled_diff
    from splat_tpu.utils.compilecache import enable_persistent_cache

    enable_persistent_cache()
    scene = jax.tree.map(jnp.asarray, st.surface_scene(args.n, seed=11))
    cam = st.Camera.create(h=args.h, w=args.w, position=(0.0, -1.0, 3.5))
    config = RenderConfig(max_dup_factor=3.0,
                          train_sat_exit=args.sat_exit)

    def loss(s, interp):
        img = render_tiled_diff(s, cam, config, interpret=interp)
        return jnp.mean((img - 0.25) ** 2)

    g_c = jax.jit(jax.grad(lambda s: loss(s, False)))(scene)
    g_i = jax.jit(jax.grad(lambda s: loss(s, True)))(scene)
    worst = 1.0
    for name in ("means", "quats", "scales", "opacities", "sh"):
        a = np.asarray(getattr(g_c, name)).ravel()
        b = np.asarray(getattr(g_i, name)).ravel()
        cos = float(a @ b / np.sqrt((a @ a) * (b @ b) + 1e-30))
        rel = float(np.abs(a - b).max() / (np.abs(b).max() + 1e-30))
        worst = min(worst, cos)
        print(f"gradcheck[{name}]: cos={cos:.6f} max_rel={rel:.2e} "
              f"backend={jax.default_backend()}")
    print(f"gradcheck: worst cos {worst:.6f} (gate {args.gate})")
    if worst < args.gate:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
