"""Benchmark harness.  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: 1080p frames/sec on a 1M-gaussian synthetic scene (the
reference publishes no numbers — BASELINE.md; baseline target is the
north-star 30 FPS at 1080p, so vs_baseline = fps / 30).

Extra per-config results go to stderr so the driver's single-line contract
holds on stdout.
"""

from __future__ import annotations

import json
import sys
import time


def _time_fn(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax

    from splat_tpu.camera import Camera
    from splat_tpu.config import RenderConfig
    from splat_tpu.render.api import render_fn
    from splat_tpu.utils.fixtures import random_scene

    config = RenderConfig()

    # Scale the headline scene to hardware; overridable for smoke tests.
    import os
    n = int(os.environ.get("SPLAT_BENCH_N", 1_000_000))
    h = int(os.environ.get("SPLAT_BENCH_H", 1080))
    w = int(os.environ.get("SPLAT_BENCH_W", 1920))
    iters = int(os.environ.get("SPLAT_BENCH_ITERS", 10))

    scene = random_scene(n, seed=0, extent=3.0, scale_range=(0.004, 0.03))
    camera = Camera.create(h=h, w=w, position=(0.0, 0.0, 4.0))
    f = render_fn("tiled", config)

    try:
        dt = _time_fn(f, scene, camera, iters=iters)
    except Exception as e:  # pragma: no cover - report failure explicitly
        print(f"bench failed: {type(e).__name__}: {e}", file=sys.stderr)
        print(json.dumps({"metric": f"{h}p_fps_{n}_gaussians",
                          "value": 0.0, "unit": "frames/sec",
                          "vs_baseline": 0.0}))
        return

    fps = 1.0 / dt
    print(f"[bench] {n} gaussians @ {w}x{h}: {dt * 1e3:.2f} ms/frame "
          f"({fps:.2f} FPS)", file=sys.stderr)
    print(json.dumps({
        "metric": f"{h}p_fps_{n}_gaussians",
        "value": round(fps, 3),
        "unit": "frames/sec",
        # north star: 30 FPS at 1080p on one chip (BASELINE.md)
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
