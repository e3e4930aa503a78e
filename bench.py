"""Benchmark harness.  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: 1080p frames/sec on a 1M-gaussian synthetic scene (the
reference publishes no numbers — BASELINE.md; the north-star target is 30
FPS at 1080p on one chip, so vs_baseline = fps / 30).

Timing is device-chained: F frames rendered inside one jitted lax.scan with
a data dependency between frames, so the result is true device throughput —
host dispatch on a remote-attached TPU costs ~100 ms/call and async
block_until_ready lies (see scripts/devtime.py).

Extra detail goes to stderr so the one-line stdout contract holds.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    import splat_tpu as st
    from splat_tpu.config import RenderConfig
    from splat_tpu.render.tiled import render_tiled

    n = int(os.environ.get("SPLAT_BENCH_N", 1_000_000))
    h = int(os.environ.get("SPLAT_BENCH_H", 1080))
    w = int(os.environ.get("SPLAT_BENCH_W", 1920))
    # 60 device-chained frames: long enough that per-call dispatch and
    # scan setup amortize to the sustained throughput (20 frames reads
    # ~3% slow; the 120-frame ladder-5 orbit matches 60 within noise).
    frames = int(os.environ.get("SPLAT_BENCH_FRAMES", 60))

    # Tuned capacity: every K-sized binning op scales with k_cap, and the
    # audit below PROVES no frame overflowed — so the headline runs at the
    # tight setting (trained-like scenes at tile 32 produce ~2.01 pairs
    # per gaussian over the whole camera sweep; 2.05 leaves ~2% headroom,
    # grain-rounding adds a little more, and the audit zeroes the score
    # if any frame ever overflows).
    config = RenderConfig(
        max_dup_factor=float(os.environ.get("SPLAT_BENCH_DUP", 2.05)))
    kind = os.environ.get("SPLAT_BENCH_SCENE", "random")
    if kind == "surface":
        scene = st.surface_scene(n, seed=0).to_device()
    else:
        scene = st.random_scene(n, seed=0, extent=3.0,
                                scale_range=(0.004, 0.03)).to_device()
    camera = st.Camera.create(h=h, w=w, position=(0.0, 0.0, 4.0))

    def chained(scene, cam):
        def step(carry, i):
            c = dataclasses.replace(
                cam, yaw=cam.yaw + 0.01 * i.astype(jnp.float32)
                + carry * 1e-20)
            img = render_tiled(scene, c, config)
            return jnp.mean(img), jnp.mean(img)
        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(frames))

    # Capacity audit over the same camera sweep: a frame that overflows the
    # duplication buffer silently drops its deepest pairs, so a capacity
    # regression would otherwise LOOK like a speedup.  The headline number is
    # only valid if overflow == 0 (reported in the JSON line either way).
    def audit(scene, cam):
        def step(_, i):
            c = dataclasses.replace(
                cam, yaw=cam.yaw + 0.01 * i.astype(jnp.float32))
            _, stats = render_tiled(scene, c, config, return_stats=True)
            return 0.0, (stats["overflow"], stats["num_pairs"],
                         stats["visible"])
        _, out = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(frames))
        return jax.tree.map(jnp.max, out)

    try:
        f = jax.jit(chained)
        t0 = time.time()
        jax.device_get(f(scene, camera))
        print(f"[bench] compile+first: {time.time() - t0:.1f}s",
              file=sys.stderr)
        t0 = time.time()
        carry, means = jax.device_get(f(scene, camera))
        dt = (time.time() - t0) / frames
        overflow, num_pairs, visible = (
            int(x) for x in jax.device_get(jax.jit(audit)(scene, camera)))
    except Exception as e:  # pragma: no cover — report failure explicitly
        print(f"bench failed: {type(e).__name__}: {e}", file=sys.stderr)
        print(json.dumps({"metric": f"{h}p_fps_{n}_gaussians",
                          "value": 0.0, "unit": "frames/sec",
                          "vs_baseline": 0.0}))
        return

    fps = 1.0 / dt
    print(f"[bench] {n} gaussians @ {w}x{h}: {dt * 1e3:.2f} ms/frame "
          f"({fps:.2f} FPS, device-chained x{frames}); "
          f"mean pixel {float(means.mean()):.4f}; "
          f"visible={visible} pairs={num_pairs} overflow={overflow}",
          file=sys.stderr)
    if overflow > 0:
        print(f"[bench] WARNING: duplication-buffer overflow ({overflow} "
              f"pairs dropped) — FPS number measures a truncated render; "
              f"raise RenderConfig.max_dup_factor", file=sys.stderr)
    print(json.dumps({
        "metric": f"{h}p_fps_{n}_gaussians",
        "value": round(fps, 3) if overflow == 0 else 0.0,
        "unit": "frames/sec",
        # north star: 30 FPS at 1080p on one chip (BASELINE.md)
        "vs_baseline": round(fps / 30.0, 3) if overflow == 0 else 0.0,
        "overflow": overflow,
        "num_pairs": num_pairs,
        "visible": visible,
    }))


if __name__ == "__main__":
    main()
