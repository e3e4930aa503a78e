"""Device-chained benchmark harness shared by bench.py and the CLI.

One implementation of the timing + audit protocol (round-2 review flagged
the drift risk of the two copies): F frames rendered inside one jitted
lax.scan with a data dependency between frames — host dispatch on a
remote-attached TPU costs ~100 ms/call and async block_until_ready lies
(see scripts/devtime.py) — followed by a capacity audit over the SAME
camera sweep, because a frame that overflows the duplication buffer
silently drops its deepest pairs and a capacity regression would
otherwise LOOK like a speedup.
"""

from __future__ import annotations

import dataclasses
import time


def chained_bench(scene, camera, config, frames: int) -> dict:
    """Compile + time a device-chained yaw sweep; audit its pair load.

    Returns a dict with ms_per_frame, fps, compile_s, mean_pixel, and the
    sweep-max overflow / num_pairs / visible.  The fps number is only
    honest when overflow == 0 (callers decide how to surface that).
    """
    import jax
    import jax.numpy as jnp

    from splat_tpu.render.tiled import render_tiled

    def chained(scene, cam):
        def step(carry, i):
            c = dataclasses.replace(
                cam, yaw=cam.yaw + 0.01 * i.astype(jnp.float32)
                + carry * 1e-20)
            img = render_tiled(scene, c, config)
            return jnp.mean(img), jnp.mean(img)
        return jax.lax.scan(step, jnp.float32(0.0), jnp.arange(frames))

    def audit(scene, cam):
        def step(_, i):
            c = dataclasses.replace(
                cam, yaw=cam.yaw + 0.01 * i.astype(jnp.float32))
            _, stats = render_tiled(scene, c, config, return_stats=True)
            return 0.0, (stats["overflow"], stats["num_pairs"],
                         stats["visible"])
        _, out = jax.lax.scan(step, jnp.float32(0.0), jnp.arange(frames))
        return jax.tree.map(jnp.max, out)

    f = jax.jit(chained)
    t0 = time.time()
    jax.device_get(f(scene, camera))
    compile_s = time.time() - t0
    t0 = time.time()
    _, means = jax.device_get(f(scene, camera))
    dt = (time.time() - t0) / frames
    overflow, num_pairs, visible = (
        int(x) for x in jax.device_get(jax.jit(audit)(scene, camera)))
    return {
        "ms_per_frame": dt * 1e3,
        "fps": 1.0 / dt,
        "compile_s": compile_s,
        "mean_pixel": float(means.mean()),
        "overflow": overflow,
        "num_pairs": num_pairs,
        "visible": visible,
    }
