"""Micro-benchmarks for the binning primitives on the real device.

Device-chained timing (same protocol as devtime.py): each iteration's
input depends on the previous result, so the scan serializes on device
and host-side wall clock over the whole scan is honest.

Usage: python scripts/micro.py --which sort1,sortp4,gcol,grow --k 2211840
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=2211840)   # bench k_cap
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--which", type=str, default="all")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    k, n = args.k, args.n
    rng = np.random.default_rng(0)
    key0 = jnp.asarray(rng.integers(0, 2**30, size=k, dtype=np.int32))
    idx0 = jnp.asarray(rng.integers(0, n, size=k, dtype=np.int32))
    # production-like indices: ~2040 tile segments, ascending within each
    segs = np.sort(rng.integers(0, n, size=(2040, -(-k // 2040))), axis=1)
    idx_seg = jnp.asarray(segs.reshape(-1)[:k].astype(np.int32))
    fcol = jnp.asarray(rng.random((16, n), dtype=np.float32))
    frow = jnp.asarray(fcol.T)
    pay = [jnp.asarray(rng.random(k, dtype=np.float32)) for _ in range(12)]

    def bench(name, fn, *xs):
        def step(carry, _):
            out = fn(carry, *xs)
            return out, ()
        def chained(c0, *xs):
            c, _ = jax.lax.scan(lambda c, _: (fn(c, *xs), ()), c0,
                                jnp.arange(args.iters))
            return c
        f = jax.jit(chained)
        c0 = jnp.int32(0)
        jax.device_get(f(c0, *xs))           # compile + warm
        t0 = time.time()
        jax.device_get(f(c0, *xs))
        ms = (time.time() - t0) / args.iters * 1e3
        print(f"{name:14s} {ms:8.3f} ms/iter")
        return ms

    which = args.which.split(",") if args.which != "all" else [
        "sort1", "sortp1", "sortp2", "sortp4", "sortp12",
        "gcol", "gcol8", "gcol4", "grow", "scat1"]

    for w in which:
        if w == "sort1":
            bench("sort1", lambda c, key: jax.lax.sort(key ^ (c & 1))[0]
                  .astype(jnp.int32), key0)
        elif w.startswith("sortp"):
            m = int(w[5:])
            def f(c, key, *ps):
                out = jax.lax.sort((key ^ (c & 1),) + ps, num_keys=1)
                return (out[0][0] + out[1][0]).astype(jnp.int32)
            bench(w, f, key0, *pay[:m])
        elif w == "gcol":
            bench("gcol16", lambda c, idx, t: jnp.take(
                t, idx ^ (c & 1), axis=1)[0, 0].astype(jnp.int32),
                idx0, fcol)
        elif w == "gcol8":
            bench("gcol8", lambda c, idx, t: jnp.take(
                t[:8], idx ^ (c & 1), axis=1)[0, 0].astype(jnp.int32),
                idx0, fcol)
        elif w == "gcol4":
            bench("gcol4", lambda c, idx, t: jnp.take(
                t[:4], idx ^ (c & 1), axis=1)[0, 0].astype(jnp.int32),
                idx0, fcol)
        elif w.startswith("gseg"):
            m = int(w[4:])
            bench(f"gseg{m}", lambda c, idx, t: jnp.take(
                t[:m], idx ^ (c & 1), axis=1)[0, 0].astype(jnp.int32),
                idx_seg, fcol)
        elif w.startswith("gperm"):
            # N-sized gather with a random-permutation index (the
            # depth-order N-gather), m rows
            m = int(w[5:])
            perm = jnp.asarray(rng.permutation(n).astype(np.int32))
            bench(f"gperm{m}", lambda c, idx, t: jnp.take(
                t[:m], idx ^ (c & 1), axis=1)[0, 0].astype(jnp.int32),
                perm, fcol)
        elif w == "grow":
            bench("grow16", lambda c, idx, t: jnp.take(
                t, idx ^ (c & 1), axis=0)[0, 0].astype(jnp.int32),
                idx0, frow)
        elif w == "scat1":
            def f(c, idx, v):
                z = jnp.zeros((n,), jnp.float32).at[idx ^ (c & 1)].add(
                    v, mode="drop")
                return z[0].astype(jnp.int32)
            bench("scat1", f, idx0, pay[0])


if __name__ == "__main__":
    main()
