"""Microbenchmark: strategies for the K-sized feature expansion in binning.

The binning stage must produce a (16, K) feature array whose columns are
per-gaussian features expanded to (gaussian, tile) pairs and permuted into
(tile, depth) order.  Candidate lowerings differ wildly on TPU:

  a) take((16, N), idx, axis=1)        — lane-axis gather
  b) take((N, 16), idx, axis=0) + .T   — row gather + transpose
  c) row gather only (no transpose)    — isolates the transpose cost
  d) lax.sort with 12 payload operands — sort moves the data instead
  e) 1-D gathers row by row (16x)      — sixteen (N,)->(K,) gathers
  f) one-hot segment matmul            — MXU does the expansion (N->K)

Run on the real chip: python scripts/gather_bench.py [--n 1000000 --k 6000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=6_000_000)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n, k = args.n, args.k
    rng = np.random.default_rng(0)
    feats_fn = jnp.asarray(rng.normal(size=(16, n)).astype(np.float32))
    feats_nk = jnp.asarray(np.ascontiguousarray(np.asarray(feats_fn).T))
    # realistic index pattern: mostly-ascending with duplicates (expansion),
    # then shuffled by a tile sort
    base = np.sort(rng.integers(0, n, k)).astype(np.int32)
    perm = rng.permutation(k).astype(np.int32)
    idx_sorted = jnp.asarray(base)            # expansion-like
    idx_shuffled = jnp.asarray(base[perm])    # post-tile-sort-like
    tile_key = jnp.asarray(rng.integers(0, 2048, k).astype(np.int32))

    def devtime(name, fn, *xs, iters=args.iters):
        # Two rule-10 traps this helper must dodge (both produced bogus
        # numbers in earlier versions):
        #  * loop-INVARIANT operands let XLA hoist the whole body out of
        #    the scan (a 20x under-report) — so the index operand is
        #    perturbed by `carry * 0`, which XLA cannot fold to zero
        #    (f32 NaN semantics), making every iteration's gather live;
        #  * consuming one element lets XLA DCE the rest of the data
        #    movement — so the FULL output feeds the carry via jnp.sum.
        def chained(*a):
            def step(carry, _):
                j = (carry * 0.0).astype(jnp.int32)
                out = fn(*[x + j if x.ndim == 1 and x.dtype == jnp.int32
                           else x for x in a])
                return jnp.sum(jnp.asarray(out, jnp.float32)) * 1e-20 \
                    + carry, 0.
            c, _ = jax.lax.scan(step, jnp.float32(0.), None, length=iters)
            return c
        f = jax.jit(chained)
        jax.device_get(f(*xs))
        t0 = time.time(); jax.device_get(f(*xs))
        print(f"{name}: {(time.time()-t0)/iters*1e3:.2f} ms", flush=True)

    for label, idx in [("sorted", idx_sorted), ("shuffled", idx_shuffled)]:
        devtime(f"a lane-gather (16,N)axis1 {label}",
                lambda ft, i: jnp.sum(jnp.take(ft, i, axis=1)),
                feats_fn, idx)
        # the transpose result must be consumed in FULL with row-varying
        # weights: a plain sum (or one row) lets XLA elide the relayout
        devtime(f"b row-gather+T (N,16) {label}",
                lambda fn_, i: jnp.take(fn_, i, axis=0).T
                * jnp.arange(1.0, 17.0)[:, None],
                feats_nk, idx)
        devtime(f"c row-gather only {label}",
                lambda fn_, i: jnp.sum(jnp.take(fn_, i, axis=0)),
                feats_nk, idx)
        devtime(f"e 16x 1-D gathers {label}",
                lambda ft, i: sum(jnp.sum(ft[r][i]) for r in range(16)),
                feats_fn, idx)

    # d) sort with payload: expand first via 1-D gathers (cheapest expansion
    #    winner above), then single-key sort carrying 11 payloads
    def sort_payload(ft, i, key):
        cols = [ft[r][i] for r in range(11)]
        out = jax.lax.sort((key, *cols), num_keys=1, is_stable=True)
        return jnp.sum(out[1])
    devtime("d expand(1-D)+sort 11 payloads", sort_payload,
            feats_fn, idx_sorted, tile_key)
    devtime("d2 sort key+idx only",
            lambda key, i: jnp.sum(jax.lax.sort((key, i), num_keys=1,
                                                is_stable=True)[1]),
            tile_key, idx_sorted)


if __name__ == "__main__":
    main()
