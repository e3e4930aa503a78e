"""Pallas pair-expansion kernel vs the XLA diff-scatter-cumsum fallback.

The two implementations must be BIT-EXACT: both produce the same packed
(tile ‖ rank) keys, so the sorted pair order, per-tile ranges, and
gathered features are equal arrays, not just close ones.
"""

import dataclasses

import numpy as np

from splat_tpu.camera import Camera
from splat_tpu.config import RenderConfig
from splat_tpu.ops.projection import project_gaussians
from splat_tpu.render.binning import build_tile_bins
from splat_tpu.utils.fixtures import random_scene


def _assert_bins_equal(a, b):
    for name in ("tile_start", "tile_end", "ranks", "num_pairs",
                 "overflow"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name)
    np.testing.assert_array_equal(np.asarray(a.features),
                                  np.asarray(b.features))


def _compare(scene, cam, **cfg_kw):
    cfg_a = RenderConfig(chunk=64, **cfg_kw)
    cfg_x = dataclasses.replace(cfg_a, expand_impl="xla")
    proj = project_gaussians(scene, cam, cfg_a)
    ba = build_tile_bins(proj, cam.h, cam.w, cfg_a, interpret=True)
    bx = build_tile_bins(proj, cam.h, cam.w, cfg_x, interpret=True)
    _assert_bins_equal(ba, bx)
    return ba


def test_expand_matches_xla(small_random_scene):
    cam = Camera.create(h=96, w=128, position=(0.0, 0.0, 4.0))
    bins = _compare(small_random_scene, cam)
    assert int(bins.num_pairs) > 0
    assert int(bins.overflow) == 0


def test_expand_matches_xla_on_overflow():
    """Capacity overflow: both paths must truncate identically (deepest
    pairs dropped) and report the same overflow count."""
    scene = random_scene(4096, seed=4, extent=0.5, scale_range=(0.3, 0.8))
    cam = Camera.create(h=128, w=128, position=(0.0, 0.0, 2.0))
    bins = _compare(scene, cam, max_dup_factor=1.0)
    assert int(bins.overflow) > 0


def test_expand_matches_xla_multi_tile_spans():
    """Large splats spanning many tiles exercise the span decode."""
    scene = random_scene(256, seed=9, extent=1.0, scale_range=(0.1, 0.4))
    cam = Camera.create(h=160, w=224, position=(0.0, 0.0, 3.0))
    _compare(scene, cam)


def test_in_kernel_cull_is_lossless():
    """cull_pairs drops only pairs whose every pixel fails the alpha
    cutoff, so the rendered image must be EXACTLY the no-cull image —
    while actually culling something on a big-splat scene."""
    from splat_tpu.render.tiled import render_tiled
    # Corner-tile culling needs multi-tile splats with real margin beyond
    # the kill radius (8-px quantization eats ~2 units): radii ~50+ px.
    scene = random_scene(256, seed=5, extent=0.8, scale_range=(0.4, 1.0))
    cam = Camera.create(h=256, w=256, position=(0.0, 0.0, 2.5))
    cfg = RenderConfig(chunk=64)
    cfg_cull = dataclasses.replace(cfg, cull_pairs=True)
    img0, s0 = render_tiled(scene, cam, cfg, interpret=True,
                            return_stats=True)
    img1, s1 = render_tiled(scene, cam, cfg_cull, interpret=True,
                            return_stats=True)
    assert int(s1["num_pairs"]) < int(s0["num_pairs"]), \
        "cull removed nothing on a big-splat scene"
    # Culled pairs contribute exactly zero alpha, but removing them shifts
    # the kernel's chunk boundaries, and the saturation early-exit is
    # chunk-granular — so images agree to the saturation tolerance
    # (contributions below transmittance 1/255), not bit-exactly.
    from splat_tpu.utils.image import psnr
    p = psnr(np.asarray(img0), np.asarray(img1))
    assert p >= 60.0, f"cull changed the image beyond tolerance: {p:.1f} dB"


def test_expand_auto_falls_back_on_huge_tile_grid():
    """ntx > 255 exceeds the expand kernel's byte-split bounds, so 'auto'
    must take the XLA expansion automatically and still render right."""
    from splat_tpu.render import expand as _expand
    from splat_tpu.render.dense import render_dense
    from splat_tpu.render.tiled import render_tiled
    from splat_tpu.utils.image import psnr

    scene = random_scene(64, seed=2, extent=1.0, scale_range=(0.05, 0.2))
    w = 16 * (_expand.MAX_TILE_COORD + 2)   # ntx = 257 at tile_px=16
    cam = Camera.create(h=16, w=w, position=(0.0, 0.0, 4.0))
    cfg = RenderConfig(chunk=64, tile_px=16)
    img = np.asarray(render_tiled(scene, cam, cfg, interpret=True))
    want = np.asarray(render_dense(scene, cam, cfg))
    assert img.shape == want.shape == (16, w, 3)
    p = psnr(img, want)
    assert p >= 45.0, f"huge-grid fallback PSNR {p:.2f}"


def test_full_32bit_key_order_trick():
    """When tile+rank bits fill all 32, binning XORs the key space with
    0x80000000 so SIGNED int32 sort order equals unsigned order.  Pin the
    trick itself: for random (tile, rank) packs occupying the sign bit,
    sorting the XORed keys as signed ints must order pairs by (tile,
    rank) exactly, and rank extraction from the low bits is unaffected."""
    rng = np.random.default_rng(0)
    bits_rank = 20
    tiles = rng.integers(0, 4082, size=4096, dtype=np.int64)   # 12 bits
    ranks = rng.integers(0, 1 << bits_rank, size=4096, dtype=np.int64)
    unsigned = (tiles << bits_rank) | ranks                    # 32 bits
    keys = (unsigned & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    keys ^= np.int32(-(1 << 31))
    order_signed = np.argsort(keys, kind="stable")
    order_unsigned = np.argsort(unsigned, kind="stable")
    np.testing.assert_array_equal(order_signed, order_unsigned)
    # low rank bits survive the sign flip untouched
    np.testing.assert_array_equal(keys & ((1 << bits_rank) - 1), ranks)


def test_expand_empty_scene():
    """Camera looking away: zero visible pairs, all-sentinel keys."""
    scene = random_scene(128, seed=1)
    cam = Camera.create(h=64, w=64, position=(0.0, 0.0, 50.0),
                        target=(0.0, 0.0, 100.0))
    bins = _compare(scene, cam)
    assert int(bins.num_pairs) == 0


def test_owner_window_bound_edge():
    """Adversarial owner-span case for the CWIN contraction bound: with
    counts = [2, 1, 1, ...] every 256-slot block's window start lands at
    an odd slot index, so the 128-align-down slack is 127 and the block's
    257th owner candidate sits exactly at relative column 383 = CWIN - 1
    (render/expand.py constants comment).  Keys are checked against a
    direct NumPy model of the expansion."""
    import jax.numpy as jnp
    from splat_tpu.render import expand as _expand

    n = 700
    counts = np.ones(n, np.int64)
    counts[0] = 2
    first_slot = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = int(counts.sum())
    ntx, nty = 7, 5
    num_tiles = ntx * nty
    tx0 = (np.arange(n) % (ntx - 1)).astype(np.int32)  # sw=2 fits for g0
    ty0 = ((np.arange(n) // 7) % nty).astype(np.int32)
    sw = np.ones(n, np.int32)
    sw[0] = 2
    bits_rank = max(int(n - 1).bit_length(), 1)
    k_cap = _expand.BLOCK * _expand.BLOCKS_PER_PROG  # one grain = 4096

    key = np.asarray(_expand.expand_pair_keys(
        jnp.asarray(first_slot, jnp.int32), jnp.asarray(tx0),
        jnp.asarray(ty0), jnp.asarray(sw), jnp.asarray(total, jnp.int32),
        n=n, k_cap=k_cap, ntx=ntx, num_tiles=num_tiles,
        bits_rank=bits_rank, tile_wh=(16, 16), key_xor=0,
        interpret=True))

    # NumPy model: owner(k) = searchsorted(first_slot, k, 'right') - 1
    slots = np.arange(k_cap)
    owner = np.searchsorted(first_slot, slots, side="right") - 1
    owner = np.clip(owner, 0, n - 1)
    r = slots - first_slot[owner]
    dy = r // sw[owner]
    dx = r - dy * sw[owner]
    tile = (ty0[owner] + dy) * ntx + tx0[owner] + dx
    want = (tile << bits_rank) | owner
    want = np.where(slots < total, want, (num_tiles << bits_rank) | owner)
    np.testing.assert_array_equal(key, want.astype(np.int32))


def test_depth_key_expand_matches_xla(small_random_scene):
    """binning_key='depth': the Pallas kernel's (key, index) outputs and
    the XLA fallback's must be bit-exact, so the sorted pair order, tile
    ranges, and gathered features are equal arrays."""
    cam = Camera.create(h=96, w=128, position=(0.0, 0.0, 4.0))
    bins = _compare(small_random_scene, cam, binning_key="depth")
    assert int(bins.num_pairs) > 0
    # capacity truncation must also agree bit-exactly; cull_pairs is NOT
    # compared here — the in-kernel 8-px-quantized cull and the XLA
    # exact-threshold cull are different (both lossless) tests, and the
    # depth render path under cull is covered by test_tiled's parity
    _compare(small_random_scene, cam, binning_key="depth",
             max_dup_factor=1.0)


def test_depth_key_owner_window_edge():
    """Depth-mode twin of test_owner_window_bound_edge: the kernel must
    emit (tile ‖ depth_q) keys plus the owner-index payload, with the
    three depth bytes riding the packed <= 255 table rows.  Checked
    against a direct NumPy model, including the odd-aligned owner-window
    case (counts = [2, 1, 1, ...])."""
    import jax.numpy as jnp
    from splat_tpu.render import expand as _expand

    n = 700
    counts = np.ones(n, np.int64)
    counts[0] = 2
    first_slot = np.concatenate([[0], np.cumsum(counts)[:-1]])
    total = int(counts.sum())
    ntx, nty = 7, 5
    num_tiles = ntx * nty
    tx0 = (np.arange(n) % (ntx - 1)).astype(np.int32)
    ty0 = ((np.arange(n) // 7) % nty).astype(np.int32)
    sw = np.ones(n, np.int32)
    sw[0] = 2
    depth_bits = 21
    rng = np.random.default_rng(7)
    dq = rng.integers(0, 1 << depth_bits, size=n).astype(np.int32)
    k_cap = _expand.BLOCK * _expand.BLOCKS_PER_PROG
    key_xor = 0

    key, idx = _expand.expand_pair_keys(
        jnp.asarray(first_slot, jnp.int32), jnp.asarray(tx0),
        jnp.asarray(ty0), jnp.asarray(sw), jnp.asarray(total, jnp.int32),
        n=n, k_cap=k_cap, ntx=ntx, num_tiles=num_tiles,
        bits_rank=max(int(n - 1).bit_length(), 1), tile_wh=(16, 16),
        key_xor=key_xor, depth_q=jnp.asarray(dq), depth_bits=depth_bits,
        interpret=True)
    key, idx = np.asarray(key), np.asarray(idx)

    slots = np.arange(k_cap)
    owner = np.searchsorted(first_slot, slots, side="right") - 1
    owner = np.clip(owner, 0, n - 1)
    r = slots - first_slot[owner]
    dy = r // sw[owner]
    dx = r - dy * sw[owner]
    tile = (ty0[owner] + dy) * ntx + tx0[owner] + dx
    want = (tile.astype(np.int64) << depth_bits) | dq[owner]
    sent = (num_tiles << depth_bits) | dq[owner]
    want = np.where(slots < total, want, sent)
    np.testing.assert_array_equal(
        key, (want & 0xFFFFFFFF).astype(np.uint32).view(np.int32))
    np.testing.assert_array_equal(idx, owner.astype(np.int32))
