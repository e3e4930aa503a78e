"""Host-side saturation replay: per-tile transmittance evolution at the
1M@1080p bench points, to size the prize of multi-stage phase compaction.

For every tile we walk its depth-ordered pairs in 128-wide windows
(matching the kernel) and record the first window index at which
<= 4 / 2 / 1 / 0 of its eight 8x16 pixel groups are still unsaturated
(max T >= 1/255).  Cost models (pair-pixels walked):

  light   : full width (1024 rows) until ALL pixels saturate (t0)
  current : full until t4, then 512 rows until t0   (subtile_exit today)
  multi   : full until t4, 512 until t2, 256 until t1, 128 until t0
"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
import splat_tpu as st
from splat_tpu.config import RenderConfig
from splat_tpu.ops.projection import project_gaussians

H, W, N, TP, CHUNK = 1080, 1920, 1_000_000, 32, 128
ALPHA_MIN, ALPHA_CLAMP = 1.0 / 255.0, 0.99


def replay(kind):
    if kind == "surface":
        scene = st.surface_scene(N, seed=0)
    else:
        scene = st.random_scene(N, seed=0, extent=3.0,
                                scale_range=(0.004, 0.03))
    cam = st.Camera.create(h=H, w=W, position=(0.0, 0.0, 4.0))
    cfg = RenderConfig()
    p = jax.jit(lambda s, c: project_gaussians(s, c, cfg))(
        scene.pack_device(), cam)
    vis = np.asarray(p.visible)
    idx = np.nonzero(vis)[0]
    cx, cy = np.float32(np.asarray(p.center_px))[idx].T
    a, b, c = np.float32(np.asarray(p.conic))[idx].T
    rx, ry = np.float32(np.asarray(p.radius_px))[idx].T
    op = np.float32(np.asarray(p.opacity))[idx]
    depth = np.float32(np.asarray(p.depth))[idx]
    ntx, nty = -(-W // TP), -(-H // TP)

    tx0 = np.clip(np.floor((cx - rx) / TP), 0, ntx - 1).astype(np.int64)
    tx1 = np.clip(np.floor((cx + rx) / TP), 0, ntx - 1).astype(np.int64)
    ty0 = np.clip(np.floor((cy - ry) / TP), 0, nty - 1).astype(np.int64)
    ty1 = np.clip(np.floor((cy + ry) / TP), 0, nty - 1).astype(np.int64)
    sw, sh = tx1 - tx0 + 1, ty1 - ty0 + 1
    counts = sw * sh
    g = np.repeat(np.arange(len(cx)), counts)
    r_of = np.arange(len(g)) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    dy_t = r_of // sw[g]
    dx_t = r_of - dy_t * sw[g]
    tile = (ty0[g] + dy_t) * ntx + (tx0[g] + dx_t)
    order = np.lexsort((depth[g], tile))
    tile_s, g_s = tile[order], g[order]
    edges = np.searchsorted(tile_s, np.arange(ntx * nty + 1))

    # tile-local pixel grid, grouped 8x16 (gy 4, gx 2): group id of each
    # of the 1024 linear pixels
    py, px = np.mgrid[0:TP, 0:TP]
    gid = (py // 8) * 2 + (px // 16)          # (32, 32) in 0..7
    gid = gid.ravel()
    group_masks = [gid == k for k in range(8)]

    tstats = []   # (nchunks, t4, t2, t1, t0) per nonempty tile
    for t in range(ntx * nty):
        lo, hi = edges[t], edges[t + 1]
        if lo == hi:
            continue
        gs = g_s[lo:hi]
        nchunks = -(-(hi - lo) // CHUNK)
        tx, ty = t % ntx, t // ntx
        pxs = (tx * TP + px.ravel()).astype(np.float32)   # (1024,)
        pys = (ty * TP + py.ravel()).astype(np.float32)
        logT = np.zeros(1024, np.float32)
        t4 = t2 = t1 = t0 = nchunks
        live = 8
        for j in range(nchunks):
            ws = gs[j * CHUNK:(j + 1) * CHUNK]
            dx = pxs[None, :] - cx[ws][:, None]
            dyv = cy[ws][:, None] - pys[None, :]
            power = (-0.5 * a[ws][:, None] * dx * dx
                     - 0.5 * c[ws][:, None] * dyv * dyv
                     - b[ws][:, None] * dx * dyv)
            alpha = np.minimum(ALPHA_CLAMP, op[ws][:, None] * np.exp(power))
            keep = ((alpha >= ALPHA_MIN)
                    & (dx * dx <= (rx[ws] ** 2)[:, None])
                    & (dyv * dyv <= (ry[ws] ** 2)[:, None]))
            alpha = np.where(keep, alpha, 0.0)
            logT += np.log1p(-alpha).sum(axis=0)
            T = np.exp(logT)
            nlive = sum(1 for m in group_masks if T[m].max() >= ALPHA_MIN)
            if nlive <= 4 and t4 == nchunks:
                t4 = j + 1
            if nlive <= 2 and t2 == nchunks:
                t2 = j + 1
            if nlive <= 1 and t1 == nchunks:
                t1 = j + 1
            if nlive == 0:
                t0 = j + 1
                break
        tstats.append((nchunks, t4, t2, t1, t0))

    st_ = np.array(tstats, np.int64)
    nch, t4, t2, t1, t0 = st_.T
    # row-window cost units: windows x rows (1 unit = 128 rows x 1 window)
    light = np.minimum(nch, t0) * 8
    cur = np.minimum(t4, t0) * 8 + np.maximum(np.minimum(nch, t0) - t4, 0) * 4
    multi = (np.minimum(t4, t0) * 8
             + np.maximum(np.minimum(t2, t0) - t4, 0) * 4
             + np.maximum(np.minimum(t1, t0) - t2, 0) * 2
             + np.maximum(np.minimum(nch, t0) - t1, 0) * 1)
    full = nch * 8
    print(f"{kind}: tiles={len(st_)} windows={nch.sum()} "
          f"pair-pixels(full)={full.sum()*128*128/1e9:.2f}G")
    for name, v in [("no-exit ", full), ("light   ", light),
                    ("current ", cur), ("multi   ", multi)]:
        print(f"  {name}: {v.sum()*128*128/1e9:.2f}G pair-pixel units "
              f"({100*v.sum()/full.sum():.0f}% of no-exit)")
    # the 20 heaviest tiles
    heavy = np.argsort(-nch)[:10]
    print("  heaviest tiles (nchunks, t4, t2, t1, t0):")
    for i in heavy:
        print(f"    {tuple(int(x) for x in st_[i])}")


replay("surface")
replay("random")
