"""Ceiling analysis: how many (gaussian, tile) pairs can a lossless cull
remove at the 1M@1080p bench operating points?

Compares:
  rect      — current binning (opacity-aware AABB, what k_cap pays for)
  circle    — the existing cull_pairs test: dist(center, rect) > r_cull
              where r_cull = sqrt(thresh / lam_min)  (circumscribed circle
              of the kill ellipse; conservative for anisotropic splats)
  exact     — min of the conic quadratic over the tile rect > thresh
              (exact lossless ellipse-vs-rect test)

Runs the real projection on the CPU backend, then NumPy float64.
"""
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
import splat_tpu as st
from splat_tpu.config import RenderConfig
from splat_tpu.ops.projection import project_gaussians

H, W, N = 1080, 1920, 1_000_000
TP = 32


def analyze(kind):
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
    cx, cy = np.float64(np.asarray(p.center_px)).T
    a, b, c = np.float64(np.asarray(p.conic)).T
    rx, ry = np.float64(np.asarray(p.radius_px)).T
    op = np.float64(np.asarray(p.opacity))
    ntx, nty = -(-W // TP), -(-H // TP)

    idx = np.nonzero(vis)[0]
    cx, cy, a, b, c, rx, ry, op = (v[idx] for v in
                                   (cx, cy, a, b, c, rx, ry, op))
    tx0 = np.clip(np.floor((cx - rx) / TP), 0, ntx - 1).astype(np.int64)
    tx1 = np.clip(np.floor((cx + rx) / TP), 0, ntx - 1).astype(np.int64)
    ty0 = np.clip(np.floor((cy - ry) / TP), 0, nty - 1).astype(np.int64)
    ty1 = np.clip(np.floor((cy + ry) / TP), 0, nty - 1).astype(np.int64)
    sw = tx1 - tx0 + 1
    sh = ty1 - ty0 + 1
    counts = sw * sh
    total = int(counts.sum())

    # expand to pair arrays
    g = np.repeat(np.arange(len(cx)), counts)
    r_of = np.arange(len(g)) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    dy = r_of // sw[g]
    dx = r_of - dy * sw[g]
    tcol = tx0[g] + dx
    trow = ty0[g] + dy
    # tile rect [x0, x0+TP] x [y0, y0+TP]
    x0 = tcol * TP
    y0 = trow * TP

    thresh = 2.0 * np.log(np.maximum(op, 1e-12) / cfg.alpha_min)
    A, B, C = a[g], b[g], c[g]
    cxg, cyg = cx[g], cy[g]
    th = thresh[g]

    # circle test (current cull)
    half = 0.5 * (A + C)
    lam_min = half - np.sqrt(np.maximum(half * half - (A * C - B * B), 0))
    r_cull2 = th / np.maximum(lam_min, 1e-300)
    ddx = np.maximum(np.maximum(x0 - cxg, cxg - (x0 + TP)), 0.0)
    ddy = np.maximum(np.maximum(y0 - cyg, cyg - (y0 + TP)), 0.0)
    dead_circle = ddx * ddx + ddy * ddy > r_cull2

    # exact test: min over rect of the kernel's quadratic.  The kernel
    # evaluates power = -(a dx^2 + c dy^2 + 2 b dx dy)/2 with
    # dx = px - cx, dy = cy - py (kernels.py composite_rows; oracle.py
    # agrees), so in u = px - cx, v = py - cy the kill quadratic is
    # q(u, v) = A u^2 - 2 B u v + C v^2 (note the MINUS: dy = -v flips
    # the cross term).  If the center is inside the rect the min is 0.
    ux0, ux1 = x0 - cxg, x0 + TP - cxg     # u range
    vy0, vy1 = y0 - cyg, y0 + TP - cyg     # v range
    inside = (ux0 <= 0) & (ux1 >= 0) & (vy0 <= 0) & (vy1 >= 0)

    def edge_min_u(ufix, vlo, vhi):
        # q(v) = C v^2 - 2 B ufix v + A ufix^2; vertex v* = B ufix / C
        vstar = np.clip(B * ufix / np.maximum(C, 1e-300), vlo, vhi)
        return A * ufix * ufix - 2 * B * ufix * vstar + C * vstar * vstar

    def edge_min_v(vfix, ulo, uhi):
        ustar = np.clip(B * vfix / np.maximum(A, 1e-300), ulo, uhi)
        return A * ustar * ustar - 2 * B * ustar * vfix + C * vfix * vfix

    qmin = np.minimum(
        np.minimum(edge_min_u(ux0, vy0, vy1), edge_min_u(ux1, vy0, vy1)),
        np.minimum(edge_min_v(vy0, ux0, ux1), edge_min_v(vy1, ux0, ux1)))
    qmin = np.where(inside, 0.0, qmin)
    dead_exact = qmin > th

    # sanity: exact must kill everything circle kills
    bad = int(np.sum(dead_circle & ~dead_exact))
    ncirc = int(dead_circle.sum())
    nexact = int(dead_exact.sum())
    multi = counts > 1
    print(f"{kind}: visible={len(cx)} pairs={total} "
          f"(pairs/vis {total/len(cx):.2f}) "
          f"multi-tile splats {multi.sum()} carry "
          f"{int(counts[multi].sum())} pairs")
    print(f"  circle cull: {ncirc} dead ({100*ncirc/total:.1f}%) "
          f"-> live {total-ncirc}")
    print(f"  exact  cull: {nexact} dead ({100*nexact/total:.1f}%) "
          f"-> live {total-nexact}  [circle-not-exact={bad}]")
    # how much of the raster's pair load lives in which span class
    for scls, m in [("1x1", counts == 1), ("<=2", counts <= 2),
                    ("<=4", counts <= 4), (">4", counts > 4)]:
        print(f"    span {scls}: splats {int(m.sum())}, "
              f"pairs {int(counts[m].sum())}")


analyze("random")
analyze("surface")
