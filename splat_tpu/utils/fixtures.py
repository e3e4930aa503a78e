"""Synthetic test scenes.

``naive_gaussians`` is the reference's canonical 4-splat fixture
(reference: src/gaussians.rs:319-374, notes/util_gau.py:25-60): one small
white-ish magenta blob at the origin plus an elongated red/green/blue blob
along each axis, colors pre-inverse-SH-encoded into the DC band.

``random_scene`` generates arbitrarily large statistically-plausible scenes
for benchmarking (the reference ships no large public scene; pretrained
models are multi-hundred-MB downloads).
"""

from __future__ import annotations

import numpy as np

from splat_tpu.ops.sh import SH_C0
from splat_tpu.scene import GaussianScene

# The reference encodes fixture colors with a truncated constant
# (src/gaussians.rs:330 uses 0.28209); we keep that exact value so fixture
# parity tests against reference-derived pixels line up bit-for-bit.
_REF_SH_C0 = 0.28209


def naive_gaussians() -> GaussianScene:
    xyz = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    quats = np.tile(np.array([[1, 0, 0, 0]], np.float32), (4, 1))
    scales = np.array([[0.03, 0.03, 0.03],
                       [0.2, 0.03, 0.03],
                       [0.03, 0.2, 0.03],
                       [0.03, 0.03, 0.2]], np.float32)
    colors = np.array([[1, 0, 1], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                      np.float32)
    sh = np.zeros((4, 16, 3), np.float32)
    sh[:, 0, :] = (colors - 0.5) / _REF_SH_C0
    opacities = np.ones(4, np.float32)
    return GaussianScene.create(means=xyz, quats=quats, scales=scales,
                                opacities=opacities, sh=sh)


def random_scene(n: int, seed: int = 0, *, extent: float = 3.0,
                 scale_range: tuple[float, float] = (0.005, 0.05),
                 sh_degree: int = 3) -> GaussianScene:
    """A random cloud of n gaussians inside a ball of radius ``extent``.

    Scales/opacities are drawn to roughly match the statistics of trained
    3DGS scenes (log-uniform scales, opacity beta-ish distribution), which is
    what matters for benchmark realism: per-tile splat counts and alpha
    saturation behavior.
    """
    rng = np.random.default_rng(seed)
    r = extent * np.cbrt(rng.uniform(0.01, 1.0, n))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    means = (r[:, None] * d).astype(np.float32)

    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)

    lo, hi = np.log(scale_range[0]), np.log(scale_range[1])
    scales = np.exp(rng.uniform(lo, hi, (n, 3))).astype(np.float32)

    opacities = rng.beta(2.0, 2.0, n).astype(np.float32)

    sh = np.zeros((n, 16, 3), np.float32)
    base = rng.uniform(0.0, 1.0, (n, 3))
    sh[:, 0, :] = (base - 0.5) / SH_C0
    if sh_degree > 0:
        ncoef = (sh_degree + 1) ** 2
        sh[:, 1:ncoef, :] = rng.normal(0.0, 0.02, (n, ncoef - 1, 3))

    return GaussianScene.create(means=means, quats=quats.astype(np.float32),
                                scales=scales, opacities=opacities, sh=sh)


def surface_scene(n: int, seed: int = 0, *, extent: float = 2.0,
                  sh_degree: int = 3) -> GaussianScene:
    """Splats distributed on blobby surfaces, like trained 3DGS scenes.

    Real pretrained models concentrate splats on 2D manifolds with
    tangent-plane-anisotropic scales (thin along the normal) and high
    opacity — which produces strong occlusion and very non-uniform tile
    loads, the statistics that matter for benchmark realism (saturation
    early-exit, per-tile range variance).  The uniform-ball
    :func:`random_scene` underestimates both.
    """
    rng = np.random.default_rng(seed)
    # a handful of deformed spheres + a ground plane
    n_shapes = 5
    per = n // n_shapes
    means_list, normals_list = [], []
    for i in range(n_shapes - 1):
        center = rng.uniform(-0.5, 0.5, 3) * extent
        rad = rng.uniform(0.2, 0.5) * extent
        d = rng.normal(size=(per, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        bump = 1.0 + 0.15 * np.sin(5 * d[:, 0]) * np.cos(4 * d[:, 1])
        means_list.append(center + rad * d * bump[:, None])
        normals_list.append(d)
    m = n - per * (n_shapes - 1)
    xz = rng.uniform(-extent, extent, (m, 2))
    ground = np.stack([xz[:, 0], np.full(m, 0.6 * extent), xz[:, 1]], 1)
    means_list.append(ground)  # y-down world: +y is "floor"
    normals_list.append(np.tile([0.0, -1.0, 0.0], (m, 1)))

    means = np.concatenate(means_list).astype(np.float32)
    normals = np.concatenate(normals_list).astype(np.float32)

    # quaternion aligning local +z to the surface normal, random spin
    def quat_from_z_to(v):
        z = np.array([0.0, 0.0, 1.0])
        c = v @ z
        axis = np.cross(z, v)
        norm = np.linalg.norm(axis, axis=1, keepdims=True)
        axis = np.where(norm > 1e-6, axis / np.maximum(norm, 1e-12),
                        np.array([1.0, 0.0, 0.0]))
        half = np.arccos(np.clip(c, -1, 1))[:, None] / 2
        return np.concatenate([np.cos(half), axis * np.sin(half)], 1)

    quats = quat_from_z_to(normals).astype(np.float32)

    area_scale = extent * np.sqrt(1.0 / max(n, 1))
    tangent = np.exp(rng.normal(np.log(2.2 * area_scale), 0.45, (n, 2)))
    normal_s = tangent.min(1, keepdims=True) * rng.uniform(0.1, 0.3, (n, 1))
    scales = np.concatenate([tangent, normal_s], 1).astype(np.float32)

    opacities = rng.beta(5.0, 1.5, n).astype(np.float32)  # mostly opaque

    sh = np.zeros((n, 16, 3), np.float32)
    base = 0.25 + 0.5 * (means / (2 * extent) + 0.5)
    base += rng.uniform(-0.1, 0.1, (n, 3))
    sh[:, 0, :] = (np.clip(base, 0, 1) - 0.5) / SH_C0
    if sh_degree > 0:
        ncoef = (sh_degree + 1) ** 2
        sh[:, 1:ncoef, :] = rng.normal(0.0, 0.03, (n, ncoef - 1, 3))

    return GaussianScene.create(means=means, quats=quats, scales=scales,
                                opacities=opacities, sh=sh)
