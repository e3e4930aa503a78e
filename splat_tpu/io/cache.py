"""NPZ caching of activated SoA arrays.

The reference re-parses the PLY on every launch (src/main.rs:19); for
multi-GB pretrained scenes the parse+activation dominates startup.  The cache
stores the post-activation arrays so a warm start is a single mmap'd read.
"""

from __future__ import annotations

import os

import numpy as np

from splat_tpu.scene import GaussianScene

_CACHE_VERSION = 1


def save_npz(path: str | os.PathLike, scene: GaussianScene) -> None:
    d = scene.to_numpy()
    np.savez(path, _version=_CACHE_VERSION, **d)


def load_npz(path: str | os.PathLike) -> GaussianScene:
    with np.load(path) as z:
        if int(z.get("_version", 0)) != _CACHE_VERSION:
            raise ValueError(f"cache version mismatch in {path}")
        return GaussianScene.create(
            means=z["means"], quats=z["quats"], scales=z["scales"],
            opacities=z["opacities"], sh=z["sh"])


def load_scene_cached(ply_path: str | os.PathLike, *,
                      center: bool = True) -> GaussianScene:
    """Load a scene, using/creating a sibling ``<name>.npz`` cache."""
    from splat_tpu.io.ply import load_ply

    cache = os.fspath(ply_path) + ".npz"
    if os.path.exists(cache) and (
            os.path.getmtime(cache) >= os.path.getmtime(ply_path)):
        try:
            return load_npz(cache)
        except Exception:
            pass  # stale/corrupt cache: fall through and rebuild
    scene = load_ply(ply_path, center=center)
    try:
        save_npz(cache, scene)
    except OSError:
        pass  # read-only location; cache is best-effort
    return scene
