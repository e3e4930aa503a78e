"""Model I/O: 3DGS PLY loading (host-side) feeding HBM-resident SoA arrays."""

from splat_tpu.io.ply import load_ply, save_ply, trim_ply, read_ply_arrays
from splat_tpu.io.cache import load_scene_cached, save_npz, load_npz

__all__ = [
    "load_ply",
    "save_ply",
    "trim_ply",
    "read_ply_arrays",
    "load_scene_cached",
    "save_npz",
    "load_npz",
]
