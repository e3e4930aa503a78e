"""Native (C++) runtime components, loaded via ctypes.

Built on demand with g++ (no pybind11 in this toolchain); every native path
has a pure-NumPy fallback so the package works without a compiler.
"""

from splat_tpu.native.build import load_library, native_available
from splat_tpu.native.loader import load_ply_native

__all__ = ["load_library", "native_available", "load_ply_native"]
