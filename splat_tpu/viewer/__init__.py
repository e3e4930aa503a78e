from splat_tpu.viewer.server import serve

__all__ = ["serve"]
