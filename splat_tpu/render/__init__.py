from splat_tpu.render.api import render, render_fn
from splat_tpu.render.oracle import render_oracle

__all__ = ["render", "render_fn", "render_oracle"]
