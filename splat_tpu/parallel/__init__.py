from splat_tpu.parallel.sharding import (make_mesh, render_sharded,
                                         render_batch_sharded)

__all__ = ["make_mesh", "render_sharded", "render_batch_sharded"]
