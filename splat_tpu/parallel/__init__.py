from splat_tpu.parallel.sharding import (make_mesh, render_sharded,
                                         render_batch_sharded,
                                         render_sharded_tiled)

__all__ = ["make_mesh", "render_sharded", "render_batch_sharded",
           "render_sharded_tiled"]
