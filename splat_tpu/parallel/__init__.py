from splat_tpu.parallel.sharding import (make_mesh, render_sharded,
                                         render_batch_sharded,
                                         render_batch_sharded_tiled,
                                         render_batch_sharded_tiled_checked,
                                         render_sharded_tiled,
                                         render_sharded_tiled_checked)

__all__ = ["make_mesh", "render_sharded", "render_batch_sharded",
           "render_batch_sharded_tiled",
           "render_batch_sharded_tiled_checked",
           "render_sharded_tiled", "render_sharded_tiled_checked"]
