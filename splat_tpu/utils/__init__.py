from splat_tpu.utils.image import write_png, read_png, psnr
from splat_tpu.utils.fixtures import (naive_gaussians, random_scene,
                                      surface_scene)

__all__ = ["write_png", "read_png", "psnr", "naive_gaussians",
           "random_scene", "surface_scene"]
