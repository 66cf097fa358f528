from narrow_band_least_squares_tpu.parallel.mesh import make_mesh, auto_mesh_shape
from narrow_band_least_squares_tpu.parallel.sharded import ShardedNarrowBandPipeline

__all__ = ["make_mesh", "auto_mesh_shape", "ShardedNarrowBandPipeline"]
