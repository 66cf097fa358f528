from narrow_band_least_squares_tpu.parallel.mesh import (
    auto_mesh_shape,
    initialize_distributed,
    make_mesh,
)
from narrow_band_least_squares_tpu.parallel.sharded import ShardedNarrowBandPipeline

__all__ = [
    "make_mesh",
    "auto_mesh_shape",
    "initialize_distributed",
    "ShardedNarrowBandPipeline",
]
