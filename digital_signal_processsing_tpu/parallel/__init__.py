from .mesh import make_mesh, time_sharding  # noqa: F401
from .sharded_scan import sharded_moving_average, sharded_cumsum  # noqa: F401
from .sharded_fir import sharded_fir_filter  # noqa: F401

__all__ = [
    "make_mesh",
    "time_sharding",
    "sharded_moving_average",
    "sharded_cumsum",
    "sharded_fir_filter",
]
