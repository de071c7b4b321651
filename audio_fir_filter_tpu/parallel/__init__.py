from .mesh import DATA_AXIS, TIME_AXIS, make_mesh, single_device_mesh
from .sharded_conv import pad_for_mesh, sharded_filter, sharded_filter_padded

__all__ = [
    "DATA_AXIS",
    "TIME_AXIS",
    "make_mesh",
    "single_device_mesh",
    "pad_for_mesh",
    "sharded_filter",
    "sharded_filter_padded",
]
