"""3D occupancy mapping (OctoMap-equivalent used surface)."""

from .occupancy import (OccupancyGrid, build_occupancy_grid_map,
                        insert_depth_frame)
from .octree_bt import (coords_to_keys, keys_to_coords, pack_keys,
                        read_bt, unpack_keys, write_bt)

__all__ = [
    "OccupancyGrid", "build_occupancy_grid_map", "insert_depth_frame",
    "coords_to_keys", "keys_to_coords", "pack_keys", "unpack_keys",
    "read_bt", "write_bt",
]
