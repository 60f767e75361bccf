from scp_tpu.core.morton import morton_encode, morton_decode, axis_bits
from scp_tpu.core.octree import (
    OctreeArrays,
    build_octree,
    gen_context,
    deoctree,
    occupancy_to_child_octants,
    morton_prefix_filter,
)
from scp_tpu.core.transforms import (
    cart2spher,
    spher2cart,
    cart2cylin,
    cylin2cart,
)
from scp_tpu.core.quantize import QuantGrid, quantize_points, dequantize_points

__all__ = [
    "morton_encode",
    "morton_decode",
    "axis_bits",
    "OctreeArrays",
    "build_octree",
    "gen_context",
    "deoctree",
    "occupancy_to_child_octants",
    "morton_prefix_filter",
    "cart2spher",
    "spher2cart",
    "cart2cylin",
    "cylin2cart",
    "QuantGrid",
    "quantize_points",
    "dequantize_points",
]
