from schwingermodel_tpu.ops.geometry import Geometry, ShardedGeometry
from schwingermodel_tpu.ops import dirac, gauge

__all__ = ["Geometry", "ShardedGeometry", "dirac", "gauge"]
