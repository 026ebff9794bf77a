from . import sharding
from .sharding import make_mesh

__all__ = ["make_mesh", "sharding"]
