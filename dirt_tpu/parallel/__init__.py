"""Multi-chip parallelism: batch sharding and face sharding over a mesh."""

from . import face_sharding, sharding

__all__ = ["face_sharding", "sharding"]
