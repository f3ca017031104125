"""Multi-chip parallelism: batch sharding over a device mesh."""

from . import sharding

__all__ = ["sharding"]
