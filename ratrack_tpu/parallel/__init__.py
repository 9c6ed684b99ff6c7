"""Device mesh + sharding helpers for data-parallel clip streaming."""

from .mesh import make_mesh, shard_clips, replicate

__all__ = ["make_mesh", "shard_clips", "replicate"]
