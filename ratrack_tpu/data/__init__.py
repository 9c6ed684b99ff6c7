"""Data layer: VoD reader, GT assembly, padding pipeline, synthetic data."""

from .frames import FrameBatch, empty_frame

__all__ = ["FrameBatch", "empty_frame"]
