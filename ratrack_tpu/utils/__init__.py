"""Visualization and debugging utilities."""
