"""Evaluation: result export, MOT tracker, SAMOTA/AMOTA metrics."""

from .export import (format_frame_results, write_frame_results,
                     parse_frame_results)

__all__ = ["format_frame_results", "write_frame_results",
           "parse_frame_results"]
