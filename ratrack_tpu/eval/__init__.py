"""Evaluation: result export, MOT tracker, SAMOTA/AMOTA metrics."""

from .export import (format_frame_results, write_frame_results,
                     parse_frame_results)
from .kalman import BoxDet, KalmanTracker
from .mot_metrics import point_set_iou, clear_mot, integrated_mot

__all__ = ["format_frame_results", "write_frame_results",
           "parse_frame_results", "BoxDet", "KalmanTracker",
           "point_set_iou", "clear_mot", "integrated_mot"]
