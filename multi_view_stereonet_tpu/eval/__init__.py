"""Evaluation: depth metrics + test CLI (reference test.py equivalent)."""

from .metrics import get_depth_prediction_metrics, compute_avg_metrics

__all__ = ["get_depth_prediction_metrics", "compute_avg_metrics"]
